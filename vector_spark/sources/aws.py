"""AWS / GCP queue-envelope source decodes.

Three message-bus sources whose TRANSPORT is out of scope (SURVEY §2.5 —
broker clients are cluster-config, Spark connectors own the wire) but
whose ENVELOPE formats are real, documented JSON wire shapes the
reference parses:

* ``parse_s3_event_notification`` — the aws_s3 source's SQS leg
  (reference ``src/sources/aws_s3/sqs.rs``): S3 bucket-notification
  bodies (``S3Event``/``S3EventRecord``, sqs.rs:783-916). Semantics
  mirrored exactly:
  - ``s3:TestEvent`` bodies carry no ``Records`` → zero rows
    (sqs.rs:457-460 ignores them);
  - event-version gate ``~2`` → keep major version 2 only
    (sqs.rs:53-54,479-483);
  - only ``ObjectCreated:*`` records produce events — the kind is the
    ``eventName`` prefix before ``:`` (S3EventName FromStr,
    sqs.rs:851-875; filter sqs.rs:485-493);
  - object keys are URL-decoded with AWS's ``+``-means-space rule
    (urlencoded_string, sqs.rs:918-943) — Spark's ``try_url_decode``
    (java.net.URLDecoder) implements exactly that, malformed %-escapes
    → NULL key, row dropped like the reference's deserialize error;
  - emitted fields ``bucket``/``object``/``region`` per
    handle_single_log (sqs.rs:688-720). The reference stamps the event
    timestamp from the GetObject ``last_modified``; object fetch is
    transport (the file/readers layer here), so the notification's own
    ``eventTime`` is surfaced instead.

* ``parse_sqs_messages`` — the aws_sqs source (reference
  ``src/sources/aws_sqs/source.rs``): ReceiveMessage result messages →
  ``message`` (Body) + ``message_id`` + ``timestamp`` from the
  ``SentTimestamp`` system attribute in epoch milliseconds
  (source.rs:113,189-199).

* ``parse_pubsub_push`` — the gcp_pubsub source (reference
  ``src/sources/gcp_pubsub.rs:652-690``): PubsubMessage ``data``
  (base64) → message text, ``attributes`` map, ``message_id``, and
  ``publish_time`` → timestamp. The HTTP push envelope wraps the same
  message object under ``{"message": ..., "subscription": ...}``.

All three are pure JVM column expressions (from_json + explode — no
Python in the row path); decode scales linearly and explode is the only
row-multiplying step, bounded by the envelope's batch size (≤10 for SQS,
S3 notification Records are ~1-2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_S3_EVENT_SCHEMA = (
    "struct<Records:array<struct<"
    "eventVersion:string,eventSource:string,awsRegion:string,"
    "eventName:string,eventTime:string,"
    "s3:struct<bucket:struct<name:string>,"
    "object:struct<key:string,size:long>>>>>"
)

_SQS_SCHEMA = (
    "struct<Messages:array<struct<"
    "MessageId:string,Body:string,"
    "Attributes:struct<SentTimestamp:string>>>>"
)

_PUBSUB_SCHEMA = (
    "struct<message:struct<data:string,"
    "attributes:map<string,string>,"
    "messageId:string,publishTime:string>,subscription:string>"
)


def _col(body: str | Column) -> Column:
    return F.col(body) if isinstance(body, str) else body


def parse_s3_event_notification(
    df: DataFrame,
    body: str | Column = "value",
    created_only: bool = True,
) -> DataFrame:
    """S3 event-notification JSON → one row per accepted record:
    ``bucket, object, region, size, event_kind, event_name, event_time``.

    ``created_only=False`` keeps non-ObjectCreated records too (the
    kind/name columns let callers route them); the version gate and
    TestEvent/malformed-body drops always apply.
    """
    ev = F.from_json(_col(body), _S3_EVENT_SCHEMA)
    rec = df.select(F.explode(ev["Records"]).alias("__r")).select(
        F.col("__r.awsRegion").alias("region"),
        F.col("__r.eventVersion").alias("__ver"),
        F.col("__r.eventName").alias("__name"),
        F.col("__r.eventTime").alias("__time"),
        F.col("__r.s3.bucket.name").alias("bucket"),
        F.col("__r.s3.object.key").alias("__key"),
        F.col("__r.s3.object.size").alias("size"),
    )
    major = F.substring_index(F.col("__ver"), ".", 1)
    # semver req "~2": major == 2 (sqs.rs:53-54); non-numeric → drop
    out = rec.filter(major.rlike("^[0-9]+$") & (major.cast("int") == 2))
    kind = F.substring_index(F.col("__name"), ":", 1)
    # eventName with no ':' has an empty name part, like splitn(2, ':')
    name = F.when(
        F.col("__name").contains(":"),
        F.expr("substring(__name, instr(__name, ':') + 1)"),
    ).otherwise(F.lit(""))
    out = out.select(
        "bucket",
        F.expr("try_url_decode(__key)").alias("object"),
        "region",
        "size",
        kind.alias("event_kind"),
        name.alias("event_name"),
        F.to_timestamp(F.col("__time")).alias("event_time"),
    ).filter(F.col("object").isNotNull())
    if created_only:
        out = out.filter(F.col("event_kind") == "ObjectCreated")
    return out


def parse_sqs_messages(
    df: DataFrame, body: str | Column = "value"
) -> DataFrame:
    """SQS ReceiveMessage JSON → one row per message:
    ``message, message_id, timestamp`` (SentTimestamp epoch-ms;
    NULL when the attribute is absent — the reference falls back to
    ingest-now, a wall-clock the batch engine does not stamp)."""
    env = F.from_json(_col(body), _SQS_SCHEMA)
    return df.select(F.explode(env["Messages"]).alias("__m")).select(
        F.col("__m.Body").alias("message"),
        F.col("__m.MessageId").alias("message_id"),
        F.timestamp_millis(
            F.col("__m.Attributes.SentTimestamp").cast("long")
        ).alias("timestamp"),
    )


def parse_pubsub_push(
    df: DataFrame, body: str | Column = "value"
) -> DataFrame:
    """Pub/Sub push-envelope JSON → one row per envelope:
    ``message`` (base64-decoded data text), ``attributes``,
    ``message_id``, ``timestamp`` (publishTime), ``subscription``."""
    env = F.from_json(_col(body), _PUBSUB_SCHEMA)
    return df.select(
        F.unbase64(env["message"]["data"]).cast("string").alias("message"),
        env["message"]["attributes"].alias("attributes"),
        env["message"]["messageId"].alias("message_id"),
        F.to_timestamp(env["message"]["publishTime"]).alias("timestamp"),
        env["subscription"].alias("subscription"),
    )
