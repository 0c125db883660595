"""AWS/GCP queue-envelope decodes (sources/aws.py) vs the reference
semantics: src/sources/aws_s3/sqs.rs (S3 notification: version gate,
ObjectCreated filter, url-decoded keys, TestEvent ignore),
src/sources/aws_sqs/source.rs (SentTimestamp epoch-ms), and
src/sources/gcp_pubsub.rs (data/attributes/messageId/publishTime)."""

from __future__ import annotations

import base64
import json

from vector_spark.sources.aws import (
    parse_pubsub_push,
    parse_s3_event_notification,
    parse_sqs_messages,
)


def _s3_body(records):
    return json.dumps({"Records": records})


def _s3_rec(key, name="ObjectCreated:Put", version="2.1",
            bucket="b1", region="us-east-1", size=10,
            time="2024-01-02T05:46:18.000Z"):
    return {
        "eventVersion": version,
        "eventSource": "aws:s3",
        "awsRegion": region,
        "eventName": name,
        "eventTime": time,
        "s3": {"bucket": {"name": bucket},
               "object": {"key": key, "size": size}},
    }


def _parse_s3(spark, bodies, **kw):
    df = spark.createDataFrame([(b,) for b in bodies], "value string")
    return parse_s3_event_notification(df, **kw).collect()


def test_s3_key_url_decoding(spark):
    rows = _parse_s3(spark, [_s3_body([
        _s3_rec("logs/a+b%3Dc/file%201.json"),
        _s3_rec("plain/key.gz"),
    ])])
    keys = sorted(r.object for r in rows)
    # AWS encodes space as '+'; %3D and %20 percent-decode (sqs.rs:918-943)
    assert keys == ["logs/a b=c/file 1.json", "plain/key.gz"]
    r = [x for x in rows if x.object == "plain/key.gz"][0]
    assert (r.bucket, r.region, r.size) == ("b1", "us-east-1", 10)
    assert (r.event_kind, r.event_name) == ("ObjectCreated", "Put")
    assert str(r.event_time) == "2024-01-02 05:46:18"


def test_s3_version_gate_and_kind_filter(spark):
    rows = _parse_s3(spark, [_s3_body([
        _s3_rec("keep", version="2.0"),
        _s3_rec("v1-drop", version="1.0"),          # ~2 gate, sqs.rs:479
        _s3_rec("v3-drop", version="3.0"),
        _s3_rec("removed-drop", name="ObjectRemoved:Delete"),
    ])])
    assert [r.object for r in rows] == ["keep"]
    # created_only=False keeps the ObjectRemoved record (kind routed)
    rows = _parse_s3(spark, [_s3_body([
        _s3_rec("keep"), _s3_rec("rm", name="ObjectRemoved:Delete"),
    ])], created_only=False)
    kinds = {r.object: r.event_kind for r in rows}
    assert kinds == {"keep": "ObjectCreated", "rm": "ObjectRemoved"}


def test_s3_test_event_and_malformed(spark):
    # s3:TestEvent has no Records (sqs.rs:457-460); junk fails from_json
    rows = _parse_s3(spark, [
        json.dumps({"Service": "Amazon S3", "Event": "s3:TestEvent",
                    "Bucket": "b1"}),
        "not json at all",
        _s3_body([_s3_rec("ok")]),
    ])
    assert [r.object for r in rows] == ["ok"]


def test_sqs_messages(spark):
    body = json.dumps({"Messages": [
        {"MessageId": "m1", "Body": "hello",
         "Attributes": {"SentTimestamp": "1704174378194"}},
        {"MessageId": "m2", "Body": "no-ts"},
    ]})
    df = spark.createDataFrame([(body,)], "value string")
    rows = {r.message_id: r for r in parse_sqs_messages(df).collect()}
    assert rows["m1"].message == "hello"
    assert rows["m1"].timestamp.microsecond == 194000
    assert rows["m2"].timestamp is None


def test_pubsub_push(spark):
    body = json.dumps({
        "message": {
            "data": base64.b64encode(b"evt payload").decode(),
            "attributes": {"k": "v", "uid": "7"},
            "messageId": "pm-1",
            "publishTime": "2024-01-02T05:46:18.194Z",
        },
        "subscription": "projects/p/subscriptions/s",
    })
    df = spark.createDataFrame([(body,)], "value string")
    r = parse_pubsub_push(df).collect()[0]
    assert r.message == "evt payload"
    assert dict(r.attributes) == {"k": "v", "uid": "7"}
    assert r.message_id == "pm-1"
    assert r.timestamp.microsecond == 194000
    assert r.subscription.endswith("/s")
