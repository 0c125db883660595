"""Vector ``native_json`` codec — the engine's own event wire format.

Parity: reference ``lib/codecs/src/decoding/format/native_json.rs`` and
``lib/codecs/src/encoding/format/native_json.rs`` — serde of the Event
enum, i.e. a one-line JSON envelope ``{"log": {...}}`` or
``{"metric": {...}}`` (trace events are out of scope with the rest of the
tracing surface). The exact field layout is pinned by the reference's own
fixture corpus ``lib/codecs/tests/data/native_encoding/json/*.json``:

* log: the event object verbatim (LogEvent's BTreeMap ⇒ keys sorted);
* metric: struct-field order ``name, namespace?, tags?, timestamp?,
  interval_ms?, kind, <variant>`` where the variant key is one of
  ``counter|gauge|set|histogram|summary|...`` — absent options are
  skipped, ``kind`` is ``"absolute"``/``"incremental"``, timestamps render
  RFC 3339 UTC with chrono ``SecondsFormat::AutoSi`` (0/3/6/9 fractional
  digits, ``Z`` suffix), and set values are a BTreeSet ⇒ sorted array.

Everything here is pure JVM column math (string/JSON builtins) — no UDFs.
Float rendering: serde uses ryu shortest-round-trip; :func:`json_f64`
reproduces it exactly for integral doubles (``"N.0"``) and for doubles
with a terminating decimal expansion of ≤ 9 fractional digits (counts,
sums of integer-valued samples, millisecond-derived seconds — everything
the normalized metric frame produces). Arbitrary transcendental doubles
would need true ryu; the encoder is documented for metric frames, not for
them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "auto_si_timestamp",
    "json_f64",
    "encode_native_log",
    "encode_native_metric",
    "parse_native_json",
]


def auto_si_timestamp(ts: Column) -> Column:
    """chrono ``to_rfc3339_opts(SecondsFormat::AutoSi, use_z=true)``.

    Spark timestamps carry microseconds, so the AutoSi choice is between
    0, 3 and 6 fractional digits: trim a trailing ``.000000`` entirely,
    else trim a trailing ``000`` (micros on an exact millisecond).
    """
    raw = F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    trimmed = F.regexp_replace(raw, r"\.000000$", "")
    trimmed = F.regexp_replace(trimmed, r"(\.\d{3})000$", "$1")
    return F.concat(trimmed, F.lit("Z"))


def json_f64(v: Column) -> Column:
    """serde/ryu rendering of a double with a short terminating decimal
    expansion: integral values render ``N.0``, fractional values render
    their ≤9 significant fractional digits with trailing zeros trimmed.
    """
    as_long = v.cast("long")
    integral = v.isNotNull() & (v == as_long.cast("double"))
    frac = F.regexp_replace(F.format_string("%.9f", v), r"^-?\d+\.", "")
    frac = F.regexp_replace(frac, "0+$", "")
    return (
        F.when(integral, F.concat(as_long.cast("string"), F.lit(".0")))
        .otherwise(
            F.concat(as_long.cast("string"), F.lit("."), frac)
        )
    )


def _json_str(c: Column) -> Column:
    """JSON-escape a string column (result includes surrounding quotes).

    to_json of a 1-element array performs full JSON string escaping; strip
    the surrounding brackets.
    """
    arr = F.to_json(F.array(c))
    return arr.substr(F.lit(2), F.length(arr) - 2)


def _sorted_tags_json(tags: Column) -> Column:
    """map<string,string> → JSON object with BTreeMap (sorted-key) order."""
    return F.to_json(F.map_from_entries(F.array_sort(F.map_entries(tags))))


def encode_native_log(obj_json: Column) -> Column:
    """Wrap a pre-encoded JSON event object as ``{"log": {...}}``.

    The caller is responsible for key order (LogEvent is a BTreeMap ⇒
    sorted): ``F.to_json(struct)`` with fields declared in sorted order,
    or :func:`_sorted_tags_json`-style map re-ordering, both satisfy it.
    """
    return F.concat(F.lit('{"log":'), obj_json, F.lit("}"))


def encode_native_metric(
    name: Column,
    kind: Column,
    metric_type: Column,
    value: Column | None = None,
    set_values: Column | None = None,
    hist_limits: Column | None = None,
    hist_counts: Column | None = None,
    agg_count: Column | None = None,
    agg_sum: Column | None = None,
    quantiles: Column | None = None,
    quantile_values: Column | None = None,
    namespace: Column | None = None,
    tags: Column | None = None,
    ts: Column | None = None,
    interval_ms: Column | None = None,
) -> Column:
    """Encode one normalized-metric-frame row as the native JSON envelope.

    Variant selection follows ``metric_type`` ('counter'|'gauge'|'set'|
    'histogram'|'summary'); unused variant arguments may be omitted.
    Empty/null ``namespace`` and null ``tags``/``ts``/``interval_ms`` are
    skipped, matching the reference's serde ``skip_serializing_if``.
    """
    head = F.concat(F.lit('{"metric":{"name":'), _json_str(name))
    if namespace is not None:
        head = F.concat(
            head,
            F.when(
                namespace.isNotNull() & (namespace != ""),
                F.concat(F.lit(',"namespace":'), _json_str(namespace)),
            ).otherwise(F.lit("")),
        )
    if tags is not None:
        head = F.concat(
            head,
            F.when(
                tags.isNotNull() & (F.size(tags) > 0),
                F.concat(F.lit(',"tags":'), _sorted_tags_json(tags)),
            ).otherwise(F.lit("")),
        )
    if ts is not None:
        head = F.concat(
            head,
            F.when(
                ts.isNotNull(),
                F.concat(
                    F.lit(',"timestamp":"'), auto_si_timestamp(ts), F.lit('"')
                ),
            ).otherwise(F.lit("")),
        )
    if interval_ms is not None:
        head = F.concat(
            head,
            F.when(
                interval_ms.isNotNull(),
                F.concat(
                    F.lit(',"interval_ms":'),
                    interval_ms.cast("long").cast("string"),
                ),
            ).otherwise(F.lit("")),
        )
    head = F.concat(head, F.lit(',"kind":'), _json_str(kind))

    variants: list[tuple[str, Column]] = []
    if value is not None:
        scalar = F.concat(F.lit('{"value":'), json_f64(value), F.lit("}"))
        variants.append(("counter", scalar))
        variants.append(("gauge", scalar))
    if set_values is not None:
        vals = F.array_sort(F.array_distinct(set_values))
        variants.append(
            ("set", F.concat(F.lit('{"values":'), F.to_json(vals), F.lit("}")))
        )
    if hist_limits is not None and hist_counts is not None:
        buckets = F.zip_with(
            hist_limits,
            hist_counts,
            lambda lim, cnt: F.concat(
                F.lit('{"upper_limit":'), json_f64(lim),
                F.lit(',"count":'), cnt.cast("long").cast("string"),
                F.lit("}"),
            ),
        )
        variants.append((
            "histogram",
            F.concat(
                F.lit('{"buckets":['), F.array_join(buckets, ","),
                F.lit('],"count":'), agg_count.cast("long").cast("string"),
                F.lit(',"sum":'), json_f64(agg_sum), F.lit("}"),
            ),
        ))
    if quantiles is not None and quantile_values is not None:
        qs = F.zip_with(
            quantiles,
            quantile_values,
            lambda q, qv: F.concat(
                F.lit('{"quantile":'), json_f64(q),
                F.lit(',"value":'), json_f64(qv), F.lit("}"),
            ),
        )
        variants.append((
            "summary",
            F.concat(
                F.lit('{"quantiles":['), F.array_join(qs, ","),
                F.lit('],"count":'), agg_count.cast("long").cast("string"),
                F.lit(',"sum":'), json_f64(agg_sum), F.lit("}"),
            ),
        ))

    body = F.lit(None).cast("string")
    for vt, payload in variants:
        body = (
            F.when(metric_type == vt, F.concat(F.lit(f',"{vt}":'), payload))
            .otherwise(body)
        )
    return F.concat(head, body, F.lit("}}"))


_METRIC_VARIANTS = ("counter", "gauge", "set", "histogram", "summary",
                    "distribution", "sketch")


def parse_native_json(df: DataFrame, col: str = "value") -> DataFrame:
    """Decode native-JSON event lines into the engine's event columns.

    Output: ``event_kind`` ('log'|'metric'|null for undecodable), ``log``
    (the inner log object as a JSON string — feed to parse_json_map /
    from_json downstream), and the normalized metric frame columns
    (``metric_name, namespace, kind, metric_type, event_ts, interval_ms,
    metric_value, set_values, tags``) null for non-metric rows. Pure JVM
    get_json_object / from_json — no UDFs, scales scan-side.
    """
    c = F.col(col)
    log_obj = F.get_json_object(c, "$.log")
    mname = F.get_json_object(c, "$.metric.name")
    mtype = F.lit(None).cast("string")
    for vt in _METRIC_VARIANTS:
        mtype = F.when(
            F.get_json_object(c, f"$.metric.{vt}").isNotNull(), F.lit(vt)
        ).otherwise(mtype)
    scalar = F.coalesce(
        F.get_json_object(c, "$.metric.counter.value"),
        F.get_json_object(c, "$.metric.gauge.value"),
    ).cast("double")
    return df.select(
        "*",
        F.when(log_obj.isNotNull(), F.lit("log"))
        .when(mname.isNotNull(), F.lit("metric"))
        .alias("event_kind"),
        log_obj.alias("log"),
        mname.alias("metric_name"),
        F.get_json_object(c, "$.metric.namespace").alias("namespace"),
        F.get_json_object(c, "$.metric.kind").alias("kind"),
        mtype.alias("metric_type"),
        F.to_timestamp(
            F.get_json_object(c, "$.metric.timestamp"),
            "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]'Z'",
        ).alias("event_ts"),
        F.get_json_object(c, "$.metric.interval_ms").cast("long")
        .alias("interval_ms"),
        scalar.alias("metric_value"),
        F.from_json(
            F.get_json_object(c, "$.metric.set.values"), "array<string>"
        ).alias("set_values"),
        F.from_json(
            F.get_json_object(c, "$.metric.tags"), "map<string,string>"
        ).alias("tags"),
    )
