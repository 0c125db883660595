"""Log template mining (operators/templates.py).

Oracle strategy: a hand-built line set with known shapes — the miner must
recover the exact templates, counts, example ids, and outlier rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_spark.operators.templates import (
    log_templates,
    mask_message,
    template_outliers,
)

LINES = [
    # 4x "GET" shape, 3x "timeout" shape, 1x rare "disk" shape
    (1, "GET /api/users/17 took 12ms"),
    (2, "GET /api/users/99 took 7ms"),
    (3, "GET /api/orders/3 took 130ms"),
    (4, "GET /api/users/52 took 9ms"),
    (5, "timeout connecting to db-7 after 30s"),
    (6, "timeout connecting to db-2 after 30s"),
    (7, "timeout connecting to cache-1 after 5s"),
    (8, "disk /dev/sda1 offline"),
]


def _df(spark):
    return spark.createDataFrame(LINES, "id int, message string")


def test_mask_preserves_constants_and_token_count(spark):
    got = (
        _df(spark)
        .select(mask_message(F.col("message")).alias("t"))
        .orderBy("t")
        .collect()
    )
    tpls = {r.t for r in got}
    assert "GET <*> took <*>" in tpls
    assert "timeout connecting to <*> after <*>" in tpls
    assert "disk <*> offline" in tpls
    # token counts survive masking — shapes can never merge
    assert all(len(r.t.split(" ")) in (3, 4, 6) for r in got)


def test_log_templates_counts_and_examples(spark):
    rows = log_templates(_df(spark), "message", id_col="id").collect()
    got = {r.template: (r.n_events, r.first_id) for r in rows}
    assert got == {
        "GET <*> took <*>": (4, 1),
        "timeout connecting to <*> after <*>": (3, 5),
        "disk <*> offline": (1, 8),
    }
    # most-frequent-first ordering
    assert [r.n_events for r in rows] == [4, 3, 1]


def test_template_outliers_keeps_rare_rows_only(spark):
    out = template_outliers(_df(spark), "message", max_share=0.2).collect()
    assert [r.id for r in out] == [8]
    assert abs(out[0].template_share - 1 / 8) < 1e-9


def test_custom_variable_predicate(spark):
    # domain rule: only hex-ish device names are variables
    rows = (
        _df(spark)
        .select(
            mask_message(
                F.col("message"), is_var=lambda t: t.rlike("^db-[0-9]+$")
            ).alias("t")
        )
        .where(F.col("t").startswith("timeout"))
        .collect()
    )
    tpls = sorted({r.t for r in rows})
    assert tpls == [
        "timeout connecting to <*> after 30s",
        "timeout connecting to cache-1 after 5s",
    ]


def test_template_drift_detects_new_shape(spark):
    from pyspark.sql import functions as F

    from vector_spark.operators.templates import template_drift

    rows = [(i, "ok user=%d" % i) for i in range(50)] + [
        (i, "BOOM code=%d" % i) for i in range(50, 60)  # only in side B
    ]
    df = spark.createDataFrame(rows, "event_id long, message string")
    out = {r.template: r for r in template_drift(
        df, "message", split_cond=F.col("event_id") < 50
    ).collect()}
    boom = out["BOOM <*>"]
    assert boom.n_a == 0 and boom.n_b == 10 and boom.drift == 1.0
    ok = out["ok <*>"]
    assert ok.n_a == 50 and ok.n_b == 0 and ok.drift == -1.0


def test_rate_zscores_spike_detection(spark):
    import datetime

    from vector_spark.operators.anomaly import rate_zscores

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    # key 'a': 10 events in each of 4 windows, 100 in the 5th (spike)
    for w in range(5):
        n = 100 if w == 4 else 10
        for i in range(n):
            rows.append(("a", t0 + datetime.timedelta(seconds=w * 600 + i)))
    # key 'b': constant rate → sd 0 → z 0 everywhere
    for w in range(4):
        rows.append(("b", t0 + datetime.timedelta(seconds=w * 600)))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {(r.key, r.window_start.minute // 10): r
           for r in rate_zscores(df, window_secs=600).collect()}
    zs = [out[("a", w)].z for w in range(5)]
    assert zs[4] > 1.7 and all(z < 0 for z in zs[:4])  # spike stands out
    assert all(out[("b", w)].z == 0.0 for w in range(4))


def test_rate_zscores_dense_scores_silence(spark):
    import datetime

    from vector_spark.operators.anomaly import rate_zscores_dense

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    # key 'a' emits in windows 0,1,3,4 — window 2 is SILENT
    for w in (0, 1, 3, 4):
        for i in range(10):
            rows.append(("a", t0 + datetime.timedelta(seconds=w * 600 + i)))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {r.window_start: r for r in rate_zscores_dense(df, window_secs=600).collect()}
    assert len(out) == 5  # the spine closes the gap
    silent = out[t0 + datetime.timedelta(seconds=1200)]
    assert silent.n == 0 and silent.z < -1.5  # outage surfaces as anomaly
    assert all(r.z > 0 for w, r in out.items() if r.n == 10)


def test_seasonal_zscores_hour_of_day_baseline(spark):
    import datetime

    import pytest as _pytest

    from vector_spark.operators.anomaly import seasonal_zscores

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    # 03:00 slot: 100 events every day (normal); 14:00 slot: 5 events
    # daily except day 3, which spikes to 100 — same volume, wrong hour
    for day in range(5):
        for i in range(100):
            rows.append(("a", t0 + datetime.timedelta(days=day, hours=3, seconds=i)))
        n14 = 100 if day == 3 else 5
        for i in range(n14):
            rows.append(("a", t0 + datetime.timedelta(days=day, hours=14, seconds=i)))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {(r.slot, r.window_start.day): r for r in seasonal_zscores(df).collect()}
    # 03:00 volume is seasonal-normal every day
    assert all(out[(3 * 3600, d)].z == 0.0 for d in range(1, 6))
    # the 14:00 spike on day 4 (Jan 4) alarms; other 14:00 days are below mean
    assert out[(14 * 3600, 4)].z > 1.7
    assert out[(14 * 3600, 1)].z < 0
    with _pytest.raises(ValueError):
        seasonal_zscores(df, window_secs=7000)


def test_anomaly_incidents_islands(spark):
    import datetime

    from vector_spark.operators.anomaly import anomaly_incidents

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    # key 'a': hot windows 2,3,4 (one incident) and 8 (another); cold rest
    for w, z in [(0, 0.1), (1, 0.2), (2, 2.5), (3, 3.0), (4, 2.1),
                 (5, 0.0), (6, 0.3), (7, 0.2), (8, -2.4), (9, 0.1)]:
        rows.append(("a", t0 + datetime.timedelta(seconds=w * 600), z))
    df = spark.createDataFrame(rows, "key string, window_start timestamp, z double")
    out = sorted(
        anomaly_incidents(df, threshold=2.0, window_secs=600).collect(),
        key=lambda r: r.start,
    )
    assert len(out) == 2
    first, second = out
    assert first.n_windows == 3 and first.peak_abs_z == 3.0
    assert first.duration_secs == 1800
    assert second.n_windows == 1 and second.peak_abs_z == 2.4
    assert second.duration_secs == 600


def test_error_budget_burn_math(spark):
    import datetime

    from pyspark.sql import functions as F

    from vector_spark.operators.anomaly import error_budget_burn

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    # window 0: 100 events, 1 error; window 1: 100 events, 4 errors
    for w, errs in [(0, 1), (1, 4)]:
        for i in range(100):
            rows.append(("api", i < errs, t0 + datetime.timedelta(hours=w, seconds=i)))
    df = spark.createDataFrame(rows, "event_type string, is_err boolean, ts timestamp")
    out = sorted(
        error_budget_burn(df, F.col("is_err"), slo=0.99, window_secs=3600).collect(),
        key=lambda r: r.window_start,
    )
    assert out[0].err_share == 0.01 and out[0].burn_rate == 1.0
    assert out[1].err_share == 0.04 and out[1].burn_rate == 4.0
    # total budget = 200 events * 1% = 2 errors; 5 happened → 2.5x burned
    assert out[1].budget_burned == 2.5
    assert out[0].budget_burned == 0.5


def test_cardinality_growth_detects_cliff(spark):
    import datetime

    from vector_spark.operators.anomaly import cardinality_growth

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    # hours 0-2: 10 distinct values; hour 3: 100 (the cliff)
    for h in range(4):
        vals = 100 if h == 3 else 10
        for v in range(vals):
            rows.append((f"v{v}", t0 + datetime.timedelta(hours=h, seconds=v)))
    rows.append((None, t0))  # nulls excluded
    df = spark.createDataFrame(rows, "tag string, ts timestamp")
    out = sorted(
        cardinality_growth(df, "tag", window_secs=3600).collect(),
        key=lambda r: r.window_start,
    )
    assert [r.n_distinct for r in out] == [10, 10, 10, 100]
    assert out[0].growth == 1.0 and out[0].delta == 0
    assert out[3].growth == 10.0 and out[3].delta == 90


def test_first_seen_keys(spark):
    import datetime

    from vector_spark.operators.anomaly import first_seen_keys

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    # hour 0: u0..u4 (all new); hour 1: u0..u4 again + u5,u6 (2 new of 7)
    for v in range(5):
        rows.append((f"u{v}", t0))
    for v in range(7):
        rows.append((f"u{v}", t0 + datetime.timedelta(hours=1)))
    df = spark.createDataFrame(rows, "uid string, ts timestamp")
    out = sorted(first_seen_keys(df, "uid").collect(), key=lambda r: r.window_start)
    assert (out[0].n_distinct, out[0].n_new, out[0].new_share) == (5, 5, 1.0)
    assert (out[1].n_distinct, out[1].n_new) == (7, 2)
    assert abs(out[1].new_share - 2 / 7) < 1e-6


def test_window_retention(spark):
    import datetime

    from vector_spark.operators.anomaly import window_retention

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    # hour 0: u0..u3; hour 1: u2,u3 (2 of 4 retained) + u9 new
    for v in range(4):
        rows.append((f"u{v}", t0))
    for v in ("u2", "u3", "u9"):
        rows.append((v, t0 + datetime.timedelta(hours=1)))
    df = spark.createDataFrame(rows, "uid string, ts timestamp")
    out = sorted(window_retention(df, "uid").collect(), key=lambda r: r.window_start)
    # first window has no baseline: retention is NULL, not 0.0
    assert (out[0].n_distinct, out[0].n_retained, out[0].retention) == (4, 0, None)
    assert (out[1].n_distinct, out[1].n_retained, out[1].retention) == (3, 2, 0.5)


def test_window_retention_null_baseline_vs_true_zero(spark):
    import datetime

    from vector_spark.operators.anomaly import window_retention

    t0 = datetime.datetime(2024, 1, 1)
    rows = [("a", t0), ("b", t0)]
    # hour 1: all-new entities -> baseline exists, true zero retention
    rows += [("c", t0 + datetime.timedelta(hours=1))]
    # hour 2 empty; hour 3 follows silence -> no baseline again
    rows += [("d", t0 + datetime.timedelta(hours=3))]
    df = spark.createDataFrame(rows, "uid string, ts timestamp")
    out = sorted(window_retention(df, "uid").collect(), key=lambda r: r.window_start)
    assert out[0].retention is None
    assert out[1].retention == 0.0
    assert out[2].retention is None


def test_template_drift_null_cond_and_one_sided(spark):
    from pyspark.sql import functions as F

    from vector_spark.operators.templates import template_drift

    df = spark.createDataFrame(
        [("err 1",), ("err 2",), ("err 3",)], "message string"
    ).withColumn("ts", F.lit(None).cast("timestamp"))
    # NULL split condition counts on the B side, and the empty A side
    # yields 0.0 shares rather than NULL
    out = template_drift(df, split_cond=F.col("ts") < F.lit("2024")).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_a, r.n_b) == (0, 3)
    assert (r.share_a, r.share_b, r.drift) == (0.0, 1.0, 1.0)


def test_co_spike_pairs(spark):
    import datetime

    from vector_spark.operators.anomaly import co_spike_pairs

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    # a and b spike together in windows 0 and 2; c spikes alone in 1
    for w, keys in [(0, ["a", "b"]), (1, ["c"]), (2, ["a", "b"]), (3, [])]:
        for k in keys:
            rows.append((k, t0 + datetime.timedelta(seconds=w * 600), 3.0))
        rows.append(("cold", t0 + datetime.timedelta(seconds=w * 600), 0.1))
    df = spark.createDataFrame(rows, "key string, window_start timestamp, z double")
    out = co_spike_pairs(df, threshold=2.0, min_cooccur=2).collect()
    assert len(out) == 1
    assert (out[0].key_a, out[0].key_b, out[0].n_cooccur) == ("a", "b", 2)


def test_spike_attribution(spark):
    import datetime

    from vector_spark.operators.anomaly import spike_attribution

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    # hour 0: k1 x2, k2 x2 (total 4); hour 1: k1 x8, k2 x2 (total 10,
    # delta +6, all of it k1's)
    rows += [("k1", t0)] * 2 + [("k2", t0)] * 2
    t1 = t0 + datetime.timedelta(hours=1)
    rows += [("k1", t1)] * 8 + [("k2", t1)] * 2
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    out = sorted(
        spike_attribution(df, "k", top_k=1).collect(),
        key=lambda r: r.window_start,
    )
    first, second = out
    # first window has no baseline: delta == n_events, top key by count
    assert (first.n_events, first.delta, first.key, first.key_delta) == (
        4, 4, "k1", 2,
    )
    assert (second.n_events, second.delta) == (10, 6)
    assert (second.key, second.key_delta, second.delta_share) == (
        "k1", 6, 1.0,
    )
