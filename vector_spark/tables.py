"""Deterministic synthetic tables + testdata loaders.

The primary input table is ``sequences`` — the BASELINE.json ``input_hint``
shape ``(doc_id:string, tokens:array<int>, n_tok:int, source:string)`` — the
moral equivalent of the reference's ``demo_logs`` deterministic generator
(reference src/sources/demo_logs.rs:105-161). Generation is pure column
expressions over ``spark.range`` (fully distributed, seed-free deterministic:
every cell is a closed-form function of the row index), so the identical table
can be re-synthesized by any engine; :func:`sequences_sql` emits the matching
DuckDB SQL used by the correctness oracle.

Generation rules (FIXTURES.md F1):
- ``doc_id   = 'doc-%012d' % i``
- ``n_tok    = 16 + i % 241``
- ``tokens[j]= (i*1_000_003 + j*7919) % 50257``
- ``source``  : skewed categorical via ``u = (i*2654435761) % 100`` with
  ``app`` ≈ 45% of rows (exercises skew handling / salting)
- derived ``event_ts = '2024-01-01' + (i % 86400) seconds`` (data-derived so
  windowed aggregates are reproducible; the reference windows are wall-clock,
  see SURVEY.md §2.8)
- derived ``message`` : Apache-common-like log line whose fields are all
  closed-form in ``i`` — gives the grok/regex parse stage real work with a
  computable ground truth.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# skewed source distribution: cumulative % thresholds over u in [0, 100)
SOURCE_BUCKETS = [
    ("app", 45),
    ("web", 65),
    ("db", 75),
    ("cache", 83),
    ("auth", 90),
    ("batch", 95),
    ("edge", 98),
    ("misc", 100),
]

_EPOCH = "2024-01-01 00:00:00"
# HTTP status cycle for the synthetic log line (makes routing interesting)
_STATUSES = [200, 200, 301, 404, 500]


def _source_case(u: Column) -> Column:
    expr = None
    for name, hi in SOURCE_BUCKETS:
        cond = u < F.lit(hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return expr


def sequences(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """The BASELINE input table, generated distributed via ``spark.range``.

    At the 10^12 tier this generator is replaced by an Iceberg table scan;
    the schema and every downstream operator are identical.
    """
    df = spark.range(0, n, 1, partitions) if partitions else spark.range(n)
    i = F.col("id")
    u = (i * F.lit(2654435761)) % 100
    return df.select(
        F.format_string("doc-%012d", i).alias("doc_id"),
        F.transform(
            F.sequence(F.lit(0), (F.lit(15) + i % 241)),
            lambda j: ((i * 1_000_003 + j * 7919) % 50257).cast("int"),
        ).alias("tokens"),
        (F.lit(16) + i % 241).cast("int").alias("n_tok"),
        _source_case(u).alias("source"),
        i.alias("_i"),  # lineage: row index (dropped by pipeline outputs)
    )


def with_event_ts(df: DataFrame) -> DataFrame:
    """Data-derived timestamp column (reproducible windowing)."""
    return df.withColumn(
        "event_ts",
        F.timestamp_seconds(F.unix_timestamp(F.lit(_EPOCH)) + F.col("_i") % 86400),
    )


def with_message(df: DataFrame) -> DataFrame:
    """Deterministic Apache-common-like log line derived from the row index.

    ``host-H.dcD - userU [YYYY-mm-dd HH:MM:SS] "GET /p/T HTTP/1.1" S B``
    where every field is closed-form in ``i`` (ground truth computable by the
    oracle): H=i%10, D=i%3, U=i%97, T=tokens[0]=(i*1000003)%50257,
    S=cycle(200,200,301,404,500), B=n_tok.
    """
    i = F.col("_i")
    if "event_ts" not in df.columns:
        df = with_event_ts(df)
    status = F.element_at(
        F.array(*[F.lit(s) for s in _STATUSES]), (i % 5 + 1).cast("int")
    )
    return df.withColumn(
        "message",
        F.concat(
            F.lit("host-"), (i % 10).cast("string"),
            F.lit(".dc"), (i % 3).cast("string"),
            F.lit(" - user"), (i % 97).cast("string"),
            F.lit(" ["), F.date_format("event_ts", "yyyy-MM-dd HH:mm:ss"),
            F.lit('] "GET /p/'), ((i * 1_000_003) % 50257).cast("string"),
            F.lit(' HTTP/1.1" '), status.cast("string"),
            F.lit(" "), F.col("n_tok").cast("string"),
        ),
    )


def sequences_sql(n: int, with_derived: bool = False) -> str:
    """DuckDB SQL producing the identical table (the oracle's generator).

    With ``with_derived``, also emits ``event_ts`` and ``message`` exactly as
    :func:`with_event_ts` / :func:`with_message` compute them.
    """
    case = "CASE " + " ".join(
        f"WHEN (i*2654435761) % 100 < {hi} THEN '{name}'"
        for name, hi in SOURCE_BUCKETS
    ) + " END"
    derived = ""
    if with_derived:
        statuses = ",".join(str(s) for s in _STATUSES)
        derived = f""",
      TIMESTAMP '2024-01-01 00:00:00' + (i % 86400) * INTERVAL 1 SECOND AS event_ts,
      'host-' || (i % 10) || '.dc' || (i % 3) || ' - user' || (i % 97)
        || ' [' || strftime(TIMESTAMP '2024-01-01 00:00:00' + (i % 86400) * INTERVAL 1 SECOND, '%Y-%m-%d %H:%M:%S')
        || '] "GET /p/' || ((i * 1000003) % 50257)
        || ' HTTP/1.1" ' || ([{statuses}])[(i % 5)::INT + 1]
        || ' ' || (16 + i % 241) AS message"""
    return f"""
    SELECT
      printf('doc-%012d', i) AS doc_id,
      list_transform(range(0, (16 + i % 241)::BIGINT),
                     j -> ((i*1000003 + j*7919) % 50257)::INT) AS tokens,
      (16 + i % 241)::INT AS n_tok,
      {case} AS source,
      i AS _i{derived}
    FROM range({n}) t(i)
    """


# --- enrichment dimension (≙ reference CSV enrichment table,
# src/enrichment_tables/file.rs) — exactly one row per key --------------------

ENRICH_ROWS = [
    # (source, team, tier, region)
    ("app", "team-0", 1, "us"),
    ("web", "team-1", 2, "eu"),
    ("db", "team-2", 3, "ap"),
    ("cache", "team-3", 1, "us"),
    ("auth", "team-0", 2, "eu"),
    ("batch", "team-1", 3, "ap"),
    ("edge", "team-2", 1, "us"),
    ("misc", "team-3", 2, "eu"),
]


def enrich_sources(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        ENRICH_ROWS, "source string, team string, tier int, region string"
    )


def enrich_sources_sql() -> str:
    rows = ", ".join(f"('{s}','{t}',{k},'{r}')" for s, t, k, r in ENRICH_ROWS)
    return (
        f"SELECT * FROM (VALUES {rows}) AS dim(source, team, tier, region)"
    )


def _planned_splits(path: str) -> int:
    """Scan parallelism Spark will plan for ``path``: one split per data
    file here (every fixture file is a single parquet row group far below
    ``spark.sql.files.maxPartitionBytes``, and a row group is the atomic
    parquet split unit — byte-range splitting cannot divide it)."""
    import os

    if os.path.isfile(path):
        return 1
    try:
        n = 0
        for _root, dirs, files in os.walk(path):
            # skip hidden/metadata dirs (e.g. _delta_log, .crc shadows) but
            # descend into hive-partition key=value dirs
            dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
            n += sum(
                1
                for f in files
                if f.endswith(".parquet") and not f.startswith(("_", "."))
            )
        return max(1, n)
    except OSError:
        return 1


def load(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = True
) -> DataFrame:
    """Load one driver-generated testdata table (TESTDATA.md).

    At real scale an Iceberg/parquet table arrives as hundreds of file
    splits and the scan parallelizes on its own. The small-SF fixtures are
    single-row-group files, whose scans plan as ONE task no matter how many
    cores exist — so every CPU-bound per-row stage (regex parse, gram
    hashing, UDF decode) downstream would run single-threaded. When the
    planned scan parallelism is below the session default, spread the rows
    with one narrow round-robin repartition: the same split fan-out
    Iceberg's split planning gives for free on real tables, paid once per
    query as a tiny exchange (the whole file is < 2 MiB at sf0.1).
    Predicate pushdown and column pruning pass through the Exchange
    unchanged (pinned in test_plans.py)."""
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    if spread:
        goal = spark.sparkContext.defaultParallelism
        if _planned_splits(path) < goal:
            df = df.repartition(goal)
    return df
