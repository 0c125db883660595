"""vector_spark — a PySpark-native log/telemetry pipeline engine.

A from-scratch reimplementation of the query/data-processing capabilities of
the reference observability pipeline (sources → transforms → sinks; see
SURVEY.md), re-expressed Spark-first: the component DAG is a DataFrame
dataflow, transforms are pure ``DataFrame -> DataFrame`` (or
``DataFrame -> dict[str, DataFrame]`` for multi-output) functions, VRL-style
remap programs are column expressions + vectorized pandas UDFs, and
sources/sinks are Spark readers/writers.

Layout
------
- ``session``    — tuned SparkSession builder (AQE, Arrow, shuffle partitions)
- ``tables``     — deterministic synthetic ``sequences`` generator (the
  BASELINE input table) + enrichment dimensions + testdata loaders
- ``conditions`` — VRL-subset predicate compiler → ``pyspark.sql.Column``
- ``operators``  — the 14 reference transforms (filter, route, sample,
  throttle, dedupe, reduce, aggregate, log_to_metric, ...)
- ``functions``  — the VRL stdlib surface (parse_*, string, crypto, ip, ...)
- ``plans``      — config-dict → validated DAG → composed DataFrame program
- ``sources``/``sinks`` — readers / partitioned writers / manifest checkpoint
- ``streaming``  — Structured Streaming variants of the stateful operators
- ``dataprep``   — training-data pipeline ops: dedup (exact/minhash/simhash),
  similarity search, text analysis, multimodal plumbing
"""

__version__ = "0.1.0"
