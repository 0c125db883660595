"""The transform library — all 14 reference transforms, Spark-first.

Each operator is a pure function ``DataFrame -> DataFrame`` (or
``-> dict[str, DataFrame]`` for multi-output transforms like route/remap's
dropped channel), mirroring the reference transform inventory in SURVEY.md
§2.1. Stateless ("Function"/"Sync" flavor) transforms are narrow column ops;
stateful ("Task" flavor) transforms are window/groupBy aggregations.
"""

from vector_spark.operators.filter import filter_events
from vector_spark.operators.route import exclusive_route, route
from vector_spark.operators.sample import sample
from vector_spark.operators.throttle import throttle
from vector_spark.operators.dedupe import dedupe
from vector_spark.operators.reduce import reduce_events
from vector_spark.operators.aggregate import aggregate_metrics
from vector_spark.operators.log_to_metric import log_to_metric
from vector_spark.operators.metric_to_log import metric_to_log
from vector_spark.operators.tag_cardinality import tag_cardinality_limit
from vector_spark.operators.enrich import enrich, enrich_between_dates
from vector_spark.operators.remap import remap

__all__ = [
    "filter_events", "route", "exclusive_route", "sample", "throttle",
    "dedupe", "reduce_events", "aggregate_metrics", "log_to_metric",
    "metric_to_log", "tag_cardinality_limit", "enrich",
    "enrich_between_dates", "remap",
]
from vector_spark.operators.script import script_transform  # noqa: E402,F401
from vector_spark.operators.ec2_metadata import aws_ec2_metadata  # noqa: E402,F401
from vector_spark.operators.templates import (  # noqa: E402,F401
    log_templates,
    template_outliers,
)
