from vector_spark.sinks.writers import write_routes, write_sink  # noqa: F401
from vector_spark.sinks.manifest import CheckpointedJob  # noqa: F401
