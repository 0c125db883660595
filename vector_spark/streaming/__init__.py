from vector_spark.streaming.stream import (  # noqa: F401
    stream_aggregate,
    stream_dedupe,
    stream_reduce_sessions,
    stream_sample,
    stream_tag_cardinality,
    stream_throttle,
    use_default_state,
    use_rocksdb_state,
)
