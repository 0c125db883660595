from vector_spark.sources.readers import (  # noqa: F401
    demo_apache_lines,
    demo_syslog_lines,
    read_lines,
    read_table,
    with_lineage,
)
