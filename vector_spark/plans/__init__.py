from vector_spark.plans.topology import (  # noqa: F401
    Topology,
    compile_config,
    graph_dot,
    run_unit_test,
    tap,
)
