from vector_spark.plans.topology import Topology, compile_config, run_unit_test  # noqa: F401
