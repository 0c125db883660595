"""`vector test` CLI parity: run the [[tests]] sections embedded in a
pipeline config (reference src/config/unit_test/mod.rs + `vector test`).

Usage: python tools/vector_test.py examples/tests/*.toml
Exit code = number of failed tests.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from vector_spark.plans.topology import run_config_tests
from vector_spark.session import get_spark


def main() -> int:
    paths = sys.argv[1:]
    if not paths:
        print(__doc__)
        return 2
    spark = get_spark("vector_test", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    failed = 0
    for path in paths:
        print(f"Running tests in {path}")
        for res in run_config_tests(spark, path):
            if res["passed"]:
                print(f"  test {res['name']} ... ok")
            else:
                failed += 1
                print(f"  test {res['name']} ... FAILED")
                for f in res["failures"]:
                    print(f"    {f}")
    return failed


if __name__ == "__main__":
    sys.exit(main())
