"""`vector test` harness parity: run_config_tests over the reference
TOML test format (examples/tests/*.toml)."""

from __future__ import annotations

from vector_spark.plans.topology import run_config_tests

FIXTURES = [
    "examples/tests/pipeline_behavior.toml",
    "examples/tests/dedupe_reduce.toml",
]


def test_fixture_behavior_tests_pass(spark):
    for path in FIXTURES:
        for res in run_config_tests(spark, path):
            assert res["passed"], (path, res)


def test_failing_condition_is_reported(spark):
    cfg = {
        "transforms": {
            "keep": {"inputs": ["ignored"], "type": "filter",
                     "condition": '.level == "error"'}
        },
        "tests": [
            {
                "name": "wrong expectation",
                "inputs": [
                    {"insert_at": "keep",
                     "log_fields": {"message": "x", "level": "error"}}
                ],
                "outputs": [
                    {"extract_from": "keep",
                     "conditions": [
                         {"type": "vrl", "source": '.level == "warn"'}
                     ]}
                ],
            },
            {
                "name": "no-output violation",
                "inputs": [
                    {"insert_at": "keep",
                     "log_fields": {"message": "x", "level": "error"}}
                ],
                "no_outputs_from": ["keep"],
            },
        ],
    }
    res = run_config_tests(spark, cfg)
    assert [r["passed"] for r in res] == [False, False]
    assert "fail condition" in res[0]["failures"][0]
    assert "expected none" in res[1]["failures"][0]


def test_insert_bypasses_upstream(spark):
    """Injecting mid-graph prunes unrelated components (the reference
    builds the unit-test topology only from paths between inputs and
    outputs)."""
    cfg = {
        "transforms": {
            "up": {"inputs": ["missing_source"], "type": "filter",
                   "condition": ".x > 0"},
            "down": {"inputs": ["up"], "type": "filter",
                     "condition": ".x > 1"},
        },
        "tests": [
            {
                "name": "inject at down",
                "inputs": [{"insert_at": "down", "log_fields": {"x": 5}}],
                "outputs": [
                    {"extract_from": "down",
                     "conditions": [{"type": "vrl", "source": ".x == 5"}]}
                ],
            }
        ],
    }
    res = run_config_tests(spark, cfg)
    assert res[0]["passed"], res
