"""kubernetes_logs decode (sources/kubernetes.py) vs the reference CRI /
docker parsers and partial_events_merger semantics."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from vector_spark.sources import kubernetes as k8s


def _cri_df(spark, rows):
    return spark.createDataFrame(
        rows, "file string, line_no long, value string"
    )


def test_parse_cri_fields_and_trailing_newline(spark):
    rows = k8s.parse_cri(
        _cri_df(spark, [
            ("f", 1, "2016-10-06T00:17:09.669794202Z stdout F log body"),
            ("f", 2, "2016-10-06T00:17:09.669794202Z stderr P partial \n"),
            ("f", 3, "not a cri line"),
        ])
    ).collect()
    assert len(rows) == 2  # non-matching line drops (ParserMatchError)
    fin = next(r for r in rows if not r.partial)
    assert (fin.stream, fin.message) == ("stdout", "log body")
    # nanosecond timestamp truncates to µs
    assert fin.timestamp.microsecond == 669794
    part = next(r for r in rows if r.partial)
    # single trailing newline trims; the space before it stays
    assert part.message == "partial "
    assert part.stream == "stderr"


def test_parse_docker_json_partial_heuristic(spark):
    big = "x" * k8s.DOCKER_SPLIT_THRESHOLD
    lines = [
        json.dumps({"log": "hello\n", "stream": "stdout",
                    "time": "2016-10-05T00:00:30.082640485Z"}),
        json.dumps({"log": big, "stream": "stdout",
                    "time": "2016-10-05T00:00:31.000000000Z"}),
        json.dumps({"log": big + "\n", "stream": "stdout",
                    "time": "2016-10-05T00:00:32.000000000Z"}),
    ]
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    rows = {r.timestamp_raw: r for r in k8s.parse_docker_json(df).collect()}
    r30 = rows["2016-10-05T00:00:30.082640485Z"]
    assert r30.message == "hello" and not r30.partial
    # exactly threshold bytes + no newline → partial
    assert rows["2016-10-05T00:00:31.000000000Z"].partial
    # threshold bytes WITH newline → final (docker.rs exception)
    assert not rows["2016-10-05T00:00:32.000000000Z"].partial


def test_merge_partial_runs(spark):
    ts = "2016-10-06T00:17:09.669794202Z"
    lines = [
        ("pod1", 1, f"{ts} stdout P First "),
        ("pod1", 2, f"{ts} stdout P line of "),
        ("pod1", 3, f"{ts} stdout F entry"),
        ("pod1", 4, f"{ts} stdout F whole"),
        # interleaved stderr stream merges independently
        ("pod1", 5, f"{ts} stderr F err-line"),
        # trailing unterminated partial run
        ("pod1", 6, f"{ts} stdout P dangling"),
        ("pod2", 1, f"{ts} stdout F other-pod"),
    ]
    parsed = k8s.parse_cri(_cri_df(spark, lines))
    out = k8s.merge_partial_lines(parsed).collect()
    msgs = {(r.file, r.stream, r.message): r for r in out}
    assert ("pod1", "stdout", "First line of entry") in msgs
    assert not msgs[("pod1", "stdout", "First line of entry")].partial
    assert ("pod1", "stdout", "whole") in msgs
    assert ("pod1", "stderr", "err-line") in msgs
    assert ("pod2", "stdout", "other-pod") in msgs
    dang = msgs[("pod1", "stdout", "dangling")]
    assert dang.partial  # flushed at end-of-input, flagged partial
    assert len(out) == 5


# --- pod-metadata dim tool + annotation ------------------------------------

PODLIST = {
    "kind": "PodList",
    "items": [
        {
            "metadata": {
                "name": "api-7f9c", "namespace": "prod",
                "uid": "uid-1",
                "labels": {"app": "api", "tier": "web"},
                "annotations": {"team": "core"},
                "ownerReferences": [
                    {"kind": "ReplicaSet", "name": "api-7f9c"},
                ],
            },
            "spec": {
                "nodeName": "node-a",
                "containers": [
                    {"name": "app", "image": "api:1.2"},
                    {"name": "sidecar", "image": "envoy:9"},
                ],
            },
            "status": {
                "podIP": "10.0.0.5",
                "podIPs": [{"ip": "10.0.0.5"}, {"ip": "fd00::5"}],
                "containerStatuses": [
                    {"name": "app", "imageID": "sha256:aa",
                     "containerID": "containerd://c1"},
                ],
            },
        },
        {"metadata": {"name": "bare", "namespace": "dev", "uid": "uid-2"},
         "spec": {}, "status": {}},
    ],
}


def test_pods_to_rows_flattens_per_container():
    import sys

    sys.path.insert(0, "tools")
    from k8s_metadata_dump import pods_to_rows

    rows = pods_to_rows(PODLIST)
    assert len(rows) == 3  # 2 containers + 1 pod-level row for `bare`
    app = next(r for r in rows if r["container_name"] == "app")
    assert app["pod_owner"] == "ReplicaSet/api-7f9c"
    assert app["pod_ips"] == ["10.0.0.5", "fd00::5"]
    assert app["container_image_id"] == "sha256:aa"
    side = next(r for r in rows if r["container_name"] == "sidecar")
    assert side["container_image"] == "envoy:9"
    assert side["container_id"] is None  # no status entry
    bare = next(r for r in rows if r["pod_name"] == "bare")
    assert bare["container_name"] is None and bare["pod_labels"] == {}


def test_parse_log_file_path_reference_case(spark):
    # path_helpers.rs::test_parse_log_file_path sandbox fixture
    from vector_spark.sources.kubernetes import parse_log_file_path

    df = spark.createDataFrame(
        [("/var/log/pods/sandbox0-ns_sandbox0-name_sandbox0-uid/"
          "sandbox0-container0-name/1.log",)],
        "file string",
    )
    (r,) = df.select(parse_log_file_path("file").alias("p")).collect()
    assert (
        r.p.pod_namespace, r.p.pod_name, r.p.pod_uid, r.p.container_name
    ) == ("sandbox0-ns", "sandbox0-name", "sandbox0-uid",
          "sandbox0-container0-name")


def test_annotate_pod_metadata_broadcast_join(spark, tmp_path):
    import json as _json
    import sys

    sys.path.insert(0, "tools")
    from k8s_metadata_dump import main as dump_main

    from vector_spark.sources.kubernetes import annotate_pod_metadata

    src = tmp_path / "pods.json"
    out = tmp_path / "dim.parquet"
    src.write_text(_json.dumps(PODLIST))
    assert dump_main(["x", str(src), str(out)]) == 0
    dim = spark.read.parquet(str(out))

    logs = spark.createDataFrame(
        [
            ("/var/log/pods/prod_api-7f9c_uid-1/app/0.log", "m1"),
            ("/var/log/pods/prod_api-7f9c_uid-1/sidecar/0.log", "m2"),
            ("/var/log/pods/other_gone_uid-9/x/0.log", "m3"),
        ],
        "file string, message string",
    )
    got = {
        r.message: r
        for r in annotate_pod_metadata(logs, dim).collect()
    }
    r1 = got["m1"]
    assert r1["kubernetes.pod_node_name"] == "node-a"
    assert r1["kubernetes.pod_owner"] == "ReplicaSet/api-7f9c"
    assert dict(r1["kubernetes.pod_labels"]) == {"app": "api", "tier": "web"}
    assert r1["kubernetes.container_image"] == "api:1.2"
    assert got["m2"]["kubernetes.container_image"] == "envoy:9"
    # unknown pod passes through with null metadata, keys still parsed
    r3 = got["m3"]
    assert r3["kubernetes.pod_namespace"] == "other"
    assert r3["kubernetes.pod_owner"] is None
    # the dim side must be broadcast (no event-stream shuffle)
    plan = annotate_pod_metadata(logs, dim)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan
