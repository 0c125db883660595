"""docker_logs source (sources/docker.py) vs reference
src/sources/docker_logs/mod.rs."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_spark.sources import docker

CONTAINERS = [
    ("aaa111", "web-1", "nginx:1.25", {"tier": "app"}, "2024-01-01"),
    ("bbb222", "web-2", "nginx", {"tier": "app", "canary": ""}, "2024-01-02"),
    ("ccc333", "db-1", "postgres:16", {"tier": "db"}, "2024-01-03"),
    ("ddd444", "job-9", "busybox:musl", {}, "2024-01-04"),
]
SCHEMA = ("container_id string, name string, image string, "
          "labels map<string,string>, created_at string")


def _ids(df):
    return {r.container_id for r in df.collect()}


def test_container_included_prefix_and_exclude(spark):
    c = spark.createDataFrame(CONTAINERS, SCHEMA)
    # include is a PREFIX match on id or name (mod.rs:196-219)
    assert _ids(docker.container_included(
        c, include_containers=["web-"])) == {"aaa111", "bbb222"}
    assert _ids(docker.container_included(
        c, include_containers=["ccc"])) == {"ccc333"}
    # exclusion wins over inclusion — the mod.rs:93-96 caveat
    assert _ids(docker.container_included(
        c, include_containers=["web-"],
        exclude_containers=["web-2"])) == {"aaa111"}
    assert _ids(docker.container_included(c)) == {
        "aaa111", "bbb222", "ccc333", "ddd444"}


def test_container_included_labels_and_images(spark):
    c = spark.createDataFrame(CONTAINERS, SCHEMA)
    assert _ids(docker.container_included(
        c, include_labels=["tier=app"])) == {"aaa111", "bbb222"}
    # bare key = present
    assert _ids(docker.container_included(
        c, include_labels=["canary"])) == {"bbb222"}
    # untagged image filter matches any tag; tagged is exact
    assert _ids(docker.container_included(
        c, include_images=["nginx"])) == {"aaa111", "bbb222"}
    assert _ids(docker.container_included(
        c, include_images=["postgres:16"])) == {"ccc333"}
    assert _ids(docker.container_included(
        c, include_images=["busybox:latest"])) == set()


def test_parse_docker_log_output(spark):
    rows = [
        ("c1", "stdout", 1, "2024-05-06T07:08:09.123Z hello world\n"),
        ("c1", "stdout", 2, "2024-05-06T07:08:10Z partial chunk"),
        ("c1", "stderr", 3, "2024-05-06T07:08:11+02:00 crlf line\r\n"),
        ("c1", "stdout", 4, "no timestamp here\n"),
    ]
    df = spark.createDataFrame(
        rows, "container_id string, stream string, line_no int, "
              "message string")
    got = {r.line_no: r for r in
           docker.parse_docker_log_output(df).collect()}
    assert got[1].message == "hello world" and not got[1].partial
    assert got[1].timestamp is not None
    assert got[2].message == "partial chunk" and got[2].partial
    assert got[3].message == "crlf line" and not got[3].partial
    # bad timestamp: keep the whole line, null timestamp (mod.rs:1046)
    assert got[4].message == "no timestamp here"
    assert got[4].timestamp is None and not got[4].partial


def test_merge_partial_events(spark):
    rows = [
        ("c1", "stdout", 1, "AAAA", True, "2024-01-01 00:00:01"),
        ("c1", "stdout", 2, "BBBB", True, "2024-01-01 00:00:02"),
        ("c1", "stdout", 3, "CC", False, "2024-01-01 00:00:03"),
        ("c1", "stdout", 4, "solo", False, "2024-01-01 00:00:04"),
        ("c1", "stderr", 5, "tail-partial", True, "2024-01-01 00:00:05"),
        ("c2", "stdout", 6, "other", False, "2024-01-01 00:00:06"),
    ]
    df = spark.createDataFrame(
        rows, "container_id string, stream string, line_no int, "
              "message string, partial boolean, timestamp string",
    ).withColumn("timestamp", F.col("timestamp").cast("timestamp"))
    out = {(r.container_id, r.stream, r.line_no): r
           for r in docker.merge_partial_events(df).collect()}
    merged = out[("c1", "stdout", 1)]
    # run concatenates with NO separator; first event's timestamp wins
    assert merged.message == "AAAABBBBCC" and not merged.partial
    assert str(merged.timestamp).startswith("2024-01-01 00:00:01")
    assert out[("c1", "stdout", 4)].message == "solo"
    # unterminated trailing run stays partial
    assert out[("c1", "stderr", 5)].partial
    assert out[("c2", "stdout", 6)].message == "other"
    # auto_partial_merge=false: pass-through + marker field
    flat = docker.merge_partial_events(df, auto_partial_merge=False)
    marked = {r.line_no: r._partial for r in flat.collect()}
    assert marked[1] is True and marked[4] is None


def test_annotate_containers(spark):
    c = spark.createDataFrame(CONTAINERS, SCHEMA)
    logs = spark.createDataFrame(
        [("aaa111", "stdout", 1, "hi")],
        "container_id string, stream string, line_no int, message string")
    out = docker.annotate_containers(logs, c, hostname="host-7").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.container_name, r.image, r.host, r.source_type) == (
        "web-1", "nginx:1.25", "host-7", "docker_logs")
    assert r.label["tier"] == "app"
    assert r.container_created_at == "2024-01-01"
