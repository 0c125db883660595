"""apache_metrics / nginx_metrics status parsers (sources/server_status.py)
vs reference src/sources/apache_metrics/parser.rs and
src/sources/nginx_metrics/{parser.rs,mod.rs}."""

from __future__ import annotations

from vector_spark.sources import server_status as SS

APACHE_BODY = """localhost
ServerVersion: Apache/2.4.46 (Unix)
ServerMPM: event
Server Built: Aug  5 2020 23:20:17
CurrentTime: Thursday, 03-Sep-2020 20:48:54 UTC
RestartTime: Thursday, 03-Sep-2020 20:48:41 UTC
ParentServerConfigGeneration: 1
ParentServerMPMGeneration: 0
ServerUptimeSeconds: 12
ServerUptime: 12 seconds
Load1: 0.75
Load5: 0.59
Load15: 0.76
Total Accesses: 30
Total kBytes: 217
Total Duration: 11
CPUUser: .2
CPUSystem: .02
CPUChildrenUser: 0
CPUChildrenSystem: 0
CPULoad: 1.83
Uptime: 12
ReqPerSec: 2.5
BytesPerSec: 18517.3
BytesPerReq: 7406.93
DurationPerReq: .366667
BusyWorkers: 1
IdleWorkers: 74
Processes: 3
Stopping: 0
BusyDnsWorkers: 0
IdleDnsWorkers: 0
ConnsTotal: 1
ConnsAsyncWriting: 0
ConnsAsyncKeepAlive: 0
ConnsAsyncClosing: 0
Scoreboard: ____S_____I______R____I_______KK___D__C__G_L____________W__________________.....................................................................................................................................................................................................................................................................................................................................
"""

NGINX_BODY = (
    "Active connections: 291 \n"
    "server accepts handled requests\n"
    " 16630948 16630948 31070465 \n"
    "Reading: 6 Writing: 179 Waiting: 106 \n"
)


def _rows(spark, parser, body):
    df = spark.createDataFrame([(1, body)], "rid int, body string")
    out = parser(df).collect()
    return {
        (r.name, r.tag_key, r.tag_val): (r.metric_type, r.kind, r.value)
        for r in out
    }


def test_apache_full_body(spark):
    m = _rows(spark, SS.parse_apache_status, APACHE_BODY)
    assert m[("uptime_seconds_total", None, None)] == ("counter", "absolute", 12.0)
    assert m[("access_total", None, None)] == ("counter", "absolute", 30.0)
    assert m[("sent_bytes_total", None, None)] == ("counter", "absolute", 217.0 * 1024)
    assert m[("duration_seconds_total", None, None)] == ("counter", "absolute", 11.0)
    assert m[("cpu_seconds_total", "type", "user")] == ("gauge", "absolute", 0.2)
    assert m[("cpu_seconds_total", "type", "system")] == ("gauge", "absolute", 0.02)
    assert m[("cpu_seconds_total", "type", "children_user")][2] == 0.0
    assert m[("cpu_load", None, None)] == ("gauge", "absolute", 1.83)
    assert m[("workers", "state", "idle")][2] == 74.0
    assert m[("workers", "state", "busy")][2] == 1.0
    assert m[("connections", "state", "total")][2] == 1.0
    assert m[("connections", "state", "writing")][2] == 0.0
    # scoreboard: every state present, counts from the body's char counts
    sb = APACHE_BODY.split("Scoreboard: ")[1].strip()
    for ch, state in SS.SCOREBOARD:
        assert m[("scoreboard", "state", state)] == (
            "gauge", "absolute", float(sb.count(ch))
        ), state
    assert len(m) == 15 + 11


def test_apache_missing_keys_skip_rows(spark):
    m = _rows(spark, SS.parse_apache_status,
              "ServerUptimeSeconds: 5\nBusyWorkers: 2\n")
    assert set(m) == {
        ("uptime_seconds_total", None, None), ("workers", "state", "busy")
    }


def test_nginx_stub_status(spark):
    m = _rows(spark, SS.parse_nginx_stub_status, NGINX_BODY)
    assert m[("connections_active", None, None)] == ("gauge", "absolute", 291.0)
    assert m[("connections_accepted_total", None, None)] == (
        "counter", "absolute", 16630948.0
    )
    assert m[("connections_handled_total", None, None)] == (
        "counter", "absolute", 16630948.0
    )
    assert m[("http_requests_total", None, None)] == (
        "counter", "absolute", 31070465.0
    )
    assert m[("connections_reading", None, None)][2] == 6.0
    assert m[("connections_writing", None, None)][2] == 179.0
    assert m[("connections_waiting", None, None)][2] == 106.0
    assert len(m) == 7


def test_nginx_malformed_yields_nothing(spark):
    m = _rows(spark, SS.parse_nginx_stub_status, "<html>not a status page</html>")
    assert m == {}
