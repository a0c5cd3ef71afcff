"""S2/S3 source operators: syslog header parse + JSON-lines field mapping."""

from __future__ import annotations

from sagan_spark.sources.jsonmap import FieldMap, map_json_lines
from sagan_spark.sources.syslog import parse_syslog


def test_parse_syslog(spark):
    rows = [
        ("<34>Oct 11 22:14:15 host1 sshd[4123]: Failed password for root",),
        ("<13>Jan  3 01:02:03 web02 cron: job started",),
        ("not a syslog line at all",),
    ]
    df = spark.createDataFrame(rows, "text string")
    out = parse_syslog(df).collect()
    r0 = out[0]
    assert (r0.syslog_pri, r0.syslog_facility, r0.syslog_severity) == (34, 4, 2)
    assert r0.syslog_host == "host1"
    assert r0.syslog_program == "sshd"
    assert r0.syslog_pid == 4123
    assert r0.syslog_msg == "Failed password for root"
    r1 = out[1]
    assert r1.syslog_program == "cron" and r1.syslog_pid is None
    assert r1.syslog_msg == "job started"
    r2 = out[2]
    assert r2.syslog_pri is None and r2.syslog_host is None


def test_map_json_lines(spark):
    rows = [
        ('{"cid":"c1","n":0,"who":"user","body":"hello","via":"none","at":"2025-01-01 00:00:01"}',),
        ('{"cid":"c1","n":1,"who":"assistant","body":"hi","at":"2025-01-01 00:00:05"}',),
    ]
    df = spark.createDataFrame(rows, "raw string")
    fmap = FieldMap(
        conv_id="cid", turn_idx="n", role="who", text="body", tool="via", ts="at",
        defaults=(("via", "none"),),
    )
    out = map_json_lines(df, "raw", fmap).collect()
    assert [f.name for f in map_json_lines(df, "raw", fmap).schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    ]
    assert out[0].conv_id == "c1" and out[0].turn_idx == 0 and out[0].tool == "none"
    assert out[1].tool == "none"  # default applied to missing key
    assert out[1].ts is not None


def test_mapped_json_feeds_pipeline(spark):
    """S2 → E1: JSON-lines mapped input runs through the full engine."""
    from sagan_spark.engine.pipeline import build_alerts

    rows = [
        (
            f'{{"cid":"c9","n":{i},"who":"assistant","body":"an error occurred: tool timeout",'
            f'"via":"bash","at":"2025-01-01 00:00:{i:02d}"}}',
        )
        for i in range(3)
    ]
    df = spark.createDataFrame(rows, "raw string")
    tx = map_json_lines(df, "raw", FieldMap(conv_id="cid", turn_idx="n", role="who", text="body", tool="via", ts="at"))
    alerts = build_alerts(spark, tx)
    sids = {r.sid for r in alerts.select("sid").distinct().collect()}
    assert 1000001 in sids  # role=assistant + content error + pcre tool timeout
