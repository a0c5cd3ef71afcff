"""Streaming state TTL (ProcessingTimeTimeout eviction) and the
late-turn drop-and-count policy (SURVEY §2.7 production behaviors).

TTL caveat encoded here: with processing-time timers pending, Structured
Streaming schedules batches continuously and ``processAllAvailable`` never
settles — the TTL test therefore uses a processingTime trigger plus output
polling with a sentinel conversation that proves the decisive batch ran.
"""

from __future__ import annotations

import os
import time

import pandas as pd

from sagan_spark.streaming import pipeline as stream_pipeline

_TS0 = pd.Timestamp("2025-03-01 10:00:00")

LOGIN = "authentication attempt: login failed for account"
SUDO = "escalation: sudo command issued by the agent"


def _write(rows, path):
    """Write a micro-batch file with the exact transcript parquet schema
    (timestamp[us], int32 turn_idx) — pandas' default nanos would not read
    back as timestamp_ntz. rows: (conv_id, turn_idx, text, offset_s)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sagan_spark.datagen.transcripts import SCHEMA

    pdf = pd.DataFrame(
        {
            "conv_id": [r[0] for r in rows],
            "turn_idx": pd.array([r[1] for r in rows], dtype="int32"),
            "role": ["user"] * len(rows),
            "text": [r[2] for r in rows],
            "tool": ["none"] * len(rows),
            "ts": pd.Series(
                [_TS0 + pd.Timedelta(seconds=r[3]) for r in rows]
            ).astype("datetime64[us]"),
        }
    )
    pq.write_table(pa.Table.from_pandas(pdf, schema=SCHEMA, preserve_index=False), path)


def _fired_1000012(spark, out_dir) -> set:
    p = os.path.join(out_dir, "unified2")
    if not os.path.exists(p):
        return set()
    try:
        return {
            (r.conv_id, r.turn_idx)
            for r in spark.read.parquet(p).filter("sid = 1000012").collect()
        }
    except Exception:  # dir exists but no parquet committed yet
        return set()


def _await_commit(ck: str, batch_id: int, deadline: float) -> None:
    p = os.path.join(ck, "commits", str(batch_id))
    while time.time() < deadline and not os.path.exists(p):
        time.sleep(0.25)
    assert os.path.exists(p), f"batch {batch_id} never committed"


def test_ttl_evicts_idle_conversation_state(spark, tmp_path):
    """convA sets the auth_fail bit, then idles past the TTL. Timer
    eviction fires for keys with an expired timer and no data in a batch
    — with timers pending Spark also schedules EMPTY batches continuously
    (observed in test_stream_track_ttl_at_10k_keys), but this test doesn't
    rely on that: f2 carries unrelated convB data to host the eviction
    deterministically; f3 then
    carries convA's sudo turn plus a convC setter+checker sentinel that
    proves f3 was fully processed."""
    in_dir, out, ck = (str(tmp_path / d) for d in ("in", "out", "ck"))
    os.makedirs(in_dir)
    q = stream_pipeline.run_stream(
        spark,
        in_dir,
        out,
        ck,
        max_files_per_trigger=1,
        state_ttl_minutes=0.0008,  # ~48ms
        trigger_processing_time="1 second",
    )
    deadline = time.time() + 90
    try:
        _write([("convA", 0, LOGIN, 0)], os.path.join(in_dir, "f1.parquet"))
        _await_commit(ck, 0, deadline)
        time.sleep(2)  # >> TTL: convA's timer is now expired
        _write([("convB", 0, LOGIN, 0)], os.path.join(in_dir, "f2.parquet"))
        _await_commit(ck, 1, deadline)  # eviction batch (convA timed out here)
        _write(
            [
                ("convA", 1, SUDO, 10),
                ("convC", 0, LOGIN, 0),
                ("convC", 1, SUDO, 10),
            ],
            os.path.join(in_dir, "f3.parquet"),
        )
        fired = set()
        while time.time() < deadline:
            fired = _fired_1000012(spark, out)
            if ("convC", 1) in fired:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    assert ("convC", 1) in fired, "sentinel never fired — stream did not process f3"
    assert ("convA", 1) not in fired, "state survived past TTL"


def test_no_ttl_keeps_state(spark, tmp_path):
    """Control: identical delivery without TTL — the bit survives the
    idle gap and convA's sudo fires."""
    in_dir, out, ck = (str(tmp_path / d) for d in ("in", "out", "ck"))
    os.makedirs(in_dir)
    q = stream_pipeline.run_stream(spark, in_dir, out, ck, max_files_per_trigger=1)
    try:
        _write([("convA", 0, LOGIN, 0)], os.path.join(in_dir, "f1.parquet"))
        q.processAllAvailable()
        time.sleep(1.5)
        _write([("convA", 1, SUDO, 10)], os.path.join(in_dir, "f2.parquet"))
        q.processAllAvailable()
    finally:
        q.stop()
    assert ("convA", 1) in _fired_1000012(spark, out), "flexbit state lost without TTL"


def test_streaming_role_track_ordered_equals_batch(spark, tmp_path):
    """Role-tracked (by_username) counters in streaming: arrival-order
    semantics match the batch engine's event-time replay when the source
    delivers in event-time order — verified against the batch pipeline."""
    from sagan_spark.engine import pipeline as batch_pipeline
    from sagan_spark.rules.model import AfterSpec, ContentSpec, Rule, RuleSet

    rs = RuleSet(
        (
            Rule(
                sid=4000001,
                msg="role-wide retry window",
                sink="fast",
                contents=(ContentSpec("retry",),),
                after=AfterSpec(track="role", count=2, seconds=900),
            ),
        )
    )
    RETRY_TXT = "transient failure, scheduling a retry with backoff"
    in_dir, out, ck = (str(tmp_path / d) for d in ("in", "out", "ck"))
    os.makedirs(in_dir)
    q = stream_pipeline.run_stream(spark, in_dir, out, ck, ruleset=rs, max_files_per_trigger=1)
    try:
        _write(
            [("convA", 0, RETRY_TXT, 0), ("convA", 1, RETRY_TXT, 10)],
            os.path.join(in_dir, "f1.parquet"),
        )
        q.processAllAvailable()
        _write(
            [("convB", 0, RETRY_TXT, 100), ("convB", 1, RETRY_TXT, 110)],
            os.path.join(in_dir, "f2.parquet"),
        )
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        (r.conv_id, r.turn_idx)
        for r in spark.read.parquet(os.path.join(out, "fast"))
        .filter("sid = 4000001")
        .collect()
    )
    ref = batch_pipeline.run(spark, in_dir, rs)
    want = sorted(
        (r.conv_id, r.turn_idx)
        for r in ref.alerts.select("conv_id", "turn_idx").collect()
    )
    ref.unpersist()
    assert got == want == [("convB", 0), ("convB", 1)], (got, want)


def test_late_turn_dropped_not_replayed(spark, tmp_path):
    """A turn at/below the conversation's replayed high-water mark is
    dropped (and counted in state), never replayed out of order."""
    in_dir, out, ck = (str(tmp_path / d) for d in ("in", "out", "ck"))
    os.makedirs(in_dir)
    q = stream_pipeline.run_stream(spark, in_dir, out, ck, max_files_per_trigger=1)
    try:
        _write(
            [("convA", 0, LOGIN, 0), ("convA", 1, SUDO, 10)],
            os.path.join(in_dir, "f1.parquet"),
        )
        q.processAllAvailable()
        # f2: late re-delivery of turn 1 plus a genuinely new turn 2
        _write(
            [("convA", 1, SUDO, 10), ("convA", 2, SUDO, 20)],
            os.path.join(in_dir, "f2.parquet"),
        )
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(_fired_1000012(spark, out))
    # turn 1 fired once (re-delivery dropped), turn 2 fired
    assert got == [("convA", 1), ("convA", 2)], got
