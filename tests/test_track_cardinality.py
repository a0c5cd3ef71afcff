"""Track-keyed correlation at HIGH key cardinality (the real Sagan
`by_username` regime: thousands-to-millions of distinct users, not the
4-value role column of the dense fixture).

Covers, at ≥10^4 distinct track keys:
- batch track-keyed replay ≡ pandas oracle (global per-(key, sid)
  counters, cross-conversation),
- streaming track-keyed applyInPandasWithState ≡ batch across
  micro-batches,
- bounded state: the per-key conversation high-water-mark map respects
  ``hwm_cap`` (state size must not grow with conversations-ever-seen).

Scale note (measured here, recorded in docs/SCALE.md): ``repartition(col)``
hash-partitions track keys into ``spark.sql.shuffle.partitions`` tasks —
partition COUNT does not grow with cardinality; effective PARALLELISM is
min(cardinality, shuffle partitions). 4-value role tracks cap at 4 busy
tasks; a 10^4-username track fills every partition.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pytest

from sagan_spark.rules.model import AfterSpec, ContentSpec, Rule, RuleSet

N_USERS = 10_000
SID = 4200001
_T0 = pd.Timestamp("2024-05-01 09:00:00")


def _ruleset() -> RuleSet:
    # fires on a user's 3rd in-window event, anywhere across conversations
    return RuleSet(
        (
            Rule(
                sid=SID,
                msg="per-user retry storm",
                sink="fast",
                contents=(ContentSpec("retry",),),
                # window wider than the fixture's full 30k-second span, so
                # every user's 3rd event fires exactly once
                after=AfterSpec(track="role", count=2, seconds=100_000),
            ),
        )
    )


@pytest.fixture(scope="module")
def hicard_pdf() -> pd.DataFrame:
    """3 turns per user, each in its OWN conversation (global counting must
    cross conversations), globally interleaved in time by a deterministic
    shuffle so one user's events are far apart in the event stream."""
    rng = np.random.RandomState(7)
    users = [f"user{u:05d}" for u in range(N_USERS)]
    rows = [(u, j) for u in users for j in range(3)]
    order = rng.permutation(len(rows))
    recs = []
    for k, oi in enumerate(np.argsort(order)):
        u, j = rows[oi]
        recs.append(
            {
                "conv_id": f"c-{u}-{j}",
                "turn_idx": 0,
                "role": u,
                "text": f"retry attempt {j}",
                "tool": "none",
                "ts": _T0 + pd.Timedelta(seconds=k),
            }
        )
    pdf = pd.DataFrame.from_records(recs)
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    return pdf


@pytest.fixture(scope="module")
def hicard_path(hicard_pdf, tmp_path_factory) -> str:
    p = str(tmp_path_factory.mktemp("hicard") / "in")
    os.makedirs(p)
    # 4 files split by global ts order → streaming arrival order = event order
    n = len(hicard_pdf)
    for i in range(4):
        hicard_pdf.iloc[i * n // 4 : (i + 1) * n // 4].to_parquet(
            os.path.join(p, f"batch-{i:03d}.parquet"), index=False
        )
    return p


def test_batch_track_replay_at_10k_keys(spark, hicard_path, hicard_pdf):
    from sagan_spark.engine import pipeline
    from sagan_spark.oracle.pandas_engine import run_oracle

    rs = _ruleset()
    res = pipeline.run(spark, hicard_path, rs)
    ora = run_oracle(hicard_pdf, rs)
    # every user fires exactly once (3rd event; window » total span)
    assert res.sid_counts == {SID: N_USERS} == ora.sid_counts
    got = {(r.conv_id, r.turn_idx) for r in res.alerts.select("conv_id", "turn_idx").collect()}
    want = {(a["conv_id"], a["turn_idx"]) for a in ora.alerts}
    assert got == want
    res.unpersist()


def test_stream_track_replay_at_10k_keys(spark, hicard_path, hicard_pdf, tmp_path):
    """10^4 concurrent GroupState keys across 4 micro-batches — output must
    equal the batch run exactly. (TTL stays off here: processAllAvailable
    never settles under pending processing-time timers — see run_stream's
    docstring; idle-key eviction itself is covered by test_streaming_ttl.)"""
    from sagan_spark.engine import pipeline as batch_pipeline
    from sagan_spark.streaming import pipeline as stream_pipeline

    rs = _ruleset()
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    q = stream_pipeline.run_stream(
        spark, hicard_path, out, ck, rs, max_files_per_trigger=1
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.conv_id, r.turn_idx)
        for r in spark.read.parquet(os.path.join(out, "fast"))
        .select("conv_id", "turn_idx")
        .collect()
    }
    ref = batch_pipeline.run(spark, hicard_path, rs)
    want = {(r.conv_id, r.turn_idx) for r in ref.alerts.select("conv_id", "turn_idx").collect()}
    ref.unpersist()
    assert len(got) == N_USERS
    assert got == want


def test_stream_track_ttl_at_10k_keys(spark, tmp_path):
    """TTL × high cardinality TOGETHER — the production username regime
    (r4 verdict gap: test_streaming_ttl evicts 1 key, the 10^4-key test
    ran TTL-off because processAllAvailable never settles under pending
    processing-time timers). Driven by a processingTime trigger +
    commit/output polling instead.

    Timeline (eviction fires for keys with an EXPIRED timer and NO data
    in the batch; keys WITH data are invoked normally and keep state):
      f1: all 10^4 users get events 1+2   → every counter at 2
      sleep >> TTL                        → every timer expired
      f2: LIVE half's 3rd event           → live keys still hold state →
          all 5k fire; the 5k idle keys have no data here → EVICTED
      f3: IDLE half's 3rd event + sentinel→ idle state is gone, counter
          restarts at 1 → NO idle fires; sentinel (3 events in-batch)
          fires, proving f3 was fully processed."""
    import time

    from sagan_spark.streaming import pipeline as stream_pipeline

    n = N_USERS
    users = [f"user{u:05d}" for u in range(n)]
    live, idle = users[: n // 2], users[n // 2 :]
    TTL_S = 24  # must outlive one ~10s batch (f1) so f2's data beats the timer

    def _mk(rows):
        recs = [
            {
                "conv_id": f"c-{u}-{j}",
                "turn_idx": 0,
                "role": u,
                "text": f"retry attempt {j}",
                "tool": "none",
                "ts": _T0 + pd.Timedelta(seconds=k),
            }
            for k, (u, j) in enumerate(rows)
        ]
        pdf = pd.DataFrame.from_records(recs)
        pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        return pdf

    in_dir, out, ck = (str(tmp_path / d) for d in ("in", "out", "ck"))
    os.makedirs(in_dir)
    # f1+f2 exist BEFORE the stream starts: with maxFilesPerTrigger=1 they
    # process back-to-back, so the live keys' 3rd event lands well inside
    # the 24s TTL of their f1 state write (the ~10s f1 batch is the gap).
    _mk([(u, j) for u in users for j in (0, 1)]).to_parquet(
        os.path.join(in_dir, "f1.parquet"), index=False
    )
    _mk([(u, 2) for u in live]).to_parquet(os.path.join(in_dir, "f2.parquet"), index=False)

    def _fired(deadline: float, until: set | None) -> set:
        got: set = set()
        while time.time() < deadline:
            p = os.path.join(out, "fast")
            if os.path.exists(p):
                try:
                    got = {r.conv_id for r in spark.read.parquet(p).select("conv_id").collect()}
                except Exception:  # dir exists, no parquet committed yet
                    got = set()
            if until is None or until <= got:
                break
            time.sleep(0.5)
        return got

    q = stream_pipeline.run_stream(
        spark,
        in_dir,
        out,
        ck,
        _ruleset(),
        max_files_per_trigger=1,
        state_ttl_minutes=TTL_S / 60,
        trigger_processing_time="1 second",
    )
    sentinel = "zsentinel"
    live_fires = {f"c-{u}-2" for u in live}
    try:
        fired = _fired(time.time() + 120, live_fires)
        assert live_fires <= fired, (
            f"only {len(fired)}/{len(live_fires)} live keys fired — f2's data "
            "did not beat the TTL timer (raise TTL_S if the box was badly loaded)"
        )
        # idle gap: every key's timer expires; with processing-time timers
        # pending, Spark schedules (empty) batches continuously, and those
        # evict the idle keys — no hosting data batch needed.
        time.sleep(TTL_S + 12)
        _mk([(u, 2) for u in idle] + [(sentinel, j) for j in (0, 1, 2)]).to_parquet(
            os.path.join(in_dir, "f3.parquet"), index=False
        )
        fired = _fired(time.time() + 120, {f"c-{sentinel}-2"} | live_fires)
    finally:
        q.stop()
    assert f"c-{sentinel}-2" in fired, "sentinel never fired — f3 was not processed"
    # idle keys were evicted during the gap: their 3rd event restarted a
    # fresh counter, so none of them fire...
    assert not fired & {f"c-{u}-2" for u in idle}
    # ...while live keys' counts stayed exact (exactly one fire each)
    assert fired == live_fires | {f"c-{sentinel}-2"}


def test_hwm_map_bounded_at_cap():
    """One busy track key seeing conversations forever: the redelivery
    high-water-mark map must stay at ``hwm_cap`` entries (LRU eviction),
    while counters still work — state size is O(cap), not O(convs seen)."""
    from sagan_spark.streaming.pipeline import _make_role_state_fn

    rule = _ruleset().rules[0]
    fn = _make_role_state_fn({rule.sid: rule}, ["conv_id", "turn_idx", "sid"], hwm_cap=100)

    class _FakeState:
        exists = False
        get = None
        hasTimedOut = False

        def update(self, t):
            self.updated = t

    state = _FakeState()
    for batch in range(2):  # 500 convs/batch, same key
        pdf = pd.DataFrame(
            {
                "conv_id": [f"conv{batch:02d}-{i:04d}" for i in range(500)],
                "turn_idx": pd.array([0] * 500, dtype="int32"),
                "sid": pd.array([rule.sid] * 500, dtype="int64"),
                "ts": pd.Series(
                    [_T0 + pd.Timedelta(seconds=batch * 1000 + i) for i in range(500)]
                ).astype("datetime64[us]"),
            }
        )
        list(fn(("user",), iter([pdf]), state))
        blob = json.loads(state.updated[0])
        assert len(blob["hwm"]) <= 100
        state.exists, state.get = True, state.updated
    # LRU: survivors are the most recent conversations
    assert all(c.startswith("conv01-") for c in blob["hwm"])
    assert blob["counters"][str(rule.sid)][1] == 1000
