"""Property-based chunked-replay equivalence (r6): for ANY sorted alert
frame and ANY legal set of chunk boundaries, streaming the chunks through
one carried `_ReplayCarry`/`_TrackCarry` must emit exactly the rows the
one-shot replay emits. The parametrized unit tests in
tests/test_chunked_replay.py pin hand-picked splits; this drives random
frames (multi-sid turns, counter windows, flexbit set/unset/expire,
conv_tool composite counters) against random boundary subsets — the
space where an off-by-one in run-boundary handling or a state field
missed by the carry would hide. Pure pandas, no Spark session.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from sagan_spark.engine.correlate import (
    _ReplayCarry,
    _replay_sorted,
    _replay_sorted_carry,
    _replay_tracked_carry,
    _replay_tracked_sorted,
    _TrackCarry,
)
from sagan_spark.rules.model import (
    AfterSpec,
    ContentSpec,
    FlexbitSpec,
    Rule,
    ThresholdSpec,
)

# A rule pool exercising every carried state family: reset-window
# counters (conv + conv_tool composite), threshold variants, and
# flexbits whose set/unset/expire must flow through chunk boundaries.
RULES = {
    r.sid: r
    for r in (
        Rule(
            sid=2000001,
            msg="after conv",
            sink="fast",
            contents=(ContentSpec("a",),),
            after=AfterSpec(track="conv_id", count=2, seconds=300),
        ),
        Rule(
            sid=2000002,
            msg="after by_both",
            sink="fast",
            contents=(ContentSpec("b",),),
            after=AfterSpec(track="conv_tool", count=1, seconds=300),
        ),
        Rule(
            sid=2000003,
            msg="threshold both",
            sink="eve",
            contents=(ContentSpec("c",),),
            threshold=ThresholdSpec(type="both", track="conv_id", count=2, seconds=600),
        ),
        Rule(
            sid=2000004,
            msg="bit set",
            sink="fast",
            contents=(ContentSpec("d",),),
            flexbits=(FlexbitSpec("set", "esc", expire=500),),
        ),
        Rule(
            sid=2000005,
            msg="bit check",
            sink="eve",
            contents=(ContentSpec("e",),),
            flexbits=(FlexbitSpec("isset", "esc"),),
        ),
        Rule(
            sid=2000006,
            msg="bit clear + notset check",
            sink="syslog",
            contents=(ContentSpec("f",),),
            flexbits=(FlexbitSpec("isnotset", "esc"), FlexbitSpec("unset", "esc")),
        ),
    )
}

SIDS = sorted(RULES)
TOOLS = ["none", "bash", "search"]


@st.composite
def sorted_alerts(draw) -> pd.DataFrame:
    """A (conv_id, turn_idx, sid)-sorted frame with multi-sid turns,
    irregular time gaps (some crossing the 300/500/600s windows), and
    varying tools (conv_tool composite counter keys)."""
    rows = []
    for c in range(draw(st.integers(1, 3))):
        t_sec = draw(st.integers(0, 100))
        for turn in range(draw(st.integers(1, 15))):
            t_sec += draw(st.sampled_from([1, 40, 320, 650]))
            tool = draw(st.sampled_from(TOOLS))
            for s in sorted(draw(st.sets(st.sampled_from(SIDS), min_size=1, max_size=3))):
                rows.append((f"conv{c}", turn, s, tool, t_sec))
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "sid", "tool", "ts_s"])
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["ts"] = (
        pd.Timestamp("2025-03-01") + pd.to_timedelta(pdf["ts_s"], unit="s")
    ).astype("datetime64[us]")
    return pdf.drop(columns="ts_s").reset_index(drop=True)


def _emitted(frames) -> list[tuple]:
    out = pd.concat(list(frames)) if not isinstance(frames, pd.DataFrame) else frames
    return sorted(map(tuple, out[["conv_id", "turn_idx", "sid"]].itertuples(index=False)))


@settings(max_examples=150, deadline=None)
@given(pdf=sorted_alerts(), data=st.data())
def test_any_run_boundary_chunking_equals_one_shot(pdf, data):
    want = _emitted(_replay_sorted(RULES, pdf))
    # legal split points = (conv, turn)-run boundaries; draw any subset
    runs = (pdf["conv_id"] != pdf["conv_id"].shift()) | (
        pdf["turn_idx"] != pdf["turn_idx"].shift()
    )
    bounds = [int(i) for i in runs[runs].index if i != 0]
    splits = sorted(data.draw(st.sets(st.sampled_from(bounds)) if bounds else st.just(set())))
    carry = _ReplayCarry()
    out, prev = [], 0
    for s in [*splits, len(pdf)]:
        chunk = pdf.iloc[prev:s]
        if len(chunk):
            out.append(_replay_sorted_carry(RULES, chunk, carry))
        prev = s
    assert _emitted(pd.concat(out)) == want


TRACK_RULE = Rule(
    sid=2000010,
    msg="role storm",
    sink="fast",
    contents=(ContentSpec("x",),),
    after=AfterSpec(track="role", count=2, seconds=300),
)


@settings(max_examples=100, deadline=None)
@given(data=st.data())
def test_tracked_chunking_splits_anywhere(data):
    """Track replay is row-at-a-time, so EVERY index is a legal boundary."""
    n = data.draw(st.integers(2, 40))
    t_sec, rows = 0, []
    for i in range(n):
        t_sec += data.draw(st.sampled_from([1, 50, 350]))
        rows.append((f"c{i % 3}", i, data.draw(st.sampled_from(["user", "assistant"])), 2000010, t_sec))
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "sid", "ts_s"])
    # the real pipeline feeds this replay sorted by (key, ts)
    pdf = pdf.sort_values(["role", "ts_s"], kind="stable").reset_index(drop=True)
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["ts"] = (
        pd.Timestamp("2025-03-01") + pd.to_timedelta(pdf["ts_s"], unit="s")
    ).astype("datetime64[us]")
    pdf = pdf.drop(columns="ts_s")
    rules = {TRACK_RULE.sid: TRACK_RULE}
    want = _emitted(_replay_tracked_sorted(rules, pdf, "role"))
    splits = sorted(data.draw(st.sets(st.integers(1, len(pdf) - 1))))
    carry = _TrackCarry()
    out, prev = [], 0
    for s in [*splits, len(pdf)]:
        chunk = pdf.iloc[prev:s]
        if len(chunk):
            out.append(_replay_tracked_carry(rules, chunk, "role", carry))
        prev = s
    assert _emitted(pd.concat(out)) == want
