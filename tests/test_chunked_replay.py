"""Chunked replay fallback (r6 — SURVEY §4.2 "chunk replay if > 1e6"):
the conv-keyed and track-keyed replays stream a partition's sorted rows
through bounded-size chunks once it exceeds SAGAN_REPLAY_CHUNK_ROWS,
carrying (counters, bits, contiguity guard) across chunk boundaries, so a
pathological hot conversation bounds the pandas frame instead of growing
it without limit. Output must be IDENTICAL to the unchunked replay —
asserted here end-to-end on the hot-conv table with a tiny forced chunk
size, and at the unit level across manual chunk splits (including flexbit
state flowing through a boundary).
"""

from __future__ import annotations

import pandas as pd
import pytest

from sagan_spark.engine.correlate import (
    _ReplayCarry,
    _replay_sorted,
    _replay_sorted_carry,
    _replay_tracked_carry,
    _replay_tracked_sorted,
    _TrackCarry,
)
from sagan_spark.rules.model import AfterSpec, ContentSpec, FlexbitSpec, Rule

AFTER_RULE = Rule(
    sid=1000010,
    msg="retry storm",
    sink="fast",
    contents=(ContentSpec("retry",),),
    after=AfterSpec(track="conv_id", count=3, seconds=300),
)
SET_RULE = Rule(
    sid=1000011,
    msg="privesc set",
    sink="fast",
    contents=(ContentSpec("sudo",),),
    flexbits=(FlexbitSpec("set", "esc", expire=600),),
)
CHECK_RULE = Rule(
    sid=1000012,
    msg="post-esc exfil",
    sink="eve",
    contents=(ContentSpec("upload",),),
    flexbits=(FlexbitSpec("isset", "esc"),),
)


def _sorted_frame(n_convs: int, turns_per_conv: int) -> pd.DataFrame:
    rows = []
    for c in range(n_convs):
        for t in range(turns_per_conv):
            # alternate sids so flexbit set/check and counters interleave
            sid = (1000010, 1000011, 1000012)[t % 3]
            rows.append((f"conv{c:03d}", t, sid))
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "sid"])
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["tool"] = "none"
    pdf["ts"] = (
        pd.Timestamp("2025-03-01") + pd.to_timedelta(pdf["turn_idx"] * 20, unit="s")
    ).astype("datetime64[us]")
    return pdf.reset_index(drop=True)


RULES = {r.sid: r for r in (AFTER_RULE, SET_RULE, CHECK_RULE)}


def _emitted(pdf: pd.DataFrame) -> list[tuple]:
    return sorted(map(tuple, pdf[["conv_id", "turn_idx", "sid"]].itertuples(index=False)))


@pytest.mark.parametrize("split_at", [1, 2, 7, 50, 149])
def test_unit_chunk_split_equals_one_shot(split_at):
    """Any split on a (conv, turn)-run boundary yields identical emissions
    — counters AND flexbits must flow through the boundary (a split mid-
    conversation is the interesting case; split_at=1/2 force it)."""
    pdf = _sorted_frame(n_convs=3, turns_per_conv=60)
    want = _emitted(_replay_sorted(RULES, pdf))
    # every row here is its own (conv, turn) run (one sid per turn), so
    # any row index is a legal boundary
    carry = _ReplayCarry()
    out = [
        _replay_sorted_carry(RULES, pdf.iloc[:split_at], carry),
        _replay_sorted_carry(RULES, pdf.iloc[split_at:], carry),
    ]
    got = _emitted(pd.concat(out, ignore_index=False))
    assert got == want
    assert len(want) > 0


def test_unit_chunk_guard_still_fires_across_chunks():
    """The non-contiguity guard must see conv transitions ACROSS chunk
    boundaries: a conversation reappearing in a later chunk is the same
    lost-sort corruption as within one frame."""
    pdf = _sorted_frame(n_convs=2, turns_per_conv=6)
    carry = _ReplayCarry()
    _replay_sorted_carry(RULES, pdf, carry)  # chunk 1: conv000, conv001
    again = _sorted_frame(n_convs=1, turns_per_conv=3)  # conv000 reappears
    with pytest.raises(RuntimeError, match="not conv-contiguous"):
        _replay_sorted_carry(RULES, again, carry)


def test_unit_tracked_chunk_split_equals_one_shot():
    rule = Rule(
        sid=1000020,
        msg="role storm",
        sink="fast",
        contents=(ContentSpec("x",),),
        after=AfterSpec(track="role", count=2, seconds=3600),
    )
    rows = []
    for i, role in enumerate(["assistant"] * 9 + ["user"] * 9):
        rows.append((f"c{i % 4}", i, role, 1000020))
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "sid"])
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["ts"] = (
        pd.Timestamp("2025-03-01") + pd.to_timedelta(pdf["turn_idx"] * 30, unit="s")
    ).astype("datetime64[us]")
    rules = {rule.sid: rule}
    want = _emitted(_replay_tracked_sorted(rules, pdf, "role"))
    for split in (1, 5, 9, 13):  # track chunks may split ANYWHERE
        carry = _TrackCarry()
        got = _emitted(
            pd.concat(
                [
                    _replay_tracked_carry(rules, pdf.iloc[:split], "role", carry),
                    _replay_tracked_carry(rules, pdf.iloc[split:], "role", carry),
                ]
            )
        )
        assert got == want, f"split={split}"
    assert len(want) > 0


def test_pipeline_tiny_chunk_equals_default(spark, monkeypatch, tmp_path):
    """End-to-end: the full pipeline over a table with a hot conversation,
    with the chunk size forced to 257 rows (prime → boundaries land mid-
    conversation in every partition), must produce the identical alert
    set as the default (effectively unchunked) run."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from sagan_spark.datagen.transcripts import SCHEMA, gen_chunk
    from sagan_spark.engine import pipeline
    from tests.test_skew_hot_conv import hot_conv_pdf

    d = str(tmp_path / "tx")
    os.makedirs(d)
    bg = gen_chunk(0, 120, seed=13, hot_cap=1000)
    pq.write_table(
        pa.Table.from_pandas(bg, schema=SCHEMA, preserve_index=False),
        os.path.join(d, "part-00000.parquet"),
    )
    hot = hot_conv_pdf(3000)
    pq.write_table(
        pa.Table.from_pandas(hot, schema=SCHEMA, preserve_index=False),
        os.path.join(d, "part-00001.parquet"),
    )

    res_default = pipeline.run(spark, d)
    rows = lambda res: sorted(  # noqa: E731
        (r.conv_id, int(r.turn_idx), int(r.sid))
        for r in res.alerts.select("conv_id", "turn_idx", "sid").collect()
    )
    want = rows(res_default)
    monkeypatch.setenv("SAGAN_REPLAY_CHUNK_ROWS", "257")
    res_chunked = pipeline.run(spark, d)
    assert rows(res_chunked) == want
    assert res_chunked.sid_counts == res_default.sid_counts
    # the hot conv guarantees chunking actually engaged (3000 rows ≫ 257)
    assert sum(1 for c, _, s in want if c == "convhot00") > 2000
