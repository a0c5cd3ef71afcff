"""Sink compaction (streaming/compact.py): merging final batch=<id> dirs
must preserve the exact row multiset, respect the checkpoint safety
frontier, survive a crash at any step via the intent manifest, and leave
the plain `spark.read.parquet(sink_dir)` reader contract intact."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from sagan_spark import fsutil
from sagan_spark.streaming import compact


def _rows(spark, sink_dir):
    df = spark.read.parquet(sink_dir)
    return sorted(
        (r.conv_id, int(r.turn_idx), int(r.sid))
        for r in df.select("conv_id", "turn_idx", "sid").collect()
    )


def _write_batches(spark, sink_dir, n_batches, rows_per=3, start=0):
    for b in range(start, start + n_batches):
        df = spark.createDataFrame(
            [(f"conv{b}_{i}", i, 1000001 + (i % 2)) for i in range(rows_per)],
            "conv_id string, turn_idx int, sid long",
        )
        df.repartition(2).write.mode("overwrite").parquet(f"{sink_dir}/batch={b}")


@pytest.fixture()
def sink_tree(spark, tmp_path):
    out = str(tmp_path / "out")
    _write_batches(spark, f"{out}/fast", 5)
    return out


def test_compaction_preserves_rows_and_reduces_files(spark, sink_tree):
    sink_dir = f"{sink_tree}/fast"
    want = _rows(spark, sink_dir)
    stats = compact.compact_sink_batches(spark, sink_tree, "fast")
    assert stats["compacted"] == 5 and stats["target_batch"] == 4
    assert _rows(spark, sink_dir) == want
    # 5 dirs x 2 files collapsed into one dir of byte-budgeted files
    entries = [e for e in os.listdir(sink_dir) if e.startswith("batch=")]
    assert entries == ["batch=4"]
    assert stats["files_after"] < stats["files_before"]
    # batch partition column collapses to the frontier id for every row
    got_batches = set(
        r.batch for r in spark.read.parquet(sink_dir).select("batch").distinct().collect()
    )
    assert got_batches == {4}
    # no hidden scratch left behind
    assert not [e for e in os.listdir(sink_dir) if e.startswith(".compact")]
    assert not os.path.exists(f"{sink_dir}/{compact.MANIFEST_NAME}")


def test_compaction_is_a_noop_below_two_dirs(spark, tmp_path):
    out = str(tmp_path / "out")
    assert compact.compact_sink_batches(spark, out, "fast")["compacted"] == 0
    _write_batches(spark, f"{out}/fast", 1)
    assert compact.compact_sink_batches(spark, out, "fast")["compacted"] == 0
    assert os.path.exists(f"{out}/fast/batch=0")


def test_checkpoint_frontier_limits_compaction(spark, sink_tree, tmp_path):
    """Only batches with commit files are final; batch=4 (uncommitted)
    must keep its own directory and its rows."""
    ck = str(tmp_path / "ck")
    os.makedirs(f"{ck}/commits")
    for i in range(4):  # commits 0..3 -> frontier 3
        open(f"{ck}/commits/{i}", "w").write("v1")
    sink_dir = f"{sink_tree}/fast"
    want = _rows(spark, sink_dir)
    stats = compact.compact_sink_batches(spark, sink_tree, "fast", checkpoint_dir=ck)
    assert stats["compacted"] == 4 and stats["target_batch"] == 3
    assert sorted(e for e in os.listdir(sink_dir) if e.startswith("batch=")) == [
        "batch=3",
        "batch=4",
    ]
    assert _rows(spark, sink_dir) == want
    # nothing committed yet -> refuse to treat anything as final
    ck2 = str(tmp_path / "ck2")
    os.makedirs(f"{ck2}/commits")
    stats2 = compact.compact_sink_batches(spark, sink_tree, "fast", checkpoint_dir=ck2)
    assert stats2["compacted"] == 0


@pytest.mark.parametrize("die_after", [0, 1, 3, 5])
def test_crash_at_any_rename_step_is_recovered(spark, sink_tree, monkeypatch, die_after):
    """Kill the move plan after N renames; the next compaction call must
    finish it from the manifest with zero row loss."""
    sink_dir = f"{sink_tree}/fast"
    want = _rows(spark, sink_dir)
    calls = {"n": 0}
    real_rename = fsutil.fs_rename

    def dying_rename(spark_, src, dst):
        if calls["n"] >= die_after:
            raise IOError("injected crash")
        calls["n"] += 1
        real_rename(spark_, src, dst)

    monkeypatch.setattr(fsutil, "fs_rename", dying_rename)
    with pytest.raises(IOError):
        compact.compact_sink_batches(spark, sink_tree, "fast")
    monkeypatch.setattr(fsutil, "fs_rename", real_rename)
    # interrupted state: manifest present, rows split across sources/trash/tmp
    assert os.path.exists(f"{sink_dir}/{compact.MANIFEST_NAME}")
    assert compact.recover_compaction(spark, sink_tree, "fast")
    assert _rows(spark, sink_dir) == want
    assert sorted(e for e in os.listdir(sink_dir) if e.startswith("batch=")) == ["batch=4"]
    assert not os.path.exists(f"{sink_dir}/{compact.MANIFEST_NAME}")


def test_orphan_scratch_swept_without_manifest(spark, sink_tree):
    sink_dir = f"{sink_tree}/fast"
    os.makedirs(f"{sink_dir}/.compact_tmp_dead")
    open(f"{sink_dir}/.compact_tmp_dead/part-x.parquet", "w").write("junk")
    assert compact.recover_compaction(spark, sink_tree, "fast") is False
    assert not os.path.exists(f"{sink_dir}/.compact_tmp_dead")


def test_recompaction_absorbs_new_batches(spark, sink_tree):
    sink_dir = f"{sink_tree}/fast"
    compact.compact_sink_batches(spark, sink_tree, "fast")
    _write_batches(spark, sink_dir, 2, start=5)
    want = _rows(spark, sink_dir)
    stats = compact.compact_sink_batches(spark, sink_tree, "fast")
    assert stats["compacted"] == 3 and stats["target_batch"] == 6
    assert _rows(spark, sink_dir) == want
    assert [e for e in os.listdir(sink_dir) if e.startswith("batch=")] == ["batch=6"]


def test_streamed_output_compacts_end_to_end(spark, tmp_path):
    """Full integration: run the real stream (mfpt=1 -> multiple batch
    dirs), compact against its own checkpoint, reader sees identical
    alert sets; a resumed stream keeps writing new batch ids above the
    compacted frontier."""
    import glob as _glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    from sagan_spark.datagen.transcripts import SCHEMA, gen_chunk
    from sagan_spark.streaming import pipeline as sp

    d = str(tmp_path / "in")
    os.makedirs(d)
    pdf = gen_chunk(0, 40, seed=11, hot_cap=500)
    half = len(pdf) // 2
    for i, part in enumerate((pdf.iloc[:half], pdf.iloc[half:])):
        pq.write_table(
            pa.Table.from_pandas(part, schema=SCHEMA, preserve_index=False),
            os.path.join(d, f"part-{i:05d}.parquet"),
        )
    out, ck = str(tmp_path / "o"), str(tmp_path / "ck")
    q = sp.run_stream(spark, d, out, ck, max_files_per_trigger=1)
    q.processAllAvailable()
    q.stop()
    fast_dir = f"{out}/fast"
    assert len(_glob.glob(f"{fast_dir}/batch=*")) >= 2
    want = _rows(spark, fast_dir)
    stats = compact.compact_sink_batches(spark, out, "fast", checkpoint_dir=ck)
    assert stats["compacted"] >= 2
    assert _rows(spark, fast_dir) == want
    # resume: new data lands in new batch dirs above the compacted id
    pq.write_table(
        pa.Table.from_pandas(gen_chunk(40, 50, seed=11, hot_cap=500), schema=SCHEMA,
                             preserve_index=False),
        os.path.join(d, "part-00002.parquet"),
    )
    q2 = sp.run_stream(spark, d, out, ck, max_files_per_trigger=1)
    q2.processAllAvailable()
    q2.stop()
    new_ids = sorted(
        int(e.split("=")[1]) for e in os.listdir(fast_dir) if e.startswith("batch=")
    )
    assert new_ids[0] == stats["target_batch"]
    assert len(_rows(spark, fast_dir)) >= len(want)


def test_marker_carries_provenance(spark, sink_tree):
    compact.compact_sink_batches(spark, sink_tree, "fast")
    meta = json.loads(
        fsutil.fs_read_text(spark, f"{sink_tree}/fast/batch=4/{compact.MARKER_NAME}")
    )
    assert meta["sources"] == [0, 1, 2, 3, 4]
    assert meta["bytes"] > 0
