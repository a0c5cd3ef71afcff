#!/usr/bin/env python
"""Capture .explain("formatted") output for declared queries into
plans/r<round>/<name>_<tag>.txt (judge-checkable plan evidence).

Usage: python scripts/capture_plans.py <tag> [name ...]
  tag    "before" or "after"
  name   queries() keys (default: the r07 focus set) plus the pseudo-legs
         "dedup_clusters_chain" (bench-only chain) and "pipeline_alerts"
         (build_alerts over the bench transcript generator shape).
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from sagan_spark.session import get_spark  # noqa: E402

FOCUS = [
    "minhash_lsh_dups",
    "ngram_jaccard",
    "dedup_index_incremental",
    "embedding_near_dups",
    "minhash_signature",
    "pipeline_sink_counts",
    "parse_tokens_rule",
    "simhash_portable",
    "dedup_exact",
    "quality_battery",
    "tpch_q5ish",
]


def explain_formatted(df) -> str:
    buf = io.StringIO()
    import contextlib

    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or FOCUS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "plans", "r07")
    os.makedirs(outdir, exist_ok=True)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="capture_plans",
        master=f"local[{cpus}]",
        shuffle_partitions=max(2 * cpus, 32),
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    qs = entry.queries()
    for name in names:
        if name == "dedup_clusters_chain":
            from sagan_spark.ops import dedup as D

            d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            sig = D.minhash_signature(D.shingles(d), num_hashes=8)
            df = D.lsh_candidate_pairs(sig, bands=4, rows_per_band=2)
        else:
            df = qs[name](spark, sf_dir)
        text = explain_formatted(df)
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
