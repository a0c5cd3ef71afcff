#!/usr/bin/env python
"""Cluster entrypoint — the spark-submit job for the Sagan-style pipeline.

    python -m sagan_spark.packaging                     # builds sagan_spark.zip
    spark-submit --py-files sagan_spark.zip \
        --conf spark.sql.shuffle.partitions=4096 \
        scripts/run_pipeline.py \
        --input  warehouse.logs.transcripts \
        --output s3://bucket/alerts \
        --resume-dir s3://bucket/alerts/_bookmarks \
        --mode resumable

Modes:
  batch      one-shot run, per-sink writes + counts to stdout (JSON)
  resumable  unit-based run with the bookmark manifest (skips done units)
  stream     structured streaming with checkpointing
  dynamic    two-pass run honoring Rule.depends_on

The input is an Iceberg table identifier when the Iceberg extension is on
the session (cluster), else a parquet path (local/dev) — io.read_table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

try:
    import sagan_spark  # noqa: F401  (present via --py-files on a cluster)
except ModuleNotFoundError:  # standalone/dev: the package sits next to scripts/
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sagan_spark.engine import checkpoint, pipeline
from sagan_spark.rules.bulk import bulk_ruleset
from sagan_spark.rules.canonical import CANONICAL
from sagan_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", default=None)
    ap.add_argument("--mode", choices=["batch", "resumable", "stream", "dynamic"], default="batch")
    ap.add_argument("--ruleset", choices=["canonical", "bulk", "bulk-production"], default="canonical")
    ap.add_argument("--resume-dir", default=None)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    ruleset = {
        "canonical": CANONICAL,
        "bulk": bulk_ruleset(),
        "bulk-production": bulk_ruleset(production=True),
    }[args.ruleset]
    spark = get_spark(app_name="sagan_pipeline", master=args.master)

    if args.mode == "batch":
        res = pipeline.run(spark, args.input, ruleset, out_dir=args.output)
        print(json.dumps({"sink_counts": res.sink_counts, "sid_counts": res.sid_counts}))
        res.unpersist()
    elif args.mode == "dynamic":
        res = pipeline.run_dynamic(spark, args.input, ruleset, out_dir=args.output)
        print(json.dumps({"sink_counts": res.sink_counts, "sid_counts": res.sid_counts}))
    elif args.mode == "resumable":
        out = args.resume_dir or (args.output + "/_bookmarks")
        r = checkpoint.run_resumable(spark, args.input, out, ruleset)
        print(json.dumps({"processed": r.processed_units, "skipped": r.skipped_units, **r.totals}))
    else:  # stream
        from sagan_spark.streaming import pipeline as sp

        q = sp.run_stream(spark, args.input, args.output, args.checkpoint_dir, ruleset)
        q.awaitTermination()


if __name__ == "__main__":
    main()
