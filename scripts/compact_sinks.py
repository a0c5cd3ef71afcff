#!/usr/bin/env python
"""Compact a streaming run's sink output (streaming/compact.py).

Merges every FINAL batch=<id> directory per sink into one coarse
directory of ~target-file-mb files — the operational answer to the
exactly-once layout's small-files growth on long-running streams. Safe
against a running stream when --checkpoint is given (only committed
batches move); without it, stop the stream first.

Usage:
  python scripts/compact_sinks.py OUT_DIR [--checkpoint CK_DIR]
      [--sinks fast,eve,syslog,unified2] [--target-file-mb 256]
      [--master local[8]]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sagan_spark.session import get_spark  # noqa: E402
from sagan_spark.streaming import compact  # noqa: E402


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--sinks", default="fast,eve,syslog,unified2")
    ap.add_argument("--target-file-mb", type=int, default=256)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    spark = get_spark(app_name="sagan_compact_sinks", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    stats = compact.compact_all_sinks(
        spark,
        args.out_dir,
        sinks=tuple(s for s in args.sinks.split(",") if s),
        checkpoint_dir=args.checkpoint,
        target_file_mb=args.target_file_mb,
    )
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
