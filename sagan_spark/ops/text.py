"""Text-analysis operators for training-data pipelines.

All pure Column expressions (JVM-side, whole-stage codegen) — no UDFs.
Each has a matching ANSI-SQL oracle in __spark_entry__.oracle_sql().

Semantics are deliberately simple and portable (identical results in
Spark and DuckDB):
- token_count: split on single space, count tokens (empty tokens from
  runs of spaces count, like both engines' split semantics).
- quality_score: crude length/whitespace-ratio score in [0,1].
- lang_guess: stopword-presence heuristic (en/de/unknown).
- fingerprint: 16-hex-char prefix of md5 of lowercased trimmed text —
  a deterministic document fingerprint for exact-dup detection.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def token_count(text: Column) -> Column:
    return F.size(F.split(text, " "))


def quality_score(text: Column) -> Column:
    """Whitespace-density quality proxy, rounded for cross-engine equality."""
    n = F.length(text)
    spaces = n - F.length(F.replace(text, F.lit(" "), F.lit("")))
    return F.round(spaces / F.greatest(n, F.lit(1)), 4)


def lang_guess(text: Column) -> Column:
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    return (
        F.when(padded.contains(" the ") | padded.contains(" and "), F.lit("en"))
        .when(padded.contains(" der ") | padded.contains(" und "), F.lit("de"))
        .otherwise(F.lit("unknown"))
    )


def fingerprint(text: Column) -> Column:
    return F.substring(F.md5(F.encode(F.lower(F.trim(text)), "utf-8")), 1, 16)
