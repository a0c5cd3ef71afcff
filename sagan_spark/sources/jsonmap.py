"""S2: JSON-lines input + field mapping ([PUB src/input-json.c,
src/message-json-map.c]).

Sagan maps JSON keys onto its syslog record via a mapping config; the
Spark equivalent is `from_json` + a declarative column mapping onto the
transcript input contract. Pure Column expressions.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FieldMap:
    """JSON path (without $.) or literal per transcript column."""

    conv_id: str = "conv_id"
    turn_idx: str = "turn_idx"
    role: str = "role"
    text: str = "text"
    tool: str = "tool"
    ts: str = "ts"
    defaults: tuple[tuple[str, str], ...] = field(default_factory=tuple)


def map_json_lines(df: DataFrame, json_col: str, fmap: FieldMap = FieldMap()) -> DataFrame:
    """One JSON document per row in ``json_col`` → transcript schema.
    Uses get_json_object (schema-on-read, like the reference) so unknown
    extra keys are ignored and missing keys become NULL, then coalesced
    with declared defaults (P14 analogue)."""
    j = F.col(json_col)
    defaults = dict(fmap.defaults)

    def g(path: str, cast: str | None = None):
        c = F.get_json_object(j, f"$.{path}")
        if path in defaults:
            c = F.coalesce(c, F.lit(defaults[path]))
        return c.cast(cast) if cast else c

    return df.select(
        g(fmap.conv_id).alias("conv_id"),
        g(fmap.turn_idx, "int").alias("turn_idx"),
        g(fmap.role).alias("role"),
        g(fmap.text).alias("text"),
        g(fmap.tool).alias("tool"),
        F.to_timestamp(g(fmap.ts)).cast("timestamp_ntz").alias("ts"),
    )
