"""S3: syslog header parser ([PUB src/syslog-handler.c]) as Column exprs.

In the transcript payload the header fields arrive pre-split as columns
(BASELINE.json:15), so this parser applies when `text` itself carries an
embedded RFC3164-ish syslog line (e.g. log-forwarding transcripts):

    <PRI>MMM dd HH:mm:ss host program[pid]: message

Everything is `regexp_extract` — JVM-side, codegen, no UDF. Missing
pieces yield NULL/'' exactly like liblognorm's absent fields.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PRI = r"^<(\d{1,3})>"
_TS = r"^(?:<\d{1,3}>)?([A-Z][a-z]{2} [ \d]\d \d{2}:\d{2}:\d{2})"
_HOST = r"^(?:<\d{1,3}>)?(?:[A-Z][a-z]{2} [ \d]\d \d{2}:\d{2}:\d{2}) (\S+)"
_PROG = r"^(?:<\d{1,3}>)?(?:[A-Z][a-z]{2} [ \d]\d \d{2}:\d{2}:\d{2}) \S+ ([^:\[\s]+)"
_PID = r"^(?:<\d{1,3}>)?(?:[A-Z][a-z]{2} [ \d]\d \d{2}:\d{2}:\d{2}) \S+ [^:\[\s]+\[(\d+)\]"
_MSG = r"^(?:<\d{1,3}>)?(?:[A-Z][a-z]{2} [ \d]\d \d{2}:\d{2}:\d{2}) \S+ [^:]+: (.*)$"


def pri(col: Column) -> Column:
    return F.nullif(F.regexp_extract(col, _PRI, 1), F.lit("")).cast("int")


def facility(col: Column) -> Column:
    return (pri(col) / 8).cast("int")


def severity(col: Column) -> Column:
    return F.pmod(pri(col), F.lit(8)).cast("int")


def parse_syslog(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds syslog_* columns extracted from ``text_col``."""
    c = F.col(text_col)
    return df.withColumns(
        {
            "syslog_pri": pri(c),
            "syslog_facility": facility(c),
            "syslog_severity": severity(c),
            "syslog_ts": F.nullif(F.regexp_extract(c, _TS, 1), F.lit("")),
            "syslog_host": F.nullif(F.regexp_extract(c, _HOST, 1), F.lit("")),
            "syslog_program": F.nullif(F.regexp_extract(c, _PROG, 1), F.lit("")),
            "syslog_pid": F.nullif(F.regexp_extract(c, _PID, 1), F.lit("")).cast("int"),
            "syslog_msg": F.nullif(F.regexp_extract(c, _MSG, 1), F.lit("")),
        }
    )
