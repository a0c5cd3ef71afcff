"""sagan_spark — a PySpark-native log/telemetry rule-matching pipeline.

A from-scratch reimplementation of the capability set of beave/sagan
(the "Suricata/Snort like log analysis engine", /root/reference/README.md:3)
re-expressed Spark-first: parse → enrich → correlate → route → aggregate
over tables of multi-turn conversation/agent transcripts
(conv_id, turn_idx, role, text, tool, ts).

Architecture (SURVEY.md §7.0): the engine is a *rule-set → DataFrame-plan
compiler* plus a tiny runtime. There is no event loop, no per-record engine;
Catalyst's logical plan is the only IR. Exactly two vectorized pandas UDF
families exist (the grok/PCRE match stage and grouped stateful replay);
everything else is Column expressions.
"""

__version__ = "0.1.0"
