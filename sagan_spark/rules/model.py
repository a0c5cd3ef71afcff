"""Rule model — Sagan's Snort-style rule language as plain dataclasses.

The reference loads ``.rules`` files at startup and compiles them once
([PUB src/rules.c]; SURVEY.md §2.1 S10). We skip the text syntax and model
rules directly as frozen dataclasses: the "rule file" is a Python module,
the "compiler" is engine/match.py which turns a RuleSet into Spark Column
prefilters + one vectorized match stage.

Semantics are defined HERE (docstrings) and implemented twice on purpose:
once vectorized for Spark (engine/) and once sequentially for the pandas
oracle (oracle/pandas_engine.py); differential tests assert equality.

Operator coverage (SURVEY.md §2.2/2.4 row → field):
  P1 roles / P2 tools / P3-P7 ContentSpec / P8 PcreSpec / P9 MetaContentSpec
  P12 HashSpec / P13 GrokSpec + FieldCond / P14 defaults / P15 AlertTime
  J1/J2/J4 EnrichCond / C1 AfterSpec / C2 ThresholdSpec / C3-C4 FlexbitSpec
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class ContentSpec:
    """Literal substring predicate ([PUB src/content.c], SURVEY §2.2 P3-P7).

    Defined semantics (greedy first-match, shared by engine & oracle):
    - absolute content: search region is ``text[offset : offset+depth]``
      (offset default 0, depth default end); matches if the literal occurs
      fully inside the region.
    - relative content (``distance``/``within`` set): search starts at
      ``prev_end + distance`` (distance default 0); if ``within`` is set the
      match must START at position <= ``prev_end + within``. ``prev_end`` is
      the end of the previous *positive* content's first accepted match.
    - ``negated``: the literal must NOT occur in its region; negated
      contents never advance ``prev_end``.
    - ``nocase``: lowercase both sides (P4; ASCII-oriented — identical in
      Python str.lower, pandas str.lower and Spark lower()).
    """

    pattern: str
    nocase: bool = False
    negated: bool = False
    offset: int | None = None
    depth: int | None = None
    distance: int | None = None
    within: int | None = None

    @property
    def relative(self) -> bool:
        return self.distance is not None or self.within is not None


@dataclass(frozen=True)
class PcreSpec:
    """Full-regex predicate over text ([PUB src/rules.c] + libpcre, P8).

    ``flags``: subset of "ims" (Python ``re`` flags). ``negated``: no match
    anywhere in text.
    """

    pattern: str
    flags: str = ""
    negated: bool = False


@dataclass(frozen=True)
class MetaContentSpec:
    """Template content over a value list — match ANY value
    ([PUB src/meta-content.c], P9). Compiled to an alternation regex at
    rule load; values are regex-escaped literals."""

    template: str  # contains "%sagan%" placeholder
    values: tuple[str, ...] = ()
    nocase: bool = False


@dataclass(frozen=True)
class GrokSpec:
    """liblognorm-style named-group extraction ([PUB normalize], P13).

    Python regex with named groups; on first match the groups merge into
    the row's ``extracted`` map. ``required``: rule fails if no match."""

    pattern: str
    flags: str = ""
    required: bool = True


@dataclass(frozen=True)
class HashSpec:
    """parse_hash: extract md5/sha1/sha256 literals by length/charset
    ([PUB src/parsers/parse-hash.c], P12). Extracted into field ``kind``."""

    kind: str  # "md5" | "sha1" | "sha256"
    required: bool = True

    @property
    def regex(self) -> str:
        n = {"md5": 32, "sha1": 40, "sha256": 64}[self.kind]
        return rf"\b[a-f0-9]{{{n}}}\b"


@dataclass(frozen=True)
class FieldCond:
    """Numeric/set condition on an extracted field (drives P13 firing)."""

    name: str
    op: str  # ">=", ">", "<=", "<", "==", "in", "not_in"
    value: object


@dataclass(frozen=True)
class AlertTime:
    """Rule active only in [hour_lo, hour_hi] (inclusive, UTC)
    ([PUB src/aetas.c], P15). ``days``: ISO weekday numbers 1-7 or None."""

    hour_lo: int
    hour_hi: int
    days: tuple[int, ...] | None = None


@dataclass(frozen=True)
class EnrichCond:
    """Post-join condition on a broadcast dimension (SURVEY §2.3).

    dim/field → role_dim.origin|trust_level, tool_dim.blacklisted|category,
    risk_ranges.risk_tag. op: "is" (value in values), "isnot",
    "in_any_range" (risk key falls in some range — values ignored),
    "range_tag_is" (risk_tag in values)."""

    dim: str
    fieldname: str
    op: str
    values: tuple = ()


@dataclass(frozen=True)
class AfterSpec:
    """`after: track K, count C, seconds S` ([PUB src/after.c], C1).

    Reset-window semantics (Sagan, not sliding): per (sid, track_key) keep
    (window_start, count). On event at t: if t > window_start + S →
    window_start=t, count=1; else count+=1. Alert iff count > C."""

    track: str  # "conv_id" | "role"
    count: int
    seconds: int


@dataclass(frozen=True)
class ThresholdSpec:
    """`threshold: type T, track K, count C, seconds S`
    ([PUB src/threshold.c], C2). Same reset-window counter as AfterSpec.
    limit → alert iff count <= C; threshold → iff count % C == 0;
    suppress → iff count <= C (drop beyond)."""

    type: str  # "limit" | "threshold" | "suppress"
    track: str
    count: int
    seconds: int


@dataclass(frozen=True)
class FlexbitSpec:
    """flexbits/xbits ([PUB src/flexbit-mmap.c], C3/C4), tracked per
    conv_id. Within a conversation's (turn_idx)-ordered replay:
    - checks (`isset`/`isnotset`) are evaluated against the state BEFORE
      this turn's set/unset actions apply (a turn cannot see its own set);
    - `isset` is true iff the bit was set at ts t0 with expire E and
      (t - t0) <= E (E None → never expires);
    - `set`/`unset` apply after the rule's other predicates pass.
    """

    action: str  # "set" | "unset" | "isset" | "isnotset"
    name: str
    expire: int | None = None  # seconds, meaningful for "set"


@dataclass(frozen=True)
class Rule:
    sid: int
    msg: str
    sink: str  # fast | eve | syslog | unified2
    rule_class: str = "policy"
    rev: int = 1
    priority: int = 3
    noalert: bool = False  # flexbit-setter rules: act on state, emit nothing
    # C7 depends_on / dynamic rules ([PUB src/processors/dynamic-rules.c]):
    # this rule is evaluated only if the named sid fired at least once in
    # the run (two-pass batch semantics — see engine/pipeline.run_dynamic).
    depends_on: int | None = None
    roles: tuple[str, ...] | None = None  # P1 program prefilter
    roles_negated: bool = False
    tools: tuple[str, ...] | None = None  # P2 facility prefilter
    tools_negated: bool = False
    # Snort-style fast_pattern hint: (literal, nocase). Used as a Spark-native
    # prefilter for rules whose main predicate needs the Python UDF (pcre/
    # grok); auto-derived from the first positive absolute content otherwise.
    fast_pattern: tuple[str, bool] | None = None
    contents: tuple[ContentSpec, ...] = ()
    pcres: tuple[PcreSpec, ...] = ()
    meta_contents: tuple[MetaContentSpec, ...] = ()
    groks: tuple[GrokSpec, ...] = ()
    hashes: tuple[HashSpec, ...] = ()
    field_conds: tuple[FieldCond, ...] = ()
    defaults: tuple[tuple[str, str], ...] = ()  # P14: (field, default) pairs
    alert_time: AlertTime | None = None
    enrich: tuple[EnrichCond, ...] = ()
    after: AfterSpec | None = None
    threshold: ThresholdSpec | None = None
    flexbits: tuple[FlexbitSpec, ...] = ()

    @property
    def has_text_pred(self) -> bool:
        return bool(self.contents or self.pcres or self.meta_contents or self.groks or self.hashes)

    @property
    def stateful(self) -> bool:
        return self.after is not None or self.threshold is not None or bool(self.flexbits)


@dataclass(frozen=True)
class RuleSet:
    rules: tuple[Rule, ...]

    def by_sid(self) -> dict[int, Rule]:
        return {r.sid: r for r in self.rules}

    def sinks(self) -> tuple[str, ...]:
        return tuple(sorted({r.sink for r in self.rules if not r.noalert}))
