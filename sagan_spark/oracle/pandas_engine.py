"""Pandas oracle — sequential, order-faithful reference implementation.

SURVEY.md §5.2: the reference snapshot ships no engine source, so THIS is
"the reference" for fixtures: a single-process, row-at-a-time evaluation of
the exact rule semantics defined in rules/model.py. Deliberately simple and
auditable; shares only the stateless predicate evaluator (rules/eval.py)
with the Spark engine — enrichment, state replay and sink formatting are
re-implemented independently here so differential tests are meaningful.

Outputs: alert rows (list of dicts, in global (conv_id, turn_idx, sid)
order), per-sink / per-sid counts, and byte-stable sink lines that the
Spark engine must reproduce exactly.
"""

from __future__ import annotations

import json
import zlib
from dataclasses import dataclass, field

import pandas as pd

from ..datagen.dims import BLUEDOT_DIM, RISK_RANGES, ROLE_DIM, TOOL_DIM
from ..rules.eval import match_stateless
from ..rules.model import Rule, RuleSet

RISK_MOD = 1000


def risk_key(conv_id: str) -> int:
    return zlib.crc32(conv_id.encode("utf-8")) % RISK_MOD


def _risk_tag(key: int) -> str | None:
    for lo, hi, tag in RISK_RANGES.itertuples(index=False):
        if lo <= key <= hi:
            return tag
    return None


_ROLE = ROLE_DIM.set_index("role").to_dict("index")
_TOOL = TOOL_DIM.set_index("tool").to_dict("index")
_BLUEDOT = BLUEDOT_DIM.set_index("tool").to_dict("index")


def _enrich_pass(rule: Rule, row: dict) -> bool:
    for ec in rule.enrich:
        if ec.dim == "role_dim":
            val = _ROLE.get(row["role"], {}).get(ec.fieldname)
        elif ec.dim == "tool_dim":
            val = _TOOL.get(row["tool"], {}).get(ec.fieldname)
        elif ec.dim == "bluedot_dim":
            val = _BLUEDOT.get(row["tool"], {}).get(ec.fieldname)
        elif ec.dim == "risk_ranges":
            val = row["risk_tag"]
        else:
            raise ValueError(ec.dim)
        if ec.op == "is" and val not in ec.values:
            return False
        if ec.op == "isnot" and (val is None or val in ec.values):
            return False
        if ec.op == "range_tag_is" and val not in ec.values:
            return False
        if ec.op == "in_any_range" and val is None:
            return False
    return True


@dataclass
class _ConvState:
    counters: dict[int, tuple[float, int]] = field(default_factory=dict)
    bits: dict[str, tuple[float, float | None]] = field(default_factory=dict)


@dataclass
class OracleResult:
    alerts: list[dict]
    sink_counts: dict[str, int]
    sid_counts: dict[int, int]

    def lines(self, sink: str) -> list[str]:
        return [format_line(a, sink) for a in self.alerts if a["sink"] == sink]


def format_line(a: dict, sink: str) -> str:
    ts: pd.Timestamp = a["ts"]
    a = {**a, "role": a["role"] or "-", "tool": a["tool"] or "-"}
    if sink == "fast":
        t = ts.strftime("%Y-%m-%d %H:%M:%S.%f")
        return (
            f"{t}  [**] [1:{a['sid']}:{a['rev']}] {a['msg']} [**] "
            f"[Classification: {a['rule_class']}] [Priority: {a['priority']}] "
            f"{a['conv_id']}:{a['turn_idx']} {a['role']} {a['tool']} - {a['text']}"
        )
    if sink == "eve":
        obj = {
            "timestamp": ts.strftime("%Y-%m-%dT%H:%M:%S.%f"),
            "sid": a["sid"],
            "rev": a["rev"],
            "msg": a["msg"],
            "classification": a["rule_class"],
            "priority": a["priority"],
            "conv_id": a["conv_id"],
            "turn_idx": a["turn_idx"],
            "role": a["role"],
            "tool": a["tool"],
            "text": a["text"],
        }
        return json.dumps(obj, separators=(",", ":"), ensure_ascii=False)
    if sink == "syslog":
        t = ts.strftime("%Y-%m-%dT%H:%M:%S.%f")
        return f"<{a['priority'] + 104}>{t} {a['conv_id']} sagan[{a['sid']}]: {a['msg']}: {a['text']}"
    raise ValueError(sink)


def _tracked_decisions(df: pd.DataFrame, rules: tuple[Rule, ...], track: str) -> dict:
    """Pre-pass for non-conv tracked after/threshold rules — track="role"
    (by_username) and track="tool" (by_dst): counters are GLOBAL per
    (track value, sid) and replay in (ts, conv_id, turn_idx) order across
    conversations. Returns {(row_label, sid): emit} consulted by the main
    loop (which stays in (conv_id, turn_idx) order for everything else).
    Non-conv-tracked rules cannot carry flexbits (RuleSet validation), so
    stateless+enrich outcomes fully determine the event stream here."""
    decisions: dict[tuple[int, int], bool] = {}
    track_rules = [r for r in rules if r.stateful and r.track == track]
    if not track_rules:
        return decisions
    # sort key mirrors Spark's NULLS FIRST ordering and the counter key is
    # the ACTUAL track value — a null key is its own track key, distinct
    # from an empty-string key (the engine's repartition(track) groups
    # them separately too)
    events: list[tuple] = []  # (sortable_key, t, conv_id, turn_idx, sid, label, key)
    for i, row in df.iterrows():
        ts: pd.Timestamp = row["ts"]
        hour, dow = ts.hour, ts.weekday() + 1
        rk = risk_key(row["conv_id"])
        rrow = {
            "role": row["role"],
            "tool": row["tool"],
            "risk_tag": _risk_tag(rk),
        }
        for rule in track_rules:
            if match_stateless(rule, row["text"], row["role"], row["tool"], hour, dow) is None:
                continue
            if not _enrich_pass(rule, rrow):
                continue
            events.append(
                (
                    (row[track] is not None, row[track] or ""),
                    ts.value / 1e9,
                    row["conv_id"],
                    int(row["turn_idx"]),
                    rule.sid,
                    i,
                    row[track],
                )
            )
    events.sort(key=lambda e: e[:5])
    counters: dict[tuple, tuple[float, int]] = {}
    by_sid = {r.sid: r for r in track_rules}
    for _skey, t, _conv, _turn, sid, label, key in events:
        rule = by_sid[sid]
        spec = rule.after or rule.threshold
        ws, cnt = counters.get((key, sid), (None, 0))
        if ws is None or t > ws + spec.seconds:
            ws, cnt = t, 1
        else:
            cnt += 1
        counters[(key, sid)] = (ws, cnt)
        if rule.after is not None:
            emit = cnt > rule.after.count
        elif spec.type in ("limit", "suppress"):
            emit = cnt <= spec.count
        elif spec.type == "threshold":
            emit = cnt % spec.count == 0
        elif spec.type == "both":
            emit = cnt == spec.count
        else:
            raise ValueError(spec.type)
        decisions[(label, sid)] = emit
    return decisions


def run_oracle(df: pd.DataFrame, ruleset: RuleSet) -> OracleResult:
    """Evaluate the full pipeline sequentially over a transcript frame."""
    df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    rules = ruleset.rules
    states: dict[str, _ConvState] = {}
    alerts: list[dict] = []
    tracked_decisions: dict = {}
    for track in ("role", "tool"):
        tracked_decisions.update(_tracked_decisions(df, rules, track))
    tracked_sids = {r.sid for r in rules if r.stateful and r.track in ("role", "tool")}

    conv_ids = df["conv_id"].to_numpy()
    turn_idxs = df["turn_idx"].to_numpy()
    roles = df["role"].to_numpy()
    texts = df["text"].to_numpy()
    tools = df["tool"].to_numpy()
    tss = df["ts"]

    rk_cache: dict[str, tuple[int, str | None]] = {}

    for i in range(len(df)):
        conv = conv_ids[i]
        ts: pd.Timestamp = tss.iloc[i]
        t = ts.value / 1e9  # unix seconds
        hour, dow = ts.hour, ts.weekday() + 1
        if conv not in rk_cache:
            k = risk_key(conv)
            rk_cache[conv] = (k, _risk_tag(k))
        rkey, rtag = rk_cache[conv]
        row = {
            "conv_id": conv,
            "turn_idx": int(turn_idxs[i]),
            "role": roles[i],
            "text": texts[i],
            "tool": tools[i],
            "ts": ts,
            "risk_key": rkey,
            "risk_tag": rtag,
        }
        st = states.setdefault(conv, _ConvState())
        pending_sets: list[tuple[str, str, float, float | None]] = []
        for rule in rules:
            extracted = match_stateless(rule, row["text"], row["role"], row["tool"], hour, dow)
            if extracted is None:
                continue
            if not _enrich_pass(rule, row):
                continue
            # flexbit checks (pre-turn state: sets queued, applied after turn)
            detected = True
            for fb in rule.flexbits:
                cur = st.bits.get(fb.name)
                is_set = cur is not None and (cur[1] is None or (t - cur[0]) <= cur[1])
                if fb.action == "isset" and not is_set:
                    detected = False
                if fb.action == "isnotset" and is_set:
                    detected = False
            if not detected:
                continue
            emit = True
            spec = rule.after or rule.threshold
            if rule.sid in tracked_sids:
                emit = tracked_decisions[(i, rule.sid)]
            elif spec is not None:
                ckey = (
                    (rule.sid, row["tool"]) if spec.track == "conv_tool" else rule.sid
                )
                ws, cnt = st.counters.get(ckey, (None, 0))
                if ws is None or t > ws + spec.seconds:
                    ws, cnt = t, 1
                else:
                    cnt += 1
                st.counters[ckey] = (ws, cnt)
                if rule.after is not None:
                    emit = cnt > rule.after.count
                elif rule.threshold.type in ("limit", "suppress"):
                    emit = cnt <= rule.threshold.count
                elif rule.threshold.type == "threshold":
                    emit = cnt % rule.threshold.count == 0
                elif rule.threshold.type == "both":
                    emit = cnt == rule.threshold.count
                else:
                    raise ValueError(rule.threshold.type)
            for fb in rule.flexbits:
                if fb.action in ("set", "unset"):
                    pending_sets.append(
                        (fb.action, fb.name, t, float(fb.expire) if fb.expire is not None else None)
                    )
            if emit and not rule.noalert:
                alerts.append(
                    {
                        **row,
                        "sid": rule.sid,
                        "rev": rule.rev,
                        "msg": rule.msg,
                        "rule_class": rule.rule_class,
                        "priority": rule.priority,
                        "sink": rule.sink,
                        "extracted": extracted,
                    }
                )
        for action, name, tset, exp in pending_sets:
            if action == "set":
                st.bits[name] = (tset, exp)
            else:
                st.bits.pop(name, None)

    sink_counts: dict[str, int] = {}
    sid_counts: dict[int, int] = {}
    for a in alerts:
        sink_counts[a["sink"]] = sink_counts.get(a["sink"], 0) + 1
        sid_counts[a["sid"]] = sid_counts.get(a["sid"], 0) + 1
    return OracleResult(alerts=alerts, sink_counts=sink_counts, sid_counts=sid_counts)
