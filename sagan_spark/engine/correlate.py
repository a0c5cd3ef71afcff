"""Correlation stage — Sagan's after/threshold/flexbit state, Spark-first.

Reference keeps mmap'ed counter/bit tables shared across threads
([PUB src/after.c, src/threshold.c, src/flexbit-mmap.c]; SURVEY §2.4).
Batch equivalent: state is a pure function of each conversation's
(turn_idx)-ordered matched events, so ONE shuffle
(``groupBy("conv_id").applyInPandas``) reconstructs it exactly.

Semantics (defined in rules/model.py, re-implemented independently in the
pandas oracle):
- counters (after/threshold): reset-window, anchored at the first event of
  the current window — NOT a sliding window.
- flexbits: within a turn, checks see the state before that turn's
  set/unset actions; counter updates and set/unset happen only when the
  rule's detection (incl. bit checks) passed; after/threshold gate only
  *emission*, not state actions.

Scale notes:
- Only rows matching *stateful* sids take the shuffle; stateless alerts
  bypass it entirely (union afterwards). At 100 TB the stateful slice is
  typically ≪1% of turns.
- Hot conversations (50k turns) are a single group; replay is O(group)
  with numpy-backed column access. Salting would break state (SURVEY
  §7.4.5) so hot convs are NOT salted here — skew is bounded because only
  matched rows replay. AQE skew-join handles the stateless side.
- track="role" rules (by_username analogue) use a window-function variant
  (sliding approximation) — none in the canonical set.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame

from ..rules.model import Rule, RuleSet


def _replay_conv(rules_by_sid: dict[int, Rule], g: pd.DataFrame) -> pd.DataFrame:
    """Replay one conversation's matched events in (turn_idx, sid) order.

    Returns the subset of rows whose rule ultimately *fires* (emits).
    """
    g = g.sort_values(["turn_idx", "sid"], kind="mergesort")
    turn = g["turn_idx"].to_numpy()
    sid = g["sid"].to_numpy()
    ts = g["ts"].to_numpy().astype("datetime64[us]").astype("int64") / 1_000_000.0

    counters: dict[int, tuple[float, int]] = {}  # sid -> (window_start, count)
    bits: dict[str, float] = {}  # bit name -> set unix ts
    bit_expire: dict[str, float | None] = {}
    fires = [False] * len(g)

    i = 0
    n = len(g)
    while i < n:
        j = i
        while j < n and turn[j] == turn[i]:
            j += 1
        pending_sets: list[tuple[str, str, float, float | None]] = []
        for k in range(i, j):
            rule = rules_by_sid[int(sid[k])]
            t = ts[k]
            # 1) flexbit checks against pre-turn state
            detected = True
            for fb in rule.flexbits:
                if fb.action == "isset":
                    t0 = bits.get(fb.name)
                    exp = bit_expire.get(fb.name)
                    ok = t0 is not None and (exp is None or (t - t0) <= exp)
                    if not ok:
                        detected = False
                elif fb.action == "isnotset":
                    t0 = bits.get(fb.name)
                    exp = bit_expire.get(fb.name)
                    if t0 is not None and (exp is None or (t - t0) <= exp):
                        detected = False
            if not detected:
                continue
            # 2) counters update on detection; decide emission
            emit = True
            spec = rule.after or rule.threshold
            if spec is not None:
                ws, cnt = counters.get(rule.sid, (None, 0))
                if ws is None or t > ws + spec.seconds:
                    ws, cnt = t, 1
                else:
                    cnt += 1
                counters[rule.sid] = (ws, cnt)
                if rule.after is not None:
                    emit = cnt > rule.after.count
                else:
                    th = rule.threshold
                    if th.type in ("limit", "suppress"):
                        emit = cnt <= th.count
                    elif th.type == "threshold":
                        emit = cnt % th.count == 0
                    else:
                        raise ValueError(th.type)
            # 3) queue state actions (apply after the whole turn's checks)
            for fb in rule.flexbits:
                if fb.action in ("set", "unset"):
                    pending_sets.append((fb.action, fb.name, t, float(fb.expire) if fb.expire is not None else None))
            fires[k] = emit
        for action, name, t, exp in pending_sets:
            if action == "set":
                bits[name] = t
                bit_expire[name] = exp
            else:
                bits.pop(name, None)
                bit_expire.pop(name, None)
        i = j
    return g.loc[fires]


def run_correlate(alerts: DataFrame, ruleset: RuleSet) -> DataFrame:
    """Apply stateful correlation; stateless sids bypass the shuffle."""
    stateful_sids = [r.sid for r in ruleset.rules if r.stateful]
    if not stateful_sids:
        return alerts
    rules_by_sid = {r.sid: r for r in ruleset.rules if r.stateful}

    stateful = alerts.filter(alerts.sid.isin(stateful_sids))
    stateless = alerts.filter(~alerts.sid.isin(stateful_sids))

    schema = alerts.schema

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        return _replay_conv(rules_by_sid, pdf)

    replayed = stateful.groupBy("conv_id").applyInPandas(replay, schema=schema)
    return stateless.unionByName(replayed)


def sliding_after_counts(df: DataFrame, track_cols: Iterable[str], ts_col: str, seconds: int):
    """Sliding-window event count per track key over the trailing ``seconds``
    — the window-function variant for track="role" style rules and for the
    SQL-checkable queries() entries. NOTE: sliding, not Sagan reset-window."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = (
        Window.partitionBy(*track_cols)
        .orderBy(F.unix_timestamp(ts_col))
        .rangeBetween(-seconds, 0)
    )
    return F.count(F.lit(1)).over(w)
