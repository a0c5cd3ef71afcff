"""Deterministic synthetic transcript table (FIXTURES.md §1).

Stands in for the reference's syslog stream ([PUB src/input-pipe.c];
payload transposition per BASELINE.json:6 — syslog line → transcript turn,
program → role, facility/tag → tool). Fully seeded, no external data.

Schema: (conv_id string, turn_idx int32, role string, text string,
tool string, ts timestamp[us]).

Contracts honored (FIXTURES.md):
- turn_idx unique & gapless per conv (flexbit replay depends on it).
- conv sizes Zipf-ish: ~95% small (4–40), ~4% medium (100–1000),
  ~1% hot (5000–50000, capped by ``hot_cap``) — skew targets for salting.
- ts strictly increasing within conv, gaps 1–600 s.
- planted patterns for every canonical rule (FIXTURES.md §3) with both
  firing and non-firing cases; ground truth is computed by the pandas
  oracle, never hand-maintained.
- physical file order shuffled (engine must not rely on it).

Generation is numpy-vectorized and chunked by conversation so bench-scale
tables (10^6–10^7 turns) build in seconds and never hold more than one
chunk in memory.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

ROLES = np.array(["user", "assistant", "tool", "system"])
ROLE_P = np.array([0.27, 0.45, 0.15, 0.13])
TOOLS = np.array(["none", "search", "browser", "python", "bash", "sql", "email", "calc"])
TOOL_P = np.array([0.60, 0.08, 0.07, 0.07, 0.06, 0.05, 0.04, 0.03])

# Base sentence templates — agent-transcript-ish filler over a fixed vocab.
TEMPLATES = [
    "the assistant reviewed the plan and produced a summary of the next steps",
    "user asked about the quarterly report and the open action items",
    "invoking the {tool} tool with the given arguments and awaiting output",
    "the function returned a structured payload with nested fields",
    "let me check the documentation before answering that question",
    "here is the revised draft incorporating the feedback from the last turn",
    "running the requested command now and streaming the partial results",
    "I could not find a matching record in the index for that identifier",
    "the search results contain three relevant entries ranked by score",
    "parsing the uploaded file and extracting the table of contents",
    "the model weights were loaded and the evaluation loop started",
    "scheduling a follow-up task to verify the deployment status",
    "the response was truncated so I will continue in the next message",
    "applying the patch to the repository and rerunning the test suite",
    "the metrics dashboard shows a steady increase in throughput",
    "summarizing the conversation so far for the handoff document",
    "naïve re-encoding of the données column preserved the UTF-8 bytes",
    "translation check: 日本語のテキストはそのまま保持されます ✓",
    "emoji passthrough test 🚀 with mixed ascii and multibyte content",
]

# Planted pattern fragments, one family per canonical rule (FIXTURES.md §3).
PLANT = {
    # sid 1000001: role=assistant + content "error" + pcre /tool\s+timeout/i
    "p_err_timeout": "an error occurred: the Tool  Timeout was exceeded while waiting",
    "p_err_only": "an error occurred but the operation eventually succeeded",
    # sid 1000002: nocase "credential" with offset/depth bound (must start early)
    "p_cred_early": "CREDENTIAL scan flagged this message for review",
    "p_cred_late": "the long preamble continues for a while before any cReDeNtIaL mention appears here",
    # sid 1000003: content "alpha" then "omega" with distance/within, !"decoy"
    "p_alpha_omega": "alpha phase complete, proceeding to omega checkpoint",
    "p_alpha_omega_decoy": "alpha phase complete, proceeding to omega checkpoint decoy marker",
    "p_alpha_far": "alpha start " + "x" * 80 + " omega far away",
    # sid 1000004: meta_content ssh|ftp|telnet
    "p_meta_ssh": "opened an ssh session to the staging host",
    "p_meta_ftp": "legacy ftp transfer completed with warnings",
    "p_meta_telnet": "telnet fallback attempted on port 23",
    # sid 1000005: grok code=NNN, fire when >= 500
    "p_code_hi": "request failed with code=503 after retries",
    "p_code_lo": "request completed with code=204 no content",
    # sid 1000006: md5 hash literal
    "p_md5": "artifact checksum d41d8cd98f00b204e9800998ecf8427e verified",
    "p_sha1_decoy": "artifact checksum da39a3ee5e6b4b0d3255bfef95601890afd80709 verified",
    # sid 1000008: tool in (bash,email) + content "exec"
    "p_exec": "about to exec the generated script in a sandbox",
    # sid 1000010: after-rule content "retry"
    "p_retry": "transient failure, scheduling a retry with backoff",
    # sid 1000011: threshold rule pcre /refus/i
    "p_refuse": "the request was Refused by the upstream policy",
    # sid 1000012: flexbit set "login failed" → check "sudo"
    "p_login_failed": "authentication attempt: login failed for account",
    "p_sudo": "escalation: sudo command issued by the agent",
    # sid 1000014: parse_src_ip/parse_port/parse_proto tokens (P10/P11)
    "p_conn": "connection from 10.1.2.3 port 8443 proto TCP established",
    "p_conn_partial": "connection from host port 8443 established",
}


# ---------------------------------------------------------------------------
# Chunk-invariant randomness: every random value is a pure function of
# (seed, conv index[, turn index], stream id) via a vectorized splitmix64
# finalizer — NOT a sequential RNG — so gen_chunk(0,10) row-equals
# concat(gen_chunk(0,3), gen_chunk(3,10)) exactly (tested). This is the
# property the resumable-checkpoint tests and the "any chunking yields
# identical rows" invariant rely on.
# ---------------------------------------------------------------------------

_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)
_GAMMA = np.uint64(0x9E3779B97F4A7C15)

# per-purpose stream ids (arbitrary distinct constants)
_S_CLASS, _S_SIZE, _S_START, _S_CONVR = 1, 2, 3, 4
_S_ROLE, _S_TOOL, _S_TMPL, _S_GAP, _S_PLANT = 11, 12, 13, 14, 15


def _mix64(z):
    """splitmix64 finalizer (public-domain constants), numpy-vectorized.
    uint64 wraparound is the intent — numpy only warns on the scalar path."""
    with np.errstate(over="ignore"):
        z = np.uint64(z) if np.isscalar(z) else z.astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * _C1
        z = (z ^ (z >> np.uint64(27))) * _C2
        return z ^ (z >> np.uint64(31))


def _h64(key: np.ndarray, stream: int, seed: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        salt = _mix64(np.uint64(seed) * _GAMMA + np.uint64(stream))
        return _mix64(key.astype(np.uint64) * _GAMMA ^ salt)


def _u01(key: np.ndarray, stream: int, seed: int) -> np.ndarray:
    return _h64(key, stream, seed).astype(np.float64) / float(2**64)


def _rint(key: np.ndarray, stream: int, seed: int, lo: int, hi: int) -> np.ndarray:
    """Uniform int in [lo, hi) (modulo bias negligible for span ≪ 2^64)."""
    return (lo + _h64(key, stream, seed) % np.uint64(hi - lo)).astype(np.int64)


def _pick(key: np.ndarray, stream: int, seed: int, values: np.ndarray, p: np.ndarray):
    idx = np.searchsorted(np.cumsum(p), _u01(key, stream, seed), side="right")
    return values[np.minimum(idx, len(values) - 1)]


def _sizes(conv_keys: np.ndarray, seed: int, hot_cap: int) -> np.ndarray:
    clsr = _u01(conv_keys, _S_CLASS, seed)
    small = _rint(conv_keys, _S_SIZE, seed, 4, 41)
    med = _rint(conv_keys, _S_SIZE, seed, 100, 1001)
    hot = _rint(conv_keys, _S_SIZE, seed, 5000, max(5001, hot_cap + 1))
    return np.select([clsr < 0.95, clsr < 0.99], [small, med], default=hot)


def _plant(text: np.ndarray, mask: np.ndarray, frag: str, prepend: bool = False) -> None:
    """Splice ``frag`` into the masked rows (vectorized string concat)."""
    if not mask.any():
        return
    if prepend:
        text[mask] = frag + ". " + text[mask]
    else:
        text[mask] = text[mask] + ". " + frag


_TURN_BITS = 21  # turn_idx < 2^21 — (conv_idx, turn_idx) packs into one u64 key


def gen_chunk(conv_lo: int, conv_hi: int, seed: int, hot_cap: int, plant_scale: float = 1.0) -> pd.DataFrame:
    """Generate conversations [conv_lo, conv_hi) deterministically.

    Every random value is a hash of (seed, conv index[, turn index]) — see
    the chunk-invariance note above — so each conversation's content
    depends only on (seed, conv index) and any chunking yields identical
    rows (tested by test_rule_semantics chunk-equivalence)."""
    assert hot_cap < (1 << _TURN_BITS), "hot_cap exceeds the turn-key packing bound"
    n = conv_hi - conv_lo
    conv_keys = np.arange(conv_lo, conv_hi, dtype=np.uint64)
    sizes = _sizes(conv_keys, seed, hot_cap)
    total = int(sizes.sum())
    offsets = np.zeros(n, dtype=np.int64)
    offsets[1:] = np.cumsum(sizes)[:-1]

    conv_idx = np.repeat(np.arange(conv_lo, conv_hi), sizes)
    conv_id = np.char.add("conv", np.char.zfill(conv_idx.astype("U10"), 8))
    turn_idx = (np.arange(total) - np.repeat(offsets, sizes)).astype(np.int32)
    gkeys = (conv_idx.astype(np.uint64) << np.uint64(_TURN_BITS)) | turn_idx.astype(np.uint64)

    role = _pick(gkeys, _S_ROLE, seed, ROLES, ROLE_P)
    tool = _pick(gkeys, _S_TOOL, seed, TOOLS, TOOL_P)

    # correlation-plant conv classes drawn up front (they shape gaps too):
    # bursty (retry storms, rapid turns) and bursty2 (refusal storms)
    conv_r = _u01(conv_keys, _S_CONVR, seed)
    bursty = np.repeat(conv_r < 0.05 * plant_scale, sizes)
    bursty2 = np.repeat((conv_r >= 0.05 * plant_scale) & (conv_r < 0.10 * plant_scale), sizes)

    # timestamps: per-conv seeded start in 2025, strictly increasing gaps.
    # Normal convs gap 1–600s; burst convs gap 1–30s / 1–120s so the
    # after/threshold seconds windows see both dense (firing) and sparse
    # (resetting) event trains. One hash per turn, range selected per class
    # — keeps the gap a pure function of (seed, conv, turn, class).
    base = np.datetime64("2025-01-01T00:00:00", "us")
    conv_start = _rint(conv_keys, _S_START, seed, 0, 120 * 86400) * 1_000_000
    gap_h = _h64(gkeys, _S_GAP, seed)
    gaps = (1 + gap_h % np.uint64(600)).astype(np.int64)
    gaps[bursty] = (1 + gap_h[bursty] % np.uint64(30)).astype(np.int64)
    gaps[bursty2] = (1 + gap_h[bursty2] % np.uint64(120)).astype(np.int64)
    gaps = gaps * 1_000_000
    g = np.cumsum(gaps)
    # per-conv cumulative: subtract the cumsum value just before each conv start
    head = np.zeros(n, dtype=np.int64)
    head[1:] = g[offsets[1:] - 1]
    rel = g - np.repeat(head, sizes)
    ts = base + (np.repeat(conv_start, sizes) + rel).astype("timedelta64[us]")

    tmpl = _rint(gkeys, _S_TMPL, seed, 0, len(TEMPLATES))
    text = np.array(TEMPLATES, dtype=object)[tmpl]
    # expand the {tool} placeholder where present
    has_ph = np.array(["{tool}" in TEMPLATES[i] for i in range(len(TEMPLATES))])[tmpl]
    if has_ph.any():
        text[has_ph] = np.array(
            [t.replace("{tool}", tl) for t, tl in zip(text[has_ph], tool[has_ph])], dtype=object
        )

    r = _u01(gkeys, _S_PLANT, seed)
    ps = plant_scale
    is_assist = role == "assistant"
    # each plant gets a disjoint slice of the uniform draw so probabilities are exact
    _plant(text, is_assist & (r < 0.010 * ps), PLANT["p_err_timeout"])
    _plant(text, is_assist & (r >= 0.010 * ps) & (r < 0.018 * ps), PLANT["p_err_only"])
    # a few non-assistant rows carry the full pattern but must NOT fire (P1 prefilter test)
    _plant(text, ~is_assist & (r < 0.004 * ps), PLANT["p_err_timeout"])
    _plant(text, (r >= 0.018 * ps) & (r < 0.024 * ps), PLANT["p_cred_early"], prepend=True)
    _plant(text, (r >= 0.024 * ps) & (r < 0.030 * ps), PLANT["p_cred_late"])
    _plant(text, (r >= 0.030 * ps) & (r < 0.036 * ps), PLANT["p_alpha_omega"])
    _plant(text, (r >= 0.036 * ps) & (r < 0.040 * ps), PLANT["p_alpha_omega_decoy"])
    _plant(text, (r >= 0.040 * ps) & (r < 0.044 * ps), PLANT["p_alpha_far"])
    _plant(text, (r >= 0.044 * ps) & (r < 0.048 * ps), PLANT["p_meta_ssh"])
    _plant(text, (r >= 0.048 * ps) & (r < 0.051 * ps), PLANT["p_meta_ftp"])
    _plant(text, (r >= 0.051 * ps) & (r < 0.053 * ps), PLANT["p_meta_telnet"])
    _plant(text, (r >= 0.053 * ps) & (r < 0.058 * ps), PLANT["p_code_hi"])
    _plant(text, (r >= 0.058 * ps) & (r < 0.064 * ps), PLANT["p_code_lo"])
    _plant(text, (r >= 0.064 * ps) & (r < 0.068 * ps), PLANT["p_md5"])
    _plant(text, (r >= 0.068 * ps) & (r < 0.071 * ps), PLANT["p_sha1_decoy"])
    blk = np.isin(tool, ["bash", "email"])
    _plant(text, blk & (r >= 0.071 * ps) & (r < 0.120 * ps), PLANT["p_exec"])
    _plant(text, ~blk & (r >= 0.071 * ps) & (r < 0.080 * ps), PLANT["p_exec"])  # non-firing: tool not blacklisted

    # correlation plants: dense in the burst convs, sparse elsewhere
    _plant(text, (bursty & (r >= 0.120 * ps) & (r < 0.50 * ps)) | (~bursty & (r >= 0.120 * ps) & (r < 0.135 * ps)), PLANT["p_retry"])
    _plant(text, (bursty2 & (r >= 0.50 * ps) & (r < 0.70 * ps)) | (~bursty2 & (r >= 0.50 * ps) & (r < 0.515 * ps)), PLANT["p_refuse"])
    _plant(text, (r >= 0.70 * ps) & (r < 0.715 * ps), PLANT["p_login_failed"])
    _plant(text, (r >= 0.715 * ps) & (r < 0.745 * ps), PLANT["p_sudo"])
    # P10/P11 token plants: full connection line (fires 1000014) and a
    # partial one missing the IP (must NOT fire — required-token check)
    _plant(text, (r >= 0.745 * ps) & (r < 0.757 * ps), PLANT["p_conn"])
    _plant(text, (r >= 0.757 * ps) & (r < 0.765 * ps), PLANT["p_conn_partial"])

    return pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": turn_idx,
            "role": role,
            "text": text.astype(object),
            "tool": tool,
            "ts": pd.Series(ts),
        }
    )


def write_transcripts(
    path: str,
    n_convs: int = 200,
    seed: int = 42,
    hot_cap: int = 8000,
    chunk_convs: int = 2000,
    plant_scale: float = 1.0,
) -> int:
    """Write the transcript table as a multi-file parquet directory.

    Rows are shuffled within each chunk before writing so the physical
    order carries no (conv_id, turn_idx) sort the engine could lean on.
    Returns total row count.
    """
    os.makedirs(path, exist_ok=True)
    for f in os.listdir(path):
        if f.endswith(".parquet"):
            os.remove(os.path.join(path, f))
    total = 0
    part = 0
    for lo in range(0, n_convs, chunk_convs):
        hi = min(lo + chunk_convs, n_convs)
        pdf = gen_chunk(lo, hi, seed, hot_cap, plant_scale)
        perm = np.random.default_rng([seed, 7919, lo]).permutation(len(pdf))
        pdf = pdf.iloc[perm].reset_index(drop=True)
        tbl = pa.Table.from_pandas(pdf, schema=SCHEMA, preserve_index=False)
        pq.write_table(tbl, os.path.join(path, f"part-{part:05d}.parquet"))
        total += len(pdf)
        part += 1
    return total
