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
}


def _sizes(rng: np.random.Generator, n_convs: int, hot_cap: int) -> np.ndarray:
    cls = rng.choice(3, size=n_convs, p=[0.95, 0.04, 0.01])
    sizes = np.empty(n_convs, dtype=np.int64)
    sizes[cls == 0] = rng.integers(4, 41, size=int((cls == 0).sum()))
    sizes[cls == 1] = rng.integers(100, 1001, size=int((cls == 1).sum()))
    sizes[cls == 2] = rng.integers(5000, max(5001, hot_cap + 1), size=int((cls == 2).sum()))
    return sizes


def _plant(rng: np.random.Generator, text: np.ndarray, mask: np.ndarray, frag: str, prepend: bool = False) -> None:
    """Splice ``frag`` into the masked rows (vectorized string concat)."""
    if not mask.any():
        return
    if prepend:
        text[mask] = frag + ". " + text[mask]
    else:
        text[mask] = text[mask] + ". " + frag


def gen_chunk(conv_lo: int, conv_hi: int, seed: int, hot_cap: int, plant_scale: float = 1.0) -> pd.DataFrame:
    """Generate conversations [conv_lo, conv_hi) deterministically.

    Each conversation's content depends only on (seed, conv index), so any
    chunking yields identical rows — the property the resumable-checkpoint
    tests rely on.
    """
    n = conv_hi - conv_lo
    rng = np.random.default_rng([seed, conv_lo, conv_hi])
    sizes = _sizes(rng, n, hot_cap)
    total = int(sizes.sum())
    offsets = np.zeros(n, dtype=np.int64)
    offsets[1:] = np.cumsum(sizes)[:-1]

    conv_idx = np.repeat(np.arange(conv_lo, conv_hi), sizes)
    conv_id = np.char.add("conv", np.char.zfill(conv_idx.astype("U10"), 8))
    turn_idx = (np.arange(total) - np.repeat(offsets, sizes)).astype(np.int32)

    role = rng.choice(ROLES, size=total, p=ROLE_P)
    tool = rng.choice(TOOLS, size=total, p=TOOL_P)

    # correlation-plant conv classes drawn up front (they shape gaps too):
    # bursty (retry storms, rapid turns) and bursty2 (refusal storms)
    conv_r = rng.random(size=n)
    bursty = np.repeat(conv_r < 0.05 * plant_scale, sizes)
    bursty2 = np.repeat((conv_r >= 0.05 * plant_scale) & (conv_r < 0.10 * plant_scale), sizes)

    # timestamps: per-conv seeded start in 2025, strictly increasing gaps.
    # Normal convs gap 1–600s; burst convs gap 1–30s / 1–120s so the
    # after/threshold seconds windows see both dense (firing) and sparse
    # (resetting) event trains.
    base = np.datetime64("2025-01-01T00:00:00", "us")
    conv_start = rng.integers(0, 120 * 86400, size=n) * 1_000_000  # within ~4 months
    gaps = rng.integers(1, 601, size=total)
    gaps[bursty] = rng.integers(1, 31, size=int(bursty.sum()))
    gaps[bursty2] = rng.integers(1, 121, size=int(bursty2.sum()))
    gaps = gaps * 1_000_000
    g = np.cumsum(gaps)
    # per-conv cumulative: subtract the cumsum value just before each conv start
    head = np.zeros(n, dtype=np.int64)
    head[1:] = g[offsets[1:] - 1]
    rel = g - np.repeat(head, sizes)
    ts = base + (np.repeat(conv_start, sizes) + rel).astype("timedelta64[us]")

    tmpl = rng.integers(0, len(TEMPLATES), size=total)
    text = np.array(TEMPLATES, dtype=object)[tmpl]
    # expand the {tool} placeholder where present
    has_ph = np.array(["{tool}" in TEMPLATES[i] for i in range(len(TEMPLATES))])[tmpl]
    if has_ph.any():
        text[has_ph] = np.array(
            [t.replace("{tool}", tl) for t, tl in zip(text[has_ph], tool[has_ph])], dtype=object
        )

    r = rng.random(size=total)
    ps = plant_scale
    is_assist = role == "assistant"
    # each plant gets a disjoint slice of the uniform draw so probabilities are exact
    _plant(rng, text, is_assist & (r < 0.010 * ps), PLANT["p_err_timeout"])
    _plant(rng, text, is_assist & (r >= 0.010 * ps) & (r < 0.018 * ps), PLANT["p_err_only"])
    # a few non-assistant rows carry the full pattern but must NOT fire (P1 prefilter test)
    _plant(rng, text, ~is_assist & (r < 0.004 * ps), PLANT["p_err_timeout"])
    _plant(rng, text, (r >= 0.018 * ps) & (r < 0.024 * ps), PLANT["p_cred_early"], prepend=True)
    _plant(rng, text, (r >= 0.024 * ps) & (r < 0.030 * ps), PLANT["p_cred_late"])
    _plant(rng, text, (r >= 0.030 * ps) & (r < 0.036 * ps), PLANT["p_alpha_omega"])
    _plant(rng, text, (r >= 0.036 * ps) & (r < 0.040 * ps), PLANT["p_alpha_omega_decoy"])
    _plant(rng, text, (r >= 0.040 * ps) & (r < 0.044 * ps), PLANT["p_alpha_far"])
    _plant(rng, text, (r >= 0.044 * ps) & (r < 0.048 * ps), PLANT["p_meta_ssh"])
    _plant(rng, text, (r >= 0.048 * ps) & (r < 0.051 * ps), PLANT["p_meta_ftp"])
    _plant(rng, text, (r >= 0.051 * ps) & (r < 0.053 * ps), PLANT["p_meta_telnet"])
    _plant(rng, text, (r >= 0.053 * ps) & (r < 0.058 * ps), PLANT["p_code_hi"])
    _plant(rng, text, (r >= 0.058 * ps) & (r < 0.064 * ps), PLANT["p_code_lo"])
    _plant(rng, text, (r >= 0.064 * ps) & (r < 0.068 * ps), PLANT["p_md5"])
    _plant(rng, text, (r >= 0.068 * ps) & (r < 0.071 * ps), PLANT["p_sha1_decoy"])
    blk = np.isin(tool, ["bash", "email"])
    _plant(rng, text, blk & (r >= 0.071 * ps) & (r < 0.120 * ps), PLANT["p_exec"])
    _plant(rng, text, ~blk & (r >= 0.071 * ps) & (r < 0.080 * ps), PLANT["p_exec"])  # non-firing: tool not blacklisted

    # correlation plants: dense in the burst convs, sparse elsewhere
    _plant(rng, text, (bursty & (r >= 0.120 * ps) & (r < 0.50 * ps)) | (~bursty & (r >= 0.120 * ps) & (r < 0.135 * ps)), PLANT["p_retry"])
    _plant(rng, text, (bursty2 & (r >= 0.50 * ps) & (r < 0.70 * ps)) | (~bursty2 & (r >= 0.50 * ps) & (r < 0.515 * ps)), PLANT["p_refuse"])
    _plant(rng, text, (r >= 0.70 * ps) & (r < 0.715 * ps), PLANT["p_login_failed"])
    _plant(rng, text, (r >= 0.715 * ps) & (r < 0.745 * ps), PLANT["p_sudo"])

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
