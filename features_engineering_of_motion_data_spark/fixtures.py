"""Deterministic synthetic transcripts generator (FIXTURES.md §A).

Pure function of (seed, scale) using numpy PCG64; no wall clock, no hash
randomization. Output schema is exactly BASELINE.json's input_hint:
(conv_id string, turn_idx int32, role string, text string, tool string,
ts timestamp[us]).

The edge-case corpus (fixed conv_ids, FIXTURES.md table) is appended at every
scale so tests can target convs by name.
"""

from __future__ import annotations

import os
import string

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
SCALES = {
    # scale -> (n_convs, poisson lambda for extra turns)
    "tiny": (20, 19),
    "small": (500, 49),
    "bench": (20_000, 99),
    # 4x corpus for the scaling record: amortizes per-run fixed cost
    # (codegen, scheduler, buffer warm-up) so the N-vs-4N ratio measures
    # the engine, not the constant term (BENCH/BASELINE.md)
    "bench4x": (80_000, 99),
}
TOOLS = np.array(["search", "exec", "read", "write"])
EPOCH_2024 = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")
WEEK_US = 7 * 86_400 * 1_000_000

# one fixed pseudo-random alphabet, sliced to build unique-but-cheap texts
_ALPHABET_LEN = 16384


def _make_alphabet(rng: np.random.Generator) -> str:
    chars = np.array(list(string.ascii_letters + string.digits + " .,;:!?-"))
    return "".join(chars[rng.integers(0, len(chars), _ALPHABET_LEN)])


def _gen_conv_block(
    rng: np.random.Generator,
    conv_ids: np.ndarray,
    n_turns: np.ndarray,
    alphabet: str,
    drop_prob: float = 0.1,
) -> pd.DataFrame:
    """Vectorized generation for a batch of conversations."""
    total = int(n_turns.sum())
    conv_rep = np.repeat(conv_ids, n_turns)
    turn_idx = np.concatenate([np.arange(n, dtype=np.int64) for n in n_turns])

    # roles: tool turns with prob 0.25; otherwise alternate user/assistant
    is_tool = rng.random(total) < 0.25
    # first turn of each conv is always 'user'
    first_mask = turn_idx == 0
    is_tool[first_mask] = False
    # alternation index counts non-tool turns within each conv
    non_tool = (~is_tool).astype(np.int64)
    # per-conv cumulative sum of non-tool turns
    cum = np.cumsum(non_tool)
    conv_starts = np.concatenate([[0], np.cumsum(n_turns)[:-1]])
    base = np.repeat(cum[conv_starts] - non_tool[conv_starts], n_turns)
    alt = (cum - base - 1) % 2  # 0 -> user, 1 -> assistant
    role = np.where(is_tool, "tool", np.where(alt == 0, "user", "assistant"))
    tool = np.where(is_tool, TOOLS[rng.integers(0, len(TOOLS), total)], None)

    # timestamps: conv start uniform in week 1 of 2024; lognormal gaps
    start_us = rng.integers(0, WEEK_US, len(conv_ids))
    gaps_s = rng.lognormal(mean=2.5, sigma=1.2, size=total)
    gaps_us = np.maximum(np.round(gaps_s * 1e6).astype(np.int64), 1)
    gaps_us[first_mask] = 0
    offs = np.cumsum(gaps_us)
    offs = offs - np.repeat(offs[conv_starts], n_turns)
    ts_us = EPOCH_2024 + np.repeat(start_us, n_turns) + offs

    # texts: unique prefix + deterministic filler slice, lognormal length
    lens = np.clip(np.round(np.exp(rng.normal(5.0, 1.0, total))), 1, 8000).astype(
        np.int64
    )
    off = rng.integers(0, _ALPHABET_LEN - 8001, total)
    prefix = np.char.add(np.char.add(conv_rep.astype(str), ":"), turn_idx.astype(str))
    texts = [
        f"{p}:{alphabet[o : o + L]}" for p, o, L in zip(prefix, off, lens)
    ]

    df = pd.DataFrame(
        {
            "conv_id": conv_rep,
            "turn_idx": turn_idx.astype(np.int32),
            "role": role,
            "text": texts,
            "tool": tool,
            "ts": ts_us,
        }
    )

    # inject turn_idx gaps: ~drop_prob of convs lose a few interior turns
    gap_convs = rng.random(len(conv_ids)) < drop_prob
    if gap_convs.any():
        doomed = set(conv_ids[gap_convs])
        interior = df["conv_id"].isin(doomed) & (df["turn_idx"] > 0)
        drop = interior & (rng.random(total) < 0.15)
        df = df[~drop]
    return df


def _edge_corpus(rng: np.random.Generator, alphabet: str) -> pd.DataFrame:
    """Fixed-name edge conversations (FIXTURES.md table)."""
    frames: list[pd.DataFrame] = []
    base_ts = EPOCH_2024 + 3 * 86_400 * 1_000_000

    def mk(conv_id, turn_idx, ts_us, roles=None, tools=None, texts=None):
        n = len(turn_idx)
        if roles is None:
            roles = np.where(np.arange(n) % 2 == 0, "user", "assistant")
        if texts is None:
            texts = [f"{conv_id}:{t}:{alphabet[(7 * t) % 1000 : (7 * t) % 1000 + 40]}" for t in turn_idx]
        if tools is None:
            tools = [None] * n
        frames.append(
            pd.DataFrame(
                {
                    "conv_id": conv_id,
                    "turn_idx": np.asarray(turn_idx, dtype=np.int32),
                    "role": roles,
                    "text": texts,
                    "tool": tools,
                    "ts": np.asarray(ts_us, dtype=np.int64),
                }
            )
        )

    # single turn
    mk("edge_single", [0], [base_ts])
    # constant: identical text length, uniform 10s latency
    n = 50
    mk(
        "edge_constant",
        np.arange(n),
        base_ts + 10_000_000 * np.arange(n),
        texts=[f"edge_constant:{i:04d}:xxxxxxxxxx" for i in range(n)],
    )
    # hot conversation: 100k turns, ~1s latency
    n = 100_000
    gaps = np.maximum(np.round(rng.lognormal(0.0, 0.5, n) * 1e6).astype(np.int64), 1)
    gaps[0] = 0
    mk("edge_hot", np.arange(n), base_ts + np.cumsum(gaps))
    # interior gaps: turn_idx 0..99 with holes
    keep = np.setdiff1d(np.arange(100), np.array([13, 14, 15, 40, 41, 77, 78, 79, 80, 81]))
    mk("edge_gaps_mid", keep, base_ts + 30_000_000 * keep.astype(np.int64))
    # missing leading + trailing turns
    keep = np.arange(5, 95)
    mk("edge_gaps_ends", keep, base_ts + 20_000_000 * keep.astype(np.int64))
    # alternating text lengths around the mean (max zero-crossings on centered variants)
    n = 60
    mk(
        "edge_alternating",
        np.arange(n),
        base_ts + 15_000_000 * np.arange(n),
        texts=["edge_alternating:" + ("a" * (10 if i % 2 == 0 else 200)) for i in range(n)],
    )
    # duplicate microsecond timestamps (zero latency deltas)
    n = 30
    ts = base_ts + 1_000_000 * (np.arange(n) // 3)
    mk("edge_dup_ts", np.arange(n), ts)
    # bursty: ms bursts then hour-long silences (DoD 32-bit fallback)
    bursts = []
    t = base_ts
    for _ in range(20):
        for j in range(10):
            bursts.append(t)
            t += rng.integers(500, 5_000)  # microseconds
        t += 3_600_000_000  # 1 hour
    mk("edge_bursty", np.arange(len(bursts)), np.array(bursts))
    # every turn a tool call
    n = 40
    mk(
        "edge_all_tools",
        np.arange(n),
        base_ts + 5_000_000 * np.arange(n),
        roles=["tool"] * n,
        tools=[TOOLS[i % 4] for i in range(n)],
    )
    # rows shuffled on disk (ts/turn_idx still consistent)
    n = 80
    idx = np.arange(n)
    perm = rng.permutation(n)
    mk("edge_out_of_order_write", idx[perm], (base_ts + 12_000_000 * idx)[perm])
    # duplicated (conv_id, turn_idx) rows -> deterministic dedup tie-break
    mk(
        "edge_dup_turn",
        [0, 1, 1, 2],
        [base_ts, base_ts + 1_000_000, base_ts + 2_000_000, base_ts + 3_000_000],
        texts=["edge_dup_turn:a", "edge_dup_turn:keep", "edge_dup_turn:drop", "edge_dup_turn:c"],
    )
    return pd.concat(frames, ignore_index=True)


def generate_transcripts(scale: str = "tiny", seed: int = SEED) -> pd.DataFrame:
    """Deterministic transcripts table as a pandas DataFrame (ts in int64 µs)."""
    if scale not in SCALES:
        raise ValueError(f"unknown scale {scale!r}; one of {sorted(SCALES)}")
    n_convs, lam = SCALES[scale]
    rng = np.random.Generator(np.random.PCG64(seed))
    alphabet = _make_alphabet(rng)
    conv_ids = np.array([f"conv_{i:06d}" for i in range(n_convs)])
    n_turns = 1 + rng.poisson(lam, n_convs)
    main = _gen_conv_block(rng, conv_ids, n_turns, alphabet)
    edge = _edge_corpus(rng, alphabet)
    df = pd.concat([main, edge], ignore_index=True)
    return df


def transcripts_path(scale: str, data_dir: str | None = None) -> str:
    data_dir = data_dir or os.path.join(os.path.dirname(__file__), "..", "tests", "data")
    return os.path.abspath(os.path.join(data_dir, f"transcripts_{scale}.parquet"))


def ensure_transcripts_parquet(scale: str = "tiny", data_dir: str | None = None) -> str:
    """Write (once) and return the parquet path for a scale preset."""
    path = transcripts_path(scale, data_dir)
    if not os.path.exists(path):
        df = generate_transcripts(scale)
        table = pa.Table.from_pandas(
            df.assign(ts=df["ts"].astype("datetime64[us]")),
            schema=pa.schema(
                [
                    ("conv_id", pa.string()),
                    ("turn_idx", pa.int32()),
                    ("role", pa.string()),
                    ("text", pa.string()),
                    ("tool", pa.string()),
                    ("ts", pa.timestamp("us")),
                ]
            ),
            preserve_index=False,
        )
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        # bounded row groups so a local[32] scan parallelizes over one file:
        # splits can never be finer than row groups, and 131072-row groups
        # (16 per bench file) cap the scan at 16 tasks — half the cores idle
        # through the heaviest stage. 32768 rows ≈ 2.6 MB compressed mirrors
        # the many-small-files layout of a real corpus. bench4x keeps the
        # original 131072 layout: BENCH/scaling_pinned_p8_pgc32m.json's
        # sample history was measured against that exact file, and its
        # 1/4-core arms split on maxPartitionBytes=32m, not row groups.
        row_group = 131072 if scale == "bench4x" else 32768
        pq.write_table(table, tmp, row_group_size=row_group)
        os.replace(tmp, path)
    return path
