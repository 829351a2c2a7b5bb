"""Deterministic synthetic transcript generator (SURVEY §7 M0, FIXTURES.md).

Mirrors the reference's test source ``logGen`` (/root/reference/src/test/
logGen:1-8): every turn's ``text`` embeds a date prefix, a parse target
(``event=<type>``, optional ``ERR-NNN``) and a trailing counter equal to
``turn_idx`` — which enables the ``logCheck`` invariant (per sink,
``count(*) == max(counter)``; /root/reference/src/test/logCheck:6-14).

Pure numpy/pandas/pyarrow — no Ray.  Everything is seeded; the same
(n_convs, seed, variant) always yields byte-identical tables.  Row order on
disk is a deterministic shuffle: order restoration is part of what is under
test (reference README.md:229 — chunks need not arrive in order).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..schema import TRANSCRIPT_SCHEMA

_ROLES = np.array(["user", "assistant", "system", "tool"])
_TOOL_NAMES = np.array(
    ["bash", "grep", "read_file", "write_file", "search", "browser",
     "python", "sql", "http_get", "calc", "edit", "list_dir"]
)
_CMD_SLUGS = np.array(["run", "query", "open", "scan", "fetch", "exec", "load", "sync"])
_PHRASES = np.array(
    ["processing request item", "tool invocation dispatched", "result payload captured",
     "fatal failure while handling", "routine status update", "handshake acknowledged",
     "continuing previous thread", "summarizing prior context"]
)
_BASE_EPOCH_US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z, fixed


@dataclass
class GroundTruth:
    """Generator-emitted expectations for golden tests (FIXTURES.md §3)."""

    # per-sink (sink, n_rows, max_counter) — logCheck analog
    sink_counts: pd.DataFrame = field(default=None)
    # per-conv in-order concatenation — the `diff` analog
    docs: pd.DataFrame = field(default=None)
    # gap fixtures: (conv_id, first_missing_turn)
    quarantine: pd.DataFrame = field(default=None)
    # clean parsed rows (conv_id, turn_idx, event_type, error_code, counter,
    # tool_name, sink) — routed-row equality target
    turns: pd.DataFrame = field(default=None)


def _conv_sizes(n_convs: int, rng: np.random.Generator, hot_frac: float) -> np.ndarray:
    """Zipf(a=1.2) sizes clipped to [2, 500]; conv 0 becomes the hot key
    holding ~hot_frac of all rows (skew fixture, SURVEY §4 skew row)."""
    sizes = np.clip(rng.zipf(1.2, size=n_convs), 2, 500).astype(np.int64)
    if hot_frac > 0 and n_convs > 1:
        rest = int(sizes[1:].sum())
        sizes[0] = max(2, int(rest * hot_frac / (1.0 - hot_frac)))
    return sizes


def generate_transcripts(
    n_convs: int = 200,
    seed: int = 42,
    hot_frac: float = 0.10,
    with_session: bool = False,
) -> tuple[pa.Table, GroundTruth]:
    """Generate the base (clean) transcript table plus ground truth.

    Returned table follows TRANSCRIPT_SCHEMA (+ ``session`` int64 when
    ``with_session``), rows deterministically shuffled.
    """
    rng = np.random.default_rng(seed)
    sizes = _conv_sizes(n_convs, rng, hot_frac)
    n = int(sizes.sum())

    conv_ord = np.repeat(np.arange(n_convs), sizes)          # conv index per row
    starts = np.zeros(n_convs, dtype=np.int64)
    starts[1:] = np.cumsum(sizes)[:-1]
    turn_idx = (np.arange(n, dtype=np.int64) - starts[conv_ord] + 1).astype(np.int32)

    conv_names = np.array([f"conv-{i:06d}" for i in range(n_convs)])
    conv_id = conv_names[conv_ord]

    # roles: cycle user/assistant by parity, then 5% system, 10% tool
    u = rng.random(n)
    role_idx = np.where(u < 0.05, 2, np.where(u < 0.15, 3, (turn_idx + 1) % 2))
    role = _ROLES[role_idx]

    # event types: tool role → tool_result; assistant → 15% tool_call / 5% error / msg;
    # user & system → msg
    v = rng.random(n)
    event = np.full(n, "msg", dtype=object)
    event[role == "tool"] = "tool_result"
    is_asst = role == "assistant"
    event[is_asst & (v < 0.15)] = "tool_call"
    event[is_asst & (v >= 0.15) & (v < 0.20)] = "error"
    err_num = rng.integers(0, 1000, n)
    err_str = "ERR-" + np.char.zfill(err_num.astype(str), 3).astype(object)
    error_code = np.where(event == "error", err_str, "").astype(object)

    # tool column: non-empty iff event in {tool_call, tool_result}
    tname = _TOOL_NAMES[rng.integers(0, len(_TOOL_NAMES), n)]
    slug = _CMD_SLUGS[rng.integers(0, len(_CMD_SLUGS), n)]
    exit_code = rng.integers(0, 3, n)
    has_tool = np.isin(event, ["tool_call", "tool_result"])
    tool_str = (
        "tool=" + tname.astype(object) + " cmd=" + slug.astype(object)
        + " exit=" + exit_code.astype(str).astype(object)
    )
    tool = np.where(has_tool, tool_str, "")

    # timestamps: conv start deterministic, + cumsum of jittered 1–5 s steps
    conv_start = _BASE_EPOCH_US + np.arange(n_convs, dtype=np.int64) * 37_000_000
    steps = rng.integers(1_000_000, 5_000_000, n)
    cum = np.cumsum(steps)
    offs = cum - cum[starts[conv_ord]] + steps[starts[conv_ord]]
    ts_us = conv_start[conv_ord] + offs
    ts = pd.to_datetime(ts_us, unit="us")

    # text: "{Www Mmm dd, yyyy HH:MM:SS.mmm} event=<type>[ ERR-nnn] <phrase> <counter>"
    date_str = (
        ts.strftime("%a %b %d, %Y %H:%M:%S.")
        + pd.Index((ts_us // 1000) % 1000).astype(str).str.zfill(3)
    )
    phrase = _PHRASES[rng.integers(0, len(_PHRASES), n)]
    err_part = np.where(error_code == "", "", " " + error_code).astype(object)
    text = (
        np.asarray(date_str, dtype=object)
        + " event=" + event
        + err_part
        + " " + phrase.astype(object)
        + " " + turn_idx.astype(np.int64).astype(str).astype(object)
    )

    cols = {
        "conv_id": conv_id,
        "turn_idx": turn_idx,
        "role": role.astype(object),
        "text": text,
        "tool": tool.astype(object),
        "ts": ts_us,
    }
    if with_session:
        cols["session"] = np.full(n, _BASE_EPOCH_US // 1_000_000, dtype=np.int64)

    df = pd.DataFrame(cols)

    if with_session:
        sink = conv_id.astype(object) + "." + df["session"].astype(str).to_numpy(dtype=object)
    else:
        sink = conv_id
    gt_turns = pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": turn_idx,
            "event_type": event,
            "error_code": error_code,
            "counter": turn_idx.astype(np.int64),
            "tool_name": np.where(has_tool, tname, ""),
            "sink": sink,
        }
    )
    gt_docs = (
        pd.DataFrame({"conv_id": conv_id, "text": text})
        .groupby("conv_id", sort=True)["text"]
        .agg("\n".join)
        .reset_index()
        .rename(columns={"text": "assembled_text"})
    )
    gt_counts = (
        pd.DataFrame({"sink": sink, "counter": turn_idx.astype(np.int64)})
        .groupby("sink", sort=True)
        .agg(n_rows=("counter", "size"), max_counter=("counter", "max"))
        .reset_index()
    )
    gt = GroundTruth(sink_counts=gt_counts, docs=gt_docs,
                     quarantine=pd.DataFrame(columns=["conv_id", "first_missing_turn"]),
                     turns=gt_turns)

    # deterministic on-disk shuffle (order restoration is under test)
    perm = np.random.default_rng(seed + 1).permutation(n)
    df = df.iloc[perm].reset_index(drop=True)

    table = _to_arrow(df, with_session)
    return table, gt


def _to_arrow(df: pd.DataFrame, with_session: bool) -> pa.Table:
    fields = list(TRANSCRIPT_SCHEMA)
    arrays = [
        pa.array(df["conv_id"], pa.string()),
        pa.array(df["turn_idx"], pa.int32()),
        pa.array(df["role"], pa.string()),
        pa.array(df["text"], pa.string()),
        pa.array(df["tool"], pa.string()),
        pa.array(df["ts"].to_numpy(), pa.timestamp("us")),
    ]
    if with_session:
        fields = fields + [pa.field("session", pa.int64())]
        arrays.append(pa.array(df["session"], pa.int64()))
    return pa.Table.from_arrays(arrays, schema=pa.schema(fields))


# ---------------------------------------------------------------------------
# Perturbation variants (FIXTURES.md §1) — applied to a generated table.
# Each returns (table, GroundTruth) with ground truth adjusted to the
# reference's decode semantics (first-wins dedup, contiguity gate,
# mid-stream init; datadecoder/.../DataPumpDecoderSort.java:142-181).
# ---------------------------------------------------------------------------

def with_duplicates(table: pa.Table, gt: GroundTruth, frac: float = 0.03,
                    seed: int = 42) -> tuple[pa.Table, GroundTruth]:
    """Duplicate ``frac`` of rows (exact copies) — dedup is first-wins on
    (conv_id, turn_idx) so ground truth is unchanged."""
    rng = np.random.default_rng(seed + 2)
    n = table.num_rows
    pick = rng.choice(n, size=max(1, int(n * frac)), replace=False)
    dup = table.take(pa.array(np.sort(pick)))
    out = pa.concat_tables([table, dup])
    perm = rng.permutation(out.num_rows)
    return out.take(pa.array(perm)), gt


def with_gaps(table: pa.Table, gt: GroundTruth, frac_convs: float = 0.05,
              seed: int = 42) -> tuple[pa.Table, GroundTruth]:
    """Delete one interior turn in ``frac_convs`` of conversations (size≥4).

    Post-gap rows must be quarantined by the contiguity gate; ground truth
    docs/counts are truncated at the gap and ``quarantine`` records
    (conv_id, first_missing_turn)."""
    rng = np.random.default_rng(seed + 3)
    df = table.to_pandas()
    stats = df.groupby("conv_id")["turn_idx"].agg(["min", "max"])
    sizes = stats["max"]
    # composable: skip convs already perturbed (mid-stream starts)
    eligible = stats[(stats["max"] >= 4) & (stats["min"] == 1)].index.to_numpy()
    k = max(1, int(len(sizes) * frac_convs))
    chosen = rng.choice(eligible, size=min(k, len(eligible)), replace=False)
    drop_turn = {c: int(rng.integers(2, sizes[c])) for c in chosen}  # interior: 2..max-1

    mask = np.ones(len(df), dtype=bool)
    for c, t in drop_turn.items():
        mask &= ~((df["conv_id"] == c) & (df["turn_idx"] == t))
    out_df = df[mask].reset_index(drop=True)

    quar = pd.DataFrame(
        {"conv_id": list(drop_turn), "first_missing_turn": list(drop_turn.values())}
    ).sort_values("conv_id").reset_index(drop=True)

    gt2 = _truncate_gt(gt, drop_turn)
    gt2.quarantine = quar
    return _to_arrow(out_df, "session" in df.columns), gt2


def with_midstream(table: pa.Table, gt: GroundTruth, frac_convs: float = 0.05,
                   seed: int = 42) -> tuple[pa.Table, GroundTruth]:
    """Drop turns < k for ``frac_convs`` of convs (start mid-stream).

    Reference mid-stream init rule (DataPumpDecoderSort.java:167-174): with
    no prior state, reassembly starts at min(turn_idx).  Ground-truth docs
    lose the dropped prefix; counts lose the dropped rows (max_counter
    unchanged)."""
    rng = np.random.default_rng(seed + 4)
    df = table.to_pandas()
    sizes = df.groupby("conv_id")["turn_idx"].max()
    # composable: skip convs already gap-perturbed (their GT is truncated)
    gap_convs = set(gt.quarantine["conv_id"]) if gt.quarantine is not None else set()
    eligible = np.array(
        [c for c in sizes[sizes >= 4].index if c not in gap_convs], dtype=object
    )
    k = max(1, int(len(sizes) * frac_convs))
    chosen = rng.choice(eligible, size=min(k, len(eligible)), replace=False)
    start_at = {c: int(rng.integers(2, sizes[c])) for c in chosen}

    mask = np.ones(len(df), dtype=bool)
    for c, t in start_at.items():
        mask &= ~((df["conv_id"] == c) & (df["turn_idx"] < t))
    out_df = df[mask].reset_index(drop=True)

    gt2 = _drop_prefix_gt(gt, start_at)
    return _to_arrow(out_df, "session" in df.columns), gt2


def _truncate_gt(gt: GroundTruth, drop_turn: dict[str, int]) -> GroundTruth:
    turns = gt.turns[
        ~gt.turns.apply(
            lambda r: r["conv_id"] in drop_turn and r["turn_idx"] >= drop_turn[r["conv_id"]],
            axis=1,
        )
    ].reset_index(drop=True)
    return _rebuild_gt(gt, turns, drop_turn)


def _drop_prefix_gt(gt: GroundTruth, start_at: dict[str, int]) -> GroundTruth:
    turns = gt.turns[
        ~gt.turns.apply(
            lambda r: r["conv_id"] in start_at and r["turn_idx"] < start_at[r["conv_id"]],
            axis=1,
        )
    ].reset_index(drop=True)
    return _rebuild_gt(gt, turns, start_at)


def _rebuild_gt(gt: GroundTruth, turns: pd.DataFrame, _changed) -> GroundTruth:
    docs_src = gt.docs.set_index("conv_id")["assembled_text"].str.split("\n")
    kept = turns.groupby("conv_id")["turn_idx"].agg(["min", "max"])
    new_docs = []
    for conv, row in kept.iterrows():
        lines = docs_src[conv]
        new_docs.append((conv, "\n".join(lines[int(row["min"]) - 1 : int(row["max"])])))
    docs = pd.DataFrame(new_docs, columns=["conv_id", "assembled_text"])
    counts = (
        turns.groupby("sink", sort=True)
        .agg(n_rows=("counter", "size"), max_counter=("counter", "max"))
        .reset_index()
    )
    return GroundTruth(sink_counts=counts, docs=docs, quarantine=gt.quarantine, turns=turns)


# ---------------------------------------------------------------------------
# Cached parquet corpus for bench / driver queries
# ---------------------------------------------------------------------------

def corpus_path(tag: str, base: str = "/tmp/graft_transcripts") -> str:
    return os.path.join(base, tag, "transcripts.parquet")


def ensure_corpus(tag: str, n_convs: int, seed: int = 42,
                  base: str = "/tmp/graft_transcripts") -> str:
    """Write (once) and return the path of a deterministic transcript corpus.

    Atomic rename commit (reference K1 pattern: write .tmp then ATOMIC_MOVE,
    agent/.../DataPumpImpl.java:43-64) so concurrent callers see either
    nothing or the complete file."""
    path = corpus_path(tag, base)
    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    table, _ = generate_transcripts(n_convs=n_convs, seed=seed)
    tmp = path + f".tmp.{os.getpid()}"
    pq.write_table(table, tmp, row_group_size=64 * 1024)
    os.replace(tmp, path)
    return path


def n_convs_for_sf(sf_dir: str) -> int:
    """Map a testdata sf dir to a transcript corpus size (~lineitem scale:
    sf0.001→6k rows ≈ 700 convs? sizes avg ~8 → n_convs ≈ rows/8)."""
    name = os.path.basename(os.path.normpath(sf_dir))
    sf = float(name.replace("sf", "")) if name.startswith("sf") else 0.001
    return max(50, int(sf * 75_000))  # sf0.01 → 750 convs ≈ 60k rows
