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


_WD_NAMES = np.array([f"{w} " for w in "Mon Tue Wed Thu Fri Sat Sun".split()])
_MON_NAMES = np.array(
    [f"{m} " for m in "Jan Feb Mar Apr May Jun Jul Aug Sep Oct Nov Dec".split()]
)
_DAY2 = np.array([f"{i:02d}, " for i in range(32)])
_HH2 = np.array([f"{i:02d}:" for i in range(24)])
_MM2 = np.array([f"{i:02d}:" for i in range(60)])
_SS2 = np.array([f"{i:02d}." for i in range(60)])
_MS3 = np.array([f"{i:03d} " for i in range(1000)])


def _dict_str(indices: np.ndarray, lookup) -> pa.Array:
    """Low-cardinality string column as a DictionaryArray cast to string —
    one C++ take instead of per-row numpy U-dtype work (np.char costs ~6 s
    per op at 20M rows)."""
    import pyarrow.compute as pc

    d = pa.DictionaryArray.from_arrays(
        pa.array(indices.astype(np.int32), pa.int32()), pa.array(list(lookup))
    )
    return pc.cast(d, pa.string())


def _date_prefix_components(ts_us: np.ndarray) -> list:
    """Vectorized logGen-style date prefix 'Www Mmm dd, yyyy HH:MM:SS.mmm '
    as pyarrow string arrays — no strftime (which costs minutes at 10^6+
    rows), pure integer math + dictionary lookups."""
    days = ts_us // 86_400_000_000
    d64 = days.astype("datetime64[D]")
    m64 = d64.astype("datetime64[M]")
    year = m64.astype("datetime64[Y]").astype(np.int64) + 1970
    month = m64.astype(np.int64) % 12
    day = (d64 - m64.astype("datetime64[D]")).astype(np.int64) + 1
    wd = (days + 3) % 7  # 1970-01-01 was a Thursday
    secs = (ts_us // 1_000_000) % 86400
    y_min, y_max = int(year.min()), int(year.max())
    year_lut = [f"{y} " for y in range(y_min, y_max + 1)]
    comps = [
        _dict_str(wd, _WD_NAMES),
        _dict_str(month, _MON_NAMES),
        _dict_str(day, _DAY2),
        _dict_str(year - y_min, year_lut),
        _dict_str(secs // 3600, _HH2),
        _dict_str((secs // 60) % 60, _MM2),
        _dict_str(secs % 60, _SS2),
        _dict_str((ts_us // 1000) % 1000, _MS3),
    ]
    return comps


def generate_transcripts(
    n_convs: int = 200,
    seed: int = 42,
    hot_frac: float = 0.10,
    with_session: bool = False,
    compute_gt: bool = True,
) -> tuple[pa.Table, GroundTruth | None]:
    """Generate the base (clean) transcript table plus ground truth.

    Returned table follows TRANSCRIPT_SCHEMA (+ ``session`` int64 when
    ``with_session``), rows deterministically shuffled.  ``compute_gt=False``
    skips the (comparatively slow) ground-truth assembly for large bench
    corpora.
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
    # user & system → msg.  Everything integer-coded; strings are dictionary
    # lookups at materialization time.
    v = rng.random(n)
    _EVENTS = np.array(["msg", "tool_call", "tool_result", "error"])
    ecode = np.zeros(n, dtype=np.int64)
    ecode[role_idx == 3] = 2  # tool role → tool_result
    is_asst = role_idx == 1
    ecode[is_asst & (v < 0.15)] = 1
    ecode[is_asst & (v >= 0.15) & (v < 0.20)] = 3
    event = _EVENTS[ecode]  # small U array view, used for GT only
    err_num = rng.integers(0, 1000, n)
    _ERR_LUT = [""] + [f"ERR-{i:03d}" for i in range(1000)]
    _ERRSP_LUT = [""] + [f" ERR-{i:03d}" for i in range(1000)]
    err_idx = np.where(ecode == 3, err_num + 1, 0)

    # tool column: non-empty iff event in {tool_call, tool_result};
    # cardinality 12×8×3 (+empty) → one dictionary
    tn_i = rng.integers(0, len(_TOOL_NAMES), n)
    sl_i = rng.integers(0, len(_CMD_SLUGS), n)
    exit_code = rng.integers(0, 3, n)
    has_tool = (ecode == 1) | (ecode == 2)
    _TOOL_LUT = [""] + [
        f"tool={t} cmd={s} exit={e}"
        for t in _TOOL_NAMES for s in _CMD_SLUGS for e in range(3)
    ]
    tool_idx = np.where(
        has_tool, tn_i * (len(_CMD_SLUGS) * 3) + sl_i * 3 + exit_code + 1, 0
    )

    # timestamps: conv start deterministic, + cumsum of jittered 1–5 s steps
    conv_start = _BASE_EPOCH_US + np.arange(n_convs, dtype=np.int64) * 37_000_000
    steps = rng.integers(1_000_000, 5_000_000, n)
    cum = np.cumsum(steps)
    offs = cum - cum[starts[conv_ord]] + steps[starts[conv_ord]]
    ts_us = conv_start[conv_ord] + offs

    # text: "{Www Mmm dd, yyyy HH:MM:SS.mmm} event=<type>[ ERR-nnn] <phrase> <counter>"
    # assembled with ONE pyarrow element-wise join — strftime/object concat
    # cost minutes at 10^6+ rows
    import pyarrow.compute as pc

    ph_i = rng.integers(0, len(_PHRASES), n)
    counter_str = pc.cast(pa.array(turn_idx.astype(np.int64)), pa.string())
    comps = _date_prefix_components(ts_us) + [
        _dict_str(ecode, [f"event={e}" for e in _EVENTS]),
        _dict_str(err_idx, _ERRSP_LUT),
        _dict_str(ph_i, [f" {p} " for p in _PHRASES]),
        counter_str,
    ]
    text_pa = pc.binary_join_element_wise(*comps, "")

    fields = list(TRANSCRIPT_SCHEMA)
    arrays = [
        _dict_str(conv_ord, conv_names),
        pa.array(turn_idx, pa.int32()),
        _dict_str(role_idx, _ROLES),
        text_pa,
        _dict_str(tool_idx, _TOOL_LUT),
        pa.array(ts_us, pa.timestamp("us")),
    ]
    session = None
    if with_session:
        # session epochs (reference W4: agent restart ⇒ new session ⇒ new
        # sink file, turn_idx restarts at 1 — README.md:177-180).  ~10% of
        # convs (size ≥ 6) split mid-stream into a second session one hour
        # later.
        base_sess = _BASE_EPOCH_US // 1_000_000
        split_at = np.zeros(n_convs, dtype=np.int64)
        eligible = np.flatnonzero(sizes >= 6)
        n_split = max(1, len(eligible) // 10)
        chosen = rng.choice(eligible, size=min(n_split, len(eligible)), replace=False)
        split_at[chosen] = sizes[chosen] // 2
        row_split = split_at[conv_ord]
        second = (row_split > 0) & (turn_idx.astype(np.int64) > row_split)
        session = np.where(second, base_sess + 3600, base_sess)
        turn_idx = np.where(
            second, turn_idx.astype(np.int64) - row_split, turn_idx
        ).astype(np.int32)
        arrays[1] = pa.array(turn_idx, pa.int32())
        # rebuild counter suffix of text to keep counter == turn_idx
        comps[-1] = pc.cast(pa.array(turn_idx.astype(np.int64)), pa.string())
        arrays[3] = pc.binary_join_element_wise(*comps, "")
        fields = fields + [pa.field("session", pa.int64())]
        arrays.append(pa.array(session, pa.int64()))
    table = pa.Table.from_arrays(arrays, schema=pa.schema(fields))

    gt = None
    if compute_gt:
        text = arrays[3].to_numpy(zero_copy_only=False)  # post-session rebuild
        if with_session:
            sink = np.char.add(
                np.char.add(conv_id.astype("U20"), "."),
                session.astype("U12"),
            ).astype(object)
        else:
            sink = conv_id
        gt_turns = pd.DataFrame(
            {
                "conv_id": conv_id,
                "turn_idx": turn_idx,
                "event_type": event,
                "error_code": np.array(_ERR_LUT, dtype=object)[err_idx],
                "counter": turn_idx.astype(np.int64),
                "tool_name": np.where(has_tool, _TOOL_NAMES[tn_i], ""),
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
        gt = GroundTruth(
            sink_counts=gt_counts, docs=gt_docs,
            quarantine=pd.DataFrame(columns=["conv_id", "first_missing_turn"]),
            turns=gt_turns,
        )

    # deterministic on-disk shuffle (order restoration is under test)
    perm = np.random.default_rng(seed + 1).permutation(n)
    table = table.take(pa.array(perm))
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


def _conv_stats_arrow(table: pa.Table):
    """(codes, turn, conv_names, per-code min/max/count) without pandas —
    the object-string conversion of a 20M-row table costs minutes."""
    import pyarrow.compute as pc

    enc = pc.dictionary_encode(table["conv_id"].combine_chunks())
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    turn = table["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
    k = len(enc.dictionary)
    mins = np.full(k, np.iinfo(np.int64).max)
    maxs = np.zeros(k, dtype=np.int64)
    np.minimum.at(mins, codes, turn)
    np.maximum.at(maxs, codes, turn)
    counts = np.bincount(codes, minlength=k)
    return codes, turn, enc.dictionary, mins, maxs, counts


def _gaps_arrow(table: pa.Table, frac_convs: float, seed: int) -> pa.Table:
    rng = np.random.default_rng(seed + 3)
    codes, turn, names, mins, maxs, counts = _conv_stats_arrow(table)
    eligible = np.flatnonzero((maxs >= 4) & (mins == 1))
    k = max(1, int(len(names) * frac_convs))
    chosen = rng.choice(eligible, size=min(k, len(eligible)), replace=False)
    drop = np.full(len(names), -1, dtype=np.int64)
    for c in chosen:
        drop[c] = rng.integers(2, maxs[c])
    keep = turn != drop[codes]
    return table.filter(pa.array(keep))


def _midstream_arrow(table: pa.Table, frac_convs: float, seed: int) -> pa.Table:
    rng = np.random.default_rng(seed + 4)
    codes, turn, names, mins, maxs, counts = _conv_stats_arrow(table)
    no_gap = (maxs - mins + 1) == counts
    eligible = np.flatnonzero((maxs >= 4) & no_gap)
    k = max(1, int(len(names) * frac_convs))
    chosen = rng.choice(eligible, size=min(k, len(eligible)), replace=False)
    start = np.full(len(names), -1, dtype=np.int64)
    for c in chosen:
        start[c] = rng.integers(2, maxs[c])
    keep = turn >= start[codes]
    return table.filter(pa.array(keep))


def with_gaps(table: pa.Table, gt: GroundTruth | None, frac_convs: float = 0.05,
              seed: int = 42) -> tuple[pa.Table, GroundTruth | None]:
    """Delete one interior turn in ``frac_convs`` of conversations (size≥4).

    Post-gap rows must be quarantined by the contiguity gate; ground truth
    docs/counts are truncated at the gap and ``quarantine`` records
    (conv_id, first_missing_turn).  ``gt=None`` skips GT bookkeeping (large
    bench corpora)."""
    if gt is None:
        return _gaps_arrow(table, frac_convs, seed), None
    rng = np.random.default_rng(seed + 3)
    df = table.to_pandas()
    stats = df.groupby("conv_id")["turn_idx"].agg(["min", "max"])
    sizes = stats["max"]
    # composable: skip convs already perturbed (mid-stream starts)
    eligible = stats[(stats["max"] >= 4) & (stats["min"] == 1)].index.to_numpy()
    k = max(1, int(len(sizes) * frac_convs))
    chosen = rng.choice(eligible, size=min(k, len(eligible)), replace=False)
    drop_turn = {
        c: int(rng.integers(2, sizes[c])) for c in chosen
    }  # interior: 2..max-1

    target = df["conv_id"].map(drop_turn)
    mask = ~(target.notna() & (df["turn_idx"] == target))
    out_df = df[mask.to_numpy()].reset_index(drop=True)

    if gt is None:
        return _to_arrow(out_df, "session" in df.columns), None

    quar = pd.DataFrame(
        {"conv_id": list(drop_turn), "first_missing_turn": list(drop_turn.values())}
    ).sort_values("conv_id").reset_index(drop=True)

    gt2 = _truncate_gt(gt, drop_turn)
    gt2.quarantine = quar
    return _to_arrow(out_df, "session" in df.columns), gt2


def with_midstream(table: pa.Table, gt: GroundTruth | None,
                   frac_convs: float = 0.05,
                   seed: int = 42) -> tuple[pa.Table, GroundTruth | None]:
    """Drop turns < k for ``frac_convs`` of convs (start mid-stream).

    Reference mid-stream init rule (DataPumpDecoderSort.java:167-174): with
    no prior state, reassembly starts at min(turn_idx).  Ground-truth docs
    lose the dropped prefix; counts lose the dropped rows (max_counter
    unchanged)."""
    if gt is None:
        return _midstream_arrow(table, frac_convs, seed), None
    rng = np.random.default_rng(seed + 4)
    df = table.to_pandas()
    stats = df.groupby("conv_id")["turn_idx"].agg(["min", "max", "count"])
    sizes = stats["max"]
    # composable: skip convs already gap-perturbed (their GT is truncated);
    # without GT, gap convs are detectable as max-min+1 != count
    if gt is not None and gt.quarantine is not None:
        gap_convs = set(gt.quarantine["conv_id"])
    else:
        gap_convs = set(
            stats[(stats["max"] - stats["min"] + 1) != stats["count"]].index
        )
    ok = (sizes >= 4) & (~sizes.index.isin(gap_convs))
    eligible = sizes.index[ok].to_numpy()
    k = max(1, int(len(sizes) * frac_convs))
    chosen = rng.choice(eligible, size=min(k, len(eligible)), replace=False)
    start_at = {c: int(rng.integers(2, sizes[c])) for c in chosen}

    target = df["conv_id"].map(start_at)
    mask = ~(target.notna() & (df["turn_idx"] < target))
    out_df = df[mask.to_numpy()].reset_index(drop=True)

    if gt is None:
        return _to_arrow(out_df, "session" in df.columns), None

    gt2 = _drop_prefix_gt(gt, start_at)
    return _to_arrow(out_df, "session" in df.columns), gt2


def _truncate_gt(gt: GroundTruth, drop_turn: dict[str, int]) -> GroundTruth:
    target = gt.turns["conv_id"].map(drop_turn)
    keep = ~(target.notna() & (gt.turns["turn_idx"] >= target))
    turns = gt.turns[keep.to_numpy()].reset_index(drop=True)
    return _rebuild_gt(gt, turns, drop_turn)


def _drop_prefix_gt(gt: GroundTruth, start_at: dict[str, int]) -> GroundTruth:
    target = gt.turns["conv_id"].map(start_at)
    keep = ~(target.notna() & (gt.turns["turn_idx"] < target))
    turns = gt.turns[keep.to_numpy()].reset_index(drop=True)
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
    """Corpora are DIRECTORIES of part files: a single big parquet file
    reads as one serial Ray task (measured: 6.5 s of dead time at sf0.1×4),
    while a sharded layout reads one task per file — and is what any real
    large corpus looks like."""
    return os.path.join(base, tag)


def write_corpus_dir(table: pa.Table, path: str) -> str:
    """Shard ``table`` into ~100k-row part files and commit the directory by
    atomic rename (reference K1 pattern: write .tmp then ATOMIC_MOVE,
    agent/.../DataPumpImpl.java:43-64)."""
    n = table.num_rows
    n_parts = int(min(128, max(8, n // 100_000)))
    tmp = f"{path}.tmp-{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    step = (n + n_parts - 1) // n_parts
    for i in range(n_parts):
        part = table.slice(i * step, step)
        if part.num_rows:
            pq.write_table(part, os.path.join(tmp, f"part-{i:05d}.parquet"))
    try:
        os.rename(tmp, path)
    except OSError:
        # lost the race to a concurrent generator — theirs is equivalent
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return path


def ensure_corpus(tag: str, n_convs: int, seed: int = 42,
                  base: str = "/tmp/graft_transcripts") -> str:
    """Write (once) and return the directory of a deterministic corpus."""
    path = corpus_path(tag, base)
    if os.path.isdir(path):
        return path
    os.makedirs(base, exist_ok=True)
    table, _ = generate_transcripts(n_convs=n_convs, seed=seed, compute_gt=False)
    return write_corpus_dir(table, path)


def n_convs_for_sf(sf_dir: str) -> int:
    """Map a testdata sf dir to a transcript corpus size.  Zipf(1.2) clipped
    [2,500] averages ~170 turns/conv, so sf0.01 → 3k convs ≈ 540k turns and
    sf0.1 → 30k convs ≈ 5.4M turns.  Bench sizing note: below ~2M turns the
    whole pipeline finishes in <4 s on 32 CPUs and per-run fixed costs
    (~2.4 s: session, actor spawn, exchange barriers) dominate any scaling
    measurement."""
    name = os.path.basename(os.path.normpath(sf_dir))
    sf = float(name.replace("sf", "")) if name.startswith("sf") else 0.001
    return max(100, int(sf * 300_000))
