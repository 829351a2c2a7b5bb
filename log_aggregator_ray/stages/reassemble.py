"""Ordered reassembly: sort + first-wins dedup + contiguity gate + quarantine
(SURVEY §2.6 A3, §2.7 O1, §2.8 D1/D2, §2.10 W2/W3/W5).

Reference semantics being reproduced (datadecoder/.../DataPumpDecoderSort.java
:142-181):
  * order within key by seq (PBLogFileComparator.java:13-27)           → sort
  * duplicate (id,session,seq) → keep first, skip re-delivery (:175-177) → dedup
  * emit strictly contiguous prefix; hold at gaps (:156-178)           → gate
  * no prior state → start at the lowest available seq (:167-174)      → W5
  * held rows are never silently dropped (datadecoder README discussion) →
    explicit ``quarantined`` status with ``first_missing_turn`` metadata.

Physical shape: ONE hash shuffle on the coarse ``bucket`` column (added by
stages.route), then a fully vectorized pandas/numpy kernel per bucket that
processes *all* sinks in the bucket at once — no per-conversation Python
call, no global sort.  Order is restored per key, never relied on globally
(blocks complete out of order; SURVEY §7 "Ordering vs parallelism").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _reassemble_kernel(codes: np.ndarray, turn: np.ndarray):
    """Pure-numpy core shared by the pandas and Arrow paths.

    ``codes``: int codes of the sink, ordered so that code order ==
    lexicographic sink order; ``turn``: int64 turn indices.  Returns
    (sel, routed, first_missing, dup_dropped) where ``sel`` indexes the
    ORIGINAL rows, sorted (sink, turn_idx), duplicates removed first-wins.
    """
    order = np.lexsort((turn, codes))
    c, t = codes[order], turn[order]
    n = len(c)
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, np.zeros(0, dtype=bool), z, z

    same_prev = np.zeros(n, dtype=bool)
    same_prev[1:] = (c[1:] == c[:-1]) & (t[1:] == t[:-1])
    kept_idx = np.flatnonzero(~same_prev)
    dup_dropped = np.diff(np.append(kept_idx, n)) - 1
    c, t = c[kept_idx], t[kept_idx]
    m = len(c)

    new_grp = np.zeros(m, dtype=bool)
    new_grp[0] = True
    new_grp[1:] = c[1:] != c[:-1]
    grp_id = np.cumsum(new_grp) - 1
    start_idx = np.flatnonzero(new_grp)

    pos = np.arange(m) - start_idx[grp_id]
    first = t[start_idx][grp_id]
    expected = first + pos
    contig = t == expected

    brk = (~contig).astype(np.int64)
    cum_brk = np.cumsum(brk)
    brk_before_group = np.where(start_idx[grp_id] > 0, cum_brk[start_idx[grp_id] - 1], 0)
    breaks_so_far = cum_brk - brk_before_group
    routed = breaks_so_far == 0

    first_break = brk & (breaks_so_far == 1)
    fm_per_grp = np.zeros(start_idx.size, dtype=np.int64)
    fb_rows = np.flatnonzero(first_break == 1)
    fm_per_grp[grp_id[fb_rows]] = expected[fb_rows]
    first_missing = np.where(routed, 0, fm_per_grp[grp_id])

    return order[kept_idx], routed, first_missing, dup_dropped


def _lex_codes(sink: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Integer codes for the sink column whose order matches lexicographic
    string order.  dictionary_encode gives first-appearance codes; re-rank
    the (small) dictionary so code comparisons == string comparisons.
    Strings never become Python objects for the big column."""
    if isinstance(sink, pa.ChunkedArray):
        enc = pc.dictionary_encode(sink.combine_chunks())
    else:
        enc = pc.dictionary_encode(sink)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    dict_sorted_rank = np.empty(len(enc.dictionary), dtype=np.int64)
    dict_sorted_rank[
        pc.sort_indices(enc.dictionary).to_numpy(zero_copy_only=False)
    ] = np.arange(len(enc.dictionary))
    return dict_sorted_rank[codes]


def reassemble_table(t: pa.Table) -> pa.Table:
    """Arrow-native reassembly (the hot path): dictionary-encode + lexsort +
    one ``take`` — no per-row Python, no pandas object conversion."""
    codes = _lex_codes(t["sink"])
    turn = t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
    sel, routed, first_missing, dup_dropped = _reassemble_kernel(codes, turn)
    out = t.take(pa.array(sel))
    status = pc.cast(
        pa.DictionaryArray.from_arrays(
            pa.array(np.where(routed, 1, 0), pa.int32()),
            pa.array(["quarantined", "routed"]),
        ),
        pa.string(),
    )
    return (
        out.append_column("status", status)
        .append_column("first_missing_turn", pa.array(first_missing, pa.int64()))
        .append_column("dup_dropped", pa.array(dup_dropped, pa.int64()))
    )


def reassemble_pdf(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized reassembly of every sink contained in ``df``.

    Input must carry ``sink`` and ``turn_idx``.  Returns the same columns plus
      status             "routed" | "quarantined"
      first_missing_turn int64, the gap position for quarantined rows, else 0
      dup_dropped        int64, count of exact (sink, turn_idx) duplicates
                         dropped from this row's slot (first kept)
    Rows are ordered (sink, turn_idx) — the stable per-key output ordering.
    """
    if len(df) == 0:
        out = df.copy()
        out["status"] = pd.Series([], dtype=object)
        out["first_missing_turn"] = pd.Series([], dtype=np.int64)
        out["dup_dropped"] = pd.Series([], dtype=np.int64)
        return out

    codes = np.unique(df["sink"].to_numpy(), return_inverse=True)[1]
    turn = df["turn_idx"].to_numpy().astype(np.int64)
    sel, routed, first_missing, dup_dropped = _reassemble_kernel(codes, turn)
    out = df.iloc[sel].reset_index(drop=True)
    out["status"] = np.where(routed, "routed", "quarantined")
    out["first_missing_turn"] = first_missing
    out["dup_dropped"] = dup_dropped
    return out


def apply_reassemble(ds):
    """groupby(bucket) shuffle + per-bucket Arrow-native reassembly.

    Requires ``sink`` and ``bucket`` columns (stages.route); ``bucket`` is
    kept in the output so downstream per-bucket stages (doc assembly, sinks)
    reuse the partitioning.  This is the pipeline's single wide exchange;
    skew note — a pathologically hot sink still lands in one bucket; see
    stages.skew for pre-shuffle salting of the stateless stages and bucket
    splitting."""
    return ds.groupby("bucket").map_groups(reassemble_table, batch_format="pyarrow")
