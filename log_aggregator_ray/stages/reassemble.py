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

    df = df.sort_values(["sink", "turn_idx"], kind="mergesort").reset_index(drop=True)
    sink = df["sink"].to_numpy()
    t = df["turn_idx"].to_numpy().astype(np.int64)
    n = len(df)

    # first-wins dedup on (sink, turn_idx) — D1/D2
    same_as_prev = np.zeros(n, dtype=bool)
    same_as_prev[1:] = (sink[1:] == sink[:-1]) & (t[1:] == t[:-1])
    keep = ~same_as_prev
    # per kept row, how many following duplicates were collapsed into it
    kept_idx = np.flatnonzero(keep)
    dup_counts = np.diff(np.append(kept_idx, n)) - 1

    df = df.iloc[kept_idx].reset_index(drop=True)
    sink = sink[kept_idx]
    t = t[kept_idx]
    n = len(df)

    # group boundaries after dedup
    new_grp = np.zeros(n, dtype=bool)
    new_grp[0] = True
    new_grp[1:] = sink[1:] != sink[:-1]
    grp_id = np.cumsum(new_grp) - 1
    start_idx = np.flatnonzero(new_grp)

    # expected turn under contiguity from the group's min (W5 mid-stream init)
    pos = np.arange(n) - start_idx[grp_id]
    first = t[start_idx][grp_id]
    expected = first + pos
    contig = t == expected

    # routed = no contiguity break at or before this row within its group
    brk = (~contig).astype(np.int64)
    cum_brk = np.cumsum(brk)
    brk_before_group = np.where(start_idx[grp_id] > 0, cum_brk[start_idx[grp_id] - 1], 0)
    breaks_so_far = cum_brk - brk_before_group
    routed = breaks_so_far == 0

    # first missing turn per group = expected value at the group's first break
    first_break = brk & (breaks_so_far == 1)
    fm_per_grp = np.zeros(start_idx.size, dtype=np.int64)
    fb_rows = np.flatnonzero(first_break == 1)
    fm_per_grp[grp_id[fb_rows]] = expected[fb_rows]
    first_missing = np.where(routed, 0, fm_per_grp[grp_id])

    df["status"] = np.where(routed, "routed", "quarantined")
    df["first_missing_turn"] = first_missing
    df["dup_dropped"] = dup_counts
    return df


def apply_reassemble(ds, batch_format: str = "pandas"):
    """groupby(bucket) shuffle + per-bucket vectorized reassembly.

    Requires ``sink`` and ``bucket`` columns (stages.route).  This is the
    pipeline's single wide exchange; skew note — a pathologically hot sink
    still lands in one bucket; see stages.skew for pre-shuffle salting of the
    stateless stages and bucket splitting."""
    return ds.groupby("bucket").map_groups(reassemble_pdf, batch_format=batch_format)
