"""Exact distributed quantiles via histogram refinement (graft extension).

The naive shapes both fail at scale: a per-group ``map_groups`` sort holds a
whole group's values in one task, and sketch quantiles (t-digest/KLL) are
approximate and can't be oracle-checked against ``quantile_cont``.  This is
the classic EXACT middle path, bounded memory at every step:

  pass 1: per-group (count, min, max)           — tiny partials per batch
  pass 2: per-group fixed-width histogram       — (groups × bins) partials
  pass 3: cumulative bin counts locate the bin(s) holding the target ranks;
          ONLY those bins' values are collected (≈ n/bins rows per group),
          sorted locally, and linearly interpolated at rank (n-1)·q —
          identical semantics to SQL ``quantile_cont``.

Every pass is a vectorized map_batches partial + small combine; the fetch
in pass 3 moves ~#groups × n/bins rows, never a group's full values."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def exact_group_quantiles(ds, group_col: str, value_col: str,
                          qs: list[float], bins: int = 4096,
                          round_to: int | None = 6) -> pd.DataFrame:
    """(group, q, value) exact quantiles per group (linear interpolation)."""
    # ---- pass 1: count / min / max per group -----------------------------
    def stats_part(t: pa.Table) -> pa.Table:
        return t.group_by(group_col).aggregate(
            [(value_col, "count"), (value_col, "min"), (value_col, "max")]
        ).rename_columns([group_col, "n", "mn", "mx"])

    stats = (
        ds.map_batches(stats_part, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .groupby(group_col, sort=True)
        .agg(n=("n", "sum"), mn=("mn", "min"), mx=("mx", "max"))
    )
    groups = list(stats.index)
    g_idx = {g: i for i, g in enumerate(groups)}
    mn = stats["mn"].to_numpy(dtype=np.float64)
    mx = stats["mx"].to_numpy(dtype=np.float64)
    n = stats["n"].to_numpy(dtype=np.int64)
    width = np.where(mx > mn, (mx - mn) / bins, 1.0)

    def bin_of(gi: np.ndarray, v: np.ndarray) -> np.ndarray:
        b = ((v - mn[gi]) / width[gi]).astype(np.int64)
        return np.clip(b, 0, bins - 1)

    # ---- pass 2: per-group histogram ------------------------------------
    def hist_part(t: pa.Table) -> pd.DataFrame:
        g = t[group_col].to_pandas().map(g_idx).to_numpy()
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        b = bin_of(g, v)
        key = g * bins + b
        cnt = np.bincount(key, minlength=len(groups) * bins)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"key": nz, "cnt": cnt[nz]})

    hists = (
        ds.map_batches(hist_part, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .groupby("key")["cnt"]
        .sum()
    )
    full = np.zeros(len(groups) * bins, dtype=np.int64)
    full[hists.index.to_numpy()] = hists.to_numpy()
    full = full.reshape(len(groups), bins)
    cum = np.cumsum(full, axis=1)

    # ---- locate target ranks, collect only the needed bins ---------------
    need: dict[int, set[int]] = {i: set() for i in range(len(groups))}
    targets = []  # (group_i, q, lo_rank, hi_rank, frac)
    for gi in range(len(groups)):
        for q in qs:
            r = (n[gi] - 1) * q
            lo, hi = int(np.floor(r)), int(np.ceil(r))
            for rank in (lo, hi):
                b = int(np.searchsorted(cum[gi], rank + 1))
                need[gi].add(min(b, bins - 1))
            targets.append((gi, q, lo, hi, r - lo))

    need_keys = np.array(
        sorted(gi * bins + b for gi, bs in need.items() for b in bs),
        dtype=np.int64,
    )

    def fetch_part(t: pa.Table) -> pd.DataFrame:
        g = t[group_col].to_pandas().map(g_idx).to_numpy()
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        key = g * bins + bin_of(g, v)
        keep = np.isin(key, need_keys)
        return pd.DataFrame({"g": g[keep], "b": key[keep] % bins, "v": v[keep]})

    picked = ds.map_batches(
        fetch_part, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()

    rows = []
    for gi, q, lo, hi, frac in targets:
        def value_at(rank: int) -> float:
            b = int(np.searchsorted(cum[gi], rank + 1))
            b = min(b, bins - 1)
            before = int(cum[gi][b - 1]) if b else 0
            vals = np.sort(
                picked[(picked["g"] == gi) & (picked["b"] == b)]["v"].to_numpy()
            )
            return float(vals[rank - before])

        vlo = value_at(lo)
        v = vlo if hi == lo else vlo + (value_at(hi) - vlo) * frac
        rows.append((groups[gi], q, round(v, round_to) if round_to else v))
    return pd.DataFrame(rows, columns=[group_col, "q", "value"])
