"""Skew mitigation (SURVEY §4 skew row, §7 M6).

The reference never faces skew (a hot log file is just a longer serial
stream; the single decode thread is the bottleneck for everyone —
datadecoder/.../AppConfig.java:16-23).  At 10^12-turn scale a conversation
holding 10–30% of all rows would make one reassembly bucket a straggler, so
the engine provides:

  * ``detect_hot_sinks`` — partial per-batch counts → tiny groupby → sinks
    above a row-share threshold (run on a sample or the routing columns
    only; no full shuffle).
  * ``reassemble_skewed`` — hot sinks are SPLIT by turn-index range and each
    range is processed independently (local first-wins dedup + local
    contiguity summary); a driver-side ordered merge over the per-range
    summaries (tiny: one row per range) computes each hot sink's global
    routed window exactly, which is then applied as a broadcast filter.
    Ranges partition the turn space, so cross-range duplicates cannot
    exist and the result is row-identical to single-group reassembly —
    proven by tests/test_skew.py.

Partitioning assumption: ``range_rows`` must be ≥ the largest burst of
out-of-order delivery *within* a turn range you want dedup'd locally —
exact-duplicate rows always share a turn index, so any value is correct;
the knob only balances task sizes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data.aggregate import Sum

from .reassemble import reassemble_table


def detect_hot_sinks(ds, threshold_frac: float = 0.05) -> dict[str, int]:
    """sink → row count for sinks holding > threshold_frac of all rows.

    Pre-aggregates per batch (one row per sink per batch) so the shuffle
    moves O(#sinks), not O(#rows)."""

    def partial(t: pa.Table) -> pa.Table:
        g = t.select(["sink"]).append_column(
            "one", pa.array(np.ones(t.num_rows, dtype=np.int64))
        )
        return g.group_by("sink").aggregate([("one", "sum")]).rename_columns(
            ["sink", "n"]
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("sink")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    total = counts["n"].sum()
    hot = counts[counts["n"] > threshold_frac * total]
    return dict(zip(hot["sink"], hot["n"].astype(int)))


def _local_summarize(t: pa.Table) -> pa.Table:
    """Per (sink, range) task: first-wins dedup within the range + local
    contiguity summary columns appended to every surviving row."""
    out = reassemble_table(t)  # within-range dedup + sort + local gate
    turn = out["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = out.num_rows
    loc_min = int(turn.min()) if n else 0
    loc_max = int(turn.max()) if n else 0
    quar = out.filter(pc.equal(out["status"], "quarantined"))
    loc_first_missing = (
        int(quar["first_missing_turn"][0].as_py()) if quar.num_rows else 0
    )
    return (
        out.drop_columns(["status", "first_missing_turn"])
        .append_column("loc_min", pa.array(np.full(n, loc_min), pa.int64()))
        .append_column("loc_max", pa.array(np.full(n, loc_max), pa.int64()))
        .append_column(
            "loc_first_missing",
            pa.array(np.full(n, loc_first_missing), pa.int64()),
        )
    )


def _merge_windows(summaries: pd.DataFrame) -> dict[str, tuple[int, int]]:
    """Ordered merge of per-range summaries → sink → (min_turn, first_missing)
    routed window [min_turn, first_missing).  Exact reference semantics:
    start at the global minimum (W5), stop at the first gap (W2)."""
    windows: dict[str, tuple[int, int]] = {}
    for sink, g in summaries.sort_values(["sink", "loc_min"]).groupby("sink"):
        start = int(g.iloc[0]["loc_min"])
        expected = start
        first_missing = None
        for _, r in g.iterrows():
            if int(r["loc_min"]) != expected:
                first_missing = expected
                break
            if int(r["loc_first_missing"]):
                first_missing = int(r["loc_first_missing"])
                break
            expected = int(r["loc_max"]) + 1
        if first_missing is None:
            first_missing = expected  # no gap: window covers everything seen
        windows[sink] = (start, first_missing)
    return windows


def reassemble_skewed(ds, hot_sinks: dict[str, int], range_rows: int = 100_000,
                      num_buckets: int = 64):
    """Reassemble with hot sinks split by turn range.

    Cold sinks take the normal ``groupby(bucket)`` path.  Hot sinks are
    re-keyed to ``(sink, turn_idx // range_rows)`` sub-groups, locally
    deduped/gated, merged via per-range summaries on the driver (rows there
    = #ranges, thousands at most), and classified by a broadcast window
    filter.  Output schema matches ``reassemble_table``'s.
    """
    hot_ref = ray.put(set(hot_sinks))

    def split_flag(t: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)
        mask = pc.is_in(t["sink"], value_set=pa.array(sorted(hot), pa.string()))
        return t.append_column("is_hot", mask)

    flagged = ds.map_batches(split_flag, batch_format="pyarrow", zero_copy_batch=True)
    cold = flagged.map_batches(
        lambda t: t.filter(pc.invert(t["is_hot"])).drop_columns(["is_hot"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    hot = flagged.map_batches(
        lambda t: t.filter(t["is_hot"]).drop_columns(["is_hot"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    cold_out = cold.groupby("bucket").map_groups(
        reassemble_table, batch_format="pyarrow"
    )

    def add_range(t: pa.Table) -> pa.Table:
        rng = pc.cast(
            pc.floor(pc.divide(pc.cast(t["turn_idx"], pa.float64()), range_rows)),
            pa.int32(),
        )
        return t.append_column("turn_range", rng)

    hot_ranged = hot.map_batches(add_range, batch_format="pyarrow", zero_copy_batch=True)
    local = hot_ranged.groupby(["sink", "turn_range"]).map_groups(
        lambda t: _local_summarize(t.drop_columns(["turn_range"])),
        batch_format="pyarrow",
    )
    # summaries are tiny (one per range); pull them to the driver for the
    # ordered merge, then classify rows with a broadcast window lookup
    summaries = (
        local.map_batches(
            lambda t: t.select(["sink", "loc_min", "loc_max", "loc_first_missing"])
            .group_by(["sink", "loc_min"])
            .aggregate([("loc_max", "max"), ("loc_first_missing", "max")])
            .rename_columns(["sink", "loc_min", "loc_max", "loc_first_missing"]),
            batch_format="pyarrow",
        )
        .to_pandas()
        .drop_duplicates()
    )
    windows = _merge_windows(summaries)
    win_ref = ray.put(windows)

    def classify(t: pa.Table) -> pa.Table:
        win = ray.get(win_ref)
        # vectorized window lookup: decode per UNIQUE sink, not per row
        enc = pc.dictionary_encode(t["sink"].combine_chunks())
        codes = enc.indices.to_numpy(zero_copy_only=False)
        dict_sinks = enc.dictionary.to_pylist()
        u_start = np.array([win[s][0] for s in dict_sinks], dtype=np.int64)
        u_stop = np.array([win[s][1] for s in dict_sinks], dtype=np.int64)
        turn = t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        starts, stops = u_start[codes], u_stop[codes]
        routed = (turn >= starts) & (turn < stops)
        out = t.drop_columns(["loc_min", "loc_max", "loc_first_missing"])
        out = out.append_column(
            "status", pa.array(np.where(routed, "routed", "quarantined"))
        ).append_column(
            "first_missing_turn", pa.array(np.where(routed, 0, stops), pa.int64())
        )
        # match the cold branch's column order for union()
        order = [c for c in out.column_names if c not in
                 ("status", "first_missing_turn", "dup_dropped")]
        return out.select(order + ["status", "first_missing_turn", "dup_dropped"])

    hot_out = local.map_batches(classify, batch_format="pyarrow", zero_copy_batch=True)
    return cold_out.union(hot_out)
