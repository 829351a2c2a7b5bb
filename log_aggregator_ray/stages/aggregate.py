"""Aggregates over routed rows (SURVEY §2.6).

A2 — per-sink ``count(*)`` and ``max(counter)``: the reference's logCheck
invariant (src/test/logCheck:6-14: WC == LAST, DELTA = 0).  Implemented as
partial-per-batch aggregation (one row per sink per batch, pyarrow group_by)
followed by a tiny final ``groupby("sink")`` — the combiner shape of
PBLogFileCollector.java:75-106, and the pre-aggregate-before-shuffle rule at
scale: the wide exchange moves O(#sinks) rows, not O(#turns).

Doc assembly — per-sink in-order text concatenation: the ``diff source vs
reconstructed`` analog (reference README.md:93-105).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Max, Sum


def routed_only(ds):
    return ds.map_batches(
        lambda t: t.filter(pa.compute.equal(t["status"], "routed")),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _partial_counts(batch: pa.Table) -> pa.Table:
    g = batch.group_by("sink").aggregate([("counter", "count"), ("counter", "max")])
    return g.rename_columns(["sink", "n_rows", "max_counter"])


def sink_counts(ds):
    """(sink, n_rows, max_counter) over routed rows; small result."""
    partial = ds.map_batches(
        _partial_counts, batch_format="pyarrow", zero_copy_batch=True
    )
    return partial.groupby("sink").aggregate(
        Sum("n_rows", alias_name="n_rows"),
        Max("max_counter", alias_name="max_counter"),
    )


def _assemble_pdf(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(["sink", "turn_idx"], kind="mergesort")
    out = (
        df.groupby("sink", sort=True)
        .agg(conv_id=("conv_id", "first"), assembled_text=("text", "\n".join))
        .reset_index()
    )
    return out


def assemble_docs(ds):
    """Per-sink ordered concatenation of routed text → one doc row per sink.

    Reuses the existing ``bucket`` partitioning: rows for a sink are
    co-located after reassembly, so this groupby moves already-grouped blocks
    only (same key as the first shuffle)."""
    routed = routed_only(ds)
    return routed.groupby("bucket").map_groups(_assemble_pdf, batch_format="pandas")
