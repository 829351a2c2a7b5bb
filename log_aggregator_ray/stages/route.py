"""Routing-key projection + hash bucketing (SURVEY §2.3 M7, §4 sharding).

The reference routes each chunk to one sink file named ``{id}.{session}``
(datadecoder/.../DataPumpDecoderSort.java:93-97).  Here a ``sink`` column is
derived vectorized, and a deterministic ``bucket`` column (stable 64-bit hash
of the sink, mod B) gives the explicit hash partitioning the pipeline shuffles
on — ONE partitioning key reused by reassembly, doc assembly and the
partitioned sink writes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def sink_expr(batch: pa.Table) -> pa.Array:
    """sink = conv_id, or "{conv_id}.{session}" when a session column exists
    (reference session epochs, README.md:177-180)."""
    if "session" in batch.column_names:
        return pc.binary_join_element_wise(
            batch["conv_id"], pc.cast(batch["session"], pa.string()), "."
        )
    return batch["conv_id"].combine_chunks() if isinstance(
        batch["conv_id"], pa.ChunkedArray
    ) else batch["conv_id"]


def event_sink_expr(batch: pa.Table) -> pa.Array:
    """Alternative router: fan out by parsed event_type (categorical sinks,
    the status-enum analog M8)."""
    return batch["event_type"]


def _hash_kernel_id() -> str:
    """Identity string of the hash kernel, persisted in resume manifests:
    bucket layout is a function of this kernel, so a resume under a
    DIFFERENT kernel (polars upgrade — its hash is not stable across
    versions — or a future kernel swap) must invalidate committed
    partitions instead of silently mis-skipping them."""
    import polars as pl

    return f"polars-xxh64-s0-{pl.__version__}"


HASH_KERNEL = _hash_kernel_id()


def stable_hash(values) -> np.ndarray:
    """Deterministic cross-process 64-bit hash of a string or integer
    column — NOT Python hash(), which is salted per process.

    Kernel: polars' vectorized xxhash64 (seed 0) straight over the Arrow
    buffers — zero Python objects (VERDICT r3 #6: the previous
    ``pd.util.hash_array`` built an object array of every routing key per
    batch in the highest-row-count stage; measured 7× slower on strings,
    100× on ints).  Accepts a pyarrow Array/ChunkedArray (preferred —
    zero-copy), or any numpy array / sequence; all representations of the
    same values hash identically (pl.from_arrow and pl.Series agree).
    Like ``content_hash128_fast``, a missing polars RAISES rather than
    falling back — mixed kernels within one run would corrupt every
    hash-partitioned exchange."""
    import polars as pl

    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array):
        s = pl.from_arrow(values)
    else:
        arr = np.asarray(values)
        s = pl.Series("", arr.tolist() if arr.dtype == object else arr)
    return s.hash(seed=0).to_numpy().astype(np.uint64, copy=False)


def add_bucket_column(batch: pa.Table, num_buckets: int = 64,
                      router=sink_expr,
                      hot_hashes: np.ndarray | None = None) -> pa.Table:
    """Table-level form of ``add_bucket``: append ONLY the ``bucket``
    column (hash of the routing key).  ``hot_hashes`` must already be a
    sorted uint64 array (or None)."""
    hot = hot_hashes if hot_hashes is not None and len(hot_hashes) else None
    sink = router(batch)
    if not isinstance(sink, (pa.Array, pa.ChunkedArray)):
        sink = pa.array(sink)
    h = stable_hash(sink)  # straight off the Arrow buffers, zero objects
    bucket = (h % num_buckets).astype(np.int32)
    if hot is not None:
        idx = np.searchsorted(hot, h)
        idx_c = np.minimum(idx, len(hot) - 1)
        is_hot = hot[idx_c] == h
        bucket = np.where(
            is_hot, (num_buckets + idx_c).astype(np.int32), bucket
        )
    return batch.append_column("bucket", pa.array(bucket, pa.int32()))


def add_bucket(ds, num_buckets: int = 64, router=sink_expr,
               hot_hashes: np.ndarray | None = None):
    """Append ONLY the ``bucket`` column (hash of the routing key) — the
    narrow-exchange variant: the ``sink`` string itself is recomputed from
    the raw columns post-exchange (flagship phase 2), so the shuffle never
    ships a derived string column it doesn't need.

    ``hot_hashes`` (sorted uint64 array of sink hashes): pathologically hot
    sinks are routed to their own pseudo-bucket ``num_buckets + i`` instead
    of a hash bucket, so one giant key never drags a bucket's-worth of
    normal sinks into its straggler task (flagship hot-sink path)."""
    hot = np.sort(np.asarray(hot_hashes, dtype=np.uint64)) if (
        hot_hashes is not None and len(hot_hashes)
    ) else None

    def _add(batch: pa.Table) -> pa.Table:
        return add_bucket_column(batch, num_buckets, router, hot)

    return ds.map_batches(_add, batch_format="pyarrow", zero_copy_batch=True)


def add_sink_column(batch: pa.Table, router=sink_expr) -> pa.Table:
    """Materialize the ``sink`` routing key on a raw table (phase-2 side of
    the narrow exchange)."""
    sink = router(batch)
    if not isinstance(sink, (pa.Array, pa.ChunkedArray)):
        sink = pa.array(sink)
    return batch.append_column("sink", sink)


def add_sink_and_bucket(ds, num_buckets: int = 64, router=sink_expr):
    """Append ``sink`` and ``bucket`` columns.  ``bucket`` is the shuffle key:
    B coarse partitions so `groupby(bucket).map_groups` processes thousands of
    sinks per group with vectorized pandas instead of one Python call per
    conversation (per-group overhead matters at 10^12 turns)."""

    def _add(batch: pa.Table) -> pa.Table:
        sink = router(batch)
        if not isinstance(sink, (pa.Array, pa.ChunkedArray)):
            sink = pa.array(sink)
        bucket = (stable_hash(sink) % num_buckets).astype(np.int32)
        return batch.append_column("sink", sink).append_column(
            "bucket", pa.array(bucket, pa.int32())
        )

    return ds.map_batches(_add, batch_format="pyarrow", zero_copy_batch=True)
