"""The flagship pipeline: parse → enrich → route → reassemble → sinks +
aggregates, checkpoint-resumable (SURVEY §3.4, §7 M4/M5).

Physical plan (one wide exchange, everything else streams):

    read_parquet(corpus)                       # pruned source
      → map_batches(add sink+bucket)           # cheap routing key first
      → map_batches(filter committed buckets)  # resume anti-join (J1)
      → map_batches(parse_batch)               # stateless vectorized regex
      → map_batches(Enricher, actor pool)      # broadcast dict lookups
      → groupby(bucket).map_groups(BucketWriter)   # shuffle #1 and only
            reassemble (order/dedup/gate/quarantine)
            write routed / quarantine / docs / sink_counts parquet
            commit bucket manifest (atomic rename)
            emit one metrics row
      → metrics dataset (tiny) → run report

Per-sink fan-out is realized as bucket-partitioned parquet with rows sorted
by (sink, turn_idx) inside each file — the reference's one-file-per-
(id,session) (DataPumpDecoderSort.java:93-97) without creating millions of
tiny files; any single sink is one contiguous row range in exactly one
bucket file.  Aggregates are computed inside the already-grouped bucket —
no second shuffle (the PBLogFileCollector combiner shape, §2.6 A3).
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sources.readers import read_transcripts
from ..stages.enrich import apply_enrich
from ..stages.parse import apply_parse
from ..stages.aggregate import assemble_docs_table
from ..stages.reassemble import reassemble_table
from ..stages.route import add_sink_and_bucket
from ..state import manifest as mf

ROUTED_COLS = [
    "sink", "conv_id", "turn_idx", "role", "text", "tool", "ts",
    "event_type", "error_code", "counter", "tool_name", "tool_cmd", "tool_exit",
    "role_class", "role_priority", "tool_family", "tool_risk",
]


def make_skip_committed(committed: set[int]):
    """Resume filter: drop rows whose bucket already has a manifest —
    broadcast small-side anti-join (SURVEY §2.5 J1).  The committed array is
    captured in the task closure (tiny: ≤ num_buckets ints) so no actor is
    needed and the filter runs at full task parallelism."""
    arr = np.array(sorted(committed), dtype=np.int64)

    def skip(batch: pa.Table) -> pa.Table:
        b = batch["bucket"].to_numpy()
        return batch.filter(pa.array(~np.isin(b, arr)))

    return skip


def _write_part(table: pa.Table, out_dir: str, kind: str, bucket: int,
                columns: list[str] | None = None) -> str:
    import pyarrow.parquet as pq

    path = os.path.join(out_dir, kind, f"bucket={bucket:05d}.parquet")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if columns is not None:
        table = table.select([c for c in columns if c in table.column_names])
    tmp = f"{path}.tmp-{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)  # idempotent deterministic name (K2)
    return path


def make_bucket_writer(out_dir: str, write_docs: bool = True):
    """Build the per-bucket map_groups fn (Arrow in, tiny pandas metrics
    row out).  Deterministic output names keyed by bucket make task retries
    idempotent; the manifest rename is the commit point."""
    import pyarrow.compute as pc

    def process_bucket(t: pa.Table) -> pd.DataFrame:
        t0 = time.perf_counter()
        bucket = int(t["bucket"][0].as_py())
        rows_in = t.num_rows

        out = reassemble_table(t.drop_columns(["bucket"]))
        mask = pc.equal(out["status"], "routed")
        routed = out.filter(mask)
        quarantined = out.filter(pc.invert(mask))

        _write_part(routed, out_dir, "routed", bucket, ROUTED_COLS)
        _write_part(
            quarantined, out_dir, "quarantine", bucket,
            ROUTED_COLS + ["first_missing_turn"],
        )

        counts = (
            routed.select(["sink", "counter"])
            .group_by("sink")
            .aggregate([("counter", "count"), ("counter", "max")])
            .rename_columns(["sink", "n_rows", "max_counter"])
        )
        counts = counts.take(pc.sort_indices(counts["sink"]))
        _write_part(counts, out_dir, "sink_counts", bucket)

        if write_docs:
            _write_part(assemble_docs_table(routed), out_dir, "docs", bucket)

        payload = {
            "rows_in": int(rows_in),
            "routed": int(routed.num_rows),
            "quarantined": int(quarantined.num_rows),
            "dup_dropped": int(pc.sum(out["dup_dropped"]).as_py() or 0),
            "n_sinks": int(counts.num_rows),
            "wall_sec": round(time.perf_counter() - t0, 4),
        }
        mf.commit_bucket(out_dir, bucket, payload)
        return pd.DataFrame([{"bucket": bucket, **payload}])

    return process_bucket


# ---------------------------------------------------------------------------
# two-phase spill exchange (alternative to the Ray Data groupby shuffle)
# ---------------------------------------------------------------------------
#
# Measured on this 32-CPU node (5.36M turns, 64 buckets, warm):
#     groupby(bucket) push-based sort shuffle:  9.5 s @ 8 cpus, 11.1 s @ 32
#     two-phase disk spill exchange:           13.6 s @ 8 cpus,  6.1 s @ 32
# The object-store all-to-all is wall-flat in CPUs (single-node IPC path);
# the spill exchange scales ~3× from 8→32 because both phases are ordinary
# parallel tasks against the page cache.  Multi-node assumption: the spill
# directory lives on storage reachable by all workers (same assumption the
# manifest/commit design already makes for out_dir).


def _spill_dir(out_dir: str) -> str:
    """Transient exchange data: prefer RAM-backed tmpfs (no disk writeback
    in the exchange path).  Override with GRAFT_SPILL_ROOT; multi-node
    deployments point this at node-local fast storage or a shared FS."""
    import hashlib

    root = os.environ.get("GRAFT_SPILL_ROOT")
    if root is None:
        root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    if root is None:
        return os.path.join(out_dir, "_shuffle")
    tag = hashlib.blake2b(os.path.abspath(out_dir).encode(), digest_size=8).hexdigest()
    return os.path.join(root, f"graft_shuffle-{tag}")


def make_spiller(out_dir: str):
    """Phase-1 map task: split a block by bucket, write one spill file per
    (bucket, block) under the bucket's spill dir.  File names are a content
    hash of the block slice → task retries overwrite the same file
    (idempotent, like every sink in this pipeline)."""
    import hashlib

    import pyarrow.parquet as pq

    spill_root = _spill_dir(out_dir)

    def spill(t: pa.Table) -> pa.Table:
        b = t["bucket"].to_numpy()
        order = np.argsort(b, kind="stable")
        ts = t.take(pa.array(order))
        bs = b[order]
        starts = np.flatnonzero(np.r_[True, bs[1:] != bs[:-1]])
        ends = np.append(starts[1:], len(bs))
        for s, e in zip(starts, ends):
            part = ts.slice(s, e - s)
            bk = int(bs[s])
            key = hashlib.blake2b(
                f"{bk}|{e - s}|{part['conv_id'][0].as_py()}|"
                f"{part['turn_idx'][0].as_py()}|{part['ts'][-1].as_py()}".encode(),
                digest_size=10,
            ).hexdigest()
            d = os.path.join(spill_root, f"bucket={bk:05d}")
            os.makedirs(d, exist_ok=True)
            tmp = os.path.join(d, f".{key}.tmp-{os.getpid()}")
            # snappy halves exchange bytes for ~10% codec CPU — at high
            # parallelism the pipeline is bytes-bound, not CPU-bound
            pq.write_table(part, tmp)
            os.replace(tmp, os.path.join(d, f"{key}.parquet"))
        return pa.table({"rows": pa.array([t.num_rows], pa.int64())})

    return spill


def flagship_dataset(input_path: str, num_buckets: int = 64,
                     enrich_concurrency=2, batch_size: int = 32768):
    """The lazy parse→enrich→route→reassemble dataset (no writes) — used by
    ``__ray_entry__.entry()`` and tests."""
    ds = read_transcripts(input_path)
    ds = add_sink_and_bucket(ds, num_buckets=num_buckets)
    ds = apply_parse(ds, batch_size=batch_size)
    ds = apply_enrich(ds, concurrency=enrich_concurrency, batch_size=batch_size)
    from ..stages.reassemble import apply_reassemble

    return apply_reassemble(ds)


def run_flagship(input_path: str, out_dir: str, num_buckets: int = 64,
                 enrich_concurrency=None, batch_size: int = 32768,
                 resume: bool = True, write_docs: bool = True,
                 exchange: str = "spill") -> dict:
    """Execute the full pipeline with partitioned sinks + manifests.

    ``exchange="spill"`` (default) uses the two-phase disk exchange (see
    header comment above make_spiller for the measured rationale);
    ``"raydata"`` uses ``groupby(bucket).map_groups`` — semantically
    identical, kept for comparison and object-store-preferred deployments.
    Returns the run report: totals over ALL committed buckets (including
    ones committed by earlier runs when resuming).
    """
    import shutil

    from .. import tuning

    if exchange not in ("spill", "raydata"):
        raise ValueError(f"exchange must be 'spill' or 'raydata', got {exchange!r}")
    tuning.configure()
    if enrich_concurrency is None:
        enrich_concurrency = "task"
    os.makedirs(out_dir, exist_ok=True)
    reusable = mf.init_run(out_dir, num_buckets, input_path)
    committed = mf.committed_buckets(out_dir) if (resume and reusable) else set()

    ds = read_transcripts(input_path)
    ds = add_sink_and_bucket(ds, num_buckets=num_buckets)
    if committed:
        ds = ds.map_batches(
            make_skip_committed(committed),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    ds = apply_parse(ds, batch_size=batch_size)
    if enrich_concurrency == "task":
        # task-based enrich: the dictionaries are process-cached module
        # state (tiny), so no actor pool is needed — avoids the ~2 s
        # per-run pool spawn and the pool-size cap on fused-stage
        # parallelism.  apply_enrich (actor pool) remains the pattern for
        # heavy state; pass an int/tuple to use it.
        from ..stages.enrich import enrich_table

        ds = ds.map_batches(
            enrich_table, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=batch_size,
        )
    else:
        ds = apply_enrich(ds, concurrency=enrich_concurrency, batch_size=batch_size)

    writer = make_bucket_writer(out_dir, write_docs=write_docs)
    if exchange == "spill":
        import ray

        spill_root = _spill_dir(out_dir)
        shutil.rmtree(spill_root, ignore_errors=True)
        # phase 1: partition to disk — parallel map tasks, no all-to-all
        # large rebatch: fewer, bigger spill slices per bucket (256 tiny
        # files/bucket at 21M rows cost ~1.3 s/bucket of read overhead)
        ds.map_batches(
            make_spiller(out_dir), batch_format="pyarrow", zero_copy_batch=True,
            batch_size=400_000,
        ).count()

        # phase 2: one ordinary Ray task per spilled bucket.  (The Dataset
        # API can't express "one task per on-disk partition, no re-shuffle";
        # this is the documented drop-to-ray-tasks case.)
        @ray.remote
        def run_bucket(bk: int):
            import pyarrow.parquet as pq

            d = os.path.join(spill_root, f"bucket={bk:05d}")
            return writer(pq.read_table(d))

        todo = (
            sorted(
                int(name.split("=")[1])
                for name in os.listdir(spill_root)
                if name.startswith("bucket=")
            )
            if os.path.isdir(spill_root)
            else []
        )
        ran_parts = ray.get([run_bucket.remote(b) for b in todo])
        ran = pd.concat(ran_parts) if ran_parts else pd.DataFrame()
        shutil.rmtree(spill_root, ignore_errors=True)
    else:
        metrics = ds.groupby("bucket").map_groups(writer, batch_format="pyarrow")
        ran = metrics.to_pandas()  # tiny: one row per processed bucket

    all_manifests = mf.load_manifests(out_dir)
    report = {
        "buckets_total": len(all_manifests),
        "buckets_this_run": int(len(ran)),
        "buckets_skipped": len(committed),
        "rows_in": sum(m["rows_in"] for m in all_manifests),
        "routed": sum(m["routed"] for m in all_manifests),
        "quarantined": sum(m["quarantined"] for m in all_manifests),
        "dup_dropped": sum(m["dup_dropped"] for m in all_manifests),
        "n_sinks": sum(m["n_sinks"] for m in all_manifests),
    }
    return report


def read_sink_counts(out_dir: str) -> pd.DataFrame:
    """Aggregate result of a run: per-sink (n_rows, max_counter)."""
    import pyarrow.parquet as pq
    import pyarrow.dataset as pads

    d = os.path.join(out_dir, "sink_counts")
    return pads.dataset(d, format="parquet").to_table().to_pandas()
