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
from ..stages.reassemble import reassemble_pdf
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


def _write_part(df: pd.DataFrame, out_dir: str, kind: str, bucket: int,
                columns: list[str] | None = None) -> str:
    import pyarrow.parquet as pq

    path = os.path.join(out_dir, kind, f"bucket={bucket:05d}.parquet")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if columns is not None:
        df = df[[c for c in columns if c in df.columns]]
    tmp = f"{path}.tmp-{os.getpid()}"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp)
    os.replace(tmp, path)  # idempotent deterministic name (K2)
    return path


def make_bucket_writer(out_dir: str, write_docs: bool = True):
    """Build the per-bucket map_groups fn.  Deterministic output names keyed
    by bucket make task retries idempotent; the manifest rename is the
    commit point."""

    def process_bucket(df: pd.DataFrame) -> pd.DataFrame:
        t0 = time.perf_counter()
        bucket = int(df["bucket"].iloc[0])
        rows_in = len(df)

        out = reassemble_pdf(df.drop(columns=["bucket"]))
        routed = out[out["status"] == "routed"]
        quarantined = out[out["status"] == "quarantined"]

        _write_part(routed, out_dir, "routed", bucket, ROUTED_COLS)
        _write_part(
            quarantined, out_dir, "quarantine", bucket,
            ROUTED_COLS + ["first_missing_turn"],
        )

        counts = (
            routed.groupby("sink", sort=True)
            .agg(n_rows=("counter", "size"), max_counter=("counter", "max"))
            .reset_index()
        )
        _write_part(counts, out_dir, "sink_counts", bucket)

        if write_docs:
            docs = (
                routed.groupby("sink", sort=True)
                .agg(conv_id=("conv_id", "first"), assembled_text=("text", "\n".join))
                .reset_index()
            )
            _write_part(docs, out_dir, "docs", bucket)

        payload = {
            "rows_in": int(rows_in),
            "routed": int(len(routed)),
            "quarantined": int(len(quarantined)),
            "dup_dropped": int(out["dup_dropped"].sum()),
            "n_sinks": int(counts.shape[0]),
            "wall_sec": round(time.perf_counter() - t0, 4),
        }
        mf.commit_bucket(out_dir, bucket, payload)
        return pd.DataFrame([{"bucket": bucket, **payload}])

    return process_bucket


def flagship_dataset(input_path: str, num_buckets: int = 64,
                     enrich_concurrency=2, batch_size: int = 32768):
    """The lazy parse→enrich→route→reassemble dataset (no writes) — used by
    ``__ray_entry__.entry()`` and tests."""
    ds = read_transcripts(input_path)
    ds = add_sink_and_bucket(ds, num_buckets=num_buckets)
    ds = apply_parse(ds, batch_size=batch_size)
    ds = apply_enrich(ds, concurrency=enrich_concurrency, batch_size=batch_size)
    return ds.groupby("bucket").map_groups(
        lambda df: reassemble_pdf(df.drop(columns=["bucket"])),
        batch_format="pandas",
    )


def run_flagship(input_path: str, out_dir: str, num_buckets: int = 64,
                 enrich_concurrency=2, batch_size: int = 32768,
                 resume: bool = True, write_docs: bool = True) -> dict:
    """Execute the full pipeline with partitioned sinks + manifests.

    Returns the run report: totals over ALL committed buckets (including
    ones committed by earlier runs when resuming).
    """
    os.makedirs(out_dir, exist_ok=True)
    mf.init_run(out_dir, num_buckets, input_path)
    committed = mf.committed_buckets(out_dir) if resume else set()

    ds = read_transcripts(input_path)
    ds = add_sink_and_bucket(ds, num_buckets=num_buckets)
    if committed:
        ds = ds.map_batches(
            make_skip_committed(committed),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    ds = apply_parse(ds, batch_size=batch_size)
    ds = apply_enrich(ds, concurrency=enrich_concurrency, batch_size=batch_size)
    metrics = ds.groupby("bucket").map_groups(
        make_bucket_writer(out_dir, write_docs=write_docs), batch_format="pandas"
    )
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
