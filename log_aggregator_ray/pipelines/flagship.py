"""The flagship pipeline: route → exchange → reassemble → parse → enrich →
sinks + aggregates, checkpoint-resumable (SURVEY §3.4, §7 M4/M5).

Physical plan (one narrow exchange, everything else streams):

    read_parquet(corpus)                       # pruned source
      → map_batches(add bucket)                # hash of routing key ONLY
      → map_batches(filter committed buckets)  # resume anti-join (J1)
      → exchange on bucket                     # ships RAW columns only
      → per-bucket task:
            add sink (routing-key projection, M7)
            reassemble (order/dedup/gate/quarantine)
            parse (vectorized regex, M4/M8)
            enrich (broadcast dict lookups, T6/J3)
            write routed / quarantine / docs / sink_counts parquet
            commit bucket manifest (atomic rename)
      → metrics dataset (tiny) → run report

Exchange-byte discipline (the 100-TB lever): the shuffle ships the six raw
transcript columns (+ optional session) and NOTHING else — ``sink`` (a
derived string duplicating conv_id) and the ~10 parse/enrich columns are all
recomputed post-exchange inside the bucket task, where they are per-row
column derivations over already-localized data.  Measured round 2: this cut
exchange bytes ~45% vs the round-1 wide exchange; together with the
hot-sink path it lifted the 4→16 CPU scaling pair from 0.59 (round 1) to
0.84–0.90 (BASELINE.md ladder).

Per-sink fan-out is realized as bucket-partitioned parquet with rows sorted
by (sink, turn_idx) inside each file — the reference's one-file-per-
(id,session) (DataPumpDecoderSort.java:93-97) without creating millions of
tiny files; any single sink is one contiguous row range in exactly one
bucket file.  (``write_sink_files`` offers the literal per-sink artifact for
small sink counts.)  Aggregates are computed inside the already-grouped
bucket — no second shuffle (the PBLogFileCollector combiner shape, §2.6 A3).
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sources.readers import read_transcripts
from ..stages.enrich import enrich_table
from ..stages.parse import parse_batch
from ..stages.aggregate import assemble_docs_table
from ..stages.reassemble import reassemble_table
from ..stages.route import add_bucket, add_sink_column, sink_expr
from ..state import manifest as mf

ROUTED_COLS = [
    "sink", "conv_id", "turn_idx", "role", "text", "tool", "ts", "session",
    "event_type", "error_code", "counter", "tool_name", "tool_cmd", "tool_exit",
    "role_class", "role_priority", "tool_family", "tool_risk",
]

# Output codec for the persistent sinks.  zstd-3 compresses the text-heavy
# routed/docs output ~2.6× smaller than snappy for ~6% extra bucket-task CPU
# (measured round 2, sf0.1×4) — at high parallelism the pipeline is disk-
# writeback-bound, so fewer output bytes buys wall-clock and scaling.
SINK_CODEC = os.environ.get("GRAFT_SINK_CODEC", "zstd")


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


# Text-payload columns carry no stats: parquet min/max on them buys no
# pruning (nobody range-filters on full text) and COMPUTING them is the
# single most expensive part of writing a giant value — measured on the hot
# sink's 134 MB assembled doc: write 1.11 s with stats, 0.28 s without.
# Key columns (sink, turn_idx, ts, …) keep stats for row-group pruning.
_NO_STATS_COLS = ("text", "tool", "assembled_text", "tool_cmd")

# one-row-per-sink doc contract ceiling: Arrow `string` cells cap at 2 GiB
# (int32 offsets), and a single giant cell serializes its whole write —
# the default doc path REFUSES past this instead of failing deep inside
# parquet (opt into doc_chunk_rows for bigger conversations)
DOC_CELL_LIMIT = (1 << 31) - (1 << 20)


def _write_part(table: pa.Table, out_dir: str, kind: str, name: str,
                columns: list[str] | None = None) -> str:
    import pyarrow.parquet as pq

    path = os.path.join(out_dir, kind, f"bucket={name}.parquet")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if columns is not None:
        table = table.select([c for c in columns if c in table.column_names])
    tmp = f"{path}.tmp-{os.getpid()}"
    stats_cols = [c for c in table.column_names if c not in _NO_STATS_COLS]
    pq.write_table(table, tmp, compression=SINK_CODEC,
                   write_statistics=stats_cols or False)
    os.replace(tmp, path)  # idempotent deterministic name (K2)
    return path


# A phase-2 task above this row count is sub-split by sink hash into slices
# of ~SPLIT_TARGET rows, each its own nested Ray task.  The generator plants
# a pathologically hot conversation (~10% of ALL rows in one sink → one
# bucket 8× the median); without handling, that bucket is a straggler that
# wall-bounds phase 2 at every CPU count (measured: p50 bucket 0.86 s, hot
# bucket 12.6 s).  Whole sinks stay within one slice — reassembly/doc
# assembly need every row of a sink together — so a giant sink needs the
# dedicated turn-block path below (detect_hot_sinks + make_hot_processor);
# this sink-hash split handles fat MANY-sink buckets.
SPLIT_ROWS = 400_000
SPLIT_TARGET = 200_000


def _ship(t: pa.Table) -> pa.Buffer:
    """Compact a table (slice) into an IPC buffer for cross-task transfer.
    Pickling a zero-copy slice ships the ENTIRE parent table's buffers
    (measured: 100× the slice bytes); the IPC writer truncates buffers to
    the sliced region, so nested slice tasks receive only their rows."""
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, t.schema) as w:
        w.write_table(t)
    return sink.getvalue()


def _unship(buf) -> pa.Table:
    return pa.ipc.open_stream(buf).read_all()


def make_bucket_writer(out_dir: str, write_docs: bool = True, router=sink_expr,
                       doc_chunk_rows: int | None = None,
                       gen: str | None = None):
    """Build the per-bucket processing fn: RAW rows in (exchange output),
    sink derivation + reassembly + parse + enrich + all sink writes inside
    the task (sub-split into nested tasks when the bucket is fat).
    Deterministic output names keyed by bucket(.slice) make task retries
    idempotent; the manifest rename is the commit point."""
    import pyarrow.compute as pc

    from ..stages.route import stable_hash

    def process_slice(t: pa.Table, name: str) -> dict:
        """One unit of phase-2 work: every row of every sink in ``t``."""
        out = reassemble_table(t)
        out = parse_batch(out)      # derived columns post-exchange (M4/M8)
        out = enrich_table(out)     # broadcast dict joins post-exchange (J3)
        mask = pc.equal(out["status"], "routed")
        routed = out.filter(mask)
        quarantined = out.filter(pc.invert(mask))

        paths = [
            _write_part(routed, out_dir, "routed", name, ROUTED_COLS),
            _write_part(
                quarantined, out_dir, "quarantine", name,
                ROUTED_COLS + ["first_missing_turn"],
            ),
        ]

        counts = (
            routed.select(["sink", "counter"])
            .group_by("sink")
            .aggregate([("counter", "count"), ("counter", "max")])
            .rename_columns(["sink", "n_rows", "max_counter"])
        )
        counts = counts.take(pc.sort_indices(counts["sink"]))
        paths.append(_write_part(counts, out_dir, "sink_counts", name))

        if write_docs:
            paths.append(
                _write_part(assemble_docs_table(routed, doc_chunk_rows),
                            out_dir, "docs", name)
            )

        return {
            "paths": paths,
            "rows_in": t.num_rows,
            "routed": int(routed.num_rows),
            "quarantined": int(quarantined.num_rows),
            "dup_dropped": int(pc.sum(out["dup_dropped"]).as_py() or 0),
            "n_sinks": int(counts.num_rows),
        }

    def process_bucket(t: pa.Table, bucket: int,
                       prior_dups: int = 0, prior_rows: int = 0,
                       append_totals: dict | None = None) -> pd.DataFrame:
        """``append_totals`` set (run_flagship.bucket_table's append fast
        path: every fresh sink is NEW to this bucket) ⇒ prior files stay
        untouched, this run's rows land in a generation-suffixed slice
        (``bucket=NNNNN.g<gen6>[-SSS]``), and the manifest totals are the
        elementwise sum — disjoint sink sets make every count additive."""
        import glob

        t0 = time.perf_counter()
        t = add_sink_column(t, router=router)
        base = f"{bucket:05d}"
        stale_glob = f"bucket={bucket:05d}*.parquet"
        if append_totals is not None:
            gen6 = (gen or "nogen")[:6]
            base = f"{bucket:05d}.g{gen6}"
            # only THIS generation's previous layout may be cleaned up —
            # prior generations' files carry the bucket's committed rows
            stale_glob = f"bucket={bucket:05d}.g{gen6}*.parquet"

        if t.num_rows > SPLIT_ROWS:
            import ray

            # slice on the UPPER hash bits (lower bits chose the bucket) so
            # every sink lands wholly in one slice
            h = stable_hash(t["sink"])
            nsub = max(2, -(-t.num_rows // SPLIT_TARGET))
            sub = ((h >> np.uint64(32)) % np.uint64(nsub)).astype(np.int32)
            order = np.argsort(sub, kind="stable")
            ts = t.take(pa.array(order))
            subs = sub[order]
            starts = np.flatnonzero(np.r_[True, subs[1:] != subs[:-1]])
            ends = np.append(starts[1:], len(subs))
            sep = "-" if append_totals is not None else "."
            slice_task = ray.remote(
                lambda buf, name: process_slice(_unship(buf), name)
            )
            futures = [
                slice_task.remote(
                    _ship(ts.slice(s, e - s)),
                    f"{base}{sep}{int(subs[s]):03d}",
                )
                for s, e in zip(starts, ends)
            ]
            parts = ray.get(futures)
        else:
            parts = [process_slice(t, base)]

        # Crash-safe stale-name cleanup (write first, THEN delete): the
        # merged replacements are already atomically in place — os.replace
        # overwrote same-name files with the merged superset — so the
        # bucket's prior committed rows are recoverable at every instant.
        # A crash/retry between any two steps re-reads whichever mix of old
        # and new files survives, and first-wins dedup converges to the same
        # rows.  Only NOW remove names from a previous layout of this bucket
        # (the slice count can change when input grows on an incremental
        # merge).  Deleting before writing — the round-2 shape — left a
        # window where a replayed merge found no prior rows and silently
        # committed the bucket with only the new parts' rows.
        live = {os.path.abspath(pth) for p in parts for pth in p["paths"]}
        for kind in ("routed", "quarantine", "sink_counts", "docs"):
            for stale in glob.glob(os.path.join(out_dir, kind, stale_glob)):
                if os.path.abspath(stale) not in live:
                    os.remove(stale)

        # sink-set bloom digest for O(new rows) append detection on the
        # NEXT incremental run; append mode carries the prior generations'
        # blooms forward (capped — an uncapped list would grow one entry
        # per append generation; past the cap detection falls back to the
        # exact column read until a full rewrite resets the list)
        fresh_bloom = mf.sink_bloom(
            pc.unique(t["sink"].combine_chunks()).to_pylist()
        )
        prior_blooms = (append_totals or {}).get("sink_blooms") or []
        blooms = (prior_blooms + [fresh_bloom]
                  if append_totals is not None else [fresh_bloom])
        blooms = blooms if len(blooms) <= 12 else None

        T = append_totals or {}
        payload = {
            "sink_blooms": blooms,
            "rows_in": int(sum(p["rows_in"] for p in parts) + prior_rows
                           + T.get("rows_in", 0)),
            "routed": int(sum(p["routed"] for p in parts)
                          + T.get("routed", 0)),
            "quarantined": int(sum(p["quarantined"] for p in parts)
                               + T.get("quarantined", 0)),
            "dup_dropped": int(sum(p["dup_dropped"] for p in parts))
                           + prior_dups + T.get("dup_dropped", 0),
            "n_sinks": int(sum(p["n_sinks"] for p in parts)
                           + T.get("n_sinks", 0)),
            "appended": append_totals is not None,
            "wall_sec": round(time.perf_counter() - t0, 4),
        }
        mf.commit_bucket(out_dir, bucket, payload, gen=gen)
        slim = {k: v for k, v in payload.items() if k != "sink_blooms"}
        return pd.DataFrame([{"bucket": bucket, **slim}])

    return process_bucket


def combine_gate(infos: list[dict]) -> int | None:
    """Hierarchical contiguity combine: walk per-block (mn, mx,
    first_missing) summaries in turn order → the sink's global first
    missing turn, or None when fully contiguous.  Pure function
    (property-tested against the whole-key kernel in test_property)."""
    G = None
    prev_max = None
    for inf in infos:
        if prev_max is not None and inf["mn"] != prev_max + 1:
            G = prev_max + 1
            break
        if inf["first_missing"] is not None:
            G = inf["first_missing"]
            break
        prev_max = inf["mx"]
    return G


def _read_spill_file(path: str, columns: list[str] | None = None) -> pa.Table:
    """Extension-dispatched spill reader: transient exchange files are
    feather/IPC+lz4 (cheaper encode+decode than parquet — see make_spiller);
    an incremental merge also feeds a bucket's PRIOR OUTPUT parts (parquet)
    back through the same paths."""
    if path.endswith(".feather"):
        import pyarrow.feather as pf

        return pf.read_table(path, columns=columns)
    import pyarrow.parquet as pq

    return pq.read_table(path, columns=columns)


def make_hot_processor(out_dir: str, write_docs: bool = True, router=sink_expr,
                       gen: str | None = None,
                       doc_chunk_rows: int | None = None,
                       max_doc_bytes: int | None = None,
                       turn_block: int | None = None):
    """Phase-2 pipeline for a hot-sink pseudo-bucket: block-parallel
    reassembly of ONE giant key (see the hot-sink header note).  Every
    block task reads only its own turn-range files; the parent combines
    tiny per-block summaries — no task ever holds the whole sink.

    Doc contract (VERDICT r3 #2): by default the sink's doc is ONE row —
    finalize joins the per-block fragments into a single cell, which is
    serial and linear in the hot conversation; it REFUSES (clear error)
    past ``max_doc_bytes`` (default just under Arrow's 2 GiB string-cell
    limit).  ``doc_chunk_rows=N`` opts into the chunked contract: each
    emit writes its own ``(sink, conv_id, doc_part, assembled_text)``
    rows of ≤ N source rows in block-parallel — finalize does no doc
    work, nothing ever holds the whole doc, and the full doc is
    ``"\\n".join(parts ordered by doc_part)`` (doc_part values are
    ordered but not contiguous: ``block × parts_per_block + i``)."""
    import pyarrow.compute as pc

    max_doc_bytes = DOC_CELL_LIMIT if max_doc_bytes is None else max_doc_bytes
    # global doc_part stride: emits don't see each other, so a block's
    # parts are numbered inside its own stride (turn order ⇒ part order)
    parts_per_block = (
        max(1, -(-(turn_block or TURN_BLOCK) // doc_chunk_rows))
        if doc_chunk_rows else 1
    )

    def scan_file(f: str) -> np.ndarray:
        """Pass A fallback: the sorted unique turn_idx values of ONE file.
        Fresh spill files carry this as a map-side summary computed by the
        spiller (zero extra I/O — see make_spiller); this direct read is
        only needed for an incremental merge's PRIOR OUTPUT parts, of which
        there is one per turn block — a ~5 ms one-column read each, done
        inline in the gate loop."""
        t = _read_spill_file(f, columns=["turn_idx"])
        return np.unique(
            t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        )

    def block_info(uniq_arrays: list[np.ndarray]) -> dict:
        """Combine per-file uniques of one turn-block → its gate summary."""
        u = np.unique(np.concatenate(uniq_arrays))
        gaps = np.flatnonzero(np.diff(u) != 1)
        return {
            "mn": int(u[0]),
            "mx": int(u[-1]),
            "first_missing": int(u[gaps[0]] + 1) if gaps.size else None,
        }

    def emit_block(files: list[str], name: str, G: int | None,
                   *bufs) -> dict:
        """Pass B: dedup + global label + derive + write, one turn range.
        Inputs arrive as spill/prior-part FILES and/or object-store IPC
        buffers (``bufs`` ride as top-level task args so Ray resolves the
        refs before the task runs — locality-aware on a cluster)."""
        _t0 = time.perf_counter()
        tabs = []
        for f in files:
            t = _read_spill_file(f)
            tabs.append(t.select([c for c in EXCHANGE_COLS if c in t.column_names]))
        for buf in bufs:
            t = _unship(buf)
            tabs.append(t.select([c for c in EXCHANGE_COLS if c in t.column_names]))
        t = pa.concat_tables(tabs, promote_options="default")
        rows_in = t.num_rows
        t = add_sink_column(t, router=router)
        out = reassemble_table(t)  # sort + first-wins dedup (local gate unused)
        turns = out["turn_idx"].to_numpy(zero_copy_only=False)
        routed_mask = np.ones(len(turns), bool) if G is None else turns < G
        out = (
            out.drop_columns(["status", "first_missing_turn"])
            .append_column(
                "status", pa.array(np.where(routed_mask, "routed", "quarantined"))
            )
            .append_column(
                "first_missing_turn",
                pa.array(
                    np.where(routed_mask, 0, 0 if G is None else G).astype(np.int64)
                ),
            )
        )
        out = parse_batch(out)
        out = enrich_table(out)
        routed = out.filter(pa.array(routed_mask))
        quarantined = out.filter(pa.array(~routed_mask))
        _write_part(routed, out_dir, "routed", name, ROUTED_COLS)
        _write_part(quarantined, out_dir, "quarantine", name,
                    ROUTED_COLS + ["first_missing_turn"])
        frag, frag_bytes = None, 0
        if write_docs and routed.num_rows:
            text = routed["text"].combine_chunks()
            if doc_chunk_rows:
                # chunked contract: THIS emit writes its own doc parts in
                # block-parallel; nothing ever holds the whole doc
                nr = routed.num_rows
                bounds = np.arange(0, nr + doc_chunk_rows, doc_chunk_rows)
                bounds[-1] = nr
                bounds = np.unique(bounds)
                la = pa.ListArray.from_arrays(
                    pa.array(bounds, pa.int64()), text)
                parts_txt = pc.binary_join(la, "\n")
                k = len(bounds) - 1
                blk_idx = int(name.split(".")[1])
                sink_v = t["sink"][0].as_py()
                conv_v = t["conv_id"][0].as_py()
                docs = pa.table({
                    "sink": pa.array([sink_v] * k, pa.string()),
                    "conv_id": pa.array([conv_v] * k, pa.string()),
                    "doc_part": pa.array(
                        blk_idx * parts_per_block + np.arange(k, dtype=np.int64)
                    ),
                    "assembled_text": parts_txt,
                })
                _write_part(docs, out_dir, "docs", name)
                frag_bytes = int(pc.sum(pc.binary_length(parts_txt)).as_py()
                                 or 0)
            else:
                la = pa.ListArray.from_arrays(
                    pa.array([0, routed.num_rows], pa.int64()), text)
                joined = pc.binary_join(la, "\n")
                frag = joined[0].as_py()
                frag_bytes = int(pc.binary_length(joined)[0].as_py())
        return {
            "rows_in": rows_in,
            "frag_bytes": frag_bytes,
            "routed": int(routed.num_rows),
            "quarantined": int(quarantined.num_rows),
            "dup_dropped": int(pc.sum(out["dup_dropped"]).as_py() or 0),
            "max_counter": (
                int(pc.max(routed["counter"]).as_py()) if routed.num_rows else None
            ),
            "sink": t["sink"][0].as_py() if t.num_rows else None,
            "conv_id": t["conv_id"][0].as_py() if t.num_rows else None,
            "frag": frag,
            "wall": round(time.perf_counter() - _t0, 4),
            "t_end": time.time(),
        }

    def finalize_bucket(bucket: int, blocks: list[int], prior_dups: int,
                        prior_rows: int, t0: float, *parts) -> pd.DataFrame:
        """Combine the tiny per-block summaries: one sink_counts row, one
        assembled doc (block fragments joined in turn order), the bucket
        manifest.  Runs as a remote task so the (possibly large) doc string
        never touches the driver."""
        _fin0 = time.perf_counter()
        # stale block parts from a previous layout of this pseudo-bucket
        import glob as globmod

        live = {f"bucket={bucket:05d}.{b:04d}.parquet" for b in blocks}
        # chunked docs are emit-written per block (same names as routed
        # parts) — clean THEIR stale files too; the default one-row doc is
        # finalize-written under bucket=NNNNN.parquet and overwritten below
        kinds = (("routed", "quarantine", "docs") if doc_chunk_rows
                 else ("routed", "quarantine"))
        for kind in kinds:
            for p in globmod.glob(
                os.path.join(out_dir, kind, f"bucket={bucket:05d}*.parquet")
            ):
                if os.path.basename(p) not in live:
                    os.remove(p)

        routed_n = int(sum(p["routed"] for p in parts))
        max_counter = max(
            (p["max_counter"] for p in parts if p["max_counter"] is not None),
            default=None,
        )
        sink = next((p["sink"] for p in parts if p["sink"]), None)
        conv = next((p["conv_id"] for p in parts if p["conv_id"]), None)
        counts = pa.table({
            "sink": pa.array([sink] if routed_n else [], pa.string()),
            "n_rows": pa.array([routed_n] if routed_n else [], pa.int64()),
            "max_counter": pa.array(
                [max_counter] if routed_n else [], pa.int64()
            ),
        })
        _write_part(counts, out_dir, "sink_counts", f"{bucket:05d}")
        if write_docs and not doc_chunk_rows:
            frags = [p["frag"] for p in parts if p["frag"] is not None]
            total_bytes = (sum(p["frag_bytes"] for p in parts)
                           + max(0, len(frags) - 1))
            if total_bytes > max_doc_bytes:
                raise ValueError(
                    f"hot sink '{sink}' assembled doc is {total_bytes} "
                    f"bytes, over the one-row-per-sink contract's "
                    f"max_doc_bytes={max_doc_bytes} (Arrow string cells "
                    f"cap at 2 GiB and a single giant cell serializes the "
                    f"write) — rerun with doc_chunk_rows=N for the "
                    f"chunked (sink, conv_id, doc_part, assembled_text) "
                    f"contract"
                )
            docs = pa.table({
                "sink": pa.array([sink] if frags else [], pa.string()),
                "conv_id": pa.array([conv] if frags else [], pa.string()),
                "assembled_text": pa.array(
                    ["\n".join(frags)] if frags else [], pa.string()
                ),
            })
            _write_part(docs, out_dir, "docs", f"{bucket:05d}")

        payload = {
            "rows_in": int(sum(p["rows_in"] for p in parts) + prior_rows),
            "routed": routed_n,
            "quarantined": int(sum(p["quarantined"] for p in parts)),
            "dup_dropped": int(sum(p["dup_dropped"] for p in parts)) + prior_dups,
            "n_sinks": 1 if routed_n else 0,
            "wall_sec": round(time.perf_counter() - t0, 4),
            "emit_wall_max": max((p["wall"] for p in parts), default=0.0),
            "emit_wall_sum": round(sum(p["wall"] for p in parts), 3),
            "last_emit_end": max((p.get("t_end", 0.0) for p in parts),
                                 default=0.0),
            "finalize_sec": round(time.perf_counter() - _fin0, 4),
            "exchange_rebuilds": int(sum(p.get("rebuilds", 0)
                                         for p in parts)),
        }
        mf.commit_bucket(out_dir, bucket, payload, gen=gen)
        return pd.DataFrame([{"bucket": bucket, **payload}])

    class HotPipeline:
        """Driver-side orchestration handles: fresh files' gate summaries
        arrive as phase-1 map output (make_spiller), so every gate resolves
        the instant the barrier closes; emits are submitted immediately,
        and finalize consumes the emit futures without driver round-trips."""

        def __init__(self):
            import ray

            self.scan_file = scan_file        # prior-part fallback, see above
            self.block_info = block_info
            self.emit = ray.remote(emit_block)
            self.emit_fn = emit_block         # raw fn: lets the objstore
            # path run emits inside ITS phase-2 scheduling class (one FIFO)
            # finalize is the tail of the giant key's critical chain: any
            # nonzero CPU request queues it behind the phase-2 pool (at
            # 0.5 CPU it still started ~1 s after its last emit landed).
            # num_cpus=0 schedules it the moment its emit deps resolve —
            # one briefly-oversubscribed core per hot sink, bounded by the
            # (few, by construction) hot sinks.
            self.finalize = ray.remote(num_cpus=0)(finalize_bucket)

        @staticmethod
        def group_files(spill_dir: str,
                        prior_parts: list[str] | None = None) -> dict:
            import re

            groups: dict[int, list[str]] = {}
            if os.path.isdir(spill_dir):
                for f in os.listdir(spill_dir):
                    m = re.match(r"tb(\d+)-.*\.(parquet|feather)$", f)
                    if m:
                        groups.setdefault(int(m.group(1)), []).append(
                            os.path.join(spill_dir, f)
                        )
            # incremental merge: a block's prior committed rows live in its
            # own deterministically-named output part — feed them back in
            for p in prior_parts or ():
                m = re.match(r"bucket=\d+\.(\d+)\.parquet$", os.path.basename(p))
                if m:
                    groups.setdefault(int(m.group(1)), []).append(p)
            return groups

        combine_gate = staticmethod(combine_gate)

    return HotPipeline()


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

# Columns the exchange ships: the raw transcript schema + optional session.
# Everything else is derived post-exchange.
EXCHANGE_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "session"]

# ---------------------------------------------------------------------------
# hot-sink handling: one giant key range-partitioned by sequence number
# ---------------------------------------------------------------------------
#
# The corpus contains a pathologically hot conversation (~10% of ALL rows in
# one sink).  A sink's reassembly normally needs every row in one task, so a
# giant sink is a phase-2 straggler no amount of bucket splitting removes
# (measured: hot-sink task ≈ 8-15 s while the p50 bucket is < 1 s — it wall-
# bounds phase 2 at every CPU count).  The fix is the classic giant-key
# recipe: RANGE-partition the hot sink by turn_idx block at spill time, then
# gate hierarchically —
#   pass A: per-block scan of the turn_idx column only (min, max, first
#           internal gap after dedup),
#   combine: walk blocks in order → the sink's global first missing turn G,
#   pass B: per-block dedup + label (turn < G → routed) + parse + enrich +
#           write, fully parallel.
# Duplicates share a turn_idx → the same block, so dedup stays exact; the
# contiguity gate is a prefix property, so G alone labels every block.
HOT_SINK_ROWS = 250_000     # estimated rows above which a sink goes hot
TURN_BLOCK = 65_536          # turn_idx range per hot-sink partition


def detect_hot_sinks(input_path: str, router=sink_expr,
                     threshold: int = HOT_SINK_ROWS) -> list[int]:
    """Distributed hot-key pre-pass: one tiny Ray task per input part reads
    ONLY the routing-key columns and returns the sinks that clear a per-part
    pigeonhole cut; the driver sums the partials.  Returns the (sorted)
    stable hashes of sinks judged to exceed ``threshold`` total rows.

    Detection is EXACT (the round-2 4-part sample could miss a hot sink
    concentrated in unsampled parts — VERDICT r2 #6): a sink with
    ≥ threshold rows must, by pigeonhole, exceed cut = threshold/(2·nparts)
    in enough parts that its visible mass alone exceeds threshold/2 — the
    mass hidden below the cut is < nparts·cut = threshold/2.  So visible
    > threshold ⇒ hot, visible ≤ threshold/2 ⇒ not hot, and the ambiguous
    band (threshold/2, threshold] gets a second key-restricted recount pass
    (exact, no cut) — usually empty, always cheap.  Cost: a key-column-only
    scan of every part — O(key bytes) distributed, the
    ``stages.skew.detect_hot_sinks`` shape."""
    import glob

    import pyarrow.parquet as pq

    import ray

    if os.path.isdir(input_path):
        parts = sorted(
            glob.glob(os.path.join(input_path, "**", "*.parquet"), recursive=True)
        )
    else:
        parts = [input_path] if os.path.exists(input_path) else []
    if not parts:
        return []
    cut = max(1, threshold // (2 * len(parts)))

    def part_counts(p: str, keys: frozenset | None = None) -> dict:
        schema = pq.read_schema(p)
        cols = [c for c in ("conv_id", "session") if c in schema.names]
        t = pq.read_table(p, columns=cols)
        sink = router(t)
        if not isinstance(sink, (pa.Array, pa.ChunkedArray)):
            sink = pa.array(sink)
        vc = pd.Series(np.asarray(sink.to_pandas())).value_counts()
        if keys is None:
            vc = vc[vc > cut]  # pigeonhole cut: ships only plausible-hot keys
        else:
            vc = vc[vc.index.isin(keys)]  # recount pass: exact, no cut
        return {k: int(v) for k, v in vc.items()}

    task = ray.remote(part_counts)

    def summed(futs) -> dict[str, int]:
        counts: dict[str, int] = {}
        for d in ray.get(futs):
            for k, v in d.items():
                counts[k] = counts.get(k, 0) + v
        return counts

    counts = summed([task.remote(p) for p in parts])
    hot = [k for k, v in counts.items() if v > threshold]
    ambiguous = frozenset(
        k for k, v in counts.items() if threshold / 2 < v <= threshold
    )
    if ambiguous and len(parts) > 1:  # 1 part ⇒ visible counts are exact
        exact = summed([task.remote(p, ambiguous) for p in parts])
        hot += [k for k, v in exact.items() if v > threshold]
    if not hot:
        return []
    from ..stages.route import stable_hash

    h = stable_hash(np.asarray(sorted(hot), dtype=object))
    return sorted(int(x) for x in np.unique(h))


def _single_node() -> bool:
    try:
        import ray

        if ray.is_initialized():
            return len([n for n in ray.nodes() if n.get("Alive")]) <= 1
    except Exception:
        pass
    return True  # standalone local mode


def _spill_dir(out_dir: str) -> str:
    """Transient exchange data root.  Safe-by-default across deployments:
    node-local tmpfs (/dev/shm — no disk writeback in the exchange path) is
    used ONLY when the cluster is a single node; on a multi-node cluster
    tmpfs is node-local and phase 2 would silently read partial buckets, so
    the default falls back to a subdirectory of out_dir (already required to
    be worker-shared by the manifest design).  GRAFT_SPILL_ROOT overrides
    both (point it at node-local NVMe + a shared-FS phase-2, or a fast
    shared scratch)."""
    import hashlib

    root = os.environ.get("GRAFT_SPILL_ROOT")
    if root is None and _single_node() and os.path.isdir("/dev/shm"):
        root = "/dev/shm"
    if root is None:
        return os.path.join(out_dir, "_shuffle")
    tag = hashlib.blake2b(os.path.abspath(out_dir).encode(), digest_size=8).hexdigest()
    return os.path.join(root, f"graft_shuffle-{tag}")


def _slice_key(part: pa.Table, bucket: int) -> str:
    """Spill-file name: a content hash over the slice's full numeric columns
    and string-length arrays (cheap: ~16 B/row), not just endpoint samples —
    two DISTINCT slices colliding would require identical turn/ts sequences
    and length-identical strings throughout.  Byte-identical slices (exact
    duplicate blocks) do collide by construction, which is routed-output-
    harmless: every row of the lost copy is an exact (sink, turn_idx)
    duplicate that first-wins dedup would drop anyway; only the dup_dropped
    metric would under-count in that pathological case."""
    import hashlib

    h = hashlib.blake2b(digest_size=10)
    h.update(f"{bucket}|{part.num_rows}".encode())
    h.update(part["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64).tobytes())
    h.update(part["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False).tobytes())
    import pyarrow.compute as pc

    for col in ("conv_id", "text"):
        ln = pc.binary_length(part[col]).to_numpy(zero_copy_only=False)
        h.update(np.ascontiguousarray(ln, dtype=np.int32).tobytes())
    h.update(part["conv_id"][0].as_py().encode())
    h.update(part["conv_id"][-1].as_py().encode())
    return h.hexdigest()


def make_spiller(out_dir: str, num_buckets: int = 1 << 30,
                 turn_block: int = TURN_BLOCK):
    """Phase-1 map task: split a block by bucket, write one spill file per
    (bucket, block) under the bucket's spill dir — RAW columns only (see
    EXCHANGE_COLS).  Hot-sink pseudo-buckets (id ≥ num_buckets) are further
    split into turn_idx-range files (``tb<blk>-…``) so phase 2 can gate the
    giant key block-parallel.  File names are a content hash of the slice →
    task retries overwrite the same file (idempotent, like every sink in
    this pipeline)."""
    import pyarrow.feather as pf

    spill_root = _spill_dir(out_dir)
    # Spill format: feather (Arrow IPC) + lz4.  Measured on the bench
    # corpus's text-heavy exchange schema (353k-row slice, tmpfs):
    #     parquet+snappy  write 172 ms  read 128 ms  11.8 MB
    #     feather+lz4     write  92 ms  read  34 ms  16.9 MB
    # i.e. ~half the encode CPU and ~1/4 the decode CPU for 1.4× the
    # bytes.  Spill files are transient single-pass intermediates —
    # parquet's stats/dictionary machinery buys nothing here.  (Fully
    # uncompressed was also tried: 3.6× the bytes loses at 32 CPUs where
    # the box is memory-bandwidth-bound, and on a real cluster the exchange
    # is network-bound — lz4 is the right point at every scale that
    # matters.)
    def write_slice(part: pa.Table, bk: int, prefix: str = "") -> str:
        key = _slice_key(part, bk)
        d = os.path.join(spill_root, f"bucket={bk:05d}")
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".{prefix}{key}.tmp-{os.getpid()}")
        pf.write_feather(part, tmp, compression="lz4")
        final = os.path.join(d, f"{prefix}{key}.feather")
        os.replace(tmp, final)
        return final

    def spill(t: pa.Table) -> pa.Table:
        b = t["bucket"].to_numpy()
        keep = [c for c in EXCHANGE_COLS if c in t.column_names]
        ts = t.select(keep)
        order = np.argsort(b, kind="stable")
        ts = ts.take(pa.array(order))
        bs = b[order]
        starts = np.flatnonzero(np.r_[True, bs[1:] != bs[:-1]])
        ends = np.append(starts[1:], len(bs))
        # Per-hot-file gate summaries, computed HERE where the rows are
        # already in memory (a classic map-side combiner): the gate pass
        # needs each hot file's unique turn set, and re-reading ~10⁴ tiny
        # files post-barrier was the phase-boundary bottleneck (measured:
        # 4 driver scan threads fell ~1.5 s behind a 32-CPU phase 1).
        sm_file: list[str] = []
        sm_block: list[int] = []
        sm_turns: list[np.ndarray] = []
        for s, e in zip(starts, ends):
            part = ts.slice(s, e - s)
            bk = int(bs[s])
            if bk < num_buckets:
                write_slice(part, bk)
                continue
            # hot pseudo-bucket: one file per turn_idx block
            turns = part["turn_idx"].to_numpy(zero_copy_only=False)
            tb = (turns // turn_block).astype(np.int64)
            o2 = np.argsort(tb, kind="stable")
            p2 = part.take(pa.array(o2))
            t2 = tb[o2]
            s2 = np.flatnonzero(np.r_[True, t2[1:] != t2[:-1]])
            e2 = np.append(s2[1:], len(t2))
            for ss, ee in zip(s2, e2):
                blk = int(t2[ss])
                path = write_slice(p2.slice(ss, ee - ss), bk, f"tb{blk:05d}-")
                sm_file.append(path)
                sm_block.append(blk)
                sm_turns.append(np.unique(turns[o2[ss:ee]]))
        return pa.table({
            "file": pa.array(sm_file, pa.string()),
            "block": pa.array(sm_block, pa.int64()),
            "turns": pa.array(
                [a.tolist() for a in sm_turns], pa.list_(pa.int64())
            ),
        })

    return spill


def make_exchange_map(num_buckets: int, hot_hashes, committed: set[int],
                      turn_block: int = TURN_BLOCK, router=sink_expr):
    """Phase-1 map task for the OBJECT-STORE exchange (the default): read a
    group of input parts (EXCHANGE_COLS only — pruned at the parquet read),
    bucket the rows, and ``ray.put`` one IPC-compacted slice per bucket
    (per (bucket, turn-block) for hot pseudo-buckets).  Returns
    ``(norm_refs, hot_refs, summaries, sizes)``:

      norm_refs   {bucket: ObjectRef[ipc buffer]}
      hot_refs    {(bucket, block): ObjectRef[ipc buffer]}
      summaries   [(bucket, block, sorted-unique turn_idx array)] — the
                  map-side gate combiner (see the hot-sink header note)
      sizes       {bucket: ipc bytes} for largest-first phase-2 launch

    Rows of already-committed buckets (resume) are dropped here, before any
    bytes ship.  Slices are IPC-serialized (``_ship``) because a pickled
    zero-copy table slice drags its parent's full buffers (measured 100×);
    they are NOT compressed — on one node the object store is shared memory
    (compression is pure extra CPU), and on a cluster Ray moves objects
    only to the tasks that consume them.

    Lifetime note: ``ray.put`` objects are owned by the map worker that
    created them; on a preemptible cluster that worker can die before
    phase 2 consumes its refs.  Recovery is PER MAP (VERDICT r3 #3): the
    driver records which chunk produced each ref, and a phase-2 task
    whose ``ray.get`` hits a lost object re-executes just that chunk's
    deterministic map inline (``make_bucket_rebuilder``) and extracts its
    own slice — never a run-level rerun, never silent data loss."""
    hot = np.sort(np.asarray(hot_hashes, dtype=np.uint64)) if (
        hot_hashes is not None and len(hot_hashes)
    ) else None
    skip = np.array(sorted(committed), dtype=np.int64) if committed else None

    def exchange_parts(paths: list[str]):
        import ray

        norm_refs: dict[int, object] = {}
        hot_refs: dict[tuple[int, int], object] = {}
        summaries: list[tuple[int, int, np.ndarray]] = []
        sizes: dict[int, int] = {}
        for bk, blk, part, uniq in _iter_bucket_slices(
            paths, num_buckets, hot, skip, turn_block, router
        ):
            if blk is None:
                buf = _ship(part)
                sizes[bk] = buf.size
                norm_refs[bk] = ray.put(buf)
            else:
                hot_refs[(bk, blk)] = ray.put(_ship(part))
                summaries.append((bk, blk, uniq))
        return norm_refs, hot_refs, summaries, sizes

    return exchange_parts


def _iter_bucket_slices(paths, num_buckets, hot, skip, turn_block, router):
    """Deterministic kernel shared by the phase-1 exchange map and the
    per-map rebuilder: read a chunk's parts (EXCHANGE_COLS pruned at the
    parquet read), bucket, and yield ``(bucket, None, table, None)`` per
    normal bucket / ``(bucket, block, table, uniq_turns)`` per hot
    (bucket, turn-block) slice — byte-stable for a fixed input, which is
    what makes a lost exchange object rebuildable without coordination."""
    import pyarrow.parquet as pq

    from ..stages.route import add_bucket_column

    tabs = []
    for p in paths:
        sch = pq.read_schema(p)
        cols = [c for c in EXCHANGE_COLS if c in sch.names]
        tabs.append(
            pq.read_table(p, columns=cols).replace_schema_metadata(None)
        )
    t = pa.concat_tables(tabs, promote_options="default")
    t = add_bucket_column(t, num_buckets, router, hot)
    b = t["bucket"].to_numpy()
    if skip is not None:
        keep_mask = ~np.isin(b, skip)
        t = t.filter(pa.array(keep_mask))
        b = b[keep_mask]
    t = t.drop_columns(["bucket"])
    if len(b) == 0:  # every row belonged to a committed bucket
        return
    order = np.argsort(b, kind="stable")
    ts = t.take(pa.array(order))
    bs = b[order]
    starts = np.flatnonzero(np.r_[True, bs[1:] != bs[:-1]])
    ends = np.append(starts[1:], len(bs))
    for s, e in zip(starts, ends):
        part = ts.slice(s, e - s)
        bk = int(bs[s])
        if bk < num_buckets:
            yield bk, None, part, None
            continue
        turns = part["turn_idx"].to_numpy(zero_copy_only=False)
        tb = (turns // turn_block).astype(np.int64)
        o2 = np.argsort(tb, kind="stable")
        p2 = part.take(pa.array(o2))
        t2 = tb[o2]
        s2 = np.flatnonzero(np.r_[True, t2[1:] != t2[:-1]])
        e2 = np.append(s2[1:], len(t2))
        for ss, ee in zip(s2, e2):
            yield (bk, int(t2[ss]), p2.slice(ss, ee - ss),
                   np.unique(turns[o2[ss:ee]]))


def make_bucket_rebuilder(num_buckets: int, hot_hashes, committed: set[int],
                          turn_block: int = TURN_BLOCK, router=sink_expr):
    """Per-map recovery for the objstore exchange: deterministically
    re-derive ONE bucket's (or hot (bucket, block)'s) shipped slice from
    the chunk files that produced the lost ref.  Reference analog: the
    pump's delete-on-200 at-least-once retry (datapump/.../
    AsyncPusher.java:127-144) — re-send exactly the lost unit."""
    hot = np.sort(np.asarray(hot_hashes, dtype=np.uint64)) if (
        hot_hashes is not None and len(hot_hashes)
    ) else None
    skip = np.array(sorted(committed), dtype=np.int64) if committed else None

    def rebuild(paths: list[str], bucket: int, block: int | None = None):
        for bk, blk, part, _u in _iter_bucket_slices(
            paths, num_buckets, hot, skip, turn_block, router
        ):
            if bk == bucket and blk == block:
                return _ship(part)
        raise RuntimeError(
            f"rebuild of bucket={bucket} block={block} found no rows in its "
            f"chunk — exchange map and rebuilder diverged (same code path, "
            f"so the input files must have changed mid-run)"
        )

    return rebuild


def auto_buckets(input_path: str, target_bytes: int = 256 << 20,
                 floor: int = 32) -> int:
    """Bucket count that scales with the input instead of a fixed constant:
    one bucket ≈ target_bytes of input (a phase-2 task loads a whole bucket
    into its heap, so bucket size must stay worker-heap-bounded at 1000× the
    data), floored at ~2× the CPU count for parallelism."""
    total = 0
    if os.path.isdir(input_path):
        for root, _dirs, files in os.walk(input_path):
            for f in files:
                if f.endswith(".parquet"):
                    total += os.path.getsize(os.path.join(root, f))
    elif os.path.exists(input_path):
        total = os.path.getsize(input_path)
    from .. import tuning

    floor = max(floor, 2 * tuning.available_cpus())
    return max(floor, min(1 << 16, -(-total // target_bytes)))


def flagship_dataset(input_path: str, num_buckets: int = 64,
                     batch_size: int = 32768):
    """The lazy route→reassemble→parse→enrich dataset (no writes) — used by
    ``__ray_entry__.entry()`` and tests."""
    from ..stages.reassemble import apply_reassemble
    from ..stages.route import add_sink_and_bucket

    ds = read_transcripts(input_path)
    ds = add_sink_and_bucket(ds, num_buckets=num_buckets)
    ds = apply_reassemble(ds)
    ds = ds.map_batches(parse_batch, batch_format="pyarrow",
                        zero_copy_batch=True, batch_size=batch_size)
    return ds.map_batches(enrich_table, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size)


def run_flagship(input_path: str, out_dir: str, num_buckets: int | None = 64,
                 enrich_concurrency=None, batch_size: int = 32768,
                 resume: bool = True, write_docs: bool = True,
                 exchange: str = "objstore", incremental: bool = True,
                 hot_sink_rows: int = HOT_SINK_ROWS,
                 turn_block: int = TURN_BLOCK,
                 doc_chunk_rows: int | None = None,
                 max_doc_bytes: int | None = None) -> dict:
    """Execute the full pipeline with partitioned sinks + manifests.

    ``exchange="objstore"`` (default) is a two-phase exchange through the
    Ray object store: phase-1 map tasks read part groups and ``ray.put``
    one IPC slice per bucket (make_exchange_map); phase-2 tasks consume
    exactly their bucket's refs — locality-aware on a cluster, zero-copy
    on one node, no shared filesystem needed for the exchange (measured
    vs the file spill: no encode/decode CPU, ~25% faster phase 1).
    ``"spill"`` is the file-based variant (see make_spiller — useful when
    exchange bytes far exceed object-store capacity and GRAFT_SPILL_ROOT
    points at fast scratch); ``"raydata"`` uses
    ``groupby(bucket).map_groups`` — semantically identical, kept for
    comparison.
    ``num_buckets=None`` sizes buckets from the input (auto_buckets).
    ``incremental=True`` (with resume) processes ONLY parquet parts added
    since the last committed run, merging new rows into the affected
    buckets' prior outputs (see state.manifest).
    ``doc_chunk_rows=N`` opts into the chunked doc contract (docs gain a
    ``doc_part`` column; parts of ≤ N rows, written block-parallel for
    hot sinks — see make_hot_processor); the default one-row-per-sink
    contract refuses docs over ``max_doc_bytes`` (≈2 GiB Arrow cell cap).
    Returns the run report:
    totals over ALL committed buckets (including ones committed by earlier
    runs when resuming).
    """
    import shutil

    from .. import tuning

    if exchange not in ("objstore", "spill", "raydata"):
        raise ValueError(
            f"exchange must be 'objstore', 'spill' or 'raydata', got {exchange!r}"
        )
    tuning.configure()
    if num_buckets is None:
        num_buckets = auto_buckets(input_path)
    os.makedirs(out_dir, exist_ok=True)
    # hot-sink detection must be STABLE across incremental runs (a sink that
    # grows hot later keeps its original bucket until a full restart), so
    # the detected set is persisted with the run and re-detection only
    # applies to fresh/invalidated runs (init_run decides).
    detected_hot = detect_hot_sinks(input_path, threshold=hot_sink_rows)
    plan = mf.init_run(out_dir, num_buckets, input_path,
                       incremental=resume and incremental,
                       hot_hashes=detected_hot)
    hot_hashes = plan.hot_hashes
    committed = (
        mf.committed_buckets(out_dir, plan.gen)
        if (resume and plan.reuse_buckets)
        else set()
    )

    def build_ds():
        """Lazy routed Dataset for the spill/raydata exchanges (objstore
        reads + buckets inside its own map tasks)."""
        ds = read_transcripts(plan.read_path or input_path)
        ds = add_bucket(ds, num_buckets=num_buckets, hot_hashes=hot_hashes)
        if committed:
            ds = ds.map_batches(
                make_skip_committed(committed),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        return ds

    writer = make_bucket_writer(out_dir, write_docs=write_docs, gen=plan.gen,
                                doc_chunk_rows=doc_chunk_rows)
    hot_writer = make_hot_processor(out_dir, write_docs=write_docs,
                                    gen=plan.gen,
                                    doc_chunk_rows=doc_chunk_rows,
                                    max_doc_bytes=max_doc_bytes,
                                    turn_block=turn_block)
    prior = {m["bucket"]: m for m in mf.load_manifests(out_dir)} if plan.merge else {}

    def bucket_table(
        bk: int, fresh: pa.Table
    ) -> tuple[pa.Table, int, int, dict | None]:
        """Incremental merge: prior committed rows (raw cols re-read from the
        bucket's own routed+quarantine output) + fresh rows → one table the
        reassembly kernel re-gates from scratch.  Dedup is first-wins and
        idempotent, so replaying a crashed merge converges to the same rows.

        APPEND fast path (4th return value): when every fresh row belongs
        to a sink the bucket has never seen (the reference's operating
        mode — new conversations arriving), prior rows cannot interact
        with the new ones (dedup keys and gates are per-sink), so the
        merge skips the full-row re-read + rewrite entirely: the fresh
        sinks are processed alone, written as a generation-suffixed slice
        alongside the untouched prior files, and the manifest totals are
        summed.  Detection costs one sink-column read.  Normal buckets
        only — hot pseudo-buckets gate ONE sink across runs by design."""
        if not plan.merge or bk not in prior:
            return fresh, 0, 0, None
        m = prior[bk]
        if bk < num_buckets:
            from ..stages.route import add_sink_column

            def totals(blooms) -> dict:
                t = {
                    k: int(m.get(k, 0))
                    for k in ("rows_in", "routed", "quarantined",
                              "dup_dropped", "n_sinks")
                }
                t["sink_blooms"] = blooms
                return t

            fsinks = set(
                add_sink_column(fresh)["sink"].unique().to_pylist()
            )
            blooms = m.get("sink_blooms")
            if blooms and not any(
                mf.bloom_any_maybe(b, fsinks) for b in blooms
            ):
                # bloom miss PROVES disjointness: O(new rows), no prior
                # bytes touched at all
                return fresh, 0, 0, totals(blooms)
            psinks = mf.read_bucket_sink_set(out_dir, bk)
            if psinks and not (fsinks & psinks):
                # bloom false positive (or no bloom) — exact column read
                # confirms disjointness; rebuild the bloom list exactly
                return fresh, 0, 0, totals([mf.sink_bloom(psinks)])
        old = mf.read_bucket_raw(out_dir, bk, EXCHANGE_COLS)
        if old is None or old.num_rows == 0:
            return fresh, 0, 0, None
        keep = [c for c in EXCHANGE_COLS if c in fresh.column_names]
        merged = pa.concat_tables([old.select(keep), fresh.select(keep)])
        return merged, int(m.get("dup_dropped", 0)), int(m.get("rows_in", 0)) - (
            int(m.get("routed", 0)) + int(m.get("quarantined", 0))
        ), None

    def _prior_state(bk: int) -> tuple[int, int, list[str]]:
        import glob as globmod

        if not (plan.merge and bk in prior):
            return 0, 0, []
        m = prior[bk]
        pd_ = int(m.get("dup_dropped", 0))
        pr_ = int(m.get("rows_in", 0)) - (
            int(m.get("routed", 0)) + int(m.get("quarantined", 0))
        )
        parts_: list[str] = []
        for kind in ("routed", "quarantine"):
            parts_ += globmod.glob(os.path.join(
                out_dir, kind, f"bucket={bk:05d}.*.parquet"
            ))
        return pd_, pr_, parts_

    phase_times: dict[str, float] = {}
    if exchange == "objstore":
        import glob as globmod
        import re

        import ray

        src = plan.read_path or input_path
        if isinstance(src, (list, tuple)):
            parts_in = sorted(src)
        elif os.path.isdir(src):
            parts_in = sorted(globmod.glob(
                os.path.join(src, "**", "*.parquet"), recursive=True
            ))
        elif os.path.exists(src):
            parts_in = [src]
        else:
            parts_in = []

        t0 = time.perf_counter()
        norm_refs: dict[int, list] = {}
        hot_blocks: dict[int, dict[int, list]] = {}
        turns_by_block: dict[tuple[int, int], list[np.ndarray]] = {}
        sizes: dict[int, int] = {}
        chunks: list[list[str]] = []
        if parts_in:
            n_cpus = tuning.available_cpus()
            # Task count: ~128 MB of input per map task, floored at one
            # task per CPU.  At high CPU counts the floor wins (one wave —
            # measured fastest at 32 CPUs: 32 tasks beat 64 and 128 on the
            # bench corpus); at low CPU counts the bytes rule wins, giving
            # multiple waves so one straggling 200+ MB group can't idle
            # the other cores (measured: 4 map tasks at 4 CPUs cost ~8%
            # of phase 1 to imbalance).  The bytes rule is also the
            # 100-TB guard: per-task heap stays bounded no matter the
            # cluster shape.
            by_bytes = -(-sum(os.path.getsize(p) for p in parts_in)
                         // (128 << 20))
            p1_factor = float(os.environ.get("GRAFT_P1_TASK_FACTOR", "1"))
            n_tasks = min(len(parts_in),
                          max(int(n_cpus * p1_factor), by_bytes))
            chunks = [parts_in[i::n_tasks] for i in range(n_tasks)]
            ex = ray.remote(make_exchange_map(
                num_buckets, hot_hashes, committed, turn_block=turn_block
            ))
            # every ref is recorded WITH the chunk that produced it: the
            # per-map recovery unit (VERDICT r3 #3) — a phase-2 task whose
            # get hits a lost/freed object re-runs just that chunk's
            # deterministic map inline and extracts its own slice
            for ci, (nr, hr, sums, sz) in enumerate(
                ray.get([ex.remote(c) for c in chunks])
            ):
                for bk, ref in nr.items():
                    norm_refs.setdefault(bk, []).append((ref, ci))
                for (bk, blk), ref in hr.items():
                    hot_blocks.setdefault(bk, {}).setdefault(
                        blk, []
                    ).append((ref, ci))
                for bk, blk, u in sums:
                    turns_by_block.setdefault((bk, blk), []).append(
                        np.asarray(u, dtype=np.int64)
                    )
                for bk, nb in sz.items():
                    sizes[bk] = sizes.get(bk, 0) + nb
        phase_times["phase1_sec"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        phase_times["p2_t0_abs"] = round(time.time(), 2)

        # chunk file lists ride the object store (driver-owned — the
        # driver outlives phase 2) and are fetched ONLY on a recovery
        chunks_ref = ray.put(chunks)
        rebuilder = make_bucket_rebuilder(
            num_buckets, hot_hashes, committed, turn_block=turn_block
        )

        if os.environ.get("GRAFT_TEST_FREE_EXCHANGE"):
            # test hook: drop half the exchange objects from plasma to
            # simulate phase-1 worker loss mid-run (the refs are GENUINELY
            # gone; phase 2 must recover via the per-map rebuild path)
            from ray._private.internal_api import free as _free

            drop = []
            for bk in sorted(norm_refs)[::2]:
                drop += [r for r, _ in norm_refs[bk]]
            for bk in sorted(hot_blocks):
                for blk in sorted(hot_blocks[bk])[::2]:
                    drop += [r for r, _ in hot_blocks[bk][blk]]
            _free(drop, local_only=False)

        emit_fn = hot_writer.emit_fn

        def fetch_or_rebuild(pairs, bucket: int, blk: int | None):
            """ray.get each (ref, chunk) pair; a lost/freed object is
            re-derived from its chunk files — the one-map recovery unit."""
            import ray as _r

            bufs, n_rb = [], 0
            for ref, ci in pairs:
                try:
                    bufs.append(_r.get(ref))
                except (_r.exceptions.ObjectLostError,
                        _r.exceptions.ObjectFreedError):
                    bufs.append(rebuilder(_r.get(chunks_ref)[ci], bucket, blk))
                    n_rb += 1
            return bufs, n_rb

        # ONE remote function for emits AND normal buckets: Ray queues
        # lease requests per scheduling class (function × resources), so
        # with separate classes the submitted-first hot emits were observed
        # starting ~4 s late behind the normal wave (last_emit_end at
        # t≈4.8 of a 5.8 s phase 2 at 16 CPUs, emit exec ≤0.45 s) — the
        # giant key's chain wall-bounded the phase.  A single class makes
        # the submission order (hot emits → largest buckets) the RUN order.
        @ray.remote
        def p2_task(kind: int, a, name, G, refs: list):
            if kind == 0:  # normal bucket; a = bucket id
                bufs, n_rb = fetch_or_rebuild(refs, a, None)
                tabs = [_unship(b) for b in bufs]
                fresh = pa.concat_tables(tabs, promote_options="default")
                merged, pd_, pr_, app = bucket_table(a, fresh)
                df = writer(merged, a, prior_dups=pd_, prior_rows=pr_,
                            append_totals=app)
                df["exchange_rebuilds"] = n_rb
                return df
            # hot emit; a = prior files for this turn block
            bk_, blk_ = (int(x) for x in name.split("."))
            bufs, n_rb = fetch_or_rebuild(refs, bk_, blk_)
            out = emit_fn(a, name, G, *bufs)
            out["rebuilds"] = n_rb
            return out

        # hot pseudo-buckets FIRST: gates resolve instantly from the
        # map-side summaries, so the giant key's emit blocks (the longest
        # phase-2 chain) hit the pool ahead of the normal wave
        hot_futs = []
        hot_all = set(hot_blocks)
        if plan.merge:  # a hot bucket may have prior rows but no new rows
            hot_all |= {b for b in prior if b >= num_buckets}
        for bk in sorted(hot_all):
            _pd, _pr, pparts = _prior_state(bk)
            prior_by_block: dict[int, list[str]] = {}
            for p in pparts:
                m = re.match(r"bucket=\d+\.(\d+)\.parquet$",
                             os.path.basename(p))
                if m:
                    prior_by_block.setdefault(int(m.group(1)), []).append(p)
            new_blocks = hot_blocks.get(bk, {})
            blocks = sorted(set(new_blocks) | set(prior_by_block))
            if not blocks:
                continue
            tg = time.perf_counter()
            infos = []
            for blk in blocks:
                arrays = list(turns_by_block.get((bk, blk), []))
                for p in prior_by_block.get(blk, []):
                    arrays.append(hot_writer.scan_file(p))
                infos.append(hot_writer.block_info(arrays))
            G = hot_writer.combine_gate(infos)
            phase_times["hot_gate_sec"] = round(
                phase_times.get("hot_gate_sec", 0.0)
                + time.perf_counter() - tg, 3
            )
            emits = [
                p2_task.remote(
                    1, prior_by_block.get(blk, []), f"{bk:05d}.{blk:04d}",
                    G, list(new_blocks.get(blk, [])),
                )
                for blk in blocks
            ]
            hot_futs.append(hot_writer.finalize.remote(
                bk, blocks, _pd, _pr, time.perf_counter(), *emits
            ))
        # largest normal buckets first: fat buckets start at t=0 instead
        # of landing in the last wave and wall-bounding phase 2
        norm_todo = sorted(norm_refs, key=lambda b: sizes.get(b, 0),
                           reverse=True)
        norm_futs = [p2_task.remote(0, b, None, None, norm_refs[b])
                     for b in norm_todo]
        ran_parts = ray.get(norm_futs) + ray.get(hot_futs)
        norm_refs.clear()   # release exchange objects
        hot_blocks.clear()
        ran = pd.concat(ran_parts) if ran_parts else pd.DataFrame()
        phase_times["phase2_sec"] = round(time.perf_counter() - t0, 3)
    elif exchange == "spill":
        import ray

        ds = build_ds()
        spill_root = _spill_dir(out_dir)
        shutil.rmtree(spill_root, ignore_errors=True)
        # phase 1: partition to disk — parallel map tasks, no all-to-all
        # large rebatch: fewer, bigger spill slices per bucket (256 tiny
        # files/bucket at 21M rows cost ~1.3 s/bucket of read overhead).
        # The exchange barrier itself is inherent (any input batch can feed
        # any bucket), but the GIANT KEY's gate pass must not serialize
        # behind it: each spill task returns its hot files' unique-turn
        # summaries as the map output (map-side combiner — the rows are in
        # memory anyway), so every hot gate is resolved the instant the
        # barrier closes, at zero extra I/O.  (Two prior shapes measured
        # worse: post-barrier scans of ~10⁴ tiny hot files added ~1.5 s;
        # driver-thread scans polling mid-phase-1 kept up only at 32 CPUs
        # and starved the gate at lower CPU counts.)
        t0 = time.perf_counter()
        summary_rows = ds.map_batches(
            make_spiller(out_dir, num_buckets, turn_block=turn_block),
            batch_format="pyarrow",
            zero_copy_batch=True, batch_size=400_000,
        ).take_all()
        # Driver-memory bound (VERDICT r4 watch item): this dict holds one
        # entry per (hot spill file × turn block) with a unique-turn int64
        # array ≤ turn_block long — ~8·turn_block bytes per hot file, i.e.
        # O(hot_rows / num_buckets) total, NOT O(corpus).  It grows past
        # driver comfort only if a large fraction of sinks trips the hot
        # threshold; at that point raise `hot_min_rows` (fewer sinks
        # classify hot) or `turn_block` (fewer, larger summaries) — or
        # spill the summaries next to their buckets and gate from disk,
        # which re-adds the ~1.5 s post-barrier scan this map-side
        # combiner exists to avoid.
        file_turns: dict[str, np.ndarray] = {
            r["file"]: np.asarray(r["turns"], dtype=np.int64)
            for r in summary_rows
        }
        phase_times["phase1_sec"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()

        # phase 2: one ordinary Ray task per spilled bucket.  (The Dataset
        # API can't express "one task per on-disk partition, no re-shuffle";
        # this is the documented drop-to-ray-tasks case.)
        spill_emit_fn = hot_writer.emit_fn

        # one scheduling class for emits + normal buckets, same reason as
        # the objstore path: separate classes let the normal wave starve
        # the submitted-first hot emits (see the objstore p2_task note)
        @ray.remote
        def p2_spill_task(kind: int, a, name, G):
            if kind == 1:  # hot emit; a = this turn block's spill files
                return spill_emit_fn(a, name, G)
            d = os.path.join(spill_root, f"bucket={a:05d}")
            fresh = pa.concat_tables(
                [
                    _read_spill_file(os.path.join(d, f))
                    for f in sorted(os.listdir(d))
                    if not f.startswith(".")
                ],
                promote_options="default",
            )
            merged, pd_, pr_, app = bucket_table(a, fresh)
            return writer(merged, a, prior_dups=pd_, prior_rows=pr_,
                          append_totals=app)

        def _dir_bytes(bk: int) -> int:
            d = os.path.join(spill_root, f"bucket={bk:05d}")
            return sum(e.stat().st_size for e in os.scandir(d))

        todo = (
            [
                int(name.split("=")[1])
                for name in os.listdir(spill_root)
                if name.startswith("bucket=")
            ]
            if os.path.isdir(spill_root)
            else []
        )
        # largest buckets first: fat buckets start at t=0 instead of landing
        # in the last wave and wall-bounding phase 2
        todo.sort(key=_dir_bytes, reverse=True)
        hot_todo = [b for b in todo if b >= num_buckets]
        norm_todo = [b for b in todo if b < num_buckets]

        # hot pseudo-buckets FIRST: their gates resolve instantly from the
        # map-side summaries, so the giant key's emit blocks (the longest
        # phase-2 chain) hit the pool ahead of the normal wave
        hot_futs = []
        for bk in hot_todo:
            d = os.path.join(spill_root, f"bucket={bk:05d}")
            _pd, _pr, pparts = _prior_state(bk)
            groups = hot_writer.group_files(d, pparts)
            blocks = sorted(groups)
            tg = time.perf_counter()
            infos = []
            for b in blocks:
                # prior output parts (incremental merge) carry no map-side
                # summary — scan_file them here (few: one per block)
                infos.append(hot_writer.block_info([
                    file_turns[f] if f in file_turns
                    else hot_writer.scan_file(f)
                    for f in groups[b]
                ]))
            G = hot_writer.combine_gate(infos)
            phase_times["hot_gate_sec"] = round(
                phase_times.get("hot_gate_sec", 0.0)
                + time.perf_counter() - tg, 3
            )
            emits = [
                p2_spill_task.remote(1, groups[b], f"{bk:05d}.{b:04d}", G)
                for b in blocks
            ]
            hot_futs.append(hot_writer.finalize.remote(
                bk, blocks, _pd, _pr, time.perf_counter(), *emits
            ))
        norm_futs = [p2_spill_task.remote(0, b, None, None)
                     for b in norm_todo]
        ran_parts = ray.get(norm_futs) + ray.get(hot_futs)
        ran = pd.concat(ran_parts) if ran_parts else pd.DataFrame()
        phase_times["phase2_sec"] = round(time.perf_counter() - t0, 3)
        shutil.rmtree(spill_root, ignore_errors=True)
    else:
        def hot_grouped(t: pa.Table, bk: int, pd_: int,
                        pr_: int) -> pd.DataFrame:
            """raydata-mode giant-key path: the group task holds every row
            of the hot sink, so the gate is one numpy pass; the heavy work
            (dedup + derive + write per turn block) fans out to nested
            emit tasks — the map_groups task never sorts/gathers the giant
            text column itself (which measured ~19 s single-task)."""
            import ray

            t0 = time.perf_counter()
            turns = t["turn_idx"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            u = np.unique(turns)
            gaps = np.flatnonzero(np.diff(u) != 1)
            G = int(u[gaps[0]] + 1) if gaps.size else None
            tb = turns // turn_block
            order = np.argsort(tb, kind="stable")
            ts_ = t.take(pa.array(order))
            tbs = tb[order]
            starts = np.flatnonzero(np.r_[True, tbs[1:] != tbs[:-1]])
            ends = np.append(starts[1:], len(tbs))
            blocks = [int(tbs[s]) for s in starts]
            emits = [
                hot_writer.emit.remote(
                    [], f"{bk:05d}.{blk:04d}", G,
                    _ship(ts_.slice(s, e - s)),
                )
                for blk, s, e in zip(blocks, starts, ends)
            ]
            return ray.get(hot_writer.finalize.remote(
                bk, blocks, pd_, pr_, t0, *emits
            ))

        def grouped_writer(t: pa.Table) -> pd.DataFrame:
            bk = int(t["bucket"][0].as_py())
            merged, pd_, pr_, app = bucket_table(
                bk, t.drop_columns(["bucket"])
            )
            if bk >= num_buckets:
                return hot_grouped(merged, bk, pd_, pr_)
            return writer(merged, bk, prior_dups=pd_, prior_rows=pr_,
                          append_totals=app)

        ds = build_ds()
        metrics = ds.groupby("bucket").map_groups(
            grouped_writer, batch_format="pyarrow"
        )
        ran = metrics.to_pandas()  # tiny: one row per processed bucket

    mf.finish_run(out_dir, plan)
    all_manifests = mf.load_manifests(out_dir)
    report = {
        "buckets_total": len(all_manifests),
        "buckets_this_run": int(len(ran)),
        "buckets_skipped": len(committed) if not plan.merge else 0,
        "incremental": bool(plan.merge),
        "rows_in": sum(m["rows_in"] for m in all_manifests),
        "routed": sum(m["routed"] for m in all_manifests),
        "quarantined": sum(m["quarantined"] for m in all_manifests),
        "dup_dropped": sum(m["dup_dropped"] for m in all_manifests),
        "n_sinks": sum(m["n_sinks"] for m in all_manifests),
        **phase_times,
    }
    if len(ran) and "wall_sec" in ran.columns:
        # phase-2 tail telemetry: the last wave's slowest tasks bound the
        # wall — keep the top of the per-bucket distribution in the report
        top = ran.nlargest(6, "wall_sec")
        extra = [c for c in ("emit_wall_max", "emit_wall_sum",
                             "last_emit_end", "finalize_sec")
                 if c in ran.columns]
        report["p2_task_walls_top"] = [
            {"bucket": int(r["bucket"]), "wall": round(r["wall_sec"], 2),
             "rows": int(r["rows_in"]),
             **{c: round(r[c], 2) for c in extra if pd.notna(r[c])}}
            for _, r in top.iterrows()
        ]
        report["p2_task_wall_p50"] = round(float(ran["wall_sec"].median()), 3)
        report["p2_task_wall_sum"] = round(float(ran["wall_sec"].sum()), 2)
    if len(ran) and "exchange_rebuilds" in ran.columns:
        # per-map recovery telemetry: nonzero = lost exchange objects were
        # re-derived from their chunk's deterministic map (never a rerun)
        report["exchange_rebuilds"] = int(
            ran["exchange_rebuilds"].fillna(0).sum()
        )
    return report


def watch_and_run(input_path: str, out_dir: str, poll_sec: float = 5.0,
                  max_iters: int | None = None, stop_after_idle: int | None = None,
                  **run_kwargs) -> list[dict]:
    """The reference's operating loop (datapump/.../CacheWatcher.java:25-43
    + the decoder's poll cycle): poll the input directory; when the part
    set changes, run the pipeline INCREMENTALLY (only new parts read,
    affected buckets merged).  Returns the reports of the runs executed.

    ``max_iters`` bounds polls (tests); ``stop_after_idle`` exits after N
    consecutive unchanged polls (the reference idles on a 5 s sleep
    forever — agent/.../LogAgent.java:28,96-101)."""
    reports: list[dict] = []
    last_gen = None
    idle = 0
    iters = 0
    while True:
        gen_now = mf.parts_gen(mf.scan_parts(input_path))
        if gen_now != last_gen:
            reports.append(run_flagship(input_path, out_dir, **run_kwargs))
            last_gen = gen_now
            idle = 0
        else:
            idle += 1
        iters += 1
        if max_iters is not None and iters >= max_iters:
            break
        if stop_after_idle is not None and idle >= stop_after_idle:
            break
        if poll_sec:
            time.sleep(poll_sec)
    return reports


def read_sink_counts(out_dir: str) -> pd.DataFrame:
    """Aggregate result of a run: per-sink (n_rows, max_counter)."""
    import pyarrow.dataset as pads

    d = os.path.join(out_dir, "sink_counts")
    return pads.dataset(d, format="parquet").to_table().to_pandas()


def write_sink_files(out_dir: str, sinks_dir: str | None = None,
                     max_sinks: int = 100_000) -> int:
    """Optional one-file-per-sink fan-out: materialize exactly one text file
    per sink (``{sink}.log``, turns in order) from the bucket-partitioned
    routed output — the reference's literal per-key artifact
    (DataPumpDecoderSort.java:93-97, ServerLog/{id}.{session}).  Guarded by
    ``max_sinks``: at corpus scale one-file-per-conversation is a filesystem
    DoS, which is exactly why the flagship's primary representation is
    bucket-partitioned; this exists for reference-parity consumption at
    small cardinality.  Returns the number of files written."""
    import glob

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    import ray

    sinks_dir = sinks_dir or os.path.join(out_dir, "sinks")
    # sink_counts holds one row per sink, and a sink lives in exactly one
    # bucket — total sinks is just the row count of the counts output
    total = sum(
        pq.read_metadata(p).num_rows
        for p in glob.glob(os.path.join(out_dir, "sink_counts", "*.parquet"))
    )
    if total > max_sinks:
        raise ValueError(
            f"{total} sinks > max_sinks={max_sinks}: refusing one-file-per-sink "
            "fan-out at this cardinality; consume the bucket-partitioned output"
        )
    os.makedirs(sinks_dir, exist_ok=True)

    @ray.remote
    def fan_out(part: str) -> int:
        t = pq.read_table(part, columns=["sink", "turn_idx", "text"])
        idx = pc.sort_indices(
            t, sort_keys=[("sink", "ascending"), ("turn_idx", "ascending")]
        )
        t = t.take(idx)
        sinks = t["sink"].to_pandas().to_numpy()
        texts = t["text"].to_pandas().to_numpy()
        starts = np.flatnonzero(np.r_[True, sinks[1:] != sinks[:-1]])
        ends = np.append(starts[1:], len(sinks))
        for s, e in zip(starts, ends):
            path = os.path.join(sinks_dir, f"{sinks[s]}.log")
            tmp = f"{path}.tmp-{os.getpid()}"
            with open(tmp, "w") as f:
                f.write("\n".join(texts[s:e]))
                f.write("\n")
            os.replace(tmp, path)
        return len(starts)

    parts = sorted(glob.glob(os.path.join(out_dir, "routed", "*.parquet")))
    return int(sum(ray.get([fan_out.remote(p) for p in parts])))
