"""Per-partition lineage manifests — the checkpoint/resume + incremental-
ingest state (SURVEY §2.4 T2, §4 checkpoint/resume).

The reference persists one ``.lastSeq`` file per (id, session) after each
append and rebuilds its in-memory watermark map by scanning at startup
(datadecoder/.../SequenceTracker.java:132-154, 43-68), with a documented
duplicate window between append and checkpoint (DataPumpDecoderSort.java:
45-51).  Its operating loop is incremental: new chunks appear, only they are
decoded, per-key watermarks advance (CacheWatcher.java:36-41).

The batch recast:

* **Unit of commit** is a whole hash-bucket partition: all outputs written
  under deterministic names, then sealed by an atomically-renamed manifest
  JSON.  Task retries and job restarts are indistinguishable.
* **Generation tag**: every bucket manifest records the ``gen`` — a hash of
  the exact set of input parts it covers.  A bucket is up to date iff its
  gen matches the current target gen; ``run.json`` records the part set the
  *whole output* covers and is advanced only when every bucket has reached
  the target gen (finish_run).
* **Incremental ingest**: when the previous part set is a strict subset of
  the current one (files only appended — the reference's operating mode),
  the run reads ONLY the new parts; buckets receiving new rows are merged
  (prior routed+quarantine rows re-read from the bucket's own output,
  re-gated together with the fresh rows — first-wins dedup makes the merge
  idempotent), untouched buckets are bumped to the new gen without rewrite.
* **Duplicate window** (reference parity): if a merge crashes between a
  bucket's output rewrite and its manifest commit, the replayed merge
  re-applies the new rows; row outputs converge (dedup) but the
  ``dup_dropped`` metric can over-count for that bucket — the same
  append-vs-checkpoint window the reference documents.
* Any *changed or removed* part invalidates everything: all bucket
  manifests AND all bucket output files are removed (stale buckets would
  otherwise survive under an input they were not built from).
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass, field


MANIFEST_DIR = "_manifests"
RUN_FILE = "run.json"
OUTPUT_KINDS = ("routed", "quarantine", "sink_counts", "docs")


def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, MANIFEST_DIR)


def atomic_write_json(path: str, payload: dict) -> None:
    """tmp + rename — the reference's ATOMIC_MOVE commit pattern
    (agent/.../DataPumpImpl.java:43-64)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(payload, f, sort_keys=True)
    os.replace(tmp, path)


def scan_parts(input_path: str) -> dict[str, str]:
    """Content identity of every input part: relpath → "size|mtime_ns",
    walking the directory RECURSIVELY (nested part dirs are read by
    read_parquet, so they must be visible to the fingerprint)."""
    parts: dict[str, str] = {}
    if os.path.isdir(input_path):
        for root, _dirs, files in os.walk(input_path):
            for name in files:
                if name.endswith(".parquet"):
                    p = os.path.join(root, name)
                    st = os.stat(p)
                    parts[os.path.relpath(p, input_path)] = (
                        f"{st.st_size}|{st.st_mtime_ns}"
                    )
    else:
        st = os.stat(input_path)
        parts[os.path.basename(input_path)] = f"{st.st_size}|{st.st_mtime_ns}"
    return parts


def parts_gen(parts: dict[str, str]) -> str:
    """The generation id: hash of the exact (name, size, mtime) part set."""
    import hashlib

    blob = "\n".join(f"{k}|{v}" for k, v in sorted(parts.items()))
    return hashlib.blake2b(blob.encode(), digest_size=12).hexdigest()


def input_fingerprint(input_path: str) -> str:
    """Back-compat alias: fingerprint of the whole input."""
    return parts_gen(scan_parts(input_path))


@dataclass
class RunPlan:
    """What init_run decided: which buckets may be reused, whether this run
    merges new parts into prior outputs, and what input to read."""

    gen: str
    parts: dict[str, str]
    reuse_buckets: bool = False
    merge: bool = False
    read_path: object = None  # None → full input; list[str] → new parts only
    new_parts: list = field(default_factory=list)
    # persisted hot-sink hashes: STABLE for the lifetime of an output dir so
    # pseudo-bucket identity never shifts between incremental runs
    hot_hashes: list = field(default_factory=list)


def _purge_outputs(out_dir: str) -> None:
    """Full invalidation: prior bucket outputs are stale for the new input —
    remove them alongside the manifests (a bucket receiving no rows under
    the new input would otherwise silently keep old rows)."""
    import shutil

    d = _manifest_dir(out_dir)
    if os.path.isdir(d):
        for name in os.listdir(d):
            if name.startswith("bucket="):
                os.remove(os.path.join(d, name))
    for kind in OUTPUT_KINDS:
        shutil.rmtree(os.path.join(out_dir, kind), ignore_errors=True)


def init_run(out_dir: str, num_buckets: int, input_path: str,
             incremental: bool = True,
             hot_hashes: list[int] | None = None) -> RunPlan:
    """Record run-level invariants and plan the run.  A resume with
    different bucketing is an error (partition identity would change).
    ``hot_hashes`` is the CURRENT hot-sink detection — stored on fresh or
    invalidated runs; resumed/merged runs return the stored set instead
    (pseudo-bucket identity must not shift under committed output)."""
    from ..stages.route import HASH_KERNEL

    path = os.path.join(_manifest_dir(out_dir), RUN_FILE)
    parts = scan_parts(input_path)
    gen = parts_gen(parts)
    hot_now = [int(h) for h in (hot_hashes or [])]
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        if prev["num_buckets"] != num_buckets:
            raise ValueError(
                f"resume with num_buckets={num_buckets} but run was started "
                f"with {prev['num_buckets']} — bucket identity would change"
            )
        if prev.get("hash_kernel") != HASH_KERNEL:
            # bucket layout is a function of the hash kernel: committed
            # partitions from a different kernel (polars upgrade, or a
            # pre-kernel-swap manifest) would be mis-skipped — full restart,
            # and the stored hot hashes are stale too (recompute = hot_now)
            _purge_outputs(out_dir)
            atomic_write_json(
                path, {"num_buckets": num_buckets, "input_path": input_path,
                       "parts": parts, "gen": gen,
                       "hash_kernel": HASH_KERNEL,
                       "hot_hashes": [str(h) for h in hot_now]},
            )
            return RunPlan(gen=gen, parts=parts, reuse_buckets=True,
                           hot_hashes=hot_now)
        prev_parts: dict = prev.get("parts", {})
        prev_hot = [int(h) for h in prev.get("hot_hashes", [])]
        if prev.get("gen") == gen:
            return RunPlan(gen=gen, parts=parts, reuse_buckets=True,
                           hot_hashes=prev_hot)
        unchanged = all(parts.get(k) == v for k, v in prev_parts.items())
        # merge is only safe when the previous part set was FULLY committed
        # (finish_run ran): otherwise a bucket with no manifest cannot be
        # told apart from a crashed one, and merging only the new parts
        # would silently drop its old rows.
        if incremental and prev_parts and unchanged and prev.get("complete"):
            # files were only APPENDED → incremental merge of the new parts
            new = sorted(set(parts) - set(prev_parts))
            return RunPlan(
                gen=gen, parts=parts, reuse_buckets=True, merge=True,
                read_path=[os.path.join(input_path, p) for p in new],
                new_parts=new, hot_hashes=prev_hot,
            )
        # parts changed or removed (or incremental disabled): full restart
        _purge_outputs(out_dir)
        atomic_write_json(
            path, {"num_buckets": num_buckets, "input_path": input_path,
                   "parts": parts, "gen": gen,
                   "hash_kernel": HASH_KERNEL,
                   "hot_hashes": [str(h) for h in hot_now]},
        )
        return RunPlan(gen=gen, parts=parts, reuse_buckets=True,
                       hot_hashes=hot_now)
    atomic_write_json(
        path, {"num_buckets": num_buckets, "input_path": input_path,
               "parts": parts, "gen": gen,
               "hash_kernel": HASH_KERNEL,
               "hot_hashes": [str(h) for h in hot_now]},
    )
    return RunPlan(gen=gen, parts=parts, reuse_buckets=True,
                   hot_hashes=hot_now)


def finish_run(out_dir: str, plan: RunPlan) -> None:
    """Seal a run: bump untouched buckets to the target gen (they received
    no new rows, so their outputs are valid for the new part set), advance
    run.json and mark it complete — the precondition for a later
    incremental merge.  Only called after every bucket task succeeded."""
    d = _manifest_dir(out_dir)
    if plan.merge:
        for name in sorted(os.listdir(d)):
            if name.startswith("bucket=") and name.endswith(".json"):
                p = os.path.join(d, name)
                with open(p) as f:
                    m = json.load(f)
                if m.get("gen") != plan.gen:
                    m["gen"] = plan.gen
                    atomic_write_json(p, m)
    run_path = os.path.join(d, RUN_FILE)
    with open(run_path) as f:
        prev = json.load(f)
    prev["parts"] = plan.parts
    prev["gen"] = plan.gen
    prev["complete"] = True
    atomic_write_json(run_path, prev)


def commit_bucket(out_dir: str, bucket: int, payload: dict,
                  gen: str | None = None) -> None:
    atomic_write_json(
        os.path.join(_manifest_dir(out_dir), f"bucket={bucket:05d}.json"),
        {"bucket": bucket, "gen": gen, **payload},
    )


def committed_buckets(out_dir: str, gen: str | None = None) -> set[int]:
    """Buckets whose manifest is committed — restricted to generation
    ``gen`` when given (a bucket from an older part set is NOT committed
    for the current target)."""
    d = _manifest_dir(out_dir)
    if not os.path.isdir(d):
        return set()
    out = set()
    for name in os.listdir(d):
        if name.startswith("bucket=") and name.endswith(".json"):
            if gen is not None:
                with open(os.path.join(d, name)) as f:
                    if json.load(f).get("gen") != gen:
                        continue
            out.add(int(name[len("bucket=") : -len(".json")]))
    return out


def load_manifests(out_dir: str) -> list[dict]:
    d = _manifest_dir(out_dir)
    if not os.path.isdir(d):
        return []
    out = []
    for name in sorted(os.listdir(d)):
        if name.startswith("bucket=") and name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                out.append(json.load(f))
    return out


def sink_bloom(sinks, m_bits: int | None = None, k: int = 4) -> dict:
    """Compact membership digest of a bucket's sink set, stored in the
    bucket manifest so append-merge detection normally costs O(new rows)
    instead of a prior-output column read.  Kirsch-Mitzenmacher double
    hashing over the deterministic cross-process siphash
    (stages.route.stable_hash); m defaults to ~16 bits/sink (≈2-3% false
    positives — a false positive only causes a harmless exact re-check).
    Returns {"m": bits, "k": k, "b64": bitset}."""
    import base64

    import numpy as np

    from ..stages.route import stable_hash

    sinks = list(sinks)
    n = max(1, len(sinks))
    if m_bits is None:
        m_bits = 1 << max(10, int(np.ceil(np.log2(16 * n))))
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    if sinks:
        h1 = stable_hash(np.asarray(sinks, dtype=object))
        h2 = (h1 * np.uint64(0x9E3779B97F4A7C15)) ^ (h1 >> np.uint64(32))
        for i in range(k):
            idx = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
            np.bitwise_or.at(bits, (idx >> np.uint64(3)).astype(np.int64),
                             np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8))
    return {"m": int(m_bits), "k": int(k),
            "b64": base64.b64encode(bits.tobytes()).decode()}


def bloom_any_maybe(bloom: dict, sinks) -> bool:
    """True iff ANY of ``sinks`` may be in the bloom (no false negatives:
    a False return PROVES disjointness)."""
    import base64

    import numpy as np

    from ..stages.route import stable_hash

    sinks = list(sinks)
    if not sinks:
        return False
    bits = np.frombuffer(base64.b64decode(bloom["b64"]), dtype=np.uint8)
    m_bits = np.uint64(bloom["m"])
    h1 = stable_hash(np.asarray(sinks, dtype=object))
    h2 = (h1 * np.uint64(0x9E3779B97F4A7C15)) ^ (h1 >> np.uint64(32))
    maybe = np.ones(len(sinks), dtype=bool)
    for i in range(int(bloom["k"])):
        idx = (h1 + np.uint64(i) * h2) % m_bits
        got = (bits[(idx >> np.uint64(3)).astype(np.int64)]
               >> (idx & np.uint64(7)).astype(np.uint8)) & 1
        maybe &= got.astype(bool)
    return bool(maybe.any())


def read_bucket_sink_set(out_dir: str, bucket: int):
    """Append-merge detection input: the set of sinks already present in
    the bucket's committed output — a one-COLUMN read (dictionary-encoded
    zstd), orders of magnitude cheaper than the full-row re-read it lets
    the merge skip.  Returns None when the bucket has no output files."""
    import glob

    import pyarrow.parquet as pq

    sinks: set[str] = set()
    found = False
    for kind in ("routed", "quarantine"):
        for p in sorted(glob.glob(
            os.path.join(out_dir, kind, f"bucket={bucket:05d}*.parquet")
        )):
            found = True
            t = pq.read_table(p, columns=["sink"])
            sinks.update(t["sink"].unique().to_pylist())
    return sinks if found else None


def read_bucket_raw(out_dir: str, bucket: int, raw_cols: list[str]):
    """Incremental-merge input: the bucket's prior committed rows (routed +
    quarantine), restricted to the raw exchange columns so the merge re-runs
    the same derive path as a clean run."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    tables = []
    for kind in ("routed", "quarantine"):
        # fat buckets are written as bucket=NNNNN.SSS slice parts
        for p in sorted(glob.glob(
            os.path.join(out_dir, kind, f"bucket={bucket:05d}*.parquet")
        )):
            t = pq.read_table(p)
            tables.append(t.select([c for c in raw_cols if c in t.column_names]))
    if not tables:
        return None
    return pa.concat_tables(tables, promote_options="default")
