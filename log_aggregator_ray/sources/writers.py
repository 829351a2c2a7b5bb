"""Resumable partitioned-parquet sink (SURVEY §2.2 K1/K2/K3 generalized
beyond the flagship): write ANY Dataset as hash-bucketed parquet with
atomic deterministic file names and per-bucket commit manifests, so a
crashed or re-run write skips finished partitions instead of starting
over — the "never one giant file, always resumable" output contract the
100-TB brief requires (reference parity: the decoder's idempotent
deterministic-name appends, DataPumpDecoderSort.java:93-97 +
SequenceTracker.java:132-154).

Shape: one groupby(bucket) exchange; each bucket's rows land in exactly
one worker task which writes ``bucket=NNNNN.parquet`` via tmp+rename and
then commits ``_manifests/bucket-NNNNN.json`` (the rename is the commit
point — K1).  A resumed call drops rows of committed buckets inside the
map stage, before the exchange, so finished partitions cost no shuffle
bytes on the rerun.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..stages.route import stable_hash

_NO_STATS_COLS = ("text", "tool", "assembled_text", "tool_cmd")


def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifests")


def committed_buckets(out_dir: str) -> set[int]:
    """BASE-write commit state only — append manifests
    (``bucket-NNNNN.a<tag>.json``) track their own batches and must not
    make a never-base-written bucket look committed."""
    import re

    d = _manifest_dir(out_dir)
    if not os.path.isdir(d):
        return set()
    out = set()
    for f in os.listdir(d):
        m = re.fullmatch(r"bucket-(\d+)\.json", f)
        if m:
            out.add(int(m.group(1)))
    return out


def read_manifests(out_dir: str) -> list[dict]:
    d = _manifest_dir(out_dir)
    if not os.path.isdir(d):
        return []
    rows = []
    for f in sorted(os.listdir(d)):
        if f.startswith("bucket-") and f.endswith(".json"):
            with open(os.path.join(d, f)) as fh:
                rows.append(json.load(fh))
    return rows


def write_bucketed_parquet(ds, out_dir: str, key_col: str,
                           num_buckets: int = 64, resume: bool = True,
                           codec: str = "zstd") -> dict:
    """Write ``ds`` as ``num_buckets`` hash-partitioned parquet files
    keyed by ``key_col`` (all rows of one key land in one file — the
    per-key locality downstream consumers rely on).  Returns a summary
    dict ``{buckets, rows, skipped}``.

    Resume contract: a bucket whose manifest exists is skipped entirely
    (its rows are dropped map-side, pre-exchange); buckets without a
    manifest are (re)written from scratch — the tmp+rename write makes a
    half-written file invisible, so reruns converge to the exact same
    bytes per bucket regardless of where a crash landed."""
    import pyarrow.parquet as pq

    from ..stages.route import HASH_KERNEL

    os.makedirs(_manifest_dir(out_dir), exist_ok=True)
    # resuming with a different partitioning would mis-skip buckets —
    # refuse (the flagship's init_run contract, state/manifest.py).  The
    # hash kernel is part of the partitioning identity: committed buckets
    # from a different kernel hold different key sets under the same name.
    meta_path = os.path.join(_manifest_dir(out_dir), "meta.json")
    meta = {"key_col": key_col, "num_buckets": int(num_buckets),
            "hash_kernel": HASH_KERNEL}
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            prev = json.load(fh)
        if resume and prev != meta:
            raise ValueError(
                f"resume with changed partitioning: committed={prev}, "
                f"requested={meta}; use resume=False or a fresh out_dir"
            )
    if not resume:
        # a fresh (non-resumed) write must not inherit stale state: with
        # fewer buckets, leftover bucket files would be read back as mixed
        # old+new rows and their manifests would count as committed under
        # the new meta on a later resume (ADVICE r3) — delete both first
        for f in os.listdir(out_dir):
            if f.startswith("bucket=") and f.endswith(".parquet"):
                os.remove(os.path.join(out_dir, f))
        for f in os.listdir(_manifest_dir(out_dir)):
            if f.startswith("bucket-") and f.endswith(".json"):
                os.remove(os.path.join(_manifest_dir(out_dir), f))
    tmp_meta = f"{meta_path}.tmp-{os.getpid()}"
    with open(tmp_meta, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp_meta, meta_path)
    done = committed_buckets(out_dir) if resume else set()
    skip = np.array(sorted(done), dtype=np.int64) if done else None

    def bucketize(t: pa.Table) -> pa.Table:
        b = (stable_hash(t[key_col]) % num_buckets).astype(np.int64)
        if skip is not None:
            keep = ~np.isin(b, skip)
            t = t.filter(pa.array(keep))
            b = b[keep]
        return t.append_column("_bucket", pa.array(b, pa.int64()))

    def write_bucket(t: pa.Table) -> pd.DataFrame:
        bk = int(t["_bucket"][0].as_py())
        t = t.drop_columns(["_bucket"])
        path = os.path.join(out_dir, f"bucket={bk:05d}.parquet")
        tmp = f"{path}.tmp-{os.getpid()}"
        stats = [c for c in t.column_names if c not in _NO_STATS_COLS]
        pq.write_table(t, tmp, compression=codec,
                       write_statistics=stats or False)
        os.replace(tmp, path)  # K1: atomic commit of the data file
        man = {"bucket": bk, "rows": int(t.num_rows),
               "bytes": int(os.path.getsize(path))}
        mtmp = os.path.join(_manifest_dir(out_dir),
                            f".bucket-{bk:05d}.tmp-{os.getpid()}")
        with open(mtmp, "w") as fh:
            json.dump(man, fh)
        os.replace(mtmp, os.path.join(_manifest_dir(out_dir),
                                      f"bucket-{bk:05d}.json"))
        return pd.DataFrame([man])

    ds = ds.map_batches(bucketize, batch_format="pyarrow",
                        zero_copy_batch=True)
    ran = ds.groupby("_bucket").map_groups(
        write_bucket, batch_format="pyarrow"
    ).to_pandas()  # tiny: one row per written bucket
    return {
        "buckets": int(len(ran)),
        "rows": int(ran["rows"].sum()) if len(ran) else 0,
        "skipped": len(done),
    }


def read_bucketed_parquet(out_dir: str, columns: list[str] | None = None):
    """Read a write_bucketed_parquet output back as a Dataset."""
    from .readers import _clean_read_parquet

    return _clean_read_parquet(out_dir, columns=columns)


def append_bucketed_parquet(ds, out_dir: str, key_col: str,
                            batch_tag: str, codec: str = "zstd") -> dict:
    """APPEND rows to an existing bucketed-parquet output (the operating
    loop's "add today's survivors to the corpus index"): each bucket's
    new rows land in ``bucket=NNNNN.a<tag>.parquet`` beside the existing
    files — prior files are never rewritten — sealed by a
    ``bucket-NNNNN.a<tag>.json`` manifest.  ``batch_tag`` identifies the
    ingest batch deterministically (e.g. the input fingerprint): re-running
    the same append skips buckets whose tagged manifest exists, so the
    append is idempotent per (bucket, batch).

    Partitioning (key, num_buckets, hash kernel) must match the base
    write's meta — same contract as resume.  Consumers that read whole
    buckets must glob ``bucket=NNNNN*.parquet`` (read_bucketed_parquet
    and dedup_against_index do)."""
    import re

    import pyarrow.parquet as pq

    from ..stages.route import HASH_KERNEL

    if not re.fullmatch(r"[A-Za-z0-9_-]{1,64}", batch_tag):
        raise ValueError("batch_tag must be [A-Za-z0-9_-]{1,64}")
    meta_path = os.path.join(_manifest_dir(out_dir), "meta.json")
    with open(meta_path) as fh:
        meta = json.load(fh)
    if meta.get("key_col") != key_col or meta.get("hash_kernel") != HASH_KERNEL:
        raise ValueError(
            f"append with changed partitioning: committed={meta}, "
            f"requested key_col={key_col!r} kernel={HASH_KERNEL!r}"
        )
    num_buckets = int(meta["num_buckets"])
    done = set()
    for f in os.listdir(_manifest_dir(out_dir)):
        m = re.fullmatch(rf"bucket-(\d+)\.a{re.escape(batch_tag)}\.json", f)
        if m:
            done.add(int(m.group(1)))
    skip = np.array(sorted(done), dtype=np.int64) if done else None

    def bucketize(t: pa.Table) -> pa.Table:
        b = (stable_hash(t[key_col]) % num_buckets).astype(np.int64)
        if skip is not None:
            keep = ~np.isin(b, skip)
            t = t.filter(pa.array(keep))
            b = b[keep]
        return t.append_column("_bucket", pa.array(b, pa.int64()))

    def write_bucket(t: pa.Table) -> pd.DataFrame:
        bk = int(t["_bucket"][0].as_py())
        t = t.drop_columns(["_bucket"])
        path = os.path.join(out_dir, f"bucket={bk:05d}.a{batch_tag}.parquet")
        tmp = f"{path}.tmp-{os.getpid()}"
        stats = [c for c in t.column_names if c not in _NO_STATS_COLS]
        pq.write_table(t, tmp, compression=codec,
                       write_statistics=stats or False)
        os.replace(tmp, path)
        man = {"bucket": bk, "rows": int(t.num_rows),
               "bytes": int(os.path.getsize(path)), "batch": batch_tag}
        mtmp = os.path.join(_manifest_dir(out_dir),
                            f".bucket-{bk:05d}.a{batch_tag}.tmp-{os.getpid()}")
        with open(mtmp, "w") as fh:
            json.dump(man, fh)
        os.replace(mtmp, os.path.join(
            _manifest_dir(out_dir), f"bucket-{bk:05d}.a{batch_tag}.json"))
        return pd.DataFrame([man])

    ran = (
        ds.map_batches(bucketize, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(write_bucket, batch_format="pyarrow")
        .to_pandas()
    )
    return {
        "buckets": int(len(ran)),
        "rows": int(ran["rows"].sum()) if len(ran) else 0,
        "skipped": len(done),
    }
