"""Per-partition lineage manifests — the checkpoint/resume state
(SURVEY §2.4 T2, §4 checkpoint/resume).

The reference persists one ``.lastSeq`` file per (id, session) after each
append and rebuilds its in-memory watermark map by scanning at startup
(datadecoder/.../SequenceTracker.java:132-154, 43-68), with a documented
duplicate window between append and checkpoint (DataPumpDecoderSort.java:
45-51).  The batch recast does strictly better: the unit of commit is a
whole hash-bucket partition, all of whose outputs are written under
deterministic names and then sealed by an atomically-renamed manifest JSON.
A bucket either has a manifest (fully committed, resume skips it) or it
doesn't (re-run overwrites via os.replace — idempotent).  Task retries and
job restarts are indistinguishable.
"""

from __future__ import annotations

import json
import os
import uuid


MANIFEST_DIR = "_manifests"
RUN_FILE = "run.json"


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


def input_fingerprint(input_path: str) -> str:
    """Cheap content identity of the input: sorted (name, size, mtime_ns) of
    the parquet parts.  Bucket contents depend on the WHOLE input (any new
    file adds rows to every bucket), so a committed bucket is only valid for
    the exact input it was built from — the reference has the same property
    (lastSeq is only meaningful for the stream it tracked,
    SequenceTracker.java:105-113)."""
    import hashlib

    entries = []
    if os.path.isdir(input_path):
        for name in sorted(os.listdir(input_path)):
            if name.endswith(".parquet"):
                st = os.stat(os.path.join(input_path, name))
                entries.append(f"{name}|{st.st_size}|{st.st_mtime_ns}")
    else:
        st = os.stat(input_path)
        entries.append(f"{os.path.basename(input_path)}|{st.st_size}|{st.st_mtime_ns}")
    return hashlib.blake2b("\n".join(entries).encode(), digest_size=12).hexdigest()


def init_run(out_dir: str, num_buckets: int, input_path: str) -> bool:
    """Record run-level invariants.  Returns True when committed buckets may
    be reused (same bucketing AND same input fingerprint).  A resume with
    different bucketing is an error (partition identity would change); a
    changed input invalidates all prior bucket manifests (they are removed)
    since every bucket's contents depend on the whole input."""
    path = os.path.join(_manifest_dir(out_dir), RUN_FILE)
    fp = input_fingerprint(input_path)
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        if prev["num_buckets"] != num_buckets:
            raise ValueError(
                f"resume with num_buckets={num_buckets} but run was started "
                f"with {prev['num_buckets']} — bucket identity would change"
            )
        if prev.get("input_fingerprint") == fp:
            return True
        # input changed: prior bucket commits are stale — drop them
        d = _manifest_dir(out_dir)
        for name in os.listdir(d):
            if name.startswith("bucket="):
                os.remove(os.path.join(d, name))
        atomic_write_json(
            path, {"num_buckets": num_buckets, "input_path": input_path,
                   "input_fingerprint": fp},
        )
        return False
    atomic_write_json(
        path, {"num_buckets": num_buckets, "input_path": input_path,
               "input_fingerprint": fp},
    )
    return True


def commit_bucket(out_dir: str, bucket: int, payload: dict) -> None:
    atomic_write_json(
        os.path.join(_manifest_dir(out_dir), f"bucket={bucket:05d}.json"),
        {"bucket": bucket, **payload},
    )


def committed_buckets(out_dir: str) -> set[int]:
    d = _manifest_dir(out_dir)
    if not os.path.isdir(d):
        return set()
    out = set()
    for name in os.listdir(d):
        if name.startswith("bucket=") and name.endswith(".json"):
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
