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


def init_run(out_dir: str, num_buckets: int, input_path: str) -> None:
    """Record run-level invariants; a resume with different bucketing is an
    error (partition identity would change)."""
    path = os.path.join(_manifest_dir(out_dir), RUN_FILE)
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        if prev["num_buckets"] != num_buckets:
            raise ValueError(
                f"resume with num_buckets={num_buckets} but run was started "
                f"with {prev['num_buckets']} — bucket identity would change"
            )
        return
    atomic_write_json(path, {"num_buckets": num_buckets, "input_path": input_path})


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
