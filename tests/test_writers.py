"""Resumable bucketed-parquet sink (sources.writers, K1/K2/K3 general)."""

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from log_aggregator_ray.sources import writers


@pytest.fixture()
def table():
    rng = np.random.default_rng(3)
    n = 5000
    return pa.table({
        "user": pa.array([f"u{int(i):04d}" for i in rng.integers(0, 300, n)]),
        "v": pa.array(rng.integers(0, 1_000_000, n), pa.int64()),
    })


def _read_all(out_dir):
    parts = sorted(glob.glob(os.path.join(out_dir, "*.parquet")))
    return (
        pa.concat_tables([pq.read_table(p) for p in parts])
        .to_pandas()
        .sort_values(["user", "v"])
        .reset_index(drop=True)
    )


def test_write_read_roundtrip_and_key_locality(table, tmp_path):
    out = str(tmp_path / "out")
    rep = writers.write_bucketed_parquet(
        rd.from_arrow(table), out, "user", num_buckets=16
    )
    assert rep["rows"] == table.num_rows and rep["skipped"] == 0
    got = _read_all(out)
    exp = table.to_pandas().sort_values(["user", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
    # every key lives in exactly one file
    seen: dict[str, str] = {}
    for p in glob.glob(os.path.join(out, "*.parquet")):
        for u in set(pq.read_table(p, columns=["user"])["user"].to_pylist()):
            assert seen.setdefault(u, p) == p


def test_resume_skips_committed_and_converges(table, tmp_path):
    out = str(tmp_path / "out")
    writers.write_bucketed_parquet(rd.from_arrow(table), out, "user",
                                   num_buckets=16)
    before = _read_all(out)
    # simulate a crash: drop half the data files AND their manifests
    parts = sorted(glob.glob(os.path.join(out, "*.parquet")))
    for p in parts[::2]:
        bk = int(os.path.basename(p).split("=")[1].split(".")[0])
        os.remove(p)
        os.remove(os.path.join(out, "_manifests", f"bucket-{bk:05d}.json"))
    rep = writers.write_bucketed_parquet(rd.from_arrow(table), out, "user",
                                         num_buckets=16)
    assert rep["skipped"] == len(parts) - len(parts[::2])
    assert rep["buckets"] == len(parts[::2])
    pd.testing.assert_frame_equal(_read_all(out), before)


def test_resume_noop_when_all_committed(table, tmp_path):
    out = str(tmp_path / "out")
    writers.write_bucketed_parquet(rd.from_arrow(table), out, "user",
                                   num_buckets=8)
    rep = writers.write_bucketed_parquet(rd.from_arrow(table), out, "user",
                                         num_buckets=8)
    assert rep["buckets"] == 0 and rep["rows"] == 0 and rep["skipped"] == 8


def test_read_back_dataset(table, tmp_path):
    out = str(tmp_path / "out")
    writers.write_bucketed_parquet(rd.from_arrow(table), out, "user",
                                   num_buckets=8)
    ds = writers.read_bucketed_parquet(out, columns=["user"])
    assert ds.count() == table.num_rows


def test_resume_rejects_changed_partitioning(table, tmp_path):
    out = str(tmp_path / "out")
    writers.write_bucketed_parquet(rd.from_arrow(table), out, "user",
                                   num_buckets=8)
    with pytest.raises(ValueError, match="changed partitioning"):
        writers.write_bucketed_parquet(rd.from_arrow(table), out, "user",
                                       num_buckets=16)


def test_resume_rejects_changed_hash_kernel(table, tmp_path):
    """Bucket layout is a function of the hash kernel: a resume under a
    different kernel (polars upgrade / kernel swap) must refuse rather
    than mis-skip committed buckets that hold different key sets."""
    import json

    out = str(tmp_path / "out")
    writers.write_bucketed_parquet(rd.from_arrow(table), out, "user",
                                   num_buckets=8)
    meta_path = os.path.join(out, "_manifests", "meta.json")
    meta = json.load(open(meta_path))
    meta["hash_kernel"] = "legacy-pandas-siphash"
    json.dump(meta, open(meta_path, "w"))
    with pytest.raises(ValueError, match="changed partitioning"):
        writers.write_bucketed_parquet(rd.from_arrow(table), out, "user",
                                       num_buckets=8)


def test_fresh_write_cleans_stale_buckets(table, tmp_path):
    """resume=False into a dirty out_dir must not leave stale bucket files
    or manifests behind (ADVICE r3): rewriting 16 buckets over a previous
    64-bucket write would otherwise read back mixed old+new rows, and a
    later resume would trust the stale manifests under the new meta."""
    out = str(tmp_path / "out")
    writers.write_bucketed_parquet(rd.from_arrow(table), out, "user",
                                   num_buckets=64)
    writers.write_bucketed_parquet(rd.from_arrow(table), out, "user",
                                   num_buckets=16, resume=False)
    # exactly the new layout on disk — data AND manifests
    parts = glob.glob(os.path.join(out, "*.parquet"))
    assert len(parts) <= 16
    mans = glob.glob(os.path.join(out, "_manifests", "bucket-*.json"))
    assert {os.path.basename(p) for p in mans} == {
        f"bucket-{int(os.path.basename(p).split('=')[1].split('.')[0]):05d}.json"
        for p in parts
    }
    exp = table.to_pandas().sort_values(["user", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(_read_all(out), exp)
    # and a subsequent resume over the clean state is a no-op
    rep = writers.write_bucketed_parquet(rd.from_arrow(table), out, "user",
                                         num_buckets=16)
    assert rep["buckets"] == 0 and rep["skipped"] == len(parts)


def test_append_and_incremental_dedup_loop(tmp_path):
    """The full operating loop: base index → ingest batch 1 (dedup vs
    index, APPEND survivors) → ingest batch 2 sees batch 1's content as
    duplicate.  Appends never rewrite prior files, are idempotent per
    (bucket, batch_tag), and read_bucketed_parquet sees base + appends."""
    import pyarrow as pa_

    from log_aggregator_ray.functions.dedup import (add_hash_column,
                                                    dedup_against_index)

    def docs(ids, texts):
        return pa_.table({
            "doc_id": pa_.array(np.array(ids, dtype=np.int64)),
            "text": pa_.array(texts),
        })

    def hashed(t):
        return rd.from_arrow(t).map_batches(
            add_hash_column, batch_format="pyarrow", zero_copy_batch=True
        ).select_columns(["doc_id", "content_hash"])

    idx = str(tmp_path / "index")
    base = docs(range(20), [f"base doc {i}" for i in range(20)])
    writers.write_bucketed_parquet(hashed(base), idx, "content_hash",
                                   num_buckets=8)
    files_before = set(glob.glob(os.path.join(idx, "*.parquet")))

    b1 = docs(range(100, 105),
              ["base doc 3", "wave one A", "wave one B", "wave one C",
               "wave one A"])
    surv1 = dedup_against_index(rd.from_arrow(b1), idx)
    surv1_pd = surv1.to_pandas().sort_values("doc_id")
    assert list(surv1_pd["doc_id"]) == [101, 102, 103, 104]  # 100 is a dup

    rep = writers.append_bucketed_parquet(
        hashed(b1.filter(pa_.array([i in (101, 102, 103, 104)
                                    for i in b1["doc_id"].to_pylist()]))),
        idx, "content_hash", batch_tag="wave1",
    )
    assert rep["rows"] == 4
    assert files_before <= set(glob.glob(os.path.join(idx, "*.parquet")))
    # idempotent re-append of the same batch: all buckets skipped
    rep2 = writers.append_bucketed_parquet(
        hashed(b1), idx, "content_hash", batch_tag="wave1")
    assert rep2["rows"] == 0 and rep2["skipped"] == rep["buckets"]

    b2 = docs(range(200, 204),
              ["wave one B", "base doc 7", "wave two X", "wave one A"])
    surv2 = dedup_against_index(rd.from_arrow(b2), idx).to_pandas()
    assert list(surv2.sort_values("doc_id")["doc_id"]) == [202]

    # read-back sees base + appended rows
    total = writers.read_bucketed_parquet(idx).count()
    assert total == 20 + 4
    # base resume still sees its own commit state (append manifests
    # must not masquerade as base commits)
    assert writers.committed_buckets(idx) == set(range(8)) or \
        len(writers.committed_buckets(idx)) <= 8
