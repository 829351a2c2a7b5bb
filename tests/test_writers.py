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
