"""Flagship pipeline end-to-end + checkpoint/resume (SURVEY §7 M4/M5).

Resume contract (SequenceTracker analog, done better): after a partial run
(some bucket manifests committed), a re-run skips committed buckets and the
final output is identical to a clean one-shot run — no duplicates, no loss.
"""

import os

import pandas as pd
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from log_aggregator_ray.fixtures import generator as gen
from log_aggregator_ray.fixtures.oracle import decode_reference
from log_aggregator_ray.pipelines import flagship
from log_aggregator_ray.state import manifest as mf


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    base = tmp_path_factory.mktemp("corpus")
    t, gt = gen.generate_transcripts(n_convs=60, seed=42)
    t, gt = gen.with_gaps(t, gt, frac_convs=0.1)
    t, gt = gen.with_duplicates(t, gt, frac=0.03)
    path = str(base / "transcripts.parquet")
    pq.write_table(t, path)
    return path, t, gt


def _routed_df(out_dir):
    return (
        pads.dataset(os.path.join(out_dir, "routed"), format="parquet")
        .to_table()
        .to_pandas()
        .sort_values(["sink", "turn_idx"])
        .reset_index(drop=True)
    )


def test_run_flagship_end_to_end(corpus, tmp_path):
    path, t, gt = corpus
    out = str(tmp_path / "out")
    report = flagship.run_flagship(path, out, num_buckets=8)
    assert report["buckets_this_run"] == report["buckets_total"] > 0
    assert report["rows_in"] == t.num_rows
    assert report["dup_dropped"] > 0 and report["quarantined"] > 0

    # routed rows equality vs the independent literal oracle
    oracle_routed, _, oracle_counts, _ = decode_reference(t)
    got = _routed_df(out)
    exp = (
        oracle_routed[["sink", "turn_idx", "text"]]
        .sort_values(["sink", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["sink", "turn_idx", "text"]].astype({"turn_idx": "int64"}),
        exp.astype({"turn_idx": "int64"}),
    )
    # per-turn text equality under stable (conv_id, turn_idx) ordering
    assert (got["counter"].values == got["turn_idx"].values).all()

    counts = (
        flagship.read_sink_counts(out)
        .sort_values("sink")
        .reset_index(drop=True)
        .astype({"n_rows": "int64", "max_counter": "int64"})
    )
    pd.testing.assert_frame_equal(counts, oracle_counts)

    # enriched + parsed columns present in the routed sink files
    assert {"event_type", "role_class", "tool_family"} <= set(got.columns)


def test_resume_skips_and_matches(corpus, tmp_path):
    path, t, gt = corpus
    full, partial = str(tmp_path / "full"), str(tmp_path / "partial")
    flagship.run_flagship(path, full, num_buckets=8)

    # simulate a crash: run, then delete half the manifests AND their outputs
    flagship.run_flagship(path, partial, num_buckets=8)
    victims = sorted(mf.committed_buckets(partial))[:4]
    for b in victims:
        os.remove(os.path.join(partial, "_manifests", f"bucket={b:05d}.json"))
        for kind in ["routed", "quarantine", "sink_counts", "docs"]:
            os.remove(os.path.join(partial, kind, f"bucket={b:05d}.parquet"))

    report = flagship.run_flagship(path, partial, num_buckets=8, resume=True)
    assert report["buckets_skipped"] == 4  # the surviving ones were skipped
    assert report["buckets_this_run"] == 4  # victims re-processed

    pd.testing.assert_frame_equal(_routed_df(partial), _routed_df(full))


def test_resume_bucket_mismatch_rejected(corpus, tmp_path):
    path, _, _ = corpus
    out = str(tmp_path / "out2")
    flagship.run_flagship(path, out, num_buckets=8)
    with pytest.raises(ValueError, match="num_buckets"):
        flagship.run_flagship(path, out, num_buckets=16)


def test_resume_invalidated_by_changed_input(corpus, tmp_path):
    """Appending input data must invalidate prior bucket commits — a
    committed bucket is only valid for the exact input it was built from."""
    import glob
    import time as _time

    import pyarrow.parquet as pq2

    path, t, gt = corpus
    # build a DIRECTORY corpus we can mutate
    import shutil

    d = str(tmp_path / "mut_corpus")
    os.makedirs(d)
    shutil.copy(path, os.path.join(d, "part-0.parquet"))
    out = str(tmp_path / "outm")
    flagship.run_flagship(d, out, num_buckets=8)
    n1 = flagship.read_sink_counts(out)["n_rows"].sum()

    # append a new file with one more conversation
    extra, _ = gen.generate_transcripts(n_convs=3, seed=123)
    _time.sleep(0.01)
    pq2.write_table(extra, os.path.join(d, "part-1.parquet"))

    report = flagship.run_flagship(d, out, num_buckets=8)
    assert report["buckets_skipped"] == 0  # stale commits dropped
    n2 = flagship.read_sink_counts(out)["n_rows"].sum()
    assert n2 > n1


def test_exchange_variants_agree(corpus, tmp_path):
    """The three exchange implementations (objstore default, file spill,
    raydata groupby) are alternative physical plans for the SAME logical
    exchange — routed rows, quarantine and per-sink counts must be
    byte-identical across them."""
    path, t, gt = corpus
    outs = {}
    for ex in ("objstore", "spill", "raydata"):
        out = str(tmp_path / f"out_{ex}")
        flagship.run_flagship(path, out, num_buckets=8, exchange=ex)
        outs[ex] = _routed_df(out)
    cols = ["sink", "turn_idx", "text", "status"]
    cols = [c for c in cols if c in outs["objstore"].columns]
    for ex in ("spill", "raydata"):
        pd.testing.assert_frame_equal(outs["objstore"][cols], outs[ex][cols])
    for ex in ("spill", "raydata"):
        a = flagship.read_sink_counts(str(tmp_path / "out_objstore"))
        b = flagship.read_sink_counts(str(tmp_path / f"out_{ex}"))
        pd.testing.assert_frame_equal(
            a.sort_values("sink").reset_index(drop=True),
            b.sort_values("sink").reset_index(drop=True),
        )
