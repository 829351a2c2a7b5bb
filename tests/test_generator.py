"""Generator invariants (SURVEY §7 M0): determinism, schema, counter==turn_idx,
contiguity before perturbation, monotone ts, variant ground-truth shape."""

import numpy as np
import pandas as pd
import pyarrow as pa

from log_aggregator_ray.fixtures import generator as gen
from log_aggregator_ray.schema import TRANSCRIPT_SCHEMA


def test_deterministic_and_schema():
    t1, _ = gen.generate_transcripts(n_convs=50, seed=42)
    t2, _ = gen.generate_transcripts(n_convs=50, seed=42)
    assert t1.schema == TRANSCRIPT_SCHEMA
    assert t1.equals(t2)
    t3, _ = gen.generate_transcripts(n_convs=50, seed=7)
    assert not t1.equals(t3)


def test_counter_and_contiguity():
    t, gt = gen.generate_transcripts(n_convs=40, seed=42)
    df = t.to_pandas().sort_values(["conv_id", "turn_idx"])
    # trailing integer in text == turn_idx (logGen analog)
    trailing = df["text"].str.extract(r" (\d+)$")[0].astype(int)
    assert (trailing.values == df["turn_idx"].values).all()
    # contiguous 1..n per conv
    g = df.groupby("conv_id")["turn_idx"]
    assert (g.min() == 1).all()
    assert (g.max() == g.size()).all()
    # ts strictly monotone per conv
    assert df.groupby("conv_id")["ts"].apply(lambda s: s.is_monotonic_increasing).all()
    # ground truth consistency: per-sink n_rows == max_counter for clean input
    assert (gt.sink_counts["n_rows"] == gt.sink_counts["max_counter"]).all()


def test_hot_conv_skew():
    t, _ = gen.generate_transcripts(n_convs=100, seed=42, hot_frac=0.3)
    counts = t.to_pandas()["conv_id"].value_counts()
    assert counts.get("conv-000000", 0) / t.num_rows > 0.2


def test_duplicates_variant():
    t, gt = gen.generate_transcripts(n_convs=40, seed=42)
    td, gtd = gen.with_duplicates(t, gt, frac=0.05)
    assert td.num_rows > t.num_rows
    df = td.to_pandas()
    assert df.duplicated(["conv_id", "turn_idx"]).sum() > 0
    # ground truth unchanged: dedup is first-wins
    assert gtd.sink_counts.equals(gt.sink_counts)


def test_gaps_variant():
    t, gt = gen.generate_transcripts(n_convs=60, seed=42)
    tg, gtg = gen.with_gaps(t, gt, frac_convs=0.2)
    assert tg.num_rows < t.num_rows
    assert len(gtg.quarantine) >= 1
    # routed ground truth for a gap conv stops before the gap
    row = gtg.quarantine.iloc[0]
    kept = gtg.turns[gtg.turns["conv_id"] == row["conv_id"]]["turn_idx"]
    assert kept.max() == row["first_missing_turn"] - 1
    # docs truncated accordingly
    doc = gtg.docs.set_index("conv_id").loc[row["conv_id"], "assembled_text"]
    assert len(doc.split("\n")) == row["first_missing_turn"] - 1


def test_midstream_variant():
    t, gt = gen.generate_transcripts(n_convs=60, seed=42)
    tm, gtm = gen.with_midstream(t, gt, frac_convs=0.2)
    df = tm.to_pandas()
    mins = df.groupby("conv_id")["turn_idx"].min()
    assert (mins > 1).sum() >= 1
    # ground-truth turns start at the new min
    g = gtm.turns.groupby("conv_id")["turn_idx"].min()
    assert g.equals(mins.reindex(g.index))


def test_ensure_corpus_idempotent(tmp_path):
    import os

    p1 = gen.ensure_corpus("t", n_convs=30, base=str(tmp_path))
    assert os.path.isdir(p1)
    parts = sorted(os.listdir(p1))
    mtimes = [os.path.getmtime(os.path.join(p1, f)) for f in parts]
    p2 = gen.ensure_corpus("t", n_convs=30, base=str(tmp_path))
    assert p1 == p2
    assert [os.path.getmtime(os.path.join(p2, f)) for f in sorted(os.listdir(p2))] == mtimes
    import pyarrow.dataset as pads

    assert pads.dataset(p1, format="parquet").count_rows() > 0
