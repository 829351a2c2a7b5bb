"""Golden tests for ordered reassembly: dedup, contiguity gate, mid-stream
init, quarantine — checked against generator ground truth (the reference's
`diff` + `logCheck` analogs)."""

import numpy as np
import pandas as pd
import ray.data as rd

from log_aggregator_ray.fixtures import generator as gen
from log_aggregator_ray.stages.aggregate import assemble_docs, sink_counts
from log_aggregator_ray.stages.parse import apply_parse
from log_aggregator_ray.stages.reassemble import apply_reassemble, reassemble_pdf
from log_aggregator_ray.stages.route import add_sink_and_bucket


def _pipeline(table):
    ds = rd.from_arrow(table)
    ds = apply_parse(ds)
    ds = add_sink_and_bucket(ds, num_buckets=8)
    return apply_reassemble(ds)


def _check_counts(ds, gt):
    got = (
        sink_counts(ds.map_batches(
            lambda t: t.filter(__import__("pyarrow").compute.equal(t["status"], "routed")),
            batch_format="pyarrow"))
        .to_pandas()
        .sort_values("sink")
        .reset_index(drop=True)
    )
    exp = gt.sink_counts.sort_values("sink").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"n_rows": "int64", "max_counter": "int64"}),
        exp.astype({"n_rows": "int64", "max_counter": "int64"}),
    )


def _check_docs(ds, gt):
    got = assemble_docs(ds).to_pandas()[["conv_id", "assembled_text"]]
    got = got.sort_values("conv_id").reset_index(drop=True)
    exp = gt.docs.sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_unit_reassemble_pdf():
    df = pd.DataFrame(
        {
            "sink": ["a"] * 5 + ["b"] * 4 + ["c"] * 3,
            "conv_id": ["a"] * 5 + ["b"] * 4 + ["c"] * 3,
            "turn_idx": [1, 2, 2, 3, 5,   3, 4, 5, 7,   1, 2, 3],
            "text": [f"t{i}" for i in range(12)],
        }
    )
    out = reassemble_pdf(df.sample(frac=1, random_state=0))  # shuffled input
    a = out[out["sink"] == "a"]
    # dup turn 2 dropped first-wins; 1,2,3 routed; 5 quarantined (gap at 4)
    assert list(a["turn_idx"]) == [1, 2, 3, 5]
    assert list(a["status"]) == ["routed"] * 3 + ["quarantined"]
    assert a[a["status"] == "quarantined"]["first_missing_turn"].iloc[0] == 4
    assert a["dup_dropped"].sum() == 1
    b = out[out["sink"] == "b"]
    # mid-stream init: starts at 3; 3,4,5 routed; 7 quarantined (missing 6)
    assert list(b["status"]) == ["routed"] * 3 + ["quarantined"]
    assert b["first_missing_turn"].iloc[-1] == 6
    c = out[out["sink"] == "c"]
    assert (c["status"] == "routed").all()


def test_clean_golden():
    t, gt = gen.generate_transcripts(n_convs=50, seed=42)
    ds = _pipeline(t)
    df = ds.to_pandas()
    assert (df["status"] == "routed").all()
    _check_counts(ds, gt)
    _check_docs(ds, gt)


def test_duplicates_golden():
    t, gt = gen.generate_transcripts(n_convs=50, seed=42)
    td, gtd = gen.with_duplicates(t, gt, frac=0.05)
    ds = _pipeline(td)
    df = ds.to_pandas()
    assert df["dup_dropped"].sum() > 0
    assert not df.duplicated(["sink", "turn_idx"]).any()
    _check_counts(ds, gtd)
    _check_docs(ds, gtd)


def test_gaps_golden():
    t, gt = gen.generate_transcripts(n_convs=60, seed=42)
    tg, gtg = gen.with_gaps(t, gt, frac_convs=0.2)
    ds = _pipeline(tg)
    df = ds.to_pandas()
    quar = df[df["status"] == "quarantined"]
    got_q = (
        quar.groupby("conv_id")["first_missing_turn"].first().reset_index()
        .sort_values("conv_id").reset_index(drop=True)
    )
    exp_q = gtg.quarantine.sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got_q.astype({"first_missing_turn": "int64"}),
        exp_q.astype({"first_missing_turn": "int64"}),
    )
    _check_counts(ds, gtg)
    _check_docs(ds, gtg)


def test_midstream_golden():
    t, gt = gen.generate_transcripts(n_convs=60, seed=42)
    tm, gtm = gen.with_midstream(t, gt, frac_convs=0.2)
    ds = _pipeline(tm)
    df = ds.to_pandas()
    assert (df["status"] == "routed").all()  # W5: accepted from new min
    _check_counts(ds, gtm)
    _check_docs(ds, gtm)


def test_sessions_sink_naming():
    t, gt = gen.generate_transcripts(n_convs=20, seed=42, with_session=True)
    ds = _pipeline(t)
    df = ds.to_pandas()
    assert df["sink"].str.contains(r"\.\d+$").all()
    _check_counts(ds, gt)


def test_stacked_perturbations_vs_literal_oracle():
    """Gaps + midstream + dups stacked on one corpus, cross-checked against
    the independent loop-per-key oracle (fixtures.oracle), not composed GT."""
    from log_aggregator_ray.fixtures.oracle import decode_reference

    t, gt = gen.generate_transcripts(n_convs=80, seed=42)
    t, gt = gen.with_gaps(t, gt, frac_convs=0.1)
    t, gt = gen.with_midstream(t, gt, frac_convs=0.1)
    t, gt = gen.with_duplicates(t, gt, frac=0.05)

    _, _, oracle_counts, oracle_docs = decode_reference(t)

    ds = _pipeline(t)
    _check_counts(ds, gt)  # composed GT now avoids overlap, must agree
    got = (
        sink_counts(ds.map_batches(
            lambda t2: t2.filter(__import__("pyarrow").compute.equal(t2["status"], "routed")),
            batch_format="pyarrow"))
        .to_pandas().sort_values("sink").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"n_rows": "int64", "max_counter": "int64"}),
        oracle_counts,
    )
    docs = assemble_docs(ds).to_pandas()[["sink", "assembled_text"]]
    docs = docs.sort_values("sink").reset_index(drop=True)
    pd.testing.assert_frame_equal(docs, oracle_docs[["sink", "assembled_text"]])
