"""Hot-sink (giant key) handling: one conversation holding a large share of
all rows is range-partitioned by turn_idx at spill time and gated
hierarchically (pass A scan → global first-gap → pass B emit), so it never
wall-bounds phase 2.  Cross-validated against the standard single-task path
(hot detection disabled) on identical input.
"""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from log_aggregator_ray.fixtures import generator as gen
from log_aggregator_ray.pipelines import flagship
from log_aggregator_ray.state import manifest as mf

HOT_N = 5000
GAP_AT = 700  # inside turn-block 1 for turn_block=512


def _hot_rows(schema, n, skip=()):
    idx = [i for i in range(n) if i not in skip]
    cols = {
        "conv_id": ["conv-hot"] * len(idx),
        "turn_idx": idx,
        "role": ["user" if i % 2 == 0 else "assistant" for i in idx],
        "text": [f"event=msg hot payload {i}" for i in idx],
        "tool": [""] * len(idx),
        "ts": pd.to_datetime(np.array(idx) * 1000, unit="ms"),
    }
    t = pa.table({f.name: pa.array(cols[f.name]) for f in schema})
    return t.cast(schema)


@pytest.fixture(scope="module")
def hot_corpus(tmp_path_factory):
    base = tmp_path_factory.mktemp("hotc")
    t, _ = gen.generate_transcripts(n_convs=30, seed=5)
    t, _ = gen.with_gaps(t, None, frac_convs=0.1)
    hot = _hot_rows(t.schema, HOT_N, skip={GAP_AT})
    # re-deliver some hot rows (exact duplicates, dedup must drop them)
    rng = np.random.default_rng(9)
    dup = hot.take(pa.array(np.sort(rng.choice(hot.num_rows, 50, replace=False))))
    full = pa.concat_tables([t, hot, dup])
    perm = np.random.default_rng(1).permutation(full.num_rows)
    full = full.take(pa.array(perm))
    d = str(base / "corpus")
    os.makedirs(d)
    pq.write_table(full, os.path.join(d, "part-000.parquet"))
    return d, t.schema


def _df(out_dir, kind):
    t = pads.dataset(os.path.join(out_dir, kind), format="parquet").to_table()
    df = t.to_pandas()
    sort = [c for c in ["sink", "turn_idx", "conv_id"] if c in df.columns]
    return df.sort_values(sort).reset_index(drop=True)


def _run(corpus, out, **kw):
    return flagship.run_flagship(
        corpus, out, num_buckets=8,
        hot_sink_rows=kw.pop("hot_sink_rows", 1000),
        turn_block=kw.pop("turn_block", 512), **kw,
    )


def test_hot_path_matches_standard_path(hot_corpus, tmp_path):
    corpus, _schema = hot_corpus
    hot_out = str(tmp_path / "hot")
    ref_out = str(tmp_path / "ref")

    r = _run(corpus, hot_out)
    # the hot sink got a pseudo-bucket beyond the hash range, with slices
    hot_buckets = [b for b in mf.committed_buckets(hot_out) if b >= 8]
    assert hot_buckets == [8]
    slices = [
        f for f in os.listdir(os.path.join(hot_out, "routed"))
        if f.startswith("bucket=00008.")
    ]
    assert len(slices) > 3  # block-parallel output

    # reference: identical input through the standard (single-task) path
    r2 = flagship.run_flagship(corpus, ref_out, num_buckets=8,
                               hot_sink_rows=1 << 40)
    for k in ("rows_in", "routed", "quarantined", "dup_dropped", "n_sinks"):
        assert r[k] == r2[k], k
    for kind in ("routed", "quarantine", "sink_counts", "docs"):
        pd.testing.assert_frame_equal(_df(hot_out, kind), _df(ref_out, kind))

    # the gate held the hot sink at its gap
    quar = _df(hot_out, "quarantine")
    hotq = quar[quar["conv_id"] == "conv-hot"]
    assert len(hotq) == HOT_N - 1 - GAP_AT
    assert (hotq["first_missing_turn"] == GAP_AT).all()


def test_two_hot_sinks(tmp_path):
    """Multiple giant keys: each gets its own pseudo-bucket and gates
    independently."""
    t, _ = gen.generate_transcripts(n_convs=15, seed=4)
    hot1 = _hot_rows(t.schema, 3000, skip={GAP_AT})
    hot2 = pa.table({
        f.name: hot1[f.name] if f.name != "conv_id"
        else pa.array(["conv-hot2"] * hot1.num_rows)
        for f in t.schema
    }).cast(t.schema)  # same turns, different sink, same gap
    full = pa.concat_tables([t, hot1, hot2])
    full = full.take(pa.array(np.random.default_rng(2).permutation(full.num_rows)))
    d = str(tmp_path / "corpus")
    os.makedirs(d)
    pq.write_table(full, os.path.join(d, "part-000.parquet"))

    out = str(tmp_path / "hot")
    ref = str(tmp_path / "ref")
    _run(d, out)
    assert sorted(b for b in mf.committed_buckets(out) if b >= 8) == [8, 9]
    flagship.run_flagship(d, ref, num_buckets=8, hot_sink_rows=1 << 40)
    for kind in ("routed", "quarantine", "sink_counts", "docs"):
        pd.testing.assert_frame_equal(_df(out, kind), _df(ref, kind))


def test_hot_sink_concentrated_in_late_parts(tmp_path):
    """VERDICT r2 #6: a giant sink living ONLY in parts a head-sample would
    skip must still be detected (the pre-pass scans every part's key column),
    while a merely-midsize sink in the ambiguous band must NOT be flagged."""
    t, _ = gen.generate_transcripts(n_convs=10, seed=7)
    d = str(tmp_path / "corpus")
    os.makedirs(d)
    # 12 parts; the old sampler read parts[::3][:4] = {0,3,6,9}.  The hot
    # sink (3000 rows, threshold 1000) lives only in parts {10, 11}.
    for i in range(10):
        pq.write_table(
            t.slice(i * (t.num_rows // 10), t.num_rows // 10),
            os.path.join(d, f"part-{i:03d}.parquet"),
        )
    hot = _hot_rows(t.schema, 3000)
    pq.write_table(hot.slice(0, 1500), os.path.join(d, "part-010.parquet"))
    pq.write_table(hot.slice(1500), os.path.join(d, "part-011.parquet"))

    got = flagship.detect_hot_sinks(d, threshold=1000)
    from log_aggregator_ray.stages.route import stable_hash

    expect = stable_hash(np.asarray(["conv-hot"], dtype=object))
    assert got == [int(expect[0])]

    # ambiguous band: 700 rows split across late parts — per-part visible
    # mass clears the pigeonhole cut, but the exact recount rejects it
    mid = pa.table({
        f.name: hot[f.name].slice(0, 700) if f.name != "conv_id"
        else pa.array(["conv-mid"] * 700)
        for f in t.schema
    }).cast(t.schema)
    pq.write_table(mid.slice(0, 350), os.path.join(d, "part-012.parquet"))
    pq.write_table(mid.slice(350), os.path.join(d, "part-013.parquet"))
    assert flagship.detect_hot_sinks(d, threshold=1000) == [int(expect[0])]


def test_hot_bucket_crash_resume(hot_corpus, tmp_path):
    """Losing the hot pseudo-bucket's manifest + outputs mid-run: resume
    reprocesses ONLY it (committed hash buckets skipped) and re-converges."""
    import glob

    corpus, _ = hot_corpus
    out = str(tmp_path / "out")
    _run(corpus, out)
    routed_before = _df(out, "routed")

    committed_before = len(mf.committed_buckets(out))
    os.remove(os.path.join(out, "_manifests", "bucket=00008.json"))
    for kind in ("routed", "quarantine", "sink_counts", "docs"):
        for p in glob.glob(os.path.join(out, kind, "bucket=00008*.parquet")):
            os.remove(p)

    r = _run(corpus, out)
    assert r["buckets_skipped"] == committed_before - 1  # hash buckets survive
    assert r["buckets_this_run"] == 1  # only the hot pseudo-bucket re-ran
    pd.testing.assert_frame_equal(_df(out, "routed"), routed_before)


def test_hot_incremental_gap_fill(hot_corpus, tmp_path):
    corpus, schema = hot_corpus
    import shutil

    d = str(tmp_path / "corpus")
    shutil.copytree(corpus, d)
    out = str(tmp_path / "out")
    _run(d, out)

    # the missing hot turn arrives in a later part → whole sink promotes
    filler = _hot_rows(schema, GAP_AT + 1, skip=set(range(GAP_AT)))
    pq.write_table(filler, os.path.join(d, "part-001.parquet"))
    r = _run(d, out)
    assert r["incremental"] is True

    clean = str(tmp_path / "clean")
    cd = str(tmp_path / "clean_corpus")
    os.makedirs(cd)
    for p in sorted(os.listdir(d)):
        shutil.copy(os.path.join(d, p), os.path.join(cd, p))
    rc = _run(cd, clean)
    for kind in ("routed", "quarantine", "sink_counts", "docs"):
        pd.testing.assert_frame_equal(_df(out, kind), _df(clean, kind))
    for k in ("rows_in", "routed", "quarantined", "dup_dropped", "n_sinks"):
        assert r[k] == rc[k], k
    # hot sink fully routed now
    assert "conv-hot" not in set(_df(out, "quarantine")["conv_id"])


def test_raydata_exchange_hot_path_matches(hot_corpus, tmp_path):
    """raydata (groupby) mode routes a hot pseudo-bucket group through the
    same block-parallel emit pipeline — output identical to the objstore
    hot path, and block-sliced (not one giant single-task file)."""
    corpus, _schema = hot_corpus
    rd_out = str(tmp_path / "rd")
    obj_out = str(tmp_path / "obj")

    r1 = _run(corpus, rd_out, exchange="raydata")
    r2 = _run(corpus, obj_out)
    for k in ("rows_in", "routed", "quarantined", "dup_dropped", "n_sinks"):
        assert r1[k] == r2[k], k
    for kind in ("routed", "quarantine", "sink_counts", "docs"):
        pd.testing.assert_frame_equal(_df(rd_out, kind), _df(obj_out, kind))
    slices = [
        f for f in os.listdir(os.path.join(rd_out, "routed"))
        if f.startswith("bucket=00008.")
    ]
    assert len(slices) > 3  # block-parallel output in raydata mode too


def test_default_doc_contract_refuses_giant_cell(hot_corpus, tmp_path):
    """The one-row-per-sink doc contract is linear in the hot conversation
    (a 10× hot sink approaches Arrow's 2 GiB cell cap): past max_doc_bytes
    the default path must refuse with a clear error naming the opt-in,
    not fail deep inside parquet.  Simulated by lowering the ceiling."""
    corpus, _ = hot_corpus
    with pytest.raises(Exception, match="doc_chunk_rows"):
        _run(corpus, str(tmp_path / "refuse"), max_doc_bytes=10_000)


def test_chunked_doc_contract_matches_default(hot_corpus, tmp_path):
    """doc_chunk_rows=N: docs gain a doc_part column, the hot sink's parts
    are written block-parallel by the emits (finalize does no doc work),
    and joining each sink's parts in doc_part order reproduces the default
    contract's assembled_text byte-for-byte — for the giant sink AND every
    normal sink."""
    corpus, _ = hot_corpus
    ref_out = str(tmp_path / "ref")
    chk_out = str(tmp_path / "chunked")
    _run(corpus, ref_out)
    # same low ceiling that made the default path refuse: chunking lifts it
    _run(corpus, chk_out, doc_chunk_rows=256, max_doc_bytes=10_000)

    ref = _df(ref_out, "docs").set_index("sink")["assembled_text"]
    chk = _df(chk_out, "docs")
    assert "doc_part" in chk.columns
    joined = (
        chk.sort_values(["sink", "doc_part"])
        .groupby("sink")["assembled_text"]
        .apply("\n".join)
    )
    assert set(joined.index) == set(ref.index)
    for sink in ref.index:
        assert joined[sink] == ref[sink], sink
    # the giant sink's parts came from MULTIPLE block-parallel emit files
    # (only turn blocks BELOW the gap at 700 are routed → 2 emit files of
    # the 512-turn blocks; the quarantined blocks carry no doc text, same
    # as the default contract)
    doc_files = [f for f in os.listdir(os.path.join(chk_out, "docs"))
                 if f.startswith("bucket=00008.")]
    assert len(doc_files) == 2
    # parts bound the cell size: every chunk covers <= doc_chunk_rows rows
    hot_parts = chk[chk["conv_id"] == "conv-hot"]
    assert len(hot_parts) >= GAP_AT // 256
    assert (hot_parts["assembled_text"].str.count("\n") < 256).all()


def test_objstore_exchange_recovers_lost_refs(hot_corpus, tmp_path,
                                              monkeypatch):
    """Per-map retry (objstore exchange): with half the exchange objects
    genuinely freed from plasma mid-run (simulating a dead phase-1
    worker), phase 2 re-derives each lost slice from its chunk's
    deterministic map inline — the run completes with byte-identical
    output and reports how many slices were rebuilt; no run-level rerun,
    no manifest fallback."""
    corpus, _ = hot_corpus
    ctl_out = str(tmp_path / "ctl")
    rec_out = str(tmp_path / "rec")
    ctl = _run(corpus, ctl_out)
    assert ctl.get("exchange_rebuilds", 0) == 0

    monkeypatch.setenv("GRAFT_TEST_FREE_EXCHANGE", "1")
    rec = _run(corpus, rec_out)
    assert rec["exchange_rebuilds"] > 0  # recovery actually exercised
    for k in ("rows_in", "routed", "quarantined", "dup_dropped", "n_sinks"):
        assert rec[k] == ctl[k], k
    for kind in ("routed", "quarantine", "sink_counts", "docs"):
        pd.testing.assert_frame_equal(_df(rec_out, kind), _df(ctl_out, kind))
