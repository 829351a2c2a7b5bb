"""10×-scale soak of the round-3 operator family (VERDICT r3 #8): pivot,
rollup-shape aggregates, range join, HLL-vs-exact, sequence packing and
shard assignment at millions of rows — sizes where silent truncation,
int32 overflow or per-group driver state would show.

Gated behind GRAFT_SOAK=1 (several minutes of compute): the driver's
per-round pytest budget runs the fast suite; run this explicitly after
touching any of these operators —  GRAFT_SOAK=1 pytest tests/test_soak.py
Ground truths are analytic or single-pass numpy, never O(n²).
"""

import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data as rd

pytestmark = pytest.mark.skipif(
    not os.environ.get("GRAFT_SOAK"),
    reason="soak tests: set GRAFT_SOAK=1 (several minutes)",
)

N_EVENTS = 10_000_000
N_DOCS = 2_000_000


@pytest.fixture(scope="module")
def big_events():
    rng = np.random.default_rng(42)
    return pa.table({
        "day": pa.array(rng.integers(0, 3650, N_EVENTS), pa.int64()),
        "etype": pa.array(
            np.array(["a", "b", "c", "d", "e"])[rng.integers(0, 5, N_EVENTS)]
        ),
        "value": pa.array(np.round(rng.random(N_EVENTS) * 100, 2)),
        "uid": pa.array(rng.integers(0, 2_000_000, N_EVENTS), pa.int64()),
    })


def test_soak_bucketed_pivot(big_events):
    """10M rows → 3650×5 pivot: every row dimension present, global sum
    conserved to float tolerance, wall recorded."""
    from log_aggregator_ray.stages.aggregate import bucketed_pivot

    t0 = time.perf_counter()
    wide = bucketed_pivot(
        rd.from_arrow(big_events).repartition(64), "day", "etype", "value",
        col_values=["a", "b", "c", "d", "e"], num_buckets=64, round_to=None,
    ).to_pandas()
    wall = time.perf_counter() - t0
    assert len(wide) == 3650
    got_total = wide[["a", "b", "c", "d", "e"]].to_numpy().sum()
    exp_total = float(np.sum(big_events["value"].to_numpy()))
    assert abs(got_total - exp_total) < 1e-3 * max(1.0, abs(exp_total))
    # spot-check one (day, etype) cell against a direct mask
    day0 = big_events["day"].to_numpy() == 17
    ea = big_events["etype"].to_numpy(zero_copy_only=False) == "b"
    exp_cell = float(big_events["value"].to_numpy()[day0 & ea].sum())
    assert abs(float(wide.set_index("day").loc[17, "b"]) - exp_cell) < 1e-6 * max(1.0, exp_cell)
    print(f"\npivot 10M rows: {wall:.2f}s")


def test_soak_bucketed_groupby_high_cardinality(big_events):
    """2M distinct keys through the partial→shuffle→combine path: exact
    counts conserved, no driver materialization of the key space."""
    from log_aggregator_ray.stages.aggregate import bucketed_groupby

    t0 = time.perf_counter()
    out = bucketed_groupby(
        rd.from_arrow(big_events).repartition(64), ["uid"],
        {"n": (None, "count"), "s": ("value", "sum")}, num_buckets=64,
    )
    n_keys = out.count()
    tot = out.sum("n")
    wall = time.perf_counter() - t0
    assert tot == N_EVENTS
    assert n_keys == len(np.unique(big_events["uid"].to_numpy()))
    print(f"\ngroupby 10M rows / ~2M keys: {wall:.2f}s")


def test_soak_range_join_analytic():
    """Range join at 4M right rows with ANALYTIC ground truth: per key the
    right side is the integer grid 0..m-1, so count in (t-W, t] for a left
    row at t is exactly min(W, t+1) — no O(n²) reference needed."""
    from log_aggregator_ray.functions.joins import bucketed_range_agg_join

    keys, m, W = 400, 10_000, 137
    k = np.repeat(np.arange(keys, dtype=np.int64), m)
    on = np.tile(np.arange(m, dtype=np.int64), keys)
    right = pa.table({"k": pa.array(k), "on": pa.array(on),
                      "v": pa.array(np.ones(keys * m))})
    lk = np.repeat(np.arange(keys, dtype=np.int64), 50)
    lt = np.tile((np.arange(50, dtype=np.int64) * 199) % m, keys)
    left = pa.table({"k": pa.array(lk), "on": pa.array(lt),
                     "lid": pa.array(np.arange(keys * 50, dtype=np.int64))})
    t0 = time.perf_counter()
    got = bucketed_range_agg_join(
        rd.from_arrow(left).repartition(16),
        rd.from_arrow(right).repartition(32),
        "k", "on", window=W, agg_col="v", num_buckets=32,
    ).to_pandas().sort_values("lid").reset_index(drop=True)
    wall = time.perf_counter() - t0
    exp = np.minimum(W, lt + 1)
    assert (got["n_in_range"].to_numpy() == exp).all()
    assert np.allclose(got["sum_in_range"], exp.astype(float))
    print(f"\nrange join 4M right rows: {wall:.2f}s")


def test_soak_hll_vs_exact(big_events):
    """HLL at 10M rows / 5 groups vs exact distinct counts: ≤5% at p=12."""
    from log_aggregator_ray.functions.sketches import hll_group_distinct

    t0 = time.perf_counter()
    est = hll_group_distinct(
        rd.from_arrow(big_events).repartition(64), "etype", "uid"
    ).to_pandas().set_index("etype")["est_distinct"]
    wall = time.perf_counter() - t0
    df = pd.DataFrame({
        "etype": big_events["etype"].to_numpy(zero_copy_only=False),
        "uid": big_events["uid"].to_numpy(),
    })
    exact = df.groupby("etype")["uid"].nunique()
    for g in exact.index:
        assert abs(est[g] - exact[g]) / exact[g] < 0.05, (g, est[g], exact[g])
    print(f"\nhll 10M rows: {wall:.2f}s")


@pytest.fixture(scope="module")
def big_docs():
    rng = np.random.default_rng(7)
    words = rng.integers(1, 60, N_DOCS)
    # text only matters through its whitespace token count — synthesize
    # "w w w ..." directly at the target counts
    texts = pa.array(["w " * (int(n) - 1) + "w" for n in words])
    return pa.table({
        "doc_id": pa.array(np.arange(N_DOCS, dtype=np.int64)),
        "text": texts,
    }), words.astype(np.int64)


def test_soak_pack_sequences_invariants(big_docs):
    """2M docs through the distributed prefix-sum: every doc packed once,
    total tokens conserved, pack ids contiguous from 0, and every pack's
    START offset below (pack_id+1)×budget (the floor-of-prefix contract)."""
    from log_aggregator_ray.functions import shards

    docs, words = big_docs
    budget = 4096
    t0 = time.perf_counter()
    got = shards.pack_sequences(
        rd.from_arrow(docs), budget=budget, order="fast", num_ranges=64,
    ).to_pandas()
    wall = time.perf_counter() - t0
    assert len(got) == N_DOCS
    assert got["doc_id"].is_unique
    assert int(got["tokens"].sum()) == int(words.sum())
    pk = got["pack_id"].to_numpy()
    assert pk.min() == 0
    assert set(np.unique(pk)) == set(range(int(pk.max()) + 1))
    # conservation: sum of tokens in packs < id p == p*budget .. bounded
    by_pack = got.groupby("pack_id")["tokens"].sum().to_numpy()
    cum = np.cumsum(by_pack)
    # doc assigned to the pack where it STARTS ⇒ all but the last row of a
    # pack fit inside it: cumulative tokens through pack p is within one
    # max-doc of (p+1)*budget
    max_doc = int(got["tokens"].max())
    upper = (np.arange(len(by_pack), dtype=np.int64) + 1) * budget + max_doc
    assert (cum <= upper).all()
    print(f"\npack_sequences 2M docs: {wall:.2f}s")


def test_soak_pack_sequences_bpe_invariants(big_docs):
    """Same packing contract under the frozen-BPE counter at 2M docs —
    exercises the unique-word memo cache at scale (Zipfian vocab: the
    per-word merge loop runs a vanishing fraction of occurrences)."""
    from log_aggregator_ray.functions import shards

    docs, _ = big_docs
    budget = 4096
    t0 = time.perf_counter()
    got = shards.pack_sequences(
        rd.from_arrow(docs), budget=budget, order="fast", num_ranges=64,
        tokenizer="bpe",
    ).to_pandas()
    wall = time.perf_counter() - t0
    assert len(got) == N_DOCS
    assert got["doc_id"].is_unique
    assert int(got["tokens"].min()) >= 1
    pk = got["pack_id"].to_numpy()
    assert pk.min() == 0
    assert set(np.unique(pk)) == set(range(int(pk.max()) + 1))
    by_pack = got.groupby("pack_id")["tokens"].sum().to_numpy()
    cum = np.cumsum(by_pack)
    max_doc = int(got["tokens"].max())
    upper = (np.arange(len(by_pack), dtype=np.int64) + 1) * budget + max_doc
    assert (cum <= upper).all()
    print(f"\npack_sequences_bpe 2M docs: {wall:.2f}s")


def test_soak_assign_shards_invariants(big_docs):
    """2M docs → 64 shards: every doc exactly once, shard ids complete,
    per-shard positions are a permutation of 0..len-1, and the assignment
    is sharding-invariant (same result from a different block layout)."""
    from log_aggregator_ray.functions import shards

    docs, _ = big_docs
    t0 = time.perf_counter()
    a = shards.assign_shards(
        rd.from_arrow(docs), num_shards=64, order="fast"
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    wall = time.perf_counter() - t0
    assert len(a) == N_DOCS and a["doc_id"].is_unique
    assert set(a["shard"].unique()) == set(range(64))
    sizes = a.groupby("shard")["pos"].agg(["min", "max", "count"])
    assert (sizes["min"] == 0).all()
    assert (sizes["max"] == sizes["count"] - 1).all()
    b = shards.assign_shards(
        rd.from_arrow(docs).repartition(97), num_shards=64, order="fast"
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    print(f"\nassign_shards 2M docs: {wall:.2f}s")


def test_soak_topk_tokens_sketch(big_docs):
    """Heavy-hitters sketch at 2M docs with m small enough to prune: the
    guaranteed-set property holds at scale (every token with true count >
    R is returned with its exact count — here the vocabulary is tiny and
    counts are huge, so the top-k must be exact)."""
    from log_aggregator_ray.functions.sketches import topk_tokens_sketch

    docs, words = big_docs
    t0 = time.perf_counter()
    got = topk_tokens_sketch(rd.from_arrow(docs), k=5, m=4096,
                             num_buckets=8)
    wall = time.perf_counter() - t0
    # corpus is "w" repeated — one token with count == total words
    assert got["token"].iloc[0] == "w"
    assert int(got["n"].iloc[0]) == int(words.sum())
    print(f"\ntopk sketch 2M docs: {wall:.2f}s")


def test_soak_bm25_and_lm_xent(big_docs):
    """BM25 + LM cross-entropy stream 2M docs without a shuffle: row
    counts and bounds sane, wall recorded."""
    from log_aggregator_ray.functions.textstats import (bm25_scores,
                                                        lm_cross_entropy)

    docs, words = big_docs
    t0 = time.perf_counter()
    n_bm = bm25_scores(rd.from_arrow(docs), ["w"]).count()
    t_bm = time.perf_counter() - t0
    assert n_bm == N_DOCS  # every doc contains "w"
    t0 = time.perf_counter()
    xent = lm_cross_entropy(rd.from_arrow(docs), vocab_k=10)
    n_x = xent.count()
    t_x = time.perf_counter() - t0
    assert n_x == N_DOCS
    print(f"\nbm25 2M docs: {t_bm:.2f}s; lm_xent 2M docs: {t_x:.2f}s")


def test_soak_text_hygiene_ops(big_docs):
    """Round-5 text-hygiene ops at 2M docs, each against an ANALYTIC
    ground truth (no reference implementation in the loop):

    - pii_redact over doc_id-derived injected PII: per-class totals are
      exact functions of the modulus rules;
    - rep_filters: all five metrics in [0, 1]; the 'w w w …' corpus has
      a known top-2-gram ('w w') whose coverage is computable per doc;
    - decontaminate_ngrams: overlap planted in exactly the doc_ids
      divisible by 1009 → exact contaminated set."""
    docs, words = big_docs
    n = N_DOCS

    # ---- PII: inject per modulus rule, check exact class totals -------
    from log_aggregator_ray.functions.corpus import (
        decontaminate_ngrams,
        pii_redact,
    )

    def inject(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        email = np.where(ids % 5 == 0, " a@b.co", "")
        phone = np.where(ids % 3 == 0, " 415-555-0000", "")
        joined = pc.binary_join_element_wise(
            t["text"], pa.array(email), pa.array(phone), "")
        return pa.table({"doc_id": t["doc_id"], "text": joined})

    t0 = time.perf_counter()
    out = pii_redact(
        rd.from_arrow(docs).map_batches(inject, batch_format="pyarrow",
                                        zero_copy_batch=True)
    ).to_pandas()
    wall_pii = time.perf_counter() - t0
    assert len(out) == n
    assert int(out["n_email"].sum()) == (n + 4) // 5
    assert int(out["n_phone"].sum()) == (n + 2) // 3
    assert int(out["n_ip"].sum()) == 0 and int(out["n_ssn"].sum()) == 0

    # ---- repetition metrics: analytic per-doc coverage ---------------
    from log_aggregator_ray.functions.textstats import rep_filters

    t0 = time.perf_counter()
    rep = rep_filters(rd.from_arrow(docs)).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    wall_rep = time.perf_counter() - t0
    assert len(rep) == n
    for c in rep.columns.drop("doc_id"):
        v = rep[c].to_numpy()
        assert (v >= 0).all() and (v <= 1.0).all(), c
    # doc = "w " * (k-1) + "w": chars = 2k-1; for k>=2 the top 2-gram is
    # "w w" (3 chars) occurring k-1 times -> min(3(k-1)/(2k-1), 1)
    k = words
    exp2 = np.minimum(np.where(k >= 2, 3.0 * (k - 1), 0.0)
                      / np.maximum(2 * k - 1, 1), 1.0)
    assert np.allclose(rep["top_2gram_char_frac"].to_numpy(), exp2,
                       atol=1e-12)
    assert (rep["dup_line_frac"] == 0.0).all()  # single-line docs

    # ---- n-gram decontamination: planted overlap, exact hit set ------
    snip = "q0 q1 q2 q3 q4 q5 q6 q7"

    def plant(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        add = np.where(ids % 1009 == 0, " " + snip, "")
        return pa.table({
            "doc_id": t["doc_id"],
            "text": pc.binary_join_element_wise(t["text"], pa.array(add),
                                                ""),
        })

    t0 = time.perf_counter()
    dec = decontaminate_ngrams(
        rd.from_arrow(docs).map_batches(plant, batch_format="pyarrow",
                                        zero_copy_batch=True),
        [snip], n=8,
    ).to_pandas()
    wall_dec = time.perf_counter() - t0
    got_ids = set(dec.loc[dec["contaminated"], "doc_id"])
    assert got_ids == set(range(0, n, 1009))
    print(f"\npii_redact 2M docs: {wall_pii:.2f}s; rep_filters: "
          f"{wall_rep:.2f}s; decontaminate_ngrams: {wall_dec:.2f}s")


def test_soak_line_dedup_analytic(ray_session):
    """dedup_lines at 2M docs / 6M line occurrences over a 120k-line
    pool, with a CLOSED-FORM truth: doc i holds pool lines (3i, 3i+1,
    3i+2) mod P, so line j's first occurrence is flat position j — docs
    i < P/3 keep all three lines verbatim, every later doc loses all
    lines and drops.  Exercises the candidate pre-pick + first-wins
    exchange + rebuild at line volume."""
    if not os.environ.get("GRAFT_SOAK"):
        pytest.skip("set GRAFT_SOAK=1 for the 10x-scale suite")
    from log_aggregator_ray.functions.dedup import dedup_lines

    N, P = 2_000_000, 120_000
    i = np.arange(N, dtype=np.int64)
    a, b, c = (3 * i) % P, (3 * i + 1) % P, (3 * i + 2) % P
    texts = pc.binary_join_element_wise(
        pa.array(np.char.add("line", a.astype(str))),
        pa.array(np.char.add("line", b.astype(str))),
        pa.array(np.char.add("line", c.astype(str))), "\n")
    docs = pa.table({"doc_id": pa.array(i), "text": texts})

    t0 = time.perf_counter()
    out = dedup_lines(rd.from_arrow(docs)).to_pandas()
    wall = time.perf_counter() - t0
    assert len(out) == P // 3
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert np.array_equal(out["doc_id"].to_numpy(),
                          np.arange(P // 3, dtype=np.int64))
    k = out["doc_id"].to_numpy()
    exp = [f"line{3*x}\nline{3*x+1}\nline{3*x+2}" for x in k[:50]]
    assert out["text"].head(50).tolist() == exp
    # spot-check the tail too
    assert out["text"].iloc[-1] == (
        f"line{3*(P//3-1)}\nline{3*(P//3-1)+1}\nline{3*(P//3-1)+2}")
    print(f"\nline_dedup 2M docs / 6M lines: {wall:.2f}s")
