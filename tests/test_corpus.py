"""Corpus-curation operators (functions/corpus.py) and the as-of join
(functions/joins.py) against independent in-process ground truth."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from log_aggregator_ray.functions import corpus
from log_aggregator_ray.functions.joins import bucketed_asof_join


def test_asof_join_matches_pandas():
    rng = np.random.default_rng(7)
    n_l, n_r = 400, 900
    left = pd.DataFrame({
        "k": rng.integers(0, 20, n_l).astype("int64"),
        "ts": rng.integers(0, 10_000, n_l).astype("int64"),
        "lv": rng.integers(0, 1 << 30, n_l).astype("int64"),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 25, n_r).astype("int64"),
        "ts": rng.integers(0, 10_000, n_r).astype("int64"),
        # beyond 2^53: catches any float64 round-trip in the join kernel
        "rv": (rng.integers(0, 1 << 30, n_r).astype("int64") + (1 << 60)),
    })
    got = (
        bucketed_asof_join(
            rd.from_pandas(left).repartition(5),
            rd.from_pandas(right).repartition(4),
            "k", "ts", ["lv"], ["rv"], num_buckets=4,
        )
        .to_pandas()
        .sort_values(["k", "ts", "lv"])
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(
        left.sort_values("ts", kind="mergesort"),
        right.sort_values(["ts", "rv"], kind="mergesort").rename(
            columns={"ts": "ts_r"}
        ),
        left_on="ts", right_on="ts_r", by="k", direction="backward",
    ).sort_values(["k", "ts", "lv"]).reset_index(drop=True)
    exp["rv"] = exp["rv"].astype("Int64")

    assert sorted(got.columns) == sorted(exp.columns)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )
    # unmatched left rows survive with nulls; matched int64 payloads exact
    assert got["ts_r"].isna().any()
    matched = got["rv"].dropna()
    assert len(matched) and (matched.astype("int64") >= (1 << 60)).all()


def test_asof_join_int_on_column_stays_exact():
    """The right-on column is right payload too: with an int64 `on` beyond
    2^53 and unmatched left rows present, on_r must come back as nullable
    Int64 (exact), not float64 NaN (ADVICE r3)."""
    base = 1 << 60
    left = pd.DataFrame({
        "k": np.array([1, 1, 2], dtype="int64"),
        "ts": np.array([base + 10, base + 1, base + 5], dtype="int64"),
        "lv": np.array([0, 1, 2], dtype="int64"),
    })
    right = pd.DataFrame({
        "k": np.array([1], dtype="int64"),
        "ts": np.array([base + 3], dtype="int64"),
        "rv": np.array([7], dtype="int64"),
    })
    ds = bucketed_asof_join(
        rd.from_pandas(left), rd.from_pandas(right),
        "k", "ts", ["lv"], ["rv"], num_buckets=2,
    )
    # inspect at the Arrow level — the driver's compare (and any parquet
    # sink) reads Arrow; a later .to_pandas() degrading int64+null to
    # float64 is pandas' lossy default, not the operator's output
    got = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    assert pa.types.is_integer(got.schema.field("ts_r").type)
    by_lv = {r["lv"]: r for r in got.to_pylist()}
    assert by_lv[0]["ts_r"] == base + 3  # bit-exact, no 2^53 loss
    assert by_lv[1]["ts_r"] is None and by_lv[2]["ts_r"] is None


def test_top_tokens_matches_pandas():
    texts = [
        "the cat sat on the mat",
        "the dog ate the cat food",
        "a mat and a dog and a cat",
        "",
        "THE The the",
    ]
    ds = rd.from_items([{"text": t} for t in texts]).repartition(3)
    got = corpus.top_tokens(ds, k=4, num_buckets=8)

    toks = pd.Series(
        [w for t in texts for w in pd.Series([t.lower()]).str.split(r"[^a-z0-9]+")[0] if w]
    )
    exp = (
        toks.value_counts().rename_axis("token").reset_index(name="n")
        .sort_values(["n", "token"], ascending=[False, True])
        .head(4).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp, check_dtype=False
    )


def test_grouped_row_topk_matches_pandas():
    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "g": rng.integers(0, 12, 2000).astype("int64"),
        # unique order column → deterministic quota selection
        "o": rng.permutation(2000).astype("int64"),
        "p": rng.integers(0, 100, 2000).astype("int64"),
    })
    got = (
        corpus.grouped_row_topk(
            rd.from_pandas(df).repartition(7), "g", "o", ["g", "o", "p"], 15,
            num_buckets=4,
        )
        .to_pandas()
        .sort_values(["g", "o"]).reset_index(drop=True)
    )
    exp = (
        df.sort_values(["g", "o"]).groupby("g", sort=False).head(15)
        .sort_values(["g", "o"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["g", "o", "p"]], exp, check_dtype=False)
    assert got.groupby("g").size().max() <= 15


def test_stratified_sample_deterministic_and_md5_exact():
    import hashlib

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "doc_id": np.arange(1000, dtype="int64"),
        "lang": rng.choice(["en", "de", "fr"], 1000),
    })
    rates = {"en": 0.5, "de": 1.0}
    for method in ("fast", "md5"):
        a = corpus.stratified_sample(
            rd.from_pandas(df).repartition(4), "lang", rates,
            default_rate=0.25, method=method,
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        # sharding-invariant: same decisions with a different partitioning
        b = corpus.stratified_sample(
            rd.from_pandas(df).repartition(9), "lang", rates,
            default_rate=0.25, method=method,
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
        # de is kept wholesale; en/fr genuinely downsampled
        n_de = (df["lang"] == "de").sum()
        assert (a["lang"] == "de").sum() == n_de
        assert 0 < (a["lang"] == "en").sum() < (df["lang"] == "en").sum()
        if method == "md5":
            exp_rate = df["lang"].map(rates).fillna(0.25)
            u32 = df["doc_id"].map(
                lambda i: int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
            )
            exp = df[u32 < (exp_rate * 2 ** 32).astype("uint64")]
            pd.testing.assert_frame_equal(
                a, exp.reset_index(drop=True), check_dtype=False
            )


def test_budget_select_matches_windowed_cumsum():
    rng = np.random.default_rng(21)
    df = pd.DataFrame({
        "doc_id": rng.permutation(3000).astype("int64"),
        "lang": rng.choice(["en", "de", "fr"], 3000),
        "w": rng.integers(1, 200, 3000).astype("int64"),
    })
    budgets = {"en": 30_000, "de": 5_000}  # fr absent → dropped wholesale
    got = (
        corpus.budget_select(
            rd.from_pandas(df).repartition(7), "lang", "w", "doc_id",
            budgets, block_size=100,
        )
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    exp = df.sort_values("doc_id").copy()
    exp["cum"] = exp.groupby("lang")["w"].cumsum()
    exp["budget"] = exp["lang"].map(budgets).fillna(0)
    exp = exp[exp["cum"] <= exp["budget"]][["doc_id", "lang", "w"]]
    pd.testing.assert_frame_equal(
        got[["doc_id", "lang", "w"]],
        exp.reset_index(drop=True), check_dtype=False,
    )
    assert (got["lang"] != "fr").all()
    for lang, b in budgets.items():
        assert got.loc[got["lang"] == lang, "w"].sum() <= b


def _uf_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in parent}


def _edge_frame(rng, n_nodes, n_edges):
    u = rng.integers(0, n_nodes, n_edges).astype("int64")
    v = rng.integers(0, n_nodes, n_edges).astype("int64")
    keep = u != v
    return pd.DataFrame({"id_a": u[keep], "id_b": v[keep]})


def test_connected_components_local_matches_union_find():
    rng = np.random.default_rng(11)
    e = _edge_frame(rng, 300, 260)  # sparse → many components, some chains
    got = corpus.connected_components(rd.from_pandas(e).repartition(3))
    exp = _uf_components(list(zip(e["id_a"], e["id_b"])))
    got_map = dict(zip(got["doc_id"], got["comp_id"]))
    assert got_map == exp


def test_connected_components_distributed_matches_local():
    # chains are the hash-min worst case: pointer jumping must converge in
    # ~log2(len) rounds, not len — each round is a full exchange, so this
    # also keeps the test fast at num_cpus=4.
    rng = np.random.default_rng(13)
    chains = [(i, i + 1) for i in range(100, 115)] + \
             [(i, i + 1) for i in range(200, 215)]
    extra = [(300, 301), (301, 302), (302, 300), (400, 401)]
    rand = _edge_frame(rng, 80, 60)
    e = pd.concat([
        pd.DataFrame(chains + extra, columns=["id_a", "id_b"]),
        rand,
    ]).astype("int64")
    ds = rd.from_pandas(e).repartition(3)
    local = corpus.connected_components(ds)
    dist = corpus.connected_components(
        ds, num_buckets=2, local_threshold=0
    )
    if not isinstance(dist, pd.DataFrame):
        dist = dist.to_pandas()
    l = local.sort_values("doc_id").reset_index(drop=True)
    d = dist.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(l, d, check_dtype=False)


def test_connected_components_empty_edges():
    empty = rd.from_pandas(pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                         "id_b": pd.Series([], dtype="int64")}))
    out = corpus.connected_components(empty)
    assert len(out) == 0 and list(out.columns) == ["doc_id", "comp_id"]


def test_range_agg_join_matches_bruteforce():
    """bucketed_range_agg_join vs an O(n²) per-row brute force: counts and
    window sums over (on - window, on], LEFT semantics (zero-match rows
    kept), keys absent from the right side included."""
    from log_aggregator_ray.functions.joins import bucketed_range_agg_join

    rng = np.random.default_rng(13)
    n_l, n_r = 300, 800
    left = pd.DataFrame({
        "k": rng.integers(0, 15, n_l).astype("int64"),   # key 14 right-absent
        "on": rng.integers(0, 5_000, n_l).astype("int64"),
        "lid": np.arange(n_l, dtype="int64"),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 14, n_r).astype("int64"),
        "on": rng.integers(0, 5_000, n_r).astype("int64"),
        "v": np.round(rng.random(n_r) * 10, 2),
    })
    W = 500
    got = (
        bucketed_range_agg_join(
            rd.from_pandas(left).repartition(5),
            rd.from_pandas(right).repartition(4),
            "k", "on", window=W, agg_col="v", num_buckets=4,
        )
        .to_pandas().sort_values("lid").reset_index(drop=True)
    )
    exp_n, exp_s = [], []
    for _, row in left.iterrows():
        m = right[(right.k == row.k) & (right.on > row.on - W)
                  & (right.on <= row.on)]
        exp_n.append(len(m))
        exp_s.append(m.v.sum())
    assert len(got) == n_l
    assert got["n_in_range"].tolist() == exp_n
    # default round_to=None: full precision preserved (ADVICE r3)
    assert np.allclose(got["sum_in_range"], exp_s, atol=1e-9)
    # left rows with right-absent keys kept at zero
    absent = got[left.sort_values("lid").reset_index(drop=True).k == 14]
    assert (absent["n_in_range"] == 0).all()
    # opt-in rounding matches round(sum, 2)
    got2 = (
        bucketed_range_agg_join(
            rd.from_pandas(left).repartition(5),
            rd.from_pandas(right).repartition(4),
            "k", "on", window=W, agg_col="v", num_buckets=4, round_to=2,
        )
        .to_pandas().sort_values("lid").reset_index(drop=True)
    )
    assert np.allclose(got2["sum_in_range"], np.round(exp_s, 2), atol=1e-9)


def test_hll_group_distinct_accuracy():
    """HLL estimate within 5% of exact per group at p=12 (~1.6% stderr),
    deterministic across repartitionings (merge order can't change a max)."""
    from log_aggregator_ray.functions.sketches import hll_group_distinct

    rng = np.random.default_rng(5)
    n = 60_000
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], n),
        # distinct cardinality differs per group
        "uid": rng.integers(0, 8_000, n).astype("int64"),
    })
    df.loc[df.g == "b", "uid"] %= 500
    df.loc[df.g == "c", "uid"] %= 37
    exact = df.groupby("g")["uid"].nunique()
    est1 = hll_group_distinct(
        rd.from_pandas(df).repartition(7), "g", "uid"
    ).to_pandas().set_index("g")["est_distinct"]
    est2 = hll_group_distinct(
        rd.from_pandas(df).repartition(2), "g", "uid"
    ).to_pandas().set_index("g")["est_distinct"]
    for g in ["a", "b", "c"]:
        assert abs(est1[g] - exact[g]) / exact[g] < 0.05, (g, est1[g], exact[g])
        assert est1[g] == est2[g]  # partition-order invariant


def test_bucketed_pivot_matches_pandas():
    """bucketed_pivot vs an in-process pandas pivot_table: absent cells
    fill 0, explicit column set fixes the schema, count mode stays int."""
    from log_aggregator_ray.stages.aggregate import bucketed_pivot

    rng = np.random.default_rng(3)
    n = 5000
    df = pd.DataFrame({
        "row": rng.integers(0, 40, n).astype("int64"),
        "col": rng.choice(["a", "b", "c"], n),
        "v": np.round(rng.random(n) * 10, 2),
    })
    df = df[~((df.row == 7) & (df.col == "b"))]  # a hole to fill with 0
    got = (
        bucketed_pivot(rd.from_pandas(df).repartition(6), "row", "col",
                       "v", col_values=["a", "b", "c", "never"],
                       num_buckets=4)
        .to_pandas().sort_values("row").reset_index(drop=True)
    )
    exp = (
        df.pivot_table(index="row", columns="col", values="v",
                       aggfunc="sum", fill_value=0)
        .reindex(columns=["a", "b", "c", "never"], fill_value=0)
        .round(2).reset_index()
    )
    exp.columns = ["row", "a", "b", "c", "never"]
    assert list(got.columns) == ["row", "a", "b", "c", "never"]
    pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                  check_names=False)
    assert (got["never"] == 0).all()


def test_bucketed_pivot_null_row_key():
    """Regression (ADVICE r4): null row_key groups must land in their OWN
    output row, not scatter into the preceding key (pc.not_equal yields
    null — falsy — at value/null run boundaries)."""
    from log_aggregator_ray.stages.aggregate import bucketed_pivot

    df = pd.DataFrame({
        "row": pd.array(["a", "b", None, None], dtype="string"),
        "col": ["x", "x", "x", "y"],
        "v": [1.0, 2.0, 100.0, 200.0],
    })
    got = (
        bucketed_pivot(rd.from_pandas(df), "row", "col", "v",
                       col_values=["x", "y"], num_buckets=1)
        .to_pandas()
    )
    got = got.sort_values("row", na_position="last").reset_index(drop=True)
    assert len(got) == 3
    assert got.loc[0, "x"] == 1.0 and got.loc[0, "y"] == 0.0
    assert got.loc[1, "x"] == 2.0 and got.loc[1, "y"] == 0.0
    assert pd.isna(got.loc[2, "row"])
    assert got.loc[2, "x"] == 100.0 and got.loc[2, "y"] == 200.0


def test_topk_tokens_sketch_bounds_and_exactness():
    """Pruned-partials heavy hitters: with m forced below the per-block
    vocabulary, every returned count is an exact lower bound within R of
    the truth, the clear hitters (true count > R) are all present with
    EXACT counts, and with m large the sketch equals the exact op."""
    from log_aggregator_ray.functions import corpus
    from log_aggregator_ray.functions.sketches import topk_tokens_sketch

    rng = np.random.default_rng(11)
    # Zipf-ish: a few very heavy tokens + a long tail of rare ones
    heavy = [f"hot{i}" for i in range(5)]
    texts = []
    for d in range(200):
        toks = [heavy[rng.integers(0, 5)] for _ in range(40)]
        toks += [f"rare{rng.integers(0, 5000)}" for _ in range(15)]
        texts.append(" ".join(toks))
    ds = rd.from_items([{"text": t} for t in texts]).repartition(8)

    exact = corpus.top_tokens(
        rd.from_items([{"text": t} for t in texts]).repartition(8), k=2000
    ).set_index("token")["n"]

    got = topk_tokens_sketch(
        rd.from_items([{"text": t} for t in texts]).repartition(8),
        k=10, m=16, num_buckets=4,
    )
    R = int(got["r_bound"].iloc[0])
    assert R > 0  # m=16 actually pruned
    for _, row in got.iterrows():
        true = int(exact[row["token"]])
        assert row["n"] <= true <= row["n_upper"], (row["token"], true)
    # every clear hitter (true count > R) is present, with EXACT count
    # (a token in every block's top-m loses no mass)
    clear = exact[exact > R]
    assert set(heavy) <= set(clear.index)
    got_idx = got.set_index("token")
    for tok in heavy:
        assert tok in got_idx.index
        assert int(got_idx.loc[tok, "n"]) == int(exact[tok])

    # large m ⇒ nothing pruned ⇒ equal to the exact op, R = 0
    full = topk_tokens_sketch(ds, k=10, m=100_000, num_buckets=4)
    assert int(full["r_bound"].iloc[0]) == 0
    exact10 = corpus.top_tokens(
        rd.from_items([{"text": t} for t in texts]).repartition(8), k=10
    )
    pd.testing.assert_frame_equal(
        full[["token", "n"]], exact10, check_dtype=False
    )
    assert (full["n_upper"] == full["n"]).all()


def test_pii_redact_counts_and_sequencing(ray_session):
    import ray.data as rd

    from log_aggregator_ray.functions import corpus

    docs = [
        # two emails, one phone
        {"doc_id": 1, "text": "mail a@b.co or c.d+x@e-f.org, call 415-555-1234"},
        # ip + ssn; the ssn must NOT be counted as a phone (shape differs)
        {"doc_id": 2, "text": "host 10.0.3.200 owner ssn 123-45-6789"},
        # clean
        {"doc_id": 3, "text": "no pii here at all"},
        # ip octets must not leak into later pattern counts (sequencing)
        {"doc_id": 4, "text": "192.168.001.255 and 999-99-9999 and 999-999-9999"},
    ]
    out = (corpus.pii_redact(rd.from_items(docs).repartition(2))
           .to_pandas().set_index("doc_id").sort_index())

    assert out.loc[1, ["n_email", "n_ip", "n_ssn", "n_phone"]].tolist() == [2, 0, 0, 1]
    assert out.loc[1, "redacted"] == "mail <EMAIL> or <EMAIL>, call <PHONE>"
    assert out.loc[2, ["n_email", "n_ip", "n_ssn", "n_phone"]].tolist() == [0, 1, 1, 0]
    assert out.loc[2, "redacted"] == "host <IP> owner ssn <SSN>"
    assert out.loc[3, ["n_email", "n_ip", "n_ssn", "n_phone"]].tolist() == [0, 0, 0, 0]
    assert out.loc[3, "redacted"] == "no pii here at all"
    assert out.loc[4, ["n_email", "n_ip", "n_ssn", "n_phone"]].tolist() == [0, 1, 1, 1]
    assert out.loc[4, "redacted"] == "<IP> and <SSN> and <PHONE>"


def test_decontaminate_ngrams_partial_overlap(ray_session):
    import ray.data as rd

    from log_aggregator_ray.functions import corpus

    snips = ["alpha beta gamma delta epsilon zeta eta theta iota"]
    docs = [
        # full 8-gram inside different surroundings: substring matching
        # on the raw snippet would MISS this (different punctuation),
        # n-gram overlap must flag it
        {"doc_id": 0,
         "text": "intro: ALPHA beta, gamma delta epsilon zeta eta theta!"},
        {"doc_id": 1, "text": "alpha beta gamma delta"},          # < n tokens
        {"doc_id": 2, "text": "nothing shared with the eval set"},
        # two overlapping hit grams (9 matching tokens)
        {"doc_id": 3,
         "text": "x alpha beta gamma delta epsilon zeta eta theta iota y"},
        {"doc_id": 4, "text": ""},
    ]
    out = (corpus.decontaminate_ngrams(
        rd.from_items(docs).repartition(2), snips, n=8)
        .to_pandas().set_index("doc_id").sort_index())
    assert out["contaminated"].tolist() == [True, False, False, True, False]
    assert out["n_hit_grams"].tolist() == [1, 0, 0, 2, 0]

    # substring decontamination indeed misses doc 0 (case/punct changed)
    sub = (corpus.decontaminate(rd.from_items(docs).repartition(2), snips)
           .to_pandas().set_index("doc_id").sort_index())
    assert not sub.loc[0, "contaminated"]

    # empty eval set -> typed all-false
    none = (corpus.decontaminate_ngrams(
        rd.from_items(docs).repartition(2), [], n=8)
        .to_pandas())
    assert not none["contaminated"].any() and (none["n_hit_grams"] == 0).all()
