"""Corpus-curation operators (SURVEY §2.12): global vocabulary heavy
hitters, per-group row quotas, and near-dup connected components.

These are the operators a web-scale training-data pipeline runs between
dedup and sharding: build the token vocabulary (boilerplate detection,
tokenizer fitting), cap any one domain's share of the corpus, and collapse
verified near-duplicate pairs into clusters so exactly one representative
per cluster survives.  The reference has no analog (its dedup is per-key
exact, SURVEY D1/D2) — these extend §2.8/§2.12.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.aggregate import _arrow_clean, _key_bucket, bucketed_groupby

# Tokenizer used by both the Ray op and its SQL oracle: RE2 on both engines
# (pyarrow split_pattern_regex / DuckDB string_split_regex), so boundaries
# match byte-for-byte on ASCII text.
TOKEN_SPLIT_PATTERN = "[^a-z0-9]+"


def top_tokens(ds, text_col: str = "text", k: int = 50,
               pattern: str = TOKEN_SPLIT_PATTERN,
               num_buckets: int = 64) -> pd.DataFrame:
    """Global top-k most frequent tokens — the vocabulary heavy-hitter
    pass.  Fully distributed: per-batch C partials (lower → regex split →
    flatten → value_counts, one row per distinct token per block), one
    hash-bucketed combine (``bucketed_groupby`` — the vocabulary never
    lands on one machine), per-bucket top-k prune, and a driver final over
    ≤ buckets×k rows.

    Exactness: after the bucketed combine each token has exactly ONE row
    globally, so per-block top-k then global top-k loses nothing.  Ties
    break lexicographically (count desc, token asc) to keep the output
    deterministic and oracle-comparable."""

    def part(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(
            pc.split_pattern_regex(pc.utf8_lower(t[text_col]), pattern)
        )
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = pc.value_counts(flat)
        return pa.table({"token": vc.field("values"), "n": vc.field("counts")})

    partials = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True)
    combined = bucketed_groupby(
        partials, ["token"], {"n": ("n", "sum")}, num_buckets=num_buckets
    )

    def bucket_top(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n", "token"], ascending=[False, True]).head(k)

    tops = combined.map_batches(bucket_top, batch_format="pandas").to_pandas()
    out = (
        tops.sort_values(["n", "token"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    return out.assign(n=out["n"].astype("int64"))


def grouped_row_topk(ds, key: str, order_col: str, cols: list[str], k: int,
                     num_buckets: int = 64, ascending: bool = True):
    """Per-group row quota (the Common-Crawl per-domain cap): keep each
    key's k first ROWS by ``order_col``.  Distinct from aggregate top-k
    (pipelines.queries.top_users_per_type): this selects rows, it doesn't
    summarize them.

    Per-batch vectorized prune first — at most k rows per key per block
    ride the exchange — then one shuffle on hash(key) and an exact
    per-bucket final; a group never materializes more than k×blocks rows
    anywhere.  Ties in ``order_col`` within a key are broken by block
    order (nondeterministic): pass a unique order column (id, or a
    composite packed into one) when the output feeds a hash-compared or
    resumable step."""
    cols = [c for c in cols if c not in (key, order_col)]
    sel = [key, order_col] + cols

    def part(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values([key, order_col],
                            ascending=[True, ascending], kind="mergesort")
        out = df.groupby(key, sort=False).head(k)
        return _arrow_clean(
            out.assign(__bucket=_key_bucket(out, [key], num_buckets))
        )

    def final(df: pd.DataFrame) -> pa.Table:
        df = df.drop(columns="__bucket").sort_values(
            [key, order_col], ascending=[True, ascending], kind="mergesort"
        )
        out = df.groupby(key, sort=False).head(k)
        return pa.Table.from_pandas(
            out, preserve_index=False
        ).replace_schema_metadata(None)

    return (
        ds.select_columns(sel)
        .map_batches(part, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(final, batch_format="pandas")
    )


def stratified_sample(ds, strata_col: str, rates: dict,
                      id_col: str = "doc_id", default_rate: float = 0.0,
                      method: str = "fast"):
    """Deterministic per-stratum downsampling — corpus mixing / domain
    rebalancing: keep a row iff hash(id) maps below its stratum's rate.
    Same id → same decision on every run, machine and shard (unlike
    ``Dataset.random_sample``), so re-runs and resumed partitions agree,
    and a weighted multi-source mix is just rates keyed by source.
    Embarrassingly parallel: one filter per batch, no shuffle.

    method="fast" (primary): one vectorized siphash over the id column
    (``stages.route.stable_hash``, same convention as
    ``textstats.add_split_column_fast``), threshold at rate×10000.
    method="md5": per-row md5 → first-8-hex-digits / 2^32 — slower, kept
    because DuckDB reproduces it exactly (the live SQL oracle); pass
    exactly-representable rates (k/2^n) so float thresholds are exact on
    both engines."""
    import hashlib

    def keep(t: pa.Table) -> pa.Table:
        strata = t[strata_col].to_pandas()
        rate = strata.map(rates).fillna(default_rate).to_numpy(np.float64)
        if method == "fast":
            from ..stages.route import stable_hash

            h = stable_hash(t[id_col])  # zero-copy off the Arrow buffers
            mask = (h % np.uint64(10_000)) < (rate * 10_000).astype(np.uint64)
        else:
            u32 = np.fromiter(
                (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
                 for i in t[id_col].to_pylist()),
                dtype=np.uint64, count=t.num_rows,
            )
            mask = u32 < (rate * float(2 ** 32)).astype(np.uint64)
        return t.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def budget_select(ds, strata_col: str, weight_col: str, order_col: str,
                  budgets: dict, block_size: int = 4096):
    """Select rows per stratum, in ``order_col`` order, until the stratum's
    cumulative ``weight_col`` budget is spent (row kept iff its INCLUSIVE
    running sum ≤ budget) — the token-budget cutoff of a data-mixing recipe
    ("2B tokens of lang X, ordered by quality/id").

    A naive global windowed cumsum needs a total sort per stratum; this is
    the scale-correct two-pass form (the flagship's turn-block pattern):

      1. one partial-agg pass → per-(stratum, order-block) weight sums,
         O(strata × blocks) rows to the driver;
      2. driver prefix-sums each stratum → every block is fully-kept,
         fully-dropped, or THE boundary block, each with its remaining
         budget (broadcast, O(strata));
      3. one filter pass keeps/drops whole blocks vectorized; only rows of
         a boundary block (≤ block_size × strata rows) take the exact
         per-stratum cumsum, in one tiny groupby.

    ``order_col`` must be numeric and unique per row (ids); blocks are
    value ranges ``order // block_size``, so per-block sums are exact
    regardless of sharding."""
    from .joins import bucketed_inner_join  # noqa: F401  (doc cross-ref)
    from ..stages.aggregate import partial_groupby

    import ray as _ray

    def add_block(t: pa.Table) -> pa.Table:
        o = t[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("__block", pa.array(o // block_size))

    blocked = ds.map_batches(
        add_block, batch_format="pyarrow", zero_copy_batch=True
    )
    sums = partial_groupby(
        blocked, [strata_col, "__block"], {"w": (weight_col, "sum")}
    ).sort_values([strata_col, "__block"])

    # driver: per-stratum prefix → full-keep cutoff + boundary budget
    keep_upto: dict = {}      # stratum → last fully-kept block (exclusive)
    boundary: dict = {}       # stratum → (boundary block, budget left)
    for s, g in sums.groupby(strata_col, sort=False):
        budget = budgets.get(s)
        if budget is None:
            continue
        cum = g["w"].cumsum()
        full = g[cum <= budget]
        keep_upto[s] = int(full["__block"].iloc[-1]) + 1 if len(full) else -1
        rest = g[cum > budget]
        if len(rest):
            spent = int(full["w"].sum()) if len(full) else 0
            boundary[s] = (int(rest["__block"].iloc[0]), budget - spent)
    plan_ref = _ray.put((keep_upto, boundary))

    def cut(t: pa.Table) -> pa.Table:
        keep_upto_, boundary_ = _ray.get(plan_ref)
        s = t[strata_col].to_pandas()
        blk = t["__block"].to_numpy(zero_copy_only=False)
        upto = s.map(keep_upto_).fillna(-1).to_numpy(np.int64)
        bnd = s.map({k: b for k, (b, _) in boundary_.items()}).fillna(
            -2
        ).to_numpy(np.int64)
        full_keep = blk < upto
        on_boundary = blk == bnd
        kept = t.filter(pa.array(full_keep)).drop_columns(["__block"])
        edge = t.filter(pa.array(on_boundary))
        return kept, edge

    # pass 3a: whole-block keeps stream straight through
    kept = blocked.map_batches(
        lambda t: cut(t)[0], batch_format="pyarrow", zero_copy_batch=True
    )
    # pass 3b: boundary rows (tiny) → exact per-stratum cumsum in one task
    edge = blocked.map_batches(
        lambda t: cut(t)[1], batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()

    _, boundary_map = keep_upto, boundary
    if len(edge):
        edge = edge.sort_values([strata_col, order_col], kind="mergesort")
        # every edge row's stratum has a boundary entry by construction, so
        # the map is total and the comparison stays exact int64
        left = edge[strata_col].map(
            {k: r for k, (_, r) in boundary_map.items()}
        ).to_numpy(np.int64)
        cum = edge.groupby(strata_col, sort=False)[weight_col].cumsum()
        edge = edge[cum.to_numpy(np.int64) <= left]
        edge = edge.drop(columns="__block")

    import ray.data as rd

    if len(edge):
        from ..stages.aggregate import _arrow_clean

        return kept.union(rd.from_arrow(_arrow_clean(edge)))
    return kept


# ---------------------------------------------------------------------------
# connected components (near-dup cluster collapse)
# ---------------------------------------------------------------------------

def _local_components(u: np.ndarray, v: np.ndarray) -> pd.DataFrame:
    """Vectorized hash-min with pointer jumping on one machine: labels
    start as own node id; each round propagates the min label across every
    edge (np.minimum.at scatter) THEN jumps each label to its label's
    label (path halving), so convergence is O(log n) rounds — no Python
    loop over edges.  Same algorithm as the distributed path below, which
    keeps the two paths trivially comparable in tests."""
    nodes = np.unique(np.concatenate([u, v]))
    ui = np.searchsorted(nodes, u)
    vi = np.searchsorted(nodes, v)
    lbl = nodes.copy()
    while True:
        prev_sum = lbl.sum()
        m = np.minimum(lbl[ui], lbl[vi])
        np.minimum.at(lbl, ui, m)
        np.minimum.at(lbl, vi, m)
        # pointer jump: a label IS a node id → adopt that node's label
        lbl = lbl[np.searchsorted(nodes, lbl)]
        if lbl.sum() == prev_sum:
            break
    return pd.DataFrame({"doc_id": nodes, "comp_id": lbl})


def connected_components(edges, src: str = "id_a", dst: str = "id_b",
                         num_buckets: int = 16, max_iters: int = 64,
                         local_threshold: int = 2_000_000) -> pd.DataFrame:
    """Connected components of an undirected edge list; each node gets
    ``comp_id`` = the minimum node id in its component.  The near-dup
    cluster collapse: feed it verified near-dup pairs and keep one doc per
    comp_id.

    Edge lists are sparse relative to the corpus (only docs in ≥1 pair
    appear), so below ``local_threshold`` edges the vectorized local
    kernel runs on the driver — the same size-guard pattern as the
    broadcast join (pipelines.queries.revenue_by_nation).  Above it, the
    distributed hash-min iteration: labels live as a Dataset, each round
    joins edge endpoints to current labels (one bucketed shuffle), takes
    the per-node min (one bucketed groupby), then POINTER-JUMPS
    (lbl ← lbl[lbl], one self-join of the labels table — valid because
    every label is itself a node id and labels are monotone
    non-increasing), and stops when the global label sum is unchanged
    (labels only ever decrease, so sum is a fixpoint witness).  The jump
    halves the remaining path every round, so rounds = O(log diameter)
    instead of O(diameter) — the difference between ~5 and ~50 all-to-all
    exchanges on a chain-shaped dup cluster.  (Same doubling idea as
    large-star/small-star — Kiveris et al., "Connected Components in
    MapReduce and Beyond", SOCC'14.)"""
    import ray.data  # noqa: F401  (Dataset type comes in via duck typing)

    n_edges = edges.count()
    if n_edges == 0:
        return pd.DataFrame({
            "doc_id": pd.Series([], dtype="int64"),
            "comp_id": pd.Series([], dtype="int64"),
        })
    if n_edges <= local_threshold:
        e = edges.select_columns([src, dst]).to_pandas()
        return _local_components(
            e[src].to_numpy(np.int64), e[dst].to_numpy(np.int64)
        )

    # ---- distributed hash-min ------------------------------------------
    def und(t: pa.Table) -> pa.Table:
        a = t[src].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "node": np.concatenate([a, b]),
            "nbr": np.concatenate([b, a]),
        })

    e2 = edges.map_batches(und, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()

    # labels start as own id (distinct nodes via bucketed distinct)
    labels = bucketed_groupby(
        e2.select_columns(["node"]), ["node"], {"lbl": ("node", "min")},
        num_buckets=num_buckets,
    ).materialize()

    def lbl_sum(ds) -> int:
        return int(ds.map_batches(
            lambda df: pd.DataFrame({"s": [df["lbl"].sum()]}),
            batch_format="pandas",
        ).to_pandas()["s"].sum())

    from .joins import bucketed_inner_join

    def as_kv(ds, key_col: str, val_col: str, out_val: str):
        return ds.map_batches(
            lambda df, k=key_col, v=val_col, o=out_val: pd.DataFrame(
                {"k": df[k].astype("int64"), o: df[v].astype("int64")}
            ),
            batch_format="pandas",
        )

    prev = lbl_sum(labels)
    for _ in range(max_iters):
        # candidate labels for each node: its neighbors' current labels —
        # join e2.nbr → labels.node (rename so the join key lines up)
        nbr_lbl = bucketed_inner_join(
            e2.map_batches(
                lambda t: pa.table({"k": t["nbr"], "node": t["node"]}),
                batch_format="pyarrow", zero_copy_batch=True,
            ),
            as_kv(labels, "node", "lbl", "lbl"),
            "k", ["node"], ["lbl"], num_buckets=num_buckets,
        ).select_columns(["node", "lbl"])
        # materialize: the self-join below reads `labels` twice, and a lazy
        # Dataset would re-execute the whole groupby once per branch.
        # repartition first: shuffle stages emit one output block per INPUT
        # block, and the self-join doubles the label block count, so without
        # a cap the block count compounds ~4× per round and scheduling
        # overhead, not data, dominates (measured 18 → 78 → 318 blocks and
        # 3 s → 30 s → 230 s rounds on a 23-node graph).
        labels = bucketed_groupby(
            nbr_lbl.union(labels.select_columns(["node", "lbl"])),
            ["node"], {"lbl": ("lbl", "min")}, num_buckets=num_buckets,
        ).repartition(num_buckets).materialize()
        # pointer jump: lbl ← lbl[lbl].  Every label IS a node id and every
        # node has exactly one labels row, so the self-join matches 1:1.
        labels = bucketed_inner_join(
            as_kv(labels, "lbl", "node", "node"),
            as_kv(labels, "node", "lbl", "lbl"),
            "k", ["node"], ["lbl"], num_buckets=num_buckets,
        ).select_columns(["node", "lbl"]).repartition(num_buckets).materialize()
        cur = lbl_sum(labels)
        if cur == prev:
            break
        prev = cur

    # distributed path returns the labels DATASET (doc_id, comp_id) — node
    # count can exceed driver memory; the caller joins/writes it streamed
    return labels.map_batches(
        lambda df: pd.DataFrame({
            "doc_id": df["node"].astype("int64"),
            "comp_id": df["lbl"].astype("int64"),
        }),
        batch_format="pandas",
    )


def decontaminate(ds, snippets: list[str], text_col: str = "text",
                  id_col: str = "doc_id", flag_col: str = "contaminated"):
    """Benchmark decontamination: flag documents containing any snippet of
    a (small) evaluation/contamination set — the standard pre-training
    hygiene pass that keeps eval data out of the training corpus.

    Scale shape: the snippet set is SMALL by construction (eval sets are
    thousands of strings at most) and broadcast inside the task closure;
    the corpus streams through one vectorized RE2 pass — the snippets are
    compiled into a single alternation, which RE2 matches in one linear
    scan regardless of snippet count (the Aho-Corasick-equivalent
    automaton), so cost is O(corpus bytes), not O(corpus × snippets).
    Production sets beyond RE2's program-size limit would bucket snippets
    into a few alternations — same shape, still one streaming pass.

    Returns (id, contaminated bool) per document."""
    import re as _re

    if not snippets:
        def none(t: pa.Table) -> pa.Table:
            return pa.table({
                id_col: t[id_col],
                flag_col: pa.array(np.zeros(t.num_rows, bool)),
            })

        return ds.map_batches(none, batch_format="pyarrow",
                              zero_copy_batch=True)
    pattern = "(?:" + "|".join(_re.escape(s) for s in snippets) + ")"

    def flag(t: pa.Table) -> pa.Table:
        hit = pc.match_substring_regex(t[text_col], pattern)
        return pa.table({id_col: t[id_col], flag_col: hit})

    return ds.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


# PII classes scrubbed by pii_redact, in application order (earlier classes
# are replaced before later ones are counted, so e.g. the octets of an
# already-redacted IP can never be miscounted as a phone number).  The
# patterns are plain RE2 — DuckDB's regexp_* functions use RE2 too, so an
# oracle can replay the identical sequence with regexp_replace(..., 'g').
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
]


def pii_redact(ds, text_col: str = "text", id_col: str = "doc_id",
               patterns: list[tuple[str, str, str]] | None = None):
    """PII scrubbing — the standard pre-training hygiene pass alongside
    decontamination (reference has no equivalent; this is a §2.12
    training-data op).  For each (class, regex, token) in ``patterns``,
    count the matches then replace them with the class token, feeding the
    redacted text to the next class.

    Scale shape: a fixed number of vectorized RE2 passes
    (pc.count_substring_regex + pc.replace_substring_regex) over streamed
    Arrow batches — O(classes × corpus bytes), zero shuffle, zero state.
    Returns (id, n_<class>... , redacted) per document."""
    pats = PII_PATTERNS if patterns is None else patterns

    def scrub(t: pa.Table) -> pa.Table:
        s = t[text_col]
        cols: dict = {id_col: t[id_col]}
        for name, pat, tok in pats:
            cols[f"n_{name}"] = pc.cast(
                pc.count_substring_regex(s, pat), pa.int64())
            s = pc.replace_substring_regex(s, pat, tok)
        cols["redacted"] = s
        return pa.table(cols)

    return ds.map_batches(scrub, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)


def decontaminate_ngrams(ds, snippets: list[str], n: int = 8,
                         text_col: str = "text", id_col: str = "doc_id",
                         flag_col: str = "contaminated",
                         count_col: str = "n_hit_grams"):
    """Token-n-gram overlap decontamination — the GPT-3-appendix-C-style
    variant of ``decontaminate``: a document is contaminated if any of
    its word n-grams appears in the eval set's n-grams, which also
    catches PARTIAL overlaps (an eval question quoted mid-paragraph with
    different surrounding text) that substring matching misses.

    Scale shape: the eval set tokenizes driver-side (it is small by
    construction) into a few thousand n-gram hashes broadcast in the task
    closure; the corpus streams through one tokenize + one
    binary_join_element_wise (n zero-copy slices of the flat token
    array) + one vectorized stable_hash + np.isin per batch — zero
    shuffle, O(corpus tokens).  Membership is by 64-bit hash on the Ray
    side (strings on the SQL-oracle side); a false flag needs an xxhash64
    collision between an eval gram and a corpus gram (~2^-64 per pair —
    negligible, and only ever flips a flag, never corrupts data).

    Returns (id, contaminated bool, n_hit_grams int64) per document."""
    import re as _re

    from ..stages.route import stable_hash

    split_re = _re.compile(TOKEN_SPLIT_PATTERN)
    eval_grams: list[str] = []
    for s in snippets:
        toks = [t for t in split_re.split(s.lower()) if t]
        eval_grams += [" ".join(toks[i:i + n])
                       for i in range(len(toks) - n + 1)]
    if not eval_grams:
        def none(t: pa.Table) -> pa.Table:
            return pa.table({
                id_col: t[id_col],
                flag_col: pa.array(np.zeros(t.num_rows, bool)),
                count_col: pa.array(np.zeros(t.num_rows, np.int64)),
            })

        return ds.map_batches(none, batch_format="pyarrow",
                              zero_copy_batch=True)
    eval_hashes = np.unique(stable_hash(pa.array(sorted(set(eval_grams)))))

    def flag(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t[text_col]),
                                      TOKEN_SPLIT_PATTERN)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        parent = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        parent, flat = parent[keep], flat.filter(pa.array(keep))
        m = len(flat)
        nhit = np.zeros(t.num_rows, np.int64)
        if m >= n:
            npos = m - n + 1
            grams = pc.binary_join_element_wise(
                *[flat.slice(j, npos) for j in range(n)], " ")
            ok = parent[:npos] == parent[n - 1:]
            h = stable_hash(grams)
            hit = np.isin(h, eval_hashes) & ok
            nhit = np.bincount(parent[:npos][hit],
                               minlength=t.num_rows).astype(np.int64)
        return pa.table({
            id_col: t[id_col],
            flag_col: pa.array(nhit > 0),
            count_col: pa.array(nhit),
        })

    return ds.map_batches(flag, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)
