"""Mergeable sketches for approximate aggregates at 100-TB scale.

HyperLogLog (Flajolet, Fusy, Gandouet & Meunier, AofA 2007) grouped
distinct counting.  The exact ``count(DISTINCT x)`` path
(pipelines.queries.distinct_users_per_type) must shuffle one row per
distinct (group, value) pair; the sketch path ships at most
``groups_in_block × m`` tiny (group, register, rho) partial rows per
block and combines with an elementwise max — a narrow, fully mergeable
exchange whatever the value cardinality.  Standard error 1.04/sqrt(m)
(~1.6% at p=12), linear-counting correction on the low range per the
original paper.

Heavy hitters: ``topk_tokens_sketch`` is the bounded-exchange sibling of
the exact ``corpus.top_tokens`` — per-block summaries pruned to m
counters with a recorded residual bound (the pruned-partials form of
Misra-Gries / SpaceSaving merging: counts are exact lower bounds, any
token absent from the merged summary has true count ≤ R = Σ per-block
residuals).  The exact op ships every distinct token per block; the
sketch ships ≤ m+1 rows per block whatever the vocabulary.

Determinism: values hash with the repo's splitmix64 (fixed), so the
estimate is identical across runs, block orders and cluster sizes —
pinned-golden testable (the SQL-oracle compare can't express an
estimator; the pytest asserts the estimate against the exact count)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import _splitmix64


def _rho(h: np.ndarray, p: int) -> np.ndarray:
    """Register index + rank: idx = top p bits; rho = 1 + leading zeros
    of the remaining (64-p)-bit suffix (rank of the first 1-bit)."""
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = (h & np.uint64((1 << (64 - p)) - 1)).astype(np.uint64)
    # bit_length via frexp: exact for w < 2^52 (p >= 12 ⇒ w < 2^52)
    _, e = np.frexp(w.astype(np.float64))
    bitlen = e.astype(np.int64)  # 0 for w == 0
    return np.where(w == 0, 64 - p + 1, 64 - p - bitlen + 1).astype(np.int8)


def hll_group_distinct(ds, group_col: str, value_col: str, p: int = 12,
                       num_buckets: int = 16):
    """≈ SELECT group, count(DISTINCT value) via per-group HLL.

    Dataset stages: per-batch register partials (one (group, reg, rho_max)
    row per OCCUPIED register — never the dense groups×m matrix, so high
    group cardinality stays sparse) → bucketed max-combine on
    hash(group, reg) → per-group estimate, vectorized over each coarse
    group bucket.  Returns (group_col, est_distinct int64) rows."""
    if p < 12:
        raise ValueError("p >= 12 required (frexp bit-length exactness)")
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    from ..stages.aggregate import _arrow_clean, _key_bucket, bucketed_groupby

    def part(t: pa.Table) -> pa.Table:
        vals = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = _splitmix64(vals.view(np.uint64))
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        rho = _rho(h, p)
        codes, uniq = pd.factorize(
            t[group_col].to_pandas(), use_na_sentinel=False)
        key = codes.astype(np.int64) * m + idx
        # per-(group, reg) max via ONE sort: ascending (key, rho), keep
        # each key's last row
        order = np.lexsort((rho, key))
        k_s, r_s = key[order], rho[order]
        last = np.r_[k_s[1:] != k_s[:-1], True]
        k_u, r_u = k_s[last], r_s[last]
        return _arrow_clean(pd.DataFrame({
            group_col: np.asarray(uniq)[(k_u // m)],
            "reg": (k_u % m).astype(np.int32),
            "rho": r_u.astype(np.int32),
        }))

    partial = ds.map_batches(part, batch_format="pyarrow",
                             zero_copy_batch=True)
    regs = bucketed_groupby(partial, [group_col, "reg"],
                            {"rho": ("rho", "max")},
                            num_buckets=num_buckets)

    def estimate(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns="__gbucket")
        codes, uniq = pd.factorize(df[group_col], use_na_sentinel=False)
        rho = df["rho"].to_numpy().astype(np.float64)
        present = np.bincount(codes, minlength=len(uniq))
        s_pow = np.bincount(codes, weights=np.exp2(-rho),
                            minlength=len(uniq))
        zeros = (m - present).astype(np.float64)
        e = alpha * m * m / (zeros + s_pow)
        # linear counting on the low range (paper's small-range correction)
        lc = m * np.log(np.where(zeros > 0, m / np.maximum(zeros, 1), 1.0))
        e = np.where((e <= 2.5 * m) & (zeros > 0), lc, e)
        return pd.DataFrame({
            group_col: np.asarray(uniq),
            "est_distinct": np.round(e).astype(np.int64),
        })

    def add_gbucket(df: pd.DataFrame) -> pa.Table:
        return _arrow_clean(
            df.assign(__gbucket=_key_bucket(df, [group_col], num_buckets))
        )

    # final: regroup the ≤ groups×m register rows BY GROUP (the combine
    # above grouped by (group, reg) hash, which splits a group's registers
    # across buckets) and estimate per group
    return regs.map_batches(add_gbucket, batch_format="pandas").groupby(
        "__gbucket"
    ).map_groups(estimate, batch_format="pandas")


def topk_tokens_sketch(ds, text_col: str = "text", k: int = 50,
                       m: int = 4096, pattern: str | None = None,
                       num_buckets: int = 16) -> pd.DataFrame:
    """Approximate global top-k tokens with BOUNDED exchange volume: each
    block's exact counts (one pyarrow C kernel) are pruned to its m
    largest, plus one sentinel row carrying the block's residual — the
    largest pruned count, an upper bound on ANY token's uncounted mass in
    that block.  Partials merge by plain summation (the pruned-partials
    form of Misra-Gries/SpaceSaving merging), so the exchange ships
    ≤ m+1 rows per block whatever the vocabulary size; the exact
    ``corpus.top_tokens`` ships every distinct token per block.

    Guarantees (R = Σ per-block residuals, returned as ``r_bound``):
      * every returned count ``n`` is an exact LOWER bound, and
        ``n ≤ true ≤ n + R``;
      * any token NOT in the merged summary has true count ≤ R — so when
        the k-th returned count exceeds R the returned top-k SET is the
        true top-k set.
    Blocks with fewer than m distinct tokens prune nothing (R = 0 ⇒
    byte-identical to the exact op) — the small-scale oracle condition.

    Returns (token, n, n_upper, r_bound) rows, count-desc / token-asc."""
    import pyarrow.compute as pc

    from ..functions.corpus import TOKEN_SPLIT_PATTERN
    from ..stages.aggregate import bucketed_groupby

    pattern = pattern or TOKEN_SPLIT_PATTERN

    def part(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(
            pc.split_pattern_regex(pc.utf8_lower(t[text_col]), pattern)
        )
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = pc.value_counts(flat)
        tok = vc.field("values")
        n = vc.field("counts").to_numpy(zero_copy_only=False)
        if len(n) <= m:
            return pa.table({"token": tok, "n": pa.array(n, pa.int64())})
        # keep the m largest (ties token-asc for determinism); the largest
        # DROPPED count is this block's residual, carried on the sentinel
        # "" row — "" cannot collide with a real token (filtered above)
        order = np.lexsort((tok.to_numpy(zero_copy_only=False), -n))
        keep, drop = order[:m], order[m:]
        return pa.table({
            "token": pa.concat_arrays(
                [tok.take(pa.array(np.sort(keep))), pa.array([""])]
            ),
            "n": pa.array(
                np.r_[n[np.sort(keep)], int(n[drop].max())], pa.int64()
            ),
        })

    partials = ds.map_batches(part, batch_format="pyarrow",
                              zero_copy_batch=True)
    combined = bucketed_groupby(
        partials, ["token"], {"n": ("n", "sum")}, num_buckets=num_buckets
    )

    def bucket_top(df: pd.DataFrame) -> pd.DataFrame:
        # keep each bucket's top-k PLUS the sentinel (its count is R's
        # contribution and must reach the driver regardless of rank)
        top = df.sort_values(["n", "token"],
                             ascending=[False, True]).head(k)
        sent = df[df["token"] == ""]
        return pd.concat([top, sent]).drop_duplicates("token")

    tops = combined.map_batches(bucket_top, batch_format="pandas").to_pandas()
    r_bound = int(tops.loc[tops["token"] == "", "n"].sum())
    out = (
        tops[tops["token"] != ""]
        .sort_values(["n", "token"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    return out.assign(
        n=out["n"].astype("int64"),
        n_upper=(out["n"] + r_bound).astype("int64"),
        r_bound=np.int64(r_bound),
    )
