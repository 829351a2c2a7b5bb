"""Join operators (SURVEY §2.5; guide's partitioned-hash-join pattern).

The reference has no relational join (its lookups are broadcast-style,
SURVEY J1-J3), but a complete engine needs one.  Two shapes:

  * broadcast join — small side via ``ray.put`` + per-batch merge (see
    pipelines.queries.revenue_by_nation and stages.enrich); no shuffle.
  * bucketed hash join (here) — both sides large: tag rows with
    ``bucket = hash(key) % B``, union the two sides into one dataset with
    one aligned schema, ``groupby(bucket)`` once, and hash-join each
    bucket's two sides inside ``map_groups``.  One shuffle total (the
    union rides the same exchange).  Skew note: salt hot keys into
    sub-buckets before the groupby (stages.skew shows the pattern).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def bucketed_inner_join(left, right, key: str, left_cols: list[str],
                        right_cols: list[str], num_buckets: int = 32,
                        hot_keys: list[int] | None = None, salt: int = 8):
    """Inner join two Datasets on an integer key column.

    ``left_cols`` / ``right_cols``: columns carried from each side (the key
    is implied and appears once in the output).  Output columns:
    ``[key] + left_cols + right_cols``.

    ``hot_keys``: skew salting for pathologically frequent join keys.  A
    hot key's LEFT (probe) rows are sprayed across ``salt`` sub-buckets
    beyond the hash range, and its RIGHT (build) rows are REPLICATED into
    each — the standard salted-join recipe: the straggler bucket becomes
    ``salt`` balanced tasks at the cost of duplicating only the hot build
    rows.  Detect candidates with ``stages.skew.detect_hot_sinks``-style
    partial counts or a sample.
    """
    left_cols = [c for c in left_cols if c != key]
    right_cols = [c for c in right_cols if c != key]
    hot = np.sort(np.asarray(hot_keys, dtype=np.int64)) if hot_keys else None

    def _bucket_of(k: np.ndarray, side: int, n: int) -> np.ndarray:
        b = (k % num_buckets).astype(np.int32)
        if hot is None:
            return b
        idx = np.searchsorted(hot, k)
        idx_c = np.minimum(idx, len(hot) - 1)
        is_hot = hot[idx_c] == k
        if side == 0:
            # probe rows: deterministic spray over the key's salt range
            spray = (np.arange(n) % salt).astype(np.int32)
            return np.where(
                is_hot, num_buckets + idx_c * salt + spray, b
            ).astype(np.int32)
        return np.where(is_hot, num_buckets + idx_c * salt, b).astype(np.int32)

    def _types(ds, cols):
        sch = ds.schema()  # ray Schema: .names + .types (pa or numpy dtypes)
        out = {}
        for c in cols:
            t = sch.types[sch.names.index(c)]
            if isinstance(t, pa.DataType):
                out[c] = t
            elif t == np.dtype(object):
                out[c] = pa.string()  # pandas object column = strings here
            else:
                out[c] = pa.from_numpy_dtype(t)
        return out

    l_types = _types(left, left_cols)
    r_types = _types(right, right_cols)
    union_cols = [key] + left_cols + right_cols  # one fixed order

    def make_tag(side: int, own: list[str], other_types: dict):
        def tag(t: pa.Table) -> pa.Table:
            n = t.num_rows
            k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
            out = {key: t[key]}
            for c in union_cols[1:]:
                out[c] = t[c] if c in own else pa.nulls(n, other_types[c])
            out["__side"] = pa.array(np.full(n, side, dtype=np.int8))
            bucket = _bucket_of(k, side, n)
            out["bucket"] = pa.array(bucket)
            tbl = pa.table(out)
            if side == 1 and hot is not None:
                # replicate build rows of hot keys into every salt bucket
                hot_mask = np.isin(k, hot)
                if hot_mask.any():
                    base = tbl.filter(pa.array(hot_mask))
                    bb = bucket[hot_mask]
                    i = tbl.column_names.index("bucket")
                    copies = [
                        base.set_column(
                            i, "bucket", pa.array((bb + s).astype(np.int32))
                        )
                        for s in range(1, salt)
                    ]
                    tbl = pa.concat_tables([tbl] + copies)
            return tbl

        return tag

    l_tagged = left.select_columns([key] + left_cols).map_batches(
        make_tag(0, left_cols, r_types), batch_format="pyarrow", zero_copy_batch=True
    )
    r_tagged = right.select_columns([key] + right_cols).map_batches(
        make_tag(1, right_cols, l_types), batch_format="pyarrow", zero_copy_batch=True
    )

    def merge(t: pa.Table) -> pa.Table:
        # slice the two sides in ARROW before pandas: converting the whole
        # union block at once turns every typed-null payload column into
        # float64, silently corrupting int64 values beyond 2^53 (hash ids)
        side = t["__side"]
        l = t.filter(pc.equal(side, 0)).select([key] + left_cols).to_pandas()
        r = t.filter(pc.equal(side, 1)).select([key] + right_cols).to_pandas()
        out = l.merge(r, on=key, how="inner")
        # plain Arrow out: pandas schema metadata (a dict) breaks Ray's
        # block-schema hashing and spams reduce-stage warnings
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    return (
        l_tagged.union(r_tagged)
        .groupby("bucket")
        .map_groups(merge, batch_format="pyarrow")
    )


def bucketed_asof_join(left, right, key: str, on: str,
                       left_cols: list[str], right_cols: list[str],
                       num_buckets: int = 32, right_on_name: str | None = None):
    """Keyed as-of (backward) join: for each LEFT row, the RIGHT row with
    the same ``key`` and the greatest ``on`` ≤ the left row's ``on`` —
    SQL ``ASOF LEFT JOIN`` (DuckDB) / "most recent fact at event time".
    The attribution/point-in-time-enrichment shape a log pipeline needs
    (e.g. each purchase ↔ the user's latest preceding click), which plain
    equi-joins can't express.

    Both sides large: the same one-shuffle union-tag exchange as
    ``bucketed_inner_join`` (bucket = hash(key) % B).  Partitioning
    assumption: one key's rows land in one task — range-split or salt a
    pathologically hot key first (the flagship's hot-sink pattern).
    Within a bucket the match is ONE ``pd.merge_asof`` C kernel over all
    of the bucket's keys.

    Unmatched left rows keep typed nulls for the right columns.  Output:
    ``[key, on] + left_cols + [right_on_name or f"{on}_r"] + right_cols``.
    Tie determinism: several right rows sharing (key, on) are ordered by
    ``[on] + right_cols`` before the kernel, so the surviving row is
    deterministic regardless of block arrival order."""
    left_cols = [c for c in left_cols if c not in (key, on)]
    right_cols = [c for c in right_cols if c not in (key, on)]
    on_r = right_on_name or f"{on}_r"

    def _types(ds, cols):
        sch = ds.schema()
        out = {}
        for c in cols:
            t = sch.types[sch.names.index(c)]
            if isinstance(t, pa.DataType):
                out[c] = t
            elif t == np.dtype(object):
                out[c] = pa.string()
            else:
                out[c] = pa.from_numpy_dtype(t)
        return out

    l_types = _types(left, left_cols)
    r_types = _types(right, right_cols)
    r_on_is_int = pa.types.is_integer(_types(right, [on])[on])
    union_payload = left_cols + right_cols

    def make_tag(side: int, own: list[str], other_types: dict):
        def tag(t: pa.Table) -> pa.Table:
            n = t.num_rows
            k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
            out = {key: t[key], on: t[on]}
            for c in union_payload:
                out[c] = t[c] if c in own else pa.nulls(n, other_types[c])
            out["__side"] = pa.array(np.full(n, side, dtype=np.int8))
            out["bucket"] = pa.array((k % num_buckets).astype(np.int32))
            return pa.table(out)

        return tag

    l_tagged = left.select_columns([key, on] + left_cols).map_batches(
        make_tag(0, left_cols, r_types), batch_format="pyarrow",
        zero_copy_batch=True,
    )
    r_tagged = right.select_columns([key, on] + right_cols).map_batches(
        make_tag(1, right_cols, l_types), batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def merge(t: pa.Table) -> pa.Table:
        # Arrow-slice each side before pandas (see bucketed_inner_join's
        # merge note — whole-block conversion degrades int64 to float64)
        side = t["__side"]
        l = (
            t.filter(pc.equal(side, 0)).select([key, on] + left_cols)
            .to_pandas().sort_values(on, kind="mergesort")
        )
        r = (
            t.filter(pc.equal(side, 1)).select([key, on] + right_cols)
            .to_pandas().sort_values([on] + right_cols, kind="mergesort")
            .rename(columns={on: on_r})
        )
        # the right-on column is right payload too: merge_asof emits it
        # with NaN for unmatched left rows, degrading an int64 `on` to
        # float64 and losing exactness beyond 2^53 (e.g. hash ids as the
        # ordering key) — so carry an exact nullable-Int64 twin through
        # the merge as payload and swap it in afterward (ADVICE r3)
        if r_on_is_int:
            r["__on_exact"] = r[on_r].astype("Int64")
        out = pd.merge_asof(
            l, r, left_on=on, right_on=on_r, by=key, direction="backward"
        )
        if r_on_is_int:
            out[on_r] = out["__on_exact"]
            out = out.drop(columns=["__on_exact"])
        # unmatched left rows put NaN into integer right payloads; pandas'
        # nullable Int64 keeps them exact int64-with-null through Arrow
        for c, t_ in r_types.items():
            if pa.types.is_integer(t_):
                out[c] = out[c].astype("Int64")
        return pa.Table.from_pandas(
            out, preserve_index=False
        ).replace_schema_metadata(None)

    return (
        l_tagged.union(r_tagged)
        .groupby("bucket")
        .map_groups(merge, batch_format="pyarrow")
    )


def _bucketed_membership_join(left, right, key: str, left_cols: list[str],
                              num_buckets: int, keep_members: bool):
    """Shared semi/anti machinery: ship ONLY the distinct right-side keys
    (per-batch distinct partials — the membership side never carries
    payload), one shuffle, vectorized isin per bucket."""
    left_cols = [c for c in left_cols if c != key]

    def tag_left(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            key: t[key],
            **{c: t[c] for c in left_cols},
            "__side": pa.array(np.zeros(t.num_rows, np.int8)),
            "bucket": pa.array((k % num_buckets).astype(np.int32)),
        })

    # the union needs one aligned schema, so the right (membership) side
    # carries typed nulls for the left's payload columns — they are never
    # read, only schema filler
    def _types(ds, cols):
        sch = ds.schema()
        out = {}
        for c in cols:
            t = sch.types[sch.names.index(c)]
            if isinstance(t, pa.DataType):
                out[c] = t
            elif t == np.dtype(object):
                out[c] = pa.string()
            else:
                out[c] = pa.from_numpy_dtype(t)
        return out

    l_types = _types(left, left_cols)

    def tag_right(t: pa.Table) -> pa.Table:
        ks = t.select([key]).group_by(key).aggregate([])  # distinct per block
        k = ks[key].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            key: ks[key],
            **{c: pa.nulls(ks.num_rows, l_types[c]) for c in left_cols},
            "__side": pa.array(np.ones(ks.num_rows, np.int8)),
            "bucket": pa.array((k % num_buckets).astype(np.int32)),
        })

    l_tagged = left.select_columns([key] + left_cols).map_batches(
        tag_left, batch_format="pyarrow", zero_copy_batch=True
    )
    r_tagged = right.select_columns([key]).map_batches(
        tag_right, batch_format="pyarrow", zero_copy_batch=True
    )

    def filt(t: pa.Table) -> pa.Table:
        # Arrow-slice before pandas (see bucketed_inner_join's merge note)
        side = t["__side"]
        l = t.filter(pc.equal(side, 0)).select([key] + left_cols).to_pandas()
        members = (
            t.filter(pc.equal(side, 1))[key].to_numpy(zero_copy_only=False)
        )
        mask = l[key].isin(members)
        out = l[mask if keep_members else ~mask]
        return pa.Table.from_pandas(
            out, preserve_index=False
        ).replace_schema_metadata(None)

    return (
        l_tagged.union(r_tagged)
        .groupby("bucket")
        .map_groups(filt, batch_format="pyarrow")
    )


def bucketed_semi_join(left, right, key: str, left_cols: list[str],
                       num_buckets: int = 32):
    """left rows whose key EXISTS in right (SQL semi join / WHERE EXISTS) —
    the exchange moves distinct right keys only, never right payload."""
    return _bucketed_membership_join(left, right, key, left_cols,
                                     num_buckets, keep_members=True)


def bucketed_anti_join(left, right, key: str, left_cols: list[str],
                       num_buckets: int = 32):
    """left rows whose key is ABSENT from right (SQL anti join / WHERE NOT
    EXISTS) — the flagship's resume filter (J1) generalized to a
    large-large membership set."""
    return _bucketed_membership_join(left, right, key, left_cols,
                                     num_buckets, keep_members=False)


# ---------------------------------------------------------------------------
# keyed range join / windowed aggregate over a second stream
# ---------------------------------------------------------------------------

def _seg_bound(target: np.ndarray, seg_lo: np.ndarray, seg_hi: np.ndarray,
               vals: np.ndarray, right: bool) -> np.ndarray:
    """Vectorized per-segment binary search: for each ``target[i]`` return
    its lower- (``right=False``) or upper- (``right=True``) bound insertion
    index into the sorted slice ``vals[seg_lo[i]:seg_hi[i]]``.  log2(max
    segment) passes of whole-array compares — no per-key Python (the same
    kernel shape as dedup's segmented membership search)."""
    lo = seg_lo.astype(np.int64).copy()
    hi = seg_hi.astype(np.int64)
    nv = len(vals)
    width = hi - lo
    if len(width) == 0 or int(width.max()) <= 0:
        return lo
    iters = int(np.ceil(np.log2(int(width.max()) + 1))) + 1
    for _ in range(iters):
        mid = (lo + hi) >> 1
        v = vals[np.minimum(mid, nv - 1)]
        go = ((v <= target) if right else (v < target)) & (mid < hi)
        lo = np.where(go, mid + 1, lo)
        hi = np.where(go | (mid >= hi), hi, mid)
    return lo


def bucketed_range_agg_join(left, right, key: str, on: str,
                            window, agg_col: str | None = None,
                            num_buckets: int = 32,
                            count_name: str = "n_in_range",
                            sum_name: str = "sum_in_range",
                            round_to: int | None = None):
    """Keyed RANGE join + windowed aggregate: for each LEFT row, count (and
    optionally sum ``agg_col`` over) the RIGHT rows with the same ``key``
    whose ``on`` lies in the half-open window ``(left.on - window,
    left.on]`` — SQL's non-equi interval join + GROUP BY, e.g. "clicks by
    this user in the hour before each purchase".  Neither an equi-join nor
    merge_asof (which keeps only the single latest row) can express it.

    Both sides large: one union-tag shuffle on hash(key) % num_buckets
    (the bucketed_inner_join exchange).  Within a bucket the kernel is
    fully vectorized: RIGHT sorted once by (key, on); per-key segments
    located by searchsorted; BOTH window bounds found with one segmented
    binary search each; counts = bound difference, sums = prefix-sum
    difference.  O((|L|+|R|) log) per bucket, never a per-key loop, and
    match rows are never materialized (the aggregate is computed from
    bound indices) — a 1000-match window costs the same as an empty one.

    Left rows with no matches keep count 0 / sum 0.0 (LEFT semantics).
    ``window``: same units as ``on`` after int64 coercion (timestamps:
    microseconds).  Output: [key, on, left id cols…, count, sum?].
    Partitioning assumption: one key's rows fit one task — salt or
    range-split a pathologically hot key first (flagship hot-sink
    pattern)."""
    window = np.int64(window)

    def _i64(col) -> np.ndarray:
        a = col.to_numpy(zero_copy_only=False)
        if a.dtype.kind == "M":
            return a.astype("datetime64[us]").view(np.int64)
        return a.astype(np.int64)

    left_ids = [c for c in left.schema().names if c not in (key, on)]
    r_cols = [key, on] + ([agg_col] if agg_col else [])

    def tag_left(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        out = {key: t[key], on: t[on]}
        for c in left_ids:
            out[c] = t[c]
        if agg_col:
            out[agg_col] = pa.nulls(t.num_rows, pa.float64())
        out["__side"] = pa.array(np.zeros(t.num_rows, np.int8))
        out["bucket"] = pa.array((k % num_buckets).astype(np.int32))
        return pa.table(out)

    def tag_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        out = {key: t[key], on: t[on]}
        sch = left.schema()
        for c in left_ids:
            typ = sch.types[sch.names.index(c)]
            if not isinstance(typ, pa.DataType):
                typ = (pa.string() if typ == np.dtype(object)
                       else pa.from_numpy_dtype(typ))
            out[c] = pa.nulls(n, typ)
        if agg_col:
            out[agg_col] = t[agg_col].cast(pa.float64())
        out["__side"] = pa.array(np.ones(n, np.int8))
        out["bucket"] = pa.array((k % num_buckets).astype(np.int32))
        return pa.table(out)

    l_tagged = left.select_columns([key, on] + left_ids).map_batches(
        tag_left, batch_format="pyarrow", zero_copy_batch=True)
    r_tagged = right.select_columns(r_cols).map_batches(
        tag_right, batch_format="pyarrow", zero_copy_batch=True)

    def merge(t: pa.Table) -> pa.Table:
        side = t["__side"]
        lt = t.filter(pc.equal(side, 0))
        rt = t.filter(pc.equal(side, 1))
        lk = _i64(lt[key])
        lo_ = _i64(lt[on])
        rk = _i64(rt[key])
        ro = _i64(rt[on])
        order = np.lexsort((ro, rk))
        rk, ro = rk[order], ro[order]
        # per-key segments of the sorted right side
        uniq, seg_start = np.unique(rk, return_index=True)
        seg_end = np.r_[seg_start[1:], len(rk)]
        pos = np.searchsorted(uniq, lk)
        posc = np.minimum(pos, max(len(uniq) - 1, 0))
        has = (len(uniq) > 0) & (uniq[posc] == lk) if len(uniq) else \
            np.zeros(len(lk), bool)
        s_lo = np.where(has, seg_start[posc], 0)
        s_hi = np.where(has, seg_end[posc], 0)
        ub = _seg_bound(lo_, s_lo, s_hi, ro, right=True)
        lb = _seg_bound(lo_ - window, s_lo, s_hi, ro, right=True)
        cnt = ub - lb
        cols = {key: lt[key], on: lt[on]}
        for c in left_ids:
            cols[c] = lt[c]
        cols[count_name] = pa.array(cnt.astype(np.int64))
        if agg_col:
            v = rt[agg_col].to_numpy(zero_copy_only=False)[order]
            # reduceat (window-local accumulation) instead of prefix-sum
            # differencing: float error stays O(eps·window_sum), far below
            # the 2-dp rounding the catalog compares at.  reduceat quirks:
            # an empty segment (lb == ub) yields v[lb], and indices must
            # be < len(v) — clamp, then zero empty windows.
            if len(v) == 0:
                s = np.zeros(len(cnt))
            else:
                v2 = np.r_[v, 0.0]  # sentinel: makes index == len(v) legal
                idx = np.empty(2 * len(cnt), np.int64)
                idx[0::2] = lb
                idx[1::2] = ub
                s = np.add.reduceat(v2, idx)[0::2]
                s[cnt <= 0] = 0.0
            # rounding is the CALLER's comparison convention (the catalog
            # passes round_to=2 for money); a general aggregate must not
            # silently drop precision (ADVICE r3)
            if round_to is not None:
                s = np.round(s, round_to)
            cols[sum_name] = pa.array(s, pa.float64())
        return pa.table(cols).replace_schema_metadata(None)

    return (
        l_tagged.union(r_tagged)
        .groupby("bucket")
        .map_groups(merge, batch_format="pyarrow")
    )
