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


def bucketed_inner_join(left, right, key: str, left_cols: list[str],
                        right_cols: list[str], num_buckets: int = 32):
    """Inner join two Datasets on an integer key column.

    ``left_cols`` / ``right_cols``: columns carried from each side (the key
    is implied and appears once in the output).  Output columns:
    ``[key] + left_cols + right_cols``.
    """
    left_cols = [c for c in left_cols if c != key]
    right_cols = [c for c in right_cols if c != key]

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
            out["bucket"] = pa.array((k % num_buckets).astype(np.int32))
            return pa.table(out)

        return tag

    l_tagged = left.select_columns([key] + left_cols).map_batches(
        make_tag(0, left_cols, r_types), batch_format="pyarrow", zero_copy_batch=True
    )
    r_tagged = right.select_columns([key] + right_cols).map_batches(
        make_tag(1, right_cols, l_types), batch_format="pyarrow", zero_copy_batch=True
    )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["__side"] == 0][[key] + left_cols]
        r = df[df["__side"] == 1][[key] + right_cols]
        return l.merge(r, on=key, how="inner")

    return (
        l_tagged.union(r_tagged)
        .groupby("bucket")
        .map_groups(merge, batch_format="pandas")
    )
