"""Training-shard preparation operators (SURVEY §2.12 extension): the
steps between a curated corpus and a training run — deterministic global
shuffle order, fixed-token-budget sequence packing, and shard assignment
with stable within-shard positions.

The reference has no analog (it stops at per-key reassembled logs); these
are the standard "repack for training" passes of a web-scale data
pipeline.  Every op is deterministic under a content/id hash so reruns,
resumes and the SQL oracles all agree on the exact assignment.

Scale shape: ONE range-partitioning shuffle on the order key, then a
distributed prefix-sum — per-range token totals are the only driver-side
state (``num_ranges`` scalars; raise it with the cluster so one range's
rows fit a worker).  The shuffled intermediate is materialized once (the
object store spills as needed) instead of re-reading + re-shuffling the
corpus for the second pass.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _md5_keys(ids) -> list[str]:
    """Order key reproducible in SQL: md5 of the id's decimal string
    (DuckDB ``md5(CAST(id AS VARCHAR))``).  Python-loop md5 is the
    oracle-compat form — the primary path is ``order="fast"`` below
    (one vectorized siphash call), mirroring the fingerprint/split ops
    (textstats.add_split_column vs _fast, VERDICT r2 #5)."""
    return [hashlib.md5(str(i).encode()).hexdigest() for i in ids]


def _check_order(order: str, num_ranges: int) -> None:
    """Driver-side validation (BEFORE any task launches — an in-task raise
    surfaces as an opaque RayTaskError after a partial run).  The fast
    order derives the range id by bit shift, so a non-power-of-two count
    would silently truncate the shift and leave ranges/shards permanently
    empty (ADVICE r3); the md5 order ranges on a hex-prefix."""
    if order == "md5":
        if num_ranges not in (16, 256):
            raise ValueError("md5 order supports num_ranges 16 or 256")
    elif order == "fast":
        if num_ranges < 2 or (num_ranges & (num_ranges - 1)) != 0:
            raise ValueError(
                f"fast order requires a power-of-two num_ranges/num_shards "
                f"(got {num_ranges})"
            )
    else:
        raise ValueError(f"order must be 'md5' or 'fast', got {order!r}")


def _add_order_cols(t: pa.Table, id_col: str, order: str,
                    num_ranges: int) -> tuple[pa.Table, np.ndarray]:
    """Append the order key and its range id (the range partitioner must
    be a PREFIX of the order so ranges are contiguous in key order)."""
    if order == "md5":
        if num_ranges not in (16, 256):
            raise ValueError("md5 order supports num_ranges 16 or 256")
        keys = _md5_keys(t[id_col].to_pylist())
        prefix = 1 if num_ranges == 16 else 2
        rng = np.array([int(k[:prefix], 16) for k in keys], dtype=np.int64)
        return t.append_column("_okey", pa.array(keys, pa.string())), rng
    if order == "fast":
        from ..stages.route import stable_hash

        # mirror the md5 branch's explicit check: a non-power-of-two count
        # would silently truncate the shift and leave ranges/shards
        # permanently empty (ADVICE r3)
        if num_ranges < 2 or (num_ranges & (num_ranges - 1)) != 0:
            raise ValueError(
                f"fast order requires a power-of-two num_ranges/num_shards "
                f"(got {num_ranges})"
            )
        h = stable_hash(t[id_col])  # zero-copy off the Arrow buffers
        shift = np.uint64(64 - int(np.log2(num_ranges)))
        rng = (h >> shift).astype(np.int64)
        return t.append_column("_okey", pa.array(h, pa.uint64())), rng
    raise ValueError(f"order must be 'md5' or 'fast', got {order!r}")


def add_ws_token_count(t: pa.Table, text_col: str = "text",
                       out: str = "tokens") -> pa.Table:
    """Whitespace token count matching ``len(string_split(text, ' '))``
    exactly (split keeps empty pieces, so the count is spaces + 1)."""
    n = pc.add(pc.count_substring(t[text_col], " "), 1)
    return t.append_column(out, pc.cast(n, pa.int64()))


def pack_sequences(ds, budget: int = 2048, text_col: str = "text",
                   id_col: str = "doc_id", order: str = "md5",
                   num_ranges: int = 16, tokenizer: str = "ws"):
    """Assign every document to a fixed-token-budget training pack.

    Semantics: lay the corpus out as one token stream in deterministic
    hash order (a seeded global shuffle), chunk the stream into
    ``budget``-token packs, and assign each document the pack where it
    STARTS: ``pack = floor((cum_tokens_before) / budget)`` — exactly the
    SQL window ``floor((sum(tokens) over (order by key rows unbounded
    preceding) - tokens) / budget)``.

    Physical plan (distributed prefix-sum, one shuffle):
      1. range-partition on the order-key prefix; per-range task sorts its
         range and computes the LOCAL token cumsum; materialized once.
      2. per-range totals (tiny aggregate) → driver cumsum → offsets
         (``num_ranges`` scalars — the only driver state).
      3. streaming map adds ``offset[range]`` and emits the pack id.

    Returns a Dataset of (id, tokens, pack_id).

    ``tokenizer``: "ws" (whitespace count — the SQL-oracle twin) or
    "bpe" (frozen-vocab subword count via functions.bpe, the realistic
    budget; golden-pinned since BPE is not SQL-expressible).  Identical
    packing machinery either way — only the ``tokens`` column changes.
    """
    _check_order(order, num_ranges)
    keep = [c for c in (id_col, text_col) if c in ds.schema().names]
    ds = ds.map_batches(
        lambda t: t.select(keep), batch_format="pyarrow", zero_copy_batch=True
    )
    if tokenizer == "bpe":
        from .bpe import count_tokens_bpe

        ds = count_tokens_bpe(ds, text_col=text_col, id_col=id_col)
    elif tokenizer != "ws":
        raise ValueError(f"tokenizer must be 'ws' or 'bpe', got {tokenizer!r}")

    def keyed(t: pa.Table) -> pa.Table:
        if "tokens" not in t.column_names:
            t = add_ws_token_count(t, text_col=text_col)
            t = t.drop_columns([text_col])
        t, rng = _add_order_cols(t, id_col, order, num_ranges)
        return t.append_column("_range", pa.array(rng, pa.int64()))

    ds = ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)

    def local_cumsum(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("_okey", "ascending"), (id_col, "ascending")]
        )
        t = t.take(idx)
        cum = np.cumsum(t["tokens"].to_numpy(zero_copy_only=False))
        return (
            t.select([id_col, "tokens", "_range"])
            .append_column("_local_cum", pa.array(cum, pa.int64()))
            .replace_schema_metadata(None)
        )

    ranged = ds.groupby("_range").map_groups(
        local_cumsum, batch_format="pyarrow"
    ).materialize()

    # per-range totals WITHOUT a second shuffle: a range is one task's
    # sorted output, so its total is just that block's last local cumsum —
    # per-batch max partials + a driver combine over O(ranges × blocks)
    # tiny rows (the round-3 form re-shuffled all rows through a
    # groupby().aggregate(Sum) to produce num_ranges scalars)
    from ..stages.aggregate import partial_groupby

    tot_df = partial_groupby(ranged, ["_range"],
                             {"total": ("_local_cum", "max")})
    totals = {int(r["_range"]): int(r["total"])
              for _, r in tot_df.iterrows()}
    offsets: dict[int, int] = {}
    acc = 0
    for rng in sorted(totals):
        offsets[rng] = acc
        acc += totals[rng]

    def assign(t: pa.Table) -> pa.Table:
        rng = t["_range"].to_numpy(zero_copy_only=False)
        lut = {int(r): offsets[int(r)] for r in np.unique(rng)}
        base = np.array([lut[int(r)] for r in rng], dtype=np.int64)
        cum = base + t["_local_cum"].to_numpy(zero_copy_only=False)
        tok = t["tokens"].to_numpy(zero_copy_only=False)
        pack = (cum - tok) // budget
        return pa.table({
            id_col: t[id_col],
            "tokens": t["tokens"],
            "pack_id": pa.array(pack, pa.int64()),
        })

    return ranged.map_batches(assign, batch_format="pyarrow",
                              zero_copy_batch=True)


def assign_shards(ds, num_shards: int = 16, id_col: str = "doc_id",
                  order: str = "md5"):
    """Deterministic shard assignment + stable within-shard position: the
    "write the corpus as S training shards, shuffled, resumable" layout.
    ``shard`` is a hash-prefix bucket of the id; ``pos`` is the row's rank
    within its shard under the same hash order (restart-stable, so a
    partially-written shard can resume at its last committed pos).

    One groupby(shard) exchange; each group sorts locally and emits
    ranks — a shard's rows are exactly one task's output, which is also
    the unit you'd hand to a shard writer.  Returns (id, shard, pos)."""
    if order == "md5" and num_shards != 16:
        raise ValueError("md5 order supports num_shards=16 (hex prefix)")
    _check_order(order, num_shards)

    keep = [id_col]

    def keyed(t: pa.Table) -> pa.Table:
        t = t.select([c for c in keep if c in t.column_names])
        t, rng = _add_order_cols(t, id_col, order, num_shards)
        return t.append_column("shard", pa.array(rng, pa.int64()))

    ds = ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)

    def rank(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("_okey", "ascending"), (id_col, "ascending")]
        )
        t = t.take(idx)
        return pa.table({
            id_col: t[id_col],
            "shard": t["shard"],
            "pos": pa.array(np.arange(t.num_rows, dtype=np.int64)),
        })

    return ds.groupby("shard").map_groups(rank, batch_format="pyarrow")
