"""Frozen-vocab BPE token counting (graft extension).

Sequence-packing budgets move under a real subword tokenizer vs the
whitespace count (a long rare word is several BPE tokens; a common word is
one).  This module ships the standard byte-pair-merge tokenizer (Sennrich
et al. ACL'16) against a small FROZEN merge list
(``fixtures/bpe_merges.txt``, learned once by ``tools/make_bpe_merges.py``
and checked in), so counts are deterministic forever.

Scale shape: the merge table is tiny and loaded once per actor
(``__init__``); per batch, words are dictionary-encoded so the per-word
merge loop runs once per UNIQUE word, and a per-actor memo cache makes the
loop vanish on a Zipfian vocabulary (hit rate → 1 after the first
batches).  Document totals are one ``np.bincount`` scatter — no per-row
Python.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .corpus import TOKEN_SPLIT_PATTERN

DEFAULT_MERGES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures", "bpe_merges.txt")


def load_merges(path: str = DEFAULT_MERGES) -> dict[tuple[str, str], int]:
    ranks: dict[tuple[str, str], int] = {}
    with open(path) as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            a, b = line.split(" ")
            ranks[(a, b)] = len(ranks)
    return ranks


class BPETokenCounter:
    """Actor-pool stage: append a BPE ``tokens`` count per document.

    Emits (id, tokens) — the text column is dropped, matching what
    sequence packing consumes."""

    def __init__(self, merges_path: str = DEFAULT_MERGES,
                 text_col: str = "text", id_col: str = "doc_id",
                 out: str = "tokens"):
        self.ranks = load_merges(merges_path)   # model state, loaded once
        self.text_col, self.id_col, self.out = text_col, id_col, out
        self._cache: dict[str, int] = {}        # word -> token count memo

    def _count_word(self, w: str) -> int:
        n = self._cache.get(w)
        if n is not None:
            return n
        sym = list(w)
        while len(sym) > 1:
            best_rank, best_i = None, -1
            for i in range(len(sym) - 1):
                r = self.ranks.get((sym[i], sym[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            a, b = sym[best_i], sym[best_i + 1]
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        n = len(sym)
        self._cache[w] = n
        return n

    def __call__(self, t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t[self.text_col]),
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
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        uniq = enc.dictionary.to_pylist()       # once per UNIQUE word
        per_word = np.array([self._count_word(w) for w in uniq], np.int64)
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        totals = np.bincount(parent, weights=per_word[idx],
                             minlength=t.num_rows).astype(np.int64)
        return pa.table({
            self.id_col: t[self.id_col],
            self.out: pa.array(totals, pa.int64()),
        })


def count_tokens_bpe(ds, merges_path: str = DEFAULT_MERGES,
                     text_col: str = "text", id_col: str = "doc_id",
                     concurrency: int = 2, num_cpus: float = 0.5):
    """(id, tokens) under the frozen BPE vocab — actor pool so the merge
    table and memo cache live across batches.  Fractional num_cpus: see
    embed.embed_documents (composed actor stages must not reserve every
    CPU)."""
    return ds.map_batches(
        BPETokenCounter,
        fn_constructor_kwargs={"merges_path": merges_path,
                               "text_col": text_col, "id_col": id_col},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )
