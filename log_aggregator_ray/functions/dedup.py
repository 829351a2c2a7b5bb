"""Deduplication operators over the documents table (graft extensions).

Exact dedup mirrors the reference's key-idempotence (duplicate
``(id,session,seq)`` overwrites in place — server/.../LogServerController
.java:115-129) generalized to content keys.  Near-dup families follow the
standard public constructions (Broder MinHash-LSH, Charikar SimHash).

Scale shapes:
  * exact: hash column per batch → groupby(hash) keep-first.  The shuffle
    moves (hash, id) pairs, not full text, when ``project=True``.
  * minhash-lsh: per-batch shingle→minhash (vectorized numpy), explode to
    (band, band_hash) rows, groupby bands → candidate pairs, verify Jaccard.
  * simhash: 64-bit signature per doc; near-dup = small Hamming distance
    within bucketed prefixes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Count, Min

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_first(ds, key_col: str = "text", id_col: str = "doc_id"):
    """Keep min(id) per distinct key value → (id_col, key_col) dataset.

    Direct form (groups on the key itself).  Fine when the key column is
    small; for long text at scale use ``exact_dedup_by_hash``."""
    out = ds.groupby(key_col).aggregate(Min(id_col, alias_name=id_col))
    return out.select_columns([id_col, key_col])


def add_hash_column(batch: pa.Table, col: str = "text",
                    out: str = "content_hash") -> pa.Table:
    texts = batch[col].to_pandas()
    h = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
    return batch.append_column(out, pa.array(h, pa.string()))


def exact_dedup_by_hash(ds, col: str = "text", id_col: str = "doc_id"):
    """Scale path: md5 the content per batch, shuffle only (hash, id), pick
    min id per hash.  Output: (id_col, content_hash)."""
    hashed = ds.map_batches(
        lambda b: add_hash_column(b, col), batch_format="pyarrow", zero_copy_batch=True
    ).select_columns([id_col, "content_hash"])
    out = hashed.groupby("content_hash").aggregate(Min(id_col, alias_name=id_col))
    return out.select_columns([id_col, "content_hash"])


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _minhash_params(num_hashes: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_hashes, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, num_hashes, dtype=np.int64).astype(np.uint64)
    return a, b


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Character k-shingles → stable 64-bit hashes (blake2b, deterministic
    cross-process — NOT Python hash())."""
    if len(text) < k:
        sh = {text}
    else:
        sh = {text[i : i + k] for i in range(len(text) - k + 1)}
    out = np.empty(len(sh), dtype=np.uint64)
    for i, s in enumerate(sh):
        out[i] = int.from_bytes(
            hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "little"
        )
    return out


class MinHasher:
    """Actor-pool stage: per-doc MinHash signature + LSH band keys.

    __init__ draws the (a, b) hash family once per actor (fixed seed so all
    actors agree).  __call__ emits ``num_bands`` rows per doc:
    (doc_id, band, band_hash) — ready for the bucket groupby."""

    def __init__(self, num_hashes: int = 64, num_bands: int = 16, shingle_k: int = 5,
                 text_col: str = "text", id_col: str = "doc_id"):
        assert num_hashes % num_bands == 0
        self.a, self.b = _minhash_params(num_hashes)
        self.num_hashes = num_hashes
        self.num_bands = num_bands
        self.rows_per_band = num_hashes // num_bands
        self.k = shingle_k
        self.text_col = text_col
        self.id_col = id_col

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        # (a*x + b) mod p, min over shingles, vectorized over hash family
        v = (sh[None, :] * self.a[:, None] + self.b[:, None]) % _MERSENNE
        return v.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, bands, bhash = [], [], []
        for doc_id, text in zip(batch[self.id_col], batch[self.text_col]):
            sig = self.signature(text)
            for band in range(self.num_bands):
                chunk = sig[band * self.rows_per_band : (band + 1) * self.rows_per_band]
                digest = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                ids.append(doc_id)
                bands.append(band)
                bhash.append(digest)
        return pd.DataFrame(
            {self.id_col: ids, "band": np.array(bands, dtype=np.int32), "band_hash": bhash}
        )


def _bucket_pairs(df: pd.DataFrame, id_col: str) -> pd.DataFrame:
    """All unordered id pairs within one (band, band_hash) bucket."""
    ids = np.sort(df[id_col].to_numpy())
    if len(ids) < 2:
        return pd.DataFrame({"id_a": [], "id_b": []})
    ia, ib = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})


def minhash_candidate_pairs(ds, num_hashes: int = 64, num_bands: int = 16,
                            shingle_k: int = 5, text_col: str = "text",
                            id_col: str = "doc_id", concurrency=2):
    """documents → distinct candidate near-dup pairs (id_a < id_b).

    shingle→minhash→band (actor pool) → groupby(band, band_hash) → pairs →
    distinct.  The band groupby shuffles small signature rows only."""
    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(
            num_hashes=num_hashes, num_bands=num_bands, shingle_k=shingle_k,
            text_col=text_col, id_col=id_col,
        ),
        batch_format="pandas",
        concurrency=concurrency,
    )
    pairs = sigs.groupby(["band", "band_hash"]).map_groups(
        lambda g: _bucket_pairs(g, id_col), batch_format="pandas"
    )
    # distinct pairs: aggregate count over (id_a, id_b), keep keys
    return pairs.groupby(["id_a", "id_b"]).aggregate(Count(alias_name="n_bands"))


def jaccard_verify(pairs_df: pd.DataFrame, texts: dict, k: int = 5,
                   threshold: float = 0.7) -> pd.DataFrame:
    """Driver-side exact k-shingle Jaccard for a (small) candidate set —
    the verify step after LSH."""
    rows = []
    cache: dict = {}

    def sh(i):
        if i not in cache:
            t = texts[i]
            cache[i] = (
                {t} if len(t) < k else {t[j : j + k] for j in range(len(t) - k + 1)}
            )
        return cache[i]

    for a, b in zip(pairs_df["id_a"], pairs_df["id_b"]):
        sa, sb = sh(a), sh(b)
        j = len(sa & sb) / max(1, len(sa | sb))
        if j >= threshold:
            rows.append((a, b, j))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"])


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """Actor-pool stage: Charikar 64-bit SimHash over word features."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        import re

        self._word = re.compile(r"\w+")
        self.text_col = text_col
        self.id_col = id_col

    def _sim(self, text: str) -> np.uint64:
        acc = np.zeros(64, dtype=np.int64)
        for w in self._word.findall(text.lower()):
            d = hashlib.blake2b(w.encode("utf-8"), digest_size=8).digest()
            bits = np.unpackbits(np.frombuffer(d, np.uint8), bitorder="little")
            acc += 2 * bits.astype(np.int64) - 1
        return np.packbits((acc > 0).astype(np.uint8), bitorder="little").view(np.uint64)[0]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                self.id_col: batch[self.id_col].to_numpy(),
                "simhash": np.array(
                    [self._sim(t) for t in batch[self.text_col]], dtype=np.uint64
                ),
            }
        )


def simhash_signatures(ds, text_col: str = "text", id_col: str = "doc_id",
                       concurrency=2):
    return ds.map_batches(
        SimHasher,
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col),
        batch_format="pandas",
        concurrency=concurrency,
    )


def hamming_near_pairs(sig_df: pd.DataFrame, max_dist: int = 3,
                       id_col: str = "doc_id") -> pd.DataFrame:
    """Driver-side near-pair scan over simhash signatures (prefix-bucketed).
    For corpus-scale inputs run per prefix bucket inside map_groups."""
    sig = sig_df.sort_values("simhash").reset_index(drop=True)
    vals = sig["simhash"].to_numpy(dtype=np.uint64)
    ids = sig[id_col].to_numpy()
    rows = []
    # bucket by top-16-bit prefix: near dups almost always share it
    prefix = (vals >> np.uint64(48)).astype(np.uint64)
    for p in np.unique(prefix):
        idx = np.flatnonzero(prefix == p)
        for i in range(len(idx)):
            for j in range(i + 1, len(idx)):
                d = int(bin(int(vals[idx[i]]) ^ int(vals[idx[j]])).count("1"))
                if d <= max_dist:
                    a, b = sorted((ids[idx[i]], ids[idx[j]]))
                    rows.append((a, b, d))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "hamming"])


# ---------------------------------------------------------------------------
# n-gram Jaccard (all-pairs within blocking key — for modest candidate sets)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(ds, group_col: str, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 5, threshold: float = 0.5):
    """Blocked all-pairs Jaccard: groupby(group_col) (e.g. lang or source)
    then exact k-shingle Jaccard within each group."""

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        texts = dict(zip(g[id_col], g[text_col]))
        ids = sorted(texts)
        ia, ib = np.triu_indices(len(ids), k=1)
        pairs = pd.DataFrame(
            {"id_a": np.array(ids)[ia], "id_b": np.array(ids)[ib]}
        )
        return jaccard_verify(pairs, texts, k=k, threshold=threshold)

    return ds.groupby(group_col).map_groups(per_group, batch_format="pandas")
