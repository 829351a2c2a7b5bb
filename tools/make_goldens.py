#!/usr/bin/env python
"""Regenerate the pinned golden parquet files under golden/.

Goldens pin the output of DETERMINISTIC operators whose construction SQL
cannot express (MinHash-LSH banding, SimHash bit ops, hyperplane-LSH
bucketing) at the driver's correctness scale (sf0.01).  They are
regression/determinism gates; the semantic property behind them (near-dup
recall vs exact Jaccard) has a real SQL oracle (docs_neardup_verified).

Run after changing any signature kernel:  python tools/make_goldens.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

if not ray.is_initialized():
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")

import pyarrow as pa
import pyarrow.parquet as pq

from log_aggregator_ray.pipelines.queries import (
    GOLDEN_DIR,
    SF_CORRECTNESS,
    build_catalog,
)

GOLDEN = ["docs_minhash_pairs", "docs_simhash", "docs_simhash_pairs",
          "ann_lsh_topk", "ann_ivf_topk", "ann_batch_ivf_topk",
          "ann_batch_ivf_recall", "docs_fingerprint_fast",
          "docs_train_split_fast", "docs_sample_fast", "media_metadata",
          "events_hll_users", "docs_embed", "ann_text_topk",
          "docs_pack_sequences_bpe", "ann_text_index_topk",
          "rag_chunk_retrieve"]


def main():
    queries, _ = build_catalog()
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name in GOLDEN:
        res = queries[name](SF_CORRECTNESS)
        if hasattr(res, "to_pandas"):
            res = res.to_pandas()
        # block arrival order is nondeterministic under the streaming
        # executor — sort so regenerating an unchanged op is a no-op in git
        res = res.sort_values(sorted(res.columns)).reset_index(drop=True)
        t = pa.Table.from_pandas(res, preserve_index=False)
        path = os.path.join(GOLDEN_DIR, f"{name}.parquet")
        pq.write_table(t, path)
        print(f"{name}: {t.num_rows} rows -> {path}")


if __name__ == "__main__":
    main()
    ray.shutdown()
