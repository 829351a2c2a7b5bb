"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship parse → enrich → route → reassemble →
aggregate pipeline at sf0.001 scale and returns the per-sink aggregate
table.  ``queries()`` / ``oracle_sql()`` expose the operator catalog
(log_aggregator_ray.pipelines.queries) for the DuckDB cross-check at
sf=0.01.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

_CATALOG = None


def _catalog():
    global _CATALOG
    if _CATALOG is None:
        from log_aggregator_ray.pipelines.queries import (
            SF_CORRECTNESS,
            build_catalog,
            ensure_adv_corpus,
            ensure_jsonl_corpus,
            ensure_sessions_corpus,
        )

        # eagerly materialize the corpora the oracle SQL reads, so the SQL
        # side works regardless of evaluation order
        ensure_adv_corpus(SF_CORRECTNESS)
        ensure_adv_corpus("/root/testdata/sf0.001")
        ensure_sessions_corpus(SF_CORRECTNESS)
        ensure_jsonl_corpus(SF_CORRECTNESS)
        _CATALOG = build_catalog()
    return _CATALOG


def entry() -> Any:
    """Flagship pipeline on sf0.001-scale transcripts; returns the per-sink
    (sink, n_rows, max_counter) aggregate as a pandas DataFrame."""
    import os
    import shutil

    from log_aggregator_ray.pipelines.flagship import (
        read_sink_counts,
        run_flagship,
    )
    from log_aggregator_ray.pipelines.queries import ensure_adv_corpus

    corpus = ensure_adv_corpus("/root/testdata/sf0.001")
    out_dir = "/tmp/graft_entry_out"
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    run_flagship(corpus, out_dir, num_buckets=16)
    return read_sink_counts(out_dir)


def queries() -> dict[str, Callable[[str], Any]]:
    return _catalog()[0]


def oracle_sql() -> dict[str, str]:
    return _catalog()[1]
