"""log_aggregator_ray — a Ray-Data-native parse → enrich → route → aggregate
engine with the query/data-processing capabilities of tjmike/log_aggregator.

The reference system ships tagged byte chunks ``(id, session, seq, payload)``
through agent → datapump → server → datadecoder and reassembles them in
per-key sequence order (see /root/reference; SURVEY.md in the repo root maps
every reference operator to its Ray Data recast).  This package re-expresses
that computation over a Parquet table of multi-turn transcripts
``(conv_id, turn_idx, role, text, tool, ts)`` as a streaming
``ray.data.Dataset`` pipeline:

    read_parquet → map_batches(parse, pyarrow)      # vectorized grok/regex
                 → map_batches(Enricher, actors)    # broadcast dict lookups
                 → groupby(bucket).map_groups(...)  # order + dedup + gate
                 → routed/quarantine sinks + per-sink aggregates + manifests

Nothing in this package calls ``ray.init``/``ray.shutdown``; sessions are
owned by the driver, ``bench.py`` and the pytest fixture.
"""

__version__ = "0.1.0"
