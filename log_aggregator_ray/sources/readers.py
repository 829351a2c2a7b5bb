"""Dataset sources (SURVEY §2.1).

The reference's sources — continuous tail (S1), directory listings (S3/S4),
file-watch (S5), HTTP ingest (S6) — all collapse in the batch recast to
"Parquet files appear under a path"; discovery, incremental pull and
backpressure are provided by Ray Data's streaming executor.  The one design
obligation that remains ours is **pruning at the read**: always pass
``columns=`` so a 2-column transform never ships 6 columns.
"""

from __future__ import annotations

import glob
import os

import ray.data as rd

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _clean_read_parquet(path: str, columns: list[str] | None = None,
                        **kwargs) -> rd.Dataset:
    """``read_parquet`` with the file's pandas schema metadata stripped.

    pandas-written parquet carries a table-level metadata DICT; Ray's
    streaming executor hashes block schemas for deduplication and logs
    "Failed to hash the schemas … unhashable type: 'dict'" per block when
    it can't (VERDICT r2 #6 cosmetic).  Passing an explicit metadata-free
    schema keeps every downstream block schema hashable."""
    import pyarrow.parquet as pq

    if "schema" not in kwargs:
        # path may be a str or a list of paths (incremental read plans)
        probe = path[0] if isinstance(path, (list, tuple)) and path else path
        if isinstance(probe, str) and os.path.isdir(probe):
            parts = sorted(glob.glob(os.path.join(probe, "**", "*.parquet"),
                                     recursive=True))
            probe = parts[0] if parts else None
        if probe and os.path.exists(probe):
            sch = pq.read_schema(probe).remove_metadata()
            if columns is not None:
                import pyarrow as pa

                sch = pa.schema([sch.field(c) for c in columns])
            kwargs["schema"] = sch
    return rd.read_parquet(path, columns=columns, **kwargs)


def read_transcripts(path: str, columns: list[str] | None = None,
                     **kwargs) -> rd.Dataset:
    """Read a transcript corpus (file or directory of parquet).

    ``columns=None`` reads the full transcript schema; pass a subset to prune
    (e.g. the aggregate-only pipeline needs just conv_id/turn_idx/text).
    """
    return _clean_read_parquet(path, columns=columns, **kwargs)


def read_table(sf_dir: str, name: str, columns: list[str] | None = None,
               **kwargs) -> rd.Dataset:
    """Read one driver testdata table, column-pruned."""
    return _clean_read_parquet(f"{sf_dir}/{name}.parquet", columns=columns,
                               **kwargs)


def read_transcripts_jsonl(path: str, **kwargs) -> rd.Dataset:
    """JSON-lines transcript source (the reference's text-log ingest shape,
    S1/S6, for corpora that arrive as raw log lines rather than parquet).
    Downstream stages are format-agnostic — the same pipeline runs on
    either source."""
    return rd.read_json(path, **kwargs)
