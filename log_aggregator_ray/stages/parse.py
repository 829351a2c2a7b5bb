"""Vectorized grok/regex parse stage (SURVEY §2.3 M4/M8).

The reference recovers typed metadata from a string encoding with one regex
(``(.*)_(\\d*)_(\\d*)\\.pbData`` — /root/reference/datadecoder/src/main/java/
tjmike/logaggregator/datadecoder/PBLogFile.java:17-27) and classifies records
into a categorical status (LogTail.java:109-168).  Here the same computation
is expressed as ``pyarrow.compute.extract_regex`` kernels over the ``text``
and ``tool`` columns inside ``map_batches(batch_format="pyarrow")`` —
zero-copy Arrow in/out, RE2 under the hood, no Python per-row loop.

Extracted columns:
  event_type  from ``event=<type>``      (categorical, like the status enum)
  error_code  from ``ERR-NNN``           ("" when absent)
  counter     trailing integer           (== turn_idx for clean input; the
                                          logCheck invariant's left side)
  tool_name / tool_cmd / tool_exit from ``tool=<n> cmd=<c> exit=<e>``
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_EVENT_RE = r"event=(?P<event_type>\w+)"
_ERR_RE = r"(?P<error_code>ERR-\d{3})"
_COUNTER_RE = r" (?P<counter>\d+)$"
_TOOL_RE = r"tool=(?P<tool_name>\S+) cmd=(?P<tool_cmd>\S+) exit=(?P<tool_exit>\d+)"


def _extract(arr: pa.ChunkedArray | pa.Array, pattern: str, group: str) -> pa.Array:
    """extract_regex returns a struct array (null when no match); pull one
    group as a string array with nulls where unmatched."""
    s = pc.extract_regex(arr, pattern)
    return pc.struct_field(s, group)


def parse_batch(batch: pa.Table) -> pa.Table:
    text = batch["text"]
    tool = batch["tool"]

    event_type = pc.fill_null(_extract(text, _EVENT_RE, "event_type"), "msg")
    error_code = pc.fill_null(_extract(text, _ERR_RE, "error_code"), "")
    counter = pc.cast(
        pc.fill_null(_extract(text, _COUNTER_RE, "counter"), "0"), pa.int64()
    )

    tool_struct = pc.extract_regex(tool, _TOOL_RE)
    tool_name = pc.fill_null(pc.struct_field(tool_struct, "tool_name"), "")
    tool_cmd = pc.fill_null(pc.struct_field(tool_struct, "tool_cmd"), "")
    tool_exit = pc.cast(
        pc.fill_null(pc.struct_field(tool_struct, "tool_exit"), "-1"), pa.int32()
    )

    return (
        batch.append_column("event_type", event_type)
        .append_column("error_code", error_code)
        .append_column("counter", counter)
        .append_column("tool_name", tool_name)
        .append_column("tool_cmd", tool_cmd)
        .append_column("tool_exit", tool_exit)
    )


def apply_parse(ds, batch_size: int = 32768):
    """Attach the parse stage to a Dataset.  Stateless task stage — the regex
    is a constant compiled inside Arrow's kernel; no actor needed."""
    return ds.map_batches(
        parse_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size
    )
