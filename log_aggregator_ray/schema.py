"""Canonical Arrow schemas for the engine.

The transcript row is the graft's recast of the reference's ``LogPart``
protobuf (/root/reference/proto/src/main/proto/LoggerProtos.proto:27-33):
``conv_id`` ≙ ``id``, ``turn_idx`` ≙ ``seq`` (1-based contiguous),
``session`` ≙ ``session`` epoch, ``text``/``tool`` ≙ ``payload``.
"""

from __future__ import annotations

import pyarrow as pa

# Input schema (BASELINE.json input_hint) — fixed, like the proto3 schema.
TRANSCRIPT_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)

# Optional session column (transcripts_sessions fixture; reference session
# epoch seconds, agent/.../PathProvider.java:36).
SESSION_FIELD = pa.field("session", pa.int64())

# Columns appended by the parse stage (reference M4/M8 analogs:
# datadecoder/.../PBLogFile.java:17-27 filename-regex extraction).
PARSED_FIELDS = [
    pa.field("event_type", pa.string()),
    pa.field("error_code", pa.string()),
    pa.field("counter", pa.int64()),
    pa.field("tool_name", pa.string()),
    pa.field("tool_cmd", pa.string()),
    pa.field("tool_exit", pa.int32()),
]

# Columns appended by the enrich stage (broadcast dict lookups, SURVEY T6).
ENRICHED_FIELDS = [
    pa.field("role_class", pa.string()),
    pa.field("role_priority", pa.int32()),
    pa.field("tool_family", pa.string()),
    pa.field("tool_risk", pa.string()),
]

# Routing column (reference M7: (id, session) → "id.session",
# datadecoder/.../DataPumpDecoderSort.java:93-97).
SINK_FIELD = pa.field("sink", pa.string())

EVENT_TYPES = ["msg", "tool_call", "tool_result", "error"]
