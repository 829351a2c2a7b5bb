"""Enrichment dictionaries (FIXTURES.md §2; SURVEY §2.4 T6, §2.5 J3).

The reference's only per-key state is the SequenceTracker map
(datadecoder/.../SequenceTracker.java:37); the graft generalizes the pattern
to small lookup tables joined broadcast-side.  These are the canonical dims;
they can also be materialized to parquet for oracle joins.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

ROLES = pd.DataFrame(
    {
        "role": ["user", "assistant", "system", "tool"],
        "role_class": ["human", "model", "control", "machine"],
        "priority": pd.array([2, 1, 0, 3], dtype="int32"),
    }
)

TOOLS = pd.DataFrame(
    {
        "tool_name": ["bash", "grep", "read_file", "write_file", "search", "browser",
                       "python", "sql", "http_get", "calc", "edit", "list_dir"],
        "tool_family": ["shell", "shell", "fs", "fs", "web", "web",
                         "interp", "db", "web", "interp", "fs", "fs"],
        "risk": ["high", "low", "low", "high", "low", "medium",
                  "high", "medium", "medium", "low", "high", "low"],
    }
)


def roles_table() -> pa.Table:
    return pa.Table.from_pandas(
        ROLES, preserve_index=False
    ).replace_schema_metadata(None)


def tools_table() -> pa.Table:
    return pa.Table.from_pandas(
        TOOLS, preserve_index=False
    ).replace_schema_metadata(None)


def roles_case_sql() -> str:
    """CASE-expression oracle for the role dict (inline, since the dims are
    code constants rather than driver views)."""
    cls = " ".join(
        f"WHEN role = '{r}' THEN '{c}'" for r, c in zip(ROLES["role"], ROLES["role_class"])
    )
    pri = " ".join(
        f"WHEN role = '{r}' THEN {p}" for r, p in zip(ROLES["role"], ROLES["priority"])
    )
    return cls, pri


def tools_values_sql() -> str:
    """VALUES-list oracle for the tool dict, usable as a DuckDB inline table:
    ``(VALUES ...) AS tools(tool_name, tool_family, risk)``."""
    rows = ", ".join(
        f"('{n}', '{f}', '{r}')"
        for n, f, r in zip(TOOLS["tool_name"], TOOLS["tool_family"], TOOLS["risk"])
    )
    return f"(VALUES {rows}) AS tools(tool_name, tool_family, risk)"
