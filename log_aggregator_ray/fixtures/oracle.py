"""Independent reference-semantics oracle (driver-side, small inputs only).

A deliberately literal, loop-per-key reimplementation of the reference
decoder's accept rule (datadecoder/.../DataPumpDecoderSort.java:142-181):
sort by seq, first-wins on duplicates, accept ``seq == last+1`` (or the
lowest available seq when no prior state, :167-174), hold everything after a
gap.  Used by tests to cross-check the vectorized engine — an implementation
the engine does NOT share code with.  O(n log n) pandas + python; never used
in the pipeline itself.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def decode_reference(table: pa.Table | pd.DataFrame, key: str = "conv_id"):
    """Return (routed_df, quarantine_df, sink_counts_df, docs_df)."""
    df = table.to_pandas() if isinstance(table, pa.Table) else table.copy()
    if "session" in df.columns:
        df["sink"] = df["conv_id"].astype(str) + "." + df["session"].astype(str)
    else:
        df["sink"] = df["conv_id"]

    routed_parts, quar = [], []
    for sink, g in df.sort_values(["sink", "turn_idx"]).groupby("sink", sort=True):
        g = g.drop_duplicates("turn_idx", keep="first")
        last = 0  # no prior state
        accepted = []
        first_missing = 0
        for _, row in g.iterrows():
            t = int(row["turn_idx"])
            if last == 0 or t == last + 1:
                accepted.append(row)
                last = t
            else:
                first_missing = last + 1
                break
        routed_parts.extend(accepted)
        if first_missing:
            quar.append((row["conv_id"], sink, first_missing))

    routed = pd.DataFrame(routed_parts).reset_index(drop=True)
    quarantine = pd.DataFrame(quar, columns=["conv_id", "sink", "first_missing_turn"])
    counts = (
        routed.groupby("sink", sort=True)
        .agg(n_rows=("turn_idx", "size"), max_counter=("turn_idx", "max"))
        .reset_index()
        .astype({"n_rows": "int64", "max_counter": "int64"})
    )
    docs = (
        routed.sort_values(["sink", "turn_idx"])
        .groupby("sink", sort=True)
        .agg(conv_id=("conv_id", "first"), assembled_text=("text", "\n".join))
        .reset_index()
    )
    return routed, quarantine, counts, docs
