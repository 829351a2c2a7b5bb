"""Skew path: hot-sink detection and split-range reassembly must be
row-identical to the plain whole-group path (SURVEY §7 M6)."""

import numpy as np
import pandas as pd
import ray.data as rd

from log_aggregator_ray.fixtures import generator as gen
from log_aggregator_ray.stages.parse import apply_parse
from log_aggregator_ray.stages.reassemble import apply_reassemble
from log_aggregator_ray.stages.route import add_sink_and_bucket
from log_aggregator_ray.stages.skew import detect_hot_sinks, reassemble_skewed


def _routed_frame(ds):
    df = ds.to_pandas()
    return (
        df[["sink", "turn_idx", "text", "status", "first_missing_turn"]]
        .sort_values(["sink", "turn_idx", "status"])
        .reset_index(drop=True)
        .astype({"turn_idx": "int64", "first_missing_turn": "int64"})
    )


def test_skewed_equals_plain():
    # hot conv ≈ 30% of rows, plus dups and a gap inside the hot conv
    t, gt = gen.generate_transcripts(n_convs=40, seed=42, hot_frac=0.30)
    t, gt = gen.with_gaps(t, gt, frac_convs=0.2)
    t, gt = gen.with_duplicates(t, gt, frac=0.05)

    base = apply_parse(add_sink_and_bucket(rd.from_arrow(t), num_buckets=8))

    hot = detect_hot_sinks(base, threshold_frac=0.10)
    assert "conv-000000" in hot  # the generator's designated hot conv

    plain = apply_reassemble(base)
    skewed = reassemble_skewed(base, hot, range_rows=500, num_buckets=8)

    pd.testing.assert_frame_equal(_routed_frame(plain), _routed_frame(skewed))


def test_skewed_hot_gap_quarantine():
    """Force a gap inside the hot conv across range boundaries and check the
    global window stops at it."""
    t, gt = gen.generate_transcripts(n_convs=10, seed=7, hot_frac=0.5)
    df = t.to_pandas()
    hot_max = df[df.conv_id == "conv-000000"]["turn_idx"].max()
    cut = int(hot_max // 2)
    df = df[~((df.conv_id == "conv-000000") & (df.turn_idx == cut))]
    import pyarrow as pa

    t2 = gen._to_arrow(df.reset_index(drop=True), False)

    base = apply_parse(add_sink_and_bucket(rd.from_arrow(t2), num_buckets=4))
    skewed = reassemble_skewed(
        base, {"conv-000000": 1}, range_rows=50, num_buckets=4
    )
    out = skewed.to_pandas()
    hot_rows = out[out["sink"] == "conv-000000"]
    assert (hot_rows.loc[hot_rows.turn_idx < cut, "status"] == "routed").all()
    assert (hot_rows.loc[hot_rows.turn_idx > cut, "status"] == "quarantined").all()
    assert (hot_rows.loc[hot_rows.turn_idx > cut, "first_missing_turn"] == cut).all()
