"""Property-based tests (hypothesis) for the pure kernels: vectorized
reassembly vs a literal loop-per-key reference, and the hot-sink
hierarchical gate vs whole-key gating.  No Ray needed — these are the
numpy/Arrow kernels every distributed path reduces to."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from log_aggregator_ray.pipelines.flagship import combine_gate
from log_aggregator_ray.stages.reassemble import reassemble_table


# one sink's delivered turns: 1-based, with duplicates, gaps and shuffling
turns_strategy = st.lists(
    st.integers(min_value=1, max_value=60), min_size=1, max_size=120
)


def _reference_gate(turns: list[int]):
    """Literal reference: sort, dedup, accept contiguous from the minimum,
    report the first missing turn (reference accept rule,
    DataPumpDecoderSort.java:142-181)."""
    u = sorted(set(turns))
    routed = [u[0]]
    for t in u[1:]:
        if t == routed[-1] + 1:
            routed.append(t)
        else:
            break
    first_missing = routed[-1] + 1 if len(routed) < len(u) else None
    return routed, first_missing


@settings(max_examples=200, deadline=None)
@given(st.dictionaries(st.sampled_from("abcdef"), turns_strategy,
                       min_size=1, max_size=6))
def test_reassemble_kernel_matches_reference(per_sink):
    rows = [(s, t) for s, ts in per_sink.items() for t in ts]
    rng = np.random.default_rng(0)
    order = rng.permutation(len(rows))
    tbl = pa.table({
        "sink": pa.array([rows[i][0] for i in order]),
        "conv_id": pa.array([rows[i][0] for i in order]),
        "turn_idx": pa.array([rows[i][1] for i in order], pa.int64()),
        "text": pa.array([f"x{rows[i][1]}" for i in order]),
    })
    out = reassemble_table(tbl)
    df = out.to_pandas()

    total_dups = int(df["dup_dropped"].sum())
    n_unique = sum(len(set(ts)) for ts in per_sink.values())
    assert total_dups == len(rows) - n_unique
    assert len(df) == n_unique

    for sink, ts in per_sink.items():
        exp_routed, exp_fm = _reference_gate(ts)
        g = df[df["sink"] == sink]
        got_routed = g[g["status"] == "routed"]["turn_idx"].tolist()
        assert got_routed == exp_routed, sink
        quar = g[g["status"] == "quarantined"]
        if exp_fm is None:
            assert len(quar) == 0
        else:
            assert set(quar["first_missing_turn"]) == {exp_fm}
            assert sorted(quar["turn_idx"]) == sorted(
                t for t in set(ts) if t not in exp_routed
            )


@settings(max_examples=300, deadline=None)
@given(turns_strategy, st.integers(min_value=2, max_value=16))
def test_hierarchical_gate_matches_whole_key(turns, block):
    """Splitting a key's turns into turn-range blocks and combining the
    per-block (mn, mx, first internal gap) summaries yields exactly the
    whole-key first-missing turn."""
    u = np.array(sorted(set(turns)), dtype=np.int64)
    _routed, exp_fm = _reference_gate(turns)

    infos = []
    for b in sorted(set(u // block)):
        seg = u[u // block == b]
        gaps = np.flatnonzero(np.diff(seg) != 1)
        infos.append({
            "mn": int(seg[0]),
            "mx": int(seg[-1]),
            "first_missing": int(seg[gaps[0]] + 1) if gaps.size else None,
        })
    assert combine_gate(infos) == exp_fm


@settings(max_examples=100, deadline=None)
@given(st.sets(st.text(min_size=1, max_size=20), min_size=0, max_size=200))
def test_sink_bloom_never_false_negative(sinks):
    """Append-merge safety rests on the bloom having NO false negatives:
    a member reported absent would let an overlapping merge take the
    append path and mis-gate a sink.  (False positives only cost an
    exact re-check.)"""
    from log_aggregator_ray.state.manifest import bloom_any_maybe, sink_bloom

    b = sink_bloom(sorted(sinks))
    for s in sinks:
        assert bloom_any_maybe(b, [s])
    if sinks:
        assert bloom_any_maybe(b, sorted(sinks))
    assert sink_bloom(sorted(sinks)) == b  # deterministic across processes
