"""Parse stage: vectorized extraction matches generator ground truth."""

import pyarrow as pa

import ray.data as rd

from log_aggregator_ray.fixtures import generator as gen
from log_aggregator_ray.stages.parse import apply_parse, parse_batch


def test_parse_batch_direct():
    t, gt = gen.generate_transcripts(n_convs=30, seed=42)
    out = parse_batch(t)
    df = out.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    exp = gt.turns.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert (df["event_type"].values == exp["event_type"].values).all()
    assert (df["error_code"].values == exp["error_code"].values).all()
    assert (df["counter"].values == exp["counter"].values).all()
    assert (df["tool_name"].values == exp["tool_name"].values).all()
    # tool_exit present iff tool string non-empty
    assert ((df["tool_exit"].values >= 0) == (df["tool"] != "").values).all()


def test_parse_handles_unparseable_text():
    t = pa.table(
        {
            "conv_id": ["c"],
            "turn_idx": pa.array([1], pa.int32()),
            "role": ["user"],
            "text": ["no markers here at all"],
            "tool": [""],
            "ts": pa.array([0], pa.timestamp("us")),
        }
    )
    out = parse_batch(t)
    assert out["event_type"][0].as_py() == "msg"
    assert out["error_code"][0].as_py() == ""
    assert out["counter"][0].as_py() == 0
    assert out["tool_exit"][0].as_py() == -1


def test_parse_on_dataset(tmp_path):
    path = gen.ensure_corpus("parse", n_convs=40, base=str(tmp_path))
    ds = apply_parse(rd.read_parquet(path))
    out = ds.to_pandas()
    assert {"event_type", "error_code", "counter", "tool_name"} <= set(out.columns)
    assert (out.sort_values(["conv_id", "turn_idx"])["counter"].values
            == out.sort_values(["conv_id", "turn_idx"])["turn_idx"].values).all()
