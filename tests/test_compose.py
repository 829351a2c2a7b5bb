"""Declarative Stage composition surface (SURVEY §2.11) + per-sink fan-out."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from log_aggregator_ray.fixtures import generator as gen
from log_aggregator_ray.pipelines import flagship
from log_aggregator_ray.stages.compose import Stage, build_pipeline, flagship_stages


def test_stage_list_equals_flagship_dataset(tmp_path):
    t, _ = gen.generate_transcripts(n_convs=40, seed=3)
    t, _ = gen.with_gaps(t, None, frac_convs=0.1)
    path = str(tmp_path / "c.parquet")
    pq.write_table(t, path)

    a = (
        flagship.flagship_dataset(path, num_buckets=8)
        .to_pandas()
        .sort_values(["sink", "turn_idx"])
        .reset_index(drop=True)
    )
    b = (
        build_pipeline(rd.read_parquet(path), flagship_stages(num_buckets=8))
        .to_pandas()
        .sort_values(["sink", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])


def test_stage_kinds():
    t = pa.table({"x": list(range(100))})

    class AddN:
        def __init__(self, n=5):
            self.n = n

        def __call__(self, batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.set_column(0, "x", pc.add(batch["x"], self.n))

    def double(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.set_column(0, "x", pc.multiply(batch["x"], 2))

    out = build_pipeline(
        rd.from_arrow(t),
        [
            Stage(double),
            Stage(AddN, fn_constructor_kwargs={"n": 7}, concurrency=2),
        ],
    ).to_pandas()
    assert sorted(out["x"]) == [x * 2 + 7 for x in range(100)]
    # class auto-promotes to actor kind
    assert Stage(AddN).kind == "actor"


def test_write_sink_files(tmp_path):
    t, _ = gen.generate_transcripts(n_convs=20, seed=8)
    path = str(tmp_path / "c.parquet")
    pq.write_table(t, path)
    out = str(tmp_path / "out")
    flagship.run_flagship(path, out, num_buckets=4)

    n = flagship.write_sink_files(out)
    sinks_dir = os.path.join(out, "sinks")
    files = os.listdir(sinks_dir)
    assert n == len(files) == 20

    # one file per sink, turns in order — the reference's ServerLog artifact
    conv = sorted(files)[0].replace(".log", "")
    df = t.to_pandas()
    exp = df[df["conv_id"] == conv].sort_values("turn_idx")["text"].tolist()
    with open(os.path.join(sinks_dir, f"{conv}.log")) as f:
        got = f.read().splitlines()
    assert got == exp

    # cardinality guard refuses a filesystem-DoS fan-out
    import pytest

    with pytest.raises(ValueError, match="max_sinks"):
        flagship.write_sink_files(out, max_sinks=3)
