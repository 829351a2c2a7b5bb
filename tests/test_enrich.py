"""Enrich stage: actor-pool dictionary joins, including ray.put broadcast."""

import ray
import ray.data as rd

from log_aggregator_ray.fixtures import generator as gen
from log_aggregator_ray.functions import dicts
from log_aggregator_ray.stages.enrich import Enricher, apply_enrich
from log_aggregator_ray.stages.parse import apply_parse, parse_batch


def test_enricher_class_direct():
    # smoke the class outside Ray (actor __init__ errors surface late otherwise)
    t, _ = gen.generate_transcripts(n_convs=20, seed=42)
    out = Enricher()(parse_batch(t))
    df = out.to_pandas()
    assert set(df.loc[df["role"] == "assistant", "role_class"]) == {"model"}
    assert set(df.loc[df["role"] == "tool", "role_class"]) == {"machine"}
    # every known tool_name resolves; empty tool_name gets ""
    known = set(dicts.TOOLS["tool_name"])
    got = df.loc[df["tool_name"] != "", ["tool_name", "tool_family"]]
    assert set(got["tool_name"]) <= known
    assert (got["tool_family"] != "").all()
    assert (df.loc[df["tool_name"] == "", "tool_family"] == "").all()


def test_enrich_on_dataset_with_broadcast(tmp_path):
    path = gen.ensure_corpus("enrich", n_convs=30, base=str(tmp_path))
    roles_ref = ray.put(dicts.roles_table())
    tools_ref = ray.put(dicts.tools_table())
    ds = apply_enrich(
        apply_parse(rd.read_parquet(path)),
        concurrency=2,
        roles_ref=roles_ref,
        tools_ref=tools_ref,
    )
    df = ds.to_pandas()
    assert "role_priority" in df.columns
    assert df.loc[df["role"] == "user", "role_priority"].eq(2).all()
    assert df["role_class"].ne("unknown").all()
