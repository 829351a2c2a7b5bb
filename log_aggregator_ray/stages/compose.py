"""Declarative pipeline composition surface (SURVEY §2.11).

The reference wires its processing chain from Spring-managed components
(agent → pump → decoder beans); the user-facing extension point here is a
plain list of ``Stage`` descriptors compiled onto a ``ray.data.Dataset``:

    stages = [
        Stage(add_sink_and_bucket_fn),                      # task stage
        Stage(Enricher, kind="actor", concurrency=(2, 8)),  # stateful pool
        Stage(reassemble_table, kind="groups", key="bucket"),
        Stage(lambda t: t.filter(...), kind="task"),
    ]
    out = build_pipeline(ds, stages)

Rules of thumb encoded by the defaults: batches are zero-copy Arrow; a
CLASS means per-actor state built once in ``__init__`` (pass
``concurrency``); ``kind="groups"`` is the ONE wide exchange — give every
stage after it the same ``key`` so the partitioning is reused, never
re-shuffled.
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field


@dataclass
class Stage:
    """One pipeline step.

    fn          callable (task) or class (actor-pool state) applied per
                batch; for ``kind="groups"`` it receives one whole group.
    kind        "task" (default) | "actor" | "groups".  A class fn with
                kind left as "task" is auto-promoted to "actor".
    key         groupby key (required for kind="groups").
    batch_size  rows per batch (None = whole blocks).
    concurrency actor-pool size (int or (min, max)); ignored for tasks.
    num_cpus    per-task/actor CPU reservation.
    batch_format  "pyarrow" (zero-copy, default) | "pandas" | "numpy".
    fn_kwargs / fn_constructor_kwargs  forwarded to map_batches.
    """

    fn: object
    kind: str = "task"
    key: str | None = None
    batch_size: object = "default"
    concurrency: object = None
    num_cpus: float | None = None
    batch_format: str = "pyarrow"
    fn_kwargs: dict = field(default_factory=dict)
    fn_constructor_kwargs: dict = field(default_factory=dict)

    def __post_init__(self):
        if self.kind == "task" and inspect.isclass(self.fn):
            self.kind = "actor"
        if self.kind == "groups" and not self.key:
            raise ValueError("kind='groups' requires a groupby key")
        if self.kind == "actor" and self.concurrency is None:
            self.concurrency = (1, 4)


def build_pipeline(ds, stages: list[Stage]):
    """Compile a Stage list onto a Dataset — the composition surface stays
    lazy; nothing executes until the caller consumes the result."""
    for st in stages:
        if st.kind == "groups":
            ds = ds.groupby(st.key).map_groups(
                st.fn, batch_format=st.batch_format,
                **({"num_cpus": st.num_cpus} if st.num_cpus else {}),
            )
            continue
        kwargs: dict = {
            "batch_format": st.batch_format,
            "fn_kwargs": st.fn_kwargs or None,
        }
        if st.batch_format == "pyarrow":
            kwargs["zero_copy_batch"] = True
        if st.batch_size != "default":
            kwargs["batch_size"] = st.batch_size
        if st.num_cpus:
            kwargs["num_cpus"] = st.num_cpus
        if st.kind == "actor":
            kwargs["concurrency"] = st.concurrency
            kwargs["fn_constructor_kwargs"] = st.fn_constructor_kwargs or None
        ds = ds.map_batches(st.fn, **{k: v for k, v in kwargs.items()
                                      if v is not None})
    return ds


def flagship_stages(num_buckets: int = 64) -> list[Stage]:
    """The flagship dataset pipeline as a declarative Stage list —
    equivalent to pipelines.flagship.flagship_dataset (tested)."""
    from ..stages.enrich import enrich_table
    from ..stages.parse import parse_batch
    from ..stages.reassemble import reassemble_table

    def add_keys(t):
        # reuse the routing stage's batch kernel via a tiny shim dataset-less
        import pyarrow as pa

        from ..stages.route import sink_expr, stable_hash
        import numpy as np

        sink = sink_expr(t)
        if not isinstance(sink, (pa.Array, pa.ChunkedArray)):
            sink = pa.array(sink)
        bucket = (stable_hash(sink) % num_buckets).astype(np.int32)
        return t.append_column("sink", sink).append_column(
            "bucket", pa.array(bucket, pa.int32())
        )

    return [
        Stage(add_keys),
        Stage(reassemble_table, kind="groups", key="bucket"),
        Stage(parse_batch),
        Stage(enrich_table),
    ]
