"""Stateful enrichment stage — broadcast-dictionary lookups in an actor pool
(SURVEY §2.4 T6, §2.5 J3).

The reference loads its per-key state once per process at startup
(SequenceTracker.init scans disk once — datadecoder/.../SequenceTracker.java:
43-68) and then serves O(1) lookups per record.  The Ray-native shape is the
same amortization at actor granularity: a callable CLASS passed to
``map_batches(Cls, concurrency=N)`` builds its lookup arrays ONCE in
``__init__`` (optionally from a ``ray.put`` broadcast ref so a large dim is
shipped to each node once, not per task) and performs vectorized
``pc.index_in`` + ``pc.take`` joins per batch — a broadcast hash join with no
shuffle.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


class Enricher:
    """Actor-pool stage: append role_class/role_priority/tool_family/tool_risk.

    Parameters are plain objects or ``ray.ObjectRef``s (resolved once here —
    the broadcast-small-side pattern).  Defaults come from
    ``functions.dicts``.
    """

    def __init__(self, roles_ref=None, tools_ref=None):
        import ray

        from ..functions import dicts

        roles = ray.get(roles_ref) if isinstance(roles_ref, ray.ObjectRef) else roles_ref
        tools = ray.get(tools_ref) if isinstance(tools_ref, ray.ObjectRef) else tools_ref
        roles = dicts.roles_table() if roles is None else roles
        tools = dicts.tools_table() if tools is None else tools

        # key arrays + payload arrays, combined once per actor
        self._role_keys = roles["role"].combine_chunks()
        self._role_class = roles["role_class"].combine_chunks()
        self._role_priority = pc.cast(roles["priority"].combine_chunks(), pa.int32())
        self._tool_keys = tools["tool_name"].combine_chunks()
        self._tool_family = tools["tool_family"].combine_chunks()
        self._tool_risk = tools["risk"].combine_chunks()

    def _lookup(self, keys, dict_keys, payload, default):
        idx = pc.index_in(keys, value_set=dict_keys)
        return pc.fill_null(pc.take(payload, idx), default)

    def __call__(self, batch: pa.Table) -> pa.Table:
        role = batch["role"]
        tool_name = batch["tool_name"]
        return (
            batch.append_column(
                "role_class", self._lookup(role, self._role_keys, self._role_class, "unknown")
            )
            .append_column(
                "role_priority",
                pc.cast(
                    self._lookup(role, self._role_keys, self._role_priority, -1), pa.int32()
                ),
            )
            .append_column(
                "tool_family",
                self._lookup(tool_name, self._tool_keys, self._tool_family, ""),
            )
            .append_column(
                "tool_risk", self._lookup(tool_name, self._tool_keys, self._tool_risk, "")
            )
        )


_DEFAULT_ENRICHER = None


def enrich_table(batch: pa.Table) -> pa.Table:
    """Task-side enrichment with a process-cached default Enricher — used
    when enrich runs fused AFTER the shuffle (the flagship's layout: ship
    the narrow raw rows, derive columns post-exchange).  The actor-pool
    ``apply_enrich`` remains the pattern for genuinely heavy state."""
    global _DEFAULT_ENRICHER
    if _DEFAULT_ENRICHER is None:
        _DEFAULT_ENRICHER = Enricher()
    return _DEFAULT_ENRICHER(batch)


def apply_enrich(ds, concurrency=2, batch_size: int = 32768, num_cpus: float = 1,
                 roles_ref=None, tools_ref=None):
    """Attach the enrich actor pool.  ``concurrency`` may be an int or
    ``(min, max)`` for autoscaling; size ``concurrency × num_cpus`` to leave
    CPUs for read/parse/shuffle stages."""
    return ds.map_batches(
        Enricher,
        fn_constructor_kwargs={"roles_ref": roles_ref, "tools_ref": tools_ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )
