"""Execution tuning knobs (SURVEY §4; measured, not guessed).

Measured on this sandbox (32-CPU local node, sf0.1 corpus = 1.35M turns,
128-bucket groupby of the full wide row):

    sort_shuffle_pull_based (default)   34 s
    hash_shuffle                       101 s
    sort_shuffle_push_based            5.5 s

Push-based sort shuffle wins by 6× for this wide-row/small-key exchange, so
every flagship entry point applies it.  ``configure`` mutates the ambient
DataContext only for knobs that are safe session-wide; per-stage sizing
stays at the call sites.
"""

from __future__ import annotations


def configure(num_cpus_hint: int | None = None):
    """Apply measured execution settings to the current DataContext."""
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
    return ctx


def available_cpus(default: int = 8) -> int:
    import ray

    if ray.is_initialized():
        return int(ray.cluster_resources().get("CPU", default))
    return default


def enrich_pool_size() -> tuple[int, int]:
    """Actor-pool bounds for the enrich stage: leave CPUs for read/shuffle
    stages (a pool reserving every CPU serializes the pipeline)."""
    cpus = available_cpus()
    return (2, max(4, cpus // 2))
