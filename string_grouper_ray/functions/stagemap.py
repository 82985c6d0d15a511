"""Uniform dispatch for stateful map_batches stages.

Every stateful stage in the engine is a callable CLASS (setup in
``__init__``, work in ``__call__``). At scale it runs as an actor pool so
the setup (vocabulary fetch, regex compile, permutation table) happens once
per actor. For tiny inputs (the reference-compat pandas API on 6-row test
fixtures) actor-pool startup dominates wall time, so
``EngineConfig.use_actor_pools=False`` runs the SAME class as a
driver-constructed instance inside stateless tasks — identical semantics,
no pool spin-up.
"""

from __future__ import annotations

from ..config import EngineConfig


def fanout_batch(total_rows: int, config: EngineConfig, floor: int = 64) -> int:
    """Batch size for a compute-heavy map stage over a KNOWN row count.

    Task fan-out follows input batching: with the memory-sized default
    (``config.batch_size``, 4096) a 5k-row input runs as ~2 fat tasks —
    measured 2×2.3-4.8 s for MinHashBander at sf0.1, the whole stage
    serialized on two cores and its wall tracking single-core steal noise.
    Cap batches at ``total/(2×CPUs)`` so every CPU slot gets ~2 tasks
    (straggler smoothing), floored so per-batch vectorization still
    amortizes, ceilinged at ``config.batch_size`` (big inputs keep the
    memory-sized default)."""
    try:
        import ray

        cpus = max(1, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        cpus = 8
    per = max(floor, -(-int(total_rows) // (2 * cpus)))
    return int(min(config.batch_size, per))


def stage_map_batches(ds, cls, args, config: EngineConfig, **kwargs):
    if config.use_actor_pools:
        return ds.map_batches(
            cls,
            fn_constructor_args=args,
            concurrency=config.resolve_concurrency(),
            **kwargs,
        )
    return ds.map_batches(cls(*args), **kwargs)
