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


def stage_map_batches(ds, cls, args, config: EngineConfig, **kwargs):
    if config.use_actor_pools:
        return ds.map_batches(
            cls,
            fn_constructor_args=args,
            concurrency=config.resolve_concurrency(),
            **kwargs,
        )
    return ds.map_batches(cls(*args), **kwargs)
