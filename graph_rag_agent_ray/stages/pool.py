"""Stage-execution helper: actor pool vs worker-cached tasks.

Two ways to host a stateful batch transform:

- **Actor pool** (``map_batches(Cls, concurrency=(1, N))``): state built once
  per actor in ``__init__``. Right when state is genuinely expensive — a model
  checkpoint, an API client with connection pools. Cost: every actor is a
  fresh Python process (interpreter + imports ≈ seconds); in short jobs the
  pool spin-up can dominate.
- **Worker-cached tasks** (this helper): a plain function that lazily builds
  the stage object ONCE PER WORKER PROCESS and reuses it across tasks. Ray
  task workers are long-lived and shared across stages, so there is no
  per-stage process spawn at all. Right when state is cheap to build
  (compiled regexes, hash tables) but must still be amortized across batches.

Stage classes opt in with ``STATELESS_OK = True`` (deterministic mock stages);
model-backed classes leave it unset and get a real actor pool.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

_WORKER_CACHE: Dict[Tuple, Any] = {}


def worker_cached(cls: type, **ctor_kwargs: Any) -> Callable:
    """Wrap a callable class as a task function with per-worker instance reuse."""
    key = (cls.__module__, cls.__qualname__, repr(sorted(ctor_kwargs.items())))

    def fn(batch):
        inst = _WORKER_CACHE.get(key)
        if inst is None:
            inst = cls(**ctor_kwargs)
            _WORKER_CACHE[key] = inst
        return inst(batch)

    fn.__name__ = f"cached[{cls.__name__}]"
    return fn


def stage_map_batches(
    ds,
    cls: type,
    ctor_kwargs: dict,
    *,
    batch_size: int,
    max_pool: int,
    num_cpus: float = 1,
    batch_format: str = "pyarrow",
):
    """Dispatch a stage to worker-cached tasks (STATELESS_OK classes) or an
    autoscaling actor pool (everything else)."""
    if getattr(cls, "STATELESS_OK", False):
        return ds.map_batches(
            worker_cached(cls, **ctor_kwargs),
            batch_format=batch_format,
            batch_size=batch_size,
            num_cpus=num_cpus,
        )
    return ds.map_batches(
        cls,
        fn_constructor_kwargs=ctor_kwargs,
        batch_format=batch_format,
        batch_size=batch_size,
        concurrency=(1, max_pool),
        num_cpus=num_cpus,
    )
