"""User-extension surface (SURVEY.md §2.11): named per-batch UDFs.

The reference's extension points are pluggable tools injected into the
agent graph and YAML-configured field strategies
(/root/reference/scripts/run.py:31-34, config/default_config.yaml:23-31).
The Ray-native analog: a registry of named Arrow batch transforms that a
pipeline config can reference by NAME (strings serialize into configs and
checkpoints; callables do not), applied after the extraction stage.

UDF contract: ``fn(batch: pa.Table) -> pa.Table`` — same as any
``map_batches`` UDF; must be deterministic (no wall clock / RNG) so crawl
resume and task retries stay exact.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence, Union

import pyarrow as pa

BatchUDF = Callable[[pa.Table], pa.Table]

_REGISTRY: Dict[str, BatchUDF] = {}


def register_udf(name: str, fn: BatchUDF) -> None:
    """Register (or replace) a named batch UDF."""
    if not callable(fn):
        raise TypeError(f"UDF {name!r} is not callable")
    _REGISTRY[name] = fn


def get_udf(name: str) -> BatchUDF:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown UDF {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None


def list_udfs() -> List[str]:
    return sorted(_REGISTRY)


def resolve_udfs(
    udfs: Sequence[Union[str, BatchUDF]],
) -> List[BatchUDF]:
    """Names are looked up in the registry; callables pass through."""
    return [get_udf(u) if isinstance(u, str) else u for u in udfs]


def apply_udfs(batch: pa.Table, fns: Sequence[BatchUDF]) -> pa.Table:
    for fn in fns:
        batch = fn(batch)
    return batch
