"""CLI entry point: ``python -m tern_ep_data_pipeline_spark <task> [sites...]``.

Parity target: the reference's ``run.py`` argparse dispatcher
(run.py:15-30 -> tasks.run_task). Tasks self-register via the ``@register``
decorator in :mod:`tern_ep_data_pipeline_spark.tasks`; deployments add a
module that registers their tasks and a site-task matrix source.
"""

from __future__ import annotations

import argparse
import json
import sys

from . import tasks
from . import tasks_builtin  # noqa: F401 - registers the built-in tasks
from .session import get_spark


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="tern-ep-spark")
    parser.add_argument("task", nargs="?", help="registered task name (see --list)")
    parser.add_argument("sites", nargs="*", help="restrict to these sites")
    parser.add_argument("--list", action="store_true", dest="list_tasks")
    args = parser.parse_args(argv)

    if args.list_tasks or not args.task:
        print("\n".join(tasks.registered_tasks()))
        return 0

    spark = get_spark("tern-ep-task")
    matrix = tasks.SiteTaskMatrix({s: {args.task: True} for s in args.sites} or {})
    results = tasks.run_task(spark, args.task, matrix, sites=args.sites or None)
    for r in results:
        print(json.dumps({"task": r.task, "site": r.site, "ok": r.ok, "error": r.error}))
    return 0 if all(r.ok for r in results) else 1


if __name__ == "__main__":
    sys.exit(main())
