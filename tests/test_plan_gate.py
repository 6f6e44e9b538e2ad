"""Physical-plan regression gate.

Audits every registry query's executed plan (exchange / broadcast /
sort-merge-join counts, scan pushdown) and compares against the committed
baseline PLANS.txt. A dropped broadcast hint, a new shuffle, or a lost
filter pushdown fails here instead of surfacing as a bench diff next round.

Regenerate the baseline after an intentional plan change:

    python tools/plan_audit.py --write /root/testdata/sf0.01
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

from tools.plan_audit import audit_all, parse_baseline

SF_PLAN = "/root/testdata/sf0.01"


@pytest.mark.skipif(not os.path.isdir(SF_PLAN), reason="sf0.01 testdata absent")
def test_plans_match_baseline(spark):
    baseline = parse_baseline()
    assert baseline, "PLANS.txt missing or unparseable"
    actual = audit_all(spark, SF_PLAN)

    errors = []
    for name, a in actual.items():
        if isinstance(a, str):  # failed to plan at all
            errors.append(f"{name}: {a}")
            continue
        b = baseline.get(name)
        if b is None:
            errors.append(f"{name}: not in PLANS.txt — regenerate the baseline")
            continue
        if a != b:
            diff = {k: (b[k], a[k]) for k in b if b[k] != a[k]}
            errors.append(f"{name}: plan drift (baseline, actual) = {diff}")
    # Queries removed from the registry should leave the baseline too.
    for name in baseline:
        if name not in actual:
            errors.append(f"{name}: in PLANS.txt but not in queries()")
    assert not errors, "\n".join(errors)


def test_no_sort_merge_joins_in_baseline():
    """The committed baseline itself must stay SMJ-free: every join in the
    suite either broadcasts a small side or shuffles on an aggregated key."""
    baseline = parse_baseline()
    offenders = [n for n, a in baseline.items() if a["smj"]]
    assert not offenders, f"sort-merge joins in baseline: {offenders}"
