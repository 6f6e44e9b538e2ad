"""Partition-layout determinism gate for every registry query.

The round-5 `doc_profile` hash flake was a float-aggregation determinism
failure: `round(avg(double), 6)` is not associative, so a value sitting
~1e-11 from a rounding boundary flips its 6th decimal with task/partition
ordering. The fix (operators/text.py `unigram_logprob`) quantises to
integers before summing; THIS test is the harness that keeps every gate
column honest: each `queries()` entry is executed under three deliberately
different partition layouts (single-partition, many-tiny-input-splits with
an odd shuffle width, and the session default) and the collected results
must be byte-identical.

A query that fails here would flake the driver's hash gate sooner or later
— fix the aggregation to be order-independent, don't loosen this test.
"""

from __future__ import annotations

import math
import sys

import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"

#: Layout knobs (all runtime-settable). The first forces one task
#: everywhere (the associativity-free reference ordering); the second
#: shatters file scans into many tiny splits and uses a shuffle width
#: coprime to everything; the third is the tuned session default.
LAYOUTS = {
    "single": {
        "spark.sql.shuffle.partitions": "1",
        "spark.sql.files.maxPartitionBytes": "268435456",
        "spark.sql.files.openCostInBytes": "4194304",
        "spark.sql.adaptive.enabled": "false",
    },
    "shattered": {
        "spark.sql.shuffle.partitions": "7",
        "spark.sql.files.maxPartitionBytes": "16384",
        "spark.sql.files.openCostInBytes": "0",
        "spark.sql.adaptive.enabled": "true",
    },
    "default": {
        "spark.sql.shuffle.partitions": "4",
        "spark.sql.files.maxPartitionBytes": "134217728",
        "spark.sql.files.openCostInBytes": "4194304",
        "spark.sql.adaptive.enabled": "true",
    },
}


def _cell_key(v):
    """Exact, orderable, hashable canonical form of one cell.

    repr() of a float round-trips the exact double, so two runs agree here
    iff they agree bitwise; lists/arrays/maps flatten recursively.
    """
    if v is None:
        return "\x00none"
    if isinstance(v, float):
        if math.isnan(v):
            return "\x00nan"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_cell_key(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(
            f"{_cell_key(k)}:{_cell_key(x)}" for k, x in sorted(v.items())
        ) + "}"
    if isinstance(v, bytes):
        return v.hex()
    # pandas NaT / numpy nan floats arrive as float above; everything else
    # (str, int, bool, Timestamp, Decimal) reprs stably.
    return repr(v)


def _canonical(df) -> pd.DataFrame:
    pdf = df.toPandas()
    pdf = pdf[sorted(pdf.columns)]
    out = pd.DataFrame(
        {c: [_cell_key(v) for v in pdf[c]] for c in pdf.columns},
        columns=list(pdf.columns),
    )
    if len(out.columns):
        out = out.sort_values(by=list(out.columns), ignore_index=True)
    return out


def _run_layout(spark, qfn, conf: dict[str, str], sf: str = SF) -> pd.DataFrame:
    from tern_ep_data_pipeline_spark.operators.dedup import release_staged

    saved = {k: spark.conf.get(k, None) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        return _canonical(qfn(spark, sf))
    finally:
        # two leaks would make this suite order-dependent for the REST of
        # the session: layout confs (restore/unset), and the operators'
        # staged/memoised frames — a later test (e.g. the sf0.01 plan
        # audit) would see memo-reused InMemoryRelations where its
        # baseline expects fresh subplans. Releasing per layout also makes
        # each layout recompute the staged subtrees under ITS OWN
        # partitioning instead of inheriting the first layout's cache.
        release_staged(spark)
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)
            else:  # never-set key: unset, don't leak the layout value
                spark.conf.unset(k)


QUERIES = sorted(entrymod.queries().keys())

#: Queries whose gate columns round float aggregations over unbounded
#: element counts — the class that actually flaked in round 5, and it
#: flaked at sf0.01 (the boundary document does not exist at sf0.001), so
#: these re-run the 3-layout gate at the driver's own correctness scale.
FLOAT_AGG_QUERIES = [
    "doc_profile_a",
    "doc_profile_b",
    "label_centroids",
    "embedding_near_dup",
    "ann_ivf_topk",
    "summary_stats",
    "diel_cycle",
    "llm_curation_suite",  # tfidf/rep float columns + CC/splits
    "approx_stats",  # HLL registers + GK quantile summaries (sketch merges)
]
SF_DRIVER = "/root/testdata/sf0.01"


def _check_layouts(spark, name, qfn, sf):
    frames = {
        lname: _run_layout(spark, qfn, conf, sf)
        for lname, conf in LAYOUTS.items()
    }
    ref_name, ref = "single", frames["single"]
    for lname, got in frames.items():
        if lname == ref_name:
            continue
        assert list(got.columns) == list(ref.columns), (
            f"{name}: columns drift under layout {lname!r}"
        )
        assert len(got) == len(ref), (
            f"{name}: row count {len(got)} under layout {lname!r} "
            f"vs {len(ref)} under {ref_name!r}"
        )
        if not got.equals(ref):
            neq = (got != ref).any(axis=0)
            bad_cols = [c for c in got.columns if neq[c]]
            detail = []
            for c in bad_cols[:3]:
                mask = got[c] != ref[c]
                i = int(mask.idxmax())
                detail.append(
                    f"col {c!r} row {i}: {ref[c][i]!r} ({ref_name}) != "
                    f"{got[c][i]!r} ({lname})"
                )
            raise AssertionError(
                f"{name}: result depends on partition layout {lname!r}; "
                f"non-deterministic columns {bad_cols}: " + "; ".join(detail)
            )


@pytest.mark.parametrize("name", QUERIES)
def test_layout_determinism(spark, name):
    _check_layouts(spark, name, entrymod.queries()[name], SF)


@pytest.mark.parametrize("name", FLOAT_AGG_QUERIES)
def test_layout_determinism_driver_scale(spark, name):
    _check_layouts(spark, name, entrymod.queries()[name], SF_DRIVER)
