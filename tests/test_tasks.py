from __future__ import annotations

import pytest

from tern_ep_data_pipeline_spark import tasks


@pytest.fixture(autouse=True)
def clean_registry():
    saved = dict(tasks._REGISTRY)
    tasks._REGISTRY.clear()
    yield
    tasks._REGISTRY.clear()
    tasks._REGISTRY.update(saved)


MATRIX = tasks.SiteTaskMatrix(
    {
        "SiteA": {"ingest": True, "status": True},
        "SiteB": {"ingest": True, "status": False},
        "SiteC": {"ingest": False, "status": True},
    }
)


def test_matrix_lookup():
    assert MATRIX.sites_for("ingest") == ["SiteA", "SiteB"]
    assert MATRIX.tasks_for("SiteA") == ["ingest", "status"]


def test_run_task_with_isolation(spark):
    calls = []

    @tasks.register("ingest")
    def ingest(spark_, site):
        calls.append(site)
        if site == "SiteB":
            raise RuntimeError("logger unreachable")
        return spark_.range(3).count()

    results = tasks.run_task(spark, "ingest", MATRIX)
    assert calls == ["SiteA", "SiteB"]
    by_site = {r.site: r for r in results}
    assert by_site["SiteA"].ok and by_site["SiteA"].result == 3
    assert not by_site["SiteB"].ok and "unreachable" in by_site["SiteB"].error


def test_unknown_task_raises(spark):
    with pytest.raises(KeyError, match="unknown task"):
        tasks.run_task(spark, "nope", MATRIX)
