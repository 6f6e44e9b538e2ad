"""Campbell logger HTTP API source (bronze ingestion).

Parity target: reference ``code/csi_loggers/logger_functions.py`` —
query modes :26-29 (``most-recent, date-range, since-time, since-record,
backfill``), URL builders :510-539, JSON->table :135-271, table/schema
discovery :302-397.

Spark shape: ingestion is driver-side (one small HTTP response per poll) into
a bronze DataFrame; a scheduled poller using ``since-record`` offsets gives
replayable incremental ingest (the reference's backfill semantics). The HTTP
transport is injectable so tests (and air-gapped runs) use a fake.
"""

from __future__ import annotations

import datetime
import json
from collections.abc import Callable
from urllib.parse import urlencode

from pyspark.sql import DataFrame, SparkSession

QUERY_MODES = ("most-recent", "date-range", "since-time", "since-record", "backfill")

#: transport: url -> response body (str). Injectable for tests.
Fetcher = Callable[[str], str]


def _default_fetcher(url: str) -> str:  # pragma: no cover - needs network
    import urllib.request

    with urllib.request.urlopen(url, timeout=60) as resp:
        return resp.read().decode()


def _format_time(dt: datetime.datetime) -> str:
    """Logger 'T'-format (logger_functions.py:562-578)."""
    return dt.strftime("%Y-%m-%dT%H:%M:%S.%f")[:-3]


def build_query_url(
    ip: str,
    table: str,
    mode: str,
    variable: str | None = None,
    start: datetime.datetime | None = None,
    end: datetime.datetime | None = None,
    record: int | None = None,
    n_records: int | None = None,
) -> str:
    """Build a dataquery URL (logger_functions.py:510-539)."""
    if mode not in QUERY_MODES:
        raise ValueError(f"invalid query mode {mode!r}; one of {QUERY_MODES}")
    uri = f"dl:{table}"
    if variable:
        uri += f".{variable}"
    params: dict[str, str] = {
        "command": "dataquery",
        "uri": uri,
        "format": "json",
        "mode": mode,
    }
    if mode == "date-range":
        params["p1"], params["p2"] = _format_time(start), _format_time(end)
    elif mode == "since-time":
        params["p1"] = _format_time(start)
    elif mode in ("since-record", "backfill"):
        params["p1"] = str(record)
    elif mode == "most-recent" and n_records is not None:
        params["p1"] = str(n_records)
    return f"http://{ip}/?{urlencode(params)}"


def parse_dataquery_json(payload: str) -> tuple[list[str], list[list]]:
    """Logger JSON -> (column names, rows) with TIMESTAMP + RECORD first
    (logger_functions.py:135-271 reshaping)."""
    doc = json.loads(payload)
    fields = [f["name"] for f in doc["head"]["fields"]]
    cols = ["TIMESTAMP", "RECORD", *fields]
    rows = []
    for rec in doc.get("data", []):
        ts = datetime.datetime.fromisoformat(rec["time"])
        rows.append([ts, int(rec["no"]), *rec["vals"]])
    return cols, rows


def fetch_table_df(
    spark: SparkSession,
    ip: str,
    table: str,
    mode: str = "most-recent",
    fetcher: Fetcher | None = None,
    **query_kwargs,
) -> DataFrame:
    """One poll -> bronze DataFrame (driver-side ingest)."""
    fetcher = fetcher or _default_fetcher
    url = build_query_url(ip, table, mode, **query_kwargs)
    cols, rows = parse_dataquery_json(fetcher(url))
    return spark.createDataFrame(rows, cols)


def poll_since_record(
    spark: SparkSession,
    ip: str,
    table: str,
    last_record: int,
    fetcher: Fetcher | None = None,
) -> tuple[DataFrame, int]:
    """Incremental poll: rows after ``last_record`` + the new high-water mark
    (the reference's backfill/since-record replay semantics)."""
    df = fetch_table_df(
        spark, ip, table, mode="since-record", fetcher=fetcher, record=last_record
    )
    new_max = df.agg({"RECORD": "max"}).collect()[0][0]
    return df, int(new_max) if new_max is not None else last_record


def get_tables(ip: str, fetcher: Fetcher | None = None) -> list[str]:
    """Schema discovery: list logger tables (logger_functions.py:302-334)."""
    fetcher = fetcher or _default_fetcher
    url = f"http://{ip}/?" + urlencode(
        {"command": "browsesymbols", "uri": "dl:", "format": "json"}
    )
    doc = json.loads(fetcher(url))
    return [s["name"] for s in doc.get("symbols", [])]
