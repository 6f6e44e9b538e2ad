"""Excel scan (S17) — driver-side, gated on an engine being installed.

Parity target: ``code/file_handling/file_io.py:421-446`` (``read_excel``
with sheet_name/usecols/converters). The reference uses Excel only for
small operator-maintained config workbooks, so this is a driver-side read
feeding ``createDataFrame`` — never a data-plane scan.

The container may not ship an xlsx engine (openpyxl); the reader is gated
behind an import-try per the build rules and raises a clear error telling
the caller which package enables it.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession


def excel_available() -> bool:
    try:
        import openpyxl  # noqa: F401

        return True
    except ImportError:
        return False


def read_excel(
    spark: SparkSession,
    path: str,
    sheet_name: str | int = 0,
    usecols: list[str] | None = None,
    converters: dict[str, Any] | None = None,
) -> DataFrame:
    """Read one sheet of a small config workbook into a DataFrame.

    Raises NotImplementedError when no xlsx engine is installed.
    """
    if not excel_available():
        raise NotImplementedError(
            "Excel reads need the 'openpyxl' package (pip install openpyxl); "
            "not installed in this environment."
        )
    import pandas as pd

    pdf = pd.read_excel(
        path, sheet_name=sheet_name, usecols=usecols, converters=converters
    )
    return spark.createDataFrame(pdf)
