"""CSIXML source (Campbell Scientific XML data files).

Parity target: reference ``code/file_handling/read_cs_files.py:204-243``
(record walk: timestamp + record number in attributes, values in child
element text) and the CSIXML meta block :152-174 (field names/types from the
head element, TIMESTAMP/RECORD prepended).

Spark shape: same as the TOB decoders — ``binaryFile`` listing +
``mapInPandas`` with a stdlib ElementTree parse per file. CSIXML is a rare
format (SURVEY.md S9), so clarity beats cleverness here; the distributed
scaffolding is identical to the hot TOB path.
"""

from __future__ import annotations

import datetime
import xml.etree.ElementTree as ET
from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd


@dataclass
class CsixmlMeta:
    field_names: list[str]  # value fields (TIMESTAMP/RECORD implicit)
    field_types: list[str]


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def parse_csixml_meta(content: bytes) -> CsixmlMeta:
    root = ET.fromstring(content)
    head = next(el for el in root if _localname(el.tag) == "head")
    fields = [el for el in head.iter() if _localname(el.tag) == "field"]
    return CsixmlMeta(
        field_names=[f.attrib.get("name", f"f{i}") for i, f in enumerate(fields)],
        field_types=[f.attrib.get("type", "xsd:float") for f in fields],
    )


def _parse_time(text: str) -> datetime.datetime:
    fmt = "%Y-%m-%dT%H:%M:%S.%f" if "." in text else "%Y-%m-%dT%H:%M:%S"
    return datetime.datetime.strptime(text, fmt)


def decode_csixml(content: bytes) -> pd.DataFrame:
    """One file -> (TIMESTAMP, RECORD, fields...) rows."""
    meta = parse_csixml_meta(content)
    root = ET.fromstring(content)
    data_el = next(el for el in root if _localname(el.tag) == "data")
    ts, nos, cols = [], [], [[] for _ in meta.field_names]
    for record in data_el:
        ts.append(_parse_time(record.attrib["time"]))
        nos.append(int(record.attrib["no"]))
        values = list(record)
        for i in range(len(meta.field_names)):
            text = values[i].text if i < len(values) else None
            try:
                cols[i].append(float(text) if text is not None else None)
            except ValueError:
                cols[i].append(None)
    out = {"TIMESTAMP": pd.Series(ts, dtype="datetime64[us]"), "RECORD": pd.Series(nos, dtype="int64")}
    for name, col in zip(meta.field_names, cols):
        out[name] = pd.Series(col, dtype="float64")
    return pd.DataFrame(out)


def read_csixml(spark, path_glob: str, sample_path: str | None = None):
    """Distributed CSIXML read: binaryFile -> mapInPandas decode."""
    binary = spark.read.format("binaryFile").load(path_glob)
    if sample_path is not None:
        with open(sample_path, "rb") as fh:
            meta = parse_csixml_meta(fh.read())
    else:
        first = binary.select("content").limit(1).collect()
        if not first:
            raise ValueError(f"no files matched {path_glob!r}")
        meta = parse_csixml_meta(bytes(first[0][0]))

    schema = ", ".join(
        ["TIMESTAMP TIMESTAMP_NTZ", "RECORD BIGINT"]
        + [f"`{n}` DOUBLE" for n in meta.field_names]
    )
    ordered = ["TIMESTAMP", "RECORD", *meta.field_names]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                yield decode_csixml(bytes(content))[ordered]

    return binary.select("content").mapInPandas(run, schema=schema)
