from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tern_ep_data_pipeline_spark.operators import skew
from tern_ep_data_pipeline_spark.sources import csixml

CSIXML_DOC = b"""<?xml version="1.0" standalone="yes"?>
<csixml version="1.0">
  <head>
    <environment>
      <station-name>TestSite</station-name>
    </environment>
    <fields>
      <field name="Ta" type="xsd:float" process="Avg"/>
      <field name="RH" type="xsd:float" process="Avg"/>
    </fields>
  </head>
  <data>
    <r time="2024-01-01T00:30:00" no="1"><v1>21.5</v1><v2>55.0</v2></r>
    <r time="2024-01-01T01:00:00" no="2"><v1>21.7</v1><v2>bad</v2></r>
    <r time="2024-01-01T01:30:00.5" no="3"><v1>21.9</v1><v2>57.0</v2></r>
  </data>
</csixml>
"""


def test_decode_csixml():
    pdf = csixml.decode_csixml(CSIXML_DOC)
    assert list(pdf.columns) == ["TIMESTAMP", "RECORD", "Ta", "RH"]
    assert len(pdf) == 3
    assert pdf["Ta"].iloc[0] == pytest.approx(21.5)
    assert pdf["RH"].iloc[1] != pdf["RH"].iloc[1]  # 'bad' -> NaN
    assert pdf["TIMESTAMP"].iloc[2].microsecond == 500_000


def test_csixml_spark_read(spark, tmp_path):
    d = tmp_path / "xml"
    d.mkdir()
    (d / "a.xml").write_bytes(CSIXML_DOC)
    (d / "b.xml").write_bytes(CSIXML_DOC)
    df = csixml.read_csixml(spark, str(d))
    assert df.count() == 6
    assert dict(df.dtypes)["TIMESTAMP"] == "timestamp_ntz"
    assert df.agg(F.sum("RECORD")).collect()[0][0] == 12


def test_salted_aggregate_matches_direct(spark, sf_dir):
    from tern_ep_data_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    salted = skew.salted_sum_count(ev, ["event_type"], "value", salt_buckets=8)
    direct = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("sum"),
        F.min("value").alias("min"),
        F.max("value").alias("max"),
    )
    a = {tuple(r) for r in salted.collect()}
    b = {tuple(r) for r in direct.collect()}
    assert a == b
