from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tern_ep_data_pipeline_spark.functions import conversions as cv
from tern_ep_data_pipeline_spark.functions import met


def _eval(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_temperature_conversion(spark):
    assert _eval(spark, cv.convert_temperature(F.lit(293.15))) == pytest.approx(20.0)


def test_co2_flux_conversion(spark):
    assert _eval(spark, cv.convert_co2_flux(F.lit(0.44))) == pytest.approx(10.0)


def test_variance_stdev_roundtrip(spark):
    v = _eval(
        spark, cv.convert_stdev_to_variance(cv.convert_variance_to_stdev(F.lit(6.25)))
    )
    assert v == pytest.approx(6.25)


def test_unit_aware_variance_conversion(spark):
    # variance in (mg/m^2/s)^2 converted to (umol/m^2/s)^2
    out = _eval(spark, cv.convert_variance(F.lit(4.0), cv.convert_co2_flux))
    assert out == pytest.approx((2.0 * 1000 / 44) ** 2)


def test_dispatcher_unknown_quantity():
    with pytest.raises(KeyError):
        cv.convert_variable("NotAQuantity", F.lit(1.0))


def test_buck_es_at_20c(spark):
    # Buck (1996): es(20 degC) ~ 2.3388 kPa
    assert _eval(spark, met.calculate_es(F.lit(20.0))) == pytest.approx(2.3388, abs=2e-3)


def test_vpd_zero_at_saturation(spark):
    assert _eval(spark, met.calculate_VPD(F.lit(15.0), F.lit(100.0))) == pytest.approx(0.0, abs=1e-12)


def test_rh_ah_inverse(spark):
    ah = met.calculate_AH_from_RH(F.lit(25.0), F.lit(60.0), F.lit(101.3))
    rh = met.calculate_RH_from_AH(F.lit(25.0), ah, F.lit(101.3))
    assert _eval(spark, rh) == pytest.approx(60.0, abs=1e-9)


def test_dew_point_below_temperature(spark):
    td = _eval(spark, met.calculate_dew_point(F.lit(25.0), F.lit(50.0)))
    assert td < 25.0
    assert math.isfinite(td)


def test_get_function_signature_introspection():
    fn, params = met.get_function("AH")
    assert params == ["Ta", "RH", "ps"]
