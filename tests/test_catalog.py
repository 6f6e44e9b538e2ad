from __future__ import annotations

import pytest

from tern_ep_data_pipeline_spark.catalog import (
    PFPNameError,
    build_site_variables,
    parse_variable_name,
    plausible_bounds,
    units_nonconforming,
)
from tern_ep_data_pipeline_spark.catalog.pfp_names import vertical_location_to_metres
from tern_ep_data_pipeline_spark.catalog.variables import (
    nearest_height_variable,
    translation_by_file,
)


def test_parse_simple_quantity():
    p = parse_variable_name("Ta_2m")
    assert p.quantity == "Ta"
    assert p.vertical_location == "2m"
    assert p.standard_units == "degC"
    assert p.plausible_min == -30.0


def test_parse_fused_instrument():
    p = parse_variable_name("CO2_IRGA")
    assert p.quantity == "CO2_IRGA"
    assert p.instrument_type == "IRGA"


def test_parse_system_and_process():
    p = parse_variable_name("Fco2_EP")
    assert p.quantity == "Fco2"
    assert p.system_type == "EddyPro"
    p2 = parse_variable_name("Ws_SONIC_Av")
    assert p2.quantity == "Ws_SONIC"
    assert p2.process == "Av"


def test_parse_variance_units_rewrite():
    p = parse_variable_name("Tv_SONIC_Vr")
    assert p.process == "Vr"
    assert p.standard_units == "degC^2"


def test_parse_count_and_qc_rewrites():
    ct = parse_variable_name("Ta_2m_Ct")
    assert ct.standard_units == "1"
    assert ct.long_name.startswith("Number of samples")
    qc = parse_variable_name("Ta_2m_QC")
    assert qc.long_name.startswith("QC flag value")


def test_parse_glued_location_replicate():
    p = parse_variable_name("Sws_0.1ma2")
    assert p.vertical_location == "0.1m"
    assert p.horizontal_location == "a"
    assert p.replicate == "2"


def test_parse_depth_range():
    p = parse_variable_name("Sws_0-30cm")
    assert p.vertical_location == "0-30cm"
    assert vertical_location_to_metres("0-30cm") == pytest.approx(0.15)
    assert vertical_location_to_metres("1.5m") == 1.5


def test_parse_rejects_unknown_quantity():
    with pytest.raises(PFPNameError, match="not a valid quantity"):
        parse_variable_name("Banana_2m")


def test_parse_rejects_leftover():
    with pytest.raises(PFPNameError, match="unrecognised element"):
        parse_variable_name("Ta_2m_xx_yy")


SITE_MAP = {
    "Ta_2m": {
        "name": "AirTC_Avg", "units": "degC", "height": "2m",
        "instrument": "HMP155", "statistic_type": "average",
        "logger": "L1", "table": "slow",
    },
    "Ta_10m": {
        "name": "AirTC_10_Avg", "units": "K", "height": "10m",
        "instrument": "HMP45", "statistic_type": "average",
        "logger": "L1", "table": "slow",
    },
    "RH_2m": {
        "name": "RH_Avg", "units": "frac", "height": "2m",
        "instrument": "HMP155", "statistic_type": "average",
        "file": "site_L1_slow.dat",
    },
}


def test_build_site_variables():
    cat = build_site_variables(SITE_MAP)
    assert cat["Ta_2m"]["quantity"] == "Ta"
    assert cat["Ta_2m"]["height_m"] == 2.0
    assert cat["Ta_2m"]["standard_units"] == "degC"


def test_build_rejects_missing_fields():
    with pytest.raises(ValueError, match="missing requisite"):
        build_site_variables({"Ta_2m": {"name": "x"}})


def test_units_nonconforming_worklist():
    cat = build_site_variables(SITE_MAP)
    work = units_nonconforming(cat)
    assert set(work) == {"Ta_10m", "RH_2m"}
    assert work["Ta_10m"] == ("K", "degC")


def test_plausible_bounds():
    cat = build_site_variables(SITE_MAP)
    assert plausible_bounds(cat)["RH_2m"] == (0.0, 100.0)


def test_translation_by_file():
    cat = build_site_variables(SITE_MAP)
    t = translation_by_file(cat)
    assert t["L1_slow.dat"]["AirTC_Avg"] == "Ta_2m"
    assert t["site_L1_slow.dat"]["RH_Avg"] == "RH_2m"


def test_parse_sparql_bindings():
    from tern_ep_data_pipeline_spark.catalog.site import parse_sparql_bindings

    payload = {
        "results": {
            "bindings": [
                {
                    "site": {"type": "literal", "value": "CumberlandPlain"},
                    "latitude": {"type": "literal", "value": "-33.615"},
                },
                {"site": {"type": "literal", "value": "Tumbarumba"}},
            ]
        }
    }
    recs = parse_sparql_bindings(payload)
    assert recs[0] == {"site": "CumberlandPlain", "latitude": "-33.615"}
    assert recs[1] == {"site": "Tumbarumba"}
    assert parse_sparql_bindings({}) == []


def test_to_site_time(spark):
    import datetime

    from tern_ep_data_pipeline_spark.catalog.site import to_site_time

    df = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 1, 0, 0),)], ["ts"]
    )
    out = df.select(to_site_time("ts", 9.5).alias("local")).collect()[0]["local"]
    assert out == datetime.datetime(2024, 1, 1, 9, 30)


def test_pair_soil_variables():
    from tern_ep_data_pipeline_spark.catalog.variables import pair_soil_variables

    site_map = {
        name: {
            "name": name, "units": "m^3/m^3" if name.startswith("Sws") else "degC",
            "height": "x", "instrument": "CS650", "statistic_type": "average",
            "logger": "L1", "table": "soil",
        }
        for name in ("Sws_0.1m", "Sws_0.5m", "Ts_0.1m", "Ts_0.5m", "Ts_1m")
    }
    cat = build_site_variables(site_map)
    pairs = pair_soil_variables(cat)
    assert pairs == [("Sws_0.1m", "Ts_0.1m"), ("Sws_0.5m", "Ts_0.5m")]


def test_nearest_height_match():
    cat = build_site_variables(SITE_MAP)
    assert nearest_height_variable(cat, "Ta", 9.0) == "Ta_10m"
    assert nearest_height_variable(cat, "Ta", 2.5) == "Ta_2m"
    assert nearest_height_variable(cat, "Fco2", 2.0) is None


# --- cross-field site-config validation (var_metadata.py:738-935) ----------


def _base_vars():
    return {
        "Ta_2m_SONIC": {"instrument": "CSAT3B", "logger": "L1", "table": "fast"},
        "Ah_2m_IRGA": {"instrument": "EC155", "logger": "L1", "table": "fast"},
        "Fco2_EP": {"instrument": "EC155", "file": "eddypro.csv"},
        "Diag_SONIC": {
            "instrument": "CSAT3B",
            "logger": "L1",
            "table": "fast",
            "diag_type": "invalid_count",
        },
    }


def test_site_config_valid_and_derived_attrs():
    from tern_ep_data_pipeline_spark.catalog.variables import validate_site_config

    derived = validate_site_config(_base_vars())
    assert derived["sonic_instrument"] == "CSAT3B"
    assert derived["irga_instrument"] == "EC155"
    assert derived["diag_type"] == "invalid_count"
    assert derived["flux_suffix"] == "EP"
    assert derived["system_type"] == "EddyPro"


@pytest.mark.parametrize(
    "mutate,match",
    [
        # file AND logger+table together
        (lambda v: v["Fco2_EP"].update(logger="L1", table="fast"), "not both"),
        # neither file nor a complete logger+table pair
        (lambda v: v["Ta_2m_SONIC"].pop("table"), "file OR \\(logger AND table\\)"),
        # bad diag_type value
        (lambda v: v["Diag_SONIC"].update(diag_type="bogus"), "diag_type must be one of"),
        # Diag_* without diag_type
        (lambda v: v["Diag_SONIC"].pop("diag_type"), "must define diag_type"),
        # inconsistent diag_type across diagnostics
        (
            lambda v: v.update(
                Diag_IRGA={
                    "instrument": "EC155",
                    "logger": "L1",
                    "table": "fast",
                    "diag_type": "valid_count",
                }
            ),
            "inconsistent diag_type",
        ),
        # two different SONIC instruments
        (
            lambda v: v.update(
                Ux_2m_SONIC={"instrument": "CSAT3A", "logger": "L1", "table": "fast"}
            ),
            "SONIC variables must share",
        ),
        # two different IRGA instruments
        (
            lambda v: v.update(
                CO2_2m_IRGA={"instrument": "LI7500", "logger": "L1", "table": "fast"}
            ),
            "IRGA variables must share",
        ),
        # flux var with no suffix
        (
            lambda v: v.update(ustar={"instrument": "CSAT3B", "file": "f.csv"}),
            "must end with _EP/_EF/_DL",
        ),
        # flux var with invalid suffix
        (
            lambda v: v.update(Fh_XX={"instrument": "CSAT3B", "file": "f.csv"}),
            "invalid suffix",
        ),
        # mixed EP/EF naming systems
        (
            lambda v: v.update(Fe_EF={"instrument": "EC155", "file": "f.csv"}),
            "must share the same suffix",
        ),
    ],
)
def test_site_config_rejects(mutate, match):
    from tern_ep_data_pipeline_spark.catalog.variables import validate_site_config

    v = _base_vars()
    mutate(v)
    with pytest.raises(ValueError, match=match):
        validate_site_config(v)


def test_site_config_collects_all_errors():
    """Unlike the reference's first-failure pydantic raise, every violation
    is reported in one pass."""
    from tern_ep_data_pipeline_spark.catalog.variables import validate_site_config

    v = _base_vars()
    v["Fco2_EP"].update(logger="L1", table="fast")
    v["Diag_SONIC"].pop("diag_type")
    try:
        validate_site_config(v)
        raise AssertionError("should have raised")
    except ValueError as e:
        msg = str(e)
        assert "not both" in msg and "must define diag_type" in msg
