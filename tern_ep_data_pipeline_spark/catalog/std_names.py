"""Standard-quantity attribute table (PFP naming standard).

Parity target: the reference's ``code/configs/pfp_std_names.yml`` (113
quantities with long_name / standard_name / standard_units / plausible
bounds). This is a representative working subset covering every quantity the
pipeline transforms touch; extend per deployment. Driver-side data — it
rides along as literals / a broadcast dimension, never a big table.
"""

from __future__ import annotations

#: quantity -> (long_name, standard_name | None, standard_units,
#:              plausible_min | None, plausible_max | None)
STD_NAMES: dict[str, tuple[str, str | None, str, float | None, float | None]] = {
    "AH": ("Absolute humidity", "mass_concentration_of_water_vapor_in_air", "g/m^3", 0.0, 50.0),
    "AH_IRGA": ("Absolute humidity", "mass_concentration_of_water_vapor_in_air", "g/m^3", 0.0, 50.0),
    "CO2": ("CO2 mole fraction", "mole_fraction_of_carbon_dioxide_in_air", "umol/mol", 350.0, 900.0),
    "CO2c": ("CO2 density", "mass_concentration_of_carbon_dioxide_in_air", "mg/m^3", 500.0, 2000.0),
    "CO2_IRGA": ("CO2 mole fraction", "mole_fraction_of_carbon_dioxide_in_air", "umol/mol", 350.0, 900.0),
    "Fco2": ("CO2 flux", "surface_upward_mole_flux_of_carbon_dioxide", "umol/m^2/s", -100.0, 100.0),
    "Fe": ("Latent heat flux", "surface_upward_latent_heat_flux", "W/m^2", -200.0, 1500.0),
    "Fg": ("Ground heat flux", "downward_heat_flux_at_ground_level_in_soil", "W/m^2", -300.0, 300.0),
    "Fh": ("Sensible heat flux", "surface_upward_sensible_heat_flux", "W/m^2", -200.0, 1500.0),
    "Fld": ("Down-welling longwave radiation", "surface_downwelling_longwave_flux_in_air", "W/m^2", 150.0, 500.0),
    "Flu": ("Up-welling longwave radiation", "surface_upwelling_longwave_flux_in_air", "W/m^2", 200.0, 700.0),
    "Fn": ("Net radiation", "surface_net_downward_radiative_flux", "W/m^2", -300.0, 1200.0),
    "Fsd": ("Down-welling shortwave radiation", "surface_downwelling_shortwave_flux_in_air", "W/m^2", -10.0, 1500.0),
    "Fsu": ("Up-welling shortwave radiation", "surface_upwelling_shortwave_flux_in_air", "W/m^2", -10.0, 1300.0),
    "H2O": ("H2O mole fraction", "mole_fraction_of_water_vapor_in_air", "mmol/mol", 0.0, 100.0),
    "H2O_IRGA": ("H2O density", "mass_concentration_of_water_vapor_in_air", "mmol/m^3", 0.0, 3000.0),
    "Precip": ("Rainfall", "thickness_of_rainfall_amount", "mm", 0.0, 100.0),
    "RH": ("Relative humidity", "relative_humidity", "percent", 0.0, 100.0),
    "Sig_IRGA": ("IRGA signal strength", None, "percent", 0.0, 100.0),
    "Sws": ("Soil water content", "volume_fraction_of_condensed_water_in_soil", "m^3/m^3", 0.0, 1.0),
    "Ta": ("Air temperature", "air_temperature", "degC", -30.0, 60.0),
    "Td": ("Dew point temperature", "dew_point_temperature", "degC", -40.0, 50.0),
    "Ts": ("Soil temperature", "soil_temperature", "degC", -10.0, 70.0),
    "Tv_SONIC": ("Virtual temperature", "virtual_temperature", "degC", -30.0, 60.0),
    "Tpanel": ("Logger panel temperature", None, "degC", -40.0, 80.0),
    "Vbat": ("Battery voltage", None, "V", 0.0, 30.0),
    "VPD": ("Vapour pressure deficit", "water_vapor_saturation_deficit_in_air", "kPa", 0.0, 10.0),
    "Wd": ("Wind direction", "wind_from_direction", "degrees", 0.0, 360.0),
    "Wd_SONIC": ("Wind direction", "wind_from_direction", "degrees", 0.0, 360.0),
    "Ws": ("Wind speed", "wind_speed", "m/s", 0.0, 30.0),
    "Ws_SONIC": ("Wind speed", "wind_speed", "m/s", 0.0, 30.0),
    "Ux": ("Along-stream wind velocity", None, "m/s", -30.0, 30.0),
    "Uy": ("Cross-stream wind velocity", None, "m/s", -30.0, 30.0),
    "Uz": ("Vertical wind velocity", None, "m/s", -10.0, 10.0),
    "ps": ("Surface air pressure", "surface_air_pressure", "kPa", 85.0, 110.0),
    "ustar": ("Friction velocity", None, "m/s", 0.0, 3.0),
    "Diag_SONIC": ("Sonic diagnostic value", None, "1", 0.0, None),
    "Diag_IRGA": ("IRGA diagnostic value", None, "1", 0.0, None),
}

#: Variance-unit rewrites (reference metadata.py:1299-1324).
VARIANCE_UNITS: dict[str, str] = {
    "g/m^3": "g^2/m^6",
    "umol/mol": "umol/mol",
    "mg/m^3": "mg^2/m^6",
    "degC": "degC^2",
    "m/s": "m^2/s^2",
    "mmol/m^3": "mmol^2/m^6",
    "mmol/mol": "mmol/mol",
}

#: Unit aliases accepted as equal at merge legality checks
#: (reference file_concatenators.py:19-25).
UNIT_ALIASES: tuple[tuple[str, ...], ...] = (
    ("degC", "C"),
    ("n", "samples"),
    ("arb", "1"),
)
