"""Meteorological derivations as pure Column expressions.

Parity target: reference ``code/data_constructors/convert_calc_filter.py``
:287-384 (calculate_* functions + the ``get_function`` dispatcher used to
auto-derive missing variables, e.g. humidity padding in
nc_constructors.py:244-311). All formulas are closed-form `exp`/`log`
arithmetic -> JVM Column expressions, no UDFs.

Conventions (reference units): Ta degC, RH percent, AH g/m^3, ps kPa,
CO2 density mg/m^3, CO2 mole fraction umol/mol.
"""

from __future__ import annotations

import inspect
from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

MOLAR_MASS_H2O = 18.0  # g/mol
MOLAR_MASS_CO2 = 44.0  # g/mol
R_GAS = 8.3143  # J/mol/K


def calculate_es(Ta: Column) -> Column:
    """Saturation vapour pressure, kPa — Buck (1996) (ref :331-335)."""
    return 0.61121 * F.exp((18.678 - Ta / 234.5) * (Ta / (257.14 + Ta)))


def calculate_e(Ta: Column, RH: Column) -> Column:
    """Vapour pressure, kPa (ref :325-328)."""
    return calculate_es(Ta) * RH / 100.0


def calculate_molar_density(Ta: Column, ps: Column) -> Column:
    """Air molar density, mol/m^3 (ref :338-341)."""
    return ps * 1000.0 / ((Ta + 273.15) * R_GAS)


def calculate_AH_from_RH(Ta: Column, RH: Column, ps: Column) -> Column:
    """Absolute humidity g/m^3 from relative humidity (ref :287-294)."""
    return calculate_e(Ta, RH) / ps * calculate_molar_density(Ta, ps) * MOLAR_MASS_H2O


def calculate_RH_from_AH(Ta: Column, AH: Column, ps: Column) -> Column:
    """Relative humidity percent from absolute humidity (ref :344-349)."""
    e = AH / MOLAR_MASS_H2O / calculate_molar_density(Ta, ps) * ps
    return e / calculate_es(Ta) * 100.0


def calculate_dew_point(Ta: Column, RH: Column) -> Column:
    """Dew point degC (ref :297-302)."""
    ln_term = F.log(calculate_e(Ta, RH) / 0.61121)
    return 243.5 * ln_term / (17.502 - ln_term)


def calculate_CO2_density(Ta: Column, ps: Column, CO2: Column) -> Column:
    """umol/mol -> mg/m^3 via ideal gas (ref :305-313)."""
    return CO2 * calculate_molar_density(Ta, ps) * MOLAR_MASS_CO2 / 1000.0


def calculate_CO2_mole_fraction(Ta: Column, ps: Column, CO2c: Column) -> Column:
    """mg/m^3 -> umol/mol via ideal gas (ref :316-322)."""
    return CO2c / calculate_molar_density(Ta, ps) / MOLAR_MASS_CO2 * 1000.0


def calculate_ustar_from_tau_rho(tau: Column, rho: Column) -> Column:
    """Friction velocity from momentum flux and air density (ref :352-355)."""
    return F.sqrt(F.abs(tau) / rho)


def calculate_VPD(Ta: Column, RH: Column) -> Column:
    """Vapour pressure deficit, kPa (ref :358-361)."""
    return calculate_es(Ta) - calculate_e(Ta, RH)


#: name -> builder; mirrors the reference's reflection-based dispatcher.
CALC_REGISTRY: dict[str, Callable[..., Column]] = {
    "es": calculate_es,
    "e": calculate_e,
    "molar_density": calculate_molar_density,
    "AH": calculate_AH_from_RH,
    "RH": calculate_RH_from_AH,
    "Td": calculate_dew_point,
    "CO2c": calculate_CO2_density,
    "CO2": calculate_CO2_mole_fraction,
    "ustar": calculate_ustar_from_tau_rho,
    "VPD": calculate_VPD,
}


def get_function(name: str) -> tuple[Callable[..., Column], list[str]]:
    """Return (builder, parameter names) — the reference introspects
    signatures so callers can bind available columns by name (ref :364-384)."""
    fn = CALC_REGISTRY[name]
    return fn, list(inspect.signature(fn).parameters)
