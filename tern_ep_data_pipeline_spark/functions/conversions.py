"""Unit-conversion library as pure Column builders.

Parity target: reference ``code/data_constructors/convert_calc_filter.py``
(convert_* functions at :157-274 and the ``convert_variable`` dispatcher at
:241-263). Every conversion is plain arithmetic, so each maps to a JVM-side
Column expression — whole-stage-codegen friendly, no UDFs anywhere.

Each builder takes a Column (plus optional keyword context such as
``n_samples``) and returns a Column. The registry keys follow the reference's
quantity names so catalog-driven dispatch works the same way.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnBuilder = Callable[..., Column]


def convert_co2_flux(col: Column) -> Column:
    """mg/m^2/s -> umol/m^2/s (ref convert_calc_filter.py:157-161)."""
    return col * 1000.0 / 44.0


def convert_co2_density(col: Column) -> Column:
    """mmol/m^3 -> mg/m^3 (ref :164-168)."""
    return col * 44.0


def convert_signal_strength(col: Column) -> Column:
    """fraction -> percent (ref :171-175)."""
    return col * 100.0


def convert_diagnostic(col: Column, n_samples: Column | int) -> Column:
    """valid-sample count -> invalid-sample count (ref :178-182).

    ``n_samples = freq_hz * time_step * 60`` comes from the site catalog
    (ref nc_constructors.py:193-219).
    """
    n = F.lit(n_samples) if isinstance(n_samples, int) else n_samples
    return n - col


def convert_h2o_density(col: Column, from_units: str = "mmol/m^3") -> Column:
    """mmol/m^3 or kg/m^3 -> g/m^3 (ref :185-191)."""
    if from_units == "mmol/m^3":
        return col * 18.0 / 1000.0
    if from_units == "kg/m^3":
        return col * 1000.0
    raise ValueError(f"unsupported H2O density units: {from_units}")


def convert_precipitation(col: Column, mm_per_pulse: float = 0.2) -> Column:
    """tip-bucket pulses -> mm (ref :194-200)."""
    return col * mm_per_pulse


def convert_pressure(col: Column, from_units: str = "Pa") -> Column:
    """Pa or hPa -> kPa (ref :203-209)."""
    if from_units == "Pa":
        return col / 1000.0
    if from_units == "hPa":
        return col / 10.0
    raise ValueError(f"unsupported pressure units: {from_units}")


def convert_rh(col: Column) -> Column:
    """fraction -> percent (ref :212-216)."""
    return col * 100.0


def convert_sws(col: Column) -> Column:
    """percent -> fraction (ref :219-223)."""
    return col / 100.0


def convert_temperature(col: Column) -> Column:
    """K -> degC (ref :226-230)."""
    return col - 273.15


def convert_variance_to_stdev(col: Column) -> Column:
    """variance -> standard deviation (ref :233-238)."""
    return F.sqrt(col)


def convert_stdev_to_variance(col: Column) -> Column:
    """standard deviation -> variance (ref :233-238)."""
    return col * col


def convert_variance(col: Column, base_conversion: ColumnBuilder) -> Column:
    """Unit-aware variance conversion: sqrt -> convert in base units ->
    square (ref :266-274)."""
    converted = base_conversion(F.sqrt(col))
    return converted * converted


#: quantity -> builder, mirroring the reference dispatcher (ref :241-263).
CONVERSION_REGISTRY: dict[str, ColumnBuilder] = {
    "Fco2": convert_co2_flux,
    "CO2c": convert_co2_density,
    "Sig_IRGA": convert_signal_strength,
    "Diag": convert_diagnostic,
    "AH": convert_h2o_density,
    "Precip": convert_precipitation,
    "ps": convert_pressure,
    "RH": convert_rh,
    "Sws": convert_sws,
    "Ta": convert_temperature,
    "Ts": convert_temperature,
    "Vr": convert_variance_to_stdev,
}


def convert_variable(quantity: str, col: Column, **kwargs) -> Column:
    """Dispatch a conversion by quantity name (ref :241-263)."""
    try:
        builder = CONVERSION_REGISTRY[quantity]
    except KeyError:
        raise KeyError(f"no conversion registered for quantity {quantity!r}") from None
    return builder(col, **kwargs)
