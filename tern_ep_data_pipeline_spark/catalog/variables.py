"""Per-site variable catalog ("variable map") — the engine's analyzer.

Parity target: reference ``code/managers/metadata.py`` MetaDataManager:
- build + requisite-field validation (:120-179),
- per-variable PFP parse/validate (:208-273),
- conformity predicates (:524-558 — P9 units conversion list, variance rows),
- translation lookups (:562-645 — J8).

The catalog is tiny (tens of rows per site); it stays driver-side Python and
feeds the data plane as select/alias lists, mask bounds, and conversion
dispatch — i.e. it configures the Catalyst plan rather than joining into it.
"""

from __future__ import annotations

from dataclasses import asdict
from collections.abc import Mapping

from .pfp_names import ParsedName, parse_variable_name, vertical_location_to_metres

REQUISITE_FIELDS = (
    "height",
    "instrument",
    "statistic_type",
    "units",
    "name",
    "logger",
    "table",
)


def build_site_variables(
    site_map: Mapping[str, Mapping],
    require_fields: bool = True,
) -> dict[str, dict]:
    """Validate + enrich a site variable map {std_name: {field: value}}.

    Each entry is PFP-parsed (grammar conformity), gains parsed name
    components, standard attributes, and height-in-metres. Plan-time errors
    (missing fields, bad grammar) raise immediately — matching the
    reference's fail-at-analysis behaviour.
    """
    out: dict[str, dict] = {}
    for std_name, fields in site_map.items():
        if require_fields:
            missing = [f for f in REQUISITE_FIELDS if f not in fields and f != "file"]
            # reference rule: file XOR logger+table (var_metadata.py:777-788)
            if "file" in fields:
                missing = [m for m in missing if m not in ("logger", "table")]
            if missing:
                raise ValueError(f"{std_name}: missing requisite fields {missing}")
        parsed: ParsedName = parse_variable_name(std_name)
        rec = dict(fields)
        rec.update({k: v for k, v in asdict(parsed).items() if k not in ("name", "errors")})
        rec["height_m"] = vertical_location_to_metres(parsed.vertical_location)
        out[std_name] = rec
    return out


def units_nonconforming(catalog: Mapping[str, Mapping]) -> dict[str, tuple[str, str]]:
    """P9: variables whose site units differ from standard units -> the
    conversion worklist {std_name: (site_units, standard_units)}."""
    return {
        n: (r["units"], r["standard_units"])
        for n, r in catalog.items()
        if r.get("units") and r.get("standard_units") and r["units"] != r["standard_units"]
    }


def plausible_bounds(catalog: Mapping[str, Mapping]) -> dict[str, tuple[float | None, float | None]]:
    """Range-mask bounds per std name (feeds operators.masking)."""
    return {
        n: (r.get("plausible_min"), r.get("plausible_max")) for n, r in catalog.items()
    }


def translation_by_file(catalog: Mapping[str, Mapping]) -> dict[str, dict[str, str]]:
    """J8: {file: {site_name: std_name}} rename maps
    (metadata.py:802-832)."""
    out: dict[str, dict[str, str]] = {}
    for std_name, rec in catalog.items():
        file = rec.get("file") or f"{rec.get('logger', '')}_{rec.get('table', '')}.dat"
        out.setdefault(file, {})[rec["name"]] = std_name
    return out


def pair_soil_variables(
    catalog: Mapping[str, Mapping],
    quantity_a: str = "Sws",
    quantity_b: str = "Ts",
) -> list[tuple[str, str]]:
    """J4 soil pairing: match variables of two quantities installed at the
    same depth (grafana_variable_mapper.py:247-265).

    Returns (name_a, name_b) pairs ordered by depth; unmatched depths are
    dropped, replicates pair by sorted order within a depth.
    """
    def by_depth(quantity: str) -> dict[float, list[str]]:
        out: dict[float, list[str]] = {}
        for name, rec in catalog.items():
            if rec.get("quantity") == quantity and rec.get("height_m") is not None:
                out.setdefault(rec["height_m"], []).append(name)
        return {d: sorted(names) for d, names in out.items()}

    a_map, b_map = by_depth(quantity_a), by_depth(quantity_b)
    pairs: list[tuple[str, str]] = []
    for depth in sorted(set(a_map) & set(b_map)):
        for na, nb in zip(a_map[depth], b_map[depth]):
            pairs.append((na, nb))
    return pairs


def nearest_height_variable(
    catalog: Mapping[str, Mapping],
    quantity: str,
    target_height_m: float,
    prefer_instrument: str | None = None,
) -> str | None:
    """J4: argmin-|height - target| selection with instrument preference
    (nc_toa5_constructor.py:187-294). Catalog-sized -> plain Python."""
    candidates = [
        (n, r)
        for n, r in catalog.items()
        if r.get("quantity", "").split("_")[0] == quantity and r.get("height_m") is not None
    ]
    if not candidates:
        return None

    def key(item):
        n, r = item
        inst_rank = 0 if (prefer_instrument and r.get("instrument") == prefer_instrument) else 1
        return (abs(r["height_m"] - target_height_m), inst_rank, n)

    return min(candidates, key=key)[0]


# --- cross-field site-config validation (var_metadata.py:738-935) -----------

#: flux naming-system suffixes (var_metadata.py:43)
VALID_FLUX_SYSTEMS = {"EF": "EasyFlux", "EP": "EddyPro", "DL": "TERNflux"}
DIAG_PREFIXES = ("Diag_",)
SONIC_SUFFIX = "_SONIC"
IRGA_SUFFIX = "_IRGA"
FLUX_PREFIXES = ("Fco2", "Fe", "Fh", "Fm", "ustar")
VALID_DIAG_TYPES = {"valid_count", "invalid_count"}


def validate_site_config(variables: Mapping[str, Mapping]) -> dict:
    """Cross-field validation of a site variable map, mirroring the
    reference's pydantic model validators (var_metadata.py:738-935):

    - source schema: each variable uses EITHER ``file`` OR
      (``logger`` AND ``table``), never both, never a partial pair
      (:777-788);
    - ``diag_type`` values restricted to valid_count/invalid_count
      (:768-775), required on every ``Diag_*`` variable, and consistent
      across all of them (:825-846);
    - all ``*_SONIC`` variables share one instrument, likewise ``*_IRGA``
      (:852-882);
    - flux variables (Fco2/Fe/Fh/Fm/ustar prefixes) carry a naming-system
      suffix from EP/EF/DL and all share the same one (:888-915).

    Raises ValueError listing every violation (the reference fails on the
    first; collecting them all is strictly more useful at analysis time).
    Returns the derived site-wide attributes the reference's validators
    set: {sonic_instrument, irga_instrument, diag_type, flux_suffix,
    system_type}.
    """
    errors: list[str] = []

    for name, cfg in variables.items():
        has_file = cfg.get("file") is not None
        has_logger = cfg.get("logger") is not None
        has_table = cfg.get("table") is not None
        if has_file and (has_logger or has_table):
            errors.append(f"{name}: use either file OR logger+table, not both")
        elif not has_file and not (has_logger and has_table):
            errors.append(f"{name}: must define either file OR (logger AND table)")

        dt = cfg.get("diag_type")
        if dt is not None and dt not in VALID_DIAG_TYPES:
            errors.append(
                f"{name}: diag_type must be one of {sorted(VALID_DIAG_TYPES)}, got {dt!r}"
            )

    diag_types = set()
    for name, cfg in variables.items():
        if name.startswith(DIAG_PREFIXES):
            if cfg.get("diag_type") is None:
                errors.append(f"diagnostic variable {name!r} must define diag_type")
            elif cfg["diag_type"] in VALID_DIAG_TYPES:
                diag_types.add(cfg["diag_type"])
    if len(diag_types) > 1:
        errors.append(
            f"diagnostic variables have inconsistent diag_type values: {sorted(diag_types)}"
        )

    sonic = {
        cfg.get("instrument") for n, cfg in variables.items() if n.endswith(SONIC_SUFFIX)
    }
    irga = {
        cfg.get("instrument") for n, cfg in variables.items() if n.endswith(IRGA_SUFFIX)
    }
    if len(sonic) > 1:
        errors.append(f"SONIC variables must share one instrument; found {sorted(map(str, sonic))}")
    if len(irga) > 1:
        errors.append(f"IRGA variables must share one instrument; found {sorted(map(str, irga))}")

    flux_suffixes = set()
    for name in variables:
        if name.startswith(FLUX_PREFIXES):
            parts = name.split("_", 1)
            if len(parts) != 2:
                errors.append(f"flux variable {name!r} must end with _EP/_EF/_DL")
                continue
            suffix = parts[1]
            if suffix not in VALID_FLUX_SYSTEMS:
                errors.append(
                    f"flux variable {name!r} has invalid suffix {suffix!r} "
                    "(must be EP, EF or DL)"
                )
                continue
            flux_suffixes.add(suffix)
    if len(flux_suffixes) > 1:
        errors.append(
            f"flux variables must share the same suffix (EP/EF/DL); found {sorted(flux_suffixes)}"
        )

    if errors:
        raise ValueError("site config invalid:\n  " + "\n  ".join(errors))

    flux_suffix = next(iter(flux_suffixes), None)
    return {
        "sonic_instrument": next(iter(sonic), None),
        "irga_instrument": next(iter(irga), None),
        "diag_type": next(iter(diag_types), None),
        "flux_suffix": flux_suffix,
        "system_type": VALID_FLUX_SYSTEMS.get(flux_suffix),
    }
