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
