"""PFP variable-name grammar parser.

Parity target: reference ``code/managers/metadata.py:946-1284``
(PFPNameParser) and the attribute rewrites at :1327-1364. The grammar over
``_``-separated tokens:

1. quantity (required), optionally fused with an instrument id
   (``AH_IRGA``) when the next token is in VALID_INSTRUMENTS;
2. optional process suffix as the LAST token (Av/Sd/Vr/Sum/Ct/QC);
3. optional system-type token immediately after the quantity (EF/EP/DL);
4. optional location/replicate tokens — vertical (``0.5m``, ``0-30cm``),
   horizontal (single alpha), replicate (digits) — in that order, either as
   separate tokens or glued into one (``Sws_0.1ma2``).

This is a clean regex-chain re-implementation (the reference mutates the
token list through five checker methods); same accept/reject behaviour,
verified by tests against the reference's documented examples.

Driver-side only: names are parsed at catalog build ("analysis") time, never
per data row.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .std_names import STD_NAMES, VARIANCE_UNITS

VALID_INSTRUMENTS = ("SONIC", "IRGA", "RAD")
VALID_FLUX_SYSTEMS = {"EF": "EasyFlux", "EP": "EddyPro", "DL": "TERNflux"}
VALID_SUFFIXES = {
    "Av": "average",
    "Sd": "standard_deviation",
    "Vr": "variance",
    "Sum": "sum",
    "Ct": "sum",
    "QC": "quality_control_flag",
}
TURBULENT_FLUX_QUANTITIES = ("Fco2", "Fe", "Fh")

#: vertical location: number or number-range + cm|m (cm before m!)
_VERT_RE = re.compile(r"^(\d+(?:\.\d+)?(?:-\d+(?:\.\d+)?)?(?:cm|m))")
_HORIZ_RE = re.compile(r"^([A-Za-z])")
_REP_RE = re.compile(r"^(\d+)$")


class PFPNameError(ValueError):
    """Raised when a variable name does not conform to the PFP grammar."""


@dataclass
class ParsedName:
    name: str
    quantity: str
    instrument_type: str | None = None
    system_type: str | None = None
    vertical_location: str | None = None
    horizontal_location: str | None = None
    replicate: str | None = None
    process: str | None = None
    # standard attributes (from STD_NAMES):
    long_name: str | None = None
    standard_name: str | None = None
    standard_units: str | None = None
    plausible_min: float | None = None
    plausible_max: float | None = None
    errors: list[str] = field(default_factory=list)


def _attach_std_attrs(out: ParsedName) -> None:
    attrs = STD_NAMES.get(out.quantity)
    if attrs is None:
        raise PFPNameError(
            f"{out.quantity!r} is not a valid quantity identifier (in {out.name!r})"
        )
    out.long_name, out.standard_name, out.standard_units, out.plausible_min, out.plausible_max = attrs
    if out.process == "Vr":
        # variances get squared units (metadata.py:1058-1061, 1299-1324)
        out.standard_units = VARIANCE_UNITS.get(out.standard_units, f"({out.standard_units})^2")
    elif out.process == "Ct":
        # sample counts: dimensionless, zero-floored (metadata.py:1327-1344)
        out.plausible_min, out.plausible_max = 0.0, None
        out.standard_units = "1"
        out.long_name = "Number of samples of " + (out.long_name or "")
        out.standard_name = None
    elif out.process == "QC":
        # QC flags: dimensionless (metadata.py:1347-1364)
        out.plausible_min, out.plausible_max = 0.0, None
        out.standard_units = "1"
        out.long_name = "QC flag value of " + (out.long_name or "")
        out.standard_name = None


def parse_variable_name(name: str) -> ParsedName:
    """Parse a PFP-conformant variable name into its components.

    Raises PFPNameError when the name doesn't conform (unknown quantity,
    unparseable leftover token, out-of-order components).
    """
    tokens = name.split("_")
    out = ParsedName(name=name, quantity=tokens.pop(0))

    # fused instrument id (metadata.py:1092-1097)
    if tokens and tokens[0] in VALID_INSTRUMENTS:
        out.instrument_type = tokens.pop(0)
        out.quantity = f"{out.quantity}_{out.instrument_type}"

    # trailing process suffix (metadata.py:1110-1133)
    if tokens and tokens[-1] in VALID_SUFFIXES:
        out.process = tokens.pop(-1)

    # system type immediately after the quantity (metadata.py:1137-1160)
    if tokens and tokens[0] in VALID_FLUX_SYSTEMS:
        out.system_type = VALID_FLUX_SYSTEMS[tokens.pop(0)]

    # location / replicate chain: consume prefixes of the remaining tokens
    # in fixed order vertical -> horizontal -> replicate
    def _head() -> str | None:
        return tokens[0] if tokens else None

    tok = _head()
    if tok is not None:
        m = _VERT_RE.match(tok)
        if m:
            out.vertical_location = m.group(1)
            rest = tok[m.end() :]
            if rest:
                tokens[0] = rest
            else:
                tokens.pop(0)
    tok = _head()
    if tok is not None and out.replicate is None:
        m = _HORIZ_RE.match(tok)
        if m and not tok.isdigit():
            out.horizontal_location = m.group(1)
            rest = tok[m.end() :]
            if rest:
                tokens[0] = rest
            else:
                tokens.pop(0)
    tok = _head()
    if tok is not None:
        m = _REP_RE.match(tok)
        if m:
            out.replicate = m.group(1)
            tokens.pop(0)

    if tokens:
        raise PFPNameError(
            f"unrecognised element(s) {tokens!r} remain in variable name {name!r}"
        )

    _attach_std_attrs(out)
    return out


def vertical_location_to_metres(loc: str | None) -> float | None:
    """'1.5m' -> 1.5; '0-30cm' -> 0.15 (range midpoint, metres).

    Parity: grafana_variable_mapper.py:119-145 (height_extractor) and
    convert_calc_filter.py:417-466 (cm<->m soil renames).
    """
    if not loc:
        return None
    scale = 0.01 if loc.endswith("cm") else 1.0
    num = loc[: -2 if loc.endswith("cm") else -1]
    if "-" in num:
        lo, hi = num.split("-")
        return (float(lo) + float(hi)) / 2.0 * scale
    return float(num) * scale
