"""Minimal WKT (ISO 19162) CRS reader — input only.

The reference's io.cpp WKT machinery is ~20k LoC covering WKT1/WKT2/ESRI
dialects with full object round-tripping; that subsystem is a sanctioned
scope cut (SURVEY §1.3). This module parses just enough of the grammar to
INPUT a CRS — WKT2 GEOGCRS/GEODCRS, PROJCRS, BOUNDCRS with
ABRIDGEDTRANSFORMATION, plus the legacy WKT1 GEOGCS/PROJCS/TOWGS84
spellings — and lowers it onto the same proj-string surface the EPSG
resolver targets, so every downstream kernel is shared (reference
src/iso19111/io.cpp WKTParser used as the GRAMMAR SPEC, not the code).

Projection methods are dispatched through sources.epsg._METHODS by EPSG
method code (from METHOD ID[...] when present, else a name table), with
parameters adapted to the same _Params duck-type keyed by EPSG parameter
code.
"""

from __future__ import annotations

import math
import re

from proj_spark.sources import epsg as _epsg

DEG_PER_RAD = 180.0 / math.pi


# ----------------------------------------------------------------- parser

class Node:
    __slots__ = ("name", "args")

    def __init__(self, name: str, args: list):
        self.name = name.upper()
        self.args = args

    def find(self, *names) -> "Node | None":
        up = {n.upper() for n in names}
        for a in self.args:
            if isinstance(a, Node) and a.name in up:
                return a
        return None

    def all(self, *names) -> list["Node"]:
        up = {n.upper() for n in names}
        return [a for a in self.args if isinstance(a, Node) and a.name in up]

    def str0(self) -> str:
        for a in self.args:
            if isinstance(a, str):
                return a
        return ""

    def nums(self) -> list[float]:
        return [a for a in self.args if isinstance(a, float)]


_TOKEN = re.compile(
    r'\s*(?:("(?:[^"]|"")*")|([A-Za-z_][A-Za-z0-9_ ]*?(?=\[|\())|'
    r'([-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?)|([\[\](),])|'
    r'([A-Za-z_][A-Za-z0-9_-]*))'  # bare enum (axis direction, CS type)
)


def parse_wkt(text: str) -> Node:
    pos = 0
    n = len(text)

    def error(msg):
        raise ValueError(f"WKT parse error at {pos}: {msg}")

    def next_tok():
        nonlocal pos
        m = _TOKEN.match(text, pos)
        if not m:
            return None
        pos = m.end()
        if m.group(1) is not None:
            return ("str", m.group(1)[1:-1].replace('""', '"'))
        if m.group(2) is not None:
            return ("kw", m.group(2).strip())
        if m.group(3) is not None:
            return ("num", float(m.group(3)))
        if m.group(4) is not None:
            return ("punct", m.group(4))
        return ("enum", m.group(5))

    def parse_node(kw: str) -> Node:
        nonlocal pos
        t = next_tok()
        if t is None or t[0] != "punct" or t[1] not in "[(":
            error(f"expected [ after {kw}")
        args: list = []
        while True:
            t = next_tok()
            if t is None:
                error("unterminated node")
            if t[0] == "punct":
                if t[1] in "])":
                    return Node(kw, args)
                if t[1] == ",":
                    continue
                error(f"unexpected {t[1]}")
            elif t[0] == "kw":
                args.append(parse_node(t[1]))
            elif t[0] in ("str", "num"):
                args.append(t[1])
            # bare enums (north/east/ellipsoidal/...) are skipped: nothing
            # the proj-string lowering needs lives in them

    t = next_tok()
    if t is None or t[0] != "kw":
        raise ValueError("not WKT: no leading keyword")
    root = parse_node(t[1])
    return root


_WKT_HEADS = ("GEOGCRS", "GEODCRS", "PROJCRS", "BOUNDCRS",
              "GEOGCS", "PROJCS", "GEOCCS")


def is_wkt(s: str) -> bool:
    head = s.lstrip()[:12].upper()
    return any(head.startswith(k) for k in _WKT_HEADS)


# ------------------------------------------------------------------ units

def _unit_factor(node: Node | None, default: float) -> float:
    """ANGLEUNIT/LENGTHUNIT/SCALEUNIT/UNIT[name, factor] -> factor."""
    if node is None:
        return default
    ns = node.nums()
    return ns[0] if ns else default


def _angle_value_deg(value: float, unit: Node | None) -> float:
    """Convert a WKT angular value to degrees, preferring EXACT unit
    identification (the truncated 0.0174532925199433 literal times
    180/pi would perturb every coordinate by ~1e-12 deg otherwise) —
    same normalization io.cpp applies via its unit registry."""
    if unit is None:
        return value
    name = unit.str0().lower()
    f = _unit_factor(unit, math.pi / 180.0)
    if "degree" in name or abs(f - math.pi / 180.0) < 1e-14:
        return value
    if name in ("grad", "gon") or abs(f - math.pi / 200.0) < 1e-14:
        return value * 0.9
    if "arc-second" in name or "arcsecond" in name:
        return value / 3600.0
    if "arc-minute" in name or "arcminute" in name:
        return value / 60.0
    if "radian" in name:
        return value * DEG_PER_RAD
    return value * f * DEG_PER_RAD


_ANGLE_UNITS = ("ANGLEUNIT", "UNIT")
_LENGTH_UNITS = ("LENGTHUNIT", "UNIT")


# ------------------------------------------------------- geographic CRS

def _ellipsoid_spec(ell: Node) -> str:
    """ELLIPSOID/SPHEROID[name, a, rf, LENGTHUNIT] -> +a/+rf (or +R)."""
    ns = ell.nums()
    if len(ns) < 2:
        raise ValueError("ELLIPSOID needs a and 1/f")
    a, rf = ns[0], ns[1]
    a *= _unit_factor(ell.find(*_LENGTH_UNITS), 1.0)
    if rf == 0.0:
        return f"+R={a!r}"
    return f"+a={a!r} +rf={rf!r}"


def _datum_of(crs: Node) -> Node:
    d = crs.find("DATUM", "TRF", "GEODETICDATUM", "ENSEMBLE")
    if d is None:
        raise ValueError(f"{crs.name}: no datum")
    return d


def _geog_spec(crs: Node) -> str:
    """GEOGCRS/GEODCRS/BASEGEOGCRS/GEOGCS -> '+proj=longlat ...' spec
    (+towgs84 appended when a WKT1 TOWGS84 node is present)."""
    datum = _datum_of(crs)
    ell = datum.find("ELLIPSOID", "SPHEROID")
    if ell is None:
        raise ValueError("datum without ELLIPSOID")
    s = f"+proj=longlat {_ellipsoid_spec(ell)}"
    pm = crs.find("PRIMEM") or datum.find("PRIMEM")
    if pm is not None:
        ns = pm.nums()
        if ns:
            pm_deg = _angle_value_deg(ns[0], pm.find(*_ANGLE_UNITS)
                                      or crs.find("UNIT"))
            if pm_deg != 0.0:
                s += f" +pm={pm_deg!r}"
    tw = datum.find("TOWGS84")
    if tw is not None:
        vals = ",".join(repr(v) for v in tw.nums())
        s += f" +towgs84={vals}"
    return s


# -------------------------------------------------------- projected CRS

# METHOD/PROJECTION name -> EPSG method code (WKT2 names + WKT1 legacy
# underscore spellings), for WKTs that omit ID[]
_METHOD_NAMES = {
    "transverse mercator": "9807",
    "transverse mercator (south orientated)": "9808",
    "lambert conic conformal (1sp)": "9801",
    "lambert conic conformal (2sp)": "9802",
    "lambert conic conformal (2sp belgium)": "9803",
    "mercator (variant a)": "9804",
    "mercator (variant b)": "9805",
    "cassini-soldner": "9806",
    "oblique stereographic": "9809",
    "polar stereographic (variant a)": "9810",
    "polar stereographic (variant b)": "9829",
    "new zealand map grid": "9811",
    "hotine oblique mercator (variant a)": "9812",
    "hotine oblique mercator (variant b)": "9815",
    "american polyconic": "9818",
    "krovak": "9819",
    "krovak (north orientated)": "1041",
    "albers equal area": "9822",
    "lambert azimuthal equal area": "9820",
    "popular visualisation pseudo mercator": "1024",
    "equidistant cylindrical": "1028",
    "equidistant cylindrical (spherical)": "1029",
    # WKT1 legacy spellings
    "transverse_mercator": "9807",
    "mercator_1sp": "9804",
    "mercator_2sp": "9805",
    "lambert_conformal_conic_1sp": "9801",
    "lambert_conformal_conic_2sp": "9802",
    "oblique_stereographic": "9809",
    "polar_stereographic": "9810",
    "cassini_soldner": "9806",
    "new_zealand_map_grid": "9811",
    "hotine_oblique_mercator": "9815",
    "polyconic": "9818",
    "albers_conic_equal_area": "9822",
    "lambert_azimuthal_equal_area": "9820",
    "equirectangular": "1028",
}

# PARAMETER name -> EPSG parameter code (WKT2 official + WKT1 legacy)
_PARAM_NAMES = {
    "latitude of natural origin": "8801",
    "longitude of natural origin": "8802",
    "scale factor at natural origin": "8805",
    "false easting": "8806",
    "false northing": "8807",
    "latitude of projection centre": "8811",
    "longitude of projection centre": "8812",
    "azimuth at projection centre": "8813",
    "azimuth of initial line": "8813",
    "angle from rectified to skew grid": "8814",
    "scale factor at projection centre": "8815",
    "scale factor on initial line": "8815",
    "easting at projection centre": "8816",
    "northing at projection centre": "8817",
    "latitude of pseudo standard parallel": "8818",
    "scale factor on pseudo standard parallel": "8819",
    "latitude of false origin": "8821",
    "longitude of false origin": "8822",
    "latitude of 1st standard parallel": "8823",
    "latitude of 2nd standard parallel": "8824",
    "easting at false origin": "8826",
    "northing at false origin": "8827",
    "latitude of standard parallel": "8832",
    "longitude of origin": "8833",
    "co-latitude of cone axis": "1036",
    # WKT1 legacy spellings
    "latitude_of_origin": "8801",
    "central_meridian": "8802",
    "scale_factor": "8805",
    "false_easting": "8806",
    "false_northing": "8807",
    "standard_parallel_1": "8823",
    "standard_parallel_2": "8824",
    "latitude_of_center": "8811",
    "longitude_of_center": "8812",
    "azimuth": "8813",
    "rectified_grid_angle": "8814",
}

# WKT1 parameter-code remaps per method family: in WKT1 the generic
# names are used for 2SP-LCC / AEA false origins and 1SP scale
_WKT1_2SP_REMAP = {"8801": "8821", "8802": "8822", "8806": "8826",
                   "8807": "8827"}


class _WktParams:
    """Duck-type of epsg._Params over WKT PARAMETER nodes.

    ``default_ang``/``default_len``: fallback unit nodes for WKT1, whose
    PARAMETER entries carry no unit — angles inherit the GEOGCS UNIT,
    lengths the PROJCS trailing UNIT (io.cpp WKT1 unit inheritance)."""

    def __init__(self, method_code: str, conv: Node, wkt1: bool,
                 default_ang: Node | None = None,
                 default_len: Node | None = None):
        self.method = method_code
        self.default_ang = default_ang
        self.default_len = default_len
        self.p: dict[str, tuple[float, Node | None]] = {}
        for par in conv.all("PARAMETER"):
            name = par.str0().strip().lower()
            ids = par.find("ID", "AUTHORITY")
            code = None
            if ids is not None and ids.str0().upper() == "EPSG":
                n = ids.nums()
                if n:
                    code = str(int(n[0]))
            if code is None:
                code = _PARAM_NAMES.get(name)
            if code is None:
                continue
            if wkt1 and method_code in ("9802", "9803", "9822"):
                code = _WKT1_2SP_REMAP.get(code, code)
            ns = par.nums()
            if not ns:
                continue
            self.p[code] = (ns[0], par.find("ANGLEUNIT", "LENGTHUNIT",
                                            "SCALEUNIT", "UNIT"))

    def deg(self, code, default=0.0):
        if str(code) not in self.p:
            return default
        v, u = self.p[str(code)]
        return _angle_value_deg(v, u if u is not None else self.default_ang)

    def m(self, code, default=0.0):
        if str(code) not in self.p:
            return default
        v, u = self.p[str(code)]
        if u is None:
            u = self.default_len
        return v * _unit_factor(u, 1.0)

    def k(self, code, default=1.0):
        if str(code) not in self.p:
            return default
        v, u = self.p[str(code)]
        f = _unit_factor(u, 1.0)
        if u is not None and "parts per million" in u.str0().lower():
            f = 1e-6
        return v * f


def _proj_spec(crs: Node) -> str:
    wkt1 = crs.name == "PROJCS"
    base = crs.find("BASEGEOGCRS", "BASEGEODCRS", "GEOGCS")
    if base is None:
        raise ValueError("PROJCRS without base geographic CRS")
    conv = crs if wkt1 else crs.find("CONVERSION", "DERIVINGCONVERSION")
    if conv is None:
        raise ValueError("PROJCRS without CONVERSION")
    meth = conv.find("METHOD", "PROJECTION")
    if meth is None:
        raise ValueError("CONVERSION without METHOD")
    mids = meth.find("ID", "AUTHORITY")
    code = None
    if mids is not None and mids.str0().upper() == "EPSG":
        n = mids.nums()
        if n:
            code = str(int(n[0]))
    if code is None:
        code = _METHOD_NAMES.get(meth.str0().strip().lower())
    if code is None or code not in _epsg._METHODS:
        raise NotImplementedError(
            f"WKT projection method {meth.str0()!r} not supported")
    default_ang = default_len = None
    if wkt1:
        default_ang = base.find("UNIT")        # GEOGCS angular unit
        units = crs.all("UNIT")                # PROJCS trailing length unit
        default_len = units[-1] if units else None
    P = _WktParams(code, conv, wkt1, default_ang, default_len)
    geog = _geog_spec(base)
    # split +towgs84 off the base so it rides on the projected CRS too
    parts = geog.split()
    datum_extra = " ".join(p for p in parts[1:] if p.startswith(("+towgs84",)))
    ell_pm = " ".join(p for p in parts[1:] if not p.startswith("+towgs84"))
    s = f"{_epsg._METHODS[code](P)} {ell_pm}"
    if datum_extra:
        s += f" {datum_extra}"
    # projected axis unit -> +to_meter (first Cartesian AXIS or CS-level)
    unit = None
    cs = crs.find("CS")
    for ax in crs.all("AXIS"):
        unit = ax.find("LENGTHUNIT", "UNIT") or unit
    if unit is None:
        unit = crs.find("LENGTHUNIT")
        if unit is None and wkt1:
            # WKT1: trailing UNIT node at PROJCS level
            units = crs.all("UNIT")
            unit = units[-1] if units else None
    _ = cs
    if unit is not None:
        f = _unit_factor(unit, 1.0)
        if f != 1.0:
            s += f" +to_meter={f!r}"
    return s


# ------------------------------------------------------------ bound CRS

# ABRIDGEDTRANSFORMATION parameter codes (translations m, rotations
# arc-sec, scale difference ppm — already in +towgs84's units)
_TOWGS84_CODES = ("8605", "8606", "8607", "8608", "8609", "8610", "8611")


def _bound_spec(crs: Node) -> str:
    src = crs.find("SOURCECRS")
    if src is None:
        raise ValueError("BOUNDCRS without SOURCECRS")
    inner = next((a for a in src.args if isinstance(a, Node)), None)
    if inner is None:
        raise ValueError("empty SOURCECRS")
    spec = wkt_node_to_proj(inner)
    tr = crs.find("ABRIDGEDTRANSFORMATION")
    if tr is not None:
        meth = tr.find("METHOD")
        name = meth.str0().lower() if meth is not None else ""
        vals = {c: 0.0 for c in _TOWGS84_CODES}
        seen_rot = False
        for par in tr.all("PARAMETER"):
            ids = par.find("ID", "AUTHORITY")
            code = None
            if ids is not None and ids.str0().upper() == "EPSG":
                n = ids.nums()
                if n:
                    code = str(int(n[0]))
            ns = par.nums()
            if code in vals and ns:
                v = ns[0]
                if code == "8611":
                    # abridged form carries scale as (1 + ds*1e-6); real ds
                    # is a few ppm, so the encoded value sits within ~1e-5
                    # of 1. A tight window keeps a nonconformant plain-ppm
                    # value under 0.5 (e.g. 0.3) from being misread as
                    # (0.3-1)*1e6 = -700000 ppm.
                    v = (v - 1.0) * 1e6 if abs(v - 1.0) < 1e-2 else v
                vals[code] = v
                if code in ("8608", "8609", "8610") and v != 0.0:
                    seen_rot = True
        rot_sign = -1.0 if "coordinate frame" in name else 1.0
        seven = seen_rot or vals["8611"] != 0.0
        nums = [vals["8605"], vals["8606"], vals["8607"]]
        if seven:
            nums += [rot_sign * vals["8608"], rot_sign * vals["8609"],
                     rot_sign * vals["8610"], vals["8611"]]
        spec += " +towgs84=" + ",".join(repr(v) for v in nums)
    return spec


# -------------------------------------------------------------- entry

def wkt_node_to_proj(root: Node) -> str:
    if root.name in ("GEOGCRS", "GEODCRS", "GEOGCS", "BASEGEOGCRS",
                     "BASEGEODCRS"):
        return _geog_spec(root)
    if root.name in ("PROJCRS", "PROJCS"):
        return _proj_spec(root)
    if root.name == "BOUNDCRS":
        return _bound_spec(root)
    if root.name == "GEOCCS":
        datum = _datum_of(root)
        ell = datum.find("ELLIPSOID", "SPHEROID")
        return f"+proj=geocent {_ellipsoid_spec(ell)}"
    raise NotImplementedError(f"WKT object {root.name} not supported as CRS")


def wkt_to_proj(wkt: str) -> str:
    """WKT1/WKT2 CRS text -> proj-string on this engine's surface."""
    return wkt_node_to_proj(parse_wkt(wkt))
