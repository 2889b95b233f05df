"""proj-string parser + pipeline compiler.

PROJ compiles a proj-string into a configured ``PJ`` whose fwd/inv function
pointers run one point at a time (reference: /root/reference/src/init.cpp:422-533
constructor lookup; src/pipeline.cpp:135-262 step loop with per-step ``inv``,
``omit_fwd``/``omit_inv`` flags and error short-circuiting).

Here the same spec compiles into a ``Pipeline`` — an ordered list of steps,
each a thin wrapper over a vectorized numpy kernel with driver-side frozen
constants. ``Pipeline.fwd/inv`` run ALL steps over whole numpy columns inside
one function call, which is exactly what gets closure-captured into a single
Arrow-batched pandas UDF: the whole CRS pipeline is fused per batch, with no
shuffle and no per-row Python between steps.

Unit bookkeeping mirrors PROJ's ``left``/``right`` IO tags
(src/proj_internal.h:583-586): each step declares what space it consumes and
produces ("rad" | "m" | "cart"); the pipeline exposes the outermost tags so
callers (the gie runner, the Spark UDF factory) know whether to feed
degrees->radians and how to read the output. Error-in-band: failed points
carry NaN through the remaining steps, like PROJ's HUGE_VAL convention.
"""

from __future__ import annotations

import math
import os
import re
from dataclasses import dataclass

import numpy as np

from proj_spark.crs import ELLIPSOIDS, Ellipsoid, resolve_ellipsoid
from proj_spark.kernels import cart as k_cart
from proj_spark.kernels import helmert as k_helmert
from proj_spark.kernels import lcc as k_lcc
from proj_spark.kernels import merc as k_merc
from proj_spark.kernels import tmerc as k_tmerc
from proj_spark.kernels.common import adjlon

DEG2RAD = math.pi / 180.0
RAD2DEG = 180.0 / math.pi


# --------------------------------------------------------------------------
# param parsing
# --------------------------------------------------------------------------

_DMS_RE = re.compile(
    r"^([+-]?)(\d+(?:\.\d*)?)[dD]"
    r"(?:(\d+(?:\.\d*)?)'?)?(?:(\d+(?:\.\d*)?)\"?)?([NSEWnsew])?$")
_SUFFIX_RE = re.compile(r"^([+-]?\d+(?:\.\d*)?)([NSEWnsew])$")
_RAD_RE = re.compile(r"^([+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?)[rR]$")
_FRAC_RE = re.compile(
    r"^([+-]?\d+\.?\d*(?:[eE][+-]?\d+)?)/([+-]?\d+\.?\d*(?:[eE][+-]?\d+)?)$")


def _normalize_value(v: str) -> str:
    """Translate PROJ's extended numeric grammars to plain decimals:
    DMS angles (44d11'22.5\"N, 2D32), NSEW-suffixed decimals, radian
    values (1.7r), and ratio numbers (2.0/0.2) — reference
    src/dmstor.cpp + src/pj_param.cpp 'd'/'r' handling. Values not
    matching any grammar pass through untouched."""
    m = _DMS_RE.match(v)
    if m:
        sign, deg, mins, secs, hemi = m.groups()
        val = float(deg) + (float(mins) if mins else 0.0) / 60.0 \
            + (float(secs) if secs else 0.0) / 3600.0
        if sign == "-":
            val = -val
        if hemi and hemi in "SWsw":
            val = -val
        return repr(val)
    m = _SUFFIX_RE.match(v)
    if m:
        val = float(m.group(1))
        if m.group(2) in "SWsw":
            val = -val
        return repr(val)
    m = _RAD_RE.match(v)
    if m:
        return repr(math.degrees(float(m.group(1))))
    m = _FRAC_RE.match(v)
    if m:
        den = float(m.group(2))
        if den == 0.0:
            raise ValueError(f"invalid ratio number {v!r}")
        return repr(float(m.group(1)) / den)
    return v


def parse_params(tokens: list[str]) -> dict:
    """key=value tokens plus bare flags (flag -> True)."""
    out: dict = {}
    for tok in tokens:
        tok = tok.lstrip("+")
        if not tok:
            continue
        if "=" in tok:
            k, v = tok.split("=", 1)
            if k not in out:  # first occurrence wins (pj_param semantics)
                out[k] = _normalize_value(v)
        else:
            out.setdefault(tok, True)
    return out


def tokenize(spec: str) -> list[str]:
    spec = spec.replace(";", " ")
    # gie files write "proj = helmert" / "x =  0.06155" with spaces around '='
    spec = re.sub(r"\s*=\s*", "=", spec)
    raw = [t for t in re.split(r"\s+", spec.strip()) if t]
    # "towgs84 = a, b, c" style: a token ending in ',' continues the value
    # list in the next token (proj-string argv merging)
    out: list[str] = []
    for t in raw:
        if out and out[-1].endswith(","):
            out[-1] = out[-1] + t
        else:
            out.append(t)
    return out


# --------------------------------------------------------------------------
# steps
# --------------------------------------------------------------------------

class Step:
    """One pipeline stage. fwd/inv take and return (x, y, z, t) arrays."""

    left = "rad"
    right = "m"

    def fwd(self, x, y, z, t):  # pragma: no cover - abstract
        raise NotImplementedError

    def inv(self, x, y, z, t):  # pragma: no cover - abstract
        raise NotImplementedError


class Inverted(Step):
    """A step used in the opposite direction (proj-string ``inv`` flag)."""

    def __init__(self, base: Step):
        self.base = base
        self.left = base.right
        self.right = base.left

    def fwd(self, x, y, z, t):
        return self.base.inv(x, y, z, t)

    def inv(self, x, y, z, t):
        return self.base.fwd(x, y, z, t)


# legacy datum registry (reference src/datums.cpp pj_datums)
_DATUM_DEFS = {
    "WGS84": ("WGS84", {"towgs84": "0,0,0"}),
    "GGRS87": ("GRS80", {"towgs84": "-199.87,74.79,246.62"}),
    "NAD83": ("GRS80", {"towgs84": "0,0,0"}),
    "NAD27": ("clrk66",
              {"nadgrids": "@conus,@alaska,@ntv2_0.gsb,@ntv1_can.dat"}),
    "potsdam": ("bessel", {"nadgrids": "@BETA2007.gsb"}),
    "carthage": ("clrk80ign", {"towgs84": "-263.0,6.0,431.0"}),
    "hermannskogel": (
        "bessel",
        {"towgs84": "577.326,90.129,463.919,5.137,1.474,5.297,2.4232"}),
    "ire65": ("mod_airy",
              {"towgs84": "482.530,-130.596,564.557,-1.042,-0.214,-0.631,8.15"}),
    "nzgd49": ("intl", {"towgs84": "59.47,-5.04,187.44,0.47,-0.1,1.024,-4.5993"}),
    "OSGB36": ("airy",
               {"towgs84": "446.448,-125.157,542.060,0.1502,0.2470,0.8421,-20.4894"}),
}


class DatumShiftWrap(Step):
    """cs2cs-style datum emulation around a single operation
    (+towgs84 / +nadgrids / +datum; reference src/fwd.cpp fwd_prepare
    :87-105 and the mirrored inv path): angular-input forward first moves
    the WGS84 coordinate into the op's datum (hgridshift INV, or
    cart_wgs84 FWD -> helmert INV -> cart_local INV), the inverse moves
    the result back to WGS84 after the core inverse."""

    def __init__(self, base: Step, params: dict, ell: "Ellipsoid"):
        self.base = base
        self.left = base.left
        self.right = base.right
        self.hgrid = None
        self.helmert = None
        self.carts = None
        self.vgrid = None
        if "nadgrids" in params:
            self.hgrid = HgridshiftStep({"grids": str(params["nadgrids"])})
        elif "towgs84" in params:
            vals = [float(v) for v in str(params["towgs84"]).split(",")]
            vals += [0.0] * (7 - len(vals))
            if any(vals):
                keys = ("x", "y", "z", "rx", "ry", "rz", "s")
                hp = dict(zip(keys, (str(v) for v in vals)))
                hp["convention"] = "position_vector"
                self.helmert = HelmertStep(k_helmert.from_params(hp))
            # towgs84=0,0,0 still implies the WGS84<->local ellipsoid
            # change through cartesian space (the gie corpus relies on the
            # height change; fwd.cpp applies cart_wgs84/cart regardless)
            if self.helmert is not None or ell.name != "WGS84":
                self.carts = (CartStep(ELLIPSOIDS["WGS84"]), CartStep(ell))
        if "geoidgrids" in params:
            # vertical datum hook (fwd_prepare :101-103): fwd goes
            # orthometric from geometric AFTER the horizontal shift
            self.vgrid = VgridshiftStep(
                {"grids": str(params["geoidgrids"])})

    @property
    def active(self) -> bool:
        return (self.hgrid is not None or self.helmert is not None
                or self.carts is not None or self.vgrid is not None)

    def _to_local(self, x, y, z, t):
        """WGS84 geodetic -> op datum geodetic (+ geoid height)."""
        if self.hgrid is not None:
            x, y, z, t = self.hgrid.inv(x, y, z, t)
        elif self.carts is not None:
            cw, cl = self.carts
            zz = z if z is not None else np.zeros_like(
                np.asarray(x, dtype=np.float64))
            X, Y, Z, t = cw.fwd(x, y, zz, t)
            if self.helmert is not None:
                X, Y, Z, t = self.helmert.inv(X, Y, Z, t)
            lam, phi, h, t = cl.inv(X, Y, Z, t)
            x, y, z = lam, phi, (h if z is not None else z)
        if self.vgrid is not None:
            x, y, z, t = self.vgrid.fwd(x, y, z, t)
        return x, y, z, t

    def _to_wgs84(self, x, y, z, t):
        if self.vgrid is not None:
            x, y, z, t = self.vgrid.inv(x, y, z, t)
        if self.hgrid is not None:
            x, y, z, t = self.hgrid.fwd(x, y, z, t)
        elif self.carts is not None:
            cw, cl = self.carts
            zz = z if z is not None else np.zeros_like(
                np.asarray(x, dtype=np.float64))
            X, Y, Z, t = cl.fwd(x, y, zz, t)
            if self.helmert is not None:
                X, Y, Z, t = self.helmert.fwd(X, Y, Z, t)
            lam, phi, h, t = cw.inv(X, Y, Z, t)
            x, y, z = lam, phi, (h if z is not None else z)
        return x, y, z, t

    def fwd(self, x, y, z, t):
        x, y, z, t = self._to_local(x, y, z, t)
        return self.base.fwd(x, y, z, t)

    def inv(self, x, y, z, t):
        x, y, z, t = self.base.inv(x, y, z, t)
        return self._to_wgs84(x, y, z, t)


class OmitStep(Step):
    """Pipeline step skipped in one direction (+omit_fwd / +omit_inv,
    reference src/pipeline.cpp pipeline_forward_4d's omitted-step skip)."""

    def __init__(self, base: Step, omit_fwd: bool, omit_inv: bool):
        self.base = base
        self.omit_fwd = omit_fwd
        self.omit_inv = omit_inv
        self.left = base.left
        self.right = base.right

    def fwd(self, x, y, z, t):
        if self.omit_fwd:
            return x, y, z, t
        return self.base.fwd(x, y, z, t)

    def inv(self, x, y, z, t):
        if self.omit_inv:
            return x, y, z, t
        return self.base.inv(x, y, z, t)


class ProjectionStep(Step):
    """Generic horizontal projection wrapper.

    Applies PROJ's fwd_prepare/fwd_finalize normalization around a
    dimensionless kernel (reference src/fwd.cpp:88-175): subtract lam0 with
    longitude wrap, run the kernel, scale by a and add false easting/northing.
    """

    left = "rad"
    right = "m"

    def __init__(self, kfwd, kinv, ell: Ellipsoid, lam0=0.0, x0=0.0, y0=0.0,
                 over: bool = False):
        self.kfwd = kfwd
        self.kinv = kinv
        self.a = ell.a
        self.ra = ell.ra
        self.lam0 = lam0
        self.x0 = x0
        self.y0 = y0
        self.over = over  # +over: skip the fwd_prepare longitude wrap
        self.pm = 0.0     # +pm= prime meridian (from_greenwich, radians)

    def fwd(self, x, y, z, t):
        xin = np.asarray(x, dtype=np.float64)
        yin = np.asarray(y, dtype=np.float64)
        # angular-input validity (reference src/fwd.cpp:54-72 fwd_prepare):
        # |lat| beyond halfpi + PJ_EPS_LAT or |lon| > 10 rad is an invalid
        # coordinate; small overshoot is clamped to the pole
        halfpi = 0.5 * np.pi
        over_lat = np.abs(yin) - halfpi > 1e-12
        over_lon = np.abs(xin) > 10.0
        yin = np.clip(yin, -halfpi, halfpi)
        shift = self.lam0 + self.pm
        lam = xin - shift if self.over else adjlon(xin - shift)
        with np.errstate(invalid="ignore"):
            X, Y = self.kfwd(lam, yin)
            # in-band NaN propagation (PROJ's HUGE_VAL convention,
            # reference src/fwd.cpp:42-44): NaN in => NaN out, even where a
            # kernel's masking would otherwise produce a finite sentinel
            bad = np.isnan(xin) | np.isnan(yin) | over_lat | over_lon
            X = np.where(bad, np.nan, X)
            Y = np.where(bad, np.nan, Y)
        return self.a * X + self.x0, self.a * Y + self.y0, z, t

    def inv(self, x, y, z, t):
        xin = np.asarray(x, dtype=np.float64)
        yin = np.asarray(y, dtype=np.float64)
        X = (xin - self.x0) * self.ra
        Y = (yin - self.y0) * self.ra
        with np.errstate(invalid="ignore"):
            lam, phi = self.kinv(X, Y)
            bad = np.isnan(xin) | np.isnan(yin)
            lam = np.where(bad, np.nan, lam)
            phi = np.where(bad, np.nan, phi)
        shift = self.lam0 + self.pm
        lam = lam + shift if self.over else adjlon(lam + shift)
        return lam, phi, z, t


class UTMAutoStep(Step):
    """UTM with per-point zone selection — the Spark-native twist.

    The Poder/Engsager series constants depend only on (ellipsoid, k0), NOT
    on the central meridian, so a single kernel handles every zone: lam0 is
    a per-point array derived from the zone formula (reference
    tmerc.cpp:763-767) and the south false northing is a per-point where().
    This keeps mixed-zone batches fully vectorized with no per-zone loop,
    no repartition, no shuffle.
    """

    left = "rad"
    right = "m"

    def __init__(self, ell: Ellipsoid):
        self.C = k_tmerc.setup_exact(ell, k0=0.9996, phi0=0.0)
        self.a = ell.a
        self.ra = ell.ra

    def fwd(self, x, y, z, t):
        lon = np.asarray(x, dtype=np.float64)
        zone = np.clip(np.floor((adjlon(lon) + np.pi) * 30.0 / np.pi), 0, 59)
        lam0 = (zone + 0.5) * np.pi / 30.0 - np.pi
        X, Y = k_tmerc.exact_fwd(adjlon(lon - lam0), y, self.C)
        y0 = np.where(np.asarray(y) < 0, 10000000.0, 0.0)
        return self.a * X + 500000.0, self.a * Y + y0, z, t

    def inv(self, x, y, z, t):
        raise NotImplementedError(
            "utm_auto inverse needs an explicit zone column; use +proj=utm +zone=N"
        )


class CartStep(Step):
    left = "rad"
    right = "cart"

    def __init__(self, ell: Ellipsoid):
        self.ell = ell

    def fwd(self, x, y, z, t):
        zz = z if z is not None else np.zeros_like(np.asarray(x, dtype=np.float64))
        X, Y, Z = k_cart.cart_fwd(x, y, zz, self.ell)
        return X, Y, Z, t

    def inv(self, x, y, z, t):
        zz = z if z is not None else np.zeros_like(np.asarray(x, dtype=np.float64))
        lam, phi, h = k_cart.cart_inv(x, y, zz, self.ell)
        return lam, phi, h, t


class HelmertStep(Step):
    left = "cart"
    right = "cart"

    def __init__(self, C: k_helmert.HelmertConsts):
        self.C = C

    def fwd(self, x, y, z, t):
        zz = z if z is not None else np.zeros_like(np.asarray(x, dtype=np.float64))
        X, Y, Z = k_helmert.helmert_fwd(x, y, zz, self.C, t=t)
        return X, Y, Z, t

    def inv(self, x, y, z, t):
        zz = z if z is not None else np.zeros_like(np.asarray(x, dtype=np.float64))
        X, Y, Z = k_helmert.helmert_inv(x, y, zz, self.C, t=t)
        return X, Y, Z, t


class AxisswapStep(Step):
    """Reorder/negate axes (reference src/conversions/axisswap.cpp)."""

    left = "whatever"
    right = "whatever"

    def __init__(self, order: str):
        spec = [int(v) for v in order.split(",")]
        if sorted(abs(v) for v in spec) != list(range(1, len(spec) + 1)):
            raise ValueError(f"invalid axisswap order {order!r}")
        self.spec = spec

    def _apply(self, perm, x, y, z, t):
        cols = [x, y, z, t]
        out = list(cols)
        for dst, src in enumerate(perm):
            v = cols[abs(src) - 1]
            out[dst] = -v if (src < 0 and v is not None) else v
        return tuple(out)

    def fwd(self, x, y, z, t):
        return self._apply(self.spec, x, y, z, t)

    def inv(self, x, y, z, t):
        inverse = [0] * len(self.spec)
        for dst, src in enumerate(self.spec):
            inverse[abs(src) - 1] = (dst + 1) * (1 if src > 0 else -1)
        return self._apply(inverse, x, y, z, t)


_AXIS_CHARS = {"e": "1", "w": "-1", "n": "2", "s": "-2", "u": "3", "d": "-3"}


def _axisswap_order(params: dict) -> str:
    """+order, or the classic +axis=enu-style spec translated to an order
    string (reference axisswap.cpp:216-252: same gather permutation)."""
    if "order" in params and "axis" in params:
        raise ValueError("axisswap: order and axis are mutually exclusive")
    if "order" in params:
        return str(params["order"])
    if "axis" in params:
        ax = str(params["axis"])
        if len(ax) != 3 or any(c not in _AXIS_CHARS for c in ax):
            raise ValueError(f"axisswap: invalid axis spec {ax!r}")
        return ",".join(_AXIS_CHARS[c] for c in ax)
    raise ValueError("axisswap: must provide either order or axis")


_LINEAR_UNITS = {
    "m": 1.0, "km": 1000.0, "dm": 0.1, "cm": 0.01, "mm": 0.001,
    "ft": 0.3048, "us-ft": 1200.0 / 3937.0, "yd": 0.9144,
    "in": 0.0254, "mi": 1609.344, "nmi": 1852.0,
}
_ANGULAR_UNITS = {"rad": 1.0, "deg": DEG2RAD, "grad": math.pi / 200.0}


class UnitconvertStep(Step):
    """Linear + angular unit conversion (reference src/conversions/unitconvert.cpp).

    Time-unit conversions (mjd, decimalyear, gps_week) act on t only.
    """

    left = "whatever"
    right = "whatever"

    def __init__(self, params: dict):
        def factor(name):
            if name in _LINEAR_UNITS:
                return _LINEAR_UNITS[name], "linear"
            if name in _ANGULAR_UNITS:
                return _ANGULAR_UNITS[name], "angular"
            try:  # bare numeric factor (reference unitconvert.cpp accepts one)
                f = float(name)
            except (TypeError, ValueError):
                raise ValueError(f"unknown unit {name!r}") from None
            if not (f > 0) or not math.isfinite(f):
                raise ValueError(f"invalid unit factor {name!r}")
            return f, "linear"

        self.xy = None
        self.z = None
        if "xy_in" in params or "xy_out" in params:
            xi = params.get("xy_in", "m")
            xo = params.get("xy_out", "m")
            fi, kin = factor(xi)
            fo, kout = factor(xo)
            if kin != kout:
                raise ValueError("unitconvert: mixed linear/angular xy units")
            self.xy = fi / fo
            # IO-unit tags like the reference (unitconvert.cpp:488-517):
            # angular input/output is RADIANS or DEGREES so the caller knows
            # whether gie-style deg<->rad normalization applies.
            if kin == "angular":
                self.left = "rad" if xi == "rad" else "deg"
                self.right = "rad" if xo == "rad" else "deg"
        if "z_in" in params or "z_out" in params:
            fi, kin = factor(params.get("z_in", "m"))
            fo, kout = factor(params.get("z_out", "m"))
            if kin != kout:
                # reference unitconvert.cpp setup: vertical conversion
                # between unit classes is an instantiation error (gie
                # unitconvert.gie expects failure for z_in=rad z_out=m)
                raise ValueError("unitconvert: mixed linear/angular z units")
            self.z = fi / fo
        self.t_in = params.get("t_in")
        self.t_out = params.get("t_out")
        for name in (self.t_in, self.t_out):
            if name is not None and name not in _TIME_TO_MJD:
                raise NotImplementedError(f"time unit {name!r} not supported")

    def _time(self, t, src, dst):
        if t is None or src is None or dst is None or src == dst:
            return t
        return _MJD_TO_TIME[dst](_TIME_TO_MJD[src](np.asarray(t, dtype=np.float64)))

    def fwd(self, x, y, z, t):
        if self.xy is not None:
            x = np.asarray(x, dtype=np.float64) * self.xy
            y = np.asarray(y, dtype=np.float64) * self.xy
        if self.z is not None and z is not None:
            z = np.asarray(z, dtype=np.float64) * self.z
        return x, y, z, self._time(t, self.t_in, self.t_out)

    def inv(self, x, y, z, t):
        if self.xy is not None:
            x = np.asarray(x, dtype=np.float64) / self.xy
            y = np.asarray(y, dtype=np.float64) / self.xy
        if self.z is not None and z is not None:
            z = np.asarray(z, dtype=np.float64) / self.z
        return x, y, z, self._time(t, self.t_out, self.t_in)


# time-unit conversions through the MJD pivot (reference
# src/conversions/unitconvert.cpp:90-270 — epoch 1858-11-17, gps epoch
# mjd 44244). Vectorized with numpy datetime64 day arithmetic.
_MJD_EPOCH = np.datetime64("1858-11-17", "D")


def _year_start_mjd(year: np.ndarray) -> np.ndarray:
    y = (year - 1970).astype("datetime64[Y]").astype("datetime64[D]")
    return (y - _MJD_EPOCH).astype(np.float64)


def _days_in_year(year: np.ndarray) -> np.ndarray:
    return _year_start_mjd(year + 1) - _year_start_mjd(year)


def _decimalyear_to_mjd(dy: np.ndarray) -> np.ndarray:
    year = np.floor(dy).astype(np.int64)
    frac = dy - year
    return _year_start_mjd(year) + frac * _days_in_year(year)


def _mjd_to_decimalyear(mjd: np.ndarray) -> np.ndarray:
    # year containing the mjd: datetime64 day -> year
    d = (_MJD_EPOCH + mjd.astype("timedelta64[D]")).astype("datetime64[Y]")
    year = d.astype(np.int64) + 1970
    return year + (mjd - _year_start_mjd(year)) / _days_in_year(year)


def _yyyymmdd_to_mjd(v: np.ndarray) -> np.ndarray:
    year = np.floor(v / 10000).astype(np.int64)
    month = np.floor((v - year * 10000) / 100).astype(np.int64)
    day = np.floor(v - year * 10000 - month * 100).astype(np.int64)
    d = ((year - 1970).astype("datetime64[Y]").astype("datetime64[M]")
         + (month - 1).astype("timedelta64[M]")).astype("datetime64[D]") \
        + (day - 1).astype("timedelta64[D]")
    return (d - _MJD_EPOCH).astype(np.float64)


def _mjd_to_yyyymmdd(mjd: np.ndarray) -> np.ndarray:
    d = _MJD_EPOCH + np.floor(mjd).astype("timedelta64[D]")
    ym = d.astype("datetime64[M]")
    year = d.astype("datetime64[Y]").astype(np.int64) + 1970
    month = ym.astype(np.int64) % 12 + 1
    day = (d - ym).astype(np.int64) + 1
    return (year * 10000 + month * 100 + day).astype(np.float64)


_TIME_TO_MJD = {
    "mjd": lambda t: t,
    "decimalyear": _decimalyear_to_mjd,
    "gps_week": lambda t: 44244.0 + t * 7.0,
    "yyyymmdd": _yyyymmdd_to_mjd,
}
_MJD_TO_TIME = {
    "mjd": lambda t: t,
    "decimalyear": _mjd_to_decimalyear,
    "gps_week": lambda t: (t - 44244.0) / 7.0,
    "yyyymmdd": _mjd_to_yyyymmdd,
}


class NoopStep(Step):
    left = "whatever"
    right = "whatever"

    def fwd(self, x, y, z, t):
        return x, y, z, t

    inv = fwd


class SetStep(Step):
    """Force components to constants (reference src/conversions/set.cpp);
    applied in BOTH directions like the reference."""

    left = "whatever"
    right = "whatever"

    def __init__(self, params: dict):
        self.vals = {
            i: float(params[f"v_{i}"]) for i in (1, 2, 3, 4) if f"v_{i}" in params
        }

    def _apply(self, x, y, z, t):
        comps = [x, y, z, t]
        for i, v in self.vals.items():
            ref = comps[0] if comps[0] is not None else np.array([0.0])
            comps[i - 1] = np.full_like(np.asarray(ref, dtype=np.float64), v)
        return tuple(comps)

    fwd = _apply
    inv = _apply


class AffineStep(Step):
    """4D affine transform (reference src/transformations/affine.cpp):
    out = offset + S @ in; reverse uses the inverted 3x3 + tscale."""

    left = "whatever"
    right = "whatever"

    def __init__(self, params: dict):
        g = lambda k, d: float(params.get(k, d))
        self.off = np.array([g("xoff", 0), g("yoff", 0), g("zoff", 0)])
        self.toff = g("toff", 0)
        self.S = np.array([
            [g("s11", 1), g("s12", 0), g("s13", 0)],
            [g("s21", 0), g("s22", 1), g("s23", 0)],
            [g("s31", 0), g("s32", 0), g("s33", 1)],
        ])
        self.tscale = g("tscale", 1)
        # defer inversion: a singular matrix is fine if only the forward
        # direction is ever used (e.g. +omit_inv pipelines; reference
        # affine.cpp inverts lazily in reverse_4d)
        self._Sinv = None

    @property
    def Sinv(self):
        if self._Sinv is None:
            self._Sinv = np.linalg.inv(self.S)
        return self._Sinv

    def _xyz(self, x, y, z):
        zz = z if z is not None else np.zeros_like(np.asarray(x, dtype=np.float64))
        return (np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64),
                np.asarray(zz, dtype=np.float64))

    def fwd(self, x, y, z, t):
        X, Y, Z = self._xyz(x, y, z)
        P = np.stack([X, Y, Z]) if X.ndim else np.array([[X], [Y], [Z]])
        out = self.S @ P + self.off[:, None]
        tt = None if t is None else self.toff + self.tscale * np.asarray(t)
        return out[0], out[1], (out[2] if z is not None else z), tt

    def inv(self, x, y, z, t):
        if self.tscale == 0.0:
            # reference affine.cpp:158: tscale == 0 marks the WHOLE
            # operation non-invertible (same as a singular matrix), not
            # just the time lane
            raise ValueError("affine: matrix non invertible (tscale=0)")
        X, Y, Z = self._xyz(x, y, z)
        P = np.stack([X, Y, Z]) - self.off[:, None]
        out = self.Sinv @ P
        tt = None if t is None else (np.asarray(t) - self.toff) / self.tscale
        return out[0], out[1], (out[2] if z is not None else z), tt


class GeogoffsetStep(Step):
    """Constant geographic offset (reference affine.cpp geogoffset):
    +dlon/+dlat in arc-seconds, +dh metres."""

    left = "rad"
    right = "rad"

    _SEC2RAD = math.pi / (180.0 * 3600.0)

    def __init__(self, params: dict):
        self.dlam = float(params.get("dlon", 0.0)) * self._SEC2RAD
        self.dphi = float(params.get("dlat", 0.0)) * self._SEC2RAD
        self.dh = float(params.get("dh", 0.0))

    def fwd(self, x, y, z, t):
        zz = None if z is None else np.asarray(z, dtype=np.float64) + self.dh
        return (np.asarray(x, dtype=np.float64) + self.dlam,
                np.asarray(y, dtype=np.float64) + self.dphi, zz, t)

    def inv(self, x, y, z, t):
        zz = None if z is None else np.asarray(z, dtype=np.float64) - self.dh
        return (np.asarray(x, dtype=np.float64) - self.dlam,
                np.asarray(y, dtype=np.float64) - self.dphi, zz, t)


class MolodenskyStep(Step):
    """Approximate direct geodetic datum shift (src/transformations/
    molodensky.cpp; gie tolerance 2 m)."""

    left = "rad"
    right = "rad"

    def __init__(self, params: dict):
        from proj_spark.kernels import molodensky as k

        self.k = k
        self.C = k.setup_molodensky(resolve_ellipsoid(params), params)

    def fwd(self, x, y, z, t):
        zz = z if z is not None else np.zeros_like(np.asarray(x, dtype=np.float64))
        lam, phi, h = self.k.molodensky_fwd(x, y, zz, self.C)
        return lam, phi, (h if z is not None else z), t

    def inv(self, x, y, z, t):
        zz = z if z is not None else np.zeros_like(np.asarray(x, dtype=np.float64))
        lam, phi, h = self.k.molodensky_inv(x, y, zz, self.C)
        return lam, phi, (h if z is not None else z), t


_FIXTURE_GRIDS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "tests", "fixtures", "grids")

_GRID_SEARCH_PATHS = [
    ".",
    "data",
    # user-configured grid directory (PROJ_DATA-style)
    *([os.environ["PROJ_SPARK_GRID_DIR"]]
      if os.environ.get("PROJ_SPARK_GRID_DIR") else []),
    # deployed data dir (PROJ_DATA analogue; see sources/epsg.py) for
    # --py-files cluster runs where grids ship separately from code
    *([os.path.join(os.environ["PROJ_SPARK_DATA"], "grids", "tests"),
       os.path.join(os.environ["PROJ_SPARK_DATA"], "grids"),
       os.environ["PROJ_SPARK_DATA"]]
      if os.environ.get("PROJ_SPARK_DATA") else []),
    # bundled micro test grids (copied from the reference's public test
    # data) — the engine runs standalone, no reference checkout needed
    os.path.join(_FIXTURE_GRIDS, "tests"),
    _FIXTURE_GRIDS,                # "tests/xxx.tif"-style gie references
    "/root/reference/data/tests",  # fallback: reference checkout if present
    "/root/reference/data",
]
_GRID_CACHE: dict = {}


def _load_grids(spec: str):
    """Resolve a +grids= list; '@name' marks an optional grid."""
    import os

    from proj_spark.sources.ntv2 import parse_gsb

    grids = []
    for name in spec.split(","):
        optional = name.startswith("@")
        name = name.lstrip("@")
        path = None
        for d in _GRID_SEARCH_PATHS:
            cand = os.path.join(d, name)
            if os.path.exists(cand):
                path = cand
                break
        if path is None:
            if optional:
                continue
            raise FileNotFoundError(f"grid {name!r} not found")
        if path not in _GRID_CACHE:
            try:
                if path.lower().endswith((".tif", ".tiff")):
                    from proj_spark.sources.geotiff import load_hgrids_tiff
                    _GRID_CACHE[path] = load_hgrids_tiff(path)
                else:
                    with open(path, "rb") as fh:
                        magic = fh.read(9)
                    if magic.startswith(b"CTABLE V2"):
                        # datum-shift use compensates the NTv2 west-positive
                        # convention (grids.cpp valueAt compensate=true)
                        from proj_spark.sources.ntv2 import parse_ct2
                        _GRID_CACHE[path] = parse_ct2(path, negate_lon=True)
                    elif magic.startswith(b"HEADER"):
                        from proj_spark.sources.ntv2 import parse_ntv1
                        _GRID_CACHE[path] = parse_ntv1(path)
                    else:
                        _GRID_CACHE[path] = parse_gsb(path)
            except Exception:
                # '@'-optional grids may be unreadable; skip like the
                # reference's canFail path (pj_hgrid_init)
                if optional:
                    continue
                raise
        grids.extend(_GRID_CACHE[path])
    if not grids:
        raise FileNotFoundError(f"no usable grid in +grids={spec!r}")
    return grids


class HgridshiftStep(Step):
    """Horizontal datum shift by NTv2 grid (reference
    src/transformations/hgridshift.cpp + grids.cpp apply path). The grid
    arrays ride into Spark executors by closure capture (broadcast)."""

    left = "rad"
    right = "rad"

    def __init__(self, params: dict):
        from proj_spark.kernels import gridshift as k

        if "grids" not in params:
            raise ValueError("hgridshift: +grids is mandatory")
        self.k = k
        self.grids = _load_grids(str(params["grids"]))
        # temporal gating (reference hgridshift.cpp fwd_4d :73-95): apply
        # only when t < t_epoch and t_final > t_epoch; "now" = any future
        tf = params.get("t_final")
        self.t_final = (3000.0 if tf == "now" else float(tf)) if tf else 0.0
        self.t_epoch = float(params.get("t_epoch", 0.0))

    def _gate(self, x, y, t, lam, phi):
        if self.t_final == 0.0 or self.t_epoch == 0.0 or t is None:
            return lam, phi
        tt = np.asarray(t, dtype=np.float64)
        apply_mask = (tt < self.t_epoch) & (self.t_final > self.t_epoch)
        return (np.where(apply_mask, lam, x), np.where(apply_mask, phi, y))

    def fwd(self, x, y, z, t):
        lam, phi = self.k.hgridshift_fwd(x, y, self.grids)
        lam, phi = self._gate(x, y, t, lam, phi)
        return lam, phi, z, t

    def inv(self, x, y, z, t):
        lam, phi = self.k.hgridshift_inv(x, y, self.grids)
        lam, phi = self._gate(x, y, t, lam, phi)
        return lam, phi, z, t


class VgridshiftStep(Step):
    """Vertical (geoid) shift from a GTX grid (reference
    src/transformations/vgridshift.cpp; forward z += value * multiplier,
    default multiplier -1.0, :201)."""

    left = "rad"
    right = "rad"

    def __init__(self, params: dict):
        import os

        from proj_spark.kernels import gridshift as k
        from proj_spark.sources.gtx import parse_gtx

        if "grids" not in params:
            raise ValueError("vgridshift: +grids is mandatory")
        self.k = k
        self.mult = float(params.get("multiplier", -1.0))
        # temporal gating (reference vgridshift.cpp fwd_4d :90-114): apply
        # only when t < t_epoch and t_final > t_epoch. "now" just needs to
        # order after any t_epoch — use a fixed future constant, NOT the
        # wall clock (determinism for resume).
        tf = params.get("t_final")
        self.t_final = (3000.0 if tf == "now" else float(tf)) if tf else 0.0
        self.t_epoch = float(params.get("t_epoch", 0.0))
        self.grids = []
        for name in str(params["grids"]).split(","):
            optional = name.startswith("@")
            name = name.lstrip("@")
            if name == "null":
                # world-covering zero-shift fallback grid
                # (reference grids.cpp NullVerticalShiftGrid)
                from proj_spark.sources.gtx import VGrid
                self.grids.append(VGrid(
                    -math.pi, -math.pi / 2, math.pi, math.pi / 2,
                    3, 3, np.zeros((3, 3), dtype=np.float32)))
                continue
            path = None
            for d in _GRID_SEARCH_PATHS:
                cand = os.path.join(d, name)
                if os.path.exists(cand):
                    path = cand
                    break
            # the reference's gie fixtures name egm96_15.gtx; only the
            # downsampled extract ships in data/tests — accept it
            if path is None and name == "egm96_15.gtx":
                for d in _GRID_SEARCH_PATHS:
                    cand = os.path.join(d, "egm96_15_downsampled.gtx")
                    if os.path.exists(cand):
                        path = cand
                        break
            if path is None:
                if optional:
                    continue
                raise FileNotFoundError(f"grid {name!r} not found")
            if path not in _GRID_CACHE:
                if path.lower().endswith((".tif", ".tiff")):
                    from proj_spark.sources.geotiff import load_vgrids_tiff
                    _GRID_CACHE[path] = load_vgrids_tiff(path)
                else:
                    _GRID_CACHE[path] = parse_gtx(path)
            self.grids.extend(_GRID_CACHE[path])
        if not self.grids:
            raise FileNotFoundError(f"no usable grid in {params['grids']!r}")
        # GTX nodata sentinels -> NaN so the bilinear kernel drops those
        # corners and renormalizes (reference grids.cpp GTXVerticalShiftGrid
        # ::isNodata :355-362: |val*mult| > 1000 or val == -88.8888f)
        masked = []
        for g in self.grids:
            if not hasattr(g, "values"):  # non-GTX grid shapes pass through
                masked.append(g)
                continue
            bad = (np.abs(g.values * np.float32(self.mult)) > 1000.0) \
                | (g.values == np.float32(-88.88880))
            if bad.any():
                vals = g.values.copy()
                vals[bad] = np.nan
                g = type(g)(g.west, g.south, g.resx, g.resy,
                            g.width, g.height, vals)
            masked.append(g)
        self.grids = masked

    def _gate(self, shift, t):
        if self.t_final == 0.0 or self.t_epoch == 0.0 or t is None:
            return shift
        tt = np.asarray(t, dtype=np.float64)
        apply_mask = (tt < self.t_epoch) & (self.t_final > self.t_epoch)
        return np.where(apply_mask, shift, 0.0)

    def fwd(self, x, y, z, t):
        zz = z if z is not None else np.zeros_like(np.asarray(x, dtype=np.float64))
        shift = self.k.vgrid_value(x, y, self.grids) * self.mult
        shift = self._gate(shift, t)
        # outside every grid is a whole-coordinate error (reference
        # read_vgrid_value returns HUGE_VAL and vgridshift.cpp errors the
        # PJ_COORD), not just a missing z
        bad = np.isnan(shift)
        return (np.where(bad, np.nan, x), np.where(bad, np.nan, y),
                zz + shift, t)

    def inv(self, x, y, z, t):
        zz = z if z is not None else np.zeros_like(np.asarray(x, dtype=np.float64))
        shift = self.k.vgrid_value(x, y, self.grids) * self.mult
        shift = self._gate(shift, t)
        bad = np.isnan(shift)
        return (np.where(bad, np.nan, x), np.where(bad, np.nan, y),
                zz - shift, t)


class PushStep(Step):
    """Save coordinate components across pipeline steps (reference
    src/pipeline.cpp push/pop, stack per component :139). Stack lives on
    the Pipeline during execution."""

    left = "whatever"
    right = "whatever"

    def __init__(self, params: dict):
        self.indices = [i for i in (1, 2, 3, 4) if f"v_{i}" in params]
        self.stack: dict[int, list] | None = None  # bound by Pipeline

    def fwd(self, x, y, z, t):
        comps = [x, y, z, t]
        for i in self.indices:
            self.stack[i].append(np.copy(comps[i - 1]))
        return x, y, z, t

    def inv(self, x, y, z, t):  # inverse direction: push acts as pop
        comps = [x, y, z, t]
        for i in self.indices:
            if self.stack[i]:
                comps[i - 1] = self.stack[i].pop()
        return tuple(comps)


class PopStep(Step):
    left = "whatever"
    right = "whatever"

    def __init__(self, params: dict):
        self.indices = [i for i in (1, 2, 3, 4) if f"v_{i}" in params]
        self.stack: dict[int, list] | None = None

    def fwd(self, x, y, z, t):
        comps = [x, y, z, t]
        for i in self.indices:
            if self.stack[i]:
                comps[i - 1] = self.stack[i].pop()
        return tuple(comps)

    def inv(self, x, y, z, t):  # inverse direction: pop acts as push
        comps = [x, y, z, t]
        for i in self.indices:
            self.stack[i].append(np.copy(comps[i - 1]))
        return x, y, z, t


class LatlongStep(NoopStep):
    """Identity with angular unit bookkeeping (reference src/projections/latlong.cpp)."""

    left = "rad"
    right = "rad"


class GeocLatlongStep(Step):
    """latlong with the +geoc flag: IO latitude is geocentric.

    fwd converts geocentric->geodetic on input (reference src/fwd.cpp:79-81),
    inv converts geodetic->geocentric on output (src/inv.cpp:138-140);
    tan(theta) = (1 - es) * tan(phi).
    """

    left = "rad"
    right = "rad"

    def __init__(self, ell: Ellipsoid):
        self.one_es = ell.one_es

    def fwd(self, x, y, z, t):
        phi = np.asarray(y, dtype=np.float64)
        return x, np.arctan(np.tan(phi) / self.one_es), z, t

    def inv(self, x, y, z, t):
        phi = np.asarray(y, dtype=np.float64)
        return x, np.arctan(self.one_es * np.tan(phi)), z, t


class SchStep(Step):
    """Spherical Cross-track Height (reference src/projections/sch.cpp,
    JPL/ISCE radar geometry): geodetic -> geocentric -> peg-rotated local
    sphere of radius rcurv -> (s, c, h). Outputs real metres."""

    left = "rad"
    right = "m"

    def __init__(self, params: dict):
        from proj_spark.kernels import cart as k_cart

        self.ell = resolve_ellipsoid(params)
        self.k_cart = k_cart
        if "plat_0" not in params or "plon_0" not in params or "phdg_0" not in params:
            raise ValueError("sch: plat_0, plon_0, phdg_0 are mandatory")
        plat = _angle(params, "plat_0")
        plon = _angle(params, "plon_0")
        phdg = _angle(params, "phdg_0")
        h0 = float(params.get("h_0", 0.0))
        clt, slt = math.cos(plat), math.sin(plat)
        clo, slo = math.cos(plon), math.sin(plon)
        temp = math.sqrt(1.0 - self.ell.es * slt * slt)
        reast = self.ell.a / temp
        rnorth = self.ell.a * (1.0 - self.ell.es) / temp ** 3
        chdg, shdg = math.cos(phdg), math.sin(phdg)
        self.rcurv = h0 + (reast * rnorth) / (
            reast * chdg * chdg + rnorth * shdg * shdg)
        self.sphere = Ellipsoid.sphere(self.rcurv)
        self.M = (
            clt * clo, -shdg * slo - slt * clo * chdg, slo * chdg - slt * clo * shdg,
            clt * slo, clo * shdg - slt * slo * chdg, -clo * chdg - slt * slo * shdg,
            slt, clt * chdg, clt * shdg,
        )
        X, Y, Z = k_cart.cart_fwd(
            np.array([plon]), np.array([plat]), np.array([h0]), self.ell)
        self.off = (float(X[0]) - self.rcurv * clt * clo,
                    float(Y[0]) - self.rcurv * clt * slo,
                    float(Z[0]) - self.rcurv * slt)

    def fwd(self, x, y, z, t):
        zz = z if z is not None else np.zeros_like(np.asarray(x, dtype=np.float64))
        X, Y, Z = self.k_cart.cart_fwd(x, y, zz, self.ell)
        X = X - self.off[0]
        Y = Y - self.off[1]
        Z = Z - self.off[2]
        M = self.M
        Xr = M[0] * X + M[3] * Y + M[6] * Z
        Yr = M[1] * X + M[4] * Y + M[7] * Z
        Zr = M[2] * X + M[5] * Y + M[8] * Z
        lam, phi, h = self.k_cart.cart_inv(Xr, Yr, Zr, self.sphere)
        return lam * self.rcurv, phi * self.rcurv, h, t

    def inv(self, x, y, z, t):
        lam = np.asarray(x, dtype=np.float64) / self.rcurv
        phi = np.asarray(y, dtype=np.float64) / self.rcurv
        zz = z if z is not None else np.zeros_like(lam)
        X, Y, Z = self.k_cart.cart_fwd(lam, phi, zz, self.sphere)
        M = self.M
        Xr = M[0] * X + M[1] * Y + M[2] * Z
        Yr = M[3] * X + M[4] * Y + M[5] * Z
        Zr = M[6] * X + M[7] * Y + M[8] * Z
        Xr = Xr + self.off[0]
        Yr = Yr + self.off[1]
        Zr = Zr + self.off[2]
        lam, phi, h = self.k_cart.cart_inv(Xr, Yr, Zr, self.ell)
        return lam, phi, h, t


class S2Step(Step):
    """+proj=s2 — the registry cube-face projection (reference
    src/projections/s2.cpp): fixed face from lon_0/lat_0, geodetic->
    geocentric shift on the ellipsoid, UV->ST by +UVtoST=linear|quadratic|
    tangent|none. Consumes ABSOLUTE longitude (the reference cancels the
    lam0 shift via from_greenwich = -lam0, s2.cpp:431) and emits raw (s,t)
    in [0,1] (IO_UNITS_PROJECTED — no a-scaling)."""

    left = "rad"
    right = "m"

    def __init__(self, params: dict):
        ell = resolve_ellipsoid(params)
        self.es = ell.es
        omf = 1.0 - ell.f
        self.omf = omf
        self.omf2 = omf * omf
        self.a = ell.a
        self.b = ell.b
        lam0 = _angle(params, "lon_0")
        phi0 = _angle(params, "lat_0")
        # standard S2 face ids: 0=+X 1=+Y 2=+Z 3=-X 4=-Y 5=-Z
        # (s2.cpp enum :67-72 — note TOP=2, BACK=3, LEFT=4, unlike qsc)
        fortpi, halfpi = math.pi / 4, math.pi / 2
        if phi0 >= halfpi - fortpi / 2.0:
            self.face = 2   # top (+Z)
        elif phi0 <= -(halfpi - fortpi / 2.0):
            self.face = 5   # bottom (-Z)
        elif abs(lam0) <= fortpi:
            self.face = 0   # front (+X)
        elif abs(lam0) <= halfpi + fortpi:
            self.face = 1 if lam0 > 0 else 4
        else:
            self.face = 3   # back (-X)
        self.kind = str(params.get("UVtoST", "quadratic"))
        if self.kind not in ("linear", "quadratic", "tangent", "none"):
            raise ValueError(f"s2: invalid UVtoST {self.kind!r}")

    def _uv_to_st(self, u):
        if self.kind == "linear":
            return 0.5 * (u + 1.0)
        if self.kind == "quadratic":
            return np.where(u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u),
                            1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u))
        if self.kind == "tangent":
            return (2.0 / math.pi) * (np.arctan(u) + math.pi / 4)
        return u

    def _st_to_uv(self, s):
        if self.kind == "linear":
            return 2.0 * s - 1.0
        if self.kind == "quadratic":
            return np.where(s >= 0.5, (1 / 3.0) * (4.0 * s * s - 1.0),
                            (1 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)))
        if self.kind == "tangent":
            t = np.tan(math.pi / 2 * s - math.pi / 4)
            return t + (1.0 / (1 << 53)) * t
        return s

    def fwd(self, x, y, z, t):
        lam = np.asarray(x, dtype=np.float64)
        phi = np.asarray(y, dtype=np.float64)
        if self.es != 0.0:
            phi = np.arctan(self.omf2 * np.tan(phi))
        coslat = np.cos(phi)
        X = coslat * np.cos(lam)
        Y = coslat * np.sin(lam)
        Z = np.sin(phi)
        # ValidFaceXYZtoUV (s2.cpp:260-288)
        with np.errstate(divide="ignore", invalid="ignore"):
            u, v = [
                (Y / X, Z / X), (-X / Y, Z / Y), (-X / Z, -Y / Z),
                (Z / X, Y / X), (Z / Y, -X / Y), (-Y / Z, -X / Z),
            ][self.face]
        return self._uv_to_st(u), self._uv_to_st(v), z, t

    def inv(self, x, y, z, t):
        u = self._st_to_uv(np.asarray(x, dtype=np.float64))
        v = self._st_to_uv(np.asarray(y, dtype=np.float64))
        major = 1.0 / np.sqrt(1.0 + u * u + v * v)
        m1 = u * major
        m2 = v * major
        q, r, s = [
            (major, m1, m2), (-m1, major, m2), (-m1, -m2, major),
            (-major, -m2, -m1), (m2, -major, -m1), (m2, m1, -major),
        ][self.face]
        phi = np.arccos(np.clip(-s, -1, 1)) - math.pi / 2
        lam = np.arctan2(r, q)
        if self.es != 0.0:
            neg = phi < 0.0
            tanphi = np.tan(phi)
            with np.errstate(divide="ignore", invalid="ignore"):
                xa = self.b / np.sqrt(tanphi * tanphi + self.omf2)
                phi = np.arctan(np.sqrt(np.maximum(
                    self.a * self.a - xa * xa, 0.0)) / (self.omf * xa))
            phi = np.where(neg, -phi, phi)
        return lam, phi, z, t


class GridshiftStep(Step):
    """+proj=gridshift — unified GeoTIFF grid shift (kernels/geogrid.py).
    IO is radians for geographic grids, raw projected metres otherwise."""

    def __init__(self, params: dict):
        from proj_spark.kernels.geogrid import GridshiftTransform

        if "grids" not in params:
            raise ValueError("gridshift: +grids parameter missing")
        self.t = GridshiftTransform(
            str(params["grids"]),
            interpolation=str(params.get("interpolation", "")),
            no_z_transform="no_z_transform" in params)
        self.left = self.right = "m" if self.t.is_projected else "rad"

    def fwd(self, x, y, z, t):
        zz = z if z is not None else np.zeros_like(np.asarray(x, dtype=np.float64))
        X, Y, Z = self.t.fwd(x, y, zz)
        return X, Y, (Z if z is not None else z), t

    def inv(self, x, y, z, t):
        zz = z if z is not None else np.zeros_like(np.asarray(x, dtype=np.float64))
        X, Y, Z = self.t.inv(x, y, zz)
        return X, Y, (Z if z is not None else z), t


class XyzgridshiftStep(Step):
    """+proj=xyzgridshift — geocentric translation by geographic grid
    (reference src/transformations/xyzgridshift.cpp): convert XYZ to
    geodetic on the given ellipsoid, bilinearly sample
    x/y/z_translation, add (direct) or fixed-point iterate (when the grid
    is referenced to the other CRS)."""

    left = "cart"
    right = "cart"

    def __init__(self, params: dict):
        from proj_spark.kernels import cart as k_cart
        from proj_spark.kernels.geogrid import load_grid_units

        if "grids" not in params:
            raise ValueError("xyzgridshift: +grids parameter missing")
        self.ell = resolve_ellipsoid(params)
        self.k_cart = k_cart
        self.units = load_grid_units(str(params["grids"]))
        self.mult = float(params.get("multiplier", 1.0))
        grid_ref = str(params.get("grid_ref", "input_crs"))
        if grid_ref not in ("input_crs", "output_crs"):
            raise ValueError("xyzgridshift: unsupported grid_ref")
        self.ref_is_input = grid_ref == "input_crs"
        # channel indices (x/y/z_translation, default 0/1/2)
        g = self.units[0].grids[0]
        self.idx = [0, 1, 2]
        for i in range(g.samples):
            d = g.metadata_item("DESCRIPTION", i)
            if d == "x_translation":
                self.idx[0] = i
            elif d == "y_translation":
                self.idx[1] = i
            elif d == "z_translation":
                self.idx[2] = i

    def _shift(self, X, Y, Z):
        from proj_spark.kernels.geogrid import _interp_grid

        lam, phi, _h = self.k_cart.cart_inv(X, Y, Z, self.ell)
        dx = np.full_like(lam, np.nan)
        dy = np.full_like(lam, np.nan)
        dz = np.full_like(lam, np.nan)
        done = np.zeros(lam.shape, dtype=bool)
        for unit in self.units:
            for g in unit.grids:
                gx, _, _, v1 = _interp_grid(g, lam, phi, self.idx[0], -1, -1,
                                            True, True)
                gy, _, _, v2 = _interp_grid(g, lam, phi, self.idx[1], -1, -1,
                                            True, True)
                gz, _, _, v3 = _interp_grid(g, lam, phi, self.idx[2], -1, -1,
                                            True, True)
                hit = ~done & v1 & v2 & v3
                dx = np.where(hit, gx, dx)
                dy = np.where(hit, gy, dy)
                dz = np.where(hit, gz, dz)
                done |= hit
        return dx * self.mult, dy * self.mult, dz * self.mult

    def _direct(self, X, Y, Z, factor):
        dx, dy, dz = self._shift(X, Y, Z)
        return X + factor * dx, Y + factor * dy, Z + factor * dz

    def _iterative(self, X, Y, Z, factor):
        PX, PY, PZ = X.copy(), Y.copy(), Z.copy()
        for _ in range(10):
            dx, dy, dz = self._shift(PX, PY, PZ)
            dx *= factor
            dy *= factor
            dz *= factor
            err = ((PX - X - dx) ** 2 + (PY - Y - dy) ** 2
                   + (PZ - Z - dz) ** 2)
            PX = X + dx
            PY = Y + dy
            PZ = Z + dz
            if np.all(err < 1e-10):
                break
        return PX, PY, PZ

    def fwd(self, x, y, z, t):
        X = np.asarray(x, dtype=np.float64)
        Y = np.asarray(y, dtype=np.float64)
        Z = np.asarray(z, dtype=np.float64) if z is not None else np.zeros_like(X)
        if self.ref_is_input:
            X, Y, Z = self._direct(X, Y, Z, 1.0)
        else:
            X, Y, Z = self._iterative(X, Y, Z, 1.0)
        return X, Y, Z, t

    def inv(self, x, y, z, t):
        X = np.asarray(x, dtype=np.float64)
        Y = np.asarray(y, dtype=np.float64)
        Z = np.asarray(z, dtype=np.float64) if z is not None else np.zeros_like(X)
        if self.ref_is_input:
            X, Y, Z = self._iterative(X, Y, Z, -1.0)
        else:
            X, Y, Z = self._direct(X, Y, Z, -1.0)
        return X, Y, Z, t


class DeformationStep(Step):
    """+proj=deformation — kinematic velocity-model shift (reference
    src/transformations/deformation.cpp): XYZ -> geodetic, bilinear ENU
    velocities (mm/yr / 1000), ENU -> XYZ rotation (Norbech et al. 2003),
    out = in + dt * v; inverse via fixed-point iteration with the
    reference's exact z bookkeeping (:196-238). Velocities from a 3-channel
    GeoTIFF (+grids) or legacy CTable2 + GTX pair (+xy_grids/+z_grids)."""

    left = "cart"
    right = "cart"

    def __init__(self, params: dict):
        from proj_spark.kernels import cart as k_cart
        from proj_spark.kernels import gridshift as k_gridshift

        self.ell = resolve_ellipsoid(params)
        self.k_cart = k_cart
        self.k_gridshift = k_gridshift
        self.dt = float(params["dt"]) if "dt" in params else None
        self.t_epoch = float(params["t_epoch"]) if "t_epoch" in params else None
        if self.dt is None and self.t_epoch is None:
            raise ValueError("deformation: +dt or +t_epoch is mandatory")
        self.units = None
        self.hgrids = None
        self.vgrids = None
        if "grids" in params:
            from proj_spark.kernels.geogrid import load_grid_units

            self.units = load_grid_units(str(params["grids"]))
            g = self.units[0].grids[0]
            self.idx = [0, 1, 2]
            for i in range(g.samples):
                d = g.metadata_item("DESCRIPTION", i)
                if d == "east_velocity":
                    self.idx[0] = i
                elif d == "north_velocity":
                    self.idx[1] = i
                elif d == "up_velocity":
                    self.idx[2] = i
        else:
            if "xy_grids" not in params or "z_grids" not in params:
                raise ValueError(
                    "deformation: +grids or +xy_grids/+z_grids mandatory")
            import os

            from proj_spark.sources.gtx import parse_gtx
            from proj_spark.sources.ntv2 import parse_ct2

            def find(name):
                for d in _GRID_SEARCH_PATHS:
                    cand = os.path.join(d, name)
                    if os.path.exists(cand):
                        return cand
                # the gie corpus names egm96_15.gtx; only the downsampled
                # extract ships in the reference's test data (same alias
                # VgridshiftStep applies)
                if name == "egm96_15.gtx":
                    for d in _GRID_SEARCH_PATHS:
                        cand = os.path.join(d, "egm96_15_downsampled.gtx")
                        if os.path.exists(cand):
                            return cand
                raise FileNotFoundError(f"grid {name!r} not found")

            self.hgrids = []
            for name in str(params["xy_grids"]).lstrip("@").split(","):
                self.hgrids.extend(parse_ct2(find(name)))
            self.vgrids = []
            for name in str(params["z_grids"]).lstrip("@").split(","):
                self.vgrids.extend(parse_gtx(find(name)))

    def _velocity(self, X, Y, Z):
        """(vx, vy, vz) cartesian m/yr at geocentric positions."""
        lam, phi, _h = self.k_cart.cart_inv(X, Y, Z, self.ell)
        if self.units is not None:
            from proj_spark.kernels.geogrid import _interp_grid

            e = np.full_like(lam, np.nan)
            n = np.full_like(lam, np.nan)
            u = np.full_like(lam, np.nan)
            done = np.zeros(lam.shape, dtype=bool)
            for unit in self.units:
                for g in unit.grids:
                    ge, _, _, v1 = _interp_grid(g, lam, phi, self.idx[0], -1,
                                                -1, True, True)
                    gn, _, _, v2 = _interp_grid(g, lam, phi, self.idx[1], -1,
                                                -1, True, True)
                    gu, _, _, v3 = _interp_grid(g, lam, phi, self.idx[2], -1,
                                                -1, True, True)
                    hit = ~done & v1 & v2 & v3
                    e = np.where(hit, ge, e)
                    n = np.where(hit, gn, n)
                    u = np.where(hit, gu, u)
                    done |= hit
            e /= 1000.0
            n /= 1000.0
            u /= 1000.0
        else:
            out_l = np.full_like(lam, np.nan)
            out_p = np.full_like(lam, np.nan)
            remaining = np.ones(lam.shape, dtype=bool)
            for g in self.hgrids:
                eps = (g.resx + g.resy) * 1e-5
                m = remaining & g.contains(lam, phi, eps)
                if m.any():
                    dl, dp, valid = self.k_gridshift._interpolate(
                        lam[m] - g.west, phi[m] - g.south, g)
                    out_l[m] = np.where(valid, dl, np.nan)
                    out_p[m] = np.where(valid, dp, np.nan)
                    remaining &= ~m
            e = out_l / 1000.0
            n = out_p / 1000.0
            u = self.k_gridshift.vgrid_value(lam, phi, self.vgrids) / 1000.0
        sp, cp = np.sin(phi), np.cos(phi)
        sl, cl = np.sin(lam), np.cos(lam)
        vx = -sp * cl * n - sl * e + cp * cl * u
        vy = -sp * sl * n + cl * e + cp * sl * u
        vz = cp * n + sp * u
        return vx, vy, vz

    def _dt(self, t):
        if self.dt is not None:
            return self.dt
        if t is None:
            raise ValueError("deformation: 4D input needs a t coordinate")
        return np.asarray(t, dtype=np.float64) - self.t_epoch

    def fwd(self, x, y, z, t):
        X = np.asarray(x, dtype=np.float64)
        Y = np.asarray(y, dtype=np.float64)
        Z = np.asarray(z, dtype=np.float64) if z is not None else np.zeros_like(X)
        dt = self._dt(t)
        vx, vy, vz = self._velocity(X, Y, Z)
        return X + dt * vx, Y + dt * vy, Z + dt * vz, t

    def inv(self, x, y, z, t):
        X = np.asarray(x, dtype=np.float64)
        Y = np.asarray(y, dtype=np.float64)
        Z = np.asarray(z, dtype=np.float64) if z is not None else np.zeros_like(X)
        dt = self._dt(t)
        vx, vy, vz = self._velocity(X, Y, Z)
        z0 = vz.copy()
        ox = X - dt * vx
        oy = Y - dt * vy
        oz = Z + dt * vz          # reference :216 keeps +dt*vz while iterating
        done = np.zeros(X.shape, dtype=bool)
        for _ in range(10):
            vx, vy, vz = self._velocity(ox, oy, oz)
            bad = np.isnan(vx)
            difx = np.where(bad, 0.0, ox + dt * vx - X)
            dify = np.where(bad, 0.0, oy + dt * vy - Y)
            difz = np.where(bad, 0.0, oz - dt * vz - Z)
            ox = np.where(done, ox, ox + difx)
            oy = np.where(done, oy, oy + dify)
            oz = np.where(done, oz, oz + difz)
            done |= np.hypot(difx, dify) <= 1e-8
            done |= bad
            if done.all():
                break
        oz = Z - dt * z0
        return ox, oy, oz, t


class TinshiftStep(Step):
    """+proj=tinshift (kernels/tinshift.py). IO is raw coordinates in the
    triangulation's CRS (the reference declares WHATEVER units)."""

    left = "m"
    right = "m"

    def __init__(self, params: dict):
        import os

        from proj_spark.kernels.tinshift import parse_tinshift

        if "file" not in params:
            raise ValueError("tinshift: +file parameter missing")
        name = str(params["file"])
        path = None
        for d in _GRID_SEARCH_PATHS:
            cand = os.path.join(d, name)
            if os.path.exists(cand):
                path = cand
                break
        if path is None:
            raise FileNotFoundError(f"tinshift file {name!r} not found")
        self.T = parse_tinshift(path)

    def fwd(self, x, y, z, t):
        from proj_spark.kernels.tinshift import tinshift_apply

        zz = z if z is not None else np.zeros_like(np.asarray(x, dtype=np.float64))
        X, Y, Z = tinshift_apply(self.T, x, y, zz, True)
        return X, Y, (Z if z is not None else z), t

    def inv(self, x, y, z, t):
        from proj_spark.kernels.tinshift import tinshift_apply

        zz = z if z is not None else np.zeros_like(np.asarray(x, dtype=np.float64))
        X, Y, Z = tinshift_apply(self.T, x, y, zz, False)
        return X, Y, (Z if z is not None else z), t


class DefmodelStep(Step):
    """+proj=defmodel (kernels/defmodel.py). IO radians for geographic
    definition CRS, raw projected units otherwise; epoch from the t
    coordinate."""

    def __init__(self, params: dict):
        import os

        from proj_spark.kernels.defmodel import DefModel

        if "model" not in params:
            raise ValueError("defmodel: +model parameter missing")
        name = str(params["model"])
        path = None
        for d in _GRID_SEARCH_PATHS:
            cand = os.path.join(d, name)
            if os.path.exists(cand):
                path = cand
                break
        if path is None:
            raise FileNotFoundError(f"defmodel master file {name!r} not found")
        self.model = DefModel(path, resolve_ellipsoid(params),
                              search_paths=_GRID_SEARCH_PATHS)
        self.left = self.right = "rad" if self.model.is_geographic else "m"

    def fwd(self, x, y, z, t):
        zz = z if z is not None else np.zeros_like(np.asarray(x, dtype=np.float64))
        if t is None:
            raise ValueError("defmodel: input epoch (t coordinate) required")
        X, Y, Z, _ok = self.model.forward(x, y, zz, t)
        return X, Y, (Z if z is not None else z), t

    def inv(self, x, y, z, t):
        zz = z if z is not None else np.zeros_like(np.asarray(x, dtype=np.float64))
        if t is None:
            raise ValueError("defmodel: input epoch (t coordinate) required")
        X, Y, Z = self.model.inverse(x, y, zz, t)
        return X, Y, (Z if z is not None else z), t


class HornerStep(Step):
    """+proj=horner (kernels/horner.py) — raw projected units both sides
    (reference sets IO_UNITS_WHATEVER)."""

    left = "m"
    right = "m"

    def __init__(self, params: dict):
        from proj_spark.kernels import horner as k

        self.k = k
        self.C = k.setup_horner(params)

    def fwd(self, x, y, z, t):
        E, N = self.k.horner_fwd(x, y, self.C)
        return E, N, z, t

    def inv(self, x, y, z, t):
        E, N = self.k.horner_inv(x, y, self.C)
        return E, N, z, t


class GeocStep(Step):
    """+proj=geoc: geographic <-> geocentric latitude (reference
    src/conversions/geoc.cpp via pj_geocentric_latitude, 4D_api.cpp:1266):
    fwd tan(theta) = (1-es) tan(phi), inv the reciprocal."""

    left = "rad"
    right = "rad"

    def __init__(self, ell: Ellipsoid):
        self.one_es = ell.one_es

    def fwd(self, x, y, z, t):
        phi = np.asarray(y, dtype=np.float64)
        return x, np.arctan(self.one_es * np.tan(phi)), z, t

    def inv(self, x, y, z, t):
        phi = np.asarray(y, dtype=np.float64)
        return x, np.arctan(np.tan(phi) / self.one_es), z, t


class VertoffsetStep(Step):
    """EPSG 1046 vertical offset + slope (reference
    src/transformations/vertoffset.cpp:20-98): z +/-= zoff
    + slope_lat*rho0*(phi-phi0) + slope_lon*nu0*(lam-lam0)*cos(phi)."""

    left = "rad"
    right = "rad"

    def __init__(self, params: dict):
        ell = resolve_ellipsoid(params)
        arc2rad = math.pi / (180.0 * 3600.0)
        self.slope_lon = float(params.get("slope_lon", 0.0)) * arc2rad
        self.slope_lat = float(params.get("slope_lat", 0.0)) * arc2rad
        self.zoff = float(params.get("dh", 0.0))
        self.phi0 = _angle(params, "lat_0")
        self.lam0 = _angle(params, "lon_0")
        sinlat0 = math.sin(self.phi0)
        omes = 1.0 - ell.es * sinlat0 * sinlat0
        self.rho0 = ell.a * (1.0 - ell.es) / (omes * math.sqrt(omes))
        self.nu0 = ell.a / math.sqrt(omes)

    def _offset(self, lam, phi):
        return (self.zoff + self.slope_lat * self.rho0 * (phi - self.phi0)
                + self.slope_lon * self.nu0 * (lam - self.lam0) * np.cos(phi))

    def fwd(self, x, y, z, t):
        lam = np.asarray(x, dtype=np.float64)
        phi = np.asarray(y, dtype=np.float64)
        zz = z if z is not None else np.zeros_like(lam)
        return x, y, zz + self._offset(lam, phi), t

    def inv(self, x, y, z, t):
        lam = np.asarray(x, dtype=np.float64)
        phi = np.asarray(y, dtype=np.float64)
        zz = z if z is not None else np.zeros_like(lam)
        return x, y, zz - self._offset(lam, phi), t


class TopocentricStep(Step):
    """Geocentric <-> topocentric ENU (reference
    src/conversions/topocentric.cpp:21-46, IOGP GN7-2). Origin from
    (X_0,Y_0,Z_0) or (lon_0,lat_0,h_0) via cart."""

    left = "cart"
    right = "cart"

    def __init__(self, params: dict):
        from proj_spark.kernels import cart as k_cart

        ell = resolve_ellipsoid(params)
        if "X_0" in params:
            X0 = float(params["X_0"])
            Y0 = float(params.get("Y_0", 0.0))
            Z0 = float(params.get("Z_0", 0.0))
            # recover origin lat/lon for the rotation matrix
            lam0, phi0, _ = k_cart.cart_inv(
                np.array([X0]), np.array([Y0]), np.array([Z0]), ell)
            lam0, phi0 = float(lam0[0]), float(phi0[0])
        else:
            lam0 = _angle(params, "lon_0")
            phi0 = _angle(params, "lat_0")
            h0 = float(params.get("h_0", 0.0))
            X, Y, Z = k_cart.cart_fwd(
                np.array([lam0]), np.array([phi0]), np.array([h0]), ell)
            X0, Y0, Z0 = float(X[0]), float(Y[0]), float(Z[0])
        self.X0, self.Y0, self.Z0 = X0, Y0, Z0
        self.sphi0, self.cphi0 = math.sin(phi0), math.cos(phi0)
        self.slam0, self.clam0 = math.sin(lam0), math.cos(lam0)

    def fwd(self, x, y, z, t):
        X = np.asarray(x, dtype=np.float64)
        Y = np.asarray(y, dtype=np.float64)
        Z = np.asarray(z, dtype=np.float64) if z is not None else np.zeros_like(X)
        dX, dY, dZ = X - self.X0, Y - self.Y0, Z - self.Z0
        e = -dX * self.slam0 + dY * self.clam0
        n = (-dX * self.sphi0 * self.clam0 - dY * self.sphi0 * self.slam0
             + dZ * self.cphi0)
        u = (dX * self.cphi0 * self.clam0 + dY * self.cphi0 * self.slam0
             + dZ * self.sphi0)
        return e, n, u, t

    def inv(self, x, y, z, t):
        e = np.asarray(x, dtype=np.float64)
        n = np.asarray(y, dtype=np.float64)
        u = np.asarray(z, dtype=np.float64) if z is not None else np.zeros_like(e)
        X = (self.X0 - e * self.slam0 - n * self.sphi0 * self.clam0
             + u * self.cphi0 * self.clam0)
        Y = (self.Y0 + e * self.clam0 - n * self.sphi0 * self.slam0
             + u * self.cphi0 * self.slam0)
        Z = self.Z0 + n * self.cphi0 + u * self.sphi0
        return X, Y, Z, t


class ObTranStep(Step):
    """General oblique transformation (reference src/projections/ob_tran.cpp):
    rotate lon/lat to a new pole (Snyder 5-7/5-8b), then run the inner
    projection's RAW kernel (the reference calls link->fwd directly, skipping
    the inner op's lam0/x0/a handling — ob_tran.cpp:33,47). With
    o_proj=latlon the output stays raw rotated radians (IO_UNITS_WHATEVER,
    ob_tran.cpp:286-288)."""

    left = "rad"
    right = "m"   # raw kernel output: either metres-of-a or raw radians

    def __init__(self, params: dict):
        inner_name = str(params["o_proj"])
        if inner_name in ("ob_tran", "") or inner_name is True:
            raise ValueError("ob_tran: invalid o_proj")
        self.ell = resolve_ellipsoid(params)
        self.lam0 = _angle(params, "lon_0")
        self.x0 = float(params.get("x_0", 0.0))
        self.y0 = float(params.get("y_0", 0.0))

        self.latlong = inner_name in ("latlon", "latlong", "lonlat", "longlat")
        if not self.latlong:
            inner_params = {k: v for k, v in params.items()
                            if not k.startswith("o_")
                            and k not in ("lon_0", "x_0", "y_0")}
            inner_params["proj"] = inner_name
            inner = _build_step(inner_params)
            if not hasattr(inner, "kfwd"):
                raise ValueError(
                    f"ob_tran: o_proj={inner_name} has no raw kernel")
            self.kfwd, self.kinv = inner.kfwd, inner.kinv
        tol = 1e-10
        if "o_alpha" in params:
            lamc = _angle(params, "o_lon_c")
            phic = _angle(params, "o_lat_c")
            alpha = _angle(params, "o_alpha")
            self.lamp = lamc + math.atan2(-math.cos(alpha),
                                          -math.sin(alpha) * math.sin(phic))
            phip = math.asin(min(1.0, max(-1.0, math.cos(phic) * math.sin(alpha))))
        elif "o_lat_p" in params:
            self.lamp = _angle(params, "o_lon_p")
            phip = _angle(params, "o_lat_p")
        else:
            lam1 = _angle(params, "o_lon_1")
            phi1 = _angle(params, "o_lat_1")
            lam2 = _angle(params, "o_lon_2")
            phi2 = _angle(params, "o_lat_2")
            self.lamp = math.atan2(
                math.cos(phi1) * math.sin(phi2) * math.cos(lam1)
                - math.sin(phi1) * math.cos(phi2) * math.cos(lam2),
                math.sin(phi1) * math.cos(phi2) * math.sin(lam2)
                - math.cos(phi1) * math.sin(phi2) * math.sin(lam1))
            phip = math.atan(-math.cos(self.lamp - lam1) / math.tan(phi1))
        self.oblique = abs(phip) > tol
        self.cphip = math.cos(phip)
        self.sphip = math.sin(phip)

    def _rotate_fwd(self, lam, phi):
        coslam = np.cos(lam)
        sinphi = np.sin(phi)
        cosphi = np.cos(phi)
        if self.oblique:
            lam2 = adjlon(np.arctan2(
                cosphi * np.sin(lam),
                self.sphip * cosphi * coslam + self.cphip * sinphi) + self.lamp)
            phi2 = np.arcsin(np.clip(
                self.sphip * sinphi - self.cphip * cosphi * coslam, -1, 1))
        else:
            lam2 = adjlon(np.arctan2(cosphi * np.sin(lam), sinphi) + self.lamp)
            phi2 = np.arcsin(np.clip(-cosphi * coslam, -1, 1))
        return lam2, phi2

    def _rotate_inv(self, lam, phi):
        if self.oblique:
            lam = lam - self.lamp
            coslam = np.cos(lam)
            sinphi = np.sin(phi)
            cosphi = np.cos(phi)
            phi2 = np.arcsin(np.clip(
                self.sphip * sinphi + self.cphip * cosphi * coslam, -1, 1))
            lam2 = np.arctan2(cosphi * np.sin(lam),
                              self.sphip * cosphi * coslam - self.cphip * sinphi)
        else:
            t = lam - self.lamp
            cosphi = np.cos(phi)
            lam2 = np.arctan2(cosphi * np.sin(t), -np.sin(phi))
            phi2 = np.arcsin(np.clip(cosphi * np.cos(t), -1, 1))
        return lam2, phi2

    def fwd(self, x, y, z, t):
        lam = adjlon(np.asarray(x, dtype=np.float64) - self.lam0)
        phi = np.asarray(y, dtype=np.float64)
        lam2, phi2 = self._rotate_fwd(lam, phi)
        if self.latlong:
            return lam2, phi2, z, t
        X, Y = self.kfwd(lam2, phi2)
        return self.ell.a * X + self.x0, self.ell.a * Y + self.y0, z, t

    def inv(self, x, y, z, t):
        if self.latlong:
            lam2 = np.asarray(x, dtype=np.float64)
            phi2 = np.asarray(y, dtype=np.float64)
        else:
            lam2, phi2 = self.kinv(
                (np.asarray(x, dtype=np.float64) - self.x0) * self.ell.ra,
                (np.asarray(y, dtype=np.float64) - self.y0) * self.ell.ra)
        lam, phi = self._rotate_inv(lam2, phi2)
        return adjlon(lam + self.lam0), phi, z, t


def _interrupted_builder(name: str):
    """goode / igh / igh_o / imoll / imoll_o (kernels/interrupted.py)."""

    from proj_spark.kernels import interrupted as I

    fns = {
        "goode": (I.goode_fwd, I.goode_inv),
        "igh": (I.igh_fwd, I.igh_inv),
        "igh_o": (I.igh_o_fwd, I.igh_o_inv),
        "imoll": (I.imoll_fwd, I.imoll_inv),
        "imoll_o": (I.imoll_o_fwd, I.imoll_o_inv),
    }[name]

    def build(params: dict) -> Step:
        ell = resolve_ellipsoid(params)
        return ProjectionStep(
            fns[0], fns[1], Ellipsoid.sphere(ell.a), _angle(params, "lon_0"),
            float(params.get("x_0", 0.0)), float(params.get("y_0", 0.0)))

    return build


def _build_healpix(params: dict) -> Step:
    from proj_spark.kernels import healpix as H

    ell = resolve_ellipsoid(params)
    rhealpix = params.get("proj") == "rhealpix" or "north_square" in params \
        or "south_square" in params
    name = str(params.get("proj", "healpix"))
    C = H.setup_healpix(
        ell,
        rot_xy=_angle(params, "rot_xy"),
        north_square=int(params.get("north_square", 0)),
        south_square=int(params.get("south_square", 0)))
    if name == "rhealpix":
        fwd = lambda lam, phi: H.rhealpix_fwd(lam, phi, C)
        inv = lambda x, y: H.rhealpix_inv(x, y, C)
    else:
        fwd = lambda lam, phi: H.healpix_fwd(lam, phi, C)
        inv = lambda x, y: H.healpix_inv(x, y, C)
    # ellipsoid variant scales by the AUTHALIC radius (healpix.cpp:568-571)
    return ProjectionStep(
        fwd, inv, Ellipsoid.sphere(C.auth_a), _angle(params, "lon_0"),
        float(params.get("x_0", 0.0)), float(params.get("y_0", 0.0)))


def _build_qsc(params: dict) -> Step:
    from proj_spark.kernels import qsc as Q

    ell = resolve_ellipsoid(params)
    lam0 = _angle(params, "lon_0")
    C = Q.setup_qsc(ell, lam0, _angle(params, "lat_0"))
    return ProjectionStep(
        lambda lam, phi: Q.qsc_fwd(lam, phi, C),
        lambda x, y: Q.qsc_inv(x, y, C),
        ell, lam0,
        float(params.get("x_0", 0.0)), float(params.get("y_0", 0.0)))


def _build_isea(params: dict) -> Step:
    from proj_spark.kernels import isea as I

    ell = resolve_ellipsoid(params)
    C = I.setup_isea(
        ell,
        orient=str(params.get("orient", "isea")),
        lat_0=float(params["lat_0"]) if "lat_0" in params else None,
        lon_0=float(params["lon_0"]) if "lon_0" in params else None,
        azi=float(params.get("azi", 0.0)),
        mode=str(params.get("mode", "plane")),
    )
    # like the reference, isea consumes +lon_0 as an orientation override in
    # setup (isea.cpp:1027-1029) AND the generic fwd_prepare subtraction
    # applies — mirror by passing lam0 through as well
    return ProjectionStep(
        lambda lam, phi: I.isea_fwd(lam, phi, C),
        lambda x, y: I.isea_inv(x, y, C),
        ell, _angle(params, "lon_0"),
        float(params.get("x_0", 0.0)), float(params.get("y_0", 0.0)))


def _som_builder(name: str):
    """Space Oblique Mercator family (kernels/som.py). The ascending
    longitude plays the role of lam0 (subtracted pre-kernel like any
    central meridian, reference som.cpp P->lam0)."""

    from proj_spark.kernels import som as S

    def build(params: dict) -> Step:
        ell = resolve_ellipsoid(params)
        if name == "som":
            C = S.setup_som(
                ell, alf=_angle(params, "inc_angle"),
                p22=float(params.get("ps_rev", 0.0)),
                lam0=_angle(params, "asc_lon"))
        elif name == "lsat":
            C = S.setup_lsat(ell, int(params["lsat"]), int(params["path"]))
        else:
            C = S.setup_misrsom(ell, int(params["path"]))
        return ProjectionStep(
            lambda lam, phi: S.som_fwd(lam, phi, C),
            lambda x, y: S.som_inv(x, y, C),
            ell, C.lam0,
            float(params.get("x_0", 0.0)), float(params.get("y_0", 0.0)))

    return build


def _adams_builder(name: str):
    """guyou / peirce_q / adams_* conformal-square family (kernels/adams.py)."""

    from proj_spark.kernels import adams as A

    def build(params: dict) -> Step:
        ell = resolve_ellipsoid(params)
        C = A.setup_adams(name, params)
        if name == "adams_ws2":
            inv = lambda x, y: A.adams_ws2_inv(x, y, C)
        elif name == "peirce_q" and C.shape == "square":
            inv = lambda x, y: A.peirce_q_square_inv(x, y, C)
        elif name == "peirce_q" and C.shape == "diamond":
            inv = lambda x, y: A.peirce_q_diamond_inv(x, y, C)
        else:
            def inv(x, y):
                raise NotImplementedError(f"{name}: no inverse (reference has none)")
        return ProjectionStep(
            lambda lam, phi: A.adams_fwd(lam, phi, C), inv,
            Ellipsoid.sphere(ell.a), _angle(params, "lon_0"),
            float(params.get("x_0", 0.0)), float(params.get("y_0", 0.0)))

    return build


def _world4_builder(name: str):
    """Builders for the batch-4 catalogue (kernels/world4.py)."""

    from proj_spark.kernels import world4 as W4

    def build(params: dict) -> Step:
        ell = resolve_ellipsoid(params)
        lam0 = _angle(params, "lon_0")
        x0 = float(params.get("x_0", 0.0))
        y0 = float(params.get("y_0", 0.0))
        k0 = float(params.get("k_0", params.get("k", 1.0)))

        def noinv(msg):
            def inv(x, y):
                raise NotImplementedError(msg)
            return inv

        if name in ("eck2", "hatano", "mbt_fps", "mbtfpq"):
            fwd, inv = {
                "eck2": (W4.eck2_fwd, W4.eck2_inv),
                "hatano": (W4.hatano_fwd, W4.hatano_inv),
                "mbt_fps": (W4.mbt_fps_fwd, W4.mbt_fps_inv),
                "mbtfpq": (W4.mbtfpq_fwd, W4.mbtfpq_inv),
            }[name]
            return ProjectionStep(fwd, inv, ell.sphere(ell.a), lam0, x0, y0)
        if name in ("putp6", "putp6p"):
            C = W4.PUTP6 if name == "putp6" else W4.PUTP6P
            return ProjectionStep(
                lambda lam, phi: W4.putp6_fwd(lam, phi, C),
                lambda x, y: W4.putp6_inv(x, y, C),
                ell.sphere(ell.a), lam0, x0, y0)
        if name == "tcea":
            C = W4.TceaConsts(k0, _angle(params, "lat_0"))
            return ProjectionStep(
                lambda lam, phi: W4.tcea_fwd(lam, phi, C),
                lambda x, y: W4.tcea_inv(x, y, C),
                ell.sphere(ell.a), lam0, x0, y0)
        if name == "ccon":
            C = W4.setup_ccon(float(params.get("lat_1", 0.0)))
            return ProjectionStep(
                lambda lam, phi: W4.ccon_fwd(lam, phi, C),
                lambda x, y: W4.ccon_inv(x, y, C),
                ell.sphere(ell.a), lam0, x0, y0)
        if name == "rpoly":
            C = W4.setup_rpoly(float(params.get("lat_ts", 0.0)),
                               float(params.get("lat_0", 0.0)))
            return ProjectionStep(
                lambda lam, phi: W4.rpoly_fwd(lam, phi, C),
                noinv("rpoly: no inverse (reference has none)"),
                ell.sphere(ell.a), lam0, x0, y0)
        if name == "bertin1953":
            # fixed lam0/phi0 (reference bertin1953.cpp:81-87)
            return ProjectionStep(
                W4.bertin1953_fwd,
                noinv("bertin1953: no inverse (reference has none)"),
                ell.sphere(ell.a), 0.0, x0, y0)
        if name == "oea":
            C = W4.setup_oea(float(params["n"]), float(params["m"]),
                             float(params.get("theta", 0.0)),
                             float(params.get("lat_0", 0.0)))
            return ProjectionStep(
                lambda lam, phi: W4.oea_fwd(lam, phi, C),
                lambda x, y: W4.oea_inv(x, y, C),
                ell.sphere(ell.a), lam0, x0, y0)
        if name == "lcca":
            C = W4.setup_lcca(ell, float(params.get("lat_0", 0.0)), k0)
            return ProjectionStep(
                lambda lam, phi: W4.lcca_fwd(lam, phi, C),
                lambda x, y: W4.lcca_inv(x, y, C),
                ell, lam0, x0, y0)
        if name == "gstmerc":
            C = W4.setup_gstmerc(ell, float(params.get("lat_0", 0.0)), k0)
            return ProjectionStep(
                lambda lam, phi: W4.gstmerc_fwd(lam, phi, C),
                lambda x, y: W4.gstmerc_inv(x, y, C),
                ell, lam0, x0, y0)
        if name == "col_urban":
            C = W4.setup_col_urban(ell, float(params.get("lat_0", 0.0)),
                                   float(params.get("h_0", 0.0)))
            return ProjectionStep(
                lambda lam, phi: W4.col_urban_fwd(lam, phi, C),
                lambda x, y: W4.col_urban_inv(x, y, C),
                ell, lam0, x0, y0)
        if name == "labrd":
            C = W4.setup_labrd(ell, float(params.get("lat_0", 0.0)),
                               float(params.get("azi", 0.0)), k0)
            return ProjectionStep(
                lambda lam, phi: W4.labrd_fwd(lam, phi, C),
                lambda x, y: W4.labrd_inv(x, y, C),
                ell, lam0, x0, y0)
        if name == "chamb":
            C = W4.setup_chamb(
                float(params.get("lat_1", 0.0)), float(params.get("lon_1", 0.0)),
                float(params.get("lat_2", 0.0)), float(params.get("lon_2", 0.0)),
                float(params.get("lat_3", 0.0)), float(params.get("lon_3", 0.0)),
                lam0)
            return ProjectionStep(
                lambda lam, phi: W4.chamb_fwd(lam, phi, C),
                noinv("chamb: no inverse (reference has none)"),
                Ellipsoid.sphere(ell.a), lam0, x0, y0)
        if name == "bipc":
            ns = "ns" in params and str(params.get("ns")) not in ("False", "0")
            return ProjectionStep(
                lambda lam, phi: W4.bipc_fwd(lam, phi, ns),
                lambda x, y: W4.bipc_inv(x, y, ns),
                Ellipsoid.sphere(ell.a), lam0, x0, y0)
        if name == "imw_p":
            C = W4.setup_imw_p(
                ell, float(params["lat_1"]), float(params["lat_2"]),
                float(params["lon_1"]) if "lon_1" in params else None)
            return ProjectionStep(
                lambda lam, phi: W4.imw_p_fwd(lam, phi, C),
                lambda x, y: W4.imw_p_inv(x, y, C),
                ell, lam0, x0, y0)
        if name == "rouss":
            C = W4.setup_rouss(ell, float(params.get("lat_0", 0.0)), k0)
            return ProjectionStep(
                lambda lam, phi: W4.rouss_fwd(lam, phi, C),
                lambda x, y: W4.rouss_inv(x, y, C),
                ell, lam0, x0, y0)
        if name in ("mil_os", "lee_os", "gs48", "alsk", "gs50"):
            C = W4.setup_mod_ster(name, ell.es)
            a = C.a if C.a is not None else ell.a
            return ProjectionStep(
                lambda lam, phi: W4.mod_ster_fwd(lam, phi, C),
                lambda x, y: W4.mod_ster_inv(x, y, C),
                Ellipsoid.sphere(a), C.lam0,
                float(params.get("x_0", 0.0)), float(params.get("y_0", 0.0)))
        if name == "nzmg":
            # fixed Earth: intl ellipsoid, lam0=173E, phi0=41S, NZ offsets
            # (reference nzmg.cpp:112-118); user x_0/y_0/lon_0 ignored.
            intl = ELLIPSOIDS["intl"]
            return ProjectionStep(
                W4.nzmg_fwd, W4.nzmg_inv, intl,
                math.radians(173.0), 2510000.0, 6023150.0)
        raise ValueError(name)

    return build


# --------------------------------------------------------------------------
# op registry
# --------------------------------------------------------------------------

def _angle(params: dict, key: str, default: float = 0.0) -> float:
    return math.radians(float(params[key])) if key in params else default


def _build_tmerc(params: dict, exact_default: bool = True) -> Step:
    ell = resolve_ellipsoid(params)
    k0 = float(params.get("k_0", params.get("k", 1.0)))
    lam0 = _angle(params, "lon_0")
    phi0 = _angle(params, "lat_0")
    x0 = float(params.get("x_0", 0.0))
    y0 = float(params.get("y_0", 0.0))
    use_approx = ("approx" in params) or params.get("algo") == "evenden_snyder" or ell.is_sphere
    if use_approx:
        C = k_tmerc.setup_approx(ell, k0=k0, phi0=phi0)
        if ell.is_sphere:
            return ProjectionStep(
                lambda lam, phi: k_tmerc.sph_fwd(lam, phi, C),
                lambda x, y: k_tmerc.sph_inv(x, y, C),
                ell, lam0, x0, y0,
            )
        return ProjectionStep(
            lambda lam, phi: k_tmerc.approx_fwd(lam, phi, C),
            lambda x, y: k_tmerc.approx_inv(x, y, C),
            ell, lam0, x0, y0,
        )
    C = k_tmerc.setup_exact(ell, k0=k0, phi0=phi0)
    return ProjectionStep(
        lambda lam, phi: k_tmerc.exact_fwd(lam, phi, C),
        lambda x, y: k_tmerc.exact_inv(x, y, C),
        ell, lam0, x0, y0,
    )


def _build_utm(params: dict) -> Step:
    ell = resolve_ellipsoid(params)
    if ell.is_sphere:
        raise ValueError("utm requires an ellipsoid")
    if "zone" in params and params["zone"] is not True:
        zone = int(params["zone"])
        p = k_tmerc.utm_params(zone, south="south" in params)
    elif "lon_0" in params:
        lon0 = math.radians(float(params["lon_0"]))
        zone = int(np.clip(math.floor((float(adjlon(np.array([lon0]))[0]) + math.pi) * 30.0 / math.pi), 0, 59)) + 1
        p = k_tmerc.utm_params(zone, south="south" in params)
    else:
        return UTMAutoStep(ell)
    if "approx" in params:
        C = k_tmerc.setup_approx(ell, k0=p["k0"], phi0=p["phi0"])
        return ProjectionStep(
            lambda lam, phi: k_tmerc.approx_fwd(lam, phi, C),
            lambda x, y: k_tmerc.approx_inv(x, y, C),
            ell, p["lam0"], p["x0"], p["y0"],
        )
    C = k_tmerc.setup_exact(ell, k0=p["k0"], phi0=p["phi0"])
    return ProjectionStep(
        lambda lam, phi: k_tmerc.exact_fwd(lam, phi, C),
        lambda x, y: k_tmerc.exact_inv(x, y, C),
        ell, p["lam0"], p["x0"], p["y0"],
    )


def _build_lcc(params: dict) -> Step:
    ell = resolve_ellipsoid(params)
    C = k_lcc.setup_lcc(
        ell,
        lat_1=float(params.get("lat_1", 0.0)),
        lat_2=float(params["lat_2"]) if "lat_2" in params else None,
        lat_0=float(params["lat_0"]) if "lat_0" in params else None,
        k0=float(params.get("k_0", params.get("k", 1.0))),
    )
    return ProjectionStep(
        lambda lam, phi: k_lcc.lcc_fwd(lam, phi, C),
        lambda x, y: k_lcc.lcc_inv(x, y, C),
        ell, _angle(params, "lon_0"),
        float(params.get("x_0", 0.0)), float(params.get("y_0", 0.0)),
    )


def _build_merc(params: dict) -> Step:
    ell = resolve_ellipsoid(params)
    C = k_merc.setup_merc(
        ell,
        lat_ts=float(params["lat_ts"]) if "lat_ts" in params else None,
        k0=float(params.get("k_0", params.get("k", 1.0))),
    )
    return ProjectionStep(
        lambda lam, phi: k_merc.merc_fwd(lam, phi, C),
        lambda x, y: k_merc.merc_inv(x, y, C),
        ell, _angle(params, "lon_0"),
        float(params.get("x_0", 0.0)), float(params.get("y_0", 0.0)),
    )


def _build_webmerc(params: dict) -> Step:
    params = dict(params)
    params.setdefault("ellps", "WGS84")
    if params.get("datum") == "WGS84":
        params["ellps"] = "WGS84"
    ell = resolve_ellipsoid(params)
    C = k_merc.setup_webmerc(ell)
    return ProjectionStep(
        lambda lam, phi: k_merc.merc_fwd(lam, phi, C),
        lambda x, y: k_merc.merc_inv(x, y, C),
        ell, _angle(params, "lon_0"),
        float(params.get("x_0", 0.0)), float(params.get("y_0", 0.0)),
    )


def _proj_step(kmod_fwd, kmod_inv, C, params: dict, ell: Ellipsoid) -> Step:
    return ProjectionStep(
        lambda lam, phi: kmod_fwd(lam, phi, C),
        lambda x, y: kmod_inv(x, y, C),
        ell, _angle(params, "lon_0"),
        float(params.get("x_0", 0.0)), float(params.get("y_0", 0.0)),
        over=bool(params.get("over")),
    )


def _build_aea(params: dict) -> Step:
    from proj_spark.kernels import conic as k

    ell = resolve_ellipsoid(params)
    if params.get("proj") == "leac":
        lat_2 = float(params.get("lat_1", 0.0))
        lat_1 = -90.0 if "south" in params else 90.0
    else:
        lat_1 = float(params.get("lat_1", 0.0))
        lat_2 = float(params.get("lat_2", lat_1))
    C = k.setup_aea(ell, lat_1, lat_2, float(params.get("lat_0", 0.0)))
    return _proj_step(k.aea_fwd, k.aea_inv, C, params, ell)


def _build_eqdc(params: dict) -> Step:
    from proj_spark.kernels import conic as k

    ell = resolve_ellipsoid(params)
    C = k.setup_eqdc(ell, float(params.get("lat_1", 0.0)),
                     float(params.get("lat_2", 0.0)),
                     float(params.get("lat_0", 0.0)))
    return _proj_step(k.eqdc_fwd, k.eqdc_inv, C, params, ell)


def _build_bonne(params: dict) -> Step:
    from proj_spark.kernels import conic as k

    ell = resolve_ellipsoid(params)
    C = k.setup_bonne(ell, float(params["lat_1"]))
    return _proj_step(k.bonne_fwd, k.bonne_inv, C, params, ell)


def _build_stere(params: dict) -> Step:
    from proj_spark.kernels import azimuthal as k

    ell = resolve_ellipsoid(params)
    C = k.setup_stere(
        ell, float(params.get("lat_0", 0.0)),
        float(params["lat_ts"]) if "lat_ts" in params else None,
        float(params.get("k_0", params.get("k", 1.0))),
    )
    return _proj_step(k.stere_fwd, k.stere_inv, C, params, ell)


def _build_ups(params: dict) -> Step:
    from proj_spark.kernels import azimuthal as k

    params = dict(params)
    params.setdefault("x_0", 2000000.0)
    params.setdefault("y_0", 2000000.0)
    ell = resolve_ellipsoid(params)
    if ell.is_sphere:
        raise ValueError("ups requires an ellipsoid")
    C = k.setup_stere(ell, -90.0 if "south" in params else 90.0, None,
                      float(params.get("k_0", 0.994)))
    return _proj_step(k.stere_fwd, k.stere_inv, C, params, ell)


def _build_sterea(params: dict) -> Step:
    from proj_spark.kernels import azimuthal as k

    ell = resolve_ellipsoid(params)
    C = k.setup_sterea(ell, float(params.get("lat_0", 0.0)),
                       float(params.get("k_0", params.get("k", 1.0))))
    return _proj_step(k.sterea_fwd, k.sterea_inv, C, params, ell)


def _build_laea(params: dict) -> Step:
    from proj_spark.kernels import azimuthal as k

    ell = resolve_ellipsoid(params)
    C = k.setup_laea(ell, float(params.get("lat_0", 0.0)))
    return _proj_step(k.laea_fwd, k.laea_inv, C, params, ell)


def _build_gnom(params: dict) -> Step:
    from proj_spark.kernels import azimuthal as k

    ell = resolve_ellipsoid(params)
    C = k.setup_gnom(ell, float(params.get("lat_0", 0.0)))
    return _proj_step(k.gnom_fwd, k.gnom_inv, C, params, ell)


def _build_ortho(params: dict) -> Step:
    from proj_spark.kernels import azimuthal as k

    ell = resolve_ellipsoid(params)
    C = k.setup_ortho(ell, float(params.get("lat_0", 0.0)),
                      float(params.get("k_0", params.get("k", 1.0))),
                      float(params.get("alpha", 0.0)))
    return _proj_step(k.ortho_fwd, k.ortho_inv, C, params, ell)


def _build_aeqd(params: dict) -> Step:
    from proj_spark.kernels import azimuthal as k

    ell = resolve_ellipsoid(params)
    C = k.setup_aeqd(ell, float(params.get("lat_0", 0.0)),
                     guam="guam" in params)
    return _proj_step(k.aeqd_fwd, k.aeqd_inv, C, params, ell)


def _build_cea(params: dict) -> Step:
    from proj_spark.kernels import cyl as k

    ell = resolve_ellipsoid(params)
    C = k.setup_cea(ell, float(params["lat_ts"]) if "lat_ts" in params else None,
                    float(params.get("k_0", params.get("k", 1.0))))
    return _proj_step(k.cea_fwd, k.cea_inv, C, params, ell)


def _build_cass(params: dict) -> Step:
    from proj_spark.kernels import cyl as k

    ell = resolve_ellipsoid(params)
    C = k.setup_cass(ell, float(params.get("lat_0", 0.0)),
                     hyperbolic="hyperbolic" in params)
    return _proj_step(k.cass_fwd, k.cass_inv, C, params, ell)


def _build_eqc(params: dict) -> Step:
    from proj_spark.kernels import cyl as k

    ell = resolve_ellipsoid(params)
    C = k.setup_eqc(float(params.get("lat_ts", 0.0)), float(params.get("lat_0", 0.0)))
    return _proj_step(k.eqc_fwd, k.eqc_inv, C, params, ell)


def _build_mill(params: dict) -> Step:
    from proj_spark.kernels import cyl as k

    ell = resolve_ellipsoid(params)
    return _proj_step(k.mill_fwd, k.mill_inv, None, params, ell)


def _build_somerc(params: dict) -> Step:
    from proj_spark.kernels import cyl as k

    ell = resolve_ellipsoid(params)
    C = k.setup_somerc(ell, float(params.get("lat_0", 0.0)),
                       float(params.get("k_0", params.get("k", 1.0))))
    return _proj_step(k.somerc_fwd, k.somerc_inv, C, params, ell)


def _build_sinu_family(params: dict) -> Step:
    from proj_spark.kernels import pseudocyl as k

    ell = resolve_ellipsoid(params)
    proj = params.get("proj")
    C = k.setup_gn_sinu(
        ell,
        float(params["m"]) if "m" in params else None,
        float(params["n"]) if "n" in params else None,
        proj=proj,
    )
    return _proj_step(k.sinu_fwd, k.sinu_inv, C, params, ell)


def _build_moll_family(params: dict) -> Step:
    from proj_spark.kernels import pseudocyl as k

    ell = resolve_ellipsoid(params)
    C = k.setup_moll(params.get("proj"))
    return _proj_step(k.moll_fwd, k.moll_inv, C, params, ell)


def _build_eck4(params: dict) -> Step:
    from proj_spark.kernels import pseudocyl as k

    ell = resolve_ellipsoid(params)
    return _proj_step(k.eck4_fwd, k.eck4_inv, None, params, ell)


def _build_robin(params: dict) -> Step:
    from proj_spark.kernels import pseudocyl as k

    ell = resolve_ellipsoid(params)
    return _proj_step(k.robin_fwd, k.robin_inv, None, params, ell)


def _world_builder(name: str):
    """Builder factory for the spherical catalogue (kernels/world.py).
    Every op forces es=0 like the reference (radius = a of the given
    ellipsoid), and wires fwd/inv (inv raising where the reference has
    no inverse)."""
    import math as _m

    from proj_spark.kernels import world as W

    def build(params: dict) -> Step:
        ell = resolve_ellipsoid(params)
        C = None
        if name in W._ECK3_FAMILY:
            fwd, inv, C = W.eck3_fwd, W.eck3_inv, W._ECK3_FAMILY[name]
        elif name in W._STS_FAMILY:
            fwd, inv, C = W.sts_fwd, W.sts_inv, W._STS_FAMILY[name]
        elif name in ("putp5", "putp5p"):
            fwd, inv = W.putp5_fwd, W.putp5_inv
            C = W.Putp5Consts(2.0, 1.0) if name == "putp5" else W.Putp5Consts(1.5, 0.5)
        elif name in ("putp3", "putp3p"):
            fwd, inv = W.putp3_fwd, W.putp3_inv
            C = W.Putp3Consts((4.0 if name == "putp3" else 2.0) * 0.1013211836)
        elif name in ("putp4p", "weren"):
            fwd, inv = W.putp4p_fwd, W.putp4p_inv
            C = (W.Putp4pConsts(0.874038744, 3.883251825) if name == "putp4p"
                 else W.Putp4pConsts(1.0, 4.442882938))
        elif name in ("urmfps", "wag1"):
            n = (float(params["n"]) if name == "urmfps"
                 else 0.8660254037844386467637231707)
            if not (0.0 < n <= 1.0):
                raise ValueError("urmfps: n must be in ]0,1]")
            fwd, inv, C = W.urmfps_fwd, W.urmfps_inv, W.NConsts(n, C_y=1.139753528477 / n)
        elif name == "urm5":
            n = float(params["n"])
            q3 = float(params.get("q", 0.0)) / 3.0
            alpha = _m.radians(float(params.get("alpha", 0.0)))
            t = n * _m.sin(alpha)
            m = _m.cos(alpha) / _m.sqrt(1.0 - t * t)
            fwd, inv, C = W.urm5_fwd, W._no_inverse("urm5"), W.NConsts(
                n, m=m, rmn=1.0 / (m * n), q3=q3)
        elif name == "fouc_s":
            n = float(params.get("n", 0.0))
            if not (0.0 <= n <= 1.0):
                raise ValueError("fouc_s: n must be in [0,1]")
            fwd, inv, C = W.fouc_s_fwd, W.fouc_s_inv, W.NConsts(n)
        elif name in ("loxim", "wink1", "wag3"):
            key = "lat_1" if name in ("loxim", "wink1") else "lat_ts"
            phi1 = _m.radians(float(params.get(key, 40.0 if name == "loxim" else 0.0)))
            if name == "wag3":
                c = _m.cos(phi1) / _m.cos(2.0 * phi1 / 3.0)
            else:
                c = _m.cos(phi1)
                if name == "loxim" and c < 1e-8:
                    raise ValueError("loxim: |lat_1| must be < 90")
            fwd = {"loxim": W.loxim_fwd, "wink1": W.wink1_fwd, "wag3": W.wag3_fwd}[name]
            inv = {"loxim": W.loxim_inv, "wink1": W.wink1_inv, "wag3": W.wag3_inv}[name]
            C = W.Phi1Consts(phi1, c, _m.tan(FORTPI_ := _m.pi / 4 + 0.5 * phi1))
        elif name == "wink2":
            phi1 = _m.radians(float(params.get("lat_1", 0.0)))
            fwd, inv, C = W.wink2_fwd, W.wink2_inv, W.Phi1Consts(phi1, _m.cos(phi1))
        elif name == "hammer":
            w = abs(float(params.get("W", 0.5)))
            m0 = abs(float(params.get("M", 1.0)))
            if w <= 0 or m0 <= 0:
                raise ValueError("hammer: W and M must be > 0")
            fwd, inv, C = W.hammer_fwd, W.hammer_inv, W.HammerConsts(w, m0 / w, 1.0 / m0)
        elif name in ("aitoff", "wintri"):
            fwd, inv = W.aitoff_fwd, W.aitoff_inv
            if name == "wintri":
                phi1 = (_m.radians(float(params["lat_1"])) if "lat_1" in params
                        else _m.acos(2.0 / _m.pi))
                C = W.Phi1Consts(phi1, _m.cos(phi1))
        elif name == "vandg":
            fwd, inv, C = W.vandg_fwd, W.vandg_inv, {"over": bool(params.get("over"))}
        else:
            fwd = getattr(W, f"{name}_fwd")
            inv = getattr(W, f"{name}_inv", None) or W._no_inverse(name)
        return ProjectionStep(
            lambda lam, phi: fwd(lam, phi, C),
            lambda x, y: inv(x, y, C),
            ell, _angle(params, "lon_0"),
            float(params.get("x_0", 0.0)), float(params.get("y_0", 0.0)),
            over=bool(params.get("over")),
        )

    return build


def _world2_builder(name: str):
    import math as _m

    from proj_spark.kernels import world as W
    from proj_spark.kernels import world2 as W2

    def build(params: dict) -> Step:
        ell = resolve_ellipsoid(params)
        if name == "airy":
            # +lat_b defaults to 0 (beta = pi/4 -> Cb = log(cos pi/4)),
            # matching pj_param's zero default in the reference
            C = W2.setup_airy(float(params.get("lat_0", 0.0)),
                              float(params.get("lat_b", 0.0)),
                              bool(params.get("no_cut")))
            fwd, inv = W2.airy_fwd, W._no_inverse("airy")
        elif name in ("nsper", "tpers"):
            C = W2.setup_nsper(
                ell.a, float(params.get("lat_0", 0.0)), float(params["h"]),
                tilt=float(params.get("tilt", 0.0)) if name == "tpers" else None,
                azi=float(params.get("azi", 0.0)) if name == "tpers" else None,
            )
            fwd, inv = W2.nsper_fwd, W2.nsper_inv
        elif name == "lagrng":
            C = W2.setup_lagrng(float(params.get("W", 2.0)),
                                float(params.get("lat_1", 0.0)))
            fwd, inv = W2.lagrng_fwd, W2.lagrng_inv
        elif name in ("vandg2", "vandg3"):
            C = {"vdg3": name == "vandg3"}
            fwd, inv = W2.vandg2_fwd, W._no_inverse(name)
        elif name == "vandg4":
            C, fwd, inv = None, W2.vandg4_fwd, W._no_inverse(name)
        elif name == "times":
            C, fwd, inv = None, W2.times_fwd, W2.times_inv
        elif name in ("bacon", "apian", "ortel"):
            C = {"bacn": name == "bacon", "ortl": name == "ortel"}
            fwd, inv = W2.bacon_fwd, W._no_inverse(name)
        elif name == "tobmerc":
            C = float(params.get("k_0", params.get("k", 1.0)))
            fwd, inv = W2.tobmerc_fwd, W2.tobmerc_inv
        elif name == "eqearth":
            C = W2.setup_eqearth(ell)
            fwd, inv = W2.eqearth_fwd, W2.eqearth_inv
        else:  # natearth natearth2 patterson comill
            C = None
            fwd = getattr(W2, f"{name}_fwd")
            inv = getattr(W2, f"{name}_inv")
        return ProjectionStep(
            lambda lam, phi: fwd(lam, phi, C),
            lambda x, y: inv(x, y, C),
            ell, _angle(params, "lon_0"),
            float(params.get("x_0", 0.0)), float(params.get("y_0", 0.0)),
            over=bool(params.get("over")),
        )

    return build


_WORLD2_OPS = ("airy nsper tpers lagrng vandg2 vandg3 vandg4 times bacon "
               "apian ortel tobmerc eqearth natearth natearth2 patterson "
               "comill").split()


def _world3_builder(name: str):
    def build(params: dict) -> Step:
        from proj_spark.kernels import world3 as W3

        ell = resolve_ellipsoid(params)
        if name in ("euler", "murd1", "murd2", "murd3", "pconic", "tissot", "vitk1"):
            if "lat_1" not in params or "lat_2" not in params:
                raise ValueError(f"{name}: lat_1 and lat_2 required")
            C = W3.setup_sconics(name, float(params["lat_1"]), float(params["lat_2"]),
                                 float(params.get("lat_0", 0.0)))
            fwd, inv = W3.sconics_fwd, W3.sconics_inv
        elif name == "calcofi":
            C = W3.CalcofiConsts(ell.e, ell.es)
            fwd, inv = W3.calcofi_fwd, W3.calcofi_inv
        elif name == "tpeqd":
            C = W3.setup_tpeqd(float(params.get("lat_1", 0.0)), float(params.get("lon_1", 0.0)),
                               float(params.get("lat_2", 0.0)), float(params.get("lon_2", 0.0)))
            fwd, inv = W3.tpeqd_fwd, W3.tpeqd_inv
        else:  # poly
            C = W3.setup_poly(ell, float(params.get("lat_0", 0.0)))
            fwd, inv = W3.poly_fwd, W3.poly_inv
        if name == "tpeqd":
            lam0 = C.lam0
        elif name == "calcofi":
            lam0 = 0.0  # reference works in absolute longitude (lon_0 ignored)
        else:
            lam0 = _angle(params, "lon_0")
        x0 = 0.0 if name == "calcofi" else float(params.get("x_0", 0.0))
        y0 = 0.0 if name == "calcofi" else float(params.get("y_0", 0.0))
        step = ProjectionStep(
            lambda lam, phi: fwd(lam, phi, C),
            lambda x, y: inv(x, y, C),
            ell, lam0, x0, y0,
            over=bool(params.get("over")),
        )
        if name == "calcofi":  # line/station units: no earth-radius scaling
            step.a = 1.0
            step.ra = 1.0
        return step

    return build


def _build_omerc(params: dict) -> Step:
    from proj_spark.kernels import oblique as OB

    ell = resolve_ellipsoid(params)
    C = OB.setup_omerc(ell, params, float(params.get("k_0", params.get("k", 1.0))))
    return ProjectionStep(
        lambda lam, phi: OB.omerc_fwd(lam, phi, C),
        lambda x, y: OB.omerc_inv(x, y, C),
        ell, C.lam0,  # lam0 computed by the setup, +lon_0 intentionally ignored
        float(params.get("x_0", 0.0)), float(params.get("y_0", 0.0)),
        over=bool(params.get("over")),
    )


def _build_ocea(params: dict) -> Step:
    from proj_spark.kernels import oblique as OB

    ell = resolve_ellipsoid(params)
    C = OB.setup_ocea(params, float(params.get("k_0", params.get("k", 1.0))))
    return ProjectionStep(
        lambda lam, phi: OB.ocea_fwd(lam, phi, C),
        lambda x, y: OB.ocea_inv(x, y, C),
        ell, C.lam0,
        float(params.get("x_0", 0.0)), float(params.get("y_0", 0.0)),
    )


def _build_krovak(params: dict) -> Step:
    from proj_spark.kernels import oblique as OB

    C = OB.setup_krovak(params, modified=params.get("proj") == "mod_krovak")
    # krovak pins the Bessel ellipsoid regardless of +ellps
    ell = Ellipsoid("bessel-krovak", C.a, 1.0 / (1.0 - math.sqrt(1.0 - 0.006674372230614)))
    return ProjectionStep(
        lambda lam, phi: OB.krovak_fwd(lam, phi, C),
        lambda x, y: OB.krovak_inv(x, y, C),
        ell, C.lam0,
        float(params.get("x_0", 0.0)), float(params.get("y_0", 0.0)),
    )


def _build_geos(params: dict) -> Step:
    from proj_spark.kernels import oblique as OB

    ell = resolve_ellipsoid(params)
    C = OB.setup_geos(ell, float(params["h"]), str(params.get("sweep", "y")))
    return _proj_step(OB.geos_fwd, OB.geos_inv, C, params, ell)


_WORLD_OPS = (
    "larr gins8 wag7 tcc august cc denoy eck1 crast lask eck5 fahey wag2 "
    "gall boggs nell nell_h collg putp2 mbtfpp eck3 kav7 wag6 putp1 fouc "
    "kav5 qua_aut mbt_s putp5 putp5p putp3 putp3p putp4p weren urmfps wag1 "
    "urm5 fouc_s loxim wink1 wag3 wink2 hammer aitoff wintri vandg nicol"
).split()


_BUILDERS = {
    "tmerc": _build_tmerc,
    "etmerc": _build_tmerc,
    "utm": _build_utm,
    "lcc": _build_lcc,
    "merc": _build_merc,
    "webmerc": _build_webmerc,
    "aea": _build_aea,
    "leac": _build_aea,
    "eqdc": _build_eqdc,
    "bonne": _build_bonne,
    "stere": _build_stere,
    "ups": _build_ups,
    "sterea": _build_sterea,
    "laea": _build_laea,
    "gnom": _build_gnom,
    "ortho": _build_ortho,
    "aeqd": _build_aeqd,
    "cea": _build_cea,
    "cass": _build_cass,
    "eqc": _build_eqc,
    "mill": _build_mill,
    "somerc": _build_somerc,
    "sinu": _build_sinu_family,
    "gn_sinu": _build_sinu_family,
    "eck6": _build_sinu_family,
    "mbtfps": _build_sinu_family,
    "moll": _build_moll_family,
    "wag4": _build_moll_family,
    "wag5": _build_moll_family,
    "eck4": _build_eck4,
    "robin": _build_robin,
    **{op: _world_builder(op) for op in _WORLD_OPS},
    **{op: _world2_builder(op) for op in _WORLD2_OPS},
    **{op: _world3_builder(op) for op in
       "euler murd1 murd2 murd3 pconic tissot vitk1 calcofi tpeqd poly".split()},
    "omerc": _build_omerc,
    "ocea": _build_ocea,
    "krovak": _build_krovak,
    "mod_krovak": _build_krovak,
    "geos": _build_geos,
    **{op: _world4_builder(op) for op in
       "eck2 hatano putp6 putp6p mbt_fps mbtfpq tcea ccon rpoly bertin1953 "
       "oea lcca gstmerc col_urban nzmg mil_os lee_os gs48 alsk gs50 "
       "rouss imw_p bipc chamb labrd".split()},
    **{op: _interrupted_builder(op) for op in
       "goode igh igh_o imoll imoll_o".split()},
    **{op: _adams_builder(op) for op in
       "guyou peirce_q adams_hemi adams_ws1 adams_ws2".split()},
    "ob_tran": ObTranStep,
    **{op: _som_builder(op) for op in "som lsat misrsom".split()},
    "qsc": _build_qsc,
    "isea": _build_isea,
    "healpix": _build_healpix,
    "rhealpix": _build_healpix,
    "geoc": lambda p: GeocStep(resolve_ellipsoid(p)),
    "sch": SchStep,
    "s2": S2Step,
    "gridshift": GridshiftStep,
    "xyzgridshift": XyzgridshiftStep,
    "deformation": DeformationStep,
    "tinshift": TinshiftStep,
    "defmodel": DefmodelStep,
    "horner": HornerStep,
    "vertoffset": VertoffsetStep,
    "topocentric": TopocentricStep,
    "molobadekas": lambda p: HelmertStep(k_helmert.from_params(p)),
    "cart": lambda p: CartStep(resolve_ellipsoid(p)),
    "geocent": lambda p: CartStep(resolve_ellipsoid(p)),
    "helmert": lambda p: HelmertStep(k_helmert.from_params(p)),
    "molodensky": MolodenskyStep,
    "hgridshift": HgridshiftStep,
    "vgridshift": VgridshiftStep,
    "axisswap": lambda p: AxisswapStep(_axisswap_order(p)),
    "unitconvert": lambda p: UnitconvertStep(p),
    "affine": AffineStep,
    "geogoffset": GeogoffsetStep,
    "set": SetStep,
    "push": PushStep,
    "pop": PopStep,
    "noop": lambda p: NoopStep(),
    "longlat": lambda p: _build_latlong(p),
    "latlong": lambda p: _build_latlong(p),
    "lonlat": lambda p: LatlongStep(),
    "latlon": lambda p: LatlongStep(),
}


# Prime meridians (reference src/datums.cpp pj_prime_meridians — public
# astronomical constants), stored as from_greenwich in degrees (west < 0).
_PRIME_MERIDIANS = {
    "greenwich": 0.0,
    "lisbon": -(9 + 7 / 60 + 54.862 / 3600),
    "paris": 2 + 20 / 60 + 14.025 / 3600,
    "bogota": -(74 + 4 / 60 + 51.3 / 3600),
    "madrid": -(3 + 41 / 60 + 16.58 / 3600),
    "rome": 12 + 27 / 60 + 8.4 / 3600,
    "bern": 7 + 26 / 60 + 22.5 / 3600,
    "jakarta": 106 + 48 / 60 + 27.79 / 3600,
    "ferro": -(17 + 40 / 60),
    "brussels": 4 + 22 / 60 + 4.71 / 3600,
    "stockholm": 18 + 3 / 60 + 29.8 / 3600,
    "athens": 23 + 42 / 60 + 58.815 / 3600,
    "oslo": 10 + 43 / 60 + 22.5 / 3600,
}


class PmLatlongStep(Step):
    """latlong on a non-Greenwich prime meridian: the CRS's longitudes
    are PM-relative, the pipeline's neutral frame is Greenwich (proj4
    pj_transform from_greenwich semantics): fwd Greenwich -> local
    subtracts pm, inv adds it back."""

    left = "rad"
    right = "rad"

    def __init__(self, pm_rad: float):
        self.pm = pm_rad

    def fwd(self, x, y, z, t):
        return x - self.pm, y, z, t

    def inv(self, x, y, z, t):
        return x + self.pm, y, z, t


def _build_latlong(params: dict) -> Step:
    pm = _pm_offset_rad(params)
    if "geoc" in params:
        step: Step = GeocLatlongStep(resolve_ellipsoid(params))
        if pm != 0.0:
            # pm and geoc compose (lon shift vs lat conversion are
            # independent lanes; reference fwd_prepare applies both)
            step = _PmWrap(step, pm)
        return step
    if pm != 0.0:
        return PmLatlongStep(pm)
    return LatlongStep()


class _PmWrap(Step):
    """Prime-meridian shift composed around an angular<->angular step
    (PmLatlongStep semantics: fwd Greenwich -> local subtracts pm on
    the longitude lane, inv adds it back)."""

    left = "rad"
    right = "rad"

    def __init__(self, base: Step, pm_rad: float):
        self.base = base
        self.pm = pm_rad

    def fwd(self, x, y, z, t):
        x, y, z, t = self.base.fwd(x, y, z, t)
        return x - self.pm, y, z, t

    def inv(self, x, y, z, t):
        return self.base.inv(x + self.pm, y, z, t)


def _pm_offset_rad(params: dict) -> float:
    pm = params.get("pm")
    if pm in (None, True):
        return 0.0
    if pm in _PRIME_MERIDIANS:
        return math.radians(_PRIME_MERIDIANS[pm])
    return math.radians(float(pm))


_LEGACY_INIT_DIRS = [
    # deployed data dir (PROJ_DATA analogue; see sources/epsg.py)
    *([os.path.join(os.environ["PROJ_SPARK_DATA"], "init"),
       os.environ["PROJ_SPARK_DATA"]]
      if os.environ.get("PROJ_SPARK_DATA") else []),
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "tests", "fixtures", "init"),
    "/root/reference/data",
]


def _legacy_init_spec(fname: str, code: str) -> str:
    """Classic proj4 init files (nad27/nad83/GL27/world/...): sections
    `<code> tokens... <>` (reference src/init.cpp pj_init_ctx section
    scan). Returns the section's tokens as a proj-string."""
    if not re.fullmatch(r"[A-Za-z0-9_.]+", fname):
        raise NotImplementedError(f"unsupported +init={fname}:{code}")
    path = None
    for d in _LEGACY_INIT_DIRS:
        cand = os.path.join(d, fname)
        if os.path.exists(cand):
            path = cand
            break
    if path is None:
        raise NotImplementedError(f"unsupported +init={fname}:{code}")
    toks: list[str] = []
    collecting = False
    with open(path, errors="replace") as f:
        for line in f:
            line = line.split("#", 1)[0]
            if not collecting:
                i = line.find(f"<{code}>")
                if i < 0:
                    continue
                collecting = True
                line = line[i + len(code) + 2:]
            if "<>" in line:
                toks.extend(line.split("<>", 1)[0].split())
                return " ".join(t for t in toks if t != "no_defs")
            toks.extend(line.split())
    raise NotImplementedError(f"+init={fname}:{code}: code not found")


# minimal +init registry: public EPSG definitions for the codes the test
# corpus exercises (a full EPSG database is out of scope per SURVEY §1.3)
_INIT_DEFS = {
    "epsg:4326": "+proj=longlat +ellps=WGS84",
    "epsg:25832": "+proj=utm +zone=32 +ellps=GRS80 +towgs84=0,0,0 +units=m",
    "epsg:25833": "+proj=utm +zone=33 +ellps=GRS80 +towgs84=0,0,0 +units=m",
    "epsg:26915": "+proj=utm +zone=15 +ellps=GRS80 +towgs84=0,0,0 +units=m",
    "epsg:3857": "+proj=webmerc +ellps=WGS84",
    "epsg:32632": "+proj=utm +zone=32 +ellps=WGS84 +units=m",
}


def _build_step(params: dict) -> Step:
    if "init" in params and params.get("init") is not True:
        init = str(params["init"]).lower()
        if init in _INIT_DEFS:
            spec = _INIT_DEFS[init]
        elif init.startswith("epsg:"):
            # full EPSG registry resolution (sources/epsg.py) from the
            # reference's public SQL data, proj4-init-rules semantics
            from proj_spark.sources.epsg import epsg_to_proj
            spec = epsg_to_proj(init.split(":", 1)[1])
        elif ":" in init:
            spec = _legacy_init_spec(*init.split(":", 1))
        else:
            raise NotImplementedError(f"unsupported +init={init}")
        base = parse_params(tokenize(spec))
        # explicit params override the init definition (pj_init semantics)
        params = {**base, **{k: v for k, v in params.items() if k != "init"}}
    name = params.get("proj")
    if name not in _BUILDERS:
        raise NotImplementedError(f"unsupported operation +proj={name}")
    if "datum" in params and params["datum"] is not True:
        try:
            ell_name, extra = _DATUM_DEFS[str(params["datum"])]
        except KeyError:
            raise ValueError(f"unknown datum {params['datum']!r}") from None
        params = {**params}
        params.setdefault("ellps", ell_name)
        for k, v in extra.items():
            params.setdefault(k, v)
    step = _BUILDERS[name](params)
    # cs2cs-emulation datum hooks apply to angular-input coordinate ops
    # (reference fwd.cpp fwd_prepare), not to transform primitives that
    # consume these params themselves
    if (("towgs84" in params or "nadgrids" in params
         or "geoidgrids" in params)
            and name not in ("helmert", "molobadekas", "hgridshift",
                             "vgridshift", "gridshift", "molodensky")
            and step.left == "rad"):
        wrap = DatumShiftWrap(step, params, resolve_ellipsoid(params))
        if wrap.active:
            step = wrap
    if "pm" in params and isinstance(step, ProjectionStep):
        step.pm = _pm_offset_rad(params)
    # generic +geoc on an angular-INPUT operation (reference fwd.cpp:79-81
    # fwd_prepare / inv.cpp:138-140 inv_finalize: the operation's angular
    # side carries GEOCENTRIC latitude; the core always sees geodetic).
    # Applied OUTSIDE the datum wrap and AFTER the pm assignment: the
    # geoc conversion is closest to the raw angular input (the reference
    # converts geocentric->geodetic before any datum machinery), and pm
    # rides inside the projection step it belongs to. latlong handles
    # geoc itself, and +proj=geoc IS the conversion.
    if ("geoc" in params and name not in ("longlat", "latlong", "geoc")
            and step.left == "rad"):
        step = _GeocIOWrap(step, resolve_ellipsoid(params))
    to_meter = None
    if "to_meter" in params:
        to_meter = float(params["to_meter"])
    elif params.get("units") not in (None, "m", True):
        to_meter = _LINEAR_UNITS[params["units"]]
    if step.right == "m":
        # output unit scaling: fwd_finalize's fr_meter (reference
        # src/fwd.cpp:137) — composes OUTSIDE any datum wrap (prepare
        # shifts the angular side, finalize scales the projected side)
        if to_meter is not None and to_meter != 1.0:
            step = _OutputScaled(step, 1.0 / to_meter)
    elif isinstance(step, CartStep) and to_meter not in (None, 1.0):
        # geocent/cart: fr_meter scales all three axes
        # (fwd_finalize PJ_IO_UNITS_CARTESIAN case)
        step = _CartScaled(step, 1.0 / to_meter)
    # vertical unit scaling (+vto_meter / +vunits; fwd_finalize vfr_meter)
    vto = None
    if "vto_meter" in params:
        vto = float(params["vto_meter"])
    elif params.get("vunits") not in (None, "m", True):
        vto = _LINEAR_UNITS[params["vunits"]]
    if vto is not None and vto != 1.0 and not isinstance(step, CartStep):
        step = _VertScaled(step, 1.0 / vto)
    # generic output axis spec (+axis=enu-style; pj_adjust_axis semantics)
    if ("axis" in params and name != "axisswap"
            and str(params["axis"]) != "enu"):
        step = _AxisWrap(step, AxisswapStep(_axisswap_order(
            {"axis": params["axis"]})))
    if params.get("inv"):
        step = Inverted(step)
    return step


class _CartScaled(Step):
    """Non-metric geocentric output: x/y/z all scaled (fwd_finalize's
    cartesian fr_meter path)."""

    left = "rad"
    right = "cart"

    def __init__(self, base: Step, fr_meter: float):
        self.base = base
        self.fr = fr_meter

    def fwd(self, x, y, z, t):
        x, y, z, t = self.base.fwd(x, y, z, t)
        return (x * self.fr, y * self.fr,
                z * self.fr if z is not None else z, t)

    def inv(self, x, y, z, t):
        return self.base.inv(
            x / self.fr, y / self.fr,
            z / self.fr if z is not None else z, t)


class _VertScaled(Step):
    """Vertical unit conversion on the projected/angular output side
    (+vto_meter / +vunits; reference fwd_finalize vfr_meter)."""

    def __init__(self, base: Step, vfr_meter: float):
        self.base = base
        self.vfr = vfr_meter
        self.left = base.left
        self.right = base.right

    def fwd(self, x, y, z, t):
        x, y, z, t = self.base.fwd(x, y, z, t)
        return x, y, (z * self.vfr if z is not None else z), t

    def inv(self, x, y, z, t):
        return self.base.inv(
            x, y, (z / self.vfr if z is not None else z), t)


class _GeocIOWrap(Step):
    """Generic +geoc on an angular-input operation: the operation's
    angular side carries geocentric latitude (reference fwd.cpp:79-81:
    fwd converts input geocentric->geodetic before the core;
    inv.cpp:138-140: inv converts the core's geodetic output back to
    geocentric). tan(theta) = (1-es) tan(phi)."""

    left = "rad"

    def __init__(self, base: Step, ell: Ellipsoid):
        self.base = base
        self.one_es = ell.one_es
        self.right = base.right

    def fwd(self, x, y, z, t):
        phi = np.arctan(np.tan(np.asarray(y, dtype=np.float64))
                        / self.one_es)
        return self.base.fwd(x, phi, z, t)

    def inv(self, x, y, z, t):
        x, y, z, t = self.base.inv(x, y, z, t)
        return x, np.arctan(
            self.one_es * np.tan(np.asarray(y, dtype=np.float64))), z, t


class _AxisWrap(Step):
    """Output-side axis reordering for a coordinate operation with a
    global +axis spec (reference pj_adjust_axis applied in
    fwd_finalize/inv_prepare)."""

    def __init__(self, base: Step, ax: "AxisswapStep"):
        self.base = base
        self.ax = ax
        self.left = base.left
        self.right = base.right

    def fwd(self, x, y, z, t):
        x, y, z, t = self.base.fwd(x, y, z, t)
        return self.ax.fwd(x, y, z, t)

    def inv(self, x, y, z, t):
        x, y, z, t = self.ax.inv(x, y, z, t)
        return self.base.inv(x, y, z, t)


class _OutputScaled(Step):
    """Wraps a projection whose output units are not metres (+to_meter/+units)."""

    left = "rad"
    right = "m"

    def __init__(self, base: Step, fr_meter: float):
        self.base = base
        self.fr = fr_meter

    def fwd(self, x, y, z, t):
        x, y, z, t = self.base.fwd(x, y, z, t)
        return x * self.fr, y * self.fr, z, t

    def inv(self, x, y, z, t):
        x = np.asarray(x, dtype=np.float64) / self.fr
        y = np.asarray(y, dtype=np.float64) / self.fr
        return self.base.inv(x, y, z, t)


# --------------------------------------------------------------------------
# pipeline
# --------------------------------------------------------------------------

@dataclass
class Pipeline:
    steps: list[Step]
    spec: str

    @property
    def left(self) -> str:
        for s in self.steps:
            if s.left != "whatever":
                return s.left
        return "whatever"

    @property
    def right(self) -> str:
        for s in reversed(self.steps):
            if s.right != "whatever":
                return s.right
        return "whatever"

    def _bind_stacks(self):
        """push/pop steps share one 4-lane stack per execution
        (reference src/pipeline.cpp:139)."""
        stacks = None
        for s in self.steps:
            if isinstance(s, (PushStep, PopStep)):
                if stacks is None:
                    stacks = {1: [], 2: [], 3: [], 4: []}
                s.stack = stacks

    def fwd(self, x, y, z=None, t=None):
        self._bind_stacks()
        for s in self.steps:
            x, y, z, t = s.fwd(x, y, z, t)
        return x, y, z, t

    def inv(self, x, y, z=None, t=None):
        self._bind_stacks()
        for s in reversed(self.steps):
            x, y, z, t = s.inv(x, y, z, t)
        return x, y, z, t

    # degree-friendly entry points (what the Spark UDF factory uses)
    def fwd_deg(self, lon_deg, lat_deg, z=None, t=None):
        x = np.asarray(lon_deg, dtype=np.float64)
        y = np.asarray(lat_deg, dtype=np.float64)
        if self.left == "rad":
            x = x * DEG2RAD
            y = y * DEG2RAD
        x, y, z, t = self.fwd(x, y, z, t)
        if self.right == "rad":
            x = x * RAD2DEG
            y = y * RAD2DEG
        return x, y, z, t

    def inv_deg(self, x, y, z=None, t=None):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        if self.right == "rad":
            x = x * DEG2RAD
            y = y * DEG2RAD
        x, y, z, t = self.inv(x, y, z, t)
        if self.left == "rad":
            x = x * RAD2DEG
            y = y * RAD2DEG
        return x, y, z, t


def _parse_urn(urn: str) -> tuple[str, str, str]:
    """urn:ogc:def:<objectType>:<authority>:<version>:<code> (OGC 07-092r1;
    reference io.cpp createFromURNPart). Version is usually empty ('::')."""
    parts = urn.split(":")
    if len(parts) < 7 or parts[0].lower() != "urn" or \
            parts[1].lower() != "ogc" or parts[2].lower() != "def":
        raise ValueError(f"not an OGC URN: {urn!r}")
    return parts[3].lower(), parts[4], ":".join(parts[6:])


def _urn_crs_spec(auth: str, code: str) -> str:
    from proj_spark.sources.epsg import epsg_to_proj

    if auth.upper() in ("EPSG", "NKG", "IGNF"):
        # IGNF codes live in the same bundled tables (ignf.sql), keyed by
        # their alphanumeric codes — the EPSG resolver serves them
        return epsg_to_proj(code)
    if auth.upper() in ("IAU_2015", "IAU"):
        # IAU codes are authority-qualified in the registry (they reuse
        # small numerics that collide with EPSG codes in every table)
        return epsg_to_proj(f"IAU_2015:{code}")
    from proj_spark.sources.esri import esri_to_proj

    if auth.upper() == "ESRI":
        return esri_to_proj(f"ESRI:{code}")
    raise NotImplementedError(f"URN authority {auth!r} not bundled")


def compile_crs_to_crs(src: str, dst: str) -> Pipeline:
    """proj_create_crs_to_crs analogue for the supported CRS grammar
    (proj-strings, +init codes from the minimal registry, and +datum
    names): a two-step pipeline running the source op INVERSE to WGS84
    geodetic (datum hooks included via DatumShiftWrap) then the target
    op FORWARD (reference src/4D_api.cpp proj_create_crs_to_crs ->
    pipeline of inverse(src) + forward(dst))."""

    def as_spec(c: str) -> str:
        c = c.strip()
        if c.lower().startswith("urn:"):
            kind, auth, code = _parse_urn(c)
            if kind == "coordinatemetadata":
                # CRS + coordinate epoch (reference nrcan.sql URNs)
                from proj_spark.sources.epsg import coordinate_metadata
                return coordinate_metadata(code)[0]
            if kind != "crs":
                raise ValueError(f"crs_to_crs: URN is not a CRS: {c!r}")
            if auth.upper() == "EPSG":
                return f"+init=epsg:{code}"
            return _urn_crs_spec(auth, code)
        if c.upper().startswith("EPSG:"):
            return f"+init={c.lower()}"
        if c.upper().startswith("ESRI:"):
            from proj_spark.sources.esri import esri_to_proj
            return esri_to_proj(c)
        if c.upper().startswith("IGNF:"):
            from proj_spark.sources.epsg import epsg_to_proj
            return epsg_to_proj(c.split(":", 1)[1])
        if c.upper().startswith(("IAU_2015:", "IAU:")):
            from proj_spark.sources.epsg import epsg_to_proj
            return epsg_to_proj("IAU_2015:" + c.split(":", 1)[1])
        if c.upper().startswith("NRCAN:"):
            # coordinate_metadata: a CRS + coordinate epoch; the CRS part
            # is the pipeline endpoint, the epoch rides on the t lane
            # (callers pass it; see sources.epsg.coordinate_metadata)
            from proj_spark.sources.epsg import coordinate_metadata
            return coordinate_metadata(c)[0]
        from proj_spark.sources.wkt import is_wkt, wkt_to_proj
        if is_wkt(c):
            return wkt_to_proj(c)
        from proj_spark.sources.projjson import is_projjson, projjson_to_proj
        if is_projjson(c):
            return projjson_to_proj(c)
        if "+" in c or "=" in c or c.startswith("proj="):
            return c
        raise ValueError(f"crs_to_crs: unsupported CRS {c!r}")

    def build_side(spec: str):
        """(step, geoc_ellipsoid | None): +geoc on a CRS spec means the
        CRS's ANGULAR coordinates carry geocentric latitude (reference
        PROJStringParser: spherical-planetocentric base). The conversion
        is a separate role-directed pipeline step (reference
        test_operationfactory createOperation_spherical_ocentric_*:
        source → '+inv +proj=geoc' before anything else; target →
        '+proj=geoc' last; a PROJECTED CRS over an ocentric base gets NO
        geoc step — its cartesian coords relate to geodetic latitude
        through the conversion alone)."""
        params = parse_params(tokenize(spec))
        geoc_ell = None
        if "geoc" in params and params.get("proj") != "geoc":
            geoc_ell = resolve_ellipsoid(params)
            params = {k: v for k, v in params.items() if k != "geoc"}
        step = _build_step(params)
        if geoc_ell is not None and step.right != "rad":
            geoc_ell = None     # projected/geocentric CRS: no geoc step
        return step, geoc_ell, resolve_ellipsoid(params).a

    s1, g1, a1 = build_side(as_spec(src))
    s2, g2, a2 = build_side(as_spec(dst))
    if abs(a1 - a2) > 0.007 * a2:
        # different celestial bodies (reference
        # coordinateoperationfactory.cpp:4459 createOperationsGeodToGeod:
        # semi-major axes differing by more than
        # REL_ERROR_FOR_SAME_CELESTIAL_BODY = 0.007 relative means the
        # ellipsoids cannot belong to the same body; same env override)
        env = os.environ.get("PROJ_IGNORE_CELESTIAL_BODY")
        if env is None or env.upper() in ("NO", "FALSE", "OFF"):
            from proj_spark.sources.epsg import guess_body_name
            msg = ("Source and target ellipsoid do not belong to the same "
                   f"celestial body ({guess_body_name(a1)} vs "
                   f"{guess_body_name(a2)}).")
            if env is None:
                msg += (" You may override this check by setting the "
                        "PROJ_IGNORE_CELESTIAL_BODY environment variable "
                        "to YES.")
            raise ValueError(msg)
    steps: list = []
    if g1 is not None:
        steps.append(Inverted(GeocStep(g1)))    # geocentric -> geodetic
    steps.append(Inverted(s1))
    steps.append(s2)
    if g2 is not None:
        steps.append(GeocStep(g2))              # geodetic -> geocentric
    return Pipeline(steps, f"{src} -> {dst}")


def compile_pipeline(spec: str) -> Pipeline:
    """Compile a proj-string (single op or +proj=pipeline) into a Pipeline.

    Also accepts OGC URNs (reference io.cpp createFromUserInput):
    ``urn:ogc:def:coordinateOperation:AUTH::CODE`` resolves the registry
    operation by code and compiles it in its published domain;
    ``urn:ogc:def:crs:AUTH::CODE`` compiles the CRS's proj-string."""
    if spec.lstrip().lower().startswith("urn:"):
        kind, auth, code = _parse_urn(spec.strip())
        if kind == "coordinateoperation":
            from proj_spark.sources.epsg_ops import operation_by_urn

            spec, _op = operation_by_urn(code)
        else:
            spec = _urn_crs_spec(auth, code)
    tokens = tokenize(spec)
    # split into [global] step [step ...] on the bare "step" sentinel
    groups: list[list[str]] = [[]]
    for tok in tokens:
        if tok.lstrip("+") == "step":
            groups.append([])
        else:
            groups[-1].append(tok)

    head = parse_params(groups[0])
    if head.get("proj") != "pipeline":
        if len(groups) > 1:
            # "+step +proj=..." with no pipeline head: gie accepts a single
            # bare step as a one-step pipeline (more_builtins.gie:535)
            if not head and len(groups) == 2:
                return Pipeline([_build_step(parse_params(groups[1]))], spec)
            raise ValueError("step without proj=pipeline")
        return Pipeline([_build_step(head)], spec)

    # a global +inv on the pipeline itself inverts the whole pipeline
    # (run steps right-to-left, each in its opposite direction) — distinct
    # from a per-step inv flag (reference src/pipeline.cpp direction logic)
    glob_inv = bool(head.get("inv"))
    glob = {k: v for k, v in head.items() if k not in ("proj", "inv")}
    steps = []
    for g in groups[1:]:
        p = parse_params(g)
        merged = {**glob, **p}
        built = _build_step(merged)
        if merged.get("omit_fwd") or merged.get("omit_inv"):
            built = OmitStep(built, bool(merged.get("omit_fwd")),
                             bool(merged.get("omit_inv")))
        steps.append(built)
    if not steps:
        raise ValueError("pipeline with no steps")
    if glob_inv:
        steps = [Inverted(s) for s in reversed(steps)]
    return Pipeline(steps, spec)
