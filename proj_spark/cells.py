"""S2-style cell encoding + web-mercator slippy tiles, vectorized in numpy.

The cube-face projection (lon/lat -> face, u, v -> s, t with the quadratic
UV<->ST map) reproduces the reference's +proj=s2 semantics
(/root/reference/src/projections/s2.cpp — face selection :109-112, quadratic
ST<->UV :126-166, face UV tables :260-334, geodetic->geocentric latitude
shift :336-346). On top of the reference's per-face (s,t) we add what PROJ
stops short of: the 64-bit Hilbert-curve cell id of the public S2 geometry
scheme (face:3 bits, 60 position bits, trailing 1 sentinel), computed with
4-bit lookup tables so encoding is ~8 table-gathers per point — fully
vectorized, no per-row Python.

Cell ids are the engine's spatial join/partition keys: the Hilbert order
gives prefix locality (a parent cell is a bit-prefix range), so
repartitionByRange on cell id co-locates spatial neighborhoods, and
cell-cover joins become int64 equality joins Catalyst can hash/sort-merge.
"""

from __future__ import annotations

import math

import numpy as np

MAX_LEVEL = 30
_POS_BITS = 2 * MAX_LEVEL + 1  # 61
_SWAP = 1
_INVERT = 2

# Hilbert sub-cell orderings (public S2 scheme)
_POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
_POS_TO_ORIENT = (_SWAP, 0, 0, _INVERT | _SWAP)

_LOOKUP_BITS = 4
_LOOKUP_POS = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)
_LOOKUP_IJ = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)


def _init_lookup(level: int, i: int, j: int, orig: int, pos: int, orient: int) -> None:
    if level == _LOOKUP_BITS:
        ij = (i << _LOOKUP_BITS) | j
        _LOOKUP_POS[(ij << 2) | orig] = (pos << 2) | orient
        _LOOKUP_IJ[(pos << 2) | orig] = (ij << 2) | orient
        return
    level += 1
    i <<= 1
    j <<= 1
    pos <<= 2
    r = _POS_TO_IJ[orient]
    for idx in range(4):
        ij = r[idx]
        _init_lookup(
            level, i + (ij >> 1), j + (ij & 1), orig, pos + idx,
            orient ^ _POS_TO_ORIENT[idx],
        )


for _o in (0, _SWAP, _INVERT, _SWAP | _INVERT):
    _init_lookup(0, 0, 0, _o, 0, _o)


# --------------------------------------------------------------------------
# lon/lat -> face/UV/ST
# --------------------------------------------------------------------------

def lonlat_to_xyz(lon_deg, lat_deg, geocentric_es: float | None = None):
    """Unit-sphere XYZ; optionally apply the ellipsoid->sphere geodetic->
    geocentric latitude shift the reference s2 projection applies
    (s2.cpp:341-346) with ``geocentric_es`` = one_minus_f_squared trigger."""
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    if geocentric_es is not None:
        lat = np.arctan(geocentric_es * np.tan(lat))
    coslat = np.cos(lat)
    return coslat * np.cos(lon), coslat * np.sin(lon), np.sin(lat)


def xyz_to_face_uv(x, y, z):
    """Face 0..5 (+x,+y,+z,-x,-y,-z by largest |component|) and (u, v)."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(
        ax > ay,
        np.where(ax > az, 0, 2),
        np.where(ay > az, 1, 2),
    )
    face = np.where((face == 0) & (x < 0), 3, face)
    face = np.where((face == 1) & (y < 0), 4, face)
    face = np.where((face == 2) & (z < 0), 5, face)

    # per-face (u, v) ratios (reference s2.cpp ValidFaceXYZtoUV :190-216);
    # np.select evaluates every branch, so silence the off-face div-by-zero
    conds = [face == f for f in range(6)]
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.select(conds, [y / x, -x / y, -x / z, z / x, z / y, -y / z])
        v = np.select(conds, [z / x, z / y, -y / z, y / x, -x / y, -x / z])
    return face.astype(np.int64), u, v


def uv_to_st(u):
    """Quadratic UV->ST map (reference s2.cpp:148-166)."""
    u = np.asarray(u, dtype=np.float64)
    with np.errstate(invalid="ignore"):  # np.where evaluates both branches
        return np.where(
            u >= 0,
            0.5 * np.sqrt(1.0 + 3.0 * u),
            1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u),
        )


def st_to_uv(s):
    """Quadratic ST->UV map (reference s2.cpp:126-146)."""
    s = np.asarray(s, dtype=np.float64)
    return np.where(
        s >= 0.5,
        (1.0 / 3.0) * (4.0 * s * s - 1.0),
        (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)),
    )


# --------------------------------------------------------------------------
# cell ids
# --------------------------------------------------------------------------

def _st_to_ij(s):
    return np.clip((np.asarray(s) * (1 << MAX_LEVEL)).astype(np.int64), 0, (1 << MAX_LEVEL) - 1)


def _faceij_to_id(face, i, j):
    """(face, i30, j30) -> level-30 cell id via 8 lookup-table gathers."""
    n = face.astype(np.int64) << (_POS_BITS - 1)
    bits = face.astype(np.int64) & _SWAP
    mask = (1 << _LOOKUP_BITS) - 1
    for k in range(7, -1, -1):
        bits += ((i >> (k * _LOOKUP_BITS)) & mask) << (_LOOKUP_BITS + 2)
        bits += ((j >> (k * _LOOKUP_BITS)) & mask) << 2
        bits = _LOOKUP_POS[bits]
        n |= (bits >> 2) << (k * 2 * _LOOKUP_BITS)
        bits &= _SWAP | _INVERT
    # faces 4-5 intentionally wrap negative: ids are int64 bit patterns
    return (n << 1) | 1


def s2_cell_id(lon_deg, lat_deg, level: int = MAX_LEVEL, geocentric_es: float | None = None):
    """lon/lat degrees -> S2 cell id at ``level`` (int64 ndarray)."""
    x, y, z = lonlat_to_xyz(lon_deg, lat_deg, geocentric_es)
    face, u, v = xyz_to_face_uv(x, y, z)
    i = _st_to_ij(uv_to_st(u))
    j = _st_to_ij(uv_to_st(v))
    cell = _faceij_to_id(face, i, j)
    if level < MAX_LEVEL:
        cell = parent_id(cell, level)
    return cell


def parent_id(cell_id, level: int):
    """Ancestor cell at ``level`` (prefix truncation + new sentinel bit)."""
    cell_id = np.asarray(cell_id, dtype=np.int64)
    lsb = np.int64(1) << (2 * (MAX_LEVEL - level))
    return (cell_id & -lsb) | lsb


def cell_level(cell_id):
    """Level from the position of the lowest set bit."""
    cell_id = np.asarray(cell_id, dtype=np.int64)
    lsb = cell_id & -cell_id
    # log2(lsb) is even = 2*(30-level)
    return MAX_LEVEL - (np.round(np.log2(lsb.astype(np.float64))) / 2).astype(np.int64)


def cell_id_to_faceij(cell_id):
    """Decode a LEVEL-30 id back to (face, i, j).

    Ids are stored as SIGNED int64 (Spark LongType); faces 4-5 wrap negative,
    so decode goes through a uint64 view for logical shifts.
    """
    cell_u = np.asarray(cell_id, dtype=np.int64).view(np.uint64)
    face = (cell_u >> np.uint64(_POS_BITS)).astype(np.int64)
    pos = ((cell_u & ((np.uint64(1) << np.uint64(_POS_BITS)) - np.uint64(1))) >> np.uint64(1)).astype(np.int64)
    bits = face & _SWAP
    i = np.zeros_like(pos)
    j = np.zeros_like(pos)
    mask = (1 << _LOOKUP_BITS) - 1
    for k in range(7, -1, -1):
        bits += ((pos >> (k * 2 * _LOOKUP_BITS)) & ((1 << (2 * _LOOKUP_BITS)) - 1)) << 2
        bits = _LOOKUP_IJ[bits]
        i += (bits >> (_LOOKUP_BITS + 2)) << (k * _LOOKUP_BITS)
        j += ((bits >> 2) & mask) << (k * _LOOKUP_BITS)
        bits &= _SWAP | _INVERT
    return face, i, j


def cell_center_lonlat(cell_id):
    """Approximate center lon/lat degrees of a level-30 cell id."""
    face, i, j = cell_id_to_faceij(cell_id)
    s = (i.astype(np.float64) + 0.5) / (1 << MAX_LEVEL)
    t = (j.astype(np.float64) + 0.5) / (1 << MAX_LEVEL)
    u = st_to_uv(s)
    v = st_to_uv(t)
    major = 1.0 / np.sqrt(1.0 + u * u + v * v)
    m1 = u * major
    m2 = v * major
    x = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
        [major, -m1, -m1, -major, m2, m2],
    )
    y = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
        [m1, major, -m2, -m2, -major, m1],
    )
    z = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
        [m2, m2, major, -m1, -m1, -major],
    )
    lon = np.degrees(np.arctan2(y, x))
    lat = np.degrees(np.arctan2(z, np.hypot(x, y)))
    return lon, lat


# --------------------------------------------------------------------------
# slippy (web-mercator) tiles — exact floor math, no sampling
# --------------------------------------------------------------------------

WEBMERC_MAX_LAT = math.degrees(2 * math.atan(math.exp(math.pi)) - math.pi / 2)  # 85.05112878...


def slippy_tile(lon_deg, lat_deg, zoom: int):
    """(tile_x, tile_y) of the standard XYZ scheme at ``zoom``."""
    lon = np.asarray(lon_deg, dtype=np.float64)
    lat = np.clip(np.asarray(lat_deg, dtype=np.float64), -WEBMERC_MAX_LAT, WEBMERC_MAX_LAT)
    n = float(1 << zoom)
    tx = np.floor((lon + 180.0) / 360.0 * n)
    phi = np.radians(lat)
    ty = np.floor((1.0 - np.arcsinh(np.tan(phi)) / np.pi) / 2.0 * n)
    tx = np.clip(tx, 0, n - 1).astype(np.int64)
    ty = np.clip(ty, 0, n - 1).astype(np.int64)
    return tx, ty


def tile_key(zoom: int, tx, ty):
    """Single int64 key: zoom in the top bits, then x, y."""
    return (np.int64(zoom) << 58) | (np.asarray(tx, dtype=np.int64) << 29) | np.asarray(ty, dtype=np.int64)
