"""Per-point candidate-operation dispatch — the proj_trans alternative-
operation machinery, vectorized.

When a CRS pair admits several coordinate operations (different grids,
Helmert variants, ballpark fallbacks) the reference does not compile one
pipeline: it keeps a RANKED LIST and selects per point at transform time
(reference src/4D_api.cpp proj_trans :421-535 +
pj_get_suggested_operation :217-360):

* a candidate is eligible for a point when its source-side bbox contains
  it (longitude normalized into [-180, 180]);
* among eligible candidates the best accuracy wins, ties broken by the
  smallest pseudo-area (finer regional ops beat continental ones);
* if the chosen operation returns an invalid coordinate (e.g. the point
  is inside the grid's bbox but outside every subgrid — the reference's
  ntv2_0.gsb Montana example, 4D_api.cpp:431-437) the candidate is
  EXCLUDED for that point and the next-best is tried, up to
  N_MAX_RETRY=2 exclusions (3 attempts);
* points matching no bbox (or exhausting retries) fall back to the first
  listed operation that needs no grids (:493-530), else error-in-band.

Vectorization: the selection order (accuracy, pseudo-area, list order) is
a static total order over candidates, so "per-point best with exclusion
of failures" is exactly "walk candidates in sorted order; each candidate
processes the still-unresolved points inside its bbox with fewer than 3
attempts" — one numpy mask + one vectorized pipeline call per candidate,
no per-point Python.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from proj_spark.plans.pipeline import Pipeline, compile_pipeline

_N_MAX_RETRY = 2  # reference 4D_api.cpp:423


def _normalize_lon(x: np.ndarray) -> np.ndarray:
    """reference 4D_api.cpp:223-234."""
    out = np.where(x > 180.0, x - 360.0, x)
    out = np.where(out < -180.0, out + 360.0, out)
    big = np.abs(out) > 180.0
    if big.any():
        out = np.where(big, np.fmod(out + 180.0, 360.0) - 180.0, out)
    return out


@dataclass
class Candidate:
    """One alternative operation.

    ``src_bbox`` / ``dst_bbox``: (west, south, east, north) in degrees —
    the area-of-use window tested against the input point (src for fwd,
    dst for inv). None means world.
    ``accuracy``: metres, smaller is better; negative = unknown (ranked
    after every known accuracy, matching the reference's
    ``alt.accuracy >= 0 && alt.accuracy < bestAccuracy`` guard).
    ``needs_grids``: excluded from the no-bbox-match fallback pass.
    """

    pipeline: Pipeline
    src_bbox: tuple[float, float, float, float] | None = None
    dst_bbox: tuple[float, float, float, float] | None = None
    accuracy: float = -1.0
    needs_grids: bool = False
    name: str = ""
    meta: dict | None = None  # builder-specific payload (e.g. registry row)
    pseudo_area: float = field(init=False)

    def __post_init__(self):
        b = self.src_bbox or (-180.0, -90.0, 180.0, 90.0)
        w, s, e, n = b
        # reference pseudoArea (4D_api.cpp add_coord_op_to_list ~:1710-1718):
        # (east-west) * (sin(north)-sin(south)) in radians, with east += 360
        # when the extent crosses the antimeridian (west > east) — a
        # spherical-cap-slice proxy so high-latitude boxes rank smaller than
        # same-degree-span equatorial ones, exactly as the reference ranks.
        if w > e:
            e += 360.0
        self.pseudo_area = (
            max(math.radians(e - w), 0.0)
            * max(math.sin(math.radians(n)) - math.sin(math.radians(s)), 0.0)
        )

    def _contains(self, bbox, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        if bbox is None:
            return np.ones(lon.shape, dtype=bool)
        w, s, e, n = bbox
        lat_ok = (lat >= s) & (lat <= n)
        raw = (lon >= w) & (lon <= e)
        norm = _normalize_lon(lon)
        return lat_ok & (raw | ((norm >= w) & (norm <= e)))

    def matches_src(self, lon, lat):
        return self._contains(self.src_bbox, lon, lat)

    def matches_dst(self, x, y):
        return self._contains(self.dst_bbox, x, y)


def candidate(spec: str, src_bbox=None, dst_bbox=None, accuracy: float = -1.0,
              name: str = "") -> Candidate:
    """Build a Candidate from a proj-string; needs_grids inferred from the
    spec (any grid-consuming op in the chain)."""
    needs = any(k in spec for k in
                ("nadgrids", "+grids", "geoidgrids", "geoid_crs"))
    return Candidate(compile_pipeline(spec), src_bbox, dst_bbox, accuracy,
                     needs_grids=needs, name=name or spec)


class CandidateDispatch:
    """Drop-in for Pipeline (fwd_deg/inv_deg) that dispatches per point."""

    def __init__(self, candidates: list[Candidate]):
        # The reference drops operations whose extent crosses the
        # antimeridian (west > east) from the per-point list entirely
        # (minxSrc <= maxxSrc guard, 4D_api.cpp:1740) — ~45 such extents in
        # the bundled EPSG extract (Fiji/NZ/Aleutians). Keeping them would
        # let an op the reference never runs consume selection slots and
        # serve as the gridless fallback.
        def _crosses(b):
            return b is not None and b[0] > b[2]

        candidates = [c for c in candidates
                      if not _crosses(c.src_bbox) and not _crosses(c.dst_bbox)]
        if not candidates:
            raise ValueError("dispatch needs at least one candidate "
                             "(after dropping antimeridian-crossing extents)")
        self.candidates = list(candidates)  # file order (fallback pass)
        # static selection order: accuracy (unknown last), then pseudo-area,
        # then list order (stable sort) — the reference's pairwise
        # "best accuracy, tie -> smallest area" criterion (:325-339)
        self.order = sorted(
            range(len(candidates)),
            key=lambda i: (
                candidates[i].accuracy if candidates[i].accuracy >= 0.0
                else math.inf,
                candidates[i].pseudo_area,
            ),
        )

    def _run(self, lon, lat, z, t, direction: str):
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        out_x = np.full_like(lon, np.nan)
        out_y = np.full_like(lat, np.nan)
        out_z = None if z is None else np.full_like(
            np.asarray(z, dtype=np.float64), np.nan)
        unresolved = np.ones(lon.shape, dtype=bool)
        attempts = np.zeros(lon.shape, dtype=np.int8)

        def apply(c: Candidate, m: np.ndarray):
            zi = None if z is None else np.asarray(z, dtype=np.float64)[m]
            ti = None if t is None else np.asarray(t, dtype=np.float64)[m]
            if direction == "fwd":
                x, y, zz, _ = c.pipeline.fwd_deg(lon[m], lat[m], zi, ti)
            else:
                x, y, zz, _ = c.pipeline.inv_deg(lon[m], lat[m], zi, ti)
            ok = np.isfinite(x) & np.isfinite(y)
            idx = np.flatnonzero(m)[ok]
            out_x[idx] = x[ok]
            out_y[idx] = y[ok]
            if out_z is not None and zz is not None:
                out_z[idx] = np.asarray(zz)[ok]
            return ok

        for i in self.order:
            if not unresolved.any():
                break
            c = self.candidates[i]
            inb = (c.matches_src(lon, lat) if direction == "fwd"
                   else c.matches_dst(lon, lat))
            m = unresolved & inb & (attempts <= _N_MAX_RETRY)
            if not m.any():
                continue
            ok = apply(c, m)
            unresolved[np.flatnonzero(m)[ok]] = False
            attempts[m] += 1

        # no-bbox-match / retries-exhausted fallback: first FILE-ORDER
        # operation that needs no grids, applied regardless of bbox
        # (reference :493-530)
        m = unresolved
        if m.any():
            for c in self.candidates:
                if not c.needs_grids:
                    ok = apply(c, m)
                    unresolved[np.flatnonzero(m)[ok]] = False
                    break
        return out_x, out_y, out_z, t

    def fwd_deg(self, lon_deg, lat_deg, z=None, t=None):
        return self._run(lon_deg, lat_deg, z, t, "fwd")

    def inv_deg(self, x, y, z=None, t=None):
        return self._run(x, y, z, t, "inv")


def crs_to_crs_dispatch(
    pairs: list[tuple[str, dict]], src: str | None = None,
    dst: str | None = None,
) -> CandidateDispatch:
    """Convenience: build a dispatch from (proj-string, opts) pairs, or —
    when ``src``/``dst`` are given — from candidate DATUM HOOK variants of
    a crs-to-crs pair (each pair entry then supplies the datum options,
    e.g. [('+nadgrids=x.gsb', {'src_bbox': ..., 'accuracy': 0.05}),
    ('+towgs84=...', {'accuracy': 2.0})] applied to the src CRS)."""
    from proj_spark.plans.pipeline import compile_crs_to_crs

    cands = []
    for spec, opts in pairs:
        if src is not None and dst is not None:
            pipe = compile_crs_to_crs(f"{src} {spec}", dst)
            needs = any(k in spec for k in
                        ("nadgrids", "+grids", "geoidgrids"))
            cands.append(Candidate(
                pipe, opts.get("src_bbox"), opts.get("dst_bbox"),
                opts.get("accuracy", -1.0), needs_grids=needs,
                name=opts.get("name", spec)))
        else:
            cands.append(candidate(spec, **opts))
    return CandidateDispatch(cands)
