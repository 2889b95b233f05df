"""Registry-driven candidate-operation lists — the proj_create_crs_to_crs
planner path over the bundled EPSG dataset.

The reference resolves a CRS pair to a RANKED LIST of coordinate
operations from the EPSG registry (reference
src/iso19111/coordinateoperation.cpp createOperations + the proj.db
helmert_transformation / grid_transformation / usage / extent tables) and
dispatches per point at transform time (4D_api.cpp).  This module builds
the same candidate lists from the bundled data-only EPSG extract:

* direct Helmert ops (geocentric translations 9603, position vector
  9606, coordinate frame 9607 — geog2D domain) lowered onto the
  engine's pipeline surface (cart -> helmert -> cart^-1);
* direct grid ops (NTv2 9615, NTv1 9614, NADCON 9613) — kept only when
  the grid file actually loads, mirroring skipNonInstantiable;
* reverse rows (registry stores one direction; inverse is exact);
* one-level composition via the WGS84 hub (EPSG:4326) when no direct
  op exists — the registry's A->hub + hub->B chaining, accuracies
  summed, areas intersected;
* a ballpark (no datum change) candidate appended last, accuracy
  unknown — the reference's ballpark transformation
  (4D_api.cpp:2262-2312) so out-of-area points degrade instead of
  erroring.

Area of use comes from each op's usage -> extent row; accuracy from the
op row.  The result plugs straight into plans.dispatch.CandidateDispatch.
"""

from __future__ import annotations

from proj_spark.sources import epsg as E

_HELMERT_METHODS = {"9603", "9606", "9607"}
_GRID_METHODS = {"9613", "9614", "9615"}
_CONV = {"position vector": "position_vector",
         "coordinate frame": "coordinate_frame"}

_op_index = None


def _ops_by_crs():
    """{(src_code, dst_code): [op_row_dict, ...]} over helmert + grid."""
    global _op_index
    if _op_index is not None:
        return _op_index
    db = E._load()
    # usage: auth, code, object_table, obj_auth, obj_code, ext_auth,
    # ext_code, scope_auth, scope_code -> {(table, obj_code): extent_code}
    # an op can carry SEVERAL usage/extent rows (multiple areas of use);
    # keep them all and use the union bbox for eligibility — last-row-wins
    # would shrink/shift the area tested per point
    ext_of: dict[tuple[str, str], list[str]] = {}
    for u in db["usage"].values():
        ext_of.setdefault((str(u[2]), str(u[4])), []).append(str(u[6]))
    idx: dict[tuple[str, str], list[dict]] = {}

    def bbox_for(table, code):
        boxes = []
        for ec in ext_of.get((table, code), []):
            ext = db["extent"].get(ec)
            if ext is None:
                continue
            # extent: auth, code, name, desc, south, north, west, east, depr
            s, n, w, e = (float(ext[4]), float(ext[5]),
                          float(ext[6]), float(ext[7]))
            boxes.append((w, s, e, n))
        if not boxes:
            return None
        if len(boxes) == 1:
            return boxes[0]
        # union of the areas of use; antimeridian-crossing components
        # (w > e) can't participate in a flat min/max union — skip them
        # (dispatch drops w > e candidates anyway, reference 4D_api.cpp:1740)
        flat = [b for b in boxes if b[0] <= b[2]]
        if not flat:
            return boxes[0]
        return (min(b[0] for b in flat), min(b[1] for b in flat),
                max(b[2] for b in flat), max(b[3] for b in flat))

    for code, row in db["helmert_transformation"].items():
        if row[-1]:  # deprecated
            continue
        method = str(row[5])
        if method not in _HELMERT_METHODS:
            continue
        op = {
            "kind": "helmert", "code": code, "name": row[2],
            "method": method, "method_name": str(row[6]),
            "src": str(row[8]), "dst": str(row[10]),
            "accuracy": float(row[11]) if row[11] is not None else -1.0,
            "tx": E._length_m(row[12], row[16]),
            "ty": E._length_m(row[13], row[16]),
            "tz": E._length_m(row[14], row[16]),
            "bbox": bbox_for("helmert_transformation", code),
        }
        if row[17] is not None:
            # rotations -> arcsec, scale difference -> ppm
            op["rx"] = E._angle_deg(row[17], row[21]) * 3600.0
            op["ry"] = E._angle_deg(row[18], row[21]) * 3600.0
            op["rz"] = E._angle_deg(row[19], row[21]) * 3600.0
            ds = row[22]
            if ds is not None:
                typ, factor = E._uom(str(row[24]))
                op["ds"] = float(ds) * (factor if factor else 1e-6) / 1e-6
            else:
                op["ds"] = 0.0
        idx.setdefault((op["src"], op["dst"]), []).append(op)

    for code, row in db["grid_transformation"].items():
        if row[-1]:
            continue
        method = str(row[5])
        if method not in _GRID_METHODS:
            continue
        op = {
            "kind": "grid", "code": code, "name": row[2],
            "method": method,
            "src": str(row[8]), "dst": str(row[10]),
            "accuracy": float(row[11]) if row[11] is not None else -1.0,
            "grid": str(row[15]),
            "bbox": bbox_for("grid_transformation", code),
        }
        idx.setdefault((op["src"], op["dst"]), []).append(op)

    _op_index = idx
    return idx


def _geog_only(code: str) -> str:
    """+proj=longlat spec (ellipsoid + pm) for a geographic 2D CRS."""
    spec = E.epsg_to_proj(code)
    if not spec.startswith("+proj=longlat"):
        raise NotImplementedError(
            f"EPSG:{code} is not a geographic 2D CRS (got {spec.split()[0]})")
    return spec


def _ell_of(spec: str) -> str:
    return " ".join(p for p in spec.split()
                    if p.startswith(("+a=", "+b=", "+rf=", "+R=")))


def _op_pipeline_spec(op: dict, src_spec: str, dst_spec: str,
                      inverse: bool) -> str | None:
    """Lower one registry op row onto the engine's pipeline grammar.
    ``inverse``: the row maps dst->src, run it backwards."""
    if any(p.startswith("+pm=") for p in
           (src_spec + " " + dst_spec).split()):
        return None  # non-Greenwich PM inside a datum op: out of scope
    if op["kind"] == "helmert":
        par = f"+x={op['tx']!r} +y={op['ty']!r} +z={op['tz']!r}"
        if "rx" in op:
            par += (f" +rx={op['rx']!r} +ry={op['ry']!r} +rz={op['rz']!r}"
                    f" +s={op['ds']!r}")
            conv = next((v for k, v in _CONV.items()
                         if k in op["method_name"].lower()),
                        "position_vector")
            par += f" +convention={conv}"
        helm = f"+proj=helmert {par}"
        if inverse:
            helm = f"+inv {helm}"
        return (f"+proj=pipeline "
                f"+step +proj=cart {_ell_of(src_spec)} "
                f"+step {helm} "
                f"+step +inv +proj=cart {_ell_of(dst_spec)}")
    # grid op: hgridshift fwd maps src->dst as stored
    g = f"+proj=hgridshift +grids={op['grid']}"
    if inverse:
        g = f"+inv {g}"
    return f"+proj=pipeline +step {g}"


def candidate_operations(src: str, dst: str, *, hub: str = "4326",
                         max_candidates: int = 24) -> list:
    """Ranked plans.dispatch.Candidate list for a geographic CRS pair
    given as EPSG codes ('4230' or 'EPSG:4230')."""
    from proj_spark.plans.dispatch import Candidate
    from proj_spark.plans.pipeline import compile_pipeline

    def norm(c: str) -> str:
        c = str(c).strip()
        return c.split(":", 1)[1] if ":" in c else c

    src, dst = norm(src), norm(dst)
    src_spec = _geog_only(src)
    dst_spec = _geog_only(dst)
    idx = _ops_by_crs()

    def build(op, s_spec, d_spec, inverse):
        spec = _op_pipeline_spec(op, s_spec, d_spec, inverse)
        if spec is None:
            return None
        try:
            pipe = compile_pipeline(spec)
            if op["kind"] == "grid":
                # instantiate eagerly: missing grid file -> skip the
                # candidate (reference skipNonInstantiable)
                import numpy as np
                pipe.fwd_deg(np.array([0.0]), np.array([0.0]))
        except Exception:
            return None
        return Candidate(pipe, src_bbox=op["bbox"], dst_bbox=op["bbox"],
                         accuracy=op["accuracy"],
                         needs_grids=op["kind"] == "grid",
                         name=f"EPSG:{op['code']} {op['name']}",
                         meta={**op, "inverse": inverse})

    out = []
    for op in idx.get((src, dst), []):
        c = build(op, src_spec, dst_spec, inverse=False)
        if c is not None:
            out.append(c)
    for op in idx.get((dst, src), []):
        c = build(op, src_spec, dst_spec, inverse=True)
        if c is not None:
            out.append(c)

    if not out and src != dst and hub not in (src, dst):
        # one-level composition through the hub (usually WGS84)
        out.extend(_hub_candidates(src, dst, hub, src_spec, dst_spec,
                                   max_candidates))

    # ballpark: no datum change (reference 4D_api.cpp:2262-2312) — ranked
    # last by unknown accuracy, and the gridless fallback of the dispatch
    from proj_spark.plans.pipeline import compile_pipeline as _cp
    import math as _math
    # cap keeps the best-ranked candidates (accuracy, then finer area),
    # not whatever the registry listed first
    out.sort(key=lambda c: (c.accuracy if c.accuracy >= 0 else _math.inf,
                            c.pseudo_area))
    out = out[:max_candidates]
    out.append(Candidate(_cp("+proj=noop"), accuracy=-1.0,
                         needs_grids=False, name="ballpark"))
    return out


def _hub_candidates(src, dst, hub, src_spec, dst_spec, cap):
    from proj_spark.plans.dispatch import Candidate
    from proj_spark.plans.pipeline import Pipeline

    a = [c for c in candidate_operations(src, hub)
         if c.name != "ballpark"]
    b = [c for c in candidate_operations(hub, dst)
         if c.name != "ballpark"]
    out = []
    for ca in a:
        for cb in b:
            bbox = _bbox_intersect(ca.src_bbox, cb.src_bbox)
            if bbox is not None and (bbox[0] >= bbox[2]
                                     or bbox[1] >= bbox[3]):
                continue
            acc = (ca.accuracy + cb.accuracy
                   if ca.accuracy >= 0 and cb.accuracy >= 0 else -1.0)
            pipe = Pipeline(list(ca.pipeline.steps) + list(cb.pipeline.steps),
                            f"{ca.name} + {cb.name}")
            out.append(Candidate(
                pipe, src_bbox=bbox, dst_bbox=bbox, accuracy=acc,
                needs_grids=ca.needs_grids or cb.needs_grids,
                name=f"{ca.name} + {cb.name}"))
            if len(out) >= cap:
                return out
    return out


def _bbox_intersect(a, b):
    if a is None:
        return b
    if b is None:
        return a
    return (max(a[0], b[0]), max(a[1], b[1]),
            min(a[2], b[2]), min(a[3], b[3]))


def crs_to_crs_epsg_dispatch(src: str, dst: str):
    """CandidateDispatch for an EPSG geographic pair — the
    proj_create_crs_to_crs analogue with per-point operation selection."""
    from proj_spark.plans.dispatch import CandidateDispatch

    return CandidateDispatch(candidate_operations(src, dst))
