"""Batch coordinate CLI — the analogue of the reference's stream apps
(`proj`, `cct`, `geod`; reference src/apps/proj.cpp, cct.cpp, geod.cpp):
read whitespace-separated coordinates from stdin (or files), run them
through a compiled pipeline or the geodesic solver, write results to
stdout. Non-coordinate lines pass through (cct convention), `#`
comments preserved.

    python -m proj_spark.cli cct  +proj=utm +zone=32 +ellps=GRS80 < pts
    python -m proj_spark.cli cct  -I +proj=merc ...        # inverse
    python -m proj_spark.cli geod -i +ellps=WGS84 < pairs  # inverse geodesic
    python -m proj_spark.cli geod +ellps=WGS84 < lat lon azi s12 lines

Local numpy execution (no Spark session): the CLI is the debugging /
parity surface; bulk runs go through the DataFrame API.
"""

from __future__ import annotations

import sys

import numpy as np


def _parse_lines(lines):
    """Split into (coords array, per-line token counts, passthrough)."""
    rows = []
    meta = []  # (kind, payload): 'c' index-into-rows | 'p' raw line
    for line in lines:
        body = line.split("#", 1)[0]
        comment = line[len(body):].rstrip("\n")
        toks = body.split()
        vals = []
        ok = bool(toks)
        for t in toks:
            try:
                vals.append(float(t))
            except ValueError:
                ok = False
                break
        if ok and len(vals) >= 2:
            meta.append(("c", len(rows), len(vals), comment))
            vals = vals + [np.nan] * (4 - len(vals))
            rows.append(vals[:4])
        else:
            meta.append(("p", line.rstrip("\n"), 0, ""))
    arr = np.array(rows, dtype=np.float64) if rows else np.empty((0, 4))
    return arr, meta


def _fmt(v, nd):
    return "nan" if not np.isfinite(v) else f"{v:.{nd}f}"


def run_cct(argv, stdin, stdout) -> int:
    from proj_spark.plans.pipeline import compile_pipeline

    inverse = False
    decimals = 10
    spec_toks = []
    files = []
    it = iter(argv)
    for a in it:
        if a in ("-I", "--inverse"):
            inverse = True
        elif a in ("-d", "--decimals"):
            decimals = int(next(it))
        elif a.startswith("+") or "=" in a or a in ("step", "proj"):
            spec_toks.append(a)
        else:
            files.append(a)
    if not spec_toks:
        print("cct: no operation specified", file=sys.stderr)
        return 2
    pipe = compile_pipeline(" ".join(spec_toks))
    lines = []
    if files:
        for f in files:
            lines.extend(open(f).readlines())
    else:
        lines = stdin.readlines()
    arr, meta = _parse_lines(lines)
    if len(arr):
        x, y = arr[:, 0].copy(), arr[:, 1].copy()
        z = np.where(np.isnan(arr[:, 2]), 0.0, arr[:, 2])
        t = np.where(np.isnan(arr[:, 3]), 0.0, arr[:, 3])
        run = pipe.inv_deg if inverse else pipe.fwd_deg
        X, Y, Z, T = run(x, y, z, t)
        if Z is None:
            Z = z
        if T is None:
            T = t
    for kind, payload, nvals, comment in meta:
        if kind == "p":
            stdout.write(payload + "\n")
            continue
        i = payload
        out = [_fmt(X[i], decimals), _fmt(Y[i], decimals)]
        if nvals >= 3:
            out.append(_fmt(Z[i], decimals))
        if nvals >= 4:
            out.append(_fmt(T[i], decimals))
        stdout.write("  ".join(out) + (("  " + comment) if comment else "")
                     + "\n")
    return 0


def run_geod(argv, stdin, stdout) -> int:
    from proj_spark.crs import resolve_ellipsoid
    from proj_spark.kernels.karney import (geod_consts, geod_direct,
                                           geod_inverse)
    from proj_spark.plans.pipeline import parse_params, tokenize

    inverse = False
    decimals = 3
    spec_toks = []
    files = []
    it = iter(argv)
    for a in it:
        if a in ("-i", "-I", "--inverse"):
            inverse = True
        elif a in ("-d", "--decimals"):
            decimals = int(next(it))
        elif a.startswith("+") or "=" in a:
            spec_toks.append(a)
        else:
            files.append(a)
    ell = resolve_ellipsoid(parse_params(tokenize(" ".join(spec_toks)))) \
        if spec_toks else resolve_ellipsoid({"ellps": "WGS84"})
    C = geod_consts(ell.a, ell.f)
    lines = []
    if files:
        for f in files:
            lines.extend(open(f).readlines())
    else:
        lines = stdin.readlines()
    arr, meta = _parse_lines(lines)
    if inverse:
        # lat1 lon1 lat2 lon2 -> azi1 azi2 s12  (geod convention)
        if len(arr):
            r = geod_inverse(C, arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3])
        for kind, payload, nvals, comment in meta:
            if kind == "p":
                stdout.write(payload + "\n")
                continue
            i = payload
            stdout.write(
                f"{_fmt(r['azi1'][i], decimals + 6)}  "
                f"{_fmt(r['azi2'][i], decimals + 6)}  "
                f"{_fmt(r['s12'][i], decimals)}\n")
    else:
        # lat1 lon1 azi1 s12 -> lat2 lon2 azi2
        if len(arr):
            r = geod_direct(C, arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3])
        for kind, payload, nvals, comment in meta:
            if kind == "p":
                stdout.write(payload + "\n")
                continue
            i = payload
            stdout.write(
                f"{_fmt(r['lat2'][i], decimals + 6)}  "
                f"{_fmt(r['lon2'][i], decimals + 6)}  "
                f"{_fmt(r['azi2'][i], decimals + 6)}\n")
    return 0


def run_cs2cs(argv, stdin, stdout) -> int:
    """cs2cs mode: two CRS arguments (EPSG:XXXX or proj-strings),
    inverse(src) + forward(dst) via compile_crs_to_crs. With
    --dispatch and two EPSG geographic codes, per-point registry
    candidate dispatch (sources.epsg_ops — the reference cs2cs's
    alternative-operation selection) replaces the single pipeline."""
    from proj_spark.plans.pipeline import compile_crs_to_crs

    inverse = False
    dispatch = False
    decimals = 10
    crs = []
    files = []
    it = iter(argv)
    for a in it:
        if a in ("-I", "--inverse"):
            inverse = True
        elif a == "--dispatch":
            dispatch = True
        elif a in ("-d", "--decimals"):
            decimals = int(next(it))
        elif (a.upper().startswith("EPSG:") or a.startswith("+")
              or a.lstrip().startswith(("{", "GEOGCS", "PROJCS", "GEOGCRS",
                                        "GEODCRS", "PROJCRS", "BOUNDCRS"))):
            # EPSG codes, proj-strings, PROJJSON, or WKT text (quoted)
            crs.append(a)
        else:
            files.append(a)
    if len(crs) != 2:
        print("cs2cs: need exactly two CRS arguments", file=sys.stderr)
        return 2
    if dispatch:
        from proj_spark.sources.epsg_ops import crs_to_crs_epsg_dispatch

        pipe = crs_to_crs_epsg_dispatch(crs[0], crs[1])
    else:
        pipe = compile_crs_to_crs(crs[0], crs[1])
    lines = []
    if files:
        for f in files:
            lines.extend(open(f).readlines())
    else:
        lines = stdin.readlines()
    arr, meta = _parse_lines(lines)
    if len(arr):
        x, y = arr[:, 0].copy(), arr[:, 1].copy()
        z = np.where(np.isnan(arr[:, 2]), 0.0, arr[:, 2])
        t = np.where(np.isnan(arr[:, 3]), 0.0, arr[:, 3])
        run = pipe.inv_deg if inverse else pipe.fwd_deg
        X, Y, Z, T = run(x, y, z, t)
        if Z is None:
            Z = z
        if T is None:
            T = t
    for kind, payload, nvals, comment in meta:
        if kind == "p":
            stdout.write(payload + "\n")
            continue
        i = payload
        out = [_fmt(X[i], decimals), _fmt(Y[i], decimals)]
        if nvals >= 3:
            out.append(_fmt(Z[i], decimals))
        stdout.write("  ".join(out) + (("  " + comment) if comment else "")
                     + "\n")
    return 0


def run_projinfo(argv, stdout) -> int:
    """projinfo mode (reference src/apps/projinfo.cpp shapes): with one
    CRS argument, print the lowered proj-string; with a source + target
    pair, print the ranked candidate-operation list the dispatcher would
    select from — id/name, accuracy, area-of-use bbox, and the PROJ
    pipeline string per candidate, in static selection order (accuracy,
    then smallest pseudo-area; ballpark last)."""
    crs = []
    fmts = ["PROJ"]
    it = iter(argv)
    for a in it:
        if a in ("-s", "--source-crs"):
            crs.insert(0, next(it))
        elif a in ("-t", "--target-crs"):
            crs.append(next(it))
        elif a in ("-o", "--output"):
            # reference projinfo -o: comma list of PROJ, WKT2[:2019],
            # WKT2:2015, WKT1_GDAL, WKT1_ESRI, PROJJSON, all
            fmts = []
            for f in next(it).split(","):
                f = f.strip().upper().replace(":", "_")
                if f in ("WKT2", "WKT2_2019"):
                    f = "WKT2"
                fmts.append(f)
            if "ALL" in fmts:
                fmts = ["PROJ", "WKT2", "WKT2_2015", "WKT1_GDAL",
                        "WKT1_ESRI", "PROJJSON"]
        elif a.startswith("-"):
            print(f"projinfo: unknown option {a}", file=sys.stderr)
            return 2
        else:
            crs.append(a)
    if not crs or len(crs) > 2:
        print("projinfo: need one CRS or a source/target pair",
              file=sys.stderr)
        return 2

    if len(crs) == 1:
        from proj_spark.plans.pipeline import compile_crs_to_crs

        c = crs[0].strip()
        if c.lower().startswith("urn:"):
            from proj_spark.plans.pipeline import _parse_urn, _urn_crs_spec

            kind, auth, code = _parse_urn(c)
            if kind == "coordinateoperation":
                from proj_spark.sources.epsg_ops import operation_by_urn

                spec, op = operation_by_urn(code)
                acc = op.get("accuracy", -1.0)
                print(f"{op['name']}, "
                      f"{f'{acc} m' if acc >= 0 else 'unknown accuracy'}",
                      file=stdout)
            else:
                spec = _urn_crs_spec(auth, code)
        elif c.upper().startswith("EPSG:"):
            from proj_spark.sources.epsg import epsg_to_proj

            spec = epsg_to_proj(c.split(":", 1)[1])
        elif c.upper().startswith("ESRI:"):
            from proj_spark.sources.esri import esri_to_proj

            spec = esri_to_proj(c)
        elif c.upper().startswith("IGNF:"):
            from proj_spark.sources.epsg import epsg_to_proj

            spec = epsg_to_proj(c.split(":", 1)[1])
        elif c.upper().startswith(("IAU_2015:", "IAU:")):
            from proj_spark.sources.epsg import epsg_to_proj

            spec = epsg_to_proj("IAU_2015:" + c.split(":", 1)[1])
        elif c.upper().startswith("NRCAN:"):
            from proj_spark.sources.epsg import coordinate_metadata

            spec, epoch = coordinate_metadata(c)
            if epoch is not None:
                print(f"Coordinate epoch: {epoch}", file=stdout)
        else:
            from proj_spark.sources.projjson import (is_projjson,
                                                     projjson_to_proj)
            from proj_spark.sources.wkt import is_wkt, wkt_to_proj

            if is_wkt(c):
                spec = wkt_to_proj(c)
            elif is_projjson(c):
                spec = projjson_to_proj(c)
            else:
                spec = c
        # deprecated CRS: still resolves (reference behavior) but the
        # replacement codes from deprecation.sql are surfaced
        if c.upper().startswith("EPSG:"):
            from proj_spark.sources.epsg import (crs_deprecation_replacements,
                                                 crs_is_deprecated)

            _code = c.split(":", 1)[1]
            if crs_is_deprecated(_code):
                reps = crs_deprecation_replacements(_code)
                print(f"Warning: CRS EPSG:{_code} is deprecated" +
                      (" (non-deprecated replacement: " + ", ".join(
                          "EPSG:" + r for r in reps) + ")" if reps else ""),
                      file=stdout)
        # registry code (EPSG:NNNN or a crs URN with EPSG authority) for
        # the WKT2/PROJJSON writers
        epsg_code = None
        if c.upper().startswith("EPSG:"):
            epsg_code = c.split(":", 1)[1]
        elif c.upper().startswith(("IAU_2015:", "IAU:")):
            # IAU rows are stored authority-qualified in the registry
            epsg_code = "IAU_2015:" + c.split(":", 1)[1]
        elif c.upper().startswith(("IGNF:", "NKG:")):
            epsg_code = c.split(":", 1)[1]
        elif c.lower().startswith("urn:"):
            from proj_spark.plans.pipeline import _parse_urn

            kind, auth, code = _parse_urn(c)
            if kind == "crs" and auth.upper() == "EPSG":
                epsg_code = code
            elif kind == "crs" and auth.upper() in ("IAU_2015", "IAU"):
                epsg_code = f"IAU_2015:{code}"
        for fmt in fmts:
            if fmt == "PROJ":
                print("PROJ string:", file=stdout)
                print(spec, file=stdout)
            elif fmt in ("WKT2", "WKT2_2015"):
                from proj_spark.sources.wkt_out import epsg_to_wkt2

                if epsg_code is None:
                    print("WKT2 output needs a registry CRS code",
                          file=sys.stderr)
                    return 2
                ver = "2015" if fmt == "WKT2_2015" else "2019"
                print(f"WKT2:{ver} string:", file=stdout)
                print(epsg_to_wkt2(epsg_code, version=ver), file=stdout)
            elif fmt in ("WKT1_GDAL", "WKT1_ESRI"):
                from proj_spark.sources.wkt_out import epsg_to_wkt1

                if epsg_code is None:
                    print("WKT1 output needs a registry CRS code",
                          file=sys.stderr)
                    return 2
                dialect = fmt.split("_", 1)[1]
                try:
                    txt = epsg_to_wkt1(epsg_code, dialect)
                except NotImplementedError as e:
                    # reference WKTFormatter throws for inexpressible
                    # CRSs (e.g. spherical planetocentric in WKT1)
                    print(f"WKT1 export error: {e}", file=sys.stderr)
                    return 2
                print(f"WKT1:{dialect} string:", file=stdout)
                print(txt, file=stdout)
            elif fmt == "PROJJSON":
                from proj_spark.sources.wkt_out import epsg_to_projjson

                if epsg_code is None:
                    print("PROJJSON output needs a registry CRS code",
                          file=sys.stderr)
                    return 2
                print("PROJJSON:", file=stdout)
                print(epsg_to_projjson(epsg_code), file=stdout)
            else:
                print(f"projinfo: unknown output format {fmt}",
                      file=sys.stderr)
                return 2
        return 0

    if fmts != ["PROJ"]:
        # candidate operations are emitted as PROJ pipeline strings only;
        # an explicit error beats silently ignoring the flag (ADVICE r4 —
        # the reference's WKT operation output is not implemented here)
        print("projinfo: -o with -s/-t supports only PROJ output",
              file=sys.stderr)
        return 2

    from proj_spark.sources.epsg_ops import crs_to_crs_epsg_dispatch

    disp = crs_to_crs_epsg_dispatch(crs[0], crs[1])
    ranked = [disp.candidates[i] for i in disp.order]
    print(f"Candidate operations found: {len(ranked)}", file=stdout)
    print("-------------------------------------", file=stdout)
    for i, c in enumerate(ranked, 1):
        print(f"Operation No. {i}:", file=stdout)
        print("", file=stdout)
        acc = (f"{c.accuracy} m" if c.accuracy is not None
               and c.accuracy >= 0 else "unknown accuracy")
        if c.name == "ballpark":
            ident = (f"unknown id, Ballpark geographic offset from "
                     f"{crs[0]} to {crs[1]}")
            area = "World"
            tail = ", has ballpark transformation"
        else:
            ident = c.name
            area = ("World" if c.src_bbox is None else
                    "bbox " + " ".join(repr(v) for v in c.src_bbox))
            tail = ""
        print(f"{ident}, {acc}, {area}{tail}", file=stdout)
        print("", file=stdout)
        print("PROJ string:", file=stdout)
        print(getattr(c.pipeline, "spec", "+proj=noop"), file=stdout)
        print("", file=stdout)
    return 0


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        print(__doc__, file=sys.stderr)
        return 2
    cmd, rest = argv[0], argv[1:]
    if cmd == "cct" or cmd == "proj":
        return run_cct(rest, sys.stdin, sys.stdout)
    if cmd == "geod":
        return run_geod(rest, sys.stdin, sys.stdout)
    if cmd == "cs2cs":
        return run_cs2cs(rest, sys.stdin, sys.stdout)
    if cmd == "projinfo":
        try:
            return run_projinfo(rest, sys.stdout)
        except (ValueError, KeyError, NotImplementedError) as e:
            # reference projinfo prints resolution errors (unknown code,
            # cross-celestial-body pair, unsupported output) and exits
            # non-zero rather than tracebacking
            print(f"projinfo: {e}", file=sys.stderr)
            return 1
    if cmd == "gie":
        from proj_spark.gie import run_gie_files

        verbose = "-v" in rest or "--verbose" in rest
        max_op_skips = None
        files = []
        it = iter(rest)
        for a in it:
            if a == "--max-op-skips":
                max_op_skips = int(next(it))
            elif not a.startswith("-"):
                files.append(a)
        return run_gie_files(files, sys.stdout, verbose=verbose,
                             max_op_skips=max_op_skips)
    # bare proj-string: behave like cct
    return run_cct(argv, sys.stdin, sys.stdout)


if __name__ == "__main__":
    raise SystemExit(main())
