"""WKT2:2019 and PROJJSON *export* from the bundled EPSG registry —
the output half of the io surface (reference src/iso19111/io.cpp
WKTFormatter / JSONFormatter; projinfo's default output is WKT2:2019).

Scope: geographic 2D, geocentric, and projected CRSs resolvable by
``sources.epsg`` (every projection method ``epsg_to_proj`` lowers).
Angular parameter/axis values are normalized to degree and lengths to
metre (the reference prints native registry units; the normalized form
is equally valid WKT2 and round-trips bit-exactly through this repo's
own readers — see tests/test_wkt_out.py round-trip oracles against
``wkt_to_proj`` / ``projjson_to_proj``).
"""

from __future__ import annotations

import json

from proj_spark.sources import epsg as E

_DEG_PER_RAD = "0.0174532925199433"   # the WKT2 canonical degree factor


def _q(s) -> str:
    return '"' + str(s).replace('"', "'") + '"'


def _num(v: float) -> str:
    s = repr(float(v))
    return s[:-2] if s.endswith(".0") else s


def _ellipsoid(code) -> tuple[str, dict]:
    row = E._load()["ellipsoid"].get(str(code))
    if row is None:
        raise KeyError(f"EPSG ellipsoid {code}")
    a = E._length_m(row[6], row[8])
    name = str(row[2])
    if row[9] is not None:
        j = {"name": name, "semi_major_axis": a,
             "inverse_flattening": float(row[9])}
        w = (f"ELLIPSOID[{_q(name)},{_num(a)},{_num(float(row[9]))},"
             f"LENGTHUNIT[\"metre\",1]]")
    else:
        b = E._length_m(row[10], row[8])
        if b == a:
            j = {"name": name, "radius": a}
            w = f"ELLIPSOID[{_q(name)},{_num(a)},0,LENGTHUNIT[\"metre\",1]]"
        else:
            j = {"name": name, "semi_major_axis": a, "semi_minor_axis": b}
            rf = a / (a - b)
            w = (f"ELLIPSOID[{_q(name)},{_num(a)},{_num(rf)},"
                 f"LENGTHUNIT[\"metre\",1]]")
    return w, j


def _datum(code) -> tuple[str, str, dict, float, str]:
    """(wkt DATUM, wkt PRIMEM, json datum, pm_deg, datum name)."""
    db = E._load()
    row = db["geodetic_datum"].get(str(code))
    if row is None:
        raise KeyError(f"EPSG datum {code}")
    name = str(row[2])
    ew, ej = _ellipsoid(row[5])
    pm_row = db["prime_meridian"].get(str(row[7]))
    pm_deg = E._angle_deg(pm_row[3], pm_row[5]) if pm_row else 0.0
    pm_name = str(pm_row[2]) if pm_row else "Greenwich"
    wd = f"DATUM[{_q(name)},{ew}]"
    wp = (f"PRIMEM[{_q(pm_name)},{_num(pm_deg)},"
          f"ANGLEUNIT[\"degree\",{_DEG_PER_RAD}]]")
    jd = {"type": "GeodeticReferenceFrame", "name": name, "ellipsoid": ej}
    if pm_deg != 0.0:
        jd["prime_meridian"] = {"name": pm_name, "longitude": pm_deg}
    return wd, wp, jd, pm_deg, name


_ORIENT_JSON = {"north": "north", "south": "south", "east": "east",
                "west": "west", "geocentricX": "geocentricX",
                "geocentricY": "geocentricY", "geocentricZ": "geocentricZ",
                "up": "up", "down": "down"}


def _axes(cs_code, kind: str) -> tuple[list[str], list[dict]]:
    """(wkt AXIS list, json axis list) for a coordinate system code.
    kind: 'ellipsoidal'|'Cartesian' — used for fallback axes when the
    registry extract lacks the cs rows."""
    db = E._load()
    rows = sorted(db.get("axis_all", {}).get(str(cs_code), []),
                  key=lambda r: int(r[7]))
    w, j = [], []
    if not rows:
        fallback = ([("Geodetic latitude", "Lat", "north", "degree"),
                     ("Geodetic longitude", "Lon", "east", "degree")]
                    if kind == "ellipsoidal" else
                    [("Easting", "E", "east", "metre"),
                     ("Northing", "N", "north", "metre")])
        for i, (nm, ab, orient, unit) in enumerate(fallback, 1):
            uw = (f"ANGLEUNIT[\"degree\",{_DEG_PER_RAD}]"
                  if unit == "degree" else "LENGTHUNIT[\"metre\",1]")
            w.append(f"AXIS[\"{nm.lower()} ({ab})\",{orient},"
                     f"ORDER[{i}],{uw}]")
            j.append({"name": nm, "abbreviation": ab,
                      "direction": orient, "unit": unit})
        return w, j
    db2 = E._load()["unit_of_measure"]
    for r in rows:
        nm, ab, orient = str(r[2]), str(r[3]), str(r[4])
        # qualified polar orientations ("South along 45°E") carry a
        # MERIDIAN qualifier in WKT2; the lowering never consumes it, so
        # emit the base direction word only
        o_word = orient.split()[0].lower()
        typ, factor = E._uom(str(r[9]))
        u_name = str(db2[str(r[9])][2])
        if typ == "angle":
            # angle axes are normalized to degree (see module docstring)
            uw, ju = f"ANGLEUNIT[\"degree\",{_DEG_PER_RAD}]", "degree"
        elif factor in (None, 1.0):
            uw, ju = "LENGTHUNIT[\"metre\",1]", "metre"
        else:
            # preserve non-metre linear axis units (survey feet etc.):
            # they carry the projected CRS's to_meter semantics
            uw = f"LENGTHUNIT[{_q(u_name)},{_num(factor)}]"
            ju = {"type": "LinearUnit", "name": u_name,
                  "conversion_factor": factor}
        order = int(r[7])
        w.append(f"AXIS[\"{nm.lower()} ({ab})\",{o_word},"
                 f"ORDER[{order}],{uw}]")
        j.append({"name": nm, "abbreviation": ab,
                  "direction": _ORIENT_JSON.get(o_word, o_word),
                  "unit": ju})
    return w, j


def _conversion(code) -> tuple[str, dict]:
    db = E._load()
    row = db["conversion"].get(str(code))
    if row is None:
        raise KeyError(f"EPSG conversion {code}")
    name, m_code, m_name = str(row[2]), str(row[5]), str(row[6])
    wparams, jparams = [], []
    for k in range(7):
        off = 7 + k * 6
        if off + 5 >= len(row) or row[off + 1] is None:
            break
        p_code, p_name = str(row[off + 1]), str(row[off + 2])
        value, uom = row[off + 3], row[off + 5]
        typ, _f = E._uom(str(uom))
        if typ == "angle":
            v = E._angle_deg(value, uom)
            uw, ju = f"ANGLEUNIT[\"degree\",{_DEG_PER_RAD}]", "degree"
        elif typ == "length":
            v = E._length_m(value, uom)
            uw, ju = "LENGTHUNIT[\"metre\",1]", "metre"
        else:  # scale
            v = E._scale(value, uom)
            uw, ju = "SCALEUNIT[\"unity\",1]", "unity"
        wparams.append(
            f"PARAMETER[{_q(p_name)},{_num(v)},{uw},"
            f"ID[\"EPSG\",{p_code}]]")
        jparams.append({"name": p_name, "value": v, "unit": ju,
                        "id": {"authority": "EPSG", "code": int(p_code)}})
    w = (f"CONVERSION[{_q(name)},METHOD[{_q(m_name)},"
         f"ID[\"EPSG\",{m_code}]]," + ",".join(wparams) + "]")
    j = {"name": name,
         "method": {"name": m_name,
                    "id": {"authority": "EPSG", "code": int(m_code)}},
         "parameters": jparams}
    return w, j


def _geog_parts(code) -> tuple[str, dict, str]:
    """(wkt body sans CS/ID, json sans cs/id, crs name) for a geodetic
    CRS code."""
    db = E._load()
    row = db["geodetic_crs"].get(str(code))
    if row is None:
        raise KeyError(f"EPSG geodetic CRS {code}")
    name = str(row[2])
    wd, wp, jd, pm_deg, _dn = _datum(row[8])
    w = f"{wd},{wp}"
    j = {"name": name, "datum": jd}
    return w, j, name


def epsg_to_wkt2(code) -> str:
    """WKT2:2019 text for an EPSG geographic/geocentric/projected CRS."""
    db = E._load()
    code = str(code)
    if code in db["geodetic_crs"]:
        row = db["geodetic_crs"][code]
        body, _j, name = _geog_parts(code)
        if row[4] == "geocentric":
            ax, _ = _axes(row[6], "Cartesian")
            cs = "CS[Cartesian,3]," + ",".join(ax) if len(ax) == 3 else \
                ("CS[Cartesian,3],AXIS[\"(X)\",geocentricX,ORDER[1],"
                 "LENGTHUNIT[\"metre\",1]],AXIS[\"(Y)\",geocentricY,"
                 "ORDER[2],LENGTHUNIT[\"metre\",1]],AXIS[\"(Z)\","
                 "geocentricZ,ORDER[3],LENGTHUNIT[\"metre\",1]]")
            return (f"GEODCRS[{_q(name)},{body},{cs},"
                    f"ID[\"EPSG\",{code}]]")
        ax, _ = _axes(row[6], "ellipsoidal")
        return (f"GEOGCRS[{_q(name)},{body},CS[ellipsoidal,{len(ax)}],"
                + ",".join(ax) + f",ID[\"EPSG\",{code}]]")
    if code in db["projected_crs"]:
        row = db["projected_crs"][code]
        base_code = str(row[7])
        gbody, _j, gname = _geog_parts(base_code)
        wconv, _jc = _conversion(row[9])
        ax, _ = _axes(row[5], "Cartesian")
        return (f"PROJCRS[{_q(row[2])},BASEGEOGCRS[{_q(gname)},{gbody},"
                f"ID[\"EPSG\",{base_code}]],{wconv},"
                f"CS[Cartesian,{len(ax)}]," + ",".join(ax)
                + f",ID[\"EPSG\",{code}]]")
    raise KeyError(f"EPSG:{code} is not an exportable CRS "
                   f"(geographic/geocentric/projected)")


def epsg_to_projjson(code) -> str:
    """PROJJSON (schema v0.7 shapes) for an EPSG CRS code."""
    db = E._load()
    code = str(code)
    schema = "https://proj.org/schemas/v0.7/projjson.schema.json"
    if code in db["geodetic_crs"]:
        row = db["geodetic_crs"][code]
        _w, j, name = _geog_parts(code)
        if row[4] == "geocentric":
            _ax, jax = _axes(row[6], "Cartesian")
            if len(jax) != 3:
                jax = [{"name": n, "abbreviation": a, "direction": d,
                        "unit": "metre"}
                       for n, a, d in (("Geocentric X", "X", "geocentricX"),
                                       ("Geocentric Y", "Y", "geocentricY"),
                                       ("Geocentric Z", "Z", "geocentricZ"))]
            obj = {"$schema": schema, "type": "GeodeticCRS", **j,
                   "coordinate_system": {"subtype": "Cartesian",
                                         "axis": jax},
                   "id": {"authority": "EPSG", "code": int(code)}}
            return json.dumps(obj)
        _ax, jax = _axes(row[6], "ellipsoidal")
        obj = {"$schema": schema, "type": "GeographicCRS", **j,
               "coordinate_system": {"subtype": "ellipsoidal", "axis": jax},
               "id": {"authority": "EPSG", "code": int(code)}}
        return json.dumps(obj)
    if code in db["projected_crs"]:
        row = db["projected_crs"][code]
        base_code = str(row[7])
        _w, jg, _name = _geog_parts(base_code)
        _ax, jgax = _axes(db["geodetic_crs"][base_code][6], "ellipsoidal")
        _wc, jc = _conversion(row[9])
        _axw, jax = _axes(row[5], "Cartesian")
        obj = {"$schema": schema, "type": "ProjectedCRS",
               "name": str(row[2]),
               "base_crs": {"type": "GeographicCRS", **jg,
                            "coordinate_system": {"subtype": "ellipsoidal",
                                                  "axis": jgax},
                            "id": {"authority": "EPSG",
                                   "code": int(base_code)}},
               "conversion": jc,
               "coordinate_system": {"subtype": "Cartesian", "axis": jax},
               "id": {"authority": "EPSG", "code": int(code)}}
        return json.dumps(obj)
    raise KeyError(f"EPSG:{code} is not an exportable CRS")
