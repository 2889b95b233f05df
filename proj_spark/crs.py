"""Ellipsoid model + registry.

Mirrors the derived-constant block PROJ computes once per operator at setup
(reference: /root/reference/src/proj_internal.h:538-562 — a, b, ra, e, es,
one_es, f, n, ... — and /root/reference/src/ell_set.cpp). Everything here is
driver-side, frozen, and closure-captured into kernels; nothing touches Spark.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field


@dataclass(frozen=True)
class Ellipsoid:
    """Reference ellipsoid with the derived constants kernels need.

    ``n`` (third flattening) drives the Poder/Engsager tmerc series;
    ``e2s`` (second eccentricity squared) drives the Bowring cart inverse.
    """

    name: str
    a: float                      # semi-major axis [m]
    rf: float = 0.0               # inverse flattening (0 => sphere)
    # derived (filled in __post_init__)
    f: float = field(init=False)
    b: float = field(init=False)
    es: float = field(init=False)   # first eccentricity squared e^2
    e: float = field(init=False)
    one_es: float = field(init=False)
    e2s: float = field(init=False)  # second eccentricity squared e'^2
    n: float = field(init=False)    # third flattening f/(2-f)
    ra: float = field(init=False)

    def __post_init__(self) -> None:
        f = 1.0 / self.rf if self.rf else 0.0
        es = 2 * f - f * f
        object.__setattr__(self, "f", f)
        object.__setattr__(self, "b", self.a * (1.0 - f))
        object.__setattr__(self, "es", es)
        object.__setattr__(self, "e", math.sqrt(es))
        object.__setattr__(self, "one_es", 1.0 - es)
        object.__setattr__(self, "e2s", es / (1.0 - es) if es < 1.0 else float("inf"))
        object.__setattr__(self, "n", f / (2.0 - f))
        object.__setattr__(self, "ra", 1.0 / self.a)

    @property
    def is_sphere(self) -> bool:
        return self.es == 0.0

    @staticmethod
    def sphere(R: float, name: str = "sphere") -> "Ellipsoid":
        return Ellipsoid(name=name, a=R, rf=0.0)


# The handful of ellipsoids the gie fixture corpus exercises
# (reference data: /root/reference/src/ell_set.cpp + data/proj.db seeds).
ELLIPSOIDS: dict[str, Ellipsoid] = {
    "GRS80": Ellipsoid("GRS80", 6378137.0, 298.257222101),
    "WGS84": Ellipsoid("WGS84", 6378137.0, 298.257223563),
    "bessel": Ellipsoid("bessel", 6377397.155, 299.1528128),
    "intl": Ellipsoid("intl", 6378388.0, 297.0),
    "clrk66": Ellipsoid("clrk66", 6378206.4, 294.9786982138982),
    "sphere": Ellipsoid("sphere", 6370997.0, 0.0),
    "aust_SA": Ellipsoid("aust_SA", 6378160.0, 298.25),
}


def resolve_ellipsoid(params: dict) -> Ellipsoid:
    """Resolve an ellipsoid from proj-string-style params.

    Accepts ``ellps=NAME``, ``R=<radius>``, or ``a=<m>`` with ``rf=`` / ``b=``,
    matching the subset of PROJ's ellipsoid spec the fixtures use.
    """
    for mod in ("R_C", "R_A", "R_V", "R_a", "R_g", "R_h", "R_lat_a", "R_lat_g"):
        if mod in params:
            raise NotImplementedError(f"sphere-ification modifier +{mod} not supported")
    if "ellps" in params:
        try:
            return ELLIPSOIDS[params["ellps"]]
        except KeyError:
            raise ValueError(f"unknown ellps {params['ellps']!r}") from None
    if "R" in params:
        return Ellipsoid.sphere(float(params["R"]))
    if "a" in params:
        a = float(params["a"])
        if "rf" in params:
            return Ellipsoid("custom", a, float(params["rf"]))
        if "b" in params:
            b = float(params["b"])
            if b == a:
                return Ellipsoid.sphere(a, name="custom")
            rf = a / (a - b)
            return Ellipsoid("custom", a, rf)
        return Ellipsoid.sphere(a, name="custom")
    # PROJ defaults to GRS80 for most modern ops
    return ELLIPSOIDS["GRS80"]
