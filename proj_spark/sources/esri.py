"""ESRI authority CRS codes — `ESRI:54008`-style world projections,
`ESRI:102100` web mercator, etc.

The reference's data/sql/esri.sql defines the ESRI projected-CRS
catalogue; the rows for the self-contained codes (the World_* 53xxx /
54xxx series and the web-mercator family) embed their full ESRI-WKT1
definition in the text column. This module resolves an ESRI code from a
bundled data-only extract of exactly those rows
(tests/fixtures/epsg_sql/esri_projected_wkt.sql) and lowers the embedded
WKT through the sources.wkt ESRI dialect — one shared lowering, no
second catalogue format.
"""

from __future__ import annotations

import os
import re

_ROW_RE = re.compile(
    r"VALUES\('ESRI','(\d+)','([^']*)'.*?'(PROJCS\[.*\])'")

_cache: dict | None = None


def _catalogue() -> dict:
    global _cache
    if _cache is None:
        from proj_spark.sources.epsg import _SQL_DIRS

        m: dict = {}
        for d in _SQL_DIRS:
            for fname in ("esri_projected_wkt.sql", "esri.sql"):
                p = os.path.join(d, fname)
                if not os.path.exists(p):
                    continue
                with open(p, errors="replace") as f:
                    for line in f:
                        if "PROJCS[" not in line:
                            continue
                        g = _ROW_RE.search(line)
                        if g:
                            m.setdefault(g.group(1), g.group(3))
                break
            if m:
                break
        _cache = m
    return _cache


def esri_to_proj(code: str | int) -> str:
    """proj-string for an `ESRI:NNNNN` (or bare `NNNNN`) projected-CRS
    code whose definition is in the bundled extract."""
    from proj_spark.sources.wkt import wkt_to_proj

    code = str(code).strip()
    if ":" in code:
        code = code.split(":", 1)[1]
    wkt = _catalogue().get(code)
    if wkt is None:
        raise KeyError(
            f"ESRI:{code} not in the bundled catalogue (only codes whose "
            f"esri.sql row embeds a WKT definition are resolvable)")
    return wkt_to_proj(wkt)
