"""Raster-tile <-> vector assignment (slippy/web-mercator scheme).

Tile math is pure Column arithmetic (whole-stage codegen; no UDF): the
webmerc forward is one log/tan expression (reference merc.cpp:24-29 —
spherical kernel with k0=1), the tile index a floor-divide.

tile->polygon assignment is EXACT (no sampling): a polygon bbox maps to an
axis-aligned rectangle of tiles because tile x is monotone in lon and tile
y monotone in lat; enumerate driver-side and ship as a small DataFrame.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from proj_spark import cells
from proj_spark.functions import tile_x, tile_y
from proj_spark.sources.synth import Polygon


def assign_tiles(df: DataFrame, zoom: int, lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    return df.withColumn("tile_x", tile_x(F.col(lon_col), zoom)).withColumn(
        "tile_y", tile_y(F.col(lat_col), zoom)
    )


def polygon_tile_cover(polys: Sequence[Polygon], zoom: int) -> pd.DataFrame:
    """(tile_x, tile_y, polygon_id) for every tile intersecting each bbox."""
    n = 1 << zoom
    rows_x: list[np.ndarray] = []
    rows_y: list[np.ndarray] = []
    rows_id: list[np.ndarray] = []
    for p in polys:
        min_lon, min_lat, max_lon, max_lat = p.bbox
        # continuous lon (antimeridian rings exceed 180): enumerate then wrap
        x_lo, _ = cells.slippy_tile(np.array([min_lon if min_lon >= -180 else -180.0]), np.array([0.0]), zoom)
        tx_lo = int(np.floor((min_lon + 180.0) / 360.0 * n))
        tx_hi = int(np.floor((max_lon + 180.0) / 360.0 * n))
        _, ty_hi_arr = cells.slippy_tile(np.array([0.0]), np.array([min_lat]), zoom)
        _, ty_lo_arr = cells.slippy_tile(np.array([0.0]), np.array([max_lat]), zoom)
        ty_lo, ty_hi = int(ty_lo_arr[0]), int(ty_hi_arr[0])
        txs = np.arange(tx_lo, tx_hi + 1) % n
        tys = np.arange(ty_lo, ty_hi + 1)
        gx, gy = np.meshgrid(txs, tys)
        pair = np.unique(np.stack([gx.ravel(), gy.ravel()], axis=1), axis=0)
        rows_x.append(pair[:, 0])
        rows_y.append(pair[:, 1])
        rows_id.append(np.full(pair.shape[0], p.polygon_id, dtype=object))
    return pd.DataFrame(
        {
            "tile_x": np.concatenate(rows_x).astype(np.int64),
            "tile_y": np.concatenate(rows_y).astype(np.int64),
            "polygon_id": np.concatenate(rows_id),
        }
    )


def tile_vector_assign(
    points: DataFrame,
    polys: Sequence[Polygon],
    zoom: int,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Assign each point to its tile, then tiles to polygons (bbox level).

    The prefilter here is the *tile* cover; callers needing the exact
    polygon predicate chain this into spatial_join's ray-cast stage.
    """
    spark = points.sparkSession
    cover = spark.createDataFrame(polygon_tile_cover(polys, zoom))
    tiled = assign_tiles(points, zoom, lon_col, lat_col)
    return tiled.join(F.broadcast(cover), ["tile_x", "tile_y"])
