"""UTM -> WGS84 reprojection.

The reference calls pyproj ``Transformer.from_crs('EPSG:32719',
'EPSG:4326')`` row-by-row in Python (src/webapp/query_service.py:235-241;
scripts/build_map_points.py:55-59). Here it's a vectorized pandas UDF:
pyproj when available, otherwise a numpy closed-form inverse transverse
Mercator (Snyder series, WGS84) accurate to ~1e-6 deg (<0.1 m) inside
the Santiago bounding box — far below stop-coordinate precision.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - optional dependency
    from pyproj import Transformer

    _TRANSFORMER = Transformer.from_crs("EPSG:32719", "EPSG:4326", always_xy=True)
except Exception:  # pragma: no cover
    _TRANSFORMER = None

# WGS84 ellipsoid
_A = 6378137.0
_F = 1 / 298.257223563
_E2 = _F * (2 - _F)
_K0 = 0.9996
_E1 = (1 - np.sqrt(1 - _E2)) / (1 + np.sqrt(1 - _E2))


def _utm_inverse_np(
    x: np.ndarray, y: np.ndarray, zone: int = 19, south: bool = True
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized inverse transverse Mercator (Snyder 1987 eq. 8-17..8-25)."""
    x = np.asarray(x, dtype="float64") - 500000.0
    y = np.asarray(y, dtype="float64")
    if south:
        y = y - 10000000.0
    m = y / _K0
    mu = m / (_A * (1 - _E2 / 4 - 3 * _E2**2 / 64 - 5 * _E2**3 / 256))
    phi1 = (
        mu
        + (3 * _E1 / 2 - 27 * _E1**3 / 32) * np.sin(2 * mu)
        + (21 * _E1**2 / 16 - 55 * _E1**4 / 32) * np.sin(4 * mu)
        + (151 * _E1**3 / 96) * np.sin(6 * mu)
        + (1097 * _E1**4 / 512) * np.sin(8 * mu)
    )
    sin1, cos1, tan1 = np.sin(phi1), np.cos(phi1), np.tan(phi1)
    ep2 = _E2 / (1 - _E2)
    c1 = ep2 * cos1**2
    t1 = tan1**2
    n1 = _A / np.sqrt(1 - _E2 * sin1**2)
    r1 = _A * (1 - _E2) / (1 - _E2 * sin1**2) ** 1.5
    d = x / (n1 * _K0)
    lat = phi1 - (n1 * tan1 / r1) * (
        d**2 / 2
        - (5 + 3 * t1 + 10 * c1 - 4 * c1**2 - 9 * ep2) * d**4 / 24
        + (61 + 90 * t1 + 298 * c1 + 45 * t1**2 - 252 * ep2 - 3 * c1**2) * d**6 / 720
    )
    lon = (
        d
        - (1 + 2 * t1 + c1) * d**3 / 6
        + (5 - 2 * c1 + 28 * t1 - 3 * c1**2 + 8 * ep2 + 24 * t1**2) * d**5 / 120
    ) / cos1
    lon0 = np.deg2rad(-183.0 + 6 * zone)  # zone 19 -> -69
    return np.rad2deg(lat), np.rad2deg(lon) + np.rad2deg(lon0)


@F.pandas_udf(
    T.StructType(
        [
            T.StructField("lat", T.DoubleType()),
            T.StructField("lon", T.DoubleType()),
        ]
    )
)
def _utm19s_to_wgs84(x: pd.Series, y: pd.Series) -> pd.DataFrame:
    xv = pd.to_numeric(x, errors="coerce").to_numpy(dtype="float64")
    yv = pd.to_numeric(y, errors="coerce").to_numpy(dtype="float64")
    if _TRANSFORMER is not None:  # pragma: no cover
        lon, lat = _TRANSFORMER.transform(xv, yv)
    else:
        lat, lon = _utm_inverse_np(xv, yv)
    bad = np.isnan(xv) | np.isnan(yv)
    lat = np.where(bad, np.nan, lat)
    lon = np.where(bad, np.nan, lon)
    return pd.DataFrame({"lat": lat, "lon": lon})


def utm_to_wgs84(x: Column, y: Column) -> Column:
    """Struct column ``(lat, lon)`` from UTM 19S easting/northing."""
    return _utm19s_to_wgs84(x.try_cast("double"), y.try_cast("double"))
