"""UTM -> WGS84 reprojection.

The reference calls pyproj ``Transformer.from_crs('EPSG:32719',
'EPSG:4326')`` row-by-row in Python (src/webapp/query_service.py:235-241;
scripts/build_map_points.py:55-59). Here it's a vectorized pandas UDF:
pyproj when available on the executors, otherwise a numpy closed-form
inverse transverse Mercator (Snyder series, WGS84) accurate to
~1e-6 deg (<0.1 m) inside the Santiago bounding box — far below
stop-coordinate precision.

The whole computation is nested inside the UDF so cloudpickle ships it
by value — executors don't need this package on their PYTHONPATH.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_LL_SCHEMA = T.StructType(
    [
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
    ]
)


def _utm_inverse_np(
    x: np.ndarray, y: np.ndarray, zone: int = 19, south: bool = True
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized inverse transverse Mercator (Snyder 1987
    eq. 8-17..8-25), WGS84 ellipsoid. Kept importable for direct use."""
    a = 6378137.0
    f = 1 / 298.257223563
    e2 = f * (2 - f)
    k0 = 0.9996
    e1 = (1 - np.sqrt(1 - e2)) / (1 + np.sqrt(1 - e2))

    x = np.asarray(x, dtype="float64") - 500000.0
    y = np.asarray(y, dtype="float64")
    if south:
        y = y - 10000000.0
    m = y / k0
    mu = m / (a * (1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256))
    phi1 = (
        mu
        + (3 * e1 / 2 - 27 * e1**3 / 32) * np.sin(2 * mu)
        + (21 * e1**2 / 16 - 55 * e1**4 / 32) * np.sin(4 * mu)
        + (151 * e1**3 / 96) * np.sin(6 * mu)
        + (1097 * e1**4 / 512) * np.sin(8 * mu)
    )
    sin1, cos1, tan1 = np.sin(phi1), np.cos(phi1), np.tan(phi1)
    ep2 = e2 / (1 - e2)
    c1 = ep2 * cos1**2
    t1 = tan1**2
    n1 = a / np.sqrt(1 - e2 * sin1**2)
    r1 = a * (1 - e2) / (1 - e2 * sin1**2) ** 1.5
    d = x / (n1 * k0)
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


def utm_to_wgs84(x: Column, y: Column) -> Column:
    """Struct column ``(lat, lon)`` from UTM 19S easting/northing."""

    @F.pandas_udf(_LL_SCHEMA)
    def _convert(xs, ys):
        import numpy as _np
        import pandas as _pd

        try:
            from pyproj import Transformer

            transformer = Transformer.from_crs(
                "EPSG:32719", "EPSG:4326", always_xy=True
            )
        except Exception:
            transformer = None

        def inverse(xv, yv):
            a = 6378137.0
            f = 1 / 298.257223563
            e2 = f * (2 - f)
            k0 = 0.9996
            e1 = (1 - _np.sqrt(1 - e2)) / (1 + _np.sqrt(1 - e2))
            xx = xv - 500000.0
            yy = yv - 10000000.0
            m = yy / k0
            mu = m / (a * (1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256))
            phi1 = (
                mu
                + (3 * e1 / 2 - 27 * e1**3 / 32) * _np.sin(2 * mu)
                + (21 * e1**2 / 16 - 55 * e1**4 / 32) * _np.sin(4 * mu)
                + (151 * e1**3 / 96) * _np.sin(6 * mu)
                + (1097 * e1**4 / 512) * _np.sin(8 * mu)
            )
            sin1, cos1, tan1 = _np.sin(phi1), _np.cos(phi1), _np.tan(phi1)
            ep2 = e2 / (1 - e2)
            c1 = ep2 * cos1**2
            t1 = tan1**2
            n1 = a / _np.sqrt(1 - e2 * sin1**2)
            r1 = a * (1 - e2) / (1 - e2 * sin1**2) ** 1.5
            d = xx / (n1 * k0)
            lat = phi1 - (n1 * tan1 / r1) * (
                d**2 / 2
                - (5 + 3 * t1 + 10 * c1 - 4 * c1**2 - 9 * ep2) * d**4 / 24
                + (61 + 90 * t1 + 298 * c1 + 45 * t1**2 - 252 * ep2 - 3 * c1**2)
                * d**6
                / 720
            )
            lon = (
                d
                - (1 + 2 * t1 + c1) * d**3 / 6
                + (5 - 2 * c1 + 28 * t1 - 3 * c1**2 + 8 * ep2 + 24 * t1**2)
                * d**5
                / 120
            ) / cos1
            lon0 = _np.deg2rad(-69.0)  # zone 19 central meridian
            return _np.rad2deg(lat), _np.rad2deg(lon) + _np.rad2deg(lon0)

        xv = _pd.to_numeric(xs, errors="coerce").to_numpy(dtype="float64")
        yv = _pd.to_numeric(ys, errors="coerce").to_numpy(dtype="float64")
        if transformer is not None:
            lon, lat = transformer.transform(xv, yv)
        else:
            lat, lon = inverse(xv, yv)
        bad = _np.isnan(xv) | _np.isnan(yv)
        lat = _np.where(bad, _np.nan, lat)
        lon = _np.where(bad, _np.nan, lon)
        return _pd.DataFrame({"lat": lat, "lon": lon})

    return _convert(x.try_cast("double"), y.try_cast("double"))
