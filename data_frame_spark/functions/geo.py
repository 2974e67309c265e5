"""Geographic scalar functions (reference private/xml-common.rkt).

``haversine`` reproduces map-distance/degrees (xml-common.rkt:32-55):
great-circle meters between two lat/lon pairs, R = 6371000 m — as a
pure Column expression (JVM-side, codegen-friendly).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6371000.0


def haversine(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in meters (R = 6371000, matching
    xml-common.rkt:32-55)."""
    rlat1, rlon1 = F.radians(lat1), F.radians(lon1)
    rlat2, rlon2 = F.radians(lat2), F.radians(lon2)
    dlat = rlat2 - rlat1
    dlon = rlon2 - rlon1
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def cumulative_distance(
    lat: str, lon: str, order_by, partition_by=()
) -> Column:
    """Cumulative haversine distance over the declared order — the
    derived ``dst`` series GPX ingest synthesizes when absent
    (gpx.rkt:434-446)."""
    from pyspark.sql import Window

    w = Window.orderBy(*order_by)
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(*order_by)
    step = haversine(
        F.lag(F.col(lat)).over(w),
        F.lag(F.col(lon)).over(w),
        F.col(lat),
        F.col(lon),
    )
    return F.coalesce(
        F.sum(F.coalesce(step, F.lit(0.0))).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
        F.lit(0.0),
    )
