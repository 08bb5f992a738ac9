"""Spatial filtering/sorting as native Column predicates.

Reference: Lucene.Net.Spatial (Prefix/RecursivePrefixTreeStrategy.cs grid
filters, Vector/PointVectorStrategy.cs bbox + distance value source). A
prefix-tree encoding exists in Lucene because range scans over a term
dictionary are its only access path; a columnar engine filters lat/lon
columns directly — predicate pushdown to the parquet scan IS the grid
filter, and Catalyst handles the pruning. At 100 TB the win comes from
partitioning the table by a coarse geo cell (e.g. geohash prefix) so the
bbox predicate prunes whole partitions; these helpers stay pure Column
expressions either way.

Distance is the haversine great-circle formula on the IUGG mean earth
radius 6371.0088 km — the same model as the reference's
SloppyMath.Haversin (src/Lucene.Net/Util/SloppyMath.cs) without the
table-lookup approximations (exact trig; Catalyst evaluates it in
whole-stage codegen)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088


def bbox_predicate(
    lat_col: Column | str, lon_col: Column | str,
    min_lat: float, max_lat: float, min_lon: float, max_lon: float,
) -> Column:
    """Bounding-box containment as a pushdown-able predicate.

    Handles dateline crossing: if min_lon > max_lon the box wraps, and
    the longitude test becomes a disjunction (SpatialArgs bbox semantics
    in the reference's BBoxStrategy)."""
    lat = F.col(lat_col) if isinstance(lat_col, str) else lat_col
    lon = F.col(lon_col) if isinstance(lon_col, str) else lon_col
    lat_ok = (lat >= F.lit(float(min_lat))) & (lat <= F.lit(float(max_lat)))
    if min_lon <= max_lon:
        lon_ok = (lon >= F.lit(float(min_lon))) & (lon <= F.lit(float(max_lon)))
    else:
        lon_ok = (lon >= F.lit(float(min_lon))) | (lon <= F.lit(float(max_lon)))
    return lat_ok & lon_ok


def haversine_km(
    lat_col: Column | str, lon_col: Column | str, lat: float, lon: float
) -> Column:
    """Great-circle distance (km) from each row's point to (lat, lon) as a
    single Column expression: 2R asin(sqrt(sin^2(dphi/2) +
    cos(phi1) cos(phi2) sin^2(dlambda/2)))."""
    rlat = F.radians(F.col(lat_col) if isinstance(lat_col, str) else lat_col)
    rlon = F.radians(F.col(lon_col) if isinstance(lon_col, str) else lon_col)
    qlat = F.radians(F.lit(float(lat)))
    qlon = F.radians(F.lit(float(lon)))
    dlat = (rlat - qlat) / 2.0
    dlon = (rlon - qlon) / 2.0
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(rlat) * F.cos(qlat) * F.sin(dlon) * F.sin(dlon)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def geo_distance_filter(
    df: DataFrame, lat_col: str, lon_col: str,
    lat: float, lon: float, radius_km: float,
) -> DataFrame:
    """Circle filter: bbox prefilter (pushdown-able, prunes the scan —
    the analogue of the reference's grid approximation pass) + exact
    haversine check (the strategy's VerifyDocValues second pass)."""
    import math

    dlat = math.degrees(radius_km / EARTH_RADIUS_KM)
    coslat = max(math.cos(math.radians(lat)), 1e-9)
    dlon = math.degrees(radius_km / (EARTH_RADIUS_KM * coslat))
    pre = bbox_predicate(
        lat_col, lon_col, lat - dlat, lat + dlat, lon - dlon, lon + dlon
    )
    return df.filter(pre).filter(
        haversine_km(lat_col, lon_col, lat, lon) <= F.lit(float(radius_km))
    )


def geo_distance_topk(
    df: DataFrame, lat_col: str, lon_col: str,
    lat: float, lon: float, k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """k nearest rows by great-circle distance (distance-sorted top-k —
    PointVectorStrategy's distance ValueSource + TopFieldCollector). Ties
    break on id for determinism. TakeOrdered keeps the per-partition
    heaps at k — no global sort."""
    return (
        df.select(id_col, haversine_km(lat_col, lon_col, lat, lon).alias("dist_km"))
        .orderBy(F.asc("dist_km"), F.asc(id_col))
        .limit(k)
    )
