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


def haversine_pair_km(lat1, lon1, lat2, lon2) -> Column:
    """Great-circle distance (km) between two point columns."""
    c = lambda x: F.col(x) if isinstance(x, str) else x  # noqa: E731
    rlat1, rlon1, rlat2, rlon2 = (F.radians(c(x)) for x in (lat1, lon1, lat2, lon2))
    dlat = (rlat2 - rlat1) / 2.0
    dlon = (rlon2 - rlon1) / 2.0
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) * F.sin(dlon)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def geo_cell_join(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    *,
    lat_col: str = "lat",
    lon_col: str = "lon",
    cell_deg: float | None = None,
    left_id: str = "doc_id",
    right_id: str = "doc_id",
) -> DataFrame:
    """Distributed radius join: all (left, right) pairs within
    ``radius_km``, returned as (left_id, right_id, dist_km).

    This is the scale analogue of the reference's
    RecursivePrefixTreeStrategy (Spatial/Prefix/RecursivePrefixTreeStrategy.cs):
    the grid approximation pass becomes an equi-join on grid cells and
    the verify pass an exact haversine refine —

    - RIGHT points get ONE home cell (floor(lat/cell), floor(lon/cell)
      wrapped mod the lon cell count — dateline-safe);
    - LEFT points explode to every cell their radius disc can touch:
      lat cells from a fixed ±radius_deg band, lon cells from the
      LATITUDE-DEPENDENT span radius_deg / cos(lat) (clamped near the
      poles to cover the full ring), so coverage is exact at any
      latitude instead of the fixed-3x3 neighborhood that silently
      misses pairs above ~60°;
    - the join is a plain shuffle-hash equi-join on (lat_cell,
      lon_cell) — at 100 TB both sides partition by cell, no cartesian
      anywhere — followed by the exact distance filter; pairs reached
      through two wrapped cells are deduped before the refine.

    ``cell_deg`` defaults to radius_deg: ~3 lat cells per left point and
    a handful of lon cells off the equator."""
    import math

    radius_deg = math.degrees(radius_km / EARTH_RADIUS_KM)
    cell = float(cell_deg or radius_deg)
    n_lon = int(math.ceil(360.0 / cell))

    def wrap(col):
        return F.pmod(col, F.lit(n_lon))

    r = right.select(
        F.col(right_id).alias("_rid"),
        F.col(lat_col).alias("_rlat"),
        F.col(lon_col).alias("_rlon"),
        F.floor(F.col(lat_col) / cell).alias("lat_cell"),
        wrap(F.floor(F.col(lon_col) / cell)).alias("lon_cell"),
    )
    lat = F.col(lat_col)
    lon = F.col(lon_col)
    # The disc's true longitude half-width is asin(sin r / cos lat) —
    # STRICTLY larger than the linear r / cos(lat) — so bound it with
    # r / cos(band-edge latitude), which dominates the exact value and
    # degrades to the full ring (180°) when the band reaches a pole.
    edge_lat = F.least(F.abs(lat) + F.lit(radius_deg), F.lit(90.0))
    dlon = F.least(
        F.lit(radius_deg) / F.greatest(F.cos(F.radians(edge_lat)), F.lit(1e-6)),
        F.lit(180.0),
    )
    l = (
        left.select(
            F.col(left_id).alias("_lid"),
            lat.alias("_llat"),
            lon.alias("_llon"),
            F.explode(
                F.sequence(
                    F.floor((lat - radius_deg) / cell).cast("long"),
                    F.floor((lat + radius_deg) / cell).cast("long"),
                )
            ).alias("lat_cell"),
            F.floor((lon - dlon) / cell).cast("long").alias("_lo"),
            F.floor((lon + dlon) / cell).cast("long").alias("_hi"),
        )
        .select(
            "_lid", "_llat", "_llon", "lat_cell",
            F.explode(
                F.sequence(
                    "_lo", F.least(F.col("_hi"), F.col("_lo") + F.lit(n_lon - 1))
                )
            ).alias("raw_lon_cell"),
        )
        .select(
            "_lid", "_llat", "_llon", "lat_cell",
            wrap(F.col("raw_lon_cell")).alias("lon_cell"),
        )
    )
    pairs = (
        l.join(r, ["lat_cell", "lon_cell"])
        .select("_lid", "_llat", "_llon", "_rid", "_rlat", "_rlon")
        .dropDuplicates(["_lid", "_rid"])
    )
    dist = haversine_pair_km("_llat", "_llon", "_rlat", "_rlon")
    return (
        pairs.withColumn("dist_km", dist)
        .filter(F.col("dist_km") <= float(radius_km))
        .select(
            F.col("_lid").alias("left_id"),
            F.col("_rid").alias("right_id"),
            "dist_km",
        )
    )
