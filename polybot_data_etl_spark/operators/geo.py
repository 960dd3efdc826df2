"""Spatial operators: haversine distance banding and a grid-bucketed
radius self-join — the geo family over synthesized customer
coordinates.

Reference provenance: social-media ETL carries geotagged entities; the
concrete surface is [DES] per SURVEY.md §2. The fixtures ship no
lat/lon column, so coordinates are DERIVED deterministically from
c_custkey with portable integer mixing (same policy as the multimodal
family's derived payloads): both engines compute identical doubles
before any trig runs.

Scale posture (100 TB): distance banding is a zero-shuffle narrow
projection + one map-side-combined agg. The radius join is the
standard GRID spatial join: bucket every point into a cell sized to
the query radius, explode the PROBE side to its 3×3 neighbor cells
(bounded ×9 fan-out), equi-join on the cell key, then verify the exact
haversine — candidates are bounded by local point density, never the
global pair count. Trig last-ulp differences across libm
implementations are absorbed by comparing ROUNDED distances (repo
convention SURVEY §2.1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from polybot_data_etl_spark.catalog import table
from polybot_data_etl_spark.registry import register

_MIX = 2_654_435_761          # Knuth multiplicative constant (lat)
_MIX2 = 2_246_822_519         # xxhash prime (lon) — independent mix, so
                              # lat/lon are decorrelated (a shared product
                              # puts every point on a diagonal lattice)
_P = 1_000_000_007
_EARTH_KM = 6371.0
_RADIUS_KM = 200.0            # radius-join threshold
# Lat cell ≈ radius in degrees of latitude (111 km/deg). Longitude
# degrees SHRINK with cos(lat), so the radius join restricts to the
# mid-latitude band |lat| < 60° (cos ≥ 0.5 ⇒ 200 km ≤ 3.6° lon) and
# sizes lon cells to that worst case; away from the antimeridian
# (|lon| < 170°) no wrap handling is needed. A production variant
# swaps this fixed grid for S2/geohash cells, which handle poles and
# wrap natively — same join plan.
_CELL_LAT_DEG = 1.8
_CELL_LON_DEG = 3.6
_BAND_LAT = 60.0
_BAND_LON = 170.0


def _coords_sql() -> str:
    return f"""
        SELECT c_custkey,
               ((c_custkey * {_MIX}) % {_P}) % 18000 / 1e2 - 9e1 AS lat,
               ((c_custkey * {_MIX2}) % {_P}) % 36000 / 1e2 - 18e1 AS lon
        FROM customer
    """


def coords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-customer coordinates: integer-mixed key →
    lat ∈ [−90, 90), lon ∈ [−180, 180), exact on both engines."""
    c = table(spark, sf_dir, "customer")
    key = F.col("c_custkey")
    lat = ((key * _MIX) % _P) % 18000 / F.lit(100.0) - 90.0
    lon = ((key * _MIX2) % _P) % 36000 / F.lit(100.0) - 180.0
    return c.select("c_custkey", lat.alias("lat"), lon.alias("lon"))


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km (haversine, double precision)."""
    dphi = F.radians(lat2 - lat1) / 2
    dlmb = F.radians(lon2 - lon1) / 2
    a = (
        F.sin(dphi) * F.sin(dphi)
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.sin(dlmb)
        * F.sin(dlmb)
    )
    return 2 * _EARTH_KM * F.asin(F.sqrt(a))


_HAV_SQL = (
    "2 * 6371e0 * asin(sqrt("
    "sin(radians({lat2} - {lat1}) / 2) * sin(radians({lat2} - {lat1}) / 2)"
    " + cos(radians({lat1})) * cos(radians({lat2}))"
    " * sin(radians({lon2} - {lon1}) / 2)"
    " * sin(radians({lon2} - {lon1}) / 2)))"
)


@register(
    "q_geo_distance",
    oracle=f"""
    WITH pts AS ({_coords_sql()})
    SELECT band, cast(count(*) AS BIGINT) AS n,
           round(min(d), 2) AS d_min, round(max(d), 2) AS d_max
    FROM (
        SELECT cast(floor(
                   {_HAV_SQL.format(lat1="0e0", lon1="0e0",
                                    lat2="lat", lon2="lon")}
                   / 25e2) AS INTEGER) AS band,
               {_HAV_SQL.format(lat1="0e0", lon1="0e0",
                                lat2="lat", lon2="lon")} AS d
        FROM pts
    )
    GROUP BY band
    """,
)
def q_geo_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance banding from a reference point (0°N 0°E): per-2500-km
    band counts and min/max distance — the geofencing / catchment-area
    histogram. Narrow projection + one combinable agg; band ids come
    from floor() on the raw double (identical trig inputs both
    engines; the band edges are far from any point's last-ulp
    wobble)."""
    pts = coords(spark, sf_dir)
    d = haversine_km(
        F.lit(0.0), F.lit(0.0), F.col("lat"), F.col("lon")
    )
    banded = pts.select(
        F.floor(d / 2500.0).cast("int").alias("band"), d.alias("d")
    )
    return banded.groupBy("band").agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.min("d"), 2).alias("d_min"),
        F.round(F.max("d"), 2).alias("d_max"),
    )


@register(
    "q_geo_join",
    oracle=f"""
    WITH pts AS (
        SELECT * FROM ({_coords_sql()})
        WHERE abs(lat) < {_BAND_LAT} AND abs(lon) < {_BAND_LON}
    )
    SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
           round({_HAV_SQL.format(lat1="a.lat", lon1="a.lon",
                                  lat2="b.lat", lon2="b.lon")}, 2) AS d_km
    FROM pts a JOIN pts b ON a.c_custkey < b.c_custkey
    WHERE round({_HAV_SQL.format(lat1="a.lat", lon1="a.lon",
                                 lat2="b.lat", lon2="b.lon")}, 2)
          <= {_RADIUS_KM}
    """,
)
def q_geo_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius self-join: customer pairs within 200 km over the
    mid-latitude band (|lat| < 60°, away from the antimeridian) — the
    spatial join every geo-enrichment pipeline needs (store catchment
    overlap, nearby-user clustering); see _CELL_LON_DEG for why the
    fixed grid needs the band and how S2 cells remove it.

    Engine shape (the oracle states the SEMANTICS as a naive pair
    join; the engine never builds that pair space): grid-bucket each
    point into a radius-sized cell, explode the lower-key side to its
    3×3 neighbor cells, equi-join on the cell key, dedup the (≤9-way)
    candidate multiplicity with a distinct, then verify exact rounded
    haversine ≤ 200. Candidates are bounded by points-per-cell² ×
    cells (local density), not n² — the textbook grid spatial join; a
    production variant swaps the grid for geohash/S2 cells, same
    plan."""
    pts = coords(spark, sf_dir).filter(
        (F.abs(F.col("lat")) < _BAND_LAT) & (F.abs(F.col("lon")) < _BAND_LON)
    )
    ci = F.floor(F.col("lat") / _CELL_LAT_DEG).cast("long")
    cj = F.floor(F.col("lon") / _CELL_LON_DEG).cast("long")
    cells = pts.select(
        "c_custkey", "lat", "lon", ci.alias("ci"), cj.alias("cj")
    )
    # probe side: each point claims its 3×3 neighborhood
    offs = F.expr(
        "explode(array(-1, 0, 1))"
    )
    a = (
        cells.withColumn("di", offs)
        .withColumn("dj", F.expr("explode(array(-1, 0, 1))"))
        .select(
            F.col("c_custkey").alias("a_id"),
            F.col("lat").alias("a_lat"),
            F.col("lon").alias("a_lon"),
            (F.col("ci") + F.col("di")).alias("ci"),
            (F.col("cj") + F.col("dj")).alias("cj"),
        )
    )
    b = cells.select(
        F.col("c_custkey").alias("b_id"),
        F.col("lat").alias("b_lat"),
        F.col("lon").alias("b_lon"),
        "ci",
        "cj",
    )
    cand = (
        a.join(b, ["ci", "cj"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "a_lat", "a_lon", "b_lat", "b_lon")
        .distinct()
    )
    d = F.round(
        haversine_km(
            F.col("a_lat"), F.col("a_lon"), F.col("b_lat"), F.col("b_lon")
        ),
        2,
    )
    return (
        cand.withColumn("d_km", d)
        .filter(F.col("d_km") <= _RADIUS_KM)
        .select("a_id", "b_id", "d_km")
    )


_GRID_DEG = 10.0  # coarse density grid (10° cells)


@register(
    "q_geo_grid",
    oracle=f"""
    WITH pts AS ({_coords_sql()}),
    cells AS (
        SELECT CAST(floor(lat / {_GRID_DEG}) AS BIGINT) AS cell_lat,
               CAST(floor(lon / {_GRID_DEG}) AS BIGINT) AS cell_lon,
               count(*) AS n
        FROM pts GROUP BY 1, 2
    )
    SELECT cell_lat, cell_lon, CAST(n AS BIGINT) AS n
    FROM cells
    ORDER BY n DESC, cell_lat, cell_lon
    LIMIT 25
    """,
)
def q_geo_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial density grid: bucket every point into a 10°×10° cell
    and report the 25 densest cells — the heatmap/hot-region readout,
    and the load-model for sizing the radius join's cell grid.

    floor(lat/10) is exact on both engines (the derived coords carry
    exactly 2 decimals), so cell keys are portable integers.  Shape:
    zero-shuffle narrow projection → ONE map-side-combined hash agg on
    the cell key (≤ 18×36 = 648 groups at any corpus size) → top-k via
    TakeOrderedAndProject (no global sort).  At 100 TB this is the
    degenerate-cheap query shape: the combine collapses everything
    scan-side."""
    pts = coords(spark, sf_dir)
    cells = (
        pts.groupBy(
            F.floor(F.col("lat") / _GRID_DEG).cast("bigint").alias("cell_lat"),
            F.floor(F.col("lon") / _GRID_DEG).cast("bigint").alias("cell_lon"),
        )
        .agg(F.count("*").alias("n"))
    )
    return (
        cells.select("cell_lat", "cell_lon", F.col("n").cast("bigint").alias("n"))
        .orderBy(F.desc("n"), "cell_lat", "cell_lon")
        .limit(25)
    )
