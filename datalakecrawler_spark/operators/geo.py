"""Geospatial operators — haversine distance, blocked nearest-neighbor,
grid density (extension family; no geo columns exist in the fixtures, so
coordinates are derived deterministically from keys with the portable
md5-uniform idiom used across the engine — both engines synthesize the
exact same (lat, lon) per row, making the family fully oracle-checkable).

Scale notes (100 TB): the NN join is BLOCKED on nation (an equi-join
key), never an all-pairs cross product — at planetary cardinalities the
same shape generalizes to geohash/grid-cell blocking (equi-join on cell
plus a bounded neighborhood fan-out, exactly like the price-bin pattern
in ``join_theta_range``). Haversine itself is pure codegen'd math —
no UDF, no shuffle beyond the block join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from datalakecrawler_spark.io import load
from datalakecrawler_spark.registry import register

EARTH_R_KM = 6371.0

# Portable synthetic coordinate: u = md5-uniform(key|salt) ∈ [0,1);
# lat ∈ [-85, 85) (poles avoided), lon ∈ [-180, 180).
_U = "cast(('0x' || substring(md5(cast({k} as varchar) || '|{s}'), 1, 8)) as bigint) / 4294967296.0"
_LAT_SQL = f"({_U.format(k='{k}', s='lat')} * 170.0 - 85.0)"
_LON_SQL = f"({_U.format(k='{k}', s='lon')} * 360.0 - 180.0)"


def _u(key: Column, salt: str) -> Column:
    return (
        F.conv(
            F.substring(F.md5(F.concat(key.cast("string"), F.lit("|" + salt))), 1, 8),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )


def synth_lat(key: Column) -> Column:
    return _u(key, "lat") * 170.0 - 85.0


def synth_lon(key: Column) -> Column:
    return _u(key, "lon") * 360.0 - 180.0


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km. Pure built-in math — whole-stage
    codegen, no Python. Trig libm vs java.lang.Math can differ in the
    last ulp; every consumer rounds to ≥4 decimals, absorbing it."""
    dlat = F.radians(lat2 - lat1) / 2.0
    dlon = F.radians(lon2 - lon1) / 2.0
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon) * F.sin(dlon)
    )
    return 2.0 * EARTH_R_KM * F.asin(F.sqrt(a))


_HAV_SQL = (
    "2.0 * 6371.0 * asin(sqrt("
    "pow(sin(radians(({lat2}) - ({lat1})) / 2.0), 2)"
    " + cos(radians({lat1})) * cos(radians({lat2}))"
    " * pow(sin(radians(({lon2}) - ({lon1})) / 2.0), 2)))"
)


@register(
    "geo_haversine_nn",
    group="D",
    oracle=f"""
    with c as (
      select c_custkey, c_nationkey,
             {_LAT_SQL.format(k='c_custkey')} as lat,
             {_LON_SQL.format(k='c_custkey')} as lon
      from customer
    ),
    s as (
      select s_suppkey, s_nationkey,
             {_LAT_SQL.format(k='s_suppkey')} as lat,
             {_LON_SQL.format(k='s_suppkey')} as lon
      from supplier
    ),
    nn as (
      select c.c_custkey, c.c_nationkey,
             min({_HAV_SQL.format(lat1='c.lat', lon1='c.lon', lat2='s.lat', lon2='s.lon')}) as nearest_km
      from c join s on s.s_nationkey = c.c_nationkey
      group by c.c_custkey, c.c_nationkey
    )
    select c_nationkey,
           count(*) as n_customers,
           round(avg(nearest_km), 4) as avg_nearest_km,
           round(min(nearest_km), 4) as min_nearest_km,
           round(max(nearest_km), 4) as max_nearest_km
    from nn group by c_nationkey
    """,
)
def geo_haversine_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked nearest-neighbor: distance from each customer to its
    nearest same-nation supplier (synthetic coordinates), rolled up per
    nation. The join is an equi-join on nationkey (supplier side is tiny
    → broadcast), so the candidate set per customer is bounded by the
    block size — the geohash-cell pattern at planetary scale."""
    c = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        synth_lat(F.col("c_custkey")).alias("clat"),
        synth_lon(F.col("c_custkey")).alias("clon"),
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("c_nationkey"),
        synth_lat(F.col("s_suppkey")).alias("slat"),
        synth_lon(F.col("s_suppkey")).alias("slon"),
    )
    nn = (
        c.join(F.broadcast(s), "c_nationkey")
        .groupBy("c_custkey", "c_nationkey")
        .agg(
            F.min(
                haversine_km(
                    F.col("clat"), F.col("clon"), F.col("slat"), F.col("slon")
                )
            ).alias("nearest_km")
        )
    )
    return nn.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.avg("nearest_km"), 4).alias("avg_nearest_km"),
        F.round(F.min("nearest_km"), 4).alias("min_nearest_km"),
        F.round(F.max("nearest_km"), 4).alias("max_nearest_km"),
    )


@register(
    "geo_cell_radius_join",
    group="D",
    oracle=f"""
    with c as (
      select c_custkey, c_nationkey,
             {_LAT_SQL.format(k='c_custkey')} as lat,
             {_LON_SQL.format(k='c_custkey')} as lon
      from customer
    ),
    s as (
      select s_suppkey,
             {_LAT_SQL.format(k='s_suppkey')} as lat,
             {_LON_SQL.format(k='s_suppkey')} as lon
      from supplier
    ),
    ci as (select * from c where abs(lat) < 60 and lon > -170 and lon < 170),
    si as (select * from s where abs(lat) < 60 and lon > -170 and lon < 170),
    pairs as (
      select ci.c_custkey
      from ci join si
        on {_HAV_SQL.format(lat1='ci.lat', lon1='ci.lon', lat2='si.lat', lon2='si.lon')}
           <= 200.0
    ),
    cnt as (select c_custkey, count(*) as n from pairs group by 1),
    per as (
      select ci.c_nationkey, coalesce(cnt.n, 0) as n_within
      from ci left join cnt using (c_custkey)
    )
    select c_nationkey,
           count(*) as n_customers,
           cast(sum(n_within) as bigint) as n_pairs,
           round(avg(n_within), 6) as avg_within,
           max(n_within) as max_within
    from per group by c_nationkey
    """,
)
def geo_cell_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-blocked RADIUS join — the geohash-grid pattern that replaces
    the quadratic all-pairs distance join at scale, verified EXACT
    against a quadratic oracle: each customer is fanned out to its
    3×3 neighborhood of 4° grid cells (two tiny explodes), equi-joined
    to suppliers on the cell id, and candidates are confirmed with the
    exact haversine ≤ 200 km. Geometry makes the blocking lossless, not
    approximate: within |lat| < 60, a 200 km great circle spans ≤ 1.81°
    of latitude and ≤ 200/(R·cos 60°) = 3.60° of longitude, both under
    the 4° cell side, so every qualifying pair lands in adjacent cells
    (the anti-meridian strip lon ∉ (−170, 170) is excluded here; in
    production the lon cell id is taken mod 360/cell to close the seam).
    Zero-neighbor customers are kept via the left join back to the
    interior set. Scale: shuffle is an equi-join on cell ids with 9×
    fan-out of the smaller side only; no cross product anywhere — at
    100 TB both sides hash-partition by cell and the per-cell candidate
    set is bounded by local density, exactly like join_theta_range's
    price bins."""
    R_KM, CELL = 200.0, 4.0
    c = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        synth_lat(F.col("c_custkey")).alias("lat"),
        synth_lon(F.col("c_custkey")).alias("lon"),
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey"),
        synth_lat(F.col("s_suppkey")).alias("slat"),
        synth_lon(F.col("s_suppkey")).alias("slon"),
    )
    interior = lambda lat, lon: (
        (F.abs(lat) < 60) & (lon > -170) & (lon < 170)
    )
    ci = c.filter(interior(F.col("lat"), F.col("lon")))
    si = s.filter(interior(F.col("slat"), F.col("slon"))).select(
        "s_suppkey",
        "slat",
        "slon",
        F.floor(F.col("slat") / CELL).cast("long").alias("cl"),
        F.floor(F.col("slon") / CELL).cast("long").alias("cn"),
    )
    off = F.array(F.lit(-1), F.lit(0), F.lit(1))
    c9 = (
        ci.withColumn("dlat", F.explode(off))
        .withColumn("dlon", F.explode(off))
        .select(
            "c_custkey",
            "c_nationkey",
            "lat",
            "lon",
            (F.floor(F.col("lat") / CELL).cast("long") + F.col("dlat")).alias("cl"),
            (F.floor(F.col("lon") / CELL).cast("long") + F.col("dlon")).alias("cn"),
        )
    )
    # r9 optimization (guide §2.4/§3.1): the former shape confirmed
    # radius hits with an INNER cell join, counted per customer, then
    # LEFT-joined the counts back onto `ci` to restore zero-neighbor
    # customers — Spark planned that restore join as a SortMergeJoin
    # (one extra exchange + two sorts on c_custkey). A LEFT OUTER
    # broadcast cell join keeps every customer in flight instead (the
    # 9-cell fanout already carries each customer at least 9 rows), and
    # a conditional count collapses to exactly the same n_within:
    # unmatched cells contribute NULL suppliers (count 0), matched
    # candidates count only when the exact haversine confirms. One
    # aggregation replaces join+aggregate+join; the supplier side stays
    # the broadcast it always was, so no shuffle at any scale.
    within = (
        F.col("s_suppkey").isNotNull()
        & (
            haversine_km(
                F.col("lat"), F.col("lon"), F.col("slat"), F.col("slon")
            )
            <= R_KM
        )
    )
    per = (
        c9.join(F.broadcast(si), ["cl", "cn"], "left")
        .groupBy("c_custkey", "c_nationkey")
        .agg(F.sum(F.when(within, 1).otherwise(0)).alias("n_within"))
    )
    return per.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("n_within").alias("n_pairs"),
        F.round(F.avg("n_within"), 6).alias("avg_within"),
        F.max("n_within").alias("max_within"),
    )


@register(
    "geo_grid_density",
    group="E",
    oracle=f"""
    with pts as (
      select {_LAT_SQL.format(k='c_custkey')} as lat,
             {_LON_SQL.format(k='c_custkey')} as lon
      from customer
      union all
      select {_LAT_SQL.format(k='s_suppkey')} as lat,
             {_LON_SQL.format(k='s_suppkey')} as lon
      from supplier
    ),
    cells as (
      select cast(floor(lat / 30.0) as bigint) as cell_lat,
             cast(floor(lon / 30.0) as bigint) as cell_lon,
             count(*) as n_points
      from pts group by 1, 2
    )
    select cell_lat, cell_lon, n_points,
           round(n_points * 1.0 / sum(n_points) over (), 6) as density_share
    from cells
    """,
)
def geo_grid_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-cell density map: 30°×30° cells over the union of customer
    and supplier synthetic coordinates, with share-of-total. One union,
    one grouped count, one scalar window — the spatial-histogram shape a
    catalog profiler emits for geo columns. At 100 TB the cell id is the
    natural partition key (a geohash prefix), so the count is a plain
    map-side-combinable aggregation."""
    c = load(spark, sf_dir, "customer").select(
        synth_lat(F.col("c_custkey")).alias("lat"),
        synth_lon(F.col("c_custkey")).alias("lon"),
    )
    s = load(spark, sf_dir, "supplier").select(
        synth_lat(F.col("s_suppkey")).alias("lat"),
        synth_lon(F.col("s_suppkey")).alias("lon"),
    )
    pts = c.unionByName(s)
    cells = pts.groupBy(
        F.floor(F.col("lat") / 30.0).cast("long").alias("cell_lat"),
        F.floor(F.col("lon") / 30.0).cast("long").alias("cell_lon"),
    ).agg(F.count(F.lit(1)).alias("n_points"))
    from pyspark.sql.window import Window

    return cells.select(
        "cell_lat",
        "cell_lon",
        "n_points",
        F.round(
            F.col("n_points")
            / F.sum("n_points").over(Window.partitionBy()),
            6,
        ).alias("density_share"),
    )
