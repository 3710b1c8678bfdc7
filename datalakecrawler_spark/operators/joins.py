"""Group D — joins (SURVEY.md §2.D) + headline star join.

Scale strategy per join type:
- dims (region/nation/customer at most SFs) → explicit ``F.broadcast``
  so the big side never shuffles (D1, D11).
- fact⋈fact equi joins → let AQE pick sort-merge vs shuffled-hash; both
  shuffle on the key, which is the unavoidable minimum (D2).
- range/theta joins → never a raw cross product: bucketize the range
  key to width ≥ the radius and equi-join on (bin, bin±1), turning an
  O(N·M) nested loop into a shuffle join with a 3× candidate fan-out
  (D9). At 100 TB this is the only formulation that finishes.
- as-of join (no native Spark support) → union-tag + running
  last(ignorenulls) window: one shuffle by key, no range explosion
  (D10); semantically DuckDB's ASOF JOIN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from datalakecrawler_spark.io import load
from datalakecrawler_spark.memo import memoized_checkpoint
from datalakecrawler_spark.registry import AVG_D, SUM_D, davg, dsum, register

_BASKET_MEMO: dict = {}


def _basket_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The collapsed distinct (order, brand) basket table shared by
    orders_market_basket (pair supports) and orders_basket_lift
    (rules): the first materialization of every association-mining
    pass. Memoized per (applicationId, sf_dir) like the banded MinHash
    signature table — the lineitem⋈part + distinct (the only
    fact-sized shuffle in this family) runs once per corpus snapshot,
    and the checkpoint also stops Catalyst re-running it per self-join
    branch (self-joins do not share subtrees)."""
    def build() -> DataFrame:
        li = load(spark, sf_dir, "lineitem")
        p = load(spark, sf_dir, "part")
        return (
            li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .select("l_orderkey", "p_brand")
            .distinct()
        )

    return memoized_checkpoint(_BASKET_MEMO, spark, sf_dir, build)


@register(
    "join_inner_broadcast",
    group="D",
    oracle="""
    select n_nationkey, n_name, r_name as region_name
    from nation join region on n_regionkey = r_regionkey
    """,
)
def join_inner_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1: small-dim equi join, broadcast pinned."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name", F.col("r_name").alias("region_name")
    )


@register(
    "join_inner_shuffle",
    group="D",
    oracle="""
    select l_orderkey, l_linenumber, o_orderdate, l_extendedprice
    from lineitem join orders on l_orderkey = o_orderkey
    where o_orderstatus = 'F'
    """,
)
def join_inner_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2: large equi join (lineitem⋈orders). AQE selects SMJ or converts
    to broadcast at runtime if the filtered side shrinks enough."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_linenumber", "o_orderdate", "l_extendedprice"
    )


@register(
    "join_left_outer",
    group="D",
    oracle="""
    select c_custkey, o_orderkey, o_totalprice
    from customer left join orders
      on o_custkey = c_custkey and o_orderstatus = 'P'
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3: left outer — customers without a 'P' order get NULL fill."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "o_orderkey", "o_totalprice"
    )


@register(
    "join_right_outer",
    group="D",
    oracle="""
    select c_custkey, o_orderkey, o_totalprice
    from (select * from orders where o_orderstatus = 'P') o
    right join customer on o_custkey = c_custkey
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4: right outer — mirror of D3."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "P")
    return o.join(c, c.c_custkey == o.o_custkey, "right").select(
        "c_custkey", "o_orderkey", "o_totalprice"
    )


@register(
    "join_full_outer",
    group="D",
    oracle="""
    select c_custkey, c_name, o_orderkey
    from (select * from customer where c_custkey <= 120) c
    full join (select * from orders
               where o_custkey between 80 and 200 and o_orderstatus = 'F') o
      on c_custkey = o_custkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5: full outer with orphans manufactured on both sides (the FK
    graph is clean, so unfiltered tables would have none)."""
    c = load(spark, sf_dir, "customer").where(F.col("c_custkey") <= 120)
    o = load(spark, sf_dir, "orders").where(
        F.col("o_custkey").between(80, 200) & (F.col("o_orderstatus") == "F")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "full").select(
        "c_custkey", "c_name", "o_orderkey"
    )


@register(
    "join_left_semi",
    group="D",
    oracle="""
    select c_custkey, c_name from customer
    where exists (select 1 from orders
                  where o_custkey = c_custkey and o_orderstatus = 'F')
    """,
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6: EXISTS → left_semi (no row multiplication, no right columns)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_left_anti",
    group="D",
    oracle="""
    select c_custkey, c_name from customer
    where not exists (select 1 from orders where o_custkey = c_custkey)
    """,
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7: NOT EXISTS → left_anti."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "semi_anti_join",
    group="D",
    oracle="""
    select (select count(*) from customer
            where c_custkey in (select o_custkey from orders)) as has_orders,
           (select count(*) from customer
            where c_custkey not in (select o_custkey from orders)) as no_orders
    """,
)
def semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Headline (BASELINE.md): one row (customers with orders, without).
    o_custkey is never NULL, so NOT IN ≡ anti join."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    has = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .agg(F.count(F.lit(1)).alias("has_orders"))
    )
    hasnt = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("no_orders"))
    )
    return has.crossJoin(hasnt)


@register(
    "join_cross",
    group="D",
    oracle="""
    select r_name, s as status from region
    cross join (select distinct o_orderstatus as s from orders) t
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8: cross join of two small derived sets (5 × 3 rows)."""
    r = load(spark, sf_dir, "region").select("r_name")
    s = (
        load(spark, sf_dir, "orders")
        .select(F.col("o_orderstatus").alias("status"))
        .distinct()
    )
    return r.crossJoin(s)


@register(
    "join_theta_range",
    group="D",
    oracle="""
    select a.p_partkey, count(*) as n_close
    from part a join part b
      on b.p_partkey <> a.p_partkey
     and abs(a.p_retailprice - b.p_retailprice) <= 0.5
    group by a.p_partkey
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D9: range self-join — parts within ±0.5 of each other's price.

    Scale formulation: bucketize price into width-1.0 bins (width ≥ 2×
    radius would double-count; width ≥ radius guarantees a match lies in
    the same or adjacent bin) and equi-join on candidate bins. Each pair
    is found exactly once because the right side explodes to exactly the
    3 bins {b-1, b, b+1} and the left side's bin matches one of them.
    The oracle states the naive O(N²) semantics; this plan is the one
    that survives 100 TB (shuffle join on bin, 3× fan-out).
    """
    p = load(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    a = p.withColumn("bin", F.floor("p_retailprice"))
    b = (
        p.withColumnRenamed("p_partkey", "b_partkey")
        .withColumnRenamed("p_retailprice", "b_price")
        .withColumn("bin0", F.floor("b_price"))
        .withColumn(
            "bin",
            F.explode(F.array(F.col("bin0") - 1, F.col("bin0"), F.col("bin0") + 1)),
        )
        .drop("bin0")
    )
    return (
        a.join(b, "bin")
        .where(
            (F.col("b_partkey") != F.col("p_partkey"))
            & (F.abs(F.col("p_retailprice") - F.col("b_price")) <= 0.5)
        )
        .groupBy("p_partkey")
        .agg(F.count(F.lit(1)).alias("n_close"))
    )


@register(
    "join_asof",
    group="D",
    oracle="""
    select p.event_id, p.user_id, p.ts as purchase_ts, c.ts as last_click_ts
    from (select * from events where event_type = 'purchase') p
    asof join (select * from events where event_type = 'click') c
      on p.user_id = c.user_id and p.ts >= c.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D10: as-of join — each purchase matched to the user's latest click
    at ts ≤ purchase ts.

    Spark has no native ASOF: union-tag both streams, sort within user by
    (ts, clicks-first on ties), and carry the last non-null click ts with
    a running last(ignorenulls) window. One shuffle on user_id, state is
    a single value per row — linear at any scale, unlike a range join.
    Clicks sort before purchases at equal ts, matching ASOF's >= bound.
    """
    e = load(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("ts").alias("click_ts"),
        F.lit(1).alias("is_click"),
        F.lit(None).cast("long").alias("event_id"),
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast("timestamp").alias("click_ts"),
        F.lit(0).alias("is_click"),
        "event_id",
    )
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_click").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        clicks.unionByName(purchases)
        .withColumn("last_click_ts", F.last("click_ts", ignorenulls=True).over(w))
        .where((F.col("is_click") == 0) & F.col("last_click_ts").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "last_click_ts",
        )
    )


_Q3_ORACLE = f"""
    select n_name, c_mktsegment,
           {SUM_D.format('l_extendedprice * (1 - l_discount)')} as revenue,
           count(distinct o_orderkey) as n_orders
    from lineitem
    join orders on l_orderkey = o_orderkey
    join customer on o_custkey = c_custkey
    join nation on c_nationkey = n_nationkey
    where o_orderdate >= timestamp '1996-01-01'
    group by n_name, c_mktsegment
    order by revenue desc, n_name, c_mktsegment
    limit 20
"""


def _star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan: pre-aggregate lineitem revenue per order FIRST (600k → 150k
    rows, micro-unit long partial sums), then join the dims. After the
    pre-agg each order is one row, so count(distinct o_orderkey)
    becomes a plain count(*) — no expand, one fewer shuffle. Integer
    micro-sums re-aggregate associatively, so the group revenue equals
    the flat SUM_D the oracle states. At 100 TB the orderkey pre-agg
    output is already hash-partitioned on the join key, so the
    orders join reuses that partitioning when it can't broadcast."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(F.floor(disc * 1e6 + 0.5)).alias("rev_micro")
    )
    return (
        per_order.join(o, per_order.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "c_mktsegment")
        .agg(
            (F.sum("rev_micro").cast("double") / 1e6).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.col("revenue").desc(), "n_name", "c_mktsegment")
        .limit(20)
    )


@register("q3_star_join", group="D", oracle=_Q3_ORACLE)
def q3_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Headline (BASELINE.md): 4-way star join + agg + top-20. The date
    filter pushes into the orders scan; customer and nation broadcast
    (at 100 TB customer may exceed the threshold — AQE then falls back
    to a shuffle join on the same plan)."""
    return _star_join(spark, sf_dir)


@register("join_multiway_star", group="D", oracle=_Q3_ORACLE)
def join_multiway_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D11: SURVEY §2 name for the star join (same plan as q3_star_join)."""
    return _star_join(spark, sf_dir)


@register(
    "join_self",
    group="D",
    oracle="""
    select o1.o_orderkey as orderkey, min(o2.o_orderdate) as next_orderdate
    from orders o1 join orders o2
      on o1.o_custkey = o2.o_custkey and o2.o_orderdate > o1.o_orderdate
    group by o1.o_orderkey
    """,
)
def join_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D12: self join — each order's next order date for the same
    customer. (A window lead() would be cheaper; this entry exercises
    the aliased self-join path deliberately.)"""
    o = load(spark, sf_dir, "orders")
    o1 = o.alias("o1")
    o2 = o.alias("o2")
    return (
        o1.join(
            o2,
            (F.col("o1.o_custkey") == F.col("o2.o_custkey"))
            & (F.col("o2.o_orderdate") > F.col("o1.o_orderdate")),
        )
        .groupBy(F.col("o1.o_orderkey").alias("orderkey"))
        .agg(F.min("o2.o_orderdate").alias("next_orderdate"))
    )


@register(
    "join_skew_salted",
    group="D",
    oracle=f"""
    select l_returnflag, flag_desc, count(*) as cnt,
           {SUM_D.format('l_quantity')} as sum_qty
    from lineitem
    join (values ('A', 'returned'), ('N', 'kept'), ('R', 'refunded'))
         as dim(flag, flag_desc)
      on l_returnflag = flag
    group by 1, 2
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-ext: salted join for pathologically skewed keys.

    l_returnflag has only 3 values → a plain shuffle join puts ~200k
    rows (sf0.1) in 3 reducer partitions while the rest idle. Salting:
    the big side gets salt = crc32(rowid) % 16 (salt choice affects
    ONLY partition placement, never results), the small side replicates
    ×16, and the join key becomes (flag, salt) — 48 evenly-loaded
    partitions. AQE's skew-join split handles moderate skew on its own;
    explicit salting is the pattern for the extreme case (hot key >>
    one executor's memory). The oracle states plain-join semantics —
    results are salt-invariant by construction.
    """
    li = load(spark, sf_dir, "lineitem").withColumn(
        "salt",
        (F.crc32(F.concat_ws("#", "l_orderkey", "l_linenumber")) % 16).cast("int"),
    )
    dim = spark.createDataFrame(
        [("A", "returned"), ("N", "kept"), ("R", "refunded")],
        ["flag", "flag_desc"],
    ).crossJoin(spark.range(16).select(F.col("id").cast("int").alias("salt")))
    return (
        li.join(dim, (li.l_returnflag == dim.flag) & (li.salt == dim.salt))
        .groupBy("l_returnflag", "flag_desc")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("l_quantity").alias("sum_qty"))
    )


@register(
    "q5_local_supplier",
    group="D",
    oracle=f"""
    select n_name,
           {SUM_D.format('l_extendedprice * (1 - l_discount)')} as revenue
    from customer
    join orders on c_custkey = o_custkey
    join lineitem on l_orderkey = o_orderkey
    join supplier on l_suppkey = s_suppkey
    join nation on s_nationkey = n_nationkey
    join region on n_regionkey = r_regionkey
    where r_name = 'ASIA'
      and c_nationkey = s_nationkey
      and o_orderdate >= timestamp '1996-01-01'
      and o_orderdate < timestamp '1997-01-01'
    group by n_name
    """,
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-ext: TPC-H Q5 shape — 6-table join with the local-supplier
    constraint (customer and supplier share a nation). Join order:
    facts first on their keys, dims broadcast; the region filter
    reaches the region scan and cascades through the broadcast joins."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


_Q10_REV = "l_extendedprice * (1 - l_discount)"


@register(
    "q10_returned_items",
    group="D",
    oracle=f"""
    select c.c_custkey, c.c_name, n.n_name,
           {SUM_D.format(_Q10_REV)} as revenue
    from customer c
    join orders o on c.c_custkey = o.o_custkey
    join lineitem l on o.o_orderkey = l.l_orderkey
    join nation n on c.c_nationkey = n.n_nationkey
    where l.l_returnflag = 'R'
      and o.o_orderdate >= timestamp '1996-10-01'
      and o.o_orderdate < timestamp '1997-01-01'
    group by 1, 2, 3
    order by revenue desc, c.c_custkey
    limit 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-ext: TPC-H Q10 shape — top-20 customers by revenue lost to
    returned items in one quarter. Plan: the returnflag filter pushes
    into the lineitem scan and the date filter into orders (both prune
    parquet row groups); lineitem⋈orders shuffles on orderkey (the
    unavoidable fact⋈fact minimum); customer and nation broadcast, so
    the aggregate's shuffle carries only (custkey → partial revenue).
    Top-20 runs as TakeOrderedAndProject — no global sort. Revenue is
    micro-unit-summed (order-independent), tiebreak on c_custkey so the
    limit boundary is deterministic in both engines."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-10-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "join_asof_tolerance",
    group="D",
    oracle="""
    select p.event_id, p.user_id, p.ts as purchase_ts, c.ts as last_click_ts
    from (select * from events where event_type = 'purchase') p
    asof join (select * from events where event_type = 'click') c
      on p.user_id = c.user_id and p.ts >= c.ts
    where p.ts - c.ts <= interval 1 hour
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-ext: as-of join with a tolerance bound (pandas merge_asof's
    ``tolerance``): the matched prior click must be within 1 hour of
    the purchase, else the pair is dropped. Identical linear union-tag
    + running-last plan as join_asof, plus one post-window filter — the
    tolerance costs nothing extra at any scale (contrast with a range
    join, which widens with the tolerance)."""
    e = load(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("ts").alias("click_ts"),
        F.lit(1).alias("is_click"),
        F.lit(None).cast("long").alias("event_id"),
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast("timestamp").alias("click_ts"),
        F.lit(0).alias("is_click"),
        "event_id",
    )
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_click").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        clicks.unionByName(purchases)
        .withColumn("last_click_ts", F.last("click_ts", ignorenulls=True).over(w))
        .where(
            (F.col("is_click") == 0)
            & F.col("last_click_ts").isNotNull()
            & (
                # exact integer micros — matches DuckDB interval compare
                F.unix_micros("ts") - F.unix_micros("last_click_ts")
                <= 3_600_000_000
            )
        )
        .select(
            "event_id",
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "last_click_ts",
        )
    )


@register(
    "q18_large_orders",
    group="D",
    oracle=f"""
    with big as (
        select l_orderkey from lineitem
        group by 1 having sum(l_quantity) > 150
    )
    select c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice,
           {SUM_D.format("l.l_quantity")} as total_qty
    from customer c
    join orders o on c.c_custkey = o.o_custkey
    join lineitem l on o.o_orderkey = l.l_orderkey
    where o.o_orderkey in (select l_orderkey from big)
    group by 1, 2, 3, 4, 5
    order by o.o_totalprice desc, o.o_orderkey
    limit 100
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-ext: TPC-H Q18 shape — customers whose orders exceed a total
    quantity threshold (HAVING-filtered subquery driving a semi-join).
    Plan: the `big` aggregate is computed once (partial agg on the
    lineitem scan), then applied as a LEFT SEMI join — never a
    collected IN-list — so the filter is a broadcast of the tiny
    qualifying-key set at any scale; customer broadcasts; top-100 is
    TakeOrderedAndProject with a unique tiebreak."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.floor(F.col("l_quantity") * 1e6 + 0.5)).alias("qmicro"))
        .filter(F.col("qmicro") > 150 * 1_000_000)
        .select("l_orderkey")
    )
    return (
        li.join(F.broadcast(big), "l_orderkey", "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity").alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


_Q14_REV = "l_extendedprice * (1 - l_discount)"


@register(
    "q14_promo_revenue",
    group="D",
    oracle=f"""
    with s as (
      select {SUM_D.format(f"case when p_type like 'PROMO%' then {_Q14_REV} else 0.0 end")} as promo,
             {SUM_D.format(_Q14_REV)} as total
      from lineitem join part on l_partkey = p_partkey
      where l_shipdate >= timestamp '1997-09-01'
        and l_shipdate < timestamp '1997-10-01'
    )
    select round(100.0 * promo / total, 6) as promo_revenue_pct from s
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-ext: TPC-H Q14 shape — share of one month's revenue from PROMO
    parts. lineitem's date filter prunes at the scan; part broadcasts
    (dimension side), so the only data movement is the dim broadcast —
    the conditional and total sums come out of ONE aggregation pass.
    Both sums are micro-unit-exact, and the final percent division
    happens in the same order in both engines before the round-6."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            dsum(
                F.when(F.col("p_type").like("PROMO%"), rev).otherwise(0.0)
            ).alias("promo"),
            dsum(rev).alias("total"),
        )
        .select(
            F.round(F.lit(100.0) * F.col("promo") / F.col("total"), 6).alias(
                "promo_revenue_pct"
            )
        )
    )


@register(
    "q4_late_shipment_priority",
    group="D",
    oracle="""
    select o_orderpriority, count(*) as n_orders
    from orders o
    where exists (
      select 1 from lineitem l
      where l.l_orderkey = o.o_orderkey
        and l.l_shipdate > o.o_orderdate + interval 90 day
    )
    group by o_orderpriority
    """,
)
def q4_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-ext: TPC-H Q4 shape — orders per priority having at least one
    line shipped >90 days after the order date. The EXISTS becomes a
    left-semi join (each order emitted at most once, no post-dedup);
    only (l_orderkey, l_shipdate) is scanned from the fact — column
    pruning keeps the semi-join's shuffle narrow — and the non-equi
    part of the predicate evaluates inside the join, not as a filter on
    a joined product."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("interval 90 days")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "q7_volume_shipping",
    group="D",
    oracle=f"""
    select n1.n_name as supp_nation, n2.n_name as cust_nation,
           year(l_shipdate) as l_year,
           {SUM_D.format(_Q14_REV)} as revenue
    from lineitem
    join orders on l_orderkey = o_orderkey
    join supplier on l_suppkey = s_suppkey
    join customer on o_custkey = c_custkey
    join nation n1 on s_nationkey = n1.n_nationkey
    join nation n2 on c_nationkey = n2.n_nationkey
    where ((n1.n_name = 'NATION_1' and n2.n_name = 'NATION_2')
        or (n1.n_name = 'NATION_2' and n2.n_name = 'NATION_1'))
      and l_shipdate >= timestamp '1996-01-01'
      and l_shipdate < timestamp '1998-01-01'
    group by 1, 2, 3
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-ext: TPC-H Q7 shape — bilateral trade volume between two
    nations by ship year. Both nation dims are pre-filtered to the two
    nations BEFORE joining, so the broadcast carries 2 rows each and
    the inner joins themselves discard ~92% of the fact early; only
    the cross-pair predicate (1↔2, not 1↔1) waits until both sides are
    attached. The fact⋈fact shuffle on orderkey is the only large
    exchange."""
    two = ["NATION_1", "NATION_2"]
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load(spark, sf_dir, "orders")
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    n1 = (
        load(spark, sf_dir, "nation")
        .where(F.col("n_name").isin(two))
        .select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    )
    n2 = (
        load(spark, sf_dir, "nation")
        .where(F.col("n_name").isin(two))
        .select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@register(
    "q9_product_profit",
    group="D",
    oracle=f"""
    select n_name as nation, year(o_orderdate) as o_year,
           {SUM_D.format('l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity')} as profit
    from lineitem
    join part on l_partkey = p_partkey
    join supplier on l_suppkey = s_suppkey
    join orders on l_orderkey = o_orderkey
    join nation on s_nationkey = n_nationkey
    where p_name like '%widget%'
    group by 1, 2
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-ext: TPC-H Q9 shape — profit on one product family by
    supplier nation and order year. Fixtures have no partsupp table,
    so cost is proxied as 60% of retail price × quantity (noted
    adaptation; the plan shape — substring-filtered dim driving a
    4-way join — is Q9's). The '%widget%' LIKE can't push to parquet
    as a range, but it prunes `part` to ~1/6 before the broadcast, and
    profit terms are micro-unit-summed for cross-engine parity."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.6 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(dsum(profit).alias("profit"))
    )


@register(
    "q13_order_count_distribution",
    group="D",
    oracle="""
    with c_orders as (
      select c_custkey, count(o_orderkey) as n_orders
      from customer left join orders on c_custkey = o_custkey
      group by c_custkey
    )
    select n_orders, count(*) as n_customers
    from c_orders group by n_orders
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-ext: TPC-H Q13 shape — histogram of orders-per-customer
    including the zero bucket (the left join keeps orderless
    customers; count(o_orderkey) ignores the null row). Two
    aggregations: the first shuffles on custkey (same key as the join,
    so AQE plans them in one exchange), the second reduces to at most
    a few dozen histogram buckets."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


@register(
    "q19_disjunctive_predicates",
    group="D",
    oracle=f"""
    select {SUM_D.format(_Q14_REV)} as revenue, count(*) as n_lines
    from lineitem join part on l_partkey = p_partkey
    where (p_brand = 'Brand#1' and p_size between 1 and 15
           and l_quantity between 1 and 11)
       or (p_brand = 'Brand#2' and p_size between 10 and 30
           and l_quantity between 10 and 20)
       or (p_brand = 'Brand#3' and p_size between 20 and 50
           and l_quantity between 20 and 30)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-ext: TPC-H Q19 shape — a disjunction of (brand, size,
    quantity) bands across the join. Catalyst extracts the common
    sub-predicates: the OR of brands prunes `part` before broadcast
    and the OR of quantity ranges (1-30 overall) pushes to the
    lineitem scan, so the join evaluates the full disjunction only on
    pre-filtered rows — the classic CNF-extraction test query."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.where(band).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q22_dormant_rich_customers",
    group="D",
    oracle=f"""
    with t as (select {AVG_D.format('c_acctbal')} as avg_bal from customer)
    select count(*) as n_customers, {SUM_D.format('c.c_acctbal')} as total_bal
    from customer c, t
    where c.c_acctbal > t.avg_bal
      and not exists (select 1 from orders o where o.o_custkey = c.c_custkey)
    """,
)
def q22_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-ext: TPC-H Q22 shape — customers with above-average balance
    and no orders (dormant sales opportunity). The scalar-subquery
    threshold is a 1-row aggregate broadcast-crossed into the filter
    (no correlated per-row subquery), computed under the round-6
    micro-unit policy so the comparison boundary is bit-identical in
    both engines; the NOT EXISTS is a left-anti join on custkey."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").select("o_custkey")
    thresh = c.agg(davg("c_acctbal").alias("avg_bal"))
    return (
        c.crossJoin(F.broadcast(thresh))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal").alias("total_bal"),
        )
    )


@register(
    "join_null_safe_eq",
    group="D",
    oracle="""
    with l as (
      select c_custkey, nullif(c_mktsegment, 'BUILDING') as seg from customer
    ),
    r as (
      select distinct nullif(c_mktsegment, 'BUILDING') as seg,
             coalesce(nullif(c_mktsegment, 'BUILDING'), '(none)') as seg_name
      from customer
    )
    select r.seg_name, count(*) as n_customers
    from l join r on l.seg is not distinct from r.seg
    group by 1
    """,
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-ext: null-safe equality join (`<=>` / IS NOT DISTINCT FROM) —
    the semantics catalog reconciliation needs when NULL is a real
    category (unclassified rows must match each other, which plain `=`
    silently drops). Fixtures are null-free, so nullif manufactures the
    NULL category. Plan note: Spark compiles `<=>` to a hashable key
    (coalesce-to-sentinel internally), so this stays a broadcast/hash
    join, not a nested loop."""
    c = load(spark, sf_dir, "customer")
    seg = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    left = c.select("c_custkey", seg.alias("seg"))
    right = (
        c.select(seg.alias("seg"), F.coalesce(seg, F.lit("(none)")).alias("seg_name"))
        .distinct()
    )
    return (
        left.join(F.broadcast(right), left.seg.eqNullSafe(right.seg))
        .groupBy("seg_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "orders_market_basket",
    group="D",
    oracle="""
    with ob as (
      select distinct l_orderkey, p_brand
      from lineitem join part on l_partkey = p_partkey
    )
    select a.p_brand as brand_a, b.p_brand as brand_b,
           count(*) as support
    from ob a join ob b
      on a.l_orderkey = b.l_orderkey and a.p_brand < b.p_brand
    group by 1, 2
    having count(*) >= 5
    """,
)
def orders_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-ext: market-basket co-occurrence — support counts for brand
    pairs bought in the same order (the association-rule-mining
    candidate-pair primitive). The self-join is confined to within an
    order after collapsing lines to distinct (order, brand), so the
    fan-out is bounded by basket size squared (~4 lines/order → ≤6
    pairs), never corpus-quadratic; one shuffle on l_orderkey feeds
    both join sides (Exchange reuse), then the pair count shuffles
    dimension-sized keys. The same plan at 100 TB is the standard
    first pass of Apriori/FP-growth candidate generation."""
    ob = _basket_table(spark, sf_dir)
    a = ob.alias("a")
    b = ob.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .groupBy(
            F.col("a.p_brand").alias("brand_a"), F.col("b.p_brand").alias("brand_b")
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= 5)
    )


@register(
    "q12_priority_linecount",
    group="D",
    oracle="""
    select l_returnflag,
           count(*) filter (where o_orderpriority in ('1-URGENT', '2-HIGH'))
               as high_line_count,
           count(*) filter (where o_orderpriority not in ('1-URGENT', '2-HIGH'))
               as low_line_count
    from lineitem join orders on l_orderkey = o_orderkey
    where l_shipdate > o_orderdate + interval 60 day
      and l_shipdate >= timestamp '1996-01-01'
      and l_shipdate <  timestamp '1997-01-01'
    group by l_returnflag
    """,
)
def q12_priority_linecount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-ext: TPC-H Q12 shape adapted to the fixture schema (no
    l_shipmode/commitdate columns → l_returnflag stands in for the
    shipmode group, "late" = shipped >60 days after order date). The
    signature Q12 pattern is preserved: fact⋈fact equi join whose
    output is immediately collapsed by conditional counts over a
    low-cardinality group — the shuffle carries only the join, the agg
    is map-side-partial over 3 groups. The l_shipdate year filter is a
    plain Column predicate → pushed to the Parquet scan before the
    join; the o_orderdate comparison is join-side (row-dependent) and
    evaluates inside the joined iterator, never materializing a
    filtered product."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("interval 60 days"))
        .groupBy("l_returnflag")
        .agg(
            F.count_if(high).alias("high_line_count"),
            F.count_if(~high).alias("low_line_count"),
        )
    )


@register(
    "join_pit_scd2",
    group="D",
    oracle="""
    with seg as (
      select user_id, ts, event_type,
             lag(event_type) over (partition by user_id order by ts, event_id)
               as prev_type,
             event_id
      from events where user_id < 50
    ), changes as (
      select user_id, ts as valid_from, event_type as dim_state, event_id
      from seg where prev_type is null or prev_type <> dim_state
    ), dim as (
      select user_id, dim_state, valid_from,
             coalesce(lead(valid_from) over (partition by user_id
                                             order by valid_from, event_id),
                      timestamp '9999-12-31 00:00:00') as valid_to
      from changes
    )
    select e.user_id, count(*) as n_events,
           count(distinct d.dim_state) as n_states_seen
    from events e
    join dim d on e.user_id = d.user_id
              and e.ts >= d.valid_from and e.ts < d.valid_to
    where e.user_id < 50
    group by e.user_id
    """,
)
def join_pit_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-ext: point-in-time join against a Type-2 dimension — each
    event matched to the dimension interval containing its timestamp
    ([valid_from, valid_to) built by dim_scd2_build's logic). This is
    THE temporal-correctness join of training-data pipelines: features
    must come from the dimension row valid AT event time, never a
    later one (leakage). Implementation is an equi-join on the natural
    key (user_id) with the interval predicate as a post-join filter —
    Catalyst plans the equi-part as a hash join and the range part as
    a cheap residual, so the shuffle is keyed exactly like the event
    log; at 100 TB both sides are already bucketed by user and the
    join is co-located. Summarized per user (event count, distinct
    states seen) to keep the contract small and hash-stable."""
    e = load(spark, sf_dir, "events").where(F.col("user_id") < 50)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seg = e.select(
        "user_id", "ts", "event_type", "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    changes = seg.where(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    ).select(
        "user_id",
        F.col("ts").alias("valid_from"),
        F.col("event_type").alias("dim_state"),
        "event_id",
    )
    w2 = W.partitionBy("user_id").orderBy("valid_from", "event_id")
    dim = changes.select(
        "user_id",
        "dim_state",
        "valid_from",
        F.coalesce(
            F.lead("valid_from").over(w2),
            F.lit("9999-12-31 00:00:00").cast("timestamp"),
        ).alias("valid_to"),
    )
    ev = e.select("user_id", "ts")
    joined = ev.join(
        dim,
        (ev.user_id == dim.user_id)
        & (ev.ts >= dim.valid_from)
        & (ev.ts < dim.valid_to),
    )
    return joined.groupBy(ev.user_id.alias("user_id")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("dim_state").alias("n_states_seen"),
    )


def _bloom_prefilter_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the bloom-prefiltered join plan (shared with the plan
    regression test). Caller owns config save/restore."""
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderpriority") == "1-URGENT") & (F.year("o_orderdate") == 1995)
    )
    li = load(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(rev).alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


_BLOOM_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@register(
    "join_bloom_prefilter",
    group="D",
    oracle=f"""
    select l_returnflag,
           count(*) as n_items,
           {SUM_D.format('l_extendedprice * (1 - l_discount)')} as revenue
    from lineitem
    join orders on l_orderkey = o_orderkey
    where o_orderpriority = '1-URGENT' and year(o_orderdate) = 1995
    group by l_returnflag
    order by l_returnflag
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-ext: runtime Bloom-filter semi-join reduction — the shuffle
    killer for selective fact⋈dim joins at 100 TB. When the dim side
    carries a selective predicate (here: urgent 1995 orders) but is too
    big to broadcast, a plain shuffle join moves the ENTIRE fact table;
    Catalyst's InjectRuntimeFilter instead builds a Bloom filter over
    the dim join keys (bloom_filter_agg, one small subquery) and pushes
    `might_contain(key)` into the fact scan, so ~selectivity-fraction
    of fact rows are dropped BEFORE the exchange. False positives only
    let extra rows into the shuffle — the join itself stays exact, so
    the result (and the oracle) is the plain join. Local-mode scan
    sizes sit below the injection thresholds, so the fn lowers them
    (and pins the join to the shuffle path: a broadcast join would not
    need — or trigger — the filter), executes eagerly via
    localCheckpoint, then restores session confs; at cluster scale the
    default thresholds fire on their own. The plan regression test
    asserts might_contain/bloom_filter_agg are present."""
    saved = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    for k, v in _BLOOM_CONFS.items():
        spark.conf.set(k, v)
    try:
        return _bloom_prefilter_frames(spark, sf_dir).localCheckpoint(eager=True)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@register(
    "orders_basket_lift",
    group="D",
    oracle="""
    with ob as (
      select distinct l_orderkey, p_brand
      from lineitem join part on l_partkey = p_partkey
    ),
    n_orders as (select count(distinct l_orderkey) as n from ob),
    brand as (select p_brand, count(*) as s from ob group by 1),
    pairs as (
      select a.p_brand as brand_a, b.p_brand as brand_b,
             count(*) as support
      from ob a join ob b
        on a.l_orderkey = b.l_orderkey and a.p_brand < b.p_brand
      group by 1, 2
      having count(*) >= 10
    )
    select brand_a, brand_b, support,
           round(cast(support as double) / ba.s, 6) as confidence_a_to_b,
           round(cast(support as double) * (select n from n_orders)
                 / (cast(ba.s as double) * bb.s), 6) as lift
    from pairs
    join brand ba on ba.p_brand = brand_a
    join brand bb on bb.p_brand = brand_b
    order by brand_a, brand_b
    """,
)
def orders_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-ext: association rules from basket co-occurrence —
    confidence P(b|a) and lift P(a,b)/(P(a)P(b)) over the
    orders_market_basket pair supports (support alone ranks popular
    pairs; lift separates genuinely-associated pairs from
    popular-with-everything ones, the step that turns co-occurrence
    counts into recommendations). The per-brand marginals come from
    the SAME collapsed (order, brand) table as the pairs — one scan
    feeds pairs, marginals, and the order count; the rule computation
    joins dimension-sized tables only. All inputs exact ints; ratios
    are identically-computed doubles rounded at 6."""
    # The memoized basket table IS the docstring's "one scan feeds
    # pairs, marginals, and the order count" — shared with
    # orders_market_basket via _basket_table.
    ob = _basket_table(spark, sf_dir)
    n_orders = ob.select("l_orderkey").distinct().count()
    brand = ob.groupBy("p_brand").agg(F.count(F.lit(1)).alias("s"))
    a = ob.alias("a")
    b = ob.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .groupBy(
            F.col("a.p_brand").alias("brand_a"), F.col("b.p_brand").alias("brand_b")
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= 10)
    )
    ba = brand.select(F.col("p_brand").alias("brand_a"), F.col("s").alias("s_a"))
    bb = brand.select(F.col("p_brand").alias("brand_b"), F.col("s").alias("s_b"))
    return (
        pairs.join(F.broadcast(ba), "brand_a")
        .join(F.broadcast(bb), "brand_b")
        .select(
            "brand_a",
            "brand_b",
            "support",
            F.round(F.col("support").cast("double") / F.col("s_a"), 6).alias(
                "confidence_a_to_b"
            ),
            F.round(
                F.col("support").cast("double")
                * F.lit(n_orders)
                / (F.col("s_a").cast("double") * F.col("s_b")),
                6,
            ).alias("lift"),
        )
        .orderBy("brand_a", "brand_b")
    )


@register(
    "join_asof_nearest",
    group="D",
    oracle="""
    with tagged as (
      select user_id, ts, event_id,
             case when event_type = 'click' then ts end as click_ts,
             case when event_type = 'click' then 1 else 0 end as is_click
      from events
      where event_type in ('click', 'purchase')
    ),
    back as (
      select *,
             last_value(click_ts ignore nulls) over (
               partition by user_id
               order by ts asc, is_click desc, event_id
               rows between unbounded preceding and current row)
               as prev_click_ts
      from tagged
    ),
    both_dir as (
      select *,
             first_value(click_ts ignore nulls) over (
               partition by user_id
               order by ts asc, is_click asc, event_id
               rows between current row and unbounded following)
               as next_click_ts
      from back
    )
    select event_id, user_id, ts as purchase_ts,
           case
             when prev_click_ts is null then next_click_ts
             when next_click_ts is null then prev_click_ts
             when epoch_us(ts) - epoch_us(prev_click_ts)
                  <= epoch_us(next_click_ts) - epoch_us(ts)
               then prev_click_ts
             else next_click_ts
           end as nearest_click_ts,
           case
             when prev_click_ts is null then 'forward'
             when next_click_ts is null then 'backward'
             when epoch_us(ts) - epoch_us(prev_click_ts)
                  <= epoch_us(next_click_ts) - epoch_us(ts)
               then 'backward'
             else 'forward'
           end as direction
    from both_dir
    where is_click = 0
      and (prev_click_ts is not null or next_click_ts is not null)
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D-ext: NEAREST-direction as-of join — each purchase matched to
    the temporally closest click in EITHER direction (pandas
    merge_asof(direction='nearest'); join_asof is the backward-only
    form, join_asof_tolerance the bounded one). Same
    union-tag-and-sweep engine shape: one shuffle on user_id, one
    ascending pass carrying the last click (backward candidate), one
    descending-frame pass carrying the next click (forward
    candidate), then an exact integer-microsecond distance compare
    with ties broken backward (the pandas convention). Still linear
    in rows — no range join, no candidate explosion; both window
    orders are made total with (ts, is_click, event_id) so engines
    agree on every frame."""
    e = load(spark, sf_dir, "events")
    tagged = e.where(
        F.col("event_type").isin("click", "purchase")
    ).select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "click", F.col("ts")).alias(
            "click_ts"
        ),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias(
            "is_click"
        ),
    )
    wb = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_click").desc(), "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_click").asc(), "event_id")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    both = tagged.withColumn(
        "prev_click_ts", F.last("click_ts", ignorenulls=True).over(wb)
    ).withColumn(
        "next_click_ts", F.first("click_ts", ignorenulls=True).over(wf)
    )
    d_prev = F.unix_micros("ts") - F.unix_micros("prev_click_ts")
    d_next = F.unix_micros("next_click_ts") - F.unix_micros("ts")
    backward_wins = F.col("prev_click_ts").isNotNull() & (
        F.col("next_click_ts").isNull() | (d_prev <= d_next)
    )
    return both.where(
        (F.col("is_click") == 0)
        & (
            F.col("prev_click_ts").isNotNull()
            | F.col("next_click_ts").isNotNull()
        )
    ).select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.when(backward_wins, F.col("prev_click_ts"))
        .otherwise(F.col("next_click_ts"))
        .alias("nearest_click_ts"),
        F.when(backward_wins, F.lit("backward"))
        .otherwise(F.lit("forward"))
        .alias("direction"),
    )


@register(
    "join_interval_overlap",
    group="D",
    oracle="""
    with win as (
      select o_orderkey, o_custkey,
             min(o_orderdate) as w_start,
             max(l_shipdate) as w_end
      from orders join lineitem on l_orderkey = o_orderkey
      group by o_orderkey, o_custkey
    )
    select a.o_custkey,
           count(*) as n_overlapping_pairs,
           min(a.o_orderkey) as sample_order
    from win a join win b
      on a.o_custkey = b.o_custkey
     and a.o_orderkey < b.o_orderkey
     and a.w_start <= b.w_end
     and b.w_start <= a.w_end
    group by a.o_custkey
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: each order's fulfillment window is
    [orderdate, last shipdate of its lines]; count pairs of
    overlapping windows per customer (concurrently-open orders — the
    classic temporal-join shape). The pair join is BLOCKED on the
    customer key: candidate sets are per-customer order lists (tens of
    rows), never a global interval cross product. At 100 TB with fat
    blocks the same query adds interval-bin fan-out exactly like
    join_theta_range's price bins. Two shuffles total (window rollup,
    block join)."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    win = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_custkey")
        .agg(
            F.min("o_orderdate").alias("w_start"),
            F.max("l_shipdate").alias("w_end"),
        )
    )
    a = win.select(
        F.col("o_custkey"),
        F.col("o_orderkey").alias("a_key"),
        F.col("w_start").alias("a_start"),
        F.col("w_end").alias("a_end"),
    )
    b = win.select(
        F.col("o_custkey"),
        F.col("o_orderkey").alias("b_key"),
        F.col("w_start").alias("b_start"),
        F.col("w_end").alias("b_end"),
    )
    return (
        a.join(b, "o_custkey")
        .where(
            (F.col("a_key") < F.col("b_key"))
            & (F.col("a_start") <= F.col("b_end"))
            & (F.col("b_start") <= F.col("a_end"))
        )
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_overlapping_pairs"),
            F.min("a_key").alias("sample_order"),
        )
    )
