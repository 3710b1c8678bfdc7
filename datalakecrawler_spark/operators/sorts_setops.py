"""Group G — sorts, limits, set operations (SURVEY.md §2.G).

Scale notes: global ORDER BY is a range-partitioned sort (sampled
boundaries); ORDER BY + LIMIT n compiles to TakeOrderedAndProject —
per-partition top-n then a driver merge of n·P rows, no global sort.
UNION ALL is a no-shuffle concatenation; DISTINCT / INTERSECT / EXCEPT
shuffle on the full row — keep projections narrow before them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from datalakecrawler_spark.io import load
from datalakecrawler_spark.registry import SUM_D, register


@register(
    "sort_multikey",
    group="G",
    oracle="""
    select c_custkey, nullif(c_mktsegment, 'BUILDING') as seg, c_acctbal
    from customer
    order by seg asc nulls first, c_acctbal desc, c_custkey
    limit 100
    """,
)
def sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1: multi-key sort with explicit nulls-first ordering. NULLs are
    manufactured via nullif (fixtures are null-free); c_custkey makes
    the order total so LIMIT is deterministic."""
    c = load(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg"),
            "c_acctbal",
        )
        .orderBy(
            F.col("seg").asc_nulls_first(),
            F.col("c_acctbal").desc(),
            F.col("c_custkey"),
        )
        .limit(100)
    )


@register(
    "limit_topn",
    group="G",
    oracle="""
    select o_orderkey, o_custkey, o_totalprice
    from orders order by o_totalprice desc, o_orderkey limit 10
    """,
)
def limit_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2: global top-N → TakeOrderedAndProject (no full sort)."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "setop_union_all",
    group="G",
    oracle="""
    select o_orderkey, o_orderstatus from orders where o_totalprice > 250000
    union all
    select o_orderkey, o_orderstatus from orders where o_orderstatus = 'P'
    """,
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3: UNION ALL of two (overlapping) slices — duplicates preserved."""
    o = load(spark, sf_dir, "orders")
    a = o.where(F.col("o_totalprice") > 250000).select("o_orderkey", "o_orderstatus")
    b = o.where(F.col("o_orderstatus") == "P").select("o_orderkey", "o_orderstatus")
    return a.unionByName(b)


@register(
    "setop_union_distinct",
    group="G",
    oracle="""
    select o_custkey from orders where o_orderstatus = 'F'
    union
    select o_custkey from orders where o_orderstatus = 'P'
    """,
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4: UNION (dedup) of two key sets."""
    o = load(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.where(F.col("o_orderstatus") == "P").select("o_custkey")
    return a.unionByName(b).distinct()


@register(
    "setop_intersect",
    group="G",
    oracle="""
    select o_custkey from orders where o_orderstatus = 'F'
    intersect
    select o_custkey from orders where o_orderstatus = 'O'
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5: customers appearing in both status order sets."""
    o = load(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.intersect(b)


@register(
    "setop_except",
    group="G",
    oracle="""
    select o_custkey from orders
    except all
    select o_custkey from orders where o_orderstatus = 'O'
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G6: multiset difference (EXCEPT ALL) — also the snapshot-diff
    primitive reused by catalog B7."""
    o = load(spark, sf_dir, "orders")
    a = o.select("o_custkey")
    b = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.exceptAll(b)


@register(
    "sql_cte_revenue",
    group="G",
    oracle=f"""
    with order_rev as (
        select o_custkey, {SUM_D.format('o_totalprice')} as total_spent,
               count(*) as n_orders
        from orders group by o_custkey
    )
    select c_name, total_spent, n_orders
    from customer join order_rev on c_custkey = o_custkey
    order by total_spent desc, c_name limit 15
    """,
)
def sql_cte_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-ext: the SQL-string entry path (SURVEY §3.3) — CTE + join +
    top-n via spark.sql over registered temp views; Catalyst produces
    the same plan as the DataFrame API."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    return spark.sql(
        """
        with order_rev as (
            select o_custkey,
                   cast(sum(floor(o_totalprice * 1e6 + 0.5)) as double) / 1e6
                       as total_spent,
                   count(*) as n_orders
            from orders_v group by o_custkey
        )
        select c_name, total_spent, n_orders
        from customer_v join order_rev on c_custkey = o_custkey
        order by total_spent desc, c_name limit 15
        """
    )


@register(
    "sql_correlated_scalar",
    group="G",
    oracle="""
    select n_name,
           (select count(*) from customer c
            where c.c_nationkey = n.n_nationkey) as n_customers
    from nation n
    """,
)
def sql_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-ext: correlated scalar subquery — Catalyst decorrelates it into
    an outer join + aggregate (RewriteCorrelatedScalarSubquery), so the
    executed plan is shuffle-sane despite the per-row subquery syntax."""
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation_v")
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    return spark.sql(
        """
        select n_name,
               (select count(*) from customer_v c
                where c.c_nationkey = n.n_nationkey) as n_customers
        from nation_v n
        """
    )


@register(
    "sql_lateral_topk",
    group="G",
    oracle="""
    select r_name, nation_name, n_customers
    from region r, lateral (
      select n_name as nation_name, count(*) as n_customers
      from nation n join customer c on c.c_nationkey = n.n_nationkey
      where n.n_regionkey = r.r_regionkey
      group by n_name
      order by n_customers desc, n_name
      limit 2
    ) t
    """,
)
def sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-ext: correlated LATERAL subquery — per-region top-2 nations by
    customer count, the SQL-native form of top-k-per-group. Catalyst
    decorrelates the lateral into the same join + ranked-window plan the
    DataFrame top-k uses (win_row_number_topk), so the SQL surface and
    the DataFrame surface share physical behavior: no per-outer-row
    re-execution survives optimization. Deterministic (count desc,
    name) tie-break inside the lateral."""
    load(spark, sf_dir, "region").createOrReplaceTempView("region_l")
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation_l")
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_l")
    return spark.sql(
        """
        select r_name, nation_name, n_customers
        from region_l r, lateral (
          select n_name as nation_name, count(*) as n_customers
          from nation_l n join customer_l c on c.c_nationkey = n.n_nationkey
          where n.n_regionkey = r.r_regionkey
          group by n_name
          order by n_customers desc, n_name
          limit 2
        ) t
        """
    )


@register(
    "limit_offset_pagination",
    group="G",
    oracle="""
    select c_custkey, c_name, c_acctbal
    from customer
    order by c_acctbal desc, c_custkey
    limit 20 offset 40
    """,
)
def limit_offset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-ext: keyless pagination — ORDER BY ... LIMIT k OFFSET n (page 3
    of the balance leaderboard), deterministic because the sort key is
    unique. Spark plans offset+limit as a single global-limit stage
    taking (n+k) per partition then trimming on the driver — fine for
    page-sized n; for deep pagination at 100 TB use keyset pagination
    (WHERE key < last_seen ORDER BY ... LIMIT k) instead, which this
    op's unique sort key enables."""
    c = load(spark, sf_dir, "customer")
    return (
        c.select("c_custkey", "c_name", "c_acctbal")
        .orderBy(F.col("c_acctbal").desc(), "c_custkey")
        .offset(40)
        .limit(20)
    )


@register(
    "setop_intersect_all",
    group="G",
    oracle="""
    select o_custkey from orders where o_orderstatus = 'F'
    intersect all
    select o_custkey from orders where o_orderstatus = 'O'
    """,
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-ext: multiset intersection (INTERSECT ALL) — each customer key
    appears min(#F-orders, #O-orders) times, the bag-semantics twin of
    G5's set intersect. Spark plans this as a single hash aggregation
    counting per-side multiplicities then re-emitting the minimum — one
    shuffle on the key, no join fan-out."""
    o = load(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.intersectAll(b)


@register(
    "sql_recursive_hierarchy",
    group="G",
    oracle=f"""
    with recursive tree(key, depth) as (
        select cast(p_partkey as bigint), 0 from part where p_partkey = 0
        union all
        select cast(p.p_partkey as bigint), t.depth + 1
        from part p join tree t on (p.p_partkey - 1) // 2 = t.key
        where p.p_partkey >= 1
    )
    select depth, count(*) as n_nodes,
           {SUM_D.format('p_retailprice')} as level_value
    from tree join part on key = p_partkey
    group by depth
    """,
)
def sql_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-ext: RECURSIVE CTE (new in Spark 4) — walk an implicit
    binary-tree hierarchy over the part table (parent(k) = (k−1) div 2,
    rooted at key 0; the dense PK makes this a complete binary tree,
    the standard BOM/org-chart traversal shape) and report node count
    and value per depth level. Each recursion step is one equi join of
    the frontier against the dimension — Spark executes it as an
    iterative union of join steps, ~log₂ N rounds deep, each
    broadcast-sized here; the same plan walks a real parts-explosion
    graph at scale. Every part key lands at exactly one depth, so the
    level counts sum to the table's row count. The recursive arm must
    exclude the root explicitly: integer division of negatives
    TRUNCATES in Spark ((0−1) div 2 = 0 → the root becomes its own
    child and recursion never exhausts) but FLOORS in DuckDB
    ((−1)//2 = −1) — a cross-engine parity trap in the join key
    itself."""
    load(spark, sf_dir, "part").createOrReplaceTempView("part_v")
    return spark.sql(
        """
        with recursive tree(key, depth) as (
            select cast(p_partkey as bigint), 0 from part_v where p_partkey = 0
            union all
            select cast(p.p_partkey as bigint), t.depth + 1
            from part_v p join tree t on (p.p_partkey - 1) div 2 = t.key
            where p.p_partkey >= 1
        )
        select depth, count(*) as n_nodes,
               cast(sum(floor(p_retailprice * 1e6 + 0.5)) as double) / 1e6
                   as level_value
        from tree join part_v on key = p_partkey
        group by depth
        """
    )


@register(
    "sort_null_placement",
    group="G",
    oracle="""
    with v as (
      select o_orderkey,
             nullif(o_orderpriority, '3-MEDIUM') as prio
      from orders
    )
    select o_orderkey, prio
    from v
    order by prio asc nulls first, o_orderkey
    limit 15
    """,
)
def sort_null_placement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-ext: explicit NULL placement in ORDER BY — ASC NULLS FIRST,
    the spot where engines' DEFAULTS diverge (Spark ascending sorts
    put nulls first, DuckDB/Postgres put them LAST), so portable
    ordered output must say it explicitly — the §2.L-trap companion
    for sort semantics, exercised by injecting nulls via nullif.
    Deterministic total order with the key tie-break; values read
    straight from data."""
    o = load(spark, sf_dir, "orders")
    v = o.select(
        "o_orderkey",
        F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM")).alias(
            "prio"
        ),
    )
    return (
        v.orderBy(F.col("prio").asc_nulls_first(), "o_orderkey")
        .limit(15)
    )


@register(
    "setop_symmetric_diff",
    group="G",
    oracle="""
    with p1 as (
      select distinct o_custkey from orders
      where o_orderdate < timestamp '1999-01-01'
    ),
    p2 as (
      select distinct o_custkey from orders
      where o_orderdate >= timestamp '1999-01-01'
    ),
    only1 as (select o_custkey from p1 except select o_custkey from p2),
    only2 as (select o_custkey from p2 except select o_custkey from p1)
    select
      (select count(*) from p1) as n_before,
      (select count(*) from p2) as n_after,
      (select count(*) from only1) as n_lapsed,
      (select count(*) from only2) as n_new,
      (select count(*) from only1) + (select count(*) from only2)
        as n_symmetric_diff
    """,
)
def setop_symmetric_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-ext: symmetric difference of two keyed sets — customers
    active ONLY before vs ONLY after a cutover ((A∖B) ∪ (B∖A)): the
    set-algebra form of churn/acquisition accounting
    (orders_abc_migration's '-' rows, computed as pure set ops —
    EXCEPT each way then union of counts). Both EXCEPTs are
    distinct-key anti-joins on the same custkey shuffle; at scale
    the distinct projections are entity-sized. Exact counts."""
    o = load(spark, sf_dir, "orders")
    cut = F.lit("1999-01-01").cast("timestamp")
    p1 = o.where(F.col("o_orderdate") < cut).select("o_custkey").distinct()
    p2 = (
        o.where(F.col("o_orderdate") >= cut).select("o_custkey").distinct()
    )
    only1 = p1.exceptAll(p2).agg(F.count(F.lit(1)).alias("n_lapsed"))
    only2 = p2.exceptAll(p1).agg(F.count(F.lit(1)).alias("n_new"))
    n1 = p1.agg(F.count(F.lit(1)).alias("n_before"))
    n2 = p2.agg(F.count(F.lit(1)).alias("n_after"))
    return (
        n1.crossJoin(F.broadcast(n2))
        .crossJoin(F.broadcast(only1))
        .crossJoin(F.broadcast(only2))
        .select(
            "n_before",
            "n_after",
            "n_lapsed",
            "n_new",
            (F.col("n_lapsed") + F.col("n_new")).alias(
                "n_symmetric_diff"
            ),
        )
    )


@register(
    "orders_skyline_frontier",
    group="G",
    oracle="""
    with pts as (
      select distinct
             cast(floor(o_totalprice * 100 + 0.5) as bigint) as price_c,
             cast(o_orderdate as date) as od
      from orders
    ),
    ranked as (
      select price_c, od,
             max(od) over (order by price_c asc, od desc
               rows between unbounded preceding and 1 preceding)
               as best_prev_date
      from pts
    ),
    sky as (
      select price_c, od from ranked
      where best_prev_date is null or od > best_prev_date
    )
    select round(cast(price_c as double) / 100, 2) as price,
           od as order_date
    from sky
    order by price_c
    """,
)
def orders_skyline_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-ext: the SKYLINE operator — the Pareto frontier of
    (minimize price, maximize recency) over distinct order points: a
    point survives iff nothing is both cheaper-or-equal AND
    newer-or-equal with one strict ('best deals that aren't stale').
    Skylines are the classic can't-express-with-one-aggregate
    operator; the 2-D case collapses to a SINGLE window pass: sort
    by (price asc, date desc) and keep points whose date strictly
    beats the running max over all predecessors — predecessors are
    exactly the cheaper (or equal-price newer) points, so the
    running max IS the dominance test. O(n log n) total, one
    range-partitioned sort at scale (vs the naive quadratic
    anti-join); d ≥ 3 dimensions escalate to block-nested-loop over
    partitions. Distinct-point dedup first makes tie semantics
    exact; prices compare as exact cent integers."""
    o = load(spark, sf_dir, "orders")
    pts = o.select(
        F.floor(F.col("o_totalprice") * 100 + 0.5).alias("price_c"),
        F.col("o_orderdate").cast("date").alias("od"),
    ).distinct()
    from datalakecrawler_spark.distrank import with_global_cummax

    # distributed exclusive running max over the (tie-free, distinct)
    # point set — the skyline pass survives any point cardinality
    ranked = with_global_cummax(
        pts,
        [F.col("price_c").asc(), F.col("od").desc()],
        "od",
        out="best_prev_date",
        inclusive=False,
    ).select("price_c", "od", "best_prev_date")
    return (
        ranked.filter(
            F.col("best_prev_date").isNull()
            | (F.col("od") > F.col("best_prev_date"))
        )
        .select(
            F.round(F.col("price_c").cast("double") / 100, 2).alias(
                "price"
            ),
            F.col("od").alias("order_date"),
            F.col("price_c").alias("_pc"),
        )
        .orderBy("_pc")
        .drop("_pc")
    )


@register(
    "setop_union_by_name",
    group="G",
    oracle="""
    with a as (
      select o_orderkey as k, o_totalprice as price,
             cast(null as varchar) as status
      from orders where o_orderpriority = '1-URGENT'
    ),
    b as (
      select o_orderkey as k, cast(null as double) as price,
             o_orderstatus as status
      from orders where o_orderpriority = '5-LOW'
    ),
    u as (select * from a union all by name select * from b)
    select cast(count(*) as bigint) as n_rows,
           cast(count(price) as bigint) as n_with_price,
           cast(count(status) as bigint) as n_with_status,
           round(cast(sum(cast(floor(coalesce(price, 0) * 1e6 + 0.5)
                 as bigint)) as double) / 1e6, 2) as price_checksum
    from u
    """,
)
def setop_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-ext: union by NAME with missing columns — the
    schema-evolution set op (position-based UNION silently pairs
    wrong columns when sides diverge; name-based union with missing
    columns null-filled is how heterogeneous batches append in an
    evolving lake — the read-side twin of
    sink_txlog_schema_evolution). Spark: unionByName(
    allowMissingColumns=True); DuckDB: UNION ALL BY NAME. Counts of
    null-filled cells and a micro-quantized checksum pin the
    alignment."""
    o = load(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("price"),
    )
    b = o.where(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
    )
    u = a.unionByName(b, allowMissingColumns=True)
    return u.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("price").alias("n_with_price"),
        F.count("status").alias("n_with_status"),
        F.round(
            F.sum(
                F.floor(F.coalesce(F.col("price"), F.lit(0)) * 1e6 + 0.5)
            ).cast("double")
            / 1e6,
            2,
        ).alias("price_checksum"),
    )


@register(
    "sql_pipe_syntax",
    group="G",
    oracle=f"""
    select o_orderpriority,
           cast(count(*) as bigint) as n_orders,
           {SUM_D.format('o_totalprice')} as revenue
    from orders
    where o_orderstatus = 'F'
    group by o_orderpriority
    order by o_orderpriority
    """,
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-ext: Spark 4 SQL PIPE syntax (`|>`) — the linear query form
    (FROM ... |> WHERE ... |> AGGREGATE ... |> ORDER BY) that reads in
    execution order instead of the inside-out SELECT nesting. Catalyst
    parses it to the IDENTICAL logical plan as the standard form — the
    oracle is the same query in classic SQL, so the hash-match proves
    the two syntaxes are one plan. Purely a parser feature: pushdown,
    partial aggregation and every other plan property are unchanged."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_p")
    return spark.sql(
        """
        from orders_p
        |> where o_orderstatus = 'F'
        |> aggregate count(*) as n_orders,
                     cast(sum(floor(o_totalprice * 1e6 + 0.5)) as double) / 1e6
                         as revenue
           group by o_orderpriority
        |> order by o_orderpriority
        """
    )
