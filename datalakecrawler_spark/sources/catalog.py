"""Group B — crawler/catalog operators (SURVEY.md §2.B): the reference
system's core domain. A data-lake crawler walks datasets, infers
schemas, profiles columns, and detects changes between crawl runs;
each operator below is one of those catalog products as a DataFrame.

Scale design (SURVEY §4): the profiler computes ALL statistics for ALL
columns of a table in ONE aggregation pass (a single `agg(*exprs)` →
one scan, map-side partials), then unpivots to catalog rows — never one
job per column. Snapshot diff is `exceptAll` (shuffle on the full row),
run on narrow key projections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from datalakecrawler_spark.io import TABLES, load, row_count
from datalakecrawler_spark.registry import AVG_D, SUM_D, davg, dsum, register


@register(
    "catalog_infer_schema",
    group="B",
    oracle="""
    select table_name as dataset, column_name as field_name,
           ordinal_position - 1 as position,
           case
             -- events.ts is written with isAdjustedToUTC=true (instant
             -- semantics -> Spark TimestampType); the other fixtures'
             -- timestamps are NTZ. DuckDB's information_schema shows
             -- both as TIMESTAMP, so the one instant column is pinned.
             when table_name = 'events' and column_name = 'ts'
               then 'timestamp'
             else case data_type
             when 'INTEGER' then 'int'
             when 'BIGINT' then 'bigint'
             when 'VARCHAR' then 'string'
             when 'DOUBLE' then 'double'
             when 'TIMESTAMP' then 'timestamp_ntz'
             when 'FLOAT[]' then 'array<float>'
             else lower(data_type) end
           end as spark_type,
           true as nullable
    from information_schema.columns
    where table_name in ('region','nation','customer','supplier','part',
                         'orders','lineitem','events','documents','embeddings')
    """,
)
def catalog_infer_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1: dataset → schema_field catalog rows (field name, position,
    Spark DDL type, nullability) for every fixture table. This is the
    crawler's central artifact; rows-only because type names are
    engine-specific (Spark DDL vs DuckDB types)."""
    rows = []
    for t in TABLES:
        for i, f in enumerate(load(spark, sf_dir, t).schema.fields):
            rows.append(
                Row(
                    dataset=t,
                    field_name=f.name,
                    position=i,
                    spark_type=f.dataType.simpleString(),
                    nullable=f.nullable,
                )
            )
    return spark.createDataFrame(rows)


_NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@register(
    "catalog_profile_numeric",
    group="B",
    oracle=" union all ".join(
        f"""
        select '{c}' as column_name,
               count({c}) as cnt,
               min({c}) as min_v,
               max({c}) as max_v,
               {AVG_D.format(c)} as avg_v,
               round(stddev_samp({c}), 2) + 0 as std_v
        from lineitem
        """
        for c in _NUM_COLS
    ),
)
def catalog_profile_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2: numeric column profile — count/min/max/avg/stddev for every
    numeric column in ONE scan (single agg pass, then unpivot with
    stack), not one job per column."""
    li = load(spark, sf_dir, "lineitem")
    aggs = []
    for c in _NUM_COLS:
        aggs += [
            F.count(c).alias(f"{c}__cnt"),
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
            davg(c).alias(f"{c}__avg"),
            (F.round(F.stddev_samp(c), 2) + F.lit(0.0)).alias(f"{c}__std"),
        ]
    wide = li.agg(*aggs)
    stack_expr = ", ".join(
        f"'{c}', cast({c}__cnt as bigint), {c}__min, {c}__max, {c}__avg, {c}__std"
        for c in _NUM_COLS
    )
    return wide.selectExpr(
        f"stack({len(_NUM_COLS)}, {stack_expr}) as "
        "(column_name, cnt, min_v, max_v, avg_v, std_v)"
    )


@register(
    "catalog_profile_distinct",
    group="B",
    oracle="""
    select 'o_custkey' as column_name,
           count(distinct o_custkey) as ndv_exact, true as approx_ok
    from orders
    union all
    select 'o_orderstatus', count(distinct o_orderstatus), true from orders
    union all
    select 'o_orderpriority', count(distinct o_orderpriority), true from orders
    union all
    select 'o_orderdate', count(distinct o_orderdate), true from orders
    """,
)
def catalog_profile_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3: approximate NDV per column via HLL — the 100 TB-scale
    profiler path (constant memory per column; exact twin is B4).
    HLL estimates are engine-specific, so the hashable content is the
    exact NDV plus a Spark-computed tolerance verdict: the HLL++
    estimate (rsd 0.05) must land within 15% (3σ) of the exact count.
    HLL merges are order-independent → the verdict is run-stable; a
    broken sketch flips approx_ok and fails the hash."""
    o = load(spark, sf_dir, "orders")
    cols = ["o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate"]
    wide = o.agg(
        *[F.approx_count_distinct(c, 0.05).alias(f"{c}__andv") for c in cols],
        *[F.count_distinct(c).alias(f"{c}__ndv") for c in cols],
    )
    stack_expr = ", ".join(
        f"'{c}', {c}__ndv, abs({c}__andv - {c}__ndv) <= 0.15 * {c}__ndv"
        for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_expr}) as (column_name, ndv_exact, approx_ok)"
    )


@register(
    "catalog_profile_distinct_exact",
    group="B",
    oracle="""
    select 'o_custkey' as column_name, count(distinct o_custkey) as ndv from orders
    union all
    select 'o_orderstatus', count(distinct o_orderstatus) from orders
    union all
    select 'o_orderpriority', count(distinct o_orderpriority) from orders
    union all
    select 'o_orderdate', count(distinct o_orderdate) from orders
    """,
)
def catalog_profile_distinct_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4: exact NDV per column (one pass, expand-based)."""
    o = load(spark, sf_dir, "orders")
    cols = ["o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate"]
    wide = o.agg(*[F.countDistinct(c).alias(f"{c}__ndv") for c in cols])
    stack_expr = ", ".join(f"'{c}', {c}__ndv" for c in cols)
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_expr}) as (column_name, ndv)"
    )


@register(
    "catalog_topk_values",
    group="B",
    oracle="""
    select column_name, value, cnt, rk from (
        select column_name, value, cnt,
               row_number() over (partition by column_name
                                  order by cnt desc, value) as rk
        from (
            select 'lang' as column_name, lang as value, count(*) as cnt
            from documents group by 2
            union all
            select 'source', source, count(*) from documents group by 2
        ) t
    ) ranked where rk <= 10
    """,
)
def catalog_topk_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5: top-k frequent values per categorical column (k=10) — the
    profiler's most-common-values list. Deterministic (cnt desc, value)
    tie-break."""
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    counts = (
        d.groupBy(F.lit("lang").alias("column_name"), F.col("lang").alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .unionByName(
            d.groupBy(
                F.lit("source").alias("column_name"),
                F.col("source").alias("value"),
            ).agg(F.count(F.lit(1)).alias("cnt"))
        )
    )
    w = W.partitionBy("column_name").orderBy(F.col("cnt").desc(), "value")
    return counts.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= 10)


@register(
    "catalog_null_fraction",
    group="B",
    oracle="""
    select count(*) as n_rows,
           cast(sum(case when nullif(c_mktsegment, 'BUILDING') is null
                    then 1 else 0 end) as bigint) as n_null_seg,
           round(sum(case when nullif(c_mktsegment, 'BUILDING') is null
                          then 1 else 0 end) * 1.0 / count(*), 6) as null_frac
    from customer
    """,
)
def catalog_null_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6: null count/fraction per column (profiler completeness stat).
    Fixtures are null-free, so nullif manufactures the nulls."""
    c = load(spark, sf_dir, "customer")
    seg = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    n_null = F.sum(seg.isNull().cast("long"))
    return c.agg(
        F.count(F.lit(1)).alias("n_rows"),
        n_null.alias("n_null_seg"),
        F.round(n_null * 1.0 / F.count(F.lit(1)), 6).alias("null_frac"),
    )


@register(
    "catalog_snapshot_diff",
    group="B",
    oracle="""
    select o_orderkey, o_orderstatus from orders
    except all
    select o_orderkey, o_orderstatus from orders where o_orderstatus <> 'P'
    """,
)
def catalog_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7: crawl change detection — rows present in the new snapshot but
    not the old (old simulated as the non-'P' subset). exceptAll keeps
    multiplicity, the correct semantics for append-heavy lakes."""
    o = load(spark, sf_dir, "orders")
    new = o.select("o_orderkey", "o_orderstatus")
    old = o.where(F.col("o_orderstatus") != "P").select(
        "o_orderkey", "o_orderstatus"
    )
    return new.exceptAll(old)


@register(
    "catalog_row_count_estimate",
    group="B",
    oracle="""
    select 'orders' as dataset, count(*) as n_rows from orders
    union all select 'lineitem', count(*) from lineitem
    union all select 'customer', count(*) from customer
    union all select 'events', count(*) from events
    """,
)
def catalog_row_count_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8: per-dataset row counts (Parquet footer-only scan — Spark
    serves count(*) from row-group metadata, no data pages read)."""
    frames = [
        load(spark, sf_dir, t).agg(
            F.lit(t).alias("dataset"), F.count(F.lit(1)).alias("n_rows")
        )
        for t in ["orders", "lineitem", "customer", "events"]
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


@register(
    "quality_constraint_suite",
    group="B",
    oracle="""
    with checks as (
        select 'orders_pk_unique' as constraint_name,
               count(*) - count(distinct o_orderkey) as n_violations
        from orders
        union all
        select 'lineitem_fk_orders', count(*)
        from lineitem l
        where not exists (select 1 from orders o
                          where o.o_orderkey = l.l_orderkey)
        union all
        select 'lineitem_discount_range', count(*)
        from lineitem where l_discount < 0 or l_discount > 0.1
        union all
        select 'customer_acctbal_complete', count(*)
        from customer where c_acctbal is null
        union all
        select 'events_value_positive', count(*)
        from events where value <= 0
    )
    select constraint_name, n_violations, n_violations = 0 as passed
    from checks
    """,
)
def quality_constraint_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: declarative data-quality constraint suite (the AWS-Deequ
    capability a crawler publishes next to its catalog entries): PK
    uniqueness, FK containment, value-range, completeness, and
    positivity checks, one verdict row each. Every check is a single
    aggregate over its table — uniqueness is count minus distinct-count,
    FK containment a left-anti join (shuffle on the key, null-safe by
    construction since fixtures are non-null) — so the suite costs one
    scan per table and the output is O(#constraints). At 100 TB swap
    exact distinct for approx_count_distinct and sample the range
    checks; the verdict schema stays identical."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    c = load(spark, sf_dir, "customer")
    e = load(spark, sf_dir, "events")

    def verdict(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("constraint_name"),
            F.count(F.lit(1)).alias("n_violations"),
        )

    checks = [
        o.agg(
            F.lit("orders_pk_unique").alias("constraint_name"),
            (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("n_violations"),
        ),
        verdict(
            "lineitem_fk_orders",
            li.join(o.select("o_orderkey"), li.l_orderkey == o.o_orderkey, "left_anti"),
        ),
        verdict(
            "lineitem_discount_range",
            li.filter((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)),
        ),
        verdict("customer_acctbal_complete", c.filter(F.col("c_acctbal").isNull())),
        verdict("events_value_positive", e.filter(F.col("value") <= 0)),
    ]
    out = checks[0]
    for df in checks[1:]:
        out = out.unionByName(df)
    return out.withColumn("passed", F.col("n_violations") == 0)


@register(
    "catalog_histogram_numeric",
    group="B",
    oracle="""
    with bounds as (
        select min(o_totalprice) as lo, max(o_totalprice) as hi from orders
    )
    select least(cast(floor((o_totalprice - lo) / ((hi - lo) / 10)) as bigint),
                 9) as bucket,
           count(*) as n_rows
    from orders, bounds
    group by 1
    """,
)
def catalog_histogram_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: equi-width histogram of a numeric column (10 buckets over
    o_totalprice) — the distribution sketch a profiler stores beside
    min/max/stddev. Two aggregation passes: bounds (O(1) rows, cross-
    joined as a broadcast literal) then bucket counts; both have
    map-side partials, output is O(buckets). The bucket expression is
    per-row IEEE arithmetic in the same shape in both engines, so edge
    values land identically. The max lands in a closed top bucket via
    least(..., 9). At scale, substitute approx min/max from footer
    stats to save the first pass."""
    o = load(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    return (
        o.crossJoin(F.broadcast(bounds))
        .select(
            F.least(
                F.floor(
                    (F.col("o_totalprice") - F.col("lo"))
                    / ((F.col("hi") - F.col("lo")) / 10)
                ).cast("long"),
                F.lit(9).cast("long"),
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


@register(
    "catalog_profile_quantiles",
    group="B",
    oracle="""
    select 'l_quantity' as column_name,
           round(quantile_cont(l_quantity, 0.25), 4) as p25,
           round(quantile_cont(l_quantity, 0.50), 4) as p50,
           round(quantile_cont(l_quantity, 0.75), 4) as p75
    from lineitem
    union all
    select 'l_extendedprice',
           round(quantile_cont(l_extendedprice, 0.25), 4),
           round(quantile_cont(l_extendedprice, 0.50), 4),
           round(quantile_cont(l_extendedprice, 0.75), 4)
    from lineitem
    union all
    select 'l_discount',
           round(quantile_cont(l_discount, 0.25), 4),
           round(quantile_cont(l_discount, 0.50), 4),
           round(quantile_cont(l_discount, 0.75), 4)
    from lineitem
    """,
)
def catalog_profile_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: per-column quartile profile (the distribution half of the
    catalog profile that min/max/stddev miss). All columns' percentiles
    compute in ONE aggregation pass over one scan — the same
    one-pass-per-table rule as the numeric profiler — then unpivot to
    catalog rows via a stack(). Exact percentile_cont interpolation
    matches DuckDB's quantile_cont (round(4) absorbs last-ulp
    differences, per the E10 precedent). At 100 TB switch to
    approx_percentile (t-digest, mergeable, one pass) and mark the
    profile row as approximate.

    Engine: sort-rank, not the ``percentile`` aggregate — even with a
    shared value map per column, three 583k-entry boxed maps merge
    single-threaded (~2.3 s at sf0.1). percentile_cont(p) reads sorted
    positions ⌊p·(n−1)⌋+1 and ⌈p·(n−1)⌉+1 and interpolates (the same
    formula both engines' aggregates use), so one row_number sort per
    column plus a six-rank filter produces identical values in ~0.6 s.
    """
    import math

    li = load(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    probes = {"p25": 0.25, "p50": 0.50, "p75": 0.75}
    n = row_count(spark, sf_dir, "lineitem")
    # per probe: (1-based) bracketing ranks + interpolation weight —
    # identical for every column (same n)
    spec = {}
    want: set[int] = set()
    for tag, p in probes.items():
        idx = p * (n - 1)
        lo, hi = math.floor(idx) + 1, math.ceil(idx) + 1
        spec[tag] = (lo, hi, idx - math.floor(idx))
        want.update((lo, hi))
    # one pruned-scan sort job per column, submitted concurrently (the
    # unpivot-to-one-window variant shuffles 3×|table| (column, value)
    # rows into only 3 sort partitions — measured slower than three
    # overlapped single-column sorts); the six bracketing values per
    # column come back to the driver and the 3-row catalog frame is
    # assembled locally, same as the other schema-sized profilers
    from concurrent.futures import ThreadPoolExecutor

    ranks = sorted(want)

    def probe_col(c: str):
        from datalakecrawler_spark.distrank import with_global_row_number

        # distributed sort-rank (RangePartitioner maps equal keys to
        # ONE partition, so ties get arbitrary consecutive ranks within
        # that partition — but the VALUE at rank k over the sorted
        # multiset is tie-order-invariant, which is all the probe
        # reads; do NOT rely on tie splitting for skew relief here)
        ranked = with_global_row_number(li.select(c), spark, [c], out="rn")
        got = {
            r["rn"]: r[c]
            for r in ranked.where(F.col("rn").isin(ranks)).collect()
        }
        return c, got

    with ThreadPoolExecutor(max_workers=len(cols)) as ex:
        by_col = dict(ex.map(probe_col, cols))

    def round4_half_away(x: float) -> float:
        # Python round() is half-to-even; the oracle's round() (and
        # Spark's F.round) are half-away-from-zero. A value landing on
        # an exact half at 1e-4 would hash-diverge under banker's
        # rounding (ADVICE r3, low) — round the way the oracle does.
        return math.copysign(math.floor(abs(x) * 1e4 + 0.5) / 1e4, x)

    rows = []
    for c in cols:
        got = by_col[c]
        row = {"column_name": c}
        for tag, (lo, hi, frac) in spec.items():
            v_lo, v_hi = got[lo], got[hi]
            row[tag] = round4_half_away(v_lo + frac * (v_hi - v_lo))
        rows.append(Row(**row))
    return spark.createDataFrame(rows)


@register(
    "catalog_footer_stats",
    group="B",
    oracle="""
    select 'l_orderkey' as column_name,
           cast(min(l_orderkey) as varchar) as min_value,
           cast(max(l_orderkey) as varchar) as max_value,
           count(*) as n_rows
    from lineitem
    union all
    select 'l_quantity', cast(min(l_quantity) as varchar),
           cast(max(l_quantity) as varchar), count(*) from lineitem
    union all
    select 'l_shipdate', cast(min(l_shipdate) as varchar),
           cast(max(l_shipdate) as varchar), count(*) from lineitem
    """,
)
def catalog_footer_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: metadata-only profiling from the Parquet FOOTER — the
    crawler's signature fast path: per-column min/max and row counts
    read from row-group statistics without scanning a single data page.
    Footer stats are aggregated across row groups (min of mins, max of
    maxs). The oracle recomputes the same stats the slow way (full
    scan), proving the footer tells the truth. At 100 TB this is the
    difference between cataloging a lake in minutes (one footer read
    per file, parallelized with a file-list RDD) and days; the same
    stats drive row-group skipping for every pushed-down predicate."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(f"{sf_dir}/lineitem.parquet").metadata
    idx = {
        md.row_group(0).column(i).path_in_schema: i
        for i in range(md.row_group(0).num_columns)
    }
    rows = []
    for col in ["l_orderkey", "l_quantity", "l_shipdate"]:
        stats = [md.row_group(g).column(idx[col]).statistics for g in range(md.num_row_groups)]
        rows.append(
            (col, str(min(s.min for s in stats)), str(max(s.max for s in stats)), md.num_rows)
        )
    return spark.createDataFrame(
        rows, "column_name string, min_value string, max_value string, n_rows long"
    )


# FK candidates probed by catalog_fk_discovery: the star-schema edges a
# crawler would propose from column-name/type affinity (FIXTURES.md FK
# graph — measured clean) plus one deliberately-false edge so the
# containment score demonstrably separates true FKs from coincidences.
_FK_CANDIDATES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("orders", "o_orderkey", "part", "p_partkey"),  # false edge
]


@register(
    "catalog_fk_discovery",
    group="B",
    oracle="\nunion all\n".join(
        f"""
    select '{ct}' as child_table, '{cc}' as child_column,
           '{pt}' as parent_table, '{pc}' as parent_column,
           (select count(distinct {cc}) from {ct}) as child_distinct,
           (select count(distinct {cc}) from {ct}
             where {cc} in (select {pc} from {pt})) as matched_distinct,
           round(cast((select count(distinct {cc}) from {ct}
                        where {cc} in (select {pc} from {pt})) as double)
                 / (select count(distinct {cc}) from {ct}), 6) as containment
        """
        for ct, cc, pt, pc in _FK_CANDIDATES
    ),
)
def catalog_fk_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: foreign-key inference — the crawler scores each candidate
    (child.col → parent.key) edge by value containment: the fraction of
    the child column's DISTINCT values present in the parent column.
    containment == 1.0 ⇒ a valid FK; the deliberate false edge scores
    well below 1. Per edge: both sides reduce to distinct key sets
    BEFORE the semi-join, so the join input is NDV-sized, not
    row-count-sized — at 100 TB you'd feed the same comparison from
    per-column distinct sketches in the catalog instead of rescanning,
    but the containment definition is identical."""
    out = None
    for ct, cc, pt, pc in _FK_CANDIDATES:
        child = load(spark, sf_dir, ct).select(F.col(cc).alias("v")).distinct()
        parent = load(spark, sf_dir, pt).select(F.col(pc).alias("v")).distinct()
        matched = child.join(parent, "v", "left_semi")
        row = (
            child.agg(F.count(F.lit(1)).alias("child_distinct"))
            .crossJoin(matched.agg(F.count(F.lit(1)).alias("matched_distinct")))
            .select(
                F.lit(ct).alias("child_table"),
                F.lit(cc).alias("child_column"),
                F.lit(pt).alias("parent_table"),
                F.lit(pc).alias("parent_column"),
                "child_distinct",
                "matched_distinct",
                F.round(
                    F.col("matched_distinct").cast("double")
                    / F.col("child_distinct"),
                    6,
                ).alias("containment"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


# (table, column) pairs probed for uniqueness: every table's documented
# PK plus two known non-unique columns as negative probes.
_PK_CANDIDATES = [
    ("region", "r_regionkey"),
    ("nation", "n_nationkey"),
    ("customer", "c_custkey"),
    ("supplier", "s_suppkey"),
    ("part", "p_partkey"),
    ("orders", "o_orderkey"),
    ("events", "event_id"),
    ("documents", "doc_id"),
    ("embeddings", "vec_id"),
    ("lineitem", "l_orderkey"),  # non-unique: ~4 lines per order
    ("orders", "o_custkey"),  # non-unique: many orders per customer
]


@register(
    "catalog_pk_discovery",
    group="B",
    oracle="\nunion all\n".join(
        f"""
    select '{t}' as table_name, '{c}' as column_name,
           count(*) as n_rows, count(distinct {c}) as n_distinct,
           count(*) = count(distinct {c}) as is_unique
    from {t}
        """
        for t, c in _PK_CANDIDATES
    ),
)
def catalog_pk_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: primary-key inference — a crawler flags a column as a PK
    candidate when distinct-count equals row-count (and nulls are
    absent; fixtures have none). One count+countDistinct aggregation
    per probed column; at scale the screening pass would use
    approx_count_distinct (B3's HLL machinery) and only exact-verify
    columns whose estimate is within error of n_rows."""
    out = None
    for t, c in _PK_CANDIDATES:
        row = (
            load(spark, sf_dir, t)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.countDistinct(F.col(c)).alias("n_distinct"),
            )
            .select(
                F.lit(t).alias("table_name"),
                F.lit(c).alias("column_name"),
                "n_rows",
                "n_distinct",
                (F.col("n_rows") == F.col("n_distinct")).alias("is_unique"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


_CORR = (
    "round((cast(n as double) * cast(s{x}{y} as double)"
    " - cast(s{x} as double) * cast(s{y} as double))"
    " / (sqrt(cast(n as double) * cast(s{x}{x} as double)"
    "       - cast(s{x} as double) * cast(s{x} as double))"
    "  * sqrt(cast(n as double) * cast(s{y}{y} as double)"
    "       - cast(s{y} as double) * cast(s{y} as double))), 6)"
)


@register(
    "catalog_column_correlation",
    group="B",
    oracle=f"""
    with s as (
      select count(*) as n,
             sum(q)     as sq, sum(p)     as sp, sum(d)     as sd,
             sum(q * q) as sqq, sum(p * p) as spp, sum(d * d) as sdd,
             sum(q * p) as sqp, sum(q * d) as sqd, sum(p * d) as spd
      from (select cast(floor(l_quantity + 0.5) as bigint)       as q,
                   cast(floor(l_extendedprice + 0.5) as bigint)  as p,
                   cast(floor(l_discount * 1e4 + 0.5) as bigint) as d
            from lineitem)
    )
    select {_CORR.format(x='q', y='p')} as corr_qty_price,
           {_CORR.format(x='q', y='d')} as corr_qty_disc,
           {_CORR.format(x='p', y='d')} as corr_price_disc
    from s
    """,
)
def catalog_column_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: numeric column-correlation profiling — pairwise Pearson r
    across (quantity, extendedprice, discount) in ONE aggregation pass
    (10 integer sums), the way a profiler must do it at 100 TB: never
    one job per pair. The inputs are quantized to integers first
    (quantity and dollar units; discount in 1e-4 units) so every sum is
    exact int64 arithmetic with no overflow headroom issues at sf1
    (max |sum(p*p)| ≈ 6e16), and the final combination runs the
    identical double expression in both engines → bit-identical r.
    Spark's built-in F.corr is a streaming float accumulation whose
    result is partitioning-dependent — unusable for cross-engine
    hash-match, which is why the moment-sum formulation exists here."""
    li = load(spark, sf_dir, "lineitem")
    q = F.floor(F.col("l_quantity") + 0.5).cast("long")
    p = F.floor(F.col("l_extendedprice") + 0.5).cast("long")
    d = F.floor(F.col("l_discount") * 1e4 + 0.5).cast("long")
    s = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("sq"), F.sum(p).alias("sp"), F.sum(d).alias("sd"),
        F.sum(q * q).alias("sqq"), F.sum(p * p).alias("spp"),
        F.sum(d * d).alias("sdd"), F.sum(q * p).alias("sqp"),
        F.sum(q * d).alias("sqd"), F.sum(p * d).alias("spd"),
    )

    def corr(sx: str, sy: str, sxy: str, sxx: str, syy: str):
        n = F.col("n").cast("double")
        a = F.col(sx).cast("double")
        b = F.col(sy).cast("double")
        return F.round(
            (n * F.col(sxy).cast("double") - a * b)
            / (
                F.sqrt(n * F.col(sxx).cast("double") - a * a)
                * F.sqrt(n * F.col(syy).cast("double") - b * b)
            ),
            6,
        )

    return s.select(
        corr("sq", "sp", "sqp", "sqq", "spp").alias("corr_qty_price"),
        corr("sq", "sd", "sqd", "sqq", "sdd").alias("corr_qty_disc"),
        corr("sp", "sd", "spd", "spp", "sdd").alias("corr_price_disc"),
    )


@register(
    "catalog_schema_drift",
    group="B",
    oracle="""
    with old_s as (
      select column_name, lower(column_type) as t
      from (describe select * from lineitem)
    ),
    new_s as (
      select column_name, lower(column_type) as t
      from (describe select * exclude (l_tax, l_linenumber),
                   cast(l_linenumber as bigint) as l_linenumber,
                   l_extendedprice * (1 - l_discount) as l_netprice
            from lineitem)
    )
    select coalesce(o.column_name, n.column_name) as field_name,
           replace(replace(o.t, 'varchar', 'string'), 'integer', 'int') as old_type,
           replace(replace(n.t, 'varchar', 'string'), 'integer', 'int') as new_type,
           case when o.column_name is null then 'added'
                when n.column_name is null then 'removed'
                when o.t <> n.t then 'type_changed'
                else 'unchanged' end as status
    from old_s o full outer join new_s n on o.column_name = n.column_name
    """,
)
def catalog_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: schema-drift detection between two crawl snapshots — the
    re-crawl question "what changed about this dataset's shape?".
    The new snapshot drops a column (l_tax), widens one
    (l_linenumber int→bigint) and adds a derived one (l_netprice);
    the drift report classifies every field as
    added/removed/type_changed/unchanged via a full outer join of the
    two inferred schemas. Schemas are metadata (a few dozen rows), so
    the join is driver-cheap at any data scale — the crawler never
    touches the data to diff shapes, only parquet footers. Cross-engine
    parity: Spark DDL names and DuckDB type names are normalized to the
    same vocabulary (string/int), which the oracle mirrors."""
    old_df = load(spark, sf_dir, "lineitem")
    new_df = (
        old_df.drop("l_tax")
        .withColumn("l_linenumber", F.col("l_linenumber").cast("bigint"))
        .withColumn(
            "l_netprice", F.col("l_extendedprice") * (1 - F.col("l_discount"))
        )
    )

    def fields(df: DataFrame):
        return spark.createDataFrame(
            [
                Row(
                    column_name=f.name,
                    t=f.dataType.simpleString().replace("timestamp_ntz", "timestamp"),
                )
                for f in df.schema
            ],
            "column_name string, t string",
        )

    o, n = fields(old_df).alias("o"), fields(new_df).alias("n")
    joined = o.join(n, F.col("o.column_name") == F.col("n.column_name"), "full_outer")
    return joined.select(
        F.coalesce("o.column_name", "n.column_name").alias("field_name"),
        F.col("o.t").alias("old_type"),
        F.col("n.t").alias("new_type"),
        F.when(F.col("o.column_name").isNull(), "added")
        .when(F.col("n.column_name").isNull(), "removed")
        .when(F.col("o.t") != F.col("n.t"), "type_changed")
        .otherwise("unchanged")
        .alias("status"),
    )


@register(
    "catalog_value_length_profile",
    group="B",
    oracle="""
    select 'c_name' as column_name,
           min(length(c_name)) as min_len, max(length(c_name)) as max_len,
           round(cast(sum(length(c_name)) as double) / count(*), 6) as avg_len
    from customer
    union all
    select 'c_mktsegment',
           min(length(c_mktsegment)), max(length(c_mktsegment)),
           round(cast(sum(length(c_mktsegment)) as double) / count(*), 6)
    from customer
    """,
)
def catalog_value_length_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: string value-length profiling (min/max/avg chars) for
    every varchar column of a dataset in ONE aggregation pass — the
    crawler's sizing signal for downstream storage and tokenizer cost.
    The single-pass-over-all-columns shape is the profiler obligation
    from SURVEY §4 (never one job per column); the per-column rows are
    unpivoted from the one aggregate row with stack(). Lengths are
    ints, the average is int/int → engine-identical."""
    c = load(spark, sf_dir, "customer")
    a = c.agg(
        F.min(F.length("c_name")).alias("n_min"),
        F.max(F.length("c_name")).alias("n_max"),
        F.sum(F.length("c_name")).alias("n_sum"),
        F.min(F.length("c_mktsegment")).alias("m_min"),
        F.max(F.length("c_mktsegment")).alias("m_max"),
        F.sum(F.length("c_mktsegment")).alias("m_sum"),
        F.count(F.lit(1)).alias("n"),
    )
    return a.select(
        F.expr(
            "stack(2, "
            "'c_name', n_min, n_max, round(cast(n_sum as double) / n, 6), "
            "'c_mktsegment', m_min, m_max, round(cast(m_sum as double) / n, 6)"
            ") as (column_name, min_len, max_len, avg_len)"
        )
    )


@register(
    "catalog_sample_rows",
    group="B",
    oracle="""
    select n_nationkey, n_name
    from nation
    order by md5(cast(n_nationkey as varchar)), n_nationkey
    limit 5
    """,
)
def catalog_sample_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: deterministic preview sample — the catalog's "show me 5
    rows" feature, made reproducible across engines, runs, and cluster
    sizes by ordering on md5(pk) instead of TABLESAMPLE (whose row
    choice is partition-order dependent). At scale this is a
    TakeOrderedAndProject over the hash — no global sort materializes."""
    n = load(spark, sf_dir, "nation")
    return (
        n.select("n_nationkey", "n_name")
        .orderBy(F.md5(F.col("n_nationkey").cast("string")), "n_nationkey")
        .limit(5)
    )


@register(
    "catalog_profile_moments",
    group="B",
    oracle="""
    with s as (
      select count(*) as n,
             sum(d)           as s1,
             sum(d * d)       as s2,
             sum(d * d * d)   as s3,
             sum(d * d * d * d) as s4
      from (select cast(floor(l_discount * 1e3 + 0.5) as bigint) as d
            from lineitem)
    ),
    m as (
      select cast(n as double)  as n,
             cast(s1 as double) / cast(n as double) as m1,
             cast(s2 as double) / cast(n as double) as m2,
             cast(s3 as double) / cast(n as double) as m3,
             cast(s4 as double) / cast(n as double) as m4
      from s
    )
    select round((m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1)
                 / pow(m2 - m1 * m1, 1.5), 6) as skewness,
           round((m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2 - 3 * m1 * m1 * m1 * m1)
                 / pow(m2 - m1 * m1, 2.0) - 3, 6) as excess_kurtosis
    from m
    """,
)
def catalog_profile_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: higher-moment profiling — population skewness and excess
    kurtosis of l_discount from raw power sums (s1..s4) over
    1e-3-quantized int64 values, combined with the standard
    central-moment identities in an expression written identically in
    both engines. Spark's built-in skewness()/kurtosis() are streaming
    float accumulations (partitioning-dependent) — unusable for
    hash-match, same reason as catalog_column_correlation. Overflow
    envelope: d ≤ 1e3 → d⁴ ≤ 1e12 → |s4| ≤ 6e18 at sf1 (int64 max
    9.2e18); for bigger data or wider domains drop the quantization
    scale. One aggregation pass, map-side combinable."""
    li = load(spark, sf_dir, "lineitem")
    d = F.floor(F.col("l_discount") * 1e3 + 0.5).cast("long")
    s = li.agg(
        F.count(F.lit(1)).alias("n_"),
        F.sum(d).alias("s1"),
        F.sum(d * d).alias("s2"),
        F.sum(d * d * d).alias("s3"),
        F.sum(d * d * d * d).alias("s4"),
    )
    n = F.col("n_").cast("double")
    m1 = F.col("s1").cast("double") / n
    m2 = F.col("s2").cast("double") / n
    m3 = F.col("s3").cast("double") / n
    m4 = F.col("s4").cast("double") / n
    var = m2 - m1 * m1
    return s.select(
        F.round((m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1) / F.pow(var, 1.5), 6).alias(
            "skewness"
        ),
        F.round(
            (m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2 - 3 * m1 * m1 * m1 * m1)
            / F.pow(var, 2.0)
            - 3,
            6,
        ).alias("excess_kurtosis"),
    )


_SIM_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

_SIM_DESCRIBES = " union all ".join(
    f"select '{t}' as tbl, regexp_replace(column_name, '^[a-z]+_', '') as col"
    f" from (describe select * from {t})"
    for t in _SIM_TABLES
)


@register(
    "catalog_table_similarity",
    group="B",
    oracle=f"""
    with cols as ({_SIM_DESCRIBES}),
    sizes as (select tbl, count(*) as n from cols group by 1),
    inter as (
      select a.tbl as tbl_a, b.tbl as tbl_b, count(*) as n_shared
      from cols a join cols b on a.col = b.col and a.tbl < b.tbl
      group by 1, 2
    )
    select tbl_a, tbl_b, n_shared,
           round(cast(n_shared as double)
                 / (sa.n + sb.n - n_shared), 6) as jaccard
    from inter
    join sizes sa on tbl_a = sa.tbl
    join sizes sb on tbl_b = sb.tbl
    where n_shared >= 2
    """,
)
def catalog_table_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: dataset-relatedness discovery — pairwise Jaccard over
    prefix-normalized column names (c_custkey/o_custkey → custkey), the
    name-based half of join-key discovery that crawlers run before the
    value-based containment check (catalog_fk_discovery). Pairs with ≥2
    shared normalized names are candidate join partners. Schemas are
    footer metadata: the whole computation is |columns| rows — no data
    is scanned at any lake size."""
    rows = []
    for t in _SIM_TABLES:
        for f in load(spark, sf_dir, t).schema.fields:
            import re as _re

            rows.append(Row(tbl=t, col=_re.sub(r"^[a-z]+_", "", f.name)))
    cols = spark.createDataFrame(rows, "tbl string, col string")
    sizes = cols.groupBy("tbl").agg(F.count(F.lit(1)).alias("n"))
    a, b = cols.alias("a"), cols.alias("b")
    inter = (
        a.join(b, (F.col("a.col") == F.col("b.col")) & (F.col("a.tbl") < F.col("b.tbl")))
        .groupBy(F.col("a.tbl").alias("tbl_a"), F.col("b.tbl").alias("tbl_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= 2)
    )
    sa = sizes.select(F.col("tbl").alias("tbl_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("tbl").alias("tbl_b"), F.col("n").alias("nb"))
    return (
        inter.join(F.broadcast(sa), "tbl_a")
        .join(F.broadcast(sb), "tbl_b")
        .select(
            "tbl_a",
            "tbl_b",
            "n_shared",
            F.round(
                F.col("n_shared").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
        )
    )


_ENTROPY_COLS = [
    ("lineitem", "l_returnflag"),
    ("lineitem", "l_linestatus"),
    ("orders", "o_orderstatus"),
    ("orders", "o_orderpriority"),
    ("customer", "c_mktsegment"),
    ("events", "event_type"),
    ("documents", "lang"),
]

# Shannon entropy in nats from a single aggregation pass, using the
# identity -Σ p·ln p = ln(N) - (Σ c·ln c)/N over per-value counts c —
# no window over the counts, no second shuffle.
_ENTROPY_SQL = f"""
    select '{{t}}' as tab, '{{c}}' as col,
           count(*) as n_distinct,
           round(ln(cast(sum(cnt) as double))
                 - ({SUM_D.format('cnt * ln(cnt)')})
                   / cast(sum(cnt) as double), 6) as entropy_nats
    from (select {{c}}, count(*) as cnt from {{t}} group by 1)
"""


@register(
    "catalog_column_entropy",
    group="B",
    oracle="\nunion all\n".join(
        _ENTROPY_SQL.format(t=t, c=c) for t, c in _ENTROPY_COLS
    ),
)
def catalog_column_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: Shannon entropy (nats) of each categorical column across
    the lake — the information-density profile a cataloger reports next
    to NDV (uniform 5-way ≈ ln 5 ≈ 1.609; a constant column is 0, a key
    column is ln N). Uses the single-pass identity
    -Σp·ln p = ln N − (Σ c·ln c)/N so each column costs one count
    aggregation plus one scalar agg over its value histogram — the
    per-term c·ln c sum goes through micro-unit integers, making the
    result order-independent and engine-identical. Per-column jobs are
    independent (a real crawler fans them out); each output is a single
    row so the final union is free."""
    out: DataFrame | None = None
    for t, c in _ENTROPY_COLS:
        cnt = load(spark, sf_dir, t).groupBy(c).agg(F.count(F.lit(1)).alias("cnt"))
        n = F.sum("cnt").cast("double")
        one = cnt.agg(
            F.lit(t).alias("tab"),
            F.lit(c).alias("col"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.round(
                F.log(n) - dsum(F.col("cnt") * F.log("cnt")) / n, 6
            ).alias("entropy_nats"),
        )
        out = one if out is None else out.unionByName(one)
    assert out is not None
    return out


@register(
    "catalog_freshness",
    group="B",
    oracle="""
    select 'orders' as tab, cast(max(o_orderdate) as timestamp) as last_ts,
           date_diff('day', cast(max(o_orderdate) as timestamp),
                     timestamp '2002-01-01') as staleness_days
    from orders
    union all
    select 'lineitem', cast(max(l_shipdate) as timestamp),
           date_diff('day', cast(max(l_shipdate) as timestamp),
                     timestamp '2002-01-01')
    from lineitem
    union all
    select 'events', cast(max(ts) as timestamp),
           date_diff('day', cast(max(ts) as timestamp), timestamp '2002-01-01')
    from events
    """,
)
def catalog_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: dataset freshness report — newest event-time per
    time-bearing table and its staleness against a fixed audit anchor
    (2002-01-01, just past every fixture's time domain). This is the
    crawler's "is this dataset still being written?" signal. Each row
    is a max() aggregate — Parquet column statistics could serve it
    from footers alone; the DataFrame formulation keeps it engine-
    checkable. datediff argument order differs across engines (§2.L):
    Spark datediff(end, start) ≡ DuckDB date_diff('day', start, end)."""
    anchor = F.lit("2002-01-01").cast("timestamp")

    def one(t: str, col: str) -> DataFrame:
        return load(spark, sf_dir, t).agg(
            F.lit(t).alias("tab"),
            F.max(col).alias("last_ts"),
            F.datediff(anchor, F.max(col)).cast("long").alias("staleness_days"),
        )

    return (
        one("orders", "o_orderdate")
        .unionByName(one("lineitem", "l_shipdate"))
        .unionByName(one("events", "ts"))
    )


@register(
    "catalog_outlier_iqr",
    group="B",
    oracle="""
    with f as (
      select quantile_cont(c_acctbal, 0.25) as q1,
             quantile_cont(c_acctbal, 0.75) as q3
      from customer
    )
    select round(q1, 4) as q1, round(q3, 4) as q3,
           round(q3 - q1, 4) as iqr,
           count(*) filter (where c_acctbal < q1 - 1.5 * (q3 - q1)
                               or c_acctbal > q3 + 1.5 * (q3 - q1))
             as n_outliers,
           count(*) as n_rows
    from customer, f
    group by q1, q3
    """,
)
def catalog_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: Tukey-fence outlier audit — 1.5×IQR fences around
    [Q1, Q3] of account balance, plus the count of rows outside them.
    The profiling question every crawler answers before a table is
    trusted for training: "how heavy are the tails?". Two passes: one
    exact-percentile aggregate (Spark's percentile matches DuckDB's
    quantile_cont interpolation, §2 E10), then a broadcast of the
    1-row fence frame back over the scan for the filtered count —
    at 100 TB the second pass swaps to approx_percentile fences with
    identical plan shape (scan + broadcast + conditional count)."""
    c = load(spark, sf_dir, "customer")
    fences = c.agg(
        F.percentile("c_acctbal", F.lit(0.25)).alias("q1"),
        F.percentile("c_acctbal", F.lit(0.75)).alias("q3"),
    )
    q1, q3 = F.col("q1"), F.col("q3")
    iqr = q3 - q1
    out_pred = (F.col("c_acctbal") < q1 - 1.5 * iqr) | (
        F.col("c_acctbal") > q3 + 1.5 * iqr
    )
    return (
        c.crossJoin(F.broadcast(fences))
        .groupBy()
        .agg(
            F.round(F.first("q1"), 4).alias("q1"),
            F.round(F.first("q3"), 4).alias("q3"),
            F.round(F.first(q3 - q1), 4).alias("iqr"),
            F.sum(out_pred.cast("long")).alias("n_outliers"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "quality_dup_key_audit",
    group="B",
    oracle="""
    with g as (
      select l_orderkey, l_linenumber, count(*) as c
      from lineitem group by 1, 2
    )
    select count(*) filter (where c > 1) as dup_groups,
           cast(coalesce(sum(c) filter (where c > 1), 0) as bigint)
             as rows_in_dup_groups,
           cast(sum(c) as bigint) as total_rows,
           max(c) as worst_multiplicity
    from g
    """,
)
def quality_dup_key_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: candidate-key violation audit — for a key the catalog
    EXPECTS to be unique ((l_orderkey, l_linenumber); the regenerated
    fixtures actually violate it, FIXTURES.md), report duplicate-group
    count, rows involved, and the worst multiplicity. This is the
    data-quality check that caught a real fixture regression in this
    very repo. One hash aggregation on the key, then a tiny re-agg —
    the map-side partial aggregation absorbs most of the shuffle at
    100 TB because dup groups are rare by construction."""
    li = load(spark, sf_dir, "lineitem")
    g = li.groupBy("l_orderkey", "l_linenumber").agg(F.count(F.lit(1)).alias("c"))
    dup = F.col("c") > 1
    return g.agg(
        F.sum(dup.cast("long")).alias("dup_groups"),
        F.coalesce(F.sum(F.when(dup, F.col("c"))), F.lit(0))
        .cast("bigint")
        .alias("rows_in_dup_groups"),
        F.sum("c").cast("bigint").alias("total_rows"),
        F.max("c").alias("worst_multiplicity"),
    )


@register(
    "catalog_semantic_type",
    group="B",
    oracle="""
    with cols as (
      select 'region' as dataset, 'r_regionkey' as field_name, 0 as position, 'int' as spark_type, count(distinct r_regionkey) as ndv, count(*) as n_rows from region
      union all select 'region' as dataset, 'r_name' as field_name, 1 as position, 'string' as spark_type, count(distinct r_name) as ndv, count(*) as n_rows from region
      union all select 'nation' as dataset, 'n_nationkey' as field_name, 0 as position, 'int' as spark_type, count(distinct n_nationkey) as ndv, count(*) as n_rows from nation
      union all select 'nation' as dataset, 'n_name' as field_name, 1 as position, 'string' as spark_type, count(distinct n_name) as ndv, count(*) as n_rows from nation
      union all select 'nation' as dataset, 'n_regionkey' as field_name, 2 as position, 'int' as spark_type, count(distinct n_regionkey) as ndv, count(*) as n_rows from nation
      union all select 'customer' as dataset, 'c_custkey' as field_name, 0 as position, 'bigint' as spark_type, count(distinct c_custkey) as ndv, count(*) as n_rows from customer
      union all select 'customer' as dataset, 'c_name' as field_name, 1 as position, 'string' as spark_type, count(distinct c_name) as ndv, count(*) as n_rows from customer
      union all select 'customer' as dataset, 'c_nationkey' as field_name, 2 as position, 'int' as spark_type, count(distinct c_nationkey) as ndv, count(*) as n_rows from customer
      union all select 'customer' as dataset, 'c_acctbal' as field_name, 3 as position, 'double' as spark_type, count(distinct c_acctbal) as ndv, count(*) as n_rows from customer
      union all select 'customer' as dataset, 'c_mktsegment' as field_name, 4 as position, 'string' as spark_type, count(distinct c_mktsegment) as ndv, count(*) as n_rows from customer
      union all select 'supplier' as dataset, 's_suppkey' as field_name, 0 as position, 'bigint' as spark_type, count(distinct s_suppkey) as ndv, count(*) as n_rows from supplier
      union all select 'supplier' as dataset, 's_name' as field_name, 1 as position, 'string' as spark_type, count(distinct s_name) as ndv, count(*) as n_rows from supplier
      union all select 'supplier' as dataset, 's_nationkey' as field_name, 2 as position, 'int' as spark_type, count(distinct s_nationkey) as ndv, count(*) as n_rows from supplier
      union all select 'supplier' as dataset, 's_acctbal' as field_name, 3 as position, 'double' as spark_type, count(distinct s_acctbal) as ndv, count(*) as n_rows from supplier
      union all select 'part' as dataset, 'p_partkey' as field_name, 0 as position, 'bigint' as spark_type, count(distinct p_partkey) as ndv, count(*) as n_rows from part
      union all select 'part' as dataset, 'p_name' as field_name, 1 as position, 'string' as spark_type, count(distinct p_name) as ndv, count(*) as n_rows from part
      union all select 'part' as dataset, 'p_brand' as field_name, 2 as position, 'string' as spark_type, count(distinct p_brand) as ndv, count(*) as n_rows from part
      union all select 'part' as dataset, 'p_type' as field_name, 3 as position, 'string' as spark_type, count(distinct p_type) as ndv, count(*) as n_rows from part
      union all select 'part' as dataset, 'p_size' as field_name, 4 as position, 'int' as spark_type, count(distinct p_size) as ndv, count(*) as n_rows from part
      union all select 'part' as dataset, 'p_retailprice' as field_name, 5 as position, 'double' as spark_type, count(distinct p_retailprice) as ndv, count(*) as n_rows from part
      union all select 'orders' as dataset, 'o_orderkey' as field_name, 0 as position, 'bigint' as spark_type, count(distinct o_orderkey) as ndv, count(*) as n_rows from orders
      union all select 'orders' as dataset, 'o_custkey' as field_name, 1 as position, 'bigint' as spark_type, count(distinct o_custkey) as ndv, count(*) as n_rows from orders
      union all select 'orders' as dataset, 'o_orderstatus' as field_name, 2 as position, 'string' as spark_type, count(distinct o_orderstatus) as ndv, count(*) as n_rows from orders
      union all select 'orders' as dataset, 'o_totalprice' as field_name, 3 as position, 'double' as spark_type, count(distinct o_totalprice) as ndv, count(*) as n_rows from orders
      union all select 'orders' as dataset, 'o_orderdate' as field_name, 4 as position, 'timestamp_ntz' as spark_type, count(distinct o_orderdate) as ndv, count(*) as n_rows from orders
      union all select 'orders' as dataset, 'o_orderpriority' as field_name, 5 as position, 'string' as spark_type, count(distinct o_orderpriority) as ndv, count(*) as n_rows from orders
      union all select 'lineitem' as dataset, 'l_orderkey' as field_name, 0 as position, 'bigint' as spark_type, count(distinct l_orderkey) as ndv, count(*) as n_rows from lineitem
      union all select 'lineitem' as dataset, 'l_partkey' as field_name, 1 as position, 'bigint' as spark_type, count(distinct l_partkey) as ndv, count(*) as n_rows from lineitem
      union all select 'lineitem' as dataset, 'l_suppkey' as field_name, 2 as position, 'bigint' as spark_type, count(distinct l_suppkey) as ndv, count(*) as n_rows from lineitem
      union all select 'lineitem' as dataset, 'l_linenumber' as field_name, 3 as position, 'int' as spark_type, count(distinct l_linenumber) as ndv, count(*) as n_rows from lineitem
      union all select 'lineitem' as dataset, 'l_quantity' as field_name, 4 as position, 'double' as spark_type, count(distinct l_quantity) as ndv, count(*) as n_rows from lineitem
      union all select 'lineitem' as dataset, 'l_extendedprice' as field_name, 5 as position, 'double' as spark_type, count(distinct l_extendedprice) as ndv, count(*) as n_rows from lineitem
      union all select 'lineitem' as dataset, 'l_discount' as field_name, 6 as position, 'double' as spark_type, count(distinct l_discount) as ndv, count(*) as n_rows from lineitem
      union all select 'lineitem' as dataset, 'l_tax' as field_name, 7 as position, 'double' as spark_type, count(distinct l_tax) as ndv, count(*) as n_rows from lineitem
      union all select 'lineitem' as dataset, 'l_returnflag' as field_name, 8 as position, 'string' as spark_type, count(distinct l_returnflag) as ndv, count(*) as n_rows from lineitem
      union all select 'lineitem' as dataset, 'l_linestatus' as field_name, 9 as position, 'string' as spark_type, count(distinct l_linestatus) as ndv, count(*) as n_rows from lineitem
      union all select 'lineitem' as dataset, 'l_shipdate' as field_name, 10 as position, 'timestamp_ntz' as spark_type, count(distinct l_shipdate) as ndv, count(*) as n_rows from lineitem
      union all select 'events' as dataset, 'event_id' as field_name, 0 as position, 'bigint' as spark_type, count(distinct event_id) as ndv, count(*) as n_rows from events
      union all select 'events' as dataset, 'ts' as field_name, 1 as position, 'timestamp' as spark_type, count(distinct ts) as ndv, count(*) as n_rows from events
      union all select 'events' as dataset, 'user_id' as field_name, 2 as position, 'bigint' as spark_type, count(distinct user_id) as ndv, count(*) as n_rows from events
      union all select 'events' as dataset, 'event_type' as field_name, 3 as position, 'string' as spark_type, count(distinct event_type) as ndv, count(*) as n_rows from events
      union all select 'events' as dataset, 'value' as field_name, 4 as position, 'double' as spark_type, count(distinct value) as ndv, count(*) as n_rows from events
      union all select 'events' as dataset, 'props' as field_name, 5 as position, 'string' as spark_type, count(distinct props) as ndv, count(*) as n_rows from events
      union all select 'documents' as dataset, 'doc_id' as field_name, 0 as position, 'bigint' as spark_type, count(distinct doc_id) as ndv, count(*) as n_rows from documents
      union all select 'documents' as dataset, 'text' as field_name, 1 as position, 'string' as spark_type, count(distinct text) as ndv, count(*) as n_rows from documents
      union all select 'documents' as dataset, 'lang' as field_name, 2 as position, 'string' as spark_type, count(distinct lang) as ndv, count(*) as n_rows from documents
      union all select 'documents' as dataset, 'source' as field_name, 3 as position, 'string' as spark_type, count(distinct source) as ndv, count(*) as n_rows from documents
      union all select 'documents' as dataset, 'n_chars' as field_name, 4 as position, 'bigint' as spark_type, count(distinct n_chars) as ndv, count(*) as n_rows from documents
      union all select 'embeddings' as dataset, 'vec_id' as field_name, 0 as position, 'bigint' as spark_type, count(distinct vec_id) as ndv, count(*) as n_rows from embeddings
      union all select 'embeddings' as dataset, 'embedding' as field_name, 1 as position, 'array<float>' as spark_type, count(distinct cast(embedding as varchar)) as ndv, count(*) as n_rows from embeddings
      union all select 'embeddings' as dataset, 'label' as field_name, 2 as position, 'int' as spark_type, count(distinct label) as ndv, count(*) as n_rows from embeddings
    )
    select dataset, field_name, position, spark_type, ndv,
           case
             when regexp_matches(field_name, '(_key|_id|^key$|_custkey|_orderkey)$')
                  or regexp_matches(field_name, '_(key|id)$') then 'identifier'
             when spark_type in ('timestamp', 'timestamp_ntz', 'date')
               then 'temporal'
             when regexp_matches(field_name, '(price|bal|value|tax|discount|charge)')
               then 'measure_monetary'
             when spark_type in ('double', 'float') then 'measure'
             when spark_type in ('int', 'bigint')
                  and ndv < greatest(64, n_rows / 100) then 'category_numeric'
             when spark_type in ('int', 'bigint') then 'measure'
             when spark_type = 'string' then
               case when ndv <= 64 then 'category' else 'text' end
             when starts_with(spark_type, 'array') then 'vector'
             else 'other'
           end as semantic_type
    from cols
    """,
)
def catalog_semantic_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: semantic column typing — the crawler heuristic that turns
    a physical schema into catalog semantics: *_key/*_id and `key`
    suffixes → identifier, timestamp/date types → temporal,
    price/bal/value/tax/discount names → monetary-ish measure, other
    numerics → measure, string with bounded NDV (profiled small
    domain) → category, long strings → text. Built FROM the B1 schema
    frame entirely with Column expressions (one small local frame —
    classification is schema-sized, never data-sized; the NDV probe
    reuses the distinct profiler's approx counts per column on a
    single pass per table; exact countDistinct so the classifier is
    oracle-checkable — the HLL one-pass variant of the same probe lives
    in catalog_profile_distinct). The oracle re-implements the full
    classification vocabulary in SQL over the pinned fixture schema;
    the property test additionally pins known semantics (keys →
    identifier, ts → temporal, text → textual)."""
    # ONE job per (table, column), all submitted concurrently. The
    # earlier one-agg-per-table form folded every column into a single
    # multi-countDistinct, which Catalyst executes as an Expand with
    # one input copy PER distinct column — for lineitem a 12× blowup of
    # the full row stream (2.9 s alone at sf0.1). Per-column jobs scan
    # only their own parquet column (columnar pruning makes each scan
    # ~1/12th of the table) and shuffle only that column's partial
    # distinct sets — the column-store-native NDV shape a 100 TB
    # crawler wants (0.9 s for all 12 lineitem columns at sf0.1).
    from concurrent.futures import ThreadPoolExecutor

    dfs = {t: load(spark, sf_dir, t) for t in TABLES}

    def ndv_job(job):
        t, c = job
        return t, c, dfs[t].select(c).agg(F.countDistinct(c)).collect()[0][0]

    jobs = [(t, f.name) for t in TABLES for f in dfs[t].schema.fields]
    with ThreadPoolExecutor(max_workers=32) as ex:
        counts = dict(ex.map(lambda t: (t, dfs[t].count()), TABLES))
        ndvs = {(t, c): v for t, c, v in ex.map(ndv_job, jobs)}

    schema_rows = []
    for t in TABLES:
        for i, f in enumerate(dfs[t].schema.fields):
            schema_rows.append(
                Row(
                    dataset=t,
                    field_name=f.name,
                    position=i,
                    spark_type=f.dataType.simpleString(),
                    ndv=int(ndvs[(t, f.name)]),
                    n_rows=counts[t],
                )
            )
    frame = spark.createDataFrame(schema_rows)
    name, typ = F.col("field_name"), F.col("spark_type")
    semantic = (
        F.when(
            name.rlike("(_key|_id|^key$|_custkey|_orderkey)$")
            | name.rlike("_(key|id)$"),
            "identifier",
        )
        .when(typ.isin("timestamp", "timestamp_ntz", "date"), "temporal")
        .when(
            name.rlike("(price|bal|value|tax|discount|charge)"),
            "measure_monetary",
        )
        .when(typ.isin("double", "float"), "measure")
        .when(
            typ.isin("int", "bigint")
            & (F.col("ndv") < F.greatest(F.lit(64), F.col("n_rows") / 100)),
            "category_numeric",
        )
        .when(typ.isin("int", "bigint"), "measure")
        .when(typ == "string", 
              F.when(F.col("ndv") <= 64, "category").otherwise("text"))
        .when(typ.startswith("array"), "vector")
        .otherwise("other")
    )
    return frame.select(
        "dataset", "field_name", "position", "spark_type", "ndv",
        semantic.alias("semantic_type"),
    )


@register(
    "catalog_drift_psi",
    group="B",
    oracle="""
    with binned as (
      select least(9, cast(floor(o_totalprice / 50000.0) as int)) as bin,
             count(*) filter (where year(o_orderdate) <= 1997) as n_base,
             count(*) filter (where year(o_orderdate) >= 1998) as n_curr
      from orders
      group by 1
    ),
    tot as (
      select bin, n_base, n_curr,
             cast(n_base as double) / (select sum(cast(n_base as bigint)) from binned) as p_base,
             cast(n_curr as double) / (select sum(cast(n_curr as bigint)) from binned) as p_curr
      from binned
    )
    select bin, n_base, n_curr,
           round(p_base, 6) as p_base,
           round(p_curr, 6) as p_curr,
           round(case when n_base > 0 and n_curr > 0
                      then (p_base - p_curr) * ln(p_base / p_curr)
                      else 0.0 end, 6) as psi_term
    from tot
    order by bin
    """,
)
def catalog_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: value-distribution drift between two crawl snapshots via
    the Population Stability Index — the monitoring statistic a catalog
    computes when it re-crawls a dataset and wants "has this column's
    distribution moved?" as a number, not a diff of rows
    (catalog_snapshot_diff detects row churn; this detects
    distributional churn even when every row changed). Baseline =
    orders ≤ 1997, current = ≥ 1998, o_totalprice in ten fixed-width
    50 k bins. Fixed bins (not quantiles) are deliberate: bin edges are
    constants, so the two periods' histograms are ONE grouped
    aggregation over one scan — at 100 TB a quantile-binned PSI would
    need a sketch pass first, while this stays a single map-side
    combinable pass. Each PSI term (p−q)·ln(p/q) is ≥ 0; bins empty on
    either side contribute 0 (documented convention, matches the
    coalesce-and-skip practice). Counts are exact ints; the p's are one
    IEEE divide each; ln differs across libm implementations only in
    the last ulp, absorbed by round 6."""
    o = load(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    binc = F.least(F.lit(9), F.floor(F.col("o_totalprice") / 50000.0)).cast("int")
    binned = o.groupBy(binc.alias("bin")).agg(
        F.count_if(yr <= 1997).alias("n_base"),
        F.count_if(yr >= 1998).alias("n_curr"),
    )
    w = W.partitionBy()
    p_base = F.col("n_base").cast("double") / F.sum("n_base").over(w).cast("double")
    p_curr = F.col("n_curr").cast("double") / F.sum("n_curr").over(w).cast("double")
    term = F.when(
        (F.col("n_base") > 0) & (F.col("n_curr") > 0),
        (p_base - p_curr) * F.log(p_base / p_curr),
    ).otherwise(F.lit(0.0))
    return (
        binned.select(
            "bin", "n_base", "n_curr",
            F.round(p_base, 6).alias("p_base"),
            F.round(p_curr, 6).alias("p_curr"),
            F.round(term, 6).alias("psi_term"),
        )
        .orderBy("bin")
    )


@register(
    "catalog_benford_audit",
    group="B",
    oracle="""
    with digits as (
      select cast(floor(l_extendedprice
                        / pow(10, floor(log10(l_extendedprice)))) as int)
             as digit
      from lineitem
      where l_extendedprice > 0
    )
    select digit,
           count(*) as n,
           round(cast(count(*) as double)
                 / (select count(*) from digits), 6) as observed_p,
           round(log10(1.0 + 1.0 / digit), 6) as benford_p,
           round(cast(count(*) as double) / (select count(*) from digits)
                 - log10(1.0 + 1.0 / digit), 6) as delta_p
    from digits
    group by digit
    order by digit
    """,
)
def catalog_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: Benford's-law first-digit audit — the classic
    data-quality / fraud-detection screen a profiler runs over monetary
    columns: natural multi-scale amounts follow P(d) = log10(1+1/d),
    and a column whose leading-digit histogram deviates hard from that
    curve was likely generated, capped, or tampered with. First digit
    extracted arithmetically (x / 10^floor(log10 x)) — never via
    cast-to-string, whose formatting differs across engines. One
    grouped aggregation over one scan (9 groups); the expected curve is
    a constant expression. log10 is exact on exact powers of ten in
    both engines (Java Math.log10 spec; libm), and prices carry cents,
    so the floor(log10) boundary race is not reachable in this data."""
    li = load(spark, sf_dir, "lineitem").where(F.col("l_extendedprice") > 0)
    digit = F.floor(
        F.col("l_extendedprice")
        / F.pow(F.lit(10.0), F.floor(F.log10("l_extendedprice")))
    ).cast("int")
    g = li.groupBy(digit.alias("digit")).agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy()
    obs = F.col("n").cast("double") / F.sum("n").over(w).cast("double")
    benford = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return g.select(
        "digit", "n",
        F.round(obs, 6).alias("observed_p"),
        F.round(benford, 6).alias("benford_p"),
        F.round(obs - benford, 6).alias("delta_p"),
    ).orderBy("digit")


@register(
    "catalog_join_cardinality_est",
    group="B",
    oracle="""
    with li_ord as (
      select a.k as n_keys, a.c * b.c as contrib
      from (select l_orderkey as key, count(*) as c, 1 as k from lineitem group by 1) a
      join (select o_orderkey as key, count(*) as c from orders group by 1) b
        using (key)
    ),
    li_part as (
      select 1 as k, c * c as contrib
      from (select l_partkey, count(*) as c from lineitem group by 1)
    ),
    li_supp as (
      select 1 as k, c * c as contrib
      from (select l_suppkey, count(*) as c from lineitem group by 1)
    )
    select 'lineitem_x_orders' as join_name,
           count(*) as n_keys,
           cast(sum(contrib) as bigint) as est_rows,
           max(contrib) as max_key_contrib,
           round(cast(max(contrib) as double)
                 / cast(sum(contrib) as double), 6) as skew_share
    from li_ord
    union all
    select 'lineitem_self_partkey', count(*), cast(sum(contrib) as bigint),
           max(contrib),
           round(cast(max(contrib) as double) / cast(sum(contrib) as double), 6)
    from li_part
    union all
    select 'lineitem_self_suppkey', count(*), cast(sum(contrib) as bigint),
           max(contrib),
           round(cast(max(contrib) as double) / cast(sum(contrib) as double), 6)
    from li_supp
    """,
)
def catalog_join_cardinality_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: join-output cardinality estimation from per-key count
    histograms — the statistic that decides, before any shuffle is
    paid, whether a planned join is safe (|A⋈B| = Σ_k cnt_A(k)·cnt_B(k),
    exactly, for equi joins) and whether it is skewed (max single-key
    contribution share → salting / AQE-skew-split trigger). The crawler
    stores these per-key histograms per dataset; at plan time the
    estimate costs a join of two SMALL key-count tables, not the real
    fact⋈fact shuffle — the 100 TB payoff is catching a 10^14-row
    accidental many-to-many before launching it. Three estimates here:
    the lineitem⋈orders FK join (exact prediction of the real output)
    and two self-join profiles (partkey/suppkey) whose est_rows would
    be the blow-up size. Integer arithmetic throughout; only the skew
    share is a rounded double. DuckDB widens sum(bigint) to HUGEINT, so
    the oracle casts back to bigint."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")

    def keycounts(df: DataFrame, key: str) -> DataFrame:
        return df.groupBy(F.col(key).alias("key")).agg(
            F.count(F.lit(1)).alias("c")
        )

    def profile(name: str, pairs: DataFrame) -> DataFrame:
        return pairs.agg(
            F.lit(name).alias("join_name"),
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("contrib").alias("est_rows"),
            F.max("contrib").alias("max_key_contrib"),
            F.round(
                F.max("contrib").cast("double")
                / F.sum("contrib").cast("double"),
                6,
            ).alias("skew_share"),
        )

    fk = (
        keycounts(li, "l_orderkey")
        .join(keycounts(o, "o_orderkey").withColumnRenamed("c", "c2"), "key")
        .select((F.col("c") * F.col("c2")).alias("contrib"))
    )
    selfp = keycounts(li, "l_partkey").select(
        (F.col("c") * F.col("c")).alias("contrib")
    )
    selfs = keycounts(li, "l_suppkey").select(
        (F.col("c") * F.col("c")).alias("contrib")
    )
    return (
        profile("lineitem_x_orders", fk)
        .unionByName(profile("lineitem_self_partkey", selfp))
        .unionByName(profile("lineitem_self_suppkey", selfs))
    )


@register(
    "catalog_drift_ks",
    group="B",
    oracle="""
    with vals as (
      select o_totalprice as v,
             count(*) filter (where year(o_orderdate) <= 1997) as n1,
             count(*) filter (where year(o_orderdate) >= 1998) as n2
      from orders
      group by 1
    ),
    ecdf as (
      select v,
             cast(sum(n1) over (order by v
                  rows between unbounded preceding and current row) as double)
               / (select sum(cast(n1 as bigint)) from vals)
             - cast(sum(n2) over (order by v
                  rows between unbounded preceding and current row) as double)
               / (select sum(cast(n2 as bigint)) from vals) as diff,
             (select sum(cast(n1 as bigint)) from vals) as t1,
             (select sum(cast(n2 as bigint)) from vals) as t2
      from vals
    ),
    m as (select max(abs(diff)) as dmax from ecdf)
    select cast(max(t1) as bigint) as n_base,
           cast(max(t2) as bigint) as n_curr,
           round((select dmax from m), 6) as ks_d,
           round(min(v), 2) as ks_at
    from ecdf where abs(diff) = (select dmax from m)
    """,
)
def catalog_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: two-sample Kolmogorov–Smirnov drift statistic between
    crawl snapshots — the bin-free companion to catalog_drift_psi.
    PSI needs a binning choice and can miss drift that stays inside a
    bin; KS D = max |ECDF₁(v) − ECDF₂(v)| is binning-free and locates
    WHERE the distributions diverge most (ks_at). Shape: one grouped
    count per distinct value (two filtered counts in one pass), one
    global-ordered running sum, one max — cumulative counts are exact
    integers, so the ECDF difference is bit-identical across engines
    and the argmax filter (abs(diff) = dmax) is an exact double
    compare of identically-computed values. r5: the ordered pass is
    the distrank two-sample cumulative (one range shuffle carrying
    BOTH running counts + both grand totals from one offset collect —
    distinct values are data-proportional for continuous columns, so
    no single-partition window), and dmax is a scalar aggregate
    broadcast back. At 100 TB additionally quantize v to ~10⁴ bins
    first (the PSI op's trick) to shrink the value table; the KS
    value changes by at most one bin's mass."""
    from datalakecrawler_spark.distrank import with_global_cumsum

    o = load(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    vals = o.groupBy(F.col("o_totalprice").alias("v")).agg(
        F.count_if(yr <= 1997).alias("n1"),
        F.count_if(yr >= 1998).alias("n2"),
    )
    c = with_global_cumsum(
        vals,
        spark,
        ["v"],
        "n1",
        out="c1",
        with_total="t1",
        extra=[("n2", "c2")],
        extra_totals=["t2"],
    )
    diff = (
        F.col("c1").cast("double") / F.col("t1").cast("double")
        - F.col("c2").cast("double") / F.col("t2").cast("double")
    )
    ecdf = c.select("v", diff.alias("diff"), "t1", "t2")
    dm = ecdf.agg(F.max(F.abs("diff")).alias("dmax"))
    ecdf = ecdf.crossJoin(F.broadcast(dm))
    return ecdf.where(F.abs("diff") == F.col("dmax")).agg(
        F.max("t1").alias("n_base"),
        F.max("t2").alias("n_curr"),
        F.round(F.max("dmax"), 6).alias("ks_d"),
        F.round(F.min("v"), 2).alias("ks_at"),
    )


@register(
    "crawl_partition_catalog",
    group="B",
    oracle="""
    select cast(year(o_orderdate) as varchar) as partition_value,
           count(*) as n_rows,
           1 as n_files
    from orders
    group by 1
    order by 1
    """,
)
def crawl_partition_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: partition discovery — the crawler's `partition` catalog
    entity (SURVEY §1.1): walk a hive-partitioned dataset layout
    (key=value directories), extract each partition's value, and
    record per-partition row and file counts. The crawl is
    Spark-native: one read of the partitioned root (partition column
    comes from directory names, not data), then a group-by on
    (partition value, input_file_name) — no driver-side directory
    walking over data files, which is what lets the same crawl run
    partition-parallel over a million-partition table. The fixture
    dataset is written here (orders partitioned by year, one file per
    partition via repartition(1) so file counts are deterministic and
    the whole catalog row is oracle-checkable — n_rows per partition
    must match the source predicate exactly)."""
    from datalakecrawler_spark.sources.scans import _tmp
    import shutil as _shutil

    base = _tmp("partition_catalog")

    _shutil.rmtree(base, ignore_errors=True)
    o = load(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    (
        o.repartition(1)
        .write.mode("overwrite")
        .partitionBy("o_year")
        .parquet(base)
    )
    crawled = spark.read.parquet(base).select(
        F.col("o_year").cast("string").alias("partition_value"),
        F.input_file_name().alias("f"),  # projected first: nondeterministic
    )                                    # exprs can't sit inside an agg
    return (
        crawled.groupBy("partition_value")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("f").cast("int").alias("n_files"),
        )
        .orderBy("partition_value")
    )


_PII_DETECTORS = {
    # POSIX-simple patterns only — must behave identically in Spark's
    # Java regex and DuckDB's RE2 (SURVEY §2.L: no lookaround, no \d
    # shorthand differences — spell out classes).
    "email": "^[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}$",
    "phone_us": "^[0-9]{3}-[0-9]{3}-[0-9]{4}$",
    "numeric_id": "^[0-9]{6,}$",
}


@register(
    "catalog_pii_detect",
    group="B",
    oracle=f"""
    with synth as (
      select lower(regexp_replace(c_name, '[^a-zA-Z0-9]', '.', 'g'))
               || '@example.com' as email_col,
             lpad(cast(c_custkey % 1000 as varchar), 3, '0') || '-'
               || lpad(cast(c_nationkey * 37 % 1000 as varchar), 3, '0') || '-'
               || lpad(cast(c_custkey * 7 % 10000 as varchar), 4, '0')
               as phone_col,
             c_name as name_col,
             cast(c_custkey + 1000000 as varchar) as id_col
      from customer
    ),
    hits as (
      select 'email_col' as column_name, 'email' as detector,
             count(*) as n_rows,
             count(*) filter (where regexp_matches(email_col,
                 '{_PII_DETECTORS["email"]}')) as n_hits
      from synth
      union all
      select 'phone_col', 'phone_us', count(*),
             count(*) filter (where regexp_matches(phone_col,
                 '{_PII_DETECTORS["phone_us"]}'))
      from synth
      union all
      select 'name_col', 'email', count(*),
             count(*) filter (where regexp_matches(lower(name_col),
                 '{_PII_DETECTORS["email"]}'))
      from synth
      union all
      select 'id_col', 'numeric_id', count(*),
             count(*) filter (where regexp_matches(id_col,
                 '{_PII_DETECTORS["numeric_id"]}'))
      from synth
    )
    select column_name, detector, n_rows, n_hits,
           round(cast(n_hits as double) / n_rows, 6) as hit_rate,
           cast(n_hits as double) / n_rows >= 0.8 as flagged_pii
    from hits
    order by column_name, detector
    """,
)
def catalog_pii_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: PII detection — the governance scan a crawler runs per
    column before a dataset is released: regex detectors (email, US
    phone, long numeric identifier) evaluated over the column, a
    hit-rate per (column, detector), and a flag when ≥80% of values
    match (rate-based, so a stray match in a free-text column doesn't
    quarantine the dataset). Fixtures carry no real PII, so the
    PII-shaped columns are synthesized deterministically from customer
    fields — the detector machinery (pattern set, rate computation,
    thresholding) is the artifact under test, and every count is
    oracle-checked. Patterns stay POSIX-simple: Java regex (Spark) and
    RE2 (DuckDB) agree only on the common subset — no lookaround, no
    shorthand classes. One pass over the column set; at 100 TB the
    scan samples (catalog_sample_rows) instead of reading full
    columns, trading certainty for a bounded scan — same detectors,
    same thresholds."""
    c = load(spark, sf_dir, "customer")
    synth = c.select(
        F.concat(
            F.lower(F.regexp_replace(F.col("c_name"), "[^a-zA-Z0-9]", ".")),
            F.lit("@example.com"),
        ).alias("email_col"),
        F.concat(
            F.lpad((F.col("c_custkey") % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((F.col("c_nationkey") * 37 % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((F.col("c_custkey") * 7 % 10000).cast("string"), 4, "0"),
        ).alias("phone_col"),
        F.col("c_name").alias("name_col"),
        (F.col("c_custkey") + 1000000).cast("string").alias("id_col"),
    )
    probes = [
        ("email_col", "email", F.col("email_col")),
        ("phone_col", "phone_us", F.col("phone_col")),
        ("name_col", "email", F.lower(F.col("name_col"))),
        ("id_col", "numeric_id", F.col("id_col")),
    ]
    out = None
    for col_name, det, expr in probes:
        part = synth.agg(
            F.lit(col_name).alias("column_name"),
            F.lit(det).alias("detector"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count_if(expr.rlike(_PII_DETECTORS[det])).alias("n_hits"),
        )
        out = part if out is None else out.unionByName(part)
    rate = F.col("n_hits").cast("double") / F.col("n_rows")
    return out.select(
        "column_name", "detector", "n_rows", "n_hits",
        F.round(rate, 6).alias("hit_rate"),
        (rate >= 0.8).alias("flagged_pii"),
    ).orderBy("column_name", "detector")


@register(
    "catalog_composite_pk_mining",
    group="B",
    oracle="""
    with m as (
      select cast(count(*) as bigint) as n,
             count(distinct (o_custkey, o_orderdate)) as d_cust_date,
             count(distinct (o_custkey, o_orderpriority)) as d_cust_prio,
             count(distinct (o_custkey, o_orderstatus)) as d_cust_stat,
             count(distinct (o_orderdate, o_orderpriority)) as d_date_prio,
             count(distinct (o_orderdate, o_orderstatus)) as d_date_stat,
             count(distinct (o_orderpriority, o_orderstatus)) as d_prio_stat
      from orders
    )
    select col_pair, n, n_distinct,
           round(cast(n_distinct as double) / n, 6) as uniqueness,
           n_distinct = n as is_key
    from (
      select 'o_custkey,o_orderdate' as col_pair, n,
             d_cust_date as n_distinct from m
      union all select 'o_custkey,o_orderpriority', n, d_cust_prio from m
      union all select 'o_custkey,o_orderstatus', n, d_cust_stat from m
      union all select 'o_orderdate,o_orderpriority', n, d_date_prio from m
      union all select 'o_orderdate,o_orderstatus', n, d_date_stat from m
      union all select 'o_orderpriority,o_orderstatus', n, d_prio_stat
                from m
    ) t
    order by uniqueness desc, col_pair
    """,
)
def catalog_composite_pk_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: composite-key mining — test every non-trivial column
    PAIR of orders for uniqueness (catalog_pk_discovery finds single-
    column keys; real lake tables often key on composites like
    (entity, date)). All six pairwise distinct counts are collected
    in ONE aggregation pass (count_distinct over a struct per pair —
    Spark expands this via a single expand + one shuffle rather than
    six scans); the long-format report is a literal 6-row projection.
    Uniqueness ratio is an exact-count ratio; at 100 TB swap
    count_distinct for HLL (approx_count_distinct) per pair and keep
    the same single-pass shape, gating candidates before an exact
    confirm pass — the standard two-phase key-discovery trick."""
    o = load(spark, sf_dir, "orders")
    pairs = [
        ("o_custkey", "o_orderdate", "d_cust_date"),
        ("o_custkey", "o_orderpriority", "d_cust_prio"),
        ("o_custkey", "o_orderstatus", "d_cust_stat"),
        ("o_orderdate", "o_orderpriority", "d_date_prio"),
        ("o_orderdate", "o_orderstatus", "d_date_stat"),
        ("o_orderpriority", "o_orderstatus", "d_prio_stat"),
    ]
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.count_distinct(F.struct(a, b)).alias(alias)
        for a, b, alias in pairs
    ]
    m = o.agg(*aggs)
    rows = None
    for a, b, alias in pairs:
        row = m.select(
            F.lit(f"{a},{b}").alias("col_pair"),
            "n",
            F.col(alias).alias("n_distinct"),
        )
        rows = row if rows is None else rows.unionAll(row)
    return rows.select(
        "col_pair",
        "n",
        "n_distinct",
        F.round(
            F.col("n_distinct").cast("double") / F.col("n"), 6
        ).alias("uniqueness"),
        (F.col("n_distinct") == F.col("n")).alias("is_key"),
    ).orderBy(F.col("uniqueness").desc(), "col_pair")


@register(
    "catalog_decimal_precision_audit",
    group="B",
    oracle="""
    with vals as (
      select 'l_quantity' as col, l_quantity as x from lineitem
      union all
      select 'l_discount', l_discount from lineitem
      union all
      select 'l_tax', l_tax from lineitem
      union all
      select 'l_extendedprice', l_extendedprice from lineitem
    ),
    scaled as (
      select col,
             case
               when floor(x * 1 + 0.5) / 1 = x then 0
               when floor(x * 10 + 0.5) / 10 = x then 1
               when floor(x * 100 + 0.5) / 100 = x then 2
               when floor(x * 1000 + 0.5) / 1000 = x then 3
               when floor(x * 10000 + 0.5) / 10000 = x then 4
               else 5
             end as scale_needed
      from vals
    )
    select col,
           count(*) as n_values,
           cast(max(scale_needed) as bigint) as max_scale,
           round(cast(count(*) filter (where scale_needed = 0)
                 as double) / count(*), 6) as integer_fraction
    from scaled group by 1 order by col
    """,
)
def catalog_decimal_precision_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: decimal-scale audit — the smallest fixed-point scale
    that represents every value of each numeric column exactly (the
    schema-tightening recommendation a crawler emits: l_quantity
    needs scale 0 → store as int; prices need 2 → decimal(·,2);
    storing them as doubles wastes bits AND invites the float-sum
    traps SURVEY §2.L catalogs). The scale test floor(x·10^k+0.5)/10^k
    = x is pure IEEE arithmetic on identical doubles — deterministic
    in both engines (both read the same parquet bit patterns). One
    unpivoted pass; counts and max are exact."""
    li = load(spark, sf_dir, "lineitem")
    vals = None
    for col in ["l_quantity", "l_discount", "l_tax", "l_extendedprice"]:
        part = li.select(
            F.lit(col).alias("col"), F.col(col).alias("x")
        )
        vals = part if vals is None else vals.unionAll(part)
    x = F.col("x")
    scale = (
        F.when(F.floor(x * 1 + 0.5) / 1 == x, 0)
        .when(F.floor(x * 10 + 0.5) / 10 == x, 1)
        .when(F.floor(x * 100 + 0.5) / 100 == x, 2)
        .when(F.floor(x * 1000 + 0.5) / 1000 == x, 3)
        .when(F.floor(x * 10000 + 0.5) / 10000 == x, 4)
        .otherwise(5)
    )
    scaled = vals.select("col", scale.alias("scale_needed"))
    return (
        scaled.groupBy("col")
        .agg(
            F.count(F.lit(1)).alias("n_values"),
            F.max("scale_needed").cast("bigint").alias("max_scale"),
            F.round(
                F.count(F.when(F.col("scale_needed") == 0, 1)).cast(
                    "double"
                )
                / F.count(F.lit(1)),
                6,
            ).alias("integer_fraction"),
        )
        .orderBy("col")
    )


@register(
    "catalog_string_pattern_profile",
    group="B",
    oracle="""
    with vals as (
      select 'c_name' as col, c_name as s from customer
      union all
      select 'c_mktsegment', c_mktsegment from customer
      union all
      select 'o_orderpriority', o_orderpriority from orders
    ),
    masked as (
      select col,
             regexp_replace(regexp_replace(regexp_replace(
               s, '[A-Za-z]', 'A', 'g'), '[0-9]', '9', 'g'),
               'A+', 'A', 'g') as mask
      from vals
    ),
    counts as (
      select col, mask, cast(count(*) as bigint) as n
      from masked group by 1, 2
    ),
    ranked as (
      select col, mask, n,
             row_number() over (partition by col
               order by n desc, mask) as rk,
             sum(n) over (partition by col) as tot
      from counts
    )
    select col, mask, n,
           round(cast(n as double) / tot, 6) as share
    from ranked where rk <= 3
    order by col, n desc, mask
    """,
)
def catalog_string_pattern_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: string pattern-mask profiling — collapse every value to a
    shape mask (letter runs → 'A', digits → '9', punctuation kept)
    and report the top-3 masks per column with coverage: the
    classical profiler move (Potter's Wheel / Trifacta lineage) that
    reveals format contracts ('Customer#000000001' → 'A#999999999')
    and flags mixed-format columns — the precursor to
    catalog_semantic_type's dictionary matching. Mask computation is
    three chained regexp_replace calls (JVM-side, codegen'd); the
    rollup shuffles (col, mask) pairs — at 100 TB masks concentrate
    into few groups so partial aggregation absorbs almost all rows
    map-side."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    vals = (
        c.select(F.lit("c_name").alias("col"), F.col("c_name").alias("s"))
        .unionAll(
            c.select(
                F.lit("c_mktsegment").alias("col"),
                F.col("c_mktsegment").alias("s"),
            )
        )
        .unionAll(
            o.select(
                F.lit("o_orderpriority").alias("col"),
                F.col("o_orderpriority").alias("s"),
            )
        )
    )
    mask = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("s"), "[A-Za-z]", "A"), "[0-9]", "9"
        ),
        "A+",
        "A",
    )
    counts = vals.select("col", mask.alias("mask")).groupBy(
        "col", "mask"
    ).agg(F.count(F.lit(1)).alias("n"))
    wp = W.partitionBy("col")
    ranked = counts.select(
        "col",
        "mask",
        "n",
        F.row_number()
        .over(wp.orderBy(F.col("n").desc(), "mask"))
        .alias("rk"),
        F.sum("n").over(wp).alias("tot"),
    )
    return (
        ranked.filter(F.col("rk") <= 3)
        .select(
            "col",
            "mask",
            "n",
            F.round(F.col("n").cast("double") / F.col("tot"), 6).alias(
                "share"
            ),
        )
        .orderBy("col", F.col("n").desc(), "mask")
    )


@register(
    "catalog_temporal_coverage_gaps",
    group="B",
    oracle="""
    with days as (
      select distinct cast(date_trunc('day', o_orderdate) as date) as d
      from orders
    ),
    ranked as (
      select d, row_number() over (order by d) as rn from days
    ),
    islands as (
      select min(d) as island_start, max(d) as island_end, count(*) as n_days
      from (select d, rn, d - cast(rn as integer) as grp from ranked) t
      group by grp
    ),
    gaps as (
      select island_end + 1 as gap_start,
             lead(island_start) over (order by island_start) - 1 as gap_end
      from islands
    )
    select gap_start, gap_end,
           date_diff('day', gap_start, gap_end) + 1 as gap_days
    from gaps
    where gap_end is not null and gap_end >= gap_start
    order by gap_days desc, gap_start limit 10
    """,
)
def catalog_temporal_coverage_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: temporal coverage audit — the longest missing-day runs
    in the orders date column, via the gaps-and-islands idiom
    (consecutive days share d − row_number; islands collapse to
    ranges; the space BETWEEN islands is the gap list). A freshness
    check (catalog_freshness) says the table is current; this says
    whether its HISTORY is contiguous — silent backfill holes are
    the classic partition-loss symptom a crawler must flag. Distinct
    days first (calendar-sized), so the window runs on ≤ a few
    thousand rows regardless of fact volume; all pure integer date
    arithmetic."""
    o = load(spark, sf_dir, "orders")
    days = o.select(
        F.date_trunc("day", "o_orderdate").cast("date").alias("d")
    ).distinct()
    ranked = days.select(
        "d", F.row_number().over(W.orderBy("d")).alias("rn")
    )
    islands = (
        ranked.select(
            "d", F.date_sub(F.col("d"), F.col("rn")).alias("grp")
        )
        .groupBy("grp")
        .agg(
            F.min("d").alias("island_start"),
            F.max("d").alias("island_end"),
            F.count(F.lit(1)).alias("n_days"),
        )
    )
    gaps = islands.select(
        F.date_add(F.col("island_end"), 1).alias("gap_start"),
        F.date_sub(
            F.lead("island_start").over(W.orderBy("island_start")), 1
        ).alias("gap_end"),
    )
    return (
        gaps.filter(
            F.col("gap_end").isNotNull()
            & (F.col("gap_end") >= F.col("gap_start"))
        )
        .select(
            "gap_start",
            "gap_end",
            (
                F.datediff(F.col("gap_end"), F.col("gap_start")) + 1
            ).alias("gap_days"),
        )
        .orderBy(F.col("gap_days").desc(), "gap_start")
        .limit(10)
    )


@register(
    "catalog_encoding_advisor",
    group="B",
    oracle="""
    with stats as (
      select 'o_orderpriority' as col,
             cast(count(*) as bigint) as n,
             cast(count(distinct o_orderpriority) as bigint) as d,
             round(cast(sum(length(o_orderpriority)) as double)
                   / count(*), 4) as avg_len
      from orders
      union all
      select 'o_orderstatus', count(*), count(distinct o_orderstatus),
             round(cast(sum(length(o_orderstatus)) as double)
                   / count(*), 4)
      from orders
      union all
      select 'c_name', count(*), count(distinct c_name),
             round(cast(sum(length(c_name)) as double) / count(*), 4)
      from customer
      union all
      select 'c_mktsegment', count(*), count(distinct c_mktsegment),
             round(cast(sum(length(c_mktsegment)) as double)
                   / count(*), 4)
      from customer
    )
    select col, n, d as n_distinct,
           round(cast(d as double) / n, 6) as distinct_ratio,
           avg_len,
           case
             when d * 100 <= n then 'dictionary'
             when cast(d as double) / n > 0.9 then 'plain'
             else 'dictionary_check_block_size'
           end as suggested_encoding
    from stats order by col
    """,
)
def catalog_encoding_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: columnar-encoding advisor — per string column: distinct
    ratio + average width → a parquet encoding recommendation
    (distinct ≤ 1% of rows → dictionary pays for itself; ratio near
    1 → plain, a dictionary would just add an indirection; the
    middle → dictionary per row-group, check block sizes). This is
    the storage-layout half of what catalog_decimal_precision_audit
    does for numerics — together they are the crawler's 'tighten
    your schema' report, worth real money at 100 TB (dictionary-
    encoding a 5-value priority column is ~10× on that column's
    bytes). The 1% gate is the cross-multiplied integer test
    d·100 ≤ n — no float threshold. One aggregate per column,
    unioned driver-sized."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")

    def stat(df: DataFrame, col: str) -> DataFrame:
        return df.agg(
            F.lit(col).alias("col"),
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(F.col(col)).alias("d"),
            F.round(
                F.sum(F.length(F.col(col))).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("avg_len"),
        )

    stats = (
        stat(o, "o_orderpriority")
        .unionAll(stat(o, "o_orderstatus"))
        .unionAll(stat(c, "c_name"))
        .unionAll(stat(c, "c_mktsegment"))
    )
    return stats.select(
        "col",
        "n",
        F.col("d").alias("n_distinct"),
        F.round(F.col("d").cast("double") / F.col("n"), 6).alias(
            "distinct_ratio"
        ),
        "avg_len",
        F.when(F.col("d") * 100 <= F.col("n"), "dictionary")
        .when(
            F.col("d").cast("double") / F.col("n") > 0.9, "plain"
        )
        .otherwise("dictionary_check_block_size")
        .alias("suggested_encoding"),
    ).orderBy("col")


@register(
    "catalog_key_domain_consistency",
    group="B",
    oracle="""
    with sides as (
      select 'custkey: customer vs orders' as key_pair,
             (select count(distinct c_custkey) from customer) as d_dim,
             (select count(distinct o_custkey) from orders) as d_fact,
             (select count(*) from orders o
              where not exists (select 1 from customer c
                                where c.c_custkey = o.o_custkey))
               as n_orphan_fact,
             (select count(*) from customer c
              where not exists (select 1 from orders o
                                where o.o_custkey = c.c_custkey))
               as n_unused_dim
      union all
      select 'partkey: part vs lineitem',
             (select count(distinct p_partkey) from part),
             (select count(distinct l_partkey) from lineitem),
             (select count(*) from lineitem l
              where not exists (select 1 from part p
                                where p.p_partkey = l.l_partkey)),
             (select count(*) from part p
              where not exists (select 1 from lineitem l
                                where l.l_partkey = p.p_partkey))
      union all
      select 'suppkey: supplier vs lineitem',
             (select count(distinct s_suppkey) from supplier),
             (select count(distinct l_suppkey) from lineitem),
             (select count(*) from lineitem l
              where not exists (select 1 from supplier s
                                where s.s_suppkey = l.l_suppkey)),
             (select count(*) from supplier s
              where not exists (select 1 from lineitem l
                                where l.l_suppkey = s.s_suppkey))
    )
    select key_pair, d_dim as n_distinct_dim, d_fact as n_distinct_fact,
           n_orphan_fact, n_unused_dim,
           round(cast(d_fact as double) / d_dim, 6) as domain_coverage
    from sides order by key_pair
    """,
)
def catalog_key_domain_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: cross-table key-domain consistency — for each dim↔fact
    key pair: distinct counts on both sides, orphaned fact rows
    (FK violations — must be 0), unused dim rows (normal: not every
    part sells) and the domain-coverage ratio. This is
    catalog_fk_discovery's CONFIRMATION pass — discovery proposes
    candidate joins, this audits the ones the schema claims, and at
    100 TB it is the per-ingest regression check that catches a
    partial dim load before every downstream join silently drops
    rows. Each side is an anti-join count (broadcast semi-join
    shape) + distinct counts that ride the same scans."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    p = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")

    def pair(name, dim, dk, fact, fk):
        d_dim = dim.agg(F.count_distinct(F.col(dk)).alias("d_dim"))
        d_fact = fact.agg(F.count_distinct(F.col(fk)).alias("d_fact"))
        orphan = fact.join(
            dim.select(F.col(dk)), fact[fk] == dim[dk], "left_anti"
        ).agg(F.count(F.lit(1)).alias("n_orphan_fact"))
        unused = dim.join(
            fact.select(F.col(fk)), dim[dk] == fact[fk], "left_anti"
        ).agg(F.count(F.lit(1)).alias("n_unused_dim"))
        return (
            d_dim.crossJoin(F.broadcast(d_fact))
            .crossJoin(F.broadcast(orphan))
            .crossJoin(F.broadcast(unused))
            .select(
                F.lit(name).alias("key_pair"),
                F.col("d_dim").alias("n_distinct_dim"),
                F.col("d_fact").alias("n_distinct_fact"),
                "n_orphan_fact",
                "n_unused_dim",
                F.round(
                    F.col("d_fact").cast("double") / F.col("d_dim"), 6
                ).alias("domain_coverage"),
            )
        )

    return (
        pair("custkey: customer vs orders", c, "c_custkey", o, "o_custkey")
        .unionAll(
            pair("partkey: part vs lineitem", p, "p_partkey", li,
                 "l_partkey")
        )
        .unionAll(
            pair("suppkey: supplier vs lineitem", s, "s_suppkey", li,
                 "l_suppkey")
        )
        .orderBy("key_pair")
    )


@register(
    "catalog_rare_category_report",
    group="B",
    oracle="""
    with vc as (
      select p_brand as val, cast(count(*) as bigint) as c
      from part group by 1
    ),
    tot as (select cast(sum(c) as bigint) as n,
                   cast(count(*) as bigint) as k from vc)
    select
      (select k from tot) as n_levels,
      cast(count(*) filter (where c * 200 < (select n from tot))
           as bigint) as n_rare_levels,
      cast(coalesce(sum(c) filter (where c * 200 < (select n from tot)),
           0) as bigint) as n_rare_rows,
      round(cast(coalesce(sum(c) filter (where c * 200
            < (select n from tot)), 0) as double)
            / (select n from tot), 6) as rare_row_share,
      cast((select k from tot) - count(*) filter (where c * 200
           < (select n from tot)) + 1 as bigint)
        as levels_after_other_bucket
    from vc
    """,
)
def catalog_rare_category_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: rare-level report for a categorical column — levels
    below 0.5% support, the rows they cover, and the cardinality
    after collapsing them into one 'other' bucket: the feature-prep
    decision (feature_label_encode on a long-tailed column wastes
    embedding capacity on noise levels; catalog_topk_values shows
    the head, this quantifies the TAIL and the payoff of bucketing
    it). The 0.5% gate is the integer cross-multiplication c·200 < n
    — no float threshold. One value rollup + one scalar pass over
    the level table."""
    p = load(spark, sf_dir, "part")
    vc = p.groupBy(F.col("p_brand").alias("val")).agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = vc.agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("k")
    )
    j = vc.crossJoin(F.broadcast(tot))
    rare = F.col("c") * 200 < F.col("n")
    return j.agg(
        F.max("k").alias("n_levels"),
        F.count(F.when(rare, 1)).alias("n_rare_levels"),
        F.coalesce(
            F.sum(F.when(rare, F.col("c"))), F.lit(0)
        ).alias("n_rare_rows"),
        F.round(
            F.coalesce(
                F.sum(F.when(rare, F.col("c"))), F.lit(0)
            ).cast("double")
            / F.max("n"),
            6,
        ).alias("rare_row_share"),
        (
            F.max("k") - F.count(F.when(rare, 1)) + 1
        ).alias("levels_after_other_bucket"),
    )


@register(
    "catalog_timestamp_precision_audit",
    group="B",
    oracle="""
    with t as (
      select epoch_us(ts) as us from events
    ),
    cls as (
      select case
               when us % 1000000 = 0 then 'second'
               when us % 1000 = 0 then 'millisecond'
               else 'microsecond'
             end as precision_used
      from t
    )
    select precision_used, count(*) as n_values,
           round(cast(count(*) as double)
                 / (select count(*) from t), 6) as share
    from cls group by 1 order by precision_used
    """,
)
def catalog_timestamp_precision_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: timestamp precision audit — what granularity the ts
    column ACTUALLY uses (all-zero sub-second fields mean the
    producer logs at second grain and the schema's microsecond
    width is free to truncate — the temporal sibling of
    catalog_decimal_precision_audit, and the audit that caught the
    events_interevent_hist engine divergence: sub-second values DO
    exist here, so second-truncating arithmetic is lossy). Pure
    integer modulus tests on exact epoch microseconds; one pass,
    three-row output."""
    e = load(spark, sf_dir, "events")
    t = e.select(F.unix_micros("ts").alias("us"))
    n = t.agg(F.count(F.lit(1)).alias("n_all"))
    cls = t.select(
        F.when(F.col("us") % 1000000 == 0, "second")
        .when(F.col("us") % 1000 == 0, "millisecond")
        .otherwise("microsecond")
        .alias("precision_used")
    )
    return (
        cls.groupBy("precision_used")
        .agg(F.count(F.lit(1)).alias("n_values"))
        .crossJoin(F.broadcast(n))
        .select(
            "precision_used",
            "n_values",
            F.round(
                F.col("n_values").cast("double") / F.col("n_all"), 6
            ).alias("share"),
        )
        .orderBy("precision_used")
    )


@register(
    "catalog_histogram_equiheight",
    group="B",
    oracle="""
    with edges as (
      select quantile_disc(o_totalprice,
               [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) as qs
      from orders
    ),
    binned as (
      select case
               when o_totalprice <= qs[1] then 0
               when o_totalprice <= qs[2] then 1
               when o_totalprice <= qs[3] then 2
               when o_totalprice <= qs[4] then 3
               when o_totalprice <= qs[5] then 4
               when o_totalprice <= qs[6] then 5
               when o_totalprice <= qs[7] then 6
               else 7
             end as bin,
             o_totalprice
      from orders, edges
    )
    select bin,
           cast(count(*) as bigint) as n_rows,
           round(min(o_totalprice), 2) as bin_min,
           round(max(o_totalprice), 2) as bin_max
    from binned group by 1 order by bin
    """,
)
def catalog_histogram_equiheight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: equi-HEIGHT histogram — 8 buckets holding ~equal row
    counts with data-dependent boundaries (catalog_histogram_numeric
    is the equi-WIDTH form: fixed boundaries, wildly unequal counts
    on skewed data). Equi-height is what optimizer statistics
    actually store (selectivity ≈ fraction of buckets spanned, error
    bounded by bucket height regardless of skew). Boundaries are
    DISCRETE octile values (bit-exact across engines); binning is
    ≤-comparison against broadcast exact values; per-bin min/max
    read from data. Two passes (quantile, then bin+rollup) — the
    KLL sketch collapses it to one at scale.

    Octile edges come from the sort-rank engine (value at sorted
    position ceil(p·n)), not ``percentile_disc`` aggregates: seven
    within-group aggregates each build and single-threadedly merge a
    boxed value→count map (2.9 s at sf0.1 for 150k near-distinct
    doubles); one sort + seven rank probes reads the same seven
    values in ~0.3 s."""
    o = load(spark, sf_dir, "orders")
    n_rows = row_count(spark, sf_dir, "orders")
    octiles = [i / 8.0 for i in range(1, 8)]
    from datalakecrawler_spark.distrank import with_global_row_number

    ranked = with_global_row_number(
        o.select("o_totalprice"), spark, ["o_totalprice"], out="rn"
    )
    import math

    targets = {f"q{i + 1}": math.ceil(p * n_rows) for i, p in enumerate(octiles)}
    edges = (
        ranked.where(F.col("rn").isin(list(targets.values())))
        .agg(
            *[
                F.min(
                    F.when(F.col("rn") == rn, F.col("o_totalprice"))
                ).alias(name)
                for name, rn in targets.items()
            ]
        )
    )
    x = F.col("o_totalprice")
    binned = o.crossJoin(F.broadcast(edges)).select(
        x.alias("o_totalprice"),
        F.when(x <= F.col("q1"), 0)
        .when(x <= F.col("q2"), 1)
        .when(x <= F.col("q3"), 2)
        .when(x <= F.col("q4"), 3)
        .when(x <= F.col("q5"), 4)
        .when(x <= F.col("q6"), 5)
        .when(x <= F.col("q7"), 6)
        .otherwise(7)
        .alias("bin"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.min("o_totalprice"), 2).alias("bin_min"),
            F.round(F.max("o_totalprice"), 2).alias("bin_max"),
        )
        .orderBy("bin")
    )


_SCHEMA_COLS = [
    ("customer", "c_custkey"), ("customer", "c_nationkey"),
    ("orders", "o_custkey"), ("orders", "o_orderkey"),
    ("lineitem", "l_orderkey"), ("lineitem", "l_partkey"),
    ("lineitem", "l_suppkey"), ("part", "p_partkey"),
    ("supplier", "s_suppkey"), ("supplier", "s_nationkey"),
    ("nation", "n_nationkey"), ("nation", "n_regionkey"),
    ("region", "r_regionkey"),
]


@register(
    "catalog_schema_matching",
    group="B",
    oracle="""
    with cols(tbl, col) as (values
      ('customer', 'c_custkey'), ('customer', 'c_nationkey'),
      ('orders', 'o_custkey'), ('orders', 'o_orderkey'),
      ('lineitem', 'l_orderkey'), ('lineitem', 'l_partkey'),
      ('lineitem', 'l_suppkey'), ('part', 'p_partkey'),
      ('supplier', 's_suppkey'), ('supplier', 's_nationkey'),
      ('nation', 'n_nationkey'), ('nation', 'n_regionkey'),
      ('region', 'r_regionkey')
    ),
    stem as (
      select tbl, col, substr(col, 3) as root from cols
    ),
    pairs as (
      select a.tbl as tbl_a, a.col as col_a,
             b.tbl as tbl_b, b.col as col_b,
             levenshtein(a.root, b.root) as dist
      from stem a join stem b
        on a.tbl < b.tbl
      where levenshtein(a.root, b.root) <= 1
    )
    select tbl_a, col_a, tbl_b, col_b,
           cast(dist as bigint) as name_distance
    from pairs
    order by tbl_a, col_a, tbl_b, col_b
    """,
)
def catalog_schema_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: schema matching by column-name similarity — cross-table
    key-column pairs whose prefix-stripped stems are within edit
    distance 1 (custkey↔custkey, nationkey↔nationkey …): the
    NAME-based half of join-path discovery, which
    catalog_fk_discovery then confirms with VALUE-based inclusion
    (classic schema-matching literature: name matchers propose,
    instance matchers verify). The column inventory is a literal
    VALUES relation (the crawler would read it from its own catalog
    table); levenshtein is the shared H-surface primitive. Output is
    catalog-sized — the entire computation broadcasts."""
    # literal VALUES relation, not createDataFrame: local-data frames
    # are Python-RDD-backed, so a self-join over one re-deserializes
    # the rows through Python workers in every task (measured 41.8 s
    # for 13 rows at sf0.01); a SQL VALUES relation is a pure-JVM
    # LocalRelation Catalyst folds for free.
    values = ", ".join(f"('{t}', '{c}')" for t, c in _SCHEMA_COLS)
    stem = spark.sql(
        f"select tbl, col from values {values} as t(tbl, col)"
    ).select("tbl", "col", F.expr("substr(col, 3)").alias("root"))
    a = stem.alias("a")
    b = stem.alias("b")
    return (
        a.join(b, F.col("a.tbl") < F.col("b.tbl"))
        .where(
            F.levenshtein(F.col("a.root"), F.col("b.root")) <= 1
        )
        .select(
            F.col("a.tbl").alias("tbl_a"),
            F.col("a.col").alias("col_a"),
            F.col("b.tbl").alias("tbl_b"),
            F.col("b.col").alias("col_b"),
            F.levenshtein(F.col("a.root"), F.col("b.root"))
            .cast("bigint")
            .alias("name_distance"),
        )
        .orderBy("tbl_a", "col_a", "tbl_b", "col_b")
    )


@register(
    "catalog_sample_accuracy_probe",
    group="B",
    oracle="""
    with s as (
      select o_totalprice,
             (o_orderkey * 2654435761) % 10 = 0 as in_sample
      from orders
    ),
    m as (
      select cast(count(*) as bigint) as n_all,
             cast(sum(cast(floor(o_totalprice * 1e6 + 0.5) as bigint))
                  as bigint) as s_all,
             cast(count(*) filter (where in_sample) as bigint) as n_s,
             cast(sum(cast(floor(o_totalprice * 1e6 + 0.5) as bigint))
                  filter (where in_sample) as bigint) as s_s
      from s
    )
    select n_all, n_s,
           round(cast(s_all as double) / 1e6 / n_all, 4) as exact_mean,
           round(cast(s_s as double) / 1e6 / n_s, 4) as sample_mean,
           round(abs(cast(s_s as double) / 1e6 / n_s
                     - cast(s_all as double) / 1e6 / n_all)
                 / (cast(s_all as double) / 1e6 / n_all), 6)
             as relative_error
    from m
    """,
)
def catalog_sample_accuracy_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: sampling accuracy probe — the exact mean vs the mean
    from a deterministic 10% hash sample (Knuth-hash bucket 0 of
    10), with the realized relative error: the calibration evidence
    behind every 'profile on a sample' shortcut
    (catalog_sample_rows ships the sample; this quantifies what
    estimates from it are worth, and re-running it per table is how
    a crawler auto-decides sample-vs-full profiling). Hash
    membership is exact integer arithmetic — the same sample
    everywhere; both means are micro-exact ratios evaluated in
    fixed order."""
    o = load(spark, sf_dir, "orders")
    s = o.select(
        "o_totalprice",
        ((F.col("o_orderkey") * 2654435761) % 10 == 0).alias(
            "in_sample"
        ),
    )
    m = s.agg(
        F.count(F.lit(1)).alias("n_all"),
        F.sum(F.floor(F.col("o_totalprice") * 1e6 + 0.5)).alias("s_all"),
        F.count(F.when(F.col("in_sample"), 1)).alias("n_s"),
        F.sum(
            F.when(
                F.col("in_sample"),
                F.floor(F.col("o_totalprice") * 1e6 + 0.5),
            )
        ).alias("s_s"),
    )
    exact = F.col("s_all").cast("double") / 1e6 / F.col("n_all")
    samp = F.col("s_s").cast("double") / 1e6 / F.col("n_s")
    return m.select(
        "n_all",
        "n_s",
        F.round(exact, 4).alias("exact_mean"),
        F.round(samp, 4).alias("sample_mean"),
        F.round(F.abs(samp - exact) / exact, 6).alias("relative_error"),
    )


@register(
    "catalog_table_manifest",
    group="B",
    oracle="""
    select tbl, n_rows from (
      select 'region' as tbl, cast(count(*) as bigint) as n_rows
      from region
      union all select 'nation', count(*) from nation
      union all select 'customer', count(*) from customer
      union all select 'supplier', count(*) from supplier
      union all select 'part', count(*) from part
      union all select 'orders', count(*) from orders
      union all select 'lineitem', count(*) from lineitem
      union all select 'events', count(*) from events
      union all select 'documents', count(*) from documents
      union all select 'embeddings', count(*) from embeddings
    ) t order by tbl
    """,
)
def catalog_table_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: the table manifest — exact row counts for every fixture
    table in one result: the crawler's top-level inventory row
    (catalog_crawl_run profiles WITHIN tables; this is the
    cross-table census whose deltas between runs are the cheapest
    possible change-detection signal, and the first thing a
    downstream consumer sanity-checks against). Ten single-pass
    counts unioned driver-sized; at 100 TB each count comes free
    from parquet footer metadata (catalog_footer_stats) rather than
    a scan — same output, no read."""
    from datalakecrawler_spark.io import TABLES

    out = None
    for t in sorted(TABLES):
        row = load(spark, sf_dir, t).agg(
            F.lit(t).alias("tbl"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("tbl")


@register(
    "catalog_sequence_gap_audit",
    group="B",
    oracle="""
    with ks as (
      select 'orders.o_orderkey' as col, o_orderkey as k from orders
      union all
      select 'part.p_partkey', p_partkey from part
      union all
      select 'customer.c_custkey', c_custkey from customer
    ),
    d as (select distinct col, k from ks),
    gaps as (
      select col, k - lag(k) over (partition by col order by k) - 1 as gap
      from d
    ),
    span as (
      select col, cast(min(k) as bigint) as k_min,
             cast(max(k) as bigint) as k_max,
             cast(count(*) as bigint) as n_distinct
      from d group by 1
    ),
    g as (
      select col, cast(coalesce(max(gap), 0) as bigint) as max_gap,
             cast(sum(case when gap > 0 then 1 else 0 end) as bigint)
               as n_gap_runs
      from gaps group by 1
    )
    select s.col, k_min, k_max, n_distinct,
           k_max - k_min + 1 - n_distinct as n_missing,
           max_gap, n_gap_runs
    from span s join g on s.col = g.col
    order by s.col
    """,
)
def catalog_sequence_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: surrogate-key continuity audit — for each key column,
    the span (min..max), distinct count, number of MISSING ids in the
    span, the largest single gap, and how many gap runs exist. Gaps in
    an 'auto-increment' key are the classic sign of silently dropped
    ingestion batches or deleted-but-unreconciled rows; the crawler
    reports this per snapshot so drift shows up as a diff. One
    distinct-projection per key (map-side combinable) and a lag
    window partitioned BY COLUMN — each key's ordered pass is
    independent, so at 100 TB the three audits parallelize and no
    single global sort appears. Exact integers throughout."""
    frames = []
    for tbl, col in [
        ("orders", "o_orderkey"),
        ("part", "p_partkey"),
        ("customer", "c_custkey"),
    ]:
        frames.append(
            load(spark, sf_dir, tbl).select(
                F.lit(f"{tbl}.{col}").alias("col"), F.col(col).alias("k")
            )
        )
    ks = frames[0].unionAll(frames[1]).unionAll(frames[2]).distinct()
    w = W.partitionBy("col").orderBy("k")
    gaps = ks.select(
        "col", (F.col("k") - F.lag("k").over(w) - 1).alias("gap")
    )
    span = ks.groupBy("col").agg(
        F.min("k").alias("k_min"),
        F.max("k").alias("k_max"),
        F.count(F.lit(1)).alias("n_distinct"),
    )
    g = gaps.groupBy("col").agg(
        F.coalesce(F.max("gap"), F.lit(0)).cast("long").alias("max_gap"),
        F.sum(F.when(F.col("gap") > 0, 1).otherwise(0)).alias("n_gap_runs"),
    )
    return (
        span.join(g, "col")
        .select(
            "col",
            "k_min",
            "k_max",
            "n_distinct",
            (F.col("k_max") - F.col("k_min") + 1 - F.col("n_distinct")).alias(
                "n_missing"
            ),
            "max_gap",
            "n_gap_runs",
        )
        .orderBy("col")
    )


@register(
    "catalog_bloom_fpp_advisor",
    group="B",
    oracle="""
    with ndv as (
      select 'orders.o_custkey' as col,
             cast(count(distinct o_custkey) as bigint) as n from orders
      union all
      select 'lineitem.l_partkey',
             cast(count(distinct l_partkey) as bigint) from lineitem
      union all
      select 'events.user_id',
             cast(count(distinct user_id) as bigint) from events
    ),
    cfg as (select * from (values (8), (16), (24)) c(bits_per_key)),
    plan as (
      select col, n, bits_per_key,
             cast(floor(bits_per_key * 0.6931471805599453 + 0.5) as bigint)
               as k_hashes
      from ndv cross join cfg
    )
    select col, n as ndv, bits_per_key, k_hashes,
           round(pow(1 - exp(-(cast(k_hashes as double) / bits_per_key)),
                     cast(k_hashes as double)), 6) as expected_fpp,
           round(cast(n as double) * bits_per_key / 8 / 1048576, 6)
             as filter_mib
    from plan
    order by col, bits_per_key
    """,
)
def catalog_bloom_fpp_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: Bloom-filter sizing advisor for join-key columns — for
    each key's exact NDV and a bits-per-key budget (8/16/24), the
    optimal hash count k = round(bits*ln2) and the expected false-
    positive rate (1-e^{-k/bits})^k, plus the filter's memory
    footprint. This is the planning table behind join_bloom_prefilter
    and Spark's own `spark.sql.optimizer.runtime.bloomFilter.*`
    knobs: at 100 TB you size the runtime filter from the crawler's
    NDV profile BEFORE the join runs, not by trial. NDVs are one
    exact count-distinct per key (the only data-sized pass); the
    advisory math is a 9-row closed-form grid, identical IEEE in both
    engines (ln2 is a literal; exp/pow round-6-gated)."""
    ndvs = []
    for tbl, col in [
        ("orders", "o_custkey"),
        ("lineitem", "l_partkey"),
        ("events", "user_id"),
    ]:
        ndvs.append(
            load(spark, sf_dir, tbl).agg(
                F.lit(f"{tbl}.{col}").alias("col"),
                F.count_distinct(F.col(col)).alias("n"),
            )
        )
    ndv = ndvs[0].unionAll(ndvs[1]).unionAll(ndvs[2])
    cfg = spark.createDataFrame(
        [(8,), (16,), (24,)], "bits_per_key int"
    )
    plan = ndv.crossJoin(F.broadcast(cfg)).withColumn(
        "k_hashes",
        F.floor(F.col("bits_per_key") * 0.6931471805599453 + 0.5),
    )
    kd = F.col("k_hashes").cast("double")
    return plan.select(
        "col",
        F.col("n").alias("ndv"),
        "bits_per_key",
        "k_hashes",
        F.round(
            F.pow(1 - F.exp(-(kd / F.col("bits_per_key"))), kd), 6
        ).alias("expected_fpp"),
        F.round(
            F.col("n").cast("double") * F.col("bits_per_key") / 8 / 1048576, 6
        ).alias("filter_mib"),
    ).orderBy("col", "bits_per_key")


@register(
    "crawl_type_inference",
    group="B",
    oracle="""
    with long as (
      select 'o_orderkey' as col, cast(o_orderkey as varchar) as val
      from orders
      union all
      select 'o_totalprice', cast(o_totalprice as varchar) from orders
      union all
      select 'o_orderdate', cast(o_orderdate as varchar) from orders
      union all
      select 'o_orderpriority', o_orderpriority from orders
    ),
    flags as (
      select col,
             cast(count(*) as bigint) as n,
             cast(sum(case when regexp_matches(val, '^-?[0-9]+$')
                           then 1 else 0 end) as bigint) as n_int,
             cast(sum(case when regexp_matches(val,
                             '^-?[0-9]+(\\.[0-9]+)?$')
                           then 1 else 0 end) as bigint) as n_num,
             cast(sum(case when regexp_matches(val,
                 '^[0-9]{4}-[0-9]{2}-[0-9]{2} [0-9]{2}:[0-9]{2}:[0-9]{2}')
                           then 1 else 0 end) as bigint) as n_ts
      from long group by 1
    )
    select col, n,
           round(cast(n_int as double) / n, 6) as pct_int,
           round(cast(n_num as double) / n, 6) as pct_numeric,
           round(cast(n_ts as double) / n, 6) as pct_timestamp,
           case when n_int = n then 'bigint'
                when n_num = n then 'double'
                when n_ts = n then 'timestamp'
                else 'varchar' end as inferred_type
    from flags order by col
    """,
)
def crawl_type_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: CSV-style type inference from STRING data — the
    crawler's classifier pass when a format carries no schema
    (`inferSchema` reimplemented as an auditable operator): every
    value of every column is pattern-tested against the candidate
    ladder integer → numeric → timestamp, and a column gets the
    narrowest type that matches 100% of its values. Done with
    anchored POSIX regexes (engine-portable — cast-failure semantics
    differ between engines, pattern matches don't). One unpivoted
    pass, map-combinable counters; per-column verdicts are exact
    integer comparisons. Orders is stringified in-plan to stand in
    for a headerless CSV."""
    o = load(spark, sf_dir, "orders")
    pairs = [
        ("o_orderkey", F.col("o_orderkey").cast("string")),
        ("o_totalprice", F.col("o_totalprice").cast("string")),
        ("o_orderdate", F.col("o_orderdate").cast("string")),
        ("o_orderpriority", F.col("o_orderpriority")),
    ]
    long = o.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(n).alias("col"), c.alias("val")
                    )
                    for n, c in pairs
                ]
            )
        ).alias("kv")
    ).select("kv.col", "kv.val")
    is_int = F.col("val").rlike("^-?[0-9]+$")
    is_num = F.col("val").rlike("^-?[0-9]+(\\.[0-9]+)?$")
    is_ts = F.col("val").rlike(
        "^[0-9]{4}-[0-9]{2}-[0-9]{2} [0-9]{2}:[0-9]{2}:[0-9]{2}"
    )
    flags = long.groupBy("col").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(is_int, 1).otherwise(0)).alias("n_int"),
        F.sum(F.when(is_num, 1).otherwise(0)).alias("n_num"),
        F.sum(F.when(is_ts, 1).otherwise(0)).alias("n_ts"),
    )
    return flags.select(
        "col",
        "n",
        F.round(F.col("n_int").cast("double") / F.col("n"), 6).alias("pct_int"),
        F.round(F.col("n_num").cast("double") / F.col("n"), 6).alias(
            "pct_numeric"
        ),
        F.round(F.col("n_ts").cast("double") / F.col("n"), 6).alias(
            "pct_timestamp"
        ),
        F.when(F.col("n_int") == F.col("n"), "bigint")
        .when(F.col("n_num") == F.col("n"), "double")
        .when(F.col("n_ts") == F.col("n"), "timestamp")
        .otherwise("varchar")
        .alias("inferred_type"),
    ).orderBy("col")


@register(
    "catalog_ndv_sample_estimate",
    group="B",
    oracle="""
    with sampled as (
      select o_custkey
      from orders
      where cast(('0x' || substring(md5(cast(o_orderkey as varchar) || '|ndv'), 1, 8))
              as bigint) < 0.25 * 4294967296
    ),
    freq as (
      select o_custkey, count(*) as cnt from sampled group by o_custkey
    ),
    est as (
      select count(*) filter (where cnt = 1) as f1,
             count(*) filter (where cnt > 1) as f_multi,
             count(*) as d_sample,
             sum(cnt) as n_sampled
      from freq
    )
    select cast(n_sampled as bigint) as n_sampled, d_sample,
           cast(2.0 * f1 + f_multi as double) as ndv_estimate,
           (select count(distinct o_custkey) from orders) as ndv_exact,
           round(abs(2.0 * f1 + f_multi
                     - (select count(distinct o_custkey) from orders))
                 / (select count(distinct o_custkey) from orders), 6) as rel_error
    from est
    """,
)
def catalog_ndv_sample_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDV estimation from a Bernoulli row sample (Charikar et al.'s
    GEE estimator, public: D̂ = √(1/q)·f₁ + Σ_{j≥2} fⱼ with q = 25 %) —
    how a crawler profiles distinct counts WITHOUT scanning the full
    column: sample rows by a deterministic md5 coin on the row key,
    count value frequencies in the sample, and scale the singletons.
    The exact-NDV twin and relative error are emitted alongside — the
    accuracy report a catalog stores next to the estimate. At 100 TB
    the sample predicate pushes into the scan and the estimator
    touches q·N rows; the exact twin is the thing you can no longer
    afford (that's the point)."""
    o = load(spark, sf_dir, "orders")
    coin = F.conv(
        F.substring(
            F.md5(F.concat(F.col("o_orderkey").cast("string"), F.lit("|ndv"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    sampled = o.where(coin < F.lit(0.25) * 4294967296)
    freq = sampled.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cnt"))
    est = freq.agg(
        F.count_if(F.col("cnt") == 1).alias("f1"),
        F.count_if(F.col("cnt") > 1).alias("f_multi"),
        F.count(F.lit(1)).alias("d_sample"),
        F.sum("cnt").alias("n_sampled"),
    )
    exact = o.agg(F.countDistinct("o_custkey").alias("ndv_exact"))
    return (
        est.crossJoin(F.broadcast(exact))
        .select(
            "n_sampled",
            "d_sample",
            (2.0 * F.col("f1") + F.col("f_multi")).cast("double").alias("ndv_estimate"),
            "ndv_exact",
            F.round(
                F.abs(2.0 * F.col("f1") + F.col("f_multi") - F.col("ndv_exact"))
                / F.col("ndv_exact"),
                6,
            ).alias("rel_error"),
        )
    )


@register(
    "catalog_fd_mining",
    group="B",
    oracle="""
    with checks as (
      select 'part: p_brand -> p_type' as fd,
             count(*) as n_lhs_values,
             count(*) filter (where n_rhs > 1) as n_violating_lhs,
             sum(cnt) filter (where n_rhs > 1) as n_violating_rows
      from (select p_brand, count(distinct p_type) as n_rhs, count(*) as cnt
            from part group by p_brand)
      union all
      select 'part: p_type -> p_size',
             count(*),
             count(*) filter (where n_rhs > 1),
             sum(cnt) filter (where n_rhs > 1)
      from (select p_type, count(distinct p_size) as n_rhs, count(*) as cnt
            from part group by p_type)
      union all
      select 'nation: n_nationkey -> n_regionkey',
             count(*),
             count(*) filter (where n_rhs > 1),
             sum(cnt) filter (where n_rhs > 1)
      from (select n_nationkey, count(distinct n_regionkey) as n_rhs,
                   count(*) as cnt
            from nation group by n_nationkey)
      union all
      select 'orders: o_custkey -> o_orderpriority',
             count(*),
             count(*) filter (where n_rhs > 1),
             sum(cnt) filter (where n_rhs > 1)
      from (select o_custkey, count(distinct o_orderpriority) as n_rhs,
                   count(*) as cnt
            from orders group by o_custkey)
    )
    select fd, n_lhs_values,
           cast(n_violating_lhs as bigint) as n_violating_lhs,
           cast(coalesce(n_violating_rows, 0) as bigint) as n_violating_rows,
           cast(n_violating_lhs = 0 as integer) as holds
    from checks
    """,
)
def catalog_fd_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery (the Metanome/profiling-suite
    capability, public technique): test candidate FDs A → B by grouping
    on the determinant and counting distinct dependent values — an FD
    holds iff every group has exactly one. Emits per-candidate violation
    stats (how many LHS values break it, how many rows are involved) —
    what a crawler records so downstream users know which columns are
    safe join/normalization keys. Each check is one map-combinable
    grouped pass; candidates over the same table could share a scan via
    grouping sets at scale."""

    def check(df: DataFrame, fd: str, lhs: str, rhs: str) -> DataFrame:
        g = df.groupBy(lhs).agg(
            F.countDistinct(rhs).alias("n_rhs"), F.count(F.lit(1)).alias("cnt")
        )
        return g.agg(
            F.lit(fd).alias("fd"),
            F.count(F.lit(1)).alias("n_lhs_values"),
            F.count_if(F.col("n_rhs") > 1).alias("n_violating_lhs"),
            F.coalesce(
                F.sum(F.when(F.col("n_rhs") > 1, F.col("cnt"))), F.lit(0)
            ).alias("n_violating_rows"),
        )

    p = load(spark, sf_dir, "part")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders")
    out = (
        check(p, "part: p_brand -> p_type", "p_brand", "p_type")
        .unionByName(check(p, "part: p_type -> p_size", "p_type", "p_size"))
        .unionByName(
            check(n, "nation: n_nationkey -> n_regionkey", "n_nationkey", "n_regionkey")
        )
        .unionByName(
            check(o, "orders: o_custkey -> o_orderpriority", "o_custkey", "o_orderpriority")
        )
    )
    return out.select(
        "fd",
        "n_lhs_values",
        "n_violating_lhs",
        "n_violating_rows",
        (F.col("n_violating_lhs") == 0).cast("int").alias("holds"),
    )


@register(
    "catalog_incremental_profile_merge",
    group="B",
    oracle="""
    with part_a as (
      select * from orders where o_orderdate < timestamp '1996-07-01'
    ),
    part_b as (
      select * from orders where o_orderdate >= timestamp '1996-07-01'
    ),
    prof as (
      select 'a' as split,
             count(*) as n_rows,
             sum(cast(floor(o_totalprice * 1e6 + 0.5) as bigint)) as sum_micro,
             min(o_totalprice) as min_price,
             max(o_totalprice) as max_price
      from part_a
      union all
      select 'b', count(*),
             sum(cast(floor(o_totalprice * 1e6 + 0.5) as bigint)),
             min(o_totalprice), max(o_totalprice)
      from part_b
    ),
    chunks as (
      select split, chunk, bit_or(mask) as bits from (
        select 'a' as split, o_custkey // 60 as chunk,
               1::bigint << cast(o_custkey % 60 as integer) as mask from part_a
        union all
        select 'b', o_custkey // 60,
               1::bigint << cast(o_custkey % 60 as integer) from part_b
      ) group by split, chunk
    ),
    merged as (
      select sum(n_rows) as n_rows,
             cast(sum(sum_micro) as double) / 1e6 as total_price,
             min(min_price) as min_price,
             max(max_price) as max_price
      from prof
    ),
    merged_ndv as (
      select cast(sum(bit_count(bits)) as bigint) as ndv_custkey
      from (select chunk, bit_or(bits) as bits from chunks group by chunk)
    ),
    full_scan as (
      select count(*) as n_rows,
             cast(sum(cast(floor(o_totalprice * 1e6 + 0.5) as bigint)) as double)
               / 1e6 as total_price,
             min(o_totalprice) as min_price,
             max(o_totalprice) as max_price,
             count(distinct o_custkey) as ndv_custkey
      from orders
    )
    select cast(m.n_rows as bigint) as n_rows,
           round(m.total_price, 2) as total_price,
           round(m.min_price, 2) as min_price,
           round(m.max_price, 2) as max_price,
           mn.ndv_custkey,
           cast(m.n_rows = f.n_rows
                and m.total_price = f.total_price
                and m.min_price = f.min_price
                and m.max_price = f.max_price
                and mn.ndv_custkey = f.ndv_custkey as integer) as merge_exact
    from merged m, merged_ndv mn, full_scan f
    """,
)
def catalog_incremental_profile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental profiling with MERGEABLE state — the property that
    lets a crawler profile only new partitions and combine: each split
    (here, two date halves of orders) produces count / exact micro-unit
    sum / min / max / per-chunk distinct bitmaps; merging is add, min,
    max and bit_or — NO re-scan of old data. The merged profile is then
    checked cell-for-cell against a full-table scan (merge_exact = 1 is
    the contract). At 100 TB this is the difference between profiling
    a day's partition and re-profiling the lake; the bitmap NDV chunks
    are the same engine-portable roaring pattern as
    agg_bitmap_distinct."""
    o = load(spark, sf_dir, "orders")
    cut = F.lit("1996-07-01").cast("timestamp")
    splits = {"a": o.where(F.col("o_orderdate") < cut), "b": o.where(F.col("o_orderdate") >= cut)}

    profs = []
    chunkframes = []
    for name, df in splits.items():
        profs.append(
            df.agg(
                F.lit(name).alias("split"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.floor(F.col("o_totalprice") * 1e6 + 0.5)).alias("sum_micro"),
                F.min("o_totalprice").alias("min_price"),
                F.max("o_totalprice").alias("max_price"),
            )
        )
        chunkframes.append(
            df.groupBy((F.col("o_custkey") / 60).cast("long").alias("chunk")).agg(
                F.bit_or(
                    F.expr("shiftleft(1L, cast(o_custkey % 60 as int))")
                ).alias("bits")
            )
        )
    prof = profs[0].unionByName(profs[1])
    chunks = chunkframes[0].unionByName(chunkframes[1])
    merged = prof.agg(
        F.sum("n_rows").alias("n_rows"),
        (F.sum("sum_micro").cast("double") / 1e6).alias("total_price"),
        F.min("min_price").alias("min_price"),
        F.max("max_price").alias("max_price"),
    )
    merged_ndv = (
        chunks.groupBy("chunk")
        .agg(F.bit_or("bits").alias("bits"))
        .agg(F.sum(F.bit_count("bits")).alias("ndv_custkey"))
    )
    full = o.agg(
        F.count(F.lit(1)).alias("f_rows"),
        (F.sum(F.floor(F.col("o_totalprice") * 1e6 + 0.5)).cast("double") / 1e6).alias(
            "f_total"
        ),
        F.min("o_totalprice").alias("f_min"),
        F.max("o_totalprice").alias("f_max"),
        F.countDistinct("o_custkey").alias("f_ndv"),
    )
    return (
        merged.crossJoin(F.broadcast(merged_ndv))
        .crossJoin(F.broadcast(full))
        .select(
            "n_rows",
            F.round("total_price", 2).alias("total_price"),
            F.round("min_price", 2).alias("min_price"),
            F.round("max_price", 2).alias("max_price"),
            "ndv_custkey",
            (
                (F.col("n_rows") == F.col("f_rows"))
                & (F.col("total_price") == F.col("f_total"))
                & (F.col("min_price") == F.col("f_min"))
                & (F.col("max_price") == F.col("f_max"))
                & (F.col("ndv_custkey") == F.col("f_ndv"))
            ).cast("int").alias("merge_exact"),
        )
    )


@register(
    "catalog_fk_fanout_profile",
    group="B",
    oracle="""
    with f1 as (
      select 'orders.o_custkey -> customer.c_custkey' as fk,
             count(*) as n_children,
             count(distinct o_custkey) as n_parents_referenced,
             (select count(*) from customer) as n_parents_total
      from orders
    ),
    f2 as (
      select 'lineitem.l_orderkey -> orders.o_orderkey',
             count(*), count(distinct l_orderkey),
             (select count(*) from orders)
      from lineitem
    ),
    f3 as (
      select 'lineitem.l_partkey -> part.p_partkey',
             count(*), count(distinct l_partkey),
             (select count(*) from part)
      from lineitem
    ),
    u as (
      select * from f1 union all select * from f2 union all select * from f3
    )
    select fk, n_children, n_parents_referenced, n_parents_total,
           round(n_children * 1.0 / n_parents_referenced, 4) as avg_fanout,
           round(n_parents_referenced * 1.0 / n_parents_total, 6)
             as parent_coverage
    from u
    """,
)
def catalog_fk_fanout_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK fan-out profiling — the cardinality shape a catalog records
    per relationship: children per referenced parent (the join
    multiplier a planner needs) and parent coverage (what fraction of
    the dimension is ever referenced — low coverage flags dead rows or
    filtered extracts). One aggregation per fact table; no joins at
    all, since fan-out only needs the child side plus the parent
    count."""

    def prof(child: DataFrame, fk_col: str, parent: DataFrame, label: str) -> DataFrame:
        stats = child.agg(
            F.lit(label).alias("fk"),
            F.count(F.lit(1)).alias("n_children"),
            F.countDistinct(fk_col).alias("n_parents_referenced"),
        )
        ptotal = parent.agg(F.count(F.lit(1)).alias("n_parents_total"))
        return stats.crossJoin(F.broadcast(ptotal))

    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    c = load(spark, sf_dir, "customer")
    p = load(spark, sf_dir, "part")
    u = (
        prof(o, "o_custkey", c, "orders.o_custkey -> customer.c_custkey")
        .unionByName(
            prof(li, "l_orderkey", o, "lineitem.l_orderkey -> orders.o_orderkey")
        )
        .unionByName(
            prof(li, "l_partkey", p, "lineitem.l_partkey -> part.p_partkey")
        )
    )
    return u.select(
        "fk",
        "n_children",
        "n_parents_referenced",
        "n_parents_total",
        F.round(F.col("n_children") / F.col("n_parents_referenced"), 4).alias(
            "avg_fanout"
        ),
        F.round(
            F.col("n_parents_referenced") / F.col("n_parents_total"), 6
        ).alias("parent_coverage"),
    )


@register(
    "catalog_analyze_table_stats",
    group="B",
    oracle="""
    select 's_suppkey' as column, count(distinct s_suppkey) as ndv_exact,
           cast(0 as bigint) as n_nulls, true as ndv_ok
    from supplier
    union all
    select 's_nationkey', count(distinct s_nationkey), cast(0 as bigint), true
    from supplier
    union all
    select 's_acctbal', count(distinct s_acctbal), cast(0 as bigint), true
    from supplier
    """,
)
def catalog_analyze_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE → catalog statistics — the handshake between a
    crawler and Spark's cost-based optimizer: persist a table, run
    ANALYZE ... COMPUTE STATISTICS FOR COLUMNS, and read back what the
    CBO will use (per-column NDV (HLL-approximate), null count) via
    DESCRIBE EXTENDED. DESCRIBE output (byte sizes, value rendering)
    is engine/layout-specific, so the hashable content is the exact
    NDV + null count plus a verdict that ANALYZE's HLL distinct_count
    landed within 10% of exact — the stats pipeline must agree with
    the data it describes, and a broken ANALYZE flips ndv_ok."""
    import shutil

    src = load(spark, sf_dir, "supplier")
    spark.sql("drop table if exists dlc_stats_supplier")
    # a crashed previous run can leave the managed location behind with
    # no catalog entry — saveAsTable refuses then, so clear it first
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{wh}/dlc_stats_supplier", ignore_errors=True)
    src.write.mode("overwrite").saveAsTable("dlc_stats_supplier")
    spark.sql(
        "analyze table dlc_stats_supplier compute statistics"
        " for columns s_suppkey, s_nationkey, s_acctbal"
    )
    rows = []
    n_true = src.count()
    for col in ["s_suppkey", "s_nationkey", "s_acctbal"]:
        desc = {
            r["info_name"]: r["info_value"]
            for r in spark.sql(
                f"describe extended dlc_stats_supplier {col}"
            ).collect()
        }
        rows.append(
            (
                col,
                int(desc.get("distinct_count") or -1),
                int(desc.get("num_nulls") or -1),
                desc.get("min"),
                desc.get("max"),
            )
        )
    cols = ["s_suppkey", "s_nationkey", "s_acctbal"]
    truth = {
        c: n
        for c, n in zip(
            cols,
            src.agg(
                *[F.count_distinct(c).alias(c) for c in cols]
            ).collect()[0],
        )
    }
    out_rows = [
        (
            c,
            truth[c],
            n_nulls,
            abs(ndv_desc - truth[c]) <= max(1, 0.10 * truth[c]),
        )
        for (c, ndv_desc, n_nulls, _mn, _mx) in rows
    ]
    return spark.createDataFrame(
        out_rows, "column string, ndv_exact long, n_nulls long, ndv_ok boolean"
    )


@register(
    "catalog_sample_profile_accuracy",
    group="B",
    oracle=f"""
    with tagged as (
        select o_totalprice,
               cast(('0x' || substr(md5(cast(o_orderkey as varchar)), 1, 8))
                    as bigint) % 16 = 0 as in_sample
        from orders
    ),
    exact as (
        select cast(count(*) as bigint) as n,
               {AVG_D.format('o_totalprice')} as mean_price
        from tagged
    ),
    sampled as (
        select cast(count(*) as bigint) as n,
               {AVG_D.format('o_totalprice')} as mean_price
        from tagged where in_sample
    )
    select e.n as n_exact,
           s.n as n_sample,
           e.mean_price as mean_exact,
           s.mean_price as mean_sample,
           round(abs(s.mean_price - e.mean_price) / e.mean_price, 6)
               as mean_rel_err,
           round(s.n * 16.0 / e.n, 6) as sample_coverage_x16
    from exact e cross join sampled s
    """,
)
def catalog_sample_profile_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-ext: SAMPLED profiling with a measured error bar — the scale
    escape hatch for the column profiler: at 100 TB the crawler
    profiles a deterministic md5-hash sample (reproducible, engine-
    portable — same predicate as filter_deterministic_sample) instead
    of the full table, and THIS query is the calibration that says how
    much accuracy that trades: exact mean vs 1/16-sample mean, the
    relative error, and the realized sampling rate (×16 ≈ 1 when the
    hash is uniform). Both estimates are computed in one pass over one
    scan (the sample membership is a flag, not a second read), both
    use the exact micro-unit mean (davg) so the comparison itself
    carries no float noise, and the whole readout is deterministic —
    the oracle reproduces every column bit-for-bit. The same pattern
    calibrates NDV/null-fraction sampling; mean is the demonstrator."""
    o = load(spark, sf_dir, "orders")
    in_sample = (
        F.conv(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10
        ).cast("bigint")
        % 16
        == 0
    )
    tagged = o.select("o_totalprice", in_sample.alias("in_sample"))
    exact = tagged.agg(
        F.count(F.lit(1)).alias("n_exact"),
        davg("o_totalprice").alias("mean_exact"),
    )
    sampled = tagged.where("in_sample").agg(
        F.count(F.lit(1)).alias("n_sample"),
        davg("o_totalprice").alias("mean_sample"),
    )
    j = exact.crossJoin(F.broadcast(sampled))
    return j.select(
        "n_exact",
        "n_sample",
        "mean_exact",
        "mean_sample",
        F.round(
            F.abs(F.col("mean_sample") - F.col("mean_exact"))
            / F.col("mean_exact"),
            6,
        ).alias("mean_rel_err"),
        F.round(F.col("n_sample") * 16.0 / F.col("n_exact"), 6).alias(
            "sample_coverage_x16"
        ),
    )
