"""Graph analytics over the part co-purchase graph.

The reference's analytics surface includes relationship/graph queries
(SURVEY.md §2.J ext — market-basket lift and dedup connected-components
are the first members). This module materializes the canonical retail
graph — nodes = parts, an undirected edge (a,b) when both parts appear
in the same order in ≥2 distinct orders (support pruning) — and runs
the standard structural battery: degree distribution, triangle count,
unrolled PageRank, and common-neighbor Jaccard (link prediction).

Scale shape: the only data-sized pass is the distinct (order, part)
projection; the pair self-join is per-order (orders are small groups,
so the blow-up is Σ lines_per_order² — bounded by the basket-size cap,
not table size), and support-≥2 pruning keeps the derived graph sparse
(sf0.01: 115k raw pairs → 3.4k edges over 2k nodes). All downstream
joins run on the pruned edge table, which broadcasts at any realistic
scale; at 100 TB the same plan holds because baskets don't grow with
row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from datalakecrawler_spark.io import load
from datalakecrawler_spark.memo import memoized_checkpoint, memoized_scalar
from datalakecrawler_spark.registry import register

# Shared oracle prelude: distinct (order, part) pairs -> support-pruned
# undirected edges (pa < pb, weight = number of shared orders >= 2).
_EDGE_CTE = """
    lp as (select distinct l_orderkey, l_partkey from lineitem),
    edges as materialized (
      select a.l_partkey as pa, b.l_partkey as pb, count(*) as w
      from lp a join lp b
        on a.l_orderkey = b.l_orderkey and a.l_partkey < b.l_partkey
      group by 1, 2 having count(*) >= 2
    )
"""
# `materialized` pins the derived edge table: DuckDB inlines CTEs by
# default, so every reference — and every ITERATION of a recursive
# consumer (k-core peeling, reachability) — would otherwise re-run the
# distinct→self-join→rollup chain from parquet. Same discipline as the
# Spark side's localCheckpoint below.

_COMP_CTE = """
    l0 as materialized (
      select src as v, least(src, min(dst)) as m from sym group by 1
    ),
    redge as materialized (
      select distinct a.m as src, b.m as dst
      from sym join l0 a on a.v = sym.src join l0 b on b.v = sym.dst
      where a.m <> b.m
    ),
    reach as (
      select src as node, dst as r from redge
      union
      select reach.node, redge.dst as r
      from reach join redge on redge.src = reach.r
      where redge.dst <> reach.node
    ),
    rcomp as (
      select node, least(node, min(r)) as comp from reach group by 1
    ),
    comp as (
      select l0.v as node, coalesce(rcomp.comp, l0.m) as comp
      from l0 left join rcomp on rcomp.node = l0.m
    )
"""
# Exact connected components with ONE contraction round before the
# recursive transitive closure (assumes a symmetric `sym(src, dst)`
# CTE is in scope): first every node collapses to the min id of its
# closed neighborhood (l0), then the closure runs on the CONTRACTED
# graph (redge), then labels lift back through l0. Contraction
# preserves connectivity exactly, and the component minimum m always
# has l0(m) = m, so min-label-per-reduced-component is still the true
# min node id. On the sf0.01 co-purchase graph this cuts the closure's
# quadratic frontier from the full 1.9k-node GCC to its contracted
# skeleton — 4.0 s → 0.7 s measured — without changing a single output
# row; DuckDB 1.0 has no `USING KEY` recursion, so closure-over-
# contraction is the portable way to keep the oracle honest AND fast.


_EDGE_MEMO: dict = {}


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Support-pruned co-purchase edge list (pa < pb, w >= 2).

    The result is localCheckpoint()ed: every graph operator reuses
    this table several times (symmetrization, degree rollups,
    per-iteration joins), and without cutting lineage each reuse
    re-derives the distinct→self-join→rollup chain from parquet —
    the unrolled PageRank plan carried 49 exchanges and a ~47 s cold
    run from exactly that recomputation. The materialized frame is a
    few thousand rows (support pruning bounds it by co-purchase
    support, not table size); this is the same iterative-algorithm
    discipline as connected_components/k-core.

    Memoized per (session, sf_dir): ~15 graph operators all start from
    this exact table, and in a sequential checker run (the external
    driver walks every registered query in one process) re-deriving it
    per query was ~1-2 s × the whole family. The memo holds only a
    localCheckpoint'ed few-thousand-row frame; the key is the Spark
    applicationId (checkpointed RDDs live and die with the
    SparkContext), so a fresh driver process never sees a stale
    entry; bounded + unpersist-on-evict via memo.py (ADVICE r3)."""
    return memoized_checkpoint(
        _EDGE_MEMO, spark, sf_dir, lambda: _edges_plan(spark, sf_dir)
    )


def _edges_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    lp = li.select("l_orderkey", "l_partkey").distinct()
    a = lp.alias("a")
    b = lp.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"),
            F.col("b.l_partkey").alias("pb"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
    )


def _sym(edges: DataFrame) -> DataFrame:
    """Symmetrized (both directions) edge list: src, dst."""
    return edges.select(
        F.col("pa").alias("src"), F.col("pb").alias("dst")
    ).unionAll(
        edges.select(F.col("pb").alias("src"), F.col("pa").alias("dst"))
    )


@register(
    "graph_degree_distribution",
    group="J",
    oracle=f"""
    with {_EDGE_CTE},
    sym as (
      select pa as src from edges union all select pb as src from edges
    ),
    deg as (select src, count(*) as degree from sym group by 1)
    select degree, count(*) as n_nodes
    from deg group by 1 order by degree
    """,
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: degree distribution of the co-purchase graph — the first
    thing a graph profiler reports (is the graph scale-free? where is
    the hub tail?). Degree = count of the symmetrized edge list per
    node, then a count-per-degree rollup — two map-combinable
    aggregations over the broadcast-sized pruned edge table. Exact
    integers throughout; no float gate needed."""
    deg = (
        _sym(_edges(spark, sf_dir))
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("degree")
    )


@register(
    "graph_triangle_count",
    group="J",
    oracle=f"""
    with {_EDGE_CTE},
    e as (select pa, pb from edges),
    tri as (
      select count(*) as n_triangles
      from e e1
      join e e2 on e2.pa = e1.pb
      join e e3 on e3.pa = e1.pa and e3.pb = e2.pb
    )
    select (select count(*) from (
              select pa from e union select pb from e) n) as n_nodes,
           (select count(*) from e) as n_edges,
           n_triangles,
           round(cast(3 * n_triangles as double)
                 / nullif((select sum(d * (d - 1) / 2) from (
                     select count(*) as d from (
                       select pa as v from e
                       union all select pb as v from e) s
                     group by v) dd), 0), 6) as clustering_coeff
    from tri
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: global triangle count + clustering coefficient of the
    co-purchase graph. Triangles are enumerated once each via the
    oriented-edge join (pa < pb everywhere, so each triangle a<b<c
    matches exactly one (e1=(a,b), e2=(b,c), e3=(a,c)) assignment) —
    the standard distributed algorithm; at scale the classic
    degree-ordering optimization bounds wedge fan-out, and here the
    support-pruned edge table broadcasts so both joins are
    shuffle-free. Clustering coefficient = 3·triangles / open wedges
    (Σ d(d−1)/2) — an exact-integer ratio rounded at 6."""
    e = _edges(spark, sf_dir).select("pa", "pb")
    e1 = e.alias("e1")
    e2 = e.alias("e2")
    e3 = e.alias("e3")
    tri = (
        e1.join(F.broadcast(e2), F.col("e2.pa") == F.col("e1.pb"))
        .join(
            F.broadcast(e3),
            (F.col("e3.pa") == F.col("e1.pa"))
            & (F.col("e3.pb") == F.col("e2.pb")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    # One degree rollup yields nodes, edges AND wedges in a single
    # aggregate: every endpoint appears once in sym, so n_nodes =
    # |deg|, n_edges = Σd/2 (each edge counted at both ends), open
    # wedges = Σ d(d−1)/2. Collapsing three scalar subqueries into one
    # removes two SinglePartition exchanges and the union-distinct
    # shuffle from the plan (plan-lint guarded).
    stats = (
        _sym(e)
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("d"))
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            (F.sum("d") / 2).cast("bigint").alias("n_edges"),
            F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("wedges"),
        )
    )
    return stats.crossJoin(F.broadcast(tri)).select(
        "n_nodes",
        "n_edges",
        "n_triangles",
        F.round(
            (3 * F.col("n_triangles")).cast("double")
            / F.nullif(F.col("wedges"), F.lit(0)),
            6,
        ).alias("clustering_coeff"),
    )


@register(
    "graph_pagerank",
    group="J",
    oracle=f"""
    with {_EDGE_CTE},
    sym as (
      select pa as src, pb as dst from edges
      union all
      select pb as src, pa as dst from edges
    ),
    deg as (select src, count(*) as deg from sym group by 1),
    n as (select count(*) as n_nodes from deg),
    pr0 as (
      select src as v, round(1.0 / n_nodes, 9) as pr from deg, n
    ),
    pr1 as (
      select sym.dst as v,
             round(0.15 / (select n_nodes from n)
                   + 0.85 * sum(pr0.pr / deg.deg), 9) as pr
      from pr0 join sym on sym.src = pr0.v join deg on deg.src = pr0.v
      group by 1
    ),
    pr2 as (
      select sym.dst as v,
             round(0.15 / (select n_nodes from n)
                   + 0.85 * sum(pr1.pr / deg.deg), 9) as pr
      from pr1 join sym on sym.src = pr1.v join deg on deg.src = pr1.v
      group by 1
    ),
    pr3 as (
      select sym.dst as v,
             round(0.15 / (select n_nodes from n)
                   + 0.85 * sum(pr2.pr / deg.deg), 9) as pr
      from pr2 join sym on sym.src = pr2.v join deg on deg.src = pr2.v
      group by 1
    )
    select v as part, round(pr * 1000, 6) as pagerank_x1000
    from pr3
    order by pr desc, v limit 20
    """,
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: PageRank over the co-purchase graph — 'structurally
    central' parts, the recommendation-seed ranking. Three unrolled
    power iterations (engine pattern of events_markov_stationary /
    cluster_kmeans_lloyd: bounded DataFrame loop, unrolled-CTE
    oracle). Every node has degree ≥ 1 by construction, so there is
    no dangling-mass term. Determinism: each iteration re-quantizes
    pr at 9 dp, so both engines enter every round with bit-identical
    vectors; the per-node neighbor sum reorders ≤ max-degree doubles
    of magnitude ≤ 1 (error ~1e-16, absorbed by the 9-dp re-round).
    Each iteration is one join of the pr vector against the broadcast
    edge table + a keyed sum — at 1000 executors the vector stays
    partitioned by node and only the (tiny) edge table replicates."""
    edges = _edges(spark, sf_dir)
    sym = _sym(edges)
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n_nodes = memoized_scalar(
        spark, ("graph.n_nodes", sf_dir.rstrip("/")), deg.count
    )
    pr = deg.select("src", F.round(F.lit(1.0 / n_nodes), 9).alias("pr"))
    sym_deg = F.broadcast(
        sym.join(deg, "src").select("src", "dst", "deg")
    )
    for _ in range(3):
        pr = (
            pr.join(sym_deg, pr.src == sym_deg.src)
            .groupBy(F.col("dst").alias("v"))
            .agg(
                F.round(
                    0.15 / n_nodes
                    + 0.85 * F.sum(F.col("pr") / F.col("deg")),
                    9,
                ).alias("pr")
            )
            .withColumnRenamed("v", "src")
        )
    return (
        pr.select(
            F.col("src").alias("part"),
            F.round(F.col("pr") * 1000, 6).alias("pagerank_x1000"),
        )
        .orderBy(F.col("pagerank_x1000").desc(), "part")
        .limit(20)
    )


@register(
    "graph_jaccard_neighbors",
    group="J",
    oracle=f"""
    with {_EDGE_CTE},
    sym as (
      select pa as src, pb as dst from edges
      union all
      select pb as src, pa as dst from edges
    ),
    deg as (select src, count(*) as deg from sym group by 1),
    common as (
      select a.src as pa, b.src as pb, count(*) as c
      from sym a join sym b
        on a.dst = b.dst and a.src < b.src
      group by 1, 2 having count(*) >= 2
    )
    select common.pa, common.pb, c as n_common,
           round(cast(c as double) / (da.deg + db.deg - c), 6) as jaccard
    from common
    join deg da on da.src = common.pa
    join deg db on db.src = common.pb
    order by jaccard desc, common.pa, common.pb limit 20
    """,
)
def graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: neighbor-set Jaccard similarity — the classic
    link-prediction / 'parts bought in similar contexts' score:
    |N(a)∩N(b)| / |N(a)∪N(b)| for node pairs sharing ≥2 neighbors.
    Common-neighbor counts come from the wedge self-join on the
    shared endpoint (same fan-out bound as triangle counting); the
    union size is inclusion-exclusion deg(a)+deg(b)−common, so no
    second set operation is needed. Exact-integer ratio, round 6;
    top-20 with deterministic (jaccard, pa, pb) tie-break."""
    sym = _sym(_edges(spark, sf_dir))
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    a = sym.alias("a")
    b = sym.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.dst") == F.col("b.dst"))
            & (F.col("a.src") < F.col("b.src")),
        )
        .groupBy(
            F.col("a.src").alias("pa"), F.col("b.src").alias("pb")
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
    )
    da = deg.select(F.col("src").alias("pa"), F.col("deg").alias("dega"))
    db = deg.select(F.col("src").alias("pb"), F.col("deg").alias("degb"))
    return (
        common.join(F.broadcast(da), "pa")
        .join(F.broadcast(db), "pb")
        .select(
            "pa",
            "pb",
            F.col("c").alias("n_common"),
            F.round(
                F.col("c").cast("double")
                / (F.col("dega") + F.col("degb") - F.col("c")),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), "pa", "pb")
        .limit(20)
    )


@register(
    "graph_kcore_decomposition",
    group="J",
    oracle=f"""
    with {_EDGE_CTE},
    e0 as (select pa, pb from edges),
    d1 as (
      select v, count(*) as d from (
        select pa as v from e0 union all select pb as v from e0) s
      group by 1
    ),
    k1 as (select v from d1 where d >= 3),
    e1 as (
      select pa, pb from e0
      where pa in (select v from k1) and pb in (select v from k1)
    ),
    d2 as (
      select v, count(*) as d from (
        select pa as v from e1 union all select pb as v from e1) s
      group by 1
    ),
    k2 as (select v from d2 where d >= 3),
    e2 as (
      select pa, pb from e1
      where pa in (select v from k2) and pb in (select v from k2)
    ),
    d3 as (
      select v, count(*) as d from (
        select pa as v from e2 union all select pb as v from e2) s
      group by 1
    ),
    k3 as (select v from d3 where d >= 3),
    e3 as (
      select pa, pb from e2
      where pa in (select v from k3) and pb in (select v from k3)
    )
    select * from (
      select 0 as round, (select count(*) from d1) as n_nodes,
             (select count(*) from e0) as n_edges
      union all
      select 1, (select count(*) from k1), (select count(*) from e1)
      union all
      select 2, (select count(*) from k2), (select count(*) from e2)
      union all
      select 3, (select count(*) from k3), (select count(*) from e3)
    ) t order by round
    """,
)
def graph_kcore_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: 3-core peeling — iteratively drop nodes with degree < 3
    and report the shrinking (nodes, edges) per round: the standard
    'dense backbone' extraction (the surviving core is where
    community structure and recommendation signal live; the peeled
    fringe is one-off co-purchases). Three unrolled peel rounds as a
    bounded DataFrame loop (the events_markov_stationary engine
    pattern) with an unrolled-CTE oracle; every quantity is an exact
    integer count. Each round is a degree rollup + two semi-joins
    against the (tiny, broadcast) surviving-node set — at 100 TB the
    peeling converges in few rounds precisely because degrees are
    basket-bounded.

    Engine note (r9 optimization): the peel is a FIXED 3-round unroll,
    so the whole decomposition is ONE declarative plan — a union of
    four single-row aggregates over progressively deeper semi-join
    chains — instead of the former driver loop that issued ~11 actions
    (two counts + a checkpoint per round; 19.6 s of the sf0.01
    registry walk, re-measured 2.5 s cold as one plan). Each round's
    surviving-node set is a broadcast semi-join filter; identical
    aggregate subtrees dedupe via ReusedExchange, and n_edges comes
    from the degree rollup itself (Σd = 2·|E| exactly — every edge
    contributes to both endpoint degrees), so no per-round edge count
    is needed. The base edge list is the memoized localCheckpoint
    (loop invariant pinned to storage); everything above it is a few
    thousand rows."""
    e = _edges(spark, sf_dir).select("pa", "pb").localCheckpoint()

    def _deg(cur: DataFrame) -> DataFrame:
        return _sym(cur).groupBy("src").agg(F.count(F.lit(1)).alias("d"))

    def _round_row(r: int, n_nodes: DataFrame, deg: DataFrame) -> DataFrame:
        # n_nodes: 1-row (cnt) frame; n_edges = Σd/2 of this round's
        # survivor graph (coalesce: an empty round has a NULL sum).
        edges_cnt = deg.agg(
            (F.coalesce(F.sum("d"), F.lit(0)) / F.lit(2))
            .cast("bigint")
            .alias("n_edges")
        )
        return n_nodes.crossJoin(edges_cnt).select(
            F.lit(r).cast("int").alias("round"),
            F.col("cnt").cast("bigint").alias("n_nodes"),
            "n_edges",
        )

    cur = e
    deg = _deg(cur)
    rows = [_round_row(0, deg.agg(F.count(F.lit(1)).alias("cnt")), deg)]
    # ADVICE r9: the single-plan unroll inflates the physical plan
    # super-linearly with depth (3 rounds ≈ 13.8k plan lines, bounded
    # only because ReusedExchange dedupes the identical subtrees). The
    # round count is part of the query contract and MUST stay small;
    # if it is ever raised past ~4, switch back to a per-round
    # localCheckpoint loop instead of deepening this plan.
    _KCORE_ROUNDS = 3
    assert _KCORE_ROUNDS <= 4, "unroll depth is plan-size-bounded"
    for r in range(1, _KCORE_ROUNDS + 1):
        keep = deg.filter(F.col("d") >= 3).select(
            F.col("src").alias("v")
        )
        cur = (
            cur.join(F.broadcast(keep), cur.pa == keep.v, "left_semi")
            .join(F.broadcast(keep), F.col("pb") == keep.v, "left_semi")
        )
        deg = _deg(cur)
        rows.append(
            _round_row(r, keep.agg(F.count(F.lit(1)).alias("cnt")), deg)
        )
    out = rows[0]
    for df in rows[1:]:
        out = out.unionAll(df)
    return out.orderBy("round")


@register(
    "graph_label_propagation",
    group="J",
    oracle=f"""
    with {_EDGE_CTE},
    sym as (
      select pa as src, pb as dst from edges
      union all
      select pb as src, pa as dst from edges
    ),
    l0 as (select distinct src as v, src as lbl from sym),
    votes1 as (
      select sym.src as v, l0.lbl, count(*) as c
      from sym join l0 on l0.v = sym.dst
      group by 1, 2
    ),
    l1 as (
      select v, min(lbl) filter (where rk = 1) as lbl from (
        select v, lbl,
               rank() over (partition by v order by c desc) as rk
        from votes1) t
      group by 1
    ),
    votes2 as (
      select sym.src as v, l1.lbl, count(*) as c
      from sym join l1 on l1.v = sym.dst
      group by 1, 2
    ),
    l2 as (
      select v, min(lbl) filter (where rk = 1) as lbl from (
        select v, lbl,
               rank() over (partition by v order by c desc) as rk
        from votes2) t
      group by 1
    ),
    sizes as (select lbl, count(*) as sz from l2 group by 1)
    select sz as community_size, count(*) as n_communities
    from sizes group by 1 order by community_size
    """,
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: label-propagation community detection, 2 synchronous
    rounds with a DETERMINISTIC tie rule (each node adopts its
    neighbors' most frequent label, ties → smallest label id —
    classic LPA is run-order random; the min-tie-break variant is
    reproducible and therefore oracle-checkable), reporting the
    community-size histogram. Each round is one join of the label
    vector against the broadcast symmetrized edges + a vote rollup +
    a rank — all exact integer operations. dedup_components computes
    exact connected components via iterated min; LPA differs by
    splitting dense components into COMMUNITIES (majority vote, not
    reachability). At scale the label vector stays partitioned by
    node; rounds are map-side against broadcast edges."""
    sym = _sym(_edges(spark, sf_dir))
    l = sym.select(F.col("src").alias("v")).distinct().select(
        "v", F.col("v").alias("lbl")
    )
    for _ in range(2):
        votes = (
            sym.join(
                F.broadcast(l.withColumnRenamed("v", "nbr")),
                F.col("dst") == F.col("nbr"),
            )
            .groupBy(F.col("src").alias("v"), "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # r9 optimization (guide §2.4): "most-frequent label, ties →
        # smallest" was a rank window (exchange + SORT per round) then
        # a re-aggregate; one hash aggregate computes the same winner —
        # max of struct(c, -lbl) is lexicographic (max count, then max
        # of -lbl = MIN label), bit-identical to rank=1 + min(lbl).
        # Saves a sort per round and map-side-combines the vote rollup.
        l = (
            votes.groupBy("v")
            .agg(
                F.max(
                    F.struct(
                        F.col("c").alias("c"),
                        (-F.col("lbl")).alias("nl"),
                    )
                ).alias("m")
            )
            .select("v", (-F.col("m.nl")).alias("lbl"))
        )
    sizes = l.groupBy("lbl").agg(F.count(F.lit(1)).alias("sz"))
    return (
        sizes.groupBy(F.col("sz").alias("community_size"))
        .agg(F.count(F.lit(1)).alias("n_communities"))
        .orderBy("community_size")
    )


@register(
    "graph_assortativity",
    group="J",
    oracle=f"""
    with {_EDGE_CTE},
    sym as (
      select pa as src, pb as dst from edges
      union all
      select pb as src, pa as dst from edges
    ),
    deg as (select src, cast(count(*) as bigint) as d from sym
            group by 1),
    ends as (
      select da.d as x, db.d as y
      from sym
      join deg da on da.src = sym.src
      join deg db on db.src = sym.dst
    ),
    m as (
      select cast(count(*) as bigint) as n,
             cast(sum(x) as bigint) as sx,
             cast(sum(y) as bigint) as sy,
             cast(sum(x * y) as bigint) as sxy,
             cast(sum(x * x) as bigint) as sxx,
             cast(sum(y * y) as bigint) as syy
      from ends
    )
    select n as n_directed_ends,
           round((cast(n as double) * sxy
                  - cast(sx as double) * sy)
                 / sqrt((cast(n as double) * sxx
                         - cast(sx as double) * sx)
                        * (cast(n as double) * syy
                           - cast(sy as double) * sy)), 6)
             as assortativity
    from m
    """,
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: degree assortativity — the Pearson correlation of
    degrees across edge endpoints (Newman's r): positive = hubs
    connect to hubs (social-network flavor), negative = hubs serve
    leaves (hub-and-spoke retail, the typical co-purchase shape —
    staple parts attach to everything). Computed over the
    symmetrized edge list so both orientations contribute (the
    standard estimator); degrees are exact ints, so all six moment
    sums are exact bigints and the correlation is the same
    fixed-order Pearson as stats_spearman_corr. Two broadcast
    degree joins onto the (tiny) edge table."""
    sym = _sym(_edges(spark, sf_dir))
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    da = deg.select(F.col("src").alias("s_"), F.col("d").alias("x"))
    db = deg.select(F.col("src").alias("t_"), F.col("d").alias("y"))
    ends = sym.join(
        F.broadcast(da), F.col("src") == F.col("s_")
    ).join(F.broadcast(db), F.col("dst") == F.col("t_"))
    m = ends.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    den = F.sqrt(
        (nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        * (nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
    )
    return m.select(
        F.col("n").alias("n_directed_ends"),
        F.round(num / den, 6).alias("assortativity"),
    )


@register(
    "graph_2hop_reach",
    group="J",
    oracle=f"""
    with {_EDGE_CTE},
    sym as (
      select pa as src, pb as dst from edges
      union all
      select pb as src, pa as dst from edges
    ),
    two_hop as (
      select a.src, b.dst as r
      from sym a join sym b on b.src = a.dst
      where b.dst <> a.src
      union
      select src, dst from sym
    ),
    reach as (
      select src, cast(count(distinct r) as bigint) as n_reach
      from two_hop group by 1
    ),
    deg as (
      select src, cast(count(*) as bigint) as degree from sym
      group by 1
    )
    select reach.src as part, deg.degree, reach.n_reach,
           round(cast(reach.n_reach as double) / deg.degree, 4)
             as amplification
    from reach join deg using (src)
    order by n_reach desc, part limit 20
    """,
)
def graph_2hop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: 2-hop reach — distinct nodes within two hops per node,
    with the amplification ratio reach/degree ('how much does the
    neighborhood OPEN UP one step further' — high amplification =
    a bridge into other communities, the influence-maximization
    seed signal that plain degree misses; graph_pagerank converges
    to a related quantity but this is the exact 2-ball size). One
    wedge join on the broadcast edge table + a distinct-union with
    the 1-hop set; exact integer counts. At web scale 2-hop sets
    explode on hubs — the production form sketches them with HLL
    per node (agg_hll_mergeable), same join shape."""
    sym = _sym(_edges(spark, sf_dir))
    a = sym.alias("a")
    b = sym.alias("b")
    two = (
        a.join(b, F.col("b.src") == F.col("a.dst"))
        .where(F.col("b.dst") != F.col("a.src"))
        .select(F.col("a.src").alias("src"), F.col("b.dst").alias("r"))
        .union(sym.select("src", F.col("dst").alias("r")))
        .distinct()
    )
    reach = two.groupBy("src").agg(F.count(F.lit(1)).alias("n_reach"))
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
    return (
        reach.join(deg, "src")
        .select(
            F.col("src").alias("part"),
            "degree",
            "n_reach",
            F.round(
                F.col("n_reach").cast("double") / F.col("degree"), 4
            ).alias("amplification"),
        )
        .orderBy(F.col("n_reach").desc(), "part")
        .limit(20)
    )


@register(
    "graph_gcc_fraction",
    group="J",
    oracle=f"""
    with recursive {_EDGE_CTE},
    sym as materialized (
      select pa as src, pb as dst from edges
      union all
      select pb as src, pa as dst from edges
    ),
    {_COMP_CTE},
    sizes as (
      select comp, cast(count(*) as bigint) as sz from comp group by 1
    ),
    tot as (
      select cast(sum(sz) as bigint) as n_nodes,
             cast(count(*) as bigint) as n_components,
             cast(max(sz) as bigint) as gcc_size
      from sizes
    )
    select n_nodes, n_components, gcc_size,
           round(cast(gcc_size as double) / n_nodes, 6) as gcc_fraction
    from tot
    """,
)
def graph_gcc_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: giant-connected-component fraction — how much of the
    co-purchase graph is ONE connected market vs fragmented niches
    (GCC fraction near 1 = recommendations can walk anywhere; many
    components = segmented catalogs that need per-component models).
    Spark runs the iterative min-label components
    (connected_components engine, localCheckpoint-per-round); the
    oracle closes the same graph with a recursive transitive-closure
    CTE — a second cross-engine fixpoint proof on a DENSER graph
    than dedup_component_size_hist's near-clique forests. Exact
    integer sizes; one ratio."""
    comp = _copurchase_components(spark, sf_dir)
    sizes = comp.groupBy("comp").agg(F.count(F.lit(1)).alias("sz"))
    return sizes.agg(
        F.sum("sz").alias("n_nodes"),
        F.count(F.lit(1)).alias("n_components"),
        F.max("sz").alias("gcc_size"),
    ).select(
        "n_nodes",
        "n_components",
        "gcc_size",
        F.round(
            F.col("gcc_size").cast("double") / F.col("n_nodes"), 6
        ).alias("gcc_fraction"),
    )


def connected_components_graph(edges: DataFrame) -> DataFrame:
    """Min-label connected components (the pipeline.dedup algorithm,
    re-exported here for graph-module callers without a circular
    import)."""
    from datalakecrawler_spark.pipeline.dedup import (
        connected_components,
    )

    return connected_components(edges)


_CC_MEMO: dict = {}


def _copurchase_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the co-purchase graph, memoized like
    _edges: both graph_gcc_fraction and graph_partition_rand_index
    need the identical (node, comp) labeling, and the iterative
    min-label loop (a checkpoint + convergence count per round) is
    the single most expensive stage in the graph family — paying it
    once per checker process instead of per query halves the
    family's driver cost."""
    def build() -> DataFrame:
        e = _edges(spark, sf_dir).select(
            F.col("pa").alias("src"), F.col("pb").alias("dst")
        )
        return connected_components_graph(e)

    return memoized_checkpoint(_CC_MEMO, spark, sf_dir, build)


@register(
    "graph_pagerank_weighted",
    group="J",
    oracle=f"""
    with {_EDGE_CTE},
    sym as (
      select pa as src, pb as dst, w from edges
      union all
      select pb as src, pa as dst, w from edges
    ),
    strength as (
      select src, cast(sum(w) as bigint) as s from sym group by 1
    ),
    n as (select count(*) as n_nodes from strength),
    pr0 as (
      select src as v, round(1.0 / n_nodes, 9) as pr from strength, n
    ),
    pr1 as (
      select sym.dst as v,
             round(0.15 / (select n_nodes from n)
                   + 0.85 * sum(pr0.pr * sym.w / strength.s), 9) as pr
      from pr0
      join sym on sym.src = pr0.v
      join strength on strength.src = pr0.v
      group by 1
    ),
    pr2 as (
      select sym.dst as v,
             round(0.15 / (select n_nodes from n)
                   + 0.85 * sum(pr1.pr * sym.w / strength.s), 9) as pr
      from pr1
      join sym on sym.src = pr1.v
      join strength on strength.src = pr1.v
      group by 1
    ),
    pr3 as (
      select sym.dst as v,
             round(0.15 / (select n_nodes from n)
                   + 0.85 * sum(pr2.pr * sym.w / strength.s), 9) as pr
      from pr2
      join sym on sym.src = pr2.v
      join strength on strength.src = pr2.v
      group by 1
    )
    select v as part, round(pr * 1000, 6) as wpagerank_x1000
    from pr3
    order by pr desc, v limit 20
    """,
)
def graph_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: WEIGHTED PageRank — rank mass flows proportional to
    edge weight / node strength (Σw) instead of 1/degree, so a part
    co-purchased 5× with a hub transfers 5× the endorsement of a
    one-off pairing (graph_pagerank treats both the same — the
    weighted variant is what co-occurrence graphs actually want,
    since weights carry the signal support). Same 3-round unroll,
    same 9-dp re-quantization per round; the only change is the
    strength normalizer — per-iteration cost and parity argument
    identical to the unweighted operator."""
    edges = _edges(spark, sf_dir)
    sym = edges.select(
        F.col("pa").alias("src"), F.col("pb").alias("dst"), "w"
    ).unionAll(
        edges.select(
            F.col("pb").alias("src"), F.col("pa").alias("dst"), "w"
        )
    )
    strength = sym.groupBy("src").agg(F.sum("w").alias("s"))
    n_nodes = memoized_scalar(
        spark, ("graph.n_nodes", sf_dir.rstrip("/")), strength.count
    )
    pr = strength.select(
        "src", F.round(F.lit(1.0 / n_nodes), 9).alias("pr")
    )
    sym_s = F.broadcast(
        sym.join(strength, "src").select("src", "dst", "w", "s")
    )
    for _ in range(3):
        pr = (
            pr.join(sym_s, pr.src == sym_s.src)
            .groupBy(F.col("dst").alias("v"))
            .agg(
                F.round(
                    0.15 / n_nodes
                    + 0.85
                    * F.sum(
                        F.col("pr") * F.col("w") / F.col("s")
                    ),
                    9,
                ).alias("pr")
            )
            .withColumnRenamed("v", "src")
        )
    return (
        pr.select(
            F.col("src").alias("part"),
            F.round(F.col("pr") * 1000, 6).alias("wpagerank_x1000"),
        )
        .orderBy(F.col("wpagerank_x1000").desc(), "part")
        .limit(20)
    )


@register(
    "graph_modularity",
    group="J",
    oracle=f"""
    with {_EDGE_CTE},
    sym as (
      select pa as src, pb as dst from edges
      union all
      select pb as src, pa as dst from edges
    ),
    l0 as (select distinct src as v, src as lbl from sym),
    votes1 as (
      select sym.src as v, l0.lbl, count(*) as c
      from sym join l0 on l0.v = sym.dst
      group by 1, 2
    ),
    l1 as (
      select v, min(lbl) filter (where rk = 1) as lbl from (
        select v, lbl,
               rank() over (partition by v order by c desc) as rk
        from votes1) t
      group by 1
    ),
    votes2 as (
      select sym.src as v, l1.lbl, count(*) as c
      from sym join l1 on l1.v = sym.dst
      group by 1, 2
    ),
    l2 as (
      select v, min(lbl) filter (where rk = 1) as lbl from (
        select v, lbl,
               rank() over (partition by v order by c desc) as rk
        from votes2) t
      group by 1
    ),
    m as (select cast(count(*) as bigint) as m2 from sym),
    intra as (
      select la.lbl, cast(count(*) as bigint) as e2_c
      from sym
      join l2 la on la.v = sym.src
      join l2 lb on lb.v = sym.dst
      where la.lbl = lb.lbl
      group by 1
    ),
    degs as (
      select l2.lbl, cast(count(*) as bigint) as d_c
      from sym join l2 on l2.v = sym.src
      group by 1
    ),
    q as (
      select degs.lbl,
             cast(coalesce(intra.e2_c, 0) as double) / m.m2
             - (cast(degs.d_c as double) / m.m2)
               * (cast(degs.d_c as double) / m.m2) as q_c
      from degs left join intra using (lbl) cross join m
    )
    select count(*) as n_communities,
           round(cast(sum(cast(floor(q_c * 1e9 + 0.5) as bigint))
                 as double) / 1e9, 6) as modularity
    from q
    """,
)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: Newman modularity of the 2-round LPA partition —
    Q = Σ_c [intra_c/2m − (deg_c/2m)²], the number that says whether
    graph_label_propagation found STRUCTURE (Q ≳ 0.3) or noise
    (Q ≈ 0): detection without a quality score is a demo, with one
    it's a tool, and Q is also the convergence criterion that
    decides whether to run more LPA rounds. Re-runs the
    deterministic LPA (same unrolled rounds as the community
    operator — the oracle replays them in CTEs), then two
    label-joined rollups over the broadcast edge list; per-community
    terms are nano-quantized before the final sum."""
    sym = _sym(_edges(spark, sf_dir))
    l = sym.select(F.col("src").alias("v")).distinct().select(
        "v", F.col("v").alias("lbl")
    )
    for _ in range(2):
        votes = (
            sym.join(
                F.broadcast(l.withColumnRenamed("v", "nbr")),
                F.col("dst") == F.col("nbr"),
            )
            .groupBy(F.col("src").alias("v"), "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # same one-aggregate vote winner as graph_label_propagation
        # (r9): max(struct(c, -lbl)) ≡ rank=1-by-count + min(lbl).
        l = (
            votes.groupBy("v")
            .agg(
                F.max(
                    F.struct(F.col("c").alias("c"), (-F.col("lbl")).alias("nl"))
                ).alias("m")
            )
            .select("v", (-F.col("m.nl")).alias("lbl"))
        )
    m2 = memoized_scalar(spark, ("graph.m2", sf_dir.rstrip("/")), sym.count)
    la = l.select(F.col("v").alias("sv"), F.col("lbl").alias("la"))
    lb = l.select(F.col("v").alias("dv"), F.col("lbl").alias("lb"))
    joined = sym.join(
        F.broadcast(la), F.col("src") == F.col("sv")
    ).join(F.broadcast(lb), F.col("dst") == F.col("dv"))
    intra = (
        joined.where(F.col("la") == F.col("lb"))
        .groupBy(F.col("la").alias("lbl"))
        .agg(F.count(F.lit(1)).alias("e2_c"))
    )
    degs = joined.groupBy(F.col("la").alias("lbl")).agg(
        F.count(F.lit(1)).alias("d_c")
    )
    q = degs.join(intra, "lbl", "left").na.fill({"e2_c": 0}).select(
        (
            F.col("e2_c").cast("double") / m2
            - (F.col("d_c").cast("double") / m2)
            * (F.col("d_c").cast("double") / m2)
        ).alias("q_c")
    )
    return q.agg(
        F.count(F.lit(1)).alias("n_communities"),
        F.round(
            F.sum(F.floor(F.col("q_c") * 1e9 + 0.5)).cast("double")
            / 1e9,
            6,
        ).alias("modularity"),
    )


@register(
    "graph_degree_gini",
    group="J",
    oracle=f"""
    with {_EDGE_CTE},
    sym as (
      select pa as src from edges union all select pb as src from edges
    ),
    deg as (select src, cast(count(*) as bigint) as d from sym
            group by 1),
    r as (
      select d,
             row_number() over (order by d, src) as i,
             count(*) over () as n,
             sum(d) over () as sd
      from deg
    )
    select max(n) as n_nodes,
           cast(max(sd) as bigint) as n_degree_sum,
           round((2.0 * cast(sum(i * d) as bigint))
                   / (cast(max(n) as double) * max(sd))
                 - (cast(max(n) as double) + 1) / max(n), 6)
             as degree_gini
    from r
    """,
)
def graph_degree_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: Gini coefficient of the degree distribution — hub
    concentration in one number (Gini ≈ 0: egalitarian lattice-like
    co-purchase; high: a few staple parts dominate connectivity —
    the robustness question: high-Gini graphs shatter when hubs are
    delisted). Reuses the exact rank-sum Gini identity
    (events_value_gini_by_type) on integer degrees with (d, src)
    tie-ordering. r5: the rank is the distributed exact global row
    number (distrank — nodes are entity-grain and grow with the
    data), and n / Σd fold into the final scalar aggregate instead of
    ``count()/sum() over ()`` global windows: the reduction is
    map-side partial, nothing data-proportional passes one task.
    Completes the structural profile: degree DISTRIBUTION (shape),
    assortativity (mixing), Gini (inequality)."""
    from datalakecrawler_spark.distrank import with_global_row_number

    deg = (
        _sym(_edges(spark, sf_dir))
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    r = with_global_row_number(deg, spark, ["d", "src"], out="i")
    t = r.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum("d").alias("n_degree_sum"),
        F.sum(F.col("i") * F.col("d")).alias("id_sum"),
    )
    nd = F.col("n_nodes").cast("double")
    return t.select(
        "n_nodes",
        "n_degree_sum",
        F.round(
            (2.0 * F.col("id_sum")) / (nd * F.col("n_degree_sum"))
            - (nd + 1) / F.col("n_nodes"),
            6,
        ).alias("degree_gini"),
    )


@register(
    "graph_pagerank_delta",
    group="J",
    oracle=f"""
    with {_EDGE_CTE},
    sym as (
      select pa as src, pb as dst from edges
      union all
      select pb as src, pa as dst from edges
    ),
    deg as (select src, count(*) as deg from sym group by 1),
    n as (select count(*) as n_nodes from deg),
    pr0 as (
      select src as v, round(1.0 / n_nodes, 9) as pr from deg, n
    ),
    pr1 as (
      select sym.dst as v,
             round(0.15 / (select n_nodes from n)
                   + 0.85 * sum(pr0.pr / deg.deg), 9) as pr
      from pr0 join sym on sym.src = pr0.v join deg on deg.src = pr0.v
      group by 1
    ),
    pr2 as (
      select sym.dst as v,
             round(0.15 / (select n_nodes from n)
                   + 0.85 * sum(pr1.pr / deg.deg), 9) as pr
      from pr1 join sym on sym.src = pr1.v join deg on deg.src = pr1.v
      group by 1
    ),
    pr3 as (
      select sym.dst as v,
             round(0.15 / (select n_nodes from n)
                   + 0.85 * sum(pr2.pr / deg.deg), 9) as pr
      from pr2 join sym on sym.src = pr2.v join deg on deg.src = pr2.v
      group by 1
    ),
    delta as (
      select cast(round(abs(pr3.pr - pr2.pr) * 1e9) as bigint) as d9
      from pr2 join pr3 using (v)
    )
    select (select n_nodes from n) as n_nodes,
           round(cast(sum(d9) as double) / 1e9, 9) as l1_delta,
           round(cast(max(d9) as double) / 1e9, 9) as linf_delta,
           max(d9) <= 1000 as converged_at_1e_minus6
    from delta
    """,
)
def graph_pagerank_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: PageRank convergence diagnostics — the L1 and L∞
    distance between iterations 2 and 3 of the unrolled power
    method, with a 1e-6 convergence verdict: the number that decides
    whether graph_pagerank's 3 rounds were ENOUGH (the driver-side
    stopping rule a production iterative job would check each round,
    here materialized as a query so the decision itself is
    oracle-checkable). Both iteration vectors are 9-dp re-quantized
    (exact ints ×1e9), so the deltas are exact integer differences —
    the convergence test is pure integer comparison. Two extra
    |V|-row joins on the checkpointed edge table."""
    edges = _edges(spark, sf_dir)
    sym = _sym(edges)
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n_nodes = memoized_scalar(
        spark, ("graph.n_nodes", sf_dir.rstrip("/")), deg.count
    )
    pr = deg.select("src", F.round(F.lit(1.0 / n_nodes), 9).alias("pr"))
    sym_deg = F.broadcast(
        sym.join(deg, "src").select("src", "dst", "deg")
    )
    vecs = []
    for i in range(3):
        pr = (
            pr.join(sym_deg, pr.src == sym_deg.src)
            .groupBy(F.col("dst").alias("v"))
            .agg(
                F.round(
                    0.15 / n_nodes
                    + 0.85 * F.sum(F.col("pr") / F.col("deg")),
                    9,
                ).alias("pr")
            )
            .withColumnRenamed("v", "src")
        )
        if i >= 1:
            vecs.append(pr)
    pr2, pr3 = vecs
    delta = (
        pr2.select(F.col("src").alias("v"), F.col("pr").alias("p2"))
        .join(
            pr3.select(F.col("src").alias("v"), F.col("pr").alias("p3")),
            "v",
        )
        .select(
            F.round(F.abs(F.col("p3") - F.col("p2")) * 1e9)
            .cast("long")
            .alias("d9")
        )
    )
    return delta.agg(
        F.lit(n_nodes).alias("n_nodes"),
        F.round(F.sum("d9").cast("double") / 1e9, 9).alias("l1_delta"),
        F.round(F.max("d9").cast("double") / 1e9, 9).alias(
            "linf_delta"
        ),
        (F.max("d9") <= 1000).alias("converged_at_1e_minus6"),
    )


@register(
    "graph_partition_rand_index",
    group="J",
    oracle=f"""
    with recursive {_EDGE_CTE},
    sym as materialized (
      select pa as src, pb as dst from edges
      union all
      select pb as src, pa as dst from edges
    ),
    {_COMP_CTE},
    ccomp as (select node as v, comp as c from comp),
    lp0 as (select distinct src as v, src as lbl from sym),
    votes1 as (
      select sym.src as v, lp0.lbl, count(*) as cnt
      from sym join lp0 on lp0.v = sym.dst
      group by 1, 2
    ),
    l1 as (
      select v, min(lbl) filter (where rk = 1) as lbl from (
        select v, lbl,
               rank() over (partition by v order by cnt desc) as rk
        from votes1) t
      group by 1
    ),
    votes2 as (
      select sym.src as v, l1.lbl, count(*) as cnt
      from sym join l1 on l1.v = sym.dst
      group by 1, 2
    ),
    l2 as (
      select v, min(lbl) filter (where rk = 1) as lbl from (
        select v, lbl,
               rank() over (partition by v order by cnt desc) as rk
        from votes2) t
      group by 1
    ),
    both_lbl as (
      select ccomp.v, ccomp.c, l2.lbl from ccomp join l2 using (v)
    ),
    n as (select cast(count(*) as bigint) as n from both_lbl),
    cell as (
      select c, lbl, cast(count(*) as bigint) as k
      from both_lbl group by 1, 2
    ),
    rowm as (select c, cast(sum(k) as bigint) as a from cell group by 1),
    colm as (select lbl, cast(sum(k) as bigint) as b from cell
             group by 1),
    sums as (
      select (select cast(sum(k * (k - 1) / 2) as bigint) from cell)
               as s_cell,
             (select cast(sum(a * (a - 1) / 2) as bigint) from rowm)
               as s_row,
             (select cast(sum(b * (b - 1) / 2) as bigint) from colm)
               as s_col,
             (select n * (n - 1) / 2 from n) as s_tot
      from n
    )
    select (select n from n) as n_nodes,
           round(cast(s_cell + s_tot - s_row - s_col + s_cell
                 as double) / s_tot, 6) as rand_index
    from sums
    """,
)
def graph_partition_rand_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: Rand index between the CONNECTED-COMPONENT partition and
    the 2-round LPA COMMUNITY partition — pair-counting agreement
    (same-cluster-in-both + different-in-both over all node pairs):
    the principled answer to 'did LPA just rediscover components or
    find finer structure?' (RI ≈ 1 → LPA adds nothing over
    reachability; graph_modularity scores the partition against the
    GRAPH, RI scores it against another PARTITION). Both labelings
    are the repo's deterministic fixpoints; agreement terms reduce
    to contingency-cell and marginal C(k,2) sums — pure integer
    arithmetic from one label join."""
    edges = _edges(spark, sf_dir)
    sym = _sym(edges)
    comp = _copurchase_components(spark, sf_dir).select(
        F.col("node").alias("v"), F.col("comp").alias("c")
    )
    l = sym.select(F.col("src").alias("v")).distinct().select(
        "v", F.col("v").alias("lbl")
    )
    for _ in range(2):
        votes = (
            sym.join(
                F.broadcast(l.withColumnRenamed("v", "nbr")),
                F.col("dst") == F.col("nbr"),
            )
            .groupBy(F.col("src").alias("v"), "lbl")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        # Same one-aggregate vote winner as graph_label_propagation
        # (r9): max(struct(cnt, -lbl)) ≡ rank=1-by-count + min(lbl).
        l = (
            votes.groupBy("v")
            .agg(
                F.max(
                    F.struct(
                        F.col("cnt").alias("cnt"),
                        (-F.col("lbl")).alias("nl"),
                    )
                ).alias("m")
            )
            .select("v", (-F.col("m.nl")).alias("lbl"))
        )
    both = comp.join(l, "v").localCheckpoint()
    cell = both.groupBy("c", "lbl").agg(F.count(F.lit(1)).alias("k"))
    s_cell = cell.agg(
        F.sum(F.col("k") * (F.col("k") - 1) / 2)
        .cast("long")
        .alias("s_cell")
    )
    s_row = (
        both.groupBy("c")
        .agg(F.count(F.lit(1)).alias("a"))
        .agg(
            F.sum(F.col("a") * (F.col("a") - 1) / 2)
            .cast("long")
            .alias("s_row")
        )
    )
    s_col = (
        both.groupBy("lbl")
        .agg(F.count(F.lit(1)).alias("b"))
        .agg(
            F.sum(F.col("b") * (F.col("b") - 1) / 2)
            .cast("long")
            .alias("s_col")
        )
    )
    n_row = both.agg(F.count(F.lit(1)).alias("n_nodes"))
    j = (
        n_row.crossJoin(F.broadcast(s_cell))
        .crossJoin(F.broadcast(s_row))
        .crossJoin(F.broadcast(s_col))
    )
    s_tot = (F.col("n_nodes") * (F.col("n_nodes") - 1) / 2).cast(
        "long"
    )
    ri = (
        F.col("s_cell") + s_tot - F.col("s_row") - F.col("s_col")
        + F.col("s_cell")
    ).cast("double") / s_tot
    return j.select(
        "n_nodes", F.round(ri, 6).alias("rand_index")
    )


@register(
    "graph_clustering_coefficient",
    group="J",
    oracle=f"""
    with {_EDGE_CTE},
    e as (select pa, pb from edges),
    sym as (
      select pa as src from e union all select pb from e
    ),
    deg as (select src, cast(count(*) as bigint) as d from sym group by 1),
    tris as (
      select e1.pa as a, e1.pb as b, e2.pb as c
      from e e1
      join e e2 on e2.pa = e1.pb
      join e e3 on e3.pa = e1.pa and e3.pb = e2.pb
    ),
    tn as (
      select a as node from tris
      union all select b from tris
      union all select c from tris
    ),
    tcount as (
      select node, cast(count(*) as bigint) as t from tn group by 1
    ),
    loc as (
      select deg.src, deg.d, coalesce(t, 0) as t
      from deg left join tcount on deg.src = tcount.node
      where deg.d >= 2
    ),
    q as (
      select cast(count(*) as bigint) as n_nodes,
             cast(sum(cast(floor(2.0 * t / (d * (d - 1)) * 1e9 + 0.5)
                  as bigint)) as bigint) as s9,
             cast(sum(d * (d - 1)) as bigint) as wedges_x2,
             cast(sum(t) as bigint) as t3
      from loc
    )
    select n_nodes, t3 // 3 as n_triangles, wedges_x2 // 2 as n_wedges,
           round(cast(s9 as double) / 1e9 / n_nodes, 6) as avg_local_cc,
           round(2 * cast(t3 as double) / wedges_x2, 6) as transitivity
    from q
    """,
)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: clustering coefficients of the co-purchase graph — both
    the average LOCAL coefficient (mean over deg>=2 nodes of
    2*t_i/d_i(d_i-1)) and the GLOBAL transitivity (3*triangles /
    wedges), which answer different questions (local: 'are my
    neighbors connected'; global: wedge-closure probability — hub
    nodes dominate). Reuses graph_triangle_count's ordered-triple
    enumeration on the checkpointed support-pruned edge table (the
    oriented a<b<c join bounds intermediate size by the edge list's
    adjacency, the standard distributed-triangle trick); per-node
    coefficients are exact rationals nano-quantized before the
    cross-node sum, so no float accumulates in group order."""
    edges = _edges(spark, sf_dir)
    e = edges.select("pa", "pb")
    deg = (
        _sym(edges)
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tris = (
        e1.join(e2, F.col("e2.pa") == F.col("e1.pb"))
        .join(
            e3,
            (F.col("e3.pa") == F.col("e1.pa"))
            & (F.col("e3.pb") == F.col("e2.pb")),
        )
        .select(
            F.col("e1.pa").alias("a"),
            F.col("e1.pb").alias("b"),
            F.col("e2.pb").alias("c"),
        )
    )
    tn = (
        tris.select(F.col("a").alias("node"))
        .unionAll(tris.select(F.col("b").alias("node")))
        .unionAll(tris.select(F.col("c").alias("node")))
    )
    tcount = tn.groupBy("node").agg(F.count(F.lit(1)).alias("t"))
    loc = (
        deg.join(tcount, deg.src == tcount.node, "left")
        .select(
            "d", F.coalesce(F.col("t"), F.lit(0)).alias("t")
        )
        .filter(F.col("d") >= 2)
    )
    q = loc.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(
            F.floor(
                2.0
                * F.col("t")
                / (F.col("d") * (F.col("d") - 1))
                * 1e9
                + 0.5
            )
        ).alias("s9"),
        F.sum(F.col("d") * (F.col("d") - 1)).alias("wedges_x2"),
        F.sum("t").alias("t3"),
    )
    return q.select(
        "n_nodes",
        (F.col("t3") / 3).cast("long").alias("n_triangles"),
        (F.col("wedges_x2") / 2).cast("long").alias("n_wedges"),
        F.round(
            F.col("s9").cast("double") / 1e9 / F.col("n_nodes"), 6
        ).alias("avg_local_cc"),
        F.round(
            2 * F.col("t3").cast("double") / F.col("wedges_x2"), 6
        ).alias("transitivity"),
    )


@register(
    "graph_random_walks",
    group="J",
    oracle=f"""
    with {_EDGE_CTE},
    sym as (
      select pa as src, pb as dst from edges
      union all
      select pb as src, pa as dst from edges
    ),
    seeds as (
      select src as walk, src as cur
      from (select src, count(*) as deg from sym group by src)
      order by deg desc, src limit 10
    ),
    s1 as (
      select walk, dst as cur from (
        select s.walk, e.dst,
               row_number() over (partition by s.walk order by
                 md5(cast(s.walk as varchar) || '|1|' || cast(s.cur as varchar)
                     || '|' || cast(e.dst as varchar)), e.dst) as rn
        from seeds s join sym e on e.src = s.cur
      ) where rn = 1
    ),
    s2 as (
      select walk, dst as cur from (
        select s.walk, e.dst,
               row_number() over (partition by s.walk order by
                 md5(cast(s.walk as varchar) || '|2|' || cast(s.cur as varchar)
                     || '|' || cast(e.dst as varchar)), e.dst) as rn
        from s1 s join sym e on e.src = s.cur
      ) where rn = 1
    ),
    s3 as (
      select walk, dst as cur from (
        select s.walk, e.dst,
               row_number() over (partition by s.walk order by
                 md5(cast(s.walk as varchar) || '|3|' || cast(s.cur as varchar)
                     || '|' || cast(e.dst as varchar)), e.dst) as rn
        from s2 s join sym e on e.src = s.cur
      ) where rn = 1
    ),
    s4 as (
      select walk, dst as cur from (
        select s.walk, e.dst,
               row_number() over (partition by s.walk order by
                 md5(cast(s.walk as varchar) || '|4|' || cast(s.cur as varchar)
                     || '|' || cast(e.dst as varchar)), e.dst) as rn
        from s3 s join sym e on e.src = s.cur
      ) where rn = 1
    ),
    allv as (
      select walk, cur from seeds union all
      select walk, cur from s1 union all
      select walk, cur from s2 union all
      select walk, cur from s3 union all
      select walk, cur from s4
    )
    select cur as node,
           count(*) as n_visits,
           count(distinct walk) as n_walks
    from allv group by cur
    """,
)
def graph_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeepWalk-style random-walk sampling over the co-purchase graph
    (public method: Perozzi et al. 2014) with DETERMINISTIC hash-driven
    transitions: at step t the walk at node v moves to the neighbor
    minimizing md5(walk|t|v|neighbor) — a reproducible stand-in for a
    uniform draw that both engines replay bit-identically (the property
    a training pipeline needs to re-materialize walk corpora). Each
    step is one equi-join current-frontier ⋈ edges plus a per-walk
    argmin window; the frontier stays (walks × 1) rows, so 100 TB
    scale is walks-parallel — millions of independent walks, edge
    table hash-partitioned by src, per-step shuffle bounded by frontier
    size. Output is the node-visit histogram (the skip-gram corpus
    feed). Walk length 4, seeds = top-10 nodes by degree."""
    edges = _edges(spark, sf_dir)
    sym = edges.selectExpr("pa as src", "pb as dst").unionByName(
        edges.selectExpr("pb as src", "pa as dst")
    ).localCheckpoint()
    seeds = (
        sym.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .orderBy(F.col("deg").desc(), "src")
        .limit(10)
        .select(F.col("src").alias("walk"), F.col("src").alias("cur"))
    )
    frames = [seeds]
    cur = seeds
    for t in range(1, 5):
        coin = F.md5(
            F.concat(
                F.col("walk").cast("string"),
                F.lit(f"|{t}|"),
                F.col("cur").cast("string"),
                F.lit("|"),
                F.col("dst").cast("string"),
            )
        )
        # argmin aggregate ≡ row_number-over-(coin, dst) + rn=1 (r9,
        # guide §2.3): the pseudo-random neighbor pick is the MIN of
        # (coin, dst) per walk — one hash aggregate with map-side
        # partials instead of a per-walk sort of every (walk, neighbor)
        # candidate row, once per step.
        cur = (
            cur.join(sym, cur.cur == sym.src)
            .groupBy("walk")
            .agg(
                F.min(
                    F.struct(coin.alias("coin"), F.col("dst").alias("dst"))
                ).alias("m")
            )
            .select("walk", F.col("m.dst").alias("cur"))
        )
        frames.append(cur)
    allv = frames[0]
    for f in frames[1:]:
        allv = allv.unionByName(f)
    return allv.groupBy(F.col("cur").alias("node")).agg(
        F.count(F.lit(1)).alias("n_visits"),
        F.countDistinct("walk").alias("n_walks"),
    )
