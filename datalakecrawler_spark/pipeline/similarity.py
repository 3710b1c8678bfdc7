"""Group J (similarity) — embedding similarity search (SURVEY.md §2
J3/J4/J5/J13 + an IVF-bucketed ANN scale path).

Vectors are L2-normalized (FIXTURES.md: ‖v‖≈1.0) → cosine ≡ dot
product. Dot products are SQL-lambda folds over zip_with — JVM-side,
no Python boundary; floats cast to double before multiplication so
both engines accumulate identically (round(6) absorbs fold-order ulps).

Scale designs (SURVEY §4):
- top-k for ONE query (J3): broadcast the query row, per-partition
  local top-k then global TakeOrderedAndProject — no shuffle of the
  corpus.
- k-NN join (J4): broadcast the (small) query block against the
  corpus; at huge query counts, block the queries and union.
- all-pairs ≥ τ (J5): exact at fixture scale; at 100 TB the candidate
  generation must be bucketed (IVF below, or random-projection LSH) —
  the exact dot is then only computed within buckets.
- IVF (sim_topk_ivf): coarse-quantize corpus to nearest centroid once
  (one shuffle), probe the top-nprobe centroid buckets per query —
  the standard inverted-file ANN layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Row, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from datalakecrawler_spark.io import load
from datalakecrawler_spark.memo import memoized_checkpoint
from datalakecrawler_spark.registry import register

_PAIR_TAU = 0.4  # measured sf0.01 max pairwise sim ≈ 0.513 → small result


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two float arrays, accumulated in double."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


# DuckDB twin of dot() — usage: _DOT_SQL.format("a.embedding", "b.embedding")
_DOT_SQL = (
    "list_aggregate(list_transform(list_zip({0}, {1}), "
    "p -> cast(p[1] as double) * cast(p[2] as double)), 'sum')"
)


_TOPK_ORACLE = f"""
    with q as (select embedding as e from embeddings where vec_id = 0)
    select vec_id,
           round({_DOT_SQL.format('embedding', '(select e from q)')}, 6) as sim
    from embeddings where vec_id <> 0
    order by sim desc, vec_id limit 10
"""


def _topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    return (
        e.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", F.round(dot("embedding", "q_emb"), 6).alias("sim"))
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(10)
    )


@register("sim_topk_query", group="J", oracle=_TOPK_ORACLE)
def sim_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: top-10 cosine neighbors of query vector vec_id=0 (brute-force
    baseline; the scan is embarrassingly parallel, the limit is a
    TakeOrdered — nothing shuffles)."""
    return _topk_cosine(spark, sf_dir)


@register("embedding_topk_cosine", group="J", oracle=_TOPK_ORACLE)
def embedding_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Headline benchmark twin of J3 (BASELINE.md)."""
    return _topk_cosine(spark, sf_dir)


@register(
    "sim_knn_join",
    group="J",
    oracle=f"""
    select qid, vec_id, sim, rk from (
        select q.vec_id as qid, c.vec_id as vec_id,
               round({_DOT_SQL.format('q.embedding', 'c.embedding')}, 6) as sim,
               row_number() over (
                   partition by q.vec_id
                   order by round({_DOT_SQL.format('q.embedding', 'c.embedding')}, 6)
                            desc, c.vec_id) as rk
        from (select * from embeddings where vec_id < 5) q
        join (select * from embeddings where vec_id >= 5) c on true
    ) t where rk <= 3
    """,
)
def sim_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: k-NN join — top-3 corpus neighbors for each of 5 query
    vectors. The query block broadcasts; the corpus never shuffles
    (the window partitions by query id over the broadcast-joined
    product)."""
    e = load(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb")
    )
    c = e.where(F.col("vec_id") >= 5)
    scored = c.crossJoin(F.broadcast(q)).select(
        "qid", "vec_id", F.round(dot("embedding", "q_emb"), 6).alias("sim")
    )
    w = W.partitionBy("qid").orderBy(F.col("sim").desc(), "vec_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("qid", "vec_id", "sim", "rk")
    )


@register(
    "sim_pairwise_dups",
    group="J",
    oracle=f"""
    select a.vec_id as vec_a, b.vec_id as vec_b,
           round({_DOT_SQL.format('a.embedding', 'b.embedding')}, 6) as sim
    from embeddings a join embeddings b on a.vec_id < b.vec_id
    where round({_DOT_SQL.format('a.embedding', 'b.embedding')}, 6) >= {_PAIR_TAU}
    """,
)
def sim_pairwise_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: semantic near-dup pairs (cosine ≥ τ) — EXACT output via
    IVF-bucketed candidate generation with angular triangle-inequality
    bucket-pair pruning (VERDICT r1 "Next round" §4: no registered
    unbucketed O(N²) self-join).

    Plan: (1) assign every vector to its nearest (normalized) centroid
    bucket, recording its angle to the centroid; (2) per-bucket angular
    radius r_B = max angle; (3) a bucket pair (B1,B2) can contain a
    qualifying pair only if cos(max(0, θ(c1,c2) − r1 − r2)) ≥ τ — the
    spherical triangle inequality gives angle(a,b) ≥ θ(c1,c2) − r1 − r2
    for a∈B1, b∈B2, so pruned bucket pairs provably contain NO pair
    with cosine ≥ τ (a 1e-6 slack absorbs float error); (4) the pair
    scan is an equi-join on the surviving bucket-pair keys + exact
    verify. Same output as all-pairs, but the join co-partitions by
    bucket pair: with nlist ≈ √N k-means cells (_kmeans_cells — real
    cells since r4, not the 10 fixture labels whose radii passed every
    bucket pair), tight cells prune most of the (nlist²)/2 block grid
    and each surviving block is a partition-local product instead of a
    corpus-wide cartesian. The prune is provably lossless (step 3), so
    the pytest/driver parity gates prove output identity against the
    all-pairs oracle; SCALING.md's candidate-growth table records the
    measured candidate reduction per scale factor."""
    sim = F.round(dot("e_a", "e_b"), 6)
    return (
        _ivf_prune_candidates(spark, sf_dir)
        .withColumn("sim", sim)
        .where(F.col("sim") >= _PAIR_TAU)
        .select("vec_a", "vec_b", "sim")
    )


_KMEANS_CELL_MEMO: dict = {}
_EMB_DIM = 64


def _kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Lloyd k-means coarse quantizer (label, cvec) with
    nlist = max(10, ⌈√N⌉) cells — the pair-scan pruner's bucketing.

    The 10 fixture labels give angular radii so wide that the
    bucket-pair triangle-inequality prune passes every pair at every
    fixture SF (measured: candidates = N(N−1)/2 exactly — the r4
    SCALING candidate-growth table before this change). Real IVF uses
    nlist ≈ √N k-means cells precisely so cell radii SHRINK as the
    corpus grows; with them the prune engages at fixture scale and the
    candidate count grows ~N^1.5·occupancy, not N². Seeds are the
    nlist vectors with the smallest md5(vec_id) (deterministic,
    content-independent spread); 3 Lloyd rounds over a bounded
    TRAINING SAMPLE (r5, VERDICT r4 §3): the min(N, 128·nlist)
    vectors with the smallest md5(vec_id) — deterministic,
    content-independent, a superset of the seeds — so each round is
    128·nlist·nlist ≈ 128·N dot products (linear), not the N^1.5 of
    full-corpus training; 128 points/cell is squarely inside the
    public FAISS guidance of 30–256 training points per centroid.
    Each round is a broadcast crossJoin assignment + one 64-wide avg
    per cell, every round's tiny (≤nlist-row) centroid table
    localCheckpoint'ed. Correctness does NOT depend on sample choice,
    centroid quality, or float-sum order: the pruning bound in
    _ivf_prune_candidates is lossless for ANY centroid table because
    the radii come from the FULL corpus assignment against that same
    frozen table (trainer samples; the assigner never does). At the
    fixture SFs (N ≤ 2000 < 128·nlist) the sample is the whole corpus,
    so the candidate-growth table in SCALING.md is unchanged; the
    sampling path itself is pinned by
    tests/test_pipeline_semantics.py::test_ivf_sampled_trainer. nlist
    caps at the broadcast budget; the build is once-per-snapshot
    (memoized, like _label_centroids)."""
    return memoized_checkpoint(
        _KMEANS_CELL_MEMO, spark, sf_dir, lambda: _kmeans_cells_plan(spark, sf_dir)
    )


# public-knowledge default: FAISS recommends 30-256 training points
# per centroid; 128 bounds trainer work at ~128·N dots per round.
_TRAIN_PER_CELL = 128


def _kmeans_cells_plan(
    spark: SparkSession, sf_dir: str, train_per_cell: int = _TRAIN_PER_CELL
) -> DataFrame:
    import math

    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n = e.count()
    nlist = max(10, math.isqrt(max(n - 1, 0)) + 1)
    # deterministic md5-ordered training sample; the first nlist rows
    # double as the seeds (seed set ⊂ sample by construction)
    by_md5 = e.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
    samp = by_md5.limit(min(n, train_per_cell * nlist)).localCheckpoint()
    cents = (
        # re-sort the (sample-sized) frame for the seed take: row order
        # inside a checkpointed TakeOrdered result is not a contract
        samp.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(nlist)
        .select(F.col("vec_id").alias("label"), F.col("embedding").alias("cvec"))
        .localCheckpoint()
    )
    for _ in range(3):
        cnorm = F.sqrt(dot("cvec", "cvec"))
        cn = cents.select(
            "label", F.transform("cvec", lambda x: x / cnorm).alias("cvec")
        )
        # argmax via one hash aggregate (r9, guide §2.3): the former
        # row_number window shuffled + sorted all sample×nlist scored
        # rows; min(struct(-csim, label, …)) is the same winner —
        # min(-csim) = max csim, ties → min label — and partial
        # (map-side) aggregation reduces to one row per vec_id BEFORE
        # the exchange. Extra struct fields ride along untouched.
        assigned = (
            samp.crossJoin(F.broadcast(cn))
            .select(
                "vec_id", "embedding", "label", dot("embedding", "cvec").alias("csim")
            )
            .groupBy("vec_id")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("csim")).alias("nsim"),
                        F.col("label").alias("label"),
                        F.col("embedding").alias("embedding"),
                    )
                ).alias("m")
            )
            .select(
                "vec_id",
                F.col("m.embedding").alias("embedding"),
                F.col("m.label").alias("label"),
            )
        )
        cents = (
            assigned.groupBy("label")
            .agg(
                F.array(
                    *[
                        F.avg(F.col("embedding").getItem(i))
                        for i in range(_EMB_DIM)
                    ]
                ).alias("cvec")
            )
            .localCheckpoint()
        )
    return cents


def _ivf_prune_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF bucket-pair candidate pairs (pre-verify) for
    sim_pairwise_dups — steps 1-4 of the plan described there, up to
    but not including the exact-dot verify; also the SCALING.md
    candidate-growth probe for the IVF pruning family. Buckets are the
    √N-cell deterministic k-means quantizer (_kmeans_cells), not the
    10 fixture labels — see there for why.

    On the FIXTURE embeddings the prune survives 100% of bucket pairs
    at every SF, and that is the expected, honest result: the fixture
    vectors are isotropic on the 64-sphere (measured mean pairwise
    cos ≈ 1e-5 within AND across labels), and under isotropy every
    angle concentrates near 90°, so any radius-based bound collapses —
    no lossless metric bucketing can beat Θ(N²) there (exact high-dim
    similarity join is conjectured quadratic in the worst case; this
    is the worst case). The machinery is validated on clustered data
    in tests/test_pipeline_semantics.py::test_ivf_prune_engages_on_
    clustered_data, which drives _prune_candidates_for directly and
    asserts candidates ≪ all-pairs with identical output. Real
    embedding corpora are manifold-clustered, which is the regime the
    100 TB claim is about; for isotropic-like corpora the registered
    linear path is the approximate dedup_embedding_rplsh."""
    from datalakecrawler_spark.pipeline.dedup import _spread

    # _spread: the centroid-assignment pass does nlist 64-dim dots per
    # vector — compute-dense, must not run in one byte-sized partition
    e = _spread(
        load(spark, sf_dir, "embeddings").select("vec_id", "embedding"), "vec_id"
    )
    cents = _kmeans_cells(spark, sf_dir).select(
        F.col("label").alias("c_label"), "cvec"
    )
    return _prune_candidates_for(e, cents, _PAIR_TAU)


def _prune_candidates_for(
    e: DataFrame, cents: DataFrame, tau: float
) -> DataFrame:
    """Core of the lossless bucket-pair prune, parameterized on the
    (vec_id, embedding) table and (c_label, cvec) quantizer so the
    clustered-data unit test can drive it without fixture parquet.
    `e` must be unit-norm; centroids are normalized here."""
    # normalize centroids so dot(v, c) = cos(angle) for unit vectors v
    cnorm = F.sqrt(dot("cvec", "cvec"))
    cents_n = cents.select(
        "c_label",
        F.transform("cvec", lambda x: x / cnorm).alias("cvec"),
    )
    clamp = lambda c: F.least(F.lit(1.0), F.greatest(F.lit(-1.0), c))  # noqa: E731
    # 1. nearest-centroid assignment + angle to own centroid.
    # argmax as one hash aggregate (r9, guide §2.3): min(struct(-csim,
    # c_label, …)) ≡ the former row_number-over-(csim desc, c_label)
    # window with rk=1, but partial aggregation shrinks the corpus ×
    # nlist scored rows to one per vec_id BEFORE the exchange and no
    # sort is needed — at 100 TB the shuffle carries N rows, not
    # N·nlist. theta rides along (it is a row-local function of csim).
    assigned = (
        e.crossJoin(F.broadcast(cents_n))
        .select(
            "vec_id",
            "embedding",
            "c_label",
            F.acos(clamp(dot("embedding", "cvec"))).alias("theta"),
            dot("embedding", "cvec").alias("csim"),
        )
        .groupBy("vec_id")
        .agg(
            F.min(
                F.struct(
                    (-F.col("csim")).alias("nsim"),
                    F.col("c_label").alias("c_label"),
                    F.col("theta").alias("theta"),
                    F.col("embedding").alias("embedding"),
                )
            ).alias("m")
        )
        .select(
            "vec_id",
            F.col("m.embedding").alias("embedding"),
            F.col("m.c_label").alias("bucket"),
            F.col("m.theta").alias("theta"),
        )
        # three consumers (radii, both join sides) — assign once
        .localCheckpoint()
    )
    # 2. per-bucket angular radius (tiny: nlist rows)
    radii = assigned.groupBy("bucket").agg(F.max("theta").alias("radius"))
    # 3. bucket-pair pruning grid (nlist² rows — broadcast-scale)
    ca = cents_n.select(F.col("c_label").alias("ba"), F.col("cvec").alias("va"))
    cb = cents_n.select(F.col("c_label").alias("bb"), F.col("cvec").alias("vb"))
    # full (not triangular) grid: vec_a < vec_b does not order buckets,
    # so both (X,Y) and (Y,X) must survive for cross-bucket pairs.
    # Broadcast the right side: both sides are nlist-row centroid
    # tables (capped at the broadcast budget — see _kmeans_cells), so
    # the grid plans as a bounded BroadcastNestedLoopJoin instead of a
    # CartesianProduct whose partition count multiplies (r5 — keeps
    # the registry CartesianProduct-free for the plan lint).
    grid = (
        ca.crossJoin(F.broadcast(cb))
        .select("ba", "bb", F.acos(clamp(dot("va", "vb"))).alias("cangle"))
        .join(radii.select(F.col("bucket").alias("ba"), F.col("radius").alias("ra")), "ba")
        .join(radii.select(F.col("bucket").alias("bb"), F.col("radius").alias("rb")), "bb")
        .where(
            F.cos(F.greatest(F.lit(0.0), F.col("cangle") - F.col("ra") - F.col("rb")))
            >= F.lit(tau - 1e-6)
        )
        .select("ba", "bb")
    )
    # 4. equi-join on surviving bucket pairs + exact verify
    a = assigned.select(
        F.col("bucket").alias("ba"),
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("e_a"),
    )
    b = assigned.select(
        F.col("bucket").alias("bb"),
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("e_b"),
    )
    return (
        a.join(F.broadcast(grid), "ba")
        .join(b, "bb")
        .where(F.col("vec_a") < F.col("vec_b"))
    )


_CENTROID_MEMO: dict = {}


def _label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean vector via posexplode → (label, pos) decimal-avg →
    re-assemble sorted by position (all JVM-side, one shuffle).

    Memoized per (applicationId, sf_dir) as a localCheckpoint'ed
    ~nlist-row frame: five IVF/PQ-family operators start from the same
    centroid table (the stored coarse quantizer of a production ANN
    index), and the decimal-sum explode is the expensive part of each.
    Checkpointed RDDs die with the context — a fresh driver can never
    observe a stale entry; the memo is bounded with unpersist-on-evict
    (memo.py, ADVICE r3)."""
    return memoized_checkpoint(
        _CENTROID_MEMO, spark, sf_dir, lambda: _label_centroids_plan(spark, sf_dir)
    )


def _label_centroids_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    flat = e.select("label", F.posexplode("embedding").alias("pos", "v"))
    cent = flat.groupBy("label", "pos").agg(
        F.round(
            F.sum(F.col("v").cast("decimal(38,10)")).cast("double") / F.count("v"),
            6,
        ).alias("cv")
    )
    return cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cv"))),
            lambda s: s.cv,
        ).alias("cvec")
    )


_IVF_MEMO: dict = {}


def _ivf_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF inverted file: (vec_id, embedding, bucket) with bucket =
    nearest label-centroid (round-6 dot, label tie-break). Memoized and
    localCheckpoint'ed per (applicationId, sf_dir): sim_topk_ivf and
    sim_ivf_nprobe_sweep probe the same stored index, exactly as a
    production deployment quantizes the corpus once however many
    queries and tuning sweeps follow. The assignment pass is _spread
    first — nlist 64-dim dots per vector is compute-dense and must not
    run in one byte-sized scan partition."""
    return memoized_checkpoint(
        _IVF_MEMO, spark, sf_dir, lambda: _ivf_bucketed_plan(spark, sf_dir)
    )


def _ivf_bucketed_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalakecrawler_spark.pipeline.dedup import _spread

    e = _spread(
        load(spark, sf_dir, "embeddings").select("vec_id", "embedding"),
        "vec_id",
    )
    cents = _label_centroids(spark, sf_dir).select(
        F.col("label").alias("c_label"), "cvec"
    )
    # argmax aggregate ≡ row_number-over-(csim desc, c_label) + rk=1
    # (r9, guide §2.3 — map-side partials, no corpus×nlist shuffle/sort).
    # r10 (VERDICT r9 #1): csim is round(·, 6), so the order packs into
    # one bigint and a plain max() runs as HashAggregate (the r9
    # struct-min planned as SortAggregate and carried the full vector
    # through the map-side sort); the embedding re-attaches by the
    # unique vec_id, as in _assign_step.
    low = (
        e.crossJoin(F.broadcast(cents))
        .select(
            "vec_id",
            (
                F.round(F.round(dot("embedding", "cvec"), 6) * 1e6, 0)
                .cast("long")
                * F.lit(1 << 20).cast("long")
                + (
                    F.lit((1 << 20) - 1).cast("long")
                    - F.col("c_label").cast("long")
                )
            ).alias("__k"),
        )
        .groupBy("vec_id")
        .agg(F.max("__k").alias("__k"))
        .select(
            "vec_id",
            (
                F.lit((1 << 20) - 1).cast("long")
                - F.pmod(F.col("__k"), F.lit(1 << 20).cast("long"))
            ).cast("int").alias("bucket"),
        )
    )
    return low.join(e, "vec_id").select("vec_id", "embedding", "bucket")


_CENTROID_SQL = """
    with flat as (
        select label, unnest(range(len(embedding))) as pos,
               unnest(embedding) as v
        from embeddings
    ),
    cent as (
        select label, pos,
               round(cast(sum(cast(v as decimal(38,10))) as double)
                     / count(v), 6) as cv
        from flat group by 1, 2
    ),
    carr as (select label, list(cv order by pos) as cvec from cent group by label)
"""


@register(
    "cluster_assign_centroid",
    group="J",
    oracle=_CENTROID_SQL
    + f"""
    select vec_id, label as true_label, assigned_label from (
        select e.vec_id, e.label, c.label as assigned_label,
               row_number() over (
                   partition by e.vec_id
                   order by round({_DOT_SQL.format('e.embedding', 'c.cvec')}, 6)
                            desc, c.label) as rk
        from embeddings e cross join carr c
    ) t where rk = 1
    """,
)
def cluster_assign_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J13: one k-means assignment step — nearest label-centroid per
    vector (argmax dot, label tie-break). Centroids broadcast (10 rows);
    the corpus scan is shuffle-free (spread to full parallelism — the
    nlist dots per vector are compute-dense)."""
    from datalakecrawler_spark.pipeline.dedup import _spread

    e = _spread(load(spark, sf_dir, "embeddings"), "vec_id")
    cents = _label_centroids(spark, sf_dir).select(
        F.col("label").alias("c_label"), "cvec"
    )
    scored = e.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        F.col("label").alias("true_label"),
        F.col("c_label"),
        F.round(dot("embedding", "cvec"), 6).alias("sim"),
    )
    # argmax aggregate ≡ row_number-over-(sim desc, c_label) + rk=1
    # (r9, guide §2.3). r10 (VERDICT r9 #1): the r9 min(struct(...))
    # form planned as SortAggregate — Spark cannot hash-aggregate a
    # struct min/max buffer — so the map side still sorted the full
    # corpus×nlist fanout. sim is round(·, 6), i.e. an exact multiple
    # of 1e-6 with |sim| ≤ 1, so (sim desc, c_label asc) bit-packs
    # into ONE bigint: sim_int·2^40 + (2^20-1-c_label)·2^20 +
    # true_label (true_label is constant within a vec_id group — one
    # embedding row per vec_id — so it rides in the low bits without
    # affecting the order; labels are quantizer/class ids < 2^20).
    # max(bigint) is a plain hash-aggregable primitive buffer: the
    # same winner, now with HashAggregate partials and no sort.
    key = (
        F.round(F.col("sim") * 1e6, 0).cast("long") * F.lit(1 << 40).cast("long")
        + (F.lit((1 << 20) - 1).cast("long") - F.col("c_label").cast("long"))
        * F.lit(1 << 20).cast("long")
        + F.col("true_label").cast("long")
    )
    low = scored.select("vec_id", key.alias("__k")).groupBy("vec_id").agg(
        F.max("__k").alias("__k")
    )
    r = F.pmod(F.col("__k"), F.lit(1 << 40).cast("long"))
    return low.select(
        "vec_id",
        F.pmod(r, F.lit(1 << 20).cast("long")).cast("int").alias("true_label"),
        (
            F.lit((1 << 20) - 1).cast("long")
            - F.shiftright(r, 20)
        ).cast("int").alias("assigned_label"),
    )


@register(
    "sim_topk_ivf",
    group="J",
    oracle=_CENTROID_SQL
    + f""",
    bucketed as (
        select vec_id, embedding, bucket from (
            select e.vec_id, e.embedding, c.label as bucket,
                   row_number() over (
                       partition by e.vec_id
                       order by round({_DOT_SQL.format('e.embedding', 'c.cvec')}, 6)
                                desc, c.label) as rk
            from embeddings e cross join carr c
        ) t where rk = 1
    ),
    q as (select embedding as q_emb from embeddings where vec_id = 0),
    probes as (
        select label as bucket
        from carr cross join q
        order by round({_DOT_SQL.format('cvec', 'q_emb')}, 6) desc, label
        limit 3
    )
    select vec_id, bucket,
           round({_DOT_SQL.format('b.embedding', 'q.q_emb')}, 6) as sim
    from bucketed b join probes using (bucket) cross join q
    where vec_id <> 0
    order by sim desc, vec_id limit 10
    """,
)
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed approximate top-k (the ANN scale path for J3):
    1. coarse-quantize the corpus to its nearest label-centroid
       (one-time, one shuffle — the "inverted file");
    2. the query probes its top-3 centroids and scans ONLY those
       buckets (~30% of the corpus here; 1/nlist·nprobe in general).
    FULLY oracle-checked (promoted round 3): centroids are
    decimal-summed round-6 label means (the cluster_assign_centroid
    twin), bucket assignment / probe selection / final top-10 are all
    totally ordered by (round-6 sim desc, id) — so the whole
    approximate index, not just its recall, is value-checked against
    the DuckDB twin. Tests additionally assert recall vs exact J3.
    """
    e = load(spark, sf_dir, "embeddings")
    cents = _label_centroids(spark, sf_dir).select(
        F.col("label").alias("c_label"), "cvec"
    )
    # corpus → bucket assignment: the memoized stored inverted file
    bucketed = _ivf_bucketed(spark, sf_dir)
    # query probes its 3 nearest centroids
    q = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    probes = (
        cents.crossJoin(F.broadcast(q))
        .select("c_label", F.round(dot("cvec", "q_emb"), 6).alias("qsim"))
        .orderBy(F.col("qsim").desc(), "c_label")
        .limit(3)
        .select(F.col("c_label").alias("bucket"))
    )
    return (
        bucketed.join(F.broadcast(probes), "bucket")
        .where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id", "bucket", F.round(dot("embedding", "q_emb"), 6).alias("sim")
        )
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(10)
    )


@register("sim_ann_brp_lsh", group="J", oracle=None)
def sim_ann_brp_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: ANN candidate pairs via pyspark.ml
    BucketedRandomProjectionLSH — the battle-tested library scale path
    next to the hand-rolled RP-LSH (dedup_embedding_rplsh) and IVF
    (sim_topk_ivf). approxSimilarityJoin hashes both sides into
    random-projection buckets and joins bucket-local, so the candidate
    join is linear in bucket occupancy, not quadratic in corpus size;
    the exact euclidean distance is verified post-join.

    Rows-only, and irreducibly so (r6, closing VERDICT r5 item 5): the
    output is candidates ∩ {dist ≤ τ}, and candidate membership is
    decided by pyspark.ml's PRIVATE seeded hash family (randUnitVectors
    drawn from the JVM RNG — not exposed to Python, not reproducible in
    SQL). Measured recall on the fixtures is high but not 1.0 (363/365
    true pairs at sf0.01, 5650/5669 at sf0.1, 0 spurious at both), so
    no SQL-computable pair set — neither the exact set nor any
    deterministic reformulation — equals this output; an exact-pair
    oracle would be a false mismatch, and a hand-rolled deterministic
    hash would be a different operator (that one exists and IS
    hash-matched: dedup_embedding_rplsh, with its index-level bucket
    oracle). pytest pins what is checkable: zero false positives,
    exact distances, and recall ≥ threshold vs the exact set."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    from datalakecrawler_spark.pipeline.dedup import _spread

    e = load(spark, sf_dir, "embeddings")
    # _spread: approxSimilarityJoin explodes each row per hash table
    # and computes projections + exact distances; a 1-split corpus
    # would run that whole pipeline serially.
    v = _spread(
        e.select(
            "vec_id",
            array_to_vector(F.col("embedding").cast("array<double>")).alias(
                "vec"
            ),
        ),
        "vec_id",
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="vec", outputCol="hashes",
        bucketLength=2.0, numHashTables=6, seed=42,
    )
    model = lsh.fit(v)
    pairs = model.approxSimilarityJoin(v, v, 1.15, distCol="dist")
    return (
        pairs.where(F.col("datasetA.vec_id") < F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("vec_a"),
            F.col("datasetB.vec_id").alias("vec_b"),
            F.round("dist", 6).alias("dist"),
        )
    )


_SEM_TAU = 0.45  # fixtures' max pairwise sim ≈ 0.513 → small drop set


@register(
    "dedup_semdedup",
    group="J",
    oracle=f"""
    with pairs as (
        select a.label, b.vec_id as dropped
        from embeddings a join embeddings b
          on a.label = b.label and a.vec_id < b.vec_id
        where round({_DOT_SQL.format('a.embedding', 'b.embedding')}, 6)
              >= {_SEM_TAU}
    ),
    d as (
        select label, count(distinct dropped) as n_dropped
        from pairs group by 1
    ),
    n as (select label, count(*) as n_vecs from embeddings group by 1)
    select n.label, n.n_vecs, coalesce(d.n_dropped, 0) as n_dropped,
           n.n_vecs - coalesce(d.n_dropped, 0) as n_kept
    from n left join d using (label)
    """,
)
def dedup_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: SemDeDup-style semantic dedup (Abbas et al. 2023, public):
    within each cluster (label standing in for the k-means cell), drop
    every vector whose cosine to a LOWER-id vector exceeds τ — the
    deterministic keep-min policy. The pairwise comparison is confined
    to cluster blocks (equi-join on label), the exact analogue of
    SemDeDup's intra-cluster pruning: quadratic only within cells, never
    across the corpus. At 100 TB the labels come from a k-means fit
    (cluster_assign_centroid) and cells are shuffle partitions; the
    per-cell pair scan parallelizes per cluster."""
    from datalakecrawler_spark.pipeline.dedup import _spread

    e = load(spark, sf_dir, "embeddings")
    # _spread: the probe side streams through a broadcast hash join
    # doing a 64-dim dot per candidate pair; the corpus arrives as one
    # parquet split, which would run that compute-dense scan serially.
    a = _spread(
        e.select(
            "label", F.col("vec_id").alias("ida"), F.col("embedding").alias("ea")
        )
    )
    b = e.select(
        F.col("label").alias("lb"), F.col("vec_id").alias("idb"),
        F.col("embedding").alias("eb"),
    )
    pairs = a.join(
        b, (F.col("label") == F.col("lb")) & (F.col("ida") < F.col("idb"))
    ).where(F.round(dot("ea", "eb"), 6) >= _SEM_TAU)
    d = pairs.groupBy("label").agg(F.countDistinct("idb").alias("n_dropped"))
    n = e.groupBy("label").agg(F.count(F.lit(1)).alias("n_vecs"))
    return n.join(d, "label", "left").select(
        "label",
        "n_vecs",
        F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
        (F.col("n_vecs") - F.coalesce("n_dropped", F.lit(0))).alias("n_kept"),
    )


_KMEANS_ORACLE = f"""
    with flat as (
        select label, unnest(range(len(embedding))) as pos,
               unnest(embedding) as v
        from embeddings
    ),
    cent0 as (
        select label, pos,
               round(cast(sum(cast(v as decimal(38,10))) as double)
                     / count(v), 6) as cv
        from flat group by 1, 2
    ),
    carr0 as (
        select label as c, list(cv order by pos) as cvec from cent0 group by 1
    ),
    a1 as (
        select vec_id, c as assigned from (
            select e.vec_id, c.c,
                   row_number() over (partition by e.vec_id
                       order by round({_DOT_SQL.format('e.embedding', 'c.cvec')},
                                      6) desc, c.c) as rk
            from embeddings e cross join carr0 c
        ) t where rk = 1
    ),
    flat1 as (
        select a1.assigned, unnest(range(len(e.embedding))) as pos,
               unnest(e.embedding) as v
        from embeddings e join a1 using (vec_id)
    ),
    cent1 as (
        select assigned, pos,
               round(cast(sum(cast(v as decimal(38,10))) as double)
                     / count(v), 6) as cv
        from flat1 group by 1, 2
    ),
    carr1 as (
        select assigned as c, list(cv order by pos) as cvec from cent1 group by 1
    ),
    a2 as (
        select vec_id, c as assigned, sim from (
            select e.vec_id, c.c,
                   round({_DOT_SQL.format('e.embedding', 'c.cvec')}, 6) as sim,
                   row_number() over (partition by e.vec_id
                       order by round({_DOT_SQL.format('e.embedding', 'c.cvec')},
                                      6) desc, c.c) as rk
            from embeddings e cross join carr1 c
        ) t where rk = 1
    )
    select assigned as cluster, count(*) as n_members,
           round(cast(sum(cast(floor(sim * 1e6 + 0.5) as bigint)) as double)
                 / count(*) / 1e6, 6) as avg_sim
    from a2 group by 1
"""


def _assign_step(e: DataFrame, cents: DataFrame) -> DataFrame:
    """One Lloyd assignment: nearest centroid by rounded dot, label
    tie-break. Centroids broadcast; corpus side shuffle-free.

    r10 (VERDICT r9 #1): the r9 min(struct(-sim, c_label, embedding))
    form planned as SortAggregate — struct buffers are not
    hash-aggregable — and every one of the corpus×k scored rows
    carried the full 64-float embedding through the map-side sort.
    sim is round(·, 6) (an exact multiple of 1e-6, |sim| ≤ 1), so the
    (sim desc, c_label asc) order packs into one bigint:
    sim_int·2^20 + (2^20-1 − c_label). max(bigint) keeps the identical
    winner (c_label is unique per scored row within a vec_id group, so
    keys never tie) with HashAggregate partials, no sort, and the
    scored rows narrowed to (vec_id, key) — the embedding no longer
    rides through the aggregation at all (the Lloyd update re-attaches
    it by vec_id: _update_step). Decode is exact: sim_int = key >> 20
    (arithmetic shift = floor division, low field is non-negative) and
    sim_int/1e6 is the correctly-rounded double round(dot, 6) again."""
    scored = e.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        (
            F.round(F.round(dot("embedding", "cvec"), 6) * 1e6, 0).cast("long")
            * F.lit(1 << 20).cast("long")
            + (F.lit((1 << 20) - 1).cast("long") - F.col("c_label").cast("long"))
        ).alias("__k"),
    )
    low = scored.groupBy("vec_id").agg(F.max("__k").alias("__k"))
    return low.select(
        "vec_id",
        (
            F.lit((1 << 20) - 1).cast("long")
            - F.pmod(F.col("__k"), F.lit(1 << 20).cast("long"))
        ).cast("int").alias("assigned"),
        (F.shiftright(F.col("__k"), 20).cast("double") / 1e6).alias("sim"),
    )


def _update_step(assigned: DataFrame, e: DataFrame) -> DataFrame:
    """One Lloyd update: per-cluster decimal-exact mean per position,
    re-assembled into centroid arrays (same shape as _label_centroids).
    ``assigned`` is the narrow (vec_id, assigned) frame from
    _assign_step; the embedding is re-attached by the unique vec_id
    (r10 — the assignment aggregate no longer carries the vector, so
    its shuffle and aggregation buffers stay primitive)."""
    flat = assigned.select("vec_id", "assigned").join(
        e.select("vec_id", "embedding"), "vec_id"
    ).select("assigned", F.posexplode("embedding").alias("pos", "v"))
    cent = flat.groupBy("assigned", "pos").agg(
        F.round(
            F.sum(F.col("v").cast("decimal(38,10)")).cast("double") / F.count("v"),
            6,
        ).alias("cv")
    )
    return cent.groupBy("assigned").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cv"))), lambda s: s.cv
        ).alias("cvec")
    ).select(F.col("assigned").alias("c_label"), "cvec")


@register("cluster_kmeans_lloyd", group="J", oracle=_KMEANS_ORACLE)
def cluster_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: iterative k-means — two full Lloyd rounds (assign →
    update → assign) as a pure DataFrame loop, initialized from the
    label centroids. Each iteration is: broadcast the k centroid arrays
    (k·d doubles — tiny), shuffle-free scored scan, one posexplode
    shuffle keyed (cluster, pos) for the update. The driver never sees
    a vector; iteration count is a Python loop over lazy plans, the
    standard Spark pattern for fixed-point algorithms (MLlib KMeans
    does the same with sampling tricks). The DuckDB oracle unrolls the
    same two rounds as CTEs, so even the ITERATIVE path is
    hash-checked, not just smoke-tested. At 100 TB: cache the corpus
    between rounds, checkpoint every ~10 iterations to cut lineage."""
    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = _label_centroids(spark, sf_dir).select(
        F.col("label").alias("c_label"), "cvec"
    )
    a1 = _assign_step(e, cents)
    cents1 = _update_step(a1, e)
    a2 = _assign_step(e, cents1)
    return a2.groupBy(F.col("assigned").alias("cluster")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.round(
            F.sum(F.floor(F.col("sim") * 1e6 + 0.5)).cast("double")
            / F.count(F.lit(1))
            / 1e6,
            6,
        ).alias("avg_sim"),
    )


_RANGE_TAU = 0.25  # measured sf0.01: 14 corpus vectors within this radius of vec 0


@register(
    "sim_range_search",
    group="J",
    oracle=f"""
    with q as (select embedding as e from embeddings where vec_id = 0)
    select vec_id,
           round({_DOT_SQL.format('embedding', '(select e from q)')}, 6) as sim
    from embeddings
    where vec_id <> 0
      and round({_DOT_SQL.format('embedding', '(select e from q)')}, 6)
          >= {_RANGE_TAU}
    """,
)
def sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: radius (range) similarity search — ALL corpus vectors
    with cosine ≥ τ to the query, the fixed-threshold complement of
    J3's top-k (retrieval APIs expose both). Same scale shape as J3:
    the query row is broadcast, the corpus is scanned once with a
    per-row dot + filter and never shuffled — the result is the only
    thing that moves. At 100 TB an IVF/LSH pre-filter bounds the
    scanned buckets exactly as in sim_topk_ivf."""
    e = load(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    return (
        e.where(F.col("vec_id") != 0)
        .join(F.broadcast(q))
        .select("vec_id", F.round(dot("embedding", "qe"), 6).alias("sim"))
        .where(F.col("sim") >= _RANGE_TAU)
    )


_PQ_L2 = (
    "list_aggregate(list_transform(list_zip({0}, {1}), "
    "p -> cast((p[1] - p[2]) * (p[1] - p[2]) as double)), 'sum')"
)


@register(
    "sim_topk_pq",
    group="J",
    oracle=f"""
    with sub as (
        select vec_id, mm.m, embedding[mm.m * 8 + 1 : mm.m * 8 + 8] as sub
        from embeddings, range(8) mm(m)
    ),
    anchors as (
        select m, hr - 1 as code, sub as avec from (
            select m, sub,
                   row_number() over (
                       partition by m
                       order by md5(vec_id || '|' || m), vec_id) as hr
            from sub) t
        where hr <= 16
    ),
    codes as (
        select vec_id, m, code from (
            select s.vec_id, s.m, a.code,
                   row_number() over (
                       partition by s.vec_id, s.m
                       order by {_PQ_L2.format('s.sub', 'a.avec')}, a.code) as rk
            from sub s join anchors a using (m)) t
        where rk = 1
    ),
    q as (
        select mm.m, embedding[mm.m * 8 + 1 : mm.m * 8 + 8] as qsub
        from embeddings, range(8) mm(m)
        where vec_id = 0
    ),
    dist as (
        select a.m, a.code,
               {_DOT_SQL.format('q.qsub', 'a.avec')} as psim
        from anchors a join q using (m)
    ),
    approx as (
        select c.vec_id,
               sum(cast(floor(d.psim * 1e12 + 0.5) as bigint)) as ps
        from codes c join dist d using (m, code)
        where c.vec_id <> 0
        group by 1
        order by ps desc, vec_id limit 50
    ),
    qf as (select embedding as q_emb from embeddings where vec_id = 0)
    select a.vec_id,
           round(cast(a.ps as double) / 1e12, 6) as approx_sim,
           round({_DOT_SQL.format('e.embedding', 'qf.q_emb')}, 6) as sim
    from approx a
    join embeddings e using (vec_id)
    cross join qf
    order by sim desc, a.vec_id limit 10
    """,
)
def sim_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization approximate top-k — the third ANN scale
    path beside IVF (sim_topk_ivf) and random-projection LSH
    (sim_ann_brp_lsh), and the one with the smallest memory footprint:
    each 64-d vector compresses to M=8 one-byte codes.

    1. Split dimensions into 8 subspaces of 8; per subspace pick 16
       anchor vectors by smallest portable hash (md5(vec_id|m) — the
       deterministic equivalent of k-means' random-sample init, so
       both engines/runs see identical codebooks).
    2. Encode: every vector's subspace slice → nearest anchor slice
       (argmin L2 over a broadcast 128-row codebook).
    3. Asymmetric-distance query: because the corpus is L2-normalized,
       cosine decomposes as the sum of per-subspace dots — the query
       precomputes dot(query_slice, anchor_slice) for all 128 anchors
       (the "distance table"), and each vector's approximate sim is a
       lookup-sum over its 8 codes.
    4. Exact re-rank of the approximate top-50 → final top-10.

    At 100 TB the codes table is 8 bytes/vector (vs 256 for floats),
    the distance table broadcast is KBs, and the only data-sized
    shuffle is the groupBy(vec_id) over 8 rows/vector; re-rank
    touches 50 full vectors. FULLY oracle-checked (promoted round 3):
    md5-ranked anchor selection, float-exact L2 encoding, and the
    integer pico-unit lookup-sum make codebooks, codes, the top-50
    shortlist and the re-ranked top-10 all deterministic and
    reproduced by the DuckDB twin; the property test additionally
    measures recall against the exact scan (J3)."""
    from datalakecrawler_spark.pipeline.dedup import _spread

    # _spread: the encode join evaluates K per-subspace L2 distances
    # per (vector, subspace) row against the broadcast codebook; a
    # 1-split corpus would encode serially.
    e = _spread(load(spark, sf_dir, "embeddings"), "vec_id")
    M, SUBD, K = 8, 8, 16
    sub = (
        e.select(
            "vec_id",
            F.explode(F.sequence(F.lit(0), F.lit(M - 1))).alias("m"),
            "embedding",
        )
        .select(
            "vec_id",
            "m",
            F.expr(f"slice(embedding, m * {SUBD} + 1, {SUBD})").alias("sub"),
        )
    )
    hrank = W.partitionBy("m").orderBy(
        F.md5(F.concat_ws("|", F.col("vec_id"), F.col("m"))), "vec_id"
    )
    anchors = (
        sub.withColumn("hr", F.row_number().over(hrank))
        .where(F.col("hr") <= K)
        .select(
            "m", (F.col("hr") - 1).alias("code"), F.col("sub").alias("avec")
        )
    )
    l2 = lambda a, b: F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v.cast("double"),
    )
    # argmin aggregate ≡ row_number-over-(d2, code) + rk=1 (r9, guide
    # §2.3): nearest PQ anchor per (vector, subspace) via one hash
    # aggregate — map-side partials, no sort of the ×16-anchor fanout.
    codes = (
        sub.join(F.broadcast(anchors), "m")
        .select("vec_id", "m", "code", l2("sub", "avec").alias("d2"))
        .groupBy("vec_id", "m")
        .agg(
            F.min(
                F.struct(F.col("d2").alias("d2"), F.col("code").alias("code"))
            ).alias("mm")
        )
        .select("vec_id", "m", F.col("mm.code").alias("code"))
    )
    q = e.where(F.col("vec_id") == 0).select(
        F.explode(F.sequence(F.lit(0), F.lit(M - 1))).alias("m"),
        F.col("embedding").alias("q_emb"),
    ).select(
        "m", F.expr(f"slice(q_emb, m * {SUBD} + 1, {SUBD})").alias("qsub")
    )
    dist_table = (
        anchors.join(F.broadcast(q), "m")
        .select("m", "code", dot("qsub", "avec").alias("psim"))
    )
    # per-vector lookup-sum in exact integer pico-units: a plain double
    # sum's partial-agg order varies run to run and a boundary ulp could
    # flip top-50 membership (and the round-6 output); the quantized
    # integer sum is order-independent and engine-identical.
    approx = (
        codes.where(F.col("vec_id") != 0)
        .join(F.broadcast(dist_table), ["m", "code"])
        .groupBy("vec_id")
        .agg(F.sum(F.floor(F.col("psim") * 1e12 + 0.5)).alias("ps"))
        .orderBy(F.col("ps").desc(), "vec_id")
        .limit(50)
        .select("vec_id", (F.col("ps").cast("double") / 1e12).alias("approx_sim"))
    )
    qfull = e.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb")
    )
    return (
        approx.join(e, "vec_id")
        .crossJoin(F.broadcast(qfull))
        .select(
            "vec_id",
            F.round("approx_sim", 6).alias("approx_sim"),
            F.round(dot("embedding", "q_emb"), 6).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(10)
    )


@register(
    "sim_recall_eval",
    group="J",
    oracle=_CENTROID_SQL
    + f""",
    qv as (select embedding as q_emb from embeddings where vec_id = 0),
    exact as (
        select vec_id from embeddings cross join qv
        where vec_id <> 0
        order by round({_DOT_SQL.format('embedding', 'q_emb')}, 6) desc, vec_id
        limit 10
    ),
    ivf_bucketed as (
        select vec_id, embedding, bucket from (
            select e.vec_id, e.embedding, c.label as bucket,
                   row_number() over (
                       partition by e.vec_id
                       order by round({_DOT_SQL.format('e.embedding', 'c.cvec')}, 6)
                                desc, c.label) as rk
            from embeddings e cross join carr c
        ) t where rk = 1
    ),
    ivf_probes as (
        select label as bucket from carr cross join qv
        order by round({_DOT_SQL.format('cvec', 'q_emb')}, 6) desc, label
        limit 3
    ),
    ivf_top as (
        select b.vec_id
        from ivf_bucketed b join ivf_probes using (bucket) cross join qv
        where b.vec_id <> 0
        order by round({_DOT_SQL.format('b.embedding', 'q_emb')}, 6) desc,
                 b.vec_id
        limit 10
    ),
    pq_sub as (
        select vec_id, mm.m, embedding[mm.m * 8 + 1 : mm.m * 8 + 8] as sub
        from embeddings, range(8) mm(m)
    ),
    pq_anchors as (
        select m, hr - 1 as code, sub as avec from (
            select m, sub,
                   row_number() over (
                       partition by m
                       order by md5(vec_id || '|' || m), vec_id) as hr
            from pq_sub) t
        where hr <= 16
    ),
    pq_codes as (
        select vec_id, m, code from (
            select s.vec_id, s.m, a.code,
                   row_number() over (
                       partition by s.vec_id, s.m
                       order by {_PQ_L2.format('s.sub', 'a.avec')}, a.code) as rk
            from pq_sub s join pq_anchors a using (m)) t
        where rk = 1
    ),
    pq_q as (
        select mm.m, embedding[mm.m * 8 + 1 : mm.m * 8 + 8] as qsub
        from embeddings, range(8) mm(m)
        where vec_id = 0
    ),
    pq_dist as (
        select a.m, a.code, {_DOT_SQL.format('q.qsub', 'a.avec')} as psim
        from pq_anchors a join pq_q q using (m)
    ),
    pq_approx as (
        select c.vec_id,
               sum(cast(floor(d.psim * 1e12 + 0.5) as bigint)) as ps
        from pq_codes c join pq_dist d using (m, code)
        where c.vec_id <> 0
        group by 1
        order by ps desc, vec_id limit 50
    ),
    pq_top as (
        select a.vec_id
        from pq_approx a join embeddings e using (vec_id) cross join qv
        order by round({_DOT_SQL.format('e.embedding', 'q_emb')}, 6) desc,
                 a.vec_id
        limit 10
    )
    select 'ivf' as method,
           round((select count(*) from ivf_top join exact using (vec_id))
                 / 10.0, 4) as recall_at_10
    union all
    select 'pq',
           round((select count(*) from pq_top join exact using (vec_id))
                 / 10.0, 4)
    """,
)
def sim_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluation-as-operator: recall@10 of every approximate ANN path
    (IVF, BRP-LSH is pair-based so excluded, PQ) against the exact
    brute-force top-10 for the standard query vector. Shipping the
    evaluator as a first-class operator means an index-tuning sweep is
    itself a Spark job — at scale you'd parameterize over many query
    vectors and aggregate recall distributions instead of one query's
    set overlap. Set intersection happens on 10-row frames; everything
    upstream reuses the registered operators' plans unchanged.
    FULLY oracle-checked (promoted round 3): both evaluated index
    paths are deterministic (see sim_topk_ivf / sim_topk_pq), so the
    DuckDB twin recomputes both approximate top-10 sets AND the exact
    set and reports the identical recalls."""
    exact = set(
        r["vec_id"]
        for r in _topk_cosine(spark, sf_dir).select("vec_id").collect()
    )

    def recall(df: DataFrame) -> float:
        got = set(r["vec_id"] for r in df.select("vec_id").collect())
        return len(got & exact) / max(1, len(exact))

    from datalakecrawler_spark import registry as _r

    rows = [
        Row(method="ivf", recall_at_10=recall(
            _r.all_queries()["sim_topk_ivf"].fn(spark, sf_dir))),
        Row(method="pq", recall_at_10=recall(
            _r.all_queries()["sim_topk_pq"].fn(spark, sf_dir))),
    ]
    return spark.createDataFrame(rows)


# Per-ranker emission depth for RRF. 1200 is the exactness-style bound
# for a fused top-20 at k=60 (a doc absent from BOTH top-1200 lists
# scores < 2/(60+1200) — below any pair of in-list ranks that deep),
# and it is comfortably above every production fusion depth (rankers
# typically emit top-100..1000).
_RRF_N = 1200


@register(
    "search_rrf_fusion",
    group="J",
    oracle=f"""
    with sem as (
      select id, r_sem from (
        select vec_id as id,
               row_number() over (
                   order by round({_DOT_SQL.format('embedding',
                       "(select embedding from embeddings where vec_id = 0)")}, 6)
                            desc, vec_id) as r_sem
        from embeddings where vec_id <> 0
      ) where r_sem <= {_RRF_N}
    ),
    lex as (
      select id, r_lex from (
        select doc_id as id,
               row_number() over (
                   order by len(list_filter(string_split(lower(text), ' '),
                                t -> t = 'spark')) desc, doc_id) as r_lex
        from documents where doc_id <> 0
      ) where r_lex <= {_RRF_N}
    )
    select id, r_sem, r_lex,
           round(coalesce(1.0 / (60 + r_sem), 0)
                 + coalesce(1.0 / (60 + r_lex), 0), 6) as rrf_score
    from sem full outer join lex using (id)
    order by rrf_score desc, id
    limit 20
    """,
)
def search_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: hybrid retrieval via Reciprocal Rank Fusion — the
    standard way a RAG/data-curation pipeline combines a semantic
    ranker (embedding cosine) with a lexical ranker (keyword term
    frequency) without score calibration: each ranker contributes
    1/(k + rank), k = 60 (Cormack et al.'s constant), so rankings on
    incomparable scales fuse by position only. Ranker A orders by
    cosine to query vector 0, ranker B by tf of the term 'spark';
    both rank with a deterministic id tie-break, so the fused
    ordering is engine-identical.

    Registered contract (r5, VERDICT r4 §1): the PRODUCTION fusion
    shape — each ranker emits only its top-N (N = _RRF_N = 1200) via
    ``orderBy().limit(N)``, which Spark plans as TakeOrderedAndProject
    (distributed per-partition top-N + merge, never a full-corpus
    single-partition window); the rank-within-list window then runs
    over an N-bounded frame (a GlobalLimit sits below it — the plan
    lint recognizes limit-bounded global windows as safe). Fusion is
    a full-outer join of the two ≤N-row lists: a doc outside one
    list contributes nothing from that ranker (NULL rank, 0 score
    term) — exactly how Elasticsearch/Vespa-style hybrid RRF scores
    union candidates. At every scale the data-proportional work is
    the two top-N jobs; the fusion itself is O(N). At sf0.001/0.01
    (≤500 docs < N) the result is identical to full-corpus fusion;
    the DuckDB oracle computes the same top-N contract."""
    e = load(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    sem = (
        e.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("id"),
            F.round(dot("embedding", "q_emb"), 6).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), "id")
        .limit(_RRF_N)  # TakeOrdered — the ranker's bounded emission
        .withColumn(
            "r_sem",  # window over ≤N rows (GlobalLimit below it)
            F.row_number().over(W.orderBy(F.col("sim").desc(), "id")),
        )
        .select("id", "r_sem")
    )
    d = load(spark, sf_dir, "documents")
    tf = F.size(
        F.filter(F.split(F.lower("text"), " "), lambda t: t == F.lit("spark"))
    )
    lex = (
        d.where(F.col("doc_id") != 0)
        .select(F.col("doc_id").alias("id"), tf.alias("tf"))
        .orderBy(F.col("tf").desc(), "id")
        .limit(_RRF_N)
        .withColumn(
            "r_lex",
            F.row_number().over(W.orderBy(F.col("tf").desc(), "id")),
        )
        .select("id", "r_lex")
    )
    # Fusion = full-outer merge of two ≤N-row rank lists. As a join
    # Spark plans a SortMergeJoin (full outer cannot broadcast-hash):
    # two exchanges + two sorts over kilobytes (VERDICT r7 — rrf was
    # the one over-2× query with a plan fix available). Each id is
    # unique within each list, so the same merge is a union + one
    # max-aggregate: a single ≤2N-row exchange, no sorts, and AQE
    # coalesces the post-shuffle side to one partition.
    fused = (
        sem.select("id", "r_sem", F.lit(None).cast("int").alias("r_lex"))
        .unionAll(
            lex.select(
                "id", F.lit(None).cast("int").alias("r_sem"), "r_lex"
            )
        )
        .groupBy("id")
        .agg(F.max("r_sem").alias("r_sem"), F.max("r_lex").alias("r_lex"))
        .select(
            "id",
            "r_sem",
            "r_lex",
            F.round(
                F.coalesce(1.0 / (F.lit(60) + F.col("r_sem")), F.lit(0.0))
                + F.coalesce(1.0 / (F.lit(60) + F.col("r_lex")), F.lit(0.0)),
                6,
            ).alias("rrf_score"),
        )
    )
    return fused.orderBy(F.col("rrf_score").desc(), "id").limit(20)


def _dot12(a: Column | str, b: Column | str) -> Column:
    """Exact-integer dot product: per-element pico-quantized products
    summed as longs — engine-identical regardless of fold order."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: F.floor(
                x.cast("double") * y.cast("double") * 1e12 + 0.5
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


# DuckDB twin of _dot12()
_DOT12_SQL = (
    "cast(list_sum(list_transform(list_zip({0}, {1}), "
    "p -> cast(floor(cast(p[1] as double) * cast(p[2] as double) * 1e12"
    " + 0.5) as bigint))) as bigint)"
)


@register(
    "sim_reciprocal_nn_pairs",
    group="J",
    oracle=f"""
    with sub as (
      select vec_id, label, embedding from embeddings where vec_id < 200
    ),
    pairs as (
      select a.vec_id as qa, b.vec_id as qb,
             {_DOT12_SQL.format('a.embedding', 'b.embedding')} as d12
      from sub a join sub b on a.vec_id <> b.vec_id
    ),
    ranked as (
      select qa, qb, d12,
             row_number() over (partition by qa
                                order by d12 desc, qb) as rk
      from pairs
    )
    select r1.qa as vec_a, r1.qb as vec_b,
           r1.rk as rank_ab, r2.rk as rank_ba,
           round(cast(r1.d12 as double) / 1e12, 6) as sim
    from ranked r1
    join ranked r2 on r2.qa = r1.qb and r2.qb = r1.qa
    where r1.rk <= 3 and r2.rk <= 3 and r1.qa < r1.qb
    order by vec_a, vec_b
    """,
)
def sim_reciprocal_nn_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: mutual-kNN pairs — vectors that appear in EACH OTHER's
    top-3 neighbor lists (k-reciprocal matching: far more precise than
    one-directional kNN for entity-resolution / near-dup candidate
    mining, the standard re-ranking trick from person-reid and record
    linkage). Bounded probe subset (vec_id < 200) keeps the exact
    N^2 formulation honest; the scale path swaps the pair source for
    LSH/IVF candidates and keeps THIS ranking+mutuality stage
    unchanged. Pico-int dot products make rank order engine-exact;
    the mutuality join is a self-join on the ranked pair table."""
    sub = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 200)
        .select("vec_id", "embedding")
    )
    a = sub.select(F.col("vec_id").alias("qa"), F.col("embedding").alias("ea"))
    b = sub.select(F.col("vec_id").alias("qb"), F.col("embedding").alias("eb"))
    pairs = a.join(b, F.col("qa") != F.col("qb")).select(
        "qa", "qb", _dot12("ea", "eb").alias("d12")
    )
    wr = W.partitionBy("qa").orderBy(F.col("d12").desc(), "qb")
    ranked = pairs.select(
        "qa", "qb", "d12", F.row_number().over(wr).alias("rk")
    ).localCheckpoint()
    r1 = ranked.alias("r1")
    r2 = ranked.alias("r2")
    return (
        r1.join(
            r2,
            (F.col("r2.qa") == F.col("r1.qb"))
            & (F.col("r2.qb") == F.col("r1.qa")),
        )
        .where(
            (F.col("r1.rk") <= 3)
            & (F.col("r2.rk") <= 3)
            & (F.col("r1.qa") < F.col("r1.qb"))
        )
        .select(
            F.col("r1.qa").alias("vec_a"),
            F.col("r1.qb").alias("vec_b"),
            F.col("r1.rk").alias("rank_ab"),
            F.col("r2.rk").alias("rank_ba"),
            F.round(F.col("r1.d12").cast("double") / 1e12, 6).alias("sim"),
        )
        .orderBy("vec_a", "vec_b")
    )


@register(
    "sim_mmr_diversified",
    group="J",
    oracle=f"""
    with q as (select embedding as e from embeddings where vec_id = 0),
    cand as (
      select vec_id,
             {_DOT12_SQL.format('embedding', '(select e from q)')} as rel12,
             embedding
      from embeddings where vec_id <> 0
      order by rel12 desc, vec_id limit 8
    ),
    pair as (
      select a.vec_id as pa, b.vec_id as pb,
             {_DOT12_SQL.format('a.embedding', 'b.embedding')} as s12
      from cand a join cand b on a.vec_id <> b.vec_id
    ),
    s1 as (select vec_id, rel12 from cand order by rel12 desc, vec_id limit 1),
    s2 as (
      select c.vec_id, c.rel12 from cand c
      join pair p on p.pa = c.vec_id
        and p.pb in (select vec_id from s1)
      where c.vec_id not in (select vec_id from s1)
      group by c.vec_id, c.rel12
      order by 0.7 * c.rel12 - 0.3 * max(p.s12) desc, c.vec_id limit 1
    ),
    s3 as (
      select c.vec_id, c.rel12 from cand c
      join pair p on p.pa = c.vec_id
        and p.pb in (select vec_id from s1 union all select vec_id from s2)
      where c.vec_id not in
        (select vec_id from s1 union all select vec_id from s2)
      group by c.vec_id, c.rel12
      order by 0.7 * c.rel12 - 0.3 * max(p.s12) desc, c.vec_id limit 1
    ),
    s4 as (
      select c.vec_id, c.rel12 from cand c
      join pair p on p.pa = c.vec_id
        and p.pb in (select vec_id from s1 union all select vec_id from s2
                     union all select vec_id from s3)
      where c.vec_id not in
        (select vec_id from s1 union all select vec_id from s2
         union all select vec_id from s3)
      group by c.vec_id, c.rel12
      order by 0.7 * c.rel12 - 0.3 * max(p.s12) desc, c.vec_id limit 1
    )
    select 1 as step, vec_id, round(cast(rel12 as double) / 1e12, 6)
             as relevance from s1
    union all
    select 2, vec_id, round(cast(rel12 as double) / 1e12, 6) from s2
    union all
    select 3, vec_id, round(cast(rel12 as double) / 1e12, 6) from s3
    union all
    select 4, vec_id, round(cast(rel12 as double) / 1e12, 6) from s4
    order by step
    """,
)
def sim_mmr_diversified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: maximal-marginal-relevance re-ranking — greedy selection
    of 4 results from the top-8 cosine candidates, each step maximizing
    0.7*relevance - 0.3*max-similarity-to-already-selected (the
    classic Carbonell-Goldstein diversifier every RAG retrieval stack
    bolts onto top-k). The candidate pool is a bounded top-k (the
    expensive part, reusing J3's broadcast-scan plan); the greedy
    loop then runs over an 8-row checkpointed frame — 4 unrolled
    DataFrame steps, no driver-side collect of corpus data. Pico-int
    dots make every argmax engine-exact; ties break on vec_id."""
    emb = load(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe")
    )
    cand = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id", _dot12("embedding", "qe").alias("rel12"), "embedding"
        )
        .orderBy(F.col("rel12").desc(), "vec_id")
        .limit(8)
        .localCheckpoint()
    )
    ca = cand.select(
        F.col("vec_id").alias("pa"), F.col("embedding").alias("ea")
    )
    cb = cand.select(
        F.col("vec_id").alias("pb"), F.col("embedding").alias("eb")
    )
    pair = (
        ca.join(cb, F.col("pa") != F.col("pb"))
        .select("pa", "pb", _dot12("ea", "eb").alias("s12"))
        .localCheckpoint()
    )
    sel = (
        cand.orderBy(F.col("rel12").desc(), "vec_id")
        .limit(1)
        .select("vec_id", "rel12")
        .withColumn("step", F.lit(1))
    )
    out = sel
    for step in (2, 3, 4):
        chosen = out.select(F.col("vec_id").alias("sv"))
        pen = (
            pair.join(chosen, pair.pb == F.col("sv"))
            .groupBy("pa")
            .agg(F.max("s12").alias("pen12"))
        )
        nxt = (
            cand.join(chosen, cand.vec_id == F.col("sv"), "left_anti")
            .join(pen, cand.vec_id == pen.pa)
            .orderBy(
                (0.7 * F.col("rel12") - 0.3 * F.col("pen12")).desc(),
                "vec_id",
            )
            .limit(1)
            .select("vec_id", "rel12")
            .withColumn("step", F.lit(step))
        )
        out = out.unionByName(nxt)
    return out.select(
        F.col("step").cast("int").alias("step"),
        "vec_id",
        F.round(F.col("rel12").cast("double") / 1e12, 6).alias("relevance"),
    ).orderBy("step")


@register(
    "sim_matryoshka_prefix_recall",
    group="J",
    oracle=f"""
    with q as (select embedding as qe from embeddings where vec_id = 0),
    scored as (
      select e.vec_id,
             {_DOT12_SQL.format('e.embedding', '(select qe from q)')} as d_full,
             {_DOT12_SQL.format('(e.embedding)[1:16]', '((select qe from q))[1:16]')} as d16,
             {_DOT12_SQL.format('(e.embedding)[1:32]', '((select qe from q))[1:32]')} as d32
      from embeddings e where e.vec_id <> 0
    ),
    rk as (
      select vec_id,
             row_number() over (order by d_full desc, vec_id) as r_full,
             row_number() over (order by d16 desc, vec_id) as r16,
             row_number() over (order by d32 desc, vec_id) as r32
      from scored
    )
    select 16 as prefix_dim,
           cast(count(*) filter (where r16 <= 10 and r_full <= 10) as bigint)
             as n_hits,
           round(count(*) filter (where r16 <= 10 and r_full <= 10) / 10.0, 2)
             as recall_at_10
    from rk
    union all
    select 32,
           cast(count(*) filter (where r32 <= 10 and r_full <= 10) as bigint),
           round(count(*) filter (where r32 <= 10 and r_full <= 10) / 10.0, 2)
    from rk
    """,
)
def sim_matryoshka_prefix_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncated-embedding evaluation (public practice:
    Kusupati et al. 2022): score the corpus against the query with the
    full 64-d vector AND with its 16-/32-d prefixes, and report
    recall@10 of each prefix against the full-dim top-10 — the
    measurement that decides how many dims the ANN index actually
    needs. Dot products are pico-quantized exact longs (fold-order
    independent), so ranks and recalls are bit-stable across engines.
    One scan computes all three scores; ranking is three windows over
    the corpus-sized score frame; at 100 TB the same evaluation runs on
    a sampled query set with per-query TakeOrdered top-k instead of
    global windows."""
    e = load(spark, sf_dir, "embeddings")
    q_struct = (
        e.where(F.col("vec_id") == 0)
        .select(F.col("embedding").alias("qe"))
    )
    scored = (
        e.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q_struct))
        .select(
            "vec_id",
            _dot12("embedding", "qe").alias("d_full"),
            _dot12(F.slice("embedding", 1, 16), F.slice("qe", 1, 16)).alias("d16"),
            _dot12(F.slice("embedding", 1, 32), F.slice("qe", 1, 32)).alias("d32"),
        )
    )
    from datalakecrawler_spark.distrank import with_global_row_number

    # three corpus-sized ranks via the distributed exact row number
    # (the rank<=10 consumers sit inside aggregates, so WindowGroupLimit
    # cannot prune a global window here — it would single-task the
    # corpus three times)
    rk = with_global_row_number(
        scored, spark, [F.col("d_full").desc(), F.col("vec_id")], out="r_full"
    )
    rk = with_global_row_number(
        rk, spark, [F.col("d16").desc(), F.col("vec_id")], out="r16"
    )
    rk = with_global_row_number(
        rk, spark, [F.col("d32").desc(), F.col("vec_id")], out="r32"
    ).select("vec_id", "r_full", "r16", "r32")
    out16 = rk.agg(
        F.lit(16).alias("prefix_dim"),
        F.count_if((F.col("r16") <= 10) & (F.col("r_full") <= 10)).alias("n_hits"),
        F.round(
            F.count_if((F.col("r16") <= 10) & (F.col("r_full") <= 10)) / 10.0, 2
        ).alias("recall_at_10"),
    )
    out32 = rk.agg(
        F.lit(32).alias("prefix_dim"),
        F.count_if((F.col("r32") <= 10) & (F.col("r_full") <= 10)).alias("n_hits"),
        F.round(
            F.count_if((F.col("r32") <= 10) & (F.col("r_full") <= 10)) / 10.0, 2
        ).alias("recall_at_10"),
    )
    return out16.unionByName(out32)


@register(
    "sim_reliability_diagram",
    group="J",
    oracle=f"""
    with pairs as (
      select a.vec_id as va, b.vec_id as vb,
             cast(a.label = b.label as integer) as same_label,
             {_DOT12_SQL.format('a.embedding', 'b.embedding')} as d12
      from embeddings a join embeddings b on a.vec_id < b.vec_id
      where a.vec_id < 100
    )
    select cast(floor(cast(d12 as double) / 1e12 / 0.1) as bigint) as sim_bin,
           count(*) as n_pairs,
           cast(sum(same_label) as bigint) as n_same_label,
           round(sum(same_label) * 1.0 / count(*), 6) as same_label_rate
    from pairs group by 1
    """,
)
def sim_reliability_diagram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity-score calibration (the reliability-diagram eval for
    semantic dedup thresholds): cosine similarity of vector pairs,
    binned at 0.1, against the rate at which the pair shares a label —
    the curve that justifies (or indicts) a chosen dedup/retrieval τ.
    Pairs are blocked to the first 100 query vectors (a sample at
    scale); dots are pico-quantized exact longs so the binning is
    engine-identical at bin edges. One blocked join, one grouped
    pass. The query block is broadcast and the CORPUS side spread to
    full parallelism before the nested-loop pair join: the corpus
    arrives as one parquet split, and a 1-partition NLJ evaluates
    every 64-dim dot serially (2.8 s → 0.08 s warm at sf0.1; same
    broadcast-queries/partition-corpus shape an ANN scorer uses at
    100 TB)."""
    e = load(spark, sf_dir, "embeddings")
    p = spark.sparkContext.defaultParallelism
    a = e.where(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("va"),
        F.col("embedding").alias("ea"),
        F.col("label").alias("la"),
    )
    b = e.repartition(p).select(
        F.col("vec_id").alias("vb"),
        F.col("embedding").alias("eb"),
        F.col("label").alias("lb"),
    )
    pairs = F.broadcast(a).join(b, F.col("va") < F.col("vb")).select(
        (F.col("la") == F.col("lb")).cast("int").alias("same_label"),
        _dot12(F.col("ea"), F.col("eb")).alias("d12"),
    )
    return (
        pairs.select(
            F.floor(F.col("d12").cast("double") / 1e12 / 0.1)
            .cast("long")
            .alias("sim_bin"),
            "same_label",
        )
        .groupBy("sim_bin")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("same_label").alias("n_same_label"),
            F.round(F.sum("same_label") / F.count(F.lit(1)), 6).alias(
                "same_label_rate"
            ),
        )
    )


@register(
    "sim_hubness_profile",
    group="J",
    oracle="""
    with dots as (
      select a.vec_id as qid, b.vec_id as nid,
             list_sum(list_transform(list_zip(a.embedding, b.embedding),
                      p -> cast(p[1] as double) * cast(p[2] as double)))
               as sim
      from embeddings a join embeddings b on a.vec_id <> b.vec_id
    ),
    topk as (
      select nid from (
        select nid, row_number() over (partition by qid
                                       order by sim desc, nid) as rn
        from dots) t
      where rn <= 5
    ),
    occ as (
      select e.vec_id,
             coalesce(k.c, 0) as k_occurrence
      from embeddings e
      left join (select nid, cast(count(*) as bigint) as c
                 from topk group by nid) k on k.nid = e.vec_id
    )
    select k_occurrence, cast(count(*) as bigint) as n_vectors
    from occ group by k_occurrence order by k_occurrence
    """,
)
def sim_hubness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: HUBNESS diagnostic — the k-occurrence histogram (how many
    vectors list each vector among their exact top-5 neighbors). High-
    dimensional embedding spaces grow 'hubs' (vectors that appear in
    everyone's neighbor list) and anti-hubs (k-occurrence 0); a heavy
    hubness tail (Radovanović et al., JMLR 2010) degrades both kNN
    label quality and IVF recall, so this histogram is the health
    check run BEFORE trusting sim_knn_join / sim_topk_ivf output.

    Exact formulation at fixture scale: all-pairs dot + per-query
    WindowGroupLimit top-5 → neighbor occurrence counts → histogram
    (anti-hubs kept by a left join back to the corpus). At 100 TB the
    identical aggregation runs over the IVF candidate top-k
    (sim_topk_ivf) instead of the exact pair set — the histogram
    SHAPE, not its exact counts, is the diagnostic."""
    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # spread the query side first: the corpus parquet is one split, so
    # the nested-loop pair scan otherwise lands on ONE task and
    # serializes all |V|² dot products (measured 32 s → 3 s at sf0.1)
    a = e.repartition(spark.sparkContext.defaultParallelism).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("ea")
    )
    b = e.select(F.col("vec_id").alias("nid"), F.col("embedding").alias("eb"))
    w = W.partitionBy("qid").orderBy(F.col("sim").desc(), "nid")
    topk = (
        a.join(b, F.col("qid") != F.col("nid"))
        .select("qid", "nid", dot("ea", "eb").alias("sim"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
    )
    occ = (
        e.select("vec_id")
        .join(
            topk.groupBy("nid").agg(F.count(F.lit(1)).alias("c")),
            e.vec_id == F.col("nid"),
            "left",
        )
        .select(F.coalesce("c", F.lit(0)).alias("k_occurrence"))
    )
    return (
        occ.groupBy("k_occurrence")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .orderBy("k_occurrence")
    )


@register(
    "sim_ivf_nprobe_sweep",
    group="J",
    oracle=_CENTROID_SQL
    + f""",
    bucketed as (
        select vec_id, embedding, bucket from (
            select e.vec_id, e.embedding, c.label as bucket,
                   row_number() over (
                       partition by e.vec_id
                       order by round({_DOT_SQL.format('e.embedding', 'c.cvec')}, 6)
                                desc, c.label) as rk
            from embeddings e cross join carr c
        ) t where rk = 1
    ),
    q as (select embedding as q_emb from embeddings where vec_id = 0),
    cent_rank as (
        select label as bucket,
               row_number() over (
                   order by round({_DOT_SQL.format('cvec', 'q_emb')}, 6)
                            desc, label) as crank
        from carr cross join q
    ),
    scored as (
        select b.vec_id, cr.crank,
               round({_DOT_SQL.format('b.embedding', 'q.q_emb')}, 6) as sim
        from bucketed b join cent_rank cr using (bucket) cross join q
        where b.vec_id <> 0
    ),
    exact as (
        select vec_id
        from embeddings cross join q
        where vec_id <> 0
        order by round({_DOT_SQL.format('embedding', 'q_emb')}, 6) desc, vec_id
        limit 10
    ),
    np as (select unnest([1, 2, 3, 5]) as nprobe),
    cands as (
        select np.nprobe, s.vec_id, s.sim
        from np join scored s on s.crank <= np.nprobe
    ),
    got as (
        select nprobe, vec_id from (
            select nprobe, vec_id,
                   row_number() over (partition by nprobe
                                      order by sim desc, vec_id) as rk
            from cands) t
        where rk <= 10
    ),
    ncorpus as (select count(*) as n from scored)
    select cast(c.nprobe as bigint) as nprobe,
           cast(count(*) as bigint) as n_candidates,
           round(count(*) * 1.0 / max(nc.n), 6) as frac_scanned,
           (select round(count(*) / 10.0, 4)
            from got g join exact e using (vec_id)
            where g.nprobe = c.nprobe) as recall_at_10
    from cands c cross join ncorpus nc
    group by c.nprobe
    """,
)
def sim_ivf_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: the IVF TUNING CURVE — recall@10 and fraction-of-corpus
    scanned for nprobe ∈ {1, 2, 3, 5}: the ANN analogue of
    dedup_threshold_sweep (that one prices the dedup τ; this prices
    the recall/compute trade every 100 TB vector deployment must
    choose). The corpus is coarse-quantized ONCE (localCheckpoint —
    the inverted file is built once however many probe settings are
    evaluated, exactly like the stored index in production); each
    nprobe setting is then a bucket-rank filter + top-10 over only
    the probed buckets. Recall compares against the exact
    brute-force top-10 (the J3 operator). FULLY oracle-checked
    (promoted round 3, same basis as sim_topk_ivf): centroids,
    bucket assignment and all tie-breaks are deterministic round-6 /
    id orderings, so the DuckDB twin reproduces the entire tuning
    curve — candidate counts, scan fractions AND recalls — not just
    its shape."""
    e = load(spark, sf_dir, "embeddings")
    cents = _label_centroids(spark, sf_dir).select(
        F.col("label").alias("c_label"), "cvec"
    )
    bucketed = _ivf_bucketed(spark, sf_dir)
    q = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    cent_rank = (
        cents.crossJoin(F.broadcast(q))
        .select(
            "c_label",
            F.row_number()
            .over(W.orderBy(F.round(dot("cvec", "q_emb"), 6).desc(), "c_label"))
            .alias("crank"),
        )
        .select(F.col("c_label").alias("bucket"), "crank")
    )
    scored = (
        bucketed.join(F.broadcast(cent_rank), "bucket")
        .where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "crank", F.round(dot("embedding", "q_emb"), 6).alias("sim"))
        .localCheckpoint()
    )
    n_corpus = scored.count()
    exact = set(
        r["vec_id"]
        for r in _topk_cosine(spark, sf_dir).select("vec_id").collect()
    )
    rows = []
    for nprobe in (1, 2, 3, 5):
        cand = scored.where(F.col("crank") <= nprobe)
        n_cand = cand.count()
        got = set(
            r["vec_id"]
            for r in cand.orderBy(F.col("sim").desc(), "vec_id")
            .limit(10)
            .collect()
        )
        rows.append(
            Row(
                nprobe=nprobe,
                n_candidates=n_cand,
                frac_scanned=round(n_cand / max(1, n_corpus), 6),
                recall_at_10=round(len(got & exact) / max(1, len(exact)), 4),
            )
        )
    return spark.createDataFrame(rows)
