"""Group J (dedup) — exact and near-duplicate detection over the
document corpus (SURVEY.md §2 J1/J2; BASELINE.json "dedup").

Scale design (SURVEY §4): near-dup is LSH banding, never O(N²) —
shingle → 64 portable MinHashes → 21 bands × 3 rows → shuffle join on
(band, key) buckets → exact-Jaccard verify on candidates only. The
oracle states the exact all-pairs SEMANTICS, computed in the
inverted-index form (`_jac_pairs_sql`: gram equi-join + count, J =
c/(nₐ+n_b−c) — same pairs as the quadratic scan for any τ>0); band
parameters are chosen so P(miss | J ≥ 0.8) = (1-0.8³)²¹ ≈ 2.9e-7 —
the LSH plan reproduces the exact answer on any realistic input while
scaling linearly in shuffle volume (BASELINE.md "Dedup family" has the
measured three-formulation ladder). r5 (VERDICT r4 §7): rows-per-band
2 → 3 — the r=2 curve caught far too many moderate-Jaccard pairs on
this template-dense corpus (measured 17.6× candidate overshoot at
sf0.1: 4496 candidates for 256 verified pairs); r=3 measures 1.3×
(332) with verified output identical at every fixture SF, and the
md5 hash family is deterministic, so the recall bound is a fixed
property of each pair, not a per-run coin flip. (r=4 measured 1.0×
but its bound (1-0.8⁴)¹⁶ ≈ 2.3e-4 is too thin for an exact-parity
contract on unseen corpora.)

Portability: MinHash uses md5(seed || shingle) with *lexicographic* min
— identical in any engine (SURVEY §2.L trap 7: never xxhash64/hash for
cross-engine keys).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from datalakecrawler_spark.io import load, row_count
from datalakecrawler_spark.memo import memoized_checkpoint
from datalakecrawler_spark.registry import register

_N_HASHES = 64
_BAND_ROWS = 3  # 21 bands × 3 rows (r5 — see module doc; hash 64 spare)
_N_BANDS = _N_HASHES // _BAND_ROWS
# DuckDB twin of the band-key concat (1-based list indexing)
_BAND_KEY_SQL = " || '#' || ".join(
    f"sig[{_BAND_ROWS} * b.band + {j + 1}]" for j in range(_BAND_ROWS)
)
_TAU = 0.8
_SHINGLE_K = 3
_MINHASH_PAIR_MEMO: dict = {}
_BANDED_MEMO: dict = {}
_SNM_RANK_MEMO: dict = {}
_SPAN_INDEX_MEMO: dict = {}


@register(
    "dedup_exact",
    group="J",
    oracle="""
    with keyed as (
        select doc_id, sha256(lower(trim(text))) as content_key
        from documents
    )
    select content_key, min(doc_id) as keeper, count(*) as n_copies
    from keyed group by 1 having count(*) > 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: exact dedup by normalized-content sha256; keep min doc_id.
    One shuffle on the 32-byte key — at 100 TB the key set is ~0.03% of
    the text volume, so this is scan-bound, not shuffle-bound."""
    d = load(spark, sf_dir, "documents")
    key = F.sha2(F.lower(F.trim(F.col("text"))), 256)
    return (
        d.select("doc_id", key.alias("content_key"))
        .groupBy("content_key")
        .agg(F.min("doc_id").alias("keeper"), F.count(F.lit(1)).alias("n_copies"))
        .where(F.col("n_copies") > 1)
    )


def _spread(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition to the session's default parallelism ahead of a
    COMPUTE-dense stage (MinHash signatures, quadratic exact-Jaccard
    verify). Partition counts are normally sized by input bytes
    (maxPartitionBytes), which is right for scan-bound work — but a
    signature pass does ~10⁴ hash evaluations per input row, so a
    byte-sized partitioning under-splits it by orders of magnitude: at
    fixture scale the whole corpus is ONE parquet split and the pass
    runs serially. One explicit shuffle (tiny: rows, not signatures)
    buys full-core fan-out; at 100 TB the same call right-sizes
    oversized scan partitions for compute instead."""
    p = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(p, *[F.col(c) for c in cols]) if cols else df.repartition(p)


def _gram_positions(toks, k: int):
    """k-gram start indices [0 .. size−k], empty-safe: the naive
    F.sequence(0, size−k) DESCENDS on <k-token docs and element_at
    then raises (ADVICE r1 hazard class; fixtures mask it at ≥10
    tokens/doc). slice-of-sequence is branch-free and type-stable."""
    return F.slice(
        F.sequence(F.lit(0), F.size(toks)),
        1,
        F.greatest(F.size(toks) - (k - 1), F.lit(0)),
    )


def _shingles(text_col: str = "text"):
    """Distinct k-word shingles as an array column (element_at is
    1-based, matching DuckDB list indexing).

    Expression form — ONLY for small/test inputs: the split is inlined
    into the transform lambda, so every element_at re-splits the text
    (k per gram position, O(len²)/doc). Operators over the corpus use
    ``_shingled`` below, which materializes the token array first."""
    toks = F.split(text_col, " ")
    return F.array_distinct(
        F.transform(
            _gram_positions(toks, _SHINGLE_K),
            lambda i: F.concat_ws(
                " ",
                *[F.element_at(toks, i + j + 1) for j in range(_SHINGLE_K)],
            ),
        )
    )


def _shingled(d: DataFrame, *keep_cols: str, alias: str = "shingles") -> DataFrame:
    """(keep_cols…, shingles) with the token array materialized in its
    own projection first, so the per-element element_at references read
    the array column instead of re-splitting the document (the O(len²)
    hazard above; Catalyst's CollapseProject keeps the two projections
    apart because the alias is referenced k× non-cheaply)."""
    t = d.select(*keep_cols, F.split("text", " ").alias("__t"))
    toks = F.col("__t")
    sh = F.array_distinct(
        F.transform(
            _gram_positions(toks, _SHINGLE_K),
            lambda i: F.concat_ws(
                " ",
                *[F.element_at(toks, i + j + 1) for j in range(_SHINGLE_K)],
            ),
        )
    )
    return t.select(*keep_cols, sh.alias(alias))


def _jac_pairs_sql(
    k: int = _SHINGLE_K,
    tau: float = _TAU,
    pred: str = "a.doc_id < b.doc_id",
    prefix: str = "",
) -> str:
    """DuckDB CTE block computing EXACT shingle-Jaccard pairs in
    explode/count form — |A∩B| as a gram-equi-join group count, then
    J = c / (nₐ + n_b − c), which is identical (same integers, same
    single IEEE division) to len(list_intersect)/len(list_distinct(a||b))
    on distinct shingle sets. Replaces the quadratic list_intersect
    self-join the round-1 oracles used: on the sf0.01 fixture the
    all-pairs form costs ~10 s per oracle (125k pairs × O(|set|)
    list intersections) while this form is ~0.1 s, because only pairs
    that SHARE a shingle are ever scored — the same inverted-index
    insight (Bayardo et al. WWW'07) the Spark side uses. A fast
    oracle matters operationally: the external driver's correctness
    window is time-boxed, and the dedup family's oracles were ~140 s
    of its budget in round 1.

    Emits CTEs `{prefix}sh/{prefix}sizes/{prefix}flat/{prefix}inter/
    {prefix}jpairs` (jpairs: doc_a, doc_b, jac ≥ tau); `pred`
    restricts the pair orientation (default upper triangle).
    `materialized` pins the pair set so recursive-closure consumers
    don't re-run the join per iteration (DuckDB inlines CTEs by
    default — that inlining is what blew dedup_components' oracle to
    32 s in round 1)."""
    p = prefix
    joined = " || ' ' || ".join(f"tk[i+{j + 1}]" for j in range(k))
    return f"""
    {p}sh as (
        select doc_id,
               list_distinct(list_transform(
                   range(len(tk) - {k - 1}), i -> {joined})) as shingles
        from (select doc_id, string_split(text, ' ') as tk
              from documents)
        where len(tk) >= {k}
    ),
    {p}shsizes as (select doc_id, len(shingles) as n from {p}sh),
    {p}flat as (select doc_id, unnest(shingles) as g from {p}sh),
    {p}inter as (
        select a.doc_id as doc_a, b.doc_id as doc_b, count(*) as c
        from {p}flat a join {p}flat b on a.g = b.g and {pred}
        group by 1, 2
    ),
    {p}jpairs as materialized (
        select doc_a, doc_b,
               c * 1.0 / (sa.n + sb.n - c) as jac
        from {p}inter
        join {p}shsizes sa on sa.doc_id = doc_a
        join {p}shsizes sb on sb.doc_id = doc_b
        where c * 1.0 / (sa.n + sb.n - c) >= {tau}
    )"""


def _exact_jac_pairs(sh: DataFrame, tau: float) -> DataFrame:
    """Spark twin of `_jac_pairs_sql`: exact Jaccard ≥ τ pairs from a
    (doc_id, shingles) frame via the inverted-index join — explode to
    (doc_id, gram), equi-join on gram, count shared grams per pair,
    J = c/(nₐ+n_b−c). Scores ONLY pairs sharing ≥1 shingle (J>0 ⊆
    candidates, so output equals the all-pairs scan for any τ>0), and
    every operator is a JVM equi-join/agg — no O(N²) array
    intersections. At 100 TB, cap gram fan-out with df-based prefix
    filtering (see dedup_ngram_jaccard) — the diagnostics ops here
    run it un-pruned because their whole corpus passes through τ
    anyway. Shingle arrays are already distinct, so count(*) is
    exactly |A∩B|."""
    sh = sh.select("doc_id", "shingles").localCheckpoint()
    sizes = sh.select("doc_id", F.size("shingles").alias("n"))
    flat = sh.select("doc_id", F.explode("shingles").alias("g"))
    inter = (
        flat.alias("a")
        .join(
            flat.alias("b"),
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b")),
            "doc_b",
        )
        .withColumn(
            "jac",
            F.col("c") * 1.0 / (F.col("n_a") + F.col("n_b") - F.col("c")),
        )
        .where(F.col("jac") >= tau)
        .select("doc_a", "doc_b", "jac")
    )


def _band_signatures(sh: DataFrame) -> DataFrame:
    """(doc_id, shingles) → exploded KEYS-ONLY (doc_id, band, key):
    64 portable MinHashes (lexicographic min of md5(seed|shingle)),
    grouped into 21 three-row band keys. Shared by the self-join dedup
    (J2), the incremental batch-vs-corpus variant, and the band
    diagnostics. Deliberately does NOT carry the shingle arrays
    through the 32× explode (VERDICT r1 What's-wrong §4): consumers
    join shingles back by doc_id at verify time, so the LSH shuffle
    moves (doc_id, band, key) triples instead of 32 copies of every
    document's shingle set — at 100 TB that is the difference between
    shuffling keys and shuffling the corpus.

    The input is _spread first: the signature pass is the compute-dense
    stage of the whole dedup family (64 md5 evaluations per shingle),
    so its parallelism must be sized by compute, not input bytes."""
    sh = _spread(sh, "doc_id")
    mh = F.transform(
        F.sequence(F.lit(0), F.lit(_N_HASHES - 1)),
        lambda s: F.array_min(
            F.transform(
                F.col("shingles"),
                lambda x: F.md5(F.concat(s.cast("string"), F.lit("|"), x)),
            )
        ),
    )
    n_bands = _N_HASHES // _BAND_ROWS
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.concat_ws(
            "#",
            *[
                F.element_at(F.col("mh"), b * _BAND_ROWS + j + 1)
                for j in range(_BAND_ROWS)
            ],
        ),
    )
    return sh.withColumn("mh", mh).select(
        "doc_id", F.posexplode(bands).alias("band", "key")
    )


def _eligible_shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared dedup input: all ≥k-token documents, shingled."""
    d = load(spark, sf_dir, "documents").where(
        F.size(F.split("text", " ")) >= _SHINGLE_K
    )
    return _shingled(d, "doc_id")


def _banded_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memoized corpus-wide banded signatures (doc_id, band, key),
    localCheckpoint'ed — THE stored LSH index table. In production the
    banded signatures of a 100 TB corpus are written once and reused by
    every consumer (pair mining, incremental ingest, band diagnostics);
    recomputing 64 MinHashes per consumer would multiply the single
    most compute-dense stage of the dedup family. Locally the same
    sharing also amortizes the one-time JVM codegen/JIT cost of the
    64-hash expression tree (~7 s cold vs ~1 s warm at sf0.1), which
    otherwise every signature consumer pays again. Same memo-safety
    story as _MINHASH_PAIR_MEMO: keyed by (applicationId, sf_dir);
    checkpointed RDDs die with the context, so a fresh driver can
    never observe a stale entry; the memo itself is bounded (keep-last-4
    per app, evicted entries unpersisted — see memo.py, ADVICE r3)."""
    return memoized_checkpoint(
        _BANDED_MEMO,
        spark,
        sf_dir,
        lambda: _band_signatures(_eligible_shingled(spark, sf_dir)),
    )


@register(
    "dedup_near_minhash",
    group="J",
    oracle=f"""
    with {_jac_pairs_sql()}
    select doc_a, doc_b, round(jac, 6) as jaccard from jpairs
    """,
)
def dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: near-dup pairs with shingle-Jaccard ≥ 0.8 via MinHash+LSH.

    Pipeline: k=3 word shingles → 64 MinHashes (lexicographic min of
    md5(seed|shingle)) → 21 band keys → keys-only explode + self-join
    on band buckets → dedup candidate pairs → join shingles back by
    doc_id → exact Jaccard verify. The band join moves only (doc_id,
    band, key) triples; shingle arrays are fetched once per UNIQUE
    candidate pair, not once per shared band (VERDICT r1 §4). The
    oracle computes the quadratic ground truth; see module docstring
    for the miss-probability bound.

    Memoized per (applicationId, sf_dir): keeplist, components and
    the mlprep dedup-aware split all start from this exact verified
    pair set, and the signature pass (64 md5 per shingle) is the
    expensive stage of each — a sequential checker process pays it
    once instead of four times. The memo holds a localCheckpoint'ed
    few-row pair frame; checkpointed RDDs die with the context, so a
    fresh driver never sees a stale entry."""
    return memoized_checkpoint(
        _MINHASH_PAIR_MEMO, spark, sf_dir, lambda: _minhash_pairs_plan(spark, sf_dir)
    )


def _minhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH band-bucket candidate pairs (pre-verify) — the shuffle-volume
    driver of the MinHash family and the SCALING.md growth probe."""
    # Materialized signatures (memoized checkpoint): the band self-join
    # references this subtree from both sides, and without the
    # checkpoint Catalyst plans two independent signature passes
    # (self-joins do not share subtrees). At scale this is "persist the
    # signature table before joining it to itself" — standard LSH
    # practice; see _banded_corpus.
    banded = _banded_corpus(spark, sf_dir)
    left = banded.select(F.col("doc_id").alias("doc_a"), "band", "key")
    right = banded.select(F.col("doc_id").alias("doc_b"), "band", "key")
    return (
        left.join(right, ["band", "key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def _minhash_pairs_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The un-checkpointed MinHash-LSH verified-pair plan (see caller)."""
    sh = _eligible_shingled(spark, sf_dir)
    cand = _minhash_candidates(spark, sf_dir)
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = inter * 1.0 / union
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("jaccard", F.round(jac, 6))
        .where(jac >= _TAU)
        .select("doc_a", "doc_b", "jaccard")
    )


@register(
    "dedup_simhash",
    group="J",
    oracle="""
    with toks as (
      select doc_id, unnest(list_distinct(string_split(text, ' '))) as t
      from documents
    ),
    hashed as (
      select doc_id, cast(('0x' || substr(md5(t), 1, 8)) as bigint) as h
      from toks
    ),
    bits as (
      select doc_id, b.b,
             cast(sum(case when ((h >> cast(b.b as integer)) & 1) = 1
                           then 1 else -1 end) as bigint) as s
      from hashed cross join range(32) b(b)
      group by 1, 2
    ),
    sigs as (
      select doc_id,
             cast(sum(case when s > 0
                           then (cast(1 as bigint) << cast(b as integer))
                           else 0 end) as bigint) as simhash
      from bits group by 1
    )
    select simhash // 65536 as band_hi,
           cast(count(*) as bigint) as n_docs,
           string_agg(cast(doc_id as varchar), '|' order by doc_id) as doc_ids
    from sigs
    group by 1
    having count(*) > 1
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 32-bit signature = sign of per-bit weighted sums
    over token hashes; docs grouped by signature band for candidate
    generation.

    FULLY oracle-checked (promoted round 3, same determinism argument
    as dedup_embedding_rplsh): token hashes are md5-derived 32-bit ints
    (int(md5_hex[:8], 16) — identical in both engines), the per-bit
    ±1 sums are exact integers (order-independent), and the sign test
    and band extraction are integer arithmetic — so the SIGNATURES and
    the bucket contents are bit-identical across engines.

    Scale: signature is 1 int per doc; banding on 16-bit halves gives
    the same linear-shuffle profile as MinHash-LSH.
    """
    d = load(spark, sf_dir, "documents")
    toks = F.array_distinct(F.split("text", " "))
    # md5-derived 32-bit token hash — the cross-engine-exact hash family
    # (crc32 has no DuckDB twin). h < 2^32 < 2^53, so the pow(2, b)
    # double arithmetic below stays exact.
    def _h32(t):
        return F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")

    # per-bit contribution: +1 if bit set else -1, summed over tokens.
    # shiftright/shiftleft need literal shift amounts, so bit extraction
    # uses pow(2, b) arithmetic — exact in double below 2^53.
    def _bit(h, b):
        return F.floor(h / F.pow(F.lit(2.0), b.cast("double"))).cast(
            "long"
        ) % 2

    bit_sums = F.transform(
        F.sequence(F.lit(0), F.lit(31)),
        lambda b: F.aggregate(
            F.col("toks"),
            F.lit(0),
            lambda acc, t: acc + F.when(_bit(_h32(t), b) == 1, 1).otherwise(-1),
        ),
    )
    sig = F.aggregate(
        F.zip_with(
            F.col("bit_sums"),
            F.sequence(F.lit(0), F.lit(31)),
            lambda s, b: F.when(
                s > 0, F.pow(F.lit(2.0), b.cast("double")).cast("long")
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    sigs = (
        d.select("doc_id", toks.alias("toks"))
        .withColumn("bit_sums", bit_sums)
        .withColumn("simhash", sig)
        .select("doc_id", "simhash")
    )
    # candidate groups: docs sharing the upper 16 bits
    return (
        sigs.withColumn("band_hi", F.floor(F.col("simhash") / F.lit(65536)).cast("long"))
        .groupBy("band_hi")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            # flat string, not array — the driver's canonicalizer
            # cannot hash nested columns (VERDICT r1 What's-wrong §1)
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                "|",
            ).alias("doc_ids"),
        )
        .where(F.col("n_docs") > 1)
    )


@register(
    "dedup_ngram_jaccard",
    group="J",
    oracle=f"""
    with {_jac_pairs_sql(k=2, tau=0.5)}
    select doc_a, doc_b, round(jac, 6) as jaccard from jpairs
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-Jaccard near-dup pairs (τ=0.5) — EXACT output via prefix
    filtering (the AllPairs/PPJoin principle: Bayardo et al. WWW'07,
    Xiao et al. WWW'08 — public papers), replacing the all-pairs
    self-join (VERDICT r1 "Next round" §4).

    Prefix principle: order the gram universe globally (rarest-first by
    document frequency, gram text tie-break). J(A,B) ≥ τ implies
    |A∩B| ≥ ⌈τ·|A|⌉, so if A and B share NO gram among each set's
    first |X| − ⌈τ·|X|⌉ + 1 ordered grams, the pair provably cannot
    reach τ. Candidates = equi-join of the prefix grams; verify = exact
    Jaccard on candidates only. Rare-first ordering bounds join-key
    skew (high-frequency grams land in suffixes), so the explode→join
    stays linear-ish at 100 TB while the output is identical to the
    quadratic formulation. Equivalence evidence: the DuckDB oracle is
    the shared inverted-index form (_jac_pairs_sql), and
    test_prefix_filter_pairs_equals_bruteforce pins _prefix_filter_pairs
    to a quadratic brute-force scan on an adversarial synthetic corpus
    (heavy gram sharing, df ties, duplicates, subsets, isolates)."""
    tau = 0.5
    # tokens materialized first (O(len²) re-split hazard, see _shingled)
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("t")
    )
    toks = F.col("t")
    grams = F.array_distinct(
        F.transform(
            _gram_positions(toks, 2),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
            ),
        )
    )
    # _spread + checkpoint: the gram table feeds three consumers (the
    # prefix explode and both verify joins) — materialize it once,
    # partitioned for compute.
    g = _spread(
        d.select("doc_id", grams.alias("grams"), F.size(grams).alias("n")),
        "doc_id",
    ).localCheckpoint()
    return _prefix_filter_pairs(g, tau).select("doc_a", "doc_b", "jaccard")


def _prefix_filter_pairs(g: DataFrame, tau: float) -> DataFrame:
    """AllPairs/PPJoin prefix-filtered exact-Jaccard pairs ≥ τ.

    ``g`` must carry (doc_id, grams array<string> DISTINCT, n = size).
    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, identical to
    the quadratic all-pairs scan (pinned by
    test_prefix_filter_pairs_equals_bruteforce on an adversarial
    corpus). Global gram order: rarest-first by document frequency,
    gram text tie-break — any total order is correct (the prefix bound
    holds per document); rare-first is the one that also bounds join
    skew.

    Verify stage mechanics (the cost center when the corpus is gram-
    dense and the prefix filter prunes little): grams are relabeled to
    distinct int64 ids — monotonically_increasing_id over the distinct-
    gram table, unique by construction, NO global-window funnel, FROZEN
    by a localCheckpoint so every consumer branch sees one labeling
    (mid is order-nondeterministic after a shuffle), and
    intersection counts are relabel-invariant so exactness is
    untouched — then |A∩B| runs array_intersect on int arrays (no
    string hashing) and |A∪B| = n_a + n_b − |A∩B| from the already-
    known set sizes. The candidate-pair table is explicitly
    repartitioned before the verify joins: AQE coalesces it to a
    handful of ~64 MB partitions, but each row fans out to two gram
    arrays in the join, so the coalesced plan serializes the per-pair
    intersections onto a few cores (measured 47.7 s → 4.1 s at sf0.1,
    identical 256 output pairs). The per-doc array tables are
    data-sized (one row per doc) — joined without a broadcast hint so
    AQE broadcasts them while small and degrades to a shuffle join
    at corpus scale."""
    flat = g.select("doc_id", "n", F.explode("grams").alias("gram"))
    dfreq = flat.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    # The gid labeling MUST be materialized: monotonically_increasing_id
    # after a shuffle is nondeterministic in post-shuffle row order, and
    # flat_id feeds four plan branches (both candidate-join sides, both
    # verify array tables). Without the checkpoint, an AQE replan or a
    # recomputed shuffle stage could hand the same gram different gids
    # on different branches, silently corrupting the gid equi-join
    # (ADVICE r3, medium). The distinct-gram table is vocabulary-sized
    # (≪ corpus), so freezing it is cheap; a deterministic
    # xxhash64(gram) gid would avoid the materialization but admits
    # birthday collisions (expected >1 at ~10^10 grams), which would
    # break the pinned exactness — frozen labels are exact at any scale.
    ids = dfreq.select(
        "gram", "df", F.monotonically_increasing_id().alias("gid")
    ).localCheckpoint()
    flat_id = flat.join(ids, "gram")
    w = W.partitionBy("doc_id").orderBy("df", "gram")
    prefix = (
        flat_id
        .withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= F.col("n") - F.ceil(F.lit(tau) * F.col("n")) + 1)
        .select("doc_id", "gid", "n")
    )
    cands = (
        prefix.select(F.col("doc_id").alias("doc_a"), "gid", F.col("n").alias("n_a"))
        .join(
            prefix.select(
                F.col("doc_id").alias("doc_b"), "gid", F.col("n").alias("n_b")
            ),
            "gid",
        )
        .where(
            (F.col("doc_a") < F.col("doc_b"))
            # size filter: τ·|A| ≤ |B| ≤ |A|/τ is necessary for J ≥ τ
            & (F.col("n_b") >= F.lit(tau) * F.col("n_a"))
            & (F.col("n_a") >= F.lit(tau) * F.col("n_b"))
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    gi = flat_id.groupBy("doc_id").agg(
        F.collect_list("gid").alias("gids"), F.first("n").alias("n")
    )
    a = gi.select(
        F.col("doc_id").alias("doc_a"),
        F.col("gids").alias("g_a"),
        F.col("n").alias("n_a"),
    )
    b = gi.select(
        F.col("doc_id").alias("doc_b"),
        F.col("gids").alias("g_b"),
        F.col("n").alias("n_b"),
    )
    c = F.size(F.array_intersect("g_a", "g_b"))
    jac = c * 1.0 / (F.col("n_a") + F.col("n_b") - c)
    return (
        # 2× parallelism: the exact-Jaccard verify is compute-dense and
        # slightly skewed by candidate multiplicity; over-splitting by
        # 2 lets the scheduler balance the tail (r9: was a fixed 64,
        # now scales with the session's core count).
        cands.repartition(2 * cands.sparkSession.sparkContext.defaultParallelism)
        .join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("jaccard", F.round(jac, 6))
        .where(jac >= tau)
        .select("doc_a", "doc_b", "jaccard")
    )


def _rp_planes(n_tables: int, n_bits: int, dim: int) -> list[list[list[float]]]:
    """Deterministic pseudo-random hyperplanes from md5 — reproducible
    across sessions and engines (no RNG state)."""
    import hashlib

    def u(t: int, j: int, d: int) -> float:
        h = hashlib.md5(f"rp|{t}|{j}|{d}".encode()).hexdigest()[:8]
        return int(h, 16) / 2**32 - 0.5

    return [
        [[u(t, j, d) for d in range(dim)] for j in range(n_bits)]
        for t in range(n_tables)
    ]


_RPLSH_DOT = (
    "list_aggregate(list_transform(list_zip({0}, {1}), "
    "p -> cast(p[1] as double) * cast(p[2] as double)), 'sum')"
)


@register(
    "dedup_embedding_rplsh",
    group="J",
    oracle=f"""
    with params as (
      select greatest(6, cast(ceil(log2(count(*) / 8.0)) as integer)) as nb
      from embeddings
    ),
    planes as (
      select tt.t, jj.j, dd.d,
             cast(('0x' || substr(md5('rp|' || tt.t || '|' || jj.j || '|' || dd.d), 1, 8))
                  as bigint) / 4294967296.0 - 0.5 as w
      from range(16) tt(t), range(40) jj(j), range(64) dd(d), params p
      where jj.j < p.nb
    ),
    flat as (
      select vec_id,
             generate_subscripts(embedding, 1) - 1 as d,
             unnest(embedding) as v
      from embeddings
    ),
    dots as (
      select f.vec_id, p.t, p.j,
             sum(cast(floor(cast(f.v as double) * p.w * 1e12 + 0.5) as bigint)) as dd
      from flat f join planes p using (d)
      group by 1, 2, 3
    ),
    sigs as (
      select vec_id, t,
             string_agg(case when dd > 0 then '1' else '0' end, '' order by j) as bits
      from dots group by 1, 2
    ),
    keyed as (select vec_id, t || '|' || bits as sig from sigs),
    cand as (
      select distinct a.vec_id as vec_a, b.vec_id as vec_b
      from keyed a join keyed b using (sig)
      where a.vec_id < b.vec_id
    )
    select vec_a, vec_b,
           round({_RPLSH_DOT.format('ea.embedding', 'eb.embedding')}, 6) as sim
    from cand
    join embeddings ea on ea.vec_id = cand.vec_a
    join embeddings eb on eb.vec_id = cand.vec_b
    where round({_RPLSH_DOT.format('ea.embedding', 'eb.embedding')}, 6) >= 0.4
    """,
)
def dedup_embedding_rplsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup via random-projection LSH (the scale
    path for sim_pairwise_dups): 16 hash tables × 6 sign-bits; vectors
    sharing a signature in ANY table become candidates; candidates are
    verified with the exact dot product at τ=0.4.

    FULLY oracle-checked (promoted round 3): the hyperplanes are
    md5-derived (int(hex[:8],16)/2³² − 0.5 — exact powers-of-two
    arithmetic, bit-identical doubles in both engines), the plane
    dots accumulate exact integer pico-units (order-independent), and
    the sign test runs on the integer — so the SIGNATURES themselves,
    the candidate set, and the verified pairs are all deterministic
    and reproduced by the DuckDB twin from the same formula. Shuffle
    cost is linear: 16 signature keys per vector instead of N² pairs.
    """
    tau = 0.4
    keyed = _rplsh_keyed(spark, sf_dir)
    cand = _rplsh_candidates(keyed)
    dot_ab = F.aggregate(
        F.zip_with("e_a", "e_b", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        cand.withColumn("sim", F.round(dot_ab, 6))
        .where(F.col("sim") >= tau)
        .select("vec_a", "vec_b", "sim")
    )


def _rplsh_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RP-LSH signature table (vec_id, embedding, sig) — 16 keys
    per vector, localCheckpoint'ed (it feeds both self-join sides).

    The signature width ADAPTS to corpus size: n_bits =
    max(6, ⌈log2(N/8)⌉), i.e. ~8 vectors per bucket regardless of N.
    A FIXED width makes candidate pairs grow as N²·T·2^-b (quadratic
    with a small constant — the same asymptote class the r3
    Fellegi–Sunter blocking was flagged for); constant occupancy makes
    them ~N·T·occ/2 — linear. The DuckDB oracle computes the identical
    width from the identical count (params CTE), so signatures stay
    bit-matched at every scale factor; at sf0.001/0.01 the formula
    yields the historical 6 bits, so prior-round hashes are unchanged.
    The count() is a parquet-metadata read, not a scan."""
    n_tables, dim = 16, 64
    n_vecs = row_count(spark, sf_dir, "embeddings")
    n_bits = max(6, math.ceil(math.log2(n_vecs / 8.0)))
    planes = _rp_planes(n_tables, n_bits, dim)

    # The 16×6 plane projections are computed as a SPARSE MATMUL BY
    # EXPLODE-JOIN-AGGREGATE — posexplode the vectors, broadcast-join
    # the (table, bit, pos, weight) plane matrix, hash-aggregate the
    # products — instead of 96 per-row higher-order fold expressions:
    # HOF lambdas run on Catalyst's expression interpreter (outside
    # whole-stage codegen) and measured 4.7× slower; the join-agg
    # stays entirely in codegen'd hash aggregation, and the same shape
    # is how you'd push 10⁵ planes at 100 TB (the plane matrix stays a
    # broadcast; the shuffle is (vec, table, bit)-keyed partial aggs).
    import pandas as pd

    pl = spark.createDataFrame(
        pd.DataFrame(
            [
                (t, j, d, planes[t][j][d])
                for t in range(n_tables)
                for j in range(n_bits)
                for d in range(dim)
            ],
            columns=["t", "j", "pos", "w"],
        )
    )
    # _spread BEFORE the projection: compute-dense, must fan out
    # across cores, not run inside one byte-sized input partition.
    e = _spread(
        load(spark, sf_dir, "embeddings").select("vec_id", "embedding"), "vec_id"
    )
    flat = e.select("vec_id", F.posexplode("embedding").alias("pos", "v"))
    # Each plane dot is summed in exact integer pico-units: a plain
    # double sum's partial-aggregation order varies run to run, and a
    # projection near zero could flip its sign bit between runs,
    # silently changing the candidate set (ADVICE r2). Per-element
    # quantization is IEEE-deterministic, the long sum is
    # order-independent, and |product| ≤ 1 × 64 elems keeps the pico
    # sum ≪ int64 range. Sign test runs on the exact integer.
    dots = (
        flat.join(F.broadcast(pl), "pos")
        .groupBy("vec_id", "t", "j")
        .agg(
            F.sum(
                F.floor(F.col("v").cast("double") * F.col("w") * 1e12 + 0.5)
            ).alias("d")
        )
    )
    sig = (
        dots.groupBy("vec_id", "t")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("j", "d"))),
                    lambda s: F.when(s.d > 0, "1").otherwise("0"),
                ),
            ).alias("bits")
        )
        .select(
            "vec_id",
            F.concat_ws("|", F.col("t").cast("string"), "bits").alias("sig"),
        )
    )
    # checkpoint: the signature table feeds both sides of the
    # self-join — materialize the plane projections once.
    return sig.join(e, "vec_id").localCheckpoint()


def _rplsh_candidates(keyed: DataFrame) -> DataFrame:
    """Signature-bucket candidate pairs (pre-verify) from the keyed
    (vec_id, embedding, sig) table — the SCALING.md growth probe for
    the RP-LSH family."""
    a = keyed.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("e_a"), "sig"
    )
    b = keyed.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("e_b"), "sig"
    )
    return (
        a.join(b, "sig")
        .where(F.col("vec_a") < F.col("vec_b"))
        .dropDuplicates(["vec_a", "vec_b"])
    )


@register(
    "dedup_keeplist",
    group="J",
    oracle=f"""
    with {_jac_pairs_sql()}
    select doc_id from documents
    where doc_id not in (select doc_b from jpairs)
    """,
)
def dedup_keeplist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup deliverable: the doc_ids that SURVIVE near-dup
    removal (drop every doc that is the higher-id member of a ≥τ pair —
    the standard keep-first policy; exact transitive closure would need
    iterative connected components, overkill for pair-sparse corpora).
    Composes the J2 LSH pipeline; at 100 TB this is LSH + anti join."""
    pairs = dedup_near_minhash(spark, sf_dir).select("doc_b")
    d = load(spark, sf_dir, "documents").select("doc_id")
    return d.join(
        pairs.withColumnRenamed("doc_b", "doc_id").distinct(),
        "doc_id",
        "left_anti",
    )


def connected_components(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """Distributed connected components by iterative min-label
    propagation: every node repeatedly adopts the smallest component id
    seen across its edges until fixpoint. O(graph diameter) rounds, each
    one shuffle on the node id; `localCheckpoint` truncates the plan
    lineage so round N doesn't recompile rounds 1..N-1. Dedup-pair
    graphs are near-degenerate (tiny diameter, forest of cliques), so
    this converges in 2-3 rounds; for web-scale general graphs swap in
    the large-star/small-star alternation (Kiveris et al., CC-MR) —
    same join shapes, better worst-case round count.

    edges: DataFrame(src bigint, dst bigint), undirected.
    Returns DataFrame(node bigint, comp bigint).
    """
    # Checkpoint the edge set BEFORE iterating: every propagation round
    # joins against `sym`, and without this the full upstream pipeline
    # that produced the edges (e.g. the MinHash-LSH candidate join) is
    # re-executed once per round — measured 174 s vs ~5 s at sf0.01 for
    # dedup_components. Iterative algorithms must pin their loop
    # invariants to storage; same reason each round's labels checkpoint.
    sym = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )
    # Convergence probe: comp is per-node MONOTONE non-increasing (each
    # round takes a min over the old value), so Σcomp strictly
    # decreases iff any label improved — one narrow aggregate per round
    # replaces the old new-vs-old join + limit + count action
    # (r9 optimization; same fixpoint, cheaper probe).
    prev_sum = labels.agg(
        F.sum(F.col("comp").cast("decimal(38,0)"))
    ).collect()[0][0]
    for _ in range(max_iter):
        prop = (
            sym.join(labels, sym["src"] == labels["node"])
            .select(F.col("dst").alias("node"), "comp")
        )
        cur_df = (
            labels.union(prop)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        )
        # Pointer jumping (path halving): comp ← min(comp, comp[comp])
        # through the CURRENT round's label frame — every label is a
        # node id inside the same component, so a jump never crosses
        # components and the fixpoint (min id per component) is
        # unchanged; label distance to the component minimum shrinks
        # multiplicatively per jump, turning O(diameter) propagation
        # rounds into O(log diameter). Two chained jumps measured
        # best on the sf0.01 co-purchase graph: 11 rounds / 7.2 s →
        # 6 rounds / 3.3 s, identical labels (BFS-verified). The
        # self-referential joins reuse the aggregation exchange
        # (ReusedExchange), so each jump costs one small hash join,
        # not a recomputation. Left join + coalesce: every comp value
        # is a node id present in the frame, but stay null-safe.
        for _ in range(2):
            jump = cur_df.select(
                F.col("node").alias("j_node"), F.col("comp").alias("j_comp")
            )
            cur_df = (
                cur_df.join(jump, cur_df["comp"] == jump["j_node"], "left")
                .select(
                    "node",
                    F.least(
                        F.col("comp"), F.coalesce("j_comp", "comp")
                    ).alias("comp"),
                )
            )
        labels = cur_df.localCheckpoint(eager=True)
        cur_sum = labels.agg(
            F.sum(F.col("comp").cast("decimal(38,0)"))
        ).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


@register(
    "dedup_components",
    group="J",
    oracle=f"""
    with recursive {_jac_pairs_sql()},
    edges as materialized (
        select doc_a as a, doc_b as b from jpairs
        union
        select doc_b, doc_a from jpairs
    ),
    reach as (
        select a as node, b as peer from edges
        union
        select r.node, e.b from reach r join edges e on e.a = r.peer
    ),
    labels as (
        select node, least(node, min(peer)) as comp from reach group by node
    )
    select comp as keeper,
           count(*) as n_docs,
           max(node) as max_member
    from labels group by comp
    """,
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: near-dup CLUSTER resolution — pairwise LSH output is not a
    dedup policy until transitive closure picks one canonical doc per
    cluster (A~B, B~C ⇒ {A,B,C} is one cluster even if A≁C directly).
    Runs connected components over the MinHash-LSH pair graph and
    returns one row per multi-doc cluster: canonical keeper (min
    doc_id) + cluster size. Oracle: the τ-graph's transitive closure as
    a recursive CTE (LSH pairs provably equal the quadratic scan at
    τ=0.8 — see the miss-bound in the module docstring), min-label per
    node; tests/test_pipeline_semantics.py additionally checks a Python
    union-find over the same pairs."""
    from datalakecrawler_spark.registry import all_queries

    pairs = all_queries()["dedup_near_minhash"].fn(spark, sf_dir)
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    labels = connected_components(edges)
    return (
        labels.groupBy("comp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.max("node").alias("max_member"))
        .select(F.col("comp").alias("keeper"), "n_docs", "max_member")
    )


@register(
    "dedup_fuzzy_blocked",
    group="J",
    oracle="""
    with names as (
        select p_name, string_split(p_name, ' ')[2] as blk, count(*) as n
        from part group by 1, 2
    )
    select a.p_name as name_a, b.p_name as name_b,
           levenshtein(a.p_name, b.p_name) as dist,
           a.n * b.n as n_record_pairs
    from names a join names b
      on a.blk = b.blk and a.p_name < b.p_name
    where levenshtein(a.p_name, b.p_name) <= 2
    """,
)
def dedup_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: blocked fuzzy dedup (entity resolution) — near-identical
    part names found by Levenshtein ≤ 2, with two scale levers stacked:
    (1) dedupe-distinct-first: edit distance runs on DISTINCT names
    (64 here, millions of records reduce to thousands of values), each
    pair reporting the implied record-pair count; (2) blocking: the
    self-join is equi on a blocking key (the name's second token), so
    the quadratic comparison is confined to blocks instead of the full
    cross product. Levenshtein is a JVM built-in — no Python boundary.
    At 100 TB, swap the blocking key for multiple redundant keys
    (phonetic + prefix) and union, the standard record-linkage recipe."""
    p = load(spark, sf_dir, "part")
    names = (
        p.groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("blk", F.element_at(F.split("p_name", " "), 2))
    )
    a = names.alias("a")
    b = names.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .withColumn("dist", F.levenshtein(F.col("a.p_name"), F.col("b.p_name")))
        .filter(F.col("dist") <= 2)
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            "dist",
            (F.col("a.n") * F.col("b.n")).alias("n_record_pairs"),
        )
    )


_INC_SPLIT = 400  # doc_id < split = existing corpus; >= split = new batch


@register(
    "dedup_incremental",
    group="J",
    oracle=f"""
    with {_jac_pairs_sql(
        pred=f"a.doc_id >= {_INC_SPLIT} and b.doc_id < {_INC_SPLIT}"
    )},
    best as (
        select doc_a as doc_id, doc_b as match_doc,
               round(jac, 6) as jaccard
        from (select *, row_number() over (partition by doc_a
                                           order by jac desc, doc_b) rk
              from jpairs) t
        where rk = 1
    )
    select d.doc_id,
           case when best.match_doc is null then 'admitted'
                else 'near_dup' end as verdict,
           best.match_doc, best.jaccard
    from documents d left join best on d.doc_id = best.doc_id
    where d.doc_id >= {_INC_SPLIT}
    """,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: INCREMENTAL near-dedup — the continuous-ingestion shape:
    a new batch (doc_id ≥ split) is admitted or rejected against an
    EXISTING corpus (doc_id < split) without ever comparing corpus to
    corpus. Both sides run the shared MinHash/band signature stage
    (_band_signatures — in production the corpus's banded signatures
    are a stored table maintained across runs, so each ingest computes
    signatures only for the new batch); candidates come from the
    asymmetric band join (batch × corpus within equal band keys — the
    join is linear in batch size, independent of corpus growth beyond
    bucket occupancy), then exact Jaccard verifies and row_number
    picks the best corpus match per new doc. Every batch doc gets a
    verdict row: 'near_dup' with its match + jaccard, or 'admitted'.
    The oracle recomputes the quadratic batch×corpus ground truth, so
    the LSH shortcut is hash-checked against no-false-negative truth
    at τ=0.8."""
    d = load(spark, sf_dir, "documents")
    sh = _eligible_shingled(spark, sf_dir)
    # one memoized signature pass feeds both the corpus and batch sides
    banded = _banded_corpus(spark, sf_dir)
    corpus = banded.where(F.col("doc_id") < _INC_SPLIT).select(
        F.col("doc_id").alias("match_doc"), "band", "key"
    )
    batch = banded.where(F.col("doc_id") >= _INC_SPLIT).select(
        "doc_id", "band", "key"
    )
    # keys-only band join; shingles joined back per unique candidate
    cand = (
        batch.join(corpus, ["band", "key"])
        .select("doc_id", "match_doc")
        .distinct()
        .join(
            sh.select("doc_id", F.col("shingles").alias("sh_b")), "doc_id"
        )
        .join(
            sh.select(
                F.col("doc_id").alias("match_doc"),
                F.col("shingles").alias("sh_c"),
            ),
            "match_doc",
        )
    )
    jac = (
        F.size(F.array_intersect("sh_b", "sh_c"))
        * 1.0
        / F.size(F.array_union("sh_b", "sh_c"))
    )
    scored = cand.select(
        "doc_id", "match_doc", jac.alias("jac")
    ).where(F.col("jac") >= _TAU)
    # argmax aggregate ≡ row_number-over-(jac desc, match_doc) + rk=1
    # (r9, guide §2.3): map-side partials, no per-doc sort.
    best = (
        scored.groupBy("doc_id")
        .agg(
            F.min(
                F.struct(
                    (-F.col("jac")).alias("nj"),
                    F.col("match_doc").alias("match_doc"),
                )
            ).alias("m")
        )
        .select(
            "doc_id",
            F.col("m.match_doc").alias("match_doc"),
            F.round(-F.col("m.nj"), 6).alias("jaccard"),
        )
    )
    return (
        d.where(F.col("doc_id") >= _INC_SPLIT)
        .select("doc_id")
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("match_doc").isNull(), "admitted")
            .otherwise("near_dup")
            .alias("verdict"),
            "match_doc",
            "jaccard",
        )
    )


@register(
    "dedup_cdc_chunks",
    group="J",
    oracle="""
    with d as (select doc_id, text from documents where len(text) >= 16),
    pos as (select doc_id, text, unnest(range(1, len(text) - 14)) as i from d),
    cuts as (
      select doc_id, i + 16 as start from pos
      where substr(md5(substr(text, i, 16)), 1, 1) = '0'
      union all
      select doc_id, 1 from d
    ),
    chunks as (
      select c.doc_id,
             substr(d.text, c.start,
                    coalesce(lead(c.start) over (partition by c.doc_id
                                                 order by c.start),
                             len(d.text) + 1) - c.start) as chunk
      from cuts c join d on c.doc_id = d.doc_id
    ),
    hashed as (
      select doc_id, md5(chunk) as h, len(chunk) as chunk_len
      from chunks where chunk <> ''
    ),
    by_hash as (
      select h, count(*) as n, count(distinct doc_id) as n_docs,
             max(chunk_len) as chunk_len
      from hashed group by h
    )
    select count(*) as n_unique_chunks,
           cast(sum(n) as bigint) as n_chunks,
           count(*) filter (where n > 1) as n_dup_hashes,
           count(*) filter (where n_docs > 1) as n_cross_doc_hashes,
           cast(sum((n - 1) * chunk_len) as bigint) as dup_char_mass
    from by_hash
    """,
)
def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: content-defined chunking (CDC) duplicate analysis — the
    sub-document dedup primitive from the training-data literature:
    whole-document hashing (dedup_exact) misses the boilerplate
    paragraph pasted into thousands of otherwise-distinct pages.
    CDC cuts each document where a rolling content hash meets a
    condition (here: md5 of the 16-char window starts with '0',
    ≈ 1/16 rate → ~16-char expected chunks), so chunk boundaries are
    CONTENT-anchored: insert one word at the top of a page and the
    chunk set shifts by one chunk, not by all of them — the property
    fixed-width shingles lack. Duplicated chunk hashes across docs
    expose shared boilerplate; dup_char_mass is the byte-savings bound
    for chunk-level dedup. Cross-engine note: the boundary hash is md5
    (SURVEY §2.L trap 7 — never xxhash64 for oracle-checked keys).
    Scale shape: position explosion → filter → per-doc window over
    CUTS ONLY (the full text never shuffles with the positions; the
    chunk substring is extracted after re-joining the ~1/16-density
    cut list back to the doc row), then one hash aggregation. At
    100 TB the window-size/boundary-rate pair trades index size
    against dedup granularity exactly as in production CDC stores."""
    # _spread: the boundary scan evaluates one md5 per text position —
    # compute-dense; a 1-split corpus would roll the hash serially.
    d = _spread(
        load(spark, sf_dir, "documents")
        .where(F.length("text") >= 16)
        .select("doc_id", "text"),
        "doc_id",
    )
    # Boundary scan in the ARRAY domain: the 16-char windows are built
    # by a transform and exploded as (doc_id, i, window) — 16 bytes per
    # exploded row. The previous shape exploded bare positions WITH the
    # text column, so every one of the ~|text| rows carried a full copy
    # of the document through the Tungsten rows (O(len²) bytes/doc;
    # measured 2.5 s → ~1 s replan at sf0.1).
    wins = F.transform(
        F.sequence(F.lit(1), F.length("text") - 15),
        lambda i: F.struct(
            i.alias("i"), F.col("text").substr(i, F.lit(16)).alias("w")
        ),
    )
    pos = d.select("doc_id", F.explode(wins).alias("p")).select(
        "doc_id", F.col("p.i").alias("i"), F.col("p.w").alias("w")
    )
    cuts = (
        pos.where(F.md5(F.col("w")).startswith("0"))
        .select("doc_id", (F.col("i") + 16).alias("start"))
        .unionByName(d.select("doc_id", F.lit(1).alias("start")))
    )
    nxt = F.lead("start").over(W.partitionBy("doc_id").orderBy("start"))
    spans = cuts.withColumn("next_start", nxt).join(d, "doc_id")
    chunk = F.col("text").substr(
        F.col("start"),
        F.coalesce(F.col("next_start"), F.length("text") + 1) - F.col("start"),
    )
    hashed = (
        spans.select("doc_id", chunk.alias("chunk"))
        .where(F.col("chunk") != "")
        .select("doc_id", F.md5("chunk").alias("h"), F.length("chunk").alias("chunk_len"))
    )
    by_hash = hashed.groupBy("h").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.max("chunk_len").alias("chunk_len"),
    )
    return by_hash.agg(
        F.count(F.lit(1)).alias("n_unique_chunks"),
        F.sum("n").alias("n_chunks"),
        F.count_if(F.col("n") > 1).alias("n_dup_hashes"),
        F.count_if(F.col("n_docs") > 1).alias("n_cross_doc_hashes"),
        F.sum((F.col("n") - 1) * F.col("chunk_len")).alias("dup_char_mass"),
    )


@register(
    "dedup_lsh_band_stats",
    group="J",
    oracle=f"""
    with sh as (
      select doc_id,
             list_distinct(list_transform(
                 range(len(string_split(text, ' ')) - {_SHINGLE_K - 1}),
                 i -> string_split(text, ' ')[i+1] || ' ' ||
                      string_split(text, ' ')[i+2] || ' ' ||
                      string_split(text, ' ')[i+3])) as shingles
      from documents
      where len(string_split(text, ' ')) >= {_SHINGLE_K}
    ),
    mh as (
      select doc_id,
             list_transform(range({_N_HASHES}),
               s -> list_min(list_transform(shingles,
                    x -> md5(cast(s as varchar) || '|' || x)))) as sig
      from sh
    ),
    banded as (
      select doc_id, b.band,
             {_BAND_KEY_SQL} as key
      from mh, (select unnest(range({_N_BANDS}))
                as band) b
    ),
    buckets as (
      select band, key, cast(count(*) as bigint) as k
      from banded group by 1, 2
    )
    select band,
           count(*) as n_buckets,
           cast(sum(k) as bigint) as n_docs,
           cast(max(k) as bigint) as max_bucket,
           cast(sum(k * (k - 1) / 2) as bigint) as candidate_pairs
    from buckets group by 1 order by band
    """,
)
def dedup_lsh_band_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: LSH banding diagnostics — per-band bucket statistics for
    the exact MinHash pipeline dedup_near_minhash runs (same shingles,
    same 64 md5-minhashes, same 21×3 banding — the oracle replicates
    the full signature computation, making this also a cross-engine
    proof that the banding itself is portable, not just its output).
    candidate_pairs = Σ k(k−1)/2 per band is THE tuning number: it is
    the exact join fan-out the self-join pays, and a band whose
    max_bucket explodes (a too-common band key, e.g. boilerplate
    shingles) is the skew cell to salt. At 100 TB this query is the
    cheap pre-flight run before committing to the quadratic-risk
    candidate join; the signature pass is embarrassingly parallel and
    the bucket rollup shuffles only (band, key) pairs."""
    banded = _banded_corpus(spark, sf_dir)
    buckets = banded.groupBy("band", "key").agg(
        F.count(F.lit(1)).alias("k")
    )
    return (
        buckets.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum("k").alias("n_docs"),
            F.max("k").alias("max_bucket"),
            F.sum(
                (F.col("k") * (F.col("k") - 1) / 2).cast("bigint")
            ).alias("candidate_pairs"),
        )
        .orderBy("band")
    )


@register(
    "dedup_threshold_sweep",
    group="J",
    oracle=f"""
    with {_jac_pairs_sql(tau=0.5)},
    th as (select cast(unnest([0.5, 0.6, 0.7, 0.8, 0.9]) as double) as tau)
    select tau,
           cast(count(*) filter (where jac >= tau) as bigint) as n_pairs
    from th cross join jpairs
    group by tau order by tau
    """,
)
def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: the dedup threshold sensitivity curve — how many
    near-dup pairs each Jaccard cutoff τ ∈ {0.5..0.9} would merge
    (dedup_near_minhash commits to τ = 0.8; this query is HOW that
    number gets chosen: the knee of the curve separates 'template
    siblings' from 'true dups', and a curve that hasn't flattened by
    0.9 means the corpus needs a stricter τ). Candidate pairs come
    from the shared inverted-index exact-Jaccard scan
    (_exact_jac_pairs) at the loosest τ, so the sweep is one pass
    over one pair set (each threshold is a filtered count of the
    SAME exact-Jaccard column — exact integer set sizes, one IEEE
    division; τ comparison on identical doubles). At 100 TB the pair
    source gains df-ordered prefix filtering (dedup_ngram_jaccard's
    plan) — the gram join replaces the round-1 quadratic self-join."""
    d = load(spark, sf_dir, "documents").where(
        F.size(F.split("text", " ")) >= _SHINGLE_K
    )
    sh = _spread(_shingled(d, "doc_id"), "doc_id")
    pairs = _exact_jac_pairs(sh, 0.5).select(F.col("jac").alias("j"))
    th = spark.createDataFrame(
        [(0.5,), (0.6,), (0.7,), (0.8,), (0.9,)], ["tau"]
    )
    return (
        F.broadcast(th)
        .crossJoin(pairs)
        .groupBy("tau")
        .agg(
            F.count(F.when(F.col("j") >= F.col("tau"), 1)).alias(
                "n_pairs"
            )
        )
        .orderBy("tau")
    )


@register(
    "dedup_component_size_hist",
    group="J",
    oracle=f"""
    with recursive {_jac_pairs_sql()},
    sym as materialized (
      select doc_a as src, doc_b as dst from jpairs
      union select doc_b, doc_a from jpairs
    ),
    reach as (
      select src as node, dst as r from sym
      union
      select reach.node, sym.dst as r
      from reach join sym on sym.src = reach.r
      where sym.dst <> reach.node
    ),
    comp as (
      select node, least(node, min(r)) as comp
      from reach group by 1
    ),
    sizes as (
      select comp, cast(count(*) as bigint) as sz from comp group by 1
    )
    select sz as cluster_size, count(*) as n_clusters
    from sizes group by 1 order by cluster_size
    """,
)
def dedup_component_size_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: near-dup cluster-size histogram — the shape of
    duplication (many pairs = scattered twins; a few giant clusters
    = one template exploded; the histogram decides whether keep-one
    dedup saves 2% or 40% of the corpus). Spark runs the iterative
    min-label connected components (dedup_components engine) over
    the EXACT-Jaccard ≥ τ pair graph; the oracle closes the same
    graph with a RECURSIVE transitive-closure CTE and takes
    min(reachable) per node — making this the repo's proof that the
    ITERATIVE component algorithm (not just its inputs) matches a
    declarative fixpoint cross-engine. Pair graphs are forests of
    near-cliques, so both closures are tiny regardless of corpus
    size."""
    d = load(spark, sf_dir, "documents").where(
        F.size(F.split("text", " ")) >= _SHINGLE_K
    )
    # _spread: parallelize the exact-Jaccard scan (see threshold_sweep)
    sh = _spread(_shingled(d, "doc_id"), "doc_id")
    pairs = _exact_jac_pairs(sh, _TAU).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    comp = connected_components(pairs)
    sizes = comp.groupBy("comp").agg(F.count(F.lit(1)).alias("sz"))
    return (
        sizes.groupBy(F.col("sz").alias("cluster_size"))
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .orderBy("cluster_size")
    )


@register(
    "dedup_normalized_vs_raw",
    group="J",
    oracle="""
    with h as (
      select md5(text) as raw_h,
             md5(lower(regexp_replace(trim(text), ' +', ' ', 'g')))
               as norm_h
      from documents
    ),
    r as (
      select (select count(*) from documents) as n_docs,
             (select count(distinct raw_h) from h) as n_raw_unique,
             (select count(distinct norm_h) from h) as n_norm_unique
    )
    select n_docs,
           n_docs - n_raw_unique as raw_dups,
           n_docs - n_norm_unique as norm_dups,
           (n_raw_unique - n_norm_unique) as extra_caught_by_norm,
           round(cast(n_docs - n_norm_unique as double) / n_docs, 6)
             as norm_dup_rate
    from r
    """,
)
def dedup_normalized_vs_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: canonicalization payoff — exact-dup counts under RAW
    hashing vs NORMALIZED hashing (trim, whitespace-collapse,
    lowercase): the 'extra caught by normalization' delta is what
    justifies (or not) a canonicalization pass before dedup_exact —
    real corpora hide most near-exact dups behind whitespace/case
    jitter that MinHash is overkill for. Normalization is JVM
    regex/string ops with identical semantics in DuckDB's RE2;
    distinct-hash counts are exact. One scan computing both hashes,
    three count-distincts."""
    d = load(spark, sf_dir, "documents")
    h = d.select(
        F.md5("text").alias("raw_h"),
        F.md5(
            F.lower(
                F.regexp_replace(F.trim(F.col("text")), " +", " ")
            )
        ).alias("norm_h"),
    )
    r = h.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("raw_h").alias("n_raw_unique"),
        F.count_distinct("norm_h").alias("n_norm_unique"),
    )
    return r.select(
        "n_docs",
        (F.col("n_docs") - F.col("n_raw_unique")).alias("raw_dups"),
        (F.col("n_docs") - F.col("n_norm_unique")).alias("norm_dups"),
        (F.col("n_raw_unique") - F.col("n_norm_unique")).alias(
            "extra_caught_by_norm"
        ),
        F.round(
            (F.col("n_docs") - F.col("n_norm_unique")).cast("double")
            / F.col("n_docs"),
            6,
        ).alias("norm_dup_rate"),
    )


def _shingles_k(k: int):
    # NOTE: expression form inlines the split into the lambda (O(len²)
    # per doc) — callers must pre-materialize via _shingled_k below.
    toks = F.col("__t")
    return F.array_distinct(
        F.transform(
            _gram_positions(toks, k),
            lambda i: F.concat_ws(
                " ",
                *[F.element_at(toks, i + j + 1) for j in range(k)],
            ),
        )
    )


def _shingled_k(d: DataFrame, k: int, *keep_cols: str) -> DataFrame:
    """(keep_cols…, shingles) for arbitrary k with the token array
    materialized first (same O(len²) fix as _shingled)."""
    t = d.select(*keep_cols, F.split("text", " ").alias("__t"))
    return t.select(*keep_cols, _shingles_k(k).alias("shingles"))


@register(
    "dedup_shingle_k_sweep",
    group="J",
    oracle="with "
    + ",".join(_jac_pairs_sql(k=k, tau=0.8, prefix=f"k{k}_") for k in (2, 3, 4))
    + """,
    pairs as (
    """
    + "\n      union all\n".join(
        f"select {k} as k from k{k}_jpairs" for k in (2, 3, 4)
    )
    + """
    )
    select k as shingle_k, cast(count(*) as bigint) as n_dup_pairs
    from pairs group by 1 order by shingle_k
    """,
)
def dedup_shingle_k_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: shingle-size sensitivity — near-dup pair counts at
    τ = 0.8 for k ∈ {2, 3, 4} word shingles: the OTHER dedup tuning
    axis (dedup_threshold_sweep fixes k and sweeps τ; this fixes τ
    and sweeps k — small k over-merges by sharing common word pairs,
    large k under-merges by fragmenting at every edit; the k where
    the count stabilizes is the right granularity for the corpus).
    Three exact-Jaccard passes over per-k distinct shingle sets via
    the shared inverted-index join (_exact_jac_pairs); counts exact.
    At 100 TB each k's pass gains df-ordered prefix filtering
    (dedup_ngram_jaccard's plan) — no quadratic join anywhere."""
    d = load(spark, sf_dir, "documents")
    out = None
    for k in (2, 3, 4):
        # _spread: parallelize each k's exact-Jaccard scan
        sh = _spread(
            _shingled_k(
                d.where(F.size(F.split("text", " ")) >= k), k, "doc_id"
            ),
            "doc_id",
        )
        cnt = (
            _exact_jac_pairs(sh, 0.8)
            .agg(F.count(F.lit(1)).alias("n_dup_pairs"))
            .select(F.lit(k).alias("shingle_k"), "n_dup_pairs")
        )
        out = cnt if out is None else out.unionAll(cnt)
    return out.orderBy("shingle_k")


@register(
    "dedup_mixture_impact",
    group="J",
    oracle="""
    with keep as (
      select source, md5(text) as th,
             row_number() over (partition by md5(text)
               order by doc_id) as rk
      from documents
    ),
    before as (
      select source, cast(count(*) as bigint) as n_before
      from documents group by 1
    ),
    after as (
      select source, cast(count(*) as bigint) as n_after
      from keep where rk = 1 group by 1
    ),
    tot as (
      select (select cast(sum(n_before) as bigint) from before) as tb,
             (select cast(sum(n_after) as bigint) from after) as ta
    )
    select b.source, b.n_before, a.n_after,
           round(cast(b.n_before as double) / tot.tb, 6)
             as share_before,
           round(cast(a.n_after as double) / tot.ta, 6) as share_after,
           round(cast(a.n_after as double) / tot.ta
                 - cast(b.n_before as double) / tot.tb, 6)
             as share_shift
    from before b join after a using (source) cross join tot
    order by b.source
    """,
)
def dedup_mixture_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: dedup's effect on the corpus mixture — per-source share
    BEFORE vs AFTER keep-first exact dedup (min doc_id per text
    hash): dedup is not mixture-neutral — a source that mostly
    echoes others loses share, so a carefully balanced mixture
    (corpus_importance_weights) drifts the moment dedup runs, and
    the share_shift column is the correction to feed back. Keeper
    selection is the deterministic (hash, doc_id) rank used across
    the dedup family; counts exact; shifts are fixed-order
    differences of exact ratios."""
    d = load(spark, sf_dir, "documents")
    before = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_before")
    )
    # keeper per content key = min doc_id (r9: one aggregate replaces
    # the row_number-over-md5(text) window + rk=1 filter — guide §2.3;
    # doc_id is unique, so min(struct(doc_id, source)) carries the
    # keeper's source exactly).
    after = (
        d.select(F.md5("text").alias("k"), "doc_id", "source")
        .groupBy("k")
        .agg(
            F.min(
                F.struct(F.col("doc_id").alias("doc_id"), F.col("source").alias("source"))
            ).alias("m")
        )
        .groupBy(F.col("m.source").alias("source"))
        .agg(F.count(F.lit(1)).alias("n_after"))
    )
    tb = before.agg(F.sum("n_before").alias("tb"))
    ta = after.agg(F.sum("n_after").alias("ta"))
    j = (
        before.join(after, "source")
        .crossJoin(F.broadcast(tb))
        .crossJoin(F.broadcast(ta))
    )
    sb = F.col("n_before").cast("double") / F.col("tb")
    sa = F.col("n_after").cast("double") / F.col("ta")
    return j.select(
        "source",
        "n_before",
        "n_after",
        F.round(sb, 6).alias("share_before"),
        F.round(sa, 6).alias("share_after"),
        F.round(sa - sb, 6).alias("share_shift"),
    ).orderBy("source")


@register(
    "dedup_keeper_policy_compare",
    group="J",
    oracle="""
    with h as (
      select doc_id, n_chars, md5(text) as th from documents
    ),
    ranked as (
      select n_chars,
             row_number() over (partition by th
               order by doc_id) as rk_first,
             row_number() over (partition by th
               order by n_chars desc, doc_id) as rk_longest,
             row_number() over (partition by th
               order by n_chars asc, doc_id) as rk_shortest
      from h
    )
    select
      cast(count(*) filter (where rk_first = 1) as bigint)
        as n_kept,
      cast(sum(n_chars) filter (where rk_first = 1) as bigint)
        as chars_keep_first,
      cast(sum(n_chars) filter (where rk_longest = 1) as bigint)
        as chars_keep_longest,
      cast(sum(n_chars) filter (where rk_shortest = 1) as bigint)
        as chars_keep_shortest,
      round(cast(sum(n_chars) filter (where rk_longest = 1) as double)
            / sum(n_chars) filter (where rk_shortest = 1), 6)
        as longest_vs_shortest_ratio
    from ranked
    """,
)
def dedup_keeper_policy_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: survivorship-policy comparison — exact-dup groups keep
    ONE doc, but WHICH one changes the corpus: keep-first (stable,
    the dedup_exact default), keep-longest (maximizes retained
    text), keep-shortest (minimizes). All three policies evaluated
    in one pass via three deterministic in-group rankings, reporting
    retained characters per policy and the longest/shortest spread —
    if the ratio is ~1 the policy choice is free; a large spread
    means duplicates differ materially and 'exact dup' deserves a
    second look (probably near-dups with padding). Exact integer
    character sums; identical group counts by construction."""
    d = load(spark, sf_dir, "documents")
    h = d.select("doc_id", "n_chars", F.md5("text").alias("th"))
    wp = W.partitionBy("th")
    ranked = h.select(
        "n_chars",
        F.row_number().over(wp.orderBy("doc_id")).alias("rk_first"),
        F.row_number()
        .over(wp.orderBy(F.col("n_chars").desc(), "doc_id"))
        .alias("rk_longest"),
        F.row_number()
        .over(wp.orderBy(F.col("n_chars").asc(), "doc_id"))
        .alias("rk_shortest"),
    )
    kf = F.when(F.col("rk_first") == 1, F.col("n_chars"))
    kl = F.when(F.col("rk_longest") == 1, F.col("n_chars"))
    ks = F.when(F.col("rk_shortest") == 1, F.col("n_chars"))
    return ranked.agg(
        F.count(F.when(F.col("rk_first") == 1, 1)).alias("n_kept"),
        F.sum(kf).alias("chars_keep_first"),
        F.sum(kl).alias("chars_keep_longest"),
        F.sum(ks).alias("chars_keep_shortest"),
        F.round(
            F.sum(kl).cast("double") / F.sum(ks), 6
        ).alias("longest_vs_shortest_ratio"),
    )


@register(
    "dedup_containment",
    group="J",
    oracle="""
    with sh as (
        select doc_id,
               list_distinct(list_transform(
                   range(len(tk) - 1),
                   i -> tk[i+1] || ' ' || tk[i+2])) as grams
        from (select doc_id, string_split(text, ' ') as tk
              from documents)
    ),
    sizes as (select doc_id, len(grams) as n from sh),
    flat as (select doc_id, unnest(grams) as g from sh),
    inter as (
        select a.doc_id as doc_a, b.doc_id as doc_b, count(*) as c
        from flat a join flat b on a.g = b.g and a.doc_id < b.doc_id
        group by 1, 2
    )
    select doc_a, doc_b,
           round(c * 1.0 / sa.n, 6) as containment_ab,
           round(c * 1.0 / sb.n, 6) as containment_ba
    from inter
    join sizes sa on sa.doc_id = doc_a
    join sizes sb on sb.doc_id = doc_b
    where c * 2 >= greatest(sa.n, sb.n)
    order by doc_a, doc_b
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: bigram-set CONTAINMENT (asymmetric Jaccard, Broder's
    other resemblance measure) — |A∩B|/|A| and |A∩B|/|B| for pairs
    where the overlap covers at least half of the larger set. Jaccard
    misses subset-duplicates (a doc pasted inside a longer one scores
    low Jaccard but containment ≈ 1) — this is the detector for
    quote-expansion and boilerplate-wrapping dup classes that J2's
    symmetric threshold passes over. Inverted-index pair generation
    (shared-gram equi-join, see _exact_jac_pairs); at scale this
    stage only ever runs on LSH candidate pairs; the integer gate
    (2*|∩| >= max(|A|,|B|)) keeps the filter exact across engines."""
    # tokens materialized first (O(len²) re-split hazard, see _shingled)
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("t")
    )
    toks = F.col("t")
    grams = F.array_distinct(
        F.transform(
            _gram_positions(toks, 2),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
            ),
        )
    )
    # Inverted-index form (see _exact_jac_pairs): only pairs sharing a
    # gram are scored, and the containment gate 2c >= max(|A|,|B|)
    # implies c >= 1 for any non-empty set, so output is identical.
    g = _spread(d.select("doc_id", grams.alias("grams")), "doc_id").localCheckpoint()
    sizes = g.select("doc_id", F.size("grams").alias("n"))
    flat = g.select("doc_id", F.explode("grams").alias("g"))
    inter = (
        flat.alias("a")
        .join(
            flat.alias("b"),
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b")),
            "doc_b",
        )
        .where(F.col("c") * 2 >= F.greatest("n_a", "n_b"))
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("c") * 1.0 / F.col("n_a"), 6).alias("containment_ab"),
            F.round(F.col("c") * 1.0 / F.col("n_b"), 6).alias("containment_ba"),
        )
        .orderBy("doc_a", "doc_b")
    )


@register(
    "dedup_lsh_scurve",
    group="J",
    oracle=f"""
    with s as (
      select cast(g as double) / 20 as sim
      from generate_series(1, 19) t(g)
    )
    select round(sim, 6) as jaccard,
           round(1 - pow(1 - pow(sim, {_BAND_ROWS}), {_N_BANDS}), 6)
             as p_candidate,
           1 - pow(1 - pow(sim, {_BAND_ROWS}), {_N_BANDS}) >= 0.5
             as likely_caught
    from s order by jaccard
    """,
)
def dedup_lsh_scurve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: the analytic LSH S-curve for this repo's MinHash banding
    parameters (21 bands x 3 rows since r5, dedup_near_minhash) —
    candidate probability 1-(1-s^r)^b for Jaccard s in 0.05 steps,
    with the 'caught with >= 50% probability' flag. This is the tuning
    artifact that justifies the band choice: the curve's inflection
    (~(1/b)^(1/r) = 0.36 here, vs 0.18 at the old 32x2 — exactly why
    r=3 sheds the moderate-Jaccard candidate overshoot) is the
    effective dedup threshold, and re-running the sweep for other
    (r, b) is how a 100 TB dedup run budgets recall vs candidate
    volume BEFORE shuffling anything. Pure closed-form math on a
    generated grid — no data scan; pow is round-6 gated. Both sides
    parameterize on the live _BAND_ROWS/_N_BANDS, so the curve can
    never drift from the registered pipeline."""
    s = spark.range(1, 20).select(
        (F.col("id").cast("double") / 20).alias("sim")
    )
    p = 1 - F.pow(1 - F.pow(F.col("sim"), _BAND_ROWS), _N_BANDS)
    return s.select(
        F.round("sim", 6).alias("jaccard"),
        F.round(p, 6).alias("p_candidate"),
        (p >= 0.5).alias("likely_caught"),
    ).orderBy("jaccard")


@register(
    "dedup_simhash_portable",
    group="J",
    oracle="""
    with toks as (
      select distinct doc_id, unnest(string_split(text, ' ')) as tok
      from documents where doc_id < 300
    ),
    bits as (
      select doc_id, b.bit,
             cast(('0x' || substr(md5(tok), 1, 8)) as bigint) as h
      from toks cross join (select unnest(range(16)) as bit) b
    ),
    votes as (
      select doc_id, bit,
             cast(sum(case when (h // cast(pow(2, bit) as bigint)) % 2 = 1
                           then 1 else -1 end) as bigint) as s
      from bits group by 1, 2
    ),
    sig as (
      select doc_id,
             cast(sum(case when s > 0
                           then cast(pow(2, bit) as bigint)
                           else 0 end) as bigint) as simhash
      from votes group by 1
    ),
    dists as (
      select bit_count(xor(a.simhash, b.simhash)) as hamming
      from sig a join sig b on a.doc_id < b.doc_id
    )
    select hamming, cast(count(*) as bigint) as n_pairs
    from dists group by 1 order by hamming
    """,
)
def dedup_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: ENGINE-PORTABLE 16-bit SimHash with a pairwise Hamming
    histogram — the oracle-checkable twin of dedup_simhash (which
    uses Spark-internal xxhash64, §2.L trap 7). Each token votes ±1
    per bit from its md5-derived hash; the per-doc signature packs
    the majority signs; near-dups concentrate at small Hamming
    distances (the Charikar/Manku-Jain-Sarma web-dedup detector).
    Per-(doc,bit) votes are one bounded-key rollup (16x token rows);
    the probe subset (doc_id < 300) keeps the exact pair histogram
    honest — at 100 TB the histogram runs on bit-bucket candidates,
    not all pairs. bit_count(xor) is exact integer in both engines."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).distinct()
    bits = toks.crossJoin(
        F.broadcast(spark.range(16).select(F.col("id").alias("bit")))
    ).select(
        "doc_id",
        "bit",
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10)
        .cast("long")
        .alias("h"),
    )
    bitmask = F.expr("cast(shiftleft(1L, cast(bit as int)) as bigint)")
    votes = bits.groupBy("doc_id", "bit").agg(
        F.sum(
            F.when((F.col("h").bitwiseAND(bitmask)) != 0, 1).otherwise(-1)
        ).alias("s")
    )
    sig = votes.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, bitmask).otherwise(0)
        ).alias("simhash")
    )
    a = sig.select(F.col("doc_id").alias("da"), F.col("simhash").alias("sa"))
    b = sig.select(F.col("doc_id").alias("db"), F.col("simhash").alias("sb"))
    dists = a.join(b, F.col("da") < F.col("db")).select(
        F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).alias("hamming")
    )
    return (
        dists.groupBy("hamming")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("hamming")
    )


@register(
    "dedup_fellegi_sunter",
    group="J",
    oracle="""
    with r as (
      select c_custkey, c_mktsegment, c_acctbal, c_name,
             row_number() over (order by c_acctbal, c_custkey) as rn
      from customer
    ),
    pairs as (
      select a.c_custkey as id_a, b.c_custkey as id_b,
             cast(a.c_mktsegment = b.c_mktsegment as integer) as agr_segment,
             cast(floor(a.c_acctbal / 1000.0) = floor(b.c_acctbal / 1000.0)
                  as integer) as agr_balband,
             cast(length(a.c_name) = length(b.c_name) as integer) as agr_namelen,
             cast(sign(a.c_acctbal) = sign(b.c_acctbal) as integer) as agr_balsign
      from r a join r b on b.rn between a.rn + 1 and a.rn + 9
    ),
    scored as (
      select id_a, id_b,
             round(cast(
                     (case when agr_segment = 1 then 2.169925
                           else -3.0 end)
                   + (case when agr_balband = 1 then 3.087463
                           else -2.584963 end)
                   + (case when agr_namelen = 1 then 1.415037
                           else -1.807355 end)
                   + (case when agr_balsign = 1 then 0.925999
                           else -3.321928 end) as double), 4) as score
      from pairs
    )
    select score,
           count(*) as n_pairs,
           cast(score >= 3.0 as integer) as is_match_candidate
    from scored group by score
    """,
)
def dedup_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probabilistic record linkage (Fellegi–Sunter 1969, public
    method) with SORTED-NEIGHBORHOOD blocking (Hernández & Stolfo,
    SIGMOD 1995): records are ranked by the blocking sort key
    (c_acctbal, c_custkey — total order, tie-free) and each record is
    compared only to its next w−1 = 9 neighbors in rank order, so the
    candidate count is exactly ~N·(w−1) — LINEAR in data size. This
    replaces the r3 nation-block equi-join, whose 25 fixed blocks made
    candidates grow quadratically (VERDICT r3 "What's wrong" §1; any
    fixed-cardinality attribute block has the same asymptote).

    Scale shape: the global rank is NOT a single-partition window — it
    is range-partition (repartitionByRange on the sort key) →
    per-partition row_number → plus cumulative per-partition offsets
    (a ≤#partitions-row collect, the distributed zipWithIndex shape).
    Rank = local rank + offset is exact for ANY boundary placement
    because range partitions are disjoint and ordered. Candidate
    generation is an explode of the 9 rank offsets + an equi-join on
    rn — no range join, no skew (every rank key is unique). Each pair
    gets an agreement vector over four comparator fields, each
    contributing log2(m/u) on agreement / log2((1−m)/(1−u)) on
    disagreement with fixed published-style m/u priors; the result is
    the match-score histogram with the θ≥3 candidate flag — the
    decision curve an ER pipeline thresholds. In production SNM runs
    several passes with different sort keys (name phonetics, address)
    and unions the candidates; one pass is registered here and the
    oracle mirrors it exactly (row_number over the same total order).
    """
    pairs = _snm_candidate_pairs(spark, sf_dir)

    # log2(m/u) agreement / log2((1-m)/(1-u)) disagreement weights,
    # pre-rounded to 6 decimals and used as the SAME literals in the
    # oracle SQL — libm log2 can differ across engines by an ulp, a
    # shared literal cannot.
    def w(agree, on: float, off: float):
        return F.when(agree, F.lit(on)).otherwise(F.lit(off))

    score = F.round(
        w(F.col("seg_a") == F.col("seg_b"), 2.169925, -3.0)
        + w(
            F.floor(F.col("bal_a") / 1000.0) == F.floor(F.col("bal_b") / 1000.0),
            3.087463,
            -2.584963,
        )
        + w(F.col("nlen_a") == F.col("nlen_b"), 1.415037, -1.807355)
        + w(F.signum("bal_a") == F.signum("bal_b"), 0.925999, -3.321928),
        4,
    ).alias("score")
    return (
        pairs.select(score)
        .groupBy("score")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select(
            "score",
            "n_pairs",
            (F.col("score") >= 3.0).cast("int").alias("is_match_candidate"),
        )
    )


def _snm_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sorted-neighborhood candidate generator for
    dedup_fellegi_sunter (and the SCALING.md growth probe): attribute
    pairs for each record vs its next w−1 rank neighbors. Exactly
    ~N·(w−1) rows — linear in data."""
    w_win = 10  # SNM window: compare to the next w-1 = 9 neighbors

    def build_ranked() -> DataFrame:
        c = load(spark, sf_dir, "customer").select(
            "c_custkey",
            "c_mktsegment",
            "c_acctbal",
            F.length("c_name").alias("nlen"),
        )
        # distributed global rank over (c_acctbal, c_custkey) — this
        # site is where the technique was born; it now lives in
        # distrank (r4) and is shared by every converted rank/prefix
        # operator.
        from datalakecrawler_spark.distrank import with_global_row_number

        return with_global_row_number(
            c, spark, ["c_acctbal", "c_custkey"], out="rn"
        )

    # The rank index is the SNM blocking structure — in production ER
    # you build it once per corpus snapshot and run every linkage pass
    # (and every re-threshold of the decision curve) against it, so it
    # is memoized per (applicationId, sf_dir) exactly like the banded
    # MinHash signature table (_banded_corpus).
    ranked = memoized_checkpoint(_SNM_RANK_MEMO, spark, sf_dir, build_ranked)
    a = ranked.select(
        F.col("c_custkey").alias("id_a"),
        F.col("c_mktsegment").alias("seg_a"),
        F.col("c_acctbal").alias("bal_a"),
        F.col("nlen").alias("nlen_a"),
        F.explode(
            F.array(*[F.col("rn") + F.lit(i) for i in range(1, w_win)])
        ).alias("rn_b"),
    )
    b = ranked.select(
        F.col("c_custkey").alias("id_b"),
        F.col("c_mktsegment").alias("seg_b"),
        F.col("c_acctbal").alias("bal_b"),
        F.col("nlen").alias("nlen_b"),
        F.col("rn").alias("rn_b"),
    )
    return a.join(b, "rn_b")


@register(
    "dedup_duplicate_spans",
    group="J",
    oracle="""
    with toks as (
      select doc_id, string_split(text, ' ') as t from documents
    ),
    grams as (
      select doc_id,
             unnest(range(greatest(len(t) - 4, 0))) as pos,
             unnest(list_transform(range(greatest(len(t) - 4, 0)),
                    i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
                         t[i+4] || ' ' || t[i+5])) as g
      from toks
    ),
    dupg as (
      select g from grams group by g having count(distinct doc_id) > 1
    ),
    starts as (
      select distinct doc_id, pos from grams join dupg using (g)
    ),
    covered as (
      select distinct doc_id, pos + unnest(range(5)) as tok from starts
    ),
    base as (
      select doc_id, cast(len(string_split(text, ' ')) as bigint) as n_tokens
      from documents
    )
    select b.doc_id, b.n_tokens,
           coalesce(s.n_starts, 0) as n_dup_spans,
           coalesce(c.n_cov, 0) as n_dup_tokens,
           round(coalesce(c.n_cov, 0) * 1.0 / b.n_tokens, 6)
             as dup_token_fraction
    from base b
    left join (select doc_id, cast(count(*) as bigint) as n_starts
               from starts group by 1) s using (doc_id)
    left join (select doc_id, cast(count(*) as bigint) as n_cov
               from covered group by 1) c using (doc_id)
    """,
)
def dedup_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: corpus-duplicated SPAN profiling — the C4/RefinedWeb
    boilerplate detector: a 5-gram occurring in more than one document
    marks its 5-token span as duplicated; per document we report the
    duplicated-span count and the fraction of tokens covered by the
    UNION of those spans (distinct covered token indices, so
    overlapping spans don't double-count). This is the measurement
    behind span-level dedup ("remove any window repeated verbatim
    across documents"), which catches templated headers/footers that
    whole-document Jaccard (J2) scores as unique.

    Plan shape, all linear: gram explode (corpus token volume) → one
    shuffle on the gram to find cross-doc grams → shuffle join back on
    the gram → 5× index explode → distinct per (doc, token index) →
    per-doc counts. No self-join, no quadratic term; at 100 TB the
    cross-doc gram table is the only wide shuffle and it is
    count-distinct-combinable map-side."""
    # Materialize the token array in its own projection FIRST: inlining
    # `split(text)` into the transform lambda would re-split the whole
    # document for every element_at reference (5 per gram position —
    # O(len²) work per doc; measured 11.4 s → ~1 s cold at sf0.1).
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("t")
    )
    toks = F.col("t")
    k = 5

    def build_span_index() -> DataFrame:
        grams_arr = F.transform(
            _gram_positions(toks, k),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j + 1) for j in range(k)]
            ),
        )
        grams = d.select("doc_id", F.posexplode(grams_arr).alias("pos", "g"))
        dupg = (
            grams.groupBy("g")
            .agg(F.countDistinct("doc_id").alias("nd"))
            .where(F.col("nd") > 1)
            .select("g")
        )
        return grams.join(dupg, "g").select("doc_id", "pos").distinct()

    # (doc, pos) of every cross-document-duplicated gram = the span-
    # dedup inverted index. A boilerplate-removal pipeline builds this
    # once per corpus snapshot and then serves every consumer (span
    # stripping, per-doc coverage stats, source-level boilerplate
    # reports) from it, so it is memoized per (applicationId, sf_dir)
    # like the banded MinHash signature table. The gram explode — the
    # only corpus-sized shuffle — runs once, not once per query.
    starts = memoized_checkpoint(
        _SPAN_INDEX_MEMO, spark, sf_dir, build_span_index
    )
    covered = (
        starts.select(
            "doc_id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + (k - 1))).alias(
                "tok"
            ),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_cov"))
    )
    n_spans = starts.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_starts"))
    base = d.select("doc_id", F.size(toks).cast("long").alias("n_tokens"))
    return (
        base.join(n_spans, "doc_id", "left")
        .join(covered, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_starts", F.lit(0)).alias("n_dup_spans"),
            F.coalesce("n_cov", F.lit(0)).alias("n_dup_tokens"),
            F.round(
                F.coalesce("n_cov", F.lit(0)) * 1.0 / F.col("n_tokens"), 6
            ).alias("dup_token_fraction"),
        )
    )


@register(
    "dedup_prefix_fingerprint",
    group="J",
    oracle="""
    with fp as (
      select doc_id, source,
             md5(lower(array_to_string(string_split(text, ' ')[1:12], ' ')))
               as prefix_fp
      from documents
    ),
    clusters as (
      select prefix_fp,
             cast(count(*) as bigint) as n_docs,
             cast(count(distinct source) as bigint) as n_sources,
             min(doc_id) as keeper
      from fp group by prefix_fp having count(*) > 1
    )
    select prefix_fp, n_docs, n_sources, keeper
    from clusters order by n_docs desc, prefix_fp
    """,
)
def dedup_prefix_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: prefix-fingerprint dup clusters — md5 over the first 12
    lowercased tokens. The web-crawl workhorse for the 'same page,
    different tail' dup class (mirrored articles with distinct
    boilerplate endings, truncation variants, pagination copies) that
    whole-document hashing (J1) misses and shingle-Jaccard only
    catches when the shared prefix dominates the length. Reporting
    n_sources per cluster separates same-source re-crawls from true
    cross-source syndication — the signal that decides keep-one vs
    keep-per-source policy. One hash + one shuffle on the 16-byte
    fingerprint; linear at any scale (same shape as dedup_exact)."""
    d = load(spark, sf_dir, "documents")
    fp = F.md5(
        F.lower(F.concat_ws(" ", F.slice(F.split("text", " "), 1, 12)))
    )
    return (
        d.select("doc_id", "source", fp.alias("prefix_fp"))
        .groupBy("prefix_fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.min("doc_id").alias("keeper"),
        )
        .where(F.col("n_docs") > 1)
        .orderBy(F.col("n_docs").desc(), "prefix_fp")
    )
