"""Group J (text) — training-data text analysis (SURVEY.md §2 J6-J10 +
task-mandated extras: language-ID heuristic, quality scoring, BPE-ish
token counting, document fingerprinting).

All operators are pure DataFrame compositions (split/explode/window) —
no Python in the hot path. Scale: explode(tokens) produces the token
stream shuffled only by the downstream groupBy key; TF-IDF is joins +
windows with no driver-side vocabulary materialization (SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from datalakecrawler_spark.io import load, row_count
from datalakecrawler_spark.registry import SUM_D, davg, dsum, register


def _bigram_positions(toks):
    """Adjacent-bigram index array [0 .. size−2], empty-safe: the naive
    F.sequence(0, size−2) DESCENDS to [0,−1] on <2-token docs and
    element_at(toks, 0) raises at runtime (ADVICE r1; fixtures mask it
    at ≥10 tokens/doc). slice-of-sequence is branch-free and
    type-stable: sequence(0, n) sliced to its first n−1 elements is
    [0..n−2], and slice length 0 yields []."""
    return F.slice(
        F.sequence(F.lit(0), F.size(toks)),
        1,
        F.greatest(F.size(toks) - 1, F.lit(0)),
    )

_WORDCOUNT_ORACLE = """
    select w as word, count(*) as cnt
    from (select unnest(string_split(text, ' ')) as w from documents) t
    group by 1 order by cnt desc, word limit 50
"""


def _wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "word")
        .limit(50)
    )


@register("text_tokenize_wordcount", group="J", oracle=_WORDCOUNT_ORACLE)
def text_tokenize_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: tokenize + global top-50 word counts."""
    return _wordcount(spark, sf_dir)


@register("doc_wordcount", group="J", oracle=_WORDCOUNT_ORACLE)
def doc_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Headline benchmark twin of J6 (BASELINE.md `doc_wordcount`)."""
    return _wordcount(spark, sf_dir)


@register(
    "text_ngrams",
    group="J",
    oracle="""
    select bigram, count(*) as cnt from (
        select tok || ' ' || lead(tok) over (partition by doc_id
                                             order by pos) as bigram
        from (select doc_id,
                     unnest(range(len(string_split(text, ' ')))) as pos,
                     unnest(string_split(text, ' ')) as tok
              from documents) flat
    ) b where bigram is not null
    group by 1 order by cnt desc, bigram limit 50
    """,
)
def text_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: corpus bigram counts, top-50. Spark builds bigrams inside the
    array (one transform over index positions — no shuffle until the
    count); the oracle uses a lead() window over exploded tokens."""
    # tokens materialized first: inlining split(text) into the lambda
    # re-splits the document per element_at reference (O(len²)/doc).
    d = load(spark, sf_dir, "documents").select(F.split("text", " ").alias("t"))
    toks = F.col("t")
    bigrams = F.transform(
        _bigram_positions(toks),
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
        ),
    )
    return (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "bigram")
        .limit(50)
    )


@register(
    "text_tfidf_topterms",
    group="J",
    oracle="""
    with flat as (
        select doc_id, unnest(string_split(text, ' ')) as term from documents
    ),
    tf as (select doc_id, term, count(*) as tf from flat group by 1, 2),
    df as (select term, count(distinct doc_id) as df from flat group by 1),
    n as (select count(*) as n_docs from documents),
    scored as (
        select tf.doc_id, tf.term,
               round(tf.tf * ln(n.n_docs * 1.0 / df.df), 6) as score
        from tf join df using (term) cross join n
    )
    select doc_id, term, score, rk from (
        select *, row_number() over (partition by doc_id
                                     order by score desc, term) as rk
        from scored) t
    where rk <= 3
    """,
)
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8: TF-IDF top-3 terms per doc — pure joins/windows, the document
    frequency table stays distributed (never collected to the driver).
    The df table derives FROM the tf table (tf already has exactly one
    row per (doc, term), so df is a plain count, not a countDistinct
    over re-exploded tokens) — one explode and one exchange instead of
    two of each; df is vocabulary-sized and broadcasts, so tf never
    shuffles on term for the join."""
    d = load(spark, sf_dir, "documents")
    flat = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = flat.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = row_count(spark, sf_dir, "documents")  # catalog statistic
    scored = tf.join(F.broadcast(df), "term").select(
        "doc_id",
        "term",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias(
            "score"
        ),
    )
    w = W.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("doc_id", "term", "score", "rk")
    )


@register(
    "text_doc_stats",
    group="J",
    oracle=f"""
    with base as (
        select lang, n_chars, len(string_split(text, ' ')) as n_toks
        from documents
    ),
    stats as (
        select lang, count(*) as n_docs,
               round(cast(sum(cast(n_chars as decimal(38,10))) as double) / count(n_chars), 6) as avg_chars,
               round(cast(sum(cast(n_toks as decimal(38,10))) as double) / count(n_toks), 6) as avg_tokens
        from base group by lang
    ),
    vocab as (
        select lang, count(distinct tok) as vocab_size
        from (select lang, unnest(string_split(text, ' ')) as tok
              from documents) t
        group by lang
    )
    select stats.lang, n_docs, avg_chars, avg_tokens, vocab_size
    from stats join vocab using (lang)
    """,
)
def text_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9: per-language corpus stats — doc count, mean chars/tokens,
    vocabulary size (distinct-token agg joined back; the explode never
    mixes with the row-level averages)."""
    d = load(spark, sf_dir, "documents")
    base = d.select(
        "lang", "n_chars", F.size(F.split("text", " ")).alias("n_toks")
    )
    stats = base.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        davg("n_chars").alias("avg_chars"),
        davg("n_toks").alias("avg_tokens"),
    )
    vocab = (
        d.select("lang", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("lang")
        .agg(F.countDistinct("tok").alias("vocab_size"))
    )
    return stats.join(vocab, "lang")


@register(
    "text_lang_distribution",
    group="J",
    oracle="""
    select lang, count(*) as n_docs,
           round(count(*) * 100.0 /
                 cast(sum(count(*)) over () as double), 6) as pct
    from documents group by lang
    """,
)
def text_lang_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10: language histogram with percent-of-total (window over agg).
    Integer counts → the division is deterministic in both engines."""
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    total = F.sum("n_docs").over(W.partitionBy())
    return counts.select(
        "lang",
        "n_docs",
        F.round(F.col("n_docs") * 100.0 / total.cast("double"), 6).alias("pct"),
    )


# ---------------------------------------------------------------------------
# Task-mandated text extras: langid / quality / token-count / fingerprint
# ---------------------------------------------------------------------------

# Marker vocabularies per language for the n-gram/keyword heuristic. The
# fixture corpus is a synthetic analytics word-salad, so markers are
# drawn from its vocabulary — the *mechanism* (per-lang marker overlap,
# argmax with deterministic tie-break) is the real language-ID shape.
_LANG_MARKERS = {
    "de": ["table", "scan", "row"],
    "en": ["key", "value", "fast"],
    "es": ["agg", "slow", "index"],
    "fr": ["join", "sort", "hash"],
    "zh": ["query", "plan", "cost"],
}


@register(
    "text_langid_heuristic",
    group="J",
    oracle="""
    with scores as (
        select doc_id, lang as true_lang,
    """
    + ",\n".join(
        f"       len(list_intersect(list_distinct(string_split(text, ' ')), "
        f"{words!r}::varchar[])) as s_{lang}"
        for lang, words in _LANG_MARKERS.items()
    )
    + """
        from documents
    )
    select doc_id, true_lang,
           case greatest(s_de, s_en, s_es, s_fr, s_zh)
                when s_de then 'de' when s_en then 'en' when s_es then 'es'
                when s_fr then 'fr' else 'zh' end as pred_lang
    from scores
    """,
)
def text_langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID by marker-vocabulary overlap: score each language as
    |distinct tokens ∩ markers|, predict the argmax (first language in
    de<en<es<fr<zh order wins ties — mirrored by the CASE order)."""
    d = load(spark, sf_dir, "documents")
    toks = F.array_distinct(F.split("text", " "))
    scores = d.select(
        "doc_id",
        F.col("lang").alias("true_lang"),
        *[
            F.size(
                F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))
            ).alias(f"s_{lang}")
            for lang, words in _LANG_MARKERS.items()
        ],
    )
    best = F.greatest(*[F.col(f"s_{lang}") for lang in _LANG_MARKERS])
    pred = F.when(F.col("s_de") == best, "de")
    for lang in ["en", "es", "fr"]:
        pred = pred.when(F.col(f"s_{lang}") == best, lang)
    pred = pred.otherwise("zh")
    return scores.select("doc_id", "true_lang", pred.alias("pred_lang"))


_STOPWORDS = ["the", "a", "of", "and", "key", "value", "row"]


@register(
    "text_quality_score",
    group="J",
    oracle=f"""
    with feat as (
        select doc_id,
               len(string_split(text, ' ')) as n_toks,
               round(n_chars * 1.0 / len(string_split(text, ' ')), 6)
                   as avg_word_len,
               round(len(list_filter(string_split(text, ' '),
                         t -> list_contains({_STOPWORDS!r}::varchar[], t)))
                     * 1.0 / len(string_split(text, ' ')), 6) as stop_ratio
        from documents
    )
    select doc_id, n_toks, avg_word_len, stop_ratio,
           round(least(n_toks / 100.0, 1.0) * (1 - stop_ratio), 6) as quality
    from feat
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring for training-data filtering: token count, mean
    word length, stopword ratio, combined into a [0,1] quality score
    (length-capped × non-stopword mass) — the C4/Gopher-rule shape."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_toks = F.size(toks)
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS])
    stop_ratio = F.round(
        F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
        * 1.0
        / n_toks,
        6,
    )
    avg_word_len = F.round(F.col("n_chars") * 1.0 / n_toks, 6)
    return d.select(
        "doc_id",
        n_toks.alias("n_toks"),
        avg_word_len.alias("avg_word_len"),
        stop_ratio.alias("stop_ratio"),
    ).withColumn(
        "quality",
        F.round(
            F.least(F.col("n_toks") / 100.0, F.lit(1.0))
            * (1 - F.col("stop_ratio")),
            6,
        ),
    )


@register(
    "text_token_count_bpe",
    group="J",
    oracle="""
    select doc_id,
           len(string_split(text, ' ')) as ws_tokens,
           cast(list_aggregate(list_transform(string_split(text, ' '),
                w -> cast(ceil(length(w) / 4.0) as bigint)), 'sum') as bigint)
               as bpe_tokens
    from documents
    """,
)
def text_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish estimate (a real
    BPE averages ~4 chars/token; ceil(len/4) per word is the standard
    cheap estimator for budget planning)."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    bpe = F.aggregate(
        F.transform(toks, lambda w: F.ceil(F.length(w) / 4.0)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
    )


@register(
    "text_fingerprint",
    group="J",
    oracle="""
    with fp as (
        select doc_id,
               md5(array_to_string(list_sort(list_distinct(
                   string_split(text, ' '))), ' ')) as fingerprint
        from documents
    )
    select fingerprint, count(*) as n_docs, min(doc_id) as keeper
    from fp group by 1 having count(*) > 1
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: content signature = md5 over the sorted
    distinct vocabulary (order-normalized, portable across engines —
    SURVEY §2.L trap 7). Groups sharing a fingerprint are vocabulary-
    identical docs — the cheap pre-filter before MinHash (J2)."""
    d = load(spark, sf_dir, "documents")
    fp = F.md5(
        F.array_join(F.array_sort(F.array_distinct(F.split("text", " "))), " ")
    )
    return (
        d.select("doc_id", fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keeper"))
        .where(F.col("n_docs") > 1)
    )


@register(
    "split_train_holdout",
    group="J",
    oracle="""
    select case when (doc_id * 2654435761) % 100 < 90
                then 'train' else 'holdout' end as split,
           count(*) as n_docs,
           min(doc_id) as min_id, max(doc_id) as max_id
    from documents group by 1
    """,
)
def split_train_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/10 train/holdout split by multiplicative hash of
    the document key (Knuth constant) — reproducible across engines,
    runs, and cluster sizes, unlike randomSplit. The membership
    predicate is a pure Column expression, so downstream reads can push
    it into the scan."""
    d = load(spark, sf_dir, "documents")
    bucket = (F.col("doc_id") * F.lit(2654435761)) % 100
    split = F.when(bucket < 90, "train").otherwise("holdout")
    return d.groupBy(split.alias("split")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


@register(
    "sample_stratified",
    group="J",
    oracle="""
    select lang, cast(count(*) as bigint) as n_total, true as sample_ok
    from documents
    where lang in ('en', 'de', 'es', 'fr', 'zh')
    group by lang
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling per language (sampleBy with a fixed seed) —
    the corpus-balancing primitive.

    Oracle-checked via the exact-value + tolerance-verdict pattern
    (the same promotion as the DataSketches ops): the Bernoulli draw
    is engine-specific, so the hashable content is the exact stratum
    total plus a Spark-computed verdict that the sampled count lands
    within 3σ of the binomial expectation (frac·n ± 3·√(frac·(1−frac)·n);
    exact equality for the frac=1.0 strata). The DuckDB twin emits the
    exact totals and literal true — a broken sampler flips sample_ok
    and fails the hash, while the sample itself stays free to vary by
    engine. Deterministic per engine (fixed seed), verified by pytest."""
    d = load(spark, sf_dir, "documents")
    fractions = {"en": 0.5, "de": 1.0, "es": 1.0, "fr": 1.0, "zh": 1.0}
    sampled = d.sampleBy("lang", fractions, seed=42)
    tot = (
        d.where(F.col("lang").isin(list(fractions)))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_total"))
    )
    smp = sampled.groupBy("lang").agg(F.count(F.lit(1)).alias("n_sampled"))
    frac = F.create_map(
        *[x for k, v in fractions.items() for x in (F.lit(k), F.lit(v))]
    )[F.col("lang")]
    j = tot.join(smp, "lang", "left").na.fill({"n_sampled": 0})
    bound = F.lit(3.0) * F.sqrt(frac * (F.lit(1.0) - frac) * F.col("n_total"))
    ok = F.abs(F.col("n_sampled") - frac * F.col("n_total")) <= bound
    return j.select("lang", "n_total", ok.alias("sample_ok"))


@register(
    "sample_stratified_hash",
    group="J",
    oracle="""
    with rates as (
        select * from (values ('en', 8), ('de', 16), ('es', 16),
                              ('fr', 16), ('zh', 16)) r(lang, keep_of_16)
    )
    select d.lang,
           cast(count(*) as bigint) as n_docs,
           min(d.doc_id) as min_id,
           max(d.doc_id) as max_id
    from documents d join rates on rates.lang = d.lang
    where cast(('0x' || substr(md5(cast(d.doc_id as varchar)), 1, 8))
               as bigint) % 16 < rates.keep_of_16
    group by d.lang
    """,
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: DETERMINISTIC stratified sampling — the oracle-checkable
    twin of sample_stratified: per-language keep rates (en 8/16,
    others 16/16) applied by bucketing md5(doc_id) instead of drawing
    from an RNG. sampleBy's Bernoulli draw gives a different sample
    per engine, per run order, per partition layout — fine for a
    one-off estimate, wrong for a CORPUS-BALANCING decision that must
    be reproducible and auditable (which docs were dropped? re-run
    and get the same answer). Hash-bucketing makes membership a pure
    function of (doc_id, rate): exact cross-engine agreement, stable
    under repartitioning, and the rate is adjustable in 1/16 steps by
    moving the threshold. The rate table is broadcast (5 rows); the
    membership predicate pipelines inside the scan."""
    d = load(spark, sf_dir, "documents")
    rates = spark.createDataFrame(
        [("en", 8), ("de", 16), ("es", 16), ("fr", 16), ("zh", 16)],
        ["lang", "keep_of_16"],
    )
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint") % 16
    return (
        d.join(F.broadcast(rates), "lang")
        .where(bucket < F.col("keep_of_16"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
    )


@register(
    "text_redact_terms",
    group="J",
    oracle=r"""
    select lang,
           count(*) filter (len(regexp_extract_all(text, '\b(customer|value)\b')) > 0)
               as docs_touched,
           cast(sum(len(regexp_extract_all(text, '\b(customer|value)\b')))
               as bigint) as n_redactions,
           cast(sum(len(regexp_replace(text, '\b(customer|value)\b', '<REDACTED>', 'g')))
               as bigint) as redacted_chars
    from documents group by lang
    """,
)
def text_redact_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: term scrubbing — the PII-redaction plan shape (the
    fixture corpus has no real PII, so 'customer|value' stands in for
    the email/phone/SSN patterns a production scrubber would use; swap
    the regex, the plan is identical). regexp_replace + regexp_extract_all
    stay inside whole-stage codegen — one scan, no Python, no shuffle
    until the per-lang rollup's partial agg."""
    pat = r"\b(customer|value)\b"
    d = load(spark, sf_dir, "documents")
    hits = F.size(F.regexp_extract_all("text", F.lit(pat), 0))
    return (
        d.select(
            "lang",
            hits.alias("n_hits"),
            F.length(F.regexp_replace("text", pat, "<REDACTED>")).alias("red_len"),
        )
        .groupBy("lang")
        .agg(
            F.count_if(F.col("n_hits") > 0).alias("docs_touched"),
            F.sum("n_hits").alias("n_redactions"),
            F.sum("red_len").alias("redacted_chars"),
        )
    )


@register(
    "text_contamination_ngram",
    group="J",
    oracle="""
    with toks as (
        select doc_id, lang, string_split(text, ' ') as t from documents
    ),
    ng as (
        select doc_id, lang, t[i + 1 : i + 5] as win
        from toks, unnest(range(greatest(len(t) - 4, 0))) as u(i)
    ),
    grams as (
        select doc_id, lang, array_to_string(win, ' ') as gram from ng
    ),
    bench as (
        select distinct gram from grams where doc_id % 97 = 0
    ),
    hits as (
        select g.doc_id, g.lang, count(distinct g.gram) as n_hits
        from grams g join bench b using (gram)
        where g.doc_id % 97 <> 0
        group by 1, 2
    )
    select lang, count(*) as contaminated_docs,
           cast(sum(n_hits) as bigint) as overlap_ngrams
    from hits group by lang
    """,
)
def text_contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: benchmark-contamination check — 5-gram overlap between the
    corpus and a held-out benchmark set (stand-in: doc_id % 97 == 0).
    The benchmark's distinct 5-grams are a small relation → broadcast
    join against the exploded corpus grams; at 100 TB the corpus side
    never shuffles, and the distinct-per-doc count is a partial agg on
    the scan partitioning. This is the standard train/test-leakage gate
    in LLM data pipelines."""
    # tokens materialized first: the previous SQL transform inlined
    # split(text) into slice() per element (O(len²) per doc).
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.split("text", " ").alias("t")
    )
    toks = F.col("t")
    grams5 = F.when(
        F.size(toks) >= 5,
        F.expr(
            "transform(sequence(0, size(t) - 5),"
            " i -> array_join(slice(t, i + 1, 5), ' '))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = d.select("doc_id", "lang", F.explode(grams5).alias("gram"))
    bench = grams.where(F.col("doc_id") % 97 == 0).select("gram").distinct()
    return (
        grams.where(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(bench), "gram")
        .groupBy("doc_id", "lang")
        .agg(F.countDistinct("gram").alias("n_hits"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("contaminated_docs"),
            F.sum("n_hits").alias("overlap_ngrams"),
        )
    )


@register(
    "text_quality_rules",
    group="J",
    oracle="""
    with m as (
        select lang,
               len(string_split(text, ' ')) as wc,
               cast(len(replace(text, ' ', '')) as double)
                   / len(string_split(text, ' ')) as mean_wlen,
               cast(len(list_filter(string_split(text, ' '),
                                    x -> x in ('the', 'a'))) as double)
                   / len(string_split(text, ' ')) as stop_frac
        from documents
    )
    select lang, count(*) as n_docs,
           count(*) filter (wc between 40 and 10000) as pass_wordcount,
           count(*) filter (mean_wlen between 3.2 and 4.6) as pass_meanlen,
           count(*) filter (stop_frac >= 0.02) as pass_stopword,
           count(*) filter (wc between 40 and 10000
                            and mean_wlen between 3.2 and 4.6
                            and stop_frac >= 0.02) as pass_all
    from m group by lang
    """,
)
def text_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: Gopher-style quality gate — word-count bounds, mean word
    length bounds, stopword-fraction floor (Rae et al. 2021, public).
    All three signals are integer-derived ratios computed identically in
    both engines (same int operands → same IEEE double → same compare),
    so the boundary predicates hash-match. One scan, codegen'd, partial
    agg per lang — the cheapest possible 100 TB quality sweep."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    wc = F.size(toks)
    chars = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    mean_wlen = chars.cast("double") / wc
    stops = F.size(F.filter(toks, lambda x: x.isin("the", "a")))
    stop_frac = stops.cast("double") / wc
    m = d.select(
        "lang", wc.alias("wc"), mean_wlen.alias("mean_wlen"),
        stop_frac.alias("stop_frac"),
    )
    p_wc = F.col("wc").between(40, 10000)
    p_ml = F.col("mean_wlen").between(3.2, 4.6)
    p_sw = F.col("stop_frac") >= 0.02
    return m.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if(p_wc).alias("pass_wordcount"),
        F.count_if(p_ml).alias("pass_meanlen"),
        F.count_if(p_sw).alias("pass_stopword"),
        F.count_if(p_wc & p_ml & p_sw).alias("pass_all"),
    )


@register(
    "pack_sequences",
    group="J",
    oracle="""
    with wc as (
        select doc_id, doc_id % 16 as shard,
               len(string_split(text, ' ')) as n_tokens
        from documents
    ),
    packed as (
        select shard, n_tokens,
               cast(floor((sum(n_tokens) over (partition by shard
                               order by doc_id
                               rows between unbounded preceding and current row)
                           - n_tokens) / 512.0) as bigint) as bin
        from wc
    )
    select shard, bin, count(*) as n_docs,
           cast(sum(n_tokens) as bigint) as total_tokens
    from packed group by shard, bin
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: sequence packing — assign documents to ~512-token training
    bins by running-offset within a shard (doc_id % 16). Shard-local
    packing is the distributed form: each shard packs independently
    under a partitioned window (no global sort, no single-partition
    bottleneck), which is how 100 TB corpora are packed in practice —
    exact first-fit packing is inherently sequential, so production
    pipelines accept shard-local contiguity. Integer token counts →
    exact cross-engine window sums."""
    d = load(spark, sf_dir, "documents")
    wc = d.select(
        "doc_id",
        (F.col("doc_id") % 16).alias("shard"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    w = (
        W.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    packed = wc.withColumn(
        "bin",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / F.lit(512.0)),
    )
    return packed.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


@register(
    "text_unigram_logprob",
    group="J",
    oracle="""
    with tok as (
        select doc_id, lang, unnest(string_split(text, ' ')) as w
        from documents
    ),
    cnt as (select w, count(*) as c from tok group by 1),
    tot as (select sum(c) as n from cnt),
    scored as (
        select t.doc_id, t.lang,
               sum(cast(floor(ln(c * 1.0 / n) * 1e4 + 0.5) as bigint))
                   as micro,
               count(*) as n_tok
        from tok t join cnt on t.w = cnt.w cross join tot
        group by 1, 2
    ),
    doc as (
        select lang, cast(micro as double) / n_tok / 1e4 as logprob
        from scored
    )
    select lang, count(*) as n_docs,
           round(cast(sum(cast(floor(logprob * 1e4 + 0.5) as bigint))
                      as double) / count(*) / 1e4, 4) as avg_logprob
    from doc group by 1
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: unigram-LM quality score (the CCNet/perplexity-filter
    family, public): a unigram model fit on the corpus itself scores
    each document by mean token log-probability; low scores flag
    gibberish, high scores flag boilerplate. All joins/aggs — token
    counts join back to exploded tokens (the count table is vocab-sized
    → broadcast), no driver materialization. Per-token log-probs are
    quantized at 1e-4 into int64 before summing so the per-doc sum is
    order-independent and engine-identical (libm last-ulp differences
    vanish below the quantum); per-lang averaging repeats the trick.
    At 100 TB fit the model on a sample, or swap in a KenLM scorer via
    pandas UDF with the same output contract."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("w"))
    cnt = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    total = cnt.agg(F.sum("c").alias("n"))
    scored = (
        tok.join(F.broadcast(cnt), "w")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id", "lang")
        .agg(
            F.sum(
                F.floor(F.log(F.col("c") * 1.0 / F.col("n")) * 1e4 + 0.5)
            ).alias("micro"),
            F.count(F.lit(1)).alias("n_tok"),
        )
    )
    doc = scored.select(
        "lang", (F.col("micro").cast("double") / F.col("n_tok") / 1e4).alias("logprob")
    )
    return doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            F.sum(F.floor(F.col("logprob") * 1e4 + 0.5)).cast("double")
            / F.count(F.lit(1))
            / 1e4,
            4,
        ).alias("avg_logprob"),
    )


@register(
    "sample_quality_weighted",
    group="J",
    oracle="""
    with s as (
        select lang,
               least(greatest(len(string_split(text, ' ')) / 200.0, 0.1),
                     1.0) as p,
               ('0x' || substr(md5(text), 1, 8))::bigint as u
        from documents
    )
    select lang, count(*) as n_docs,
           count(*) filter (u < p * 4294967296) as n_kept
    from s group by 1
    """,
)
def sample_quality_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: deterministic importance sampling — each document is kept
    with probability proportional to a quality proxy (token count,
    clamped to [0.1, 1]), decided by comparing an md5-derived uniform
    against the per-doc acceptance threshold. Unlike rand()-based
    sampling this is reproducible across engines, runs, retries, and
    cluster sizes (the keep decision is a pure function of content),
    which is what makes sampled pipelines auditable; it is also
    stable under re-partitioning, so a resumed 100 TB job samples
    identically. One codegen'd scan, no shuffle before the lang agg."""
    d = load(spark, sf_dir, "documents")
    p = F.least(
        F.greatest(F.size(F.split("text", " ")) / F.lit(200.0), F.lit(0.1)),
        F.lit(1.0),
    )
    u = F.conv(F.substring(F.md5(F.col("text")), 1, 8), 16, 10).cast("long")
    return (
        d.select("lang", p.alias("p"), u.alias("u"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_if(F.col("u") < F.col("p") * 4294967296).alias("n_kept"),
        )
    )


@register(
    "text_repetition_profile",
    group="J",
    oracle="""
    with tok as (
      select doc_id, unnest(string_split(text, ' ')) as tok from documents
    ),
    tc as (select doc_id, tok, count(*) as cnt from tok group by 1, 2),
    st as (
      select doc_id, sum(cnt) as n_tokens, count(*) as n_distinct,
             max(cnt) as max_cnt
      from tc group by 1
    )
    select doc_id, cast(n_tokens as bigint) as n_tokens, n_distinct,
           round(1.0 - cast(n_distinct as double) / n_tokens, 6) as dup_ratio,
           round(cast(max_cnt as double) / n_tokens, 6) as top_ratio
    from st
    """,
)
def text_repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: within-document repetition signals — duplicate-token
    fraction and most-common-token share, the Gopher repetition-filter
    family (Rae et al. 2021, public) that catches boilerplate and
    keyboard-mash documents which pass length/stopword gates.

    Scale: the input is repartitioned by doc_id FIRST, so both
    aggregation levels (per (doc, token) counts, then per-doc stats)
    and everything downstream ride ONE exchange — hashpartitioning on
    doc_id satisfies the (doc_id, tok) clustering requirement because
    it is a prefix subset. The explode never shuffles raw tokens. All
    ratios are int/int divisions → engine-identical doubles.
    """
    d = load(spark, sf_dir, "documents").repartition("doc_id")
    tc = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    st = tc.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("cnt").alias("max_cnt"),
    )
    n = F.col("n_tokens")
    return st.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        F.round(1.0 - F.col("n_distinct").cast("double") / n, 6).alias("dup_ratio"),
        F.round(F.col("max_cnt").cast("double") / n, 6).alias("top_ratio"),
    )


@register(
    "text_charset_profile",
    group="J",
    oracle="""
    select lang,
           round(cast(sum(length(regexp_replace(text, '[^a-z]', '', 'g'))) as double)
                 / sum(length(text)), 6) as alpha_ratio,
           round(cast(sum(length(regexp_replace(text, '[^0-9]', '', 'g'))) as double)
                 / sum(length(text)), 6) as digit_ratio,
           round(cast(sum(length(regexp_replace(text, '[^ ]', '', 'g'))) as double)
                 / sum(length(text)), 6) as space_ratio
    from documents group by 1
    """,
)
def text_charset_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: character-class composition per language — lowercase /
    digit / whitespace mass ratios, the cheap signal that separates
    prose from tables, code, and binary-spill in a crawl. Implemented
    as keep-class regex deletions + length deltas (both engines count
    surviving chars identically; POSIX classes only, §2.L trap 4), one
    codegen'd scan with integer sums → exact ratios."""
    d = load(spark, sf_dir, "documents")

    def mass(pattern: str):
        return F.sum(F.length(F.regexp_replace("text", pattern, "")))

    total = F.sum(F.length("text"))
    return d.groupBy("lang").agg(
        F.round(mass("[^a-z]").cast("double") / total, 6).alias("alpha_ratio"),
        F.round(mass("[^0-9]").cast("double") / total, 6).alias("digit_ratio"),
        F.round(mass("[^ ]").cast("double") / total, 6).alias("space_ratio"),
    )


@register(
    "text_oov_rate",
    group="J",
    oracle="""
    with tok as (
      select lang, unnest(string_split(text, ' ')) as tok from documents
    ),
    vocab as (
      select tok from (
        select tok, count(*) as cnt from tok group by 1
        order by cnt desc, tok limit 500
      )
    )
    select lang,
           count(*) as n_tokens,
           count(*) filter (where v.tok is not null) as in_vocab,
           round(1.0 - cast(count(*) filter (where v.tok is not null) as double)
                 / count(*), 6) as oov_rate
    from tok t left join vocab v on t.tok = v.tok
    group by lang
    """,
)
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: tokenizer-vocabulary coverage — fit a top-500 vocabulary
    on the corpus, then measure each language's out-of-vocabulary token
    rate: the go/no-go signal for whether a tokenizer (or its vocab
    budget) fits a corpus slice before training on it. The vocabulary
    is a TakeOrdered top-k (deterministic (cnt, tok) tie-break) that
    broadcasts into the coverage join — the corpus shuffles once for
    the token counts and never for the join."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("lang", F.explode(F.split("text", " ")).alias("tok"))
    vocab = (
        tok.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "tok")
        .limit(500)
        .select("tok", F.lit(1).alias("in_v"))
    )
    joined = tok.join(F.broadcast(vocab), "tok", "left")
    return joined.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count("in_v").alias("in_vocab"),
        F.round(
            1.0 - F.count("in_v").cast("double") / F.count(F.lit(1)), 6
        ).alias("oov_rate"),
    )


@register(
    "search_trigram_candidates",
    group="J",
    oracle="""
    with grams as (
      select p_partkey, p_name,
             unnest(list_distinct(list_transform(
               range(1, length(p_name) - 1),
               i -> substring(p_name, cast(i as integer), 3)))) as g
      from part
    ),
    qgrams as (
      select unnest(list_distinct(list_transform(
               range(1, length('widget') - 1),
               i -> substring('widget', cast(i as integer), 3)))) as g
    )
    select p_partkey, p_name, count(*) as shared_grams,
           contains(p_name, 'widget') as exact_hit
    from grams join qgrams using (g)
    group by 1, 2
    having count(*) >= 3
    """,
)
def search_trigram_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: trigram fuzzy search (the pg_trgm pattern) — an inverted
    character-trigram index turns substring/typo-tolerant search into a
    candidate join: names sharing ≥3 trigrams with the query term are
    candidates, with the exact containment flag carried for ranking.
    At 100 TB the gram→key index is materialized once (a parquet table
    bucketed by gram) and each search probes its few query grams —
    never a full-corpus LIKE scan. The query's grams broadcast."""
    term = "widget"
    p = load(spark, sf_dir, "part")
    grams = p.select(
        "p_partkey",
        "p_name",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, length(p_name) - 2),"
                    " i -> substring(p_name, i, 3))"
                )
            )
        ).alias("g"),
    )
    qgrams = spark.createDataFrame(
        [(term[i : i + 3],) for i in range(len(term) - 2)], "g string"
    ).distinct()
    return (
        grams.join(F.broadcast(qgrams), "g")
        .groupBy("p_partkey", "p_name")
        .agg(F.count(F.lit(1)).alias("shared_grams"))
        .where(F.col("shared_grams") >= 3)
        .withColumn("exact_hit", F.col("p_name").contains(term))
    )


@register(
    "text_zipf_slope",
    group="J",
    oracle=f"""
    with freq as (
        select tok as word, count(*) as freq
        from (select unnest(string_split(text, ' ')) as tok from documents)
        group by 1
    ),
    ranked as (
        select row_number() over (order by freq desc, word) as rank, freq
        from freq
    ),
    xy as (select ln(rank) as x, ln(freq) as y from ranked)
    select count(*) as n_words,
           round((cast(count(*) as double) * ({SUM_D.format('x * y')})
                  - ({SUM_D.format('x')}) * ({SUM_D.format('y')}))
                 / (cast(count(*) as double) * ({SUM_D.format('x * x')})
                    - ({SUM_D.format('x')}) * ({SUM_D.format('x')})), 6)
               as zipf_slope
    from xy
    """,
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: Zipf-law fit of the corpus — the least-squares slope of
    ln(freq) vs ln(rank) over the word-frequency table (natural text
    sits near −1; a word-salad corpus sits much shallower, so the
    statistic doubles as a synthetic-data detector). The regression is
    closed-form from five sums; each sum runs through the micro-unit
    integer policy so both engines accumulate order-independently, and
    the final slope arithmetic is the identical IEEE expression on
    identical doubles. The rank is the distributed exact row number
    (distrank, r4): the vocabulary grows ~N^0.5 (Heaps' law) — slowly,
    but data-proportionally, so it must not single-task either; a
    built-in regr_slope would be accumulation-order-dependent and is
    deliberately avoided (same reasoning as the moment-sum skewness)."""
    d = load(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    from datalakecrawler_spark.distrank import with_global_row_number

    # the vocabulary grows ~N^0.5 (Heaps) — still data-proportional,
    # so the Zipf rank is the distributed exact row number, not a
    # single-partition window
    ranked = with_global_row_number(
        freq, spark, [F.col("freq").desc(), F.col("word")], out="rank"
    ).select("rank", "freq")
    xy = ranked.select(F.log("rank").alias("x"), F.log("freq").alias("y"))
    n = F.count(F.lit(1)).cast("double")
    slope = (n * dsum(F.col("x") * F.col("y")) - dsum("x") * dsum("y")) / (
        n * dsum(F.col("x") * F.col("x")) - dsum("x") * dsum("x")
    )
    return xy.agg(
        F.count(F.lit(1)).alias("n_words"), F.round(slope, 6).alias("zipf_slope")
    )


@register(
    "text_pmi_bigrams",
    group="J",
    oracle="""
    with toks as (
      select doc_id,
             unnest(range(len(string_split(text, ' ')))) as pos,
             unnest(string_split(text, ' ')) as tok
      from documents
    ), bigrams as (
      select tok as w1,
             lead(tok) over (partition by doc_id order by pos) as w2
      from toks
    ), bg as (
      select w1, w2, count(*) as c12 from bigrams
      where w2 is not null group by 1, 2
    ), uni as (
      select tok as w, count(*) as c from toks group by 1
    ), tot as (
      select cast(sum(c12) as double) as n_bg from bg
    )
    select w1, w2, c12,
           round(ln((c12 / n_bg) /
                    ((u1.c / n_bg) * (u2.c / n_bg))), 6) as pmi
    from bg join uni u1 on bg.w1 = u1.w
            join uni u2 on bg.w2 = u2.w
            cross join tot
    where c12 >= 25
    """,
)
def text_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: pointwise mutual information for adjacent word pairs —
    the collocation score (ln p(w1,w2)/(p(w1)p(w2))) that separates
    real phrases from chance co-occurrence, a standard corpus-analysis
    signal for tokenizer vocabulary building. Plan: ONE explode of the
    token arrays feeds both the bigram counts (array-side transform,
    no window) and the unigram counts; the unigram and total frames
    are vocabulary-sized and broadcast back onto the bigram counts, so
    the only data-sized shuffle is the bigram groupBy — at 100 TB that
    shuffle is the irreducible cost and everything else rides on it.
    Both probability ratios divide by the same bigram total, so the
    expression is deterministic before its round-at-6; the c12 >= 25
    floor keeps the output stable and small."""
    # tokens materialized first (same O(len²) re-split fix as J7).
    d = load(spark, sf_dir, "documents").select(F.split("text", " ").alias("t"))
    toks = F.col("t")
    bigrams = F.transform(
        _bigram_positions(toks),
        lambda i: F.struct(
            F.element_at(toks, i + 1).alias("w1"),
            F.element_at(toks, i + 2).alias("w2"),
        ),
    )
    bg = (
        d.select(F.explode(bigrams).alias("b"))
        .select("b.w1", "b.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .where(F.col("c12") >= 25)
    )
    uni = (
        d.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # bigram total = tokens - docs (each doc of n tokens yields n-1)
    tot = d.select(
        (F.sum(F.size(toks)) - F.count(F.lit(1))).cast("double").alias("n_bg")
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    n_bg = F.col("n_bg")
    pmi = F.log(
        (F.col("c12") / n_bg) / ((F.col("c1") / n_bg) * (F.col("c2") / n_bg))
    )
    return (
        bg.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", "c12", F.round(pmi, 6).alias("pmi"))
    )


@register(
    "text_hapax_ratio",
    group="J",
    oracle="""
    with counts as (
      select lang, tok, count(*) as c
      from (select lang, unnest(string_split(text, ' ')) as tok
            from documents) t
      group by 1, 2
    )
    select lang,
           count(*) as vocab,
           count(*) filter (where c = 1) as hapax,
           round(count(*) filter (where c = 1) * 1.0 / count(*), 6)
             as hapax_ratio
    from counts group by lang
    """,
)
def text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: hapax legomena ratio per language — the share of
    vocabulary seen exactly once, the classic vocabulary-richness /
    corpus-maturity signal (a crawl slice with an unusually high
    hapax ratio is under-sampled or noisy; unusually low means
    boilerplate). One explode + (lang, token) count, then a
    vocabulary-sized re-aggregation — same two-stage shape as the
    wordcount family, so the only data-sized shuffle is the token
    count, map-side-combined before it moves."""
    d = load(spark, sf_dir, "documents")
    counts = (
        d.select("lang", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    hapax = F.sum((F.col("c") == 1).cast("long"))
    vocab = F.count(F.lit(1))
    return counts.groupBy("lang").agg(
        vocab.alias("vocab"),
        hapax.alias("hapax"),
        F.round(hapax * 1.0 / vocab, 6).alias("hapax_ratio"),
    )


@register(
    "corpus_vocab_overlap",
    group="J",
    oracle="""
    with flat as (
      select lang, doc_id,
             unnest(range(len(string_split(lower(text), ' ')))) as pos,
             unnest(string_split(lower(text), ' ')) as tok
      from documents
    ),
    vocab as (
      select distinct lang,
             tok || ' ' || lead(tok) over (partition by doc_id order by pos)
               as bigram
      from flat
      qualify bigram is not null
    ),
    sizes as (select lang, count(*) as v from vocab group by 1),
    inter as (
      select a.lang as lang_a, b.lang as lang_b, count(*) as n_inter
      from vocab a join vocab b on a.bigram = b.bigram and a.lang < b.lang
      group by 1, 2
    )
    select lang_a, lang_b, sa.v as v_a, sb.v as v_b, n_inter,
           round(cast(n_inter as double) / (sa.v + sb.v - n_inter), 6)
             as jaccard,
           round(cast(n_inter as double) / sa.v, 6) as containment_a_in_b
    from inter
    join sizes sa on sa.lang = lang_a
    join sizes sb on sb.lang = lang_b
    order by lang_a, lang_b
    """,
)
def corpus_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: pairwise corpus-slice vocabulary overlap — the
    dataset-relatedness measure over CONTENT (bigram vocabulary Jaccard
    + containment) complementing catalog_table_similarity's
    schema-level measure. A curation pipeline uses this to decide
    whether two corpus slices are near-copies (high containment →
    dedup across sources before mixing) or genuinely complementary.
    Shape: vocab extraction collapses each slice to its distinct
    bigram set FIRST (the only pass over full text), so the pairwise
    join runs on vocab-sized tables — at 100 TB that's the difference
    between joining corpora and joining dictionaries. Containment is
    asymmetric (|A∩B|/|A|, reported a→b with lang_a < lang_b);
    Jaccard symmetric. All counts exact ints."""
    d = load(spark, sf_dir, "documents").select(
        "lang", F.split(F.lower("text"), " ").alias("t")
    )
    toks = F.col("t")
    bigrams = F.transform(
        _bigram_positions(toks),
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
        ),
    )
    vocab = (
        d.select("lang", F.explode(bigrams).alias("bigram"))
        .distinct()
    )
    sizes = vocab.groupBy("lang").agg(F.count(F.lit(1)).alias("v"))
    a = vocab.alias("a")
    b = vocab.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.bigram") == F.col("b.bigram"))
            & (F.col("a.lang") < F.col("b.lang")),
        )
        .groupBy(
            F.col("a.lang").alias("lang_a"), F.col("b.lang").alias("lang_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("lang").alias("lang_a"), F.col("v").alias("v_a"))
    sb = sizes.select(F.col("lang").alias("lang_b"), F.col("v").alias("v_b"))
    return (
        inter.join(F.broadcast(sa), "lang_a")
        .join(F.broadcast(sb), "lang_b")
        .select(
            "lang_a", "lang_b", "v_a", "v_b", "n_inter",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("v_a") + F.col("v_b") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
            F.round(F.col("n_inter").cast("double") / F.col("v_a"), 6).alias(
                "containment_a_in_b"
            ),
        )
        .orderBy("lang_a", "lang_b")
    )


@register(
    "text_template_mining",
    group="J",
    oracle="""
    with norm as (
      select regexp_replace(text, '[0-9]+', '#', 'g') as template
      from documents
    ),
    t as (
      select md5(template) as template_hash,
             count(*) as n_docs,
             min(len(template)) as template_len
      from norm group by template
    )
    select template_hash, n_docs, template_len
    from t where n_docs >= 2
    order by n_docs desc, template_hash
    limit 20
    """,
)
def text_template_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: template mining — detect machine-generated/boilerplate
    documents by collapsing variable slots (digit runs → '#') and
    grouping on the normalized skeleton: pages that differ only in
    numbers (ids, prices, dates) collapse to one template, and a
    template with thousands of instances is generator output a
    curation pipeline down-weights or caps (complementing
    dedup_near_minhash, which needs textual overlap — templated docs
    can share almost no raw shingles if the slots dominate). One
    normalize + hash aggregation; the skeleton hash (md5, §2.L trap 7)
    is the groupable fingerprint at 100 TB. DuckDB's regexp_replace
    needs the explicit 'g' flag to match Spark's replace-all."""
    d = load(spark, sf_dir, "documents")
    norm = d.select(
        F.regexp_replace(F.col("text"), "[0-9]+", "#").alias("template")
    )
    return (
        norm.groupBy("template")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(F.length("template")).alias("template_len"),
        )
        .where(F.col("n_docs") >= 2)
        .select(F.md5("template").alias("template_hash"), "n_docs", "template_len")
        .orderBy(F.col("n_docs").desc(), "template_hash")
        .limit(20)
    )


@register(
    "search_bm25",
    group="J",
    oracle="""
    with docs as (
      select doc_id, string_split(text, ' ') as toks,
             len(string_split(text, ' ')) as dl
      from documents
    ),
    stats as (
      select count(*) as n_docs,
             cast(sum(dl) as bigint) as total_toks
      from docs
    ),
    terms as (select * from (values ('spark'), ('join'), ('merge')) t(term)),
    tf as (
      select d.doc_id, t.term, d.dl,
             len(list_filter(d.toks, x -> x = t.term)) as tf
      from docs d cross join terms t
    ),
    df as (
      select term, count(*) filter (where tf > 0) as df from tf group by 1
    ),
    scored as (
      select tf.doc_id,
             cast(floor(
               ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
               * (tf.tf * (1.2 + 1))
               / (tf.tf + 1.2 * (1 - 0.75
                  + 0.75 * tf.dl
                    / (cast(s.total_toks as double) / s.n_docs)))
               * 1e9 + 0.5) as bigint) as s9
      from tf join df on df.term = tf.term cross join stats s
      where tf.tf > 0
    )
    select doc_id,
           round(cast(sum(s9) as double) / 1e9, 6) as bm25
    from scored group by 1
    order by bm25 desc, doc_id limit 15
    """,
)
def search_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: BM25 ranking — the standard lexical retrieval scorer
    (the 'sparse' half of hybrid search; search_rrf_fusion fuses it
    with the dense side). Fixed query ('spark join merge'), k1=1.2,
    b=0.75. Distributed shape: tokenize once per doc (JVM split, no
    Python), tf per (doc, query-term) via a higher-order list filter,
    df as a tiny per-term rollup that broadcasts back. All inputs to
    the scoring formula are exact integers plus avgdl (one exact
    int/int division), so each per-term score is the identical IEEE
    expression in both engines; per-doc summation over terms is
    nano-quantized to kill reorder sensitivity. At 100 TB the doc
    scan dominates and is embarrassingly parallel; the df/stats
    side-tables are bytes."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.split("text", " ").alias("toks"),
        F.size(F.split("text", " ")).alias("dl"),
    )
    stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_toks"),
    )
    terms = spark.createDataFrame(
        [("spark",), ("join",), ("merge",)], ["term"]
    )
    tf = d.crossJoin(F.broadcast(terms)).select(
        "doc_id",
        "term",
        "dl",
        F.size(
            F.filter("toks", lambda x: x == F.col("term"))
        ).alias("tf"),
    )
    df_t = tf.groupBy("term").agg(
        F.count(F.when(F.col("tf") > 0, 1)).alias("df")
    )
    scored = (
        tf.filter(F.col("tf") > 0)
        .join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.floor(
                F.log(
                    1
                    + (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (1.2 + 1))
                / (
                    F.col("tf")
                    + 1.2
                    * (
                        1
                        - 0.75
                        + 0.75
                        * F.col("dl")
                        / (
                            F.col("total_toks").cast("double")
                            / F.col("n_docs")
                        )
                    )
                )
                * 1e9
                + 0.5
            ).alias("s9"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum("s9").cast("double") / 1e9, 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(15)
    )


@register(
    "text_keyness_logodds",
    group="J",
    oracle="""
    with toks as (
      select source, unnest(string_split(text, ' ')) as w
      from documents
    ),
    counts as (
      select w,
             cast(count(*) filter (where source = 'src0') as bigint) as a,
             cast(count(*) filter (where source <> 'src0') as bigint) as b
      from toks group by 1 having count(*) >= 10
    ),
    tot as (
      select cast(sum(a) as bigint) as ta, cast(sum(b) as bigint) as tb
      from counts
    )
    select w as word, a as n_focus, b as n_rest,
           round(ln((a + 0.5) / (ta - a + 0.5))
                 - ln((b + 0.5) / (tb - b + 0.5)), 6) as log_odds
    from counts, tot
    order by log_odds desc, w limit 15
    """,
)
def text_keyness_logodds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: corpus keyness by log-odds ratio — 'which words
    characterize source src0 against the rest of the corpus', the
    source-profiling signal behind mixture decisions
    (corpus_mixture_balance says how MUCH of each source;
    this says what the source is MADE OF). Haldane +0.5 smoothing
    keeps zero cells finite — the informative-Dirichlet-prior variant
    (Monroe et al.'s 'Fightin' Words') adds a background prior and a
    variance normalizer; the prior-free form here is its core. One
    tokenize+count pass (map-combinable), a two-scalar totals row
    broadcast back, and a fixed-order double expression over exact
    ints, rounded at 6. Min corpus frequency 10 suppresses
    hapax noise."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(F.split("text", " ")).alias("w")
    )
    counts = (
        toks.groupBy("w")
        .agg(
            F.count(F.when(F.col("source") == "src0", 1)).alias("a"),
            F.count(F.when(F.col("source") != "src0", 1)).alias("b"),
        )
        .filter(F.col("a") + F.col("b") >= 10)
    )
    tot = counts.agg(
        F.sum("a").alias("ta"), F.sum("b").alias("tb")
    )
    score = F.log(
        (F.col("a") + 0.5) / (F.col("ta") - F.col("a") + 0.5)
    ) - F.log((F.col("b") + 0.5) / (F.col("tb") - F.col("b") + 0.5))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            F.col("w").alias("word"),
            F.col("a").alias("n_focus"),
            F.col("b").alias("n_rest"),
            F.round(score, 6).alias("log_odds"),
        )
        .orderBy(F.col("log_odds").desc(), "word")
        .limit(15)
    )


@register(
    "text_burstiness",
    group="J",
    oracle="""
    with toks as (
      select doc_id, unnest(string_split(text, ' ')) as w
      from documents
    ),
    per_doc as (
      select w, doc_id, cast(count(*) as bigint) as c
      from toks group by 1, 2
    ),
    n as (select cast(count(*) as bigint) as n_docs from documents),
    agg as (
      select w, cast(sum(c) as bigint) as total,
             cast(sum(c * c) as bigint) as sq
      from per_doc group by 1
    )
    select w as word, total,
           round((cast(sq as double) / n_docs
                  - (cast(total as double) / n_docs)
                    * (cast(total as double) / n_docs))
                 / (cast(total as double) / n_docs), 6) as burstiness_vmr
    from agg, n
    order by total desc, w limit 20
    """,
)
def text_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: word burstiness — the variance-to-mean ratio (Fano
    factor) of per-document counts for the top-20 corpus words. VMR
    ≈ 1 is Poisson ('function word', spread evenly); VMR ≫ 1 is
    bursty ('content/topic word', clumped in few docs) — the
    classical Church-Gale signal, and a cheap topicality feature for
    quality filtering that TF-IDF (text_tfidf_topterms) only proxies.
    Zero-count documents contribute nothing to Σc and Σc², so no
    dense grid is materialized: VMR = (Σc²/N − (Σc/N)²)/(Σc/N) from
    two exact integer sums per word + the document count. One
    tokenize + two rollups, all map-combinable."""
    d = load(spark, sf_dir, "documents")
    n_docs = row_count(spark, sf_dir, "documents")
    per_doc = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w", "doc_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    agg = per_doc.groupBy("w").agg(
        F.sum("c").alias("total"),
        F.sum(F.col("c") * F.col("c")).alias("sq"),
    )
    mean = F.col("total").cast("double") / n_docs
    vmr = (F.col("sq").cast("double") / n_docs - mean * mean) / mean
    return (
        agg.select(
            F.col("w").alias("word"),
            "total",
            F.round(vmr, 6).alias("burstiness_vmr"),
        )
        .orderBy(F.col("total").desc(), "word")
        .limit(20)
    )


@register(
    "text_simpson_diversity",
    group="J",
    oracle="""
    with toks as (
      select source, unnest(string_split(text, ' ')) as w
      from documents
    ),
    wc as (
      select source, w, cast(count(*) as bigint) as c
      from toks group by 1, 2
    ),
    agg as (
      select source,
             cast(sum(c) as bigint) as n_tokens,
             cast(count(*) as bigint) as vocab,
             cast(sum(c * c) as bigint) as sum_c2
      from wc group by 1
    )
    select source, n_tokens, vocab,
           round(cast(sum_c2 as double)
                 / (cast(n_tokens as double) * n_tokens), 9)
             as simpson_lambda,
           round(cast(n_tokens as double) * n_tokens / sum_c2, 4)
             as inv_simpson
    from agg order by source
    """,
)
def text_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: Simpson diversity per source — λ = Σ(c/N)², the
    probability two random tokens coincide; 1/λ is the 'effective
    vocabulary size' (ecology's effective-species-number applied to
    corpora — a source whose inverse Simpson collapses relative to
    its raw vocab is template/boilerplate-dominated; complements the
    entropy view in catalog_column_entropy and the per-word view in
    text_burstiness). Computed as the exact rational Σc²/N² — two
    integer sums, zero per-term float quantization — so parity is
    trivially bit-stable. One tokenize + two map-combinable rollups
    keyed by (source, word) then source."""
    d = load(spark, sf_dir, "documents")
    wc = (
        d.select("source", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    agg = wc.groupBy("source").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab"),
        F.sum(F.col("c") * F.col("c")).alias("sum_c2"),
    )
    nd = F.col("n_tokens").cast("double")
    return agg.select(
        "source",
        "n_tokens",
        "vocab",
        F.round(F.col("sum_c2").cast("double") / (nd * nd), 9).alias(
            "simpson_lambda"
        ),
        F.round(nd * nd / F.col("sum_c2"), 4).alias("inv_simpson"),
    ).orderBy("source")


@register(
    "text_js_divergence_sources",
    group="J",
    oracle="""
    with toks as (
      select source, unnest(string_split(text, ' ')) as w
      from documents
    ),
    wc as (
      select source, w, cast(count(*) as bigint) as c
      from toks group by 1, 2
    ),
    tot as (
      select source, cast(sum(c) as bigint) as n from wc group by 1
    ),
    probs as (
      select wc.source, wc.w, wc.c, tot.n from wc join tot using (source)
    ),
    pairs as (
      select a.source as s1, b.source as s2,
             cast(a.c as double) / a.n as p,
             cast(b.c as double) / b.n as q
      from probs a join probs b
        on a.w = b.w and a.source < b.source
    ),
    shared as (
      select s1, s2,
             sum(cast(floor((p * ln(2 * p / (p + q))
                             + q * ln(2 * q / (p + q))) * 1e9
                            + 0.5) as bigint)) as core9,
             sum(cast(floor(p * 1e9 + 0.5) as bigint)) as pmass9,
             sum(cast(floor(q * 1e9 + 0.5) as bigint)) as qmass9
      from pairs group by 1, 2
    )
    select s1, s2,
           round(0.5 * (cast(core9 as double) / 1e9)
                 + 0.5 * ln(2)
                   * ((1 - cast(pmass9 as double) / 1e9)
                      + (1 - cast(qmass9 as double) / 1e9)), 6)
             as js_divergence
    from shared
    order by js_divergence, s1, s2 limit 10
    """,
)
def text_js_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: pairwise Jensen-Shannon divergence between source
    unigram DISTRIBUTIONS — the principled source-similarity measure
    (corpus_vocab_overlap compares vocab SETS; JS weighs by usage,
    is symmetric, bounded by ln 2, and is the metric behind corpus
    clustering / mixture dedup decisions). The union-support sum is
    folded into an intersection-only join via the identity: words
    exclusive to one source contribute exactly 0.5·ln2·(their
    probability mass), and exclusive mass = 1 − shared mass — so one
    word-keyed self-join of the per-source probability table covers
    the whole formula with no full-outer join. Per-term
    nano-quantization before the cross-word sums; top-10 most
    similar pairs. The self-join fans out per word across |sources|²
    pairs — at many-source scale, block by a minhash prefilter of
    source vocabularies first."""
    d = load(spark, sf_dir, "documents")
    wc = (
        d.select("source", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = wc.groupBy("source").agg(F.sum("c").alias("n"))
    probs = wc.join(F.broadcast(tot), "source")
    a = probs.alias("a")
    b = probs.alias("b")
    p = F.col("a.c").cast("double") / F.col("a.n")
    q = F.col("b.c").cast("double") / F.col("b.n")
    pairs = a.join(
        b,
        (F.col("a.w") == F.col("b.w"))
        & (F.col("a.source") < F.col("b.source")),
    ).select(
        F.col("a.source").alias("s1"),
        F.col("b.source").alias("s2"),
        p.alias("p"),
        q.alias("q"),
    )
    pp = F.col("p")
    qq = F.col("q")
    shared = pairs.groupBy("s1", "s2").agg(
        F.sum(
            F.floor(
                (
                    pp * F.log(2 * pp / (pp + qq))
                    + qq * F.log(2 * qq / (pp + qq))
                )
                * 1e9
                + 0.5
            )
        ).alias("core9"),
        F.sum(F.floor(pp * 1e9 + 0.5)).alias("pmass9"),
        F.sum(F.floor(qq * 1e9 + 0.5)).alias("qmass9"),
    )
    js = 0.5 * (F.col("core9").cast("double") / 1e9) + 0.5 * float(
        __import__("math").log(2)
    ) * (
        (1 - F.col("pmass9").cast("double") / 1e9)
        + (1 - F.col("qmass9").cast("double") / 1e9)
    )
    return (
        shared.select(
            "s1", "s2", F.round(js, 6).alias("js_divergence")
        )
        .orderBy("js_divergence", "s1", "s2")
        .limit(10)
    )


@register(
    "text_bigram_novelty",
    group="J",
    oracle="""
    with toks as (
      select doc_id, source, string_split(text, ' ') as w
      from documents
    ),
    bg as (
      select doc_id, source,
             unnest(list_transform(range(len(w) - 1),
                    i -> w[i+1] || ' ' || w[i+2])) as b
      from toks
    ),
    per_doc as (
      select doc_id, source, b, cast(count(*) as bigint) as c
      from bg group by 1, 2, 3
    ),
    corpus as (
      select b, cast(sum(c) as bigint) as tot from per_doc group by 1
    ),
    novelty as (
      select p.doc_id, p.source,
             cast(sum(p.c) as bigint) as n_bigrams,
             cast(sum(case when corpus.tot = p.c then p.c else 0 end)
                  as bigint) as n_unique
      from per_doc p join corpus using (b)
      group by 1, 2
    )
    select source,
           count(*) as n_docs,
           cast(sum(n_bigrams) as bigint) as total_bigrams,
           round(cast(sum(n_unique) as double) / sum(n_bigrams), 6)
             as novelty_rate
    from novelty group by 1 order by source
    """,
)
def text_bigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: bigram novelty rate per source — the fraction of a
    source's bigram occurrences that exist NOWHERE else in the corpus
    (corpus count == own count): low novelty = the source re-states
    what the corpus already contains (boilerplate / scraper echo —
    the soft version of dedup_rate_by_source's exact collisions, and
    the memorization-risk proxy text_contamination_ngram applies
    across train/eval splits). One bigram explode, a corpus rollup
    keyed by bigram, and a join back on the same key — two shuffles
    on a well-spread key; counts exact, one final ratio."""
    # tokens materialized first (O(len²) re-split hazard; see the
    # bigram operators above).
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.split("text", " ").alias("t")
    )
    w = F.col("t")
    bg = d.select(
        "doc_id",
        "source",
        F.explode(
            F.transform(
                _bigram_positions(w),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(w, i + 1),
                    F.element_at(w, i + 2),
                ),
            )
        ).alias("b"),
    )
    per_doc = bg.groupBy("doc_id", "source", "b").agg(
        F.count(F.lit(1)).alias("c")
    )
    corpus = per_doc.groupBy("b").agg(F.sum("c").alias("tot"))
    novelty = (
        per_doc.join(corpus, "b")
        .groupBy("doc_id", "source")
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.sum(
                F.when(F.col("tot") == F.col("c"), F.col("c")).otherwise(0)
            ).alias("n_unique"),
        )
    )
    return (
        novelty.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bigrams").alias("total_bigrams"),
            F.round(
                F.sum("n_unique").cast("double") / F.sum("n_bigrams"), 6
            ).alias("novelty_rate"),
        )
        .orderBy("source")
    )


@register(
    "text_crossentropy_sources",
    group="J",
    oracle="""
    with toks as (
      select source, unnest(string_split(text, ' ')) as w
      from documents
    ),
    src_counts as (
      select source, w, cast(count(*) as bigint) as c
      from toks group by 1, 2
    ),
    corpus as (
      select w, cast(sum(c) as bigint) as cw from src_counts group by 1
    ),
    totals as (
      select cast(sum(cw) as bigint) as n_corpus,
             cast(count(*) as bigint) as v
      from corpus
    ),
    ce as (
      select s.source,
             cast(sum(s.c) as bigint) as n_src,
             sum(cast(floor(
               -s.c * ln((cast(corpus.cw as double) + 1)
                         / (totals.n_corpus + totals.v)) * 1e6 + 0.5)
               as bigint)) as h6
      from src_counts s
      join corpus using (w) cross join totals
      group by 1
    )
    select source, n_src as n_tokens,
           round(cast(h6 as double) / 1e6 / n_src, 6)
             as crossentropy_nats,
           round(exp(cast(h6 as double) / 1e6 / n_src), 4)
             as perplexity_vs_corpus
    from ce order by source
    """,
)
def text_crossentropy_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: cross-entropy of each source under the corpus unigram
    LM (add-one smoothed) — the language-model fit score: sources
    whose perplexity under the corpus model is high are
    distributionally alien (the LM-based quality filter of the
    CCNet/KenLM lineage, here with the corpus itself as the model;
    text_unigram_logprob scores DOCS under the model, this scores
    SOURCES). H(src‖corpus) = −Σ_w c_w·ln p̂(w) / N_src with
    p̂ add-one smoothed — all counts exact, each c·ln p term
    micro-quantized before the per-source sum (c ≤ 1e4 keeps the
    quantized product inside int64 comfortably). One token rollup,
    one corpus rollup on the same key, one join back."""
    d = load(spark, sf_dir, "documents")
    src_counts = (
        d.select("source", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    corpus = src_counts.groupBy("w").agg(F.sum("c").alias("cw"))
    totals = corpus.agg(
        F.sum("cw").alias("n_corpus"), F.count(F.lit(1)).alias("v")
    )
    term = F.floor(
        -F.col("c")
        * F.log(
            (F.col("cw").cast("double") + 1)
            / (F.col("n_corpus") + F.col("v"))
        )
        * 1e6
        + 0.5
    )
    ce = (
        src_counts.join(corpus, "w")
        .crossJoin(F.broadcast(totals))
        .groupBy("source")
        .agg(
            F.sum("c").alias("n_src"),
            F.sum(term).alias("h6"),
        )
    )
    return ce.select(
        "source",
        F.col("n_src").alias("n_tokens"),
        F.round(
            F.col("h6").cast("double") / 1e6 / F.col("n_src"), 6
        ).alias("crossentropy_nats"),
        F.round(
            F.exp(F.col("h6").cast("double") / 1e6 / F.col("n_src")), 4
        ).alias("perplexity_vs_corpus"),
    ).orderBy("source")


@register(
    "text_vocab_growth_heaps",
    group="J",
    oracle="""
    with toks as (
      select doc_id, unnest(string_split(text, ' ')) as w
      from documents
    ),
    firsts as (
      select w, min(doc_id) as first_doc from toks group by 1
    ),
    doc_tokens as (
      select doc_id, cast(count(*) as bigint) as nt
      from toks group by 1
    ),
    n as (select max(doc_id) as max_id from documents),
    checkpoints as (
      select unnest(range(1, 11)) as decile
    ),
    cp as (
      select decile,
             (select cast(sum(nt) as bigint) from doc_tokens, n
              where doc_id <= (max_id + 1) * decile / 10 - 1)
               as tokens_seen,
             (select cast(count(*) as bigint) from firsts, n
              where first_doc <= (max_id + 1) * decile / 10 - 1)
               as vocab_seen
      from checkpoints
    )
    select decile, tokens_seen, vocab_seen,
           round(ln(cast(vocab_seen as double))
                 / ln(cast(tokens_seen as double)), 6)
             as heaps_beta_point
    from cp order by decile
    """,
)
def text_vocab_growth_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: Heaps'-law vocabulary growth — distinct vocabulary vs
    tokens seen at ten corpus prefixes (by doc_id order), with the
    pointwise Heaps exponent ln V / ln N (V ≈ K·N^β; a corpus whose
    β stays high keeps yielding new vocabulary — more worth
    training on; a flattening curve is saturating/templated). The
    naive computation rescans the corpus per checkpoint; this uses
    the FIRST-OCCURRENCE rewrite: each token type contributes to
    every checkpoint after its first doc, so V(checkpoint) = count
    of types with first_doc ≤ cutoff — one rollup for first
    occurrences, one for token counts, then 10 threshold counts on
    entity-sized tables (the events_cumulative_reach rewrite
    applied to vocabulary). Exact integers; one ln ratio at 6."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    )
    firsts = toks.groupBy("w").agg(F.min("doc_id").alias("first_doc"))
    doc_tokens = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("nt")
    )
    n = d.agg(F.max("doc_id").alias("max_id"))
    cps = spark.range(1, 11).select(F.col("id").alias("decile"))
    grid = F.broadcast(cps).crossJoin(F.broadcast(n)).select(
        "decile",
        ((F.col("max_id") + 1) * F.col("decile") / 10 - 1)
        .cast("bigint")
        .alias("cutoff"),
    )
    tokens_seen = (
        grid.join(
            doc_tokens, doc_tokens.doc_id <= grid.cutoff, "left"
        )
        .groupBy("decile")
        .agg(F.sum("nt").alias("tokens_seen"))
    )
    vocab_seen = (
        grid.join(firsts, firsts.first_doc <= grid.cutoff, "left")
        .groupBy("decile")
        .agg(F.count(F.col("w")).alias("vocab_seen"))
    )
    return (
        tokens_seen.join(vocab_seen, "decile")
        .select(
            "decile",
            "tokens_seen",
            "vocab_seen",
            F.round(
                F.log(F.col("vocab_seen").cast("double"))
                / F.log(F.col("tokens_seen").cast("double")),
                6,
            ).alias("heaps_beta_point"),
        )
        .orderBy("decile")
    )


@register(
    "text_char_entropy_compressibility",
    group="J",
    oracle="""
    with chars as (
      select source, unnest(string_split_regex(text, '')) as ch
      from documents
    ),
    cc as (
      select source, ch, cast(count(*) as bigint) as c
      from chars where ch <> '' group by 1, 2
    ),
    tot as (
      select source, cast(sum(c) as bigint) as n from cc group by 1
    ),
    terms as (
      select cc.source,
             cast(floor(-(cast(c as double) / n)
                  * ln(cast(c as double) / n) / ln(2) * 1e9 + 0.5)
                  as bigint) as h9
      from cc join tot using (source)
    )
    select terms.source,
           max(tot.n) as n_chars,
           round(cast(sum(h9) as double) / 1e9, 6) as bits_per_char,
           round(cast(sum(h9) as double) / 1e9 / 8, 6)
             as est_compression_ratio
    from terms join tot using (source)
    group by 1 order by terms.source
    """,
)
def text_char_entropy_compressibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: character-level entropy per source — bits/char of the
    order-0 character model, and entropy/8 as the zero-order bound
    on compression ratio (real codecs with context models do
    better; the BOUND is what flags anomalies: a source whose
    bits/char jumps is suddenly shipping base64/binary-in-text —
    the encoding-corruption detector, complementing
    text_charset_profile's class counts with an information
    measure). One character explode (JVM regex split) + two rollups
    keyed by (source, char); each p·log₂p term nano-quantized
    before the cross-char sum."""
    d = load(spark, sf_dir, "documents")
    chars = d.select(
        "source", F.explode(F.split("text", "")).alias("ch")
    ).where(F.col("ch") != "")
    cc = chars.groupBy("source", "ch").agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = cc.groupBy("source").agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    ln2 = float(__import__("math").log(2))
    terms = cc.join(F.broadcast(tot), "source").select(
        "source",
        "n",
        F.floor(-p * F.log(p) / ln2 * 1e9 + 0.5).alias("h9"),
    )
    return (
        terms.groupBy("source")
        .agg(
            F.max("n").alias("n_chars"),
            F.round(F.sum("h9").cast("double") / 1e9, 6).alias(
                "bits_per_char"
            ),
            F.round(
                F.sum("h9").cast("double") / 1e9 / 8, 6
            ).alias("est_compression_ratio"),
        )
        .orderBy("source")
    )


@register(
    "text_tokenizer_fertility",
    group="J",
    oracle="""
    with per_doc as (
      select lang,
             cast(len(string_split(text, ' ')) as bigint) as words,
             cast(list_aggregate(list_transform(string_split(text, ' '),
                  w -> cast(ceil(length(w) / 4.0) as bigint)), 'sum')
                  as bigint) as bpe
      from documents
    )
    select lang,
           count(*) as n_docs,
           cast(sum(words) as bigint) as total_words,
           cast(sum(bpe) as bigint) as total_bpe_tokens,
           round(cast(sum(bpe) as double) / sum(words), 6)
             as fertility
    from per_doc group by 1 order by lang
    """,
)
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: tokenizer fertility by language — BPE-ish tokens per
    whitespace word (text_token_count_bpe's estimator aggregated to
    the per-language ratio): THE multilingual-budget number — a
    language with fertility 2× pays twice the context window and
    compute per word, which skews both training-mix token
    accounting (corpus_mixture_balance counts DOCS; budgets are
    paid in TOKENS) and per-language effective batch sizes. Exact
    integer token sums per language; one ratio. One tokenize pass
    with the same higher-order-function estimator, rolled up by
    lang."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    bpe = F.aggregate(
        F.transform(toks, lambda w: F.ceil(F.length(w) / 4.0)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    per_doc = d.select(
        "lang",
        F.size(toks).cast("long").alias("words"),
        bpe.alias("bpe"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("words").alias("total_words"),
            F.sum("bpe").alias("total_bpe_tokens"),
            F.round(
                F.sum("bpe").cast("double") / F.sum("words"), 6
            ).alias("fertility"),
        )
        .orderBy("lang")
    )


@register(
    "text_langid_confusion",
    group="J",
    oracle="""
    with scores as (
        select doc_id, lang as true_lang,
    """
    + ",\n".join(
        f"       len(list_intersect(list_distinct(string_split(text, ' ')), "
        f"{words!r}::varchar[])) as s_{lang}"
        for lang, words in _LANG_MARKERS.items()
    )
    + """
        from documents
    ),
    pred as (
      select true_lang,
             case greatest(s_de, s_en, s_es, s_fr, s_zh)
                  when s_de then 'de' when s_en then 'en'
                  when s_es then 'es' when s_fr then 'fr'
                  else 'zh' end as pred_lang
      from scores
    ),
    cm as (
      select true_lang, pred_lang, cast(count(*) as bigint) as n
      from pred group by 1, 2
    ),
    tot as (select cast(sum(n) as bigint) as n_all,
                   cast(sum(case when true_lang = pred_lang then n
                            else 0 end) as bigint) as n_correct
            from cm)
    select cm.true_lang, cm.pred_lang, cm.n,
           round(cast(tot.n_correct as double) / tot.n_all, 6)
             as overall_accuracy
    from cm cross join tot
    order by cm.true_lang, cm.pred_lang
    """,
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: language-ID confusion matrix — the marker-vocabulary
    classifier (text_langid_heuristic) evaluated against the stored
    labels, as the full (true, predicted, count) matrix with overall
    accuracy attached to every row: WHERE the heuristic fails (es↔fr
    confusion from shared Romance markers is the expected cell) is
    what decides whether to ship it or escalate to char-n-gram
    models. Composes the registered classifier AS A SUBROUTINE —
    the Spark side literally calls the other operator's DataFrame,
    exercising operator-composition through the registry. Exact
    counts; one ratio."""
    from datalakecrawler_spark.registry import all_queries

    pred = all_queries()["text_langid_heuristic"].fn(spark, sf_dir)
    cm = pred.groupBy("true_lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = cm.agg(
        F.sum("n").alias("n_all"),
        F.sum(
            F.when(
                F.col("true_lang") == F.col("pred_lang"), F.col("n")
            ).otherwise(0)
        ).alias("n_correct"),
    )
    return (
        cm.crossJoin(F.broadcast(tot))
        .select(
            "true_lang",
            "pred_lang",
            "n",
            F.round(
                F.col("n_correct").cast("double") / F.col("n_all"), 6
            ).alias("overall_accuracy"),
        )
        .orderBy("true_lang", "pred_lang")
    )


@register(
    "text_truncation_loss",
    group="J",
    oracle="""
    with per_doc as (
      select source,
             cast(len(string_split(text, ' ')) as bigint) as toks
      from documents
    )
    select source,
           count(*) as n_docs,
           cast(sum(toks) as bigint) as total_tokens,
           count(*) filter (where toks > 64) as n_truncated_docs,
           cast(sum(greatest(toks - 64, 0)) as bigint) as tokens_lost,
           round(cast(sum(greatest(toks - 64, 0)) as double)
                 / sum(toks), 6) as loss_share
    from per_doc group by 1 order by source
    """,
)
def text_truncation_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: truncation loss at a 64-token context budget — per
    source: docs that would truncate, tokens falling off the end,
    and the lost-token share (the context-window budgeting table:
    choosing max_seq_len is a trade between padding waste on short
    docs (pack_sequences fixes that) and TRUNCATION loss on long
    ones — this measures the second half; a source losing 40% of
    its tokens is effectively a different corpus after truncation).
    One tokenize-count pass; greatest(x−64, 0) is exact integer
    arithmetic; all counts exact."""
    d = load(spark, sf_dir, "documents")
    per_doc = d.select(
        "source",
        F.size(F.split("text", " ")).cast("long").alias("toks"),
    )
    lost = F.greatest(F.col("toks") - 64, F.lit(0))
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").alias("total_tokens"),
            F.count(F.when(F.col("toks") > 64, 1)).alias(
                "n_truncated_docs"
            ),
            F.sum(lost).alias("tokens_lost"),
            F.round(
                F.sum(lost).cast("double") / F.sum("toks"), 6
            ).alias("loss_share"),
        )
        .orderBy("source")
    )


@register(
    "text_ngram_coverage_curve",
    group="J",
    oracle="""
    with bg as (
      select w[i+1] || ' ' || w[i+2] as b
      from (select string_split(text, ' ') as w from documents) t,
           unnest(range(len(w) - 1)) as u(i)
    ),
    counts as (
      select b, cast(count(*) as bigint) as c from bg group by 1
    ),
    ranked as (
      select c,
             row_number() over (order by c desc, b) as rk,
             sum(c) over () as total
      from counts
    ),
    cum as (
      select rk,
             sum(c) over (order by rk
               rows between unbounded preceding and current row)
               as cum_c,
             total
      from ranked
    )
    select k,
           round(cast(max(cum_c) filter (where rk <= k) as double)
                 / max(total), 6) as coverage
    from cum
    cross join (select unnest([10, 100, 1000, 10000]) as k) ks
    where rk <= k
    group by k order by k
    """,
)
def text_ngram_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: bigram coverage curve — the share of all bigram
    OCCURRENCES covered by the top-k most frequent bigrams, at
    k ∈ {10, 100, 1k, 10k}: the Zipf-integral view that sizes
    phrase vocabularies (if 1k bigrams cover 80%, a 1k phrase table
    captures most of the distribution — the statistic behind
    subword-vocab and collocation-list sizing; text_zipf_slope fits
    the decay law, this integrates it). Rank by count with bigram
    tie-break, one cumulative window over DISTINCT bigrams, then
    four threshold reads. Exact integer counts; one ratio."""
    # tokens materialized first (O(len²) re-split hazard).
    d = load(spark, sf_dir, "documents").select(F.split("text", " ").alias("t"))
    w = F.col("t")
    bg = d.select(
        F.explode(
            F.transform(
                _bigram_positions(w),
                lambda i: F.concat_ws(
                    " ", F.element_at(w, i + 1), F.element_at(w, i + 2)
                ),
            )
        ).alias("b")
    )
    counts = bg.groupBy("b").agg(F.count(F.lit(1)).alias("c"))
    from datalakecrawler_spark.distrank import with_global_cumsum

    # rank + running mass + total over the bigram vocabulary (grows
    # with the corpus) in ONE distributed range shuffle
    cum = with_global_cumsum(
        counts,
        spark,
        [F.col("c").desc(), F.col("b")],
        "c",
        out="cum_c",
        inclusive=True,
        with_total="total",
        rn_out="rk",
    ).select("rk", "cum_c", "total")
    ks = spark.createDataFrame(
        [(10,), (100,), (1000,), (10000,)], ["k"]
    )
    return (
        F.broadcast(ks)
        .join(cum, cum.rk <= ks.k)
        .groupBy("k")
        .agg(
            F.round(
                F.max(F.col("cum_c")).cast("double") / F.max("total"), 6
            ).alias("coverage")
        )
        .orderBy("k")
    )


@register(
    "corpus_source_league_table",
    group="J",
    oracle="""
    with h as (
      select source, md5(text) as th from documents
    ),
    dupg as (select th, count(*) as n from h group by 1),
    dup_rate as (
      select h.source,
             cast(count(*) filter (where dupg.n > 1) as double)
               / count(*) as dup_rate
      from h join dupg using (th) group by 1
    ),
    toks as (
      select source, unnest(string_split(text, ' ')) as w
      from documents
    ),
    src_counts as (
      select source, w, cast(count(*) as bigint) as c
      from toks group by 1, 2
    ),
    corpus as (
      select w, cast(sum(c) as bigint) as cw from src_counts group by 1
    ),
    totals as (
      select cast(sum(cw) as bigint) as n_corpus,
             cast(count(*) as bigint) as v from corpus
    ),
    ce as (
      select s.source,
             cast(sum(s.c) as bigint) as n_src,
             sum(cast(floor(
               -s.c * ln((cast(corpus.cw as double) + 1)
                         / (totals.n_corpus + totals.v)) * 1e6 + 0.5)
               as bigint)) as h6
      from src_counts s join corpus using (w) cross join totals
      group by 1
    ),
    xent as (
      select source,
             cast(h6 as double) / 1e6 / n_src as crossentropy
      from ce
    ),
    simpson as (
      select source,
             cast(sum(c * c) as bigint) as sum_c2,
             cast(sum(c) as bigint) as nt
      from src_counts group by 1
    ),
    metrics as (
      select d.source, d.dup_rate, x.crossentropy,
             cast(s.nt as double) * s.nt / s.sum_c2 as inv_simpson
      from dup_rate d
      join xent x using (source)
      join simpson s using (source)
    ),
    ranked as (
      select source,
             row_number() over (order by dup_rate, source)
               as rk_dup,
             row_number() over (order by crossentropy, source)
               as rk_xent,
             row_number() over (order by inv_simpson desc, source)
               as rk_div,
             dup_rate, crossentropy, inv_simpson
      from metrics
    )
    select source,
           round(dup_rate, 6) as dup_rate,
           round(crossentropy, 6) as crossentropy_nats,
           round(inv_simpson, 4) as inv_simpson,
           cast(rk_dup + rk_xent + rk_div as bigint) as rank_sum,
           row_number() over (order by rk_dup + rk_xent + rk_div,
                              source) as league_position
    from ranked
    order by league_position limit 10
    """,
)
def corpus_source_league_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: the source quality league table — every source ranked
    on three orthogonal health axes computed in ONE plan: exact-dup
    rate (lower better), cross-entropy under the corpus LM (lower =
    distributionally typical), and inverse-Simpson lexical diversity
    (higher better); league position = rank-sum (the Borda count —
    scale-free aggregation that needs no weight tuning). This is the
    capstone composition of the per-source diagnostics
    (dedup_rate_by_source / text_crossentropy_sources /
    text_simpson_diversity): a data-sourcing review reads THIS
    table first and drills into the per-metric operators after.
    Rank ties break on source; all inputs are the established
    exact-integer constructions."""
    d = load(spark, sf_dir, "documents")
    h = d.select("source", F.md5("text").alias("th"))
    dupg = h.groupBy("th").agg(F.count(F.lit(1)).alias("n"))
    dup_rate = (
        h.join(dupg, "th")
        .groupBy("source")
        .agg(
            (
                F.count(F.when(F.col("n") > 1, 1)).cast("double")
                / F.count(F.lit(1))
            ).alias("dup_rate")
        )
    )
    src_counts = (
        d.select("source", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    corpus = src_counts.groupBy("w").agg(F.sum("c").alias("cw"))
    totals = corpus.agg(
        F.sum("cw").alias("n_corpus"), F.count(F.lit(1)).alias("v")
    )
    term = F.floor(
        -F.col("c")
        * F.log(
            (F.col("cw").cast("double") + 1)
            / (F.col("n_corpus") + F.col("v"))
        )
        * 1e6
        + 0.5
    )
    xent = (
        src_counts.join(corpus, "w")
        .crossJoin(F.broadcast(totals))
        .groupBy("source")
        .agg(
            (
                F.sum(term).cast("double") / 1e6 / F.sum("c")
            ).alias("crossentropy")
        )
    )
    simpson = src_counts.groupBy("source").agg(
        (
            F.sum("c").cast("double")
            * F.sum("c")
            / F.sum(F.col("c") * F.col("c"))
        ).alias("inv_simpson")
    )
    metrics = dup_rate.join(xent, "source").join(simpson, "source")
    ranked = metrics.select(
        "source",
        "dup_rate",
        "crossentropy",
        "inv_simpson",
        F.row_number()
        .over(W.orderBy("dup_rate", "source"))
        .alias("rk_dup"),
        F.row_number()
        .over(W.orderBy("crossentropy", "source"))
        .alias("rk_xent"),
        F.row_number()
        .over(W.orderBy(F.col("inv_simpson").desc(), "source"))
        .alias("rk_div"),
    )
    rank_sum = F.col("rk_dup") + F.col("rk_xent") + F.col("rk_div")
    return (
        ranked.select(
            "source",
            F.round("dup_rate", 6).alias("dup_rate"),
            F.round("crossentropy", 6).alias("crossentropy_nats"),
            F.round("inv_simpson", 4).alias("inv_simpson"),
            rank_sum.cast("bigint").alias("rank_sum"),
            F.row_number()
            .over(W.orderBy(rank_sum, "source"))
            .alias("league_position"),
        )
        .orderBy("league_position")
        .limit(10)
    )


@register(
    "text_short_doc_scan",
    group="J",
    oracle="""
    with t as (
      select source,
             cast(len(string_split(text, ' ')) as bigint) as toks
      from documents
    )
    select source,
           cast(count(*) as bigint) as n_docs,
           cast(count(*) filter (where toks < 20) as bigint)
             as n_short,
           round(cast(count(*) filter (where toks < 20) as double)
                 / count(*), 6) as short_rate,
           cast(min(toks) as bigint) as min_tokens
    from t group by 1 order by source
    """,
)
def text_short_doc_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: short-document scan — docs under 20 tokens per source
    (stubs, nav fragments, truncated fetches: the length-floor
    filter every corpus pipeline applies first because short docs
    cost metadata overhead and teach nothing; text_truncation_loss
    budgets the LONG tail, this gates the SHORT one — together they
    bracket the usable length band). One tokenize-count pass;
    exact counts."""
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "source", F.size(F.split("text", " ")).cast("long").alias("toks")
    )
    return (
        t.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(F.col("toks") < 20, 1)).alias("n_short"),
            F.round(
                F.count(F.when(F.col("toks") < 20, 1)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("short_rate"),
            F.min("toks").alias("min_tokens"),
        )
        .orderBy("source")
    )


@register(
    "text_chunked_ttr",
    group="J",
    oracle="""
    with toks as (
      select doc_id, lang,
             unnest(string_split(text, ' ')) as tok,
             generate_subscripts(string_split(text, ' '), 1) - 1 as pos
      from documents
    ),
    chunks as (
      select doc_id, lang, pos // 20 as chunk,
             cast(count(*) as bigint) as n_tok,
             cast(count(distinct tok) as bigint) as n_types
      from toks group by 1, 2, 3
    ),
    complete as (
      select * from chunks where n_tok = 20
    )
    select lang,
           cast(count(distinct doc_id) as bigint) as n_docs,
           cast(count(*) as bigint) as n_chunks,
           round(cast(sum(n_types) as double) / (20 * count(*)), 6)
             as chunked_ttr
    from complete group by lang order by lang
    """,
)
def text_chunked_ttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-ext: chunked type-token ratio per language — lexical
    diversity measured on fixed 20-token chunks (plain TTR shrinks
    with document length, so the standard fix is averaging TTR over
    constant-size windows; incomplete tail chunks are excluded).
    Low chunked-TTR flags templated/repetitive corpora slices the
    dedup family won't catch (no two chunks identical, all of them
    stale). Per-(doc,chunk) distinct counts shuffle on a bounded
    composite key; the per-lang verdict is exact integer sums with
    one final division."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.posexplode(F.split("text", " ")).alias("pos", "tok"),
    )
    chunks = toks.groupBy(
        "doc_id", "lang", (F.col("pos") / 20).cast("long").alias("chunk")
    ).agg(
        F.count(F.lit(1)).alias("n_tok"),
        F.count_distinct("tok").alias("n_types"),
    )
    complete = chunks.filter(F.col("n_tok") == 20)
    return (
        complete.groupBy("lang")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.round(
                F.sum("n_types").cast("double")
                / (20 * F.count(F.lit(1))),
                6,
            ).alias("chunked_ttr"),
        )
        .orderBy("lang")
    )


@register(
    "text_collocation_llr",
    group="J",
    oracle="""
    with toks as (
      select doc_id,
             unnest(range(len(string_split(text, ' ')))) as pos,
             unnest(string_split(text, ' ')) as tok
      from documents
    ), bigrams as (
      select tok as w1,
             lead(tok) over (partition by doc_id order by pos) as w2
      from toks
    ), bg as (
      select w1, w2, count(*) as c12 from bigrams
      where w2 is not null group by 1, 2
    ), marg as (
      select bg.w1, bg.w2, bg.c12,
             r.r1, c.c2,
             (select sum(c12) from bg) as n
      from bg
      join (select w1, sum(c12) as r1 from bg group by w1) r using (w1)
      join (select w2, sum(c12) as c2 from bg group by w2) c using (w2)
    )
    select w1, w2, c12,
           round(2.0 * (
               c12 * ln(c12 * n / (1.0 * r1 * c2))
             + (case when r1 - c12 > 0
                then (r1 - c12) * ln((r1 - c12) * n / (1.0 * r1 * (n - c2)))
                else 0 end)
             + (case when c2 - c12 > 0
                then (c2 - c12) * ln((c2 - c12) * n / (1.0 * (n - r1) * c2))
                else 0 end)
             + (case when n - r1 - c2 + c12 > 0
                then (n - r1 - c2 + c12)
                     * ln((n - r1 - c2 + c12) * n / (1.0 * (n - r1) * (n - c2)))
                else 0 end)), 4) as llr
    from marg
    where c12 >= 25
    """,
)
def text_collocation_llr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunning's log-likelihood-ratio collocation test (1993, public
    method) — the statistically-sound alternative to raw PMI for
    phrase mining on skewed counts: a 2×2 contingency table per
    adjacent bigram (k11 = bigram count, marginals from the bigram
    table itself), scored 2·Σ kᵢⱼ·ln(kᵢⱼN / rᵢcⱼ) over the non-zero
    cells. Same plan skeleton as text_pmi_bigrams: ONE explode feeds
    the bigram groupBy (the only data-sized shuffle); the two marginal
    frames are vocabulary-sized and broadcast back. ln parity across
    engines is absorbed by round-4 on a statistic of magnitude
    10¹-10³."""
    # tokens materialized first (same O(len²) re-split fix as J7).
    d = load(spark, sf_dir, "documents").select(F.split("text", " ").alias("t"))
    toks = F.col("t")
    bigrams = F.transform(
        _bigram_positions(toks),
        lambda i: F.struct(
            F.element_at(toks, i + 1).alias("w1"),
            F.element_at(toks, i + 2).alias("w2"),
        ),
    )
    bg = (
        d.select(F.explode(bigrams).alias("b"))
        .select("b.w1", "b.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    r = bg.groupBy("w1").agg(F.sum("c12").alias("r1"))
    c = bg.groupBy("w2").agg(F.sum("c12").alias("c2"))
    n = bg.agg(F.sum("c12").alias("n"))
    m = (
        bg.join(F.broadcast(r), "w1")
        .join(F.broadcast(c), "w2")
        .crossJoin(F.broadcast(n))
        .where(F.col("c12") >= 25)
    )

    k11 = F.col("c12")
    k12 = F.col("r1") - k11
    k21 = F.col("c2") - k11
    k22 = F.col("n") - F.col("r1") - F.col("c2") + k11
    llr = 2.0 * (
        k11 * F.log(k11 * F.col("n") / (1.0 * F.col("r1") * F.col("c2")))
        + F.when(
            k12 > 0,
            k12 * F.log(k12 * F.col("n") / (1.0 * F.col("r1") * (F.col("n") - F.col("c2")))),
        ).otherwise(F.lit(0.0))
        + F.when(
            k21 > 0,
            k21 * F.log(k21 * F.col("n") / (1.0 * (F.col("n") - F.col("r1")) * F.col("c2"))),
        ).otherwise(F.lit(0.0))
        + F.when(
            k22 > 0,
            k22
            * F.log(
                k22
                * F.col("n")
                / (1.0 * (F.col("n") - F.col("r1")) * (F.col("n") - F.col("c2")))
            ),
        ).otherwise(F.lit(0.0))
    )
    return m.select("w1", "w2", "c12", F.round(llr, 4).alias("llr"))


@register(
    "text_bpe_train_lite",
    group="J",
    oracle="""
    with words as (
      select word, count(*) as n from (
        select unnest(string_split(text, ' ')) as word from documents
      ) where word <> '' group by word
    ),
    s0 as (
      select ' ' || rtrim(regexp_replace(word, '(.)', '\\1 ', 'g')) || ' ' as seq,
             n from words
    ),
    p1 as (
      select pr as pair, sum(n) as cnt from (
        select unnest(list_transform(range(1, len(string_split(trim(seq), ' '))),
                      i -> string_split(trim(seq), ' ')[i] || ' ' ||
                           string_split(trim(seq), ' ')[i + 1])) as pr, n
        from s0
      ) group by pr
    ),
    t1 as (select pair, cnt from p1 order by cnt desc, pair limit 1),
    s1 as (
      select replace(seq, ' ' || t1.pair || ' ',
                     ' ' || replace(t1.pair, ' ', '') || ' ') as seq, n
      from s0, t1
    ),
    p2 as (
      select pr as pair, sum(n) as cnt from (
        select unnest(list_transform(range(1, len(string_split(trim(seq), ' '))),
                      i -> string_split(trim(seq), ' ')[i] || ' ' ||
                           string_split(trim(seq), ' ')[i + 1])) as pr, n
        from s1
      ) group by pr
    ),
    t2 as (select pair, cnt from p2 order by cnt desc, pair limit 1),
    s2 as (
      select replace(seq, ' ' || t2.pair || ' ',
                     ' ' || replace(t2.pair, ' ', '') || ' ') as seq, n
      from s1, t2
    ),
    p3 as (
      select pr as pair, sum(n) as cnt from (
        select unnest(list_transform(range(1, len(string_split(trim(seq), ' '))),
                      i -> string_split(trim(seq), ' ')[i] || ' ' ||
                           string_split(trim(seq), ' ')[i + 1])) as pr, n
        from s2
      ) group by pr
    ),
    t3 as (select pair, cnt from p3 order by cnt desc, pair limit 1)
    select 1 as merge_round, pair, replace(pair, ' ', '') as fused,
           cast(cnt as bigint) as pair_count from t1
    union all
    select 2, pair, replace(pair, ' ', ''), cast(cnt as bigint) from t2
    union all
    select 3, pair, replace(pair, ' ', ''), cast(cnt as bigint) from t3
    """,
)
def text_bpe_train_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-pair-encoding tokenizer training (Sennrich et al. 2016,
    public method), 3 merge rounds over the corpus vocabulary: word
    frequencies once (the only corpus-sized pass), then each round
    counts weighted adjacent symbol pairs, picks the most frequent
    (count desc, pair asc tie-break — deterministic), and fuses it in
    every symbol sequence via leftmost-non-overlapping literal replace
    (verified engine-identical). The merge decision is a one-row frame
    cross-joined back — NO driver collect, the whole train is one
    declarative plan; at 100 TB the vocabulary table (≪ corpus) is the
    only state between rounds, exactly how distributed tokenizer
    training shards. Emits the learned merge table (round, pair, fused,
    weighted count) — the artifact a tokenizer ships."""
    tops, _ = _bpe_rounds(spark, sf_dir, rounds=3)
    outs = [
        top.select(
            F.lit(r).alias("merge_round"),
            "pair",
            F.replace("pair", F.lit(" "), F.lit("")).alias("fused"),
            F.col("cnt").alias("pair_count"),
        )
        for r, top in enumerate(tops, start=1)
    ]
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def _bpe_rounds(
    spark: SparkSession, sf_dir: str, rounds: int
) -> tuple[list[DataFrame], DataFrame]:
    """Shared BPE trainer core: returns ([one-row (pair, cnt) per merge
    round], final (word, seq, n) symbol table after all merges). The
    word column rides along so apply-side ops can join per-language
    counts back on it."""
    d = load(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    seq = words.select(
        "word",
        F.concat(
            F.lit(" "),
            F.rtrim(F.regexp_replace("word", "(.)", "$1 ")),
            F.lit(" "),
        ).alias("seq"),
        "n",
    )

    def pair_counts(s: DataFrame) -> DataFrame:
        toks = F.split(F.trim(F.col("seq")), " ")
        # guard: single-symbol sequences have no pairs (sequence(0,-1)
        # would DESCEND and index 0 is invalid for element_at)
        prs = F.when(
            F.size(toks) >= 2,
            F.transform(
                _bigram_positions(toks),
                lambda i: F.concat(
                    F.element_at(toks, i + 1), F.lit(" "), F.element_at(toks, i + 2)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return (
            s.select(F.explode(prs).alias("pair"), "n")
            .groupBy("pair")
            .agg(F.sum("n").alias("cnt"))
        )

    tops = []
    for _ in range(rounds):
        top = (
            pair_counts(seq)
            .orderBy(F.col("cnt").desc(), "pair")
            .limit(1)
            .select("pair", "cnt")
        )
        tops.append(top)
        seq = seq.crossJoin(F.broadcast(top)).select(
            "word",
            F.replace(
                F.col("seq"),
                F.concat(F.lit(" "), F.col("pair"), F.lit(" ")),
                F.concat(
                    F.lit(" "),
                    F.replace("pair", F.lit(" "), F.lit("")),
                    F.lit(" "),
                ),
            ).alias("seq"),
            "n",
        ).localCheckpoint()
    return tops, seq


# Shared oracle-SQL fragments for the BPE family: the training chain
# (words → s0 → 3 × (pair-count → top-1 → replace)) with the word
# column retained, so apply-side oracles can join language counts back.
_BPE_PAIRS = """
      select word, pr as pair, n from (
        select word,
               unnest(list_transform(range(1, len(string_split(trim(seq), ' '))),
                      i -> string_split(trim(seq), ' ')[i] || ' ' ||
                           string_split(trim(seq), ' ')[i + 1])) as pr, n
        from {src}
      )
"""

_BPE_TRAIN_CTES = f"""
    words as (
      select word, count(*) as n from (
        select unnest(string_split(text, ' ')) as word from documents
      ) where word <> '' group by word
    ),
    s0 as (
      select word,
             ' ' || rtrim(regexp_replace(word, '(.)', '\\1 ', 'g')) || ' ' as seq,
             n from words
    ),
    p1 as (select pair, sum(n) as cnt from ({_BPE_PAIRS.format(src='s0')}) group by pair),
    t1 as (select pair, cnt from p1 order by cnt desc, pair limit 1),
    s1 as (
      select word, replace(seq, ' ' || t1.pair || ' ',
                     ' ' || replace(t1.pair, ' ', '') || ' ') as seq, n
      from s0, t1
    ),
    p2 as (select pair, sum(n) as cnt from ({_BPE_PAIRS.format(src='s1')}) group by pair),
    t2 as (select pair, cnt from p2 order by cnt desc, pair limit 1),
    s2 as (
      select word, replace(seq, ' ' || t2.pair || ' ',
                     ' ' || replace(t2.pair, ' ', '') || ' ') as seq, n
      from s1, t2
    ),
    p3 as (select pair, sum(n) as cnt from ({_BPE_PAIRS.format(src='s2')}) group by pair),
    t3 as (select pair, cnt from p3 order by cnt desc, pair limit 1),
    s3 as (
      select word, replace(seq, ' ' || t3.pair || ' ',
                     ' ' || replace(t3.pair, ' ', '') || ' ') as seq, n
      from s2, t3
    )
"""


@register(
    "text_bpe_apply_stats",
    group="J",
    oracle=f"""
    with {_BPE_TRAIN_CTES},
    wl as (
      select lang, word, count(*) as m from (
        select lang, unnest(string_split(text, ' ')) as word from documents
      ) where word <> '' group by lang, word
    ),
    joined as (
      select wl.lang, wl.m,
             length(wl.word) as n_chars,
             len(string_split(trim(s3.seq), ' ')) as n_tokens
      from wl join s3 on wl.word = s3.word
    )
    select lang,
           cast(sum(m) as bigint) as n_words,
           round(sum(m * n_chars) * 1.0 / sum(m), 4) as avg_chars,
           round(sum(m * n_tokens) * 1.0 / sum(m), 4) as avg_tokens,
           round(sum(m * n_chars) * 1.0 / sum(m * n_tokens), 4)
             as chars_per_token
    from joined group by lang
    """,
)
def text_bpe_apply_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLY side: segment the corpus with the merges
    text_bpe_train_lite learned and report per-language compression —
    words, average chars, average post-merge tokens, and chars/token
    (the fertility metric tokenizer teams track per language). The
    trained symbol table is vocabulary-sized, so application is one
    broadcast-friendly join of (lang, word) counts onto it; the corpus
    is never re-scanned per merge. All ratios are exact integer-sum
    divisions rounded once."""
    _, seq = _bpe_rounds(spark, sf_dir, rounds=3)
    d = load(spark, sf_dir, "documents")
    wl = (
        d.select("lang", F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    joined = wl.join(seq.select("word", "seq"), "word").select(
        "lang",
        "m",
        F.length("word").alias("n_chars"),
        F.size(F.split(F.trim(F.col("seq")), " ")).alias("n_tokens"),
    )
    return joined.groupBy("lang").agg(
        F.sum("m").alias("n_words"),
        F.round(F.sum(F.col("m") * F.col("n_chars")) / F.sum("m"), 4).alias(
            "avg_chars"
        ),
        F.round(F.sum(F.col("m") * F.col("n_tokens")) / F.sum("m"), 4).alias(
            "avg_tokens"
        ),
        F.round(
            F.sum(F.col("m") * F.col("n_chars"))
            / F.sum(F.col("m") * F.col("n_tokens")),
            4,
        ).alias("chars_per_token"),
    )


@register(
    "text_keyphrase_rake",
    group="J",
    oracle="""
    with toks as (
      select doc_id, pos, tok,
             cast(tok in ('a', 'the') as integer) as is_stop
      from (
        select doc_id,
               unnest(range(len(string_split(text, ' ')))) as pos,
               unnest(string_split(text, ' ')) as tok
        from documents
      ) where tok <> ''
    ),
    islands as (
      select doc_id, pos, tok,
             sum(is_stop) over (partition by doc_id order by pos
                                rows unbounded preceding) as island
      from toks
      qualify is_stop = 0
    ),
    phrases as (
      select doc_id, island,
             string_agg(tok, ' ' order by pos) as phrase,
             count(*) as plen
      from islands group by doc_id, island
    ),
    words as (
      select u.t as word, count(*) as freq, sum(p.plen) as deg
      from phrases p,
           unnest(string_split(p.phrase, ' ')) as u(t)
      group by u.t
    ),
    scored as (
      select p.phrase, count(*) as n_occurrences,
             round(sum_score, 4) as rake_score
      from phrases p join (
        select ph.doc_id, ph.island,
               sum(w.deg * 1.0 / w.freq) as sum_score
        from phrases ph,
             unnest(string_split(ph.phrase, ' ')) as u(t)
        join words w on w.word = u.t
        group by ph.doc_id, ph.island
      ) sc on sc.doc_id = p.doc_id and sc.island = p.island
      group by p.phrase, round(sum_score, 4)
    )
    select phrase, n_occurrences, rake_score
    from scored
    order by rake_score desc, phrase limit 20
    """,
)
def text_keyphrase_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010, public method):
    candidate phrases are maximal stopword-free token runs
    (gaps-and-islands via a running stopword count per doc), each word
    scores degree/frequency (degree = summed length of phrases it
    appears in), and a phrase scores the sum of its words — top-20
    phrases by score. Plan: one explode feeds the island window (one
    shuffle on doc_id), phrase rollup, a vocabulary-sized word-stats
    frame broadcast back onto phrase words, and a TakeOrdered top-k.
    The stopword list is the corpus's own function words. All ratios
    round-4 before the final ordering."""
    d = load(spark, sf_dir, "documents")
    toks = (
        d.select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
        )
        .where(F.col("tok") != "")
        .withColumn("is_stop", F.col("tok").isin("a", "the").cast("int"))
    )
    w_doc = W.partitionBy("doc_id").orderBy("pos").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    islands = (
        toks.withColumn("island", F.sum("is_stop").over(w_doc))
        .where(F.col("is_stop") == 0)
    )
    phrases = islands.groupBy("doc_id", "island").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s.tok,
            ),
            " ",
        ).alias("phrase"),
        F.count(F.lit(1)).alias("plen"),
    )
    pw = phrases.select(
        "doc_id", "island", "plen", F.explode(F.split("phrase", " ")).alias("word")
    )
    words = pw.groupBy("word").agg(
        F.count(F.lit(1)).alias("freq"), F.sum("plen").alias("deg")
    )
    phrase_scores = (
        pw.join(F.broadcast(words), "word")
        .groupBy("doc_id", "island")
        .agg(F.round(F.sum(F.col("deg") / F.col("freq")), 4).alias("rake_score"))
    )
    return (
        phrases.join(phrase_scores, ["doc_id", "island"])
        .groupBy("phrase", "rake_score")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .select("phrase", "n_occurrences", "rake_score")
        .orderBy(F.col("rake_score").desc(), "phrase")
        .limit(20)
    )


@register(
    "text_quality_buckets_ccnet",
    group="J",
    oracle="""
    with tok as (
        select doc_id, lang, unnest(string_split(text, ' ')) as w
        from documents
    ),
    cnt as (select w, count(*) as c from tok group by 1),
    tot as (select sum(c) as n from cnt),
    doc as (
        select t.doc_id, t.lang,
               cast(sum(cast(floor(ln(c * 1.0 / n) * 1e4 + 0.5) as bigint))
                    as double) / count(*) / 1e4 as logprob
        from tok t join cnt on t.w = cnt.w cross join tot
        group by 1, 2
    ),
    cut as (
      select quantile_cont(logprob, 1.0/3) as t1,
             quantile_cont(logprob, 2.0/3) as t2
      from doc
    ),
    bucketed as (
      select lang,
             case when logprob >= t2 then 'head'
                  when logprob >= t1 then 'middle'
                  else 'tail' end as bucket
      from doc, cut
    )
    select lang, bucket, count(*) as n_docs
    from bucketed group by lang, bucket
    """,
)
def text_quality_buckets_ccnet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality bucketing (Wenzek et al. 2020, public
    method): score every document with the corpus unigram LM (same
    quantized-exact per-doc log-prob as text_unigram_logprob), cut the
    score distribution at terciles, and assign head/middle/tail — the
    partition CCNet uses to keep head+middle for LM training. The
    tercile cutpoints are two scalar quantiles (broadcast back); the
    only data-sized passes are the token explode and the per-doc
    rollup. Interpolated-percentile parity is pinned by
    agg_percentile_exact; per-doc scores are integer-quantized so the
    cut comparisons see identical doubles in both engines."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("w"))
    cnt = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.agg(F.sum("c").alias("n"))
    doc = (
        tok.join(F.broadcast(cnt), "w")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id", "lang")
        .agg(
            (
                F.sum(
                    F.floor(F.log(F.col("c") * 1.0 / F.col("n")) * 1e4 + 0.5).cast(
                        "long"
                    )
                ).cast("double")
                / F.count(F.lit(1))
                / 1e4
            ).alias("logprob")
        )
    )
    cut = doc.agg(
        F.percentile("logprob", F.lit(1.0 / 3)).alias("t1"),
        F.percentile("logprob", F.lit(2.0 / 3)).alias("t2"),
    )
    bucketed = doc.crossJoin(F.broadcast(cut)).select(
        "lang",
        F.when(F.col("logprob") >= F.col("t2"), "head")
        .when(F.col("logprob") >= F.col("t1"), "middle")
        .otherwise("tail")
        .alias("bucket"),
    )
    return bucketed.groupBy("lang", "bucket").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


@register(
    "text_stopword_discovery",
    group="J",
    oracle="""
    with df as (
      select tok, count(distinct doc_id) as doc_freq, count(*) as term_freq
      from (
        select doc_id, unnest(string_split(text, ' ')) as tok
        from documents
      ) where tok <> ''
      group by tok
    ),
    n as (select count(*) as n_docs from documents)
    select tok,
           doc_freq,
           term_freq,
           round(doc_freq * 1.0 / n_docs, 6) as doc_frac,
           round(term_freq * 1.0 / doc_freq, 4) as burst_ratio
    from df, n
    where doc_freq * 1.0 / n_docs >= 0.5
    order by doc_freq desc, tok
    """,
)
def text_stopword_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-driven stopword discovery (the corpus-statistics route —
    no hand list): terms present in ≥50% of documents, with their
    document fraction and burst ratio (total occurrences per containing
    doc — function words repeat within docs, topical terms cluster).
    This is where the stopword list OTHER text operators consume comes
    from; the oracle keeps the discovery honest. One explode + one
    grouped pass; the candidate set is vocabulary-sized."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok")).where(
        F.col("tok") != ""
    )
    df_ = tok.groupBy("tok").agg(
        F.countDistinct("doc_id").alias("doc_freq"),
        F.count(F.lit(1)).alias("term_freq"),
    )
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        df_.crossJoin(F.broadcast(n))
        .where(F.col("doc_freq") / F.col("n_docs") >= 0.5)
        .select(
            "tok",
            "doc_freq",
            "term_freq",
            F.round(F.col("doc_freq") / F.col("n_docs"), 6).alias("doc_frac"),
            F.round(F.col("term_freq") / F.col("doc_freq"), 4).alias("burst_ratio"),
        )
        .orderBy(F.col("doc_freq").desc(), "tok")
    )
