"""Property-style algebraic invariants (SURVEY.md §5) — cheap cross-
operator consistency checks that catch systematic errors no single
oracle comparison would."""

from __future__ import annotations

from pyspark.sql import functions as F

from datalakecrawler_spark import registry
from datalakecrawler_spark.io import load
from tests.conftest import SF_DIR


def _run(spark, name):
    return registry.all_queries()[name].fn(spark, SF_DIR)


def test_semi_plus_anti_partitions_left(spark):
    """left_semi ∪ left_anti = the whole left table, disjointly."""
    c = load(spark, SF_DIR, "customer")
    o = load(spark, SF_DIR, "orders")
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi")
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti")
    assert semi.count() + anti.count() == c.count()
    assert semi.select("c_custkey").intersect(anti.select("c_custkey")).count() == 0


def test_union_all_counts_additive(spark):
    o = load(spark, SF_DIR, "orders")
    a = o.where(F.col("o_totalprice") > 250000)
    b = o.where(F.col("o_orderstatus") == "P")
    assert a.unionByName(b).count() == a.count() + b.count()


def test_rollup_grand_total_equals_ungrouped(spark):
    rows = _run(spark, "agg_rollup").collect()
    grand = [r for r in rows if r["o_orderpriority"] is None and r["o_orderstatus"] is None]
    assert len(grand) == 1
    o = load(spark, SF_DIR, "orders")
    assert grand[0]["cnt"] == o.count()


def test_cube_contains_rollup_rows(spark):
    cube = {
        (r["l_returnflag"], r["l_linestatus"]): r["cnt"]
        for r in _run(spark, "agg_cube").collect()
    }
    li = load(spark, SF_DIR, "lineitem")
    # cube grand total and one-dim marginals must agree with direct aggs
    assert cube[(None, None)] == li.count()
    per_flag = {
        r["l_returnflag"]: r["c"]
        for r in li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    for flag, cnt in per_flag.items():
        assert cube[(flag, None)] == cnt


def test_except_union_roundtrip(spark):
    """(A except-all B) + B-restricted-to-A preserves multiset size."""
    o = load(spark, SF_DIR, "orders")
    a = o.select("o_custkey")
    b = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    assert _runs_to_count(a.exceptAll(b)) == a.count() - b.count()


def _runs_to_count(df):
    return df.count()


def test_topk_is_prefix_of_full_sort(spark):
    top10 = [r["o_orderkey"] for r in _run(spark, "limit_topn").collect()]
    full = (
        load(spark, SF_DIR, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(30)
        .collect()
    )
    assert top10 == [r["o_orderkey"] for r in full[:10]]


def test_dedup_keeplist_complement(spark):
    """keep-list + dropped docs = all docs; dropped ⊆ near-dup members."""
    keep = {r["doc_id"] for r in _run(spark, "dedup_keeplist").collect()}
    all_ids = {r["doc_id"] for r in load(spark, SF_DIR, "documents").select("doc_id").collect()}
    dropped = all_ids - keep
    pair_members = set()
    for r in _run(spark, "dedup_near_minhash").collect():
        pair_members.add(r["doc_b"])
    assert dropped == pair_members


def test_fixture_fk_containment(spark):
    """Golden-fixture invariants (SURVEY §5): FK containment is clean —
    catches a corrupted testdata mount before a confusing oracle diff."""
    li = load(spark, SF_DIR, "lineitem")
    o = load(spark, SF_DIR, "orders")
    c = load(spark, SF_DIR, "customer")
    n = load(spark, SF_DIR, "nation")
    assert li.join(o, li.l_orderkey == o.o_orderkey, "left_anti").count() == 0
    assert o.join(c, o.o_custkey == c.c_custkey, "left_anti").count() == 0
    assert c.join(n, c.c_nationkey == n.n_nationkey, "left_anti").count() == 0


def test_fixture_embedding_invariants(spark):
    """Embeddings: fixed dim 64, L2-normalized (cosine ≡ dot)."""
    e = load(spark, SF_DIR, "embeddings")
    dims = e.select(F.size("embedding").alias("d")).distinct().collect()
    assert [r["d"] for r in dims] == [64]
    norms = _run(spark, "mm_vector_norms").collect()
    for r in norms:
        assert abs(r["min_norm"] - 1.0) < 0.01 and abs(r["max_norm"] - 1.0) < 0.01
