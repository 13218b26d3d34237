"""Property-based invariants (SURVEY.md §5 item 5) + skew-rewrite
equivalences: randomized small relations via hypothesis, algebraic
identities that must hold for any input."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from solis_solarman_clickhouse_spark.operators.skew import (
    salted_agg,
    salted_broadcast_left,
    top_keys,
)
from solis_solarman_clickhouse_spark.tables import table

from .conftest import SF_DIR

_SLOW = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

rel = st.lists(
    st.tuples(st.integers(0, 5), st.integers(-100, 100)), min_size=0, max_size=30
)


def _df(spark, rows, cols=("k", "v")):
    return spark.createDataFrame(rows or [(0, 0)], list(cols)).limit(
        len(rows)
    )  # limit(0) keeps the schema for empty input


def test_salted_agg_equals_plain(spark):
    ev = table(spark, SF_DIR, "events")
    aggs = {
        "sum_v": ("sum", "value"),
        "n": ("count", "value"),
        "mn": ("min", "value"),
        "mx": ("max", "value"),
    }
    plain = ev.groupBy("user_id").agg(
        F.sum("value").alias("sum_v"),
        F.count("value").alias("n"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )
    salted = salted_agg(ev, ["user_id"], aggs, n_salts=8)
    # compare on rounded sums (double addition order differs by design)
    norm = lambda df: df.select(
        "user_id", F.round("sum_v", 6).alias("s"), "n", "mn", "mx"
    )
    assert norm(salted).exceptAll(norm(plain)).count() == 0
    assert norm(plain).exceptAll(norm(salted)).count() == 0


def test_salted_broadcast_join_equals_plain(spark):
    orders = table(spark, SF_DIR, "orders")
    cust = table(spark, SF_DIR, "customer")
    plain = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "c_name"
    )
    salted = salted_broadcast_left(
        orders, cust, orders.o_custkey == cust.c_custkey
    ).select("o_orderkey", "c_name")
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_top_keys_shares_sum_below_one(spark):
    ev = table(spark, SF_DIR, "events")
    rows = top_keys(ev, ["event_type"], n=5).collect()
    assert all(0 < r["share"] <= 1 for r in rows)
    assert sum(r["share"] for r in rows) <= 1.000001


@_SLOW
@given(left=rel, right=rel)
def test_semi_join_identity(spark, left, right):
    """left_semi ≡ project(distinct(inner)) on the left's columns."""
    l = _df(spark, left)
    r = _df(spark, right, cols=("k", "w"))
    semi = l.join(r, "k", "left_semi")
    via_inner = l.join(r.select("k").distinct(), "k", "inner")
    assert sorted(map(tuple, semi.collect())) == sorted(map(tuple, via_inner.collect()))


@_SLOW
@given(rows=rel)
def test_running_sum_equals_self_join(spark, rows):
    """Window running-sum ≡ self-join sum over (k, idx<=self)."""
    df = (
        _df(spark, rows)
        .withColumn("idx", F.monotonically_increasing_id())
    ).cache()
    w = W.partitionBy("k").orderBy("idx").rowsBetween(W.unboundedPreceding, W.currentRow)
    winsum = df.withColumn("rs", F.sum("v").over(w)).select("k", "idx", "rs")
    a, b = df.alias("a"), df.alias("b")
    sjsum = (
        a.join(b, (F.col("a.k") == F.col("b.k")) & (F.col("b.idx") <= F.col("a.idx")))
        .groupBy(F.col("a.k").alias("k"), F.col("a.idx").alias("idx"))
        .agg(F.sum("b.v").alias("rs"))
    )
    assert sorted(map(tuple, winsum.collect())) == sorted(map(tuple, sjsum.collect()))


@_SLOW
@given(rows=rel)
def test_rollup_contains_plain_groupby(spark, rows):
    """rollup(k) ⊇ groupBy(k) with identical aggregates."""
    df = _df(spark, rows)
    plain = df.groupBy("k").agg(F.sum("v").alias("s"))
    roll = df.rollup("k").agg(F.sum("v").alias("s")).filter(F.col("k").isNotNull())
    assert plain.exceptAll(roll).count() == 0


def test_simhash_banding_complete_vs_bruteforce(spark):
    """Pigeonhole completeness: the banded simhash_pairs_exact must return
    EXACTLY the pairs a brute-force all-pairs popcount finds at
    max_hamming=8 (banding may only generate false candidates, never miss
    — and verification removes the false ones)."""
    from solis_solarman_clickhouse_spark.operators.dedup import (
        simhash_fingerprints_md5,
        simhash_pairs_exact,
    )

    docs = table(spark, SF_DIR, "documents")
    banded = simhash_pairs_exact(docs, max_hamming=8)
    fps = simhash_fingerprints_md5(docs)
    a, b = fps.alias("a"), fps.alias("b")
    brute = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= 8)
    )
    assert banded.exceptAll(brute).count() == 0
    assert brute.exceptAll(banded).count() == 0


def test_funnel_levels_partition_users(spark):
    """ch_window_funnel invariants: levels are within 0..3 and the level
    histogram partitions the distinct-user universe exactly."""
    from solis_solarman_clickhouse_spark.queries.registry import REGISTRY

    rows = REGISTRY["ch_window_funnel"].fn(spark, SF_DIR).collect()
    levels = {r["funnel_level"] for r in rows}
    assert levels <= {0, 1, 2, 3}
    n_users = table(spark, SF_DIR, "events").select("user_id").distinct().count()
    assert sum(r["n_users"] for r in rows) == n_users


def test_retention_is_monotone(spark):
    """retention(view, click, purchase): AND-ed conditions can only shrink
    the anchor cohort."""
    from solis_solarman_clickhouse_spark.queries.registry import REGISTRY

    r = REGISTRY["ch_retention"].fn(spark, SF_DIR).collect()[0]
    assert r["r_view"] >= r["r_view_click"] >= 0
    assert r["r_view"] >= r["r_view_purchase"] >= 0


def test_connected_components_chain_transitivity(spark):
    """A-B and B-C must land in one component even with no A-C edge; two
    disjoint cliques must stay separate."""
    from solis_solarman_clickhouse_spark.operators.graph import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (20, 21)],
        ["doc_a", "doc_b"],
    )
    got = {
        r["node"]: r["component"] for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_chunk_split_reconstructs_documents(spark):
    """Dropping each chunk's 8-token overlap tail (keeping the first 24
    = stride tokens, and the last chunk whole) must re-concatenate to
    the original text for every document — chunking loses nothing."""
    from solis_solarman_clickhouse_spark.queries.registry import REGISTRY

    chunks = REGISTRY["doc_chunk_split"].fn(spark, SF_DIR)
    docs = table(spark, SF_DIR, "documents").select("doc_id", "text")
    rebuilt = (
        chunks.groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("chunk_id", "chunk_text"))).alias("cs")
        )
        .select(
            "doc_id",
            F.array_join(
                F.transform(
                    "cs",
                    lambda s, i: F.when(
                        i < F.size("cs") - 1,
                        F.array_join(
                            F.slice(F.split(s["chunk_text"], " "), 1, 24), " "
                        ),
                    ).otherwise(s["chunk_text"]),
                ),
                " ",
            ).alias("rebuilt"),
        )
    )
    bad = (
        rebuilt.join(docs, "doc_id")
        .filter(F.col("rebuilt") != F.col("text"))
        .count()
    )
    assert bad == 0


def test_line_dedup_preserves_unique_docs_and_counts(spark):
    """Segment accounting: per-doc segments = ceil(n_tokens/16); a doc
    whose segments are all first occurrences keeps its exact text."""
    from solis_solarman_clickhouse_spark.queries.registry import REGISTRY

    out = REGISTRY["doc_line_dedup"].fn(spark, SF_DIR)
    docs = table(spark, SF_DIR, "documents").select(
        "doc_id", "text", F.size(F.split("text", " ")).alias("n_tokens")
    )
    j = out.join(docs, "doc_id")
    bad_counts = j.filter(
        F.col("n_segments") != F.ceil(F.col("n_tokens") / 16.0)
    ).count()
    assert bad_counts == 0
    intact = j.filter(F.col("n_removed") == 0)
    assert intact.count() > 0
    assert intact.filter(F.col("cleaned_text") != F.col("text")).count() == 0


def test_pagerank_conserves_mass_and_positivity(spark):
    """Bidirectional edges mean no dangling mass: total rank stays within
    integer-floor slippage of the initial 1e12, and every node keeps a
    positive rank ≥ the teleport floor."""
    from solis_solarman_clickhouse_spark.queries.registry import REGISTRY

    r = REGISTRY["graph_pagerank"].fn(spark, SF_DIR)
    row = r.agg(
        F.sum("rank_e12").alias("mass"),
        F.min("rank_e12").alias("mn"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    # integer-floor slippage: the init div loses up to n-1 units and each
    # sweep floors contrib/base/damp once per node — bound it loosely at
    # 100 units/node (1.6e-5 relative at the sf0.001 graph's 160 nodes)
    assert abs(row["mass"] - 1_000_000_000_000) < 100 * row["n"], row
    assert row["mn"] > 0


def test_stochastic_linreg_stays_stable(spark):
    """One SGD epoch at lr=0.05 over normalized inputs must neither
    diverge nor collapse: parameters finite and bounded, the bias pulled
    toward the positive price mean, and with few samples (sf0.001) the
    per-group weights may still straddle zero — so assert stability and
    the bias signal, not a converged slope."""
    import math

    from solis_solarman_clickhouse_spark.queries.registry import REGISTRY

    rows = REGISTRY["ch_stochastic_linreg"].fn(spark, SF_DIR).collect()
    assert len(rows) == 3
    for r in rows:
        assert math.isfinite(r["weight"]) and math.isfinite(r["bias"])
        assert abs(r["weight"]) < 5 and 0.0 < r["bias"] < 5, r
