"""Unit tests for the Bloom-pruned join, weighted mixture sampling,
and edit-distance near-dup operators (beyond their oracle rows)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.operators.bloomjoin import (
    bloom_filtered_join, bloom_prune, build_bloom_bitmap,
)
from anomaly_detection_spark.pipeline.editdist import (
    edit_distance_near_duplicates,
)
from anomaly_detection_spark.pipeline.mixture import (
    mixture_quotas, weighted_mixture_sample,
)
from anomaly_detection_spark.sources.tables import load_table


# --------------------------------------------------------------- bloom join

def test_bloom_no_false_negatives(spark):
    dim = spark.range(0, 500).select((F.col("id") * 7).alias("k"))
    bitmap = build_bloom_bitmap(dim, "k", n_bits=1 << 14, n_hashes=5)
    fact = spark.range(0, 3500).select(F.col("id").alias("k"))
    kept = {r["k"] for r in bloom_prune(fact, "k", bitmap).collect()}
    true_keys = {i * 7 for i in range(500)}
    assert true_keys <= kept, "bloom dropped a true key"


def test_bloom_prunes_most_non_members(spark):
    dim = spark.range(0, 200).select(F.col("id").alias("k"))
    bitmap = build_bloom_bitmap(dim, "k", n_bits=1 << 16, n_hashes=5)
    fact = spark.range(0, 100_000).select(F.col("id").alias("k"))
    n_kept = bloom_prune(fact, "k", bitmap).count()
    # 200 members + FPs; with m/n = 65536/200 bits the FP rate is tiny
    assert n_kept < 1_000, f"bloom kept {n_kept} of 100k rows"


def test_bloom_filtered_join_equals_plain_join(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    dim = (
        load_table(spark, "customer", sf_dir)
        .where(F.col("c_acctbal") > 7000)
        .select("c_custkey", "c_nationkey")
    )
    ours = bloom_filtered_join(orders, dim, "o_custkey", "c_custkey")
    plain = orders.join(dim, orders["o_custkey"] == dim["c_custkey"], "inner")
    cols = ["o_orderkey", "c_custkey", "c_nationkey"]
    assert sorted(map(tuple, ours.select(*cols).collect())) == sorted(
        map(tuple, plain.select(*cols).collect())
    )


def test_bloom_null_keys_dropped(spark):
    dim = spark.range(0, 10).select(F.col("id").alias("k"))
    bitmap = build_bloom_bitmap(dim, "k", n_bits=1 << 10)
    fact = spark.createDataFrame([(1,), (None,), (5,)], "k bigint")
    kept = {r["k"] for r in bloom_prune(fact, "k", bitmap).collect()}
    assert None not in kept and {1, 5} <= kept


# ---------------------------------------------------------------- mixture

def test_mixture_quota_law_exact(spark):
    counts = spark.createDataFrame(
        [("a", 1000), ("b", 1000), ("c", 1000)], "domain string, n_avail long"
    )
    # 100 * {a: 1/3, b: 1/3, c: 1/3}: bases 33/33/33, one leftover unit
    # goes to the largest remainder — tie on remainder, 'a' wins by name
    q = {r["domain"]: r["quota"] for r in
         mixture_quotas(counts, {"a": 1, "b": 1, "c": 1}, 100).collect()}
    assert q == {"a": 34, "b": 33, "c": 33}
    assert sum(q.values()) == 100


def test_mixture_quota_caps_at_available(spark):
    counts = spark.createDataFrame(
        [("a", 5), ("b", 1000)], "domain string, n_avail long"
    )
    q = {r["domain"]: r["quota"] for r in
         mixture_quotas(counts, {"a": 50, "b": 50}, 100).collect()}
    # a's 50-doc ask caps at its 5 available; shortfall NOT backfilled
    assert q == {"a": 5, "b": 50}


def test_mixture_unknown_domain_excluded(spark):
    counts = spark.createDataFrame(
        [("a", 10), ("zzz", 10)], "domain string, n_avail long"
    )
    q = {r["domain"]: r["quota"] for r in
         mixture_quotas(counts, {"a": 1}, 10).collect()}
    assert q["zzz"] == 0 and q["a"] == 10


def test_mixture_sample_deterministic_across_partitioning(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    parts = {"en": 400, "zh": 200, "de": 150, "fr": 150, "es": 100}
    a = weighted_mixture_sample(docs, parts, 100, denom=1000)
    b = weighted_mixture_sample(docs.repartition(17, "lang"), parts, 100,
                                denom=1000)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    assert a.count() == 100


# --------------------------------------------------------------- edit dist

def _brute_pairs(rows, prefix_len=24):
    import re

    def norm(s):
        return re.sub(r"[^\x00-\x7F]", "#", s[:prefix_len].lower())

    def lev(a, b):
        m, n = len(a), len(b)
        d = list(range(n + 1))
        for i in range(1, m + 1):
            prev, d[0] = d[0], i
            for j in range(1, n + 1):
                prev, d[j] = d[j], min(
                    d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
                )
        return d[n]

    out = set()
    for i, (ia, ta) in enumerate(rows):
        for ib, tb in rows[i + 1:]:
            x, y = (ia, ib) if ia < ib else (ib, ia)
            if lev(norm(ta), norm(tb)) <= 1:
                out.add((x, y))
    return out


@pytest.mark.parametrize("case", ["long", "short", "unicode"])
def test_editdist_blocking_complete_vs_brute_force(spark, case):
    base = "the quick brown fox jumps over it"
    if case == "long":
        rows = [
            (1, base),                     # identical prefix pair with 2
            (2, base + " extra tail"),
            (3, "The quick brown fox jumps"),   # case fold → dup of 1
            (4, "xhe quick brown fox jumps"),   # substitution at p=1
            (5, "the quick brown fox Xumps"),   # substitution at p=21
            (6, "he quick brown fox jumpsX"),   # deletion at p=1
            (7, "the quick brown fox jump"),    # same 24-prefix as 1
            (8, "completely different words"),
            (9, "the quick brOwn fox jXmps"),   # 2 edits vs 1 → excluded
        ]
    elif case == "short":
        rows = [
            (1, "tiny"), (2, "tinY"), (3, "tin"), (4, "tines"),
            (5, "winy"), (6, "completely different again"), (7, "ti"),
        ]
    else:
        rows = [
            (1, "日本語のテストですこれは長い文字列です"),
            (2, "日本語のテストですこれは長い文字列だす"),  # 1 CJK edit
            (3, "héllo world padded out to length!!"),
            (4, "hallo world padded out to length!!"),  # é→#, a↔# = 1 edit
        ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["id_a"], r["id_b"])
           for r in edit_distance_near_duplicates(docs).collect()}
    assert got == _brute_pairs(rows)


def test_editdist_no_duplicate_pairs(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    out = edit_distance_near_duplicates(docs)
    assert out.count() == out.select("id_a", "id_b").distinct().count()


# ----------------------------------------------------------- plan shapes

def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bloom_prune_filter_precedes_join_exchange(spark, sf_dir):
    """The scale contract: the bitmap ride-along is a BROADCAST (no
    shuffle of the fact side to meet the bitmap), and the surviving
    plan still pushes fact-scan filters.  A hash exchange BEFORE the
    bloom filter would defeat the whole point."""
    from anomaly_detection_spark.operators.bloomjoin import (
        bloom_prune, build_bloom_bitmap,
    )
    orders = load_table(spark, "orders", sf_dir)
    dim = load_table(spark, "customer", sf_dir).where(F.col("c_acctbal") > 7000)
    bitmap = build_bloom_bitmap(dim, "c_custkey", n_bits=1 << 16)
    pruned = bloom_prune(orders, "o_custkey", bitmap)
    plan = _physical_plan(pruned)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # pruning is map-side only: no hash/range exchange in this subplan
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_mixture_sample_single_corpus_shuffle(spark, sf_dir):
    """One hash exchange for the corpus (the domain window); the quota
    table joins as a broadcast."""
    from anomaly_detection_spark.pipeline.mixture import weighted_mixture_sample
    docs = load_table(spark, "documents", sf_dir)
    out = weighted_mixture_sample(
        docs, {"en": 400, "zh": 200, "de": 150, "fr": 150, "es": 100}, 100,
        denom=1000,
    )
    plan = _physical_plan(out)
    # corpus-shaped exchanges: the ranked window's hashpartitioning on
    # lang + the counts aggregation; the quota join must be broadcast
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_editdist_no_cartesian(spark, sf_dir):
    """Candidate generation is equi-join blocking — a cartesian product
    anywhere means the pigeonhole rewrite regressed."""
    docs = load_table(spark, "documents", sf_dir)
    plan = _physical_plan(edit_distance_near_duplicates(docs))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_mixture_empty_weighted_domain_not_backfilled(spark):
    """A weighted domain with ZERO available rows still consumes its
    base units (quota 0, units lost) — they must not leak into other
    domains via the leftover pool."""
    counts = spark.createDataFrame(
        [("a", 1000)], "domain string, n_avail long"
    )
    q = {r["domain"]: r["quota"] for r in
         mixture_quotas(counts, {"a": 50, "b": 50}, 100).collect()}
    assert q == {"a": 50, "b": 0}


# ------------------------------------------------------- property tests

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    texts=st.lists(
        st.text(alphabet="abé日", min_size=0, max_size=30),
        min_size=2, max_size=12,
    )
)
def test_editdist_complete_on_random_strings(spark, texts):
    """Blocking completeness under hypothesis: arbitrary short strings
    (including the short band, unicode folding, empty strings) must
    reproduce brute force exactly."""
    rows = [(i, t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["id_a"], r["id_b"])
           for r in edit_distance_near_duplicates(docs).collect()}
    assert got == _brute_pairs(rows)


@settings(max_examples=15, deadline=None)
@given(
    avail=st.dictionaries(
        st.sampled_from(["a", "b", "c", "d"]),
        st.integers(min_value=0, max_value=40), min_size=1, max_size=4,
    ),
    parts=st.dictionaries(
        st.sampled_from(["a", "b", "c", "d", "ghost"]),
        st.integers(min_value=0, max_value=10), min_size=1, max_size=5,
    ),
    total=st.integers(min_value=0, max_value=60),
)
def test_mixture_quota_law_invariants(avail, parts, total):
    """The quota law in pure Python mirrors mixture_quotas exactly
    (same code path, driver-side): check the lawbook invariants."""
    denom = sum(parts.values())
    if denom <= 0:
        return
    domains = sorted(set(avail) | set(parts))
    numer = {d: parts.get(d, 0) * total for d in domains}
    base = {d: numer[d] // denom for d in domains}
    rem = {d: numer[d] % denom for d in domains}
    leftover = total - sum(base.values())
    for d in sorted(domains, key=lambda d: (-rem[d], d))[:max(leftover, 0)]:
        base[d] += 1
    quota = {d: min(base[d], avail.get(d, 0)) for d in domains}
    # invariants: bounded by availability and ask; uncapped sum == total
    assert all(quota[d] <= avail.get(d, 0) for d in domains)
    assert sum(base.values()) == total
    assert all(quota[d] <= base[d] for d in domains)
    # zero-weight domains never sample
    assert all(quota[d] == 0 for d in domains if parts.get(d, 0) == 0)
