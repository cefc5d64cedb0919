"""Tests for the LLM-pipeline operators: dedup, similarity, text,
multimodal plumbing; plus STL applyInPandas vs a local pandas oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.detect.stl import decompose, iqr_anomalize, stl_iqr_detect
from anomaly_detection_spark.pipeline.dedup import exact_dedup, minhash_near_duplicates
from anomaly_detection_spark.pipeline.multimodal import (
    attach_binary_payload, decode_stub, extract_features,
)
from anomaly_detection_spark.pipeline.similarity import brute_force_topk
from anomaly_detection_spark.sources.tables import load_table


def test_exact_dedup_removes_planted_duplicates(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    # plant duplicates: re-add 5 docs under new ids
    dupes = docs.limit(5).withColumn("doc_id", F.col("doc_id") + 1_000_000)
    with_dupes = docs.unionByName(dupes)
    deduped = exact_dedup(with_dupes, "text", "doc_id")
    assert deduped.count() == docs.count()
    # min-id wins: planted high ids must be gone
    assert deduped.where(F.col("doc_id") >= 1_000_000).count() == 0


def test_minhash_finds_planted_near_duplicate(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).limit(20)
    # near-dup: copy doc 0's text with one word appended
    near = docs.where(F.col("doc_id") == 0).select(
        (F.col("doc_id") + 500_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra")).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(near)
    pairs = minhash_near_duplicates(corpus, "text", "doc_id", jaccard_threshold=0.7)
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (0, 500_000) in found


def test_drop_near_duplicates(spark, sf_dir):
    from anomaly_detection_spark.pipeline.dedup import drop_near_duplicates
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text").limit(30)
    near = docs.where(F.col("doc_id") == 2).select(
        (F.col("doc_id") + 700_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
    )
    corpus = docs.unionByName(near)
    kept = drop_near_duplicates(corpus, "text", "doc_id", jaccard_threshold=0.7)
    ids = {r.doc_id for r in kept.collect()}
    assert 2 in ids          # smallest id survives
    assert 700_002 not in ids  # the planted near-dup is dropped


def test_brute_force_topk_self_is_rank1(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.where(F.col("vec_id") == 7).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = brute_force_topk(emb, q, k=3).orderBy("rank").collect()
    assert top[0].vec_id == 7 and top[0].rank == 1
    assert top[0].cosine == pytest.approx(1.0, abs=1e-6)
    assert all(t.cosine <= 1.0 + 1e-9 for t in top)


def test_ivf_topk_recall(spark, sf_dir):
    """IVF with generous nprobe must recover the exact top-1 (self)
    and most of the exact top-5."""
    from anomaly_detection_spark.pipeline.similarity import ivf_topk
    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.where(F.col("vec_id").isin(3, 11)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(emb, q, k=5)
    approx = ivf_topk(emb, q, k=5, n_clusters=8, nprobe=4)
    exact_ids = {(r.query_id, r.vec_id) for r in exact.collect()}
    approx_ids = {(r.query_id, r.vec_id) for r in approx.collect()}
    # self-match always recovered
    assert (3, 3) in approx_ids and (11, 11) in approx_ids
    # recall@5 ≥ 0.6 with half the cells probed
    assert len(exact_ids & approx_ids) >= 6


def test_embedding_near_duplicates_finds_planted(spark, sf_dir):
    from anomaly_detection_spark.pipeline.similarity import embedding_near_duplicates
    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    # plant a near-duplicate of vector 7 (tiny perturbation)
    v7 = emb.where(F.col("vec_id") == 7).first().embedding
    perturbed = [float(x) * 1.001 for x in v7]
    near = spark.createDataFrame(
        [(900_000, perturbed)], "vec_id long, embedding array<float>"
    )
    corpus = emb.unionByName(near)
    pairs = embedding_near_duplicates(corpus, cosine_threshold=0.99)
    found = {(r.id_a, r.id_b): r.cosine for r in pairs.collect()}
    assert (7, 900_000) in found
    assert found[(7, 900_000)] > 0.999


def test_multimodal_plumbing(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).limit(10)
    with_payload = attach_binary_payload(docs, "text")
    row = with_payload.select("payload", "media_meta").first()
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.media_meta.codec == "raw"
    feats = extract_features(with_payload, fake=True).collect()
    assert len(feats) == 10
    assert all(len(r.features) == 8 for r in feats)
    assert all(0.0 <= x <= 1.0 for r in feats for x in r.features)
    # deterministic: same blob → same features
    f0 = decode_stub(bytes(row.payload), fake=True)
    f0_again = decode_stub(bytes(row.payload), fake=True)
    assert np.allclose(f0, f0_again)


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_stub(b"abc", fake=False)


def test_stl_spark_matches_local_pandas(spark, sf_dir):
    """The applyInPandas plumbing must produce exactly what the same
    detector code produces on locally-grouped pandas frames."""
    ev = load_table(spark, "events", sf_dir)
    got = {
        r.user_id: r
        for r in stl_iqr_detect(ev, ["user_id"], "ts", "value").collect()
    }
    pdf = ev.select("user_id", "ts", "value").toPandas()
    for uid, grp in pdf.groupby("user_id"):
        grp = grp.sort_values("ts")
        vals = grp["value"].to_numpy(dtype=np.float64)
        season, trend, remainder = decompose(vals, period=7)
        is_anom, l1, l2 = iqr_anomalize(remainder)
        r = got[uid]
        assert r.value == pytest.approx(vals[-1])
        assert r.anomaly == ("Yes" if is_anom[-1] else "No"), uid
        assert r.seven_day_avg == pytest.approx(vals[-7:].mean())
        gap = (grp["ts"].iloc[-1] - grp["ts"].iloc[-2]).total_seconds() / 86400.0
        assert r.frequency == pytest.approx(gap)


def test_approx_percentile_bounded_error(spark, sf_dir):
    """approx_percentile's guarantee is on RANK, not value: the
    returned element's empirical quantile must sit within the sketch
    error (1/accuracy) plus one element of slack for tiny groups.
    (The registered query now reports in-band BOOLEANS for the oracle;
    this test recomputes the raw sketch values and checks ranks.)"""
    ev = load_table(spark, "events", sf_dir)
    approx = {
        r.event_type: (r.p50, r.p95)
        for r in ev.groupBy("event_type").agg(
            F.approx_percentile("value", F.lit(0.5), F.lit(10_000)).alias("p50"),
            F.approx_percentile("value", F.lit(0.95), F.lit(10_000)).alias("p95"),
        ).collect()
    }
    groups = {
        et: sorted(v for (v,) in
                   ev.where(F.col("event_type") == et).select("value").collect())
        for et in approx
    }
    for et, (a50, a95) in approx.items():
        vals = groups[et]
        n = len(vals)
        for q, a in ((0.5, a50), (0.95, a95)):
            assert a in vals, (et, q, a)  # sketch returns a real element
            rank = sum(v <= a for v in vals) / n
            assert abs(rank - q) <= 1e-4 + 1.5 / n, (et, q, a, rank, n)

    from anomaly_detection_spark import queries as reg
    bands = reg.QUERIES["approx_percentiles_events"](spark, sf_dir).collect()
    assert all(r.p50_in_band and r.p95_in_band and r.p99_in_band for r in bands)


def test_embedding_near_duplicates_recall_multiseed(spark, sf_dir):
    """Recall >= 0.9 on 500 genuinely-perturbed planted pairs (random
    direction noise, not a pure scaling) with the multi-seed union."""
    import duckdb
    import numpy as np

    from anomaly_detection_spark.pipeline.similarity import embedding_near_duplicates

    base = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    rng = np.random.default_rng(7)
    rows = []
    for vec_id, emb in base:
        v = np.asarray(emb, dtype=np.float64)
        noise = rng.standard_normal(v.shape)
        noise -= noise @ v / (v @ v) * v          # orthogonal component only
        noise *= 0.02 * np.linalg.norm(v) / np.linalg.norm(noise)
        rows.append((int(vec_id), [float(x) for x in v]))
        rows.append((int(vec_id) + 500_000, [float(x) for x in v + noise]))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = embedding_near_duplicates(corpus, cosine_threshold=0.995)
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    planted = {(int(v), int(v) + 500_000) for v, _ in base}
    recall = len(found & planted) / len(planted)
    assert recall >= 0.9, f"recall {recall}"


def test_ivf_topk_large_query_table_no_collect(spark, sf_dir):
    """ivf_topk must handle a multi-thousand-row query *table* (no
    driver-side collect of the query set) and always recover the
    self-match.  The no-collect property is pinned by the PLAN assert
    below (no LocalTableScan); the row volume only proves completion —
    trimmed 10k -> 2.5k in r11 (this one test cost 70 s of the
    37-minute suite that truncated VERIFY_r10)."""
    from anomaly_detection_spark.pipeline.similarity import ivf_index, ivf_topk

    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    # 500 vectors x 5 replicas = 2,500 query rows
    q = emb.select(
        F.explode(F.sequence(F.lit(0), F.lit(4))).alias("rep"),
        F.col("vec_id"), F.col("embedding"),
    ).select(
        (F.col("vec_id") * 1000 + F.col("rep")).alias("query_id"), "embedding"
    )
    assert q.count() == 2_500
    indexed, cents = ivf_index(emb, n_clusters=8)
    top = ivf_topk(emb, q, k=1, n_clusters=8, nprobe=2,
                   indexed=indexed, centroids=cents)
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" not in plan  # probes derive from the query DF
    hits = top.where(
        (F.col("rank") == 1) & (F.col("vec_id") == (F.col("query_id") / 1000).cast("long"))
    ).count()
    assert hits == 2_500  # own cell is always among the probed cells


def test_redact_pii_masks_planted(spark):
    from anomaly_detection_spark.pipeline.redact import pii_counts, redact_pii
    df = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@sub.example.org today"),
            (2, "call +1-555-123-4567 or ping 192.168.0.1"),
            (3, "nothing sensitive here"),
        ],
        "id long, text string",
    )
    out = {r.id: r for r in redact_pii(pii_counts(df)).collect()}
    assert (out[1].n_email, out[1].n_phone, out[1].n_ipv4) == (1, 0, 0)
    assert (out[2].n_email, out[2].n_phone, out[2].n_ipv4) == (0, 1, 1)
    assert (out[3].n_email, out[3].n_phone, out[3].n_ipv4) == (0, 0, 0)
    assert out[1].redacted == "mail me at <EMAIL> today"
    assert out[2].redacted == "call <PHONE> or ping <IP>"
    assert out[3].redacted == "nothing sensitive here"


def test_tfidf_rare_term_beats_ubiquitous(spark):
    from anomaly_detection_spark.pipeline.text import tf_idf_top_terms
    df = spark.createDataFrame(
        [(1, "common rareword"), (2, "common other"), (3, "common thing")],
        "doc_id long, text string",
    )
    top = tf_idf_top_terms(df, k=1)
    row = {r.doc_id: r.term for r in top.collect()}
    # 'common' appears in every doc (idf floor); 'rareword' only in doc 1
    assert row[1] == "rareword"


def test_assign_nearest_centroid_self(spark, sf_dir):
    from anomaly_detection_spark.pipeline.similarity import assign_nearest_centroid
    emb = load_table(spark, "embeddings", sf_dir)
    centroids = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assigned = assign_nearest_centroid(emb, centroids)
    self_rows = assigned.where(F.col("vec_id") < 8).collect()
    assert len(self_rows) == 8
    for r in self_rows:
        assert r.cluster_id == r.vec_id, "centroid must be its own nearest"
        assert r.cosine == 1.0


def test_cluster_balanced_sample_cap_and_determinism(spark, sf_dir):
    from anomaly_detection_spark.pipeline.similarity import (
        assign_nearest_centroid, cluster_balanced_sample,
    )
    emb = load_table(spark, "embeddings", sf_dir)
    centroids = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assigned = assign_nearest_centroid(emb, centroids).select("vec_id", "cluster_id")
    s1 = cluster_balanced_sample(assigned, per_cluster=5)
    per = {r.cluster_id: r["count"] for r in
           s1.groupBy("cluster_id").count().collect()}
    assert all(v <= 5 for v in per.values())
    # partitioning-independent: same ids after an adversarial repartition
    s2 = cluster_balanced_sample(assigned.repartition(13), per_cluster=5)
    assert sorted(r.vec_id for r in s1.collect()) == sorted(
        r.vec_id for r in s2.collect()
    )


def test_boilerplate_ngrams_counts(spark):
    from anomaly_detection_spark.pipeline.text import boilerplate_ngrams
    # 'a b c' appears in docs 1,2,3 (twice in doc 3); 'x y z' only in doc 4
    df = spark.createDataFrame(
        [
            (1, "a b c d"),
            (2, "z a b c"),
            (3, "a b c a b c"),
            (4, "x y z w"),
        ],
        "doc_id long, text string",
    )
    out = {r.gram: (r.n_docs, r.n_occurrences)
           for r in boilerplate_ngrams(df, n=3, min_docs=3).collect()}
    assert out == {"a b c": (3, 4)}


def test_quality_classifier_orders_sanely(spark):
    from anomaly_detection_spark.pipeline.text import quality_classifier
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and looked out of a window today"),
            (2, "spam spam spam spam spam spam spam spam spam spam"),
            (3, "$$$ ### !!! @@@ %%% ^^^ &&& *** ((( )))"),
        ],
        "doc_id long, text string",
    )
    s = {r.doc_id: r.quality_score for r in quality_classifier(df).collect()}
    assert s[1] > s[2], "natural prose must beat pure repetition"
    assert s[1] > s[3], "natural prose must beat symbol noise"
    assert all(0.0 <= v <= 1.0 for v in s.values())


def test_incremental_dedup_drops_planted_only(spark, sf_dir):
    """Append-mode dedup: batch rows exactly or nearly matching the
    reference are dropped; genuinely new rows survive."""
    from anomaly_detection_spark.pipeline.dedup import dedup_against_reference
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    ref = docs.where(F.col("doc_id") < 400)
    exact_copy = ref.where(F.col("doc_id") == 3).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"), "text"
    )
    near_copy = ref.where(F.col("doc_id") == 5).select(
        (F.col("doc_id") + 3_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
    )
    new_docs = docs.where(F.col("doc_id") >= 450)
    batch = new_docs.unionByName(exact_copy).unionByName(near_copy)
    kept = {r.doc_id for r in dedup_against_reference(batch, ref).collect()}
    assert 2_000_003 not in kept, "exact copy of a reference doc must drop"
    assert 3_000_005 not in kept, "near copy of a reference doc must drop"
    surviving_new = {r.doc_id for r in new_docs.collect()} & kept
    assert len(surviving_new) >= 1, "genuinely new docs must survive"


def test_lsh_multiprobe_improves_recall(spark, sf_dir):
    """Multi-probe (Hamming-1 buckets) must recover at least as many
    true top-1 neighbors as single-probe, and most of them absolutely."""
    from anomaly_detection_spark.pipeline.similarity import lsh_ann_topk
    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    base = emb.where(F.col("vec_id") < 30).collect()
    rng = np.random.default_rng(7)
    noisy = [
        (int(r.vec_id),
         [float(x) + float(e) for x, e in
          zip(r.embedding, rng.normal(0, 0.02, len(r.embedding)))])
        for r in base
    ]
    queries = spark.createDataFrame(
        noisy, "query_id long, embedding array<float>"
    )

    def recall_at_1(n_probes):
        top = lsh_ann_topk(
            emb, queries, k=1, n_planes=8, n_probes=n_probes
        ).collect()
        return sum(1 for r in top if r.vec_id == r.query_id and r.rank == 1)

    single, multi = recall_at_1(1), recall_at_1(9)
    assert multi >= single
    assert multi >= 24, (single, multi)  # >=80% of 30 planted neighbors
    assert multi - single >= 3, (single, multi)  # probes add real recall


def test_trend_and_psi_sanity(spark, sf_dir):
    """Planted ramp -> positive slope; identical periods -> PSI ~ 0."""
    import datetime as dt
    from anomaly_detection_spark import queries as reg
    rows = [
        (9_000_001, dt.datetime(2024, 1, 1) + dt.timedelta(days=d), 10.0 + 5.0 * d)
        for d in range(20)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz, value double")
    from anomaly_detection_spark.operators.temporal import epoch_seconds
    xq = F.round((epoch_seconds("ts") - F.lit(1704067200.0)) / 86400.0 * 1000, 0).cast("long")
    yq = F.round(F.col("value") * 10000, 0).cast("long")
    s = df.select("user_id", xq.alias("xq"), yq.alias("yq")).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xq").alias("sx"), F.sum("yq").alias("sy"),
        F.sum(F.col("xq") * F.col("yq")).alias("sxy"),
        F.sum(F.col("xq") * F.col("xq")).alias("sxx"),
    ).collect()[0]
    slope = 0.1 * (s.n * s.sxy - s.sx * s.sy) / (s.n * s.sxx - s.sx * s.sx)
    assert abs(slope - 5.0) < 1e-3, slope

    psi = {r.event_type: r.psi
           for r in reg.QUERIES["psi_drift_events"](spark, sf_dir).collect()}
    # the fixture drifts mid-month (seasonal synthetic values), so PSI
    # is decisively non-zero — and must be finite, non-negative, and
    # reproducible
    assert all(0.0 <= v < 5.0 for v in psi.values()), psi
    assert any(v > 0.1 for v in psi.values()), psi
    again = {r.event_type: r.psi
             for r in reg.QUERIES["psi_drift_events"](spark, sf_dir).collect()}
    assert again == psi


def test_ewma_and_twa_sanity(spark):
    """EWMA of a constant series is the constant; after an upward step
    the EWMA sits between the old and new levels, closer to new as more
    post-step points arrive.  TWA weights long-lived values more."""
    import datetime as dt
    from anomaly_detection_spark import queries as reg
    # constant series via the registered query machinery is overkill;
    # exercise the same expressions on a local frame
    from anomaly_detection_spark.queries import _EWMA_W
    assert abs(sum(_EWMA_W) * 0.3 - (1 - 0.7 ** 28)) < 1e-12  # geometric sum

    rows = []
    base = dt.datetime(2024, 1, 1)
    for i in range(10):
        rows.append((1, base + dt.timedelta(hours=i), 100.0, i))       # constant
        rows.append((2, base + dt.timedelta(hours=i),
                     100.0 if i < 5 else 200.0, 100 + i))              # step
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, value double, event_id long"
    )
    df.createOrReplaceTempView("_ewma_toy")
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    from anomaly_detection_spark.queries import _EWMA_SPAN
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-(_EWMA_SPAN - 1), 0))
    weights = F.array(*[F.lit(x) for x in _EWMA_W])
    lst = F.collect_list(F.round("value", 4)).over(w)
    with_l = df.select("user_id", "event_id", lst.alias("l"))
    m = F.size("l")
    idx = F.sequence(F.lit(1), m)
    num_q = F.aggregate(idx, F.lit(0).cast("long"),
        lambda acc, i: acc + F.round(F.element_at("l", i.cast("int"))
            * F.element_at(weights, (m - i + 1).cast("int")) * 1_000_000, 0
        ).cast("long"))
    den_q = F.aggregate(idx, F.lit(0).cast("long"),
        lambda acc, i: acc + F.round(
            F.element_at(weights, (m - i + 1).cast("int")) * 1_000_000, 0
        ).cast("long"))
    out = with_l.select("user_id", "event_id",
                        F.round(num_q.cast("double") / den_q, 4).alias("ewma"))
    got = {(r.user_id, r.event_id): r.ewma for r in out.collect()}
    assert all(abs(got[(1, i)] - 100.0) < 1e-9 for i in range(10))
    assert 100.0 < got[(2, 105)] < got[(2, 109)] < 200.0


def test_ewma_matches_pandas_ewm(spark):
    """For series no longer than the trailing span, the registered EWMA
    equals pandas ewm(alpha, adjust=True) — an independent
    implementation of the same finite-window normalized weights."""
    import datetime as dt
    from anomaly_detection_spark.queries import _EWMA_ALPHA, _EWMA_SPAN, _EWMA_W
    rng_vals = [103.2, 99.7, 120.4, 88.1, 95.0, 101.3, 140.9, 77.7,
                100.0, 115.5, 92.3, 108.8]
    assert len(rng_vals) <= _EWMA_SPAN
    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(5, base + dt.timedelta(hours=i), float(v), i)
         for i, v in enumerate(rng_vals)],
        "user_id long, ts timestamp_ntz, value double, event_id long",
    )
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-(_EWMA_SPAN - 1), 0))
    weights = F.array(*[F.lit(x) for x in _EWMA_W])
    lst = F.collect_list(F.round("value", 4)).over(w)
    with_l = df.select("event_id", lst.alias("l"))
    m = F.size("l")
    idx = F.sequence(F.lit(1), m)
    num_q = F.aggregate(idx, F.lit(0).cast("long"),
        lambda acc, i: acc + F.round(F.element_at("l", i.cast("int"))
            * F.element_at(weights, (m - i + 1).cast("int")) * 1_000_000, 0
        ).cast("long"))
    den_q = F.aggregate(idx, F.lit(0).cast("long"),
        lambda acc, i: acc + F.round(
            F.element_at(weights, (m - i + 1).cast("int")) * 1_000_000, 0
        ).cast("long"))
    got = {r.event_id: r.ewma for r in with_l.select(
        "event_id", F.round(num_q.cast("double") / den_q, 4).alias("ewma")
    ).collect()}
    exp = pd.Series(rng_vals).ewm(alpha=_EWMA_ALPHA, adjust=True).mean()
    for i in range(len(rng_vals)):
        assert abs(got[i] - round(float(exp.iloc[i]), 4)) <= 1e-3, (i, got[i], exp.iloc[i])


def test_lsh_multitable_improves_recall(spark, sf_dir):
    """L independent hash tables: recall is monotone in L (candidate
    superset re-ranked exactly), and near-duplicate queries (tight
    angles) are nearly all recovered with 4 tables even single-probe."""
    from anomaly_detection_spark.pipeline.similarity import lsh_ann_topk
    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    base = emb.where(F.col("vec_id") < 30).collect()
    rng = np.random.default_rng(11)
    noisy = [
        (int(r.vec_id),
         [float(x) + float(e) for x, e in
          zip(r.embedding, rng.normal(0, 0.05, len(r.embedding)))])
        for r in base
    ]
    queries = spark.createDataFrame(
        noisy, "query_id long, embedding array<float>"
    )

    def recall_at_1(n_tables):
        top = lsh_ann_topk(
            emb, queries, k=1, n_planes=8, n_tables=n_tables
        ).collect()
        return sum(1 for r in top if r.vec_id == r.query_id and r.rank == 1)

    one, four = recall_at_1(1), recall_at_1(4)
    assert four >= one
    assert four >= 24, (one, four)  # >=80% of 30 planted neighbors


def test_resize_images_plumbing(spark, sf_dir):
    """Real nearest-neighbor math over stub-decoded rasters: exact
    dims, deterministic pixel digest, identity resize == decode, and
    a shuffle-free plan."""
    from anomaly_detection_spark.pipeline.multimodal import (
        decode_image_stub, resize_images, resize_nearest,
    )
    docs = load_table(spark, "documents", sf_dir).limit(8)
    wp = attach_binary_payload(docs, "text")
    out = resize_images(wp, out_w=4, out_h=6, fake=True).collect()
    assert len(out) == 8
    assert all(r.width == 4 and r.height == 6 for r in out)
    assert all(len(r.resized) == 4 * 6 * 3 for r in out)
    # digest matches a local recompute of the same decode+resize
    row = wp.select("doc_id", "payload").first()
    import hashlib
    local = resize_nearest(
        decode_image_stub(bytes(row.payload), fake=True), 4, 6
    )
    got = {r.doc_id: r.pixel_digest for r in out}[row.doc_id]
    assert got == hashlib.sha256(local.tobytes()).hexdigest()
    # identity resize reproduces the decoded raster exactly
    img = decode_image_stub(b"xyz", fake=True)
    assert (resize_nearest(img, 16, 16) == img).all()
    # plan over the un-limited table (limit itself inserts an Exchange)
    full = attach_binary_payload(
        load_table(spark, "documents", sf_dir), "text"
    )
    plan = resize_images(full, 4, 6)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_sample_frames_schedule_and_flatmap(spark, sf_dir):
    """Uniform schedule: short payloads emit fewer frames; long ones
    exactly k; ts = idx * frame_ms; 1-row → n-rows without a shuffle."""
    from anomaly_detection_spark.pipeline.multimodal import sample_frames
    rows = [(1, "x" * 39), (2, "x" * 40), (3, "x" * 200), (4, "x" * 4000)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    wp = attach_binary_payload(docs, "text")
    out = sample_frames(wp, k=4, frame_ms=40, fake=True).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # 39 bytes → 1 frame; 40 → 1 frame (40//40); 200 → 5 frames sample 4
    assert len(by_doc[1]) == 1 and by_doc[1][0].frame_idx == 0
    assert len(by_doc[2]) == 1
    assert len(by_doc[3]) == 4
    assert [r.frame_idx for r in sorted(by_doc[3], key=lambda r: r.frame_idx)] \
        == [0, 1, 2, 4]  # j*(5-1)//3 = 0,1,2,4
    assert all(r.ts_ms == r.frame_idx * 40 for r in out)
    assert all(len(r.features) == 8 for r in out)
    plan = sample_frames(wp, k=4)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_textrank_matches_python_reference(spark):
    from anomaly_detection_spark.pipeline.text import textrank_terms

    # star: "huba" co-occurs with everything; spokes only with huba
    docs = spark.createDataFrame(
        [("huba spoke1",), ("huba spoke2",), ("huba spoke3",),
         ("huba spoke4",)],
        "text string",
    )
    got = {r.term: r.score for r in textrank_terms(docs, n_iter=8).collect()}

    # same integer recursion in plain python
    edges = {("huba", f"spoke{i}") for i in range(1, 5)}
    und = edges | {(b, a) for a, b in edges}
    nodes = sorted({n for e in und for n in e})
    deg = {n: sum(1 for a, _ in und if a == n) for n in nodes}
    scale = 10**12
    n = len(nodes)
    pr = {v: scale // n for v in nodes}
    base = (3 * scale) // (20 * n)
    for _ in range(8):
        contrib = {v: 0 for v in nodes}
        for a, b in und:
            contrib[b] += pr[a] // deg[a]
        pr = {v: base + (17 * contrib[v]) // 20 for v in nodes}
    assert got == pr
    assert max(got, key=got.get) == "huba"


def test_containment_planted_subset(spark, sf_dir):
    from anomaly_detection_spark import queries as reg

    # the registered query at sf0.001 must find the planted containment
    # relationships deterministically and orient them small-into-large
    rows = reg.QUERIES["containment_rare_gram"](spark, sf_dir).collect()
    for r in rows:
        assert 0.8 <= r.containment <= 1.0
        assert r.n_common <= r.n_contained_grams
    # a fully-contained pair exists in the fixture corpus (exact dups)
    assert any(r.containment == 1.0 for r in rows)


def test_simhash_hamming_banding_complete(spark, sf_dir):
    """Pigeonhole completeness: the banded candidate join must find
    EVERY pair within the radius — differential vs brute-force all
    pairs over the collected fingerprints."""
    from itertools import combinations

    from anomaly_detection_spark.pipeline.dedup import (
        simhash_hamming_pairs, simhash_portable,
    )

    docs = load_table(spark, "documents", sf_dir).where(F.col("doc_id") < 300)
    fps = {
        r.doc_id: r.sh
        for r in docs.select(
            "doc_id", simhash_portable("text", 16).alias("sh")
        ).collect()
    }
    expect = {
        (a, b, bin(fps[a] ^ fps[b]).count("1"))
        for a, b in combinations(sorted(fps), 2)
        if bin(fps[a] ^ fps[b]).count("1") <= 3
    }
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_hamming_pairs(docs, radius=3).collect()
    }
    assert got == expect and expect


def test_bpe_train_matches_python_reference(spark, sf_dir):
    from collections import Counter

    from anomaly_detection_spark.pipeline.text import bpe_train

    docs = load_table(spark, "documents", sf_dir).where(F.col("doc_id") < 200)
    got = [
        (r.rank, r.left, r.right, r.merged, r.pair_count)
        for r in bpe_train(docs, n_merges=8).orderBy("rank").collect()
    ]

    # reference BPE (Sennrich) in plain python on the same corpus
    words = Counter()
    for (text,) in docs.select("text").collect():
        for w in text.strip().split():
            if w:
                words[w] += 1
    vocab = {w: list(w) for w in words}
    expect = []
    for rank in range(1, 9):
        pc = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += words[w]
        if not pc:
            break
        # max count, ties to lexicographically smallest pair
        (l, r), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        expect.append((rank, l, r, l + r, n))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if out and out[-1] == l and syms[i] == r:
                    out[-1] = l + r
                else:
                    out.append(syms[i])
                i += 1
            vocab[w] = out
    assert got == expect and len(got) == 8


def test_bpe_train_local_matches_distributed(spark, sf_dir):
    """The collected-word-table fast path (one Spark job total) must
    produce the identical merge table as the job-per-merge distributed
    path — same argmax, same tie-break, same greedy application."""
    from anomaly_detection_spark.pipeline.text import bpe_train

    docs = load_table(spark, "documents", sf_dir).where(F.col("doc_id") < 250)

    def table(strategy):
        return [
            tuple(r)
            for r in bpe_train(docs, n_merges=12, strategy=strategy)
            .orderBy("rank")
            .collect()
        ]

    local, dist = table("local"), table("distributed")
    assert local == dist and len(local) == 12


def test_bpe_segment_roundtrip_and_compression(spark, sf_dir):
    from anomaly_detection_spark.pipeline.text import bpe_segment, bpe_train

    docs = load_table(spark, "documents", sf_dir).where(F.col("doc_id") < 150)
    merges = bpe_train(docs, n_merges=10)
    seg = bpe_segment(docs, merges).collect()
    texts = {r.doc_id: r.text for r in docs.collect()}
    assert len(seg) == len(texts)
    for r in seg:
        chars = "".join(texts[r.doc_id].strip().split())
        # lossless: concatenated tokens reproduce the word characters
        assert "".join(r.tokens) == chars
        # merges only ever shrink the token stream
        assert r.n_tokens_bpe <= len(chars)
    # the trained merges actually compress on the training corpus
    assert sum(r.n_tokens_bpe for r in seg) < sum(
        len("".join(t.strip().split())) for t in texts.values()
    )
