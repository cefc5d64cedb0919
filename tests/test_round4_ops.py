"""Planted-edge-case tests for the round-4 operators (hierarchical
rollup, spatial grid radius join, leakage-safe split, sequential
patterns, unicode cleaning)."""

from __future__ import annotations

import datetime as dt
import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from anomaly_detection_spark import queries as reg

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


def _m(minutes):
    return BASE + dt.timedelta(minutes=minutes)


def _mini_dir(spark, events_rows=None, extra_tables=None):
    d = tempfile.mkdtemp()
    if events_rows is not None:
        ev = spark.createDataFrame(
            events_rows,
            "user_id long, event_id long, ts timestamp_ntz, "
            "event_type string, value double",
        ).withColumn("props", F.lit("{}"))
        pq.write_table(
            pa.Table.from_pandas(ev.toPandas()),
            os.path.join(d, "events.parquet"),
        )
    for name, (rows, schema) in (extra_tables or {}).items():
        t = spark.createDataFrame(rows, schema)
        pq.write_table(
            pa.Table.from_pandas(t.toPandas()),
            os.path.join(d, f"{name}.parquet"),
        )
    return d


def test_hierarchical_rollup_bucket_counts(spark):
    # two events same minute, one next minute (same hour), one next day
    rows = [
        (1, 1, _m(0), "view", 1.0),
        (1, 2, _m(0), "view", 2.0),
        (1, 3, _m(1), "view", 3.0),
        (1, 4, _m(60 * 24), "view", 4.0),
    ]
    d = _mini_dir(spark, rows)
    out = {str(r.day): r for r in
           reg.QUERIES["hierarchical_rollup_events"](spark, d).collect()}
    d1 = out["2024-01-01"]
    assert (d1.n_events, d1.n_minutes, d1.n_hours) == (3, 2, 1)
    assert d1.sum_value == 6.0
    d2 = out["2024-01-02"]
    assert (d2.n_events, d2.n_minutes, d2.n_hours) == (1, 1, 1)


def test_spatial_neighbors_grid_boundary(spark):
    # points straddling a 0.02 cell boundary: (0.019, 0) and (0.021, 0)
    # sit in different cells but are 0.002 apart -> the neighbor-cell
    # probe must find them; (0.5, 0.5) is isolated and emits nothing
    emb = [
        (1, [0.019, 0.0] + [0.0] * 62, 0),
        (2, [0.021, 0.0] + [0.0] * 62, 0),
        (3, [0.5, 0.5] + [0.0] * 62, 0),
        (4, [0.021, 0.0199] + [0.0] * 62, 0),  # ~0.0199 from 2
    ]
    extra = {"embeddings": (emb, "vec_id long, embedding array<float>, label int")}
    d = _mini_dir(spark, extra_tables=extra)
    out = {r.vec_id: r for r in
           reg.QUERIES["spatial_neighbor_counts"](spark, d).collect()}
    assert 3 not in out
    assert out[1].n_neighbors == 1 and out[1].nearest_id == 2
    assert out[2].n_neighbors == 2 and out[2].nearest_id == 1
    assert out[4].nearest_id == 2


def test_leakage_safe_split_family_cohesion(spark):
    # docs 1/2 normalize identically (case + punctuation differences):
    # they must land in the SAME split, and n_straddle must be 0
    docs = [
        (1, "Hello, World!"),
        (2, "hello world"),
        (3, "something entirely different"),
    ]
    extra = {"documents": (docs, "doc_id long, text string")}
    d = _mini_dir(spark, extra_tables=extra)
    rows = reg.QUERIES["leakage_safe_split"](spark, d).collect()
    assert all(r.n_straddle == 0 for r in rows)
    assert sum(r.n_docs for r in rows) == 3
    assert sum(r.n_families for r in rows) == 2  # 1+2 share a family


def test_sequential_patterns_order_and_session_scope(spark):
    # user 1: view -> purchase twice (2 sessions); purchase never
    # precedes view anywhere; sessions 31 min apart are separate
    rows = [
        (1, 1, _m(0), "view", 1.0),
        (1, 2, _m(1), "purchase", 1.0),
        (1, 3, _m(40), "view", 1.0),       # new session (39 min gap > 30)
        (1, 4, _m(41), "purchase", 1.0),
        (2, 5, _m(0), "view", 1.0),         # session w/o purchase
    ]
    d = _mini_dir(spark, rows)
    out = {(r.a_type, r.b_type): r for r in
           reg.QUERIES["sequential_patterns_events"](spark, d).collect()}
    assert ("purchase", "view") not in out       # order respected
    vp = out[("view", "purchase")]
    assert vp.support == 2                       # both sessions of user 1
    assert vp.share_ppm == 2 * 1000000 // 3      # of 3 total sessions


def test_unicode_clean_real_nfc_composition(spark):
    # e + COMBINING ACUTE (2 codepoints) must compose to é (1 codepoint);
    # control chars collapse into single spaces
    decomposed = "e\u0301cole"  # 6 codepoints, combining acute
    composed = "\u00e9cole"
    docs = [
        (1, decomposed),
        (2, "tab\x09and\x01ctrl   runs"),
        (3, "already clean"),
    ]
    extra = {"documents": (docs, "doc_id long, text string")}
    d = _mini_dir(spark, extra_tables=extra)
    out = {r.doc_id: r for r in
           reg.QUERIES["unicode_clean_docs"](spark, d).collect()}
    assert out[1].clean_text == composed
    assert out[1].changed and out[1].n_chars_clean == 5
    assert out[2].clean_text == "tab and ctrl runs"
    assert not out[3].changed


def test_jaro_winkler_matches_duckdb_exactly():
    # the kernel claims DuckDB-exact semantics: pin with a fuzz sweep
    # (exact float64 equality, not approx) including the edge rules —
    # empty inputs, the 0.7 boost gate, integer transposition halving
    import random

    import duckdb

    from anomaly_detection_spark.queries import _jaro_winkler_py

    con = duckdb.connect()
    random.seed(7)
    pairs = [("", ""), ("", "a"), ("a", "a"), ("ab", "ba"),
             ("MARTHA", "MARHTA"), ("DWAYNE", "DUANE")]
    for _ in range(800):
        pairs.append((
            "".join(random.choices("abcdefgh -XY", k=random.randint(0, 14))),
            "".join(random.choices("abcdefgh -XY", k=random.randint(0, 14))),
        ))
    for a, b in pairs:
        want = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert _jaro_winkler_py(a, b) == want, (a, b)


def test_kaplan_meier_known_curve(spark):
    # 4 signups at t=0; converts on day 0, day 1, day 2; one censored
    # (no purchase).  S(0)=3/4? no: d0=1,n0=4 -> 0.75; d1=1,n1=3 ->
    # 0.5; d2=1,n2=2 -> 0.25; censored user leaves at eval day
    rows = [
        (u, u, _m(0), "signup", 1.0) for u in (1, 2, 3, 4)
    ] + [
        (1, 11, _m(0), "purchase", 1.0),            # day 0
        (2, 12, _m(60 * 24), "purchase", 1.0),      # day 1
        (3, 13, _m(60 * 48), "purchase", 1.0),      # day 2
    ]
    d = _mini_dir(spark, rows)
    out = {r.day: r for r in
           reg.QUERIES["kaplan_meier_conversion"](spark, d).collect()}
    assert (out[0].n_at_risk, out[0].n_converted) == (4, 1)
    assert out[0].km_survival == 0.75
    assert out[1].km_survival == 0.5
    assert out[2].km_survival == 0.25
    # censored user appears in no row but held the risk set at 4/3/2


def test_kaplan_meier_terminal_zero(spark):
    # everyone converts -> the last factor is 0 and S must be exactly 0
    rows = [
        (1, 1, _m(0), "signup", 1.0),
        (1, 2, _m(10), "purchase", 1.0),
    ]
    d = _mini_dir(spark, rows)
    out = reg.QUERIES["kaplan_meier_conversion"](spark, d).collect()
    assert len(out) == 1 and out[0].km_survival == 0.0


def test_cms_join_size_estimate_bounds(spark, sf_dir):
    row = reg.QUERIES["join_size_estimate_cms"](spark, sf_dir).collect()[0]
    assert row.never_underestimates
    assert row.within_bound
    assert row.est_join_size >= row.exact_join_size >= 0


def test_dtw_single_user_is_zero(spark):
    # one user -> the reference series IS the user's series -> DTW 0
    rows = [(1, i + 1, _m(i * 60 * 24), "view", float(i + 1))
            for i in range(4)]
    d = _mini_dir(spark, rows)
    out = reg.QUERIES["dtw_distance_users"](spark, d).collect()
    assert len(out) == 1
    assert out[0].n_user_days == 4 and out[0].dtw_cents == 0


def test_dtw_known_alignment(spark):
    # user 1 daily cents [100, 300, 400] on days 0-2; user 2 constant
    # [100, 100, 100] -> ref = [100, 200, 250]; expected DTW computed
    # by an independent recursive implementation
    rows = [
        (1, 1, _m(0), "view", 1.0),
        (1, 2, _m(60 * 24), "view", 3.0),
        (1, 3, _m(60 * 48), "view", 4.0),
        (2, 4, _m(0), "view", 1.0),
        (2, 5, _m(60 * 24), "view", 1.0),
        (2, 6, _m(60 * 48), "view", 1.0),
    ]
    d = _mini_dir(spark, rows)

    from functools import lru_cache

    def expect(a, b):
        @lru_cache(None)
        def f(i, j):
            c = abs(a[i] - b[j])
            if i == 0 and j == 0:
                return c
            cands = []
            if i > 0:
                cands.append(f(i - 1, j))
            if j > 0:
                cands.append(f(i, j - 1))
            if i > 0 and j > 0:
                cands.append(f(i - 1, j - 1))
            return c + min(cands)
        return f(len(a) - 1, len(b) - 1)

    ref = [100, 200, 250]
    out = {r.user_id: r.dtw_cents for r in
           reg.QUERIES["dtw_distance_users"](spark, d).collect()}
    assert out[1] == expect((100, 300, 400), tuple(ref))
    assert out[2] == expect((100, 100, 100), tuple(ref))


def test_hits_hub_ordering_and_normalization(spark):
    # user 1 emits 2 event types heavily; user 2 one type once ->
    # user 1's hub score dominates; fixed-point scores are positive
    rows = [(1, i, _m(i), ["view", "click"][i % 2], 1.0) for i in range(8)]
    rows.append((2, 100, _m(0), "view", 1.0))
    d = _mini_dir(spark, rows)
    out = {r.user_id: r for r in
           reg.QUERIES["hits_user_type_engagement"](spark, d).collect()}
    assert out[1].hub_fp > out[2].hub_fp > 0
    assert out[1].hub_rank == 1 and out[2].hub_rank == 2
    # normalization: total hub mass within truncation slack of 1e12
    total = out[1].hub_fp + out[2].hub_fp
    assert 1_000_000_000_000 - 2 <= total <= 1_000_000_000_000


def test_sax_monotone_and_constant_series(spark):
    # user 1: strictly increasing 16-day series -> non-decreasing SAX
    # word from 'a' to 'd'; user 2: constant -> all 'b' (sigma = 0)
    rows = [(1, i + 1, _m(i * 60 * 24), "view", float(i + 1))
            for i in range(16)]
    rows += [(2, 100 + i, _m(i * 60 * 24), "view", 5.0) for i in range(16)]
    d = _mini_dir(spark, rows)
    out = {r.user_id: r for r in
           reg.QUERIES["sax_symbols_users"](spark, d).collect()}
    w1 = out[1].sax_word
    assert len(w1) == 8 and list(w1) == sorted(w1)
    assert w1[0] == "a" and w1[-1] == "d"
    assert out[2].sax_word == "b" * 8
    assert out[1].n_days == 16


def test_borda_consensus_dominant_doc(spark):
    # doc 1 dominates every criterion -> consensus rank 1 with the
    # minimum possible rank_sum of 3
    docs = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta"),
        (3, "tiny"),
    ]
    extra = {"documents": (docs, "doc_id long, text string")}
    d = _mini_dir(spark, extra_tables=extra)
    out = {r.doc_id: r for r in
           reg.QUERIES["borda_consensus_docs"](spark, d).collect()}
    assert out[1].consensus_rank == 1 and out[1].rank_sum == 3
    assert out[3].consensus_rank == 3


def test_viterbi_flat_series_stays_base(spark):
    # constant 1-event days at the base level -> cost 0, base state
    rows = [(1, i + 1, _m(i * 60 * 24), "view", 1.0) for i in range(10)]
    d = _mini_dir(spark, rows)
    out = reg.QUERIES["viterbi_burst_users"](spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_days == 10 and r.best_cost == 0 and r.end_state == 0


def test_viterbi_burst_tail_switches_state(spark):
    # base level T = total div (users*days): 2 users, 10 days,
    # user 1: 1/day for 8 days then 40/day for 2 days; user 2: 1/day.
    eid = [0]
    rows = []
    def add(u, day, k):
        for _ in range(k):
            eid[0] += 1
            rows.append((u, eid[0], _m(day * 60 * 24), "view", 1.0))
    for day in range(8):
        add(1, day, 1)
    for day in (8, 9):
        add(1, day, 40)
    for day in range(10):
        add(2, day, 1)
    d = _mini_dir(spark, rows)
    out = {r.user_id: r for r in
           reg.QUERIES["viterbi_burst_users"](spark, d).collect()}
    # T = 98 div 20 = 4 -> base 4, burst 16, lam 9: the 40-count tail
    # is closer to burst (|40-16|=24) than base (|40-4|=36) -> switches
    assert out[1].end_state == 1
    assert out[2].end_state == 0


def test_rrf_fuses_both_legs(spark, sf_dir):
    out = reg.QUERIES["rrf_hybrid_retrieval"](spark, sf_dir).collect()
    assert 0 < len(out) <= 20
    by_id = {r.doc_id: r for r in out}
    # vec_id 0 is its own nearest neighbor -> rvec rank 1 contributes
    # the max vector-leg mass; it must appear near the top
    assert 0 in by_id and by_id[0].rvec == 1
    for r in out:
        expect = 0
        if r.rlex is not None:
            expect += 1_000_000_000 // (60 + r.rlex)
        if r.rvec is not None:
            expect += 1_000_000_000 // (60 + r.rvec)
        assert r.rrf == expect
    # sorted by fused score
    scores = [r.rrf for r in out]
    assert scores == sorted(scores, reverse=True)


def test_bh_fdr_rejects_planted_block_only(spark, sf_dir):
    rows = reg.QUERIES["bh_fdr_user_anomalies"](spark, sf_dir).collect()
    assert rows, "planted signals must produce rejections"
    # the step-up property: rejected ranks are exactly 1..k*
    ks = sorted(r.p_rank for r in rows)
    assert ks == list(range(1, len(ks) + 1))
    # planted block dominates the rejections
    planted = [r for r in rows if r.user_id % 17 == 0]
    assert len(planted) >= len(rows) - 1


def test_mmr_diversity_beats_pure_relevance(spark, sf_dir):
    from anomaly_detection_spark.pipeline.similarity import brute_force_topk
    from anomaly_detection_spark.sources.tables import load_table

    picks = reg.QUERIES["mmr_select_embeddings"](spark, sf_dir).collect()
    assert [p.pick_order for p in sorted(picks, key=lambda r: r.pick_order)] \
        == list(range(1, 9))
    ids = [p.vec_id for p in picks]
    assert len(set(ids)) == 8          # no repeats
    assert picks[0].vec_id == 0        # the query is its own best match
    # MMR must NOT equal the pure top-8 by relevance (diversity active)
    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.where("vec_id = 0").selectExpr("vec_id AS query_id", "embedding")
    top8 = {r.vec_id for r in brute_force_topk(emb, q, k=8).collect()}
    assert set(ids) != top8


def test_wasserstein_known_shift(spark):
    # purchases at exactly 1.00, views at exactly 3.00 -> W1 = 2.00
    # (200 cents): mass 1 moved distance 200
    rows = [(1, i + 1, _m(i), "purchase", 1.0) for i in range(5)]
    rows += [(2, 100 + i, _m(i), "view", 3.0) for i in range(5)]
    d = _mini_dir(spark, rows)
    out = reg.QUERIES["wasserstein_value_drift"](spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n1, r.n2) == (5, 5)
    assert r.w1_cents_ppm == 200 * 1_000_000


def test_wasserstein_identical_is_zero(spark):
    rows = [(1, i + 1, _m(i), "purchase", 2.5) for i in range(4)]
    rows += [(2, 100 + i, _m(i), "view", 2.5) for i in range(4)]
    d = _mini_dir(spark, rows)
    out = reg.QUERIES["wasserstein_value_drift"](spark, d).collect()
    assert out[0].w1_cents_ppm == 0


def test_zipf_heaps_on_synthetic_power_law(spark):
    # build a corpus with a known-ish Zipf profile: token w_r appears
    # floor(1000/r) times (slope -1 in the rank-frequency log-log)
    words = []
    for r in range(1, 21):
        words += [f"w{r:02d}"] * (1000 // r)
    docs, chunk = [], 50
    for i in range(0, len(words), chunk):
        docs.append((i // chunk, " ".join(words[i:i + chunk])))
    extra = {"documents": (docs, "doc_id long, text string")}
    d = _mini_dir(spark, extra_tables=extra)
    row = reg.QUERIES["zipf_heaps_corpus"](spark, d).collect()[0]
    assert row.vocab_total == 20
    # slope near -1 (exactly -1e6 ppm only for a perfect law; floor()
    # and the 20-point fit leave slack)
    assert -1_200_000 < row.zipf_slope_ppm < -800_000
    # this sequential layout introduces vocabulary LATE (w01 fills the
    # first 20 chunks), so V(k) grows super-linearly: beta > 1 is the
    # correct fit here, bounded by the degenerate-layout ceiling
    assert 1_000_000 < row.heaps_beta_ppm < 2_000_000


def test_stratified_kfold_balance(spark, sf_dir):
    rows = reg.QUERIES["stratified_kfold_docs"](spark, sf_dir).collect()
    assert rows and all(r.balanced for r in rows)
    langs = {}
    for r in rows:
        langs.setdefault(r.lang, []).append(r.n_docs)
    for lang, counts in langs.items():
        assert max(counts) - min(counts) <= 1, lang


def test_evt_pot_known_two_point_tail(spark):
    # 95 values of 1.00 + excesses {1.00, 3.00} above u=1.00(=p95 disc)
    # wait: build 40 @1.00, tail: 2.00 and 4.00 -> u = percentile_disc
    # .95 over 42 values = 1.00? cum(1.00)=40, 20*40 >= 19*42 (798) yes
    # -> u=100 cents; excesses e = {100, 300}: n=2, S=400, S2=100000
    # xi = (2*100000 - 2*160000)/(2*(2*100000-160000)) = -120000/80000
    #    = -1.5 -> -1500000 ppm; sigma = 400*100000/80000 = 500 cents
    rows = [(1, i + 1, _m(i), "view", 1.0) for i in range(40)]
    rows += [(1, 100, _m(100), "view", 2.0), (1, 101, _m(101), "view", 4.0)]
    d = _mini_dir(spark, rows)
    r = reg.QUERIES["evt_pot_tail_fit"](spark, d).collect()[0]
    assert r.u_cents == 100 and r.n_exceed == 2
    assert r.xi_ppm == -1_500_000
    assert r.sigma_cents_ppm == 500 * 1_000_000


def test_evt_pot_degenerate_tail_yields_null(spark):
    # a single-valued tail has zero variance: estimators are undefined
    # and must surface as NULL, not a crash
    rows = [(1, i + 1, _m(i), "view", 1.0) for i in range(40)]
    rows += [(1, 100, _m(100), "view", 2.0), (1, 101, _m(101), "view", 2.0)]
    d = _mini_dir(spark, rows)
    r = reg.QUERIES["evt_pot_tail_fit"](spark, d).collect()[0]
    assert r.n_exceed == 2 and r.xi_ppm is None and r.sigma_cents_ppm is None


def test_simpsons_paradox_planted_reversal(spark):
    # slice A: positive value-vs-time trend; slice B: positive trend;
    # but B sits LATER with LOWER values -> pooled trend negative
    rows = []
    eid = 0
    for i in range(10):           # type A: early seconds, low->high 10..19
        eid += 1
        rows.append((1, eid, _m(i), "view", 10.0 + i))
    for i in range(10):           # type B: later seconds, low->high 1..10
        eid += 1
        rows.append((1, eid, _m(100 + i), "click", 1.0 + i))
    d = _mini_dir(spark, rows)
    out = {r.event_type: r for r in
           reg.QUERIES["simpsons_paradox_audit"](spark, d).collect()}
    assert out["view"].slice_sign == 1 and out["click"].slice_sign == 1
    assert out["view"].global_sign == -1
    assert out["view"].reversed and out["click"].reversed


def test_wilson_interval_properties(spark, sf_dir):
    rows = reg.QUERIES["wilson_ci_event_types"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.wilson_lo <= r.p_hat <= r.wilson_hi <= 1.0
        # Wilson never collapses to a point for 0 < k < n
        if 0 < r.k_above < r.n_events:
            assert r.wilson_lo < r.wilson_hi


def test_dickey_fuller_mean_reversion_vs_trend(spark):
    # user 1 oscillates hard around 15 with a wobble (strong mean
    # reversion -> very negative t; the wobble keeps SSR > 0 — a
    # PERFECT oscillation fits exactly, se = 0, and t is NULL by the
    # nullif convention); user 2 follows a clean upward drift (x is still
    # informative; just assert user 1 is far more negative)
    rows = []
    eid = 0
    for i in range(20):
        eid += 1
        base = 10.0 if i % 2 == 0 else 20.0
        rows.append((1, eid, _m(i * 60 * 24), "view",
                     base + (0.5 if i % 5 == 0 else 0.0)))
    for i in range(20):
        eid += 1
        rows.append((2, eid, _m(i * 60 * 24), "view",
                     10.0 + i + (0.2 if i % 3 == 0 else 0.0)))
    d = _mini_dir(spark, rows)
    out = {r.user_id: r for r in
           reg.QUERIES["dickey_fuller_users"](spark, d).collect()}
    assert out[1].n_pairs == 19
    assert out[1].df_tstat < -3.0             # oscillation = unit root rejected
    assert out[1].df_tstat < out[2].df_tstat  # far below the drifting user


def test_markov_stationary_two_state_chain(spark):
    # deterministic cycle view -> click -> view -> ...: stationary mass
    # splits 50/50 (up to fixed-point truncation)
    rows = [(1, i + 1, _m(i), ["view", "click"][i % 2], 1.0)
            for i in range(40)]
    d = _mini_dir(spark, rows)
    out = {r.event_type: r.pi_fp for r in
           reg.QUERIES["markov_stationary_types"](spark, d).collect()}
    assert set(out) == {"view", "click"}
    half = 500_000_000_000
    assert abs(out["view"] - half) <= 2
    assert abs(out["click"] - half) <= 2
    assert half * 2 - 4 <= out["view"] + out["click"] <= half * 2


def test_markov_entropy_deterministic_vs_mixed(spark):
    # user 1 cycles deterministically (entropy 0); user 2 alternates
    # between two successors of 'view' (entropy > 0)
    rows = [(1, i + 1, _m(i), ["view", "click"][i % 2], 1.0)
            for i in range(20)]
    seqs = ["view", "click", "view", "error"] * 5
    rows += [(2, 100 + i, _m(i), t, 1.0) for i, t in enumerate(seqs)]
    d = _mini_dir(spark, rows)
    out = {r.user_id: r for r in
           reg.QUERIES["markov_entropy_users"](spark, d).collect()}
    assert out[1].entropy_bits == 0.0
    # user 2: 'view' splits 50/50 between click and error -> those
    # transitions contribute 1 bit each; overall rate strictly positive
    assert out[2].entropy_bits > 0.4


def test_gtest_collocations_planted_bigram(spark):
    # "alpha beta" always adjacent; fillers are shuffled-ish singletons
    docs = [(i, f"alpha beta w{i} w{i + 1} w{i + 2}") for i in range(30)]
    extra = {"documents": (docs, "doc_id long, text string")}
    d = _mini_dir(spark, extra_tables=extra)
    rows = reg.QUERIES["gtest_collocations"](spark, d).collect()
    assert rows[0].w1 == "alpha" and rows[0].w2 == "beta"
    assert rows[0].n_pair == 30
    assert rows[0].g2_micro > 0


def test_hazard_rates_match_km_risk_sets(spark):
    # same planted cohort as the KM test: hazards 1/4, 1/3, 1/2 on days
    # 0..2; the censored user appears as n_censored on the eval day
    rows = [
        (u, u, _m(0), "signup", 1.0) for u in (1, 2, 3, 4)
    ] + [
        (1, 11, _m(0), "purchase", 1.0),
        (2, 12, _m(60 * 24), "purchase", 1.0),
        (3, 13, _m(60 * 48), "purchase", 1.0),
    ]
    d = _mini_dir(spark, rows)
    out = {r.day: r for r in
           reg.QUERIES["hazard_rate_conversion"](spark, d).collect()}
    assert (out[0].n_at_risk, out[0].hazard_ppm) == (4, 250000)
    assert (out[1].n_at_risk, out[1].hazard_ppm) == (3, 333333)
    assert (out[2].n_at_risk, out[2].hazard_ppm) == (2, 500000)
    censored_days = [r for r in out.values() if r.n_censored > 0]
    assert len(censored_days) == 1 and censored_days[0].n_at_risk == 1


def test_lorenz_curve_equal_vs_concentrated(spark):
    # 10 equal spenders -> perfectly diagonal curve (j*100000 ppm)
    rows = [(u, u, _m(0), "purchase", 5.0) for u in range(1, 11)]
    d = _mini_dir(spark, rows)
    out = {r.decile: r.cum_share_ppm for r in
           reg.QUERIES["lorenz_curve_users"](spark, d).collect()}
    assert out == {j: j * 100000 for j in range(1, 11)}
    # one whale -> bottom 90% holds a tiny share
    rows2 = [(u, u, _m(0), "purchase", 1.0) for u in range(1, 10)]
    rows2.append((10, 10, _m(0), "purchase", 991.0))
    d2 = _mini_dir(spark, rows2)
    out2 = {r.decile: r.cum_share_ppm for r in
            reg.QUERIES["lorenz_curve_users"](spark, d2).collect()}
    assert out2[9] == 9 * 1000  # 9 of 1000 dollars = 9000 ppm
    assert out2[10] == 1_000_000
