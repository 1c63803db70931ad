"""Semantics pins for the round-9 batch-7 operators on constructed
fixtures: token-blocked record linkage, the blocking-cost histogram,
daily-volume autocorrelation, and Pareto revenue cutpoints."""

from __future__ import annotations

import datetime

from debezium_server_bigquery_spark.functions.linkage import (
    entity_blocking_stats,
    entity_match_part_names,
)
from debezium_server_bigquery_spark.functions.timeseries import (
    events_autocorrelation,
)
from debezium_server_bigquery_spark.plans.segmentation import (
    customer_revenue_pareto,
)


def _write_parts(spark, tmp_path, names):
    rows = [(i, n) for i, n in enumerate(names)]
    spark.createDataFrame(rows, "p_partkey long, p_name string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "part.parquet"))
    return str(tmp_path)


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_entity_match_blocks_and_verifies(spark, tmp_path):
    sf = _write_parts(
        spark,
        tmp_path,
        [
            "red widget",
            "red widget",  # duplicate part rows collapse to one name
            "red widgett",  # typo twin: shares "red", lev 1 -> match
            "blue bolt",  # shares no token with the reds -> never a candidate
            "red extraordinarily",  # shares "red" but lev > MAX_LEV -> cut
        ],
    )
    out = entity_match_part_names(spark, sf).collect()
    pairs = {(r.name_a, r.name_b): r for r in out}
    assert ("red widget", "red widgett") in pairs
    m = pairs[("red widget", "red widgett")]
    assert m.lev == 1
    assert m.parts_a == 2 and m.parts_b == 1
    assert abs(m.sim - (1 - 1 / 11)) < 1e-6
    # the typo twins both share a block with "red extraordinarily", but the
    # verifier rejects it; "blue bolt" never even becomes a candidate
    assert all("blue bolt" not in p and "extraordinarily" not in p
               for p in pairs)


def test_blocking_stats_histogram_exact(spark, tmp_path):
    # tokens: x in 3 names, y in 2, five singletons -> sizes {1:5, 2:1, 3:1}
    sf = _write_parts(
        spark, tmp_path, ["a x", "b x", "c x", "d y", "e y"]
    )
    out = {r.block_size: r for r in entity_blocking_stats(spark, sf).collect()}
    assert out[1].n_blocks == 5 and out[1].candidate_pairs == 0
    assert out[2].n_blocks == 1 and out[2].candidate_pairs == 1
    assert out[3].n_blocks == 1 and out[3].candidate_pairs == 3
    assert -1 not in out  # nothing over the df cap in this fixture


def test_autocorrelation_alternating_series(spark, tmp_path):
    # daily counts alternate 10, 20, 10, 20, ... -> ACF(1) = -1, ACF(2) = +1
    base = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    for d in range(12):
        for i in range(10 if d % 2 == 0 else 20):
            rows.append(
                (eid, base + datetime.timedelta(days=d, minutes=i), 1,
                 "click", 1.0, "{}")
            )
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    out = {r.lag_d: r for r in events_autocorrelation(spark, sf).collect()}
    assert out[1].acf == -1.0 and out[1].n_pairs == 11
    assert out[2].acf == 1.0 and out[2].n_pairs == 10
    # a constant-count comparison appears nowhere here, but zero variance
    # must yield NULL, not an error: 12 days is even, so lag 11 leaves a
    # single pair -> var 0 -> NULL
    assert out[7].acf is not None


def test_autocorrelation_constant_series_is_null(spark, tmp_path):
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (d * 5 + i, base + datetime.timedelta(days=d, minutes=i), 1,
         "click", 1.0, "{}")
        for d in range(9)
        for i in range(5)
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = {r.lag_d: r for r in events_autocorrelation(spark, sf).collect()}
    assert all(out[k].acf is None for k in out)


def test_pareto_cutpoints_known_ladder(spark, tmp_path):
    rows = [
        (1, 101, 40.0),
        (2, 102, 30.0),
        (3, 103, 20.0),
        (4, 104, 10.0),
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = {
        r.pct_target: r
        for r in customer_revenue_pareto(spark, str(tmp_path)).collect()
    }
    assert out[50].customers_needed == 2 and out[50].revenue_share == 0.7
    assert out[80].customers_needed == 3 and out[80].revenue_share == 0.9
    assert out[90].customers_needed == 3 and out[90].revenue_share == 0.9
    assert out[50].customer_fraction == 0.5
    assert out[80].customer_fraction == 0.75


def test_triangle_census_known_graph(spark, tmp_path):
    from debezium_server_bigquery_spark.functions.graph import (
        supplier_triangle_census,
    )

    # order 1 links suppliers {1,2,3} (a triangle); order 2 links {3,4}.
    # degrees: 1:2, 2:2, 3:3, 4:1 -> wedges = 1+1+3+0 = 5; triangles = 1
    rows = [(1, 1), (1, 2), (1, 3), (2, 3), (2, 4)]
    spark.createDataFrame(
        rows, "l_orderkey long, l_suppkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    r = supplier_triangle_census(spark, str(tmp_path)).collect()[0]
    assert r.n_nodes == 4 and r.n_edges == 4
    assert r.n_wedges == 5 and r.n_triangles == 1
    assert r.global_clustering == 0.6


def test_triangle_census_complete_k4(spark, tmp_path):
    """K4 stresses the edge-centric intersection path: several triangles
    close over the SAME oriented edge (|N+(u) ∩ N+(v)| > 1 rows exist on
    denser graphs) and every degree ties, so orientation falls through to
    the id tiebreak.  K4: C(4,3)=4 triangles, 4*C(3,2)=12 wedges,
    clustering 3*4/12 = 1."""
    from debezium_server_bigquery_spark.functions.graph import (
        supplier_triangle_census,
    )

    rows = [(1, s) for s in (1, 2, 3, 4)]
    spark.createDataFrame(
        rows, "l_orderkey long, l_suppkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    r = supplier_triangle_census(spark, str(tmp_path)).collect()[0]
    assert r.n_nodes == 4 and r.n_edges == 6
    assert r.n_wedges == 12 and r.n_triangles == 4
    assert r.global_clustering == 1.0


def test_triangle_census_sparse_spread_ids(spark, tmp_path):
    """Pins the SPARSE branch (array_intersect): spread-out node ids fail
    the census's dense gate ((max_id+1)^2 > 8m), so this exercises the
    non-bitset path.  Triangle on {1,2,3} plus a chain 50-51-...-61:
    n=15, m=14, wedges = 3 (triangle) + 10 (chain interiors) = 13,
    triangles = 1, clustering = 3/13."""
    from debezium_server_bigquery_spark.functions.graph import (
        supplier_triangle_census,
    )

    rows = [(1, 1), (1, 2), (1, 3)] + [
        (10 + i, s) for i in range(12 - 1) for s in (50 + i, 51 + i)
    ]
    spark.createDataFrame(
        rows, "l_orderkey long, l_suppkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    r = supplier_triangle_census(spark, str(tmp_path)).collect()[0]
    assert (62 * 62) > 8 * 14  # the fixture really is out-of-gate
    assert r.n_nodes == 15 and r.n_edges == 14
    assert r.n_wedges == 13 and r.n_triangles == 1
    assert r.global_clustering == round(3.0 / 13, 6)


def test_source_vocab_overlap_hand_jaccard(spark, tmp_path):
    from debezium_server_bigquery_spark.functions.mixing import (
        source_vocab_overlap,
    )

    rows = [
        (0, "a b c", "en", "srcA", 5),
        (1, "b c d", "en", "srcB", 5),
        (2, "x y", "en", "srcC", 3),
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        (r.source_a, r.source_b): r
        for r in source_vocab_overlap(spark, str(tmp_path)).collect()
    }
    m = out[("srcA", "srcB")]
    assert m.common == 2 and m.vocab_a == 3 and m.vocab_b == 3
    assert m.jaccard == 0.5
    # disjoint vocabularies never appear (no shared word -> no candidate)
    assert ("srcA", "srcC") not in out and ("srcB", "srcC") not in out


def test_seasonal_strength_pure_weekly_rhythm(spark, tmp_path):
    from debezium_server_bigquery_spark.functions.timeseries import (
        events_seasonal_strength,
    )

    base = datetime.datetime(2024, 1, 1)  # a Monday
    rows, eid = [], 0
    # "pure" stream: count depends ONLY on weekday (10 + 3*dow), no trend,
    # 28 consecutive days -> strength == 1.  "flat" stream: constant 5/day
    # -> zero detrended variance everywhere -> strength NULL.
    for d in range(28):
        dow = d % 7
        for i in range(10 + 3 * dow):
            rows.append(
                (eid, base + datetime.timedelta(days=d, minutes=i), 1,
                 "pure", 1.0, "{}")
            )
            eid += 1
        for i in range(5):
            rows.append(
                (eid, base + datetime.timedelta(days=d, hours=10, minutes=i),
                 2, "flat", 1.0, "{}")
            )
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    out = {
        r.event_type: r for r in events_seasonal_strength(spark, sf).collect()
    }
    # 28 days - 3 edge rows each side = 22 analyzable days per type
    assert out["pure"].n_days == 22
    assert out["pure"].seasonal_strength == 1.0
    assert out["flat"].seasonal_strength is None


def test_seasonal_strength_gap_breaks_window(spark, tmp_path):
    from debezium_server_bigquery_spark.functions.timeseries import (
        events_seasonal_strength,
    )

    base = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    # 14 days with day 6 missing: every 7-row window spanning the gap
    # covers >6 calendar days and must be excluded from the analysis
    for d in list(range(6)) + list(range(7, 14)):
        for i in range(10 + (d % 7)):
            rows.append(
                (eid, base + datetime.timedelta(days=d, minutes=i), 1,
                 "click", 1.0, "{}")
            )
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    out = events_seasonal_strength(spark, sf).collect()
    # only days 10 (windows 7..13) qualify: exactly 1 consecutive run of
    # 7 within 7..13 -> its center day 10 alone
    assert out[0].n_days == 1


def test_label_contradiction_on_constructed_vectors(spark, tmp_path):
    from debezium_server_bigquery_spark.functions.similarity import (
        label_contradiction_matrix,
    )

    # two identical vectors with DIFFERENT labels (a guaranteed
    # contradiction: identical vectors share every LSH band bucket and
    # cosine 1.0), plus an orthogonal singleton
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0], 0),
        (2, [1.0, 0.0, 0.0, 0.0], 1),
        (3, [0.0, 1.0, 0.0, 0.0], 2),
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label long"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = label_contradiction_matrix(spark, str(tmp_path)).collect()
    got = {(r.label_lo, r.label_hi): r for r in out}
    assert (0, 1) in got
    assert got[(0, 1)].n_pairs == 1 and got[(0, 1)].max_cosine == 1.0


def test_l_diversity_flags_single_type_class(spark, tmp_path):
    from debezium_server_bigquery_spark.plans.diagnostics import (
        l_diversity_report,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = []
    # day 0, bucket 0: five users but ONE event type -> k-anonymous yet
    # l-diversity fails (n_sensitive = 1)
    for u in range(5):
        rows.append((u, base, u, "click", 10.0, "{}"))
    # day 1, bucket 0: three types across users -> passes (>= 3)
    for u, t in enumerate(["click", "view", "purchase"]):
        rows.append((10 + u, base + datetime.timedelta(days=1), u, t, 10.0, "{}"))
    sf = _write_events(spark, tmp_path, rows)
    out = {(r.epoch_day, r.value_bucket): r
           for r in l_diversity_report(spark, sf).collect()}
    day0 = (base - datetime.datetime(1970, 1, 1)).days
    assert (day0, 0) in out
    r = out[(day0, 0)]
    assert r.n_sensitive == 1 and r.n_users == 5
    assert (day0 + 1, 0) not in out


def test_t_closeness_skewed_class_distance(spark, tmp_path):
    from debezium_server_bigquery_spark.plans.diagnostics import (
        t_closeness_report,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = []
    # corpus: 10 click + 10 view; day 0 class = all 10 clicks (skewed),
    # day 1 class = the balanced 10/10 remainder? -> build: day0 has
    # 10 click; day1 has 10 view.  Global P = (0.5, 0.5); each one-type
    # class has tv = 0.5 exactly -> NOT > 0.5 (boundary).  Make day0
    # 15 click vs day1 5 click+10 view: global P(click)=25/30? keep it
    # simple: day0 = 9 click + 1 view, day1 = 1 click + 9 view.
    # Global = (0.5, 0.5); each class tv = |0.9-0.5| = 0.4 -> passes.
    # day2 = 10 purchase: global becomes click 1/3, view 1/3, purch 1/3;
    # recompute by hand below instead with the actual fixture:
    #   day0: 9 click, 1 view; day1: 1 click, 9 view; day2: 10 purchase
    #   global: click 10/30, view 10/30, purchase 10/30
    #   tv(day2) = 1/2 (|1 - 1/3| + 1/3 + 1/3) = 2/3 > 0.5 -> flagged
    #   tv(day0) = 1/2 (|0.9-1/3| + |0.1-1/3| + 1/3) = 0.566667 -> flagged
    for i in range(9):
        rows.append((i, base, i, "click", 10.0, "{}"))
    rows.append((9, base, 9, "view", 10.0, "{}"))
    rows.append((10, base + datetime.timedelta(days=1), 0, "click", 10.0, "{}"))
    for i in range(9):
        rows.append((11 + i, base + datetime.timedelta(days=1), i, "view",
                     10.0, "{}"))
    for i in range(10):
        rows.append((20 + i, base + datetime.timedelta(days=2), i, "purchase",
                     10.0, "{}"))
    sf = _write_events(spark, tmp_path, rows)
    day0 = (base - datetime.datetime(1970, 1, 1)).days
    out = {(r.epoch_day, r.value_bucket): r
           for r in t_closeness_report(spark, sf).collect()}
    assert out[(day0 + 2, 0)].tv_distance == round(2 / 3, 6)
    assert out[(day0, 0)].tv_distance == 0.566667
    assert out[(day0 + 1, 0)].tv_distance == 0.566667


def test_assortativity_star_is_negative(spark, tmp_path):
    from debezium_server_bigquery_spark.functions.graph import (
        graph_degree_assortativity,
    )

    # star graph: hub 1 connected to leaves 2..5 -> perfectly
    # disassortative? For a pure star r is undefined-to-negative; use a
    # known value instead: a star K_{1,4} has every edge (deg 4, deg 1):
    # x always 4 pairs with 1 and vice versa -> correlation = -1
    rows = [(o, s) for o, s in [(1, 1), (1, 2), (2, 1), (2, 3),
                                (3, 1), (3, 4), (4, 1), (4, 5)]]
    spark.createDataFrame(
        rows, "l_orderkey long, l_suppkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    r = graph_degree_assortativity(spark, str(tmp_path)).collect()[0]
    assert r.n_nodes == 5 and r.n_edges == 4
    assert r.assortativity == -1.0


def test_crosscorrelation_shifted_series(spark, tmp_path):
    from debezium_server_bigquery_spark.functions.timeseries import (
        events_crosscorrelation,
    )

    base = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    # "view" alternates 10/20; "purchase" is the SAME series shifted
    # 2 days later -> xcorr(view -> purchase, lag 2) == 1,
    # lag 1 == -1 (anti-phase), lag 0 == -1 on the overlap
    for d in range(14):
        for i in range(10 if d % 2 == 0 else 20):
            rows.append((eid, base + datetime.timedelta(days=d, minutes=i),
                         1, "view", 1.0, "{}"))
            eid += 1
        for i in range(10 if (d - 2) % 2 == 0 else 20):
            rows.append((eid, base + datetime.timedelta(days=d, hours=6,
                                                        minutes=i),
                         2, "purchase", 1.0, "{}"))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    out = {(r.type_a, r.type_b, r.lag_d): r
           for r in events_crosscorrelation(spark, sf).collect()}
    assert out[("view", "purchase", 2)].xcorr == 1.0
    assert out[("view", "purchase", 1)].xcorr == -1.0
    # lag 0 emitted once per unordered pair: (purchase, view) only
    assert ("view", "purchase", 0) not in out
    assert out[("purchase", "view", 0)].xcorr == 1.0


def test_benford_digits_and_shares(spark, tmp_path):
    from debezium_server_bigquery_spark.plans.diagnostics import (
        orders_benford_check,
    )

    # amounts chosen so first digits of cents are 1,1,2,9 (0.05 -> "5")
    rows = [
        (1, 1, 1.00),    # 100 -> digit 1
        (2, 2, 19.99),   # 1999 -> digit 1
        (3, 3, 2.50),    # 250 -> digit 2
        (4, 4, 0.99),    # 99 -> digit 9
        (5, 5, 0.05),    # 5 -> digit 5
        (6, 6, 0.00),    # 0 cents -> excluded
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = {r.digit: r for r in orders_benford_check(spark, str(tmp_path)).collect()}
    assert out[1].n_obs == 2 and out[1].obs_share == 0.4
    assert out[2].n_obs == 1 and out[5].n_obs == 1 and out[9].n_obs == 1
    assert out[1].exp_share == 0.30103
    assert out[9].abs_dev == round(abs(0.2 - 0.045757), 6)
    assert 0 not in out and len(out) == 4


def test_heaps_beta_saturated_vs_open_vocab(spark, tmp_path):
    from debezium_server_bigquery_spark.functions.curation import heaps_law_fit

    def write(texts, sub):
        d = tmp_path / sub
        d.mkdir()
        rows = [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)]
        spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
        return str(d)

    # saturated vocabulary: every doc reuses the same two words -> the
    # cumulative vocab is constant -> beta == 0
    sat = write(["alpha beta"] * 10, "sat")
    r = heaps_law_fit(spark, sat).collect()[0]
    assert r.n_points == 10 and r.heaps_beta == 0.0
    # open vocabulary: every doc brings two NEW words -> V(n) = n exactly
    # -> beta == 1, log K == 0
    opn = write([f"w{i}a w{i}b" for i in range(10)], "opn")
    r = heaps_law_fit(spark, opn).collect()[0]
    assert r.n_points == 10
    assert r.heaps_beta == 1.0 and r.heaps_logk == 0.0


def test_funnel_latency_known_delays(spark, tmp_path):
    from debezium_server_bigquery_spark.plans.diagnostics import (
        funnel_latency_quantiles,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = []
    # three users, view -> purchase delays of 10, 20, 30 seconds; one
    # purchase with NO prior view (excluded); an older view superseded
    # by a fresher one (latency measures the LAST prior view)
    for u, delay in [(1, 10), (2, 20), (3, 30)]:
        rows.append((u * 10, base, u, "view", 1.0, "{}"))
        rows.append((u * 10 + 1,
                     base + datetime.timedelta(seconds=delay), u,
                     "purchase", 1.0, "{}"))
    rows.append((90, base, 9, "purchase", 1.0, "{}"))  # no prior view
    rows.append((50, base - datetime.timedelta(seconds=100), 1, "view",
                 1.0, "{}"))  # stale view, superseded for user 1
    sf = _write_events(spark, tmp_path, rows)
    out = {r.quantile: r.lat_s
           for r in funnel_latency_quantiles(spark, sf).collect()}
    # 3 latencies {10,20,30}: p50 -> rank ceil(.5*3)=2 -> 20;
    # p90/p99 -> rank 3 -> 30
    assert out[0.5] == 20 and out[0.9] == 30 and out[0.99] == 30


def test_fk_fanout_power_buckets(spark, tmp_path):
    from debezium_server_bigquery_spark.plans.diagnostics import (
        fk_fanout_profile,
    )

    base = datetime.datetime(2024, 1, 1)
    # user 1: 1 event (bucket 1); user 2: 3 events (bucket 2);
    # user 3: 5 events (bucket 4)
    rows, eid = [], 0
    for u, n in [(1, 1), (2, 3), (3, 5)]:
        for i in range(n):
            rows.append((eid, base + datetime.timedelta(minutes=i), u,
                         "click", 1.0, "{}"))
            eid += 1
    _write_events(spark, tmp_path, rows)
    # minimal orders/lineitem so the other two relationships exist
    spark.createDataFrame(
        [(1, 101, 5.0), (2, 101, 5.0)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(1, 7)], "l_orderkey long, l_suppkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = {(r.relationship, r.bucket_lo): r
           for r in fk_fanout_profile(spark, str(tmp_path)).collect()}
    assert out[("user->events", 1)].n_parents == 1
    assert out[("user->events", 2)].n_parents == 1
    assert out[("user->events", 4)].n_parents == 1
    assert out[("user->events", 4)].max_fanout == 5
    assert out[("customer->orders", 2)].n_parents == 1
    assert out[("order->lineitems", 1)].n_parents == 1


def test_markov_entropy_deterministic_vs_uniform(spark, tmp_path):
    from debezium_server_bigquery_spark.plans.segmentation import (
        event_markov_entropy,
    )

    base = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    # user 1: strict A -> B -> A -> B ... (deterministic: H(next|A)=0)
    for i in range(10):
        rows.append((eid, base + datetime.timedelta(minutes=i), 1,
                     "A" if i % 2 == 0 else "B", 1.0, "{}"))
        eid += 1
    # user 2: C followed equally often by D and E (types disjoint from
    # user 1's, so nothing leaks into A/B's distributions)
    # -> H(next|C) = 1 bit
    for i in range(8):
        rows.append((eid, base + datetime.timedelta(hours=1, minutes=2 * i),
                     2, "C", 1.0, "{}"))
        eid += 1
        rows.append((eid,
                     base + datetime.timedelta(hours=1, minutes=2 * i + 1),
                     2, "D" if i % 2 == 0 else "E", 1.0, "{}"))
        eid += 1
    sf = _write_events(spark, tmp_path, rows)
    out = {r.event_type: r for r in event_markov_entropy(spark, sf).collect()}
    assert out["A"].entropy_bits == 0.0 and out["A"].predictability_gap == 0.0
    assert out["C"].entropy_bits == 1.0 and out["C"].predictability_gap == 1.0


def test_elasticity_perfect_and_zero_variance(spark, tmp_path):
    from debezium_server_bigquery_spark.functions.regression import (
        discount_quantity_elasticity,
    )

    spark.createDataFrame(
        [(1, "Brand#A"), (2, "Brand#B")], "p_partkey long, p_brand string"
    ).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
    # Brand#A: qty = disc exactly -> r = 1; Brand#B: constant disc -> NULL
    li = [
        (1, 1.0, 0.01), (1, 2.0, 0.02), (1, 3.0, 0.03),
        (2, 1.0, 0.05), (2, 9.0, 0.05),
    ]
    spark.createDataFrame(
        li, "l_partkey long, l_quantity double, l_discount double"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = {r.p_brand: r
           for r in discount_quantity_elasticity(spark, str(tmp_path)).collect()}
    assert out["Brand#A"].corr_disc_qty == 1.0
    assert out["Brand#B"].corr_disc_qty is None


def test_reciprocal_best_match_breaks_chains(spark, tmp_path):
    from debezium_server_bigquery_spark.functions.linkage import (
        entity_reciprocal_best_match,
    )

    # "aa bb" <-> "aa bc" are mutual bests (lev 1 both ways).
    # "aa bd" chains to "aa bb"/"aa bc" (lev 1) but THEIR best is each
    # other... all three are lev-1 apart pairwise; the struct tiebreak
    # (lev, name) makes best("aa bb")="aa bc", best("aa bc")="aa bb",
    # best("aa bd")="aa bb" -> one-sided, dropped by mutuality.
    rows = [(f"aa {s}",) for s in ("bb", "bc", "bd")]
    spark.createDataFrame(rows, "p_name string").selectExpr(
        "p_name", "1 as p_partkey"
    ).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
    out = [
        (r.name_a, r.name_b, r.lev)
        for r in entity_reciprocal_best_match(spark, str(tmp_path)).collect()
    ]
    assert out == [("aa bb", "aa bc", 1)]
