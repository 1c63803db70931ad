"""Experimentation-analytics pins: hand-computed z and CUPED algebra."""

from __future__ import annotations

import datetime
import math

from pyspark.sql import functions as F


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _arms_of(spark, user_ids):
    from debezium_server_bigquery_spark.plans.experiments import _arm

    return {
        r.user_id: r.arm
        for r in spark.createDataFrame([(u,) for u in user_ids], "user_id long")
        .select("user_id", _arm(F.col("user_id")).alias("arm"))
        .collect()
    }


def test_ab_test_z_matches_closed_form(spark, tmp_path):
    from debezium_server_bigquery_spark.plans.experiments import (
        ab_test_proportion_z,
    )

    users = list(range(1, 41))
    arms = _arms_of(spark, users)
    t0 = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    # every user gets a view; arm A users convert iff user_id % 2 == 0,
    # arm B users convert iff user_id % 4 == 0 (different rates)
    for u in users:
        rows.append((eid, t0, u, "view", 1.0, "{}")); eid += 1
        conv = (u % 2 == 0) if arms[u] == "A" else (u % 4 == 0)
        if conv:
            rows.append((eid, t0, u, "purchase", 1.0, "{}")); eid += 1
    sf = _write_events(spark, tmp_path, rows)
    out = ab_test_proportion_z(spark, sf).collect()[0]
    n_a = sum(1 for u in users if arms[u] == "A")
    n_b = len(users) - n_a
    c_a = sum(1 for u in users if arms[u] == "A" and u % 2 == 0)
    c_b = sum(1 for u in users if arms[u] == "B" and u % 4 == 0)
    assert (out.n_a, out.n_b, out.conv_a, out.conv_b) == (n_a, n_b, c_a, c_b)
    pool = (c_a + c_b) / (n_a + n_b)
    se = math.sqrt(pool * (1 - pool) * (1 / n_a + 1 / n_b))
    z = round((c_a / n_a - c_b / n_b) / se, 6)
    assert abs(out.z - z) < 1e-9


def test_cuped_removes_preperiod_confound(spark, tmp_path):
    """Post spend = pre spend exactly (pure confound, zero treatment
    effect): theta = 1, CUPED lift = 0 even though raw lift is not, and
    the adjusted variance collapses to ~0."""
    from debezium_server_bigquery_spark.plans.experiments import (
        SPLIT_DATE,
        cuped_adjusted_lift,
    )

    users = list(range(1, 31))
    pre_day = datetime.datetime(2024, 1, 5)
    post_day = datetime.datetime(2024, 1, 25)
    assert pre_day < datetime.datetime.fromisoformat(SPLIT_DATE) < post_day
    rows, eid = [], 0
    for u in users:
        spend = float(u)  # varies by user -> nonzero var(x)
        rows.append((eid, pre_day, u, "view", spend, "{}")); eid += 1
        rows.append((eid, post_day, u, "view", spend, "{}")); eid += 1
    sf = _write_events(spark, tmp_path, rows)
    out = cuped_adjusted_lift(spark, sf).collect()[0]
    assert out.theta == 1.0
    assert out.lift_cuped == 0.0
    assert out.var_ratio == 0.0
    # raw lift reflects whatever imbalance the hash assignment produced
    arms = _arms_of(spark, users)
    mean = lambda a: (  # noqa: E731
        sum(u for u in users if arms[u] == a)
        / max(sum(1 for u in users if arms[u] == a), 1)
    )
    assert abs(out.lift_unadjusted - round(mean("A") - mean("B"), 6)) < 1e-6


def test_did_cancels_shared_trend(spark, tmp_path):
    """Both arms shift up by +10 post (shared trend), arm A gets +5 on
    top: DiD isolates the +5."""
    from debezium_server_bigquery_spark.plans.experiments import (
        did_revenue_readout,
    )

    users = list(range(1, 21))
    arms = _arms_of(spark, users)
    pre = datetime.datetime(2024, 1, 5)
    post = datetime.datetime(2024, 1, 25)
    rows, eid = [], 0
    for u in users:
        base = float(u % 5)
        rows.append((eid, pre, u, "view", base, "{}")); eid += 1
        treat = 5.0 if arms[u] == "A" else 0.0
        rows.append((eid, post, u, "view", base + 10.0 + treat, "{}")); eid += 1
    sf = _write_events(spark, tmp_path, rows)
    out = did_revenue_readout(spark, sf).collect()[0]
    assert abs(out.change_a - 15.0) < 1e-9
    assert abs(out.change_b - 10.0) < 1e-9
    assert abs(out.did - 5.0) < 1e-9


def test_mde_closed_form(spark, tmp_path):
    import math

    from debezium_server_bigquery_spark.plans.experiments import (
        Z_ALPHA,
        Z_BETA,
        ab_power_mde,
    )

    users = list(range(1, 13))
    arms = _arms_of(spark, users)
    t0 = datetime.datetime(2024, 1, 1)
    rows = [(i, t0, u, "view", float(u), "{}") for i, u in enumerate(users)]
    sf = _write_events(spark, tmp_path, rows)
    out = ab_power_mde(spark, sf).collect()[0]
    n = len(users)
    mean = sum(users) / n
    var = sum(u * u for u in users) / n - mean * mean
    n_a = sum(1 for u in users if arms[u] == "A")
    n_b = n - n_a
    mde = (Z_ALPHA + Z_BETA) * math.sqrt(var) * math.sqrt(1 / n_a + 1 / n_b)
    assert (out.n_a, out.n_b) == (n_a, n_b)
    assert abs(out.mde_abs - round(mde, 6)) < 1e-6
    assert abs(out.mde_rel - round(mde / mean, 6)) < 1e-6


def test_stratified_ate_within_stratum_effect(spark, tmp_path):
    """Within each activity stratum treated users spend exactly +3 more;
    the per-stratum effects must all read 3 even though activity level
    confounds the pooled comparison."""
    from debezium_server_bigquery_spark.plans.experiments import (
        stratified_ate_click_effect,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows, eid, uid = [], 0, 0
    # two activity levels: 2 events/user vs 10 events/user
    for n_ev, base_spend in ((2, 4.0), (10, 20.0)):
        for k in range(8):
            uid += 1
            treated = k % 2 == 0
            spend_total = base_spend + (3.0 if treated else 0.0)
            per_event = spend_total / n_ev
            for j in range(n_ev):
                etype = "click" if (treated and j == 0) else "view"
                rows.append((eid, t0, uid, etype, per_event, "{}"))
                eid += 1
    sf = _write_events(spark, tmp_path, rows)
    out = stratified_ate_click_effect(spark, sf).collect()
    effects = [r.stratum_effect for r in out if r.stratum_effect is not None]
    assert effects and all(abs(e - 3.0) < 1e-6 for e in effects)


def test_srm_check_balanced_hash(spark, tmp_path):
    from debezium_server_bigquery_spark.plans.experiments import ab_srm_check

    t0 = datetime.datetime(2024, 1, 1)
    rows = [(u, t0, u, "view", 1.0, "{}") for u in range(1, 401)]
    sf = _write_events(spark, tmp_path, rows)
    out = ab_srm_check(spark, sf).collect()[0]
    assert out.n_a + out.n_b == 400
    # a content-independent hash split of 400 users should not SRM-flag
    assert not out.srm_flag
