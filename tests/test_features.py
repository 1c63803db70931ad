"""Feature hashing — hand-checked bucket counts and invariants."""

from __future__ import annotations

from debezium_server_bigquery_spark.functions.features import (
    N_FEATURES,
    hashed_features,
)


def test_hashed_features_counts_total_tokens(spark, sf_dir):
    from pyspark.sql import functions as F

    from debezium_server_bigquery_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(40)
    out = hashed_features(docs).collect()
    assert len(out) == 40
    n_tokens = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id",
            F.size(
                F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
            ).alias("n"),
        ).collect()
    }
    for r in out:
        # feature counts are a partition of the token count
        assert sum(r[f"f{k}"] for k in range(N_FEATURES)) == n_tokens[r.doc_id]
        assert all(r[f"f{k}"] >= 0 for k in range(N_FEATURES))


def test_hashed_features_deterministic_buckets(spark):
    """The same token always lands in the same bucket — two docs of the
    same repeated word differ only by count scale."""
    docs = spark.createDataFrame(
        [(1, "zap zap zap"), (2, "zap")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in hashed_features(docs).collect()}
    vec1 = [rows[1][f"f{k}"] for k in range(N_FEATURES)]
    vec2 = [rows[2][f"f{k}"] for k in range(N_FEATURES)]
    assert sum(v > 0 for v in vec1) == 1  # one word -> one bucket
    assert [v * 3 for v in vec2] == vec1


def test_target_encoding_loo_excludes_own_label(spark, tmp_path):
    from debezium_server_bigquery_spark.functions.features import (
        target_encoding_loo,
    )

    spark.createDataFrame(
        [
            (1, "HIGH", 10.0),
            (2, "HIGH", 20.0),
            (3, "HIGH", 30.0),
            (4, "LOW", 5.0),  # singleton -> NULL encoding
        ],
        "o_orderkey long, o_orderpriority string, o_totalprice double",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = {r.o_orderkey: r for r in target_encoding_loo(spark, str(tmp_path)).collect()}
    assert out[1].loo_encoding == 25.0  # (20+30)/2
    assert out[2].loo_encoding == 20.0  # (10+30)/2
    assert out[3].loo_encoding == 15.0  # (10+20)/2
    assert out[4].loo_encoding is None


def test_woe_bins_hand_computed(spark, tmp_path):
    import datetime
    import math

    from debezium_server_bigquery_spark.functions.features import woe_value_bins

    t0 = datetime.datetime(2024, 1, 1)
    # values 1..8; purchases concentrated in the top quartile
    rows = []
    for i, v in enumerate(range(1, 9)):
        etype = "purchase" if v >= 7 else "view"
        rows.append((i, t0, 1, etype, float(v), "{}"))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {r.bin: r for r in woe_value_bins(spark, str(tmp_path)).collect()}
    # percentile_disc quartile edges of 1..8: e0=2, e1=4, e2=6
    # bin 3 = values 7,8 -> both purchases; bins 0..2 all non-events
    assert out[3].n_event == 2 and out[3].n_nonevent == 0
    assert out[3].woe is None  # zero cell -> NULL, not inf
    assert out[0].n_event == 0 and out[0].n_nonevent == 2
    assert out[1].woe is None and out[0].woe is None


def test_ann_truncation_full_dim_is_identity(spark, tmp_path):
    """Truncating to the FULL dimension must reproduce the full top-K
    exactly (overlap 1.0) — pin via monkeypatched TRUNC_DIM."""
    import debezium_server_bigquery_spark.functions.similarity as sim

    vecs = [
        (i, [float((i * 7 + j * 3) % 11) for j in range(8)], 0)
        for i in range(30)
    ]
    spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    orig = sim.TRUNC_DIM
    sim.TRUNC_DIM = 8
    try:
        out = sim.ann_dim_truncation_eval(spark, str(tmp_path)).collect()
    finally:
        sim.TRUNC_DIM = orig
    assert len(out) == 10
    assert all(r.overlap_frac == 1.0 for r in out)


def test_intrinsic_dim_exponential_line_closed_form(spark, tmp_path):
    """Exponentially spaced collinear points: probe i >= 2 has
    r1 = 2^(i-1) (to i-1) and r2 = 1.5 * 2^(i-1) (to i-2), probe 1 has
    ratio 2, probe 0 ratio 3 -> the estimate equals
    ln2 / mean(round(ln ratio, 12)) exactly."""
    import math

    import debezium_server_bigquery_spark.functions.similarity as sim

    n = 20
    vecs = [(i, [float(2 ** i), 0.0, 0.0, 0.0], 0) for i in range(n)]
    spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = sim.embedding_intrinsic_dim(spark, str(tmp_path)).collect()[0]
    ratios = [3.0, 2.0] + [1.5] * (n - 2)
    mean_ln = sum(round(math.log(r), 12) for r in ratios) / n
    expect = round(math.log(2) / mean_ln, 6)
    assert out.n_probes == n
    assert abs(out.intrinsic_dim - expect) < 1e-6
