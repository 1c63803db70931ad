"""Customer segmentation and user-journey analytics over replicated tables.

- **rfm_customer_segments** — classic RFM: per-customer Recency (days
  since last order), Frequency (order count), Monetary (total spend),
  each quartiled, concatenated into the segment label ("444" = best).
  A naive ``NTILE() OVER (ORDER BY ...)`` is an unpartitioned window —
  the textbook single-task bottleneck — so each dimension is ranked with
  ``operators/rank.global_row_number`` (range partition + local rank +
  O(partitions) offsets) and the tile derives from the exact rank:
  rank r of n gets bucket ``((r-1)*4) div n + 1`` — even quantile
  buckets from exact rank arithmetic (sizes differ from SQL NTILE's
  front-loaded remainder by at most one row; both engines compute the
  identical formula), rank by value then customer key for determinism.
- **event_transition_matrix** — next-event transition counts/probability
  per event_type pair from each user's time-ordered stream: one lag
  window on the user key, one pair aggregate.  The classic user-journey
  Markov summary; O(types²) output.

Every float is a rounded ratio of exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from debezium_server_bigquery_spark.sources.tables import load_table

N_TILES = 4


def _tile(rank_name: str):
    # quantile bucket of rank r of n: ((r - 1) * 4) div n + 1 (exact ints;
    # remainder rows land in later buckets, unlike NTILE's front-loading)
    return F.expr(f"(({rank_name} - 1) * {N_TILES}) div n + 1")


def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    ref = orders.agg(F.max("o_orderdate").alias("ref_date"))
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").alias("frequency"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"),
                2,
            ).alias("monetary"),
        )
        .crossJoin(F.broadcast(ref))
        .select(
            "o_custkey",
            F.datediff(F.col("ref_date"), F.col("last_order")).alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    from debezium_server_bigquery_spark.operators.rank import global_row_number

    n = per_cust.agg(F.count("*").alias("n"))
    # rank each dimension distributed: LOWER recency is better -> rank desc
    # on days so tile 4 = most recent; frequency/monetary rank asc so
    # tile 4 = highest
    ranked = global_row_number(
        per_cust, [F.desc("recency_days"), F.asc("o_custkey")], out="rr"
    )
    ranked = global_row_number(
        ranked, [F.asc("frequency"), F.asc("o_custkey")], out="rf"
    )
    ranked = global_row_number(
        ranked, [F.asc("monetary"), F.asc("o_custkey")], out="rm"
    ).crossJoin(F.broadcast(n))
    out = ranked.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        _tile("rr").alias("r_tile"),
        _tile("rf").alias("f_tile"),
        _tile("rm").alias("m_tile"),
    )
    return out.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        "r_tile",
        "f_tile",
        "m_tile",
        F.concat(
            F.col("r_tile").cast("string"),
            F.col("f_tile").cast("string"),
            F.col("m_tile").cast("string"),
        ).alias("segment"),
    ).orderBy("o_custkey")


RFM_SQL = f"""
WITH per_cust AS (
  SELECT o_custkey,
    datediff('day', MAX(o_orderdate), (SELECT MAX(o_orderdate) FROM orders)) AS recency_days,
    COUNT(*) AS frequency,
    round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS monetary
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT *,
    CAST(ROW_NUMBER() OVER (ORDER BY recency_days DESC, o_custkey ASC) AS BIGINT) AS rr,
    CAST(ROW_NUMBER() OVER (ORDER BY frequency ASC, o_custkey ASC) AS BIGINT) AS rf,
    CAST(ROW_NUMBER() OVER (ORDER BY monetary ASC, o_custkey ASC) AS BIGINT) AS rm,
    (SELECT COUNT(*) FROM per_cust) AS n
  FROM per_cust
)
SELECT o_custkey, recency_days, frequency, monetary,
  ((rr - 1) * {N_TILES}) // n + 1 AS r_tile,
  ((rf - 1) * {N_TILES}) // n + 1 AS f_tile,
  ((rm - 1) * {N_TILES}) // n + 1 AS m_tile,
  CAST(((rr - 1) * {N_TILES}) // n + 1 AS VARCHAR)
    || CAST(((rf - 1) * {N_TILES}) // n + 1 AS VARCHAR)
    || CAST(((rm - 1) * {N_TILES}) // n + 1 AS VARCHAR) AS segment
FROM ranked
ORDER BY o_custkey
"""


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P(next event type | current) from per-user time-ordered streams."""
    # truncate to micros like the CDC synthesizer: the oracle's
    # epoch_us * 1000 cannot see sub-micro digits, so under a
    # TIMESTAMP(NANOS) source layout exact-ns ordering could pair events
    # differently than the twin
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.expr("(ts_ns div 1000) * 1000").alias("ts_ns"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    pairs = ev.withColumn("next_type", F.lead("event_type").over(w)).filter(
        F.col("next_type").isNotNull()
    )
    counts = pairs.groupBy("event_type", "next_type").agg(
        F.count("*").alias("n_transitions")
    )
    totals = counts.groupBy("event_type").agg(
        F.sum("n_transitions").alias("n_from")
    )
    return (
        counts.join(F.broadcast(totals), "event_type")
        .select(
            "event_type",
            "next_type",
            "n_transitions",
            F.round(F.col("n_transitions") / F.col("n_from"), 6).alias("p_next"),
        )
        .orderBy("event_type", "next_type")
    )


TRANSITION_SQL = """
WITH ordered AS (
  SELECT user_id, event_type,
    LEAD(event_type) OVER (
      PARTITION BY user_id
      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) * 1000, event_id) AS next_type
  FROM events
),
counts AS (
  SELECT event_type, next_type, COUNT(*) AS n_transitions
  FROM ordered WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
),
totals AS (
  SELECT event_type, CAST(SUM(n_transitions) AS BIGINT) AS n_from
  FROM counts GROUP BY event_type
)
SELECT c.event_type, c.next_type, c.n_transitions,
  round(c.n_transitions / CAST(t.n_from AS DOUBLE), 6) AS p_next
FROM counts c JOIN totals t ON c.event_type = t.event_type
ORDER BY c.event_type, c.next_type
"""


def event_next_prediction_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out evaluation of the Markov next-event model: transitions
    whose NEXT event id hashes into the 1-in-5 test fold are predicted by
    the argmax transition trained on the other four folds; output is
    per-current-type hit rate.  The eval twin the transition matrix needs
    before anyone trusts it — same family as ann_ivf_recall and
    dedup_lsh_recall (measure the approximate/model artifact against held
    truth inside the engine).

    Scale: one user-keyed window builds transitions once; the trained
    argmax table is O(types²) (broadcast); accuracy is one aggregate over
    the test fold.  Ties in the argmax break on the lexicographically
    smallest next type — deterministic in both engines."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.expr("(ts_ns div 1000) * 1000").alias("ts_ns"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    pairs = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .withColumn("next_id", F.lead("event_id").over(w))
        .filter(F.col("next_type").isNotNull())
        .select("event_type", "next_type", "next_id")
    )
    train = pairs.filter(F.pmod("next_id", F.lit(5)) != 0)
    test = pairs.filter(F.pmod("next_id", F.lit(5)) == 0)
    counts = train.groupBy("event_type", "next_type").agg(
        F.count("*").alias("cnt")
    )
    wp = Window.partitionBy("event_type").orderBy(
        F.desc("cnt"), F.asc("next_type")
    )
    pred = (
        counts.withColumn("rk", F.row_number().over(wp))
        .filter(F.col("rk") == 1)
        .select("event_type", F.col("next_type").alias("predicted"))
    )
    return (
        test.join(F.broadcast(pred), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_test"),
            F.sum(
                F.when(F.col("next_type") == F.col("predicted"), 1).otherwise(0)
            ).alias("n_correct"),
        )
        .select(
            "event_type",
            "n_test",
            "n_correct",
            F.round(F.col("n_correct") / F.col("n_test").cast("double"), 6).alias(
                "accuracy"
            ),
        )
        .orderBy("event_type")
    )


NEXT_PRED_SQL = """
WITH ordered AS (
  SELECT user_id, event_type,
    LEAD(event_type) OVER (
      PARTITION BY user_id
      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) * 1000, event_id) AS next_type,
    LEAD(event_id) OVER (
      PARTITION BY user_id
      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) * 1000, event_id) AS next_id
  FROM events
),
pairs AS (
  SELECT event_type, next_type, next_id FROM ordered WHERE next_type IS NOT NULL
),
counts AS (
  SELECT event_type, next_type, COUNT(*) AS cnt
  FROM pairs WHERE next_id % 5 <> 0
  GROUP BY event_type, next_type
),
pred AS (
  SELECT event_type, next_type AS predicted FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY event_type ORDER BY cnt DESC, next_type ASC) AS rk
    FROM counts
  ) WHERE rk = 1
)
SELECT p.event_type, COUNT(*) AS n_test,
  CAST(SUM(CASE WHEN p.next_type = pr.predicted THEN 1 ELSE 0 END) AS BIGINT)
    AS n_correct,
  round(SUM(CASE WHEN p.next_type = pr.predicted THEN 1 ELSE 0 END)
    / CAST(COUNT(*) AS DOUBLE), 6) AS accuracy
FROM pairs p JOIN pred pr ON p.event_type = pr.event_type
WHERE p.next_id % 5 = 0
GROUP BY p.event_type ORDER BY p.event_type
"""


def customer_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration: the exact Gini coefficient of per-customer
    spend — G = (2·Σ i·x_i)/(n·Σx) − (n+1)/n over spend sorted ascending
    with rank i.  The inequality metric behind "top decile drives X% of
    revenue" dashboards, computed exactly at any scale: the rank comes
    from ``operators/rank.global_row_number`` and both Σx and Σ i·x_i are
    exact decimal sums (rank × decimal stays decimal), so the only
    floating point is the final two-division expression — bit-identical
    cross-engine."""
    from debezium_server_bigquery_spark.operators.rank import global_row_number

    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("spend")
    )
    ranked = global_row_number(
        spend, [F.asc("spend"), F.asc("o_custkey")], out="r"
    )
    sums = ranked.agg(
        F.count("*").alias("n"),
        F.sum("spend").alias("sx"),
        F.sum(F.col("r") * F.col("spend")).alias("srx"),
    )
    return sums.select(
        F.col("n").alias("n_customers"),
        F.round(F.col("sx").cast("double"), 2).alias("total_revenue"),
        F.round(
            (F.lit(2.0) * F.col("srx").cast("double"))
            / (F.col("n") * F.col("sx").cast("double"))
            - (F.col("n") + 1) / F.col("n").cast("double"),
            6,
        ).alias("gini"),
    )


GINI_SQL = """
WITH spend AS (
  SELECT o_custkey,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS spend
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT spend, CAST(ROW_NUMBER() OVER (ORDER BY spend ASC, o_custkey ASC)
    AS BIGINT) AS r
  FROM spend
), sums AS (
  SELECT COUNT(*) AS n, SUM(spend) AS sx, SUM(r * spend) AS srx FROM ranked
)
SELECT n AS n_customers,
  round(CAST(sx AS DOUBLE), 2) AS total_revenue,
  round((2.0 * CAST(srx AS DOUBLE)) / (n * CAST(sx AS DOUBLE))
      - (n + 1) / CAST(n AS DOUBLE), 6) AS gini
FROM sums
"""


PARETO_TARGETS = (50, 80, 90)  # % of revenue


def customer_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration cutpoints: the smallest customer prefix (by
    spend, descending) that covers 50 / 80 / 90 % of total revenue — the
    "how few customers are half the business" companion to the Gini
    scalar, reported as actionable counts instead of one index.

    Scale design: spend aggregates map-side per customer; the global
    descending rank AND the running revenue both come from ONE
    ``operators/rank.global_rank_and_prefix_sum`` range partitioning
    (per-partition windows + O(num_partitions) driver offsets — no
    single-partition window ever exists).  Revenue is carried as exact
    integer cents (DECIMAL sum × 100 → BIGINT), so the running sums are
    associative and bit-identical across engines; the corpus totals fold
    in as a one-row broadcast and each ranked row fans out to ≤ 3
    constant thresholds.  The final aggregate is 3 groups."""
    from debezium_server_bigquery_spark.operators.rank import (
        global_rank_and_prefix_sum,
    )

    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("long")
        .alias("cents")
    )
    ranked = global_rank_and_prefix_sum(
        spend,
        [F.desc("cents"), F.asc("o_custkey")],
        "cents",
        rank_out="r",
        sum_out="running",
    )
    totals = spend.agg(
        F.count("*").alias("n_customers"),
        F.sum("cents").alias("total_cents"),
    ).withColumn("__k", F.lit(1))
    cut = (
        ranked.withColumn("__k", F.lit(1))
        .join(F.broadcast(totals), "__k")
        .withColumn(
            "pct", F.explode(F.array(*[F.lit(p) for p in PARETO_TARGETS]))
        )
        .filter(F.col("running") * 100 >= F.col("pct") * F.col("total_cents"))
    )
    return (
        cut.groupBy(F.col("pct").cast("int").alias("pct_target"))
        .agg(
            F.min("r").alias("customers_needed"),
            F.min_by("running", "r").alias("cents_at_cut"),
            F.max("n_customers").alias("n_customers"),
            F.max("total_cents").alias("total_cents"),
        )
        .select(
            "pct_target",
            "customers_needed",
            F.round(
                F.col("customers_needed").cast("double")
                / F.col("n_customers"),
                6,
            ).alias("customer_fraction"),
            F.round(
                F.col("cents_at_cut").cast("double") / F.col("total_cents"), 6
            ).alias("revenue_share"),
        )
        .orderBy("pct_target")
    )


PARETO_SQL = f"""
WITH spend AS (
  SELECT o_custkey,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT cents,
    CAST(ROW_NUMBER() OVER (ORDER BY cents DESC, o_custkey ASC) AS BIGINT)
      AS r,
    CAST(SUM(cents) OVER (ORDER BY cents DESC, o_custkey ASC
         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running
  FROM spend
), tot AS (
  SELECT COUNT(*) AS n_customers, SUM(cents) AS total_cents FROM spend
), cut AS (
  SELECT l.pct, r.r, r.running, t.n_customers, t.total_cents
  FROM ranked r, tot t, unnest([{", ".join(str(p) for p in PARETO_TARGETS)}])
    AS l(pct)
  WHERE r.running * 100 >= l.pct * t.total_cents
)
SELECT CAST(pct AS INTEGER) AS pct_target,
  MIN(r) AS customers_needed,
  round(CAST(MIN(r) AS DOUBLE) / any_value(n_customers), 6)
    AS customer_fraction,
  round(CAST(arg_min(running, r) AS DOUBLE) / any_value(total_cents), 6)
    AS revenue_share
FROM cut GROUP BY pct ORDER BY pct_target
"""


TOKEN_BUDGET = 8000  # words — ~half the sf0.01 corpus, so selection bites


def select_quality_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus selection: take documents in descending quality
    order until the cumulative token count reaches the budget — the "best
    N tokens" curation cut.  Quality and token counts come from the
    existing scorer; the greedy cumulative cut is an exact distributed
    prefix sum over the (quality desc, doc_id) total order
    (operators/rank.global_prefix_sum), never a single-partition window.
    Output is the per-language balance of the selected slice."""
    from debezium_server_bigquery_spark.functions.text import quality_scores
    from debezium_server_bigquery_spark.operators.rank import global_prefix_sum

    q = quality_scores(spark, sf_dir).select(
        "doc_id", "n_words", "quality_score"
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    scored = q.join(docs, "doc_id")
    cum = global_prefix_sum(
        scored,
        [F.desc("quality_score"), F.asc("doc_id")],
        "n_words",
        out="cum_tokens",
    )
    sel = cum.filter(F.col("cum_tokens") <= TOKEN_BUDGET)
    return (
        sel.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").alias("n_tokens"),
            F.round(F.min("quality_score"), 2).alias("min_quality"),
        )
        .orderBy("lang")
    )


def _budget_sql() -> str:
    from debezium_server_bigquery_spark.functions.text import TEXT_QUALITY_SQL

    return f"""
WITH q AS ({TEXT_QUALITY_SQL}),
j AS (
  SELECT q.doc_id, q.n_words, q.quality_score, d.lang
  FROM q JOIN documents d ON q.doc_id = d.doc_id
),
c AS (
  SELECT *, CAST(SUM(n_words) OVER (
      ORDER BY quality_score DESC, doc_id ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
  FROM j
)
SELECT lang, COUNT(*) AS n_docs,
  CAST(SUM(n_words) AS BIGINT) AS n_tokens,
  round(MIN(quality_score), 2) AS min_quality
FROM c WHERE cum_tokens <= {TOKEN_BUDGET}
GROUP BY lang ORDER BY lang
"""


SELECT_BUDGET_SQL = _budget_sql()


def event_markov_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional next-event entropy per current type — the
    information-theoretic summary on top of the transition matrix:
    H(next | cur) in bits, against the log2(|next types|) maximum, with
    the ratio as a 0–1 predictability score (0 = the next event is
    determined, 1 = uniformly unpredictable).  The one-line answer to
    "is this journey stage a funnel or a random walk".

    Scale + determinism: transition counts come from the same user-keyed
    lag window the transition matrix uses (micros-truncated times, the
    oracle-visibility rule); entropy is -Σ p·log2(p) over ≤ |types|
    terms per group — the Zipf-fit wobble argument (≤1-ulp per log, ~9
    orders below the 6-dp rounding) covers the ≤|types|-term float sum.
    Output is |types| rows."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.expr("(ts_ns div 1000) * 1000").alias("tns"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("tns", "event_id")
    pairs = ev.withColumn("next_type", F.lead("event_type").over(w)).filter(
        F.col("next_type").isNotNull()
    )
    counts = pairs.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    totals = counts.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("n_from"),
        F.count(F.lit(1)).cast("long").alias("n_next_types"),
    )
    p = F.col("n") / F.col("n_from").cast("double")
    ent = counts.join(F.broadcast(totals), "event_type").groupBy(
        "event_type"
    ).agg(
        F.max("n_from").alias("n_from"),
        F.max("n_next_types").alias("n_next_types"),
        F.sum(-p * F.log2(p)).alias("h_raw"),
    )
    h_max = F.log2(F.col("n_next_types").cast("double"))
    return ent.select(
        "event_type",
        "n_from",
        "n_next_types",
        F.round("h_raw", 6).alias("entropy_bits"),
        F.when(F.col("n_next_types") > 1, F.round(F.col("h_raw") / h_max, 6))
        .otherwise(F.lit(0.0))
        .alias("predictability_gap"),
    ).orderBy("event_type")


MARKOV_ENTROPY_SQL = """
WITH ordered AS (
  SELECT user_id, event_type,
    LEAD(event_type) OVER (
      PARTITION BY user_id
      ORDER BY (epoch_us(CAST(ts AS TIMESTAMP)) * 1000 // 1000) * 1000,
               event_id) AS next_type
  FROM events
),
counts AS (
  SELECT event_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM ordered WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
),
totals AS (
  SELECT event_type, CAST(SUM(n) AS BIGINT) AS n_from,
         CAST(COUNT(*) AS BIGINT) AS n_next_types
  FROM counts GROUP BY event_type
),
ent AS (
  SELECT c.event_type, MAX(t.n_from) AS n_from,
    MAX(t.n_next_types) AS n_next_types,
    SUM(-(c.n / CAST(t.n_from AS DOUBLE))
        * log2(c.n / CAST(t.n_from AS DOUBLE))) AS h_raw
  FROM counts c JOIN totals t ON c.event_type = t.event_type
  GROUP BY c.event_type
)
SELECT event_type, n_from, n_next_types,
  round(h_raw, 6) AS entropy_bits,
  CASE WHEN n_next_types > 1
    THEN round(h_raw / log2(CAST(n_next_types AS DOUBLE)), 6)
    ELSE 0.0 END AS predictability_gap
FROM ent
ORDER BY event_type
"""


QUERIES = {
    "rfm_customer_segments": rfm_customer_segments,
    "event_transition_matrix": event_transition_matrix,
    "event_next_prediction_accuracy": event_next_prediction_accuracy,
    "customer_revenue_gini": customer_revenue_gini,
    "customer_revenue_pareto": customer_revenue_pareto,
    "event_markov_entropy": event_markov_entropy,
    "select_quality_budget": select_quality_budget,
}
ORACLES = {
    "rfm_customer_segments": RFM_SQL,
    "event_transition_matrix": TRANSITION_SQL,
    "event_next_prediction_accuracy": NEXT_PRED_SQL,
    "customer_revenue_gini": GINI_SQL,
    "customer_revenue_pareto": PARETO_SQL,
    "event_markov_entropy": MARKOV_ENTROPY_SQL,
    "select_quality_budget": SELECT_BUDGET_SQL,
}
