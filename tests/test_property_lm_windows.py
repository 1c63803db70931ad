"""Property tests: corpus-LM counts vs a pure-Python model, and the
positional trailing-frame explode vs pandas rolling."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F


def _py_bigram_counts(texts):
    c_ab: dict = {}
    for t in texts:
        toks = [w for w in t.lower().split() if w]
        for a, b in zip(toks, toks[1:]):
            c_ab[(a, b)] = c_ab.get((a, b), 0) + 1
    return c_ab


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=24),
        min_size=1,
        max_size=8,
    )
)
def test_bigram_lm_counts_match_python(spark, texts):
    from debezium_server_bigquery_spark.functions.lm import _doc_tokens, bigram_lm

    docs = spark.createDataFrame(
        [(i, t, "xx") for i, t in enumerate(texts)],
        "doc_id long, text string, lang string",
    )
    got = {
        (r.a, r.b): r.cnt for r in bigram_lm(_doc_tokens(docs)).collect()
    }
    assert got == _py_bigram_counts(texts)


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=40))
def test_trailing_frame_explode_matches_pandas_rolling(spark, counts):
    """The rank/explode/position-agg sliding frame equals pandas
    rolling(7, min_periods=1) on the same series."""
    import pandas as pd

    from debezium_server_bigquery_spark.operators.rank import global_row_number

    daily = spark.createDataFrame(
        [(i, int(c)) for i, c in enumerate(counts)], "day int, n long"
    )
    ranked = global_row_number(daily, [F.asc("day")], out="rn")
    contrib = ranked.select(
        F.col("n").alias("c"),
        F.explode(F.expr("sequence(rn, rn + 6)")).alias("pos"),
    )
    stats = contrib.groupBy("pos").agg(
        F.avg("c").alias("ma"), F.min("c").alias("lo"), F.max("c").alias("hi")
    )
    got = {
        r.day: (r.ma, r.lo, r.hi)
        for r in ranked.join(stats, ranked.rn == stats.pos).collect()
    }
    s = pd.Series(counts)
    ma = s.rolling(7, min_periods=1).mean()
    lo = s.rolling(7, min_periods=1).min()
    hi = s.rolling(7, min_periods=1).max()
    for i in range(len(counts)):
        g = got[i]
        assert abs(g[0] - ma[i]) < 1e-9
        assert g[1] == lo[i] and g[2] == hi[i]
