"""Distributed BPE merge-table training over the documents corpus.

Byte-pair-encoding tokenizer training is the canonical iterative text
operator an LLM-data pipeline runs besides dedup/quality: repeatedly count
adjacent symbol pairs (weighted by word frequency) and merge the most
frequent pair.  The heavy work per round — pair counting over the corpus
vocabulary — is a map-side-combinable explode + sum aggregate; the greedy
in-word merge is pure array algebra (an ``aggregate`` fold that joins the
chosen pair left-to-right, the exact greedy semantics of reference BPE).

Scale design: training runs on the WORD-FREQUENCY table, not the corpus —
one corpus scan builds (word, freq), after which every round touches only
|vocabulary| rows.  Each round ``localCheckpoint``s the symbol table (the
kmeans/pagerank loop trade: O(1) plan depth at any merge count) and
collects exactly ONE row — the argmax pair — O(1) driver data per round,
same class as the k-means convergence scalar.

Correctness: merge selection is inherently iterative and data-dependent
(each round's counts depend on the previous round's chosen pair), which a
static SQL twin cannot express — this is the registry's lone rows-only
gate entry (the driver records a weaker check, per contract).  Instead the
operator is pinned by tests/test_bpe.py: the distributed merge table must
equal a pure-Python reference BPE bit-for-bit, including tie-breaks, on
both fixed and property-generated corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_server_bigquery_spark.sources.tables import load_table

K_MERGES = 8


def _sq(s: str) -> str:
    # Spark SQL string literals treat backslash as an escape character
    return s.replace("\\", "\\\\").replace("'", "\\'")


def _merge_expr(a: str, b: str, col: str = "syms") -> str:
    """Greedy left-to-right merge of adjacent (a, b) into one symbol.

    ``col`` names the array column (parameterized, never string-replaced:
    a trained merge could itself spell a column name)."""
    a, b, ab = _sq(a), _sq(b), _sq(a + b)
    return f"""
    aggregate({col}, cast(array() as array<string>),
      (acc, x) -> case
        when size(acc) > 0 and element_at(acc, -1) = '{a}' and x = '{b}'
        then concat(slice(acc, 1, size(acc) - 1), array('{ab}'))
        else concat(acc, array(x)) end)
    """


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return (
        docs.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _pair_counts(syms: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over a (freq, syms) symbol table —
    the map-side-combinable core of every BPE round."""
    return (
        syms.filter(F.size("syms") >= 2)
        .select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms) - 1), "
                    "i -> struct(element_at(syms, i) as a, "
                    "element_at(syms, i + 1) as b))"
                )
            ).alias("p"),
        )
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("cnt"))
    )


def train_bpe_merges(
    spark: SparkSession, words: DataFrame, k: int = K_MERGES
) -> list[tuple[int, str, str, str, int]]:
    """Train ``k`` BPE merges on a (word, freq) table.

    Returns [(rank, left, right, merged, support)] — support is the
    weighted count of the pair when it was chosen.  Ties break on
    (left, right) ascending so the result is fully deterministic.
    """
    syms = words.withColumn(
        "syms", F.expr("filter(split(word, ''), x -> x <> '')")
    ).localCheckpoint()
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, k + 1):
        pairs = _pair_counts(syms)
        top = (
            pairs.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b")).limit(1).collect()
        )  # 1 row — O(1) driver data per round
        if not top:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], top[0]["cnt"]
        merges.append((rank, a, b, a + b, cnt))
        syms = syms.withColumn("syms", F.expr(_merge_expr(a, b))).localCheckpoint()
    return merges


def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", spread=True)
    merges = train_bpe_merges(spark, word_frequencies(docs), K_MERGES)
    return spark.createDataFrame(
        merges, "rank long, left string, right string, merged string, support long"
    ).orderBy("rank")


def bpe_encode_words(words: DataFrame, merges: list[tuple]) -> DataFrame:
    """Apply a trained merge table to a word table: adds ``tokens``
    (array<string>) — each word's BPE segmentation.

    Applying rank-by-rank greedy left-to-right reproduces reference BPE
    encoding exactly (same procedure as training applies after each
    argmax).  The merges arrive as the trainer's [(rank, a, b, ...), ...]
    list — O(k) driver metadata compiled into k chained in-JVM array
    folds, no Python on the executors.
    """
    out = words.withColumn(
        "tokens", F.expr("filter(split(word, ''), x -> x <> '')")
    )
    for _rank, a, b, *_rest in merges:
        out = out.withColumn("tokens", F.expr(_merge_expr(a, b, col="tokens")))
    return out


def bpe_token_stats(docs: DataFrame, merges: list[tuple], text_col: str = "text") -> DataFrame:
    """Per-document token counts under a trained BPE tokenizer.

    Scale design: the corpus is reduced to its per-doc word occurrences
    and the tokenizer runs ONCE PER DISTINCT WORD (the vocabulary table,
    orders of magnitude smaller than the corpus); occurrences then join
    the encoded vocabulary on the word hash key and aggregate back to
    documents — encode-the-vocabulary-not-the-corpus, the same economy as
    training on word frequencies."""
    occ = docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
            )
        ).alias("word"),
    )
    encoded = bpe_encode_words(occ.select("word").distinct(), merges).select(
        "word", F.size("tokens").alias("n_word_tokens")
    )
    return (
        occ.join(encoded, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_word_tokens").alias("n_tokens"),
        )
    )


def bpe_first_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE round 1 as a STATIC query: the argmax adjacent character pair
    over the initial (per-character) symbol table.  Unlike the full
    trainer — whose per-round argmax feedback loop no single SQL
    statement can express — round 1 has no loop dependency, so it gets a
    hash-checked oracle twin and gives the BPE family a driver-graded
    row alongside the rows-only ``bpe_train_merges``."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    syms = word_frequencies(docs).withColumn(
        "syms", F.expr("filter(split(word, ''), x -> x <> '')")
    )
    return (
        _pair_counts(syms)
        .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
        .limit(1)
        .select(
            F.col("a").alias("left"),
            F.col("b").alias("right"),
            F.concat("a", "b").alias("merged"),
            F.col("cnt").alias("support"),
        )
    )


BPE_FIRST_MERGE_SQL = r"""
WITH words AS (
  SELECT w AS word, COUNT(*) AS freq
  FROM documents, UNNEST(regexp_split_to_array(lower(text), '\s+')) AS t(w)
  WHERE w <> ''
  GROUP BY w
), pairs AS (
  SELECT substring(word, i, 1) AS a, substring(word, i + 1, 1) AS b,
    CAST(SUM(freq) AS BIGINT) AS cnt
  FROM words, UNNEST(range(1, length(word))) AS r(i)
  GROUP BY 1, 2
)
SELECT a AS "left", b AS "right", a || b AS merged, cnt AS support
FROM pairs ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
"""


QUERIES = {"bpe_train_merges": bpe_train_merges, "bpe_first_merge": bpe_first_merge}
# bpe_train_merges deliberately has no ORACLES entry — see module
# docstring: the per-round argmax feedback loop is not expressible as one
# static SQL statement; tests/test_bpe.py pins the result against a
# pure-Python reference BPE.  Round 1 alone IS static — bpe_first_merge
# carries the family's hash-checked twin.
ORACLES: dict[str, str] = {"bpe_first_merge": BPE_FIRST_MERGE_SQL}
