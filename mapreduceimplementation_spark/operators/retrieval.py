"""Retrieval operators for LLM-data pipelines (SURVEY.md §2 C56):
BM25 ranked retrieval over the documents table.

Scale design (the 100 TB contract):

- The inverted relation (doc_id, term, tf) is the same map shape as the
  reference's inverted index (src/mrapps/indexer.go:1-38) with counts
  carried; corpus statistics (df, avgdl) are partial-agg exchanges
  bounded by vocabulary, not corpus size.
- Query terms join the postings by term equi-join with the query side
  broadcast — candidate volume is the postings of the query's terms
  only, never a corpus scan per query.  Per-query top-k is a bounded
  window over those candidates.
- Scores are summed as integer micro-units (per-term contribution
  floor'd to 1e-6 grain BEFORE the sum): double summation is
  order-dependent across partitionings, integer summation is not, so
  ranks are bit-stable across cluster sizes AND engines — the same
  discipline as embedding_outliers/quality_lm_score.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreduceimplementation_spark.functions.text import word_tokens
from mapreduceimplementation_spark.registry import register
from mapreduceimplementation_spark.session import tune
from mapreduceimplementation_spark.sources.tables import load_table

_BM25_K1 = "CAST(1.2 AS DOUBLE)"  # term-frequency saturation
_BM25_B = "CAST(0.75 AS DOUBLE)"  # length normalization
_BM25_PROBES = 4  # query-by-example probes: the 4 lowest doc_ids
_BM25_TOPK = 5


@register(
    "bm25_topk",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, w AS term, count(*) AS tf
        FROM (SELECT doc_id,
                     unnest(list_filter(regexp_split_to_array(text, '[^A-Za-z]+'),
                                        x -> x <> '')) AS w
              FROM documents WHERE text IS NOT NULL)
        GROUP BY 1, 2
    ), dl AS (
        SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tok GROUP BY 1
    ), stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
        FROM dl
    ), df AS (
        SELECT term, CAST(count(*) AS BIGINT) AS df FROM tok GROUP BY 1
    ), probes AS (
        SELECT doc_id AS q_id FROM dl ORDER BY doc_id LIMIT {_BM25_PROBES}
    ), qterms AS (
        SELECT p.q_id, t.term
        FROM probes p JOIN tok t ON t.doc_id = p.q_id
    ), contrib AS (
        SELECT q.q_id, t.doc_id,
               CAST(floor(
                   ln((CAST(s.n_docs AS DOUBLE) - CAST(f.df AS DOUBLE)
                       + CAST(0.5 AS DOUBLE))
                      / (CAST(f.df AS DOUBLE) + CAST(0.5 AS DOUBLE))
                      + CAST(1 AS DOUBLE))
                   * (CAST(t.tf AS DOUBLE) * ({_BM25_K1} + CAST(1 AS DOUBLE)))
                     / (CAST(t.tf AS DOUBLE)
                        + {_BM25_K1} * (CAST(1 AS DOUBLE) - {_BM25_B}
                           + {_BM25_B} * CAST(d.dl AS DOUBLE) / s.avgdl))
                   * CAST(1000000 AS DOUBLE)) AS BIGINT) AS c
        FROM qterms q
        JOIN tok t ON t.term = q.term AND t.doc_id <> q.q_id
        JOIN df f ON f.term = q.term
        JOIN dl d ON d.doc_id = t.doc_id
        CROSS JOIN stats s
    ), scored AS (
        SELECT q_id, doc_id, CAST(sum(c) AS BIGINT) AS score_micro
        FROM contrib GROUP BY 1, 2
    )
    SELECT q_id, CAST(rnk AS BIGINT) AS rnk, doc_id, score_micro
    FROM (SELECT q_id, doc_id, score_micro,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY score_micro DESC, doc_id) AS rnk
          FROM scored)
    WHERE rnk <= {_BM25_TOPK}
    """,
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-{_BM25_TOPK} retrieval, query-by-example: the {_BM25_PROBES}
    lowest-doc_id documents act as probes and every other document is
    ranked by Okapi BM25 (k1=1.2, b=0.75, Lucene's +1 idf floor so common
    terms score >= 0) over the shared terms — the retrieval primitive
    behind decontamination-by-retrieval pipelines and RAG index QA
    (C27 decontaminates by exact shingle; retrieval audits the fuzzy
    tail the shingle join misses).

    Ranking is bit-stable: each per-term contribution is floor'd to an
    integer micro-unit BEFORE summation (double sums are order-dependent
    across partitionings and engines; integer sums are not), idf/tf
    arithmetic is stated in the exact same IEEE op order in both
    engines, and ties break on doc_id.

    Scale shape: postings (doc_id, term, tf) and df/dl/avgdl are
    vocabulary- or doc-bounded partial-agg exchanges off ONE corpus
    scan; the probe-term relation is tiny and BROADCAST into the
    postings equi-join, so candidate volume is the postings of the
    query's terms, never docs x queries; per-query scoring is one
    exchange on (q_id, doc_id) and the top-k window partitions on q_id.
    The exact corpus-wide window is the audit harness — production runs
    the same plan per query batch against a term-partitioned postings
    table.

    Reference anchor: postings build = src/mrapps/indexer.go:1-38 map
    shape with counts; the scoring join is ii.go's word->docs inversion
    consumed query-side."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = (
        word_tokens(docs.where(F.col("text").isNotNull()), "text", "term")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # postings feed dl, df, stats, qterms AND the scoring join: one
    # materialization (the tiny-multi-use-relation rule does not apply —
    # tok is corpus-sized — but recomputing the scan 5x would; checkpoint
    # keeps the exhibit honest at one scan)
    tok = tok.localCheckpoint()
    dl = tok.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avgdl"
        ),
    )
    df_ = tok.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    probes = dl.select(F.col("doc_id").alias("q_id")).orderBy("q_id").limit(
        _BM25_PROBES
    )
    qterms = F.broadcast(
        probes.join(tok, probes["q_id"] == tok["doc_id"]).select("q_id", "term")
    )
    d = lambda c: c.cast("double")
    k1 = F.expr(_BM25_K1)
    b = F.expr(_BM25_B)
    one = F.expr("CAST(1 AS DOUBLE)")
    half = F.expr("CAST(0.5 AS DOUBLE)")
    cand = (
        qterms.join(
            tok.alias("t"),
            (F.col("t.term") == qterms["term"])
            & (F.col("t.doc_id") != qterms["q_id"]),
        )
        .select("q_id", F.col("t.doc_id").alias("doc_id"), F.col("t.term").alias("term"), "tf")
        .join(df_, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log((d(F.col("n_docs")) - d(F.col("df")) + half) / (d(F.col("df")) + half) + one)
    tf_norm = (d(F.col("tf")) * (k1 + one)) / (
        d(F.col("tf")) + k1 * (one - b + b * d(F.col("dl")) / F.col("avgdl"))
    )
    contrib = cand.select(
        "q_id",
        "doc_id",
        F.floor(idf * tf_norm * F.expr("CAST(1000000 AS DOUBLE)"))
        .cast("long")
        .alias("c"),
    )
    scored = contrib.groupBy("q_id", "doc_id").agg(
        F.sum("c").cast("long").alias("score_micro")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("score_micro").desc(), "doc_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= _BM25_TOPK)
        .select("q_id", "rnk", "doc_id", "score_micro")
    )
