"""Keyword search over the ``documents`` table: inverted-index
postings and BM25-style top-k ranking.

The reference pipeline has no search surface (its only ad-hoc query is
a Postgres ``ORDER BY total_trips DESC``, SURVEY.md §2.6/§3.4), but a
training-data engine needs lexical retrieval — corpus exploration,
eval-set mining, and quality auditing all start with "find the
documents matching these terms, best first".

Design for 100 TB:

- **Filter before anything shuffles.** The postings relation is built
  by filtering each document's token array to the query terms *inside
  the scan stage* (``F.filter`` on the array, then ``explode``), so
  the per-(doc, term) aggregation only ever sees rows for the handful
  of query terms — the shuffle is proportional to the number of
  *matching* tokens, not corpus size. Non-matching documents die at
  the map stage.
- **Corpus statistics are one tiny aggregate.** N (doc count) and T
  (total token count) reduce to a single row that joins back in via a
  broadcast; per-term document frequency is |query| rows, also
  broadcast. Nothing driver-side, no collect.
- **Exact integer scoring.** BM25's float log/divisions would make
  value-hash oracle comparison flaky, so the score is a rational
  variant computed entirely in DECIMAL(38,0)/HUGEINT integer
  arithmetic (see ``bm25_micro_expr``): monotone in the classic
  Robertson idf (the log is omitted — it never reorders a single
  term's contribution, and this engine documents the scale as
  "micro-units of rational BM25"), with k1 = 6/5 and b = 3/4 folded
  in as exact fractions. Rounding is the half-up integer-DIV identity
  from ``functions/exact.py``.

The same postings construction is the plumbing a distributed inverted
index needs: at 100 TB you would persist ``(term, doc_id, tf, dl)``
bucketed by term and this query becomes a bucket-pruned probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_ride_hailing_data_pipeline_spark.operators.text import tokens

# Rational BM25 with k1 = 6/5, b = 3/4 and avgdl = T/N:
#
#   idf   = (N - df + 1/2) / (df + 1/2)          -- log omitted (monotone)
#   tfc   = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
#         = 44*T*tf / (20*T*tf + 6*T + 18*dl*N)  -- cleared denominators
#   score = round_half_up(1e6 * idf * tfc)       -- integer micro-units
#
# num = 1e6 * (2N-2df+1) * 44 * T * tf ; den = (2df+1)*(20*T*tf+6*T+18*dl*N)
# round_half_up(num/den) = (2*num + den) DIV (2*den), all DECIMAL(38,0).
_SCORE_EXPR = """
cast(
  (2 * (cast(1000000 as decimal(38,0)) * (2*{N} - 2*{df} + 1) * 44 * {T} * {tf})
     + ((2*{df} + 1) * (20*{T}*{tf} + 6*{T} + 18*{dl}*{N})))
  div
  (2 * ((2*{df} + 1) * (20*{T}*{tf} + 6*{T} + 18*{dl}*{N})))
as bigint)
"""


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents for ``query_terms`` under exact-integer rational
    BM25. Returns (id_col, bm25_micro, terms_matched) ordered by score
    desc then id (a total order, so the top-k cut is deterministic)."""
    toks = tokens(text_col)
    terms_arr = F.array(*[F.lit(t) for t in query_terms])
    base = df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("dl"),
        F.filter(toks, lambda t: F.array_contains(terms_arr, t)).alias("hits"),
    )
    # corpus stats: one row, broadcast back in
    stats = base.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n_docs"),
        F.sum("dl").cast("decimal(38,0)").alias("t_tok"),
    )
    post = base.filter(F.size("hits") > 0).select(
        id_col, "dl", F.explode("hits").alias("tok")
    )
    tf = post.groupBy(id_col, "dl", "tok").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("tf")
    )
    dfreq = post.groupBy("tok").agg(
        F.countDistinct(id_col).cast("decimal(38,0)").alias("df")
    )
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .join(F.broadcast(stats))
        .withColumn("dl", F.col("dl").cast("decimal(38,0)"))
        .select(
            F.col(id_col),
            F.expr(
                _SCORE_EXPR.format(N="n_docs", df="df", T="t_tok", tf="tf", dl="dl")
            ).alias("s"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.sum("s").alias("bm25_micro"),
            F.count(F.lit(1)).alias("terms_matched"),
        )
        .orderBy(F.desc("bm25_micro"), F.asc(id_col))
        .limit(k)
    )
