"""Text-analysis operators over the ``documents`` table: tokenization,
token statistics, quality scoring, language identification, and
content fingerprinting.

These are the text half of the LLM-training-data operator set (the
reference pipeline has no text surface — SURVEY.md §2.8 "No string
functions" — but a 100 TB data engine needs one; see SURVEY §7
Stage 3).

Everything here is built-in Spark SQL expressions — no Python UDFs.
Per-row text functions run inside whole-stage codegen, so the scan +
tokenize + score pipeline is a single no-shuffle stage that scales
linearly with input splits: at 100 TB these operators are pure map
work, embarrassingly parallel across executors.

Determinism notes (the oracle gate compares value hashes vs DuckDB):
- token split is a single regex on whitespace after trim/lower —
  identical semantics in Spark ``split`` and DuckDB
  ``regexp_split_to_array``;
- all ratios/averages use exact *integer* arithmetic and the half-up
  identity ``round(a/b, d) = (2*a*10^d + b) DIV (2*b) / 10^d`` with
  integer ``DIV`` (never float division + floor, which is off-by-one
  when the true quotient is an exactly-representable integer);
- fingerprints are md5 hex strings (md5 is identical everywhere).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small marker vocabularies for the marker-word language heuristic.
# Real language ID would use a trained model; the engine's contract is
# the *plumbing*: a deterministic per-document classifier expressible
# as vectorized SQL. Markers are common function words per language.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "et", "les", "est"),
    "es": ("el", "la", "y", "los", "es"),
}

ENGLISH_STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "of", "to", "and", "in", "is", "it", "for",
)

# canonical exact-arithmetic builders (see functions/exact.py for the
# full determinism rationale)
from real_time_ride_hailing_data_pipeline_spark.functions.exact import RATIO4  # noqa: E402


def tokens(text_col: str | Column) -> Column:
    """Whitespace tokenization of trimmed, lower-cased text.

    ``split(trim(lower(text)), '\\s+')`` — one codegen'd expression,
    no UDF. Empty text yields a single empty-string token; callers
    that care filter it (the test corpus has no empty documents).
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.trim(F.lower(c)), r"\s+")


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document token statistics: count, distinct count, exact
    4-decimal average token length.

    Token counting is the unit-economics primitive of LLM data work
    (dataset sizing, dedup weighting, pricing). Whitespace tokens here;
    a BPE-ish refinement is ``bpeish_token_count``.
    """
    toks = tokens(text_col)
    base = df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
        .alias("_sum_len"),
    )
    return base.select(
        id_col,
        "n_tokens",
        "n_distinct_tokens",
        F.expr(RATIO4.format(n="_sum_len", d="n_tokens")).alias("avg_token_len"),
    )


def bpeish_token_count(text_col: str | Column) -> Column:
    """Approximate BPE token count: word pieces of <=4 chars.

    A common public heuristic (tokens ~= ceil(chars/4) per word) that
    needs no vocabulary: each whitespace word of length L contributes
    ceil(L/4) = (L+3) DIV 4 tokens. Exact integers, codegen-friendly.
    """
    toks = tokens(text_col)
    # (L+3)/4 in double is exact for word-scale L (quarters are exactly
    # representable); the long cast truncates, i.e. integer DIV.
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + ((F.length(t) + 3) / 4).cast("long"),
    )


def quality_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality signals: length, stopword ratio, mean word
    length, alpha-char ratio — the standard cheap filters applied
    before expensive dedup/training stages.

    All ratios are exact 4-decimal (see module docstring); the whole
    computation is one map-only stage.
    """
    toks = tokens(text_col)
    stop_arr = F.array(*[F.lit(s) for s in ENGLISH_STOPWORDS])
    base = df.select(
        F.col(id_col),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        F.size(toks).cast("long").alias("n_tokens"),
        bpeish_token_count(text_col).alias("n_bpeish_tokens"),
        F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
        .cast("long")
        .alias("_n_stop"),
        F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z]", ""))
        .cast("long")
        .alias("_n_alpha"),
    )
    return base.select(
        id_col,
        "n_chars",
        "n_tokens",
        "n_bpeish_tokens",
        F.expr(RATIO4.format(n="_n_stop", d="n_tokens")).alias("stopword_ratio"),
        F.expr(RATIO4.format(n="_n_alpha", d="n_chars")).alias("alpha_ratio"),
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic marker-word language heuristic.

    Scores each document against per-language function-word sets and
    picks the argmax (first language in LANG_MARKERS order wins ties;
    all-zero scores -> 'und'). Vectorized SQL, no UDF — at scale this
    is a map-only stage over the scan.
    """
    toks = tokens(text_col)

    def _contains(arr):
        # single-arg lambda factory: a 2-arg lambda would be treated by
        # PySpark as the (element, index) variant
        return lambda t: F.array_contains(arr, t)

    score_cols = []
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        score_cols.append(F.size(F.filter(toks, _contains(arr))).alias(f"score_{lang}"))
    scored = df.select(F.col(id_col), *score_cols)
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.lit("und")
    # first-wins tie-break: fold from the last language backwards
    for lang in reversed(langs):
        pred = F.when(F.col(f"score_{lang}") == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best > 0, pred).otherwise(F.lit("und"))
    return scored.select(F.col(id_col), pred.alias("pred_lang"), best.cast("long").alias("marker_hits"))


def word_ngrams(text_col: str, n: int = 2) -> Column:
    """All word n-grams of trimmed lower-cased text, *with*
    multiplicity (contrast ``dedup.word_shingles``, which is distinct
    — set semantics for MinHash). Repetition analysis needs the
    duplicates: they ARE the signal. Map-only.

    Same single-tokenization fold shape as ``dedup.word_shingles``:
    the token array is the aggregate input, so the regex split runs
    once per row instead of once per n-gram index."""
    return F.expr(
        f"aggregate(array(split(trim(lower({text_col})), '\\\\s+')), "
        "  cast(array() as array<string>), "
        f" (acc, toks) -> transform(sequence(1, greatest(size(toks) - {n - 1}, 1)), "
        f"   i -> concat_ws(' ', slice(toks, i, {n}))))"
    )


def repetition_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signals per document: the fraction of
    bigram occurrences covered by the single most frequent bigram
    (``top_bigram_ratio``) and the fraction sitting in any repeated
    bigram (``dup_bigram_ratio``). High values flag boilerplate /
    degenerate generations before training.

    Shape: explode bigrams -> (doc, bigram) count -> per-doc agg.
    Deliberately a two-phase aggregation, NOT an O(len^2) array HOF
    (``filter`` per distinct element): at 100 TB a long document would
    make the per-row HOF quadratic, while explode + partial agg stays
    linear and map-side-combines before the shuffle. Ratios use the
    exact half-up identity (4 decimals).
    """
    bi = (
        df.select(F.col(id_col), F.explode(word_ngrams(text_col, 2)).alias("bigram"))
        .groupBy(id_col, "bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    agg = bi.groupBy(id_col).agg(
        F.sum("cnt").cast("long").alias("_n_bi"),
        F.max("cnt").cast("long").alias("_top_cnt"),
        F.coalesce(
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt"))).cast("long"), F.lit(0).cast("long")
        ).alias("_dup_cnt"),
    )
    return agg.select(
        id_col,
        F.expr(RATIO4.format(n="_top_cnt", d="_n_bi")).alias("top_bigram_ratio"),
        F.expr(RATIO4.format(n="_dup_cnt", d="_n_bi")).alias("dup_bigram_ratio"),
    )


# PII patterns kept to syntax shared by Java regex (Spark) and RE2
# (DuckDB): character classes, bounded repetition — no backrefs or
# lookaround, so the same pattern string is portable across engines.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"
PII_PHONE_RE = r"\+?[0-9][0-9()\-\. ]{7,}[0-9]"


def pii_scrub(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """PII redaction (emails, IPv4 addresses, phone-like digit runs):
    counts each category then replaces matches with typed placeholder
    tokens — the standard scrub pass before text enters a training
    corpus.

    Pure ``regexp_count`` / ``regexp_replace`` column expressions: the
    whole pass is one no-shuffle codegen stage over the scan, linear in
    bytes at any scale. Order matters: emails are redacted before
    phone runs so a phone-like local part can't be double-redacted.
    The sandbox corpus contains no digits or '@' (verified), so the
    registry-level demonstration lives in tests/test_properties.py on
    synthetic rows; this operator is the production surface.
    """
    c = F.col(text_col)
    scrubbed = F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>")
    scrubbed = F.regexp_replace(scrubbed, PII_IPV4_RE, "<IP>")
    scrubbed = F.regexp_replace(scrubbed, PII_PHONE_RE, "<PHONE>")
    return df.select(
        F.col(id_col),
        F.regexp_count(c, F.lit(PII_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(c, F.lit(PII_IPV4_RE)).cast("long").alias("n_ips"),
        F.regexp_count(
            F.regexp_replace(F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>"), PII_IPV4_RE, "<IP>"),
            F.lit(PII_PHONE_RE),
        ).cast("long").alias("n_phones"),
        scrubbed.alias("scrubbed_text"),
    )


def char_shingle_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 8
) -> DataFrame:
    """Rolling-hash document fingerprint: the minimum md5 over all
    k-char shingles (a 1-hash MinHash — the winnowing/fingerprint
    primitive used for near-dup detection and contamination checks).

    ``array_min(transform(sequence(1, len-k+1), i -> md5(substr(text,
    i, k))))`` — O(len) per row, map-only, no shuffle. md5 hex strings
    compare identically across engines.
    """
    fp = F.expr(
        f"array_min(transform(sequence(1, greatest(length({text_col}) - {k - 1}, 1)), "
        f"i -> md5(cast(substr({text_col}, i, {k}) as binary))))"
    )
    return df.select(F.col(id_col), fp.alias("fingerprint"))


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Sliding-window token chunking — the context-window prep step of
    RAG/training pipelines: fixed ``chunk``-token windows starting
    every ``stride`` tokens (overlap = chunk - stride), the final
    window truncated at the document end. Documents shorter than one
    window yield a single chunk.

    Map-only (explode of per-doc window starts), so it scales as pure
    scan work. The chunk content is reported as an md5 digest, not the
    text itself: downstream dedup/Bloom audits want the digest anyway,
    and the shuffle stays ~50 B/row at any chunk size. Same
    single-tokenization fold as word_shingles (the token array binds
    once inside the aggregate lambda; a plain column reference would
    re-split per window through CollapseProject)."""
    structs = F.expr(
        f"aggregate(array(split(trim(lower({text_col})), '\\\\s+')), "
        "  cast(array() as array<struct<s:int,n:int,h:string>>), "
        "  (acc, toks) -> transform("
        f"    sequence(1, greatest(size(toks), 1), {stride}), "
        f"    s -> named_struct("
        f"      's', cast(s as int), "
        f"      'n', cast(least(s + {chunk - 1}, size(toks)) - s + 1 as int), "
        f"      'h', md5(cast(concat_ws(' ', slice(toks, s, "
        f"             least({chunk}, size(toks) - s + 1))) as binary)))))"
    )
    return df.select(F.col(id_col), F.posexplode(structs).alias("chunk_id", "c")).select(
        F.col(id_col),
        F.col("chunk_id").cast("long"),
        F.col("c.s").cast("long").alias("start_token"),
        F.col("c.n").cast("long").alias("chunk_tokens"),
        F.col("c.h").alias("chunk_md5"),
    )


def tfidf_top_terms(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Top-k TF-IDF terms per document — the classic keyword /
    topic-signal extractor (and the exact term-weighting BM25 builds
    on; see search.bm25 for the query-scoring variant).

    score = tf * ln(N/df), reported as a floor-at-1e-6 fixed point
    (``score_micro``) so cross-engine comparison never rides on the
    last ulp of a transcendental: the double quotient N/df is
    IEEE-identical everywhere, ln differs by at most an ulp across
    libm implementations, and the 1e-6 floor absorbs it.

    Plan shape: explode (doc, term) -> grouped tf -> term-keyed
    document-frequency aggregate -> join back on term -> per-doc
    top-k window. The df relation is vocabulary-sized (zipf-bounded,
    far smaller than the corpus); the join is term-keyed with
    fan-out = df per term, i.e. the inverted index itself — no
    all-pairs, no driver collection. N arrives as a broadcast 1-row
    aggregate, not a collected literal.
    """
    from pyspark.sql import Window

    tf = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    tf = tf.cache()  # feeds both the df aggregate and the score join
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    n_docs = df.agg(F.count(F.lit(1)).alias("nd"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score_micro",
            F.floor(
                F.col("tf")
                * F.log(F.col("nd").cast("double") / F.col("doc_freq"))
                * 1000000
            ).cast("bigint"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score_micro").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= k)
        .select(
            id_col,
            "term",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("doc_freq").cast("bigint").alias("doc_freq"),
            "score_micro",
            F.col("term_rank").cast("bigint").alias("term_rank"),
        )
    )


def unigram_surprisal(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document mean unigram surprisal — the CCNet-style language-
    model perplexity proxy (Wenzek et al. 2020 filter Common Crawl by
    LM perplexity; a corpus-unigram model is its simplest honest
    form): rare-token-heavy documents score high, boilerplate scores
    low. token surprisal = ln(N_tokens / count(token)), reported as a
    floor-at-1e-6 fixed point (same ulp-absorbing recipe as
    tfidf_top_terms), mean over the document half-up in exact integer
    arithmetic.

    Plan shape: one explode -> token-keyed frequency aggregate
    (vocabulary-sized) -> token-keyed join back (the inverted index,
    fan-out = token frequency) -> per-doc sum. Corpus totals arrive
    as a broadcast 1-row aggregate; nothing is collected.
    Returns (doc_id, n_tokens, surprisal_micro_mean).
    """
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    tok = tok.cache()  # feeds the frequency aggregate and the score join
    freq = tok.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    totals = tok.agg(F.count(F.lit(1)).alias("n_total"))
    scored = (
        tok.join(freq, "term")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "sp_micro",
            F.floor(
                F.log(F.col("n_total").cast("double") / F.col("cnt")) * 1000000
            ).cast("bigint"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("sp_micro").alias("_sum"),
        )
        .select(
            F.col(id_col),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.expr("CAST((2 * _sum + n_tokens) DIV (2 * n_tokens) AS BIGINT)").alias(
                "surprisal_micro_mean"
            ),
        )
    )


def quality_model_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Model-based quality filtering as a map-only SQL expression —
    the classifier-filter stage of the big pipelines (CCNet's linear
    model, GPT-3's quality classifier), with a FIXED linear model
    over engineered features (the sandbox has no labels to train on;
    the weights are a documented stand-in whose *execution shape* is
    the real thing: batch inference = one codegen'd expression, no
    model server, no UDF).

    Features (exact integers): token count, distinct-token count,
    and type-token ratio in 1e-6 fixed point (half-up).
    logit_micro = (ttr_micro - 460000) + 1000*(n_tokens - 20) — keep
    a document when its vocabulary diversity clears the corpus median
    with a mild length bonus; all bigint arithmetic, so
    keep = logit_micro > 0 is bit-identical in any engine (and
    non-degenerate on the bench corpus: both classes populated).
    Map-only: scales at scan speed. Returns (doc_id, n_tokens,
    n_distinct, ttr_micro, logit_micro, keep).
    """
    toks = tokens(text_col)
    feats = df.select(
        F.col(id_col),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct"),
    ).withColumn(
        "ttr_micro",
        F.expr(
            "CAST((2 * n_distinct * 1000000 + n_tokens) DIV (2 * n_tokens) AS BIGINT)"
        ),
    )
    return feats.select(
        id_col,
        "n_tokens",
        "n_distinct",
        "ttr_micro",
        F.expr(
            "CAST((ttr_micro - 460000) + 1000 * (n_tokens - 20) AS BIGINT)"
        ).alias("logit_micro"),
    ).withColumn("keep", F.col("logit_micro") > 0)
