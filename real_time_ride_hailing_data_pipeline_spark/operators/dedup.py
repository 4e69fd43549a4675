"""Deduplication operators over the ``documents`` table: exact
(hash-groupBy), MinHash-LSH near-dup, SimHash, and n-gram Jaccard.

The dedup half of the LLM-training-data operator set (SURVEY.md §7
Stage 3; absent from the reference pipeline, which deduplicates
nothing). Design rules for the 100 TB target:

- **Never all-pairs.** Candidate generation is always a *bucket join*:
  documents only meet if they share an LSH band hash (MinHash), a
  SimHash segment, or a bucketing key. All-pairs O(n^2) similarity is
  banned; the brute Jaccard verifier below is only ever applied to the
  candidate set, and the one exact all-pairs oracle query runs inside
  small per-source partitions.
- **No Python in the hot path.** Shingling, hashing, signatures and
  band extraction are Spark SQL higher-order functions (codegen'd,
  map-only). The only shuffles are the bucket groupBys/joins, which
  carry (hash, doc_id) pairs — a few dozen bytes per row regardless
  of document size.
- **Deterministic hash family.** MinHash permutations are simulated
  with md5(seed || shingle) — stable across runs, engines, and
  partitionings (unlike xxhash64 seeds or rand()), so re-runs and
  oracles agree bit-for-bit.
- **Skew guard.** A degenerate band value (e.g. many near-empty docs
  sharing a signature) creates a hot bucket; ``lsh_candidate_pairs``
  caps bucket size and AQE skew-join handles residual imbalance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_text(text_col: str | Column) -> Column:
    """Canonical form for exact dedup: lower-case, trim, collapse
    internal whitespace. Map-only expression."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact deduplication by normalized-content hash: keep the lowest
    id per distinct content, report the copy count.

    One hash-groupBy: the shuffle carries (md5, id) — 48 bytes/row at
    any document size, so this scales to 100 TB as a cheap shuffle of
    ~n * 50 B. Returns (kept doc_id, content_hash, n_copies).
    """
    h = F.md5(normalize_text(text_col).cast("binary")).alias("content_hash")
    return (
        df.select(F.col(id_col), h)
        .groupBy("content_hash")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
        .select(id_col, "content_hash", "n_copies")
    )


def word_shingles(text_col: str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of trimmed lower-cased text.

    Pure SQL, map-only. Documents shorter than n words yield their
    full token string as the single shingle.

    Shaped so the regex tokenization runs ONCE per row: the token
    array is the *input* of a single-element ``aggregate`` fold and
    both references inside the lambda bind to the lambda variable.
    Writing ``slice(split(...), i, n)`` directly would re-evaluate the
    split for EVERY index i (HOF lambda bodies are interpreted, and
    CollapseProject inlines a separate token column right back in) —
    measured 2.5 s -> 0.4 s at bench scale for the shingle pipeline.
    """
    return F.expr(
        f"array_distinct(aggregate(array(split(trim(lower({text_col})), '\\\\s+')), "
        "  cast(array() as array<string>), "
        f" (acc, toks) -> transform(sequence(1, greatest(size(toks) - {n - 1}, 1)), "
        f"   i -> concat_ws(' ', slice(toks, i, {n})))))"
    )


def _minhash_seeds(num_hashes: int) -> list[int]:
    """Fixed 60-bit seeds, one per simulated permutation (md5-derived,
    so stable across processes/engines)."""
    import hashlib

    return [
        int.from_bytes(hashlib.md5(f"mh:{i}".encode()).digest()[:8], "big") >> 4
        for i in range(num_hashes)
    ]


def minhash_signature(shingle_col: str, num_hashes: int = 32) -> Column:
    """MinHash signature from ONE md5 per shingle: the 60-bit digest x
    is re-keyed per permutation i as ``mix(x XOR seed_i)`` (fixed
    random seeds + two xorshift rounds); signature[i] = min over
    shingles.

    Why this exact shape:
    - one digest per shingle: the naive md5(i||s) family costs
      num_hashes x |shingles| digests/doc and measured 202 s at bench
      scale (this form: seconds);
    - seeds + NONLINEAR mixing, not affine ``a + i*b``
      (Kirsch-Mitzenmacher): affine per-i hashes are order-correlated
      — the shingle with the minimal base value tends to win *every*
      permutation, so one differing shingle flips many signature
      positions together and true near-dup pairs get missed
      (observed: a j=0.9 pair lost all 16 bands). Xorshift rounds are
      a 64-bit bijection, so each seed yields an effectively
      independent ordering;
    - all xor/shift bigint ops: deterministic everywhere, no
      multiplication (no ANSI overflow), HOF-interpreter cheap;
    - single ``aggregate`` fold with the digest array as *input*:
      anything inside the per-hash lambda is re-evaluated per hash by
      the interpreter, and CollapseProject would inline a separate
      column right back in — as fold input the digests run once.
    """
    seeds = ", ".join(f"cast({s} as bigint)" for s in _minhash_seeds(num_hashes))
    xvals = (
        f"transform(transform({shingle_col}, s -> md5(cast(s as binary))), "
        "h -> cast(conv(substr(h, 1, 15), 16, 10) as bigint))"
    )

    def _xs(v: str, shift: int, left: bool) -> str:
        op = "shiftleft" if left else "shiftright"
        return f"(({v}) ^ {op}(({v}), {shift}))"

    mixed = _xs(_xs("x ^ s", 13, True), 7, False)
    return F.expr(
        f"aggregate({xvals}, "
        f"  transform(sequence(1, {num_hashes}), i -> cast(9223372036854775807 as bigint)), "
        f"  (acc, x) -> zip_with(acc, array({seeds}), "
        f"    (m, s) -> least(m, {mixed})))"
    )


def lsh_band_hashes(signature_col: str, bands: int, rows_per_band: int) -> Column:
    """Split a MinHash signature into ``bands`` bands of
    ``rows_per_band`` values; hash each band to one md5.

    Two documents become candidates iff they agree on *all* rows of at
    least one band — the standard S-curve: P(candidate) =
    1 - (1 - j^rows)^bands for Jaccard j.
    """
    return F.expr(
        f"transform(sequence(0, {bands - 1}), "
        f"  b -> md5(cast(concat_ws('|', slice({signature_col}, b * {rows_per_band} + 1, "
        f"       {rows_per_band})) as binary)))"
    )


def _band_pairs_from_shingles(
    sh_df: DataFrame,
    id_col: str = "doc_id",
    shingle_col: str = "sh",
    num_hashes: int = 32,
    bands: int = 16,
    max_bucket: int = 1000,
) -> DataFrame:
    """Band-sharing (doc_a < doc_b) pairs from a PRE-SHINGLED relation
    — the candidate core of :func:`minhash_lsh_candidates`, factored
    out so callers that already hold (and cache) the shingle relation
    (e.g. the containment pre-screen) don't tokenize twice."""
    rows_per_band = num_hashes // bands
    sigs = sh_df.select(
        F.col(id_col), minhash_signature(shingle_col, num_hashes).alias("sig")
    )
    banded = sigs.select(
        F.col(id_col),
        F.posexplode(lsh_band_hashes("sig", bands, rows_per_band)).alias(
            "band_idx", "band_hash"
        ),
    )
    # feeds three plan branches (bucket sizing + both join sides)
    banded = banded.cache()
    bucket_sizes = banded.groupBy("band_idx", "band_hash").agg(
        F.count(F.lit(1)).alias("bucket_n")
    )
    banded = banded.join(
        bucket_sizes.filter(F.col("bucket_n") <= max_bucket),
        ["band_idx", "band_hash"],
    )
    left = banded.select(
        F.col("band_idx"), F.col("band_hash"), F.col(id_col).alias("doc_a")
    )
    right = banded.select(
        F.col("band_idx"), F.col("band_hash"), F.col(id_col).alias("doc_b")
    )
    return (
        left.join(right, ["band_idx", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 32,
    bands: int = 16,
    max_bucket: int = 1000,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate candidate pairs via MinHash-LSH bucket join.

    Pipeline: shingle -> signature (map-only) -> explode band hashes ->
    self-join *within* (band_idx, band_hash) buckets -> distinct
    (a < b) pairs. The join key is the band hash, so candidate
    generation is O(sum over buckets of bucket^2) — at scale the
    bucket sizes are tiny for honest data; ``max_bucket`` drops
    degenerate buckets (a bucket of 10^6 identical boilerplate docs is
    better handled by exact dedup first, and dropping it bounds the
    worst case). Returns (doc_a, doc_b) with doc_a < doc_b.

    Default banding 16 bands x 2 rows: candidate probability
    1-(1-j^2)^16 — recall ~1-2e-12 at j=0.9, ~0.99 at j=0.5, while a
    background pair (j ~ 0.02) needs two simultaneous minhash
    collisions per band, keeping false candidates negligible. (8x4
    banding measurably missed a true j~0.9 pair on the test corpus.)

    ``shingles``: optional pre-computed ``(id_col, "sh")`` relation
    (r13, guide §1.2 — don't compute things twice): a composed
    candidates→verify pipeline shingles the corpus ONCE, caches it,
    and passes it here AND to :func:`jaccard_verify`; the interpreted
    tokenize+shingle fold is the map-side cost of this pipeline, so
    running it once, not twice, is a direct win at any scale.
    """
    sh = (
        shingles
        if shingles is not None
        else df.select(
            F.col(id_col), word_shingles(text_col, shingle_n).alias("sh")
        )
    )
    return _band_pairs_from_shingles(
        sh,
        id_col=id_col,
        shingle_col="sh",
        num_hashes=num_hashes,
        bands=bands,
        max_bucket=max_bucket,
    )


def prefix_filter_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.5,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """EXACT n-gram Jaccard candidate pairs via prefix filtering
    (Bayardo, Ma, Srikant — "Scaling Up All Pairs Similarity Search",
    WWW'07; Chaudhuri et al. SSJoin): unlike MinHash-LSH this loses no
    true pair, so the downstream verify reproduces the all-pairs
    ground truth exactly.

    Theory: for Jaccard >= t, overlap i >= t/(1+t) * (|A|+|B|) >=
    m(A) := ceil(t/(1+t) * |A|). Order every document's shingles by a
    GLOBAL total order (ascending document frequency, rarest first —
    ties broken by the shingle string); if a pair's overlap is >= m(A),
    its shared shingles cannot all sit in A's last m(A)-1 positions, so
    the pair must share an element inside each side's first
    |s| - m(s) + 1 shingles (the "prefix"). Joining prefixes only is
    therefore lossless while skipping the flood of pairs that share
    nothing but ultra-common shingles.

    Scale shape: one explode (shingle, id) shuffle ~50 B/row, one
    groupBy for document frequencies, a per-document window sort
    (partitioned by doc — bounded group size), then a self-join on
    rare-leaning prefix shingles. No all-pairs stage anywhere; the
    frequency-ascending order makes hot buckets structurally rare
    (common shingles land in suffixes and never join).

    ``shingles``: optional pre-computed ``(id_col, "sh")`` relation —
    same contract as :func:`minhash_lsh_candidates` (a composed
    candidates→verify pipeline tokenizes once).
    """
    sh = (
        shingles
        if shingles is not None
        else df.select(
            F.col(id_col), word_shingles(text_col, shingle_n).alias("sh")
        )
    )
    # tot rides the array size computed BEFORE the explode — one window
    # pass (the df-ordered row_number) instead of two
    ex = sh.select(
        F.col(id_col), F.size("sh").alias("tot"), F.explode("sh").alias("shingle")
    )
    dfreq = ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_"))
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy("df_", "shingle")
    # m = ceil(t/(1+t) * tot) via exact integer arithmetic; prefix
    # length p = tot - m + 1. threshold is a ratio p/q in lowest terms.
    from fractions import Fraction

    frac = Fraction(threshold).limit_denominator(10_000)
    tn, td = frac.numerator, frac.denominator  # t = tn/td
    # ceil(tn*tot / (tn+td)) = (tn*tot + tn+td - 1) div (tn+td)
    prefix = (
        ex.join(dfreq, "shingle")
        .withColumn("rn", F.row_number().over(w))
        .withColumn(
            "m",
            F.expr(f"cast(({tn} * tot + {tn + td} - 1) div ({tn + td}) as int)"),
        )
        .filter(F.col("rn") <= F.col("tot") - F.col("m") + 1)
        .select(F.col(id_col), "shingle", "rn", "tot")
    )
    # the prefix (the shingle inverted index) feeds both self-join
    # sides; cache it so the explode + document-frequency join + window
    # pipeline runs once, not twice. At 100 TB this materialized index
    # is (shingle, id, pos) rows — ~50 B/row, small next to the corpus,
    # and exactly what a production similarity-join materializes anyway.
    prefix = prefix.cache()
    left = prefix.select(
        "shingle",
        F.col(id_col).alias("doc_a"),
        F.col("rn").alias("rn_a"),
        F.col("tot").alias("tot_a"),
    )
    right = prefix.select(
        "shingle",
        F.col(id_col).alias("doc_b"),
        F.col("rn").alias("rn_b"),
        F.col("tot").alias("tot_b"),
    )
    # PPJoin positional filter (Xiao, Wang, Lin, Yu — "Efficient
    # Similarity Joins for Near Duplicate Detection", WWW'08), still
    # exact: a shared prefix token at positions (rn_a, rn_b) can
    # witness an overlap of at most 1 + min(tot_a - rn_a,
    # tot_b - rn_b), which must reach the pair's required overlap
    # alpha = ceil(t/(1+t) * (tot_a + tot_b)). For a true pair the
    # FIRST shared token (minimal positions both sides) satisfies the
    # bound, so keeping pairs where ANY matched row passes loses
    # nothing — while pruning the flood of pairs that share only
    # deep-prefix tokens (prefix filtering alone is weak at moderate
    # thresholds like 0.5: measured 607k -> 125k candidates on the
    # 5k-doc bench corpus).
    alpha = F.expr(
        f"cast(({tn} * (tot_a + tot_b) + {tn + td} - 1) div ({tn + td}) as int)"
    )
    # NOT applied — the Bayardo/Arasu LENGTH bound (J >= t forces
    # td*min(|A|,|B|) >= tn*max): measured r14 on the sf1 planted
    # corpus it pruned EXACTLY ZERO of the 16.4M positionally-filtered
    # join rows (duplicate clusters are same-length replicas) while
    # costing a consistent ~15% of entry wall (4 interleaved A/B runs,
    # 47.9/53.6 s vs 40.3/46.5 s) — and the positional filter already
    # dominates it wherever sizes diverge enough for it to fire
    # (min(tot)-rn <= min(tot), so any pair failing the length bound
    # with a shallow prefix match usually fails the positional bound
    # too). Evidence in OPTIMIZATION_r14.md §7.
    return (
        left.join(right, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(
            1 + F.least(F.col("tot_a") - F.col("rn_a"), F.col("tot_b") - F.col("rn_b"))
            >= alpha
        )
        .select("doc_a", "doc_b")
        .distinct()
    )


def jaccard_verify(
    candidates: DataFrame,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.5,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard on candidate pairs only.

    Joins the shingle arrays back onto the (already sparse) candidate
    set and computes |A∩B| / |A∪B| with exact integer sizes; the
    4-decimal value uses the half-up integer identity so it matches
    any decimal-arithmetic oracle. Never run this on all pairs.

    ``shingles``: optional pre-computed (and caller-cached)
    ``(id_col, "sh")`` relation shared with the candidate generator —
    the whole pipeline then tokenizes the corpus exactly once.
    """
    if shingles is not None:
        sh = shingles
    else:
        sh = df.select(
            F.col(id_col), word_shingles(text_col, shingle_n).alias("sh")
        )
        # feeds both pair sides: cache so shingling runs once
        sh = sh.cache()
    a = sh.select(F.col(id_col).alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("long")
    union = (F.size("sh_a") + F.size("sh_b")).cast("long") - inter
    joined = (
        candidates.join(a, "doc_a")
        .join(b, "doc_b")
        .select("doc_a", "doc_b", inter.alias("_i"), union.alias("_u"))
    )
    # exact half-up 4-decimal Jaccard via integer DIV (never float+floor);
    # cast: SQL `10000.0` is a decimal literal, result must stay double
    return joined.select(
        "doc_a",
        "doc_b",
        F.expr(
            "cast(((2 * _i * 10000 + _u) DIV (2 * _u)) / 10000.0 as double)"
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


def simhash64(text_col: str, id_col: str = "doc_id") -> Column:
    """60-bit SimHash over whitespace tokens.

    Each token hashes to 60 bits (15 md5 hex nibbles); bit b of the
    fingerprint is 1 iff more tokens have bit b set than unset.
    Expressed entirely in SQL: per bit, sum +/-1 over tokens of
    (nibble >> (b % 4)) & 1. Map-only per document; near-dup docs
    differ in few bits (Hamming distance).

    Nibbles are decoded with instr('0123456789abcdef', ch) - 1 (no
    hex-literal casts, portable to any oracle dialect).

    Shaped so each token is digested ONCE: the md5 array is the input
    of the bit-vote ``aggregate`` (HOF bodies are interpreted — a
    digest inside the per-bit lambda would run 60x per token; this
    form measured 8.2 s -> <1 s at bench scale).
    """
    hashes = (
        f"transform(array_distinct(split(trim(lower({text_col})), '\\\\s+')), "
        "t -> md5(cast(t as binary)))"
    )
    # bit b lives in hex nibble (b DIV 4) (0-indexed from the left of
    # the 15-nibble prefix), at position (b % 4) inside the nibble;
    # one fold over tokens accumulates all 60 +/-1 votes at once.
    votes = (
        f"aggregate({hashes}, "
        "  transform(sequence(0, 59), b -> cast(0 as bigint)), "
        "  (acc, h) -> zip_with(acc, sequence(0, 59), "
        "    (s, b) -> s + 2 * (((instr('0123456789abcdef', "
        "         substr(h, cast(b div 4 as int) + 1, 1)) - 1) "
        "         div shiftleft(cast(1 as bigint), cast(b % 4 as int))) % 2) - 1))"
    )
    return F.expr(
        f"aggregate(zip_with({votes}, sequence(0, 59), "
        "  (s, b) -> case when s > 0 then shiftleft(cast(1 as bigint), cast(b as int)) "
        "            else cast(0 as bigint) end), "
        "cast(0 as bigint), (acc, v) -> acc + v)"
    )


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Connected components over an undirected edge list by min-label
    propagation: every node's label converges to the smallest node id
    reachable from it. Returns ``(node, comp)``.

    This is the step that turns near-duplicate PAIRS into a
    deduplicated corpus: docs sharing a component are one duplicate
    cluster, and ``comp`` (the min doc_id) is the canonical
    representative to keep.

    Scale: each round is one shuffle-join on node id plus a grouped
    min — all DataFrame ops, AQE-planned; ``labels`` is cached and the
    previous round unpersisted, and the loop exits as soon as a round
    changes nothing. Rounds needed = graph diameter; near-dup clusters
    are overwhelmingly tiny cliques (diameter 1-2), so 2-3 rounds
    close a 100 TB corpus. For adversarially long path graphs the
    large-star/small-star alternation (Kiveris et al., "Connected
    Components in MapReduce and Beyond") halves rounds with the same
    join primitives — not needed for dedup-shaped graphs. Past
    ``checkpoint_every`` rounds the label relation is additionally
    ``localCheckpoint``-ed so a high-diameter run's PLAN stays bounded
    too (cache bounds re-execution, not lineage depth) — same policy
    as graph.pagerank_fixed_point, VERDICT r4 item 4.
    """
    sym = edges.select(
        F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b")
    )
    sym = sym.unionByName(
        sym.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    sym.cache()
    # fused round 0: comp = min(node, direct neighbors) needs only a
    # groupBy (labels are still identity — the first join round of the
    # generic loop would compute exactly this, one shuffle cheaper here)
    labels = (
        sym.groupBy("a")
        .agg(F.least(F.col("a"), F.min("b")).alias("comp"))
        .withColumnRenamed("a", "node")
    )
    labels.cache()
    for i in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("comp").alias("nbr_comp"))
            .withColumnRenamed("a", "node")
        )
        stepped = labels.join(nbr_min, "node", "left").select(
            "node",
            F.least(F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))).alias("comp"),
            (F.col("nbr_comp") < F.col("comp")).alias("changed"),
        )
        stepped.cache()
        n_changed = stepped.filter("changed").count()
        labels.unpersist()
        labels = stepped.select("node", "comp")
        if n_changed == 0:
            break
        if (i + 1) % checkpoint_every == 0 and (i + 1) < max_iter:
            # no benefit checkpointing after the last stepped round
            # (same guard as graph.pagerank_fixed_point)
            labels = labels.localCheckpoint(eager=True)
    sym.unpersist()
    return labels


def positional_shingles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 8
) -> DataFrame:
    """(id, pos, shingle-md5) for every position-anchored n-token
    shingle — the input relation of exact substring-duplication
    analysis. ``pos`` is the 1-based token index of the shingle start.

    Same single-tokenization fold as ``word_shingles`` (the token
    array binds to the lambda variable so the regex split runs once
    per row); shingles are shipped as md5 digests, not token strings,
    so downstream shuffles carry ~45 B/row regardless of n. Documents
    shorter than n tokens contribute no rows (guarded CASE — Spark's
    ``sequence(1, 0)`` would count *down*, not produce empty)."""
    shingled = F.expr(
        f"aggregate(array(split(trim(lower({text_col})), '\\\\s+')), "
        "  cast(array() as array<string>), "
        "  (acc, toks) -> case "
        f"    when size(toks) >= {n} then transform(sequence(1, size(toks) - {n - 1}), "
        f"      i -> md5(concat_ws(' ', slice(toks, i, {n})))) "
        "    else cast(array() as array<string>) end)"
    )
    return df.select(
        F.col(id_col), F.posexplode(shingled).alias("pos0", "sh")
    ).select(F.col(id_col), (F.col("pos0") + 1).alias("pos"), "sh")


def substring_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_span: int = 16,
    max_freq: int = 20,
) -> DataFrame:
    """Maximal cross-document duplicated substrings of >= ``min_span``
    tokens — the exact-substring view of training-data duplication
    (the suffix-array method of Lee et al., "Deduplicating Training
    Data Makes Language Models Better", re-expressed relationally).

    Position-anchored n-token shingles match across documents; runs of
    consecutive matches on the same alignment diagonal (pa - pb
    constant) consolidate into one span via gaps-and-islands. A span
    of L >= n duplicated tokens appears as L - n + 1 consecutive
    shingle matches, so the reported span length is exact, not an
    n-gram approximation.

    Scale path (100 TB): positions with corpus frequency outside
    [2, max_freq] are dropped *before* the self-join — singletons
    can't form pairs (at real-corpus duplication rates this kills
    ~95% of rows), and boilerplate shingles above max_freq would
    square the join fan-out (documented approximation, mirrored in
    the oracle). The join shuffles (md5, id, pos) rows only; island
    windows partition by (doc pair, diagonal) — bounded by the
    shorter document, never corpus-sized.
    """
    from pyspark.sql import Window

    sh = positional_shingles(df, text_col, id_col, n)
    # Frequency band via a window count, not groupBy + join-back: the
    # shingle pipeline (tokenize + per-position md5) evaluates ONCE,
    # in the single shuffle that also co-locates equal digests for the
    # self-join (a groupBy branch would re-scan the corpus — measured
    # 4 scans / 8.8 s -> 1 scan at sf0.01 before this shape).
    el = (
        sh.withColumn("c", F.count(F.lit(1)).over(Window.partitionBy("sh")))
        .filter((F.col("c") >= 2) & (F.col("c") <= max_freq))
        .drop("c")
    )
    # the banded relation feeds both sides of the self-join; cache so
    # the scan+shuffle pipeline above runs once (same lesson as the
    # LSH banded relation, dedup.py:minhash_lsh_candidates)
    el = el.cache()
    left = el.select(
        F.col("sh"), F.col(id_col).alias("doc_a"), F.col("pos").alias("pa")
    )
    right = el.select(
        F.col("sh"), F.col(id_col).alias("doc_b"), F.col("pos").alias("pb")
    )
    pairs = (
        left.join(right, "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "pa", "pb")
    )
    w = Window.partitionBy("doc_a", "doc_b", F.col("pa") - F.col("pb")).orderBy("pa")
    islands = pairs.withColumn("grp", F.col("pa") - F.row_number().over(w))
    return (
        islands.groupBy("doc_a", "doc_b", F.col("pa") - F.col("pb"), "grp")
        .agg(
            F.min("pa").alias("start_a"),
            F.min("pb").alias("start_b"),
            (F.max("pa") - F.min("pa") + n).alias("span_tokens"),
        )
        .filter(F.col("span_tokens") >= min_span)
        .select("doc_a", "doc_b", "start_a", "start_b", "span_tokens")
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
    prescreen: str | None = None,
) -> DataFrame:
    """EXACT asymmetric near-dup join by shingle CONTAINMENT
    |A∩B| / min(|A|,|B|) — the measure that catches a short document
    embedded inside a longer one, which symmetric Jaccard structurally
    misses (a 100-shingle doc fully contained in a 10k-shingle doc has
    Jaccard ~0.01 but containment 1.0).

    Candidate generation is the asymmetric form of prefix filtering
    (Bayardo et al. WWW'07, as in :func:`prefix_filter_candidates`):
    containment >= t constrains overlap against the SMALLER side only
    (overlap >= m(S) := ceil(t·|S|)), so the smaller document's
    frequency-ascending prefix (its |S| - m(S) + 1 rarest shingles)
    must contain a shared shingle — joined against the FULL inverted
    index on the other side, because the larger document is
    unconstrained. Lossless: no true pair is missed, unlike the
    rare-shingle df-cap heuristic this replaces (which also degenerated
    toward all-pairs: measured 1.13M candidates on the 5k-doc bench
    corpus). The PPJoin positional filter applies on both matched
    positions — a shared token at (rn_a, rn_b) witnesses overlap of at
    most 1 + min(tot_a - rn_a, tot_b - rn_b), which must reach
    m(smaller) — pruning pairs that share only deep-prefix tokens.

    Scale shape: one explode (shingle, id) shuffle ~50 B/row, one
    document-frequency aggregate, a per-document window sort, then a
    prefix×index join whose fan-out rides the posting lists of each
    document's RAREST shingles only; exact verification
    (array_intersect) runs on the surviving sparse candidate set.

    ``prescreen="minhash"`` (VERDICT r12 item 3): on DUPLICATE-
    DEGENERATE corpora (most docs inside near-dup clusters) the exact
    prefix filter loses selectivity — cluster members share their rare
    shingles, so the prefix×index fan-out and the distinct over it
    approach all-cluster-pairs (measured: the 379 s sf1 outlier).
    The screened mode generates candidates from the MinHash band join
    instead (bounded per bucket by ``max_bucket``, candidate volume
    ~band collisions, never posting-list-quadratic) and runs the SAME
    exact containment verify on them — the standard lossy-screen +
    exact-verify composition (PPJoin+ family). The screen bounds
    RECALL, not precision: every reported pair is still exactly
    verified; a true pair is kept iff it shares a band, probability
    1-(1-j^2)^16 in its symmetric Jaccard j (≥0.99 at j≥0.5 — the
    regime degenerate clusters live in; a low-Jaccard pure-containment
    pair, short-doc-in-long, can be missed). The exact default stays
    the oracle twin: tests pin that the screened output equals the
    exact output on the test corpora.
    """
    from fractions import Fraction

    from pyspark.sql import Window

    sh = df.select(
        F.col(id_col), word_shingles(text_col, shingle_n).alias("sh")
    )
    sh = sh.cache()  # feeds the index build and both verify sides
    frac = Fraction(threshold).limit_denominator(10_000)
    tn, td = frac.numerator, frac.denominator  # t = tn/td
    if prescreen == "minhash":
        cands = _band_pairs_from_shingles(sh, id_col=id_col, shingle_col="sh")
    elif prescreen is not None:
        raise ValueError(f"unknown prescreen {prescreen!r}")
    else:
        # tot rides the array size computed BEFORE the explode — one
        # window pass (the df-ordered row_number) instead of two
        ex = sh.select(
            F.col(id_col),
            F.size("sh").alias("tot"),
            F.explode("sh").alias("shingle"),
        )
        dfreq = ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_"))
        w = Window.partitionBy(id_col).orderBy("df_", "shingle")
        indexed = (
            ex.join(dfreq, "shingle")
            .withColumn("rn", F.row_number().over(w))
            .select(F.col(id_col), "shingle", "rn", "tot")
        )
        indexed = indexed.cache()  # prefix side is a filter of this index
        # m(S) = ceil(t·tot) = (tn*tot + td - 1) div td; prefix = tot - m + 1
        prefix = indexed.filter(
            F.col("rn")
            <= F.col("tot")
            - F.expr(f"cast(({tn} * tot + {td} - 1) div {td} as int)")
            + 1
        )
        left = prefix.select(
            "shingle",
            F.col(id_col).alias("doc_a"),
            F.col("rn").alias("rn_a"),
            F.col("tot").alias("tot_a"),
        )
        right = indexed.select(
            "shingle",
            F.col(id_col).alias("doc_b"),
            F.col("rn").alias("rn_b"),
            F.col("tot").alias("tot_b"),
        )
        # orient so the prefix side is the min-size side (ties by id —
        # for equal sizes both prefixes must witness, either suffices)
        smaller_first = (F.col("tot_a") < F.col("tot_b")) | (
            (F.col("tot_a") == F.col("tot_b")) & (F.col("doc_a") < F.col("doc_b"))
        )
        m_small = F.expr(f"cast(({tn} * tot_a + {td} - 1) div {td} as int)")
        cands = (
            left.join(right, "shingle")
            .filter(smaller_first)
            .filter(
                1
                + F.least(
                    F.col("tot_a") - F.col("rn_a"), F.col("tot_b") - F.col("rn_b")
                )
                >= m_small
            )
            .select(
                F.least("doc_a", "doc_b").alias("doc_a"),
                F.greatest("doc_a", "doc_b").alias("doc_b"),
            )
            .distinct()
        )
    a = sh.select(F.col(id_col).alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("long")
    msize = F.least(F.size("sh_a"), F.size("sh_b")).cast("long")
    frac = Fraction(threshold).limit_denominator(10_000)
    tn, td = frac.numerator, frac.denominator
    joined = (
        cands.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            inter.alias("overlap"),
            msize.alias("min_size"),
        )
    )
    # containment >= tn/td  <=>  td*overlap >= tn*min_size (exact ints)
    return (
        joined.filter(F.col("overlap") * td >= F.col("min_size") * tn)
        .select(
            "doc_a",
            "doc_b",
            "overlap",
            "min_size",
            F.expr(
                "cast(((2 * overlap * 10000 + min_size) DIV (2 * min_size)) / 10000.0 "
                "as double)"
            ).alias("containment"),
        )
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    key_len: int = 24,
    bucket_len: int = 4,
    window: int = 2,
    min_jaccard: float = 0.2,
) -> DataFrame:
    """Sorted-Neighborhood Method (Hernández & Stolfo, SIGMOD'95)
    dedup: sort records by a blocking key (normalized text prefix),
    compare each record only to its `window` successors in sort
    order, score candidate pairs by exact token-set Jaccard.

    The classic complement to hash blocking: O(n·w) comparisons with
    a data-independent bound (LSH/prefix-filter costs depend on
    shingle statistics), catching near-dups whose edits sit past the
    blocking prefix. Distribution shape: the sort key's leading
    `bucket_len` chars are the shuffle partition, the full key orders
    WITHIN each partition — so the window comparison runs in
    parallel per bucket with no global single-partition sort (the
    textbook single total order is the non-scalable form; bucketed
    SNM is how it shards, at the cost of missing pairs that straddle
    a bucket boundary with different leading chars — which the key
    construction makes near-dup-unlikely).
    """
    from pyspark.sql import Window

    key = F.substring(normalize_text(text_col), 1, key_len)
    toks = F.array_distinct(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
    base = df.select(
        F.col(id_col), key.alias("snm_key"), toks.alias("toks")
    )
    w = Window.partitionBy(F.substring("snm_key", 1, bucket_len)).orderBy(
        "snm_key", id_col
    )
    lead_cols = []
    for i in range(1, window + 1):
        lead_cols.append(F.lead(id_col, i).over(w).alias(f"nb_{i}"))
    nb = base.select(F.col(id_col).alias("doc_a"), F.col("toks").alias("toks_a"), *lead_cols)
    pair_frames = [
        nb.filter(F.col(f"nb_{i}").isNotNull()).select(
            "doc_a", F.col(f"nb_{i}").alias("doc_b"), "toks_a"
        )
        for i in range(1, window + 1)
    ]
    pairs = pair_frames[0]
    for p in pair_frames[1:]:
        pairs = pairs.unionByName(p)
    b = base.select(F.col(id_col).alias("doc_b"), F.col("toks").alias("toks_b"))
    inter = F.size(F.array_intersect("toks_a", "toks_b")).cast("long")
    union = (F.size("toks_a") + F.size("toks_b")).cast("long") - inter
    from fractions import Fraction

    frac = Fraction(min_jaccard).limit_denominator(10_000)
    tn, td = frac.numerator, frac.denominator
    joined = pairs.join(b, "doc_b").select(
        "doc_a", "doc_b", inter.alias("overlap"), union.alias("usize")
    )
    return (
        joined.filter(F.col("overlap") * td >= F.col("usize") * tn)
        .select(
            "doc_a",
            "doc_b",
            "overlap",
            "usize",
            F.expr(
                "cast(((2 * overlap * 10000 + usize) DIV (2 * usize)) / 10000.0 "
                "as double)"
            ).alias("jaccard"),
        )
    )


def edit_distance_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    key_len: int = 24,
    bucket_len: int = 4,
    window: int = 2,
    max_distance: int = 40,
) -> DataFrame:
    """Character-exact edit-distance verify tier over sorted-
    neighborhood blocking: each document is compared to its `window`
    successors in normalized-prefix sort order, and candidate pairs
    are verified with a BANDED Levenshtein bounded by `max_distance`.

    Spark's three-argument ``levenshtein(l, r, threshold)`` runs the
    banded O(threshold * n) dynamic program and returns -1 once the
    distance provably exceeds the band — so the per-pair verify cost
    is bounded by the threshold, not by the O(n*m) full-matrix cost
    of the two-argument form. That bound is what makes a
    character-exact tier (catching single-character edits that
    token-set Jaccard scores as identical and shingle methods blur)
    affordable at corpus scale.

    Distribution shape: the blocking key's leading `bucket_len` chars
    are the shuffle partition, the full key orders within each bucket,
    and the neighbor's (id, text) rides the same window (``lead``) so
    the verify is join-free. The `window` neighbor slots are emitted as
    ONE array-of-structs column and exploded, rather than unioned
    per-slot frames (the sorted_neighborhood_pairs form) — a union of
    filters over a window re-plans the scan+Exchange+Sort+Window chain
    per branch, while the explode keeps the whole tier to exactly one
    Exchange and one Window node (pinned in test_plans.py).

    Output: (doc_a, doc_b, edit_distance, sim) where sim is a
    fixed-point similarity 1 - d/maxlen at 1e-4, computed in integer
    arithmetic so it hashes identically across engines.
    """
    from pyspark.sql import Window

    norm = normalize_text(text_col)
    base = df.select(
        F.col(id_col),
        F.substring(norm, 1, key_len).alias("snm_key"),
        norm.alias("norm_text"),
    )
    w = Window.partitionBy(F.substring("snm_key", 1, bucket_len)).orderBy(
        "snm_key", id_col
    )
    neighbors = F.array(
        *[
            F.struct(
                F.lead(id_col, i).over(w).alias("doc_b"),
                F.lead("norm_text", i).over(w).alias("text_b"),
            )
            for i in range(1, window + 1)
        ]
    )
    nb = base.select(
        F.col(id_col).alias("doc_a"),
        F.col("norm_text").alias("text_a"),
        neighbors.alias("nbs"),
    )
    pairs = (
        nb.select("doc_a", "text_a", F.explode("nbs").alias("nb"))
        .filter(F.col("nb.doc_b").isNotNull())
        .select(
            "doc_a",
            F.col("nb.doc_b").alias("doc_b"),
            "text_a",
            F.col("nb.text_b").alias("text_b"),
        )
    )
    dist = F.levenshtein("text_a", "text_b", max_distance)
    maxlen = F.greatest(F.length("text_a"), F.length("text_b"))
    return (
        pairs.select("doc_a", "doc_b", dist.alias("edit_distance"), maxlen.alias("_ml"))
        .filter(F.col("edit_distance") >= 0)
        .select(
            "doc_a",
            "doc_b",
            F.col("edit_distance").cast("long").alias("edit_distance"),
            # _ml = 0 means BOTH texts normalized to empty (distance 0,
            # identical): sim is 1.0 by definition — without the guard
            # the DIV raises DIVIDE_BY_ZERO under Spark 4's ANSI mode
            F.expr(
                "cast(CASE WHEN _ml = 0 THEN 1.0 ELSE "
                "((10000 * (_ml - edit_distance)) DIV _ml) / 10000.0 END "
                "as double)"
            ).alias("sim"),
        )
    )
