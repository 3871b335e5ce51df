"""[EXT] Deduplication operators over the ``documents`` table.

Four strategies, all Spark-native and all candidate-pair-bounded (no
all-pairs cross join anywhere — the cardinal 100 TB rule):

* **exact**: md5 content hash, keep min doc_id per hash. One shuffle.
* **n-gram Jaccard**: inverted-index self-join on shared shingles —
  exact similarity, cost bounded by shingle co-occurrence, not n².
* **MinHash + LSH**: md5-seeded minhash signatures, banded bucket
  join for candidates, exact Jaccard verification on candidates only.
  md5 (not xxhash) so the DuckDB oracle reproduces every signature
  bit-for-bit; at 100 TB swap in xxhash64 — identical plan shape.
* **SimHash**: 64-bit token-weighted simhash built from 64 parallel
  SUM aggregates (no 64x row explosion), banded hamming-distance
  candidate join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .text import norm_text, text_shingles, tokens

JACCARD_THRESHOLD = 0.8
#: Posting-list document-frequency cap (stop-shingle cut). A shingle
#: shared by > MAX_SHINGLE_DF docs is near-boilerplate and generates
#: O(df^2) candidate pairs inside ONE grouped row — the cap bounds
#: that row buffer. Far above anything in the fixtures (max df 25 at
#: sf0.1), so conformance outputs are unaffected; at 100 TB it is the
#: standard recall-for-safety trade (a pair whose similarity evidence
#: lives ONLY in ultra-common shingles can drop below threshold).
MAX_SHINGLE_DF = 1000
#: LSH band-bucket fan-out cap — the minhash analogue of
#: MAX_SHINGLE_DF. A near-identical mega-cluster that survives exact
#: dedup (boilerplate with per-page noise) lands its whole membership
#: in ONE (band_id, band_key) bucket and would generate clique^2
#: candidate pairs; buckets larger than this are dropped before the
#: in-row pair fan-out, bounding the per-row buffer at
#: O(max_bucket^2). Far above any fixture bucket (max 3 at sf0.1);
#: the recall trade only affects clusters that exact/boilerplate
#: dedup should have removed first.
MAX_LSH_BUCKET = 1000
MINHASH_SEEDS = 8
LSH_BANDS = 4  # rows-per-band = MINHASH_SEEDS // LSH_BANDS = 2
SIMHASH_BANDS = 4  # 16 bits (4 hex chars) per band
HAMMING_MAX = 3


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup on the normalized-content hash: one hash-groupBy
    shuffle, survivor = min doc_id. Scales as a plain aggregation."""
    return (
        docs.select("doc_id", F.md5(norm_text(F.col(text_col))).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("doc_id", "content_hash", "n_copies")
    )


def _shingled(docs: DataFrame, text_col: str, k: int = 3) -> DataFrame:
    """(doc_id, shingles array, n_shingles), docs with >= k tokens.

    The eligibility filter runs on the cheap token count, BEFORE
    shingling: a filter on size(shingles) would be alias-substituted
    by predicate pushdown and re-evaluate the whole shingle build per
    row (size(shingles) > 0 ⟺ size(tokens) >= k, since distinct
    k-shingles of >= k tokens are never empty)."""
    toks = tokens(F.col(text_col))
    return (
        docs.where(F.size(toks) >= k)
        .select("doc_id", text_shingles(F.col(text_col), k).alias("shingles"))
        .withColumn("n_sh", F.size("shingles"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 3,
    threshold: float = JACCARD_THRESHOLD,
    max_df: int = MAX_SHINGLE_DF,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted index.

    Explode shingles → group postings BY shingle (docs sharing none
    never meet) → emit the ordered pairs inside each posting list
    with a higher-order array transform → count each pair's
    occurrences (= intersection size) → Jaccard from the
    inclusion-exclusion identity.

    Shaped as group-then-pair rather than the textbook posting-list
    self-join on purpose: the self-join scans the posting list twice
    (forcing a materialization) and needs THREE exchanges (both join
    sides on the shingle + the pair aggregation); this form scans the
    shingling once and needs two — per-shingle pair fan-out happens
    inside the row, JVM-side, between the same two shuffles the
    aggregation needs anyway. Cost still tracks true similarity
    structure. Two scale valves on top:

    * postings carry ``xxhash64(shingle)`` instead of the shingle
      string — int64 shuffle + grouping is ~2x the string form's
      throughput; a cross-shingle hash collision (which could only
      ever INFLATE one pair's intersection count) needs two of the
      corpus's distinct shingles to collide in 2^64, ~1e-9 even at
      10^5 distinct shingles;
    * the ``max_df`` stop-shingle cut drops posting lists longer
      than ``max_df`` BEFORE the in-row pair fan-out, bounding the
      per-row buffer at O(max_df^2) structs. A no-op on the fixtures
      (max df = 25 at sf0.1); at 100 TB it is the standard
      recall-for-safety trade — only pairs whose similarity evidence
      lives in near-boilerplate shingles can lose intersection
      counts."""
    sh = _shingled(docs, text_col, k)
    posts = sh.select(
        "doc_id",
        "n_sh",
        F.explode(F.transform("shingles", lambda s: F.xxhash64(s))).alias("s"),
    )
    grouped = (
        posts.groupBy("s")
        .agg(F.collect_list(F.struct("doc_id", "n_sh")).alias("ds"))
        .where(F.size("ds").between(2, max_df))
    )
    pair_arr = F.expr(
        """
        flatten(transform(ds, (x, i) ->
          transform(slice(ds, i + 2, size(ds) - i - 1), y ->
            if(x.doc_id < y.doc_id,
               named_struct('doc_a', x.doc_id, 'n_a', x.n_sh,
                            'doc_b', y.doc_id, 'n_b', y.n_sh),
               named_struct('doc_a', y.doc_id, 'n_a', y.n_sh,
                            'doc_b', x.doc_id, 'n_b', x.n_sh)))))
        """
    )
    pairs = (
        grouped.select(F.explode(pair_arr).alias("p"))
        .select("p.*")
        .groupBy("doc_a", "doc_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return (
        pairs.withColumn("jaccard", F.round(jac, 6))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "inter", "jaccard")
    )


def prefix_filter_pairs(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 3,
    threshold_num: int = 4,
    threshold_den: int = 5,
    max_df: int = MAX_SHINGLE_DF,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via PREFIX FILTERING
    (ppjoin-style): same answer set as :func:`ngram_jaccard_pairs`
    at threshold = threshold_num/threshold_den, but the inverted
    index is built over each document's PREFIX only — the
    p = n - ceil(t*n) + 1 rarest shingles under a global total order
    — instead of all n. Any pair with Jaccard >= t must share at
    least one prefix element under ANY consistent global ordering
    (the classic prefix-filter completeness bound), so candidates
    shrink ~(1-t) per side — MEASURED 10.4x fewer candidate-pair
    emissions at sf0.1 (1.27M -> 122k) — while recall stays exact;
    candidates are then verified against the FULL shingle sets.
    On corpora whose posting lists are already short (this synthetic
    fixture) the reduction does not buy wall time (see SCALE.md's
    probe — comparable, not faster); the win case is
    common-phrase-heavy web text where mid-df posting lists below
    the stop-shingle cap dominate candidate generation.

    Engine-portable determinism: the global shingle order is
    (document frequency ASC, md5(shingle) ASC) — md5 hex is
    bit-identical in Spark and DuckDB, so the prefix sets, the
    bucket-size valve engagement, and therefore the candidate set
    are IDENTICAL cross-engine (an engine-local hash would give
    order-dependent valve behavior at the cap boundary). The
    threshold is passed as a rational (num/den) and the prefix
    length computed in pure integer arithmetic
    (ceil(t*n) = (num*n + den - 1) DIV den): the completeness bound
    then never depends on how a double t*n rounds at exact
    multiples — guaranteed by construction rather than by
    double-rounding luck, and both engines trivially agree.

    Shape at 100 TB: one corpus scan into the persisted posting
    frame (doc_id, n_sh, md5-shingle) → df aggregate [shuffle 1,
    vocabulary-keyed] → unhinted key join back + per-doc rank window
    [shuffle 2, doc-keyed] → prefix cut → group-then-pair on the
    PREFIX postings with the ``max_df`` bucket valve [shuffle 3] →
    verification joins of the candidate frame (subgraph-sized)
    against the cached full postings. Pair fan-out is bounded by
    prefix co-occurrence — measured 10.4x fewer candidate emissions
    than the full inverted index at sf0.1 — which is the point: the
    verify cost tracks TRUE near-dup structure even when the corpus
    shares a heavy middle-frequency band.

    Output: (doc_a, doc_b, inter, jaccard) — identical to
    ngram_jaccard_pairs whenever the df valve does not engage
    (pinned by test).
    """
    from .. import cache

    sh = _shingled(docs, text_col, k)
    # persist the ARRAY form (one row per doc, distinct md5 shingles)
    # rather than the exploded postings (r17): the exploded view
    # derives from it as a free map over the cache, and the verify
    # stage reads the arrays directly — 5k cached rows instead of
    # 260k at sf0.1, one corpus pass either way
    arr = cache.persisted(
        sh.select(
            "doc_id",
            "n_sh",
            F.transform("shingles", lambda s: F.md5(s)).alias("sv"),
        )
    )
    posts = arr.select("doc_id", "n_sh", F.explode("sv").alias("s"))
    dfreq = posts.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("s"))
    prefix_len = F.expr(
        f"n_sh - (({threshold_num} * n_sh + {threshold_den - 1})"
        f" DIV {threshold_den}) + 1"
    )
    pref = (
        posts.join(dfreq, "s")
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= prefix_len)
        .select("doc_id", "n_sh", "s")
    )
    grouped = (
        pref.groupBy("s")
        .agg(F.collect_list(F.struct("doc_id", "n_sh")).alias("ds"))
        .where(F.size("ds").between(2, max_df))
    )
    pair_arr = F.expr(
        """
        flatten(transform(ds, (x, i) ->
          transform(slice(ds, i + 2, size(ds) - i - 1), y ->
            if(x.doc_id < y.doc_id,
               named_struct('doc_a', x.doc_id, 'n_a', x.n_sh,
                            'doc_b', y.doc_id, 'n_b', y.n_sh),
               named_struct('doc_a', y.doc_id, 'n_a', y.n_sh,
                            'doc_b', x.doc_id, 'n_b', x.n_sh)))))
        """
    )
    cand = (
        grouped.select(F.explode(pair_arr).alias("p"))
        .select("p.*")
        .distinct()
    )
    # Verification by per-pair ARRAY intersection (r17, guide §2.3/
    # §3.3): the former shape exploded every candidate against doc_a's
    # full posting list (measured at sf0.1: 119k candidate pairs →
    # 7.65M rows) and shuffled THAT by (doc_b, s) into a 4-key
    # groupBy. Joining each candidate to the two cached shingle-set
    # arrays instead keeps the frame at one row per candidate — two
    # doc-keyed joins (broadcastable when the corpus-arrays frame is
    # small), no exploding join, no re-aggregation. Bit-identical:
    # the arrays are DISTINCT md5 shingles (array_distinct upstream),
    # so size(array_intersect(a, b)) IS the distinct-match count the
    # join+count computed; the audit that motivated this found NO key
    # skew (max prefix group 8 docs vs the 1000 cap; candidates/doc
    # max 101, median 19) — the cost was pure exploded-row volume.
    inter = (
        cand.join(
            arr.select(F.col("doc_id").alias("doc_a"), F.col("sv").alias("sva")),
            "doc_a",
        )
        .join(
            arr.select(F.col("doc_id").alias("doc_b"), F.col("sv").alias("svb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "n_a",
            "n_b",
            F.size(F.array_intersect("sva", "svb"))
            .cast("bigint")
            .alias("inter"),
        )
    )
    t_float = threshold_num / threshold_den
    jac = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return (
        inter.withColumn("jaccard", F.round(jac, 6))
        .where(F.col("jaccard") >= t_float)
        .select("doc_a", "doc_b", "inter", "jaccard")
    )


def minhash_calibration(
    docs: DataFrame,
    text_col: str = "text",
    max_bucket: int = MAX_LSH_BUCKET,
) -> DataFrame:
    """Estimator-quality audit for the MinHash sketch: for every LSH
    candidate pair, the signature-match Jaccard ESTIMATE
    (matches / MINHASH_SEEDS — the unbiased minhash estimator) side
    by side with the EXACT Jaccard over the full shingle sets, plus
    the absolute error. The calibration read before trusting the
    sketch's band thresholds at scale — :func:`~.similarity.
    ivf_recall`'s role, played for the dedup index (too few seeds →
    wide error → the band match probability curve is not where the
    r/b arithmetic says it is).

    Shape: identical index build to :func:`minhash_lsh_pairs`
    (persisted shingle projection, checkpointed signatures, banded
    bucket candidates with the ``max_bucket`` valve); BOTH metrics
    are then computed only on the candidate frame — the estimate by
    joining the tiny signature table twice, the exact value by a
    per-row ``array_intersect`` over the two shingle arrays (no
    posting re-shuffle: candidates are subgraph-sized).

    Determinism: est_ppm is the exact rational matches * (1e6 / 8);
    exact_ppm is the 6-rounded DECIMAL-lifted Jaccard; err_ppm their
    absolute difference — all integer, bit-stable.

    Output: (doc_a, doc_b, est_ppm, exact_ppm, err_ppm).
    """
    from .. import cache

    if 1_000_000 % MINHASH_SEEDS:
        # not an assert: stripped under python -O, and a silently
        # truncated per-seed step would skew est_ppm for every pair
        raise ValueError(
            f"MINHASH_SEEDS={MINHASH_SEEDS} must divide 1,000,000 "
            "for the exact-rational est_ppm arithmetic"
        )
    sh = cache.persisted(_shingled(docs, text_col))
    rows_per_band = MINHASH_SEEDS // LSH_BANDS
    sigs = sh.select(
        "doc_id",
        *[minhash_seed_expr(s).alias(f"sig_{s}") for s in range(MINHASH_SEEDS)],
    ).localCheckpoint()
    band_keys = [
        F.concat_ws(
            "|",
            *[F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)],
        ).alias(f"k{b}")
        for b in range(LSH_BANDS)
    ]
    stack_args = ", ".join(f"{b}, k{b}" for b in range(LSH_BANDS))
    bands = sigs.select("doc_id", *band_keys).selectExpr(
        "doc_id", f"stack({LSH_BANDS}, {stack_args}) AS (band_id, band_key)"
    )
    grouped = (
        bands.groupBy("band_id", "band_key")
        .agg(F.collect_list("doc_id").alias("ds"))
        .where(F.size("ds").between(2, max_bucket))
    )
    pair_arr = F.expr(
        """
        flatten(transform(ds, (x, i) ->
          transform(slice(ds, i + 2, size(ds) - i - 1), y ->
            named_struct('doc_a', least(x, y), 'doc_b', greatest(x, y)))))
        """
    )
    cands = (
        grouped.select(F.explode(pair_arr).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"sig_{s}").alias(f"a{s}") for s in range(MINHASH_SEEDS)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"sig_{s}").alias(f"b{s}") for s in range(MINHASH_SEEDS)],
    )
    matches = None
    for s in range(MINHASH_SEEDS):
        m = F.when(F.col(f"a{s}") == F.col(f"b{s}"), 1).otherwise(0)
        matches = m if matches is None else (matches + m)
    est = cands.join(sa, "doc_a").join(sb, "doc_b").select(
        "doc_a",
        "doc_b",
        (matches * (1_000_000 // MINHASH_SEEDS)).cast("bigint").alias(
            "est_ppm"
        ),
    )
    sha = sh.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shingles").alias("_sa"),
        F.col("n_sh").alias("_na"),
    )
    shb = sh.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shingles").alias("_sb"),
        F.col("n_sh").alias("_nb"),
    )
    inter = F.size(F.array_intersect("_sa", "_sb"))
    jac6 = F.round(inter / (F.col("_na") + F.col("_nb") - inter), 6)
    exact = cands.join(sha, "doc_a").join(shb, "doc_b").select(
        "doc_a",
        "doc_b",
        (jac6.cast("decimal(28,10)") * 1000000).cast("bigint").alias(
            "exact_ppm"
        ),
    )
    return est.join(exact, ["doc_a", "doc_b"]).select(
        "doc_a",
        "doc_b",
        "est_ppm",
        "exact_ppm",
        F.abs(F.col("est_ppm") - F.col("exact_ppm")).cast("bigint").alias(
            "err_ppm"
        ),
    )


def cross_corpus_postings(
    ref_docs: DataFrame, text_col: str = "text", k: int = 3
) -> DataFrame:
    """The reference-side posting frame of :func:`cross_corpus_pairs`
    — (ref_id, n_ref, s) with s = xxhash64(shingle). Built ONCE per
    reference refresh and materialized BUCKETED BY s
    (``engine.materialize_bucketed``): every nightly cross-corpus
    join then reads co-located posting buckets with NO exchange on
    the big side, and the stop-shingle valve's groupBy("s") is
    likewise shuffle-free (pinned by tools/scale_probe.py --r9)."""
    return _shingled(ref_docs, text_col, k).select(
        F.col("doc_id").alias("ref_id"),
        F.col("n_sh").alias("n_ref"),
        F.explode(F.transform("shingles", lambda s: F.xxhash64(s))).alias("s"),
    )


def cross_corpus_pairs(
    new_docs: DataFrame,
    ref_docs: DataFrame | None = None,
    text_col: str = "text",
    k: int = 3,
    threshold: float = JACCARD_THRESHOLD,
    max_df: int = MAX_SHINGLE_DF,
    ref_postings: DataFrame | None = None,
) -> DataFrame:
    """Incremental (cross-corpus) near-dup join: which NEW documents
    near-duplicate something already in the REFERENCE corpus — the
    nightly-crawl question every growing training set asks, and a
    shape the self-join operators cannot express (deduping the union
    would also pair reference docs against each other, re-paying the
    full corpus every night).

    Bipartite inverted-index join: shingle postings built per side,
    hash-joined on xxhash64(shingle) — no self-join, no pair
    fan-out; one joined row per shared shingle, aggregated to the
    intersection count, Jaccard from inclusion-exclusion over the
    two distinct-shingle set sizes. The ``max_df`` stop-shingle
    valve is computed on the REFERENCE side (its boilerplate is the
    stable, known quantity; the new batch is typically much smaller)
    and drops those postings from BOTH sides before the join — the
    same recall-for-safety trade as ngram_jaccard_pairs, mirrored in
    the oracle.

    Scale shape: shuffle keyed on the shingle hash for both posting
    sets [the only corpus shuffles] + one pair aggregation; cost
    tracks shared-shingle co-occurrence, bounded by the valve. At
    100 TB the reference postings are materialized ONCE, bucketed BY
    the shingle hash (engine.materialize_bucketed), making every
    nightly join co-located and shuffle-free on the big side.

    Output: (new_id, ref_id, inter, jaccard), jaccard >= threshold.
    ``ref_postings`` (from :func:`cross_corpus_postings`, typically
    materialized bucketed by s) replaces ``ref_docs`` — the nightly
    production path; passing documents rebuilds postings inline.
    """
    if (ref_docs is None) == (ref_postings is None):
        raise ValueError(
            "cross_corpus_pairs: pass exactly one of ref_docs / ref_postings"
        )
    pn = _shingled(new_docs, text_col, k).select(
        F.col("doc_id").alias("new_id"),
        F.col("n_sh").alias("n_new"),
        F.explode(F.transform("shingles", lambda s: F.xxhash64(s))).alias("s"),
    )
    pr = (
        ref_postings
        if ref_postings is not None
        else cross_corpus_postings(ref_docs, text_col, k)
    )
    ok = (
        pr.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= max_df)
        .select("s")
    )
    pairs = (
        pn.join(ok, "s")
        .join(pr, "s")
        .groupBy("new_id", "ref_id", "n_new", "n_ref")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (F.col("n_new") + F.col("n_ref") - F.col("inter"))
    return (
        pairs.withColumn("jaccard", F.round(jac, 6))
        .where(F.col("jaccard") >= threshold)
        .select("new_id", "ref_id", "inter", "jaccard")
    )


def minhash_seed_expr(seed: int) -> Column:
    """min over shingles of md5('<seed>:' || shingle) — one minhash
    function. Hex-string min is total-ordered and engine-agnostic."""
    return F.array_min(
        F.transform(
            F.col("shingles"), lambda s: F.md5(F.concat(F.lit(f"{seed}:"), s))
        )
    )


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", n_seeds: int = MINHASH_SEEDS
) -> DataFrame:
    """Per-doc MinHash signature: n_seeds md5-min columns (sig_0..).
    Entirely per-row after shingling — no shuffle at all."""
    sh = _shingled(docs, text_col)
    return sh.select(
        "doc_id",
        *[minhash_seed_expr(s).alias(f"sig_{s}") for s in range(n_seeds)],
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    threshold: float = JACCARD_THRESHOLD,
    max_bucket: int = MAX_LSH_BUCKET,
) -> DataFrame:
    """MinHash-LSH near-dup join: band the signature (4 bands x 2
    rows), bucket candidates on (band_id, band_key) equality, then
    verify with exact Jaccard on the candidates only.

    Candidate generation is group-then-pair (the same shape as
    ngram_jaccard_pairs, for the same reason): group the banded rows
    BY bucket, emit the ordered pairs inside each bucket with an
    in-row array transform. One exchange instead of the textbook
    bucket self-join's two, and the ``max_bucket`` valve drops
    oversized buckets BEFORE the pair fan-out — without it a
    near-identical mega-cluster (which shares every band key) yields
    clique^2 candidate rows. With r=2,b=4 the match probability at
    j=0.8 is 1-(1-j^2)^4 ≈ 0.98, and our planted near-dups
    (j ≈ 0.97) are caught with P ≈ 1-1e-5."""
    from .. import cache

    # The shingled projection feeds BOTH signature generation and the
    # exact-Jaccard verify — persist it so tokenize+shingle runs once
    # (MEMORY_AND_DISK: degrades to spill, never recomputes;
    # registered with cache.release() for long-lived sessions).
    sh = cache.persisted(_shingled(docs, text_col))
    rows_per_band = MINHASH_SEEDS // LSH_BANDS
    # Signatures are tiny (doc_id + 8 hex strings): materialize them
    # eagerly (localCheckpoint) so the band self-join's two scans read
    # the stored rows instead of re-running 8 md5-min passes over the
    # shingle arrays per scan.
    sigs = sh.select(
        "doc_id",
        *[minhash_seed_expr(s).alias(f"sig_{s}") for s in range(MINHASH_SEEDS)],
    ).localCheckpoint()
    band_keys = [
        F.concat_ws(
            "|",
            *[F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)],
        ).alias(f"k{b}")
        for b in range(LSH_BANDS)
    ]
    # one-pass band explode (stack) — NOT a 4-branch union, which
    # would scan/recompute the signature subtree once per band
    stack_args = ", ".join(f"{b}, k{b}" for b in range(LSH_BANDS))
    bands = sigs.select("doc_id", *band_keys).selectExpr(
        "doc_id", f"stack({LSH_BANDS}, {stack_args}) AS (band_id, band_key)"
    )
    grouped = (
        bands.groupBy("band_id", "band_key")
        .agg(F.collect_list("doc_id").alias("ds"))
        .where(F.size("ds").between(2, max_bucket))
    )
    pair_arr = F.expr(
        """
        flatten(transform(ds, (x, i) ->
          transform(slice(ds, i + 2, size(ds) - i - 1), y ->
            named_struct('doc_a', least(x, y), 'doc_b', greatest(x, y)))))
        """
    )
    cands = (
        grouped.select(F.explode(pair_arr).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )
    sa = sh.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shingles").alias("sh_a"),
        F.col("n_sh").alias("n_a"),
    )
    sb = sh.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shingles").alias("sh_b"),
        F.col("n_sh").alias("n_b"),
    )
    verified = (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")), 6
            ),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return verified.select("doc_a", "doc_b", "jaccard")


def _dup_subgraph_labels(
    docs: DataFrame,
    text_col: str,
    k: int,
    threshold: float,
    max_iter: int,
    reliable: bool = False,
) -> DataFrame:
    """Connected-component labels (doc_id, cluster_id) for the docs
    that appear in at least one near-dup pair — the dup SUBGRAPH
    only, orders of magnitude smaller than the corpus at any scale.
    Shared by dedup_clusters (which reattaches singletons) and
    keep_best_per_cluster (which ranks quality within these labels
    without ever windowing the corpus).

    Spark-first iterative min-label propagation — the same shape
    GraphX/GraphFrames connectedComponents uses:

    * labels start as each doc's own id;
    * each round, every node takes the min of its own and its
      neighbors' labels (self-loop edges fold "own" into the same
      min — one join + one groupBy, 2 exchanges per round);
    * ``localCheckpoint`` truncates lineage every round (without it
      the plan nests one join per iteration and Catalyst analysis
      blows up long before the data does);
    * convergence = the strictly-decreasing label sum goes flat —
      one tiny agg action per round, O(component diameter) rounds.

    Near-dup graphs are overwhelmingly short-diameter (dup clusters
    are cliques or near-cliques from the pair generators), so this
    terminates in 2-4 rounds in practice; ``max_iter`` bounds
    adversarial chains.

    Star-contraction (two-phase large-star/small-star, the
    O(log d)-round alternative) was evaluated and deliberately NOT
    adopted: on the clique-shaped components near-dup generators
    produce, this loop already converges in ONE confirming round
    (labels0 IS round 1), so contraction cannot remove rounds here —
    wall time is dominated by the pair build, not the fixpoint
    (measured: clusters end-to-end 4.5 s at sf0.1 cold, of which the
    pair build alone is >2/3). Contraction's payoff exists only on
    long-chain components, which ``max_iter`` already bounds, and its
    two alternating step shapes would complicate the
    ``reliable``-checkpoint path for no measured gain."""
    from .iterate import fixpoint

    # ONE materialization job: each near-dup pair row explodes into
    # its 4 edge rows — both directions (symmetric min-propagation)
    # plus a self-loop per endpoint. With self-loops,
    # min-over-in-neighbors already includes the node's own label, so
    # each round is ONE join + ONE aggregation (2 exchanges) instead
    # of join + aggregation + a left-join back onto the labels
    # (3 exchanges) — per-round latency is scheduler-dominated at the
    # subgraph's size, so one fewer stage is ~30% off every round.
    # The explode scans the expensive pair build exactly once (a
    # union form would re-derive it per branch — no ReusedExchange
    # across checkpoint-free subtrees), duplicate self-loops are
    # absorbed by the same min() the rounds compute, and the eager
    # checkpoint is what every round's join scans.
    a, b = F.col("doc_a"), F.col("doc_b")
    edges = (
        ngram_jaccard_pairs(docs, text_col, k, threshold)
        .select(
            F.explode(
                F.array(
                    F.struct(a.alias("src"), b.alias("dst")),
                    F.struct(b.alias("src"), a.alias("dst")),
                    F.struct(a.alias("src"), a.alias("dst")),
                    F.struct(b.alias("src"), b.alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .localCheckpoint()
    )
    def propagate(labels: DataFrame) -> DataFrame:
        return (
            edges.join(labels, edges.src == labels.doc_id)
            .select(F.col("dst").alias("doc_id"), "cluster_id")
            .groupBy("doc_id")
            .agg(F.min("cluster_id").alias("cluster_id"))
        )

    # Round 1 folded into initialization: propagate() over the
    # identity labeling (label = own id) joins each edge to a label
    # equal to its src — i.e. it is just min(src) grouped by dst, no
    # join needed. Starting the fixpoint from that aggregation (which
    # also yields the node set for free — self-loops put every
    # endpoint in dst) removes the identity-label distinct AND the
    # first round's join+groupBy: on the clique-shaped components
    # near-dup generators produce, the loop runs ONE confirming
    # round instead of propagate+confirm (verified: propagate is
    # invoked once, was twice) — one fewer subgraph shuffle round
    # for every clusters/keep-best/overlap query.
    labels0 = edges.groupBy(F.col("dst").alias("doc_id")).agg(
        F.min("src").alias("cluster_id")
    )

    # Iterate over the near-dup SUBGRAPH only: a doc with no edge can
    # never change its label, so singletons — the overwhelming corpus
    # majority at 100 TB — are excluded from every round's shuffle and
    # re-attached once at the end (label = own id). Per-round cost is
    # ∝ |dup subgraph|, not ∝ corpus.
    return fixpoint(
        labels0,
        propagate,
        # label sum strictly decreases until the component minima fix
        lambda df: df.agg(F.sum("cluster_id")).collect()[0][0],
        max_iter,
        reliable=reliable,
    )


def dedup_clusters(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 3,
    threshold: float = JACCARD_THRESHOLD,
    max_iter: int = 25,
    reliable: bool = False,
) -> DataFrame:
    """Duplicate clusters: connected components over the near-dup
    pair graph, canonical representative = min doc_id per component.

    This is the step that turns pairwise near-dup evidence into an
    actual keep/drop decision (transitive closure: a~b and b~c put
    a,b,c in ONE cluster even when a,c were never paired). The
    iteration itself is :func:`_dup_subgraph_labels` (shared with
    keep_best_per_cluster). Output covers *every* doc (singletons are
    their own cluster), so `WHERE is_canonical` is the dedup filter.
    ``reliable=True`` makes the fixpoint rounds survive executor loss
    (iterate.fixpoint's reliable-checkpoint mode; needs
    setCheckpointDir).
    """
    labels = _dup_subgraph_labels(
        docs, text_col, k, threshold, max_iter, reliable=reliable
    )
    sub = labels.select("doc_id", F.col("cluster_id").alias("sub_cluster"))
    return (
        docs.select("doc_id")
        .join(sub, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("sub_cluster"), F.col("doc_id")).alias("cluster_id"),
        )
        .select(
            "doc_id",
            "cluster_id",
            (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
        )
    )


def keep_best_per_cluster(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 3,
    threshold: float = JACCARD_THRESHOLD,
    max_iter: int = 25,
    reliable: bool = False,
) -> DataFrame:
    """Quality-aware dedup survivor selection: within each near-dup
    cluster keep the HIGHEST-quality member (ties broken by lowest
    doc_id), not the arbitrary min-id member — the form a real
    curation pipeline wants ("of these 5 near-identical pages, keep
    the cleanest one").

    Scale shape: the quality ranking runs ONLY over the dup subgraph
    (a groupBy max_by on the tiny label frame joined to its docs) —
    never a corpus-wide window, whose global sort-shuffle would be
    the 100 TB killer here. The corpus is touched by three pruned
    columnar scans (pair build; subgraph quality lookup; final
    projection), each joined against a subgraph-sized side — the
    repeated pruned scans are the reviewed trade (see
    tools/plan_audit.RESCAN_REVIEWED) and beat any corpus shuffle.

    Output: one row per doc — (doc_id, cluster_id, quality, keep);
    ``WHERE keep`` is the dedup filter."""
    from .text import quality_exprs

    quality = quality_exprs(text_col)["quality"]
    sub = _dup_subgraph_labels(
        docs, text_col, k, threshold, max_iter, reliable=reliable
    )
    # quality of subgraph members: corpus scan pruned to (doc_id,
    # text) broadcast-joined against the tiny label frame FIRST, so
    # the tokenize-heavy quality expression is evaluated only on the
    # subgraph's rows (a projection below the join would evaluate it
    # corpus-wide — noise-level locally, corpus-proportional waste
    # at 100 TB)
    subq = (
        docs.select("doc_id", text_col)
        .join(sub, "doc_id")
        .select("doc_id", "cluster_id", quality.alias("quality"))
    )
    # arg-max per cluster without a window: max_by on the ordering
    # struct (quality DESC, doc_id ASC via negation)
    best = subq.groupBy("cluster_id").agg(
        F.max_by(
            "doc_id", F.struct(F.col("quality"), (-F.col("doc_id")))
        ).alias("best_doc")
    )
    sub_keyed = sub.join(best, "cluster_id").select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("best_doc")).alias("keep_sub"),
    )
    return (
        docs.select("doc_id", quality.alias("quality"))
        .join(sub_keyed, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
            "quality",
            F.coalesce(F.col("keep_sub"), F.lit(True)).alias("keep"),
        )
    )


def source_overlap_matrix(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    k: int = 3,
    threshold: float = JACCARD_THRESHOLD,
) -> DataFrame:
    """Cross-source near-duplication matrix: for every unordered pair
    of sources, how many near-dup pairs span them and how similar
    those pairs are — the data-governance view ("how much of the
    crawl duplicates the curated set?") that decides which source a
    mixture should drop its duplicates from.

    Scale shape: the near-dup pair frame is subgraph-sized, so both
    source lookups are joins of a tiny side against a corpus scan
    pruned to (doc_id, source); the final aggregation groups the tiny
    pair frame by source pair. No corpus shuffle anywhere."""
    pairs = ngram_jaccard_pairs(docs, text_col, k, threshold)
    src = docs.select("doc_id", F.col(source_col).alias("_src"))
    j = (
        pairs.join(
            src.select(F.col("doc_id").alias("doc_a"), F.col("_src").alias("sa")),
            "doc_a",
        ).join(
            src.select(F.col("doc_id").alias("doc_b"), F.col("_src").alias("sb")),
            "doc_b",
        )
    )
    return (
        j.select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
            "jaccard",
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.round(
                F.sum(F.col("jaccard").cast("decimal(38,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_jaccard"),
        )
    )


# --- SimHash ---------------------------------------------------------------

_HEX = "0123456789abcdef"


def _nibble(tok_hash: Column, pos: int) -> Column:
    """Value 0..15 of hex digit `pos` (0-based) of an md5 hex string —
    instr-based so DuckDB's strpos reproduces it exactly."""
    return (
        F.call_function("instr", F.lit(_HEX), F.substring(tok_hash, pos + 1, 1)) - 1
    )


def simhash64(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit token-weighted SimHash as 64 parallel SUM aggregates.

    tokens → (doc, token, count) → for bit j: SUM(count * ±1) where
    the sign is bit j of md5(token)'s first 16 hex chars. One
    groupBy(doc) shuffle with 64 narrow agg columns — no 64x explode,
    stays in whole-stage codegen. Output is the 16-hex-char signature
    rebuilt from the bit signs.

    The md5 nibbles are computed on a DISTINCT-TOKEN dimension and
    joined back, not projected inline: Catalyst's CollapseProject
    inlines a projected ``md5(tok)`` into all 64 aggregate
    expressions (64 md5 evaluations per (doc, token) row — 4x
    measured at sf0.1), while join output attributes are
    materialized values. The vocabulary is orders of magnitude
    smaller than the token-count table at any scale, and the join is
    a broadcast (small vocab) or a hash join on tok — never wider
    than the groupBy(doc) shuffle that follows."""
    toks = tokens(F.col(text_col))
    tok_counts = (
        docs.select("doc_id", F.explode(toks).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tok_dim = (
        tok_counts.select("tok")
        .distinct()
        .select(
            "tok",
            *[
                _nibble(F.md5(F.col("tok")), p).alias(f"nib_{p}")
                for p in range(16)
            ],
        )
    )
    joined = tok_counts.join(tok_dim, "tok")
    bit_sums = []
    for j in range(64):
        bit = F.shiftright(F.col(f"nib_{j // 4}"), 3 - (j % 4)).bitwiseAND(
            F.lit(1)
        )
        contrib = F.col("c") * (bit * 2 - 1)
        bit_sums.append(F.sum(contrib).alias(f"b{j}"))
    sums = joined.groupBy("doc_id").agg(*bit_sums)
    nibbles = []
    for p in range(16):
        v = None
        for r in range(4):
            j = p * 4 + r
            bit = F.when(F.col(f"b{j}") > 0, 1 << (3 - r)).otherwise(0)
            v = bit if v is None else (v + bit)
        nibbles.append(F.lit(_HEX).substr(v + 1, F.lit(1)))
    return sums.select(
        "doc_id", F.concat(*nibbles).alias("simhash")
    )


def simhash_pairs(
    docs: DataFrame, text_col: str = "text", max_hamming: int = HAMMING_MAX
) -> DataFrame:
    """SimHash near-dup pairs: band the 64-bit signature into 4
    16-bit bands (4 hex chars), bucket-join on band equality (any
    pair within hamming <= 3 shares at least one intact band by
    pigeonhole), verify with exact nibble-wise popcount hamming."""
    # tiny frame (doc_id + 16 hex chars) behind a 64-agg groupBy:
    # materialize it EAGERLY (localCheckpoint, not cache) — the band
    # self-join and the verify join scan it four times in one action,
    # and a lazy cache races those scans into four concurrent
    # recomputations of the aggregation (4x measured at sf0.1)
    sig = simhash64(docs, text_col).localCheckpoint()
    band_keys = [
        F.substring("simhash", b * 4 + 1, 4).alias(f"k{b}")
        for b in range(SIMHASH_BANDS)
    ]
    stack_args = ", ".join(f"{b}, k{b}" for b in range(SIMHASH_BANDS))
    bands = sig.select("doc_id", *band_keys).selectExpr(
        "doc_id", f"stack({SIMHASH_BANDS}, {stack_args}) AS (band_id, band_key)"
    )
    left = bands.select(F.col("doc_id").alias("doc_a"), "band_id", "band_key")
    right = bands.select(F.col("doc_id").alias("doc_b"), "band_id", "band_key")
    cands = (
        left.join(right, ["band_id", "band_key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = sig.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
    ham = None
    for p in range(16):
        na = _nibble(F.col("ha"), p)
        nb = _nibble(F.col("hb"), p)
        d = F.bit_count(na.bitwiseXOR(nb))
        ham = d if ham is None else (ham + d)
    return (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("hamming", ham.cast("int"))
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# --- Passage-level exact-substring dedup -----------------------------------

#: Tokens per passage window. 16 tokens ≈ one long sentence — the
#: granularity at which boilerplate (nav bars, license headers,
#: repeated paragraphs) recurs across documents even when the full
#: documents differ.
PASSAGE_TOKENS = 16


def passage_dedup_stats(
    docs: DataFrame, text_col: str = "text", p: int = PASSAGE_TOKENS
) -> DataFrame:
    """Passage-level exact-substring duplication statistics: chunk
    each document into non-overlapping ``p``-token passages, hash
    each passage, and report per document how many of its passages
    also occur (verbatim) in at least one OTHER document.

    This is the chunk-granular approximation of exact-substring
    dedup (the suffix-array pass of the reference LLM curation
    recipe): full-document dedup misses a page that is 90% shared
    boilerplate + 10% unique chrome; passage stats expose it as a
    high ``n_dup_passages / n_passages`` ratio, and the passage
    hashes themselves are the removal keys.

    Scale shape — same group-then-mark pattern as
    :func:`ngram_jaccard_pairs`: explode passages → ONE hash
    aggregation (collect per-hash doc list, grouped-row buffer is
    O(df) ids, linear — not the O(df²) a pair fan-out would risk) →
    re-explode with the cross-doc flag → per-doc count aggregation.
    One scan of the corpus, two hash-equality shuffles, no joins back
    to the corpus. Docs shorter than ``p`` tokens have no full
    passage and are absent from the output (deterministic, mirrored
    by the oracle).

    Output: (doc_id, n_passages, n_dup_passages)."""
    toks = tokens(F.col(text_col))
    base = docs.where(F.size(toks) >= p).select("doc_id", toks.alias("w"))
    passages = base.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(w) div {p} - 1), "
                f"i -> md5(concat_ws(' ', slice(w, i * {p} + 1, {p}))))"
            )
        ).alias("h"),
    )
    marked = (
        passages.groupBy("h")
        .agg(F.collect_list("doc_id").alias("ds"))
        .select(
            F.explode("ds").alias("doc_id"),
            (F.size(F.array_distinct("ds")) >= 2).alias("dup"),
        )
    )
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_passages"),
        F.sum(F.col("dup").cast("long")).cast("bigint").alias("n_dup_passages"),
    )


# --- Edit-distance verification of LSH candidates --------------------------

#: Normalized edit-similarity acceptance threshold for
#: :func:`edit_verified_pairs` (1 - levenshtein / max_len).
EDIT_SIM_THRESHOLD = 0.8


def edit_verified_pairs(
    docs: DataFrame,
    text_col: str = "text",
    threshold: float = JACCARD_THRESHOLD,
    edit_sim_threshold: float = EDIT_SIM_THRESHOLD,
) -> DataFrame:
    """Character-level verification of the MinHash-LSH near-dup
    pairs: annotate each candidate pair with its exact Levenshtein
    distance and normalized edit similarity
    (``1 - lev / max(len_a, len_b)``), plus the accept/reject
    verdict at ``edit_sim_threshold``.

    Shingle Jaccard is order-insensitive (a scrambled copy scores
    high); edit distance is the order-sensitive second opinion a
    curation pipeline runs before destructive removal. Running it on
    every corpus pair is O(n²·len²) — running it on the LSH
    candidate set (subgraph-sized) is the scalable form.

    Scale shape: the pair frame out of :func:`minhash_lsh_pairs` is
    subgraph-sized; the two text lookups are corpus scans pruned to
    (doc_id, normalized text) hash-joined against that tiny frame.
    Levenshtein itself is JVM codegen (built-in), per-pair.

    Output: (doc_a, doc_b, jaccard, edit_distance, edit_sim,
    verified)."""
    pairs = minhash_lsh_pairs(docs, text_col, threshold)
    na = docs.select(
        F.col("doc_id").alias("doc_a"), norm_text(F.col(text_col)).alias("txt_a")
    )
    nb = docs.select(
        F.col("doc_id").alias("doc_b"), norm_text(F.col(text_col)).alias("txt_b")
    )
    lev = F.levenshtein("txt_a", "txt_b")
    sim = F.round(
        F.lit(1) - lev / F.greatest(F.length("txt_a"), F.length("txt_b")), 6
    )
    return (
        pairs.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "jaccard",
            lev.cast("bigint").alias("edit_distance"),
            sim.alias("edit_sim"),
            (sim >= edit_sim_threshold).alias("verified"),
        )
    )


# --- Split-leakage governance ----------------------------------------------


def split_leakage_check(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 3,
    threshold: float = JACCARD_THRESHOLD,
    max_iter: int = 25,
) -> DataFrame:
    """Train/eval split-leakage audit: for every near-duplicate
    cluster (≥ 2 members), which dataset splits its members landed
    in. A cluster spanning train AND val/test is eval contamination
    that document-level dedup reports but split assignment silently
    ships — the audit a curation pipeline runs before publishing a
    dataset card.

    Scale shape: the cluster labels come from the dup-subgraph
    fixpoint (:func:`_dup_subgraph_labels` — subgraph-sized); the
    split column is the same zero-shuffle hash expression
    ``dataset_split`` uses, evaluated only on subgraph members via a
    pruned (doc_id) scan joined to the tiny label frame. One
    aggregation over cluster_id finishes it.

    Output: (cluster_id, n_docs, n_splits, splits, leaky)."""
    from .text import split_expr

    sub = _dup_subgraph_labels(docs, text_col, k, threshold, max_iter)
    member = docs.select("doc_id", split_expr().alias("split")).join(sub, "doc_id")
    return (
        member.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count_distinct("split").cast("bigint").alias("n_splits"),
            F.concat_ws(",", F.array_sort(F.collect_set("split"))).alias(
                "splits"
            ),
        )
        .select(
            "cluster_id",
            "n_docs",
            "n_splits",
            "splits",
            (F.col("n_splits") > 1).alias("leaky"),
        )
    )


#: Containment threshold: fraction of the SMALLER doc's shingles that
#: must appear in the pair's intersection.
CONTAINMENT_THRESHOLD = 0.9


def containment_pairs(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 3,
    threshold: float = CONTAINMENT_THRESHOLD,
    max_df: int = MAX_SHINGLE_DF,
) -> DataFrame:
    """Asymmetric near-dup detection: containment(A ⊂ B) =
    |shingles(A) ∩ shingles(B)| / |shingles(A)| — the measure that
    catches a short document EMBEDDED in a longer one (quote farms,
    chunk re-publication, boilerplate-wrapped copies), which
    symmetric Jaccard structurally misses: a 50-shingle doc fully
    contained in a 5000-shingle doc scores Jaccard 0.01 but
    containment 1.0. Standard companion to Jaccard in corpus dedup
    (Broder's resemblance vs containment distinction).

    Implementation reuses the inverted-index group-then-pair shape of
    :func:`ngram_jaccard_pairs` — identical shuffle structure, both
    scale valves included — only the final arithmetic differs: the
    pair is reported when the SMALLER side's containment clears the
    threshold, and both directed containments are returned.

    Output: (doc_a, doc_b, inter, containment_a, containment_b,
    jaccard) with doc_a < doc_b; containment_x = inter / n_x.
    """
    sh = _shingled(docs, text_col, k)
    posts = sh.select(
        "doc_id",
        "n_sh",
        F.explode(F.transform("shingles", lambda s: F.xxhash64(s))).alias("s"),
    )
    grouped = (
        posts.groupBy("s")
        .agg(F.collect_list(F.struct("doc_id", "n_sh")).alias("ds"))
        .where(F.size("ds").between(2, max_df))
    )
    pair_arr = F.expr(
        """
        flatten(transform(ds, (x, i) ->
          transform(slice(ds, i + 2, size(ds) - i - 1), y ->
            if(x.doc_id < y.doc_id,
               named_struct('doc_a', x.doc_id, 'n_a', x.n_sh,
                            'doc_b', y.doc_id, 'n_b', y.n_sh),
               named_struct('doc_a', y.doc_id, 'n_a', y.n_sh,
                            'doc_b', x.doc_id, 'n_b', x.n_sh)))))
        """
    )
    pairs = (
        grouped.select(F.explode(pair_arr).alias("p"))
        .select("p.*")
        .groupBy("doc_a", "doc_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    c_a = F.round(F.col("inter") / F.col("n_a"), 6)
    c_b = F.round(F.col("inter") / F.col("n_b"), 6)
    jac = F.round(
        F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")), 6
    )
    return (
        pairs.select(
            "doc_a",
            "doc_b",
            "inter",
            c_a.alias("containment_a"),
            c_b.alias("containment_b"),
            jac.alias("jaccard"),
        )
        .where(
            F.greatest(F.col("containment_a"), F.col("containment_b"))
            >= threshold
        )
    )
