"""[EXT] Training-batch assembly over the ``documents`` table.

The last mile of a training-data pipeline: build the token
vocabulary, shuffle the corpus deterministically into shards, and
pack documents into fixed-token-budget sequences. All three are
Spark-first:

* **vocab_topk** — global token counts + top-k: partial+final
  aggregation then ``TakeOrderedAndProject`` (a per-partition heap;
  no global sort materializes 100 TB of token counts).
* **shuffle_shards** — seeded md5 key → shard by key bits →
  position by partitioned window. No global window anywhere (a
  single ``row_number`` over the whole corpus would funnel 100 TB
  through one task); determinism comes from the hash, not from a
  sort order someone forgot to pin.
* **sequence_pack** — greedy first-fit-in-order packing inside each
  shard via ``applyInPandas`` (Arrow-batched; the greedy reset is
  genuinely sequential, so it is the documented Python escape hatch,
  parallel across shards).

Hashes are md5 so the DuckDB oracles reproduce shard assignment
bit-for-bit; at 100 TB swap xxhash64 — identical plan shapes.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from .text import tokens

SHUFFLE_SEED = 42
N_SHARDS = 64
PACK_BUDGET = 256

_HEX = "0123456789abcdef"


def _hex_nibble(key: Column, pos: int) -> Column:
    """0..15 value of hex digit `pos` (0-based) — instr arithmetic so
    DuckDB's strpos mirrors it exactly (same trick as dedup.simhash)."""
    return F.call_function("instr", F.lit(_HEX), F.substring(key, pos + 1, 1)) - 1


def _shard_of(key: Column, n_shards: int) -> Column:
    """Shard from the first 16 bits of the md5 key."""
    v = (
        _hex_nibble(key, 0) * 4096
        + _hex_nibble(key, 1) * 256
        + _hex_nibble(key, 2) * 16
        + _hex_nibble(key, 3)
    )
    return F.pmod(v, F.lit(n_shards)).cast("int")


def vocab_topk(docs: DataFrame, text_col: str = "text", topn: int = 1000) -> DataFrame:
    """Top-`topn` tokens by corpus frequency (ties broken by token
    text — fully deterministic). explode → partial+final count →
    TakeOrderedAndProject."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(topn)
    )


def shuffle_shards(
    docs: DataFrame, n_shards: int = N_SHARDS, seed: int = SHUFFLE_SEED
) -> DataFrame:
    """Deterministic global shuffle for training-data loaders:
    (doc_id, shuffle_key, shard, pos). Reading shards in order of
    (shard, pos) yields a seeded pseudorandom permutation of the
    corpus, reproducible across engines and runs. The window is
    partitioned by shard — each shard sorts independently."""
    key = F.md5(F.concat(F.lit(f"{seed}:"), F.col("doc_id").cast("string")))
    keyed = docs.select(
        "doc_id",
        key.alias("shuffle_key"),
    ).withColumn("shard", _shard_of(F.col("shuffle_key"), n_shards))
    w = Window.partitionBy("shard").orderBy("shuffle_key", "doc_id")
    return keyed.select(
        "doc_id",
        "shuffle_key",
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
    )


def shard_balance(
    docs: DataFrame,
    text_col: str = "text",
    n_shards: int = N_SHARDS,
    seed: int = SHUFFLE_SEED,
) -> DataFrame:
    """Training-shard balance audit over the deterministic shuffle:
    per-shard document AND token counts with each shard's deviation
    from the ideal 1/n share in integer ppm — unbalanced shards are
    straggler batches (every data-parallel step waits for the fattest
    shard), so a loader checks this once per corpus build; md5-based
    sharding should land within sampling noise of uniform, and a
    share far off 1e6/n means the shard function or the corpus
    changed.

    Shape: one corpus scan (the token count is a per-row
    higher-order-function size, no explode) into the PERSISTED
    n_shards-row aggregate — it feeds both the one-row totals and
    the share projection, so the corpus pass runs once (the
    key_skew_profile policy). All shares are integer floor-division
    ppm — engine-exact.

    Output: (shard, n_docs, n_tokens, doc_share_ppm, tok_share_ppm).
    """
    from .. import cache
    from .text import tokens

    key = F.md5(F.concat(F.lit(f"{seed}:"), F.col("doc_id").cast("string")))
    per = cache.persisted(
        docs.select(
            _shard_of(key, n_shards).alias("shard"),
            F.size(F.filter(tokens(F.col(text_col)), lambda x: x != F.lit("")))
            .cast("bigint")
            .alias("ntok"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("ntok").cast("bigint").alias("n_tokens"),
        )
    )
    totals = per.agg(
        F.sum("n_docs").alias("td"), F.sum("n_tokens").alias("tt")
    )
    return per.crossJoin(F.broadcast(totals)).select(
        "shard",
        "n_docs",
        "n_tokens",
        F.expr("CAST(n_docs * 1000000 DIV td AS BIGINT)").alias(
            "doc_share_ppm"
        ),
        F.expr("CAST(n_tokens * 1000000 DIV tt AS BIGINT)").alias(
            "tok_share_ppm"
        ),
    )


#: Target fraction of the corpus a temperature-mixed sample keeps.
MIX_FRAC = 0.5


def mixture_sample(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Temperature-based data-mixture sampling (α = 0.5): per-group
    sampling rates ∝ sqrt(group size), the standard move to up-weight
    under-represented slices of a training mix without discarding the
    head. Groups here are document-length buckets; in a real pipeline
    the group key is source/language/quality tier — same plan.

    Shape: tiny per-group count table → rates (broadcast) → per-row
    deterministic md5 threshold test. One aggregation over group
    keys; the corpus itself is touched once, filter-only. sqrt (not
    pow) because IEEE sqrt is correctly rounded in every engine —
    rates come out bit-identical."""
    n_tok = F.size(F.filter(tokens(F.col(text_col)), lambda x: x != ""))
    bucket = (
        F.when(n_tok < 40, "short").when(n_tok <= 60, "mid").otherwise("long")
    )
    keyed = docs.select("doc_id", bucket.alias("bucket"))
    # a handful of rows (one per bucket) — checkpoint so the rates
    # subtree and the totals subtree don't each re-scan the corpus
    counts = (
        keyed.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    totals = counts.agg(
        F.sum("n").alias("tot_n"), F.sum(F.sqrt(F.col("n"))).alias("tot_w")
    )
    rates = counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.round(
            F.least(
                F.lit(1.0),
                F.col("tot_n") * MIX_FRAC * F.sqrt(F.col("n"))
                / F.col("tot_w") / F.col("n"),
            ),
            6,
        ).alias("rate"),
    )
    key = F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string")))
    frac16 = (
        _hex_nibble(key, 0) * 4096
        + _hex_nibble(key, 1) * 256
        + _hex_nibble(key, 2) * 16
        + _hex_nibble(key, 3)
    ) / F.lit(65536.0)
    return (
        keyed.join(F.broadcast(rates), "bucket")
        .where(frac16 < F.col("rate"))
        .select("doc_id", "bucket", "rate")
    )


PACK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("shard", IntegerType()),
        StructField("bin_id", LongType()),
        StructField("n_tokens", LongType()),
        StructField("offset", LongType()),
    ]
)


def sequence_pack(
    docs: DataFrame,
    text_col: str = "text",
    budget: int = PACK_BUDGET,
    n_shards: int = N_SHARDS,
    seed: int = SHUFFLE_SEED,
) -> DataFrame:
    """Pack documents into fixed-token-budget training sequences.

    Each doc's whitespace-token count is clipped to the budget (a
    real pipeline splits over-long docs; clipping keeps the packing
    invariant exact), docs are ordered by the seeded shuffle key
    within their shard, and a greedy in-order packer opens a new bin
    whenever the next doc would overflow `budget`. Output: one row
    per doc with (shard, bin_id, offset-within-bin).

    The greedy reset is inherently sequential state, so it runs as
    `applyInPandas` per shard — Python, but Arrow-batched, once per
    doc (not per token), and parallel across all shards. Invariants
    (pytest-pinned): per-bin token sums never exceed `budget`; bins
    are dense 0..k per shard; offsets are the prefix sums of their
    bin."""
    n_tok = F.least(
        F.size(F.filter(tokens(F.col(text_col)), lambda t: t != "")),
        F.lit(budget),
    ).cast("long")
    key = F.md5(F.concat(F.lit(f"{seed}:"), F.col("doc_id").cast("string")))
    keyed = docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        key.alias("shuffle_key"),
    ).withColumn("shard", _shard_of(F.col("shuffle_key"), n_shards))

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["shuffle_key", "doc_id"], kind="mergesort")
        bins, offsets = [], []
        bin_id, used = 0, 0
        for n in pdf["n_tokens"]:
            if used + n > budget and used > 0:
                bin_id, used = bin_id + 1, 0
            bins.append(bin_id)
            offsets.append(used)
            used += n
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(),
                "shard": pdf["shard"].to_numpy(),
                "bin_id": bins,
                "n_tokens": pdf["n_tokens"].to_numpy(),
                "offset": offsets,
            }
        )

    return keyed.groupBy("shard").applyInPandas(pack, PACK_SCHEMA)


def length_buckets(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Power-of-two sequence-length bucketing: assign each document
    to the bucket ``bit_length(n_tokens)`` (i.e. bucket b holds
    lengths in [2^(b-1), 2^b - 1]) and report per-bucket document
    count, token mass, length range, the padded-token cost of
    batching the bucket at its 2^b cap, and the resulting padding
    efficiency — the standard pre-batching histogram that decides
    bucketed-batch shapes (padding waste is what length bucketing
    exists to kill).

    Determinism: the bucket index is computed with INTEGER binary
    representation length (``conv(n, 10, 2)`` / DuckDB ``bin(n)``) —
    never floor(log2(x)), whose libm last-ulp behavior at exact
    powers of two differs across engines. One aggregation shuffle
    over ~30 bucket keys; partial aggregation makes the map side do
    all the work."""
    n_tok = F.size(tokens(F.col(text_col)))
    keyed = docs.select(
        "doc_id",
        n_tok.cast("bigint").alias("n_tokens"),
        F.length(F.conv(n_tok.cast("string"), 10, 2)).cast("bigint").alias("bucket"),
    )
    cap = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT))")
    return (
        keyed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
            F.min("n_tokens").cast("bigint").alias("min_tokens"),
            F.max("n_tokens").cast("bigint").alias("max_tokens"),
        )
        .select(
            "bucket",
            "n_docs",
            "sum_tokens",
            "min_tokens",
            "max_tokens",
            (F.col("n_docs") * cap).cast("bigint").alias("padded_tokens"),
            F.round(F.col("sum_tokens") / (F.col("n_docs") * cap), 6).alias(
                "pad_efficiency"
            ),
        )
    )


#: Fraction of the corpus token mass the budget allocator hands out.
BUDGET_FRAC_DENOM = 2  # budget = total_tokens DIV 2 (integer-exact)


def token_budget_allocation(
    docs: DataFrame, text_col: str = "text", source_col: str = "source"
) -> DataFrame:
    """Water-filling token-budget allocation across sources: given a
    total token budget (half the corpus token mass, integer-exact),
    give every source up to a common level L, chosen so that sources
    smaller than L keep everything and the rest are capped at L —
    the classic balanced-mixture allocation ("no source may
    dominate, small sources are never starved"). The budget is spent
    up to integer flooring: each capped source gets floor(L), so a
    fractional water level under-allocates by at most
    |capped sources| - 1 tokens (deterministic on both engines; the
    conformance oracle floors identically).

    The textbook form iterates; this is the CLOSED-FORM window
    formulation: sort sources by token count ascending, take prefix
    sums, and the level is ``max over qualifying rows of
    (B - prefix_before) / n_remaining`` where a row qualifies when
    filling every remaining source to its own count would meet the
    budget (for rows past the binding one the candidate level only
    shrinks — proved in the conformance oracle's comment). All
    window functions run over the per-source aggregate (|sources|
    rows), never the corpus: the corpus is touched by ONE
    aggregation shuffle; the single-partition window is on a frame
    of dozens of rows.

    Determinism: counts and prefix sums are BIGINT; the one double
    division has identical integer operands on both engines, and the
    allocation floors it back to BIGINT.

    Output: (source, n_tokens, alloc_tokens, capped)."""
    n_tok = F.size(tokens(F.col(text_col)))
    per_src = (
        docs.select(F.col(source_col).alias("source"), n_tok.alias("nt"))
        .groupBy("source")
        .agg(F.sum("nt").cast("bigint").alias("n_tokens"))
    )
    w_asc = Window.orderBy(F.col("n_tokens").asc(), F.col("source").asc())
    # explicit ROWS frames: the default RANGE frame's peer semantics
    # are an engine-divergence trap the unique sort key makes moot —
    # say ROWS anyway so the oracle comparison never depends on it
    w_cum = w_asc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = w_asc.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    annotated = per_src.select(
        "source",
        "n_tokens",
        (F.sum("n_tokens").over(w_cum) - F.col("n_tokens")).alias("prefix_before"),
        (F.count(F.lit(1)).over(w_all) - F.row_number().over(w_asc) + 1).alias(
            "m_remaining"
        ),
        # floor() BEFORE the bigint cast: Spark's double->long cast
        # truncates while DuckDB's rounds — floor is identical in
        # both, so the mirrored oracle can never diverge on an odd
        # corpus total
        F.floor(F.sum("n_tokens").over(w_all) / F.lit(BUDGET_FRAC_DENOM))
        .cast("bigint")
        .alias("budget"),
    )
    candidate = F.when(
        F.col("prefix_before") + F.col("n_tokens") * F.col("m_remaining")
        >= F.col("budget"),
        (F.col("budget") - F.col("prefix_before")) / F.col("m_remaining"),
    )
    leveled = annotated.select(
        "source",
        "n_tokens",
        F.max(candidate).over(w_all).alias("level"),
    )
    alloc = F.when(
        F.col("level").isNull(), F.col("n_tokens")
    ).otherwise(F.least(F.col("n_tokens"), F.floor("level").cast("bigint")))
    return leveled.select(
        "source",
        "n_tokens",
        alloc.cast("bigint").alias("alloc_tokens"),
        (alloc < F.col("n_tokens")).alias("capped"),
    )


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    chunk_size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Overlapping fixed-token-window chunking — the context-window
    splitter every training/RAG pipeline runs before tokenizer
    packing. Chunk i covers tokens [i*stride, i*stride + chunk_size)
    with stride = chunk_size - overlap; a document emits
    ceil((n - chunk_size) / stride) + 1 chunks (one when
    n <= chunk_size), so every token lands in >= 1 chunk and
    consecutive chunks share exactly ``overlap`` tokens.

    100 TB posture: one projection — tokenization, chunk-count
    arithmetic, the sequence explode, and the per-chunk slice are all
    whole-stage-codegen row-local expressions; ZERO shuffles, output
    partitioning inherits the scan. The explode fan-out is bounded by
    n/stride chunks per doc (~2x rows at the default 75% stride),
    never quadratic.

    Output: (doc_id, chunk_id, n_chunk_tokens, chunk_text).
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError("chunk_documents: need 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    base = docs.select(
        "doc_id",
        tokens(F.col(text_col)).alias("_tk"),
    ).select(
        "doc_id",
        "_tk",
        F.when(F.size("_tk") <= chunk_size, F.lit(1))
        .otherwise(
            F.ceil(
                (F.size("_tk") - F.lit(chunk_size)) / F.lit(float(stride))
            ).cast("int")
            + 1
        )
        .alias("_nc"),
    )
    chunk = F.expr(f"slice(_tk, chunk_id * {stride} + 1, {chunk_size})")
    return (
        base.select(
            "doc_id",
            "_tk",
            F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)).alias("chunk_id"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("bigint").alias("chunk_id"),
            F.size(chunk).cast("bigint").alias("n_chunk_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
    )


def _u24(key: Column) -> Column:
    """Uniform draw in (0, 1) from the first 24 bits of an md5 hex
    key — the strpos/instr nibble arithmetic DuckDB mirrors exactly
    (see _hex_nibble); +1 keeps the draw strictly positive so ln(u)
    is always finite."""
    h = (
        _hex_nibble(key, 0) * 1048576
        + _hex_nibble(key, 1) * 65536
        + _hex_nibble(key, 2) * 4096
        + _hex_nibble(key, 3) * 256
        + _hex_nibble(key, 4) * 16
        + _hex_nibble(key, 5)
    )
    return (h + 1) / F.lit(16777217.0)


def _es_score_micro(key: Column, w: Column) -> Column:
    """The Efraimidis-Spirakis competition key -ln(u)/w as an exact
    integer micro-unit column (6-rounded, DECIMAL-lifted) — ONE
    definition shared by both sampling forms so a precision change
    cannot desynchronize them (or their DuckDB oracles)."""
    return (
        (F.round(-F.log(_u24(key)) / w, 6).cast("decimal(28,10)") * 1000000)
        .cast("bigint")
    )


def weighted_sample(
    docs: DataFrame,
    k: int = 100,
    text_col: str = "text",
    seed: str = "ws",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis A-ES, Inf. Proc. Letters 2006): every row
    draws u from the md5 hash of its id and competes with key
    -ln(u)/w ascending, w = its whitespace-token count — the
    quality/length-weighted subset selection a curation pass runs
    when it wants long (or high-scoring) documents over-represented
    WITHOUT a nondeterministic RNG. Zero-weight (empty) documents
    cannot be sampled and are excluded up front.

    Shape at 100 TB: one filter-only corpus pass computing (w, u)
    per row in codegen, then a global top-k = orderBy + limit =
    TakeOrderedAndProject (per-partition heaps, never a global
    sort); the rank window runs over the k survivors only.

    Determinism: u is an exact rational from 24 md5 bits (both
    engines evaluate the same strpos arithmetic), the E-S key is
    6-rounded and DECIMAL-lifted to integer micro-units, ties break
    on doc_id — bit-stable across engines and partitionings.

    Output: (doc_id, w, score_micro, rank), rank 1 = first sampled."""
    key = F.md5(F.concat(F.lit(f"{seed}:"), F.col("doc_id").cast("string")))
    w = F.size(F.filter(tokens(F.col(text_col)), lambda t: t != ""))
    scored = (
        docs.select(
            "doc_id", w.cast("bigint").alias("w"), key.alias("_k")
        )
        .where(F.col("w") > 0)
        .select(
            "doc_id",
            "w",
            _es_score_micro(F.col("_k"), F.col("w")).alias("score_micro"),
        )
        .orderBy(F.asc("score_micro"), F.asc("doc_id"))
        .limit(k)
    )
    rank_w = Window.orderBy(F.asc("score_micro"), F.asc("doc_id"))
    return scored.select(
        "doc_id",
        "w",
        "score_micro",
        F.row_number().over(rank_w).cast("bigint").alias("rank"),
    )


def weighted_sample_stratified(
    docs: DataFrame,
    k_per_group: int = 20,
    group_col: str = "source",
    text_col: str = "text",
    seed: str = "ws",
) -> DataFrame:
    """Per-group Efraimidis–Spirakis: the same deterministic weighted
    draw, top ``k_per_group`` WITHIN each group (source/language/
    quality tier) — weighted selection that cannot starve a small
    group. The rank is a row_number window partitioned by the group
    key over the (w, u)-scored corpus — one corpus pass, one
    window shuffle keyed on the group.

    Output: (group, doc_id, w, score_micro, rank)."""
    key = F.md5(F.concat(F.lit(f"{seed}:"), F.col("doc_id").cast("string")))
    w = F.size(F.filter(tokens(F.col(text_col)), lambda t: t != ""))
    scored = (
        docs.select(
            F.col(group_col).alias("grp"),
            "doc_id",
            w.cast("bigint").alias("w"),
            key.alias("_k"),
        )
        .where(F.col("w") > 0)
        .select(
            "grp",
            "doc_id",
            "w",
            _es_score_micro(F.col("_k"), F.col("w")).alias("score_micro"),
        )
    )
    rank_w = Window.partitionBy("grp").orderBy(
        F.asc("score_micro"), F.asc("doc_id")
    )
    return (
        scored.withColumn(
            "rank", F.row_number().over(rank_w).cast("bigint")
        )
        .where(F.col("rank") <= k_per_group)
        .select(
            F.col("grp").alias(group_col), "doc_id", "w", "score_micro", "rank"
        )
    )
