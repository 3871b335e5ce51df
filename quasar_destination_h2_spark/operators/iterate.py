"""Fixpoint iteration — recursion beyond what recursive CTEs can do.

H2 1.4.200 supports ``WITH RECURSIVE`` (SURVEY §2.2 subqueries), and
Spark 4.x grammars it natively too — SQL-text recursion passes
straight through ``spark.sql`` (conformance query
``recursive_cte_sql``). What a UNION ALL recursive CTE cannot do is
terminate on a *cyclic* dataflow (connected components: every edge
re-derives its endpoints forever). The Spark-idiomatic form for
those is driver-controlled fixpoint iteration over DataFrames: apply
a monotone step until the state stops changing. This module makes
that pattern a first-class, reusable API instead of an ad-hoc loop:

* each round builds the next state declaratively (joins/aggregates —
  Catalyst optimizes every step);
* ``localCheckpoint`` truncates lineage per round (without it the
  plan nests one join per iteration and analysis time explodes long
  before the data does; on a cluster, swap ``checkpoint`` to survive
  executor loss);
* convergence is detected with a caller-supplied numeric measure
  that the step must strictly decrease (or leave fixed at the
  fixpoint) — one tiny agg action per round, O(recursion depth)
  rounds total, exactly like the recursive CTE it replaces.

``dedup_clusters`` (connected components; DuckDB ``WITH RECURSIVE``
oracle) is the conformance-gated user of this API.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


def fixpoint(
    state: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    measure: Callable[[DataFrame], float],
    max_iter: int = 25,
    reliable: bool = False,
) -> DataFrame:
    """Iterate ``state = step(state)`` until ``measure(state)`` stops
    changing (the fixpoint) or ``max_iter`` rounds elapse.

    ``measure`` must be invariant at — and only at — the fixpoint
    (e.g. the sum of monotonically decreasing labels, or a row
    count for monotonically growing reachability sets).

    One driver action per round: the checkpoint is marked lazy
    (``eager=False``) and the measure's aggregation job is what
    materializes it — an eager checkpoint would spend a second
    full job per round just to truncate lineage, doubling driver
    round-trips on an operator whose per-round floor is scheduler
    latency, not data volume.

    ``reliable=True`` switches the per-round lineage truncation from
    ``localCheckpoint`` (executor-local blocks — lost with a lost
    executor, and an iterative state has no lineage left to recompute
    from) to reliable ``checkpoint`` files under
    ``spark.sparkContext.setCheckpointDir`` (HDFS/object store on a
    cluster). Same convergence, same results; per-round cost gains a
    distributed-FS write. local[*] development and bounded-round
    fixtures keep the default; long cluster runs over revocable
    executors should pass ``reliable=True``."""
    if reliable and state.sparkSession.sparkContext.getCheckpointDir() is None:
        raise ValueError(
            "fixpoint(reliable=True) needs "
            "spark.sparkContext.setCheckpointDir(<fault-tolerant path>)"
        )

    def truncate(df: DataFrame) -> DataFrame:
        # reliable checkpoint() has no lazy form — it always runs its
        # own materialization job, the price of durable round state
        return df.checkpoint() if reliable else df.localCheckpoint(eager=False)

    state = truncate(state)
    # Prime convergence with the INITIAL state's measure: when the
    # caller seeds the loop with a state that is already one step
    # application (dedup's labels0 = propagate(identity), computed
    # join-free), the first in-loop step is the *confirming* round
    # and the loop exits after it — without priming it would run the
    # confirmation twice. Contract-safe: measure is invariant only at
    # the fixpoint, so a non-converged seed still iterates. Costs one
    # extra tiny agg action, which doubles as the materialization of
    # the seed's checkpoint.
    prev = measure(state)
    for _ in range(max_iter):
        state = truncate(step(state))
        cur = measure(state)  # with lazy checkpoints this single
        #                       action materializes the round
        if cur == prev:
            break
        prev = cur
    return state


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping_pct: int = 85,
    k: int = 10,
) -> DataFrame:
    """[EXT] PageRank over a directed edge list, bounded power
    iteration in EXACT integer arithmetic (r15) — graph centrality
    as a curation signal: on a near-dup similarity graph or a
    citation/link graph, the high-rank nodes are the canonical
    documents worth keeping and the low-rank tail is the noise
    (the SemDeDup keep-best idea with global, transitive structure
    instead of per-cluster scores).

    Semantics (Page et al. 1999, the leak variant): ranks live in
    parts-per-billion integers, ``r0 = 1e9 // N``; each round every
    node receives ``sum(rank(src) // outdeg(src))`` over its
    in-edges and re-ranks to ``(100 - damping_pct) * 1e9 // (100 *
    N) + damping_pct * contrib // 100``. Dangling nodes (no
    out-edges) contribute nothing — their mass leaks, which keeps
    every operation a floor division two engines implement
    identically (Spark ``DIV``, DuckDB ``//``), so the oracle
    replays all ``iterations`` rounds bit-for-bit. No floats
    anywhere; ties in the final top-``k`` break on node id.

    Scale shape (r17): the edge list is deduplicated and PERSISTED
    ONCE with its out-degrees riding along — ``persist`` rather than
    ``localCheckpoint``, because a checkpointed frame surfaces as a
    ``Scan ExistingRDD`` with *UnknownPartitioning* and Catalyst
    re-shuffles it in every consumer, while an ``InMemoryRelation``
    keeps the cached plan's hash partitioning AND sort order
    (``spark.sql.optimizer.canChangeCachedPlanOutputPartitioning``
    is false by default, so the cached layout is deterministic).
    With ``prepared`` cached as hash(src) and ``nodes`` cached as
    hash(node) — the same hash function over the same id domain —
    every round plans with exactly ONE Exchange (the contrib
    aggregation, the fundamental src→dst movement): the rank frame
    comes out of round ``i`` partitioned AND sorted by ``node``, so
    round ``i+1``'s join on ``src`` reuses that layout with no
    exchange and no sort (alias-aware partitioning propagation
    through the rename). The bounded ``iterations`` keep the nested
    plan small, so no per-round lineage truncation is needed — and
    none is wanted, since truncation is what destroyed the
    co-partitioning. The 100 TB form is BUILT (r16):
    ``Engine.build_graph_index`` stores the deduped edges bucketed
    by ``src`` with the out-degrees in a node-sized side table, and
    ``Engine.pagerank_served`` runs this same loop
    (:func:`pagerank_rounds`) over the stored frames — the per-round
    join reads co-located edge buckets with no edge-side shuffle;
    the rank frame (one row per node) is the only state that moves.

    Returns the top-``k`` rows ``(node, rank_ppb)`` ordered by rank
    descending, node ascending.
    """
    from pyspark.sql import functions as F

    from .. import cache

    deduped = edges.select("src", "dst").distinct()
    # persist, don't checkpoint: the cached plans carry hash(src) /
    # hash(node) partitioning and the join's src sort order into
    # every round, which is what keeps each round at ONE exchange
    # (see the docstring). Registered in cache so harnesses release
    # them between queries; nodes.count() below materializes both
    # (nodes derives from the prepared cache) in a single pass.
    # pin the cached layout to hash(src) + src order: when the degree
    # join plans as SMJ (the at-scale shape) both the repartition and
    # the sort are ELIDED (the join already ends in a matching
    # exchange + order — verified against 4.1.2 plans); when Catalyst
    # broadcasts the degree side (small inputs) its output keeps the
    # distinct's hash(src, dst) layout, and this one prep-time
    # exchange is what buys the rounds their exchange-free src join
    n_parts = int(
        edges.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    prepared = cache.persisted(
        deduped.join(
            deduped.groupBy("src").agg(F.count(F.lit(1)).alias("deg")),
            "src",
        )
        .repartition(n_parts, "src")
        .sortWithinPartitions("src")
    )
    nodes = cache.persisted(
        prepared.select(F.col("src").alias("node"))
        .union(prepared.select(F.col("dst").alias("node")))
        .distinct()
        .sortWithinPartitions("node")  # rounds' left-join side skips
        #                                its per-round sort (SMJ reads
        #                                the cached node-asc order)
    )
    return pagerank_rounds(prepared, nodes, nodes.count(), iterations,
                           damping_pct, k)


def pagerank_rounds(
    prepared: DataFrame,
    nodes: DataFrame,
    n: int,
    iterations: int,
    damping_pct: int,
    k: int,
) -> DataFrame:
    """The bounded power-iteration loop shared by the in-run
    :func:`pagerank` and the stored-index serving form
    (``Engine.pagerank_served``, r16) — ONE implementation so the two
    forms are bit-identical by construction, the property the served
    conformance query's oracle parity rests on. ``prepared`` must
    carry ``(src, dst, deg)`` — an edge list with each source's
    out-degree riding along — and ``nodes`` one ``node`` row per
    distinct endpoint (``n`` = its count, measured by the caller so
    a stored-index caller can take it from the node table it already
    has). Exact ppb integer arithmetic throughout (see pagerank).

    One Exchange per round (r17): callers supply ``prepared`` as a
    hash(src)-laid-out frame (persisted join / bucketed store) and
    ``nodes`` as a hash(node)-persisted frame with a MATCHING
    partition count, and the loop carries the rank frame's
    partitioning and sort order across rounds through lineage — no
    per-round ``localCheckpoint`` (checkpointing erases partitioning,
    which is exactly what forced the old loop to re-shuffle the rank
    frame twice per round). The per-round plan is then: co-partitioned
    src join (no exchange) → contrib aggregation (THE exchange, the
    fundamental src→dst movement) → co-partitioned left join against
    ``nodes`` (no exchange). Iterations are bounded and each round's
    output feeds exactly one consumer, so the nested plan stays small
    and nothing is recomputed. Results are unchanged: integer sums
    are exact under any partitioning, and the final top-k orders by
    (rank desc, node asc) deterministically."""
    from pyspark.sql import functions as F

    if n == 0:
        return nodes.select(
            "node", F.lit(0).cast("bigint").alias("rank_ppb")
        )
    base = (100 - damping_pct) * 10**9 // (100 * n)
    ranks = nodes.select(
        "node", F.lit(10**9 // n).cast("bigint").alias("rank_ppb")
    )
    for _ in range(iterations):
        contrib = (
            prepared.join(
                ranks.withColumnRenamed("node", "src"), "src"
            )
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_ppb DIV deg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_pct} * coalesce(contrib, 0L)) DIV 100"
                    )
                ).cast("bigint").alias("rank_ppb"),
            )
        )
    return ranks.orderBy(F.desc("rank_ppb"), F.asc("node")).limit(k)
