"""Engine lifecycle — config → validated SparkSession → destination.

Parity with ``H2DestinationModule.destination``
(``H2DestinationModule.scala:59-107``, SURVEY §3 EP1):

1. decode config (failure -> MalformedConfiguration with the redacted
   config),
2. acquire resources in dependency order: random 6-char instance tag
   (``package.scala:38-39``) → SparkSession (replaces the Hikari
   pool; Spark's scheduler manages parallelism) → optional server
   boot (init script, then external SQL endpoint),
3. validate the connection with a probe query under a 10 s timeout
   (``:48-49,75-81``; invalid -> ConnectionFailed),
4. yield the destination facade exposing exactly one sink — the CSV
   create sink (``H2Destination.scala:37-46``).
"""

from __future__ import annotations

import logging
import random
import string
from concurrent.futures import ThreadPoolExecutor, TimeoutError as FutTimeout
from typing import Any, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

from .config import Config
from .errors import ConnectionFailed
from .idents import hygienic_ident
from .sources.sink import CsvCreateSink
from .types import TypeOptions, DEFAULT_OPTIONS

log = logging.getLogger(__name__)

#: Probe timeout, seconds — parity with Connection.isValid(10)
#: (H2DestinationModule.scala:49).
VALIDATION_TIMEOUT_S = 10.0


def random_alphanum(n: int = 6) -> str:
    """Random instance tag for log correlation (package.scala:38-39)."""
    return "".join(random.choices(string.ascii_letters + string.digits, k=n))


def _is_null_literal(expr: str) -> bool:
    """True when a recorded DEFAULT expression is the NULL constant
    under any parenthesized/whitespace spelling (``NULL``, ``(NULL)``,
    ``(( null ))``) — the spellings H2 folds to the same constant
    before its "no lawful fill" rejection (advice r14)."""
    s = expr.strip()
    while s.startswith("(") and s.endswith(")"):
        s = s[1:-1].strip()
    return s.upper() == "NULL"


#: Default session tuning. Sized for correctness on local[32] while
#: keeping every knob that matters at cluster scale explicit: AQE for
#: runtime re-planning (partition coalescing + skew-join splitting),
#: Arrow for any Pandas-UDF path, UTC so results are tz-stable.
DEFAULT_SPARK_CONF: dict[str, str] = {
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.ui.enabled": "false",
}


class Engine:
    """The destination: a validated Spark session + the CSV create
    sink + the Tier-B SQL surface over whatever it loaded."""

    def __init__(
        self,
        spark: SparkSession,
        config: Config,
        type_options: TypeOptions = DEFAULT_OPTIONS,
    ):
        self.spark = spark
        self.config = config
        self.tag = random_alphanum()
        # H2-compat function aliases (BITAND, ISO_WEEK, TRUNCATE, ...)
        # — session-scoped SQL-defined functions, idempotent
        from .h2_functions import register_h2_functions

        register_h2_functions(spark)
        self.sink = CsvCreateSink(spark, type_options)
        self._servers: list[Any] = []
        #: True iff an external SQL endpoint is actually serving. The
        #: reference's PG/TCP server is what makes tables externally
        #: queryable (H2Server.scala:60-84); a degraded no-op boot must
        #: be visible in engine state, not only in an info log.
        self.endpoint_started: bool = False
        self._sequences = None
        self._constraints = None
        self._views = None
        self._colmeta = None
        self._schemas = None
        #: session current schema (H2 SET SCHEMA; casefolded key).
        #: Unqualified names resolve here; PUBLIC objects keep bare
        #: logical names, schema objects live under "key.<name>".
        self.current_schema: str = "public"
        #: H2 ``SET SCHEMA_SEARCH_PATH s1, s2, ...`` (r16): after the
        #: current schema, unqualified TABLE names resolve through
        #: these casefolded keys in order (first match wins —
        #: Parser.readTableOrView). Session state, like
        #: current_schema; empty = strict current-schema (H2's
        #: default). See sql_dml._resolution_order.
        self.schema_search_path: list = []
        #: ANN serving: build ids whose assignment-side integrity this
        #: engine has already verified (see ann_topk) — keyed by index
        #: name. Invalidated whenever THIS engine rebuilds or appends.
        self._ann_verified: dict = {}
        self._text_verified: dict = {}
        self._graph_verified: dict = {}
        #: per-index persisted (prepared, nodes) frames of the LAST
        #: pagerank_served call — unpersisted on the next call so a
        #: long-lived session never accumulates pinned blocks
        #: (advisor r16)
        self._graph_frames: dict = {}
        #: effective Thrift listen port (may differ from the requested
        #: port when joining an already-running JVM-wide endpoint)
        self.endpoint_port: Optional[str] = None
        #: physical names this engine has already pushed through
        #: _ensure_registered — memo so the hot read path
        #: (engine.table on every probe/statement) pays the
        #: session-catalog RPC once per table, not once per call
        self._registered: set = set()

    # -- lifecycle -----------------------------------------------------

    @classmethod
    def from_config(
        cls,
        raw_config: "str | bytes | dict",
        spark: Optional[SparkSession] = None,
        type_options: TypeOptions = DEFAULT_OPTIONS,
    ) -> "Engine":
        """config JSON → validated Engine (EP1). Raises
        MalformedConfiguration / ConnectionFailed."""
        config = Config.from_json(raw_config)
        if spark is None:
            builder = SparkSession.builder.appName("quasar-destination-h2-spark")
            if not SparkSession.getActiveSession():
                builder = builder.master("local[*]")
            conf = {**DEFAULT_SPARK_CONF, **config.spark_conf}
            conf["spark.sql.warehouse.dir"] = config.connection_uri.partition(";")[0]
            for k, v in conf.items():
                builder = builder.config(k, v)
            spark = builder.getOrCreate()
            # getOrCreate() on an already-active session ignores every
            # builder config — including the warehouse dir derived
            # from connectionUri. Silent config drop would violate the
            # reference's contract (the URI *is* the destination), so
            # surface it.
            want = conf["spark.sql.warehouse.dir"]
            got = spark.conf.get("spark.sql.warehouse.dir", "")
            if want not in got:
                log.warning(
                    "active SparkSession reused: configured warehouse %r "
                    "ignored (session uses %r); pass spark= explicitly or "
                    "stop the session first",
                    want,
                    got,
                )
        engine = cls(spark, config, type_options)
        engine.validate_connection()
        log.info("engine %s initialized (config: %s)", engine.tag, config.sanitized())
        if config.server is not None:
            engine._boot_servers()
        return engine

    def validate_connection(self) -> None:
        """Probe the session with SELECT 1 under a 10 s timeout —
        parity with validateConnection (H2DestinationModule.scala:75-81)."""
        # Executor deliberately NOT used as a context manager: the
        # with-block exit joins the worker thread, which would make a
        # hung probe block forever instead of honoring the 10 s bound
        # (Connection.isValid(10) does bound the wait).
        pool = ThreadPoolExecutor(max_workers=1, thread_name_prefix="h2spark-probe")
        try:
            fut = pool.submit(lambda: self.spark.sql("SELECT 1").collect())
            rows = fut.result(timeout=VALIDATION_TIMEOUT_S)
            if not rows or rows[0][0] != 1:
                raise ConnectionFailed("probe query returned wrong result")
        except ConnectionFailed:
            raise
        except FutTimeout as e:
            raise ConnectionFailed(
                f"probe query timed out after {VALIDATION_TIMEOUT_S}s"
            ) from e
        except Exception as e:
            raise ConnectionFailed(str(e)) from e
        finally:
            # non-blocking: never join a possibly-hung probe thread
            pool.shutdown(wait=False, cancel_futures=True)

    def _boot_servers(self) -> None:
        """Init script, then external endpoints — order parity with
        H2Server.scala:33-39."""
        from .server import run_init_script, start_sql_endpoint

        assert self.config.server is not None
        if self.config.server.init is not None:
            run_init_script(self.spark, self.config.server.init)
        for args in (self.config.server.tcp_args, self.config.server.pg_args):
            if args is not None:
                srv = start_sql_endpoint(self.spark, args)
                if srv is not None:
                    handle, port = srv
                    self._servers.append(handle)
                    self.endpoint_port = port
        self.endpoint_started = bool(self._servers)
        if self.endpoint_started:
            # wire clients introspect on connect; publish the catalog
            # now AND republish on every later catalog/sequence
            # mutation (three driver-only view statements per change —
            # bounded; the hook exists only on serving engines, so
            # batch-load sessions never pay it)
            self.refresh_information_schema()
            self.sink.on_catalog_change = self._republish_info_schema

    def close(self) -> None:
        """Release servers (session is shared; caller stops Spark)."""
        from .server import stop_sql_endpoint

        while self._servers:
            stop_sql_endpoint(self._servers.pop())
        self.endpoint_started = False

    def build_ivf_index(
        self,
        name: str,
        emb: DataFrame,
        n_list: int = 16,
        kmeans_iters: int = 2,
        n_buckets: int = 32,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> None:
        """[EXT] Build-once ANN index lifecycle: k-means-refine the
        IVF coarse quantizer (``kmeans_iters`` = 0 keeps the md5
        seeds), materialize the centroids as ``{name}_centroids``
        (n_list rows) and the assignment as ``{name}_assigned``
        BUCKETED by centroid_id — every subsequent :meth:`ann_topk`
        probe joins co-located inverted lists with no corpus-side
        shuffle (the semantic_dedup ``assigned=`` story, productized;
        pinned by tests/test_bucketing.py::test_ann_index_lifecycle).
        Rebuild cost is paid ONCE per corpus refresh, probes pay
        only their own bounded work."""
        from pyspark.sql import functions as F

        from .operators import similarity

        cents = (
            similarity.kmeans_refine(
                emb, id_col, vec_col, n_list, iters=kmeans_iters
            )
            if kmeans_iters
            else similarity.ivf_centroids(
                emb, id_col, vec_col, n_list
            ).localCheckpoint()
        )
        # the stored assignment carries sim_micro (the winning
        # 6-rounded cosine in integer micro-units): appends need it
        # for the drift instrument, and it costs nothing extra — the
        # argmax already computes the score
        assigned = similarity._assign_scored(emb, cents, id_col, vec_col)
        # Both tables carry a shared build id, and the heavy write
        # (the bucketed assignment) lands FIRST: a failure between
        # the two writes leaves tables from DIFFERENT builds, whose
        # centroid ids would still join silently — ann_topk verifies
        # the build ids match and errors instead of serving wrong
        # neighbors from a torn rebuild.
        build_id = random_alphanum()
        self._ann_verified.pop(name, None)
        self.materialize_bucketed(
            f"{name}_assigned",
            assigned.withColumn("build_id", F.lit(build_id)),
            ["centroid_id"],
            n_buckets,
        )
        # the build's mean assigned similarity, frozen on the
        # centroids table — the drift baseline append_to_ivf_index
        # compares new batches against. Integer division of exact
        # micro sums -> engine-reproducible. One column-pruned scan
        # of the just-written int column; bounded driver work.
        row = (
            self.table(f"{name}_assigned")
            .agg(
                F.sum("sim_micro").alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()[0]
        )
        mean_micro = int(row.s) // int(row.n) if row.s is not None else None
        self.drop_table_if_exists(f"{name}_centroids")
        self.create_table_as(
            f"{name}_centroids",
            cents.withColumn("build_id", F.lit(build_id)).withColumn(
                "build_mean_sim_micro",
                F.lit(mean_micro).cast("bigint"),
            ),
        )

    def append_to_ivf_index(
        self,
        name: str,
        new_emb: DataFrame,
        n_buckets: int = 32,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """[EXT] Incremental index append — the nightly-crawl story
        for the ANN index (the dedup_cross_corpus analogue): assign
        ``new_emb`` against the STORED centroids (bounded n_list
        broadcast, one pass over the batch only — the corpus is
        never rescanned), append the scored assignment to the
        bucketed inverted lists under the SAME build id (probes keep
        reading co-located buckets; ann_topk's torn-build check
        still holds because the id matches), and return a one-row
        drift report:

        (appended_rows, batch_mean_sim_micro, build_mean_sim_micro,
        drift_micro) — drift_micro = build mean − batch mean
        assigned similarity, in integer micro-units. A batch drawn
        from the build's distribution scores near the build mean
        (small drift); a shifted batch fits the frozen centroids
        worse and drift grows — the REBUILD TRIGGER a 100 TB
        operator watches. Appending never re-trains: centroids stay
        frozen until a full ``build_ivf_index`` rebuild.

        ``n_buckets`` must match the build's (Spark refuses a
        mismatched bucket spec loudly). Appended rows ≡ what a
        rebuild-on-union would assign AGAINST THE SAME centroids —
        pinned by tests/test_bucketing.py."""
        from pyspark.sql import functions as F

        from .idents import storage_safe_name
        from .operators import similarity

        cents = self.table(f"{name}_centroids")
        cid = [
            r.build_id for r in cents.select("build_id").distinct().collect()
        ]
        if len(cid) != 1:
            raise ValueError(
                f"ANN index {name!r} centroids carry build ids {cid} — "
                "re-run build_ivf_index before appending"
            )
        build_mean = cents.select("build_mean_sim_micro").first()[0]
        batch = similarity._assign_scored(
            new_emb, cents.select("centroid_id", "cvec"), id_col, vec_col
        ).withColumn("build_id", F.lit(cid[0])).localCheckpoint()
        physical = storage_safe_name(f"{name}_assigned")
        self._ann_verified.pop(name, None)
        (
            batch.write.mode("append")
            .format("parquet")
            .bucketBy(n_buckets, "centroid_id")
            .sortBy("centroid_id")
            .saveAsTable(physical)
        )
        row = batch.agg(
            F.sum("sim_micro").alias("s"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        batch_mean = int(row.s) // int(row.n) if row.s is not None else None
        drift = (
            build_mean - batch_mean
            if build_mean is not None and batch_mean is not None
            else None
        )
        return self.spark.createDataFrame(
            [(int(row.n), batch_mean, build_mean, drift)],
            "appended_rows bigint, batch_mean_sim_micro bigint, "
            "build_mean_sim_micro bigint, drift_micro bigint",
        )

    def ann_topk(
        self,
        name: str,
        queries: DataFrame,
        k: int = 5,
        nprobe: int = 2,
        query_id_col: str = "query_id",
        query_vec_col: str = "qv",
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """[EXT] Query-table-driven ANN search over an index built by
        :meth:`build_ivf_index` — probes the stored bucketed
        inverted lists; no rebuild, no per-query replanning. Raises
        if the two index tables carry different build ids (a torn
        rebuild — see build_ivf_index)."""
        from .operators import similarity

        assigned = self.table(f"{name}_assigned")
        cents = self.table(f"{name}_centroids")
        cid = [r.build_id for r in cents.select("build_id").distinct().collect()]
        # DISTINCT over the assignment side, not limit(1): a torn
        # overwrite / bad append can leave rows from SEVERAL builds
        # interleaved, and a sampled single row can accidentally
        # match the centroids' id while wrong-build rows still
        # serve. The distinct is one column-pruned scan — too much
        # to pay on EVERY serving call at 100 TB, so the result is
        # memoized per build id: once this engine has verified the
        # assignment for the centroids' current id, later probes pay
        # only the n_list-row centroid check. Rebuilds get a fresh
        # id (cache miss -> re-verify); appends through
        # append_to_ivf_index invalidate the memo explicitly. An
        # out-of-band writer forging rows under a verified id is the
        # one case this trusts — the same trust the catalog's flock
        # protocol already extends to same-warehouse writers.
        if len(cid) == 1 and self._ann_verified.get(name) == cid[0]:
            aid = cid
        else:
            aid = sorted(
                r.build_id
                for r in assigned.select("build_id").distinct().collect()
            )
        if len(cid) != 1 or (aid and aid != cid):
            raise ValueError(
                f"ANN index {name!r} is torn (centroids build "
                f"{cid} vs assignment build {aid}) — re-run "
                "build_ivf_index"
            )
        if aid:
            self._ann_verified[name] = cid[0]
        return similarity.ann_search(
            assigned,
            cents,
            queries,
            k=k,
            nprobe=nprobe,
            query_id_col=query_id_col,
            query_vec_col=query_vec_col,
            id_col=id_col,
            vec_col=vec_col,
        )

    def build_pq_index(
        self,
        name: str,
        emb: DataFrame,
        m: int | None = None,
        k: int | None = None,
        kmeans_iters: int | None = None,
        n_buckets: int = 32,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> None:
        """[EXT] Build-once product-quantization index — the
        compressed sibling of :meth:`build_ivf_index`: train the
        per-subspace codebooks (similarity.pq_codebooks), encode the
        corpus, and store three tables: ``{name}_codebook`` (m x k
        rows), ``{name}_codes`` (the M-int compressed corpus — what
        probes scan; 16-64x fewer bytes than the vectors) and
        ``{name}_vectors`` (the floats, read back ONLY for the
        per-query shortlist rerank). Codes and vectors are BUCKETED
        by ``vec_id``: the ADC per-(query, vector) aggregation
        groups on a superset of the bucket key, so the stored
        distribution satisfies it and the probe's score aggregation
        runs WITHOUT an index-side exchange (pinned by
        tests/test_bucketing.py::test_pq_index_lifecycle).

        Torn-state discipline (the build_ivf_index protocol): all
        three tables share a build id, heavy writes land first, and
        :meth:`pq_search` verifies agreement before serving."""
        from pyspark.sql import functions as F

        from .operators import similarity

        m = similarity.PQ_M if m is None else m
        k = similarity.PQ_K if k is None else k
        iters = similarity.PQ_ITERS if kmeans_iters is None else kmeans_iters
        cb = similarity.pq_codebooks(emb, m, k, iters, id_col, vec_col)
        codes = similarity.pq_encode(emb, cb, m, id_col, vec_col)
        build_id = random_alphanum()
        self._ann_verified.pop(f"pq:{name}", None)
        self.materialize_bucketed(
            f"{name}_codes",
            codes.withColumnRenamed(id_col, "vec_id").withColumn(
                "build_id", F.lit(build_id)
            ),
            ["vec_id"],
            n_buckets,
        )
        self.materialize_bucketed(
            f"{name}_vectors",
            emb.select(
                F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
            ).withColumn("build_id", F.lit(build_id)),
            ["vec_id"],
            n_buckets,
        )
        self.drop_table_if_exists(f"{name}_codebook")
        self.create_table_as(
            f"{name}_codebook",
            cb.withColumn("build_id", F.lit(build_id))
            .withColumn("pq_m", F.lit(m).cast("int"))
            .withColumn("pq_k", F.lit(k).cast("int")),
        )

    def pq_search(
        self,
        name: str,
        queries: DataFrame,
        topk: int = 10,
        shortlist: int | None = None,
        rerank: bool = True,
        query_id_col: str = "query_id",
        query_vec_col: str = "qv",
        exclude_query_ids: bool = True,
    ) -> DataFrame:
        """[EXT] Query-table-driven search over a PQ index built by
        :meth:`build_pq_index`: per query, a bounded M x K ADC
        lookup table scores the stored compressed codes in one
        codes pass (shuffle-free on the index side — the codes'
        vec_id bucketing satisfies the score aggregation), then the
        ``shortlist`` best candidates are reranked with exact cosine
        against the stored vectors (``rerank=False`` returns the raw
        ADC ranking: columns (query_id, vec_id, score_micro, rank)
        instead of (query_id, vec_id, sim, rank)).
        ``exclude_query_ids=True`` (the default) drops candidates
        whose vec_id equals the query's id — right when query ids
        live in the corpus id space (corpus-drawn queries, or
        callers re-using doc ids); pass False when the external
        query id space may COLLIDE with vec_ids, or a same-id corpus
        vector is silently excluded from that query's top-k. Raises
        on a torn build (mismatched build ids across the three
        tables); the heavy distinct scans are memoized per build id
        like ann_topk's."""
        from .operators import similarity

        codes = self.table(f"{name}_codes")
        vectors = self.table(f"{name}_vectors")
        cb = self.table(f"{name}_codebook")
        # ONE collect serves the freshness check AND pq_m (r16: the
        # steady-state probe used to pay two driver actions on the
        # bounded codebook before searching); the memo carries
        # (build_id, m) so the verified path never re-reads pq_m
        meta = cb.select("build_id", "pq_m").distinct().collect()
        cid = sorted({r.build_id for r in meta})
        memo_key = f"pq:{name}"
        memo = self._ann_verified.get(memo_key)
        if len(cid) == 1 and memo and memo[0] == cid[0]:
            heavy = cid
            m = memo[1]
        else:
            heavy = sorted(
                set(
                    r.build_id
                    for r in codes.select("build_id")
                    .distinct()
                    .union(vectors.select("build_id").distinct())
                    .collect()
                )
            )
            m = int(meta[0].pq_m) if meta else similarity.PQ_M
        if len(cid) != 1 or (heavy and heavy != cid):
            raise ValueError(
                f"PQ index {name!r} is torn (codebook build {cid} vs "
                f"codes/vectors builds {heavy}) — re-run build_pq_index"
            )
        if heavy:
            self._ann_verified[memo_key] = (cid[0], m)
        lut = similarity.pq_query_lut(
            queries, cb.select("m", "code", "cvec"), m, query_id_col, query_vec_col
        )
        n_short = similarity.PQ_SHORTLIST if shortlist is None else shortlist
        if not rerank:
            return similarity.ann_pq_topk(
                codes.select("vec_id", "m", "code"),
                lut,
                topk,
                exclude_query_ids,
            )
        return similarity.ann_pq_rerank(
            vectors.select("vec_id", "embedding"),
            codes.select("vec_id", "m", "code"),
            lut,
            topk,
            n_short,
            queries=queries,
            query_id_col=query_id_col,
            query_vec_col=query_vec_col,
            exclude_self=exclude_query_ids,
        )

    def build_ivfpq_index(
        self,
        name: str,
        emb: DataFrame,
        n_list: int = 16,
        kmeans_iters: int = 2,
        m: int | None = None,
        k: int | None = None,
        pq_iters: int | None = None,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> None:
        """[EXT] Build-once IVF+PQ index (the IVFADC architecture of
        Jegou et al., PAMI 2011) — the composition of this engine's
        two ANN lifecycles: IVF bounds WHICH vectors a probe touches
        (nprobe of n_list inverted lists), PQ bounds what each
        touched vector COSTS (M codes instead of dim floats). Probe
        I/O at 100 TB ~ corpus x (nprobe/n_list) x (1/compression).

        Stores four tables under a shared build id:
        ``{name}_vectors`` (vec_id, centroid_id, embedding) and
        ``{name}_codes`` (vec_id, centroid_id, m, code), both
        directory-PARTITIONED by centroid_id so a probe's broadcast
        list join dynamically prunes the files read to the probed
        lists; ``{name}_centroids`` (the k-means-refined coarse
        quantizer) and ``{name}_codebook`` (the m x k PQ codebooks).
        The PQ encode reuses the stored vectors table (its
        centroid_id rides the code argmax), so the build costs the
        coarse assignment + codebook training + one encode pass —
        never a join between corpus-sized frames. Heavy writes land
        first; :meth:`ivfpq_search` verifies build-id agreement
        before serving (the build_ivf_index torn-state protocol)."""
        from pyspark.sql import functions as F

        from .operators import similarity

        m = similarity.PQ_M if m is None else m
        k = similarity.PQ_K if k is None else k
        iters = similarity.PQ_ITERS if pq_iters is None else pq_iters
        cents = (
            similarity.kmeans_refine(
                emb, id_col, vec_col, n_list, iters=kmeans_iters
            )
            if kmeans_iters
            else similarity.ivf_centroids(
                emb, id_col, vec_col, n_list
            ).localCheckpoint()
        )
        cb = similarity.pq_codebooks(emb, m, k, iters, id_col, vec_col)
        build_id = random_alphanum()
        self._ann_verified.pop(f"ivfpq:{name}", None)
        # the stored assignment carries sim_micro (the winning
        # 6-rounded cosine in integer micro-units): appends need it
        # for the drift instrument, and the argmax already computes it
        assigned = similarity._assign_scored(emb, cents, id_col, vec_col)
        self.materialize_partitioned(
            f"{name}_vectors",
            assigned.select(
                F.col(id_col).alias("vec_id"),
                F.col(vec_col).alias("embedding"),
                "sim_micro",
                F.lit(build_id).alias("build_id"),
                "centroid_id",
            ),
            ["centroid_id"],
        )
        stored = self.table(f"{name}_vectors")
        codes = similarity.ivfpq_encode(
            stored, cents, cb, m, dim=similarity.EMBED_DIM, assigned=stored
        )
        self.materialize_partitioned(
            f"{name}_codes",
            codes.select(
                "vec_id",
                "m",
                "code",
                F.lit(build_id).alias("build_id"),
                "centroid_id",
            ),
            ["centroid_id"],
        )
        # the build's mean assigned similarity, frozen on the
        # centroids table — the drift baseline append_to_ivfpq_index
        # compares new batches against (the build_ivf_index protocol)
        row = (
            self.table(f"{name}_vectors")
            .agg(
                F.sum("sim_micro").alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()[0]
        )
        mean_micro = int(row.s) // int(row.n) if row.s is not None else None
        self.drop_table_if_exists(f"{name}_centroids")
        self.create_table_as(
            f"{name}_centroids",
            cents.withColumn("build_id", F.lit(build_id)).withColumn(
                "build_mean_sim_micro",
                F.lit(mean_micro).cast("bigint"),
            ),
        )
        self.drop_table_if_exists(f"{name}_codebook")
        self.create_table_as(
            f"{name}_codebook",
            cb.withColumn("build_id", F.lit(build_id))
            .withColumn("pq_m", F.lit(m).cast("int"))
            .withColumn("pq_k", F.lit(k).cast("int")),
        )

    def append_to_ivfpq_index(
        self,
        name: str,
        new_emb: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """[EXT] Incremental append to the composed IVF+PQ index —
        the nightly-crawl story extended to both quantizers: the
        batch is assigned against the STORED centroids and encoded
        against the STORED codebooks (two bounded broadcasts, one
        pass over the batch only — the corpus is never rescanned,
        neither quantizer re-trains), appended to BOTH
        centroid-partitioned tables under the build's id (probes
        keep pruning to their lists; ivfpq_search's torn check still
        holds because the id matches), and returns the one-row drift
        report of :meth:`append_to_ivf_index` — (appended_rows,
        batch_mean_sim_micro, build_mean_sim_micro, drift_micro),
        the REBUILD TRIGGER. Appended codes ≡ what a rebuild against
        the SAME quantizers would assign (pinned by
        tests/test_bucketing.py::test_ivfpq_index_append). The two
        table appends are not atomic; a failure between them is
        caught by ivfpq_search's m-codes-per-vector count identity
        (checked whenever the build-id memo misses), which refuses
        to serve a half-appended index."""
        from pyspark.sql import functions as F

        from .idents import storage_safe_name
        from .operators import similarity

        cents = self.table(f"{name}_centroids")
        cb = self.table(f"{name}_codebook")
        cid = sorted(
            set(
                r.build_id
                for r in cents.select("build_id")
                .distinct()
                .union(cb.select("build_id").distinct())
                .collect()
            )
        )
        if len(cid) != 1:
            raise ValueError(
                f"IVFPQ index {name!r} quantizers carry build ids {cid} — "
                "re-run build_ivfpq_index before appending"
            )
        build_mean = cents.select("build_mean_sim_micro").first()[0]
        mrow = cb.select("pq_m").first()
        m = int(mrow.pq_m) if mrow else similarity.PQ_M
        batch = similarity._assign_scored(
            new_emb, cents.select("centroid_id", "cvec"), id_col, vec_col
        ).localCheckpoint()
        codes = similarity.ivfpq_encode(
            batch,
            cents,
            cb.select("m", "code", "cvec"),
            m,
            id_col,
            vec_col,
            assigned=batch,
        ).localCheckpoint()
        self._ann_verified.pop(f"ivfpq:{name}", None)
        (
            batch.select(
                F.col(id_col).alias("vec_id"),
                F.col(vec_col).alias("embedding"),
                "sim_micro",
                F.lit(cid[0]).alias("build_id"),
                "centroid_id",
            )
            .write.mode("append")
            .format("parquet")
            .partitionBy("centroid_id")
            .saveAsTable(storage_safe_name(f"{name}_vectors"))
        )
        (
            codes.select(
                "vec_id",
                "m",
                "code",
                F.lit(cid[0]).alias("build_id"),
                "centroid_id",
            )
            .write.mode("append")
            .format("parquet")
            .partitionBy("centroid_id")
            .saveAsTable(storage_safe_name(f"{name}_codes"))
        )
        row = batch.agg(
            F.sum("sim_micro").alias("s"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        batch_mean = int(row.s) // int(row.n) if row.s is not None else None
        drift = (
            build_mean - batch_mean
            if build_mean is not None and batch_mean is not None
            else None
        )
        return self.spark.createDataFrame(
            [(int(row.n), batch_mean, build_mean, drift)],
            "appended_rows bigint, batch_mean_sim_micro bigint, "
            "build_mean_sim_micro bigint, drift_micro bigint",
        )

    def ivfpq_search(
        self,
        name: str,
        queries: DataFrame,
        topk: int = 10,
        nprobe: int = 2,
        shortlist: int | None = None,
        rerank: bool = True,
        query_id_col: str = "query_id",
        query_vec_col: str = "qv",
        filter_ids: DataFrame | None = None,
        exclude_query_ids: bool = True,
    ) -> DataFrame:
        """[EXT] Query-table-driven search over an IVF+PQ index built
        by :meth:`build_ivfpq_index`: per query, the nprobe nearest
        coarse lists are selected against the bounded stored
        centroids, the ADC lookup table scores ONLY the codes in
        those lists (the broadcast probe join dynamically prunes the
        partitioned codes scan to nprobe/n_list of the files), and
        the ``shortlist`` best candidates are exact-cosine reranked
        against the stored vectors — whose (centroid_id, vec_id)
        point lookups prune the same way. ``rerank=False`` returns
        the raw ADC ranking (query_id, vec_id, centroid_id,
        score_micro, rank). ``filter_ids`` (a frame with a vec_id
        column) restricts candidates BEFORE scoring — the
        filtered-vector-search form; see
        :func:`operators.similarity.ann_ivfpq_topk`.
        ``exclude_query_ids`` as in :meth:`pq_search`: pass False
        when the external query id space may collide with vec_ids.
        Raises on a torn build; heavy distinct scans memoized per
        build id like ann_topk's."""
        from .operators import similarity

        from pyspark.sql import functions as F

        codes = self.table(f"{name}_codes")
        vectors = self.table(f"{name}_vectors")
        cents = self.table(f"{name}_centroids")
        cb = self.table(f"{name}_codebook")
        # ONE collect over the two bounded quantizer tables serves the
        # freshness check AND pq_m (r16: previously two driver
        # actions per probe); the memo carries (build_id, m) so the
        # verified steady state never re-reads pq_m either
        meta = (
            cents.select(
                "build_id", F.lit(None).cast("int").alias("pq_m")
            )
            .unionByName(cb.select("build_id", "pq_m"))
            .distinct()
            .collect()
        )
        cid = sorted({r.build_id for r in meta})
        m_vals = sorted({int(r.pq_m) for r in meta if r.pq_m is not None})
        m = m_vals[0] if m_vals else similarity.PQ_M
        memo_key = f"ivfpq:{name}"
        memo = self._ann_verified.get(memo_key)
        if len(cid) == 1 and memo and memo[0] == cid[0]:
            heavy = cid
            m = memo[1]
        else:
            # a failure BETWEEN append_to_ivfpq_index's two table
            # appends leaves vectors without codes under the SAME
            # build id — invisible to the id check, silently absent
            # from ADC scoring. Every vector carries exactly m code
            # rows, so the count identity detects the tear. The ids
            # AND both counts ride ONE per-build aggregation job
            # (r16: previously three — a distinct-union collect plus
            # two count jobs), paid once per build/append, never per
            # steady-state probe.
            stats = (
                codes.groupBy("build_id")
                .agg(F.count(F.lit(1)).alias("n"))
                .select("build_id", "n", F.lit("codes").alias("side"))
                .unionByName(
                    vectors.groupBy("build_id")
                    .agg(F.count(F.lit(1)).alias("n"))
                    .select("build_id", "n", F.lit("vectors").alias("side"))
                )
                .collect()
            )
            heavy = sorted({r.build_id for r in stats})
            n_codes = sum(int(r.n) for r in stats if r.side == "codes")
            n_vecs = sum(int(r.n) for r in stats if r.side == "vectors")
            if n_codes != m * n_vecs:
                raise ValueError(
                    f"IVFPQ index {name!r} is torn: {n_vecs} vectors "
                    f"but {n_codes} code rows (expected {m * n_vecs}) "
                    "— a failed append; re-run build_ivfpq_index"
                )
        if len(cid) != 1 or (heavy and heavy != cid):
            raise ValueError(
                f"IVFPQ index {name!r} is torn (quantizer builds {cid} vs "
                f"codes/vectors builds {heavy}) — re-run build_ivfpq_index"
            )
        if heavy:
            self._ann_verified[memo_key] = (cid[0], m)
        probes = similarity.ivfpq_probe_lists(
            queries,
            cents.select("centroid_id", "cvec"),
            nprobe,
            query_id_col,
            query_vec_col,
        )
        lut = similarity.pq_query_lut(
            queries,
            cb.select("m", "code", "cvec"),
            m,
            query_id_col,
            query_vec_col,
        )
        if not rerank:
            return similarity.ann_ivfpq_topk(
                codes.select("vec_id", "centroid_id", "m", "code"),
                lut,
                probes,
                topk,
                allowed=filter_ids,
                exclude_self=exclude_query_ids,
            )
        n_short = similarity.PQ_SHORTLIST if shortlist is None else shortlist
        short = similarity.ann_ivfpq_topk(
            codes.select("vec_id", "centroid_id", "m", "code"),
            lut,
            probes,
            n_short,
            allowed=filter_ids,
            exclude_self=exclude_query_ids,
        )
        return similarity.ann_ivfpq_rerank(
            vectors.select("vec_id", "centroid_id", "embedding"),
            short,
            queries,
            topk,
            query_id_col=query_id_col,
            query_vec_col=query_vec_col,
        )

    def build_ivfbq_index(
        self,
        name: str,
        emb: DataFrame,
        n_list: int = 16,
        kmeans_iters: int = 2,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> str:
        """[EXT] Build-once IVF+BQ index — the coarse quantizer
        composed over the 1-bit sign codes, closing the one
        O(corpus)-per-batch probe in the ANN family (the flat
        Hamming scan of ``ann_bq_topk``): IVF bounds WHICH codes a
        probe touches (nprobe of n_list inverted lists), sign
        quantization bounds what each touched code COSTS (16 B of
        packed bits vs 256 B of float32). Probe I/O at 100 TB ~
        corpus x (nprobe/n_list) x (1/16).

        Stores three tables under a shared build id:
        ``{name}_vectors`` (vec_id, embedding, sim_micro,
        centroid_id) and ``{name}_codes`` (vec_id, sig_lo, sig_hi,
        centroid_id), both directory-PARTITIONED by centroid_id so a
        probe's broadcast list join dynamically prunes the files
        read to the probed lists; ``{name}_centroids`` (the
        k-means-refined coarse quantizer, carrying the build-mean
        drift baseline). Unlike IVFPQ there is NO codebook table —
        the sign quantizer is parameterless, so the coarse centroids
        are the only trained state. The sign encode rides the stored
        assignment (zero extra corpus pass); heavy writes land
        first; :meth:`ivfbq_search` verifies build-id agreement and
        the 1-code-per-vector count identity before serving (the
        build_ivf_index torn-state protocol)."""
        from pyspark.sql import functions as F

        from .operators import similarity

        cents = (
            similarity.kmeans_refine(
                emb, id_col, vec_col, n_list, iters=kmeans_iters
            )
            if kmeans_iters
            else similarity.ivf_centroids(
                emb, id_col, vec_col, n_list
            ).localCheckpoint()
        )
        build_id = random_alphanum()
        self._ann_verified.pop(f"ivfbq:{name}", None)
        assigned = similarity._assign_scored(emb, cents, id_col, vec_col)
        self.materialize_partitioned(
            f"{name}_vectors",
            assigned.select(
                F.col(id_col).alias("vec_id"),
                F.col(vec_col).alias("embedding"),
                "sim_micro",
                F.lit(build_id).alias("build_id"),
                "centroid_id",
            ),
            ["centroid_id"],
        )
        stored = self.table(f"{name}_vectors")
        codes = similarity.ivfbq_encode(
            stored, cents, assigned=stored
        )
        self.materialize_partitioned(
            f"{name}_codes",
            codes.select(
                "vec_id",
                "sig_lo",
                "sig_hi",
                F.lit(build_id).alias("build_id"),
                "centroid_id",
            ),
            ["centroid_id"],
        )
        row = (
            self.table(f"{name}_vectors")
            .agg(
                F.sum("sim_micro").alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()[0]
        )
        mean_micro = int(row.s) // int(row.n) if row.s is not None else None
        self.drop_table_if_exists(f"{name}_centroids")
        self.create_table_as(
            f"{name}_centroids",
            cents.withColumn("build_id", F.lit(build_id)).withColumn(
                "build_mean_sim_micro",
                F.lit(mean_micro).cast("bigint"),
            ),
        )
        # returned so build_cascade_index composes without re-reading
        # the just-written centroids (r16)
        return build_id

    def append_to_ivfbq_index(
        self,
        name: str,
        new_emb: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """[EXT] Incremental append to the IVF+BQ index: the batch is
        assigned against the STORED centroids (one bounded broadcast,
        one pass over the batch only — the corpus is never rescanned)
        and sign-packed in the same projection; both
        centroid-partitioned tables grow under the build's id, and
        the one-row drift report of :meth:`append_to_ivf_index`
        returns — (appended_rows, batch_mean_sim_micro,
        build_mean_sim_micro, drift_micro), the REBUILD TRIGGER.
        The sign quantizer being parameterless, appended codes are
        BY CONSTRUCTION what a rebuild against the same centroids
        would store — the only drift that exists is coarse-
        assignment drift, which the report measures. The two table
        appends are not atomic; a failure between them is caught by
        ivfbq_search's 1-code-per-vector count identity (checked
        whenever the build-id memo misses)."""
        from pyspark.sql import functions as F

        from .idents import storage_safe_name
        from .operators import similarity

        cents = self.table(f"{name}_centroids")
        cid = [
            r.build_id
            for r in cents.select("build_id").distinct().collect()
        ]
        if len(cid) != 1:
            raise ValueError(
                f"IVFBQ index {name!r} centroids carry build ids "
                f"{sorted(cid)} — re-run build_ivfbq_index before appending"
            )
        build_mean = cents.select("build_mean_sim_micro").first()[0]
        batch = similarity._assign_scored(
            new_emb, cents.select("centroid_id", "cvec"), id_col, vec_col
        ).localCheckpoint()
        self._ann_verified.pop(f"ivfbq:{name}", None)
        (
            batch.select(
                F.col(id_col).alias("vec_id"),
                F.col(vec_col).alias("embedding"),
                "sim_micro",
                F.lit(cid[0]).alias("build_id"),
                "centroid_id",
            )
            .write.mode("append")
            .format("parquet")
            .partitionBy("centroid_id")
            .saveAsTable(storage_safe_name(f"{name}_vectors"))
        )
        (
            similarity.ivfbq_encode(batch, cents, id_col, vec_col, assigned=batch)
            .select(
                "vec_id",
                "sig_lo",
                "sig_hi",
                F.lit(cid[0]).alias("build_id"),
                "centroid_id",
            )
            .write.mode("append")
            .format("parquet")
            .partitionBy("centroid_id")
            .saveAsTable(storage_safe_name(f"{name}_codes"))
        )
        row = batch.agg(
            F.sum("sim_micro").alias("s"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        batch_mean = int(row.s) // int(row.n) if row.s is not None else None
        drift = (
            build_mean - batch_mean
            if build_mean is not None and batch_mean is not None
            else None
        )
        return self.spark.createDataFrame(
            [(int(row.n), batch_mean, build_mean, drift)],
            "appended_rows bigint, batch_mean_sim_micro bigint, "
            "build_mean_sim_micro bigint, drift_micro bigint",
        )

    def ivfbq_search(
        self,
        name: str,
        queries: DataFrame,
        topk: int = 10,
        nprobe: int = 2,
        shortlist: int | None = None,
        rerank: bool = True,
        query_id_col: str = "query_id",
        query_vec_col: str = "qv",
        filter_ids: DataFrame | None = None,
        exclude_query_ids: bool = True,
    ) -> DataFrame:
        """[EXT] Query-table-driven search over an IVF+BQ index built
        by :meth:`build_ivfbq_index`: per query, the nprobe nearest
        coarse lists are selected against the bounded stored
        centroids, the query's own sign bits score ONLY the codes in
        those lists by XOR+popcount (the broadcast probe join
        dynamically prunes the partitioned codes scan to
        nprobe/n_list of the files), and the ``shortlist`` best
        candidates are exact-cosine reranked against the stored
        vectors — whose (centroid_id, vec_id) point lookups prune
        the same way. ``rerank=False`` returns the raw Hamming
        ranking (query_id, vec_id, centroid_id, hamming, rank).
        ``filter_ids`` / ``exclude_query_ids`` as in
        :meth:`ivfpq_search`. Raises on a torn build (mismatched
        build ids, or a half-appended index caught by the
        1-code-per-vector count identity); heavy distinct scans
        memoized per build id like ann_topk's."""
        from .operators import similarity

        from pyspark.sql import functions as F

        codes = self.table(f"{name}_codes")
        vectors = self.table(f"{name}_vectors")
        cents = self.table(f"{name}_centroids")
        cid = [
            r.build_id
            for r in cents.select("build_id").distinct().collect()
        ]
        memo_key = f"ivfbq:{name}"
        if len(cid) == 1 and self._ann_verified.get(memo_key) == cid[0]:
            heavy = cid
        else:
            # a failure BETWEEN append_to_ivfbq_index's two appends
            # leaves vectors without sign codes under the SAME build
            # id — invisible to the id check, silently absent from
            # Hamming scoring. Every vector carries exactly one code
            # row; the ids AND both counts ride ONE per-build
            # aggregation job (r16: previously a distinct-union
            # collect plus two count jobs), paid once per
            # build/append, never per steady-state probe.
            stats = (
                codes.groupBy("build_id")
                .agg(F.count(F.lit(1)).alias("n"))
                .select("build_id", "n", F.lit("codes").alias("side"))
                .unionByName(
                    vectors.groupBy("build_id")
                    .agg(F.count(F.lit(1)).alias("n"))
                    .select("build_id", "n", F.lit("vectors").alias("side"))
                )
                .collect()
            )
            heavy = sorted({r.build_id for r in stats})
            n_codes = sum(int(r.n) for r in stats if r.side == "codes")
            n_vecs = sum(int(r.n) for r in stats if r.side == "vectors")
            if n_codes != n_vecs:
                raise ValueError(
                    f"IVFBQ index {name!r} is torn: {n_vecs} vectors "
                    f"but {n_codes} code rows — a failed append; "
                    "re-run build_ivfbq_index"
                )
        if len(cid) != 1 or (heavy and heavy != sorted(cid)):
            raise ValueError(
                f"IVFBQ index {name!r} is torn (centroid builds "
                f"{sorted(cid)} vs codes/vectors builds {heavy}) — "
                "re-run build_ivfbq_index"
            )
        if heavy:
            self._ann_verified[memo_key] = cid[0]
        probes = similarity.ivfpq_probe_lists(
            queries,
            cents.select("centroid_id", "cvec"),
            nprobe,
            query_id_col,
            query_vec_col,
        )
        qc = similarity.bq_query_codes(queries, query_id_col, query_vec_col)
        if not rerank:
            return similarity.ann_ivfbq_topk(
                codes.select("vec_id", "centroid_id", "sig_lo", "sig_hi"),
                qc,
                probes,
                topk,
                allowed=filter_ids,
                exclude_self=exclude_query_ids,
            )
        n_short = similarity.PQ_SHORTLIST if shortlist is None else shortlist
        short = similarity.ann_ivfbq_topk(
            codes.select("vec_id", "centroid_id", "sig_lo", "sig_hi"),
            qc,
            probes,
            n_short,
            allowed=filter_ids,
            exclude_self=exclude_query_ids,
        )
        return similarity.ann_ivfpq_rerank(
            vectors.select("vec_id", "centroid_id", "embedding"),
            short,
            queries,
            topk,
            query_id_col=query_id_col,
            query_vec_col=query_vec_col,
        )

    def build_cascade_index(
        self,
        name: str,
        emb: DataFrame,
        n_list: int = 16,
        kmeans_iters: int = 2,
        m: int | None = None,
        k: int | None = None,
        pq_iters: int | None = None,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> None:
        """[EXT] Build-once CASCADE index — every compression tier of
        the production retrieval funnel in ONE build: the IVF+BQ
        composed index (:meth:`build_ivfbq_index` — coarse quantizer
        + centroid-partitioned 16 B sign codes + vectors) PLUS a
        centroid-PARTITIONED product-quantization code table and its
        trained codebook, all sharing the IVFBQ build id. Serving
        (:meth:`cascade_search`) then runs coarse prune -> wide
        Hamming cut -> PQ ADC narrow -> exact rerank with EVERY
        stage's scan dynamically pruned to the probed lists: the PQ
        codes being partitioned like the sign codes is what lifts
        the r11 funnel's one remaining full-table read (the PQ-narrow
        join over unpartitioned codes) into the same
        nprobe/n_list-pruned shape as the other stages. Training
        reads the STORED vectors (deterministic: the md5-seeded PQ
        init keys on vec_id, so codebooks equal an emb-direct
        train)."""
        from pyspark.sql import functions as F

        from .operators import similarity

        build_id = self.build_ivfbq_index(
            name, emb, n_list, kmeans_iters, id_col, vec_col
        )
        m = similarity.PQ_M if m is None else m
        k = similarity.PQ_K if k is None else k
        iters = similarity.PQ_ITERS if pq_iters is None else pq_iters
        stored = self.table(f"{name}_vectors")
        # pq_codebooks returns a LocalRelation since r16 — no
        # checkpoint needed to make its consumers free
        cb = similarity.pq_codebooks(
            stored, m, k, iters, "vec_id", "embedding"
        )
        codes = similarity.pq_encode(stored, cb, m, "vec_id", "embedding")
        # one build-time corpus join pins each code row to its list so
        # the SERVING scan prunes; steady-state probes never pay it
        self.materialize_partitioned(
            f"{name}_codes_pq",
            codes.join(
                stored.select("vec_id", "centroid_id"), "vec_id"
            ).select(
                "vec_id",
                "m",
                "code",
                F.lit(build_id).alias("build_id"),
                "centroid_id",
            ),
            ["centroid_id"],
        )
        self.drop_table_if_exists(f"{name}_codebook")
        self.create_table_as(
            f"{name}_codebook",
            cb.withColumn("build_id", F.lit(build_id))
            .withColumn("pq_m", F.lit(m).cast("int"))
            .withColumn("pq_k", F.lit(k).cast("int")),
        )
        self._ann_verified.pop(f"cascade:{name}", None)

    def cascade_search(
        self,
        name: str,
        queries: DataFrame,
        topk: int = 10,
        nprobe: int = 2,
        hamming_cut: int = 200,
        pq_narrow: int = 50,
        query_id_col: str = "query_id",
        query_vec_col: str = "qv",
        filter_ids: DataFrame | None = None,
        exclude_query_ids: bool = True,
    ) -> DataFrame:
        """[EXT] The production retrieval FUNNEL over a built cascade
        index (r11 verdict task 3 — the steady-state serving split of
        ``ann_cascade_search``, which trains per run): (1) the
        bounded stored centroids pick each query's nprobe lists, (2)
        XOR+popcount over ONLY those lists' 16 B sign codes keeps
        ``hamming_cut`` candidates (the probe join dynamically prunes
        the partitioned codes scan to nprobe/n_list of the files),
        (3) the PQ ADC re-scores exactly those pairs from the
        centroid-partitioned PQ codes — the (centroid_id, vec_id)
        broadcast prunes this scan the same way — and narrows to
        ``pq_narrow``, (4) the exact cosine rerank reads only the
        survivors' float vectors via the same pruned point lookups.
        Probe I/O ~ corpus x (nprobe/n_list) x (17 B/256 B of the
        compressed tiers) + bounded-pair work; no stage rescans the
        corpus. Torn-build discipline: all five tables must agree on
        one build id and both code tables must carry exactly one row
        per vector (memoized per build like :meth:`ivfbq_search`)."""
        from .operators import similarity

        codes_bq = self.table(f"{name}_codes")
        codes_pq = self.table(f"{name}_codes_pq")
        vectors = self.table(f"{name}_vectors")
        cents = self.table(f"{name}_centroids")
        cb = self.table(f"{name}_codebook")
        cid = [
            r.build_id
            for r in cents.select("build_id").distinct().collect()
        ]
        memo_key = f"cascade:{name}"
        memo = self._ann_verified.get(memo_key)
        if len(cid) == 1 and memo and memo[0] == cid[0]:
            # steady-state probe: build verified; pq_m rides the memo
            # so serving never re-collects it (self-review r12)
            pq_m = memo[1]
        else:
            from pyspark.sql import functions as F

            # ids, per-tier counts AND pq_m in ONE aggregation job
            # (r16: previously a 4-way distinct-union collect plus
            # pq_m first() plus three count jobs), paid once per
            # build, never per steady-state probe
            def _leg(df, side):
                return (
                    df.groupBy("build_id")
                    .agg(F.count(F.lit(1)).alias("n"))
                    .select(
                        "build_id",
                        "n",
                        F.lit(None).cast("int").alias("pq_m"),
                        F.lit(side).alias("side"),
                    )
                )

            stats = (
                _leg(codes_bq, "bq")
                .unionByName(_leg(codes_pq, "pq"))
                .unionByName(_leg(vectors, "vec"))
                .unionByName(
                    cb.groupBy("build_id", "pq_m")
                    .agg(F.count(F.lit(1)).alias("n"))
                    .select("build_id", "n", "pq_m", F.lit("cb").alias("side"))
                )
                .collect()
            )
            heavy = sorted({r.build_id for r in stats})
            if len(cid) != 1 or heavy != sorted(cid):
                raise ValueError(
                    f"cascade index {name!r} is torn (centroid builds "
                    f"{sorted(cid)} vs member builds {heavy}) — re-run "
                    "build_cascade_index"
                )
            n_vecs = sum(int(r.n) for r in stats if r.side == "vec")
            n_bq = sum(int(r.n) for r in stats if r.side == "bq")
            n_pq = sum(int(r.n) for r in stats if r.side == "pq")
            cb_ms = [r.pq_m for r in stats if r.side == "cb"]
            if not cb_ms:
                # an EMPTY codebook table contributes no build ids, so
                # the tear check above passes vacuously on that leg
                # (advisor r16) — name the missing rows instead of
                # dying on a bare IndexError
                raise ValueError(
                    f"cascade index {name!r} is torn: the codebook "
                    f"table has no rows — re-run build_cascade_index"
                )
            pq_m = int(cb_ms[0])
            if n_bq != n_vecs or n_pq != n_vecs * pq_m:
                raise ValueError(
                    f"cascade index {name!r} is torn: code counts do "
                    "not match the vector count — a failed write; "
                    "re-run build_cascade_index"
                )
            self._ann_verified[memo_key] = (cid[0], pq_m)
        probes = similarity.ivfpq_probe_lists(
            queries,
            cents.select("centroid_id", "cvec"),
            nprobe,
            query_id_col,
            query_vec_col,
        )
        qc = similarity.bq_query_codes(queries, query_id_col, query_vec_col)
        stage1 = similarity.ann_ivfbq_topk(
            codes_bq.select("vec_id", "centroid_id", "sig_lo", "sig_hi"),
            qc,
            probes,
            hamming_cut,
            allowed=filter_ids,
            exclude_self=exclude_query_ids,
        )
        lut = similarity.pq_query_lut(
            queries,
            cb.select("m", "code", "cvec"),
            m=pq_m,
            id_col=query_id_col,
            vec_col=query_vec_col,
        )
        stage2 = similarity.ann_cascade_pq_narrow(
            stage1,
            codes_pq.select("vec_id", "centroid_id", "m", "code"),
            lut,
            pq_narrow,
        )
        return similarity.ann_ivfpq_rerank(
            vectors.select("vec_id", "centroid_id", "embedding"),
            stage2,
            queries,
            topk,
            query_id_col=query_id_col,
            query_vec_col=query_vec_col,
        )

    def append_to_cascade_index(
        self,
        name: str,
        new_emb: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """[EXT] Incremental append to the cascade index — the
        nightly-crawl story for the full funnel: the batch is
        assigned against the STORED centroids, sign-packed AND
        PQ-encoded against the STORED codebook in bounded batch
        passes (no quantizer retrains; the corpus is never
        rescanned), appended to ALL THREE centroid-partitioned
        tables under the build's id, and returns the one-row drift
        report — (appended_rows, batch_mean_sim_micro,
        build_mean_sim_micro, drift_micro), the REBUILD TRIGGER.
        Appended sign codes ≡ a same-centroid rebuild BY
        CONSTRUCTION (parameterless quantizer); appended PQ codes ≡
        a frozen-codebook re-encode (the IVFPQ append property). The
        three appends are not atomic; a failure between them is
        caught by cascade_search's per-tier count identities
        (1 sign-code row and exactly M PQ-code rows per vector),
        checked whenever the build-id memo misses."""
        from pyspark.sql import functions as F

        from .idents import storage_safe_name
        from .operators import similarity

        cents = self.table(f"{name}_centroids")
        cb = self.table(f"{name}_codebook")
        cid = sorted(
            set(
                r.build_id
                for r in cents.select("build_id")
                .distinct()
                .union(cb.select("build_id").distinct())
                .collect()
            )
        )
        if len(cid) != 1:
            raise ValueError(
                f"cascade index {name!r} quantizers carry build ids "
                f"{cid} — re-run build_cascade_index before appending"
            )
        build_mean = cents.select("build_mean_sim_micro").first()[0]
        pq_m = int(cb.select("pq_m").first()[0])
        batch = similarity._assign_scored(
            new_emb, cents.select("centroid_id", "cvec"), id_col, vec_col
        ).localCheckpoint()
        self._ann_verified.pop(f"cascade:{name}", None)
        self._ann_verified.pop(f"ivfbq:{name}", None)
        (
            batch.select(
                F.col(id_col).alias("vec_id"),
                F.col(vec_col).alias("embedding"),
                "sim_micro",
                F.lit(cid[0]).alias("build_id"),
                "centroid_id",
            )
            .write.mode("append")
            .format("parquet")
            .partitionBy("centroid_id")
            .saveAsTable(storage_safe_name(f"{name}_vectors"))
        )
        (
            similarity.ivfbq_encode(
                batch, cents, id_col, vec_col, assigned=batch
            )
            .select(
                "vec_id",
                "sig_lo",
                "sig_hi",
                F.lit(cid[0]).alias("build_id"),
                "centroid_id",
            )
            .write.mode("append")
            .format("parquet")
            .partitionBy("centroid_id")
            .saveAsTable(storage_safe_name(f"{name}_codes"))
        )
        (
            similarity.pq_encode(
                batch, cb.select("m", "code", "cvec"), pq_m, id_col, vec_col
            )
            .join(
                batch.select(
                    F.col(id_col).alias("vec_id"), "centroid_id"
                ),
                "vec_id",
            )
            .select(
                "vec_id",
                "m",
                "code",
                F.lit(cid[0]).alias("build_id"),
                "centroid_id",
            )
            .write.mode("append")
            .format("parquet")
            .partitionBy("centroid_id")
            .saveAsTable(storage_safe_name(f"{name}_codes_pq"))
        )
        row = batch.agg(
            F.sum("sim_micro").alias("s"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        batch_mean = int(row.s) // int(row.n) if row.s is not None else None
        drift = (
            build_mean - batch_mean
            if build_mean is not None and batch_mean is not None
            else None
        )
        return self.spark.createDataFrame(
            [(int(row.n), batch_mean, build_mean, drift)],
            "appended_rows bigint, batch_mean_sim_micro bigint, "
            "build_mean_sim_micro bigint, drift_micro bigint",
        )

    def build_text_index(
        self,
        name: str,
        docs: DataFrame,
        text_col: str = "text",
        n_buckets: int = 32,
    ) -> None:
        """[EXT] Build-once BM25 text-retrieval index — the lexical
        sibling of :meth:`build_ivf_index`: tokenize the corpus ONCE
        (text.build_postings), materialize the (doc_id, dl, tok, tf)
        postings as ``{name}_postings`` BUCKETED by ``tok`` (every
        :meth:`text_search` term semi-join and df groupBy reads
        co-located inverted lists — no index-side exchange; pinned
        by tests/test_text_index.py) and the one-row corpus stats
        (n_docs, sum_dl) as ``{name}_stats``.

        Pick ``n_buckets`` to match the probe side's target
        partitioning (``spark.sql.shuffle.partitions`` of the
        serving session): Spark's planner keeps the co-located
        bucketed read only when the bucket count equals the
        partition count it would otherwise shuffle to — on a
        mismatch it disables the bucketed scan and re-shuffles the
        whole index per probe.

        Unlike the ANN index's frozen centroids, BM25 state is
        ADDITIVE — postings union and the stats sums compose — so
        :meth:`append_to_text_index` keeps the index EXACT: probes
        over (build + appends) equal a rebuild-on-union to the bit.

        Torn-state discipline: both tables carry a shared build id
        plus a monotone revision; the heavy write (postings) lands
        FIRST, and text_search verifies id + revision agreement
        before serving (a failure between the two writes leaves a
        detectable mismatch instead of silently wrong df/stats)."""
        from pyspark.sql import functions as F

        from .operators import text

        postings, stats = text.build_postings(docs, text_col)
        build_id = random_alphanum()
        self._text_verified.pop(name, None)
        self.materialize_bucketed(
            f"{name}_postings",
            postings.withColumn("build_id", F.lit(build_id)).withColumn(
                "revision", F.lit(0).cast("bigint")
            ),
            ["tok"],
            n_buckets,
        )
        self.drop_table_if_exists(f"{name}_stats")
        self.create_table_as(
            f"{name}_stats",
            stats.withColumn("build_id", F.lit(build_id)).withColumn(
                "revision", F.lit(0).cast("bigint")
            ),
        )

    def append_to_text_index(
        self,
        name: str,
        new_docs: DataFrame,
        text_col: str = "text",
        n_buckets: int = 32,
    ) -> DataFrame:
        """[EXT] EXACT incremental append — the nightly-crawl story
        for the text index: tokenize only the new batch (the corpus
        is never rescanned), append its postings to the bucketed
        inverted lists under the SAME build id at revision+1, and
        fold the batch's (n_docs, sum_dl) into the stats row. df per
        term is recomputed from postings at probe time, so the
        appended index serves IDENTICAL scores to a full rebuild on
        the union — pinned by tests/test_text_index.py.

        Returns a one-row vocabulary-drift report: (appended_docs,
        appended_postings, new_terms, new_term_ppm, revision) —
        new_terms = batch terms absent from the stored index,
        new_term_ppm = their share of the batch vocabulary in ppm.
        A batch from the corpus distribution re-uses the stored
        vocabulary (low ppm); topic/language drift mints new terms —
        the COMPACTION/REBUILD trigger a 100 TB operator watches
        (each append adds a parquet file set per bucket; periodic
        rebuild re-compacts). Cost: the instrument prunes the
        stored side to the batch's term set FIRST (co-located
        semi-join on the bucketed ``tok``), so everything is
        O(batch + Σ df(batch terms)), not O(index).

        ``n_buckets`` must match the build's (Spark refuses a
        mismatched bucket spec loudly)."""
        from pyspark.sql import functions as F

        from .idents import storage_safe_name
        from .operators import text

        stats_tbl = self.table(f"{name}_stats")
        srow = stats_tbl.collect()
        if len(srow) != 1:
            raise ValueError(
                f"text index {name!r} stats table has {len(srow)} rows — "
                "re-run build_text_index"
            )
        srow = srow[0]
        batch_postings, batch_stats = text.build_postings(new_docs, text_col)
        batch_postings = batch_postings.localCheckpoint()
        brow = batch_stats.collect()[0]
        # one-row instrument; see text.vocab_drift for the prune-
        # first anti-join shape that keeps it batch-sized
        drift = text.vocab_drift(
            self.table(f"{name}_postings"), batch_postings
        ).collect()[0]
        n_postings = batch_postings.count()
        revision = int(srow.revision) + 1
        self._text_verified.pop(name, None)
        physical = storage_safe_name(f"{name}_postings")
        (
            batch_postings.withColumn("build_id", F.lit(srow.build_id))
            .withColumn("revision", F.lit(revision).cast("bigint"))
            .write.mode("append")
            .format("parquet")
            .bucketBy(n_buckets, "tok")
            .sortBy("tok")
            .saveAsTable(physical)
        )
        self.drop_table_if_exists(f"{name}_stats")
        self.create_table_as(
            f"{name}_stats",
            self.spark.createDataFrame(
                [
                    (
                        int(srow.n_docs) + int(brow.n_docs),
                        int(srow.sum_dl or 0) + int(brow.sum_dl or 0),
                        srow.build_id,
                        revision,
                    )
                ],
                "n_docs bigint, sum_dl bigint, build_id string, "
                "revision bigint",
            ),
        )
        return self.spark.createDataFrame(
            [
                (
                    int(brow.n_docs),
                    int(n_postings),
                    int(drift.new_terms),
                    int(drift.new_term_ppm),
                    revision,
                )
            ],
            "appended_docs bigint, appended_postings bigint, "
            "new_terms bigint, new_term_ppm bigint, revision bigint",
        )

    def text_search(
        self,
        name: str,
        queries: DataFrame,
        topn: int = 10,
        max_pushdown_terms: int = 10_000,
    ) -> DataFrame:
        """[EXT] Query-table-driven BM25 retrieval over an index
        built by :meth:`build_text_index` — probes the stored
        bucketed postings via text.bm25_probe; no re-tokenization,
        no corpus scan, no per-query replanning. Raises if the two
        index tables disagree on build id or revision (a torn build
        or append — see build_text_index). Verification is one
        column-pruned scan of the postings' (build_id, revision),
        memoized per (id, revision) exactly like ann_topk's check —
        serving calls after the first pay only the one-row stats
        read.

        Term pushdown: a serving batch's vocabulary is bounded, so
        its distinct terms are collected (driver-side, capped at
        ``max_pushdown_terms``) and pushed as a literal IN filter on
        the postings scan — Spark then BUCKET-PRUNES the read to the
        buckets holding query terms (``SelectedBucketsCount`` k out
        of n in the plan) and row-group-prunes within them via the
        tok-sorted layout, so probe I/O is sized by the query terms'
        postings, not the index (pinned by tests/test_text_index.py).
        Semantics are unchanged — the IN set is exactly the term set
        bm25_probe's semi-join prunes to. A batch with more distinct
        terms than the cap skips the pushdown and falls back to the
        pure semi-join plan (set ``max_pushdown_terms=0`` to force
        that path)."""
        from pyspark.sql import functions as F

        from .operators import text

        postings = self.table(f"{name}_postings")
        stats_tbl = self.table(f"{name}_stats")
        srows = stats_tbl.select("build_id", "revision").collect()
        if len(srows) != 1:
            raise ValueError(
                f"text index {name!r} stats table has {len(srows)} rows — "
                "re-run build_text_index"
            )
        want = (srows[0].build_id, int(srows[0].revision))
        if self._text_verified.get(name) != want:
            seen = sorted(
                (r.build_id, int(r.revision))
                for r in postings.select("build_id", "revision")
                .distinct()
                .collect()
            )
            # postings land BEFORE the stats rewrite, so a torn
            # append shows postings AHEAD of the stats revision (or
            # under a foreign build id); postings trailing is the
            # benign empty-append case (only stats bumped), and an
            # empty `seen` is an empty-corpus build
            ids = sorted({b for b, _ in seen})
            max_rev = max((r for _, r in seen), default=want[1])
            if seen and (ids != [want[0]] or max_rev > want[1]):
                raise ValueError(
                    f"text index {name!r} is torn (stats build/revision "
                    f"{want} vs postings {seen}) — re-run build_text_index"
                )
            self._text_verified[name] = want
        index = postings.select("doc_id", "dl", "tok", "tf")
        if max_pushdown_terms > 0:
            terms = [
                r.term
                for r in queries.select("term")
                .distinct()
                .limit(max_pushdown_terms + 1)
                .collect()
            ]
            if len(terms) <= max_pushdown_terms:
                index = index.where(F.col("tok").isin(terms))
        return text.bm25_probe(
            index,
            stats_tbl.select("n_docs", "sum_dl"),
            queries,
            topn,
        )

    def build_graph_index(
        self,
        name: str,
        edges: DataFrame,
        n_buckets: int = 32,
        src_col: str = "src",
        dst_col: str = "dst",
    ) -> None:
        """[EXT] Build-once GRAPH index lifecycle (r16 verdict task
        5) — the stored 100 TB form the in-run
        ``operators.iterate.pagerank`` docstring names: prepare the
        edge frame ONCE so every centrality run pays only its
        bounded rank iterations. Three tables under one build id:

        * ``{name}_edges`` ``(src, dst, build_id, revision)`` — the
          DEDUPED edge list, BUCKETED by ``src``: the per-round rank
          join reads co-located source buckets with NO edge-side
          shuffle (pinned by tests/test_bucketing.py::
          test_graph_index_lifecycle); appends land in the same
          bucket spec at revision+1.
        * ``{name}_degrees`` ``(src, deg, build_id, revision)`` —
          one row per SOURCE node (the out-degree side table). Kept
          OFF the edge table so appends never rewrite the edge
          store: degrees are node-sized and merge-rewritten per
          append.
        * ``{name}_nodes`` ``(node, build_id, revision)`` — every
          distinct endpoint; its count seeds the rank frame.

        Torn-state detection (the text-index revision discipline —
        an append under an UNCHANGED build id would otherwise be
        undetectable, review r16): the build stamps revision 0
        everywhere; each append writes edges at revision+1 FIRST,
        then rewrites degrees and nodes at revision+1.
        pagerank_served refuses when edges run AHEAD of the degrees
        revision (crash after the edge append) or nodes lag it
        (crash between the side-table rewrites), as well as on any
        build-id mismatch."""
        from pyspark.sql import functions as F

        deduped = (
            edges.select(
                F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
            )
            .distinct()
            .localCheckpoint()  # reused by all three writes below
        )
        build_id = random_alphanum()
        self._graph_verified.pop(name, None)
        for prior in self._graph_frames.pop(name, (None,))[1:]:
            try:
                prior.unpersist()
            except Exception:
                pass
        stamp = lambda df: df.withColumn(  # noqa: E731
            "build_id", F.lit(build_id)
        ).withColumn("revision", F.lit(0).cast("bigint"))
        self.materialize_bucketed(
            f"{name}_edges", stamp(deduped), ["src"], n_buckets
        )
        degrees = deduped.groupBy("src").agg(
            F.count(F.lit(1)).cast("bigint").alias("deg")
        )
        self.drop_table_if_exists(f"{name}_degrees")
        self.create_table_as(f"{name}_degrees", stamp(degrees))
        nodes = (
            deduped.select(F.col("src").alias("node"))
            .union(deduped.select(F.col("dst").alias("node")))
            .distinct()
        )
        self.drop_table_if_exists(f"{name}_nodes")
        self.create_table_as(f"{name}_nodes", stamp(nodes))

    def append_to_graph_index(
        self,
        name: str,
        new_edges: DataFrame,
        n_buckets: int = 32,
        src_col: str = "src",
        dst_col: str = "dst",
    ) -> DataFrame:
        """[EXT] Incremental edge append — the nightly-crawl story
        for the graph index (the append_to_ivf_index analogue): the
        batch is deduplicated internally AND against the stored
        edges (left-anti join on ``(src, dst)`` — the stored side is
        bucketed by ``src``, so the probe co-locates on the bucket
        key and the shuffle is batch-sized), the surviving edges
        append to the bucketed store under the SAME build id, and
        the NODE-SIZED side tables are merge-rewritten: degrees gain
        the batch's per-source counts, nodes gain the batch's unseen
        endpoints. The edge store itself is append-only — no 100 TB
        rewrite per batch.

        Returns a one-row report ``(appended_edges, duplicate_edges,
        new_nodes, total_nodes)`` — duplicate_edges is the batch
        mass already present (re-crawl overlap), new_nodes the graph
        growth an operator alerts on. Appended state ≡ what
        build_graph_index would store for the union — pinned by
        tests/test_bucketing.py. The edge batch lands FIRST at
        revision+1, then degrees and nodes rewrite at revision+1 —
        a crash at any point leaves a revision mismatch
        pagerank_served refuses (review r16: the build id alone
        cannot detect a torn APPEND because appends keep it; the
        text-index revision discipline). ``n_buckets`` must match
        the build's (Spark refuses a mismatched bucket spec
        loudly)."""
        from pyspark.sql import functions as F

        from .idents import storage_safe_name

        degrees_tbl = self.table(f"{name}_degrees")
        state = [
            (r.build_id, int(r.revision))
            for r in degrees_tbl.select("build_id", "revision")
            .distinct()
            .collect()
        ]
        if len(state) != 1:
            raise ValueError(
                f"graph index {name!r} degrees carry build/revision "
                f"states {state} — re-run build_graph_index before "
                "appending"
            )
        bid, revision = state[0][0], state[0][1] + 1
        stamp = lambda df: df.withColumn(  # noqa: E731
            "build_id", F.lit(bid)
        ).withColumn("revision", F.lit(revision).cast("bigint"))
        batch = (
            new_edges.select(
                F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
            )
            .distinct()
            .localCheckpoint()
        )
        fresh = batch.join(
            self.table(f"{name}_edges").select("src", "dst"),
            ["src", "dst"],
            "left_anti",
        ).localCheckpoint()  # frozen before the append writes below
        n_batch, n_fresh = batch.count(), fresh.count()
        self._graph_verified.pop(name, None)
        for prior in self._graph_frames.pop(name, (None,))[1:]:
            try:
                prior.unpersist()
            except Exception:
                pass
        (
            stamp(fresh)
            .write.mode("append")
            .format("parquet")
            .bucketBy(n_buckets, "src")
            .sortBy("src")
            .saveAsTable(storage_safe_name(f"{name}_edges"))
        )
        merged_deg = (
            degrees_tbl.select("src", "deg")
            .join(
                fresh.groupBy("src").agg(
                    F.count(F.lit(1)).cast("bigint").alias("d_new")
                ),
                "src",
                "full_outer",
            )
            .select(
                "src",
                (
                    F.coalesce("deg", F.lit(0))
                    + F.coalesce("d_new", F.lit(0))
                ).cast("bigint").alias("deg"),
            )
            .localCheckpoint()  # materialized BEFORE its source drops
        )
        self.drop_table_if_exists(f"{name}_degrees")
        self.create_table_as(f"{name}_degrees", stamp(merged_deg))
        nodes_tbl = self.table(f"{name}_nodes")
        new_nodes = (
            fresh.select(F.col("src").alias("node"))
            .union(fresh.select(F.col("dst").alias("node")))
            .distinct()
            .join(nodes_tbl.select("node"), "node", "left_anti")
            .localCheckpoint()
        )
        n_new_nodes = new_nodes.count()
        merged_nodes = (
            nodes_tbl.select("node").union(new_nodes).localCheckpoint()
        )
        n_total = merged_nodes.count()
        self.drop_table_if_exists(f"{name}_nodes")
        self.create_table_as(f"{name}_nodes", stamp(merged_nodes))
        return self.spark.createDataFrame(
            [(n_fresh, n_batch - n_fresh, n_new_nodes, n_total)],
            "appended_edges bigint, duplicate_edges bigint, "
            "new_nodes bigint, total_nodes bigint",
        )

    def pagerank_served(
        self,
        name: str,
        iterations: int = 5,
        damping_pct: int = 85,
        k: int = 10,
    ) -> DataFrame:
        """[EXT] PageRank over an index built by
        :meth:`build_graph_index` — no edge dedup, no degree
        aggregation, no per-run preparation: the stored out-degrees
        join onto the src-bucketed edge store (edge side co-located,
        only the node-sized frames shuffle) and the SAME bounded
        integer power iteration as the in-run form runs over it
        (``operators.iterate.pagerank_rounds`` — one shared loop, so
        served ranks are bit-identical to ``pagerank`` over the same
        edges; the graph_pagerank_served conformance query pins that
        against the unrolled-CTE oracle). Raises on a torn REBUILD
        (mismatched build ids) and on a torn APPEND (the text-index
        revision discipline, review r16: edges running AHEAD of the
        degrees revision = crash after the edge append; nodes
        lagging it = crash between the side-table rewrites — the
        build id alone cannot see either, because appends keep it).
        Verification is memoized per (build id, revision) exactly
        like text_search's."""
        from .operators.iterate import pagerank_rounds

        edges = self.table(f"{name}_edges")
        degrees_tbl = self.table(f"{name}_degrees")
        nodes_tbl = self.table(f"{name}_nodes")
        dstate = sorted(
            (r.build_id, int(r.revision))
            for r in degrees_tbl.select("build_id", "revision")
            .distinct()
            .collect()
        )
        want = dstate[0] if len(dstate) == 1 else None
        if want is None or self._graph_verified.get(name) != want:
            estate = sorted(
                (r.build_id, int(r.revision))
                for r in edges.select("build_id", "revision")
                .distinct()
                .collect()
            )
            nstate = sorted(
                (r.build_id, int(r.revision))
                for r in nodes_tbl.select("build_id", "revision")
                .distinct()
                .collect()
            )
            torn = (
                want is None
                # foreign build id anywhere, or edges from a FUTURE
                # revision (crash after an edge append, before the
                # degrees rewrite); PAST-revision edge rows are the
                # normal append-only layering
                or any(b != want[0] for b, _ in (*estate, *nstate))
                or max((r for _, r in estate), default=0) > want[1]
                # nodes rewrite LAST: a single row set strictly at
                # the degrees revision, or the append tore between
                # the two side-table rewrites
                or nstate != [want]
            )
            if torn:
                raise ValueError(
                    f"graph index {name!r} is torn (degrees "
                    f"build/revision {dstate} vs edges {estate} / "
                    f"nodes {nstate}) — re-run build_graph_index"
                )
            self._graph_verified[name] = want
        from . import cache

        # persist the degree-attached edge frame and the node frame
        # (r16, guide §5): pagerank_rounds reads both once PER ROUND,
        # and a lazy join/scan here re-read the stored tables and
        # re-ran the degree join every round (measured:
        # graph_rank_only benched SLOWER than the in-run form). The
        # cached join keeps the bucketed edge side's hash(src)
        # partitioning AND (r17) its src sort, so rounds stay
        # edge-side-exchange-free AND edge-side-sort-free; at 100 TB
        # MEMORY_AND_DISK spills to local disk — still cheaper than
        # iterations x (remote bucket read + degree join).
        # nodes.count() doubles as the materializing action.
        #
        # The frames are MEMOIZED per (build_id, revision) alongside
        # _graph_verified (advisor r16: repeated pagerank_served
        # calls in a long-lived session must not accumulate pinned
        # blocks) — a serving session pays the cache build once, and
        # a rebuild/append (new build id or revision, memo popped by
        # build/append) or a harness cache.release() (storage level
        # drops to NONE, checked below) invalidates it. Input-frame
        # reuse only, never query results: the rank iterations run in
        # full on every call.
        memo = self._graph_frames.get(name)
        if memo is not None and memo[0] == want and all(
            f.storageLevel.useMemory or f.storageLevel.useDisk
            for f in memo[1:]
        ):
            prepared, nodes = memo[1], memo[2]
        else:
            if memo is not None:
                for prior in memo[1:]:
                    try:
                        prior.unpersist()
                    except Exception:
                        pass
            prepared = cache.persisted(
                edges.select("src", "dst")
                .join(degrees_tbl.select("src", "deg"), "src")
                # sort the cache ONCE so each round's merge join reads
                # the src order instead of re-sorting the edge frame
                # per round (elided when the join already emits it)
                .sortWithinPartitions("src")
            )
            # lay the node frame out co-partitioned with the edge
            # store (hash(node) over the same id domain as hash(src),
            # same partition count) and pre-sorted, so every round's
            # left join against it needs no exchange and no sort, and
            # the rank frame inherits that layout for the NEXT
            # round's src join — one Exchange per round total (r17;
            # operators/iterate.py pagerank_rounds docstring).
            # getNumPartitions on the cached, exchange-free prepared
            # plan is metadata-only.
            n_parts = prepared.rdd.getNumPartitions()
            nodes = cache.persisted(
                nodes_tbl.select("node")
                .repartition(n_parts, "node")
                .sortWithinPartitions("node")
            )
            self._graph_frames[name] = (want, prepared, nodes)
        return pagerank_rounds(
            prepared, nodes, nodes.count(), iterations, damping_pct, k
        )

    @property
    def sequences(self):
        """H2 sequence registry (CREATE SEQUENCE / NEXTVAL / ...):
        durable JSON state in the warehouse directory under the same
        flock protocol as the table catalog (see sequences.py)."""
        if self._sequences is None:
            import os

            from .sequences import Sequences
            from .sources.sink import CATALOG_TABLE, warehouse_path

            self._sequences = Sequences(
                os.path.dirname(warehouse_path(self.spark, CATALOG_TABLE))
            )
        return self._sequences

    @property
    def schemas(self):
        """H2 schema registry (CREATE SCHEMA / DROP SCHEMA / the
        dotted-logical-name prefix for non-PUBLIC objects): durable
        JSON state beside the sequence registry (see schemas.py)."""
        if self._schemas is None:
            import os

            from .schemas import Schemas
            from .sources.sink import CATALOG_TABLE, warehouse_path

            self._schemas = Schemas(
                os.path.dirname(warehouse_path(self.spark, CATALOG_TABLE))
            )
        return self._schemas

    @property
    def constraints(self):
        """Recorded PK/UNIQUE constraint registry (accept-and-record,
        the CREATE INDEX no-op precedent): durable JSON state beside
        the sequence registry (see constraints.py)."""
        if self._constraints is None:
            import os

            from .constraints import Constraints
            from .sources.sink import CATALOG_TABLE, warehouse_path

            self._constraints = Constraints(
                os.path.dirname(warehouse_path(self.spark, CATALOG_TABLE))
            )
        return self._constraints

    @property
    def views(self):
        """Durable H2-view registry (CREATE [FORCE] VIEW / DROP VIEW
        / SCRIPT round-trip): JSON state beside the sequence and
        constraint registries (see views.py). A view is pure
        metadata — its definition inlines into consuming queries at
        analysis time, so Catalyst pushes filters through it into
        the parquet scans (zero materialization at any scale)."""
        if self._views is None:
            import os

            from .views import Views
            from .sources.sink import CATALOG_TABLE, warehouse_path

            self._views = Views(
                os.path.dirname(warehouse_path(self.spark, CATALOG_TABLE))
            )
        return self._views

    @property
    def colmeta(self):
        """Durable column/table metadata registry (DEFAULT / identity
        sequence binding / NOT NULL intent / SELECTIVITY / COMMENT
        remarks): JSON state beside the sequence, constraint and view
        registries (see colmeta.py). Parquet cannot carry any of
        these, so the registry is what INSERT defaults, NOT NULL
        enforcement, INFORMATION_SCHEMA and SCRIPT dumps read."""
        if self._colmeta is None:
            import os

            from .colmeta import ColumnMeta
            from .sources.sink import CATALOG_TABLE, warehouse_path

            self._colmeta = ColumnMeta(
                os.path.dirname(warehouse_path(self.spark, CATALOG_TABLE))
            )
        return self._colmeta

    # -- surface (H2Destination.scala:37-46) ---------------------------

    def csv_create_sink(self) -> CsvCreateSink:
        """The one ResultSink the destination exposes."""
        return self.sink

    def refresh_information_schema(self) -> None:
        """[EXT] Rebuild the H2-spelled ``information_schema`` views
        (TABLES/COLUMNS/SEQUENCES) from the current engine catalog —
        the introspection surface every H2/JDBC/BI client reads on
        connect (H2Server.scala:60-84). ``execute_sql`` refreshes
        lazily on any statement mentioning INFORMATION_SCHEMA; wire
        clients see the catalog as of endpoint start or the last
        explicit refresh. See :mod:`.info_schema`."""
        from . import info_schema

        info_schema.refresh_information_schema(self)

    def _republish_info_schema(self) -> None:
        """Best-effort post-mutation republish for wire clients —
        never lets an introspection failure break the mutation that
        triggered it."""
        if not self.endpoint_started:
            return
        try:
            self.refresh_information_schema()
        except Exception:  # pragma: no cover — degraded introspection
            log.warning("information_schema republish failed", exc_info=True)

    def sql(self, query: str) -> DataFrame:
        """Tier-B surface: full Spark SQL over loaded tables."""
        return self.spark.sql(query)

    def execute_sql(self, statement: str):
        """SQL statement surface with H2-parity DML: UPDATE / DELETE /
        MERGE text is parsed and dispatched to the engine's
        rewrite-based DML (returning a JDBC-style update count), every
        other statement runs as plain Spark SQL (returning its
        DataFrame) — the reference's users issue these as SQL because
        H2 parses them server-side (H2Server.scala:60-84). See
        sql_dml module docstring for dialect + wire-endpoint notes."""
        from . import sql_dml

        return sql_dml.execute(self, statement)

    def table(self, logical_name: str) -> DataFrame:
        # register through the session catalog first (no-op when
        # already known): a fresh process's raw-parquet fallback
        # infers schema from file footers, which never carry a
        # metadata-only ADD COLUMN — the catalog's declared schema
        # (with _ensure_registered's re-applied columns) does
        physical = self.sink.catalog.get(logical_name)
        if physical is not None:
            self._ensure_registered(str(physical))
        return self.sink.table(logical_name)

    def drop_table_if_exists(self, logical_name: str) -> None:
        """DROP TABLE IF EXISTS parity (H2CsvCreateSink.scala:125-126)."""
        physical = self.sink.catalog.get(logical_name)
        if physical is not None:
            from .sources.sink import warehouse_path

            self.spark.sql(f"DROP TABLE IF EXISTS {hygienic_ident(physical)}")
            self._registered.discard(str(physical))
            # cross-process: data of a table this session never
            # registered survives DROP — remove it explicitly
            import shutil

            shutil.rmtree(warehouse_path(self.spark, physical), ignore_errors=True)
            # tombstoned persist: the merge protocol must not
            # resurrect this name from a concurrent writer's state
            self.sink.drop_mapping(logical_name)
            # recorded PK/UNIQUE metadata dies with its table
            self.constraints.drop_table(logical_name)
            # ... as do defaults / identity bindings / comments; an
            # identity column's BACKING sequence dies too, but only
            # when it is marked BELONGS_TO_TABLE (H2's semantic: a
            # user sequence referenced by a DEFAULT survives)
            from .sequences import SequenceError

            for entry in self.colmeta.columns_of(logical_name).values():
                seq = entry.get("sequence")
                if not seq:
                    continue
                # same owner scan as the DROP SEQUENCE statement
                # guard: a second table's column bound to this
                # sequence (ALTER COLUMN SET DEFAULT NEXT VALUE FOR)
                # would be left with a dangling binding if the drop
                # proceeded (advice r14)
                if self._seq_drawn_elsewhere(seq, exclude_table=logical_name):
                    continue
                try:
                    if self.sequences.describe(seq)["belongs_to_table"]:
                        self.sequences.drop(seq, if_exists=True)
                except SequenceError:
                    pass  # already dropped elsewhere
            self.colmeta.drop_table(logical_name)

    def _seq_drawn_elsewhere(
        self,
        seq: str,
        exclude_table: str,
        exclude_column: "str | None" = None,
    ) -> bool:
        """True when any colmeta column OUTSIDE the excluded
        table/column still draws from ``seq`` — the guard DROP
        SEQUENCE applies, reused by the implicit drops (table drop,
        identity unbind) so they never strand another column's
        binding (advice r14)."""
        skey = seq.casefold()
        t_ex = exclude_table.casefold()
        c_ex = exclude_column.casefold() if exclude_column else None
        for tkey, tentry in self.colmeta.all().items():
            for ckey, e in tentry.get("columns", {}).items():
                if tkey == t_ex and (c_ex is None or ckey == c_ex):
                    continue
                if (e.get("sequence") or "").casefold() == skey:
                    return True
        return False

    # -- DML (SURVEY §2.2: INSERT built-in; UPDATE/DELETE/MERGE are
    # documented overwrite-rewrites — parquet tables have no in-place
    # mutation; Delta/Iceberg would upgrade these to transactional
    # single-statement ops with the same call signatures) ------------

    def append_rows_to_log(self, logical_name: str, rows: DataFrame) -> None:
        """[EXT] Append a SMALL driver-built frame to a catalog table,
        creating it on first use — the drift-log sink for streaming
        index maintenance (streaming/index_maintenance.py; bounded:
        one row per micro-batch)."""
        physical = self.sink.catalog.get(logical_name)
        if physical is None:
            self.create_table_as(logical_name, rows)
            return
        self._ensure_registered(physical)
        rows.write.mode("append").format("parquet").saveAsTable(physical)
        self.spark.catalog.refreshTable(physical)

    def _session_shadow_exists(self, name: str, gen=None) -> bool:
        """``spark.catalog.tableExists`` with a NEGATIVE-result memo
        for the statement pre-bind path (r14 task 3): a name checked
        once and absent skips the catalog RPC on every later
        statement. Only absence is memoized — a present session
        object is re-checked every time, so dropping it un-shadows
        promptly — and the memo invalidates whenever the engine
        catalog's key set changes (any DDL). ``gen`` lets the
        per-statement caller share the generation the pre-bind index
        just computed instead of re-hashing the key set per token
        (review r14). Staleness is HARMLESS by construction: the
        bind site uses createTempView, which raises (instead of
        replacing) when a session object appeared after the memo
        recorded absence — the caller then evicts the entry via
        :meth:`_forget_shadow_absence` and the user's object wins."""
        if gen is None:
            gen = (
                len(self.sink.catalog),
                hash(frozenset(map(str, self.sink.catalog))),
            )
        memo = getattr(self, "_noshadow_memo", None)
        if memo is None or memo[0] != gen:
            memo = (gen, set())
            self._noshadow_memo = memo
        if name in memo[1]:
            return False
        if self.spark.catalog.tableExists(name):
            return True
        memo[1].add(name)
        return False

    def _forget_shadow_absence(self, name: str) -> None:
        """Evict one stale negative-memo entry (a session object
        appeared under this name since it was recorded absent)."""
        memo = getattr(self, "_noshadow_memo", None)
        if memo is not None:
            memo[1].discard(name)

    def _ensure_registered(self, physical: str) -> None:
        """Cross-process DML support: a fresh process's session catalog
        has never heard of a table a previous engine materialized, so
        append/overwrite ``saveAsTable`` would take the create-table
        path and fail with LOCATION_ALREADY_EXISTS. Re-register the
        warehouse directory as a parquet table (schema inferred from
        the existing files) before any DML write. No-op when the
        session already knows the table."""
        import os

        from .sources.sink import warehouse_path

        if physical in self._registered:
            return
        if self.spark.catalog.tableExists(physical):
            self._registered.add(physical)
            return
        path = warehouse_path(self.spark, physical)
        if os.path.isdir(path):
            escaped = path.replace("'", "''")
            self.spark.sql(
                f"CREATE TABLE {hygienic_ident(physical)} USING parquet "
                f"LOCATION '{escaped}'"
            )
            # metadata-only ADD COLUMNs (colmeta 'added_type') are
            # invisible to footer inference until some file carries
            # them — re-apply the declared columns the inferred
            # schema is missing (skip any a later rewrite already
            # materialized)
            logical = next(
                (
                    l
                    for l, p in self.sink.catalog.items()
                    if str(p) == physical
                ),
                None,
            )
            if logical is not None:
                have = {
                    c.casefold() for c in self.spark.table(physical).columns
                }
                pend = [
                    (e["column"], e["added_type"])
                    for e in self.colmeta.columns_of(logical).values()
                    if e.get("added_type")
                    and e["column"].casefold() not in have
                ]
                if pend:
                    cols = ", ".join(f"`{c}` {t}" for c, t in pend)
                    self.spark.sql(
                        f"ALTER TABLE {hygienic_ident(physical)} "
                        f"ADD COLUMNS ({cols})"
                    )
                    self.spark.catalog.refreshTable(physical)
            self._registered.add(physical)

    def insert_into(
        self,
        logical_name: str,
        columns: Sequence,
        source,
    ) -> int:
        """INSERT INTO (append): validate the column list exactly like
        the create sink, then append the CSV to the existing table.
        Accepts the same payloads as consume() (embedded-newline CSVs
        retry via the shared multiLine fallback). Returns the number
        of appended rows."""
        from .types import ensure_valid_columns
        from .sources.sink import load_csv_with_fallback

        physical = self.sink.catalog.get(logical_name)
        if physical is None:
            from .errors import NotAResource

            raise NotAResource(logical_name)
        schema = ensure_valid_columns(columns, self.sink.type_options)
        self._ensure_registered(physical)
        tmp = None
        try:
            if isinstance(source, str):
                csv_path = source
            else:
                tmp = self.sink._spool(source)
                csv_path = tmp
            def _checked_append(d):
                # recorded CHECK constraints hold on the wire-append
                # path too — same bounded pre-write filter as
                # insert_rows; the returned (checkpointed) frame is
                # what lands, so checked rows = written rows
                d = self._enforce_check_constraints(
                    logical_name, d, "INSERT"
                )
                d.write.mode("append").format("parquet").saveAsTable(
                    physical
                )

            df = load_csv_with_fallback(
                self.spark, csv_path, schema, _checked_append
            )
            return df.count()
        finally:
            if tmp is not None:
                import os

                try:
                    os.unlink(tmp)
                except OSError:
                    pass

    def _has_check_constraints(self, logical_name: str) -> bool:
        """True when a DML write into this table must route through
        the enforcement pass: a recorded CHECK predicate OR a
        declared NOT NULL column (colmeta) — both are evaluated in
        the same single aggregation."""
        return any(
            e["type"] == "CHECK"
            for e in self.constraints.for_table(logical_name)
        ) or any(
            e.get("not_null")
            for e in self.colmeta.columns_of(logical_name).values()
        )

    def _enforce_check_constraints(
        self, logical_name: str, rows: DataFrame, verb: str
    ) -> DataFrame:
        """Evaluate every recorded CHECK predicate over the rows a
        DML statement is ABOUT to write (accept-and-enforce, r11
        verdict task 2): one bounded filter per constraint over only
        the written/changed rows — never a table rescan. SQL CHECK
        semantics: NULL/unknown passes; a violation is the predicate
        evaluating to FALSE. Raises :class:`CheckViolation` with the
        constraint name, violation count and example rows BEFORE
        anything lands (statement atomicity: the caller writes only
        after this returns).

        Returns the frame THE CALLER MUST WRITE: when CHECKs exist
        the incoming frame is localCheckpoint-ed first, so a
        non-deterministic source (``rand()`` in an INSERT...SELECT)
        cannot pass the check and then re-evaluate into different,
        violating rows at write time (advisor r12 — the checked rows
        ARE the written rows). Bounded: only the rows being written
        materialize, only on tables that declare CHECKs. Without
        CHECKs the frame passes through untouched."""
        checks = [
            e
            for e in self.constraints.for_table(logical_name)
            if e["type"] == "CHECK"
        ]
        # declared NOT NULL columns (colmeta: spelled NOT NULL or
        # PK-implied at CREATE CACHED TABLE, or ALTER COLUMN SET NOT
        # NULL) are enforced in the SAME single pass — H2 rejects a
        # NULL write into them, and a restored dump must keep doing
        # so. Only columns the incoming frame actually carries are
        # checked (a frame is always schema-conformed by the caller).
        frame_cols = {c.casefold() for c in rows.columns}
        not_null = [
            e["column"]
            for e in self.colmeta.columns_of(logical_name).values()
            if e.get("not_null") and e["column"].casefold() in frame_cols
        ]
        if not checks and not not_null:
            return rows
        rows = rows.localCheckpoint(eager=True)
        from pyspark.sql import functions as F

        from .constraints import CheckViolation
        from .colmeta import NullViolation

        def _viol(e):
            return ~F.coalesce(
                F.expr(e["predicate"]).cast("boolean"), F.lit(True)
            )

        # ONE pass over the incoming frame counts every constraint's
        # violations together — per-constraint filter jobs would
        # recompute an expensive DML source N_constraints times
        # (self-review r12); the steady state (no violations) costs
        # exactly one extra aggregation
        counts = rows.agg(
            *[
                F.sum(_viol(e).cast("int")).alias(f"c{i}")
                for i, e in enumerate(checks)
            ],
            *[
                F.sum(F.col(f"`{c}`").isNull().cast("int")).alias(f"n{j}")
                for j, c in enumerate(not_null)
            ],
        ).collect()[0]
        for i, e in enumerate(checks):
            n = counts[i] or 0
            if n:
                sample = rows.where(_viol(e)).take(3)
                raise CheckViolation(
                    f"{verb}: {n} row(s) violate CHECK constraint "
                    f"{e['name']!r} on {logical_name!r} "
                    f"(predicate: {e['predicate']}); examples: "
                    + "; ".join(str(tuple(r)) for r in sample)
                )
        for j, c in enumerate(not_null):
            n = counts[len(checks) + j] or 0
            if n:
                raise NullViolation(
                    f"{verb}: NULL not allowed for column {c!r} on "
                    f"{logical_name!r} ({n} row(s))"
                )
        return rows

    def validate_check_predicate(
        self, logical_name: str, predicate: str, validate_rows: bool = True
    ) -> None:
        """ALTER TABLE ... ADD CONSTRAINT ... CHECK: H2 validates the
        EXISTING rows when the constraint is added — one bounded scan
        — and rejects the DDL if any fail (or if the predicate does
        not analyze against the table's columns).
        ``validate_rows=False`` is the trailing-NOCHECK form H2's own
        SCRIPT dumps spell (skip the existing-row scan; the analysis
        check always runs — an unparseable predicate must fail the
        DDL, not the first INSERT months later)."""
        from pyspark.sql import functions as F

        target = self.table(logical_name)
        try:
            target.where(F.expr(predicate)).schema  # analysis only
        except Exception as e:
            raise ValueError(
                f"ADD CONSTRAINT CHECK: predicate {predicate!r} does "
                f"not analyze against {logical_name!r}: {e}"
            ) from None
        if not validate_rows:
            return
        from .constraints import CheckViolation

        viol = target.where(
            ~F.coalesce(F.expr(predicate).cast("boolean"), F.lit(True))
        )
        sample = viol.take(3)
        if sample:
            raise CheckViolation(
                f"ADD CONSTRAINT CHECK: {viol.count()} existing row(s) "
                f"of {logical_name!r} violate {predicate!r}; examples: "
                + "; ".join(str(tuple(r)) for r in sample)
            )

    def insert_rows(self, logical_name: str, df: DataFrame) -> int:
        """INSERT (append) of an arbitrary DataFrame whose schema
        already matches the target (the SQL front door conforms it).
        Returns the number of appended rows. Recorded CHECK
        constraints are enforced on the incoming rows first."""
        physical = self.sink.catalog.get(logical_name)
        if physical is None:
            from .errors import NotAResource

            raise NotAResource(logical_name)
        self._ensure_registered(physical)
        df = self._enforce_check_constraints(logical_name, df, "INSERT")
        n = df.count()
        df.write.mode("append").format("parquet").saveAsTable(physical)
        return n

    def create_table_as(
        self, logical_name: str, df: DataFrame, if_not_exists: bool = False
    ) -> str:
        """CREATE TABLE ... AS SELECT: materialize `df` as a new
        engine-cataloged table (same storage-safe naming + durable
        catalog as the CSV sink). Returns the physical name. Errors if
        the table exists, unless `if_not_exists` (then no-op)."""
        from .idents import storage_safe_name
        from .sources.sink import prepare_replace

        if logical_name in self.sink.catalog:
            if if_not_exists:
                return self.sink.catalog[logical_name]
            raise ValueError(f"table already exists: {logical_name!r}")
        if self.views.get(logical_name) is not None:
            raise ValueError(
                f"a view named {logical_name!r} already exists"
            )
        physical = storage_safe_name(logical_name)
        prepare_replace(self.spark, physical)
        df.write.mode("overwrite").format("parquet").saveAsTable(physical)
        self.sink.catalog[logical_name] = physical
        self.sink._persist_catalog()
        return physical

    def _rewrite(self, physical: str, df: DataFrame) -> None:
        """Overwrite `physical` with `df` via a staging table (Spark
        cannot overwrite a parquet table from a plan that reads it —
        the staging hop materializes first). Two sequential parallel
        writes; at cluster scale both are shuffle-free scans.

        The final write is ``insertInto(overwrite=True)`` when the
        table exists: DML preserves the table's schema, and unlike
        ``saveAsTable(mode=overwrite)`` it truncates IN PLACE — which
        also works on a table re-registered EXTERNAL after a process
        restart (saveAsTable would drop it and refuse to recreate a
        managed table over the surviving location)."""
        from .sources.sink import clear_stale_location

        self._ensure_registered(physical)
        staging = f"{physical}_rw"
        clear_stale_location(self.spark, staging)
        df.write.mode("overwrite").format("parquet").saveAsTable(staging)
        try:
            staged = self.spark.table(staging)
            if self.spark.catalog.tableExists(physical):
                cols = self.spark.table(physical).columns
                staged.select(*cols).write.insertInto(physical, overwrite=True)
            else:
                staged.write.mode("overwrite").format("parquet").saveAsTable(
                    physical
                )
        finally:
            self.spark.sql(f"DROP TABLE IF EXISTS {hygienic_ident(staging)}")

    def _rewrite_new_schema(self, physical: str, df: DataFrame) -> None:
        """Schema-CHANGING overwrite (ALTER TABLE): the in-place
        ``insertInto`` of :meth:`_rewrite` requires the old schema, so
        here the staging hop is followed by a real drop+recreate (the
        catalog commit of the final create is the atomicity point)."""
        from .sources.sink import clear_stale_location

        self._ensure_registered(physical)
        staging = f"{physical}_rw"
        clear_stale_location(self.spark, staging)
        df.write.mode("overwrite").format("parquet").saveAsTable(staging)
        try:
            self.spark.sql(f"DROP TABLE IF EXISTS {hygienic_ident(physical)}")
            clear_stale_location(self.spark, physical)
            self.spark.table(staging).write.mode("overwrite").format(
                "parquet"
            ).saveAsTable(physical)
        finally:
            self.spark.sql(f"DROP TABLE IF EXISTS {hygienic_ident(staging)}")

    def add_column(
        self,
        logical_name: str,
        col_name: str,
        spark_type: str,
        default: "str | None" = None,
        not_null: bool = False,
        selectivity: "int | None" = None,
        remarks: "str | None" = None,
    ) -> None:
        """ALTER TABLE ... ADD COLUMN: existing rows fill with the
        DEFAULT when one is declared (H2's back-fill), else NULL.
        NOT NULL without a DEFAULT on a non-empty table errors (H2's
        rule — there is nothing lawful to fill). Declared metadata
        (default / NOT NULL / SELECTIVITY / COMMENT) records in the
        column-metadata registry for later INSERTs, enforcement and
        SCRIPT dumps."""
        from pyspark.sql import functions as F

        target = self.table(logical_name)
        if col_name in target.columns:
            raise ValueError(f"column already exists: {col_name!r}")
        # "no lawful fill" includes a DEFAULT NULL spelling — the
        # recorded default is the STRING 'NULL', which back-fills
        # NULLs into a column declared NOT NULL (review r13).
        # Parenthesized spellings (`DEFAULT (NULL)`, `((NULL))`) are
        # the same NULL constant and must hit the same guard
        # (advice r14)
        no_fill = default is None or _is_null_literal(default)
        if not_null and no_fill and target.limit(1).count():
            raise ValueError(
                f"ADD COLUMN {col_name!r} NOT NULL: the table has rows "
                "and no DEFAULT to fill them (H2 rejects this)"
            )
        physical = self.sink.catalog[logical_name]
        fields = {
            "default": default,
            "not_null": True if not_null else None,
            "selectivity": selectivity,
            "remarks": remarks,
        }
        if no_fill:
            # NULL-filled ADD COLUMN is PURE METADATA: Spark's
            # parquet reader fills NULL for a declared column the
            # old files never wrote, so the 100 TB case is one
            # catalog statement — no table rewrite, no data moved.
            # A fresh process re-registers the table from file
            # footers (which lack the column), so the declared type
            # is recorded durably and _ensure_registered re-applies
            # it (colmeta 'added_type').
            self.spark.sql(
                f"ALTER TABLE {hygienic_ident(physical)} "
                f"ADD COLUMNS (`{col_name}` {spark_type})"
            )
            self.spark.catalog.refreshTable(physical)
            fields["added_type"] = spark_type
        else:
            # a DEFAULT back-fill freezes the default VALUE into the
            # existing rows (H2's semantic — a later SET DEFAULT must
            # not retroactively change them), which is inherently a
            # bounded rewrite
            self._rewrite_new_schema(
                physical,
                target.withColumn(
                    col_name, F.expr(default).cast(spark_type)
                ),
            )
        if any(v is not None for v in fields.values()):
            self.colmeta.update_column(logical_name, col_name, **fields)

    def drop_column(self, logical_name: str, col_name: str) -> None:
        """ALTER TABLE ... DROP COLUMN. H2 refuses to drop a column
        a recorded constraint depends on (member of a PK/UNIQUE/FK,
        referenced by an inbound FK, or mentioned by a CHECK
        predicate) — a silent drop would leave the registry dumping
        unrestorable SCRIPTs and the CHECK enforcement failing
        analysis on the next write."""
        import re as _re

        target = self.table(logical_name)
        if col_name not in target.columns:
            raise ValueError(f"no such column: {col_name!r}")
        if len(target.columns) == 1:
            raise ValueError("cannot drop the only column")
        deps = self.constraints.column_members(logical_name, col_name)
        rx = _re.compile(
            rf"(?i)(?<![\w$`]){_re.escape(col_name)}(?![\w$`])"
        )
        for e in self.constraints.for_table(logical_name):
            if (
                e["type"] == "CHECK"
                and rx.search(e["predicate"].replace("`", ""))
                and e["name"] not in deps
            ):
                deps.append(e["name"])
        if deps:
            raise ValueError(
                f"DROP COLUMN {col_name!r}: constraint(s) {deps} depend "
                "on it — drop them first (H2 refuses the drop)"
            )
        self._rewrite_new_schema(
            self.sink.catalog[logical_name], target.drop(col_name)
        )
        self.drop_identity_backing(logical_name, col_name)
        self.colmeta.drop_column(logical_name, col_name)

    def rename_column(self, logical_name: str, old: str, new: str) -> None:
        """ALTER TABLE ... RENAME COLUMN ... TO ..."""
        target = self.table(logical_name)
        if old not in target.columns:
            raise ValueError(f"no such column: {old!r}")
        if new in target.columns:
            raise ValueError(f"column already exists: {new!r}")
        # a CHECK predicate mentioning the old spelling would fail
        # analysis on the next write — H2 rewrites its parsed
        # expression tree; this engine stores predicate TEXT, so the
        # rename is refused while a CHECK depends on the column
        # (PK/UNIQUE/FK member lists migrate in place below)
        import re as _re

        rx = _re.compile(rf"(?i)(?<![\w$`]){_re.escape(old)}(?![\w$`])")
        blocked = [
            e["name"]
            for e in self.constraints.for_table(logical_name)
            if e["type"] == "CHECK"
            and rx.search(e["predicate"].replace("`", ""))
        ]
        if blocked:
            raise ValueError(
                f"RENAME COLUMN {old!r}: CHECK constraint(s) {blocked} "
                "reference it — drop them first"
            )
        self._rewrite_new_schema(
            self.sink.catalog[logical_name], target.withColumnRenamed(old, new)
        )
        self.constraints.rename_column(logical_name, old, new)
        self.colmeta.rename_column(logical_name, old, new)

    def drop_identity_backing(self, logical_name: str, col_name: str) -> None:
        """When a column's sequence binding is removed (DROP COLUMN,
        ALTER COLUMN SET/DROP DEFAULT), a BELONGS_TO_TABLE backing
        sequence has no owner left — drop it, or every later dump
        emits a dangling CREATE SEQUENCE ... BELONGS_TO_TABLE line
        (H2 drops the auto-increment sequence with its column). A
        user-created sequence merely referenced by a default
        survives (not flagged BELONGS_TO_TABLE)."""
        from .sequences import SequenceError

        entry = self.colmeta.columns_of(logical_name).get(
            col_name.casefold(), {}
        )
        seq = entry.get("sequence")
        if not seq:
            return
        # another column (any table, or even this table) still bound
        # to the sequence keeps it alive — the DROP SEQUENCE guard's
        # owner scan, minus the column being unbound (advice r14)
        if self._seq_drawn_elsewhere(
            seq, exclude_table=logical_name, exclude_column=col_name
        ):
            return
        try:
            if self.sequences.describe(seq)["belongs_to_table"]:
                self.sequences.drop(seq, if_exists=True)
        except SequenceError:
            pass  # already gone elsewhere

    def cast_column_type(
        self, logical_name: str, col_name: str, spark_type: str
    ) -> None:
        """ALTER TABLE ... ALTER COLUMN ... SET DATA TYPE: one
        bounded cast-rewrite of the table (the same overwrite pass as
        UPDATE — parquet has no in-place schema mutation). H2
        semantics: values that do not convert fail the statement, so
        the cast is validated FIRST with one aggregation counting
        non-NULL values that cast to NULL (try_cast probe) — a lossy
        retype errors loudly instead of silently nulling data."""
        from pyspark.sql import functions as F

        target = self.table(logical_name)
        if col_name not in target.columns:
            raise ValueError(f"no such column: {col_name!r}")
        col = F.col(f"`{col_name}`")
        lossy = (
            target.agg(
                F.sum(
                    (
                        col.isNotNull() & col.try_cast(spark_type).isNull()
                    ).cast("int")
                ).alias("n")
            ).collect()[0][0]
            or 0
        )
        if lossy:
            raise ValueError(
                f"ALTER COLUMN {col_name!r} SET DATA TYPE {spark_type}: "
                f"{lossy} value(s) do not convert (H2 rejects a lossy "
                "retype)"
            )
        self._rewrite_new_schema(
            self.sink.catalog[logical_name],
            target.withColumn(col_name, col.cast(spark_type)),
        )

    def set_column_not_null(
        self, logical_name: str, col_name: str, not_null: bool
    ) -> None:
        """ALTER TABLE ... ALTER COLUMN ... SET NOT NULL / SET NULL
        (H2 also spells the latter DROP NOT NULL). SET NOT NULL
        validates the EXISTING rows first — one bounded aggregation,
        H2's own behavior — then records the intent in the column
        metadata registry so every subsequent DML write enforces it
        (engine._enforce_check_constraints)."""
        from pyspark.sql import functions as F

        from .colmeta import NullViolation

        target = self.table(logical_name)
        res = {c.casefold(): c for c in target.columns}.get(
            col_name.casefold()
        )
        if res is None:
            raise ValueError(f"no such column: {col_name!r}")
        if not not_null:
            # H2 refuses to make a PRIMARY KEY member nullable
            # ('column is referenced by a constraint') — and a silent
            # flag-drop here would desynchronize enforcement from the
            # IS_NULLABLE='NO' the PK registry keeps reporting
            pk = [
                e["name"]
                for e in self.constraints.for_table(logical_name)
                if e["type"] == "PRIMARY KEY"
                and any(
                    c.casefold() == res.casefold() for c in e["columns"]
                )
            ]
            if pk:
                raise ValueError(
                    f"ALTER COLUMN {res!r} SET NULL: the column is a "
                    f"member of PRIMARY KEY {pk[0]!r} (H2 refuses)"
                )
        if not_null:
            nulls = (
                target.agg(
                    F.sum(F.col(f"`{res}`").isNull().cast("int")).alias("n")
                ).collect()[0][0]
                or 0
            )
            if nulls:
                raise NullViolation(
                    f"ALTER COLUMN {res!r} SET NOT NULL: {nulls} existing "
                    f"NULL value(s) in {logical_name!r}"
                )
        self.colmeta.update_column(
            logical_name, res, not_null=True if not_null else None
        )

    def rename_table(self, old: str, new: str) -> None:
        """ALTER TABLE ... RENAME TO (H2 grammar): a pure catalog
        remap. Physical storage never moves — physical names are
        opaque fingerprints of the ORIGINAL logical name, and the
        catalog mapping is the only authority — so renaming a 100 TB
        table is O(1) metadata under the same flock merge-persist as
        every other catalog mutation (the old key tombstones so a
        concurrent merge cannot resurrect it)."""
        src = None
        for logical in self.sink.catalog:
            if logical.casefold() == old.casefold():
                src = logical
                break
        if src is None:
            raise ValueError(f"RENAME: table not found: {old!r}")
        for logical in self.sink.catalog:
            if logical.casefold() == new.casefold():
                raise ValueError(f"RENAME: table already exists: {new!r}")
        if self.views.get(new) is not None:
            raise ValueError(f"RENAME: a view named {new!r} exists")
        # a view reading this table dangles after a rename exactly as
        # after a drop — the H2 RESTRICT discipline applies to both
        # (self-review r12)
        deps = self.views.dependents_of(src)
        if deps:
            raise ValueError(
                f"RENAME: view(s) {deps} depend on {src!r} — drop or "
                "redefine them first"
            )
        physical = self.sink.catalog.pop(src)
        self.sink._dropped.add(src)
        self.sink.catalog[new] = physical
        self.sink._persist_catalog()
        self.constraints.rename_table(src, new)
        self.colmeta.rename_table(src, new)

    def rename_schema(self, old: str, new: str) -> None:
        """``ALTER SCHEMA old RENAME TO new`` (H2 1.4.200 grammar;
        r14 verdict missing #3): re-keys the dotted logical names of
        every contained object across the table catalog and the
        sequence / constraint / column-metadata registries, then the
        schema registry entry itself — pure catalog metadata,
        O(schema object count) driver work; physical storage never
        moves (the rename_table rationale, so renaming a schema of
        100 TB tables is metadata-only). PUBLIC cannot be renamed
        (H2: the default schema is not droppable or renamable).
        Views are PUBLIC-only on this engine, but a PUBLIC view
        reading an in-schema table would dangle after the rename —
        refused up front, the RENAME TABLE RESTRICT discipline, and
        every collision is checked BEFORE anything moves so a refusal
        leaves the catalog untouched. The session's current schema
        follows the rename (H2 sessions reference the schema object,
        not its name). Like ALTER TABLE RENAME, the multi-registry
        move is same-host statement-atomic, not crash-atomic (the
        documented catalog limitation)."""
        from .schemas import PUBLIC, SchemaError

        okey, nkey = old.casefold(), new.casefold()
        if okey == PUBLIC:
            raise SchemaError("ALTER SCHEMA: PUBLIC cannot be renamed (H2)")
        if not self.schemas.exists(old):
            raise SchemaError(f"schema not found: {old!r}")
        prefix = okey + "."
        tables = [
            str(t)
            for t in self.sink.catalog
            if str(t).casefold().startswith(prefix)
        ]
        seqs = [s for s in self.sequences.names() if s.startswith(prefix)]
        if nkey != okey:
            # ALL validation before ANY mutation: dependent views and
            # captured-name collisions (a hostile PUBLIC object
            # literally named "nkey.x" would silently become
            # in-schema once nkey registers) refuse up front. ONE
            # registry read + one relation_names scan per view (the
            # rename_sequences single-pass rule), not a
            # dependents_of call per table (review r15)
            from .views import relation_names

            table_keys = {str(t).casefold() for t in tables}
            for ventry in self.views.all().values():
                hit = relation_names(ventry["definition"]) & table_keys
                if hit:
                    raise SchemaError(
                        f"ALTER SCHEMA {old!r} RENAME TO: view(s) "
                        f"[{ventry['name']!r}] depend on "
                        f"{sorted(hit)!r} — drop or redefine them "
                        "first (the RENAME TABLE rule)"
                    )
            catalog_cf = {str(t).casefold() for t in self.sink.catalog}
            for t in tables:
                target = f"{nkey}.{str(t)[len(prefix):]}".casefold()
                if target in catalog_cf:
                    raise SchemaError(
                        f"ALTER SCHEMA {old!r} RENAME TO {new!r}: a "
                        f"table named {target!r} already exists"
                    )
            seq_cf = set(self.sequences.names())
            for s in seqs:
                target = f"{nkey}.{s[len(prefix):]}"
                if target in seq_cf:
                    raise SchemaError(
                        f"ALTER SCHEMA {old!r} RENAME TO {new!r}: a "
                        f"sequence named {target!r} already exists"
                    )
        # the registry entry first (validates addressability and a
        # key collision, and handles the case-only re-spell), so the
        # object migration below runs with the NEW key registered
        self.schemas.rename(old, new)
        if nkey != okey:
            for t in tables:
                bare = str(t)[len(prefix):]
                self.rename_table(t, f"{nkey}.{bare}")
            seq_map = {s: f"{nkey}.{s[len(prefix):]}" for s in seqs}
            for s, ns in seq_map.items():
                self.sequences.rename(s, ns)
            self.colmeta.rename_sequences(seq_map)
            if self.current_schema == okey:
                self.current_schema = nkey
        self._republish_info_schema()

    def analyze_tables(
        self, logical: "str | None" = None, sample_size: "int | None" = None
    ) -> int:
        """H2 ``ANALYZE [TABLE t] [SAMPLE_SIZE n]`` (r15): compute
        every column's SELECTIVITY — H2's 1..100 distinct-ratio
        optimizer statistic (100 = all values distinct) — and record
        it in the column-metadata registry, where SCRIPT dumps
        (``SELECTIVITY n`` column options) and
        INFORMATION_SCHEMA.COLUMNS already surface it, exactly the
        columns an ANALYZEd real H2 1.4.200 re-emits
        (``Analyze.java``; the reference replays such dumps through
        RUNSCRIPT, ``H2Server.scala:41-58``).

        One aggregation pass per table computes COUNT(*), every
        atomic column's COUNT(DISTINCT) and its null presence
        together (the table_profile single-Expand shape — never a
        scan per column). NULL counts as one distinct value (H2's
        hash-set iteration treats it as one);
        ``selectivity = max(1, min(100, 100 * distinct // rows))``
        over the SAMPLED row count; empty tables are skipped (H2
        leaves their statistics untouched). Non-atomic columns
        (array/map/struct — this engine's vector index tables) are
        skipped: H2 has no such column types, and DISTINCT over them
        is not universally defined.

        ``SAMPLE_SIZE`` is HONORED with H2's semantics (r16 verdict
        task 4 — Analyze.java bounds the statistics scan with a
        LIMIT): ``sample_size=n`` feeds the aggregate the first ``n``
        rows only (``df.limit(n)`` — a GlobalLimit that stops the
        scan early, so ANALYZE on a wide 100 TB table reads a bounded
        prefix, not every row ``×(k+1)`` through the multi-distinct
        Expand), ``n=0`` forces exact statistics, and ``None`` (no
        clause) uses H2's own default sample of 10 000 rows. Exactness
        on a bounded battery table is unchanged (sample ≥ rows reads
        everything), which is what keeps the oracle-paired battery
        deterministic. Returns the number of tables analyzed."""
        from pyspark.errors import AnalysisException
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        from .errors import NotAResource

        if logical is not None:
            # resolve through the same casefolded lookup the sibling
            # surfaces use (rename_table/_logical) — a direct API
            # call with a differently-cased spelling must bind, not
            # die on an exact-key membership test (advice r16)
            lkey = str(logical).casefold()
            targets = [
                t for t in self.sink.catalog if str(t).casefold() == lkey
            ][:1]
            if not targets:
                raise ValueError(f"ANALYZE: table not found: {logical!r}")
        else:
            targets = sorted(self.sink.catalog, key=str)
        analyzed = 0
        for t in targets:
            try:
                df = self.table(t)
            except (AnalysisException, NotAResource):
                # staleness only (dropped files / concurrent drop —
                # the refresh_information_schema discipline): bare
                # ANALYZE skips the entry, a NAMED table must load.
                # Any OTHER failure (transient IO, misconfig)
                # propagates in both modes instead of silently
                # leaving the table unanalyzed (advice r16).
                if logical is not None:
                    raise
                continue
            cols = [
                f.name
                for f in df.schema.fields
                if isinstance(f.dataType, T.AtomicType)
            ]
            if not cols:
                continue
            # H2's bounded statistics scan: LIMIT-style sample
            # (Analyze.java), default 10 000 rows, 0 = exact
            sample = 10_000 if sample_size is None else sample_size
            if sample > 0:
                df = df.limit(sample)
            aggs = [F.count(F.lit(1)).alias("__n")]
            for i, c in enumerate(cols):
                aggs.append(
                    F.countDistinct(F.col(f"`{c}`")).alias(f"d{i}")
                )
                aggs.append(
                    F.max(F.col(f"`{c}`").isNull().cast("int")).alias(
                        f"z{i}"
                    )
                )
            row = df.agg(*aggs).collect()[0]
            n = row["__n"]
            analyzed += 1
            if not n:
                continue
            per_col = {}
            for i, c in enumerate(cols):
                d = (row[f"d{i}"] or 0) + (1 if row[f"z{i}"] else 0)
                per_col[c] = {
                    "selectivity": max(1, min(100, (100 * d) // n))
                }
            self.colmeta.update_columns(t, per_col)
        self._republish_info_schema()
        return analyzed

    def drop_all_objects(self) -> None:
        """H2's ``DROP ALL OBJECTS`` scoped to what this engine owns:
        every catalog table and every sequence. Bounded driver work
        (catalog-sized loop); each drop reuses the existing
        flock-protected paths."""
        for logical in list(self.sink.catalog):
            self.drop_table_if_exists(logical)
        for name in self.sequences.names():
            self.sequences.drop(name, if_exists=True)
        self.views.drop_all()
        self.colmeta.drop_all()
        self._republish_info_schema()

    def delete_where(self, logical_name: str, condition: str) -> int:
        """DELETE FROM t WHERE cond (overwrite-rewrite). Returns the
        number of deleted rows."""
        target = self.table(logical_name)
        physical = self.sink.catalog[logical_name]
        before = target.count()
        from pyspark.sql import functions as F

        kept = target.where(~F.expr(condition) | F.expr(condition).isNull())
        self._rewrite(physical, kept)
        return before - self.table(logical_name).count()

    def update_where(
        self, logical_name: str, assignments: dict[str, str], condition: str
    ) -> int:
        """UPDATE t SET col=expr, ... WHERE cond (overwrite-rewrite).
        Returns the number of rows matching the condition."""
        target = self.table(logical_name)
        physical = self.sink.catalog[logical_name]
        from pyspark.sql import functions as F

        # H2 parity: a misspelled assignment target raises 'Column
        # not found'; silently ignoring it diverges without a signal
        # (same guard as MERGE USING, sql_dml._execute_merge_using).
        # Resolution is case-INSENSITIVE like both engines' own
        # identifier lookup — 'SET VAL = 1' against column 'val'
        # updates val rather than raising.
        from .sql_dml import resolve_columns

        res = resolve_columns(
            assignments, target.columns, "UPDATE: column not found in SET"
        )
        assignments = {res[c]: e for c, e in assignments.items()}
        cond = F.expr(condition)
        n = target.where(cond).count()
        if self._has_check_constraints(logical_name):
            # CHECK enforcement over ONLY the changed rows, with the
            # assignments applied and cast to the stored schema (the
            # values that land). The enforced frame comes back
            # checkpointed, and the rewrite writes THAT frame plus
            # the untouched remainder — so a non-deterministic
            # assignment (rand()) cannot pass the check and then
            # re-evaluate into different rows at write time
            # (advisor r12)
            changed = target.where(cond).select(
                *[
                    (
                        F.expr(assignments[f.name])
                        if f.name in assignments
                        else F.col(f.name)
                    )
                    .cast(f.dataType)
                    .alias(f.name)
                    for f in target.schema.fields
                ]
            )
            checked = self._enforce_check_constraints(
                logical_name, changed, "UPDATE"
            )
            kept = target.where(~cond | cond.isNull())
            self._rewrite(physical, kept.unionByName(checked))
            return n
        updated = target.select(
            *[
                F.when(cond, F.expr(assignments[c])).otherwise(F.col(c)).alias(c)
                if c in assignments
                else F.col(c)
                for c in target.columns
            ]
        )
        self._rewrite(physical, updated)
        return n

    def materialize_bucketed(
        self,
        logical_name: str,
        df: DataFrame,
        bucket_cols: Sequence[str],
        n_buckets: int = 32,
    ) -> str:
        """[EXT] Materialize a DataFrame as a bucketed+sorted table.

        Joins/aggregations between tables bucketed on the same keys
        with the same bucket count run WITHOUT a shuffle (Spark reuses
        the on-disk hash partitioning) — the co-located-join strategy
        for repeated 100 TB fact-fact joins. Pinned by
        tests/test_bucketing.py (no Exchange in the joined plan)."""
        from .idents import storage_safe_name
        from .sources.sink import prepare_replace

        physical = storage_safe_name(logical_name)
        # prepare_replace, not clear_stale_location: engine.table()
        # registers surviving warehouse dirs as EXTERNAL (the
        # metadata-only ADD COLUMN reader path), and an overwrite
        # saveAsTable over an external entry drops it WITHOUT
        # deleting the files, then refuses the create
        # (LOCATION_ALREADY_EXISTS — found by the r13 oracle sweep)
        prepare_replace(self.spark, physical)
        (
            # cluster rows by the bucket key first (r16, guide §6):
            # a bucketed write emits one file per (task, bucket), so
            # an UNCLUSTERED upstream — e.g. the r16 map-only
            # literal-argmax encodes, or any wide scan — writes up to
            # tasks x n_buckets tiny files and every probe pays the
            # open cost forever. The repartition makes it exactly one
            # file per bucket; when the upstream already ends in a
            # matching hash exchange the planner satisfies the
            # requirement without a second shuffle.
            df.repartition(n_buckets, *[df[c] for c in bucket_cols])
            .write.mode("overwrite")
            .format("parquet")
            .bucketBy(n_buckets, *bucket_cols)
            .sortBy(*bucket_cols)
            .saveAsTable(physical)
        )
        self.sink.catalog[logical_name] = physical
        self.sink._persist_catalog()
        return physical

    def materialize_partitioned(
        self,
        logical_name: str,
        df: DataFrame,
        partition_cols: Sequence[str],
    ) -> str:
        """[EXT] Materialize a DataFrame as a directory-PARTITIONED
        table (one directory per distinct partition-column value).
        Complements :meth:`materialize_bucketed`: bucketing removes
        the shuffle from co-located joins, partitioning removes the
        I/O — a scan filtered (statically or via dynamic partition
        pruning from a broadcast join) on the partition column reads
        ONLY the matching directories. The IVFPQ index stores its
        inverted lists this way: a probe touching nprobe of n_list
        lists reads nprobe/n_list of the files, which is the whole
        point of IVF at 100 TB. Use only for low-cardinality keys
        (n_list centroid ids, dates) — per-value directories explode
        on high-cardinality columns."""
        from .idents import storage_safe_name
        from .sources.sink import prepare_replace

        physical = storage_safe_name(logical_name)
        # prepare_replace for the same reason as materialize_bucketed:
        # an EXTERNAL-registered survivor must drop WITH its location
        prepare_replace(self.spark, physical)
        (
            # cluster rows by the partition key first (r16, guide §6
            # — the materialize_bucketed rationale): a partitioned
            # write emits one file per (task, directory), so an
            # unclustered upstream writes up to tasks x n_values tiny
            # files and every DPP-pruned probe re-opens them forever;
            # clustered, each directory holds one file per holding
            # task. Low-cardinality keys only (the method's existing
            # contract), so the exchange is node-bounded.
            df.repartition(*[df[c] for c in partition_cols])
            .write.mode("overwrite")
            .format("parquet")
            .partitionBy(*partition_cols)
            .saveAsTable(physical)
        )
        self.sink.catalog[logical_name] = physical
        self.sink._persist_catalog()
        return physical

    def merge_into(
        self,
        logical_name: str,
        source: DataFrame,
        key_cols: Sequence[str],
        preserve_cols: "Sequence[str] | None" = None,
    ) -> None:
        """MERGE (upsert): matched target rows are replaced by the
        source row, unmatched source rows are inserted. Rewrite =
        target ANTI JOIN source (on keys) UNION source — one shuffle
        on the key, no driver materialization.

        ``preserve_cols``: columns the statement OMITTED that carry
        recorded defaults/identity (colmeta) — on MATCHED rows H2
        keeps the target's value rather than re-defaulting it (an
        identity column must never be silently reassigned by an
        upsert), so those columns coalesce from the matched target
        row; unmatched rows keep the source's filled value. The
        identity values pre-allocated for rows that turn out matched
        go unused — a sequence gap, which sequences are defined to
        tolerate."""
        from pyspark.sql import functions as F

        target = self.table(logical_name)
        physical = self.sink.catalog[logical_name]
        if preserve_cols:
            # one row per key from the target (duplicate-key targets
            # are legal — no enforced uniqueness — and the replace
            # semantic collapses them to the one source row anyway).
            # A presence FLAG (not a value coalesce) decides matched
            # vs inserted: a matched row whose preserved column holds
            # an explicit NULL keeps that NULL — H2 never re-defaults
            # an existing row through MERGE (review r13)
            tgt = target.select(
                *[F.col(f"`{k}`") for k in key_cols],
                *[
                    F.col(f"`{c}`").alias(f"__mrg_tgt_{c}")
                    for c in preserve_cols
                ],
                F.lit(True).alias("__mrg_hit"),
            ).dropDuplicates(list(key_cols))
            source = source.join(tgt, list(key_cols), "left").select(
                *[
                    F.when(
                        F.col("`__mrg_hit`"), F.col(f"`__mrg_tgt_{c}`")
                    )
                    .otherwise(F.col(f"`{c}`"))
                    .alias(c)
                    if c in set(preserve_cols)
                    else F.col(f"`{c}`")
                    for c in target.columns
                ]
            )
        # CHECK/NOT NULL enforcement over the rows as they will LAND
        # (after any preserve coalesce); the returned checkpointed
        # frame is what the union writes below
        source = self._enforce_check_constraints(
            logical_name, source, "MERGE"
        )
        kept = target.join(source, list(key_cols), "left_anti")
        self._rewrite(physical, kept.unionByName(source))
