package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.bde.{BdeFormat, Catalog, Clean, CleanSql, Config, Control, Diff, E2E, Hooks, JdbcTableSink, Loader, OrchestratorScenario, ParquetTableSink, Publication, Repo}
import graft.functions.{HtmlOps, HtmlOpsSql, QualityOps, QualityOpsSql, TextOps, TextOpsSql, UrlOps, VectorOps, VectorOpsSql}
import graft.operators.{Bpe, BpeSql, Bucketing, Chunking, ChunkingSql, Contamination, ContaminationSql, Dedup, DedupIndex, DictMatch, Domains, Drift, DriftSql, Fim, FimSql, Frontier, Graph, GraphSql, LanguageModel, LanguageModelSql, Mixing, MixingSql, Multimodal, Profile, ProfileSql, Pca, PcaSql, PerGroupQuantile, Preference, Relevance, RelevanceSql, Retract, Robots, Salting, Sampling, SamplingSql, Similarity, Sketches, SuffixArray, Unigram, VocabCoverage, WordPiece, WordPieceSql}
import graft.streaming.Streams

/**
 * Driver contract: every implemented operator from SURVEY.md §2 (plus the
 * LLM-pipeline operator families) is registered here as a named query over
 * the `/root/testdata` parquet tables, together with DuckDB oracle SQL that
 * computes the same result. Query names carry the SURVEY §2 operator ids
 * they exercise.
 *
 * The diff/merge queries run a shared synthetic scenario derived from
 * `orders` (reference semantics: level-5 incremental loads,
 * /root/reference/sql/02-bde_control_functions.sql.in:2146-2373):
 *   cur = orders with keys ≡ 0 (mod 7) removed        (those become 'I')
 *   inc = orders with keys ≡ 0 (mod 9) removed        (those become 'D'),
 *         o_totalprice bumped for keys ≡ 0 (mod 4)    (those become 'U')
 *   chg = keys ≡ 0 (mod 3)                            (the change table)
 */
object SparkEntry {

  /** Fixed blocklist for the Aho–Corasick dictionary-scan query:
    * suffix-nested, prefix, cross-token, and absent phrases. */
  val DictPhrases: Seq[String] = Seq("table", "able", "le", "query", "que",
    "scan", "can", "stream", "ream", "value table", "zebra")

  /** Rejection list for the streaming blocklist gate — any occurrence
    * voids the document. */
  val BlockPhrases: Seq[String] = Seq("stream", "value table", "zebra")

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** The shared 500-node doc graph of the graph_* fixtures: two modular
    * out-links per non-dangling doc (docs ≡0 mod 7 dangle). The SQL twin
    * is [[DocGraphRawSql]]. */
  private def docGraphEdges(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"))
      .where(col("doc_id") % 7 =!= 0)
    val e1 = docs.select(col("doc_id").as("src"),
      ((col("doc_id") * 3 + 1) % 500).as("dst"))
    val e2 = docs.where(col("doc_id") % 3 === 0)
      .select(col("doc_id").as("src"),
        ((col("doc_id") * 7 + 5) % 500).as("dst"))
    e1.union(e2)
  }

  /** The "prior release" doc graph — the ×3-link arm only (the ×7 links
    * arrive with the next release; [[docGraphEdges]] is the full set). */
  private def docGraphPriorEdges(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"))
      .where(col("doc_id") % 7 =!= 0)
      .select(col("doc_id").as("src"),
        ((col("doc_id") * 3 + 1) % 500).as("dst"))

  /** [[docGraphPriorEdges]] as a CTE body (oracle side). */
  private val DocGraphPriorRawSql: String =
    """SELECT doc_id AS src, (doc_id * 3 + 1) % 500 AS dst
      |  FROM documents WHERE doc_id % 7 <> 0""".stripMargin

  /** The doc graph as a `raw(src, dst)` CTE body (oracle side). */
  private val DocGraphRawSql: String =
    """SELECT doc_id AS src, (doc_id * 3 + 1) % 500 AS dst
      |  FROM documents WHERE doc_id % 7 <> 0
      |  UNION ALL
      |  SELECT doc_id, (doc_id * 7 + 5) % 500
      |  FROM documents WHERE doc_id % 7 <> 0 AND doc_id % 3 = 0""".stripMargin

  /** `events` with `ts` surfaced as a proper TimestampType (µs),
    * schema-adaptively: generated data has shipped both TIMESTAMP(NANOS)
    * (read as a long of ns under `spark.sql.legacy.parquet.nanosAsLong`,
    * set by Verify/Bench) and TIMESTAMP(MICROS) without UTC adjustment
    * (read as TIMESTAMP_NTZ). Both normalize to the same wall-clock under
    * the UTC session; ns→µs truncation never moves a whole second. */
  private def events(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  // ---- shared diff scenario (Spark side) -------------------------------
  private val OrderCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority")

  private def curOrders(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").where(col("o_orderkey") % 7 =!= 0)

  private def incOrders(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .where(col("o_orderkey") % 9 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 4 === 0, col("o_totalprice") + 1)
          .otherwise(col("o_totalprice")))

  private def chgKeys(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").where(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey"))

  private def classify(s: SparkSession, dir: String): DataFrame =
    Diff.classifyChanges(curOrders(s, dir), incOrders(s, dir),
      chgKeys(s, dir), "o_orderkey")

  /** Variant increment that also shifts a declared-unique column
    * (o_custkey) for keys ≡ 0 (mod 5) — those classify as 'X'
    * (unique-constraint protection, sql:2335-2357). */
  private def incOrdersX(s: SparkSession, dir: String): DataFrame =
    incOrders(s, dir).withColumn("o_custkey",
      when(col("o_orderkey") % 5 === 0, col("o_custkey") + 1)
        .otherwise(col("o_custkey")))

  // ---- shared diff scenario (DuckDB side) ------------------------------
  private val ScenarioSql =
    """WITH cur AS (SELECT * FROM orders WHERE o_orderkey % 7 <> 0),
      |inc AS (SELECT o_orderkey, o_custkey, o_orderstatus,
      |        CASE WHEN o_orderkey % 4 = 0 THEN o_totalprice + 1
      |             ELSE o_totalprice END AS o_totalprice,
      |        o_orderdate, o_orderpriority
      |   FROM orders WHERE o_orderkey % 9 <> 0),
      |chg AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 3 = 0)""".stripMargin

  private val CompareSql = Seq("o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate", "o_orderpriority")
    .map(c => s"cur.$c IS NOT DISTINCT FROM inc.$c").mkString(" AND ")

  /** DuckDB mirror of the 'X'-action scenario (incOrdersX). */
  private val ClassifyXSql = {
    val cmp = Seq("o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .map(c => s"cur.$c IS NOT DISTINCT FROM inc.$c").mkString(" AND ")
    s"""WITH cur AS (SELECT * FROM orders WHERE o_orderkey % 7 <> 0),
       |inc AS (SELECT o_orderkey,
       |        CASE WHEN o_orderkey % 5 = 0 THEN o_custkey + 1
       |             ELSE o_custkey END AS o_custkey,
       |        o_orderstatus,
       |        CASE WHEN o_orderkey % 4 = 0 THEN o_totalprice + 1
       |             ELSE o_totalprice END AS o_totalprice,
       |        o_orderdate, o_orderpriority
       |   FROM orders WHERE o_orderkey % 9 <> 0),
       |chg AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 3 = 0),
       |actions AS (
       |  SELECT chg.o_orderkey, 'D' AS action FROM chg
       |    JOIN cur ON cur.o_orderkey = chg.o_orderkey
       |   WHERE NOT EXISTS (SELECT 1 FROM inc WHERE inc.o_orderkey = chg.o_orderkey)
       |  UNION ALL
       |  SELECT chg.o_orderkey, 'I' AS action FROM chg
       |    JOIN inc ON inc.o_orderkey = chg.o_orderkey
       |   WHERE NOT EXISTS (SELECT 1 FROM cur WHERE cur.o_orderkey = chg.o_orderkey)
       |  UNION ALL
       |  SELECT chg.o_orderkey,
       |         CASE WHEN $cmp THEN '0'
       |              WHEN NOT (cur.o_custkey IS NOT DISTINCT FROM inc.o_custkey)
       |                THEN 'X'
       |              ELSE 'U' END AS action
       |    FROM chg
       |    JOIN cur ON cur.o_orderkey = chg.o_orderkey
       |    JOIN inc ON inc.o_orderkey = chg.o_orderkey
       |)""".stripMargin
  }

  private val ClassifySql =
    s"""$ScenarioSql,
       |actions AS (
       |  SELECT chg.o_orderkey, 'D' AS action FROM chg
       |    JOIN cur ON cur.o_orderkey = chg.o_orderkey
       |   WHERE NOT EXISTS (SELECT 1 FROM inc WHERE inc.o_orderkey = chg.o_orderkey)
       |  UNION ALL
       |  SELECT chg.o_orderkey, 'I' AS action FROM chg
       |    JOIN inc ON inc.o_orderkey = chg.o_orderkey
       |   WHERE NOT EXISTS (SELECT 1 FROM cur WHERE cur.o_orderkey = chg.o_orderkey)
       |  UNION ALL
       |  SELECT chg.o_orderkey,
       |         CASE WHEN $CompareSql THEN '0' ELSE 'U' END AS action
       |    FROM chg
       |    JOIN cur ON cur.o_orderkey = chg.o_orderkey
       |    JOIN inc ON inc.o_orderkey = chg.o_orderkey
       |)""".stripMargin

  // ---- near-dup corpora ------------------------------------------------
  /** documents ∪ a copy with the first 5 tokens dropped (ids +10000000). */
  private def nearDupCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val toks = TextOps.tokens(col("text"))
    val mutated = d.select(
      (col("doc_id") + 10000000).as("doc_id"),
      when(size(toks) > 5, array_join(slice(toks, lit(6), size(toks) - 5), " "))
        .otherwise(col("text")).as("text"))
    d.unionByName(mutated)
  }

  /** The ingest-batch fixture all four incremental-dedup queries share
    * (plain/bloom × batch/stream — ONE definition, as their oracles share
    * one SQL): an exact copy of documents (ids +10000000), a token-sliced
    * mutation (ids +20000000), and a second copy of that mutation
    * (ids +30000000). Copies collide with the ingested corpus and drop;
    * the duplicated mutation dedups within the batch to its lower id. */
  private def incrementalIngestBatch(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val toks = TextOps.tokens(col("text"))
    val mutated = d.select(
      (col("doc_id") + 20000000).as("doc_id"),
      when(size(toks) > 5, array_join(slice(toks, lit(6), size(toks) - 5), " "))
        .otherwise(col("text")).as("text"))
    d.select((col("doc_id") + 10000000).as("doc_id"), col("text"))
      .unionByName(mutated)
      .unionByName(mutated.select((col("doc_id") + 10000000).as("doc_id"),
        col("text")))
  }

  /** Session-memoized LSH pair stream over [[nearDupCorpus]] at jaccard
    * ≥ 0.5 — the shared upstream of the components family
    * (`dedup_components` / `dedup_components_keep` / `dedup_cluster_best`).
    * Each of the three consumes the IDENTICAL pair set; without
    * memoization every one re-ran the full tokenize→minhash→band-join
    * pipeline, so a bench pass measured the same upstream three times
    * (~60 s of the r10 bench) and obscured the per-operator deltas. The
    * localCheckpoint survives the bench's per-query `clearCache()` (it is
    * RDD-level persistence, not a catalog cache entry); results are
    * unchanged — the checkpoint materializes exactly the frame the
    * operators consumed before. Same memoization shape as the E2E slice. */
  private val nearDupPairsCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]())
  private[graft] def nearDupPairs(s: SparkSession, dir: String): DataFrame =
    // keyed per SESSION (weakly — a stopped session and its checkpointed
    // RDD blocks must stay collectable, never pinned by this cache for
    // the JVM's lifetime) then per dir: a checkpointed RDD is bound to
    // its SparkContext, so a later session in the same JVM must not
    // receive the first session's frame
    nearDupPairsCache
      .computeIfAbsent(s,
        _ => new java.util.concurrent.ConcurrentHashMap[String, DataFrame]())
      .computeIfAbsent(dir, _ =>
        Dedup.minHashLshPairs(nearDupCorpus(s, dir), "doc_id", "text", 0.5)
          .localCheckpoint())

  /** The PERSISTED window-48 suffix-rank index over `documents` — the
    * shared at-rest upstream of the suffix-array family
    * (`suffix_array_ranks` / `suffix_array_top` /
    * `suffix_repeated_windows`). [[SuffixArray.writeRankIndex]] runs the
    * full prefix-doubling build ONCE per (session, dir) — the
    * build-once-per-corpus-release posture — and every consumer probes
    * `spark.table` over the bucketed artifact: no re-ranking anywhere
    * downstream (pinned by `PlanAuditSpec`), and the table survives the
    * bench's per-query `clearCache()` because it lives on disk, not in
    * block storage. Session-weak keying rationale as [[nearDupPairs]];
    * the table name carries a 64-bit sha-256 prefix of the dir (a 32-bit
    * String.hashCode could collide across arbitrary paths and silently
    * alias two corpora's rank tables). */
  private val suffixRanksCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]())
  private def suffixRanks48(s: SparkSession, dir: String): DataFrame =
    suffixRanksCache
      .computeIfAbsent(s,
        _ => new java.util.concurrent.ConcurrentHashMap[String, DataFrame]())
      .computeIfAbsent(dir, _ => {
        val digest = java.security.MessageDigest.getInstance("SHA-256")
          .digest(dir.getBytes("UTF-8")).take(8)
          .map("%02x".format(_)).mkString
        val tbl = s"${indexDb(s)}.suffix_rank_idx_$digest"
        SuffixArray.writeRankIndex(
          t(s, dir, "documents"), "doc_id", "text", 48, tbl, buckets = 16)
        s.table(tbl)
      })

  /** The SHARDED suffix index of the documents corpus, built once per
    * (session, sf dir) and shared by the three sharded-consumer gates:
    * release 1 (even ids) creates the index, release 2 (odd ids) folds
    * in through the delta-only [[SuffixArray.appendRankShard]] — so the
    * maintenance path, not just the layout, is what the consumers read. */
  private val shardedSuffixCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, String]]())
  private def shardedSuffix48(s: SparkSession, dir: String): String =
    shardedSuffixCache
      .computeIfAbsent(s,
        _ => new java.util.concurrent.ConcurrentHashMap[String, String]())
      .computeIfAbsent(dir, _ => {
        val digest = java.security.MessageDigest.getInstance("SHA-256")
          .digest(dir.getBytes("UTF-8")).take(8)
          .map("%02x".format(_)).mkString
        val tbl = s"${indexDb(s)}.suffix_shard_idx_$digest"
        val docs = t(s, dir, "documents")
        SuffixArray.writeShardedRankIndex(
          docs.where(col("doc_id") % 2 === 0), "doc_id", "text", 48,
          tbl, buckets = 16, shard = 0L)
        SuffixArray.appendRankShard(
          docs.where(col("doc_id") % 2 === 1), "doc_id", "text", 48,
          tbl, shard = 1L)
        tbl
      })

  /** The at-rest SPATIAL CELL index over the shifted mixed-geometry
    * fixture, built ONCE per (session, dir) and shared by the two
    * spatial probes (`geo_cell_probe` bbox scan, `geo_cell_knn` ring
    * search) — the [[suffixRanks48]] build-once-per-corpus-release
    * posture; the build bills to whichever probe runs first. Keying
    * and digest rationale as [[suffixRanksCache]]. */
  private val geoCellIdxCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, String]]())
  private def geoCellIdx(s: SparkSession, dir: String): String =
    geoCellIdxCache
      .computeIfAbsent(s,
        _ => new java.util.concurrent.ConcurrentHashMap[String, String]())
      .computeIfAbsent(dir, _ => {
        val digest = java.security.MessageDigest.getInstance("SHA-256")
          .digest(dir.getBytes("UTF-8")).take(8)
          .map("%02x".format(_)).mkString
        val tbl = s"${indexDb(s)}.geo_cell_idx_$digest"
        val geoms = mixedWktFixture(s, dir).select(
          col("o_orderkey").as("id"),
          Clean.shiftWkt(col("wkt_raw")).as("g"))
        operators.GeoIndex.writeGeoIndex(
          geoms, "id", "g", tbl, cellSize = 4.0, buckets = 8)
        tbl
      })

  /** Mixed-geometry WKT fixture shared by `s4_clean_geometry` and the
    * general-geometry `geo_*` gauges: cycles POINT / LINESTRING /
    * POLYGON / leading-digit MULTIPOLYGON / plain text by key, all
    * coordinates exact binary quarters so the 6 dp re-render can never
    * sit on a rounding tie between engines. */
  private def mixedWktFixture(s: SparkSession, dir: String): DataFrame = {
    val key = col("o_orderkey")
    val lon1 = (key % 360).cast("double") / 4.0 - 45.0 + 0.25
    val lat1 = (key % 170).cast("double") / 2.0 - 42.5 + 0.25
    val lon2 = lon1 + 0.5
    val lat2 = lat1 - 0.25
    val lon3 = lon1 - 0.75
    val lat3 = lat1 + 0.5
    val raw =
      when(key % 5 === 0, format_string("POINT(%.2f %.2f)", lon1, lat1))
        .when(key % 5 === 1, format_string(
          "LINESTRING(%.2f %.2f,%.2f %.2f)", lon1, lat1, lon2, lat2))
        .when(key % 5 === 2, format_string(
          "POLYGON((%.2f %.2f,%.2f %.2f,%.2f %.2f,%.2f %.2f))",
          lon1, lat1, lon2, lat2, lon3, lat3, lon1, lat1))
        .when(key % 5 === 3, format_string(
          "12 MULTIPOLYGON(((%.2f %.2f,%.2f %.2f,%.2f %.2f,%.2f %.2f)))",
          lon1, lat1, lon2, lat2, lon3, lat3, lon1, lat1))
        .otherwise(format_string("Lot %d Survey Plan", key))
    t(s, dir, "orders").where(key < 4000).select(key, raw.as("wkt_raw"))
  }

  /** DuckDB restatement of [[mixedWktFixture]] (a CTE body producing
    * o_orderkey, wkt_raw). */
  private val MixedWktBaseSql: String =
    """SELECT o_orderkey,
      |  CASE CAST(o_orderkey % 5 AS INTEGER)
      |    WHEN 0 THEN printf('POINT(%.2f %.2f)', lon1, lat1)
      |    WHEN 1 THEN printf('LINESTRING(%.2f %.2f,%.2f %.2f)',
      |                       lon1, lat1, lon2, lat2)
      |    WHEN 2 THEN printf(
      |      'POLYGON((%.2f %.2f,%.2f %.2f,%.2f %.2f,%.2f %.2f))',
      |      lon1, lat1, lon2, lat2, lon3, lat3, lon1, lat1)
      |    WHEN 3 THEN printf(
      |      '12 MULTIPOLYGON(((%.2f %.2f,%.2f %.2f,%.2f %.2f,%.2f %.2f)))',
      |      lon1, lat1, lon2, lat2, lon3, lat3, lon1, lat1)
      |    ELSE printf('Lot %d Survey Plan', o_orderkey) END AS wkt_raw
      |FROM (
      |  SELECT o_orderkey,
      |         (o_orderkey % 360)::DOUBLE / 4.0 - 45.0 + 0.25 AS lon1,
      |         (o_orderkey % 170)::DOUBLE / 2.0 - 42.5 + 0.25 AS lat1,
      |         (o_orderkey % 360)::DOUBLE / 4.0 - 45.0 + 0.25 + 0.5 AS lon2,
      |         (o_orderkey % 170)::DOUBLE / 2.0 - 42.5 + 0.25 - 0.25 AS lat2,
      |         (o_orderkey % 360)::DOUBLE / 4.0 - 45.0 + 0.25 - 0.75 AS lon3,
      |         (o_orderkey % 170)::DOUBLE / 2.0 - 42.5 + 0.25 + 0.5 AS lat3
      |  FROM orders WHERE o_orderkey < 4000)""".stripMargin

  /** The shared rotation of the two OPQ recall gauges (`ann_opq_recall`,
    * `ann_opq_ivfpq_recall`): SEEDED-deterministic Givens product
    * ([[operators.Opq.seededRotation]], pinned bit-for-bit against
    * tools/opq_reference.py in OpqSpec) rather than SVD-trained, so both
    * gauges carry full VALUE oracles — the matrix renders into the DuckDB
    * SQL as literals and the whole rotated pipeline is restated
    * independently. The trained rotation's recall advantage (the Ge et
    * al. quality claim) is asserted in OpqSpec, where a data-derived
    * matrix is legitimate. */
  private lazy val opqGaugeRotation: Array[Array[Double]] =
    operators.Opq.seededRotation(64, 7)

  /** The mutated-train winnow fingerprints shared by the three winnow
    * rows that all start from the same derived corpus (in-session match,
    * at-rest index lifecycle, retraction lifecycle): extraction —
    * tokenize + shingle + winnow over every corpus byte — is the
    * expensive stage and is exactly what the at-rest winnow index exists
    * to pay once, so the gauge process pays it once per (session, sf
    * dir) too. Each query still exercises its OWN downstream machinery
    * (broadcast join vs index write/probe vs tombstone/purge), and each
    * keeps its independent oracle. Session-weak keying rationale as the
    * other fixture caches. */
  private val winnowTrainCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]())
  private def winnowTrainFps(s: SparkSession, dir: String): DataFrame =
    winnowTrainCache
      .computeIfAbsent(s,
        _ => new java.util.concurrent.ConcurrentHashMap[String, DataFrame]())
      .computeIfAbsent(dir, _ => {
        val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val toks = TextOps.tokens(col("text"))
        val train = d.select((col("doc_id") + 10000000).as("doc_id"),
          when(size(toks) > 5,
              array_join(slice(toks, lit(6), size(toks) - 5), " "))
            .otherwise(col("text")).as("text"))
        Contamination.winnowFingerprints(train, "doc_id", "text", 4)
          .localCheckpoint(true)
      })

  /** Shared restatement of the two seeded-rotation OPQ recall oracles:
    * staged correlated corpus (`corr`) + its rotation (`rotc`, matrix as
    * literals), exact-L2 top-10 on the UN-rotated corpus, and the two
    * approx arms the caller renders against those CTE names — recall
    * joined per query. One builder so the staging/recall math cannot
    * silently diverge between the PQ and IVF-PQ gauges. */
  private def opqRecallOracle(opqArm: String, pqArm: String): String = {
    val rotLit = operators.OpqSql.rotationLiteral(opqGaugeRotation)
    val dist = operators.KMeansSql.distSql("q.embedding", "c.embedding")
    s"""WITH cm AS (
       |  SELECT vec_id, embedding,
       |         list_reduce(list_transform(embedding, x -> x::DOUBLE),
       |                     (a, b) -> a + b) / 64.0 AS mu
       |  FROM embeddings),
       |corr AS (SELECT vec_id,
       |                list_transform(embedding, x -> x::DOUBLE + mu)
       |                  AS embedding
       |         FROM cm),
       |rotc AS (SELECT vec_id,
       |                ${operators.OpqSql.matVec(rotLit, "embedding", 64)}
       |                  AS embedding
       |         FROM corr),
       |exact AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |           row_number() OVER (PARTITION BY q.vec_id
       |                              ORDER BY $dist, c.vec_id) AS rn
       |    FROM corr q JOIN corr c ON c.vec_id <> q.vec_id
       |    WHERE q.vec_id < 32)
       |  WHERE rn <= 10),
       |aopq AS (SELECT query_id, neighbor_id FROM ($opqArm)),
       |apq AS (SELECT query_id, neighbor_id FROM ($pqArm))
       |SELECT e.query_id,
       |       CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_hit_opq,
       |       round(sum(CASE WHEN a.neighbor_id IS NOT NULL
       |                      THEN 1 ELSE 0 END)::DOUBLE
       |             / count(*)::DOUBLE, 6) AS recall_opq,
       |       CAST(sum(CASE WHEN b.neighbor_id IS NOT NULL
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_hit_pq,
       |       round(sum(CASE WHEN b.neighbor_id IS NOT NULL
       |                      THEN 1 ELSE 0 END)::DOUBLE
       |             / count(*)::DOUBLE, 6) AS recall_pq
       |FROM exact e
       |LEFT JOIN aopq a USING (query_id, neighbor_id)
       |LEFT JOIN apq b USING (query_id, neighbor_id)
       |GROUP BY e.query_id ORDER BY query_id""".stripMargin
  }

  /** Script suffixes of the `text_scripts` gauge, one per doc_id%6 arm
    * (none, Cyrillic, Han, Hiragana, Hangul, Greek) — authored once;
    * the oracle renders the identical code points via CleanSql.sqlLit. */
  private val ScriptFixture: Seq[String] = Seq(
    "",
    " привет мир",
    " 中文处理很好",
    " こんにちは",
    " 한국어 텍스트",
    " Ελληνικά")

  /** Shared fixture of the `s4_clean_lds` gauge — one arm per LDS rule
    * family (escapes, C0 deletes, Latin-1 transliterations + soft-hyphen
    * delete, identity keeps through U+017F, the late-addition typographic
    * keeps, unmapped including a supplementary code point, the decoder's
    * U+FFFD marker). Authored ONCE; `CleanSql.sqlLit` renders the
    * identical code points into the oracle. */
  private val LdsCleanFixture: Seq[String] = Seq(
    "plain ascii stays",
    "pipe|and\\back",
    "line\nbreak\rcr",
    "ctrl\u0001\u0007tab\tkeep",
    "nbsp\u00A0dot\u00B7acc\u00B4guil\u00AB\u00BBsoft\u00ADend",
    "kept\u00E9\u00F1\u0152\u017Fs",
    "late\u2013\u2014\u2018\u2019\u201C\u201D\u2022punct",
    "unmapped\u2603\u4E2D\uD83D\uDE00bad\uFFFDend")

  /** Exact brute-force squared-L2 top-k — the shared ground-truth arm of
    * every ANN recall gauge (broadcast queries, one native-fold distance
    * per pair). Ranked by the bounded top-k aggregate (score = -distance
    * → distance asc, id asc), not a row_number window: the query_id
    * partition holds the whole corpus per query, and a window partition
    * can never be split — the aggregate combines map-side to ≤ k rows
    * per query per task. */
  private def exactL2TopK(emb: DataFrame, q: DataFrame, k: Int): DataFrame = {
    val topk = operators.Similarity.topKUdaf(k)
    emb
      .select(col("vec_id").cast("long").as("neighbor_id"),
        col("embedding").as("cv"))
      .join(broadcast(q.select(col("vec_id").cast("long").as("query_id"),
        col("embedding").as("qv"))),
        col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.VectorOps.sqDist(col("qv"), col("cv")).as("d"))
      .groupBy(col("query_id"))
      .agg(topk(-col("d"), col("neighbor_id")).as("tk"))
      .select(col("query_id"), explode(col("tk.items._2")).as("neighbor_id"))
  }

  /** Scratch database for the at-rest dedup-index roundtrip queries: one
    * location per JVM (CREATE DATABASE IF NOT EXISTS keeps the first);
    * `Bucketing.writeBucketed` drops/clears per table, so every query is
    * re-runnable within and across sessions. */
  /** Hand-built minimal JPEG with an EXIF APP1 in EITHER byte order
    * (orientation SHORT inline — left-justified in the value field, as
    * TIFF specifies, which is what makes the MM arm a real test —
    * DateTime ASCII pointed, optional GPS IFD with lat-ref + 3 pointed
    * RATIONALs) — the ONE construction fixture behind the mm_exif_*
    * rows and `ImageHashSpec`'s EXIF arms; every offset is computed,
    * nothing is pasted. */
  private[graft] object ExifFixture {
    def jpeg(orientation: Int, datetime: String, gps: Boolean,
        be: Boolean = false): Array[Byte] = {
      val tiff = new java.io.ByteArrayOutputStream()
      def t8(v: Int): Unit = tiff.write(v & 0xff)
      def t16(v: Int): Unit =
        if (be) { t8(v >> 8); t8(v) } else { t8(v); t8(v >> 8) }
      def t32(v: Long): Unit =
        if (be) {
          t8((v >> 24).toInt); t8((v >> 16).toInt); t8((v >> 8).toInt)
          t8(v.toInt)
        } else {
          t8(v.toInt); t8((v >> 8).toInt); t8((v >> 16).toInt)
          t8((v >> 24).toInt)
        }
      if (be) { t8('M'); t8('M') } else { t8('I'); t8('I') }
      t16(42); t32(8)
      val nEntries = if (gps) 3 else 2
      val ifd0End = 8 + 2 + nEntries * 12 + 4
      val dt = (datetime + "\u0000").getBytes("US-ASCII")
      val gpsIfdOff = ifd0End + dt.length
      t16(nEntries)
      t16(0x0112); t16(3); t32(1); t16(orientation); t16(0)
      t16(0x0132); t16(2); t32(dt.length.toLong); t32(ifd0End.toLong)
      if (gps) { t16(0x8825); t16(4); t32(1); t32(gpsIfdOff.toLong) }
      t32(0)
      tiff.write(dt)
      if (gps) {
        val latOff = gpsIfdOff + 2 + 2 * 12 + 4
        t16(2)
        t16(0x0001); t16(2); t32(2); t8('N'); t8(0); t16(0)
        t16(0x0002); t16(5); t32(3); t32(latOff.toLong)
        t32(0)
        for (v <- Seq(37L, 1L, 46L, 1L, 3000L, 100L)) t32(v)
      }
      val body = tiff.toByteArray
      val bb = new java.io.ByteArrayOutputStream()
      def w8(v: Int): Unit = bb.write(v & 0xff)
      w8(0xff); w8(0xd8)
      w8(0xff); w8(0xe1)
      val segLen = 2 + 6 + body.length
      w8(segLen >> 8); w8(segLen)
      bb.write("Exif".getBytes("US-ASCII")); w8(0); w8(0)
      bb.write(body)
      w8(0xff); w8(0xd9)
      bb.toByteArray
    }
  }

  private lazy val indexDbDir =
    java.nio.file.Files.createTempDirectory("graft_dedup_idx").toString
  private def indexDb(s: SparkSession): String = {
    Bucketing.scratchDb(s, "dedup_idx", indexDbDir)
    "dedup_idx"
  }

  private val NearDupCorpusSql = {
    val toks = TextOpsSql.tokens("text")
    s"""corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 10000000 AS doc_id,
       |         CASE WHEN len($toks) > 5
       |              THEN array_to_string(($toks)[6:], ' ')
       |              ELSE text END AS text
       |    FROM documents
       |)""".stripMargin
  }

  /** Shared interleaved image-text fixture (pages with two img slots
    * splitting the prose; slot 0's sidecar payload exists for ids%3≠0,
    * slot 1's for even ids — the payload BYTES are the doc's text).
    * Returns (pages, images). */
  private def mmFixture(
      s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val id = col("doc_id").cast("string")
    val d = t(s, dir, "documents").where(col("doc_id") < 80)
    val html = concat(
      lit("<html><body><p>intro "), id,
      lit(" <img src=\"img/"), id, lit("/0.png\"> middle "),
      lit("<img alt=\"x\" src='img/"), id, lit("/1.png'> outro</p>"),
      lit("<p>tail</p></body></html>"))
    val pages = d.select(col("doc_id"), html.as("html"))
    val images = d.select(col("doc_id"),
        concat(lit("img/"), id, lit("/0.png")).as("src"),
        when(col("doc_id") % 3 =!= 0, col("text").cast("binary"))
          .as("payload"))
      .unionByName(d.select(col("doc_id"),
        concat(lit("img/"), id, lit("/1.png")).as("src"),
        when(col("doc_id") % 2 === 0, col("text").cast("binary"))
          .as("payload")))
    (pages, images)
  }

  /** documents ∪ an exact copy (ids +10000000). */
  private def exactDupCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
    d.unionByName(d.select((col("doc_id") + 10000000).as("doc_id"), col("text")))
  }

  private val ExactDupCorpusSql =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000000 AS doc_id, text FROM documents
      |)""".stripMargin

  /** Paragraph-structured corpus: each document's tokens reflowed into
    * 8-token newline-separated lines under a constant boilerplate header
    * line, ∪ an exact copy (ids +10000000) — so the header is corpus-wide
    * boilerplate and every copy line is a cross-document duplicate. */
  private def paragraphCorpus(s: SparkSession, dir: String): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val lines = transform(
      sequence(lit(0), floor((size(toks) + 7) / 8).cast("int") - 1),
      i => array_join(slice(toks, i * lit(8) + 1, lit(8)), " "))
    val base = t(s, dir, "documents").select(col("doc_id"),
      concat_ws("\n", lit("corpus header boilerplate line"),
        array_join(lines, "\n")).as("text"))
    base.unionByName(
      base.select((col("doc_id") + 10000000).as("doc_id"), col("text")))
  }

  /** Crafted violators for the Gopher document-shape rules — one arm per
    * rule (short, symbol soup, numeric words, bullet lines, ellipsis
    * lines, no stop words); shared verbatim by the SQL rendering. */
  private val GopherArms: Seq[(Long, String)] = {
    val stops = "the of and that have with to be"
    Seq(
      20000001L -> s"too short $stops",
      20000002L -> (Seq.fill(30)("# word").mkString(" ") + " " + stops),
      20000003L -> (Seq.fill(60)("12345").mkString(" ") + " " + stops),
      20000004L -> (1 to 10).map(i =>
        s"- bullet item number $i with the words of and").mkString("\n"),
      20000005L -> (1 to 10).map(i =>
        s"line $i of the trailing text goes on and on ...").mkString("\n"),
      20000006L -> Seq.tabulate(60)(i => s"word$i").mkString(" "))
  }

  private val GopherArmsSql: String =
    GopherArms.map { case (id, text) =>
      val lit = text.replace("\n", "' || chr(10) || '")
      s"($id, '$lit')"
    }.mkString("VALUES ", ", ", "")

  /** One representative per NFKC compatibility class (ligature, fullwidth,
    * vulgar fraction, superscript, squared unit, letterlike, roman
    * numeral, DECOMPOSED accent, NBSP); [[NfkcExpectedSuffix]] is the
    * CPython `unicodedata.normalize('NFKC', …)` literal for it —
    * generated and re-verifiable via tools/nfkc_reference.py. */
  private val NfkcRawSuffix =
    " ﬁle ＦＵＬＬ ½ x² ㎞ ℕ " +
      "Ⅳ café no brk"
  private val NfkcExpectedSuffix =
    " file FULL 1⁄2 x2 km N IV café no brk"

  /** Host-structured corpus for the host-template family: every doc of a
    * source carries that source's nav line, even ids also carry the
    * source's footer, and exactly one doc per source (`doc_id < 20`;
    * source = src(id%20)) carries a corpus-wide famous-quote line —
    * host-RARE but globally frequent, the discriminator between the
    * host-scoped rule and the corpus-global `boilerplateStrip`. */
  private def hostTemplateCorpus(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"), col("source"),
      concat_ws("\n",
        concat(lit("nav menu for "), col("source")),
        col("text"),
        when(col("doc_id") % 2 === 0,
          concat(lit("(c) "), col("source"), lit(" all rights reserved"))),
        when(col("doc_id") < 20,
          lit("famous quote line shared across the web"))).as("text"))

  private val HostTemplateCorpusSql =
    """corpus AS (
      |  SELECT doc_id, source,
      |         concat_ws(chr(10),
      |           'nav menu for ' || source,
      |           text,
      |           CASE WHEN doc_id % 2 = 0
      |                THEN '(c) ' || source || ' all rights reserved' END,
      |           CASE WHEN doc_id < 20
      |                THEN 'famous quote line shared across the web' END)
      |           AS text
      |    FROM documents
      |),
      |lines AS (
      |  SELECT doc_id, source,
      |         unnest(range(len(string_split(text, chr(10))))) AS pos,
      |         unnest(string_split(text, chr(10))) AS line
      |    FROM corpus
      |)""".stripMargin

  /** Mirrored-hosts corpus: documents ∪ a FULL copy of src0's pages under
    * host `mirror0` (content Jaccard 1.0) ∪ a 60% copy of src1's pages
    * under `mirror1` (15 of 25 pages by sequence index — Jaccard
    * 15/(25+15−15) = 0.6). Src docs are `doc_id ≡ k (mod 20)`, so the
    * sequence index is `doc_id // 20`. */
  private def mirrorCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"), col("source"),
      col("text"))
    val full = d.where(col("source") === "src0")
      .select((col("doc_id") + 10000000).as("doc_id"),
        lit("mirror0").as("source"), col("text"))
    val partial = d.where(col("source") === "src1" &&
        floor(col("doc_id") / 20) % 5 < 3)
      .select((col("doc_id") + 20000000).as("doc_id"),
        lit("mirror1").as("source"), col("text"))
    d.unionByName(full).unionByName(partial)
  }

  private val MirrorCorpusSql =
    """corpus AS (
      |  SELECT doc_id, source, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000000 AS doc_id, 'mirror0' AS source, text
      |    FROM documents WHERE source = 'src0'
      |  UNION ALL
      |  SELECT doc_id + 20000000 AS doc_id, 'mirror1' AS source, text
      |    FROM documents WHERE source = 'src1' AND (doc_id // 20) % 5 < 3
      |)""".stripMargin

  /** Markup fixture for the HTML extraction queries: the document text
    * entity-encoded into a page with a title, script/style blocks (tag-like
    * noise inside both), an h1, a prose paragraph with one inline link, a
    * list, an all-anchor nav div, and a comment — built IDENTICALLY by
    * [[SynthHtmlSql]], so the oracle exercises extraction semantics over
    * real corpus text. */
  private def synthHtml(text: org.apache.spark.sql.Column,
      id: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val enc = replace(replace(replace(text,
      lit("&"), lit("&amp;")), lit("<"), lit("&lt;")), lit(">"), lit("&gt;"))
    concat(
      lit("<html><head><title>Graft</title>" +
        "<script type=\"text/javascript\">if (x<1) { alert(\"a&b\"); }</script>" +
        "<style>.a>b{}</style></head><body><h1>Doc "),
      id.cast("string"),
      lit("</h1><p>"), enc,
      lit("</p><p>See <a href=\"/docs\">docs</a> for details and more</p>" +
        "<ul><li>item one</li><li>item &amp; two</li></ul>" +
        "<div class=\"nav\"><a href=\"/\">Home</a> <a href=\"/about\">About</a></div>" +
        "<!-- footer --></body></html>"))
  }

  private val SynthHtmlSql =
    """'<html><head><title>Graft</title>' ||
      |'<script type="text/javascript">if (x<1) { alert("a&b"); }</script>' ||
      |'<style>.a>b{}</style></head><body><h1>Doc ' ||
      |CAST(doc_id AS VARCHAR) || '</h1><p>' ||
      |replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;') ||
      |'</p><p>See <a href="/docs">docs</a> for details and more</p>' ||
      |'<ul><li>item one</li><li>item &amp; two</li></ul>' ||
      |'<div class="nav"><a href="/">Home</a> <a href="/about">About</a></div>' ||
      |'<!-- footer --></body></html>'""".stripMargin

  /** The HTTP response head every WARC response fixture carries (WARC
    * payload of a response record = the raw HTTP message). */
  private val WarcHttpHead =
    "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"

  /** Deterministic WARC shard set built from the documents corpus, once
    * per (session, sf dir): doc_id < 40 split across 4 shards
    * (`doc_id % 4`), each headed by a `warcinfo` record; even doc_ids are
    * `response` records whose payload is the HTTP message wrapping
    * [[synthHtml]]'s markup, odd doc_ids are raw-text `resource` records;
    * shards 2 and 3 use the one-gzip-member-per-record Common Crawl
    * layout (and keep the plain `.warc` name — extensions lie on real
    * crawls, the reader sniffs magic bytes). Fixture construction is
    * driver-side by design (40 rows); the READ under test is the
    * distributed one. */
  private val warcDirCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, String]]())
  /** JSONL dump fixture: every document rendered `to_json(struct(doc_id,
    * lang, text))` — one object per line, the distribution convention —
    * with ids ≡ 0 (mod 13) TRUNCATED five chars short (an unterminated
    * string: guaranteed-malformed JSON), written once per (session, sf). */
  private val jsonlDirCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, String]]())

  private def jsonlFixture(s: SparkSession, dir: String): String =
    jsonlDirCache
      .computeIfAbsent(s,
        _ => new java.util.concurrent.ConcurrentHashMap[String, String]())
      .computeIfAbsent(dir, _ => {
        val out = java.nio.file.Files.createTempDirectory("graft_jsonl")
          .toString
        val json = to_json(struct(col("doc_id"), col("lang"), col("text")))
        t(s, dir, "documents")
          .select(when(col("doc_id") % 13 === 0,
              json.substr(lit(1), length(json) - 5))
            .otherwise(json).as("value"),
            col("doc_id"))
          .repartition(4, col("doc_id")).select(col("value"))
          .write.mode("overwrite").text(out)
        out
      })

  /** CSV dump fixture: `doc_id,lang,"text"` per line; ids ≡ 0 (mod 17)
    * get their doc_id prefixed with `x` — a type violation under the
    * LONG schema column, the deterministic way to a PERMISSIVE corrupt
    * row (wrong arity under-fills; unclosed quotes eat following lines). */
  private val csvDirCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, String]]())

  private def csvFixture(s: SparkSession, dir: String): String =
    csvDirCache
      .computeIfAbsent(s,
        _ => new java.util.concurrent.ConcurrentHashMap[String, String]())
      .computeIfAbsent(dir, _ => {
        val out = java.nio.file.Files.createTempDirectory("graft_csv")
          .toString
        val line = concat(col("doc_id").cast("string"), lit(","),
          col("lang"), lit(",\""), col("text"), lit("\""))
        t(s, dir, "documents")
          .select(when(col("doc_id") % 17 === 0, concat(lit("x"), line))
            .otherwise(line).as("value"), col("doc_id"))
          .repartition(4, col("doc_id")).select(col("value"))
          .write.mode("overwrite").text(out)
        out
      })

  private def warcFixture(s: SparkSession, dir: String): String =
    warcDirCache
      .computeIfAbsent(s,
        _ => new java.util.concurrent.ConcurrentHashMap[String, String]())
      .computeIfAbsent(dir, _ => {
        import graft.sources.Warc
        val rows = t(s, dir, "documents").where(col("doc_id") < 40)
          .select(col("doc_id"), col("text"),
            synthHtml(col("text"), col("doc_id")).as("html"))
          .collect()
          .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
          .sortBy(_._1)
        val out = java.nio.file.Files.createTempDirectory("graft_warc").toString
        val date = "2026-01-01T00:00:00Z"
        (0 until 4).foreach { shard =>
          val recs = Warc.renderRecord("warcinfo", None, date,
            "application/warc-fields", "software: graft".getBytes("UTF-8")) +:
            rows.filter(_._1 % 4 == shard).map { case (id, text, html) =>
              if (id % 2 == 0)
                Warc.renderRecord("response",
                  Some(s"https://graft.test/doc/$id"), date,
                  "application/http;msgtype=response",
                  (WarcHttpHead + html).getBytes("UTF-8"))
              else
                Warc.renderRecord("resource",
                  Some(s"https://graft.test/doc/$id"), date,
                  "text/plain", text.getBytes("UTF-8"))
            }
          val bytes =
            if (shard >= 2) recs.map(Warc.gzipMember)
            else recs
          val bos = new java.io.ByteArrayOutputStream()
          bytes.foreach(bos.write)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(out, s"shard$shard.warc"),
            bos.toByteArray)
        }
        out
      })

  /** Three-crawl TEMPORAL fixture: one shard per crawl month
    * (2026-01/02/03-01), each capturing resource records for doc_id <
    * 20 with crawl-tagged payloads — the closest-capture probe's input
    * (every URL has three dated captures to arbitrate between). */
  private def warcTemporalFixture(s: SparkSession, dir: String): String =
    warcDirCache
      .computeIfAbsent(s,
        _ => new java.util.concurrent.ConcurrentHashMap[String, String]())
      .computeIfAbsent(s"$dir#temporal", _ => {
        import graft.sources.Warc
        val rows = t(s, dir, "documents").where(col("doc_id") < 20)
          .select(col("doc_id"), col("text"))
          .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
        val out =
          java.nio.file.Files.createTempDirectory("graft_warc_time").toString
        (0 until 3).foreach { k =>
          val date = f"2026-0${k + 1}%d-01T00:00:00Z"
          val bos = new java.io.ByteArrayOutputStream()
          rows.foreach { case (id, text) =>
            bos.write(Warc.renderRecord("resource",
              Some(s"https://graft.test/doc/$id"), date, "text/plain",
              s"crawl$k $text".getBytes("UTF-8")))
          }
          java.nio.file.Files.write(
            java.nio.file.Paths.get(out, s"shard$k.warc"), bos.toByteArray)
        }
        out
      })

  /** Three-crawl fixture for the CDX collapse query: crawls 0 and 1
    * capture IDENTICAL payloads (the unchanged-page case collapse
    * exists to drop), crawl 2 changes — per URL the change points are
    * January and March. */
  private def warcCollapseFixture(s: SparkSession, dir: String): String =
    warcDirCache
      .computeIfAbsent(s,
        _ => new java.util.concurrent.ConcurrentHashMap[String, String]())
      .computeIfAbsent(s"$dir#collapse", _ => {
        import graft.sources.Warc
        val rows = t(s, dir, "documents").where(col("doc_id") < 20)
          .select(col("doc_id"), col("text"))
          .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
        val out =
          java.nio.file.Files.createTempDirectory("graft_warc_clps").toString
        (0 until 3).foreach { k =>
          val date = f"2026-0${k + 1}%d-01T00:00:00Z"
          val tag = if (k < 2) "crawlA" else "crawlB"
          val bos = new java.io.ByteArrayOutputStream()
          rows.foreach { case (id, text) =>
            bos.write(Warc.renderRecord("resource",
              Some(s"https://graft.test/doc/$id"), date, "text/plain",
              s"$tag $text".getBytes("UTF-8")))
          }
          java.nio.file.Files.write(
            java.nio.file.Paths.get(out, s"shard$k.warc"), bos.toByteArray)
        }
        out
      })

  /** Multi-host fixture for the domain/prefix CDX queries: a subdomain
    * ladder under graft.test plus a sibling host sharing its
    * registered-domain PREFIX string (graftother.test — the
    * label-boundary trap a naive string prefix fails), three path
    * families (/doc, /docs, /img — /docs is the string-prefix twin of
    * /doc). Resource records, payload = the doc's text. */
  private def warcPrefixFixture(s: SparkSession, dir: String): String =
    warcDirCache
      .computeIfAbsent(s,
        _ => new java.util.concurrent.ConcurrentHashMap[String, String]())
      .computeIfAbsent(s"$dir#prefix", _ => {
        import graft.sources.Warc
        val rows = t(s, dir, "documents").where(col("doc_id") < 24)
          .select(col("doc_id"), col("text"))
          .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
        val out =
          java.nio.file.Files.createTempDirectory("graft_warc_pfx").toString
        val bos = new java.io.ByteArrayOutputStream()
        rows.foreach { case (id, text) =>
          val host = (id % 4) match {
            case 0 => "graft.test"
            case 1 => "sub.graft.test"
            case 2 => "a.sub.graft.test"
            case _ => "graftother.test"
          }
          val path = (id % 3) match {
            case 0 => s"/doc/$id"
            case 1 => s"/docs/$id"
            case _ => s"/img/$id"
          }
          bos.write(Warc.renderRecord("resource",
            Some(s"https://$host$path"), "2026-01-01T00:00:00Z",
            "text/plain", text.getBytes("UTF-8")))
        }
        java.nio.file.Files.write(
          java.nio.file.Paths.get(out, "shard0.warc"), bos.toByteArray)
        out
      })

  /** Fixture for the WAT sidecar: response captures whose pages carry
    * every signal the sidecar records — two anchors (one plain with
    * anchor text, one rel=nofollow), a canonical declaration on ids%3=0,
    * a robots META noindex,nofollow on ids%5=0. */
  private def warcWatFixture(s: SparkSession, dir: String): String =
    warcDirCache
      .computeIfAbsent(s,
        _ => new java.util.concurrent.ConcurrentHashMap[String, String]())
      .computeIfAbsent(s"$dir#wat", _ => {
        import graft.sources.Warc
        val ids = t(s, dir, "documents").where(col("doc_id") < 30)
          .select(col("doc_id")).collect().map(_.getLong(0)).sorted
        val out =
          java.nio.file.Files.createTempDirectory("graft_warc_wat").toString
        val bos = new java.io.ByteArrayOutputStream()
        ids.foreach { id =>
          val canonical =
            if (id % 3 == 0)
              s"""<link rel="canonical" href="https://graft.test/c$id">"""
            else ""
          val robots =
            if (id % 5 == 0)
              """<meta name="robots" content="noindex, nofollow">"""
            else ""
          val html =
            s"""<html><head>$canonical$robots</head><body><p>body $id</p>
               |<p><a href="/p$id">to $id</a> <a rel="nofollow" href="/q$id">skip</a></p>
               |</body></html>""".stripMargin
          bos.write(Warc.renderRecord("response",
            Some(s"https://graft.test/doc/$id"), "2026-01-01T00:00:00Z",
            "application/http;msgtype=response",
            (WarcHttpHead + html).getBytes("UTF-8")))
        }
        java.nio.file.Files.write(
          java.nio.file.Paths.get(out, "shard0.warc"), bos.toByteArray)
        out
      })

  /** Single-shard WARC fixture whose response bodies carry the wire
    * encodings real captures do, by `doc_id % 4`: 0 = plain, 1 =
    * `Content-Encoding: gzip`, 2 = `Transfer-Encoding: chunked`
    * (100-byte chunks), 3 = chunked OVER gzip (entity gzipped first,
    * then chunk-framed — the RFC layering). Every record is a
    * `response` wrapping [[synthHtml]]'s markup for doc_id < 24. */
  private def warcEncodedFixture(s: SparkSession, dir: String): String =
    warcDirCache
      .computeIfAbsent(s,
        _ => new java.util.concurrent.ConcurrentHashMap[String, String]())
      .computeIfAbsent(s"$dir#encoded", _ => {
        import graft.sources.Warc
        val rows = t(s, dir, "documents").where(col("doc_id") < 24)
          .select(col("doc_id"), synthHtml(col("text"), col("doc_id")).as("html"))
          .collect()
          .map(r => (r.getLong(0), r.getString(1)))
          .sortBy(_._1)
        val out =
          java.nio.file.Files.createTempDirectory("graft_warc_enc").toString
        val date = "2026-01-01T00:00:00Z"
        val statusLine = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        val recs = Warc.renderRecord("warcinfo", None, date,
          "application/warc-fields", "software: graft".getBytes("UTF-8")) +:
          rows.map { case (id, html) =>
            val entity = html.getBytes("UTF-8")
            val (extraHead, body) = (id % 4) match {
              case 0 => ("", entity)
              case 1 => ("Content-Encoding: gzip\r\n", Warc.gzipMember(entity))
              case 2 => ("Transfer-Encoding: chunked\r\n",
                Warc.chunkedBody(entity, 100))
              case _ => ("Content-Encoding: gzip\r\nTransfer-Encoding: chunked\r\n",
                Warc.chunkedBody(Warc.gzipMember(entity), 100))
            }
            val head = (statusLine + extraHead + "\r\n").getBytes("UTF-8")
            Warc.renderRecord("response",
              Some(s"https://graft.test/doc/$id"), date,
              "application/http;msgtype=response", head ++ body)
          }
        val bos = new java.io.ByteArrayOutputStream()
        recs.foreach(bos.write)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(out, "shard0.warc"), bos.toByteArray)
        out
      })

  /** Punctuated line corpus for the C4 rule filter: 8-token lines from
    * each document, a terminal '.' appended iff (doc_id + line index) % 3
    * != 0 — so roughly a third of lines fail the punctuation rule, short
    * tail lines fail the word-count rule, and lines carrying the
    * blocklisted token fail the blocklist rule. */
  private def c4Corpus(s: SparkSession, dir: String): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val lines = transform(
      sequence(lit(0), floor((size(toks) + 7) / 8).cast("int") - 1),
      i => concat(
        array_join(slice(toks, i * lit(8) + 1, lit(8)), " "),
        when((col("doc_id") + i) % 3 =!= 0, lit(".")).otherwise(lit(""))))
    t(s, dir, "documents")
      .select(col("doc_id"), array_join(lines, "\n").as("text"))
  }

  private val C4CorpusSql = {
    val tk = TextOpsSql.tokens("text")
    s"""c4base AS (
       |  SELECT doc_id,
       |         array_to_string(list_transform(range((len(tk)+7)//8),
       |           i -> array_to_string(tk[i*8+1 : i*8+8], ' ') ||
       |                CASE WHEN (doc_id + i) % 3 <> 0 THEN '.' ELSE '' END),
       |           chr(10)) AS text
       |    FROM (SELECT doc_id, $tk AS tk FROM documents)
       |),
       |lines AS (
       |  SELECT doc_id,
       |         unnest(range(len(string_split(text, chr(10))))) AS pos,
       |         unnest(string_split(text, chr(10))) AS line
       |    FROM c4base
       |)""".stripMargin
  }

  private val ParagraphCorpusSql = {
    val tk = TextOpsSql.tokens("text")
    s"""base AS (
       |  SELECT doc_id, 'corpus header boilerplate line' || chr(10) ||
       |         array_to_string(list_transform(range((len(tk)+7)//8),
       |           i -> array_to_string(tk[i*8+1 : i*8+8], ' ')), chr(10))
       |           AS text
       |    FROM (SELECT doc_id, $tk AS tk FROM documents)
       |),
       |corpus AS (
       |  SELECT doc_id, text FROM base
       |  UNION ALL
       |  SELECT doc_id + 10000000 AS doc_id, text FROM base
       |),
       |lines AS (
       |  SELECT doc_id,
       |         unnest(range(len(string_split(text, chr(10))))) AS pos,
       |         unnest(string_split(text, chr(10))) AS line
       |    FROM corpus
       |)""".stripMargin
  }

  /** Compression-ratio edge-case corpus: pure repetition, natural-language
    * repetition, an incompressible alnum string, empty, multi-byte UTF-8,
    * a single char, and JSON boilerplate. Its oracle pins the LITERAL
    * compressed lengths produced by the INDEPENDENT CPython zlib
    * (`tools/zlib_reference.py` — regenerate there, never from the JVM
    * side under test); keep the two corpora byte-identical by hand. */
  private val CompressionCorpus = Seq(
    (1, "a" * 200),
    (2, "the quick brown fox jumps over the lazy dog. " * 10),
    (3, "k9G2mX7qLpZ4wN8vB1cR5tY0uJ6hD3fS"),
    (4, ""),
    (5, "héllo wörld — 你好世界 " * 8),
    (6, "x"),
    (7, "{\"id\": 1, \"tags\": [\"a\", \"b\"], \"ok\": true}\n" * 25))

  /** PII edge-case corpus. Its oracle is literal expected VALUES (intent),
    * not a rendering of the same regexes — keep the two in sync by hand. */
  private val PiiCorpus = Seq(
    (1, "contact me at alice.smith+spam@example.co.nz or call 555-123-4567"),
    (2, "server at 192.168.0.1 logged jbloggs@mail.org twice"),
    (3, "no pii here, just 1234 numbers and a dot. end"),
    (4, "+1 (555) 123-4567 and 10.0.0.255 and bob@sub.domain.io"),
    (5, ""))

  /** GPT-2 pre-tokenizer edge corpus: contractions, an interior
    * multi-space run (the lookahead arm), letter/digit boundary splits,
    * trailing whitespace, non-ASCII letters/punctuation/currency,
    * newlines, and the empty string. Expected pieces derive from the
    * published pattern run under the reference Python `regex` module
    * (independent engine); oracle VALUES kept in sync by hand. */
  private val PretokenCorpus = Seq(
    (1, "I've said he'll don't, can't."),
    (2, "Hello   world"),
    (3, "abc123 42x  7"),
    (4, "tail spaces  "),
    (5, "naïve café — €5,00"),
    (6, "line1\nline2  \n x"),
    (7, ""))

  /** Shared two-release fetch-state fixture for the conditional-fetch
    * gates: release 1 covers ids < 50 (ETag iff id%3=0, Last-Modified
    * iff id%3<2), release 2 refreshes even ids with a v2 ETag and no
    * Last-Modified; ids 50-59 never fetched. Returns (frontier urls
    * with doc_id, state log); [[CondFetchOracleSql]] is the
    * conditional-plan restatement. */
  private def condFetchFixture(
      s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val urls = t(s, dir, "documents").where(col("doc_id") < 60)
      .select(col("doc_id"),
        concat(lit("https://graft.test/doc/"), col("doc_id")).as("url"))
    val st1 = urls.where(col("doc_id") < 50).select(col("url"),
      when(col("doc_id") % 3 === 0,
        concat(lit("W/\"v1-"), col("doc_id"), lit("\""))).as("etag"),
      when(col("doc_id") % 3 < 2,
        concat(lit("lm-"), col("doc_id"))).as("last_modified"),
      (col("doc_id") + 100).as("fetch_time"))
    val st2 = urls.where(col("doc_id") < 50 && col("doc_id") % 2 === 0)
      .select(col("url"),
        concat(lit("W/\"v2-"), col("doc_id"), lit("\"")).as("etag"),
        lit(null).cast("string").as("last_modified"),
        (col("doc_id") + 1000).as("fetch_time"))
    (urls, st1.unionByName(st2))
  }

  /** The WET text restatement shared by the batch roundtrip and the
    * streaming export door (shard membership differs, record content
    * must not). */
  private lazy val WetRoundtripOracleSql: String =
    s"""WITH h AS (
           |  SELECT 'https://graft.test/doc/' || CAST(doc_id AS VARCHAR)
           |           AS target_uri,
           |         $SynthHtmlSql AS html
           |  FROM documents WHERE doc_id < 40 AND doc_id % 2 = 0),
           |x AS (SELECT target_uri,
           |             ${HtmlOpsSql.mainText("html", 0.5)} AS text
           |      FROM h)
           |SELECT target_uri, 'text/plain' AS content_type,
           |       CAST(octet_length(encode(text)) AS BIGINT)
           |         AS content_length, text
           |FROM x ORDER BY target_uri""".stripMargin

  /** The conditional-fetch restatement shared by the batch and
    * streaming doors (the stream is a stateless projection, so both
    * must land on identical rows). */
  /** [[CondFetchOracleSql]] with the state log additionally filtered —
    * the retraction oracle's rebuild-from-filtered-history arm
    * (`stFilter` is a predicate over `doc_id`). */
  private def condFetchOracleSqlWhere(stFilter: String): String =
    s"""WITH d AS (
          |  SELECT doc_id,
          |         'https://graft.test/doc/' || CAST(doc_id AS VARCHAR)
          |           AS url
          |  FROM documents WHERE doc_id < 60),
          |st AS (
          |  SELECT url,
          |         CASE WHEN doc_id % 3 = 0 THEN
          |           'W/"v1-' || CAST(doc_id AS VARCHAR) || '"' END AS etag,
          |         CASE WHEN doc_id % 3 < 2 THEN
          |           'lm-' || CAST(doc_id AS VARCHAR) END AS last_modified,
          |         doc_id + 100 AS fetch_time
          |  FROM d WHERE doc_id < 50 AND ($stFilter)
          |  UNION ALL
          |  SELECT url, 'W/"v2-' || CAST(doc_id AS VARCHAR) || '"',
          |         NULL, doc_id + 1000
          |  FROM d WHERE doc_id < 50 AND doc_id % 2 = 0 AND ($stFilter)),
          |latest AS (
          |  SELECT s.url, s.etag AS if_none_match,
          |         s.last_modified AS if_modified_since
          |  FROM st s
          |  JOIN (SELECT url, max(fetch_time) AS mt FROM st GROUP BY url) m
          |    ON s.url = m.url AND s.fetch_time = m.mt)
          |SELECT d.url, l.if_none_match, l.if_modified_since,
          |       (l.if_none_match IS NOT NULL OR
          |        l.if_modified_since IS NOT NULL) AS conditional
          |FROM d LEFT JOIN latest l ON d.url = l.url
          |ORDER BY d.url""".stripMargin

  private val CondFetchOracleSql: String = condFetchOracleSqlWhere("TRUE")

  /** The sitemap-lastmod arbitration restatement shared by the ephemeral
    * and persisted-index doors (the index stores exactly the state log
    * the ephemeral plan consumed, so both must land on identical rows). */
  private val SitemapRefetchOracleSql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |         'https://graft.test/doc/' || CAST(doc_id AS VARCHAR)
      |           AS url
      |  FROM documents WHERE doc_id < 60),
      |st AS (
      |  SELECT url,
      |         CASE WHEN doc_id % 3 = 0 THEN
      |           'W/"v1-' || CAST(doc_id AS VARCHAR) || '"' END AS etag,
      |         CASE WHEN doc_id % 3 < 2 THEN
      |           'lm-' || CAST(doc_id AS VARCHAR) END AS last_modified,
      |         doc_id + 100 AS fetch_time
      |  FROM d WHERE doc_id < 50
      |  UNION ALL
      |  SELECT url, 'W/"v2-' || CAST(doc_id AS VARCHAR) || '"',
      |         NULL, doc_id + 1000
      |  FROM d WHERE doc_id < 50 AND doc_id % 2 = 0),
      |latest AS (
      |  SELECT s.url, s.etag, s.last_modified, s.fetch_time
      |  FROM st s
      |  JOIN (SELECT url, max(fetch_time) AS mt FROM st GROUP BY url) m
      |    ON s.url = m.url AND s.fetch_time = m.mt),
      |e AS (
      |  SELECT url, doc_id,
      |         CASE WHEN doc_id % 5 = 0 THEN doc_id + 5000
      |              WHEN doc_id % 5 <= 2 THEN 10 END AS lastmod
      |  FROM d),
      |due AS (
      |  SELECT e.url, e.lastmod,
      |         CASE WHEN l.url IS NULL THEN 'new'
      |              WHEN e.lastmod IS NOT NULL AND
      |                   e.lastmod > l.fetch_time THEN 'modified'
      |              ELSE 'revalidate' END AS due,
      |         l.etag, l.last_modified
      |  FROM e LEFT JOIN latest l ON e.url = l.url)
      |SELECT url, CAST(lastmod AS BIGINT) AS lastmod, due,
      |       CASE WHEN due = 'revalidate' THEN etag END
      |         AS if_none_match,
      |       CASE WHEN due = 'revalidate' THEN last_modified END
      |         AS if_modified_since,
      |       (CASE WHEN due = 'revalidate' THEN etag END IS NOT NULL OR
      |        CASE WHEN due = 'revalidate' THEN last_modified END
      |          IS NOT NULL) AS conditional
      |FROM due ORDER BY url""".stripMargin

  /** The Cho–Garcia-Molina estimator restatement shared by the ephemeral
    * capture-history door and the persisted fetch-state index door. */
  private val RevisitOracleSql: String =
    """WITH c AS (
      |  SELECT 'https://e.test/u' || CAST(event_id % 97 AS VARCHAR)
      |           AS url,
      |         ts, event_type AS digest
      |  FROM events),
      |l AS (
      |  SELECT url, epoch_us(ts) AS us,
      |         lag(epoch_us(ts)) OVER w AS prev_us,
      |         CAST(digest <> lag(digest) OVER w AS INT) AS chg
      |  FROM c WINDOW w AS (PARTITION BY url ORDER BY ts, digest)),
      |g AS (
      |  SELECT url,
      |         count(prev_us) AS n_intervals,
      |         CAST(coalesce(sum(chg), 0) AS BIGINT) AS n_changes,
      |         avg(us - prev_us) / 1e6 AS mi,
      |         (epoch_us(TIMESTAMP '2024-02-15 00:00:00') - max(us))
      |           / 1e6 AS age_s
      |  FROM l GROUP BY url)
      |SELECT url, n_intervals, n_changes,
      |       round(mi, 6) AS mean_interval_s,
      |       round(CASE WHEN n_intervals > 0 AND mi > 0 THEN
      |         -ln((n_intervals - n_changes + 0.5) / (n_intervals + 0.5))
      |           / mi * 86400 END, 6) AS change_rate_day,
      |       round(CASE WHEN n_intervals > 0 AND mi > 0 THEN
      |         1 - exp(ln((n_intervals - n_changes + 0.5)
      |                    / (n_intervals + 0.5)) / mi * age_s) END, 6)
      |         AS p_changed
      |FROM g ORDER BY url""".stripMargin

  /** The closed 3-cycle crawl loop over the durable frontier + fetch-state
    * stores, unrolled cycle by cycle: per-host top-3 schedule (horizon 30 s
    * / default delay 10 s), the (id%7)+100 discovery fold with
    * max-over-discoverers priority, the never-fetched admission gate, and
    * the deferred-tail merge that REPLACES the frontier store. */
  private val CrawlCycleLoopOracleSql: String = {
    def urlOf(idExpr: String): String =
      s"'https://h' || CAST(($idExpr) % 3 AS VARCHAR) || '.test/u' || " +
        s"CAST($idExpr AS VARCHAR)"
    def schedCte(out: String, in: String): String =
      s"""$out AS (
         |  SELECT id, url, priority,
         |         CAST(row_number() OVER w - 1 AS BIGINT) AS slot
         |  FROM $in
         |  WINDOW w AS (PARTITION BY id % 3 ORDER BY priority DESC, url)
         |  QUALIFY row_number() OVER w <= 3)""".stripMargin
    def discCte(out: String, in: String, fetchedSoFar: String): String =
      s"""$out AS (
         |  SELECT id, ${urlOf("id")} AS url, priority FROM (
         |    SELECT (id % 7) + 100 AS id,
         |           max(CAST((id * 3) % 17 AS DOUBLE)) AS priority
         |    FROM $in GROUP BY (id % 7) + 100)
         |  WHERE id NOT IN ($fetchedSoFar))""".stripMargin
    def mergeCte(out: String, frontier: String, sched: String,
        novel: String): String =
      s"""$out AS (
         |  SELECT id, url, max(priority) AS priority FROM (
         |    SELECT id, url, priority FROM $frontier
         |    WHERE id NOT IN (SELECT id FROM $sched)
         |    UNION ALL
         |    SELECT id, url, priority FROM $novel)
         |  GROUP BY id, url)""".stripMargin
    s"""WITH f1 AS (
       |  SELECT doc_id AS id, ${urlOf("doc_id")} AS url,
       |         CAST((doc_id * 7) % 13 AS DOUBLE) AS priority
       |  FROM documents WHERE doc_id < 30),
       |${schedCte("s1", "f1")},
       |${discCte("n1", "s1", "SELECT id FROM s1")},
       |${mergeCte("f2", "f1", "s1", "n1")},
       |${schedCte("s2", "f2")},
       |${discCte("n2", "s2",
          "SELECT id FROM s1 UNION ALL SELECT id FROM s2")},
       |${mergeCte("f3", "f2", "s2", "n2")},
       |${schedCte("s3", "f3")},
       |${discCte("n3", "s3",
          "SELECT id FROM s1 UNION ALL SELECT id FROM s2 " +
            "UNION ALL SELECT id FROM s3")},
       |${mergeCte("f4", "f3", "s3", "n3")}
       |SELECT * FROM (
       |  SELECT 1 AS cycle, 'sched' AS kind, id, url, priority, slot,
       |         CAST(slot * 10.0 AS DOUBLE) AS sched_s FROM s1
       |  UNION ALL
       |  SELECT 2, 'sched', id, url, priority, slot,
       |         CAST(slot * 10.0 AS DOUBLE) FROM s2
       |  UNION ALL
       |  SELECT 3, 'sched', id, url, priority, slot,
       |         CAST(slot * 10.0 AS DOUBLE) FROM s3
       |  UNION ALL
       |  SELECT 3, 'tail', id, url, priority, CAST(NULL AS BIGINT),
       |         CAST(NULL AS DOUBLE) FROM f4)
       |ORDER BY cycle, kind, url""".stripMargin
  }

  /** Shared two-release duplicate-pair fixture: release 1 chains
    * (3k, 3k+1); release 2 extends (3k+1, 3k+2) on even k and bridges
    * (3k+1, 3k+3) on k ≡ 0 (mod 5). Returns (p1, p2, release-1
    * members); [[ComponentsMergeOracleSql]] is its cold closure. */
  private def componentPairFixture(
      s: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame) = {
    val d = t(s, dir, "documents").select(col("doc_id"))
      .where(col("doc_id") < 300)
    val p1 = d.where(col("doc_id") % 3 === 0 && col("doc_id") + 1 < 300)
      .select(col("doc_id").as("id_a"), (col("doc_id") + 1).as("id_b"))
    val p2 = d.where(col("doc_id") % 6 === 0 && col("doc_id") + 2 < 300)
      .select((col("doc_id") + 1).as("id_a"), (col("doc_id") + 2).as("id_b"))
      .unionByName(
        d.where(col("doc_id") % 15 === 0 && col("doc_id") + 3 < 300)
          .select((col("doc_id") + 1).as("id_a"),
            (col("doc_id") + 3).as("id_b")))
    val members1 = p1.select(col("id_a").as("doc_id"))
      .unionByName(p1.select(col("id_b").as("doc_id"))).distinct()
    (p1, p2, members1)
  }

  /** The cold transitive closure over the FULL accumulated pair set of
    * [[componentPairFixture]] — shared by both merge gates (the at-rest
    * path must land on identical labels). */
  private val ComponentsMergeOracleSql: String =
    """WITH RECURSIVE d AS (
      |  SELECT doc_id FROM documents WHERE doc_id < 300),
      |p1 AS (SELECT doc_id AS id_a, doc_id + 1 AS id_b FROM d
      |       WHERE doc_id % 3 = 0 AND doc_id + 1 < 300),
      |p2 AS (SELECT doc_id + 1 AS id_a, doc_id + 2 AS id_b FROM d
      |       WHERE doc_id % 6 = 0 AND doc_id + 2 < 300
      |       UNION ALL
      |       SELECT doc_id + 1, doc_id + 3 FROM d
      |       WHERE doc_id % 15 = 0 AND doc_id + 3 < 300),
      |allp AS (SELECT * FROM p1 UNION ALL SELECT * FROM p2),
      |edges AS (SELECT id_a AS src, id_b AS dst FROM allp
      |          UNION ALL SELECT id_b, id_a FROM allp),
      |members AS (SELECT DISTINCT src AS id FROM edges),
      |reach(id, label) AS (
      |  SELECT id, id FROM members
      |  UNION
      |  SELECT e.src, r.label FROM reach r JOIN edges e ON e.dst = r.id)
      |SELECT id AS doc_id, min(label) AS component
      |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin

  /** BM25 intent-pin corpus; expected scores derive from
    * `tools/bm25_reference.py` (independent Python implementation). */
  private val Bm25Corpus = Seq(
    (1L, "cat sat on the mat"),
    (2L, "dog and cat and dog play"),
    (3L, "fish swim in deep water"),
    (4L, "dog dog dog dog dog dog dog dog"))

  /** Classifier intent-pin corpus; expected scores derive from
    * `tools/classifier_reference.py` (independent token-hash + weight
    * recomputation). Includes the empty-doc edge (score 0.0). */
  private val ClassifierCorpus = Seq(
    (1L, "cat sat on the mat"),
    (2L, "dog and cat and dog play"),
    (3L, ""))

  /** Flagship query on sf0.001; the driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** Sample tables.conf content (grammar: lib/LINZ/BdeUpload.pm:125-200). */
  private val SampleTablesConf =
    """# sample catalog
      |TABLE l5_change_table files xchg
      |TABLE alpha key=id row_tol=0.20,0.95 files alp1 alp2
      |TABLE beta l0_only files bet
      |TABLE gamma l5_only key=audit_id files gam
      |TABLE delta l5_is_full key=id files del
      |COLUMN id integer
      |""".stripMargin

  // =====================================================================
  // Queries — one per implemented operator (SURVEY §2 ids in names).
  // =====================================================================
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A-family flagship aggregation (A1-style counts + sums; bench headline)
    "q1_pricing_summary" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // S1+O1: dataset scan — enumerate snapshot names, filter < end date, sort
    "s1_dataset_scan" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(date_format(col("o_orderdate"), "yyyyMMddHHmmss").as("dataset"))
        .distinct()
        .where(col("dataset") < "19980101000000")
        .orderBy(col("dataset"))),

    // S2: completeness anti-join — required minus present
    "s2_completeness_antijoin" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").where(col("o_totalprice") > 300000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"))
        .orderBy(col("c_custkey"))),

    // P1+P2: column-intersection projection (file-order preserved)
    "p1_column_intersection" -> ((s, dir) =>
      BdeFormat.selectValidColumns(
        t(s, dir, "lineitem"),
        Seq("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate", "no_such_col"))
        .where(col("l_orderkey") % 100 === 0)
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // P3: watermark predicate — datasets after the last-loaded one
    "p3_watermark_filter" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(date_format(col("o_orderdate"), "yyyyMMddHHmmss").as("dataset"))
        .distinct()
        .where(col("dataset") > "19970101000000" && col("dataset") < "19980101000000")
        .orderBy(col("dataset"))),

    // P4: change-set per-table filter
    "p4_change_filter" -> ((s, dir) =>
      events(s, dir)
        .where(lower(col("event_type")) === "purchase")
        .select(col("user_id")).distinct()
        .orderBy(col("user_id"))),

    // P6: zombie/expiry predicate
    "p6_expiry_predicate" -> ((s, dir) =>
      t(s, dir, "orders")
        .where(col("o_orderdate") < lit("1996-01-01").cast("timestamp")
          && col("o_orderstatus") =!= "F")
        .select(col("o_orderkey"))
        .orderBy(col("o_orderkey"))),

    // J1: anti-join deletes
    "j1_anti_delete" -> ((s, dir) =>
      classify(s, dir).where(col("action") === Diff.ActionDelete)
        .orderBy(col("o_orderkey"))),

    // J2: anti-join inserts
    "j2_anti_insert" -> ((s, dir) =>
      classify(s, dir).where(col("action") === Diff.ActionInsert)
        .orderBy(col("o_orderkey"))),

    // J3: inner join + null-safe full-row compare → U/0
    "j3_nullsafe_classify" -> ((s, dir) =>
      classify(s, dir).orderBy(col("o_orderkey"), col("action"))),

    // J3x: unique-constraint column changed → 'X' (delete+insert protection,
    // sql/02-bde_control_functions.sql.in:2335-2357). repairKeySwaps=false:
    // o_custkey is a DECLARED-unique proxy, not truly unique in the data.
    "j3x_unique_classify" -> ((s, dir) =>
      Diff.classifyChanges(curOrders(s, dir), incOrdersX(s, dir),
        chgKeys(s, dir), "o_orderkey",
        uniqueCols = Seq("o_custkey"), repairKeySwaps = false)
        .orderBy(col("o_orderkey"), col("action"))),

    // J4: full-table diff (level-0 incremental)
    "j4_full_diff" -> ((s, dir) =>
      Diff.fullDiff(curOrders(s, dir), incOrders(s, dir), "o_orderkey")
        .orderBy(col("o_orderkey"))),

    // J5: key-swap repair join
    "j5_keyswap_repair" -> ((s, dir) => {
      val sup = t(s, dir, "supplier")
      val inc = sup.withColumn("s_suppkey",
        when(col("s_suppkey") % 3 === 0, col("s_suppkey") + 1000000)
          .otherwise(col("s_suppkey")))
      val chg = sup.where(col("s_suppkey") % 3 === 0)
        .select((col("s_suppkey") + 1000000).as("s_suppkey"))
      Diff.fixChangedKeys(sup, inc, chg, "s_suppkey", Seq("s_name"))
        .orderBy(col("s_suppkey"))
    }),

    // J6: stats/metadata join chain
    "j6_stats_join" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
          round(sum(col("c_acctbal")), 2).as("total_acctbal"))
        .orderBy(col("r_name"), col("n_name"))),

    // E2-apply: merge classified actions back into the table. The classify
    // pipeline feeds both merge sides, so it is cached (as the Loader does
    // on the production path); the Verify/Bench harnesses clear the session
    // cache between queries.
    "e2_apply_actions" -> ((s, dir) =>
      Diff.applyActions(curOrders(s, dir), incOrders(s, dir),
        classify(s, dir).cache(), "o_orderkey")
        .select(col("o_orderkey"))
        .orderBy(col("o_orderkey"))),

    // A1: count-by-action over the classified change set
    "a1_count_by_action" -> ((s, dir) =>
      Diff.countByAction(classify(s, dir))),

    // A2: row-count tolerance gate
    "a2_tolerance_check" -> ((s, dir) => {
      val oldC = t(s, dir, "orders").agg(count(lit(1)).as("old_count"))
      val newC = incOrders(s, dir).agg(count(lit(1)).as("new_count"))
      oldC.crossJoin(newC).select(
        col("old_count"), col("new_count"),
        (col("new_count") < ceil(col("old_count") * 0.95).cast("bigint"))
          .as("tol_warn"),
        (col("new_count") < ceil(col("old_count") * 0.20).cast("bigint"))
          .as("tol_error"))
    }),

    // A3: existence/any aggregate
    "a3_exists_check" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").where(col("o_totalprice") > 150000)
            .select(col("o_custkey")).distinct(),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("c_mktsegment"))),

    // A4: min/max duration per event
    "a4_event_duration" -> ((s, dir) =>
      events(s, dir)
        .groupBy(col("event_type"))
        .agg((unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts"))))
          .as("duration_s"))
        .orderBy(col("event_type"))),

    // A5: max-of-string watermark fold
    "a5_watermark_fold" -> ((s, dir) =>
      events(s, dir)
        .groupBy(col("event_type"))
        .agg(max(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")).as("last_ts"))
        .orderBy(col("event_type"))),

    // A6: string_agg diagnostic
    "a6_string_agg" -> ((s, dir) =>
      t(s, dir, "nation")
        .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(array_join(array_sort(collect_list(col("n_name"))), ",")
          .as("nations"))
        .orderBy(col("r_name"))),

    // O3: latest-dataset pick (sort desc + limit 1)
    "o3_latest_dataset" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(date_format(col("o_orderdate"), "yyyyMMddHHmmss").as("dataset"))
        .distinct()
        .orderBy(col("dataset").desc)
        .limit(1)),

    // O4: ORDER BY … LIMIT 1 prefer-primary
    "o4_top1_prefer" -> ((s, dir) =>
      t(s, dir, "part")
        .orderBy(col("p_size").desc, col("p_partkey"))
        .select(col("p_partkey"), col("p_size"))
        .limit(1)),

    // U1: 3-way union + distinct
    "u1_union_distinct" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      o.where(col("o_orderkey") % 2 === 0).select(col("o_custkey").as("custkey"))
        .unionByName(o.where(col("o_orderkey") % 3 === 0)
          .select(col("o_custkey").as("custkey")))
        .unionByName(c.where(col("c_acctbal") < 0)
          .select(col("c_custkey").as("custkey")))
        .distinct()
        .orderBy(col("custkey"))
    }),

    // U2: EXCEPT / left-anti
    "u2_except" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_custkey"))
        .except(t(s, dir, "orders").where(col("o_totalprice") > 300000)
          .select(col("o_custkey")))
        .orderBy(col("c_custkey"))),

    // F1: lower() case folding
    "f1_lower_fold" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(lower(col("o_orderpriority")).as("priority"))
        .distinct()
        .orderBy(col("priority"))),

    // F2: split + explode of token lists
    "f2_split_explode" -> ((s, dir) =>
      t(s, dir, "documents")
        .where(col("doc_id") < 20)
        .select(explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("token"))),

    // F5: dataset-name → timestamp parse
    "f5_parse_timestamp" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(date_format(col("o_orderdate"), "yyyyMMddHHmmss").as("dataset"))
        .distinct()
        .select(col("dataset"),
          unix_timestamp(to_timestamp(col("dataset"), "yyyyMMddHHmmss"))
            .as("epoch_s"))
        .orderBy(col("dataset"))
        .limit(50)),

    // F6: date arithmetic
    "f6_date_arith" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          max(datediff(lit("1998-12-01").cast("date"),
            col("o_orderdate").cast("date"))).cast("bigint").as("max_age_days"),
          min(datediff(lit("1998-12-01").cast("date"),
            col("o_orderdate").cast("date"))).cast("bigint").as("min_age_days"))
        .orderBy(col("o_orderstatus"))),

    // F8: coalesce/null-default
    "f8_coalesce_default" -> ((s, dir) =>
      t(s, dir, "customer")
        .select(col("c_mktsegment"),
          coalesce(when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")),
            lit(0.0)).as("bal"))
        .groupBy(col("c_mktsegment"))
        .agg(round(sum(col("bal")), 2).as("total_bal"))
        .orderBy(col("c_mktsegment"))),

    // F9: ceil tolerance thresholds
    "f9_ceil_threshold" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
        .select(col("o_orderstatus"), col("n"),
          ceil(col("n") * 0.95).cast("bigint").as("tol_threshold"))
        .orderBy(col("o_orderstatus"))),

    // F11: name format + parse-back
    "f11_name_format" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(concat(lit("bde_upload_"),
          (col("o_orderkey") % 97).cast("string")).as("schema_name"))
        .distinct()
        .select(col("schema_name"),
          regexp_extract(col("schema_name"), "(\\d+)$", 1).cast("bigint")
            .as("parsed_id"))
        .orderBy(col("schema_name"))),

    // ---- LLM-pipeline: dedup family -----------------------------------
    "dedup_exact" -> ((s, dir) =>
      Dedup.exact(exactDupCorpus(s, dir), "doc_id", "text")
        .select(col("kept_id"), col("n_dups"))
        .orderBy(col("kept_id"))),

    "dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.minHashLshPairs(nearDupCorpus(s, dir), "doc_id", "text")
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))),

    // the skew-guarded LSH variant: buckets holding more than 2 DISTINCT
    // texts are dropped before the self-join (the hard per-bucket bound a
    // boilerplate-flooded corpus needs); byte-identical copies still pair
    // via the arithmetic intra-cluster expansion
    "dedup_minhash_capped" -> ((s, dir) =>
      Dedup.minHashLshPairs(nearDupCorpus(s, dir), "doc_id", "text",
          maxBucket = Some(2))
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))),

    // soft dedup: every row kept, duplicates downweighted to 1/n so the
    // gradient mass per distinct text stays 1 — the loss-weighting
    // alternative to dropping (provenance survives, the drop decision
    // stays revisable)
    "dedup_soft_weights" -> ((s, dir) =>
      Dedup.softWeights(exactDupCorpus(s, dir), "doc_id", "text")
        .orderBy(col("doc_id"))),

    "dedup_simhash" -> ((s, dir) =>
      Dedup.simHashClusters(exactDupCorpus(s, dir), "doc_id", "text")
        .orderBy(col("kept_id"))),

    "dedup_simhash_hamming" -> ((s, dir) =>
      Dedup.simHashHammingPairs(nearDupCorpus(s, dir), "doc_id", "text", 3)
        .orderBy(col("id_a"), col("id_b"))),

    "dedup_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        "lang", 0.15)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))),

    // EXACT shingle-set similarity join via prefix filtering (SSJoin /
    // AllPairs) — completeness is guaranteed, unlike the LSH families. The
    // oracle generates candidates from ALL shared shingles (no prefix), an
    // independent formulation: a prefix-filter false negative fails
    // correctness here, not just a spec
    "dedup_jaccard_prefix" -> ((s, dir) =>
      Dedup.jaccardPrefixPairs(nearDupCorpus(s, dir), "doc_id", "text", 0.7)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))),

    // recall of the LSH banding against the guaranteed-complete exact
    // prefix join at the same threshold — the quality gauge for the
    // bands x rows trade (the LSH analogue of ann_recall / ann_pq_recall:
    // every approximate arm ships with its gauge)
    "lsh_jaccard_recall" -> ((s, dir) => {
      val corpus = nearDupCorpus(s, dir)
      val exact = Dedup.jaccardPrefixPairs(corpus, "doc_id", "text", 0.7)
        .select(col("id_a"), col("id_b"))
      val lsh = Dedup.minHashLshPairs(corpus, "doc_id", "text", minJaccard = 0.7)
        .select(col("id_a"), col("id_b")).withColumn("__hit", lit(1L))
      exact.join(lsh, Seq("id_a", "id_b"), "left_outer")
        .agg(count(lit(1)).as("n_exact"),
          sum(coalesce(col("__hit"), lit(0L))).as("n_found"))
        .select(col("n_exact"), col("n_found"),
          round(when(col("n_exact") === 0, lit(1.0))
            .otherwise(col("n_found").cast("double")
              / col("n_exact").cast("double")), 6).as("recall"))
    }),

    // two-stage near-dup: LSH proposes, EXACT normalized edit similarity
    // verifies — the O(L^2) Levenshtein runs only on the shortlist, text
    // ships only for ids that appear in some candidate pair. The oracle
    // restates the full LSH pipeline AND DuckDB's own levenshtein (byte-
    // based, == chars on this ASCII corpus; the per-CHARACTER contract is
    // pinned in EditConfirmSpec)
    "dedup_edit_confirm" -> ((s, dir) =>
      Dedup.editConfirmPairs(nearDupCorpus(s, dir), "doc_id", "text",
          minSim = 0.8)
        .orderBy(col("id_a"), col("id_b"))),

    // host-scoped template lines (CCNet-family nav/chrome rule, scoped to
    // the host): a line is template iff >= 3 DISTINCT docs of the SAME
    // source carry it; the famous-quote line (20 docs globally, 1 per
    // source) stays off the list — the discriminator vs dedup_boilerplate
    "boilerplate_host_lines" -> ((s, dir) =>
      Dedup.hostTemplateLines(hostTemplateCorpus(s, dir), "doc_id", "text",
          "source", minDocs = 3)
        .orderBy(col("source"), col("line"))),

    "boilerplate_host_strip" -> ((s, dir) =>
      Dedup.hostTemplateStrip(hostTemplateCorpus(s, dir), "doc_id", "text",
          "source", minDocs = 3)
        .orderBy(col("doc_id"))),

    // the SimHash SEMANTIC gauge (the lsh_jaccard_recall pattern): the
    // banding itself is pigeonhole-COMPLETE for hamming <= 3, so the
    // quality question is how well hamming proxies set similarity — of
    // the guaranteed-complete exact-Jaccard pairs at 0.7, the fraction
    // surfaced by hamming <= 3; the oracle's sim side is an EXHAUSTIVE
    // all-pairs formulation, independent of the banding
    "dedup_simhash_recall" -> ((s, dir) => {
      val corpus = nearDupCorpus(s, dir)
      val exact = Dedup.jaccardPrefixPairs(corpus, "doc_id", "text", 0.7)
        .select(col("id_a"), col("id_b"))
      val sim = Dedup.simHashHammingPairs(corpus, "doc_id", "text", 3)
        .select(col("id_a"), col("id_b")).withColumn("__hit", lit(1L))
      exact.join(sim, Seq("id_a", "id_b"), "left_outer")
        .agg(count(lit(1)).as("n_exact"),
          sum(coalesce(col("__hit"), lit(0L))).as("n_found"))
        .select(col("n_exact"), col("n_found"),
          round(when(col("n_exact") === 0, lit(1.0))
            .otherwise(col("n_found").cast("double")
              / col("n_exact").cast("double")), 6).as("recall"))
    }),

    // SFT loss masking: the 0-based char offset where the assistant span
    // begins — labels before it are masked so the objective trains the
    // RESPONSE only; Spark locates the sentinel (instr), the oracle
    // restates the offset from pure LENGTH arithmetic — two independent
    // formulations of the same boundary
    "sft_loss_mask" -> ((s, dir) => {
      val toks = TextOps.tokens(col("text"))
      Preference.chatFormat(t(s, dir, "documents"), "doc_id",
          lit("You are a helpful assistant."),
          array_join(slice(toks, 1, 8), " "),
          col("text"),
          maxTokens = 60)
        .select(col("doc_id"),
          (instr(col("sample"), "<|assistant|>\n") - 1 +
            lit("<|assistant|>\n".length)).cast("long").as("loss_start"),
          col("n_tokens"))
        .orderBy(col("doc_id"))
    }),

    // mirror-host detection: host pairs by content-digest-set Jaccard —
    // the full mirror scores 1.0, the 60% mirror exactly 0.6, unrelated
    // hosts share nothing; the boilerplate guard (digests on > 256 hosts
    // drop from pairing) is restated by the oracle
    "dedup_host_mirrors" -> ((s, dir) =>
      Dedup.hostMirrorPairs(mirrorCorpus(s, dir), "source", "text",
          minJaccard = 0.5)
        .orderBy(col("host_a"), col("host_b"))),

    // preference-pair prep (DPO/reward-model): per source, chosen = the
    // longest doc, rejected = the shortest, (score, id)-lexicographic
    // selection so ties are deterministic; pairs keep only with >= 50
    // chars of margin
    "pref_pairs" -> ((s, dir) =>
      Preference.pairs(t(s, dir, "documents"), "source", "doc_id",
          "n_chars", "doc_id", minMargin = 50)
        .orderBy(col("source"))),

    // SFT chat-template assembly: ChatML-style rendering of (system,
    // first-8-token prompt, full-text response) + whitespace token budget
    // — a pure map-side projection, no shuffle beyond the sort
    "sft_chat_format" -> ((s, dir) => {
      val toks = TextOps.tokens(col("text"))
      Preference.chatFormat(t(s, dir, "documents"), "doc_id",
          lit("You are a helpful assistant."),
          array_join(slice(toks, 1, 8), " "),
          col("text"),
          maxTokens = 60)
        .orderBy(col("doc_id"))
    }),

    // incremental SEMANTIC dedup: an exact-copy slice (cosine 1.0 with
    // its corpus originals -> drops) plus a negated slice (cosine -1 with
    // originals -> survives the corpus check, subject to the within-batch
    // rule) probes the corpus's cluster index — seeds collected from the
    // CORPUS, batch assigned map-side to the same literals
    "dedup_incremental_semantic" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val copies = e.where(col("vec_id") % 5 === 0)
        .select((col("vec_id") + 10000000).as("vec_id"), col("embedding"))
      val flipped = e.where(col("vec_id") % 7 === 0)
        .select((col("vec_id") + 20000000).as("vec_id"),
          transform(col("embedding"), x => -x).as("embedding"))
      Dedup.incrementalSemDedup(copies.unionByName(flipped), e,
          "vec_id", "embedding", minCosine = 0.8, nlist = 8)
        .select(col("vec_id"))
        .orderBy(col("vec_id"))
    }),

    // incremental NEAR-dup: a mutated-copy batch probes the corpus's band
    // index (shared bucket + verified jaccard >= 0.7 drops) plus the
    // within-batch keep-first rule — the batch arbiter of the streaming
    // LSH ingest gate, against a maintained index instead of a rescan
    "dedup_incremental_neardup" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val toks = TextOps.tokens(col("text"))
      val batch = d.select((col("doc_id") + 10000000).as("doc_id"),
        when(size(toks) > 5, array_join(slice(toks, lit(6), size(toks) - 5), " "))
          .otherwise(col("text")).as("text"))
      Dedup.incrementalNearDup(batch, d, "doc_id", "text", 0.7)
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    }),

    "dedup_keep_first" -> ((s, dir) =>
      Dedup.keepFirst(exactDupCorpus(s, dir), "doc_id", "text")
        .select(col("doc_id"))
        .orderBy(col("doc_id"))),

    // keep-first exact dedup over the NFC-CANONICALIZED digest — the
    // composition the normalization expression exists for: ids + 70000
    // re-ship each doc's text with its accent suffix DECOMPOSED
    // (e + U+0301 etc.), a byte-level variant a raw digest cannot see
    // (raw sha256 keeps all 2n rows); canonicalize-then-digest collapses
    // every variant onto its original. One map-side expression in front
    // of the same min_by digest aggregate — the dedup plan is unchanged
    "dedup_exact_normalized" -> ((s, dir) => {
      val base = t(s, dir, "documents").where(col("doc_id") < 200)
        .select(col("doc_id"),
          concat(col("text"), lit(" caf\u00E9 \u00C5ngstr\u00F6m"))
            .as("text"))
      val variants = base.select((col("doc_id") + 70000).as("doc_id"),
        concat(substring(col("text"), lit(1),
            (length(col("text")) - 14).cast("int")),
          lit(" cafe\u0301 \u212Bngstro\u0308m")).as("text"))
      Dedup.keepFirst(
          base.unionByName(variants)
            .select(col("doc_id"), TextOps.nfc(col("text")).as("text")),
          "doc_id", "text")
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    }),

    // near-dup REMOVAL (keep rule): corpus minus rows with a lower-id
    // near-duplicate at Jaccard >= 0.5 — one anti-join over the pair stream
    "dedup_minhash_keep" -> ((s, dir) =>
      Dedup.minHashKeepFromPairs(nearDupCorpus(s, dir), "doc_id",
          nearDupPairs(s, dir))
        .select(col("doc_id"))
        .orderBy(col("doc_id"))),

    // transitive-closure duplicate CLUSTERS over the same pair stream:
    // iterative min-label propagation; component = min doc_id reachable
    "dedup_components" -> ((s, dir) => {
      val corpus = nearDupCorpus(s, dir)
      Dedup.connectedComponents(corpus.select(col("doc_id")), "doc_id",
          nearDupPairs(s, dir))
        .orderBy(col("doc_id"))
    }),

    // incremental cluster maintenance: release R-1's components (chain
    // pairs (3k, 3k+1)) merge a NEW pair batch — extensions (3k+1, 3k+2)
    // on even k and CROSS-component bridges (3k+1, 3k+3) on k ≡ 0 mod 5 —
    // through the prior labels' STAR edges, never re-reading the old
    // pair log. The oracle replays the transitive closure COLD over the
    // full accumulated pair set as a recursive CTE, so the merge path
    // must land on identical canonical min-id labels
    "dedup_components_merged" -> ((s, dir) => {
      val (p1, p2, members1) = componentPairFixture(s, dir)
      val prior = Dedup.connectedComponents(members1, "doc_id", p1)
      Dedup.componentsMerge(prior, "doc_id", "component", p2)
        .orderBy(col("doc_id"))
    }),

    // the SAME merge through the PERSISTED label index: release 1's
    // labels land as a component-bucketed table, release 2's pair batch
    // folds in via mergeComponentIndex (delta-bound propagation +
    // crash-atomic swap), and the probe reads the table — the oracle is
    // the identical cold transitive closure, so a label the maintenance
    // path dropped, duplicated, or mis-merged fails the row
    "dedup_component_index_merged" -> ((s, dir) => {
      val (p1, p2, members1) = componentPairFixture(s, dir)
      val tbl = s"${indexDb(s)}.dedup_component_idx"
      operators.DedupIndex.writeComponentIndex(
        Dedup.connectedComponents(members1, "doc_id", p1), tbl, buckets = 8)
      operators.DedupIndex.mergeComponentIndex(s, tbl, p2)
      s.table(tbl).orderBy(col("doc_id"))
    }),

    // page-level robots META directives (the HTML counterpart of
    // robots.txt): four constructed shapes — quoted pair list, reversed
    // attribute order with unquoted name, explicit index/follow, no
    // tag — the oracle restates verdicts from id arithmetic only
    "html_meta_robots" -> ((s, dir) => {
      val meta = when(pmod(col("doc_id"), lit(4)) === 0,
          lit("<meta name=\"robots\" content=\"noindex, nofollow\">"))
        .when(pmod(col("doc_id"), lit(4)) === 1,
          lit("<meta content='nofollow' name=robots>"))
        .when(pmod(col("doc_id"), lit(4)) === 2,
          lit("<meta name=\"robots\" content=\"index, follow\">"))
        .otherwise(lit(""))
      HtmlOps.extractMetaRobots(
          t(s, dir, "documents").where(col("doc_id") < 100)
            .select(col("doc_id"),
              concat(lit("<html><head>"), meta,
                lit("</head><body><p>x</p></body></html>")).as("html")),
          "doc_id", "html")
        .orderBy(col("doc_id"))
    }),

    // the directive gate live: the html_meta_robots fixture through the
    // stream door — noindex pages drop at ingest, survivors carry their
    // nofollow verdict; stateless, so the drain equals the batch rule
    "stream_meta_robots_gate" -> ((s, dir) => {
      val meta = when(pmod(col("doc_id"), lit(4)) === 0,
          lit("<meta name=\"robots\" content=\"noindex, nofollow\">"))
        .when(pmod(col("doc_id"), lit(4)) === 1,
          lit("<meta content='nofollow' name=robots>"))
        .when(pmod(col("doc_id"), lit(4)) === 2,
          lit("<meta name=\"robots\" content=\"index, follow\">"))
        .otherwise(lit(""))
      Streams.metaRobotsGateStream(s,
          t(s, dir, "documents").where(col("doc_id") < 100)
            .select(col("doc_id"),
              concat(lit("<html><head>"), meta,
                lit("</head><body><p>x</p></body></html>")).as("html")),
          "html")
        .orderBy(col("doc_id"))
    }),

    // anchor-level rel=nofollow (the 2005 link-graph annotation): a
    // nofollow'd link still feeds the frontier but must not flow rank —
    // quoted, space-separated-list, and unquoted rel forms all flag;
    // oracle restates links AND verdicts from construction
    "html_links_nofollow" -> ((s, dir) => {
      val id = col("doc_id").cast("string")
      val html = concat(
        lit("<p><a href=\"/plain/"), id, lit("\">a</a>"),
        lit("<a rel=\"nofollow\" href=\"/nf/"), id, lit("\">b</a>"),
        lit("<a rel='external nofollow' href='/ext/"), id, lit("'>c</a>"),
        lit("<a href=\"/unq/"), id, lit("\" rel=nofollow>d</a></p>"))
      HtmlOps.extractLinksRel(
          t(s, dir, "documents").where(col("doc_id") < 100)
            .select(col("doc_id"), html.as("html"),
              concat(lit("https://h.test/p"), id).as("base")),
          "doc_id", "html", "base")
        .orderBy(col("doc_id"), col("link"))
    }),

    // canonical-link-aware URL dedup (RFC 6596): ids%3≠0 declare their
    // group head (id − id%3) as canonical through four markup variants —
    // absolute href, href-before-unquoted-rel with a RELATIVE href,
    // single-quoted root-relative, and a ../ dot-segment form — so
    // extraction, attribute-order/quoting tolerance, AND RFC 3986
    // resolution are all load-bearing; heads declare nothing and stand
    // on their own URL. Oracle restates groups from id arithmetic only
    "dedup_canonical" -> ((s, dir) => {
      val d = t(s, dir, "documents").where(col("doc_id") < 90)
      val tgt = (col("doc_id") - pmod(col("doc_id"), lit(3))).cast("string")
      val link = when(pmod(col("doc_id"), lit(3)) === 0, lit(""))
        .when(pmod(col("doc_id"), lit(4)) === 0,
          concat(lit("<link rel=\"canonical\" href=\"https://graft.test/doc/"),
            tgt, lit("\">")))
        .when(pmod(col("doc_id"), lit(4)) === 1,
          concat(lit("<link href=\""), tgt, lit("\" rel=canonical>")))
        .when(pmod(col("doc_id"), lit(4)) === 2,
          concat(lit("<link rel='canonical' href='/doc/"), tgt, lit("'>")))
        .otherwise(
          concat(lit("<link rel=\"canonical\" href=\"../doc/"), tgt,
            lit("\">")))
      val pages = d.select(col("doc_id"),
        concat(lit("https://graft.test/doc/"), col("doc_id")).as("url"),
        concat(lit("<html><head>"), link,
          lit("</head><body><p>content "), col("doc_id"),
          lit("</p></body></html>")).as("html"))
      val canon = HtmlOps.extractCanonical(pages, "doc_id", "html", "url")
      UrlOps.canonicalDedup(
          pages.join(canon, "doc_id")
            .select(col("doc_id"), col("url"), col("canonical")),
          "doc_id", "url", "canonical")
        .select(col("canonical_url"), col("doc_id").as("kept_id"))
        .orderBy(col("canonical_url"))
    }),

    // transitive-closure REMOVAL: one survivor (min id) per duplicate
    // component; the propagation loop runs over the duplicate subgraph only
    "dedup_components_keep" -> ((s, dir) => {
      val corpus = nearDupCorpus(s, dir)
      Dedup.componentsKeep(corpus, "doc_id", nearDupPairs(s, dir))
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    }),

    // keep-BEST variant: each duplicate component keeps its highest
    // quality-score member (ties: lowest id) — the production rule (keep
    // the cleanest copy), vs keep-min-id above. Winner = one map-side
    // combinable max_by per component, never a window over the component
    "dedup_cluster_best" -> ((s, dir) => {
      val corpus = nearDupCorpus(s, dir)
      val scored = corpus.withColumn("score",
        QualityOps.qualityScore(col("text"), TextOps.tokens(col("text"))))
      Dedup.componentsKeepBest(scored, "doc_id", "score", nearDupPairs(s, dir))
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    }),

    // ingest-time batch-vs-corpus dedup: the new batch is an exact copy of
    // documents (ids+10000000), a token-sliced mutation (ids+20000000), and a
    // second copy of that mutation (ids+30000000). Copies collide with the
    // ingested corpus and drop (as do mutations the slice left unchanged —
    // docs of <= 5 tokens); the duplicated mutation dedups WITHIN the batch
    // to its lower id. Kept = the +20000000 mutations of > 5-token docs.
    "dedup_incremental" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      Dedup.incremental(incrementalIngestBatch(s, dir), d, "doc_id", "text")
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    }),

    // the SAME ingest-dedup contract through the broadcast-Bloom pre-gate:
    // corpus digests fold once into a ~78 KB bitmap, the batch tests it
    // MAP-SIDE, and only possible hits reach the exact-confirm anti-join —
    // at 100 TB the overwhelmingly-new crawl bypasses the corpus shuffle
    // entirely. Oracle identical to dedup_incremental: Bloom has no false
    // negatives and the confirm join removes false positives, so the gate
    // is invisible in the result — which is exactly the claim worth pinning
    "dedup_incremental_bloom" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      Dedup.incrementalBloom(incrementalIngestBatch(s, dir), d,
          "doc_id", "text", expectedItems = 65536L, fpp = 0.01)
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    }),

    // the SAME ingest-dedup contract through the PERSISTED digest index:
    // the corpus's digests are written ONCE as a bucketed table and the
    // batch probes it in place (zero corpus-side Exchange, pinned by
    // PlanAuditSpec) — the at-rest form every 100 TB ingest loop runs.
    // Oracle identical to dedup_incremental: the index stores exactly the
    // digests the rescan computes, so the result cannot differ
    "dedup_index_roundtrip" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val db = indexDb(s)
      DedupIndex.writeDigestIndex(d, "doc_id", "text",
        s"$db.digest_rt", buckets = 8)
      DedupIndex.incrementalIndexed(incrementalIngestBatch(s, dir), s,
          s"$db.digest_rt", "doc_id", "text")
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    }),

    // dedup_incremental_neardup through the PERSISTED band index: corpus
    // signatures computed once at writeBandIndex time; the probe joins
    // the bucketed (id, band-bucket) table and the bucketed shingle
    // verify table in place — corpus text is never re-read. Oracle
    // identical to dedup_incremental_neardup
    "dedup_band_index_roundtrip" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val toksB = TextOps.tokens(col("text"))
      val batch = d.select((col("doc_id") + 10000000).as("doc_id"),
        when(size(toksB) > 5,
            array_join(slice(toksB, lit(6), size(toksB) - 5), " "))
          .otherwise(col("text")).as("text"))
      val db = indexDb(s)
      DedupIndex.writeBandIndex(d, "doc_id", "text",
        s"$db.band_rt", buckets = 8)
      DedupIndex.incrementalNearDupIndexed(batch, s, s"$db.band_rt",
          "doc_id", "text", 0.7)
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    }),

    // dedup_incremental_semantic through the PERSISTED cluster index:
    // seeds and per-cell member vectors written once from the corpus; the
    // batch assigns map-side against the persisted seeds and candidate
    // joins equi-join the bucketed cells table in place. Oracle identical
    // to dedup_incremental_semantic
    "dedup_cluster_index_roundtrip" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val copies = e.where(col("vec_id") % 5 === 0)
        .select((col("vec_id") + 10000000).as("vec_id"), col("embedding"))
      val flipped = e.where(col("vec_id") % 7 === 0)
        .select((col("vec_id") + 20000000).as("vec_id"),
          transform(col("embedding"), x => -x).as("embedding"))
      val db = indexDb(s)
      DedupIndex.writeClusterIndex(e, "vec_id", "embedding",
        s"$db.cluster_rt", nlist = 8, buckets = 8)
      DedupIndex.incrementalSemDedupIndexed(copies.unionByName(flipped), s,
          s"$db.cluster_rt", "vec_id", "embedding", minCosine = 0.8)
        .select(col("vec_id"))
        .orderBy(col("vec_id"))
    }),

    // THE INGEST LOOP, composed end-to-end: the corpus's digest and band
    // indexes persist once; the incoming batch flows exact-dedup (indexed
    // digest anti-probe + within-batch keep-first) → near-dedup (indexed
    // band probe + verify, within-batch rule) → trained-classifier gate
    // (margin >= 0 under the corpus-trained model) — the round-trip a
    // continuously-crawled corpus runs per ingest, every stage probing
    // at-rest state instead of rescanning prior text. The oracle restates
    // all three stages independently (keep-first window + NOT IN, banding
    // joins at jaccard >= 0.7 over the exact survivors, unrolled training
    // CTEs + margin join)
    "pipeline_ingest" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val db = indexDb(s)
      DedupIndex.writeDigestIndex(d, "doc_id", "text", s"$db.ing_digest", 8)
      DedupIndex.writeBandIndex(d, "doc_id", "text", s"$db.ing_band", 8)
      val labeled = t(s, dir, "documents").select(col("text"),
        (col("lang") === "en").cast("long").as("y"))
      val model = operators.Classifier.train(labeled, "text", "y",
        buckets = 64, iters = 2)
      val exact = DedupIndex.incrementalIndexed(
        incrementalIngestBatch(s, dir), s, s"$db.ing_digest", "doc_id", "text")
      val near = DedupIndex.incrementalNearDupIndexed(exact, s,
        s"$db.ing_band", "doc_id", "text", 0.7)
      operators.Classifier.score(near, "doc_id", "text", model)
        .where(col("keep"))
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    }),

    // SemDeDup: embedding-cluster-bounded semantic near-dup removal — the
    // higher id of any same-cluster pair with cosine >= 0.2 drops
    "dedup_semantic" -> ((s, dir) =>
      Dedup.semDedup(t(s, dir, "embeddings"), "vec_id", "embedding",
          minCosine = 0.2, nlist = 16)
        .select(col("vec_id"))
        .orderBy(col("vec_id"))),

    // SemDeDup over TRAINED cells: 4 L2 centroids from 2 Lloyd rounds
    // partition the corpus (bit-exact cross-engine via integer micro-unit
    // means), then the same cluster-bounded cosine drop — the trained-
    // partitioner seam dedup_semantic's seed centroids leave open
    "dedup_semantic_trained" -> ((s, dir) =>
      Dedup.semDedupTrained(t(s, dir, "embeddings"), "vec_id", "embedding",
          minCosine = 0.2, k = 4, iters = 2)
        .select(col("vec_id"))
        .orderBy(col("vec_id"))),

    // corpus-level repeated-window detection (the repeated-substring dedup
    // family of Lee et al. 2022, arXiv:2107.06499): every 20-token window
    // hashed map-side (native shingle expression), grouped on the 8-byte
    // window hash — the shuffle carries (hash, doc_id), never text — and
    // windows occurring in MORE THAN ONE document surface with their
    // occurrence count and first (canonical) document
    "dedup_repeated_ngrams" -> ((s, dir) => {
      val toks = TextOps.tokens(col("text"))
      val th = TextOps.tokenHashes(toks)
      nearDupCorpus(s, dir)
        .select(col("doc_id"), explode(TextOps.shingleHashes(th, 20)).as("wh"))
        .groupBy(col("wh"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          min(col("doc_id")).as("first_doc"))
        .where(col("n_docs") > 1)
        .orderBy(col("wh"))
    }),

    // the excision form of repeated-window detection: every (document,
    // token offset) whose 20-token window also occurs in ANOTHER document —
    // the spans a repeated-substring pass cuts out of the corpus.
    // Skew-safe shape ([[Dedup.repeatedSpans]]): hot hashes via a map-side
    // combinable groupBy (one row per hash per upstream task reaches the
    // reducer), semi-joined back — AQE can split a skewed join partition;
    // the former windowed min/max over the raw hash partition funneled
    // every occurrence of one boilerplate window into a single task.
    "dedup_repeated_spans" -> ((s, dir) =>
      Dedup.repeatedSpans(nearDupCorpus(s, dir), "doc_id", "text", 20)
        .select(col("doc_id"), col("pos").cast("long").as("pos"))
        .orderBy(col("doc_id"), col("pos"))),

    // the CLEANING step repeated-span detection exists for (Lee et al.
    // 2022): per document, how many token positions fall inside some
    // 20-token window that also occurs in another document — the tokens a
    // repeated-substring pass excises. Hot spans come from the skew-safe
    // [[Dedup.repeatedSpans]] (agg + semi-join, no window over the raw
    // hash), then expand to covered token indices (×20 bounded fan-out,
    // proportional to repeated content) and dedupe per document. Rows:
    // every document, with its token count, cut count, surviving fraction
    "dedup_span_excise" -> ((s, dir) => {
      val toks = TextOps.tokens(col("text"))
      val cut = Dedup.repeatedSpans(nearDupCorpus(s, dir), "doc_id", "text", 20)
        .select(col("doc_id"),
          explode(sequence(col("pos"), col("pos") + lit(19))).as("ti"))
        .distinct()
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_cut"))
      nearDupCorpus(s, dir)
        .select(col("doc_id"), size(toks).cast("long").as("n_tokens"))
        .join(cut, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("n_cut"), lit(0L)).as("n_cut"),
          round(lit(1.0) - coalesce(col("n_cut"), lit(0L)).cast("double") /
            col("n_tokens").cast("double"), 6).as("keep_frac"))
        .where(col("n_tokens") > 0)
        .orderBy(col("doc_id"))
    }),

    // paragraph-level exact dedup (C4 / RefinedWeb line dedup): each
    // paragraph survives only at its globally first (doc, position)
    // occurrence; documents reassemble from survivors in order, empty
    // documents drop. On the fixture: the +10000000 copies lose every line
    // (dropped entirely), the corpus-wide header line survives only in the
    // first document. First-occurrence = a map-side-combinable
    // groupBy(digest).min joined back — no window over the digest
    // partition (a boilerplate paragraph would funnel one task)
    "dedup_paragraphs" -> ((s, dir) =>
      Dedup.paragraphDedup(paragraphCorpus(s, dir), "doc_id", "text")
        .orderBy(col("doc_id"))),

    // boilerplate-paragraph removal: any paragraph occurring in >= 3
    // distinct documents is stripped from ALL of them (the remove-every-
    // copy policy — headers/chrome/licenses), vs keep-first above. On the
    // fixture the constant header is stripped everywhere; body lines
    // live in exactly 2 docs (original + copy) and survive
    "dedup_boilerplate" -> ((s, dir) =>
      Dedup.boilerplateStrip(paragraphCorpus(s, dir), "doc_id", "text", 3)
        .orderBy(col("doc_id"))),

    // C4 line rules over the punctuated fixture: keep lines ending in
    // terminal punctuation with >= 5 words and no blocklisted word
    // ("spark" occurs naturally in the corpus); drop docs with < 2
    // surviving lines. All rules map-side; one reassembly shuffle
    "c4_line_filter" -> ((s, dir) =>
      operators.LineRules.c4LineFilter(c4Corpus(s, dir), "doc_id", "text",
          minWords = 5, minLines = 2, blocklist = Seq("spark"))
        .orderBy(col("doc_id"))),

    // HTML → text extraction over a markup fixture SYNTHESIZED IN-QUERY
    // from the documents corpus (both engines wrap the same text in the
    // same script/style/comment/nav scaffolding, entity-encoding the body
    // — so the oracle checks the extraction semantics on real corpus
    // text, not an echo of a canned answer). Whole pipeline is one
    // map-side projection: no explode, no shuffle beyond the sort.
    "html_extract" -> ((s, dir) =>
      HtmlOps.extract(
          t(s, dir, "documents").select(col("doc_id"),
            synthHtml(col("text"), col("doc_id")).as("html")),
          "doc_id", "html")
        .orderBy(col("doc_id"))),

    // + jusText-style boilerplate pruning: the all-anchor nav block (link
    // density 1.0) drops, the prose block with one inline link (0.2) and
    // the plain blocks stay — the density rule measured in TOKENS so both
    // engines count identically whatever the text's encoding width
    "html_main_text" -> ((s, dir) =>
      HtmlOps.extractMainText(
          t(s, dir, "documents").select(col("doc_id"),
            synthHtml(col("text"), col("doc_id")).as("html")),
          "doc_id", "html", maxLinkDensity = 0.5)
        .orderBy(col("doc_id"))),

    // WARC ingest (ISO 28500 — the format crawl corpora arrive in): the
    // deterministic 4-shard fixture (2 plain, 2 in the one-gzip-member-
    // per-record Common Crawl layout) reads back through the DISTRIBUTED
    // reader — one task per shard, magic-byte gzip sniff, streaming
    // Content-Length framing — and the oracle restates every record's
    // headers, byte length, and payload digest from the documents table
    // and the same construction arithmetic (incl. re-rendering the HTML
    // payloads via SynthHtmlSql)
    // JSONL dump ingest (the Dolma/RedPajama/FineWeb distribution format):
    // schema'd PERMISSIVE read over the splittable line files — parsed
    // rows must round-trip to the EXACT source rows (JSON escaping
    // inverted bit-for-bit), truncated lines quarantine instead of
    // dropping silently or killing the job
    "source_jsonl" -> ((s, dir) => {
      import org.apache.spark.sql.types.{LongType, StringType, StructType}
      val schema = new StructType()
        .add("doc_id", LongType).add("lang", StringType)
        .add("text", StringType)
      graft.sources.Jsonl.clean(
          graft.sources.Jsonl.read(s, jsonlFixture(s, dir), schema))
        .orderBy(col("doc_id"))
    }),

    // the ingest audit row: total / parsed / quarantined from ONE parse
    // pass — restated by the oracle from the corruption arithmetic alone
    "source_jsonl_quarantine" -> ((s, dir) => {
      import org.apache.spark.sql.types.{LongType, StringType, StructType}
      val schema = new StructType()
        .add("doc_id", LongType).add("lang", StringType)
        .add("text", StringType)
      graft.sources.Jsonl.quarantineStats(
        graft.sources.Jsonl.read(s, jsonlFixture(s, dir), schema), "doc_id")
    }),

    // CSV dump ingest, same quarantine contract as JSONL: parsed rows
    // round-trip exactly (quote framing inverted), type-violating rows
    // quarantine instead of vanishing
    "source_csv" -> ((s, dir) => {
      import org.apache.spark.sql.types.{LongType, StringType, StructType}
      val schema = new StructType()
        .add("doc_id", LongType).add("lang", StringType)
        .add("text", StringType)
      graft.sources.Csv.clean(
          graft.sources.Csv.read(s, csvFixture(s, dir), schema))
        .orderBy(col("doc_id"))
    }),

    "source_csv_quarantine" -> ((s, dir) => {
      import org.apache.spark.sql.types.{LongType, StringType, StructType}
      val schema = new StructType()
        .add("doc_id", LongType).add("lang", StringType)
        .add("text", StringType)
      graft.sources.Csv.quarantineStats(
        graft.sources.Csv.read(s, csvFixture(s, dir), schema), "doc_id")
    }),

    "warc_read" -> ((s, dir) =>
      graft.sources.Warc.readRecords(s, warcFixture(s, dir))
        .where(col("parse_ok"))
        .select(col("target_uri"), col("rec_type"), col("content_type"),
          col("content_length"), sha2(col("payload"), 256).as("payload_sha"))
        .orderBy(col("target_uri"), col("rec_type"))),

    // the crawl front door end-to-end: WARC shards → response records →
    // HTTP header strip (the WARC payload of a response IS the raw HTTP
    // message) → main-text extraction with link-density pruning — the
    // full path from archive bytes to curated text as ONE declarative
    // plan over the distributed reader
    "warc_extract" -> ((s, dir) =>
      HtmlOps.extractMainText(
          graft.sources.Warc.httpResponses(
              graft.sources.Warc.readRecords(s, warcFixture(s, dir))
                .where(col("parse_ok") && col("rec_type") === "response")
                .select(col("target_uri"), col("payload")),
              "target_uri", "payload")
            .select(col("target_uri"), col("body_text").as("html")),
          "target_uri", "html", maxLinkDensity = 0.5)
        .orderBy(col("target_uri"))),

    // the decode arm real captures need (VERDICT r12 missing #2): the
    // encoded fixture wraps each response body per doc_id % 4 — plain /
    // gzip Content-Encoding / chunked Transfer-Encoding / chunked OVER
    // gzip — and the reader de-frames then inflates before extraction.
    // The oracle restates the DECODED text from the same markup
    // construction (it never sees wire bytes), so a mis-framed chunk or
    // a skipped gunzip surfaces as garbage text and fails the row
    "warc_http_decode" -> ((s, dir) =>
      HtmlOps.extractMainText(
          graft.sources.Warc.httpResponses(
              graft.sources.Warc.readRecords(s, warcEncodedFixture(s, dir))
                .where(col("parse_ok") && col("rec_type") === "response")
                .select(col("target_uri"), col("payload")),
              "target_uri", "payload")
            .where(col("decode_ok") && col("http_status") === 200)
            .select(col("target_uri"), col("body_text").as("html")),
          "target_uri", "html", maxLinkDensity = 0.5)
        .orderBy(col("target_uri"))),

    // the crawl's capture INDEX at rest (the public CDX convention):
    // SURT-keyed bucketed table over the archive metadata, exercised
    // through the full index lifecycle — build from shards 0-1, FAISS-
    // add-style append of shards 2-3 (one parse per shard lifetime),
    // compaction fold, then URL lookups that bucket-prune to the probed
    // keys and never touch archive bytes; oracle restates every probed
    // capture's fields from the documents construction
    "warc_cdx_indexed" -> ((s, dir) => {
      val fix = warcFixture(s, dir)
      val tbl = s"${indexDb(s)}.warc_cdx_idx"
      // explicit file lists, not a brace glob: FileStreamSink.hasMetadata
      // logs a caught FileNotFoundException stack for glob paths on every
      // read, poisoning gate logs (r12 What's-wrong #2)
      graft.sources.Warc.writeCdxIndex(s,
        Seq(s"$fix/shard0.warc", s"$fix/shard1.warc"), tbl, buckets = 8)
      graft.sources.Warc.appendCdxIndex(s,
        Seq(s"$fix/shard2.warc", s"$fix/shard3.warc"), tbl)
      operators.Bucketing.compactBucketed(s, tbl)
      graft.sources.Warc.lookupCdx(s, tbl,
          (0 until 12).map(i => s"https://graft.test/doc/$i"))
        .select(col("surt"), col("target_uri"), col("rec_type"),
          col("content_length"), col("digest"))
        .orderBy(col("target_uri"))
    }),

    // the index's reason to exist at 100 TB: captures re-fetched by URL
    // as RANGED reads of their stored spans (one gzip member for the gz
    // shards, the raw record span for the plain ones) — probe resolves
    // (file, offset, length) in the bucket-pruned index, fetch is one
    // positioned read per capture, no shard scan; the oracle restates
    // every fetched record's fields/digest from the documents
    // construction, so a span that addressed the wrong member or sliced
    // a record re-parses wrong and fails the row (WarcSpec additionally
    // proves bytes outside the spans are never read)
    "warc_fetch_ranged" -> ((s, dir) => {
      val fix = warcFixture(s, dir)
      val tbl = s"${indexDb(s)}.warc_cdx_fetch"
      graft.sources.Warc.writeCdxIndex(s, fix, tbl, buckets = 8)
      graft.sources.Warc.fetchCaptures(s, tbl,
          (0 until 16).map(i => s"https://graft.test/doc/$i"))
        .select(col("target_uri"), col("rec_type"), col("content_type"),
          col("content_length"), sha2(col("payload"), 256).as("payload_sha"))
        .orderBy(col("target_uri"))
    }),

    // the TEMPORAL CDX query (wayback semantics — real CDX keys are
    // (SURT, timestamp) for this): three dated crawls of every URL,
    // probe "closest to 2026-02-10" — Feb 1 (9 days) must beat Jan 1
    // (40) and Mar 1 (19); the oracle restates the Feb capture's
    // fields from construction, so a wrong arbitration or a dropped
    // date fails every row
    "warc_cdx_temporal" -> ((s, dir) => {
      val fix = warcTemporalFixture(s, dir)
      val tbl = s"${indexDb(s)}.warc_cdx_temporal"
      graft.sources.Warc.writeCdxIndex(s,
        (0 until 3).map(k => s"$fix/shard$k.warc"), tbl, buckets = 8)
      graft.sources.Warc.lookupCdxNearest(s, tbl,
          (0 until 20).map(i => s"https://graft.test/doc/$i"),
          "2026-02-10T00:00:00Z")
        .select(col("surt"), col("target_uri"), col("warc_date"),
          col("content_length"), col("digest"))
        .orderBy(col("target_uri"))
    }),

    // the OTHER canonical CDX access pattern: every capture of a host —
    // the same rows as warc_cdx_indexed but partitioned by the SURT
    // host key, so the domain probe prunes to one directory (per-site
    // accounting / takedown sweeps / re-crawl seeding); build from
    // shards 0-1, blind-append 2-3, compact, probe the host — the
    // oracle restates all 40 captures from construction
    "warc_cdx_host_indexed" -> ((s, dir) => {
      val fix = warcFixture(s, dir)
      val out = java.nio.file.Files
        .createTempDirectory("graft_cdx_host").toString + "/idx"
      graft.sources.Warc.writeCdxHostIndex(s,
        Seq(s"$fix/shard0.warc", s"$fix/shard1.warc"), out)
      graft.sources.Warc.appendCdxHostIndex(s,
        Seq(s"$fix/shard2.warc", s"$fix/shard3.warc"), out)
      operators.Bucketing.compactPartitioned(s, out, "surt_host")
      graft.sources.Warc.lookupCdxByHost(s, out, Seq("graft.test"))
        .select(col("surt_host"), col("target_uri"), col("rec_type"),
          col("content_length"), col("digest"))
        .orderBy(col("target_uri"), col("rec_type"))
    }),

    // the content-addressing pin: identical payloads STORE ONCE — the
    // sidecar holds exactly one blob per distinct payload byte string
    // however many slots reference it; kept slots and their distinct
    // payloads restated from the 6-per-page packing + payload-presence
    // arithmetic
    "mm_payload_dedup" -> ((s, dir) => {
      val (pages, images) = mmFixture(s, dir)
      val inter = Multimodal.interleave(pages, "doc_id", "html",
        images, "doc_id", "src", "payload")
      val out = java.nio.file.Files
        .createTempDirectory("graft_mmdedup").toString
      val (_, slots, payIdx) = Multimodal.writeInterleavedShards(
        inter, "doc_id", pmod(col("doc_id"), lit(4)).cast("string"),
        images, "doc_id", "src", "payload", out,
        seqLen = 16, numShards = 2)
      slots.agg(
          count(col("digest")).as("n_payload_slots"),
          countDistinct(col("digest")).as("n_kept_distinct"))
        .crossJoin(payIdx.agg(count(lit(1)).as("n_blobs")))
    }),

    // the public CDX collapse=digest view over the persisted index:
    // per URL, only CHANGE POINTS survive (a capture whose digest
    // equals its predecessor's drops) — crawls 0-1 captured identical
    // payloads, so January and March remain and February drops; the
    // oracle restates both kept captures per doc from construction
    "warc_cdx_collapse" -> ((s, dir) => {
      val fix = warcCollapseFixture(s, dir)
      val tbl = s"${indexDb(s)}.warc_cdx_collapse"
      graft.sources.Warc.writeCdxIndex(s,
        (0 until 3).map(k => s"$fix/shard$k.warc"), tbl, buckets = 8)
      graft.sources.Warc.collapseCaptures(s.table(tbl))
        .select(col("surt"), col("target_uri"), col("warc_date"),
          col("content_length"), col("digest"))
        .orderBy(col("target_uri"), col("warc_date"))
    }),

    // the CDX server's from/to/limit query shape, composed with
    // collapse=digest exactly as public servers compose them: the
    // "window" arm slices the three-crawl temporal fixture to its
    // February captures and caps at 12 rows of the (surt, timestamp)
    // key order; the "collapse" arm windows over the change-point fold
    // (Jan + Mar per URL — the unchanged Feb crawl drops first) and
    // caps at 15. Both restate from construction; the limit is a
    // bounded TakeOrdered, never a global sort
    "warc_cdx_window" -> ((s, dir) => {
      val fixT = warcTemporalFixture(s, dir)
      val tblT = s"${indexDb(s)}.warc_cdx_win_t"
      graft.sources.Warc.writeCdxIndex(s,
        (0 until 3).map(k => s"$fixT/shard$k.warc"), tblT, buckets = 8)
      val fixC = warcCollapseFixture(s, dir)
      val tblC = s"${indexDb(s)}.warc_cdx_win_c"
      graft.sources.Warc.writeCdxIndex(s,
        (0 until 3).map(k => s"$fixC/shard$k.warc"), tblC, buckets = 8)
      val urls = (0 until 20).map(i => s"https://graft.test/doc/$i")
      val cols = Seq(col("surt"), col("target_uri"), col("warc_date"),
        col("content_length"), col("digest"))
      graft.sources.Warc.lookupCdxWindow(s, tblT, urls,
          "2026-01-15T00:00:00Z", "2026-02-15T00:00:00Z", limit = 12)
        .select(lit("window").as("arm") +: cols: _*)
        .unionByName(
          graft.sources.Warc.lookupCdxWindow(s, tblC, urls,
              "2026-01-01T00:00:00Z", "2026-03-31T00:00:00Z", limit = 15,
              collapseDigest = true)
            .select(lit("collapse").as("arm") +: cols: _*))
        .orderBy(col("arm"), col("surt"), col("warc_date"))
    }),

    // the WAT sidecar — the third public artifact beside WARC/WET:
    // per-capture robots META verdicts, canonical declaration, and the
    // outlink set with anchors + rel-nofollow, extracted once from
    // payloads into parquet and read back; the oracle restates every
    // page's signals and both edges from the fixture arithmetic (the
    // sidecar must equal what extracting from archive bytes yields)
    "warc_wat_roundtrip" -> ((s, dir) => {
      val fix = warcWatFixture(s, dir)
      val out = java.nio.file.Files
        .createTempDirectory("graft_wat").toString + "/wat"
      graft.sources.Warc.writeWatSidecar(s, Seq(s"$fix/shard0.warc"), out)
      s.read.parquet(out)
        .select(col("target_uri"), col("noindex"), col("nofollow"),
          col("canonical"),
          posexplode_outer(col("links")).as(Seq("link_seq", "__l")))
        .select(col("target_uri"), col("noindex"), col("nofollow"),
          col("canonical"), col("link_seq").cast("int").as("link_seq"),
          col("__l.link").as("link"), col("__l.anchor").as("anchor"),
          col("__l.nofollow").as("link_nofollow"))
        .orderBy(col("target_uri"), col("link_seq"))
    }),

    // the CDX matchType=domain / matchType=prefix queries: the domain
    // arm must answer graft.test AND its subdomain ladder while
    // REFUSING graftother.test (the label-boundary trap — reversed-
    // label SURTs make a naive string prefix match it); the prefix arm
    // answers everything under graft.test/doc by honest string-prefix
    // semantics (so /docs matches too, as public CDX servers answer
    // it). Oracle restates both answer sets from the host/path
    // arithmetic
    "warc_cdx_prefix" -> ((s, dir) => {
      val fix = warcPrefixFixture(s, dir)
      val tbl = s"${indexDb(s)}.warc_cdx_prefix"
      graft.sources.Warc.writeCdxIndex(s,
        Seq(s"$fix/shard0.warc"), tbl, buckets = 8)
      val cols = Seq(col("surt"), col("target_uri"),
        col("content_length"), col("digest"))
      graft.sources.Warc.lookupCdxDomain(s, tbl, Seq("graft.test"))
        .select(lit("domain").as("arm") +: cols: _*)
        .unionByName(
          graft.sources.Warc
            .lookupCdxPrefix(s, tbl, Seq("https://graft.test/doc"))
            .select(lit("prefix").as("arm") +: cols: _*))
        .orderBy(col("arm"), col("target_uri"))
    }),

    // curated text back INTO the archive convention (the public WET
    // sidecar): extract main text from the response captures, write it
    // as distributed conversion-record shards (one gzip member per
    // record, one shard per task), then re-read through the same
    // reader. The oracle restates the text from the markup construction
    // and never sees shard bytes — a mangled gzip member, lost
    // Content-Length framing, or mis-typed record fails the row
    "warc_wet_roundtrip" -> ((s, dir) => {
      val fix = warcFixture(s, dir)
      val texts = HtmlOps.extractMainText(
        graft.sources.Warc.httpResponses(
            graft.sources.Warc.readRecords(s, fix)
              .where(col("parse_ok") && col("rec_type") === "response")
              .select(col("target_uri"), col("payload")),
            "target_uri", "payload")
          .select(col("target_uri"), col("body_text").as("html")),
        "target_uri", "html", maxLinkDensity = 0.5)
      val out = java.nio.file.Files.createTempDirectory("graft_wet").toString
      val shards = graft.sources.Warc.writeWetShards(texts,
        "target_uri", "text", out, "2026-01-01T00:00:00Z", numShards = 2)
      graft.sources.Warc.readRecords(s, shards)
        .where(col("parse_ok") && col("rec_type") === "conversion")
        .select(col("target_uri"), col("content_type"),
          col("content_length"), col("payload").cast("string").as("text"))
        .orderBy(col("target_uri"))
    }),

    // the crawler's EMIT path: fetched responses write as gzip-member
    // response shards WITH their CDX rows computed at write time (the
    // archive is never re-read to index it). Three doors must agree:
    // the sequential re-parse, the CDX rescan of the written files, and
    // the ranged span fetch through the writer's own index — the oracle
    // restates body text and lengths from construction and expects
    // every agreement verdict true; a wrong offset, digest, length, or
    // framing byte flips a column
    "warc_write_roundtrip" -> ((s, dir) => {
      val d = t(s, dir, "documents").where(col("doc_id") < 60)
      val http = concat(
        lit("HTTP/1.1 200 OK\r\ncontent-type: text/plain\r\n\r\nbody "),
        col("doc_id").cast("string"))
      val pages = d.select(
        concat(lit("https://h"), (col("doc_id") % 5).cast("string"),
          lit(".test/p"), col("doc_id").cast("string")).as("uri"),
        lit("2026-08-01T00:00:00Z").as("wdate"),
        http.cast("binary").as("payload"))
      val out = java.nio.file.Files
        .createTempDirectory("graft_warc_write").toString
      val idx = graft.sources.Warc.writeWarcShards(pages,
        "uri", "wdate", "payload", out, numShards = 3)
      val files = idx.select(col("warc_file")).distinct()
        .collect().map(_.getString(0)).toSeq.sorted // bounded: numShards
      // door 2: the CDX rescan of the written shards must equal the
      // writer's index row for row, field for field
      val rescan = graft.sources.Warc.cdxRows(s, files)
        .where(col("rec_type") === "response")
        .select(col("target_uri"), col("warc_date").as("r_date"),
          col("warc_file").as("r_file"), col("rec_offset").as("r_off"),
          col("content_length").as("r_len"), col("digest").as("r_digest"),
          col("stored_offset").as("r_soff"),
          col("stored_length").as("r_slen"))
      // door 3: ranged reads through the writer's spans re-parse the
      // full records
      val spans = graft.sources.Warc.fetchSpans(s,
        idx.select(col("warc_file"), col("stored_offset"),
          col("stored_length"), col("target_uri")))
        .select(col("target_uri"),
          col("payload").cast("string").as("body"),
          col("content_length").as("s_len"))
      idx.join(rescan, "target_uri").join(spans, "target_uri")
        .select(col("target_uri"), col("content_length"), col("body"),
          (col("warc_date") === col("r_date") &&
            col("warc_file") === col("r_file") &&
            col("rec_offset") === col("r_off") &&
            col("content_length") === col("r_len") &&
            col("digest") === col("r_digest") &&
            col("stored_offset") === col("r_soff") &&
            col("stored_length") === col("r_slen")).as("index_match"),
          (col("content_length") === col("s_len")).as("span_match"))
        .orderBy(col("target_uri"))
    }),

    // digest-based payload dedup across crawl releases (the WARC
    // revisit convention): the prior index holds shards 0-1's captures;
    // the "new crawl" re-captures all 40 URLs — URLs whose payload
    // digest is already indexed fold to `revisit` rows (payload
    // elided, refers-to addressing the earliest prior capture), unseen
    // ones keep full rows. Oracle restates type/elision/refers-to
    // shard from the doc_id arithmetic and digests from construction
    "warc_revisit_dedup" -> ((s, dir) => {
      val fix = warcFixture(s, dir)
      val prior = graft.sources.Warc.cdxRows(s,
        Seq(s"$fix/shard0.warc", s"$fix/shard1.warc"))
      val fresh = graft.sources.Warc.cdxRows(s,
        (0 until 4).map(i => s"$fix/shard$i.warc"))
      graft.sources.Warc.revisitCaptures(fresh, prior)
        .select(col("surt"), col("target_uri"), col("rec_type"),
          col("digest"), col("content_length"),
          (col("stored_length") === 0).as("payload_elided"),
          regexp_extract(col("refers_to_file"), "shard\\d\\.warc", 0)
            .as("refers_to_shard"),
          col("refers_to_offset").isNotNull.as("has_refers_offset"))
        .orderBy(col("target_uri"))
    }),

    // the refers-to provenance is LOAD-BEARING: each folded revisit
    // row's (refers_to_file, offset, length) span fetches the ORIGINAL
    // capture's bytes through the same ranged reader — the oracle
    // restates the original records (type/content-type/length/digest)
    // from construction, so a span addressing the wrong original
    // re-parses wrong and fails the row
    "warc_revisit_fetch" -> ((s, dir) => {
      val fix = warcFixture(s, dir)
      val prior = graft.sources.Warc.cdxRows(s,
        Seq(s"$fix/shard0.warc", s"$fix/shard1.warc"))
      val fresh = graft.sources.Warc.cdxRows(s,
        (0 until 4).map(i => s"$fix/shard$i.warc"))
      val spans = graft.sources.Warc.revisitCaptures(fresh, prior)
        .where(col("rec_type") === "revisit")
        .select(col("refers_to_file").as("warc_file"),
          col("refers_to_offset").as("stored_offset"),
          col("refers_to_length").as("stored_length"), col("target_uri"))
      graft.sources.Warc.fetchSpans(s, spans)
        .select(col("target_uri"), col("rec_type"), col("content_type"),
          col("content_length"), sha2(col("payload"), 256).as("payload_sha"))
        .orderBy(col("target_uri"))
    }),

    // conditional-revisit fetch plan (RFC 9110 §13.1): two fetch-state
    // releases over the doc URLs — release 1 covers ids < 50 (ETag iff
    // id%3=0, Last-Modified iff id%3<2), release 2 refreshes the even
    // ids with a v2 ETag and no Last-Modified — and the plan must emit
    // each URL's LATEST validators (ids 50-59 carry no state and go
    // unconditional). Oracle restates latest-wins with its own
    // max(fetch_time) join-back formulation
    "crawl_conditional_fetch" -> ((s, dir) => {
      val (frontier, state) = condFetchFixture(s, dir)
      operators.Frontier.conditionalFetchPlan(
          frontier.select(col("url")), state)
        .orderBy(col("url"))
    }),

    // the publisher's own change signal composed in: sitemap lastmod
    // NEWER than the latest fetch skips validators entirely (a
    // guaranteed 200), older/absent lastmod falls back to the
    // conditional plan, never-fetched URLs are plain new fetches —
    // lastmod is COMPARED, never parsed (ids%5=0 carry a newer-than-
    // any-fetch lastmod, %5 in {1,2} an ancient one, {3,4} none)
    "crawl_sitemap_refetch" -> ((s, dir) => {
      val (frontier, state) = condFetchFixture(s, dir)
      val entries = frontier.select(col("url"),
        when(col("doc_id") % 5 === 0, col("doc_id") + 5000)
          .when(col("doc_id") % 5 <= 2, lit(10L)).as("lastmod"))
      operators.Frontier.sitemapRefetchPlan(entries, state)
        .orderBy(col("url"))
    }),

    // the SAME conditional plan with the state side the PERSISTED
    // url-bucketed fetch-state index (the durable crawl-cycle state):
    // release 1 written, release 2 APPENDED — the per-cycle lifecycle —
    // then the latest-wins fold aggregates the bucketed scan in place
    // (zero index-side Exchange, plan-pinned). Must equal the
    // ephemeral-frame plan row for row — the shared oracle binds both
    "crawl_conditional_fetch_indexed" -> ((s, dir) => {
      val (frontier, state) = condFetchFixture(s, dir)
      val tbl = s"${indexDb(s)}.fetch_state_idx"
      val withDigest = state.withColumn("digest",
        concat(lit("sha-"), col("fetch_time").cast("string")))
      operators.FetchState.writeStateIndex(
        withDigest.where(col("fetch_time") < 1000), tbl, buckets = 8)
      operators.FetchState.appendState(
        withDigest.where(col("fetch_time") >= 1000), tbl)
      operators.FetchState.conditionalFetchPlanIndexed(
          frontier.select(col("url")), s, tbl)
        .orderBy(col("url"))
    }),

    // lastmod arbitration over the persisted index — the publisher's
    // change signal against the DURABLE fetch history instead of an
    // ephemeral state frame; same two-release write+append lifecycle
    "crawl_sitemap_refetch_indexed" -> ((s, dir) => {
      val (frontier, state) = condFetchFixture(s, dir)
      val tbl = s"${indexDb(s)}.fetch_state_sm_idx"
      val withDigest = state.withColumn("digest",
        concat(lit("sha-"), col("fetch_time").cast("string")))
      operators.FetchState.writeStateIndex(
        withDigest.where(col("fetch_time") < 1000), tbl, buckets = 8)
      operators.FetchState.appendState(
        withDigest.where(col("fetch_time") >= 1000), tbl)
      val entries = frontier.select(col("url"),
        when(col("doc_id") % 5 === 0, col("doc_id") + 5000)
          .when(col("doc_id") % 5 <= 2, lit(10L)).as("lastmod"))
      operators.FetchState.sitemapRefetchPlanIndexed(entries, s, tbl)
        .orderBy(col("url"))
    }),

    // the Cho–Garcia-Molina revisit estimator over the persisted index:
    // the fetch log IS the capture history (fetch_time the instant,
    // digest the change witness) — frontier_revisit's fixture written
    // as fetch-state rows, read back through the durable artifact; the
    // shared oracle pins both doors to identical estimates
    "crawl_revisit_priority_indexed" -> ((s, dir) => {
      val tbl = s"${indexDb(s)}.fetch_state_rv_idx"
      val caps = t(s, dir, "events")
        .select(concat(lit("https://e.test/u"),
            (col("event_id") % 97).cast("string")).as("url"),
          lit(null).cast("string").as("etag"),
          lit(null).cast("string").as("last_modified"),
          col("ts").as("fetch_time"),
          col("event_type").as("digest"))
      operators.FetchState.writeStateIndex(caps, tbl, buckets = 8)
      operators.FetchState.revisitPriorityIndexed(s, tbl,
          "2024-02-15 00:00:00")
        .select(col("url"), col("n_intervals"), col("n_changes"),
          round(col("mean_interval_s"), 6).as("mean_interval_s"),
          round(col("change_rate") * 86400d, 6).as("change_rate_day"),
          round(col("p_changed"), 6).as("p_changed"))
        .orderBy(col("url"))
    }),

    // the durable state FEEDING the scheduler — the freshness-driven
    // crawl composition (Cho–Garcia-Molina priorities from the
    // persisted fetch log, then the bounded politeness slotting): the
    // host's top-4 change probabilities take the cycle's four slots
    // (horizon 40 s / delay 10 s), cold-start URLs (null priority)
    // schedule last and never reach a slot here. Priorities round to 6
    // decimals BEFORE slotting (the ln/exp arms are the one libm path —
    // rounding makes the sort key cross-engine exact); the oracle
    // recomputes estimator + window independently
    "crawl_revisit_schedule" -> ((s, dir) => {
      import s.implicits._
      val tbl = s"${indexDb(s)}.fetch_state_rvs_idx"
      val caps = t(s, dir, "events")
        .select(concat(lit("https://e.test/u"),
            (col("event_id") % 97).cast("string")).as("url"),
          lit(null).cast("string").as("etag"),
          lit(null).cast("string").as("last_modified"),
          col("ts").as("fetch_time"),
          col("event_type").as("digest"))
      operators.FetchState.writeStateIndex(caps, tbl, buckets = 8)
      val pri = operators.FetchState.revisitPriorityIndexed(s, tbl,
          "2024-02-15 00:00:00")
        .select(col("url"), round(col("p_changed"), 6).as("priority"))
        .withColumn("id",
          regexp_extract(col("url"), "u(\\d+)$", 1).cast("long"))
      val delays = Seq.empty[(String, Double)].toDF("host", "delay_s")
      operators.Frontier.schedule(pri, delays, "id", "url", "priority",
          defaultDelayS = 10.0, horizonS = 40.0)
        .select(col("url"), col("priority"), col("slot"), col("sched_s"))
        .orderBy(col("slot"))
    }),

    // the CLOSED multi-cycle crawl loop over the durable stores — the
    // stream_ingest_loop posture for the frontier: each cycle schedules
    // from the PERSISTED frontier (per-host bounded top-3 under the
    // 30 s horizon / 10 s default delay), appends its fetches into the
    // fetch-state index, folds its discoveries ((id%7)+100, priority =
    // max over discoverers, never-fetched URLs only), and REPLACES the
    // frontier store with the merged tail via the crash-atomic swap —
    // so cycle N+1's input is exactly cycle N's committed artifact.
    // Output = every cycle's schedule + the final deferred tail; the
    // oracle unrolls all three cycles independently
    "crawl_cycle_loop" -> ((s, dir) => {
      import s.implicits._
      val db = indexDb(s)
      val fTbl = s"$db.crawl_frontier_store"
      val stTbl = s"$db.crawl_cycle_state"
      val seeds = t(s, dir, "documents").where(col("doc_id") < 30)
        .select(col("doc_id").as("id"),
          concat(lit("https://h"), (col("doc_id") % 3).cast("string"),
            lit(".test/u"), col("doc_id").cast("string")).as("url"),
          ((col("doc_id") * 7) % 13).cast("double").as("priority"))
      operators.FetchState.writeFrontierStore(seeds, fTbl, buckets = 4)
      operators.FetchState.writeStateIndex(
        seeds.where(lit(false)).select(col("url"),
          lit(null).cast("string").as("etag"),
          lit(null).cast("string").as("last_modified"),
          lit(0L).as("fetch_time"),
          lit(null).cast("string").as("digest")),
        stTbl, buckets = 4)
      val delays = Seq.empty[(String, Double)].toDF("host", "delay_s")
      val cycles = (1 to 3).map { c =>
        val due = operators.FetchState.frontier(s, fTbl)
        // materialized: the commit below swaps the very table this
        // schedule reads, and the cycle's output rows outlive the swap
        val sched = operators.Frontier.schedule(due, delays,
          "id", "url", "priority", defaultDelayS = 10.0, horizonS = 30.0)
          .localCheckpoint(true)
        val fetched = sched.select(col("url"),
          concat(lit(s"""W/"c$c-"""), col("id").cast("string"), lit("\""))
            .as("etag"),
          lit(null).cast("string").as("last_modified"),
          lit(c.toLong).as("fetch_time"),
          concat(lit("d"), (col("id") % 4).cast("string")).as("digest"))
        val discovered = sched
          .select(((col("id") % 7) + 100).as("did"),
            ((col("id") * 3) % 17).cast("double").as("p"))
          .groupBy(col("did")).agg(max(col("p")).as("priority"))
          .select(col("did").as("id"),
            concat(lit("https://h"), (col("did") % 3).cast("string"),
              lit(".test/u"), col("did").cast("string")).as("url"),
            col("priority"))
        operators.FetchState.commitCycle(s, fTbl, stTbl,
          sched, fetched, discovered)
        sched.select(lit(c).as("cycle"), lit("sched").as("kind"),
          col("id"), col("url"), col("priority"), col("slot"),
          col("sched_s"))
      }
      val tail = operators.FetchState.frontier(s, fTbl)
        .select(lit(3).as("cycle"), lit("tail").as("kind"), col("id"),
          col("url"), col("priority"), lit(null).cast("long").as("slot"),
          lit(null).cast("double").as("sched_s"))
      cycles.reduce(_ unionByName _).unionByName(tail)
        .orderBy(col("cycle"), col("kind"), col("url"))
    }),

    // robots.txt URL admission (RFC 9309): even hosts carry a graftbot
    // group (so the '*' group's Disallow:/ must be IGNORED — §2.2.1
    // group selection), odd hosts only '*' (fallback); paths exercise
    // longest-prefix-wins (/data/raw vs /data) and allow-over-disallow
    // (/private/ok under /private). Rules parse from real robots.txt
    // text; the oracle restates the RULE SET directly as VALUES and the
    // match as SQL argmax — parse and gate cannot echo each other
    "robots_gate" -> ((s, dir) => {
      import s.implicits._
      val even = "User-agent: graftbot\nDisallow: /private\n" +
        "Allow: /private/ok\n\nUser-agent: *\nDisallow: /"
      val odd = "User-agent: *\nDisallow: /private\n" +
        "Disallow: /data/raw\nAllow: /data"
      val robots = (0 until 5)
        .map(k => (s"h$k.test", if (k % 2 == 0) even else odd))
        .toDF("host", "txt")
      val rules = Robots.parseRules(robots, "host", "txt")
      val id = col("doc_id").cast("string")
      val m = col("doc_id") % 6
      val path = when(m === 0, concat(lit("/public/page"), id))
        .when(m === 1, concat(lit("/private/page"), id))
        .when(m === 2, concat(lit("/private/ok/page"), id))
        .when(m === 3, concat(lit("/data/raw/x"), id))
        .when(m === 4, concat(lit("/data/clean"), id))
        .otherwise(lit(""))
      val urls = t(s, dir, "documents").where(col("doc_id") < 100)
        .select(col("doc_id"),
          concat(lit("https://h"), (col("doc_id") % 5).cast("string"),
            lit(".test"), path).as("url"))
      Robots.gate(urls, rules, "graftbot", "doc_id", "url")
        .orderBy(col("doc_id"))
    }),

    // §2.2.1 product-token group selection: the versioned UA
    // "GraftBot-News/2.1 (+url)" must select `GraftBot-News` groups by
    // case-insensitive token match, with `graftbot` a '-'-boundary
    // prefix match that LOSES to the longer token where both exist,
    // WINS where it is the only match (even via a versioned group line
    // "Graftbot/2.0"), and `graft` never matching; hosts with no
    // matching group fall back to '*'. The oracle restates the
    // SELECTED rule set per host class as VALUES — the token matcher
    // cannot echo into the check
    "robots_gate_tokens" -> ((s, dir) => {
      import s.implicits._
      val newsHost = "User-agent: GraftBot-News\nDisallow: /news-private\n\n" +
        "User-agent: graftbot\nDisallow: /private\n\n" +
        "User-agent: *\nDisallow: /"
      val botHost = "User-agent: Graftbot/2.0\nDisallow: /private\n" +
        "Allow: /private/ok\n\nUser-agent: graft\nDisallow: /\n\n" +
        "User-agent: *\nDisallow: /"
      val starHost = "User-agent: otherbot\nAllow: /x\n\n" +
        "User-agent: *\nDisallow: /data"
      val robots = (0 until 6).map(k => (s"h$k.test", (k % 3) match {
        case 0 => newsHost; case 1 => botHost; case _ => starHost
      })).toDF("host", "txt")
      val rules = Robots.parseRules(robots, "host", "txt")
      val id = col("doc_id").cast("string")
      val m = col("doc_id") % 4
      val path = when(m === 0, concat(lit("/news-private/x"), id))
        .when(m === 1, concat(lit("/private/ok/y"), id))
        .when(m === 2, concat(lit("/private/z"), id))
        .otherwise(concat(lit("/data/w"), id))
      val urls = t(s, dir, "documents").where(col("doc_id") < 120)
        .select(col("doc_id"),
          concat(lit("https://h"), (col("doc_id") % 6).cast("string"),
            lit(".test"), path).as("url"))
      Robots.gate(urls, rules,
          "GraftBot-News/2.1 (+https://graft.test/bot)", "doc_id", "url")
        .orderBy(col("doc_id"))
    }),

    // the RFC 9309 special characters: '*' spans, trailing '$' anchors.
    // Rules exercise wildcard-vs-prefix ties at equal pattern length
    // (/docs/* vs /*.pdf$, both 7 octets — allow wins), an end anchor
    // that must NOT match a longer path, and a mid-pattern '*'; the
    // oracle hand-writes the translated regexes as VALUES, so the
    // engine's regexp construction cannot echo into the check
    "robots_gate_wildcard" -> ((s, dir) => {
      import s.implicits._
      val txt = "User-agent: *\nDisallow: /*.pdf$\nAllow: /docs/*\n" +
        "Disallow: /docs\nDisallow: /tmp/*/cache"
      val rules = Robots.parseRules(
        Seq(("w.test", txt)).toDF("host", "txt"), "host", "txt")
      val id = col("doc_id").cast("string")
      val m = col("doc_id") % 6
      val path = when(m === 0, concat(lit("/docs/file"), id, lit(".html")))
        .when(m === 1, concat(lit("/files/report"), id, lit(".pdf")))
        .when(m === 2, concat(lit("/docs/x"), id, lit(".pdf")))
        .when(m === 3, concat(lit("/tmp/a"), id, lit("/cache")))
        .when(m === 4, concat(lit("/files/report"), id, lit(".pdfx")))
        .otherwise(concat(lit("/other"), id))
      val urls = t(s, dir, "documents").where(col("doc_id") < 120)
        .select(col("doc_id"),
          concat(lit("https://w.test"), path).as("url"))
      Robots.gate(urls, rules, "anybot", "doc_id", "url")
        .orderBy(col("doc_id"))
    }),

    // the robots gate as a STREAMING door: same wildcard fixture, but
    // each URL's verdict computes map-side via the per-row array fold
    // (a genuinely different match implementation than the batch join-
    // argmax — the oracle arbitrates both), stateless by construction
    "stream_robots_gate" -> ((s, dir) => {
      import s.implicits._
      val txt = "User-agent: *\nDisallow: /*.pdf$\nAllow: /docs/*\n" +
        "Disallow: /docs\nDisallow: /tmp/*/cache"
      val rules = Robots.parseRules(
        Seq(("w.test", txt)).toDF("host", "txt"), "host", "txt")
      val id = col("doc_id").cast("string")
      val m = col("doc_id") % 6
      val path = when(m === 0, concat(lit("/docs/file"), id, lit(".html")))
        .when(m === 1, concat(lit("/files/report"), id, lit(".pdf")))
        .when(m === 2, concat(lit("/docs/x"), id, lit(".pdf")))
        .when(m === 3, concat(lit("/tmp/a"), id, lit("/cache")))
        .when(m === 4, concat(lit("/files/report"), id, lit(".pdfx")))
        .otherwise(concat(lit("/other"), id))
      val urls = t(s, dir, "documents").where(col("doc_id") < 120)
        .select(col("doc_id"),
          concat(lit("https://w.test"), path).as("url"))
      Streams.robotsGateStream(s, urls, rules, "anybot")
        .orderBy(col("doc_id"))
    }),

    // the URL-discovery loop end-to-end: robots.txt names the sitemap
    // index (Sitemap: directive), the index names two child urlsets,
    // the urlsets name the page URLs (with lastmod/priority metadata,
    // loc whitespace, and &amp; entities to unescape), and the robots
    // gate admits them — XML renders Spark-side from the documents
    // table, so the oracle restates every admitted row from the same
    // construction arithmetic without touching XML
    "sitemap_discovery" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").where(col("doc_id") < 80)
      val id = col("doc_id").cast("string")
      val qs = when(col("doc_id") % 7 === 0, lit("?a=1&amp;b=2"))
        .otherwise(lit(""))
      val path = when(col("doc_id") % 5 === 0, concat(lit("/private/p"), id))
        .otherwise(concat(lit("/docs/p"), id))
      val entry = concat(lit("  <url>\n    <loc> https://s.test"), path, qs,
        lit(" </loc>\n"),
        when(col("doc_id") % 3 === 0,
          concat(lit("    <lastmod>2026-0"),
            (col("doc_id") % 9 + 1).cast("string"), lit("-15</lastmod>\n")))
          .otherwise(lit("")),
        when(col("doc_id") % 4 === 0,
          concat(lit("    <priority>0."),
            (col("doc_id") % 10).cast("string"), lit("</priority>\n")))
          .otherwise(lit("")),
        lit("  </url>\n"))
      val children = docs
        .select((col("doc_id") % 2).as("k"),
          struct(col("doc_id"), entry.as("e")).as("se"))
        .groupBy(col("k"))
        .agg(concat(lit("<urlset>\n"),
          array_join(transform(sort_array(collect_list(col("se"))),
            x => x.getField("e")), ""),
          lit("</urlset>")).as("xml"))
        .select(concat(lit("https://s.test/sm"), col("k").cast("string"),
          lit(".xml")).as("sm_url"), col("xml"))
      val indexDoc = Seq(("https://s.test/sitemap_index.xml",
        "<sitemapindex>\n" +
          "  <sitemap><loc>https://s.test/sm0.xml</loc></sitemap>\n" +
          "  <sitemap><loc>https://s.test/sm1.xml</loc></sitemap>\n" +
          "</sitemapindex>")).toDF("u", "xml")
      val robotsTxt = Seq(("s.test",
        "User-agent: *\nDisallow: /private\n" +
          "Sitemap: https://s.test/sitemap_index.xml")).toDF("host", "txt")
      val rules = Robots.parseRules(robotsTxt, "host", "txt")
      val declared = Robots.sitemapDirectives(robotsTxt, "host", "txt")
      val idxEntries = graft.sources.Sitemaps.parse(
        declared.join(indexDoc, col("sitemap") === col("u")), "u", "xml")
        .where(col("kind") === "index")
      val frontier = graft.sources.Sitemaps.parse(
        idxEntries.select(col("loc").as("child"))
          .join(children, col("child") === col("sm_url")),
        "sm_url", "xml")
        .where(col("kind") === "urlset")
      val gated = Robots.gate(
        frontier.select(col("loc").as("u"), col("loc").as("url")),
        rules, "graftbot", "u", "url")
      frontier.select(col("loc"), col("lastmod"), col("priority"))
        .join(gated.select(col("u"), col("allowed")),
          col("loc") === col("u"))
        .select(col("loc"), col("lastmod"), col("priority"), col("allowed"))
        .orderBy(col("loc"))
    }),

    // per-host politeness scheduling: Crawl-delay parses with RFC group
    // semantics (host par 1 is the §2.2.1 exclusion trap — graftbot has
    // its own delay-less group, so the '*' group's delay 9 must NOT
    // apply and the default does), then each host's frontier ranks by
    // (priority desc, url) into slots spaced delay_s apart, cut at the
    // cycle horizon. The oracle restates the resolved delays as hand-
    // written VALUES and the slotting as a SQL window — parse,
    // precedence, and schedule arithmetic cannot echo
    "frontier_schedule" -> ((s, dir) => {
      import s.implicits._
      val own = "User-agent: graftbot\nCrawl-delay: 1\nDisallow: /x"
      val trap = "User-agent: graftbot\nDisallow: /x\n\n" +
        "User-agent: *\nCrawl-delay: 9"
      val star = "User-agent: *\nCrawl-delay: 2.5"
      val robots = (0 until 20).filter(_ % 4 != 3)
        .map(k => (s"src$k.test",
          k % 4 match { case 0 => own; case 1 => trap; case _ => star }))
        .toDF("host", "txt")
      val delays = Frontier.hostDelays(
        Robots.crawlDelays(robots, "host", "txt"), "graftbot")
      val urls = t(s, dir, "documents")
        .select(col("doc_id"),
          concat(lit("https://"), col("source"), lit(".test/doc/"),
            col("doc_id").cast("string")).as("url"),
          (col("n_chars") % 11).cast("double").as("priority"))
      Frontier.schedule(urls, delays, "doc_id", "url", "priority",
          defaultDelayS = 0.5, horizonS = 10.0)
        .orderBy(col("url"))
    }),

    // freshness-driven revisit priority (Cho & Garcia-Molina 2003):
    // capture history from events (97 URLs × ~10-100 captures, digest =
    // event_type so change runs vary), the bias-corrected Poisson rate
    // from (intervals, changes, mean gap), and p(changed since last
    // capture) against an injected clock. The oracle recomputes the
    // estimator from its own lag window; single-capture URLs must
    // return NULL rate/priority, not an invented one
    "frontier_revisit" -> ((s, dir) => {
      val caps = t(s, dir, "events")
        .select(concat(lit("https://e.test/u"),
            (col("event_id") % 97).cast("string")).as("url"),
          col("ts"), col("event_type").as("digest"))
      Frontier.revisitPriority(caps, "url", "ts", "digest",
          "2024-02-15 00:00:00")
        .select(col("url"), col("n_intervals"), col("n_changes"),
          round(col("mean_interval_s"), 6).as("mean_interval_s"),
          round(col("change_rate") * 86400d, 6).as("change_rate_day"),
          round(col("p_changed"), 6).as("p_changed"))
        .orderBy(col("url"))
    }),

    // PageRank over a 500-node doc graph (two modular out-links per
    // non-dangling doc; docs ≡0 mod 7 are DANGLING — their mass must
    // redistribute uniformly, not vanish), 3 damped rounds in integer
    // micro-units. The oracle replays the ENTIRE fixpoint as unrolled
    // CTEs — every iteration's floor divisions must agree bit-for-bit
    "graph_pagerank" -> ((s, dir) => {
      val edges = docGraphEdges(s, dir)
      Graph.pagerank(edges, "src", "dst", iters = 3)
        .orderBy(col("node"))
    }),

    // reciprocal-link (nepotistic/link-farm) profile: the doc graph plus
    // a deliberately-reciprocated slice (edges from src%5=0 reversed back)
    // — trading nodes surface with high recip_frac, organic nodes stay
    // asymmetric; dedup'd edges join their own reversal, one aggregate
    "graph_reciprocal" -> ((s, dir) => {
      val base = docGraphEdges(s, dir)
      val edges = base.unionByName(base.where(col("src") % 5 === 0)
        .select(col("dst").as("src"), col("src").as("dst")))
      Graph.reciprocalLinks(edges, "src", "dst")
        .where(col("n_reciprocal") > 0)
        .orderBy(col("node"))
    }),

    // HITS hubs and authorities (Kleinberg 1999) over the same doc
    // graph — the directory-vs-content separation PageRank can't make;
    // integer micro-unit half-steps with L1 normalization, the oracle
    // replays every half-step as unrolled CTEs
    "graph_hits" -> ((s, dir) => {
      val edges = docGraphEdges(s, dir)
      Graph.hits(edges, "src", "dst", iters = 3)
        .orderBy(col("node"))
    }),

    // the directives are LOAD-BEARING in the rank flow: pages render
    // two links (×3 plain; ×7 rel=nofollow on odd ids) and ids%10=0
    // carry a page-level META nofollow voiding both — extraction, both
    // directive gates, and URL parsing feed the integer fixpoint, and
    // the oracle replays it over the surviving edge set restated from
    // id arithmetic alone (a missed or over-applied directive shifts
    // the whole rank vector)
    "graph_pagerank_nofollow" -> ((s, dir) => {
      val id = col("doc_id").cast("string")
      val a = ((col("doc_id") * 3 + 1) % 500).cast("string")
      val b = ((col("doc_id") * 7 + 5) % 500).cast("string")
      val meta = when(col("doc_id") % 10 === 0,
        lit("<meta name=\"robots\" content=\"nofollow\">")).otherwise(lit(""))
      val relB = when(col("doc_id") % 2 === 1, lit(" rel=\"nofollow\""))
        .otherwise(lit(""))
      val pages = t(s, dir, "documents").select(col("doc_id"),
        concat(lit("<html><head>"), meta,
          lit("</head><body><p><a href=\"/doc/"), a,
          lit("\">a</a> <a"), relB, lit(" href=\"/doc/"), b,
          lit("\">b</a></p></body></html>")).as("html"),
        concat(lit("https://g.test/p"), id).as("base"))
      val rel = HtmlOps.extractLinksRel(pages, "doc_id", "html", "base")
      val pageNf = HtmlOps.extractMetaRobots(pages, "doc_id", "html")
        .select(col("doc_id"), col("nofollow").as("page_nf"))
      val edges = rel.join(pageNf, "doc_id")
        .where(!col("nofollow") && !col("page_nf"))
        .select(col("doc_id").as("src"),
          regexp_extract(col("link"), "/doc/(\\d+)$", 1).cast("long")
            .as("dst"))
      Graph.pagerank(edges, "src", "dst", iters = 3)
        .orderBy(col("node"))
    }),

    // per-node triangle counts (link-farm near-cliques light up): the
    // doc graph plus an injected K5 clique whose nodes must each count
    // C(4,2)=6 triangles. Engine = degree-oriented compact-forward;
    // oracle = the OTHER standard formulation (ordered triple
    // self-join) — the implementations share nothing
    "graph_triangles" -> ((s, dir) => {
      val edges = docGraphEdges(s, dir)
      val five = t(s, dir, "documents")
        .where(col("doc_id") < 5)
        .select((col("doc_id") + 9000).as("n"))
      val clique = five.crossJoin(five.select(col("n").as("m")))
        .where(col("n") < col("m"))
        .select(col("n").as("src"), col("m").as("dst"))
      Graph.triangles(edges.union(clique), "src", "dst")
        .orderBy(col("node"))
    }),

    // redirect-chain resolution: 3-hop chains must land on their
    // terminal with exact hop counts, 2-loops must walk the full
    // 8-hop budget back to themselves and flag resolved=false. Engine
    // = pointer DOUBLING (3 self-joins); oracle = 8 SINGLE-step CTEs —
    // the same semantics by the other construction
    "url_redirects" -> ((s, dir) => {
      val id = col("doc_id")
      def p(x: org.apache.spark.sql.Column) =
        concat(lit("https://r.test/p"), x.cast("string"))
      val chain = t(s, dir, "documents")
        .where(id % 10 <= 2)
        .select(p(id).as("src"), p(id + 1).as("dst"))
      val loopF = t(s, dir, "documents").where(id % 10 === 5)
        .select(p(id).as("src"), p(id + 1).as("dst"))
      val loopB = t(s, dir, "documents").where(id % 10 === 6)
        .select(p(id).as("src"), p(id - 1).as("dst"))
      graft.operators.Redirects.resolve(
          chain.union(loopF).union(loopB), "src", "dst", maxHops = 8)
        .orderBy(col("url"))
    }),

    // Hamilton apportionment of a 997-slot fetch budget across the 20
    // sources by character mass — Σ alloc must equal the budget EXACTLY
    // (largest remainders take the leftover); the oracle recomputes the
    // floor/remainder arithmetic and the remainder ranking itself
    "frontier_budget" -> ((s, dir) => {
      val scores = t(s, dir, "documents")
        .groupBy(col("source"))
        .agg(sum(col("n_chars")).as("mass"))
      Frontier.apportionBudget(scores, "source", "mass", budget = 997L)
        .orderBy(col("source"))
    }),

    // co-citation neighbors (pages the same sources link to) and
    // bibliographic coupling (pages citing the same targets) over the
    // shared doc graph; the mega-hub cap is exercised by an injected
    // 12-out-link hub that must NOT contribute pairs. The oracle
    // restates both as independent SQL self-joins
    "graph_cocitation" -> ((s, dir) => {
      val edges = docGraphEdges(s, dir)
      val hub = t(s, dir, "documents").select(col("doc_id"))
        .where(col("doc_id") < 12)
        .select(lit(9000L).as("src"), col("doc_id").as("dst"))
      Graph.coCitation(edges.union(hub), "src", "dst",
          maxOutDegree = 8)
        .orderBy(col("node_a"), col("node_b"))
    }),

    "graph_coupling" -> ((s, dir) => {
      val edges = docGraphEdges(s, dir)
      Graph.bibliographicCoupling(edges, "src", "dst",
          maxInDegree = 8)
        .orderBy(col("node_a"), col("node_b"))
    }),

    // the HOST-graph rank: the doc graph collapses to 50 hosts with
    // link-count edge WEIGHTS (parallel page links must combine, and a
    // host's rank flows in proportion to its link counts, not once per
    // distinct neighbor); 3 weighted rounds, unrolled-CTE oracle
    "graph_host_pagerank" -> ((s, dir) => {
      val edges = docGraphEdges(s, dir)
      val hosts = edges
        .groupBy((col("src") % 50).as("hsrc"), (col("dst") % 50).as("hdst"))
        .agg(count(lit(1)).as("w"))
      Graph.weightedPagerank(hosts, "hsrc", "hdst", "w", iters = 3)
        .orderBy(col("node"))
    }),

    // the truncation gauge: rank movement between rounds 2 and 3 in
    // units (L1 + max) — the house every-approximation-ships-a-gauge
    // rule applied to the fixpoint cut; the oracle replays BOTH rounds
    "graph_pagerank_gauge" -> ((s, dir) => {
      val edges = docGraphEdges(s, dir)
      Graph.pagerankGauge(edges, "src", "dst", iters = 3)
    }),

    // release-over-release rank maintenance: release R-1's graph is the
    // ×3-link arm only, release R adds the ×7 links; the prior release's
    // 3-round ranks warm-start TWO rounds on the new graph (new nodes
    // start cold, per-round arithmetic identical). The oracle replays
    // the prior fixpoint AND the warm rounds as prefixed CTE chains —
    // the engine's warm path shares nothing with the replay
    "graph_pagerank_warm" -> ((s, dir) => {
      val prior = Graph.pagerank(docGraphPriorEdges(s, dir), "src", "dst",
        iters = 3)
      Graph.pagerankWarm(docGraphEdges(s, dir), "src", "dst",
          prior, "node", "rank_units", iters = 2)
        .orderBy(col("node"))
    }),

    // the warm start's reason to exist, measured: round-2 L1 movement
    // of the warm restart vs the cold fixpoint on the SAME new graph —
    // the warm start begins near the fixpoint, so its movement must be
    // the smaller. The oracle replays all FOUR rank vectors (warm/cold
    // × rounds 1,2) as prefixed CTE chains and refolds the L1s
    "graph_pagerank_warm_gauge" -> ((s, dir) => {
      val g2 = docGraphEdges(s, dir)
      val prior = Graph.pagerank(docGraphPriorEdges(s, dir), "src", "dst",
        iters = 3)
      val w1 = Graph.pagerankWarm(g2, "src", "dst", prior, "node",
        "rank_units", iters = 1).withColumnRenamed("rank_units", "w1")
      val w2 = Graph.pagerankWarm(g2, "src", "dst", prior, "node",
        "rank_units", iters = 2).withColumnRenamed("rank_units", "w2")
      val c1 = Graph.pagerank(g2, "src", "dst", iters = 1)
        .withColumnRenamed("rank_units", "c1")
      val c2 = Graph.pagerank(g2, "src", "dst", iters = 2)
        .withColumnRenamed("rank_units", "c2")
      val warm = w2.join(w1, "node")
        .agg(sum(abs(col("w2") - col("w1"))).as("l1_warm_units"),
          count(lit(1)).as("n_nodes"))
      val cold = c2.join(c1, "node")
        .agg(sum(abs(col("c2") - col("c1"))).as("l1_cold_units"))
      warm.crossJoin(cold)
        .select(col("n_nodes"), col("l1_warm_units"), col("l1_cold_units"),
          (col("l1_warm_units") <= col("l1_cold_units")).as("warm_tighter"))
    }),

    // TrustRank: the same graph, teleport restricted to 10 trusted
    // seeds (docs ≡0 mod 50) — rank must flow OUT of the seed
    // neighborhood and nodes far from any seed starve. Same unrolled-
    // CTE oracle discipline as graph_pagerank
    "graph_trustrank" -> ((s, dir) => {
      val edges = docGraphEdges(s, dir)
      val seeds = t(s, dir, "documents").select(col("doc_id"))
        .where(col("doc_id") % 50 === 0)
      Graph.personalizedPagerank(edges, "src", "dst",
          seeds, "doc_id", iters = 3)
        .orderBy(col("node"))
    }),

    // crawl depth from the trusted frontier: 4 min-plus rounds from the
    // same seeds; nodes unreached within the horizon must read NULL
    // (unknown), not a sentinel. Integer min/plus — exact; the oracle
    // unrolls the same relaxation
    "graph_seed_distance" -> ((s, dir) => {
      val edges = docGraphEdges(s, dir)
      val seeds = t(s, dir, "documents").select(col("doc_id"))
        .where(col("doc_id") % 50 === 0)
      Graph.seedDistance(edges, "src", "dst",
          seeds, "doc_id", maxHops = 4)
        .orderBy(col("node"))
    }),

    // the link graph as an AT-REST artifact (the dedup/IVF/postings
    // index lifecycle): release 1 writes the d1 edges bucketed on src,
    // release 2 APPENDS the d2 edges (with a deliberate re-observation
    // overlap that must collapse at read), compaction folds the files,
    // then out-degrees and the 3-round PageRank both run THROUGH the
    // table. The oracle replays the union arithmetic — the index
    // lifecycle must be invisible in the values
    "graph_edge_indexed" -> ((s, dir) => {
      // the two releases are the doc graph's two link families — e1
      // writes, e2 appends (the split is why this site cannot use the
      // combined docGraphEdges helper)
      val docs = t(s, dir, "documents").select(col("doc_id"))
        .where(col("doc_id") % 7 =!= 0)
      val e1 = docs.select(col("doc_id").as("src"),
        ((col("doc_id") * 3 + 1) % 500).as("dst"))
      val e2 = docs.where(col("doc_id") % 3 === 0)
        .select(col("doc_id").as("src"),
          ((col("doc_id") * 7 + 5) % 500).as("dst"))
      val tbl = s"${indexDb(s)}.link_graph"
      Graph.writeEdgeIndex(e1, "src", "dst", tbl, buckets = 8)
      // the append re-ships a slice of release 1 (docs ≡0 mod 20 carry
      // their d1 edge again) — re-observed edges must not double-count
      Graph.appendEdgeIndex(
        e2.unionByName(e1.where(col("src") % 20 === 0)),
        "src", "dst", tbl)
      Bucketing.compactBucketed(s, tbl)
      Graph.pagerankIndexed(s, tbl, iters = 3)
        .join(Graph.outDegrees(s, tbl), Seq("node"), "left")
        .orderBy(col("node"))
    }),

    // the whole crawl-admission-and-ordering pipeline composed, every
    // stage load-bearing: pages render with two legit doc links (absent
    // for dangling docs ≡0 mod 7), one robots-DISALLOWED link and one
    // spider-TRAP link — both pointing at VALID doc URLs, so a gate or
    // trap-filter failure adds real edges and changes the PageRank the
    // oracle replays; survivors form the graph, ranks become frontier
    // priority, the per-host scheduler slots them. The oracle restates
    // only the legit edge arithmetic + fixpoint CTEs + schedule window
    "pipeline_crawl" -> ((s, dir) => {
      import s.implicits._
      def docUrl(d: org.apache.spark.sql.Column) = concat(lit("https://h"),
        (d % 5).cast("string"), lit(".test/dir/p"), d.cast("string"),
        lit(".html"))
      val id = col("doc_id")
      val d1 = (id * 3 + 1) % 500
      val d2 = (id * 7 + 5) % 500
      val d3 = (id * 11 + 2) % 500
      val d4 = (id * 13 + 7) % 500
      val priv = concat(lit("https://h"), (d3 % 5).cast("string"),
        lit(".test/private/p"), d3.cast("string"), lit(".html"))
      val deep = concat(lit("https://h"), (d4 % 5).cast("string"),
        lit(".test/dir/dir/dir/dir/dir/p"), d4.cast("string"),
        lit(".html"))
      val legit = concat(lit("<p><a href=\""), docUrl(d1),
        lit("\">a</a> <a href=\""),
        when(id % 3 === 0, docUrl(d2)).otherwise(docUrl(d1)),
        lit("\">b</a></p>"))
      val html = concat(
        when(id % 7 =!= 0, legit).otherwise(lit("<p>no links</p>")),
        lit("<p><a href=\""), priv, lit("\">p</a> <a href=\""), deep,
        lit("\">t</a></p>"))
      val pages = t(s, dir, "documents")
        .select(id, html.as("html"), docUrl(id).as("base"))
      val links = HtmlOps.extractLinks(pages, "doc_id", "html", "base")
        .select(concat(col("doc_id").cast("string"), lit("#"),
          col("link")).as("lid"), col("doc_id"), col("link"))
      val robots = (0 until 5)
        .map(k => (s"h$k.test", "User-agent: *\nDisallow: /private"))
        .toDF("host", "txt")
      val admitted = Robots.gate(
          links.select(col("lid"), col("link")),
          Robots.parseRules(robots, "host", "txt"), "graftbot",
          "lid", "link")
        .where(col("allowed"))
      val safe = UrlOps.trapFilter(admitted, "lid", "link",
          maxDepth = 4, maxDupSegments = 2, maxParams = 6, maxLen = 512)
        .where(!col("is_trap"))
      val edges = safe
        .select(split(col("lid"), "#").getItem(0).cast("long").as("src"),
          regexp_extract(col("link"), "/p(\\d+)\\.html$", 1).cast("long")
            .as("dst"))
      val pr = Graph.pagerank(edges, "src", "dst", iters = 3)
      val urls = pr.select(col("node"), docUrl(col("node")).as("url"),
        col("rank_units").cast("double").as("priority"))
      val delays = Seq(("h0.test", 2.0), ("h3.test", 1.5))
        .toDF("host", "delay_s")
      Frontier.schedule(urls, delays, "node", "url", "priority",
          defaultDelayS = 0.5, horizonS = 6.0)
        .orderBy(col("url"))
    }),

    // the crawl-ordering loop composed (Cho, Garcia-Molina & Page 1998:
    // rank-ordered fetches under politeness): PageRank scores become
    // the frontier priority, the per-host scheduler slots them under
    // each host's delay and the cycle horizon. The oracle replays the
    // fixpoint CTEs AND the schedule window independently
    "frontier_ranked" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select(col("doc_id"), col("source"))
      val pr = Graph.pagerank(docGraphEdges(s, dir), "src", "dst",
        iters = 3)
      val urls = docs.join(pr, docs("doc_id") === pr("node"))
        .select(col("doc_id"),
          concat(lit("https://"), col("source"), lit(".test/doc/"),
            col("doc_id").cast("string")).as("url"),
          col("rank_units").cast("double").as("priority"))
      val delays = Seq(("src1.test", 2.0), ("src3.test", 2.5))
        .toDF("host", "delay_s")
      Frontier.schedule(urls, delays, "doc_id", "url", "priority",
          defaultDelayS = 1.0, horizonS = 5.0)
        .orderBy(col("url"))
    }),

    // hyperlink extraction + resolution: every href form a link graph
    // meets — absolute, protocol-relative (base scheme), root-relative
    // (base origin), directory-relative, dot-segment up (../), same-dir
    // (./), double-up clamped at the root (RFC 3986 §5.2.4),
    // query-relative (§5.3), entity-escaped query, fragment-only
    // (drops), mailto (drops), commented-out (drops), both quote
    // styles. HTML renders Spark-side, so the oracle
    // restates every resolved link from the construction arithmetic
    // without touching markup
    "html_links" -> ((s, dir) => {
      val id = col("doc_id").cast("string")
      val html = concat(
        lit("<html><body><p>x <a href=\"https://abs.test/a"), id,
        lit("\">abs</a> <a href='//cdn.test/c"), id,
        lit("'>pr</a> <a class=\"z\" href=\"/root/r"), id,
        lit("\">root</a> <a href=\"rel/p"), id,
        lit("\">rel</a> <a href=\"../up"), id,
        lit("\">up</a> <a href=\"./same"), id,
        lit("\">dot</a> <a href=\"../../deep"), id,
        lit("\">clamp</a> <a href=\"?page="), id,
        lit("\">qrel</a> <a href=\"#frag\">f</a>"),
        lit(" <a href=\"mailto:x@y.test\">m</a>"),
        lit("<!-- <a href=\"https://no.test/\">c</a> -->"),
        lit(" <a href=\"https://q.test/d?a=1&amp;b="), id,
        lit("\">e</a></p></body></html>"))
      val base = concat(lit("https://h"),
        (col("doc_id") % 5).cast("string"), lit(".test/dir/page"), id,
        lit(".html"))
      HtmlOps.extractLinks(
          t(s, dir, "documents").where(col("doc_id") < 100)
            .select(col("doc_id"), html.as("html"), base.as("base")),
          "doc_id", "html", "base")
        .orderBy(col("doc_id"), col("link"))
    }),

    // anchor-text evidence aggregated per TARGET (the linking pages'
    // words describe the linked page — classic web-IR): anchors render
    // Spark-side with root-relative and protocol-relative hrefs whose
    // targets collide across source docs, then fold to (link, n_refs,
    // distinct anchor texts). The oracle restates both link forms and
    // the texts from arithmetic and refolds independently
    "anchor_text_agg" -> ((s, dir) => {
      val id = col("doc_id").cast("string")
      val d1 = (col("doc_id") * 3 + 1) % 500
      val d2 = (col("doc_id") * 7 + 5) % 500
      val html = concat(
        lit("<p>see <a href=\"/doc/"), d1.cast("string"),
        lit("\">guide <b>topic</b> "), (d1 % 13).cast("string"),
        lit("</a> and <a href='//h"), (d2 % 5).cast("string"),
        lit(".test/doc/"), d2.cast("string"),
        lit("'>ref topic "), (d2 % 13).cast("string"),
        lit("</a></p>"))
      val base = concat(lit("https://h"),
        (col("doc_id") % 5).cast("string"), lit(".test/dir/p"), id,
        lit(".html"))
      HtmlOps.extractAnchors(
          t(s, dir, "documents")
            .select(col("doc_id"), html.as("html"), base.as("base")),
          "doc_id", "html", "base")
        .groupBy(col("link"))
        .agg(count(lit(1)).as("n_refs"),
          array_join(array_sort(collect_set(col("anchor"))), "|")
            .as("anchors"))
        .orderBy(col("link"))
    }),

    // spider-trap heuristics: URLs with varying path depth, repeated
    // segments (the self-embedding trap), parameter echo, and length,
    // all derived from doc_id arithmetic. The engine measures the
    // STRINGS (split/distinct/regex); the oracle restates every signal
    // from the construction ARITHMETIC — the two cannot echo
    "url_trap_filter" -> ((s, dir) => {
      val url = expr("'https://t.test' || " +
        "repeat('/dir', CAST(doc_id % 6 AS INT)) || '/p' || " +
        "CAST(doc_id AS STRING) || " +
        "CASE WHEN doc_id % 9 = 0 THEN '' ELSE '?q=1' || " +
        "repeat('&x=1', CAST(doc_id % 9 AS INT) - 1) END")
      UrlOps.trapFilter(
          t(s, dir, "documents").select(col("doc_id"), url.as("url")),
          "doc_id", "url",
          maxDepth = 4, maxDupSegments = 1, maxParams = 6, maxLen = 60)
        .orderBy(col("doc_id"))
    }),

    // Unicode NFC canonicalization (the pre-hash step of CCNet-style
    // dedup: the same page crawled precomposed and as combining
    // sequences must digest identically). Fixture appends DECOMPOSED
    // material (e + U+0301, Å as U+212B, o + U+0308) to real corpus
    // text in-query, identically in both engines; byte lengths pin that
    // composition genuinely happened (3 code points disappear per row)
    // NFKC compatibility normalization (the SentencePiece default): one
    // representative per compatibility class rides every doc — ligature,
    // fullwidth letters, vulgar fraction, superscript, squared unit,
    // letterlike, roman numeral, decomposed accent, NBSP. The expected
    // text is a LITERAL generated by CPython unicodedata (an independent
    // UAX #15 implementation, tools/nfkc_reference.py) since DuckDB has
    // no NFKC; byte counts restate from construction
    "text_nfkc" -> ((s, dir) => {
      val raw = concat(col("text"), lit(NfkcRawSuffix))
      t(s, dir, "documents").where(col("doc_id") < 60)
        .select(col("doc_id"), TextOps.nfkc(raw).as("nfkc_text"),
          octet_length(raw).cast("long").as("bytes_raw"),
          octet_length(TextOps.nfkc(raw)).cast("long").as("bytes_nfkc"))
        .orderBy(col("doc_id"))
    }),

    "text_normalize" -> ((s, dir) => {
      val raw = concat(col("text"),
        lit(" cafe\u0301 \u212Bngstro\u0308m"))
      t(s, dir, "documents").where(col("doc_id") < 60)
        .select(col("doc_id"), TextOps.nfc(raw).as("nfc_text"),
          octet_length(raw).cast("long").as("bytes_raw"),
          octet_length(TextOps.nfc(raw)).cast("long").as("bytes_nfc"))
        .orderBy(col("doc_id"))
    }),

    // accent-folded match keys (strip_accents(lower(x)) semantics):
    // `same_key` additionally pins Spark-side that the COMPOSED and
    // DECOMPOSED spellings of the suffix fold to one key (the oracle
    // states TRUE — strip_accents engines differ on bare combining
    // marks, so the cross-engine row checks the composed arm and the
    // composed-vs-decomposed equivalence is the Spark-side invariant)
    "text_accent_fold" -> ((s, dir) => {
      val composed = concat(col("text"),
        lit(" CAF\u00C9 \u00DCn\u00EFcod\u00E9 \u00D1O\u00D1O"))
      val decomposed = concat(col("text"),
        lit(" CAFE\u0301 U\u0308nI\u0308codE\u0301 N\u0303ON\u0303O"))
      t(s, dir, "documents").where(col("doc_id") < 60)
        .select(col("doc_id"),
          TextOps.accentFold(composed).as("folded"),
          (TextOps.accentFold(composed) === TextOps.accentFold(decomposed))
            .as("same_key"))
        .orderBy(col("doc_id"))
    }),

    // INTENT pin for the extraction semantics: six hand-written markup
    // fixtures (script/style/comment removal, block vs inline tags,
    // entity order, whitespace, density drop/keep, nested-anchor
    // counting) against literal VALUES from tools/html_reference.py — an
    // independent Python statement of the rules, so a bug shared by the
    // Scala and SQL renderings still fails CORRECTNESS
    "html_pinned" -> ((s, dir) => {
      import s.implicits._
      Seq(
        (1L, "<p>keep</p><script>if (a<b) { x(); }</script>" +
          "<style>p>em{}</style><!-- <p>gone</p> --><p>also</p>"),
        (2L, "<div>one <b>bold</b> word</div><p>two</p>three<br>four"),
        (3L, "<p>a &lt;b&gt; &quot;c&quot; &#39;d&#39; &amp;lt; &copy;</p>"),
        (4L, "<p>  a   b\t c </p><p>   </p><p>d</p>"),
        (5L, "<p>real prose with <a href='/'>one link</a> in seven words</p>" +
          "<div><a href='/'>Home</a> <a href='/a'>About</a>" +
          " <a href='/b'>More</a></div><p>plain text</p>"),
        (6L, "<div><a href='/'><em>big</em> deal</a></div><p>tail text here</p>"))
        .toDF("case_id", "html")
        .select(col("case_id"),
          HtmlOps.htmlToText(col("html")).as("text"),
          HtmlOps.mainText(col("html"), 0.5).as("main_text"))
        .orderBy(col("case_id"))
    }),

    // per-document TF-IDF top terms: term frequencies aggregate per (doc,
    // token) — map-side combined, O(distinct doc-term) shuffle rows —
    // document frequencies per token (vocabulary-sized), idf joins back
    // broadcast-ably, and a per-doc window keeps the top 3 by
    // (tfidf DESC, token ASC) — a total order, so rank is deterministic
    "text_tfidf_top" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val nDocs = docs.count().toDouble
      val tf = docs
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("tf"))
      val df_ = tf.groupBy(col("token"))
        .agg(count(lit(1)).as("df"))
      val scored = tf.join(df_, Seq("token"))
        .withColumn("tfidf",
          col("tf").cast("double") *
            log(lit(nDocs) / col("df").cast("double")))
      scored
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("doc_id"))
            .orderBy(col("tfidf").desc, col("token"))))
        .where(col("rnk") <= 3)
        .select(col("doc_id"), col("rnk").cast("long").as("rnk"),
          col("token"), round(col("tfidf"), 6).as("tfidf"))
        .orderBy(col("doc_id"), col("rnk"))
    }),

    // ---- LLM-pipeline: text analysis ----------------------------------
    "text_stats" -> ((s, dir) => {
      val toks = TextOps.tokens(col("text"))
      t(s, dir, "documents").select(
        col("doc_id"),
        size(toks).cast("bigint").as("n_tokens"),
        length(col("text")).cast("bigint").as("n_chars"),
        round(TextOps.meanTokenLen(toks), 6).as("mean_token_len"),
        TextOps.punctCount(col("text")).cast("bigint").as("n_punct"))
        .orderBy(col("doc_id"))
    }),

    // Unicode-script triage: per-doc letter counts per script family,
    // dominant script and its share — the coarse multilingual pre-filter
    // that runs BEFORE any model-based language ID. The corpus is Latin;
    // the doc_id%6 arms inject Cyrillic/Han/Hiragana/Hangul/Greek runs so
    // every class and the tie-break order carry signal
    "text_scripts" -> ((s, dir) => {
      val inj = ScriptFixture.zipWithIndex.tail
        .foldLeft(when(col("doc_id") % 6 === 0, lit(ScriptFixture(0)))) {
          case (acc, (sfx, i)) => acc.when(col("doc_id") % 6 === i, lit(sfx))
        }
      graft.functions.ScriptOps.scriptProfile(
          t(s, dir, "documents")
            .select(col("doc_id"), concat(col("text"), inj).as("text")),
          "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    "text_langid" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        TextOps.langId(TextOps.tokens(col("text"))).as("lang_pred"))
        .orderBy(col("doc_id"))),

    // the langid heuristic's confusion matrix against the gold labels —
    // every classifier in the pipeline ships its accuracy gauge, and a
    // confusion MATRIX (not a single accuracy number) shows WHICH
    // languages leak into which (the stopword heuristic has no zh list,
    // so zh rows concentrate under 'unk'/'en' — visible here, invisible
    // in an aggregate accuracy)
    "text_langid_confusion" -> ((s, dir) =>
      t(s, dir, "documents").select(col("lang"),
          TextOps.langId(TextOps.tokens(col("text"))).as("lang_pred"))
        .groupBy(col("lang"), col("lang_pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("lang_pred"))),

    // one-pass multi-column profile (ingest sanity gate): every metric of
    // every column rides a single scan + one aggregation
    "profile_table" -> ((s, dir) =>
      Profile.profile(t(s, dir, "documents"),
          Seq("doc_id", "lang", "source", "n_chars"))
        .orderBy(col("column"))),

    // equi-width histogram in ONE scan: the bucket index is a map-side
    // integer division (clamped top bucket), then a single partial-combined
    // aggregate — the distribution sketch an ingest gate wants without a
    // sort or a second pass
    "profile_histogram" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(least(floor(col("n_chars") / lit(50)), lit(19))
          .cast("long").as("bucket"), col("n_chars"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_chars")).cast("long").as("min_chars"),
          max(col("n_chars")).cast("long").as("max_chars"))
        .orderBy(col("bucket"))),

    // as-of (point-in-time) join: each click attaches the user's LATEST
    // purchase value at-or-before it. UNION + one window pass — one shuffle
    // on the key, one sort, NO join operator (pinned in PlanAuditSpec); the
    // oracle is DuckDB's native ASOF LEFT JOIN, an independent
    // implementation of the same semantics
    "events_asof_join" -> ((s, dir) => {
      val ev = events(s, dir)
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.where(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("pvalue"))
      operators.AsOf.asofJoin(clicks, purchases, "user_id", "ts", "ts", "pvalue")
        .select(col("event_id"), col("user_id"),
          round(col("asof_pvalue"), 6).as("asof_value"))
        .orderBy(col("event_id"))
    }),

    // point-in-interval join via grid bucketing: each event value joins
    // the overlapping synthetic quality bands — intervals explode to grid
    // cells (bounded fan-out), points bucket map-side, and the join is
    // CELL EQUALITY with the exact range re-checked inside (hash-join,
    // never the nested-loop a raw theta join plans to)
    "events_interval_lookup" -> ((s, dir) => {
      val iv = t(s, dir, "orders").where(col("o_orderkey") % 50 === 0)
        .select(col("o_orderkey").as("band_id"),
          ((col("o_orderkey") % 97) * 5).cast("double").as("lo"),
          ((col("o_orderkey") % 97) * 5 + 10 + col("o_orderkey") % 23)
            .cast("double").as("hi"))
      val pts = events(s, dir).select(col("event_id"), col("value"))
      operators.RangeJoin.pointInInterval(pts, "value", iv, "lo", "hi",
          grid = 32L)
        .groupBy(col("event_id"))
        .agg(count(lit(1)).as("n_bands"), min(col("band_id")).as("first_band"))
        .orderBy(col("event_id"))
    }),

    // corpus reporting with subtotal rows: ROLLUP over (lang, source) —
    // Spark's Expand-based grouping sets, one scan
    "corpus_rollup" -> ((s, dir) =>
      t(s, dir, "documents")
        .rollup(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
        .orderBy(col("lang").asc_nulls_first, col("source").asc_nulls_first)),

    // per-source language mix as a PIVOT (conditional aggregation over
    // the known language set; absent combinations report 0)
    "corpus_pivot" -> ((s, dir) => {
      val p = t(s, dir, "documents")
        .groupBy(col("source"))
        .pivot("lang", Seq("de", "en", "es", "fr", "zh"))
        .agg(count(lit(1)))
      p.select(col("source") +:
        Seq("de", "en", "es", "fr", "zh").map(l =>
          coalesce(col(l), lit(0L)).as(l)): _*)
        .orderBy(col("source"))
    }),

    // ordered funnel over the event stream: users reaching each stage
    // through a strictly increasing signup -> click -> purchase chain;
    // stage k is ONE user-keyed conditional-min aggregate (map-side type
    // filter, per-user state = k timestamps, never an event list)
    "events_funnel" -> ((s, dir) =>
      operators.Funnel.funnelCounts(events(s, dir), "user_id",
        "event_type", "ts", Seq("signup", "click", "purchase"))),

    // weekly cohort retention: users grouped by first-activity week,
    // re-counted in each later week they stay active — integer epoch
    // floor-divisions (no timezone/week-start conventions), one distinct
    // (user, period) projection + two map-side-combinable aggregates
    "events_retention" -> ((s, dir) =>
      operators.Retention.cohortRetention(events(s, dir), "user_id", "ts")),

    // per-group distribution quantiles: EXACT linear-interpolation
    // percentile as the correctness anchor (matches DuckDB's quantile_cont
    // definition — the oracle is DuckDB's own independent implementation,
    // not a rendering). The 100 TB path swaps in approx_percentile — a
    // mergeable sketch with the same plan shape (map-side partials, one
    // combine) — pinned within tolerance of exact by the spec.
    "profile_quantiles" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          expr("percentile(n_chars, array(0.25D, 0.5D, 0.75D, 0.95D))")
            .as("qs"))
        .select(col("lang"), col("n_docs"),
          round(element_at(col("qs"), 1), 6).as("p25"),
          round(element_at(col("qs"), 2), 6).as("p50"),
          round(element_at(col("qs"), 3), 6).as("p75"),
          round(element_at(col("qs"), 4), 6).as("p95"))
        .orderBy(col("lang"))),

    // mergeable-sketch distinct counting WITH its accuracy gauge (the
    // ann_recall pattern for sketches): HLL++ runs alongside the exact
    // count and the row reports whether the sketch landed within 10% —
    // at 100 TB the exact arm drops and the sketch (constant state per
    // group, mergeable across partitions) is the only affordable
    // distinct count; the gauge is what licenses that swap. Spark's
    // HLL++ has NO sparse-exact mode (dense registers even at tiny
    // cardinalities — rsd IS the per-group σ at any n, measured: a
    // 250-distinct group exceeded 1σ at sf0.1 exactly as statistics
    // says a third of groups should), so the gauge must be a REAL
    // confidence bound: rsd 0.02 with a 10% flag = 5σ — if that flips,
    // the sketch is broken, not unlucky
    "profile_approx_distinct" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("text")).as("n_distinct"),
          approx_count_distinct(col("text"), 0.02).as("__hll"))
        .select(col("source"), col("n_docs"), col("n_distinct"),
          (abs(col("__hll") - col("n_distinct")) <=
            ceil(col("n_distinct") * 0.10)).as("hll_ok"))
        .orderBy(col("source"))),

    // KMV bottom-k distinct sketch WITH its gauge (Bar-Yossef et al.
    // 2002; the theta-sketch primitive): k smallest distinct 62-bit
    // hashes, estimate (k−1)·S/v_k — σ ≈ n/√(k−2) ≈ 12.7% at k=64, the
    // 0.375 flag is ~3σ. Unlike HLL the state is plain BIGINT rows —
    // persisted, audited, and merged in SQL
    "sketch_kmv_gauge" -> ((s, dir) => {
      val corpus = exactDupCorpus(s, dir)
      val k = 64
      val exact = corpus.agg(countDistinct(col("text"))).head().getLong(0)
      Sketches.kmvEstimate(Sketches.kmvSketch(corpus, col("text"), k), k)
        .select(col("n_sketch"), col("v_k"), col("est_distinct"),
          lit(exact).as("n_distinct"),
          (abs(col("est_distinct") - lit(exact.toDouble)) <=
            lit(exact.toDouble * 0.375)).as("kmv_ok"))
    }),

    // the at-rest cardinality ledger: per-release bottom-k sets persisted
    // (blind release appends, k BIGINT rows each), merged estimate pinned
    // EQUAL to the pooled-corpus sketch — the KMV merge theorem makes
    // release-over-release distinct maintenance exact WITHOUT rescanning
    // any release's documents (cross-release duplicate texts collide in
    // hash space and collapse in the merge)
    "sketch_kmv_indexed" -> ((s, dir) => {
      val corpus = nearDupCorpus(s, dir)
      val k = 64
      val path = s"$indexDbDir/kmv_ledger"
      Sketches.writeKmv(corpus.where(col("doc_id") < 10000000), col("text"),
        k, path, 0)
      Sketches.writeKmv(corpus.where(col("doc_id") >= 10000000), col("text"),
        k, path, 1)
      val merged = Sketches.kmvIndexedEstimate(s, path, k)
      val pooled = Sketches.kmvEstimate(
        Sketches.kmvSketch(corpus, col("text"), k), k)
        .select(col("n_sketch").as("__pn"), col("v_k").as("__pv"),
          col("est_distinct").as("__pe"))
      merged.crossJoin(pooled)
        .select(col("n_sketch"), col("v_k"), col("est_distinct"),
          (col("n_sketch") === col("__pn") && col("v_k") === col("__pv") &&
            col("est_distinct") === col("__pe")).as("merge_exact"))
    }),

    // robust outlier flag on document token counts: |n − median| > 3·MAD
    // (median absolute deviation — robust to the very outliers it hunts,
    // unlike a stddev cut). Two exact-percentile aggregates reduce to two
    // driver scalars; the flag itself is a map-side literal comparison.
    // approx_percentile swaps into the same shape at 100 TB
    "profile_outliers" -> ((s, dir) => {
      val nt = size(TextOps.tokens(col("text"))).cast("long")
      val base = t(s, dir, "documents").select(col("doc_id"), nt.as("n_tokens"))
      val med = base.agg(expr("percentile(n_tokens, 0.5D)")).head().getDouble(0)
      val mad = base.select(abs(col("n_tokens") - med).as("d"))
        .agg(expr("percentile(d, 0.5D)")).head().getDouble(0)
      base.select(col("doc_id"), col("n_tokens"),
          (abs(col("n_tokens") - med) > 3.0 * mad).as("is_outlier"))
        .orderBy(col("doc_id"))
    }),

    // semi-structured extraction: JSON property pulled out of the events
    // payload map-side (codegen'd path expression, no UDF), then a standard
    // partial-combined aggregate — the oracle checks SEMANTICS via DuckDB's
    // own JSON functions, not a rendering of the same implementation
    "events_json_agg" -> ((s, dir) =>
      events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          max(col("k")).as("max_k"))
        .orderBy(col("event_type"))),

    // CCNet-style unigram LM scoring (the poor man's perplexity filter):
    // token probabilities TRAIN ON THE CORPUS ITSELF (one vocabulary-sized
    // aggregate), then each document scores mean log10 p(token) — low
    // scores = out-of-distribution gibberish, high = stereotyped
    // boilerplate. Two shuffles total: the vocab count (map-side combined,
    // one row per DISTINCT token) and the per-doc mean; the token→prob
    // lookup is a broadcast-able vocab join, never a corpus self-join
    "text_unigram_logprob" -> ((s, dir) => {
      val toks = TextOps.tokens(col("text"))
      val tok = t(s, dir, "documents")
        .select(col("doc_id"), explode(toks).as("token"))
      val vocab = tok.groupBy(col("token"))
        .agg(count(lit(1)).as("cnt"))
      val total = vocab.agg(sum(col("cnt"))).first().getLong(0)
      tok.join(vocab, Seq("token"))
        .groupBy(col("doc_id"))
        .agg(round(avg(log10(col("cnt").cast("double") / lit(total.toDouble))), 6)
          .as("mean_logprob"), count(lit(1)).as("n_toks"))
        .orderBy(col("doc_id"))
    }),

    // CCNet-style perplexity terciles: unigram Laplace model trained on
    // the 'en' slice, every doc scored under it (broadcast model, unseen
    // tokens take the Laplace floor over the corpus-wide vocab), head /
    // middle / tail assigned map-side against ONE exact-percentile
    // aggregate — no global-order ntile window
    "ccnet_ppl_buckets" -> ((s, dir) =>
      operators.Perplexity.pplBuckets(t(s, dir, "documents"),
          "doc_id", "text", col("lang") === "en")
        .orderBy(col("doc_id"))),

    // bigram LM scoring with a PRUNED (top-500), BROADCAST model: training
    // = two vocabulary-sized aggregates; scoring = map-side broadcast
    // lookups + Katz-style unigram backoff + one per-doc aggregate. The
    // prune is small enough that the backoff branch exercises on every SF.
    "text_bigram_logprob" -> ((s, dir) =>
      LanguageModel.bigramLogProb(t(s, dir, "documents"), "doc_id", "text",
          topK = 500)
        .orderBy(col("doc_id"))),

    // interpolated Kneser–Ney bigram scoring (the KenLM default): ONE
    // distinct-bigram aggregate feeds every vocabulary-sized model table
    // (context counts, forward/reverse continuation counts — all
    // broadcast); pruned to top-500 so the continuation-only backoff arm
    // exercises on every SF alongside the full discounted-ML arm.
    "text_kn_logprob" -> ((s, dir) =>
      LanguageModel.knBigramLogProb(t(s, dir, "documents"), "doc_id", "text",
          topK = 500)
        .orderBy(col("doc_id"))),

    // interpolated Kneser–Ney TRIGRAM scoring (the full CCNet/KenLM
    // order-3 arm): the SAME one-aggregate/broadcast-model geometry one
    // order up — trigram, trigram-context, and middle continuation
    // tables pruned to top-500 so every rung of the three-level backoff
    // ladder (discounted ML, pruned-context fall-through, middle
    // continuation, bare continuation) exercises on every SF
    "text_kn3_logprob" -> ((s, dir) =>
      LanguageModel.knTrigramLogProb(t(s, dir, "documents"), "doc_id",
          "text", topK = 500)
        .orderBy(col("doc_id"))),

    // DSIR-style importance scores (hashed-unigram log-likelihood ratio):
    // raw docs (non-English split) scored against the English split as the
    // target — both bucket models are <= 256 rows and broadcast; positive
    // score = looks more target-like than raw-like
    "dsir_score" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      Relevance.dsirScores(
          raw = d.where(col("lang") =!= "en"),
          target = d.where(col("lang") === "en"),
          "doc_id", "text", buckets = 256)
        .orderBy(col("doc_id"))
    }),

    // Okapi BM25 retrieval against a fixed query term set: corpus stats
    // (N, avgdl) are one aggregate -> two driver scalars, term frequencies
    // filter to query terms MAP-SIDE before the (doc, term) shuffle, and
    // document frequencies broadcast back (|Q| rows) — the corpus never
    // self-joins. Ranked on the rounded score, id tie-break.
    "text_bm25" -> ((s, dir) =>
      Relevance.bm25TopK(t(s, dir, "documents"), "doc_id", "text",
        Seq("spark", "hash", "merge"))),

    // text_bm25 through the PERSISTED inverted index (the at-rest lexical
    // retrieval leg next to the digest/band/cluster and IVF indexes): half
    // the corpus is indexed at write time, the other half FOLDED IN by
    // append — tokenization paid once per document lifetime — then the
    // probe reads postings in place (bucket-pruned on the query terms,
    // pinned) and never touches corpus text. Oracle identical to
    // text_bm25: the index stores exactly the per-(doc, term) stream the
    // rescan derives, and the appended stats rows fold to the same N/avgdl
    "bm25_indexed" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val db = indexDb(s)
      Relevance.writePostingsIndex(d.where(col("doc_id") % 2 === 0),
        "doc_id", "text", s"$db.postings_rt", buckets = 8)
      Relevance.appendPostingsIndex(d.where(col("doc_id") % 2 === 1),
        "doc_id", "text", s"$db.postings_rt")
      // maintenance fold: one file per bucket again, stats rows summed —
      // the probe after compaction must still equal the full-corpus BM25
      Relevance.compactPostingsIndex(s, s"$db.postings_rt")
      Relevance.bm25TopKIndexed(s, s"$db.postings_rt",
          Seq("spark", "hash", "merge"))
        .select(col("id").as("doc_id"), col("bm25"))
    }),

    // exact phrase search through the SAME positional postings index: a
    // two-term phrase, a repeated-term phrase (overlapping occurrences —
    // "table table table" counts 2), and a three-term fold, all against an
    // INDEPENDENT oracle that recomputes adjacency directly on the raw
    // token stream — the probe and the oracle share no machinery
    "phrase_indexed" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val db = indexDb(s)
      Relevance.writePostingsIndex(d, "doc_id", "text",
        s"$db.phrase_rt", buckets = 8)
      Seq(Seq("merge", "sort"), Seq("table", "table"),
          Seq("value", "table", "part"))
        .map(ph => Relevance.phraseSearch(s, s"$db.phrase_rt", ph)
          .select(lit(ph.mkString(" ")).as("phrase"),
            col("id").as("doc_id"), col("n_matches").cast("long").as("n_matches")))
        .reduce(_ unionAll _)
        .orderBy(col("phrase"), col("doc_id"))
    }),

    // proximity (slop-k) search through the SAME positional postings
    // index: term pairs within k positions (IIR §2.4.2 positional
    // intersect, the within-k generalization of the phrase fold) — an
    // ordered-pair count, so the self-pair probe counts each unordered
    // pair twice (stated convention). Oracle = an INDEPENDENT position
    // self-join on the raw token stream — no postings, no position maps
    "proximity_indexed" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val db = indexDb(s)
      Relevance.writePostingsIndex(d, "doc_id", "text",
        s"$db.prox_rt", buckets = 8)
      Seq(("merge", "sort", 3), ("value", "part", 4), ("table", "table", 2))
        .map { case (a, b, k) =>
          Relevance.proximitySearch(s, s"$db.prox_rt", a, b, k)
            .select(lit(s"$a $b /$k").as("probe"),
              col("id").as("doc_id"),
              col("n_matches").cast("long").as("n_matches"))
        }
        .reduce(_ unionAll _)
        .orderBy(col("probe"), col("doc_id"))
    }),

    // language-adaptive quality cut (CCNet, Wenzek et al. 2020 §4.3): the
    // keep threshold is the per-LANGUAGE 0.7 exact percentile of token
    // counts — a group-count-sized aggregate broadcast back, keep decision
    // map-side; a single global cut would mostly measure the language mix
    "filter_per_lang_quantile" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
      PerGroupQuantile.filter(d, "lang", "n_tokens", 0.7)
        .select(col("doc_id"), col("lang"), col("n_tokens"), col("group_cut"))
        .orderBy(col("doc_id"))
    }),

    // tokenizer-vocabulary coverage: OOV rate of a frequency-truncated
    // 25-type vocabulary — vocabulary-sized counts, bounded top-K cut
    // (per-partition top-K + driver merge), broadcast membership probe;
    // exact long totals, ONE double division
    "text_vocab_coverage" -> ((s, dir) =>
      VocabCoverage.vocabCoverage(t(s, dir, "documents"), "text",
        vocabSize = 25)),

    // top principal direction by distributed power iteration: per round,
    // the map-side dot against the literal v feeds ONE (dim -> partial
    // integer sum) aggregation — wire cost O(tasks*d), never corpus-sized;
    // per-row contributions quantize to integer micro-units so the shuffle
    // sums are associative and the trajectory is bit-identical in any
    // engine and under any partitioning (oracle: 3 unrolled CTE rounds)
    "embed_pca_power" -> ((s, dir) =>
      Pca.topComponent(s, t(s, dir, "embeddings"), "embedding", dim = 64)),

    // the deflated SECOND principal direction: power-iterate, project the
    // first component out (float re-quantized — the storage contract),
    // power-iterate the residual — k components cost k bounded matvec
    // loops; the oracle composes two namespaced CTE chains bit-exactly
    "embed_pca_deflated" -> ((s, dir) => {
      import s.implicits._
      val comps = Pca.topComponents(t(s, dir, "embeddings"), "embedding",
        dim = 64, k = 2)
      comps(1).zipWithIndex.map { case (x, i) => ((i + 1).toLong, x) }.toSeq
        .toDF("dim", "loading")
        .select(col("dim"), round(col("loading"), 6).as("loading"))
        .orderBy(col("dim"))
    }),

    // INTENT-pinned power iteration (tools/pca_reference.py): a 5-point
    // cloud dominated by multiples of (3,4) whose quantized trajectory
    // lands exactly on the hand-derivable unit direction (0.6, 0.8) —
    // literal VALUES, so a shared misunderstanding between the two
    // same-arithmetic renderings cannot echo
    "pca_pinned" -> ((s, dir) => {
      import s.implicits._
      val pts = Seq(
        Tuple1(Seq(3f, 4f)), Tuple1(Seq(6f, 8f)), Tuple1(Seq(-3f, -4f)),
        Tuple1(Seq(1f, 0f)), Tuple1(Seq(0f, 1f))).toDF("embedding")
      Pca.topComponent(s, pts, "embedding", dim = 2)
    }),

    // All-but-the-Top anisotropy correction (Mu & Viswanath 2018)
    // composed on the power-iteration component: x' = x − (x·v)v as a
    // map-side transform re-quantized to float (the persisted type — and
    // what keeps the native codegen'd cosine on its float path), then the
    // corrected top-10 of probe 0 — broadcast probe, one corpus scan
    "embed_abtt" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val v = Pca.topComponentVector(emb, "embedding", 64)
      val corr = Pca.removeComponent(emb, "embedding", v)
        .select(col("vec_id"), col("corrected"))
      val probe = broadcast(corr.where(col("vec_id") === 0)
        .select(col("corrected").as("qv")))
      corr.where(col("vec_id") =!= 0).crossJoin(probe)
        .select(col("vec_id").as("neighbor_id"),
          round(VectorOps.cosine(col("corrected"), col("qv")), 6)
            .as("cosine"))
        .orderBy(col("cosine").desc, col("neighbor_id"))
        .limit(10)
    }),

    // count-min sketch frequency gauge (Cormode & Muthukrishnan 2005):
    // probe tokens' exact counts + the est-within-[exact, exact + 5·ε·N]
    // flag — the sketch merges associatively map-side (O(tasks·d·w) wire
    // cost vs the exact count's vocabulary-sized shuffle); at 100 TB the
    // exact arm drops and this gauge licenses the swap
    "text_cms_gauge" -> ((s, dir) =>
      Sketches.cmsTokenGauge(t(s, dir, "documents"), "text",
        Seq("join", "hash", "merge", "spark", "nosuchtoken"))),

    // hybrid retrieval: reciprocal-rank fusion (Cormack et al. 2009) of
    // the BM25 lexical arm and the embedding-cosine dense arm — each arm
    // reduces the corpus to a bounded armK-row ranking first, fusion and
    // the only window in the plan run over driver-bounded tables
    "text_rrf_hybrid" -> ((s, dir) =>
      Relevance.rrfHybrid(t(s, dir, "documents"), t(s, dir, "embeddings"),
        "doc_id", "text", "vec_id", "embedding",
        Seq("spark", "hash", "merge"), queryVecId = 0L)),

    // hand-derived intent pin for BM25 (tools/bm25_reference.py): a 4-doc
    // inline corpus scored by an independent Python implementation — NOT a
    // rendering of the Spark arithmetic
    "bm25_pinned" -> ((s, dir) => {
      import s.implicits._
      Relevance.bm25TopK(Bm25Corpus.toDF("doc_id", "text"), "doc_id", "text",
        Seq("cat", "dog"), topK = 3)
    }),

    // corpus vocabulary: exact top-20 tokens by frequency (ties broken by
    // token, so the cutoff is deterministic). The shuffle carries one row
    // per DISTINCT token after map-side partial counts — vocabulary-sized,
    // not corpus-sized — and the top-k is a driver-bounded limit.
    "text_top_tokens" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token")).limit(20)),

    // heavy hitters via a mergeable Misra-Gries summary: each map task
    // reduces to <= capacity counters BEFORE the shuffle — O(tasks ×
    // capacity) wire cost vs text_top_tokens' one-row-per-distinct-token
    // shuffle (vocabulary-sized at 100 TB). Capacity 4096 exceeds this
    // corpus's distinct-token count, so nothing evicts and the counts are
    // exact = the oracle's exact aggregate; the under-eviction
    // approximation bound is spec-pinned (HeavyHittersSpec)
    "text_heavy_hitters" -> ((s, dir) =>
      graft.operators.HeavyHitters.topTokens(
        t(s, dir, "documents"),
        explode(TextOps.tokens(col("text"))), 4096, 20)),

    // ---- deterministic splits / sampling (training-data pipeline) -------
    "sample_split" -> ((s, dir) =>
      Sampling.assignSplit(t(s, dir, "documents"), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 7)
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
        .orderBy(col("split"))),

    "sample_stratified" -> ((s, dir) =>
      Sampling.sampleByHash(t(s, dir, "documents"), "doc_id", 0.2, seed = 3)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_sampled"), min(col("doc_id")).as("min_id"))
        .orderBy(col("lang"))),

    // quality-weighted Bernoulli selection: keep probability = the
    // composite quality score (deterministic via the portable hash) —
    // thinning that keeps the quality GRADIENT instead of a cliff gate
    "sample_by_quality" -> ((s, dir) => {
      val toks = TextOps.tokens(col("text"))
      Sampling.byQuality(t(s, dir, "documents"), "doc_id",
          QualityOps.qualityScore(col("text"), toks), seed = 13)
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    }),

    // deterministic global shuffle: bucket+key assignment is map-side only;
    // the query verifies the whole assignment via per-bucket aggregates
    "shuffle_assign" -> ((s, dir) =>
      Sampling.shuffleAssign(t(s, dir, "documents"), "doc_id",
          nBuckets = 8, seed = 5)
        .groupBy(col("shuffle_bucket"))
        .agg(count(lit(1)).as("n"), min(col("shuffle_key")).as("min_key"),
          sum(col("doc_id")).as("id_sum"))
        .orderBy(col("shuffle_bucket"))),

    // deterministic corpus mixing: thin each language stratum by hash so
    // the kept corpus realizes the target mixture at the largest
    // no-upsampling size (stratum sizes = one tiny aggregate; the keep
    // decision is a map-side CASE over hash16 — no corpus shuffle)
    "mix_by_lang" -> ((s, dir) =>
      Mixing.mix(t(s, dir, "documents"), "doc_id", "lang",
          Seq("en" -> 0.5, "de" -> 0.2, "es" -> 0.1, "fr" -> 0.1, "zh" -> 0.1),
          seed = 9)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"))
        .orderBy(col("lang"))),

    // temperature-scaled mixing at T=2: target weights sqrt(n_s)-derived
    // from the observed sizes (the multilingual flattening rule), realized
    // by the same map-side hash thinning — sqrt is IEEE-exact in both
    // engines, so the derived thresholds match bit-for-bit
    "mix_temperature" -> ((s, dir) =>
      Mixing.mixByTemperature(t(s, dir, "documents"), "doc_id", "lang",
          temperature = 2.0, seed = 9)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"))
        .orderBy(col("lang"))),

    // EXACT-k uniform sample per group (the guarantee rate-based thinning
    // can't give: exactly min(k, n) rows per source, not a binomial
    // realization): rank = the portable row hash, selection = the bounded
    // top-k aggregate per source (≤ k state entries per group per map
    // task — never a row_number window over the source partition).
    // Deterministic and seed-stable like every hash16 selection
    "sample_exact_k" -> ((s, dir) => {
      val topk = Similarity.topKUdaf(15)
      t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          Sampling.hash16(col("doc_id"), 21).as("hk"))
        .groupBy(col("source"))
        // score = -hash: the aggregate's (score desc, id asc) order is then
        // exactly (hash asc, doc_id asc) — hash ties break on the id
        .agg(topk(-col("hk").cast("double"), col("doc_id")).as("tk"))
        .select(col("source"), explode(col("tk.items._2")).as("doc_id"))
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    }),

    // semantic (embedding-space) decontamination: train vectors within
    // cosine 0.35 of ANY eval vector drop — the eval set broadcasts, the
    // train side is one map-side scan (the rangeSearch shape); the
    // embedding-space sibling of the shingle-overlap contamination check
    "contamination_semantic" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val evalSet = emb.where(col("vec_id") % 17 === 0)
      val train = emb.where(col("vec_id") % 17 =!= 0)
      val flagged = Similarity.rangeSearch(train, evalSet,
          "vec_id", "embedding", minCosine = 0.35)
        .select(col("neighbor_id").as("vec_id")).distinct()
      train.join(flagged, Seq("vec_id"), "left_anti")
        .select(col("vec_id"), col("label"))
        .orderBy(col("vec_id"))
    }),

    // declarative data-expectations audit: five named contract clauses
    // (non-null id, non-empty text, known language, positive and
    // text-consistent n_chars, source format) — every check a conditional
    // partial sum riding ONE aggregate over ONE scan; NULL predicate
    // results count as violations
    "profile_expectations" -> ((s, dir) =>
      operators.Expectations.audit(t(s, dir, "documents"), Seq(
        "id_not_null" -> col("doc_id").isNotNull,
        "text_nonempty" -> (length(col("text")) > 0),
        "lang_known" -> col("lang").isin("en", "de", "fr", "es", "zh"),
        "chars_match_text" -> (col("n_chars") === length(col("text"))),
        "source_format" -> col("source").rlike("^src[0-9]+$")))),

    // Z-order (Morton) clustering key over two quality dimensions — the
    // OPTIMIZE ZORDER technique: interleaved bits make rows close in BOTH
    // dimensions close in the 1-D key, so range-partitioning by it gives
    // every output shard a small (length, tokens) bounding box and file
    // statistics can skip on EITHER predicate; pure codegen'd bit
    // arithmetic, zero shuffle to compute (spec pins the locality)
    "curriculum_zorder" -> ((s, dir) => {
      val q1 = least(shiftright(col("n_chars"), 2), lit(255L))
      val q2 = least(size(TextOps.tokens(col("text"))).cast("long"), lit(255L))
      t(s, dir, "documents")
        .select(col("doc_id"),
          operators.ZOrder.interleave2(q1, q2, 8).as("zkey"))
        .withColumn("shard", shiftright(col("zkey"), 10))
        .orderBy(col("doc_id"))
    }),

    // per-language percentile-rank normalization (the step before
    // combining incomparable quality signals): quantize map-side, ONE
    // bounded per-(group, bucket) histogram, the cumulative fold as a
    // window over the BOUNDED histogram (never corpus rows), broadcast
    // (group, bucket) lookup back — skew-safe where percent_rank() over
    // the group partition would sort half the corpus in one task
    "quality_rank_normalize" -> ((s, dir) =>
      operators.RankNormalize.percentileRank(t(s, dir, "documents"), "lang",
          col("n_chars").cast("double") / lit(1000.0))
        .select(col("doc_id"), col("lang"), col("rank_pct"))
        .orderBy(col("doc_id"))),

    // weighted sampling WITHOUT replacement (Efraimidis-Spirakis 2006):
    // exactly 10 docs per language, selection probability proportional to
    // n_chars — the exponential key −ln(u)/w computes map-side from the
    // portable hash (rounded to 9 before ranking so a last-ulp ln
    // divergence can't flip a cut), then the bounded top-k aggregate
    "sample_weighted_k" -> ((s, dir) =>
      Sampling.weightedKPerGroup(t(s, dir, "documents"), "lang", "doc_id",
          "n_chars", k = 10, seed = 33)
        .orderBy(col("doc_id"))),

    // fractional-EPOCH mixing (the upsampling half the thinning mixers
    // can't express): src0 at 2.25 epochs, src1 a deterministic half
    // epoch, src2 exactly once, src3 three times, everything else
    // dropped — each copy tagged with its epoch index. Zero exchanges:
    // recipe is a literal CASE, fan-out is a generator
    "mix_epochs" -> ((s, dir) =>
      Mixing.mixEpochs(t(s, dir, "documents"), "doc_id", "source",
          Seq("src0" -> 2.25, "src1" -> 0.5, "src2" -> 1.0, "src3" -> 3.0),
          seed = 9)
        .select(col("doc_id"), col("source"), col("epoch"))
        .orderBy(col("doc_id"), col("epoch"))),

    // INTENT pin for the whole hash16 family: split/sample/shuffle over a
    // literal id range, checked against VALUES computed by an INDEPENDENT
    // reimplementation of the hash arithmetic (tools/hash16_reference.py) —
    // the dataset-scale queries above share their arithmetic with the
    // dual-rendered oracle, so only this row can catch a wrong hash
    "sample_pinned" -> ((s, dir) => {
      import s.implicits._
      // 0..63 plus ids beyond 2^32/2^52/2^62: pins the high-half (`>> 32`)
      // injection and that both engines' shift/mod arithmetic agree out to
      // the top of the non-negative int64 range
      val ids = ((0L until 64L) ++ Seq(
        4294967301L, 1099511627899L, 4503599627370503L, 4611686018427388903L))
        .toDF("id")
      Sampling.shuffleAssign(
          Sampling.assignSplit(ids, "id",
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 7),
          "id", nBuckets = 8, seed = 5)
        .select(col("id"), col("split"),
          (Sampling.hash16(col("id"), 3) <
            lit(math.round(0.2 * Sampling.Buckets))).as("sampled"),
          col("shuffle_key"), col("shuffle_bucket"))
        .orderBy(col("id"))
    }),

    // offset-based sequence packing: per-source running token total cut
    // into 1024-token training sequences
    "pack_sequences" -> ((s, dir) =>
      Sampling.packSequences(
        t(s, dir, "documents").select(col("doc_id"), col("source"),
          size(TextOps.tokens(col("text"))).cast("bigint").as("n_toks")),
        "source", "doc_id", "n_toks", budget = 1024)
        .select(col("doc_id"), col("source"), col("n_toks"),
          col("seq_id"), col("tok_offset"))
        .orderBy(col("doc_id"))),

    // INTENT pin for best-fit-decreasing whole-document packing (Ding
    // et al. 2024 — no truncation: over-long docs pre-split, everything
    // else packs whole, unfilled capacity is padding): a pinned fixture
    // with an over-long doc, duplicates, and an exact-fill length,
    // checked against literal VALUES from the independent
    // tools/binpack_reference.py (every placement, not just validity)
    "pack_bestfit_pinned" -> ((s, dir) => {
      import s.implicits._
      val fixture = Seq((1L, 7L), (2L, 23L), (3L, 4L), (4L, 4L),
        (5L, 10L), (6L, 3L), (7L, 6L), (8L, 2L), (9L, 5L))
        .toDF("doc_id", "n_toks")
        .withColumn("g", lit("all"))
      Sampling.packBestFit(fixture, "g", "doc_id", "n_toks", seqLen = 10)
        .select(col("doc_id"), col("piece"), col("len"),
          col("seq_id"), col("offset"))
        .orderBy(col("doc_id"), col("piece"))
    }),

    // corpus-scale best-fit packing, gated on what SQL can state
    // independently: conservation (every doc's every token placed —
    // doc/piece/token counts restate from token arithmetic alone),
    // per-sequence capacity and contiguity (no overlap, no gap), and
    // Johnson's BFD guarantee (9·seqs ≤ 11·OPT + 6 with OPT ≥
    // ⌈total/seqLen⌉) — a dropped doc, a split that shouldn't happen,
    // an overfull or gappy bin, or a degenerate one-piece-per-bin
    // packing each flips a column
    "pack_bestfit" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("source"),
        size(TextOps.tokens(col("text"))).cast("bigint").as("n_toks"))
      val asg = Sampling.packBestFit(docs, "source", "doc_id", "n_toks",
        seqLen = 64)
      val perSeq = asg
        .groupBy(col("source"), col("seq_id"))
        .agg(sum(col("len")).as("__fill"),
          array_sort(collect_list(struct(col("offset"), col("len"))))
            .as("__iv"))
        .select(col("source"), col("__fill"),
          (col("__fill") <= 64).as("__cap"),
          (element_at(col("__iv"), 1).getField("offset") === 0 &&
            aggregate(
              zip_with(slice(col("__iv"), lit(1), size(col("__iv")) - 1),
                slice(col("__iv"), lit(2), size(col("__iv")) - 1),
                (a, b) => b.getField("offset") ===
                  a.getField("offset") + a.getField("len")),
              lit(true), (acc, x) => acc && x)).as("__contig"))
      val stats = asg.groupBy(col("source"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_pieces"),
          sum(col("len")).cast("bigint").as("total_tokens"),
          countDistinct(col("seq_id")).as("__nseqs"))
      val valid = perSeq.groupBy(col("source"))
        .agg(bool_and(col("__cap")).as("capacity_ok"),
          bool_and(col("__contig")).as("contiguous_ok"))
      stats.join(valid, "source")
        .select(col("source"), col("n_docs"), col("n_pieces"),
          col("total_tokens"), col("capacity_ok"), col("contiguous_ok"),
          (col("__nseqs") * 9 <=
            expr("11 * ((total_tokens + 63) div 64) + 6")).as("bound_ok"))
        .orderBy(col("source"))
    }),

    // sliding-window chunking (LM context segmentation): 32-token chunks
    // every 16 tokens, entirely map-side — starts from `sequence`, per-chunk
    // digest folded over an array slice, posexplode emits chunk rows; no
    // shuffle, scales with scan bandwidth alone
    "chunk_sliding" -> ((s, dir) =>
      Chunking.slidingChunks(t(s, dir, "documents"),
          "doc_id", "text", chunkSize = 32, stride = 16)
        .orderBy(col("doc_id"), col("chunk_id"))),

    // per-source quality quota: cap each source's contribution to the best
    // N documents by composite quality score — ONE bounded top-k aggregate
    // per source (<= N entries of state per group per map task), NOT a
    // row_number window over the source partition: a source holding half
    // the corpus would funnel into one unsplittable window task, while
    // the aggregate combines map-side. Rank on the ROUNDED score so
    // cross-engine double last-ulp differences cannot flip the ordering
    // (ties break by doc_id)
    "quota_per_source" -> ((s, dir) => {
      val tk = TextOps.tokens(col("text"))
      val scored = t(s, dir, "documents").select(col("doc_id"), col("source"),
        round(QualityOps.qualityScore(col("text"), tk), 6).as("score"))
      val top = Similarity.topKUdaf(20)
      scored.groupBy(col("source"))
        .agg(top(col("score"), col("doc_id")).as("top"))
        .select(col("source"), posexplode(col("top.items")).as(Seq("i", "e")))
        .select(col("e._2").as("doc_id"), col("source"),
          col("e._1").as("score"), (col("i") + 1).cast("long").as("rank"))
        .orderBy(col("source"), col("rank"))
    }),

    // GPT-2 byte-level BPE pre-tokenization over the pinned edge corpus
    // (contractions / interior multi-space lookahead / letter-digit
    // boundaries / trailing whitespace / non-ASCII / newlines / empty):
    // oracle is literal VALUES generated by the reference Python `regex`
    // engine running the published pattern — an independent regex
    // implementation, not a rendering of the Java one
    "tok_pretoken_gpt2" -> ((s, dir) => {
      import s.implicits._
      PretokenCorpus.toDF("case_id", "text")
        .select(col("case_id"),
          posexplode_outer(TextOps.pretokenizeGpt2(col("text")))
            .as(Seq("pos", "piece")))
        .select(col("case_id"), col("pos").cast("bigint").as("pos"),
          col("piece"))
        .orderBy(col("case_id"), col("pos"))
    }),

    // the pre-tokenizer's lossless-partition property corpus-wide, plus
    // piece counts: on ASCII-only rows with no multi-space runs and no
    // trailing whitespace (all of the synthetic corpus — the guard
    // filter makes the equivalence a construction fact, and the edge
    // corpus above pins the excluded forms) the lookahead arm never
    // fires and Java's (?U)\s agrees with RE2's ASCII \s, so the
    // oracle's RE2 restatement with a plain `\s+` tail is exact
    "tok_pretoken_lossless" -> ((s, dir) => {
      val pieces = TextOps.pretokenizeGpt2(col("text"))
      t(s, dir, "documents")
        .where(!col("text").rlike("[^\\x00-\\x7F]|\\s\\s|\\s$"))
        .select(col("doc_id"), size(pieces).cast("bigint").as("n_pieces"),
          (concat_ws("", pieces) === col("text")).as("lossless"))
        .orderBy(col("doc_id"))
    }),

    // ---- BPE tokenizer (trainer + encoder) ----------------------------
    // corpus-trained merge table: ONE corpus-wide aggregate (the word
    // vocabulary), then every round runs on the vocab table only with a
    // 1-row argmax collect; oracle = the same algorithm unrolled to 12
    // nested CTE levels in DuckDB
    "bpe_merges" -> ((s, dir) => {
      import s.implicits._
      Bpe.train(Bpe.vocabulary(t(s, dir, "documents"), "text"),
          "word", "freq", 12)
        .map(m => (m.rank.toLong, m.left, m.right, m.cnt))
        .toDF("rank", "left_sym", "right_sym", "pair_freq")
        .orderBy(col("rank"))
    }),

    // encode the corpus with its own trained merges: per-doc word/piece
    // counts and compression ratio — the merge chain is literal replaces
    // inside a transform, pure projection
    "bpe_encode" -> ((s, dir) => {
      val merges = Bpe.train(Bpe.vocabulary(t(s, dir, "documents"), "text"),
        "word", "freq", 12)
      Bpe.encodeStats(t(s, dir, "documents"), "doc_id", "text", merges)
        .orderBy(col("doc_id"))
    }),

    // tokenizer fertility (chars per piece, per language) — the standard
    // tokenizer-quality gauge: a vocabulary that fragments one language
    // into byte confetti shows up as LOW fertility there, and that
    // language pays more compute per character at train time; integer-
    // exact char and piece sums, one rounded division per group
    "tok_fertility" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val merges = Bpe.train(Bpe.vocabulary(d, "text"), "word", "freq", 12)
      d.select(col("doc_id"), col("lang"),
          length(col("text")).cast("long").as("n_chars"))
        .join(Bpe.encodeStats(d, "doc_id", "text", merges)
          .select(col("doc_id"), col("n_pieces")), Seq("doc_id"))
        .groupBy(col("lang"))
        .agg(sum(col("n_chars")).as("chars"),
          sum(col("n_pieces")).as("pieces"))
        .select(col("lang"), col("chars"), col("pieces"),
          round(col("chars").cast("double") / col("pieces").cast("double"),
            6).as("fertility"))
        .orderBy(col("lang"))
    }),

    // train on what you will encode: the merge table learned from the
    // pre-tokenizer PIECE vocabulary (leading spaces drop through the
    // shared symbol-framing trim), oracle = the same 12-level unrolled
    // trainer over the RE2 piece restatement
    "bpe_merges_pretok" -> ((s, dir) => {
      import s.implicits._
      Bpe.train(Bpe.vocabularyPretokenized(
          t(s, dir, "documents").where(!col("text").rlike("[^\\x00-\\x7F]|\\s\\s|\\s$")),
          "text"), "word", "freq", 12)
        .map(m => (m.rank.toLong, m.left, m.right, m.cnt))
        .toDF("rank", "left_sym", "right_sym", "pair_freq")
        .orderBy(col("rank"))
    }),

    // the production composition: GPT-2 pre-tokenizer pieces as the
    // encode units (merges cannot cross piece boundaries), the same
    // corpus-trained merge table applied per piece — the guard filter
    // makes the oracle's RE2 piece restatement exact (tok_pretoken_*
    // pins the excluded forms)
    "bpe_encode_pretok" -> ((s, dir) => {
      val merges = Bpe.train(Bpe.vocabulary(t(s, dir, "documents"), "text"),
        "word", "freq", 12)
      Bpe.encodeStatsPretokenized(
          t(s, dir, "documents").where(!col("text").rlike("[^\\x00-\\x7F]|\\s\\s|\\s$")),
          "doc_id", "text", merges)
        .orderBy(col("doc_id"))
    }),

    // INTENT pin: the classic Sennrich worked example plus "lowest";
    // literal VALUES from tools/bpe_reference.py (list-based independent
    // implementation — not a rendering of the replace-chain)
    "bpe_pinned" -> ((s, dir) => {
      import s.implicits._
      val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
        ("widest", 3L), ("lowest", 4L)).toDF("word", "freq")
      Bpe.train(vocab, "word", "freq", 8)
        .map(m => (m.rank.toLong, m.left, m.right, m.cnt))
        .toDF("rank", "left_sym", "right_sym", "pair_freq")
        .orderBy(col("rank"))
    }),

    // ---- WordPiece tokenizer (likelihood-scored merges) ---------------
    // corpus-trained merge table under the BERT score rule
    // cnt/(c(left)·c(right)): same ONE corpus-wide vocabulary aggregate
    // as BPE, training driver-side on the bounded vocab; oracle = the
    // same likelihood rule unrolled to 10 CTE levels in DuckDB (pair +
    // symbol counts → IEEE-division score argmax → merged vocab)
    "wordpiece_merges" -> ((s, dir) => {
      import s.implicits._
      WordPiece.train(WordPiece.vocabulary(t(s, dir, "documents"), "text"),
          "word", "freq", 10)
        .map(m => (m.rank.toLong, m.left, m.right, m.cnt,
          BigDecimal(m.score).setScale(9, BigDecimal.RoundingMode.HALF_UP)
            .toDouble))
        .toDF("rank", "left_sym", "right_sym", "pair_freq", "score")
        .orderBy(col("rank"))
    }),

    // encode the corpus with its own trained piece set: per-doc
    // word/piece counts and compression ratio — greedy longest-match
    // native expression; oracle re-states the greedy scan as a
    // RECURSIVE CTE advancing each word by the longest matching piece
    "wordpiece_encode" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val (_, ps) = WordPiece.trainPieces(
        WordPiece.vocabulary(docs, "text"), "word", "freq", 10)
      WordPiece.encodeStats(docs, "doc_id", "text", ps)
        .orderBy(col("doc_id"))
    }),

    // INTENT pin: literal VALUES from tools/wordpiece_reference.py (naive
    // full-recount trainer — not a rendering of the incremental one)
    "wordpiece_pinned" -> ((s, dir) => {
      import s.implicits._
      val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
        ("widest", 3L), ("lowest", 4L)).toDF("word", "freq")
      WordPiece.train(vocab, "word", "freq", 8)
        .map(m => (m.rank.toLong, m.left, m.right, m.cnt,
          BigDecimal(m.score).setScale(9, BigDecimal.RoundingMode.HALF_UP)
            .toDouble))
        .toDF("rank", "left_sym", "right_sym", "pair_freq", "score")
        .orderBy(col("rank"))
    }),

    // greedy longest-match-first encodings of fixed probe words under the
    // pinned trained piece set — the native-expression scan (BERT
    // whole-word-UNK rule) against the reference's segmentations
    "wordpiece_encode_pinned" -> ((s, dir) => {
      import s.implicits._
      val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
        ("widest", 3L), ("lowest", 4L))
      val ps = WordPiece.pieces(vocab, WordPiece.trainLocal(vocab, 8))
      Seq("lowest", "newest", "low", "wider", "newlow", "elow", "zzz")
        .toDF("word")
        .select(col("word"),
          array_join(WordPiece.encode(col("word"), ps), " ").as("pieces"))
        .orderBy(col("word"))
    }),

    // ---- Dictionary scan (Aho–Corasick) -------------------------------
    // multi-phrase blocklist accounting: ONE automaton pass per doc finds
    // every occurrence of every phrase (overlapping and nested included)
    // in O(len + matches) — the scale path where a regex alternation
    // dies; dictionary exercises suffix-nested ("table"/"able"/"le"),
    // prefix ("query"/"que"), cross-token ("value table") and absent
    // ("zebra") phrases; oracle re-counts by joining every text position
    // against the phrase table
    "dict_match_stats" -> ((s, dir) =>
      DictMatch.matchStats(t(s, dir, "documents"), "doc_id", "text",
        SparkEntry.DictPhrases)),

    // ---- Suffix array (prefix doubling) -------------------------------
    // window-bounded generalized suffix array — the Lee et al. 2022
    // exact-substring-dedup primitive — by log₂(window) prefix-doubling
    // rounds, each a per-doc lead() window + a distributed dense rank
    // (range repartition, per-partition run counting, P-row driver
    // offsets — never a global-order window). Output folds EVERY rank
    // into a per-doc checksum, so one wrong rank anywhere fails the row;
    // oracle = DuckDB's dense_rank over the sorted suffix strings
    "suffix_array_ranks" -> ((s, dir) =>
      SuffixArray.rankChecksums(suffixRanks48(s, dir), "doc_id")),

    // the array head with its suffix strings — bounded TakeOrdered
    "suffix_array_top" -> ((s, dir) =>
      SuffixArray.topSuffixes(suffixRanks48(s, dir),
        t(s, dir, "documents"), "doc_id", "text", 48, 20)),

    // the ExactSubstr dedup outcome: every 48-code-point substring
    // occurring more than once, via rank-key groupBy (8-byte shuffle
    // keys, snippet materialized only for the witness); oracle groups
    // the substrings directly
    "suffix_repeated_windows" -> ((s, dir) =>
      SuffixArray.repeatedWindows(suffixRanks48(s, dir),
        t(s, dir, "documents"), "doc_id", "text", 48, 20)),

    // the EXCISION position set of the ExactSubstr pass (Lee et al. 2022
    // §4): every (doc, pos) whose 48-cp window occurs in another document
    // too — shared ranks in the persisted index, one rank-groupBy + a
    // co-bucketed semi-join back; the oracle re-derives multiplicity by
    // grouping the substrings themselves
    "suffix_repeated_positions" -> ((s, dir) =>
      SuffixArray.repeatedPositions(suffixRanks48(s, dir),
          t(s, dir, "documents"), "doc_id", "text", 48)
        .orderBy(col("doc_id"), col("pos"))),

    // the ExactSubstr CLEANING step itself: every document with its
    // cross-document-repeated 48-cp spans CUT OUT — only documents with
    // repeated spans pay character surgery (the clean majority passes
    // through map-side); oracle re-derives coverage from the substrings
    // and reassembles with string_agg — no ranks, no index
    "suffix_excise" -> ((s, dir) =>
      SuffixArray.exciseRepeated(suffixRanks48(s, dir),
          t(s, dir, "documents"), "doc_id", "text", 48)
        .orderBy(col("doc_id"))),

    // the ONE-TIME sharded index build, as its own bench row: release 1
    // (even ids) creates the index, release 2 (odd ids) folds in through
    // the delta-only appendRankShard — the per-shard prefix-doubling
    // cost lands HERE (alphabetically first of the suffix_sharded_*
    // family), so the three consumer rows below bill their own probe
    // path and a probe regression can no longer drown in the build.
    // Oracle: per-shard suffix and doc counts — one row per text char
    // in the shard's release, derivable from `documents` directly
    "suffix_sharded_build" -> ((s, dir) => {
      val tbl = shardedSuffix48(s, dir)
      s.table(tbl).groupBy(col("shard"))
        .agg(count(lit(1)).as("n_suffixes"),
          countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(col("shard"))
    }),

    // the SHARDED index, built by the MAINTENANCE path (release 1
    // creates shard 0, release 2 folds in as shard 1 — only its own
    // docs ranked), then the repeated-window merge over the per-shard
    // dictionaries: counts sum by snippet equality across shards. The
    // oracle is the monolithic full-corpus statement — the sharded
    // derivation must land on EXACTLY the rebuild's rows
    "suffix_sharded_windows" -> ((s, dir) =>
      SuffixArray.repeatedWindowsSharded(s, shardedSuffix48(s, dir), 20)),

    // the excision position set derived cross-shard: globally-hot
    // snippets (doc counts summed over shards) select their per-shard
    // rank groups, one semi-join brings the positions back — pinned
    // EQUAL to the monolithic rank-table derivation
    "suffix_sharded_positions" -> ((s, dir) =>
      SuffixArray.repeatedPositionsSharded(s, shardedSuffix48(s, dir),
          t(s, dir, "documents"), "doc_id", "text", 48)
        .orderBy(col("doc_id"), col("pos"))),

    // the ExactSubstr cleaning step fed by the sharded derivation —
    // the whole dedup consumer chain must survive the shard split
    "suffix_sharded_excise" -> ((s, dir) =>
      SuffixArray.exciseRepeatedSharded(s, shardedSuffix48(s, dir),
          t(s, dir, "documents"), "doc_id", "text", 48)
        .orderBy(col("doc_id"))),

    // INTENT pin for the unigram-LM (SentencePiece-style) tokenizer
    // trainer: EM over the pinned vocabulary's segmentation lattices in
    // raw probability space (bit-identical op sequence to the independent
    // tools/unigram_reference.py — no log/exp), compared after a
    // 9-decimal round. The Spark path exercises the bounded vocab collect
    "unigram_tokenizer" -> ((s, dir) => {
      import s.implicits._
      val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
        ("widest", 3L), ("lowest", 4L)).toDF("word", "freq")
      Unigram.train(vocab, "word", "freq",
          maxLen = 4, seedSize = 30, emIters = 2, vocabSize = 15)
        .map { case (p, prob) =>
          (p, BigDecimal(prob).setScale(9, BigDecimal.RoundingMode.HALF_UP)
            .toDouble)
        }
        .toDF("piece", "prob")
        .orderBy(col("piece"))
    }),

    // Viterbi encodings of fixed words under the pinned model — the
    // native-expression DP (longest-last-piece tie rule, UNK singletons)
    // against the reference's segmentations
    "unigram_encode_pinned" -> ((s, dir) => {
      import s.implicits._
      val model = Unigram.trainLocal(
        Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
          ("widest", 3L), ("lowest", 4L)),
        maxLen = 4, seedSize = 30, emIters = 2, vocabSize = 15)
      Seq("lowest", "newest", "low", "wider", "newlow").toDF("word")
        .select(col("word"),
          array_join(Unigram.encode(col("word"), model, 4), " ").as("pieces"))
        .orderBy(col("word"))
    }),

    // split-leakage check (train/test hygiene): identical content assigned
    // to DIFFERENT splits — the digest groupBy is the exact-dedup shuffle
    // (32-byte keys) with a distinct-split count riding it; output is one
    // row per leaked content with its witness doc and spread. Runs over the
    // exact-dup corpus, where byte-copies under different ids land in
    // different hash-assigned splits by construction.
    "split_leakage" -> ((s, dir) =>
      Sampling.assignSplit(exactDupCorpus(s, dir), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 7)
        .groupBy(sha2(col("text").cast("binary"), 256).as("digest"))
        .agg(min(col("doc_id")).as("witness"),
          countDistinct(col("split")).as("n_splits"),
          count(lit(1)).as("n_docs"))
        .where(col("n_splits") > 1)
        .select(col("witness"), col("n_splits"), col("n_docs"))
        .orderBy(col("witness"))),

    "text_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        TextOps.fingerprint(col("text")).as("fingerprint"),
        TextOps.simHash(TextOps.tokenHashesWide(TextOps.tokens(col("text"))))
          .as("simhash"))
        .orderBy(col("doc_id"))),

    // winnowing fingerprint SELECTION (Schleimer et al. 2003, the MOSS
    // algorithm): per window of w=4 consecutive shingle hashes the minimum
    // is selected, ties to the RIGHTMOST — density 2/(w+1) with the
    // guarantee that any shared ≥ w+k−1-token run shares a fingerprint;
    // pure per-row HOF arithmetic, dual-rendered in the oracle
    "text_winnow" -> ((s, dir) =>
      t(s, dir, "documents").where(col("doc_id") < 100)
        .select(col("doc_id"), explode(TextOps.winnow(TextOps.shingleHashes(
          TextOps.tokenHashes(TextOps.tokens(col("text")))), 4)).as("s"))
        .select(col("doc_id"), col("s.pos").cast("long").as("pos"),
          col("s.fp").as("fp"))
        .orderBy(col("doc_id"), col("pos"), col("fp"))),

    // INTENT pin for the whole text-hash family (polyHash / wide prints /
    // shingles / MinHash bands / SimHash) over a pinned corpus, checked
    // against VALUES computed by an INDEPENDENT reimplementation
    // (tools/texthash_reference.py) — the corpus-scale queries share their
    // arithmetic with the dual-rendered oracles, so only this row can catch
    // wrong hash arithmetic itself
    "text_hash_pinned" -> ((s, dir) => {
      import s.implicits._
      val toks = TextOps.tokens(col("text"))
      Seq(
        (1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "héllo wörld 日本語 mixed"),
        (3L, "a b"),
        (4L, ""),
        (5L, "aa aa aa aa"))
        .toDF("case_id", "text")
        .withColumn("sh", TextOps.shingleHashes(TextOps.tokenHashes(toks)))
        .withColumn("sig", TextOps.minHashSignature(col("sh")))
        .select(
          col("case_id"),
          TextOps.polyHash(col("text")).as("fingerprint"),
          TextOps.simHash(TextOps.tokenHashesWide(toks)).as("simhash"),
          size(col("sh")).cast("bigint").as("n_shingles"),
          get(col("sh"), lit(0)).as("shingle_0"),
          TextOps.bandHash(col("sig"), 0).as("band_0"),
          TextOps.bandHash(col("sig"), 3).as("band_3"))
        .orderBy(col("case_id"))
    }),

    "text_quality" -> ((s, dir) => {
      val toks = TextOps.tokens(col("text"))
      val nTok = size(toks).cast("bigint")
      val punctRatio = TextOps.punctCount(col("text")).cast("double") /
        greatest(length(col("text")).cast("double"), lit(1.0))
      t(s, dir, "documents").select(
        col("doc_id"),
        (nTok >= 20 && nTok <= 1000 && punctRatio < 0.1).as("quality_ok"))
        .orderBy(col("doc_id"))
    }),

    // Gopher-style repetition gates: duplicate-token fraction + most-common-
    // bigram mass, BOTH as per-row projections (native one-pass max-
    // multiplicity expression) — the whole gate is map-side, no exchange;
    // the oracle still states the intent as unnest → two-level GROUP BY
    // the full Gopher repetition battery: top n-gram occurrence fraction
    // for n = 2, 3, 4 (token-granularity statement of Rae et al. 2021
    // Table A1's most-common-n-gram rules, thresholds 0.20/0.18/0.16) —
    // three native one-pass max-multiplicity projections over the shared
    // token-hash array, whole gate map-side, no exchange
    "quality_gopher_ngrams" -> ((s, dir) => {
      val toks = TextOps.tokens(col("text"))
      val th = TextOps.tokenHashes(toks)
      def frac(n: Int) =
        round(QualityOps.topElemFrac(TextOps.shingleHashes(th, n)), 6)
      t(s, dir, "documents").select(
        col("doc_id"),
        frac(2).as("top2_frac"), frac(3).as("top3_frac"),
        frac(4).as("top4_frac"))
        .withColumn("keep",
          col("top2_frac") <= 0.20 && col("top3_frac") <= 0.18 &&
            col("top4_frac") <= 0.16)
        .orderBy(col("doc_id"))
    }),

    "quality_repetition" -> ((s, dir) => {
      val toks = TextOps.tokens(col("text"))
      t(s, dir, "documents").select(
        col("doc_id"),
        size(toks).cast("bigint").as("n_toks"),
        size(array_distinct(toks)).cast("bigint").as("n_uniq"),
        TextOps.shingleHashes(TextOps.tokenHashes(toks), 2).as("bgs"))
        .where(col("n_toks") >= 2)
        .select(col("doc_id"),
          (lit(1.0) - col("n_uniq").cast("double") / col("n_toks").cast("double"))
            .as("dup_token_frac"),
          QualityOps.topElemFrac(col("bgs")).as("top_bigram_frac"))
        .orderBy(col("doc_id"))
    }),

    // trained k-means partitioner (2 Lloyd rounds, k=4) over the embedding
    // corpus: assignment is a map-side literal-centroid projection (zero
    // shuffle), each update is one posexplode + (cluster, dim) aggregation
    // whose means ride exact integer micro-unit sums — associative, so
    // bit-identical in any partitioning. The oracle derives the SAME
    // training independently in DuckDB (cross-join argmin + unnest means)
    // MMR diversified top-k (Carbonell & Goldstein 1998): greedy
    // relevance-vs-redundancy selection over a bounded overfetch
    // shortlist — plain top-k returns k copies of the same popular
    // passage, MMR returns one plus its best alternatives; the oracle
    // replays all five greedy steps as unrolled CTEs with the same
    // sequential-fold cosine, so every comparison is bit-identical
    "ann_mmr_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val qv = emb.where(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0)
      operators.Similarity.mmrTopK(emb.where(col("vec_id") > 0),
          "vec_id", "embedding", qv, k = 5, lambda = 0.5, overfetch = 16)
        .orderBy(col("rank"))
    }),

    // the pooled vectors are RETRIEVAL inputs, composed end-to-end: chunk
    // embeddings -> unit mean-pool per doc -> exact cosine top-k of doc 0
    // against every other pooled doc — pooling, normalization, and
    // ranking all load-bearing in one plan; ties (if any) break by id
    "embed_pooled_topk" -> ((s, dir) => {
      val pooled = operators.Pooling.meanPoolNormalized(
        t(s, dir, "embeddings"), col("vec_id") % 100, col("embedding"))
      val q = pooled.where(col("key") === 0)
        .select(col("vec").as("__qv"))
      // the native cosine expression is float-typed; pooled vectors are
      // doubles, so the ranking uses the same sequential HOF folds the
      // SQL rendering states (left-to-right dot and norms)
      def seqSum(a: org.apache.spark.sql.Column) =
        aggregate(a, lit(0.0), (s, v) => s + v)
      def cosD(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
        val dot = seqSum(zip_with(a, b, (x, y) => x * y))
        val den = sqrt(seqSum(transform(a, x => x * x))) *
          sqrt(seqSum(transform(b, x => x * x)))
        when(den === 0.0, lit(0.0)).otherwise(dot / den)
      }
      pooled.where(col("key") > 0).crossJoin(broadcast(q))
        .select(col("key"),
          round(cosD(col("vec"), col("__qv")), 6).as("cosine"))
        .orderBy(col("cosine").desc, col("key"))
        .limit(10)
        .orderBy(col("key"))
    }),

    // chunk->document mean-pooling (the Sentence-BERT/E5 aggregation):
    // element-wise mean per key over micro-unit INTEGER sums (the KMeans
    // trick — exact long arithmetic, order-independent where a double sum
    // is partition-order-dependent), division in the fixed order
    // sum/count/unit mirrored by the oracle; output flattened to
    // (key, pos, value) rows per house convention
    "embed_mean_pool" -> ((s, dir) =>
      operators.Pooling.meanPool(t(s, dir, "embeddings"),
          col("vec_id") % 100, col("embedding"))
        .select(col("key"), col("n_chunks"),
          posexplode(col("vec")).as(Seq("pos", "m")))
        .select(col("key"), col("n_chunks"),
          col("pos").cast("long").as("pos"), round(col("m"), 6).as("m"))
        .orderBy(col("key"), col("pos"))),

    // + unit-length normalization (cosine against a pooled vector must
    // not reward chunk count); the norm is the same sequential fold over
    // the same pooled doubles on both engines, so the per-element
    // division is bit-identical before rounding
    "embed_mean_pool_unit" -> ((s, dir) =>
      operators.Pooling.meanPoolNormalized(t(s, dir, "embeddings"),
          col("vec_id") % 100, col("embedding"))
        .select(col("key"), col("n_chunks"),
          posexplode(col("vec")).as(Seq("pos", "m")))
        .select(col("key"), col("n_chunks"),
          col("pos").cast("long").as("pos"), round(col("m"), 6).as("m"))
        .orderBy(col("key"), col("pos"))),

    "kmeans_train" -> ((s, dir) =>
      operators.KMeans.centroidsDF(t(s, dir, "embeddings"), "vec_id",
          "embedding", k = 4, iters = 2)
        .select(col("cluster"), col("pos"),
          round(col("centroid"), 6).as("centroid"))
        .orderBy(col("cluster"), col("pos"))),

    // final cluster assignment against the trained centroids — the IVF /
    // SemDeDup partitioner upgraded from seed centroids to trained ones
    "kmeans_assign" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cents = operators.KMeans.train(emb, "vec_id", "embedding",
        k = 4, iters = 2)
      operators.KMeans.assign(emb, "vec_id", "embedding", cents)
        .select(col("cid").as("vec_id"), col("cluster").cast("long").as("cluster"))
        .orderBy(col("vec_id"))
    }),

    // the dataset card a corpus release ships with, as ONE query: corpus
    // size, language/source spread, token volume, exact-duplication rate —
    // every stat integer-exact (no float reduction order anywhere), the
    // base stats riding one documents scan + one aggregation, the dup
    // count riding the digest shuffle, combined by a 1-row×1-row cross
    // join (driver-bounded by construction)
    "corpus_card" -> ((s, dir) => {
      val toks = TextOps.tokens(col("text"))
      val base = t(s, dir, "documents").agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"),
        sum(size(toks).cast("long")).as("sum_tokens"),
        sum(col("n_chars").cast("long")).as("sum_chars"),
        max(size(toks).cast("long")).as("max_doc_tokens"))
      val dups = Dedup.exact(t(s, dir, "documents"), "doc_id", "text")
        .where(col("n_dups") > 1)
        .agg(count(lit(1)).as("n_dup_groups"),
          coalesce(sum(col("n_dups") - 1), lit(0L)).as("n_redundant_docs"))
      base.crossJoin(dups)
    }),

    // release-to-release corpus DIFF — the BDE diff engine (null-safe
    // full-outer classify, the reference's E3 arm) applied to corpus
    // versioning: which documents a new release added, removed, or
    // changed. "Old" = docs whose id is 0 mod 3 dropped and text
    // truncated for ids 1 mod 7 — a deterministic mutation both engines
    // restate. One full-outer join on the key, counts by action
    "corpus_release_diff" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val old = d.where(pmod(col("doc_id"), lit(3)) =!= 0)
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(7)) === 1,
            substring(col("text"), 1, 20)).otherwise(col("text")).as("text"))
      Diff.fullDiff(old, d, "doc_id")
        .groupBy(col("action")).agg(count(lit(1)).as("n"))
        .orderBy(col("action"))
    }),

    // release MANIFEST: the content-addressed identity of a corpus
    // version — doc count, token volume, and an ORDER-INDEPENDENT content
    // fingerprint (bit_xor of 62-bit per-doc rolling hashes: XOR is
    // associative+commutative and overflow-free, so the fingerprint is
    // identical under any partitioning/row order — exactly what a
    // reproducibility check between two pipeline runs needs). One scan,
    // one aggregate
    "corpus_manifest" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("text"),
          size(TextOps.tokens(col("text"))).cast("long").as("ntok"),
          TextOps.wideFingerprint(col("text")).as("fp"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ntok")).as("sum_tokens"),
          expr("bit_xor(fp)").as("content_fp"))),

    // hard-NEGATIVE mining for contrastive training: per probe vector,
    // the 3 most-similar corpus vectors with a DIFFERENT label (similar
    // but not same-class — the negatives that matter). Broadcast probes,
    // label inequality inside the join, bounded top-k aggregate
    "ann_hard_negatives" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = broadcast(emb.where(col("vec_id") < 8).select(
        col("vec_id").cast("long").as("query_id"),
        col("embedding").as("qv"), col("label").as("qlabel")))
      val topk = Similarity.topKUdaf(3)
      emb.select(col("vec_id").cast("long").as("neighbor_id"),
          col("embedding").as("cv"), col("label").as("clabel"))
        .join(q, col("neighbor_id") =!= col("query_id") &&
          col("clabel") =!= col("qlabel"))
        .select(col("query_id"), col("neighbor_id"),
          VectorOps.cosine(col("qv"), col("cv")).as("cosine"))
        .groupBy(col("query_id"))
        .agg(topk(col("cosine"), col("neighbor_id")).as("tk"))
        .select(col("query_id"), explode(col("tk.items")).as("nb"))
        .select(col("query_id"), col("nb._2").as("neighbor_id"),
          round(col("nb._1"), 6).as("cosine"))
        .orderBy(col("query_id"), col("neighbor_id"))
    }),

    // INTENT pin for the ppm drift arithmetic: a hand-computable two-slice
    // corpus (A: 4×a+4×b, B: 6×a+2×c → Δppm 250k/500k/250k → TVD 500000)
    // with the expected row as literal VALUES — the dataset-scale rows
    // share their arithmetic with the dual rendering; only this can catch
    // a shared misunderstanding
    "drift_pinned" -> ((s, dir) => {
      import s.implicits._
      val a = Seq((1L, "a a b b"), (2L, "a a b b")).toDF("id", "text")
      val b = Seq((3L, "a a a c"), (4L, "a a a c")).toDF("id", "text")
      operators.Drift.summary(a, b, "text")
    }),

    // INTENT pin for the budget walk: hand-derived admissions at budget
    // 950 over four score buckets (300+400 fit whole; the 0.5 bucket's
    // remaining 250 admits id 4 only; id 6 would fit but the prefix rule
    // is maximal) — literal expected ids in the oracle
    "selection_pinned" -> ((s, dir) => {
      import s.implicits._
      val docs = Seq(
        (1L, 0.9, 100L), (2L, 0.9, 200L), (3L, 0.8, 400L),
        (4L, 0.5, 250L), (5L, 0.5, 250L), (6L, 0.1, 50L))
        .toDF("id", "score", "ntok")
      operators.Selection.selectTokenBudget(docs, "id", col("score"),
          col("ntok"), budget = 950L)
        .select(col("id"), col("n_tokens"))
        .orderBy(col("id"))
    }),

    // corpus drift monitoring between two slices (here a deterministic
    // 50/50 hash split standing in for yesterday-vs-today): one-row
    // summary with the unigram total-variation distance in integer ppm
    // units — exact in both engines at any corpus size (a double sum
    // would be combine-order-dependent; a count cross-product would
    // overflow past ~3e9 tokens/side)
    "corpus_drift" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val h = Sampling.hash16(col("doc_id"), 13)
      Drift.summary(d.where(h < 32768), d.where(h >= 32768), "text")
    }),

    // the 15 tokens whose frequency moved most between the slices —
    // bounded TakeOrderedAndProject, never a global sort
    "drift_top_tokens" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val h = Sampling.hash16(col("doc_id"), 13)
      Drift.topDrift(d.where(h < 32768), d.where(h >= 32768), "text", 15)
        .orderBy(col("drift_ppm").desc, col("token"))
    }),

    // INTENT-pinned URL canonicalization (web-corpus key normalization):
    // literal inputs, hand-derived expected outputs in the oracle — no
    // second rendering to echo a regex mistake. Covers scheme/host case,
    // default ports, fragments, tracking params, separator repair,
    // trailing slash, and the no-scheme passthrough
    "url_pinned" -> ((s, dir) => {
      import s.implicits._
      Seq(
        (1L, "HTTPS://Example.COM/Path/?utm_source=x&q=1#frag"),
        (2L, "http://site.org:80/a"),
        (3L, "https://site.org:443/"),
        (4L, "https://a.b/c?fbclid=123"),
        (5L, "https://a.b/c?x=1&utm_medium=m&y=2"),
        (6L, "HTTP://WWW.Ex.com:80/?utm_campaign=a"),
        (7L, "https://a.b/path"),
        (8L, "ftp://Host.Com/File"),
        (9L, "no-scheme/relative/"))
        .toDF("case_id", "url")
        .select(col("case_id"),
          functions.UrlOps.normalizeUrl(col("url")).as("canonical_url"))
        .orderBy(col("case_id"))
    }),

    // URL-keyed dedup on the canonical key: page copies under scheme/case/
    // port/tracking variants collapse to the lowest id — same min_by keep
    // rule as content dedup (hot URLs never funnel into one window task)
    "url_dedup_pinned" -> ((s, dir) => {
      import s.implicits._
      val pages = Seq(
        (1L, "https://example.com/a?utm_source=t"),
        (2L, "https://EXAMPLE.com/a"),
        (3L, "https://example.com:443/a"),
        (4L, "http://other.org/"),
        (5L, "http://other.org:80"),
        (6L, "https://unique.net/x")).toDF("doc_id", "url")
      functions.UrlOps.urlDedup(pages, "doc_id", "url")
        .select(col("doc_id"), col("canonical_url"))
        .orderBy(col("doc_id"))
    }),

    // domain blocklist filtering (RefinedWeb URL filtering): drop every
    // page whose host is a blocked domain or any subdomain of one —
    // host extraction + suffix expansion are per-row projections and the
    // match is a map-side arrays_overlap against the blocklist literal
    // (zero Exchange; the oracle re-derives the host independently and
    // states the suffix rule as EXISTS over LIKE patterns)
    "filter_domain_blocklist" -> ((s, dir) => {
      val docs = t(s, dir, "documents").withColumn("url",
        concat(lit("https://"), col("lang"), lit("."), col("source"),
          lit(".example.com/p/"), col("doc_id").cast("string")))
      Domains.blocklistFilter(docs, "url",
        Seq("src3.example.com", "de.src7.example.com", "example.org"))
        .select(col("doc_id"), col("host"))
        .orderBy(col("doc_id"))
    }),

    // domain-level quality pruning: drop ENTIRE hosts whose mean
    // tokens/doc falls below threshold — one host-sized aggregate whose
    // mean rides an exact integer sum divided once (combine-order
    // independent), broadcast back onto the corpus
    "domain_quality_prune" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("url",
          concat(lit("https://"), col("lang"), lit("."), col("source"),
            lit(".example.com/p/"), col("doc_id").cast("string")))
        .withColumn("ntok", size(functions.TextOps.tokens(col("text"))))
      Domains.domainQualityPrune(docs, "url", "ntok", minMeanTokens = 50.0)
        .select(col("doc_id"), col("host"), col("domain_mean_tokens"))
        .orderBy(col("doc_id"))
    }),

    // INTENT-pinned k-means: a 5-point, 2-blob dataset whose 2-round Lloyd
    // trajectory (seeds in one blob, recovery by the mean update) is
    // hand-derived — the literal oracle VALUES catch a shared
    // misunderstanding the dual independent renderings cannot
    "kmeans_pinned" -> ((s, dir) => {
      import s.implicits._
      val pts = Seq(
        (1L, Seq(0f, 0f)), (2L, Seq(1f, 0f)),
        (3L, Seq(10f, 10f)), (4L, Seq(11f, 10f)), (5L, Seq(10f, 11f)))
        .toDF("vec_id", "embedding")
      operators.KMeans.centroidsDF(pts, "vec_id", "embedding", k = 2, iters = 2)
        .select(col("cluster"), col("pos"),
          round(col("centroid"), 6).as("centroid"))
        .orderBy(col("cluster"), col("pos"))
    }),

    // hand-derived PQ pin: 2 subspaces x 2 codewords over 4 vectors built
    // from 2 distinct subvectors per subspace — codebooks converge to the
    // subvectors exactly, so the quantized ADC distances are the true
    // squared-L2 in micro-units (128 and 256 x 2^20, derived by hand in
    // PqSpec); literal VALUES catch a shared misunderstanding the dual
    // renderings cannot
    "pq_pinned" -> ((s, dir) => {
      import s.implicits._
      val pts = Seq(
        (0L, Seq(0f, 0f, 9f, 9f)), (1L, Seq(0f, 0f, 1f, 1f)),
        (2L, Seq(8f, 8f, 9f, 9f)), (3L, Seq(8f, 8f, 1f, 1f)))
        .toDF("vec_id", "embedding")
      operators.Pq.adcTopK(pts, pts.where(col("vec_id") === 0L),
          "vec_id", "embedding", m = 2, ksub = 2, iters = 2, k = 3)
        .orderBy(col("neighbor_id"))
    }),

    // IVF over TRAINED cells — the seam ann_ivf_topk's seed centroids
    // leave open, exercised end-to-end: train 4 L2 cells (2 Lloyd rounds),
    // probe each query's 2 nearest cells, exact squared-L2 top-5 on the
    // cluster-co-located candidates
    "ann_ivf_trained" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      operators.KMeans.ivfTopK(emb, emb.where(col("vec_id") < 8),
          "vec_id", "embedding", kClusters = 4, iters = 2, nprobe = 2, k = 5)
        .select(col("query_id"), col("neighbor_id"),
          round(col("l2sq"), 6).as("l2sq"))
        .orderBy(col("query_id"), col("neighbor_id"))
    }),

    // product-quantization ADC search: 4 subspaces × 8 codewords trained
    // by the deterministic Lloyd trainer, corpus encoded to 4 small codes
    // per vector (map-side), queries ranked by the integer micro-unit
    // asymmetric distance — broadcast lookup table, associative BIGINT
    // sum, (adc, id) total order
    "ann_pq_adc" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      operators.Pq.adcTopK(emb, emb.where(col("vec_id") < 4),
          "vec_id", "embedding", m = 4, ksub = 8, iters = 2, k = 5)
        .orderBy(col("query_id"), col("neighbor_id"))
    }),

    // IVF-PQ (FAISS IndexIVFPQ arrangement): coarse 4-cell quantizer,
    // residual product codes (4 subspaces x 8 codewords), nprobe=2 probe
    // with per-cell query residuals, integer micro-unit ADC ranking
    "ann_ivfpq_adc" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      operators.IvfPq.topK(emb, emb.where(col("vec_id") < 4),
          "vec_id", "embedding", nCells = 4, m = 4, ksub = 8, iters = 2,
          nprobe = 2, k = 5)
        .orderBy(col("query_id"), col("neighbor_id"))
    }),

    // IVF-PQ through the PERSISTED index (FAISS IndexIVFPQ at rest): codes
    // partitioned by coarse cell + centroid/codebook companions, written
    // once; the batch appended with FIXED quantizers (IndexIVFPQ.add); the
    // probe partition-prunes to its nprobe cells and ranks by the same
    // broadcast-LUT integer ADC. train = the full corpus (the FAISS
    // train/add split), base = even ids, append = odd ids — so the probe
    // must equal ann_ivfpq_adc's full-corpus rescan exactly, which is what
    // the shared oracle states
    "ann_ivfpq_indexed" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val path = s"$indexDbDir/ivfpq_index"
      operators.IvfPq.writeIvfPqIndex(emb.where(col("vec_id") % 2 === 0),
        "vec_id", "embedding", path, nCells = 4, m = 4, ksub = 8, iters = 2,
        train = Some(emb))
      operators.IvfPq.appendIvfPqIndex(emb.where(col("vec_id") % 2 === 1),
        "vec_id", "embedding", path)
      operators.Bucketing.compactPartitioned(s, path, "cluster")
      operators.IvfPq.topKIndexed(s, path, emb.where(col("vec_id") < 4),
          "vec_id", "embedding", nprobe = 2, k = 5)
        .orderBy(col("query_id"), col("neighbor_id"))
    }),

    // the FAISS "OPQ,IVF,PQ" at-rest arrangement, plumbing-pinned: the
    // rotation persists as the index's fourth companion and every door
    // (build, append, probe) applies it map-side — with the IDENTITY
    // rotation the whole lifecycle must reproduce the un-rotated
    // ann_ivfpq_indexed rows bit for bit (the shared rescan oracle)
    "ann_opq_ivfpq_indexed" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val path = s"$indexDbDir/opq_ivfpq_index"
      val eye = Array.tabulate(64, 64)((i, j) => if (i == j) 1.0 else 0.0)
      operators.IvfPq.writeIvfPqIndexRotated(
        emb.where(col("vec_id") % 2 === 0), "vec_id", "embedding", path,
        nCells = 4, m = 4, ksub = 8, iters = 2, rotation = eye,
        train = Some(emb))
      operators.IvfPq.appendIvfPqIndex(emb.where(col("vec_id") % 2 === 1),
        "vec_id", "embedding", path)
      operators.Bucketing.compactPartitioned(s, path, "cluster")
      operators.IvfPq.topKIndexed(s, path, emb.where(col("vec_id") < 4),
          "vec_id", "embedding", nprobe = 2, k = 5)
        .orderBy(col("query_id"), col("neighbor_id"))
    }),

    // the composed gauge at full depth: recall@10 of the at-rest
    // OPQ,IVF,PQ index (rotation persisted with the index, applied to
    // probes) vs the plain in-session IVF-PQ on the rank-1-correlated
    // corpus, both against exact L2. The rotation is the SEEDED
    // deterministic one so the row is value-pinned: the oracle restates
    // the whole rotated chain with the matrix as literals
    "ann_opq_ivfpq_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val mean = aggregate(col("embedding"), lit(0.0),
        (a, x) => a + x.cast("double")) / lit(64.0)
      val corr = emb.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double") + mean)
          .as("embedding")).localCheckpoint(true)
      val q = corr.where(col("vec_id") < 32)
      val r = opqGaugeRotation
      val path = s"$indexDbDir/opq_ivfpq_recall_index"
      operators.IvfPq.writeIvfPqIndexRotated(corr, "vec_id", "embedding",
        path, nCells = 4, m = 4, ksub = 8, iters = 2, rotation = r)
      val opq = operators.IvfPq.topKIndexed(s, path, q,
        "vec_id", "embedding", nprobe = 2, k = 10)
      val plain = operators.IvfPq.topK(corr, q, "vec_id", "embedding",
        nCells = 4, m = 4, ksub = 8, iters = 2, nprobe = 2, k = 10)
      val exact = exactL2TopK(corr, q, 10)
      operators.Similarity.recallAtK(opq, exact)
        .select(col("query_id"), col("n_hit").as("n_hit_opq"),
          round(col("recall"), 6).as("recall_opq"))
        .join(operators.Similarity.recallAtK(plain, exact)
          .select(col("query_id"), col("n_hit").as("n_hit_pq"),
            round(col("recall"), 6).as("recall_pq")), Seq("query_id"))
        .orderBy(col("query_id"))
    }),

    // recall@5 of the nprobe=2 trained-IVF search against the exhaustive
    // nprobe=4 (all cells = exact) reference — the quality gauge for the
    // probe-cost/recall trade, per query
    "ann_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") < 8)
      // train ONCE; the approximate arm and the exact all-cells reference
      // probe the same cells
      val cents = operators.KMeans.train(emb, "vec_id", "embedding",
        k = 4, iters = 2)
      def ivf(np: Int) = operators.KMeans.ivfTopKWithCentroids(cents, emb, q,
        "vec_id", "embedding", nprobe = np, k = 5)
      operators.Similarity.recallAtK(approx = ivf(2), exact = ivf(4))
        .select(col("query_id"), col("n_hit"), round(col("recall"), 6).as("recall"))
        .orderBy(col("query_id"))
    }),

    // recall@5 of the 16x-compressed PQ-ADC ranking against exact
    // brute-force squared-L2 (broadcast queries, one native-fold distance
    // per pair, per-query top-k) — the compression/recall gauge for the
    // code budget (m x ksub), per query
    "ann_pq_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") < 8)
      val approx = operators.Pq.adcTopK(emb, q, "vec_id", "embedding",
        m = 4, ksub = 8, iters = 2, k = 5)
      val exact = exactL2TopK(emb, q, 5)
      operators.Similarity.recallAtK(approx, exact)
        .select(col("query_id"), col("n_hit"), round(col("recall"), 6).as("recall"))
        .orderBy(col("query_id"))
    }),

    // OPQ plumbing pin: the full rotation path (literal matrix-vector
    // product per row) with ZERO alternations — R = I — must reproduce
    // plain PQ-ADC bit for bit (identical codebook training, identical
    // integer ADC); the oracle is the PQ rescan SQL. The trained-
    // rotation arm is gauged by ann_opq_recall
    "ann_opq_roundtrip" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      operators.Opq.adcTopK(emb, emb.where(col("vec_id") < 4),
          "vec_id", "embedding", m = 4, ksub = 8, iters = 2, k = 5,
          itersOpq = 0)
        .orderBy(col("query_id"), col("neighbor_id"))
    }),

    // the OPQ pipeline gauge (Ge et al. 2013 machinery): recall@10 of
    // PQ-ADC in the rotated space vs plain PQ-ADC, both against exact
    // brute-force L2, side by side per query, on the rank-1-correlated
    // corpus (each vector + its own mean). The rotation is the SEEDED
    // deterministic Givens product — pinned bit-for-bit against
    // tools/opq_reference.py — so this row carries a full VALUE oracle
    // (the matrix renders into the SQL as literals); a non-trivial
    // dense rotation through the whole train/encode/rank chain catches
    // transposition and fold-order drift the R = I roundtrip cannot.
    // The TRAINED rotation's recall advantage is asserted in OpqSpec
    "ann_opq_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val mean = aggregate(col("embedding"), lit(0.0),
        (a, x) => a + x.cast("double")) / lit(64.0)
      val corr = emb.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double") + mean)
          .as("embedding"))
      val q = corr.where(col("vec_id") < 32)
      val exact = exactL2TopK(corr, q, 10)
      val opq = operators.Opq.adcTopKRotated(corr, q, "vec_id", "embedding",
        m = 4, ksub = 8, iters = 2, k = 10, rotation = opqGaugeRotation)
      val pq = operators.Pq.adcTopK(corr, q, "vec_id", "embedding",
        m = 4, ksub = 8, iters = 2, k = 10)
      operators.Similarity.recallAtK(opq, exact)
        .select(col("query_id"), col("n_hit").as("n_hit_opq"),
          round(col("recall"), 6).as("recall_opq"))
        .join(operators.Similarity.recallAtK(pq, exact)
          .select(col("query_id"), col("n_hit").as("n_hit_pq"),
            round(col("recall"), 6).as("recall_pq")), Seq("query_id"))
        .orderBy(col("query_id"))
    }),

    // recall@5 of the COMPOSED IVF-PQ arm (coarse pruning AND residual-
    // code compression losing accuracy together) against exact
    // brute-force squared-L2 — the gauge for the full billion-scale
    // configuration, complementing ann_recall (pruning only) and
    // ann_pq_recall (compression only)
    "ann_ivfpq_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") < 8)
      val approx = operators.IvfPq.topK(emb, q, "vec_id", "embedding",
        nCells = 4, m = 4, ksub = 8, iters = 2, nprobe = 2, k = 5)
      val exact = exactL2TopK(emb, q, 5)
      operators.Similarity.recallAtK(approx, exact)
        .select(col("query_id"), col("n_hit"), round(col("recall"), 6).as("recall"))
        .orderBy(col("query_id"))
    }),

    // the REFINE stage (FAISS RFlat): the IVF-PQ arm overfetches a 4x
    // shortlist (k'=20), and the refine re-ranks ONLY those candidates
    // with exact micro-unit squared-L2 against the raw parquet vectors —
    // the corpus is probed by one broadcast-shortlist hash join, never
    // rescanned. The oracle restates shortlist + rescore independently
    "ann_ivfpq_refine" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") < 4)
      val shortlist = operators.IvfPq.topK(emb, q, "vec_id", "embedding",
        nCells = 4, m = 4, ksub = 8, iters = 2, nprobe = 2, k = 20)
      operators.Similarity.refineTopK(shortlist, emb, q,
          "vec_id", "embedding", k = 5)
        .orderBy(col("query_id"), col("d_micro"), col("neighbor_id"))
    }),

    // the refine-vs-plain quality gauge: recall@5 of the refined
    // 4x-overfetched IVF-PQ arm NEXT TO the un-refined ADC top-5, both
    // against exact L2 — refinement must buy back ADC mis-rankings
    // inside the shortlist (it can only reorder candidates the coarse
    // arm surfaced, so refine recall ≥ plain recall per construction
    // whenever the shortlist contains the ADC top-5, which k'=4k makes
    // overwhelmingly likely; the gauge MEASURES it per query)
    "ann_refine_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") < 8)
      val shortlist = operators.IvfPq.topK(emb, q, "vec_id", "embedding",
        nCells = 4, m = 4, ksub = 8, iters = 2, nprobe = 2, k = 20)
      val refined = operators.Similarity.refineTopK(shortlist, emb, q,
        "vec_id", "embedding", k = 5)
      val plain = operators.IvfPq.topK(emb, q, "vec_id", "embedding",
        nCells = 4, m = 4, ksub = 8, iters = 2, nprobe = 2, k = 5)
      val exact = exactL2TopK(emb, q, 5)
      operators.Similarity.recallAtK(refined, exact)
        .select(col("query_id"), col("n_hit").as("n_hit_refine"),
          round(col("recall"), 6).as("recall_refine"))
        .join(operators.Similarity.recallAtK(plain, exact)
          .select(col("query_id"), col("n_hit").as("n_hit_pq"),
            round(col("recall"), 6).as("recall_pq")), Seq("query_id"))
        .orderBy(col("query_id"))
    }),

    // salted two-stage aggregation over the MOST skewed key in the data
    // (5 event_type values carry the whole stream — an unsalted groupBy
    // runs 5 reducer tasks however wide the cluster): partials group on
    // (key, salt-of-row), finals merge ≤ 5×16 rows per key. The sum rides
    // integer micro-units so the two-stage recomposition is bit-exact in
    // any grouping order; results provably equal the unsalted plan
    // (SaltingSpec pins that, and the oracle is the plain one-stage SQL)
    "salted_agg" -> ((s, dir) => {
      val ev = events(s, dir)
        .withColumn("value_micro", floor(col("value") * 1e6).cast("long"))
      Salting.aggregate(ev, Seq("event_type"), salts = 16,
          Seq(Salting.Agg("count", "event_type", "n_events"),
            Salting.Agg("sum", "value_micro", "sum_value_micro"),
            Salting.Agg("max", "value_micro", "max_value_micro")))
        .orderBy(col("event_type"))
    }),

    // salted replicated join: documents probe a per-lang dimension too
    // skewed to shuffle-join plainly ('en' holds ~44% of the corpus — one
    // reducer would carry half the probe rows); the dim replicates ×8 with
    // a salt and each probe row joins its single salted copy. Values are
    // pinned equal to the plain join by the oracle
    "salted_join" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val dim = docs.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_lang_docs"),
          sum(col("n_chars")).as("lang_chars"))
      Salting.join(docs.select(col("doc_id"), col("lang")), dim,
          Seq("lang"), salts = 8)
        .select(col("doc_id"), col("lang"), col("n_lang_docs"),
          col("lang_chars"))
        .orderBy(col("doc_id"))
    }),

    // bucketed-at-rest co-located join: both sides written bucketBy(8, key)
    // + sortBy, then joined with ZERO exchange (PlanAuditSpec pins the
    // shuffle-free plan; this row pins the values)
    "bucketed_join" -> ((s, dir) => {
      val wh = new java.io.File(
        System.getProperty("java.io.tmpdir"), "graft_bkt_wh").getAbsolutePath
      Bucketing.scratchDb(s, "graft_bkt", wh)
      Bucketing.writeBucketed(
        t(s, dir, "documents").select(col("doc_id"), col("lang"), col("source")),
        "graft_bkt.docs_bkt", "doc_id", 8)
      Bucketing.writeBucketed(
        t(s, dir, "embeddings")
          .select(col("vec_id").as("doc_id"), col("label")),
        "graft_bkt.emb_bkt", "doc_id", 8)
      Bucketing.join(s, "graft_bkt.docs_bkt", "graft_bkt.emb_bkt", "doc_id")
        .select(col("doc_id"), col("lang"), col("label"))
        .orderBy(col("doc_id"))
    }),

    // partitioned-at-rest scan pruning: documents written partitionBy(lang)
    // once, then a lang-filtered aggregate reads ONLY the matching
    // partition directory (PartitionFilters pinned in PlanAuditSpec)
    "partitioned_scan" -> ((s, dir) => {
      val out = new java.io.File(
        System.getProperty("java.io.tmpdir"), "graft_part_docs").getAbsolutePath
      Bucketing.writePartitioned(t(s, dir, "documents"), out, "lang")
      s.read.parquet(out).where(col("lang") === "en")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("source"))
    }),

    // the composed preprocessing pipeline, end to end: language filter →
    // composite quality gate → exact dedup (keep-first) → deterministic
    // split assignment → per-split corpus accounting. Every stage is one of
    // the operators above; the whole flow is ONE declarative plan — a single
    // scan, map-side filters/score/hash, one digest shuffle (dedup), one
    // aggregation — which is exactly how it would run over 100 TB.
    // the curation ATTRITION report — per-stage cumulative survival
    // through language gate -> quality gate -> exact dedup (the release
    // accounting every pipeline publishes): gate flags compute in ONE
    // scan, the dedup winner adds the one digest shuffle, and all stage
    // counts ride a single conditional aggregate
    "pipeline_attrition" -> ((s, dir) => {
      import s.implicits._
      val toks = TextOps.tokens(col("text"))
      // cached: the flag projection (tokenize + langId + quality model +
      // sha2 — the plan's dominant CPU) feeds both the winners aggregate
      // and the probe side of the join; sums coalesce so an empty corpus
      // reports honest zeros instead of NULL-unboxing
      val flagged = t(s, dir, "documents")
        .select(col("doc_id"),
          (TextOps.langId(toks) === "en").as("f_lang"),
          (QualityOps.qualityScore(col("text"), toks) >= 0.5).as("f_q"),
          sha2(col("text").cast("binary"), 256).as("dg"))
        .withColumn("s_lang", col("f_lang"))
        .withColumn("s_qual", col("f_lang") && col("f_q"))
        .cache()
      val winners = flagged.where(col("s_qual"))
        .groupBy(col("dg")).agg(min(col("doc_id")).as("__w"))
      val row = try {
        flagged
          .join(winners, Seq("dg"), "left_outer")
          .agg(count(lit(1)).as("n"),
            coalesce(sum(when(col("s_lang"), 1L).otherwise(0L)), lit(0L))
              .as("a"),
            coalesce(sum(when(col("s_qual"), 1L).otherwise(0L)), lit(0L))
              .as("b"),
            coalesce(sum(when(col("s_qual") && col("doc_id") === col("__w"),
              1L).otherwise(0L)), lit(0L)).as("c"))
          .head()
      } finally flagged.unpersist()
      Seq((1L, "all", row.getLong(0)), (2L, "lang_en", row.getLong(1)),
        (3L, "quality", row.getLong(2)), (4L, "dedup", row.getLong(3)))
        .toDF("stage", "gate", "n_surviving")
        .orderBy(col("stage"))
    }),

    "pipeline_e2e" -> ((s, dir) => {
      val toks = TextOps.tokens(col("text"))
      val base = t(s, dir, "documents")
        .where(TextOps.langId(toks) === "en" &&
          QualityOps.qualityScore(col("text"), toks) >= 0.5)
      val deduped = Dedup.keepFirst(base, "doc_id", "text")
      Sampling.assignSplit(deduped, "doc_id",
          Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05), seed = 3)
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(toks).cast("long")).as("sum_tokens"))
        .orderBy(col("split"))
    }),

    // the MODERN curation pipeline, end to end, composing this round's
    // operators: Gopher n-gram repetition gate (map-side native
    // projections) → CCNet perplexity tercile (broadcast model + two
    // collected thresholds; tail third drops) → exact keep-first dedup
    // (digest shuffle) → LSH near-dup keep (banded self-join) →
    // quality-weighted Bernoulli thinning (map-side hash) → deterministic
    // split + per-split accounting. ONE declarative plan: a scan,
    // map-side gates, one digest shuffle, one bands join, one final
    // aggregate — the 100 TB DAG as written.
    "pipeline_curation" -> ((s, dir) => {
      val toks = TextOps.tokens(col("text"))
      val th = TextOps.tokenHashes(toks)
      def frac(n: Int) =
        round(QualityOps.topElemFrac(TextOps.shingleHashes(th, n)), 6)
      val docs = t(s, dir, "documents")
      val buckets = operators.Perplexity.pplBuckets(docs, "doc_id", "text",
        col("lang") === "en").select(col("doc_id"), col("bucket"))
      val gated = docs
        .where(frac(2) <= 0.20 && frac(3) <= 0.18 && frac(4) <= 0.16)
        .join(buckets, Seq("doc_id"))
        .where(col("bucket") =!= "tail")
        .select(col("doc_id"), col("text"))
      val exactDeduped = Dedup.keepFirst(gated, "doc_id", "text")
      val nearDeduped = Dedup.minHashKeep(exactDeduped, "doc_id", "text", 0.7)
      val thinned = Sampling.byQuality(nearDeduped, "doc_id",
        QualityOps.qualityScore(col("text"), toks), seed = 17)
      Sampling.assignSplit(thinned, "doc_id",
          Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05), seed = 3)
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(toks).cast("long")).as("sum_tokens"),
          min(col("doc_id")).as("min_id"))
        .orderBy(col("split"))
    }),

    // composite quality score: C4/Gopher-style gates folded into one
    // map-side double; keep = score >= 0.5 on the UNROUNDED value
    "quality_score" -> ((s, dir) => {
      val toks = TextOps.tokens(col("text"))
      val score = QualityOps.qualityScore(col("text"), toks)
      t(s, dir, "documents").select(
        col("doc_id"),
        round(score, 6).as("score"),
        (score >= 0.5).as("keep"))
        .orderBy(col("doc_id"))
    }),

    // TRAINED hashed linear classifier: full-batch GD with integer
    // micro-unit weights (every distributed sum exact — bit-identical
    // under any partitioning) and a rational sigmoid (no libm exp), so
    // the DuckDB oracle replays the whole training loop as unrolled CTE
    // levels and matches the final weight table exactly. These rows pin
    // the ARITHMETIC: the synthetic corpus draws text and lang
    // independently, so no classifier can separate them and the trained
    // model honestly converges toward the class prior — LEARNED
    // separation on separable data is ClassifierSpec's job
    "classifier_train" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"),
        (col("lang") === "en").cast("long").as("y"))
      val model = operators.Classifier.train(docs, "text", "y",
        buckets = 64, iters = 2)
      (model.wUnits.zipWithIndex
        .collect { case (w, c) if w != 0L => (c.toLong, w) }
        .toSeq :+ ((64L, model.biasUnits)))
        .toDF("cell", "w_units")
        .orderBy(col("cell"))
    }),

    // the corpus scored under that trained model: exact integer margins,
    // squashed keep-probability, margin-sign keep rule — one map-side
    // projection through the learned weight literals
    "classifier_train_score" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"),
        (col("lang") === "en").cast("long").as("y"))
      val model = operators.Classifier.train(docs, "text", "y",
        buckets = 64, iters = 2)
      operators.Classifier.score(docs, "doc_id", "text", model)
        .orderBy(col("doc_id"))
    }),

    // hashed linear classifier (the fastText-style model-based quality
    // filter reduced to its plumbing): tokens hash into weight cells, cell
    // weights sum per doc in exact integer arithmetic, one double
    // conversion — a pure map-side projection, keep = score >= 0
    "quality_classifier" -> ((s, dir) => {
      val score = QualityOps.classifierScore(
        TextOps.tokenHashes(TextOps.tokens(col("text"))))
      t(s, dir, "documents").select(
        col("doc_id"),
        round(score, 6).as("clf_score"),
        (score >= 0.0).as("keep"))
        .orderBy(col("doc_id"))
    }),

    // token-BUDGET selection: keep the best documents (classifier margin,
    // shifted to [0,1)) until a 12k-token training budget is spent — the
    // quality-ranked corpus-release rule. The operator walks a bounded
    // score-bucket histogram on the driver, keeps whole buckets with a
    // map-side filter, and pays an ordered running sum only inside the
    // single boundary bucket; the oracle states the SAME rule as one
    // global ordered cumsum — an independent formulation, so a
    // boundary-handling bug can't echo
    "select_token_budget" -> ((s, dir) => {
      val toks = TextOps.tokens(col("text"))
      val score = QualityOps.classifierScore(TextOps.tokenHashes(toks)) + 0.5
      operators.Selection.selectTokenBudget(
          t(s, dir, "documents"), "doc_id", score, size(toks),
          budget = 12000L)
        .orderBy(col("doc_id"))
    }),

    // hand-derived intent pin for the classifier (tools/
    // classifier_reference.py recomputes token hashes AND cell weights in
    // independent Python): literal expected VALUES, empty-doc edge included
    "classifier_pinned" -> ((s, dir) => {
      import s.implicits._
      val score = QualityOps.classifierScore(
        TextOps.tokenHashes(TextOps.tokens(col("text"))))
      ClassifierCorpus.toDF("case_id", "text")
        .select(col("case_id"), round(score, 6).as("clf_score"))
        .orderBy(col("case_id"))
    }),

    // INTENT pin for language ID: hand-labelled sentences (one per table,
    // a mixed-majority case, no-stopword and empty edges) against literal
    // expected VALUES — a wrong stopword table or tie-break fails
    // CORRECTNESS, not just engine-equivalence
    "langid_pinned" -> ((s, dir) => {
      import s.implicits._
      Seq(
        (1L, "the cat is sitting on a mat in the sun"),
        (2L, "el perro es grande y la casa es blanca"),
        (3L, "der hund ist gross und die katze ist klein"),
        (4L, "zz yy xx ww vv"),
        (5L, ""),
        (6L, "the la the der the of")).toDF("case_id", "text")
        .select(col("case_id"),
          TextOps.langId(TextOps.tokens(col("text"))).as("lang_pred"))
        .orderBy(col("case_id"))
    }),

    // INTENT pin for the mixing arithmetic: thresholds for fixed stratum
    // sizes and weights against literal VALUES derived from an independent
    // double simulation (same op order; see tools/ — N' = min(1000/.5,
    // 200/.3, 100/.2) = 500 → rates .25/.75/1.0 → 16384/49152/65536). The
    // hash16 keep decision itself is pinned by sample_pinned.
    "mixing_pinned" -> ((s, dir) => {
      import s.implicits._
      Mixing.thresholds(
          Map("web" -> 1000L, "books" -> 200L, "code" -> 100L),
          Seq("web" -> 0.5, "books" -> 0.3, "code" -> 0.2))
        .toSeq.toDF("stratum", "threshold")
        .orderBy(col("stratum"))
    }),

    // INTENT pin for the composite quality score: the same five hand-
    // derived cases as the unit spec, against literal expected VALUES — a
    // wrong gate weight or threshold fails CORRECTNESS, not just the spec
    "quality_pinned" -> ((s, dir) => {
      import s.implicits._
      Seq(
        (1L, (1 to 40).map(i => s"word$i").mkString(" ") + " the of and is a"),
        (2L, "too short"),
        (3L, (1 to 50).map(i => s"zz$i").mkString(" ")),
        (4L, ("the the the the " * 10).trim),
        (5L, "")).toDF("case_id", "text")
        .select(col("case_id"),
          round(QualityOps.qualityScore(col("text"),
            TextOps.tokens(col("text"))), 6).as("score"))
        .orderBy(col("case_id"))
    }),

    // INTENT pin for the vector family: cosine/norm over analytically
    // exact vectors (3-4-5 triangle, orthogonal, diagonal, parallel,
    // zero-norm guard), against literal expected VALUES
    "vector_pinned" -> ((s, dir) => {
      import s.implicits._
      Seq(
        (1L, Array(3f, 4f), Array(4f, 3f)),
        (2L, Array(1f, 0f), Array(0f, 1f)),
        (3L, Array(1f, 1f), Array(1f, 0f)),
        (4L, Array(2f, 0f), Array(4f, 0f)),
        (5L, Array(0f, 0f), Array(1f, 2f))).toDF("case_id", "va", "vb")
        .select(col("case_id"),
          round(VectorOps.cosine(col("va"), col("vb")), 6).as("cos"),
          round(VectorOps.norm(col("va")), 6).as("norm_a"))
        .orderBy(col("case_id"))
    }),

    // PII detect + redact over a pinned edge-case corpus (the synthetic
    // documents contain no PII; the operator is the regex pipeline itself)
    "pii_scrub" -> ((s, dir) => {
      import s.implicits._
      PiiCorpus.toDF("case_id", "text").select(
        col("case_id"),
        QualityOps.emailCount(col("text")).cast("bigint").as("n_email"),
        QualityOps.ipv4Count(col("text")).cast("bigint").as("n_ip"),
        QualityOps.phoneCount(col("text")).cast("bigint").as("n_phone"),
        QualityOps.redactPii(col("text")).as("redacted"))
        .orderBy(col("case_id"))
    }),

    // mojibake detection + repair (ftfy's core rule): UTF-8-as-cp1252
    // artifacts injected over real corpus text round-trip back to their
    // true characters; untouched ASCII docs pass through IDENTICAL (the
    // conservative whole-string contract — single-encoded text never
    // "repairs"). The oracle states the repaired text from construction:
    // the injected artifact IS the cp1252 rendering of the expected char
    "text_mojibake" -> ((s, dir) => {
      val injected = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"), when(col("doc_id") % 4 === 0,
            lit(" donâ€™t stop"))
          .when(col("doc_id") % 4 === 1, lit(" cafÃ© olÃ©"))
          .when(col("doc_id") % 4 === 2, lit(" naÃ¯ve Ã¼ber"))
          .otherwise(lit(""))).as("text"))
      injected.select(col("doc_id"),
          QualityOps.mojibakeScore(col("text")).as("n_bad"),
          QualityOps.mojibakeRepair(col("text")).as("repaired"),
          (QualityOps.mojibakeRepair(col("text")) =!= col("text"))
            .as("changed"))
        .orderBy(col("doc_id"))
    }),

    // segment-scoped mojibake repair on MIXED documents (the corpora the
    // whole-string rule under-serves): every doc carries one genuine-'é'
    // line (single-encoded text the strict round-trip rightly refuses to
    // touch — and under the whole-string rule that refusal poisons the
    // entire doc) plus an artifact lead line; per-line scoping repairs
    // the artifact lines while the genuine line passes byte-identical.
    // The oracle pins whole-string bail-out as literal FALSE and
    // restates the per-line result from construction
    "text_mojibake_lines" -> ((s, dir) => {
      val injected = t(s, dir, "documents").select(col("doc_id"),
        concat(lit("rÃ©sumÃ© artifacts lead\n"), col("text"),
          lit("\ngenuine café line"),
          when(col("doc_id") % 2 === 0, lit("\ntail donâ€™t stop"))
            .otherwise(lit(""))).as("text"))
      injected.select(col("doc_id"),
          (QualityOps.mojibakeRepair(col("text")) =!= col("text"))
            .as("changed_whole"),
          QualityOps.mojibakeRepairLines(col("text")).as("by_line"))
        .orderBy(col("doc_id"))
    }),

    // ---- perceptual image hashing + EXIF hygiene ----------------------
    // dHash on NO-RESAMPLE fixtures: 9×8 gray PNGs whose pixel values
    // follow a closed formula, so the 63-bit difference hash is exact
    // integer arithmetic the oracle restates bit for bit — the
    // mm_decode_real standard applied to the hash itself (the general
    // resample path is pinned structurally in ImageHashSpec)
    "mm_dhash" -> ((s, dir) => {
      import s.implicits._
      def png(id: Int): Array[Byte] = {
        val im = new java.awt.image.BufferedImage(9, 8,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        for (y <- 0 until 8; x <- 0 until 9) {
          val v = (x * 37 + y * 11 + id * 7) % 256
          im.setRGB(x, y, (v << 16) | (v << 8) | v)
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(im, "png", bos)
        bos.toByteArray
      }
      val rows = (0 until 40).map(i => (i.toLong, png(i)))
      Multimodal.imageHashes(rows.toDF("id", "payload"), "id", "payload")
        .select(col("id"), col("dhash"), col("decode_ok"))
        .orderBy(col("id"))
    }),

    // pHash near-dup dedup: four identical-image groups plus one
    // perturbed copy per group cluster through the SAME Hamming-banding
    // machinery as text SimHash (pigeonhole recall is exact, so a
    // constructed near-pair that failed to cluster is a hash defect —
    // the banding-recall gauge and the dedup are one pinned row);
    // cluster labels restate from construction
    "mm_phash_dedup" -> ((s, dir) => {
      import s.implicits._
      def png(seed: Int, perturb: Boolean): Array[Byte] = {
        val (w, h) = (64, 48)
        val im = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until h; x <- 0 until w) {
          val base = ((x * 31 + y * 17) * (seed + 1) + seed * 977) & 0xffffff
          im.setRGB(x, y,
            if (perturb && (x + y) % 97 == 0) base ^ 0x030303 else base)
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(im, "png", bos)
        bos.toByteArray
      }
      val rows = (0 until 12).map(i => (i.toLong, png(i % 4, false))) ++
        (0 until 4).map(i => (100L + i, png(i, true)))
      val hashes = Multimodal.imageHashes(
        rows.toDF("id", "payload"), "id", "payload")
      val pairs = Dedup.hammingHashPairs(
        hashes.where(col("decode_ok")), "id", "phash",
        bits = 63, maxHamming = 10)
      Dedup.connectedComponents(
          hashes.select(col("id")), "id", pairs)
        .select(col("id"), col("component").as("cluster"))
        .orderBy(col("id"))
    }),

    // EXIF walk on hand-built APP1/TIFF fixtures: orientation, DateTime,
    // and the GPS-IFD presence bit (location PII), all restated from
    // construction; corrupt/absent EXIF flags, never throws
    "mm_exif_meta" -> ((s, dir) => {
      import s.implicits._
      val rows = (0 until 30).map { i =>
        (i.toLong, ExifFixture.jpeg(
          orientation = 1 + i % 8,
          datetime = f"2024:01:${1 + i % 28}%02d 10:00:00",
          gps = i % 3 == 0,
          be = i % 2 == 1)) // both byte orders walk to the same fields
      } :+ (100L, "not a jpeg at all".getBytes("UTF-8"))
      Multimodal.exifMeta(rows.toDF("id", "payload"), "id", "payload")
        .orderBy(col("id"))
    }),

    // GPS-PII strip: coordinates zero IN PLACE (no reflow — every other
    // TIFF offset stays valid, payload length unchanged), the GPS
    // pointer retags, orientation/DateTime survive; the row re-walks the
    // STRIPPED bytes through the same parser and also pins
    // byte-length preservation
    "mm_exif_strip" -> ((s, dir) => {
      import s.implicits._
      val rows = (0 until 30).map { i =>
        (i.toLong, ExifFixture.jpeg(
          orientation = 1 + i % 8,
          datetime = f"2024:01:${1 + i % 28}%02d 10:00:00",
          gps = i % 3 == 0,
          be = i % 2 == 1))
      }
      val src = rows.toDF("id", "payload")
      val stripped = Multimodal.stripExifGps(src, "id", "payload")
      Multimodal.exifMeta(stripped, "id", "payload")
        .join(stripped.select(col("id"),
          octet_length(col("payload")).cast("bigint").as("n_bytes")),
          Seq("id"))
        .join(src.select(col("id"),
          octet_length(col("payload")).cast("bigint").as("n_bytes_orig")),
          Seq("id"))
        .select(col("id"), col("has_exif"), col("orientation"),
          col("datetime"), col("gps_present"), col("exif_ok"),
          (col("n_bytes") === col("n_bytes_orig")).as("len_preserved"))
        .orderBy(col("id"))
    }),

    // the dedup ingest door KILLED AND RESUMED: the corpus drains as
    // run 1, the query stops (the between-batches kill), the ingest
    // batch arrives, and run 2 RESTARTS from the same checkpoint into
    // the same file sink — admissions across both incarnations must
    // equal the uninterrupted contract (batch-1 firsts + batch-2
    // novelties, exactly once each; mid-batch death arms live in
    // StreamResumeSpec where the fault injector is clean)
    "stream_dedup_resumed" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val root =
        java.nio.file.Files.createTempDirectory("graft-resume").toString
      val srcDir = s"$root/src"; val ckpt = s"$root/ck"
      val out = s"$root/out"
      def drainOnce(): Unit = {
        val schema = s.read.parquet(srcDir).schema
        val q = Streams.dedupTransform(
            s.readStream.schema(schema).parquet(srcDir))
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      d.coalesce(1).write.mode("append").parquet(srcDir)
      drainOnce() // run 1 commits, the query is DOWN
      incrementalIngestBatch(s, dir).coalesce(1)
        .write.mode("append").parquet(srcDir)
      drainOnce() // restart from the same checkpoint
      s.read.parquet(out).select(col("kept_id").as("doc_id"))
        .orderBy(col("doc_id"))
    }),

    // decontamination-index takedown: a benchmark RETIRES from the
    // suite — its fingerprints leave the at-rest winnow index (masked
    // immediately, physically at purge), and the decontamination probe
    // must equal a rebuild from the retained benchmarks alone (retired
    // benchmarks must stop suppressing training documents)
    "retract_winnow" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val h = Sampling.hash16(col("doc_id"), 7)
      val r = math.round(0.05 * Sampling.Buckets)
      val table = s"${indexDb(s)}.winnow_retract"
      Contamination.writeWinnowIndexRows(winnowTrainFps(s, dir), table,
        buckets = 8)
      Bucketing.resetTable(s, Retract.tombTable(table))
      Retract.retract(s, table, "id",
        d.select((col("doc_id") + 10000000).as("doc_id"))
          .where((col("doc_id") - 10000000) % 17 === 0))
      def probe() = Contamination.winnowMatchesIndexed(s, table,
        d.where(h < lit(r)), "doc_id", "text", w = 4, minShared = 2)
      val masked = probe()
        .select(lit("masked").as("phase"), col("doc_id"), col("eval_id"),
          col("n_shared"))
        .localCheckpoint(true)
      Retract.purge(s, table)
      masked.unionByName(probe()
          .select(lit("purged").as("phase"), col("doc_id"),
            col("eval_id"), col("n_shared")))
        .orderBy(col("phase"), col("doc_id"), col("eval_id"))
    }),

    // ================= at-rest retraction / takedown =================
    // the deletion lifecycle every index family now carries: tombstone
    // (immediate logical delete) -> masked probe view -> crash-atomic
    // physical purge. Each row pins BOTH phases EQUAL to a rebuild from
    // the filtered corpus — the takedown contract

    // exact-dedup digest index: retract doc_ids, dump the masked view
    // AND the post-purge table; both must equal the filtered rebuild
    "retract_digest_index" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val tbl = s"${indexDb(s)}.digest_retract"
      DedupIndex.writeDigestIndex(d, "doc_id", "text", tbl, buckets = 8)
      Bucketing.resetTable(s, Retract.tombTable(tbl)) // re-run hygiene
      Retract.retract(s, tbl, "id",
        d.where(col("doc_id") % 7 === 0).select(col("doc_id")))
      // materialize the masked dump BEFORE purge rewrites the table
      val masked = Retract.readLive(s, tbl)
        .select(lit("masked").as("phase"), col("kh"), col("id"))
        .localCheckpoint(true)
      Retract.purge(s, tbl)
      masked.unionByName(s.table(tbl)
          .select(lit("purged").as("phase"), col("kh"), col("id")))
        .orderBy(col("phase"), col("kh"), col("id"))
    }),

    // near-dup band index: retract from bands AND shingles, purge, then
    // PROBE — the incremental ingest filter against the post-takedown
    // index must equal the rescan against the filtered corpus (retracted
    // docs no longer suppress their batch near-duplicates)
    "retract_band_probe" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val tbl = s"${indexDb(s)}.band_retract"
      DedupIndex.writeBandIndex(d, "doc_id", "text", tbl, buckets = 8)
      val gone = d.where(col("doc_id") % 5 === 0).select(col("doc_id"))
      for (part <- Seq(s"${tbl}_bands", s"${tbl}_shingles")) {
        Bucketing.resetTable(s, Retract.tombTable(part))
        Retract.retract(s, part, "id", gone)
        Retract.purge(s, part)
      }
      val toksB = TextOps.tokens(col("text"))
      val batch = d.select((col("doc_id") + 10000000).as("doc_id"),
        when(size(toksB) > 5,
            array_join(slice(toksB, lit(6), size(toksB) - 5), " "))
          .otherwise(col("text")).as("text"))
      DedupIndex.incrementalNearDupIndexed(batch, s, tbl,
          "doc_id", "text", 0.7)
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    // duplicate-component label index: retracting the CANONICAL member
    // re-elects each component's label as the min SURVIVING id (purge
    // re-canonicalization; the documented no-split conservative
    // semantics — on this exact-dup fixture components are text groups,
    // so filtered rebuild and re-canonicalization coincide exactly)
    "retract_component_index" -> ((s, dir) => {
      val corpus = exactDupCorpus(s, dir)
      val labels = corpus.join(
          corpus.groupBy(col("text"))
            .agg(min(col("doc_id")).as("component")),
          Seq("text"))
        .select(col("doc_id"), col("component"))
      val tbl = s"${indexDb(s)}.comp_retract"
      DedupIndex.writeComponentIndex(labels, tbl, buckets = 8)
      Bucketing.resetTable(s, Retract.tombTable(tbl))
      DedupIndex.retractComponentIndex(s, tbl,
        corpus.where(col("doc_id") % 4 === 0).select(col("doc_id")))
      DedupIndex.purgeComponentIndex(s, tbl)
      s.table(tbl).orderBy(col("doc_id"))
    }),

    // postings index: the takedown appends a NEGATIVE stats correction
    // so N/avgdl stay exact — the BM25 probe over the masked view AND
    // after physical purge must both equal the filtered-corpus rescan
    // (idf's N shifts with the retraction, not just the posting rows)
    "retract_postings_probe" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val tbl = s"${indexDb(s)}.postings_retract"
      Relevance.writePostingsIndex(d, "doc_id", "text", tbl, buckets = 8)
      Bucketing.resetTable(s, Retract.tombTable(tbl))
      Relevance.retractPostings(s, tbl,
        d.where(col("doc_id") % 31 === 0).select(col("doc_id")))
      val q = Seq("spark", "hash", "merge")
      val masked = Relevance.bm25TopKIndexed(s, tbl, q)
        .select(lit("masked").as("phase"), col("id").as("doc_id"),
          col("bm25"))
        .localCheckpoint(true)
      Relevance.purgePostings(s, tbl)
      masked.unionByName(Relevance.bm25TopKIndexed(s, tbl, q)
          .select(lit("purged").as("phase"), col("id").as("doc_id"),
            col("bm25")))
        .orderBy(col("phase"), col("doc_id"))
    }),

    // link-graph edge index: a retracted node leaves by EITHER endpoint;
    // the degree fold over the purged table equals the filtered rebuild
    "retract_edge_probe" -> ((s, dir) => {
      import s.implicits._
      val tbl = s"${indexDb(s)}.edge_retract"
      Graph.writeEdgeIndex(docGraphEdges(s, dir), "src", "dst", tbl,
        buckets = 8)
      Bucketing.resetTable(s, Retract.tombTable(tbl))
      Graph.retractNodes(s, tbl, Seq(50L, 100L, 150L).toDF("node"))
      Retract.purge(s, tbl)
      Graph.outDegrees(s, tbl).orderBy(col("node"))
    }),

    // fetch-state index: a retracted URL's fetch history leaves the
    // crawl's memory — the conditional-fetch plan re-fetches it
    // UNCONDITIONALLY (no validators), masked and purged alike
    "retract_fetch_state" -> ((s, dir) => {
      val (frontier, state) = condFetchFixture(s, dir)
      val tbl = s"${indexDb(s)}.fetch_retract"
      operators.FetchState.writeStateIndex(
        state.withColumn("digest", lit("d")), tbl, buckets = 8)
      Bucketing.resetTable(s, Retract.tombTable(tbl))
      Retract.retract(s, tbl, "url",
        frontier.where(col("doc_id") % 4 === 0).select(col("url")))
      val probe = () => operators.FetchState.conditionalFetchPlanIndexed(
        frontier.select(col("url")), s, tbl)
      val masked = probe()
        .select(lit("masked").as("phase"), col("url"),
          col("if_none_match"), col("if_modified_since"),
          col("conditional"))
        .localCheckpoint(true)
      Retract.purge(s, tbl)
      masked.unionByName(probe()
          .select(lit("purged").as("phase"), col("url"),
            col("if_none_match"), col("if_modified_since"),
            col("conditional")))
        .orderBy(col("phase"), col("url"))
    }),

    // host-partitioned CDX: partition-SELECTIVE purge — only partitions
    // holding tombstoned captures rewrite, the rest carry over by
    // rename (pinned by RetractSpec at the file level; this row pins
    // the VALUES both phases)
    "retract_cdx_host" -> ((s, dir) => {
      val caps = t(s, dir, "documents").select(
        concat(lit("com,h"), (col("doc_id") % 13).cast("string"),
          lit(")/p"), col("doc_id").cast("string")).as("surt"),
        concat(lit("com,h"), (col("doc_id") % 13).cast("string"))
          .as("surt_host"),
        sha2(col("text").cast("binary"), 256).as("digest"))
      val path = s"$indexDbDir/cdx_host_retract"
      Retract.clearPartitionedTombs(path)
      caps.write.mode("overwrite").partitionBy("surt_host").parquet(path)
      Retract.retractPartitioned(s, path, "surt",
        t(s, dir, "documents").where(col("doc_id") % 9 === 0).select(
          concat(lit("com,h"), (col("doc_id") % 13).cast("string"),
            lit(")/p"), col("doc_id").cast("string")).as("surt")))
      val masked = Retract.readLivePartitioned(s, path)
        .select(lit("masked").as("phase"), col("surt"), col("digest"))
        .localCheckpoint(true)
      Retract.purgePartitioned(s, path, "surt_host")
      masked.unionByName(s.read.parquet(path)
          .select(lit("purged").as("phase"), col("surt"), col("digest")))
        .orderBy(col("phase"), col("surt"))
    }),

    // the Gopher document-shape battery (Rae et al. 2021, Table A1):
    // word-count bounds, mean word length, symbol-to-word ratio, bullet/
    // ellipsis line fractions, alphabetic-word fraction, stop-word
    // presence — per-rule verdict columns over the corpus plus one
    // crafted violator per rule, all map-side
    "quality_gopher_rules" -> ((s, dir) => {
      import s.implicits._
      val corpus = t(s, dir, "documents").select(col("doc_id"), col("text"))
        .unionByName(GopherArms.toDF("doc_id", "text"))
      val toks = TextOps.tokens(col("text"))
      corpus.select(col("doc_id"),
          size(toks).cast("long").as("n_words"),
          TextOps.meanTokenLen(toks).as("__ml"),
          QualityOps.symbolWordRatio(col("text"), toks).as("__sym"),
          QualityOps.bulletLineFrac(col("text")).as("__bul"),
          QualityOps.ellipsisLineFrac(col("text")).as("__ell"),
          QualityOps.alphaWordFrac(toks).as("__alpha"),
          QualityOps.gopherStopHits(toks).as("__stops"))
        .select(col("doc_id"), col("n_words"),
          (col("n_words") >= 50 && col("n_words") <= 100000).as("r_words"),
          (col("__ml") >= 3.0 && col("__ml") <= 10.0).as("r_mean_len"),
          (col("__sym") <= 0.1).as("r_symbols"),
          (col("__bul") <= 0.9).as("r_bullets"),
          (col("__ell") <= 0.3).as("r_ellipsis"),
          (col("__alpha") >= 0.8).as("r_alpha"),
          (col("__stops") >= 2L).as("r_stops"))
        .withColumn("pass",
          col("r_words") && col("r_mean_len") && col("r_symbols") &&
            col("r_bullets") && col("r_ellipsis") && col("r_alpha") &&
            col("r_stops"))
        .orderBy(col("doc_id"))
    }),

    // Flesch Reading Ease (Flesch 1948) — the readability gate of
    // textbook-style quality filters: heuristic vowel-group syllables
    // (floored at 1/token), terminal-punctuation sentences (floored at
    // 1/doc), integer-exact counts into one fixed-order double formula
    "quality_flesch" -> ((s, dir) => {
      val toks = TextOps.tokens(col("text"))
      t(s, dir, "documents")
        .select(col("doc_id"),
          size(toks).cast("long").as("n_words"),
          QualityOps.sentenceCount(col("text")).as("n_sentences"),
          QualityOps.syllableCount(toks).as("n_syllables"))
        .select(col("doc_id"), col("n_words"), col("n_sentences"),
          col("n_syllables"),
          QualityOps.fleschScore(col("n_words"), col("n_sentences"),
            col("n_syllables")).as("fre"))
        .orderBy(col("doc_id"))
    }),

    // payment-card PII with Luhn validation (ISO/IEC 7812-1 Annex B): the
    // separator-tolerant candidate regex proposes, the checksum disposes —
    // a random digit run passes 1-in-10, so the validator is what keeps
    // card redaction from eating order numbers; valid AND invalid
    // candidates report with their verdict
    "pii_luhn" -> ((s, dir) => {
      val injected = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 5 === 0,
            lit(" card 4532 0151 1283 0366 ok")).otherwise(lit("")),
          when(col("doc_id") % 7 === 0,
            lit(" pay 4111-1111-1111-1112 now")).otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            lit(" amex 371449635398431.")).otherwise(lit(""))).as("text"))
      injected.select(col("doc_id"),
          explode(QualityOps.creditCardCandidates(col("text")))
            .as("candidate"))
        .withColumn("valid", QualityOps.luhnValid(col("candidate")))
        .orderBy(col("doc_id"), col("candidate"))
    }),

    // compression-ratio quality signal (Dolma-lineage gate): zlib-deflated
    // bytes / raw UTF-8 bytes via the native DeflateLenExpr, over a pinned
    // edge-case corpus. The oracle pins LITERAL lengths from the
    // independent CPython zlib (tools/zlib_reference.py) — the JVM
    // Deflater under test must land on the canonical zlib's bytes. The
    // corpus-scale arm (deflate throughput over documents at 10x) lives in
    // ScaleRehearsal — its zlib lengths have no SQL restatement
    "quality_compression" -> ((s, dir) => {
      import s.implicits._
      CompressionCorpus.toDF("case_id", "text").select(
        col("case_id"),
        octet_length(col("text")).cast("bigint").as("n_bytes"),
        QualityOps.deflateLen(col("text")).as("z_bytes"),
        QualityOps.compressionRatio(col("text")).as("ratio"))
        .orderBy(col("case_id"))
    }),

    // ranked-retrieval quality metrics (trec_eval's nDCG@10 / MRR / AP@10 /
    // P@10 / R@10) of the BM25 ranking against term-frequency-graded
    // relevance labels — one metrics row per query term; the oracle
    // restates BM25 AND every metric definition independently
    "retrieval_metrics" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val terms = Seq("spark", "hash", "merge")
      val ranked = terms.map { q =>
        Relevance.bm25TopK(d, "doc_id", "text", Seq(q), topK = 10)
          .select(lit(q).as("query"), col("doc_id").cast("long").as("id"),
            // rank over a 10-row arm (bounded by construction); the
            // non-foldable constant key silences the spurious
            // "No Partition Defined" warning, as in rrfHybrid
            row_number().over(Window.partitionBy(pmod(col("doc_id"), lit(1)))
              .orderBy(col("bm25").desc, col("doc_id"))).cast("long").as("rank"))
      }.reduce(_ unionByName _)
      val labels = d
        .select(col("doc_id").cast("long").as("id"),
          explode(TextOps.tokens(col("text"))).as("tok"))
        .where(col("tok").isin(terms: _*))
        .groupBy(col("tok"), col("id"))
        .agg(count(lit(1)).as("tf"))
        .select(col("tok").as("query"), col("id"),
          least(col("tf"), lit(3L)).as("grade"))
      Relevance.retrievalMetrics(ranked, labels, "query", "id", k = 10)
        .orderBy(col("query"))
    }),

    // benchmark-contamination: train docs sharing word-3-grams with the
    // hash-selected eval split (eval shingle set is the broadcast side)
    "contamination_check" -> ((s, dir) =>
      Contamination.check(t(s, dir, "documents"), "doc_id", "text",
          evalRate = 0.05, seed = 11, k = 3)
        .orderBy(col("doc_id"))),

    // FUZZY decontamination: train docs near-duplicating (Jaccard >= 0.5)
    // an eval doc, via cross-corpus MinHash-LSH banding — the leak exact
    // n-gram overlap misses. Eval = a 5% hash split of documents; train =
    // every document with its 5 leading tokens dropped (ids +10000000), so
    // each eval doc's mutated twin must surface
    "contamination_fuzzy" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val h = Sampling.hash16(col("doc_id"), 7)
      val r = math.round(0.05 * Sampling.Buckets)
      val toks = TextOps.tokens(col("text"))
      val train = d.select((col("doc_id") + 10000000).as("doc_id"),
        when(size(toks) > 5, array_join(slice(toks, lit(6), size(toks) - 5), " "))
          .otherwise(col("text")).as("text"))
      Contamination.fuzzy(train, d.where(h < lit(r)), "doc_id", "text",
          minJaccard = 0.5)
        .select(col("doc_id"), col("eval_id"),
          round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("doc_id"), col("eval_id"))
    }),

    // winnowing-fingerprint contamination (the MOSS match): both sides
    // reduce to their winnow-SELECTED fingerprints (~3× fewer than the
    // shingle stream at w=4), join on the hash, pairs with >= 2 shared
    // fingerprints report — a SUBSTRING detector (a verbatim pasted run of
    // >= w+k−1 tokens always shares a fingerprint), where whole-document
    // Jaccard can dilute a pasted paragraph below any threshold
    "contamination_winnow" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val h = Sampling.hash16(col("doc_id"), 7)
      val r = math.round(0.05 * Sampling.Buckets)
      Contamination.winnowMatchesRows(winnowTrainFps(s, dir),
          d.where(h < lit(r)), "doc_id", "text", w = 4, minShared = 2)
        .orderBy(col("doc_id"), col("eval_id"))
    }),

    // the winnow fingerprints AT REST (the ingest-loop API): extraction —
    // tokenize+shingle+winnow over every corpus byte — is paid once per
    // document at its own ingest (write half, blind-append the rest);
    // the eval probe touches only the index, never corpus text. Pinned
    // EQUAL to the in-session winnowMatches via the shared oracle SQL
    "contamination_winnow_indexed" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val h = Sampling.hash16(col("doc_id"), 7)
      val r = math.round(0.05 * Sampling.Buckets)
      val rows = winnowTrainFps(s, dir)
      val table = s"${indexDb(s)}.winnow_fp"
      Contamination.writeWinnowIndexRows(rows.where(col("id") < 10000250),
        table, buckets = 8)
      Contamination.appendWinnowIndexRows(rows.where(col("id") >= 10000250),
        table)
      Contamination.winnowMatchesIndexed(s, table, d.where(h < lit(r)),
          "doc_id", "text", w = 4, minShared = 2)
        .orderBy(col("doc_id"), col("eval_id"))
    }),

    // the decontamination door CLOSED over the at-rest benchmark index:
    // benchmark fingerprints persist once (write + blind append), the
    // ingest stream drops any doc sharing >= 2 DISTINCT fingerprints with
    // the benchmark UNION — note the union semantic vs the pair-counting
    // match; the oracle restates it as such
    "stream_winnow_gate" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val h = Sampling.hash16(col("doc_id"), 7)
      val r = math.round(0.05 * Sampling.Buckets)
      val toks = TextOps.tokens(col("text"))
      val train = d.select((col("doc_id") + 10000000).as("doc_id"),
        when(size(toks) > 5, array_join(slice(toks, lit(6), size(toks) - 5), " "))
          .otherwise(col("text")).as("text"))
      val bench = d.where(h < lit(r))
      val table = s"${indexDb(s)}.winnow_bench"
      Contamination.writeWinnowIndex(bench.where(col("doc_id") % 2 === 0),
        "doc_id", "text", 4, table, buckets = 4)
      Contamination.appendWinnowIndex(bench.where(col("doc_id") % 2 === 1),
        "doc_id", "text", 4, table)
      Streams.winnowGateStream(s, train, table, w = 4, minShared = 2)
        .orderBy(col("doc_id"))
    }),

    // multi-benchmark decontamination: three hash-carved eval sets checked
    // in ONE broadcast of the set-tagged shingle union, hits attributed
    // per set — train-side cost identical to the single-set check
    "contamination_multi" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val h = Sampling.hash16(col("doc_id"), 11)
      val r = math.round(0.05 * Sampling.Buckets)
      val sets = (0 until 3).map(i =>
        s"eval_$i" -> d.where(h >= lit(i * r) && h < lit((i + 1) * r)))
      Contamination.checkMulti(d.where(h >= lit(3 * r)), "doc_id", "text",
          sets, k = 3)
        .orderBy(col("doc_id"), col("eval_set"))
    }),

    // ---- LLM-pipeline: similarity / ANN -------------------------------
    "ann_topk_bruteforce" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.where(col("vec_id") < 8),
        "vec_id", "embedding", 5)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy(col("query_id"), col("neighbor_id"))
    }),

    // cosine RANGE search (radius query, the fixed-threshold sibling of
    // top-k): all corpus vectors within cosine >= 0.35 of each probe —
    // broadcast probes, ONE map-side corpus scan, zero shuffle
    "ann_range_search" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.rangeSearch(emb, emb.where(col("vec_id") < 8),
        "vec_id", "embedding", minCosine = 0.35)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy(col("query_id"), col("neighbor_id"))
    }),

    "ann_lsh_pairs" -> ((s, dir) =>
      Similarity.lshNeighborPairs(t(s, dir, "embeddings"),
        "vec_id", "embedding", bits = 12, minCosine = 0.2, numTables = 4)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
        .orderBy(col("id_a"), col("id_b"))),

    // embedding-cosine near-dup DEDUP: of each LSH-found pair with cosine
    // >= 0.4 (the synthetic embeddings top out near 0.51), the higher id
    // drops
    "dedup_embedding_cosine" -> ((s, dir) =>
      Dedup.embeddingCosine(t(s, dir, "embeddings"), "vec_id", "embedding",
        minCosine = 0.4)
        .select(col("vec_id"), col("label"))
        .orderBy(col("vec_id"))),

    "ann_ivf_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopK(emb, emb.where(col("vec_id") < 8),
        "vec_id", "embedding", k = 5, nlist = 16, nprobe = 4)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy(col("query_id"), col("neighbor_id"))
    }),

    // ivfTopK through the PERSISTED inverted file: the assigned corpus is
    // written partitioned by cluster once, queries assign against the
    // persisted seeds, and the probe reads ONLY its probed cells from
    // disk (partition-pruned scan, plan-pinned). Oracle identical to
    // ann_ivf_topk: same seeds, same assignment, same candidates
    "ann_ivf_indexed" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val path = s"$indexDbDir/ivf_index"
      // write→append→probe, like every other index family: the initial
      // write holds the 16 lowest ids (so its deterministic seeds equal
      // the full corpus's), the rest folds in by appendIvfIndex against
      // the PERSISTED seeds — the probe after append must equal the
      // full-corpus rescan the oracle renders
      Similarity.writeIvfIndex(emb.where(col("vec_id") < 64),
        "vec_id", "embedding", path, nlist = 16)
      Similarity.appendIvfIndex(emb.where(col("vec_id") >= 64),
        "vec_id", "embedding", path)
      // maintenance fold: one file per cell directory again (crash-atomic
      // rename-aside swap) — the probe after compaction must still equal
      // the full-corpus rescan
      operators.Bucketing.compactPartitioned(s, path, "cluster")
      Similarity.ivfTopKIndexed(s, path, emb.where(col("vec_id") < 8),
          "vec_id", "embedding", k = 5, nprobe = 4)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy(col("query_id"), col("neighbor_id"))
    }),

    // IVF-SQ8 at rest (FAISS IndexIVFScalarQuantizer): int8 codes by
    // cell, 4x less storage; cosine probes rank on the CODES directly —
    // the per-vector scale cancels in cosine, so it is never read
    // (ReadSchema pinned scale-free). Same write -> append -> compact ->
    // probe lifecycle as the raw inverted file
    "ann_ivfsq8_indexed" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val path = s"$indexDbDir/ivfsq8_index"
      Similarity.writeIvfSq8Index(emb.where(col("vec_id") < 64),
        "vec_id", "embedding", path, nlist = 16)
      Similarity.appendIvfSq8Index(emb.where(col("vec_id") >= 64),
        "vec_id", "embedding", path)
      operators.Bucketing.compactPartitioned(s, path, "cluster")
      Similarity.ivfSq8TopKIndexed(s, path, emb.where(col("vec_id") < 8),
          "vec_id", "embedding", k = 5, nprobe = 4)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy(col("query_id"), col("neighbor_id"))
    }),

    // recall@5 of the SQ8 codes against the RAW-vector IVF arm with the
    // SAME seeds and nprobe — pruning identical on both sides, so the
    // gauge isolates exactly what int8 quantization costs the ranking
    "ann_ivfsq8_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") < 8)
      val path = s"$indexDbDir/ivfsq8_recall_index"
      Similarity.writeIvfSq8Index(emb, "vec_id", "embedding", path, nlist = 16)
      val approx = Similarity.ivfSq8TopKIndexed(s, path, q,
        "vec_id", "embedding", k = 5, nprobe = 4)
      val exact = Similarity.ivfTopK(emb, q,
        "vec_id", "embedding", k = 5, nlist = 16, nprobe = 4)
      Similarity.recallAtK(approx, exact)
        .select(col("query_id"), col("n_hit"),
          round(col("recall"), 6).as("recall"))
        .orderBy(col("query_id"))
    }),

    "embed_norm" -> ((s, dir) =>
      t(s, dir, "embeddings").select(
        col("vec_id"), col("label"),
        round(VectorOps.norm(col("embedding")), 6).as("l2_norm"))
        .orderBy(col("vec_id"))),

    // int8 scalar quantization: per-vector scale + max reconstruction error.
    // The rounding lives in its OWN select: `round(scale).as("scale")`
    // alongside an expression reading col("scale") would lateral-alias-
    // resolve the reference to the ROUNDED value (Spark 4 lateral column
    // aliases shadow same-name child attributes within a projection).
    "embed_quantize" -> ((s, dir) =>
      t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"),
          VectorOps.quantScale(col("embedding")).as("scale"))
        .select(col("vec_id"), col("scale"),
          VectorOps.dequantMaxErr(col("embedding"),
            VectorOps.quantize(col("embedding"), col("scale")), col("scale"))
            .as("max_err"))
        .select(col("vec_id"), round(col("scale"), 6).as("scale"),
          round(col("max_err"), 6).as("max_err"))
        .orderBy(col("vec_id"))),

    // ---- LLM-pipeline: multimodal plumbing ----------------------------
    "mm_binary_meta" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        octet_length(col("text")).cast("bigint").as("n_bytes"),
        sha2(col("text").cast("binary"), 256).as("sha256"),
        lit("text/plain").as("mime"))
        .orderBy(col("doc_id"))),

    // partition-level batch decode (stubbed codec; real plumbing)
    "mm_decode_meta" -> ((s, dir) =>
      Multimodal.decodeMeta(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("id"))),

    // REAL image decode through javax.imageio: deterministic PNG/JPEG/
    // gray-PNG fixtures round-trip encoder→decoder inside mapPartitions,
    // plus two corrupt payloads that must flag rather than throw. The
    // oracle recomputes the construction arithmetic independently — the
    // decoded dims/channels must equal what the images were built with
    "mm_decode_real" -> ((s, dir) => {
      import s.implicits._
      def img(w: Int, h: Int, gray: Boolean): java.awt.image.BufferedImage = {
        val tpe = if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
          else java.awt.image.BufferedImage.TYPE_INT_RGB
        val im = new java.awt.image.BufferedImage(w, h, tpe)
        for (y <- 0 until h; x <- 0 until w)
          im.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)
        im
      }
      def enc(im: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(im, fmt, bos)
        bos.toByteArray
      }
      val rows = (0 until 20).map { i =>
        val (w, h) = (16 + (i * 7) % 50, 16 + (i * 11) % 40)
        val payload = (i % 3) match {
          case 0 => enc(img(w, h, gray = false), "png")
          case 1 => enc(img(w, h, gray = false), "jpg")
          case _ => enc(img(w, h, gray = true), "png")
        }
        (i.toLong, payload)
      } :+
        (100L, "definitely not an image payload".getBytes("UTF-8")) :+
        (101L, Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10, 7, 7, 7))
      Multimodal.decodeImageMeta(rows.toDF("id", "payload"), "id", "payload")
        .select(col("id"), col("mime"), col("width_px"), col("height_px"),
          col("n_channels"), col("decode_ok"))
        .orderBy(col("id"))
    }),

    // REAL audio decode through javax.sound.sampled: PCM WAV fixtures
    // with known rate/channels/frames round-trip writer→reader inside
    // mapPartitions; corrupt payloads flag rather than throw. The oracle
    // recomputes the construction arithmetic independently
    "mm_decode_audio_real" -> ((s, dir) => {
      import s.implicits._
      def wav(rate: Int, channels: Int, frames: Int): Array[Byte] = {
        val fmt = new javax.sound.sampled.AudioFormat(
          rate.toFloat, 16, channels, true, false)
        val pcm = new Array[Byte](frames * channels * 2)
        var i = 0
        while (i < pcm.length) { pcm(i) = (i * 7 % 251).toByte; i += 1 }
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        bos.toByteArray
      }
      val rows = (0 until 12).map { i =>
        (i.toLong,
          wav(8000 + (i % 5) * 2000, 1 + i % 2, 100 + i * 37))
      } :+
        (100L, "definitely not an audio payload".getBytes("UTF-8")) :+
        (101L, "RIFF0000WAVEgarbage".getBytes("UTF-8"))
      Multimodal.decodeAudioMeta(rows.toDF("id", "payload"), "id", "payload")
        .select(col("id"), col("mime"), col("sample_rate_hz"),
          col("n_channels"), col("n_frames"), col("duration_ms"),
          col("decode_ok"))
        .orderBy(col("id"))
    }),

    // REAL video container decode: minimal-but-well-formed MP4 fixtures
    // (ftyp + moov{mvhd, trak{tkhd}×n} + mdat) built byte-for-byte from
    // the ISO BMFF layout, v0 and v1 box versions both exercised; the
    // moov walk recovers dims/tracks/duration, corrupt and truncated
    // payloads flag rather than throw. Oracle = the construction
    // arithmetic, recomputed independently
    "mm_decode_video_real" -> ((s, dir) => {
      import s.implicits._
      def u32(v: Long): Array[Byte] =
        java.nio.ByteBuffer.allocate(4).putInt(v.toInt).array
      def box(typ: String, body: Array[Byte]): Array[Byte] =
        u32(body.length + 8L) ++ typ.getBytes("ISO-8859-1") ++ body
      def mvhd(ver: Int, timescale: Int, duration: Long): Array[Byte] = {
        val body = new Array[Byte](if (ver == 1) 112 else 100)
        body(0) = ver.toByte
        if (ver == 1) {
          System.arraycopy(u32(timescale.toLong), 0, body, 20, 4)
          System.arraycopy(u32(duration >>> 32), 0, body, 24, 4)
          System.arraycopy(u32(duration & 0xffffffffL), 0, body, 28, 4)
        } else {
          System.arraycopy(u32(timescale.toLong), 0, body, 12, 4)
          System.arraycopy(u32(duration), 0, body, 16, 4)
        }
        box("mvhd", body)
      }
      def tkhd(ver: Int, w: Int, h: Int): Array[Byte] = {
        val off = if (ver == 1) 88 else 76
        val body = new Array[Byte](off + 8)
        body(0) = ver.toByte
        System.arraycopy(u32(w.toLong << 16), 0, body, off, 4)
        System.arraycopy(u32(h.toLong << 16), 0, body, off + 4, 4)
        box("tkhd", body)
      }
      def mp4(ver: Int, timescale: Int, duration: Long, nTracks: Int,
          w: Int, h: Int): Array[Byte] = {
        val traks = (0 until nTracks).flatMap { t =>
          // track 0 is the video track; the rest (audio/hint) carry 0×0
          box("trak", if (t == 0) tkhd(ver, w, h) else tkhd(ver, 0, 0))
        }.toArray
        box("ftyp", "isom".getBytes("ISO-8859-1") ++ u32(0L) ++
            "isom".getBytes("ISO-8859-1")) ++
          box("moov", mvhd(ver, timescale, duration) ++ traks) ++
          box("mdat", Array.fill[Byte](16)(7))
      }
      val rows = (0 until 10).map { i =>
        (i.toLong, mp4(if (i % 5 == 4) 1 else 0, 600 + (i % 4) * 400,
          1200L + i * 600L, 1 + i % 3, 320 + 16 * i, 240 + 8 * i))
      } :+
        (100L, "definitely not a video payload".getBytes("UTF-8")) :+
        (101L, box("ftyp", "isom".getBytes("ISO-8859-1") ++ u32(0L))) :+ // no moov
        (102L, box("ftyp", "isom".getBytes("ISO-8859-1")) ++
          u32(64L) ++ "moov".getBytes("ISO-8859-1")) // moov overruns payload
      Multimodal.decodeVideoMeta(rows.toDF("id", "payload"), "id", "payload")
        .select(col("id"), col("mime"), col("width_px"), col("height_px"),
          col("n_tracks"), col("duration_ms"), col("decode_ok"))
        .orderBy(col("id"))
    }),

    "mm_resize_plan" -> ((s, dir) =>
      Multimodal.resizePlan(
        Multimodal.decodeMeta(t(s, dir, "documents"), "doc_id", "text"), 128)
        .select(col("id"), col("width_px"), col("height_px"),
          col("target_w"), col("target_h"))
        .orderBy(col("id"))),

    "mm_frame_sample" -> ((s, dir) =>
      Multimodal.sampleFrames(
        Multimodal.decodeMeta(t(s, dir, "documents"), "doc_id", "text")
          .withColumn("n_frames", col("width_px")),
        "id", "n_frames", 5)
        .orderBy(col("id"), col("frame_idx"))),

    // interleaved image-text assembly (the MMC4/OBELICS layout): two
    // image slots per page split the prose into ordered spans; slot 0's
    // sidecar payload exists for ids%3≠0, slot 1's for even ids — the
    // sequence SHAPE survives fetch failures (has_payload=false keeps
    // the slot). Oracle restates all five rows per doc from arithmetic
    "mm_interleaved" -> ((s, dir) => {
      val (pages, images) = mmFixture(s, dir)
      Multimodal.interleave(pages, "doc_id", "html",
          images, "doc_id", "src", "payload")
        .orderBy(col("doc_id"), col("seq"))
    }),

    // the TERMINAL multimodal artifact: the interleaved corpus packed
    // into int32 token records (image slots the 2^20 sentinel), written
    // as binary shards and read BACK by positioned record reads — the
    // oracle restates every sequence from the span tokenization + 6-
    // tokens-per-page packing arithmetic alone (markup, the assembler,
    // and the byte layout never appear in it)
    "mm_shards_roundtrip" -> ((s, dir) => {
      val (pages, images) = mmFixture(s, dir)
      val inter = Multimodal.interleave(pages, "doc_id", "html",
        images, "doc_id", "src", "payload")
      val out = java.nio.file.Files
        .createTempDirectory("graft_mmshards").toString
      val (tokIdx, _, _) = Multimodal.writeInterleavedShards(
        inter, "doc_id", pmod(col("doc_id"), lit(4)).cast("string"),
        images, "doc_id", "src", "payload", out,
        seqLen = 16, numShards = 2)
      operators.TrainShards.readTokenShards(s, tokIdx, seqLen = 16)
        .select(col("group"), col("seq_id"),
          concat_ws(",", col("tokens")).as("tokens_csv"),
          concat_ws(",", col("boundaries")).as("boundaries_csv"))
        .orderBy(col("group"), col("seq_id"))
    }),

    // the slot-reference half of the artifact: every image slot's
    // (group, seq_id, slot_pos) address in the PACKED layout, its
    // payload fetched back through the content-addressed sidecar by
    // positioned span reads — byte equality restated from construction
    // (the payload IS the doc's text); failed fetches keep their slot
    // with a null payload, and slots in dropped partial tails drop
    "mm_payload_roundtrip" -> ((s, dir) => {
      val (pages, images) = mmFixture(s, dir)
      val inter = Multimodal.interleave(pages, "doc_id", "html",
        images, "doc_id", "src", "payload")
      val out = java.nio.file.Files
        .createTempDirectory("graft_mmpayload").toString
      val (_, slots, payIdx) = Multimodal.writeInterleavedShards(
        inter, "doc_id", pmod(col("doc_id"), lit(4)).cast("string"),
        images, "doc_id", "src", "payload", out,
        seqLen = 16, numShards = 2)
      slots.join(Multimodal.readPayloadSpans(s, payIdx),
          Seq("digest"), "left")
        .select(col("group"), col("seq_id"), col("slot_pos"),
          col("doc_id"), col("image_src"),
          col("digest").isNotNull.as("has_payload"),
          col("payload").cast("string").as("payload_text"))
        .orderBy(col("doc_id"), col("image_src"))
    }),

    // the pipeline's TERMINAL artifact: packed fixed-length sequences
    // (docs laid end-to-end per group, straddlers split, partial tails
    // dropped) written as int32-LE binary shards + index, then read
    // BACK by positioned record reads — tokens and document-boundary
    // masks must survive the byte layout; oracle restates every
    // sequence from the packing arithmetic alone
    "train_shards_roundtrip" -> ((s, dir) => {
      val docs = t(s, dir, "documents").where(col("doc_id") < 200)
        .select(col("doc_id"),
          pmod(col("doc_id"), lit(4)).cast("string").as("grp"),
          sequence((col("doc_id") * 100).cast("int"),
            (col("doc_id") * 100 + pmod(col("doc_id"), lit(7)) + 2)
              .cast("int")).as("toks"))
      val seqs = operators.TrainShards.assembleSequences(
        docs, "grp", "doc_id", "toks", seqLen = 16)
      val out = java.nio.file.Files
        .createTempDirectory("graft_trainshards").toString
      val idx = operators.TrainShards.writeTokenShards(
        seqs, "grp", out, seqLen = 16, numShards = 4)
      operators.TrainShards.readTokenShards(s, idx, seqLen = 16)
        .select(col("group"), col("seq_id"),
          concat_ws(",", col("tokens")).as("tokens_csv"),
          concat_ws(",", col("boundaries")).as("boundaries_csv"))
        .orderBy(col("group"), col("seq_id"))
    }),

    // takedown on the terminal artifact: retract one GROUP from the
    // written shards — affected shard files rewrite without its records
    // (originals deleted, survivors' bytes and boundary masks intact,
    // record_idx re-contiguous), untouched files never open; reading
    // back through the NEW index must equal packing the retained groups
    // alone. The retracted group's token values are absent from the
    // remaining shard BYTES (spec-pinned in TrainShardsSpec)
    "train_shards_retracted" -> ((s, dir) => {
      val docs = t(s, dir, "documents").where(col("doc_id") < 200)
        .select(col("doc_id"),
          pmod(col("doc_id"), lit(4)).cast("string").as("grp"),
          sequence((col("doc_id") * 100).cast("int"),
            (col("doc_id") * 100 + pmod(col("doc_id"), lit(7)) + 2)
              .cast("int")).as("toks"))
      val seqs = operators.TrainShards.assembleSequences(
        docs, "grp", "doc_id", "toks", seqLen = 16)
      val out = java.nio.file.Files
        .createTempDirectory("graft_shards_retract").toString
      val idx = operators.TrainShards.writeTokenShards(
        seqs, "grp", out, seqLen = 16, numShards = 4)
      val idx2 = operators.TrainShards.retractGroups(s, idx, Seq("2"),
        seqLen = 16)
      operators.TrainShards.readTokenShards(s, idx2, seqLen = 16)
        .select(col("group"), col("seq_id"),
          concat_ws(",", col("tokens")).as("tokens_csv"),
          concat_ws(",", col("boundaries")).as("boundaries_csv"))
        .orderBy(col("group"), col("seq_id"))
    }),

    // fill-in-the-middle training transform (Bavarian et al. 2022):
    // 40% of documents (LCG-gated by id) rewritten into sentinel-marked
    // (prefix, suffix, middle) order — both PSM and SPM layouts — the
    // rest passing through as plain AR rows; cut points are LCG-uniform
    // over 0..len and the oracle restates gate, cuts, and assembly from
    // the same integer arithmetic
    "train_fim" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      Fim.transform(d, "doc_id", "text", ratePct = 40)
        .select(lit("psm").as("mode"), col("*"))
        .unionByName(
          Fim.transform(d, "doc_id", "text", ratePct = 40, spm = true)
            .select(lit("spm").as("mode"), col("*")))
        .orderBy(col("mode"), col("id"))
    }),

    // BPE-ish token counting alongside whitespace tokens
    "text_token_count" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("bigint").as("n_ws_tokens"),
        size(regexp_extract_all(col("text"), lit("\\w+|[^\\w\\s]"), lit(0)))
          .cast("bigint").as("n_bpe_tokens"))
        .orderBy(col("doc_id"))),

    // ---- §2.7: Structured Streaming (AvailableNow replay) --------------
    // custom keyed state (flatMapGroupsWithState): streaming first-seen
    // dedup — one surviving id per distinct content digest
    "stream_dedup_state" -> ((s, dir) =>
      Streams.streamingDedup(s, exactDupCorpus(s, dir))
        .orderBy(col("kept_id"))),

    // streaming form of dedup_incremental, same fixture: the new batch
    // streams in, anti-probes the static corpus digest index per
    // micro-batch, and first-seen digest state dedups within the stream
    "stream_incremental_dedup" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      Streams.incrementalDedupStream(s, incrementalIngestBatch(s, dir), d)
        .select(col("kept_id").as("doc_id"))
        .orderBy(col("doc_id"))
    }),

    // the SAME ingest door behind the broadcast-Bloom pre-gate: arriving
    // docs test the corpus bitmap MAP-SIDE and only possible hits pay the
    // per-batch static probe — the stream-static join prices at |hits|
    // per batch, not |batch|; oracle identical (no false negatives +
    // exact confirm)
    "stream_bloom_gate" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      Streams.incrementalDedupStream(s, incrementalIngestBatch(s, dir), d,
          bloomExpectedItems = Some(65536L))
        .select(col("kept_id").as("doc_id"))
        .orderBy(col("doc_id"))
    }),

    // the CLOSED streaming ingest loop over the at-rest indexes: two
    // staged batches drain through foreachBatch — digest probe, band
    // probe, then survivors APPEND to both indexes before the next batch
    // runs. Batch 2 re-ships batch 1's content under higher ids: without
    // the in-run append those rows would be admitted (novel vs the base
    // corpus); the oracle — restating both chained stages independently —
    // proves the second batch sees the first's admissions. Ids ascend
    // with arrival, so the drained result is micro-batch-independent
    // (within-batch keep-first and cross-batch first-arrival pick the
    // same winners however the drain splits)
    "stream_ingest_loop" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val db = indexDb(s)
      DedupIndex.writeDigestIndex(d, "doc_id", "text", s"$db.loop_digest", 8)
      DedupIndex.writeBandIndex(d, "doc_id", "text", s"$db.loop_band", 8)
      val toks = TextOps.tokens(col("text"))
      def mut(drop: Int, off: Long) = d.select(
        (col("doc_id") + off).as("doc_id"),
        when(size(toks) > drop,
          array_join(slice(toks, lit(drop + 1), size(toks) - drop), " "))
          .otherwise(col("text")).as("text"))
      val b1 = d.select((col("doc_id") + 10000000).as("doc_id"), col("text"))
        .unionByName(mut(5, 20000000))
      val b2 = mut(5, 40000000).unionByName(mut(8, 50000000))
      Streams.ingestLoopStream(s, Seq(b1, b2),
          s"$db.loop_digest", s"$db.loop_band", 0.7)
        .orderBy(col("doc_id"))
    }),

    // streaming near-dup ingest filter over the mutated corpus: MinHash
    // band buckets map-side, keyed state = ONE long (min id) per distinct
    // (band, bucket); a doc drops when any of its buckets holds a lower
    // id. Deliberately the UNVERIFIED candidate rule — 8 bytes of state
    // per bucket, no shingles stored — the always-on ingest gate whose
    // offline arbiter is the verified dedup_minhash_keep
    "stream_lsh_dedup" -> ((s, dir) =>
      Streams.minHashDedupStream(s, nearDupCorpus(s, dir))
        .orderBy(col("doc_id"))),

    // ingest-time per-source admission quota: at most 12 docs admitted per
    // source, ONE LONG of state per source (the admitted count) — the
    // streaming door of quota_per_source; the oracle-facing fold is the
    // batch rule (12 lowest ids per source), micro-batch independent
    "stream_source_quota" -> ((s, dir) =>
      Streams.sourceQuotaStream(s, t(s, dir, "documents"), quota = 12)
        .orderBy(col("doc_id"))),

    // ingest-time per-source TOKEN budget (mixtures are specified in
    // tokens, not doc counts): admit while the source's cumulative token
    // count fits 800 — ONE LONG of state per source, non-skipping
    // (an overflowing doc still advances the count, keeping prefix sums
    // monotone); the oracle-facing refold is the batch rule (id-ordered
    // prefix sums per source), computed via the id-bucket histogram +
    // boundary-bucket-only window — never a full per-source cumsum
    "stream_token_budget" -> ((s, dir) =>
      Streams.tokenBudgetStream(s, t(s, dir, "documents"), budget = 800L)
        .orderBy(col("doc_id"))),

    // the CLOSED crawl-discovery loop: three id-range page batches
    // drain through extract → robots → trap → canonicalize, each
    // batch's novel canonical URLs probe the persisted seen-URL table
    // and append before the next batch (batch 3 re-discovering batch
    // 1's URLs must emit nothing); canonicalization noise (utm params,
    // UPPERCASE hosts) and the disallowed/trap links are all
    // load-bearing. The oracle restates the whole chain independently
    "stream_crawl_loop" -> ((s, dir) => {
      def du(d: org.apache.spark.sql.Column) = concat(lit("https://h"),
        (d % 5).cast("string"), lit(".test/dir/p"), d.cast("string"),
        lit(".html"))
      val id = col("doc_id")
      val d1 = (id * 3 + 1) % 500
      val d2 = (id * 7 + 5) % 500
      val d3 = (id * 11 + 2) % 500
      val d4 = (id * 13 + 7) % 500
      val h1 = when(id % 5 === 0,
          concat(lit("HTTPS://H"), (d1 % 5).cast("string"),
            lit(".TEST/dir/p"), d1.cast("string"), lit(".html")))
        .otherwise(du(d1))
      val h1q = when(id % 4 === 0, concat(h1, lit("?utm_x=1")))
        .otherwise(h1)
      val priv = concat(lit("https://h"), (d3 % 5).cast("string"),
        lit(".test/private/p"), d3.cast("string"), lit(".html"))
      val deep = concat(lit("https://h"), (d4 % 5).cast("string"),
        lit(".test/dir/dir/dir/dir/dir/p"), d4.cast("string"),
        lit(".html"))
      val legit = concat(lit("<p><a href=\""), h1q,
        lit("\">a</a> <a href=\""),
        when(id % 3 === 0, du(d2)).otherwise(du(d1)),
        lit("\">b</a></p>"))
      val html = concat(
        when(id % 7 =!= 0, legit).otherwise(lit("<p>no links</p>")),
        lit("<p><a href=\""), priv, lit("\">p</a> <a href=\""), deep,
        lit("\">t</a></p>"))
      val pages = t(s, dir, "documents")
        .select(id, html.as("html"), du(id).as("base"))
      val batches = Seq(pages.where(id < 166),
        pages.where(id >= 166 && id < 333), pages.where(id >= 333))
      val robots = {
        import s.implicits._
        (0 until 5)
          .map(k => (s"h$k.test", "User-agent: *\nDisallow: /private"))
          .toDF("host", "txt")
      }
      val tbl = s"${indexDb(s)}.seen_urls"
      Bucketing.writeBucketed(
        t(s, dir, "documents").where(id % 10 === 0)
          .select(du(id).as("curl")), tbl, "curl", 8)
      Streams.crawlLoopStream(s, batches,
          Robots.parseRules(robots, "host", "txt"), "graftbot", tbl)
        .orderBy(col("curl"))
    }),

    // the crawl loop's frontier PRODUCER as a streaming door: arriving
    // markup yields its resolved outgoing links map-side (stateless —
    // the html_links fixture and oracle, through the stream)
    "stream_link_discovery" -> ((s, dir) => {
      val id = col("doc_id").cast("string")
      val html = concat(
        lit("<html><body><p>x <a href=\"https://abs.test/a"), id,
        lit("\">abs</a> <a href='//cdn.test/c"), id,
        lit("'>pr</a> <a class=\"z\" href=\"/root/r"), id,
        lit("\">root</a> <a href=\"rel/p"), id,
        lit("\">rel</a> <a href=\"../up"), id,
        lit("\">up</a> <a href=\"./same"), id,
        lit("\">dot</a> <a href=\"../../deep"), id,
        lit("\">clamp</a> <a href=\"?page="), id,
        lit("\">qrel</a> <a href=\"#frag\">f</a>"),
        lit(" <a href=\"mailto:x@y.test\">m</a>"),
        lit("<!-- <a href=\"https://no.test/\">c</a> -->"),
        lit(" <a href=\"https://q.test/d?a=1&amp;b="), id,
        lit("\">e</a></p></body></html>"))
      val base = concat(lit("https://h"),
        (col("doc_id") % 5).cast("string"), lit(".test/dir/page"), id,
        lit(".html"))
      Streams.linkDiscoveryStream(s,
          t(s, dir, "documents").where(col("doc_id") < 100)
            .select(col("doc_id"), html.as("html"), base.as("base")))
        .orderBy(col("doc_id"), col("link"))
    }),

    // ingest-time per-host politeness door: each arriving URL takes its
    // host's next fetch slot (ONE LONG of state per host), scheduled at
    // slot × delay with the four delay postures of frontier_schedule;
    // the oracle-facing refold is the batch rule (id-ordered slots per
    // host through the batch scheduler itself), micro-batch independent
    "stream_politeness_gate" -> ((s, dir) => {
      val delays = (0 until 20).flatMap(k => k % 4 match {
        case 0 => Some(s"src$k.test" -> 1.0)
        case 2 => Some(s"src$k.test" -> 2.5)
        case _ => None
      }).toMap
      val urls = t(s, dir, "documents")
        .select(col("doc_id"),
          concat(lit("https://"), col("source"), lit(".test/doc/"),
            col("doc_id").cast("string")).as("url"))
      Streams.politenessStream(s, urls, delays,
          defaultDelayS = 0.5, horizonS = 10.0)
        .orderBy(col("url"))
    }),

    // ingest-time URL dedup (the crawl-frontier door): arriving pages key
    // on their canonical URL, ONE LONG of state per distinct URL (the
    // lowest id seen); the oracle-facing fold is the batch rule (min id
    // per canonical URL), micro-batch independent. The synthesized URLs
    // carry case/tracking noise; the oracle derives the canonical form
    // from the CONSTRUCTION (doc_id % 100), independent of the regexes
    "stream_url_dedup" -> ((s, dir) => {
      val pages = t(s, dir, "documents").select(col("doc_id"),
        concat(lit("HTTPS://Site"), pmod(col("doc_id"), lit(100)),
          lit(".Example.COM/page?utm_source=x&gclid="), col("doc_id"))
          .as("url"))
      Streams.urlDedupStream(s, pages).orderBy(col("kept_id"))
    }),

    // the archive-writer door: the warc_wet_roundtrip extraction fed
    // through one-file micro-batches, each batch committing its own
    // WET shard set, the drain re-reading every shard — batch
    // boundaries decide shard membership, never record content, so the
    // oracle is the same batch-independent text restatement
    "stream_wet_export" -> ((s, dir) => {
      val fix = warcFixture(s, dir)
      val texts = HtmlOps.extractMainText(
        graft.sources.Warc.httpResponses(
            graft.sources.Warc.readRecords(s, fix)
              .where(col("parse_ok") && col("rec_type") === "response")
              .select(col("target_uri"), col("payload")),
            "target_uri", "payload")
          .select(col("target_uri"), col("body_text").as("html")),
        "target_uri", "html", maxLinkDensity = 0.5)
      val out = java.nio.file.Files
        .createTempDirectory("graft_wet_stream").toString
      Streams.wetExportStream(s,
          texts.select(col("target_uri").as("uri"), col("text"))
            .repartition(4),
          out)
        .orderBy(col("target_uri"))
    }),

    // the conditional-fetch door live: the same two-release fetch-state
    // fixture as crawl_conditional_fetch, with the due URLs arriving in
    // forced micro-batches (2 files per trigger) — a stateless
    // stream-static join, so the drain must equal the batch plan
    // row-for-row (the shared oracle formulation)
    "stream_conditional_fetch" -> ((s, dir) => {
      val (frontier, state) = condFetchFixture(s, dir)
      Streams.conditionalFetchStream(s, frontier.select(col("url")), state,
          maxFilesPerTrigger = Some(2))
        .orderBy(col("url"))
    }),

    // the durable-state STREAMING door: due URLs drain in micro-batches
    // against the PERSISTED fetch-state index (write release 1, append
    // release 2 — the per-cycle lifecycle), each batch re-planning the
    // table relation; must equal the batch plan row for row under the
    // same shared restatement
    "stream_conditional_fetch_indexed" -> ((s, dir) => {
      val (frontier, state) = condFetchFixture(s, dir)
      val tbl = s"${indexDb(s)}.fetch_state_stream_idx"
      val withDigest = state.withColumn("digest",
        concat(lit("sha-"), col("fetch_time").cast("string")))
      operators.FetchState.writeStateIndex(
        withDigest.where(col("fetch_time") < 1000), tbl, buckets = 8)
      operators.FetchState.appendState(
        withDigest.where(col("fetch_time") >= 1000), tbl)
      Streams.conditionalFetchStreamIndexed(s, frontier.select(col("url")),
          tbl, maxFilesPerTrigger = Some(2))
        .orderBy(col("url"))
    }),

    // ingest-time decontamination gate: arriving docs score against the
    // static eval shingle set (15% hash split) map-side and pass at
    // contam_frac <= 0.2 — the streaming counterpart of contamination_check
    "stream_contamination_gate" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val h = Sampling.hash16(col("doc_id"), 11)
      val r = math.round(0.15 * Sampling.Buckets)
      Streams.contaminationGateStream(s,
          docs = d.where(h >= lit(r)), evalDocs = d.where(h < lit(r)),
          maxContamFrac = 0.2)
        .orderBy(col("doc_id"))
    }),

    // streaming heavy hitters: the mergeable Misra-Gries summary as
    // bounded streaming state (<= capacity counters TOTAL, vs a
    // vocabulary-sized exact top-k state); capacity exceeds this corpus's
    // distinct tokens, so the drain is exact = the batch oracle
    "stream_top_tokens" -> ((s, dir) =>
      Streams.topTokensStream(s, t(s, dir, "documents"),
        capacity = 4096, n = 20)),

    // ingest-time perplexity gate: arriving docs score under the static
    // 'en'-slice reference LM (broadcast, Laplace over the ref vocab) and
    // pass at mean log10-prob >= -1.49 — the streaming counterpart of
    // ccnet_ppl_buckets' offline terciles, with the threshold as the
    // fixed offline calibration an ingest door actually uses
    "stream_ppl_gate" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      Streams.perplexityGateStream(s, docs = d,
          refDocs = d.where(col("lang") === "en"), minMeanLogProb = -1.49)
        .orderBy(col("doc_id"))
    }),

    // trained-model ingest door: the hashed-linear classifier trained
    // offline (same deterministic labels as classifier_train) gates the
    // arriving documents map-side — kept = margin >= 0 under the learned
    // weight literals. Oracle replays training as unrolled CTEs and
    // applies the same margin-sign rule. Like classifier_train this pins
    // arithmetic — the label-free synthetic corpus gives the gate nothing
    // to discriminate; ClassifierSpec pins real separation
    "stream_classifier_gate" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val labeled = d.select(col("doc_id"), col("text"),
        (col("lang") === "en").cast("long").as("y"))
      val model = operators.Classifier.train(labeled, "text", "y",
        buckets = 64, iters = 2)
      Streams.classifierGateStream(s, d, model)
        .orderBy(col("doc_id"))
    }),

    // blocklist door: one automaton pass per arriving doc, passes iff no
    // blocked phrase occurs — stateless projection, oracle re-counts by
    // position-joining the phrase table
    "stream_dict_gate" -> ((s, dir) =>
      Streams.dictGateStream(s, t(s, dir, "documents"),
        SparkEntry.BlockPhrases)
        .orderBy(col("doc_id"))),

    // crawl-ingest extraction door: markup synthesized from the corpus
    // streams through the SAME map-side HtmlOps.mainText projection as the
    // batch operator + a min-token keep gate — stateless, so AvailableNow
    // drains to exactly the batch answer the oracle restates
    // the text-hygiene ingest door: segment-scoped mojibake repair ->
    // Luhn-card row drop (the WINDOW-SCANNING net, not the bounded
    // reporting regex) -> email/IP/phone redaction, one stateless
    // projection; the fixture injects BOTH artifact families (three
    // mojibake arms by id%4; card arms by id%5/7/11/13 — the %13 arm is
    // the MERGED-RUN leak the net exists for: a valid card + a
    // separator-joined expiry fuse into one 20-digit run the bounded
    // regex's length filter would discard, keeping the card in the
    // corpus), and the oracle restates repair from construction and the
    // drop rule SEMANTICALLY (the identical window-scan mirror in SQL,
    // not id arithmetic)
    "stream_hygiene_gate" -> ((s, dir) => {
      val injected = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 4 === 0, lit(" donâ€™t stop"))
            .when(col("doc_id") % 4 === 1, lit(" cafÃ© olÃ©"))
            .when(col("doc_id") % 4 === 2, lit(" naÃ¯ve Ã¼ber"))
            .otherwise(lit("")),
          when(col("doc_id") % 5 === 0,
            lit(" card 4532 0151 1283 0366 ok")).otherwise(lit("")),
          when(col("doc_id") % 7 === 0,
            lit(" pay 4111-1111-1111-1112 now")).otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            lit(" amex 371449635398431.")).otherwise(lit("")),
          when(col("doc_id") % 13 === 0,
            lit(" visa 4111 1111 1111 1111 12 26 exp")).otherwise(lit("")))
          .as("text"))
      Streams.hygieneGateStream(s, injected).orderBy(col("doc_id"))
    }),

    "stream_html_gate" -> ((s, dir) =>
      Streams.htmlGateStream(s,
          t(s, dir, "documents").select(col("doc_id"),
            synthHtml(col("text"), col("doc_id")).as("html")),
          "html", minTokens = 12)
        .orderBy(col("doc_id"))),

    // the archive-bytes ingest door: the 4 WARC fixture shards drain one
    // per micro-batch through parse → HTTP strip → extraction → token
    // gate, all stateless (micro-batch independent by construction);
    // oracle restates the surviving uris + token counts from the same
    // markup construction the stream's shards carry
    "stream_warc_gate" -> ((s, dir) =>
      Streams.warcGateStream(s, warcFixture(s, dir), minTokens = 40,
          maxFilesPerTrigger = Some(1))
        .orderBy(col("target_uri"))),

    "stream_window_counts" -> ((s, dir) =>
      Streams.windowedEventCounts(s, s"$dir/events.parquet")
        .orderBy(col("window_start"), col("event_type"))),

    "stream_sessions" -> ((s, dir) =>
      Streams.userSessions(s, s"$dir/events.parquet")
        .orderBy(col("user_id"), col("session_start"))),

    // per-window value-quantile monitoring: percentile_approx as the
    // streaming aggregate (mergeable sketch — bounded state per window),
    // gauged against the exact batch arm — exact + within-tolerance flag,
    // the HLL/CMS gauge pattern on the streaming surface
    "stream_window_quantiles" -> ((s, dir) =>
      Streams.windowQuantileGauge(s, s"$dir/events.parquet")
        .orderBy(col("window_start"))),

    // per-window distribution drift vs the corpus reference (integer-ppm
    // TVD): the streaming traffic-mix tripwire — windowed counts are the
    // only streaming state, the comparison is batch arithmetic on the
    // drained window table
    "stream_window_drift" -> ((s, dir) =>
      Streams.windowedTypeDrift(s, s"$dir/events.parquet")
        .orderBy(col("window_start"))),

    // stream-stream interval join (attribution): click ⨝ purchase per user
    // within 30 min; aggregated per user with order-independent stats
    "stream_interval_join" -> ((s, dir) =>
      Streams.clickAttribution(s, s"$dir/events.parquet")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("click_id")).as("n_clicks"),
          countDistinct(col("buy_id")).as("n_buys"),
          round(max(col("value")), 6).as("max_value"))
        .orderBy(col("user_id"))),

    // J7 analogue: lock-owner diagnostic join + string_agg
    "c9_lock_owners" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-ctl").toString
      val ctl = new Control(s, tmp,
        () => java.sql.Timestamp.valueOf("2020-01-01 00:00:00"))
      val u1 = ctl.createUpload("bde").toOption.get
      val u2 = ctl.createUpload("bde", allowConcurrent = true).toOption.get
      ctl.lockTable(u1, "tab_a"); ctl.lockTable(u2, "tab_b")
      ctl.lockTable(u1, "tab_c")
      ctl.uploadTablesDf.as("t")
        .join(ctl.uploadsDf.as("u"), col("t.upl_id_lock") === col("u.id"))
        .groupBy(col("t.upl_id_lock"))
        .agg(array_join(array_sort(collect_list(col("t.table_name"))), ",")
          .as("locked_tables"))
        .orderBy(col("upl_id_lock"))
    }),

    // F7: row timestamps from the (injectable) clock
    "c9_job_times" -> ((s, dir) => {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft-ctl").toString
      var nowStr = "2020-01-01 00:00:00"
      val ctl = new Control(s, tmp, () => java.sql.Timestamp.valueOf(nowStr))
      val u1 = ctl.createUpload("bde").toOption.get
      nowStr = "2020-01-01 02:00:00"
      ctl.finishUpload(u1, ok = true)
      val row = ctl.upload(u1).get
      Seq((row.id, row.startTime.toString.stripSuffix(".0"),
        row.endTime.toString.stripSuffix(".0"), row.status))
        .toDF("id", "start_time", "end_time", "status")
    }),

    // ---- S3/S5/S6/E1/E2: the BDE end-to-end slice ----------------------
    // Oracles are literal VALUES of the reference test's own expectations
    // (t/linz_bde_uploader.t:1176-1221) — an independent evaluation, not an
    // echo of engine output.

    // S3: BDE reader — header schema + typed data region (pab1 fixture)
    "s3_bde_read" -> ((s, dir) =>
      BdeFormat.readFile(s, s"${E2E.FixtureDir}/pab1.crs")
        .orderBy(col("pri_id"))),

    // S3: change-table read incl. datetime typing (xaud fixture)
    "s3_change_read" -> ((s, dir) =>
      BdeFormat.readFile(s, s"${E2E.FixtureDir}/xaud.crs")
        .orderBy(col("id"))),

    // S3: UTF-8 round-trip (utf8 fixture: U+266F/266D/266E/2013)
    "s3_utf8_roundtrip" -> ((s, dir) =>
      BdeFormat.readFile(s, s"${E2E.FixtureDir}/utf8.crs")
        .orderBy(col("id"))),

    // E1+S6: level-0 truncate-and-replace through the staged-publish sink
    "e1_level0_replace" -> ((s, dir) =>
      E2E.runSlice(s).l0Rows.orderBy(col("pri_id"))),

    // E2: the full L0→L5 slice — final table contents
    "e2_level5_final" -> ((s, dir) =>
      E2E.runSlice(s).finalRows.orderBy(col("pri_id"))),

    // E2+S7: the slice's stats row (ninsert=3, nupdate=2, nnull=0, ndel=1)
    "e2_level5_stats" -> ((s, dir) => {
      import s.implicits._
      val r = E2E.runSlice(s).stats
      Seq((r.tableName, r.ninsert, r.nupdate, r.nnullupdate, r.ndelete))
        .toDF("table_name", "ninsert", "nupdate", "nnullupdate", "ndelete")
    }),

    // A2-as-gate: breached error tolerance discards the staged version
    "e2_tolerance_abort" -> ((s, dir) => {
      import s.implicits._
      val (stats, published) = E2E.runToleranceAbort(s)
      Seq((stats.aborted, published.count()))
        .toDF("aborted", "published_rows")
    }),

    // S7: watermark upsert after the slice (upload_table row)
    "s7_watermark_upsert" -> ((s, dir) =>
      E2E.runSlice(s).control.uploadTablesDf
        .select(col("table_name"), col("last_upload_id"),
          col("last_upload_dataset"), col("last_upload_type"),
          col("last_level0_dataset"), col("last_upload_incremental"))),

    // S5 parity mode: the same slice through the JDBC sink (embedded Derby)
    // — staged table + one-transaction DELETE/INSERT swap
    "s5_jdbc_sink" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-derby")
      val sink = new JdbcTableSink(s, s"jdbc:derby:$tmp/db;create=true",
        E2E.TableName)
      val st = E2E.stageRepository()
      Loader.level0Replace(s, sink, Seq(st.l0File), E2E.L0Dataset)
      val chg = BdeFormat.readFile(s, st.changeFile)
      Loader.level5Apply(s, sink, Seq(st.l5File), chg,
        E2E.TableName, E2E.KeyColumn, E2E.L5Dataset,
        tolError = Some(0.20), tolWarning = Some(0.95))
      sink.read().orderBy(col("pri_id"))
    }),

    // S5: _bde_CopySchemaInformation parity (sql/02-bde_control_functions
    // .sql.in:2487-2559) — a PRE-CREATED live table (the reference's
    // tables come from linz-bde-schema) carries a PRIMARY KEY and a
    // secondary index; publish copies both onto the staged working copy
    // BEFORE the swap (staged data violating the live contract fails
    // there, pre-DELETE), and the live contract survives the publish
    "s5_schema_copy" -> ((s, dir) => {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft-ddl")
      val url = s"jdbc:derby:$tmp/db;create=true"
      def raw(sql: String): Unit = {
        val c = java.sql.DriverManager.getConnection(url)
        try { c.createStatement().executeUpdate(sql); () } finally c.close()
      }
      raw("CREATE TABLE t_ddl (id INT NOT NULL, v VARCHAR(16), " +
        "CONSTRAINT t_ddl_pk PRIMARY KEY (id))")
      raw("CREATE INDEX t_ddl_vix ON t_ddl (v)")
      val sink = new JdbcTableSink(s, url, "t_ddl")
      val staged = sink.stage(Seq((1, "a"), (2, "b")).toDF("id", "v"), "v1")
      val ddl = sink.copySchemaInformation(staged)
      val pkCopied = ddl.exists(_.matches("(?i).*PRIMARY KEY \\(\"?id\"?\\)"))
      val ixCopied = ddl.exists(d => d.toUpperCase.startsWith("CREATE INDEX")
        && d.matches("(?i).*\\(\"?v\"?\\)"))
      // the copied PK rejects a duplicate key on the STAGED table — the
      // pre-swap validation the reference buys with the constraint copy
      val dupRejected = {
        val c = java.sql.DriverManager.getConnection(url)
        try {
          c.createStatement().executeUpdate(
            s"INSERT INTO $staged VALUES (1, 'dup')"); false
        } catch { case _: java.sql.SQLException => true }
        finally c.close()
      }
      sink.publish(staged)
      val livePkAfter = {
        val c = java.sql.DriverManager.getConnection(url)
        try {
          val rs = c.getMetaData.getPrimaryKeys(null, null, "T_DDL")
          val b = scala.collection.mutable.ArrayBuffer[String]()
          try { while (rs.next()) b += rs.getString("COLUMN_NAME") }
          finally rs.close()
          b.mkString(",").toLowerCase
        } finally c.close()
      }
      val rowsAfter = sink.read().count()
      Seq(
        ("1_staged_pk_copied", pkCopied.toString),
        ("2_staged_index_copied", ixCopied.toString),
        ("3_staged_dup_rejected", dupRejected.toString),
        ("4_live_pk_after", livePkAfter),
        ("5_live_rows_after", rowsAfter.toString))
        .toDF("step", "detail").orderBy(col("step"))
    }),

    // S5/C9: the JDBC exclusive publish lock (_bde_GetExclusiveLock,
    // sql/02-bde_control_functions.sql.in:696-762) — a contender times out
    // with the holder named in the diagnostic, a STALE holder's claim is
    // stolen and publish proceeds. Contention is injected deterministically
    // (a fake holder row) rather than raced.
    "c9_exclusive_lock" -> ((s, dir) => {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft-lock")
      val url = s"jdbc:derby:$tmp/db;create=true"
      def raw(sql: String): Unit = {
        val c = java.sql.DriverManager.getConnection(url)
        try { c.createStatement().executeUpdate(sql); () } finally c.close()
      }
      val sink = new JdbcTableSink(s, url, "t_lock")
      val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
      sink.replace(Seq((1, "a"), (2, "b")).toDF("id", "v"), "v1")
      out += "1_publish_v1" -> "ok"
      val staged = sink.stage(Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v"), "v2")
      // a live (fresh) claim by another agent: the contender must time out
      // and name the holder
      raw("UPDATE t_lock__lock SET owner = 'agent-zombie', " +
        "acquired_at = CURRENT_TIMESTAMP WHERE id = 1")
      val contender = new JdbcTableSink(s, url, "t_lock",
        lockTimeoutSeconds = 0, lockRetryMillis = 1L)
      out += "2_contended_publish" -> (
        try { contender.publish(staged); "unexpected_success" }
        catch { case e: IllegalStateException =>
          if (e.getMessage.contains("held by agent-zombie")) "timeout_names_holder"
          else s"wrong_diagnostic: ${e.getMessage.take(80)}"
        })
      // age the claim past lockStaleSeconds: the next publisher steals it
      raw("UPDATE t_lock__lock SET acquired_at = TIMESTAMP('2000-01-01 00:00:00') " +
        "WHERE id = 1")
      val stealer = new JdbcTableSink(s, url, "t_lock",
        lockTimeoutSeconds = 10, lockRetryMillis = 1L, lockStaleSeconds = 60)
      stealer.publish(staged)
      out += "3_stale_steal_publish" -> "ok"
      out += "4_final_rows" -> sink.read().count().toString
      out.toSeq.toDF("item", "outcome").orderBy(col("item"))
    }),

    // S6 maintenance (`-m`): pruneVersions keeps the published version plus
    // one predecessor (for in-flight readers) and deletes the rest — the
    // parquet analogue of the reference's maintain()
    // (lib/LINZ/BdeDatabase.pm:400-405)
    "m_prune_versions" -> ((s, dir) => {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft-prune").toString
      val sink = new ParquetTableSink(s, tmp, "t_prune")
      Seq("d1", "d2", "d3").foreach(v =>
        sink.replace(Seq((v, 1)).toDF("version_tag", "n"), v))
      val removed = sink.pruneVersions(keepPrevious = 1).toSet
      val dirRows = Seq("v_d1", "v_d2", "v_d3").map { n =>
        val status =
          if (sink.currentVersion.contains(n)) "current"
          else if (removed.contains(n)) "removed"
          else "kept"
        (n, status)
      }
      val tag = sink.read().select("version_tag").collect().head.getString(0)
      (dirRows :+ ("published_tag" -> tag))
        .toDF("item", "status").orderBy(col("item"))
    }),

    // E3: level-0 applied as a full-outer diff (-full-incremental) — same
    // final five rows as E2, stats from the differ
    "e3_full_incremental" -> ((s, dir) => {
      import s.implicits._
      val (stats, fin) = OrchestratorScenario.runE3(s)
      Seq((stats.tableName, stats.ninsert, stats.nupdate, stats.ndelete,
        fin.count()))
        .toDF("table_name", "ninsert", "nupdate", "ndelete", "published_rows")
    }),

    // E3 on the ORCHESTRATED path: `-j | -full-incremental` applies level-0
    // datasets as computed diffs (bin/linz_bde_uploader.pl:86,118-128;
    // lib/LINZ/BdeUpload.pm:961,980) — first load diffs against empty
    // (all-inserts, incremental=true watermark), second load diff-merges
    // the mutated snapshot (I=3, U=2, D=1)
    "e2e_full_incremental" -> ((s, dir) => {
      import s.implicits._
      val r = OrchestratorScenario.runFullIncremental(s)
      def row(runId: Int, o: graft.bde.Orchestrator.TableOutcome, inc: Option[Boolean],
          rows: Long) =
        (runId, o.dataset, o.status, o.ninsert, o.nupdate, o.ndelete,
          inc.getOrElse(false), rows)
      Seq(
        row(1, r.run1.head, r.wmIncremental1, r.rows1),
        row(2, r.run2.head, r.wmIncremental2, r.finalRows.count()))
        .toDF("run_id", "dataset", "status", "ninsert", "nupdate", "ndelete",
          "wm_incremental", "published_rows")
        .orderBy(col("run_id"))
    }),

    // the -j run's final table: the same 5 rows as e2_level5_final — the
    // diff-merge of a full snapshot must land exactly where E2's
    // change-driven path lands
    "e2e_full_inc_final" -> ((s, dir) =>
      OrchestratorScenario.runFullIncremental(s).finalRows
        .orderBy(col("pri_id"))),

    // The top-level run loop over a staged multi-table repository: COLUMN
    // overrides, cleanser on the load path, level-5 chaining, error-skip,
    // incomplete-dataset skip — outcomes as one table
    "e2e_orchestrator" -> ((s, dir) => {
      import s.implicits._
      OrchestratorScenario.run(s).outcomes
        .map(o => (o.dataset, o.level, o.table, o.status,
          o.ninsert, o.nupdate, o.nnullupdate, o.ndelete))
        .toDF("dataset", "level", "table_name", "status",
          "ninsert", "nupdate", "nnullupdate", "ndelete")
        .orderBy(col("dataset"), col("table_name"))
    }),

    // S4 on the REAL load path: the published table proves the cleanser ran
    // (timestamp sentinel repair + replacement map) under COLUMN overrides
    "s4_clean_loadpath" -> ((s, dir) =>
      OrchestratorScenario.run(s).alphaRows.orderBy(col("id"))),

    // S4 error budget: malformed rows drop within max_file_errors, a
    // breached budget aborts the table load
    "s4_error_budget" -> ((s, dir) => {
      import s.implicits._
      val (loaded, aborted) = OrchestratorScenario.runErrorBudget(s)
      Seq((loaded, aborted)).toDF("loaded_rows", "strict_aborted")
    }),

    // Dry-run over the same staged repository: the full plan reported, with
    // the incomplete dataset flagged, and ZERO control writes (uploads_after
    // proves no job row was created) — lib/LINZ/BdeUpload.pm:559-609
    "c9_dry_run" -> ((s, dir) => {
      import s.implicits._
      val (outcomes, control) = OrchestratorScenario.runDryRun(s)
      val uploadsAfter = control.uploadsDf.count()
      outcomes
        .map(o => (o.dataset, o.level, o.table, o.status, o.message,
          uploadsAfter))
        .toDF("dataset", "level", "table_name", "status", "note",
          "uploads_after")
        .orderBy(col("dataset"), col("table_name"))
    }),

    // Job runtime cap (max_level0/5_runtime_hours, conf:148-149; checked
    // between stages, lib/LINZ/BdeUpload.pm:534-557): inside the limit
    // passes, beyond it raises, 0 disables
    "c9_timeout" -> ((s, dir) => {
      import s.implicits._
      def outcome(maxHours: Double, checkAt: String): (Boolean, String) = {
        var nowStr = "2020-01-01 00:00:00"
        val t = new Control.JobTimeout(maxHours,
          () => java.sql.Timestamp.valueOf(nowStr))
        nowStr = checkAt
        try { t.check(); (false, "") }
        catch { case e: RuntimeException => (true, e.getMessage) }
      }
      Seq(
        ("within_limit", 2.0, "2020-01-01 01:00:00"),
        ("beyond_limit", 2.0, "2020-01-01 03:00:00"),
        ("disabled", 0.0, "2020-06-01 00:00:00"))
        .map { case (name, hours, at) =>
          val (threw, msg) = outcome(hours, at)
          (name, threw, msg)
        }
        .toDF("case_id", "timed_out", "message")
        .orderBy(col("case_id"))
    }),

    // Shell event hooks executed with {pid}/{id}/{dataset}/{level}
    // expansion; failures reported, never fatal (BdeUpload.pm:1102-1144)
    "x8_event_fire" -> ((s, dir) => {
      import s.implicits._
      val fired = scala.collection.mutable.ArrayBuffer[(Int, String, String, Int)]()
      val firer = new Hooks.EventFirer(
        Map("start" -> Seq("notify-start {id}"),
          "start_dataset" -> Seq("ds-hook {dataset} L{level} job {id}"),
          "error" -> Seq("alert {id}")),
        runner = cmd => if (cmd.startsWith("alert")) (3, "boom") else (0, "ok"),
        onResult = (ev, cmd, rv, _) =>
          fired += ((fired.size + 1, ev, cmd, rv)))
      firer.fire("start", None) // no job yet: must not fire
      firer.fire("start", Some(7))
      firer.fire("start_dataset", Some(7), Some("20200101000000"), Some("0"))
      firer.fire("error", Some(7)) // exit 3 recorded, not fatal
      fired.toSeq.toDF("seq", "event", "command", "exit_status")
        .orderBy(col("seq"))
    }),

    // Layered configuration: base → -x extension → .test overlay, heredoc
    // values, {key} interpolation (t/linz_bde_uploader.t:232-314)
    "x8_config_layering" -> ((s, dir) => {
      import s.implicits._
      val d = java.nio.file.Files.createTempDirectory("graft-cfg")
      val base = d.resolve("c").toString
      java.nio.file.Files.writeString(d.resolve("c"),
        "db_connection dbname=linz_db\nbde_schema bde\n" +
          "search_sql <<EOT\nSET search_path to {bde_schema}, public\nEOT\n")
      java.nio.file.Files.writeString(d.resolve("c.ext"),
        "db_connection dbname=nonexist_override\n")
      val rows = Seq(
        ("base", Config.load(base)("db_connection")),
        ("with_ext", Config.load(base, Some("ext"))("db_connection")),
        ("interpolated_heredoc", Config.load(base)("search_sql"))) ++ {
        java.nio.file.Files.writeString(d.resolve("c.test"),
          "db_connection dbname=the_test_db\n")
        Seq(
          ("test_overlay", Config.load(base)("db_connection")),
          ("test_beats_ext", Config.load(base, Some("ext"))("db_connection")))
      }
      rows.toDF("layer", "db_connection").orderBy(col("layer"))
    }),

    // ---- §2.9: job lifecycle / locks / purge ---------------------------
    "c9_job_lifecycle" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-ctl").toString
      var nowStr = "2017-01-01 00:00:00"
      val ctl = new Control(s, tmp, () => java.sql.Timestamp.valueOf(nowStr))
      val u1 = ctl.createUpload("bde").toOption.get
      ctl.finishUpload(u1, ok = true)
      val u2 = ctl.createUpload("bde").toOption.get
      require(ctl.createUpload("bde").isLeft, "single-active gate must refuse")
      ctl.finishUpload(u2, ok = false)
      val u3 = ctl.createUpload("bde").toOption.get
      nowStr = "2017-01-01 06:00:00"
      require(ctl.releaseExpiredLocks(1.0) == Seq(u3), "zombie must expire")
      val u4 = ctl.createUpload("bde").toOption.get
      ctl.finishUpload(u4, ok = true)
      ctl.uploadsDf.orderBy(col("id"))
    }),

    "c9_table_locks" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-ctl").toString
      val ctl = new Control(s, tmp,
        () => java.sql.Timestamp.valueOf("2017-01-01 00:00:00"))
      val u1 = ctl.createUpload("bde").toOption.get
      val u2 = ctl.createUpload("bde", allowConcurrent = true).toOption.get
      require(ctl.lockTable(u1, "tab_a"), "first lock wins")
      require(!ctl.lockTable(u2, "tab_a"), "held lock refuses")
      require(ctl.lockTable(u2, "tab_a", force = true), "steal with force")
      require(!ctl.haveTableLock(u1, "tab_a"), "stolen from u1")
      require(ctl.lockTable(u1, "tab_b"), "unrelated lock")
      ctl.unlockTable(u1, "tab_b")
      ctl.uploadTablesDf.select(col("table_name"), col("upl_id_lock"))
        .orderBy(col("table_name"))
    }),

    "c9_purge_old_jobs" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-ctl").toString
      var nowStr = "2017-01-01 00:00:00"
      val ctl = new Control(s, tmp, () => java.sql.Timestamp.valueOf(nowStr))
      val u1 = ctl.createUpload("bde").toOption.get
      ctl.finishUpload(u1, ok = true)
      val u2 = ctl.createUpload("bde").toOption.get
      ctl.recordDatasetLoaded(u2, "bde", "tab_w", "20170101000000", "0",
        incremental = false, details = "", ninsert = 1, nupdate = 0,
        nnullupdate = 0, ndelete = 0)
      ctl.finishUpload(u2, ok = true)
      nowStr = "2017-02-15 00:00:00"
      val u3 = ctl.createUpload("bde").toOption.get
      ctl.finishUpload(u3, ok = true)
      require(ctl.removeOldJobData(30) == Seq(u1),
        "only the old unreferenced job purges")
      ctl.uploadsDf.orderBy(col("id"))
    }),

    // Dataset revisions (`bde_CreateDatasetRevision` /
    // `bde_CompleteDatasetRevision`,
    // sql/02-bde_control_functions.sql.in:2881-2990): a revision opens per
    // dataset with the dataset name parsed as the revision timestamp, rides
    // the `_dataset`/`_revision` job options, closes at dataset end, and an
    // UNUSED revision (no table modified) is deleted — the reference tests
    // drive every load through this pair (t/linz_bde_uploader.t:630-638).
    "c9_dataset_revision" -> ((s, dir) => {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft-ctl").toString
      var nowStr = "2017-01-01 03:00:00"
      val ctl = new Control(s, tmp, () => java.sql.Timestamp.valueOf(nowStr))
      val u1 = ctl.createUpload("bde").toOption.get
      // guard rails: no dataset defined yet; malformed dataset name
      require(ctl.createDatasetRevision(u1).isLeft, "needs a dataset first")
      ctl.setOption(u1, "_dataset", Some("2017-bad-name"))
      require(ctl.createDatasetRevision(u1).isLeft, "malformed name must fail")
      // dataset 1 modifies one table: revision survives, closed, ntables=1
      ctl.setOption(u1, "_dataset", Some("20170101020304"))
      val r1 = ctl.createDatasetRevision(u1).toOption.get
      ctl.recordDatasetLoaded(u1, "bde", "tab_a", "20170101020304", "0",
        incremental = false, details = "", ninsert = 100, nupdate = 0,
        nnullupdate = 0, ndelete = 0)
      nowStr = "2017-01-01 03:05:00"
      require(ctl.completeDatasetRevision(u1) == Right(Some(r1)),
        "modified revision survives")
      // dataset 2 applies only null-updates: unused revision is DELETED
      ctl.setOption(u1, "_dataset", Some("20170102020304"))
      ctl.createDatasetRevision(u1)
      ctl.recordDatasetLoaded(u1, "bde", "tab_a", "20170102020304", "5",
        incremental = true, details = "", ninsert = 0, nupdate = 0,
        nnullupdate = 5, ndelete = 0)
      require(ctl.completeDatasetRevision(u1) == Right(None),
        "unused revision deletes")
      require(ctl.completeDatasetRevision(u1).isLeft,
        "no revision in progress after complete")
      ctl.finishUpload(u1, ok = true)
      // a RESTARTED control sees the same revisions (parquet persistence)
      val ctl2 = new Control(s, tmp,
        () => java.sql.Timestamp.valueOf(nowStr))
      ctl2.revisionRecords.map(r => (r.revision, r.dataset,
          r.revisionTime.toString.stripSuffix(".0"),
          r.closedAt.map(_.toString.stripSuffix(".0")).getOrElse(""),
          r.ntables, r.complete))
        .toDF("revision", "dataset", "revision_time", "closed_at",
          "ntables", "complete")
        .orderBy(col("revision"))
    }),

    // ---- S1/S2/P3/O3 for real: repository scan + watermark plan --------
    "s1_repo_plan" -> ((s, dir) => {
      import s.implicits._
      val root = java.nio.file.Files.createTempDirectory("graft-repo")
      def mk(rel: String, files: String*): Unit = {
        val d = root.resolve(rel)
        java.nio.file.Files.createDirectories(d)
        files.foreach(f => java.nio.file.Files.writeString(d.resolve(f), ""))
      }
      mk("level_0/20160101000000", "pab1.crs")
      mk("level_0/20160601000000", "pab1.crs")
      mk("level_5/20170629000000", "pab1.crs", "xaud.crs")
      mk("level_5/20170701000000", "pab1.crs", "xaud.crs")
      mk("level_5/20170801000000", "pab1.crs")
      mk("level_5/20170901000000", "pab1.crs", "xaud.crs")
      val (cat, errs) = Catalog.parse(
        """TABLE l5_change_table files xaud
          |TABLE crs_parcel_bndry key=audit_id files pab1
          |""".stripMargin.linesIterator)
      require(errs.isEmpty, s"catalog errors: $errs")
      val l0 = Repo.planLevel0(s, root.toString, cat).toSeq
      val l5 = Repo.planLevel5(s, root.toString, cat,
        lastUpload = Some("20170629000000"), before = Some("20170901000000"))
      (l0 ++ l5).map(p => (p.level, p.dataset, p.complete, p.missing.mkString(",")))
        .toDF("level", "dataset", "complete", "missing")
        .orderBy(col("level"), col("dataset"))
    }),

    // ---- P5/O2: table catalog selection --------------------------------
    "p5_table_selection" -> ((s, dir) => {
      import s.implicits._
      val (cat, errs) = Catalog.parse(SampleTablesConf.linesIterator)
      require(errs.isEmpty, s"catalog errors: $errs")
      Catalog.select(cat,
          include = Seq("alpha", "gamma", "delta"), exclude = Seq("gamma"))
        .map(t => (t.id, t.name, t.key.getOrElse(""),
          t.levels.toSeq.sorted.mkString(","), t.files.mkString(",")))
        .toDF("id", "name", "key", "levels", "files")
        .orderBy(col("id"))
    }),

    // ---- S4: the row cleanser (bde_copy semantics) ---------------------
    "s4_clean" -> ((s, dir) => {
      val key = col("o_orderkey")
      t(s, dir, "orders").select(
        key,
        when(key % 11 === 0, to_timestamp(lit("1750-06-15 00:00:00")))
          .otherwise(col("o_orderdate")).as("ts_raw"),
        concat(col("o_orderpriority"),
          when(key % 13 === 0, lit("")).otherwise(lit("")),
          when(key % 17 === 0, lit("–")).otherwise(lit(""))).as("str_raw"),
        format_string("POINT(%.2f %.2f)",
          (key % 360).cast("double") / 4.0 - 45.0 + 0.25,
          (key % 170).cast("double") / 2.0 - 42.5 + 0.25).as("wkt_raw"))
        .select(
          col("o_orderkey"),
          Clean.repairTimestamp(col("ts_raw")).as("ts_clean"),
          Clean.cleanString(col("str_raw")).as("str_clean"),
          Clean.shiftWkt(col("wkt_raw")).as("wkt_clean"))
        .orderBy(col("o_orderkey"))
    }),

    // S4's spatial arm over the FULL WKT grammar: the reference's
    // bde_copy adds the longitude offset to ALL longitudes of ANY
    // geometry (conf:388-391 — LINZ production tables carry parcel
    // POLYGONs and road-centreline LINESTRINGs, not just POINTs), strips
    // leading digits/spaces (conf:387) and prepends the SRID prefix.
    // The fixture cycles POINT / LINESTRING / POLYGON / leading-digit
    // MULTIPOLYGON / plain text; the oracle replays the identical
    // mark-split-rewrite-join algorithm in DuckDB (CleanSql.shiftWkt)
    "s4_clean_geometry" -> ((s, dir) =>
      mixedWktFixture(s, dir)
        .select(col("o_orderkey"), col("wkt_raw"),
          Clean.shiftWkt(col("wkt_raw")).as("wkt_clean"))
        .orderBy(col("o_orderkey"))),

    // S4 under the FULL LDS profile (conf:407-1242, proved entry-for-entry
    // against the reference conf by CleanLdsConfSpec): escapes, C0/C1
    // deletes, Latin-1 transliterations, the identity keep-set through
    // U+017F plus the late-addition typographic keeps, unmapped → '?',
    // and U+FFFD (the decoder's invalid-byte marker) deleted. The oracle
    // restates the same fixture through the independent DuckDB rendering
    "s4_clean_lds" -> ((s, dir) => {
      val input = LdsCleanFixture.zipWithIndex.tail
        .foldLeft(when(col("doc_id") % 8 === 0, lit(LdsCleanFixture(0)))) {
          case (acc, (str, i)) => acc.when(col("doc_id") % 8 === i, lit(str))
        }
      t(s, dir, "documents").where(col("doc_id") < 400)
        .select(col("doc_id"),
          Clean.cleanString(input, Clean.ldsConfig).as("cleaned"))
        .orderBy(col("doc_id"))
    }),

    // ---- EWKT geometry accessors over the cleanser's spatial output ----
    // the reference stores geometry as EWKT text (PostGIS only in its test
    // harness); these rows make the carried column QUERYABLE: accessor
    // round-trip, bbox predicate, nearest-by-planar-distance. All plain
    // regexp+arithmetic column expressions — the oracle replays the same
    // grammar with no spatial extension
    "geo_point_accessors" -> ((s, dir) => {
      import graft.functions.GeoOps
      val key = col("o_orderkey")
      val raw = t(s, dir, "orders").where(key < 3000).select(key,
        format_string("POINT(%.2f %.2f)",
          (key % 360).cast("double") / 4.0 - 45.0 + 0.25,
          (key % 170).cast("double") / 2.0 - 42.5 + 0.25).as("wkt_raw"))
      val e = Clean.shiftWkt(col("wkt_raw"))
      raw.select(key.as("o_orderkey"),
          GeoOps.stSrid(e).as("srid"),
          round(GeoOps.stX(e), 6).as("x"),
          round(GeoOps.stY(e), 6).as("y"))
        .orderBy(col("o_orderkey"))
    }),

    "geo_bbox_filter" -> ((s, dir) => {
      import graft.functions.GeoOps
      val key = col("o_orderkey")
      val raw = t(s, dir, "orders").select(key,
        format_string("POINT(%.2f %.2f)",
          (key % 360).cast("double") / 4.0 - 45.0 + 0.25,
          (key % 170).cast("double") / 2.0 - 42.5 + 0.25).as("wkt_raw"))
      val e = Clean.shiftWkt(col("wkt_raw"))
      raw.where(GeoOps.stWithinBBox(e, 150.0, -20.0, 170.0, 0.0))
        .select(key.as("o_orderkey"),
          round(GeoOps.stX(e), 6).as("x"), round(GeoOps.stY(e), 6).as("y"))
        .orderBy(col("o_orderkey"))
    }),

    "geo_nearest" -> ((s, dir) => {
      import graft.functions.GeoOps
      val key = col("o_orderkey")
      val probe = lit("SRID=4167;POINT(160.000000 -41.000000)")
      val raw = t(s, dir, "orders").select(key,
        format_string("POINT(%.2f %.2f)",
          (key % 360).cast("double") / 4.0 - 45.0 + 0.25,
          (key % 170).cast("double") / 2.0 - 42.5 + 0.25).as("wkt_raw"))
      val e = Clean.shiftWkt(col("wkt_raw"))
      raw.select(key.as("o_orderkey"),
          round(GeoOps.stDistance(e, probe), 6).as("dist"))
        .orderBy(col("dist"), col("o_orderkey"))
        .limit(10)
    }),

    // general-geometry accessors over the shifted mixed fixture (the
    // cleanser's LINESTRING/POLYGON/MULTI* output): envelope bounds +
    // coarse intersects predicate, and the vertex centroid — one
    // regexp pair-scan per row, no geometry engine, NULL-propagating
    // for the plain-text arm exactly like the POINT accessors
    "geo_envelope" -> ((s, dir) => {
      import graft.functions.GeoOps
      val e = Clean.shiftWkt(col("wkt_raw"))
      mixedWktFixture(s, dir)
        .where(GeoOps.stEnvelopeIntersects(e, 160.0, -45.0, 200.0, 10.0))
        .select(col("o_orderkey"),
          round(GeoOps.stXMin(e), 6).as("xmin"),
          round(GeoOps.stXMax(e), 6).as("xmax"),
          round(GeoOps.stYMin(e), 6).as("ymin"),
          round(GeoOps.stYMax(e), 6).as("ymax"),
          GeoOps.stNPoints(e).as("n_points"))
        .orderBy(col("o_orderkey"))
    }),

    "geo_centroid" -> ((s, dir) => {
      import graft.functions.GeoOps
      val e = Clean.shiftWkt(col("wkt_raw"))
      mixedWktFixture(s, dir)
        .where(GeoOps.stNPoints(e).isNotNull)
        .select(col("o_orderkey"),
          round(GeoOps.stCentroidX(e), 6).as("cx"),
          round(GeoOps.stCentroidY(e), 6).as("cy"),
          GeoOps.stNPoints(e).as("n_points"))
        .orderBy(col("o_orderkey"))
    }),

    // the at-rest SPATIAL CELL index (operators/GeoIndex): envelopes of
    // the shifted mixed geometries land bucketed on their grid cell,
    // then one bbox probe scans only the box's cells (+ the oversize
    // sidecar) bucket-pruned. The oracle is the DIRECT envelope filter
    // over the same geometry — the index must be invisible in the ids.
    // The index is the MEMOIZED per-(session, dir) artifact shared with
    // geo_cell_knn (the suffixRanks48 build-once-per-release posture) —
    // both probes previously rebuilt the identical (geometry, grid)
    // table under two names, double-billing the one-time build
    // the index BUILD as its own timed, oracle-checked row (the
    // suffix_sharded_build precedent): it sorts FIRST alphabetically in
    // its family, so the memoized one-time build bills here and the
    // probe rows below report pure probe cost. The summary folds every
    // index row — count, distinct geometries, oversize arm, and a cell
    // checksum — so a wrong cell id or a lost/duplicated row anywhere
    // moves a value; the oracle restates envelope extraction AND the
    // grid enumeration (floor arithmetic, oversize rules) directly
    "geo_cell_build" -> ((s, dir) => {
      val oversize = operators.GeoIndex.OversizeCell
      s.table(geoCellIdx(s, dir)).agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("id")).as("n_geoms"),
        count(when(col("cell") === oversize, lit(1))).as("n_oversize"),
        sum(when(col("cell") =!= oversize, col("cell")))
          .as("cell_checksum"))
    }),

    "geo_cell_probe" -> ((s, dir) =>
      operators.GeoIndex.probeBBox(
          s, geoCellIdx(s, dir), 160.0, -45.0, 200.0, 10.0, cellSize = 4.0)
        .orderBy(col("id"))),

    // ring-search k-NN over the cell index: expanding cell rings from
    // the probe's cell, stop once the kth-best distance bounds the next
    // ring out. The oracle is the direct full-scan top-k by envelope
    // distance — the ring search must be invisible
    "geo_cell_knn" -> ((s, dir) =>
      operators.GeoIndex.probeKnn(s, geoCellIdx(s, dir), 180.0, -20.0, 15,
          cellSize = 4.0)
        .select(col("id"), round(col("dist"), 6).as("dist"))
        .orderBy(col("dist"), col("id"))),

    // the grid SPATIAL JOIN (PBSM shape): all envelope-intersecting
    // pairs of the shifted mixed geometries, co-partitioned by cell with
    // the reference-point rule deduping multi-cell overlaps map-side —
    // the oracle is the direct quadratic self-join, grid invisible
    "geo_cell_join" -> ((s, dir) => {
      val geoms = mixedWktFixture(s, dir).select(
        col("o_orderkey").as("id"),
        Clean.shiftWkt(col("wkt_raw")).as("g"))
      operators.GeoIndex.selfEnvelopeJoin(geoms, "id", "g", cellSize = 4.0)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // ---- F10: detail-string codec --------------------------------------
    "f10_detail_codec" -> ((s, dir) => {
      import s.implicits._
      val details = Control.buildDetails(Seq(
        "pab1" -> "2016-06-01 17:12:25", "xaud" -> "2016-06-01 17:12:46"))
      Control.parseDetails(details).toSeq.sorted
        .map { case (f, e) => (f, e, details) }
        .toDF("file", "end_time", "details")
    }),

    // ---- L5 start-time continuity check --------------------------------
    "l5_continuity" -> ((s, dir) => {
      import s.implicits._
      def run(start: String, prevEnd: String): String =
        Control.checkStartDate(start, prevEnd, 1.0, 5.0) match {
          case Control.ContinuityOk => "ok"
          case Control.ContinuityWarn(_) => "warn"
          case Control.ContinuityFail(_) => "fail"
        }
      Seq(
        (1, run("2016-06-01 17:12:25", "2016-06-01 17:12:25")),
        (2, run("2016-06-01 19:12:25", "2016-06-01 17:12:25")),
        (3, run("2016-06-02 17:12:25", "2016-06-01 17:12:25")),
        (4, run("not-a-time", "2016-06-01 17:12:25")))
        .toDF("case_id", "result").orderBy(col("case_id"))
    }),

    // unique= declared in tables.conf makes the key-swap repair + 'X'
    // classification reachable on the orchestrated path: the change table
    // never lists key 1, yet its row must be deleted (its unique `code`
    // moved to new key 4), and key 2's code change classifies as X
    "j5_keyswap_orchestrated" -> ((s, dir) => {
      import s.implicits._
      OrchestratorScenario.runKeySwap(s).outcomes
        .map(o => (o.dataset, o.level, o.table, o.status,
          o.ninsert, o.nupdate, o.nnullupdate, o.ndelete))
        .toDF("dataset", "level", "table_name", "status",
          "ninsert", "nupdate", "nnullupdate", "ndelete")
        .orderBy(col("dataset"))
    }),

    "j5_keyswap_final" -> ((s, dir) =>
      OrchestratorScenario.runKeySwap(s).finalRows.orderBy(col("id"))),

    // L5 continuity ENFORCED on the orchestrated path: a gapped increment
    // warns inside tolerance, fails beyond it, and error-skips the rest
    "l5_continuity_gate" -> ((s, dir) => {
      import s.implicits._
      val (outcomes, _) = OrchestratorScenario.runContinuityGate(s)
      outcomes.map(o => (o.dataset, o.level, o.table, o.status,
          o.status == "loaded" && o.message.nonEmpty))
        .toDF("dataset", "level", "table_name", "status", "warned")
        .orderBy(col("dataset"))
    }),

    // ---- §2.8: finish-SQL DSL / hooks / event templates ----------------
    "x8_finish_dsl" -> ((s, dir) => {
      import s.implicits._
      val slice = E2E.runSlice(s)
      val tableIds = slice.control.uploadTableRecords
        .map(t => t.tableName -> t.id).toMap
      val stmts = Seq(
        "if any crs_parcel_bndry loaded ? stmt0",
        "if all crs_parcel_bndry missing_tbl loaded ? stmt1",
        "if crs_parcel_bndry affected ? stmt2",
        "if level0 crs_parcel_bndry affected ? stmt3",
        "if level0_dataset crs_parcel_bndry loaded ? stmt4",
        "plain statement")
      stmts.zipWithIndex.map { case (stmt, i) =>
        val parsed = Hooks.parseFinishStatement(stmt)
        val fires = parsed.condition.forall(c =>
          Hooks.tablesAffected(c, 2, slice.control.statRecords, tableIds))
        (i, fires)
      }.toDF("stmt_idx", "fires").orderBy(col("stmt_idx"))
    }),

    "x8_hook_order" -> ((s, dir) => {
      import s.implicits._
      val reg = new Hooks.HookRegistry
      val ran = scala.collection.mutable.ArrayBuffer[String]()
      reg.register("bde_postupload_c_vacuum", _ => ran += "c")
      reg.register("bde_postupload_a_refresh", _ => ran += "a")
      reg.register("bde_postlevel0_z_index", _ => ran += "z")
      val post = reg.runAll("bde_postupload_", 1)
      val l0 = reg.runAll("bde_postlevel0_", 1)
      require(ran.toSeq == Seq("a", "c", "z"), "alphabetical execution")
      (post.map(("postupload", _)) ++ l0.map(("postlevel0", _)))
        .zipWithIndex.map { case ((phase, name), i) => (i, phase, name) }
        .toDF("ord", "phase", "hook").orderBy(col("ord"))
    }),

    "x8_event_template" -> ((s, dir) => {
      import s.implicits._
      val out = Hooks.expandTemplate(
        "notify {id} {dataset} level {level} keep {nope}",
        Map("id" -> "7", "dataset" -> "20170629000000", "level" -> "5"))
      Seq((1, out)).toDF("case_id", "expanded")
    }),

    // ---- S8: logical-replication publish of the control tables ---------
    // The e2e scenario runs with publishing enabled, so its control
    // mutations land in the changelog; the three views of the same log:
    // the batch change feed, the streaming subscription, and the replay
    // fold (which must reproduce the live upload_table watermarks).
    "s8_publication_log" -> ((s, dir) => {
      val ctl = OrchestratorScenario.run(s).controlDir
      Publication.changes(s, ctl, "upload_stats")
        .select(col("op"), col("id"), col("dataset"), col("type"),
          col("ninsert"), col("nupdate"), col("nnullupdate"), col("ndelete"))
        .orderBy(col("id"))
    }),

    "s8_publication_stream" -> ((s, dir) => {
      val ctl = OrchestratorScenario.run(s).controlDir
      // a real Structured Streaming subscriber draining the backlog: the
      // upload's lifecycle arrives as its I (status A) and U (terminal)
      // change records
      val name = s"s8_pub_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      val q = Publication.subscribe(s, ctl, "upload")
        .writeStream.format("memory").queryName(name)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(name)
        .select(col("op"), col("id"), col("schema_name"), col("status"))
        .orderBy(col("op"))
    }),

    "s8_publication_replay" -> ((s, dir) => {
      val ctl = OrchestratorScenario.run(s).controlDir
      Publication.replay(s, ctl, "upload_table")
        .select(col("id"), col("table_name"), col("last_upload_id"),
          col("last_upload_dataset"), col("last_upload_type"),
          col("last_level0_dataset"), col("last_upload_incremental"),
          col("upl_id_lock"))
        .orderBy(col("id"))
    }),

    // ---- bench headliners ---------------------------------------------
    "q6_revenue_filter" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
          && col("l_discount") >= 0.05 && col("l_discount") <= 0.07
          && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
          .as("revenue"))),

    "q3_top_orders" -> ((s, dir) =>
      t(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .where(col("o_orderdate") < lit("1998-01-01").cast("timestamp")
          && col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
        .groupBy(col("o_orderkey"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10))
  )

  // =====================================================================
  // Oracle SQL (DuckDB dialect) — same semantics, same arithmetic.
  // =====================================================================
  def oracleSql: Map[String, String] = {
    val toks = TextOpsSql.tokens("text")

    // shared by dedup_incremental and dedup_incremental_bloom: the Bloom
    // pre-gate is exact-confirmed, so its contract IS the plain one's
    val incrementalDedupSql =
      s"""WITH mut AS (
         |  SELECT doc_id + 20000000 AS doc_id,
         |         CASE WHEN len($toks) > 5
         |              THEN array_to_string(($toks)[6:], ' ')
         |              ELSE text END AS text
         |    FROM documents),
         |batch AS (
         |  SELECT doc_id + 10000000 AS doc_id, text FROM documents
         |  UNION ALL SELECT doc_id, text FROM mut
         |  UNION ALL SELECT doc_id + 10000000 AS doc_id, text FROM mut)
         |SELECT doc_id FROM (
         |  SELECT doc_id,
         |         row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
         |  FROM batch WHERE text NOT IN (SELECT text FROM documents))
         |WHERE rn = 1 ORDER BY doc_id""".stripMargin

    // shared by stream_incremental_dedup and stream_bloom_gate: the Bloom
    // ingest door is exact-confirmed, so its contract IS the plain one's
    val streamIncDedupSql =
      s"""WITH mut AS (
         |  SELECT doc_id + 20000000 AS doc_id,
         |         CASE WHEN len($toks) > 5
         |              THEN array_to_string(($toks)[6:], ' ')
         |              ELSE text END AS text
         |    FROM documents),
         |batch AS (
         |  SELECT doc_id + 10000000 AS doc_id, text FROM documents
         |  UNION ALL SELECT doc_id, text FROM mut
         |  UNION ALL SELECT doc_id + 10000000 AS doc_id, text FROM mut)
         |SELECT min(doc_id) AS doc_id FROM batch
         |WHERE text NOT IN (SELECT text FROM documents)
         |GROUP BY text ORDER BY doc_id""".stripMargin

    // kill-and-resume admissions: run-1 firsts over the corpus, then
    // run-2 novelties over the batch — each exactly once
    val streamResumedDedupSql =
      s"""WITH mut AS (
         |  SELECT doc_id + 20000000 AS doc_id,
         |         CASE WHEN len($toks) > 5
         |              THEN array_to_string(($toks)[6:], ' ')
         |              ELSE text END AS text
         |    FROM documents),
         |batch AS (
         |  SELECT doc_id + 10000000 AS doc_id, text FROM documents
         |  UNION ALL SELECT doc_id, text FROM mut
         |  UNION ALL SELECT doc_id + 10000000 AS doc_id, text FROM mut),
         |k1 AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
         |k2 AS (SELECT min(doc_id) AS doc_id FROM batch
         |       WHERE text NOT IN (SELECT text FROM documents)
         |       GROUP BY text)
         |SELECT doc_id FROM k1
         |UNION ALL SELECT doc_id FROM k2
         |ORDER BY doc_id""".stripMargin

    // shared by dedup_incremental_semantic and its persisted-cluster-index
    // roundtrip: the index stores exactly the seeds and assignments the
    // rescan computes, so both probes share one contract
    val incrementalSemDedupSql = {
      def assigned(src: String) =
        s"""SELECT cid, cv, cluster FROM (
           |    SELECT e.vec_id AS cid, e.embedding AS cv,
           |           s.centroid_id AS cluster,
           |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
           |             ${VectorOpsSql.cosine("e.embedding", "s.cvec")} DESC,
           |             s.centroid_id) AS rn
           |    FROM $src e, seeds s)
           |  WHERE rn = 1""".stripMargin
      s"""WITH batch AS (
         |  SELECT vec_id + 10000000 AS vec_id, embedding
         |  FROM embeddings WHERE vec_id % 5 = 0
         |  UNION ALL
         |  SELECT vec_id + 20000000 AS vec_id,
         |         list_transform(embedding, x -> -x) AS embedding
         |  FROM embeddings WHERE vec_id % 7 = 0),
         |seeds AS (SELECT vec_id AS centroid_id, embedding AS cvec
         |          FROM embeddings ORDER BY vec_id LIMIT 8),
         |ca AS (${assigned("embeddings")}),
         |ba AS (${assigned("batch")}),
         |chit AS (SELECT DISTINCT b.cid FROM ba b JOIN ca c
         |           ON b.cluster = c.cluster
         |         WHERE ${VectorOpsSql.cosine("b.cv", "c.cv")}
         |               >= CAST(0.8 AS DOUBLE)),
         |wdrop AS (SELECT DISTINCT b.cid FROM ba a JOIN ba b
         |            ON a.cluster = b.cluster AND a.cid < b.cid
         |          WHERE ${VectorOpsSql.cosine("a.cv", "b.cv")}
         |                >= CAST(0.8 AS DOUBLE))
         |SELECT vec_id FROM batch
         |WHERE vec_id NOT IN (SELECT cid FROM chit)
         |  AND vec_id NOT IN (SELECT cid FROM wdrop)
         |ORDER BY vec_id""".stripMargin
    }

    // shared by dedup_incremental_neardup and its persisted-band-index
    // roundtrip: the index stores exactly the bands/shingles the rescan
    // computes, so both probes share one contract
    // parameterized on the CORPUS source so the retraction oracle can
    // restate the probe against a rebuild-from-filtered-corpus index
    def incrementalNearDupSqlFrom(corpusSrc: String) = {
        val thash = TextOpsSql.tokenHashes("tk")
        val shingles = TextOpsSql.shingleHashes("th")
        val sig = TextOpsSql.minHashSignature("ss")
        val bucketCase = (0 until TextOps.Bands)
          .map(b => s"WHEN ${b} THEN ${TextOpsSql.bandHash("sig", b)}")
          .mkString("CASE band ", " ", " END")
        def setsOf(src: String) =
          s"""SELECT doc_id, list_distinct($shingles) AS ss FROM (
             |  SELECT doc_id, $thash AS th FROM (
             |    SELECT doc_id, ${TextOpsSql.tokens("text")} AS tk FROM $src))""".stripMargin
        s"""WITH batch AS (
           |  SELECT doc_id + 10000000 AS doc_id,
           |         CASE WHEN len($toks) > 5
           |              THEN array_to_string(($toks)[6:], ' ')
           |              ELSE text END AS text
           |    FROM documents),
           |bd AS (${setsOf("batch")}),
           |cd AS (${setsOf(corpusSrc)}),
           |bsg AS (SELECT doc_id, ss, $sig AS sig FROM bd),
           |csg AS (SELECT doc_id, ss, $sig AS sig FROM cd),
           |bb AS (SELECT doc_id, ss, band, $bucketCase AS bucket
           |       FROM bsg, (VALUES (0), (1), (2), (3)) b(band)),
           |cb AS (SELECT doc_id, ss, band, $bucketCase AS bucket
           |       FROM csg, (VALUES (0), (1), (2), (3)) b(band)),
           |chit AS (SELECT DISTINCT l.doc_id
           |         FROM bb l JOIN cb r
           |           ON l.band = r.band AND l.bucket = r.bucket
           |         WHERE ${TextOpsSql.jaccard("l.ss", "r.ss")}
           |               >= CAST(0.7 AS DOUBLE)),
           |wdrop AS (SELECT DISTINCT r.doc_id
           |          FROM bb l JOIN bb r
           |            ON l.band = r.band AND l.bucket = r.bucket
           |           AND l.doc_id < r.doc_id
           |          WHERE ${TextOpsSql.jaccard("l.ss", "r.ss")}
           |                >= CAST(0.7 AS DOUBLE))
           |SELECT doc_id FROM batch
           |WHERE doc_id NOT IN (SELECT doc_id FROM chit)
           |  AND doc_id NOT IN (SELECT doc_id FROM wdrop)
           |ORDER BY doc_id""".stripMargin
    }
    val incrementalNearDupSql = incrementalNearDupSqlFrom("documents")

    // one builder for every IVF-shaped oracle: seeds, nearest-seed
    // assignment, nprobe probes, and the per-query top-5 are shared;
    // a variant supplies an extra CTE deriving its candidate table from
    // `assigned` plus the column candidates score on — so the IVF shape
    // (seed count, nprobe, tie-breaks) has exactly one place to change
    def ivfShapedSql(
        extraCte: String, candSrc: String, scoreCol: String): String =
      s"""WITH seeds AS (SELECT vec_id AS centroid_id, embedding AS cvec
           |               FROM embeddings ORDER BY vec_id LIMIT 16),
           |assigned AS (
           |  SELECT cid, cv, cluster FROM (
           |    SELECT e.vec_id AS cid, e.embedding AS cv,
           |           s.centroid_id AS cluster,
           |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
           |             ${VectorOpsSql.cosine("e.embedding", "s.cvec")} DESC,
           |             s.centroid_id) AS rn
           |    FROM embeddings e, seeds s)
           |  WHERE rn = 1),$extraCte
           |probes AS (
           |  SELECT query_id, qvec, cluster FROM (
           |    SELECT q.vec_id AS query_id, q.embedding AS qvec,
           |           s.centroid_id AS cluster,
           |           row_number() OVER (PARTITION BY q.vec_id ORDER BY
           |             ${VectorOpsSql.cosine("q.embedding", "s.cvec")} DESC,
           |             s.centroid_id) AS rn
           |    FROM embeddings q, seeds s WHERE q.vec_id < 8)
           |  WHERE rn <= 4),
           |scored AS (
           |  SELECT p.query_id, a.cid AS neighbor_id,
           |         ${VectorOpsSql.cosine("p.qvec", s"a.$scoreCol")} AS cos
           |  FROM probes p JOIN $candSrc a USING (cluster)
           |  WHERE a.cid <> p.query_id)
           |SELECT query_id, neighbor_id, round(cos, 6) AS cosine FROM (
           |  SELECT query_id, neighbor_id, cos,
           |         row_number() OVER (PARTITION BY query_id
           |                            ORDER BY cos DESC, neighbor_id) AS rn
           |  FROM scored) WHERE rn <= 5
           |ORDER BY query_id, neighbor_id""".stripMargin

    val ivfTopKSql = ivfShapedSql("", "assigned", "cv")

    // the SQ8 restatement: same seeds/assignment/probes, but candidates
    // score as cosine over their int8 quantized codes — scale cancels in
    // cosine, so the oracle (like the probe) derives it only to BUILD
    // the codes, never to score
    val ivfSq8TopKSql = ivfShapedSql(
      s"""
           |quant AS (
           |  SELECT cid, cluster, ${VectorOpsSql.quantize("cv", "sc")} AS qv
           |  FROM (SELECT cid, cluster, cv,
           |               ${VectorOpsSql.quantScale("cv")} AS sc
           |        FROM assigned)),""".stripMargin,
      "quant", "qv")

    Map(
      "q1_pricing_summary" ->
        """SELECT l_returnflag, l_linestatus,
          |       round(sum(l_quantity), 2) AS sum_qty,
          |       round(sum(l_extendedprice), 2) AS sum_base_price,
          |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
          |       round(avg(l_quantity), 4) AS avg_qty,
          |       count(*) AS count_order
          |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
          |GROUP BY l_returnflag, l_linestatus
          |ORDER BY l_returnflag, l_linestatus""".stripMargin,

      "s1_dataset_scan" ->
        """SELECT dataset FROM (
          |  SELECT DISTINCT strftime(o_orderdate, '%Y%m%d%H%M%S') AS dataset
          |  FROM orders) WHERE dataset < '19980101000000' ORDER BY dataset""".stripMargin,

      "s2_completeness_antijoin" ->
        """SELECT c_custkey FROM customer c
          |WHERE NOT EXISTS (SELECT 1 FROM orders o
          |                  WHERE o.o_custkey = c.c_custkey
          |                    AND o.o_totalprice > 300000)
          |ORDER BY c_custkey""".stripMargin,

      "p1_column_intersection" ->
        """SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
          |FROM lineitem WHERE l_orderkey % 100 = 0
          |ORDER BY l_orderkey, l_linenumber""".stripMargin,

      "p3_watermark_filter" ->
        """SELECT dataset FROM (
          |  SELECT DISTINCT strftime(o_orderdate, '%Y%m%d%H%M%S') AS dataset
          |  FROM orders)
          |WHERE dataset > '19970101000000' AND dataset < '19980101000000'
          |ORDER BY dataset""".stripMargin,

      "p4_change_filter" ->
        """SELECT DISTINCT user_id FROM events
          |WHERE lower(event_type) = 'purchase' ORDER BY user_id""".stripMargin,

      "p6_expiry_predicate" ->
        """SELECT o_orderkey FROM orders
          |WHERE o_orderdate < TIMESTAMP '1996-01-01' AND o_orderstatus <> 'F'
          |ORDER BY o_orderkey""".stripMargin,

      "j1_anti_delete" ->
        s"""$ClassifySql
           |SELECT o_orderkey, action FROM actions WHERE action = 'D'
           |ORDER BY o_orderkey""".stripMargin,

      "j2_anti_insert" ->
        s"""$ClassifySql
           |SELECT o_orderkey, action FROM actions WHERE action = 'I'
           |ORDER BY o_orderkey""".stripMargin,

      "j3_nullsafe_classify" ->
        s"""$ClassifySql
           |SELECT o_orderkey, action FROM actions ORDER BY o_orderkey, action""".stripMargin,

      "j3x_unique_classify" ->
        s"""$ClassifyXSql
           |SELECT o_orderkey, action FROM actions ORDER BY o_orderkey, action""".stripMargin,

      "j4_full_diff" ->
        s"""$ScenarioSql
           |SELECT o_orderkey, action FROM (
           |  SELECT COALESCE(cur.o_orderkey, inc.o_orderkey) AS o_orderkey,
           |         CASE WHEN cur.o_orderkey IS NULL THEN 'I'
           |              WHEN inc.o_orderkey IS NULL THEN 'D'
           |              WHEN NOT ($CompareSql) THEN 'U' END AS action
           |  FROM cur FULL OUTER JOIN inc ON cur.o_orderkey = inc.o_orderkey)
           |WHERE action IS NOT NULL ORDER BY o_orderkey""".stripMargin,

      "j5_keyswap_repair" ->
        """WITH inc AS (
          |  SELECT CASE WHEN s_suppkey % 3 = 0 THEN s_suppkey + 1000000
          |              ELSE s_suppkey END AS s_suppkey, s_name
          |  FROM supplier),
          |chg AS (SELECT s_suppkey + 1000000 AS s_suppkey FROM supplier
          |        WHERE s_suppkey % 3 = 0),
          |stale AS (
          |  SELECT t.s_suppkey FROM inc i
          |  JOIN chg c ON i.s_suppkey = c.s_suppkey
          |  JOIN supplier t ON i.s_name IS NOT DISTINCT FROM t.s_name
          |                 AND i.s_suppkey <> t.s_suppkey)
          |SELECT DISTINCT s_suppkey FROM (
          |  SELECT s_suppkey FROM chg UNION ALL SELECT s_suppkey FROM stale)
          |ORDER BY s_suppkey""".stripMargin,

      "j6_stats_join" ->
        """SELECT r_name, n_name, count(*) AS n_customers,
          |       round(sum(c_acctbal), 2) AS total_acctbal
          |FROM customer
          |JOIN nation ON c_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

      "e2_apply_actions" ->
        s"""$ClassifySql
           |SELECT o_orderkey FROM (
           |  SELECT o_orderkey FROM cur
           |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM actions
           |                           WHERE action IN ('D', 'U', 'X'))
           |  UNION ALL
           |  SELECT o_orderkey FROM inc
           |  WHERE o_orderkey IN (SELECT o_orderkey FROM actions
           |                       WHERE action IN ('I', 'U', 'X')))
           |ORDER BY o_orderkey""".stripMargin,

      "a1_count_by_action" ->
        s"""$ClassifySql
           |SELECT action, count(*) AS n FROM actions
           |GROUP BY action ORDER BY action""".stripMargin,

      "a2_tolerance_check" ->
        s"""$ScenarioSql
           |SELECT old_count, new_count,
           |       new_count < CAST(ceil(old_count * 0.95) AS BIGINT) AS tol_warn,
           |       new_count < CAST(ceil(old_count * 0.20) AS BIGINT) AS tol_error
           |FROM (SELECT (SELECT count(*) FROM orders) AS old_count,
           |             (SELECT count(*) FROM inc) AS new_count)""".stripMargin,

      "a3_exists_check" ->
        """SELECT c_mktsegment, count(*) AS n_customers FROM customer c
          |WHERE EXISTS (SELECT 1 FROM orders o
          |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
          |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

      "a4_event_duration" ->
        """SELECT event_type,
          |       CAST(floor(epoch(max(ts))) AS BIGINT)
          |       - CAST(floor(epoch(min(ts))) AS BIGINT) AS duration_s
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

      "a5_watermark_fold" ->
        """SELECT event_type, max(strftime(ts, '%Y-%m-%d %H:%M:%S')) AS last_ts
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

      "a6_string_agg" ->
        """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
          |FROM nation JOIN region ON n_regionkey = r_regionkey
          |GROUP BY r_name ORDER BY r_name""".stripMargin,

      "o3_latest_dataset" ->
        """SELECT max(strftime(o_orderdate, '%Y%m%d%H%M%S')) AS dataset
          |FROM orders""".stripMargin,

      "o4_top1_prefer" ->
        """SELECT p_partkey, p_size FROM part
          |ORDER BY p_size DESC, p_partkey LIMIT 1""".stripMargin,

      "u1_union_distinct" ->
        """SELECT DISTINCT custkey FROM (
          |  SELECT o_custkey AS custkey FROM orders WHERE o_orderkey % 2 = 0
          |  UNION ALL
          |  SELECT o_custkey AS custkey FROM orders WHERE o_orderkey % 3 = 0
          |  UNION ALL
          |  SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0)
          |ORDER BY custkey""".stripMargin,

      "u2_except" ->
        """SELECT c_custkey FROM (
          |  SELECT c_custkey FROM customer
          |  EXCEPT
          |  SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
          |ORDER BY c_custkey""".stripMargin,

      "f1_lower_fold" ->
        """SELECT DISTINCT lower(o_orderpriority) AS priority FROM orders
          |ORDER BY priority""".stripMargin,

      "f2_split_explode" ->
        s"""SELECT token, count(*) AS n FROM (
           |  SELECT unnest($toks) AS token
           |  FROM documents WHERE doc_id < 20)
           |GROUP BY token ORDER BY token""".stripMargin,

      "f5_parse_timestamp" ->
        """SELECT dataset,
          |       CAST(floor(epoch(strptime(dataset, '%Y%m%d%H%M%S'))) AS BIGINT)
          |         AS epoch_s
          |FROM (SELECT DISTINCT strftime(o_orderdate, '%Y%m%d%H%M%S') AS dataset
          |      FROM orders)
          |ORDER BY dataset LIMIT 50""".stripMargin,

      "f6_date_arith" ->
        """SELECT o_orderstatus,
          |       CAST(max(datediff('day', o_orderdate::DATE, DATE '1998-12-01'))
          |            AS BIGINT) AS max_age_days,
          |       CAST(min(datediff('day', o_orderdate::DATE, DATE '1998-12-01'))
          |            AS BIGINT) AS min_age_days
          |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

      "f8_coalesce_default" ->
        """SELECT c_mktsegment,
          |       round(sum(coalesce(CASE WHEN c_acctbal < 0 THEN NULL
          |                               ELSE c_acctbal END, 0.0)), 2) AS total_bal
          |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

      "f9_ceil_threshold" ->
        """SELECT o_orderstatus, count(*) AS n,
          |       CAST(ceil(count(*) * 0.95) AS BIGINT) AS tol_threshold
          |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

      "f11_name_format" ->
        """SELECT schema_name,
          |       CAST(regexp_extract(schema_name, '(\d+)$', 1) AS BIGINT) AS parsed_id
          |FROM (SELECT DISTINCT 'bde_upload_' || CAST(o_orderkey % 97 AS VARCHAR)
          |        AS schema_name FROM orders)
          |ORDER BY schema_name""".stripMargin,

      "dedup_exact" ->
        s"""WITH $ExactDupCorpusSql
           |SELECT min(doc_id) AS kept_id, count(*) AS n_dups
           |FROM corpus GROUP BY sha256(text) ORDER BY kept_id""".stripMargin,

      "dedup_keep_first" ->
        s"""WITH $ExactDupCorpusSql
           |SELECT doc_id FROM corpus
           |QUALIFY row_number() OVER (PARTITION BY sha256(text)
           |                           ORDER BY doc_id) = 1
           |ORDER BY doc_id""".stripMargin,

      // the same corpus construction (composed originals, decomposed
      // +70000 variants), canonicalized by DuckDB's own nfc_normalize
      // before the digest partition — every variant must collapse onto
      // its original, so the survivor set is exactly the originals
      "dedup_exact_normalized" ->
        """WITH base AS (
          |  SELECT doc_id, text || ' caf' || chr(233) || ' ' || chr(197) ||
          |           'ngstr' || chr(246) || 'm' AS text
          |  FROM documents WHERE doc_id < 200),
          |variants AS (
          |  SELECT doc_id + 70000 AS doc_id,
          |         substr(text, 1, length(text) - 14) || ' caf' || 'e' ||
          |           chr(769) || ' ' || chr(8491) || 'ngstro' || chr(776) ||
          |           'm' AS text
          |  FROM base),
          |u AS (SELECT * FROM base UNION ALL SELECT * FROM variants)
          |SELECT doc_id
          |FROM (SELECT doc_id, nfc_normalize(text) AS nt FROM u)
          |QUALIFY row_number() OVER (PARTITION BY sha256(nt)
          |                           ORDER BY doc_id) = 1
          |ORDER BY doc_id""".stripMargin,

      "dedup_minhash_lsh" -> {
        val thash = TextOpsSql.tokenHashes("toks")
        val shingles = TextOpsSql.shingleHashes("thash")
        val sig = TextOpsSql.minHashSignature("shingles")
        val bucketCase = (0 until TextOps.Bands)
          .map(b => s"WHEN ${b} THEN ${TextOpsSql.bandHash("sig", b)}")
          .mkString("CASE band ", " ", " END")
        s"""WITH $NearDupCorpusSql,
           |tok AS (SELECT doc_id, $toks AS toks FROM corpus),
           |th AS (SELECT doc_id, $thash AS thash FROM tok),
           |sh AS (SELECT doc_id, list_distinct($shingles) AS shingles FROM th),
           |sg AS (SELECT doc_id, shingles, $sig AS sig FROM sh),
           |bands AS (SELECT doc_id, shingles, band, $bucketCase AS bucket
           |          FROM sg, (VALUES (0), (1), (2), (3)) b(band))
           |SELECT id_a, id_b, jaccard FROM (
           |  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
           |         round(${TextOpsSql.jaccard("l.shingles", "r.shingles")}, 6)
           |           AS jaccard
           |  FROM bands l JOIN bands r
           |    ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id)
           |WHERE jaccard >= 0.0 ORDER BY id_a, id_b""".stripMargin
      },

      // capped-LSH semantics stated doc-level: bucket hotness = DISTINCT
      // texts per (band, bucket) (the Spark side counts representatives —
      // one per distinct text by construction), pairs join only inside
      // non-hot buckets, and identical-text pairs (jaccard exactly 1.0)
      // union in unconditionally — a hot bucket must not suppress them
      "dedup_minhash_capped" -> {
        val thash = TextOpsSql.tokenHashes("toks")
        val shingles = TextOpsSql.shingleHashes("thash")
        val sig = TextOpsSql.minHashSignature("shingles")
        val bucketCase = (0 until TextOps.Bands)
          .map(b => s"WHEN ${b} THEN ${TextOpsSql.bandHash("sig", b)}")
          .mkString("CASE band ", " ", " END")
        s"""WITH $NearDupCorpusSql,
           |tok AS (SELECT doc_id, md5(text) AS digest, $toks AS toks
           |        FROM corpus),
           |th AS (SELECT doc_id, digest, $thash AS thash FROM tok),
           |sh AS (SELECT doc_id, digest, list_distinct($shingles) AS shingles
           |       FROM th),
           |sg AS (SELECT doc_id, digest, shingles, $sig AS sig FROM sh),
           |bands AS (SELECT doc_id, digest, shingles, band,
           |                 $bucketCase AS bucket
           |          FROM sg, (VALUES (0), (1), (2), (3)) b(band)),
           |hot AS (SELECT band, bucket FROM bands
           |        GROUP BY band, bucket HAVING count(DISTINCT digest) > 2),
           |kept AS (SELECT k.* FROM bands k LEFT JOIN hot h
           |           ON k.band = h.band AND k.bucket = h.bucket
           |         WHERE h.band IS NULL),
           |cross_pairs AS (
           |  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
           |         round(${TextOpsSql.jaccard("l.shingles", "r.shingles")}, 6)
           |           AS jaccard
           |  FROM kept l JOIN kept r
           |    ON l.band = r.band AND l.bucket = r.bucket
           |   AND l.doc_id < r.doc_id),
           |intra AS (
           |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           |         CAST(1.0 AS DOUBLE) AS jaccard
           |  FROM sg a JOIN sg b
           |    ON a.digest = b.digest AND a.doc_id < b.doc_id
           |   AND len(a.shingles) > 0)
           |SELECT id_a, id_b, jaccard
           |FROM (SELECT * FROM cross_pairs UNION SELECT * FROM intra)
           |WHERE jaccard >= 0.0 ORDER BY id_a, id_b""".stripMargin
      },

      "dedup_minhash_keep" -> {
        val thash = TextOpsSql.tokenHashes("toks")
        val shingles = TextOpsSql.shingleHashes("thash")
        val sig = TextOpsSql.minHashSignature("shingles")
        val bucketCase = (0 until TextOps.Bands)
          .map(b => s"WHEN ${b} THEN ${TextOpsSql.bandHash("sig", b)}")
          .mkString("CASE band ", " ", " END")
        // filter on the UNROUNDED jaccard — the Spark side thresholds the
        // exact value, and a rounded 0.4999.. -> 0.5 would diverge
        s"""WITH $NearDupCorpusSql,
           |tok AS (SELECT doc_id, $toks AS toks FROM corpus),
           |th AS (SELECT doc_id, $thash AS thash FROM tok),
           |sh AS (SELECT doc_id, list_distinct($shingles) AS shingles FROM th),
           |sg AS (SELECT doc_id, shingles, $sig AS sig FROM sh),
           |bands AS (SELECT doc_id, shingles, band, $bucketCase AS bucket
           |          FROM sg, (VALUES (0), (1), (2), (3)) b(band)),
           |dropped AS (SELECT DISTINCT r.doc_id AS id_b
           |            FROM bands l JOIN bands r
           |              ON l.band = r.band AND l.bucket = r.bucket
           |             AND l.doc_id < r.doc_id
           |            WHERE ${TextOpsSql.jaccard("l.shingles", "r.shingles")}
           |                  >= 0.5)
           |SELECT doc_id FROM corpus
           |WHERE doc_id NOT IN (SELECT id_b FROM dropped)
           |ORDER BY doc_id""".stripMargin
      },

      // verdicts restated from id arithmetic only — the markup shapes
      // never appear in the oracle
      "html_meta_robots" ->
        """SELECT doc_id,
          |       doc_id % 4 = 0 AS noindex,
          |       doc_id % 4 IN (0, 1) AS nofollow
          |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,

      // survivors + verdicts from id arithmetic: %4=0 drops (noindex),
      // %4=1 passes with nofollow, the rest pass clean
      "stream_meta_robots_gate" ->
        """SELECT doc_id, doc_id % 4 = 1 AS nofollow
          |FROM documents
          |WHERE doc_id < 100 AND doc_id % 4 <> 0
          |ORDER BY doc_id""".stripMargin,

      // the four per-doc links and their verdicts from construction
      "html_links_nofollow" ->
        """SELECT doc_id,
          |       'https://h.test' || p || CAST(doc_id AS VARCHAR) AS link,
          |       nf AS nofollow
          |FROM documents,
          |     (VALUES ('/plain/', FALSE), ('/nf/', TRUE),
          |             ('/ext/', TRUE), ('/unq/', TRUE)) t(p, nf)
          |WHERE doc_id < 100 ORDER BY doc_id, link""".stripMargin,

      // every group restated from id arithmetic alone: the head's URL is
      // the canonical key, the head its survivor — markup, extraction,
      // and resolution never appear in the oracle
      "dedup_canonical" ->
        """SELECT 'https://graft.test/doc/' || CAST(doc_id AS VARCHAR)
          |         AS canonical_url,
          |       doc_id AS kept_id
          |FROM documents WHERE doc_id < 90 AND doc_id % 3 = 0
          |ORDER BY canonical_url""".stripMargin,

      // the FULL accumulated pair set's transitive closure, cold — the
      // engine's star-edge merge must reproduce it exactly
      "dedup_components_merged" -> ComponentsMergeOracleSql,

      // identical cold closure — the at-rest maintenance path must land
      // on the same labels the from-scratch recompute does
      "dedup_component_index_merged" -> ComponentsMergeOracleSql,

      "dedup_components" -> {
        val thash = TextOpsSql.tokenHashes("toks")
        val shingles = TextOpsSql.shingleHashes("thash")
        val sig = TextOpsSql.minHashSignature("shingles")
        val bucketCase = (0 until TextOps.Bands)
          .map(b => s"WHEN ${b} THEN ${TextOpsSql.bandHash("sig", b)}")
          .mkString("CASE band ", " ", " END")
        // transitive closure as a recursive CTE: (id, label) reachable
        // pairs, min label per id = min node of the component — exactly the
        // fixpoint the Spark side iterates to (threshold on the UNROUNDED
        // jaccard, as dedup_minhash_keep does)
        s"""WITH RECURSIVE $NearDupCorpusSql,
           |tok AS (SELECT doc_id, $toks AS toks FROM corpus),
           |th AS (SELECT doc_id, $thash AS thash FROM tok),
           |sh AS (SELECT doc_id, list_distinct($shingles) AS shingles FROM th),
           |sg AS (SELECT doc_id, shingles, $sig AS sig FROM sh),
           |bands AS (SELECT doc_id, shingles, band, $bucketCase AS bucket
           |          FROM sg, (VALUES (0), (1), (2), (3)) b(band)),
           |pairs AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
           |          FROM bands l JOIN bands r
           |            ON l.band = r.band AND l.bucket = r.bucket
           |           AND l.doc_id < r.doc_id
           |          WHERE ${TextOpsSql.jaccard("l.shingles", "r.shingles")}
           |                >= 0.5),
           |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
           |          UNION ALL SELECT id_b, id_a FROM pairs),
           |reach(id, label) AS (
           |  SELECT doc_id, doc_id FROM corpus
           |  UNION
           |  SELECT e.src, r.label FROM reach r JOIN edges e ON e.dst = r.id)
           |SELECT id AS doc_id, min(label) AS component
           |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin
      },

      "dedup_components_keep" -> {
        val thash = TextOpsSql.tokenHashes("toks")
        val shingles = TextOpsSql.shingleHashes("thash")
        val sig = TextOpsSql.minHashSignature("shingles")
        val bucketCase = (0 until TextOps.Bands)
          .map(b => s"WHEN ${b} THEN ${TextOpsSql.bandHash("sig", b)}")
          .mkString("CASE band ", " ", " END")
        // same fixpoint as dedup_components; keep ids whose component label
        // is their own id
        s"""WITH RECURSIVE $NearDupCorpusSql,
           |tok AS (SELECT doc_id, $toks AS toks FROM corpus),
           |th AS (SELECT doc_id, $thash AS thash FROM tok),
           |sh AS (SELECT doc_id, list_distinct($shingles) AS shingles FROM th),
           |sg AS (SELECT doc_id, shingles, $sig AS sig FROM sh),
           |bands AS (SELECT doc_id, shingles, band, $bucketCase AS bucket
           |          FROM sg, (VALUES (0), (1), (2), (3)) b(band)),
           |pairs AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
           |          FROM bands l JOIN bands r
           |            ON l.band = r.band AND l.bucket = r.bucket
           |           AND l.doc_id < r.doc_id
           |          WHERE ${TextOpsSql.jaccard("l.shingles", "r.shingles")}
           |                >= 0.5),
           |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
           |          UNION ALL SELECT id_b, id_a FROM pairs),
           |reach(id, label) AS (
           |  SELECT doc_id, doc_id FROM corpus
           |  UNION
           |  SELECT e.src, r.label FROM reach r JOIN edges e ON e.dst = r.id),
           |comp AS (SELECT id, min(label) AS component FROM reach GROUP BY id)
           |SELECT doc_id FROM corpus
           |WHERE doc_id NOT IN (SELECT id FROM comp WHERE component <> id)
           |ORDER BY doc_id""".stripMargin
      },

      "dedup_cluster_best" -> {
        val thash = TextOpsSql.tokenHashes("toks")
        val shingles = TextOpsSql.shingleHashes("thash")
        val sig = TextOpsSql.minHashSignature("shingles")
        val bucketCase = (0 until TextOps.Bands)
          .map(b => s"WHEN ${b} THEN ${TextOpsSql.bandHash("sig", b)}")
          .mkString("CASE band ", " ", " END")
        val score = QualityOpsSql.qualityScore("text", "toks")
        // same component fixpoint as dedup_components; winner per
        // component = highest quality score, lowest id on ties — matching
        // Spark's max_by(id, struct(score, -id))
        s"""WITH RECURSIVE $NearDupCorpusSql,
           |tok AS (SELECT doc_id, text, $toks AS toks FROM corpus),
           |th AS (SELECT doc_id, $thash AS thash FROM tok),
           |sh AS (SELECT doc_id, list_distinct($shingles) AS shingles FROM th),
           |sg AS (SELECT doc_id, shingles, $sig AS sig FROM sh),
           |bands AS (SELECT doc_id, shingles, band, $bucketCase AS bucket
           |          FROM sg, (VALUES (0), (1), (2), (3)) b(band)),
           |pairs AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
           |          FROM bands l JOIN bands r
           |            ON l.band = r.band AND l.bucket = r.bucket
           |           AND l.doc_id < r.doc_id
           |          WHERE ${TextOpsSql.jaccard("l.shingles", "r.shingles")}
           |                >= 0.5),
           |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
           |          UNION ALL SELECT id_b, id_a FROM pairs),
           |reach(id, label) AS (
           |  SELECT doc_id, doc_id FROM corpus
           |  UNION
           |  SELECT e.src, r.label FROM reach r JOIN edges e ON e.dst = r.id),
           |comp AS (SELECT id, min(label) AS component FROM reach GROUP BY id),
           |qs AS (SELECT doc_id, $score AS score FROM tok),
           |winners AS (
           |  SELECT component, id AS keep FROM (
           |    SELECT c.component, c.id,
           |           row_number() OVER (PARTITION BY c.component
           |             ORDER BY s.score DESC, c.id) AS rn
           |    FROM comp c JOIN qs s ON s.doc_id = c.id)
           |  WHERE rn = 1)
           |SELECT doc_id FROM corpus
           |WHERE doc_id NOT IN (
           |  SELECT c.id FROM comp c JOIN winners w
           |    ON c.component = w.component AND c.id <> w.keep)
           |ORDER BY doc_id""".stripMargin
      },

      // the composed ingest loop: exact keep-first + corpus NOT IN, then
      // banding + jaccard >= 0.7 over the exact survivors (corpus hits
      // and the within-survivor rule), then the unrolled classifier
      // training CTEs with the margin-sign gate over the near survivors
      "pipeline_ingest" -> {
        import graft.operators.ClassifierSql
        val thash = TextOpsSql.tokenHashes("tk")
        val shingles = TextOpsSql.shingleHashes("th")
        val sig = TextOpsSql.minHashSignature("ss")
        val bucketCase = (0 until TextOps.Bands)
          .map(b => s"WHEN ${b} THEN ${TextOpsSql.bandHash("sig", b)}")
          .mkString("CASE band ", " ", " END")
        def setsOf(src: String) =
          s"""SELECT doc_id, list_distinct($shingles) AS ss FROM (
             |  SELECT doc_id, $thash AS th FROM (
             |    SELECT doc_id, ${TextOpsSql.tokens("text")} AS tk FROM $src))""".stripMargin
        s"""WITH cdocs AS (
           |  SELECT doc_id,
           |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
           |         ${TextOpsSql.tokenHashes(toks)} AS th
           |  FROM documents),
           |${ClassifierSql.trainCtes(64, 2, 1L, 1L)},
           |mut AS (
           |  SELECT doc_id + 20000000 AS doc_id,
           |         CASE WHEN len($toks) > 5
           |              THEN array_to_string(($toks)[6:], ' ')
           |              ELSE text END AS text
           |    FROM documents),
           |batch AS (
           |  SELECT doc_id + 10000000 AS doc_id, text FROM documents
           |  UNION ALL SELECT doc_id, text FROM mut
           |  UNION ALL SELECT doc_id + 10000000 AS doc_id, text FROM mut),
           |exact AS (SELECT doc_id, text FROM (
           |  SELECT doc_id, text,
           |         row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
           |  FROM batch WHERE text NOT IN (SELECT text FROM documents))
           |  WHERE rn = 1),
           |bd AS (${setsOf("exact")}),
           |cd AS (${setsOf("documents")}),
           |bsg AS (SELECT doc_id, ss, $sig AS sig FROM bd),
           |csg AS (SELECT doc_id, ss, $sig AS sig FROM cd),
           |bb AS (SELECT doc_id, ss, band, $bucketCase AS bucket
           |       FROM bsg, (VALUES (0), (1), (2), (3)) b(band)),
           |cb AS (SELECT doc_id, ss, band, $bucketCase AS bucket
           |       FROM csg, (VALUES (0), (1), (2), (3)) b(band)),
           |chit AS (SELECT DISTINCT l.doc_id
           |         FROM bb l JOIN cb r
           |           ON l.band = r.band AND l.bucket = r.bucket
           |         WHERE ${TextOpsSql.jaccard("l.ss", "r.ss")}
           |               >= CAST(0.7 AS DOUBLE)),
           |wdrop AS (SELECT DISTINCT r.doc_id
           |          FROM bb l JOIN bb r
           |            ON l.band = r.band AND l.bucket = r.bucket
           |           AND l.doc_id < r.doc_id
           |          WHERE ${TextOpsSql.jaccard("l.ss", "r.ss")}
           |                >= CAST(0.7 AS DOUBLE)),
           |near AS (SELECT e.doc_id, e.text FROM exact e
           |         WHERE e.doc_id NOT IN (SELECT doc_id FROM chit)
           |           AND e.doc_id NOT IN (SELECT doc_id FROM wdrop)),
           |nth AS (SELECT doc_id, ${TextOpsSql.tokenHashes(toks)} AS th
           |        FROM near),
           |sc AS (${ClassifierSql.marginOver("nth", 64, 2)})
           |SELECT doc_id FROM sc WHERE margin_units >= 0
           |ORDER BY doc_id""".stripMargin
      },

      "dedup_incremental" -> incrementalDedupSql,
      "dedup_incremental_bloom" -> incrementalDedupSql,
      // the persisted-digest-index probe stores exactly the digests the
      // rescan computes — same contract, same SQL
      "dedup_index_roundtrip" -> incrementalDedupSql,

      "dedup_repeated_ngrams" -> {
        val thash = TextOpsSql.tokenHashes("tk")
        s"""WITH $NearDupCorpusSql,
           |d AS (SELECT doc_id, $toks AS tk FROM corpus),
           |h AS (SELECT doc_id, $thash AS th FROM d),
           |w AS (SELECT doc_id, unnest(${TextOpsSql.shingleHashes("th", 20)})
           |        AS wh FROM h)
           |SELECT wh, count(DISTINCT doc_id) AS n_docs,
           |       min(doc_id) AS first_doc
           |FROM w GROUP BY wh HAVING count(DISTINCT doc_id) > 1
           |ORDER BY wh""".stripMargin
      },

      "dedup_repeated_spans" -> {
        val thash = TextOpsSql.tokenHashes("tk")
        s"""WITH $NearDupCorpusSql,
           |d AS (SELECT doc_id, $toks AS tk FROM corpus),
           |h AS (SELECT doc_id, $thash AS th FROM d),
           |sh AS (SELECT doc_id, ${TextOpsSql.shingleHashes("th", 20)} AS s
           |       FROM h),
           |w AS (SELECT doc_id, u.pos AS pos, u.wh AS wh FROM (
           |        SELECT doc_id, unnest(list_transform(range(0, len(s)),
           |          i -> struct_pack(pos := i, wh := s[i+1]))) AS u
           |        FROM sh)),
           |hot AS (SELECT wh FROM w GROUP BY wh
           |        HAVING count(DISTINCT doc_id) > 1)
           |SELECT doc_id, CAST(pos AS BIGINT) AS pos
           |FROM w WHERE wh IN (SELECT wh FROM hot)
           |ORDER BY doc_id, pos""".stripMargin
      },

      "dedup_span_excise" -> {
        val thash = TextOpsSql.tokenHashes("tk")
        s"""WITH $NearDupCorpusSql,
           |d AS (SELECT doc_id, $toks AS tk FROM corpus),
           |h AS (SELECT doc_id, len(tk) AS n_toks, $thash AS th FROM d),
           |sh AS (SELECT doc_id, n_toks,
           |              ${TextOpsSql.shingleHashes("th", 20)} AS s FROM h),
           |w AS (SELECT doc_id, n_toks, u.pos AS pos, u.wh AS wh FROM (
           |        SELECT doc_id, n_toks, unnest(list_transform(range(0, len(s)),
           |          i -> struct_pack(pos := i, wh := s[i+1]))) AS u
           |        FROM sh)),
           |hot AS (SELECT doc_id, pos FROM (
           |          SELECT doc_id, pos,
           |                 min(doc_id) OVER (PARTITION BY wh) AS mn,
           |                 max(doc_id) OVER (PARTITION BY wh) AS mx
           |          FROM w) WHERE mn <> mx),
           |cut AS (SELECT doc_id, count(*) AS n_cut FROM (
           |          SELECT DISTINCT doc_id, unnest(range(pos, pos + 20)) AS ti
           |          FROM hot) GROUP BY doc_id)
           |SELECT d2.doc_id, CAST(len(d2.tk) AS BIGINT) AS n_tokens,
           |       CAST(coalesce(cut.n_cut, 0) AS BIGINT) AS n_cut,
           |       round(1.0 - coalesce(cut.n_cut, 0)::DOUBLE /
           |             len(d2.tk)::DOUBLE, 6) AS keep_frac
           |FROM d d2 LEFT JOIN cut USING (doc_id)
           |WHERE len(d2.tk) > 0
           |ORDER BY d2.doc_id""".stripMargin
      },

      // first occurrence = min packed (doc_id, pos) key; doc ids stay
      // < 100000 and pos < 100000 on every SF, so doc_id*100000+pos is the
      // same lexicographic order Spark's min(struct(id, pos)) uses
      "dedup_paragraphs" ->
        s"""WITH $ParagraphCorpusSql,
           |firsts AS (SELECT line, min(doc_id * 100000 + pos) AS fk
           |           FROM lines GROUP BY line),
           |kept AS (SELECT l.doc_id, l.pos, l.line
           |         FROM lines l JOIN firsts f
           |           ON l.line = f.line
           |          AND l.doc_id * 100000 + l.pos = f.fk)
           |SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
           |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      "dedup_boilerplate" ->
        s"""WITH $ParagraphCorpusSql,
           |hot AS (SELECT line FROM lines GROUP BY line
           |        HAVING count(DISTINCT doc_id) >= 3),
           |kept AS (SELECT l.doc_id, l.pos, l.line FROM lines l
           |         WHERE l.line NOT IN (SELECT line FROM hot))
           |SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
           |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      // the LSH pipeline restated (band join proposes) + DuckDB's OWN
      // levenshtein verifying — an independent two-stage formulation.
      // DuckDB counts bytes, Spark counts chars; equal on this ASCII
      // corpus (the char contract is pinned in EditConfirmSpec)
      "dedup_soft_weights" ->
        s"""WITH $ExactDupCorpusSql,
           |counts AS (SELECT text, CAST(count(*) AS BIGINT) AS n_copies
           |           FROM corpus GROUP BY text)
           |SELECT doc_id, n_copies,
           |       round(1.0 / n_copies, 6) AS weight
           |FROM corpus JOIN counts USING (text)
           |ORDER BY doc_id""".stripMargin,

      "dedup_edit_confirm" -> {
        val thash = TextOpsSql.tokenHashes("toks")
        val shingles = TextOpsSql.shingleHashes("thash")
        val sig = TextOpsSql.minHashSignature("shingles")
        val bucketCase = (0 until TextOps.Bands)
          .map(b => s"WHEN ${b} THEN ${TextOpsSql.bandHash("sig", b)}")
          .mkString("CASE band ", " ", " END")
        s"""WITH $NearDupCorpusSql,
           |tok AS (SELECT doc_id, $toks AS toks FROM corpus),
           |th AS (SELECT doc_id, $thash AS thash FROM tok),
           |sh AS (SELECT doc_id, list_distinct($shingles) AS shingles FROM th),
           |sg AS (SELECT doc_id, $sig AS sig FROM sh),
           |bands AS (SELECT doc_id, band, $bucketCase AS bucket
           |          FROM sg, (VALUES (0), (1), (2), (3)) b(band)),
           |pairs AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
           |          FROM bands l JOIN bands r
           |            ON l.band = r.band AND l.bucket = r.bucket
           |           AND l.doc_id < r.doc_id)
           |SELECT id_a, id_b, lev, edit_sim FROM (
           |  SELECT p.id_a, p.id_b,
           |         CAST(levenshtein(a.text, b.text) AS BIGINT) AS lev,
           |         round(1.0 - CAST(levenshtein(a.text, b.text) AS DOUBLE)
           |               / greatest(len(a.text), len(b.text), 1), 6)
           |           AS edit_sim
           |  FROM pairs p
           |  JOIN corpus a ON a.doc_id = p.id_a
           |  JOIN corpus b ON b.doc_id = p.id_b) v
           |WHERE edit_sim >= 0.8 ORDER BY id_a, id_b""".stripMargin
      },

      "boilerplate_host_lines" ->
        s"""WITH $HostTemplateCorpusSql
           |SELECT source, line, count(DISTINCT doc_id) AS n_docs
           |FROM lines GROUP BY source, line
           |HAVING count(DISTINCT doc_id) >= 3
           |ORDER BY source, line""".stripMargin,

      "boilerplate_host_strip" ->
        s"""WITH $HostTemplateCorpusSql,
           |hot AS (SELECT source, line FROM lines GROUP BY source, line
           |        HAVING count(DISTINCT doc_id) >= 3),
           |kept AS (SELECT l.doc_id, l.pos, l.line FROM lines l
           |         WHERE NOT EXISTS (SELECT 1 FROM hot h
           |                           WHERE h.source = l.source
           |                             AND h.line = l.line))
           |SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
           |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      "dedup_host_mirrors" ->
        s"""WITH $MirrorCorpusSql,
           |hd AS (SELECT DISTINCT source AS host, sha256(text) AS kh
           |       FROM corpus),
           |ok AS (SELECT kh FROM hd GROUP BY kh
           |       HAVING count(DISTINCT host) <= 256),
           |sizes AS (SELECT host, count(*) AS n FROM hd GROUP BY host),
           |shared AS (SELECT l.host AS host_a, r.host AS host_b,
           |                  count(*) AS n_shared
           |           FROM hd l JOIN hd r
           |             ON l.kh = r.kh AND l.host < r.host
           |           WHERE l.kh IN (SELECT kh FROM ok)
           |           GROUP BY 1, 2)
           |SELECT host_a, host_b, n_shared, jaccard FROM (
           |  SELECT host_a, host_b, n_shared,
           |         round(CAST(n_shared AS DOUBLE)
           |               / (sa.n + sb.n - n_shared), 6) AS jaccard
           |  FROM shared
           |  JOIN sizes sa ON sa.host = host_a
           |  JOIN sizes sb ON sb.host = host_b) v
           |WHERE jaccard >= 0.5 ORDER BY host_a, host_b""".stripMargin,

      // selection key restated as ONE integer composite (n_chars, doc_id)
      // lexicographic — valid while doc_id < 100000, which TESTDATA.md's
      // scales guarantee; margin is on the raw score
      "pref_pairs" ->
        """SELECT source,
          |       arg_max(doc_id, n_chars * 100000 + doc_id) AS chosen_id,
          |       arg_min(doc_id, n_chars * 100000 + doc_id) AS rejected_id,
          |       round(CAST(max(n_chars) - min(n_chars) AS DOUBLE), 6)
          |         AS margin
          |FROM documents GROUP BY source
          |HAVING max(n_chars) - min(n_chars) >= 50
          |ORDER BY source""".stripMargin,

      "sft_chat_format" -> {
        val sampleToks = TextOpsSql.tokens("sample")
        s"""WITH s AS (
           |  SELECT doc_id,
           |         '<|system|>' || chr(10) ||
           |         'You are a helpful assistant.' || chr(10) ||
           |         '<|user|>' || chr(10) ||
           |         array_to_string(($toks)[1:8], ' ') || chr(10) ||
           |         '<|assistant|>' || chr(10) || text || '<|end|>'
           |           AS sample
           |    FROM documents WHERE text NOT LIKE '%<|%')
           |SELECT doc_id, sample, n_tokens FROM (
           |  SELECT doc_id, sample,
           |         CAST(len($sampleToks) AS BIGINT) AS n_tokens FROM s) v
           |WHERE n_tokens <= 60 ORDER BY doc_id""".stripMargin
      },

      "c4_line_filter" ->
        s"""WITH $C4CorpusSql,
           |${operators.LineRulesSql.keptLines(minWords = 5, blocklist = Seq("spark"))}
           |${operators.LineRulesSql.reassembled(minLines = 2)}""".stripMargin,

      "ccnet_ppl_buckets" -> operators.PerplexitySql.pplBuckets(
        "documents", "doc_id", "text", "lang = 'en'"),

      "html_extract" ->
        s"""WITH h AS (SELECT doc_id, $SynthHtmlSql AS html FROM documents)
           |SELECT doc_id, ${HtmlOpsSql.htmlToText("html")} AS text
           |FROM h ORDER BY doc_id""".stripMargin,

      "html_main_text" ->
        s"""WITH h AS (SELECT doc_id, $SynthHtmlSql AS html FROM documents)
           |SELECT doc_id, ${HtmlOpsSql.mainText("html", 0.5)} AS text
           |FROM h ORDER BY doc_id""".stripMargin,

      // independent restatement of the WARC fixture's construction: the
      // HTTP head re-concatenated byte-for-byte (chr(13)||chr(10) CRLFs),
      // the HTML payloads re-rendered via SynthHtmlSql, digests and byte
      // lengths recomputed in SQL — a framing bug in the reader (lost
      // bytes, header bleed into payload, gzip member boundary slip)
      // changes a digest or a length and fails the row
      "source_jsonl" ->
        """SELECT doc_id, lang, text FROM documents
          |WHERE doc_id % 13 <> 0 ORDER BY doc_id""".stripMargin,

      "source_csv" ->
        """SELECT doc_id, lang, text FROM documents
          |WHERE doc_id % 17 <> 0 ORDER BY doc_id""".stripMargin,

      "source_csv_quarantine" ->
        """SELECT CAST(count(*) AS BIGINT) AS n_rows,
          |       CAST(sum(CASE WHEN doc_id % 17 <> 0 THEN 1 ELSE 0 END)
          |            AS BIGINT) AS n_good,
          |       CAST(sum(CASE WHEN doc_id % 17 = 0 THEN 1 ELSE 0 END)
          |            AS BIGINT) AS n_bad,
          |       CAST(sum(CASE WHEN doc_id % 17 <> 0 THEN 1 ELSE 0 END)
          |            AS BIGINT) AS n_with_key
          |FROM documents""".stripMargin,

      "source_jsonl_quarantine" ->
        """SELECT CAST(count(*) AS BIGINT) AS n_rows,
          |       CAST(sum(CASE WHEN doc_id % 13 <> 0 THEN 1 ELSE 0 END)
          |            AS BIGINT) AS n_good,
          |       CAST(sum(CASE WHEN doc_id % 13 = 0 THEN 1 ELSE 0 END)
          |            AS BIGINT) AS n_bad,
          |       CAST(sum(CASE WHEN doc_id % 13 <> 0 THEN 1 ELSE 0 END)
          |            AS BIGINT) AS n_with_key
          |FROM documents""".stripMargin,

      "warc_read" ->
        s"""WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 40),
           |hh AS (SELECT 'HTTP/1.1 200 OK' || chr(13) || chr(10) ||
           |         'Content-Type: text/html' || chr(13) || chr(10) ||
           |         chr(13) || chr(10) AS v),
           |resp AS (
           |  SELECT 'https://graft.test/doc/' || CAST(doc_id AS VARCHAR)
           |           AS target_uri,
           |         'response' AS rec_type,
           |         'application/http;msgtype=response' AS content_type,
           |         CAST(octet_length(encode(
           |           (SELECT v FROM hh) || $SynthHtmlSql)) AS BIGINT)
           |           AS content_length,
           |         sha256((SELECT v FROM hh) || $SynthHtmlSql) AS payload_sha
           |  FROM docs WHERE doc_id % 2 = 0),
           |res AS (
           |  SELECT 'https://graft.test/doc/' || CAST(doc_id AS VARCHAR)
           |           AS target_uri,
           |         'resource' AS rec_type, 'text/plain' AS content_type,
           |         CAST(octet_length(encode(text)) AS BIGINT) AS content_length,
           |         sha256(text) AS payload_sha
           |  FROM docs WHERE doc_id % 2 = 1),
           |info AS (
           |  SELECT CAST(NULL AS VARCHAR) AS target_uri,
           |         'warcinfo' AS rec_type,
           |         'application/warc-fields' AS content_type,
           |         CAST(15 AS BIGINT) AS content_length,
           |         sha256('software: graft') AS payload_sha
           |  FROM range(0, 4))
           |SELECT * FROM resp UNION ALL SELECT * FROM res
           |UNION ALL SELECT * FROM info
           |ORDER BY target_uri, rec_type""".stripMargin,

      // archive bytes → curated text, restated: the response payloads'
      // markup re-rendered from the corpus and pushed through the same
      // SQL extraction pipeline the html_main_text oracle uses
      "warc_extract" ->
        s"""WITH h AS (
           |  SELECT 'https://graft.test/doc/' || CAST(doc_id AS VARCHAR)
           |           AS target_uri,
           |         $SynthHtmlSql AS html
           |  FROM documents WHERE doc_id < 40 AND doc_id % 2 = 0)
           |SELECT target_uri, ${HtmlOpsSql.mainText("html", 0.5)} AS text
           |FROM h ORDER BY target_uri""".stripMargin,

      // the DECODED text restated from the markup construction — the
      // oracle never sees wire bytes, so the engine's chunk de-framing
      // and gunzip must reconstruct the exact entity or the extracted
      // text diverges (all four encoding arms are present, doc_id % 4)
      "warc_http_decode" ->
        s"""WITH h AS (
           |  SELECT 'https://graft.test/doc/' || CAST(doc_id AS VARCHAR)
           |           AS target_uri,
           |         $SynthHtmlSql AS html
           |  FROM documents WHERE doc_id < 24)
           |SELECT target_uri, ${HtmlOpsSql.mainText("html", 0.5)} AS text
           |FROM h ORDER BY target_uri""".stripMargin,

      // the gate rule restated from the same markup construction the
      // stream's response records carry (response = even doc_ids < 40)
      "stream_warc_gate" ->
        s"""WITH h AS (SELECT doc_id, $SynthHtmlSql AS html
           |           FROM documents WHERE doc_id < 40 AND doc_id % 2 = 0),
           |x AS (SELECT doc_id,
           |             replace(${HtmlOpsSql.mainText("html", 0.5)},
           |                     chr(10), ' ') AS text
           |      FROM h)
           |SELECT 'https://graft.test/doc/' || CAST(doc_id AS VARCHAR)
           |         AS target_uri,
           |       CAST(len(list_filter(string_split(text, ' '),
           |                 t -> t <> '')) AS BIGINT) AS n_tokens
           |FROM x
           |WHERE len(list_filter(string_split(text, ' '), t -> t <> '')) >= 40
           |ORDER BY target_uri""".stripMargin,

      // every probed capture restated from the construction: SURT =
      // reversed host labels + ')' + path, lengths/digests recomputed as
      // in warc_read — an index row that lost its offset provenance or
      // picked up a stale digest through append/compact fails here
      "warc_cdx_indexed" ->
        s"""WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 12),
           |hh AS (SELECT 'HTTP/1.1 200 OK' || chr(13) || chr(10) ||
           |         'Content-Type: text/html' || chr(13) || chr(10) ||
           |         chr(13) || chr(10) AS v)
           |SELECT 'test,graft)/doc/' || CAST(doc_id AS VARCHAR) AS surt,
           |       'https://graft.test/doc/' || CAST(doc_id AS VARCHAR)
           |         AS target_uri,
           |       CASE WHEN doc_id % 2 = 0 THEN 'response'
           |            ELSE 'resource' END AS rec_type,
           |       CAST(CASE WHEN doc_id % 2 = 0
           |            THEN octet_length(encode(
           |              (SELECT v FROM hh) || $SynthHtmlSql))
           |            ELSE octet_length(encode(text)) END AS BIGINT)
           |         AS content_length,
           |       CASE WHEN doc_id % 2 = 0
           |            THEN sha256((SELECT v FROM hh) || $SynthHtmlSql)
           |            ELSE sha256(text) END AS digest
           |FROM docs ORDER BY target_uri""".stripMargin,

      // the two change points per doc restated from construction: the
      // January capture (first) and the March capture (content change);
      // February's identical payload must be gone
      "warc_cdx_collapse" ->
        """SELECT 'test,graft)/doc/' || CAST(doc_id AS VARCHAR) AS surt,
          |       'https://graft.test/doc/' || CAST(doc_id AS VARCHAR)
          |         AS target_uri,
          |       CASE k WHEN 0 THEN '2026-01-01T00:00:00Z'
          |              ELSE '2026-03-01T00:00:00Z' END AS warc_date,
          |       CAST(octet_length(encode(
          |         (CASE k WHEN 0 THEN 'crawlA ' ELSE 'crawlB ' END)
          |           || text)) AS BIGINT) AS content_length,
          |       sha256((CASE k WHEN 0 THEN 'crawlA ' ELSE 'crawlB ' END)
          |         || text) AS digest
          |FROM documents, (SELECT unnest([0, 1]) AS k)
          |WHERE doc_id < 20
          |ORDER BY target_uri, warc_date""".stripMargin,

      "warc_cdx_window" ->
        """WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 20),
          |win AS (
          |  SELECT 'window' AS arm,
          |         'test,graft)/doc/' || CAST(doc_id AS VARCHAR) AS surt,
          |         'https://graft.test/doc/' || CAST(doc_id AS VARCHAR)
          |           AS target_uri,
          |         '2026-02-01T00:00:00Z' AS warc_date,
          |         CAST(octet_length(encode('crawl1 ' || text)) AS BIGINT)
          |           AS content_length,
          |         sha256('crawl1 ' || text) AS digest
          |  FROM docs ORDER BY surt, warc_date, digest LIMIT 12),
          |clp AS (
          |  SELECT 'collapse' AS arm,
          |         'test,graft)/doc/' || CAST(doc_id AS VARCHAR) AS surt,
          |         'https://graft.test/doc/' || CAST(doc_id AS VARCHAR)
          |           AS target_uri,
          |         CASE k WHEN 0 THEN '2026-01-01T00:00:00Z'
          |                ELSE '2026-03-01T00:00:00Z' END AS warc_date,
          |         CAST(octet_length(encode(
          |           (CASE k WHEN 0 THEN 'crawlA ' ELSE 'crawlB ' END)
          |             || text)) AS BIGINT) AS content_length,
          |         sha256((CASE k WHEN 0 THEN 'crawlA ' ELSE 'crawlB ' END)
          |           || text) AS digest
          |  FROM docs, (SELECT unnest([0, 1]) AS k)
          |  ORDER BY surt, warc_date, digest LIMIT 15)
          |SELECT * FROM win UNION ALL SELECT * FROM clp
          |ORDER BY arm, surt, warc_date""".stripMargin,

      // every sidecar row from the fixture arithmetic: META verdicts on
      // ids%5=0, canonical on ids%3=0, and per page exactly two edges —
      // /p<id> (anchored, followed) sorting before /q<id> (nofollow)
      "warc_wat_roundtrip" ->
        """WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 30),
          |pages AS (
          |  SELECT 'https://graft.test/doc/' || CAST(doc_id AS VARCHAR)
          |           AS target_uri,
          |         doc_id % 5 = 0 AS noindex, doc_id % 5 = 0 AS nofollow,
          |         CASE WHEN doc_id % 3 = 0 THEN
          |           'https://graft.test/c' || CAST(doc_id AS VARCHAR)
          |         END AS canonical,
          |         doc_id
          |  FROM d)
          |SELECT target_uri, noindex, nofollow, canonical,
          |       CAST(u.s AS INT) AS link_seq,
          |       CASE u.s WHEN 0 THEN 'https://graft.test/p'
          |            ELSE 'https://graft.test/q' END
          |         || CAST(doc_id AS VARCHAR) AS link,
          |       CASE u.s WHEN 0 THEN 'to ' || CAST(doc_id AS VARCHAR)
          |            ELSE 'skip' END AS anchor,
          |       u.s = 1 AS link_nofollow
          |FROM pages, (SELECT unnest(range(0, 2)) AS s) u
          |ORDER BY target_uri, link_seq""".stripMargin,

      // both match-type answer sets from the host/path arithmetic: the
      // domain arm is hosts 0-2 of the ladder (graftother.test — host 3
      // — must be absent, the label-boundary trap), the prefix arm is
      // graft.test paths under /doc by STRING prefix (so /docs rows
      // appear; /img must not)
      "warc_cdx_prefix" ->
        """WITH d AS (
          |  SELECT doc_id, text,
          |         CASE doc_id % 4
          |           WHEN 0 THEN 'graft.test'
          |           WHEN 1 THEN 'sub.graft.test'
          |           WHEN 2 THEN 'a.sub.graft.test'
          |           ELSE 'graftother.test' END AS host,
          |         CASE doc_id % 4
          |           WHEN 0 THEN 'test,graft'
          |           WHEN 1 THEN 'test,graft,sub'
          |           WHEN 2 THEN 'test,graft,sub,a'
          |           ELSE 'test,graftother' END AS rhost,
          |         CASE doc_id % 3
          |           WHEN 0 THEN '/doc/'
          |           WHEN 1 THEN '/docs/'
          |           ELSE '/img/' END || CAST(doc_id AS VARCHAR) AS path
          |  FROM documents WHERE doc_id < 24),
          |caps AS (
          |  SELECT rhost || ')' || path AS surt,
          |         'https://' || host || path AS target_uri,
          |         CAST(octet_length(encode(text)) AS BIGINT)
          |           AS content_length,
          |         sha256(text) AS digest,
          |         doc_id % 4 AS hk, doc_id % 3 AS pk
          |  FROM d)
          |SELECT * FROM (
          |  SELECT 'domain' AS arm, surt, target_uri, content_length,
          |         digest
          |  FROM caps WHERE hk < 3
          |  UNION ALL
          |  SELECT 'prefix', surt, target_uri, content_length, digest
          |  FROM caps WHERE hk = 0 AND pk < 2)
          |ORDER BY arm, target_uri""".stripMargin,

      // every ranged-fetched record restated from the construction (the
      // warc_read per-record shape over the probed doc_ids) — a stored
      // span addressing the wrong member or slicing a record re-parses
      // to different fields/digest and fails here
      "warc_fetch_ranged" ->
        s"""WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 16),
           |hh AS (SELECT 'HTTP/1.1 200 OK' || chr(13) || chr(10) ||
           |         'Content-Type: text/html' || chr(13) || chr(10) ||
           |         chr(13) || chr(10) AS v)
           |SELECT 'https://graft.test/doc/' || CAST(doc_id AS VARCHAR)
           |         AS target_uri,
           |       CASE WHEN doc_id % 2 = 0 THEN 'response'
           |            ELSE 'resource' END AS rec_type,
           |       CASE WHEN doc_id % 2 = 0
           |            THEN 'application/http;msgtype=response'
           |            ELSE 'text/plain' END AS content_type,
           |       CAST(CASE WHEN doc_id % 2 = 0
           |            THEN octet_length(encode(
           |              (SELECT v FROM hh) || $SynthHtmlSql))
           |            ELSE octet_length(encode(text)) END AS BIGINT)
           |         AS content_length,
           |       CASE WHEN doc_id % 2 = 0
           |            THEN sha256((SELECT v FROM hh) || $SynthHtmlSql)
           |            ELSE sha256(text) END AS payload_sha
           |FROM docs ORDER BY target_uri""".stripMargin,

      // the February capture's fields restated from construction —
      // closest-to-T arbitration and date carriage never echo
      "warc_cdx_temporal" ->
        """WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 20)
          |SELECT 'test,graft)/doc/' || CAST(doc_id AS VARCHAR) AS surt,
          |       'https://graft.test/doc/' || CAST(doc_id AS VARCHAR)
          |         AS target_uri,
          |       '2026-02-01T00:00:00Z' AS warc_date,
          |       CAST(octet_length(encode('crawl1 ' || text)) AS BIGINT)
          |         AS content_length,
          |       sha256('crawl1 ' || text) AS digest
          |FROM docs ORDER BY target_uri""".stripMargin,

      // all 40 captures of the probed host restated from construction —
      // the warc_cdx_indexed shape with the host partition key; an
      // append or compaction that dropped/duplicated a capture, or a
      // probe that missed a release's directory file, fails here
      "warc_cdx_host_indexed" ->
        s"""WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 40),
           |hh AS (SELECT 'HTTP/1.1 200 OK' || chr(13) || chr(10) ||
           |         'Content-Type: text/html' || chr(13) || chr(10) ||
           |         chr(13) || chr(10) AS v)
           |SELECT 'test,graft' AS surt_host,
           |       'https://graft.test/doc/' || CAST(doc_id AS VARCHAR)
           |         AS target_uri,
           |       CASE WHEN doc_id % 2 = 0 THEN 'response'
           |            ELSE 'resource' END AS rec_type,
           |       CAST(CASE WHEN doc_id % 2 = 0
           |            THEN octet_length(encode(
           |              (SELECT v FROM hh) || $SynthHtmlSql))
           |            ELSE octet_length(encode(text)) END AS BIGINT)
           |         AS content_length,
           |       CASE WHEN doc_id % 2 = 0
           |            THEN sha256((SELECT v FROM hh) || $SynthHtmlSql)
           |            ELSE sha256(text) END AS digest
           |FROM docs ORDER BY target_uri, rec_type""".stripMargin,

      // the conversion records' text restated from the markup
      // construction (the warc_extract oracle's pipeline) — the oracle
      // never sees WET shard bytes, so a write→read defect anywhere in
      // the roundtrip diverges the text or the framing fields
      "warc_wet_roundtrip" -> WetRoundtripOracleSql,

      // the emitted archive restated from construction: URI and HTTP
      // message from doc_id arithmetic, lengths from the string itself;
      // the three-door agreement verdicts are the expected `true`s — a
      // wrong write-time offset/digest/length shows up as false
      "warc_write_roundtrip" ->
        """WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 60),
          |p AS (SELECT
          |  'https://h' || CAST(doc_id % 5 AS VARCHAR) || '.test/p'
          |    || CAST(doc_id AS VARCHAR) AS target_uri,
          |  'HTTP/1.1 200 OK' || chr(13) || chr(10)
          |    || 'content-type: text/plain' || chr(13) || chr(10)
          |    || chr(13) || chr(10)
          |    || 'body ' || CAST(doc_id AS VARCHAR) AS body
          |  FROM d)
          |SELECT target_uri, CAST(length(body) AS BIGINT) AS content_length,
          |       body, true AS index_match, true AS span_match
          |FROM p ORDER BY target_uri""".stripMargin,

      // the streaming door commits per-batch shards of the SAME records
      // — the drain must be batch-boundary invisible
      "stream_wet_export" -> WetRoundtripOracleSql,

      // every new-crawl capture restated: ids captured by shards 0-1
      // (id%4 < 2) fold to revisit rows pointing at their shard of
      // origin with the payload elided; ids%4 ∈ {2,3} keep full rows;
      // digests/lengths recomputed as in warc_read
      "warc_revisit_dedup" ->
        s"""WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 40),
           |hh AS (SELECT 'HTTP/1.1 200 OK' || chr(13) || chr(10) ||
           |         'Content-Type: text/html' || chr(13) || chr(10) ||
           |         chr(13) || chr(10) AS v)
           |SELECT 'test,graft)/doc/' || CAST(doc_id AS VARCHAR) AS surt,
           |       'https://graft.test/doc/' || CAST(doc_id AS VARCHAR)
           |         AS target_uri,
           |       CASE WHEN doc_id % 4 < 2 THEN 'revisit'
           |            WHEN doc_id % 2 = 0 THEN 'response'
           |            ELSE 'resource' END AS rec_type,
           |       CASE WHEN doc_id % 2 = 0
           |            THEN sha256((SELECT v FROM hh) || $SynthHtmlSql)
           |            ELSE sha256(text) END AS digest,
           |       CAST(CASE WHEN doc_id % 2 = 0
           |            THEN octet_length(encode(
           |              (SELECT v FROM hh) || $SynthHtmlSql))
           |            ELSE octet_length(encode(text)) END AS BIGINT)
           |         AS content_length,
           |       doc_id % 4 < 2 AS payload_elided,
           |       CASE WHEN doc_id % 4 = 0 THEN 'shard0.warc'
           |            WHEN doc_id % 4 = 1 THEN 'shard1.warc' END
           |         AS refers_to_shard,
           |       doc_id % 4 < 2 AS has_refers_offset
           |FROM docs ORDER BY target_uri""".stripMargin,

      // the fetched ORIGINALS restated (the warc_read per-record shape
      // over the revisit ids, id%4 < 2) — a refers-to span addressing
      // the wrong original re-parses to different fields/digest
      "warc_revisit_fetch" ->
        s"""WITH docs AS (SELECT doc_id, text FROM documents
           |  WHERE doc_id < 40 AND doc_id % 4 < 2),
           |hh AS (SELECT 'HTTP/1.1 200 OK' || chr(13) || chr(10) ||
           |         'Content-Type: text/html' || chr(13) || chr(10) ||
           |         chr(13) || chr(10) AS v)
           |SELECT 'https://graft.test/doc/' || CAST(doc_id AS VARCHAR)
           |         AS target_uri,
           |       CASE WHEN doc_id % 2 = 0 THEN 'response'
           |            ELSE 'resource' END AS rec_type,
           |       CASE WHEN doc_id % 2 = 0
           |            THEN 'application/http;msgtype=response'
           |            ELSE 'text/plain' END AS content_type,
           |       CAST(CASE WHEN doc_id % 2 = 0
           |            THEN octet_length(encode(
           |              (SELECT v FROM hh) || $SynthHtmlSql))
           |            ELSE octet_length(encode(text)) END AS BIGINT)
           |         AS content_length,
           |       CASE WHEN doc_id % 2 = 0
           |            THEN sha256((SELECT v FROM hh) || $SynthHtmlSql)
           |            ELSE sha256(text) END AS payload_sha
           |FROM docs ORDER BY target_uri""".stripMargin,

      // latest-wins restated with the oracle's own max(fetch_time)
      // join-back (the engine uses one max_by aggregate); validator
      // values are opaque tokens rebuilt from the same id arithmetic
      "crawl_conditional_fetch" -> CondFetchOracleSql,

      // the stream door is a stateless projection — the drain must equal
      // the batch plan exactly, so the oracle is the SAME restatement
      "stream_conditional_fetch" -> CondFetchOracleSql,

      // lastmod arbitration restated over the shared state fixture: the
      // oracle recomputes due/new/modified/revalidate and gates the
      // validators on the revalidate arm with its own formulation
      "crawl_sitemap_refetch" -> SitemapRefetchOracleSql,

      // the PERSISTED-state variants must land on the identical rows —
      // the index stores exactly the state log the ephemeral plans
      // consumed, so the shared restatements bind them too
      "crawl_conditional_fetch_indexed" -> CondFetchOracleSql,
      "crawl_sitemap_refetch_indexed" -> SitemapRefetchOracleSql,
      "crawl_revisit_priority_indexed" -> RevisitOracleSql,
      "stream_conditional_fetch_indexed" -> CondFetchOracleSql,

      // the estimator chain recomputed independently, then the cycle's
      // four slots by (rounded priority desc, url) — nulls last, so
      // cold-start URLs never take a slot
      "crawl_revisit_schedule" ->
        """WITH c AS (
          |  SELECT 'https://e.test/u' || CAST(event_id % 97 AS VARCHAR)
          |           AS url,
          |         ts, event_type AS digest
          |  FROM events),
          |l AS (
          |  SELECT url, epoch_us(ts) AS us,
          |         lag(epoch_us(ts)) OVER w AS prev_us,
          |         CAST(digest <> lag(digest) OVER w AS INT) AS chg
          |  FROM c WINDOW w AS (PARTITION BY url ORDER BY ts, digest)),
          |g AS (
          |  SELECT url,
          |         count(prev_us) AS n_intervals,
          |         CAST(coalesce(sum(chg), 0) AS BIGINT) AS n_changes,
          |         avg(us - prev_us) / 1e6 AS mi,
          |         (epoch_us(TIMESTAMP '2024-02-15 00:00:00') - max(us))
          |           / 1e6 AS age_s
          |  FROM l GROUP BY url),
          |pri AS (
          |  SELECT url,
          |         round(CASE WHEN n_intervals > 0 AND mi > 0 THEN
          |           1 - exp(ln((n_intervals - n_changes + 0.5)
          |                      / (n_intervals + 0.5)) / mi * age_s) END, 6)
          |           AS priority
          |  FROM g),
          |r AS (
          |  SELECT url, priority,
          |         CAST(row_number() OVER (ORDER BY priority DESC
          |           NULLS LAST, url) - 1 AS BIGINT) AS slot
          |  FROM pri
          |  QUALIFY row_number() OVER (ORDER BY priority DESC NULLS LAST,
          |    url) <= 4)
          |SELECT url, priority, slot, CAST(slot * 10.0 AS DOUBLE)
          |         AS sched_s
          |FROM r ORDER BY slot""".stripMargin,

      // the closed 3-cycle loop over the durable stores, unrolled: per
      // cycle the oracle re-derives the per-host top-3 schedule with its
      // own window, the (id%7)+100 discovery fold (max priority over
      // discoverers), the never-fetched gate, and the tail merge — a
      // stale frontier swap, a leaked scheduled row, or a resurrected
      // fetched URL shifts some cycle's rows
      "crawl_cycle_loop" -> CrawlCycleLoopOracleSql,

      // the applicable rule set restated as VALUES (group selection
      // pre-resolved: par 0 = what graftbot sees on even hosts, par 1 =
      // the '*' fallback on odd hosts) and the RFC match as SQL argmax —
      // longest prefix, allow over disallow, no match admits
      "robots_gate" ->
        """WITH u AS (
          |  SELECT doc_id,
          |         CASE doc_id % 6
          |           WHEN 0 THEN '/public/page' || CAST(doc_id AS VARCHAR)
          |           WHEN 1 THEN '/private/page' || CAST(doc_id AS VARCHAR)
          |           WHEN 2 THEN '/private/ok/page' || CAST(doc_id AS VARCHAR)
          |           WHEN 3 THEN '/data/raw/x' || CAST(doc_id AS VARCHAR)
          |           WHEN 4 THEN '/data/clean' || CAST(doc_id AS VARCHAR)
          |           ELSE '' END AS rawpath,
          |         doc_id % 5 AS k
          |  FROM documents WHERE doc_id < 100),
          |p AS (
          |  SELECT doc_id,
          |         'https://h' || CAST(k AS VARCHAR) || '.test' || rawpath
          |           AS url,
          |         CASE WHEN rawpath = '' THEN '/' ELSE rawpath END AS path,
          |         k % 2 AS par
          |  FROM u),
          |r AS (SELECT * FROM (VALUES
          |        (0, FALSE, '/private'), (0, TRUE, '/private/ok'),
          |        (1, FALSE, '/private'), (1, FALSE, '/data/raw'),
          |        (1, TRUE, '/data')) t(par, allow, prefix)),
          |j AS (
          |  SELECT p.doc_id, p.url, r.allow, r.prefix
          |  FROM p LEFT JOIN r
          |    ON r.par = p.par AND starts_with(p.path, r.prefix)),
          |best AS (
          |  SELECT doc_id, url, allow, prefix,
          |         row_number() OVER (PARTITION BY doc_id
          |           ORDER BY length(prefix) DESC,
          |                    CAST(allow AS INT) DESC, prefix DESC) AS rn
          |  FROM j)
          |SELECT doc_id, url, coalesce(allow, TRUE) AS allowed,
          |       prefix AS rule_prefix
          |FROM best WHERE rn = 1 ORDER BY doc_id""".stripMargin,

      // the SELECTED rule set per host class restated as VALUES: host
      // k%3=0 resolves to the graftbot-news group (longest token), 1 to
      // the graftbot group (boundary-prefix via a versioned group line;
      // 'graft' must not match), 2 to '*' — then the same RFC argmax
      "robots_gate_tokens" ->
        """WITH u AS (
          |  SELECT doc_id,
          |         CASE doc_id % 4
          |           WHEN 0 THEN '/news-private/x' || CAST(doc_id AS VARCHAR)
          |           WHEN 1 THEN '/private/ok/y' || CAST(doc_id AS VARCHAR)
          |           WHEN 2 THEN '/private/z' || CAST(doc_id AS VARCHAR)
          |           ELSE '/data/w' || CAST(doc_id AS VARCHAR) END AS path,
          |         doc_id % 6 AS k
          |  FROM documents WHERE doc_id < 120),
          |p AS (
          |  SELECT doc_id,
          |         'https://h' || CAST(k AS VARCHAR) || '.test' || path
          |           AS url,
          |         path, k % 3 AS par
          |  FROM u),
          |r AS (SELECT * FROM (VALUES
          |        (0, FALSE, '/news-private'),
          |        (1, FALSE, '/private'), (1, TRUE, '/private/ok'),
          |        (2, FALSE, '/data')) t(par, allow, prefix)),
          |j AS (
          |  SELECT p.doc_id, p.url, r.allow, r.prefix
          |  FROM p LEFT JOIN r
          |    ON r.par = p.par AND starts_with(p.path, r.prefix)),
          |best AS (
          |  SELECT doc_id, url, allow, prefix,
          |         row_number() OVER (PARTITION BY doc_id
          |           ORDER BY length(prefix) DESC,
          |                    CAST(allow AS INT) DESC, prefix DESC) AS rn
          |  FROM j)
          |SELECT doc_id, url, coalesce(allow, TRUE) AS allowed,
          |       prefix AS rule_prefix
          |FROM best WHERE rn = 1 ORDER BY doc_id""".stripMargin,

      // the wildcard rules restated with HAND-WRITTEN translated regexes
      // (the engine derives its regexes by expression; a translation bug
      // cannot echo here) and the RFC argmax over pattern octet length
      "robots_gate_wildcard" ->
        """WITH u AS (
          |  SELECT doc_id,
          |         CASE doc_id % 6
          |           WHEN 0 THEN '/docs/file' || CAST(doc_id AS VARCHAR)
          |                       || '.html'
          |           WHEN 1 THEN '/files/report' || CAST(doc_id AS VARCHAR)
          |                       || '.pdf'
          |           WHEN 2 THEN '/docs/x' || CAST(doc_id AS VARCHAR)
          |                       || '.pdf'
          |           WHEN 3 THEN '/tmp/a' || CAST(doc_id AS VARCHAR)
          |                       || '/cache'
          |           WHEN 4 THEN '/files/report' || CAST(doc_id AS VARCHAR)
          |                       || '.pdfx'
          |           ELSE '/other' || CAST(doc_id AS VARCHAR) END AS path
          |  FROM documents WHERE doc_id < 120),
          |p AS (SELECT doc_id, 'https://w.test' || path AS url, path FROM u),
          |r AS (SELECT * FROM (VALUES
          |        (TRUE,  '/docs/*',      '^/docs/.*'),
          |        (FALSE, '/*.pdf$',      '^/.*\.pdf$'),
          |        (FALSE, '/docs',        '^/docs'),
          |        (FALSE, '/tmp/*/cache', '^/tmp/.*/cache'))
          |        t(allow, pat, rx)),
          |j AS (
          |  SELECT p.doc_id, p.url, r.allow, r.pat
          |  FROM p LEFT JOIN r ON regexp_matches(p.path, r.rx)),
          |best AS (
          |  SELECT doc_id, url, allow, pat,
          |         row_number() OVER (PARTITION BY doc_id
          |           ORDER BY length(pat) DESC,
          |                    CAST(allow AS INT) DESC, pat DESC) AS rn
          |  FROM j)
          |SELECT doc_id, url, coalesce(allow, TRUE) AS allowed,
          |       pat AS rule_prefix
          |FROM best WHERE rn = 1 ORDER BY doc_id""".stripMargin,

      // same restatement as robots_gate_wildcard — the door must agree
      // with the hand-written regex VALUES even though its match runs
      // as the per-row array fold rather than the batch join-argmax
      "stream_robots_gate" ->
        """WITH u AS (
          |  SELECT doc_id,
          |         CASE doc_id % 6
          |           WHEN 0 THEN '/docs/file' || CAST(doc_id AS VARCHAR)
          |                       || '.html'
          |           WHEN 1 THEN '/files/report' || CAST(doc_id AS VARCHAR)
          |                       || '.pdf'
          |           WHEN 2 THEN '/docs/x' || CAST(doc_id AS VARCHAR)
          |                       || '.pdf'
          |           WHEN 3 THEN '/tmp/a' || CAST(doc_id AS VARCHAR)
          |                       || '/cache'
          |           WHEN 4 THEN '/files/report' || CAST(doc_id AS VARCHAR)
          |                       || '.pdfx'
          |           ELSE '/other' || CAST(doc_id AS VARCHAR) END AS path
          |  FROM documents WHERE doc_id < 120),
          |p AS (SELECT doc_id, 'https://w.test' || path AS url, path FROM u),
          |r AS (SELECT * FROM (VALUES
          |        (TRUE,  '/docs/*',      '^/docs/.*'),
          |        (FALSE, '/*.pdf$',      '^/.*\.pdf$'),
          |        (FALSE, '/docs',        '^/docs'),
          |        (FALSE, '/tmp/*/cache', '^/tmp/.*/cache'))
          |        t(allow, pat, rx)),
          |j AS (
          |  SELECT p.doc_id, p.url, r.allow, r.pat
          |  FROM p LEFT JOIN r ON regexp_matches(p.path, r.rx)),
          |best AS (
          |  SELECT doc_id, url, allow, pat,
          |         row_number() OVER (PARTITION BY doc_id
          |           ORDER BY length(pat) DESC,
          |                    CAST(allow AS INT) DESC, pat DESC) AS rn
          |  FROM j)
          |SELECT doc_id, url, coalesce(allow, TRUE) AS allowed,
          |       pat AS rule_prefix
          |FROM best WHERE rn = 1 ORDER BY doc_id""".stripMargin,

      // every admitted frontier row restated from the construction
      // arithmetic (no XML in the oracle: loc with the UNESCAPED '&',
      // lastmod/priority from the same modular rules, admission = the
      // one Disallow prefix)
      "sitemap_discovery" ->
        """SELECT 'https://s.test' ||
          |         CASE WHEN doc_id % 5 = 0
          |              THEN '/private/p' || CAST(doc_id AS VARCHAR)
          |              ELSE '/docs/p' || CAST(doc_id AS VARCHAR) END ||
          |         CASE WHEN doc_id % 7 = 0 THEN '?a=1&b=2' ELSE '' END
          |         AS loc,
          |       CASE WHEN doc_id % 3 = 0
          |            THEN '2026-0' || CAST(doc_id % 9 + 1 AS VARCHAR)
          |                 || '-15' END AS lastmod,
          |       CASE WHEN doc_id % 4 = 0
          |            THEN CAST('0.' || CAST(doc_id % 10 AS VARCHAR)
          |                      AS DOUBLE) END AS priority,
          |       doc_id % 5 <> 0 AS allowed
          |FROM documents WHERE doc_id < 80 ORDER BY loc""".stripMargin,

      // the resolved per-host delays restated as hand-written VALUES
      // (par 0 = graftbot's own Crawl-delay 1; par 1 = the §2.2.1
      // exclusion trap, own delay-less group → DEFAULT 0.5, never the
      // '*' group's 9; par 2 = the '*' fallback 2.5; par 3 = no robots
      // → default) and the slotting as a SQL window over the same
      // (priority desc, url) order with the horizon cut
      "frontier_schedule" ->
        """WITH d AS (SELECT par, CAST(delay_s AS DOUBLE) AS delay_s
          |  FROM (VALUES
          |        (0, 1.0), (1, 0.5), (2, 2.5), (3, 0.5)) t(par, delay_s)),
          |u AS (
          |  SELECT doc_id,
          |         'https://' || source || '.test/doc/'
          |           || CAST(doc_id AS VARCHAR) AS url,
          |         source || '.test' AS host,
          |         CAST(n_chars % 11 AS DOUBLE) AS priority,
          |         CAST(substring(source, 4) AS INT) % 4 AS par
          |  FROM documents),
          |r AS (
          |  SELECT u.doc_id, u.url, u.host, u.priority, d.delay_s,
          |         row_number() OVER (PARTITION BY u.host
          |           ORDER BY u.priority DESC, u.url) - 1 AS slot
          |  FROM u JOIN d ON d.par = u.par)
          |SELECT doc_id, url, host, priority, slot, delay_s,
          |       slot * delay_s AS sched_s
          |FROM r WHERE slot * delay_s < 10.0 ORDER BY url""".stripMargin,

      // the Cho–Garcia-Molina estimator recomputed from the oracle's
      // own lag window: λ̂ = -ln((n-x+0.5)/(n+0.5))/ī per day, p =
      // 1-exp(-λ̂·age) against the same injected clock
      "frontier_revisit" -> RevisitOracleSql,

      // the whole damped fixpoint unrolled (ClassifierSql pattern):
      // same integer micro-unit update each round, '//' floors like
      // Spark's div on these non-negative values
      "graph_reciprocal" ->
        s"""WITH raw AS ($DocGraphRawSql),
           |aug AS (SELECT src, dst FROM raw
           |        UNION ALL
           |        SELECT dst AS src, src AS dst FROM raw WHERE src % 5 = 0),
           |e AS (SELECT DISTINCT src, dst FROM aug WHERE src <> dst),
           |j AS (SELECT e.src,
           |             CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END AS rr
           |      FROM e LEFT JOIN e r
           |        ON r.src = e.dst AND r.dst = e.src)
           |SELECT src AS node, CAST(count(*) AS BIGINT) AS out_degree,
           |       CAST(sum(rr) AS BIGINT) AS n_reciprocal,
           |       round(sum(rr)::DOUBLE / count(*), 6) AS recip_frac
           |FROM j GROUP BY src HAVING sum(rr) > 0
           |ORDER BY node""".stripMargin,

      "graph_pagerank" ->
        s"""WITH raw AS (
           |  $DocGraphRawSql),
           |${GraphSql.pagerankCtes(3)}
           |SELECT node, pr AS rank_units FROM r3 ORDER BY node""".stripMargin,

      // every HITS half-step replayed: edge-join raw sums, integer L1
      // normalization with the zero-total guard
      "graph_hits" ->
        s"""WITH raw AS (
           |  $DocGraphRawSql),
           |${GraphSql.hitsCtes(3)}
           |SELECT node, a3.s AS auth_units, h3.s AS hub_units
           |FROM a3 JOIN h3 USING (node) ORDER BY node""".stripMargin,

      // the surviving edge set from id arithmetic alone (markup and
      // directive parsing never appear), then the identical unrolled
      // integer fixpoint
      "graph_pagerank_nofollow" ->
        s"""WITH d AS (SELECT doc_id FROM documents),
           |raw AS (
           |  SELECT doc_id AS src, (doc_id * 3 + 1) % 500 AS dst FROM d
           |  WHERE doc_id % 10 <> 0
           |  UNION ALL
           |  SELECT doc_id, (doc_id * 7 + 5) % 500 FROM d
           |  WHERE doc_id % 10 <> 0 AND doc_id % 2 = 0),
           |${GraphSql.pagerankCtes(3)}
           |SELECT node, pr AS rank_units FROM r3 ORDER BY node""".stripMargin,

      // the whole chain restated: only the legit links appear (gate and
      // trap failures would add URLs), the noisy forms restate as their
      // CANONICAL construction, seeds subtract, min(doc_id) discovers
      "stream_crawl_loop" ->
        """WITH l AS (
          |  SELECT doc_id,
          |         'https://h' || CAST((doc_id * 3 + 1) % 500 % 5 AS VARCHAR)
          |           || '.test/dir/p'
          |           || CAST((doc_id * 3 + 1) % 500 AS VARCHAR)
          |           || '.html' AS curl
          |  FROM documents WHERE doc_id % 7 <> 0
          |  UNION ALL
          |  SELECT doc_id,
          |         'https://h' || CAST((doc_id * 7 + 5) % 500 % 5 AS VARCHAR)
          |           || '.test/dir/p'
          |           || CAST((doc_id * 7 + 5) % 500 AS VARCHAR)
          |           || '.html'
          |  FROM documents WHERE doc_id % 7 <> 0 AND doc_id % 3 = 0),
          |seeds AS (
          |  SELECT 'https://h' || CAST(doc_id % 5 AS VARCHAR)
          |           || '.test/dir/p' || CAST(doc_id AS VARCHAR)
          |           || '.html' AS curl
          |  FROM documents WHERE doc_id % 10 = 0)
          |SELECT l.curl, min(l.doc_id) AS discovered_by
          |FROM l LEFT JOIN seeds ON seeds.curl = l.curl
          |WHERE seeds.curl IS NULL
          |GROUP BY l.curl ORDER BY l.curl""".stripMargin,

      // ordered triple self-join over the undirected view — nothing
      // shared with the engine's degree orientation
      "graph_triangles" ->
        """WITH five AS (SELECT doc_id + 9000 AS n FROM documents
          |              WHERE doc_id < 5),
          |raw AS (
          |  SELECT doc_id AS src, (doc_id * 3 + 1) % 500 AS dst
          |  FROM documents WHERE doc_id % 7 <> 0
          |  UNION ALL
          |  SELECT doc_id, (doc_id * 7 + 5) % 500
          |  FROM documents WHERE doc_id % 7 <> 0 AND doc_id % 3 = 0
          |  UNION ALL
          |  SELECT a.n, b.n FROM five a JOIN five b ON a.n < b.n),
          |und AS (SELECT DISTINCT least(src, dst) AS u,
          |               greatest(src, dst) AS v
          |        FROM raw WHERE src <> dst),
          |tri AS (
          |  SELECT a.u AS x, a.v AS y, b.v AS z
          |  FROM und a JOIN und b ON b.u = a.v
          |             JOIN und c ON c.u = a.u AND c.v = b.v),
          |corners AS (
          |  SELECT x AS node FROM tri
          |  UNION ALL SELECT y FROM tri
          |  UNION ALL SELECT z FROM tri),
          |cnt AS (SELECT node, count(*) AS t FROM corners GROUP BY node),
          |nodes AS (SELECT src AS node FROM raw UNION SELECT dst FROM raw)
          |SELECT nodes.node,
          |       CAST(coalesce(cnt.t, 0) AS BIGINT) AS n_triangles
          |FROM nodes LEFT JOIN cnt ON cnt.node = nodes.node
          |ORDER BY nodes.node""".stripMargin,

      "url_redirects" -> {
        import graft.operators.RedirectsSql
        s"""WITH m AS (
           |  SELECT 'https://r.test/p' || CAST(doc_id AS VARCHAR) AS u,
           |         'https://r.test/p' || CAST(doc_id + 1 AS VARCHAR) AS v
           |  FROM documents WHERE doc_id % 10 <= 2 OR doc_id % 10 = 5
           |  UNION ALL
           |  SELECT 'https://r.test/p' || CAST(doc_id AS VARCHAR),
           |         'https://r.test/p' || CAST(doc_id - 1 AS VARCHAR)
           |  FROM documents WHERE doc_id % 10 = 6),
           |${RedirectsSql.stepCtes(8)}
           |SELECT s8.url, s8.cur AS final_url,
           |       CAST(s8.hops AS BIGINT) AS hops,
           |       mf.u IS NULL AS resolved
           |FROM s8 LEFT JOIN m mf ON mf.u = s8.cur
           |ORDER BY s8.url""".stripMargin
      },

      "frontier_budget" ->
        """WITH sc AS (SELECT source,
          |              CAST(sum(n_chars) AS BIGINT) AS score
          |            FROM documents GROUP BY source),
          |t AS (SELECT CAST(sum(score) AS BIGINT) AS tot FROM sc),
          |b AS (SELECT source, score,
          |             (score * 997) // tot AS base,
          |             (score * 997) % tot AS rem
          |      FROM sc CROSS JOIN t),
          |l AS (SELECT 997 - CAST(sum(base) AS BIGINT) AS leftover FROM b),
          |r AS (SELECT source, score, base,
          |             row_number() OVER (ORDER BY rem DESC, source) AS rn
          |      FROM b)
          |SELECT source, score,
          |       base + CASE WHEN rn <= leftover THEN 1 ELSE 0 END AS alloc
          |FROM r CROSS JOIN l ORDER BY source""".stripMargin,

      // independent self-join restatement; the hub's 12 out-links
      // exceed the cap, so none of its C(12,2) pairs may appear
      "graph_cocitation" ->
        """WITH raw AS (
          |  SELECT doc_id AS src, (doc_id * 3 + 1) % 500 AS dst
          |  FROM documents WHERE doc_id % 7 <> 0
          |  UNION ALL
          |  SELECT doc_id, (doc_id * 7 + 5) % 500
          |  FROM documents WHERE doc_id % 7 <> 0 AND doc_id % 3 = 0),
          |e AS (SELECT DISTINCT src, dst FROM raw),
          |ok AS (SELECT src FROM e GROUP BY src HAVING count(*) <= 8)
          |SELECT a.dst AS node_a, b.dst AS node_b, count(*) AS n_common
          |FROM e a JOIN e b ON a.src = b.src AND a.dst < b.dst
          |JOIN ok ON ok.src = a.src
          |GROUP BY 1, 2 ORDER BY node_a, node_b""".stripMargin,

      "graph_coupling" ->
        """WITH raw AS (
          |  SELECT doc_id AS src, (doc_id * 3 + 1) % 500 AS dst
          |  FROM documents WHERE doc_id % 7 <> 0
          |  UNION ALL
          |  SELECT doc_id, (doc_id * 7 + 5) % 500
          |  FROM documents WHERE doc_id % 7 <> 0 AND doc_id % 3 = 0),
          |e AS (SELECT DISTINCT src, dst FROM raw),
          |ok AS (SELECT dst FROM e GROUP BY dst HAVING count(*) <= 8)
          |SELECT a.src AS node_a, b.src AS node_b, count(*) AS n_common
          |FROM e a JOIN e b ON a.dst = b.dst AND a.src < b.src
          |JOIN ok ON ok.dst = a.dst
          |GROUP BY 1, 2 ORDER BY node_a, node_b""".stripMargin,

      "graph_host_pagerank" ->
        s"""WITH de AS (
           |  $DocGraphRawSql),
           |raw AS (
           |  SELECT src % 50 AS src, dst % 50 AS dst, count(*) AS w
           |  FROM de GROUP BY 1, 2),
           |${GraphSql.weightedCtes(3)}
           |SELECT node, pr AS rank_units FROM r3 ORDER BY node""".stripMargin,

      "graph_pagerank_gauge" ->
        s"""WITH raw AS (
           |  $DocGraphRawSql),
           |${GraphSql.pagerankCtes(3)}
           |SELECT CAST(sum(abs(r3.pr - r2.pr)) AS BIGINT)
           |         AS l1_delta_units,
           |       CAST(max(abs(r3.pr - r2.pr)) AS BIGINT)
           |         AS max_delta_units,
           |       count(*) AS n_nodes
           |FROM r3 JOIN r2 ON r2.node = r3.node""".stripMargin,

      // the prior release's fixpoint (prefix a, 3 rounds on the ×3-only
      // graph) and the warm rounds (prefix w, start = a's round-3 ranks
      // mapped onto the NEW node universe, cold unit for new nodes)
      // replayed as independent CTE chains
      "graph_pagerank_warm" ->
        s"""WITH araw AS (
           |  $DocGraphPriorRawSql),
           |${GraphSql.pagerankCtes(3, Graph.RankUnit, "a", None)},
           |wraw AS (
           |  $DocGraphRawSql),
           |${GraphSql.pagerankCtes(2, Graph.RankUnit, "w", Some(
             s"SELECT wnodes.node, CAST(coalesce(ar3.pr, ${Graph.RankUnit}) " +
               "AS BIGINT) AS pr FROM wnodes " +
               "LEFT JOIN ar3 ON ar3.node = wnodes.node"))}
           |SELECT node, pr AS rank_units FROM wr2 ORDER BY node""".stripMargin,

      // all four round-1/round-2 vectors (warm w1/w2, cold c1/c2 — the
      // cold chain rides prefix c over its own copy of the new graph)
      // replayed, then the two L1 movements refolded independently
      "graph_pagerank_warm_gauge" ->
        s"""WITH araw AS (
           |  $DocGraphPriorRawSql),
           |${GraphSql.pagerankCtes(3, Graph.RankUnit, "a", None)},
           |wraw AS (
           |  $DocGraphRawSql),
           |${GraphSql.pagerankCtes(2, Graph.RankUnit, "w", Some(
             s"SELECT wnodes.node, CAST(coalesce(ar3.pr, ${Graph.RankUnit}) " +
               "AS BIGINT) AS pr FROM wnodes " +
               "LEFT JOIN ar3 ON ar3.node = wnodes.node"))},
           |craw AS (
           |  $DocGraphRawSql),
           |${GraphSql.pagerankCtes(2, Graph.RankUnit, "c", None)},
           |gw AS (SELECT CAST(sum(abs(wr2.pr - wr1.pr)) AS BIGINT)
           |                AS l1_warm_units,
           |              count(*) AS n_nodes
           |       FROM wr2 JOIN wr1 ON wr1.node = wr2.node),
           |gc AS (SELECT CAST(sum(abs(cr2.pr - cr1.pr)) AS BIGINT)
           |                AS l1_cold_units
           |       FROM cr2 JOIN cr1 ON cr1.node = cr2.node)
           |SELECT n_nodes, l1_warm_units, l1_cold_units,
           |       l1_warm_units <= l1_cold_units AS warm_tighter
           |FROM gw CROSS JOIN gc""".stripMargin,

      "graph_trustrank" ->
        s"""WITH raw AS (
           |  $DocGraphRawSql),
           |rawseed AS (SELECT doc_id AS node FROM documents
           |            WHERE doc_id % 50 = 0),
           |${GraphSql.personalizedCtes(3)}
           |SELECT node, pr AS rank_units FROM r3 ORDER BY node""".stripMargin,

      "graph_seed_distance" ->
        s"""WITH raw AS (
           |  $DocGraphRawSql),
           |rawseed AS (SELECT doc_id AS node FROM documents
           |            WHERE doc_id % 50 = 0),
           |${GraphSql.seedDistanceCtes(4)}
           |SELECT nodes.node, d4.dist
           |FROM nodes LEFT JOIN d4 ON d4.node = nodes.node
           |ORDER BY nodes.node""".stripMargin,

      // the union arithmetic, re-observations collapsed by DISTINCT —
      // identical to graph_pagerank's fixpoint plus the degree fold
      "graph_edge_indexed" ->
        s"""WITH raw AS (
           |  $DocGraphRawSql),
           |${GraphSql.pagerankCtes(3)}
           |SELECT node, pr AS rank_units,
           |       CAST(odeg.odeg AS BIGINT) AS out_degree
           |FROM r3 LEFT JOIN odeg ON odeg.src = r3.node
           |ORDER BY node""".stripMargin,

      // only the LEGIT edge arithmetic appears — a robots-gate or
      // trap-filter failure upstream would add real doc→doc edges and
      // shift the replayed fixpoint
      "pipeline_crawl" ->
        s"""WITH raw AS (
           |  $DocGraphRawSql),
           |${GraphSql.pagerankCtes(3)},
           |d AS (SELECT host, CAST(delay_s AS DOUBLE) AS delay_s
           |  FROM (VALUES ('h0.test', 2.0), ('h3.test', 1.5))
           |    t(host, delay_s)),
           |u AS (
           |  SELECT node,
           |         'https://h' || CAST(node % 5 AS VARCHAR)
           |           || '.test/dir/p' || CAST(node AS VARCHAR)
           |           || '.html' AS url,
           |         'h' || CAST(node % 5 AS VARCHAR) || '.test' AS host,
           |         CAST(pr AS DOUBLE) AS priority
           |  FROM r3),
           |sch AS (
           |  SELECT u.node, u.url, u.host, u.priority,
           |         coalesce(d.delay_s, CAST(0.5 AS DOUBLE)) AS delay_s,
           |         row_number() OVER (PARTITION BY u.host
           |           ORDER BY u.priority DESC, u.url) - 1 AS slot
           |  FROM u LEFT JOIN d USING (host))
           |SELECT node, url, host, priority, slot, delay_s,
           |       slot * delay_s AS sched_s
           |FROM sch WHERE slot * delay_s < 6.0 ORDER BY url""".stripMargin,

      // fixpoint CTEs + the schedule window, both restated
      "frontier_ranked" ->
        s"""WITH raw AS (
           |  $DocGraphRawSql),
           |${GraphSql.pagerankCtes(3)},
           |d AS (SELECT host, CAST(delay_s AS DOUBLE) AS delay_s
           |  FROM (VALUES ('src1.test', 2.0), ('src3.test', 2.5))
           |    t(host, delay_s)),
           |u AS (
           |  SELECT doc_id,
           |         'https://' || source || '.test/doc/'
           |           || CAST(doc_id AS VARCHAR) AS url,
           |         source || '.test' AS host,
           |         CAST(pr AS DOUBLE) AS priority
           |  FROM documents JOIN r3 ON r3.node = documents.doc_id),
           |sch AS (
           |  SELECT u.doc_id, u.url, u.host, u.priority,
           |         coalesce(d.delay_s, CAST(1.0 AS DOUBLE)) AS delay_s,
           |         row_number() OVER (PARTITION BY u.host
           |           ORDER BY u.priority DESC, u.url) - 1 AS slot
           |  FROM u LEFT JOIN d USING (host))
           |SELECT doc_id, url, host, priority, slot, delay_s,
           |       slot * delay_s AS sched_s
           |FROM sch WHERE slot * delay_s < 5.0 ORDER BY url""".stripMargin,

      // the nine surviving link forms restated from arithmetic (the
      // fragment-only, mailto, and commented-out anchors must NOT
      // appear; ../ pops a directory, ../../ clamps at the root, ?…
      // keeps the base path); no markup anywhere in the oracle
      "html_links" ->
        """WITH d AS (SELECT doc_id, CAST(doc_id AS VARCHAR) AS i,
          |                  CAST(doc_id % 5 AS VARCHAR) AS k
          |           FROM documents WHERE doc_id < 100)
          |SELECT doc_id, link FROM (
          |  SELECT doc_id, 'https://abs.test/a' || i AS link FROM d
          |  UNION ALL
          |  SELECT doc_id, 'https://cdn.test/c' || i FROM d
          |  UNION ALL
          |  SELECT doc_id, 'https://h' || k || '.test/root/r' || i FROM d
          |  UNION ALL
          |  SELECT doc_id, 'https://h' || k || '.test/dir/rel/p' || i FROM d
          |  UNION ALL
          |  SELECT doc_id, 'https://h' || k || '.test/up' || i FROM d
          |  UNION ALL
          |  SELECT doc_id, 'https://h' || k || '.test/dir/same' || i FROM d
          |  UNION ALL
          |  SELECT doc_id, 'https://h' || k || '.test/deep' || i FROM d
          |  UNION ALL
          |  SELECT doc_id, 'https://h' || k || '.test/dir/page' || i
          |                 || '.html?page=' || i FROM d
          |  UNION ALL
          |  SELECT doc_id, 'https://q.test/d?a=1&b=' || i FROM d)
          |ORDER BY doc_id, link""".stripMargin,

      // same construction oracle as html_links — the door is the
      // batch projection behind a stream reader
      "stream_link_discovery" ->
        """WITH d AS (SELECT doc_id, CAST(doc_id AS VARCHAR) AS i,
          |                  CAST(doc_id % 5 AS VARCHAR) AS k
          |           FROM documents WHERE doc_id < 100)
          |SELECT doc_id, link FROM (
          |  SELECT doc_id, 'https://abs.test/a' || i AS link FROM d
          |  UNION ALL
          |  SELECT doc_id, 'https://cdn.test/c' || i FROM d
          |  UNION ALL
          |  SELECT doc_id, 'https://h' || k || '.test/root/r' || i FROM d
          |  UNION ALL
          |  SELECT doc_id, 'https://h' || k || '.test/dir/rel/p' || i FROM d
          |  UNION ALL
          |  SELECT doc_id, 'https://h' || k || '.test/up' || i FROM d
          |  UNION ALL
          |  SELECT doc_id, 'https://h' || k || '.test/dir/same' || i FROM d
          |  UNION ALL
          |  SELECT doc_id, 'https://h' || k || '.test/deep' || i FROM d
          |  UNION ALL
          |  SELECT doc_id, 'https://h' || k || '.test/dir/page' || i
          |                 || '.html?page=' || i FROM d
          |  UNION ALL
          |  SELECT doc_id, 'https://q.test/d?a=1&b=' || i FROM d)
          |ORDER BY doc_id, link""".stripMargin,

      // both anchor rows restated from the same arithmetic (the
      // root-relative href resolves against the SOURCE doc's host, the
      // protocol-relative one against the TARGET's), refolded with an
      // independent DISTINCT string_agg
      "anchor_text_agg" ->
        """WITH a AS (
          |  SELECT 'https://h' || CAST(doc_id % 5 AS VARCHAR)
          |           || '.test/doc/'
          |           || CAST((doc_id * 3 + 1) % 500 AS VARCHAR) AS link,
          |         'guide topic '
          |           || CAST((doc_id * 3 + 1) % 500 % 13 AS VARCHAR)
          |           AS anchor
          |  FROM documents
          |  UNION ALL
          |  SELECT 'https://h' || CAST((doc_id * 7 + 5) % 500 % 5 AS VARCHAR)
          |           || '.test/doc/'
          |           || CAST((doc_id * 7 + 5) % 500 AS VARCHAR),
          |         'ref topic '
          |           || CAST((doc_id * 7 + 5) % 500 % 13 AS VARCHAR)
          |  FROM documents)
          |SELECT link, count(*) AS n_refs,
          |       string_agg(DISTINCT anchor, '|' ORDER BY anchor)
          |         AS anchors
          |FROM a GROUP BY link ORDER BY link""".stripMargin,

      // every trap signal restated from the construction arithmetic
      // (depth = reps+1, dup = max(reps-1, 0), params = the modulus) —
      // only url_len touches the string, via the same construction
      "url_trap_filter" ->
        """WITH u AS (
          |  SELECT doc_id,
          |         'https://t.test'
          |           || repeat('/dir', CAST(doc_id % 6 AS INT)) || '/p'
          |           || CAST(doc_id AS VARCHAR)
          |           || CASE WHEN doc_id % 9 = 0 THEN '' ELSE '?q=1'
          |                || repeat('&x=1', CAST(doc_id % 9 AS INT) - 1)
          |              END AS url
          |  FROM documents),
          |s AS (
          |  SELECT doc_id, url,
          |         CAST(doc_id % 6 + 1 AS BIGINT) AS depth,
          |         CAST(greatest(doc_id % 6 - 1, 0) AS BIGINT)
          |           AS dup_segments,
          |         CAST(doc_id % 9 AS BIGINT) AS n_params,
          |         CAST(length(url) AS BIGINT) AS url_len
          |  FROM u)
          |SELECT doc_id, url, depth, dup_segments, n_params, url_len,
          |       (depth > 4 OR dup_segments > 1 OR n_params > 6
          |        OR url_len > 60) AS is_trap
          |FROM s ORDER BY doc_id""".stripMargin,

      // the same decomposed suffix rebuilt from code points (chr(769) =
      // U+0301 combining acute, chr(8491) = U+212B angstrom sign,
      // chr(776) = U+0308 combining diaeresis), normalized by DuckDB's
      // own nfc_normalize — byte lengths pin that 3 bytes per row
      // genuinely composed away
      "text_nfkc" -> {
        val rawBytes = NfkcRawSuffix.getBytes("UTF-8").length
        val expBytes = NfkcExpectedSuffix.getBytes("UTF-8").length
        s"""SELECT doc_id,
           |       text || '$NfkcExpectedSuffix' AS nfkc_text,
           |       CAST(octet_length(encode(text)) + $rawBytes AS BIGINT)
           |         AS bytes_raw,
           |       CAST(octet_length(encode(text)) + $expBytes AS BIGINT)
           |         AS bytes_nfkc
           |FROM documents WHERE doc_id < 60 ORDER BY doc_id""".stripMargin
      },

      "text_normalize" ->
        """WITH v AS (
          |  SELECT doc_id,
          |         text || ' caf' || 'e' || chr(769) || ' ' || chr(8491) ||
          |           'ngstro' || chr(776) || 'm' AS raw
          |  FROM documents WHERE doc_id < 60)
          |SELECT doc_id, nfc_normalize(raw) AS nfc_text,
          |       CAST(octet_length(encode(raw)) AS BIGINT) AS bytes_raw,
          |       CAST(octet_length(encode(nfc_normalize(raw))) AS BIGINT)
          |         AS bytes_nfc
          |FROM v ORDER BY doc_id""".stripMargin,

      // strip_accents(lower(x)) over the COMPOSED arm; same_key is the
      // Spark-side composed-vs-decomposed invariant (strip_accents
      // engines differ on bare combining marks, so the oracle states it
      // as the constant it must equal)
      "text_accent_fold" ->
        """SELECT doc_id,
          |  strip_accents(lower(text || ' CAF' || chr(201) || ' ' ||
          |    chr(220) || 'n' || chr(239) || 'cod' || chr(233) || ' ' ||
          |    chr(209) || 'O' || chr(209) || 'O')) AS folded,
          |  TRUE AS same_key
          |FROM documents WHERE doc_id < 60 ORDER BY doc_id""".stripMargin,

      // literal VALUES from tools/html_reference.py (independent Python
      // statement of the extraction rules)
      "html_pinned" ->
        """SELECT CAST(case_id AS BIGINT) AS case_id, text, main_text
          |FROM (VALUES
          |  (1, 'keep' || chr(10) || 'also', 'keep' || chr(10) || 'also'),
          |  (2, 'one bold word' || chr(10) || 'two' || chr(10) || 'three' || chr(10) || 'four', 'one bold word' || chr(10) || 'two' || chr(10) || 'three' || chr(10) || 'four'),
          |  (3, 'a <b> "c" ''d'' &lt; &copy;', 'a <b> "c" ''d'' &lt; &copy;'),
          |  (4, 'a b c' || chr(10) || 'd', 'a b c' || chr(10) || 'd'),
          |  (5, 'real prose with one link in seven words' || chr(10) || 'Home About More' || chr(10) || 'plain text', 'real prose with one link in seven words' || chr(10) || 'plain text'),
          |  (6, 'big deal' || chr(10) || 'tail text here', 'tail text here')
          |) t(case_id, text, main_text) ORDER BY case_id""".stripMargin,

      "text_tfidf_top" ->
        s"""WITH tok AS (SELECT doc_id, unnest($toks) AS token FROM documents),
           |tf AS (SELECT doc_id, token, count(*) AS tf
           |       FROM tok GROUP BY doc_id, token),
           |dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
           |n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
           |scored AS (SELECT doc_id, token,
           |                  tf::DOUBLE * ln(n_docs / df::DOUBLE) AS tfidf
           |           FROM tf JOIN dfreq USING (token), n)
           |SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, token,
           |       round(tfidf, 6) AS tfidf
           |FROM (SELECT doc_id, token, tfidf,
           |             row_number() OVER (PARTITION BY doc_id
           |                                ORDER BY tfidf DESC, token) AS rnk
           |      FROM scored)
           |WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,

      "dedup_semantic" ->
        s"""WITH seeds AS (SELECT vec_id AS centroid_id, embedding AS cvec
           |               FROM embeddings ORDER BY vec_id LIMIT 16),
           |assigned AS (
           |  SELECT cid, cv, cluster FROM (
           |    SELECT e.vec_id AS cid, e.embedding AS cv,
           |           s.centroid_id AS cluster,
           |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
           |             ${VectorOpsSql.cosine("e.embedding", "s.cvec")} DESC,
           |             s.centroid_id) AS rn
           |    FROM embeddings e, seeds s)
           |  WHERE rn = 1),
           |drops AS (
           |  SELECT DISTINCT b.cid AS vec_id
           |  FROM assigned a JOIN assigned b
           |    ON a.cluster = b.cluster AND a.cid < b.cid
           |  WHERE ${VectorOpsSql.cosine("a.cv", "b.cv")} >= 0.2)
           |SELECT vec_id FROM embeddings
           |WHERE vec_id NOT IN (SELECT vec_id FROM drops)
           |ORDER BY vec_id""".stripMargin,

      "dedup_simhash" -> {
        val thw = TextOpsSql.tokenHashesWide(toks)
        s"""WITH $ExactDupCorpusSql,
           |th AS (SELECT doc_id, $thw AS thw FROM corpus),
           |sh AS (SELECT doc_id, ${TextOpsSql.simHash("thw")} AS simhash
           |       FROM th)
           |SELECT simhash, min(doc_id) AS kept_id, count(*) AS n_dups
           |FROM sh GROUP BY simhash HAVING count(*) > 1
           |ORDER BY kept_id""".stripMargin
      },

      "dedup_simhash_hamming" -> {
        val thw = TextOpsSql.tokenHashesWide(toks)
        val bandCase = (0 until 4)
          .map(b => s"WHEN $b THEN ${TextOpsSql.simHashBand("print", b)}")
          .mkString("CASE band ", " ", " END")
        s"""WITH $NearDupCorpusSql,
           |th AS (SELECT doc_id, $thw AS thw FROM corpus),
           |pr AS (SELECT doc_id AS id, ${TextOpsSql.simHash("thw")} AS print
           |       FROM th),
           |bands AS (SELECT id, print, band, $bandCase AS value
           |          FROM pr, (VALUES (0), (1), (2), (3)) b(band)),
           |cand AS (SELECT DISTINCT l.id AS id_a, r.id AS id_b
           |         FROM bands l JOIN bands r
           |           ON l.band = r.band AND l.value = r.value AND l.id < r.id)
           |SELECT id_a, id_b, hamming FROM (
           |  SELECT id_a, id_b,
           |         ${TextOpsSql.hamming("a.print", "b.print")} AS hamming
           |  FROM cand JOIN pr a ON id_a = a.id JOIN pr b ON id_b = b.id)
           |WHERE hamming <= 3 ORDER BY id_a, id_b""".stripMargin
      },

      "dedup_ngram_jaccard" -> {
        val thash = TextOpsSql.tokenHashes("toks")
        val shingles = TextOpsSql.shingleHashes("thash")
        val sig = TextOpsSql.minHashSignature("shingles")
        val bucketCase = (0 until TextOps.Bands)
          .map(b => s"WHEN ${b} THEN ${TextOpsSql.bandHash("sig", b)}")
          .mkString("CASE band ", " ", " END")
        s"""WITH pre AS (SELECT doc_id AS id, lang AS block, text FROM documents),
           |tok AS (SELECT id, block, $toks AS toks FROM pre),
           |th AS (SELECT id, block, $thash AS thash FROM tok),
           |sh AS (SELECT id, block, list_distinct($shingles) AS shingles FROM th),
           |sg AS (SELECT id, block, shingles, $sig AS sig FROM sh),
           |bands AS (SELECT id, block, band, $bucketCase AS bucket
           |          FROM sg, (VALUES (0), (1), (2), (3)) b(band)),
           |cand AS (SELECT DISTINCT l.id AS id_a, r.id AS id_b
           |         FROM bands l JOIN bands r
           |           ON l.band = r.band AND l.bucket = r.bucket
           |          AND l.block = r.block AND l.id < r.id)
           |SELECT id_a, id_b, round(jac, 6) AS jaccard FROM (
           |  SELECT id_a, id_b,
           |         ${TextOpsSql.jaccard("a.shingles", "b.shingles")} AS jac
           |  FROM cand JOIN sh a ON id_a = a.id JOIN sh b ON id_b = b.id)
           |WHERE jac >= 0.15 ORDER BY id_a, id_b""".stripMargin
      },

      // INDEPENDENT formulation: candidates from ALL shared shingles (no
      // prefix filter) — proves the Spark-side prefix filter is complete,
      // not merely self-consistent
      "dedup_jaccard_prefix" -> {
        val thash = TextOpsSql.tokenHashes("tk")
        val shingles = TextOpsSql.shingleHashes("th")
        s"""WITH $NearDupCorpusSql,
           |tok AS (SELECT doc_id, ${TextOpsSql.tokens("text")} AS tk FROM corpus),
           |th AS (SELECT doc_id, $thash AS th FROM tok),
           |d AS (SELECT doc_id, list_distinct($shingles) AS ss FROM th),
           |e AS (SELECT doc_id, len(ss) AS m, unnest(ss) AS sh
           |      FROM d WHERE len(ss) > 0),
           |c AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS o,
           |             any_value(a.m) AS m1, any_value(b.m) AS m2
           |      FROM e a JOIN e b ON a.sh = b.sh AND a.doc_id < b.doc_id
           |      GROUP BY 1, 2)
           |SELECT id_a, id_b, round(jac, 6) AS jaccard FROM (
           |  SELECT id_a, id_b, o::DOUBLE / (m1 + m2 - o)::DOUBLE AS jac
           |  FROM c)
           |WHERE jac >= CAST(0.7 AS DOUBLE) ORDER BY id_a, id_b""".stripMargin
      },

      // batch-vs-corpus semantic dedup: corpus-seeded assignment on both
      // sides, cluster-equality candidate joins, cosine >= 0.8
      "dedup_incremental_semantic" -> incrementalSemDedupSql,
      // the persisted-cluster-index probe stores exactly the seeds and
      // assignments the rescan computes — same contract, same SQL
      "dedup_cluster_index_roundtrip" -> incrementalSemDedupSql,

      // batch-vs-corpus near-dup: banding formulation on both arms —
      // corpus hits via the batch-bands x corpus-bands join, within-batch
      // drops via the batch self-join's higher-id rule
      "dedup_incremental_neardup" -> incrementalNearDupSql,
      // the persisted-band-index probe stores exactly the bands and
      // shingle sets the rescan computes — same contract, same SQL
      "dedup_band_index_roundtrip" -> incrementalNearDupSql,

      // post-takedown probe ≡ rescan against the FILTERED corpus: the
      // retracted docs' signatures no longer suppress batch near-dups
      "retract_band_probe" -> incrementalNearDupSqlFrom(
        "(SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0)"),

      // LSH-vs-exact recall gauge: the exact arm is the prefix join's
      // all-shared-shingles formulation, the LSH arm the banding join —
      // both at jaccard >= 0.7 on raw (unrounded) values
      "lsh_jaccard_recall" -> {
        val thash = TextOpsSql.tokenHashes("tk")
        val shingles = TextOpsSql.shingleHashes("th")
        val sig = TextOpsSql.minHashSignature("ss")
        val bucketCase = (0 until TextOps.Bands)
          .map(b => s"WHEN ${b} THEN ${TextOpsSql.bandHash("sig", b)}")
          .mkString("CASE band ", " ", " END")
        s"""WITH $NearDupCorpusSql,
           |tok AS (SELECT doc_id, ${TextOpsSql.tokens("text")} AS tk FROM corpus),
           |th AS (SELECT doc_id, $thash AS th FROM tok),
           |d AS (SELECT doc_id, list_distinct($shingles) AS ss FROM th),
           |e AS (SELECT doc_id, len(ss) AS m, unnest(ss) AS sh
           |      FROM d WHERE len(ss) > 0),
           |c AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS o,
           |             any_value(a.m) AS m1, any_value(b.m) AS m2
           |      FROM e a JOIN e b ON a.sh = b.sh AND a.doc_id < b.doc_id
           |      GROUP BY 1, 2),
           |exact AS (SELECT id_a, id_b FROM (
           |  SELECT id_a, id_b, o::DOUBLE / (m1 + m2 - o)::DOUBLE AS jac
           |  FROM c) WHERE jac >= CAST(0.7 AS DOUBLE)),
           |sg AS (SELECT doc_id, ss, $sig AS sig FROM d),
           |bands AS (SELECT doc_id, ss, band, $bucketCase AS bucket
           |          FROM sg, (VALUES (0), (1), (2), (3)) b(band)),
           |lsh AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b, 1 AS hit
           |        FROM bands l JOIN bands r
           |          ON l.band = r.band AND l.bucket = r.bucket
           |         AND l.doc_id < r.doc_id
           |        WHERE ${TextOpsSql.jaccard("l.ss", "r.ss")}
           |              >= CAST(0.7 AS DOUBLE))
           |SELECT CAST(count(*) AS BIGINT) AS n_exact,
           |       CAST(sum(coalesce(hit, 0)) AS BIGINT) AS n_found,
           |       round(CASE WHEN count(*) = 0 THEN 1.0
           |                  ELSE sum(coalesce(hit, 0))::DOUBLE
           |                       / count(*)::DOUBLE END, 6) AS recall
           |FROM exact LEFT JOIN lsh USING (id_a, id_b)""".stripMargin
      },

      "dedup_simhash_recall" -> {
        val thash = TextOpsSql.tokenHashes("tk")
        val shingles = TextOpsSql.shingleHashes("th")
        val thw = TextOpsSql.tokenHashesWide("tk")
        s"""WITH $NearDupCorpusSql,
           |tok AS (SELECT doc_id, ${TextOpsSql.tokens("text")} AS tk
           |        FROM corpus),
           |th AS (SELECT doc_id, tk, $thash AS th FROM tok),
           |d AS (SELECT doc_id, tk, list_distinct($shingles) AS ss FROM th),
           |e AS (SELECT doc_id, len(ss) AS m, unnest(ss) AS sh
           |      FROM d WHERE len(ss) > 0),
           |c AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS o,
           |             any_value(a.m) AS m1, any_value(b.m) AS m2
           |      FROM e a JOIN e b ON a.sh = b.sh AND a.doc_id < b.doc_id
           |      GROUP BY 1, 2),
           |exact AS (SELECT id_a, id_b FROM (
           |  SELECT id_a, id_b, o::DOUBLE / (m1 + m2 - o)::DOUBLE AS jac
           |  FROM c) WHERE jac >= CAST(0.7 AS DOUBLE)),
           |pr AS (SELECT doc_id AS id,
           |              ${TextOpsSql.simHash("thw")} AS print
           |       FROM (SELECT doc_id, $thw AS thw FROM tok)),
           |sim AS (SELECT a.id AS id_a, b.id AS id_b, 1 AS hit
           |        FROM pr a JOIN pr b ON a.id < b.id
           |        WHERE ${TextOpsSql.hamming("a.print", "b.print")} <= 3)
           |SELECT CAST(count(*) AS BIGINT) AS n_exact,
           |       CAST(sum(coalesce(hit, 0)) AS BIGINT) AS n_found,
           |       round(CASE WHEN count(*) = 0 THEN 1.0
           |                  ELSE sum(coalesce(hit, 0))::DOUBLE
           |                       / count(*)::DOUBLE END, 6) AS recall
           |FROM exact LEFT JOIN sim USING (id_a, id_b)""".stripMargin
      },

      "sft_loss_mask" ->
        s"""WITH s AS (
           |  SELECT doc_id,
           |         CAST(length('<|system|>' || chr(10) ||
           |           'You are a helpful assistant.' || chr(10) ||
           |           '<|user|>' || chr(10) ||
           |           array_to_string(($toks)[1:8], ' ') || chr(10) ||
           |           '<|assistant|>' || chr(10)) AS BIGINT) AS loss_start,
           |         '<|system|>' || chr(10) ||
           |           'You are a helpful assistant.' || chr(10) ||
           |           '<|user|>' || chr(10) ||
           |           array_to_string(($toks)[1:8], ' ') || chr(10) ||
           |           '<|assistant|>' || chr(10) || text || '<|end|>'
           |           AS sample
           |    FROM documents WHERE text NOT LIKE '%<|%')
           |SELECT doc_id, loss_start, n_tokens FROM (
           |  SELECT doc_id, loss_start,
           |         CAST(len(${TextOpsSql.tokens("sample")}) AS BIGINT)
           |           AS n_tokens FROM s) v
           |WHERE n_tokens <= 60 ORDER BY doc_id""".stripMargin,

      "text_stats" ->
        s"""SELECT doc_id,
           |       CAST(len($toks) AS BIGINT) AS n_tokens,
           |       CAST(length(text) AS BIGINT) AS n_chars,
           |       round(${TextOpsSql.meanTokenLen(toks)}, 6) AS mean_token_len,
           |       CAST(${TextOpsSql.punctCount("text")} AS BIGINT) AS n_punct
           |FROM documents ORDER BY doc_id""".stripMargin,

      // script profile restated through RE2's \p{Script} spelling of the
      // same Unicode property, fixture code points via sqlLit
      "text_scripts" -> {
        import graft.functions.{ScriptOps, ScriptOpsSql}
        val injCase = "(CASE CAST(doc_id % 6 AS INTEGER) " +
          ScriptFixture.zipWithIndex.map { case (s, i) =>
            s"WHEN $i THEN ${CleanSql.sqlLit(s)}"
          }.mkString(" ") + " END)"
        val counts = ScriptOps.Scripts.map { case (n, _, re2) =>
          s"${ScriptOpsSql.classCount("t", re2)} AS $n"
        }.mkString(",\n|       ")
        s"""WITH inj AS (SELECT doc_id, text || $injCase AS t
           |             FROM documents),
           |cnt AS (
           |  SELECT doc_id, ${ScriptOpsSql.letterCount("t")} AS n_letters,
           |       $counts
           |  FROM inj)
           |SELECT doc_id, n_letters,
           |       ${ScriptOps.Scripts.map(_._1).mkString(", ")},
           |       ${ScriptOpsSql.dominantCase()} AS dominant,
           |       round(CASE WHEN n_letters > 0
           |                  THEN ${ScriptOpsSql.dominantCount()}::DOUBLE
           |                       / n_letters::DOUBLE
           |                  ELSE 0.0 END, 6) AS dominant_frac
           |FROM cnt ORDER BY doc_id""".stripMargin
      },

      "text_langid" ->
        s"""SELECT doc_id, ${TextOpsSql.langId(toks)} AS lang_pred
           |FROM documents ORDER BY doc_id""".stripMargin,

      "text_langid_confusion" ->
        s"""SELECT lang, ${TextOpsSql.langId(toks)} AS lang_pred,
           |       CAST(count(*) AS BIGINT) AS n
           |FROM documents GROUP BY lang, lang_pred
           |ORDER BY lang, lang_pred""".stripMargin,

      "text_top_tokens" ->
        s"""SELECT token, count(*) AS n
           |FROM (SELECT unnest($toks) AS token FROM documents)
           |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin,

      // capacity (4096) > distinct tokens, so the Misra-Gries summary
      // never evicts: its lower bounds ARE the exact counts
      "text_heavy_hitters" ->
        s"""SELECT token, count(*) AS cnt
           |FROM (SELECT unnest($toks) AS token FROM documents)
           |GROUP BY token ORDER BY cnt DESC, token LIMIT 20""".stripMargin,

      "text_unigram_logprob" ->
        s"""WITH tok AS (SELECT doc_id, unnest($toks) AS token
           |             FROM documents),
           |vocab AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
           |tot AS (SELECT sum(cnt)::DOUBLE AS total FROM vocab)
           |SELECT doc_id,
           |       round(avg(log10(cnt::DOUBLE / total)), 6) AS mean_logprob,
           |       count(*) AS n_toks
           |FROM tok JOIN vocab USING (token), tot
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      "events_json_agg" ->
        s"""SELECT event_type, count(*) AS n,
           |       CAST(sum(CAST(json_extract_string(props, '$$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           |       max(CAST(json_extract_string(props, '$$.k') AS BIGINT)) AS max_k
           |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

      "profile_table" -> ProfileSql.profile("documents",
        Seq("doc_id", "lang", "source", "n_chars")),

      "profile_histogram" ->
        s"""SELECT CAST(least(floor(n_chars / 50), 19) AS BIGINT) AS bucket,
           |       count(*) AS n_docs,
           |       CAST(min(n_chars) AS BIGINT) AS min_chars,
           |       CAST(max(n_chars) AS BIGINT) AS max_chars
           |FROM documents GROUP BY 1 ORDER BY bucket""".stripMargin,

      // DuckDB's native ASOF LEFT JOIN — an independent implementation of
      // point-in-time semantics, not a rendering of the window formulation
      "events_asof_join" ->
        s"""WITH c AS (SELECT event_id, user_id, ts FROM events
           |           WHERE event_type = 'click'),
           |p AS (SELECT user_id, ts, max(value) AS pvalue FROM events
           |      WHERE event_type = 'purchase' GROUP BY user_id, ts)
           |SELECT c.event_id, c.user_id, round(p.pvalue, 6) AS asof_value
           |FROM c ASOF LEFT JOIN p
           |  ON c.user_id = p.user_id AND c.ts >= p.ts
           |ORDER BY c.event_id""".stripMargin,

      "events_funnel" ->
        """WITH t1 AS (SELECT user_id, min(ts) AS t1 FROM events
          |            WHERE event_type = 'signup' GROUP BY user_id),
          |t2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
          |       JOIN t1 USING (user_id)
          |       WHERE e.event_type = 'click' AND e.ts > t1.t1
          |       GROUP BY e.user_id),
          |t3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
          |       JOIN t2 USING (user_id)
          |       WHERE e.event_type = 'purchase' AND e.ts > t2.t2
          |       GROUP BY e.user_id)
          |SELECT CAST(1 AS BIGINT) AS stage, 'signup' AS event_type,
          |       (SELECT count(*) FROM t1) AS n_users
          |UNION ALL SELECT 2, 'click', (SELECT count(*) FROM t2)
          |UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM t3)
          |ORDER BY stage""".stripMargin,

      "events_interval_lookup" ->
        """WITH iv AS (SELECT o_orderkey AS band_id,
          |              (o_orderkey % 97) * 5 AS lo,
          |              (o_orderkey % 97) * 5 + 10 + o_orderkey % 23 AS hi
          |            FROM orders WHERE o_orderkey % 50 = 0)
          |SELECT e.event_id, count(*) AS n_bands, min(band_id) AS first_band
          |FROM events e JOIN iv ON e.value >= iv.lo AND e.value < iv.hi
          |GROUP BY e.event_id ORDER BY e.event_id""".stripMargin,

      "corpus_rollup" ->
        """SELECT lang, source, count(*) AS n_docs,
          |       sum(n_chars)::BIGINT AS n_chars
          |FROM documents GROUP BY ROLLUP (lang, source)
          |ORDER BY lang NULLS FIRST, source NULLS FIRST""".stripMargin,

      "corpus_pivot" ->
        """SELECT source,
          |  sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END)::BIGINT AS de,
          |  sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS en,
          |  sum(CASE WHEN lang = 'es' THEN 1 ELSE 0 END)::BIGINT AS es,
          |  sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END)::BIGINT AS fr,
          |  sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END)::BIGINT AS zh
          |FROM documents GROUP BY source ORDER BY source""".stripMargin,

      "events_retention" ->
        """WITH p AS (SELECT DISTINCT user_id,
          |             (epoch_ms(ts) // 1000) // 604800 AS per FROM events),
          |f AS (SELECT user_id, min(per) AS cohort_period FROM p
          |      GROUP BY user_id)
          |SELECT f.cohort_period, p.per - f.cohort_period AS period_offset,
          |       count(DISTINCT p.user_id) AS n_users
          |FROM p JOIN f USING (user_id)
          |WHERE p.per - f.cohort_period <= 4
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

      // DuckDB's own quantile_cont — an independent implementation of the
      // same linear-interpolation definition, not a rendering
      "profile_quantiles" ->
        s"""SELECT lang, count(*) AS n_docs,
           |       round(quantile_cont(n_chars, 0.25), 6) AS p25,
           |       round(quantile_cont(n_chars, 0.50), 6) AS p50,
           |       round(quantile_cont(n_chars, 0.75), 6) AS p75,
           |       round(quantile_cont(n_chars, 0.95), 6) AS p95
           |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

      // the exact arm + an always-true flag: if Spark's HLL++ ever lands
      // outside 5%, the Spark side flips to false and the compare fails —
      // the oracle is the CONTRACT, not an echo of the sketch
      "profile_approx_distinct" ->
        """SELECT source, count(*) AS n_docs,
          |       count(DISTINCT text) AS n_distinct,
          |       true AS hll_ok
          |FROM documents GROUP BY source ORDER BY source""".stripMargin,

      // unlike the HLL gauge, the KMV sketch is fully SQL-restatable: the
      // oracle recomputes the bottom-64 hashes, the estimate, and the 3σ
      // flag itself — nothing is taken on faith
      "sketch_kmv_gauge" -> {
        val fp = TextOpsSql.wideFingerprint("text")
        s"""WITH $ExactDupCorpusSql,
           |sk AS (SELECT DISTINCT $fp AS fp FROM corpus
           |       ORDER BY fp LIMIT 64),
           |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_sketch,
           |               max(fp) AS v_k FROM sk),
           |ex AS (SELECT CAST(count(DISTINCT text) AS BIGINT)
           |         AS n_distinct FROM corpus)
           |SELECT n_sketch, v_k,
           |       round(CASE WHEN n_sketch < 64 THEN n_sketch::DOUBLE
           |             ELSE 63.0 * ${operators.Sketches.KmvSpace}
           |                  / v_k::DOUBLE END, 6) AS est_distinct,
           |       n_distinct,
           |       abs(CASE WHEN n_sketch < 64 THEN n_sketch::DOUBLE
           |           ELSE 63.0 * ${operators.Sketches.KmvSpace}
           |                / v_k::DOUBLE END - n_distinct::DOUBLE)
           |         <= n_distinct::DOUBLE * 0.375 AS kmv_ok
           |FROM agg, ex""".stripMargin
      },

      // the merge theorem restated: per-release bottom-64 sets, unioned
      // and re-bottomed, must equal the pooled-corpus sketch exactly
      "sketch_kmv_indexed" -> {
        val fp = TextOpsSql.wideFingerprint("text")
        s"""WITH $NearDupCorpusSql,
           |r0 AS (SELECT DISTINCT $fp AS fp FROM corpus
           |       WHERE doc_id < 10000000 ORDER BY fp LIMIT 64),
           |r1 AS (SELECT DISTINCT $fp AS fp FROM corpus
           |       WHERE doc_id >= 10000000 ORDER BY fp LIMIT 64),
           |merged AS (SELECT DISTINCT fp FROM
           |             (SELECT fp FROM r0 UNION ALL SELECT fp FROM r1)
           |           ORDER BY fp LIMIT 64),
           |pooled AS (SELECT DISTINCT $fp AS fp FROM corpus
           |           ORDER BY fp LIMIT 64),
           |m AS (SELECT CAST(count(*) AS BIGINT) AS n_sketch,
           |             max(fp) AS v_k FROM merged),
           |p AS (SELECT CAST(count(*) AS BIGINT) AS pn, max(fp) AS pv
           |      FROM pooled)
           |SELECT n_sketch, v_k,
           |       round(CASE WHEN n_sketch < 64 THEN n_sketch::DOUBLE
           |             ELSE 63.0 * ${operators.Sketches.KmvSpace}
           |                  / v_k::DOUBLE END, 6) AS est_distinct,
           |       (n_sketch = pn AND v_k = pv) AS merge_exact
           |FROM m, p""".stripMargin
      },

      "profile_outliers" -> {
        val toksSql = TextOpsSql.tokens("text")
        s"""WITH base AS (SELECT doc_id, len($toksSql)::BIGINT AS n_tokens
           |              FROM documents),
           |m AS (SELECT quantile_cont(n_tokens, 0.5) AS med FROM base),
           |d AS (SELECT quantile_cont(abs(n_tokens - med), 0.5) AS mad
           |      FROM base, m)
           |SELECT doc_id, n_tokens,
           |       (abs(n_tokens - med) > 3.0 * mad) AS is_outlier
           |FROM base, m, d ORDER BY doc_id""".stripMargin
      },

      "text_bigram_logprob" -> LanguageModelSql.bigramLogProb(
        "documents", "doc_id", "text", topK = 500),

      "text_kn_logprob" -> LanguageModelSql.knBigramLogProb(
        "documents", "doc_id", "text", topK = 500),

      "text_kn3_logprob" -> LanguageModelSql.knTrigramLogProb(
        "documents", "doc_id", "text", topK = 500),

      "text_bm25" -> RelevanceSql.bm25TopK("documents", "doc_id", "text",
        Seq("spark", "hash", "merge")),

      // indexed probe ≡ rescan: the oracle is the SAME full-corpus BM25 —
      // the write/append/probe cycle must reproduce it exactly
      "bm25_indexed" -> RelevanceSql.bm25TopK("documents", "doc_id", "text",
        Seq("spark", "hash", "merge")),

      // INDEPENDENT adjacency recompute on the raw token stream: for each
      // phrase, a position i matches iff tokens i..i+k-1 equal the phrase
      // — no postings, no position lists, overlaps counted naturally
      "phrase_indexed" -> {
        def arm(ph: Seq[String]) = {
          val k = ph.size
          val cond = ph.zipWithIndex
            .map { case (t, j) => s"tk[i+${j + 1}] = '$t'" }.mkString(" AND ")
          s"""SELECT '${ph.mkString(" ")}' AS phrase, doc_id,
             |       CAST(n AS BIGINT) AS n_matches
             |FROM (SELECT doc_id,
             |             len(list_filter(range(len(tk) - ${k - 1}),
             |                 i -> $cond)) AS n
             |      FROM d) WHERE n > 0""".stripMargin
        }
        s"""WITH d AS (SELECT doc_id,
           |                  list_filter(string_split(text, ' '),
           |                              x -> x <> '') AS tk
           |           FROM documents WHERE text IS NOT NULL)
           |${arm(Seq("merge", "sort"))}
           |UNION ALL
           |${arm(Seq("table", "table"))}
           |UNION ALL
           |${arm(Seq("value", "table", "part"))}
           |ORDER BY phrase, doc_id""".stripMargin
      },

      // INDEPENDENT slop-k recount: a position self-join over the raw
      // token stream — (i, j) pairs with the right tokens, i <> j, and
      // |i - j| <= k — vs the probe's postings-map array fold
      "proximity_indexed" -> {
        def arm(a: String, b: String, k: Int) =
          s"""SELECT '$a $b /$k' AS probe, x.doc_id,
             |       CAST(count(*) AS BIGINT) AS n_matches
             |FROM postok x JOIN postok y
             |  ON x.doc_id = y.doc_id AND x.tok = '$a' AND y.tok = '$b'
             | AND x.p <> y.p AND abs(x.p - y.p) <= $k
             |GROUP BY x.doc_id""".stripMargin
        s"""WITH d AS (SELECT doc_id,
           |                  list_filter(string_split(text, ' '),
           |                              x -> x <> '') AS tk
           |           FROM documents WHERE text IS NOT NULL),
           |pos AS (SELECT doc_id, unnest(range(len(tk))) AS p, tk FROM d),
           |postok AS (SELECT doc_id, p, tk[p + 1] AS tok FROM pos)
           |${arm("merge", "sort", 3)}
           |UNION ALL
           |${arm("value", "part", 4)}
           |UNION ALL
           |${arm("table", "table", 2)}
           |ORDER BY probe, doc_id""".stripMargin
      },

      "embed_pca_power" -> PcaSql.topComponent("embeddings", "embedding",
        dim = 64),

      "embed_abtt" -> PcaSql.abttTopK("embeddings", "vec_id", "embedding",
        dim = 64, probeId = 0L, k = 10),

      "embed_pca_deflated" -> PcaSql.secondComponent("embeddings",
        "embedding", dim = 64),

      "pca_pinned" ->
        """SELECT CAST(dim AS BIGINT) AS dim, CAST(loading AS DOUBLE)
          |         AS loading
          |FROM (VALUES (1, 0.6), (2, 0.8)) t(dim, loading)
          |ORDER BY dim""".stripMargin,

      "filter_per_lang_quantile" -> {
        val toksSql = TextOpsSql.tokens("text")
        s"""WITH d AS (SELECT doc_id, lang,
           |             len($toksSql)::BIGINT AS n_tokens FROM documents),
           |c AS (SELECT lang, quantile_cont(n_tokens, 0.7) AS cut
           |      FROM d GROUP BY lang)
           |SELECT d.doc_id, d.lang, d.n_tokens,
           |       round(c.cut, 6) AS group_cut
           |FROM d JOIN c USING (lang)
           |WHERE d.n_tokens >= c.cut
           |ORDER BY d.doc_id""".stripMargin
      },

      "text_vocab_coverage" -> {
        val toksSql = TextOpsSql.tokens("text")
        s"""WITH toks AS (SELECT unnest($toksSql) AS token FROM documents),
           |v AS (SELECT token FROM (
           |        SELECT token, count(*) AS c FROM toks GROUP BY token
           |        ORDER BY c DESC, token LIMIT 25)),
           |tot AS (SELECT count(*) AS total_tokens FROM toks),
           |cov AS (SELECT count(*) AS covered_tokens FROM toks
           |        WHERE token IN (SELECT token FROM v))
           |SELECT total_tokens, covered_tokens,
           |       round(1.0 - covered_tokens::DOUBLE / total_tokens::DOUBLE,
           |             6) AS oov_rate
           |FROM tot, cov""".stripMargin
      },

      "text_cms_gauge" -> {
        val toksSql = TextOpsSql.tokens("text")
        """WITH toks AS (SELECT unnest(TOKS) AS token FROM documents),
          |p AS (SELECT * FROM (VALUES ('hash'), ('join'), ('merge'),
          |                            ('nosuchtoken'), ('spark')) v(token))
          |SELECT p.token,
          |       coalesce(e.exact_count, 0) AS exact_count,
          |       true AS cms_ok
          |FROM p LEFT JOIN (SELECT token, count(*) AS exact_count
          |                  FROM toks GROUP BY token) e USING (token)
          |ORDER BY p.token""".stripMargin.replace("TOKS", toksSql)
      },

      "text_rrf_hybrid" -> RelevanceSql.rrfHybrid("documents", "embeddings",
        "doc_id", "text", "vec_id", "embedding",
        Seq("spark", "hash", "merge"), queryVecId = 0L),

      "dsir_score" -> (RelevanceSql.dsirScores(
        rawFrom = "(SELECT doc_id, text FROM documents WHERE lang <> 'en') rsrc",
        targetFrom = "(SELECT text FROM documents WHERE lang = 'en') tsrc",
        idCol = "doc_id", textCol = "text", buckets = 256) +
        "\nORDER BY doc_id"),

      // literal VALUES from tools/bm25_reference.py (independent Python
      // implementation of the Okapi formula — not a rendering)
      "bm25_pinned" ->
        """SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(bm25 AS DOUBLE) AS bm25
          |FROM (VALUES
          |  (2, 1.646225),
          |  (4, 1.284146),
          |  (1, 0.743865)
          |) t(doc_id, bm25) ORDER BY doc_id""".stripMargin,

      "classifier_train" -> {
        import graft.operators.ClassifierSql
        s"""WITH cdocs AS (
           |  SELECT doc_id,
           |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
           |         ${TextOpsSql.tokenHashes(toks)} AS th
           |  FROM documents),
           |${ClassifierSql.trainCtes(64, 2, 1L, 1L)}
           |SELECT cell, w AS w_units FROM w2 WHERE w <> 0
           |UNION ALL SELECT 64, bu FROM b2
           |ORDER BY cell""".stripMargin
      },

      "classifier_train_score" -> {
        import graft.operators.ClassifierSql
        s"""WITH cdocs AS (
           |  SELECT doc_id,
           |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
           |         ${TextOpsSql.tokenHashes(toks)} AS th
           |  FROM documents),
           |${ClassifierSql.trainCtes(64, 2, 1L, 1L)}
           |SELECT * FROM (
           |${ClassifierSql.scoreSelect(64, 2)}
           |) ORDER BY doc_id""".stripMargin
      },

      "quality_classifier" -> {
        val score = QualityOpsSql.classifierScore("th")
        s"""WITH tok AS (SELECT doc_id, $toks AS toks FROM documents),
           |th AS (SELECT doc_id, ${TextOpsSql.tokenHashes("toks")} AS th
           |       FROM tok)
           |SELECT doc_id, round($score, 6) AS clf_score,
           |       ($score >= CAST(0.0 AS DOUBLE)) AS keep
           |FROM th ORDER BY doc_id""".stripMargin
      },

      "select_token_budget" -> {
        operators.SelectionSql.selectTokenBudget(
          table = "(SELECT doc_id, toks, " +
            s"${TextOpsSql.tokenHashes("toks")} AS th " +
            s"FROM (SELECT doc_id, $toks AS toks FROM documents)) pre",
          idCol = "doc_id",
          scoreSql = s"(${QualityOpsSql.classifierScore("th")} + CAST(0.5 AS DOUBLE))",
          tokensSql = "len(toks)",
          budget = 12000L) + "\nORDER BY doc_id"
      },

      // literal VALUES from tools/classifier_reference.py (independent
      // token-hash + cell-weight recomputation — not a rendering)
      "classifier_pinned" ->
        """SELECT CAST(case_id AS BIGINT) AS case_id,
          |       CAST(clf_score AS DOUBLE) AS clf_score
          |FROM (VALUES
          |  (1, 0.066683),
          |  (2, 0.162444),
          |  (3, 0.000000)
          |) t(case_id, clf_score) ORDER BY case_id""".stripMargin,

      "split_leakage" -> {
        val split = SamplingSql.splitCase("doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 7)
        s"""WITH $ExactDupCorpusSql,
           |s AS (SELECT doc_id, text, $split AS split FROM corpus)
           |SELECT min(doc_id) AS witness,
           |       count(DISTINCT split) AS n_splits,
           |       count(*) AS n_docs
           |FROM s GROUP BY text HAVING count(DISTINCT split) > 1
           |ORDER BY witness""".stripMargin
      },

      "sample_split" -> {
        val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
        s"""SELECT ${SamplingSql.splitCase("doc_id", splits, seed = 7)} AS split,
           |       count(*) AS n, min(doc_id) AS min_id, max(doc_id) AS max_id
           |FROM documents GROUP BY 1 ORDER BY split""".stripMargin
      },

      "sample_stratified" ->
        s"""SELECT lang, count(*) AS n_sampled, min(doc_id) AS min_id
           |FROM documents
           |WHERE ${SamplingSql.sampleWhere("doc_id", 0.2, seed = 3)}
           |GROUP BY lang ORDER BY lang""".stripMargin,

      "sample_by_quality" ->
        s"""WITH tok AS (SELECT doc_id, text, $toks AS tk FROM documents)
           |SELECT doc_id FROM tok
           |WHERE ${SamplingSql.hash16("doc_id", 13)} <
           |      CAST(floor(${QualityOpsSql.qualityScore("text", "tk")}
           |                 * ${Sampling.Buckets}.0) AS BIGINT)
           |ORDER BY doc_id""".stripMargin,

      "shuffle_assign" ->
        s"""SELECT ${SamplingSql.shuffleBucket("doc_id", 8, seed = 5)} AS shuffle_bucket,
           |       count(*) AS n,
           |       min(${SamplingSql.shuffleKey("doc_id", seed = 5)}) AS min_key,
           |       CAST(sum(doc_id) AS BIGINT) AS id_sum
           |FROM documents GROUP BY 1 ORDER BY shuffle_bucket""".stripMargin,

      "mix_by_lang" ->
        MixingSql.mixCounts("documents", "doc_id", "lang",
          Seq("en" -> 0.5, "de" -> 0.2, "es" -> 0.1, "fr" -> 0.1, "zh" -> 0.1),
          seed = 9),

      "mix_temperature" ->
        MixingSql.temperatureCounts("documents", "doc_id", "lang",
          temperature = 2.0, seed = 9),

      "sample_exact_k" ->
        s"""SELECT doc_id, source FROM (
           |  SELECT doc_id, source,
           |         row_number() OVER (PARTITION BY source
           |           ORDER BY ${SamplingSql.hash16("doc_id", 21)}, doc_id)
           |           AS rn
           |  FROM documents)
           |WHERE rn <= 15 ORDER BY doc_id""".stripMargin,

      "contamination_semantic" -> {
        val cos = VectorOpsSql.cosine("t.embedding", "ev.embedding")
        s"""WITH ev AS (SELECT embedding FROM embeddings
           |            WHERE vec_id % 17 = 0),
           |tr AS (SELECT vec_id, label, embedding FROM embeddings
           |       WHERE vec_id % 17 <> 0),
           |flagged AS (SELECT DISTINCT t.vec_id FROM tr t, ev
           |            WHERE $cos >= 0.35)
           |SELECT vec_id, label FROM tr
           |WHERE vec_id NOT IN (SELECT vec_id FROM flagged)
           |ORDER BY vec_id""".stripMargin
      },

      "profile_expectations" ->
        """WITH a AS (SELECT count(*) AS n,
          |  sum(CASE WHEN NOT coalesce(doc_id IS NOT NULL, false)
          |      THEN 1 ELSE 0 END)::BIGINT AS v_id,
          |  sum(CASE WHEN NOT coalesce(length(text) > 0, false)
          |      THEN 1 ELSE 0 END)::BIGINT AS v_text,
          |  sum(CASE WHEN NOT coalesce(lang IN ('en','de','fr','es','zh'),
          |                             false) THEN 1 ELSE 0 END)::BIGINT AS v_lang,
          |  sum(CASE WHEN NOT coalesce(n_chars = length(text), false)
          |      THEN 1 ELSE 0 END)::BIGINT AS v_chars,
          |  sum(CASE WHEN NOT coalesce(regexp_matches(source,
          |      '^src[0-9]+$'), false) THEN 1 ELSE 0 END)::BIGINT AS v_src
          |  FROM documents)
          |SELECT * FROM (
          |  SELECT 'chars_match_text' AS expectation, n AS n_rows,
          |         v_chars AS n_violations, v_chars = 0 AS pass FROM a
          |  UNION ALL SELECT 'id_not_null', n, v_id, v_id = 0 FROM a
          |  UNION ALL SELECT 'lang_known', n, v_lang, v_lang = 0 FROM a
          |  UNION ALL SELECT 'source_format', n, v_src, v_src = 0 FROM a
          |  UNION ALL SELECT 'text_nonempty', n, v_text, v_text = 0 FROM a)
          |ORDER BY expectation""".stripMargin,

      "curriculum_zorder" -> {
        val toksSql = TextOpsSql.tokens("text")
        val z = graft.operators.ZOrderSql.interleave2(
          "least(n_chars >> 2, 255)", s"least(len($toksSql), 255)", 8)
        s"""SELECT doc_id, $z AS zkey, ($z) >> 10 AS shard
           |FROM documents ORDER BY doc_id""".stripMargin
      },

      "quality_rank_normalize" ->
        """WITH d AS (SELECT doc_id, lang,
          |  greatest(0, least(CAST(floor(
          |    round(n_chars::DOUBLE / 1000.0, 6) * 65536) AS BIGINT),
          |    65535)) AS qb
          |  FROM documents)
          |SELECT d.doc_id, d.lang,
          |  round((SELECT count(*) FROM d d2
          |         WHERE d2.lang = d.lang AND d2.qb < d.qb)::DOUBLE
          |      / (SELECT count(*) FROM d d3
          |         WHERE d3.lang = d.lang), 6) AS rank_pct
          |FROM d ORDER BY d.doc_id""".stripMargin,

      "sample_weighted_k" ->
        s"""WITH d AS (SELECT doc_id, lang,
           |  round(-ln((CAST(${SamplingSql.hash16("doc_id", 33)} AS DOUBLE)
           |               + 1.0) / CAST(65537 AS DOUBLE))
           |        / CAST(n_chars AS DOUBLE), 9) AS ekey
           |  FROM documents)
           |SELECT doc_id, lang, ekey AS sample_key FROM (
           |  SELECT doc_id, lang, ekey,
           |         row_number() OVER (PARTITION BY lang
           |                            ORDER BY ekey, doc_id) AS rn
           |  FROM d)
           |WHERE rn <= 10 ORDER BY doc_id""".stripMargin,

      "mix_epochs" ->
        (MixingSql.epochRows("documents", "doc_id", "source",
          Seq("src0" -> 2.25, "src1" -> 0.5, "src2" -> 1.0, "src3" -> 3.0),
          seed = 9) + "\nORDER BY doc_id, epoch"),

      // literal expected VALUES from tools/hash16_reference.py — pins the
      // INTENT of hash16/assignSplit/sampleByHash/shuffleAssign (the other
      // sampling oracles are dual-rendered from the same arithmetic and
      // would echo a wrong hash)
      "sample_pinned" ->
        """SELECT CAST(id AS BIGINT) AS id, split, sampled,
          |       CAST(shuffle_key AS BIGINT) AS shuffle_key,
          |       CAST(shuffle_bucket AS BIGINT) AS shuffle_bucket
          |FROM (VALUES
          |  (0, 'val', TRUE, 61779, 3), (1, 'train', FALSE, 40708, 4),
          |  (2, 'train', FALSE, 19637, 5), (3, 'train', TRUE, 64102, 6),
          |  (4, 'train', FALSE, 43030, 6), (5, 'val', FALSE, 21959, 7),
          |  (6, 'train', TRUE, 888, 0), (7, 'train', FALSE, 45353, 1),
          |  (8, 'train', FALSE, 24282, 2), (9, 'train', TRUE, 3211, 3),
          |  (10, 'test', FALSE, 47676, 4), (11, 'train', FALSE, 26605, 5),
          |  (12, 'train', FALSE, 5534, 6), (13, 'train', FALSE, 49999, 7),
          |  (14, 'train', FALSE, 28927, 7), (15, 'train', FALSE, 7856, 0),
          |  (16, 'train', FALSE, 52321, 1), (17, 'val', FALSE, 31250, 2),
          |  (18, 'train', FALSE, 10179, 3), (19, 'train', FALSE, 54644, 4),
          |  (20, 'train', FALSE, 33573, 5), (21, 'train', FALSE, 12502, 6),
          |  (22, 'test', FALSE, 56967, 7), (23, 'train', FALSE, 35896, 0),
          |  (24, 'train', FALSE, 14824, 0), (25, 'train', FALSE, 59289, 1),
          |  (26, 'train', FALSE, 38218, 2), (27, 'test', FALSE, 17147, 3),
          |  (28, 'train', TRUE, 61612, 4), (29, 'train', FALSE, 40541, 5),
          |  (30, 'train', FALSE, 19470, 6), (31, 'train', TRUE, 63935, 7),
          |  (32, 'train', FALSE, 42864, 0), (33, 'train', FALSE, 21793, 1),
          |  (34, 'val', TRUE, 721, 1), (35, 'train', FALSE, 45186, 2),
          |  (36, 'train', FALSE, 24115, 3), (37, 'train', TRUE, 3044, 4),
          |  (38, 'train', FALSE, 47509, 5), (39, 'test', FALSE, 26438, 6),
          |  (40, 'train', TRUE, 5367, 7), (41, 'train', FALSE, 49832, 0),
          |  (42, 'train', FALSE, 28761, 1), (43, 'train', TRUE, 7690, 2),
          |  (44, 'test', FALSE, 52154, 2), (45, 'train', FALSE, 31083, 3),
          |  (46, 'val', TRUE, 10012, 4), (47, 'train', FALSE, 54477, 5),
          |  (48, 'train', FALSE, 33406, 6), (49, 'train', TRUE, 12335, 7),
          |  (50, 'train', FALSE, 56800, 0), (51, 'val', FALSE, 35729, 1),
          |  (52, 'train', TRUE, 14658, 2), (53, 'train', FALSE, 59123, 3),
          |  (54, 'train', FALSE, 38051, 3), (55, 'train', FALSE, 16980, 4),
          |  (56, 'test', FALSE, 61445, 5), (57, 'train', FALSE, 40374, 6),
          |  (58, 'train', FALSE, 19303, 7), (59, 'train', FALSE, 63768, 0),
          |  (60, 'train', FALSE, 42697, 1), (61, 'train', FALSE, 21626, 2),
          |  (62, 'train', FALSE, 555, 3), (63, 'val', FALSE, 45020, 4),
          |  (4294967301, 'val', FALSE, 17817, 1),
          |  (1099511627899, 'train', FALSE, 14064, 0),
          |  (4503599627370503, 'train', FALSE, 38041, 1),
          |  (4611686018427388903, 'train', FALSE, 32421, 5)
          |) t(id, split, sampled, shuffle_key, shuffle_bucket)
          |ORDER BY id""".stripMargin,

      "pack_sequences" -> {
        val cb = SamplingSql.cumBefore("source", "doc_id", "n_toks")
        s"""WITH d AS (SELECT doc_id, source, CAST(len($toks) AS BIGINT) AS n_toks
           |           FROM documents),
           |p AS (SELECT doc_id, source, n_toks, $cb AS cb FROM d)
           |SELECT doc_id, source, n_toks,
           |       CAST(cb // 1024 AS BIGINT) AS seq_id,
           |       CAST(cb % 1024 AS BIGINT) AS tok_offset
           |FROM p ORDER BY doc_id""".stripMargin
      },

      // literal VALUES from tools/binpack_reference.py — an independent
      // hand-maintained best-fit-decreasing statement (split-then-pack,
      // len-desc order, smallest-fitting-bin tie-lowest-id)
      "pack_bestfit_pinned" ->
        """SELECT * FROM (VALUES
          |  (1, 0, 7, 3, 0),
          |  (2, 0, 10, 0, 0),
          |  (2, 1, 10, 1, 0),
          |  (2, 2, 3, 3, 7),
          |  (3, 0, 4, 4, 6),
          |  (4, 0, 4, 5, 5),
          |  (5, 0, 10, 2, 0),
          |  (6, 0, 3, 6, 0),
          |  (7, 0, 6, 4, 0),
          |  (8, 0, 2, 6, 3),
          |  (9, 0, 5, 5, 0)
          |) t(doc_id, piece, len, seq_id, "offset")
          |ORDER BY doc_id, piece""".stripMargin,

      // conservation restated from token arithmetic alone; the validity
      // and BFD-bound columns are the invariants' expected verdicts —
      // any packing defect flips one on the Spark side
      "pack_bestfit" ->
        s"""WITH d AS (
           |  SELECT source, CAST(len($toks) AS BIGINT) AS n
           |  FROM documents)
           |SELECT source,
           |       CAST(count(*) AS BIGINT) AS n_docs,
           |       CAST(sum((n + 63) // 64) AS BIGINT) AS n_pieces,
           |       CAST(sum(n) AS BIGINT) AS total_tokens,
           |       true AS capacity_ok, true AS contiguous_ok,
           |       true AS bound_ok
           |FROM d WHERE n > 0
           |GROUP BY source ORDER BY source""".stripMargin,

      "chunk_sliding" -> {
        val thash = TextOpsSql.tokenHashes("tk")
        s"""WITH tok AS (SELECT doc_id, $toks AS tk FROM documents),
           |chunk_src AS (SELECT doc_id, $thash AS th FROM tok WHERE len(tk) > 0)
           |${ChunkingSql.slidingChunks("doc_id", 32, 16)}
           |ORDER BY doc_id, chunk_id""".stripMargin
      },

      "quota_per_source" -> {
        val score = QualityOpsSql.qualityScore("text", "tk")
        s"""WITH d AS (SELECT doc_id, source, text, $toks AS tk FROM documents),
           |s AS (SELECT doc_id, source, round($score, 6) AS score FROM d),
           |r AS (SELECT doc_id, source, score,
           |             row_number() OVER (PARTITION BY source
           |                                ORDER BY score DESC, doc_id) AS rank
           |      FROM s)
           |SELECT doc_id, source, score, CAST(rank AS BIGINT) AS rank
           |FROM r WHERE rank <= 20 ORDER BY source, rank""".stripMargin
      },

      // literal VALUES from the reference Python `regex` engine running
      // the published GPT-2 pattern over PretokenCorpus (independent
      // regex implementation) — kept in sync by hand
      "tok_pretoken_gpt2" ->
        """SELECT case_id, CAST(pos AS BIGINT) AS pos, piece
          |FROM (VALUES
          |  (1, 0, 'I'), (1, 1, '''ve'), (1, 2, ' said'), (1, 3, ' he'),
          |  (1, 4, '''ll'), (1, 5, ' don'), (1, 6, '''t'), (1, 7, ','),
          |  (1, 8, ' can'), (1, 9, '''t'), (1, 10, '.'),
          |  (2, 0, 'Hello'), (2, 1, '  '), (2, 2, ' world'),
          |  (3, 0, 'abc'), (3, 1, '123'), (3, 2, ' 42'), (3, 3, 'x'),
          |  (3, 4, ' '), (3, 5, ' 7'),
          |  (4, 0, 'tail'), (4, 1, ' spaces'), (4, 2, '  '),
          |  (5, 0, 'naïve'), (5, 1, ' café'), (5, 2, ' —'), (5, 3, ' €'),
          |  (5, 4, '5'), (5, 5, ','), (5, 6, '00'),
          |  (6, 0, 'line'), (6, 1, '1'), (6, 2, chr(10)), (6, 3, 'line'),
          |  (6, 4, '2'), (6, 5, '  ' || chr(10)), (6, 6, ' x'),
          |  (7, NULL, NULL)
          |) t(case_id, pos, piece)
          |ORDER BY case_id, pos""".stripMargin,

      // RE2 restatement: on the guarded rows (no multi-space run, no
      // trailing whitespace) the lookahead arm never fires, so the
      // plain `\s+` tail is exactly equivalent — a construction fact,
      // with the excluded forms pinned by tok_pretoken_gpt2
      "tok_pretoken_lossless" ->
        """WITH d AS (SELECT doc_id, text FROM documents
          |           WHERE NOT regexp_matches(text, '[^\x00-\x7f]|\s\s|\s$')),
          |p AS (SELECT doc_id, text,
          |        regexp_extract_all(text,
          |          '''s|''t|''re|''ve|''m|''ll|''d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+')
          |          AS pieces
          |      FROM d)
          |SELECT doc_id, CAST(len(pieces) AS BIGINT) AS n_pieces,
          |       array_to_string(pieces, '') = text AS lossless
          |FROM p ORDER BY doc_id""".stripMargin,

      "bpe_merges" ->
        s"""WITH bpe_vocab AS (SELECT tok AS word, count(*) AS freq
           |  FROM (SELECT unnest($toks) AS tok FROM documents) GROUP BY tok),
           |${BpeSql.trainCtes(12)}
           |SELECT * FROM (
           |${BpeSql.mergeRows(12)}
           |) ORDER BY rank""".stripMargin,

      // the same unrolled trainer over the RE2-restated pre-tokenizer
      // piece vocabulary (exact on the guarded rows): train on what you
      // will encode — both engines drop a piece's leading space through
      // the shared symbol-framing trim
      "bpe_merges_pretok" ->
        s"""WITH d AS (SELECT text FROM documents
           |      WHERE NOT regexp_matches(text, '[^\\x00-\\x7f]|\\s\\s|\\s$$')),
           |bpe_vocab AS (SELECT tok AS word, count(*) AS freq
           |  FROM (SELECT unnest(regexp_extract_all(text,
           |    '''s|''t|''re|''ve|''m|''ll|''d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+'))
           |    AS tok FROM d) GROUP BY tok),
           |${BpeSql.trainCtes(12)}
           |SELECT * FROM (
           |${BpeSql.mergeRows(12)}
           |) ORDER BY rank""".stripMargin,

      "bpe_encode" ->
        s"""WITH bpe_vocab AS (SELECT tok AS word, count(*) AS freq
           |  FROM (SELECT unnest($toks) AS tok FROM documents) GROUP BY tok),
           |${BpeSql.trainCtes(12)},
           |w AS (SELECT doc_id, unnest($toks) AS word FROM documents),
           |pc AS (SELECT doc_id,
           |         len(string_split(trim(${BpeSql.encodeWord("word", 12)}),
           |             '  ')) AS np
           |       FROM w)
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
           |       CAST(sum(np) AS BIGINT) AS n_pieces,
           |       round(sum(np)::DOUBLE / count(*)::DOUBLE, 6) AS ratio
           |FROM pc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      "tok_fertility" ->
        s"""WITH bpe_vocab AS (SELECT tok AS word, count(*) AS freq
           |  FROM (SELECT unnest($toks) AS tok FROM documents) GROUP BY tok),
           |${BpeSql.trainCtes(12)},
           |w AS (SELECT doc_id, unnest($toks) AS word FROM documents),
           |pc AS (SELECT doc_id,
           |         len(string_split(trim(${BpeSql.encodeWord("word", 12)}),
           |             '  ')) AS np
           |       FROM w),
           |per_doc AS (SELECT doc_id, CAST(sum(np) AS BIGINT) AS n_pieces
           |            FROM pc GROUP BY doc_id),
           |j AS (SELECT d.lang, CAST(length(d.text) AS BIGINT) AS n_chars,
           |             p.n_pieces
           |      FROM documents d JOIN per_doc p USING (doc_id))
           |SELECT lang, CAST(sum(n_chars) AS BIGINT) AS chars,
           |       CAST(sum(n_pieces) AS BIGINT) AS pieces,
           |       round(sum(n_chars)::DOUBLE / sum(n_pieces)::DOUBLE, 6)
           |         AS fertility
           |FROM j GROUP BY lang ORDER BY lang""".stripMargin,

      // same trained merges, applied per RE2-restated pre-tokenizer
      // piece (exact on the guarded rows); a piece's leading space drops
      // out of the symbol framing in both engines by the shared trim
      "bpe_encode_pretok" ->
        s"""WITH bpe_vocab AS (SELECT tok AS word, count(*) AS freq
           |  FROM (SELECT unnest($toks) AS tok FROM documents) GROUP BY tok),
           |${BpeSql.trainCtes(12)},
           |d AS (SELECT doc_id, text FROM documents
           |      WHERE NOT regexp_matches(text, '[^\\x00-\\x7f]|\\s\\s|\\s$$')),
           |w AS (SELECT doc_id,
           |        unnest(regexp_extract_all(text,
           |          '''s|''t|''re|''ve|''m|''ll|''d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+'))
           |          AS word
           |      FROM d),
           |pc AS (SELECT doc_id,
           |         len(string_split(trim(${BpeSql.encodeWord("word", 12)}),
           |             '  ')) AS np
           |       FROM w)
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pre_pieces,
           |       CAST(sum(np) AS BIGINT) AS n_bpe_pieces,
           |       round(sum(np)::DOUBLE / count(*)::DOUBLE, 6) AS ratio
           |FROM pc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      // literal VALUES from tools/bpe_reference.py (independent list-based
      // implementation of the same training rule)
      "bpe_pinned" ->
        """SELECT CAST(rank AS BIGINT) AS rank, left_sym, right_sym,
          |       CAST(pair_freq AS BIGINT) AS pair_freq
          |FROM (VALUES
          |  (1, 'e', 's', 13), (2, 'es', 't', 13), (3, 'l', 'o', 11),
          |  (4, 'lo', 'w', 11), (5, 'e', 'w', 6), (6, 'ew', 'est', 6),
          |  (7, 'n', 'ewest', 6), (8, 'low', 'est', 4)
          |) t(rank, left_sym, right_sym, pair_freq)
          |ORDER BY rank""".stripMargin,

      "wordpiece_merges" ->
        s"""WITH wp_vocab AS (SELECT tok AS word, count(*) AS freq
           |  FROM (SELECT unnest($toks) AS tok FROM documents) GROUP BY tok),
           |${WordPieceSql.trainCtes(10)}
           |SELECT * FROM (
           |${WordPieceSql.mergeRows(10)}
           |) ORDER BY rank""".stripMargin,

      "stream_dict_gate" -> {
        val vals = SparkEntry.BlockPhrases
          .map(p => s"('${p.replace("'", "''")}')").mkString(", ")
        s"""WITH ph AS (SELECT * FROM (VALUES $vals) t(phrase)),
           |d AS (SELECT doc_id, text AS t FROM documents
           |      WHERE text IS NOT NULL),
           |pos AS (SELECT doc_id, t, unnest(range(1, length(t) + 1)) AS i
           |        FROM d),
           |hit AS (SELECT DISTINCT pos.doc_id
           |        FROM pos JOIN ph
           |          ON substr(pos.t, pos.i, length(ph.phrase)) = ph.phrase)
           |SELECT doc_id FROM d
           |WHERE doc_id NOT IN (SELECT doc_id FROM hit)
           |ORDER BY doc_id""".stripMargin
      },

      "stream_hygiene_gate" -> {
        val net = functions.QualityOpsSql.containsLuhnCard("text")
        s"""WITH injected AS (
           |  SELECT doc_id, text ||
           |    CASE doc_id % 4 WHEN 0 THEN ' don’t stop'
           |                    WHEN 1 THEN ' café olé'
           |                    WHEN 2 THEN ' naïve über'
           |                    ELSE '' END ||
           |    CASE WHEN doc_id % 5 = 0
           |         THEN ' card 4532 0151 1283 0366 ok' ELSE '' END ||
           |    CASE WHEN doc_id % 7 = 0
           |         THEN ' pay 4111-1111-1111-1112 now' ELSE '' END ||
           |    CASE WHEN doc_id % 11 = 0
           |         THEN ' amex 371449635398431.' ELSE '' END ||
           |    CASE WHEN doc_id % 13 = 0
           |         THEN ' visa 4111 1111 1111 1111 12 26 exp'
           |         ELSE '' END AS text
           |  FROM documents),
           |kept AS (SELECT doc_id, text FROM injected
           |         WHERE NOT $net)
           |SELECT doc_id, ${functions.QualityOpsSql.redactPii("text")}
           |         AS text
           |FROM kept ORDER BY doc_id""".stripMargin
      },

      "stream_html_gate" ->
        s"""WITH h AS (SELECT doc_id, $SynthHtmlSql AS html FROM documents),
           |x AS (SELECT doc_id,
           |             replace(${HtmlOpsSql.mainText("html", 0.5)},
           |                     chr(10), ' ') AS text
           |      FROM h)
           |SELECT doc_id,
           |       CAST(len(list_filter(string_split(text, ' '),
           |                 t -> t <> '')) AS BIGINT) AS n_tokens
           |FROM x
           |WHERE len(list_filter(string_split(text, ' '), t -> t <> '')) >= 12
           |ORDER BY doc_id""".stripMargin,

      "dict_match_stats" -> {
        val vals = SparkEntry.DictPhrases
          .map(p => s"('${p.replace("'", "''")}')").mkString(", ")
        s"""WITH ph AS (SELECT * FROM (VALUES $vals) t(phrase)),
           |d AS (SELECT doc_id, text AS t FROM documents
           |      WHERE text IS NOT NULL),
           |pos AS (SELECT doc_id, t, unnest(range(1, length(t) + 1)) AS i
           |        FROM d),
           |m AS (SELECT pos.doc_id, ph.phrase
           |      FROM pos JOIN ph
           |        ON substr(pos.t, pos.i, length(ph.phrase)) = ph.phrase)
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS total_matches,
           |       CAST(count(DISTINCT phrase) AS BIGINT) AS distinct_phrases
           |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin
      },

      // an independent statement of the suffix ordering: DuckDB sorts the
      // window-bounded suffix STRINGS directly (binary collation = the
      // prefix-doubling ranks' UTF-8 byte order)
      "suffix_array_ranks" ->
        """WITH d AS (SELECT doc_id, text AS t
          |           FROM documents WHERE text IS NOT NULL AND length(text) > 0),
          |s AS (SELECT doc_id, t, unnest(range(1, length(t) + 1)) AS i FROM d),
          |r AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
          |             CAST(dense_rank() OVER (ORDER BY substr(t, i, 48)) - 1
          |                  AS BIGINT) AS rk
          |      FROM s)
          |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_suffixes,
          |       CAST(sum(rk * (pos + 1)) AS BIGINT) AS rank_checksum
          |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      "suffix_array_top" ->
        """WITH d AS (SELECT doc_id, text AS t
          |           FROM documents WHERE text IS NOT NULL AND length(text) > 0),
          |s AS (SELECT doc_id, t, unnest(range(1, length(t) + 1)) AS i FROM d),
          |r AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
          |             substr(t, i, 48) AS suffix,
          |             CAST(dense_rank() OVER (ORDER BY substr(t, i, 48)) - 1
          |                  AS BIGINT) AS rk
          |      FROM s)
          |SELECT rk AS rank, doc_id, pos, suffix
          |FROM r ORDER BY rank, doc_id, pos LIMIT 20""".stripMargin,

      "suffix_repeated_windows" ->
        """WITH d AS (SELECT doc_id, text AS t
          |           FROM documents WHERE text IS NOT NULL AND length(text) > 0),
          |s AS (SELECT doc_id, t, unnest(range(1, length(t) + 1)) AS i FROM d),
          |w AS (SELECT doc_id, substr(t, i, 48) AS sub
          |      FROM s WHERE i + 47 <= length(t))
          |SELECT sub AS snippet, CAST(count(*) AS BIGINT) AS n_occurrences,
          |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
          |FROM w GROUP BY sub HAVING count(*) > 1
          |ORDER BY n_occurrences DESC, snippet LIMIT 20""".stripMargin,

      // the sharded derivations must equal the monolithic rebuild — the
      // oracles ARE the monolithic full-corpus statements (shards never
      // appear: the partition of documents into releases is invisible
      // to the corpus-level answer)
      "suffix_sharded_build" ->
        """WITH d AS (SELECT doc_id, text AS t
          |           FROM documents
          |           WHERE text IS NOT NULL AND length(text) > 0)
          |SELECT CAST(doc_id % 2 AS BIGINT) AS shard,
          |       CAST(sum(length(t)) AS BIGINT) AS n_suffixes,
          |       CAST(count(*) AS BIGINT) AS n_docs
          |FROM d GROUP BY CAST(doc_id % 2 AS BIGINT)
          |ORDER BY shard""".stripMargin,

      "suffix_sharded_windows" ->
        """WITH d AS (SELECT doc_id, text AS t
          |           FROM documents WHERE text IS NOT NULL AND length(text) > 0),
          |s AS (SELECT doc_id, t, unnest(range(1, length(t) + 1)) AS i FROM d),
          |w AS (SELECT doc_id, substr(t, i, 48) AS sub
          |      FROM s WHERE i + 47 <= length(t))
          |SELECT sub AS snippet, CAST(count(*) AS BIGINT) AS n_occurrences,
          |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
          |FROM w GROUP BY sub HAVING count(*) > 1
          |ORDER BY n_occurrences DESC, snippet LIMIT 20""".stripMargin,

      "suffix_sharded_positions" ->
        """WITH d AS (SELECT doc_id, text AS t
          |           FROM documents WHERE text IS NOT NULL AND length(text) > 0),
          |s AS (SELECT doc_id, t, unnest(range(1, length(t) + 1)) AS i FROM d),
          |w AS (SELECT doc_id, i, substr(t, i, 48) AS sub
          |      FROM s WHERE i + 47 <= length(t)),
          |m AS (SELECT sub FROM w GROUP BY sub
          |      HAVING count(DISTINCT doc_id) > 1)
          |SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos
          |FROM w JOIN m USING (sub)
          |ORDER BY doc_id, pos""".stripMargin,

      "suffix_sharded_excise" ->
        """WITH d AS (SELECT doc_id, text AS t
          |           FROM documents WHERE text IS NOT NULL AND length(text) > 0),
          |s AS (SELECT doc_id, t, unnest(range(1, length(t) + 1)) AS i FROM d),
          |w AS (SELECT doc_id, i, substr(t, i, 48) AS sub
          |      FROM s WHERE i + 47 <= length(t)),
          |m AS (SELECT sub FROM w GROUP BY sub
          |      HAVING count(DISTINCT doc_id) > 1),
          |cov AS (SELECT DISTINCT w.doc_id, w.i - 1 + x.k AS ci
          |        FROM w JOIN m USING (sub)
          |        CROSS JOIN (SELECT unnest(range(48)) AS k) x),
          |c AS (SELECT doc_id, t, unnest(range(length(t))) AS ci FROM d),
          |kept AS (SELECT c.doc_id, c.ci, substr(c.t, c.ci + 1, 1) AS ch
          |         FROM c LEFT JOIN cov
          |           ON c.doc_id = cov.doc_id AND c.ci = cov.ci
          |         WHERE cov.ci IS NULL),
          |agg AS (SELECT doc_id, string_agg(ch, '' ORDER BY ci) AS kt
          |        FROM kept GROUP BY doc_id)
          |SELECT d.doc_id, coalesce(a.kt, '') AS clean_text,
          |       CAST(length(d.t) - coalesce(length(a.kt), 0) AS BIGINT)
          |         AS n_cut
          |FROM d LEFT JOIN agg a USING (doc_id)
          |ORDER BY doc_id""".stripMargin,

      // excision positions re-derived from the substrings themselves:
      // multiplicity by grouping the 48-cp windows, position set by
      // joining back — no ranks, no index
      "suffix_repeated_positions" ->
        """WITH d AS (SELECT doc_id, text AS t
          |           FROM documents WHERE text IS NOT NULL AND length(text) > 0),
          |s AS (SELECT doc_id, t, unnest(range(1, length(t) + 1)) AS i FROM d),
          |w AS (SELECT doc_id, i, substr(t, i, 48) AS sub
          |      FROM s WHERE i + 47 <= length(t)),
          |m AS (SELECT sub FROM w GROUP BY sub
          |      HAVING count(DISTINCT doc_id) > 1)
          |SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos
          |FROM w JOIN m USING (sub)
          |ORDER BY doc_id, pos""".stripMargin,

      // the excision restated from the substrings: coverage = repeated
      // windows expanded to character indices, clean text = the ordered
      // string_agg of uncovered characters (empty when fully covered)
      "suffix_excise" ->
        """WITH d AS (SELECT doc_id, text AS t
          |           FROM documents WHERE text IS NOT NULL AND length(text) > 0),
          |s AS (SELECT doc_id, t, unnest(range(1, length(t) + 1)) AS i FROM d),
          |w AS (SELECT doc_id, i, substr(t, i, 48) AS sub
          |      FROM s WHERE i + 47 <= length(t)),
          |m AS (SELECT sub FROM w GROUP BY sub
          |      HAVING count(DISTINCT doc_id) > 1),
          |cov AS (SELECT DISTINCT w.doc_id, w.i - 1 + x.k AS ci
          |        FROM w JOIN m USING (sub)
          |        CROSS JOIN (SELECT unnest(range(48)) AS k) x),
          |c AS (SELECT doc_id, t, unnest(range(length(t))) AS ci FROM d),
          |kept AS (SELECT c.doc_id, c.ci, substr(c.t, c.ci + 1, 1) AS ch
          |         FROM c LEFT JOIN cov
          |           ON c.doc_id = cov.doc_id AND c.ci = cov.ci
          |         WHERE cov.ci IS NULL),
          |agg AS (SELECT doc_id, string_agg(ch, '' ORDER BY ci) AS kt
          |        FROM kept GROUP BY doc_id)
          |SELECT d.doc_id, coalesce(a.kt, '') AS clean_text,
          |       CAST(length(d.t) - coalesce(length(a.kt), 0) AS BIGINT)
          |         AS n_cut
          |FROM d LEFT JOIN agg a USING (doc_id)
          |ORDER BY doc_id""".stripMargin,

      "wordpiece_encode" ->
        s"""WITH RECURSIVE wp_vocab AS (SELECT tok AS word, count(*) AS freq
           |  FROM (SELECT unnest($toks) AS tok FROM documents) GROUP BY tok),
           |${WordPieceSql.trainCtes(10)},
           |wp_words AS MATERIALIZED (SELECT DISTINCT word FROM wp_vocab),
           |${WordPieceSql.encodeCtes(10)},
           |w AS (SELECT doc_id, unnest($toks) AS word FROM documents)
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
           |       CAST(sum(npieces) AS BIGINT) AS n_pieces,
           |       round(sum(npieces)::DOUBLE / count(*)::DOUBLE, 6) AS ratio
           |FROM w JOIN wp_npieces USING (word)
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      // literal VALUES from tools/wordpiece_reference.py (independent
      // naive-recount implementation of the same likelihood rule)
      "wordpiece_pinned" ->
        """SELECT CAST(rank AS BIGINT) AS rank, left_sym, right_sym,
          |       CAST(pair_freq AS BIGINT) AS pair_freq,
          |       CAST(score AS DOUBLE) AS score
          |FROM (VALUES
          |  (1, '##i', '##d', 3, 0.333333333),
          |  (2, 'w', '##id', 3, 0.333333333),
          |  (3, 'l', '##o', 11, 0.090909091),
          |  (4, '##s', '##t', 13, 0.076923077),
          |  (5, 'lo', '##w', 11, 0.058823529),
          |  (6, '##e', '##r', 2, 0.047619048),
          |  (7, 'low', '##er', 2, 0.090909091),
          |  (8, '##e', '##st', 13, 0.052631579)
          |) t(rank, left_sym, right_sym, pair_freq, score)
          |ORDER BY rank""".stripMargin,

      // the reference's greedy segmentations of the pinned probe words;
      // '##l' never occurs (l is only word-initial), so 'newlow'/'elow'
      // void to ONE [UNK] — the BERT rule, not a partial segmentation
      "wordpiece_encode_pinned" ->
        """SELECT word, pieces FROM (VALUES
          |  ('lowest', 'low ##est'), ('newest', 'n ##e ##w ##est'),
          |  ('low', 'low'), ('wider', 'wid ##er'), ('newlow', '[UNK]'),
          |  ('elow', '[UNK]'), ('zzz', '[UNK]')
          |) t(word, pieces)
          |ORDER BY word""".stripMargin,

      // literal expected VALUES from tools/unigram_reference.py — the
      // independent EM implementation's trained distribution at 9 decimals
      "unigram_tokenizer" ->
        """SELECT piece, CAST(prob AS DOUBLE) AS prob FROM (VALUES
          |  ('d', 0.041268399), ('e', 0.005874964), ('est', 0.194856490),
          |  ('i', 0.087650864), ('l', 0.000140486), ('low', 0.221547923),
          |  ('lowe', 0.081095236), ('n', 0.000132884), ('new', 0.073616489),
          |  ('o', 0.000008082), ('r', 0.058433909), ('s', 0.000217430),
          |  ('st', 0.124118211), ('t', 0.012880653), ('w', 0.098157979)
          |) t(piece, prob)
          |ORDER BY piece""".stripMargin,

      // the reference's Viterbi segmentations of the pinned probe words
      "unigram_encode_pinned" ->
        """SELECT word, pieces FROM (VALUES
          |  ('lowest', 'low est'), ('newest', 'new est'), ('low', 'low'),
          |  ('wider', 'w i d e r'), ('newlow', 'new low')
          |) t(word, pieces)
          |ORDER BY word""".stripMargin,

      "text_fingerprint" -> {
        val thw = TextOpsSql.tokenHashesWide(toks)
        s"""SELECT doc_id,
           |       ${TextOpsSql.polyHash("text")} AS fingerprint,
           |       ${TextOpsSql.simHash("thw")} AS simhash
           |FROM (SELECT doc_id, text, $thw AS thw FROM documents)
           |ORDER BY doc_id""".stripMargin
      },

      // literal expected VALUES from tools/texthash_reference.py — pins the
      // INTENT of the text-hash arithmetic (the corpus-scale oracles are
      // dual-rendered from the same constants and would echo a wrong hash)
      "text_hash_pinned" ->
        """SELECT CAST(case_id AS BIGINT) AS case_id,
          |       CAST(fingerprint AS BIGINT) AS fingerprint,
          |       CAST(simhash AS BIGINT) AS simhash,
          |       CAST(n_shingles AS BIGINT) AS n_shingles,
          |       CAST(shingle_0 AS BIGINT) AS shingle_0,
          |       CAST(band_0 AS BIGINT) AS band_0,
          |       CAST(band_3 AS BIGINT) AS band_3
          |FROM (VALUES
          |  (1, 579627, 211357489817416, 7, 614751648, 1921131228, 261861308),
          |  (2, 820371, 220822365537306792, 2, 710699018, 844969394, 888769332),
          |  (3, 94307, 206158430208, 0, NULL, NULL, NULL),
          |  (4, 0, 0, 0, NULL, NULL, NULL),
          |  (5, 817000, 6665789253092, 2, 1620026318, 537751134, 1553014722)
          |) t(case_id, fingerprint, simhash, n_shingles, shingle_0, band_0, band_3)
          |ORDER BY case_id""".stripMargin,

      "text_quality" ->
        s"""SELECT doc_id,
           |       (len($toks) BETWEEN 20 AND 1000)
           |       AND (${TextOpsSql.punctCount("text")}::DOUBLE
           |            / greatest(length(text)::DOUBLE, 1.0) < 0.1) AS quality_ok
           |FROM documents ORDER BY doc_id""".stripMargin,

      // the composed curation pipeline, stage for stage: gopher gate →
      // ppl tercile (tail drops) → keep-first → LSH keep (no identical
      // texts survive keep-first, so the banding join IS the keep rule) →
      // quality thinning → split accounting
      "pipeline_curation" -> {
        val thash = TextOpsSql.tokenHashes("tk")
        val shingles = TextOpsSql.shingleHashes("th")
        val sig = TextOpsSql.minHashSignature("ss")
        val bucketCase = (0 until TextOps.Bands)
          .map(b => s"WHEN ${b} THEN ${TextOpsSql.bandHash("sig", b)}")
          .mkString("CASE band ", " ", " END")
        def fracCte(n: Int) =
          s"""f$n AS (
             |  SELECT d.doc_id,
             |         coalesce(round(x.mx::DOUBLE / x.tot::DOUBLE, 6), 0.0)
             |           AS frac
             |  FROM d0 d LEFT JOIN (
             |    SELECT doc_id, max(cnt) AS mx, sum(cnt) AS tot FROM (
             |      SELECT doc_id, g, count(*) AS cnt FROM (
             |        SELECT doc_id,
             |               unnest(${TextOpsSql.shingleHashes("th", n)}) AS g
             |        FROM gq) GROUP BY doc_id, g) GROUP BY doc_id) x
             |    ON d.doc_id = x.doc_id)""".stripMargin
        val split = SamplingSql.splitCase("doc_id",
          Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05), seed = 3)
        s"""WITH ppl AS (
           |  SELECT doc_id, bucket FROM (
           |    ${operators.PerplexitySql.pplBuckets(
                  "documents", "doc_id", "text", "lang = 'en'")})),
           |d0 AS (SELECT doc_id, text, $toks AS tk FROM documents),
           |gq AS (SELECT doc_id, text, tk, $thash AS th FROM d0),
           |${fracCte(2)}, ${fracCte(3)}, ${fracCte(4)},
           |gate AS (
           |  SELECT g.doc_id, g.text, g.tk, g.th FROM gq g
           |  JOIN f2 ON g.doc_id = f2.doc_id
           |  JOIN f3 ON g.doc_id = f3.doc_id
           |  JOIN f4 ON g.doc_id = f4.doc_id
           |  JOIN ppl ON g.doc_id = ppl.doc_id
           |  WHERE f2.frac <= 0.20 AND f3.frac <= 0.18 AND f4.frac <= 0.16
           |    AND ppl.bucket <> 'tail'),
           |kf AS (SELECT gate.* FROM gate
           |       JOIN (SELECT text, min(doc_id) AS mid FROM gate
           |             GROUP BY text) m
           |         ON gate.text = m.text AND gate.doc_id = m.mid),
           |sgt AS (SELECT doc_id, list_distinct($shingles) AS ss FROM kf),
           |sg AS (SELECT doc_id, ss, $sig AS sig FROM sgt),
           |bands AS (SELECT doc_id, ss, band, $bucketCase AS bucket
           |          FROM sg, (VALUES (0), (1), (2), (3)) b(band)),
           |drops AS (SELECT DISTINCT r.doc_id
           |          FROM bands l JOIN bands r
           |            ON l.band = r.band AND l.bucket = r.bucket
           |           AND l.doc_id < r.doc_id
           |          WHERE ${TextOpsSql.jaccard("l.ss", "r.ss")}
           |                >= CAST(0.7 AS DOUBLE)),
           |nd AS (SELECT kf.* FROM kf
           |       WHERE doc_id NOT IN (SELECT doc_id FROM drops)),
           |thin AS (SELECT * FROM nd
           |         WHERE ${SamplingSql.hash16("doc_id", 17)} <
           |               CAST(floor(${QualityOpsSql.qualityScore("text", "tk")}
           |                          * ${Sampling.Buckets}.0) AS BIGINT))
           |SELECT $split AS split, count(*) AS n_docs,
           |       CAST(sum(len(tk)) AS BIGINT) AS sum_tokens,
           |       min(doc_id) AS min_id
           |FROM thin GROUP BY 1 ORDER BY split""".stripMargin
      },

      // per-n top-fraction via unnest + GROUP BY (the intent statement of
      // the native max-multiplicity projection); empty shingle arrays
      // (docs shorter than n tokens) score 0.0
      "quality_gopher_ngrams" -> {
        def fracCte(n: Int) =
          s"""f$n AS (
             |  SELECT d.doc_id,
             |         coalesce(round(x.mx::DOUBLE / x.tot::DOUBLE, 6), 0.0)
             |           AS frac
             |  FROM d LEFT JOIN (
             |    SELECT doc_id, max(cnt) AS mx, sum(cnt) AS tot FROM (
             |      SELECT doc_id, g, count(*) AS cnt FROM (
             |        SELECT doc_id,
             |               unnest(${TextOpsSql.shingleHashes("th", n)}) AS g
             |        FROM b) GROUP BY doc_id, g) GROUP BY doc_id) x
             |    ON d.doc_id = x.doc_id)""".stripMargin
        s"""WITH d AS (SELECT doc_id, $toks AS tk FROM documents),
           |b AS (SELECT doc_id, ${TextOpsSql.tokenHashes("tk")} AS th FROM d),
           |${fracCte(2)}, ${fracCte(3)}, ${fracCte(4)}
           |SELECT d.doc_id, f2.frac AS top2_frac, f3.frac AS top3_frac,
           |       f4.frac AS top4_frac,
           |       (f2.frac <= 0.20 AND f3.frac <= 0.18 AND f4.frac <= 0.16)
           |         AS keep
           |FROM d JOIN f2 ON d.doc_id = f2.doc_id
           |       JOIN f3 ON d.doc_id = f3.doc_id
           |       JOIN f4 ON d.doc_id = f4.doc_id
           |ORDER BY d.doc_id""".stripMargin
      },

      "quality_repetition" ->
        s"""WITH d AS (SELECT doc_id, $toks AS tk FROM documents),
           |b AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_toks,
           |             CAST(len(list_distinct(tk)) AS BIGINT) AS n_uniq,
           |             ${TextOpsSql.tokenHashes("tk")} AS th
           |      FROM d WHERE len(tk) >= 2),
           |x AS (SELECT doc_id, n_toks, n_uniq,
           |             unnest(${TextOpsSql.shingleHashes("th", 2)}) AS bg
           |      FROM b),
           |c AS (SELECT doc_id, n_toks, n_uniq, bg, count(*) AS cnt
           |      FROM x GROUP BY 1, 2, 3, 4)
           |SELECT doc_id,
           |       1.0 - n_uniq::DOUBLE / n_toks::DOUBLE AS dup_token_frac,
           |       max(cnt)::DOUBLE / sum(cnt)::DOUBLE AS top_bigram_frac
           |FROM c GROUP BY doc_id, n_toks, n_uniq ORDER BY doc_id""".stripMargin,

      "quality_score" -> {
        val score = QualityOpsSql.qualityScore("text", "tk")
        s"""WITH d AS (SELECT doc_id, text, $toks AS tk FROM documents)
           |SELECT doc_id, round($score, 6) AS score,
           |       ($score >= CAST(0.5 AS DOUBLE)) AS keep
           |FROM d ORDER BY doc_id""".stripMargin
      },

      "bucketed_join" ->
        s"""SELECT d.doc_id, d.lang, e.label
           |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
           |ORDER BY d.doc_id""".stripMargin,

      "ann_mmr_topk" -> {
        val k = 5
        val lam = 0.5
        // DuckDB bars subqueries inside lambdas, so each greedy step
        // CROSS JOINs the prior single-row picks as p1..p_{i-1} and the
        // cosine folds reference their columns directly
        val steps = (2 to k).map { i =>
          val joins = (1 until i).map(j => s"s$j p$j").mkString(", ")
          val notPrev = (1 until i).map(j => s"short.id <> p$j.id")
            .mkString(" AND ")
          val sims = (1 until i).map(j =>
            VectorOpsSql.cosine("short.v", s"p$j.v"))
          val maxsim =
            if (sims.size == 1) sims.head
            else s"greatest(${sims.mkString(", ")})"
          s"""s$i AS (SELECT short.id, short.v, short.rel,
             |  $lam * short.rel - ${1 - lam} * $maxsim AS score
             |  FROM short, $joins WHERE $notPrev
             |  ORDER BY score DESC, short.id LIMIT 1)""".stripMargin
        }.mkString(",\n")
        val out = (1 to k).map { i =>
          val sc = if (i == 1) "rel" else "score"
          s"SELECT CAST($i AS BIGINT) AS rank, id, round(rel, 6) AS rel, " +
            s"round($sc, 6) AS mmr FROM s$i"
        }.mkString("\nUNION ALL ")
        s"""WITH q AS (SELECT embedding AS qv FROM embeddings
           |           WHERE vec_id = 0),
           |c AS (SELECT vec_id AS id, embedding AS v,
           |             ${VectorOpsSql.cosine("embedding", "qv")} AS rel
           |      FROM embeddings, q WHERE vec_id > 0),
           |short AS (SELECT * FROM c ORDER BY rel DESC, id LIMIT 16),
           |s1 AS (SELECT id, v, rel, rel AS score FROM short
           |       ORDER BY rel DESC, id LIMIT 1),
           |$steps
           |$out
           |ORDER BY rank""".stripMargin
      },

      "embed_pooled_topk" -> {
        val nrm = VectorOpsSql.norm("vec")
        s"""WITH src AS (SELECT vec_id % 100 AS key, embedding AS emb
           |             FROM embeddings),
           |${operators.PoolingSql.meanPoolCtes("src")},
           |unitv AS (SELECT key,
           |            CASE WHEN $nrm > 0
           |                 THEN list_transform(vec, e -> e / $nrm)
           |                 ELSE vec END AS vec
           |          FROM pooled),
           |q AS (SELECT vec AS qv FROM unitv WHERE key = 0),
           |scored AS (SELECT key,
           |             round(${VectorOpsSql.cosine("vec", "qv")}, 6)
           |               AS cosine
           |           FROM unitv, q WHERE key > 0)
           |SELECT key, cosine FROM (
           |  SELECT key, cosine FROM scored
           |  ORDER BY cosine DESC, key LIMIT 10) v
           |ORDER BY key""".stripMargin
      },

      "embed_mean_pool" ->
        s"""WITH src AS (SELECT vec_id % 100 AS key, embedding AS emb
           |             FROM embeddings),
           |${operators.PoolingSql.meanPoolCtes("src")}
           |SELECT key, n_chunks,
           |       CAST(unnest(range(len(vec))) AS BIGINT) AS pos,
           |       round(unnest(vec), 6) AS m
           |FROM pooled ORDER BY key, pos""".stripMargin,

      "embed_mean_pool_unit" -> {
        val nrm = VectorOpsSql.norm("vec")
        s"""WITH src AS (SELECT vec_id % 100 AS key, embedding AS emb
           |             FROM embeddings),
           |${operators.PoolingSql.meanPoolCtes("src")}
           |SELECT key, n_chunks, pos, round(v, 6) AS m FROM (
           |  SELECT key, n_chunks,
           |         CAST(unnest(range(len(vec))) AS BIGINT) AS pos,
           |         unnest(CASE WHEN $nrm > 0
           |                THEN list_transform(vec, e -> e / $nrm)
           |                ELSE vec END) AS v
           |  FROM pooled) z ORDER BY key, pos""".stripMargin
      },

      "kmeans_train" -> operators.KMeansSql.centroids(
        "embeddings", "vec_id", "embedding", k = 4, iters = 2),

      "corpus_card" ->
        s"""WITH base AS (
           |  SELECT count(*) AS n_docs,
           |         count(DISTINCT lang) AS n_langs,
           |         count(DISTINCT source) AS n_sources,
           |         CAST(sum(len($toks)) AS BIGINT) AS sum_tokens,
           |         CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |         CAST(max(len($toks)) AS BIGINT) AS max_doc_tokens
           |  FROM documents),
           |dups AS (
           |  SELECT count(*) AS n_dup_groups,
           |         CAST(coalesce(sum(n - 1), 0) AS BIGINT) AS n_redundant_docs
           |  FROM (SELECT count(*) AS n FROM documents GROUP BY text)
           |  WHERE n > 1)
           |SELECT * FROM base CROSS JOIN dups""".stripMargin,

      // hand-derived canonical forms (each traced by hand through the rule
      // order in UrlOps.normalizeUrl's scaladoc) — literal VALUES, no
      // computed rendering
      "url_pinned" ->
        """SELECT CAST(case_id AS BIGINT) AS case_id, canonical_url
          |FROM (VALUES
          |  (1, 'https://example.com/Path/?q=1'),
          |  (2, 'http://site.org/a'),
          |  (3, 'https://site.org'),
          |  (4, 'https://a.b/c'),
          |  (5, 'https://a.b/c?x=1&y=2'),
          |  (6, 'http://www.ex.com'),
          |  (7, 'https://a.b/path'),
          |  (8, 'ftp://host.com/File'),
          |  (9, 'no-scheme/relative')) t(case_id, canonical_url)
          |ORDER BY case_id""".stripMargin,

      "url_dedup_pinned" ->
        """SELECT CAST(doc_id AS BIGINT) AS doc_id, canonical_url
          |FROM (VALUES
          |  (1, 'https://example.com/a'),
          |  (4, 'http://other.org'),
          |  (6, 'https://unique.net/x')) t(doc_id, canonical_url)
          |ORDER BY doc_id""".stripMargin,

      "filter_domain_blocklist" ->
        """WITH d AS (SELECT doc_id,
          |  lower(lang || '.' || source || '.example.com') AS host
          |  FROM documents)
          |SELECT doc_id, host FROM d
          |WHERE NOT EXISTS (
          |  SELECT 1 FROM (VALUES ('src3.example.com'),
          |                        ('de.src7.example.com'),
          |                        ('example.org')) b(bdom)
          |  WHERE d.host = b.bdom OR d.host LIKE ('%.' || b.bdom))
          |ORDER BY doc_id""".stripMargin,

      "domain_quality_prune" ->
        s"""WITH d AS (SELECT doc_id,
           |  lower(lang || '.' || source || '.example.com') AS host,
           |  len(${graft.functions.TextOpsSql.tokens("text")}) AS ntok
           |  FROM documents),
           |m AS (SELECT host, sum(ntok)::DOUBLE / count(*) AS mean_tokens
           |      FROM d GROUP BY host)
           |SELECT d.doc_id, d.host,
           |       round(m.mean_tokens, 6) AS domain_mean_tokens
           |FROM d JOIN m USING (host)
           |WHERE m.mean_tokens >= 50.0
           |ORDER BY d.doc_id""".stripMargin,

      "corpus_release_diff" ->
        """WITH old AS (
          |  SELECT doc_id,
          |         CASE WHEN doc_id % 7 = 1 THEN substr(text, 1, 20)
          |              ELSE text END AS text
          |  FROM documents WHERE doc_id % 3 <> 0),
          |d AS (SELECT o.doc_id AS ok, n.doc_id AS nk,
          |             o.text AS ot, n.text AS nt
          |      FROM old o FULL OUTER JOIN documents n ON o.doc_id = n.doc_id)
          |SELECT action, count(*) AS n FROM (
          |  SELECT CASE WHEN ok IS NULL THEN 'I'
          |              WHEN nk IS NULL THEN 'D'
          |              WHEN ot IS DISTINCT FROM nt THEN 'U' END AS action
          |  FROM d)
          |WHERE action IS NOT NULL GROUP BY action ORDER BY action""".stripMargin,

      "corpus_manifest" ->
        s"""SELECT count(*) AS n_docs,
           |       CAST(sum(len($toks)) AS BIGINT) AS sum_tokens,
           |       bit_xor(${TextOpsSql.wideFingerprint("text")}) AS content_fp
           |FROM documents""".stripMargin,

      "ann_hard_negatives" ->
        s"""SELECT query_id, neighbor_id, round(cos, 6) AS cosine FROM (
           |  SELECT query_id, neighbor_id, cos,
           |         row_number() OVER (PARTITION BY query_id
           |                            ORDER BY cos DESC, neighbor_id) AS rn
           |  FROM (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |               ${VectorOpsSql.cosine("q.embedding", "c.embedding")} AS cos
           |        FROM embeddings q
           |        JOIN embeddings c ON c.vec_id <> q.vec_id
           |                         AND c.label <> q.label
           |        WHERE q.vec_id < 8))
           |WHERE rn <= 3 ORDER BY query_id, neighbor_id""".stripMargin,

      // hand-derived: n_a = n_b = 8, vocab {a,b,c}, Σ|Δppm| = 1000000
      "drift_pinned" ->
        """SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
          |       CAST(vocab AS BIGINT) AS vocab,
          |       CAST(tvd_ppm AS BIGINT) AS tvd_ppm
          |FROM (VALUES (8, 8, 3, 500000)) t(n_a, n_b, vocab, tvd_ppm)""".stripMargin,

      // hand-derived admissions (traced in SelectionSpec as well): ids
      // 1, 2 (bucket .9 = 300 tokens), 3 (bucket .8 = 400), 4 (250 of the
      // .5 bucket's 250-token remainder); 5 and 6 excluded
      "selection_pinned" ->
        """SELECT CAST(id AS BIGINT) AS id, CAST(n_tokens AS BIGINT) AS n_tokens
          |FROM (VALUES (1, 100), (2, 200), (3, 400), (4, 250))
          |  t(id, n_tokens)
          |ORDER BY id""".stripMargin,

      "corpus_drift" -> DriftSql.summary(
        s"(SELECT text FROM documents WHERE ${SamplingSql.hash16("doc_id", 13)} < 32768) sa",
        s"(SELECT text FROM documents WHERE ${SamplingSql.hash16("doc_id", 13)} >= 32768) sb"),

      "drift_top_tokens" -> (DriftSql.topDrift(
        s"(SELECT text FROM documents WHERE ${SamplingSql.hash16("doc_id", 13)} < 32768) sa",
        s"(SELECT text FROM documents WHERE ${SamplingSql.hash16("doc_id", 13)} >= 32768) sb",
        15) + "\n-- ordered in topDrift"),

      // hand-derived (tools-free: small enough to verify on paper): seeds
      // (0,0),(1,0) both in blob A; round 1 pulls c1 to the far blob's
      // mean (8, 7.75), round 2 separates the blobs exactly — c0 = mean of
      // (0,0),(1,0), c1 = mean of the three far points, micro-quantized
      "kmeans_pinned" ->
        """SELECT CAST(cluster AS BIGINT) AS cluster, CAST(pos AS BIGINT) AS pos,
          |       CAST(centroid AS DOUBLE) AS centroid
          |FROM (VALUES
          |  (0, 0, 0.5), (0, 1, 0.0),
          |  (1, 0, 10.333333), (1, 1, 10.333333)
          |) t(cluster, pos, centroid) ORDER BY cluster, pos""".stripMargin,

      // d(0,1) = d(0,2) = 128, d(0,3) = 256 exactly (integer-valued
      // floats; the exact codebooks make ADC the true distance), in
      // 2^20 micro-units
      "pq_pinned" ->
        """SELECT CAST(query_id AS BIGINT) AS query_id,
          |       CAST(neighbor_id AS BIGINT) AS neighbor_id,
          |       CAST(adc_q AS BIGINT) AS adc_q
          |FROM (VALUES
          |  (0, 1, 134217728), (0, 2, 134217728), (0, 3, 268435456)
          |) t(query_id, neighbor_id, adc_q) ORDER BY neighbor_id""".stripMargin,

      "ann_ivf_trained" -> operators.KMeansSql.ivfTopK(
        "embeddings", "vec_id", "embedding", k = 4, iters = 2,
        nprobe = 2, topK = 5, queryPred = "vec_id < 8"),

      "ann_pq_adc" -> operators.PqSql.adcTopK(
        "embeddings", "vec_id", "embedding", dim = 64, m = 4, ksub = 8,
        iters = 2, topK = 5, queryPred = "vec_id < 4"),

      // the zero-alternation OPQ arm routes every vector through the
      // rotation product with R = I and must land on plain PQ's rows —
      // the oracle IS the PQ rescan (ann_opq_recall, whose rotation is
      // data-derived through an iterative SVD, stays rows-only)
      "ann_opq_roundtrip" -> operators.PqSql.adcTopK(
        "embeddings", "vec_id", "embedding", dim = 64, m = 4, ksub = 8,
        iters = 2, topK = 5, queryPred = "vec_id < 4"),

      "ann_ivfpq_adc" -> operators.IvfPqSql.topK(
        "embeddings", "vec_id", "embedding", dim = 64, nCells = 4, m = 4,
        ksub = 8, iters = 2, nprobe = 2, topK = 5, queryPred = "vec_id < 4"),

      // the persisted-index lifecycle (write even ids → append odd ids →
      // probe) must reproduce the full-corpus rescan bit-for-bit — the
      // quantizers train on the full corpus (the FAISS train/add split)
      // and appended codes use them FIXED, so the oracle IS the rescan SQL
      "ann_ivfpq_indexed" -> operators.IvfPqSql.topK(
        "embeddings", "vec_id", "embedding", dim = 64, nCells = 4, m = 4,
        ksub = 8, iters = 2, nprobe = 2, topK = 5, queryPred = "vec_id < 4"),

      // the identity-rotation OPQ,IVF,PQ lifecycle must land on the
      // un-rotated index's rows — the oracle IS the same rescan SQL
      "ann_opq_ivfpq_indexed" -> operators.IvfPqSql.topK(
        "embeddings", "vec_id", "embedding", dim = 64, nCells = 4, m = 4,
        ksub = 8, iters = 2, nprobe = 2, topK = 5, queryPred = "vec_id < 4"),

      // the SEEDED-rotation recall gauges: the rotation matrix renders
      // into the SQL as literals (Opq.seededRotation is pinned
      // bit-for-bit against tools/opq_reference.py in OpqSpec, and
      // Double.toString→DuckDB parse round-trips), the correlated corpus
      // and the rotated corpus are staged CTEs, and both approx arms are
      // the house PQ rescan SQL over those staged tables — exact arm on
      // the UN-rotated corpus, as in the Spark query
      "ann_opq_recall" -> opqRecallOracle(
        opqArm = operators.PqSql.adcTopK(
          "rotc", "vec_id", "embedding", dim = 64, m = 4, ksub = 8,
          iters = 2, topK = 10, queryPred = "vec_id < 32"),
        pqArm = operators.PqSql.adcTopK(
          "corr", "vec_id", "embedding", dim = 64, m = 4, ksub = 8,
          iters = 2, topK = 10, queryPred = "vec_id < 32")),

      // same staging at full composition depth: the at-rest rotated
      // index must equal the rotated-corpus rescan (quantizers train on
      // the full corpus), so the opq arm IS IvfPqSql over the rotated CTE
      "ann_opq_ivfpq_recall" -> opqRecallOracle(
        opqArm = operators.IvfPqSql.topK(
          "rotc", "vec_id", "embedding", dim = 64, nCells = 4, m = 4,
          ksub = 8, iters = 2, nprobe = 2, topK = 10,
          queryPred = "vec_id < 32"),
        pqArm = operators.IvfPqSql.topK(
          "corr", "vec_id", "embedding", dim = 64, nCells = 4, m = 4,
          ksub = 8, iters = 2, nprobe = 2, topK = 10,
          queryPred = "vec_id < 32")),

      "ann_pq_recall" -> {
        val pq = operators.PqSql.adcTopK(
          "embeddings", "vec_id", "embedding", dim = 64, m = 4, ksub = 8,
          iters = 2, topK = 5, queryPred = "vec_id < 8")
        val dist = operators.KMeansSql.distSql(
          "list_transform(q.embedding, x -> x::DOUBLE)",
          "list_transform(c.embedding, x -> x::DOUBLE)")
        s"""WITH exact AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |           row_number() OVER (PARTITION BY q.vec_id
           |                              ORDER BY $dist, c.vec_id) AS rn
           |    FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
           |    WHERE q.vec_id < 8)
           |  WHERE rn <= 5),
           |approx AS ($pq)
           |SELECT e.query_id,
           |       CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL
           |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           |       round(sum(CASE WHEN a.neighbor_id IS NOT NULL
           |                      THEN 1 ELSE 0 END)::DOUBLE
           |             / count(*)::DOUBLE, 6) AS recall
           |FROM exact e
           |LEFT JOIN approx a USING (query_id, neighbor_id)
           |GROUP BY e.query_id ORDER BY query_id""".stripMargin
      },

      // the composed-arm gauge: same exact-L2 reference, approx arm = the
      // full IVF-PQ chain (coarse cells + residual codes + nprobe)
      "ann_ivfpq_recall" -> {
        val ivfpq = operators.IvfPqSql.topK(
          "embeddings", "vec_id", "embedding", dim = 64, nCells = 4, m = 4,
          ksub = 8, iters = 2, nprobe = 2, topK = 5, queryPred = "vec_id < 8")
        val dist = operators.KMeansSql.distSql(
          "list_transform(q.embedding, x -> x::DOUBLE)",
          "list_transform(c.embedding, x -> x::DOUBLE)")
        s"""WITH exact AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |           row_number() OVER (PARTITION BY q.vec_id
           |                              ORDER BY $dist, c.vec_id) AS rn
           |    FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
           |    WHERE q.vec_id < 8)
           |  WHERE rn <= 5),
           |approx AS ($ivfpq)
           |SELECT e.query_id,
           |       CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL
           |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           |       round(sum(CASE WHEN a.neighbor_id IS NOT NULL
           |                      THEN 1 ELSE 0 END)::DOUBLE
           |             / count(*)::DOUBLE, 6) AS recall
           |FROM exact e
           |LEFT JOIN approx a USING (query_id, neighbor_id)
           |GROUP BY e.query_id ORDER BY query_id""".stripMargin
      },

      // the refine stage restated independently: the same IVF-PQ rescan
      // overfetches k'=20, the rescore is the exact sequential-fold L2 in
      // integer micro-units, and the top-5 is a plain window (the oracle
      // may window; the Spark plan must not)
      "ann_ivfpq_refine" -> {
        val short = operators.IvfPqSql.topK(
          "embeddings", "vec_id", "embedding", dim = 64, nCells = 4, m = 4,
          ksub = 8, iters = 2, nprobe = 2, topK = 20, queryPred = "vec_id < 4")
        val dist = operators.KMeansSql.distSql(
          "list_transform(q.embedding, x -> x::DOUBLE)",
          "list_transform(c.embedding, x -> x::DOUBLE)")
        s"""WITH short AS ($short),
           |scored AS (
           |  SELECT s.query_id, s.neighbor_id,
           |         CAST(floor($dist * 1048576.0) AS BIGINT) AS d_micro
           |  FROM short s
           |  JOIN embeddings c ON c.vec_id = s.neighbor_id
           |  JOIN embeddings q ON q.vec_id = s.query_id)
           |SELECT query_id, neighbor_id, d_micro FROM (
           |  SELECT *, row_number() OVER (PARTITION BY query_id
           |              ORDER BY d_micro, neighbor_id) AS rn
           |  FROM scored)
           |WHERE rn <= 5
           |ORDER BY query_id, d_micro, neighbor_id""".stripMargin
      },

      // both gauge arms AND the ground truth restated: refine = the
      // k'=20 rescan rescored exactly, plain = the k=5 rescan, exact =
      // the brute-force window — the whole gauge is oracle-checked, not
      // rows-only
      "ann_refine_recall" -> {
        val short = operators.IvfPqSql.topK(
          "embeddings", "vec_id", "embedding", dim = 64, nCells = 4, m = 4,
          ksub = 8, iters = 2, nprobe = 2, topK = 20, queryPred = "vec_id < 8")
        val plain = operators.IvfPqSql.topK(
          "embeddings", "vec_id", "embedding", dim = 64, nCells = 4, m = 4,
          ksub = 8, iters = 2, nprobe = 2, topK = 5, queryPred = "vec_id < 8")
        val rescore = operators.KMeansSql.distSql(
          "list_transform(q.embedding, x -> x::DOUBLE)",
          "list_transform(c.embedding, x -> x::DOUBLE)")
        val exactDist = operators.KMeansSql.distSql(
          "list_transform(q.embedding, x -> x::DOUBLE)",
          "list_transform(c.embedding, x -> x::DOUBLE)")
        s"""WITH short AS ($short),
           |refined AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT s.query_id, s.neighbor_id,
           |           CAST(floor($rescore * 1048576.0) AS BIGINT) AS d_micro,
           |           row_number() OVER (PARTITION BY s.query_id
           |             ORDER BY CAST(floor($rescore * 1048576.0) AS BIGINT),
           |                      s.neighbor_id) AS rn
           |    FROM short s
           |    JOIN embeddings c ON c.vec_id = s.neighbor_id
           |    JOIN embeddings q ON q.vec_id = s.query_id)
           |  WHERE rn <= 5),
           |plain AS ($plain),
           |exact AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |           row_number() OVER (PARTITION BY q.vec_id
           |                              ORDER BY $exactDist, c.vec_id) AS rn
           |    FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
           |    WHERE q.vec_id < 8)
           |  WHERE rn <= 5)
           |SELECT e.query_id,
           |       CAST(sum(CASE WHEN r.neighbor_id IS NOT NULL
           |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_hit_refine,
           |       round(sum(CASE WHEN r.neighbor_id IS NOT NULL
           |                      THEN 1 ELSE 0 END)::DOUBLE
           |             / count(*)::DOUBLE, 6) AS recall_refine,
           |       CAST(sum(CASE WHEN p.neighbor_id IS NOT NULL
           |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_hit_pq,
           |       round(sum(CASE WHEN p.neighbor_id IS NOT NULL
           |                      THEN 1 ELSE 0 END)::DOUBLE
           |             / count(*)::DOUBLE, 6) AS recall_pq
           |FROM exact e
           |LEFT JOIN refined r USING (query_id, neighbor_id)
           |LEFT JOIN plain p USING (query_id, neighbor_id)
           |GROUP BY e.query_id ORDER BY query_id""".stripMargin
      },

      "dedup_semantic_trained" -> operators.KMeansSql.semDedup(
        "embeddings", "vec_id", "embedding", k = 4, iters = 2,
        minCosine = 0.2),

      "ann_recall" -> {
        def ivf(np: Int) = operators.KMeansSql.ivfTopK(
          "embeddings", "vec_id", "embedding", k = 4, iters = 2,
          nprobe = np, topK = 5, queryPred = "vec_id < 8")
        s"""SELECT e.query_id,
           |       CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL
           |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           |       round(sum(CASE WHEN a.neighbor_id IS NOT NULL
           |                      THEN 1 ELSE 0 END)::DOUBLE
           |             / count(*)::DOUBLE, 6) AS recall
           |FROM (${ivf(4)}) e
           |LEFT JOIN (${ivf(2)}) a USING (query_id, neighbor_id)
           |GROUP BY e.query_id ORDER BY query_id""".stripMargin
      },

      "kmeans_assign" -> operators.KMeansSql.assignment(
        "embeddings", "vec_id", "embedding", k = 4, iters = 2),

      // the plain ONE-stage aggregate — the salted two-stage plan must
      // recompose to exactly this
      "salted_agg" ->
        s"""SELECT event_type, count(*) AS n_events,
           |       CAST(sum(CAST(floor(value * 1e6) AS BIGINT)) AS BIGINT)
           |         AS sum_value_micro,
           |       max(CAST(floor(value * 1e6) AS BIGINT)) AS max_value_micro
           |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

      // the plain unsalted join — the salted replicated join must match
      "salted_join" ->
        s"""WITH dim AS (SELECT lang, count(*) AS n_lang_docs,
           |                    CAST(sum(n_chars) AS BIGINT) AS lang_chars
           |             FROM documents GROUP BY lang)
           |SELECT d.doc_id, d.lang, dim.n_lang_docs, dim.lang_chars
           |FROM documents d JOIN dim USING (lang)
           |ORDER BY d.doc_id""".stripMargin,

      "partitioned_scan" ->
        s"""SELECT source, count(*) AS n_docs,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
           |FROM documents WHERE lang = 'en'
           |GROUP BY source ORDER BY source""".stripMargin,

      // independent formulation: dedup winner by TEXT partition (not the
      // digest the Spark plan shuffles on)
      "pipeline_attrition" -> {
        val score = QualityOpsSql.qualityScore("text", "tk")
        val lang = TextOpsSql.langId("tk")
        s"""WITH d AS (SELECT doc_id, text,
           |             ${TextOpsSql.tokens("text")} AS tk FROM documents),
           |g AS (SELECT doc_id, text, ($lang = 'en') AS s_lang,
           |        (($lang = 'en') AND $score >= CAST(0.5 AS DOUBLE))
           |          AS s_qual
           |      FROM d),
           |w AS (SELECT text, min(doc_id) AS w FROM g WHERE s_qual
           |      GROUP BY text)
           |SELECT * FROM (
           |  SELECT CAST(1 AS BIGINT) AS stage, 'all' AS gate,
           |         (SELECT count(*) FROM g) AS n_surviving
           |  UNION ALL SELECT 2, 'lang_en',
           |         (SELECT count(*) FROM g WHERE s_lang)
           |  UNION ALL SELECT 3, 'quality',
           |         (SELECT count(*) FROM g WHERE s_qual)
           |  UNION ALL SELECT 4, 'dedup',
           |         (SELECT count(*) FROM g JOIN w
           |          ON g.text = w.text AND g.doc_id = w.w WHERE s_qual))
           |ORDER BY stage""".stripMargin
      },

      "pipeline_e2e" -> {
        val score = QualityOpsSql.qualityScore("text", "tk")
        val split = SamplingSql.splitCase("doc_id",
          Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05), seed = 3)
        s"""WITH d AS (SELECT doc_id, text, $toks AS tk FROM documents),
           |f AS (SELECT doc_id, text, tk FROM d
           |      WHERE ${TextOpsSql.langId("tk")} = 'en'
           |        AND $score >= CAST(0.5 AS DOUBLE)),
           |k AS (SELECT doc_id, tk FROM (
           |        SELECT doc_id, tk,
           |               row_number() OVER (PARTITION BY text
           |                                  ORDER BY doc_id) AS rn
           |        FROM f) WHERE rn = 1),
           |s AS (SELECT $split AS split, CAST(len(tk) AS BIGINT) AS n_toks
           |      FROM k)
           |SELECT split, count(*) AS n_docs,
           |       CAST(sum(n_toks) AS BIGINT) AS sum_tokens
           |FROM s GROUP BY split ORDER BY split""".stripMargin
      },

      // INTENT-pinned oracle: literal expected VALUES, hand-derived from the
      // corpus — NOT rendered from the same regexes as the Spark side (a
      // dual-rendered oracle can only confirm engine-equivalence; round 7's
      // PhoneRe bug sailed through exactly that way)
      "mixing_pinned" ->
        """SELECT stratum, CAST(threshold AS BIGINT) AS threshold
          |FROM (VALUES
          |  ('books', 49152), ('code', 65536), ('web', 16384)
          |) t(stratum, threshold) ORDER BY stratum""".stripMargin,

      // hand-labelled: en 5/10 stopwords, es 5/9, de 5/9, no stopwords →
      // unk, empty → unk, mixed majority (en 4/6 vs la/der 1/6 each) → en
      "langid_pinned" ->
        """SELECT CAST(case_id AS BIGINT) AS case_id, lang_pred
          |FROM (VALUES
          |  (1, 'en'), (2, 'es'), (3, 'de'), (4, 'unk'), (5, 'unk'),
          |  (6, 'en')
          |) t(case_id, lang_pred) ORDER BY case_id""".stripMargin,

      // hand-derived: 1 = all gates pass; 2 = token window (.35) + no
      // stopwords (.15); 3 = no stopwords; 4 = dup-token fraction; 5 =
      // token window + mean-len window + no stopwords
      "quality_pinned" ->
        """SELECT CAST(case_id AS BIGINT) AS case_id,
          |       CAST(score AS DOUBLE) AS score
          |FROM (VALUES
          |  (1, 1.0), (2, 0.5), (3, 0.85), (4, 0.8), (5, 0.35)
          |) t(case_id, score) ORDER BY case_id""".stripMargin,

      // hand-derived: cos(3-4, 4-3) = 24/25; orthogonal = 0; diagonal =
      // 1/sqrt(2); parallel = 1; zero-norm guard = 0. norms: 5, 1,
      // sqrt(2), 2, 0
      "vector_pinned" ->
        """SELECT CAST(case_id AS BIGINT) AS case_id,
          |       CAST(cos AS DOUBLE) AS cos, CAST(norm_a AS DOUBLE) AS norm_a
          |FROM (VALUES
          |  (1, 0.96, 5.0), (2, 0.0, 1.0), (3, 0.707107, 1.414214),
          |  (4, 1.0, 2.0), (5, 0.0, 0.0)
          |) t(case_id, cos, norm_a) ORDER BY case_id""".stripMargin,

      "pii_scrub" ->
        """SELECT case_id, CAST(n_email AS BIGINT) AS n_email,
          |       CAST(n_ip AS BIGINT) AS n_ip,
          |       CAST(n_phone AS BIGINT) AS n_phone, redacted
          |FROM (VALUES
          |  (1, 1, 0, 1, 'contact me at <EMAIL> or call <PHONE>'),
          |  (2, 1, 1, 0, 'server at <IP> logged <EMAIL> twice'),
          |  (3, 0, 0, 0, 'no pii here, just 1234 numbers and a dot. end'),
          |  (4, 1, 1, 1, '<PHONE> and <IP> and <EMAIL>'),
          |  (5, 0, 0, 0, '')
          |) t(case_id, n_email, n_ip, n_phone, redacted)
          |ORDER BY case_id""".stripMargin,

      // LITERAL compressed lengths from the independent CPython zlib
      // (tools/zlib_reference.py — regenerate there); the ratio is
      // re-derived IN SQL from those literals, so rounding is the
      // engine's, not Python's
      "quality_compression" ->
        """SELECT case_id, CAST(n_bytes AS BIGINT) AS n_bytes,
          |       CAST(z_bytes AS BIGINT) AS z_bytes,
          |       round(CASE WHEN n_bytes > 0
          |                  THEN z_bytes::DOUBLE / n_bytes END, 6) AS ratio
          |FROM (VALUES
          |  (1, 200, 12), (2, 450, 57), (3, 32, 40), (4, 0, 8),
          |  (5, 248, 44), (6, 1, 9), (7, 1050, 55)
          |) t(case_id, n_bytes, z_bytes) ORDER BY case_id""".stripMargin,

      "retrieval_metrics" -> {
        val ranked = Seq("spark", "hash", "merge").map { q =>
          s"""SELECT '$q' AS query, doc_id AS id,
             |       row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
             |FROM (${RelevanceSql.bm25TopK("documents", "doc_id", "text",
                        Seq(q), topK = 10)})""".stripMargin
        }.mkString("\nUNION ALL\n")
        val toks = TextOpsSql.tokens("text")
        val labels =
          s"""SELECT tok AS query, doc_id AS id, least(count(*), 3) AS grade
             |FROM (SELECT doc_id, unnest($toks) AS tok FROM documents)
             |WHERE tok IN ('spark', 'hash', 'merge')
             |GROUP BY tok, doc_id""".stripMargin
        RelevanceSql.retrievalMetrics(ranked, labels, k = 10) +
          "\nORDER BY query"
      },

      "train_fim" ->
        (s"SELECT 'psm' AS mode, * FROM (${FimSql.transform("documents",
            "doc_id", "text", ratePct = 40)})\n" +
          "UNION ALL\n" +
          s"SELECT 'spm' AS mode, * FROM (${FimSql.transform("documents",
            "doc_id", "text", ratePct = 40, spm = true)})\n" +
          "ORDER BY mode, id"),

      "contamination_check" ->
        (ContaminationSql.check("doc_id", "text", evalRate = 0.05, seed = 11,
          k = 3) + "\nORDER BY doc_id"),

      "contamination_multi" ->
        (ContaminationSql.checkMulti("doc_id", "text", nSets = 3,
          evalRate = 0.05, seed = 11, k = 3) + "\nORDER BY doc_id, eval_set"),

      "contamination_fuzzy" -> {
        val toks = TextOpsSql.tokens("text")
        val r = math.round(0.05 * operators.Sampling.Buckets)
        (ContaminationSql.fuzzy("doc_id", "text",
          trainFrom = s"""(SELECT doc_id + 10000000 AS doc_id,
             |             CASE WHEN len($toks) > 5
             |                  THEN array_to_string(($toks)[6:], ' ')
             |                  ELSE text END AS text
             |             FROM documents) tsrc""".stripMargin,
          evalFrom = "(SELECT doc_id, text FROM documents WHERE " +
            s"${operators.SamplingSql.hash16("doc_id", 7)} < $r) esrc",
          minJaccard = 0.5) + "\nORDER BY doc_id, eval_id")
      },

      "text_winnow" -> {
        val thash = TextOpsSql.tokenHashes("toks")
        val shingles = TextOpsSql.shingleHashes("thash")
        s"""WITH tok AS (SELECT doc_id, $toks AS toks FROM documents
           |             WHERE doc_id < 100),
           |th AS (SELECT doc_id, $thash AS thash FROM tok),
           |sh AS (SELECT doc_id, $shingles AS sh FROM th),
           |w AS (SELECT doc_id, unnest(${TextOpsSql.winnow("sh", 4)}) AS k
           |      FROM sh)
           |SELECT doc_id, CAST(${TextOpsSql.winnowPos("k")} AS BIGINT) AS pos,
           |       CAST(${TextOpsSql.winnowFp("k")} AS BIGINT) AS fp
           |FROM w ORDER BY doc_id, pos, fp""".stripMargin
      },

      "contamination_winnow" -> {
        val thash = TextOpsSql.tokenHashes("toks")
        val shingles = TextOpsSql.shingleHashes("thash")
        val r = math.round(0.05 * operators.Sampling.Buckets)
        def fps(src: String, id: String) =
          s"""(SELECT DISTINCT $id, ${TextOpsSql.winnowFp("k")} AS fp FROM (
             |   SELECT $id, unnest(${TextOpsSql.winnow("sh", 4)}) AS k
             |   FROM (SELECT $id, $shingles AS sh
             |         FROM (SELECT $id, $thash AS thash
             |               FROM (SELECT $id, $toks AS toks FROM $src)))))""".stripMargin
        s"""WITH mut AS (
           |  SELECT doc_id + 10000000 AS doc_id,
           |         CASE WHEN len($toks) > 5
           |              THEN array_to_string(($toks)[6:], ' ')
           |              ELSE text END AS text
           |    FROM documents),
           |ev AS (SELECT doc_id AS eval_id, text FROM documents
           |       WHERE ${operators.SamplingSql.hash16("doc_id", 7)} < $r),
           |tf AS ${fps("mut", "doc_id")},
           |ef AS ${fps("ev", "eval_id")}
           |SELECT doc_id, eval_id, CAST(count(*) AS BIGINT) AS n_shared
           |FROM tf JOIN ef ON tf.fp = ef.fp
           |GROUP BY doc_id, eval_id HAVING count(*) >= 2
           |ORDER BY doc_id, eval_id""".stripMargin
      },

      // the at-rest probe must yield IDENTICAL rows to the in-session
      // match — one restatement serves both
      "contamination_winnow_indexed" -> {
        val thash = TextOpsSql.tokenHashes("toks")
        val shingles = TextOpsSql.shingleHashes("thash")
        val r = math.round(0.05 * operators.Sampling.Buckets)
        def fps(src: String, id: String) =
          s"""(SELECT DISTINCT $id, ${TextOpsSql.winnowFp("k")} AS fp FROM (
             |   SELECT $id, unnest(${TextOpsSql.winnow("sh", 4)}) AS k
             |   FROM (SELECT $id, $shingles AS sh
             |         FROM (SELECT $id, $thash AS thash
             |               FROM (SELECT $id, $toks AS toks FROM $src)))))""".stripMargin
        s"""WITH mut AS (
           |  SELECT doc_id + 10000000 AS doc_id,
           |         CASE WHEN len($toks) > 5
           |              THEN array_to_string(($toks)[6:], ' ')
           |              ELSE text END AS text
           |    FROM documents),
           |ev AS (SELECT doc_id AS eval_id, text FROM documents
           |       WHERE ${operators.SamplingSql.hash16("doc_id", 7)} < $r),
           |tf AS ${fps("mut", "doc_id")},
           |ef AS ${fps("ev", "eval_id")}
           |SELECT doc_id, eval_id, CAST(count(*) AS BIGINT) AS n_shared
           |FROM tf JOIN ef ON tf.fp = ef.fp
           |GROUP BY doc_id, eval_id HAVING count(*) >= 2
           |ORDER BY doc_id, eval_id""".stripMargin
      },

      "retract_winnow" -> {
        val thash = TextOpsSql.tokenHashes("toks")
        val shingles = TextOpsSql.shingleHashes("thash")
        val r = math.round(0.05 * operators.Sampling.Buckets)
        def fps(src: String, id: String) =
          s"""(SELECT DISTINCT $id, ${TextOpsSql.winnowFp("k")} AS fp FROM (
             |   SELECT $id, unnest(${TextOpsSql.winnow("sh", 4)}) AS k
             |   FROM (SELECT $id, $shingles AS sh
             |         FROM (SELECT $id, $thash AS thash
             |               FROM (SELECT $id, $toks AS toks FROM $src)))))""".stripMargin
        s"""WITH mut AS (
           |  SELECT doc_id + 10000000 AS doc_id,
           |         CASE WHEN len($toks) > 5
           |              THEN array_to_string(($toks)[6:], ' ')
           |              ELSE text END AS text
           |    FROM documents WHERE doc_id % 17 <> 0),
           |ev AS (SELECT doc_id AS eval_id, text FROM documents
           |       WHERE ${operators.SamplingSql.hash16("doc_id", 7)} < $r),
           |tf AS ${fps("mut", "doc_id")},
           |ef AS ${fps("ev", "eval_id")},
           |m AS (SELECT doc_id, eval_id, CAST(count(*) AS BIGINT) AS n_shared
           |      FROM tf JOIN ef ON tf.fp = ef.fp
           |      GROUP BY doc_id, eval_id HAVING count(*) >= 2)
           |SELECT phase, doc_id, eval_id, n_shared FROM (
           |  SELECT 'masked' AS phase, * FROM m
           |  UNION ALL SELECT 'purged' AS phase, * FROM m)
           |ORDER BY phase, doc_id, eval_id""".stripMargin
      },

      "stream_winnow_gate" -> {
        val thash = TextOpsSql.tokenHashes("toks")
        val shingles = TextOpsSql.shingleHashes("thash")
        val r = math.round(0.05 * operators.Sampling.Buckets)
        def fps(src: String, id: String) =
          s"""(SELECT DISTINCT $id, ${TextOpsSql.winnowFp("k")} AS fp FROM (
             |   SELECT $id, unnest(${TextOpsSql.winnow("sh", 4)}) AS k
             |   FROM (SELECT $id, $shingles AS sh
             |         FROM (SELECT $id, $thash AS thash
             |               FROM (SELECT $id, $toks AS toks FROM $src)))))""".stripMargin
        s"""WITH mut AS (
           |  SELECT doc_id + 10000000 AS doc_id,
           |         CASE WHEN len($toks) > 5
           |              THEN array_to_string(($toks)[6:], ' ')
           |              ELSE text END AS text
           |    FROM documents),
           |ev AS (SELECT doc_id AS eval_id, text FROM documents
           |       WHERE ${operators.SamplingSql.hash16("doc_id", 7)} < $r),
           |tf AS ${fps("mut", "doc_id")},
           |ef AS ${fps("ev", "eval_id")},
           |bench AS (SELECT DISTINCT fp FROM ef),
           |dropped AS (SELECT doc_id FROM tf JOIN bench USING (fp)
           |            GROUP BY doc_id HAVING count(*) >= 2)
           |SELECT doc_id FROM mut
           |WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
           |ORDER BY doc_id""".stripMargin
      },

      "text_mojibake" ->
        s"""WITH injected AS (
           |  SELECT doc_id, text ||
           |    CASE doc_id % 4 WHEN 0 THEN ' donâ€™t stop'
           |                    WHEN 1 THEN ' cafÃ© olÃ©'
           |                    WHEN 2 THEN ' naÃ¯ve Ã¼ber'
           |                    ELSE '' END AS text
           |  FROM documents)
           |SELECT doc_id,
           |       ${functions.QualityOpsSql.mojibakeScore("text")} AS n_bad,
           |       text_repaired AS repaired,
           |       text_repaired <> text AS changed
           |FROM (SELECT doc_id, text,
           |        CASE doc_id % 4
           |          WHEN 0 THEN replace(text, ' donâ€™t stop',
           |                              ' don’t stop')
           |          WHEN 1 THEN replace(text, ' cafÃ© olÃ©', ' café olé')
           |          WHEN 2 THEN replace(text, ' naÃ¯ve Ã¼ber',
           |                              ' naïve über')
           |          ELSE text END AS text_repaired
           |      FROM injected) v
           |ORDER BY doc_id""".stripMargin,

      "text_mojibake_lines" ->
        s"""WITH injected AS (
           |  SELECT doc_id,
           |    'rÃ©sumÃ© artifacts lead' || chr(10) || text || chr(10) ||
           |    'genuine café line' ||
           |    CASE WHEN doc_id % 2 = 0
           |         THEN chr(10) || 'tail donâ€™t stop' ELSE '' END AS text,
           |    'résumé artifacts lead' || chr(10) || text || chr(10) ||
           |    'genuine café line' ||
           |    CASE WHEN doc_id % 2 = 0
           |         THEN chr(10) || 'tail don’t stop' ELSE '' END AS fixed
           |  FROM documents)
           |SELECT doc_id, FALSE AS changed_whole, fixed AS by_line
           |FROM injected ORDER BY doc_id""".stripMargin,

      // ---- at-rest retraction: both phases equal the filtered rebuild
      "retract_digest_index" ->
        s"""WITH f AS (SELECT sha256(text) AS kh, doc_id AS id
           |           FROM documents WHERE doc_id % 7 <> 0)
           |SELECT phase, kh, id FROM (
           |  SELECT 'masked' AS phase, kh, id FROM f
           |  UNION ALL SELECT 'purged' AS phase, kh, id FROM f)
           |ORDER BY phase, kh, id""".stripMargin,

      "retract_component_index" ->
        s"""WITH $ExactDupCorpusSql,
           |surv AS (SELECT doc_id, text FROM corpus WHERE doc_id % 4 <> 0),
           |g AS (SELECT text, min(doc_id) AS component
           |      FROM surv GROUP BY text)
           |SELECT s.doc_id, g.component
           |FROM surv s JOIN g USING (text)
           |ORDER BY s.doc_id""".stripMargin,

      "retract_postings_probe" -> {
        val m = operators.RelevanceSql.bm25TopK(
          "(SELECT doc_id, text FROM documents WHERE doc_id % 31 <> 0)",
          "doc_id", "text", Seq("spark", "hash", "merge"))
        s"""WITH m AS ($m)
           |SELECT phase, doc_id, bm25 FROM (
           |  SELECT 'masked' AS phase, doc_id, bm25 FROM m
           |  UNION ALL SELECT 'purged' AS phase, doc_id, bm25 FROM m)
           |ORDER BY phase, doc_id""".stripMargin
      },

      "retract_edge_probe" ->
        s"""WITH raw AS (
           |  $DocGraphRawSql),
           |f AS (SELECT DISTINCT src, dst FROM raw
           |      WHERE src NOT IN (50, 100, 150)
           |        AND dst NOT IN (50, 100, 150))
           |SELECT src AS node,
           |       CAST(count(DISTINCT dst) AS BIGINT) AS out_degree
           |FROM f GROUP BY src ORDER BY node""".stripMargin,

      "retract_fetch_state" -> {
        val base = condFetchOracleSqlWhere("doc_id % 4 <> 0")
        s"""WITH m AS ($base)
           |SELECT phase, url, if_none_match, if_modified_since,
           |       conditional
           |FROM (SELECT 'masked' AS phase, * FROM m
           |      UNION ALL SELECT 'purged' AS phase, * FROM m)
           |ORDER BY phase, url""".stripMargin
      },

      "retract_cdx_host" ->
        s"""WITH caps AS (
           |  SELECT 'com,h' || CAST(doc_id % 13 AS VARCHAR) || ')/p' ||
           |           CAST(doc_id AS VARCHAR) AS surt,
           |         sha256(text) AS digest, doc_id
           |  FROM documents),
           |f AS (SELECT surt, digest FROM caps WHERE doc_id % 9 <> 0)
           |SELECT phase, surt, digest FROM (
           |  SELECT 'masked' AS phase, surt, digest FROM f
           |  UNION ALL SELECT 'purged' AS phase, surt, digest FROM f)
           |ORDER BY phase, surt""".stripMargin,

      // ---- perceptual hashes + EXIF: restated from construction
      "mm_dhash" ->
        s"""WITH ids AS (SELECT unnest(range(0, 40)) AS id)
           |SELECT CAST(id AS BIGINT) AS id,
           |       CAST(coalesce(list_sum(flatten(
           |         list_transform(range(0, 8), y ->
           |           list_transform(range(0, 8), x ->
           |             CASE WHEN y * 8 + x < 63 AND
           |                  (x * 37 + y * 11 + id * 7) % 256 <
           |                  ((x + 1) * 37 + y * 11 + id * 7) % 256
           |                  THEN (CAST(1 AS BIGINT) << (y * 8 + x))
           |                  ELSE CAST(0 AS BIGINT) END)))), 0) AS BIGINT)
           |         AS dhash,
           |       TRUE AS decode_ok
           |FROM ids ORDER BY id""".stripMargin,

      "mm_phash_dedup" ->
        s"""SELECT CAST(id AS BIGINT) AS id, CAST(cluster AS BIGINT) AS cluster
           |FROM (
           |  SELECT id, id % 4 AS cluster
           |  FROM (SELECT unnest(range(0, 12)) AS id)
           |  UNION ALL
           |  SELECT 100 + k, k FROM (SELECT unnest(range(0, 4)) AS k))
           |ORDER BY id""".stripMargin,

      "mm_exif_meta" ->
        s"""SELECT * FROM (
           |SELECT CAST(id AS BIGINT) AS id, TRUE AS has_exif,
           |       CAST(1 + id % 8 AS INTEGER) AS orientation,
           |       '2024:01:' || lpad(CAST(1 + id % 28 AS VARCHAR), 2, '0')
           |         || ' 10:00:00' AS datetime,
           |       id % 3 = 0 AS gps_present, TRUE AS exif_ok
           |FROM (SELECT unnest(range(0, 30)) AS id)
           |UNION ALL
           |SELECT CAST(100 AS BIGINT), FALSE, CAST(0 AS INTEGER), '',
           |       FALSE, TRUE)
           |ORDER BY id""".stripMargin,

      "mm_exif_strip" ->
        s"""SELECT CAST(id AS BIGINT) AS id, TRUE AS has_exif,
           |       CAST(1 + id % 8 AS INTEGER) AS orientation,
           |       '2024:01:' || lpad(CAST(1 + id % 28 AS VARCHAR), 2, '0')
           |         || ' 10:00:00' AS datetime,
           |       FALSE AS gps_present, TRUE AS exif_ok,
           |       TRUE AS len_preserved
           |FROM (SELECT unnest(range(0, 30)) AS id)
           |ORDER BY id""".stripMargin,

      "quality_gopher_rules" -> {
        val Q = functions.QualityOpsSql
        s"""WITH corpus AS (
           |  SELECT doc_id, text FROM documents
           |  UNION ALL
           |  SELECT * FROM ($GopherArmsSql) arms(doc_id, text)),
           |base AS (SELECT doc_id, text, $toks AS toks FROM corpus),
           |m AS (SELECT doc_id,
           |        CAST(len(toks) AS BIGINT) AS n_words,
           |        ${TextOpsSql.meanTokenLen("toks")} AS ml,
           |        ${Q.symbolWordRatio("text", "toks")} AS sym,
           |        ${Q.bulletLineFrac("text")} AS bul,
           |        ${Q.ellipsisLineFrac("text")} AS ell,
           |        ${Q.alphaWordFrac("toks")} AS alpha,
           |        ${Q.gopherStopHits("toks")} AS stops
           |      FROM base)
           |SELECT doc_id, n_words,
           |       n_words >= 50 AND n_words <= 100000 AS r_words,
           |       ml >= 3.0 AND ml <= 10.0 AS r_mean_len,
           |       sym <= 0.1 AS r_symbols,
           |       bul <= 0.9 AS r_bullets,
           |       ell <= 0.3 AS r_ellipsis,
           |       alpha >= 0.8 AS r_alpha,
           |       stops >= 2 AS r_stops,
           |       (n_words >= 50 AND n_words <= 100000) AND
           |       (ml >= 3.0 AND ml <= 10.0) AND sym <= 0.1 AND
           |       bul <= 0.9 AND ell <= 0.3 AND alpha >= 0.8 AND
           |       stops >= 2 AS pass
           |FROM m ORDER BY doc_id""".stripMargin
      },

      "quality_flesch" -> {
        val syl = functions.QualityOpsSql.syllableCount("toks")
        val sen = functions.QualityOpsSql.sentenceCount("text")
        s"""WITH base AS (
           |  SELECT doc_id, CAST(len($toks) AS BIGINT) AS n_words,
           |         $sen AS n_sentences, $syl AS n_syllables
           |  FROM (SELECT doc_id, text, $toks AS toks FROM documents))
           |SELECT doc_id, n_words, n_sentences, n_syllables,
           |       ${functions.QualityOpsSql.fleschScore("n_words",
                      "n_sentences", "n_syllables")} AS fre
           |FROM base ORDER BY doc_id""".stripMargin
      },

      "pii_luhn" ->
        s"""WITH injected AS (
           |  SELECT doc_id, text ||
           |    CASE WHEN doc_id % 5 = 0
           |         THEN ' card 4532 0151 1283 0366 ok' ELSE '' END ||
           |    CASE WHEN doc_id % 7 = 0
           |         THEN ' pay 4111-1111-1111-1112 now' ELSE '' END ||
           |    CASE WHEN doc_id % 11 = 0
           |         THEN ' amex 371449635398431.' ELSE '' END AS text
           |  FROM documents),
           |cand AS (SELECT doc_id,
           |    unnest(${functions.QualityOpsSql.creditCardCandidates("text")})
           |      AS candidate
           |  FROM injected)
           |SELECT doc_id, candidate,
           |       ${functions.QualityOpsSql.luhnValid("candidate")} AS valid
           |FROM cand ORDER BY doc_id, candidate""".stripMargin,

      "ann_range_search" ->
        s"""SELECT query_id, neighbor_id, round(cos, 6) AS cosine
           |FROM (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |             ${VectorOpsSql.cosine("q.embedding", "c.embedding")} AS cos
           |      FROM embeddings q
           |      JOIN embeddings c ON c.vec_id <> q.vec_id
           |      WHERE q.vec_id < 8)
           |WHERE cos >= 0.35 ORDER BY query_id, neighbor_id""".stripMargin,

      "ann_topk_bruteforce" ->
        s"""SELECT query_id, neighbor_id, round(cos, 6) AS cosine FROM (
           |  SELECT query_id, neighbor_id, cos,
           |         row_number() OVER (PARTITION BY query_id
           |                            ORDER BY cos DESC, neighbor_id) AS rn
           |  FROM (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |               ${VectorOpsSql.cosine("q.embedding", "c.embedding")} AS cos
           |        FROM embeddings q
           |        JOIN embeddings c ON c.vec_id <> q.vec_id
           |        WHERE q.vec_id < 8))
           |WHERE rn <= 5 ORDER BY query_id, neighbor_id""".stripMargin,

      "dedup_embedding_cosine" -> {
        val tables = (0 until 4).map(tbl =>
          s"SELECT id, $tbl AS tbl, ${VectorOpsSql.rpBucket("embedding", 12, tbl)} AS bucket FROM pre")
          .mkString("\n  UNION ALL\n  ")
        s"""WITH pre AS (SELECT vec_id AS id, embedding FROM embeddings),
           |buckets AS (
           |  $tables),
           |cand AS (SELECT DISTINCT l.id AS id_a, r.id AS id_b
           |         FROM buckets l JOIN buckets r
           |           ON l.tbl = r.tbl AND l.bucket = r.bucket AND l.id < r.id),
           |dropped AS (
           |  SELECT DISTINCT id_b FROM cand
           |  JOIN pre a ON id_a = a.id JOIN pre b ON id_b = b.id
           |  WHERE ${VectorOpsSql.cosine("a.embedding", "b.embedding")} >= 0.4)
           |SELECT vec_id, label FROM embeddings
           |WHERE vec_id NOT IN (SELECT id_b FROM dropped)
           |ORDER BY vec_id""".stripMargin
      },

      "ann_ivf_topk" -> ivfTopKSql,
      // the persisted inverted file stores exactly the seeds/assignments
      // the rescan computes — same contract, same SQL
      "ann_ivf_indexed" -> ivfTopKSql,
      "ann_ivfsq8_indexed" -> ivfSq8TopKSql,

      // quantization-loss gauge: both arms restated from their own SQL
      // chains (identical seeds/probes), recall joined on the id pairs
      "ann_ivfsq8_recall" ->
        s"""WITH exact AS ($ivfTopKSql),
           |approx AS ($ivfSq8TopKSql)
           |SELECT e.query_id,
           |       CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL
           |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           |       round(sum(CASE WHEN a.neighbor_id IS NOT NULL
           |                      THEN 1 ELSE 0 END)::DOUBLE
           |             / count(*)::DOUBLE, 6) AS recall
           |FROM exact e
           |LEFT JOIN approx a USING (query_id, neighbor_id)
           |GROUP BY e.query_id ORDER BY query_id""".stripMargin,

      "ann_lsh_pairs" -> {
        val tables = (0 until 4).map(tbl =>
          s"SELECT id, $tbl AS tbl, ${VectorOpsSql.rpBucket("embedding", 12, tbl)} AS bucket FROM pre")
          .mkString("\n  UNION ALL\n  ")
        s"""WITH pre AS (SELECT vec_id AS id, embedding FROM embeddings),
           |buckets AS (
           |  $tables),
           |cand AS (SELECT DISTINCT l.id AS id_a, r.id AS id_b
           |         FROM buckets l JOIN buckets r
           |           ON l.tbl = r.tbl AND l.bucket = r.bucket AND l.id < r.id)
           |SELECT id_a, id_b, round(cos, 6) AS cosine FROM (
           |  SELECT id_a, id_b,
           |         ${VectorOpsSql.cosine("a.embedding", "b.embedding")} AS cos
           |  FROM cand JOIN pre a ON id_a = a.id JOIN pre b ON id_b = b.id)
           |WHERE cos >= 0.2 ORDER BY id_a, id_b""".stripMargin
      },

      "embed_norm" ->
        s"""SELECT vec_id, label, round(${VectorOpsSql.norm("embedding")}, 6)
           |  AS l2_norm
           |FROM embeddings ORDER BY vec_id""".stripMargin,

      "embed_quantize" ->
        s"""WITH s AS (SELECT vec_id, embedding AS e,
           |                  ${VectorOpsSql.quantScale("embedding")} AS scale
           |           FROM embeddings),
           |q AS (SELECT vec_id, e, scale,
           |             ${VectorOpsSql.quantize("e", "scale")} AS qv
           |      FROM s)
           |SELECT vec_id, round(scale, 6) AS scale,
           |       round(${VectorOpsSql.dequantMaxErr("e", "qv", "scale")}, 6)
           |         AS max_err
           |FROM q ORDER BY vec_id""".stripMargin,

      "mm_binary_meta" ->
        """SELECT doc_id,
          |       CAST(octet_length(text::BLOB) AS BIGINT) AS n_bytes,
          |       sha256(text) AS sha256,
          |       'text/plain' AS mime
          |FROM documents ORDER BY doc_id""".stripMargin,

      // BPE-ish regex token count: \w+|[^\w\s] is ASCII word classes in both
      // Java regex (no UNICODE_CHARACTER_CLASS) and DuckDB's RE2
      "text_token_count" ->
        """SELECT doc_id,
          |       CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
          |            AS BIGINT) AS n_ws_tokens,
          |       CAST(len(regexp_extract_all(text, '\w+|[^\w\s]'))
          |            AS BIGINT) AS n_bpe_tokens
          |FROM documents ORDER BY doc_id""".stripMargin,

      // The stub decode derives dimensions from the payload's sha-256 hex
      // (Multimodal.stubDims) — pure arithmetic, replayable in DuckDB
      "mm_decode_meta" ->
        """SELECT doc_id::BIGINT AS id, 'image/x-stub' AS mime,
          |       64 + (ascii(substr(sha256(text),1,1)) % 16) * 4 AS width_px,
          |       64 + (ascii(substr(sha256(text),2,1)) % 16) * 4 AS height_px,
          |       octet_length(text::BLOB)::BIGINT AS n_bytes
          |FROM documents ORDER BY id""".stripMargin,

      // independent reconstruction of the image-fixture arithmetic: the
      // Spark side must report the dims/channels the images were BUILT
      // with (round-tripped through the real codec), and the corrupt
      // rows must flag, not throw
      "mm_decode_real" ->
        """SELECT CAST(id AS BIGINT) AS id,
          |  CASE WHEN id % 3 = 1 THEN 'image/jpeg' ELSE 'image/png' END AS mime,
          |  CAST(16 + (id * 7) % 50 AS INTEGER) AS width_px,
          |  CAST(16 + (id * 11) % 40 AS INTEGER) AS height_px,
          |  CAST(CASE WHEN id % 3 = 2 THEN 1 ELSE 3 END AS INTEGER) AS n_channels,
          |  TRUE AS decode_ok
          |FROM range(0, 20) t(id)
          |UNION ALL SELECT 100, 'application/octet-stream', 0, 0, 0, FALSE
          |UNION ALL SELECT 101, 'image/png', 0, 0, 0, FALSE
          |ORDER BY id""".stripMargin,

      // independent reconstruction of the audio-fixture arithmetic; the
      // corrupt rows flag with their sniffed container type
      // construction arithmetic, independently recomputed: duration_ms is
      // the fixture's duration*1000 over its movie timescale (integer
      // division), dims/tracks are the built values, and the three
      // corrupt arms flag decode_ok = FALSE with zeroed fields
      "mm_decode_video_real" ->
        """SELECT CAST(id AS BIGINT) AS id, 'video/mp4' AS mime,
          |  CAST(320 + 16 * id AS INTEGER) AS width_px,
          |  CAST(240 + 8 * id AS INTEGER) AS height_px,
          |  CAST(1 + id % 3 AS INTEGER) AS n_tracks,
          |  CAST((1200 + id * 600) * 1000 // (600 + (id % 4) * 400) AS BIGINT)
          |    AS duration_ms,
          |  TRUE AS decode_ok
          |FROM range(0, 10) t(id)
          |UNION ALL SELECT 100, 'application/octet-stream', 0, 0, 0, 0, FALSE
          |UNION ALL SELECT 101, 'video/mp4', 0, 0, 0, 0, FALSE
          |UNION ALL SELECT 102, 'video/mp4', 0, 0, 0, 0, FALSE
          |ORDER BY id""".stripMargin,

      "mm_decode_audio_real" ->
        """SELECT CAST(id AS BIGINT) AS id, 'audio/wav' AS mime,
          |  CAST(8000 + (id % 5) * 2000 AS INTEGER) AS sample_rate_hz,
          |  CAST(1 + id % 2 AS INTEGER) AS n_channels,
          |  CAST(100 + id * 37 AS BIGINT) AS n_frames,
          |  CAST((100 + id * 37) * 1000 // (8000 + (id % 5) * 2000) AS BIGINT)
          |    AS duration_ms,
          |  TRUE AS decode_ok
          |FROM range(0, 12) t(id)
          |UNION ALL SELECT 100, 'application/octet-stream', 0, 0, 0, 0, FALSE
          |UNION ALL SELECT 101, 'audio/wav', 0, 0, 0, 0, FALSE
          |ORDER BY id""".stripMargin,

      "mm_resize_plan" ->
        """WITH m AS (SELECT doc_id::BIGINT AS id,
          |       64 + (ascii(substr(sha256(text),1,1)) % 16) * 4 AS width_px,
          |       64 + (ascii(substr(sha256(text),2,1)) % 16) * 4 AS height_px
          |       FROM documents)
          |SELECT id, width_px, height_px,
          |  CASE WHEN greatest(width_px, height_px) <= 128 THEN width_px
          |       ELSE CAST(floor((width_px * 128) / greatest(width_px, height_px))
          |            AS INTEGER) END AS target_w,
          |  CASE WHEN greatest(width_px, height_px) <= 128 THEN height_px
          |       ELSE CAST(floor((height_px * 128) / greatest(width_px, height_px))
          |            AS INTEGER) END AS target_h
          |FROM m ORDER BY id""".stripMargin,

      "mm_frame_sample" ->
        """WITH m AS (SELECT doc_id::BIGINT AS id,
          |       64 + (ascii(substr(sha256(text),1,1)) % 16) * 4 AS w
          |       FROM documents)
          |SELECT id, CAST(unnest(range(0, w, 5)) AS INTEGER) AS frame_idx
          |FROM m ORDER BY id, frame_idx""".stripMargin,

      // every complete sequence restated from the packing arithmetic:
      // per-group cumulative token offsets place each doc's tokens at
      // global positions, sequences are 16-position windows, boundaries
      // the doc-start positions — the engine's explode/aggregate path
      // and the byte roundtrip never appear
      "train_shards_retracted" ->
        """WITH d AS (SELECT doc_id, CAST(doc_id % 4 AS VARCHAR) AS grp,
          |                  doc_id % 7 + 3 AS n
          |           FROM documents
          |           WHERE doc_id < 200 AND doc_id % 4 <> 2),
          |o AS (SELECT doc_id, grp, n,
          |        sum(n) OVER (PARTITION BY grp ORDER BY doc_id
          |                     ROWS UNBOUNDED PRECEDING) - n AS p0
          |      FROM d),
          |tok0 AS (SELECT grp, doc_id, p0, unnest(range(0, n)) AS u FROM o),
          |tok AS (SELECT grp, p0 + u AS pos, doc_id * 100 + u AS tk
          |        FROM tok0),
          |sq AS (SELECT grp, pos // 16 AS seq_id, pos % 16 AS ip, tk
          |       FROM tok),
          |filled AS (SELECT grp, seq_id,
          |             array_to_string(list(tk ORDER BY ip), ',')
          |               AS tokens_csv,
          |             count(*) AS c
          |           FROM sq GROUP BY grp, seq_id),
          |bnd AS (SELECT grp, p0 // 16 AS seq_id,
          |          array_to_string(list(p0 % 16 ORDER BY p0 % 16), ',')
          |            AS boundaries_csv
          |        FROM o GROUP BY 1, 2)
          |SELECT f.grp AS "group", CAST(f.seq_id AS BIGINT) AS seq_id,
          |       f.tokens_csv,
          |       coalesce(b.boundaries_csv, '') AS boundaries_csv
          |FROM filled f
          |LEFT JOIN bnd b ON f.grp = b.grp AND f.seq_id = b.seq_id
          |WHERE f.c = 16 ORDER BY f.grp, f.seq_id""".stripMargin,

      "train_shards_roundtrip" ->
        """WITH d AS (SELECT doc_id, CAST(doc_id % 4 AS VARCHAR) AS grp,
          |                  doc_id % 7 + 3 AS n
          |           FROM documents WHERE doc_id < 200),
          |o AS (SELECT doc_id, grp, n,
          |        sum(n) OVER (PARTITION BY grp ORDER BY doc_id
          |                     ROWS UNBOUNDED PRECEDING) - n AS p0
          |      FROM d),
          |tok0 AS (SELECT grp, doc_id, p0, unnest(range(0, n)) AS u FROM o),
          |tok AS (SELECT grp, p0 + u AS pos, doc_id * 100 + u AS tk
          |        FROM tok0),
          |sq AS (SELECT grp, pos // 16 AS seq_id, pos % 16 AS ip, tk
          |       FROM tok),
          |filled AS (SELECT grp, seq_id,
          |             array_to_string(list(tk ORDER BY ip), ',')
          |               AS tokens_csv,
          |             count(*) AS c
          |           FROM sq GROUP BY grp, seq_id),
          |bnd AS (SELECT grp, p0 // 16 AS seq_id,
          |          array_to_string(list(p0 % 16 ORDER BY p0 % 16), ',')
          |            AS boundaries_csv
          |        FROM o GROUP BY 1, 2)
          |SELECT f.grp AS "group", CAST(f.seq_id AS BIGINT) AS seq_id,
          |       f.tokens_csv,
          |       coalesce(b.boundaries_csv, '') AS boundaries_csv
          |FROM filled f
          |LEFT JOIN bnd b ON f.grp = b.grp AND f.seq_id = b.seq_id
          |WHERE f.c = 16 ORDER BY f.grp, f.seq_id""".stripMargin,

      // all five interleaved rows per doc from arithmetic — spans,
      // slot order, and payload flags never touch markup in the oracle
      "mm_interleaved" ->
        """SELECT doc_id, CAST(seq AS BIGINT) AS seq, kind, text,
          |       image_src, has_payload FROM (
          |  SELECT doc_id, 0 AS seq, 'text' AS kind,
          |         'intro ' || CAST(doc_id AS VARCHAR) AS text,
          |         CAST(NULL AS VARCHAR) AS image_src,
          |         CAST(NULL AS BOOLEAN) AS has_payload
          |  FROM documents WHERE doc_id < 80
          |  UNION ALL
          |  SELECT doc_id, 1, 'image', NULL,
          |         'img/' || CAST(doc_id AS VARCHAR) || '/0.png',
          |         doc_id % 3 <> 0
          |  FROM documents WHERE doc_id < 80
          |  UNION ALL
          |  SELECT doc_id, 2, 'text', 'middle', NULL, NULL
          |  FROM documents WHERE doc_id < 80
          |  UNION ALL
          |  SELECT doc_id, 3, 'image', NULL,
          |         'img/' || CAST(doc_id AS VARCHAR) || '/1.png',
          |         doc_id % 2 = 0
          |  FROM documents WHERE doc_id < 80
          |  UNION ALL
          |  SELECT doc_id, 4, 'text', 'outro' || chr(10) || 'tail',
          |         NULL, NULL
          |  FROM documents WHERE doc_id < 80
          |) ORDER BY doc_id, seq""".stripMargin,

      // every multimodal sequence from span tokenization + packing
      // arithmetic: a page's stream is [h(intro), h(id), SLOT, h(middle),
      // SLOT, h(outro\ntail)] — 6 tokens — laid end-to-end per group in
      // doc order, 16-position windows, partial tails dropped
      "mm_shards_roundtrip" -> {
        val h = TextOpsSql.tokenHashes(
          "list_value('intro', CAST(doc_id AS VARCHAR), 'middle', " +
            "'outro' || chr(10) || 'tail')")
        s"""WITH d AS (
           |  SELECT doc_id, CAST(doc_id % 4 AS VARCHAR) AS grp, $h AS h
           |  FROM documents WHERE doc_id < 80),
           |p AS (
           |  SELECT doc_id, grp,
           |         [h[1], h[2], 1048576, h[3], 1048576, h[4]] AS toks
           |  FROM d),
           |o AS (SELECT doc_id, grp, toks,
           |        sum(6) OVER (PARTITION BY grp ORDER BY doc_id
           |                     ROWS UNBOUNDED PRECEDING) - 6 AS p0
           |      FROM p),
           |tok0 AS (SELECT grp, p0, toks, unnest(range(0, 6)) AS i FROM o),
           |tok AS (SELECT grp, p0 + i AS pos,
           |               toks[CAST(i AS INT) + 1] AS tk
           |        FROM tok0),
           |sq AS (SELECT grp, pos // 16 AS seq_id, pos % 16 AS ip, tk
           |       FROM tok),
           |filled AS (SELECT grp, seq_id,
           |             array_to_string(list(tk ORDER BY ip), ',')
           |               AS tokens_csv,
           |             count(*) AS c
           |           FROM sq GROUP BY grp, seq_id),
           |bnd AS (SELECT grp, p0 // 16 AS seq_id,
           |          array_to_string(list(p0 % 16 ORDER BY p0 % 16), ',')
           |            AS boundaries_csv
           |        FROM o GROUP BY 1, 2)
           |SELECT f.grp AS "group", CAST(f.seq_id AS BIGINT) AS seq_id,
           |       f.tokens_csv,
           |       coalesce(b.boundaries_csv, '') AS boundaries_csv
           |FROM filled f
           |LEFT JOIN bnd b ON f.grp = b.grp AND f.seq_id = b.seq_id
           |WHERE f.c = 16 ORDER BY f.grp, f.seq_id""".stripMargin
      },

      // one blob per DISTINCT payload byte string across the whole image
      // table; kept-slot counts from the packing + presence arithmetic
      "mm_payload_dedup" ->
        """WITH o AS (
          |  SELECT doc_id, CAST(doc_id % 4 AS VARCHAR) AS grp,
          |         sum(6) OVER (PARTITION BY doc_id % 4 ORDER BY doc_id
          |                      ROWS UNBOUNDED PRECEDING) - 6 AS p0
          |  FROM documents WHERE doc_id < 80),
          |fullseqs AS (SELECT grp, (count(*) * 6) // 16 AS nfull
          |             FROM o GROUP BY grp),
          |slots AS (
          |  SELECT o.doc_id, d.text, o.p0 + 2 AS pos,
          |         o.doc_id % 3 <> 0 AS has_payload
          |  FROM o JOIN documents d USING (doc_id)
          |  UNION ALL
          |  SELECT o.doc_id, d.text, o.p0 + 4, o.doc_id % 2 = 0
          |  FROM o JOIN documents d USING (doc_id)),
          |kept AS (
          |  SELECT s.* FROM slots s
          |  JOIN o ON s.doc_id = o.doc_id
          |  JOIN fullseqs f ON CAST(o.doc_id % 4 AS VARCHAR) = f.grp
          |  WHERE s.pos // 16 < f.nfull),
          |allpay AS (
          |  SELECT text FROM documents
          |  WHERE doc_id < 80 AND doc_id % 3 <> 0
          |  UNION ALL
          |  SELECT text FROM documents WHERE doc_id < 80 AND doc_id % 2 = 0)
          |SELECT
          |  (SELECT count(*) FROM kept WHERE has_payload)
          |    AS n_payload_slots,
          |  (SELECT count(DISTINCT text) FROM kept WHERE has_payload)
          |    AS n_kept_distinct,
          |  (SELECT count(DISTINCT text) FROM allpay) AS n_blobs""".stripMargin,

      // slot addresses from the same 6-per-page layout (slot 0 at page
      // offset 2, slot 1 at 4), kept only inside full sequences; payload
      // byte-equality restated as the doc's own text where the fetch
      // succeeded — the content-addressed sidecar and the positioned
      // reads never appear in the oracle
      "mm_payload_roundtrip" ->
        """WITH o AS (
          |  SELECT doc_id, CAST(doc_id % 4 AS VARCHAR) AS grp,
          |         sum(6) OVER (PARTITION BY doc_id % 4 ORDER BY doc_id
          |                      ROWS UNBOUNDED PRECEDING) - 6 AS p0
          |  FROM documents WHERE doc_id < 80),
          |fullseqs AS (SELECT grp, (count(*) * 6) // 16 AS nfull
          |             FROM o GROUP BY grp),
          |slots AS (
          |  SELECT doc_id, grp, p0 + 2 AS pos,
          |         'img/' || CAST(doc_id AS VARCHAR) || '/0.png'
          |           AS image_src,
          |         doc_id % 3 <> 0 AS has_payload
          |  FROM o
          |  UNION ALL
          |  SELECT doc_id, grp, p0 + 4,
          |         'img/' || CAST(doc_id AS VARCHAR) || '/1.png',
          |         doc_id % 2 = 0
          |  FROM o),
          |kept AS (
          |  SELECT s.grp, CAST(s.pos // 16 AS BIGINT) AS seq_id,
          |         CAST(s.pos % 16 AS INT) AS slot_pos, s.doc_id,
          |         s.image_src, s.has_payload
          |  FROM slots s JOIN fullseqs f ON s.grp = f.grp
          |  WHERE s.pos // 16 < f.nfull)
          |SELECT k.grp AS "group", k.seq_id, k.slot_pos, k.doc_id,
          |       k.image_src, k.has_payload,
          |       CASE WHEN k.has_payload THEN d.text END AS payload_text
          |FROM kept k JOIN documents d USING (doc_id)
          |ORDER BY k.doc_id, k.image_src""".stripMargin,

      // batch replay of the streaming first-seen dedup: keyed state keeps
      // one id per distinct digest, lowest id wins within a batch — the
      // duplicated corpus (1000 rows in) collapses to its 500 originals
      "stream_dedup_state" ->
        s"""WITH $ExactDupCorpusSql
           |SELECT min(doc_id) AS kept_id FROM corpus
           |GROUP BY sha256(text) ORDER BY kept_id""".stripMargin,

      // identical semantics to dedup_incremental, replayed as a batch
      "stream_incremental_dedup" -> streamIncDedupSql,
      "stream_dedup_resumed" -> streamResumedDedupSql,
      "stream_bloom_gate" -> streamIncDedupSql,

      // the chained ingest loop, restated stage by stage: stage 1's
      // admissions (exact keep-first vs the base corpus, then banding +
      // jaccard >= 0.7) JOIN the corpus for stage 2 — exactly the append
      // the stream performs between micro-batches. Any drift in the
      // in-run append (survivors not folded, or folded into one index
      // only) breaks stage 2's rows
      "stream_ingest_loop" -> {
        val thash = TextOpsSql.tokenHashes("tk")
        val shingles = TextOpsSql.shingleHashes("th")
        val sig = TextOpsSql.minHashSignature("ss")
        val bucketCase = (0 until TextOps.Bands)
          .map(b => s"WHEN ${b} THEN ${TextOpsSql.bandHash("sig", b)}")
          .mkString("CASE band ", " ", " END")
        def setsOf(src: String) =
          s"""SELECT doc_id, list_distinct($shingles) AS ss FROM (
             |  SELECT doc_id, $thash AS th FROM (
             |    SELECT doc_id, ${TextOpsSql.tokens("text")} AS tk FROM $src))""".stripMargin
        def mutSql(dropN: Int, off: Long) =
          s"""SELECT doc_id + $off AS doc_id,
             |       CASE WHEN len($toks) > $dropN
             |            THEN array_to_string(($toks)[${dropN + 1}:], ' ')
             |            ELSE text END AS text
             |  FROM documents""".stripMargin
        def stage(p: String, batch: String, corpus: String) =
          s"""e$p AS (SELECT doc_id, text FROM (
             |  SELECT doc_id, text,
             |         row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
             |  FROM $batch WHERE text NOT IN (SELECT text FROM $corpus))
             |  WHERE rn = 1),
             |bd$p AS (${setsOf(s"e$p")}),
             |cd$p AS (${setsOf(corpus)}),
             |bsg$p AS (SELECT doc_id, ss, $sig AS sig FROM bd$p),
             |csg$p AS (SELECT doc_id, ss, $sig AS sig FROM cd$p),
             |bb$p AS (SELECT doc_id, ss, band, $bucketCase AS bucket
             |         FROM bsg$p, (VALUES (0), (1), (2), (3)) b(band)),
             |cb$p AS (SELECT doc_id, ss, band, $bucketCase AS bucket
             |         FROM csg$p, (VALUES (0), (1), (2), (3)) b(band)),
             |chit$p AS (SELECT DISTINCT l.doc_id
             |           FROM bb$p l JOIN cb$p r
             |             ON l.band = r.band AND l.bucket = r.bucket
             |           WHERE ${TextOpsSql.jaccard("l.ss", "r.ss")}
             |                 >= CAST(0.7 AS DOUBLE)),
             |wdrop$p AS (SELECT DISTINCT r.doc_id
             |            FROM bb$p l JOIN bb$p r
             |              ON l.band = r.band AND l.bucket = r.bucket
             |             AND l.doc_id < r.doc_id
             |            WHERE ${TextOpsSql.jaccard("l.ss", "r.ss")}
             |                  >= CAST(0.7 AS DOUBLE)),
             |s$p AS (SELECT e.doc_id, e.text FROM e$p e
             |        WHERE e.doc_id NOT IN (SELECT doc_id FROM chit$p)
             |          AND e.doc_id NOT IN (SELECT doc_id FROM wdrop$p))""".stripMargin
        s"""WITH mut5 AS (${mutSql(5, 20000000)}),
           |b1 AS (SELECT doc_id + 10000000 AS doc_id, text FROM documents
           |       UNION ALL SELECT doc_id, text FROM mut5),
           |b2 AS (SELECT doc_id + 20000000 AS doc_id, text FROM mut5
           |       UNION ALL ${mutSql(8, 50000000)}),
           |corp0 AS (SELECT doc_id, text FROM documents),
           |${stage("1", "b1", "corp0")},
           |corp1 AS (SELECT doc_id, text FROM corp0
           |          UNION ALL SELECT doc_id, text FROM s1),
           |${stage("2", "b2", "corp1")}
           |SELECT doc_id FROM s1 UNION ALL SELECT doc_id FROM s2
           |ORDER BY doc_id""".stripMargin
      },

      // batch statement of the streaming LSH keep rule: a doc survives iff
      // NO band bucket of its holds a lower id — the bucket-minimum join
      // is an independent formulation of the keyed-state fold
      "stream_lsh_dedup" -> {
        val thash = TextOpsSql.tokenHashes("toks")
        val shingles = TextOpsSql.shingleHashes("thash")
        val sig = TextOpsSql.minHashSignature("shingles")
        val bucketCase = (0 until TextOps.Bands)
          .map(b => s"WHEN ${b} THEN ${TextOpsSql.bandHash("sig", b)}")
          .mkString("CASE band ", " ", " END")
        s"""WITH $NearDupCorpusSql,
           |tok AS (SELECT doc_id, $toks AS toks FROM corpus),
           |th AS (SELECT doc_id, $thash AS thash FROM tok),
           |sh AS (SELECT doc_id, list_distinct($shingles) AS shingles FROM th),
           |sg AS (SELECT doc_id, $sig AS sig FROM sh),
           |bands AS (SELECT doc_id, band, $bucketCase AS bucket
           |          FROM sg, (VALUES (0), (1), (2), (3)) b(band)),
           |m AS (SELECT band, bucket, min(doc_id) AS mn FROM bands
           |      WHERE bucket IS NOT NULL GROUP BY band, bucket),
           |drops AS (SELECT DISTINCT bands.doc_id
           |          FROM bands JOIN m USING (band, bucket)
           |          WHERE m.mn < bands.doc_id)
           |SELECT doc_id FROM corpus
           |WHERE doc_id NOT IN (SELECT doc_id FROM drops)
           |ORDER BY doc_id""".stripMargin
      },

      "stream_source_quota" ->
        """SELECT doc_id, source FROM (
          |  SELECT doc_id, source,
          |         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
          |  FROM documents)
          |WHERE rn <= 12 ORDER BY doc_id""".stripMargin,

      // the batch token-budget rule as ONE ordered cumsum per source — an
      // independent formulation (the oracle may funnel; the operator's
      // refold may not)
      "stream_token_budget" ->
        s"""WITH d AS (SELECT doc_id, source,
           |             coalesce(len($toks), 0)::BIGINT AS n_tokens
           |           FROM documents),
           |c AS (SELECT doc_id, source, n_tokens,
           |             sum(n_tokens) OVER (PARTITION BY source
           |                                 ORDER BY doc_id) AS cum
           |      FROM d)
           |SELECT doc_id, source, n_tokens FROM c WHERE cum <= 800
           |ORDER BY doc_id""".stripMargin,

      // frontier_schedule's resolved-delay VALUES with id-ordered slots
      "stream_politeness_gate" ->
        """WITH d AS (SELECT par, CAST(delay_s AS DOUBLE) AS delay_s
          |  FROM (VALUES
          |        (0, 1.0), (1, 0.5), (2, 2.5), (3, 0.5)) t(par, delay_s)),
          |u AS (
          |  SELECT doc_id,
          |         'https://' || source || '.test/doc/'
          |           || CAST(doc_id AS VARCHAR) AS url,
          |         source || '.test' AS host,
          |         CAST(substring(source, 4) AS INT) % 4 AS par
          |  FROM documents),
          |r AS (
          |  SELECT u.doc_id, u.url, u.host, d.delay_s,
          |         row_number() OVER (PARTITION BY u.host
          |           ORDER BY u.doc_id) - 1 AS slot
          |  FROM u JOIN d ON d.par = u.par)
          |SELECT doc_id, url, host, slot, delay_s,
          |       slot * delay_s AS sched_s
          |FROM r WHERE slot * delay_s < 10.0 ORDER BY url""".stripMargin,

      "stream_url_dedup" ->
        """SELECT 'https://site' || CAST(doc_id % 100 AS VARCHAR)
          |         || '.example.com/page' AS canonical_url,
          |       min(doc_id) AS kept_id
          |FROM documents GROUP BY doc_id % 100
          |ORDER BY kept_id""".stripMargin,

      // batch statement of the streaming gate: a train doc passes at
      // eval-overlap fraction <= 0.2; shingle-free docs always pass
      "stream_contamination_gate" -> {
        val isEval =
          s"${operators.SamplingSql.hash16("doc_id", 11)} < ${math.round(0.15 * operators.Sampling.Buckets)}"
        // staged like ContaminationSql.check: one tokenize→hash→shingle
        // pass per row, not one per reference (DuckDB inlines CTEs)
        s"""WITH ctok AS (SELECT doc_id, $toks AS toks FROM documents),
           |cth AS (SELECT doc_id, ${TextOpsSql.tokenHashes("toks")} AS thash
           |        FROM ctok),
           |cshl AS (SELECT doc_id,
           |            list_distinct(${TextOpsSql.shingleHashes("thash")}) AS shingles
           |         FROM cth),
           |sh AS (
           |  SELECT doc_id, $isEval AS is_eval,
           |         len(shingles) AS n_shingles, unnest(shingles) AS sh
           |  FROM cshl),
           |base AS (SELECT doc_id FROM documents WHERE NOT ($isEval)),
           |ev AS (SELECT DISTINCT sh FROM sh WHERE is_eval),
           |hits AS (SELECT sh.doc_id, n_shingles, count(*) AS n_shared
           |         FROM sh JOIN ev USING (sh)
           |         WHERE NOT is_eval GROUP BY sh.doc_id, n_shingles)
           |SELECT b.doc_id FROM base b LEFT JOIN hits h USING (doc_id)
           |WHERE coalesce(n_shared::DOUBLE / n_shingles::DOUBLE, 0.0) <= 0.2
           |ORDER BY b.doc_id""".stripMargin
      },

      // streaming Misra-Gries with capacity > distinct tokens: exact
      // counts, identical to the batch heavy-hitter oracle
      "stream_top_tokens" ->
        s"""SELECT token, count(*) AS cnt
           |FROM (SELECT unnest($toks) AS token FROM documents)
           |GROUP BY token ORDER BY cnt DESC, token LIMIT 20""".stripMargin,

      // batch statement of the streaming perplexity gate: Laplace unigram
      // scores under the 'en'-slice model (ref vocab only — the gate has
      // no corpus-wide vocabulary), fixed threshold
      "stream_classifier_gate" -> {
        import graft.operators.ClassifierSql
        s"""WITH cdocs AS (
           |  SELECT doc_id,
           |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
           |         ${TextOpsSql.tokenHashes(toks)} AS th
           |  FROM documents),
           |${ClassifierSql.trainCtes(64, 2, 1L, 1L)}
           |SELECT doc_id FROM (
           |${ClassifierSql.scoreSelect(64, 2)}
           |) WHERE margin_units >= 0 ORDER BY doc_id""".stripMargin
      },

      "stream_ppl_gate" -> {
        val th = TextOpsSql.tokenHashes(TextOpsSql.tokens("text"))
        s"""WITH tok AS (SELECT doc_id, unnest($th) AS u FROM documents),
           |ref AS (SELECT u, count(*) AS cu
           |        FROM (SELECT unnest($th) AS u FROM documents
           |              WHERE lang = 'en')
           |        GROUP BY u),
           |t AS (SELECT coalesce(sum(cu), 0)::BIGINT + count(*)::BIGINT
           |             AS denom FROM ref),
           |scored AS (
           |  SELECT doc_id,
           |         round(sum(log10((coalesce(cu, 0)::DOUBLE + 1.0)
           |                         / denom::DOUBLE))
           |               / count(*)::DOUBLE, 6) AS mlp
           |  FROM tok LEFT JOIN ref USING (u), t
           |  GROUP BY doc_id),
           |alld AS (
           |  SELECT b.doc_id,
           |         coalesce(s.mlp, round(log10(1.0 / denom::DOUBLE), 6)) AS mlp
           |  FROM documents b LEFT JOIN scored s USING (doc_id), t)
           |SELECT doc_id FROM alld WHERE mlp >= -1.49 ORDER BY doc_id""".stripMargin
      },

      // batch replay of the streaming tumbling-window counts (sentinel rows
      // are engine plumbing — they never reach the query output)
      "stream_window_counts" ->
        """SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts::TIMESTAMP),
          |                '%Y-%m-%d %H:%M:%S') AS window_start,
          |       event_type, count(*) AS n_events
          |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

      "stream_window_quantiles" ->
        """SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts::TIMESTAMP),
          |                '%Y-%m-%d %H:%M:%S') AS window_start,
          |       count(*) AS n_events,
          |       round(quantile_cont(value, 0.5), 6) AS p_exact,
          |       true AS approx_ok
          |FROM events GROUP BY 1 ORDER BY window_start""".stripMargin,

      "stream_window_drift" ->
        """WITH c AS (
          |  SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts::TIMESTAMP),
          |                  '%Y-%m-%d %H:%M:%S') AS w,
          |         event_type, count(*)::BIGINT AS cw
          |  FROM events GROUP BY 1, 2),
          |ref AS (SELECT event_type, sum(cw)::BIGINT AS rc FROM c GROUP BY 1),
          |t AS (SELECT sum(rc)::BIGINT AS n FROM ref),
          |wt AS (SELECT w, sum(cw)::BIGINT AS nw FROM c GROUP BY 1),
          |grid AS (
          |  SELECT wt.w, wt.nw, ref.rc, coalesce(c2.cw, 0)::BIGINT AS cw
          |  FROM wt CROSS JOIN ref
          |  LEFT JOIN c c2 ON c2.w = wt.w AND c2.event_type = ref.event_type)
          |SELECT w AS window_start, nw AS n_events,
          |       (sum(abs(cw * 1000000 // nw - rc * 1000000 // n))
          |          // 2)::BIGINT AS drift_ppm
          |FROM grid, t GROUP BY w, nw ORDER BY window_start""".stripMargin,

      // gaps-and-islands replay of session_window: a session breaks when the
      // gap is >= 30 min (session intervals [ts, ts+gap) merge on overlap,
      // so an exactly-30-min gap starts a new session)
      "stream_sessions" ->
        """WITH e AS (SELECT user_id, ts::TIMESTAMP AS ts FROM events),
          |marked AS (SELECT user_id, ts,
          |  CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
          |            < INTERVAL 30 MINUTE
          |       THEN 0 ELSE 1 END AS new_session FROM e),
          |grp AS (SELECT user_id, ts,
          |  sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
          |                         ROWS UNBOUNDED PRECEDING) AS sid
          |  FROM marked)
          |SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
          |       count(*) AS n_events
          |FROM grp GROUP BY user_id, sid
          |ORDER BY user_id, session_start""".stripMargin,

      // batch replay of the stream-stream interval join: per-user stats are
      // order-independent (counts, distinct counts, max), so the streaming
      // pair-emission order never matters
      "stream_interval_join" ->
        """WITH e AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id,
          |                  event_type, value FROM events),
          |c AS (SELECT event_id AS click_id, ts AS click_ts, user_id
          |      FROM e WHERE event_type = 'click'),
          |p AS (SELECT event_id AS buy_id, ts AS buy_ts, user_id, value
          |      FROM e WHERE event_type = 'purchase')
          |SELECT c.user_id, count(*) AS n_pairs,
          |       count(DISTINCT click_id) AS n_clicks,
          |       count(DISTINCT buy_id) AS n_buys,
          |       round(max(value), 6) AS max_value
          |FROM c JOIN p ON c.user_id = p.user_id
          |  AND buy_ts >= click_ts
          |  AND buy_ts <= click_ts + INTERVAL 30 MINUTE
          |GROUP BY c.user_id ORDER BY c.user_id""".stripMargin,

      // deterministic control-layer scenarios: literal expected outcomes
      "c9_job_times" ->
        """SELECT * FROM (VALUES
          |  (1, '2020-01-01 00:00:00', '2020-01-01 02:00:00', 'C'))
          |  t(id, start_time, end_time, status)""".stripMargin,

      "c9_lock_owners" ->
        """SELECT * FROM (VALUES (1, 'tab_a,tab_c'), (2, 'tab_b'))
          |  t(upl_id_lock, locked_tables) ORDER BY upl_id_lock""".stripMargin,

      // ---- BDE slice oracles: the reference test's own expectations ----
      "s3_bde_read" ->
        """SELECT * FROM (VALUES
          |  (4457326, 3, 11960041, 'Y', 80401150),
          |  (4457327, 2, 29694578, 'N', 80401149),
          |  (4457328, 1, 29694591, 'Y', 80401148))
          |  t(pri_id, "sequence", lin_id, reversed, audit_id)
          |ORDER BY pri_id""".stripMargin,

      "s3_change_read" ->
        """SELECT * FROM (VALUES
          |  (1, 'crs_parcel_bndry', 80401150, 'D', TIMESTAMP '2016-06-01 17:12:17'),
          |  (2, 'crs_parcel_bndry', 300, 'I', TIMESTAMP '2016-06-01 17:12:17'),
          |  (3, 'crs_parcel_bndry', 400, 'I', TIMESTAMP '2016-06-01 17:12:17'),
          |  (4, 'crs_parcel_bndry', 100, 'I', TIMESTAMP '2016-06-01 17:12:17'),
          |  (5, 'crs_parcel_bndry', 80401148, 'U', TIMESTAMP '2016-06-01 17:12:17'),
          |  (6, 'crs_parcel_bndry', 80401149, 'U', TIMESTAMP '2016-06-01 17:12:17'))
          |  t(id, tablename, tablekeyvalue, "action", "timestamp")
          |ORDER BY id""".stripMargin,

      "s3_utf8_roundtrip" ->
        """SELECT * FROM (VALUES
          |  (1, '♯'), (2, '♭'), (3, '♮'), (4, '–')) t(id, des)
          |ORDER BY id""".stripMargin,

      "e1_level0_replace" ->
        """SELECT * FROM (VALUES
          |  (4457326, 3, 11960041, 'Y', 80401150),
          |  (4457327, 2, 29694578, 'N', 80401149),
          |  (4457328, 1, 29694591, 'Y', 80401148))
          |  t(pri_id, "sequence", lin_id, reversed, audit_id)
          |ORDER BY pri_id""".stripMargin,

      // final 5 rows per t/linz_bde_uploader.t:1176-1221
      "e2_level5_final" ->
        """SELECT * FROM (VALUES
          |  (4457326, 3, 11960041, 'Y', 100),
          |  (4457327, 20, 29694578, 'N', 80401149),
          |  (4457328, 10, 29694591, 'Y', 80401148),
          |  (4457329, 4, 10000000, 'Y', 300),
          |  (4457330, 5, 20000000, 'Y', 400))
          |  t(pri_id, "sequence", lin_id, reversed, audit_id)
          |ORDER BY pri_id""".stripMargin,

      // ninsert=3, nupdate=2, nnullupdate=0, ndelete=1 (t:1198-1201)
      "e2_level5_stats" ->
        """SELECT * FROM (VALUES ('crs_parcel_bndry', 3, 2, 0, 1))
          |  t(table_name, ninsert, nupdate, nnullupdate, ndelete)""".stripMargin,

      "e2_tolerance_abort" ->
        """SELECT * FROM (VALUES (true, 3)) t(aborted, published_rows)""".stripMargin,

      "s7_watermark_upsert" ->
        """SELECT * FROM (VALUES
          |  ('crs_parcel_bndry', 2, '20170629000000', '5', '20160601000000', true))
          |  t(table_name, last_upload_id, last_upload_dataset,
          |    last_upload_type, last_level0_dataset, last_upload_incremental)""".stripMargin,

      // same reference-test expectations as e2_level5_final, via JDBC
      "s5_jdbc_sink" ->
        """SELECT * FROM (VALUES
          |  (4457326, 3, 11960041, 'Y', 100),
          |  (4457327, 20, 29694578, 'N', 80401149),
          |  (4457328, 10, 29694591, 'Y', 80401148),
          |  (4457329, 4, 10000000, 'Y', 300),
          |  (4457330, 5, 20000000, 'Y', 400))
          |  t(pri_id, "sequence", lin_id, reversed, audit_id)
          |ORDER BY pri_id""".stripMargin,

      // schema-information copy outcomes: PK + index land on the staged
      // table, the copied PK rejects a duplicate pre-swap, and the live
      // contract survives the publish
      "s5_schema_copy" ->
        """SELECT * FROM (VALUES
          |  ('1_staged_pk_copied', 'true'),
          |  ('2_staged_index_copied', 'true'),
          |  ('3_staged_dup_rejected', 'true'),
          |  ('4_live_pk_after', 'id'),
          |  ('5_live_rows_after', '2'))
          |  t(step, detail)
          |ORDER BY step""".stripMargin,

      // exclusive-lock scenario outcomes: contender times out naming the
      // live holder; an aged claim is stolen and publish proceeds
      "c9_exclusive_lock" ->
        """SELECT * FROM (VALUES
          |  ('1_publish_v1', 'ok'),
          |  ('2_contended_publish', 'timeout_names_holder'),
          |  ('3_stale_steal_publish', 'ok'),
          |  ('4_final_rows', '3'))
          |  t(item, outcome) ORDER BY item""".stripMargin,

      // prune keeps published v_d3 + newest predecessor v_d2, removes v_d1
      "m_prune_versions" ->
        """SELECT * FROM (VALUES
          |  ('published_tag', 'd3'),
          |  ('v_d1', 'removed'),
          |  ('v_d2', 'kept'),
          |  ('v_d3', 'current'))
          |  t(item, status) ORDER BY item""".stripMargin,

      // E3 differ over the pab1 slice: I=3 (keys 100/300/400), U=2
      // (80401148/80401149), D=1 (80401150), final table = 5 rows
      "e3_full_incremental" ->
        """SELECT * FROM (VALUES ('crs_parcel_bndry', 3, 2, 1, 5))
          |  t(table_name, ninsert, nupdate, ndelete, published_rows)""".stripMargin,

      // -j orchestrated: run 1 = first load as diff-against-empty (I=3,
      // incremental=true), run 2 = snapshot diff-merge (I=3, U=2, D=1 → 5)
      "e2e_full_incremental" ->
        """SELECT * FROM (VALUES
          |  (1, '20160601000000', 'loaded', 3, 0, 0, true, 3),
          |  (2, '20170629000000', 'loaded', 3, 2, 1, true, 5))
          |  t(run_id, dataset, status, ninsert, nupdate, ndelete,
          |    wm_incremental, published_rows)
          |ORDER BY run_id""".stripMargin,

      // identical to e2_level5_final: the -j diff-merge lands on the same rows
      "e2e_full_inc_final" ->
        """SELECT * FROM (VALUES
          |  (4457326, 3, 11960041, 'Y', 100),
          |  (4457327, 20, 29694578, 'N', 80401149),
          |  (4457328, 10, 29694591, 'Y', 80401148),
          |  (4457329, 4, 10000000, 'Y', 300),
          |  (4457330, 5, 20000000, 'Y', 400))
          |  t(pri_id, "sequence", lin_id, reversed, audit_id)
          |ORDER BY pri_id""".stripMargin,

      // hand-computed outcome table of the staged orchestrator scenario
      "e2e_orchestrator" ->
        """SELECT * FROM (VALUES
          |  ('20200101000000', '0', 't_alpha', 'loaded',  3, 0, 0, 0),
          |  ('20200101000000', '0', 't_beta',  'loaded',  2, 0, 0, 0),
          |  ('20200202000000', '5', 't_alpha', 'loaded',  1, 1, 0, 0),
          |  ('20200202000000', '5', 't_beta',  'failed',  0, 0, 0, 0),
          |  ('20200303000000', '5', 't_alpha', 'loaded',  0, 0, 1, 1),
          |  ('20200303000000', '5', 't_beta',  'skipped', 0, 0, 0, 0),
          |  ('20200404000000', '5', 't_alpha', 'skipped', 0, 0, 0, 0),
          |  ('20200404000000', '5', 't_beta',  'skipped', 0, 0, 0, 0))
          |  t(dataset, level, table_name, status,
          |    ninsert, nupdate, nnullupdate, ndelete)
          |ORDER BY dataset, table_name""".stripMargin,

      // the cleansed, override-typed alpha table after L0 + two increments
      "s4_clean_loadpath" ->
        """SELECT * FROM (VALUES
          |  (2, 'okay',     TIMESTAMP '1800-01-01 00:00:00'),
          |  (3, 'plain',    TIMESTAMP '2021-05-05 12:00:00'),
          |  (4, 'four - d', TIMESTAMP '2022-02-02 02:02:02'))
          |  t(id, name, born) ORDER BY id""".stripMargin,

      "s4_error_budget" ->
        """SELECT * FROM (VALUES (3, true)) t(loaded_rows, strict_aborted)""".stripMargin,

      "c9_job_lifecycle" ->
        """SELECT * FROM (VALUES
          |  (1, 'bde', 'C'), (2, 'bde', 'E'), (3, 'bde', 'E'), (4, 'bde', 'C'))
          |  t(id, schema_name, status) ORDER BY id""".stripMargin,

      "c9_table_locks" ->
        """SELECT * FROM (VALUES ('tab_a', 2), ('tab_b', -1))
          |  t(table_name, upl_id_lock) ORDER BY table_name""".stripMargin,

      "c9_purge_old_jobs" ->
        """SELECT * FROM (VALUES (2, 'bde', 'C'), (3, 'bde', 'C'))
          |  t(id, schema_name, status) ORDER BY id""".stripMargin,

      // hand-derived: revision 1001 (first id) opens for dataset
      // 20170101020304 (name → revision_time), closes at the stepped clock
      // with 1 modified table; the second dataset's revision was unused
      // (null-updates only) and deleted, so one row survives
      "c9_dataset_revision" ->
        """SELECT * FROM (VALUES
          |  (1001, '20170101020304', '2017-01-01 02:03:04',
          |   '2017-01-01 03:05:00', 1, true))
          |  t(revision, dataset, revision_time, closed_at, ntables, complete)
          |ORDER BY revision""".stripMargin,

      "s1_repo_plan" ->
        """SELECT * FROM (VALUES
          |  ('0', '20160601000000', true, ''),
          |  ('5', '20170701000000', true, ''),
          |  ('5', '20170801000000', false, 'xaud'))
          |  t(level, dataset, complete, missing)
          |ORDER BY level, dataset""".stripMargin,

      "p5_table_selection" ->
        """SELECT * FROM (VALUES
          |  (1, 'l5_change_table', '', 'C', 'xchg'),
          |  (2, 'alpha', 'id', '0,5', 'alp1,alp2'),
          |  (5, 'delta', 'id', '0,5', 'del'))
          |  t(id, name, "key", levels, files) ORDER BY id""".stripMargin,

      "s4_clean" -> {
        val base =
          """SELECT o_orderkey,
            |  CASE WHEN o_orderkey % 11 = 0 THEN TIMESTAMP '1750-06-15 00:00:00'
            |       ELSE o_orderdate END AS ts_raw,
            |  o_orderpriority ||
            |    CASE WHEN o_orderkey % 13 = 0 THEN chr(7) ELSE '' END ||
            |    CASE WHEN o_orderkey % 17 = 0 THEN '–' ELSE '' END AS str_raw,
            |  printf('POINT(%.2f %.2f)',
            |         (o_orderkey % 360)::DOUBLE / 4.0 - 45.0 + 0.25,
            |         (o_orderkey % 170)::DOUBLE / 2.0 - 42.5 + 0.25) AS wkt_raw
            |FROM orders""".stripMargin
        s"""WITH base AS ($base)
           |SELECT o_orderkey,
           |       ${CleanSql.repairTimestamp("ts_raw")} AS ts_clean,
           |       ${CleanSql.cleanString("str_raw")} AS str_clean,
           |       ${CleanSql.shiftWkt("wkt_raw")} AS wkt_clean
           |FROM base ORDER BY o_orderkey""".stripMargin
      },

      "s4_clean_geometry" ->
        s"""WITH base AS ($MixedWktBaseSql)
           |SELECT o_orderkey, wkt_raw,
           |       ${CleanSql.shiftWkt("wkt_raw")} AS wkt_clean
           |FROM base ORDER BY o_orderkey""".stripMargin,

      // general-geometry envelope + vertex-centroid accessors over the
      // SHIFTED mixed fixture: plain-text rows NULL-propagate out of the
      // envelope predicate, exactly as in the Spark expressions
      "geo_envelope" -> {
        import graft.functions.GeoOpsSql
        s"""WITH base AS ($MixedWktBaseSql),
           |e AS (SELECT o_orderkey,
           |             ${CleanSql.shiftWkt("wkt_raw")} AS ewkt
           |      FROM base)
           |SELECT o_orderkey,
           |       round(${GeoOpsSql.stXMin("ewkt")}, 6) AS xmin,
           |       round(${GeoOpsSql.stXMax("ewkt")}, 6) AS xmax,
           |       round(${GeoOpsSql.stYMin("ewkt")}, 6) AS ymin,
           |       round(${GeoOpsSql.stYMax("ewkt")}, 6) AS ymax,
           |       ${GeoOpsSql.stNPoints("ewkt")} AS n_points
           |FROM e
           |WHERE ${GeoOpsSql.stEnvelopeIntersects(
                     "ewkt", 160.0, -45.0, 200.0, 10.0)}
           |ORDER BY o_orderkey""".stripMargin
      },

      "geo_centroid" -> {
        import graft.functions.GeoOpsSql
        s"""WITH base AS ($MixedWktBaseSql),
           |e AS (SELECT o_orderkey,
           |             ${CleanSql.shiftWkt("wkt_raw")} AS ewkt
           |      FROM base)
           |SELECT o_orderkey,
           |       round(${GeoOpsSql.stCentroidX("ewkt")}, 6) AS cx,
           |       round(${GeoOpsSql.stCentroidY("ewkt")}, 6) AS cy,
           |       ${GeoOpsSql.stNPoints("ewkt")} AS n_points
           |FROM e
           |WHERE ${GeoOpsSql.stNPoints("ewkt")} IS NOT NULL
           |ORDER BY o_orderkey""".stripMargin
      },

      // the build summary: envelope extraction AND the cell-grid
      // arithmetic (floor, pack base 2^21, coord limit 2^20-1, 64-cell
      // oversize cap) restated directly over the fixture — a wrong cell
      // id, a dropped geometry, or a misclassified oversize row moves
      // n_rows / n_oversize / cell_checksum
      "geo_cell_build" -> {
        import graft.functions.GeoOpsSql
        s"""WITH base AS ($MixedWktBaseSql),
           |e AS (SELECT o_orderkey AS id,
           |             ${CleanSql.shiftWkt("wkt_raw")} AS ewkt
           |      FROM base),
           |env AS (SELECT id,
           |               ${GeoOpsSql.stXMin("ewkt")} AS xmin,
           |               ${GeoOpsSql.stXMax("ewkt")} AS xmax,
           |               ${GeoOpsSql.stYMin("ewkt")} AS ymin,
           |               ${GeoOpsSql.stYMax("ewkt")} AS ymax
           |        FROM e),
           |b AS (SELECT id,
           |        CAST(floor(xmin / 4.0) AS BIGINT) AS cx0,
           |        CAST(floor(xmax / 4.0) AS BIGINT) AS cx1,
           |        CAST(floor(ymin / 4.0) AS BIGINT) AS cy0,
           |        CAST(floor(ymax / 4.0) AS BIGINT) AS cy1
           |      FROM env
           |      WHERE xmin IS NOT NULL AND ymin IS NOT NULL),
           |cls AS (SELECT *,
           |          (abs(cx0) > 1048575 OR abs(cx1) > 1048575 OR
           |           abs(cy0) > 1048575 OR abs(cy1) > 1048575 OR
           |           (cx1 - cx0 + 1) * (cy1 - cy0 + 1) > 64) AS oversize
           |        FROM b),
           |gx AS (SELECT id, unnest(generate_series(cx0, cx1)) AS cx,
           |              cy0, cy1
           |       FROM cls WHERE NOT oversize),
           |grid AS (SELECT id,
           |           cx * 2097152 + unnest(generate_series(cy0, cy1))
           |             AS cell
           |         FROM gx)
           |SELECT (SELECT count(*) FROM grid)
           |       + (SELECT count(*) FROM cls WHERE oversize) AS n_rows,
           |       (SELECT count(*) FROM cls) AS n_geoms,
           |       (SELECT count(*) FROM cls WHERE oversize) AS n_oversize,
           |       (SELECT CAST(sum(cell) AS BIGINT) FROM grid)
           |         AS cell_checksum""".stripMargin
      },

      // the index must be invisible: the oracle filters the geometry
      // directly, no cells anywhere
      "geo_cell_probe" -> {
        import graft.functions.GeoOpsSql
        s"""WITH base AS ($MixedWktBaseSql),
           |e AS (SELECT o_orderkey AS id,
           |             ${CleanSql.shiftWkt("wkt_raw")} AS ewkt
           |      FROM base)
           |SELECT id FROM e
           |WHERE ${GeoOpsSql.stEnvelopeIntersects(
                     "ewkt", 160.0, -45.0, 200.0, 10.0)}
           |ORDER BY id""".stripMargin
      },

      "geo_cell_knn" -> {
        import graft.functions.GeoOpsSql
        s"""WITH base AS ($MixedWktBaseSql),
           |e AS (SELECT o_orderkey AS id,
           |             ${CleanSql.shiftWkt("wkt_raw")} AS ewkt
           |      FROM base),
           |env AS (SELECT id,
           |               ${GeoOpsSql.stXMin("ewkt")} AS xmin,
           |               ${GeoOpsSql.stXMax("ewkt")} AS xmax,
           |               ${GeoOpsSql.stYMin("ewkt")} AS ymin,
           |               ${GeoOpsSql.stYMax("ewkt")} AS ymax
           |        FROM e),
           |d AS (SELECT id, sqrt(dx * dx + dy * dy) AS dist
           |      FROM (SELECT id,
           |              greatest(xmin - 180.0, 180.0 - xmax, 0.0) AS dx,
           |              greatest(ymin - (-20.0), (-20.0) - ymax, 0.0) AS dy
           |            FROM env WHERE xmin IS NOT NULL))
           |SELECT id, round(dist, 6) AS dist
           |FROM d ORDER BY dist, id LIMIT 15""".stripMargin
      },

      "geo_cell_join" -> {
        import graft.functions.GeoOpsSql
        s"""WITH base AS ($MixedWktBaseSql),
           |e AS (SELECT o_orderkey AS id,
           |             ${CleanSql.shiftWkt("wkt_raw")} AS ewkt
           |      FROM base),
           |env AS (SELECT id,
           |               ${GeoOpsSql.stXMin("ewkt")} AS xmin,
           |               ${GeoOpsSql.stXMax("ewkt")} AS xmax,
           |               ${GeoOpsSql.stYMin("ewkt")} AS ymin,
           |               ${GeoOpsSql.stYMax("ewkt")} AS ymax
           |        FROM e)
           |SELECT a.id AS id_a, b.id AS id_b
           |FROM env a JOIN env b
           |  ON a.id < b.id
           | AND a.xmin <= b.xmax AND a.xmax >= b.xmin
           | AND a.ymin <= b.ymax AND a.ymax >= b.ymin
           |ORDER BY id_a, id_b""".stripMargin
      },

      // EWKT accessors restated via the same regexp grammar (no spatial
      // extension needed); the construction is s4_clean's WKT arm
      "geo_point_accessors" -> {
        import graft.functions.GeoOpsSql
        val base =
          """SELECT o_orderkey,
            |  printf('POINT(%.2f %.2f)',
            |         (o_orderkey % 360)::DOUBLE / 4.0 - 45.0 + 0.25,
            |         (o_orderkey % 170)::DOUBLE / 2.0 - 42.5 + 0.25) AS wkt_raw
            |FROM orders WHERE o_orderkey < 3000""".stripMargin
        s"""WITH base AS ($base),
           |e AS (SELECT o_orderkey,
           |             ${CleanSql.shiftWkt("wkt_raw")} AS ewkt
           |      FROM base)
           |SELECT o_orderkey, ${GeoOpsSql.stSrid("ewkt")} AS srid,
           |       round(${GeoOpsSql.stX("ewkt")}, 6) AS x,
           |       round(${GeoOpsSql.stY("ewkt")}, 6) AS y
           |FROM e ORDER BY o_orderkey""".stripMargin
      },

      "geo_bbox_filter" -> {
        import graft.functions.GeoOpsSql
        val base =
          """SELECT o_orderkey,
            |  printf('POINT(%.2f %.2f)',
            |         (o_orderkey % 360)::DOUBLE / 4.0 - 45.0 + 0.25,
            |         (o_orderkey % 170)::DOUBLE / 2.0 - 42.5 + 0.25) AS wkt_raw
            |FROM orders""".stripMargin
        s"""WITH base AS ($base),
           |e AS (SELECT o_orderkey,
           |             ${CleanSql.shiftWkt("wkt_raw")} AS ewkt
           |      FROM base)
           |SELECT o_orderkey,
           |       round(${GeoOpsSql.stX("ewkt")}, 6) AS x,
           |       round(${GeoOpsSql.stY("ewkt")}, 6) AS y
           |FROM e
           |WHERE ${GeoOpsSql.stWithinBBox("ewkt", 150.0, -20.0, 170.0, 0.0)}
           |ORDER BY o_orderkey""".stripMargin
      },

      "geo_nearest" -> {
        import graft.functions.GeoOpsSql
        val probe = "'SRID=4167;POINT(160.000000 -41.000000)'"
        val base =
          """SELECT o_orderkey,
            |  printf('POINT(%.2f %.2f)',
            |         (o_orderkey % 360)::DOUBLE / 4.0 - 45.0 + 0.25,
            |         (o_orderkey % 170)::DOUBLE / 2.0 - 42.5 + 0.25) AS wkt_raw
            |FROM orders""".stripMargin
        s"""WITH base AS ($base),
           |e AS (SELECT o_orderkey,
           |             ${CleanSql.shiftWkt("wkt_raw")} AS ewkt
           |      FROM base)
           |SELECT o_orderkey,
           |       round(${GeoOpsSql.stDistance("ewkt", probe)}, 6) AS dist
           |FROM e ORDER BY round(${GeoOpsSql.stDistance("ewkt", probe)}, 6),
           |               o_orderkey
           |LIMIT 10""".stripMargin
      },

      // the full LDS profile restated through the independent DuckDB
      // rendering over the IDENTICAL fixture code points (sqlLit)
      "s4_clean_lds" -> {
        val caseSql = "(CASE CAST(doc_id % 8 AS INTEGER) " +
          LdsCleanFixture.zipWithIndex.map { case (str, i) =>
            s"WHEN $i THEN ${CleanSql.sqlLit(str)}"
          }.mkString(" ") + " END)"
        s"""SELECT doc_id,
           |       ${CleanSql.cleanString(caseSql, Clean.ldsConfig)} AS cleaned
           |FROM documents WHERE doc_id < 400 ORDER BY doc_id""".stripMargin
      },

      "f10_detail_codec" ->
        """SELECT * FROM (VALUES
          |  ('pab1', '2016-06-01 17:12:25',
          |   'BdeUpload pab1 2016-06-01 17:12:25 xaud 2016-06-01 17:12:46'),
          |  ('xaud', '2016-06-01 17:12:46',
          |   'BdeUpload pab1 2016-06-01 17:12:25 xaud 2016-06-01 17:12:46'))
          |  t(file, end_time, details)""".stripMargin,

      "l5_continuity" ->
        """SELECT * FROM (VALUES
          |  (1, 'ok'), (2, 'warn'), (3, 'fail'), (4, 'ok'))
          |  t(case_id, result) ORDER BY case_id""".stripMargin,

      // the key-swap increment: I=1 (key 4), U=1 (key 2 as X), D=1 (key 1
      // repaired in despite not being in the change table)
      "j5_keyswap_orchestrated" ->
        """SELECT * FROM (VALUES
          |  ('20220101000000', '0', 't_uniq', 'loaded', 3, 0, 0, 0),
          |  ('20220202000000', '5', 't_uniq', 'loaded', 1, 1, 0, 1))
          |  t(dataset, level, table_name, status,
          |    ninsert, nupdate, nnullupdate, ndelete)
          |ORDER BY dataset""".stripMargin,

      "j5_keyswap_final" ->
        """SELECT * FROM (VALUES
          |  (2, 'D', 'y2'), (3, 'C', 'z'), (4, 'A', 'n4'))
          |  t(id, code, v) ORDER BY id""".stripMargin,

      // warn=1h/fail=5h over a 4-increment chain: no check vs the L0, a 2h
      // gap warns, a 12h gap fails, the next increment error-skips
      "l5_continuity_gate" ->
        """SELECT * FROM (VALUES
          |  ('20210101000000', '0', 't_gap', 'loaded',  false),
          |  ('20210201000000', '5', 't_gap', 'loaded',  false),
          |  ('20210301000000', '5', 't_gap', 'loaded',  true),
          |  ('20210401000000', '5', 't_gap', 'failed',  false),
          |  ('20210501000000', '5', 't_gap', 'skipped', false))
          |  t(dataset, level, table_name, status, warned)
          |ORDER BY dataset""".stripMargin,

      "x8_finish_dsl" ->
        """SELECT * FROM (VALUES
          |  (0, true), (1, false), (2, true), (3, false), (4, false), (5, true))
          |  t(stmt_idx, fires) ORDER BY stmt_idx""".stripMargin,

      "x8_hook_order" ->
        """SELECT * FROM (VALUES
          |  (0, 'postupload', 'bde_postupload_a_refresh'),
          |  (1, 'postupload', 'bde_postupload_c_vacuum'),
          |  (2, 'postlevel0', 'bde_postlevel0_z_index'))
          |  t(ord, phase, hook) ORDER BY ord""".stripMargin,

      "x8_event_template" ->
        """SELECT * FROM (VALUES
          |  (1, 'notify 7 20170629000000 level 5 keep {nope}'))
          |  t(case_id, expanded)""".stripMargin,

      // S8: the stats changelog is append-only (every record an 'I'), one
      // record per recorded dataset load of the e2e scenario
      "s8_publication_log" ->
        """SELECT * FROM (VALUES
          |  ('I', 1, '20200101000000', '0', 3, 0, 0, 0),
          |  ('I', 2, '20200101000000', '0', 2, 0, 0, 0),
          |  ('I', 3, '20200202000000', '5', 1, 1, 0, 0),
          |  ('I', 4, '20200303000000', '5', 0, 0, 1, 1))
          |  t(op, id, dataset, type, ninsert, nupdate, nnullupdate, ndelete)
          |ORDER BY id""".stripMargin,

      // the subscriber sees the job's lifecycle: created active, finished
      // with status E (the scenario's poisoned beta table fails the job)
      "s8_publication_stream" ->
        """SELECT * FROM (VALUES
          |  ('I', 1, 'bde', 'A'),
          |  ('U', 1, 'bde', 'E'))
          |  t(op, id, schema_name, status) ORDER BY op""".stripMargin,

      // replaying the changelog reproduces the live watermarks: alpha's
      // last load is the second increment, beta's the level 0 (its first
      // increment was poisoned, the second error-skipped), locks released
      "s8_publication_replay" ->
        """SELECT * FROM (VALUES
          |  (1, 't_alpha', 1, '20200303000000', '5', '20200101000000', true,  -1),
          |  (2, 't_beta',  1, '20200101000000', '0', '20200101000000', false, -1))
          |  t(id, table_name, last_upload_id, last_upload_dataset,
          |    last_upload_type, last_level0_dataset, last_upload_incremental,
          |    upl_id_lock)
          |ORDER BY id""".stripMargin,

      "c9_dry_run" ->
        """SELECT * FROM (VALUES
          |  ('20200101000000', '0', 't_alpha', 'dry-run', '', 0),
          |  ('20200101000000', '0', 't_beta',  'dry-run', '', 0),
          |  ('20200202000000', '5', 't_alpha', 'dry-run', '', 0),
          |  ('20200202000000', '5', 't_beta',  'dry-run', '', 0),
          |  ('20200303000000', '5', 't_alpha', 'dry-run', '', 0),
          |  ('20200303000000', '5', 't_beta',  'dry-run', '', 0),
          |  ('20200404000000', '5', 't_alpha', 'dry-run', 'missing: xchg', 0),
          |  ('20200404000000', '5', 't_beta',  'dry-run', 'missing: xchg', 0))
          |  t(dataset, level, table_name, status, note, uploads_after)
          |ORDER BY dataset, table_name""".stripMargin,

      "c9_timeout" ->
        """SELECT * FROM (VALUES
          |  ('beyond_limit', true, 'job timeout exceeded'),
          |  ('disabled', false, ''),
          |  ('within_limit', false, ''))
          |  t(case_id, timed_out, message)
          |ORDER BY case_id""".stripMargin,

      "x8_event_fire" ->
        """SELECT * FROM (VALUES
          |  (1, 'start', 'notify-start 7', 0),
          |  (2, 'start_dataset', 'ds-hook 20200101000000 L0 job 7', 0),
          |  (3, 'error', 'alert 7', 3))
          |  t(seq, event, command, exit_status)
          |ORDER BY seq""".stripMargin,

      "x8_config_layering" ->
        """SELECT * FROM (VALUES
          |  ('base', 'dbname=linz_db'),
          |  ('interpolated_heredoc', 'SET search_path to bde, public'),
          |  ('test_beats_ext', 'dbname=the_test_db'),
          |  ('test_overlay', 'dbname=the_test_db'),
          |  ('with_ext', 'dbname=nonexist_override'))
          |  t(layer, db_connection)
          |ORDER BY layer""".stripMargin,

      "q6_revenue_filter" ->
        """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
          |FROM lineitem
          |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          |  AND l_shipdate < TIMESTAMP '1997-01-01'
          |  AND l_discount >= 0.05 AND l_discount <= 0.07
          |  AND l_quantity < 24""".stripMargin,

      "q3_top_orders" ->
        """SELECT o_orderkey,
          |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
          |FROM customer
          |JOIN orders ON c_custkey = o_custkey
          |JOIN lineitem ON o_orderkey = l_orderkey
          |WHERE c_mktsegment = 'BUILDING'
          |  AND o_orderdate < TIMESTAMP '1998-01-01'
          |  AND l_shipdate > TIMESTAMP '1998-01-01'
          |GROUP BY o_orderkey
          |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin
    ).map { case (k, v) => k -> OracleSql.materializeCtes(v) }
  }
}
