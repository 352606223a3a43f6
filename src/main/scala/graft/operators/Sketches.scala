package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/**
 * Count-min sketch frequency estimation with its accuracy gauge — the
 * mergeable point-query sketch (Cormode & Muthukrishnan 2005, "An improved
 * data stream summary: the count-min sketch and its applications", J.
 * Algorithms 55) for token frequencies at corpus scale:
 *
 *  - the sketch is a fixed `d × w` counter grid (`w = ⌈2/ε⌉`,
 *    `d = ⌈ln(1/δ)⌉`) updated map-side and merged ASSOCIATIVELY — Spark's
 *    `count_min_sketch` aggregate ships one partial grid per task, so the
 *    wire cost is O(tasks · d·w) regardless of corpus size (the exact
 *    count's shuffle is vocabulary-sized — unbounded);
 *  - point queries guarantee `exact ≤ est ≤ exact + ε·N` with probability
 *    ≥ 1−δ per probe (one-sided error: CMS NEVER underestimates).
 *
 * Like `profile_approx_distinct`'s HLL gauge, the oracle-facing result is
 * the EXACT count plus a within-bound flag (slack× the ε·N bound, so a
 * flip means a broken sketch, not an unlucky hash): at 100 TB the exact
 * arm drops and the gauge is what licenses the swap.
 */
object Sketches {

  /** Per probe token: exact corpus frequency + the CMS-vs-exact bound
    * flag. Probes absent from the corpus count 0 (and must estimate 0 —
    * CMS has no false negatives to subtract). The sketch, the token
    * total, and every probe's exact count ride ONE aggregate over ONE
    * corpus scan (a probe's exact count is a conditional partial sum —
    * |probes| extra counters per task, not a second tokenization pass);
    * everything downstream is driver arithmetic on that single row. */
  def cmsTokenGauge(
      df: DataFrame,
      textCol: String,
      probes: Seq[String],
      eps: Double = 0.005,
      confidence: Double = 0.99,
      seed: Int = 42,
      slack: Double = 5.0): DataFrame = {
    require(probes.nonEmpty, "cmsTokenGauge: empty probe set")
    require(probes.distinct.size == probes.size,
      "cmsTokenGauge: duplicate probes")
    val spark = df.sparkSession
    val sorted = probes.sorted
    val toks = df.select(
      explode(TextOps.tokens(col(textCol))).as("token"))
    val aggs = Seq(
      expr(s"count_min_sketch(token, CAST($eps AS DOUBLE), " +
        s"CAST($confidence AS DOUBLE), $seed)").as("cms"),
      count(lit(1)).as("n")) ++
      sorted.zipWithIndex.map { case (p, i) =>
        sum(when(col("token") === p, 1L).otherwise(0L)).as(s"__x$i")
      }
    val row = toks.agg(aggs.head, aggs.tail: _*).head()
    // an empty token stream aggregates to a NULL sketch (the Bloom-gate
    // lesson): every probe then estimates — and counts — zero
    val cms = if (row.isNullAt(0)) None
      else Some(org.apache.spark.util.sketch.CountMinSketch
        .readFrom(row.getAs[Array[Byte]](0)))
    val bound = math.ceil(eps * row.getLong(1) * slack).toLong
    import spark.implicits._
    sorted.zipWithIndex.map { case (p, i) =>
      val exact = if (row.isNullAt(2 + i)) 0L else row.getLong(2 + i)
      val est = cms.map(_.estimateCount(p)).getOrElse(0L)
      (p, exact, est >= exact && est <= exact + bound)
    }.toDF("token", "exact_count", "cms_ok")
  }

  // ---- KMV (k-minimum-values / bottom-k) distinct-count sketch ---------
  //
  // Bar-Yossef et al. 2002 ("Counting distinct elements in a data
  // stream"), the bottom-k form underlying the theta-sketch family: keep
  // the k SMALLEST distinct hash values; with v_k the k-th smallest over
  // a hash space of size S, the distinct count estimates (k−1)·S / v_k
  // (unbiased, σ ≈ n/√(k−2)). Unlike HLL registers the state is plain
  // rows of BIGINT — trivially persisted, audited, and merged in SQL —
  // and the MERGE IS EXACT: the bottom-k of a union is computable from
  // the per-part bottom-k sets alone, so release-over-release cardinality
  // maintenance never rescans an old release's documents.

  /** Hash space size of [[TextOps.wideFingerprint]] (values in
    * [0, HashMod²)); the double is shared verbatim by the SQL rendering
    * so both engines' estimate arithmetic is bit-identical. */
  val KmvSpace: Double = TextOps.HashMod.toDouble * TextOps.HashMod.toDouble

  /** The bottom-k sketch of a column: k smallest DISTINCT 62-bit hashes,
    * one `fp` column. Scale shape: the distinct is an 8-byte-key shuffle;
    * the bottom-k is `orderBy(fp).limit(k)` — map-side top-k per task +
    * a driver-side k-way merge (TakeOrdered), never a global sort. */
  def kmvSketch(df: DataFrame, valueCol: Column, k: Int): DataFrame = {
    require(k >= 2, "kmv: k >= 2")
    df.select(TextOps.wideFingerprint(valueCol).as("fp"))
      .distinct().orderBy(col("fp")).limit(k)
  }

  /** Estimate row from a sketch (or a union of sketches): when fewer than
    * `k` hashes exist the stream's distinct count IS the sketch size
    * (exact); otherwise (k−1)·S / v_k. One tiny aggregate. */
  def kmvEstimate(sketch: DataFrame, k: Int): DataFrame =
    sketch.agg(count(lit(1)).as("n_sketch"), max(col("fp")).as("v_k"))
      .select(col("n_sketch"), col("v_k"),
        round(when(col("n_sketch") < k, col("n_sketch").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(KmvSpace) /
            col("v_k").cast("double")), 6).as("est_distinct"))

  /** Persist one release's bottom-k under `path/release=<n>` — k rows of
    * BIGINT, the at-rest cardinality ledger (blind per-release append,
    * like every index family's ingest loop). */
  def writeKmv(df: DataFrame, valueCol: Column, k: Int, path: String,
      release: Int): Unit =
    kmvSketch(df, valueCol, k).coalesce(1)
      .write.mode("overwrite").parquet(s"$path/release=$release")

  /** Merged estimate over every persisted release: union the (tiny)
    * per-release bottom-k sets, re-take the bottom-k, estimate — EQUAL to
    * the pooled-corpus sketch by the KMV merge theorem, without touching
    * any release's documents again. */
  def kmvIndexedEstimate(spark: SparkSession, path: String,
      k: Int): DataFrame =
    kmvEstimate(
      spark.read.parquet(path).select(col("fp"))
        .distinct().orderBy(col("fp")).limit(k), k)
}
