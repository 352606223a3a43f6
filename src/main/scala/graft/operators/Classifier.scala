package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/**
 * Distributed TRAINER for the hashed linear quality classifier — the
 * training loop behind [[graft.functions.QualityOps.classifierScore]]'s
 * inference shape (fastText-style document classification: Joulin et al.
 * 2017, "Bag of Tricks for Efficient Text Classification", reduced to the
 * binary quality case a curation pipeline needs: label a small set of
 * docs good/bad, train, score the corpus).
 *
 * Model: margin(d) = (Σ_tokens wUnits[cell(h)] + biasUnits) / S where
 * cell(h) = (h·MULT) mod B — exactly the inference path's feature
 * hashing — squashed by the RATIONAL sigmoid p = ½ + ½·m/(1+|m|). The
 * rational squash (only + · / and |·|) replaces 1/(1+e^-m)
 * deliberately: libm `exp` differs in the last ulp across engines, while
 * this trains bit-identically in Spark and the DuckDB oracle. It is the
 * same monotone (0,1) S-curve with heavier tails; for a keep/drop
 * classifier the decision boundary (margin sign) is what matters.
 *
 * Full-batch gradient descent, one round = one Spark job:
 *
 *  - weights live in LONG MICRO-UNITS (S = 2^20 units per 1.0), so every
 *    distributed sum in the loop — the per-doc margin, the per-cell
 *    gradient, the bias gradient — is an EXACT integer aggregate:
 *    combine-order independent, bit-identical cross-engine (the same move
 *    as [[KMeans]]/[[Pca]]);
 *  - per-doc residuals r = p − y quantize to rq = ⌊r·S⌋ map-side; the
 *    cell gradient is `explode(cells) → groupBy(cell).sum(rq)` — at most
 *    B+1 distinct keys, so map-side partial aggregation collapses each
 *    task's contribution to ≤ B+1 rows regardless of corpus size, and the
 *    collect is B+1 rows per round (driver-bounded, like the k×d
 *    centroid collect);
 *  - the update w −= ⌊g·lrNum / (lrDen·n)⌋ runs driver-side in a fixed
 *    cell order. Exactness bound: |g·lrNum| must stay under 2^53 (true
 *    through ~8·10^15 residual-units of mass per cell — beyond that,
 *    switch lrDen to a power of two and divide in pure long arithmetic).
 *
 * Scale: B is driver-bounded (default 4096; the weight table rides the
 * margin expression — broadcast territory only beyond ~10⁶ cells). The
 * corpus never reaches the driver; labels are just a column.
 */
object Classifier {

  /** Micro-units per 1.0 of weight/residual. */
  val Scale: Long = 1L << 20
  /** Feature-cell multiplier — the inference path's
    * ([[graft.functions.QualityOps.ClassifierMult]]). */
  val Mult: Long = 2654435761L

  /** Trained model: per-cell weight units (size B) + bias units. */
  final case class Model(wUnits: Array[Long], biasUnits: Long) {
    def buckets: Int = wUnits.length
  }

  /** Exact integer margin units of a token-hash array under `model`. */
  private def marginUnits(thash: Column, model: Model): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.HashCellSumExpr(
      ColumnBridge.expression(thash), model.wUnits, Mult)) + model.biasUnits
  }

  /** The rational sigmoid ½ + ½·m/(1+|m|) of a margin-units column —
    * fixed operation order, one unit→double conversion. */
  private def squash(mUnits: Column): Column = {
    val m = mUnits.cast("double") / lit(Scale.toDouble)
    lit(0.5) + lit(0.5) * (m / (lit(1.0) + abs(m)))
  }

  /**
   * Train `iters` rounds on (`textCol`, `labelCol` ∈ {0,1}) with learning
   * rate lrNum/lrDen. Deterministic: same data → bit-identical model,
   * any partitioning.
   */
  def train(
      df: DataFrame,
      textCol: String,
      labelCol: String,
      buckets: Int = 4096,
      iters: Int = 3,
      lrNum: Long = 1L,
      lrDen: Long = 1L): Model = {
    require(buckets >= 2 && iters >= 0 && lrNum > 0 && lrDen > 0,
      "classifier: buckets >= 2, iters >= 0, positive learning rate")
    val b = buckets.toLong
    val base = df.select(
        TextOps.tokenHashes(TextOps.tokens(col(textCol))).as("__thash"),
        col(labelCol).cast("long").as("__y"))
      .cache()
    val n = base.count()
    require(n > 0, "classifier: empty training set")
    var model = Model(new Array[Long](buckets), 0L)
    for (_ <- 1 to iters) {
      val scored = base.select(col("__thash"),
        floor((squash(marginUnits(col("__thash"), model))
          - col("__y").cast("double")) * lit(Scale.toDouble))
          .cast("long").as("__rq"))
      // cell gradient rows ∪ one bias row per doc (cell = B, outside the
      // hash range) — ONE aggregate, ≤ B+1 groups, map-side combined
      val cells = scored
        .select(col("__rq"), explode(col("__thash")).as("__h"))
        .select(col("__rq"), pmod(col("__h") * lit(Mult), lit(b)).as("__cell"))
        .unionByName(scored.select(col("__rq"), lit(b).as("__cell")))
      val grad = cells.groupBy(col("__cell"))
        .agg(sum(col("__rq")).as("__g"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val w = model.wUnits.clone()
      var j = 0
      while (j < buckets) {
        val g = grad.getOrElse(j.toLong, 0L)
        w(j) -= math.floor((g * lrNum).toDouble / (lrDen * n).toDouble).toLong
        j += 1
      }
      val gBias = grad.getOrElse(b, 0L)
      model = Model(w,
        model.biasUnits -
          math.floor((gBias * lrNum).toDouble / (lrDen * n).toDouble).toLong)
    }
    base.unpersist()
    model
  }

  /** Score documents under a trained model: exact margin units, the
    * squashed probability (6 decimals), and the keep decision
    * (margin ≥ 0) — one map-side projection, no shuffle. A null text
    * yields a null margin/keep (the [[graft.plans.HashCellSumExpr]]
    * contract: corrupt upstream data poisons its row visibly rather
    * than scoring as empty). */
  def score(
      df: DataFrame,
      idCol: String,
      textCol: String,
      model: Model): DataFrame = {
    val mU = marginUnits(
      TextOps.tokenHashes(TextOps.tokens(col(textCol))), model)
    df.select(col(idCol),
      mU.as("margin_units"),
      round(squash(mU), 6).as("p_keep"))
      .withColumn("keep", col("margin_units") >= 0L)
  }
}

/** DuckDB renderings of [[Classifier]] for the correctness oracle: the
  * training loop unrolls to `iters` CTE levels (margins → quantized
  * residuals → cell gradients → updated weights), an independent SQL
  * formulation of the same integer micro-unit arithmetic. Expects a
  * `cdocs(doc_id, y, th)` CTE (token-hash arrays) in scope. */
object ClassifierSql {
  import Classifier.{Mult, Scale}

  private def d(v: String) = s"CAST($v AS DOUBLE)"

  /** ½ + ½·m/(1+|m|) of a margin-units expression — every literal cast to
    * DOUBLE (DuckDB parses bare decimals as DECIMAL, whose exact
    * arithmetic would diverge from Spark's doubles). */
  private def squash(mu: String): String = {
    val m = s"(${d(s"$mu")} / ${d(Scale.toString)})"
    s"(${d("0.5")} + ${d("0.5")} * ($m / (${d("1.0")} + abs($m))))"
  }

  /**
   * CTE levels `cn, cexp, w0, b0, m1, r1, g1, w1, b1, …, w<iters>,
   * b<iters>`: `w<i>`/`b<i>` hold the weight/bias units after round i
   * (w sparse — absent cells are zero, exactly the dense array's zeros).
   */
  def trainCtes(buckets: Int, iters: Int, lrNum: Long, lrDen: Long): String = {
    val b = buckets
    val header = Seq(
      s"cn AS (SELECT count(*) AS n FROM cdocs)",
      s"""cexp AS (SELECT doc_id, (h * $Mult) % $b AS cell
         |         FROM (SELECT doc_id, unnest(th) AS h FROM cdocs))""".stripMargin,
      s"w0 AS (SELECT CAST(NULL AS BIGINT) AS cell, CAST(NULL AS BIGINT) AS w WHERE FALSE)",
      s"b0 AS (SELECT CAST(0 AS BIGINT) AS bu)")
    val levels = (1 to iters).map { i =>
      val p = i - 1
      s"""m$i AS (SELECT d.doc_id, d.y,
         |          COALESCE(s.mu, 0) + (SELECT bu FROM b$p) AS mu
         |        FROM cdocs d LEFT JOIN (
         |          SELECT e.doc_id, SUM(w.w) AS mu
         |          FROM cexp e JOIN w$p w ON w.cell = e.cell
         |          GROUP BY e.doc_id) s ON s.doc_id = d.doc_id),
         |r$i AS (SELECT doc_id,
         |          CAST(floor((${squash("mu")} - ${d("y")})
         |               * ${d(Scale.toString)}) AS BIGINT) AS rq
         |        FROM m$i),
         |g$i AS (SELECT cell, SUM(rq) AS g FROM (
         |          SELECT e.cell, r.rq FROM cexp e
         |            JOIN r$i r ON r.doc_id = e.doc_id
         |          UNION ALL SELECT $b AS cell, rq FROM r$i)
         |        GROUP BY cell),
         |w$i AS (SELECT COALESCE(w.cell, g.cell) AS cell,
         |          COALESCE(w.w, 0) - COALESCE(CAST(floor(
         |            ${d(s"(g.g * $lrNum)")} /
         |            ${d(s"($lrDen * (SELECT n FROM cn))")}) AS BIGINT), 0) AS w
         |        FROM w$p w FULL OUTER JOIN
         |          (SELECT cell, g FROM g$i WHERE cell < $b) g
         |          ON w.cell = g.cell),
         |b$i AS (SELECT (SELECT bu FROM b$p) - COALESCE(
         |          (SELECT CAST(floor(${d(s"(g * $lrNum)")} /
         |            ${d(s"($lrDen * (SELECT n FROM cn))")}) AS BIGINT)
         |           FROM g$i WHERE cell = $b), 0) AS bu)""".stripMargin
    }
    (header ++ levels).mkString(",\n")
  }

  /** Margin units of an arbitrary (doc_id, th) source CTE under the final
    * weights — the scoring join reusable over any doc set, not just the
    * training one. Emits `SELECT doc_id, margin_units FROM ...`. */
  def marginOver(src: String, buckets: Int, iters: Int): String = {
    val mu = s"CAST(COALESCE(s.mu, 0) + (SELECT bu FROM b$iters) AS BIGINT)"
    s"""SELECT d.doc_id, $mu AS margin_units
       |FROM $src d LEFT JOIN (
       |  SELECT e.doc_id, SUM(w.w) AS mu FROM (
       |    SELECT doc_id, (h * $Mult) % $buckets AS cell
       |    FROM (SELECT doc_id, unnest(th) AS h FROM $src)) e
       |  JOIN w$iters w ON w.cell = e.cell
       |  GROUP BY e.doc_id) s ON s.doc_id = d.doc_id""".stripMargin
  }

  /** Margin-units + scored columns of `cdocs` under the final weights.
    * (DuckDB's SUM over BIGINT yields HUGEINT — cast back so the output
    * schema matches Spark's long margin.) */
  def scoreSelect(buckets: Int, iters: Int): String = {
    val mu = s"CAST(COALESCE(s.mu, 0) + (SELECT bu FROM b$iters) AS BIGINT)"
    s"""SELECT d.doc_id,
       |       $mu AS margin_units,
       |       round(${squash(mu)}, 6) AS p_keep,
       |       $mu >= 0 AS keep
       |FROM cdocs d LEFT JOIN (
       |  SELECT e.doc_id, SUM(w.w) AS mu
       |  FROM cexp e JOIN w$iters w ON w.cell = e.cell
       |  GROUP BY e.doc_id) s ON s.doc_id = d.doc_id""".stripMargin
  }
}
