package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Distributed top principal direction by POWER ITERATION — the dominant
 * right singular vector of the (uncentered) embedding matrix A, i.e. the
 * direction maximizing Σ(x·v)² (Mises & Pollaczek-Geiringer 1929; the
 * standard first step of embedding whitening / anisotropy removal, e.g.
 * Mu & Viswanath 2018 "All-but-the-Top", arXiv:1702.01417).
 *
 *   v_{t+1} ∝ AᵀA v_t, computed per round as w = Σ_rows (x·v_t)·x
 *
 * Scale posture (100 TB of vectors, d dims, p rounds):
 *  - the per-row dot x·v_t is a MAP-SIDE fold against the literal v_t
 *    (zero shuffle — v is d doubles, broadcast inside the plan);
 *  - each round's matvec is ONE aggregation of (dim → partial sum): the
 *    posexplode fans each row into d (dim, contribution) pairs, but
 *    map-side partial aggregation reduces every task to ≤ d rows before
 *    the shuffle — wire cost O(tasks·d) per round, never corpus-sized;
 *  - p rounds = p bounded Spark jobs; the driver holds only d doubles.
 *
 * Cross-engine bit-exactness contract (the k-means/PQ house rule): a
 * double Σ over rows is combine-order dependent, so each row's
 * contribution quantizes to integer MICRO-UNITS — floor((x·dot)·2²⁰) as
 * BIGINT — and the shuffle sums INTEGERS (associative → identical under
 * any partitioning). The per-row dot and the per-round normalization are
 * fixed-order left folds over d terms, identical in both engines.
 * `scale` must satisfy rows · d · max|x|² · scale < 2⁶³ — at 10¹² rows
 * drop scale to 2¹⁰ (precision loss ~2⁻¹⁰ per contribution is far below
 * power iteration's own convergence tolerance).
 */
object Pca {

  /** Map-side dot of a vector column against a literal direction — a
    * fixed-order left fold over d terms (mirrors the SQL list_reduce). */
  private def dotLit(vecCol: String, v: Array[Double]) =
    aggregate(
      zip_with(col(vecCol), typedlit(v), (a, b) => a * b),
      lit(0.0), (acc, x) => acc + x)

  /** The final iterate as driver doubles (unit 2-norm). */
  def topComponentVector(
      df: DataFrame,
      vecCol: String,
      dim: Int,
      iters: Int = 3,
      scale: Long = 1L << 20): Array[Double] = {
    require(dim > 0 && iters > 0, "pca: dim and iters must be positive")
    // ragged input fails LOUDLY up front: a longer vector would make
    // posexplode emit __j >= dim (driver ArrayIndexOutOfBounds), a shorter
    // one nulls its zip_with dot and silently drops the row from the
    // matvec — a wrong component with no error. limit(1) short-circuits
    // the scan on the first offender.
    val ragged = df.where(size(col(vecCol)) =!= dim || col(vecCol).isNull)
      .limit(1).count()
    require(ragged == 0L,
      s"pca: input contains null or non-$dim-element vectors — ragged " +
        "input would crash or silently skew the component")
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    for (_ <- 1 to iters) {
      val dotc = dotLit(vecCol, v)
      val rows = df
        .select(col(vecCol), dotc.as("__dot"))
        .select(posexplode(col(vecCol)).as(Seq("__j", "__x")), col("__dot"))
        .groupBy(col("__j"))
        .agg(sum(floor((col("__x").cast("double") * col("__dot")) *
          lit(scale.toDouble))).as("__w"))
        .collect()
      val w = new Array[Double](dim)
      rows.foreach(r => w(r.getInt(0)) = r.getLong(1).toDouble)
      // fixed-order left fold of the squares — mirrors the SQL list_reduce
      val norm = math.sqrt(w.map(t => t * t).reduceLeft(_ + _))
      require(norm > 0.0, "pca: zero matvec — degenerate input")
      v = w.map(_ / norm)
    }
    v
  }

  /** (dim, loading) rows, 1-based dims, loadings rounded to 6 decimals. */
  def topComponent(
      spark: SparkSession,
      df: DataFrame,
      vecCol: String,
      dim: Int,
      iters: Int = 3,
      scale: Long = 1L << 20): DataFrame = {
    val v = topComponentVector(df, vecCol, dim, iters, scale)
    import spark.implicits._
    v.zipWithIndex.map { case (x, i) => ((i + 1).toLong, x) }.toSeq
      .toDF("dim", "loading")
      .select(col("dim"), round(col("loading"), 6).as("loading"))
      .orderBy(col("dim"))
  }

  /** Top `k` principal directions by DEFLATION: power-iterate, project
    * the component out ([[removeComponent]]), repeat on the residual —
    * each round is the same bounded-wire matvec loop, so k components
    * cost k× the single-component plan (k·iters bounded jobs total; the
    * driver holds k·d doubles). The float re-quantization between rounds
    * is the same storage contract the ABTT path uses. */
  def topComponents(
      df: DataFrame,
      vecCol: String,
      dim: Int,
      k: Int,
      iters: Int = 3,
      scale: Long = 1L << 20): Seq[Array[Double]] = {
    require(k > 0, "pca: k must be positive")
    val (comps, _) = (1 to k).foldLeft(
      (Vector.empty[Array[Double]], df.select(col(vecCol).as("__v")))) {
      case ((acc, cur), _) =>
        val v = topComponentVector(cur, "__v", dim, iters, scale)
        val next = removeComponent(cur, "__v", v)
          .select(col("corrected").as("__v"))
        (acc :+ v, next)
    }
    comps
  }

  /** All-but-the-top correction (Mu & Viswanath 2018): remove the
    * projection onto the dominant direction, x′ = x − (x·v)v, as a pure
    * MAP-SIDE transform against the literal v — zero shuffle, scan speed.
    * The corrected vector re-quantizes to FLOAT (IEEE round-to-nearest,
    * identical in every engine) — the storage type embeddings persist at
    * anyway, and what keeps the downstream native cosine on its codegen'd
    * float path. */
  def removeComponent(
      df: DataFrame,
      vecCol: String,
      v: Array[Double]): DataFrame =
    df.withColumn("__d", dotLit(vecCol, v))
      .withColumn("corrected",
        zip_with(col(vecCol), typedlit(v),
          (x, vj) => (x.cast("double") - col("__d") * vj).cast("float")))
      .drop("__d")
}

/** DuckDB rendering of [[Pca.topComponent]]: the same fixed-order folds
  * and integer micro-unit sums, iterations unrolled as CTE chains. */
object PcaSql {

  private def lf(arr: String): String =
    s"list_reduce($arr, (a, b) -> a + b)"

  private def dotOn(vExpr: String): String =
    lf(s"list_transform(range(1, len(emb)+1), i -> emb[i]::DOUBLE * $vExpr[i])")

  /** The power-iteration CTE chain over a CTE `src(… , emb)`, ending at
    * `${p}v$iters(v)`; `p` namespaces the intermediate CTEs so chains
    * compose (deflation runs a second chain over the corrected CTE). */
  private def chain(
      dim: Int, iters: Int, scale: Long,
      p: String = "", src: String = "e"): String = {
    val v0 = (1.0 / math.sqrt(dim.toDouble)).toString
    val v0lit = s"[${Seq.fill(dim)(s"CAST($v0 AS DOUBLE)").mkString(", ")}]"
    (1 to iters).map { k =>
      val dotExpr =
        if (k == 1) dotOn(v0lit)
        else dotOn(s"${p}v${k - 1}.v")
      val from =
        if (k == 1) s"FROM $src"
        else s"FROM $src, ${p}v${k - 1}"
      s"""${p}d$k AS (SELECT emb, $dotExpr AS dot $from),
         |${p}u$k AS (SELECT generate_subscripts(emb, 1) AS j,
         |               unnest(emb) AS x, dot FROM ${p}d$k),
         |${p}w$k AS (SELECT j, SUM(CAST(floor((x::DOUBLE * dot) * $scale.0)
         |                           AS BIGINT)) AS w
         |        FROM ${p}u$k GROUP BY j),
         |${p}n$k AS (SELECT list(CAST(w AS DOUBLE) ORDER BY j) AS wl
         |            FROM ${p}w$k),
         |${p}v$k AS (SELECT list_transform(wl,
         |          t -> t / sqrt(${lf(s"list_transform(wl, t -> t * t)")}))
         |          AS v FROM ${p}n$k)""".stripMargin
    }.mkString(",\n")
  }

  /** Mirror of the deflated SECOND component
    * (`Pca.topComponents(...)(1)`): chain one on the raw vectors, the
    * x − (x·v)v projection re-quantized to FLOAT (the same storage
    * contract the Scala rounds use), chain two over the corrected CTE. */
  def secondComponent(
      table: String,
      vecCol: String,
      dim: Int,
      iters: Int = 3,
      scale: Long = 1L << 20): String =
    s"""WITH e AS (SELECT $vecCol AS emb FROM $table),
       |${chain(dim, iters, scale)},
       |dd AS (SELECT emb, ${dotOn(s"v$iters.v")} AS d FROM e, v$iters),
       |e2 AS (SELECT list_transform(range(1, $dim + 1),
       |         i -> (emb[i]::DOUBLE - d * v[i])::FLOAT) AS emb
       |       FROM dd, v$iters),
       |${chain(dim, iters, scale, p = "f", src = "e2")}
       |SELECT CAST(j AS BIGINT) AS dim, round(v[j], 6) AS loading
       |FROM fv$iters, (SELECT unnest(range(1, $dim + 1)) AS j)
       |ORDER BY dim""".stripMargin

  def topComponent(
      table: String,
      vecCol: String,
      dim: Int,
      iters: Int = 3,
      scale: Long = 1L << 20): String =
    s"""WITH e AS (SELECT $vecCol AS emb FROM $table),
       |${chain(dim, iters, scale)}
       |SELECT CAST(j AS BIGINT) AS dim, round(v[j], 6) AS loading
       |FROM v$iters, (SELECT unnest(range(1, $dim + 1)) AS j)
       |ORDER BY dim""".stripMargin

  /** Mirror of the [[Pca.removeComponent]] + top-k composition: the same
    * chain, the same x − (x·v)v projection re-quantized to FLOAT, ranked
    * by corrected cosine against the corrected probe. */
  def abttTopK(
      table: String,
      idCol: String,
      vecCol: String,
      dim: Int,
      probeId: Long,
      k: Int,
      iters: Int = 3,
      scale: Long = 1L << 20): String = {
    val cos = graft.functions.VectorOpsSql.cosine("c.cv", "q.qv")
    s"""WITH e AS (SELECT $idCol AS id, $vecCol AS emb FROM $table),
       |${chain(dim, iters, scale)},
       |dd AS (SELECT id, emb, ${dotOn(s"v$iters.v")} AS d
       |       FROM e, v$iters),
       |corr AS (SELECT id, list_transform(range(1, $dim + 1),
       |           i -> (emb[i]::DOUBLE - d * v[i])::FLOAT) AS cv
       |         FROM dd, v$iters),
       |q AS (SELECT cv AS qv FROM corr WHERE id = $probeId)
       |SELECT c.id AS neighbor_id, round($cos, 6) AS cosine
       |FROM corr c, q
       |WHERE c.id <> $probeId
       |ORDER BY cosine DESC, neighbor_id LIMIT $k""".stripMargin
  }
}
