package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed Lloyd's k-means over an `array<float>` embedding column —
 * the TRAINED partitioner the IVF index and SemDeDup clustering leave a
 * seam for ([[Similarity.ivfTopK]], [[Dedup.semDedup]] both assign to
 * deterministic seed centroids and document that "a trained-k-means
 * partitioner would swap in without changing the plan"; this is that
 * partitioner).
 *
 * Each round is the classic two-step, kept fully relational:
 *  - ASSIGN: centroids are driver-held literals (k×d doubles — broadcast
 *    by value into the plan), so assignment is one MAP-SIDE projection:
 *    k sequential-fold squared-L2 distances per row, argmin by
 *    (distance, cluster) struct ordering. Zero shuffle.
 *  - UPDATE: one `posexplode` + one map-side-combined aggregation per
 *    round — the shuffle carries (cluster, dim, partial sum, partial
 *    count), at most k×d×partitions rows, never the vectors. The k×d
 *    result collects to the driver for the next round's literals: the
 *    same bounded-collect contract as [[Similarity.collectSeeds]].
 *
 * Determinism (what makes a cross-engine oracle possible at all):
 *  - means accumulate in INTEGER micro-units — each component contributes
 *    `floor(x * 2^20)` as a BIGINT, and integer sums are associative, so
 *    the mean is bit-identical in ANY partitioning or grouping order
 *    (a double-sum mean would drift with Spark's reduction order and
 *    could flip a borderline assignment next round);
 *  - the mean divides in a FIXED order, (sum / count) / 2^20, each step
 *    an exact-input double op, reproduced verbatim by the SQL oracle;
 *  - seeds are the k lowest-id vectors, ties on distance break to the
 *    lowest cluster index, and empty clusters keep their centroid.
 */
object KMeans {

  /** Micro-unit quantization for the centroid means (2^20). */
  val Quant = 1L << 20

  /** Sequential-fold squared L2 distance of `v` (float elements, widened
    * to double per element) against a literal centroid — the native
    * [[graft.plans.SqDistExpr]], bit-identical to the higher-order fold it
    * replaced (pinned in OperatorsSpec) but JIT'd: assignment evaluates k
    * of these per row, and interpreted lambdas dominated the trainer's
    * map-side cost. */
  private def sqDist(v: Column, c: Array[Double]): Column =
    graft.functions.VectorOps.sqDist(v, typedLit(c.toSeq))

  /** (cid, v, cluster): each row labelled with the index of its nearest
    * centroid — distance ties break to the lowest index via (d, cl)
    * struct min. Map-side only. */
  def assign(
      df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    val scored = centroids.toIndexedSeq.zipWithIndex.map { case (c, i) =>
      struct(sqDist(col(vecCol), c).as("d"), lit(i).as("cl"))
    }
    df.select(
      col(idCol).cast("long").as("cid"), col(vecCol).as("v"),
      array_min(array(scored: _*)).getField("cl").as("cluster"))
  }

  /** The deterministic initial centroids: the k LOWEST-id vectors, each
    * element cast to double (exact for float inputs; identity for the
    * double residual vectors IVF-PQ trains on). */
  def seedCentroids(
      df: DataFrame, idCol: String, vecCol: String, k: Int): Array[Array[Double]] =
    df.orderBy(col(idCol)).limit(k)
      .select(col(vecCol).cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)

  /**
   * `iters` Lloyd rounds from the seed centroids; returns the trained
   * centroids. One assignment projection + one (cluster, dim) aggregation
   * per round; the per-round driver collect is exactly k×d small rows.
   */
  def train(
      df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): Array[Array[Double]] = {
    var cents = seedCentroids(df, idCol, vecCol, k)
    // fail here with the real cause, not an IndexOutOfBounds mid-round from
    // Array.tabulate(k) below when the input holds fewer than k vectors
    require(cents.length == k,
      s"kmeans: k=$k but input has only ${cents.length} vectors")
    val dim = cents.headOption.map(_.length).getOrElse(0)
    require(dim > 0, "kmeans: zero-dimensional input vectors")
    for (_ <- 0 until iters) {
      val parts = assign(df, idCol, vecCol, cents)
        .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cluster"), col("pos"))
        .agg(
          sum(floor(col("x").cast("double") * Quant).cast("long")).as("sq"),
          count(lit(1)).as("n"))
        .collect()
      val next = Array.tabulate(k)(i => cents(i).clone()) // empty keeps old
      parts.foreach { r =>
        val (cl, pos) = (r.getInt(0), r.getInt(1))
        // fixed op order (sum / count) / Quant — mirrored by the oracle
        next(cl)(pos) = r.getLong(2).toDouble / r.getLong(3).toDouble / Quant.toDouble
      }
      cents = next
    }
    cents
  }

  /** Sequential-fold squared L2 distance between two vector COLUMNS
    * (native, see [[sqDist]]). */
  private def sqDistCols(a: Column, b: Column): Column =
    graft.functions.VectorOps.sqDist(a, b)

  /**
   * IVF top-k over TRAINED cells — the seam [[Similarity.ivfTopK]]
   * documents ("a trained-k-means partitioner would swap in"), exercised:
   * the corpus partitions into `kClusters` trained L2 cells, each query
   * probes its `nprobe` nearest cells (map-side literal arithmetic, like
   * the assignment), and exact squared-L2 top-k runs on the candidates
   * co-located by cluster id. Ranking orders by (distance ASC, neighbor
   * ASC) — a total order, deterministic cross-engine because every
   * distance is the same sequential double fold on both sides.
   */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      kClusters: Int, iters: Int, nprobe: Int, k: Int): DataFrame =
    ivfTopKWithCentroids(train(corpus, idCol, vecCol, kClusters, iters),
      corpus, queries, idCol, vecCol, nprobe, k)

  /** [[ivfTopK]] over ALREADY-trained centroids — train once, probe at
    * several nprobe settings (e.g. an approximate arm and the all-cells
    * exact reference of a recall gauge) without repeating the Lloyd
    * rounds. */
  def ivfTopKWithCentroids(
      cents: Array[Array[Double]],
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      nprobe: Int, k: Int): DataFrame = {
    val assigned = assign(corpus, idCol, vecCol, cents)
    val scored = cents.toIndexedSeq.zipWithIndex.map { case (c, i) =>
      struct(sqDist(col(vecCol), c).as("d"), lit(i).as("cl"))
    }
    val probes = queries.select(
      col(idCol).cast("long").as("query_id"), col(vecCol).as("qv"),
      explode(slice(array_sort(array(scored: _*)), 1, nprobe)).as("pr"))
      .select(col("query_id"), col("qv"), col("pr.cl").as("cluster"))
    // (l2sq asc, id asc) via the BOUNDED top-k aggregate — ≤ k state
    // entries per query per map task; a per-query row_number window would
    // funnel the query's whole probed candidate set (corpus/nlist-sized)
    // into one unsplittable task. Negation of raw doubles is exact, so
    // the order and the emitted distances are bit-identical.
    val top = Similarity.topKUdaf(k)
    probes.join(assigned, Seq("cluster"))
      .where(col("cid") =!= col("query_id"))
      .select(col("query_id"), col("cid").as("neighbor_id"),
        sqDistCols(col("qv"), col("v")).as("l2sq"))
      .groupBy(col("query_id"))
      .agg(top(-col("l2sq"), col("neighbor_id")).as("top"))
      .select(col("query_id"), explode(col("top.items")).as("e"))
      .select(col("query_id"), col("e._2").as("neighbor_id"),
        (-col("e._1")).as("l2sq"))
  }

  /** Trained centroids as a DataFrame: (cluster, pos, centroid). */
  def centroidsDF(
      df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    train(df, idCol, vecCol, k, iters).zipWithIndex
      .flatMap { case (c, cl) =>
        c.zipWithIndex.map { case (v, pos) => (cl.toLong, pos.toLong, v) }
      }.toSeq.toDF("cluster", "pos", "centroid")
  }
}

/**
 * DuckDB rendering of the SAME k-means contract by INDEPENDENT mechanics:
 * assignment is a cross join + row_number argmin (vs Spark's map-side
 * struct-array min), the update is unnest + generate_subscripts (vs
 * posexplode), and centroid lists rebuild with an ordered list() aggregate.
 * Only the arithmetic CONTRACT is shared — quantized integer sums, the
 * (sum / count) / 2^20 division order, sequential-fold distances — which
 * is what makes the comparison exact rather than approximate.
 */
object KMeansSql {

  private def dist(v: String, c: String): String =
    s"list_reduce(list_transform(range(1, len($v)+1), " +
      s"i -> ($v[i] - $c[i]) * ($v[i] - $c[i])), (a, b) -> a + b)"

  /** CTE chain ending in centroids `${p}c$iters` (cl, c) and assignment
    * `${p}a${iters}` (vec_id, v, cl) against the trained centroids. The
    * optional `p` prefix namespaces the chain so several independent
    * trainings compose in one query (product quantization trains one chain
    * per subspace). */
  def ctes(table: String, vecId: String, vecCol: String,
      k: Int, iters: Int, p: String = ""): String = {
    val e =
      s"""${p}e AS (SELECT $vecId AS vec_id,
         |       list_transform($vecCol, x -> x::DOUBLE) AS v FROM $table),
         |${p}c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cl, v AS c
         |       FROM (SELECT vec_id, v FROM ${p}e ORDER BY vec_id LIMIT $k))""".stripMargin
    val rounds = (0 until iters).map { i =>
      s"""${p}a$i AS (SELECT vec_id, v, cl FROM (
         |  SELECT ${p}e.vec_id, ${p}e.v, ${p}c$i.cl,
         |         row_number() OVER (PARTITION BY ${p}e.vec_id
         |                            ORDER BY ${dist(s"${p}e.v", s"${p}c$i.c")}, ${p}c$i.cl) AS rn
         |  FROM ${p}e CROSS JOIN ${p}c$i) WHERE rn = 1),
         |${p}u$i AS (SELECT cl, pos, (sum(q)::DOUBLE / count(*)::DOUBLE) / ${KMeans.Quant}.0 AS cv
         |        FROM (SELECT cl, generate_subscripts(v, 1) - 1 AS pos,
         |                     floor(unnest(v) * ${KMeans.Quant})::BIGINT AS q
         |              FROM ${p}a$i)
         |        GROUP BY cl, pos),
         |${p}c${i + 1} AS (SELECT ${p}c$i.cl, coalesce(u.c, ${p}c$i.c) AS c
         |     FROM ${p}c$i LEFT JOIN (SELECT cl, list(cv ORDER BY pos) AS c
         |                         FROM ${p}u$i GROUP BY cl) u USING (cl))""".stripMargin
    }
    val finalAssign =
      s"""${p}a$iters AS (SELECT vec_id, v, cl FROM (
         |  SELECT ${p}e.vec_id, ${p}e.v, ${p}c$iters.cl,
         |         row_number() OVER (PARTITION BY ${p}e.vec_id
         |                            ORDER BY ${dist(s"${p}e.v", s"${p}c$iters.c")}, ${p}c$iters.cl) AS rn
         |  FROM ${p}e CROSS JOIN ${p}c$iters) WHERE rn = 1)""".stripMargin
    (e +: rounds :+ finalAssign).mkString(",\n")
  }

  /** Sequential-fold squared L2 distance between two list expressions —
    * the shared arithmetic contract, exposed for composing renderings
    * (product quantization's lookup tables reuse it). */
  def distSql(v: String, c: String): String = dist(v, c)

  /** Trained centroids, exploded: (cluster, pos, centroid). */
  def centroids(table: String, vecId: String, vecCol: String,
      k: Int, iters: Int): String =
    s"""WITH ${ctes(table, vecId, vecCol, k, iters)}
       |SELECT CAST(cl AS BIGINT) AS cluster,
       |       CAST(generate_subscripts(c, 1) - 1 AS BIGINT) AS pos,
       |       round(unnest(c), 6) AS centroid
       |FROM c$iters ORDER BY cluster, pos""".stripMargin

  /** Final assignment: (vec_id, cluster). */
  def assignment(table: String, vecId: String, vecCol: String,
      k: Int, iters: Int): String =
    s"""WITH ${ctes(table, vecId, vecCol, k, iters)}
       |SELECT vec_id, CAST(cl AS BIGINT) AS cluster
       |FROM a$iters ORDER BY vec_id""".stripMargin

  /** Trained-cell IVF top-k: (query_id, neighbor_id, l2sq). `queryPred`
    * selects the query rows (e.g. "vec_id < 8"). */
  def ivfTopK(table: String, vecId: String, vecCol: String,
      k: Int, iters: Int, nprobe: Int, topK: Int, queryPred: String): String =
    s"""WITH ${ctes(table, vecId, vecCol, k, iters)},
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE $queryPred),
       |probes AS (SELECT query_id, qv, cl FROM (
       |  SELECT q.query_id, q.qv, c$iters.cl,
       |         row_number() OVER (PARTITION BY q.query_id
       |                            ORDER BY ${dist("q.qv", s"c$iters.c")}, c$iters.cl) AS rn
       |  FROM q CROSS JOIN c$iters) WHERE rn <= $nprobe),
       |cand AS (SELECT p.query_id, a.vec_id AS neighbor_id,
       |                ${dist("p.qv", "a.v")} AS l2sq
       |         FROM probes p JOIN a$iters a USING (cl)
       |         WHERE a.vec_id <> p.query_id)
       |SELECT query_id, neighbor_id, round(l2sq, 6) AS l2sq FROM (
       |  SELECT query_id, neighbor_id, l2sq,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY l2sq, neighbor_id) AS rnk
       |  FROM cand)
       |WHERE rnk <= $topK ORDER BY query_id, neighbor_id""".stripMargin

  /** Trained-cell SemDeDup survivors: ids NOT dropped as the higher side
    * of a same-trained-cluster pair with cosine >= `minCosine`. The
    * cosine runs over a$iters.v — the exact double widening of the float
    * embeddings, the same per-element cast the Spark expression applies. */
  def semDedup(table: String, vecId: String, vecCol: String,
      k: Int, iters: Int, minCosine: Double): String =
    s"""WITH ${ctes(table, vecId, vecCol, k, iters)},
       |drops AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM a$iters a JOIN a$iters b
       |    ON a.cl = b.cl AND a.vec_id < b.vec_id
       |  WHERE ${graft.functions.VectorOpsSql.cosine("a.v", "b.v")} >= $minCosine)
       |SELECT $vecId AS vec_id FROM $table
       |WHERE $vecId NOT IN (SELECT vec_id FROM drops)
       |ORDER BY vec_id""".stripMargin
}
