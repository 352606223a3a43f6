package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/**
 * Product quantization for approximate nearest neighbor search (Jégou,
 * Douze & Schmid 2011, "Product Quantization for Nearest Neighbor
 * Search", TPAMI 33(1) — §II product quantizer, §III asymmetric distance
 * computation / ADC): the vector space splits into `m` orthogonal
 * subspaces, each subspace trains its own `ksub`-centroid codebook
 * ([[KMeans]] — the deterministic micro-unit Lloyd trainer), and every
 * corpus vector compresses to `m` small codes — at `m=8, ksub=256` that
 * is 8 bytes per vector instead of `4·d`, the compression that lets a
 * billion-vector index live in executor memory.
 *
 * Search is ASYMMETRIC distance: the query stays exact; its distance to a
 * code is the sum over subspaces of (query subvector → assigned centroid)
 * distances. Spark geometry:
 *
 *  - TRAIN: `m` independent Lloyd trainings over SLICED vectors —
 *    map-side assignment against literal centroids, one (cluster, dim)
 *    aggregate per round ([[KMeans.train]]'s contract); codebooks are
 *    `m × ksub × dsub` doubles on the driver (tiny, bounded);
 *  - ENCODE: one map-side projection — `m × ksub` native `SqDistExpr`
 *    evaluations per row, argmin by (distance, code) struct order; the
 *    corpus never shuffles, and the code table that does move downstream
 *    is ids + `m` bytes per row;
 *  - LOOKUP TABLE: per query, `m × ksub` exact subvector→centroid
 *    distances, QUANTIZED to integer micro-units (`floor(d · 2^20)` as
 *    BIGINT) so the ADC sum is an ASSOCIATIVE integer fold — bit-identical
 *    under any partial-aggregation order, which is what makes a
 *    cross-engine oracle possible (a double sum would drift with Spark's
 *    combine order). The table is `queries × m × ksub` rows and
 *    BROADCASTS;
 *  - ADC: the exploded code stream (vec_id, subspace, code — ints only)
 *    joins the broadcast table and one map-side-combinable
 *    `sum` + per-query top-k window ranks by (quantized distance,
 *    neighbor id) — a total order, deterministic cross-engine.
 *
 * The quantization floor loses < 2^-20 per subspace term — an ADC RANKING
 * device, not a distance estimate; ranks agree with exact ADC unless two
 * candidates are within `m · 2^-20` squared-L2 of each other.
 */
object Pq {

  /** `m` codebooks of `ksub` centroids each — the independent per-subspace
    * Lloyd trainings FUSED into one Spark job per round: assignment
    * computes all m argmins map-side in one projection, and a single
    * (subspace, cluster, dim) aggregation carries every subspace's update
    * (the shuffle is m × ksub × dsub × partitions rows — the same volume
    * as ONE full-dimension k-means round, m× fewer jobs than training the
    * subspaces serially). Arithmetic is exactly [[KMeans.train]]'s
    * contract per subspace — integer micro-unit sums, (sum / count) /
    * 2^20 division order, lowest-id seeds, empty clusters keep their
    * centroid — so results are bit-identical to the serial formulation
    * (and to the oracle's per-subspace chains). Requires `dim % m == 0`. */
  def trainCodebooks(
      df: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, iters: Int): Array[Array[Array[Double]]] = {
    val dim = df.select(size(col(vecCol)).as("d")).limit(1).collect()
      .headOption.map(_.getInt(0))
      .getOrElse(throw new IllegalArgumentException("pq: empty input"))
    require(dim % m == 0, s"pq: dim $dim not divisible into $m subspaces")
    val dsub = dim / m
    // one seed collect for every subspace: the ksub lowest-id vectors,
    // sliced (identical to seeding each subspace separately)
    val seeds = df.orderBy(col(idCol)).limit(ksub)
      .select(col(vecCol).cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    require(seeds.length == ksub,
      s"pq: ksub=$ksub but input has only ${seeds.length} vectors")
    var books: Array[Array[Array[Double]]] =
      Array.tabulate(m)(j => seeds.map(v => v.slice(j * dsub, (j + 1) * dsub)))
    for (_ <- 0 until iters) {
      val assignCols: Seq[Column] = (0 until m).map { j =>
        val scored = books(j).toIndexedSeq.zipWithIndex.map { case (c, i) =>
          struct(
            VectorOps.sqDist(slice(col(vecCol), j * dsub + 1, dsub),
              typedLit(c.toSeq)).as("d"),
            lit(i).as("cl"))
        }
        array_min(array(scored: _*)).getField("cl")
      }
      val parts = df
        .select(col(vecCol).as("__v"), array(assignCols: _*).as("__cls"))
        .select(col("__v"), posexplode(col("__cls")).as(Seq("sub", "cluster")))
        .select(col("sub"), col("cluster"),
          posexplode(slice(col("__v"), col("sub") * lit(dsub) + lit(1),
            lit(dsub))).as(Seq("pos", "x")))
        .groupBy(col("sub"), col("cluster"), col("pos"))
        .agg(
          sum(floor(col("x").cast("double") * KMeans.Quant).cast("long")).as("sq"),
          count(lit(1)).as("n"))
        .collect()
      val next = Array.tabulate(m)(j => books(j).map(_.clone())) // empty keeps old
      parts.foreach { r =>
        val (s, cl, pos) = (r.getInt(0), r.getInt(1), r.getInt(2))
        // fixed op order (sum / count) / Quant — the KMeans contract
        next(s)(cl)(pos) =
          r.getLong(3).toDouble / r.getLong(4).toDouble / KMeans.Quant.toDouble
      }
      books = next
    }
    books
  }

  /** (vec_id, [carry...,] codes) — each vector's per-subspace
    * nearest-codeword index, computed map-side against literal codebooks;
    * `carry` columns pass through unchanged (IVF-PQ keeps the coarse cell
    * id alongside the codes). */
  def encode(
      df: DataFrame, idCol: String, vecCol: String,
      books: Array[Array[Array[Double]]],
      carry: Seq[String] = Nil): DataFrame = {
    val dsub = books(0)(0).length
    val codeCols: Seq[Column] = books.toIndexedSeq.zipWithIndex.map {
      case (book, j) =>
        val scored = book.toIndexedSeq.zipWithIndex.map { case (c, i) =>
          struct(
            VectorOps.sqDist(slice(col(vecCol), j * dsub + 1, dsub),
              typedLit(c.toSeq)).as("d"),
            lit(i).as("cl"))
        }
        array_min(array(scored: _*)).getField("cl")
    }
    df.select(col(idCol).cast("long").as("vec_id") +:
      (carry.map(col) :+ array(codeCols: _*).as("codes")): _*)
  }

  /** Asymmetric-distance top-`k`: every query row (exact vectors) against
    * the PQ-encoded corpus. Returns (query_id, neighbor_id, adc_q) where
    * `adc_q` is the micro-unit integer ADC distance. Self-matches are
    * excluded. */
  def adcTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, iters: Int, k: Int): DataFrame = {
    val books = trainCodebooks(corpus, idCol, vecCol, m, ksub, iters)
    val dsub = books(0)(0).length
    val codes = encode(corpus, idCol, vecCol, books)
      .select(col("vec_id"),
        posexplode(col("codes")).as(Seq("sub", "code")))
    val entries: Seq[Column] = for {
      j <- 0 until m
      (c, i) <- books(j).toIndexedSeq.zipWithIndex
    } yield struct(
      lit(j).as("sub"), lit(i).as("code"),
      floor(VectorOps.sqDist(slice(col("qv"), j * dsub + 1, dsub),
        typedLit(c.toSeq)) * lit(KMeans.Quant.toDouble)).cast("long").as("qd"))
    val lut = queries
      .select(col(idCol).cast("long").as("query_id"), col(vecCol).as("qv"))
      .select(col("query_id"), explode(array(entries: _*)).as("e"))
      .select(col("query_id"), col("e.sub").as("sub"),
        col("e.code").as("code"), col("e.qd").as("qd"))
    rankTopK(codes.join(broadcast(lut), Seq("sub", "code"))
      .where(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("qd")).as("adc_q")), k)
  }

  /** Per-query top-`k` by (adc_q asc, id asc) via the BOUNDED aggregate —
    * ≤ k entries of state per query per map task, never a row_number
    * window over the query's candidate partition (corpus-sized at scale,
    * and a window partition can never be split). Negated integer ADC
    * distances fit a double exactly below 2^53, so the (−adc, id) order
    * is the (adc asc, id asc) total order, reconstructed exactly. */
  private[operators] def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val top = Similarity.topKUdaf(k)
    scored
      .groupBy(col("query_id"))
      .agg(top(-col("adc_q").cast("double"), col("vec_id")).as("top"))
      .select(col("query_id"), explode(col("top.items")).as("e"))
      .select(col("query_id"), col("e._2").as("neighbor_id"),
        (-col("e._1")).cast("long").as("adc_q"))
  }
}

/**
 * IVF-PQ — the composed billion-scale ANN index (Jégou et al. 2011 §V,
 * "IVFADC"; the FAISS `IndexIVFPQ` arrangement): a coarse k-means
 * quantizer partitions the corpus into cells, each vector stores only its
 * cell id + the PQ codes of its RESIDUAL (vector − cell centroid), and a
 * query probes its `nprobe` nearest cells, scoring candidates by
 * asymmetric distance against the QUERY residual per probed cell.
 * Residual coding is what makes PQ codes sharp at scale: residuals are
 * centered near zero, so the same `ksub` codewords cover them far more
 * densely than raw vectors.
 *
 * Spark geometry — every stage is the already-pinned shape:
 *  - coarse train + assign: [[KMeans]] (map-side literal-centroid argmin);
 *  - residuals: native [[graft.plans.VecSubExpr]] projection (no lambda,
 *    stays in whole-stage codegen), centroid picked from ONE literal
 *    `array<array<double>>` by cell id — zero shuffle;
 *  - PQ train on residuals + encode: [[Pq]] (codes + cell id per row);
 *  - search: the per-(query, probed-cell) lookup table is `nq × nprobe ×
 *    m × ksub` integer-quantized rows, BROADCAST; candidates join on
 *    (cell, subspace, code) — the IVF pruning is the join itself: vectors
 *    in unprobed cells never match, so the ADC aggregate sees only probed
 *    candidates. Integer micro-unit terms keep the sum associative and
 *    the (adc, id) rank a cross-engine total order.
 */
object IvfPq {

  /** (query_id, neighbor_id, adc_q): ADC top-`k` over the probed cells;
    * `adc_q` is the micro-unit integer asymmetric distance of the query
    * residual to the candidate's residual codes. Self-matches excluded. */
  def topK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      nCells: Int, m: Int, ksub: Int, iters: Int, nprobe: Int, k: Int): DataFrame = {
    val cents = KMeans.train(corpus, idCol, vecCol, nCells, iters)
    val centsLit = typedLit(cents.map(_.toSeq).toSeq)
    val assigned = KMeans.assign(corpus, idCol, vecCol, cents)
    // cached: PQ training makes m × (iters + 1) passes over the residual
    // table; released by the session-level cache clear between queries
    // (the Verify/Bench convention for operator-scoped intermediates). At
    // real scale the trainer runs on a sample and only the code table
    // persists — m bytes + a cell id per vector.
    val residuals = assigned.select(
      col("cid").as("vec_id"),
      VectorOps.vecSub(col("v"),
        element_at(centsLit, col("cluster") + 1)).as("res"),
      col("cluster"))
      .cache()
    val books = Pq.trainCodebooks(residuals, "vec_id", "res", m, ksub, iters)
    val dsub = books(0)(0).length
    val codes = Pq.encode(residuals, "vec_id", "res", books,
        carry = Seq("cluster"))
      .select(col("vec_id"), col("cluster"),
        posexplode(col("codes")).as(Seq("sub", "code")))
    val cellScore = cents.toIndexedSeq.zipWithIndex.map { case (c, i) =>
      struct(VectorOps.sqDist(col("qv"), typedLit(c.toSeq)).as("d"),
        lit(i).as("cl"))
    }
    val probes = queries
      .select(col(idCol).cast("long").as("query_id"), col(vecCol).as("qv"))
      .select(col("query_id"), col("qv"),
        explode(slice(array_sort(array(cellScore: _*)), 1, nprobe)).as("pr"))
      .select(col("query_id"), col("qv"), col("pr.cl").as("cluster"))
      .withColumn("qres", VectorOps.vecSub(col("qv"),
        element_at(centsLit, col("cluster") + 1)))
    val entries: Seq[Column] = for {
      j <- 0 until m
      (c, i) <- books(j).toIndexedSeq.zipWithIndex
    } yield struct(
      lit(j).as("sub"), lit(i).as("code"),
      floor(VectorOps.sqDist(slice(col("qres"), j * dsub + 1, dsub),
        typedLit(c.toSeq)) * lit(KMeans.Quant.toDouble)).cast("long").as("qd"))
    val lut = probes
      .select(col("query_id"), col("cluster"), explode(array(entries: _*)).as("e"))
      .select(col("query_id"), col("cluster"), col("e.sub").as("sub"),
        col("e.code").as("code"), col("e.qd").as("qd"))
    Pq.rankTopK(codes.join(broadcast(lut), Seq("cluster", "sub", "code"))
      .where(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("qd")).as("adc_q")), k)
  }

  // =====================================================================
  // At-rest IVF-PQ — the persisted form of the index above (FAISS
  // `IndexIVFPQ` written out: codes + coarse centroids + codebooks)
  // =====================================================================

  /** Residual-code rows of `df` against FIXED centroids + codebooks:
    * (vec_id, cluster, codes) — assignment, residual, and encoding are all
    * map-side literal-constant projections; nothing shuffles. */
  private def encodeRows(
      df: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Double]],
      books: Array[Array[Array[Double]]]): DataFrame = {
    val centsLit = typedLit(cents.map(_.toSeq).toSeq)
    val residuals = KMeans.assign(df, idCol, vecCol, cents).select(
      col("cid").as("vec_id"),
      VectorOps.vecSub(col("v"),
        element_at(centsLit, col("cluster") + 1)).as("res"),
      col("cluster"))
    Pq.encode(residuals, "vec_id", "res", books, carry = Seq("cluster"))
  }

  /**
   * Persist the IVF-PQ index AT REST — the 8-bytes-per-vector layout that
   * lets a billion-vector index live in storage: the code table
   * (vec_id, codes) written `partitionBy(cluster)` (one directory per
   * coarse cell, so probes partition-prune exactly like the raw-vector
   * [[Similarity.writeIvfIndex]]), with two driver-bounded companions —
   * `<path>.cells` (the coarse centroids) and `<path>.books` (the m × ksub
   * residual codebooks), the FAISS `IndexIVFPQ` trio of codes + coarse
   * quantizer + product quantizer.
   *
   * `train` is the FAISS `train(xt)` / `add(xb)` split: quantizers learn
   * from `train` (default: the base set itself — at 100 TB a sample), the
   * persisted codes cover `base`. Raw vectors are NOT stored: that is the
   * point of the compression, and the price — stated, not hidden — is that
   * re-training quantizers later means re-encoding from source data, and
   * probe results are ADC-approximate (gauge: `ann_pq_recall`).
   */
  def writeIvfPqIndex(
      base: DataFrame, idCol: String, vecCol: String, path: String,
      nCells: Int, m: Int, ksub: Int, iters: Int,
      train: Option[DataFrame] = None): Unit = {
    val tr = train.getOrElse(base)
    val cents = KMeans.train(tr, idCol, vecCol, nCells, iters)
    val centsLit = typedLit(cents.map(_.toSeq).toSeq)
    // codebooks train on the TRAIN set's residuals — exactly [[topK]]'s
    // training arrangement, so a probe over the persisted index reproduces
    // the in-session operator bit-for-bit when train == its corpus
    val trRes = KMeans.assign(tr, idCol, vecCol, cents).select(
      col("cid").as("vec_id"),
      VectorOps.vecSub(col("v"),
        element_at(centsLit, col("cluster") + 1)).as("res"),
      col("cluster"))
      .cache()
    val books = Pq.trainCodebooks(trRes, "vec_id", "res", m, ksub, iters)
    trRes.unpersist(blocking = false)
    Bucketing.writePartitioned(
      encodeRows(base, idCol, vecCol, cents, books), path, "cluster")
    val spark = base.sparkSession
    import spark.implicits._
    cents.toSeq.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
      .toDF("cluster", "c")
      .coalesce(1).write.mode("overwrite").parquet(s"$path.cells")
    (for { j <- books.indices; (c, i) <- books(j).zipWithIndex }
      yield (j, i, c.toSeq)).toDF("sub", "code", "c")
      .coalesce(1).write.mode("overwrite").parquet(s"$path.books")
  }

  // =====================================================================
  // OPQ pre-transform at rest — the FAISS "OPQ,IVF,PQ" index string:
  // a learned orthogonal rotation persisted as a FOURTH companion
  // (`<path>.rot`) beside codes/cells/books, applied map-side by every
  // door (build, append, probe) so the whole IVF-PQ machinery runs in
  // the rotated space. Rotations preserve L2, so probe results ARE
  // original-space neighbors; the rotation itself trains against the
  // flat-PQ objective ([[Opq.trainRotation]] — the FAISS OPQMatrix
  // arrangement, trained standalone and composed as a pre-transform).
  // =====================================================================

  /** [[writeIvfPqIndex]] with an OPQ pre-transform: the rotation writes
    * as `<path>.rot` and the quantizers/codes build over R·x. Pass the
    * identity to pin the plumbing (the `ann_opq_ivfpq_indexed` arm —
    * results must equal the un-rotated index bit for bit). */
  def writeIvfPqIndexRotated(
      base: DataFrame, idCol: String, vecCol: String, path: String,
      nCells: Int, m: Int, ksub: Int, iters: Int,
      rotation: Array[Array[Double]],
      train: Option[DataFrame] = None): Unit = {
    val spark = base.sparkSession
    import spark.implicits._
    rotation.zipWithIndex.map { case (row, i) => (i, row.toSeq) }.toSeq
      .toDF("i", "r")
      .coalesce(1).write.mode("overwrite").parquet(s"$path.rot")
    def rot(df: DataFrame) = df.select(col(idCol),
      Opq.rotate(col(vecCol), rotation).as("__rv"))
    writeIvfPqIndex(rot(base), idCol, "__rv", path, nCells, m, ksub,
      iters, train.map(rot))
  }

  /** The persisted rotation, when the index carries one — d rows of d
    * doubles, a driver-bounded collect like the other companions. */
  private def loadRotation(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Option[Array[Array[Double]]] = {
    val p = new org.apache.hadoop.fs.Path(s"$path.rot")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else Some(spark.read.parquet(s"$path.rot")
      .orderBy(col("i")).collect()
      .map(_.getSeq[Double](1).toArray))
  }

  /** Apply the index's persisted rotation (when present) to a probe or
    * append frame — the pre-transform every door shares. */
  private def applyRotation(
      df: DataFrame, idCol: String, vecCol: String,
      rot: Option[Array[Array[Double]]]): (DataFrame, String) = rot match {
    case None => (df, vecCol)
    case Some(r) =>
      (df.select(col(idCol), Opq.rotate(col(vecCol), r).as("__rv")), "__rv")
  }

  /** The persisted coarse centroids + codebooks — driver-bounded collects
    * (nCells and m × ksub rows). */
  private def loadQuantizers(
      spark: org.apache.spark.sql.SparkSession, path: String)
      : (Array[Array[Double]], Array[Array[Array[Double]]]) = {
    val cents = spark.read.parquet(s"$path.cells")
      .orderBy(col("cluster")).collect()
      .map(_.getSeq[Double](1).toArray)
    val bookRows = spark.read.parquet(s"$path.books").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val m = bookRows.map(_._1).max + 1
    val ksub = bookRows.map(_._2).max + 1
    val books = Array.ofDim[Array[Double]](m, ksub)
    bookRows.foreach { case (j, i, c) => books(j)(i) = c }
    (cents, books.map(_.toArray))
  }

  /** Fold a committed batch INTO the persisted index with FIXED quantizers
    * — the FAISS `IndexIVFPQ.add` semantics: vectors assign/encode against
    * the index's own persisted centroids and codebooks map-side and append
    * into their cell directories. Quantizer re-training is a separate
    * maintenance decision = a fresh [[writeIvfPqIndex]] over source data
    * (codes alone cannot be re-trained — the residual vectors are gone). */
  def appendIvfPqIndex(
      batch: DataFrame, idCol: String, vecCol: String, path: String): Unit = {
    val (cents, books) = loadQuantizers(batch.sparkSession, path)
    val (b, vc) = applyRotation(batch, idCol, vecCol,
      loadRotation(batch.sparkSession, path))
    Bucketing.appendPartitioned(
      encodeRows(b, idCol, vc, cents, books), path, "cluster")
  }

  /**
   * [[topK]] against the PERSISTED index: queries probe their `nprobe`
   * nearest persisted cells, the probed cell set becomes a
   * partition-pruning filter on the code scan (unprobed cells never read
   * from disk — `PartitionFilters`, plan-pinned), and candidates rank by
   * the same broadcast-LUT integer ADC. Result ≡ `IvfPq.topK(corpus, …)`
   * whenever the index was written from `corpus` with `train = corpus`
   * (pinned by the oracle): same quantizers, same codes, same arithmetic.
   */
  def topKIndexed(
      spark: org.apache.spark.sql.SparkSession,
      path: String, queries0: DataFrame, idCol: String, vecCol0: String,
      nprobe: Int, k: Int): DataFrame = {
    val (queries, vecCol) = applyRotation(queries0, idCol, vecCol0,
      loadRotation(spark, path))
    val (cents, books) = loadQuantizers(spark, path)
    val centsLit = typedLit(cents.map(_.toSeq).toSeq)
    val dsub = books(0)(0).length
    val m = books.length
    val cellScore = cents.toIndexedSeq.zipWithIndex.map { case (c, i) =>
      struct(VectorOps.sqDist(col("qv"), typedLit(c.toSeq)).as("d"),
        lit(i).as("cl"))
    }
    val probes = queries
      .select(col(idCol).cast("long").as("query_id"), col(vecCol).as("qv"))
      .select(col("query_id"), col("qv"),
        explode(slice(array_sort(array(cellScore: _*)), 1, nprobe)).as("pr"))
      .select(col("query_id"), col("qv"), col("pr.cl").as("cluster"))
      .withColumn("qres", VectorOps.vecSub(col("qv"),
        element_at(centsLit, col("cluster") + 1)))
      .cache()
    val probedCells = probes.select(col("cluster"))
      .distinct().collect().map(_.getInt(0))
    val codes = spark.read.parquet(path)
      .where(col("cluster").isin(probedCells.map(Int.box): _*))
      .select(col("vec_id"), col("cluster"),
        posexplode(col("codes")).as(Seq("sub", "code")))
    val entries: Seq[Column] = for {
      j <- 0 until m
      (c, i) <- books(j).toIndexedSeq.zipWithIndex
    } yield struct(
      lit(j).as("sub"), lit(i).as("code"),
      floor(VectorOps.sqDist(slice(col("qres"), j * dsub + 1, dsub),
        typedLit(c.toSeq)) * lit(KMeans.Quant.toDouble)).cast("long").as("qd"))
    val lut = probes
      .select(col("query_id"), col("cluster"), explode(array(entries: _*)).as("e"))
      .select(col("query_id"), col("cluster"), col("e.sub").as("sub"),
        col("e.code").as("code"), col("e.qd").as("qd"))
    val result = Pq.rankTopK(
      codes.join(broadcast(lut), Seq("cluster", "sub", "code"))
        .where(col("vec_id") =!= col("query_id"))
        .groupBy(col("query_id"), col("vec_id"))
        .agg(sum(col("qd")).as("adc_q")), k)
    CacheScope.unpersistAfterAction(result, Seq(probes))
  }
}

/** DuckDB rendering of [[Pq.adcTopK]] by independent mechanics (cross join
  * + row_number argmin per subspace vs Spark's map-side struct-array min;
  * unnest LUT vs broadcast join) sharing only the arithmetic contract:
  * micro-unit Lloyd rounds, sequential-fold distances, `floor(d · 2^20)`
  * integer ADC terms. */
object PqSql {

  def adcTopK(table: String, vecId: String, vecCol: String, dim: Int,
      m: Int, ksub: Int, iters: Int, topK: Int, queryPred: String): String = {
    require(dim % m == 0)
    val dsub = dim / m
    def sliceExpr(j: Int) = s"$vecCol[${j * dsub + 1}:${(j + 1) * dsub}]"
    val chains = (0 until m)
      .map(j => KMeansSql.ctes(table, vecId, sliceExpr(j), ksub, iters, s"s$j"))
      .mkString(",\n")
    val codes = (0 until m)
      .map(j => s"SELECT vec_id, $j AS sub, cl AS code FROM s${j}a$iters")
      .mkString("\n  UNION ALL ")
    val luts = (0 until m).map { j =>
      s"""SELECT q.query_id, $j AS sub, cb.cl AS code,
         |       floor(${KMeansSql.distSql(s"q.qv$j", "cb.c")} * ${KMeans.Quant}.0)::BIGINT AS qd
         |FROM q CROSS JOIN s${j}c$iters cb""".stripMargin
    }.mkString("\n  UNION ALL ")
    val qsubs = (0 until m)
      .map(j => s"list_transform(${sliceExpr(j)}, x -> x::DOUBLE) AS qv$j")
      .mkString(", ")
    s"""WITH $chains,
       |q AS (SELECT $vecId AS query_id, $qsubs FROM $table WHERE $queryPred),
       |codes AS (
       |  $codes),
       |lut AS (
       |  $luts),
       |d AS (SELECT query_id, vec_id, sum(qd)::BIGINT AS adc_q
       |      FROM codes JOIN lut USING (sub, code)
       |      WHERE vec_id <> query_id
       |      GROUP BY query_id, vec_id)
       |SELECT query_id, vec_id AS neighbor_id, adc_q FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY adc_q, vec_id) AS rn FROM d)
       |WHERE rn <= $topK ORDER BY query_id, neighbor_id""".stripMargin
  }
}

/** DuckDB rendering of [[IvfPq.topK]] — coarse chain, residual CTE, m
  * per-subspace chains over the residuals, probe/LUT/ADC — all by
  * independent mechanics on the shared arithmetic contract. */
object IvfPqSql {

  def topK(table: String, vecId: String, vecCol: String, dim: Int,
      nCells: Int, m: Int, ksub: Int, iters: Int, nprobe: Int, topK: Int,
      queryPred: String): String = {
    require(dim % m == 0)
    val dsub = dim / m
    def resSlice(j: Int) = s"res[${j * dsub + 1}:${(j + 1) * dsub}]"
    val coarse = KMeansSql.ctes(table, vecId, vecCol, nCells, iters, "g")
    val res =
      s"""res AS (SELECT a.vec_id, a.cl AS cluster,
         |        list_transform(range(1, len(a.v)+1), i -> a.v[i] - c.c[i]) AS res
         |        FROM ga$iters a JOIN gc$iters c ON a.cl = c.cl)""".stripMargin
    val subChains = (0 until m)
      .map(j => KMeansSql.ctes("res", "vec_id", resSlice(j), ksub, iters, s"s$j"))
      .mkString(",\n")
    val codes = (0 until m)
      .map(j => s"SELECT a.vec_id, r.cluster, $j AS sub, a.cl AS code " +
        s"FROM s${j}a$iters a JOIN res r USING (vec_id)")
      .mkString("\n  UNION ALL ")
    val luts = (0 until m).map { j =>
      s"""SELECT qr.query_id, qr.cluster, $j AS sub, cb.cl AS code,
         |       floor(${KMeansSql.distSql(s"qr.${resSlice(j)}", "cb.c")} * ${KMeans.Quant}.0)::BIGINT AS qd
         |FROM qres qr CROSS JOIN s${j}c$iters cb""".stripMargin
    }.mkString("\n  UNION ALL ")
    s"""WITH $coarse,
       |$res,
       |$subChains,
       |codes AS (
       |  $codes),
       |q AS (SELECT $vecId AS query_id,
       |             list_transform($vecCol, x -> x::DOUBLE) AS qv
       |      FROM $table WHERE $queryPred),
       |probes AS (SELECT query_id, qv, cl AS cluster FROM (
       |  SELECT q.query_id, q.qv, g.cl,
       |         row_number() OVER (PARTITION BY q.query_id
       |                            ORDER BY ${KMeansSql.distSql("q.qv", "g.c")}, g.cl) AS rn
       |  FROM q CROSS JOIN gc$iters g) WHERE rn <= $nprobe),
       |qres AS (SELECT p.query_id, p.cluster,
       |         list_transform(range(1, len(p.qv)+1), i -> p.qv[i] - c.c[i]) AS res
       |         FROM probes p JOIN gc$iters c ON p.cluster = c.cl),
       |lut AS (
       |  $luts),
       |d AS (SELECT query_id, vec_id, sum(qd)::BIGINT AS adc_q
       |      FROM codes JOIN lut USING (cluster, sub, code)
       |      WHERE vec_id <> query_id
       |      GROUP BY query_id, vec_id)
       |SELECT query_id, vec_id AS neighbor_id, adc_q FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY adc_q, vec_id) AS rn FROM d)
       |WHERE rn <= $topK ORDER BY query_id, neighbor_id""".stripMargin
  }
}
