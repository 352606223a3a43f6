package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextOps, TextOpsSql}

/**
 * Benchmark-contamination check: how much of each training document's
 * n-gram content also appears in a held-out evaluation set. The standard
 * decontamination step of a pretraining pipeline — eval-overlapping
 * documents are dropped or down-weighted before training.
 *
 * Shape: the eval split is chosen DETERMINISTICALLY by [[Sampling.hash16]]
 * (so the same ids form the eval set on every run and in the oracle), each
 * document is reduced to its DISTINCT word-k-gram hashes
 * ([[TextOps.shingleHashes]]), and a train-side explode joins against the
 * union of eval shingles.
 *
 * Scale posture: the eval side is benchmarks — thousands of documents, a
 * few million distinct shingles — while the train side is the 100 TB
 * corpus. The eval shingle set is therefore the BROADCAST side; the train
 * side streams map-side through explode → broadcast-hash-join → per-doc
 * partial-aggregated count, with no shuffle of train shingles at all (the
 * final groupBy keys on doc_id, which AQE coalesces; counts are combined
 * map-side first).
 */
object Contamination {

  /**
   * Per-train-document contamination against the hash-selected eval split.
   *
   * @param evalRate  fraction of documents (by id-hash) forming the eval set
   * @return contaminated train docs only (inner join): doc_id, n_shingles
   *         (distinct k-grams in the doc), n_shared (of them, how many occur
   *         anywhere in the eval set), contam_frac = n_shared / n_shingles
   */
  def check(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      evalRate: Double,
      seed: Long = 0L,
      k: Int = 3): DataFrame = {
    val shingles = array_distinct(
      TextOps.shingleHashes(TextOps.tokenHashes(TextOps.tokens(col(textCol))), k))
    val isEval = Sampling.hash16(col(idCol), seed) <
      lit(math.round(evalRate * Sampling.Buckets))

    // filter BEFORE shingling on both branches: the eval scan prunes to the
    // sampled ~evalRate of rows (predicate on the id column pushes into the
    // scan), so only the small side ever shingles twice
    val evalShingles = docs.where(isEval)
      .select(explode(shingles).as("sh")).distinct()

    docs.where(!isEval)
      .select(col(idCol), shingles.as("shs"))
      .select(col(idCol), size(col("shs")).cast("bigint").as("n_shingles"),
        explode(col("shs")).as("sh"))
      .join(broadcast(evalShingles), "sh")
      .groupBy(col(idCol), col("n_shingles"))
      .agg(count(lit(1)).as("n_shared"))
      .select(col(idCol), col("n_shingles"), col("n_shared"),
        (col("n_shared").cast("double") / col("n_shingles").cast("double"))
          .as("contam_frac"))
  }

  /**
   * Contamination against SEVERAL eval benchmarks at once, with per-set
   * hit attribution: one output row per (train doc, eval set it overlaps).
   *
   * The set-tagged shingle union — (eval_set, shingle), deduped per set —
   * is built once and broadcast ONCE; the 100 TB train side still streams
   * through a single explode → one broadcast-hash-join → one per-(doc, set)
   * partially-aggregated count, identical plan shape and train-side cost
   * to the single-set [[check]] no matter how many benchmarks are checked.
   * Callers pass each benchmark as its own DataFrame (and exclude eval
   * rows from `docs` if the sets are carved from the corpus itself).
   */
  def checkMulti(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      evalSets: Seq[(String, DataFrame)],
      k: Int = 3): DataFrame = {
    require(evalSets.nonEmpty, "checkMulti: no eval sets given")
    val shingles = array_distinct(
      TextOps.shingleHashes(TextOps.tokenHashes(TextOps.tokens(col(textCol))), k))
    val evalShingles = evalSets.map { case (name, ev) =>
      ev.select(explode(shingles).as("sh")).distinct()
        .select(lit(name).as("eval_set"), col("sh"))
    }.reduce(_.unionByName(_))

    docs
      .select(col(idCol), shingles.as("shs"))
      .select(col(idCol), size(col("shs")).cast("bigint").as("n_shingles"),
        explode(col("shs")).as("sh"))
      .join(broadcast(evalShingles), "sh")
      .groupBy(col(idCol), col("eval_set"), col("n_shingles"))
      .agg(count(lit(1)).as("n_shared"))
      .select(col(idCol), col("eval_set"), col("n_shingles"), col("n_shared"),
        (col("n_shared").cast("double") / col("n_shingles").cast("double"))
          .as("contam_frac"))
  }
}

/** DuckDB rendering of [[Contamination.check]] for the oracle. */
object ContaminationSql {

  def check(
      idCol: String,
      textCol: String,
      evalRate: Double,
      seed: Long = 0L,
      k: Int = 3,
      table: String = "documents"): String = {
    val shingles = "list_distinct(" + TextOpsSql.shingleHashes(
      TextOpsSql.tokenHashes(TextOpsSql.tokens(textCol)), k) + ")"
    val isEval =
      s"${SamplingSql.hash16(idCol, seed)} < ${math.round(evalRate * Sampling.Buckets)}"
    s"""WITH sh AS (
       |  SELECT $idCol, $isEval AS is_eval,
       |         len($shingles) AS n_shingles, unnest($shingles) AS sh
       |  FROM $table),
       |ev AS (SELECT DISTINCT sh FROM sh WHERE is_eval)
       |SELECT sh.$idCol, n_shingles, count(*) AS n_shared,
       |       count(*)::DOUBLE / n_shingles::DOUBLE AS contam_frac
       |FROM sh JOIN ev USING (sh)
       |WHERE NOT is_eval
       |GROUP BY sh.$idCol, n_shingles""".stripMargin
  }

  /** Mirror of [[Contamination.checkMulti]] with `nSets` eval sets carved
    * as adjacent id-hash ranges (set i = buckets [i*r, (i+1)*r), named
    * eval_$i) and the train side = everything past the last range. */
  def checkMulti(
      idCol: String,
      textCol: String,
      nSets: Int,
      evalRate: Double,
      seed: Long = 0L,
      k: Int = 3,
      table: String = "documents"): String = {
    val shingles = "list_distinct(" + TextOpsSql.shingleHashes(
      TextOpsSql.tokenHashes(TextOpsSql.tokens(textCol)), k) + ")"
    val r = math.round(evalRate * Sampling.Buckets)
    val setCase = (0 until nSets).map { i =>
      s"WHEN h < ${(i + 1) * r} THEN 'eval_$i'"
    }.mkString(" ")
    s"""WITH sh AS (
       |  SELECT $idCol, ${SamplingSql.hash16(idCol, seed)} AS h,
       |         len($shingles) AS n_shingles, unnest($shingles) AS sh
       |  FROM $table),
       |ev AS (SELECT DISTINCT CASE $setCase END AS eval_set, sh
       |       FROM sh WHERE h < ${nSets * r})
       |SELECT sh.$idCol, ev.eval_set, n_shingles, count(*) AS n_shared,
       |       count(*)::DOUBLE / n_shingles::DOUBLE AS contam_frac
       |FROM sh JOIN ev USING (sh)
       |WHERE h >= ${nSets * r}
       |GROUP BY sh.$idCol, ev.eval_set, n_shingles""".stripMargin
  }
}
