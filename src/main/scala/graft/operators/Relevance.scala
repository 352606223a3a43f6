package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/**
 * Corpus relevance scoring — Okapi BM25 of every document against a fixed
 * query term set (the retrieval primitive behind quality-targeted corpus
 * selection, e.g. "books-like" upsampling or eval-adjacent document
 * surfacing in pretraining pipelines).
 *
 * Plan shape, sized for a 100 TB corpus:
 *  - corpus statistics (N, avgdl) are ONE aggregate producing two driver
 *    scalars, embedded as literals — no per-row join against a stats table;
 *  - term frequencies ride the token explode but are filtered to the query
 *    term set MAP-SIDE before any shuffle, so the (doc, term) aggregate is
 *    proportional to documents-containing-query-terms, not corpus tokens;
 *  - document frequencies aggregate to |Q| rows and broadcast back onto
 *    the tf stream — the corpus never self-joins.
 *
 * The BM25 formula (Robertson/Okapi, +1-floored IDF as in Lucene):
 *   score(d, Q) = Σ_q ln(1 + (N - df_q + 0.5)/(df_q + 0.5))
 *                   · tf · (k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
 */
object Relevance {

  /** Top-`topK` documents by BM25 against `query`, ranked on the 6-decimal
    * ROUNDED score with id tie-break (deterministic across engines — an
    * unrounded rank could cut the top-k at an ulp boundary). Documents
    * matching no query term score nothing and never reach the ranking. */
  def bm25TopK(
      df: DataFrame,
      idCol: String,
      textCol: String,
      query: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 20): DataFrame = {
    require(query.nonEmpty, "bm25TopK: empty query")
    val base = df.select(col(idCol), TextOps.tokens(col(textCol)).as("toks"))
      .withColumn("dl", size(col("toks")).cast("double"))
    // two driver scalars from one aggregate: count is exact, and avgdl's
    // integer token-count sum is exact in a double (< 2^53), so the literal
    // matches any engine's avg() bit-for-bit
    val stats = base.agg(
      count(lit(1)).cast("double").as("n"), avg(col("dl")).as("avgdl")).first()
    val n = stats.getDouble(0)
    val avgdl = stats.getDouble(1)
    val tf = base
      .select(col(idCol), col("dl"), explode(col("toks")).as("tok"))
      .where(col("tok").isin(query: _*))
      .groupBy(col(idCol), col("dl"), col("tok"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy(col("tok"))
      .agg(countDistinct(col(idCol)).cast("double").as("dfq"))
    val idf = log(lit(1.0) + (lit(n) - col("dfq") + lit(0.5)) / (col("dfq") + lit(0.5)))
    val term = idf * col("tf") * lit(k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / lit(avgdl)))
    tf.join(broadcast(dfreq), "tok")
      .groupBy(col(idCol))
      .agg(round(sum(term), 6).as("bm25"))
      .orderBy(col("bm25").desc, col(idCol))
      .limit(topK)
  }
}

/** DuckDB rendering of [[Relevance.bm25TopK]] — same arithmetic, with the
  * corpus statistics recomputed IN SQL (not the Spark literals), so the two
  * engines derive N/avgdl independently and the compare checks the formula,
  * not an echo of one engine's constants. */
object RelevanceSql {

  def bm25TopK(
      table: String,
      idCol: String,
      textCol: String,
      query: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 20): String = {
    val toks = graft.functions.TextOpsSql.tokens(textCol)
    val qList = query.map(q => s"'$q'").mkString("(", ", ", ")")
    s"""WITH d AS (SELECT $idCol, $toks AS toks FROM $table),
       |st AS (SELECT count(*)::DOUBLE AS n, avg(len(toks))::DOUBLE AS avgdl
       |       FROM d),
       |tf AS (SELECT $idCol, len(toks)::DOUBLE AS dl, tok,
       |              count(*)::DOUBLE AS tf
       |       FROM (SELECT $idCol, len(toks) AS len_toks, toks,
       |                    unnest(toks) AS tok FROM d)
       |       WHERE tok IN $qList GROUP BY 1, 2, 3),
       |dfq AS (SELECT tok, count(DISTINCT $idCol)::DOUBLE AS dfq
       |        FROM tf GROUP BY tok)
       |SELECT $idCol,
       |       round(sum(
       |         ln(CAST(1.0 AS DOUBLE)
       |            + (st.n - dfq.dfq + CAST(0.5 AS DOUBLE))
       |              / (dfq.dfq + CAST(0.5 AS DOUBLE)))
       |         * tf.tf * CAST(${k1 + 1.0} AS DOUBLE)
       |         / (tf.tf + CAST($k1 AS DOUBLE)
       |            * (CAST(${1.0 - b} AS DOUBLE)
       |               + CAST($b AS DOUBLE) * tf.dl / st.avgdl))), 6) AS bm25
       |FROM tf JOIN dfq USING (tok), st
       |GROUP BY $idCol
       |ORDER BY bm25 DESC, $idCol LIMIT $topK""".stripMargin
  }
}
