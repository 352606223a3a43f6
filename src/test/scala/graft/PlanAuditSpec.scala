package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.bde.Diff
import graft.operators.{Dedup, Similarity}

/**
 * Physical-plan audit: the properties the 100 TB design depends on, pinned
 * as tests so a refactor that silently degrades a plan (a lost broadcast, a
 * cartesian product, a filter that stops reaching the parquet scan) fails
 * CI instead of surfacing as a cluster incident.
 */
class PlanAuditSpec extends SparkSuite {
  import spark.implicits._

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private val sf = "/root/testdata/sf0.001"

  test("diff classify/apply: change-set sides broadcast, never cartesian") {
    val cur = spark.read.parquet(s"$sf/orders.parquet")
      .where(col("o_orderkey") % 7 =!= 0)
    val inc = spark.read.parquet(s"$sf/orders.parquet")
      .where(col("o_orderkey") % 9 =!= 0)
    val keys = spark.read.parquet(s"$sf/orders.parquet")
      .where(col("o_orderkey") % 3 === 0).select("o_orderkey")
    val actions = Diff.classifyChanges(cur, inc, keys, "o_orderkey")
    val applied = Diff.applyActions(cur, inc, actions, "o_orderkey")
    for (p <- Seq(physical(actions), physical(applied))) {
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
        "big-table reductions must broadcast the change-set side")
      assert(!p.contains("CartesianProduct"), "no cartesian products")
    }
  }

  test("parquet scans: filters push down, projections prune columns") {
    val q6 = spark.read.parquet(s"$sf/lineitem.parquet")
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_quantity") < 24)
      .select(col("l_extendedprice"), col("l_discount"))
    val p = physical(q6)
    assert(p.contains("PushedFilters: [IsNotNull"),
      s"filters must reach the scan:\n$p")
    // ReadSchema carries only the columns the query touches, never the
    // 16-column lineitem row
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!read.contains("l_orderkey") && read.contains("l_extendedprice"),
      s"projection must prune to referenced columns: $read")
  }

  test("LSH similarity + simhash dedup: bucket-bounded joins, no cartesian") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val lsh = Similarity.lshNeighborPairs(emb, "vec_id", "embedding",
      bits = 12, minCosine = 0.2, numTables = 2)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val ham = Dedup.simHashHammingPairs(docs, "doc_id", "text", 3)
    for (p <- Seq(physical(lsh), physical(ham)))
      assert(!p.contains("CartesianProduct"),
        "candidate joins must be key-equality (bucket) joins")
  }

  test("whole-stage codegen covers the native expressions") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = physical(docs.select(
      graft.functions.TextOps.simHash(
        graft.functions.TextOps.tokenHashesWide(
          graft.functions.TextOps.tokens(col("text")))).as("print")))
    // `*(n)` marks operators inside a WholeStageCodegen stage; one lambda
    // (CodegenFallback) in the projection would strip the marker — the
    // tokens() filter used to do exactly that
    val projectLine = p.linesIterator.find(_.contains("Project")).getOrElse("")
    assert(projectLine.trim.startsWith("*("),
      s"the tokenize->hash->simhash projection must run inside " +
        s"whole-stage codegen:\n$p")
  }
}
