package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Redirect-chain resolution — a crawl's capture set is full of 3xx
 * hops (http→https, host moves, tracking interstitials), and both the
 * frontier and URL-keyed dedup want each source URL's FINAL target:
 * following chains at fetch time re-fetches every intermediate; at
 * curation time the redirect map is just an edge table to resolve.
 * Loops (a→b→a) and over-long chains resolve to wherever `maxHops`
 * steps land, flagged `resolved = false` — the crawler's give-up rule.
 *
 * Scale shape: POINTER DOUBLING — log2(maxHops) self-joins of the
 * (source → reached-so-far, hops) map instead of maxHops sequential
 * ones; each round exactly composes "follow min(2^k, chain) hops"
 * with itself (a terminal target is never a redirect source, so the
 * left join leaves it fixed), which is why `maxHops` must be a power
 * of two — the composition then lands EXACTLY at min(maxHops, chain
 * length) hops and an independent single-step oracle agrees. Conflicting
 * duplicate edges (one source captured with two targets) collapse to
 * the lexicographically smallest target, deterministically.
 */
object Redirects {

  /** (url, final_url, hops, resolved) for every distinct redirect
    * source. `resolved` is false when `final_url` is still itself a
    * redirect source after `maxHops` hops (a loop or a longer chain). */
  def resolve(
      redirects: DataFrame, srcCol: String, dstCol: String,
      maxHops: Int): DataFrame = {
    require(maxHops >= 1 && maxHops <= 1024 &&
      Integer.bitCount(maxHops) == 1,
      "resolve: maxHops must be a power of two in 1..1024")
    val m = redirects
      .select(col(srcCol).cast("string").as("u"),
        col(dstCol).cast("string").as("v"))
      .where(col("u").isNotNull && col("v").isNotNull &&
        col("u") =!= col("v"))
      .groupBy(col("u")).agg(min(col("v")).as("v"))
      .persist()
    var f = m.select(col("u"), col("v").as("cur"), lit(1L).as("hops"))
    var span = 1
    while (span < maxHops) {
      val hop = f.select(col("u").as("__cu"), col("cur").as("__nxt"),
        col("hops").as("__h2"))
      f = f.join(hop, col("cur") === col("__cu"), "left")
        .select(col("u"),
          coalesce(col("__nxt"), col("cur")).as("cur"),
          (col("hops") + coalesce(col("__h2"), lit(0L))).as("hops"))
      span *= 2
    }
    CacheScope.unpersistAfterAction(
      f.join(m.select(col("u").as("cur"), lit(1).as("__more")),
          Seq("cur"), "left")
        .select(col("u").as("url"), col("cur").as("final_url"),
          col("hops"), col("__more").isNull.as("resolved")),
      Seq(m))
  }
}

/** DuckDB rendering: the SAME semantics by the OTHER construction —
  * `maxHops` SINGLE-step CTEs over a prior CTE `m(u, v)` (already
  * conflict-collapsed), so a doubling bug cannot echo. */
object RedirectsSql {

  def stepCtes(maxHops: Int): String = {
    val s0 = "s0 AS (SELECT u AS url, u AS cur, 0 AS hops FROM m)"
    val steps = (1 to maxHops).map { i =>
      val p = i - 1
      s"""s$i AS (
         |  SELECT url, coalesce(m.v, cur) AS cur,
         |         hops + CASE WHEN m.v IS NULL THEN 0 ELSE 1 END AS hops
         |  FROM s$p LEFT JOIN m ON m.u = s$p.cur)""".stripMargin
    }
    (s0 +: steps).mkString(",\n")
  }
}
