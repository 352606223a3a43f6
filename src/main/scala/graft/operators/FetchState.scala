package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Durable crawl-cycle state — the at-rest FETCH-STATE index and FRONTIER
 * store that make the revisit planners ([[Frontier.conditionalFetchPlan]]
 * / [[Frontier.sitemapRefetchPlan]] / [[Frontier.revisitPriority]]) and
 * the politeness scheduler ([[Frontier.schedule]]) a CLOSED loop: each
 * cycle's input is the prior cycle's committed artifact, never a
 * DataFrame a driver must re-materialize per run.
 *
 * Reference analogue: the per-table watermark row that makes the
 * reference's incrementality durable
 * (`sql/01-bde_control_tables.sql:90-96`, maintained by
 * `_bde_RecordDatasetLoaded`, `sql/02-bde_control_functions.sql.in:975-1071`)
 * — a run consults the PERSISTED last-upload state instead of re-deriving
 * it from prior uploads. Here the two durable rows per crawl are:
 *
 *  - **fetch state** (url, etag, last_modified, fetch_time, digest): one
 *    row per COMPLETED fetch, appended per cycle like the digest/CDX
 *    indexes ([[DedupIndex.appendBucketed]] lifecycle, bucket layout
 *    preserved, `Bucketing.compactBucketed` the maintenance fold).
 *    Bucketed on the URL — every consumer keys by it: the latest-state
 *    fold (`groupBy(url)`) runs with ZERO Exchange on the index side
 *    (the bucketing IS the grouping key; pinned by `PlanAuditSpec`),
 *    and only the frontier probe shuffles, to align to the bucketing.
 *  - **frontier tail** (id, url, priority): the URLs a cycle could not
 *    reach within its horizon plus the cycle's novel discoveries —
 *    exactly what [[Frontier.schedule]] defers. Rows CHANGE per cycle
 *    (scheduled URLs leave), so the commit is the crash-atomic
 *    [[Bucketing.replaceBucketed]] rename-aside swap, the component-label
 *    discipline, not an append.
 *
 * At 100 TB the fetch-state table is the crawl's largest control
 * structure (one row per fetch attempt across releases) — which is why
 * the latest-per-URL fold must be the max_by aggregate over the bucketed
 * scan (per-map-task state = one struct per URL) and never a window or a
 * rescan of fetch logs.
 */
object FetchState {

  /** The fetch-state row set of `df` in index column order: (urlCol →
    * `url`, etag, last_modified, fetch_time, digest). `fetch_time` may be
    * any orderable type (the planners COMPARE it, never parse it);
    * `digest` feeds [[Frontier.revisitPriority]]'s change detection. */
  private def stateRows(df: DataFrame, urlCol: String): DataFrame =
    df.select(col(urlCol).as("url"), col("etag"), col("last_modified"),
      col("fetch_time"), col("digest"))

  /** Persist the crawl's fetch history as a url-bucketed managed table —
    * the durable state behind conditional revisiting. One bucketed write;
    * every cycle appends its completed fetches with [[appendState]]. */
  def writeStateIndex(
      state: DataFrame, table: String, buckets: Int,
      urlCol: String = "url"): Unit =
    Bucketing.writeBucketed(stateRows(state, urlCol), table, "url", buckets)

  /** Fold one cycle's completed fetches INTO the index (append; bucket
    * layout restated from the catalog, like every index append). */
  def appendState(
      batch: DataFrame, table: String, urlCol: String = "url"): Unit =
    DedupIndex.appendBucketed(stateRows(batch, urlCol), table)

  /** [[Frontier.conditionalFetchPlan]] with the state side read from the
    * PERSISTED index: the latest-per-URL max_by fold aggregates the
    * bucketed scan in place (zero index-side Exchange, plan-pinned) and
    * each due URL gets its RFC 9110 §13.1 validators from its latest
    * committed fetch — across every release ever appended, with no
    * ephemeral state frame to rebuild. */
  def conditionalFetchPlanIndexed(
      frontier: DataFrame, spark: SparkSession, table: String,
      urlCol: String = "url"): DataFrame =
    Frontier.conditionalFetchPlan(
      frontier, indexedState(spark, table, urlCol), urlCol)

  /** [[Frontier.sitemapRefetchPlan]] over the persisted index — the
    * publisher's `<lastmod>` arbitrated against the durable fetch
    * history. */
  def sitemapRefetchPlanIndexed(
      entries: DataFrame, spark: SparkSession, table: String,
      urlCol: String = "url", lastmodCol: String = "lastmod"): DataFrame =
    Frontier.sitemapRefetchPlan(
      entries, indexedState(spark, table, urlCol), urlCol, lastmodCol)

  /** [[Frontier.revisitPriority]] over the persisted index: the capture
    * history IS the fetch log (fetch_time as the capture instant, digest
    * as the change witness), so the Cho–Garcia-Molina change-rate
    * estimate reads the durable artifact directly. */
  def revisitPriorityIndexed(
      spark: SparkSession, table: String, nowTs: String,
      urlCol: String = "url"): DataFrame =
    Frontier.revisitPriority(
      indexedState(spark, table, urlCol), urlCol, "fetch_time", "digest",
      nowTs)

  private def indexedState(
      spark: SparkSession, table: String, urlCol: String): DataFrame = {
    val t = Retract.readLive(spark, table)
    if (urlCol == "url") t else t.withColumnRenamed("url", urlCol)
  }

  // =====================================================================
  // Frontier store
  // =====================================================================

  /** Persist the crawl frontier (idCol → `id`, urlCol → `url`,
    * priorityCol → `priority`) as a url-bucketed managed table — the
    * cycle-to-cycle TAIL [[Frontier.schedule]] defers. Bucketed on the
    * URL so the per-cycle rewrite's dedup fold (`groupBy(url)`) and the
    * discovery anti-joins co-locate with the at-rest layout. */
  def writeFrontierStore(
      frontier: DataFrame, table: String, buckets: Int,
      idCol: String = "id", urlCol: String = "url",
      priorityCol: String = "priority"): Unit =
    Bucketing.writeBucketed(
      frontier.select(col(idCol).as("id"), col(urlCol).as("url"),
        col(priorityCol).as("priority")),
      table, "url", buckets)

  /** The due frontier a cycle schedules from — the prior cycle's
    * committed artifact, read in place. */
  def frontier(spark: SparkSession, table: String): DataFrame =
    Retract.readLive(spark, table)

  /**
   * Commit one crawl cycle against the durable stores — the state
   * transition that closes the loop:
   *
   *  1. `fetched` (the cycle's completed fetches: url, etag,
   *     last_modified, fetch_time, digest) APPENDS into the fetch-state
   *     index — first, so this cycle's fetches gate its own discoveries;
   *  2. the frontier tail = the stored frontier minus the scheduled
   *     URLs, UNION the cycle's novel discoveries (`discovered`: id,
   *     url, priority) that were never fetched in ANY cycle (an
   *     already-fetched URL re-enters only through the revisit planners
   *     — the discovery door must not resurrect it); a URL reached from
   *     several discoverers (or already deferred) folds to ONE row:
   *     lowest id (the earliest discoverer — the crawlLoopStream
   *     convention) with the highest priority claimed for it;
   *  3. the merged tail REPLACES the frontier store via the
   *     crash-atomic rename-aside swap — a driver death at any point
   *     leaves a readable incarnation, healed on the next cycle's entry.
   *
   * Scale shape: everything keys by url over two url-bucketed tables —
   * the anti-joins and the dedup fold align to the at-rest layout; the
   * full-table frontier rewrite is the same linear-pass trade the
   * component-label maintenance states (the tail is 2 small columns +
   * a url per undone fetch, orders of magnitude under the corpus).
   */
  def commitCycle(
      spark: SparkSession, frontierTable: String, stateTable: String,
      scheduled: DataFrame, fetched: DataFrame, discovered: DataFrame,
      urlCol: String = "url"): Unit = {
    appendState(fetched, stateTable, urlCol)
    // same-session appends can leave a stale cached file listing on the
    // table relation (the ingestLoopStream guard) — refresh before the
    // discovery gate probes it
    spark.catalog.refreshTable(stateTable)
    val seen = spark.table(stateTable).select(col("url")).distinct()
    val tail = spark.table(frontierTable)
      .join(scheduled.select(col(urlCol).as("url")), Seq("url"), "left_anti")
    val novel = discovered
      .select(col("id"), col(urlCol).as("url"), col("priority"))
      .join(seen, Seq("url"), "left_anti")
    val next = tail.unionByName(novel)
      .groupBy(col("url"))
      .agg(min(col("id")).as("id"), max(col("priority")).as("priority"))
      .select(col("id"), col("url"), col("priority"))
    Bucketing.replaceBucketed(spark, frontierTable, next)
    spark.catalog.refreshTable(frontierTable)
  }
}
