package graft.bde

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * The diff/merge engine — the semantic heart of incremental (level-5) and
 * full-incremental (level-0 diff) loads.
 *
 * Semantics follow the reference's set-based operators
 * (`/root/reference/sql/02-bde_control_functions.sql.in`):
 *
 *  - `_bde_CreateIncDeletes`  (:2228-2262)  change-keys present in the
 *    current table but absent from the incoming data → action 'D'
 *  - `_bde_CreateIncInserts`  (:2264-2298)  change-keys present in the
 *    incoming data but absent from the current table → action 'I'
 *  - `_bde_CreateIncUpdates`  (:2300-2373)  change-keys present in both:
 *    all columns null-safe-equal → '0' (null update); a unique-constraint
 *    column changed → 'X' (delete+insert, protects uniqueness, :2335-2357);
 *    otherwise → 'U'
 *  - `_bde_FixChangedIncKeyRecords` (:2146-2226)  key-swap repair: current
 *    rows whose unique column matches an incoming row under a DIFFERENT key
 *    are stale and must join the change set (their key gets deleted or
 *    re-pointed), else the unique constraint would break on apply
 *  - `ver_apply_table_differences` (:1914-1948, external table_version ext)
 *    full-outer diff of two snapshots — re-expressed as [[fullDiff]]
 *
 * Everything is expressed against the Spark DataFrame API so Catalyst owns
 * the physical plan: the change-key set is broadcast when small (it is a
 * key-only projection), the three classification joins are ordinary
 * hash-joins on the key, and the null-safe column comparison is the built-in
 * `<=>` operator — no UDFs anywhere, whole-stage codegen end to end.
 *
 * Scale posture (100 TB): all joins are equi-joins on the table key, so they
 * hash-partition cleanly; the change set for a daily increment is orders of
 * magnitude smaller than the table and is broadcast, turning the whole
 * classification into a map-side pipeline over the big table scan. Nothing
 * is ever collected to the driver.
 */
object Diff {

  val ActionInsert = "I"
  val ActionUpdate = "U"
  val ActionNullUpdate = "0"
  val ActionUniqueShift = "X"
  val ActionDelete = "D"

  /** Null-safe "all these columns are equal between l and r". */
  private def allEqual(l: DataFrame, r: DataFrame, cols: Seq[String]): Column =
    cols.map(c => l(c) <=> r(c)).reduceOption(_ && _).getOrElse(lit(true))

  /** Null-safe "any of these columns differ between l and r". */
  private def anyDiffer(l: DataFrame, r: DataFrame, cols: Seq[String]): Column =
    cols.map(c => !(l(c) <=> r(c))).reduceOption(_ || _).getOrElse(lit(false))

  /**
   * J5 — key-swap repair (`_bde_FixChangedIncKeyRecords`, sql:2146-2226).
   *
   * For each secondary unique column: find CURRENT rows whose unique value
   * matches an INCOMING row (for a key in the change set) but whose key
   * differs. Those current keys are stale — primary keys were swapped or
   * reassigned upstream — and are added to the change set so the classifier
   * deletes/re-points them.
   *
   * Returns the augmented change-key set (distinct single `key` column).
   */
  def fixChangedKeys(
      cur: DataFrame,
      inc: DataFrame,
      changeKeys: DataFrame,
      key: String,
      uniqueCols: Seq[String]): DataFrame = {
    val chg = changeKeys.select(col(key)).distinct()
    val stale = uniqueCols.map { u =>
      // incoming rows that are in the change set…
      inc.as("i")
        .join(broadcast(chg.as("c")), col(s"i.$key") === col(s"c.$key"))
        // …matched to current rows with the same unique value, different key
        .join(cur.as("t"),
          col(s"i.$u") <=> col(s"t.$u") && col(s"i.$key") =!= col(s"t.$key"))
        .select(col(s"t.$key").as(key))
    }
    stale.foldLeft(chg)((acc, s) => acc.unionByName(s)).distinct()
  }

  /**
   * J1+J2+J3 — classify a change set against current and incoming data.
   *
   * @param cur        current table contents
   * @param inc        incoming (working-copy) data for this increment
   * @param changeKeys change table keys for this table (one `key` column;
   *                   dupes tolerated — first made distinct)
   * @param key        the table key column (int/bigint in the reference)
   * @param uniqueCols secondary unique-constraint columns (for 'X' actions
   *                   and key-swap repair)
   * @param repairKeySwaps run the J5 repair before classifying (the
   *                   reference always does for L5; fullDiff does not need it)
   * @return DataFrame(key, action) with action ∈ I/U/0/X/D
   */
  def classifyChanges(
      cur: DataFrame,
      inc: DataFrame,
      changeKeys: DataFrame,
      key: String,
      uniqueCols: Seq[String] = Nil,
      repairKeySwaps: Boolean = true): DataFrame = {
    val compareCols = inc.columns.filter(_ != key).toSeq
    val chg0 = changeKeys.select(col(key)).distinct()
    val chg  = if (repairKeySwaps && uniqueCols.nonEmpty)
                 fixChangedKeys(cur, inc, chg0, key, uniqueCols)
               else chg0

    val curK = cur.as("cur")
    val incK = inc.as("inc")
    val c = broadcast(chg.as("chg"))

    // 'D': in change set ∩ current, absent from incoming  (sql:2228-2262)
    val deletes = c
      .join(curK, col(s"chg.$key") === col(s"cur.$key"), "left_semi")
      .join(incK, col(s"chg.$key") === col(s"inc.$key"), "left_anti")
      .select(col(s"chg.$key").as(key), lit(ActionDelete).as("action"))

    // 'I': in change set ∩ incoming, absent from current  (sql:2264-2298)
    val inserts = c
      .join(incK, col(s"chg.$key") === col(s"inc.$key"), "left_semi")
      .join(curK, col(s"chg.$key") === col(s"cur.$key"), "left_anti")
      .select(col(s"chg.$key").as(key), lit(ActionInsert).as("action"))

    // 'U'/'0'/'X': in both — per-row CASE on null-safe compare (sql:2300-2373)
    val updates = c
      .join(curK, col(s"chg.$key") === col(s"cur.$key"))
      .join(incK, col(s"chg.$key") === col(s"inc.$key"))
      .select(
        col(s"chg.$key").as(key),
        when(allEqual(curK, incK, compareCols), ActionNullUpdate)
          .when(anyDiffer(curK, incK, uniqueCols), ActionUniqueShift)
          .otherwise(ActionUpdate)
          .as("action"))

    deletes.unionByName(inserts).unionByName(updates)
  }

  /**
   * J4 — full-table diff of two snapshots (`ver_apply_table_differences`,
   * sql:1914-1948): full outer join on the key; right-only → 'I',
   * left-only → 'D', both with any column changed → 'U'. Unchanged rows are
   * NOT emitted (the reference's differ only returns real changes).
   */
  def fullDiff(cur: DataFrame, next: DataFrame, key: String): DataFrame = {
    val compareCols = next.columns.filter(_ != key).toSeq
    val l = cur.as("l")
    val r = next.as("r")
    l.join(r, col(s"l.$key") === col(s"r.$key"), "full_outer")
      .select(
        coalesce(col(s"l.$key"), col(s"r.$key")).as(key),
        when(col(s"l.$key").isNull, ActionInsert)
          .when(col(s"r.$key").isNull, ActionDelete)
          .when(anyDiffer(l, r, compareCols), ActionUpdate)
          .as("action"))
      .where(col("action").isNotNull)
  }

  /**
   * Apply a classified action set: keep current rows not deleted/updated,
   * then add the incoming version of inserted/updated/key-shifted rows.
   * ('0' null-updates leave the current row untouched; 'X' behaves as
   * delete+insert, which for a keyed merge is the same as replace.)
   */
  def applyActions(
      cur: DataFrame,
      inc: DataFrame,
      actions: DataFrame,
      key: String): DataFrame = {
    val removeKeys = actions
      .where(col("action").isin(ActionDelete, ActionUpdate, ActionUniqueShift))
      .select(col(key))
    val addKeys = actions
      .where(col("action").isin(ActionInsert, ActionUpdate, ActionUniqueShift))
      .select(col(key))
    val kept  = cur.join(broadcast(removeKeys), Seq(key), "left_anti")
    val added = inc.join(broadcast(addKeys), Seq(key), "left_semi")
      .select(cur.columns.map(col).toIndexedSeq: _*)
    kept.unionByName(added)
  }

  /**
   * A1 — per-action counts (`_ver_apply_changes` returns nins/ndel/nupd;
   * null updates counted separately at sql:1757). One tiny aggregate.
   */
  def countByAction(actions: DataFrame): DataFrame =
    actions.groupBy("action").agg(count(lit(1)).as("n")).orderBy("action")
}
