package graft.bde

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/**
 * The diff classifier's semantics, including the SURVEY §5 property: for
 * keys in the change set, apply(classify(cur, inc)) reproduces inc exactly;
 * keys outside the change set keep their current rows.
 */
class DiffSpec extends SparkSuite {
  import spark.implicits._

  private def df(rows: Seq[(Int, String, Option[Int])]): DataFrame =
    rows.toDF("id", "name", "val")

  test("classify: I/U/0/D actions") {
    val cur = df(Seq((1, "a", Some(10)), (2, "b", Some(20)), (3, "c", None)))
    val inc = df(Seq((2, "b", Some(21)), (3, "c", None), (4, "d", Some(40))))
    val chg = Seq(1, 2, 3, 4).toDF("id")
    val actions = Diff.classifyChanges(cur, inc, chg, "id")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(actions == Map(1 -> "D", 2 -> "U", 3 -> "0", 4 -> "I"))
  }

  test("null-safe compare: null == null is a null update, null vs value is U") {
    val cur = df(Seq((1, "a", None), (2, "b", None)))
    val inc = df(Seq((1, "a", None), (2, "b", Some(5))))
    val chg = Seq(1, 2).toDF("id")
    val actions = Diff.classifyChanges(cur, inc, chg, "id")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(actions == Map(1 -> "0", 2 -> "U"))
  }

  test("X action: declared-unique column changed") {
    val cur = df(Seq((1, "u1", Some(10)), (2, "u2", Some(20))))
    val inc = df(Seq((1, "u1", Some(11)), (2, "u9", Some(20))))
    val chg = Seq(1, 2).toDF("id")
    val actions = Diff.classifyChanges(cur, inc, chg, "id",
      uniqueCols = Seq("name"), repairKeySwaps = false)
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(actions == Map(1 -> "U", 2 -> "X"))
  }

  test("key-swap repair: stale current key joins the change set") {
    // key 1's unique name moved to key 9 upstream: inc has (9, "a"), chg={9};
    // current row (1, "a") is stale and must be pulled into the change set.
    val cur = Seq((1, "a"), (2, "b")).toDF("id", "name")
    val inc = Seq((9, "a"), (2, "b")).toDF("id", "name")
    val chg = Seq(9).toDF("id")
    val repaired = Diff.fixChangedKeys(cur, inc, chg, "id", Seq("name"))
      .collect().map(_.getInt(0)).toSet
    assert(repaired == Set(1, 9))
    val actions = Diff.classifyChanges(cur, inc, chg, "id",
      uniqueCols = Seq("name"), repairKeySwaps = true)
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(actions == Map(1 -> "D", 9 -> "I"))
  }

  test("key-swap repair never matches NULL unique values (plain SQL equality)") {
    // multiple NULLs are legal under a unique constraint: updating key 1
    // (name stays NULL) must NOT mark the unrelated NULL-named key 9 stale
    // — a null-safe join here would DELETE row 9 (reference joins with
    // plain equality, sql:2182-2190)
    val cur = Seq((1, Option.empty[String]), (9, Option.empty[String]),
      (2, Some("b"))).toDF("id", "name")
    val inc = Seq((1, Option.empty[String]), (9, Option.empty[String]),
      (2, Some("b"))).toDF("id", "name")
    val chg = Seq(1).toDF("id")
    val repaired = Diff.fixChangedKeys(cur, inc, chg, "id", Seq("name"))
      .collect().map(_.getInt(0)).toSet
    assert(repaired == Set(1))
    val actions = Diff.classifyChanges(cur, inc, chg, "id",
      uniqueCols = Seq("name"), repairKeySwaps = true)
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(actions == Map(1 -> "0")) // row 9 untouched, not deleted
  }

  test("property: apply(classify) == inc on changed keys, cur elsewhere (20 seeded cases)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 20) {
      val keys = 1 to 60
      val curRows = keys.filter(_ => rnd.nextDouble() < 0.7)
        .map(k => (k, s"n$k", if (rnd.nextBoolean()) Some(rnd.nextInt(5)) else None))
      val incRows = keys.filter(_ => rnd.nextDouble() < 0.7)
        .map(k => (k, s"n$k",
          if (rnd.nextDouble() < 0.3) Some(rnd.nextInt(5) + 100)
          else curRows.find(_._1 == k).map(_._3).getOrElse(Some(rnd.nextInt(5))).orElse(None)))
      val chgKeys = keys.filter(_ => rnd.nextDouble() < 0.5)
      val cur = df(curRows)
      val inc = df(incRows)
      val chg = chgKeys.toDF("id")

      val actions = Diff.classifyChanges(cur, inc, chg, "id")
      val merged = Diff.applyActions(cur, inc, actions, "id")
        .collect().map(r => (r.getInt(0), r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getInt(2)))).toSet

      // independent scala model
      val curM = curRows.map(r => r._1 -> r).toMap
      val incM = incRows.map(r => r._1 -> r).toMap
      val chgS = chgKeys.toSet
      val expected = keys.flatMap { k =>
        if (chgS.contains(k)) incM.get(k)
        else curM.get(k)
      }.toSet
      assert(merged == expected)
    }
  }

  test("fullDiff: only real changes emitted; apply reproduces the snapshot") {
    val cur = df(Seq((1, "a", Some(1)), (2, "b", Some(2)), (3, "c", Some(3))))
    val next = df(Seq((2, "b", Some(2)), (3, "c", Some(9)), (4, "d", Some(4))))
    val actions = Diff.fullDiff(cur, next, "id")
    val byAction = actions.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(byAction == Map(1 -> "D", 3 -> "U", 4 -> "I")) // 2 unchanged: absent
    val merged = Diff.applyActions(cur, next, actions, "id")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet
    assert(merged == Set((2, "b", 2), (3, "c", 9), (4, "d", 4)))
  }

  test("countByAction totals") {
    val cur = df(Seq((1, "a", Some(1)), (2, "b", Some(2))))
    val inc = df(Seq((2, "b", Some(3)), (4, "d", Some(4))))
    val chg = Seq(1, 2, 4).toDF("id")
    val counts = Diff.countByAction(Diff.classifyChanges(cur, inc, chg, "id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("D" -> 1L, "U" -> 1L, "I" -> 1L))
  }
}
