package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Multi-phrase dictionary scan of one text column via an AHO–CORASICK
 * automaton (Aho & Corasick 1975): ONE pass over the text finds every
 * occurrence of every dictionary phrase — including overlapping matches
 * and phrases that are substrings of other phrases — in O(len + matches),
 * independent of dictionary size. This is the scale path where a
 * `regexp_count` alternation dies: a 10⁵-phrase blocklist (toxic spans,
 * licensed-text fingerprints, PII dictionaries) compiles into one
 * automaton built ONCE on the driver and shipped as literals; per-row
 * work never re-examines a character more than the automaton's failure
 * chain allows.
 *
 * Returns `struct(total_matches BIGINT, distinct_phrases BIGINT)`:
 * every (position, phrase) match pair counts toward `total_matches`
 * (standard AC semantics — "aaa" contains "aa" twice), and
 * `distinct_phrases` is how many dictionary entries occur at least once.
 * Matching is over UTF-16 units, which cannot misalign on well-formed
 * text: a match of a well-formed phrase never starts mid-surrogate, and
 * occurrence COUNTS are indexing-unit-independent. Null text → null.
 *
 * The scan runs inside whole-stage codegen via a reference object; the
 * per-node emit closures (own phrase ids plus the failure chain's) are
 * precomputed breadth-first so matching never walks suffix links.
 */
case class DictMatchExpr(
    child: Expression,
    phrases: Seq[String])
    extends UnaryExpression {

  require(phrases.nonEmpty, "dictionary must not be empty")
  require(phrases.forall(_.nonEmpty), "phrases must be non-empty")
  require(phrases.distinct.size == phrases.size, "phrases must be distinct")

  override def dataType: DataType = StructType(Seq(
    StructField("total_matches", LongType, nullable = false),
    StructField("distinct_phrases", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dict_match requires string, got ${other.catalogString}")
  }

  override def prettyName: String = "dict_match"

  /** goto / fail / emit tables, built once per executor instance. */
  @transient private lazy val automaton: DictMatchExpr.Automaton =
    DictMatchExpr.build(phrases)

  def stats(textU: UTF8String): InternalRow = {
    val a = automaton
    val text = textU.toString
    var state = 0
    var total = 0L
    val seen = new java.util.BitSet(phrases.size)
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      var s = state
      var next = a.step(s, c)
      while (next < 0 && s != 0) {
        s = a.fail(s)
        next = a.step(s, c)
      }
      state = if (next >= 0) next else 0
      val ids = a.emit(state)
      if (ids.length > 0) {
        total += ids.length
        var j = 0
        while (j < ids.length) { seen.set(ids(j)); j += 1 }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](total, seen.cardinality().toLong))
  }

  override protected def nullSafeEval(input: Any): Any =
    stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dictAutomaton", this,
      classOf[DictMatchExpr].getName)
    nullSafeCodeGen(ctx, ev, t => {
      s"${ev.value} = $ref.stats($t);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): DictMatchExpr =
    copy(child = newChild)
}

object DictMatchExpr {

  /** Flattened automaton: per-node char→next maps, failure links, and
    * precomputed emit closures (phrase ids ending at the node or along
    * its failure chain). */
  final class Automaton(
      gotoMaps: Array[java.util.HashMap[Character, Integer]],
      val fail: Array[Int],
      val emit: Array[Array[Int]]) {
    /** next state for (state, char), or -1 when no edge. */
    def step(s: Int, c: Char): Int = {
      val n = gotoMaps(s).get(Character.valueOf(c))
      if (n == null) -1 else n.intValue()
    }
  }

  def build(phrases: Seq[String]): Automaton = {
    val gotoMaps = mutable.ArrayBuffer(new java.util.HashMap[Character, Integer]())
    val ownIds = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Int])
    phrases.zipWithIndex.foreach { case (ph, id) =>
      var s = 0
      ph.foreach { c =>
        val next = gotoMaps(s).get(Character.valueOf(c))
        s = if (next != null) next.intValue()
        else {
          gotoMaps += new java.util.HashMap[Character, Integer]()
          ownIds += mutable.ArrayBuffer.empty[Int]
          gotoMaps(s).put(Character.valueOf(c), Integer.valueOf(gotoMaps.size - 1))
          gotoMaps.size - 1
        }
      }
      ownIds(s) += id
    }
    val n = gotoMaps.size
    val fail = new Array[Int](n)
    val emit = new Array[Array[Int]](n)
    emit(0) = ownIds(0).toArray
    // BFS: children of the root fail to the root; deeper nodes fail to
    // fail(parent)'s matching child; emit closures fold the fail target's
    // (already-final in BFS order)
    val queue = mutable.Queue.empty[Int]
    gotoMaps(0).forEach { (_, v) =>
      fail(v) = 0
      queue += v.intValue()
    }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      emit(s) =
        if (fail(s) == s) ownIds(s).toArray
        else ownIds(s).toArray ++ emit(fail(s))
      gotoMaps(s).forEach { (c, v) =>
        var f = fail(s)
        var next = {
          val x = gotoMaps(f).get(c)
          if (x == null) -1 else x.intValue()
        }
        while (next < 0 && f != 0) {
          f = fail(f)
          val x = gotoMaps(f).get(c)
          next = if (x == null) -1 else x.intValue()
        }
        fail(v) = if (next >= 0 && next != v.intValue()) next else 0
        queue += v.intValue()
      }
    }
    new Automaton(gotoMaps.toArray, fail, emit)
  }
}
