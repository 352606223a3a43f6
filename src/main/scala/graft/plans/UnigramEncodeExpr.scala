package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Viterbi segmentation of one word under a trained unigram-LM piece model
 * ([[graft.operators.Unigram]]): `best[i]` maximizes `best[j] · p(w[j,i))`
 * over spans of length ≤ `maxLen`, scanning span starts ascending with a
 * STRICT comparison so the longest last piece wins ties — exactly the
 * reference implementation's rule (`tools/unigram_reference.py`), which is
 * what keeps the pinned oracle exact. Characters absent from the model act
 * as singleton pieces at probability 1e-9 (the UNK rule), so any word
 * segments. Positions are CODE POINTS (precomputed boundary offsets over
 * the UTF-16 string) — exactly the Python reference's string indexing,
 * so an astral character is ONE UNK piece, never two mangled surrogate
 * halves, and pieces always reassemble to the original word. (A lone
 * surrogate in the INPUT is already invalid UTF-16 and round-trips as
 * U+FFFD-style replacement — corrupt upstream bytes, not a segmentation
 * artifact.)
 *
 * The model travels as literals inside the expression (vocabSize entries —
 * driver-bounded by training); the per-row DP is O(len · maxLen) with a
 * hash probe per span, codegen'd via a reference object so encoding stays
 * inside whole-stage codegen. Null word → null.
 */
case class UnigramEncodeExpr(
    child: Expression,
    pieces: Seq[(String, Double)],
    maxLen: Int)
    extends UnaryExpression {

  require(maxLen >= 1, "maxLen must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unigram_encode requires string, got ${other.catalogString}")
  }

  override def prettyName: String = "unigram_encode"

  @transient private lazy val probs: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](pieces.size * 2)
    pieces.foreach { case (s, p) => m.put(s, p) }
    m
  }

  /** The DP, shared by interpreted eval and codegen. Long words would
    * underflow raw-space products to 0.0 (at which point `>` never fires
    * and the whole word would fall out as ONE bogus piece): whenever the
    * newest cell drops below 2^-600 the whole computed prefix rescales by
    * 2^600 — a pure exponent shift (`ldexp`), so every mantissa and
    * therefore every comparison is EXACTLY as in unbounded precision; all
    * live cells scale together, so the argmax chain is unchanged. The
    * Python reference applies the identical rescale. */
  def segment(wordU: UTF8String): ArrayData = {
    val word = wordU.toString
    // code-point boundaries: off(k) = UTF-16 offset of the k-th code
    // point; spans substring between boundaries, so maxLen counts code
    // points and surrogate pairs never split
    val off = {
      val b = new Array[Int](word.codePointCount(0, word.length) + 1)
      var o = 0
      var k = 0
      while (o < word.length) {
        b(k) = o
        o += Character.charCount(word.codePointAt(o))
        k += 1
      }
      b(k) = word.length
      b
    }
    val n = off.length - 1
    val best = new Array[Double](n + 1)
    val back = new Array[Int](n + 1)
    best(0) = 1.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxLen)
      while (j < i) {
        val s = word.substring(off(j), off(i))
        val p0 = probs.get(s)
        val p: java.lang.Double =
          if (p0 != null) p0
          else if (i - j == 1) java.lang.Double.valueOf(UnigramEncodeExpr.PUnk)
          else null
        if (p != null) {
          val cand = best(j) * p.doubleValue()
          if (cand > best(i)) { best(i) = cand; back(i) = j }
        }
        j += 1
      }
      if (best(i) > 0.0 && best(i) < UnigramEncodeExpr.RescaleBelow) {
        // only the LIVE WINDOW rescales (cells a later position can still
        // read — position i+1 reads j ≥ i+1−maxLen); stale cells stay at
        // their old scale and are never touched, which also keeps repeated
        // rescales from overflowing early cells. Window cells are at most
        // PUnk^-maxLen above the frontier (every step has a ≥ PUnk
        // factor), so the scaled window stays far below Double.MaxValue.
        var k = math.max(0, i - maxLen + 1)
        while (k <= i) {
          best(k) = java.lang.Math.scalb(best(k), UnigramEncodeExpr.RescaleExp)
          k += 1
        }
      }
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var k = n
    while (k > 0) {
      out += UTF8String.fromString(word.substring(off(back(k)), off(k)))
      k = back(k)
    }
    new GenericArrayData(out.reverse.toArray[Any])
  }

  override protected def nullSafeEval(input: Any): Any =
    segment(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramModel", this,
      classOf[UnigramEncodeExpr].getName)
    nullSafeCodeGen(ctx, ev, w => {
      s"${ev.value} = $ref.segment($w);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramEncodeExpr =
    copy(child = newChild)
}

object UnigramEncodeExpr {
  /** Probability assigned to out-of-model single characters (UNK). */
  val PUnk: Double = 1e-9

  /** Underflow guard: when the DP frontier drops below 2^-600 the live
    * window rescales by 2^600 — an exact exponent shift, argmax-exact. */
  val RescaleExp: Int = 600
  val RescaleBelow: Double = java.lang.Math.scalb(1.0, -RescaleExp)
}
