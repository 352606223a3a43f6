package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * BERT-style greedy longest-match-first WordPiece encoding of one word
 * ([[graft.operators.WordPiece]]): from each position take the LONGEST
 * substring whose piece form (`sub` at position 0, `"##" + sub` after it)
 * is in the trained piece set; if no length matches, the WHOLE word
 * collapses to one `unk` piece — the reference WordPiece rule, under
 * which a single out-of-alphabet character voids the word rather than
 * producing a partial segmentation.
 *
 * Positions are CODE POINTS (precomputed boundary offsets over the UTF-16
 * string — [[UnigramEncodeExpr]]'s indexing), so an astral character is
 * one candidate unit, never two mangled surrogate halves, and matched
 * pieces always reassemble to the original word.
 *
 * The piece set travels as literals inside the expression (trained-
 * vocabulary-sized — driver-bounded by training); the per-row scan is
 * O(len · maxPieceLen) with a hash probe per candidate, codegen'd via a
 * reference object so encoding stays inside whole-stage codegen. Null
 * word → null; the empty word encodes to an empty array.
 */
case class WordPieceEncodeExpr(
    child: Expression,
    pieceSet: Seq[String],
    unk: String)
    extends UnaryExpression {

  require(pieceSet.nonEmpty, "piece set must not be empty")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wordpiece_encode requires string, got ${other.catalogString}")
  }

  override def prettyName: String = "wordpiece_encode"

  @transient private lazy val vocab: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](pieceSet.size * 2)
    pieceSet.foreach(s.add)
    s
  }

  /** Longest candidate SUBSTRING length in code points: piece length
    * minus the `##` prefix — no candidate beyond it can match. */
  @transient private lazy val maxSubLen: Int =
    pieceSet.map { p =>
      val body = if (p.startsWith("##")) p.substring(2) else p
      body.codePointCount(0, body.length)
    }.max

  /** The greedy scan, shared by interpreted eval and codegen. */
  def segment(wordU: UTF8String): ArrayData = {
    val word = wordU.toString
    // code-point boundaries: off(k) = UTF-16 offset of the k-th code point
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
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var i = 0
    while (i < n) {
      var l = math.min(maxSubLen, n - i)
      var hit = -1
      while (l >= 1 && hit < 0) {
        val sub = word.substring(off(i), off(i + l))
        val cand = if (i == 0) sub else "##" + sub
        if (vocab.contains(cand)) hit = l
        l -= 1
      }
      if (hit < 0) {
        // unmatchable position: the whole word is one UNK piece
        return new GenericArrayData(Array[Any](UTF8String.fromString(unk)))
      }
      val sub = word.substring(off(i), off(i + hit))
      out += UTF8String.fromString(if (i == 0) sub else "##" + sub)
      i += hit
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def nullSafeEval(input: Any): Any =
    segment(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordpieceVocab", this,
      classOf[WordPieceEncodeExpr].getName)
    nullSafeCodeGen(ctx, ev, w => {
      s"${ev.value} = $ref.segment($w);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceEncodeExpr =
    copy(child = newChild)
}
