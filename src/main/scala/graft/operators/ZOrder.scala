package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Z-ORDER (Morton) interleaving — the multi-dimensional clustering key
 * behind Delta/Iceberg `OPTIMIZE ZORDER BY`: interleaving the bits of two
 * quantized dimensions makes rows close in BOTH dimensions close in the
 * one-dimensional key, so range-partitioning by the key gives every
 * partition a small bounding box in (d1, d2) — and min/max file statistics
 * can then skip files for predicates on EITHER dimension, where sorting by
 * (d1, d2) lexicographically helps only d1.
 *
 * The interleave is pure integer bit arithmetic (shift/and/or), codegen'd
 * as a per-row projection — zero shuffle to compute; the clustering write
 * is one `repartitionByRange(zkey)` (a range shuffle Spark already does
 * for sorted writes).
 */
object ZOrder {

  /** Morton-interleave two non-negative `bits`-bit integers: dimension
    * `a` occupies even bit positions, `b` odd — z = Σᵢ a_i·4ⁱ + 2·b_i·4ⁱ. */
  def interleave2(a: Column, b: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, "zorder: bits must be in [1, 31]")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }
}

/** DuckDB rendering of [[ZOrder.interleave2]] — the same shift/and/or
  * terms (the spec pins the intent with hand-derived literals). */
object ZOrderSql {
  def interleave2(a: String, b: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((((($a) >> $i) & 1) << ${2 * i}) | (((($b) >> $i) & 1) << ${2 * i + 1}))"
    }.mkString("(", " | ", ")")
}
