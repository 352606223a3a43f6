package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Hashed-linear-classifier trainer: hand-checked first round, learned
  * separation, and bit-exact partitioning independence. */
class ClassifierSpec extends SparkSuite {
  import spark.implicits._

  private val S = Classifier.Scale

  test("round 1 from zero weights is the hand-derived update") {
    // zero model -> every margin 0 -> p = 0.5 exactly:
    // rq = floor((0.5 - y) * S) = +S/2 (y=0) / -S/2 (y=1)
    val df = Seq(("good good", 1L), ("bad bad", 0L)).toDF("text", "y")
    val m = Classifier.train(df, "text", "y", buckets = 64, iters = 1)
    // n=2: per occurrence rq sums; 'good' cell g = 2 * (-S/2) = -S,
    // delta = floor(-S/2) -> w = +S/2; 'bad' cell symmetric -> -S/2
    val nonzero = m.wUnits.filter(_ != 0L).sorted.toSeq
    assert(nonzero == Seq(-S / 2, S / 2), nonzero.toString)
    // bias: rq sum = -S/2 + S/2 = 0 -> bias unchanged
    assert(m.biasUnits == 0L)
  }

  test("training separates an obviously separable corpus") {
    val good = (0 until 30).map(i =>
      (s"excellent prose with careful structure sample$i", 1L))
    val bad = (0 until 30).map(i =>
      (s"zzz spam garbage noise junk blob$i", 0L))
    val df = (good ++ bad).toDF("text", "y")
    val model = Classifier.train(df, "text", "y",
      buckets = 1024, iters = 4)
    val scored = Classifier.score(
      df.withColumn("id", monotonically_increasing_id()), "id", "text", model)
      .join(df.withColumn("id", monotonically_increasing_id()), "id")
    val agree = scored.where(
      (col("keep") && col("y") === 1L) || (!col("keep") && col("y") === 0L))
      .count()
    assert(agree == 60L, s"only $agree/60 classified correctly")
  }

  test("the trained model is bit-identical under any partitioning") {
    val df = (0 until 100).map(i =>
      (s"document number $i with shared words tok${i % 7} tok${i % 11}",
        (i % 3 == 0).compare(false).toLong)).toDF("text", "y")
    val m1 = Classifier.train(df.repartition(1), "text", "y",
      buckets = 256, iters = 3)
    val m7 = Classifier.train(df.repartition(7, col("y")), "text", "y",
      buckets = 256, iters = 3)
    assert(m1.wUnits.toSeq == m7.wUnits.toSeq && m1.biasUnits == m7.biasUnits,
      "integer micro-unit aggregation must make training order-independent")
  }

  test("empty docs train through the bias only; empty corpus refused") {
    val df = Seq(("", 1L), ("", 1L)).toDF("text", "y")
    val m = Classifier.train(df, "text", "y", buckets = 16, iters = 1)
    assert(m.wUnits.forall(_ == 0L))
    // all-ones labels: rq = -S/2 each, gBias = -S, delta = floor(-S/2)
    assert(m.biasUnits == S / 2)
    intercept[IllegalArgumentException] {
      Classifier.train(df.where(col("y") === 99), "text", "y")
    }
  }
}
