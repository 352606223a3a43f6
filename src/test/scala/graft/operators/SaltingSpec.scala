package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class SaltingSpec extends SparkSuite {
  import spark.implicits._

  private def skewed = (1 to 400).map(i =>
    (i.toLong, if (i % 10 == 0) "cold" else "hot", i.toLong)) // 90% one key
    .toDF("id", "key", "v")

  test("salted aggregate equals the one-stage aggregate exactly") {
    val salted = Salting.aggregate(skewed, Seq("key"), salts = 7,
        Seq(Salting.Agg("count", "key", "n"),
          Salting.Agg("sum", "v", "sum_v"),
          Salting.Agg("min", "v", "min_v"),
          Salting.Agg("max", "v", "max_v")))
      .orderBy("key").collect().map(_.toSeq).toSeq
    val plain = skewed.groupBy("key")
      .agg(count(lit(1)).as("n"), sum("v").as("sum_v"),
        min("v").as("min_v"), max("v").as("max_v"))
      .orderBy("key").collect().map(_.toSeq).toSeq
    assert(salted == plain)
  }

  test("salted aggregate spreads the hot key over multiple salt buckets") {
    val df = skewed.withColumn("__salt",
      pmod(hash(struct(col("id"), col("key"), col("v"))), lit(7)))
    val buckets = df.where(col("key") === "hot")
      .select("__salt").distinct().count()
    assert(buckets > 4, s"hot key landed in only $buckets of 7 salt buckets")
  }

  test("salted join equals the plain join, each probe row matched once") {
    val dim = skewed.groupBy("key").agg(sum("v").as("dim_v"))
    val salted = Salting.join(skewed, dim, Seq("key"), salts = 5)
      .select("id", "key", "v", "dim_v")
      .orderBy("id").collect().map(_.toSeq).toSeq
    val plain = skewed.join(dim, Seq("key"))
      .select("id", "key", "v", "dim_v")
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(salted == plain)
    assert(salted.size == 400) // no duplication, no loss
  }

  test("non-decomposable aggregate is rejected") {
    intercept[IllegalArgumentException] {
      Salting.aggregate(skewed, Seq("key"), 4,
        Seq(Salting.Agg("avg", "v", "a")))
    }
  }
}
