package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class ZOrderSpec extends SparkSuite {

  import spark.implicits._

  test("interleave matches hand-derived Morton codes") {
    // z(5=101b, 3=011b): bit0=a0=1, bit1=b0=1, bit2=a1=0, bit3=b1=1,
    // bit4=a2=1, bit5=b2=0 -> 011011b = 27. And the axes:
    // z(x, 0) spreads x onto even bits; z(0, y) onto odd bits.
    val got = Seq((5L, 3L), (7L, 0L), (0L, 7L), (0L, 0L), (255L, 255L))
      .toDF("a", "b")
      .select(ZOrder.interleave2(col("a"), col("b"), 8).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(27L, 21L, 42L, 0L, 65535L), got.toString)
  }

  test("range partitions on the z-key have small 2-D bounding boxes") {
    // a 64x64 grid of points; 16 range partitions on z cover ~1/16 of the
    // z-space each, i.e. a bounding box ~1/4 x 1/4 of the grid. A
    // lexicographic (a, b) sort would give each partition the FULL b
    // range. This is exactly the property file-statistics skipping needs.
    val grid = (for { a <- 0 until 64; b <- 0 until 64 }
      yield (a.toLong, b.toLong)).toDF("a", "b")
      .withColumn("z", ZOrder.interleave2(col("a"), col("b"), 6))
    val boxes = grid.repartitionByRange(16, col("z"))
      .select(spark_partition_id().as("p"), col("a"), col("b"))
      .groupBy("p")
      .agg((max("a") - min("a")).as("wa"), (max("b") - min("b")).as("wb"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(boxes.length == 16)
    // a perfect 16-way z-split gives 16x16 quadrants (width 15 each); the
    // sampled range boundaries may straddle a quadrant edge, so demand
    // only that MOST partitions stay quadrant-tight — a lexicographic
    // (a*64+b) key fails outright: EVERY partition spans the full b axis
    // (wb = 63), so zero partitions satisfy the bound
    val tight = boxes.count { case (wa, wb) => wa <= 31 && wb <= 31 }
    assert(tight >= 12, s"only $tight/16 partitions quadrant-tight: " +
      boxes.mkString(","))
  }

  test("the SQL rendering agrees with the Column expression") {
    val df = (0L until 200L).map(i => (i % 17, (i * 7) % 23)).toDF("a", "b")
    df.createOrReplaceTempView("zin")
    val a = df.select(ZOrder.interleave2(col("a"), col("b"), 5).as("z"))
      .collect().map(_.getLong(0)).toSeq
    val b = spark.sql(
      s"SELECT ${ZOrderSql.interleave2("a", "b", 5)} AS z FROM zin")
      .collect().map(_.getLong(0)).toSeq
    assert(a == b)
  }
}
