package graft

import org.apache.spark.sql.functions._

/**
 * Guards the synthetic-fixture id band: every SparkEntry fixture that
 * unions crafted or shifted rows into a real table places them at
 * `real_id + k * 10_000_000` (k = 1..5) or at literal ids above
 * 20_000_000 (the Gopher violator arms). If a larger scale factor ever
 * grows a real table past the band floor, synthetic ids would collide
 * with real ones and the oracle comparison would stay green while the
 * fixture silently stopped testing what it claims — both engines would
 * compute the same collided answer. This spec makes that failure LOUD:
 * it asserts the real id domains at every available sf dir sit strictly
 * below the band.
 */
class FixtureBandSpec extends SparkSuite {

  private val BandFloor = 10000000L

  private def sfDirs: Seq[String] = {
    val root = new java.io.File("/root/testdata")
    Option(root.listFiles()).getOrElse(Array.empty).toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("sf"))
      .map(_.getAbsolutePath).sorted
  }

  test("real id domains stay below the synthetic-fixture band") {
    assert(sfDirs.nonEmpty, "no /root/testdata/sf* dirs found")
    for (dir <- sfDirs) {
      val maxDoc = spark.read.parquet(s"$dir/documents.parquet")
        .agg(max(col("doc_id"))).collect().head.getLong(0)
      val maxVec = spark.read.parquet(s"$dir/embeddings.parquet")
        .agg(max(col("vec_id"))).collect().head.getLong(0)
      assert(maxDoc < BandFloor,
        s"$dir documents max doc_id $maxDoc collides with fixture band")
      assert(maxVec < BandFloor,
        s"$dir embeddings max vec_id $maxVec collides with fixture band")
    }
  }
}
