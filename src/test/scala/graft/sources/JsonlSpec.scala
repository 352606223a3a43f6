package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.SparkSuite

class JsonlSpec extends SparkSuite {
  import spark.implicits._

  private val schema = new StructType()
    .add("id", LongType).add("text", StringType)

  private def writeFixture(lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("jsonl_test").toString
    lines.toDF("value").coalesce(1).write.mode("overwrite").text(dir)
    dir
  }

  test("clean parses good lines, quarantine keeps bad bytes verbatim") {
    val dir = writeFixture(Seq(
      """{"id":1,"text":"hello"}""",
      """{"id":2,"text":"unterminated""",     // malformed
      """{"id":3,"text":"world"}""",
      """not json at all"""))
    val df = Jsonl.read(spark, dir, schema)
    val good = Jsonl.clean(df).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(good.toSeq == Seq((1L, "hello"), (3L, "world")))
    val bad = Jsonl.quarantined(df, "id").collect()
      .map(r => (r.getString(0), r.isNullAt(1)))
      .sortBy(_._1)
    assert(bad.toSeq == Seq(("""not json at all""", true),
      ("""{"id":2,"text":"unterminated""", true)), bad.mkString(","))
  }

  test("quarantineStats counts from one pass; witness rides along") {
    val dir = writeFixture(Seq(
      """{"id":1,"text":"a"}""",
      """{"text":"keyless"}""",               // parses, id null
      """broken"""))
    val row = Jsonl.quarantineStats(
      Jsonl.read(spark, dir, schema), "id").collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
      == ((3L, 2L, 1L, 1L)), row.toString)
  }

  test("csv: type violations quarantine; quoted fields round-trip") {
    val dir = writeFixture(Seq(
      """1,en,"hello, world"""",      // quoted comma survives
      """x2,en,"broken id"""",        // LONG violation -> corrupt
      """3,fr,"says ""hi"" twice""""  // doubled-quote escape
    ))
    val df = Csv.read(spark, dir, schema2)
    val good = Csv.clean(df).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(2)))
    assert(good.toSeq == Seq((1L, "hello, world"), (3L, "says \"hi\" twice")),
      good.mkString(";"))
    val stats = Csv.quarantineStats(df, "doc_id").collect().head
    assert((stats.getLong(0), stats.getLong(1), stats.getLong(2)) ==
      ((3L, 2L, 1L)), stats.toString)
  }

  private val schema2 = new StructType()
    .add("doc_id", LongType).add("lang", StringType).add("text", StringType)

  test("json escaping round-trips: quotes, backslashes, unicode escapes") {
    val texts = Seq("with \"quotes\"", "back\\slash", "tab\there",
      "café ’")
    val dir = writeFixture(texts.zipWithIndex.map { case (t, i) =>
      val j = Seq((i.toLong, t)).toDF("id", "text")
        .select(to_json(struct(col("id"), col("text"))))
        .collect().head.getString(0)
      j
    })
    val got = Jsonl.clean(Jsonl.read(spark, dir, schema))
      .orderBy("id").collect().map(_.getString(1)).toSeq
    assert(got == texts, got.toString)
  }
}
