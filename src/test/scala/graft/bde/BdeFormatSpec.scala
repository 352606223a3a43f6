package graft.bde

import java.nio.file.Files

import graft.SparkSuite

/** Golden tests for the BDE reader against the three reference fixtures
  * (mirrors t/linz_bde_uploader.t:656-711,1264-1281). */
class BdeFormatSpec extends SparkSuite {

  private val fixtures = "/root/reference/t/data"

  test("pab1.crs header: fields, schema, timestamps") {
    val h = BdeFormat.parseHeader(spark, s"$fixtures/pab1.crs")
    assert(h.version == "2.0.0")
    assert(h.table == "crs_parcel_bndry")
    assert(h.columns.map(_.name) ==
      Seq("pri_id", "sequence", "lin_id", "reversed", "audit_id"))
    assert(h.columns.map(_.bdeType) ==
      Seq("integer", "integer", "integer", "char", "integer"))
    assert(h.columns.last.nullable == false) // audit_id NOT NULL
    assert(h.startTime.exists(_.toString.startsWith("2016-06-01 17:12:25")))
    assert(h.endTime.exists(_.toString.startsWith("2016-06-01 17:12:25")))
    assert(h.size.contains(562L))
    assert(h.dataStartOffset > 0)
  }

  test("pab1.crs data region: 3 typed rows, first row included") {
    val rows = BdeFormat.readFile(spark, s"$fixtures/pab1.crs")
      .orderBy("pri_id").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getInt(0)).toSeq == Seq(4457326, 4457327, 4457328))
    assert(rows.head.getInt(1) == 3)
    assert(rows.head.getString(3) == "Y")
    assert(rows.head.getInt(4) == 80401150)
  }

  test("xaud.crs: datetime column typed, 6 rows") {
    val df = BdeFormat.readFile(spark, s"$fixtures/xaud.crs")
    assert(df.schema("timestamp").dataType.typeName == "timestamp")
    val rows = df.orderBy("id").collect()
    assert(rows.length == 6)
    assert(rows.head.getTimestamp(4).toString.startsWith("2016-06-01 17:12:17"))
    assert(rows.map(_.getString(3)).toSeq == Seq("D", "I", "I", "I", "U", "U"))
  }

  test("utf8.crs round-trips U+266F/266D/266E/2013") {
    val rows = BdeFormat.readFile(spark, s"$fixtures/utf8.crs")
      .orderBy("id").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("♯", "♭", "♮", "–"))
  }

  test("empty field maps to NULL for all types") {
    val content =
      """HEDR	 2.0.0
        |START	 2020-01-01 00:00:00
        |END	 2020-01-01 00:00:00
        |TABLE	 t
        |COLUMN	 id integer NULL
        |COLUMN	 name varchar NULL
        |COLUMN	 ts datetime NULL
        |{CRS-DATA}
        |1||2020-06-01 12:00:00|
        ||abc||
        |""".stripMargin
    val f = Files.createTempFile("bde-null", ".crs")
    Files.writeString(f, content)
    val rows = BdeFormat.readFile(spark, f.toString)
      .orderBy(org.apache.spark.sql.functions.col("id").asc_nulls_last).collect()
    assert(rows.length == 2)
    assert(rows(0).getInt(0) == 1)
    assert(rows(0).isNullAt(1))        // '' -> NULL for varchar too
    assert(!rows(0).isNullAt(2))
    assert(rows(1).isNullAt(0))
    assert(rows(1).getString(1) == "abc")
    assert(rows(1).isNullAt(2))
  }

  test("mutated level-5 fixture matches the reference sed edits") {
    val orig = Files.readString(java.nio.file.Paths.get(fixtures, "pab1.crs"))
    val mutated = E2E.mutateLevel5(orig)
    assert(mutated.contains("4457328|10|29694591|Y|80401148|"))
    assert(mutated.contains("4457327|20|29694578|N|80401149|"))
    assert(mutated.contains("4457326|3|11960041|Y|100|"))
    assert(mutated.contains("4457329|4|10000000|Y|300|"))
    assert(mutated.contains("4457330|5|20000000|Y|400|"))
    assert(mutated.contains("SIZE 602"))
    assert(!mutated.contains("80401150"))
  }

  test("selectValidColumns: case-insensitive intersection, file order, zero overlap errors") {
    import spark.implicits._
    val df = Seq((1, "a", 2.0)).toDF("x", "y", "z")
    assert(BdeFormat.selectValidColumns(df, Seq("Z", "X")).columns.toSeq ==
      Seq("x", "z")) // file order, not table order
    intercept[IllegalArgumentException] {
      BdeFormat.selectValidColumns(df, Seq("nope"))
    }
  }
}
