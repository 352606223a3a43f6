package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

/**
 * CSV corpus ingest with the same quarantine contract as [[Jsonl]] — the
 * other format dumps actually arrive in. Same posture: schema SUPPLIED
 * (never inferred — a second full pass at 100 TB), PERMISSIVE parse with
 * malformed lines kept whole in the corrupt column, and the same two
 * Spark sharp edges (corrupt-column-only queries rejected; filters
 * pushed into the parser see mid-parse partials) — so [[Jsonl.clean]] /
 * [[Jsonl.quarantined]] / [[Jsonl.quarantineStats]] apply unchanged to
 * the frame this returns; thin aliases below keep call sites honest.
 *
 * CSV-specific: `multiLine` stays FALSE — quoted newlines would make
 * records span lines and the files would stop being SPLITTABLE (one
 * task per file instead of per byte range); a dump with embedded
 * newlines should ship as JSONL instead.
 */
object Csv {

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(Jsonl.CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", Jsonl.CorruptCol)
      .option("header", "false")
      .option("quote", "\"")
      .option("escape", "\"")
      .csv(path)

  def clean(df: DataFrame): DataFrame = Jsonl.clean(df)

  def quarantined(df: DataFrame, witnessCol: String): DataFrame =
    Jsonl.quarantined(df, witnessCol)

  def quarantineStats(df: DataFrame, witnessCol: String): DataFrame =
    Jsonl.quarantineStats(df, witnessCol)
}
