package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/**
 * JSON Lines corpus ingest — the interchange format pretraining dumps
 * actually arrive in (one JSON object per line: the Dolma, RedPajama,
 * FineWeb, and OSCAR distribution convention).
 *
 * Scale posture for a 100 TB dump:
 *  - the SCHEMA IS SUPPLIED, never inferred — `inferSchema` is a full
 *    extra pass over every byte before the real one;
 *  - JSON Lines is newline-delimited, so the files are SPLITTABLE: Spark
 *    assigns byte ranges and each task parses its own lines — parallelism
 *    is `maxPartitionBytes`-driven, not files-driven;
 *  - malformed lines are QUARANTINED, not dropped or fatal: PERMISSIVE
 *    mode + a corrupt-record column keeps the raw bytes of every bad line
 *    for audit (a 100 TB ingest that silently eats 0.1% of its lines is
 *    how training corpora grow unexplained holes) — parsing stays
 *    map-side;
 *  - a known Spark restriction: a query referencing ONLY the corrupt
 *    column over a json relation is rejected — [[quarantineStats]]
 *    therefore counts a data column alongside it.
 */
object Jsonl {

  val CorruptCol = "_corrupt_record"

  /** Schema'd PERMISSIVE read: `schema`'s fields parse, malformed lines
    * land whole in [[CorruptCol]] with every data field null. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** The clean stream: rows that parsed, corrupt column dropped. The
    * `length(coalesce(w, '')) >= 0` conjunct is always true; its job is to
    * keep a data column in the scan's required schema under COUNT-shaped
    * consumers — `clean(df).count()` prunes every data column, leaving the
    * corrupt-only scan Spark rejects (`a === a` does NOT work here:
    * SimplifyBinaryComparison folds it for non-nullable sides). Because
    * the predicate is universally true it is also safe under JSON filter
    * pushdown's mid-parse evaluation (see [[quarantined]] for why a
    * witness filter with real selectivity is NOT safe there). */
  def clean(df: DataFrame): DataFrame = {
    val w = col(df.columns.find(_ != CorruptCol).get)
    df.where(col(CorruptCol).isNull &&
        length(coalesce(w.cast("string"), lit(""))) >= 0)
      .drop(CorruptCol)
  }

  /** The quarantine stream: raw bytes of every malformed line, plus the
    * (always-null today) parsed key — selected, never FILTERED on: the
    * witness in the projection is what keeps a data column in the scan's
    * required schema (see [[quarantineStats]]), and a filter would be
    * pushed into the JSON parser where it evaluates against MID-PARSE
    * partial values and silently drops quarantine rows whose key parsed
    * before the malformation (observed: `{"id":2,"text":"untermin…` lost
    * under a pushed `id IS NULL`). */
  def quarantined(df: DataFrame, witnessCol: String): DataFrame =
    df.where(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"),
        col(witnessCol).as("partial_key"))

  /** One-row ingest audit: total / parsed / quarantined / parsed-with-key.
    * One map-side combinable aggregate over the single parse pass. The
    * `witnessCol` count is both a real audit column (parsed lines missing
    * their key are their own data bug) and what keeps a DATA field in the
    * scan's required schema — Spark rejects corrupt-column-only queries
    * over json relations, and column pruning would otherwise reduce this
    * aggregate to exactly that. */
  def quarantineStats(df: DataFrame, witnessCol: String): DataFrame =
    df.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col(CorruptCol).isNull, 1L).otherwise(0L)).as("n_good"),
      sum(when(col(CorruptCol).isNotNull, 1L).otherwise(0L)).as("n_bad"),
      count(col(witnessCol)).as("n_with_key"))
}
