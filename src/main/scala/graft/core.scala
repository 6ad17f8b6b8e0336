package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named engine query with an optional DuckDB oracle SQL.
  *
  * Every operator the engine declares (SURVEY.md §2) is exposed as one of
  * these; the driver's correctness gate runs `fn` at sf0.01 and compares the
  * result against `oracle` executed by DuckDB over the same parquet tables.
  * Queries whose semantics are not expressible in portable SQL (sketches,
  * LSH, ANN) carry `oracle = None` and get a rows-only check.
  */
final case class GraftQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]) {
  def tuple: (String, (SparkSession, String) => DataFrame) = name -> fn
}

/** Parquet table loaders for the driver corpus (TESTDATA.md). */
object Tables {
  import org.apache.spark.sql.functions._

  val relational: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings")

  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) in some corpus
    * drops and TIMESTAMP_MICROS in others, so the loader adapts to the read
    * schema rather than assuming one encoding:
    *   - `LongType`: the nanosAsLong path (sessions set
    *     `spark.sql.legacy.parquet.nanosAsLong=true`, see [[GraftSession]]);
    *     normalize long nanos to a micros-precision TimestampType
    *     (truncating, matching DuckDB's `CAST(ts_ns AS TIMESTAMP)`).
    *   - `TimestampNTZType`: micros without UTC adjustment; cast to the
    *     session-TZ TimestampType (UTC session → same instant) so downstream
    *     `unix_timestamp`/`window` calls see one type everywhere.
    *   - `TimestampType`: pass through. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") {
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      df.schema("ts").dataType match {
        // NB: integer `div`, not `/` — epoch nanos exceed double precision,
        // so float division would corrupt the low microseconds.
        case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
        case _                => df
      }
    } else df
  }
}

/** Standard session configuration for the engine: every entry point (Verify,
  * Bench, tests) funnels through here so pushdown/AQE/timezone behavior is
  * identical everywhere. */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
}
