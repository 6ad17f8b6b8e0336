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

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 cannot read as
    * a timestamp. Sessions set `spark.sql.legacy.parquet.nanosAsLong=true`
    * (see [[GraftSession]]); the loader normalizes the long nanos to a
    * micros-precision TimestampType (truncating, matching DuckDB's
    * `CAST(ts_ns AS TIMESTAMP)`). */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // NB: integer `div`, not `/` — epoch nanos exceed double precision,
    // so float division would corrupt the low microseconds.
    if (name == "events")
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
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
