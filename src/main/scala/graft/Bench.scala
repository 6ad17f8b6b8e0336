package graft

import org.apache.spark.sql.SparkSession

/** Benchmark entry (driver contract): runs every declared query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Noise controls (the bench box shows real wall-clock swings between
  * identical runs):
  *   - warmup reads every table once (parquet footers, codegen, session),
  *     so no query is billed for first-touch IO;
  *   - each query runs twice and the minimum is recorded (best-of-2 —
  *     the min is the stable estimator under one-sided load noise);
  *   - the cache is cleared between queries so no query is subsidized by
  *     another's cached lineage.
  *
  * Failures are explicit: a crashing query records -1 and its name goes
  * into an "errors" list — never a silent elapsed-until-throw time.
  * Timings are rounded to milliseconds to keep the JSON line short (the
  * driver captures a bounded tail of stdout; a bloated line gets its head
  * truncated and fails to parse).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: session + codegen via the flagship, then one count per table
    // so parquet footer reads and scan codegen are off every query's clock.
    SparkEntry.entry(spark).count()
    Tables.relational.foreach { name =>
      try Tables.t(spark, sfDir, name).count()
      catch { case _: Throwable => () }
    }

    def timed(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }

    val errors = Seq.newBuilder[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val best =
        try math.min(timed(fn), timed(fn))
        catch { case _: Throwable => errors += name; -1.0 }
      name -> (math.round(best * 1000.0) / 1000.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.result().map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = math.round(results.map(_._2).filter(_ >= 0).sum * 1000.0) / 1000.0
    spark.stop()
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
  }
}
