package graft

import org.apache.spark.sql.SparkSession

/** Benchmark entry (driver contract): runs every declared query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. A warmup pass (flagship
  * query at sf0.001) absorbs JVM/codegen startup so per-query timings
  * reflect steady-state cost; the cache is cleared between queries so no
  * query is billed for (or subsidized by) another's cached lineage. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    SparkEntry.entry(spark).count() // warmup: session, codegen, parquet IO

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
