package graft.tools

import java.nio.file.{Files, Paths}

import graft.{GraftSession, SparkEntry}

/** Builder-side plan dump: `.explain("formatted")` of named declared
  * queries to <outDir>/<name>_<tag>.txt — the optimization-round
  * evidence files (plans/r20/). Not shipped engine behavior. */
object Plans {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(s"$outDir/${n}_$tag.txt"), txt)
      println(s"[plans] wrote $outDir/${n}_$tag.txt")
    }
    spark.stop()
  }
}
