package graft.tools

import graft.{GraftSession, SparkEntry}

/** Builder-side diagnostic: per-query wall time in isolation vs after the
  * dedup queries, to locate driver-side planning pathologies. */
object Diag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    // args = query names; each runs twice (cold, warm). No args → the
    // historical probe set.
    val queries =
      if (args.nonEmpty) args.toSeq
      else Seq("curation_pipeline", "dedup_ngram_jaccard",
        "dedup_incremental", "dedup_minhash_lsh", "dedup_clusters",
        "dedup_shared_spans", "ann_topk_ivf", "text_decontaminate")
    queries.foreach(q => println(f"[diag] cold $q: ${time(q)}%.2f s"))
    queries.foreach(q => println(f"[diag] warm $q: ${time(q)}%.2f s"))
    spark.stop()
  }
}
