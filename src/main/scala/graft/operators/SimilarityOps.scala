package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (SURVEY §7.6).
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set
  * against the full corpus; the scan side stays partition-parallel and the
  * per-row work is a codegen'd `zip_with`/`aggregate` dot product.
  *
  * Scale path: sign-LSH bucketed search (probe own bucket + hamming-1
  * neighbors). At 100 TB the corpus side is bucketed at write time
  * (`partitionBy(bucket)`), so a probe reads only matching partitions —
  * the ANN analogue of partition pruning. Recall is tunable by probe
  * breadth; this implementation probes 17 of 65536 buckets.
  */
object SimilarityOps {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "embeddings")

  val K = 5
  val NumQueries = 10

  private def unit(df: DataFrame): DataFrame =
    df.withColumn("norm",
        sqrt(expr("aggregate(embedding, 0D, (acc, x) -> acc + x * x)")))
      .filter(col("norm") > 0)
      .withColumn("unit", expr("transform(embedding, x -> x / norm)"))

  private def cosine = expr(
    "aggregate(zip_with(q_unit, unit, (x, y) -> x * y), 0D, (acc, v) -> acc + v)")

  /** Exact top-k neighbors for query vectors vec_id < NumQueries. */
  val bruteForce: GraftQuery = GraftQuery(
    "ann_topk_brute",
    (s, dir) => {
      val all = unit(emb(s, dir))
      val queries = all.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("query_id"), col("unit").as("q_unit"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("vec_id"))
      all.crossJoin(broadcast(queries))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("cos", cosine)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= K)
        .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"))
    },
    Some(
      s"""SELECT query_id, neighbor_id, rank FROM (
         |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY list_cosine_similarity(q.embedding, n.embedding)
         |        DESC, n.vec_id) AS rank
         |  FROM embeddings q, embeddings n
         |  WHERE q.vec_id < $NumQueries AND n.vec_id <> q.vec_id) sub
         |WHERE rank <= $K""".stripMargin))

  /** Bucket bits for the ANN index: 8 bits = 256 coarse cells; probing a
    * cell + its 8 hamming-1 neighbors reads ~3.5% of a uniformly
    * distributed corpus. */
  val IndexBits = 8

  /** LSH-bucketed approximate top-k: probe the query's sign bucket plus
    * all hamming-1 buckets. Rows-only gate (approximate by design); the
    * ScalaTest spec checks recall against brute force. */
  val lshTopK: GraftQuery = GraftQuery(
    "ann_topk_lsh",
    (s, dir) => {
      val all = DedupOps.normalizedWithBucket(emb(s, dir), IndexBits).localCheckpoint()
      val queries = all.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("query_id"), col("unit").as("q_unit"),
          explode(expr(
            s"""concat(array(bucket),
              |  transform(sequence(0, ${IndexBits - 1}),
              |    i -> CAST(bucket AS BIGINT) ^ shiftleft(1L, i)))
              |""".stripMargin)).as("bucket"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("vec_id"))
      all.join(broadcast(queries), Seq("bucket"))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("cos", cosine)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= K)
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          col("rank"), round(col("cos"), 3).as("cos"))
    },
    None)

  val all: Seq[GraftQuery] = Seq(bruteForce, lshTopK)
}
