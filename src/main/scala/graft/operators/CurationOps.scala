package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines (SURVEY §7.6
  * extension): the steps between "near-dup pairs exist" and "a curated
  * training set ships".
  *
  *  - [[connectedComponents]] / dedup_clusters: pair lists are not
  *    actionable — keep-one-per-cluster needs the transitive closure.
  *    Iterative neighbor-min label propagation; every round is one
  *    shuffle join + partial-aggregated min, O(cluster diameter) rounds.
  *  - sample_split: deterministic hash-mod train/val/test assignment —
  *    the split survives reruns, re-partitioning and incremental ingest
  *    (a random() split does not). Pure column expressions at scan speed.
  *  - curation_topk: best-k documents per language by quality score —
  *    the per-group selection step of quality filtering.
  *  - text_doc_freq: document frequency of tokens (vocabulary building
  *    with a min-df floor). explode + count benefits from map-side
  *    partial aggregation, so stopword skew never concentrates raw rows.
  */
object CurationOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "documents")
  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "embeddings")

  // ---------------------------------------------------------------------
  // Connected components (duplicate-cluster resolution)
  // ---------------------------------------------------------------------

  /** Transitive closure of an undirected edge list (`id_a`, `id_b`) into
    * (node, component) where component = min node id reachable.
    *
    * Neighbor-min propagation: comp(v) <- min(comp(v), min over
    * neighbors' comp). Converges in O(diameter) rounds — near-dup
    * clusters are shallow (a dup of a dup of X is still ~X), so the loop
    * is short in practice; `maxIter` bounds pathological chains.
    * Each round is ONE shuffle (join on dst + min-agg on src, both
    * partial-aggregated); lineage is truncated per round so plan
    * canonicalization cost stays constant. The driver-side loop only
    * schedules rounds and reads one converged-count per round — no row
    * data ever reaches the driver. (Large-star/small-star would halve
    * round count at extreme diameters; not needed at near-dup shapes.)
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val und = edges
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = und.select(col("src").as("node")).distinct()
      .withColumn("comp", col("node"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      iter += 1
      val nbrMin = und
        .join(labels.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src").as("node"))
        .agg(min(col("comp")).as("nbr_comp"))
      val next = labels.alias("l")
        .join(nbrMin.alias("n"), Seq("node"), "left")
        .select(col("node"),
          least(col("l.comp"), coalesce(col("n.nbr_comp"), col("l.comp")))
            .as("comp"))
        .localCheckpoint()
      changed = next.alias("a")
        .join(labels.select(col("node"), col("comp").as("old")).alias("b"),
          "node")
        .filter(col("a.comp") =!= col("b.old")).count()
      labels = next
    }
    labels
  }

  /** Near-dup clusters over embedding-cosine edges: the corpus plus TWO
    * perturbed copies of each doc_id < 10 (scaled 1.001 and 1.002 — same
    * direction, cosine 1), so every cluster is a triangle {x, x', x''}
    * that closure must collapse to one component. Oracled against
    * DuckDB's recursive-CTE transitive closure over the identical edge
    * set (edge equality holds for the same reason dedup_embedding_cosine
    * is oracle-able: dup pairs sit at cosine ~1.0, non-dup pairs below
    * ~0.5 — nothing near the 0.99 threshold). */
  val dedupClusters: GraftQuery = GraftQuery(
    "dedup_clusters",
    (s, dir) => {
      val base = emb(s, dir).select(col("vec_id"), col("embedding"))
      def copy(offset: Int, scale: String) =
        emb(s, dir).filter(col("vec_id") < 10)
          .select((col("vec_id") + offset).as("vec_id"),
            expr(s"transform(embedding, x -> x * CAST($scale AS FLOAT))")
              .as("embedding"))
      val all = DedupOps
        .normalizedWithBucket(
          base.unionAll(copy(1000000, "1.001")).unionAll(copy(2000000, "1.002")))
        .localCheckpoint()
      val a = all.select(col("vec_id").as("id_a"), col("bucket"),
        col("unit").as("u_a"))
      val b = all.select(col("vec_id").as("id_b"), col("bucket"),
        col("unit").as("u_b"))
      val edges = a.join(b, Seq("bucket"))
        .filter(col("id_a") < col("id_b"))
        .filter(graft.functions.Vec.vec_dot(col("u_a"), col("u_b")) >= 0.99)
        .select(col("id_a"), col("id_b"))
      connectedComponents(edges)
    },
    Some(
      """WITH RECURSIVE all_v AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 1000000,
        |    list_transform(embedding, x -> x * CAST(1.001 AS FLOAT))
        |  FROM embeddings WHERE vec_id < 10
        |  UNION ALL
        |  SELECT vec_id + 2000000,
        |    list_transform(embedding, x -> x * CAST(1.002 AS FLOAT))
        |  FROM embeddings WHERE vec_id < 10),
        |edges AS (
        |  SELECT a.vec_id AS ia, b.vec_id AS ib FROM all_v a, all_v b
        |  WHERE a.vec_id < b.vec_id
        |    AND list_cosine_similarity(a.embedding, b.embedding) >= 0.99),
        |und AS (SELECT ia AS a, ib AS b FROM edges
        |        UNION SELECT ib, ia FROM edges),
        |reach AS (
        |  SELECT a, b FROM und
        |  UNION
        |  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a)
        |SELECT a AS node, least(a, min(b)) AS component
        |FROM reach GROUP BY a""".stripMargin))

  // ---------------------------------------------------------------------
  // Deterministic train/val/test split
  // ---------------------------------------------------------------------

  /** Hash-mod split: bucket = md5("split:" + doc_id) taken 4 hex nibbles
    * at a time, mod 100; 80/10/10 by bucket range. Deterministic across
    * engines, reruns, partitionings, and ingest order — the property a
    * training pipeline needs so examples never migrate between train and
    * eval. Salting the key ("split:") decorrelates this split from any
    * other hash use of doc_id. */
  val sampleSplit: GraftQuery = GraftQuery(
    "sample_split",
    (s, dir) =>
      docs(s, dir)
        .withColumn("hx", md5(concat(lit("split:"), col("doc_id").cast("string"))))
        .withColumn("bucket", expr(
          """((locate(substring(hx, 1, 1), '0123456789abcdef') - 1) * 4096
            | + (locate(substring(hx, 2, 1), '0123456789abcdef') - 1) * 256
            | + (locate(substring(hx, 3, 1), '0123456789abcdef') - 1) * 16
            | + (locate(substring(hx, 4, 1), '0123456789abcdef') - 1)) % 100"""
            .stripMargin))
        .select(col("doc_id"), col("bucket"),
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val")
            .otherwise("test").as("split")),
    Some(
      """SELECT doc_id, bucket,
        |  CASE WHEN bucket < 80 THEN 'train'
        |       WHEN bucket < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM (
        |  SELECT doc_id,
        |    ((instr('0123456789abcdef', substr(hx, 1, 1)) - 1) * 4096
        |     + (instr('0123456789abcdef', substr(hx, 2, 1)) - 1) * 256
        |     + (instr('0123456789abcdef', substr(hx, 3, 1)) - 1) * 16
        |     + (instr('0123456789abcdef', substr(hx, 4, 1)) - 1)) % 100
        |      AS bucket
        |  FROM (SELECT doc_id,
        |          md5('split:' || CAST(doc_id AS VARCHAR)) AS hx
        |        FROM documents))""".stripMargin))

  // ---------------------------------------------------------------------
  // Per-group quality selection
  // ---------------------------------------------------------------------

  /** Top-3 documents per language by integer quality score
    * ([[TextOps.qualityBpSparkSql]]) — per-group top-k via ranked window;
    * group cardinality (languages) is small, per-group sort is the
    * shuffle, exactly the shape Spark's WindowExec handles. */
  val curationTopK: GraftQuery = GraftQuery(
    "curation_topk",
    (s, dir) => {
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("quality_bp").desc, col("doc_id"))
      docs(s, dir)
        .select(col("lang"), col("doc_id"),
          expr(TextOps.qualityBpSparkSql).as("quality_bp"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
    },
    Some(
      s"""SELECT lang, doc_id, quality_bp, rnk FROM (
         |  SELECT lang, doc_id,
         |    ${TextOps.qualityBpDuckSql} AS quality_bp,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY ${TextOps.qualityBpDuckSql} DESC, doc_id) AS rnk
         |  FROM documents)
         |WHERE rnk <= 3""".stripMargin))

  // ---------------------------------------------------------------------
  // Vocabulary / document frequency
  // ---------------------------------------------------------------------

  /** Document frequency of whitespace tokens with a min-df floor —
    * vocabulary building. array_distinct BEFORE explode keeps the
    * shuffle at one row per (doc, distinct token); count() partial-aggs
    * map-side, so even 'the' never concentrates raw rows on one
    * reducer. */
  val docFreq: GraftQuery = GraftQuery(
    "text_doc_freq",
    (s, dir) =>
      docs(s, dir)
        .select(explode(array_distinct(split(lower(col("text")), "\\s+")))
          .as("token"))
        .filter(col("token") =!= "")
        .groupBy("token").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 25),
    Some(
      """SELECT token, count(*) AS df FROM (
        |  SELECT doc_id,
        |    unnest(list_distinct(regexp_split_to_array(lower(text), '\s+')))
        |      AS token
        |  FROM documents)
        |WHERE token <> ''
        |GROUP BY token HAVING count(*) >= 25""".stripMargin))

  val all: Seq[GraftQuery] =
    Seq(dedupClusters, sampleSplit, curationTopK, docFreq)
}
