package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators for training-data pipelines (SURVEY §7.6
  * extension, round 4): the export-side steps after curation — sequence
  * packing, deterministic shuffling, PII redaction, corpus reporting,
  * vocabulary statistics, embedding quantization.
  *
  * The two global-order operators ([[packChunks]], [[sampleShuffle]])
  * share one scale discipline: a total order over the corpus is computed
  * as per-bucket windows (parallel) plus a cumulative offset over ONE ROW
  * PER BUCKET (broadcast back) — the same decomposition as
  * `ChainOps.identityMismatchesScalable` — so nothing ever single-
  * partitions the data. The naive global-window twins exist only as spec
  * oracles ([[packChunksNaive]], [[sampleShuffleNaive]]).
  */
object CorpusOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "documents")
  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "embeddings")

  // ---------------------------------------------------------------------
  // Scalable global-order helper
  // ---------------------------------------------------------------------

  /** Cumulative offsets of per-bucket totals: (b, total) -> (b, offset)
    * where offset = sum of totals of all lower buckets. The only ordered
    * window runs over O(buckets) rows — broadcast the result back. */
  private def bucketOffsets(perBucket: DataFrame): DataFrame = {
    val w = Window.orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    perBucket
      .withColumn("offset", coalesce(sum(col("total")).over(w), lit(0L)))
      .select(col("b"), col("offset"))
  }

  // ---------------------------------------------------------------------
  // Sequence packing (concat-and-chunk)
  // ---------------------------------------------------------------------

  /** Token budget per packed training chunk. */
  val ChunkBudget = 2048L

  /** Upper bound on the bucket count the global-order decomposition may
    * produce: the cumulative-offset window sorts one row per bucket, so
    * this caps that window's input regardless of corpus size. 64k rows
    * sort in milliseconds on the driver-adjacent single partition. */
  val TargetBuckets = 65536L

  /** GPT-style sequence packing: documents are concatenated in doc_id
    * order and cut every [[ChunkBudget]] tokens; each doc gets its global
    * token offset, its chunk id, and how many chunk boundaries it
    * straddles. This is the concat-and-chunk packing a pretraining
    * tokenizer run performs — computing it relationally makes the batch
    * layout (and its boundary-crossing waste) queryable before any
    * tokenizer runs.
    *
    * Scale shape: the global running token total decomposes into a
    * per-bucket window (parallel; bucket = doc_id div bucket size) plus
    * cumulative bucket totals over one row per bucket. No data-row global
    * window anywhere.
    *
    * The bucket size scales with the corpus: by default it is derived
    * from max(doc_id) so the bucket count never exceeds [[TargetBuckets]]
    * — at any corpus size the ordered offset window sees at most 64k
    * rows. The one-column max() is a pushed-down parquet-footer
    * aggregate, not a data scan. Results are bucket-size independent
    * (CorpusOpsSpec pins this), so callers may pass an explicit size. */
  def packChunks(d: DataFrame, bucketSize: Long = 0L): DataFrame = {
    val bs =
      if (bucketSize > 0L) bucketSize
      else {
        val maxId = Option(d.agg(max(col("doc_id")).cast("long")).head.get(0))
          .fold(0L)(_.asInstanceOf[Long])
        math.max(100L, maxId / TargetBuckets + 1L)
      }
    val t = d.select(col("doc_id"),
      size(split(col("text"), "\\s+")).cast("long").as("n_tokens"),
      expr("doc_id div " + bs).as("b"))
    val wIn = Window.partitionBy(col("b")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val within = t.withColumn("w_off",
      coalesce(sum(col("n_tokens")).over(wIn), lit(0L)))
    val offsets = bucketOffsets(
      t.groupBy(col("b")).agg(sum(col("n_tokens")).as("total")))
    within.join(broadcast(offsets), Seq("b"))
      .withColumn("tok_offset", col("w_off") + col("offset"))
      .select(col("doc_id"), col("n_tokens"), col("tok_offset"),
        expr(s"tok_offset div $ChunkBudget").as("chunk_id"),
        expr(s"(tok_offset + n_tokens - 1) div $ChunkBudget" +
          s" - tok_offset div $ChunkBudget").as("spans_chunks"))
  }

  /** Global-window form of [[packChunks]] — spec oracle only (single
    * partition by construction). */
  private[graft] def packChunksNaive(d: DataFrame): DataFrame = {
    val w = Window.orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    d.select(col("doc_id"),
        size(split(col("text"), "\\s+")).cast("long").as("n_tokens"))
      .withColumn("tok_offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("n_tokens"), col("tok_offset"),
        expr(s"tok_offset div $ChunkBudget").as("chunk_id"),
        expr(s"(tok_offset + n_tokens - 1) div $ChunkBudget" +
          s" - tok_offset div $ChunkBudget").as("spans_chunks"))
  }

  val packChunksQuery: GraftQuery = GraftQuery(
    "pack_chunks",
    (s, dir) => packChunks(docs(s, dir)),
    Some(
      s"""WITH t AS (
         |  SELECT doc_id,
         |    CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT)
         |      AS n_tokens
         |  FROM documents),
         |o AS (
         |  SELECT doc_id, n_tokens,
         |    COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
         |  FROM t)
         |SELECT doc_id, n_tokens, CAST(off AS BIGINT) AS tok_offset,
         |  CAST(off // $ChunkBudget AS BIGINT) AS chunk_id,
         |  CAST((off + n_tokens - 1) // $ChunkBudget
         |    - off // $ChunkBudget AS BIGINT) AS spans_chunks
         |FROM o""".stripMargin))

  // ---------------------------------------------------------------------
  // Deterministic training-order shuffle
  // ---------------------------------------------------------------------

  /** The shuffle sort key: md5 over a salted doc_id — deterministic
    * across engines, reruns, partitionings, and ingest order (the same
    * reproducibility argument as CurationOps' hash-mod split; the salt
    * decorrelates the shuffle order from the split buckets). */
  private def shuffleKey(c: Column): Column =
    md5(concat(lit("shuf:"), c.cast("string")))

  /** Deterministic global shuffle rank for training export: the position
    * of each doc in md5-key order. A training run that reads chunks in
    * `shuffle_rank` order gets a reproducible, well-mixed document order
    * with no RNG state to persist.
    *
    * Scale shape: a hex-prefix of the key is the bucket (prefix order
    * agrees with full-key order on fixed-width hex), per-bucket
    * row_number runs in parallel, and only the bucket counts pass
    * through an ordered window. The prefix width scales with the corpus
    * (~1M rows per bucket, from the same pushed-down max(doc_id) as
    * [[packChunks]]), capped at 5 nibbles = 1M buckets — enough for
    * ~1e12 docs while the offset window input stays one small row per
    * bucket. Rank is prefix-width independent (CorpusOpsSpec). */
  def sampleShuffle(d: DataFrame, nibbles: Int = 0): DataFrame = {
    val nib =
      if (nibbles > 0) nibbles
      else {
        val n = Option(d.agg(max(col("doc_id")).cast("long")).head.get(0))
          .fold(0L)(_.asInstanceOf[Long]) + 1L
        var k = 1
        var buckets = 16L
        while (buckets * 1000000L < n && k < 5) { k += 1; buckets *= 16L }
        k
      }
    val keyed = d.select(col("doc_id"), shuffleKey(col("doc_id")).as("k"))
      .withColumn("b",
        expr(s"conv(substring(k, 1, $nib), 16, 10)").cast("long"))
    val wIn = Window.partitionBy(col("b")).orderBy(col("k"), col("doc_id"))
    val offsets = bucketOffsets(
      keyed.groupBy(col("b")).agg(count(lit(1)).as("total")))
    keyed.withColumn("rn", row_number().over(wIn).cast("long"))
      .join(broadcast(offsets), Seq("b"))
      .select(col("doc_id"), (col("rn") + col("offset")).as("shuffle_rank"))
  }

  /** Global-window form of [[sampleShuffle]] — spec oracle only. */
  private[graft] def sampleShuffleNaive(d: DataFrame): DataFrame =
    d.select(col("doc_id"), shuffleKey(col("doc_id")).as("k"))
      .withColumn("shuffle_rank", row_number()
        .over(Window.orderBy(col("k"), col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("shuffle_rank"))

  val sampleShuffleQuery: GraftQuery = GraftQuery(
    "sample_shuffle",
    (s, dir) => sampleShuffle(docs(s, dir)),
    Some(
      """SELECT doc_id,
        |  CAST(row_number() OVER (
        |    ORDER BY md5('shuf:' || CAST(doc_id AS VARCHAR)), doc_id)
        |    AS BIGINT) AS shuffle_rank
        |FROM documents""".stripMargin))

  // ---------------------------------------------------------------------
  // Shard export (the trainer-facing output step)
  // ---------------------------------------------------------------------

  /** Docs per shard used by the driver query (real exports pick it from
    * target file size / mean doc size). */
  val DocsPerShard = 100L

  /** Deterministic shard assignment: shard = contiguous range of the
    * [[sampleShuffle]] training order, so (a) membership is a pure
    * function of doc_id — reruns, re-partitioning, and engines agree —
    * (b) shards are size-balanced BY CONSTRUCTION (exactly
    * `docsPerShard` docs each, last one partial), and (c) a trainer
    * streaming shard k then k+1 reads the global shuffle order. Hash-mod
    * sharding gets (a) and roughly (b) but never (c).
    *
    * PRECONDITION: `doc_id` is unique in `d` (true after any of the dedup
    * operators; `Main.curate` also dropDuplicates explicitly). Duplicate
    * ids would make the rank tie-break nondeterministic and the join back
    * in [[writeShards]] multiply rows, breaking the exactly-docsPerShard
    * and shard-count invariants. Not deduped defensively here: that would
    * charge every correct caller an extra full-corpus shuffle. */
  def shardAssignments(d: DataFrame,
      docsPerShard: Long = DocsPerShard): DataFrame =
    sampleShuffle(d)
      .select(col("doc_id"), col("shuffle_rank"),
        expr(s"(shuffle_rank - 1) div $docsPerShard").as("shard"))

  val corpusShards: GraftQuery = GraftQuery(
    "corpus_shards",
    (s, dir) => shardAssignments(docs(s, dir)),
    Some(
      s"""SELECT doc_id, shuffle_rank,
         |  CAST((shuffle_rank - 1) // $DocsPerShard AS BIGINT) AS shard
         |FROM (
         |  SELECT doc_id,
         |    CAST(row_number() OVER (
         |      ORDER BY md5('shuf:' || CAST(doc_id AS VARCHAR)), doc_id)
         |      AS BIGINT) AS shuffle_rank
         |  FROM documents)""".stripMargin))

  /** Physical shard write: one parquet directory per shard, rows sorted
    * by shuffle_rank inside each (`sortWithinPartitions` before a
    * partitioned write = one file per shard in rank order — the layout
    * a data loader streams sequentially). Returns the shard count.
    * The shuffle is one repartition keyed by shard; at 100 TB pick
    * `docsPerShard` so a shard fits an executor's write buffer.
    * Same unique-`doc_id` precondition as [[shardAssignments]]. */
  def writeShards(d: DataFrame, outDir: String,
      docsPerShard: Long = DocsPerShard): Long = {
    d.join(shardAssignments(d, docsPerShard), "doc_id")
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("shuffle_rank"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    // ranks are dense 1..n by construction, so the shard count is
    // ceil(n / docsPerShard) — a scan-only count, not a second pass
    // through the rank/join lineage
    val n = d.count()
    (n + docsPerShard - 1) / docsPerShard
  }

  /** Per-shard statistics computed from the WRITTEN shards (one scan of
    * the at-rest parquet — auditing the artifact itself, not the plan
    * that produced it): docs, token and char totals, and a sorted
    * language histogram when the shards carry a `lang` column. The data
    * card a trainer reads before the data. */
  def shardStats(spark: SparkSession, shardsDir: String): DataFrame = {
    val shards = spark.read.parquet(shardsDir)
    val langAgg =
      if (shards.columns.contains("lang"))
        Seq(sort_array(collect_set(col("lang"))).as("langs"))
      else Seq(array().cast("array<string>").as("langs"))
    val aggs = Seq(
      count(lit(1)).as("n_docs"),
      sum(size(split(col("text"), "\\s+")).cast("long")).as("total_tokens"),
      sum(length(col("text")).cast("long")).as("total_chars")) ++ langAgg
    shards.groupBy(col("shard")).agg(aggs.head, aggs.tail: _*)
  }

  /** Write the [[shardStats]] sidecar INTO the shards directory as
    * `_stats` — underscore-prefixed paths are invisible to parquet
    * readers (the `_SUCCESS` convention), so `spark.read.parquet(out)`
    * over the shards is unaffected. Returns the shard count audited. */
  def writeShardStats(spark: SparkSession, shardsDir: String): Long = {
    val stats = shardStats(spark, shardsDir).localCheckpoint()
    stats.write.mode("overwrite").parquet(s"$shardsDir/_stats")
    stats.count()
  }

  // ---------------------------------------------------------------------
  // PII redaction
  // ---------------------------------------------------------------------

  // These must reach the regex engine verbatim: keep them on the Column
  // API (regexp_extract_all(col, lit(pat), ...)), never interpolated into
  // expr()/SQL text, where Spark's string-literal escape processing would
  // rewrite \b -> backspace, \d -> d, \. -> . before the regex compiles.
  private val EmailPat = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  private val Ipv4Pat = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private val LongNumPat = "\\b\\d{9,}\\b"

  /** Scrubs emails, IPv4s, then long digit runs (in that order — the IP
    * pass must not see digits the number pass already consumed, and vice
    * versa; the three pattern families are mutually non-overlapping on
    * any one span). Pure regexp_replace column stack — scan-speed. */
  def scrubText(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailPat, "<EMAIL>"),
        Ipv4Pat, "<IP>"),
      LongNumPat, "<NUM>")

  /** The synthetic-PII injection: the driver corpus contains no digits at
    * all, so a scrub over it would be vacuous. Deterministic PII keyed
    * off doc_id is appended to a subset of docs — the same
    * injected-workload idiom the dedup family uses (DedupOps
    * .withNearDups) — and the oracle SQL performs the identical
    * injection, so redaction counts and the scrubbed-text digest are
    * exactly comparable. */
  private[graft] def withPii(d: DataFrame): DataFrame =
    d.select(col("doc_id"), concat(col("text"),
      when(expr("doc_id % 7 = 0"),
        concat(lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com"))).otherwise(lit("")),
      when(expr("doc_id % 11 = 0"),
        concat(lit(" host 10."), expr("cast(doc_id % 250 as string)"),
          lit("."), expr("cast(doc_id % 100 as string)"), lit(".7")))
        .otherwise(lit("")),
      when(expr("doc_id % 13 = 0"),
        concat(lit(" ref 9004"),
          lpad(col("doc_id").cast("string"), 6, "0"))).otherwise(lit("")))
      .as("text"))

  val piiScrub: GraftQuery = GraftQuery(
    "text_pii_scrub",
    (s, dir) =>
      withPii(docs(s, dir))
        .select(col("doc_id"),
          size(regexp_extract_all(col("text"), lit(EmailPat), lit(0)))
            .cast("long").as("n_email"),
          size(regexp_extract_all(col("text"), lit(Ipv4Pat), lit(0)))
            .cast("long").as("n_ip"),
          size(regexp_extract_all(col("text"), lit(LongNumPat), lit(0)))
            .cast("long").as("n_num"),
          md5(scrubText(col("text"))).as("scrubbed_fp")),
    Some(
      """WITH pii AS (
        |  SELECT doc_id, text
        |    || CASE WHEN doc_id % 7 = 0 THEN ' contact user'
        |         || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
        |    || CASE WHEN doc_id % 11 = 0 THEN ' host 10.'
        |         || CAST(doc_id % 250 AS VARCHAR) || '.'
        |         || CAST(doc_id % 100 AS VARCHAR) || '.7' ELSE '' END
        |    || CASE WHEN doc_id % 13 = 0 THEN ' ref 9004'
        |         || lpad(CAST(doc_id AS VARCHAR), 6, '0') ELSE '' END
        |    AS text
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS BIGINT)
        |    AS n_email,
        |  CAST(len(regexp_extract_all(text,
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ip,
        |  CAST(len(regexp_extract_all(text, '\b\d{9,}\b')) AS BIGINT)
        |    AS n_num,
        |  md5(regexp_replace(regexp_replace(regexp_replace(text,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\b\d{9,}\b', '<NUM>', 'g')) AS scrubbed_fp
        |FROM pii""".stripMargin))

  // ---------------------------------------------------------------------
  // Corpus report
  // ---------------------------------------------------------------------

  /** Per-language corpus report: doc count, token volume, average doc
    * length, source diversity, mean quality — the summary table a corpus
    * release ships. Integer arithmetic end-to-end (truncating div) for
    * exact cross-engine parity; one partial-aggregated shuffle on a
    * low-cardinality key (count_distinct(source) expands per-group rows
    * to per-(group, source) — still bounded by |lang| x |sources|). */
  val corpusStats: GraftQuery = GraftQuery(
    "corpus_stats",
    (s, dir) =>
      docs(s, dir)
        .select(col("lang"), col("source"),
          length(col("text")).cast("long").as("chars"),
          size(split(col("text"), "\\s+")).cast("long").as("toks"),
          expr(TextOps.qualityBpSparkSql).as("q_bp"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("toks")).as("total_tokens"),
          expr("sum(chars) div count(1)").as("avg_chars"),
          countDistinct(col("source")).as("n_sources"),
          expr("sum(q_bp) div count(1)").as("mean_quality_bp")),
    Some(
      s"""SELECT lang,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(len(regexp_split_to_array(text, '\\s+'))) AS BIGINT)
         |    AS total_tokens,
         |  CAST(sum(length(text)) // count(*) AS BIGINT) AS avg_chars,
         |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         |  CAST(sum(${TextOps.qualityBpDuckSql}) // count(*) AS BIGINT)
         |    AS mean_quality_bp
         |FROM documents GROUP BY lang""".stripMargin))

  // ---------------------------------------------------------------------
  // Vocabulary statistics (one BPE merge-step view)
  // ---------------------------------------------------------------------

  /** Global adjacent-token-pair frequencies, top 20 — the statistic one
    * BPE merge iteration maximizes. Per-doc pair explode partial-aggs
    * map-side; the global top-k is TakeOrderedAndProject (no global
    * sort), deterministic via the (count desc, pair asc) total order.
    * The group key is the (l, r) STRUCT — the display string is built
    * only after aggregation (one concat per distinct pair, not one per
    * corpus token), and the tie-break sorts on that final string so the
    * total order is engine-independent. */
  val pairFreq: GraftQuery = GraftQuery(
    "text_pair_freq",
    (s, dir) =>
      docs(s, dir)
        .select(split(lower(col("text")), "\\s+").as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(explode(expr(
          """transform(sequence(1, size(toks) - 1),
            |  i -> struct(element_at(toks, i) AS l,
            |              element_at(toks, i + 1) AS r))
            |""".stripMargin)).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(count(lit(1)).as("cnt"))
        .select(concat(col("l"), lit(" "), col("r")).as("pair"), col("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(20),
    Some(
      """WITH grams AS (
        |  SELECT unnest(list_transform(
        |    generate_series(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i + 1])) AS pair
        |  FROM (SELECT regexp_split_to_array(lower(text), '\s+') AS toks
        |        FROM documents)
        |  WHERE len(toks) >= 2)
        |SELECT pair, CAST(count(*) AS BIGINT) AS cnt
        |FROM grams GROUP BY pair
        |ORDER BY cnt DESC, pair LIMIT 20""".stripMargin))

  // ---------------------------------------------------------------------
  // Embedding quantization
  // ---------------------------------------------------------------------

  /** Symmetric int8 quantization of each embedding (scale = max |x|,
    * round-half-up via floor(x + 0.5)), reported as exact integer
    * summaries (min / max / sum / position-weighted sum) rather than the
    * raw arrays — the checksums pin every quantized value while keeping
    * the oracle compare on scalar BIGINTs. All arithmetic is double
    * (both engines evaluate the identical IEEE expression tree;
    * floor has no tie direction to disagree on — the same parity
    * argument as the integer quality score). */
  val embeddingQuantize: GraftQuery = GraftQuery(
    "embedding_quantize",
    (s, dir) =>
      emb(s, dir)
        .select(col("vec_id"), col("embedding"),
          greatest(
            expr("array_max(transform(embedding," +
              " x -> abs(cast(x as double))))"),
            lit(1e-12)).as("mx"))
        .withColumn("q", expr(
          "transform(embedding, x -> cast(floor(" +
            "(cast(x as double) / mx) * 127.0d + 0.5d) as bigint))"))
        .select(col("vec_id"),
          expr("array_min(q)").as("q_min"),
          expr("array_max(q)").as("q_max"),
          expr("aggregate(q, 0L, (a, x) -> a + x)").as("q_sum"),
          expr("aggregate(zip_with(q, sequence(0L, size(q) - 1L)," +
            " (qi, i) -> qi * i), 0L, (a, x) -> a + x)").as("q_possum")),
    Some(
      """WITH scaled AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(floor(
        |      (CAST(x AS DOUBLE) / mx) * 127.0 + 0.5) AS BIGINT)) AS qa
        |  FROM (SELECT vec_id, embedding,
        |          greatest(list_max(list_transform(embedding,
        |            x -> abs(CAST(x AS DOUBLE)))), 1e-12) AS mx
        |        FROM embeddings))
        |SELECT vec_id,
        |  CAST(list_min(qa) AS BIGINT) AS q_min,
        |  CAST(list_max(qa) AS BIGINT) AS q_max,
        |  CAST(list_sum(qa) AS BIGINT) AS q_sum,
        |  CAST(list_sum(list_transform(generate_series(1, len(qa)),
        |    i -> qa[i] * (i - 1))) AS BIGINT) AS q_possum
        |FROM scaled""".stripMargin))

  val all: Seq[GraftQuery] =
    Seq(packChunksQuery, sampleShuffleQuery, corpusShards, piiScrub,
      corpusStats, pairFreq, embeddingQuantize)
}
