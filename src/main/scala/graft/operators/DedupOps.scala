package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (SURVEY §7.6):
  * exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design (100 TB intent):
  *  - exact dedup is one hash-shuffle (`groupBy(md5)`), map-side partial
  *    aggregation free from Catalyst;
  *  - MinHash/SimHash signatures are pure column expressions over token
  *    arrays — computed in the scan stage, no UDFs;
  *  - candidate generation is band-bucket equi-join (shuffle on band key),
  *    NEVER all-pairs; bucket-size capping guards against degenerate-key
  *    skew (a boilerplate shingle landing everywhere);
  *  - verification (exact Jaccard / cosine) runs only on candidate pairs.
  *
  * The driver corpus has no natural duplicates, so each query unions the
  * corpus with deterministically perturbed copies of itself (suffix ids)
  * — detection work is real at every scale factor.
  */
object DedupOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "documents")
  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "embeddings")

  /** Corpus + exact copies of doc_id < 25 under shifted ids. */
  private def withExactDups(d: DataFrame): DataFrame =
    d.select("doc_id", "text").unionAll(
      d.filter(col("doc_id") < 25)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text")))

  /** Near-copies of doc_id < 25 under shifted ids: every 23rd token
    * replaced (destroys ~22% of 5-shingles → Jaccard ≈ 0.64 vs source). */
  private[graft] def perturbedCopies(d: DataFrame): DataFrame =
    d.filter(col("doc_id") < 25).select(
      (col("doc_id") + 1000000).as("doc_id"),
      expr("""concat_ws(' ', transform(split(text, '\\s+'),
             |  (x, i) -> IF(i % 23 = 0, 'xdupx', x)))""".stripMargin)
        .as("text"))

  /** Corpus + near-copies (see [[perturbedCopies]]). */
  private[graft] def withNearDups(d: DataFrame): DataFrame =
    d.select(col("doc_id"), col("text")).unionAll(perturbedCopies(d))

  // ---------------------------------------------------------------------

  /** Exact dedup: hash-groupBy on the normalized-text digest; keeper is
    * min(doc_id). One shuffle, partial-agg on the map side. */
  val exact: GraftQuery = GraftQuery(
    "dedup_exact",
    (s, dir) =>
      withExactDups(docs(s, dir))
        .groupBy(md5(regexp_replace(lower(col("text")), "\\s+", " ")).as("fp"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_cnt")),
    Some(
      """SELECT md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp,
        |  min(doc_id) AS keep_id, count(*) AS dup_cnt
        |FROM (SELECT doc_id, text FROM documents
        |      UNION ALL
        |      SELECT doc_id + 1000000, text FROM documents
        |      WHERE doc_id < 25)
        |GROUP BY 1""".stripMargin))

  // ---------------------------------------------------------------------
  // Line-level dedup (CCNet-style boilerplate removal)
  // ---------------------------------------------------------------------

  /** Boilerplate line injected into every even doc_id by the driver
    * query, so the operator has real cross-document repetition to find
    * at every scale factor. */
  private val BoilerLine = "subscribe to our newsletter for updates"
  private val LineTokens = 12
  /** A line present in more than this fraction of documents is
    * boilerplate (headers, cookie banners, licence blurbs). */
  val MaxLineDocFrac = 0.25

  /** (doc_id, idx, line): the corpus re-lined into 12-token chunks (the
    * driver corpus has no newlines; real corpora skip straight to
    * `split(text, '\n')`). */
  private def relined(d: DataFrame): DataFrame =
    d.select(col("doc_id"), split(col("text"), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 1)
      .select(col("doc_id"), posexplode(expr(
        s"""transform(
           |  sequence(0, cast(ceil(size(toks) / $LineTokens.0) AS INT) - 1),
           |  i -> concat_ws(' ', slice(toks, i * $LineTokens + 1, $LineTokens)))
           |""".stripMargin)))
      .toDF("doc_id", "idx", "line")

  /** First free line index of a doc = its chunk count (idx is 0-based),
    * recomputed from the text at scan level — sentinel lines appended at
    * `chunkCount + k` can never collide with a real line index, at any
    * document length. */
  private def chunkCount: Column =
    coalesce(
      ceil(size(split(col("text"), "\\s+")) / lit(LineTokens.toDouble))
        .cast("int"),
      lit(0))

  /** The same first-free-index expression for the DuckDB oracle side. */
  private def chunkCountSql: String =
    s"coalesce(CAST(ceil(len(regexp_split_to_array(text, '\\s+')) / " +
      s"$LineTokens.0) AS INT), 0)"

  /** [[relined]] plus the boilerplate line appended to even doc_ids. */
  private def relinedWithBoiler(d: DataFrame): DataFrame =
    relined(d)
      .unionAll(d.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), chunkCount.as("idx"),
          lit(BoilerLine).as("line")))

  /** (doc_id, idx, keep, line) → (doc_id, clean_text, removed_cnt):
    * reassemble each doc's kept lines in idx order, count the drops —
    * the shared tail of both line-dedup operators. One groupBy per doc;
    * sort_array on the (idx, …) struct makes collect_list order-safe. */
  private def reassembleKept(lines: DataFrame): DataFrame =
    lines.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(
        struct(col("idx"), col("keep"), col("line")))).as("arr"))
      .select(col("doc_id"),
        concat_ws("\n",
          expr("transform(filter(arr, x -> x.keep), x -> x.line)"))
          .as("clean_text"),
        expr("size(filter(arr, x -> NOT x.keep))").cast("bigint")
          .as("removed_cnt"))

  /** The docs0 + chunks re-lining CTEs — the shared head of both
    * line-dedup oracles (must mirror [[relined]] exactly). */
  private val ChunksCte: String =
    s"""WITH docs0 AS (
       |  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks
       |  FROM documents WHERE len(regexp_split_to_array(text, '\\s+')) >= 1),
       |chunks AS (
       |  SELECT doc_id,
       |    unnest(generate_series(0,
       |      CAST(ceil(len(toks) / $LineTokens.0) AS INT) - 1)) AS idx,
       |    unnest(list_transform(
       |      generate_series(0,
       |        CAST(ceil(len(toks) / $LineTokens.0) AS INT) - 1),
       |      i -> array_to_string(
       |        toks[i * $LineTokens + 1 : i * $LineTokens + $LineTokens],
       |        ' '))) AS line
       |  FROM docs0)""".stripMargin

  /** Line-level dedup (CCNet-shaped): drop every line that appears in
    * more than [[MaxLineDocFrac]] of documents, reassemble the text in
    * line order, report how many lines were dropped per doc.
    *
    * Scale shape: explode is per-row fan-out in the scan stage; the line
    * document-frequency is one keyed agg (count-distinct partial-aggs);
    * the keep-join shuffles on the line key; reassembly is one groupBy
    * per doc. Nothing global, nothing quadratic. At 100 TB the df join
    * key would be xxhash64(line) instead of the string — kept as the
    * string here for cross-engine oracle parity. */
  def removeBoilerplateLines(lines: DataFrame, totalDocs: DataFrame,
      maxDocFrac: Double = MaxLineDocFrac): DataFrame = {
    val df_ = lines.groupBy(col("line"))
      .agg(countDistinct(col("doc_id")).as("df"))
    reassembleKept(lines.join(df_, "line")
      .crossJoin(broadcast(totalDocs))
      .withColumn("keep", col("df") <= col("n_docs") * maxDocFrac))
  }

  val lineDedup: GraftQuery = GraftQuery(
    "dedup_lines",
    (s, dir) => {
      val d = docs(s, dir)
      removeBoilerplateLines(relinedWithBoiler(d),
        d.select(countDistinct(col("doc_id")).as("n_docs")))
    },
    Some(
      s"""$ChunksCte,
         |lines AS (
         |  SELECT * FROM chunks
         |  UNION ALL
         |  SELECT doc_id, $chunkCountSql AS idx, '$BoilerLine' AS line
         |  FROM documents WHERE doc_id % 2 = 0),
         |df AS (SELECT line, count(DISTINCT doc_id) AS df
         |       FROM lines GROUP BY 1),
         |tot AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
         |j AS (SELECT l.doc_id, l.idx, l.line,
         |        (d.df <= t.n_docs * $MaxLineDocFrac) AS keep
         |      FROM lines l JOIN df d USING (line) CROSS JOIN tot t)
         |SELECT doc_id,
         |  coalesce(string_agg(CASE WHEN keep THEN line END, chr(10)
         |    ORDER BY idx), '') AS clean_text,
         |  CAST(count(*) FILTER (WHERE NOT keep) AS BIGINT) AS removed_cnt
         |FROM j GROUP BY doc_id""".stripMargin))

  /** Intra-document repetition removal (the Gopher-rule cousin of
    * [[lineDedup]]): within each doc keep only the FIRST occurrence of
    * every line, reassemble in order, count the drops. Unlike the
    * cross-doc operator there is no corpus-wide state at all — one
    * window keyed by (doc_id, line) and one groupBy per doc; a doc's
    * lines never leave their two keyed shuffles. */
  def dedupLinesWithinDoc(lines: DataFrame): DataFrame = {
    val firstOcc = Window.partitionBy(col("doc_id"), col("line"))
      .orderBy(col("idx"))
    reassembleKept(lines
      .withColumn("rn", row_number().over(firstOcc))
      .withColumn("keep", col("rn") === 1))
  }

  /** The sentinel line appended TWICE to every third doc by the driver
    * query — the repetition [[intraDocDedup]] must collapse. */
  private val RepeatLine = "repeated footer line for the intra doc check"

  val intraDocDedup: GraftQuery = GraftQuery(
    "dedup_lines_intradoc",
    (s, dir) => {
      val d = docs(s, dir)
      val rep = d.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"), chunkCount.as("idx"),
          lit(RepeatLine).as("line"))
      dedupLinesWithinDoc(relined(d)
        .unionAll(rep)
        .unionAll(rep.withColumn("idx", col("idx") + 1)))
    },
    Some(
      s"""$ChunksCte,
         |lines AS (
         |  SELECT * FROM chunks
         |  UNION ALL
         |  SELECT doc_id, $chunkCountSql AS idx, '$RepeatLine' AS line
         |  FROM documents WHERE doc_id % 3 = 0
         |  UNION ALL
         |  SELECT doc_id, $chunkCountSql + 1 AS idx, '$RepeatLine' AS line
         |  FROM documents WHERE doc_id % 3 = 0),
         |ranked AS (
         |  SELECT doc_id, idx, line,
         |    row_number() OVER (PARTITION BY doc_id, line ORDER BY idx) AS rn
         |  FROM lines)
         |SELECT doc_id,
         |  coalesce(string_agg(CASE WHEN rn = 1 THEN line END, chr(10)
         |    ORDER BY idx), '') AS clean_text,
         |  CAST(count(*) FILTER (WHERE rn > 1) AS BIGINT) AS removed_cnt
         |FROM ranked GROUP BY doc_id""".stripMargin))

  // ---------------------------------------------------------------------
  // MinHash + LSH
  // ---------------------------------------------------------------------

  val NumHashes = 16
  /** Token-shingle width for the MinHash family. */
  val ShingleN = 5
  /** 8 bands x 2 rows: band-match prob at Jaccard j is 1-(1-j^2)^8 —
    * ~0.985 at j=0.64 — trading extra candidates (verified exactly anyway)
    * for recall. */
  val Bands = 8
  val RowsPerBand: Int = NumHashes / Bands
  /** Skew guard: a band bucket larger than this is a degenerate key (e.g.
    * boilerplate); at 100 TB such buckets would quadratically explode the
    * candidate join, so they are dropped (logged in real deployments). */
  val MaxBucketSize = 64

  /** THE skew-cap policy, in one place: drop every key group larger than
    * `cap` (boilerplate/degenerate keys that would otherwise go quadratic
    * in a pair join or fan a probe out unboundedly). Used by the batch
    * pair path, the incremental probe, index build, AND
    * [[graft.store.IndexStore.compact]]'s global re-application — one
    * definition, so build-time and compact-time policies can never
    * drift. One keyed window exchange, no row data to the driver. */
  private[graft] def capBuckets(df: DataFrame, keys: Seq[String],
      cap: Long): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
    df.withColumn("__grp_n", count(lit(1)).over(w))
      .filter(col("__grp_n") <= cap)
      .drop("__grp_n")
  }

  /** The skew-cap policy for AT-REST index rows (band/phash/afp/vhash):
    * TRUNCATE each over-cap key group to its first `cap` rows (in
    * deterministic `order`) instead of dropping the group wholesale —
    * and additionally keep each `idCols` UNIT's single best-ranked row
    * even past the cap, so EVERY unit retains at least one row at
    * rest.
    *
    * Why two policies exist: the pair-join path keeps [[capBuckets]]'s
    * whole-group drop (a degenerate band value would otherwise go
    * quadratic in the self-join — cap² candidate pairs per bucket is
    * the bound the drop buys). At-rest probe rows have no quadratic
    * path — a probe pays O(rows matching its own band keys), which is
    * linear in honest matches — but they DO carry a per-unit liveness
    * contract: the streaming gates' exactly-once replay argument needs
    * every committed survivor to self-match its own index rows, and for
    * the multi-unit kinds (afp chunks, vhash frames) the majority-
    * coverage verdict needs EVERY unit of a replayed asset to find a
    * row (a 2-chunk clip self-matches only when BOTH chunks do), so the
    * liveness key is the UNIT — doc_id / asset_id for the one-unit
    * kinds, (asset_id, chunk_idx) / (asset_id, frame_idx) for the
    * multi-unit ones. A unit whose every band landed in a hot bucket
    * still keeps one row, hence replay self-match coverage is TOTAL —
    * matched units = n_units on both sides. Exact shape of the
    * guarantee: a unit keeps every row that TIES its global-minimum
    * rank — for distinct fingerprints under asymmetric skew that is one
    * row (ranks differ across groups); only EQUAL fingerprints rank
    * identically in all their groups and keep one row per band, which a
    * probe genuinely wants (they are honest matches). Group size is
    * bounded by cap + #units-at-their-minimum-rank-here; the degenerate
    * all-past-cap single-row case keeps everything BY DESIGN (liveness
    * beats the cap — TruncateBucketsSpec pins both shapes). Two keyed
    * window exchanges of 16-byte rows, no data to the driver. */
  private[graft] def truncateBuckets(df: DataFrame, keys: Seq[String],
      cap: Long, idCols: Seq[String], order: Seq[String]): DataFrame = {
    val wg = Window.partitionBy(keys.map(col): _*)
      .orderBy(order.map(col): _*)
    val wa = Window.partitionBy(idCols.map(col): _*)
    df.withColumn("__rn", row_number().over(wg))
      .withColumn("__best", min(col("__rn")).over(wa))
      .filter(col("__rn") <= cap || col("__rn") === col("__best"))
      .drop("__rn", "__best")
  }

  /** doc_id, `sh_hashes` (distinct 5-shingle hashes), packed `mh_arr`
    * signature — two codegen'd [[graft.functions.Vec]] kernel passes.
    * Shingle STRINGS never materialize as a column: the exact-verify
    * Jaccard runs over the distinct hash sets, which equals the
    * string-set Jaccard up to 60-bit collisions (~1e-14 per doc pair),
    * and the candidate-join payload shrinks to 8 bytes per shingle.
    * Every hash is the portable pair-fold family ([[graft.functions.Vec
    * .portableHash]]), so the whole signature — and everything built on
    * it — is recomputed step-for-step by the DuckDB oracles. */
  def minhashSignatures(d: DataFrame): DataFrame =
    d.withColumn("toks", split(lower(col("text")), "\\s+"))
      .filter(size(col("toks")) >= ShingleN)
      .withColumn("sh_hashes",
        graft.functions.Vec.shingle_hashes(col("toks"), ShingleN))
      .select(col("doc_id"), col("sh_hashes"),
        graft.functions.Vec.minhash_sig(col("sh_hashes"), NumHashes)
          .as("mh_arr"))

  // ---------------------------------------------------------------------
  // Portable-hash oracle SQL builders: every fragment below recomputes a
  // Vec kernel verbatim in DuckDB SQL (the winnow-oracle pattern), so the
  // MinHash/SimHash/LSH queries carry full rows+schema+hash gates.
  // ---------------------------------------------------------------------

  import graft.functions.Vec.{HashB1, HashB2, HashP1, HashP2,
    HashPairShift, MinhashMulA, MinhashMulB}

  /** DuckDB mirror of [[graft.functions.Vec.portableHash]] over a string
    * expression (must be a plain column/lambda var — it is re-evaluated
    * per char).
    *
    * Character-unit assumption: the Scala kernel walks Unicode CODE
    * POINTS (codePointAt) while DuckDB's `s[j]`/`ascii` index GRAPHEME
    * CLUSTERS — these agree exactly when every grapheme is a single
    * BMP code point (all ASCII, and BMP text without combining marks).
    * The corpus generator guarantees that today; PortableHashSpec's
    * "character-unit boundary" pin hashes a combining-mark and an
    * astral-plane string through both sides so any future corpus drift
    * into that territory fails loudly in one named test rather than as
    * an opaque dedup hash mismatch. */
  private[operators] def pHashSql(e: String): String =
    // lambda vars are deliberately obscure (pj/pa/px): this fragment is
    // composed INSIDE callers' lambdas (e.g. the Rademacher plane
    // builder's `j`), where a plain `j` would silently shadow the outer
    // variable and hash the wrong string
    s"CASE WHEN len($e) = 0 THEN 0 ELSE " +
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(generate_series(1, len($e)), " +
      s"pj -> CAST(ascii(($e)[pj]) AS BIGINT))), " +
      s"(pa, px) -> (pa * $HashB1 + px) % $HashP1) * ${1L << HashPairShift} + " +
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(generate_series(1, len($e)), " +
      s"pj -> CAST(ascii(($e)[pj]) AS BIGINT))), " +
      s"(pa, px) -> (pa * $HashB2 + px) % $HashP2) END"

  /** DuckDB mirror of the pair-fold over a BIGINT list expression. */
  private[operators] def foldLongsSql(e: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), $e), " +
      s"(fa, fx) -> (fa * $HashB1 + fx) % $HashP1) * ${1L << HashPairShift} + " +
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), $e), " +
      s"(fa, fx) -> (fa * $HashB2 + fx) % $HashP2)"

  /** Signature CTE chain over `src(doc_id, text)`, names prefixed with
    * `p`: tokens → token hashes → distinct shingle hashes → MinHash
    * slots → band keys → bucket-capped bands. Mirrors
    * [[minhashSignatures]] + [[lshBands]] + [[capBuckets]]. */
  private[operators] def sigCtesSql(src: String, p: String): String = {
    val slotSql =
      s"list_transform(generate_series(0, ${NumHashes - 1}), sj -> " +
        s"list_min(list_transform(sh_hashes, h -> " +
        s"(((sj * $MinhashMulA) % ${HashP1 - 1} + 1) * (h % $HashP1)" +
        s" + (sj * $MinhashMulB) % $HashP1) % $HashP1)))"
    val bandKeySql = (0 until RowsPerBand).foldLeft("CAST(0 AS BIGINT)")(
      (acc, r) =>
        s"(($acc) * $HashB1 + mh_arr[$RowsPerBand * b.band + ${r + 1}])" +
          s" % $HashP1")
    s"""${p}tok AS (
       |  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS toks
       |  FROM $src),
       |${p}th AS (
       |  SELECT doc_id, list_transform(toks, t -> ${pHashSql("t")}) AS th
       |  FROM ${p}tok WHERE len(toks) >= $ShingleN),
       |${p}sig AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |      generate_series(1, len(th) - ${ShingleN - 1}),
       |      i -> ${foldLongsSql(s"th[i:i+${ShingleN - 1}]")})) AS sh_hashes
       |  FROM ${p}th),
       |${p}mh AS (
       |  SELECT doc_id, sh_hashes, $slotSql AS mh_arr FROM ${p}sig),
       |${p}bands AS (
       |  SELECT doc_id, b.band, $bandKeySql AS band_key
       |  FROM ${p}mh CROSS JOIN
       |    (SELECT unnest(generate_series(0, ${Bands - 1})) AS band) b),
       |${p}capped AS (
       |  SELECT doc_id, band, band_key FROM (
       |    SELECT doc_id, band, band_key,
       |      count(*) OVER (PARTITION BY band, band_key) AS n
       |    FROM ${p}bands)
       |  WHERE n <= $MaxBucketSize)""".stripMargin
  }

  /** DuckDB mirror of the AT-REST truncation policy
    * ([[truncateBuckets]] keyed on doc_id) over `${p}bands` — rank rows
    * within each (band, band_key) by doc_id (total: one row per doc per
    * band), keep ranks <= cap plus each doc's global-best rank. Appended
    * after [[sigCtesSql]] when an oracle needs the INDEX-side rows
    * (`dedup_incremental`); the pair-join oracles keep `${p}capped`. */
  private[operators] def truncCtesSql(p: String): String =
    s"""${p}ranked AS (
       |  SELECT doc_id, band, band_key,
       |    row_number() OVER (PARTITION BY band, band_key
       |      ORDER BY doc_id) AS rn
       |  FROM ${p}bands),
       |${p}trunc AS (
       |  SELECT doc_id, band, band_key FROM (
       |    SELECT doc_id, band, band_key, rn,
       |      min(rn) OVER (PARTITION BY doc_id) AS best
       |    FROM ${p}ranked)
       |  WHERE rn <= $MaxBucketSize OR rn = best)""".stripMargin

  /** Signature-estimated Jaccard (slot agreement / k) — the candidate
    * prefilter, mirrored. */
  private[operators] def estSql(aM: String, bM: String): String =
    s"list_sum(list_transform(generate_series(1, $NumHashes), " +
      s"i -> CASE WHEN $aM[i] = $bM[i] THEN 1 ELSE 0 END)) " +
      s"/ CAST($NumHashes AS DOUBLE)"

  /** Exact-Jaccard verify tail shared by the batch and incremental
    * oracles: double-ratio threshold gate + integer basis points out. */
  private[operators] def jaccardBpSql(aSh: String, bSh: String): String =
    s"""CAST(len(list_intersect($aSh, $bSh)) * 10000
       |    // len(list_distinct($aSh || $bSh)) AS BIGINT) AS jaccard_bp""".stripMargin

  private[operators] def jaccardGateSql(aSh: String, bSh: String,
      threshold: Double): String =
    s"CAST(len(list_intersect($aSh, $bSh)) AS DOUBLE) " +
      s"/ len(list_distinct($aSh || $bSh)) >= " +
      java.lang.Double.toString(threshold)

  /** The [[perturbedCopies]] batch as oracle SQL (DuckDB's index lambda
    * is 1-based, hence (i-1) where Spark's `transform` index is
    * 0-based). */
  private[operators] val PerturbedSrcSql: String =
    """SELECT doc_id + 1000000 AS doc_id,
      |    array_to_string(list_transform(regexp_split_to_array(text, '\s+'),
      |      (x, i) -> CASE WHEN (i-1) % 23 = 0 THEN 'xdupx' ELSE x END), ' ')
      |      AS text
      |  FROM documents WHERE doc_id < 25""".stripMargin

  /** The [[withNearDups]] corpus as oracle SQL — composed from
    * [[PerturbedSrcSql]] so the perturbation can never drift between the
    * batch and incremental oracles. */
  private[operators] val NearDupsSrcSql: String =
    s"""SELECT doc_id, text FROM documents
       |  UNION ALL
       |  $PerturbedSrcSql""".stripMargin

  /** (doc_id, band, band_key) — one row per band. The band key is the
    * portable fold (acc·131 + slot) mod p1 over the band's slots (slots
    * are already < p1, so every intermediate fits a long), recomputed
    * verbatim by the DuckDB oracles. */
  def lshBands(sig: DataFrame): DataFrame = {
    import graft.functions.Vec.{HashB1, HashP1}
    val bandStructs = (0 until Bands).map { b =>
      val cols = (0 until RowsPerBand)
        .map(r => element_at(col("mh_arr"), b * RowsPerBand + r + 1))
      val key = cols.foldLeft(lit(0L))((acc, c) =>
        (acc * lit(HashB1) + c) % lit(HashP1))
      struct(lit(b).as("band"), key.as("band_key"))
    }
    sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"),
        col("bk.band_key").as("band_key"))
  }

  /** Shared signature stage: minhash columns + packed `mh_arr`, lineage
    * truncated. Both near-dup kernels ([[minhashNearDupPairs]] exact
    * shingle Jaccard, [[ngramJaccard]] char-3-gram Jaccard) start here —
    * one shingling + signature computation, two similarity kernels.
    *
    * localCheckpoint (not cache): the signature lineage is large, and a
    * cached-but-un-truncated plan gets re-canonicalized by AQE at every
    * stage of the self-join — observed as minutes of driver CPU with
    * idle executors. Checkpointing cuts the plan at this boundary. */
  def signatures(d: DataFrame): DataFrame =
    minhashSignatures(d).localCheckpoint()

  /** Candidate pairs from shared band buckets (skew-capped), pruned by
    * signature-estimated Jaccard (16 slot comparisons on small arrays —
    * kills the random band collisions a tiny shingle vocabulary
    * produces). At 100 TB this keeps the wide shingle arrays out of the
    * candidate shuffle entirely; only a kernel's verify stage touches
    * them, and only for survivors. */
  def candidatePairs(sig: DataFrame, threshold: Double): DataFrame = {
    val capped = capBuckets(lshBands(sig), Seq("band", "band_key"),
      MaxBucketSize)
    val a = capped.as("a")
    val b = capped.as("b")
    val pairs = a.join(b,
        col("a.band") === col("b.band") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    val mhSmall = sig.select(col("doc_id"), col("mh_arr"))
    pairs
      .join(mhSmall.select(col("doc_id").as("id_a"),
        col("mh_arr").as("mh_a")), "id_a")
      .join(mhSmall.select(col("doc_id").as("id_b"),
        col("mh_arr").as("mh_b")), "id_b")
      .withColumn("est_jaccard",
        expr(s"size(filter(zip_with(mh_a, mh_b, (x, y) -> x = y), v -> v))" +
          s" / CAST($NumHashes AS DOUBLE)"))
      .filter(col("est_jaccard") >= threshold * 0.6)
      .select("id_a", "id_b")
  }

  /** The exact shingle-Jaccard verify stage over candidate (id_a,
    * id_b) pairs: attach each side's distinct shingle-hash set from
    * `sh` ((doc_id, sh_hashes) rows) and keep pairs at/above
    * `threshold`. Shared by [[minhashPairsFromSignatures]] (sh = the
    * full signature frame) and [[pairsFromBandIndexRows]] (sh =
    * candidate-pruned at-rest rows), so the two paths can never
    * drift. */
  private def jaccardVerify(cand: DataFrame, sh: DataFrame,
      threshold: Double): DataFrame =
    cand
      .join(sh.select(col("doc_id").as("id_a"),
        col("sh_hashes").as("sh_a")), "id_a")
      .join(sh.select(col("doc_id").as("id_b"),
        col("sh_hashes").as("sh_b")), "id_b")
      .withColumn("inter",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("uni",
        size(array_union(col("sh_a"), col("sh_b"))).cast("long"))
      // the threshold gate stays the exact double ratio (i/u is an exact
      // IEEE function of two small ints — identical in any engine); the
      // REPORTED value is integer basis points, so the driver hash never
      // rides on decimal-rounding conventions
      .filter(col("inter").cast("double") / col("uni") >= threshold)
      .select(col("id_a"), col("id_b"),
        expr("inter * 10000 div uni").as("jaccard_bp"))

  /** MinHash kernel over a precomputed signature frame (the
    * [[minhashSignatures]] shape: doc_id, sh_hashes, mh_arr). Callers
    * that already paid the corpus scan — the composed curation pipeline
    * computes quality + fingerprint + signatures in one pass — hand in
    * their own (checkpointed) signatures; [[minhashNearDupPairs]] is the
    * from-text form. Exact Jaccard runs for candidate survivors only. */
  def minhashPairsFromSignatures(sig: DataFrame,
      threshold: Double): DataFrame =
    jaccardVerify(candidatePairs(sig, threshold),
      sig.select(col("doc_id"), col("sh_hashes")), threshold)

  /** MinHash kernel: exact Jaccard over distinct shingle-hash sets for
    * candidate survivors only. */
  def minhashNearDupPairs(d: DataFrame, threshold: Double): DataFrame =
    minhashPairsFromSignatures(signatures(d), threshold)

  /** MinHash-LSH near-dup detection over corpus + injected near-copies.
    * Fully hash-oracled: the portable signature family lets DuckDB
    * recompute shingles, slots, band buckets, the cap, the estimate
    * prefilter, and the exact-Jaccard verify step-for-step. */
  val minhashLsh: GraftQuery = GraftQuery(
    "dedup_minhash_lsh",
    (s, dir) => minhashNearDupPairs(withNearDups(docs(s, dir)), 0.4),
    Some {
      val floor = java.lang.Double.toString(0.4 * 0.6)
      s"""WITH src AS ($NearDupsSrcSql),
         |${sigCtesSql("src", "")},
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM capped a JOIN capped b
         |    ON a.band = b.band AND a.band_key = b.band_key
         |    AND a.doc_id < b.doc_id)
         |SELECT p.id_a, p.id_b,
         |  ${jaccardBpSql("sa.sh_hashes", "sb.sh_hashes")}
         |FROM pairs p
         |JOIN mh sa ON sa.doc_id = p.id_a
         |JOIN mh sb ON sb.doc_id = p.id_b
         |WHERE ${estSql("sa.mh_arr", "sb.mh_arr")} >= $floor
         |  AND ${jaccardGateSql("sa.sh_hashes", "sb.sh_hashes", 0.4)}"""
        .stripMargin
    })

  /** LSH detection quality against planted ground truth — the
    * quantitative gate the HLL estimator already carries
    * (ApproxDistinctSpec), for near-dup dedup: one row per planted
    * (source, perturbed-copy) pair with its EXACT shingle-Jaccard in
    * basis points and whether the production banded pipeline (bucket
    * join → skew cap → estimate prefilter → exact verify) surfaced it.
    * Banding theory puts per-pair detection probability at
    * 1−(1−s^r)^b (r = [[RowsPerBand]] = 2, b = [[Bands]] = 8: a pair
    * at s = 0.9 is missed with p ≈ 2·10⁻⁶, at s = 0.5 with p ≈ 0.1);
    * with the portable hash family the outcome is deterministic per
    * corpus, so the report is hash-oracle-able and regressions in the
    * banding/prefilter path show as flipped `detected` bits, not noise.
    * At scale the ground-truth side touches only the 2×25 planted
    * docs; the detection side is the unchanged production kernel. */
  def lshRecallReport(d: DataFrame, threshold: Double): DataFrame = {
    val sig = signatures(withNearDups(d))
    val detected = minhashPairsFromSignatures(sig, threshold)
      .select(col("id_a"), col("id_b"), lit(1L).as("hit"))
    val src = sig.filter(col("doc_id") < 25)
      .select(col("doc_id").as("id_a"), col("sh_hashes").as("sh_a"))
    val cpy = sig.filter(col("doc_id") >= 1000000)
      .select((col("doc_id") - 1000000).as("id_a"),
        col("doc_id").as("id_b"), col("sh_hashes").as("sh_b"))
    src.join(cpy, "id_a")
      .withColumn("inter",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("uni",
        size(array_union(col("sh_a"), col("sh_b"))).cast("long"))
      .select(col("id_a"), col("id_b"),
        expr("inter * 10000 div uni").as("jaccard_bp"))
      .join(detected, Seq("id_a", "id_b"), "left")
      .select(col("id_a"), col("id_b"), col("jaccard_bp"),
        coalesce(col("hit"), lit(0L)).as("detected"))
  }

  val lshRecall: GraftQuery = GraftQuery(
    "dedup_lsh_recall",
    (s, dir) => lshRecallReport(docs(s, dir), 0.4),
    Some {
      val floor = java.lang.Double.toString(0.4 * 0.6)
      s"""WITH src AS ($NearDupsSrcSql),
         |${sigCtesSql("src", "")},
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM capped a JOIN capped b
         |    ON a.band = b.band AND a.band_key = b.band_key
         |    AND a.doc_id < b.doc_id),
         |det AS (
         |  SELECT p.id_a, p.id_b
         |  FROM pairs p
         |  JOIN mh sa ON sa.doc_id = p.id_a
         |  JOIN mh sb ON sb.doc_id = p.id_b
         |  WHERE ${estSql("sa.mh_arr", "sb.mh_arr")} >= $floor
         |    AND ${jaccardGateSql("sa.sh_hashes", "sb.sh_hashes", 0.4)}),
         |planted AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    ${jaccardBpSql("a.sh_hashes", "b.sh_hashes")}
         |  FROM mh a JOIN mh b ON b.doc_id = a.doc_id + 1000000
         |  WHERE a.doc_id < 25)
         |SELECT pl.id_a, pl.id_b, pl.jaccard_bp,
         |  CAST(CASE WHEN d.id_a IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
         |    AS detected
         |FROM planted pl
         |LEFT JOIN det d ON d.id_a = pl.id_a AND d.id_b = pl.id_b"""
        .stripMargin
    })

  /** Incremental (streaming-shaped) near-dup: new documents probed
    * against the persistent band index of the existing corpus — history
    * is never re-shingled ([[incrementalNearDup]]; exercised in streaming
    * form by IncrementalDedupSpec's foreachBatch test). The oracle
    * mirrors BOTH skew policies exactly where the engine applies them:
    * the probe side is bucket-CAPPED (`p_capped` — pair-join bound),
    * the index side is at-rest TRUNCATED (`i_trunc`,
    * [[truncCtesSql]] — the round-17 [[buildBandIndex]] policy). */
  val incrementalDedup: GraftQuery = GraftQuery(
    "dedup_incremental",
    (s, dir) => {
      val d = docs(s, dir)
      val index = buildBandIndex(d).localCheckpoint()
      incrementalNearDup(perturbedCopies(d), index, 0.4)
    },
    Some {
      val floor = java.lang.Double.toString(0.4 * 0.6)
      s"""WITH probe_src AS (
         |  $PerturbedSrcSql),
         |${sigCtesSql("documents", "i_")},
         |${truncCtesSql("i_")},
         |${sigCtesSql("probe_src", "p_")},
         |cand AS (
         |  SELECT DISTINCT p.doc_id AS new_id, i.doc_id AS existing_id
         |  FROM p_capped p JOIN i_trunc i
         |    ON p.band = i.band AND p.band_key = i.band_key)
         |SELECT c.new_id, c.existing_id,
         |  ${jaccardBpSql("sn.sh_hashes", "se.sh_hashes")}
         |FROM cand c
         |JOIN p_mh sn ON sn.doc_id = c.new_id
         |JOIN i_mh se ON se.doc_id = c.existing_id
         |WHERE ${estSql("sn.mh_arr", "se.mh_arr")} >= $floor
         |  AND ${jaccardGateSql("sn.sh_hashes", "se.sh_hashes", 0.4)}"""
        .stripMargin
    })

  /** Incremental near-dup check: signatures of a NEW batch of docs joined
    * against an existing band index (historical signatures) — the
    * streaming/100 TB shape: history is never re-shingled, the new batch
    * shuffles only against matching band buckets. Returns (new_id,
    * existing_id, jaccard) pairs at/above the threshold.
    *
    * `index` must carry (doc_id, band, band_key, mh_arr, sh_hashes) —
    * produce it with [[buildBandIndex]] and persist it bucketed by
    * (band, band_key) so the probe join prunes partitions. */
  def incrementalNearDup(
      newDocs: DataFrame,
      index: DataFrame,
      threshold: Double): DataFrame = {
    val sig = minhashSignatures(newDocs).localCheckpoint()
    // Skew guard, same policy as the batch path (candidatePairs): a
    // degenerate band_key (boilerplate text) on EITHER side would make the
    // band join quadratic in that bucket. The index side is capped at
    // build time (buildBandIndex); cap the new batch here.
    val probe = capBuckets(lshBands(sig), Seq("band", "band_key"),
      MaxBucketSize)
    // candidate (new, existing) id pairs first — the band probe and the
    // distinct shuffle touch NARROW rows only; signature/shingle payloads
    // attach afterwards, and only for index docs that actually matched
    // (semi-join prune). At 100 TB the wide index columns are read for
    // O(candidates) docs, not O(corpus). No broadcast hint on `matched`:
    // its size is O(distinct matched docs), unbounded in a bad batch, so
    // let AQE broadcast it only when it measures small.
    val cand = probe.as("n")
      .join(index.select(col("doc_id").as("existing_id"), col("band"),
        col("band_key")).as("i"), Seq("band", "band_key"))
      .select(col("doc_id").as("new_id"), col("existing_id"))
      .distinct()
      .localCheckpoint()
    val matched = cand.select(col("existing_id")).distinct()
    val iPayload = index
      .join(matched,
        index("doc_id") === matched("existing_id"), "left_semi")
      .dropDuplicates("doc_id")
      .select(col("doc_id").as("existing_id"), col("mh_arr").as("mh_i"),
        col("sh_hashes").as("sh_i"))
    cand
      .join(sig.select(col("doc_id").as("new_id"), col("mh_arr").as("mh_n"),
        col("sh_hashes").as("sh_n")), "new_id")
      .join(iPayload, "existing_id")
      .withColumn("est",
        expr(s"size(filter(zip_with(mh_n, mh_i, (x, y) -> x = y), v -> v))" +
          s" / CAST($NumHashes AS DOUBLE)"))
      .filter(col("est") >= threshold * 0.6)
      .withColumn("inter",
        size(array_intersect(col("sh_n"), col("sh_i"))).cast("long"))
      .withColumn("uni",
        size(array_union(col("sh_n"), col("sh_i"))).cast("long"))
      .filter(col("inter").cast("double") / col("uni") >= threshold)
      .select(col("new_id"), col("existing_id"),
        expr("inter * 10000 div uni").as("jaccard_bp"))
  }

  /** Band index of a corpus for [[incrementalNearDup]]: one row per
    * (doc, band) with the signature and shingle hashes attached.
    * Degenerate buckets (> [[MaxBucketSize]] docs on one band_key —
    * boilerplate) are [[truncateBuckets]]-TRUNCATED at BUILD time, once
    * — the at-rest policy the perceptual kinds use, keyed on doc_id —
    * so no later probe pays for them (a probe reads O(cap) rows of a
    * hot bucket, never the whole flood) while EVERY doc keeps at least
    * one at-rest band row. The liveness half is what the streaming
    * curation gate's exactly-once replay needs: a committed survivor
    * whose every band landed in a flooded bucket still self-matches on
    * replay (its kept row collides at jaccard 1), so a 64+
    * distinct-near-dup flood can no longer commit survivors that a
    * replay would re-admit — the whole-group [[capBuckets]] drop this
    * build used before round 17 could. The pair-JOIN paths
    * ([[candidatePairs]], the probe side of [[incrementalNearDup]])
    * keep the whole-group cap: there the quadratic bound is the
    * point. */
  def buildBandIndex(docs: DataFrame): DataFrame = {
    val sig = minhashSignatures(docs)
    truncateBuckets(lshBands(sig), Seq("band", "band_key"), MaxBucketSize,
      Seq("doc_id"), Seq("doc_id"))
      .join(sig.select(col("doc_id"), col("mh_arr"), col("sh_hashes")),
        "doc_id")
  }

  /** Near-dup pairs reconstructed from AT-REST band-index rows ALONE —
    * the text transposition of the perceptual kinds' retroactive dup
    * report ([[graft.store.IndexStore.perceptualDupes]]): no source
    * text is re-read, re-shingled, or even fetched. Every index row
    * carries the doc's FULL signature (mh_arr + sh_hashes — the
    * [[buildBandIndex]] schema), and the at-rest truncation policy
    * guarantees every committed doc keeps ≥ 1 row, so ONE distinct row
    * per doc reconstructs the complete signature set and the batch
    * kernel ([[minhashPairsFromSignatures]]: band re-derivation from
    * mh_arr, the whole-group pair-join cap, estimate prefilter, exact
    * shingle-Jaccard verify) runs over it unchanged. The pair set
    * therefore EQUALS [[minhashNearDupPairs]] over the indexed corpus
    * even when bucket skew truncated the very band rows two dups
    * collide on — bands come from mh_arr, not from which explode rows
    * survived (the `dedup_band_dupes` driver query hash-oracles this
    * equality; IndexStoreSpec pins the store round-trip and a planted
    * past-cap flood).
    *
    * This is the retroactive closer for the streaming text gates' one
    * documented intra-batch residual (65+ mutually-distinct same-bucket
    * near-dups in one micro-batch dedup only partially — the probe
    * side's whole-group cap): run it on `index compact` cadence and
    * feed the pairs to a keep-one-witness pass.
    *
    * Scale shape: candidate generation runs over the NARROW per-doc
    * signature (doc_id + the 16-slot mh_arr — one keyed distinct
    * exchange; the wide shingle arrays stay out of it). The verify
    * stage then joins the at-rest rows RAW — one sh_hashes copy per
    * surviving band row, deliberately NOT deduplicated first: a
    * per-doc distinct there would shuffle the wide shingle arrays
    * corpus-wide, while the verify join needs them for candidate ids
    * only (AQE broadcasts the candidate side when small; the
    * duplicate-induced pair copies collapse in one narrow group-max at
    * the end). The group-max also makes the report deterministic when
    * a doc_id was re-appended with DIVERGENT text (two signature
    * variants at rest — an index-contract violation compact collapses
    * arbitrarily): the pair scores by its best-matching stored
    * variant, one row, instead of emitting contradictory duplicates.
    * Corpus-wide by design (a compaction-cadence report, like the
    * perceptual siblings), not a probe. */
  def pairsFromBandIndexRows(rows: DataFrame,
      threshold: Double): DataFrame = {
    val sig = rows.select(col("doc_id"), col("mh_arr"))
      .dropDuplicates("doc_id")
      .localCheckpoint() // band derivation + the estimate prefilter
    jaccardVerify(candidatePairs(sig, threshold),
      rows.select(col("doc_id"), col("sh_hashes")), threshold)
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(col("jaccard_bp")).as("jaccard_bp"))
  }

  /** Green-gate for the at-rest reconstruction: build the band index
    * (at-rest TRUNCATION applied), then report pairs from the index
    * rows alone. The oracle is [[minhashLsh]]'s VERBATIM — the claim
    * under driver hash is exactly "at-rest equals batch", pair for
    * pair, basis point for basis point. */
  val bandDupesQuery: GraftQuery = GraftQuery(
    "dedup_band_dupes",
    (s, dir) => pairsFromBandIndexRows(
      buildBandIndex(withNearDups(docs(s, dir))).localCheckpoint(), 0.4),
    minhashLsh.oracle)

  // ---------------------------------------------------------------------
  // SimHash
  // ---------------------------------------------------------------------

  /** 60-bit SimHash per doc: per-bit vote over portable token hashes,
    * packed in a single codegen'd [[graft.functions.Vec.simhash64]] pass
    * — a pure scan-stage expression, NO shuffle at all (the previous form
    * exploded tokens and re-aggregated through a per-bit groupBy). */
  def simhash(d: DataFrame): DataFrame =
    d.select(col("doc_id"),
      graft.functions.Vec.simhash64(
        graft.functions.Vec.token_hashes(split(lower(col("text")), "\\s+")))
        .as("simhash"))

  /** SimHash band layout: 4 bands × 15 bits over the 60-bit sketch —
    * pigeonhole: hamming <= 3 guarantees at least one identical band. */
  val SimHashBands = 4
  val SimHashBandBits: Int = graft.functions.Vec.SimHashBits / SimHashBands

  /** SimHash near-dup pairs: 4x15-bit band join (pigeonhole: hamming <= 3
    * guarantees one identical band), then exact hamming check. */
  def simhashNearDupPairs(d: DataFrame, maxHamming: Int): DataFrame = {
    val sh = simhash(d).localCheckpoint() // see minhashNearDupPairs
    val mask = (1L << SimHashBandBits) - 1
    val banded = sh.select(col("doc_id"), col("simhash"),
      explode(array((0 until SimHashBands).map(b =>
        struct(lit(b).as("band"),
          col("simhash").bitwiseAND(lit(mask << (SimHashBandBits * b)))
            .as("band_val"))): _*)).as("bk"))
      .select(col("doc_id"), col("simhash"), col("bk.band"),
        col("bk.band_val"))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") &&
        col("a.band_val") === col("b.band_val") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.simhash").as("sh_a"), col("b.simhash").as("sh_b"))
      .distinct()
      .withColumn("hamming",
        expr("bit_count(sh_a ^ sh_b)").cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  val simhashDedup: GraftQuery = GraftQuery(
    "dedup_simhash",
    (s, dir) => simhashNearDupPairs(withNearDups(docs(s, dir)), 3),
    Some {
      val bits = graft.functions.Vec.SimHashBits
      val mask = (1L << SimHashBandBits) - 1
      s"""WITH src AS ($NearDupsSrcSql),
         |tok AS (
         |  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS toks
         |  FROM src),
         |th AS (
         |  SELECT doc_id, list_transform(toks, t -> ${pHashSql("t")}) AS th
         |  FROM tok),
         |sh AS (
         |  SELECT doc_id, CAST(list_sum(list_transform(
         |      generate_series(0, ${bits - 1}), b ->
         |    CASE WHEN list_sum(list_transform(th, x ->
         |        CASE WHEN (x >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
         |    THEN CAST(1 AS BIGINT) << b ELSE 0 END)) AS BIGINT) AS simhash
         |  FROM th),
         |banded AS (
         |  SELECT doc_id, simhash, b.band,
         |    simhash & (CAST($mask AS BIGINT) << ($SimHashBandBits * b.band))
         |      AS band_val
         |  FROM sh CROSS JOIN
         |    (SELECT unnest(generate_series(0, ${SimHashBands - 1})) AS band) b)
         |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM banded a JOIN banded b
         |  ON a.band = b.band AND a.band_val = b.band_val
         |  AND a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin
    })

  // ---------------------------------------------------------------------
  // n-gram Jaccard (bounded pair generation via shared-band prefilter)
  // ---------------------------------------------------------------------

  /** Character-3-gram Jaccard over LSH-bounded candidates — the shared
    * [[candidatePairs]] stage with a different similarity kernel: the
    * corpus is shingled and signed ONCE; only the verify metric differs
    * from [[minhashNearDupPairs]] (char grams instead of token shingles,
    * as distinct hash sets via [[graft.functions.Vec.char_gram_hashes]]). */
  val ngramJaccard: GraftQuery = GraftQuery(
    "dedup_ngram_jaccard",
    (s, dir) => {
      val d = withNearDups(docs(s, dir))
      val cand = candidatePairs(signatures(d), 0.45)
        .select(col("id_a"), col("id_b"))
        .localCheckpoint() // reused three times below (ids ×2 + pairs)
      // gram arrays are built ONLY for docs that appear in a candidate
      // pair (semi-join prune): the gram column never materializes for
      // the untouched bulk of the corpus — at 100 TB the verify stage is
      // proportional to candidates, not corpus. No broadcast HINT on
      // the prune ([[PairedDedupOps.captionVerify]]'s rationale): the
      // bucket cap bounds pairs per bucket, not corpus-wide, so a
      // dup-heavy corpus surfaces corpus-linear candidate ids — AQE
      // broadcasts the small cases and shuffles the big ones
      val candIds = cand
        .select(explode(array(col("id_a"), col("id_b"))).as("doc_id"))
        .distinct()
      val grams = d.join(candIds, Seq("doc_id"), "left_semi")
        .select(col("doc_id"),
          graft.functions.Vec.char_gram_hashes(col("text"), 3).as("grams"))
      cand
        .join(grams.select(col("doc_id").as("id_a"),
          col("grams").as("g_a")), "id_a")
        .join(grams.select(col("doc_id").as("id_b"),
          col("grams").as("g_b")), "id_b")
        .withColumn("inter",
          size(array_intersect(col("g_a"), col("g_b"))).cast("long"))
        .withColumn("uni",
          size(array_union(col("g_a"), col("g_b"))).cast("long"))
        .filter(col("inter").cast("double") / col("uni") >= 0.5)
        .select(col("id_a"), col("id_b"),
          expr("inter * 10000 div uni").as("ngram_jaccard_bp"))
    },
    Some {
      val floor = java.lang.Double.toString(0.45 * 0.6)
      s"""WITH src AS ($NearDupsSrcSql),
         |${sigCtesSql("src", "")},
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM capped a JOIN capped b
         |    ON a.band = b.band AND a.band_key = b.band_key
         |    AND a.doc_id < b.doc_id),
         |cand AS (
         |  SELECT p.id_a, p.id_b FROM pairs p
         |  JOIN mh sa ON sa.doc_id = p.id_a
         |  JOIN mh sb ON sb.doc_id = p.id_b
         |  WHERE ${estSql("sa.mh_arr", "sb.mh_arr")} >= $floor),
         |grams AS (
         |  SELECT doc_id, list_distinct(list_transform(
         |      generate_series(1, greatest(len(text) - 2, 1)),
         |      i -> ${pHashSql("text[i:i+2]")})) AS grams
         |  FROM src
         |  WHERE doc_id IN (SELECT id_a FROM cand UNION SELECT id_b FROM cand))
         |SELECT c.id_a, c.id_b,
         |  CAST(len(list_intersect(ga.grams, gb.grams)) * 10000
         |    // len(list_distinct(ga.grams || gb.grams)) AS BIGINT)
         |    AS ngram_jaccard_bp
         |FROM cand c
         |JOIN grams ga ON ga.doc_id = c.id_a
         |JOIN grams gb ON gb.doc_id = c.id_b
         |WHERE CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
         |  / len(list_distinct(ga.grams || gb.grams)) >= 0.5""".stripMargin
    })

  // ---------------------------------------------------------------------
  // Substring-level duplication (shared spans)
  // ---------------------------------------------------------------------

  /** Winnowing parameters for span detection: 20-char grams, window 8 —
    * any normalized substring match of SpanGram + SpanWindow - 1 = 27+
    * chars between two documents is guaranteed to share a fingerprint
    * (the winnowing guarantee), at ~1/8 the gram density. */
  val SpanGram = 20
  val SpanWindow = 8

  /** Document-frequency cap on span fingerprints: a fingerprint present
    * in more documents than this is boilerplate (licence headers, nav
    * chrome); at 100 TB one such hot key would contribute df²/2 pair
    * rows to the self-join, so it is dropped — once, before pairing —
    * exactly like [[MaxBucketSize]] caps the LSH band buckets. */
  val MaxSpanDf = 32L

  /** Substring-level duplication — the partial-overlap shape whole-doc
    * dedup cannot see (doc B embeds a paragraph of doc A): pairs of
    * documents sharing >= `minShared` winnowing fingerprints of their
    * alnum-normalized text ([[graft.functions.Vec.winnowFingerprints]],
    * codegen'd scan-stage kernel).
    *
    * Scale shape: fingerprints explode to an inverted index (fp ->
    * doc); ONE hash shuffle on fp serves both the document-frequency
    * gate (window count; df = 1 pairs nothing, df > maxDf is
    * boilerplate — both dropped) and the self-join that follows it;
    * the pair aggregate is partial-combined map-side. Work is
    * proportional to shared-fingerprint postings, never all-pairs.
    *
    * Like the rest of the dedup family this is exactly oracle-able: the
    * winnow hash is the portable polynomial fold of
    * [[graft.operators.TextOps.winnowFingerprint]], recomputed verbatim
    * by the DuckDB oracle. */
  def sharedSpanPairs(d: DataFrame, minShared: Long = 5L,
      maxDf: Long = MaxSpanDf): DataFrame = {
    val fps = d.select(col("doc_id"),
      explode(graft.functions.Vec.winnow_fps(
        regexp_replace(lower(col("text")), "[^a-z0-9]", ""),
        SpanGram, SpanWindow)).as("fp"))
    val byFp = Window.partitionBy(col("fp"))
    val kept = fps
      .withColumn("df", count(lit(1)).over(byFp))
      .filter(col("df") >= 2 && col("df") <= maxDf)
      .drop("df")
    kept.as("a")
      .join(kept.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Injected partial overlaps: for doc_id < 25, a NEW doc whose text is
    * a 160-char slice of the original plus a fresh tail — a substring
    * dup that whole-doc fingerprints (md5, MinHash at 0.4) miss but
    * [[sharedSpanPairs]] must find. */
  private[graft] def sliceCopies(d: DataFrame): DataFrame =
    d.filter(col("doc_id") < 25).select(
      (col("doc_id") + 3000000).as("doc_id"),
      concat(substring(col("text"), 41, 160), lit(" tail"),
        col("doc_id").cast("string")).as("text"))

  /** Corpus + slice copies (see [[sliceCopies]]). */
  private[graft] def withSpanDups(d: DataFrame): DataFrame =
    d.select(col("doc_id"), col("text")).unionAll(sliceCopies(d))

  /** Winnow-postings index of a corpus for [[incrementalSharedSpans]]:
    * (doc_id, fp), df-capped at BUILD time (the same policy as
    * [[buildBandIndex]]: a hot boilerplate fingerprint is dropped once,
    * so no later probe pays for it). Unlike the batch pair query, df=1
    * postings are KEPT — a future probe doc can still match them.
    * Persist bucketed by fp so probe joins prune partitions. */
  def buildSpanIndex(d: DataFrame, maxDf: Long = MaxSpanDf): DataFrame = {
    val fps = d.select(col("doc_id"),
      explode(graft.functions.Vec.winnow_fps(
        regexp_replace(lower(col("text")), "[^a-z0-9]", ""),
        SpanGram, SpanWindow)).as("fp"))
    capBuckets(fps, Seq("fp"), maxDf)
  }

  /** Substring-level incremental probe: NEW documents checked against a
    * persisted winnow-postings index — history is never re-winnowed,
    * and each probe posting joins at most `maxDf` index rows (the
    * build-time cap bounds the fan-out), so probe cost is proportional
    * to the batch, not the corpus. Returns (new_id, existing_id,
    * n_shared) at/above `minShared` shared fingerprints. */
  def incrementalSharedSpans(newDocs: DataFrame, index: DataFrame,
      minShared: Long = 5L): DataFrame =
    newDocs.select(col("doc_id").as("new_id"),
        explode(graft.functions.Vec.winnow_fps(
          regexp_replace(lower(col("text")), "[^a-z0-9]", ""),
          SpanGram, SpanWindow)).as("fp"))
      .join(index.select(col("doc_id").as("existing_id"), col("fp")), "fp")
      .groupBy(col("new_id"), col("existing_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)

  /** Slice copies probed against the base corpus's span index. Fully
    * oracled (portable winnow hash), like `dedup_incremental`'s portable
    * band index. */
  val spansIncremental: GraftQuery = GraftQuery(
    "dedup_spans_incremental",
    (s, dir) => {
      val d = docs(s, dir)
      val index = buildSpanIndex(d).localCheckpoint()
      incrementalSharedSpans(sliceCopies(d), index)
    },
    Some(
      s"""WITH probe AS (
         |  SELECT doc_id + 3000000 AS doc_id,
         |    substr(text, 41, 160) || ' tail' || CAST(doc_id AS VARCHAR)
         |      AS text
         |  FROM documents WHERE doc_id < 25),
         |norm_b AS (
         |  SELECT doc_id,
         |    regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS s
         |  FROM documents),
         |h_b AS (
         |  SELECT doc_id,
         |    list_transform(generate_series(1, len(s) - ${SpanGram - 1}),
         |      i -> list_reduce(list_transform(
         |             generate_series(i, i + ${SpanGram - 1}),
         |             j -> CAST(ascii(s[j]) AS BIGINT)),
         |           (a, x) -> (a * 131 + x) % 1000000007)) AS hs
         |  FROM norm_b WHERE len(s) >= $SpanGram),
         |fp_b AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |      generate_series(1, greatest(len(hs) - ${SpanWindow - 1}, 1)),
         |      i -> list_min(hs[i:i+${SpanWindow - 1}])))) AS fp
         |  FROM h_b),
         |df_b AS (SELECT fp, count(*) AS df FROM fp_b GROUP BY 1),
         |idx AS (
         |  SELECT f.doc_id, f.fp FROM fp_b f JOIN df_b d ON f.fp = d.fp
         |  WHERE d.df <= $MaxSpanDf),
         |norm_p AS (
         |  SELECT doc_id,
         |    regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS s
         |  FROM probe),
         |h_p AS (
         |  SELECT doc_id,
         |    list_transform(generate_series(1, len(s) - ${SpanGram - 1}),
         |      i -> list_reduce(list_transform(
         |             generate_series(i, i + ${SpanGram - 1}),
         |             j -> CAST(ascii(s[j]) AS BIGINT)),
         |           (a, x) -> (a * 131 + x) % 1000000007)) AS hs
         |  FROM norm_p WHERE len(s) >= $SpanGram),
         |fp_p AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |      generate_series(1, greatest(len(hs) - ${SpanWindow - 1}, 1)),
         |      i -> list_min(hs[i:i+${SpanWindow - 1}])))) AS fp
         |  FROM h_p)
         |SELECT p.doc_id AS new_id, i.doc_id AS existing_id,
         |  count(*) AS n_shared
         |FROM fp_p p JOIN idx i ON p.fp = i.fp
         |GROUP BY 1, 2 HAVING count(*) >= 5""".stripMargin))

  val sharedSpans: GraftQuery = GraftQuery(
    "dedup_shared_spans",
    (s, dir) => sharedSpanPairs(withSpanDups(docs(s, dir))),
    Some(
      s"""WITH inj AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 3000000,
         |    substr(text, 41, 160) || ' tail' || CAST(doc_id AS VARCHAR)
         |  FROM documents WHERE doc_id < 25),
         |norm AS (
         |  SELECT doc_id,
         |    regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS s
         |  FROM inj),
         |h AS (
         |  SELECT doc_id,
         |    list_transform(generate_series(1, len(s) - ${SpanGram - 1}),
         |      i -> list_reduce(list_transform(
         |             generate_series(i, i + ${SpanGram - 1}),
         |             j -> CAST(ascii(s[j]) AS BIGINT)),
         |           (a, x) -> (a * 131 + x) % 1000000007)) AS hs
         |  FROM norm WHERE len(s) >= $SpanGram),
         |fp AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |      generate_series(1, greatest(len(hs) - ${SpanWindow - 1}, 1)),
         |      i -> list_min(hs[i:i+${SpanWindow - 1}])))) AS fp
         |  FROM h),
         |df AS (SELECT fp, count(*) AS df FROM fp GROUP BY 1),
         |kept AS (
         |  SELECT f.doc_id, f.fp FROM fp f JOIN df d ON f.fp = d.fp
         |  WHERE d.df BETWEEN 2 AND $MaxSpanDf)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  count(*) AS n_shared
         |FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= 5""".stripMargin))

  // ---------------------------------------------------------------------
  // EXACT duplicated spans (the certification layer above the winnow
  // screen)
  // ---------------------------------------------------------------------

  /** Exact-span granularity in tokens: a duplicated region is reported
    * iff an identical `ExactSpanGram`-token sequence occurs at least
    * twice in the corpus (anywhere — across documents or repeated
    * within one, the Lee et al. 2022 convention), and reported spans
    * are the per-document MAXIMAL merged extents, so every span is
    * ≥ this many tokens. The public-literature standard is ~50 tokens
    * on web corpora; the fixture documents run 30–60 tokens, so the
    * operator pins the machinery at 12 and the granularity is a plain
    * parameter. */
  val ExactSpanGram = 12

  /** EXACT duplicated-span extraction — the certification pass above
    * the [[sharedSpanPairs]] winnow screen. Winnowing is approximate by
    * construction (only sampled fingerprints are compared; a span is
    * GUARANTEED to share one only at 27+ normalized chars, and reported
    * evidence is fingerprint counts, not extents); this operator
    * reports the exact maximal duplicated token ranges, the form
    * suitable for span REMOVAL (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better" — their
    * suffix-array ExactSubstr pass, re-shaped for Spark as sorted
    * shingle postings + neighbor runs).
    *
    * Shape and exactness:
    *  1. positional shingle-hash postings (doc_id, pos, h) — one
    *     codegen'd scan-stage kernel pass
    *     ([[graft.functions.Vec.shinglePosHashes]]), 20-byte rows;
    *  2. screen: ONE hash exchange keyed on h; a hash occurring once
    *     cannot be a duplicate (count ≥ 2 keeps true dups plus the
    *     ~2⁻⁶⁰-rate collisions) — no df cap and no pair join anywhere:
    *     unlike the pair REPORT queries, span extraction is linear in
    *     postings, so even a boilerplate span present in a million
    *     documents costs a million rows, never a million² join;
    *  3. certify: candidate positions only (a semi-join prunes the
    *     token-array fetch to candidate docs) re-derive their shingle
    *     STRINGS and re-group on the string itself — hash collisions
    *     fall out here, so the output is EXACT string equality, not
    *     "equal up to hash collision";
    *  4. per-document interval merge of the surviving [pos, pos+n-1]
    *     windows (gaps-and-islands over a doc-keyed window — bounded
    *     per doc, the scalable window shape) into maximal spans.
    * At 100 TB the screen exchange dominates and is linear in corpus
    * tokens; the certify stage touches only candidate docs. */
  def exactDuplicatedSpans(d: DataFrame,
      gram: Int = ExactSpanGram): DataFrame =
    mergeTokenSpans(
      certifiedWindows(d, gram).select(col("doc_id"), col("pos")), gram)

  /** The shared certification core of [[exactDuplicatedSpans]] and
    * [[removeDuplicatedSpans]]: every token window (doc_id, pos) whose
    * `gram`-token shingle STRING occurs at least twice in the corpus,
    * returned WITH the shingle (the removal pass ranks occurrences per
    * shingle). Stages 1–3 of the operator doc above: positional
    * shingle-hash postings, the count ≥ 2 hash screen (one 20-byte-row
    * exchange — the only corpus-sized shuffle), string re-derivation
    * over candidate docs only. */
  private def certifiedWindows(d: DataFrame, gram: Int): DataFrame = {
    val toks = d
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
      .filter(size(col("toks")) >= gram)
    val sh = toks.select(col("doc_id"),
      posexplode(graft.functions.Vec.shingle_pos_hashes(col("toks"), gram)))
      .withColumnRenamed("col", "h")
    val byH = Window.partitionBy(col("h"))
    val cand = sh.withColumn("df", count(lit(1)).over(byH))
      .filter(col("df") >= 2).drop("df")
    val candToks = toks.join(cand.select(col("doc_id")).distinct(),
      Seq("doc_id"), "left_semi")
    val byS = Window.partitionBy(col("shingle"))
    cand.join(candToks, Seq("doc_id"))
      .withColumn("shingle",
        array_join(slice(col("toks"), col("pos") + 1, lit(gram)), " "))
      .withColumn("n", count(lit(1)).over(byS))
      .filter(col("n") >= 2)
      .select(col("doc_id"), col("pos"), col("shingle"))
  }

  /** Exact-span REMOVAL — the intervention [[exactDuplicatedSpans]]'s
    * report exists for (Lee et al. 2022: cut every duplicated span,
    * keeping one occurrence). Policy, stated at window granularity so
    * it is deterministic and oracle-mirrorable: among all occurrences
    * of a certified duplicated `gram`-token window, the FIRST in
    * (doc_id, pos) order survives; every other occurrence marks its
    * tokens for removal, and the marked windows merge per document
    * into maximal cut extents (the report's gaps-and-islands). A CUT doc
    * re-emits its surviving tokens joined by single spaces (original
    * casing — only the MATCH is case-folded); an un-cut doc passes
    * through verbatim. A verbatim slice copy
    * of an earlier doc comes back EMPTY while its source is untouched,
    * and an intra-doc repeat keeps its first extent only. Overlap
    * corner, documented: a token covered by both a kept-first window
    * and a later duplicate's window is still cut — removal is coverage
    * of non-first windows, the conservative reading.
    *
    * Scale shape: the certification stages are [[certifiedWindows]]
    * (the screen exchange stays the only corpus-sized shuffle); the
    * occurrence rank adds a window keyed on the shingle string over
    * CERTIFIED windows only (duplicated-region rows, a corpus
    * fraction); the rewrite joins the corpus against per-doc cut
    * ranges — metadata-sized rows (one row per doc WITH cuts, ~3 ints
    * per merged extent), BROADCAST by default so the text side never
    * shuffles (plan-pinned; a stats-blind sort-merge here would
    * re-exchange the whole corpus to join rows it mostly left-keeps).
    * `broadcastCuts = false` is the escape hatch for pathological
    * corpora whose cut metadata outgrows the driver (~100M+ cut docs):
    * the join falls back to doc-keyed co-partitioning, which the
    * store's doc-bucketed layout serves without moving the text.
    * Output: (doc_id, text, removed_tokens). */
  def removeDuplicatedSpans(d: DataFrame,
      gram: Int = ExactSpanGram,
      broadcastCuts: Boolean = true): DataFrame = {
    val byShingle = Window.partitionBy(col("shingle"))
      .orderBy(col("doc_id"), col("pos"))
    val cuts = certifiedWindows(d, gram)
      .withColumn("rk", row_number().over(byShingle))
      .filter(col("rk") >= 2)
      .select(col("doc_id"), col("pos"))
    applyCuts(d, mergeTokenSpans(cuts, gram), broadcastCuts)
  }

  /** Cut `ranges` (doc_id, span_start, span_end) out of `d`'s token
    * streams — the shared rewrite tail of [[removeDuplicatedSpans]]
    * and [[removeIncrementalSpans]]: per-doc ranges collect to a
    * metadata frame (broadcast by default — text never shuffles), the
    * token filter is a codegen'd higher-order expression, and the doc
    * re-emits its kept tokens joined by single spaces. */
  private def applyCuts(d: DataFrame, ranges: DataFrame,
      broadcastCuts: Boolean): DataFrame = {
    val perDoc = ranges
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("span_start").as("s"),
        col("span_end").as("e"))).as("cuts"))
    d.select(col("doc_id"), col("text"))
      .join(if (broadcastCuts) broadcast(perDoc) else perDoc,
        Seq("doc_id"), "left")
      .withColumn("otoks", split(col("text"), "\\s+"))
      .withColumn("kept", when(col("cuts").isNull, col("otoks"))
        .otherwise(expr(
          "filter(otoks, (t, i) -> NOT exists(cuts, " +
            "c -> i >= c.s AND i <= c.e))")))
      // an un-cut doc passes through VERBATIM (null text, tabs, runs of
      // spaces all preserved — the operator touches nothing it does not
      // cut); only docs with cut extents are re-joined on single spaces
      .select(col("doc_id"),
        when(col("cuts").isNull, col("text"))
          .otherwise(array_join(col("kept"), " ")).as("text"),
        coalesce(size(col("otoks")) - size(col("kept")), lit(0))
          .cast("int").as("removed_tokens"))
  }

  /** Public cut application — compose span reports into removal:
    * `cutSpans(docs, IndexStore.searchExactSpans(store, spark, docs,
    * corpus))` is ingest-time removal against an AT-REST postings
    * index (history never re-shingled). `ranges` is any
    * (doc_id, span_start, span_end) frame. */
  def cutSpans(d: DataFrame, ranges: DataFrame,
      broadcastCuts: Boolean = true): DataFrame =
    applyCuts(d, ranges, broadcastCuts)

  /** Span removal AT INGEST: cut from the NEW documents every extent
    * that already exists verbatim in the indexed corpus
    * ([[incrementalExactSpans]] certifies; this consumes). The
    * keep-first policy degenerates cleanly here — history IS earlier,
    * so every history-duplicated probe window is a non-first occurrence
    * and is cut; extents duplicated only WITHIN the new batch are the
    * batch operator's job ([[removeDuplicatedSpans]] over the batch, or
    * the next compaction). Returns the cleaned probe docs:
    * (doc_id, text, removed_tokens). */
  def removeIncrementalSpans(newDocs: DataFrame, index: DataFrame,
      corpus: DataFrame, gram: Int = ExactSpanGram,
      broadcastCuts: Boolean = true,
      broadcastCandidates: Boolean = true): DataFrame =
    applyCuts(newDocs,
      incrementalExactSpans(newDocs, index, corpus, gram,
        broadcastCandidates), broadcastCuts)

  /** Gaps-and-islands merge of per-document duplicated shingle windows
    * [pos, pos + gram − 1] into maximal spans — the shared tail of the
    * batch certification and the incremental probe. Adjacent windows
    * merge (contiguous duplicated coverage is one removable region);
    * per-doc windows, so the shuffle key is the document — the
    * bounded-partition window shape. Input: (doc_id, pos). */
  private def mergeTokenSpans(verified: DataFrame, gram: Int): DataFrame = {
    val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    verified
      .withColumn("e", col("pos") + lit(gram - 1))
      .withColumn("maxe",
        max(col("e")).over(wOrd.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("brk",
        when(col("maxe").isNull || col("pos") > col("maxe") + 1, 1L)
          .otherwise(0L))
      .withColumn("isl",
        sum(col("brk")).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("isl"))
      .agg(min(col("pos")).as("s0"), max(col("e")).as("e0"))
      .select(col("doc_id"),
        col("s0").cast("int").as("span_start"),
        col("e0").cast("int").as("span_end"),
        (col("e0") - col("s0") + 1).cast("int").as("span_tokens"))
  }

  /** Positional shingle-hash postings index of a corpus for
    * [[incrementalExactSpans]]: (doc_id, pos, h) — one scan-stage
    * kernel pass, NO cap (span probing is linear in matching postings,
    * never a pair join; see [[exactDuplicatedSpans]]). Persist bucketed
    * by h so probe joins prune partitions. */
  def buildExactSpanIndex(d: DataFrame,
      gram: Int = ExactSpanGram): DataFrame =
    d.select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
      .filter(size(col("toks")) >= gram)
      .select(col("doc_id"),
        posexplode(graft.functions.Vec.shingle_pos_hashes(col("toks"), gram)))
      .withColumnRenamed("col", "h")

  /** Incremental exact-span probe: which spans of the NEW documents
    * already exist verbatim in an indexed corpus — the
    * [[exactDuplicatedSpans]] certification applied at ingest time,
    * without re-shingling history. The probe's positional hashes join
    * the at-rest postings (hash screen); certification re-derives the
    * shingle STRINGS on both sides, the existing side from `corpus`
    * text fetched for CANDIDATE docs only (a semi-join prunes the
    * fetch — history is re-tokenized only where a hash matched, the
    * batch operator's certify discipline, so the result states exact
    * string equality, not hash equality). Returns maximal duplicated
    * extents of the new docs: (doc_id, span_start, span_end,
    * span_tokens).
    *
    * `broadcastCandidates` is the escape hatch mirroring
    * [[applyCuts]]'s `broadcastCuts`: the candidate-id set is bounded
    * by the probe's hash matches in the COMMON case, but one
    * boilerplate shingle shared by millions of history docs makes it
    * corpus-sized — past the driver's broadcast budget the forced
    * hint would OOM instead of degrading. `false` falls back to a
    * shuffled semi-join (the corpus text exchanges by doc_id — the
    * measured 1→26 MB probe-shape cost, paid knowingly, never a
    * failure). */
  def incrementalExactSpans(newDocs: DataFrame, index: DataFrame,
      corpus: DataFrame, gram: Int = ExactSpanGram,
      broadcastCandidates: Boolean = true): DataFrame = {
    val pToks = newDocs
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
      .filter(size(col("toks")) >= gram)
      .localCheckpoint() // probe-sized; read by postings AND certify
    val pPost = pToks.select(col("doc_id"),
      posexplode(graft.functions.Vec.shingle_pos_hashes(col("toks"), gram)))
      .withColumnRenamed("col", "h")
    val hits = pPost.join(index.select(col("doc_id").as("ex_id"),
      col("pos").as("ex_pos"), col("h")), "h")
    // BROADCAST the candidate-id semi-join: candidates are bounded by
    // the probe's hash matches (probe-sized in the common case), while
    // the corpus is the big side — a shuffled semi join here exchanges
    // the WHOLE corpus text by doc_id just to drop non-candidates
    // (measured: a fixed 25-doc probe's shuffle grew 1→26 MB as the
    // at-rest index grew 1×→30×, the round-10 probe-shape bug in a new
    // coat). Broadcast keeps the corpus scan exchange-free; text is
    // dropped scan-side and only candidate docs' tokens flow on.
    val candIds = hits.select(col("ex_id").as("doc_id")).distinct()
    val exToks = corpus
      .join(if (broadcastCandidates) broadcast(candIds) else candIds,
        Seq("doc_id"), "left_semi")
      .select(col("doc_id").as("ex_id"),
        split(lower(col("text")), "\\s+").as("ex_toks"))
    val certified = hits
      .join(pToks, Seq("doc_id"))
      .join(exToks, Seq("ex_id"))
      .filter(array_join(slice(col("toks"), col("pos") + 1, lit(gram)), " ")
        === array_join(
          slice(col("ex_toks"), col("ex_pos") + 1, lit(gram)), " "))
      .select(col("doc_id"), col("pos"))
      .distinct()
    mergeTokenSpans(certified, gram)
  }

  /** Slice copies probed for exact spans against the base corpus's
    * positional postings index — the ingest-time form of
    * [[exactSpans]], same oracle discipline (the DuckDB side works in
    * shingle strings end-to-end). */
  val exactSpansIncremental: GraftQuery = GraftQuery(
    "dedup_exact_spans_incremental",
    (s, dir) => {
      val d = docs(s, dir)
      val index = buildExactSpanIndex(d).localCheckpoint()
      incrementalExactSpans(sliceCopies(d), index, d)
    },
    Some {
      val g = ExactSpanGram
      s"""WITH probe AS (
         |  SELECT doc_id + 3000000 AS doc_id,
         |    substr(text, 41, 160) || ' tail' || CAST(doc_id AS VARCHAR)
         |      AS text
         |  FROM documents WHERE doc_id < 25),
         |bt AS (
         |  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t
         |  FROM documents),
         |bs AS (
         |  SELECT DISTINCT
         |    unnest(list_transform(generate_series(1, len(t) - $g + 1),
         |      i -> array_to_string(t[i:i+${g - 1}], ' '))) AS s
         |  FROM bt WHERE len(t) >= $g),
         |pt AS (
         |  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t
         |  FROM probe),
         |ps AS (
         |  SELECT doc_id,
         |    unnest(generate_series(0, len(t) - $g)) AS pos,
         |    unnest(list_transform(generate_series(1, len(t) - $g + 1),
         |      i -> array_to_string(t[i:i+${g - 1}], ' '))) AS s
         |  FROM pt WHERE len(t) >= $g),
         |dup AS (
         |  SELECT doc_id, pos FROM ps
         |  WHERE s IN (SELECT s FROM bs)),
         |iv AS (SELECT doc_id, pos, pos + ${g - 1} AS e FROM dup),
         |isl AS (
         |  SELECT doc_id, pos, e,
         |    CASE WHEN pos <= max(e) OVER (PARTITION BY doc_id
         |        ORDER BY pos
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
         |      THEN 0 ELSE 1 END AS brk
         |  FROM iv),
         |grp AS (
         |  SELECT doc_id, pos, e,
         |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS UNBOUNDED PRECEDING) AS grp_id
         |  FROM isl)
         |SELECT doc_id, CAST(min(pos) AS INTEGER) AS span_start,
         |  CAST(max(e) AS INTEGER) AS span_end,
         |  CAST(max(e) - min(pos) + 1 AS INTEGER) AS span_tokens
         |FROM grp GROUP BY doc_id, grp_id""".stripMargin
    })

  /** The ingest-time removal, hash-oracled like its batch twin: slice
    * copies probed against the base corpus's postings index, their
    * history-duplicated extents cut, the cleaned probes re-emitted.
    * The oracle mirrors probe-vs-history certification (windows whose
    * shingle string exists ANYWHERE in the base corpus) and recomputes
    * the cut by string ops. */
  val spansRemovedIncremental: GraftQuery = GraftQuery(
    "dedup_spans_removed_incremental",
    (s, dir) => {
      val d = docs(s, dir)
      val index = buildExactSpanIndex(d).localCheckpoint()
      removeIncrementalSpans(sliceCopies(d), index, d)
    },
    Some {
      val g = ExactSpanGram
      s"""WITH probe AS (
         |  SELECT doc_id + 3000000 AS doc_id,
         |    substr(text, 41, 160) || ' tail' || CAST(doc_id AS VARCHAR)
         |      AS text
         |  FROM documents WHERE doc_id < 25),
         |bt AS (
         |  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t
         |  FROM documents),
         |bs AS (
         |  SELECT DISTINCT
         |    unnest(list_transform(generate_series(1, len(t) - $g + 1),
         |      i -> array_to_string(t[i:i+${g - 1}], ' '))) AS s
         |  FROM bt WHERE len(t) >= $g),
         |pt AS (
         |  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t
         |  FROM probe),
         |po AS (
         |  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t
         |  FROM probe),
         |ps AS (
         |  SELECT doc_id,
         |    unnest(generate_series(0, len(t) - $g)) AS pos,
         |    unnest(list_transform(generate_series(1, len(t) - $g + 1),
         |      i -> array_to_string(t[i:i+${g - 1}], ' '))) AS s
         |  FROM pt WHERE len(t) >= $g),
         |dup AS (
         |  SELECT doc_id, pos FROM ps
         |  WHERE s IN (SELECT s FROM bs)),
         |iv AS (SELECT doc_id, pos, pos + ${g - 1} AS e FROM dup),
         |isl AS (
         |  SELECT doc_id, pos, e,
         |    CASE WHEN pos <= max(e) OVER (PARTITION BY doc_id
         |        ORDER BY pos
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
         |      THEN 0 ELSE 1 END AS brk
         |  FROM iv),
         |grp AS (
         |  SELECT doc_id, pos, e,
         |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS UNBOUNDED PRECEDING) AS grp_id
         |  FROM isl),
         |cuts AS (
         |  SELECT doc_id, min(pos) AS s0, max(e) AS e0
         |  FROM grp GROUP BY doc_id, grp_id),
         |tok AS (
         |  SELECT doc_id,
         |    unnest(generate_series(0, len(t) - 1)) AS pos,
         |    unnest(t) AS tok
         |  FROM po),
         |kept AS (
         |  SELECT tk.doc_id, tk.pos, tk.tok FROM tok tk
         |  WHERE NOT EXISTS (SELECT 1 FROM cuts c
         |    WHERE c.doc_id = tk.doc_id
         |      AND tk.pos BETWEEN c.s0 AND c.e0)),
         |ka AS (
         |  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS ktext,
         |    count(*) AS kn
         |  FROM kept GROUP BY doc_id)
         |SELECT p.doc_id,
         |  CASE WHEN cd.doc_id IS NULL THEN p.text
         |    ELSE coalesce(ka.ktext, '') END AS text,
         |  CAST(CASE WHEN cd.doc_id IS NULL THEN 0
         |    ELSE len(o.t) - coalesce(ka.kn, 0) END AS INTEGER)
         |    AS removed_tokens
         |FROM probe p
         |LEFT JOIN po o ON p.doc_id = o.doc_id
         |LEFT JOIN (SELECT DISTINCT doc_id FROM cuts) cd
         |  ON p.doc_id = cd.doc_id
         |LEFT JOIN ka ON p.doc_id = ka.doc_id"""
        .stripMargin
    })

  /** The certification layer, hash-oracled over the same
    * slice-copy-injected corpus the winnow screen uses — every injected
    * 160-char slice yields an exact shared token run well above the
    * 12-token granularity, and the DuckDB oracle recomputes the
    * duplicated-shingle set from shingle STRINGS (no hash anywhere in
    * its path: the engine's hash screen is certified away by its own
    * string re-group, so both sides state exact string equality). */
  val exactSpans: GraftQuery = GraftQuery(
    "dedup_exact_spans",
    (s, dir) => exactDuplicatedSpans(withSpanDups(docs(s, dir))),
    Some {
      val g = ExactSpanGram
      s"""WITH inj AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 3000000,
         |    substr(text, 41, 160) || ' tail' || CAST(doc_id AS VARCHAR)
         |  FROM documents WHERE doc_id < 25),
         |toks AS (
         |  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t
         |  FROM inj),
         |sh AS (
         |  SELECT doc_id,
         |    unnest(generate_series(0, len(t) - $g)) AS pos,
         |    unnest(list_transform(generate_series(1, len(t) - $g + 1),
         |      i -> array_to_string(t[i:i+${g - 1}], ' '))) AS s
         |  FROM toks WHERE len(t) >= $g),
         |dup AS (
         |  SELECT doc_id, pos FROM sh
         |  WHERE s IN (SELECT s FROM sh GROUP BY s HAVING count(*) >= 2)),
         |iv AS (SELECT doc_id, pos, pos + ${g - 1} AS e FROM dup),
         |isl AS (
         |  SELECT doc_id, pos, e,
         |    CASE WHEN pos <= max(e) OVER (PARTITION BY doc_id
         |        ORDER BY pos
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
         |      THEN 0 ELSE 1 END AS brk
         |  FROM iv),
         |grp AS (
         |  SELECT doc_id, pos, e,
         |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS UNBOUNDED PRECEDING) AS grp_id
         |  FROM isl)
         |SELECT doc_id, CAST(min(pos) AS INTEGER) AS span_start,
         |  CAST(max(e) AS INTEGER) AS span_end,
         |  CAST(max(e) - min(pos) + 1 AS INTEGER) AS span_tokens
         |FROM grp GROUP BY doc_id, grp_id""".stripMargin
    })

  /** The removal pass over the same slice-copy-injected corpus: the
    * oracle recomputes the cut entirely by string ops — certified
    * windows from shingle strings, keep-first rank per shingle, merged
    * cut extents, token-level anti-join, string_agg rebuild — so both
    * sides state the same keep-first contract end-to-end. */
  val spansRemoved: GraftQuery = GraftQuery(
    "dedup_spans_removed",
    (s, dir) => removeDuplicatedSpans(withSpanDups(docs(s, dir))),
    Some {
      val g = ExactSpanGram
      s"""WITH inj AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 3000000,
         |    substr(text, 41, 160) || ' tail' || CAST(doc_id AS VARCHAR)
         |  FROM documents WHERE doc_id < 25),
         |toks AS (
         |  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t
         |  FROM inj),
         |otoks AS (
         |  SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t
         |  FROM inj),
         |sh AS (
         |  SELECT doc_id,
         |    unnest(generate_series(0, len(t) - $g)) AS pos,
         |    unnest(list_transform(generate_series(1, len(t) - $g + 1),
         |      i -> array_to_string(t[i:i+${g - 1}], ' '))) AS s
         |  FROM toks WHERE len(t) >= $g),
         |dup AS (
         |  SELECT doc_id, pos, s FROM sh
         |  WHERE s IN (SELECT s FROM sh GROUP BY s HAVING count(*) >= 2)),
         |nf AS (
         |  SELECT doc_id, pos FROM (
         |    SELECT doc_id, pos,
         |      row_number() OVER (PARTITION BY s
         |        ORDER BY doc_id, pos) AS rk
         |    FROM dup) WHERE rk >= 2),
         |iv AS (SELECT doc_id, pos, pos + ${g - 1} AS e FROM nf),
         |isl AS (
         |  SELECT doc_id, pos, e,
         |    CASE WHEN pos <= max(e) OVER (PARTITION BY doc_id
         |        ORDER BY pos
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
         |      THEN 0 ELSE 1 END AS brk
         |  FROM iv),
         |grp AS (
         |  SELECT doc_id, pos, e,
         |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS UNBOUNDED PRECEDING) AS grp_id
         |  FROM isl),
         |cuts AS (
         |  SELECT doc_id, min(pos) AS s0, max(e) AS e0
         |  FROM grp GROUP BY doc_id, grp_id),
         |tok AS (
         |  SELECT doc_id,
         |    unnest(generate_series(0, len(t) - 1)) AS pos,
         |    unnest(t) AS tok
         |  FROM otoks),
         |kept AS (
         |  SELECT tk.doc_id, tk.pos, tk.tok FROM tok tk
         |  WHERE NOT EXISTS (SELECT 1 FROM cuts c
         |    WHERE c.doc_id = tk.doc_id
         |      AND tk.pos BETWEEN c.s0 AND c.e0)),
         |ka AS (
         |  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS ktext,
         |    count(*) AS kn
         |  FROM kept GROUP BY doc_id)
         |SELECT i.doc_id,
         |  CASE WHEN cd.doc_id IS NULL THEN i.text
         |    ELSE coalesce(ka.ktext, '') END AS text,
         |  CAST(CASE WHEN cd.doc_id IS NULL THEN 0
         |    ELSE len(o.t) - coalesce(ka.kn, 0) END AS INTEGER)
         |    AS removed_tokens
         |FROM inj i
         |LEFT JOIN otoks o ON i.doc_id = o.doc_id
         |LEFT JOIN (SELECT DISTINCT doc_id FROM cuts) cd
         |  ON i.doc_id = cd.doc_id
         |LEFT JOIN ka ON i.doc_id = ka.doc_id"""
        .stripMargin
    })

  // ---------------------------------------------------------------------
  // Embedding-cosine near-dup
  // ---------------------------------------------------------------------

  /** Sign bits of embedding dimensions [from, to], packed into a Long
    * (first dimension = most significant). try_element_at: a vector
    * shorter than `to` contributes 0-bits past its length instead of an
    * out-of-bounds error (EdgeCaseSpec). */
  private def signBits(from: Int, to: Int): Column = expr(
    s"""aggregate(sequence($from, $to), 0L,
      |  (acc, i) -> shiftleft(acc, 1) +
      |    IF(coalesce(try_element_at(embedding, i) >= 0, false), 1L, 0L))
      |""".stripMargin)

  /** Unit-normalized embedding + sign-LSH bucket over the first `bits`
    * dimensions (axis-aligned hyperplanes: stable under the scale
    * perturbation of injected dups). Wider buckets (fewer bits) trade
    * probe cost for recall — near-dup detection uses 16 bits, ANN probing
    * uses 8. */
  def normalizedWithBucket(e: DataFrame, bits: Int = 16): DataFrame =
    e.withColumn("unit", graft.functions.Vec.vec_unit(col("embedding")))
      .filter(col("unit").isNotNull)
      .withColumn("bucket", signBits(1, bits))

  /** Expand each (…, unit, bucket) row with its margin-gated Hamming-1
    * sign buckets: for every bit of the `bits`-wide key whose dimension
    * lies within `sqrt(2(1−threshold))` of zero, emit the row again
    * under the bucket with that bit flipped. The margin is an exact
    * impossibility bound, not a heuristic: a pair at cosine ≥ t has
    * ‖u−v‖ ≤ sqrt(2(1−t)), so a component of magnitude above that can
    * never change sign between true near-duplicates — flipping its bit
    * could only surface pairs the cosine filter rejects anyway. Output
    * multiplicity ≤ 1+bits per row (≈9× measured on isotropic 64-dim
    * units at t=0.99); an index/partner row lives in exactly ONE
    * bucket, so no downstream pair can match twice. Closes the
    * sign-boundary recall gap of [[normalizedWithBucket]] joins for
    * single-bit splits; simultaneous flips of two sub-margin dimensions
    * remain the documented residual miss (standard multi-probe LSH
    * trade). */
  def multiProbeBuckets(rows: DataFrame, threshold: Double,
      bits: Int = 16, includeSelf: Boolean = true): DataFrame = {
    val margin = math.sqrt(2.0 * (1.0 - threshold))
    val flips =
      s"""filter(
         |  transform(sequence(1, $bits), mj ->
         |    IF(coalesce(abs(try_element_at(unit, mj)) <= $margin,
         |         false),
         |       bucket ^ shiftleft(1L, $bits - mj), CAST(-1 AS BIGINT))),
         |  mb -> mb >= 0)""".stripMargin
    val arr =
      if (includeSelf) s"array_union(array(bucket), $flips)" else flips
    rows.withColumn("bucket", explode(expr(arr)))
  }

  /** In-bucket population cap for the embedding-cosine family — the
    * analogue of [[MaxBucketSize]] for sign buckets. In-bucket pair
    * generation is quadratic in the densest bucket, and on clustered
    * real-world embeddings (the 100 TB case) axis-aligned sign buckets
    * concentrate mass exactly where the corpus does. */
  val EmbBucketCap = 1024

  /** [[normalizedWithBucket]] hardened for clustered corpora: any bucket
    * holding more than `cap` vectors gets `step` further sign bits
    * appended — recursively, until every bucket is ≤ `cap` or `maxBits`
    * dimensions are consumed — and a bucket still over the cap at
    * `maxBits` (vectors agreeing in every tested sign, e.g. an
    * exact-duplicate pileup) is truncated to its `cap` lowest-xxhash64
    * members, the same policy [[MaxBucketSize]] applies to LSH band
    * buckets. Identically-directed vectors agree in ALL sign bits, so
    * sub-splitting never separates a true dup pair; only the final
    * truncation is lossy, and only inside a single still-over-cap bucket
    * (documented recall trade, mirrored from the band index).
    *
    * The returned `bucket` encodes (prefix value, prefix length), so
    * buckets finalized at different depths can never collide on the
    * self-join key. Scale shape: each level aggregates bucket counts
    * (map-side partial) and keeps only the OVERSIZED bucket ids — at
    * most rows/cap entries, so the anti/semi joins against it broadcast
    * under AQE; only the still-oversized remainder is re-keyed. The
    * driver reads one boolean per level (is anything still oversized? —
    * the [[graft.operators.CurationOps.connectedComponents]] pattern),
    * so the common isotropic path pays exactly one bucket-count
    * aggregation and exits. */
  def normalizedWithCappedBucket(e: DataFrame, idCol: String,
      bits: Int = 16, cap: Int = EmbBucketCap, step: Int = 8,
      maxBits: Int = 48): DataFrame =
    cappedFromBucketed(normalizedWithBucket(e, bits), idCol, bits, cap,
      step, maxBits)

  /** [[normalizedWithCappedBucket]] over rows ALREADY carrying (unit,
    * bucket) from [[normalizedWithBucket]] — callers that need both the
    * fixed and the capped key (the streaming gate, the batch near-dup
    * pair query) normalize and sign-bucket ONCE and derive both from
    * the same frame instead of scanning the input twice. `bits` must be
    * the width `rows` was bucketed at — sub-splitting appends sign bits
    * STARTING at `bits`+1, so a narrower claim would re-append bits the
    * key already holds.
    *
    * `truncate = false` keeps a bucket that is still over the cap at
    * `maxBits` WHOLE instead of hash-truncating it to `cap` members:
    * rows agreeing on all `maxBits` sign bits pair quadratically, but
    * nothing silently escapes the pair join. The streaming ingest gate
    * needs this — a truncated row would skip intra-batch dedup and
    * COMMIT permanently (unlike the batch pair REPORT, where the lossy
    * cap is the documented skew trade) — and its quadratic corner is
    * micro-batch-bounded: a maxBits-sign-identical pileup is exactly
    * the near-duplicate burst the greedy drop collapses anyway. */
  def cappedFromBucketed(rows: DataFrame, idCol: String,
      bits: Int = 16, cap: Int = EmbBucketCap, step: Int = 8,
      maxBits: Int = 48, truncate: Boolean = true): DataFrame = {
    require(cap > 0 && step > 0 && maxBits > bits && maxBits <= 57,
      "need cap > 0, step > 0, bits < maxBits <= 57")
    // (value, length) -> collision-free Long key: length fits in 6 bits
    def finalized(df: DataFrame, nbits: Int): DataFrame =
      df.withColumn("bucket", shiftleft(col("bucket"), 6) + lit(nbits.toLong))
    var cur = rows.localCheckpoint(eager = false)
    var nbits = bits
    val done = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var oversized = true
    while (oversized && nbits < maxBits) {
      val over = cur.groupBy("bucket").agg(count(lit(1)).as("bucket_n"))
        .filter(col("bucket_n") > cap).select("bucket")
        .localCheckpoint(eager = false)
      if (over.isEmpty) {
        done += finalized(cur, nbits)
        oversized = false
      } else {
        val w = math.min(step, maxBits - nbits)
        done += finalized(cur.join(over, Seq("bucket"), "left_anti"), nbits)
        cur = cur.join(over, Seq("bucket"), "left_semi")
          .withColumn("bucket",
            shiftleft(col("bucket"), w) + signBits(nbits + 1, nbits + w))
          .localCheckpoint(eager = false)
        nbits += w
      }
    }
    if (oversized) {
      if (truncate) {
        // maxBits exhausted with dense buckets left (sign-identical
        // vectors): truncate to the cap by hash rank — the lossy step
        val rk = Window.partitionBy("bucket").orderBy(xxhash64(col(idCol)))
        done += finalized(
          cur.withColumn("rk", row_number().over(rk))
            .filter(col("rk") <= cap).drop("rk"), nbits)
      } else done += finalized(cur, nbits) // keep whole: nothing escapes
    }
    done.reduce(_ unionAll _)
  }

  /** Per-bucket population cap by xxhash64 rank — the
    * [[cappedFromBucketed]] truncation policy as a standalone pass, for
    * frames whose bucket KEY must stay fixed (the Hamming-1 boundary
    * join matches flipped keys against the fixed key, so the
    * sub-splitting cap's refined keys cannot be used there). Shape: ONE
    * rank window keyed on the bucket — the downstream boundary join
    * keys on the same column, so the exchange this window introduces is
    * the join's own exchange, not an extra pass (an agg + anti/semi
    * formulation was measured at ~2× the whole query's wall from its
    * extra scan/join stages; the window costs one in-partition sort).
    * A skew-degenerate bucket sorts in one task, bounded by the same
    * population the cap exists to bound. */
  def capBucketPopulation(df: DataFrame, idCol: String,
      cap: Int = EmbBucketCap): DataFrame = {
    val rk = Window.partitionBy("bucket").orderBy(xxhash64(col(idCol)))
    df.withColumn("__rk", row_number().over(rk))
      .filter(col("__rk") <= cap).drop("__rk")
  }

  /** Near-dup pairs at cosine ≥ `threshold` via sign-LSH buckets:
    * same-direction pairs on the skew-capped bucket, boundary-split
    * pairs (sign keys differing in ONE bit) via the margin-gated
    * Hamming-1 flip join ([[multiProbeBuckets]]) — the two sources are
    * disjoint by construction (a flipped match requires differing fixed
    * keys; the capped key refines the fixed key). The boundary join's
    * fixed side is [[capBucketPopulation]]-capped: a dense direction
    * with one sub-margin component fans its whole population into the
    * adjacent fixed bucket, so an uncapped adjacent burst would pay
    * P·P′ pairs — the cap bounds it to P·cap, the same lossy skew trade
    * (and the same hash-rank policy) the same-direction path already
    * documents. */
  def embeddingNearDupPairs(vectors: DataFrame,
      threshold: Double): DataFrame = {
    // ONE normalize+sign-bucket scan; both join keys derive from it
    val fixed = normalizedWithBucket(vectors)
      .select(col("vec_id"), col("unit"), col("bucket"))
      .localCheckpoint()
    val capped = cappedFromBucketed(fixed, "vec_id")
      .select(col("vec_id"), col("unit"), col("bucket"))
      .localCheckpoint()
    def pairs(a: DataFrame, b: DataFrame) =
      a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
        .withColumn("cos",
          graft.functions.Vec.vec_dot(col("u_a"), col("u_b")))
        .filter(col("cos") >= threshold)
        .select(col("id_a"), col("id_b"), round(col("cos"), 3).as("cos"))
    def sideA(df: DataFrame) = df.select(col("vec_id").as("id_a"),
      col("bucket"), col("unit").as("u_a"))
    def sideB(df: DataFrame) = df.select(col("vec_id").as("id_b"),
      col("bucket"), col("unit").as("u_b"))
    pairs(sideA(capped), sideB(capped))
      .unionAll(pairs(
        sideA(multiProbeBuckets(fixed, threshold, includeSelf = false)),
        sideB(capBucketPopulation(fixed, "vec_id"))))
  }

  /** Quantified recall of the sign-bucket + Hamming-1 multi-probe pair
    * kernel by SIGN-SPLIT DISTANCE — the [[lshRecallReport]] treatment
    * applied to the embedding family (and therefore to the streaming
    * vector gate, which runs these same pair joins): plant `perClass`
    * true near-dup pairs per split distance h = 0..`maxSplit`, where a
    * split-h twin flips the sign of EXACTLY h sub-margin components of
    * its source inside the 16-bit key, and report planted vs detected
    * per h.
    *
    * Construction is exact, not sampled: non-designated components are
    * drawn away from zero, the h designated components are set to
    * a = δ·R/√(1−hδ²) (R = norm of the non-designated part) so the
    * UNIT vector's designated magnitudes are exactly δ = √((1−c)/(2h))
    * with c = 0.995 > threshold — every planted pair is a true
    * near-dup comfortably above the gate, its designated components
    * sit inside the flip margin √(2(1−t)), and the pair's sign keys
    * differ in exactly h bits. Expected outcome, which the spec PINS
    * as the quantitative residual-miss contract: h ∈ {0, 1} detected
    * 100% (same bucket / single-flip probe), h ≥ 2 detected 0% — the
    * standard single-flip multi-probe trade, now a number instead of a
    * caveat. */
  def vecGateRecallReport(spark: SparkSession, dim: Int = 64,
      perClass: Int = 25, threshold: Double = 0.99, maxSplit: Int = 3,
      seed: Long = 11L): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val targetCos = 1.0 - (1.0 - threshold) / 2 // 0.995 at t = 0.99
    val planted = for {
      h <- 0 to maxSplit
      i <- 0 until perClass
    } yield {
      val raw = Array.fill(dim)(
        (0.3 + rnd.nextDouble()) * (if (rnd.nextBoolean()) 1.0 else -1.0))
      if (h > 0) {
        val delta = math.sqrt((1.0 - targetCos) / (2.0 * h))
        val r = math.sqrt(raw.drop(h).map(x => x * x).sum)
        val a = delta * r / math.sqrt(1.0 - h * delta * delta)
        (0 until h).foreach(j => raw(j) = a) // sign +, flips to −
      }
      val twin = raw.clone()
      (0 until h).foreach(j => twin(j) = -twin(j))
      val srcId = h * 100000L + i
      (srcId, srcId + 50000L, h,
        raw.map(_.toFloat).toSeq, twin.map(_.toFloat).toSeq)
    }
    val corpus = planted
      .flatMap(p => Seq((p._1, p._4), (p._2, p._5)))
      .toDF("vec_id", "embedding")
    val found = embeddingNearDupPairs(corpus, threshold)
      .select(col("id_a"), col("id_b"), lit(1L).as("hit"))
    planted.map(p => (p._1, p._2, p._3))
      .toDF("id_a", "id_b", "split_bits")
      .join(found, Seq("id_a", "id_b"), "left")
      .groupBy(col("split_bits"))
      .agg(count(lit(1)).as("planted"),
        sum(coalesce(col("hit"), lit(0L))).as("detected"))
      .orderBy(col("split_bits"))
  }

  /** Near-dup pairs: in-bucket pairwise cosine >= threshold, plus the
    * Hamming-1 boundary join — on an adversarial corpus a true pair
    * split by one sign boundary is now found, so the engine matches the
    * ALL-PAIRS oracle under strictly weaker corpus assumptions.
    * Injected copies are scaled by 1.001 (identical direction ⇒ cosine
    * 1 ⇒ always same bucket). */
  val embeddingNearDup: GraftQuery = GraftQuery(
    "dedup_embedding_cosine",
    (s, dir) => {
      val base = emb(s, dir).select(col("vec_id"), col("embedding"))
      val dups = emb(s, dir).filter(col("vec_id") < 10)
        .select((col("vec_id") + 1000000).as("vec_id"),
          expr("transform(embedding, x -> x * CAST(1.001 AS FLOAT))")
            .as("embedding"))
      embeddingNearDupPairs(base.unionAll(dups), 0.99)
    },
    // Oracle-able despite the LSH bucketing: identically-directed vectors
    // (the injected ×1.001 copies) always share a sign bucket, and on this
    // corpus no cross pair comes near cos 0.99 (max non-dup cosine ≈ 0.5),
    // so the bucketed result equals the all-pairs result exactly.
    Some(
      """WITH all_v AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 1000000,
        |    list_transform(embedding, x -> x * CAST(1.001 AS FLOAT))
        |  FROM embeddings WHERE vec_id < 10)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.embedding, b.embedding), 3) AS cos
        |FROM all_v a, all_v b
        |WHERE a.vec_id < b.vec_id
        |  AND list_cosine_similarity(a.embedding, b.embedding) >= 0.99"""
        .stripMargin))

  val all: Seq[GraftQuery] =
    Seq(exact, lineDedup, intraDocDedup, minhashLsh, lshRecall,
      incrementalDedup, simhashDedup, ngramJaccard, sharedSpans,
      exactSpans, spansRemoved, exactSpansIncremental,
      spansRemovedIncremental, spansIncremental, embeddingNearDup,
      bandDupesQuery)
}
