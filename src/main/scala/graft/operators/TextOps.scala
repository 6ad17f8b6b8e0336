package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (SURVEY §7.6):
  * quality stats, token counting, language ID, fingerprinting — all pure
  * column expressions (whole-stage codegen, no UDFs), so they stream
  * through a 100 TB scan at parquet-read speed.
  */
object TextOps {

  /** Small stopword sets per language for the n-gram/stopword language
    * heuristic. Deterministic and tiny by design. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "fr" -> Seq("le", "la", "de", "et", "un", "une", "est"),
    "es" -> Seq("el", "la", "de", "y", "un", "una", "es"),
    "de" -> Seq("der", "die", "das", "und", "ein", "ist"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有"))

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.t(s, dir, name)

  private def sqlList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString(", ")

  /** Whitespace tokens of the lowercased text. */
  def tokens(c: String): org.apache.spark.sql.Column =
    split(lower(col(c)), "\\s+")

  /** Per-document quality stats: char length, token count, stopword count,
    * punctuation count. The quality *score* is a weighted view over these;
    * the stats are the oracled contract. */
  val textStats: GraftQuery = GraftQuery(
    "text_stats",
    (s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        length(col("text")).as("char_len"),
        size(split(col("text"), "\\s+")).as("token_cnt"),
        expr(s"size(filter(split(lower(text), '\\\\s+'), " +
          s"x -> x IN (${sqlList(stopwords("en"))})))").as("stop_cnt"),
        size(expr("regexp_extract_all(text, '[.,;:!?]', 0)"))
          .as("punct_cnt")),
    Some(
      s"""SELECT doc_id, length(text) AS char_len,
         |  len(regexp_split_to_array(text, '\\s+')) AS token_cnt,
         |  len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
         |      x -> x IN (${sqlList(stopwords("en"))}))) AS stop_cnt,
         |  len(regexp_extract_all(text, '[.,;:!?]')) AS punct_cnt
         |FROM documents""".stripMargin))

  /** Quality score in [0,1] from the stats (length window, stopword ratio,
    * token-count window) — heuristic weights, deterministic output.
    *
    * The blend is computed ENTIRELY in integer basis points (0.4 on a
    * 0..10000 scale = weight 8 per length unit capped at 500, etc.), and
    * only the final integer is divided by 10000.0. Cross-engine exactness
    * then needs no IEEE reasoning at all: both engines produce the same
    * integer (truncating division on non-negative operands — Spark `div`,
    * DuckDB `//`), and one double division of identical operands is
    * bit-deterministic by the standard. The earlier floor(x·10⁴) float
    * rendering depended on the two engines never reassociating the double
    * expression tree — a latent flake this formulation removes. */
  /** The integer score over a `text` column, as a Spark SQL fragment —
    * shared with the curation operators
    * ([[CurationOps.curationTopK]]). NULL text scores 0: without the
    * guard, Spark's null-skipping `least(NULL, 500)` = 500 would hand a
    * null document 8000 bp and float it PAST the quality floor (the
    * driver corpus has no nulls; real corpora do — EdgeCaseSpec). */
  val qualityBpSparkSql: String =
    s"""IF(text IS NULL, 0L,
       |  least(cast(length(text) AS bigint), 500) * 8
       |  + least(4000, (cast(size(filter(split(lower(text), '\\\\s+'),
       |        x -> x IN (${sqlList(stopwords("en"))}))) AS bigint)
       |        * 20000)
       |      div greatest(cast(size(split(text, '\\\\s+')) AS bigint), 1))
       |  + IF(size(split(text, '\\\\s+')) BETWEEN 20 AND 1000, 2000, 0))"""
      .stripMargin

  /** The same integer score as a DuckDB SQL fragment (same null guard —
    * though DuckDB's standard `least` would propagate the NULL, the two
    * fragments must stay expression-for-expression equivalent). */
  val qualityBpDuckSql: String =
    s"""(CASE WHEN text IS NULL THEN 0 ELSE
       |   least(length(text), 500) * 8
       |   + least(4000, (CAST(len(list_filter(
       |        regexp_split_to_array(lower(text), '\\s+'),
       |        x -> x IN (${sqlList(stopwords("en"))}))) AS BIGINT)
       |        * 20000)
       |      // greatest(len(regexp_split_to_array(text, '\\s+')), 1))
       |   + CASE WHEN len(regexp_split_to_array(text, '\\s+'))
       |      BETWEEN 20 AND 1000 THEN 2000 ELSE 0 END END)""".stripMargin

  val qualityScore: GraftQuery = GraftQuery(
    "text_quality_score",
    (s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        (expr(qualityBpSparkSql) / lit(10000.0)).as("quality")),
    Some(
      s"""SELECT doc_id, $qualityBpDuckSql / 10000.0 AS quality
         |FROM documents""".stripMargin))

  /** BPE-ish token counting: word pieces + isolated non-word glyphs. */
  val tokenCount: GraftQuery = GraftQuery(
    "text_token_count",
    (s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        size(expr("regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9 ]', 0)"))
          .as("bpe_cnt")),
    Some(
      """SELECT doc_id,
        |  len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9 ]'))
        |    AS bpe_cnt
        |FROM documents""".stripMargin))

  /** Document fingerprint: md5 of whitespace-normalized lowercase text
    * (the exact-dedup key) + length guard. */
  val fingerprint: GraftQuery = GraftQuery(
    "text_fingerprint",
    (s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        md5(regexp_replace(lower(col("text")), "\\s+", " ")).as("fp"),
        length(col("text")).as("char_len")),
    Some(
      """SELECT doc_id,
        |  md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp,
        |  length(text) AS char_len
        |FROM documents""".stripMargin))

  /** Winnowing (MOSS) document fingerprints: polynomial rolling hash of
    * every 7-char gram of the alnum-normalized text, min hash selected
    * per 4-gram window, deduplicated ([[graft.functions.Vec
    * .winnowFingerprints]] — a codegen'd kernel, O(len) per doc, pure
    * scan stage). Any 10-char normalized substring match between two
    * docs is guaranteed to share a fingerprint — the partial-overlap
    * detector [[fingerprint]]'s whole-doc md5 cannot be. Emitted as
    * integer summaries (count / min / checksum), which pin every
    * selected fingerprint; the hash is portable integer arithmetic, so
    * the DuckDB oracle recomputes the identical scheme (list_reduce
    * fold) — exactly hash-checkable, unlike the xxhash64 dedup family.
    * Docs shorter than one gram after normalization drop out on both
    * sides. */
  val winnowFingerprint: GraftQuery = GraftQuery(
    "text_winnow_fingerprint",
    (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.Vec.winnow_fps(
            regexp_replace(lower(col("text")), "[^a-z0-9]", ""), 7, 4)
            .as("fps"))
        .filter(size(col("fps")) > 0)
        .select(col("doc_id"),
          size(col("fps")).cast("long").as("n_fp"),
          array_min(col("fps")).as("fp_min"),
          expr("aggregate(fps, CAST(0 AS BIGINT), (a, x) -> a + x)")
            .as("fp_sum")),
    Some(
      """WITH norm AS (
        |  SELECT doc_id,
        |    regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS s
        |  FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    list_transform(generate_series(1, len(s) - 6),
        |      i -> list_reduce(list_transform(generate_series(i, i + 6),
        |             j -> CAST(ascii(s[j]) AS BIGINT)),
        |           (a, x) -> (a * 131 + x) % 1000000007)) AS hs
        |  FROM norm),
        |fp AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      generate_series(1, greatest(len(hs) - 3, 1)),
        |      i -> list_min(hs[i:i+3]))) AS fps
        |  FROM h WHERE len(hs) >= 1)
        |SELECT doc_id,
        |  CAST(len(fps) AS BIGINT) AS n_fp,
        |  CAST(list_min(fps) AS BIGINT) AS fp_min,
        |  CAST(list_sum(fps) AS BIGINT) AS fp_sum
        |FROM fp""".stripMargin))

  /** Language ID by stopword-hit voting with a deterministic tiebreak
    * (hit count desc; ties broken by lexicographically-largest code via
    * struct ordering). Oracled: DuckDB's `list_max` over `{hits, code}`
    * structs implements the same field-by-field max as Spark's
    * `array_max(struct(hits, code))`. */
  val langId: GraftQuery = GraftQuery(
    "text_lang_id",
    (s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          split(lower(col("text")), "\\s+").as("toks"))
      val scored = stopwords.foldLeft(docs) { case (df, (code, ws)) =>
        df.withColumn(s"hits_$code",
          expr(s"size(filter(toks, x -> x IN (${sqlList(ws)})))"))
      }
      scored.select(col("doc_id"), col("lang"),
        expr(s"array_max(array(${stopwords.keys.toSeq.sorted
            .map(c => s"struct(hits_$c AS hits, '$c' AS code)")
            .mkString(", ")}))")
          .getField("code").as("predicted"))
    },
    Some {
      val structs = stopwords.keys.toSeq.sorted.map { c =>
        s"""{'hits': len(list_filter(
           |      regexp_split_to_array(lower(text), '\\s+'),
           |      x -> x IN (${sqlList(stopwords(c))}))), 'code': '$c'}"""
          .stripMargin
      }.mkString(",\n  ")
      s"""SELECT doc_id, lang, (list_max([
         |  $structs])).code AS predicted
         |FROM documents""".stripMargin
    })

  /** Appends a predicted `lang` column to a (doc_id, text, ...) frame
    * via the [[langId]] stopword vote — the reusable form for corpora
    * that do not carry a language column (`curate --target-mixture` on a
    * raw corpus). Same expression family as the oracled query: hit
    * counts per language off one token array, array_max struct tiebreak.
    * Scan-level, no shuffle. */
  def withPredictedLang(d: DataFrame): DataFrame = {
    val votes = stopwords.keys.toSeq.sorted.map { c =>
      s"struct(size(filter(__toks, x -> x IN (${sqlList(stopwords(c))})))" +
        s" AS hits, '$c' AS code)"
    }.mkString(", ")
    d.withColumn("__toks", split(lower(col("text")), "\\s+"))
      .withColumn("lang", expr(s"array_max(array($votes)).code"))
      .drop("__toks")
  }

  // ---------------------------------------------------------------------
  // Character-trigram LM quality score (the CCNet-style perplexity filter)
  // ---------------------------------------------------------------------

  /** The LM alphabet normalization: lowercase, every non-[a-z0-9] char to
    * space, runs collapsed, trimmed — ASCII-only output so the kernel's
    * byte loop and DuckDB's char functions agree position for position. */
  def lmNorm(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9]", " "), " +", " "))

  /** Train the 37³-entry char-trigram count model in ONE corpus scan:
    * explode trigram codes ([[graft.functions.Lm.lm_tri_codes]], a
    * codegen'd kernel) and count by code. The aggregation partial-combines
    * map-side onto at most 50,653 distinct keys, so the shuffle moves
    * O(50k) rows per partition no matter the corpus size, and only the
    * model parameters — never row data — reach the driver (the BPE
    * trainer's histogram argument, one level lower). */
  def trainCharLm(docs: DataFrame): Array[Long] = {
    val model = new Array[Long](graft.functions.Lm.TriSpace)
    docs
      .select(explode(
        graft.functions.Lm.lm_tri_codes(lmNorm(col("text")))).as("code"))
      .groupBy("code").count()
      .collect()
      .foreach(r => model(r.getInt(0)) = r.getLong(1))
    model
  }

  /** LM quality score: mean add-one-smoothed trigram probability of each
    * document under the corpus's own trigram model, in integer basis
    * points — the CCNet LM-filter shape (train on a reference corpus,
    * score candidates; here the corpus scores itself, which is the
    * "flag the outliers" variant). Natural text lands high, gibberish
    * and wrong-alphabet text low; a curation floor on `lm_bp` is the
    * perplexity gate. Scoring is a single codegen'd scan
    * ([[graft.functions.Lm.lm_score_bp]] with the trained model riding
    * in the expression); the DuckDB oracle recomputes the identical
    * integer arithmetic from the same corpus, so the gate is a full
    * hash match despite the model being "learned". Docs with fewer than
    * one trigram after normalization drop out on both sides. */
  val lmScore: GraftQuery = GraftQuery(
    "text_lm_score",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val model = trainCharLm(d)
      d.select(col("doc_id"),
          graft.functions.Lm.lm_score_bp(lmNorm(col("text")), model)
            .as("lm_bp"))
        .filter(col("lm_bp").isNotNull)
    },
    Some(
      """WITH norm AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text),
        |         '[^a-z0-9]', ' ', 'g'), ' +', ' ', 'g')) AS s
        |  FROM documents),
        |pos AS (
        |  SELECT doc_id, s[i:i+2] AS tri, s[i:i+1] AS big
        |  FROM norm, unnest(generate_series(1, len(s) - 2)) AS t(i)),
        |tri_cnt AS (SELECT tri, count(*) AS c FROM pos GROUP BY 1),
        |big_cnt AS (SELECT big, count(*) AS c FROM pos GROUP BY 1),
        |scored AS (
        |  SELECT p.doc_id,
        |    sum((tc.c + 1) * 10000 // (bc.c + 37)) AS total,
        |    count(*) AS n
        |  FROM pos p
        |  JOIN tri_cnt tc ON p.tri = tc.tri
        |  JOIN big_cnt bc ON p.big = bc.big
        |  GROUP BY 1)
        |SELECT doc_id, CAST(total // n AS BIGINT) AS lm_bp
        |FROM scored""".stripMargin))

  /** Intra-document repetition signals (the Gopher-style "repetitious
    * text" filters): for each doc, the share of word-2-grams that are
    * repeats and the share claimed by the single most frequent 2-gram.
    * Shape: per-doc gram explode -> (doc, gram) count -> per-doc
    * aggregate; both aggregations partial-combine map-side, and the
    * shuffled rows are (doc_id, gram-count), never raw text — a 100 TB
    * corpus shuffles O(distinct grams per doc), not O(tokens).
    * Fractions in integer basis points (truncating div) for exact
    * cross-engine parity — same argument as [[qualityBpSparkSql]]. */
  val repetition: GraftQuery = GraftQuery(
    "text_repetition",
    (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), tokens("text").as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(col("doc_id"), explode(expr(
          """transform(sequence(1, size(toks) - 1),
            |  i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))
            |""".stripMargin)).as("gram"))
        .groupBy(col("doc_id"), col("gram"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("total"), max(col("cnt")).as("top_cnt"),
          sum(when(col("cnt") >= 2, col("cnt")).otherwise(0L)).as("dup_cnt"))
        .select(col("doc_id"),
          expr("top_cnt * 10000 div total").as("top2_bp"),
          expr("dup_cnt * 10000 div total").as("dup2_bp")),
    Some(
      """WITH grams AS (
        |  SELECT doc_id, unnest(list_transform(
        |    generate_series(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i + 1])) AS gram
        |  FROM (SELECT doc_id,
        |          regexp_split_to_array(lower(text), '\s+') AS toks
        |        FROM documents)
        |  WHERE len(toks) >= 2),
        |counts AS (
        |  SELECT doc_id, gram, count(*) AS cnt FROM grams GROUP BY 1, 2),
        |per_doc AS (
        |  SELECT doc_id, sum(cnt) AS total, max(cnt) AS top_cnt,
        |    sum(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS dup_cnt
        |  FROM counts GROUP BY 1)
        |SELECT doc_id,
        |  CAST(top_cnt * 10000 // total AS BIGINT) AS top2_bp,
        |  CAST(dup_cnt * 10000 // total AS BIGINT) AS dup2_bp
        |FROM per_doc""".stripMargin))

  // ---------------------------------------------------------------------
  // BPE merge learning (tokenizer training)
  // ---------------------------------------------------------------------

  /** Greedy left-to-right application of ONE merge to a symbol array, as
    * a pure SQL left fold (`aggregate`): 'aaa' under merge (a,a) becomes
    * [aa, a], exactly like the sequential trainer. `l`/`r` arrive via
    * columns so the fragment stays a single reusable expression. */
  private def mergeFoldExpr(symsCol: String, lCol: String,
      rCol: String): String =
    s"""aggregate($symsCol, cast(array() AS ARRAY<STRING>),
       |  (acc, x) -> IF(size(acc) > 0
       |        AND element_at(acc, -1) = $lCol AND x = $rCol,
       |    concat(slice(acc, 1, size(acc) - 1),
       |      array(concat($lCol, $rCol))),
       |    concat(acc, array(x))))""".stripMargin

  /** Byte-pair-encoding merge learning over the corpus (the standard
    * tokenizer-training loop):
    *
    *  1. ONE corpus scan aggregates to the distinct-word histogram
    *     (word, cnt) — everything after runs on the vocabulary, which is
    *     orders of magnitude smaller than the corpus (this is how real
    *     BPE trainers scale to 100 TB: corpus → word histogram once,
    *     then iterate on the histogram);
    *  2. if the histogram fits in the driver (`localVocabMax`, measured
    *     by a cheap count of the checkpointed histogram), the merge loop
    *     runs locally — the SentencePiece/HF-tokenizers strategy, and
    *     the only sane one when 100 TB of text collapses to a
    *     few-million-row histogram;
    *  3. otherwise each round stays distributed: count adjacent symbol
    *     pairs weighted by word count (one keyed agg), pick the
    *     (freq desc, pair asc) winner — the single learned parameter per
    *     round, the only row that ever reaches the driver — and rewrite
    *     the symbol arrays by the greedy left fold above (scan-stage, no
    *     shuffle), truncating lineage per round like the connected-
    *     components loop.
    *
    * Both paths compute the identical merge table (TrainingOpsSpec pins
    * them against each other and against a sequential reference).
    * Returns (round, left, right, freq) in learned order. Hash-oracled
    * since round 9: the K-round loop IS expressible in DuckDB by
    * unrolling it into K materialized CTE pairs ([[bpeChainSql]]). */
  def learnBpeMerges(d: DataFrame, rounds: Int,
      localVocabMax: Long = 100000L): Seq[(Int, String, String, Long)] = {
    val vocab0 = d
      .select(explode(tokens("text")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .select(split(col("word"), "").as("syms"), col("cnt"))
      .localCheckpoint()
    if (vocab0.count() <= localVocabMax) {
      val hist = vocab0.collect().map(r =>
        (r.getSeq[String](0).toVector, r.getAs[Long]("cnt")))
      learnMergesLocal(hist, rounds)
    } else learnMergesDistributed(vocab0, rounds)
  }

  /** The merge loop on a driver-resident histogram. */
  private[graft] def learnMergesLocal(
      hist: Seq[(Vector[String], Long)],
      rounds: Int): Seq[(Int, String, String, Long)] = {
    var vocab = hist
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var exhausted = false
    for (round <- 1 to rounds if !exhausted) {
      val freqs = collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, cnt) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          freqs(k) = freqs.getOrElse(k, 0L) + cnt
          i += 1
        }
      }
      if (freqs.isEmpty) exhausted = true
      else {
        // tie-break by UTF-8 byte order — what Spark's string orderBy
        // uses in the distributed path; JVM String ordering (UTF-16
        // code units) disagrees on supplementary-plane symbols
        val ((l, r), freq) = freqs.minBy { case ((l, r), f) =>
          (-f, l, r)
        }(Ordering.Tuple3(Ordering.Long, utf8Ordering, utf8Ordering))
        merges += ((round, l, r, freq))
        vocab = vocab.map { case (syms, cnt) => (applyMerge(syms, l, r), cnt) }
      }
    }
    merges.result()
  }

  /** The merge loop as DataFrame rounds — the histogram-doesn't-fit
    * path; exact same semantics as [[learnMergesLocal]]. */
  private[graft] def learnMergesDistributed(vocab0: DataFrame,
      rounds: Int): Seq[(Int, String, String, Long)] = {
    var vocab = vocab0
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var exhausted = false
    for (round <- 1 to rounds if !exhausted) {
      val top = vocab
        .filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(expr(
          """transform(sequence(1, size(syms) - 1),
            |  i -> struct(element_at(syms, i) AS l,
            |              element_at(syms, i + 1) AS r))""".stripMargin))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("freq"))
        .orderBy(col("freq").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, freq) = (top(0).getAs[String]("l"),
          top(0).getAs[String]("r"), top(0).getAs[Long]("freq"))
        merges += ((round, l, r, freq))
        vocab = vocab
          .withColumn("l", lit(l)).withColumn("r", lit(r))
          .select(expr(mergeFoldExpr("syms", "l", "r")).as("syms"),
            col("cnt"))
          .localCheckpoint(eager = false)
      }
    }
    merges.result()
  }

  val BpeRounds = 12

  /** The K-round BPE training loop unrolled as a DuckDB CTE chain — the
    * oracle for [[bpeMerges]] and [[tokenizeBpeQuery]]. Each round is two
    * MATERIALIZED CTEs (plain CTEs are inlined per reference, which
    * re-evaluates the whole prefix chain exponentially — measured 192 s
    * vs 0.4 s): m_k picks the (freq desc, l, r) argmax pair over the
    * round's vocabulary, v_k rewrites every word by the same greedy
    * left-to-right fold [[mergeFoldExpr]] uses (list-of-lists
    * accumulator). v_k LEFT JOINs its merge row so an exhausted round
    * (no pairs left) carries the vocabulary through unchanged, exactly
    * like the trainer's early exit. The final v_K doubles as the learned
    * tokenization of every distinct word, which is what the tokenize
    * oracle joins against. */
  private def bpeChainSql(rounds: Int): String = {
    val ctes = Seq.newBuilder[String]
    ctes += """v0 AS MATERIALIZED (
      |  SELECT word, regexp_split_to_array(word, '') AS syms, cnt FROM (
      |    SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
      |      SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS word
      |      FROM documents) WHERE word <> '' GROUP BY 1))""".stripMargin
    (1 to rounds).foreach { r =>
      ctes += s"""m$r AS MATERIALIZED (
        |  SELECT $r AS round, l AS left_sym, r AS right_sym,
        |    CAST(freq AS BIGINT) AS freq
        |  FROM (
        |    SELECT p.l AS l, p.r AS r, sum(cnt) AS freq FROM (
        |      SELECT unnest(list_transform(generate_series(1, len(syms)-1),
        |        i -> struct_pack(l := syms[i], r := syms[i+1]))) AS p, cnt
        |      FROM v${r - 1} WHERE len(syms) >= 2)
        |    GROUP BY 1, 2 ORDER BY freq DESC, l, r LIMIT 1))""".stripMargin
      ctes += s"""v$r AS MATERIALIZED (
        |  SELECT v.word, CASE WHEN len(v.syms) < 2 OR m.left_sym IS NULL
        |    THEN v.syms ELSE
        |    list_reduce(list_transform(v.syms, s -> [s]),
        |      (acc, x) -> CASE WHEN acc[-1] = m.left_sym AND x[1] = m.right_sym
        |        THEN acc[1:len(acc)-1] || [m.left_sym || m.right_sym]
        |        ELSE acc || x END) END AS syms, v.cnt
        |  FROM v${r - 1} v LEFT JOIN m$r m ON TRUE)""".stripMargin
    }
    ctes.result().mkString(",\n")
  }

  val bpeMerges: GraftQuery = GraftQuery(
    "text_bpe_merges",
    (s, dir) => {
      import s.implicits._
      learnBpeMerges(t(s, dir, "documents"), BpeRounds)
        .toDF("round", "left_sym", "right_sym", "freq")
    },
    Some(
      s"""WITH ${bpeChainSql(BpeRounds)}
         |SELECT round, left_sym, right_sym, freq FROM (
         |  ${(1 to BpeRounds).map(r => s"SELECT * FROM m$r")
              .mkString(" UNION ALL ")})""".stripMargin))

  /** UTF-8 byte order — Spark's UTF8String binary comparison, used so
    * the local trainer tie-breaks exactly like the distributed one. */
  private val utf8Ordering: Ordering[String] = (a: String, b: String) => {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    var cmp = 0
    while (cmp == 0 && i < n) {
      cmp = (x(i) & 0xff) - (y(i) & 0xff)
      i += 1
    }
    if (cmp != 0) cmp else x.length - y.length
  }

  /** Greedy left-to-right application of one merge — the Scala twin of
    * [[mergeFoldExpr]] (TrainingOpsSpec holds the two equal by pinning
    * the local and distributed trainers against each other). */
  private def applyMerge(syms: Vector[String], l: String,
      r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var last: String = null
    syms.foreach { x =>
      if (last == l && x == r) { out += l + r; last = null }
      else {
        if (last != null) out += last
        last = x
      }
    }
    if (last != null) out += last
    out.result()
  }

  /** One symbol per CODE POINT (a surrogate pair stays one symbol) —
    * matching Spark's `split(word, '')`, which training symbolizes
    * with; per-UTF-16-char symbols would never match merges learned
    * over supplementary-plane text (emoji). */
  private def codePointSyms(word: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** Apply learned BPE merges to one word (greedy left fold per merge,
    * in learned order) — the sequential tokenizer kernel. */
  private[graft] def bpeTokenize(word: String,
      merges: Seq[(String, String)]): Vector[String] =
    merges.foldLeft(codePointSyms(word)) {
      case (syms, (l, r)) => applyMerge(syms, l, r)
    }

  /** Corpus tokenization under a learned merge table: per-doc BPE token
    * count next to the whitespace word count (the compression the
    * tokenizer actually buys).
    *
    * Shape: merges are a tiny broadcast (learned parameters); the fold
    * is per-row imperative compute in a typed map over the scan — no
    * shuffle at all. A chain of SQL `aggregate()` folds could express
    * the same thing, but Spark's higher-order array functions are
    * interpreted (CodegenFallback), so the deliberate `mapPartitions`
    * here is the faster form, not a shortcut. Hash-oracled since round
    * 9 (the unrolled training chain's final vocabulary doubles as the
    * word→token-count table); TrainingOpsSpec pins counts against the
    * sequential kernel. */
  def tokenizeBpe(d: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = d.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges)
    d.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val m = bc.value
        it.map { case (id, text) =>
          // Locale.ROOT: Spark's lower() (training side) is
          // locale-insensitive; default-locale toLowerCase would
          // diverge on e.g. Turkish dotted/dotless i
          val words = Option(text).getOrElse("")
            .toLowerCase(java.util.Locale.ROOT)
            .split("\\s+").filter(_.nonEmpty)
          val bpeCnt = words.iterator.map(w => bpeTokenize(w, m).length).sum
          (id, words.length.toLong, bpeCnt.toLong)
        }
      }
      .toDF("doc_id", "word_cnt", "bpe_token_cnt")
  }

  val tokenizeBpeQuery: GraftQuery = GraftQuery(
    "text_tokenize_bpe",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val merges = learnBpeMerges(d, BpeRounds).map(m => (m._2, m._3))
      tokenizeBpe(d, merges)
    },
    Some(
      s"""WITH ${bpeChainSql(BpeRounds)},
         |words AS (
         |  SELECT doc_id, unnest(list_filter(
         |    regexp_split_to_array(lower(text), '\\s+'), w -> w <> '')) AS word
         |  FROM documents),
         |perdoc AS (
         |  SELECT w.doc_id, CAST(count(*) AS BIGINT) AS word_cnt,
         |    CAST(sum(len(v.syms)) AS BIGINT) AS bpe_token_cnt
         |  FROM words w JOIN v$BpeRounds v ON v.word = w.word
         |  GROUP BY 1)
         |SELECT d.doc_id AS doc_id, coalesce(p.word_cnt, 0) AS word_cnt,
         |  coalesce(p.bpe_token_cnt, 0) AS bpe_token_cnt
         |FROM documents d LEFT JOIN perdoc p ON p.doc_id = d.doc_id"""
        .stripMargin))

  val all: Seq[GraftQuery] =
    Seq(textStats, qualityScore, tokenCount, fingerprint,
      winnowFingerprint, langId, repetition, lmScore, bpeMerges,
      tokenizeBpeQuery)
}
