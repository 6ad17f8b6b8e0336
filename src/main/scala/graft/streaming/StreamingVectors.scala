package graft.streaming

import graft.operators.DedupOps
import graft.store.{GraftStore, IndexStore}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming vector ingest with near-identical dedup — the
  * [[StreamingCuration]] shape applied to embeddings: a readStream of
  * (vec_id, embedding) rows passes per-micro-batch gates and the
  * survivors land in the store atomically with their dedup-index rows.
  *
  * Gates per batch:
  *  1. unit-normalize, drop zero-norm vectors (nothing to compare);
  *  2. intra-batch dedup — pairwise cosine ≥ `threshold` over (a) the
  *     skew-capped sign bucket ([[DedupOps.normalizedWithCappedBucket]]:
  *     a one-direction spam burst pays cap-bounded fans, not B²/2) and
  *     (b) the margin-gated Hamming-1 flipped buckets
  *     ([[DedupOps.multiProbeBuckets]]: a pair split by one sign
  *     boundary still meets); every detected pair loses its LARGER
  *     vec_id — the streaming-curation greedy drop: one pass, no
  *     iterative closure in the hot path, conservative for dedup;
  *  3. cross-batch dedup — probe the at-rest `vec` index
  *     ([[IndexStore.search]], which multi-probes the same Hamming-1
  *     neighborhood): the batch's sign buckets (plus flips)
  *     manifest-prune untouched leaves and push the distinct bucket ids
  *     as a scan filter, so history is never rescanned whole.
  *
  * Exactly-once under foreachBatch replay, by the same layered
  * argument as every gate in the family: the epoch cursor
  * ([[BatchIdKey]], committed atomically WITH the data) skips a
  * replayed committed epoch in O(1) before any scan; beneath it,
  * survivors and their index rows commit in ONE snapshot swap, and a
  * replayed batch self-matches its first run's index rows at cosine 1
  * (identical vectors share every sign bit, so the identity bucket
  * always probes), so an id-less or all-dropped replay still commits
  * nothing.
  *
  * Scale shape per batch: one scan of the BATCH (unit + bucket), pair
  * joins bounded by the sphere-packing density the gate itself
  * maintains (a direction region only accumulates index vectors that
  * are pairwise BELOW the threshold — near-dups of them are dropped
  * before they are ever indexed) and by the bucket cap, and one commit.
  * Residual recall caveat, QUANTIFIED
  * ([[graft.operators.DedupOps.vecGateRecallReport]], pinned in
  * StreamingVectorsSpec "residual-miss contract"): on planted true
  * near-dup pairs (cos 0.995) split by exactly h sign bits, the pair
  * kernel detects 25/25 at h = 0 and h = 1 and 0/25 at h = 2 and
  * h = 3 — a pair whose keys differ in ≥ 2 bits (two simultaneously
  * near-zero dimensions) is missed, the standard single-flip
  * multi-probe LSH trade, now a measured number instead of a caveat.
  */
object StreamingVectors {

  /** Manifest table holding the accepted (vec_id, unit) vectors. */
  val AcceptedTable = "accepted_vectors"

  /** Epoch-cursor meta key ([[PerceptualGate.batchIdKey]] pattern, key
    * `gate_batch_id_vec`) — round 18 closes the one gate that lacked
    * it: a replayed vector epoch used to re-pay the full normalize +
    * pair joins + at-rest probe to rediscover that nothing commits
    * (correct via the cosine-1 self-match, but not O(1)). Same
    * caveats as every cursor: one stream per (store, kind), one
    * checkpoint lineage, and the cursor only advances on a DATA
    * commit — an all-dropped epoch replays through the self-match
    * path. */
  val BatchIdKey: String = PerceptualGate.batchIdKey("vec")

  /** Per-batch audit counters for the vector gate — the
    * [[PerceptualGate.GateStats]] shape transposed, opt-in
    * (`collectStats` / `onStats`; the counts cost one distinct count
    * per stage, so the hot path leaves them off). `invalidDropped`
    * counts rows whose embedding produced no unit vector (null, empty
    * or zero-norm — before round 18 they vanished invisibly at the
    * normalize filter); a WRONG-DIMENSION batch against a non-empty
    * index is not a counter, it throws loudly (the requireDim ingest
    * guard). The intra stage reports its two pair joins separately:
    * same-direction (capped sign bucket) and boundary (margin-gated
    * Hamming-1 flips). */
  final case class VecGateStats(
      batchVecs: Long,
      invalidDropped: Long,
      sameDirDropped: Long,
      boundaryDropped: Long,
      crossDropped: Long,
      survivors: Long)

  /** Near-identical threshold: cosine at or above this is a duplicate.
    * 0.99 matches the batch `dedup_embedding_cosine` operator. */
  val DupCos = 0.99

  /** Scope-cardinality bound for the scoped cross-batch probe: the
    * at-rest pass runs one filtered search per distinct scope tuple in
    * the batch (so the label predicate PUSHES DOWN to the index scan,
    * the filtered-ANN pre-filter semantics), which is only sane for
    * low-cardinality scopes — language, label, source. A batch with
    * more distinct scope tuples than this fails loudly rather than
    * degrade into per-row index scans (scope on a near-unique column
    * is a design error, not a workload). */
  val MaxScopes = 64

  /** One micro-batch: gate, then commit survivors + their `vec` index
    * rows in one atomic snapshot.
    *
    * Attribute columns (anything besides vec_id/embedding) ride through
    * the whole gate into BOTH committed tables — the accepted vectors
    * and the `vec` index rows — exactly like the batch build path
    * (IndexStore `withAttrs`), so `index search --filter` works over a
    * streamed index too. `scopeCols` (must be attribute columns)
    * additionally SCOPE the dedup: near-identical vectors in different
    * scopes are NOT duplicates (per-language corpora, per-split eval
    * protection). Scoping is a join-key refinement on the intra-batch
    * pair joins and a pushed-down label filter on the per-scope
    * cross-batch probes — pre-filter semantics everywhere, so a
    * cross-scope twin can never shadow a same-scope one. A NULL scope
    * value is a scope of its own, not a silent opt-out: pair keys and
    * probe predicates are null-safe throughout. */
  def processBatch(
      store: GraftStore,
      batch: DataFrame,
      threshold: Double = DupCos,
      scopeCols: Seq[String] = Nil,
      collectStats: Boolean = false,
      batchId: Option[Long] = None): Option[VecGateStats] = {
    val spark = batch.sparkSession
    val committedEpoch = store.currentMeta()
      .get(store.metaKey(BatchIdKey)).map(_.toLong)
    if (batchId.exists(id => committedEpoch.exists(_ >= id)))
      return None // epoch already committed — skip before any scan
    val attrCols = batch.columns
      .filterNot(c => c == "vec_id" || c == "embedding").toSeq
    require(scopeCols.forall(attrCols.contains),
      s"scope columns ${scopeCols.mkString(",")} must be attribute " +
        s"columns of the batch (has: ${attrCols.mkString(",")})")
    val rows = DedupOps.normalizedWithBucket(batch)
      .drop("embedding")
      .localCheckpoint()
    // intra-batch, two pair joins, both O(batch)-keyed:
    //  (a) same-direction pairs on the CAPPED bucket — identically-
    //      directed vectors share every sign bit, so the cap's
    //      sub-splitting never separates a true pair, and a spam burst
    //      concentrated in one direction generates at most cap-bounded
    //      pair fans instead of B²/2 (the batch operator family's
    //      skew discipline). truncate = false: a gate must never let a
    //      row silently ESCAPE the pair join and commit a duplicate —
    //      a bucket still over the cap at maxBits (48-sign-identical
    //      rows, i.e. the dup burst itself) pairs whole, quadratic but
    //      micro-batch-bounded and collapsed by the greedy drop;
    //  (b) boundary pairs on the FLIPPED-only Hamming-1 buckets
    //      (margin-gated, DedupOps.multiProbeBuckets) joined against
    //      the fixed key — catches a near-identical pair split by one
    //      sign boundary inside a single micro-batch. (b) runs AFTER
    //      (a)'s greedy drop, over the same-direction SURVIVORS only:
    //      a one-direction burst with a sub-margin component collapses
    //      in (a) to its pairwise-below-threshold core before it can
    //      fan into the adjacent bucket, so two ADJACENT simultaneously
    //      bursting buckets pay survivor·survivor pairs (sphere-packing
    //      bounded), not P·P′ — the batch REPORT path bounds the same
    //      corner with a lossy hash-rank cap, but a gate must fail
    //      closed, and sequencing bounds it with ZERO loss: every row
    //      (b) no longer compares against was already dropped as a
    //      duplicate. Dropping a boundary partner of a (a)-loser is the
    //      standard greedy-star semantics — the kept representative of
    //      the loser's direction either meets the partner itself or the
    //      partner is no duplicate of anything kept. Flipped keys are
    //      ≠ the row's own bucket, so (b) regenerates nothing from (a).
    // Both keys derive from the ONE normalized+bucketed scan (`rows`).
    val capped = DedupOps.cappedFromBucketed(rows, "vec_id",
        truncate = false)
      .localCheckpoint()
    // scoped dedup: scope columns join as additional pair keys, so a
    // cross-scope near-identical pair never pairs at all (pre-filter,
    // not post-drop). The scope tuple joins as ONE struct key, not as
    // bare columns: a NULL scope value is a legitimate scope of its own
    // (struct field comparison is null-safe), whereas bare-column join
    // keys silently drop null rows from the pair joins — two identical
    // vectors with a null scope would BOTH commit as survivors with no
    // error, a dedup gate leaking exactly the rows it cannot see.
    val pairKeys =
      if (scopeCols.isEmpty) Seq("bucket") else Seq("bucket", "scope_key")
    def side(df: DataFrame, id: String, u: String) =
      df.select((Seq(col("vec_id").as(id), col("bucket"),
        col("unit").as(u)) ++
        (if (scopeCols.isEmpty) Nil
         else Seq(struct(scopeCols.map(col): _*).as("scope_key")))): _*)
    def pairs(a: DataFrame, b: DataFrame) =
      a.join(b, pairKeys)
        .filter(col("id_a") < col("id_b"))
        .filter(graft.functions.Vec.vec_dot(col("u_a"), col("u_b"))
          >= threshold)
        .select(col("id_b").as("vec_id"))
    val sameDir = pairs(
      side(capped, "id_a", "u_a"), side(capped, "id_b", "u_b")).distinct()
    val sameDirSurvivors = rows
      .join(sameDir, Seq("vec_id"), "left_anti")
      .localCheckpoint()
    val boundary = pairs(
      side(DedupOps.multiProbeBuckets(sameDirSurvivors, threshold,
        includeSelf = false), "id_a", "u_a"),
      side(sameDirSurvivors, "id_b", "u_b")).distinct()
    val intra = sameDirSurvivors
      .join(boundary, Seq("vec_id"), "left_anti")
      .localCheckpoint()
    // cross-batch: any survivor with an at-rest neighbor at/above
    // threshold IN ITS SCOPE drops (first batch of a fresh store has no
    // index yet). Scoped: one probe per distinct scope tuple in the
    // batch, its scope equality pushed into the index scan as the
    // filtered-ANN predicate (composes with the sign-bucket prune).
    val probeOf: DataFrame => DataFrame = p =>
      p.select(col("vec_id"), col("unit").as("embedding"))
    val crossLosers =
      if (store.leavesOf(IndexStore.tableOf("vec")).isEmpty)
        intra.select(col("vec_id")).limit(0)
      else if (scopeCols.isEmpty)
        IndexStore.search(store, spark, "vec", probeOf(intra), threshold)
          .select(col("new_id").as("vec_id")).distinct()
      else {
        val scopes = intra.select(scopeCols.map(col): _*).distinct()
          .limit(MaxScopes + 1).collect()
        require(scopes.length <= MaxScopes,
          s"more than $MaxScopes distinct scope tuples in one batch — " +
            s"scope columns (${scopeCols.mkString(",")}) must be " +
            "low-cardinality (language/label/source)")
        if (scopes.isEmpty) intra.select(col("vec_id")).limit(0)
        else scopes.map { s =>
          // null-safe equality: a null scope value must select its own
          // scope's rows (plain === yields NULL and the probe filter
          // would match nothing — the null-scope batch would skip the
          // cross-batch gate entirely); <=> pushes down to the index
          // scan like === (EqualNullSafe / IsNull are parquet filters)
          val eq = scopeCols.zipWithIndex
            .map { case (c, i) => col(c) <=> lit(s.get(i)) }
            .reduce(_ && _)
          IndexStore.search(store, spark, "vec",
            probeOf(intra.filter(eq)), threshold, Some(eq))
            .select(col("new_id").as("vec_id"))
        }.reduce(_ unionAll _).distinct()
      }
    val survivors = intra.join(crossLosers, Seq("vec_id"), "left_anti")
      .localCheckpoint()
    // attribute-set stability across streamed commits, the append()
    // guard applied to the staged path: a batch missing a
    // previously-carried attribute would union to null at rest and
    // silently un-match filtered searches
    if (store.leavesOf(IndexStore.tableOf("vec")).nonEmpty) {
      val stored = IndexStore.read(store, spark, "vec").columns.toSet
      require(survivors.columns.toSet == stored,
        s"streamed vec batch columns ${survivors.columns.sorted
          .mkString(",")} must match the stored index " +
          s"(${stored.toSeq.sorted.mkString(",")})")
    }
    val adds = store.stageKeyed(AcceptedTable,
      survivors.drop("bucket"),
      pmod(xxhash64(col("vec_id")), lit(IndexStore.Buckets.toLong)),
      Seq(col("vec_id"))) ++
      IndexStore.stageRows(store, "vec", survivors)
    if (adds.nonEmpty)
      store.commit(adds, meta = IndexStore.formatMeta("vec") ++
        // the cursor rides THE data commit — never ahead of (or behind)
        // the rows it makes idempotent (the shared gate recipe)
        batchId.map(id => BatchIdKey -> id.toString).toMap)
    if (!collectStats) None
    else {
      def ids(df: DataFrame): Long =
        df.select(col("vec_id")).distinct().count()
      val batchVecs = ids(batch)
      val valid = ids(rows)
      val nSameDir = ids(sameDirSurvivors)
      val nIntra = ids(intra)
      val nSurv = ids(survivors)
      Some(VecGateStats(
        batchVecs = batchVecs,
        invalidDropped = batchVecs - valid,
        sameDirDropped = valid - nSameDir,
        boundaryDropped = nSameDir - nIntra,
        crossDropped = nIntra - nSurv,
        survivors = nSurv))
    }
  }

  /** The full pipeline: a streaming (vec_id, embedding) frame driven
    * through [[processBatch]] per micro-batch. The `vec` index is the
    * only dedup state, committed atomically with the vectors it
    * indexes, so the pipeline resumes across restarts without
    * rescanning history. */
  def runToAccepted(
      stream: DataFrame,
      store: GraftStore,
      checkpointDir: String,
      threshold: Double = DupCos,
      scopeCols: Seq[String] = Nil,
      onStats: Option[VecGateStats => Unit] = None): StreamingQuery =
    stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        val stats = processBatch(store, batch, threshold, scopeCols,
          collectStats = onStats.nonEmpty, batchId = Some(epoch))
        onStats.foreach(f => stats.foreach(f))
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** The accepted set at rest. */
  def accepted(spark: SparkSession, store: GraftStore): DataFrame =
    store.read(spark, AcceptedTable)
}
