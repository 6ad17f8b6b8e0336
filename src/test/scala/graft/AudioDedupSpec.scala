package graft

import graft.operators.AudioDedupOps
import graft.operators.AudioDedupOps.AudioChunkFp
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Audio perceptual-fingerprint near-dup: planted-transform recall
  * (short AND long multi-chunk clips), non-dup separation,
  * codec/container plumbing, chunk-bound exactness, reject-reason
  * auditing, and exact banded-join/brute-force equivalence under the
  * majority-coverage verdict — the [[ImageDedupSpec]] discipline
  * applied to the audio modality. */
class AudioDedupSpec extends AnyFunSuite with BeforeAndAfterAll
    with TempDirCleanup {

  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }

  private lazy val fps: Seq[AudioChunkFp] =
    AudioDedupOps.audioAssets(AudioDedupOps.NumClips)
      .flatMap(AudioDedupOps.fingerprintChunks)
  private def chunksOf(id: Long): Seq[AudioChunkFp] =
    fps.filter(_.asset_id == id).sortBy(_.chunk_idx)
  /** Single-chunk accessor for the short-clip corpus. */
  private def fpOf(id: Long): Long = {
    val cs = chunksOf(id)
    assert(cs.size == 1, s"asset $id expected single-chunk: $cs")
    cs.head.afp
  }
  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("chunkBounds: single chunk at or below MaxSamples; above it " +
      "every chunk fits the overflow guard, consecutive chunks overlap " +
      "by EXACTLY one cell width, and the union covers the clip") {
    assert(AudioDedupOps.chunkBounds(AudioDedupOps.MaxSamples) ==
      Seq((0, AudioDedupOps.MaxSamples)))
    assert(AudioDedupOps.chunkBounds(100) == Seq((0, 100)))
    for (n <- Seq(AudioDedupOps.MaxSamples + 1,
        AudioDedupOps.MaxSamples + 40000, 1 << 20, 3000000,
        7 * AudioDedupOps.ChunkStride + 13)) {
      val b = AudioDedupOps.chunkBounds(n)
      assert(b.size >= 2, s"n=$n: expected multi-chunk, got $b")
      assert(b.head._1 == 0 && b.last._2 == n, s"n=$n: no cover: $b")
      b.foreach { case (lo, hi) =>
        assert(hi - lo <= AudioDedupOps.MaxSamples,
          s"n=$n: chunk [$lo,$hi) exceeds the overflow guard")
        assert(hi - lo >= AudioDedupOps.MinSamples, s"n=$n: sliver chunk")
      }
      b.sliding(2).foreach { case Seq((_, hi0), (lo1, _)) =>
        assert(hi0 - lo1 == AudioDedupOps.ChunkOverlap,
          s"n=$n: overlap ${hi0 - lo1} != ${AudioDedupOps.ChunkOverlap}")
      }
    }
  }

  test("long clips fingerprint as multiple chunks — never dropped: " +
      "every planted long asset yields n_chunks = 2 consistent rows") {
    for (i <- 0 until AudioDedupOps.LongSeeds;
         off <- Seq(4000L, 5000L, 6000L)) {
      val cs = chunksOf(i + off)
      assert(cs.size == 2 && cs.forall(_.n_chunks == 2),
        s"asset ${i + off}: $cs")
      assert(cs.map(_.chunk_idx) == Seq(0, 1), s"asset ${i + off}: $cs")
    }
  }

  test("planted near-dup transforms stay within the Hamming budget: " +
      "container re-encode and x2 gain exactly 0 (the exact-invariance " +
      "arguments), 90% decimation <= MaxHamming") {
    for (i <- 0 until AudioDedupOps.DupSeeds) {
      val base = fpOf(i.toLong)
      assert(ham(base, fpOf(i + 1000L)) == 0,
        s"seed $i: container re-encode changed the fingerprint " +
          "(identical samples must hash identically)")
      assert(ham(base, fpOf(i + 2000L)) == 0,
        s"seed $i: x2 gain changed the fingerprint (degree-1 " +
          "homogeneity argument violated)")
      val dResample = ham(base, fpOf(i + 3000L))
      assert(dResample <= AudioDedupOps.MaxHamming,
        s"seed $i: 90% decimation landed at Hamming $dResample > " +
          s"${AudioDedupOps.MaxHamming}")
    }
  }

  test("LONG planted transforms: identical chunk bounds (length-" +
      "preserving) make re-encode and x2 gain exact per chunk — " +
      "d = 0 on every chunk") {
    for (i <- 0 until AudioDedupOps.LongSeeds) {
      val base = chunksOf(i + 4000L)
      for (off <- Seq(5000L, 6000L)) {
        val v = chunksOf(i + off)
        assert(base.size == v.size, s"seed $i +$off: chunk count differs")
        base.zip(v).foreach { case (a, b) =>
          assert(ham(a.afp, b.afp) == 0,
            s"seed $i +$off chunk ${a.chunk_idx}: d != 0")
        }
      }
    }
  }

  test("distinct base clips are separated beyond the threshold — " +
      "including the long bases' chunks against everything") {
    val base = (0 until AudioDedupOps.NumClips).map(i => fpOf(i.toLong))
    val dists = for {
      a <- base.indices; b <- base.indices if a < b
    } yield ham(base(a), base(b))
    // measured min = 15 vs MaxHamming = 6: no false positive possible,
    // with margin against fixture drift (the +4 headroom rule)
    assert(dists.min > AudioDedupOps.MaxHamming + 4,
      s"closest non-dup base pair at Hamming ${dists.min} — too close " +
        s"to the ${AudioDedupOps.MaxHamming} threshold")
    // long-base chunks: no chunk of a long base sits within the
    // threshold of any short base or of the OTHER long base's chunks
    val longChunks = (0 until AudioDedupOps.LongSeeds)
      .flatMap(i => chunksOf(i + 4000L))
    val cross = for {
      c <- longChunks
      d <- base ++ longChunks.filterNot(_.asset_id == c.asset_id).map(_.afp)
    } yield ham(c.afp, d)
    assert(cross.min > AudioDedupOps.MaxHamming,
      s"a long-base chunk is within the threshold of an unrelated " +
        s"fingerprint (min ${cross.min})")
  }

  test("re-encoded variant is a genuinely different container (bytes " +
      "differ, decoded samples identical), not a byte copy") {
    val assets = AudioDedupOps.audioAssets(AudioDedupOps.NumClips)
    def payload(id: Long) = assets.find(_.asset_id == id).get.payload
    for (i <- 0 until AudioDedupOps.DupSeeds) {
      assert(!java.util.Arrays.equals(payload(i.toLong), payload(i + 1000L)),
        s"seed $i: re-encode produced identical bytes — the d=0 claim " +
          "would be vacuous")
      assert(AudioDedupOps.pcmSamples(payload(i.toLong)).toSeq ==
        AudioDedupOps.pcmSamples(payload(i + 1000L)).toSeq,
        s"seed $i: the javax.sound decode must see through the extra " +
          "container chunk to identical samples")
    }
    for (i <- 0 until AudioDedupOps.LongSeeds)
      assert(!java.util.Arrays.equals(payload(i + 4000L), payload(i + 5000L)),
        s"long seed $i: re-encode produced identical bytes")
  }

  test("decode handles the 8-bit unsigned WAV shape the multimodal " +
      "fixture ships (centered at zero)") {
    // a MultimodalOps audio asset is PCM_UNSIGNED 8-bit mono
    val a = graft.operators.MultimodalOps.assets(4)
      .find(_.kind == "audio").get
    val s = AudioDedupOps.pcmSamples(a.payload)
    assert(s.nonEmpty && s.forall(v => v >= -128 && v <= 127),
      s"8-bit decode must center samples at zero: " +
        s"min=${s.min} max=${s.max}")
  }

  test("banded pipeline matches the declared semantics exactly — " +
      "chunk-level band-OR candidates, Hamming verify, then the " +
      "majority-coverage verdict — and surfaces every planted pair, " +
      "short and long") {
    val pairs = AudioDedupOps.afpNearDupPairs(
      AudioDedupOps.audioFingerprints(spark, AudioDedupOps.NumClips))
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Int]("hamming"))).toSet
    // brute force under the SAME declared semantics (band-OR candidate
    // + Hamming verify per chunk pair, then 2·matched > n_chunks on
    // both sides with MAX(d)) — the pipeline must match it exactly
    // while no band bucket exceeds the cap (none does on this fixture)
    def bands(h: Long): Seq[Long] =
      (0 until AudioDedupOps.NumBands).map(k =>
        (h >>> ((AudioDedupOps.NumBands - 1 - k) * 16)) & 0xffffL)
    val chunkCand = for {
      a <- fps; b <- fps if a.asset_id < b.asset_id
      d = ham(a.afp, b.afp)
      if d <= AudioDedupOps.MaxHamming
      if bands(a.afp).zip(bands(b.afp)).exists(p => p._1 == p._2)
    } yield (a, b, d)
    val brute = chunkCand.groupBy(t => (t._1.asset_id, t._2.asset_id))
      .flatMap { case ((ia, ib), ms) =>
        val na = ms.head._1.n_chunks
        val nb = ms.head._2.n_chunks
        val ma = ms.map(_._1.chunk_idx).distinct.size
        val mb = ms.map(_._2.chunk_idx).distinct.size
        if (ma * 2 > na && mb * 2 > nb)
          Some((ia, ib, ms.map(_._3).max))
        else None
      }.toSet
    assert(pairs == brute,
      s"banded=${pairs.size} brute=${brute.size}: " +
        s"diff=${(pairs diff brute) ++ (brute diff pairs)}")
    // every planted variant pairs with its source
    for (i <- 0 until AudioDedupOps.DupSeeds; off <- Seq(1000L, 2000L, 3000L))
      assert(pairs.exists(p => p._1 == i.toLong && p._2 == i + off),
        s"planted pair ($i, ${i + off}) missed")
    // the long triples pair up at hamming 0 — the chunked path's
    // end-to-end recall, through the SAME distributed pipeline
    for (i <- 0 until AudioDedupOps.LongSeeds;
         pair <- Seq((4000L, 5000L), (4000L, 6000L), (5000L, 6000L)))
      assert(pairs.contains((i + pair._1, i + pair._2, 0)),
        s"planted LONG pair (${i + pair._1}, ${i + pair._2}) missed")
  }

  test("a one-chunk graze against a long clip is NOT a verdict: " +
      "majority coverage is required on both sides") {
    import spark.implicits._
    // a clip equal to ONE chunk of long base 4000: candidate chunk
    // pair at d=0 exists, but coverage of the long side is 1 of 2
    val long0 = AudioDedupOps.audioAssets(AudioDedupOps.NumClips)
      .find(_.asset_id == 4000L).get
    val samples = AudioDedupOps.pcmSamples(long0.payload)
    val (lo, hi) = AudioDedupOps.chunkBounds(samples.length).head
    val graze = AudioDedupOps.AudioAsset(9000L,
      AudioDedupOps.wav16(java.util.Arrays.copyOfRange(samples, lo, hi),
        44100))
    val pairs = AudioDedupOps.afpNearDupPairs(
      AudioDedupOps.audioHashRows(Seq(long0, graze).toDF()))
      .collect()
    assert(pairs.isEmpty,
      s"one matched chunk of two must not produce an asset verdict: " +
        s"${pairs.mkString(",")}")
    // sanity: the graze's single chunk really does match chunk 0
    val gfp = AudioDedupOps.fingerprintChunks(graze)
    assert(gfp.size == 1 &&
      ham(gfp.head.afp, chunksOf(4000L).head.afp) == 0,
      "fixture: the graze must equal long chunk 0 at d=0")
  }

  test("corrupt payloads drop deterministically from the fingerprint " +
      "path instead of killing the job — and audioRejects names the " +
      "reason per drop class") {
    import spark.implicits._
    val garbage = AudioDedupOps.AudioAsset(999L,
      Array.fill[Byte](64)(0x2a))
    val tooShort = AudioDedupOps.AudioAsset(998L, // valid WAV, < 32 samples
      AudioDedupOps.wav16(Array.fill(8)(100), 8000))
    val deep = AudioDedupOps.AudioAsset(997L, wav24(Array.fill(64)(5)))
    val batch = (AudioDedupOps.audioAssets(4).filter(_.asset_id < 4L)
      :+ garbage :+ tooShort :+ deep).toDF()
    val ids = AudioDedupOps.audioHashRows(batch)
      .select("asset_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(0L, 1L, 2L, 3L),
      s"undecodable clips must drop, valid ones fingerprint: $ids")
    val rejects = AudioDedupOps.audioRejects(batch).collect()
      .map(r => r.getAs[Long]("asset_id") -> r.getAs[String]("reason"))
      .toMap
    assert(rejects == Map(999L -> "corrupt", 998L -> "too_short",
      997L -> "unsupported_depth"),
      s"reject audit must name each drop class: $rejects")
  }

  /** A 24-bit PCM WAV — a real audio container at a depth the
    * fingerprint path does not support. */
  private def wav24(samples: Array[Int]): Array[Byte] = {
    val bytes = new Array[Byte](samples.length * 3)
    var j = 0
    while (j < samples.length) {
      bytes(3 * j) = (samples(j) & 0xff).toByte
      bytes(3 * j + 1) = ((samples(j) >> 8) & 0xff).toByte
      bytes(3 * j + 2) = ((samples(j) >> 16) & 0xff).toByte
      j += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      8000f, 24, 1, 3, 8000f, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("afp clusters: every planted group — short quadruples and long " +
      "triples — collapses to one component labeled by its base clip") {
    val comps = AudioDedupOps.audioClusters.fn(spark, "").collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("comp")).toMap
    for (i <- 0 until AudioDedupOps.DupSeeds;
         off <- Seq(0L, 1000L, 2000L, 3000L))
      assert(comps.get(i + off).contains(i.toLong),
        s"asset ${i + off}: ${comps.get(i + off)} != $i")
    val baseComps = (0 until AudioDedupOps.DupSeeds)
      .map(i => comps(i.toLong))
    assert(baseComps.distinct.size == baseComps.size,
      s"two planted quadruples merged: $baseComps")
    for (i <- 0 until AudioDedupOps.LongSeeds;
         off <- Seq(4000L, 5000L, 6000L))
      assert(comps.get(i + off).contains(i + 4000L),
        s"long asset ${i + off}: ${comps.get(i + off)} != ${i + 4000L}")
  }

  test("at-rest afp index: build/append/probe lifecycle finds a " +
      "re-encoded copy without re-decoding history, handles LONG " +
      "clips chunk-aware, replays self-match at Hamming 0, default " +
      "threshold is kind-aware") {
    import spark.implicits._
    import graft.store.{GraftStore, IndexStore}
    val store = new GraftStore(tempDir("graft-idx-afp"))
    val assets = AudioDedupOps.audioAssets(AudioDedupOps.NumClips)
    val base = assets.filter(a =>
      a.asset_id < AudioDedupOps.NumClips || a.asset_id == 4000L)
    IndexStore.build(store, "afp", base.toDF())
    // probe: a re-encoded copy of clip 3 (planted id 1003), the LONG
    // re-encode of long base 4000 (planted id 5000), and a fresh
    // unrelated clip — searched with the DEFAULT threshold (must
    // resolve to the audio MaxHamming, not 0.4)
    val copy3 = assets.find(_.asset_id == 1003L).get
    val longCopy = assets.find(_.asset_id == 5000L).get
    val freshClip = AudioDedupOps.audioAssets(AudioDedupOps.NumClips + 8)
      .find(_.asset_id == AudioDedupOps.NumClips + 5L).get
    val probe = Seq(
      AudioDedupOps.AudioAsset(9003L, copy3.payload),
      AudioDedupOps.AudioAsset(9500L, longCopy.payload),
      AudioDedupOps.AudioAsset(9100L, freshClip.payload)).toDF()
    val hits = IndexStore.search(store, spark, "afp", probe).collect()
      .map(r => (r.getAs[Long]("new_id"), r.getAs[Long]("existing_id"),
        r.getAs[Int]("hamming")))
    assert(hits.contains((9003L, 3L, 0)),
      s"re-encoded copy must hit its source at Hamming 0: " +
        s"${hits.mkString(",")}")
    assert(hits.contains((9500L, 4000L, 0)),
      s"LONG re-encoded copy must hit its source at Hamming 0 (both " +
        s"chunks matched): ${hits.mkString(",")}")
    assert(!hits.exists(_._1 == 9100L),
      s"fresh clip must hit nothing: ${hits.mkString(",")}")
    // append the fresh clip, re-probe: self-match at 0 (replay safety)
    IndexStore.append(store, "afp",
      Seq(AudioDedupOps.AudioAsset(9100L, freshClip.payload)).toDF())
    val hits2 = IndexStore.search(store, spark, "afp",
      Seq(AudioDedupOps.AudioAsset(9100L, freshClip.payload)).toDF())
      .collect()
      .map(r => (r.getAs[Long]("existing_id"), r.getAs[Int]("hamming")))
    assert(hits2.toSet == Set((9100L, 0)),
      s"appended clip must self-match only: ${hits2.mkString(",")}")
    // compact is afp-aware (global truncation re-application keeps rows)
    val cr = IndexStore.compact(store, spark, "afp")
    val (dropped, leaves) = (cr.dropped, cr.leaves)
    assert(dropped == 0L && leaves > 0L, s"($dropped, $leaves)")
    // post-compact: the long probe still verdicts (chunk rows intact)
    val hits3 = IndexStore.search(store, spark, "afp",
      Seq(AudioDedupOps.AudioAsset(9500L, longCopy.payload)).toDF())
      .collect().map(r => (r.getAs[Long]("existing_id"),
        r.getAs[Int]("hamming"))).toSet
    assert(hits3.contains((4000L, 0)),
      s"post-compact long probe lost its source: $hits3")
  }

  test("audio decontamination: benchmark re-encodes flag their corpus " +
      "source groups (short at d=0, the LONG one chunk-aware), fresh " +
      "benchmark clips flag nothing") {
    val hits = AudioDedupOps.audioDecontaminate.fn(spark, "").collect()
      .map(r => (r.getAs[Long]("asset_id"), r.getAs[Long]("eval_id"),
        r.getAs[Int]("hamming"))).toSet
    // each short re-encode flags its base clip at d=0 (it also flags
    // the planted variants of that base — genuine matches)
    for (i <- 0 until 3)
      assert(hits.contains((i.toLong, 9000L + i, 0)),
        s"benchmark re-encode $i must flag its source: $hits")
    // the long benchmark (re-encode of 4000) flags the whole long
    // triple with full two-chunk coverage
    for (src <- Seq(4000L, 5000L, 6000L))
      assert(hits.contains((src, 9200L, 0)),
        s"long benchmark must flag $src chunk-aware: $hits")
    assert(!hits.exists(h => h._2 == 9100L || h._2 == 9101L),
      s"fresh benchmark clips must flag nothing: $hits")
  }

  test("perceptualDupes at rest equals the batch pair operator for " +
      "afp — chunk verdicts from stored rows, history never re-decoded") {
    import spark.implicits._
    import graft.store.{GraftStore, IndexStore}
    val store = new GraftStore(tempDir("graft-afp-dupes"))
    val assets = AudioDedupOps.audioAssets(AudioDedupOps.NumClips)
    IndexStore.build(store, "afp", assets.toDF())
    val atRest = IndexStore.perceptualDupes(store, spark, "afp")
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Int]("hamming"))).toSet
    val batch = AudioDedupOps.afpNearDupPairs(
      AudioDedupOps.audioFingerprints(spark, AudioDedupOps.NumClips))
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Int]("hamming"))).toSet
    assert(atRest == batch,
      s"diff=${(atRest diff batch) ++ (batch diff atRest)}")
    assert(atRest.nonEmpty, "fixture must contain planted pairs")
  }

  test("fingerprint guards fail loudly: too-short and over-long input " +
      "(the guard is per fingerprint input — fingerprintChunks is the " +
      "long-clip path)") {
    intercept[IllegalArgumentException] {
      AudioDedupOps.afp64(Array.fill(16)(0))
    }
    intercept[IllegalArgumentException] {
      AudioDedupOps.afp64(new Array[Int](AudioDedupOps.MaxSamples + 1))
    }
  }
}
