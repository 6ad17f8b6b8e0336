package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Dense-vector kernels for the similarity/ANN operators (SURVEY §7.6).
  *
  * Spark's higher-order functions (`aggregate`/`zip_with`/`transform`)
  * evaluate one interpreted lambda per ELEMENT; for the 256-bit sketch
  * that is bits × dims ≈ 16k lambda invocations per row — seconds of pure
  * interpretation overhead at sf0.1. These expressions follow the same
  * pattern as [[U256]]: a static JVM kernel (tight `while` loop, no
  * boxing) invoked directly from whole-stage-generated code via
  * `nullSafeCodeGen`, so the surrounding plan stays one codegen span.
  *
  * Numerics: every kernel accumulates strictly left to right in DOUBLE
  * precision throughout (the HOF forms squared float elements in float
  * before widening — the kernels are slightly MORE precise, diffs ~1e-8).
  * The oracled queries built on these emit ranks (`ann_topk_brute`) or
  * 3-dp-rounded values (`dedup_embedding_cosine`), far above that noise.
  */
object Vec {

  /** Unit-normalize a double vector; null when the norm is zero (callers
    * filter nulls — the HOF form's `filter(norm > 0)`). */
  def unit(v: ArrayData): ArrayData = {
    val n = v.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val x = v.getDouble(i); s += x * x; i += 1 }
    if (s <= 0) return null
    val norm = math.sqrt(s)
    val out = new Array[Double](n)
    i = 0
    while (i < n) { out(i) = v.getDouble(i) / norm; i += 1 }
    new GenericArrayData(out)
  }

  /** Left-to-right dot product over the common prefix. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  /** Σ popcount(aᵢ xor bᵢ) over two long-array sketches. */
  def hamming(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var h = 0
    var i = 0
    while (i < n) {
      h += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i)); i += 1
    }
    h
  }

  /** Seeded Gaussian hyperplanes, cached per (seed, bits, dim) — one
    * generation per executor JVM, deterministic across executors/replays
    * (scala.util.Random's Gaussian stream is fixed for a given seed). */
  private val planeCache =
    new ConcurrentHashMap[(Long, Int, Int), Array[Array[Double]]]()

  def planes(seed: Long, bits: Int, dim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((seed, bits, dim), { key =>
      val rng = new scala.util.Random(key._1)
      Array.fill(key._2)(Array.fill(key._3)(rng.nextGaussian()))
    })

  /** bits-wide sign sketch of a unit vector: bit i of the packed words is
    * sign(⟨v, plane_i⟩). Hyperplane count = `bits` (multiple of 64). */
  def sketch(v: ArrayData, seed: Long, bits: Int): ArrayData = {
    val dim = v.numElements()
    val ps = planes(seed, bits, dim)
    val words = new Array[Long](bits >> 6)
    val x = new Array[Double](dim)
    var j = 0
    while (j < dim) { x(j) = v.getDouble(j); j += 1 }
    var i = 0
    while (i < bits) {
      val p = ps(i)
      var s = 0.0
      j = 0
      while (j < dim) { s += x(j) * p(j); j += 1 }
      if (s >= 0) words(i >> 6) |= 1L << (63 - (i & 63))
      i += 1
    }
    new GenericArrayData(words)
  }

  /** k MinHash slots over pre-hashed shingles: slot j is
    * min over h of xxh64(h, seed=j) — one pass over the hash array
    * instead of k interpreted `array_min(transform(...))` lambdas. */
  def minhash(hashes: ArrayData, k: Int): ArrayData = {
    val n = hashes.numElements()
    val out = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < k) {
        val v = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashLong(h, j)
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash over token hashes: per-bit majority vote (term
    * frequency counts — duplicates vote once per occurrence), packed with
    * bit b set when votes are positive. One per-row pass — replaces an
    * explode + 64-column groupBy aggregation (a full shuffle). */
  def simhash(hashes: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var packed = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) packed |= 1L << b
      b += 1
    }
    packed
  }

  /** Distinct xxhash64 values of the space-joined n-token shingles of a
    * token array — first-seen order, one tight pass. Hash-identical to
    * `xxhash64(concat_ws(' ', slice(toks, i+1, n)))` (XXH64 over the
    * UTF8 bytes, seed 42), so signatures/bands are unchanged vs the HOF
    * form; the shingle STRINGS are never materialized as a column. */
  def shingleHashes(toks: ArrayData, n: Int): ArrayData = {
    val cnt = toks.numElements()
    if (cnt < n) return new GenericArrayData(Array.empty[Long])
    val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val window = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    var i = 0
    while (i <= cnt - n) {
      var j = 0
      while (j < n) { window(j) = toks.getUTF8String(i + j); j += 1 }
      val s = org.apache.spark.unsafe.types.UTF8String
        .concatWs(space, window: _*)
      seen.add(org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUTF8String(s, 42L))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** Distinct xxhash64 values of the n-char grams of a string — the
    * character analogue of [[shingleHashes]]. Mirrors
    * `substring(text, i, n) for i in 1..greatest(len-n+1, 1)` (so a
    * shorter-than-n text yields one truncated gram), hash-identical to
    * `xxhash64(substring(...))`. */
  def charGramHashes(
      text: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData = {
    val len = text.numChars()
    val grams = math.max(len - n + 1, 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < grams) {
      val g = text.substringSQL(i + 1, n)
      seen.add(org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUTF8String(g, 42L))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** Winnowing fingerprints (the MOSS scheme): hash every k-char gram,
    * take the min hash of each w-gram window, deduplicate in first-
    * occurrence order. Guarantees any k+w-1-char match between two
    * documents shares a fingerprint, at ~1/w the gram density.
    *
    * Unlike the xxhash64 dedup family, the gram hash here is a
    * polynomial fold h = (h·131 + char) mod 1e9+7 — plain integer
    * arithmetic any engine reproduces exactly (the DuckDB oracle
    * recomputes it with list_reduce), so the operator is hash-checkable
    * cross-engine. Input must be pre-normalized to single-byte chars
    * (the query feeds regexp_replace(lower(text), "[^a-z0-9]", "")) —
    * bytes are the units hashed. */
  def winnowFingerprints(
      text: org.apache.spark.unsafe.types.UTF8String,
      k: Int, w: Int): ArrayData = {
    val n = text.numBytes()
    val grams = n - k + 1
    if (grams <= 0) return new GenericArrayData(Array.empty[Long])
    val M = 1000000007L
    val B = 131L
    val hs = new Array[Long](grams)
    var i = 0
    while (i < grams) {
      var h = 0L
      var j = 0
      while (j < k) { h = (h * B + (text.getByte(i + j) & 0xffL)) % M; j += 1 }
      hs(i) = h
      i += 1
    }
    val windows = math.max(grams - w + 1, 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i < windows) {
      var m = java.lang.Long.MAX_VALUE
      var j = i
      val end = math.min(i + w, grams)
      while (j < end) { if (hs(j) < m) m = hs(j); j += 1 }
      seen.add(m)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var c = 0
    while (it.hasNext) { out(c) = it.next(); c += 1 }
    new GenericArrayData(out)
  }

  // ---- Column API ----

  /** array<float|double> → unit-normalized array<double>; null for the
    * zero vector. */
  def vec_unit(c: Column): Column =
    columnOf(VecUnit(exprOf(c.cast("array<double>"))))

  /** Dot product of two array<double> columns. */
  def vec_dot(a: Column, b: Column): Column =
    columnOf(VecDot(exprOf(a), exprOf(b)))

  /** Packed sign sketch (array<bigint>) of a unit vector column. */
  def sign_sketch(c: Column, seed: Long, bits: Int): Column =
    columnOf(SignSketchExpr(exprOf(c), seed, bits))

  /** Hamming distance between two packed sketches. */
  def hamming64(a: Column, b: Column): Column =
    columnOf(Hamming64(exprOf(a), exprOf(b)))

  /** k-slot MinHash signature (array<bigint>) of an array<bigint> of
    * shingle hashes. */
  def minhash_sig(c: Column, k: Int): Column =
    columnOf(MinHashSig(exprOf(c), k))

  /** 64-bit SimHash (bigint) of an array<bigint> of token hashes. */
  def simhash64(c: Column): Column = columnOf(SimHash64(exprOf(c)))

  /** Distinct n-token shingle hashes (array<bigint>) of an array<string>
    * token column. */
  def shingle_hashes(c: Column, n: Int): Column =
    columnOf(ShingleHashes(exprOf(c), n))

  /** Distinct n-char gram hashes (array<bigint>) of a string column. */
  def char_gram_hashes(c: Column, n: Int): Column =
    columnOf(CharGramHashes(exprOf(c), n))

  /** Winnowed k-gram/w-window fingerprints (array<bigint>) of a
    * normalized string column. */
  def winnow_fps(c: Column, k: Int, w: Int): Column =
    columnOf(WinnowFps(exprOf(c), k, w))
}

case class VecUnit(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    Vec.unit(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.Vec.unit($c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  override protected def withNewChildInternal(c: Expression): VecUnit = copy(c)
}

case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Vec.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Vec.dot($a, $b);")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): VecDot = copy(l, r)
}

case class SignSketchExpr(child: Expression, seed: Long, bits: Int)
    extends UnaryExpression {
  require(bits % 64 == 0, s"sketch bits must be a multiple of 64, got $bits")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    Vec.sketch(v.asInstanceOf[ArrayData], seed, bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Vec.sketch($c, ${seed}L, $bits);")
  override protected def withNewChildInternal(c: Expression): SignSketchExpr =
    copy(child = c)
}

case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    Vec.minhash(v.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Vec.minhash($c, $k);")
  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    Vec.shingleHashes(v.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Vec.shingleHashes($c, $n);")
  override protected def withNewChildInternal(c: Expression): ShingleHashes =
    copy(child = c)
}

case class CharGramHashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    Vec.charGramHashes(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Vec.charGramHashes($c, $n);")
  override protected def withNewChildInternal(c: Expression): CharGramHashes =
    copy(child = c)
}

case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    Vec.winnowFingerprints(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Vec.winnowFingerprints($c, $k, $w);")
  override protected def withNewChildInternal(c: Expression): WinnowFps =
    copy(child = c)
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    Vec.simhash(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Vec.simhash($c);")
  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

case class Hamming64(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Vec.hamming(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Vec.hamming($a, $b);")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Hamming64 = copy(l, r)
}
