package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-trigram language-model kernels — the engine's take on the
  * CCNet-style LM quality filter (Wenzek et al. 2020 score documents with
  * a KenLM 5-gram model; the filtering signal, not the exact model, is
  * the point). Two deliberate departures keep it a pure Spark scan
  * operator with an exact cross-engine oracle:
  *
  *  - the model is a CHAR-trigram table over a 37-symbol alphabet
  *    (`[a-z0-9 ]`, anything else normalized to space upstream): 37³ =
  *    50,653 counts — small enough to train with ONE corpus scan (explode
  *    trigram codes → map-side-combined count, so the shuffle carries at
  *    most 50,653 rows per partition regardless of corpus size) and to
  *    ship to every task as a plain long[] inside the expression;
  *  - the score is kept in INTEGER basis points end to end — per
  *    position, add-one-smoothed `P(c₃|c₁c₂)` is
  *    `(cnt(tri)+1)·10000 div (cnt(ctx)+37)` and the document score is
  *    the truncating mean over positions — so Spark and the DuckDB
  *    oracle compute bit-identical longs with no IEEE log reasoning
  *    (same argument as [[graft.operators.TextOps.qualityBpSparkSql]]).
  *    Mean probability rather than mean log-prob compresses the dynamic
  *    range but orders documents the same way where the filter operates
  *    (gibberish ≪ natural text); the log variant would need a float
  *    tolerance gate instead of a hash gate.
  *
  * Both kernels follow the [[Vec]] pattern: a static JVM method on a
  * tight byte loop, invoked from whole-stage-generated code, so scoring
  * runs at parquet-scan speed with zero interpreted lambdas.
  */
object Lm {

  /** Alphabet size: a-z (0-25), 0-9 (26-35), space (36). */
  val Symbols = 37
  val TriSpace: Int = Symbols * Symbols * Symbols

  /** Symbol code of one normalized byte; anything unexpected degrades to
    * the space code (the normalizer upstream should have removed it). */
  private def codeOf(b: Byte): Int = {
    val c = b & 0xff
    if (c >= 'a' && c <= 'z') c - 'a'
    else if (c >= '0' && c <= '9') c - '0' + 26
    else Symbols - 1
  }

  /** Trigram codes (c₁·37² + c₂·37 + c₃) of a normalized string, one per
    * position — length-2 fewer than the byte count, empty below 3. */
  def triCodes(text: UTF8String): ArrayData = {
    val n = text.numBytes()
    if (n < 3) return new GenericArrayData(Array.empty[Int])
    val out = new Array[Int](n - 2)
    var c0 = codeOf(text.getByte(0))
    var c1 = codeOf(text.getByte(1))
    var i = 2
    while (i < n) {
      val c2 = codeOf(text.getByte(i))
      out(i - 2) = (c0 * Symbols + c1) * Symbols + c2
      c0 = c1
      c1 = c2
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Context counts derived from a trigram-count model: ctx[big] =
    * Σ_c model[big·37+c] (every trigram start IS a bigram occurrence). */
  def ctxOf(model: Array[Long]): Array[Long] = {
    require(model.length == TriSpace,
      s"model must have $TriSpace entries, got ${model.length}")
    val ctx = new Array[Long](Symbols * Symbols)
    var i = 0
    while (i < TriSpace) {
      ctx(i / Symbols) += model(i)
      i += 1
    }
    ctx
  }

  /** Mean add-one-smoothed trigram probability of the document under the
    * model, in basis points (truncating integer arithmetic throughout);
    * -1 when the text is shorter than one trigram (callers surface that
    * as NULL). */
  def scoreBp(text: UTF8String, model: Array[Long], ctx: Array[Long]): Long = {
    val n = text.numBytes()
    if (n < 3) return -1L
    var sum = 0L
    var c0 = codeOf(text.getByte(0))
    var c1 = codeOf(text.getByte(1))
    var i = 2
    while (i < n) {
      val c2 = codeOf(text.getByte(i))
      val tri = (c0 * Symbols + c1) * Symbols + c2
      sum += (model(tri) + 1L) * 10000L / (ctx(c0 * Symbols + c1) + Symbols)
      c0 = c1
      c1 = c2
      i += 1
    }
    sum / (n - 2)
  }

  // ---- Column API ----

  /** Trigram codes (array<int>) of a pre-normalized string column. */
  def lm_tri_codes(c: Column): Column = columnOf(LmTriCodes(exprOf(c)))

  /** Integer-bp LM score of a pre-normalized string column under a
    * trained trigram-count model (null below one trigram of text). */
  def lm_score_bp(c: Column, model: Array[Long]): Column =
    columnOf(LmScoreBp(exprOf(c), model))
}

case class LmTriCodes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    Lm.triCodes(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Lm.triCodes($c);")
  override protected def withNewChildInternal(c: Expression): LmTriCodes =
    copy(c)
}

/** The model rides in the expression itself (one 400 KB long[] per task
  * via Spark's task-closure broadcast, referenced from generated code
  * with `addReferenceObj` — never a 50k-element literal in the plan
  * tree); the context table is derived once per deserialized instance. */
case class LmScoreBp(child: Expression, model: Array[Long])
    extends UnaryExpression {
  @transient private lazy val ctxCounts: Array[Long] = Lm.ctxOf(model)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val r = Lm.scoreBp(v.asInstanceOf[UTF8String], model, ctxCounts)
      if (r < 0) null else r
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("lmModel", model, "long[]")
    val ctxRef = ctx.addReferenceObj("lmCtx", ctxCounts, "long[]")
    val r = ctx.freshName("lmScore")
    nullSafeCodeGen(ctx, ev, c =>
      s"""long $r = graft.functions.Lm.scoreBp($c, $modelRef, $ctxRef);
         |${ev.isNull} = $r < 0;
         |${ev.value} = $r;""".stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): LmScoreBp =
    copy(child = c)
}
