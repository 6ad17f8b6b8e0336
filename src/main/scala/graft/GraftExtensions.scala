package graft

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** SQL surface for the engine's custom Catalyst expressions.
  *
  * The Scala Column API (graft.functions.{Vec, U256, Cbc20}) covers
  * programmatic callers; registering the same expressions through
  * `SparkSessionExtensions` makes every kernel callable from `spark.sql`
  * text too — `SELECT graft_vec_dot(a.embedding, b.embedding)`,
  * `SELECT graft_u256_sum(value) FROM transfers`, or
  * `LATERAL VIEW graft_cbc20_decode(from_addr, input)` — so a SQL-only
  * user of the engine loses nothing. Activated by
  * `spark.sql.extensions=graft.GraftExtensions` ([[GraftSession]] sets
  * it on every session), or per-cluster via the same conf.
  *
  * Registration notes:
  *  - aggregate ([[graft.functions.U256SumAgg]]) and generator
  *    ([[graft.functions.Cbc20DecodeExpr]]) functions register as plain
  *    expression builders — the analyzer wraps/plans them exactly as it
  *    does the built-in `sum`/`explode`;
  *  - kernel parameters (shingle width, sketch bits, ...) must be
  *    integer LITERALS — they parameterize codegen, so a non-literal is
  *    rejected at analysis with a named error, not at runtime;
  *  - the vector arguments of the double-typed kernels are wrapped in
  *    `CAST(... AS ARRAY<DOUBLE>)` mirroring the Column API, so
  *    float-array embedding columns work verbatim from SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getCanonicalName, name),
        builder))
    }
}

object GraftExtensions {

  private def intLit(fn: String, arg: String)(e: Expression): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) if v.isValidInt => v.toInt
    case Literal(v: Long, _) => throw new IllegalArgumentException(
      s"$fn: $arg must fit in a 32-bit integer, got $v")
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def asDoubles(e: Expression): Expression =
    Cast(e, ArrayType(DoubleType))

  private def fn(name: String, arity: Int)(
      f: Seq[Expression] => Expression)
      : (String, Seq[Expression] => Expression) =
    name -> { args =>
      require(args.length == arity,
        s"$name expects $arity argument(s), got ${args.length}")
      f(args)
    }

  /** name -> expression builder, the full SQL-callable inventory. */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    // dense-vector kernels
    fn("graft_vec_unit", 1)(a => VecUnit(asDoubles(a.head))),
    fn("graft_vec_dot", 2)(a =>
      VecDot(asDoubles(a(0)), asDoubles(a(1)))),
    fn("graft_sign_sketch", 3)(a => SignSketchExpr(asDoubles(a(0)),
      intLit("graft_sign_sketch", "seed")(a(1)).toLong,
      intLit("graft_sign_sketch", "bits")(a(2)))),
    fn("graft_hamming64", 2)(a => Hamming64(a(0), a(1))),
    fn("graft_vec_l2sq", 2)(a =>
      VecL2Sq(asDoubles(a(0)), asDoubles(a(1)))),
    fn("graft_vec_sub", 2)(a =>
      VecSub(asDoubles(a(0)), asDoubles(a(1)))),
    fn("graft_pq_adc", 3)(a => PqAdc(a(0), a(1),
      intLit("graft_pq_adc", "ks")(a(2)))),
    // text/dedup kernels
    fn("graft_minhash_sig", 2)(a =>
      MinHashSig(a(0), intLit("graft_minhash_sig", "k")(a(1)))),
    fn("graft_simhash64", 1)(a => SimHash64(a.head)),
    fn("graft_token_hashes", 1)(a => TokenHashes(a.head)),
    fn("graft_portable_hash64", 1)(a => PortableHash64(a.head)),
    fn("graft_shingle_hashes", 2)(a =>
      ShingleHashes(a(0), intLit("graft_shingle_hashes", "n")(a(1)))),
    fn("graft_char_gram_hashes", 2)(a =>
      CharGramHashes(a(0), intLit("graft_char_gram_hashes", "n")(a(1)))),
    fn("graft_winnow_fps", 3)(a => WinnowFps(a(0),
      intLit("graft_winnow_fps", "k")(a(1)),
      intLit("graft_winnow_fps", "w")(a(2)))),
    // LM trigram codes (the trained-model scorer LmScoreBp carries its
    // long[] model in the expression — no SQL-literal form, Column API
    // only)
    fn("graft_lm_tri_codes", 1)(a => LmTriCodes(a.head)),
    // U256 decimal-string arithmetic
    fn("graft_u256_from_hex", 1)(a => U256FromHex(a.head)),
    fn("graft_u256_cmp", 2)(a => U256Cmp(a(0), a(1))),
    fn("graft_u256_add", 2)(a => U256Add(a(0), a(1))),
    fn("graft_u256_sum", 1)(a => U256SumAgg(a.head)),
    // Misra-Gries approximate top-k heavy hitters (aggregate)
    fn("graft_mg_top_k", 3)(a => MgTopKAgg(a(0),
      intLit("graft_mg_top_k", "k")(a(1)),
      intLit("graft_mg_top_k", "capacity")(a(2)))),
    // CBC-20 calldata decode (generator)
    fn("graft_cbc20_decode", 2)(a => Cbc20DecodeExpr(a(0), a(1))),
    // Z-order (Morton) interleave for multi-dim clustering — composed
    // from built-in shift/mask expressions, registered for SQL parity
    fn("graft_zvalue", 2)(a =>
      exprOf(operators.LayoutOps.zValue(columnOf(a(0)), columnOf(a(1))))))
}
