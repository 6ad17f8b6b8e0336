package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 256-bit unsigned integer helpers (SURVEY §7.4).
  *
  * The reference stores U256 magnitudes as decimal strings
  * (`/root/reference/crates/types/src/block.rs:32`, `transaction.rs:28-37`)
  * and token-transfer values as raw 64-hex-digit slices
  * (`cbc20.rs:44`). 2^256 has 78 decimal digits: Spark's `conv()` caps at
  * 64-bit and `DecimalType` at 38 digits, so ordering and arithmetic need
  * custom expressions. All are thin wrappers over static Java helpers so
  * whole-stage codegen keeps working (`nullSafeCodeGen` emits a direct
  * static call — no boxing, no UDF serialization).
  */
object U256 {

  // ---- static helpers invoked from generated code ----

  /** 64-hex-digit (or shorter) string → decimal string. Null-safe at the
    * expression layer; malformed input → null. */
  def hexToDec(hex: UTF8String): UTF8String = {
    if (hex == null) return null
    val s = hex.toString
    if (s.isEmpty || !s.forall(isHexChar)) null
    else UTF8String.fromString(new BigInteger(s, 16).toString)
  }

  /** Decimal-string comparison by numeric value: length-then-lex on the
    * zero-trimmed magnitude (no BigInteger allocation on the hot path). */
  def decCompare(a: UTF8String, b: UTF8String): Int = {
    val x = trimZeros(a.toString)
    val y = trimZeros(b.toString)
    if (x.length != y.length) if (x.length < y.length) -1 else 1
    else x.compareTo(y)
  }

  /** Decimal-string addition (exact, arbitrary precision). */
  def decAdd(a: UTF8String, b: UTF8String): UTF8String =
    UTF8String.fromString(
      new BigInteger(a.toString).add(new BigInteger(b.toString)).toString)

  private def trimZeros(s: String): String = {
    val t = s.dropWhile(_ == '0')
    if (t.isEmpty) "0" else t
  }

  private def isHexChar(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  // ---- Column API ----

  /** Raw calldata hex value → decimal string (engine extension column next
    * to the parity-preserving raw hex). */
  def u256_from_hex(c: Column): Column = columnOf(U256FromHex(exprOf(c)))

  /** Numeric comparison of two U256 decimal strings → -1/0/1. */
  def u256_cmp(a: Column, b: Column): Column = columnOf(U256Cmp(exprOf(a), exprOf(b)))

  /** Exact sum of two U256 decimal strings. */
  def u256_add(a: Column, b: Column): Column = columnOf(U256Add(exprOf(a), exprOf(b)))

  /** Exact sum aggregate over U256 decimal strings. */
  def u256_sum(c: Column): Column =
    columnOf(U256SumAgg(exprOf(c)).toAggregateExpression())

  /** Sort key for U256 decimal strings: left-pad to 78 digits so
    * lexicographic order == numeric order (for orderBy/range partitioning
    * without materializing BigIntegers in the sorter). */
  def u256_sort_key(c: Column): Column = {
    import org.apache.spark.sql.functions._
    lpad(c, 78, "0")
  }
}

/** Exact arbitrary-precision sum of U256 decimal strings — the aggregate
  * Spark cannot express (sum over Decimal caps at 38 digits). A
  * TypedImperativeAggregate with a BigInteger buffer: partial sums on the
  * map side, byte-array serialized between stages, decimal string out. */
case class U256SumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[BigInteger] {

  override def createAggregationBuffer(): BigInteger = BigInteger.ZERO

  override def update(buffer: BigInteger,
      input: org.apache.spark.sql.catalyst.InternalRow): BigInteger = {
    val v = child.eval(input)
    if (v == null) buffer
    else buffer.add(new BigInteger(v.toString))
  }

  override def merge(a: BigInteger, b: BigInteger): BigInteger = a.add(b)

  override def eval(buffer: BigInteger): Any =
    UTF8String.fromString(buffer.toString)

  override def serialize(buffer: BigInteger): Array[Byte] =
    buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): BigInteger =
    new BigInteger(bytes)

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(o: Int): U256SumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): U256SumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): U256SumAgg = copy(child = c.head)
}

case class U256FromHex(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    U256.hexToDec(v.asInstanceOf[UTF8String])
  override def nullable: Boolean = true
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.U256.hexToDec($c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  override protected def withNewChildInternal(c: Expression): U256FromHex = copy(c)
}

case class U256Cmp(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    U256.decCompare(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.U256.decCompare($a, $b);")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): U256Cmp = copy(l, r)
}

case class U256Add(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    U256.decAdd(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.U256.decAdd($a, $b);")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): U256Add = copy(l, r)
}
