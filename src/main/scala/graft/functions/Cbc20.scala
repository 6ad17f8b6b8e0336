package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** CBC-20 token-transfer calldata decoding (OP-UDTF-1).
  *
  * Semantics from `/root/reference/crates/contracts/cbc20/src/cbc20.rs:34-81`:
  * calldata is a hex string (no `0x`); the first 8 chars select the call:
  *
  *  - `4b40e901` transfer(address,uint256): one row,
  *    `from = tx sender`, `to = input[28..72]`, `value = input[72..136]`;
  *  - `31f2e679` transferFrom(address,address,uint256): one row,
  *    `from = input[28..72]`, `to = input[92..136]`, `value = input[136..200]`;
  *  - `e86e7c5f` batchTransfer(address[],uint256[]): `count = hex(input
  *    [136..200])` rows, `to_i = input[220+64i..264+64i]`,
  *    `value_i = input[264+64(count+i)..328+64(count+i)]` (worked layout at
  *    cbc20.rs:47-58).
  *
  * Address slices are 44 chars (the low 22 bytes of a 32-byte word); values
  * stay the raw 64-hex-digit slice, NOT decimalized (cbc20.rs:44).
  *
  * The reference panics on unknown selectors (cbc20.rs:79) but is only
  * invoked after its selector filter (etl.rs:353); the engine folds that
  * contract into the operator: malformed or non-matching calldata yields
  * zero rows instead of an error, so the generator is safe to run over
  * unfiltered 100 TB inputs. `count` is additionally bounded by the actual
  * calldata length, so hostile length words cannot allocate unbounded rows.
  */
object Cbc20 {
  val SelectorTransfer = "4b40e901"
  val SelectorBatchTransfer = "e86e7c5f"
  val SelectorTransferFrom = "31f2e679"
  val Selectors: Seq[String] =
    Seq(SelectorTransfer, SelectorBatchTransfer, SelectorTransferFrom)

  /** Decoded fields per emitted row. */
  val outputSchema: StructType = StructType(Seq(
    StructField("transfer_index", LongType, nullable = false),
    StructField("from_addr", StringType, nullable = true),
    StructField("to_addr", StringType, nullable = true),
    StructField("value", StringType, nullable = true)))

  /** Pure decode: (index, from, to, valueHex) tuples; empty when the input
    * is not a well-formed watched-selector call. */
  def decode(sender: String, input: String): Seq[(Long, String, String, String)] = {
    if (input == null || input.length < 8) return Nil
    input.substring(0, 8) match {
      case SelectorTransfer if input.length >= 136 =>
        Seq((0L, sender, input.substring(28, 72), input.substring(72, 136)))
      case SelectorTransferFrom if input.length >= 200 =>
        Seq((0L, input.substring(28, 72), input.substring(92, 136),
          input.substring(136, 200)))
      case SelectorBatchTransfer if input.length >= 200 =>
        val count = parseHexLong(input.substring(136, 200))
        // Each element needs one 64-char word in both arrays after the
        // 200-char header + the second array's length word.
        val maxFit = (input.length - 264) / 128
        if (count <= 0 || count > maxFit) Nil
        else (0L until count).map { i =>
          val off = i.toInt * 64
          val vBase = 264 + count.toInt * 64 + off
          (i, sender, input.substring(220 + off, 264 + off),
            input.substring(vBase, vBase + 64))
        }
      case _ => Nil
    }
  }

  private def parseHexLong(s: String): Long = {
    // 64-hex-digit word; values beyond Long range are hostile — clamp.
    val trimmed = s.dropWhile(_ == '0')
    if (trimmed.isEmpty) 0L
    else if (trimmed.length > 15 || !trimmed.forall(isHex)) -1L
    else java.lang.Long.parseLong(trimmed, 16)
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** Selector predicate (OP-FIL-8 / check_if_call, cbc20.rs:25-32). */
  def isTransferCall(input: Column): Column = {
    import org.apache.spark.sql.functions._
    substring(input, 1, 8).isin(Selectors: _*)
  }

  /** Column-API handle for the generator. Use in `select` alongside the
    * parent columns, e.g.
    * `txs.select(col("hash"), cbc20_decode(col("from_addr"), col("input")))`.
    */
  def cbc20_decode(sender: Column, input: Column): Column =
    columnOf(Cbc20DecodeExpr(exprOf(sender), exprOf(input)))
}

/** Catalyst Generator for CBC-20 decode — explode-shaped: each input row
  * yields 0..N `(transfer_index, from_addr, to_addr, value)` rows inside
  * the same whole-stage pipeline (no UDF boxing of the row fan-out). */
case class Cbc20DecodeExpr(sender: Expression, input: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(sender, input)

  override def elementSchema: StructType = Cbc20.outputSchema

  override def eval(row: InternalRow): IterableOnce[InternalRow] = {
    val s = sender.eval(row)
    val in = input.eval(row)
    if (in == null) Nil
    else {
      val senderStr = if (s == null) null else s.toString
      Cbc20.decode(senderStr, in.toString).map { case (i, f, t, v) =>
        new GenericInternalRow(Array[Any](i, UTF8String.fromString(f),
          UTF8String.fromString(t), UTF8String.fromString(v)))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Cbc20DecodeExpr =
    copy(sender = newChildren(0), input = newChildren(1))
}
