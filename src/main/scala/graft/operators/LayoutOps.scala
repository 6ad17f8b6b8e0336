package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Physical-layout operators: Z-order (Morton) interleaving for
  * multi-dimensional data clustering.
  *
  * GraftStore's leaves are height-sorted (SNK-4), which prunes parquet
  * row groups for height-range scans — but a 100 TB deployment also runs
  * the two-dimensional shape `address = X AND height BETWEEN a AND b`
  * (the reference's per-token tables + block filters). Sorting by the
  * Z-VALUE of (address-hash, height) clusters BOTH dimensions into every
  * row group, so min/max footer stats prune scans on either predicate —
  * the standard multi-dim clustering trick (Delta/Iceberg OPTIMIZE
  * ZORDER) expressed as a plain sort key.
  *
  * The interleave is the closed-form bit-twiddling spread (no loops, no
  * UDF — five shift/mask steps per dimension, all codegen'd long
  * arithmetic), identical in any engine with 64-bit ints: the DuckDB
  * oracle recomputes it step for step. ZOrderSpec proves the layout
  * claim physically: on a two-dim box predicate, a z-sorted file's
  * parquet footer admits strictly fewer candidate row groups than a
  * single-dim-sorted one.
  */
object LayoutOps {

  /** Bit-spread of the low 31 bits of a long: bit i moves to bit 2i
    * (Morton "part1by1", closed form). 31 bits per dimension — not 32 —
    * so the two-dim interleave tops out at bit 62 and [[zValue]]'s
    * odd-position shift can never reach the sign bit, where engines
    * disagree on signed-overflow behavior (Spark's shiftleft wraps,
    * other engines may error or saturate). */
  def part1by1(c: Column): Column = {
    val masked = c.bitwiseAND(lit(2147483647L)) // 0x7FFFFFFF
    val s1 = masked.bitwiseOR(shiftleft(masked, 16))
      .bitwiseAND(lit(281470681808895L)) // 0x0000FFFF0000FFFF
    val s2 = s1.bitwiseOR(shiftleft(s1, 8))
      .bitwiseAND(lit(71777214294589695L)) // 0x00FF00FF00FF00FF
    val s3 = s2.bitwiseOR(shiftleft(s2, 4))
      .bitwiseAND(lit(1085102592571150095L)) // 0x0F0F0F0F0F0F0F0F
    val s4 = s3.bitwiseOR(shiftleft(s3, 2))
      .bitwiseAND(lit(3689348814741910323L)) // 0x3333333333333333
    s4.bitwiseOR(shiftleft(s4, 1))
      .bitwiseAND(lit(6148914691236517205L)) // 0x5555555555555555
  }

  /** Z-value (Morton code) of two non-negative 31-bit dimensions: bits
    * of `a` land on even positions, bits of `b` on odd. Z-order-sorted
    * data clusters both dimensions into contiguous runs. Inputs wider
    * than 31 bits are masked (hash the dimension first if its high bits
    * carry information — the store path uses an address HASH anyway). */
  def zValue(a: Column, b: Column): Column =
    part1by1(a).bitwiseOR(shiftleft(part1by1(b), 1))

  /** Order-preserving 31-bit key of a string: its first four bytes,
    * big-endian packed. Sorting by this key sorts by the string's byte
    * (= parquet min/max comparison) order down to 4-char granularity, so
    * it can serve as a z-dimension for a STRING column and the column's
    * own footer stats stay narrow — no query-side rewrite needed, unlike
    * hashing (which scatters byte order and ruins string stats). Strings
    * sharing a 4-byte prefix collide and simply stay adjacent; shorter
    * strings pad with 0. ASCII-only precondition (true of hex addresses):
    * a first byte >= 0x80 would spill past 31 bits and get masked by
    * [[part1by1]], breaking order preservation. */
  def asciiPrefixKey(c: Column): Column =
    (ascii(substring(c, 1, 1)).cast("long") * lit(16777216L) +
      ascii(substring(c, 2, 1)).cast("long") * lit(65536L) +
      ascii(substring(c, 3, 1)).cast("long") * lit(256L) +
      ascii(substring(c, 4, 1)).cast("long"))

  /** The same spread as a DuckDB SQL step chain over column `x`,
    * emitting intermediate names `p`. */
  private def duckSpreadSteps(x: String, p: String): String =
    s"""(SELECT *, CAST($x AS BIGINT) & 2147483647 AS ${p}0 FROM __in__),
       |s1_$p AS (SELECT *, (${p}0 | (${p}0 << 16)) & 281470681808895 AS ${p}1 FROM s0_$p),
       |s2_$p AS (SELECT *, (${p}1 | (${p}1 << 8)) & 71777214294589695 AS ${p}2 FROM s1_$p),
       |s3_$p AS (SELECT *, (${p}2 | (${p}2 << 4)) & 1085102592571150095 AS ${p}3 FROM s2_$p),
       |s4_$p AS (SELECT *, (${p}3 | (${p}3 << 2)) & 3689348814741910323 AS ${p}4 FROM s3_$p),
       |s5_$p AS (SELECT *, (${p}4 | (${p}4 << 1)) & 6148914691236517205 AS ${p}5 FROM s4_$p)"""
      .stripMargin

  /** Z-values over lineitem's (l_orderkey, l_partkey) — the two columns
    * a multi-dim scan would box-filter together. Exact integer output,
    * oracled step for step. */
  val zorder: GraftQuery = GraftQuery(
    "layout_zorder",
    (s, dir) =>
      Tables.t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
          zValue(col("l_orderkey").cast("long"),
            col("l_partkey").cast("long")).as("zval")),
    Some {
      val a = duckSpreadSteps("l_orderkey", "za")
        .replace("__in__", "lineitem")
      val b = duckSpreadSteps("l_partkey", "zb")
        .replace("__in__", "s5_za")
      s"""WITH s0_za AS $a,
         |s0_zb AS $b
         |SELECT l_orderkey, l_partkey, l_linenumber,
         |  za5 | (zb5 << 1) AS zval
         |FROM s5_zb""".stripMargin
    })

  val all: Seq[GraftQuery] = Seq(zorder)
}
