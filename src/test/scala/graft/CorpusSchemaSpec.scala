package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-schema canary: loads every driver table at sf0.001 through
  * `Tables.t` and asserts the post-load schema the engine depends on.
  *
  * The driver regenerates /root/testdata between rounds and has changed
  * physical encodings before (round 7: `events.ts` flipped from
  * TIMESTAMP(NANOS) to TIMESTAMP_MICROS, breaking 8 queries at analysis
  * time). This spec exists so the NEXT silent drift fails here, loudly,
  * naming the drifted column — instead of as a pile of opaque query errors.
  */
class CorpusSchemaSpec extends AnyFunSuite with BeforeAndAfterAll with TempDirCleanup {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }


  private def fieldType(table: String, column: String): DataType =
    Tables.t(spark, dir, table).schema(column).dataType

  test("all driver tables load through Tables.t") {
    Tables.relational.foreach { name =>
      val df = Tables.t(spark, dir, name)
      assert(df.schema.nonEmpty, s"$name: empty schema")
      // Force one row through analysis + scan so encoding problems surface.
      assert(df.limit(1).count() == 1, s"$name: no rows at sf0.001")
    }
  }

  test("events.ts normalizes to session-TZ TimestampType after load") {
    assert(fieldType("events", "ts") == TimestampType,
      "events.ts must load as TimestampType (nanos-long and micros-NTZ " +
        "corpora are both normalized by Tables.t; a new physical encoding " +
        "needs a new branch there)")
    // The normalized instants must be sane epoch values, not re-scaled junk.
    import org.apache.spark.sql.functions._
    val yr = Tables.t(spark, dir, "events")
      .select(min(year(col("ts"))), max(year(col("ts")))).head()
    assert(yr.getInt(0) >= 1990 && yr.getInt(1) <= 2100,
      s"events.ts years out of range: $yr — normalization factor is wrong")
  }

  test("events columns the queries depend on keep their types") {
    assert(fieldType("events", "event_id") == LongType)
    assert(fieldType("events", "user_id") == LongType)
    assert(fieldType("events", "event_type") == StringType)
    assert(fieldType("events", "value") == DoubleType)
    assert(fieldType("events", "props") == StringType,
      "events.props must be JSON-in-string (fn_json_extract parses it)")
  }

  test("documents and embeddings keep the text/vector contract") {
    assert(fieldType("documents", "doc_id") == LongType)
    assert(fieldType("documents", "text") == StringType)
    assert(fieldType("documents", "lang") == StringType)
    assert(fieldType("documents", "source") == StringType)
    assert(fieldType("embeddings", "vec_id") == LongType)
    val emb = fieldType("embeddings", "embedding")
    assert(emb.isInstanceOf[ArrayType] &&
      Set[DataType](FloatType, DoubleType)
        .contains(emb.asInstanceOf[ArrayType].elementType),
      s"embeddings.embedding must be array<float|double>, got $emb")
    // label: the filtered-ANN queries (ann_topk_filtered) predicate on
    // it — a corpus drop without it turns a green query into a driver
    // error row; catch the drift here first
    assert(fieldType("embeddings", "label") == IntegerType,
      "embeddings.label (int) must exist: ann_topk_filtered keys on it")
    // Fixed width: every vector the ANN/dedup ops see must agree.
    import org.apache.spark.sql.functions._
    val widths = Tables.t(spark, dir, "embeddings")
      .select(size(col("embedding")).as("w")).distinct().collect()
    assert(widths.length == 1 && widths.head.getInt(0) > 0,
      s"embeddings must be fixed-width, got ${widths.mkString(",")}")
  }

  test("legacy long-nanos events corpora still normalize (loader branch)") {
    // The corpus has shipped events.ts both as TIMESTAMP(NANOS) — which the
    // nanosAsLong session config reads as LongType — and as
    // TIMESTAMP_MICROS. The micros corpus on disk covers the second branch;
    // this covers the first with a synthetic long-nanos table.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val microsA = 1700000000123456L // 2023-11-14T22:13:20.123456Z
    val microsB = 1700003600999999L
    val tmp = tempDir("nanocorpus")
    Seq((1L, microsA * 1000L + 789L), (2L, microsB * 1000L + 1L))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val df = Tables.t(spark, tmp, "events")
    assert(df.schema("ts").dataType == TimestampType)
    // sub-microsecond nanos truncate; the microsecond value is exact
    val got = df.orderBy("event_id")
      .select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(microsA, microsB))
  }

  test("native-timestamp events corpora pass through unchanged " +
      "(loader branch)") {
    // third loader branch: parquet micros WITH UTC adjustment reads as
    // TimestampType (Spark's own output format) and must not be re-scaled
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val micros = 1700000000123456L
    val tmp = tempDir("tzcorpus")
    Seq(1L).toDF("event_id")
      .withColumn("ts", timestamp_micros(lit(micros)))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val df = Tables.t(spark, tmp, "events")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.select(unix_micros(col("ts"))).head().getLong(0) == micros)
  }

  test("tpch-ish key columns keep their join types") {
    // Integral is what the joins require; the corpus mixes int32/int64
    // (e.g. c_nationkey int32 vs l_orderkey int64) and Spark coerces,
    // so pin "integral", not the exact width.
    val integral = Set[DataType](IntegerType, LongType)
    Seq(
      "lineitem" -> "l_orderkey", "orders" -> "o_orderkey",
      "orders" -> "o_custkey", "customer" -> "c_custkey",
      "customer" -> "c_nationkey", "nation" -> "n_nationkey",
      "nation" -> "n_regionkey", "region" -> "r_regionkey",
      "part" -> "p_partkey", "supplier" -> "s_suppkey"
    ).foreach { case (t, c) =>
      assert(integral.contains(fieldType(t, c)), s"$t.$c must stay integral")
    }
  }
}
