package graft

import graft.operators.SimilarityOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-20 optimization pins: the literal-closure assignment kernels
  * (ivf_cell / ivf_top_cells / pq_codes / pq_table) must reproduce the
  * aggregate/window forms they replaced BIT-FOR-BIT — same fixed-order
  * folds, same tie-breaks (max(struct(dot, cell)): ties → higher cell;
  * min(struct(d2, code)): ties → lower code; probe rank (aff DESC,
  * cell ASC)). Each test recomputes the legacy distributed form inline
  * and compares row-for-row against the kernel path. */
class LiteralModelAssignSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }

  private def units: DataFrame =
    SimilarityOps.unitVectors(Tables.t(spark, dir, "embeddings"))
      .localCheckpoint()

  test("ivfAssign kernel matches the crossJoin + max(struct) form") {
    val u = units
    val (_, cents) = SimilarityOps.buildIvfIndex(u)
    val legacy = u.crossJoin(broadcast(cents))
      .withColumn("dot", graft.functions.Vec
        .vec_dot(col("unit"), col("centroid")))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("dot"), col("cell"))).as("m"))
      .select(col("vec_id"), col("m.cell").as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = SimilarityOps.ivfAssign(u, cents)
      .select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == legacy)
    assert(got.size == u.count())
  }

  test("ivfProbes kernel matches the window (aff DESC, cell ASC) form") {
    val u = units
    val (_, cents) = SimilarityOps.buildIvfIndex(u)
    val queries = u.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("unit").as("q_unit"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("aff").desc, col("cell"))
    val legacy = queries.crossJoin(broadcast(cents))
      .withColumn("aff", graft.functions.Vec
        .vec_dot(col("q_unit"), col("centroid")))
      .withColumn("prnk", row_number().over(w))
      .filter(col("prnk") <= SimilarityOps.IvfProbes)
      .select(col("query_id"), col("cell"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val got = SimilarityOps
      .ivfProbes(queries, cents, SimilarityOps.IvfProbes)
      .select(col("query_id"), col("cell"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got == legacy)
  }

  test("pqEncodeUnits matches the exploded pqEncode form") {
    val u = units
    val (subs, cb) = SimilarityOps.buildPqCodebooks(u)
    val legacy = SimilarityOps.pqEncode(subs, cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val got = SimilarityOps.pqEncodeUnits(u, cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(got == legacy)
    assert(got.size == u.count())
  }

  test("pqQueryTables kernel matches the join + collect_list table form") {
    val u = units
    val (subs, cb) = SimilarityOps.buildPqCodebooks(u)
    val legacy = SimilarityOps
      .pqDistanceTables(subs.filter(col("vec_id") < 10), cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val got = SimilarityOps
      .pqQueryTables(u.filter(col("vec_id") < 10), cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got == legacy)
    assert(got.nonEmpty)
  }

  test("pq_dist_q_all matches per-sub pq_dist_q over pqAssign") {
    val u = units
    val (subs, cb) = SimilarityOps.buildPqCodebooks(u)
    val legacy = SimilarityOps.pqAssign(subs, cb)
      .join(broadcast(cb.select(col("sub"), col("code"), col("sq"),
        col("cq"))), Seq("sub", "code"))
      .withColumn("d2q", graft.functions.Vec
        .pq_dist_q(col("subvec"), col("sq"), col("cq")))
      .groupBy(col("sub"))
      .agg(sum(col("d2q")).as("d"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val cbArr = SimilarityOps.collectCodebook(cb)
    val (sq, cq) = SimilarityOps.collectExactPairs(cb)
    val got = u
      .select(posexplode(graft.functions.Vec.pq_dist_q_all(col("unit"),
        graft.functions.Vec.pq_codes(col("unit"), cbArr), sq, cq))
        .as(Seq("sub", "d2q")))
      .groupBy(col("sub"))
      .agg(sum(col("d2q")).as("d"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == legacy)
  }

  test("ivf Lloyd-round tuples reproduce the exploded sum form") {
    val u = units
    val (_, cents) = SimilarityOps.buildIvfIndex(u)
    val centsArr = SimilarityOps.collectCents(cents)
    val legacy = SimilarityOps.ivfAssign(u, cents)
      .select(col("cell"), posexplode(col("unit")))
      .groupBy(col("cell"), col("pos"))
      .agg(sum(floor(col("col") * lit(SimilarityOps.IvfQuant) + lit(0.5))
        .cast("decimal(38,0)")).as("s"), count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getDecimal(2).toBigInteger, r.getLong(3)))).toMap
    val got = u
      .select(explode(graft.functions.Vec.ivf_round_rows(col("unit"),
        centsArr, SimilarityOps.IvfQuant)).as("r"))
      .groupBy(col("r.cell").as("cell"), col("r.pos").as("pos"))
      .agg(sum(col("r.xq").cast("decimal(38,0)")).as("s"),
        count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getDecimal(2).toBigInteger, r.getLong(3)))).toMap
    assert(got == legacy)
  }
}
