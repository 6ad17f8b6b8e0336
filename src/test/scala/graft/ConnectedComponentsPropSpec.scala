package graft

import graft.operators.CurationOps
import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Property coverage for [[CurationOps.connectedComponents]] — the
  * closure every cluster query (text, image, audio, video, pair) keeps
  * one witness per component through. The named specs and the DuckDB
  * recursive-CTE oracles gate fixture-shaped graphs; this property
  * checks arbitrary ones — including shapes the near-dup fixtures
  * never produce (long chains near the iteration bound, dense blobs,
  * many singleton-free components) — against a plain-Scala union-find:
  * exact (node -> min reachable id) equality. */
class ConnectedComponentsPropSpec extends AnyFunSuite
    with BeforeAndAfterAll with TempDirCleanup {

  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }

  private def reference(edges: List[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(n => n -> find(n)).toMap
  }

  private val genEdges: Gen[List[(Long, Long)]] = for {
    nNodes <- Gen.choose(2, 40)
    nEdges <- Gen.choose(1, 60)
    edges <- Gen.listOfN(nEdges, for {
      a <- Gen.choose(0L, nNodes.toLong - 1)
      b <- Gen.choose(0L, nNodes.toLong - 1)
    } yield (a, b))
  } yield edges.filter(e => e._1 != e._2)

  test("connectedComponents == union-find min-label on arbitrary " +
      "graphs (chains, blobs, parallel and reversed edges)") {
    import spark.implicits._
    val prop = Prop.forAll(genEdges) { edges =>
      edges.isEmpty || {
        val got = CurationOps.connectedComponents(
          edges.toDF("id_a", "id_b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == reference(edges)
      }
    }
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(r.passed, r.status.toString)
  }

  test("a worst-case path chain (diameter at the productive-round " +
      "bound) still converges to one component") {
    import spark.implicits._
    // a path 0-1-2-...-24: min-label needs the full diameter to reach
    // the far end; maxIter = 25 productive rounds must cover it
    val chain = (0L until 24L).map(i => (i, i + 1)).toList
    val got = CurationOps.connectedComponents(chain.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to 24L).map(_ -> 0L).toMap)
  }
}
