package graft.sources

import java.util

import graft.chain.ChainFixture
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** New-heads streaming source (OP-SRC-4): a DataSource-V2 MicroBatchStream
  * whose offset IS the block height — the engine analogue of the node's
  * newHeads subscription (`/root/reference/crates/provider/src/provider.rs:
  * 45-47`, consumed etl.rs:128-173).
  *
  * The test/dev implementation releases heads from the deterministic
  * fixture, `blocksPerBatch` per poll; a production implementation keeps
  * the identical offset/partition shape and swaps the reader for an RPC
  * client. Offsets checkpoint/restore as plain height JSON, so resume
  * semantics (OP-STR-1) come from the Structured Streaming engine.
  *
  * Usage:
  * {{{
  * spark.readStream.format("graft.sources.ChainHeadsProvider")
  *   .option("numBlocks", "200").option("blocksPerBatch", "50").load()
  * }}}
  */
object ChainHeadsSource {
  val schema: StructType = new StructType()
    .add("number", LongType, nullable = false)
    .add("hash", StringType, nullable = false)
    .add("parent_hash", StringType, nullable = false)
}

class ChainHeadsProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ChainHeadsSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // properties arrive with the CALLER's key case (unlike inferSchema's
    // map) — a plain lowercase get would silently miss `.option(
    // "numBlocks", …)` and fall back to defaults. Wrap to make lookups
    // case-insensitive like every other DSv2 option read.
    val opts = new CaseInsensitiveStringMap(properties)
    val apiUrl = Option(opts.get("apiurl"))
    val wsUrl = Option(opts.get("wsurl"))
    // wsUrl is only the ARRIVAL SIGNAL — without an HTTP data plane the
    // readers would silently serve deterministic fixture blocks labeled
    // as live chain heads
    require(wsUrl.isEmpty || apiUrl.isDefined,
      "wsUrl requires apiUrl: the subscription only signals arrival; " +
        "headers are fetched over the HTTP data plane")
    new ChainHeadsTable(
      opts.getOrDefault("numblocks", "200").toInt,
      opts.getOrDefault("blocksperbatch", "10").toInt,
      apiUrl, wsUrl,
      opts.getOrDefault("namespace", "xcb"),
      // batchSize: JSON-RPC requests per wire round-trip in the live
      // reader (same knob RpcSource takes — one place to accommodate a
      // rate-limited node); headsNullRetryMs: how long a committed
      // height may answer null (replica lag / reorg window) before the
      // task fails — deployments with slow block times or deep reorgs
      // raise it instead of dying (default ~31s, a block interval)
      opts.getOrDefault("batchsize", "64").toInt,
      opts.getOrDefault("headsnullretryms", "31000").toLong)
  }
}

/** `apiUrl` switches the stream to LIVE mode: each poll asks the node's
  * tip over JSON-RPC (HTTP head-polling — the subscription mode every
  * HTTP provider uses) and releases newly arrived heights, up to
  * `blocksPerBatch` per micro-batch; readers fetch the headers in
  * executor-side batch calls. `wsUrl` upgrades the ARRIVAL SIGNAL to
  * the node's push subscription ([[graft.etl.WsHeads]], the reference's
  * native transport): `latestOffset` drains pushed `newHeads`
  * notifications instead of polling — the data plane stays on the
  * `apiUrl` HTTP fetch either way, exactly how the reference consumes
  * its subscription (a trigger, not the record of truth; etl.rs:
  * 128-173). Without either, the deterministic fixture drives the
  * identical offset/partition shape. `numBlocks` caps the released
  * height in every mode (a test bound; raise or leave default live). */
class ChainHeadsTable(numBlocks: Int, blocksPerBatch: Int,
    apiUrl: Option[String], wsUrl: Option[String] = None,
    namespace: String = "xcb", batchSize: Int = 64,
    headsNullRetryMs: Long = 31000L)
    extends Table with SupportsRead {
  override def name(): String = s"chain_heads($numBlocks)"
  override def schema(): StructType = ChainHeadsSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = ChainHeadsSource.schema
        override def toMicroBatchStream(loc: String): MicroBatchStream =
          new ChainHeadsStream(numBlocks, blocksPerBatch, apiUrl, wsUrl,
            namespace, batchSize, headsNullRetryMs)
      }
    }
}

/** Offset = number of heads released (next height to serve). */
case class HeightOffset(height: Long) extends Offset {
  override def json(): String = height.toString
}

class ChainHeadsStream(numBlocks: Int, blocksPerBatch: Int,
    apiUrl: Option[String], wsUrl: Option[String] = None,
    namespace: String = "xcb", batchSize: Int = 64,
    headsNullRetryMs: Long = 31000L)
    extends MicroBatchStream {

  private var released = 0L
  // driver-side tip probe for live mode — one tiny JSON-RPC call per poll
  @volatile private var rpcOpened = false
  private lazy val rpc = apiUrl.map { u =>
    rpcOpened = true; new graft.etl.RpcClient(u, 5, 200L)
  }
  // push-mode arrival signal: the node's newHeads subscription (lazy so
  // a never-polled stream opens nothing; the flag keeps stop() from
  // forcing a connection just to close it)
  @volatile private var wsOpened = false
  private lazy val wsHeads = wsUrl.map { u =>
    wsOpened = true; new graft.etl.WsHeads(u, namespace)
  }
  private var highestPushed = -1L

  override def initialOffset(): Offset = HeightOffset(0L)

  override def latestOffset(): Offset = {
    // each poll releases up to blocksPerBatch more heads — in live mode
    // bounded ALSO by what the node has actually produced (push mode:
    // the highest header the subscription delivered; poll mode: tip+1),
    // in fixture mode by the simulated arrival
    val available = (wsHeads, rpc) match {
      case (Some(w), _) =>
        w.pollHeaders().foreach { h =>
          highestPushed = math.max(highestPushed,
            graft.etl.RpcCodec.hexToLong(h \ "number" match {
              case org.json4s.JString(s) => s
              case other => sys.error(s"newHeads number: $other")
            }))
        }
        math.min(numBlocks.toLong, highestPushed + 1)
      case (None, Some(c)) =>
        val tip = graft.etl.RpcCodec.hexToLong(
          c.call(s"${namespace}_blockNumber", Nil) match {
            case org.json4s.JString(s) => s
            case other => sys.error(s"blockNumber: $other")
          })
        math.min(numBlocks.toLong, tip + 1)
      case (None, None) => numBlocks.toLong
    }
    // NEVER backwards: a lagging load-balanced node (or post-reorg tip)
    // can report `available` below what this stream already returned —
    // and a restarted query restores a checkpointed offset while
    // `released` restarts at 0. An offset that regresses would make
    // Spark re-plan and re-emit already-committed heights as duplicate
    // rows; the max-clamp (plus seeding in deserializeOffset) pins
    // monotonicity in both cases.
    released = math.max(released,
      math.min(available, released + blocksPerBatch))
    HeightOffset(released)
  }

  override def deserializeOffset(json: String): Offset = {
    // restore path: the engine hands back the checkpointed offset —
    // seed the in-memory cursor so the monotonic clamp above holds
    // across restarts
    released = math.max(released, json.toLong)
    HeightOffset(json.toLong)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[HeightOffset].height
    val e = end.asInstanceOf[HeightOffset].height
    if (e <= s) Array.empty
    else Array(HeadsRange(s, e, numBlocks, apiUrl, namespace, batchSize,
      headsNullRetryMs))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new HeadsReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = {
    if (wsOpened) wsHeads.foreach(_.close())
    if (rpcOpened) rpc.foreach(_.close())
  }
}

case class HeadsRange(from: Long, until: Long, numBlocks: Int,
    apiUrl: Option[String], namespace: String = "xcb",
    batchSize: Int = 64, nullRetryMs: Long = 31000L)
    extends InputPartition

class HeadsReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[HeadsRange]
    r.apiUrl match {
      case Some(u) => new PartitionReader[InternalRow] {
        // live mode: headers for this range in batched JSON-RPC
        // round-trips (hash-only block fetch — no tx payload). A null
        // answer (lagging load-balanced replica, reorg window) CANNOT
        // be skipped here: the offset range [from,until) is already
        // committed and Spark never re-plans committed offsets, so a
        // dropped height would be permanently missing from the stream.
        // The head was announced, so the block should materialize —
        // retry the nulls with capped backoff for `nullRetryMs` (default
        // ~31 s, about a block interval: a reorged-away height only
        // re-fills when the chain re-extends past it; deployments with
        // slower blocks or deeper reorgs raise the option), then fail
        // the task (Spark retries the partition) rather than lose data
        // silently.
        private val rows = {
          import org.json4s.{JBool, JNothing, JNull, JString, JValue}
          val c = new graft.etl.RpcClient(u, 5, 200L)
          // chunked batch calls (`batchSize` requests per round-trip): a
          // large blocksPerBatch must not become one unbounded JSON-RPC
          // batch a node may reject
          def fetch(hs: Seq[Long]): Map[Long, JValue] =
            hs.grouped(r.batchSize).flatMap { chunk =>
              chunk.zip(c.callBatch(chunk.map(h =>
                  (s"${r.namespace}_getBlockByNumber",
                    List(JString(graft.etl.RpcCodec.longToHex(h)),
                      JBool(false))))))
            }.collect { case (h, j) if j != JNull && j != JNothing =>
              h -> j }.toMap
          val all = r.from until r.until
          var got = fetch(all)
          var attempt = 0
          val deadline = System.currentTimeMillis() + r.nullRetryMs
          // 200,400,...ms capped at 5s per sleep, bounded by the budget
          while (got.size < all.size &&
              System.currentTimeMillis() < deadline) {
            attempt += 1
            Thread.sleep(math.max(0L, math.min(
              math.min(200L << math.min(attempt - 1, 24), 5000L),
              deadline - System.currentTimeMillis())))
            got ++= fetch(all.filterNot(got.contains))
          }
          val missing = all.filterNot(got.contains)
          if (missing.nonEmpty) {
            c.close()
            throw new RuntimeException(
              s"committed heads ${missing.mkString(",")} still null after " +
                s"$attempt retries (headsNullRetryMs=${r.nullRetryMs}) — " +
                "failing the task so Spark re-reads the partition instead " +
                "of dropping announced heights")
          }
          c.close() // all fetching above is eager; release the transport
          all.iterator.map { h =>
            val b = graft.etl.RpcCodec.decodeBlock(got(h))
            InternalRow(b.number, UTF8String.fromString(b.hash),
              UTF8String.fromString(b.parent_hash))
          }
        }
        override def next(): Boolean = rows.hasNext
        override def get(): InternalRow = rows.next()
        override def close(): Unit = ()
      }
      case None => new PartitionReader[InternalRow] {
        // the fixture is deterministic: rebuilding per partition keeps
        // the factory serialization-free
        private val blocks = ChainFixture.build(r.numBlocks).blocks
        private var i = r.from - 1
        override def next(): Boolean = { i += 1; i < r.until }
        override def get(): InternalRow = {
          val b = blocks(i.toInt)
          InternalRow(b.number, UTF8String.fromString(b.hash),
            UTF8String.fromString(b.parent_hash))
        }
        override def close(): Unit = ()
      }
    }
  }
}
