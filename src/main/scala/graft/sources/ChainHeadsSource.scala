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
      properties: util.Map[String, String]): Table =
    new ChainHeadsTable(
      properties.getOrDefault("numblocks", "200").toInt,
      properties.getOrDefault("blocksperbatch", "10").toInt)
}

class ChainHeadsTable(numBlocks: Int, blocksPerBatch: Int)
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
          new ChainHeadsStream(numBlocks, blocksPerBatch)
      }
    }
}

/** Offset = number of heads released (next height to serve). */
case class HeightOffset(height: Long) extends Offset {
  override def json(): String = height.toString
}

class ChainHeadsStream(numBlocks: Int, blocksPerBatch: Int)
    extends MicroBatchStream {

  private var released = 0L

  override def initialOffset(): Offset = HeightOffset(0L)

  override def latestOffset(): Offset = {
    // each poll releases up to blocksPerBatch more heads (simulated arrival)
    released = math.min(numBlocks.toLong, released + blocksPerBatch)
    HeightOffset(released)
  }

  override def deserializeOffset(json: String): Offset =
    HeightOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[HeightOffset].height
    val e = end.asInstanceOf[HeightOffset].height
    if (e <= s) Array.empty
    else Array(HeadsRange(s, e, numBlocks))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new HeadsReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class HeadsRange(from: Long, until: Long, numBlocks: Int)
    extends InputPartition

class HeadsReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[HeadsRange]
    new PartitionReader[InternalRow] {
      // the fixture is deterministic: rebuilding per partition keeps the
      // factory serialization-free (a real source would open an RPC
      // connection here instead)
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
