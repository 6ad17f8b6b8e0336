package graft.chain

import graft.functions.Cbc20
import graft.functions.Cbc20.cbc20_decode
import org.apache.spark.sql.Column

/** Pluggable contract-decoder registry (OP-EXT-1).
  *
  * The reference dispatches per contract name to a `SmartContract` impl
  * (`/root/reference/crates/contracts/src/transfer.rs:1-19`,
  * etl.rs:402-411; `cbc20` is the only registered type, constants.rs:1).
  * Here a contract type contributes two column-level pieces: the selector
  * predicate (OP-FIL-8) and the decode Generator (OP-UDTF-1). Adding a
  * token standard = registering one more `ContractDecoder` — the pipeline
  * code never changes.
  */
final case class ContractDecoder(
    name: String,
    /** calldata selector predicate over the `input` column */
    isCall: Column => Column,
    /** (sender, input) -> generator emitting
      * (transfer_index, from_addr, to_addr, value) rows */
    decode: (Column, Column) => Column)

object ContractRegistry {

  val cbc20: ContractDecoder =
    ContractDecoder("cbc20", Cbc20.isTransferCall, cbc20_decode)

  private var registry: Map[String, ContractDecoder] = Map("cbc20" -> cbc20)

  def register(d: ContractDecoder): Unit = synchronized {
    registry += (d.name -> d)
  }

  /** Unknown contract names fail fast, mirroring the reference's panic
    * (etl.rs:410) at plan-construction time rather than mid-job. */
  def apply(name: String): ContractDecoder =
    registry.getOrElse(name,
      throw new IllegalArgumentException(s"Unknown contract type: $name"))

  def names: Set[String] = registry.keySet
}
