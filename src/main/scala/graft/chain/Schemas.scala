package graft.chain

/** Entity schemas of the chain data model (SURVEY §1.2).
  *
  * Column names, types, and sentinel conventions mirror the reference DDL
  * (`/root/reference/crates/storage/sqlite3/src/sqlite3.rs:67-108,247-261`;
  * Rust structs `crates/types/src/block.rs:6-27`, `transaction.rs:6-21`,
  * `token_transfer.rs:4-17`):
  *  - hex columns are lowercase, no `0x` prefix;
  *  - U256 magnitudes (`difficulty`, `value`, `energy*`) are decimal
  *    strings (`block.rs:32`, `transaction.rs:28-37`);
  *  - token-transfer `value` stays the raw 64-hex-digit calldata slice
  *    (`cbc20.rs:44`);
  *  - missing values use sentinels, not NULL: `to_addr=""` for contract
  *    creation, zero-hash `block_hash` for pending, 0 for absent numbers
  *    (`transaction.rs:26-35`).
  */
final case class Block(
    number: Long,
    hash: String,
    parent_hash: String,
    nonce: String,
    sha3_uncles: String,
    logs_bloom: String,
    transactions_root: String,
    state_root: String,
    receipts_root: String,
    miner: String,
    difficulty: String,
    total_difficulty: String,
    extra_data: String,
    energy_limit: Long,
    energy_used: Long,
    timestamp: Long,
    transaction_count: Long,
    matured: Int)

final case class Transaction(
    hash: String,
    nonce: String,
    block_hash: String,
    block_number: Long,
    transaction_index: Long,
    from_addr: String,
    to_addr: String,
    value: String,
    energy: String,
    energy_price: String,
    input: String)

final case class TokenTransfer(
    block_number: Long,
    from_addr: String,
    to_addr: String,
    value: String,
    tx_hash: String,
    address: String,
    transfer_index: Long,
    status: Int)

final case class Receipt(tx_hash: String, status: Boolean)

/** TransferType query enum (`crates/types/src/transfer_type.rs:2-10`). */
sealed trait TransferType
object TransferType {
  case object From extends TransferType
  case object To extends TransferType
  case object All extends TransferType
}
