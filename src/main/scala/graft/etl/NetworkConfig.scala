package graft.etl

/** Network identity presets (reference `crates/types/src/network.rs:4-17`,
  * `bin/core-etl/src/export.rs:52`): the id the node reports
  * (`get_network_id`), which keys the token-address presets, and the
  * network's default public node endpoint (`network.rs:11-17`) so
  * `export --network devin` needs no explicit URL.
  */
sealed abstract class Network(val name: String, val id: Long,
    val url: String)

object Network {
  case object Mainnet
    extends Network("mainnet", 1L, "wss://xcbws.coreblockchain.net")
  case object Devin
    extends Network("devin", 3L, "wss://xcbws-devin.coreblockchain.net")

  val all: Seq[Network] = Seq(Mainnet, Devin)

  def parse(s: String): Network =
    all.find(_.name == s.toLowerCase).getOrElse(
      throw new IllegalArgumentException(
        s"unknown network: $s (expected ${all.map(_.name).mkString("|")})"))

  /** The effective node endpoint (reference app_config.rs): an explicit
    * `--api-url` wins; else a named `--network` resolves its preset
    * URL. None → the deterministic fixture. Two deliberate deviations
    * from app_config.rs:9-27, both sandbox-sanity: the reference
    * DEFAULTS to the mainnet URL with no flags at all (an engine that
    * always dialed out would fail every offline run), and its network
    * preset overrides even an explicit rpc_url (surprising precedence;
    * here the explicit endpoint stays authoritative). */
  def resolveNodeUrl(apiUrl: Option[String],
      network: Option[String]): Option[String] =
    apiUrl.orElse(network.map(parse(_).url))
}

/** `--watch-tokens` parsing (reference `bin/core-etl/src/export.rs:88-114`):
  * each spec is either `type:address` or the predefined `ctn` preset,
  * which resolves to the CoreToken address of the current network. The
  * result maps contract type → watched addresses; each type dispatches to
  * its [[graft.chain.ContractRegistry]] decoder at ingest.
  */
object WatchTokens {

  /** network id → CTN contract address (export.rs:96-107). */
  val CtnPreset: Map[Long, String] = Map(
    Network.Mainnet.id -> "cb19c7acc4c292d2943ba23c2eaa5d9c5a6652a8710c",
    Network.Devin.id -> "ab7935cdef94ac9e6bcbcf779277aad7025993bc1964")

  /** Default watch set when no `--watch-tokens` is given: the fixture's
    * watched CBC-20 token (== the mainnet CTN preset). */
  val Default: Map[String, Seq[String]] =
    Map("cbc20" -> Seq(CtnPreset(Network.Mainnet.id)))

  /** Parse specs into type → addresses. A `ctn` preset on a network with
    * no registered address contributes nothing (the reference's silent
    * fall-through, export.rs:95-108). Malformed specs fail fast. */
  def parse(networkId: Long, specs: Seq[String]): Map[String, Seq[String]] =
    specs.filter(_.nonEmpty).foldLeft(Map.empty[String, Seq[String]]) {
      (m, spec) =>
        val resolved: Option[(String, String)] =
          if (spec == "ctn") CtnPreset.get(networkId).map(("cbc20", _))
          else spec.split(":", 2) match {
            case Array(t, a) if t.nonEmpty && a.nonEmpty => Some((t, a))
            case _ => throw new IllegalArgumentException(
              s"bad --watch-tokens spec: '$spec' (expected type:address or ctn)")
          }
        resolved.fold(m) { case (tpe, addr) =>
          m.updated(tpe, (m.getOrElse(tpe, Seq.empty) :+ addr).distinct)
        }
    }
}
