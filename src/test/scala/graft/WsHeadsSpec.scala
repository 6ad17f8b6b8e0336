package graft

import java.nio.charset.StandardCharsets

import graft.chain.ChainFixture
import graft.etl.{RpcCodec, WsHeads}
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** [[WsHeads]] — the newHeads push subscription — driven against an
  * in-process RFC 6455 server (the WebSocket protocol is public and a
  * minimal server is ~100 lines: HTTP Upgrade handshake with the
  * SHA-1/base64 accept key, masked client→server frames, unmasked
  * server→client text frames). The server speaks the node pubsub
  * protocol from the same fixture the HTTP specs use, so both
  * transports are covered end-to-end with zero network egress:
  *
  *  - subscribe → ack → pushed notifications arrive in order;
  *  - the streaming heads source in push mode (`wsUrl` arrival signal
  *    + `apiUrl` data plane) collects every fixture head;
  *  - connect retry against a server that refuses first connections.
  */
class WsHeadsSpec extends AnyFunSuite with BeforeAndAfterAll
    with TempDirCleanup {

  lazy val spark: org.apache.spark.sql.SparkSession =
    GraftSession.builder("local[4]", 4).getOrCreate()

  private lazy val fx = ChainFixture.build(40)

  override def afterAll(): Unit = {
    servers.foreach(s => try s.close() catch { case _: Throwable => () })
    spark.stop()
    super.afterAll()
  }

  private val servers =
    scala.collection.mutable.ArrayBuffer.empty[TinyWsServer]

  private def headerJson(b: graft.chain.Block): String =
    JsonMethods.compact(JObject(
      "jsonrpc" -> JString("2.0"),
      "method" -> JString("xcb_subscription"),
      "params" -> JObject(
        "subscription" -> JString("0xfeed01"),
        "result" -> RpcCodec.encodeBlock(b, Nil, full = false))))

  /** A pubsub node on the shared [[TinyWsServer]]: on `*_subscribe` it
    * acks with a subscription id and pushes that connection's headers
    * (`pushByConnection` override, else `pushOnSubscribe`); connections
    * in `dropConnections` are dropped abruptly right after pushing. */
  private def subscribeServer(pushOnSubscribe: Seq[String],
      refuseFirst: Int = 0,
      pushByConnection: Map[Int, Seq[String]] = Map.empty,
      dropConnections: Set[Int] = Set.empty): TinyWsServer =
    new TinyWsServer((connIdx, text, send) => {
      if (text.contains("_subscribe")) {
        send("""{"jsonrpc":"2.0","id":1,"result":"0xfeed01"}""")
        pushByConnection.getOrElse(connIdx, pushOnSubscribe).foreach(send)
        !dropConnections(connIdx)
      } else true
    }, refuseFirst)

  test("subscribe, ack, and pushed newHeads arrive in order") {
    val srv = subscribeServer(fx.blocks.take(5).map(headerJson))
    servers += srv
    val ws = new WsHeads(srv.url)
    try {
      val got = Iterator.continually(ws.pollHeaders(waitMs = 2000))
        .take(10).flatten.take(5).toSeq
      assert(got.size == 5, s"expected 5 pushed headers, got ${got.size}")
      assert(ws.subscription.contains("0xfeed01"))
      assert(got.map(h => RpcCodec.hexToLong(
        h \ "number" match { case JString(s) => s; case _ => "" })) ==
        (0L until 5L))
      assert(got.map(h => RpcCodec.unhexField(h \ "hash")) ==
        fx.blocks.take(5).map(_.hash))
    } finally ws.close()
  }

  test("connect retry survives refused connections") {
    val srv = subscribeServer(Nil, refuseFirst = 2)
    servers += srv
    val ws = new WsHeads(srv.url, retryBackoffMs = 50L)
    try assert(ws.pollHeaders(waitMs = 10) == Nil) // connected, no pushes
    finally ws.close()
  }

  test("dropped connection: pollHeaders reconnects and resubscribes " +
      "instead of returning empty forever") {
    val headers = fx.blocks.take(5).map(headerJson)
    val srv = subscribeServer(Nil,
      pushByConnection = Map(0 -> headers.take(3), 1 -> headers.drop(3)),
      dropConnections = Set(0))
    servers += srv
    val ws = new WsHeads(srv.url, retryBackoffMs = 50L)
    try {
      // connection 0 pushes heads 0-2 then drops the socket abruptly
      val first = Iterator.continually(ws.pollHeaders(waitMs = 2000))
        .take(10).flatten.take(3).toSeq
      assert(first.size == 3, s"expected 3 heads before the drop")
      // subsequent polls must notice the dead connection, reconnect and
      // resubscribe (connection 1 pushes heads 3-4 on subscribe). The
      // deadline is generous — the loop exits on success, so its only
      // cost is on genuine failure — because a loaded box (parallel
      // suites + external load) can starve the reconnect for seconds
      // and a wall-clock flake here would misreport the retry logic
      val deadline = System.currentTimeMillis() + 30000
      var rest = Seq.empty[JValue]
      while (rest.size < 2 && System.currentTimeMillis() < deadline)
        rest = rest ++ ws.pollHeaders(waitMs = 500)
      assert(rest.size == 2,
        s"reconnect did not resubscribe: got ${rest.size} post-drop heads")
      assert((first ++ rest).map(h => RpcCodec.hexToLong(
        h \ "number" match { case JString(s) => s; case _ => "" })) ==
        (0L until 5L))
    } finally ws.close()
  }

  test("heads stream in push mode: WS arrival signal + HTTP data plane " +
      "deliver every fixture head") {
    // WS server pushes all 40 headers on subscribe; the HTTP server
    // (same wire codec as RpcSourceSpec's) serves the header fetches
    val wsSrv = subscribeServer(fx.blocks.map(headerJson))
    servers += wsSrv
    val http = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    http.createContext("/", { exchange =>
      val body = new String(exchange.getRequestBody.readAllBytes(),
        StandardCharsets.UTF_8)
      def handle(req: JValue): JValue = {
        val n = RpcCodec.hexToLong(
          (req \ "params")(0).asInstanceOf[JString].s)
        JObject("jsonrpc" -> JString("2.0"), "id" -> (req \ "id"),
          "result" -> RpcCodec.encodeBlock(fx.blocks(n.toInt), Nil,
            full = false))
      }
      val resp = JsonMethods.parse(body) match {
        case JArray(reqs) => JsonMethods.compact(JArray(reqs.map(handle)))
        case one => JsonMethods.compact(handle(one))
      }
      val bytes = resp.getBytes(StandardCharsets.UTF_8)
      exchange.sendResponseHeaders(200, bytes.length.toLong)
      exchange.getResponseBody.write(bytes)
      exchange.close()
    })
    http.start()
    try {
      val q = spark.readStream
        .format("graft.sources.ChainHeadsProvider")
        .option("numBlocks", "40")
        .option("blocksPerBatch", "15")
        .option("wsUrl", wsSrv.url)
        .option("apiUrl", s"http://127.0.0.1:${http.getAddress.getPort}/")
        .load()
        .writeStream.format("memory").queryName("ws_heads")
        .option("checkpointLocation", tempDir("graft-ws-heads-ckpt"))
        .start()
      try {
        // push arrival is asynchronous: keep draining until all 40 land
        val deadline = System.currentTimeMillis() + 30000
        var n = 0L
        while (n < 40 && System.currentTimeMillis() < deadline) {
          q.processAllAvailable()
          n = spark.table("ws_heads").count()
          if (n < 40) Thread.sleep(100)
        }
      } finally q.stop()
      val got = spark.table("ws_heads").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      val want = fx.blocks.map(b => (b.number, b.hash, b.parent_hash)).toSet
      assert(got == want, s"missing=${(want -- got).take(3)} " +
        s"extra=${(got -- want).take(3)}")
    } finally http.stop(0)
  }
}
