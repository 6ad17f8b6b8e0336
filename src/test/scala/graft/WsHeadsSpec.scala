package graft

import java.io.{DataInputStream, DataOutputStream}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

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

  /** Minimal RFC 6455 server: one handshake per connection, text frames
    * only. On a `*_subscribe` request it acks with a subscription id and
    * then pushes `pushOnSubscribe` notifications. `refuseFirst`
    * connections are dropped before the handshake (retry injection). */
  private final class TinyWsServer(pushOnSubscribe: Seq[String],
      refuseFirst: Int = 0) extends AutoCloseable {
    private val refusals = new AtomicInteger(refuseFirst)
    private val server = new ServerSocket(0, 4,
      java.net.InetAddress.getByName("127.0.0.1"))
    val url = s"ws://127.0.0.1:${server.getLocalPort}/"

    private val acceptor = new Thread(() => {
      try while (!server.isClosed) {
        val sock = server.accept()
        if (refusals.getAndUpdate(n => math.max(n - 1, 0)) > 0) sock.close()
        else new Thread(() => try serve(sock) finally sock.close()).start()
      } catch { case _: Throwable => () } // closed
    })
    acceptor.setDaemon(true)
    acceptor.start()

    private def serve(sock: java.net.Socket): Unit = {
      val in = new DataInputStream(sock.getInputStream)
      val out = new DataOutputStream(sock.getOutputStream)
      // --- HTTP Upgrade handshake ---
      val lines = Iterator.continually {
        val sb = new StringBuilder
        var c = in.read()
        while (c != -1 && c != '\n') { if (c != '\r') sb.append(c.toChar); c = in.read() }
        sb.toString
      }.takeWhile(_.nonEmpty).toList
      val key = lines.collectFirst {
        case l if l.toLowerCase.startsWith("sec-websocket-key:") =>
          l.split(":", 2)(1).trim
      }.getOrElse(sys.error("no Sec-WebSocket-Key"))
      val accept = java.util.Base64.getEncoder.encodeToString(
        java.security.MessageDigest.getInstance("SHA-1").digest(
          (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11")
            .getBytes(StandardCharsets.US_ASCII)))
      out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
        "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
        s"Sec-WebSocket-Accept: $accept\r\n\r\n")
        .getBytes(StandardCharsets.US_ASCII))
      out.flush()
      // --- frame loop ---
      var open = true
      while (open) {
        val b0 = in.read()
        if (b0 == -1) open = false
        else {
          val opcode = b0 & 0x0f
          val b1 = in.read()
          val masked = (b1 & 0x80) != 0
          var len: Long = b1 & 0x7f
          if (len == 126) len = in.readUnsignedShort().toLong
          else if (len == 127) len = in.readLong()
          val mask = if (masked) {
            val m = new Array[Byte](4); in.readFully(m); m
          } else null
          val payload = new Array[Byte](len.toInt)
          in.readFully(payload)
          if (masked)
            payload.indices.foreach(i =>
              payload(i) = (payload(i) ^ mask(i % 4)).toByte)
          opcode match {
            case 0x1 => // text
              val text = new String(payload, StandardCharsets.UTF_8)
              if (text.contains("_subscribe")) {
                sendText(out, """{"jsonrpc":"2.0","id":1,"result":"0xfeed01"}""")
                pushOnSubscribe.foreach(sendText(out, _))
              }
            case 0x8 => // close: echo and finish
              out.write(Array(0x88.toByte, 0x00.toByte)); out.flush()
              open = false
            case 0x9 => // ping → pong
              out.write(0x8a); out.write(payload.length)
              out.write(payload); out.flush()
            case _ => ()
          }
        }
      }
    }

    private def sendText(out: DataOutputStream, text: String): Unit =
      out.synchronized {
        val bytes = text.getBytes(StandardCharsets.UTF_8)
        out.write(0x81)
        if (bytes.length < 126) out.write(bytes.length)
        else if (bytes.length < 65536) {
          out.write(126); out.writeShort(bytes.length)
        } else { out.write(127); out.writeLong(bytes.length.toLong) }
        out.write(bytes)
        out.flush()
      }

    override def close(): Unit = server.close()
  }

  private def headerJson(b: graft.chain.Block): String =
    JsonMethods.compact(JObject(
      "jsonrpc" -> JString("2.0"),
      "method" -> JString("xcb_subscription"),
      "params" -> JObject(
        "subscription" -> JString("0xfeed01"),
        "result" -> RpcCodec.encodeBlock(b, Nil, full = false))))

  test("subscribe, ack, and pushed newHeads arrive in order") {
    val srv = new TinyWsServer(fx.blocks.take(5).map(headerJson))
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
    val srv = new TinyWsServer(Nil, refuseFirst = 2)
    servers += srv
    val ws = new WsHeads(srv.url, retryBackoffMs = 50L)
    try assert(ws.pollHeaders(waitMs = 10) == Nil) // connected, no pushes
    finally ws.close()
  }

  test("heads stream in push mode: WS arrival signal + HTTP data plane " +
      "deliver every fixture head") {
    // WS server pushes all 40 headers on subscribe; the HTTP server
    // (same wire codec as RpcSourceSpec's) serves the header fetches
    val wsSrv = new TinyWsServer(fx.blocks.map(headerJson))
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
