package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.Executors
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.core.{Bytes, StorageKey}
import graft.pipeline.Fixtures

/** Loopback (127.0.0.1, ephemeral port) test double for the live RPC
  * connector: serves the deterministic fixture proofs as real
  * `eth_getProof` JSON-RPC over real HTTP — the connector under test
  * walks the full socket → retry → parse → normalize → verify path
  * with zero network egress (the reference's own tests hit live
  * endpoints, `mrp2-test-utils/src/eth.rs:14-30`; a dev container
  * cannot, so the endpoint is in-process).
  *
  * `failFirst` makes the first N hits answer HTTP 500 — the retry/
  * backoff path under test. Unknown locations answer an RPC-level
  * error object (HTTP 200), the other failure mode a real provider
  * exhibits.
  */
final class FixtureRpcServer(cfg: Fixtures.Cfg = Fixtures.Cfg(), failFirst: Int = 0) {

  /** (block, storage location hex) → fixture proof. */
  private val proofs: Map[(Long, String), Fixtures.ProofRow] =
    Fixtures.storageProofsSeq(cfg).map { p =>
      (p.block_number,
        Bytes.toHex(StorageKey.mappingLocation(p.mapping_key, p.mapping_slot)).toLowerCase) -> p
    }.toMap

  val hits = new AtomicInteger(0)

  private val ParamsRe =
    """"params":\["0x([0-9a-fA-F]+)",\["0x([0-9a-fA-F]+)"\],"0x([0-9a-fA-F]+)"\]""".r.unanchored

  private def quantityHex(b: Array[Byte]): String = {
    val h = Bytes.toHex(b).dropWhile(_ == '0')
    "0x" + (if (h.isEmpty) "0" else h)
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  // DAEMON pool: HttpServer.stop() does not shut down a user-supplied
  // executor, and non-daemon workers would pin the JVM open after main
  private val pool = Executors.newFixedThreadPool(8, r => {
    val t = new Thread(r, "fixture-rpc")
    t.setDaemon(true)
    t
  })
  server.setExecutor(pool) // concurrent Spark tasks
  server.createContext("/", (ex: HttpExchange) => {
    val n = hits.incrementAndGet()
    val req = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    if (n <= failFirst) respond(ex, 500, """{"error":"transient"}""")
    else req match {
      case ParamsRe(_, loc, blockHex) =>
        proofs.get((java.lang.Long.parseLong(blockHex, 16), loc.toLowerCase)) match {
          case Some(p) =>
            val nodes = p.nodes.map(x => "\"0x" + Bytes.toHex(x) + "\"").mkString(",")
            respond(ex, 200,
              s"""{"jsonrpc":"2.0","id":1,"result":{""" +
                s""""address":"0x${Bytes.toHex(p.contract)}",""" +
                s""""storageHash":"0x${Bytes.toHex(p.mpt_root)}",""" +
                s""""accountProof":[],""" +
                s""""storageProof":[{"key":"0x$loc",""" +
                s""""value":"${quantityHex(p.value)}","proof":[$nodes]}]}}""")
          case None =>
            respond(ex, 200,
              """{"jsonrpc":"2.0","id":1,"error":{"code":-32000,"message":"proof not found"}}""")
        }
      case _ =>
        respond(ex, 200,
          """{"jsonrpc":"2.0","id":1,"error":{"code":-32602,"message":"malformed params"}}""")
    }
  })

  def start(): String = {
    server.start()
    s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  def stop(): Unit = {
    server.stop(0)
    pool.shutdown()
  }
}
