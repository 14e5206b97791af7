package graft.sources.http.testkit

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

/** Embedded JSON endpoint (JDK HttpServer, offline-safe) shipping with the
  * library so harness queries and tests can exercise the `http-full-cache`
  * source without network egress. Stands in for the reference's
  * Testcontainers MockServer (ref: HttpLookupConnectorIntegrationTest.scala:32-55):
  * mutable payload, request counter, and programmable 500-failures.
  */
final class EmbeddedJsonServer {
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  private val hits = new AtomicInteger(0)
  @volatile var payload: String = "[]"
  /** Requests 1..failFirst return 500. */
  @volatile var failFirst: Int = 0
  /** All requests from now on return 500. */
  @volatile var failForever: Boolean = false

  server.createContext("/data", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val n = hits.incrementAndGet()
      val fail = failForever || n <= failFirst
      val (code, body) =
        if (fail) (500, """{"error": "Internal Server Error"}""")
        else (200, payload)
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
  })
  server.start()

  def url: String = s"http://127.0.0.1:${server.getAddress.getPort}/data"
  def requestCount: Int = hits.get()
  def resetCount(): Unit = hits.set(0)
  def stop(): Unit = server.stop(0)
}
