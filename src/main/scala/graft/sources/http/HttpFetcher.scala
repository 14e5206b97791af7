package graft.sources.http

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.internal.Logging
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.{HttpURLConnection, URI}
import java.time.Duration

/** One full-snapshot load: GET with bounded retry → JSON tree → RFC 6901
  * pointer extraction → array fan-out → rows against the (pruned) schema.
  *
  * Behavioral parity with the reference scan
  * (ref: HttpInputFormatProvider.scala:83-172):
  *  - non-200 → RuntimeException "HTTP request failed with status N. ..."
  *    which triggers a retry; exhaustion → RuntimeException
  *    "Failed to fetch data from <url> after <n> retries" with last cause;
  *  - unparseable body → "Failed to parse JSON response";
  *  - pointer is Jackson `.at()` RFC 6901 ("" = whole document, JsonPath
  *    `$.a.b` syntax deliberately NOT supported); missing node → error;
  *  - array node → one row per element; non-array → exactly one row.
  */
object HttpFetcher extends Logging {

  /** HTTP GET with retry; the single network side-effect per cache load. */
  def fetchBody(opts: HttpOptions): String = {
    val client = HttpClient.newBuilder()
      .connectTimeout(Duration.ofSeconds(opts.connectTimeoutSeconds))
      .followRedirects(HttpClient.Redirect.NORMAL)
      .build()
    fetchWithRetry(client, opts)
  }

  /** Pointer-extract + fan-out + deserialize a fetched body against the
    * (possibly pruned) schema. Pure; no I/O. */
  def parseRows(body: String, opts: HttpOptions, schema: StructType): Array[InternalRow] = {
    val mapper = new ObjectMapper()
    val tree =
      try mapper.readTree(body)
      catch { case e: Exception => throw new RuntimeException("Failed to parse JSON response", e) }
    val selected = if (opts.xpath.isEmpty) tree else tree.at(opts.xpath)
    if (selected.isMissingNode)
      throw new RuntimeException(
        s"JSON Pointer '${opts.xpath}' did not match any node in the response")
    if (selected.isArray) {
      val out = new Array[InternalRow](selected.size())
      var i = 0
      val it = selected.elements()
      while (it.hasNext) { out(i) = JsonRows.toRow(it.next(), schema); i += 1 }
      out
    } else Array(JsonRows.toRow(selected, schema))
  }

  private def fetchWithRetry(client: HttpClient, opts: HttpOptions): String = {
    var lastError: Exception = null
    var attempt = 0
    while (attempt <= opts.maxRetries) {
      try {
        val request = HttpRequest.newBuilder()
          .uri(URI.create(opts.url))
          .timeout(Duration.ofSeconds(opts.readTimeoutSeconds))
          .GET() // `method` option is accepted but GET-only, like the reference
          .build()
        val response = client.send(request, HttpResponse.BodyHandlers.ofString())
        if (response.statusCode() == HttpURLConnection.HTTP_OK) return response.body()
        throw new RuntimeException(
          s"HTTP request failed with status ${response.statusCode()}. Response body: ${response.body()}")
      } catch {
        case e: Exception =>
          lastError = e
          attempt += 1
          if (attempt <= opts.maxRetries) {
            logWarning(s"Attempt $attempt failed to fetch data from ${opts.url}. " +
              s"Retrying in ${opts.retryDelayMs}ms...", e)
            Thread.sleep(opts.retryDelayMs)
          }
      }
    }
    throw new RuntimeException(
      s"Failed to fetch data from ${opts.url} after ${opts.maxRetries} retries", lastError)
  }
}
