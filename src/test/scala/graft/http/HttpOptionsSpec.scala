package graft.http

import graft.sources.http.HttpOptions
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Option parsing/validation parity with the reference factory tests
  * (ref: HttpLookupTableSourceFactoryTest.scala:19-141). */
class HttpOptionsSpec extends AnyFunSuite {

  private def parse(kv: (String, String)*): HttpOptions =
    HttpOptions.parse(kv.toMap.asJava)

  test("happy path with minimal options applies defaults") {
    val o = parse("url" -> "http://x/users")
    assert(o.url == "http://x/users")
    assert(o.xpath == "")
    assert(o.refreshInterval == java.time.Duration.parse("PT5M")) // code default, not README's PT1H
    assert(o.method == "GET")
    assert(o.connectTimeoutSeconds == 10)
    assert(o.readTimeoutSeconds == 30)
    assert(o.maxRetries == 3)
    assert(o.retryDelayMs == 1000L)
  }

  test("all options are stored") {
    val o = parse(
      "url" -> "http://x", "xpath" -> "/data/users",
      "cache.refresh-interval" -> "PT30S", "method" -> "POST",
      "connect.timeout.seconds" -> "5", "read.timeout.seconds" -> "15",
      "max.retries" -> "7", "retry.delay.ms" -> "250")
    assert(o.xpath == "/data/users")
    assert(o.refreshInterval.getSeconds == 30)
    assert(o.method == "POST") // accepted but GET-only at runtime (dead config in reference too)
    assert(o.connectTimeoutSeconds == 5 && o.readTimeoutSeconds == 15)
    assert(o.maxRetries == 7 && o.retryDelayMs == 250L)
  }

  test("missing url is rejected") {
    val e = intercept[IllegalArgumentException](parse("xpath" -> ""))
    assert(e.getMessage.contains("url"))
  }

  test("invalid ISO-8601 duration is rejected with key name") {
    val e = intercept[IllegalArgumentException](
      parse("url" -> "http://x", "cache.refresh-interval" -> "5 minutes"))
    assert(e.getMessage.contains("cache.refresh-interval"))
    assert(e.getMessage.contains("ISO-8601"))
  }

  test("non-positive timeouts are rejected") {
    for (k <- Seq("connect.timeout.seconds", "read.timeout.seconds", "retry.delay.ms")) {
      val e = intercept[IllegalArgumentException](parse("url" -> "http://x", k -> "0"))
      assert(e.getMessage.contains(k))
    }
  }

  test("negative max.retries rejected, zero allowed") {
    val e = intercept[IllegalArgumentException](parse("url" -> "http://x", "max.retries" -> "-1"))
    assert(e.getMessage.contains("max.retries"))
    assert(parse("url" -> "http://x", "max.retries" -> "0").maxRetries == 0)
  }

  test("unknown options are rejected") {
    val e = intercept[IllegalArgumentException](parse("url" -> "http://x", "bogus.key" -> "1"))
    assert(e.getMessage.contains("bogus.key"))
  }

  test("non-integer numerics are rejected") {
    val e = intercept[IllegalArgumentException](
      parse("url" -> "http://x", "max.retries" -> "three"))
    assert(e.getMessage.contains("max.retries"))
  }
}
