package graft.queries

import graft.Tables
import graft.enrich.Enrich
import graft.sources.http.testkit.EmbeddedJsonServer
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's flagship capability as a harness query: enrich an events
  * stream with a user table served over HTTP, via the full-cache source +
  * broadcast lookup join (ref: README.md:57-64, FlinkHttpConnectorExample).
  *
  * The served payload is a pure function of user_id (ids 0..99), so the
  * DuckDB oracle reproduces the LEFT lookup join arithmetically — a
  * value-checked HTTP query with zero egress. ids >= 100 miss the cache and
  * exercise the null-emitting LEFT path.
  */
object HttpEnrichment {

  type Q = (SparkSession, String) => DataFrame

  private def usersPayload: String =
    (0 until 100).map { i =>
      s"""{"id": $i, "name": "User $i", "username": "u$i", "email": "user$i@example.com"}"""
    }.mkString("[", ",", "]")

  /** JVM-scoped embedded endpoint serving the users payload: lives as long
    * as the process (stopped by a shutdown hook), so the returned frame
    * stays lazily consumable like every other harness query — no eager
    * collect, and repeat runs share one TTL-cached fetch. */
  lazy val usersServer: EmbeddedJsonServer = {
    val s = new EmbeddedJsonServer
    s.payload = usersPayload
    sys.addShutdownHook(s.stop())
    s
  }

  val queries: Map[String, Q] = Map(
    "h01_http_enrich_join" -> { (s, dir) =>
      val users = s.read.format("http-full-cache")
        .schema("id INT, name STRING, username STRING, email STRING")
        .option("url", usersServer.url)
        .load()
      val ev = Tables.events(s, dir)
      Enrich.lookupJoin(ev, users, ev("user_id") === users("id"), "left")
        .groupBy("user_id", "name")
        .agg(count(lit(1)).as("n_events"),
             Tables.dsum(col("value")).as("sum_value"))
        .orderBy("user_id")
    }
  )

  val oracle: Map[String, String] = Map(
    // The join is reproduced arithmetically: a user exists iff 0 <= id < 100.
    "h01_http_enrich_join" ->
      """SELECT user_id,
        |  CASE WHEN user_id BETWEEN 0 AND 99 THEN concat('User ', CAST(user_id AS VARCHAR)) END AS name,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin
  )
}
