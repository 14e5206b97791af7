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

  /** NESTED users payload — jsonplaceholder's real document shape
    * (`address: {city, geo: {lat, lng}}`), which the reference's live test
    * consumes (ref: HttpLookupConnectorTest.scala:49). Every leaf is a pure
    * function of id, and lat/lng are exact binary doubles (multiples of
    * 0.25/0.5), so the DuckDB oracle reproduces them bit-for-bit. */
  private def nestedUsersPayload: String =
    (0 until 100).map { i =>
      s"""{"id": $i, "name": "User $i", "address": {"city": "City ${i % 10}",""" +
        s""" "geo": {"lat": ${i * 0.25 - 10}, "lng": ${i * 0.5 - 20}}}}"""
    }.mkString("[", ",", "]")

  lazy val nestedUsersServer: EmbeddedJsonServer = {
    val s = new EmbeddedJsonServer
    s.payload = nestedUsersPayload
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
    },

    // Nested projection through the HTTP source (SURVEY §1.2 ROW
    // acceptance; ref declares supportsNestedProjection = true,
    // HttpLookupTableSource.scala:70): a ROW<city, ROW<lat,lng>>-typed
    // users table enriches events INNER (h01 covers LEFT), selecting only
    // `address.city` + `address.geo.lat` — the scan's pruned ReadSchema
    // drops name/email and the lng leaf (asserted in HttpSourceSpec).
    "h02_http_nested_enrich" -> { (s, dir) =>
      val users = s.read.format("http-full-cache")
        .schema("id INT, name STRING, " +
          "address STRUCT<city: STRING, geo: STRUCT<lat: DOUBLE, lng: DOUBLE>>")
        .option("url", nestedUsersServer.url)
        .load()
      val ev = Tables.events(s, dir)
      Enrich.lookupJoin(ev, users, ev("user_id") === users("id"), "inner")
        .groupBy(col("user_id"), col("address.city").as("city"),
          col("address.geo.lat").as("lat"))
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
        |ORDER BY user_id""".stripMargin,

    // Arithmetic reproduction of the nested payload: city/lat are pure
    // functions of id; INNER join keeps ids 0..99 only. lat = id*0.25-10
    // is exact in binary, so double equality holds across engines.
    "h02_http_nested_enrich" ->
      """SELECT user_id,
        |  concat('City ', CAST(user_id % 10 AS VARCHAR)) AS city,
        |  CAST(user_id AS DOUBLE) * 0.25 - 10 AS lat,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE user_id BETWEEN 0 AND 99
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin
  )
}
