package graft.queries

import graft.Tables
import graft.streaming.Streams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Driver-gated STREAMING queries: each runs a real micro-batch pipeline
  * (produce → `graft-topic` → readStream → stateful transform → sink) to a
  * batch-readable result whose values a batch engine can recompute — so the
  * streaming execution path itself sits under the DuckDB oracle, not just
  * under specs. The reference's streaming leg is exactly this shape
  * (Kafka topic → watermark window agg: FlinkHttpConnectorExample.scala:78-104).
  */
object StreamGate {

  /** Cleanup contract for every gate query: drain the stream, then stop
    * it and delete the broker log + checkpoint — each step isolated, so a
    * failing stop() can't leak the heap-resident topic and no cleanup
    * error ever masks the stream's own exception (it is reported to
    * stderr instead). The memory-sink TABLE intentionally survives,
    * because the returned DataFrame reads it lazily. Names are UUID-fresh
    * per invocation, so repeat runs never collide. */
  private def drainAndClean(q: org.apache.spark.sql.streaming.StreamingQuery,
                            topic: String, ckpt: java.nio.file.Path): Unit =
    try q.awaitTermination() finally {
      def step(what: String)(f: => Unit): Unit =
        try f catch { case e: Throwable =>
          System.err.println(s"[stream-gate] $what failed: ${e.getMessage}") }
      step("stop")(q.stop())
      step("topic delete")(graft.sources.topic.TopicLog.delete(topic))
      step("checkpoint delete")(graft.util.Fs.deleteTree(ckpt))
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // events → produced into a fresh 8-partition topic (key = user, value =
    // JSON payload, record timestamp = event time) → consumed as a
    // micro-batch stream → watermark + tumbling 1-day window counts →
    // complete-mode memory sink. Trigger.AvailableNow drains the whole
    // backlog and stops; the emitted table is the batch-equivalent result
    // the oracle recomputes directly on the parquet. Deterministic because
    // the window sum is decimal-accumulated (merge-order-proof) and the
    // bounded replay admits no late drops (single uncapped batch from
    // offset 0).
    "s01_stream_window_counts" -> { (s, dir) =>
      val run = java.util.UUID.randomUUID().toString.take(8)
      val topic = s"s01_events_$run"
      val mem = s"s01_result_$run"
      Tables.events(s, dir)
        .select(col("user_id").cast("string").as("key"),
          to_json(struct(col("event_type"), col("value"))).as("value"),
          col("ts").as("timestamp"))
        .write.format("graft-topic").mode("append")
        .option("topic", topic).option("partitions", "8").save()
      val parsed = s.readStream.format("graft-topic")
        .option("topic", topic).load()
        .select(col("timestamp").as("ts"),
          from_json(col("value").cast("string"), org.apache.spark.sql.types
            .StructType.fromDDL("event_type STRING, value DOUBLE")).as("j"))
        .select(col("ts"), col("j.event_type").as("event_type"),
          col("j.value").as("value"))
      val agg = Streams.windowedCounts(parsed, "ts",
        watermark = "1 day", windowDuration = "1 day")
      val ckpt = java.nio.file.Files.createTempDirectory("s01_ckpt_")
      val q = agg.writeStream.format("memory").queryName(mem)
        .outputMode("complete")
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      drainAndClean(q, topic, ckpt)
      s.table(mem).orderBy("win_start", "event_type")
    },

    // Streaming exact dedup under the gate: events replayed through the
    // topic → dropDuplicatesWithinWatermark(user_id) → append-mode memory
    // sink. WHICH occurrence survives is arrival-order-dependent, so the
    // query emits only the key column — the emitted key SET (exactly one
    // row per distinct user) is deterministic and batch-recomputable as
    // DISTINCT. The watermark bounds dedup state on an unbounded stream;
    // on this bounded replay it evicts nothing.
    "s02_stream_dedup" -> { (s, dir) =>
      val run = java.util.UUID.randomUUID().toString.take(8)
      val topic = s"s02_events_$run"
      val mem = s"s02_result_$run"
      Tables.events(s, dir)
        .select(col("user_id").cast("string").as("key"),
          col("user_id").cast("string").as("value"),
          col("ts").as("timestamp"))
        .write.format("graft-topic").mode("append")
        .option("topic", topic).option("partitions", "8").save()
      val docs = s.readStream.format("graft-topic")
        .option("topic", topic).load()
        .select(col("value").cast("string").cast("long").as("user_id"),
          col("timestamp").as("ts"))
      val deduped = Streams.dedupWithinWatermark(docs, "user_id", "ts", "1 day")
        .select("user_id")
      val ckpt = java.nio.file.Files.createTempDirectory("s02_ckpt_")
      val q = deduped.writeStream.format("memory").queryName(mem)
        .outputMode("append")
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      drainAndClean(q, topic, ckpt)
      s.table(mem).orderBy("user_id")
    },

    // Streaming SESSION windows under the gate: gap-based sessionization
    // (session_window merge semantics) over the replayed topic, per
    // event_type with a 1-hour gap. Complete-mode memory sink; the oracle
    // sessionizes with the q35-proven lag/cumsum islands pattern
    // (duplicate timestamps can't flip a break: a 0 gap never exceeds the
    // threshold, so tie order is irrelevant).
    "s04_stream_session_windows" -> { (s, dir) =>
      val run = java.util.UUID.randomUUID().toString.take(8)
      val topic = s"s04_events_$run"
      val mem = s"s04_result_$run"
      Tables.events(s, dir)
        .select(col("user_id").cast("string").as("key"),
          to_json(struct(col("event_type"), col("value"))).as("value"),
          col("ts").as("timestamp"))
        .write.format("graft-topic").mode("append")
        .option("topic", topic).option("partitions", "8").save()
      val parsed = s.readStream.format("graft-topic")
        .option("topic", topic).load()
        .select(col("timestamp").as("ts"),
          from_json(col("value").cast("string"), org.apache.spark.sql.types
            .StructType.fromDDL("event_type STRING, value DOUBLE")).as("j"))
        .select(col("ts"), col("j.event_type").as("event_type"),
          col("j.value").as("value"))
      val agg = Streams.sessionCounts(parsed, "ts",
        watermark = "1 day", gap = "1 hour")
      val ckpt = java.nio.file.Files.createTempDirectory("s04_ckpt_")
      val q = agg.writeStream.format("memory").queryName(mem)
        .outputMode("complete")
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      drainAndClean(q, topic, ckpt)
      s.table(mem).orderBy("event_type", "win_start")
    },

    // The reference's CORE use case, streaming form, under the gate:
    // an unbounded keyed stream enriched against the TTL-cached
    // http-full-cache table (stream-static LEFT lookup join — the static
    // side re-plans each micro-batch, the source's TTL decides whether a
    // re-plan re-fetches), then a running per-user aggregate in complete
    // mode. Batch h01 shares the same arithmetic, so the oracle is the
    // same reproduction of the lookup (a user exists iff 0 <= id < 100).
    "s03_stream_enrich" -> { (s, dir) =>
      val run = java.util.UUID.randomUUID().toString.take(8)
      val topic = s"s03_events_$run"
      val mem = s"s03_result_$run"
      Tables.events(s, dir)
        .select(col("user_id").cast("string").as("key"),
          to_json(struct(col("user_id"), col("value"))).as("value"),
          col("ts").as("timestamp"))
        .write.format("graft-topic").mode("append")
        .option("topic", topic).option("partitions", "8").save()
      val stream = s.readStream.format("graft-topic")
        .option("topic", topic).load()
        .select(from_json(col("value").cast("string"), org.apache.spark.sql
          .types.StructType.fromDDL("user_id BIGINT, value DOUBLE")).as("j"))
        .select(col("j.user_id").as("user_id"), col("j.value").as("value"))
      val users = s.read.format("http-full-cache")
        .schema("id INT, name STRING, username STRING, email STRING")
        .option("url", HttpEnrichment.usersServer.url)
        .load()
      val agg = Streams.enrich(stream, users,
          stream("user_id") === users("id"), "left")
        .groupBy("user_id", "name")
        .agg(count(lit(1)).as("n_events"),
          Tables.dsum(col("value")).as("sum_value"))
      val ckpt = java.nio.file.Files.createTempDirectory("s03_ckpt_")
      val q = agg.writeStream.format("memory").queryName(mem)
        .outputMode("complete")
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      drainAndClean(q, topic, ckpt)
      s.table(mem).orderBy("user_id")
    },
  )

  val oracle: Map[String, String] = Map(
    // Spark's window('1 day') buckets align to the epoch = UTC calendar
    // days (UTC session both sides), so date_trunc is the same bucketing.
    "s01_stream_window_counts" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS win_start,
        |  CAST(date_trunc('day', ts) AS TIMESTAMP) + INTERVAL 1 DAY AS win_end,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2, 3 ORDER BY win_start, event_type""".stripMargin,

    "s02_stream_dedup" ->
      "SELECT DISTINCT user_id FROM events ORDER BY user_id",

    // q35's lag/cumsum sessionization per event_type. Session = [min ts,
    // max ts + gap); Spark MERGES events exactly gap apart, so the break
    // is strict `>` — same alignment q35 pins.
    "s04_stream_session_windows" ->
      """WITH s AS (
        |  SELECT event_type, ts, value,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY event_type ORDER BY ts) > INTERVAL 1 HOUR
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |g AS (
        |  SELECT event_type, ts, value,
        |    SUM(brk) OVER (PARTITION BY event_type ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM s)
        |SELECT MIN(ts) AS win_start, MAX(ts) + INTERVAL 1 HOUR AS win_end, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
        |FROM g GROUP BY event_type, sess
        |ORDER BY event_type, win_start""".stripMargin,

    // Same arithmetic reproduction of the HTTP lookup as batch h01.
    "s03_stream_enrich" ->
      """SELECT user_id,
        |  CASE WHEN user_id BETWEEN 0 AND 99 THEN concat('User ', CAST(user_id AS VARCHAR)) END AS name,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
  )
}
