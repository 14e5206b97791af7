package graft.examples

import graft.GraftSession
import graft.sources.http.testkit.EmbeddedJsonServer
import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** Runnable end-to-end demo of the library's flagship pattern, mirroring
  * the reference's example job (ref: example/src/main/scala/com/datanutshell/
  * examples/FlinkHttpConnectorExample.scala:78-154): a generated event
  * stream enriched against a user table served over HTTP by the
  * `http-full-cache` source, printed to the console AND produced back
  * onto a `graft-topic` partitioned log keyed by user (the reference
  * job's Kafka-sink leg), which is read back and sampled at exit.
  *
  * Offline-safe: the "remote" endpoint is an embedded JDK HttpServer.
  * Mid-run the payload is swapped so the console output shows the TTL
  * refresh live (names flip from "User N" to "Renamed N" after ~PT3S).
  *
  * Run: `sbt "runMain graft.examples.Main"` — streams for ~12 s, exits.
  */
object Main {
  private def users(prefix: String): String =
    (0 until 10).map { i =>
      s"""{"id": $i, "name": "$prefix $i", "username": "u$i", "email": "u$i@example.com"}"""
    }.mkString("[", ",", "]")

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    val server = new EmbeddedJsonServer
    server.payload = users("User")

    // the lookup table: full snapshot over HTTP, refreshed every 3 s
    val userTable = spark.read.format("http-full-cache")
      .schema("id INT, name STRING, username STRING, email STRING")
      .option("url", server.url)
      .option("cache.refresh-interval", "PT3S")
      .load()

    // generated events (the reference's datagen source → Spark's rate
    // source): user_id 0..14, ids >= 10 miss the lookup (LEFT → null name)
    val events = spark.readStream.format("rate")
      .option("rowsPerSecond", "10").load()
      .select(col("timestamp").as("ts"),
        pmod(col("value"), lit(15)).cast("int").as("user_id"),
        (pmod(col("value") * 37, lit(1000)).cast("double") / 10.0).as("value"))

    val enriched = Streams.enrich(events, userTable,
        col("user_id") === col("id"), "left")
      .select("ts", "user_id", "name", "value")

    val q = enriched.writeStream.format("console")
      .option("truncate", "false").option("numRows", "8")
      .outputMode("append").start()

    // ... and the produce leg the reference job ends with (enriched
    // records back onto a topic — its Kafka sink): same enrichment, keyed
    // by user, appended to a graft-topic partitioned log
    val ckpt = java.nio.file.Files.createTempDirectory("graft_example_sink")
    val qTopic = enriched
      .select(col("user_id").cast("string").as("key"),
        to_json(struct(col("ts"), col("user_id"), col("name"), col("value")))
          .as("value"))
      .writeStream.format("graft-topic")
      .option("topic", "enriched-events").option("partitions", "3")
      .option("checkpointLocation", ckpt.toString)
      .start()

    Thread.sleep(6000)
    server.payload = users("Renamed") // visible after the PT3S TTL
    q.awaitTermination(6000)
    q.stop()
    qTopic.stop()
    val produced = spark.read.format("graft-topic")
      .option("topic", "enriched-events").load()
    println(s"[example] produced ${produced.count()} enriched records to " +
      "graft-topic 'enriched-events'; sample:")
    produced.select(col("key").cast("string"), col("value").cast("string"),
        col("partition"), col("offset"))
      .show(5, truncate = false)
    spark.stop()
    server.stop()
    // deleteOnExit is a no-op for non-empty dirs — remove the checkpoint
    // tree explicitly so repeated runs don't accumulate in /tmp
    graft.util.Fs.deleteTree(ckpt)
    sys.exit(0)
  }
}
