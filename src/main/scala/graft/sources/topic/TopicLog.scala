package graft.sources.topic

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer
import scala.util.hashing.MurmurHash3

/** In-JVM partitioned append-only log — the broker stand-in behind the
  * `graft-topic` source (the reference pipeline's stream side is a Kafka
  * topic consumed by Flink; ref:
  * example/src/main/scala/com/datanutshell/examples/FlinkHttpConnectorExample.scala:78-104).
  *
  * The BROKER here is deliberately trivial (a heap map — on a real cluster
  * this is Kafka itself and needs no re-implementation); what the source
  * demonstrates for real is everything a Spark engineer must get right to
  * consume such a log at scale: a fixed record envelope, per-partition
  * monotonic offsets, key-hash partition affinity (a key's records stay
  * totally ordered within one partition), offset-range micro-batch
  * planning, checkpoint resume, and admission control. Deterministic
  * replay of any (from, until] offset range is what makes the stream
  * exactly-once downstream.
  *
  * Thread-safe: appends lock only their partition buffer; reads snapshot
  * a slice under the same lock.
  */
object TopicLog {
  final case class Record(key: Array[Byte], value: Array[Byte], tsMicros: Long)

  private val topics = TrieMap.empty[String, Array[ArrayBuffer[Record]]]

  /** Commit ledger of published (topic, writerId, epochId, taskPartition)
    * units — the broker-side half of the EXACTLY-ONCE producer (the
    * in-JVM stand-in for Kafka's transactional producer / idempotent
    * sequence numbers): [[publishOnce]] appends a task's staged records
    * atomically at most once per key, so a replayed epoch or a
    * speculative duplicate attempt cannot double-append. */
  private val ledger = TrieMap.empty[(String, String, Long, Int), Unit]

  def create(topic: String, partitions: Int): Unit = {
    require(partitions > 0, s"topic '$topic' needs at least 1 partition")
    topics.putIfAbsent(topic, Array.fill(partitions)(ArrayBuffer.empty[Record]))
  }

  def delete(topic: String): Unit = {
    topics.remove(topic)
    ledger.keys.filter(_._1 == topic).foreach(ledger.remove)
  }

  /** Atomically publish a task's staged records unless this
    * (writerId, epochId, taskPartition) unit already published to the
    * topic — the transactional-producer commit. The claim and the
    * appends run under one global lock so a publish is all-or-nothing
    * even against concurrent tasks (serializing commits is fine for a
    * heap broker; on a real cluster this is Kafka's own transaction
    * coordinator). Returns true iff this call appended. */
  def publishOnce(topic: String, writerId: String, epochId: Long,
                  taskPartition: Int,
                  recs: Seq[(Option[Int], Array[Byte], Array[Byte], Long)]): Boolean =
    ledger.synchronized {
      val key = (topic, writerId, epochId, taskPartition)
      if (ledger.contains(key)) false
      else {
        recs.foreach { case (p, k, v, ts) => produce(topic, p, k, v, ts) }
        ledger.put(key, ())
        true
      }
    }

  def partitions(topic: String): Int = logOf(topic).length

  /** Kafka-style key partitioning: hash(key) mod partitions, so one key's
    * records land in one partition in append order. */
  def append(topic: String, key: String, value: String, tsMillis: Long): Unit = {
    val parts = logOf(topic)
    val p = math.floorMod(MurmurHash3.stringHash(key), parts.length)
    appendTo(topic, p, key, value, tsMillis)
  }

  def appendTo(topic: String, partition: Int, key: String, value: String,
               tsMillis: Long): Unit = {
    val buf = logOf(topic)(partition)
    val rec = Record(key.getBytes("UTF-8"), value.getBytes("UTF-8"), tsMillis * 1000L)
    buf.synchronized { buf += rec }
  }

  /** Producer-side raw append (the DSv2 write path). Partition routing
    * matches [[append]] (UTF-8 key → stringHash mod partitions, so a key's
    * records stay in one partition regardless of which producer API wrote
    * them); records with a null key route to partition 0 — deterministic,
    * unlike Kafka's sticky round-robin, because replay-identical logs are
    * what the source's exactly-once story rests on. */
  def produce(topic: String, partition: Option[Int], key: Array[Byte],
              value: Array[Byte], tsMicros: Long): Unit = {
    val parts = logOf(topic)
    val p = partition.getOrElse {
      if (key == null) 0
      else math.floorMod(MurmurHash3.stringHash(new String(key, "UTF-8")), parts.length)
    }
    require(p >= 0 && p < parts.length,
      s"partition $p out of range for topic '$topic' (${parts.length} partitions)")
    val buf = parts(p)
    buf.synchronized { buf += Record(key, value, tsMicros) }
  }

  /** Current end offset (= record count) per partition. */
  def endOffsets(topic: String): Map[Int, Long] =
    logOf(topic).zipWithIndex.map { case (buf, p) =>
      p -> buf.synchronized(buf.length.toLong)
    }.toMap

  /** Records in the half-open offset range [from, until) of one partition.
    * Offsets are stable positions in an append-only buffer, so the same
    * range always replays the same records. */
  def slice(topic: String, partition: Int, from: Long, until: Long): IndexedSeq[Record] = {
    val buf = logOf(topic)(partition)
    buf.synchronized { buf.slice(from.toInt, until.toInt).toIndexedSeq }
  }

  private def logOf(topic: String): Array[ArrayBuffer[Record]] =
    topics.getOrElse(topic,
      throw new IllegalArgumentException(s"unknown topic '$topic' — TopicLog.create it first"))
}
