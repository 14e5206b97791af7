package graft.sources.topic

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** The producer side of `graft-topic` (DSv2 write path, batch and
  * streaming) — Kafka-sink-shaped:
  *
  *  - input needs a `value` column (binary or string); `key` (binary or
  *    string) and `partition` (int) are optional, exactly the Kafka sink's
  *    contract;
  *  - routing: explicit `partition` wins; else key-hash (same hash as the
  *    consumer-side helpers, so one key's records stay totally ordered in
  *    one partition); null key → partition 0 (deterministic, where Kafka
  *    round-robins);
  *  - STREAMING delivery is EXACTLY-ONCE: each task stages its records in
  *    memory and publishes them at task commit through the broker's
  *    (writerId = the engine's stable streaming queryId, epochId,
  *    taskPartition) commit ledger ([[TopicLog.publishOnce]]) — a replayed
  *    epoch after failure/restart or a speculative duplicate attempt
  *    publishes nothing the ledger has already seen, and an aborted task
  *    discards its staging buffer having appended nothing. This is the
  *    in-JVM stand-in for Kafka's transactional producer; staging memory
  *    is task-output-sized (the heap broker holds the log in this JVM
  *    anyway). Exactness requires the replayed epoch to repartition
  *    deterministically — true for a recomputed micro-batch under
  *    unchanged configuration (same plan, same offset range);
  *  - BATCH delivery is AT-LEAST-ONCE by default, like the real
  *    (non-transactional) Kafka sink: a retried/speculative task can
  *    re-publish, and each copy gets a new offset — dedup downstream on a
  *    business id, never the broker offset. Callers replaying idempotent
  *    batch writes (the foreachBatch pattern) opt into the same ledger by
  *    passing `.option("epochId", batchId)` (plus an optional
  *    `.option("writerId", ...)` namespace — defaults to the write's
  *    queryId, which is FRESH per batch write: set writerId explicitly
  *    for cross-run idempotence);
  *  - an input `timestamp` column (timestamp type) is honored as the
  *    record timestamp; absent one, records carry epoch 0 rather than
  *    wall-clock, keeping replayed writes byte-identical.
  */
final class TopicWriteBuilder(topic: String, info: LogicalWriteInfo)
    extends WriteBuilder {
  override def build(): Write = {
    val opts = info.options()
    val writerId = Option(opts.get("writerid")).getOrElse(info.queryId())
    val batchEpoch = Option(opts.get("epochid")).map(_.toLong)
    new TopicWrite(topic, info.schema(), writerId, batchEpoch)
  }
}

final class TopicWrite(topic: String, schema: StructType, writerId: String,
                       batchEpoch: Option[Long]) extends Write {
  TopicWrite.validate(schema)
  override def toBatch: BatchWrite =
    new TopicBatchWrite(topic, schema, writerId, batchEpoch)
  override def toStreaming: StreamingWrite =
    new TopicStreamingWrite(topic, schema, writerId)
}

object TopicWrite {
  private[topic] final case class Cols(value: Int, valueIsString: Boolean,
                                       key: Int, keyIsString: Boolean,
                                       partition: Int, timestamp: Int)

  private[topic] def validate(schema: StructType): Cols = {
    def idx(name: String): Int = schema.fieldNames.indexWhere(_.equalsIgnoreCase(name))
    val v = idx("value")
    require(v >= 0, s"graft-topic write needs a 'value' column; got ${schema.simpleString}")
    def binaryish(i: Int, what: String): Boolean = schema(i).dataType match {
      case BinaryType => false
      case StringType => true
      case t => throw new IllegalArgumentException(
        s"graft-topic '$what' column must be BINARY or STRING, got ${t.simpleString}")
    }
    val k = idx("key")
    val p = idx("partition")
    if (p >= 0) require(schema(p).dataType == IntegerType,
      s"graft-topic 'partition' column must be INT, got ${schema(p).dataType.simpleString}")
    val ts = idx("timestamp")
    if (ts >= 0) require(schema(ts).dataType == TimestampType,
      s"graft-topic 'timestamp' column must be TIMESTAMP, got ${schema(ts).dataType.simpleString}")
    Cols(v, binaryish(v, "value"),
      k, k >= 0 && binaryish(k, "key"), p, ts)
  }
}

final class TopicBatchWrite(topic: String, schema: StructType,
                            writerId: String, batchEpoch: Option[Long])
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    TopicWriterFactory(topic, schema, writerId, batchEpoch)
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

final class TopicStreamingWrite(topic: String, schema: StructType,
                                writerId: String) extends StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    TopicWriterFactory(topic, schema, writerId, None)
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

final case class TopicWriterFactory(topic: String, schema: StructType,
                                    writerId: String, batchEpoch: Option[Long])
    extends DataWriterFactory with StreamingDataWriterFactory {
  // batch path: transactional only when the caller passed an epochId
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new TopicDataWriter(topic, schema,
      batchEpoch.map(e => (writerId, e, partitionId)))
  // streaming path: always transactional on the engine's epoch
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new TopicDataWriter(topic, schema, Some((writerId, epochId, partitionId)))
}

/** Task-side writer. With a `txn` key the records stage in memory and
  * publish atomically-once at commit (see [[TopicWriteBuilder]]'s
  * delivery contract); without one they append as they arrive
  * (at-least-once). */
final class TopicDataWriter(topic: String, schema: StructType,
                            txn: Option[(String, Long, Int)])
    extends DataWriter[InternalRow] {
  private val cols = TopicWrite.validate(schema)
  private val staged = ArrayBuffer.empty[(Option[Int], Array[Byte], Array[Byte], Long)]

  private def bytes(row: InternalRow, i: Int, isString: Boolean): Array[Byte] =
    if (i < 0 || row.isNullAt(i)) null
    else if (isString) row.getUTF8String(i).toString.getBytes("UTF-8")
    else row.getBinary(i)

  override def write(row: InternalRow): Unit = {
    val part =
      if (cols.partition >= 0 && !row.isNullAt(cols.partition))
        Some(row.getInt(cols.partition))
      else None
    val ts =
      if (cols.timestamp >= 0 && !row.isNullAt(cols.timestamp))
        row.getLong(cols.timestamp)
      else 0L
    val k = bytes(row, cols.key, cols.keyIsString)
    val v = bytes(row, cols.value, cols.valueIsString)
    if (txn.isDefined) staged += ((part, k, v, ts))
    else TopicLog.produce(topic, part, k, v, ts)
  }

  override def commit(): WriterCommitMessage = {
    txn.foreach { case (w, e, p) =>
      TopicLog.publishOnce(topic, w, e, p, staged.toSeq)
    }
    TopicWriterCommit
  }
  // transactional task: staging discarded, nothing was appended;
  // legacy path: append-only log cannot un-append (at-least-once)
  override def abort(): Unit = staged.clear()
  override def close(): Unit = ()
}

case object TopicWriterCommit extends WriterCommitMessage
