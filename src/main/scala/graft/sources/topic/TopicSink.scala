package graft.sources.topic

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._

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
  *  - delivery is AT-LEAST-ONCE, like the real (non-transactional) Kafka
  *    sink: writers append as tasks run, `commit` is an ack and `abort`
  *    cannot un-append — a retried task re-appends, and each re-appended
  *    copy gets a NEW offset, so dedup downstream must key on a business
  *    id carried in the value (never on the broker-assigned offset);
  *  - an input `timestamp` column (timestamp type) is honored as the
  *    record timestamp; absent one, records carry epoch 0 rather than
  *    wall-clock, keeping replayed writes byte-identical.
  */
final class TopicWriteBuilder(topic: String, info: LogicalWriteInfo)
    extends WriteBuilder {
  override def build(): Write = new TopicWrite(topic, info.schema())
}

final class TopicWrite(topic: String, schema: StructType) extends Write {
  TopicWrite.validate(schema)
  override def toBatch: BatchWrite = new TopicBatchWrite(topic, schema)
  override def toStreaming: StreamingWrite = new TopicStreamingWrite(topic, schema)
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

final class TopicBatchWrite(topic: String, schema: StructType) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    TopicWriterFactory(topic, schema)
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

final class TopicStreamingWrite(topic: String, schema: StructType) extends StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    TopicWriterFactory(topic, schema)
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

final case class TopicWriterFactory(topic: String, schema: StructType)
    extends DataWriterFactory with StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new TopicDataWriter(topic, schema)
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new TopicDataWriter(topic, schema)
}

final class TopicDataWriter(topic: String, schema: StructType)
    extends DataWriter[InternalRow] {
  private val cols = TopicWrite.validate(schema)

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
    TopicLog.produce(topic, part,
      bytes(row, cols.key, cols.keyIsString),
      bytes(row, cols.value, cols.valueIsString), ts)
  }

  override def commit(): WriterCommitMessage = TopicWriterCommit
  override def abort(): Unit = () // append-only log: cannot un-append (at-least-once)
  override def close(): Unit = ()
}

case object TopicWriterCommit extends WriterCommitMessage
