package graft.sources.topic

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util
import scala.jdk.CollectionConverters._

/** DataSource V2 provider for `graft-topic`: a Kafka-style partitioned log
  * consumed as a Structured Streaming source (and, bounded, as a batch
  * table). The reference pipeline's stream side is exactly this shape — a
  * keyed Kafka topic the Flink job enriches (ref:
  * FlinkHttpConnectorExample.scala:78-104); this source re-expresses its
  * CONSUMPTION mechanics Spark-first:
  *
  *  - fixed Kafka-shaped record envelope
  *    (key/value binary, topic, partition, offset, timestamp);
  *  - per-partition monotonic offsets; a micro-batch is the half-open
  *    offset range (start, end] per partition, planned as one input
  *    partition per topic-partition — scan parallelism = log parallelism;
  *  - `startingOffsets` earliest|latest;
  *  - checkpoint resume: the restarted query continues from the committed
  *    offset map, replaying nothing and skipping nothing (the log is
  *    append-only, so any range replays deterministically → exactly-once
  *    downstream);
  *  - admission control: `maxRecordsPerTrigger` bounds a micro-batch via
  *    [[SupportsAdmissionControl]], rationing the cap across partitions
  *    proportionally to their backlog.
  *
  * The broker behind it ([[TopicLog]]) is an in-JVM stand-in — on a real
  * cluster the broker is Kafka itself; everything above the broker line is
  * the load-bearing part.
  */
class TopicSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-topic"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TopicSource.schema
  // Write-side schemas are caller-shaped (value + optional key/partition/
  // timestamp, like the Kafka sink), so only assert the fixed envelope on
  // the READ schema; TopicWrite validates the write shape itself.
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties) // keys arrive original-case
    val topic = Option(opts.get("topic")).getOrElse(
      throw new IllegalArgumentException("graft-topic requires option 'topic'"))
    val starting = Option(opts.get("startingoffsets")).getOrElse("earliest")
    require(starting == "earliest" || starting == "latest",
      s"startingOffsets must be earliest|latest, got '$starting'")
    val maxPerTrigger = Option(opts.get("maxrecordspertrigger")).map(_.toLong)
    // write-side auto-create (Kafka-style): .option("partitions", n) creates
    // the topic if absent; no-op when it already exists
    val partitions = Option(opts.get("partitions")).map(_.toInt)
    new TopicTable(topic, starting, maxPerTrigger, partitions)
  }
}

object TopicSource {
  /** The Kafka record envelope: payloads stay opaque bytes, the consumer
    * casts/parses downstream (`CAST(value AS STRING)`, from_json, …). */
  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType, nullable = false),
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("timestamp", TimestampType, nullable = false)))
}

final class TopicTable(topic: String, starting: String, maxPerTrigger: Option[Long],
                       partitions: Option[Int] = None)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-topic($topic)"
  override def schema(): StructType = TopicSource.schema
  // ACCEPT_ANY_SCHEMA: write frames are caller-shaped (value + optional
  // key/partition/timestamp — the Kafka sink contract), not the read
  // envelope; TopicWrite validates the shape itself.
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
        TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
        TableCapability.ACCEPT_ANY_SCHEMA).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new TopicScan(topic, starting, maxPerTrigger)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    partitions.foreach(TopicLog.create(topic, _)) // driver-side, idempotent
    new TopicWriteBuilder(topic, info)
  }
}

final class TopicScan(topic: String, starting: String, maxPerTrigger: Option[Long])
    extends Scan with Batch {
  override def readSchema(): StructType = TopicSource.schema
  override def description(): String = s"graft-topic topic=$topic"
  override def toBatch: Batch = this
  // Bounded read = everything currently in the log, one Spark partition
  // per topic-partition.
  override def planInputPartitions(): Array[InputPartition] =
    TopicLog.endOffsets(topic).toArray.sortBy(_._1).map { case (p, end) =>
      TopicRange(topic, p, 0L, end)
    }
  override def createReaderFactory(): PartitionReaderFactory = TopicReaderFactory
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new TopicMicroBatchStream(topic, starting, maxPerTrigger)
}

/** One micro-batch task: the records of `topic`/`partition` with offsets in
  * [from, until). */
final case class TopicRange(topic: String, partition: Int, from: Long, until: Long)
    extends InputPartition

/** Offset = end position per partition, JSON `{"0":12,"1":7}` (sorted keys,
  * so equal offset maps serialize identically in the checkpoint log). */
final case class TopicOffset(ends: Map[Int, Long]) extends Offset {
  override def json(): String =
    ends.toSeq.sortBy(_._1).map { case (p, o) => s""""$p":$o""" }
      .mkString("{", ",", "}")
}

object TopicOffset {
  def parse(json: String): TopicOffset = TopicOffset(
    json.trim.stripPrefix("{").stripSuffix("}").split(',').filter(_.nonEmpty).map { kv =>
      val Array(k, v) = kv.split(':')
      k.trim.stripPrefix("\"").stripSuffix("\"").toInt -> v.trim.toLong
    }.toMap)
}

final class TopicMicroBatchStream(topic: String, starting: String,
                                  maxPerTrigger: Option[Long])
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  /** Set by [[prepareForTriggerAvailableNow]]: the log end as of query
    * start. Under Trigger.AvailableNow every batch's planning targets this
    * SNAPSHOT (not the live end), so a capped drain runs exactly
    * ceil(backlog/cap) batches and stops even if producers keep appending
    * — the contract [[SupportsTriggerAvailableNow]] exists for (without
    * it, Spark falls back to single-batch Trigger.Once semantics for
    * third-party sources and an admission cap would silently truncate the
    * drain). Same shape as the Kafka source's implementation. */
  @volatile private var availableNowEnd: Option[Map[Int, Long]] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(TopicLog.endOffsets(topic))

  private def targetEnd: Map[Int, Long] =
    availableNowEnd.getOrElse(TopicLog.endOffsets(topic))

  override def initialOffset(): Offset =
    if (starting == "latest") TopicOffset(TopicLog.endOffsets(topic))
    else TopicOffset(TopicLog.endOffsets(topic).map { case (p, _) => p -> 0L })

  override def deserializeOffset(json: String): Offset = TopicOffset.parse(json)

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  /** End of this micro-batch: the (snapshot-bounded) log end, or — under a
    * row cap — the start advanced by at most `maxRows` records, rationed
    * across partitions proportionally to backlog (every partition with lag
    * makes progress, a single hot partition can't starve the rest). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[TopicOffset].ends
    val end = targetEnd
    limit match {
      case r: ReadMaxRows =>
        val lags = end.map { case (p, e) => p -> math.max(0L, e - from.getOrElse(p, 0L)) }
        val totalLag = lags.values.sum
        if (totalLag <= r.maxRows()) TopicOffset(end)
        else {
          val budget = r.maxRows()
          // proportional shares, floored; leftover budget spent in
          // partition order so the cap is met exactly
          var shares = lags.map { case (p, lag) => p -> budget * lag / totalLag }
          var leftover = budget - shares.values.sum
          for (p <- lags.keys.toSeq.sorted if leftover > 0) {
            val room = lags(p) - shares(p)
            val add = math.min(room, leftover)
            shares += p -> (shares(p) + add); leftover -= add
          }
          TopicOffset(end.map { case (p, _) =>
            p -> (from.getOrElse(p, 0L) + shares.getOrElse(p, 0L)) })
        }
      case _ => TopicOffset(end)
    }
  }

  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "latestOffset(Offset, ReadLimit) should be called instead (SupportsAdmissionControl)")

  override def reportLatestOffset(): Offset = TopicOffset(TopicLog.endOffsets(topic))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[TopicOffset].ends
    val e = end.asInstanceOf[TopicOffset].ends
    e.toArray.sortBy(_._1).flatMap { case (p, until) =>
      val from = s.getOrElse(p, 0L)
      if (until > from) Some(TopicRange(topic, p, from, until)) else None
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = TopicReaderFactory
  override def commit(end: Offset): Unit = () // broker-side, nothing to ack
  override def stop(): Unit = ()
}

object TopicReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[TopicRange]
    new TopicPartitionReader(r)
  }
}

final class TopicPartitionReader(range: TopicRange) extends PartitionReader[InternalRow] {
  private val recs = TopicLog.slice(range.topic, range.partition, range.from, range.until)
  private var i = -1
  override def next(): Boolean = { i += 1; i < recs.length }
  override def get(): InternalRow = {
    val rec = recs(i)
    val row = new GenericInternalRow(6)
    row.update(0, rec.key)
    row.update(1, rec.value)
    row.update(2, UTF8String.fromString(range.topic))
    row.update(3, range.partition)
    row.setLong(4, range.from + i)
    row.setLong(5, rec.tsMicros)
    row
  }
  override def close(): Unit = ()
}
