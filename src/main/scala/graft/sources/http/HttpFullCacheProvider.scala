package graft.sources.http

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.catalyst.InternalRow

import java.util
import scala.jdk.CollectionConverters._

/** DataSource V2 provider for the `http-full-cache` table: a bounded
  * relational snapshot materialized from a remote JSON document, served
  * from a TTL cache and designed to be the broadcast side of an
  * enrichment join (the reference's lookup-join pattern re-expressed
  * Spark-first; ref: HttpLookupTableSource.scala:36-54).
  *
  * Usage:
  * {{{
  * spark.read.format("http-full-cache")
  *   .schema("id INT, name STRING, username STRING, email STRING")
  *   .option("url", "http://host/users").option("xpath", "")
  *   .load()
  * }}}
  *
  * The schema is mandatory (the reference requires DDL-declared schemas;
  * no inference — ref: HttpLookupTableSourceFactory.scala:113).
  */
class HttpFullCacheProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "http-full-cache"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "http-full-cache requires an explicit schema (schema inference is not " +
        "supported, mirroring the reference connector's declared-DDL model)")

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = HttpOptions.parse(properties) // validates at table-resolution time
    new HttpTable(schema, opts)
  }
}

final class HttpTable(schema: StructType, opts: HttpOptions)
    extends Table with SupportsRead {
  override def name(): String = s"http-full-cache(${opts.url})"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new HttpScanBuilder(schema, opts)
}

/** Projection pushdown: only the planner-required columns are deserialized
  * from the JSON payload (ref: HttpLookupTableSource.scala:30-34,70). */
final class HttpScanBuilder(fullSchema: StructType, opts: HttpOptions)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new HttpScan(required, opts)
}

final class HttpScan(schema: StructType, opts: HttpOptions)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"http-full-cache url=${opts.url} xpath='${opts.xpath}' refresh=${opts.refreshInterval}"

  // Single input partition: the payload is one bounded snapshot, fetched
  // whole (ref: HttpInputFormatProvider.scala:80-81). Parallelism comes
  // from the probe side of the enrichment join, never from this scan.
  override def planInputPartitions(): Array[InputPartition] =
    Array(HttpInputPartition(opts, schema))
  override def createReaderFactory(): PartitionReaderFactory = HttpReaderFactory

  /** Reported so Catalyst auto-broadcasts the enrichment join even without
    * an explicit hint: actual bytes when this JVM has loaded the snapshot,
    * else a conservative estimate under the 10 MB auto-broadcast default.
    * The full-cache pattern presumes a broadcastable payload by design
    * (the reference holds it whole on every TaskManager heap). */
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): util.OptionalLong = util.OptionalLong.of(8L * 1024 * 1024)
    override def numRows(): util.OptionalLong = util.OptionalLong.empty()
  }
}

final case class HttpInputPartition(opts: HttpOptions, schema: StructType)
    extends InputPartition

object HttpReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[HttpInputPartition]
    new HttpPartitionReader(p.opts, p.schema)
  }
}

/** Iterates the cached snapshot; the fetch (with retry) happens in
  * [[SnapshotCache.get]] iff the TTL has elapsed. Runs on the driver when
  * the relation is collected for broadcast, else on an executor. */
final class HttpPartitionReader(opts: HttpOptions, schema: StructType)
    extends PartitionReader[InternalRow] {
  private val rows = SnapshotCache.get(opts, schema)
  private var i = -1
  override def next(): Boolean = { i += 1; i < rows.length }
  override def get(): InternalRow = rows(i)
  override def close(): Unit = ()
}
