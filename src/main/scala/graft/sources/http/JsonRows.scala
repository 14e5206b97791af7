package graft.sources.http

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.time.format.DateTimeFormatter
import java.time.{LocalDate, LocalDateTime, ZoneOffset}
import scala.jdk.CollectionConverters._

/** JSON tree → Catalyst [[InternalRow]] against a declared schema, with the
  * reference's flink-json semantics (ref: HttpInputFormatProvider.scala:186-202):
  *  - declared field missing from JSON, or explicit JSON null → SQL null
  *    (`failOnMissingField = false`);
  *  - present-but-malformed value → exception, i.e. FAILFAST rather than
  *    permissive nulling (`ignoreParseErrors = false`);
  *  - timestamps use the SQL text format `yyyy-MM-dd HH:mm:ss[.SSS]`
  *    (`TimestampFormat.SQL`), interpreted as UTC.
  */
object JsonRows {

  private val sqlTimestamp = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss[.SSS]")

  def toRow(node: JsonNode, schema: StructType): InternalRow = {
    val row = new GenericInternalRow(schema.length)
    var i = 0
    while (i < schema.length) {
      val f = schema(i)
      val child = node.get(f.name)
      row.update(i, if (child == null || child.isNull) null else convert(child, f.dataType, f.name))
      i += 1
    }
    row
  }

  private def convert(n: JsonNode, dt: DataType, path: String): Any = dt match {
    case IntegerType =>
      if (n.canConvertToInt) n.asInt()
      else malformed(n, dt, path)
    case LongType =>
      if (n.canConvertToLong) n.asLong()
      else malformed(n, dt, path)
    case DoubleType =>
      if (n.isNumber) n.asDouble()
      else if (n.isTextual) parseOr(n, dt, path)(java.lang.Double.parseDouble(n.asText()))
      else malformed(n, dt, path)
    case FloatType =>
      if (n.isNumber) n.floatValue()
      else malformed(n, dt, path)
    case BooleanType =>
      if (n.isBoolean) n.asBoolean()
      else malformed(n, dt, path)
    case StringType =>
      UTF8String.fromString(if (n.isTextual) n.asText() else n.toString)
    case TimestampType =>
      parseOr(n, dt, path) {
        val ldt = LocalDateTime.parse(n.asText(), sqlTimestamp)
        ldt.toInstant(ZoneOffset.UTC).getEpochSecond * 1000000L + ldt.getNano / 1000L
      }
    case DateType =>
      parseOr(n, dt, path)(LocalDate.parse(n.asText()).toEpochDay.toInt)
    case d: DecimalType =>
      parseOr(n, dt, path)(Decimal(new java.math.BigDecimal(n.asText()), d.precision, d.scale))
    case BinaryType =>
      parseOr(n, dt, path)(n.binaryValue())
    case st: StructType =>
      if (n.isObject) toRow(n, st) else malformed(n, dt, path)
    case ArrayType(et, _) =>
      if (n.isArray)
        new GenericArrayData(n.elements().asScala.map(e =>
          if (e.isNull) null else convert(e, et, s"$path[]")).toArray)
      else malformed(n, dt, path)
    case MapType(StringType, vt, _) =>
      if (n.isObject) {
        val fields = n.properties().asScala.toSeq
        ArrayBasedMapData(
          fields.map(e => UTF8String.fromString(e.getKey)).toArray[Any],
          fields.map(e => if (e.getValue.isNull) null
                          else convert(e.getValue, vt, s"$path.${e.getKey}")).toArray[Any])
      } else malformed(n, dt, path)
    case other =>
      throw new IllegalArgumentException(
        s"Unsupported type $other for field '$path' in http-full-cache schema")
  }

  private def parseOr(n: JsonNode, dt: DataType, path: String)(body: => Any): Any =
    try body
    catch { case e: Exception => malformed(n, dt, path, e) }

  private def malformed(n: JsonNode, dt: DataType, path: String, cause: Exception = null): Nothing =
    throw new RuntimeException(
      s"Failed to deserialize JSON value ${n.toString} as ${dt.simpleString} for field '$path'", cause)
}
