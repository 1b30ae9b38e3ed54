package graft.sources

import java.nio.file.{Files, Paths}
import java.util
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 batch connector for the raw Open-Meteo zone (S1/S2 as a real
  * Spark source, the "custom, optional" row of SURVEY §2.1).
  *
  * `spark.read.format("openmeteo").load(rawDir)` scans every
  * `<slug>_{weather,air}.json` under the directory and yields PIVOTED hourly
  * rows — the struct-of-parallel-arrays payload (fetch.py:49-66) becomes
  * (city, kind, time, measurements...) directly at the source, with the
  * per-field ragged-length guard of transform.py:24-28.
  *
  * Scale properties: one input partition per raw file (a 1000-city raw zone
  * scans 2000-way parallel); column pruning is pushed into the reader
  * (SupportsPushDownRequiredColumns), so `select(city, time)` never parses
  * the measurement arrays.
  */
class OpenMeteoDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "openmeteo"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    OpenMeteoTable.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new OpenMeteoTable(properties.get("path"))
}

object OpenMeteoTable {
  /** Measurement columns: the 8 weather series (fetch.py:52) + 2 air series
    * (fetch.py:59), nullable doubles (absent in the other payload kind). */
  val Measurements: Seq[String] = Seq(
    "temperature_2m", "precipitation", "relative_humidity_2m", "windspeed_10m",
    "apparent_temperature", "weathercode", "dew_point_2m", "winddirection_10m",
    "pm2_5", "pm10")

  val Schema: StructType = StructType(
    Seq(
      StructField("city", StringType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("time", StringType, nullable = true)) ++
      Measurements.map(StructField(_, DoubleType, nullable = true)))
}

class OpenMeteoTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"openmeteo($path)"
  override def schema(): StructType = OpenMeteoTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new OpenMeteoScanBuilder(path)
}

class OpenMeteoScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = OpenMeteoTable.Schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new OpenMeteoScan(path, required)
}

case class OpenMeteoInputPartition(file: String, city: String, kind: String)
  extends InputPartition

class OpenMeteoScan(path: String, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"openmeteo $path ReadSchema: ${required.catalogString}"

  /** One partition per raw file; city/kind parsed from the file name
    * (`<slug>_<kind>.json`, the snapshot+latest layout of fetch.py:101-105).
    * Timestamped snapshots are skipped — `latest` files are the live view. */
  override def planInputPartitions(): Array[InputPartition] = {
    val dir = Paths.get(path)
    if (!Files.isDirectory(dir)) return Array.empty
    val Name = "([a-z0-9-]+)_(weather|air)\\.json".r
    Files.list(dir).iterator().asScala
      .flatMap { p =>
        p.getFileName.toString match {
          case Name(slug, kind) => Some(OpenMeteoInputPartition(p.toString, slug, kind))
          case _ => None
        }
      }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new OpenMeteoReaderFactory(required)
}

class OpenMeteoReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new OpenMeteoReader(partition.asInstanceOf[OpenMeteoInputPartition], required)
}

class OpenMeteoReader(part: OpenMeteoInputPartition, required: StructType)
    extends PartitionReader[InternalRow] {

  private val needed = required.fieldNames
  private lazy val rows: Iterator[InternalRow] = {
    val root: JsonNode = new ObjectMapper().readTree(
      Files.readString(Paths.get(part.file)))
    val hourly = root.path("hourly")
    val time = hourly.path("time")
    val n = if (time.isArray) time.size() else 0
    // parse only the measurement arrays the query actually selects, and only
    // when their length matches the time spine (ragged guard, per-field)
    val measurements: Map[String, JsonNode] = needed
      .filter(OpenMeteoTable.Measurements.contains)
      .flatMap { f =>
        val arr = hourly.path(f)
        if (arr.isArray && arr.size() == n) Some(f -> arr) else None
      }.toMap
    (0 until n).iterator.map { i =>
      val values: Array[Any] = needed.map {
        case "city" => UTF8String.fromString(part.city)
        case "kind" => UTF8String.fromString(part.kind)
        case "time" =>
          if (time.get(i).isNull) null else UTF8String.fromString(time.get(i).asText)
        case f =>
          measurements.get(f) match {
            case Some(arr) if arr.get(i).isNumber => java.lang.Double.valueOf(arr.get(i).asDouble)
            case _ => null
          }
      }
      new GenericInternalRow(values)
    }
  }

  private var current: InternalRow = _
  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
