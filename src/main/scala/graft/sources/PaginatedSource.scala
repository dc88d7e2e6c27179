package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.weather.WeatherSchemas

/** One page of long-format records, as plain values
  * (date, station, latitude, longitude, datatype, value) — nulls allowed
  * for the numeric fields.
  */
trait PageFetcher extends Serializable {
  def fetch(station: String, year: Int, offset: Int, limit: Int)
      : Seq[(String, String, Option[Double], Option[Double], String, Option[Double])]
}

/** DataSource V2 for the reference's paginated ingest (SURVEY.md §2.1
  * S1/S2, Weather_API.py:48-97): the reference walks
  * station × year × page in a single-threaded driver loop with a 1 s
  * sleep per page; here each (station, year) cell is an
  * `InputPartition`, so the pagination loops run IN PARALLEL on
  * executors and the result is a DataFrame from the first touch — at 5
  * stations × 75 years that is 375-way fetch parallelism instead of a
  * serial driver crawl.
  *
  * The network client is pluggable (and out of engine scope, per
  * SURVEY): `fetcher` names a [[PageFetcher]] class instantiated
  * reflectively ON THE EXECUTOR — nothing non-serializable crosses the
  * plan. Tests plug a deterministic in-memory fetcher; production would
  * plug an HTTP client with the NOAA pacing policy.
  *
  * Options: `stations` (comma-separated), `startYear`, `endYear`,
  * `pageSize`, `fetcher` (class name).
  *
  * Usage: `spark.read.format("graft.sources.PaginatedSource")
  *   .option("stations", "A,B").option("startYear", "2023")...load()`
  */
class PaginatedSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WeatherSchemas.noaaLong

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PaginatedTable(new CaseInsensitiveStringMap(properties))
}

private class PaginatedTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "paginated_source"
  override def schema(): StructType = WeatherSchemas.noaaLong
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  // required options checked by name at planning time — a missing or
  // misspelled option must fail with a message naming it, not as a bare
  // NullPointerException (driver-side here, or worse, executor-side in
  // Class.forName(null))
  private def required(key: String): String = {
    val v = options.get(key)
    require(v != null && v.nonEmpty,
      s"paginated_source requires option '$key' " +
        "(required: stations, startYear, endYear, fetcher)")
    v
  }

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = WeatherSchemas.noaaLong
      override def toBatch: Batch = this

      override def planInputPartitions(): Array[InputPartition] = {
        val stations = required("stations").split(",").map(_.trim).toSeq
        val startYear = required("startYear").toInt
        val endYear = required("endYear").toInt
        (for (s <- stations; y <- startYear to endYear)
          yield StationYearPartition(s, y): InputPartition).toArray
      }

      override def createReaderFactory(): PartitionReaderFactory =
        PaginatedReaderFactory(required("fetcher"),
          options.getInt("pageSize", 1000))
    }
}

private case class StationYearPartition(station: String, year: Int)
    extends InputPartition

private case class PaginatedReaderFactory(fetcherClass: String, pageSize: Int)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[StationYearPartition]
    new PartitionReader[InternalRow] {
      // instantiated executor-side; the class name is all that ships
      private val fetcher = Class.forName(fetcherClass)
        .getDeclaredConstructor().newInstance().asInstanceOf[PageFetcher]
      private var offset = 0
      private var page: Iterator[(String, String, Option[Double],
        Option[Double], String, Option[Double])] = Iterator.empty
      private var exhausted = false
      private var current: InternalRow = _

      private def refill(): Unit =
        if (!exhausted && page.isEmpty) {
          val batch = fetcher.fetch(part.station, part.year, offset, pageSize)
          offset += pageSize
          if (batch.size < pageSize) exhausted = true // short/empty page ends
          page = batch.iterator
        }

      override def next(): Boolean = {
        refill()
        if (page.hasNext) {
          val (d, s, lat, lon, dt, v) = page.next()
          current = InternalRow(
            UTF8String.fromString(d), UTF8String.fromString(s),
            lat.map(Double.box).orNull, lon.map(Double.box).orNull,
            UTF8String.fromString(dt), v.map(Double.box).orNull)
          true
        } else false
      }

      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
