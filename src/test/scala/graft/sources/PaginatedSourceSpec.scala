package graft.sources

import graft.SparkSpec
import graft.weather.{Bronze, WeatherSchemas}

/** Deterministic in-memory fetcher: 25 records per (station, year),
  * paged — exercises the multi-page loop (pageSize 10 → pages of
  * 10/10/5) and the short-page termination.
  */
class FakeNoaaFetcher extends PageFetcher {
  override def fetch(station: String, year: Int, offset: Int, limit: Int)
      : Seq[(String, String, Option[Double], Option[Double], String, Option[Double])] = {
    val total = 25
    val types = WeatherSchemas.datatypeVocabulary
    (offset until math.min(offset + limit, total)).map { i =>
      (f"$year-01-${i % 28 + 1}%02dT00:00:00", station,
        Some(40.0), Some(-73.0), types(i % types.size), Some(i.toDouble))
    }
  }
}

class PaginatedSourceSpec extends SparkSpec {

  private def read(stations: String, y0: Int, y1: Int, pageSize: Int = 10) =
    spark.read.format("graft.sources.PaginatedSource")
      .option("stations", stations)
      .option("startYear", y0.toString)
      .option("endYear", y1.toString)
      .option("pageSize", pageSize.toString)
      .option("fetcher", classOf[FakeNoaaFetcher].getName)
      .load()

  test("S1: one partition per (station, year); pagination loop drains pages") {
    val df = read("GHCND:A,GHCND:B", 2020, 2022)
    assert(df.schema == WeatherSchemas.noaaLong)
    assert(df.count() == 2 * 3 * 25)
    assert(df.rdd.getNumPartitions == 6) // 2 stations × 3 years
  }

  test("S1: exact page boundary terminates (no infinite loop, no dup page)") {
    val df = read("GHCND:A", 2020, 2020, pageSize = 25)
    assert(df.count() == 25)
  }

  test("S1→A9: the distributed ingest feeds the Bronze pivot directly") {
    val wide = Bronze.pivotToWide(read("GHCND:A", 2020, 2020))
    assert(wide.schema.fieldNames.toSeq ==
      WeatherSchemas.observationsWide.fieldNames.toSeq)
    assert(wide.count() > 0)
  }
}
