package graft.weather

import org.apache.spark.sql.types._

/** Explicit schemas for the weather data model (SURVEY.md §1.2-1.3).
  *
  * The reference declares an observation schema (Weather_API.py:175-190)
  * but never applies it — `createDataFrame(data)` at Weather_API.py:194
  * infers from pandas instead, so `weather_type_1` and
  * `wind_direction_2min` end up double. We fix the dead-schema bug by
  * intent: schemas here are APPLIED at read time, and the two columns are
  * declared double to match the semantics the reference actually runs
  * with (NOAA WT01 is a 1.0/NaN flag; WDF2 has NaNs — SURVEY.md §1.2).
  */
object WeatherSchemas {

  /** NOAA CDO long-format records (the /data API shape,
    * Weather_API.py:76-91; fixture FIXTURES.md §A1).
    */
  val noaaLong: StructType = StructType(Seq(
    StructField("date", StringType, nullable = true),
    StructField("station", StringType, nullable = true),
    StructField("latitude", DoubleType, nullable = true),
    StructField("longitude", DoubleType, nullable = true),
    StructField("datatype", StringType, nullable = true),
    StructField("value", DoubleType, nullable = true)))

  /** NOAA datatype → wide column name (Weather_API.py:34-45). Closed
    * 10-entry vocabulary; unknown datatypes are dropped
    * (Weather_API.py:78).
    */
  val columnsMapping: Seq[(String, String)] = Seq(
    "PRCP" -> "precipitation",
    "SNOW" -> "snowfall",
    "SNWD" -> "snow_depth",
    "TMAX" -> "max_temperature",
    "TMIN" -> "min_temperature",
    "AWND" -> "avg_wind_speed",
    "WDF2" -> "wind_direction_2min",
    "WSF2" -> "fastest_2min_wind",
    "WT01" -> "weather_type_1",
    "TAVG" -> "avg_temperature")

  val datatypeVocabulary: Seq[String] = columnsMapping.map(_._1)

  /** Wide observation table (Weather_API.py:175-190, with the two
    * inferred-double corrections noted above).
    */
  val observationsWide: StructType = StructType(
    Seq(
      StructField("date", StringType, nullable = true),
      StructField("station", StringType, nullable = true),
      StructField("latitude", DoubleType, nullable = true),
      StructField("longitude", DoubleType, nullable = true)) ++
      columnsMapping.map { case (_, name) =>
        StructField(name, DoubleType, nullable = true)
      })

  /** Station dimension (Weather_API.py:287-292; API-station_data.csv). */
  val station: StructType = StructType(Seq(
    StructField("station_id", StringType, nullable = true),
    StructField("name", StringType, nullable = true),
    StructField("latitude", DoubleType, nullable = true),
    StructField("longitude", DoubleType, nullable = true)))
}
