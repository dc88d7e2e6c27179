package graft.weather

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.lit

import graft.operators.{Gold => G}

/** Gold stage: the reference's analytics surface (SURVEY.md §7.1 item 4,
  * Weather_API.py:500-1195) bound to the weather schema — thin wrappers
  * over the generic operators so the semantics live (and are tested)
  * once.
  *
  * Design vs the reference: these run DISTRIBUTED and return small
  * aggregate frames; the reference `toPandas()`-collected full tables 12
  * times and aggregated client-side (SURVEY.md §3 E3).
  */
object WeatherGold {

  /** Per-station ordered observation series (Weather_API.py:522-527). */
  def stationSeries(silver: DataFrame, stationId: String,
      cols: Seq[String]): DataFrame =
    G.entitySeries(silver, "station", stationId, "Date_1", cols)

  /** Monthly climatology per station (Weather_API.py:1040-1042 temp,
    * 1096-1098 precipitation).
    */
  def monthlyClimatology(silver: DataFrame, valueCol: String): DataFrame =
    G.monthlyClimatology(silver, "station", "Date_1", valueCol)

  /** Yearly mean temperature + least-squares trend
    * (Weather_API.py:981-993).
    */
  def yearlyTemperatureTrend(silver: DataFrame): DataFrame =
    G.yearlyTrend(silver, "Date_1", "avg_temperature_rounded")

  /** Precipitation↔temperature Pearson correlation
    * (Weather_API.py:1171).
    */
  def precipTempCorrelation(silver: DataFrame): DataFrame =
    G.correlation(silver, "precipitation", "avg_temperature_rounded")

  /** Month-year geo summary feeding the geo plots
    * (Weather_API.py:841-963): per (station, yyyy-MM) averages.
    */
  def monthYearGeoSummary(silver: DataFrame, valueCols: Seq[String]): DataFrame =
    G.monthYearSummary(silver, "station", "Date_1", valueCols)

  /** Station id → display name remap (Weather_API.py:507-513, 1033). */
  def stationDisplayNames(df: DataFrame, mapping: Map[String, String],
      default: Column = lit("Unknown")): DataFrame =
    G.remap(df, "station", mapping, default)
}
