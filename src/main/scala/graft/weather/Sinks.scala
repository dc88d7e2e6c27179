package graft.weather

import org.apache.spark.sql.{DataFrame, Row}

/** Sinks (SURVEY.md §2.1 S6-S8).
  *
  * The reference's export is a header CSV overwrite
  * (Weather_API.py:1180-1184) and repeated `toPandas()` full collects
  * (12 call sites). Ours: distributed CSV write (one file per partition —
  * NO `coalesce(1)`; a single-file write serializes 100 TB through one
  * task), and collect reserved for small aggregate results only.
  */
object Sinks {

  /** S6 — header CSV sink, distributed (one part-file per partition). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.option("header", "true").mode("overwrite").csv(path)

  /** S7 — collect-to-driver, for SMALL (aggregate) results only. */
  def collectRows(df: DataFrame): Array[Row] = df.collect()
}
