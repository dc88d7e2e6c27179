package graft

/** Dev aid: print the formatted physical plan of selected registered
  * queries (all, if none named) — the `.explain("formatted")` loop the
  * plan-audit workflow uses. Not part of the driver contract.
  *
  * Usage: runMain graft.Explain <sfDir> [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names =
      if (args.length > 1) args.tail.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = Sessions.local("8", "graft-explain")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode
          .fromString("formatted")))
    }
    spark.stop()
  }
}
