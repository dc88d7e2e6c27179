package graft

/** Dev tool: print the executed plan of named queries — the workflow for
  * verifying pushdown/pruning/broadcast/codegen after every operator
  * change (`sbt "runMain graft.PlanDump q02_filter_project ..."`; no
  * args = a representative sample). `SPARK_GRAFT_EXPLAIN_MODE=formatted`
  * (or any other ExplainMode name) switches the rendering.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8", "graft-plandump")
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val mode = sys.env.get("SPARK_GRAFT_EXPLAIN_MODE")
      .map(org.apache.spark.sql.execution.ExplainMode.fromString)
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q02_filter_project", "q15_topk", "q20_window_rolling",
        "q06_impute_group_avg", "q36_minhash_neardup", "q40_cosine_topk")
    names.foreach { q =>
      println(s"==== $q ====")
      val qe = SparkEntry.queries(q)(spark, d).queryExecution
      println(mode.fold(qe.executedPlan.toString)(qe.explainString))
    }
    spark.stop()
  }
}
