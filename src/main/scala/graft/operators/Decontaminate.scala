package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the pre-training curation step that
  * screens the corpus against evaluation sets: a training document is
  * CONTAMINATED when it shares any length-`n` token shingle with a
  * benchmark document (the n-gram-overlap definition used by the GPT-3
  * appendix-C / PaLM decontamination procedures; n = 13 is the
  * published default, configurable because short-document corpora need
  * smaller windows to overlap at all).
  *
  * Scale shape: the benchmark side is small BY DEFINITION (eval sets
  * are thousands of documents, the corpus is billions), so its distinct
  * shingle set broadcasts, and the 100 TB side is one scan + explode +
  * broadcast left_semi — the corpus never shuffles document content.
  * The only shuffled rows are the matched doc ids (contamination-sized)
  * for the distinct, and the id-only flag join back. Shingling rides
  * the codegen'd [[graft.functions.ShingleFunctions.wordShingles]]
  * kernel (one pass per row, no interpreted HOF).
  */
object Decontaminate {

  /** Every document id with a `contaminated` flag. */
  def flagContaminated(docs: DataFrame, benchmark: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      n: Int = 13): DataFrame = {
    require(n >= 1, s"shingle length must be >= 1, got $n")
    val bench = benchmark
      .select(explode(graft.functions.ShingleFunctions
        .wordShingles(col(textCol), n)).as("__g"))
      .distinct()
    val hits = docs
      .select(col(idCol), explode(graft.functions.ShingleFunctions
        .wordShingles(col(textCol), n)).as("__g"))
      .join(broadcast(bench), Seq("__g"), "left_semi")
      .select(col(idCol)).distinct()
      .withColumn("__c", lit(true))
    docs.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("__c"), lit(false)).as("contaminated"))
  }

  /** The corpus with contaminated documents REMOVED (all original
    * columns kept) — [[flagContaminated]]'s anti-join form for
    * pipelines that drop rather than label.
    */
  def removeContaminated(docs: DataFrame, benchmark: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      n: Int = 13): DataFrame = {
    val contaminated = flagContaminated(docs, benchmark, textCol, idCol, n)
      .filter(col("contaminated")).select(col(idCol))
    docs.join(contaminated, Seq(idCol), "left_anti")
  }
}
