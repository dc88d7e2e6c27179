package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Vocabulary-membership kernel for tokenizer-fit measurement
  * ([[graft.operators.TextAnalysis.vocabCoverage]]).
  *
  * Why a custom expression: the obvious forms are all linear in |vocab|
  * PER TOKEN — `array_contains(typedLit(vocab), t)` inside a HOF lambda
  * is an interpreted scan of the literal array, and even
  * `map_contains_key` on a literal map is a linear key walk (Catalyst
  * literal maps are `ArrayBasedMapData`, which has no hash index). At a
  * real 32k–100k BPE vocabulary that is O(tokens × |vocab|) interpreted
  * work per row. This expression builds ONE `java.util.HashSet[UTF8String]`
  * per expression instance (driver-side, shipped via the codegen
  * references array / rebuilt lazily after deserialization) and probes it
  * at O(1) per token from inside whole-stage codegen.
  */
object VocabFunctions {
  /** Count of `tokens` elements present in `vocab` (exact, case-sensitive,
    * null elements don't count). O(1) per token against a hash set.
    */
  def inVocabCount(tokens: Column, vocab: Seq[String]): Column =
    ExpressionUtils.column(
      InVocabCountExpr(ExpressionUtils.expression(tokens), vocab))
}

/** See [[VocabFunctions.inVocabCount]]. The vocabulary is a constructor
  * literal (tokenizer vocabs ship with the JOB, not as a table): a few
  * 100k entries is a few MB of plan — well inside task-binary budgets —
  * and keeping it plan-side means NO join, no shuffle, no broadcast
  * exchange in the query it guards.
  */
case class InVocabCountExpr(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  require(vocab.nonEmpty, "in_vocab_count needs a non-empty vocabulary")

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "in_vocab_count"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.stringArray(prettyName, child.dataType)

  // Rebuilt lazily on executors after plan deserialization (interpreted
  // path); the codegen path carries it in the references array.
  @transient private lazy val set: java.util.HashSet[UTF8String] =
    InVocabCountExpr.buildSet(vocab)

  protected override def nullSafeEval(input: Any): Any =
    InVocabCountExpr.count(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("vocabSet", set, "java.util.HashSet")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.InVocabCountExpr.count($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object InVocabCountExpr {
  def buildSet(vocab: Seq[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](math.max(16, vocab.size * 2))
    vocab.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  /** Shared by eval and generated code (static forwarder). */
  def count(arr: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val n = arr.numElements()
    var i = 0
    var c = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }
}
