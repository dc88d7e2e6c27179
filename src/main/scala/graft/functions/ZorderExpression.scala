package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types._

/** Codegen'd k-dimensional Morton interleave kernel behind
  * [[graft.sources.Layout.zorderKeyN]].
  *
  * Why an expression and not composed Column arithmetic: the MSB-first
  * fold is 63 chained shift-or nodes, and at that depth the composed
  * form measured 4.3 s vs the 2-D spread's 0.12 s on the q233 scan —
  * a ~36× interpreted-path penalty for what is one `while` loop of
  * register ops per row. The kernel does exactly the fold the q233
  * oracle replays in closed form; out-of-range dimensions throw with
  * the same message the Column form raised, and any NULL dimension
  * nulls the key.
  */
case class ZorderKeyNExpr(children: Seq[Expression]) extends Expression {

  require(children.size >= 2,
    s"zorderKeyN needs >= 2 dimensions, got ${children.size}")
  require(children.size <= 8,
    s"beyond 8 dimensions the per-dim range (2^${63 / 8}) stops being " +
      s"a useful clustering domain, got ${children.size}")

  private val bitsPerDim = 63 / children.size

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "zorder_key_n"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects BIGINT dimensions, got " +
        children.map(_.dataType.simpleString).mkString(", "))

  override def eval(input: InternalRow): Any = {
    val vals = new Array[Long](children.size)
    var i = 0
    while (i < children.size) {
      val v = children(i).eval(input)
      if (v == null) return null
      vals(i) = v.asInstanceOf[Long]
      i += 1
    }
    ZorderKeyNExpr.interleave(vals, bitsPerDim)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = children.size
    val arr = ctx.freshName("zdims")
    val evals = children.zipWithIndex.map { case (c, i) =>
      val e = c.genCode(ctx)
      // Guarded so a null child short-circuits the REST of the children,
      // exactly like eval()'s early return — without the guard a later
      // child that throws (ANSI overflow, raise_error) would fail under
      // codegen but yield NULL interpreted.
      code"""if (!${ev.isNull}) {
            |  ${e.code}
            |  if (${e.isNull}) { ${ev.isNull} = true; }
            |  else { $arr[$i] = ${e.value}; }
            |}
            |""".stripMargin
    }
    ev.copy(code =
      code"""boolean ${ev.isNull} = false;
            |long ${ev.value} = -1L;
            |long[] $arr = new long[$n];
            |${evals.reduce(_ + _)}
            |if (!${ev.isNull}) {
            |  ${ev.value} =
            |    graft.functions.ZorderKeyNExpr.interleave($arr, $bitsPerDim);
            |}
            |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object ZorderKeyNExpr {

  /** Shared by eval and generated code (static forwarder): range-check
    * every dimension, then the MSB-first fold — bit b of dim i lands at
    * position b·k + (k−1−i).
    */
  def interleave(dims: Array[Long], bitsPerDim: Int): Long = {
    val bound = 1L << bitsPerDim
    var i = 0
    while (i < dims.length) {
      if (dims(i) < 0L || dims(i) >= bound) {
        throw new IllegalArgumentException(
          s"zorderKeyN: input out of [0, 2^$bitsPerDim): ${dims(i)}")
      }
      i += 1
    }
    var key = 0L
    var b = bitsPerDim - 1
    while (b >= 0) {
      var j = 0
      while (j < dims.length) {
        key = (key << 1) | ((dims(j) >> b) & 1L)
        j += 1
      }
      b -= 1
    }
    key
  }
}
