package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** Grouped top-k as a custom `TypedImperativeAggregate` (the SURVEY §4
  * "custom Aggregator" component): a bounded k-element heap per group,
  * partial-aggregated map-side and merged, instead of a full
  * sort + row_number window.
  *
  * Why it matters at scale: the window formulation shuffles EVERY
  * candidate row to its group's partition and sorts there (Spark's
  * WindowGroupLimit trims per-partition, but rows still sort + shuffle);
  * this aggregate ships at most k rows per group per map task — for
  * top-5-of-2M-candidates, the shuffle drops from 2M rows to
  * 5 × partitions.
  *
  * Result: `array<struct<id, score>>`, score-descending, ties broken by
  * ascending id (deterministic — same tie-break as the oracle's
  * `ORDER BY sim DESC, neighbor_id`).
  */
object TopKAggregate {
  /** `topKBy(id, score, k)` aggregate Column. */
  def topKBy(id: Column, score: Column, k: Int): Column =
    ExpressionUtils.column(TopKByExpr(
      ExpressionUtils.expression(id), ExpressionUtils.expression(score), k
    ).toAggregateExpression())

  /** `minKDistinct(v, k)` aggregate Column: the k smallest DISTINCT
    * longs per group, ascending — the KMV-sketch state
    * ([[graft.operators.Sketches.kmvSketch]]). Same bounded-buffer
    * discipline as [[topKBy]]: each map task ships ≤ k longs per group,
    * vs the full distinct-sort a window formulation pays.
    */
  def minKDistinct(v: Column, k: Int): Column =
    ExpressionUtils.column(MinKDistinctExpr(
      ExpressionUtils.expression(v), k).toAggregateExpression())
}

/** (score desc, id asc) ordering: `worst` = the entry evicted first. */
private[functions] final class TopKBuffer(val k: Int) {
  // simple sorted insertion into arrays of ≤ k elements: for small k the
  // constant beats a heap, and serialization is trivial
  var n: Int = 0
  val ids = new Array[Long](k)
  val scores = new Array[Double](k)

  // java.lang.Double.compare, NOT </==: IEEE comparisons are all false
  // against NaN, which made a NaN entry at the buffer tail block every
  // later insert — results depended on arrival/merge order. compare()
  // totally orders doubles with NaN largest, the same ordering Spark's
  // sort (and the oracle's ORDER BY score DESC) uses, so NaN scores
  // rank first deterministically instead of corrupting the buffer.
  private def beats(s: Double, id: Long, i: Int): Boolean = {
    val c = java.lang.Double.compare(s, scores(i))
    c > 0 || (c == 0 && id < ids(i))
  }

  def insert(id: Long, s: Double): Unit = {
    if (n < k || beats(s, id, n - 1)) {
      var i = math.min(n, k - 1)
      while (i > 0 && beats(s, id, i - 1)) {
        ids(i) = ids(i - 1); scores(i) = scores(i - 1); i -= 1
      }
      ids(i) = id; scores(i) = s
      if (n < k) n += 1
    }
  }

  def mergeFrom(o: TopKBuffer): Unit = {
    var i = 0
    while (i < o.n) { insert(o.ids(i), o.scores(i)); i += 1 }
  }
}

case class TopKByExpr(
    idExpr: Expression,
    scoreExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(idExpr, scoreExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "topk_by"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val idV = idExpr.eval(input)
    val sV = scoreExpr.eval(input)
    if (idV != null && sV != null) {
      buf.insert(idV.asInstanceOf[Long], sV.asInstanceOf[Double])
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val rows = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      rows(i) = InternalRow(buf.ids(i), buf.scores(i)); i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.n * 16)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.ids(i)); bb.putDouble(buf.scores(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.insert(bb.getLong, bb.getDouble); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByExpr =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByExpr =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByExpr =
    copy(idExpr = newChildren(0), scoreExpr = newChildren(1))
}

/** Sorted ascending buffer of ≤ k distinct longs; insertion keeps order
  * and drops duplicates (the KMV invariant: the set of the k SMALLEST
  * DISTINCT hash values — a duplicate hash is the same element seen
  * again and must not displace anything).
  */
private[functions] final class MinKBuffer(val k: Int) {
  var n: Int = 0
  val vs = new Array[Long](k)

  def insert(v: Long): Unit = {
    if (n == k && v >= vs(n - 1)) return
    // binary search for the insertion point; equal → already present
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (vs(mid) < v) lo = mid + 1
      else if (vs(mid) > v) hi = mid
      else return
    }
    val last = math.min(n, k - 1)
    var i = last
    while (i > lo) { vs(i) = vs(i - 1); i -= 1 }
    vs(lo) = v
    if (n < k) n += 1
  }

  def mergeFrom(o: MinKBuffer): Unit = {
    var i = 0
    while (i < o.n) { insert(o.vs(i)); i += 1 }
  }
}

case class MinKDistinctExpr(
    vExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MinKBuffer] {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(vExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "min_k_distinct"

  override def createAggregationBuffer(): MinKBuffer = new MinKBuffer(k)

  override def update(buf: MinKBuffer, input: InternalRow): MinKBuffer = {
    val v = vExpr.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: MinKBuffer, other: MinKBuffer): MinKBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: MinKBuffer): Any = {
    val out = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) { out(i) = buf.vs(i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: MinKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.n * 8)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.vs(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MinKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new MinKBuffer(k)
    var i = 0
    while (i < n) { buf.insert(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MinKDistinctExpr =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinKDistinctExpr =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinKDistinctExpr =
    copy(vExpr = newChildren(0))
}
