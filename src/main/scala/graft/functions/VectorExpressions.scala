package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** Custom Catalyst expressions (with `doGenCode`) for the three hot
  * kernels of the dedup/similarity families. The built-in higher-order
  * functions (`transform`/`aggregate`/`zip_with`) are interpreted — every
  * lambda application allocates and boxes — and `CollapseProject` inlines
  * a projected array INTO an enclosing lambda, re-evaluating it once per
  * outer iteration (the k=32 minhash loop re-built the shingle array 32×
  * per row: 117 s for 5000 docs at sf0.1). These expressions compile to
  * tight JVM loops inside whole-stage codegen and evaluate their input
  * exactly once: the same stage runs in under a second.
  *
  * Each expression implements BOTH `nullSafeEval` (interpreted fallback —
  * used off the codegen path, e.g. under `explain` sampling or codegen
  * bailout) and `doGenCode`, and is exposed as a `Column` via
  * [[VectorFunctions]].
  */
object VectorFunctions {
  /** k seeded-xxhash64 min-hashes over an array<string> shingle set. */
  def minhashSignature(shingles: Column, k: Int): Column =
    ExpressionUtils.column(
      MinHashSignatureExpr(ExpressionUtils.expression(shingles), k))

  /** Dot product of two float/double arrays, accumulated in double
    * left-to-right (bit-identical to the zip_with+aggregate formulation
    * and to the DuckDB oracle's list_sum).
    */
  def dotProduct(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DotProductExpr(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Banded random-hyperplane (SRP) signature of a float/double vector:
    * `bands` longs, each packing `rowsPerBand` sign bits of seeded ±1
    * projections — the cosine-LSH bucket keys (see
    * [[graft.operators.Similarity.hyperplaneNearDupPairs]]).
    */
  def hyperplaneBands(vec: Column, bands: Int, rowsPerBand: Int,
      seed: Long = 42L): Column =
    ExpressionUtils.column(HyperplaneBandsExpr(
      ExpressionUtils.expression(vec), bands, rowsPerBand, seed))

  /** GENERATOR form of [[hyperplaneBands]]: one (band, key) row per band,
    * signature computed exactly once per input row. Use this (not
    * `posexplode(hyperplaneBands(...))`) to build the LSH index:
    * `InferFiltersFromGenerate` rewrites an explode over an expression
    * into `Filter(size(e) > 0) + Generate(e)` and pushes the filter into
    * the scan — evaluating the full 96-projection signature TWICE per
    * row. The rule only fires for ExplodeBase/Inline, so a custom
    * generator sidesteps it; with `bands` output rows per input the
    * per-element generator overhead is negligible next to the signature.
    */
  def hyperplaneBandRows(vec: Column, bands: Int, rowsPerBand: Int,
      seed: Long = 42L): Column =
    ExpressionUtils.column(HyperplaneBandRowsExpr(
      ExpressionUtils.expression(vec), bands, rowsPerBand, seed))

  /** Count of common elements of two SORTED distinct long arrays. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedIntersectCountExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** 60-bit md5-derived SimHash over an array<string> token set (value
    * is oracle-locked: DuckDB reproduces it — see Dedup scaladoc).
    */
  def simhash60(tokens: Column): Column =
    ExpressionUtils.column(SimHash60Expr(ExpressionUtils.expression(tokens)))

  /** The (numBits m, numHashFunctions k) sizing [[bloomFilterAgg]]
    * actually builds with: m = 8·expectedItems is the Literal the
    * aggregate is constructed from (below), and k is what Spark's
    * BloomFilterImpl derives from (m, n) — max(1, round(m/n·ln 2)).
    * ONE shared source of truth, kept next to the aggregate, so audits
    * ([[graft.operators.Sketches.bloomFppAudit]]'s design_fpp) describe
    * the SAME sketch the aggregate builds — if this sizing ever changes,
    * the audit moves with it instead of silently drifting (ADVICE r8).
    */
  def bloomSizing(expectedItems: Long): (Long, Int) = {
    val m = expectedItems * 8
    val k = math.max(1,
      math.round(m.toDouble / expectedItems * math.log(2)).toInt)
    (m, k)
  }

  /** Bloom-filter aggregate over pre-hashed (xxhash64) longs — Spark's
    * internal BloomFilterAggregate (the runtime-filter sketch), exposed
    * as a library function. Bits sized per [[bloomSizing]] (8× items,
    * FPP ≈ 2%).
    */
  def bloomFilterAgg(hashedKey: Column, expectedItems: Long): Column = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    ExpressionUtils.column(new BloomFilterAggregate(
      ExpressionUtils.expression(hashedKey),
      Literal(expectedItems), Literal(bloomSizing(expectedItems)._1)
    ).toAggregateExpression())
  }

  /** Membership probe against a [[bloomFilterAgg]] sketch. */
  def mightContain(bloom: Column, hashedKey: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    ExpressionUtils.column(BloomFilterMightContain(
      ExpressionUtils.expression(bloom), ExpressionUtils.expression(hashedKey)))
  }

  /** Per-vector symmetric int8 quantization:
    * struct(scale double, codes array<int>) with
    * scale = max|v| / 127 and codeᵢ = ⌊vᵢ/scale + 0.5⌋ (half-up toward
    * +∞ — floor arithmetic, identical in every IEEE engine; NOT a
    * rounding-mode bet). Codes are in [−127, 127] — one byte of
    * information per dimension, stored as int here and cast to
    * tinyint/binary at the writer (Parquet dictionary/byte-stream-split
    * encodings recover the 4× size win either way). A zero vector gets
    * scale 0 and all-zero codes.
    */
  def int8Quantize(vec: Column): Column =
    ExpressionUtils.column(
      Int8QuantizeExpr(ExpressionUtils.expression(vec)))
}

/** See [[VectorFunctions.minhashSignature]]. Null array elements are
  * skipped; an all-null/empty input yields Long.MaxValue signatures
  * (never matching a band of any non-empty doc).
  */
case class MinHashSignatureExpr(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, s"minhash_signature k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signature"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.stringArray(prettyName, child.dataType)

  protected override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    new GenericArrayData(MinHashSignatureExpr.signature(arr, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.MinHashSignatureExpr.signature($c, $k))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignatureExpr {
  /** Shared by eval and generated code (static forwarder). */
  def signature(arr: ArrayData, k: Int): Array[Long] = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        var j = 0
        while (j < k) {
          val h = XXH64.hashUnsafeBytes(
            s.getBaseObject, s.getBaseOffset, s.numBytes, j.toLong)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    mins
  }
}

/** See [[VectorFunctions.dotProduct]]. Arrays must be same-length and
  * null-free (embedding vectors); accumulation order is index-ascending.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.both(TypeChecks.numericVector(prettyName, left.dataType),
      TypeChecks.numericVector(prettyName, right.dataType))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_product"

  // array<int> (quantized codes) reads via getInt; float/double as before
  private def getter(e: Expression): String =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => "getFloat"
      case IntegerType => "getInt"
      case _ => "getDouble"
    }

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(x.numElements(), y.numElements())
    def get(arr: ArrayData, e: Expression, i: Int): Double =
      getter(e) match {
        case "getFloat" => arr.getFloat(i).toDouble
        case "getInt" => arr.getInt(i).toDouble
        case _ => arr.getDouble(i)
      }
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += get(x, left, i) * get(y, right, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getX = getter(left)
    val getY = getter(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      // acc must be freshName'd too: with non-nullable children the block
      // is emitted without enclosing braces, so a second dot_product in
      // the same codegen stage would redeclare a hardcoded local and fail
      // compilation (→ silent interpreted fallback).
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.$getX($i)) * ((double) $b.$getY($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** See [[VectorFunctions.hyperplaneBands]]. Sign-random-projection LSH
  * (Charikar's SimHash for cosine): bit k is the sign of the dot product
  * with a deterministic ±1 (Rademacher) hyperplane whose entries come
  * from xxhash64(k, i); a pair at angle θ agrees on each bit with
  * p = 1 − θ/π, so a band of r bits collides with p^r and b bands miss a
  * pair with (1 − p^r)^b. One pass over the vector: elements are read
  * once and pushed into all `bands·rowsPerBand` accumulators.
  */
case class HyperplaneBandsExpr(child: Expression, bands: Int,
    rowsPerBand: Int, seed: Long) extends UnaryExpression {

  require(bands >= 1, s"hyperplane_bands bands must be >= 1, got $bands")
  require(rowsPerBand >= 1 && rowsPerBand <= 64,
    s"hyperplane_bands rowsPerBand must be in [1, 64] (band keys are " +
      s"64-bit; shifts past 64 silently alias bits), got $rowsPerBand")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.vector(prettyName, child.dataType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_bands"

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected override def nullSafeEval(input: Any): Any =
    HyperplaneBandsExpr.bandKeys(input.asInstanceOf[ArrayData], elemIsFloat,
      bands, rowsPerBand, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneBandsExpr.bandKeys($c, $elemIsFloat, " +
        s"$bands, $rowsPerBand, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** See [[VectorFunctions.hyperplaneBandRows]]. */
case class HyperplaneBandRowsExpr(child: Expression, bands: Int,
    rowsPerBand: Int, seed: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.Generator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(bands >= 1, s"hyperplane_band_rows bands must be >= 1, got $bands")
  require(rowsPerBand >= 1 && rowsPerBand <= 64,
    s"hyperplane_band_rows rowsPerBand must be in [1, 64], got $rowsPerBand")

  override def elementSchema: StructType = StructType(Seq(
    StructField("band", IntegerType, nullable = false),
    StructField("key", LongType, nullable = false)))
  override def prettyName: String = "hyperplane_band_rows"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.vector(prettyName, child.dataType)

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow)
      : IterableOnce[org.apache.spark.sql.catalyst.InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val keys = HyperplaneBandsExpr.bandKeys(v.asInstanceOf[ArrayData],
        elemIsFloat, bands, rowsPerBand, seed)
      (0 until bands).map(j =>
        org.apache.spark.sql.catalyst.InternalRow(j, keys.getLong(j)))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBandsExpr {
  /** Packed ±1 hyperplane sign matrix: bit (i·bits + k) set ⟺ dimension
    * i contributes +v to accumulator k. The signs are data-independent —
    * xxhash64 of (k, i) under the seed — but were previously recomputed
    * for every (bit, dim) pair on EVERY ROW (dim × bits hashes per row,
    * ≈147k/row for 1536-dim embeddings at b=8, r=12), dominating the
    * signature cost. Built once per (bits, seed) and grown if a wider
    * vector appears; i-major packing keeps the inner k-loop on
    * consecutive bits of the same words.
    */
  private final class SignMatrix(val dim: Int, bits: Int, seed: Long) {
    val words: Array[Long] = {
      val w = new Array[Long](((dim * bits + 63) >>> 6) + 1)
      var i = 0
      while (i < dim) {
        var k = 0
        while (k < bits) {
          val h = XXH64.hashLong((k.toLong << 32) | (i.toLong & 0xffffffffL), seed)
          if ((h & 1L) == 0L) {
            val b = i * bits + k
            w(b >>> 6) |= (1L << (b & 63))
          }
          k += 1
        }
        i += 1
      }
      w
    }
  }

  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Long), SignMatrix]()

  private def signs(bits: Int, seed: Long, dim: Int): SignMatrix = {
    val key = (bits, seed)
    val cur = signCache.get(key)
    if (cur != null && cur.dim >= dim) cur
    else {
      // idempotent under races: any winner encodes the same hash bits
      val m = new SignMatrix(math.max(dim, if (cur == null) 0 else cur.dim),
        bits, seed)
      signCache.put(key, m)
      m
    }
  }

  /** Shared by eval and generated code (static forwarder). */
  def bandKeys(vec: ArrayData, isFloat: Boolean, bands: Int,
      rowsPerBand: Int, seed: Long): GenericArrayData = {
    val bits = bands * rowsPerBand
    val dim = vec.numElements()
    val acc = new Array[Double](bits)
    val sm = signs(bits, seed, dim).words
    var i = 0
    while (i < dim) {
      val v = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      val base = i * bits
      var k = 0
      while (k < bits) {
        val b = base + k
        if ((sm(b >>> 6) & (1L << (b & 63))) != 0L) acc(k) += v else acc(k) -= v
        k += 1
      }
      i += 1
    }
    val keys = new Array[Long](bands)
    var j = 0
    while (j < bands) {
      var key = 0L
      var t = 0
      while (t < rowsPerBand) {
        if (acc(j * rowsPerBand + t) >= 0) key |= (1L << t)
        t += 1
      }
      keys(j) = key
      j += 1
    }
    new GenericArrayData(keys)
  }
}

/** See [[VectorFunctions.sortedIntersectCount]]: linear merge over two
  * ascending-sorted distinct long arrays.
  */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.both(TypeChecks.longArray(prettyName, left.dataType),
      TypeChecks.longArray(prettyName, right.dataType))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_intersect_count"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCountExpr.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedIntersectCountExpr.count($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCountExpr {
  def count(a: ArrayData, b: ArrayData): Int = {
    var i = 0; var j = 0; var c = 0
    val (na, nb) = (a.numElements(), b.numElements())
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

/** See [[VectorFunctions.simhash60]]: per bit of a 60-bit md5-derived
  * token hash, tokens vote ±1; the sign becomes the output bit. The hash
  * is the first 15 md5 hex digits parsed as a long — identical to
  * DuckDB's ('0x' || substr(md5(s),1,15))::BIGINT, so the VALUE is
  * oracle-checkable (unlike the minhash signatures, which are internal).
  */
case class SimHash60Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.stringArray(prettyName, child.dataType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash60"

  protected override def nullSafeEval(input: Any): Any =
    SimHash60Expr.ofTokens(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash60Expr.ofTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash60Expr {
  private val Bits = 60

  /** 60-bit hash: first 15 hex digits of md5 (matches Dedup's portable
    * hashing convention).
    */
  def hash60(bytes: Array[Byte]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(bytes)
    // First 15 hex digits = first 7 bytes + high nibble of the 8th.
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >> 4)
  }

  def ofTokens(tokens: ArrayData): Long = {
    val votes = new Array[Int](Bits)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = hash60(tokens.getUTF8String(i).getBytes)
        var j = 0
        while (j < Bits) {
          if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < Bits) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}

/** See [[VectorFunctions.int8Quantize]]. The reconstruction error per
  * element is ≤ scale/2 = max|v|/254 — the bound SimilaritySpec's
  * recall gate (quantized vs exact cosine top-k) rides on.
  */
case class Int8QuantizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = Int8QuantizeExpr.schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "int8_quantize"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.vector(prettyName, child.dataType)

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected override def nullSafeEval(input: Any): Any =
    Int8QuantizeExpr.quantize(input.asInstanceOf[ArrayData], elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Int8QuantizeExpr.quantize($c, $elemIsFloat)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Int8QuantizeExpr {
  val schema: StructType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("codes", ArrayType(IntegerType, containsNull = false),
      nullable = false)))

  /** Shared by eval and generated code (static forwarder). */
  def quantize(arr: ArrayData, isFloat: Boolean)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val n = arr.numElements()
    def get(i: Int): Double =
      if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
    var amax = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(get(i))
      if (v > amax) amax = v
      i += 1
    }
    val scale = amax / 127.0
    val codes = new Array[Int](n)
    if (scale > 0.0) {
      i = 0
      while (i < n) {
        codes(i) = math.floor(get(i) / scale + 0.5).toInt
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.InternalRow(
      scale, new GenericArrayData(codes))
  }
}
