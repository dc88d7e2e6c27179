package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Shared `checkInputDataTypes` bodies for the custom expressions: all
  * of them are SQL-registered ([[GraftExtensions]]), so a wrong argument
  * type must surface as a clean analysis-time failure naming the
  * function — not a ClassCastException deep inside eval/codegen.
  */
private[functions] object TypeChecks {

  def vector(name: String, dt: DataType): TypeCheckResult = dt match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case o => fail(name, "array<float> or array<double>", o)
  }

  /** [[vector]] plus array<int> — the int8-quantized code vectors of
    * [[VectorFunctions.int8Quantize]] dot exactly like float vectors
    * (codes are ≤ 127 in magnitude, so a double accumulator is exact).
    */
  def numericVector(name: String, dt: DataType): TypeCheckResult = dt match {
    case ArrayType(FloatType | DoubleType | IntegerType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case o => fail(name, "array<float>, array<double> or array<int>", o)
  }

  def stringArray(name: String, dt: DataType): TypeCheckResult = dt match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case o => fail(name, "array<string>", o)
  }

  def longArray(name: String, dt: DataType): TypeCheckResult = dt match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case o => fail(name, "array<bigint>", o)
  }

  def string(name: String, dt: DataType): TypeCheckResult = dt match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case o => fail(name, "string", o)
  }

  def both(a: TypeCheckResult, b: => TypeCheckResult): TypeCheckResult =
    if (a.isSuccess) b else a

  private def fail(name: String, want: String, got: DataType) =
    TypeCheckResult.TypeCheckFailure(
      s"$name requires $want, got ${got.simpleString}")
}
