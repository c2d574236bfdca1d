package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native banded random-hyperplane LSH bucketing: all `bands` band buckets
  * of a vector in one pass, as a primitive `array<int>`.
  *
  * The declarative form (per plane: `aggregate(zip_with(vec, sequence(...),
  * ...))`) runs INTERPRETED — bands * planes lambda-dispatched folds per
  * row, the dominant cost of the LSH dedup/ANN family. This expression
  * generates one tight nested loop (`doGenCode`), with an interpreted
  * `nullSafeEval` fallback.
  *
  * Bit-parity contract with the declarative form AND the DuckDB oracle
  * (`TrainingQueries.bucketSqlAt`): plane weights are the deterministic
  * integer grid `w(g, i) = ((g * 131 + i * 31) % 17) - 8` over GLOBAL plane
  * id `g = band * planesPerBand + p`; each projection accumulates
  * left-to-right from 0.0 with elements widened to double BEFORE the
  * multiply; sign bit p contributes `1 << p`. A NULL vector yields NULL
  * (the row drops out of bucketing — a null embedding must not congregate
  * in bucket 0 with real vectors); a null ELEMENT nulls every projection,
  * which the declarative form's `when(proj >= 0, ...).otherwise(0)` folds
  * to an all-zero bucket array — reproduced here for parity.
  */
case class HyperplaneBuckets(child: Expression, bands: Int, planesPerBand: Int)
    extends UnaryExpression {

  require(bands > 0 && planesPerBand > 0 && planesPerBand < 31,
    "bands and planesPerBand must be positive (planes < 31 to fit an int bucket)")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_hyperplane_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckSuccess
    case dt => TypeCheckFailure(
      s"$prettyName requires an array<float> or array<double> argument, got ${dt.catalogString}")
  }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val buckets = new Array[Int](bands)
    var hasNullElem = false
    var i = 0
    while (i < n && !hasNullElem) { hasNullElem = arr.isNullAt(i); i += 1 }
    if (!hasNullElem) {
      var b = 0
      while (b < bands) {
        var bucket = 0
        var p = 0
        while (p < planesPerBand) {
          val g = b * planesPerBand + p
          var acc = 0.0
          var j = 0
          while (j < n) {
            val x = if (elemIsFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
            acc += x * (((g * 131 + j * 31) % 17) - 8).toDouble
            j += 1
          }
          if (acc >= 0) bucket |= 1 << p
          p += 1
        }
        buckets(b) = bucket
        b += 1
      }
    }
    new GenericArrayData(buckets)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val buckets = ctx.freshName("buckets")
      val nullElem = ctx.freshName("nullElem")
      val b = ctx.freshName("b")
      val p = ctx.freshName("p")
      val g = ctx.freshName("g")
      val acc = ctx.freshName("acc")
      val bucket = ctx.freshName("bucket")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val getX = if (elemIsFloat) s"(double) $v.getFloat($j)" else s"$v.getDouble($j)"
      s"""
        |int $n = $v.numElements();
        |int[] $buckets = new int[$bands];
        |boolean $nullElem = false;
        |for (int $i = 0; $i < $n; $i++) {
        |  if ($v.isNullAt($i)) { $nullElem = true; break; }
        |}
        |if (!$nullElem) {
        |  for (int $b = 0; $b < $bands; $b++) {
        |    int $bucket = 0;
        |    for (int $p = 0; $p < $planesPerBand; $p++) {
        |      int $g = $b * $planesPerBand + $p;
        |      double $acc = 0.0;
        |      for (int $j = 0; $j < $n; $j++) {
        |        $acc += $getX * (double) ((($g * 131 + $j * 31) % 17) - 8);
        |      }
        |      if ($acc >= 0) $bucket |= 1 << $p;
        |    }
        |    $buckets[$b] = $bucket;
        |  }
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($buckets);
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}
