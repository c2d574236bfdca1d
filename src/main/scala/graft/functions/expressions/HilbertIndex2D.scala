package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** 2-D Hilbert-curve index of `(x, y)` on a `2^bits × 2^bits` grid — the
  * space-filling-curve alternative to the Morton interleave
  * ([[graft.sources.Layout.zOrderValue]]) for multi-dimension data
  * layout. Hilbert ordering never takes the long diagonal jumps Morton
  * takes at quadrant boundaries (consecutive indices are ALWAYS grid
  * neighbors — the defining adjacency property, asserted exhaustively in
  * NativeExprSpec), so rectangle predicates touch fewer, more-contiguous
  * index ranges and parquet footer stats prune tighter at the same file
  * count.
  *
  * Integer-only (the classic per-level rotate/reflect walk, Hilbert 1891;
  * the d↔(x,y) mapping of Warren, Hacker's Delight §16), so any engine
  * reproduces the index from the coordinates alone. Inputs take their low
  * `bits` bits (the [[graft.sources.Layout.zOrderValue]] contract);
  * `bits ≤ 31` keeps the index within a long. Null in ⇒ null out.
  */
case class HilbertIndex2D(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_hilbert2d"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckSuccess
      case (l, r) => TypeCheckFailure(
        s"$prettyName requires (bigint, bigint), got (${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(x: Any, y: Any): Any =
    HilbertIndex2D.index(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xv, yv) => {
      val impl = ctx.addReferenceObj("hilbertImpl", HilbertIndex2D,
        HilbertIndex2D.getClass.getName)
      s"""
        |${ev.value} = $impl.index($xv, $yv, $bits);
        |${ev.isNull} = false;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex2D =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex2D {

  /** xy → d on the 2^bits grid. Descending-scale walk: extract the
    * quadrant, accumulate `s²·((3·rx) ⊕ ry)`, then rotate/reflect the
    * frame. The reflection complements within the FULL bits-wide field
    * (`mask − v`): the mask is all-ones so no borrows propagate, making
    * it identical on the not-yet-consumed low bits to the per-scale
    * complement — and expressible the same way in external SQL.
    */
  def index(xIn: Long, yIn: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1L
    var x = xIn & mask
    var y = yIn & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) {
          x = mask - x
          y = mask - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
