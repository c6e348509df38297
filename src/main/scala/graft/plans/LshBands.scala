package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Banded sign-bit LSH codes for an array<double> vector as ONE native
  * expression: band b's code packs `planesPerBand` sign bits
  * (bit j = [dot(v, plane_{b·k+j}) > 0]) into a long; the output is the
  * array of all `bands` codes.
  *
  * Why an expression and not `functions._`: the declarative form needs
  * bands × planesPerBand hyperplanes as 64-element array literals plus a
  * zip_with/aggregate pair per dot — thousands of Catalyst nodes that blow
  * up analysis and fall out of codegen. Here the planes are computed once
  * per JVM (static cache) from the deterministic SplitMix64 construction
  * ([[graft.functions.VecFns.hyperplanes]] — same values), and all
  * bands × dim multiply-adds run in one allocation-free loop. A pure MAP
  * stage: signatures never shuffle.
  */
case class LshBands(child: Expression, planesPerBand: Int, bands: Int,
    dim: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lshbands"

  override def nullSafeEval(v: Any): Any =
    LshBands.codes(v.asInstanceOf[ArrayData], planesPerBand, bands, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.LshBands.codes($v, $planesPerBand, $bands, $dim);")

  override protected def withNewChildInternal(newChild: Expression): LshBands =
    copy(child = newChild)
}

object LshBands {

  /** Plane matrix cache keyed by (dim, totalPlanes): flat row-major
    * double[] for cache-friendly dot loops. Deterministic content — safe
    * to share across threads and recompute anywhere.
    */
  private val planeCache = new ConcurrentHashMap[(Int, Int), Array[Double]]()

  private def planes(dim: Int, total: Int): Array[Double] =
    planeCache.computeIfAbsent((dim, total), { case (dim, total) =>
      val m = graft.functions.VecFns.hyperplanes(dim, total)
      val flat = new Array[Double](total * dim)
      var j = 0
      while (j < total) {
        System.arraycopy(m(j), 0, flat, j * dim, dim); j += 1
      }
      flat
    })

  /** Called from both interpreted eval and generated code. `expectDim` is
    * enforced per row: the plane matrix is a function of the dimension, so
    * a mixed-dimension corpus would silently hash different-length vectors
    * against DIFFERENT plane sets — cross-length candidate pairs become
    * impossible and the recall loss is invisible to verify-on-candidates
    * (r2 ADVICE). Failing loud is the only safe behavior.
    */
  def codes(v: ArrayData, planesPerBand: Int, bands: Int,
      expectDim: Int): GenericArrayData = {
    val dim = v.numElements()
    require(dim == expectDim,
      s"graft_lshbands: vector of dimension $dim in a corpus declared " +
        s"$expectDim-dimensional — mixed dimensions cannot share an LSH " +
        "plane set")
    val vec = new Array[Double](dim)
    var i = 0
    while (i < dim) { vec(i) = v.getDouble(i); i += 1 }
    val flat = planes(dim, planesPerBand * bands)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var code = 0L
      var j = 0
      while (j < planesPerBand) {
        val off = (b * planesPerBand + j) * dim
        var dot = 0.0
        var d = 0
        while (d < dim) { dot += vec(d) * flat(off + d); d += 1 }
        if (dot > 0) code |= (1L << j)
        j += 1
      }
      out(b) = code
      b += 1
    }
    new GenericArrayData(out)
  }
}
