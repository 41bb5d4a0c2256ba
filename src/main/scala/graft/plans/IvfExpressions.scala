package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.types._

/** IVF (inverted-file) index support: nearest-centroid assignment as
  * a single compiled map-side pass.
  *
  * The centroid matrix is embedded in the expression (model
  * parameters — `nlist × dims` floats, a few hundred KB at FAISS-like
  * settings — not data), so assignment needs no join, no explode and
  * no shuffle: scan → argmax-dot → int. Centroids must be
  * L2-normalized by the trainer; then dot-product ranking equals
  * cosine ranking for any input vector.
  */
object IvfKernel {
  /** Indices of the `nprobe` centroids with largest dot(vec, c),
    * descending. Selection by repeated max over a marked array —
    * nprobe is small (1 for assignment, ≤16 for probing). */
  def topCentroids(vec: ArrayData, cents: Array[Array[Float]],
                   nprobe: Int): ArrayData = {
    val n = vec.numElements()
    val k = cents.length
    val dots = new Array[Double](k)
    var c = 0
    while (c < k) {
      val w = cents(c)
      var acc = 0.0
      var j = 0
      val m = math.min(n, w.length)
      while (j < m) { acc += vec.getFloat(j).toDouble * w(j); j += 1 }
      dots(c) = acc
      c += 1
    }
    val p = math.min(nprobe, k)
    val out = new Array[Int](p)
    var i = 0
    while (i < p) {
      var best = -1
      var bestDot = Double.NegativeInfinity
      c = 0
      while (c < k) {
        if (dots(c) > bestDot) { best = c; bestDot = dots(c) }
        c += 1
      }
      out(i) = best
      dots(best) = Double.NegativeInfinity
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** `nprobe` nearest centroid ids (by dot product, descending) for a
  * float vector — see IvfKernel. */
case class TopCentroids(child: Expression, centroids: Seq[Seq[Float]],
                        nprobe: Int)
  extends UnaryExpression {

  @transient private lazy val cents: Array[Array[Float]] =
    centroids.map(_.toArray).toArray

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"top_centroids expects array<float>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    IvfKernel.topCentroids(input.asInstanceOf[ArrayData], cents, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfCents", cents, "float[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.IvfKernel.topCentroids($c, $ref, $nprobe)")
  }

  override protected def withNewChildInternal(newChild: Expression): TopCentroids =
    copy(child = newChild)
}

object IvfExpressions {
  /** nprobe nearest (dot-ranked) centroid indices for a vector. */
  def topCentroids(vec: Column, centroids: Seq[Seq[Float]],
                   nprobe: Int): Column =
    GraftColumnShim.column(TopCentroids(
      GraftColumnShim.expression(vec), centroids, nprobe))
}
