package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the embedding hot path: a fused
  * dot product over two `array<float>` columns.
  *
  * Semantically identical to the declarative fold
  * `aggregate(zip_with(cast(a), cast(b), _*_), 0.0, _+_)` — each
  * float is widened to double (f32×f32 products are exact in f64)
  * and accumulated left-to-right, so results are bit-equal to the
  * compositional form (asserted in PlansSpec). The win is physical:
  * one tight JIT-friendly loop over the two `ArrayData` buffers
  * inside whole-stage codegen, instead of three HigherOrderFunction
  * evaluations materialising two intermediate arrays per row pair.
  *
  * Elements must be non-null; inputs shorter than the other are
  * zero-padded (iteration stops at the shorter length).
  */
case class FloatDotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"float_dot expects array<float> inputs, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Deterministic sign-random-projection hyperplane weights, derived
  * from xxhash64 exactly like the declarative formulation in
  * Similarity.srpBucket: weight(plane q, dim j) =
  * (pmod(xxhash64(j, seed_q), 2000001) - 1000000) / 1e6 ∈ [-1, 1).
  * The table is row-independent, so it's computed once per (dims)
  * and cached — the declarative fold recomputed every hash for
  * every row.
  */
final class SrpWeightCache(bits: Int, tables: Int) extends Serializable {
  @transient @volatile private var cachedDims = -1
  @transient @volatile private var cachedW: Array[Array[Double]] = _

  /** planes are flattened q = table*bits+plane; seed = table*97+plane. */
  def get(dims: Int): Array[Array[Double]] = {
    val w0 = cachedW
    if (w0 != null && cachedDims == dims) return w0
    val w = Array.ofDim[Double](tables * bits, dims)
    var t = 0
    while (t < tables) {
      var p = 0
      while (p < bits) {
        val seed = t * 97 + p
        var j = 0
        while (j < dims) {
          // xxhash64(col_j:int, lit(seed):int) with initial seed 42
          val h1 = XxHash64Function.hash(j,
            org.apache.spark.sql.types.IntegerType, 42L)
          val h2 = XxHash64Function.hash(seed,
            org.apache.spark.sql.types.IntegerType, h1)
          val m = 2000001L
          val pm = ((h2 % m) + m) % m
          w(t * bits + p)(j) = (pm - 1000000L) / 1000000.0
          j += 1
        }
        p += 1
      }
      t += 1
    }
    cachedDims = dims
    cachedW = w
    w
  }
}

/** All `tables` SRP bucket ids for a float vector in one compiled
  * pass: bucket(t) = Σ_p [dot(vec, w_{t,p}) >= 0] << p. Replaces
  * `tables × bits` interpreted HigherOrderFunction pipelines per row
  * with one loop over a cached weight table. */
case class SrpBuckets(child: Expression, bits: Int, tables: Int)
  extends UnaryExpression {

  private lazy val cache = new SrpWeightCache(bits, tables)

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"srp_buckets expects array<float>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val n = vec.numElements()
    val w = cache.get(n)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < bits) {
        val wq = w(t * bits + p)
        var acc = 0.0
        var j = 0
        while (j < n) { acc += vec.getFloat(j).toDouble * wq(j); j += 1 }
        if (acc >= 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cacheRef = ctx.addReferenceObj("srpCache", cache,
      classOf[SrpWeightCache].getName)
    nullSafeCodeGen(ctx, ev, vec => {
      val n = ctx.freshName("n")
      val w = ctx.freshName("w")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val bucket = ctx.freshName("bucket")
      val wq = ctx.freshName("wq")
      s"""
         |int $n = $vec.numElements();
         |double[][] $w = $cacheRef.get($n);
         |long[] $out = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $bucket = 0L;
         |  for (int $p = 0; $p < $bits; $p++) {
         |    double[] $wq = $w[$t * $bits + $p];
         |    double $acc = 0.0;
         |    for (int $j = 0; $j < $n; $j++) {
         |      $acc += (double) $vec.getFloat($j) * $wq[$j];
         |    }
         |    if ($acc >= 0) $bucket |= (1L << $p);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SrpBuckets =
    copy(child = newChild)
}

/** Intersection size of two SORTED long arrays via a single merge
  * scan — no hash set, no result-array allocation (unlike
  * `size(array_intersect(a, b))`). Inputs must be sorted ascending
  * and duplicate-free (both hold for `sort_array(array_distinct(…))`
  * outputs); used by the similarity-join verify steps where the
  * intersect runs once per candidate pair. */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.LongType, _),
            ArrayType(org.apache.spark.sql.types.LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count expects two array<bigint>, got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < nx && j < ny) {
      val vx = x.getLong(i); val vy = y.getLong(j)
      if (vx == vy) { c += 1; i += 1; j += 1 }
      else if (vx < vy) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val vx = ctx.freshName("vx"); val vy = ctx.freshName("vy")
      val c = ctx.freshName("c")
      s"""
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $nx && $j < $ny) {
         |  long $vx = $a.getLong($i); long $vy = $b.getLong($j);
         |  if ($vx == $vy) { $c++; $i++; $j++; }
         |  else if ($vx < $vy) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object FloatVectorExpressions {
  /** Column-level handle for the native dot product. */
  def floatDot(a: Column, b: Column): Column =
    GraftColumnShim.column(FloatDotProduct(
      GraftColumnShim.expression(a), GraftColumnShim.expression(b)))

  /** L2 norm via the native dot product (sqrt of self-dot). */
  def floatNorm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(floatDot(a, a))

  /** All SRP table buckets for a vector as array<long>. */
  def srpBuckets(a: Column, bits: Int, tables: Int): Column =
    GraftColumnShim.column(SrpBuckets(GraftColumnShim.expression(a),
      bits, tables))


  /** Merge-scan |a ∩ b| of two sorted duplicate-free long arrays. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftColumnShim.column(SortedIntersectCount(
      GraftColumnShim.expression(a), GraftColumnShim.expression(b)))
}
