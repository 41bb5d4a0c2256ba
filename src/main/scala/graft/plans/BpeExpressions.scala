package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Greedy rank-ordered BPE application — the apply side of
  * [[graft.operators.Bpe.train]]'s merge table. Standard encode
  * semantics (Sennrich et al. '16): per word, repeatedly find the
  * adjacent symbol pair with the LOWEST merge rank and merge every
  * greedy-left occurrence, until no adjacent pair is in the table.
  *
  * Holds the rank table as one hashed lookup per adjacent pair —
  * a 50k-merge production vocabulary costs O(word·merges-applied)
  * probes, NOT 50k chained passes (the declarative per-merge-fold
  * formulation would). The table rides into generated code as a
  * codegen reference object (the IvfExpressions centroid pattern).
  * Char-level initial vocabulary, consistent with training's
  * `split(w, "")` for BMP text.
  */
class BpeEncoder(merges: Array[Array[String]]) extends Serializable {
  // NUL joins pair keys: symbols never contain it, so distinct
  // pairs cannot collide
  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) {
      m.put(merges(i)(0) + "\u0000" + merges(i)(1), i); i += 1
    }
    m
  }

  private def encodeWord(word: String,
                         out: scala.collection.mutable.ArrayBuffer[Any]): Unit = {
    var syms: Array[String] = word.map(_.toString).toArray
    var done = false
    while (!done && syms.length >= 2) {
      var best = Int.MaxValue
      var bi = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.get(syms(i) + "\u0000" + syms(i + 1))
        if (r != null && r < best) { best = r; bi = i }
        i += 1
      }
      if (bi < 0) done = true
      else {
        val a = syms(bi); val b = syms(bi + 1); val ab = a + b
        val buf = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
            buf += ab; j += 2
          } else { buf += syms(j); j += 1 }
        }
        syms = buf.toArray
      }
    }
    var k = 0
    while (k < syms.length) { out += UTF8String.fromString(syms(k)); k += 1 }
  }

  def encode(text: UTF8String): ArrayData = {
    val words = text.toString.split(" ", -1)
    val out = new scala.collection.mutable.ArrayBuffer[Any]
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) encodeWord(words(i), out)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** BPE tokenization of a space-tokenized string under a fixed merge
  * table — see [[BpeEncoder]]. */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression {

  @transient private lazy val encoder =
    new BpeEncoder(merges.map(p => Array(p._1, p._2)).toArray)

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode expects string, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    encoder.encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncoder", encoder,
      classOf[BpeEncoder].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeExpressions {
  /** BPE token array of a text column under a trained merge table. */
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column =
    GraftColumnShim.column(BpeEncode(
      GraftColumnShim.expression(text), merges))
}
