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
  // tuple keys: no separator byte to collide with, whatever bytes
  // the corpus's symbols contain (dirty crawls do ship NULs)
  @transient private lazy val rank: java.util.HashMap[(String, String), Integer] = {
    val m = new java.util.HashMap[(String, String), Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) {
      m.put((merges(i)(0), merges(i)(1)), i); i += 1
    }
    m
  }

  /** Initial symbols are CODE POINTS, matching training's regex
    * `split(w, "")` — a surrogate pair stays one symbol. */
  private def initialSyms(word: String): Array[String] =
    word.codePoints().toArray
      .map(cp => new String(Character.toChars(cp)))

  private def encodeWord(word: String): Array[String] = {
    var syms: Array[String] = initialSyms(word)
    var done = false
    while (!done && syms.length >= 2) {
      var best = Int.MaxValue
      var bi = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.get((syms(i), syms(i + 1)))
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
    syms
  }

  def encode(text: UTF8String): ArrayData = {
    val words = text.toString.split(" ", -1)
    val out = new scala.collection.mutable.ArrayBuffer[Any]
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) {
        val syms = encodeWord(words(i))
        var k = 0
        while (k < syms.length) {
          out += UTF8String.fromString(syms(k)); k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Token COUNT without materializing the token array — the count
    * path allocates no UTF8String per token. */
  def countTokens(text: UTF8String): Long = {
    val words = text.toString.split(" ", -1)
    var n = 0L
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) n += encodeWord(words(i)).length
      i += 1
    }
    n
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

/** BPE token COUNT of a space-tokenized string — the no-allocation
  * sibling of [[BpeEncode]] for count-only consumers. */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression {

  @transient private lazy val encoder =
    new BpeEncoder(merges.map(p => Array(p._1, p._2)).toArray)

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_token_count expects string, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    encoder.countTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncoder", encoder,
      classOf[BpeEncoder].getName)
    defineCodeGen(ctx, ev, c => s"$ref.countTokens($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

object BpeExpressions {
  /** BPE token array of a text column under a trained merge table. */
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column =
    GraftColumnShim.column(BpeEncode(
      GraftColumnShim.expression(text), merges))

  /** BPE token count of a text column under a trained merge table. */
  def bpeTokenCount(text: Column, merges: Seq[(String, String)]): Column =
    GraftColumnShim.column(BpeTokenCount(
      GraftColumnShim.expression(text), merges))
}
