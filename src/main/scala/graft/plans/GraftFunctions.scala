package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL surface for the native kernels: every graft expression is
  * registered as a `graft_*` SQL function, so `spark.sql` users get
  * the same compiled one-pass kernels the DataFrame operators use.
  *
  * Two registration paths:
  *  - `spark.sql.extensions=graft.plans.GraftExtensions` at session
  *    build (the standard extension-library mechanism);
  *  - `GraftSqlFunctions.register(spark)` on a live session.
  */
object GraftFunctions {

  private def intLit(fn: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal int argument, got $other")
  }

  private def arity(fn: String, args: Seq[Expression], n: Int): Unit =
    if (args.length != n) throw new IllegalArgumentException(
      s"$fn expects $n arguments, got ${args.length}")

  /** Evaluate a foldable array-of-strings argument (e.g. an
    * `array('a','b')` literal) at registration time. */
  private def stringArrayLit(fn: String, e: Expression): Seq[String] = {
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val elemOk = e.dataType match {
      case ArrayType(StringType, _) => true
      case ArrayType(org.apache.spark.sql.types.NullType, _) => true // array()
      case _ => false
    }
    if (!e.foldable || !elemOk) throw new IllegalArgumentException(
      s"$fn expects a foldable array<string> argument, got $e")
    e.eval() match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        val out = a.toObjectArray(StringType).map {
          case null => throw new IllegalArgumentException(
            s"$fn: array<string> literal contains NULL")
          case u: org.apache.spark.unsafe.types.UTF8String => u.toString
        }
        out.toSeq
      case other => throw new IllegalArgumentException(
        s"$fn expects an array<string> literal, got $other")
    }
  }

  /** Zip the (lefts, rights) array literals of a BPE merge table. */
  private def mergeTable(fn: String, lefts: Expression,
                         rights: Expression): Seq[(String, String)] = {
    val l = stringArrayLit(fn, lefts)
    val r = stringArrayLit(fn, rights)
    if (l.length != r.length) throw new IllegalArgumentException(
      s"$fn: lefts and rights differ in length (${l.length} vs ${r.length})")
    val pairs = l.zip(r)
    // BPE precedence is lowest-rank-wins; a duplicate pair would let
    // the HashMap keep the LAST (highest) rank and silently invert it
    val dup = pairs.diff(pairs.distinct)
    if (dup.nonEmpty) throw new IllegalArgumentException(
      s"$fn: duplicate merge pairs ${dup.distinct.mkString(", ")}")
    pairs
  }

  /** (name, builder) for every graft SQL function. */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_minhash" -> { args =>
      arity("graft_minhash", args, 3)
      ShingleMinHash(args(0), intLit("graft_minhash", args(1)),
        intLit("graft_minhash", args(2)))
    },
    "graft_shingle_hashes" -> { args =>
      arity("graft_shingle_hashes", args, 2)
      ShingleHashes(args(0), intLit("graft_shingle_hashes", args(1)))
    },
    "graft_char_ngram_hashes" -> { args =>
      arity("graft_char_ngram_hashes", args, 2)
      CharNgramHashes(args(0), intLit("graft_char_ngram_hashes", args(1)))
    },
    "graft_simhash64" -> { args =>
      arity("graft_simhash64", args, 1)
      SimHash64(args(0))
    },
    "graft_feature_hash_sum" -> { args =>
      arity("graft_feature_hash_sum", args, 2)
      FeatureHashSum(args(0), intLit("graft_feature_hash_sum", args(1)))
    },
    // merge table as two parallel array<string> literals:
    // graft_bpe_encode(text, array('e','es'), array('s','t'))
    "graft_bpe_encode" -> { args =>
      arity("graft_bpe_encode", args, 3)
      BpeEncode(args(0), mergeTable("graft_bpe_encode", args(1), args(2)))
    },
    "graft_bpe_token_count" -> { args =>
      arity("graft_bpe_token_count", args, 3)
      BpeTokenCount(args(0),
        mergeTable("graft_bpe_token_count", args(1), args(2)))
    },
    "graft_float_dot" -> { args =>
      arity("graft_float_dot", args, 2)
      FloatDotProduct(args(0), args(1))
    },
    "graft_sorted_intersect_count" -> { args =>
      arity("graft_sorted_intersect_count", args, 2)
      SortedIntersectCount(args(0), args(1))
    },
    "graft_srp_buckets" -> { args =>
      arity("graft_srp_buckets", args, 3)
      SrpBuckets(args(0), intLit("graft_srp_buckets", args(1)),
        intLit("graft_srp_buckets", args(2)))
    },
    "graft_zorder" -> { args =>
      arity("graft_zorder", args, 2)
      ZOrderValue(args(0), args(1))
    },
    "graft_approx_topk" -> { args =>
      arity("graft_approx_topk", args, 3)
      ApproxTopKSummary(args(0), intLit("graft_approx_topk", args(1)),
        intLit("graft_approx_topk", args(2)))
    },
    "graft_topk_pairs" -> { args =>
      arity("graft_topk_pairs", args, 3)
      TopKPairsSummary(args(0), args(1),
        intLit("graft_topk_pairs", args(2)))
    },
    // Iceberg's bucket[N] transform (spec Appendix B — standard
    // murmur3_x86_32 seed 0 over the spec's type encodings): the
    // hidden-partitioning kernel behind `iceberg_bucket(n, c)`
    // layouts, which cross the Iceberg metadata boundary with
    // CORRECT foreign pruning (Spark's own hash() does not)
    "graft_iceberg_bucket" -> { args =>
      arity("graft_iceberg_bucket", args, 2)
      val n = args(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(i,
          org.apache.spark.sql.types.IntegerType) => i.asInstanceOf[Int]
        case org.apache.spark.sql.catalyst.expressions.Literal(l,
          org.apache.spark.sql.types.LongType) =>
          l.asInstanceOf[Long].toInt
        case other => throw new IllegalArgumentException(
          "graft_iceberg_bucket expects an integer literal bucket " +
            s"count, got $other")
      }
      IcebergBucket(args(0), n)
    },
    "graft_normalize_text" -> { args =>
      arity("graft_normalize_text", args, 2)
      val nfkc = args(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(b,
          org.apache.spark.sql.types.BooleanType) => b.asInstanceOf[Boolean]
        case other => throw new IllegalArgumentException(
          s"graft_normalize_text expects a boolean literal nfkc flag, got $other")
      }
      NormalizeText(args(0), nfkc)
    },
    // not a native kernel, but the same SQL-surface contract: the
    // canonicalization chain built from catalyst nodes directly —
    // a Column-to-Expression shim can't cross the function-registry
    // boundary (its ColumnNode leaves never resolve in a SQL plan).
    // Parity with operators.Curation.canonicalUrl is spec-asserted.
    "graft_canonical_url" -> { args =>
      arity("graft_canonical_url", args, 1)
      canonicalUrlExpr(args(0))
    })

  private def canonicalUrlExpr(url: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Add, Concat, Length,
      Lower, RegExpExtract, RegExpReplace, Substring}
    def lit(s: String) = Literal(s)
    val pre = RegExpExtract(url, lit("^[a-zA-Z]+://[^/?#]*"), Literal(0))
    val u1 = Concat(Seq(Lower(pre),
      Substring(url, Add(Length(pre), Literal(1)), Literal(1 << 24))))
    val u2 = RegExpReplace(u1, lit("#.*$"), lit(""))
    val u3 = RegExpReplace(u2,
      lit("(utm_[a-z]+|fbclid|gclid)=[^&#]*&?"), lit(""))
    val u4 = RegExpReplace(u3, lit("[?&]$"), lit(""))
    val u5 = RegExpReplace(u4, lit("^http://"), lit("https://"))
    val u6 = RegExpReplace(u5, lit("^https://www\\."), lit("https://"))
    RegExpReplace(u6, lit("/$"), lit(""))
  }

  def info(name: String): ExpressionInfo =
    new ExpressionInfo("graft", name)
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        GraftFunctions.info(name), builder))
    }
}
