package graft.operators

import graft.plans.TopKPairsAggregate
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators a web-scale pretraining pipeline applies
  * between raw ingest and mixing: corpus-level line deduplication,
  * rule-based quality gating, and per-source volume caps.
  * (Reference surface: lakehouse-poc curates via notebook filters —
  * `notebooks/pipeline_core.py:186-204` has the change-split shape;
  * these extend it to the LLM-data recipes.)
  */
object Curation {

  /** Corpus-level line deduplication (the CCNet/RefinedWeb recipe): a
    * line that appears verbatim more than `maxFreq` times across the
    * whole corpus is boilerplate — navigation bars, cookie banners,
    * license footers — and is dropped from EVERY document, which is
    * then reassembled in original line order.
    *
    * Scale shape: the frequency count groups on the line's 8-byte
    * xxhash64, so that shuffle carries (hash, count) — never the
    * corpus text; the surviving frequent-line set is bounded by
    * n_lines/maxFreq and AQE broadcasts it for the flag join when
    * small. Reassembly is one doc_id-keyed shuffle whose per-group
    * state is bounded by the document's own size. A hash collision
    * can only over-count a line (flagging it boilerplate early) —
    * acceptable curation semantics; grouping on raw line text would
    * shuffle the full 100 TB of text instead of 16-byte keys.
    */
  def lineDedup(docs: DataFrame, maxFreq: Int, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    val lines = docs.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val frequent = lines
      .groupBy(xxhash64(col("line")).as("lh"))
      .agg(count(lit(1)).as("freq"))
      .where(col("freq") > maxFreq)
      .select("lh")
    val flagged = lines
      .join(frequent, xxhash64(col("line")) === col("lh"), "left")
      .select(col(idCol), col("pos"), col("line"),
        col("lh").isNull.as("keep"))
    flagged.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_lines"),
      sum(col("keep").cast("long")).as("n_kept"),
      array_join(
        transform(
          filter(
            array_sort(collect_list(
              struct(col("pos"), col("keep"), col("line")))),
            s => s.getField("keep")),
          s => s.getField("line")),
        "\n").as("text_clean"))
  }

  /** Gopher-style rule-based quality gate (Rae et al. 2021 §A1.1 as
    * popularized by the public Dolma/RedPajama recipes): each rule is
    * an independent boolean column so removals stay attributable per
    * rule; `pass` is their conjunction. Ratios round to 6 decimals
    * before thresholding (same policy as [[TextAnalysis.qualityScore]])
    * so the gate is engine- and partitioning-independent. Pure column
    * expressions — one map-only whole-stage-codegen pass at any scale.
    */
  def gopherRules(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text",
                  minWords: Int = 8, maxWords: Int = 100000,
                  minMeanWordLen: Double = 2.0,
                  maxMeanWordLen: Double = 12.0,
                  maxSymbolRatio: Double = 0.12,
                  maxBulletRatio: Double = 0.9,
                  maxEllipsisRatio: Double = 0.3,
                  minAlphaWordRatio: Double = 0.7): DataFrame = {
    val t = col(textCol)
    val toks = graft.functions.wordTokens(t)
    val nWords = size(toks)
    val nWordsD = nWords.cast("double")
    val nChars = length(t).cast("double")
    // same explicit ASCII punctuation class as qualityScore — regex
    // dialects disagree about \p{Punct}, engines never about ranges
    val punct = length(t) - length(regexp_replace(t, "[!-/:-@\\[-`{-~]", ""))
    val docLines = split(t, "\n")
    val nLines = size(docLines).cast("double")
    def ratio(num: org.apache.spark.sql.Column,
              den: org.apache.spark.sql.Column) =
      round(when(den === 0, lit(0.0)).otherwise(num / den), 6)
    val meanWordLen = ratio(nChars - (nWordsD - 1), nWordsD)
    val symbolRatio = ratio(punct.cast("double"), nChars)
    val bulletRatio = ratio(
      size(filter(docLines, l =>
        l.startsWith("-") || l.startsWith("*"))).cast("double"), nLines)
    val ellipsisRatio = ratio(
      size(filter(docLines, l => l.endsWith("..."))).cast("double"), nLines)
    val alphaRatio = ratio(
      size(filter(toks, w => w.rlike("[a-z]"))).cast("double"), nWordsD)
    val rules = Seq(
      "r_word_count" -> (nWords >= minWords && nWords <= maxWords),
      "r_mean_word_len" ->
        (meanWordLen >= minMeanWordLen && meanWordLen <= maxMeanWordLen),
      "r_symbol_ratio" -> (symbolRatio <= maxSymbolRatio),
      "r_bullet_ratio" -> (bulletRatio <= maxBulletRatio),
      "r_ellipsis_ratio" -> (ellipsisRatio <= maxEllipsisRatio),
      "r_alpha_ratio" -> (alphaRatio >= minAlphaWordRatio))
    docs.select(
      col(idCol) +: nWords.cast("long").as("n_words") +:
        rules.map { case (n, c) => c.as(n) } :+
        rules.map(_._2).reduce(_ && _).as("pass"): _*)
  }

  /** URL canonicalization — the key-normalization step of web-corpus
    * dedup (two crawls of the same page differ only in scheme, case,
    * `www.`, tracking params, fragments, trailing slashes): lowercase
    * scheme+host, unify http→https, strip `www.`, drop tracking
    * query params (utm_*, fbclid, gclid), drop fragments and trailing
    * slashes. A pure codegen'd regexp/string chain (RE2-compatible
    * patterns, no capture-group replacements — portable across regex
    * dialects); map-only at any scale. Group by the result for the
    * dedup itself (e.g. [[Dedup]] exact family). */
  def canonicalUrl(url: Column): Column = {
    // lowercase ONLY scheme://host (paths are case-sensitive)
    val pre = regexp_extract(url, "^[a-zA-Z]+://[^/?#]*", 0)
    val u1 = concat(lower(pre), url.substr(length(pre) + 1, lit(1 << 24)))
    val u2 = regexp_replace(u1, "#.*$", "")
    val u3 = regexp_replace(u2, "(utm_[a-z]+|fbclid|gclid)=[^&#]*&?", "")
    val u4 = regexp_replace(u3, "[?&]$", "")
    val u5 = regexp_replace(u4, "^http://", "https://")
    val u6 = regexp_replace(u5, "^https://www\\.", "https://")
    regexp_replace(u6, "/$", "")
  }

  /** Per-source volume cap: keep at most `cap` documents per source,
    * preferring longer documents (the cheap quality proxy), ties by
    * id — the "no domain dominates the mix" guard every web-corpus
    * recipe applies before mixture sampling.
    *
    * Scale shape: per-source bounded heaps ([[TopKPairsAggregate]],
    * partial → final), so every map task contributes at most `cap`
    * candidates per source and no per-source sort or skew-prone
    * window ever materializes — a source with 10^9 docs costs the
    * same reduce-side work as one with 10.
    */
  def sourceCap(docs: DataFrame, cap: Int, srcCol: String = "source",
                idCol: String = "doc_id",
                lenCol: String = "n_chars"): DataFrame =
    docs
      .groupBy(col(srcCol))
      .agg(TopKPairsAggregate.topKPairs(
        col(lenCol).cast("double"), col(idCol).cast("long"), cap).as("top"))
      .select(col(srcCol), posexplode(col("top")).as(Seq("i", "p")))
      .select(col(srcCol), (col("i") + 1).cast("long").as("rank"),
        col("p.neighbor_id").as(idCol),
        col("p.cos").cast("long").as(lenCol))

  /** Cross-document duplicated-SPAN coverage at word-k-gram
    * granularity — the span-level exact-substring dedup signal (Lee
    * et al. 2022, "Deduplicating Training Data Makes Language Models
    * Better") that doc-level MinHash and line-level `lineDedup` both
    * miss: a document that embeds a long verbatim quote of another
    * is flagged here even when the rest of the page is unique.
    *
    * A token position is "duplicated" when some k-gram covering it
    * occurs more than once in the corpus (counting within-document
    * repeats — a self-plagiarizing page is boilerplate too). Output
    * per document: token count, number of tokens covered by
    * duplicated k-grams (overlapping duplicate starts are merged
    * into spans, so a run of consecutive duplicate k-grams counts
    * each token once), and the covered fraction.
    *
    * Scale shape: k-grams never leave the map side as text — each
    * start position carries only the 8-byte xxhash64 of its k words,
    * so the frequency count and the duplicate-start semi-join both
    * shuffle 16-byte rows (the lineDedup layout, one granularity
    * finer). The span merge is a per-document window over duplicate
    * START positions only — bounded by the document's own token
    * count, never global. A hash collision can only over-flag a
    * span; acceptable curation semantics (same trade documented on
    * [[lineDedup]]).
    */
  def substringDedup(docs: DataFrame, k: Int = 5,
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col(idCol),
      split(col(textCol), " ").as("toks"))
      .select(col(idCol), col("toks"),
        size(col("toks")).cast("long").as("n_tokens"))
    // one row per k-gram start: (doc, 1-based pos, 8-byte gram hash)
    val grams = base.select(col(idCol), col("n_tokens"),
      posexplode(when(col("n_tokens") >= k,
        transform(sequence(lit(1), (col("n_tokens") - (k - 1)).cast("int")),
          i => xxhash64(concat_ws(" ", slice(col("toks"), i, lit(k))))))
        .otherwise(array().cast("array<long>"))).as(Seq("off", "gh")))
      .select(col(idCol), (col("off") + 1).as("pos"), col("gh"))
    val dupGrams = grams.groupBy(col("gh"))
      .agg(count(lit(1)).as("c")).where(col("c") > 1).select("gh")
    val dupStarts = grams.join(dupGrams, Seq("gh"), "left_semi")
    // merge overlapping [pos, pos+k-1] spans: each duplicate start
    // covers min(k, gap-to-next-duplicate-start) fresh tokens
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val covered = dupStarts
      .withColumn("nxt", lead(col("pos"), 1).over(w))
      .select(col(idCol),
        least(lit(k), coalesce(col("nxt") - col("pos"), lit(k)))
          .as("cov"))
      .groupBy(col(idCol)).agg(sum(col("cov")).cast("long")
        .as("dup_tokens"))
    base.select(col(idCol), col("n_tokens"))
      .join(covered, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        round(coalesce(col("dup_tokens"), lit(0L)) /
          col("n_tokens").cast("double"), 6).as("dup_ratio"))
  }
}
