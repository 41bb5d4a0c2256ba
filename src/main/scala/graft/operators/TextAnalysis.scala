package graft.operators

import graft.functions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table: language id,
  * quality scoring, token counting, fingerprinting. All pure
  * column-expression pipelines (whole-stage-codegen friendly, no
  * UDFs) — a single map-only pass per operator at any scale.
  */
object TextAnalysis {

  /** Tiny per-language stopword profiles for the n-gram/stopword
    * language-ID heuristic. ASCII-only on purpose: deterministic
    * across JVM/engine collations. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "est"),
    "es" -> Seq("el", "la", "que", "de", "es"))

  private def countWordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => words.map(w => t === w).reduce(_ || _)))

  /** Stopword-profile language guess: the language whose stopword
    * list hits the most tokens; "und" (unknown) if nothing hits.
    * Ties break by profile order en>de>fr>es (deterministic). */
  def langId(text: Column): Column = {
    val toks = wordTokens(text)
    val scores = Seq("en", "de", "fr", "es").map(l =>
      l -> countWordHits(toks, stopwords(l)))
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(when(best === 0, lit("und"))) {
      case (acc, (l, s)) => acc.when(s === best, lit(l))
    }.otherwise(lit("und"))
  }

  /** Quality features: char/word lengths, punctuation ratio,
    * stopword ratio, mean word length — the standard cheap quality
    * signals for pretraining-data filtering. */
  def qualityScore(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val toks = wordTokens(t)
    // explicit ASCII punctuation class — identical semantics in any
    // regex dialect (vs \p{Punct} whose definition varies).
    val punct = length(t) - length(regexp_replace(t, "[!-/:-@\\[-`{-~]", ""))
    val nChars = length(t).cast("double")
    val nWords = size(toks).cast("double")
    val stopHits = countWordHits(toks, stopwords("en")).cast("double")
    // ANSI mode makes x/0 an ERROR, not infinity — empty documents
    // exist in any real corpus, so zero denominators yield 0.0
    def ratio(num: Column, den: Column): Column =
      round(when(den === 0, lit(0.0)).otherwise(num / den), 6)
    docs.select(
      col(idCol),
      length(t).cast("long").as("n_chars"),
      size(toks).cast("long").as("n_words"),
      ratio(punct, nChars).as("punct_ratio"),
      ratio(stopHits, nWords).as("stopword_ratio"),
      ratio(nChars - (nWords - 1), nWords).as("mean_word_len"))
  }

  /** Token counts: whitespace words and a BPE-ish segmentation
    * (letter-runs, digit-runs, single punctuation marks — the
    * GPT-2-style pre-tokenizer shape). */
  def tokenCounts(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val bpeish = bpeTokenCount(t)
    docs.select(
      col(idCol),
      size(wordTokens(t)).cast("long").as("n_whitespace_tokens"),
      bpeish.cast("long").as("n_bpe_tokens"),
      ceil(length(t).cast("double") / 4.0).cast("long").as("n_chars_div4"))
  }

  /** BPE-ish token count of a text column (letter-runs, digit-runs,
    * single punctuation marks) — exposed as a plain Column so
    * composed pipelines can compute it inline without a join. */
  def bpeTokenCount(t: Column): Column =
    size(filter(
      split(regexp_replace(lower(t), "([a-z]+|[0-9]+|[^a-z0-9 ])", "$1 "),
        "[\u0001 ]+"),
      x => length(x) > 0))

  /** Quality gate as a boolean Column over the text itself — lets a
    * curation pipeline FILTER on quality inline (one map-only pass)
    * instead of joining `qualityScore` output back by id, which
    * costs a full extra shuffle of the corpus. Semantics match
    * qualityScore's columns exactly (same round-6 ratios). */
  def qualityFilter(t: Column, minWords: Int,
                    maxPunctRatio: Double): Column = {
    val toks = wordTokens(t)
    val punct = length(t) - length(regexp_replace(t, "[!-/:-@\\[-`{-~]", ""))
    val nChars = length(t).cast("double")
    val punctRatio = round(when(nChars === 0, lit(0.0))
      .otherwise(punct / nChars), 6)
    size(toks) >= minWords && punctRatio < maxPunctRatio
  }

  /** Rolling-hash document fingerprints: order-sensitive polynomial
    * hash over word tokens + order-insensitive content hash. */
  def fingerprints(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol),
      rollingFingerprint(wordTokens(col(textCol))).as("rolling_fp"),
      bagFingerprint(wordTokens(col(textCol))).as("bag_fp"))

  /** Deterministic stratified sampling: keep a per-stratum fraction
    * of rows selected by key modulus — reproducible across runs,
    * partitionings and retries (unlike `sample`/`sampleBy`, whose
    * output depends on partition layout), and expressible in plain
    * SQL for auditing. Rates are per-mille-resolved; strata missing
    * from `rates` fall back to `defaultRate`. The selector is a
    * Knuth multiplicative hash of the id, so clustered or
    * sequential ids still sample at the configured rate. */
  def stratifiedSample(df: DataFrame, stratumCol: String,
                       rates: Map[String, Double], defaultRate: Double,
                       idCol: String): DataFrame = {
    val threshold = rates.foldLeft(
      lit((defaultRate * 1000).toInt)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit((v * 1000).toInt)).otherwise(acc)
    }
    // Knuth multiplicative hash (pre-modulus keeps the product under
    // 2^63) — clustered/sequential ids still sample at rate, unlike
    // a raw id modulus
    val selector = pmod(
      pmod(col(idCol), lit(1000003L)) * lit(2654435761L), lit(1000L))
    df.filter(selector < threshold)
  }

  // PII patterns kept to syntax with identical semantics in Java's
  // regex and RE2 (ASCII classes, no lookaround) so the same pattern
  // string is auditable in any engine.
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\d{2,3}-\\d{3}-\\d{3}-\\d{4}"
  val ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** PII redaction: replace emails, dashed phone numbers and IPv4
    * addresses with type tags. A chain of codegen'd regexp_replace
    * calls — one map-only pass, no UDF. Email first (its domain
    * would otherwise be chewed up by the IP rule), then phone, then
    * IP. */
  def redactPii(t: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(t, emailRe, "[EMAIL]"),
        phoneRe, "[PHONE]"),
      ipv4Re, "[IP]")

  /** Per-row PII counts (for audit sampling / filtering decisions
    * before redaction). */
  def piiCounts(t: Column): (Column, Column, Column) =
    (size(regexp_extract_all(t, lit(emailRe), lit(0))),
      size(regexp_extract_all(t, lit(phoneRe), lit(0))),
      size(regexp_extract_all(t, lit(ipv4Re), lit(0))))

  /** Intra-document repetition signals (the Gopher-rule family):
    * the fraction of tokens taken by the most frequent word and by
    * the most frequent bigram — high values mark degenerate or
    * keyword-stuffed documents. (idCol, n_words, top_word_frac,
    * top_bigram_frac).
    *
    * Scale design: explode + per-(doc, gram) counts partial-aggregate
    * map-side, so the shuffle carries distinct grams per doc, not
    * tokens; everything after is per-doc. */
  def repetitionStats(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    // tokenize into a column FIRST: a shingle lambda over
    // `wordTokens(text)` re-evaluates the split per array element
    // (codegen can't hoist an expression out of a lambda body), which
    // is O(words²) per doc. Referencing the materialized `__toks`
    // attribute makes each bigram O(k). CollapseProject keeps the
    // hoist (multi-referenced non-trivial aliases aren't inlined).
    // Words and bigrams ride ONE type-tagged explode and two
    // partial-aggregating shuffles with conditional aggregates — the
    // two-chain formulation paid four shuffles plus a per-doc join
    // for the same numbers.
    def bigramsOf(toks: Column): Column =
      when(size(toks) < 2, array(concat_ws(" ", toks)))
        .otherwise(transform(sequence(lit(1), size(toks) - 1),
          i => concat_ws(" ", slice(toks, i, lit(2)))))
    docs.select(col(idCol), wordTokens(col(textCol)).as("__toks"))
      .select(col(idCol), explode(concat(
        transform(col("__toks"), t => struct(lit(0).as("typ"), t.as("g"))),
        transform(bigramsOf(col("__toks")),
          t => struct(lit(1).as("typ"), t.as("g"))))).as("tg"))
      .groupBy(col(idCol), col("tg.typ").as("typ"), col("tg.g").as("g"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col(idCol))
      .agg(sum(when(col("typ") === 0, col("n"))).as("n_words"),
        max(when(col("typ") === 0, col("n"))).as("__wmx"),
        sum(when(col("typ") === 1, col("n"))).as("__btot"),
        max(when(col("typ") === 1, col("n"))).as("__bmx"))
      .select(col(idCol), col("n_words"),
        round(col("__wmx").cast("double") / col("n_words"), 6)
          .as("top_word_frac"),
        round(col("__bmx").cast("double") / col("__btot"), 6)
          .as("top_bigram_frac"))
  }

  /** Top-k TF-IDF terms per document: term frequency × ln(N/df),
    * ranked per doc (ties broken by term). The standard keyword-
    * extraction / topic-signal primitive.
    *
    * Scale design: tf is one partial-agged shuffle of (doc, word)
    * hashes' worth of data; df reduces the tf relation again
    * (partial-agged, skew-immune — a stopword contributes one row
    * per task); N attaches as a broadcast one-row scalar, never a
    * driver count(). The per-doc ranking windows over doc partitions
    * only. */
  def tfidfTopK(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text", k: Int = 3): DataFrame = {
    val tf = docs
      .select(col(idCol), explode(wordTokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.groupBy().agg(count(lit(1)).as("__n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("__score").desc, col("term"))
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("__score", col("tf") * log(col("__n") / col("df")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("tf"), col("df"),
        round(col("__score"), 6).as("tfidf"))
  }

  /** Per-document top-k terms by BM25 weight (Robertson/Lucene form,
    * the retrieval companion to [[tfidfTopK]] — what a RAG corpus
    * indexes after [[chunkDocs]]): idf = ln((N−df+0.5)/(df+0.5)+1),
    * length-normalized tf saturation with the standard k1/b. Same
    * plan shape as tfidf: tf/df partial-agged, doc length one
    * whole-partition window sum over the tf rows (no extra corpus
    * pass), corpus totals one scalar broadcast — no driver count().
    * Tie-break on the raw score then term: the score expression is
    * structurally identical on both engines, so ordering agrees. */
  def bm25TopK(docs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text", k: Int = 3,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tf = docs
      .select(col(idCol), explode(wordTokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.groupBy().agg(count(lit(1)).as("__n"))
    val tok = tf.groupBy().agg(sum(col("tf")).as("__tok"))
    val dlw = org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__score").desc, col("term"))
    tf.join(df, "term")
      .withColumn("dl", sum(col("tf")).over(dlw))
      .crossJoin(broadcast(n))
      .crossJoin(broadcast(tok))
      .withColumn("__avgdl", col("__tok").cast("double") / col("__n"))
      // constants stay as the same sub-expressions on both engines
      // ((k1+1), (1−b) fold to identical doubles; a pre-computed
      // Scala literal could differ from SQL's in the last ulp)
      .withColumn("__score",
        log((col("__n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
          + lit(1.0)) * (col("tf") * (lit(k1) + lit(1.0)))
          / (col("tf") + lit(k1) * ((lit(1.0) - lit(b))
            + lit(b) * col("dl") / col("__avgdl"))))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("tf"), col("df"),
        round(col("__score"), 6).as("bm25"))
  }

  /** Corpus-unigram surprisal — the cheap stand-in for the CCNet
    * LM-perplexity quality filter: each document's mean negative
    * log-likelihood under the corpus's OWN unigram distribution
    * (cross-entropy, nats). Low = ordinary vocabulary, high =
    * rare/garbled — threshold or quantile-gate downstream.
    *
    * Determinism: per-token surprisal is rounded to 6 dp, the sums
    * run in DECIMAL, so the score is a pure function of the token
    * multiset (no FP visit-order drift under any partitioning).
    * Plan shape: tokens carry an 8-byte xxhash64 key through both
    * the frequency aggregate and the join back (the raw term string
    * never shuffles); the corpus token total is a one-row broadcast.
    * Hash collisions can only merge two terms' counts (noise well
    * under the 6 dp rounding at realistic vocabularies). */
  def unigramSurprisal(docs: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    val tok = docs
      .select(col(idCol), explode(wordTokens(col(textCol))).as("term"))
      .select(col(idCol), xxhash64(col("term")).as("th"))
    val freq = tok.groupBy(col("th")).agg(count(lit(1)).as("tf"))
    val total = tok.groupBy().agg(count(lit(1)).as("__n"))
    tok.join(freq, "th")
      .crossJoin(broadcast(total))
      .select(col(idCol), round(-log(col("tf") / col("__n")), 6).as("nll"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("nll").cast("decimal(38,6)")).cast("double")
          / count(lit(1)), 6).as("cross_entropy"))
  }

  /** DSIR importance weights (Xie et al. '23, "Data Selection for
    * Language Models via Importance Resampling"): per-document log
    * importance of raw-corpus docs toward a TARGET domain —
    * log w(d) = Σ_tokens [ln p̂_target(tok) − ln p̂_raw(tok)] under
    * add-one-smoothed unigram distributions (smoothing vocabulary =
    * the raw corpus's, so unseen-in-target terms get finite mass).
    * Feed `log_weight` into [[Mixing]]'s PPS `weightedSample` (on
    * exp of a capped weight) to complete the resampling step.
    *
    * Tokenization is the raw single-space split shared with the
    * byte-exact curation family ([[Curation.substringDedup]],
    * [[classifierScore]]) — NOT [[graft.functions.wordTokens]]'s
    * lower+\s+ fold used by the retrieval scores: importance
    * estimation should see the text the way dedup does; compose
    * `lower`/`graft_normalize_text` upstream when case-folded
    * distributions are wanted (the oracle is then the same literal
    * `string_split`).
    *
    * Scale shape: ONE term-keyed frequency aggregate computes the
    * raw AND target counts together (the target count is a
    * conditional sum in the same partial agg — the oracle's two
    * separate CTEs, one shuffle), with tokens carrying 8-byte
    * xxhash64 keys so term strings never shuffle; corpus totals and
    * vocabulary size are a one-row broadcast (PlanLint-allowlisted
    * scalar attach, unigramSurprisal precedent). Per-token log
    * ratios round to 6 dp then fold through DECIMAL(38,6) — the
    * result is a pure function of the token multiset under any
    * partitioning. Hash collisions can only merge term counts
    * (noise well under the rounding at realistic vocabularies). */
  def dsirWeight(docs: DataFrame, targetPred: Column,
                 idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val tok = docs.select(col(idCol), targetPred.as("is_t"),
      explode(split(col(textCol), " ")).as("term"))
      .select(col(idCol), col("is_t"), xxhash64(col("term")).as("th"))
    val freq = tok.groupBy(col("th")).agg(
      count(lit(1)).as("rc"),
      sum(when(col("is_t"), lit(1L)).otherwise(lit(0L))).as("tc"))
    val tot = freq.groupBy().agg(
      sum(col("rc")).cast("double").as("r_total"),
      sum(col("tc")).cast("double").as("t_total"),
      count(lit(1)).cast("double").as("v"))
    tok.join(freq, "th")
      .crossJoin(broadcast(tot))
      .select(col(idCol), round(
        log((col("tc") + lit(1.0)) / (col("t_total") + col("v"))) -
          log((col("rc") + lit(1.0)) / (col("r_total") + col("v"))), 6)
        .as("lw"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("lw").cast("decimal(38,6)")).cast("double"), 6)
          .as("log_weight"))
  }

  /** The (n_tokens, quality) column pair behind [[classifierScore]],
    * shared with the streaming twin ([[graft.streaming.Streams]]) —
    * pure select expressions, so they bind to batch and streaming
    * frames alike. */
  def classifierCols(text: Column, modulus: Int = 1009,
                     slope: Double = 4.0): (Column, Column) = {
    val nTok = (length(text) - length(translate(text, " ", "")) + 1)
      .cast("long")
    val hsum = graft.plans.TextHashExpressions.featureHashSum(text, modulus)
    val quality = round(lit(1.0) / (lit(1.0) + exp(lit(-slope) *
      (hsum.cast("double") /
        (lit(modulus.toDouble) * nTok.cast("double")) -
        lit(0.5)))), 6)
    (nTok, quality)
  }

  /** fastText-style hashed-linear quality-classifier scoring (the
    * CCNet / LLaMA-pipeline quality-filter stage, with the trained
    * weight table replaced by a deterministic feature-hash weight so
    * the score verifies cross-engine): each token maps through the
    * char-polynomial feature hash to a weight in [-0.5, 0.5), the
    * document logit is the mean token weight, and the score is its
    * sigmoid at `slope`. To slot in real trained weights, the hash
    * becomes the embedding-table index — the plan shape is
    * unchanged.
    *
    * Scale shape: pure map-only scoring — ONE codegen'd kernel pass
    * per document ([[graft.plans.TextHash.featureHashSum]]; no
    * explode, no token objects, no shuffle of any kind) followed by
    * a scalar expression. The token count is the space count + 1
    * (exactly `size(split(text, ' '))`, without materializing the
    * token array). The per-document fold is integer-exact, so the
    * score is bit-identical under any partitioning, and the only
    * floating-point arithmetic is one deterministic scalar chain per
    * row (shared verbatim with the oracle SQL). */
  def classifierScore(docs: DataFrame, modulus: Int = 1009,
                      slope: Double = 4.0, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val (nTok, quality) = classifierCols(col(textCol), modulus, slope)
    docs.select(col(idCol), nTok.as("n_tokens"), quality.as("quality"))
  }

  /** Dataset-card summary per source: the corpus-level aggregate a
    * curation run reports (doc counts, size, token volume, language
    * spread, quality means). ONE partial-agged pass over the corpus —
    * every statistic is a map-side-combinable aggregate (sums in
    * decimal for bit-reproducibility, distinct langs exact via
    * count_distinct: language cardinality is tiny; swap in
    * approx_count_distinct for unbounded dimensions). */
  def corpusStats(docs: DataFrame, sourceCol: String = "source",
                  langCol: String = "lang",
                  textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.groupBy(col(sourceCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(t).cast("long")).as("n_chars"),
        sum(size(wordTokens(t)).cast("long")).as("n_words"),
        count_distinct(col(langCol)).as("n_langs"),
        round(sum(length(t).cast("decimal(28,6)")).cast("double") /
          count(lit(1)), 6).as("mean_chars"))
  }

  /** Language-ID applied over a documents table. */
  def langIdTable(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame =
    docs.select(col(idCol), langId(col(textCol)).as("lang_guess"))

  /** Approximate corpus top-k terms via the mergeable Misra-Gries
    * summary (plans/ApproxTopKAggregate) — the sketch twin of
    * `vocabTopK` for vocabularies too large to aggregate exactly:
    * fixed `capacity` counters per partial, one map-side pass, no
    * term shuffle at all (only capacity-sized summaries merge).
    * Reported counts are lower bounds within n/(capacity+1) of
    * truth; membership of true heavy hitters is guaranteed. */
  def approxVocabTopK(docs: DataFrame, k: Int = 20, capacity: Int = 256,
                      textCol: String = "text"): DataFrame =
    docs
      .select(explode(wordTokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .agg(graft.plans.ApproxTopKAggregate
        .approxTopK(col("term"), k, capacity).as("top"))
      .select(posexplode(col("top")).as(Seq("rank0", "t")))
      .select((col("rank0") + 1).as("rank"), col("t.term").as("term"),
        col("t.min_count").as("min_count"))

  /** Canonicalize text for dedup/fingerprinting: Unicode NFC (the
    * codegen'd kernel — combining sequences and precomposed forms
    * must hash identically), lower-case, trim, collapse runs of
    * whitespace. Map-only; run this BEFORE any hash-based dedup
    * family member or visually-identical documents land in different
    * buckets. */
  def normalizeText(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
      regexp_replace(
        trim(lower(graft.plans.TextHashExpressions.normalizeText(
          col(textCol)))),
        "\\s+", " ").as("norm_text"))

  /** Corpus vocabulary top-k — the tokenizer-training / vocab-audit
    * pass: global term frequencies and document frequencies, top-k by
    * frequency. The explode's output shrinks immediately into a
    * partial-agged (term) rollup — the shuffle carries one row per
    * distinct term per partition, and the global top-k is a
    * TakeOrdered merge, never a full sort. For df, count_distinct on
    * doc ids is exact; at open-web vocabulary sizes swap in
    * approx_count_distinct. */
  def vocabTopK(docs: DataFrame, k: Int = 20, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol), explode(wordTokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term"))
      .agg(count(lit(1)).as("freq"),
        count_distinct(col(idCol)).as("df"))
      .orderBy(col("freq").desc, col("term"))
      .limit(k)

  /** RAG-style document chunking: fixed-size character windows with
    * `overlap` characters shared between consecutive chunks, emitted
    * with stable ids and char offsets so chunks can be traced back to
    * (and re-assembled into) their source documents. Empty or
    * shorter-than-size documents yield exactly one (possibly
    * truncated) chunk, so no document silently disappears.
    *
    * Scale design: a single map-side pass — `sequence` + `explode`
    * fan a row out to its chunk starts and `substr` slices each
    * window; no shuffle, no UDF, the row count grows by ~len/stride
    * exactly where the data does. Chunk counts use exact integer
    * ceil-division ((n-overlap+stride-1)/stride with stride =
    * size-overlap), auditable verbatim in ANSI SQL. */
  def chunkDocs(docs: DataFrame, size: Int, overlap: Int,
                idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      "need size > 0 and 0 <= overlap < size")
    val stride = size - overlap
    val n = length(col(textCol)).cast("long")
    val nChunks = greatest(lit(1L),
      floor((n - lit(overlap.toLong) + lit(stride - 1L)) / lit(stride.toLong))
        .cast("long"))
    docs
      .select(col(idCol), col(textCol),
        explode(sequence(lit(0L), nChunks - 1)).as("__i"))
      .select(col(idCol),
        col("__i").cast("int").as("chunk_id"),
        (col("__i") * stride).cast("long").as("chunk_start"),
        col(textCol).substr((col("__i") * stride + 1).cast("int"),
          lit(size)).as("chunk_text"))
  }

  /** Cross-source vocabulary overlap via mergeable HLL sketches —
    * "how lexically similar are my corpus sources?" at 100 TB cost:
    * ONE pass over the tokens builds a bounded-size HLL++ sketch per
    * source (the aggregation state is the sketch, never the vocab),
    * then all pairwise estimates run on the |sources|-row sketch
    * table: |A∪B| by sketch union, |A∩B| by inclusion–exclusion,
    * Jaccard from the two. The pair stage is a self-join of k
    * one-row-per-source sketches — model-state scale, deliberately
    * NOT a corpus operation (PlanLint-allowlisted as such). Exact
    * pairwise intersections would need a token-level self-join of
    * the corpus; the sketches replace it with error ~1–2% at the
    * default lgConfigK, tolerance-tested vs exact in
    * TextAnalysisSpec. */
  def sourceVocabOverlap(docs: DataFrame, srcCol: String = "source",
                         textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(srcCol).as("__src"),
        explode(split(lower(col(textCol)), "\\s+")).as("__tok"))
      .where(length(col("__tok")) > 0)
    val sk = toks.groupBy(col("__src"))
      .agg(hll_sketch_agg(col("__tok")).as("__sk"))
    val a = sk.select(col("__src").as("src_a"), col("__sk").as("__ska"))
    val b = sk.select(col("__src").as("src_b"), col("__sk").as("__skb"))
    val uni = hll_sketch_estimate(hll_union(col("__ska"), col("__skb")))
    val ca = hll_sketch_estimate(col("__ska"))
    val cb = hll_sketch_estimate(col("__skb"))
    a.join(b, col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        ca.as("vocab_a"), cb.as("vocab_b"), uni.as("vocab_union"))
      .withColumn("vocab_inter",
        greatest(col("vocab_a") + col("vocab_b") - col("vocab_union"),
          lit(0L)))
      .withColumn("jaccard_est",
        round(col("vocab_inter").cast("double") /
          col("vocab_union").cast("double"), 6))
  }

  /** EXACT twin of [[sourceVocabOverlap]]: per-source distinct-token
    * sets compared by a token-keyed equi-join instead of HLL
    * sketches, so every pair's overlap is set arithmetic —
    * auditable verbatim in ANSI SQL. Cost: one (src, token) dedup
    * shuffle plus a join emitting Σ_tok C(#sources with tok, 2)
    * rows — fine while the source dimension is catalog-sized (it
    * is: sources are crawls/registries, not documents). For an
    * unbounded source count, [[sourceVocabOverlap]] is the
    * capacity-bounded sketch path with the same output shape. */
  def sourceVocabOverlapExact(docs: DataFrame,
                              srcCol: String = "source",
                              textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(srcCol).as("__src"),
        explode(split(lower(col(textCol)), "\\s+")).as("__tok"))
      .where(length(col("__tok")) > 0)
      .distinct()
    val sizes = toks.groupBy(col("__src"))
      .agg(count(lit(1)).as("__vocab"))
    val a = sizes.select(col("__src").as("src_a"),
      col("__vocab").as("vocab_a"))
    val b = sizes.select(col("__src").as("src_b"),
      col("__vocab").as("vocab_b"))
    val ta = toks.select(col("__src").as("__sa"), col("__tok").as("__ta"))
    val tb = toks.select(col("__src").as("__sb"), col("__tok").as("__tb"))
    val inter = ta
      .join(tb, col("__ta") === col("__tb") && col("__sa") < col("__sb"))
      .groupBy(col("__sa"), col("__sb"))
      .agg(count(lit(1)).as("__inter"))
    // all pairs survive, zero-overlap ones included (left join + 0)
    val pairs = a.join(b, col("src_a") < col("src_b"))
    pairs.join(inter,
        pairs("src_a") === inter("__sa") && pairs("src_b") === inter("__sb"),
        "left")
      .select(col("src_a"), col("src_b"), col("vocab_a"), col("vocab_b"),
        (col("vocab_a") + col("vocab_b") -
          coalesce(col("__inter"), lit(0L))).as("vocab_union"),
        coalesce(col("__inter"), lit(0L)).as("vocab_inter"))
      .withColumn("jaccard_est",
        round(col("vocab_inter").cast("double") /
          col("vocab_union").cast("double"), 6))
  }
}
