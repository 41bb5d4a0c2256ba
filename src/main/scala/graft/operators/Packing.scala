package graft.operators

import graft.functions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pre-training: lay documents out into
  * fixed-token-budget training sequences via concat-and-chunk (the
  * standard GPT-style packing — documents are concatenated in a
  * deterministic order and the token stream is sliced every `budget`
  * tokens, so sequences are exactly full and a document may straddle
  * a boundary).
  *
  * Scale design: packing runs independently per stratum (shard /
  * source), so the cumulative offset is a window partitioned by
  * stratum — parallel across strata, no global single-partition
  * sort. At 100 TB the strata are file-sized shards and each task
  * packs one shard's worth of offsets.
  */
object Packing {

  /** Packing plan: for each document, its token count, byte-stream
    * offsets within its stratum, and the first/last training
    * sequence it lands in. Deterministic for a given (stratum,
    * order) — re-runs and retries produce the same layout.
    *
    * @param tokenCount column computing the doc's token count (e.g.
    *   `size(wordTokens(col("text")))` or `bpeTokenCount`). */
  def packingPlan(docs: DataFrame, idCol: String, strataCol: String,
                  tokenCount: Column, budget: Int): DataFrame = {
    val w = Window.partitionBy(col(strataCol)).orderBy(col(idCol))
    val b = budget.toDouble
    docs.withColumn("n_tokens", tokenCount.cast("long"))
      .withColumn("end_off", sum(col("n_tokens")).over(w))
      .withColumn("start_off", col("end_off") - col("n_tokens"))
      .withColumn("seq_first",
        floor(col("start_off") / b).cast("long"))
      .withColumn("seq_last",
        floor((col("end_off") - 1) / b).cast("long"))
      .withColumn("n_splits", col("seq_last") - col("seq_first"))
  }

  /** Convenience over a documents table: whitespace tokens, packing
    * keyed by `source`. */
  def packDocuments(docs: DataFrame, budget: Int): DataFrame =
    packingPlan(docs, "doc_id", "source",
      size(wordTokens(col("text"))), budget)
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("start_off"), col("seq_first"), col("seq_last"),
        col("n_splits"))
}
