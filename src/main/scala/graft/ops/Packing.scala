package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: lay documents out into fixed token-budget bins — the
  * "pack short documents into 2k/4k/8k context windows" step of a
  * pretraining data pipeline.
  *
  * The layout is offset-based contiguous packing (the streaming idiom:
  * concatenate the stream in a deterministic order, then cut every `budget`
  * tokens): a document's bin is `floor(start_offset / budget)`, where
  * start_offset is the running token count of everything before it in its
  * stream. Pure window arithmetic — one shuffle on the stream key, one
  * sorted pass, no driver state — and fully deterministic given (stream,
  * order), so the same corpus always packs identically (resume-safe).
  * First-fit-decreasing packs ~tighter but needs sequential state; at
  * 100 TB the contiguous cut is what's actually used, and a doc longer
  * than the budget simply spans bins (flagged via `spans_bins`).
  */
object Packing {

  /** Assign each row a bin by running token offset within its stream.
    *
    * @param stream   partition stream (e.g. language, shard) — each stream
    *                 packs independently
    * @param order    total order within the stream (e.g. the doc id)
    * @param nTokens  token count column (must be non-negative)
    * @param budget   bin capacity in tokens
    * @return input plus `cum_tokens` (inclusive running total), `bin_id`
    *         (bin of the row's first token) and `spans_bins` (row crosses a
    *         bin boundary)
    */
  def packByTokenBudget(df: DataFrame, stream: Column, order: Column,
                        nTokens: Column, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(stream).orderBy(order.asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    // Integer DIV, not floor(double/double): exact at any cumulative token
    // count (a double loses integers past 2^53, which a 100 TB stream can
    // reach), and ≡ floor division for the non-negative operands here.
    df.withColumn("cum_tokens", sum(nTokens).over(w))
      .withColumn("__start", (col("cum_tokens") - nTokens).cast("long"))
      .withColumn("bin_id", expr(s"__start DIV $budget").cast("long"))
      .withColumn("spans_bins",
        expr(s"(cum_tokens - 1) DIV $budget").cast("long") > col("bin_id"))
      .drop("__start")
  }

  /** Materialize packed bins: one row per (stream, bin) with the documents
    * concatenated in pack order — the sequence the trainer actually reads.
    * The per-group collect is bounded by the bin BUDGET, not the corpus
    * (a bin holds at most `budget` tokens plus one spanning document), so
    * the group state stays small at any data scale; the shuffle key is
    * (stream, bin_id), which is near-uniform by construction.
    */
  def materializeBins(packed: DataFrame, stream: Column, order: Column,
                      nTokens: Column, payload: Column,
                      sep: String = "\n\n"): DataFrame =
    packed.groupBy(stream.as("stream"), col("bin_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(nTokens).cast("long").as("bin_tokens"),
        concat_ws(sep, transform(
          array_sort(collect_list(struct(order.as("o"), payload.as("p")))),
          x => x.getField("p"))).as("sequence"))
}
