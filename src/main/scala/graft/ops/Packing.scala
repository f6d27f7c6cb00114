package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: lay a corpus of variable-length documents end to end
  * into fixed-token-budget training sequences (the GPT-style "concat and
  * split at the context window" pretraining layout), emitting for every
  * document the exact spans it occupies — which sequence, at what offset
  * in the sequence, from what offset in the document, how many tokens.
  * A downstream tokenizing writer can materialize the packed sequences
  * from these spans without ever re-scanning the order.
  *
  * The packing order is explicit and deterministic: documents are laid
  * out in `order`-ascending order WITHIN each `shard`, and sequence ids
  * are per-shard. `order` must be UNIQUE within its shard: a cumulative
  * sum over tied order values has no defined result under a ROWS frame
  * (the layout would depend on partitioning and run — the opposite of
  * the bit-exact contract), so a duplicated (shard, order) pair FAILS
  * LOUDLY instead of silently shipping one of several possible layouts. Sharding is what makes this scale: a single global
  * packing order would funnel 100 TB through one window partition, while
  * per-shard packing (shard = input file, language, date bucket — any
  * key with bounded per-key volume) gives one exchange on the shard key
  * and an embarrassingly parallel cumulative sum per shard. That mirrors
  * what real pretraining pipelines do — packing is only ever required to
  * be deterministic per shard, not global.
  *
  * All arithmetic is integer (token counts, offsets), so the result is
  * bit-exact across engines and partitionings: the whole plan is one
  * window cumsum + a `sequence()` explode + integer projections.
  */
object Packing {

  /** Span layout of `df`'s documents packed into `budget`-token
    * sequences per shard. Output columns: the shard value as `shard`,
    * `seq_id` (0-based within shard), `seq_offset` (token position of
    * the span inside the sequence), the document's id column(s) as
    * passed, `doc_offset` (token position of the span inside the
    * document), `span_len` (> 0). A document longer than `budget`
    * straddles several sequences and emits one span row per sequence
    * touched; the spans of one document are contiguous and cover it
    * exactly once. Documents with `tokens <= 0` are rejected loudly —
    * a zero-length document would silently vanish from the layout — and
    * so is a (shard, order) duplicate (see the object doc).
    */
  def packSpans(df: DataFrame, shard: Column, order: Column, id: Column,
                tokens: Column, budget: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val b = lit(budget.toLong)
    // The guard lives INSIDE the token column (not a separate assert_true
    // projection, which column pruning would silently drop): every use of
    // the count goes through the when, so a non-positive count fails the
    // task loudly, naming the document, with no extra driver-side pass.
    val tok = when(tokens.cast("long") > 0, tokens.cast("long"))
      .otherwise(raise_error(concat(
        lit("packSpans: non-positive token count for doc "),
        id.cast("string"))).cast("long"))
    val base = df
      .select(shard.as("shard"), order.as("__pk_ord"), id.as("doc_id"),
        tok.as("__pk_tok"))
      // uniqueness guard for the ROWS-frame cumsum below: a count over
      // (shard, order) shares the cumsum's shard exchange and sort (the
      // subset-key distribution is already satisfied), and the raise
      // rides INSIDE __pk_start — every output column except the bare
      // shard/doc_id derives from it, so pruning cannot drop the check
      .withColumn("__pk_dup", count(lit(1)).over(
        Window.partitionBy(col("shard"), col("__pk_ord"))))
      .withColumn("__pk_start",
        when(col("__pk_dup") > 1, raise_error(concat(
          lit("packSpans: duplicate order value within shard "),
          col("shard").cast("string"),
          lit(" — the cumulative layout is undefined under ties; "),
          lit("pass a unique per-shard order (offending order: "),
          col("__pk_ord").cast("string"), lit(")"))).cast("long"))
          .otherwise(coalesce(sum(col("__pk_tok")).over(
            Window.partitionBy(col("shard")).orderBy(col("__pk_ord"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))))
    base
      .select(col("shard"), col("doc_id"), col("__pk_tok"),
        col("__pk_start"),
        explode(sequence(
          floor(col("__pk_start") / b).cast("long"),
          floor((col("__pk_start") + col("__pk_tok") - 1) / b).cast("long")))
          .as("seq_id"))
      .withColumn("__pk_span_start",
        greatest(col("__pk_start"), col("seq_id") * b))
      .withColumn("__pk_span_end",
        least(col("__pk_start") + col("__pk_tok"), (col("seq_id") + 1) * b))
      .select(
        col("shard"),
        col("seq_id"),
        (col("__pk_span_start") - col("seq_id") * b).as("seq_offset"),
        col("doc_id"),
        (col("__pk_span_start") - col("__pk_start")).as("doc_offset"),
        (col("__pk_span_end") - col("__pk_span_start")).as("span_len"))
  }

  /** Per-sequence fill statistics over [[packSpans]] output: how many
    * docs touch each sequence and how full it is. Only the LAST sequence
    * of a shard can be under-full; everything else is exactly `budget`
    * by construction — the spec pins that invariant.
    */
  def seqStats(spans: DataFrame, budget: Int): DataFrame =
    spans.groupBy(col("shard"), col("seq_id"))
      .agg(count(lit(1)).as("n_spans"),
        countDistinct(col("doc_id")).as("n_docs"),
        sum(col("span_len")).as("filled_tokens"))
      .withColumn("fill_frac",
        round(col("filled_tokens").cast("double") / budget, 6))
}
