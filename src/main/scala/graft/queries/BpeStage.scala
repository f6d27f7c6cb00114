package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.Bpe

/** Staged BPE artifacts — the PqStage pattern applied to the
  * tokenizer: a production pipeline trains its merge table ONCE and
  * every downstream consumer (document encoding, fertility
  * measurement, sequence packing) reads the staged artifact. The
  * `bpe_train` query stays memo-free (it IS the training benchmark
  * row, like `pq_train`); `bpe_fertility` / `bpe_encode` / `bpe_pack`
  * consume this stage, and the bench charges the one-time build to an
  * explicit `bpe_stage` accounting row (the r10 staging-attribution
  * rule: a consumer's timing must never silently include whichever
  * run populated the memo first).
  *
  * Memo contract: identical to [[PqStage]] — `dir`'s parquet immutable
  * for the session's lifetime, stopped-session entries dropped on
  * every call, LRU-capped (the shared [[SessionMemo]] rule).
  */
object BpeStage {

  /** The family's shared parameter: 8 merge steps — single source of
    * truth for the queries, the oracle chain, and the specs. */
  val Merges = 8

  final case class Staged(merges: Seq[Bpe.Merge], words: DataFrame,
                          vocab: DataFrame)

  private val memo = new SessionMemo[Staged]

  /** Merge table + final word table + token-id vocabulary for `dir`'s
    * documents, computed once per (session, sfDir). The word and vocab
    * tables come out pinned (train localCheckpoints its final table;
    * vocabIds is a driver-built LocalRelation). */
  def staged(s: SparkSession, dir: String): Staged =
    memo(s, dir) {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val (merges, words) = Bpe.train(docs, "text", Merges)
      // the vocabulary numbers off the PINNED word table's word
      // strings — zero extra corpus scans beyond train's own
      Staged(merges, words, Bpe.vocabIdsFromWords(words, merges))
    }
}
