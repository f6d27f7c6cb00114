package graft.queries

import org.apache.spark.sql.SparkSession

import graft.ops.Pca

/** One session-scoped memo: value computed once per (session, dir),
  * entries keyed by a DEAD session evicted on the next call (PqStage's
  * retention contract), so a long-lived JVM cycling sessions cannot
  * accumulate stale state. The eviction rule lives HERE, once — the
  * fitted-direction and dim-stats memos below (and any future staged
  * artifact) share it instead of copy-pasting it.
  *
  * Eviction keeps every LIVE session's entries (isStopped check), not
  * just the caller's — two concurrently live sessions (a parallel test
  * runner, a multi-tenant JVM) each keep their staged artifacts instead
  * of thrashing each other into silent re-training on every call.
  * getOrElseUpdate on a TrieMap may evaluate `compute` twice under a
  * concurrent first call for the SAME key (one result wins, the loser's
  * checkpoint blocks are garbage-collected with its lineage) — a
  * duplicated one-time staging, never a wrong answer. */
private[queries] final class SessionMemo[A] {
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), A]
  def apply(s: SparkSession, dir: String)(compute: => A): A = {
    cache.filterInPlace { case ((sess, _), _) =>
      (sess eq s) || !sess.sparkContext.isStopped }
    cache.getOrElseUpdate((s, dir), compute)
  }
}

/** Staged PCA artifacts, computed once per (session, sf-dir) — the
  * PqStage pattern: a production pipeline fits once and persists;
  * queries that USE a fit (covariance presentation, projection,
  * standardization) read the staged artifacts, while the fit rows
  * (`embedding_pca`, `embedding_dim_stats`) deliberately re-fit fresh
  * so the rows that carry training cost in the bench report it
  * honestly (the pq_train convention). */
object PcaStage {

  /** Power-iteration count — single source of truth for the queries and
    * the oracle chain. */
  val Iters = 8

  final case class Fitted(mean: Array[Double], direction: Array[Long])

  private val fittedMemo = new SessionMemo[Fitted]

  def fitted(s: SparkSession, dir: String): Fitted =
    fittedMemo(s, dir) {
      val (mean, d) = Pca.fit(
        s.read.parquet(s"$dir/embeddings.parquet"), "embedding", Iters)
      Fitted(mean, d)
    }

  /** Per-dimension (mean, sigma) — the standardization table. */
  final case class DimStats(mean: Array[Double], sigma: Array[Double])

  private val statsMemo = new SessionMemo[DimStats]

  def dimStats(s: SparkSession, dir: String): DimStats =
    statsMemo(s, dir) {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      val mean = Pca.meanVector(e, "embedding")
      val rows = Pca.dimStats(e, "embedding", mean)
        .orderBy("i").collect()
      DimStats(mean, rows.map(_.getDouble(2)))
    }
}
