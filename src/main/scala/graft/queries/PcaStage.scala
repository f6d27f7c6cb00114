package graft.queries

import org.apache.spark.sql.SparkSession

import graft.ops.Pca

/** Staged PCA artifacts, computed once per (session, sf-dir) — the
  * PqStage pattern: a production pipeline fits the direction once and
  * persists it; queries that USE the fit (covariance presentation,
  * projection) read the staged artifacts, while `embedding_pca`
  * deliberately re-fits fresh so the row that carries the training cost
  * in the bench reports it honestly (the pq_train convention). Entries
  * keyed by a dead session are evicted on the next call (PqStage's
  * retention contract), so a long-lived JVM cycling sessions cannot
  * accumulate stale fits. */
object PcaStage {

  /** Power-iteration count — single source of truth for the queries and
    * the oracle chain. */
  val Iters = 8

  final case class Fitted(mean: Array[Double], direction: Array[Long])

  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Fitted]

  def fitted(s: SparkSession, dir: String): Fitted = {
    cache.filterInPlace { case ((sess, _), _) => sess eq s }
    cache.getOrElseUpdate((s, dir), {
      val (mean, d) = Pca.fit(
        s.read.parquet(s"$dir/embeddings.parquet"), "embedding", Iters)
      Fitted(mean, d)
    })
  }

  /** Per-dimension (mean, sigma) — the standardization table, staged
    * like the fit: `embedding_dim_stats` deliberately re-fits fresh
    * (that row carries the cost in the bench); the USE row
    * (`embedding_standardize`) reads this memo. */
  final case class DimStats(mean: Array[Double], sigma: Array[Double])

  private val statsCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DimStats]

  def dimStats(s: SparkSession, dir: String): DimStats = {
    statsCache.filterInPlace { case ((sess, _), _) => sess eq s }
    statsCache.getOrElseUpdate((s, dir), {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      val mean = Pca.meanVector(e, "embedding")
      val rows = Pca.dimStats(e, "embedding", mean)
        .orderBy("i").collect()
      DimStats(mean, rows.map(_.getDouble(2)))
    })
  }
}
