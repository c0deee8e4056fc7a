package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composed training-data pipeline
  * the individual operators exist for:
  *
  *   quality filter → exact dedup → MinHash near-dup candidate pairs →
  *   connected-component clustering → one representative per cluster →
  *   deterministic content-hash split.
  *
  * Every stage is deterministic (reproducible-hash MinHash mode), so
  * the WHOLE pipeline is oracle-checkable, and every stage is a
  * shuffle-bounded DataFrame op (no collect, no driver loops except
  * the O(diameter) label-propagation rounds). */
object Curation {

  def curate(docs: DataFrame, idCol: String, textCol: String,
      minQuality: Double, minJaccard: Double,
      p: Dedup.MinHashParams): DataFrame = {
    val quality = docs
      .filter(TextStats.qualityScore(col(textCol)) >= minQuality)
    // persist: the quality regex battery + dedup window feed THREE
    // consumers (signature explode, cluster assignment, split) — without
    // this the whole upstream recomputes per consumer
    val exact = Dedup.exactDedup(quality, idCol, textCol)
      .drop("fingerprint")
      .persist()
    val (ndups, releaseShingles) = Dedup
      .nearDuplicatesReleasable(exact, idCol, textCol, minJaccard, p)
    // materialize the (tiny) pair list ONCE: the undirected-edge union
    // and every label-propagation round would otherwise re-run the
    // whole candidate+verify chain per consumer
    val pairs = ndups.select("id_a", "id_b").persist()
    pairs.count()
    releaseShingles()
    val clustered = Clusters.dedupClusters(exact, pairs, idCol)
    // cluster_id is the component's min id, so the representative is
    // the row whose own id equals it (singletons represent themselves)
    val reps = clustered.filter(col(idCol) === col("cluster_id"))
    val out = Sampling.deterministicSplit(reps, textCol)
      .select(col(idCol), col("cluster_id"), col("split"))
      // eager localCheckpoint: materializes the (per-representative,
      // i.e. small) result and truncates its lineage off `exact`, so the
      // cache can be released HERE — repeated curate() calls in one
      // session no longer accumulate cached shingle/dedup data
      .localCheckpoint(true)
    exact.unpersist()
    pairs.unpersist()
    out
  }
}
