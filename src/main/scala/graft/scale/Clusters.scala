package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair list — the step that
  * turns pairwise matches (MinHash/SimHash/jaccard output) into
  * canonical dedup clusters with one representative per cluster.
  *
  * Algorithm: min-label propagation. Every node starts labeled with its
  * own id; each round a node adopts the smallest label among itself and
  * its neighbors; fixpoint = every node carries the min id of its
  * component. Rounds needed = graph diameter (near-dup clusters are
  * shallow — chains of copies — so this converges in a handful of
  * rounds even at corpus scale).
  *
  * Scale design: each round is ONE shuffle (groupBy node, partial min
  * on the map side). `localCheckpoint` truncates lineage per round so
  * the plan does not grow with iterations, and the convergence check
  * rides the same pass (isEmpty on changed labels) instead of a second
  * join.
  *
  * Skew: a supernode of degree d puts d edge rows in one partition of
  * the edges⋈labels equi-join — but the labels side is one row per
  * node, so the join output is bounded by degree (no cross-product),
  * AQE's skew-join split rebalances the oversized partition, and the
  * following groupBy(src) re-keys the d rows across d DISTINCT spokes
  * with map-side partial min. A star graph also has diameter 2, so
  * rounds stay bounded — hub-heavy near-dup graphs converge FASTER,
  * not slower (Round2OpsSpec proves 10k-degree convergence in 3
  * rounds).
  */
object Clusters {

  /** (node, cluster_id) for every node present in `pairs`.
    * `pairs` must have two id columns; edges are treated as undirected.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 25): DataFrame = {
    val edges = pairs
      .select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .unionByName(pairs.select(col(bCol).cast("long").as("src"),
        col(aCol).cast("long").as("dst")))
      .distinct()
      .persist()

    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()

    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val neighborLabels = edges
        .join(labels.withColumnRenamed("node", "dst"), Seq("dst"))
        .select(col("src").as("node"), col("label"))
      // fused convergence check: the self row carries the previous
      // label through the same groupBy (no second join per round)
      val updated = labels.withColumn("__self", lit(true))
        .unionByName(neighborLabels.withColumn("__self", lit(false)))
        .groupBy("node")
        .agg(min("label").as("label"),
          min(when(col("__self"), col("label"))).as("__prev"))
        .localCheckpoint()
      converged = updated.filter(col("label") =!= col("__prev")).isEmpty
      labels = updated.drop("__prev")
      iter += 1
    }
    edges.unpersist()
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds — " +
        "a component's diameter exceeds maxIter; raise it (labels would " +
        "be silently wrong otherwise)")
    labels.withColumnRenamed("label", "cluster_id")
  }

  /** Assign EVERY row of `docs` to a cluster: members of a pair-graph
    * component get the component's min id, untouched docs are
    * singletons (their own id). Adds `cluster_id` and `cluster_size`. */
  def dedupClusters(docs: DataFrame, pairs: DataFrame, idCol: String,
      aCol: String = "id_a", bCol: String = "id_b"): DataFrame = {
    val comp = connectedComponents(pairs, aCol, bCol)
      .withColumnRenamed("node", idCol)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("cluster_id"))
    docs.join(comp, Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col(idCol)))
      .withColumn("cluster_size", count(lit(1)).over(w))
  }
}
