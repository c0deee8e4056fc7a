package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import graft.core.Tables
import graft.scale._

/** Scratch stage profiler for q130 (curateV2) — NOT part of the library. */
object ProfileQ130 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val docs = Tables.load(spark, dir, "documents")
    val corpus = docs.filter(col("doc_id") % 50 =!= 0)
    val bench = docs.filter(col("doc_id") % 50 === 0)
    val embeddings = Tables.load(spark, dir, "embeddings")
    val idCol = "doc_id"; val textCol = "text"; val langCol = "lang"
    val p = Dedup.MinHashParams(k = 64, bands = 16, shingle = 3,
      reproducible = true)
    val minQuality = 0.5; val minJaccard = 0.7
    val semK = 8; val semIters = 2; val semMinCosine = 0.9
    val semMaxNeighbors = 16
    val unitTokens = 3; val decontamN = 5
    val tau = 0.7; val budgetDocs = 150L
    val packBudget = 512L; val packShards = 4; val seed = 42L

    var last = System.nanoTime()
    def t(label: String): Unit = {
      val now = System.nanoTime()
      println(f"STAGE $label%-28s ${(now - last) / 1e9}%8.3f s")
      last = now
    }

    for (round <- 1 to 2) {
      println(s"=== round $round ===")
      last = System.nanoTime()
      val quality = corpus
        .filter(TextStats.qualityScore(col(textCol)) >= minQuality)
      val exact = Dedup.exactDedup(quality, idCol, textCol)
        .drop("fingerprint")
        .persist()
      exact.count(); t("quality+exactDedup")
      // maxBucket matches the production q100/q130 entries (guarded +
      // broadcast candidate-id semi-filter) — the profiler must measure
      // the SHIPPED plan, not the unguarded variant
      val (ndups, releaseShingles) = Dedup
        .nearDuplicatesReleasable(exact, idCol, textCol, minJaccard, p,
          maxBucket = Some(1000))
      val pairs = ndups.select("id_a", "id_b").persist()
      pairs.count(); t("minhash pairs")
      releaseShingles()
      val reps = Clusters.dedupClusters(exact, pairs, idCol)
        .filter(col(idCol) === col("cluster_id"))
        .select(col(idCol), col("cluster_id"), col(langCol), col(textCol))
        .localCheckpoint(true)
      t("clusters+reps")
      exact.unpersist()
      pairs.unpersist()

      val emb = embeddings
        .select(col("vec_id"), col("embedding").cast("array<double>").as("__e"))
        .withColumn("__mx",
          array_max(transform(col("__e"), (x: Column) => abs(x))))
        .filter(col("__mx") > 0)
        .select(col("vec_id"), Similarity.quantizeInt8(col("__e")).as("__q"))
      val withEmb = reps.select(col(idCol))
        .join(emb, col(idCol) === col("vec_id"))
        .select(col(idCol), col("__q"))
      val marks = KMeans.semanticDups(withEmb, idCol, "__q",
        semK, semIters, semMinCosine, semMaxNeighbors)
      t("  sem: kmeans iters")
      val afterSem = reps
        .join(marks.select(col(idCol), col("is_dup")), Seq(idCol), "left")
        .filter(coalesce(col("is_dup"), lit(0)) === 0)
        .drop("is_dup")
      afterSem.count(); t("  sem: final+window+join")

      val units = afterSem
        .select(col(idCol), col("cluster_id"), col(langCol),
          filter(split(col(textCol), "\\s+"), (t: Column) => t =!= "")
            .as("__toks"))
        .select(col(idCol), col("cluster_id"), col(langCol),
          Dedup.unitChunks(col("__toks"), unitTokens).as("__units"))
        .persist()
      val reassembled = units
        .select(col(idCol), col("cluster_id"), col(langCol))
        .join(Dedup.unitDedup(units.select(col(idCol), col("__units")),
            idCol, "__units")
          .filter(col("n_kept") > 0).select(col(idCol), col("dedup_text")),
          Seq(idCol))
        .localCheckpoint(true)
      units.unpersist(); t("unit dedup")

      val cleanIds = Decontaminate.overlap(
          reassembled.select(col(idCol), col("dedup_text")),
          bench.select(col(idCol), col(textCol).as("dedup_text")),
          idCol, "dedup_text", n = decontamN)
        .filter(col("contaminated") === 0).select(col(idCol))
      val clean = reassembled.join(cleanIds, Seq(idCol))
      clean.count(); t("decontaminate")

      val mixed = Sampling.temperatureMix(clean, langCol, "dedup_text",
        tau, budgetDocs)
      val out = Sampling.packSequences(
        mixed.select(col(idCol), col("cluster_id"), col(langCol),
          TextStats.tokenCountWs(col("dedup_text")).as("n_toks")),
        idCol, "n_toks", packBudget, packShards, seed)
        .select(col(idCol), col("cluster_id"), col(langCol), col("n_toks"),
          col("shard"), col("shard_pos"), col("pack_id"), col("pack_pos"),
          col("pack_fill"))
      out.count(); t("mix+pack")
    }
    spark.stop()
  }
}
