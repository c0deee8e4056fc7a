package graft

import graft.core.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions: the 100 TB posture claims (pushdown,
  * pruning, broadcast, bucketed co-location) checked against the real
  * plans, not prose. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def formatted(df: DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
    out.toString
  }

  test("filters and projection push into the parquet scan") {
    val df = Tables.load(spark, SparkTestSession.sfDir, "orders")
      .filter(col("o_totalprice") > 100000 && col("o_orderstatus") === "F")
      .select("o_orderkey", "o_totalprice")
    val plan = formatted(df)
    assert(plan.contains("PushedFilters:") &&
      plan.contains("GreaterThan(o_totalprice,100000.0)"),
      s"pushdown missing:\n$plan")
    // pruned read schema: only the referenced columns
    assert(plan.contains(
      "struct<o_orderkey:bigint,o_orderstatus:string,o_totalprice:double>"),
      s"column pruning missing:\n$plan")
  }

  test("star join broadcasts every dimension (fact side never shuffles)") {
    val plan = planOf(SparkEntry.queries("q2_star_join")(
      spark, SparkTestSession.sfDir))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"), s"unexpected SMJ:\n$plan")
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort") {
    val plan = planOf(SparkEntry.queries("q22_topk")(
      spark, SparkTestSession.sfDir))
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("aggregations are partial+final (map-side combine before shuffle)") {
    val plan = formatted(SparkEntry.queries("q1_kpi_agg")(
      spark, SparkTestSession.sfDir))
    assert(plan.contains("partial_sum"), plan)
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft_bkt").toString
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_bkt")
    try {
      val o = Tables.load(spark, SparkTestSession.sfDir, "orders")
      val c = Tables.load(spark, SparkTestSession.sfDir, "customer")
      o.write.mode("overwrite").bucketBy(4, "o_custkey").sortBy("o_custkey")
        .option("path", s"$wh/orders_b").saveAsTable("graft_bkt.orders_b")
      c.withColumnRenamed("c_custkey", "o_custkey")
        .write.mode("overwrite").bucketBy(4, "o_custkey").sortBy("o_custkey")
        .option("path", s"$wh/customer_b").saveAsTable("graft_bkt.customer_b")
      val joined = spark.table("graft_bkt.orders_b")
        .join(spark.table("graft_bkt.customer_b"), "o_custkey")
      val plan = planOf(joined)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bkt.orders_b")
      spark.sql("DROP TABLE IF EXISTS graft_bkt.customer_b")
      spark.sql("DROP DATABASE IF EXISTS graft_bkt")
    }
  }

  test("whole-stage codegen covers the flagship aggregation") {
    val df = SparkEntry.queries("q1_kpi_agg")(spark, SparkTestSession.sfDir)
    df.collect() // AQE shows codegen spans only in the finalized plan
    val plan = planOf(df)
    assert(plan.contains("isFinalPlan=true") && plan.contains("*("),
      s"no WholeStageCodegen spans:\n$plan")
  }

  test("whole-stage codegen spans the deletion-vector scan filter " +
      "(dv_live is a native expression, not a UDF fence)") {
    val t = java.nio.file.Files.createTempDirectory("plan_dv").toString
    import spark.implicits._
    graft.ingest.DeltaLakeWrite.append(
      (0L until 100L).map(i => (i, s"v$i")).toDF("id", "v")
        .repartition(1), t)
    graft.ingest.DeltaLakeDml.delete(spark, t, "id % 3 = 0")
    val df = graft.ingest.DeltaLakeRead.snapshot(spark, t)
    assert(df.count() === 66L)
    val wscg = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
        w.toString
    }
    assert(wscg.exists(s => s.contains("dv_live")),
      "the DV filter must live INSIDE a WholeStageCodegen span:\n" +
        df.queryExecution.executedPlan.toString)
    val plan = planOf(df)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"DV subtraction still pays a UDF:\n$plan")
  }

  test("SCD2 build shares one exchange+sort across both window passes") {
    val plan = planOf(SparkEntry.queries("q85_scd2")(
      spark, SparkTestSession.sfDir))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    val sorts = "\\bSort \\[".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
    assert(sorts == 1, s"expected 1 sort, got $sorts:\n$plan")
  }

  test("NOT EXISTS / IN plan as anti + semi joins, not subquery loops") {
    val plan = planOf(SparkEntry.queries("q79_exists_in")(
      spark, SparkTestSession.sfDir))
    assert(plan.contains("LeftAnti"), s"no anti join:\n$plan")
    assert(plan.contains("LeftSemi"), s"no semi join:\n$plan")
  }

  test("CUBE grouping sets expand once and aggregate partial+final") {
    val plan = formatted(SparkEntry.queries("q76_cube")(
      spark, SparkTestSession.sfDir))
    assert(plan.contains("Expand"), s"no Expand:\n$plan")
    assert(plan.contains("partial_"), s"no partial agg:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 2, s"cube shuffles more than once:\n$plan")
  }

  test("partitioned read prunes to the filtered partition directory") {
    val plan = formatted(SparkEntry.queries("q98_partition_prune")(
      spark, SparkTestSession.sfDir))
    assert(plan.contains("PartitionFilters:") &&
      plan.contains("o_orderstatus"), s"no partition pruning:\n$plan")
    // the residual predicate still pushes to parquet
    assert(plan.contains("GreaterThan(o_totalprice,400000.0)"),
      s"residual pushdown missing:\n$plan")
  }

  test("window-extras query uses a single exchange for all five functions") {
    val plan = planOf(SparkEntry.queries("q80_window_extras")(
      spark, SparkTestSession.sfDir))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }

  test("lateral top-k decorrelates to WindowGroupLimit (no per-row subquery loop)") {
    val plan = planOf(SparkEntry.queries("q106_lateral")(
      spark, SparkTestSession.sfDir))
    assert(plan.contains("WindowGroupLimit"), plan)
    assert(!plan.contains("CartesianProduct"), s"lateral fell back:\n$plan")
  }

  test("runtime bloom filter from the selective dim side prunes the fact scan") {
    // At 100 TB the selective side of a shuffle join should seed a
    // runtime bloom filter that drops fact rows BEFORE the exchange.
    // Thresholds are sized for real tables, so shrink them to prove the
    // optimizer path fires on our plan shape.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val o = Tables.load(spark, SparkTestSession.sfDir, "orders")
        .filter(col("o_orderstatus") === "P") // selective build side
      val l = Tables.load(spark, SparkTestSession.sfDir, "lineitem")
      val joined = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy("o_orderstatus").agg(sum("l_quantity").as("qty"))
      val plan = planOf(joined)
      assert(plan.contains("might_contain") &&
        plan.contains("bloom_filter_agg"),
        s"no runtime bloom filter injected:\n$plan")
      assert(joined.count() > 0)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("LSH hot-bucket guard: banded stream shuffles ONCE in the corpus regime") {
    // the guard is a COUNT window over the SAME (band, bucket)
    // partitioning the self-join shuffles on. In the corpus regime
    // (sort-merge — what 100 TB runs; broadcast disabled here to force
    // it at spec scale), the window's exchange must BE the join's
    // exchange, with the second side a ReusedExchange: the round-9
    // groupBy+join alternative planned the banded stream (the curation
    // pipelines' dominant exchange) into separate exchanges per
    // consumer and cost +50% wall on q100. Asserted on the FINAL
    // adaptive plan — reuse is resolved during execution.
    import graft.scale.Dedup
    val saved = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
        .limit(200)
      val p = Dedup.MinHashParams(k = 16, bands = 4)
      val sigs = Dedup.signatures(docs, "doc_id", "text", p)
        .localCheckpoint(true) // common input: isolate the candidate stage
      val guarded = Dedup.candidatePairs(sigs, "doc_id", p, Some(8))
      guarded.collect() // drive AQE to the final plan
      // the adaptive plan prints final + "== Initial Plan ==" sections,
      // and ReusedExchange lines quote the exchange they reuse — count
      // only true Exchange operators in the FINAL section
      val plan = planOf(guarded).split("== Initial Plan ==").head
      val bandExchanges = plan.linesIterator.count(l =>
        l.contains("Exchange hashpartitioning(band") &&
          !l.contains("ReusedExchange"))
      assert(plan.contains("isFinalPlan=true"), s"plan not final:\n$plan")
      assert(bandExchanges == 1,
        s"banded stream shuffled $bandExchanges times (want 1):\n$plan")
      assert(plan.contains("ReusedExchange"),
        s"second join side did not reuse the band exchange:\n$plan")
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("vector hot-bucket guard: banded vec stream shuffles ONCE too") {
    // the q165 form: the guard's COUNT window partitions on the same
    // (__band, __bucket) the sign-LSH self-join shuffles on, so the
    // window's exchange must BE the join's exchange (ReusedExchange on
    // the second side) — the MinHash guard's one-exchange contract,
    // mirrored for the vector path the sf100 audit caught quadratic.
    import graft.scale.Dedup
    val emb = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
      .limit(150)
      .select(col("vec_id"), col("embedding").cast("array<double>")
        .as("embedding"))
    val guarded = Dedup.embeddingNearDupsBucketed(emb, "vec_id",
      "embedding", minCosine = 0.9, dim = 64, nPlanes = 8, bands = 2,
      maxBucket = Some(16))
    guarded.collect() // drive AQE to the final plan
    // at spec scale AQE may plan the band exchange as SinglePartition
    // (trivially satisfying the (__band, __bucket) clustering), so the
    // contract asserted is structural: the WHOLE final plan contains
    // exactly one real Exchange — the banded stream — and the second
    // join side is a ReusedExchange of it
    val plan = planOf(guarded).split("== Initial Plan ==").head
    val exchanges = plan.linesIterator.count(l =>
      l.contains("+- Exchange ") && !l.contains("ReusedExchange"))
    assert(plan.contains("isFinalPlan=true"), s"plan not final:\n$plan")
    assert(exchanges == 1,
      s"guarded vec plan has $exchanges real exchanges (want 1 — the " +
        s"banded stream, reused by the second join side):\n$plan")
    assert(plan.contains("ReusedExchange"),
      s"second join side did not reuse the band exchange:\n$plan")
  }

  // ---- generate hygiene (Dedup.scala class doc) -----------------------
  // InferFiltersFromGenerate plants `size(arr)>0 AND isnotnull(arr)`
  // below a NON-outer explode, and pushdown substitutes the full array
  // EXPRESSION through the staged projections — re-inlining the
  // tokenization (an interpreted regex split inside HOF lambdas) into a
  // Filter predicate where it re-evaluates per gram: O(tokens × grams)
  // per row. Invisible on 100-word driver docs; measured as task-HOURS
  // on KB documents. The fix is explode_outer + an explicit null filter
  // on the GENERATED column. These tests pin both directions.

  /** Filter conditions in the optimized plan that re-evaluate a split —
    * the tokenization leaking into a predicate. */
  private def splitBearingFilters(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.condition.toString.contains("split(") =>
        f.condition.toString.take(200)
    }

  test("positive control: a plain explode of a computed token array " +
    "DOES get the inferred split-bearing filter (the hazard is real)") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    // staged projection (the shape every operator here uses): the rule
    // infers size(__toks)>0 on the ATTRIBUTE, then pushdown substitutes
    // the defining expression through the projection — a direct
    // explode(expr) is outside the restricted rule and would not trip
    val plain = docs
      .select(graft.scale.TextStats.tokens(col("text")).as("__toks"))
      .select(explode(col("__toks")).as("t"))
      .groupBy("t").count()
    // If this ever starts passing empty, Spark fixed the rule upstream
    // and the explode_outer hygiene (and this guard) can be retired.
    assert(splitBearingFilters(plain).nonEmpty,
      "expected InferFiltersFromGenerate to plant a split-bearing " +
        "filter under plain explode — hazard gone, hygiene retirable?")
  }

  test("generate hygiene: no token/gram query re-evaluates its split " +
    "inside a Filter predicate") {
    val dir = SparkTestSession.sfDir
    for (q <- Seq("q127_paragraph_dedup", "q118_bigram_surprisal",
        "q138_bm25", "q46_token_stats", "q133_heavy_hitters",
        "q42_minhash_lsh", "q48_lang_id")) {
      val bad = splitBearingFilters(SparkEntry.queries(q)(spark, dir))
      assert(bad.isEmpty,
        s"$q: tokenization re-inlined into Filter predicate(s):\n" +
          bad.mkString("\n"))
    }
  }
}
