package graft

import graft.core.Skew
import graft.functions.CappedSample
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AggregatorSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("cappedSample keeps the smallest N sorted, across partitions, ignoring nulls") {
    val df = spark.range(1000).toDF("x").repartition(7)
      .select(when(col("x") % 3 === 0, lit(null))
        .otherwise(format_string("%04d", col("x"))).as("v"))
    val got = df.agg(CappedSample.cappedSample(col("v"), 5)).first()
      .getSeq[String](0)
    assert(got === Seq("0001", "0002", "0004", "0005", "0007"))
  }

  test("cappedSample matches sort_array+slice on grouped data") {
    val df = Seq(("a", "3"), ("a", "1"), ("a", "2"), ("b", "9"), ("b", "8"))
      .toDF("g", "v")
    val got = df.groupBy("g")
      .agg(CappedSample.cappedSample(col("v"), 2).as("s"),
        slice(sort_array(collect_list(col("v"))), 1, 2).as("ref"))
      .filter(col("s") =!= col("ref")).count()
    assert(got === 0L)
  }

  test("salted join equals plain join") {
    val large = spark.range(10000).toDF("k")
      .withColumn("k", col("k") % 10) // heavy skew: 10 hot keys
    val small = Seq((0L, "x"), (1L, "y"), (5L, "z")).toDF("k", "v")
    val plain = large.join(small, Seq("k")).groupBy("k", "v").count()
      .orderBy("k").collect().toSeq
    val salted = Skew.saltedJoin(large, small, Seq("k"), buckets = 4)
      .groupBy("k", "v").count().orderBy("k").collect().toSeq
    assert(salted === plain)
  }

  test("approx_count_distinct within rsd contract on real data") {
    val got = SparkEntry.queries("q54_approx_distinct")(
      spark, SparkTestSession.sfDir)
      .filter(!col("within_5pct")).count()
    assert(got === 0L)
  }

  test("misra-gries: heavy items survive any partitioning; sketch stays " +
      "within capacity") {
    import graft.functions.MisraGries
    // 10k rows: item "hot-i" appears 500+i times (i<10, all > n/(cap+1)
    // for cap=64 → must survive); the rest is a long uniform tail.
    val hot = (0 until 10).flatMap(i => Seq.fill(500 + i)(s"hot-$i"))
    val tail = (0 until 10000 - hot.size).map(i => s"tail-${i % 1500}")
    val n = hot.size + tail.size
    val cap = 64
    assert(500 > n.toDouble / (cap + 1)) // the planted items clear the bar
    for (parts <- Seq(1, 7, 32)) {
      val df = spark.sparkContext.parallelize(
        new scala.util.Random(7).shuffle(hot ++ tail), parts).toDF("v")
      val mg = udaf(new MisraGries(cap))
      val got = df.agg(mg(col("v")).as("s"))
        .select(col("s.keys"), col("s.saturated")).first()
      val keys = got.getSeq[String](0)
      assert(keys.size <= cap)
      assert(got.getBoolean(1)) // 1510 distinct over cap=64 → evictions
      for (i <- 0 until 10) assert(keys.contains(s"hot-$i"), s"parts=$parts")
    }
    // a sketch that never evicts certifies itself complete and exact
    val small = spark.sparkContext.parallelize(
      Seq("a", "b", "a", "c"), 2).toDF("v")
    val mgBig = udaf(new MisraGries(1000))
    val comp = small.agg(mgBig(col("v")).as("s"))
      .select(col("s.keys"), col("s.saturated")).first()
    assert(comp.getSeq[String](0) === Seq("a", "b", "c"))
    assert(!comp.getBoolean(1))
  }
}
