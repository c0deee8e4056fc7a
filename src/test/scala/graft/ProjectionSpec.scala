package graft

import graft.core.Tables
import graft.scale.Projection
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ProjectionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("projection values equal the driver-side exact-long fold (hand check)") {
    val emb = Seq(0.5f, -0.25f, 1.0f, -1.0f)
    val df = Seq((1L, emb)).toDF("vec_id", "embedding")
    val out = Projection.randomProject(df, "vec_id", "embedding",
      dIn = 4, dOut = 4)
      .orderBy("i").collect()
    val q = emb.map(v => math.floor(v.toDouble * Projection.Scale).toLong)
    for (r <- out) {
      val i = r.getInt(1)
      val expect = (1 to 4).map(j =>
        Projection.signLong("rp", i, j) * q(j - 1)).sum
      assert(r.getDouble(2) === expect.toDouble / Projection.Scale / 2.0,
        s"dim $i (sqrt(dOut)=2)")
    }
  }

  test("zero vector projects to zeros with dist_ratio 0, not NaN") {
    val df = Seq((1L, Seq.fill(4)(0.0f))).toDF("vec_id", "embedding")
    val out = Projection.randomProject(df, "vec_id", "embedding", 4, 4)
      .collect()
    assert(out.length === 4)
    assert(out.forall(r => r.getDouble(2) === 0.0 && r.getDouble(3) === 0.0))
  }

  test("JL distortion: per-vector norm ratios concentrate around 1 " +
      "on the real embeddings table") {
    val emb = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val ratios = Projection.randomProject(emb, "vec_id", "embedding", 64, 16)
      .filter(col("i") === 0).select("dist_ratio").as[Double].collect()
    assert(ratios.nonEmpty)
    assert(ratios.forall(r => r > 0.1 && r < 3.0),
      s"extreme distortion: min=${ratios.min} max=${ratios.max}")
    val mean = ratios.sum / ratios.length
    assert(mean > 0.8 && mean < 1.2, s"mean norm ratio $mean should be ~1")
  }

  test("plan: compression is a pure projection — ZERO exchanges of any kind") {
    val emb = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val plan = Projection.randomProject(emb, "vec_id", "embedding", 64, 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"random projection must run at scan speed:\n$plan")
  }

  test("sign matrix is deterministic and balanced-ish") {
    val signs = for (i <- 0 until 16; j <- 1 to 64)
      yield Projection.signLong("rp", i, j)
    assert(signs === (for (i <- 0 until 16; j <- 1 to 64)
      yield Projection.signLong("rp", i, j)))
    val pos = signs.count(_ == 1L)
    // md5 parity over 1024 draws: expect ~512 ± a few sigma (±~80)
    assert(pos > 400 && pos < 624, s"suspiciously unbalanced signs: $pos/1024")
  }
}
