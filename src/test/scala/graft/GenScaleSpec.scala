package graft

import java.io.File

import org.scalatest.funsuite.AnyFunSuite

/** GenScale contract: deterministic output and the table-subset filter
  * (corpus-kernel audits generate only documents/embeddings — a 600M-row
  * lineitem at mult=1000 would waste most of the disk and wall-clock). */
class GenScaleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("tables filter writes exactly the requested tables") {
    val out = java.nio.file.Files.createTempDirectory("graft_gen").toString
    GenScale.generate(spark, out, mult = 0.02,
      tables = Some(Set("documents", "embeddings")))
    val written = Option(new File(out).listFiles()).getOrElse(Array.empty)
      .map(_.getName).toSet
    assert(written === Set("documents.parquet", "embeddings.parquet"))
    val docs = spark.read.parquet(s"$out/documents.parquet")
    assert(docs.columns.toSet ===
      Set("doc_id", "text", "lang", "source", "n_chars"))
    assert(docs.count() === 100L) // 5000 * 0.02, deterministic
  }

  test("unfiltered generate is byte-deterministic across runs") {
    def gen(): Array[org.apache.spark.sql.Row] = {
      val out = java.nio.file.Files.createTempDirectory("graft_gen2").toString
      GenScale.generate(spark, out, mult = 0.01,
        tables = Some(Set("documents")))
      spark.read.parquet(s"$out/documents.parquet")
        .orderBy("doc_id").collect()
    }
    assert(gen().sameElements(gen()))
  }
}
