package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Random-projection embedding compression (Achlioptas 2003 /
  * Johnson–Lindenstrauss): project each `dIn`-dim embedding through a
  * deterministic ±1 sign matrix down to `dOut` dims — the cheap
  * dimensionality reduction in front of ANN indexing and semantic
  * dedup (a 64→16 projection cuts every downstream vector shuffle and
  * distance evaluation 4×, while JL guarantees pairwise distances
  * survive within (1±ε)).
  *
  * Scale shape: a PURE PROJECTION — the sign matrix is dOut×dIn
  * literals inlined at plan time (the PQ-codebook / classifier-weights
  * pattern), each output dim one exact-long `aggregate(zip_with(...))`
  * fold, so compression runs at scan speed with ZERO exchanges
  * (spec-asserted) and composes in front of any vector kernel without
  * adding data movement.
  *
  * Bit-stable by construction: inputs quantize to exact longs
  * (`floor(v·2²⁰)` — floor, not round, so no half-way tie whose
  * rounding direction engines could disagree on), the dot products
  * are LONG arithmetic (associative — any fold order gives the same
  * bits), and the only FP ops are final power-of-two divisions (exact)
  * plus one sqrt/divide/round for the distortion diagnostic. The sign
  * matrix derives from the md5-60 parity of "seed:i:j", which the
  * DuckDB oracle recomputes from scratch — the driver-side table is
  * PROVEN, not copied. */
object Projection {

  /** ±1 sign for output dim `i`, input dim `j` (1-based): parity of
    * the md5-60 of "seed:i:j" — [[graft.scale.Dedup.md5Hash60]]
    * computed driver-side, replayable in DuckDB. */
  def signLong(seed: String, i: Int, j: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$seed:$i:$j".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    if (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2 == 0) 1L
    else -1L
  }

  /** Quantization scale: 2²⁰ — embeddings live in [-1, 1], so
    * quantized components fit ±2²¹ and a 64-term dot product of
    * squares stays far inside a long. */
  val Scale = 1048576L

  /** Project `embCol` (array<float>, length `dIn`) to `dOut` dims.
    * Output: one row per (id, output dim) — (idCol, i, value,
    * dist_ratio), where `value` = Σⱼ sign(i,j)·q(vⱼ) / 2²⁰ / √dOut
    * and `dist_ratio` = ‖proj‖/‖orig‖ (per id, repeated across its
    * rows — the JL distortion diagnostic, ≈1 for random vectors).
    * `dOut` must be a perfect square so the 1/√dOut scaling is a
    * division by an exact integer (16 → 4) rather than an irrational
    * both engines would have to round identically mid-expression. */
  def randomProject(df: DataFrame, idCol: String, embCol: String,
      dIn: Int, dOut: Int, seed: String = "rp"): DataFrame = {
    val sqrtOut = math.sqrt(dOut.toDouble).toLong
    require(sqrtOut * sqrtOut == dOut,
      "dOut must be a perfect square so the 1/sqrt(dOut) scaling is an " +
        "exact power-free integer division both engines compute identically")
    val q = col("__q")
    val projCols = (0 until dOut).map { i =>
      val signs = typedLit((1 to dIn).map(j => signLong(seed, i, j)))
      aggregate(zip_with(q, signs, (a, b) => a * b), lit(0L),
        (acc, x) => acc + x).as(s"__p$i")
    }
    val base = df
      .withColumn("__q", transform(col(embCol),
        v => floor(v.cast("double") * Scale).cast("long")))
      .select(col(idCol) +:
        aggregate(q, lit(0L), (acc, x) => acc + x * x).as("__on") +:
        projCols: _*)
    val pn = (0 until dOut).map(i => col(s"__p$i") * col(s"__p$i"))
      .reduce(_ + _)
    base
      .withColumn("__pn", pn)
      .withColumn("dist_ratio",
        when(col("__on") === 0L, 0.0).otherwise(
          round(sqrt(col("__pn").cast("double") / lit(dOut.toDouble)) /
            sqrt(col("__on").cast("double")), 6)))
      .select(col(idCol), col("dist_ratio"),
        posexplode(array((0 until dOut).map(i => col(s"__p$i")): _*))
          .as(Seq("i", "__pl")))
      .select(col(idCol), col("i"),
        (col("__pl").cast("double") / lit(Scale.toDouble) /
          lit(sqrtOut.toDouble)).as("value"),
        col("dist_ratio"))
  }
}
