package graft.dq

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column profiler — the table-level summary a DQ audit config is
  * derived from (per-rule scan thresholds, completeness baselines,
  * key-cardinality sanity; the deequ/ANALYZE-TABLE shape). One
  * aggregate over the table computes, per column: row count, null
  * count, distinct cardinality, typed min/max (numerics and timestamps
  * on a numeric axis, strings lexicographic) — then melts the 1-row
  * result into one row per column.
  *
  * Cardinality has two modes, the q54 contract:
  *  - `exact = false` (the deployment mode): `n_distinct` carries the
  *    HLL estimate (rsd 2%), `sketch_ok` is null, and the whole
  *    profile is ONE Expand-free scan at full width — the form a
  *    1000-executor profile job ships (DqSpec bounds it against the
  *    exact mode).
  *  - `exact = true` (the gate mode): `n_distinct` is the exact
  *    `count(DISTINCT c)` per column, and `sketch_ok` asserts the HLL
  *    estimate lands within 5% of it — so the oracle hash-checks the
  *    exact value AND the sketch's verdict must equal literal TRUE.
  *    Exact multi-distinct is NOT computed in the shared aggregate:
  *    Spark plans that via Expand ×(distincts+1) of the FULL-WIDTH
  *    scan into a sort-based aggregation — measured 40+ min on a
  *    15M-row table at sf10 where the profile's own scan takes
  *    seconds (caught by the round-10 full-registry sf10 gate).
  *    Instead each column pays one PRUNED single-column scan through
  *    an ordinary two-phase hash aggregate (columnar parquet makes N
  *    single-column scans far cheaper than one ×(N+1)-expanded
  *    full-width sort), and the ≤N-row exact frame broadcast-joins
  *    onto the melted profile. Same results, no Expand, no
  *    SortAggregate, every pass hash-partitioned (DqSpec asserts).
  */
object Profile {

  def profile(df: DataFrame, exact: Boolean = true,
      rsd: Double = 0.02): DataFrame = {
    val fields = df.schema.fields
    require(fields.nonEmpty, "cannot profile a zero-column frame")

    // numeric axis for min/max: numbers cast to double; timestamps as
    // microsecond longs (exact below 2^53, and DuckDB replays them via
    // epoch_us without any timezone/format rendering hazard)
    def numAxis(f: StructField): Option[Column] = f.dataType match {
      case _: NumericType => Some(col(f.name).cast("double"))
      case TimestampType => Some(unix_micros(col(f.name)).cast("double"))
      // NTZ (how Spark reads the driver's TIMESTAMP(MICROS) parquet):
      // under the UTC session the cast is the identity on the stored
      // micros, so it replays as DuckDB's epoch_us exactly
      case TimestampNTZType =>
        Some(unix_micros(col(f.name).cast(TimestampType)).cast("double"))
      case DateType => Some(datediff(col(f.name), lit("1970-01-01"))
        .cast("double"))
      case _ => None
    }
    def isStr(f: StructField): Boolean = f.dataType == StringType

    val aggs: Seq[Column] = count(lit(1)).as("__n") +: fields.flatMap { f =>
      val c = col(f.name)
      val nm = f.name
      Seq(
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"__nn_$nm"),
        approx_count_distinct(c, rsd).as(s"__ad_$nm")) ++
        numAxis(f).map(a => Seq(min(a).as(s"__lo_$nm"),
          max(a).as(s"__hi_$nm"))).getOrElse(Nil) ++
        (if (isStr(f)) Seq(min(c).as(s"__slo_$nm"),
          max(c).as(s"__shi_$nm")) else Nil)
    }
    val one = df.agg(aggs.head, aggs.tail: _*)

    val rows: Seq[Column] = fields.map { f =>
      val nm = f.name
      val (lo, hi) =
        if (numAxis(f).isDefined)
          (col(s"__lo_$nm"), col(s"__hi_$nm"))
        else (lit(null).cast("double"), lit(null).cast("double"))
      val (slo, shi) =
        if (isStr(f)) (col(s"__slo_$nm"), col(s"__shi_$nm"))
        else (lit(null).cast("string"), lit(null).cast("string"))
      struct(lit(nm).as("col_name"), col("__n").as("n_rows"),
        col(s"__nn_$nm").as("n_nulls"), col(s"__ad_$nm").as("__ad"),
        lo.as("min_num"), hi.as("max_num"),
        slo.as("min_str"), shi.as("max_str"))
    }
    val melted = one.select(explode(array(rows: _*)).as("__r"))
      .select(col("__r.*"))

    if (!exact)
      melted.select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("__ad").as("n_distinct"), col("min_num"), col("max_num"),
        col("min_str"), col("max_str"),
        lit(null).cast("boolean").as("sketch_ok"))
    else {
      // one pruned single-column hash-agg pass per column; the exact
      // frame is ≤ N rows and broadcasts back onto the melted profile
      val dist = fields.map { f =>
        df.select(col(f.name)).agg(countDistinct(col(f.name)).as("__nd"))
          .select(lit(f.name).as("col_name"), col("__nd"))
      }.reduce(_ unionByName _)
      melted.join(broadcast(dist), Seq("col_name"))
        .select(col("col_name"), col("n_rows"), col("n_nulls"),
          col("__nd").as("n_distinct"), col("min_num"), col("max_num"),
          col("min_str"), col("max_str"),
          (abs(col("__ad") - col("__nd")) <= col("__nd") * 0.05)
            .as("sketch_ok"))
    }
  }
}
