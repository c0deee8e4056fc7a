package graft.queries

import graft.QueryDef
import graft.clean.Cleaning
import graft.core.Tables
import graft.ingest.SurrogateId
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function queries (SURVEY §2.5 W1-W4 + analytic extensions). */
object WindowQueries {

  /** W2: latest-wins dedup — newest lineitem per orderkey
    * (total order via shipdate desc, linenumber desc). */
  val qWindowDedup: QueryDef = QueryDef(
    "q18_window_dedup",
    """SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity FROM (
      |  SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity,
      |    row_number() OVER (PARTITION BY l_orderkey
      |                       ORDER BY l_shipdate DESC, l_linenumber DESC,
      |                                l_quantity DESC) AS rn
      |  FROM lineitem) WHERE rn = 1""".stripMargin) { (s, dir) =>
    // synthetic lineitem has duplicate (orderkey, linenumber) pairs, so
    // quantity joins the ordering to keep the pick total
    Cleaning.dedupLatestWins(
      Tables.load(s, dir, "lineitem"),
      Seq("l_orderkey"),
      Seq(col("l_shipdate").desc, col("l_linenumber").desc,
        col("l_quantity").desc))
      .select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")
  }

  /** W1/W3: deterministic surrogate ids — row_number over the natural
    * key, continuing after an existing max (here 1000). */
  val qSurrogateId: QueryDef = QueryDef(
    "q19_surrogate_id",
    """SELECT row_number() OVER (ORDER BY c_custkey) + 1000 AS cd_silver_id,
      |  c_custkey, c_name FROM customer""".stripMargin) { (s, dir) =>
    val c = Tables.load(s, dir, "customer")
    graft.core.Cols.reorderFront(
      SurrogateId.attachOrdered(c, "cd_silver_id", Seq(col("c_custkey")),
        startAfter = 1000L),
      Seq("cd_silver_id"))
      .select("cd_silver_id", "c_custkey", "c_name")
  }

  /** W4 + rank/lag/lead extension: per-supplier preview (top-3 newest
    * shipments) with rank, dense_rank and neighbouring quantities. */
  val qWindowRank: QueryDef = QueryDef(
    "q20_window_rank",
    """SELECT * FROM (
      |  SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
      |    row_number() OVER w AS rn,
      |    rank() OVER w AS rk,
      |    dense_rank() OVER w AS drk,
      |    lag(l_quantity) OVER w AS prev_qty,
      |    lead(l_quantity) OVER w AS next_qty
      |  FROM lineitem
      |  WINDOW w AS (PARTITION BY l_suppkey
      |               ORDER BY l_shipdate DESC, l_orderkey, l_linenumber,
      |                        l_quantity)
      |) WHERE rn <= 3""".stripMargin) { (s, dir) =>
    // l_quantity completes the ordering: duplicate (orderkey, linenumber)
    // pairs exist in the synthetic data, and rn/lag/lead leak the pick
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate").desc, col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"))
    Tables.load(s, dir, "lineitem")
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rk"),
        dense_rank().over(w).as("drk"),
        lag(col("l_quantity"), 1).over(w).as("prev_qty"),
        lead(col("l_quantity"), 1).over(w).as("next_qty"))
      .filter(col("rn") <= 3)
  }

  /** Frame extension: running total + moving average per customer. */
  val qWindowFrame: QueryDef = QueryDef(
    "q21_window_frame",
    """SELECT o_custkey, o_orderkey,
      |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
      |  round(avg(o_totalprice) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS moving_avg
      |FROM orders""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.load(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        round(sum(col("o_totalprice"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
          .as("running_total"),
        // round at 4 — finer than the 0.0025 lattice of 2-decimal money
        // averaged over ≤4 rows, so no engine-dependent .xx5 boundaries
        round(avg(col("o_totalprice")).over(w.rowsBetween(-3, Window.currentRow)), 4)
          .as("moving_avg"))
  }

  /** O1/O2: top-k (TakeOrderedAndProject — no global sort of the full
    * table at scale, each partition keeps k then the driver merges). */
  val qTopK: QueryDef = QueryDef(
    "q22_topk",
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select("o_orderkey", "o_custkey", "o_totalprice")
  }

  /** O4/O5: distinct on a subset of columns. */
  val qDistinct: QueryDef = QueryDef(
    "q23_distinct",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem") { (s, dir) =>
    Tables.load(s, dir, "lineitem")
      .select("l_returnflag", "l_linestatus")
      .dropDuplicates()
  }

  val all: Seq[QueryDef] = Seq(qWindowDedup, qSurrogateId, qWindowRank,
    qWindowFrame, qTopK, qDistinct)
}
