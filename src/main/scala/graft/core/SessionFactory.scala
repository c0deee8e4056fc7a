package graft.core

import graft.functions.RollingHashExpr
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine session entrypoint (SURVEY §7 core/): UTC, AQE (with skew
  * join + partition coalescing), cores-sized shuffle partitions, the
  * reference's corrupt/missing-file tolerance confs
  * (transform_into_delta.py:42-43), and the graft extensions installed.
  */
object SessionFactory {

  def build(master: String = "local[*]",
      shufflePartitions: Option[Int] = None,
      appName: String = "graft"): SparkSession = {
    val b = SparkSession.builder()
      .master(master)
      .appName(appName)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.ignoreCorruptFiles", "true")
      .config("spark.sql.files.ignoreMissingFiles", "true")
      .config("spark.ui.enabled", "false")
    shufflePartitions.foreach(n =>
      b.config("spark.sql.shuffle.partitions", n.toString))
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** SparkSessionExtensions hook — the registration path for the
  * engine's custom Catalyst work (builder-prompt case (c)): today one
  * codegen expression exposed to SQL; optimizer rules / planner
  * strategies plug in at the same point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    val (id, info, builder) = GraftExtensions.rollingHashFn
    e.injectFunction((id, info, builder))
    // custom whole-operator path: AsOfJoin logical node → AsOfJoinExec
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftExtensions {
  private[core] val rollingHashFn = (
    new FunctionIdentifier("rolling_hash"),
    new ExpressionInfo(classOf[RollingHashExpr].getName, "rolling_hash"),
    (args: Seq[Expression]) => RollingHashExpr(args.head))

  /** Same functions on an already-built session (getOrCreate ignores
    * withExtensions when a session exists). */
  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = rollingHashFn
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
