package graft.dq

import org.apache.spark.sql.DataFrame

/** Orchestrates a full audit run across tables — the reference's
  * per-config driver loop (002_...py:72-171, one Spark job per rule)
  * becomes: group configs by table, ONE single-scan executor call per
  * table, union the result frames. Rules × tables scans collapse to
  * |tables| scans.
  */
object AuditRunner {

  /** `resolve` maps a config's (schemaName, tableName) to its frame —
    * a catalog lookup in production, a test fixture map here. */
  def runAll(resolve: (String, String) => DataFrame, cfgs: Seq[RuleConfig],
      checkedAt: String,
      sampleCap: Int = AuditExecutor.DefaultSampleCap): DataFrame = {
    val active = cfgs.filter(_.active)
    require(active.nonEmpty, "no active configs")
    active
      .groupBy(c => (c.schemaName, c.tableName)).toSeq
      .sortBy(_._1)
      .map { case ((schema, table), tableCfgs) =>
        AuditExecutor.runRulesSafe(resolve(schema, table), tableCfgs,
          checkedAt, sampleCap)
      }
      .reduce(_.unionByName(_))
  }
}
