package graft.dq

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Builds the one-row-per-violation fact table from the JSON-envelope
  * result rows (004_fact_dataaudit_completeness_mandatory.py:57-160):
  * `from_json` both envelopes, `explode_outer` the violated-PK sample,
  * resequence ids deterministically.
  *
  * Incremental contract: callers pass only result rows with
  * `dt_checked_at` past the fact table's high-watermark (P5) — the
  * builder itself is a pure transformation.
  */
object FactBuilder {

  private val confSchema =
    "STRUCT<schema_name: STRING, table_name: STRING, pk_columns: STRING, rule: STRING>"
  private val checkedSchema =
    "STRUCT<n_violations: BIGINT, pk_sample: ARRAY<STRING>>"

  /** Explode result envelopes into violation-grain fact rows.
    * `explode_outer` keeps PASS rows (null pk) — the reference's
    * behaviour at 004_fact_...py:116. */
  def violations(results: DataFrame): DataFrame =
    results
      .withColumn("conf", from_json(col("ds_configuration"),
        org.apache.spark.sql.types.DataType.fromDDL(confSchema)))
      .withColumn("chk", from_json(col("ds_checked_value"),
        org.apache.spark.sql.types.DataType.fromDDL(checkedSchema)))
      .select(
        col("cd_dataaudit_result"),
        col("cd_configuration"),
        col("ds_dimension"),
        col("conf.schema_name").as("schema_name"),
        col("conf.table_name").as("table_name"),
        col("conf.rule").as("rule"),
        col("chk.n_violations").as("n_violations"),
        col("nr_status"),
        col("dt_checked_at"),
        explode_outer(col("chk.pk_sample")).as("violated_pk"))
      .withColumn("status_label",
        when(col("nr_status") === AuditStatus.Pass, "PASS")
          .when(col("nr_status") === AuditStatus.Fail, "FAIL")
          .otherwise("ERROR"))
}
