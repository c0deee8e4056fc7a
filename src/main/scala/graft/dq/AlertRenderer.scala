package graft.dq

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Renders the latest-run failure summary as HTML
  * (005_send_alert_hourly.py:122-221 / email_html_generator.py) —
  * string templating only; the SMTP transport is a pluggable effect
  * outside the engine (not reproduced, per SURVEY §2.11).
  */
object AlertRenderer {

  /** Per-config preview capped at `previewRows` (W4: partitioned
    * row_number ≤ 5, 005:134-147). Single pass, count computed once —
    * the reference recounts per render (anti-pattern §4.2). */
  def failurePreview(violations: DataFrame, previewRows: Int = 5): DataFrame = {
    val w = Window.partitionBy(col("cd_configuration"))
      .orderBy(col("violated_pk").asc_nulls_last)
    violations
      .filter(col("nr_status") =!= AuditStatus.Pass)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= previewRows)
      .drop("rn")
  }

  /** Entity-escape — rule texts like "high < low" and arbitrary PK
    * values would otherwise inject markup into the alert email. */
  private def esc(s: String): String =
    if (s == null) "—"
    else s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  def renderHtml(preview: DataFrame): String = {
    val rows = preview
      .orderBy(col("ds_dimension"), col("cd_configuration"),
        col("violated_pk").asc_nulls_last)
      .collect()
    val body = rows.map { r: Row =>
      s"<tr><td>${esc(r.getAs[String]("ds_dimension"))}</td>" +
        s"<td>${r.getAs[Long]("cd_configuration")}</td>" +
        s"<td>${esc(r.getAs[String]("table_name"))}</td>" +
        s"<td>${esc(r.getAs[String]("rule"))}</td>" +
        s"<td>${r.getAs[Long]("n_violations")}</td>" +
        s"<td>${esc(r.getAs[String]("violated_pk"))}</td></tr>"
    }.mkString("\n")
    s"""<html><body><h2>Data audit failures</h2>
       |<table border="1">
       |<tr><th>dimension</th><th>config</th><th>table</th><th>rule</th>
       |<th>violations</th><th>sample pk</th></tr>
       |$body
       |</table></body></html>""".stripMargin
  }
}
