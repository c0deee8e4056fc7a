package graft.dq

/** Config model for the data-quality framework.
  *
  * Mirrors the reference's two config tables
  * (dataaudit.mandatory_column_configuration,
  * create_tbl_completeness_mandatory_config.py:10-27, and
  * dataaudit.validity_configuration, validity_config.py:17-33) as typed
  * case classes instead of CSV-encoded string columns.
  */
sealed trait RuleConfig {
  def configId: Long
  def schemaName: String
  def tableName: String
  def pkColumns: Seq[String]
  /** Optional extra WHERE fragment, ANDed in (ds_additional_filter_condition). */
  def additionalFilter: Option[String]
  def active: Boolean
  def dimension: String
}

/** Completeness: each of `mandatoryColumns` must be non-null and
  * non-blank. */
final case class MandatoryColumnConfig(
    configId: Long,
    schemaName: String,
    tableName: String,
    mandatoryColumns: Seq[String],
    pkColumns: Seq[String],
    additionalFilter: Option[String] = None,
    active: Boolean = true) extends RuleConfig {
  def dimension: String = "completeness_mandatory"
}

/** Validity: `validationRule` is a SQL boolean fragment that matches
  * VIOLATIONS (e.g. "high < low" — validity_config.py:119). */
final case class ValidityConfig(
    configId: Long,
    schemaName: String,
    tableName: String,
    validationRule: String,
    pkColumns: Seq[String],
    additionalFilter: Option[String] = None,
    active: Boolean = true) extends RuleConfig {
  def dimension: String = "validity"
}

object AuditStatus {
  val Pass = 1
  val Fail = 0
  val Error = -1
}
