package graft.dq

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compiles a [[RuleConfig]] into a Catalyst `Column` predicate that is
  * TRUE for violating rows.
  *
  * The reference string-interpolates rules into full `spark.sql` texts
  * (002_...validity.py:116-129, P8); compiling to a `Column` on a
  * DataFrame keeps the same dynamic-SQL semantics (Catalyst parses the
  * fragment) while confining the injection surface to the rule
  * expression itself.
  */
object RuleCompiler {

  /** P7: OR-fold of isNull/blank per mandatory column
    * (002_...completeness_mandatory.py:141-144). */
  def mandatoryViolation(cols: Seq[String]): Column =
    cols.map(c => col(c).isNull || trim(col(c).cast("string")) === "")
      .reduce(_ || _)

  /** P8: the validity rule fragment, parsed by Catalyst. */
  def validityViolation(rule: String): Column = expr(rule)

  def violation(cfg: RuleConfig): Column = cfg match {
    case m: MandatoryColumnConfig => mandatoryViolation(m.mandatoryColumns)
    case v: ValidityConfig => validityViolation(v.validationRule)
  }

  /** Violation predicate with the config's additional filter ANDed in
    * (rows outside the filter are not audited). */
  def scopedViolation(cfg: RuleConfig): Column =
    cfg.additionalFilter match {
      case Some(f) => expr(f) && violation(cfg)
      case None => violation(cfg)
    }

  /** Concatenated PK expression used for violation samples. */
  def pkExpr(cfg: RuleConfig): Column =
    if (cfg.pkColumns.size == 1) col(cfg.pkColumns.head).cast("string")
    else concat_ws("|", cfg.pkColumns.map(c => col(c).cast("string")): _*)
}
