package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks (the Deequ/dbt-test shape): each check
  * reduces a table to one (check, total, violations, pass_rate) row, the
  * report is their union — the validation gate a pipeline runs before
  * promoting a batch, and the relation a data-contract dashboard reads.
  *
  * Scale shape: every check is either one scan with a conditional
  * aggregate (map-side combined to a single row — violations never
  * materialize), one distinct-count (`total − countDistinct` for
  * uniqueness), or one anti-join count (referential integrity; the
  * parent side projects its key only, so AQE broadcasts any
  * dimension-sized parent). Nothing row-level ever reaches the driver or
  * the report.
  */
object Quality {

  sealed trait Check { def name: String }

  /** Rows where `violation` is true fail the check. */
  final case class Predicate(name: String, df: DataFrame, violation: Column)
      extends Check

  /** `cols` must be unique across the table; violations = surplus rows. */
  final case class Unique(name: String, df: DataFrame, cols: Seq[String])
      extends Check

  /** Every `childKey` must exist in `parent.parentKey` (orphans fail). */
  final case class RefIntegrity(name: String, child: DataFrame, childKey: String,
                                parent: DataFrame, parentKey: String)
      extends Check

  def report(checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty)
    // exact longs, one IEEE division → identical bits in both engines
    def finish(name: String, counted: DataFrame): DataFrame =
      counted.select(lit(name).as("check_name"), col("total"), col("violations"),
        ((col("total") - col("violations")).cast("double") / col("total"))
          .as("pass_rate"))
    checks.map {
      case Predicate(name, df, violation) =>
        finish(name, df.agg(count(lit(1)).as("total"),
          sum(when(violation, 1L).otherwise(0L)).as("violations")))
      case Unique(name, df, cols) =>
        finish(name, df.agg(count(lit(1)).as("total"),
          (count(lit(1)) - count_distinct(struct(cols.map(col): _*)))
            .as("violations")))
      case RefIntegrity(name, child, childKey, parent, parentKey) =>
        val total = child.agg(count(lit(1)).as("total"))
        val viol = child.select(col(childKey))
          .join(parent.select(col(parentKey).as(childKey)), Seq(childKey),
            "left_anti")
          .agg(count(lit(1)).as("violations"))
        finish(name, total.crossJoin(viol)) // two 1-row aggregates
    }.reduce(_ unionByName _)
  }
}
