package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle over the
  * same parquet tables. Queries without an oracle get the driver's weaker
  * rows-only check and are instead verified by ScalaTest specs.
  *
  * Determinism contract (so the DuckDB hash-compare is meaningful):
  *  - every result is fully ordered by its key columns, in both engines;
  *  - double outputs are produced by exact DECIMAL(18,2) aggregation (or a
  *    single IEEE division of exact inputs) so both engines emit identical
  *    bit patterns regardless of row/partition order;
  *  - timestamps are truncated to whole seconds (the events table is
  *    nanosecond-precision, which the two engines read differently).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, sql: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(sql))
  def unchecked(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
