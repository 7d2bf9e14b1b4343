package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query with an optional DuckDB oracle.
  *
  * Convention (see SURVEY.md §4): every query is fully deterministic and
  * cross-engine reproducible — decimal-exact sums, explicit rounding on
  * derived floats, a total ORDER BY, and output aliases that match the
  * oracle column-for-column.
  */
final case class QDef(name: String, sql: Option[String], fn: (SparkSession, String) => DataFrame)

trait QFamily {
  def defs: Seq[QDef]
}
