package graft.util

/** DuckDB-SQL snippets mirroring the deterministic-emit helpers in [[D]]
  * (see D.emit6/emit0 for why the double-rescale exists). Keeping the two
  * sides in one place makes the Spark/oracle pairing auditable. */
object Sq {
  /** Exact decimal sum emitted as double. NOTE: DuckDB decimal→decimal
    * casts TRUNCATE; Spark's round HALF_UP. All scale reductions here go
    * through ROUND (half away from zero == Java HALF_UP). */
  def dsum(c: String): String =
    s"CAST(ROUND(SUM(CAST($c AS DECIMAL(25,6))), 6) AS DOUBLE)"

  /** Exact decimal sum-of-squares emitted as double (scale-0 rescale). */
  def dsumsq(c: String): String =
    s"CAST(ROUND(SUM(CAST($c AS DECIMAL(25,6)) * CAST($c AS DECIMAL(25,6))), 0) AS DOUBLE)"

  /** Σ price*(1-disc) in exact decimal, emitted as double. */
  def revsum(p: String, d: String): String =
    s"CAST(ROUND(SUM(CAST($p AS DECIMAL(18,6)) * CAST(1 - $d AS DECIMAL(18,6))), 6) AS DOUBLE)"

  /** Per-row decimal product emitted as double. */
  def dmul(a: String, b: String): String =
    s"CAST(ROUND(CAST($a AS DECIMAL(18,6)) * CAST($b AS DECIMAL(18,6)), 6) AS DOUBLE)"

  def mean(c: String): String = s"ROUND(${dsum(c)} / COUNT($c), 6)"

  def varSamp(c: String): String =
    s"((${dsumsq(c)} - ${dsum(c)} * ${dsum(c)} / COUNT($c)) / (COUNT($c) - 1))"
}
