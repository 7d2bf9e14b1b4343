package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-vector int8 (max-abs / symmetric) embedding quantization — the
  * compression step an ANN serving layer runs before indexing 100 TB
  * of vectors (4× smaller than float32, SIMD-friendly dot products).
  * Reference scope: pd_explain carries embeddings as raw float lists;
  * this extends the similarity family with the storage path.
  *
  * Math is exact end-to-end: components are first scaled to longs at
  * 1e8 ([[Ann.scaled]] — the library-wide fixed-point contract), then
  * the int8 code is q_i = round(|fx_i|·127 / amax) computed as
  * floor((|fx_i|·254 + amax) / (2·amax)) with ONE double division
  * whose operands are identical longs in both engines (IEEE-754
  * division is correctly rounded, so the mirrored oracle gets the
  * identical quotient bit-for-bit). Reconstruction error is the exact
  * long |fx_i·127 − q_i·amax| (the true error at scale 1e8·127).
  * Overflow headroom: |fx| ≤ ~1e9 for unit-scale embeddings, so
  * |fx|·254 ≤ 2.6e11 ≪ 2^63.
  *
  * Scale: scan-local per-row array math (codegen'd fixed-point scale +
  * higher-order functions over ≤128-element arrays), one
  * vec_id-ordered projection — zero shuffles, no joins, nothing
  * collected. The HOF lambdas are interpreted but run over the
  * embeddings table (vectors, not documents) whose row width dwarfs
  * the lambda overhead.
  */
object Quantize {

  /** Quantization report: per vector the code statistics and exact
    * reconstruction error (all BIGINT — hash-stable across engines).
    * Columns: vec_id, n_dims, amax_fx (max |component| at scale 1e8 =
    * the dequant scale), sum_q (Σ|q_i|), sum_q_sq (Σq_i² — the
    * quantized squared norm an int8 dot-product index serves from),
    * sum_err_fx / max_err_fx (Σ and max of |fx_i·127 − q_i·amax|). */
  def int8Report(vecs: DataFrame): DataFrame = {
    val a = transform(Ann.scaled(col("embedding")), x => abs(x))
    val base = vecs.select(col("vec_id"), a.as("a"))
      .withColumn("amax", array_max(col("a")))
    // amax = 0 (zero vector) → every code is 0, error 0
    val q = when(col("amax") === 0, transform(col("a"), _ => lit(0L)))
      .otherwise(transform(col("a"), x =>
        floor((x * lit(254L) + col("amax")).cast(DoubleType) /
          (col("amax") * 2).cast(DoubleType)).cast(LongType)))
    val err = zip_with(col("a"), col("q"), (x, qi) =>
      abs(x * lit(127L) - qi * col("amax")))
    base.withColumn("q", q).withColumn("err", err)
      .select(col("vec_id"),
        size(col("a")).cast(LongType).as("n_dims"),
        col("amax").as("amax_fx"),
        aggregate(col("q"), lit(0L), (acc, x) => acc + x).as("sum_q"),
        aggregate(col("q"), lit(0L), (acc, x) => acc + x * x).as("sum_q_sq"),
        aggregate(col("err"), lit(0L), (acc, x) => acc + x).as("sum_err_fx"),
        array_max(col("err")).as("max_err_fx"))
      .orderBy("vec_id")
  }

  /** DuckDB mirror of [[int8Report]] (unnest + regroup — the oracle
    * favors clarity over the scan-local plan). */
  def int8ReportSql(table: String): String =
    s"""WITH fx AS (
       |  SELECT vec_id, ABS(CAST(ROUND(CAST(x AS DOUBLE) * 100000000) AS BIGINT)) AS a
       |  FROM (SELECT vec_id, unnest(embedding) AS x FROM $table)),
       |mx AS (SELECT vec_id, MAX(a) AS amax FROM fx GROUP BY vec_id),
       |qe AS (
       |  SELECT f.vec_id, a, amax,
       |    CASE WHEN amax = 0 THEN 0
       |         ELSE CAST(FLOOR(CAST(a * 254 + amax AS DOUBLE) / CAST(2 * amax AS DOUBLE)) AS BIGINT)
       |    END AS qi
       |  FROM fx f JOIN mx USING (vec_id))
       |SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_dims,
       |  MAX(amax) AS amax_fx,
       |  CAST(SUM(qi) AS BIGINT) AS sum_q,
       |  CAST(SUM(qi * qi) AS BIGINT) AS sum_q_sq,
       |  CAST(SUM(ABS(a * 127 - qi * amax)) AS BIGINT) AS sum_err_fx,
       |  MAX(ABS(a * 127 - qi * amax)) AS max_err_fx
       |FROM qe GROUP BY vec_id ORDER BY vec_id""".stripMargin
}
