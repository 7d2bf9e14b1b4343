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

  /** Product-quantization codes (Jégou et al. 2011 — the FAISS IVF-PQ
    * compression step): split each vector into `m` contiguous
    * subvectors, quantize every subvector to its nearest code in a
    * per-subspace codebook, emit the m-byte code word and the exact
    * squared reconstruction error. A PQ index stores m bytes per
    * vector instead of 4d — the storage step between [[int8Report]]'s
    * scalar quantization and a full ANN index.
    *
    * Codebook: the family's deterministic seeding — vectors with
    * vec_id % centMod = centOff contribute their s-th subvector as
    * subspace s's code (code id = contributor's vec_id); a real
    * deployment trains per-subspace k-means ([[Ann.kmeansFit]] per
    * subspace composes for that), the seeded form keeps the operator
    * oracle-checkable.
    *
    * Determinism: subvectors enter a 1e4 fixed-point domain (NOT the
    * library's 1e8 — squared L2 sums must stay ≤ 2^53 so the argmin
    * score is an EXACT double: |d|² ≤ dsub·(2·1e4)² ≈ 3e9 per
    * subspace), distances are exact longs via ‖x‖² + ‖c‖² − 2x·c on
    * [[graft.functions.FixedDot]], argmin ties break to the smallest
    * code id ([[graft.functions.ArgMaxBy]] = the oracle's ORDER BY
    * dist, cid), and the error emits at the 1e8 (= 1e4²) scale.
    *
    * Scale: the codebook is m×K rows (broadcast at any corpus size);
    * the corpus side is one narrow subvector explode (m rows/vector)
    * joined against it, then two map-side-combined aggregations
    * ((vec, s) argmin → per-vec code word). The bounded
    * collect_list/transform runs on m=8 structs per vector — the
    * family's bounded post-aggregation HOF convention. */
  def pqCodes(vecs: DataFrame, m: Int, centMod: Int, centOff: Int): DataFrame = {
    require(m >= 1, s"m must be >= 1, got $m")
    def fx4(c: Column): Column =
      transform(c, x => round(x.cast(DoubleType) * 1e4, 0).cast(LongType))
    def subs(df: DataFrame, idCol: String) = {
      val dsub = (size(col("_e")) / m).cast(IntegerType)
      df.select(col(idCol), col("embedding").as("_e"),
          explode(sequence(lit(0), lit(m - 1))).as("s"))
        .select(col(idCol), col("s"),
          fx4(slice(col("_e"), col("s") * dsub + 1, dsub)).as("fxs"))
    }
    import graft.functions.FixedDot
    val xs = subs(vecs, "vec_id")
    val cb = subs(vecs.filter(col("vec_id") % centMod === centOff)
        .select(col("vec_id").as("cid"), col("embedding")), "cid")
      .select(col("s"), col("cid"), col("fxs").as("ce"))
      .withColumn("cn", FixedDot(col("ce"), col("ce")))
    val scored = xs.join(broadcast(cb), "s")
      .withColumn("dist",
        FixedDot(col("fxs"), col("fxs")) + col("cn") -
          lit(2L) * FixedDot(col("fxs"), col("ce")))
    val best = scored.groupBy("vec_id", "s")
      .agg(graft.functions.ArgMaxBy.argmax(col("cid"),
          -col("dist").cast(DoubleType)).as("code"),
        min(col("dist")).as("d"))
    best.groupBy("vec_id")
      .agg(concat_ws("-",
          transform(array_sort(collect_list(struct(col("s"), col("code")))),
            t => t.getField("code").cast(StringType))).as("codes"),
        graft.util.D.r(sum(col("d")).cast(DoubleType) / lit(1e8), 6).as("err_sq"))
      .orderBy("vec_id")
  }

  /** DuckDB mirror of [[pqCodes]] (m fixed at 8 — the registered form). */
  def pqCodesSql(table: String, centMod: Int, centOff: Int): String = {
    val f = (c: String) => s"CAST(ROUND(CAST($c AS DOUBLE) * 10000) AS BIGINT)"
    s"""WITH sers AS (SELECT UNNEST([0, 1, 2, 3, 4, 5, 6, 7]) AS s),
       |xs AS (SELECT e.vec_id, t.s, e.embedding, len(e.embedding) // 8 AS dsub
       |  FROM $table e, sers t),
       |cb AS (SELECT vec_id AS cid, embedding AS cemb FROM $table
       |  WHERE vec_id % $centMod = $centOff),
       |scored AS (SELECT x.vec_id, x.s, c.cid,
       |    (SELECT SUM((${f("a")} - ${f("b")}) * (${f("a")} - ${f("b")}))
       |     FROM (SELECT unnest(x.embedding[x.s * x.dsub + 1 : (x.s + 1) * x.dsub]) AS a,
       |                  unnest(c.cemb[x.s * x.dsub + 1 : (x.s + 1) * x.dsub]) AS b)) AS dist
       |  FROM xs x, cb c),
       |best AS (SELECT vec_id, s, cid AS code, dist,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY dist, cid) AS rn
       |  FROM scored)
       |SELECT vec_id, string_agg(CAST(code AS VARCHAR), '-' ORDER BY s) AS codes,
       |  ROUND(CAST(SUM(dist) AS DOUBLE) / 100000000.0, 6) AS err_sq
       |FROM best WHERE rn = 1 GROUP BY vec_id ORDER BY vec_id""".stripMargin
  }
}
