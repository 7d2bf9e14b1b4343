package graft.sim

import graft.functions.FixedDot
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Two-stage ANN retrieval: a cheap int8-quantized inner-product scan
  * picks `coarseC` candidates per query, then only those are re-ranked
  * by the exact fixed-point cosine — the coarse-quantize / re-rank
  * serving pattern every large vector index runs (FAISS-style
  * IndexIVF+refine; here the flat-scan form so the oracle can mirror
  * it exactly). Complements [[Ann.bruteTopK]] (exact everywhere) and
  * [[Ann.ivfTopK]] (partition pruning): at 100 TB the coarse scan
  * reads 4×-smaller codes and does integer MACs, and the exact path
  * touches only Q×coarseC rows.
  *
  * Determinism: codes follow [[Quantize]]'s exact fixed-point rule
  * (signed q_i = sgn(fx_i)·⌊(|fx_i|·254 + amax) / (2·amax)⌋, ONE
  * correctly-rounded double division of identical long operands in
  * both engines), so the coarse candidate ranking is INTEGER
  * (coarse_dot DESC, vec_id ASC) — bit-reproducible — and the refine
  * stage reuses the library-wide exact cosine. The whole two-stage
  * result hash-matches the mirrored oracle.
  *
  * Scale notes: the coarse stage never shuffles the corpus at all —
  * each (query, vector) int8 dot is packed with the vector id into ONE
  * long and reduced map-side by the bounded [[KMinAgg]] top-C sketch
  * (per-task state: Q·coarseC longs), so the only shuffled coarse data
  * is Q partial sketches per task. The exact arrays are then joined
  * back for the Q·coarseC winners only, via a BROADCAST of the tiny
  * candidate table against the corpus scan (again no corpus shuffle).
  * The first sf10 run (200k vectors, Q=5k) proved the predecessor
  * design wrong: ranking through a window carried the 1 KB scaled
  * arrays on every one of the 10^9 scored rows into the rank sort.
  *
  * Packing: key = (2^30 − coarse_dot)·2^32 + vec_id. |coarse_dot| ≤
  * d·127² (≈1.03e6 at d=64) keeps the biased dot in [0, 2^31), and
  * vec_id < 2^32 keeps the fields disjoint, so ascending key order IS
  * lexicographic (coarse_dot DESC, vec_id ASC) — the k smallest keys
  * are exactly the oracle's ROW_NUMBER ≤ C rows. The dot bound holds
  * for any dimension ≤ 66,560 (d·127² < 2^30); ids satisfy the
  * registered tables' contract (BIGINT surrogate < 2^32 per shard).
  */
object Refine {

  private val DotBias = 1L << 30

  /** (query_id, rank, neighbor_id, cosine, coarse_dot) — exact top-k
    * of the int8-coarse candidate set; query set = vec_id % queryMod = 0. */
  def twoStageTopK(vecs: DataFrame, queryMod: Int, coarseC: Int, k: Int): DataFrame = {
    require(k <= coarseC, s"k ($k) must be <= coarseC ($coarseC)")
    val base = vecs.select(col("vec_id"), Ann.scaled(col("embedding")).as("fxe"))
      .withColumn("nsq", FixedDot(col("fxe"), col("fxe")))
      .withColumn("amax", array_max(transform(col("fxe"), x => abs(x))))
      .withColumn("q8",
        when(col("amax") === 0, transform(col("fxe"), _ => lit(0L)))
          .otherwise(transform(col("fxe"), x =>
            when(x < 0, lit(-1L)).otherwise(lit(1L)) *
              floor((abs(x) * lit(254L) + col("amax")).cast(DoubleType) /
                (col("amax") * 2).cast(DoubleType)).cast(LongType))))
      .drop("amax")
    // coarse stage: narrow (query_id, packed-key) rows reduced map-side
    // into a bounded top-C sketch — the corpus is scanned, never shuffled
    val qCodes = base.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("query_id"), col("q8").as("qq8"))
    val packed = (lit(DotBias) - FixedDot(col("qq8"), col("q8"))) * lit(1L << 32) +
      col("vec_id")
    val topC = base.select(col("vec_id"), col("q8"))
      .crossJoin(broadcast(qCodes))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), packed.as("pk"))
      .groupBy("query_id")
      .agg(graft.functions.KMinAgg.kmin(col("pk"), coarseC).as("pks"))
    val cand = topC.select(col("query_id"), explode(col("pks")).as("pk"))
      .select(col("query_id"),
        col("pk").bitwiseAND(lit(0xFFFFFFFFL)).as("neighbor_id"),
        (lit(DotBias) - shiftright(col("pk"), 32)).as("coarse_dot"))
    // exact re-rank: arrays join back for the Q·coarseC winners only;
    // the candidate table broadcasts, so the corpus scan stays local
    val exact = base.select(col("vec_id"), col("fxe"), col("nsq"))
    val queries = exact.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("query_id"), col("fxe").as("qe"), col("nsq").as("qn"))
    val cands = exact.join(broadcast(cand), col("vec_id") === col("neighbor_id"))
      .join(broadcast(queries), "query_id")
      .withColumn("cosine", Ann.cosExpr(FixedDot(col("qe"), col("fxe")), col("qn"), col("nsq")))
    val wr = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id"))
    cands.withColumn("rank", row_number().over(wr).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        graft.util.D.r(col("cosine"), 6).as("cosine"), col("coarse_dot"))
      .orderBy("query_id", "rank")
  }

  /** DuckDB mirror of [[twoStageTopK]]. */
  def twoStageTopKSql(table: String, queryMod: Int, coarseC: Int, k: Int): String = {
    val fxElem = "CAST(ROUND(CAST(x AS DOUBLE) * 100000000) AS BIGINT)"
    s"""WITH ${Ann.normSqSql(table)},
       |fx AS (SELECT vec_id, list_transform(embedding, x -> $fxElem) AS fxe FROM $table),
       |am AS (SELECT vec_id, fxe, list_max(list_transform(fxe, x -> abs(x))) AS amax FROM fx),
       |qq AS (SELECT vec_id, fxe,
       |    CASE WHEN amax = 0 THEN list_transform(fxe, x -> CAST(0 AS BIGINT))
       |         ELSE list_transform(fxe, x -> (CASE WHEN x < 0 THEN -1 ELSE 1 END) *
       |              CAST(FLOOR(CAST(abs(x) * 254 + amax AS DOUBLE) / CAST(2 * amax AS DOUBLE)) AS BIGINT))
       |    END AS q8
       |  FROM am),
       |base AS (SELECT b.vec_id, b.fxe, b.q8, n.nsq FROM qq b JOIN norms n USING (vec_id)),
       |coarse AS (SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
       |    (SELECT CAST(SUM(xa * xb) AS BIGINT)
       |     FROM (SELECT unnest(q.q8) AS xa, unnest(d.q8) AS xb) z) AS coarse_dot,
       |    q.fxe AS qe, q.nsq AS qn, d.fxe AS de, d.nsq AS dn
       |  FROM base q JOIN base d ON q.vec_id % $queryMod = 0 AND d.vec_id <> q.vec_id),
       |cr AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY coarse_dot DESC, neighbor_id) AS crank FROM coarse),
       |ref AS (SELECT query_id, neighbor_id, coarse_dot,
       |    ${Ann.cosSql(
            "(SELECT CAST(SUM(xa * xb) AS BIGINT) FROM (SELECT unnest(qe) AS xa, unnest(de) AS xb) z2)",
            "qn", "dn")} AS cosine
       |  FROM cr WHERE crank <= $coarseC),
       |rr AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY cosine DESC, neighbor_id) AS rank FROM ref)
       |SELECT query_id, rank, neighbor_id, ROUND(cosine, 6) AS cosine, coarse_dot
       |FROM rr WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }
}
