package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The cluster-deployment path: `spark.sql.extensions=
  * graft.functions.GraftExtensions` must resolve the whole native SQL
  * surface in a session the library never calls `register` on — and give
  * the same answers as the temp-function path. */
class ExtensionsSpec extends AnyFunSuite {

  test("extensions-configured session resolves the SQL surface without register()") {
    val base = TestSession.spark // materialize the shared SparkContext first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // `spark.sql.extensions` is a SparkContext-level conf: Spark reads
      // it once per context, reflectively instantiates the class, and
      // calls apply. The shared test context is already up, so mirror
      // that loader exactly — Class.forName + no-arg constructor (proving
      // the class IS loadable the way the conf path loads it) — and feed
      // the instance through withExtensions. Reuses base's SparkContext
      // (never stop this session — stopping it would kill the shared
      // context under every other suite).
      val injector = Class.forName("graft.functions.GraftExtensions")
        .getDeclaredConstructor().newInstance()
        .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(injector)
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
      assert(s2 ne base, "expected a fresh session over the shared context")

      val r = s2.sql(
        """SELECT simhash60('the quick brown fox jumps over the lazy dog') AS h,
          |       word_ngrams('a b c d', 2) AS g,
          |       cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
          |                         array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c,
          |       ascii_normalize('  Héllo,   WORLD!  ') AS n""".stripMargin).head()
      assert(!r.isNullAt(0))
      assert(r.getSeq[String](1) == Seq("a b", "b c", "c d"))
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)

      // aggregate builders inject too (they wrap in toAggregateExpression)
      val agg = s2.sql(
        """SELECT argmax_by(id, s) AS am, kmin(id, 2) AS km
          |FROM VALUES (1L, 1.0D), (2L, 5.0D), (3L, 2.0D) AS t(id, s)""".stripMargin).head()
      assert(agg.getLong(0) == 2L)
      assert(agg.getSeq[Long](1) == Seq(1L, 2L))
      // masks {0,1} and {0}: cells (0,0)=2, (0,1)=1, (1,1)=1
      val mpc = s2.sql(
        """SELECT mask_pair_count(m, 2) AS c
          |FROM VALUES (CAST(3 AS BIGINT)), (CAST(1 AS BIGINT)) AS t(m)""".stripMargin)
        .head().getSeq[Long](0)
      assert(mpc == Seq(2L, 1L, 1L))

      // injected functions are registry-level, not session-temp: a child
      // session still resolves them (temp functions would vanish)
      val s3 = s2.newSession()
      assert(s3.sql("SELECT stripped_count('a  b') AS c").head().getInt(0) ==
        s2.sql("SELECT stripped_count('a  b') AS c").head().getInt(0))

      // parity with the temp-function path: same expression tree, so any
      // drift between the two registration routes is a bug by construction
      graft.functions.GraftFunctions.register(base)
      val viaTemp = base.sql("SELECT simhash60('the quick brown fox jumps over the lazy dog') AS h").head().getLong(0)
      assert(r.getLong(0) == viaTemp)

      // bad arity fails at analysis, same as the register() path
      val e = intercept[Exception](s2.sql("SELECT simhash60('a', 'b')").head())
      assert(e.getMessage.contains("argument"))
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}
