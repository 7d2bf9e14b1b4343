package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query seconds at
  * SPARK_GRAFT_SF_DIR.
  *
  * Each query runs TWO in-process repetitions (fresh DataFrame build per
  * rep — a reused plan re-executes a stale AQE plan after clearCache and
  * measures the wrong thing). The reported per-query number is the WARM
  * (second) rep: steady-state throughput, reproducible to VM noise. The
  * cold pass (first reps, including residual JIT) is reported alongside
  * as `cold_total` so a fresh rerun can be compared against the right
  * figure — a single-pass artifact cost a round of misdiagnosis when one
  * anomalous cold run doubled every number.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/classloading warmup so the first timed query isn't penalized
    spark.range(1000000L).selectExpr("sum(id)").collect()
    SparkEntry.entry(spark).count()
    // Optional subset: SPARK_GRAFT_QUERIES="q_a,q_b" benches only the
    // named queries — used for targeted scale spot-checks (e.g. the
    // sf10 heavy-query pass) where a full 187-query run would thrash
    // the page cache for hours without adding information.
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    // deterministic order: map iteration order varies across JVMs and
    // would shuffle which queries absorb residual warmup
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t = try {
          // the timed window includes CONSTRUCTION: several operators
          // legitimately collect a bounded stat table while building
          // (qcut boundaries, correlation cells) — timing only count()
          // would let that work escape the measurement
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir) // fresh build per rep
          df.count()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); -1.0
        }
        // cleanup OUTSIDE the timed window: drop library-internal
        // persists, and force a GC — ContextCleaner reclaims broadcast/
        // shuffle state only after a JVM GC, so without one, later
        // queries pay for the accumulated state of every query before
        // them. At sf1 the every-8th-query cadence measurably corrupted
        // neighbors (q_decontaminate benched 10.5 s vs 0.9 s in
        // isolation); a per-query GC costs ~0.1 s outside the timed
        // window and removes the cross-query interference.
        spark.catalog.clearCache()
        System.gc()
        // the GC only ENQUEUES broadcast/shuffle cleanup; the
        // ContextCleaner thread drains it asynchronously, and without a
        // pause that deletion IO lands inside the NEXT query's timed
        // window — a measurable slice of the shared-pass vs isolated-
        // probe gap. 150 ms outside the window lets the queue drain.
        Thread.sleep(150)
        t
      }
      (name, times)
    }
    // Locale.ROOT: the f-interpolator uses the default locale, which
    // emits comma decimal separators (invalid JSON) on e.g. de_DE JVMs
    def j(d: Double): String =
      if (d < 0) "-1" else String.format(java.util.Locale.ROOT, "%.4f", Double.box(d))
    // env-provided paths land in the machine-parsed records — escape them
    def js(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString }
    val ok = results.filter(_._2.forall(_ >= 0))
    val failed = results.filter(_._2.exists(_ < 0)).map("\"" + _._1 + "\"")
      .mkString("[", ",", "]")
    val qs = ok.map { case (k, ts) => "\"" + k + "\":" + j(ts.last) }
      .mkString("{", ",", "}")
    val cold = ok.map(_._2.head).sum
    val warm = ok.map(_._2.last).sum
    val full = s"""{"metric":"total","value":${j(warm)},"unit":"sec","queries":$qs,""" +
      s""""cold_total":${j(cold)},"warm_total":${j(warm)},"reps":$reps,""" +
      s""""failed":$failed,"sf":"${js(sfDir)}"}"""
    println(full)
    // The full record is ~2.5 KB with 82 queries, which outruns a
    // tail-windowed stdout capture (a harness reading only the last N
    // bytes sees a mid-string fragment and parses null). Persist the full
    // record to a file and ALSO print a compact totals-only line LAST, so
    // any tail window ≥ ~200 bytes always contains one complete record.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench_full.json")
    try {
      val p = java.nio.file.Paths.get(outPath)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, full + "\n")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    println(s"""{"metric":"total","value":${j(warm)},"unit":"sec",""" +
      s""""warm_total":${j(warm)},"cold_total":${j(cold)},"reps":$reps,""" +
      s""""n_queries":${ok.size},"failed":$failed,"sf":"${js(sfDir)}","full":"${js(outPath)}"}""")
    spark.stop()
  }
}
