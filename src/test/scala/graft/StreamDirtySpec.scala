package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming._

/** The SIXTH degenerate-corpus pin: the streaming twins. The batch
  * pins (documents/events/embeddings/TPC-H/multimodal) each caught
  * real bugs by removing hash-luck from degenerate input; the stateful
  * folds (Sessionizer/Rolling/Attribution/Enrich/Ewma/Funnel/Merge and
  * the gates) are the same imperative code class, and the GenScale
  * dirty fixture deliberately keeps events.ts/user_id non-null — so
  * until this pin, no fold had ever seen a NaN at a window boundary, a
  * pre-epoch timestamp, an all-NULL window, or a value at the decimal
  * envelope.
  *
  * Contract pinned here, per twin:
  *  - batch-typed-fold == the REGISTERED SQL query on a degenerate
  *    event log where every adversarial class is present at once
  *    (NaN/±Inf/NULL values, same-micros ties, pre-epoch / epoch-0 /
  *    far-future timestamps, horizon-boundary touches, purchase-
  *    before-signup, all-NULL windows);
  *  - stream == batch-typed-fold across micros-boundary batch splits
  *    on that same corpus;
  *  - inputs outside the fold's representable envelope FAIL LOUD with
  *    a named guard (never a bare NPE / ArithmeticException / silent
  *    wrap), mirroring the measured ANSI batch behavior where the
  *    batch also fails, and documenting the divergence where the batch
  *    DECIMAL range is wider than the fold's scale-6 long.
  *
  * This pin's first run caught: Rolling.v6 crashing on NaN with a raw
  * NumberFormatException (batch: NULL term, counted row), the Rolling
  * long-sum silently wrapping where the batch DECIMAL sum widens,
  * Ewma's all-NULL window emitting NaN where the batch emission's
  * when(den>0) guard emits NULL, Ewma treating finite decimal overflow
  * as NULL where the ANSI batch raises, Sessionizer's plain-double
  * total drifting from the batch DECIMAL(25,6) sum, session bounds
  * truncated to milliseconds where the batch MIN/MAX(ts) carry micros,
  * and toTs crashing on pre-epoch positions (negative setNanos). */
class StreamDirtySpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  /** Epoch-micros → Timestamp, micros-exact, sign-safe. */
  private def mkTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }
  private def us(t: java.sql.Timestamp): Long =
    t.getTime * 1000 + (t.getNanos / 1000) % 1000

  private val T = 1709251200000000L // 2024-03-01 00:00:00 UTC, micros
  private val Hour = 3600000000L
  private val Future = 7258118400000000L // 2200-01-01 UTC
  private val nan = Double.NaN
  private val pInf = Double.PositiveInfinity
  private val nInf = Double.NegativeInfinity

  /** The degenerate event log: every adversarial class, deterministic.
    * ts and user_id non-null (the fold-ordering contract — null ts is
    * unit-pinned as fail-loud below); everything else hostile. */
  private lazy val degenDir: String = {
    val rows = Seq[(Long, java.sql.Timestamp, Long, String, java.lang.Double, String)](
      // user 1: same-micros tie of NaN/±Inf touches + a purchase AT the
      // tick (strictly-before: counts nothing) + one 1us later (counts)
      (1L, mkTs(T + 1000000L), 1L, "view", nan, null),
      (2L, mkTs(T + 1000000L), 1L, "click", pInf, null),
      (3L, mkTs(T + 1000000L), 1L, "purchase", nInf, null),
      (4L, mkTs(T + 1000001L), 1L, "purchase", null, null),
      // user 2: all-NaN session (total_value NULL, never 0.0)
      (5L, mkTs(T), 2L, "purchase", nan, null),
      (6L, mkTs(T + 600000000L), 2L, "purchase", nan, null),
      // user 3: pre-epoch signup, epoch-0 purchase (conversion across
      // the epoch), far-future purchase (separate session)
      (7L, mkTs(-5000000L), 3L, "signup", 1.0, null),
      (8L, mkTs(0L), 3L, "purchase", 2.5, null),
      (9L, mkTs(Future), 3L, "purchase", 3.5, null),
      // user 4: purchase BEFORE signup (unmatched as-of), then converts
      (10L, mkTs(T), 4L, "purchase", 5.0, null),
      (11L, mkTs(T + 1000000L), 4L, "signup", 1.0, null),
      (12L, mkTs(T + 2000000L), 4L, "purchase", 7.0, null),
      // user 5: horizon-boundary exactness — a view EXACTLY 1h before
      // the purchase is inside (>= t-1h), one 1us earlier is outside
      (13L, mkTs(T - 1L), 5L, "view", 1.0, null),
      (14L, mkTs(T), 5L, "view", 1.0, null),
      (15L, mkTs(T + Hour), 5L, "purchase", 2.0, null),
      // user 6: values at the EWMA DECIMAL(18,6) envelope edges
      (16L, mkTs(T), 6L, "purchase", 999999.999999, null),
      (17L, mkTs(T + 1000000L), 6L, "purchase", -9.0e11, null),
      // user 7: same-micros purchase RANGE peers
      (18L, mkTs(T), 7L, "purchase", 1.5, null),
      (19L, mkTs(T), 7L, "purchase", 2.5, null),
      // user 8: single NaN purchase — n_1h=1, sum_1h NULL; EWMA NULL
      (20L, mkTs(T), 8L, "purchase", nan, null),
      // user 9: null / empty event_type, zero and negative values
      (21L, mkTs(T), 9L, null, 1.0, null),
      (22L, mkTs(T + 1L), 9L, "", 2.0, null),
      (23L, mkTs(T + 2L), 9L, "purchase", 0.0, null),
      (24L, mkTs(T + 3L), 9L, "purchase", -17.25, null))
    val dir = java.nio.file.Files.createTempDirectory("degen_stream").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** Stream a typed corpus through `mkStream` in event-time-ordered
    * micros-boundary splits and return the collected output table. */
  private def replay[E: org.apache.spark.sql.Encoder](
      name: String, evs: Seq[E], evUs: E => Long,
      mkStream: org.apache.spark.sql.Dataset[E] => org.apache.spark.sql.DataFrame)
      : Array[org.apache.spark.sql.Row] = {
    implicit val sqlCtx = spark.sqlContext
    val sorted = evs.sortBy(evUs)
    val mem = MemoryStream[E]
    val q = mkStream(mem.toDS()).writeStream.format("memory")
      .queryName(name).outputMode("append").start()
    try {
      var cut = sorted.size / 2
      while (cut < sorted.size && evUs(sorted(cut)) == evUs(sorted(cut - 1))) cut += 1
      val (a, b) = sorted.splitAt(cut)
      mem.addData(a); q.processAllAvailable()
      mem.addData(b); q.processAllAvailable()
      spark.table(name).collect()
    } finally q.stop()
  }

  private def optD(r: org.apache.spark.sql.Row, i: Int): Option[Double] =
    if (r.isNullAt(i)) None else Some(r.getDouble(i))
  private def r6(v: Option[Double]): Option[Double] = v.map(x => math.rint(x * 1e6) / 1e6)

  // ---------------------------------------------------------------
  // twin parity on the degenerate corpus: fold == registered query,
  // stream == fold
  // ---------------------------------------------------------------

  test("degenerate corpus: sessionizer fold == q_events_sessionize; stream ⊆ fold") {
    val evs = graft.util.D.normTs(graft.util.D.t(spark, degenDir, "events"))
      .select(col("user_id"), col("ts"), col("value"))
      .as[SessionEvent].collect().toSeq
    def key(u: Long, s: java.sql.Timestamp, e: java.sql.Timestamp, n: Long,
            tv: Option[Double]) = (u, us(s), us(e), n, r6(tv))
    val fold = Sessionizer.sessionizeBatch(spark, spark.createDataset(evs)).collect()
      .map(s => key(s.user_id, s.session_start, s.session_end, s.n_events, s.total_value))
      .toSet
    val sql = SparkEntry.queries("q_events_sessionize")(spark, degenDir).collect()
      .map(r => key(r.getLong(0), r.getTimestamp(3), r.getTimestamp(4),
        r.getLong(2), optD(r, 6))).toSet
    assert(fold === sql, s"fold vs q_events_sessionize: " +
      s"${fold.diff(sql).take(3)} / ${sql.diff(fold).take(3)}")
    // all-NaN session must carry a NULL total, and pre-epoch bounds
    // must round-trip micros-exactly
    assert(fold.exists(k => k._1 == 2L && k._5.isEmpty), "all-NaN session total must be NULL")
    assert(fold.exists(k => k._1 == 3L && k._2 == -5000000L), "pre-epoch session_start lost")
    val streamed = replay[SessionEvent]("sess_degen", evs, e => us(e.ts),
      ds => Sessionizer.sessionizeStream(spark, ds).toDF()).map(r =>
      key(r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3), optD(r, 4))).toSet
    assert(streamed.subsetOf(fold),
      s"streamed sessions not in fold: ${streamed.diff(fold).take(3)}")
    assert(streamed.nonEmpty)
  }

  test("degenerate corpus: rolling fold == q_rolling_time; stream == fold") {
    val evs = graft.util.D.normTs(graft.util.D.t(spark, degenDir, "events"))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[RollingEvent].collect().toSeq
    def key(id: Long, n: Long, s: Option[Double]) = (id, n, r6(s))
    val fold = Rolling.rollingBatch(spark, spark.createDataset(evs)).collect()
      .map(o => key(o.event_id, o.n_1h, o.sum_1h)).toSet
    val sql = SparkEntry.queries("q_rolling_time")(spark, degenDir).collect()
      .map(r => key(r.getLong(0), r.getLong(3), optD(r, 4))).toSet
    assert(fold === sql,
      s"fold vs q_rolling_time: ${fold.diff(sql).take(3)} / ${sql.diff(fold).take(3)}")
    // the NaN row is COUNTED (batch COUNT(*)) with a NULL sum
    assert(fold.contains((20L, 1L, None)), "single-NaN window must be (n=1, sum=NULL)")
    // same-micros purchases are RANGE peers: each counts both
    assert(fold.contains((18L, 2L, Some(4.0))) && fold.contains((19L, 2L, Some(4.0))))
    val streamed = replay[RollingEvent]("roll_degen", evs, e => us(e.ts),
      ds => Rolling.rollingStream(spark, ds).toDF()).map(r =>
      key(r.getLong(0), r.getLong(3), optD(r, 4))).toSet
    assert(streamed === fold,
      s"stream vs fold: ${streamed.diff(fold).take(3)} / ${fold.diff(streamed).take(3)}")
  }

  test("degenerate corpus: ewma fold == q_events_ewma; stream == fold") {
    val evs = graft.util.D.normTs(graft.util.D.t(spark, degenDir, "events"))
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[EwmaEvent].collect().toSeq
    def key(id: Long, v: Option[Double]) = id -> r6(v)
    val fold = Ewma.ewmaBatch(spark, spark.createDataset(evs)).collect()
      .map(o => key(o.event_id, o.ewma)).toMap
    val sql = SparkEntry.queries("q_events_ewma")(spark, degenDir).collect()
      .map(r => key(r.getLong(1), optD(r, 4))).toMap
    assert(fold === sql,
      s"fold vs q_events_ewma: ${fold.toSet.diff(sql.toSet).take(3)} / " +
        s"${sql.toSet.diff(fold.toSet).take(3)}")
    // a first-event NaN window is NULL in both engines, never NaN/0
    assert(fold(20L) === None, "all-NULL ewma window must be NULL")
    val streamed = replay[EwmaEvent]("ewma_degen", evs, e => us(e.ts),
      ds => Ewma.ewmaStream(spark, ds).toDF()).map(r =>
      key(r.getLong(1), optD(r, 3))).toMap
    assert(streamed === fold,
      s"stream vs fold: ${streamed.toSet.diff(fold.toSet).take(3)} / " +
        s"${fold.toSet.diff(streamed.toSet).take(3)}")
  }

  test("degenerate corpus: as-of fold == q_asof_join; stream == fold") {
    val evs = graft.util.D.normTs(graft.util.D.t(spark, degenDir, "events"))
      .select(col("user_id"), col("ts"), col("event_type"), col("event_id"))
      .as[AsOfEvent].collect().toSeq
    def key(id: Long, sig: Option[Long], d: Option[Long]) = (id, sig, d)
    val fold = Enrich.enrichBatch(spark, spark.createDataset(evs)).collect()
      .map(e => key(e.event_id, e.last_signup_ts.map(us), e.us_since_signup)).toSet
    val sql = SparkEntry.queries("q_asof_join")(spark, degenDir).collect()
      .map(r => key(r.getLong(0),
        if (r.isNullAt(3)) None else Some(us(r.getTimestamp(3))),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSet
    assert(fold === sql,
      s"fold vs q_asof_join: ${fold.diff(sql).take(3)} / ${sql.diff(fold).take(3)}")
    // purchase-before-signup is UNMATCHED, never matched to the future
    assert(fold.contains((10L, None, None)), "pre-signup purchase must be unmatched")
    // epoch-0 purchase matches the pre-epoch signup, exact micros delta
    assert(fold.contains((8L, Some(-5000000L), Some(5000000L))))
    val streamed = replay[AsOfEvent]("asof_degen", evs, e => us(e.ts),
      ds => Enrich.enrichStream(spark, ds).toDF()).map(r =>
      key(r.getLong(0),
        if (r.isNullAt(3)) None else Some(us(r.getTimestamp(3))),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSet
    assert(streamed === fold,
      s"stream vs fold: ${streamed.diff(fold).take(3)} / ${fold.diff(streamed).take(3)}")
  }

  test("degenerate corpus: funnel fold == q_events_funnel; stream == fold") {
    val evs = graft.util.D.normTs(graft.util.D.t(spark, degenDir, "events"))
      .select(col("user_id"), col("ts"), col("event_type"))
      .as[FunnelEvent].collect().toSeq
    def key(u: Long, s: java.sql.Timestamp, p: java.sql.Timestamp, d: Long) =
      (u, us(s), us(p), d)
    val fold = Funnel.funnelBatch(spark, spark.createDataset(evs)).collect()
      .map(c => key(c.user_id, c.signup_ts, c.first_purchase_ts, c.us_to_convert)).toSet
    val sql = SparkEntry.queries("q_events_funnel")(spark, degenDir)
      .filter(col("first_purchase_ts").isNotNull).collect()
      .map(r => key(r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    assert(fold === sql,
      s"fold vs q_events_funnel: ${fold.diff(sql).take(3)} / ${sql.diff(fold).take(3)}")
    // the cross-epoch conversion: pre-epoch signup, epoch-0 purchase
    assert(fold.contains((3L, -5000000L, 0L, 5000000L)), "cross-epoch conversion lost")
    val streamed = replay[FunnelEvent]("funnel_degen", evs, e => us(e.ts),
      ds => Funnel.funnelStream(spark, ds).toDF()).map(r =>
      key(r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    assert(streamed === fold,
      s"stream vs fold: ${streamed.diff(fold).take(3)} / ${fold.diff(streamed).take(3)}")
  }

  test("degenerate corpus: attribution fold == the SQL per-purchase join; stream == fold") {
    val evs = graft.util.D.normTs(graft.util.D.t(spark, degenDir, "events"))
      .filter(col("event_type").isin("purchase", "view", "click"))
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"), col("value"))
      .as[AttrEvent].collect().toSeq
    def key(id: Long, nv: Long, nc: Long) = (id, nv, nc)
    val fold = Attribution.attrBatch(spark, spark.createDataset(evs)).collect()
      .map(o => key(o.purchase_id, o.n_view, o.n_click)).toSet
    // the same inline oracle join StreamingSpec's clean-data leg uses
    val e = graft.util.D.normTs(graft.util.D.t(spark, degenDir, "events"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val tch = e.filter(col("event_type").isin("view", "click"))
      .select(col("user_id").as("tu"), col("ts").as("tts"), col("event_type").as("tt"))
    val sql = p.join(tch, col("tu") === col("user_id") &&
        col("tts") >= (col("ts") - expr("INTERVAL 1 HOUR")) && col("tts") < col("ts"), "left")
      .groupBy("event_id")
      .agg(sum(when(col("tt") === "view", 1L).otherwise(0L)).as("nv"),
        sum(when(col("tt") === "click", 1L).otherwise(0L)).as("nc"))
      .collect().map(r => key(r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fold === sql,
      s"fold vs SQL join: ${fold.diff(sql).take(3)} / ${sql.diff(fold).take(3)}")
    // strictly-before: the purchase AT the touch tick counts nothing;
    // 1us later counts both NaN/Inf-valued touches
    assert(fold.contains((3L, 0L, 0L)) && fold.contains((4L, 1L, 1L)))
    // horizon boundary: the view exactly 1h before counts, 1us earlier not
    assert(fold.contains((15L, 1L, 0L)), "1-hour-boundary touch must count exactly once")
    val streamed = replay[AttrEvent]("attr_degen", evs, e2 => us(e2.ts),
      ds => Attribution.attrStream(spark, ds).toDF()).map(r =>
      key(r.getLong(0), r.getLong(4), r.getLong(5))).toSet
    // attrStream runs under EventTimeTimeout, whose late-row filter is
    // INCLUSIVE (ts <= watermark dropped) against an initial watermark
    // of epoch 0 — so the epoch-0 purchase (id 8) is late BY
    // CONSTRUCTION and is the batch join's to replay (the module's
    // stated contract). Pin that divergence by name; everything else
    // must match exactly.
    assert(fold.diff(streamed) === Set((8L, 0L, 0L)),
      s"stream vs fold beyond the pinned epoch-0 late row: ${fold.diff(streamed).take(4)}")
    assert(streamed.subsetOf(fold),
      s"streamed rows not in fold: ${streamed.diff(fold).take(3)}")
  }

  // ---------------------------------------------------------------
  // fail-loud envelope + null-ts guards (unit level, every fold)
  // ---------------------------------------------------------------

  test("every event-time fold fails loud on a null timestamp, never a bare NPE") {
    val t = mkTs(T)
    def msg(f: => Any): String =
      intercept[IllegalArgumentException](f).getMessage
    assert(msg(Sessionizer.foldEvents(
      Seq(SessionEvent(1L, null, Some(1.0))), None)).contains("must be non-null"))
    assert(msg(Rolling.foldRolling(
      Seq(RollingEvent(1L, null, 1L, Some(1.0))), None)).contains("must be non-null"))
    assert(msg(Attribution.foldAttr(
      Seq(AttrEvent(1L, null, 1L, "view", Some(1.0))), None)).contains("must be non-null"))
    assert(msg(Enrich.foldAsOf(
      Seq(AsOfEvent(1L, null, "signup", 1L)), None)).contains("must be non-null"))
    assert(msg(Ewma.foldEwma(
      Seq(EwmaEvent(1L, null, 1L, Some(1.0))), None)).contains("must be non-null"))
    assert(msg(Funnel.foldFunnel(
      Seq(FunnelEvent(1L, null, "signup")), None)).contains("must be non-null"))
    // the guard holds inside a live stream too: the query dies with the
    // named message, not silently-wrong output
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val q = Sessionizer.sessionizeStream(spark, mem.toDS()).writeStream
      .format("memory").queryName("nullts_degen").outputMode("append").start()
    try {
      mem.addData(Seq(SessionEvent(1L, t, Some(1.0)), SessionEvent(1L, null, Some(2.0))))
      val ex = intercept[Exception](q.processAllAvailable())
      var c: Throwable = ex
      var found = Option(c.getMessage).exists(_.contains("must be non-null"))
      while (!found && c.getCause != null && c.getCause != c) {
        c = c.getCause
        found = Option(c.getMessage).exists(_.contains("must be non-null"))
      }
      assert(found, s"stream died without the named guard: ${ex.getMessage.take(200)}")
    } finally q.stop()
  }

  test("rolling/sessionizer fail loud past the scale-6 long envelope where the " +
    "wider batch DECIMAL(25,6) still computes — a loud divergence, never a wrap") {
    // the folds refuse
    val m1 = intercept[IllegalArgumentException](Rolling.foldRolling(
      Seq(RollingEvent(1L, mkTs(T), 1L, Some(1.0e13))), None)).getMessage
    assert(m1.contains("scale-6 long envelope"))
    val m2 = intercept[IllegalArgumentException](Sessionizer.foldEvents(
      Seq(SessionEvent(1L, mkTs(T), Some(1.0e13))), None)).getMessage
    assert(m2.contains("scale-6 long envelope"))
    // the batch window (the documented source of truth) computes it fine
    val dir = java.nio.file.Files.createTempDirectory("degen_wide").toString
    Seq((1L, mkTs(T), 1L, "purchase", 1.0e13, null.asInstanceOf[String]))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val row = SparkEntry.queries("q_rolling_time")(spark, dir).collect()(0)
    assert(row.getDouble(4) === 1.0e13)
  }

  test("rolling trailing-window sum overflow fails loud, never wraps") {
    val evs = (1 to 3).map(i =>
      RollingEvent(1L, mkTs(T + i.toLong), i.toLong, Some(4.0e12)))
    val m = intercept[ArithmeticException](
      Rolling.foldRolling(evs, None)).getMessage
    assert(m.contains("overflows the scale-6 long accumulator"))
    val m2 = intercept[ArithmeticException](Sessionizer.foldEvents(
      (1 to 3).map(i => SessionEvent(1L, mkTs(T + i.toLong), Some(4.0e12))), None)).getMessage
    assert(m2.contains("overflows the scale-6 long accumulator"))
  }

  test("ewma fails loud on finite decimal overflow exactly where the ANSI batch raises") {
    val m = intercept[IllegalArgumentException](Ewma.foldEwma(
      Seq(EwmaEvent(1L, mkTs(T), 1L, Some(4.0e12))), None)).getMessage
    assert(m.contains("DECIMAL(18,6)"))
    // the registered batch query raises on the same corpus (the
    // measured NUMERIC_VALUE_OUT_OF_RANGE contract both engines share)
    val dir = java.nio.file.Files.createTempDirectory("degen_ewma").toString
    Seq((1L, mkTs(T), 1L, "purchase", 4.0e12, null.asInstanceOf[String]))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ex = intercept[Exception](
      SparkEntry.queries("q_events_ewma")(spark, dir).collect())
    var c: Throwable = ex
    while (c.getCause != null && c.getCause != c &&
      !Option(c.getMessage).exists(_.contains("NUMERIC_VALUE_OUT_OF_RANGE"))) c = c.getCause
    assert(Option(c.getMessage).exists(_.contains("NUMERIC_VALUE_OUT_OF_RANGE")),
      s"batch should raise NUMERIC_VALUE_OUT_OF_RANGE, got: ${ex.getMessage.take(160)}")
  }

  // ---------------------------------------------------------------
  // the non-fold twins on degenerate input
  // ---------------------------------------------------------------

  test("merge twin: tombstone-first, stale-after-delete, and null strings across " +
    "adversarial batch splits") {
    implicit val sqlCtx = spark.sqlContext
    val evs = Seq(
      MergeEvent(1L, 5, "D", None, null),            // tombstone for a never-seen key
      MergeEvent(1L, 3, "U", Some(9.99), "LOW"),     // stale AFTER the delete (lower seq)
      MergeEvent(2L, 1, "I", Some(1.0), ""),         // empty-string prio
      MergeEvent(2L, 2, "U", None, null),            // null price + prio
      MergeEvent(3L, Int.MinValue, "I", Some(0.0), "X")) // minimal seq vs initial state
    def cur(rows: Seq[MergeOut]): Map[Long, (Int, String, Option[Double], String)] =
      rows.groupBy(_.ok).map { case (k, rs) =>
        val last = rs.maxBy(_.seq); k -> ((last.seq, last.op, last.price, last.prio))
      }
    val batch = cur(Merge.mergeBatch(spark, spark.createDataset(evs)).collect().toSeq)
    // worst split: the stale update arrives a batch AFTER the delete
    val mem = MemoryStream[MergeEvent]
    val q = Merge.mergeStream(spark, mem.toDS()).writeStream.format("memory")
      .queryName("merge_degen").outputMode("append").start()
    try {
      mem.addData(Seq(evs(0), evs(2), evs(4))); q.processAllAvailable()
      mem.addData(Seq(evs(1), evs(3))); q.processAllAvailable()
      val streamed = cur(spark.table("merge_degen").as[MergeOut].collect().toSeq)
      assert(streamed === batch,
        s"merge stream vs batch: $streamed vs $batch")
      assert(batch(1L) === ((5, "D", None, null)),
        "a stale update must never resurrect a tombstoned key")
      assert(batch(3L)._1 === Int.MinValue)
    } finally q.stop()
  }

  test("stream dedup: null text and empty text are distinct fingerprint classes; " +
    "null-text duplicates collapse like the batch group") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val docs = mem.toDS().toDF("ts", "doc_id", "text")
    val q = StreamDedup.dedupStream(docs).writeStream.format("memory")
      .queryName("dedup_degen").outputMode("append").start()
    try {
      mem.addData(Seq(
        (mkTs(T), 1L, null.asInstanceOf[String]),
        (mkTs(T + 1000000L), 2L, null.asInstanceOf[String]), // null dup
        (mkTs(T + 2000000L), 3L, ""),
        (mkTs(T + 3000000L), 4L, ""),                        // empty dup
        (mkTs(T + 4000000L), 5L, "real text")))
      q.processAllAvailable()
      val out = spark.table("dedup_degen").collect()
        .map(r => r.getLong(1)).toSet
      // exactly one survivor per class — nulls collapse together (the
      // batch GROUP BY treats null text as one group), empties together
      assert(out === Set(1L, 3L, 5L), s"got $out")
    } finally q.stop()
  }

  test("heavy-hitters gate: empty and all-null-text batches are no-ops; exotic " +
    "tokens survive a save/load round-trip") {
    val gate = new HeavyHitters.Gate(8)
    gate.processBatch(Seq.empty[(Long, String)].toDF("doc_id", "text"), 0L)
    gate.processBatch(Seq((1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text"), 1L)
    assert(gate.total === 0L && gate.candidates.isEmpty)
    // tokens containing the escape metacharacters themselves
    gate.processBatch(Seq((3L, "%09 %09 %0a ünïcode ünïcode %25"))
      .toDF("doc_id", "text"), 2L)
    val path = java.nio.file.Files.createTempDirectory("hh_degen").toString + "/gate.tsv"
    gate.save(path)
    val back = HeavyHitters.load(path)
    assert(back.candidates === gate.candidates && back.total === gate.total)
  }

  test("anomaly twin: NULL/zero sd stats flow through as NULL spikes, no crash") {
    val events = Seq((mkTs(T), "a"), (mkTs(T + 1000L), "a"), (mkTs(T), "b"), (mkTs(T), "c"))
      .toDF("ts", "event_type")
    val stats = Seq[(String, java.lang.Double, java.lang.Double)](
      ("a", 1.0, 0.0), ("b", null, 1.0), ("c", 2.0, null))
      .toDF("event_type", "mu", "sd")
    val out = Anomaly.flagStream(events, stats).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(5)) None else Some(r.getInt(5)))).toMap
    assert(out("a") === Some(1)) // n=2 > 1.0 + 3·0 → spike
    assert(out("b") === None && out("c") === None) // null stats → NULL flag
  }

  test("banded interval join drops null event times exactly like the brute-force " +
    "predicate (the null-keys-never-join convention)") {
    val points = Seq((1L, mkTs(T)), (2L, null.asInstanceOf[java.sql.Timestamp]))
      .toDF("pid", "ts")
    val windows = Seq((10L, mkTs(T + 1000000L)), (11L, null.asInstanceOf[java.sql.Timestamp]))
      .toDF("wid", "wts")
    val banded = RangeEnrich.matches(points, windows, toleranceSec = 300L)
      .select("pid", "wid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = points.join(windows,
        col("ts") >= col("wts") - expr("INTERVAL 300 seconds") &&
        col("ts") <= col("wts") + expr("INTERVAL 300 seconds"))
      .select("pid", "wid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded === brute && banded === Set((1L, 10L)))
  }
}
