package graft

import graft.streaming.{Session, SessionEvent, Sessionizer}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

final case class DocEvent(ts: java.sql.Timestamp, doc_id: Long, text: String)

final case class TypedEvent(ts: java.sql.Timestamp, event_type: String)

/** Streaming sessionization under MemoryStream: the streamed (closed)
  * sessions must be exactly a subset of the batch sessions, and sessions
  * whose gap elapsed before the final watermark must all be emitted. */
class StreamingSpec extends AnyFunSuite {
  import TestSession._

  /** Event-time microseconds — the SAME ordering key the stateful
    * folds use. Feeding tests must sort by this, not Timestamp.getTime
    * (milliseconds): two same-millisecond events with opposite
    * micros/event_id order would otherwise cross a batch split out of
    * fold order. */
  private def us(t: java.sql.Timestamp): Long =
    t.getTime * 1000 + (t.getNanos / 1000) % 1000

  private def sampleEvents: Seq[SessionEvent] = {
    import spark.implicits._
    graft.util.D.normTs(graft.util.D.t(spark, sf, "events"))
      .filter(col("user_id") < 10)
      .select(col("user_id"), col("ts"), col("value"))
      .as[SessionEvent].collect().toSeq
  }

  test("stream sessions match batch sessions") {
    import spark.implicits._
    val events = sampleEvents
    val batch = Sessionizer
      .sessionizeBatch(spark, spark.createDataset(events))
      .collect()
      .map(s => (s.user_id, s.session_start, s.session_end, s.n_events, s.total_value.map(v => math.round(v * 100))))
      .toSet

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val q = Sessionizer.sessionizeStream(spark, mem.toDS())
      .writeStream.format("memory").queryName("sessions_out").outputMode("append").start()
    try {
      // two batches so the watermark advances past early sessions
      val (first, second) = events.sortBy(_.ts.getTime).splitAt(events.size / 2)
      mem.addData(first)
      q.processAllAvailable()
      mem.addData(second)
      q.processAllAvailable()
      val streamed = spark.table("sessions_out").as[Session].collect()
        .map(s => (s.user_id, s.session_start, s.session_end, s.n_events, s.total_value.map(v => math.round(v * 100))))
        .toSet
      assert(streamed.nonEmpty, "no sessions emitted")
      assert(streamed.subsetOf(batch),
        s"streamed sessions not found in batch: ${streamed.diff(batch).take(3)}")
    } finally q.stop()
  }

  test("windowed streaming aggregation with watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val agg = mem.toDS()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("user_id"))
      .agg(org.apache.spark.sql.functions.count("*").as("n"))
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    try {
      val evs = sampleEvents.sortBy(_.ts.getTime)
      val (a, b) = evs.splitAt(evs.size / 2)
      mem.addData(a); q.processAllAvailable()
      mem.addData(b); q.processAllAvailable()
      assert(spark.table("win_out").count() > 0)
    } finally q.stop()
  }

  test("streaming dedup suppresses within-watermark duplicates, state bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(sec: Long) = new java.sql.Timestamp(t0.getTime + sec * 1000)
    // doc ids 1..3 unique texts; 4,5 duplicate doc 1's text within the
    // horizon; 6 duplicates it again in a later batch (still within)
    val batch1 = Seq(
      DocEvent(at(0), 1, "alpha beta"), DocEvent(at(1), 2, "gamma"),
      DocEvent(at(2), 3, "delta"), DocEvent(at(3), 4, "alpha beta"),
      DocEvent(at(4), 5, "alpha beta"))
    val batch2 = Seq(DocEvent(at(30), 6, "alpha beta"), DocEvent(at(31), 7, "epsilon"))
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[DocEvent]
    val q = graft.streaming.StreamDedup.dedupStream(mem.toDF())
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      mem.addData(batch1); q.processAllAvailable()
      mem.addData(batch2); q.processAllAvailable()
      val kept = spark.table("dedup_out").select("doc_id").as[Long].collect().toSet
      // one survivor per distinct text: docs 4,5,6 suppressed
      assert(kept === Set(1L, 2L, 3L, 7L), s"kept=$kept")
      // batch parity: same number of keeps as batch exact dedup
      val batchKeeps = graft.dedup.Dedup.exactGroups(
        (batch1 ++ batch2).toDF("ts", "doc_id", "text"),
        md5(col("text").cast(org.apache.spark.sql.types.BinaryType))).count()
      assert(kept.size.toLong === batchKeeps)
    } finally q.stop()
  }

  test("KMV sketch aggregate runs under streaming and matches batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the sketch's bounded state (k longs) must serialize through the
    // state store and merge incrementally: the estimate after streaming
    // N micro-batches equals the batch estimate over the union
    val docs = graft.util.D.t(spark, sf, "documents")
      .select(col("lang"), xxhash64(col("text")).as("h"))
      .as[(String, Long)].collect().toSeq
    val batchSketch = graft.util.D.t(spark, sf, "documents")
      .select(col("lang"), xxhash64(col("text")).as("h"))
      .groupBy("lang").agg(graft.functions.KMinAgg.kmin(col("h"), 64).as("hs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val mem = MemoryStream[(String, Long)]
    val q = mem.toDS().toDF("lang", "h")
      .groupBy("lang").agg(graft.functions.KMinAgg.kmin(col("h"), 64).as("hs"))
      .writeStream.format("memory").queryName("kmv_out").outputMode("complete").start()
    try {
      val (a, b) = docs.splitAt(docs.size / 2)
      mem.addData(a); q.processAllAvailable()
      mem.addData(b); q.processAllAvailable()
      val streamed = spark.table("kmv_out")
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      assert(streamed.keySet === batchSketch.keySet)
      streamed.foreach { case (k, v) =>
        assert(v === batchSketch(k), s"sketch mismatch for $k") }
    } finally q.stop()
  }

  test("stateless contamination filter matches batch under streaming") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.util.D.t(spark, sf, "documents")
      .filter(col("doc_id") < 200)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    // persisted for the stream's lifetime — the static subplan re-runs
    // every micro-batch (see Corpus.contaminated scaladoc)
    val evalSet = graft.text.Corpus.evalShingleSet(
      graft.util.D.t(spark, sf, "documents").filter(pmod(col("doc_id"), lit(97)) === 0))
      .persist()
    val batchIds = graft.text.Corpus.contaminated(
        spark.createDataset(docs).toDF("doc_id", "text"), evalSet)
      .collect().map(_.getLong(0)).toSet
    assert(batchIds.nonEmpty, "constructed eval slice contaminates nothing")
    val mem = MemoryStream[(Long, String)]
    val q = graft.text.Corpus.contaminated(mem.toDS().toDF("doc_id", "text"), evalSet)
      .writeStream.format("memory").queryName("contam_out").outputMode("append").start()
    try {
      val (a, b) = docs.splitAt(docs.size / 2)
      mem.addData(a); q.processAllAvailable()
      mem.addData(b); q.processAllAvailable()
      val streamed = spark.table("contam_out").collect().map(_.getLong(0)).toSet
      assert(streamed === batchIds,
        s"stream/batch divergence: extra=${streamed.diff(batchIds).take(3)} missing=${batchIds.diff(streamed).take(3)}")
    } finally { q.stop(); evalSet.unpersist() }
  }

  test("minhash/simhash signatures run scan-local on a stream and match batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // both signature families are pure per-row expressions, so the SAME
    // code runs stateless under streaming (append mode, no state store);
    // the streamed signature table must be value-identical to the batch
    // signature tables built by the aggregate/batch forms
    val docs = graft.util.D.t(spark, sf, "documents")
      .filter(col("doc_id") < 300)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val bdf = docs.toDF("doc_id", "text")
    // row form vs aggregate form, batch-vs-batch first: identical values
    // on every doc the aggregate form emits (it drops shingle-less docs)
    val aggSig = graft.dedup.Dedup.minhashSig(bdf)
    val rowSig = graft.dedup.Dedup.minhashSigRow(bdf)
    assert(rowSig.count() === bdf.count())
    assert(aggSig.join(rowSig, "doc_id").count() === aggSig.count())
    assert(rowSig.join(aggSig.select(col("doc_id")), "doc_id")
      .exceptAll(aggSig).count() === 0)
    val batchMin = aggSig.collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val batchSim = graft.dedup.Dedup.simhashDf(bdf).collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap
    val mem = MemoryStream[(Long, String)]
    val streamDf = graft.dedup.Dedup.minhashSigRow(
      mem.toDS().toDF("doc_id", "text")
        .withColumn("simhash", graft.functions.SimHash60(col("text"))))
    val q = streamDf.writeStream.format("memory").queryName("sig_out")
      .outputMode("append").start()
    try {
      val (a, b) = docs.splitAt(docs.size / 2)
      mem.addData(a); q.processAllAvailable()
      mem.addData(b); q.processAllAvailable()
      val rows = spark.table("sig_out").collect()
      assert(rows.length === docs.size)
      rows.foreach { r =>
        val id = r.getLong(r.fieldIndex("doc_id"))
        assert(r.get(r.fieldIndex("simhash")) === batchSim(id), s"simhash diverges for doc $id")
        batchMin.get(id).foreach { want =>
          val got = (0 until 16).map(i => r.get(r.fieldIndex(s"h$i")))
          assert(got === want, s"minhash diverges for doc $id")
        }
      }
    } finally q.stop()
  }

  test("unigram scoring matches batch under streaming via the folded model") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val bdocs = graft.util.D.t(spark, sf, "documents").filter(col("doc_id") < 300)
    // batch-vs-batch first: the folded-model decimal fold must equal the
    // join-form decimal hash-aggregate bit-for-bit on every doc
    val model = graft.text.Lm.unigramModel(bdocs).persist()
    val joinForm = graft.text.Lm.unigramLm(bdocs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val foldForm = graft.text.Lm.scoreUnigram(bdocs, model).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(foldForm === joinForm)
    // the same scoring code on a stream: stateless, model as static side
    val docs = bdocs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val mem = MemoryStream[(Long, String)]
    val q = graft.text.Lm.scoreUnigram(mem.toDF().toDF("doc_id", "text"), model)
      .writeStream.format("memory").queryName("lm_out").outputMode("append").start()
    try {
      val (a, b) = docs.splitAt(docs.size / 2)
      mem.addData(a); q.processAllAvailable()
      mem.addData(b); q.processAllAvailable()
      val streamed = spark.table("lm_out").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(streamed === joinForm)
    } finally { q.stop(); model.unpersist() }
  }

  test("fold semantics: gap splits sessions") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000)
    val evs = Seq(
      SessionEvent(1, at(0), Some(1.0)), SessionEvent(1, at(10), Some(2.0)),
      SessionEvent(1, at(70), Some(3.0))) // 60-min gap → new session
    val (closed, open) = Sessionizer.foldEvents(evs, None)
    assert(closed.length === 1 && closed.head.n_events === 2 &&
      closed.head.total_value === Some(3.0))
    assert(open.get.n === 1 && open.get.totalU === 3000000L && open.get.hasVal)
  }

  test("streaming funnel conversions match the batch funnel and the SQL form") {
    import spark.implicits._
    import graft.streaming.{Conversion, Funnel, FunnelEvent}
    val evs = graft.util.D.normTs(graft.util.D.t(spark, sf, "events"))
      .filter(col("user_id") < 40)
      .select(col("user_id"), col("ts"), col("event_type"))
      .as[FunnelEvent].collect().toSeq.sortBy(_.ts.getTime)
    val batch = Funnel.funnelBatch(spark, spark.createDataset(evs)).collect()
      .map(c => (c.user_id, c.signup_ts, c.first_purchase_ts, c.us_to_convert)).toSet
    // the typed fold agrees with the oracle-shaped SQL query's non-NULL rows
    val sql = graft.SparkEntry.queries("q_events_funnel")(spark, sf)
      .filter(col("user_id") < 40 && col("first_purchase_ts").isNotNull).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    assert(batch === sql)
    assert(batch.nonEmpty)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[FunnelEvent]
    val q = Funnel.funnelStream(spark, mem.toDS()).writeStream.format("memory")
      .queryName("funnel_out").outputMode("append").start()
    try {
      val (a, b) = evs.splitAt(evs.size / 2)
      mem.addData(a); q.processAllAvailable()
      mem.addData(b); q.processAllAvailable()
      val streamed = spark.table("funnel_out").as[Conversion].collect()
        .map(c => (c.user_id, c.signup_ts, c.first_purchase_ts, c.us_to_convert)).toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("bloom flagging is stateless on a stream and matches batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = graft.util.D.t(spark, sf, "documents")
    val isEval = pmod(col("doc_id"), lit(97)) === 0
    // the bitmap row is static; persist for the stream's lifetime (the
    // static subplan re-runs every micro-batch, same as contaminated)
    val bm = graft.text.Bloom.bitmap(all.filter(isEval)).persist()
    val tr = all.filter(!isEval).filter(col("doc_id") < 200)
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect().toSeq
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("h"))
    val batchHits = graft.text.Bloom
      .flaggedShingles(tr.toDF("doc_id", "source", "text"), bm)
      .collect().map(key).toSet
    assert(batchHits.nonEmpty, "constructed eval slice flags nothing")
    val mem = MemoryStream[(Long, String, String)]
    val q = graft.text.Bloom
      .flaggedShingles(mem.toDS().toDF("doc_id", "source", "text"), bm)
      .writeStream.format("memory").queryName("bloom_out")
      .outputMode("append").start()
    try {
      val (a, b) = tr.splitAt(tr.size / 2)
      mem.addData(a); q.processAllAvailable()
      mem.addData(b); q.processAllAvailable()
      val streamed = spark.table("bloom_out").collect().map(key).toSet
      assert(streamed === batchHits,
        s"stream/batch divergence: extra=${streamed.diff(batchHits).take(3)} " +
          s"missing=${batchHits.diff(streamed).take(3)}")
    } finally { q.stop(); bm.unpersist() }
  }

  test("streaming as-of enrichment matches the batch fold and q_asof_join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{AsOfEvent, Enrich}
    val raw = graft.util.D.normTs(graft.util.D.t(spark, sf, "events"))
      .filter(col("user_id") < 10 &&
        col("event_type").isin("signup", "purchase"))
      .select(col("user_id"), col("ts"), col("event_type"), col("event_id"))
      .as[AsOfEvent].collect().toSeq
      .sortBy(e => (us(e.ts), e.event_id)) // event-time-order feeding

    val batch = Enrich.enrichBatch(spark, spark.createDataset(raw)).collect()
      .map(e => e.event_id -> e.us_since_signup).toMap

    // three-way leg 1: the typed fold equals q_asof_join's rows (same
    // user slice)
    val sqlRows = SparkEntry.queries("q_asof_join")(spark, sf)
      .filter(col("user_id") < 10).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    assert(batch === sqlRows, "typed batch fold diverges from q_asof_join")

    // three-way leg 2: the stream equals the batch fold
    val mem = MemoryStream[AsOfEvent]
    val q = Enrich.enrichStream(spark, mem.toDS())
      .writeStream.format("memory").queryName("enrich_out").outputMode("append").start()
    try {
      val (a, b) = raw.splitAt(raw.size / 2)
      mem.addData(a); q.processAllAvailable()
      mem.addData(b); q.processAllAvailable()
      val streamed = spark.table("enrich_out").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
      assert(streamed === batch,
        s"stream/batch divergence on ${streamed.keySet.diff(batch.keySet).take(3)} / value diffs ${
          batch.collect { case (k, v) if streamed.get(k).exists(_ != v) => k }.take(3)}")
    } finally q.stop()
  }

  test("as-of fold degrades a future-signup state to unmatched, never wrong") {
    import graft.streaming.{AsOfEvent, AsOfState, Enrich}
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    // cross-batch out-of-order (outside the contract): state already
    // holds a signup AFTER this purchase — emitting it would label a
    // future signup "last signup at-or-before"; it must come out
    // unmatched instead
    val (out, _) = Enrich.foldAsOf(
      Seq(AsOfEvent(1L, ts(100), "purchase", 7L)),
      Some(AsOfState(200L * 1000000L)))
    assert(out.map(e => (e.event_id, e.last_signup_ts, e.us_since_signup)) ===
      Seq((7L, None, None)))
    // an at-or-before state still matches
    val (ok, _) = Enrich.foldAsOf(
      Seq(AsOfEvent(1L, ts(100), "purchase", 8L)),
      Some(AsOfState(100L * 1000000L)))
    assert(ok.head.us_since_signup === Some(0L))
  }

  test("streaming rolling window matches the batch fold and q_rolling_time") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{Rolling, RollingEvent}
    val raw = graft.util.D.normTs(graft.util.D.t(spark, sf, "events"))
      .filter(col("user_id") < 10 && col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[RollingEvent].collect().toSeq
      .sortBy(e => (us(e.ts), e.event_id)) // event-time-order feeding

    def key(id: Long, n: Long, s: Option[Double]) = (id, n, s.map(x => math.rint(x * 1e6) / 1e6))
    val batch = Rolling.rollingBatch(spark, spark.createDataset(raw)).collect()
      .map(o => key(o.event_id, o.n_1h, o.sum_1h)).toSet

    // three-way leg 1: the typed fold equals q_rolling_time's rows
    val sqlRows = SparkEntry.queries("q_rolling_time")(spark, sf)
      .filter(col("user_id") < 10).collect()
      .map(r => key(r.getLong(0), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSet
    assert(batch === sqlRows, "typed batch fold diverges from q_rolling_time: " +
      s"${batch.diff(sqlRows).take(3)} / ${sqlRows.diff(batch).take(3)}")

    // three-way leg 2: the stream equals the batch fold. Split at a
    // MICROS boundary so same-instant RANGE peers land in one batch
    // (the documented contract)
    val mem = MemoryStream[RollingEvent]
    val q = Rolling.rollingStream(spark, mem.toDS())
      .writeStream.format("memory").queryName("rolling_out").outputMode("append").start()
    try {
      var cut = raw.size / 2
      while (cut < raw.size && raw(cut).ts == raw(cut - 1).ts) cut += 1
      val (a, b) = raw.splitAt(cut)
      mem.addData(a); q.processAllAvailable()
      mem.addData(b); q.processAllAvailable()
      val streamed = spark.table("rolling_out").collect()
        .map(r => key(r.getLong(0), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSet
      assert(streamed === batch, "stream/batch divergence: " +
        s"${streamed.diff(batch).take(3)} / ${batch.diff(streamed).take(3)}")
    } finally q.stop()
  }

  test("streaming interval join matches the banded batch RangeJoin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.RangeEnrich
    val ev = graft.util.D.normTs(graft.util.D.t(spark, sf, "events"))
      .filter(col("user_id") < 20)
    // batch truth: the banded point-in-interval join's matched pairs
    val pts = ev.select(col("event_id"), unix_micros(col("ts")).as("pos_us"))
    val win = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("win_id"),
        (unix_micros(col("ts")) - 300000000L).as("lo_us"),
        (unix_micros(col("ts")) + 300000000L).as("hi_us"))
    val banded = graft.operators.RangeJoin
      .pointInInterval(pts, "pos_us", win, "lo_us", "hi_us", bandWidth = 600000000L)
      .select("event_id", "win_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // streaming: native watermarked stream-stream interval join over the
    // same rows (points and windows derived from one MemoryStream)
    val raw = ev.select(col("event_id"), col("ts"), col("event_type"))
      .as[(Long, java.sql.Timestamp, String)].collect().toSeq
      .sortBy(e => (us(e._2), e._1))
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val sdf = mem.toDS().toDF("event_id", "ts", "event_type")
    val joined = RangeEnrich.matches(
      sdf.select(col("event_id"), col("ts")),
      sdf.filter(col("event_type") === "purchase")
        .select(col("event_id").as("win_id"), col("ts").as("wts")))
    val q = joined.select("event_id", "win_id")
      .writeStream.format("memory").queryName("range_out").outputMode("append").start()
    try {
      val (a, b) = raw.splitAt(raw.size / 2)
      mem.addData(a); q.processAllAvailable()
      mem.addData(b); q.processAllAvailable()
      val streamed = spark.table("range_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed === banded, "stream/banded divergence: " +
        s"extra=${streamed.diff(banded).take(3)} missing=${banded.diff(streamed).take(3)}")
    } finally q.stop()

    // disjoint-name contract is enforced
    val e = intercept[IllegalArgumentException](RangeEnrich.matches(
      ev.select(col("event_id"), col("ts")),
      ev.select(col("event_id"), col("ts").as("wts"))))
    assert(e.getMessage.contains("disjoint"))
  }

  test("quality scoring, PII scrub, and RAG chunking are stateless on a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.util.D.t(spark, sf, "documents")
      .filter(col("doc_id") < 150)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq

    def rowsOf(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.mkString("|")).toSet

    val bdf = spark.createDataset(docs).toDF("doc_id", "text")
    val batchQuality = rowsOf(graft.text.Corpus.gopherQuality(bdf))
    val batchPii = rowsOf(graft.text.Corpus.piiScrub(bdf)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("fp"),
        col("n_emails"), col("n_ips"), col("n_phones")))
    val batchChunks = rowsOf(graft.text.Chunk.ragChunksUnsorted(bdf, 32, 8))
    assert(batchChunks.size > docs.size, "chunking should fan out")

    val mem = MemoryStream[(Long, String)]
    val sdf = mem.toDS().toDF("doc_id", "text")
    val qs = Seq(
      ("stream_quality", graft.text.Corpus.gopherQuality(sdf)),
      ("stream_pii", graft.text.Corpus.piiScrub(sdf)
        .select(col("doc_id"), md5(col("text").cast("binary")).as("fp"),
          col("n_emails"), col("n_ips"), col("n_phones"))),
      ("stream_chunks", graft.text.Chunk.ragChunksUnsorted(sdf, 32, 8))
    ).map { case (name, df) =>
      df.writeStream.format("memory").queryName(name).outputMode("append").start()
    }
    try {
      val (a, b) = docs.splitAt(docs.size / 2)
      mem.addData(a); qs.foreach(_.processAllAvailable())
      mem.addData(b); qs.foreach(_.processAllAvailable())
      assert(rowsOf(spark.table("stream_quality")) === batchQuality, "gopherQuality diverges")
      assert(rowsOf(spark.table("stream_pii")) === batchPii, "piiScrub diverges")
      assert(rowsOf(spark.table("stream_chunks")) === batchChunks, "ragChunks diverges")
    } finally qs.foreach(_.stop())
  }

  test("streaming hourly spike flags match the batch rows on completed windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // batch operator = profile training + flagging in one; the stream
    // flags against the SAME static profile, so every completed-window
    // row it emits must be exactly a batch row
    val batch = SparkEntry.queries("q_events_anomaly")(spark, sf)
    val stats = batch.select("event_type", "mu", "sd").distinct()
    val batchRows = batch.collect().map(_.mkString("|")).toSet

    val events = graft.util.D.normTs(graft.util.D.t(spark, sf, "events"))
      .select(col("ts"), col("event_type")).as[TypedEvent]
      .collect().toSeq.sortBy(_.ts.getTime)
    val mem = MemoryStream[TypedEvent]
    val out = graft.streaming.Anomaly.flagStream(mem.toDS().toDF(), stats)
    val q = out.writeStream.format("memory").queryName("anomaly_out")
      .outputMode("append").start()
    try {
      val (a, b) = events.splitAt(events.size / 2)
      mem.addData(a); q.processAllAvailable()
      mem.addData(b); q.processAllAvailable()
      val streamed = spark.table("anomaly_out").collect().map(_.mkString("|")).toSet
      assert(streamed.nonEmpty, "no completed windows emitted")
      assert(streamed.subsetOf(batchRows),
        s"streamed flags diverge from batch: ${streamed.diff(batchRows).take(3)}")
      // the watermark horizon is the ONLY reason a batch row may be
      // missing: everything older than the final watermark must emit
      assert(streamed.size >= batchRows.size / 2,
        s"too few completed windows: ${streamed.size} of ${batchRows.size}")
    } finally q.stop()
  }
  test("streaming attribution matches the batch fold and the SQL join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{Attribution, AttrEvent}
    val raw = graft.util.D.normTs(graft.util.D.t(spark, sf, "events"))
      .filter(col("user_id") < 25 &&
        col("event_type").isin("purchase", "view", "click"))
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"), col("value"))
      .as[AttrEvent].collect().toSeq
      .sortBy(e => (us(e.ts), e.event_id))

    def key(o: graft.streaming.AttrOut) = (o.purchase_id, o.n_view, o.n_click)
    val batch = Attribution.attrBatch(spark, spark.createDataset(raw))
      .collect().map(key).toSet

    // leg 1: the typed fold equals the SQL per-purchase join that
    // q_events_attribution aggregates from
    val e = graft.util.D.normTs(graft.util.D.t(spark, sf, "events"))
      .filter(col("user_id") < 25)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val tch = e.filter(col("event_type").isin("view", "click"))
      .select(col("user_id").as("tu"), col("ts").as("tts"), col("event_type").as("tt"))
    val sqlRows = p.join(tch, col("tu") === col("user_id") &&
        col("tts") >= (col("ts") - expr("INTERVAL 1 HOUR")) && col("tts") < col("ts"), "left")
      .groupBy("event_id")
      .agg(sum(when(col("tt") === "view", 1L).otherwise(0L)).as("nv"),
        sum(when(col("tt") === "click", 1L).otherwise(0L)).as("nc"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch === sqlRows, "typed fold diverges from the SQL join: " +
      s"${batch.diff(sqlRows).take(3)} / ${sqlRows.diff(batch).take(3)}")

    // leg 2: the stream equals the batch fold
    val mem = MemoryStream[AttrEvent]
    val q = Attribution.attrStream(spark, mem.toDS())
      .writeStream.format("memory").queryName("attr_out").outputMode("append").start()
    try {
      var cut = raw.size / 2
      while (cut < raw.size && raw(cut).ts == raw(cut - 1).ts) cut += 1
      val (a, b) = raw.splitAt(cut)
      mem.addData(a); q.processAllAvailable()
      mem.addData(b); q.processAllAvailable()
      val streamed = spark.table("attr_out").collect()
        .map(r => (r.getLong(0), r.getLong(4), r.getLong(5))).toSet
      assert(streamed === batch, "stream/batch divergence: " +
        s"${streamed.diff(batch).take(3)} / ${batch.diff(streamed).take(3)}")
    } finally q.stop()
  }

  test("streaming EWMA matches the batch fold and q_events_ewma") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{Ewma, EwmaEvent}
    val raw = graft.util.D.normTs(graft.util.D.t(spark, sf, "events"))
      .filter(col("user_id") < 10)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[EwmaEvent].collect().toSeq
      .sortBy(e => (us(e.ts), e.event_id)) // event-time-order feeding

    def key(id: Long, v: Option[Double]) = id -> v.map(x => math.rint(x * 1e6) / 1e6)
    val batch = Ewma.ewmaBatch(spark, spark.createDataset(raw)).collect()
      .map(o => key(o.event_id, o.ewma)).toMap

    // three-way leg 1: the typed fold equals q_events_ewma's rows
    // (exactly — both sides share the decimal contract)
    val sqlRows = SparkEntry.queries("q_events_ewma")(spark, sf)
      .filter(col("user_id") < 10).collect()
      .map(r => key(r.getLong(1),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(batch === sqlRows, "typed batch fold diverges from q_events_ewma: " +
      s"${batch.toSet.diff(sqlRows.toSet).take(3)} / ${sqlRows.toSet.diff(batch.toSet).take(3)}")

    // three-way leg 2: the stream equals the batch fold across a
    // two-batch split (per-user event-time order preserved by the
    // global time sort; split at a micros boundary so same-instant
    // events of one user fold in one batch, the documented contract)
    val mem = MemoryStream[EwmaEvent]
    val q = Ewma.ewmaStream(spark, mem.toDS())
      .writeStream.format("memory").queryName("ewma_out").outputMode("append").start()
    try {
      var cut = raw.size / 2
      while (cut < raw.size && raw(cut).ts == raw(cut - 1).ts) cut += 1
      val (a, b) = raw.splitAt(cut)
      mem.addData(a); q.processAllAvailable()
      mem.addData(b); q.processAllAvailable()
      val streamed = spark.table("ewma_out").collect()
        .map(r => key(r.getLong(1),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
      assert(streamed === batch, "stream/batch divergence: " +
        s"${streamed.toSet.diff(batch.toSet).take(3)} / ${batch.toSet.diff(streamed.toSet).take(3)}")
    } finally q.stop()
  }

  test("streaming CDC merge: latest-per-key with tombstones matches the " +
    "batch view, arrival-order-free") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{Merge, MergeEvent}
    // the q_upsert_merge changelog fixture, typed
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_totalprice", "o_orderpriority").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    val log = o.map { case (k, p, pr) => MergeEvent(k, 0, "I", Some(p), pr) } ++
      o.filter(_._1 % 7 == 0).map { case (k, p, pr) =>
        MergeEvent(k, 1, "U", Some(p + 1000.0), pr) } ++
      o.filter(_._1 % 13 == 0).map { case (k, _, pr) =>
        MergeEvent(k, 2, "D", None, pr) }
    // expected current view: winner by seq per key
    val want = log.groupBy(_.ok).view.mapValues(_.maxBy(_.seq)).toMap

    // stream in REVERSE-sequence order across two batches — sequence
    // numbers, not arrival order, decide the winner (the CDC contract)
    val mem = MemoryStream[MergeEvent]
    val q = Merge.mergeStream(spark, mem.toDS())
      .writeStream.format("memory").queryName("merge_out").outputMode("append").start()
    try {
      mem.addData(log.filter(_.seq == 2).toSeq ++ log.filter(_.seq == 1))
      q.processAllAvailable()
      mem.addData(log.filter(_.seq == 0).toSeq) // stale inserts arrive LAST
      q.processAllAvailable()
      val rows = spark.table("merge_out").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      // the LAST emission per key (max seq among emissions is the final
      // state because re-emissions are monotone in seq) is the winner
      val finalByKey = rows.groupBy(_._1).view.mapValues(_.maxBy(_._2)).toMap
      assert(finalByKey.size === want.size)
      finalByKey.foreach { case (k, (_, seq, op)) =>
        assert(seq === want(k).seq && op === want(k).op, s"key $k")
      }
      // tombstones present for every deleted key; survivors match the
      // batch q_upsert_merge current view
      val deleted = finalByKey.collect { case (k, (_, _, "D")) => k }.toSet
      assert(deleted === o.map(_._1).filter(_ % 13 == 0).toSet)
      val batchFold = Merge.mergeBatch(spark, spark.createDataset(log.toSeq))
        .collect().map(m => m.ok -> (m.seq, m.op)).toMap
      assert(finalByKey.view.mapValues(v => (v._2, v._3)).toMap === batchFold)
    } finally q.stop()
  }

  test("streaming DQ gate totals match the batch q_dq_suite orders rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val customers = spark.read.parquet(s"$sf/customer.parquet")
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
      .as[(Long, Long, Double, String)].collect().toSeq

    val gate = new graft.streaming.Dq.Gate(customers)
    val mem = MemoryStream[(Long, Long, Double, String)]
    val q = gate.start(mem.toDS()
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"))
    try {
      // three uneven batches, deliberately NOT in table order
      val shuffled = orders.sortBy(o => (o._1 * 2654435761L) % 1000003)
      val (a, rest) = shuffled.splitAt(shuffled.size / 3)
      val (b, c) = rest.splitAt(rest.size / 2)
      mem.addData(a); q.processAllAvailable()
      mem.addData(b); q.processAllAvailable()
      mem.addData(c); q.processAllAvailable()
    } finally q.stop()

    val batch = SparkEntry.queries("q_dq_suite")(spark, sf)
      .filter(col("table_name") === "orders")
      .collect().map(_.mkString("|")).toSet
    val streamed = gate.reportDf.collect().map(_.mkString("|")).toSet
    assert(streamed === batch,
      s"gate diverges from batch suite: ${streamed.diff(batch)} vs ${batch.diff(streamed)}")
  }

  test("streaming heavy-hitter gate: superset + error bound; exact finish matches batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cap = 64
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val rows = docs.select("doc_id", "text").as[(Long, String)].collect().toSeq

    val gate = new graft.streaming.HeavyHitters.Gate(cap)
    val mem = MemoryStream[(Long, String)]
    val q = gate.start(mem.toDS().toDF("doc_id", "text"))
    try {
      // three uneven batches, deliberately NOT in table order
      val shuffled = rows.sortBy(r => (r._1 * 2654435761L) % 1000003)
      val (a, rest) = shuffled.splitAt(shuffled.size / 3)
      val (b, c) = rest.splitAt(rest.size / 2)
      mem.addData(a); q.processAllAvailable()
      mem.addData(b); q.processAllAvailable()
      mem.addData(c); q.processAllAvailable()
    } finally q.stop()

    // exact ground truth over the same rows
    val exact = docs
      .select(explode(graft.text.TextOps.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    assert(gate.total === n)

    val cands = gate.candidates.map(c => c._1 -> c._2).toMap
    assert(cands.size <= cap)
    // guarantee 1: every token with true frequency > n/(cap+1) is present
    val guaranteed = exact.filter { case (_, c) => c * (cap + 1) > n }.keySet
    assert(guaranteed.subsetOf(cands.keySet),
      s"missing guaranteed hitters: ${guaranteed.diff(cands.keySet)}")
    // guarantee 2: each counter is a lower bound within n/(cap+1)
    cands.foreach { case (tok, lower) =>
      val truth = exact.getOrElse(tok, 0L)
      assert(lower <= truth, s"$tok counter $lower above truth $truth")
      assert((truth - lower) * (cap + 1) <= n,
        s"$tok error ${truth - lower} beyond n/(cap+1) bound")
    }
    // reconciliation: the stream's candidates recounted exactly over the
    // corpus equal the batch q_heavy_hitters report row-for-row
    val streamedFinish = gate.finishExact(docs).collect().map(_.mkString("|")).toSet
    val batch = graft.text.Heavy.heavyHitters(docs, cap).collect().map(_.mkString("|")).toSet
    assert(streamedFinish === batch,
      s"finishExact diverges: ${streamedFinish.diff(batch)} vs ${batch.diff(streamedFinish)}")
  }

  test("gate save/load resumes the fold exactly (heavy hitters + DQ)") {
    import spark.implicits._
    // heavy hitters: fold a, save, load, fold b == fold a+b straight
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val (da, db) = docs.splitAt(docs.size / 2)
    def toDf(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    val hhDir = java.nio.file.Files.createTempDirectory("hh_gate").toString
    val g1 = new graft.streaming.HeavyHitters.Gate(64)
    g1.processBatch(toDf(da), 0L)
    g1.save(s"$hhDir/state.tsv")
    val g2 = graft.streaming.HeavyHitters.load(s"$hhDir/state.tsv")
    g2.processBatch(toDf(db), 1L)
    val straight = new graft.streaming.HeavyHitters.Gate(64)
    straight.processBatch(toDf(da), 0L)
    straight.processBatch(toDf(db), 1L)
    assert(g2.total === straight.total)
    assert(g2.candidates === straight.candidates)

    // DQ: same contract over the orders constraint counters + key store
    val customers = spark.read.parquet(s"$sf/customer.parquet")
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    val oa = orders.filter(col("o_orderkey") % 2 === 0)
    val ob = orders.filter(col("o_orderkey") % 2 =!= 0)
    val dqDir = java.nio.file.Files.createTempDirectory("dq_gate").toString
    val d1 = new graft.streaming.Dq.Gate(customers)
    d1.processBatch(oa, 0L)
    d1.save(dqDir)
    val d2 = graft.streaming.Dq.load(customers, dqDir)
    d2.processBatch(ob, 1L)
    val dStraight = new graft.streaming.Dq.Gate(customers)
    dStraight.processBatch(oa, 0L)
    dStraight.processBatch(ob, 1L)
    assert(d2.totals === dStraight.totals)
  }

  test("DQ fold counts dirty data exactly: null keys, cross-batch dups, orphans") {
    import spark.implicits._
    import graft.streaming.Dq
    val customers = Seq(1L, 2L).toDF("c_custkey")
    // (o_orderkey, o_custkey, o_totalprice, o_orderpriority)
    val b1 = Seq(
      (Option(10L), Option(1L), 5.0, "1-URGENT"),
      (Option(10L), Option(2L), 5.0, "2-HIGH"),     // in-batch dup key
      (Option.empty[Long], Option(1L), 5.0, "5-LOW"), // null key -> dup_ok (COUNT(*)−COUNT(DISTINCT))
      (Option(11L), Option.empty[Long], 5.0, "5-LOW") // null ck: completeness, NOT an fk orphan
    ).toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    val b2 = Seq(
      (Option(10L), Option(9L), -1.0, "BOGUS"),     // cross-batch dup + orphan + bad price + bad prio
      (Option(12L), Option(2L), 5.0, "3-MEDIUM")
    ).toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")

    val (d1, seen1) = Dq.foldBatch(b1, customers, Dq.emptySeen(spark))
    assert(d1 === Dq.DqCounts(n = 4, nullCk = 1, dupOk = 2, badPrice = 0,
      badPrio = 0, fkOrphans = 0))
    val (d2, seen2) = Dq.foldBatch(b2, customers, seen1)
    assert(d2 === Dq.DqCounts(n = 2, nullCk = 0, dupOk = 1, badPrice = 1,
      badPrio = 1, fkOrphans = 1))
    // totals telescope to the batch-suite semantics on the union:
    // 6 rows, distinct non-null keys {10,11,12} -> dup_ok = 6 − 3
    val tot = d1 + d2
    assert(tot.dupOk === 3L && tot.n === 6L)
    assert(seen2.count() === 3L)
    // an empty micro-batch folds as a zero delta, not a null poison
    val (d3, _) = Dq.foldBatch(b2.limit(0), customers, seen2)
    assert(d3 === Dq.Zero)
  }

  test("streaming near-dedup (stream-static LSH band join) matches batch minhashPairsAgainst") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.dedup.Dedup
    import graft.streaming.StreamNearDedup
    val docs = graft.util.D.t(spark, sf, "documents")
    val arrivingDf = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
    val store = Dedup.minhashSig(docs.filter(pmod(col("doc_id"), lit(3)) =!= 0))
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getAs[Double]("est_jaccard"), r.getAs[Int]("is_dup"))
    // batch truth: the registered q_dedup_incremental operator
    val want = Dedup.minhashPairsAgainst(arrivingDf, store).collect().map(key).toSet
    assert(want.nonEmpty, "fixture must produce cross-store near-dup candidates")
    // batch leg of the streaming operator: same rows (pins the stateless
    // min-matching-band dedup against the batch .distinct())
    val index = StreamNearDedup.indexBands(store).cache()
    try {
      val batchLeg = StreamNearDedup
        .matches(arrivingDf.select(col("doc_id"), col("text")), index)
        .collect().map(key).toSet
      assert(batchLeg === want, "batch-leg divergence: " +
        s"extra=${batchLeg.diff(want).take(3)} missing=${want.diff(batchLeg).take(3)}")
      // streaming leg: two-chunk replay through a MemoryStream, append
      // mode, ZERO state store rows by construction
      val arriving = arrivingDf.select(col("doc_id"), col("text"))
        .as[(Long, String)].collect().toSeq.sortBy(_._1)
      val mem = MemoryStream[(Long, String)]
      val out = StreamNearDedup.matches(mem.toDS().toDF("doc_id", "text"), index)
      val q = out.writeStream.format("memory")
        .queryName("neardup_out").outputMode("append").start()
      try {
        val (a, b) = arriving.splitAt(arriving.size / 2)
        mem.addData(a); q.processAllAvailable()
        mem.addData(b); q.processAllAvailable()
        val got = spark.table("neardup_out").collect().map(key).toSet
        assert(got === want, "stream/batch divergence: " +
          s"extra=${got.diff(want).take(3)} missing=${want.diff(got).take(3)}")
        assert(q.lastProgress.stateOperators.isEmpty ||
          q.lastProgress.stateOperators.forall(_.numRowsTotal == 0),
          "near-dedup must not accumulate state-store rows")
      } finally q.stop()
    } finally index.unpersist()
  }

  test("EWMA fold mirrors the batch NULL-cast semantics for NaN values") {
    // the batch DECIMAL(18,6) cast turns NaN into NULL: the lag slot
    // stays occupied but contributes neither term nor weight
    import graft.streaming.{Ewma, EwmaEvent}
    def ts(i: Int) = new java.sql.Timestamp(1000L * i)
    val (out, _) = Ewma.foldEwma(Seq(
      EwmaEvent(1L, ts(1), 1L, Some(2.0)),
      EwmaEvent(1L, ts(2), 2L, Some(Double.NaN)),
      EwmaEvent(1L, ts(3), 3L, Some(4.0))), None)
    assert(out(0).ewma === Some(2.0))
    assert(out(1).ewma === Some(2.0)) // current NaN -> only the 2.0 lag counts
    assert(out(2).ewma === Some(3.6)) // (4·1 + 2·0.25) / 1.25; NaN slot skipped
    // an all-null window is NULL in both engines (the batch emission's
    // when(den > 0) guard / the DuckDB mirror's x/0), never NaN
    val (o2, _) = Ewma.foldEwma(Seq(EwmaEvent(1L, ts(1), 1L, Some(Double.NaN))), None)
    assert(o2.head.ewma === None)
  }
}
