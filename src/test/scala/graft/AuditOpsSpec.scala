package graft

import graft.dedup.Dedup
import graft.sim.Ann
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 audit/diagnostic additions: cross-split leakage, IVF recall,
  * robust MAD anomaly summary, cohort retention. */
class AuditOpsSpec extends AnyFunSuite {
  import TestSession._

  test("crossSplitLeakage = near-dup pairs whose split-coin sides differ") {
    import spark.implicits._
    // exact-duplicate pairs (2k, 2k+1) share text; the md5 split coin
    // scatters ids across train/val/test, so some pairs must straddle
    val docs = (0L until 60L)
      .map(id => (id, s"the quick brown fox jumps over the lazy dog number ${id / 2} end"))
      .toDF("doc_id", "text")
    val got = Dedup.crossSplitLeakage(docs).collect()
    assert(got.nonEmpty, "constructed corpus must leak across splits")
    // expected: re-derive from the pair table + the SAME coin
    val coin = docs.select(col("doc_id"),
      when(graft.text.Corpus.hashFrac(col("doc_id")) < 0.8, "train")
        .when(graft.text.Corpus.hashFrac(col("doc_id")) < 0.9, "val")
        .otherwise("test").as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = Dedup.minhashPairs(docs).collect()
      .filter(_.getAs[Double]("est_jaccard") >= 0.5)
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Double]("est_jaccard")))
      .filter { case (a, b, _) => coin(a) != coin(b) }
      .map { case (a, b, j) => Row(a, b, coin(a), coin(b), j) }
    assert(got.map(r => r.toSeq).toSeq.sorted(RowOrd) ===
      want.map(_.toSeq).toSeq.sorted(RowOrd))
    got.foreach(r => assert(r.getAs[String]("split_a") != r.getAs[String]("split_b")))
  }

  private val RowOrd: Ordering[Seq[Any]] = Ordering.by(s => s.mkString("|"))

  test("ivfRecall is exactly 1.0 when every list is probed; bounded otherwise") {
    val vecs = graft.util.D.t(spark, sf, "embeddings")
    // probing ALL lists makes IVF score the identical candidate set as
    // brute force (same fixed-point cosine, same tie-break) -> recall 1
    val full = Ann.ivfRecall(vecs, 40, 25, 7, nprobe = 1000, 5).collect()
    assert(full.nonEmpty)
    full.foreach { r =>
      assert(r.getAs[Long]("n_exact") === 5L)
      assert(r.getAs[Long]("n_hit") === 5L)
      assert(r.getAs[Double]("recall") === 1.0)
    }
    // the registered nprobe=3 form: recall in [0, 1], hits <= exact
    val part = Ann.ivfRecall(vecs, 40, 25, 7, 3, 5).collect()
    assert(part.map(_.getAs[Long]("query_id")).toSeq ===
      full.map(_.getAs[Long]("query_id")).toSeq)
    part.foreach { r =>
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_exact"))
    }
  }

  test("nprobeCurve: recall and cost monotone in nprobe; full probe endpoint = 1.0; points match ivfRecall") {
    val vecs = graft.util.D.t(spark, sf, "embeddings")
    // 32 probes >= the 20 lists at this SF (500 vectors / centMod 25),
    // so the last point is a FULL probe: candidate set == brute force
    val curve = Ann.nprobeCurve(vecs, 40, 25, 7, Seq(1, 2, 4, 8, 32), 5).collect()
    assert(curve.length === 5)
    val byP = curve.map(r => r.getAs[Long]("nprobe") ->
      (r.getAs[Double]("mean_recall"), r.getAs[Long]("n_candidates"))).toSeq
    assert(byP.map(_._1) === Seq(1L, 2L, 4L, 8L, 32L), "sorted by nprobe")
    // monotone non-decreasing in BOTH axes (deeper probe = superset)
    byP.sliding(2).foreach { case Seq((_, (r1, c1)), (_, (r2, c2))) =>
      assert(r2 >= r1, s"recall must be monotone: $byP")
      assert(c2 >= c1, s"cost must be monotone: $byP")
    }
    assert(byP.last._2._1 === 1.0, "full probe recalls the exact top-k")
    // every query contributes exactly k exact rows (micro == macro)
    curve.foreach(r => assert(r.getAs[Long]("n_queries") > 0))
    // each curve point must equal the single-point ivfRecall diagnostic
    val p4 = Ann.ivfRecall(vecs, 40, 25, 7, 4, 5).collect()
    val micro = p4.map(_.getAs[Long]("n_hit")).sum.toDouble /
      p4.map(_.getAs[Long]("n_exact")).sum
    val curve4 = byP.find(_._1 == 4L).get._2._1
    assert(math.abs(curve4 - math.rint(micro * 1e6) / 1e6) < 1e-9,
      s"curve point nprobe=4 ($curve4) must equal ivfRecall micro-average ($micro)")
  }

  test("nprobeCurve denominator is the exact-row count: full-probe recall = 1.0 even when N−1 < k") {
    import spark.implicits._
    // 4 vectors, k = 10 > N−1 = 3: the recall denominator must be
    // Q·min(k, N−1) = 12 — the exact-row count by bruteTopK
    // construction, which is what the SQL mirror's COUNT(*)-over-exact
    // divides by — NOT k·Q = 40. On a degenerate corpus the two engines
    // previously disagreed silently (Spark capped recall at (N−1)/k).
    val vecs = Seq(
      (0L, Array(1.0f, 0.1f, 0.0f)),
      (1L, Array(0.9f, 0.2f, 0.1f)),
      (2L, Array(0.1f, 1.0f, 0.2f)),
      (3L, Array(0.0f, 0.2f, 1.0f))
    ).toDF("vec_id", "embedding")
    // queryMod=1: all 4 vectors are queries; centMod=2 → 2 IVF lists,
    // so nprobe=2 is a FULL probe (candidates == all non-self vectors)
    val curve = Ann.nprobeCurve(vecs, 1, 2, 0, Seq(1, 2), 10).collect()
    assert(curve.length === 2)
    val full = curve.find(_.getAs[Long]("nprobe") == 2L).get
    assert(full.getAs[Long]("n_queries") === 4L)
    // full probe retrieves every exact row → recall exactly 1.0 under
    // the min(k, N−1) denominator (0.3 under the old k·Q denominator)
    assert(full.getAs[Double]("mean_recall") === 1.0)
    assert(full.getAs[Long]("n_candidates") === 12L) // 4 queries × 3 non-self
    val shallow = curve.find(_.getAs[Long]("nprobe") == 1L).get
    assert(shallow.getAs[Double]("mean_recall") <= 1.0 &&
      shallow.getAs[Double]("mean_recall") >= 0.0)
  }

  test("GenScale: rev composes ON TOP of per-copy perturbation (no cross-copy duplicate text or vectors)") {
    import spark.implicits._
    // multi-copy rev previously collapsed every copy's text to an exact
    // cross-copy duplicate (and every embedding to an exact rotation-less
    // reverse) — the shingle-space degeneration the per-copy perturbation
    // exists to prevent. Pin: copies=2 + rev keeps copies distinct AND
    // copy-0 output stays bit-identical to the single-copy rev fixture.
    val outDir = java.nio.file.Files.createTempDirectory("genscale_rev").toString
    val src = "/root/testdata/sf0.001"
    GenScale.run(spark, src, outDir, 2, "rev")
    val OFF = 10000000L
    val docs = spark.read.parquet(s"$outDir/documents.parquet")
      .select("doc_id", "text")
    val pairs = docs.filter(col("doc_id") < OFF).as("a")
      .join(docs.filter(col("doc_id") >= OFF).as("b"),
        col("a.doc_id") + OFF === col("b.doc_id"))
      .select(col("a.text").as("t0"), col("b.text").as("t1"))
      .collect()
    assert(pairs.nonEmpty)
    val dupFrac = pairs.count(r => r.getString(0) == r.getString(1)).toDouble / pairs.length
    assert(dupFrac < 0.05,
      s"rev+copies must not make copies exact duplicates (dup frac $dupFrac)")
    // copy 0 must still be the plain single-copy rev transform
    val orig = spark.read.parquet(s"$src/documents.parquet")
      .select(col("doc_id"), col("text").as("otext"))
    val c0 = docs.filter(col("doc_id") < OFF).join(orig, "doc_id")
      .select(col("text"),
        array_join(reverse(split(col("otext"), " ")), " ").as("want"))
      .collect()
    assert(c0.nonEmpty)
    c0.foreach(r => assert(r.getString(0) === r.getString(1)))
    // embeddings: copy-1 vectors are rotated THEN reversed — never an
    // exact duplicate of copy-0's reversed vectors
    val embs = spark.read.parquet(s"$outDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val epairs = embs.filter(col("vec_id") < OFF).as("a")
      .join(embs.filter(col("vec_id") >= OFF).as("b"),
        col("a.vec_id") + OFF === col("b.vec_id"))
      .select(col("a.e").as("e0"), col("b.e").as("e1"))
      .collect()
    assert(epairs.nonEmpty)
    epairs.foreach(r =>
      assert(r.getSeq[Double](0) !== r.getSeq[Double](1), "copy-1 vector must differ"))
    // dup+rev is the EXPLICIT constant-vocabulary scale shape (the
    // pre-r10 multi-copy rev behavior, which the vocab-artifact
    // falsification in BASELINE depends on): content bit-identical
    // across copies, keys offset
    val dupDir = java.nio.file.Files.createTempDirectory("genscale_dup").toString
    GenScale.run(spark, src, dupDir, 2, "dup+rev")
    val ddocs = spark.read.parquet(s"$dupDir/documents.parquet")
      .select("doc_id", "text")
    val dpairs = ddocs.filter(col("doc_id") < OFF).as("a")
      .join(ddocs.filter(col("doc_id") >= OFF).as("b"),
        col("a.doc_id") + OFF === col("b.doc_id"))
      .select(col("a.text").as("t0"), col("b.text").as("t1"))
      .collect()
    assert(dpairs.nonEmpty)
    dpairs.foreach(r => assert(r.getString(0) === r.getString(1),
      "dup copies must be content-identical"))
    val dc0 = ddocs.filter(col("doc_id") < OFF).join(orig, "doc_id")
      .select(col("text"),
        array_join(reverse(split(col("otext"), " ")), " ").as("want"))
      .collect()
    dc0.foreach(r => assert(r.getString(0) === r.getString(1),
      "dup+rev copy 0 must be the plain rev transform"))
  }

  test("dup+rev reproduces the pre-r10 rev fixture shape EXACTLY, every table (adjudication provenance pin)") {
    // The vocab-artifact adjudication (pmi/tfidf/dsir sub-linear growth)
    // was measured on bench-sf1-rev / bench-sf10-rev, generated by the
    // PRE-r10 rev mode; r10 changed rev to compose on top of the
    // per-copy perturbation and claims `dup+rev` reproduces the old
    // shape. This pin rebuilds the old shape FROM FIRST PRINCIPLES —
    // keys offset per copy, text token-reversed identically across
    // copies, embeddings dimension-reversed with labels untouched,
    // dimension tables fixed — and asserts table-by-table set equality
    // with a dup+rev regeneration. (evidence/fixture_sf1rev_duprev_
    // identity.json holds the full-sf1 hash identity against the actual
    // on-disk pre-r10 artifact; this spec keeps the claim enforced.)
    import spark.implicits._
    val src = "/root/testdata/sf0.001"
    val OFF = 10000000L
    val copies = 3
    val outDir = java.nio.file.Files.createTempDirectory("genscale_duprev").toString
    GenScale.run(spark, src, outDir, copies, "dup+rev")
    def expect(name: String, keyCols: Seq[String],
               tweak: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = identity) = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      (0 until copies).map { i =>
        tweak(keyCols.foldLeft(base)((d, k) => d.withColumn(k, col(k) + lit(i * OFF))))
      }.reduce(_ unionByName _)
    }
    val cases: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "region" -> spark.read.parquet(s"$src/region.parquet"),
      "nation" -> spark.read.parquet(s"$src/nation.parquet"),
      "customer" -> expect("customer", Seq("c_custkey")),
      "supplier" -> expect("supplier", Seq("s_suppkey")),
      "part" -> expect("part", Seq("p_partkey")),
      "orders" -> expect("orders", Seq("o_orderkey", "o_custkey")),
      "lineitem" -> expect("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey")),
      "events" -> expect("events", Seq("event_id", "user_id")),
      "documents" -> expect("documents", Seq("doc_id"),
        _.withColumn("text", array_join(reverse(split(col("text"), " ")), " "))),
      "embeddings" -> expect("embeddings", Seq("vec_id"),
        _.withColumn("embedding", reverse(col("embedding")))))
    cases.foreach { case (name, want) =>
      val got = spark.read.parquet(s"$outDir/$name.parquet")
      assert(got.count() === want.count(), s"$name: row count")
      assert(got.exceptAll(want).count() === 0L, s"$name: rows not in the expected old-rev shape")
      assert(want.exceptAll(got).count() === 0L, s"$name: expected old-rev rows missing")
    }
  }

  test("q_anomaly_mad counts exactly the rows beyond the reported cutoff") {
    val rows = SparkEntry.queries("q_anomaly_mad")(spark, sf).collect()
    assert(rows.nonEmpty)
    val li = graft.util.D.t(spark, sf, "lineitem")
      .select("l_returnflag", "l_extendedprice").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1))).toMap
    rows.foreach { r =>
      val xs = li(r.getAs[String]("l_returnflag"))
      val med = r.getAs[Double]("med")
      val mad = r.getAs[Double]("mad")
      val cutoff = r.getAs[Double]("cutoff")
      assert(cutoff === BigDecimal(4.4478 * mad)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(r.getAs[Long]("n") === xs.length.toLong)
      assert(r.getAs[Long]("n_out_hi") === xs.count(_ > med + cutoff).toLong)
      assert(r.getAs[Long]("n_out_lo") === xs.count(_ < med - cutoff).toLong)
      val frac = xs.count(x => math.abs(x - med) > cutoff).toDouble / xs.length
      assert(r.getAs[Double]("out_frac") ===
        BigDecimal(frac).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      // med must sit inside the group's range and mad be nonnegative
      assert(med >= xs.min && med <= xs.max && mad >= 0.0)
    }
  }

  test("pagerank: mass conserves modulo evaporation, sinks floor at teleport, fit converges") {
    import spark.implicits._
    // star + chain: 0->1, 2->1, 3->1, 1->4; 4 is a sink, 5 isolated
    val nodes = (0L to 5L).toDF("node_id")
    val edges = Seq((0L, 1L), (2L, 1L), (3L, 1L), (1L, 4L)).toDF("src", "dst")
    val m1 = graft.graph.Rank.pagerankIterations(nodes, edges, 1).collect()
      .map(r => r.getAs[Long]("node_id") -> r).toMap
    // teleport floor: nodes with no in-edges hold exactly 1 - d
    Seq(0L, 2L, 3L, 5L).foreach(id => assert(m1(id).getAs[Double]("mass") === 0.15))
    // hub: 0.15 + 3 * 0.85 (each source has outdeg 1)
    assert(m1(1L).getAs[Double]("mass") === 2.7) // 0.15 + 3 x 0.85, 6dp-rounded
    assert(m1(1L).getAs[Long]("n_in") === 3L)
    assert(m1(4L).getAs[Double]("mass") === 0.15 + 0.85)
    // fit: converges on the DAG (no cycles -> fixpoint within depth+1)
    val fit = graft.graph.Rank.pagerankFit(nodes, edges, maxIter = 10, tol = 1e-9)
    val rows = fit.collect()
    assert(rows.forall(_.getAs[Boolean]("converged")))
    // sink + isolated nodes evaporate mass: total stays <= N
    val total = rows.map(_.getAs[Double]("mass")).sum
    assert(total <= 6.0 + 1e-6)
    // two manual steps == the chained 2-iteration lazy plan
    val two = graft.graph.Rank.pagerankIterations(nodes, edges, 2)
      .collect().map(r => r.getAs[Long]("node_id") -> r.getAs[Double]("mass")).toMap
    val stepped = graft.graph.Rank.pagerankStep(nodes, edges,
        graft.graph.Rank.pagerankStep(nodes, edges, nodes.withColumn("mass", lit(1.0)))
          .select("node_id", "mass"))
      .collect().map(r => r.getAs[Long]("node_id") -> r.getAs[Double]("mass")).toMap
    assert(two === stepped)
  }

  test("q_events_anomaly flags exactly the hours beyond mu + 3 sd") {
    val rows = SparkEntry.queries("q_events_anomaly")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expect = r.getAs[Long]("n") > r.getAs[Double]("mu") + 3 * r.getAs[Double]("sd")
      assert(r.getAs[Int]("is_spike") === (if (expect) 1 else 0))
    }
  }

  test("tokenEntropy: 0 for constant docs, log2(k) for uniform, bounded by log2(distinct)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a a"),              // constant -> 0 bits
      (2L, "a b c d"),              // uniform over 4 -> 2 bits
      (3L, "a a b b c c d d"),      // uniform over 4 -> 2 bits
      (4L, "a a a b")               // skewed -> strictly between 0 and 2
    ).toDF("doc_id", "text")
    val m = graft.text.Profile.tokenEntropy(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(m(1L).getAs[Double]("entropy") === 0.0)
    assert(m(2L).getAs[Double]("entropy") === 2.0)
    assert(m(3L).getAs[Double]("entropy") === 2.0)
    val skew = m(4L).getAs[Double]("entropy")
    assert(skew > 0.0 && skew < 1.0) // H(3/4, 1/4) ~ 0.811
    assert(m(4L).getAs[Long]("n_tokens") === 4L)
    assert(m(4L).getAs[Long]("n_distinct") === 2L)
  }

  test("labelProfile: singleton label is its own centroid; orthogonal pair at cos ~0.707") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), 10),   // singleton label
      (2L, Array(1.0f, 0.0f, 0.0f), 20),   // orthogonal unit pair
      (3L, Array(0.0f, 1.0f, 0.0f), 20)
    ).toDF("vec_id", "embedding", "label")
    val m = Ann.labelProfile(vecs).collect()
      .map(r => r.getAs[Long]("label") -> r).toMap
    // a single member IS its centroid: cohesion exactly 1
    assert(m(10L).getAs[Double]("avg_cos") === 1.0)
    assert(m(10L).getAs[Double]("min_cos") === 1.0)
    assert(m(10L).getAs[Double]("avg_norm") === m(10L).getAs[Double]("centroid_norm"))
    // orthogonal pair: centroid (.5, .5, 0), each member at cos 1/sqrt(2)
    assert(m(20L).getAs[Long]("n_vecs") === 2L)
    assert(math.abs(m(20L).getAs[Double]("avg_cos") - 0.707107) < 1e-6)
    assert(math.abs(m(20L).getAs[Double]("centroid_norm") - 0.707107) < 1e-6)
    assert(m(20L).getAs[Double]("min_cos") <= m(20L).getAs[Double]("avg_cos"))
  }

  test("URL canonicalization strips noise, keeps real params; dedup collapses variants") {
    import spark.implicits._
    val cases = Seq(
      ("https://EX.com/A/?utm_source=x&ref=y#frag", "https://ex.com/a"),
      ("https://ex.com/p?id=3&utm_campaign=z", "https://ex.com/p?id=3"),
      ("https://ex.com/p#only-frag", "https://ex.com/p"),
      ("https://ex.com/clean", "https://ex.com/clean"))
    val got = cases.map(_._1).toDF("url")
      .select(graft.text.Url.canonicalize(col("url")).as("c")).collect().map(_.getString(0))
    assert(got.toSeq === cases.map(_._2))
    // the registered query collapses the three synthesized spellings
    val rows = SparkEntry.queries("q_dedup_url")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_raw_forms") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_docs") >= 1L)
    }
    // complete pages (all three variant doc_ids present) show 3 raw forms
    assert(rows.exists(r => r.getAs[Long]("n_docs") === 3L &&
      r.getAs[Long]("n_raw_forms") === 3L))
  }

  test("truncationLoss prices the cut exactly against brute token counts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a", "one two three four five"),     // 5 tokens, under the cut
      (2L, "a", (1 to 10).mkString(" ")),       // 10 tokens, truncated at 8
      (3L, "b", (1 to 8).mkString(" "))         // exactly at the limit: kept whole
    ).toDF("doc_id", "source", "text")
    val m = graft.text.Profile.truncationLoss(docs, 8).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(m("a").getAs[Long]("n_docs") === 2L)
    assert(m("a").getAs[Long]("n_truncated") === 1L)
    assert(m("a").getAs[Long]("tokens_total") === 15L)
    assert(m("a").getAs[Long]("tokens_kept") === 13L)
    assert(m("a").getAs[Long]("tokens_lost") === 2L)
    assert(m("a").getAs[Double]("loss_frac") === BigDecimal(2.0 / 15)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(m("b").getAs[Long]("n_truncated") === 0L)
    assert(m("b").getAs[Long]("tokens_lost") === 0L)
  }

  test("group_topk takes exactly the k largest per group; curve partitions the pair set") {
    val rows = SparkEntry.queries("q_group_topk")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byGroup = rows.groupBy(_.getAs[String]("o_orderpriority"))
    val orders = graft.util.D.t(spark, sf, "orders")
      .select("o_orderpriority", "o_totalprice").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted.reverse).toMap
    byGroup.foreach { case (g, rs) =>
      assert(rs.length <= 3)
      val got = rs.sortBy(_.getAs[Long]("rk")).map(_.getAs[Double]("o_totalprice"))
      assert(got.toSeq === orders(g).take(rs.length).toSeq)
    }
    // curve: buckets partition the candidate pairs; >= 0.5 buckets are all dup
    val curve = graft.dedup.Dedup.minhashCurve(
      graft.util.D.t(spark, sf, "documents")).collect()
    val pairs = graft.dedup.Dedup.minhashPairs(
      graft.util.D.t(spark, sf, "documents")).count()
    assert(curve.map(_.getAs[Long]("n_pairs")).sum === pairs)
    curve.foreach { r =>
      val (b, n, d) = (r.getAs[Double]("bucket"), r.getAs[Long]("n_pairs"), r.getAs[Long]("n_dup"))
      assert(d <= n)
      if (b >= 0.5) assert(d === n) else assert(d === 0L)
    }
  }

  test("clusterStats: docs = size x clusters per row; removable leaves one survivor") {
    val rows = SparkEntry.queries("q_dup_cluster_stats")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val size = r.getAs[Long]("cluster_size")
      val nc = r.getAs[Long]("n_clusters")
      val nd = r.getAs[Long]("n_docs")
      assert(size >= 2L) // a pair graph has no singleton components
      assert(nd === size * nc)
      assert(r.getAs[Long]("n_removable") === nd - nc)
    }
  }

  test("asof nearest picks the closer side and prefers backward on ties") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (1L, 10L, ts("2026-01-01 10:00:00")),
      (2L, 10L, ts("2026-01-01 12:00:00")),
      (3L, 20L, ts("2026-01-01 09:00:00"))   // no right rows for user 20
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2026-01-01 09:30:00")), // 30 min before e1
      (101L, 10L, ts("2026-01-01 10:20:00")), // 20 min after e1 -> e1's nearest
      (102L, 10L, ts("2026-01-01 13:40:00")), // e2: 100 min after vs 101's 100 min before -> TIE
      (103L, 30L, ts("2026-01-01 09:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val out = graft.operators.AsOf
      .join(left, right, "user_id", "ts", "event_id", Seq("ts"), direction = "nearest")
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.sql.Timestamp]("right_ts"))).toMap
    assert(out(1L) === Some(ts("2026-01-01 10:20:00"))) // forward side is closer
    assert(out(2L) === Some(ts("2026-01-01 10:20:00"))) // tie -> backward (pandas rule)
    assert(out(3L) === None)                            // no candidates at all
  }

  test("pqCodes: codebook members reconstruct exactly; nested codebooks shrink error") {
    import graft.sim.Quantize
    val vecs = graft.util.D.t(spark, sf, "embeddings")
    val coarse = Quantize.pqCodes(vecs, 8, 125, 7).collect()
      .map(r => r.getAs[Long]("vec_id") -> r).toMap
    assert(coarse.nonEmpty)
    coarse.values.foreach { r =>
      assert(r.getAs[String]("codes").split("-").length === 8)
      assert(r.getAs[Double]("err_sq") >= 0.0)
    }
    // a codebook contributor's own subvectors are distance 0 from its codes
    coarse.keys.filter(id => id % 125 == 7)
      .foreach(id => assert(coarse(id).getAs[Double]("err_sq") === 0.0))
    // 125k+7 ≡ 7 (mod 25): the coarse codebook nests inside the finer
    // one, so per-vector error can only shrink with more codes
    val fine = Quantize.pqCodes(vecs, 8, 25, 7).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("err_sq")).toMap
    coarse.foreach { case (id, r) =>
      assert(fine(id) <= r.getAs[Double]("err_sq") + 1e-9)
    }
  }

  test("adcTopK: a duplicated query attains the minimum possible ADC distance") {
    import graft.sim.Quantize
    val vecs = graft.util.D.t(spark, sf, "embeddings")
    // duplicate query 0's embedding under an id that is neither a query
    // (% 40 != 0) nor a codebook contributor (% 5 != 2)
    val dupId = 1000001L
    val dup = vecs.filter(col("vec_id") === 0L).withColumn("vec_id", lit(dupId))
    val out = Quantize.adcTopK(vecs.unionByName(dup), 8, 5, 2, 40, 1000000)
      .collect()
    assert(out.nonEmpty)
    // ranks are contiguous from 1, distances non-decreasing, no self-match
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq === (1L to sorted.length))
      assert(sorted.sliding(2).forall(p => p.length < 2 ||
        p(0).getAs[Double]("adc_dist") <= p(1).getAs[Double]("adc_dist")))
      assert(!rows.exists(_.getAs[Long]("neighbor_id") === q))
    }
    // the duplicate shares query 0's codes, so its ADC distance is
    // sum_s min_c ||q_s - c||^2 — the global minimum for query 0
    val q0 = out.filter(_.getAs[Long]("query_id") === 0L)
    val dupDist = q0.find(_.getAs[Long]("neighbor_id") === dupId)
      .map(_.getAs[Double]("adc_dist"))
    assert(dupDist.isDefined, "duplicate missing from query 0's ranking")
    assert(dupDist.get === q0.map(_.getAs[Double]("adc_dist")).min)
  }

  test("q_events_retention: offset-0 cell is the full cohort; cells shrink-bounded") {
    val rows = SparkEntry.queries("q_events_retention")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getAs[java.sql.Timestamp]("cohort_week"))
    byCohort.foreach { case (_, cells) =>
      val c0 = cells.find(_.getAs[Long]("week_offset") === 0L)
      assert(c0.isDefined, "every user is active in their own first week")
      assert(c0.get.getAs[Double]("retention") === 1.0)
      val size0 = c0.get.getAs[Long]("n_users")
      cells.foreach { c =>
        assert(c.getAs[Long]("week_offset") >= 0L)
        val n = c.getAs[Long]("n_users")
        assert(n >= 1L && n <= size0)
        val rec = c.getAs[Double]("retention")
        assert(rec > 0.0 && rec <= 1.0)
        assert(rec === BigDecimal(n.toDouble / size0)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
  }
  test("weightedSample: deterministic, k-bounded, and weight-ordered in expectation") {
    import spark.implicits._
    // one language, doc 9 carries ~all the weight via a huge token count
    val docs = (0L to 8L).map(i => (i, "en", ("w " * 5).trim)) :+
      ((9L, "en", ("w " * 500).trim))
    val d = docs.toDF("doc_id", "lang", "text")
    val out = graft.text.Profile.weightedSample(d, k = 3).collect()
    assert(out.length === 3)
    assert(out.map(_.getAs[Long]("rank")).toSeq === Seq(1L, 2L, 3L))
    // the selection is a pure function of doc_id: a repartitioned rerun
    // picks the identical set in the identical order
    val out2 = graft.text.Profile.weightedSample(d.repartition(7), k = 3).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq ===
      out2.map(_.getAs[Long]("doc_id")).toSeq)
    // key math matches the documented formula for the top row
    val top = out.head
    val u = top.getAs[Long]("doc_id")
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val coin = java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(u.toString).substring(0, 15), 16) /
      1152921504606846976.0
    val expect = r6(r6(math.log(top.getAs[Long]("n_tokens").toDouble)) +
      r6(-math.log(-math.log(coin))))
    assert(top.getAs[Double]("key") === expect)
  }

  test("join-size estimate lands within the documented KMV error envelope") {
    val row = graft.SparkEntry.queries("q_join_size_est")(spark, sf).head()
    val exact = row.getAs[Long]("inter_exact").toDouble
    val est = row.getAs[Long]("inter_est").toDouble
    // k=256 -> sigma ~ 1/16; assert a generous 4-sigma band (25%)
    assert(math.abs(est - exact) / exact < 0.25,
      s"inter_est $est vs exact $exact")
    val ja = row.getAs[Double]("jaccard_est")
    assert(ja >= 0.0 && ja <= 1.0)
  }
  test("linear attribution credits sum to purchase value; no-touch purchases roll up") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // user 1: purchase at 10:30 value 12.0 with 2 views + 1 click in the
    // prior hour and 1 view outside it; user 2: purchase with no touches
    val ev = Seq(
      (1L, ts(30), 1L, "purchase", 12.0, "{}"),
      (2L, ts(0), 1L, "view", 0.0, "{}"),
      (3L, ts(10), 1L, "view", 0.0, "{}"),
      (4L, ts(20), 1L, "click", 0.0, "{}"),
      (5L, Timestamp.valueOf("2024-01-01 08:00:00"), 1L, "view", 0.0, "{}"),
      (6L, ts(45), 2L, "purchase", 7.5, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("attr").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.SparkEntry.queries("q_events_attribution")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("view") === ((2L, 1L, 8.0)))      // 12 * 2/3
    assert(out("click") === ((1L, 1L, 4.0)))     // 12 * 1/3
    assert(out("__unattributed__") === ((0L, 1L, 7.5)))
  }

  test("clusterKeepLongest keeps the longest member, smallest id on ties") {
    import spark.implicits._
    // two exact-duplicate texts (same token count -> tie -> min doc_id)
    // plus a longer near-duplicate that must win its cluster
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val d = Seq(
      (10L, base), (11L, base),
      (12L, base + " lambda mu nu xi")
    ).toDF("doc_id", "text")
    val out = graft.dedup.Cluster.clusterKeepLongest(d, 0.3).collect()
    assert(out.length === 1)
    val r0 = out(0)
    assert(r0.getAs[Long]("cluster_size") === 3L)
    assert(r0.getAs[Long]("keep_doc_id") === 12L)  // longest wins
    assert(r0.getAs[Long]("keep_tokens") === 14L)
    assert(r0.getAs[Long]("n_removed") === 2L)
    // pure tie: two equal-length duplicates -> smaller id survives
    val tie = Seq((20L, base), (21L, base)).toDF("doc_id", "text")
    val t0 = graft.dedup.Cluster.clusterKeepLongest(tie, 0.3).collect()(0)
    assert(t0.getAs[Long]("keep_doc_id") === 20L)
  }
  test("qualityFunnel attribution agrees with gopherQuality + repetitionStats") {
    import graft.text.Corpus
    val docs = graft.util.D.t(spark, sf, "documents")
    val g = Corpus.gopherQuality(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val rep = Corpus.repetitionStats(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val src = docs.select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // recompute first_fail per doc from the source functions' outputs
    val expect = src.keys.toSeq.map { id =>
      val gr = g(id); val rr = rep(id)
      val rule =
        if (gr.getAs[Long]("n_words") < 50 || gr.getAs[Long]("n_words") > 100000) "word_count"
        else if (gr.getAs[Double]("mean_word_len") < 3.0 || gr.getAs[Double]("mean_word_len") > 10.0) "mean_word_len"
        else if (gr.getAs[Double]("symbol_ratio") > 0.1) "symbol_ratio"
        else if (gr.getAs[Double]("alpha_frac") < 0.8) "alpha_frac"
        else if (gr.getAs[Long]("n_stop") < 2) "stopwords"
        else if (rr.getAs[Double]("top_token_frac") > 0.2) "top_token"
        else if (rr.getAs[Double]("dup_bigram_frac") > 0.2) "dup_bigram"
        else "__kept__"
      (src(id), rule)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Corpus.qualityFunnel(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_docs")).toMap
    assert(got === expect)
  }
  test("pmiPairs: perfect collocates rank top, PMI math exact, floor applies") {
    import spark.implicits._
    // x,y always co-occur (5 docs each, 5 together) -> PMI = ln(5*10/25)
    // p appears in all 10 docs -> PMI(p, x) = ln(5*10/(10*5)) = 0
    val docs = ((1 to 5).map(i => (i.toLong, "x y p filler" + i)) ++
      (6 to 10).map(i => (i.toLong, "q r p filler" + i))).toDF("doc_id", "text")
    val out = graft.text.Search.pmiPairs(docs, maxTokens = 64, minCount = 5, k = 100)
      .collect()
    val m = out.map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("pmi")).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(m(("x", "y")) === r6(math.log(2.0)))
    assert(m(("q", "r")) === r6(math.log(2.0)))
    assert(m(("p", "x")) === 0.0 && m(("p", "q")) === 0.0)
    // pairs under the co-occurrence floor are absent (filler tokens occur once)
    assert(out.forall(_.getAs[Long]("cnt_ab") >= 5L))
    // ranking: the two perfect collocates outrank the independent pairs
    val top2 = out.take(2).map(r => (r.getString(0), r.getString(1))).toSet
    assert(top2 === Set(("x", "y"), ("q", "r")))
  }

  test("funnel_steps counts only users whose steps chain in order") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val ev = Seq(
      // user 1: full ordered chain
      (1L, ts(0), 1L, "signup", 0.0, "{}"), (2L, ts(1), 1L, "view", 0.0, "{}"),
      (3L, ts(2), 1L, "click", 0.0, "{}"), (4L, ts(3), 1L, "purchase", 1.0, "{}"),
      // user 2: signup + view only
      (5L, ts(0), 2L, "signup", 0.0, "{}"), (6L, ts(1), 2L, "view", 0.0, "{}"),
      // user 3: click BEFORE view -> chain stops after view
      (7L, ts(0), 3L, "signup", 0.0, "{}"), (8L, ts(1), 3L, "click", 0.0, "{}"),
      (9L, ts(2), 3L, "view", 0.0, "{}"),
      // user 4: purchase without signup -> never enters the funnel
      (10L, ts(0), 4L, "purchase", 9.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("funnel").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.SparkEntry.queries("q_funnel_steps")(spark, dir).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out === Map("signup" -> 3L, "view" -> 3L, "click" -> 1L, "purchase" -> 1L))
  }
  test("Bloom prefilter drops rows but never matches; join result is exact") {
    import graft.text.Bloom
    import spark.implicits._
    def hcol(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c.cast("string").cast("binary")), 1, 15), 16, 10).cast("long")
    val cust = graft.util.D.t(spark, sf, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val orders = graft.util.D.t(spark, sf, "orders").select("o_custkey", "o_orderkey")
    val bm = Bloom.bitmapOfHashes(cust.select(hcol(col("c_custkey")).as("h")))
    val pre = Bloom.filterByBloom(orders, hcol(col("o_custkey")), bm)
    val nAll = orders.count(); val nPre = pre.count()
    assert(nPre < nAll, "prefilter dropped nothing — selectivity test is vacuous")
    // exactness: prefiltered join == plain join (no false negatives)
    val plain = orders.join(cust, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val viaBloom = pre.join(cust, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(viaBloom === plain)
    assert(nPre >= plain.size, "prefilter lost matching rows")
  }

  test("events_markov rows are per-from distributions summing to 1") {
    val out = graft.SparkEntry.queries("q_events_markov")(spark, sf).collect()
    val byFrom = out.groupBy(_.getString(0))
    byFrom.foreach { case (f, rows) =>
      val psum = rows.map(_.getAs[Double]("p")).sum
      assert(math.abs(psum - 1.0) < 1e-4, s"$f transition probs sum to $psum")
      val ns = rows.map(_.getAs[Long]("n"))
      assert(ns.forall(_ > 0))
    }
    assert(byFrom.nonEmpty)
  }
  test("minhashAccuracy: exact duplicates land in the (1,1) cell with zero error") {
    import spark.implicits._
    val t0 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val d = Seq((1L, t0), (2L, t0),
      (3L, "one two three four five six seven eight nine ten eleven twelve")
    ).toDF("doc_id", "text")
    val out = Dedup.minhashAccuracy(d).collect()
    assert(out.length === 1)
    val r0 = out(0)
    assert(r0.getInt(0) === 1 && r0.getInt(1) === 1)
    assert(r0.getAs[Long]("n_pairs") === 1L)
    assert(r0.getAs[Double]("mean_abs_err") === 0.0)
  }

  test("orders_rfm scores each dimension by quartile with inverse recency") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    // user i: last purchase on day 10+i, i purchases of value i
    val ev = (1 to 4).flatMap { i =>
      (1 to i).map(j => ((i * 10 + j).toLong, ts(10 + i), i.toLong, "purchase", i.toDouble, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("rfm").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.SparkEntry.queries("q_orders_rfm")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        ((r.getLong(3), r.getAs[Double]("avg_monetary")))).toMap
    // user i has rank i on every dimension -> segment (i, i, i), spend i*i
    assert(out === Map(
      (1L, 1L, 1L) -> ((1L, 1.0)), (2L, 2L, 2L) -> ((1L, 4.0)),
      (3L, 3L, 3L) -> ((1L, 9.0)), (4L, 4L, 4L) -> ((1L, 16.0))))
  }
  test("langMixDrift deltas: per-source shares sum to 1, deltas to ~0 corpus-wide") {
    val out = graft.SparkEntry.queries("q_lang_mix_drift")(spark, sf).collect()
    val bySrc = out.groupBy(_.getString(0))
    bySrc.foreach { case (src, rows) =>
      val psum = rows.map(_.getAs[Double]("p_src")).sum
      assert(math.abs(psum - 1.0) < 1e-4, s"$src p_src sums to $psum")
    }
    // corpus shares are consistent: every (lang) row carries the same p_corpus
    out.groupBy(_.getString(1)).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Double]("p_corpus")).distinct.length === 1)
    }
  }

  test("tfidfNgrams ranks the distinctive bigram above corpus-wide ones") {
    import spark.implicits._
    val filler = "the quick brown fox jumps over the lazy dog again and again"
    val d = Seq(
      (1L, s"$filler special phrase here"),
      (2L, filler), (3L, filler), (4L, filler)
    ).toDF("doc_id", "text")
    val top = graft.text.Search.tfidfNgrams(d, n = 2, k = 1)
      .filter(col("doc_id") === 1L).head()
    // the doc-unique bigram (df=1) outranks any shared one
    assert(top.getAs[Long]("df") === 1L)
    assert(Set("special phrase", "phrase here", "here special", "dog special")
      .exists(b => top.getAs[String]("term").contains(b.split(" ").head)))
  }
  test("psi_drift terms are non-negative; reference bins hold ~1/10 each") {
    val out = graft.SparkEntry.queries("q_psi_drift")(spark, sf).collect()
    assert(out.length === 10)
    out.foreach { r0 =>
      assert(r0.getAs[Double]("psi_term") >= 0.0,
        "a PSI term (p-q)ln(p/q) can never be negative")
      // reference deciles: each bin holds ~10% of the reference slice
      assert(math.abs(r0.getAs[Double]("p_ref") - 0.1) < 0.02)
    }
  }

  test("null_profile counts nulls and distincts per column exactly") {
    import spark.implicits._
    val li = Seq(
      ("A", "F", java.sql.Date.valueOf("2024-01-01"), Some(1.0), Some(0.1)),
      ("A", null, java.sql.Date.valueOf("2024-01-02"), None, Some(0.1)),
      ("B", "O", null, Some(2.0), None)
    ).toDF("l_returnflag", "l_linestatus", "l_shipdate", "l_quantity", "l_discount")
    val dir = java.nio.file.Files.createTempDirectory("np").toString
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = graft.SparkEntry.queries("q_null_profile")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out("l_returnflag") === ((0L, 2L)))
    assert(out("l_linestatus") === ((1L, 2L)))
    assert(out("l_shipdate") === ((1L, 2L)))
    assert(out("l_quantity") === ((1L, 2L)))
    assert(out("l_discount") === ((1L, 1L)))
  }
  test("session gap stats order and the 30m fraction agree with a direct count") {
    val r0 = graft.SparkEntry.queries("q_session_gap_stats")(spark, sf).head()
    val (p50, p90, p99) = (r0.getAs[Long]("p50_us"), r0.getAs[Long]("p90_us"),
      r0.getAs[Long]("p99_us"))
    assert(p50 <= p90 && p90 <= p99, "percentiles must be monotone")
    assert(r0.getAs[Long]("n_gaps") > 0)
    val f = r0.getAs[Double]("frac_over_30m")
    assert(f >= 0.0 && f <= 1.0)
  }

  test("burstiness: constant per-user counts give dispersion 0") {
    import spark.implicits._
    import java.sql.Timestamp
    // every user has exactly 2 'view' events -> var 0 -> dispersion 0
    val ev = (1 to 6).map { i =>
      (i.toLong, Timestamp.valueOf(f"2024-01-01 10:${i % 30}%02d:00"),
        (i % 3).toLong, "view", 0.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("burst").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.SparkEntry.queries("q_user_burstiness")(spark, dir).head()
    assert(out.getAs[Long]("n_users") === 3L)
    assert(out.getAs[Double]("mean_c") === 2.0)
    assert(out.getAs[Double]("var_c") === 0.0)
    assert(out.getAs[Double]("dispersion") === 0.0)
  }
  test("vocab coverage is monotone in the cutoff and consistent with the vocab") {
    val out = graft.SparkEntry.queries("q_vocab_coverage")(spark, sf).collect()
    val shares = out.map(_.getAs[Double]("share"))
    assert(shares.sorted.toSeq === shares.toSeq, "share must grow with the cutoff")
    out.foreach { r0 =>
      assert(r0.getAs[Long]("n_terms") <= r0.getAs[Long]("cutoff"))
      assert(r0.getAs[Long]("covered_tokens") <= r0.getAs[Long]("total_tokens"))
    }
    // totals equal the raw token count of the corpus
    val docs = graft.util.D.t(spark, sf, "documents")
    val nTok = docs.select(org.apache.spark.sql.functions.size(
      graft.text.TextOps.tokens(col("text"))).cast("long").as("n"))
      .agg(sum(col("n"))).head().getLong(0)
    assert(out.head.getAs[Long]("total_tokens") === nTok)
  }

  test("top domains: shares sum to 1 and rollup covers all docs") {
    val out = graft.SparkEntry.queries("q_top_domains")(spark, sf).collect()
    val shareSum = out.map(_.getAs[Double]("doc_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-4)
    val docs = graft.util.D.t(spark, sf, "documents").count()
    assert(out.map(_.getAs[Long]("n_docs")).sum === docs)
    // multi-label hosts roll up to registrable domains
    assert(out.map(_.getString(0)).toSet.contains("wikipedia.org"))
  }
}
