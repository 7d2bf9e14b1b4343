package graft

import graft.dedup.Dedup
import graft.sim.Ann
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  import TestSession._

  private def docs = graft.util.D.t(spark, sf, "documents")
  private def vecs = graft.util.D.t(spark, sf, "embeddings")

  test("identical documents collapse under every dedup signature") {
    // duplicate one real doc under a new id — exact dup must be found
    val one = docs.filter(col("doc_id") === 0)
    val dup = one.withColumn("doc_id", lit(100000L))
    val d2 = docs.unionByName(dup)

    val exact = Dedup.exactGroups(d2, md5(col("text").cast("binary")))
      .filter(col("n_docs") === 2)
    assert(exact.count() === 1)

    val mh = Dedup.minhashPairs(d2)
      .filter(col("doc_a") === 0 && col("doc_b") === 100000L)
      .head()
    assert(mh.getAs[Double]("est_jaccard") === 1.0)

    val sh = Dedup.simhashPairs(d2)
      .filter(col("doc_a") === 0 && col("doc_b") === 100000L)
      .head()
    assert(sh.getAs[Long]("hamming") === 0L)
  }

  test("ngram jaccard of identical docs within a block is 1") {
    val one = docs.filter(col("doc_id") === 0)
    val dup = one.withColumn("doc_id", lit(100000L))
    val j = Dedup.ngramJaccard(docs.unionByName(dup), "source", 0.5)
      .filter(col("doc_a") === 0 && col("doc_b") === 100000L).head()
    assert(j.getAs[Double]("jaccard") === 1.0)
  }

  test("self-cosine is 1; fast path agrees with exact top-k") {
    val n = Ann.normSq(vecs)
    val self = vecs.join(n, "vec_id")
      .select(Ann.cosExpr(Ann.dotFix(col("embedding"), col("embedding")),
        col("nsq"), col("nsq")).as("c"))
      .agg(min("c"), max("c")).head()
    assert(math.abs(self.getDouble(0) - 1.0) < 1e-9 && math.abs(self.getDouble(1) - 1.0) < 1e-9)

    val exact = Ann.bruteTopK(vecs, 40, 5).select("query_id", "rank", "neighbor_id").collect().toSet
    val fast = Ann.fastTopK(vecs, 40, 5).select("query_id", "rank", "neighbor_id").collect().toSet
    assert(exact.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) ===
      fast.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))))
  }

  test("bounded embedding pairs are a subset of the unbounded label-block form") {
    val e = graft.util.D.t(spark, sf, "embeddings")
    val key = (r: org.apache.spark.sql.Row) => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))
    val unbounded = graft.sim.Ann.embeddingPairs(e, 0.3, bits = 0).collect().map(key).toSet
    val bounded = graft.sim.Ann.embeddingPairs(e, 0.3).collect().map(key).toSet
    assert(bounded.subsetOf(unbounded),
      "LSH sub-blocking must only DROP pairs, never invent them")
    assert(bounded.nonEmpty, "bounded form found nothing at sf0.001")
  }

  test("CDC chunking is offset-invariant on shared passages") {
    import graft.text.Cdc
    // the defining CDC property: a shared substring produces the same
    // interior chunks regardless of what precedes it
    val shared = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do " * 8)
    val a = "PREFIX-A 123 " + shared
    val b = "a completely different and much longer prefix text here " + shared
    val ca = Cdc.chunks(a)
    val cb = Cdc.chunks(b)
    // interior chunks (drop the first chunk of each, which spans the
    // differing prefix, and the tail) must coincide
    val ia = ca.drop(1).dropRight(1)
    val ib = cb.drop(1).dropRight(1)
    assert(ia.nonEmpty, s"no interior chunks (a=${ca.length} chunks)")
    assert(ib.containsSlice(ia) || ia.containsSlice(ib),
      s"shared passage chunked differently: ${ia.length} vs ${ib.length}")
    // chunks reassemble the document exactly
    assert(ca.mkString === a && cb.mkString === b)
    assert(Cdc.chunks("") === Seq.empty && Cdc.chunks("short") === Seq("short"))
  }

  test("decontaminate counts distinct shared shingles on a constructed case") {
    import spark.implicits._
    val d = Seq(
      (0L, "eval",  "a b c d"),          // eval shingles: "a b c", "b c d"
      (1L, "train", "x a b c y"),        // shares exactly "a b c"
      (2L, "train", "p q r s t"),        // no overlap -> absent
      (3L, "train", "a b c d a b c d")   // shares both (each counted once)
    ).toDF("doc_id", "source", "text")
    val out = graft.text.Corpus.decontaminate(d, col("doc_id") === 0L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(out === Map(1L -> 1L, 3L -> 2L))
  }

  test("repetitionStats on degenerate and diverse docs") {
    import spark.implicits._
    val d = Seq(
      (0L, "a a a a"),       // 1 distinct, top 1.0, bigrams all "a a" -> dup 2/3
      (1L, "a b c d e f"),   // all distinct, top 1/6, no dup bigrams
      (2L, "x")              // single token: no bigrams, dup 0.0
    ).toDF("doc_id", "text")
    val rows = graft.text.Corpus.repetitionStats(d).collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    assert(byId(0L).getLong(2) === 1L)                       // n_distinct
    assert(byId(0L).getDouble(3) === 1.0)                    // top_token_frac
    assert(byId(0L).getDouble(4) === 0.666667)               // dup_bigram_frac
    assert(byId(0L).getInt(5) === 1)                         // flagged
    assert(byId(1L).getDouble(3) === 0.166667 && byId(1L).getInt(5) === 0)
    assert(byId(2L).getDouble(4) === 0.0 && byId(2L).getLong(1) === 1L)
  }

  test("domainMix keeps everything when the budget covers the totals") {
    import spark.implicits._
    val d = Seq(
      (0L, "en", "one two three"), (1L, "en", "four five"),
      (2L, "de", "eins zwei"))
      .toDF("doc_id", "lang", "text")
    val rows = graft.text.Corpus.domainMix(d, budgetTokens = 1e6)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4))))
      .toMap
    // rate 1.0 -> every doc kept, kept_tokens == total_tokens
    assert(rows("en") === ((5L, 1.0, 2L, 5L)))
    assert(rows("de") === ((2L, 1.0, 1L, 2L)))
    // a tiny budget keeps a strict subset with rate = budget/total
    val tight = graft.text.Corpus.domainMix(d, budgetTokens = 1.0)
      .collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    assert(tight("en") === 0.2 && tight("de") === 0.5)
  }

  test("multimodal decode parses real format headers round-trip") {
    import graft.multimodal.Multimodal
    val m = Multimodal.decodeMeta(spark, docs)
    assert(m.schema.fieldNames.toSeq ===
      Seq("doc_id", "byte_len", "head_byte", "width", "height", "format"))
    val fmts = m.select("format").distinct().collect().map(_.getString(0)).toSet
    assert(fmts.subsetOf(Set("jpeg", "png", "gif")))
    assert(m.count() === docs.count())
    // head_byte must be each format's real magic byte, proving the
    // payload is format bytes and not the raw text
    val heads = m.select("format", "head_byte").distinct().collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    assert(heads.subsetOf(Set(("jpeg", 0xFF), ("png", 0x89), ("gif", 'G'.toInt))))

    // direct synth->parse round-trips, one per format branch + edge cases
    def rt(body: Array[Byte]) = Multimodal.parseMeta(Multimodal.synthPayload(body))
    assert(rt("0jpeg body".getBytes("UTF-8"))._1 === "jpeg")   // '0'=48, 48%3=0
    assert(rt("1png body!".getBytes("UTF-8"))._1 === "png")    // '1'=49, 49%3=1
    assert(rt("2gif body!".getBytes("UTF-8"))._1 === "gif")    // '2'=50, 50%3=2
    assert(rt(Array.empty[Byte]) === (("jpeg", 16L, 16L)))     // empty body -> jpeg 16x16
    // dims recovered from markers == the synthesis formulas
    val b = "1png body!".getBytes("UTF-8")
    assert(rt(b)._2 === 16L + (b.length % 64) * 4)
    assert(rt(b)._3 === 16L + ((b.length + (b(0) & 0xff)) % 48) * 4)
    // a body full of 0xFF bytes must not confuse the JPEG marker walk
    // (the walk stops at SOF0, before the entropy body)
    val ffBody = Array.fill[Byte](99)(0xFF.toByte); ffBody(0) = '0'
    assert(rt(ffBody)._1 === "jpeg")
    // fail-loud on garbage that carries no magic
    intercept[IllegalStateException] {
      Multimodal.parseMeta("not an image at all".getBytes("UTF-8"))
    }
    // corrupted PNG CRC is rejected, not silently decoded
    val png = Multimodal.synthPayload("1png body!".getBytes("UTF-8"))
    png(30) = (png(30) ^ 0x7f).toByte
    intercept[IllegalStateException] { Multimodal.parseMeta(png) }
  }

  test("native FixedScale is bit-identical to the round-HOF quantizer") {
    import spark.implicits._
    // .5-boundary values at the 1e8 scale (1.5e-8 -> 1.5, -2.5e-8 ->
    // -2.5: HALF_UP must round away from zero on the SHORTEST-DECIMAL
    // rendering, the BigDecimal slow path both forms share), plus
    // ordinary magnitudes and exact zeros
    val samples = Seq(
      Seq(1.5e-8f, -2.5e-8f, 0.5e-8f, -0.5e-8f),
      Seq(0.123456789f, -0.987654321f, 1.0f, -1.0f),
      Seq(0.0f, -0.0f, 3.4e-8f, 7.77e-3f),
      Seq.empty[Float])
    val df = samples.toDF("embedding")
    val hof = transform(col("embedding"),
      x => round(x.cast("double") * 1e8, 0).cast("long"))
    val bad = df.select(graft.sim.Ann.scaled(col("embedding")).as("n"), hof.as("h"))
      .filter(col("n") =!= col("h")).collect()
    assert(bad.isEmpty, s"native/HOF scale mismatch: ${bad.take(3).mkString("; ")}")
    // the whole embeddings corpus
    val corpus = vecs.select(graft.sim.Ann.scaled(col("embedding")).as("n"), hof.as("h"))
      .filter(col("n") =!= col("h"))
    assert(corpus.count() === 0)
  }

  test("native WordShingles/ShingleHashes are bit-identical to the HOF chains") {
    import spark.implicits._
    import graft.text.TextOps
    // adversarial token shapes: doubled/leading/trailing spaces produce
    // EMPTY tokens that the HOF chain shingles through concat_ws — the
    // native substring form must reproduce them byte-for-byte; plus
    // unicode tokens (0x20 never appears inside a multi-byte sequence)
    val rows = Seq(
      "a b c", "a b c d e", "a  b c", " a b c", "a b c ", "  ", "",
      "one", "one two", "a b  c  d", "héllo wörld 你好 ok",
      "emoji 😀 mid 😀 end", "x " * 40)
    val df = rows.toDF("text").withColumn("w", TextOps.tokens(col("text")))
    val hofShingles = TextOps.shinglesOf(col("w"))
    val hofHashes = transform(TextOps.shinglesOf(col("w")),
      s => conv(substring(md5(s.cast("binary")), 1, 15), 16, 10).cast("long"))
    val bad = df.select(
        TextOps.shingles(col("text")).as("ns"), hofShingles.as("hs"),
        TextOps.shingleHashes(col("text")).as("nh"), hofHashes.as("hh"))
      .filter(col("ns") =!= col("hs") || col("nh") =!= col("hh"))
      .collect()
    assert(bad.isEmpty, s"native/HOF shingle mismatch: ${bad.take(3).mkString("; ")}")
    // the whole documents corpus, both forms
    val corpus = docs
      .withColumn("w", TextOps.tokens(col("text")))
      .select(TextOps.shingles(col("text")).as("ns"), TextOps.shinglesOf(col("w")).as("hs"),
        TextOps.shingleHashes(col("text")).as("nh"),
        transform(TextOps.shinglesOf(col("w")),
          s => conv(substring(md5(s.cast("binary")), 1, 15), 16, 10).cast("long")).as("hh"))
      .filter(col("ns") =!= col("hs") || col("nh") =!= col("hh"))
    assert(corpus.count() === 0)
    // NULL stays NULL
    val nulls = Seq[Option[String]](None).toDF("text")
      .select(TextOps.shingles(col("text")).as("s"), TextOps.shingleHashes(col("text")).as("h"))
      .head()
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
    // the parameterized WordNgrams window: bigrams vs the HOF chain,
    // and window 3 must equal WordShingles exactly
    val hofBigrams = when(size(col("w")) >= 2,
      transform(sequence(lit(1), size(col("w")) - 1),
        i => concat_ws(" ", element_at(col("w"), i), element_at(col("w"), i + 1))))
      .otherwise(array().cast("array<string>"))
    val badN = docs
      .withColumn("w", TextOps.tokens(col("text")))
      .select(graft.functions.WordNgrams(col("text"), 2).as("n2"), hofBigrams.as("h2"),
        graft.functions.WordNgrams(col("text"), 3).as("n3"),
        TextOps.shingles(col("text")).as("s3"))
      .filter(col("n2") =!= col("h2") || col("n3") =!= col("s3"))
    assert(badN.count() === 0)
  }

  test("native StopHits/CjkCount are bit-identical to the HOF/regex forms") {
    import spark.implicits._
    import graft.text.TextOps
    val rows = Seq(
      "the cat and the dog", "der und das", "le la les", "el y es",
      "THE The the", "  the  ", "", "no stop words here at all xyz",
      "你好 world the 世界", "mixed 中文 und deutsch", "emoji 😀 the end",
      "athe thea the", "und, der!") ++
      (0 until 30).map(i => s"doc $i the und le el ${"的" * (i % 3)}")
    val df = rows.toDF("text").withColumn("w", TextOps.tokens(col("text")))
    val langs = Seq("de", "en", "es", "fr")
    val regexCjk = length(col("text")) -
      length(regexp_replace(col("text"), "[\\u4e00-\\u9fff]", ""))
    val checks = langs.map(l =>
      (TextOps.langHitsText(col("text"), l) =!= TextOps.langHits(col("w"), l))) :+
      (TextOps.cjkCount(col("text")) =!= regexCjk)
    val bad = df.filter(checks.reduce(_ || _)).collect()
    assert(bad.isEmpty, s"native/HOF lang-signal mismatch: ${bad.take(3).mkString("; ")}")
    // the whole documents corpus
    val corpusChecks = langs.map(l =>
      (TextOps.langHitsText(col("text"), l) =!= TextOps.langHits(col("w"), l))) :+
      (TextOps.cjkCount(col("text")) =!= regexCjk)
    assert(docs.withColumn("w", TextOps.tokens(col("text")))
      .filter(corpusChecks.reduce(_ || _)).count() === 0)
    // unknown language fails fast at construction
    intercept[IllegalArgumentException](TextOps.langHitsText(col("text"), "xx"))
  }

  test("native AlphaTokens is bit-identical to size(filter(split, rlike)) incl. corpus") {
    import spark.implicits._
    import graft.functions.AlphaTokens
    // split(s, " ") keeps empty tokens around doubled/leading/trailing
    // spaces, BOTH cases count (the Gopher rule asks for alphabetic,
    // and an all-caps headline is alphabetic), digits-only words don't
    // count, multibyte text can't false-positive (continuation bytes
    // are >= 0x80)
    val rows = Seq(
      "the cat", "  double  spaced  ", " lead", "trail ", "", " ", "   ",
      "UPPER ONLY", "Mixed Case words", "77 88 99", "a1 2b 3c3",
      "你好 世界", "中文 with latin", "emoji 😀 ok", "héllo wörld", "x") ++
      (0 until 30).map(i => s"doc$i ${"77 " * (i % 4)}the  END ${"中" * (i % 3)}")
    val hof = size(filter(split(col("text"), " "), x => x.rlike("[a-zA-Z]")))
    val bad = rows.toDF("text")
      .filter(AlphaTokens(col("text")) =!= hof).collect()
    assert(bad.isEmpty, s"AlphaTokens/HOF mismatch: ${bad.take(3).mkString("; ")}")
    // the whole documents corpus
    assert(docs.filter(AlphaTokens(col("text")) =!= hof).count() === 0)
    // NULL stays NULL
    assert(Seq[Option[String]](None).toDF("text")
      .select(AlphaTokens(col("text"))).head().isNullAt(0))
  }

  test("native ArgMaxBy matches max_by(id, struct(score, -id)) incl. ties and NULLs") {
    import spark.implicits._
    // ties must break toward the SMALLEST id (the oracle's ORDER BY
    // score DESC, id ASC), -0.0 == 0.0 per SQL numeric comparison,
    // NULL scores are skipped, and an all-NULL group yields NULL
    val rows = Seq(
      (1L, 10L, Some(0.5)), (1L, 3L, Some(0.5)), (1L, 7L, Some(0.1)),
      (2L, 5L, Some(-0.2)), (2L, 6L, Some(-0.1)),
      (4L, 9L, Some(0.0)), (4L, 8L, Some(-0.0)), // SQL tie: -0.0 == 0.0
      (5L, 4L, Some(Double.MinPositiveValue)), (5L, 2L, Some(0.0)))
      .toDF("g", "id", "score")
    val got = rows.groupBy("g")
      .agg(graft.functions.ArgMaxBy.argmax(col("id"), col("score")).as("a"))
    val want = rows.groupBy("g")
      .agg(max_by(col("id"), struct(col("score"), -col("id"))).as("a"))
    val joined = got.join(want.withColumnRenamed("a", "w"), "g")
      .filter(col("a") =!= col("w") || (col("a").isNull !== col("w").isNull))
    assert(joined.count() === 0)
    // documented divergence from max_by's struct-ordering: NULL scores
    // are SKIPPED (the SQL mirrors never rank NULL scores)
    val nulls = Seq((3L, 1L, None: Option[Double]), (3L, 2L, None))
      .toDF("g", "id", "score").groupBy("g")
      .agg(graft.functions.ArgMaxBy.argmax(col("id"), col("score")).as("a"))
    assert(nulls.filter(col("a").isNull).count() === 1)
    // the real assignment: native vs max_by over the embeddings corpus
    val e = vecs
    val fromNative = graft.sim.Ann.assignLists(e, 25, 7)
    assert(fromNative.filter(col("list_id").isNull).count() === 0)
  }

  test("native SimHash60 is bit-identical to the explode+aggregate form") {
    import spark.implicits._
    import graft.dedup.Dedup.SimBits
    // the historical form: explode tokens, hash, 60 grouped ±1 sums,
    // sign — rebuilt here as the reference; the native expression must
    // match on every document INCLUDING empty-token shapes (split emits
    // empty strings for doubled/leading/trailing spaces, and both
    // engines hash them) and unicode
    def aggregateForm(d: org.apache.spark.sql.DataFrame) = {
      val occ = d.select(col("doc_id"), explode(graft.text.TextOps.tokens(col("text"))).as("w"))
        .select(col("doc_id"),
          conv(substring(md5(col("w").cast("binary")), 1, 15), 16, 10).cast("long").as("wh"))
      val sums = (0 until SimBits).map { j =>
        sum(shiftright(col("wh"), SimBits - 1 - j).bitwiseAND(lit(1L)) * 2 - 1).as(s"s$j") }
      val agg = occ.groupBy("doc_id").agg(sums.head, sums.tail: _*)
      val sim = (0 until SimBits)
        .map(j => when(col(s"s$j") > 0, lit(1L << (SimBits - 1 - j))).otherwise(lit(0L)))
        .reduce(_ + _)
      agg.select(col("doc_id"), sim.cast("long").as("ref_simhash"))
    }
    val extra = Seq((9001L, "a  b c "), (9002L, " leading"), (9003L, ""),
      (9004L, "héllo wörld 你好"), (9005L, "x"), (9006L, "same same same diff"))
      .toDF("doc_id", "text")
    val d = docs.select("doc_id", "text").unionByName(extra)
    val bad = graft.dedup.Dedup.simhashDf(d)
      .join(aggregateForm(d), Seq("doc_id"))
      .filter(col("simhash") =!= col("ref_simhash"))
    assert(bad.count() === 0)
  }

  test("native AsciiNormalize/StrippedCount are bit-identical to the regex chains") {
    import spark.implicits._
    // adversarial inputs: case, digit, squeeze/trim shapes, tabs and
    // control chars, empties — plus non-ASCII rows exercising the slow
    // path (accents, the Turkish dotted İ whose string-lowercase expands
    // to i + combining dot, CJK, an astral-plane emoji = surrogate pair)
    val rows = Seq(
      "Hello, World!  42", "  leading and trailing  ", "a  b   c",
      "ALLCAPS", "...", "", " ", "\ttab\tand\ncontrol\rchars",
      "MiXeD 123 cAsE!!", "double  space, comma",
      "Café au lait", "İstanbul", "ÅNGSTRÖM Å", "你好 world 123",
      "emoji 😀 here", "ß sharp", "näïve  Über",
      "a!@#$%^&*()b", "0123456789", "    !!!   ") ++
      (0 until 50).map(i => s"doc $i body ${"x" * (i % 7)} End${i}Z")
    val df = rows.toDF("text")
    val regexNorm = trim(regexp_replace(regexp_replace(lower(col("text")),
      "[^a-z0-9 ]", ""), " +", " "))
    val regexCnt = length(col("text")) -
      length(regexp_replace(col("text"), "[^a-z0-9 ]", ""))
    val bad = df.select(col("text"),
        graft.functions.AsciiNormalize(col("text")).as("fast_n"), regexNorm.as("slow_n"),
        graft.functions.StrippedCount(col("text")).as("fast_c"), regexCnt.as("slow_c"))
      .filter(col("fast_n") =!= col("slow_n") || col("fast_c") =!= col("slow_c"))
      .collect()
    assert(bad.isEmpty, s"native/regex mismatch: ${bad.take(3).mkString("; ")}")
    // real corpus: normText (now native) over every document equals the chain
    val corpus = docs.select(col("text"),
        Dedup.normText(col("text")).as("fast"), regexNorm.as("slow"))
      .filter(col("fast") =!= col("slow"))
    assert(corpus.count() === 0)
    // NULL stays NULL
    val nulls = Seq[Option[String]](None).toDF("text")
      .select(graft.functions.AsciiNormalize(col("text")).as("n"),
        graft.functions.StrippedCount(col("text")).as("c")).head()
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }

  test("piiScrub replaces and counts each pattern; clean text is untouched") {
    import spark.implicits._
    val rows = Seq(
      (1L, "write to alice.smith+tag@sub.example.co.uk today"),
      (2L, "host 192.168.0.1 and 10.0.0.255 up"),
      (3L, "call +14155551234 or +4930123456"),
      (4L, "mixed bob@ex.org at 127.0.0.1 dial +12345678"),
      (5L, "no pii here, just words + symbols @ large 1.2"),
      (6L, "")).toDF("doc_id", "text")
    val out = graft.text.Corpus.piiScrub(rows).orderBy("doc_id").collect()
    def r(i: Int) = (out(i).getAs[Long]("n_emails"), out(i).getAs[Long]("n_ips"),
      out(i).getAs[Long]("n_phones"), out(i).getAs[String]("text"))
    assert(r(0) === ((1L, 0L, 0L, "write to <EMAIL> today")))
    assert(r(1) === ((0L, 2L, 0L, "host <IP> and <IP> up")))
    assert(r(2) === ((0L, 0L, 2L, "call <PHONE> or <PHONE>")))
    assert(r(3) === ((1L, 1L, 1L, "mixed <EMAIL> at <IP> dial <PHONE>")))
    // '@' and '+' present but not in PII shape: untouched, zero counts
    assert(r(4) === ((0L, 0L, 0L, "no pii here, just words + symbols @ large 1.2")))
    assert(r(5) === ((0L, 0L, 0L, "")))
  }

  test("lineDedup drops cross-doc repeated lines, keeps within-doc repeats") {
    import spark.implicits._
    val rows = Seq(
      (1L, "unique alpha\nshared footer\nunique beta"),
      (2L, "another one\nshared footer"),
      (3L, "solo line"),
      (4L, "shared footer"),
      (5L, "twin\ntwin")).toDF("doc_id", "text")
    val out = graft.dedup.Dedup.lineDedup(rows).collect()
    def r(i: Int) = (out(i).getAs[Long]("n_lines"), out(i).getAs[Long]("n_kept"))
    assert(r(0) === ((3L, 2L)))
    assert(r(1) === ((2L, 1L)))
    assert(r(2) === ((1L, 1L)))
    assert(r(3) === ((1L, 0L)))   // every line boilerplate -> emptied
    assert(r(4) === ((2L, 2L)))   // within-doc repeat is ONE doc -> kept
    val md = java.security.MessageDigest.getInstance("MD5")
    val exp = md.digest("unique alpha\nunique beta".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out(0).getAs[String]("kept_fp") === exp)
    assert(out(3).getAs[String]("kept_fp") === "d41d8cd98f00b204e9800998ecf8427e")
  }

  test("dupShingleFrac counts occurrences against cross-doc shingle presence") {
    import spark.implicits._
    val rows = Seq(
      (1L, "a b c d"),           // shingles: abc, bcd
      (2L, "a b c x"),           // shares abc with doc 1
      (3L, "q r s"),             // unique shingle
      (4L, "a b"),               // no shingles -> absent
      (5L, "a b c a b c a b c")  // 7 occurrences; only abc is cross-doc
    ).toDF("doc_id", "text")
    val out = graft.dedup.Dedup.dupShingleFrac(rows).collect()
    def r(i: Int) = (out(i).getAs[Long]("doc_id"), out(i).getAs[Long]("n_shingles"),
      out(i).getAs[Long]("n_dup"), out(i).getAs[Double]("dup_frac"))
    assert(out.length === 4)
    assert(r(0) === ((1L, 2L, 1L, 0.5)))
    assert(r(1) === ((2L, 2L, 1L, 0.5)))
    assert(r(2) === ((3L, 1L, 0L, 0.0)))
    // within-doc repeats of a within-doc-only shingle are NOT dup
    assert(r(3) === ((5L, 7L, 3L, 0.428571)))
  }

  test("substrSpans merges overlapping dup windows into maximal spans") {
    import spark.implicits._
    // A and B share a 10-token passage at DIFFERENT offsets; C is unique;
    // D repeats one 4-token phrase twice within itself (within-doc dup).
    val passage = (1 to 10).map(i => s"p$i").mkString(" ")
    val rows = Seq(
      (1L, s"u1 u2 $passage u3"),
      (2L, s"v1 $passage v2 v3 v4"),
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      (4L, "x1 x2 x3 x4 y x1 x2 x3 x4")
    ).toDF("doc_id", "text")
    val out = Dedup.substrSpans(rows, winLen = 4).collect()
    def r(i: Int) = (out(i).getAs[Long]("doc_id"), out(i).getAs[Long]("n_spans"),
      out(i).getAs[Long]("n_dup_windows"), out(i).getAs[Long]("dup_tokens"))
    // the 10-token shared passage = 7 dup windows at L=4, merging to ONE
    // 10-token span in both docs regardless of offset
    assert(r(0) === ((1L, 1L, 7L, 10L)))
    assert(r(1) === ((2L, 1L, 7L, 10L)))
    assert(r(2) === ((3L, 0L, 0L, 0L)))
    // within-doc: "x1 x2 x3 x4" occurs twice -> two 1-window spans
    assert(r(3) === ((4L, 2L, 2L, 8L)))
    // a doc shorter than the window contributes nothing and divides by
    // its real token count (no NaN/null)
    val tiny = Seq((9L, "a b")).toDF("doc_id", "text")
    val t0 = Dedup.substrSpans(tiny, winLen = 4).collect()(0)
    assert(t0.getAs[Long]("n_tokens") === 2L && t0.getAs[Double]("dup_frac") === 0.0)
  }

  test("substrSpans coverage is the exact >=winLen threshold: 50-token pass sees only >=50-token duplicates") {
    import spark.implicits._
    // the q_dedup_substr50 contract (Lee et al. 2022's published
    // threshold): a 60-token shared passage qualifies; a 20-token shared
    // passage must contribute NOTHING at winLen=50 (it has no 50-token
    // duplicated window) while the winLen=8 profile covers both
    val big = (1 to 60).map(i => s"b$i").mkString(" ")
    val small = (1 to 20).map(i => s"s$i").mkString(" ")
    val rows = Seq(
      (1L, s"a1 $big a2 $small"),
      (2L, s"c1 c2 $big c3"),
      (3L, s"$small d1 d2 d3")
    ).toDF("doc_id", "text")
    val at50 = Dedup.substrSpans(rows, winLen = 50).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_spans"), r.getAs[Long]("dup_tokens"))).toMap
    // exactly the 60 shared tokens, in the two docs that share them
    assert(at50(1L) === ((1L, 60L)))
    assert(at50(2L) === ((1L, 60L)))
    assert(at50(3L) === ((0L, 0L)), "20-token duplicate must not leak into the 50-token pass")
    val at8 = Dedup.substrSpans(rows, winLen = 8).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dup_tokens")).toMap
    assert(at8(1L) === 80L && at8(2L) === 60L && at8(3L) === 20L,
      "winLen=8 covers both passages exactly (60+20 / 60 / 20 tokens)")

    // the TRANSFORM: substrCut removes exactly the profiled tokens and
    // rebuilds the kept text in order (remove-all-occurrences policy)
    val cut = Dedup.substrCut(rows, winLen = 50).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(cut(1L).getAs[Long]("n_tokens") === 82L)
    assert(cut(1L).getAs[Long]("n_removed") === 60L)
    assert(cut(1L).getAs[Long]("n_kept") === 22L)
    assert(cut(1L).getAs[String]("clean_text") === s"a1 a2 $small")
    assert(cut(2L).getAs[String]("clean_text") === "c1 c2 c3")
    // the sub-threshold doc is untouched
    assert(cut(3L).getAs[Long]("n_removed") === 0L)
    assert(cut(3L).getAs[String]("clean_text") === s"$small d1 d2 d3")
    // null/empty text keeps its row, zero counts, empty clean text
    val edge = Seq((1L, null.asInstanceOf[String]), (2L, "")).toDF("doc_id", "text")
    val ce = Dedup.substrCut(edge, winLen = 50).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(ce(1L).getAs[Long]("n_tokens") === 0L && ce(1L).getAs[String]("clean_text") === "")
    // "" splits to one empty token in both engines (the tokenize-family
    // convention) — kept, since nothing covers it
    assert(ce(2L).getAs[Long]("n_tokens") === 1L && ce(2L).getAs[Long]("n_removed") === 0L)
  }

  test("fuzz: substrCut equals a brute-force reference and reconciles with the profile on random corpora") {
    import spark.implicits._
    // seeded random corpora over a TINY alphabet (collisions guaranteed)
    // — the luck-remover for the sweep/hash machinery: coverage must
    // equal the from-first-principles definition (union of windows whose
    // exact text occurs > 1 time), the rebuilt text must be the kept
    // tokens in order, and n_removed must equal the profile's
    // dup_tokens (the same definition computed by a different plan)
    val rnd = new scala.util.Random(42)
    val L = 4
    for (round <- 1 to 3) {
      val docs = (0L until 30L).map { id =>
        val n = 5 + rnd.nextInt(40)
        (id, Seq.fill(n)(s"t${rnd.nextInt(4)}").mkString(" "))
      }
      // brute force: window text -> global occurrence count
      val wins = docs.flatMap { case (id, text) =>
        val tk = text.split(" ", -1)
        (0 to tk.length - L).map(p => (id, p, tk.slice(p, p + L).mkString(" ")))
      }
      val occ = wins.groupBy(_._3).view.mapValues(_.size).toMap
      val expected = docs.map { case (id, text) =>
        val tk = text.split(" ", -1)
        val covered = Array.fill(tk.length)(false)
        wins.filter(w => w._1 == id && occ(w._3) > 1).foreach { case (_, p, _) =>
          (p until p + L).foreach(covered(_) = true)
        }
        val kept = tk.zipWithIndex.collect { case (t, i) if !covered(i) => t }
        id -> ((tk.length.toLong, covered.count(identity).toLong, kept.mkString(" ")))
      }.toMap
      val df = docs.toDF("doc_id", "text")
      val got = Dedup.substrCut(df, winLen = L).collect()
      assert(got.length === 30)
      got.foreach { r =>
        val (nt, nr, clean) = expected(r.getAs[Long]("doc_id"))
        assert(r.getAs[Long]("n_tokens") === nt, s"round $round doc ${r.getLong(0)}")
        assert(r.getAs[Long]("n_removed") === nr, s"round $round doc ${r.getLong(0)}")
        assert(r.getAs[String]("clean_text") === clean, s"round $round doc ${r.getLong(0)}")
      }
      val prof = Dedup.substrSpans(df, winLen = L).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dup_tokens")).toMap
      got.foreach(r => assert(
        r.getAs[Long]("n_removed") === prof(r.getAs[Long]("doc_id")),
        "cut must remove exactly the profiled coverage"))
    }
  }

  test("triplets picks nearest same-label positive and different-label negative") {
    import spark.implicits._
    // anchor 0 (label 1): v1 same-label near, v2 same-label far,
    // v3 different-label near, v4 different-label far; anchor 40 has
    // no same-label partner -> NULL positive, margin NULL
    val rows = Seq(
      (0L, 1L, Seq(1.0f, 0.0f, 0.0f)),
      (1L, 1L, Seq(0.9f, 0.1f, 0.0f)),
      (2L, 1L, Seq(0.0f, 1.0f, 0.0f)),
      (3L, 2L, Seq(0.95f, 0.05f, 0.0f)),
      (4L, 2L, Seq(0.0f, 0.0f, 1.0f)),
      (40L, 9L, Seq(0.5f, 0.5f, 0.0f))
    ).toDF("vec_id", "label", "embedding")
    val out = Ann.triplets(rows, 40).collect()
    val a0 = out.find(_.getLong(0) == 0L).get
    assert(a0.getAs[Long]("pos_id") === 1L)
    assert(a0.getAs[Long]("neg_id") === 3L)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(a0.getAs[Double]("margin") ===
      r6(a0.getAs[Double]("pos_cos") - a0.getAs[Double]("neg_cos")))
    val a40 = out.find(_.getLong(0) == 40L).get
    assert(a40.isNullAt(a40.fieldIndex("pos_id")) && a40.isNullAt(a40.fieldIndex("margin")))
    assert(!a40.isNullAt(a40.fieldIndex("neg_id")))
  }

  test("ngramRepetition: top n-gram occurrences and merged dup coverage") {
    import spark.implicits._
    // doc 1: "a b" occurs 3x among 4 bigram positions -> top2 = 3*2/5
    // doc 2: a 5-token phrase repeated back-to-back -> the 5-gram at
    //   pos 0 and 5 duplicates; coverage = 10 of 11 tokens
    // doc 3: no repetition at all
    val rows = Seq(
      (1L, "a b a b a b"),                       // 6 tokens
      (2L, "p q r s t p q r s t z"),             // 11 tokens
      (3L, "one two three four five six seven")
    ).toDF("doc_id", "text")
    val out = graft.text.Corpus.ngramRepetition(rows).collect()
    def m(i: Int) = out(i).getValuesMap[Any](out(i).schema.fieldNames)
    val d1 = m(0)
    assert(d1("n_tokens") === 6L)
    assert(d1("top2_frac") === 1.0)      // "a b" 3x *2 / 6
    assert(d1("dup5_frac") === 0.0)      // no repeated 5-gram ("a b a b a" once... actually check)
    val d2 = m(1)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(d2("top2_frac") === r6(2.0 * 2 / 11)) // "p q" twice
    assert(d2("dup5_frac") === r6(10.0 / 11))
    val d3 = m(2)
    assert(d3("top2_frac") === r6(1.0 * 2 / 7) &&
      d3("dup5_frac") === 0.0 && d3("dup10_frac") === 0.0)
  }

  test("saltedNunique equals the plain distinct count on skewed keys") {
    import spark.implicits._
    // hot key: one key carries 90% of rows with heavy value repetition
    val rows = ((1 to 900).map(i => ("hot", s"u${i % 37}")) ++
      (1 to 100).map(i => (s"k${i % 5}", s"u$i"))).toDF("k", "v")
    val salted = graft.util.Scale.saltedNunique(rows, "k", "v", 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = rows.groupBy("k").agg(count_distinct(col("v")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
    assert(salted("hot") === 37L)
  }

  test("seqPack spans are contiguous, exhaustive, and boundary-splitting") {
    import spark.implicits._
    // token counts 3,4,5,6 over B=5: stream len 18, blocks 0..3
    val rows = Seq(
      (10L, "a b c"), (20L, "a b c d"), (30L, "a b c d e"), (40L, "a b c d e f"))
      .toDF("doc_id", "text")
    val out = graft.text.Corpus.seqPack(rows, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq(
      (10L, 3L, 0L, 0L, 0L),    // [0,3) in block 0
      (20L, 4L, 3L, 0L, 1L),    // [3,7) straddles 0->1
      (30L, 5L, 7L, 1L, 2L),    // [7,12) straddles 1->2
      (40L, 6L, 12L, 2L, 3L)))  // [12,18) straddles 2->3
    // spans tile the stream: each start = previous start + previous n
    val starts = out.map(_._3); val ns = out.map(_._2)
    assert(starts.drop(1).toSeq === starts.dropRight(1).zip(ns.dropRight(1)).map { case (s0, n) => s0 + n }.toSeq)
  }

  test("resampleEpochs: integer weights repeat exactly, fractions sample, 0 drops") {
    import spark.implicits._
    val rows = (0L until 400L).map(i =>
      (i, s"s${i % 4}", s"tok a b c")).toDF("doc_id", "source", "text")
    val out = graft.text.Corpus.resampleEpochs(rows,
      Map("s0" -> 3.0, "s1" -> 0.5, "s2" -> 0.0)).collect()
    val bySrc = out.groupBy(_.getAs[String]("source"))
    // integer weight: every doc gets exactly w epochs
    assert(bySrc("s0").forall(_.getAs[Long]("n_epochs") === 3L))
    // zero weight drops the whole domain
    assert(bySrc("s2").forall(_.getAs[Long]("n_epochs") === 0L))
    // unlisted source defaults to one epoch
    assert(bySrc("s3").forall(_.getAs[Long]("n_epochs") === 1L))
    // fractional weight: each doc gets 0 or 1, about half of them 1
    val s1 = bySrc("s1").map(_.getAs[Long]("n_epochs"))
    assert(s1.forall(e => e === 0L || e === 1L))
    assert(math.abs(s1.sum / s1.size.toDouble - 0.5) < 0.2)
    // the hash coin is seedless: a rerun picks identical documents
    val again = graft.text.Corpus.resampleEpochs(rows,
      Map("s0" -> 3.0, "s1" -> 0.5, "s2" -> 0.0)).collect()
    assert(out.map(_.toSeq.toList).toList === again.map(_.toSeq.toList).toList)
    intercept[IllegalArgumentException](
      graft.text.Corpus.resampleEpochs(rows, Map("s0" -> -1.0)))
  }

  test("bm25 ranks by tf/idf/length the way the formula says") {
    import spark.implicits._
    val pad = (1 to 20).map(_ => "x").mkString(" ")
    val rows = Seq(
      (1L, s"rare $pad"),                 // one hit of the rare term
      (2L, s"rare rare rare $pad"),       // more hits, near-same length
      (3L, s"common $pad"),               // one hit of the common term
      (4L, s"common common $pad $pad $pad"), // more hits but much longer
      (5L, s"rare common $pad"),          // both terms
      (6L, pad),                          // neither term
      (7L, s"common $pad"),               // pad common's df above rare's
      (8L, s"common $pad")).toDF("doc_id", "text")
    val out = graft.text.Search.bm25(rows, Seq("rare", "common"), k = 10)
      .collect()
    val score = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    // no term hits -> no row; ranks are 1..n in score order
    assert(!score.contains(6L))
    assert(out.map(_.getAs[Long]("rank")).toSeq === (1L to out.length.toLong).toSeq)
    // more occurrences of the same term (near-same length) score higher
    assert(score(2L) > score(1L))
    // rare beats common at equal tf and length (idf)
    assert(score(1L) > score(3L))
    // both terms beat either alone at same length
    assert(score(5L) > score(1L) && score(5L) > score(3L))
    // n_terms_hit counts DISTINCT matched terms
    assert(out.find(_.getAs[Long]("doc_id") == 5L).get
      .getAs[Long]("n_terms_hit") === 2L)
    // length normalization: doc 4 has double the tf of doc 3 but 3x the
    // length; its saturated score stays below 2x doc 3's
    assert(score(4L) < 2 * score(3L))
  }

  test("kmeansStep equals the brute-force Lloyd iteration") {
    import spark.implicits._
    val e = vecs
    val out = graft.sim.Ann.kmeansStep(e, 25, 7).collect()
    // brute-force the same iteration on the driver
    val all = e.collect().map(r => (r.getAs[Long]("vec_id"),
      r.getSeq[Float](r.fieldIndex("embedding")).toArray))
    def fx(v: Array[Float]): Array[Long] = v.map(x => math.round(x.toDouble * 1e8))
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum.toDouble
      val den = math.sqrt(a.map(x => x * x).sum.toDouble) *
        math.sqrt(b.map(x => x * x).sum.toDouble)
      if (den > 0) dot / den else 0.0
    }
    val cents = all.filter(_._1 % 25 == 7).map { case (id, v) => (id, fx(v)) }
    val assign = all.map { case (id, v) =>
      val f = fx(v)
      val best = cents.map { case (cid, ce) => (cid, cos(ce, f)) }
        .minBy { case (cid, c) => (-c, cid) }._1
      (best, f)
    }
    // mirror D.r's half-up rounding exactly (math.round floors at -x.5)
    def r6(x: Double): Double =
      BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble / 1e6
    val expected = assign.groupBy(_._1).toSeq.flatMap { case (cid, members) =>
      val n = members.length
      (0 until members.head._2.length).map { d =>
        val s = members.map(_._2(d)).sum
        (cid, d.toLong, n.toLong, r6(s.toDouble / 1e8 / n))
      }
    }.sortBy(t => (t._1, t._2))
    assert(out.length === expected.length)
    out.zip(expected).foreach { case (r, (cid, d, n, c)) =>
      assert(r.getAs[Long]("cluster_id") === cid)
      assert(r.getAs[Long]("dim") === d)
      assert(r.getAs[Long]("n_members") === n)
      assert(math.abs(r.getAs[Double]("centroid") - c) < 1e-9,
        s"centroid mismatch at ($cid, $d)")
    }
    // every vector is assigned: cluster sizes sum to the corpus
    assert(out.filter(_.getAs[Long]("dim") == 0L)
      .map(_.getAs[Long]("n_members")).sum === all.length)
  }

  test("gopherQuality rules fire on the shapes they target") {
    import spark.implicits._
    val fifty = (1 to 50).map(i => s"word$i").mkString(" ") // 50 words, has letters
    val rows = Seq(
      (1L, fifty + " the of"),           // passes all at minStopHits=2
      (2L, "too short the of"),          // word-count rule
      (3L, fifty + " the of ###########################"), // symbol rule
      (4L, (1 to 52).map(_ => "77").mkString(" ") + " the of"), // alpha + mean-len rules
      (5L, fifty)).toDF("doc_id", "text") // stopword rule
    val out = graft.text.Corpus.gopherQuality(rows).orderBy("doc_id").collect()
    assert(out.map(_.getAs[Int]("keep")).toSeq === Seq(1, 0, 0, 0, 0))
    val r3 = out(2)
    assert(r3.getAs[Double]("symbol_ratio") > 0.1)
    val r4 = out(3)
    assert(r4.getAs[Double]("alpha_frac") < 0.8)
    assert(out(4).getAs[Long]("n_stop") === 0L)
  }

  test("unigramLm: Laplace math exact on a tiny corpus; OOV scores lowest") {
    import spark.implicits._
    // en vocab: x:3, y:1, z:1 -> N=5, V=3; lp(x)=ln(4/8), lp(y)=lp(z)=ln(2/8),
    // OOV lp=ln(1/8); all rounded to 6dp before the per-doc mean
    val rows = Seq(
      (0L, "x x y", "en"), (1L, "x z", "en"), (2L, "q q", "de"))
      .toDF("doc_id", "text", "lang")
    val out = graft.text.Lm.unigramLm(rows, "en", headTh = -1.0, midTh = -2.0)
      .collect()
    def lp(r: org.apache.spark.sql.Row) = r.getAs[Double]("lp_per_tok")
    assert(lp(out(0)) === -0.924196) // (2*-0.693147 + -1.386294)/3
    assert(lp(out(1)) === -1.039721) // (-0.693147 + -1.386294)/2 -> middle
    assert(lp(out(2)) === -2.079442) // all-OOV -> tail
    assert(out.map(_.getAs[String]("bucket")).toSeq === Seq("head", "middle", "tail"))
  }

  test("unigramLmByLang scores each doc under its own language's model") {
    import spark.implicits._
    // 'x' dominates en, is OOV in de: the same text scores differently
    // under the two language models
    val rows = Seq(
      (0L, "x x x x", "en"), (1L, "y", "en"),
      (2L, "x x x x", "de"), (3L, "z z z", "de"))
      .toDF("doc_id", "text", "lang")
    val out = graft.text.Lm.unigramLmByLang(rows).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // en model: c(x)=4, N=5, V=2 -> lp(x)=ln(5/7) = -0.336472;
    // de model: c(x)=4, c(z)=3, N=7, V=2 -> lp(x)=ln(5/9) = -0.587787
    assert(out(0) === -0.336472)
    assert(out(2) === -0.587787)
  }

  test("dsir: k rows in key order, deterministic, weights favor the target slice") {
    val out = graft.text.Lm.dsir(docs, "en", buckets = 64, k = 20).collect()
    assert(out.length === 20)
    assert(out.map(_.getAs[Long]("rank")).toSeq === (1L to 20L))
    val keys = out.map(_.getAs[Double]("key"))
    assert(keys.zip(keys.drop(1)).forall { case (a, b) => a >= b })
    // seedless Gumbel coin: a rerun selects the identical sample
    val again = graft.text.Lm.dsir(docs, "en", buckets = 64, k = 20).collect()
    assert(out.map(_.toSeq.toList).toList === again.map(_.toSeq.toList).toList)
    // en docs are distributed closer to the en target than the corpus
    // average, so their mean log-weight must exceed the non-en mean
    val lw = graft.text.Lm.dsir(docs, "en", buckets = 64, k = 100000)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang") === "en").agg(avg("log_weight")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(lw(true) > lw(false))
  }

  test("vocabBuild: contiguous frequency-ranked ids survive multi-partition ranking") {
    import spark.implicits._
    // 400 synthetic docs so the ranked vocab spans several range
    // partitions; ids must equal the single-partition ROW_NUMBER form
    val rows = (0L until 400L).map(i =>
      (i, (0 to (i % 37).toInt).map(j => s"w${(i + j) % 53}").mkString(" ")))
      .toDF("doc_id", "text")
    val got = graft.text.Vocab.vocabBuild(rows, minCount = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val want = got.sortBy(t => (-t._3, t._2)).zipWithIndex
      .map { case ((_, tok, c), i) => (i.toLong, tok, c) }
    assert(got.sortBy(_._1).toSeq === want.toSeq)
    assert(got.map(_._1).sorted.toSeq === (0L until got.length).toSeq)
  }

  test("bpePairs counts adjacent pairs exactly, ties break lexicographically") {
    import spark.implicits._
    val rows = Seq((0L, "a b a b c"), (1L, "a b"), (2L, "c")).toDF("doc_id", "text")
    // pairs: doc0 -> "a b","b a","a b","b c"; doc1 -> "a b"; doc2 -> none
    val out = graft.text.Vocab.bpePairs(rows, k = 10).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, "a b", 3L), (2L, "b a", 1L), (3L, "b c", 1L)))
  }

  test("bpeFit learns merges in order, leftmost-nonoverlap, bounded rounds") {
    import spark.implicits._
    // classic Sennrich-style corpus: "lo" dominates round 1 (freq 5),
    // then "low" (the merged symbol re-enters pair counts)
    val rows = Seq((0L, "low low low lower lowest")).toDF("doc_id", "text")
    val out = graft.text.Vocab.bpeFit(rows, merges = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(out(0) === ((1L, "l", "o", "lo", 5L)))
    assert(out(1) === ((2L, "lo", "w", "low", 5L)))
    // round 3: pairs are {low+e:2, e+r:1, e+s:1, s+t:1} -> "lowe"
    assert(out(2) === ((3L, "low", "e", "lowe", 2L)))

    // leftmost non-overlapping merging: "aaaa" merges (a,a) into TWO
    // "aa" symbols (never the overlapping middle pair), so round 2
    // merges (aa,aa)
    val runs = Seq((0L, "aaaa")).toDF("doc_id", "text")
    val r2 = graft.text.Vocab.bpeFit(runs, merges = 2).collect()
      .map(r => (r.getLong(0), r.getString(3), r.getLong(4)))
    assert(r2.toSeq === Seq((1L, "aa", 3L), (2L, "aaaa", 1L)))
    // ("aaaa": adjacent a-a pairs = 3 before merging; after -> [aa,aa])

    // a corpus smaller than the merge budget stops early, no nulls
    val tiny = Seq((0L, "ab")).toDF("doc_id", "text")
    val r3 = graft.text.Vocab.bpeFit(tiny, merges = 5).collect()
    assert(r3.length === 1 && r3(0).getString(3) === "ab")
  }

  test("bpeFit: MaxTrainWords = Int.MaxValue must not overflow the limit sentinel") {
    import spark.implicits._
    // 'train on the full universe' setting: the +1 sentinel previously
    // overflowed to a negative .limit() (AnalysisException); the clamp
    // must make the largest settable value behave as unbounded
    val prev = graft.text.Vocab.MaxTrainWords
    try {
      graft.text.Vocab.MaxTrainWords = Int.MaxValue
      val out = graft.text.Vocab.bpeFit(
        Seq((0L, "low low lower")).toDF("doc_id", "text"), merges = 1).collect()
      assert(out.length === 1 && out(0).getString(3) === "lo")
    } finally graft.text.Vocab.MaxTrainWords = prev
  }

  test("tfidfTerms: corpus-wide terms score zero, rare terms rank first") {
    import spark.implicits._
    // 'a' in all 3 docs -> idf 0; 'b'/'c' in one -> idf ln(3)
    val rows = Seq((0L, "a b"), (1L, "a c"), (2L, "a")).toDF("doc_id", "text")
    val out = graft.text.Search.tfidfTerms(rows, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(5)))
    assert(out.toSeq === Seq(
      (0L, 1L, "b", 1.098612), (0L, 2L, "a", 0.0),
      (1L, 1L, "c", 1.098612), (1L, 2L, "a", 0.0),
      (2L, 1L, "a", 0.0)))
  }

  test("urlFilter flags blocklisted registrable domains and banned TLDs") {
    import spark.implicits._
    val docs = Seq(
      (0L, "https://en.wikipedia.org/wiki/X"),
      (1L, "https://sub.casino-wins.biz/promo"),
      (2L, "https://a.b.free-stuff.xyz/dl"),
      (3L, "http://localhost/dev")
    ).toDF("doc_id", "url")
    val blocked = Seq("casino-wins.biz").toDF("bad_domain")
    val out = graft.text.Url.urlFilter(docs, blocked, Seq("xyz")).collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getInt(4), r.getInt(5), r.getInt(6)))).toMap
    assert(out(0L) === (("wikipedia.org", 0, 0, 1)))
    assert(out(1L) === (("casino-wins.biz", 1, 0, 0))) // subdomain still caught
    assert(out(2L) === (("free-stuff.xyz", 0, 1, 0)))
    assert(out(3L) === (("localhost", 0, 0, 1)))       // single-label host
  }

  test("bigramLm: seen transitions outscore OOV; <2-token docs are omitted") {
    import spark.implicits._
    // train slice (lang=en) = docs 0 and 2: unigrams a:3 b:1 (N=4, V=2),
    // bigrams "a b","b a". doc 1 is all-OOV (pure unigram smoothing mass),
    // doc 2 has a single token -> no transitions -> omitted by contract.
    val rows = Seq(
      (0L, "a b a", "en"), (1L, "c c", "de"), (2L, "a", "en")
    ).toDF("doc_id", "text", "lang")
    val out = graft.text.Lm.bigramLm(rows).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out.keySet === Set(0L, 1L))
    assert(out(0L)._1 === 2L && out(1L)._1 === 1L)
    // doc0's transitions are both seen (ML mass dominates); doc1 gets only
    // the interpolated unigram smoothing mass ((1-0.9)*(0+1)/(4+2))
    assert(out(0L)._2 > out(1L)._2)
    assert(math.abs(out(1L)._2 - math.log(0.09999999999999998 * (1.0 / 6))) < 2e-6)
  }

  test("semDedup drops within-cluster duplicates, keeping the least-centroid-similar") {
    import spark.implicits._
    // centMod=3, centOff=0 -> centroid seeds are ids 0 and 3. Cluster A
    // (seed [1,0,0,0]): the seed itself (cent_sim 1.0), identical twins
    // 1/2 (cos(0,1)=0.994 >= eps so the seed is a dup of the twins and,
    // having the HIGHEST cent_sim, is dropped; the twins tie on cent_sim
    // so the smaller id survives), and 4 (cos to every A member < eps ->
    // kept). Cluster B mirrors with seed 3 vs member 5 (cos 0.9939).
    val vecs = Seq(
      (0L, Array(1.0f, 0f, 0f, 0f), 0),
      (1L, Array(0.9f, 0.1f, 0f, 0f), 0),
      (2L, Array(0.9f, 0.1f, 0f, 0f), 0),
      (3L, Array(0f, 1.0f, 0f, 0f), 0),
      (4L, Array(0.8f, 0f, 0.6f, 0f), 0),
      (5L, Array(0.1f, 0.9f, 0f, 0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val out = graft.sim.Ann.semDedup(vecs, 0.99, 3, 0).collect()
      .map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(out === Map(0L -> 0, 1L -> 1, 2L -> 0, 3L -> 0, 4L -> 1, 5L -> 1))
  }

  test("semDedup fail-fasts a hot cluster block (Guard.MaxPairBlockRows)") {
    import graft.util.Guard
    val e = graft.util.D.t(spark, sf, "embeddings")
    val old = Guard.MaxPairBlockRows
    try {
      Guard.MaxPairBlockRows = 3L
      val ex = intercept[Throwable](graft.sim.Ann.semDedup(e, 0.4, 25, 7).collect())
      val msgs = Iterator.iterate(ex)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
      assert(msgs.contains("pair-enumeration block"),
        s"guard error not raised / not diagnosable:\n${msgs.take(800)}")
    } finally Guard.MaxPairBlockRows = old
  }
}
