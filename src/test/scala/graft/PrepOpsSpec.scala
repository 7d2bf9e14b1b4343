package graft

import graft.text.{Bloom, Chunk, Corpus}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 dataset-prep additions: RAG chunking, temperature mix,
  * Bloom decontamination, two-stage ANN refine. */
class PrepOpsSpec extends AnyFunSuite {
  import TestSession._

  private def docs = graft.util.D.t(spark, sf, "documents")
  private def vecs = graft.util.D.t(spark, sf, "embeddings")

  test("ragChunks covers every token exactly once per window rule") {
    val ch = Chunk.ragChunks(docs, 64, 16).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    val n = docs.select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ch.keySet === n.keySet) // chunk 0 exists for every doc
    ch.foreach { case (id, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("chunk_idx"))
      // contiguous indices from 0; starts advance by the stride
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Long]("chunk_idx") === i.toLong)
        assert(r.getAs[Long]("start_tok") === i.toLong * 48)
      }
      // full coverage: last chunk reaches the end of the doc
      val last = sorted.last
      assert(last.getAs[Long]("start_tok") + last.getAs[Long]("n_tok") === n(id))
      // no window (beyond the first) fully contained in its predecessor
      sorted.drop(1).foreach { r =>
        assert(r.getAs[Long]("start_tok") < n(id) - 16)
      }
      // every window except the last is full-size
      sorted.dropRight(1).foreach(r => assert(r.getAs[Long]("n_tok") === 64L))
    }
  }

  test("ragChunks: duplicated text yields identical chunk fingerprints") {
    val two = docs.limit(1).select(lit(1L).as("doc_id"), col("text"))
      .unionByName(docs.limit(1).select(lit(2L).as("doc_id"), col("text")))
    val fps = Chunk.ragChunks(two, 64, 16).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .map { case (id, rs) => id -> rs.sortBy(_.getAs[Long]("chunk_idx"))
        .map(_.getAs[String]("chunk_fp")).toSeq }
    assert(fps(1L) === fps(2L))
    intercept[IllegalArgumentException](Chunk.ragChunks(docs, 64, 64))
  }

  test("tempMix flattens the language distribution (tau=2)") {
    val rows = Corpus.tempMix(docs).collect()
    val shareSum = rows.map(_.getAs[Double]("share")).sum
    val tempSum = rows.map(_.getAs[Double]("temp_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-4 && math.abs(tempSum - 1.0) < 1e-4)
    // temperature UPSAMPLES below-average languages, downsamples above
    rows.foreach { r =>
      val (share, ts) = (r.getAs[Double]("share"), r.getAs[Double]("temp_share"))
      if (share < 1.0 / rows.length) assert(ts > share)
      // epochs is the with-replacement factor: temp_share/share
      assert(math.abs(r.getAs[Double]("epochs") - ts / share) < 1e-3)
    }
    intercept[IllegalArgumentException](Corpus.tempMix(docs, tau = 0.0))
  }

  test("bloom decontamination has no false negatives and labels FPs") {
    val isEval = pmod(col("doc_id"), lit(97)) === 0
    val rep = Bloom.report(docs, isEval).collect()
    // exact contaminated set (string-shingle semantics)
    val exact = Corpus.contaminated(
        docs.filter(!isEval), Corpus.evalShingleSet(docs.filter(isEval)))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val bloomTrue = rep.filter(_.getAs[Long]("n_true_hits") > 0)
      .map(_.getAs[Long]("doc_id")).toSet
    val bloomAll = rep.map(_.getAs[Long]("doc_id")).toSet
    assert(bloomTrue === exact)      // verified hits == exact semantics
    assert(exact.subsetOf(bloomAll)) // a Bloom filter never misses
    rep.foreach { r =>
      assert((r.getAs[Int]("is_fp") == 1) === (r.getAs[Long]("n_true_hits") == 0L))
      assert(r.getAs[Long]("n_bloom_hits") >= r.getAs[Long]("n_true_hits"))
    }
    // the bitmap folds to one fixed-size row regardless of eval size
    val bm = Bloom.bitmap(docs.filter(isEval)).collect()
    assert(bm.length === 1 &&
      bm.head.getSeq[Long](0).length === Bloom.DefaultBits / 64)
  }

  test("two-stage refine equals brute force when coarseC covers everything") {
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("rank"), r.getAs[Long]("neighbor_id"))
    val brute = graft.sim.Ann.bruteTopK(vecs, 40, 5)
      .select("query_id", "rank", "neighbor_id").collect().map(key).toSet
    val wide = graft.sim.Refine.twoStageTopK(vecs, 40, 1000000, 5)
      .select("query_id", "rank", "neighbor_id").collect().map(key).toSet
    assert(wide === brute)
    // the narrow coarse stage still returns a full k per query
    val narrow = graft.sim.Refine.twoStageTopK(vecs, 40, 20, 5).collect()
    val perQ = narrow.groupBy(_.getAs[Long]("query_id")).values
    assert(perQ.forall(_.length == 5))
    assert(narrow.length === brute.size)
    intercept[IllegalArgumentException](graft.sim.Refine.twoStageTopK(vecs, 40, 3, 5))
  }

  test("IVF-PQ serving equals flat ADC at full probe; probed form stays ranked") {
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("rank"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("adc_dist"))
    // nprobe >= K: every list is probed, so the candidate set is the
    // whole corpus minus self — IVF-PQ must equal flat ADC bit-for-bit
    val flat = graft.sim.Quantize.adcTopK(vecs, 8, 125, 7, 40, 5)
      .collect().map(key).toSet
    val full = graft.sim.Quantize.adcTopKIvf(vecs, 8, 125, 7, 25, 7, 40, 1000000, 5)
      .collect().map(key).toSet
    assert(full === flat)
    // the probed form returns ranked contiguous results per query
    val probed = graft.sim.Quantize.adcTopKIvf(vecs, 8, 125, 7, 25, 7, 40, 3, 5).collect()
    val perQ = probed.groupBy(_.getAs[Long]("query_id")).values
    assert(perQ.forall(rs => rs.map(_.getAs[Long]("rank")).sorted.toSeq ==
      (1L to rs.length).toSeq))
    assert(probed.nonEmpty)
  }

  test("snapshotDiff classifies added/removed/changed/unchanged exactly") {
    import spark.implicits._
    val v1 = Seq((1L, "a b c"), (2L, "d e"), (3L, "f g h i")).toDF("doc_id", "text")
    val v2 = Seq((2L, "d e"), (3L, "f g CHANGED"), (4L, "new doc here")).toDF("doc_id", "text")
    val out = Corpus.snapshotDiff(v1, v2).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map(
      "added" -> ((1L, 3L)),      // doc 4: 3 tokens from v2
      "removed" -> ((1L, 3L)),    // doc 1: 3 tokens from v1
      "changed" -> ((1L, 3L)),    // doc 3: token count from the NEW side
      "unchanged" -> ((1L, 2L))))
  }
}
