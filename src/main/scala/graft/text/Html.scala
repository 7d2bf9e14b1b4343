package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** HTML boilerplate stripping: the extraction step between a raw web
  * crawl and every text operator in this library (CCNet / RefinedWeb
  * pipelines run trafilatura-class extraction first; this is the
  * deterministic, regex-staged core of that step). Reference scope:
  * pd_explain has no extraction stage — text arrives pre-cleaned; this
  * extends the corpus family the way production crawls need.
  *
  * Staged like [[Corpus.piiScrub]]: block-level boilerplate elements
  * (script/nav/ads/footer) are dropped WITH their inner text first,
  * then remaining markup is unwrapped (tags removed, entities
  * decoded), then whitespace introduced by removal collapses. Every
  * stage is a codegen'd regexp over the row — scan-local, zero
  * shuffles, embarrassingly parallel at any corpus size. Patterns stay
  * in the syntax intersection of Java regex and RE2 (no backrefs, no
  * lookaround) so the DuckDB mirror matches byte-for-byte; the
  * non-greedy `.*?` spans rely on boilerplate blocks being
  * newline-free (true for attribute-free generator markup; a crawl
  * with multi-line blocks would switch these to `(?s)` spans).
  */
object Html {

  // block elements whose CONTENT is boilerplate: removed text and all
  private val BlockRe = "<(script|style|nav|footer|aside)>.*?</(script|style|nav|footer|aside)>"
  private val AdRe = "<div class=\"ad\">.*?</div>"
  private val TagRe = "<[^>]*>"

  private def decode(c: Column): Column = {
    // &amp; LAST: decoding it first would re-activate double-escaped
    // entities (&amp;lt; must yield &lt; the TEXT, not <)
    val e = Seq("&lt;" -> "<", "&gt;" -> ">", "&copy;" -> "(c)",
      "&nbsp;" -> " ", "&amp;" -> "&")
    e.foldLeft(c) { case (acc, (k, v)) => regexp_replace(acc, k, v) }
  }

  /** Strip markup from `textCol`, returning the frame with the column
    * replaced by extracted text plus `n_tags` (markup elements seen —
    * the boilerplate-density signal quality filters threshold on). */
  def strip(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, BlockRe, " ")
    val t2 = regexp_replace(t1, AdRe, " ")
    val t3 = regexp_replace(t2, TagRe, " ")
    val t4 = trim(regexp_replace(decode(t3), "  +", " "))
    docs.withColumn("n_tags", regexp_count(t0, lit(TagRe)).cast(LongType))
      .withColumn(textCol, t4)
  }

  /** DuckDB mirror of [[strip]] + fingerprint projection: emits
    * (doc_id, n_tags, len_raw, len_clean, clean_fp) — the fingerprint
    * pins extraction parity byte-for-byte, the lengths pin the
    * boilerplate fraction. `table` is any expression with
    * doc_id + text. */
  def stripSql(table: String): String = {
    val decodes = Seq("&lt;" -> "<", "&gt;" -> ">", "&copy;" -> "(c)",
      "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft("t3") { case (acc, (k, v)) =>
        s"regexp_replace($acc, '$k', '$v', 'g')" }
    s"""SELECT doc_id,
       |  CAST(len(regexp_extract_all(t0, '$TagRe')) AS BIGINT) AS n_tags,
       |  CAST(len(t0) AS BIGINT) AS len_raw,
       |  CAST(len(t4) AS BIGINT) AS len_clean,
       |  md5(t4) AS clean_fp
       |FROM (SELECT doc_id, t0,
       |    trim(regexp_replace($decodes, '  +', ' ', 'g')) AS t4
       |  FROM (SELECT doc_id, t0,
       |      regexp_replace(regexp_replace(regexp_replace(t0,
       |        '$BlockRe', ' ', 'g'), '$AdRe', ' ', 'g'), '$TagRe', ' ', 'g') AS t3
       |    FROM (SELECT doc_id, text AS t0 FROM $table)))""".stripMargin
  }
}
