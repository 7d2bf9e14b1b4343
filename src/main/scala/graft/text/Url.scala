package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** URL / domain filtering — the C4-style provenance filter (Raffel et
  * al. 2020 filter badlisted domains; RefinedWeb's URL filtering is the
  * first stage of its pipeline). Operates on a `url` column: extract
  * host → registrable domain (last two labels) → TLD, then flag docs
  * whose registrable domain is on a blocklist or whose TLD is banned.
  *
  * Scale (100 TB): host/domain/TLD extraction is scan-local string
  * work (codegen'd regexp + split, no shuffle); the domain blocklist
  * is a broadcast join (real blocklists are 10^5-10^6 rows — MBs, far
  * under the broadcast threshold, and a list that outgrows broadcast
  * degrades gracefully to a shuffle join by dropping the hint); the
  * TLD ban list is a literal IN. No corpus shuffle anywhere — the
  * output preserves the input partitioning for downstream stages.
  *
  * Registrable domain: public-suffix-aware last labels — when the
  * host's last two labels form a multi-label public suffix (co.uk,
  * com.au, …, from the embedded [[PslTwoLabel]] excerpt of the
  * public-suffix list) the registrable domain is the last THREE
  * labels (news.example.co.uk → example.co.uk); otherwise the last
  * two. The full PSL table (~10^4 rows, broadcastable) swaps in for
  * the excerpt in production without changing the shape.
  */
object Url {

  def hostOf(url: Column): Column =
    regexp_extract(url, "^[a-z]+://([^/]+)", 1)

  /** Embedded excerpt of the multi-label public-suffix list: a
    * two-label suffix here means the registrable domain needs three
    * labels. Deterministic, identical in both engines. */
  val PslTwoLabel: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "com.tr", "com.ar", "co.za")

  /** Public-suffix-aware registrable domain: last three labels when
    * the last two are a [[PslTwoLabel]] public suffix and a third
    * exists; else last two; the host itself when it has fewer. */
  def regDomainOf(host: Column): Column = {
    val parts = split(host, "\\.")
    val lastTwo = concat_ws(".", slice(parts, -2, 2))
    when(size(parts) >= 3 && lastTwo.isin(PslTwoLabel: _*),
        concat_ws(".", slice(parts, -3, 3)))
      .when(size(parts) >= 2, lastTwo)
      .otherwise(host)
  }

  /** DuckDB mirror of [[regDomainOf]] over a host expression. */
  def regDomainSql(host: String): String = {
    val psl = PslTwoLabel.map(s => s"'$s'").mkString(", ")
    s"""CASE WHEN len(string_split($host, '.')) >= 3
       |       AND array_to_string(string_split($host, '.')[-2:], '.') IN ($psl)
       |    THEN array_to_string(string_split($host, '.')[-3:], '.')
       |    WHEN len(string_split($host, '.')) >= 2
       |    THEN array_to_string(string_split($host, '.')[-2:], '.')
       |    ELSE $host END""".stripMargin.replaceAll("\\s+", " ").trim
  }

  def tldOf(host: Column): Column = element_at(split(host, "\\."), -1)

  /** Per-doc URL-filter report: (doc_id, host, reg_domain, tld,
    * blocked_domain INT, blocked_tld INT, keep INT) ordered by doc_id.
    * `docs` needs (doc_id, url); `blocked` needs (bad_domain) —
    * registrable domains to ban. */
  def urlFilter(docs: DataFrame, blocked: DataFrame,
                blockedTlds: Seq[String]): DataFrame = {
    val base = docs
      .withColumn("host", hostOf(col("url")))
      .withColumn("reg_domain", regDomainOf(col("host")))
      .withColumn("tld", tldOf(col("host")))
    base
      .join(broadcast(blocked), col("reg_domain") === col("bad_domain"), "left")
      .withColumn("blocked_domain",
        when(col("bad_domain").isNotNull, 1).otherwise(0).cast(IntegerType))
      .withColumn("blocked_tld",
        when(col("tld").isin(blockedTlds: _*), 1).otherwise(0).cast(IntegerType))
      .select(col("doc_id"), col("host"), col("reg_domain"), col("tld"),
        col("blocked_domain"), col("blocked_tld"),
        when(col("blocked_domain") === 0 && col("blocked_tld") === 0, 1)
          .otherwise(0).cast(IntegerType).as("keep"))
      .orderBy("doc_id")
  }

  /** DuckDB mirror of [[urlFilter]]. `table` must expose (doc_id, url);
    * `blockedValues` mirrors the blocklist frame as an inline VALUES
    * relation. */
  def urlFilterSql(table: String, blockedValues: Seq[String],
                   blockedTlds: Seq[String]): String = {
    val bv = blockedValues.map(d => s"('$d')").mkString(", ")
    val tlds = blockedTlds.map(t => s"'$t'").mkString(", ")
    s"""WITH b AS (SELECT * FROM (VALUES $bv) AS t(bad_domain)),
       |base AS (SELECT doc_id,
       |    regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host
       |  FROM $table),
       |parts AS (SELECT doc_id, host,
       |    ${regDomainSql("host")} AS reg_domain,
       |    string_split(host, '.')[-1] AS tld
       |  FROM base),
       |flagged AS (SELECT p.doc_id, p.host, p.reg_domain, p.tld,
       |    CAST(CASE WHEN b.bad_domain IS NOT NULL THEN 1 ELSE 0 END AS INT) AS blocked_domain,
       |    CAST(CASE WHEN p.tld IN ($tlds) THEN 1 ELSE 0 END AS INT) AS blocked_tld
       |  FROM parts p LEFT JOIN b ON p.reg_domain = b.bad_domain)
       |SELECT doc_id, host, reg_domain, tld, blocked_domain, blocked_tld,
       |  CAST(CASE WHEN blocked_domain = 0 AND blocked_tld = 0 THEN 1 ELSE 0 END AS INT) AS keep
       |FROM flagged ORDER BY doc_id""".stripMargin
  }

  /** URL canonicalization — the dedup key for the crawl-level first
    * pass (CCNet/RefinedWeb dedup by URL before ever touching text):
    * lowercase, strip the fragment, strip tracking query params
    * (utm_*, ref, fbclid, gclid), drop dangling ?/& and the trailing
    * slash. Lowercasing runs FIRST so uppercase tracking keys are
    * caught too. Entirely scan-local codegen'd regexp work. */
  def canonicalize(url: Column): Column = {
    val lowered = lower(url)
    val noFrag = regexp_replace(lowered, "#.*", "")
    val noTrack = regexp_replace(noFrag, "(utm_[a-z]+|ref|fbclid|gclid)=[^&]*&?", "")
    val noDangle = regexp_replace(noTrack, "[?&]+$", "")
    regexp_replace(noDangle, "/$", "")
  }

  /** DuckDB mirror of [[canonicalize]] (DuckDB regexp_replace needs the
    * explicit 'g' flag to match Spark's replace-all default). */
  def canonicalizeSql(u: String): String =
    s"regexp_replace(regexp_replace(regexp_replace(regexp_replace(lower($u), " +
      "'#.*', '', 'g'), '(utm_[a-z]+|ref|fbclid|gclid)=[^&]*&?', '', 'g'), " +
      "'[?&]+$', '', 'g'), '/$', '', 'g')"

  /** Crawl-level URL dedup report: per canonical URL the total docs,
    * distinct raw spellings collapsed, and the kept doc (min doc_id —
    * the [[graft.dedup.Dedup.exactGroups]] survivor rule). Scale:
    * canonicalization is scan-local; the only shuffle is the ONE
    * map-side-combined group on the canonical key — the exact-dedup
    * shape, linear at any corpus size. */
  def urlDedup(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), canonicalize(col("url")).as("canonical_url"), col("url"))
      .groupBy("canonical_url")
      .agg(count(lit(1)).cast(LongType).as("n_docs"),
        countDistinct(col("url")).cast(LongType).as("n_raw_forms"),
        min(col("doc_id")).as("keep_doc_id"))
      .orderBy("canonical_url")

  /** DuckDB mirror of [[urlDedup]]; `table` must expose (doc_id, url). */
  def urlDedupSql(table: String): String =
    s"""SELECT ${canonicalizeSql("url")} AS canonical_url,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(COUNT(DISTINCT url) AS BIGINT) AS n_raw_forms,
       |  MIN(doc_id) AS keep_doc_id
       |FROM $table GROUP BY 1 ORDER BY canonical_url""".stripMargin
}
