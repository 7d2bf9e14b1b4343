package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{IO, Layout}

/** The SEVENTH degenerate pin: the source/sink + layout surface. The
  * text formats are where silent corruption hides — a same-JVM
  * round-trip test passes even when the bytes on disk are wrong,
  * because reader and writer mangle identically. This pin inspects the
  * RAW bytes where that matters and pins the fail-loud classes.
  *
  * This pin's first run caught, all measured before the fix:
  *  - non-ASCII data written as '?' (two stacked causes: scalac had no
  *    -encoding so UTF-8 source literals were mangled AT COMPILE TIME
  *    by the container's ASCII platform charset, and the CSV writer
  *    consulted the same platform default at runtime);
  *  - an embedded-newline record silently splitting into TWO rows
  *    under the default PERMISSIVE read — one row carrying truncated
  *    DATA (`"with"`), one all-null;
  *  - the empty string conflated with NULL on CSV read-back;
  *  - a binary column CSV-"round-tripping" as the bytes of its
  *    toString rendering (`[01 02 03]`).
  */
class IoDirtySpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  // non-ASCII via escapes so the assertion is independent of source
  // encoding: "ünïcode€" + a CJK char
  private val uni = "ünïcode€中"

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  private def rawLines(dir: String, suffix: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.list(java.nio.file.Paths.get(dir)).iterator().asScala
      .filter(_.toString.endsWith(suffix)).toSeq.sortBy(_.toString)
      .flatMap(p => new String(java.nio.file.Files.readAllBytes(p),
        java.nio.charset.StandardCharsets.UTF_8).split("\n", -1).toSeq.filter(_.nonEmpty))
  }

  test("csv round-trip preserves NULL vs empty vs quotes vs non-ASCII — byte-checked on disk") {
    val base = Seq((1L, "plain"), (2L, null.asInstanceOf[String]), (3L, ""),
      (4L, "comma,quote\"inside"), (5L, uni)).toDF("id", "s")
    val dir = tmp("io_csv")
    IO.writeCsv(base, dir)
    // the on-disk bytes must carry the real UTF-8 characters, the \N
    // null sentinel, and a quoted empty string — not the platform
    // charset's '?' or a bare empty field
    val raw = rawLines(dir, ".csv")
    assert(raw.exists(_.contains(uni)), s"non-ASCII mangled on disk: $raw")
    assert(raw.exists(_.endsWith("\\N")), s"null sentinel missing: $raw")
    assert(raw.exists(_.endsWith("\"\"")), s"quoted empty missing: $raw")
    val back = IO.readCsv(spark, dir, base).orderBy("id").collect()
    assert(back.length === 5)
    assert(back(1).isNullAt(1), "NULL must read back as NULL")
    assert(back(2).getString(1) === "", "empty string must stay empty, not NULL")
    assert(back(3).getString(1) === "comma,quote\"inside")
    assert(back(4).getString(1) === uni)
  }

  test("csv embedded newline FAILS LOUD by default and round-trips under multiLine") {
    val nl = Seq((6L, "with\nnewline")).toDF("id", "s")
    val dir = tmp("io_csv_nl")
    IO.writeCsv(nl, dir)
    // the default split-parallel read cannot parse a quoted newline:
    // FAILFAST raises (before this pin, PERMISSIVE silently emitted a
    // truncated-data row plus a null row)
    val ex = intercept[Exception](IO.readCsv(spark, dir, nl).collect())
    var c: Throwable = ex
    var found = false
    while (!found && c != null) {
      found = Option(c.getMessage).exists(m =>
        m.contains("MALFORMED_RECORD_IN_PARSING") || m.contains("FAILED_READ_FILE"))
      c = if (c.getCause != c) c.getCause else null
    }
    assert(found, s"expected a loud malformed-record error, got: ${ex.getMessage.take(200)}")
    // the documented opt-in round-trips it exactly
    val back = IO.readCsv(spark, dir, nl, multiLine = true).collect()
    assert(back.length === 1 && back(0).getString(1) === "with\nnewline")
  }

  test("csv refuses binary columns loudly; orc round-trips them exactly") {
    val bin = Seq((1L, Array[Byte](0, 1, -128, 127))).toDF("id", "b")
    val m = intercept[IllegalArgumentException](IO.writeCsv(bin, tmp("io_csv_bin"))).getMessage
    assert(m.contains("cannot round-trip through CSV"))
    val dir = tmp("io_orc_bin")
    IO.writeOrc(bin, dir)
    val back = IO.readOrc(spark, dir).collect()
    assert(back(0).getAs[Array[Byte]]("b").toSeq === Seq[Byte](0, 1, -128, 127))
  }

  test("jsonl round-trips NaN/±Inf/null/empty/non-ASCII exactly") {
    val base = Seq(
      (1L, java.lang.Double.valueOf(1.5), "plain"),
      (2L, java.lang.Double.valueOf(Double.NaN), null.asInstanceOf[String]),
      (3L, java.lang.Double.valueOf(Double.PositiveInfinity), ""),
      (4L, java.lang.Double.valueOf(Double.NegativeInfinity), uni),
      (5L, null.asInstanceOf[java.lang.Double], "x")).toDF("id", "v", "s")
    val dir = tmp("io_jsonl")
    IO.writeJsonl(base, dir)
    assert(rawLines(dir, ".json").exists(_.contains(uni)), "non-ASCII mangled in JSONL")
    val back = IO.readJsonl(spark, dir, base).orderBy("id").collect()
    assert(back(1).getDouble(1).isNaN && back(1).isNullAt(2))
    assert(back(2).getDouble(1).isPosInfinity && back(2).getString(2) === "")
    assert(back(3).getDouble(1).isNegInfinity && back(3).getString(2) === uni)
    assert(back(4).isNullAt(1) && back(4).getString(2) === "x")
  }

  test("zorderBy survives null keys, Long-extreme domains, all-equal domains, " +
    "more partitions than rows, and empty input — row-preserving every time") {
    val mixed = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 10L), (null, 20L), (Long.MaxValue, Long.MinValue), (-5L, null))
      .toDF("x", "y")
    // null keys: norm/zvalue yield null z; repartitionByRange sorts
    // nulls first — rows preserved, never dropped or crashed
    assert(Layout.zorderBy(mixed, col("x"), col("y"), 2).count() === 4L)
    // full-Long domain takes the double-quantized branch (the exact
    // multiply would overflow; under ANSI even (c - lo) throws)
    val wide = Seq((Long.MinValue, 0L), (0L, 5L), (Long.MaxValue, 9L)).toDF("x", "y")
    assert(Layout.zorderBy(wide, col("x"), col("y"), 2).count() === 3L)
    val allEq = Seq((7L, 7L), (7L, 7L)).toDF("x", "y")
    assert(Layout.zorderBy(allEq, col("x"), col("y"), 2).count() === 2L)
    val tiny = Seq((1L, 2L), (3L, 4L)).toDF("x", "y")
    assert(Layout.zorderBy(tiny, col("x"), col("y"), 10).count() === 2L)
    val empty = Seq.empty[(Long, Long)].toDF("x", "y")
    assert(Layout.zorderBy(empty, col("x"), col("y"), 3).count() === 0L)
  }

  test("zvalue on a non-numeric key fails loud with the ANSI cast error, never a garbage code") {
    val d = Seq(("abc", 1L)).toDF("x", "y")
    val ex = intercept[Exception](d.select(Layout.zvalue(col("x"), col("y"))).collect())
    var c: Throwable = ex
    var found = false
    while (!found && c != null) {
      found = Option(c.getMessage).exists(_.contains("CAST_INVALID_INPUT"))
      c = if (c.getCause != c) c.getCause else null
    }
    assert(found, s"expected CAST_INVALID_INPUT, got: ${ex.getMessage.take(200)}")
  }

  test("rowGroupStats fails loud on a corrupt parquet file and ignores non-parquet junk") {
    val dir = java.nio.file.Files.createTempDirectory("io_rgs")
    // a real parquet file next to junk: the junk is ignored by extension
    Seq((1L, 2L)).toDF("x", "y").coalesce(1)
      .write.mode("overwrite").parquet(dir.toString + "/good")
    import scala.jdk.CollectionConverters._
    val part = java.nio.file.Files.list(dir.resolve("good")).iterator().asScala
      .find(_.toString.endsWith(".parquet")).get
    java.nio.file.Files.copy(part, dir.resolve("data.parquet"))
    java.nio.file.Files.write(dir.resolve("notes.txt"), "junk".getBytes)
    val ok = Layout.rowGroupStats(spark, dir.toString, Seq("x")).collect()
    assert(ok.nonEmpty && ok.forall(_.getString(0) == "data.parquet"))
    // a truncated/corrupt .parquet file raises parquet's own named
    // error — never a silent zero-row result
    val bad = java.nio.file.Files.createTempDirectory("io_rgs_bad")
    java.nio.file.Files.write(bad.resolve("junk.parquet"),
      Array[Byte](80, 65, 82, 49, 0, 1, 2, 3))
    val m = intercept[RuntimeException](
      Layout.rowGroupStats(spark, bad.toString, Seq("x")).collect()).getMessage
    assert(m.contains("not a Parquet file"), s"got: $m")
  }
}
