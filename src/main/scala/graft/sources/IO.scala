package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source/sink surface (SURVEY.md §2.8): the reference inherits pandas'
  * read_csv/read_json/to_parquet family; here the same round-trips are
  * Spark readers/writers with explicit schemas and scale-aware write
  * options (partitioning/bucketing live in util.Scale). */
object IO {

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** CSV with header; schema re-applied on read (never inferred at scale —
    * inference is a full extra pass over the data). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String, schemaOf: DataFrame): DataFrame =
    spark.read.option("header", "true").schema(schemaOf.schema).csv(path)

  /** JSON-lines round-trip (the interchange format of document pipelines). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJsonl(spark: SparkSession, path: String, schemaOf: DataFrame): DataFrame =
    spark.read.schema(schemaOf.schema).json(path)

  /** ORC round-trip (the other columnar interchange format warehouses
    * emit; same pushdown/pruning behavior as parquet in Spark). */
  def writeOrc(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
