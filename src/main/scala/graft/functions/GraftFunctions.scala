package graft.functions

import org.apache.spark.sql.SparkSession

/** Registers the native expressions in the session's FunctionRegistry so
  * they are usable from `spark.sql(...)` alongside the Column API. */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val fr = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    fr.createOrReplaceTempFunction("cosine_similarity",
      exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    fr.createOrReplaceTempFunction("fixed_dot",
      exprs => FixedDot(exprs(0), exprs(1)), "built-in")
  }
}
