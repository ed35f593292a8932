package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the flagship pipeline's physical plan (plan audits). */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    ScalingBench.pipeline(spark, 1000000L).explain("formatted")
    spark.stop()
  }
}
