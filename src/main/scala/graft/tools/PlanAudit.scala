package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Plan audit over every SparkEntry query: one line per query with shuffle
 * (Exchange) count, join strategies, and scan column width — the "is this
 * the plan you'd want at 100 TB" check. Run:
 *   sbt "runMain graft.tools.PlanAudit [sfDir]"
 */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        val plan = df.queryExecution.executedPlan.toString()
        def n(s: String) = s.r.findAllIn(plan).length
        val flags = Seq(
          if (n("CartesianProduct") > 0) Some("CARTESIAN") else None,
          if (n("BroadcastNestedLoopJoin") > 0) Some("BNLJ") else None).flatten
        println(f"$name%-28s exch=${n("Exchange")}%2d bhj=${n("BroadcastHashJoin")} smj=${n("SortMergeJoin")} wsc=${n("\\*\\(\\d+\\)")} ${flags.mkString(",")}")
      } catch { case e: Throwable => println(f"$name%-28s PLAN-ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
