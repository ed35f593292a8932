package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/**
 * Dev tool (optimization rounds): dump `.explain("formatted")` for named
 * SparkEntry queries to files — the before/after plan evidence committed
 * under plans/rNN/. Run:
 *   sbt "runMain graft.tools.PlanDump <outDir> <suffix> <query...>"
 * writes <outDir>/<qNN>_<suffix>.txt for each query (short qNN key).
 */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val df = fn(spark, dir)
      // formatted explain of the analyzed/optimized plan, pre-execution
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val short = { val i = name.indexOf('_'); if (i > 0) name.substring(0, i) else name }
      Files.writeString(Paths.get(outDir, s"${short}_$suffix.txt"), txt)
      println(s"wrote ${short}_$suffix.txt (${txt.length} chars)")
      graft.Bench.cleanup(spark)
    }
    spark.stop()
  }
}
