package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Dev benchmark for optimization iteration (guide §1.4): times NAMED
 * SparkEntry queries through the noop sink, several reps each, after one
 * warmup pass at the smallest scale — so a single query's change can be
 * measured in ~30 s instead of re-running the full 108-query bench.
 * The official record stays `graft.Bench` (frozen); numbers cited from this
 * tool in OPTIMIZATION notes are labeled as such. Run:
 *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.BenchExtra q76_neardup_clusters ..."
 */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else Seq("q16_docs_pip")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val warmDir = {
      val small = new java.io.File(sfDir).getParent + "/sf0.001"
      if (new java.io.File(small).isDirectory) small else sfDir
    }
    names.foreach { n =>
      try graft.Bench.force(graft.SparkEntry.queries(n)(spark, warmDir))
      catch { case t: Throwable => System.err.println(s"[extra] warmup $n: $t") }
      graft.Bench.cleanup(spark)
    }
    val out = names.map { n =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        graft.Bench.force(graft.SparkEntry.queries(n)(spark, sfDir))
        val s = (System.nanoTime() - t0) / 1e9
        graft.Bench.cleanup(spark)
        s
      }
      val best = times.min
      println(f"[extra] $n%-28s best=$best%6.2f  all=${times.map(t => f"$t%.2f").mkString(",")}")
      n -> best
    }
    println("[extra] total-best " + f"${out.map(_._2).sum}%.2f over ${out.size} queries")
    spark.stop()
  }
}
