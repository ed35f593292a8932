package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/**
 * Dev probe (optimization rounds): wall vs summed-job time for named
 * SparkEntry queries — the difference is driver-side planning/scheduling
 * gaps (guide §7.3), the signature that led to the q70 page-chain fix.
 * Run: sbt "runMain graft.tools.JobGaps <query> [query...]"
 */
object JobGaps {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else Seq("q70_stac_traversal")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobMs = new java.util.concurrent.atomic.AtomicLong()
    val jobN = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = starts.put(e.jobId, e.time)
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val s = starts.get(e.jobId)
        if (s != null) { jobMs.addAndGet(e.time - s); jobN.incrementAndGet() }
      }
    })
    names.foreach { n =>
      try graft.Bench.force(graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001"))
      catch { case t: Throwable => System.err.println(s"[gaps] warmup $n: $t") }
      graft.Bench.cleanup(spark)
    }
    names.foreach { n =>
      (1 to 2).foreach { rep =>
        jobMs.set(0); jobN.set(0)
        val t0 = System.nanoTime()
        graft.Bench.force(graft.SparkEntry.queries(n)(spark, sfDir))
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200)
        println(f"[gaps] $n%-28s rep$rep wall=$wall%6.2f jobs=${jobN.get()}%3d " +
          f"job_sec=${jobMs.get() / 1000.0}%6.2f driver_gap=${wall - jobMs.get() / 1000.0}%6.2f")
        graft.Bench.cleanup(spark)
      }
    }
    spark.stop()
  }
}
