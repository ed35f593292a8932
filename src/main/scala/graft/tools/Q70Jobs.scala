package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev probe: per-job wall breakdown of q70 (job boundaries identify the
  * traversal's phases: parse checkpoint, collections, label rounds, final). */
object Q70Jobs {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        starts.put(e.jobId, (e.time, String.valueOf(e.properties.getProperty("spark.job.description"))))
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val s = starts.get(e.jobId)
        if (s != null) lines.add(f"job ${e.jobId}%3d  ${(e.time - s._1) / 1000.0}%6.2f s  ${s._2}")
      }
    })
    val fn = graft.SparkEntry.queries("q70_stac_traversal")
    graft.Bench.force(fn(spark, "/root/testdata/sf0.001")); graft.Bench.cleanup(spark)
    lines.clear()
    val t0 = System.nanoTime()
    graft.Bench.force(fn(spark, "/root/testdata/sf0.1"))
    println(f"[q70jobs] total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    Thread.sleep(300)
    lines.forEach(l => println("[q70jobs] " + l))
    spark.stop()
  }
}
