package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: phase timing for q76 (pairs -> CC -> final assembly). */
object Q76Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.log4j.Logger.getLogger("graft.operators").setLevel(org.apache.log4j.Level.INFO)

    def t[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"[probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    // warmup
    graft.Bench.force(graft.SparkEntry.queries("q76_neardup_clusters")(spark, "/root/testdata/sf0.001"))
    graft.Bench.cleanup(spark)

    (1 to 2).foreach { _ =>
      val pairsFn = graft.SparkEntry.queries("q37_jaccard_neardup")
      val pairs = t("pairs (q37 pipeline)") {
        val df = pairsFn(spark, dir).select(col("doc_a"), col("doc_b")).localCheckpoint(true)
        df
      }
      val comp = t("CC minLabel") {
        val c = graft.operators.ConnectedComponents
          .minLabel(pairs, "doc_a", "doc_b", edgesDistinct = true)
        c.count(); c
      }
      t("final assembly") {
        val compR = comp.withColumnRenamed("id", "doc_id")
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col("cluster_id"))
        val out = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"))
          .join(compR.withColumnRenamed("lbl", "cluster_id"), Seq("doc_id"), "left")
          .select(col("doc_id"), coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
          .withColumn("cluster_size", count(lit(1)).over(w))
          .withColumn("is_keeper", col("doc_id") === col("cluster_id"))
        graft.Bench.force(out)
      }
      graft.Bench.cleanup(spark)
    }
    spark.stop()
  }
}
