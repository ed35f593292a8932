package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Per-round benchmark main (driver contract): runs every SparkEntry query on
 * SPARK_GRAFT_SF_DIR at local[SPARK_GRAFT_CPUS], prints ONE JSON line.
 *
 * Timing forces full computation through the noop sink (a bare count() lets
 * Spark skip column evaluation via parquet count pushdown / sort elimination
 * — that would flatter every query). The flagship interleaved-docs pipeline
 * (q16 + q17) is additionally reported as docs/sec — the BASELINE.json
 * headline metric (spatial-join + tile-assignment throughput).
 */
object Bench {

  def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    // JVM/codegen warmup on the smallest sf so per-query numbers measure the
    // plan, not first-call JIT + classloading
    try force(SparkEntry.queries("q01_pricing_summary")(spark, sfDir)) catch { case _: Throwable => () }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val sec = try time(force(fn(spark, sfDir))) catch { case _: Throwable => -1.0 }
      name -> sec
    }

    // flagship docs/sec: interleaved docs -> extract -> PIP join + tiles
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val flagshipSec = time {
      force(SparkEntry.queries("q16_docs_pip")(spark, sfDir))
      force(SparkEntry.queries("q17_span_tiles")(spark, sfDir))
    }
    val docsPerSec = if (flagshipSec > 0) nDocs / flagshipSec else 0.0

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
      s""""flagship_docs_per_sec":$docsPerSec,"flagship_sec":$flagshipSec,"n_docs":$nDocs,"cpus":$cpus}""")
    spark.stop()
  }
}
