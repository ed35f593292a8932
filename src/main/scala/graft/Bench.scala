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
 *
 * Warmup: every query runs once at the SMALLEST testdata scale before any
 * measurement, so the measured pass times the PLAN (JIT-compiled, codegen
 * cache warm) rather than first-call classloading — one-shot cold numbers
 * vary 3-5x on codegen-heavy plans and made earlier rounds' BENCH.md
 * irreproducible. Failures are never silent: a failed query records -1 in
 * "queries", lands in "errors" with its exception, and prints a full stack
 * to stderr.
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

    // JVM/codegen warmup: every query once at the smallest scale (falls back
    // to the bench scale if no sibling sf dir exists). Warmup failures are
    // reported but don't abort — the measured pass decides.
    val warmDir = {
      val small = new java.io.File(sfDir).getParent + "/sf0.001"
      if (new java.io.File(small).isDirectory) small else sfDir
    }
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try force(fn(spark, warmDir))
      catch { case t: Throwable =>
        System.err.println(s"[bench] warmup $name failed: $t")
      }
    }

    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val sec = try time(force(fn(spark, sfDir))) catch {
        case t: Throwable =>
          errors(name) = t.toString.take(300)
          System.err.println(s"[bench] $name FAILED:")
          t.printStackTrace()
          -1.0
      }
      name -> sec
    }

    // flagship docs/sec: interleaved docs -> extract -> PIP join + tiles
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val flagshipSec = time {
      force(SparkEntry.queries("q16_docs_pip")(spark, sfDir))
      force(SparkEntry.queries("q17_span_tiles")(spark, sfDir))
    }
    val docsPerSec = if (flagshipSec > 0) nDocs / flagshipSec else 0.0

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val qs = results.map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,""" +
      s""""sf":"$sfDir","flagship_docs_per_sec":$docsPerSec,"flagship_sec":$flagshipSec,""" +
      s""""n_docs":$nDocs,"cpus":$cpus,"warmup_dir":"$warmDir"}""")
    spark.stop()
  }
}
