package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Dev probe (optimization rounds, guide §1.4): time q37's phases in
 * isolation — tokenize+checkpoint, band signatures+checkpoint, capped
 * bucket pairs, refine join — each through the noop sink or the checkpoint
 * barrier it really pays, so the 36 task-sec the full bench charges to q37
 * can be attributed to a phase before anything is changed. Numbers cited
 * in OPTIMIZATION_r06.md are labeled as coming from this probe.
 */
object Q37Phases {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-q37-phases")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def time(tag: String)(body: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"[q37phase] $tag%-28s best=${ts.min}%6.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    // phase 1: widened scan + tokenize (sort_array(array_distinct(split)))
    val raw = graft.api.Inputs.parquet(spark, s"$sfDir/documents.parquet")
    time("scan_only") { noop(raw.select($"doc_id", $"text")) }
    val tok = raw.select($"doc_id",
      sort_array(array_distinct(split($"text", " "))).as("tset"))
    time("tokenize") { noop(tok) }

    // phase 2: band signatures from a checkpointed tset table
    val docs = tok.localCheckpoint(true)
    val bandSigs = (0 until 4).map { band =>
      struct(lit(band).as("band"),
             graft.functions.GraftFunctions.minhash_band_sig($"tset", lit(band)).as("sig"))
    }
    val sigsDf = docs.select($"doc_id", explode(array(bandSigs: _*)).as("bs"))
      .select($"doc_id", $"bs.band".as("band"), $"bs.sig".as("sig"))
    time("band_sigs") { noop(sigsDf) }

    // phase 3: capped bucket pairs from a checkpointed signature table
    val sigs = sigsDf.localCheckpoint(true)
    val cand = graft.operators.BucketedSelfJoin.pairs(
      sigs, Seq("band", "sig"), "doc_id", 100, "q37probe")
    time("bucket_pairs") { noop(cand) }

    // phase 4: refine join + merge-walk jaccard from checkpointed pairs
    val candC = cand.select($"doc_a", $"doc_b").localCheckpoint(true)
    val refined = candC
      .join(docs.select($"doc_id".as("doc_a"), $"tset".as("ta")), "doc_a")
      .join(docs.select($"doc_id".as("doc_b"), $"tset".as("tb")), "doc_b")
      .withColumn("jac", graft.functions.GraftFunctions.jaccard_sorted($"ta", $"tb"))
      .filter($"jac" >= 0.9)
      .select($"doc_a", $"doc_b", round($"jac", 6).as("jaccard"))
    time("refine_join") { noop(refined) }

    // the checkpoint barriers themselves (what the query really pays once)
    time("checkpoint_tok") { tok.localCheckpoint(true).count() }

    spark.stop()
  }
}
