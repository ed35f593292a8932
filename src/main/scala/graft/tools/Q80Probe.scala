package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: phase timing for q80 (flow dirs -> closure -> final). */
object Q80Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"[probe] $tag%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    graft.Bench.force(graft.SparkEntry.queries("q80_flow_accumulation")(spark, "/root/testdata/sf0.001"))
    graft.Bench.cleanup(spark)
    (1 to 2).foreach { _ =>
      // mirror the q80 body with phase timings
      val q79 = graft.SparkEntry.queries("q79_flow_direction")
      val dirs = t("flowDirRows+ckpt") {
        q79(spark, "/root/testdata/sf0.1").localCheckpoint(true)
      }
      val H = 80
      val dxs = typedLit(Seq(1L, 1L, 0L, -1L, -1L, -1L, 0L, 1L))
      val dys = typedLit(Seq(0L, 1L, 1L, 1L, 0L, -1L, -1L, -1L))
      val edges = dirs.filter($"dir" >= 1)
        .select(($"cx" * H + $"cy").as("u"),
                (($"cx" + element_at(dxs, $"dir".cast("int"))) * H
                  + ($"cy" + element_at(dys, $"dir".cast("int")))).as("v"))
      val closure = t("ancestorPairs") {
        val c = graft.operators.FunctionalClosure.ancestorPairs(edges, "u", "v")
        println(s"[probe]   pairs=${c.count()}")
        c
      }
      t("final") {
        val acc = closure.groupBy($"v").agg(count(lit(1)).as("n_up"))
        graft.Bench.force(
          dirs.join(acc, ($"cx" * H + $"cy") === $"v", "left")
            .select($"cx", $"cy", coalesce($"n_up", lit(0L)).as("n_upstream"))
            .orderBy($"cx", $"cy"))
      }
      graft.Bench.cleanup(spark)
    }
    spark.stop()
  }
}
