package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.api.Geo
import graft.functions.GraftFunctions

/** Dev probe: which pipeline stage kills 32-thread scaling?
  * Run: sbt "runMain graft.tools.ScaleProbe --single <cores> <n> <variant>"
  * or orchestrated: sbt "runMain graft.tools.ScaleProbe <n>" */
object ScaleProbe {

  def variant(spark: SparkSession, n: Long, which: String): DataFrame = {
    import spark.implicits._
    val pts = spark.range(0, n)
      .select($"id".as("doc_id"), Geo.lonCol($"id").as("lon"), Geo.latCol($"id").as("lat"))
    which match {
      case "cellid" =>
        pts.select(GraftFunctions.cell_id($"lon", $"lat", lit(12)).as("cell"))
          .groupBy($"cell" % 64).count()
      case "join" =>
        val zs = Geo.zones(spark, "/root/testdata/sf0.001").select($"zone_id", $"ring")
        graft.operators.SpatialJoin.pointsInZones(pts, zs, 12)
          .groupBy($"zone_id").count()
      case "join_norefine" =>
        val zs = Geo.zones(spark, "/root/testdata/sf0.001").select($"zone_id", $"ring")
        // same cover kernel as production (SpatialJoin.coverRingUdf)
        val zoneCells = broadcast(zs.withColumn("cell",
          explode(graft.operators.SpatialJoin.coverRingUdf(col("ring"), lit(12)))))
        pts.withColumn("cell", GraftFunctions.cell_id($"lon", $"lat", lit(12)))
          .join(zoneCells, "cell").groupBy($"zone_id").count()
      case "join_salted" =>
        // force the salted-shuffle strategy on the scaling-bench zones
        val zs = ScalingBench.zones(spark)
        graft.operators.SpatialJoin.pointsInZonesAuto(pts, zs, 12,
          broadcastMaxCells = 0, sampleFraction = 0.001, hotCellCap = 100000)
          .groupBy($"zone_id").count()
      case "join_auto" =>
        val zs = ScalingBench.zones(spark)
        graft.operators.SpatialJoin.pointsInZonesAuto(pts, zs, 12)
          .groupBy($"zone_id").count()
      case "baseline" =>
        pts.groupBy($"doc_id" % 64).count()
    }
  }

  def runAt(cores: Int, n: Long, which: String): Double = {
    val spark = SparkSession.builder().master(s"local[$cores]")
      .appName(s"probe-$which-$cores")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("PROBE_SHUFFLE", cores.toString))
      .config("spark.default.parallelism",
        sys.env.getOrElse("PROBE_PARALLELISM", cores.toString))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    variant(spark, n / 50, which).write.format("noop").mode("overwrite").save()
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      variant(spark, n, which).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    spark.stop()
    System.err.println(s"TIMES $which $cores ${times.mkString(",")}")
    times.min
  }

  private def runForked(cores: Int, n: Long, which: String): Double = {
    import scala.jdk.CollectionConverters._
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.filter(a => a.startsWith("--add-opens") || a.startsWith("-Xmx"))
    val cmd = (Seq(s"${System.getProperty("java.home")}/bin/java") ++ jvmArgs ++
      Seq("-Dspark.ui.enabled=false", "-cp", System.getProperty("java.class.path"),
          "graft.tools.ScaleProbe", "--single", cores.toString, n.toString, which))
    val p = new ProcessBuilder(cmd.asJava).start()
    val out = new String(p.getInputStream.readAllBytes())
    p.waitFor()
    out.linesIterator.find(_.startsWith("SINGLE ")).map(_.split(" ")(1).toDouble)
      .getOrElse(sys.error(s"no result: $out"))
  }

  def main(args: Array[String]): Unit = {
    if (args.length == 4 && args(0) == "--single") {
      println(s"SINGLE ${runAt(args(1).toInt, args(2).toLong, args(3))}")
      return
    }
    val n = if (args.nonEmpty) args(0).toLong else 200000000L
    for (which <- Seq("baseline", "cellid", "join_norefine", "join")) {
      val t8 = runForked(8, n, which)
      val t32 = runForked(32, n, which)
      println(s"""{"variant":"$which","t8":$t8,"t32":$t32,"speedup":${t8 / t32}}""")
    }
  }
}
