object TimeCC {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val n = 200000
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("a", "b")
    val t0 = System.nanoTime()
    val r = graft.operators.ConnectedComponents.minLabel(edges, "a", "b")
    println(s"rows=${r.count()} took ${(System.nanoTime()-t0)/1e9}s")
    spark.stop()
  }
}
