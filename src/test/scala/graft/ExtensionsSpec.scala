package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** spark.sql.extensions installation path: a session built with
  * GraftExtensions resolves the native SQL functions without any
  * register() call — the spark-submit deployment story. */
class ExtensionsSpec extends AnyFunSuite {

  test("graft functions resolve via spark.sql.extensions") {
    // extensions apply at session CREATION: clear any default session a
    // previous suite left behind so getOrCreate cannot hand us one built
    // without the config (the SparkContext itself may be reused — fine)
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("WARN")
      val cell = spark.sql("SELECT graft_cell_id(-75.0D, 4.0D, 12) AS c").head().getLong(0)
      assert(cell >= 0)
      // matches the Column-API expression exactly
      import spark.implicits._
      val viaCol = Seq((-75.0, 4.0)).toDF("lon", "lat")
        .select(graft.functions.GraftFunctions.cell_id($"lon", $"lat",
          org.apache.spark.sql.functions.lit(12)))
        .head().getLong(0)
      assert(cell == viaCol)
      val contains = spark.sql(
        """SELECT graft_contains(CAST(array(0.0, 0.0, 4.0, 0.0, 2.0, 3.0) AS ARRAY<DOUBLE>),
          |                      2.0D, 1.0D) AS hit""".stripMargin).head().getBoolean(0)
      assert(contains)
    } finally {
      spark.stop()
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
    }
  }
}
