package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.api.GraftOps._
import graft.extract.InterleavedDocs

class GraftOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("typed facade: docs.geoSpans.withCell.pipJoin == q16") {
    import spark.implicits._
    val viaFacade = InterleavedDocs.typedDocs(spark, dir)
      .geoSpans
      .pipJoin(graft.api.Geo.zones(spark, dir).select($"zone_id", $"ring"), level = 12)
      .select($"doc_id", $"span_idx", $"zone_id")
      .as[(String, Long, Long)].collect().sorted.toSeq
    val viaQuery = SparkEntry.queries("q16_docs_pip")(spark, dir)
      .as[(String, Long, Long)].collect().sorted.toSeq
    assert(viaFacade === viaQuery && viaFacade.nonEmpty)
  }

  test("geoSpans matches InterleavedDocs.geoPoints bit-for-bit") {
    import spark.implicits._
    val a = InterleavedDocs.typedDocs(spark, dir).geoSpans
      .as[(String, Long, Double, Double)].collect().sorted.toSeq
    val b = InterleavedDocs.geoPoints(spark, dir)
      .as[(String, Long, Double, Double)].collect().sorted.toSeq
    assert(a === b)
  }

  test("cover_wkb covers a WKB polygon like coverGeometry") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val gf = new org.locationtech.jts.geom.GeometryFactory()
    val poly = gf.createPolygon(Array(
      new org.locationtech.jts.geom.Coordinate(0, 0),
      new org.locationtech.jts.geom.Coordinate(3, 0),
      new org.locationtech.jts.geom.Coordinate(3, 2),
      new org.locationtech.jts.geom.Coordinate(0, 0)))
    val wkb = new org.locationtech.jts.io.WKBWriter().write(poly)
    val got = Seq(Tuple1(wkb)).toDF("wkb")
      .select(explode(graft.functions.GraftFunctions.cover_wkb($"wkb", lit(10))).as("cell"))
      .as[Long].collect().toSet
    assert(got === graft.index.CellIndex.coverGeometry(poly, 10).toSet && got.nonEmpty)
  }
}
