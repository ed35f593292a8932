package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.model.{Raster, TileGeometry}
import graft.raster.{Focal, Mosaic, Terrain}

class FocalSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("terrain: deterministic, in range, split-transparent") {
    val region = TileGeometry(120, 90, 0, 12, 0, 9, 4326, 0, 0)
    val one = Focal.terrainTiles(spark, region, maxCells = 1000000).collect()
    val many = Focal.terrainTiles(spark, region, maxCells = 400).collect()
    assert(one.length === 1 && many.length > 4)
    val flat = Array.fill(120 * 90)(0.0)
    one.head.bands.head.copyToArray(flat)
    assert(flat.forall(v => v >= 0.0 && v <= 4000.0))
    // reassemble split tiles and compare bit-exact
    val reassembled = Array.fill(120 * 90)(Double.NaN)
    many.foreach { r =>
      val x0 = math.round((r.minX - region.minX) / region.cellWidth).toInt
      val y0 = math.round((r.minY - region.minY) / region.cellHeight).toInt
      for (x <- 0 until r.width; y <- 0 until r.height)
        reassembled((x0 + x) * 90 + (y0 + y)) = r.bands.head(x * r.height + y)
    }
    assert(reassembled.toSeq === flat.toSeq)
  }

  test("slope of a linear ramp is constant; region border is NaN") {
    import spark.implicits._
    val region = TileGeometry(40, 30, 0, 80, 0, 30, 4326, 0, 0) // dx=2, dy=1
    // elevation = 3*cx + 4*cy  =>  p = 6/(2*2)=1.5, q = 8/(2*1)=4 per world unit
    val layout = Mosaic.splitTilesWithOffsets(region, maxCells = 150)
    val tiles = spark.createDataset(layout.zipWithIndex.map { case ((t, x0, y0), i) =>
      Raster(s"t$i", 0L, t.width, t.height, t.minX, t.maxX, t.minY, t.maxY, t.epsg,
        Seq(Array.tabulate(t.width * t.height)(k =>
          3.0 * (x0 + k / t.height) + 4.0 * (y0 + k % t.height))))
    })
    val slopes = Focal.slope(tiles, region, maxCells = 150).collect()
    // central difference spans two cells: p = 2*3/(2*dx) = 3/dx, q = 4/dy
    val expected = math.sqrt(math.pow(3.0 / 2.0, 2) + math.pow(4.0 / 1.0, 2))
    var interior = 0; var border = 0
    slopes.foreach { r =>
      val x0 = math.round((r.minX - region.minX) / region.cellWidth).toInt
      val y0 = math.round((r.minY - region.minY) / region.cellHeight).toInt
      for (x <- 0 until r.width; y <- 0 until r.height) {
        val gx = x0 + x; val gy = y0 + y
        val v = r.bands.head(x * r.height + y)
        if (gx == 0 || gx == 39 || gy == 0 || gy == 29) {
          assert(v.isNaN, s"border ($gx,$gy) not NaN"); border += 1
        } else {
          assert(math.abs(v - expected) < 1e-12, s"interior ($gx,$gy): $v"); interior += 1
        }
      }
    }
    assert(interior === 38 * 28 && border === 40 * 30 - 38 * 28)
  }

  test("slope split-transparency: one tile == many tiles bit-exact") {
    import spark.implicits._
    val region = TileGeometry(60, 40, 0, 6, 0, 4, 4326, 0, 0)
    def run(maxCells: Long): Map[(Int, Int), Double] = {
      val terrain = Focal.terrainTiles(spark, region, maxCells = maxCells)
      Focal.slope(terrain, region, maxCells = maxCells).collect().flatMap { r =>
        val x0 = math.round((r.minX - region.minX) / region.cellWidth).toInt
        val y0 = math.round((r.minY - region.minY) / region.cellHeight).toInt
        for (x <- 0 until r.width; y <- 0 until r.height)
          yield ((x0 + x, y0 + y), r.bands.head(x * r.height + y))
      }.toMap
    }
    val one = run(1000000); val many = run(300)
    assert(one.size === 2400 && many.size === 2400)
    one.foreach { case (k, v) =>
      val w = many(k)
      assert((v.isNaN && w.isNaN) || v === w, s"$k: $v vs $w")
    }
  }
}
