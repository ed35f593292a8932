package graft

import org.scalatest.funsuite.AnyFunSuite
import org.locationtech.jts.geom.{Coordinate, GeometryFactory}

import graft.index.CellIndex

/** Property-style tests over seeded deterministic samples (no scalatestplus
  * bridge in the offline cache, so plain loops instead of forAll). */
class CellIndexSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)
  private def lon() = rnd.between(-179.999, 179.999)
  private def lat() = rnd.between(-89.999, 89.999)

  test("morton interleave round-trips") {
    for (_ <- 1 to 2000) {
      val x = rnd.nextLong() & ((1L << 29) - 1)
      val y = rnd.nextLong() & ((1L << 29) - 1)
      val m = CellIndex.morton(x, y)
      assert(CellIndex.mortonX(m) === x)
      assert(CellIndex.mortonY(m) === y)
    }
  }

  test("cellId encodes level and xy consistently; envelope contains point") {
    for (_ <- 1 to 2000) {
      val (lo, la, l) = (lon(), lat(), rnd.nextInt(CellIndex.MaxLevel + 1))
      val id = CellIndex.cellId(lo, la, l)
      assert(CellIndex.level(id) === l)
      assert(CellIndex.xOf(id) === CellIndex.xIndex(lo, l))
      assert(CellIndex.yOf(id) === CellIndex.yIndex(la, l))
      val env = CellIndex.envelope(id)
      assert(lo >= env.getMinX - 1e-9 && lo <= env.getMaxX + 1e-9)
      assert(la >= env.getMinY - 1e-9 && la <= env.getMaxY + 1e-9)
    }
  }

  test("parent contains child (hierarchical prefix)") {
    for (_ <- 1 to 2000) {
      val (lo, la) = (lon(), lat())
      val l = 1 + rnd.nextInt(CellIndex.MaxLevel)
      val id = CellIndex.cellId(lo, la, l)
      val p = CellIndex.parent(id)
      assert(p === CellIndex.cellId(lo, la, l - 1))
      assert(CellIndex.children(p).contains(id))
    }
  }

  test("ring sizes: 8k cells at distance k in the interior") {
    val id = CellIndex.cellId(0.0, 0.0, 10)
    assert(CellIndex.ring(id, 0).toSeq === Seq(id))
    assert(CellIndex.ring(id, 1).length === 8)
    assert(CellIndex.ring(id, 2).length === 16)
    assert(CellIndex.disk(id, 2).length === 25)
  }

  test("coverBBox covers corner/center points of the box") {
    for (_ <- 1 to 500) {
      val l = 2 + rnd.nextInt(9)
      val x0 = lon(); val y0 = lat(); val w = rnd.between(0.01, 3.0)
      val maxX = math.min(x0 + w, 180.0); val maxY = math.min(y0 + w, 90.0)
      val cover = CellIndex.coverBBox(x0, maxX, y0, maxY, l).toSet
      for ((px, py) <- Seq((x0, y0), (math.nextDown(maxX), math.nextDown(maxY)),
                           ((x0 + maxX) / 2, (y0 + maxY) / 2)))
        assert(cover.contains(CellIndex.cellId(px, py, l)))
    }
  }

  test("windingContains agrees with JTS on random convex polygons") {
    val gf = new GeometryFactory()
    for (_ <- 1 to 200) {
      val cx = rnd.between(-170.0, 170.0); val cy = rnd.between(-80.0, 80.0)
      val n = 3 + rnd.nextInt(10); val r = rnd.between(0.5, 5.0)
      val pts = (0 until n).map { i =>
        val a = 2 * math.Pi * i / n
        (cx + r * math.cos(a), cy + 0.7 * r * math.sin(a))
      }
      val ring = pts.flatMap { case (x, y) => Seq(x, y) }.toArray
      val shell = (pts :+ pts.head).map { case (x, y) => new Coordinate(x, y) }.toArray
      val poly = gf.createPolygon(shell)
      for (_ <- 1 to 50) {
        val px = rnd.between(cx - 2 * r, cx + 2 * r)
        val py = rnd.between(cy - 2 * r, cy + 2 * r)
        val p = gf.createPoint(new Coordinate(px, py))
        val d = poly.getBoundary.distance(p)
        if (d > 1e-9)
          assert(CellIndex.windingContains(ring, px, py) === poly.covers(p), s"pt=($px,$py)")
      }
    }
  }

  test("windingContains: CellIndex and GeoKernels (codegen twin) never drift") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    for (_ <- 1 to 500) {
      val n = 3 + rnd.nextInt(8)
      val ring = Array.fill(2 * n)(rnd.between(-10.0, 10.0))
      val px = rnd.between(-12.0, 12.0); val py = rnd.between(-12.0, 12.0)
      assert(CellIndex.windingContains(ring, px, py) ===
        org.apache.spark.sql.graft.GeoKernels.windingContains(ArrayData.toArrayData(ring), px, py))
    }
    // boundary case both ways
    val tri = Array(0.0, 0.0, 4.0, 0.0, 2.0, 3.0)
    assert(CellIndex.windingContains(tri, 2.0, 0.0) ===
      org.apache.spark.sql.graft.GeoKernels.windingContains(ArrayData.toArrayData(tri), 2.0, 0.0))
  }

  test("coverBBox is boundary-inclusive (cells on the max edge kept)") {
    // an edge exactly on a cell boundary keeps the adjacent cell: the
    // winding refine is boundary-inclusive, so the prefilter must be too
    val l = 10
    val cell = CellIndex.cellId(0.0, 0.0, l) // (0,0) is a cell corner at all levels
    val cover = CellIndex.coverBBox(-1.0, 0.0, -1.0, 0.0, l).toSet
    assert(cover.contains(cell), "boundary cell dropped from cover")
    // degenerate point envelope still yields its own cell
    val pt = CellIndex.coverBBox(0.0, 0.0, 0.0, 0.0, l)
    assert(pt.toSet === Set(cell))
  }

  test("coverGeometry is a superset of the polygon's own point cells") {
    val gf = new GeometryFactory()
    val pts = Seq((0.0, 0.0), (4.0, 0.5), (5.0, 4.0), (1.0, 3.0))
    val poly = gf.createPolygon((pts :+ pts.head).map { case (x, y) => new Coordinate(x, y) }.toArray)
    val cover = CellIndex.coverGeometry(poly, 12).toSet
    for (i <- 0 until 100) {
      val px = 0.1 + (i % 10) * 0.45; val py = 0.1 + (i / 10) * 0.35
      if (poly.covers(gf.createPoint(new Coordinate(px, py))))
        assert(cover.contains(CellIndex.cellId(px, py, 12)))
    }
  }
}
