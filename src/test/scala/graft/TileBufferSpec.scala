package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.raster.{DataKey, TileBuffer}
import graft.raster.TileBuffer._

/** Typed tile buffers (the Storage scanner variants): uniform fetch parity,
  * nodata round-trips, bit-packing, narrowing guards, byte accounting. */
class TileBufferSpec extends AnyFunSuite {

  test("double/float/int buffers round-trip through the compute plane") {
    val plane = Array(1.0, 2.5, Double.NaN, -7.0, 0.0)
    val d = fromDoublePlane(plane, "double")
    assert(d.toDoublePlane.zip(plane).forall { case (a, b) => a == b || (a.isNaN && b.isNaN) })
    val f = fromDoublePlane(plane, "float")
    assert(f.getDouble(1) == 2.5 && f.isNodata(2) && f.byteSize == 20)
    val ints = fromDoublePlane(Array(1.0, Double.NaN, -7.0), "int")
    assert(ints.getDouble(0) == 1.0 && ints.isNodata(1) && ints.getDouble(2) == -7.0)
    intercept[IllegalArgumentException](fromDoublePlane(Array(1.5), "int"))
  }

  test("boolean buffer bit-packs 64 cells per word, no nodata") {
    val values = Array.tabulate(130)(i => i % 3 == 0)
    val b = booleans(values)
    assert(b.size == 130 && b.bits.length == 3 && b.byteSize == 24)
    values.indices.foreach(i => assert(b.get(i) == values(i), s"bit $i"))
    assert(b.getDouble(0) == 1.0 && b.getDouble(1) == 0.0 && !b.isNodata(1))
    intercept[IllegalArgumentException](fromDoublePlane(Array(0.5), "boolean"))
  }

  test("key buffer carries codes + dictionary; out-of-key codes are nodata") {
    val key = DataKey.fromLabels(Seq("forest", "urban", "water"))
    val kb = fromDoublePlane(Array(0.0, 2.0, Double.NaN), "key", key = key)
      .asInstanceOf[KeyBuffer]
    assert(kb.label(0).contains("forest") && kb.label(1).contains("water"))
    assert(kb.isNodata(2) && kb.label(2).isEmpty)
    intercept[IllegalArgumentException](
      fromDoublePlane(Array(9.0), "key", key = key)) // 9 is not a code
  }

  test("float narrows bytes 2x; compute plane value survives to float precision") {
    val plane = Array.tabulate(1000)(i => i * 0.1)
    val f = fromDoublePlane(plane, "float"); val d = fromDoublePlane(plane, "double")
    assert(f.byteSize * 2 == d.byteSize)
    plane.indices.foreach(i => assert(math.abs(f.getDouble(i) - plane(i)) < 1e-4))
  }
}
