package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ColorRamps

/** Golden values for the Renderer ramp tables (reference
  * utils/Renderer.java:614-838 dead code, re-derived live): spot indices
  * hand-computed from the reference arithmetic — including its truncating
  * int casts and Color(float) +0.5 rounding — plus structural invariants. */
class ColorRampsSpec extends AnyFunSuite {

  private def at(t: IndexedSeq[(Int, Int, Int)], is: Int*) = is.map(t(_))

  test("jet goldens (float piecewise + Color(float) rounding)") {
    assert(at(ColorRamps.jet, 0, 64, 96, 128, 192, 255) ==
      Seq((0, 0, 128), (0, 128, 255), (0, 255, 255), (128, 255, 128),
          (255, 128, 0), (131, 0, 0)))
  }

  test("heat goldens (n = 3/8 table, truncating casts)") {
    assert(at(ColorRamps.heat, 0, 95, 96, 128, 191, 192, 255) ==
      Seq((2, 0, 0), (255, 0, 0), (255, 2, 0), (255, 87, 0),
          (255, 255, 0), (255, 255, 3), (255, 255, 255)))
  }

  test("rainbow goldens (five linear segments, truncating casts)") {
    assert(at(ColorRamps.rainbow, 0, 29, 30, 64, 141, 199, 200, 255) ==
      Seq((129, 0, 255), (2, 0, 255), (0, 2, 255), (0, 155, 255),
          (0, 255, 0), (254, 255, 0), (255, 252, 0), (255, 1, 0)))
  }

  test("wave goldens (sinusoidal channels)") {
    assert(at(ColorRamps.wave, 0, 64, 128, 191, 255) ==
      Seq((135, 102, 133), (0, 100, 255), (128, 98, 115),
          (255, 69, 0), (123, 67, 145)))
  }

  test("redgreen/redblackgreen goldens incl. the i <= half midpoint quirk") {
    assert(at(ColorRamps.redgreen, 0, 64, 128, 129, 255) ==
      Seq((255, 0, 0), (255, 127, 127), (255, 255, 255), (254, 255, 254),
          (2, 255, 2)))
    assert(at(ColorRamps.redblackgreen, 0, 128, 129, 255) ==
      Seq((255, 0, 0), (0, 0, 0), (0, 1, 0), (0, 253, 0)))
  }

  test("fixed palettes, dispatch, ranges") {
    assert(ColorRamps.random20.length == 22) // the reference table's actual size
    assert(ColorRamps.excel.length == 54)
    assert(ColorRamps.grayscale(128) == (128, 128, 128))
    for (name <- Seq("jet", "heat", "grayscale", "redgreen", "redblackgreen",
                     "rainbow", "wave", "excel", "random")) {
      val t = ColorRamps.byName(name)
      assert(t.isDefined, name)
      assert(t.get.forall { case (r, g, b) =>
        r >= 0 && r <= 255 && g >= 0 && g <= 255 && b >= 0 && b <= 255 }, name)
    }
    assert(ColorRamps.byName("nope").isEmpty)
    // continuous ramps are full 256-entry tables
    for (t <- Seq(ColorRamps.jet, ColorRamps.heat, ColorRamps.rainbow,
                  ColorRamps.wave, ColorRamps.redgreen,
                  ColorRamps.redblackgreen, ColorRamps.grayscale))
      assert(t.length == 256)
    // argb lookup: clamped, floor-indexed, opaque
    assert(ColorRamps.argb(ColorRamps.grayscale, 0.0) == 0xff000000)
    assert(ColorRamps.argb(ColorRamps.grayscale, 1.0) == 0xffffffff)
    assert(ColorRamps.argb(ColorRamps.grayscale, 0.5) == 0xff808080)
    assert(ColorRamps.argb(ColorRamps.grayscale, -3.0) == 0xff000000)
  }
}
