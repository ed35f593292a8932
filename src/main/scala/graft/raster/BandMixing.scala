package graft.raster

/**
 * Band-mix reductions across the bands of one cell, reproducing the
 * reference's *observable* semantics exactly — including its quirks
 * (SURVEY.md §2.10, decided in §7.4: reproduce behavior as it actually
 * executes, document each divergence from the "intended" semantics):
 *
 *  - `currentValue == Double.NaN` is always false in Java
 *    (RasterEncoder.java:210, :226, :241, :256), so NaN bands are skipped
 *    only because `NaN > max` / `NaN < min` are false;
 *  - MAX_VALUE seeds its accumulator with Double.MIN_VALUE (the smallest
 *    *positive* double, RasterEncoder.java:238), so cells whose values are
 *    all <= 4.9e-324 (all-negative, all-zero, or all-NaN) return NaN
 *    (RasterEncoder.java:247-248);
 *  - MIN_VALUE symmetrically seeds Double.MAX_VALUE (RasterEncoder.java:251);
 *  - BAND_MAX_VALUE/BAND_MIN_VALUE return the *band index* as a double, NaN
 *    when no band beats the seed (RasterEncoder.java:205-235);
 *  - AVG uses proper isNaN and returns NaN for all-NaN cells
 *    (RasterEncoder.java:265-281);
 *  - SUM uses proper isNaN but returns 0.0 (not NaN) for all-NaN cells
 *    (RasterEncoder.java:283-292).
 *
 * Unknown mixer names raise NoSuchElementException — the contract the
 * reference's (disabled) test asserts (RasterAdapterTest.java:86-113).
 */
object BandMixing {

  sealed trait Op { def apply(bands: Array[Double], i: Int, stride: Int, n: Int): Double }

  case object MaxValue extends Op {
    def apply(b: Array[Double], i: Int, stride: Int, n: Int): Double = {
      var max = java.lang.Double.MIN_VALUE
      var k = 0
      while (k < n) { val v = b(i + k * stride); if (v > max) max = v; k += 1 }
      if (max == java.lang.Double.MIN_VALUE) Double.NaN else max
    }
  }

  case object MinValue extends Op {
    def apply(b: Array[Double], i: Int, stride: Int, n: Int): Double = {
      var min = java.lang.Double.MAX_VALUE
      var k = 0
      while (k < n) { val v = b(i + k * stride); if (v < min) min = v; k += 1 }
      if (min == java.lang.Double.MAX_VALUE) Double.NaN else min
    }
  }

  case object AvgValue extends Op {
    def apply(b: Array[Double], i: Int, stride: Int, n: Int): Double = {
      var sum = 0.0; var valid = 0
      var k = 0
      while (k < n) {
        val v = b(i + k * stride)
        if (!java.lang.Double.isNaN(v)) { sum += v; valid += 1 }
        k += 1
      }
      if (valid == 0) Double.NaN else sum / valid
    }
  }

  case object SumValue extends Op {
    def apply(b: Array[Double], i: Int, stride: Int, n: Int): Double = {
      var sum = 0.0
      var k = 0
      while (k < n) { val v = b(i + k * stride); if (!java.lang.Double.isNaN(v)) sum += v; k += 1 }
      sum // all-NaN cell -> 0.0, as the reference computes it
    }
  }

  case object BandMaxValue extends Op {
    def apply(b: Array[Double], i: Int, stride: Int, n: Int): Double = {
      var max = java.lang.Double.MIN_VALUE; var band = Double.NaN
      var k = 0
      while (k < n) { val v = b(i + k * stride); if (v > max) { max = v; band = k }; k += 1 }
      band
    }
  }

  case object BandMinValue extends Op {
    def apply(b: Array[Double], i: Int, stride: Int, n: Int): Double = {
      var min = java.lang.Double.MAX_VALUE; var band = Double.NaN
      var k = 0
      while (k < n) { val v = b(i + k * stride); if (v < min) { min = v; band = k }; k += 1 }
      band
    }
  }

  /** Mixer by reference name (RasterAdapter BANDMIXER_PARAM values,
    * BandMixing.java:6-13). Unknown names throw NoSuchElementException. */
  def forName(name: String): Op = name match {
    case "max_value"      => MaxValue
    case "min_value"      => MinValue
    case "avg_value"      => AvgValue
    case "sum_value"      => SumValue
    case "band_max_value" => BandMaxValue
    case "band_min_value" => BandMinValue
    case other => throw new NoSuchElementException(s"Unsupported band mixing operation $other")
  }
}
