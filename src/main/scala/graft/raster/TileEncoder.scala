package graft.raster

import graft.model.{Raster, TileGeometry}

/**
 * Per-tile scalar kernels reproducing the reference's encode-from-coverage
 * pipeline (RasterEncoder.encodeFromCoverage, RasterEncoder.java:93-186):
 * band select or band-mix -> +-1e35 magnitude guard -> nodata-set mapping
 * (epsilon equality) -> optional transform -> append in D2_XY order
 * (x-outer / y-inner, RasterEncoder.java:151-185).
 *
 * These run inside mapPartitions/mapGroups over Dataset[Raster]; each call
 * touches one tile of <= 1M cells (the reference's split rule,
 * WCSAdapter.java:60-61), so per-tile arrays stay ~8 MB.
 */
object TileEncoder {

  /** Magnitude guard bound (RasterEncoder.java:162 — "cheeky but will catch
    * most of the nodata and none of the good data"). */
  val MagnitudeGuard = 1.0e35

  /** Epsilon equality for nodata matching (Utils.Numbers.equal analog,
    * RasterEncoder.java:167). */
  val Eps = 1e-9
  @inline def numEqual(a: Double, b: Double): Boolean = math.abs(a - b) < Eps

  final case class EncodeParams(
      band: Int = 0,
      bandMixer: Option[BandMixing.Op] = None,
      nodata: Set[Double] = Set.empty,
      transform: Option[Double => Double] = None,
      /** optional coordinate-checker mask (P5, Geotools.java:577-581):
        * cells failing the (x, y) predicate become nodata */
      cellMask: Option[(Int, Int) => Boolean] = None)

  final case class Stats(min: Double, max: Double, nData: Long)

  /**
   * Encode one raster's cells into a linearized D2_XY buffer.
   * `bands` is band-major (bands(b)(x*h + y)); output is values(x*h + y).
   */
  def encode(r: Raster, p: EncodeParams): Array[Double] = {
    val w = r.width; val h = r.height
    val n = r.bands.length
    val out = new Array[Double](w * h)
    val bandArr = r.bands(math.min(p.band, n - 1))
    val all = if (p.bandMixer.isDefined) flattenCellMajor(r) else null
    var x = 0
    while (x < w) {
      var y = 0
      while (y < h) {
        val i = x * h + y
        var value = p.bandMixer match {
          case Some(op) => op(all, i * n, 1, n)
          case None     => bandArr(i)
        }
        if (p.cellMask.exists(!_(x, y))) value = Double.NaN
        if (value < -MagnitudeGuard || value > MagnitudeGuard) value = Double.NaN
        if (!java.lang.Double.isNaN(value) && p.nodata.nonEmpty) {
          val it = p.nodata.iterator
          var done = false
          while (it.hasNext && !done) {
            if (numEqual(value, it.next())) { value = Double.NaN; done = true }
          }
        }
        p.transform match {
          // applied only to data values (Utils.Data.isData guard, :175)
          case Some(f) if !java.lang.Double.isNaN(value) =>
            value = f(value)
          case _ => ()
        }
        out(i) = value
        y += 1
      }
      x += 1
    }
    out
  }

  /** Re-layout band-major -> cell-major so the mixer reads bands contiguously. */
  private def flattenCellMajor(r: Raster): Array[Double] = {
    val n = r.bands.length
    val cells = r.width * r.height
    val out = new Array[Double](cells * n)
    var b = 0
    while (b < n) {
      val src = r.bands(b)
      var i = 0
      while (i < cells) { out(i * n + b) = src(i); i += 1 }
      b += 1
    }
    out
  }

  /** Running coverage statistics over a value buffer (min/max/dataCount,
    * Geotools.java:307-353, :396-399). */
  def stats(values: Array[Double]): Stats = {
    var min = Double.PositiveInfinity; var max = Double.NegativeInfinity; var n = 0L
    var i = 0
    while (i < values.length) {
      val v = values(i)
      if (!java.lang.Double.isNaN(v)) {
        if (v < min) min = v
        if (v > max) max = v
        n += 1
      }
      i += 1
    }
    if (n == 0) Stats(Double.NaN, Double.NaN, 0) else Stats(min, max, n)
  }

  /**
   * Pad a received raster into the requested region, nodata-initialized
   * (J5, WCSAdapter.java:344-365: received envelope != requested by more
   * than the 0.01 area tolerance -> map into nodata-filled raster).
   * Cells of the target grid take the source cell containing their center.
   */
  def padToRegion(r: Raster, target: TileGeometry): Array[Double] = {
    val out = Array.fill(target.width * target.height)(Double.NaN)
    val src = r.geom
    val band0 = r.bands.head
    var x = 0
    while (x < target.width) {
      val wx = target.cellCenterX(x)
      val sx = src.colOf(wx)
      if (sx >= 0) {
        var y = 0
        while (y < target.height) {
          val wy = target.cellCenterY(y)
          val sy = src.rowOf(wy)
          if (sy >= 0) out(x * target.height + y) = band0(sx * src.height + sy)
          y += 1
        }
      }
      x += 1
    }
    out
  }
}
