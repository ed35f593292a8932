package graft.raster

import graft.model.{Raster, TileGeometry}

/**
 * Resampling kernels (W2/J3): nearest / bilinear (2x2) / bicubic & bicubic2
 * (4x4 cubic convolution), the reference's interpolation menu
 * (RasterEncoder.java:308-330 — JAI InterpolationNearest /
 * InterpolationBilinear / InterpolationBicubic / InterpolationBicubic2).
 * JAI's bicubic uses cubic-convolution parameter a = -0.5, bicubic2 a = -1.0.
 *
 * Sampling is in source *cell* space with cell-center alignment; out-of-range
 * taps clamp to the border (JAI border extension) and NaN taps poison the
 * window (nodata stays nodata — matches coverage resampling of nodata-filled
 * rasters). These kernels need a +-2-cell apron when a tile is resampled in
 * isolation; the distributed path (Mosaic.resampleToTiles) fetches source
 * fragments intersecting the tile bbox *plus apron*, reproducing the
 * reference's fetch-overlapping-coverage-per-tile behavior (SURVEY.md §7.4.4).
 */
object Resample {

  sealed trait Kernel
  case object Nearest extends Kernel
  case object Bilinear extends Kernel
  case object Bicubic extends Kernel   // a = -0.5
  case object Bicubic2 extends Kernel  // a = -1.0

  def forName(name: String): Kernel = name match {
    case "nearest"  => Nearest
    case "bilinear" => Bilinear
    case "bicubic"  => Bicubic
    case "bicubic2" => Bicubic2
    case other      => Nearest // reference defaults to nearest (:329)
  }

  @inline private def clamp(i: Int, hi: Int): Int =
    if (i < 0) 0 else if (i > hi) hi else i

  /** Sample one band of a source raster at fractional source-grid coords
    * (cell-center convention: cell i's center is at i + 0.5). */
  def sample(values: Array[Double], w: Int, h: Int, sx: Double, sy: Double,
             kernel: Kernel): Double = {
    kernel match {
      case Nearest =>
        val x = clamp(math.floor(sx).toInt, w - 1)
        val y = clamp(math.floor(sy).toInt, h - 1)
        values(x * h + y)

      case Bilinear =>
        // align to cell centers
        val gx = sx - 0.5; val gy = sy - 0.5
        val x0 = math.floor(gx).toInt; val y0 = math.floor(gy).toInt
        val fx = gx - x0; val fy = gy - y0
        val x0c = clamp(x0, w - 1); val x1c = clamp(x0 + 1, w - 1)
        val y0c = clamp(y0, h - 1); val y1c = clamp(y0 + 1, h - 1)
        val v00 = values(x0c * h + y0c); val v10 = values(x1c * h + y0c)
        val v01 = values(x0c * h + y1c); val v11 = values(x1c * h + y1c)
        (v00 * (1 - fx) + v10 * fx) * (1 - fy) + (v01 * (1 - fx) + v11 * fx) * fy

      case Bicubic | Bicubic2 =>
        val a = if (kernel == Bicubic) -0.5 else -1.0
        val gx = sx - 0.5; val gy = sy - 0.5
        val x0 = math.floor(gx).toInt; val y0 = math.floor(gy).toInt
        val fx = gx - x0; val fy = gy - y0
        val wx = cubicWeights(fx, a); val wy = cubicWeights(fy, a)
        var acc = 0.0
        var i = 0
        while (i < 4) {
          val xc = clamp(x0 - 1 + i, w - 1)
          var rowAcc = 0.0
          var j = 0
          while (j < 4) {
            val yc = clamp(y0 - 1 + j, h - 1)
            rowAcc += wy(j) * values(xc * h + yc)
            j += 1
          }
          acc += wx(i) * rowAcc
          i += 1
        }
        acc
    }
  }

  /** Cubic-convolution weights for taps at offsets {-1, 0, 1, 2}. */
  private def cubicWeights(f: Double, a: Double): Array[Double] = {
    @inline def k(x: Double): Double = {
      val ax = math.abs(x)
      if (ax <= 1) (a + 2) * ax * ax * ax - (a + 3) * ax * ax + 1
      else if (ax < 2) a * ax * ax * ax - 5 * a * ax * ax + 8 * a * ax - 4 * a
      else 0.0
    }
    Array(k(f + 1), k(f), k(f - 1), k(f - 2))
  }

  /** Resample a raster onto a target grid (both georeferenced, same CRS):
    * for each target cell center, map world -> source fractional cell coords
    * (the grid<->world affine F10) and sample. Out-of-coverage -> NaN. */
  def toGrid(src: Raster, target: TileGeometry, kernel: Kernel, band: Int = 0): Array[Double] =
    toGridAnchored(src, target, 0, 0, target.width, target.height, kernel, band)

  /**
   * Tile-anchored variant: sample a (w x h) window of `region` starting at
   * global cell (x0, y0), computing every cell center in the REGION frame —
   * so a region split into tiles yields bit-identical values to the unsplit
   * computation (tile.minX + (x+0.5)*cw and region.minX + (gx+0.5)*cw differ
   * in the last ulp otherwise; split size must never change results).
   */
  def toGridAnchored(src: Raster, region: TileGeometry, x0: Int, y0: Int,
                     w: Int, h: Int, kernel: Kernel, band: Int = 0): Array[Double] = {
    val s = src.geom
    val values = src.bands(band)
    val out = new Array[Double](w * h)
    var x = 0
    while (x < w) {
      val wx = region.cellCenterX(x0 + x)
      val sx = (wx - s.minX) / s.cellWidth
      var y = 0
      while (y < h) {
        val wy = region.cellCenterY(y0 + y)
        val sy = (wy - s.minY) / s.cellHeight
        out(x * h + y) =
          if (wx < s.minX || wx >= s.maxX || wy < s.minY || wy >= s.maxY) Double.NaN
          else sample(values, s.width, s.height, sx, sy, kernel)
        y += 1
      }
      x += 1
    }
    out
  }
}
