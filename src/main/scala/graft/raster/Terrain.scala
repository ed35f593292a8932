package graft.raster

import graft.model.{Raster, TileGeometry}

/**
 * Geomorphology library (reference: library/HMGeomorphology.java — the
 * `hm.geomorphology` contextualizers, stubbed there with the loop body
 * commented out at :67-71). Two live implementations of the declared
 * intent:
 *
 *  - [[elevation]]: the `generateTerrain` contract (fractal surfaces within
 *    a user range, configurable detail/roughness, D2_XY fill, defaults
 *    range 0-4000 / detail 8 / roughness 0.55 per the @KlabFunction
 *    declaration) as deterministic multi-octave value noise — a pure
 *    (x, y) -> elevation function, so generation is embarrassingly parallel
 *    across tiles and exactly replayable by the DuckDB oracle (integer
 *    lattice hash + smoothstep interpolation, no RNG);
 *  - slope (see [[Focal.slope]]): the HortonMachine gradient
 *    p = (E - W) / (2 dx), q = (N - S) / (2 dy), slope = sqrt(p^2 + q^2),
 *    a neighborhood kernel requiring halo exchange across tile borders.
 */
object Terrain {

  /** Integer lattice hash -> [0, 1): pure arithmetic (SQL-replayable). */
  @inline def latticeHash(i: Long, j: Long): Double =
    ((i * 73856093L + j * 19349663L) % 100000L).toDouble / 100000.0

  /** Smoothstep-interpolated value noise at lattice scale 1. x, y >= 0. */
  def noise(x: Double, y: Double): Double = {
    val ix = math.floor(x).toLong; val iy = math.floor(y).toLong
    val fx = x - ix; val fy = y - iy
    val sx = fx * fx * (3.0 - 2.0 * fx)
    val sy = fy * fy * (3.0 - 2.0 * fy)
    (latticeHash(ix, iy) * (1.0 - sx) + latticeHash(ix + 1, iy) * sx) * (1.0 - sy) +
      (latticeHash(ix, iy + 1) * (1.0 - sx) + latticeHash(ix + 1, iy + 1) * sx) * sy
  }

  /** Multi-octave elevation of grid cell (cx, cy) in a W x H region.
    * Base frequency 4 lattice cells across the region; octave o doubles the
    * frequency and scales amplitude by roughness^o. Output in [lo, hi]. */
  def elevation(cx: Long, cy: Long, w: Int, h: Int,
                lo: Double = 0.0, hi: Double = 4000.0,
                octaves: Int = 4, roughness: Double = 0.55): Double = {
    var sum = 0.0; var norm = 0.0; var amp = 1.0; var freq = 4.0
    var o = 0
    while (o < octaves) {
      sum += amp * noise((cx + 0.5) * freq / w, (cy + 0.5) * freq / h)
      norm += amp
      amp *= roughness
      freq *= 2.0
      o += 1
    }
    lo + (hi - lo) * (sum / norm)
  }

  /** Generate the terrain for one tile of a region (D2_XY order), cells
    * addressed by their GLOBAL region indices so tile splits are
    * value-transparent. */
  def generateTile(region: TileGeometry, x0: Int, y0: Int, w: Int, h: Int,
                   lo: Double = 0.0, hi: Double = 4000.0,
                   octaves: Int = 4, roughness: Double = 0.55): Array[Double] = {
    val out = new Array[Double](w * h)
    var x = 0
    while (x < w) {
      var y = 0
      while (y < h) {
        out(x * h + y) =
          elevation(x0 + x, y0 + y, region.width, region.height, lo, hi, octaves, roughness)
        y += 1
      }
      x += 1
    }
    out
  }
}
