package graft.index

import org.locationtech.jts.geom.{Envelope, Geometry}

/**
 * Hierarchical spatial cell index: a Z-order (Morton) quadtree over
 * EPSG:4326, pure Scala (no H3/S2 jar on the classpath — see SURVEY.md §7.0).
 *
 * Keeps the properties the engine's join strategy relies on:
 *  - hierarchical prefix (parent = morton >> 2, so a parent's children share
 *    a contiguous morton range → range-partitionable by prefix);
 *  - constant-time neighbors / rings (kNN ring expansion);
 *  - deterministic, branch-free encode (hot loop of the spatial join; exposed
 *    as a codegen'd Catalyst expression in [[graft.functions.GraftFunctions]]).
 *
 * Cell id layout (64-bit long):
 *   bits 58..63 : level (0..29)
 *   bits 0..57  : morton code (x interleaved in even bits, y in odd bits)
 *
 * The reference's analog is the grid<->world affine of
 * adapters/stac/StacResource.java:340-355 plus the D2_XY linearization of
 * adapters/raster/RasterEncoder.java:146-185; the hierarchical index itself is
 * new (the reference delegates spatial search to STAC/WCS servers).
 */
object CellIndex {

  val MaxLevel = 29

  /** Spread the low 32 bits of x so they occupy the even bit positions. */
  @inline def spreadBits(v: Long): Long = {
    var x = v & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8))  & 0x00ff00ff00ff00ffL
    x = (x | (x << 4))  & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2))  & 0x3333333333333333L
    x = (x | (x << 1))  & 0x5555555555555555L
    x
  }

  /** Inverse of [[spreadBits]]: gather the even bit positions into low bits. */
  @inline def gatherBits(v: Long): Long = {
    var x = v & 0x5555555555555555L
    x = (x | (x >> 1))  & 0x3333333333333333L
    x = (x | (x >> 2))  & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x >> 4))  & 0x00ff00ff00ff00ffL
    x = (x | (x >> 8))  & 0x0000ffff0000ffffL
    x = (x | (x >> 16)) & 0x00000000ffffffffL
    x
  }

  @inline def morton(x: Long, y: Long): Long = spreadBits(x) | (spreadBits(y) << 1)
  @inline def mortonX(m: Long): Long = gatherBits(m)
  @inline def mortonY(m: Long): Long = gatherBits(m >> 1)

  @inline private def clamp(v: Long, hi: Long): Long =
    if (v < 0L) 0L else if (v > hi) hi else v

  /** Grid x index of a longitude at a level (2^level cells over [-180,180)). */
  @inline def xIndex(lon: Double, level: Int): Long =
    clamp(math.floor((lon + 180.0) / 360.0 * (1L << level)).toLong, (1L << level) - 1)

  /** Grid y index of a latitude at a level (2^level cells over [-90,90)). */
  @inline def yIndex(lat: Double, level: Int): Long =
    clamp(math.floor((lat + 90.0) / 180.0 * (1L << level)).toLong, (1L << level) - 1)

  /** Encode a point to its cell id. Static + branch-light: this is the
    * innermost-loop function of the 10^12-row join, called from generated
    * code by the `graft_cell_id` Catalyst expression. */
  def cellId(lon: Double, lat: Double, level: Int): Long = {
    val l = if (level < 0) 0 else if (level > MaxLevel) MaxLevel else level
    (l.toLong << 58) | morton(xIndex(lon, l), yIndex(lat, l))
  }

  @inline def level(id: Long): Int  = (id >>> 58).toInt
  @inline def xOf(id: Long): Long   = mortonX(id & 0x03ffffffffffffffL)
  @inline def yOf(id: Long): Long   = mortonY(id & 0x03ffffffffffffffL)

  def fromXY(x: Long, y: Long, level: Int): Long =
    (level.toLong << 58) | morton(x, y)

  /** Parent cell (one level up). Hierarchical-prefix property: the morton
    * code of the parent is the child's morton >> 2. */
  def parent(id: Long): Long = {
    val l = level(id)
    require(l > 0, "level-0 cell has no parent")
    ((l - 1).toLong << 58) | ((id & 0x03ffffffffffffffL) >> 2)
  }

  /** The four children (one level down), in morton order. */
  def children(id: Long): Array[Long] = {
    val l = level(id)
    require(l < MaxLevel, s"level $MaxLevel cell has no children")
    val base = (id & 0x03ffffffffffffffL) << 2
    Array.tabulate(4)(i => ((l + 1).toLong << 58) | (base + i))
  }

  /** Cell envelope in lon/lat. */
  def envelope(id: Long): Envelope = {
    val l = level(id)
    val n = (1L << l).toDouble
    val x = xOf(id); val y = yOf(id)
    new Envelope(
      x / n * 360.0 - 180.0, (x + 1) / n * 360.0 - 180.0,
      y / n * 180.0 - 90.0,  (y + 1) / n * 180.0 - 90.0)
  }

  /** Ring of cells at Chebyshev distance exactly k (k=0 → the cell itself).
    * Clipped at the index boundary, no wraparound (engine inputs are
    * continental bboxes, matching the reference's regional grids). */
  def ring(id: Long, k: Int): Array[Long] = {
    val l = level(id)
    val hi = (1L << l) - 1
    val cx = xOf(id); val cy = yOf(id)
    if (k == 0) return Array(id)
    val out = Array.newBuilder[Long]
    var dx = -k
    while (dx <= k) {
      var dy = -k
      while (dy <= k) {
        if (math.max(math.abs(dx), math.abs(dy)) == k) {
          val x = cx + dx; val y = cy + dy
          if (x >= 0 && x <= hi && y >= 0 && y <= hi)
            out += fromXY(x, y, l)
        }
        dy += 1
      }
      dx += 1
    }
    out.result()
  }

  /** Disk: all cells at Chebyshev distance <= k. */
  def disk(id: Long, k: Int): Array[Long] =
    (0 to k).flatMap(r => ring(id, r)).toArray

  /** All cells intersecting a bbox at a level (boundary-inclusive: a bbox
    * edge exactly on a cell boundary keeps that cell, because the winding
    * refine is boundary-inclusive too — a tighter cover would silently drop
    * boundary matches; supersets are always safe before an exact refine).
    * Caller bounds the level so the cover stays small (the join planner picks
    * level from target cell counts, mirroring the reference's 1M-cell split
    * rule, WCSAdapter.java:60-61). */
  def coverBBox(minX: Double, maxX: Double, minY: Double, maxY: Double, level: Int): Array[Long] = {
    val x0 = xIndex(minX, level); val x1 = xIndex(maxX, level)
    val y0 = yIndex(minY, level); val y1 = yIndex(maxY, level)
    val out = new Array[Long](((x1 - x0 + 1) * (y1 - y0 + 1)).toInt)
    var i = 0
    var x = x0
    while (x <= x1) {
      var y = y0
      while (y <= y1) { out(i) = fromXY(x, y, level); i += 1; y += 1 }
      x += 1
    }
    out
  }

  /** Cell cover of an arbitrary JTS geometry: bbox cells refined by exact
    * `intersects` (JTS 1.20 on classpath). Generator-shaped (1 input → N
    * cells); exposed to DataFrames as a UDF + explode. */
  def coverGeometry(geom: Geometry, level: Int): Array[Long] = {
    val env = geom.getEnvelopeInternal
    val gf = geom.getFactory
    coverBBox(env.getMinX, env.getMaxX, env.getMinY, env.getMaxY, level)
      .filter { id => geom.intersects(gf.toGeometry(envelope(id))) }
  }

  /**
   * Exact point-in-polygon by winding number over a flat [x0,y0,x1,y1,...]
   * ring array (closed implicitly). Non-zero winding rule; boundary points
   * count as inside. (The reference delegates exact PIP to JTS via
   * setGeometryFilter, adapters/stac/StacEngine.java:161-162.)
   *
   * NOTE: the production codegen path uses the ArrayData twin
   * org.apache.spark.sql.graft.GeoKernels.windingContains (allocation-free
   * over UnsafeArrayData); this Array[Double] form is the Spark-free
   * reference implementation. A parity test (CellIndexSpec) pins the two
   * together so they cannot drift.
   */
  def windingContains(ring: Array[Double], px: Double, py: Double): Boolean = {
    val n = ring.length / 2
    if (n < 3) return false
    var wn = 0
    var i = 0
    while (i < n) {
      val x1 = ring(2 * i); val y1 = ring(2 * i + 1)
      val j = if (i == n - 1) 0 else i + 1
      val x2 = ring(2 * j); val y2 = ring(2 * j + 1)
      // boundary check: point on segment [p1,p2]
      val cross = (x2 - x1) * (py - y1) - (px - x1) * (y2 - y1)
      if (cross == 0.0 &&
          px >= math.min(x1, x2) && px <= math.max(x1, x2) &&
          py >= math.min(y1, y2) && py <= math.max(y1, y2)) return true
      if (y1 <= py) { if (y2 > py && cross > 0) wn += 1 }
      else          { if (y2 <= py && cross < 0) wn -= 1 }
      i += 1
    }
    wn != 0
  }
}
