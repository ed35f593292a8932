package graft.raster

/**
 * Typed dense tile buffers — the engine analog of the reference's typed
 * Storage scanners (Storage.DoubleScanner / IntScanner / FloatScanner /
 * BooleanScanner / KeyScanner dispatched in utils/Geotools.java:413-422 and
 * filled band-per-type in the encode paths). The compute plane stays
 * double+NaN (every kernel in this package), but tiles at rest carry the
 * narrowest type that represents the observation:
 *
 *   - Float  halves the bytes of a continuous band (the difference between
 *     4 and 8 PB of tile state at the 100-TB input scale)
 *   - Int + explicit nodata sentinel for count-like quantities
 *   - Boolean packs to a bitset (64 cells/word)
 *   - Key carries int codes + the [[DataKey]] dictionary (categorizations
 *     never belong in floats)
 *
 * `getDouble`/`isNodata` is the uniform fetch (the reference's `fetch`
 * switch); `toDoublePlane` inflates to the kernel representation and
 * `fromDoublePlane` narrows back after compute.
 */
sealed trait TileBuffer {
  def size: Int
  /** Uniform fetch into the compute plane (NaN = nodata). */
  def getDouble(i: Int): Double
  def isNodata(i: Int): Boolean = getDouble(i).isNaN
  /** Bytes of payload at rest (the scale-planning number). */
  def byteSize: Long

  final def toDoublePlane: Array[Double] = {
    val out = new Array[Double](size)
    var i = 0
    while (i < size) { out(i) = getDouble(i); i += 1 }
    out
  }
}

object TileBuffer {

  final case class DoubleBuffer(values: Array[Double]) extends TileBuffer {
    def size: Int = values.length
    def getDouble(i: Int): Double = values(i)
    def byteSize: Long = 8L * size
  }

  final case class FloatBuffer(values: Array[Float]) extends TileBuffer {
    def size: Int = values.length
    def getDouble(i: Int): Double = values(i).toDouble
    def byteSize: Long = 4L * size
  }

  /** Int band with an explicit nodata sentinel (rasters can't carry NaN in
    * integer bands — the reference passes noDataValue through its int
    * coverage builders). */
  final case class IntBuffer(values: Array[Int], nodata: Int) extends TileBuffer {
    def size: Int = values.length
    def getDouble(i: Int): Double =
      if (values(i) == nodata) Double.NaN else values(i).toDouble
    def byteSize: Long = 4L * size
  }

  /** Boolean band bit-packed 64 cells per word; booleans have no nodata
    * (VERIFICATION observations are total). */
  final case class BooleanBuffer(bits: Array[Long], size: Int) extends TileBuffer {
    def getDouble(i: Int): Double = if (get(i)) 1.0 else 0.0
    def get(i: Int): Boolean = (bits(i >> 6) >> (i & 63) & 1L) != 0
    def byteSize: Long = 8L * bits.length
  }

  /** Dictionary-coded categorical band (KeyScanner analog): int codes plus
    * the [[DataKey]]; nodata = any code outside the dictionary. */
  final case class KeyBuffer(codes: Array[Int], key: DataKey, nodata: Int) extends TileBuffer {
    def size: Int = codes.length
    def getDouble(i: Int): Double =
      if (codes(i) == nodata || !key.entries.contains(codes(i))) Double.NaN
      else codes(i).toDouble
    def label(i: Int): Option[String] =
      if (codes(i) == nodata) None else key.lookup(codes(i))
    def byteSize: Long = 4L * size
  }

  def booleans(values: Array[Boolean]): BooleanBuffer = {
    val bits = new Array[Long]((values.length + 63) >> 6)
    var i = 0
    while (i < values.length) {
      if (values(i)) bits(i >> 6) |= 1L << (i & 63)
      i += 1
    }
    BooleanBuffer(bits, values.length)
  }

  /** Narrow a compute plane back to a typed buffer. `floats` rounds to the
    * nearest float; int/key floor is an error if the plane holds
    * non-integral data values (narrowing must never silently lose data). */
  def fromDoublePlane(plane: Array[Double], target: String,
                      intNodata: Int = Int.MinValue,
                      key: DataKey = null): TileBuffer = target match {
    case "double" => DoubleBuffer(plane.clone())
    case "float"  => FloatBuffer(plane.map(_.toFloat))
    case "int" =>
      IntBuffer(plane.map { v =>
        if (v.isNaN) intNodata
        else {
          require(v == math.rint(v) && v >= Int.MinValue && v <= Int.MaxValue,
                  s"value $v cannot narrow to int without loss")
          require(v.toInt != intNodata,
                  s"data value $v collides with the int nodata sentinel $intNodata")
          v.toInt
        }
      }, intNodata)
    case "boolean" =>
      booleans(plane.map { v =>
        require(v == 0.0 || v == 1.0, s"non-boolean value $v cannot narrow to boolean")
        v == 1.0
      })
    case "key" =>
      require(key != null, "key narrowing requires a DataKey")
      KeyBuffer(plane.map { v =>
        if (v.isNaN) intNodata
        else {
          require(v == math.rint(v) && key.entries.contains(v.toInt),
                  s"value $v is not a code of the data key")
          v.toInt
        }
      }, key, intNodata)
    case other => throw new IllegalArgumentException(s"unknown buffer type $other")
  }
}
