package graft.sources

import java.io.File
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import java.util.zip.{Deflater, Inflater}

import graft.model.Raster

/**
 * Pure-Scala GeoTIFF codec (S1/S9 made real — no GeoTools): baseline
 * TIFF 6.0 + the GeoTIFF 1.1 tags, from the published specifications.
 *
 * Writer: single-band IEEE-float (32 or 64 bit) GeoTIFF, little-endian, one
 * strip, optional DEFLATE (compression 8, java.util.zip), with
 * ModelPixelScale + ModelTiepoint georeferencing, a GeoKeyDirectory carrying
 * the EPSG code (geographic 2048 / projected 3072 per CRS kind), and the
 * GDAL_NODATA ascii tag ("nan" — the engine's nodata is NaN).
 *
 * Reader: either byte order, single-band strips, uncompressed or DEFLATE,
 * sample formats IEEE-float 32/64 and signed/unsigned int 8/16/32 (ints are
 * widened to the double plane; a GDAL_NODATA value maps to NaN). Tiled
 * TIFFs, palettes and multi-band interleaves are out of scope — the
 * reference's own pipeline reads the single-band coverages it writes.
 *
 * Pixel order: TIFF rows are top-down; [[Raster]] is column-major with row 0
 * at the south edge (D2_XY) — the codec transposes on both paths, and the
 * tiepoint anchors raster (0,0) at (minX, maxY).
 */
object GeoTiff {

  // TIFF tag codes
  private val TImageWidth = 256
  private val TImageLength = 257
  private val TBitsPerSample = 258
  private val TCompression = 259
  private val TPhotometric = 262
  private val TStripOffsets = 273
  private val TSamplesPerPixel = 277
  private val TRowsPerStrip = 278
  private val TStripByteCounts = 279
  private val TSampleFormat = 339
  private val TModelPixelScale = 33550
  private val TModelTiepoint = 33922
  private val TGeoKeyDirectory = 34735
  private val TGdalNodata = 42113

  // field types
  private val FtShort = 3
  private val FtLong = 4
  private val FtAscii = 2
  private val FtDouble = 12

  /** Write `band` of the raster as a GeoTIFF. `bits` = 32 | 64,
    * `deflate` = DEFLATE-compress the strip. */
  def write(r: Raster, file: File, band: Int = 0, bits: Int = 64,
            deflate: Boolean = false): Unit = {
    require(bits == 32 || bits == 64, s"unsupported float width $bits")
    val w = r.width; val h = r.height
    val values = r.bands(band)
    val bps = bits / 8
    val raw = ByteBuffer.allocate(w * h * bps).order(ByteOrder.LITTLE_ENDIAN)
    var row = 0
    while (row < h) {
      val y = h - 1 - row // top-down rows from the south-up grid
      var x = 0
      while (x < w) {
        val v = values(x * h + y)
        if (bits == 64) raw.putDouble(v) else raw.putFloat(v.toFloat)
        x += 1
      }
      row += 1
    }
    val strip = if (deflate) deflateBytes(raw.array()) else raw.array()

    // geo payloads
    val cw = (r.maxX - r.minX) / w; val ch = (r.maxY - r.minY) / h
    val pixelScale = Array(cw, ch, 0.0)
    val tiepoint = Array(0.0, 0.0, 0.0, r.minX, r.maxY, 0.0)
    val geographic = r.epsg == 4326 || (r.epsg >= 4000 && r.epsg < 5000)
    val geoKeys: Array[Int] = Array(
      1, 1, 0, 2, // key directory header: version 1.1, 2 keys
      1024, 0, 1, if (geographic) 2 else 1, // GTModelType
      if (geographic) 2048 else 3072, 0, 1, r.epsg) // CRS code key
    // "nan" NUL-terminated and padded past 4 bytes so the tag is stored by
    // offset (inline ASCII would put the bytes in the value slot - both are
    // legal TIFF; the reader handles both)
    val nodataAscii: Array[Byte] = Array('n', 'a', 'n', ' ', 0).map(_.toByte)

    // layout: header(8) | strip | pixelScale | tiepoint | geoKeys | nodata | IFD
    val stripOff = 8L
    // TIFF 6.0: values must begin on a word boundary — an odd-length
    // DEFLATE strip would otherwise misalign every block after it
    val scaleOff = stripOff + strip.length + (strip.length & 1)
    val tieOff = scaleOff + 24
    val keysOff = tieOff + 48
    val nodataOff = keysOff + geoKeys.length * 2
    var ifdOff = nodataOff + nodataAscii.length
    if (ifdOff % 2 == 1) ifdOff += 1 // IFD must start on a word boundary

    val entries = Seq[(Int, Int, Int, Long)](
      (TImageWidth, FtLong, 1, w.toLong),
      (TImageLength, FtLong, 1, h.toLong),
      (TBitsPerSample, FtShort, 1, bits.toLong),
      (TCompression, FtShort, 1, if (deflate) 8L else 1L),
      (TPhotometric, FtShort, 1, 1L),
      (TStripOffsets, FtLong, 1, stripOff),
      (TSamplesPerPixel, FtShort, 1, 1L),
      (TRowsPerStrip, FtLong, 1, h.toLong),
      (TStripByteCounts, FtLong, 1, strip.length.toLong),
      (TSampleFormat, FtShort, 1, 3L), // IEEE float
      (TModelPixelScale, FtDouble, 3, scaleOff),
      (TModelTiepoint, FtDouble, 6, tieOff),
      (TGeoKeyDirectory, FtShort, geoKeys.length, keysOff),
      (TGdalNodata, FtAscii, nodataAscii.length, nodataOff))

    val total = ifdOff + 2 + entries.length * 12 + 4
    val buf = ByteBuffer.allocate(total.toInt).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdOff.toInt)
    buf.put(strip)
    if ((strip.length & 1) == 1) buf.put(0.toByte)
    pixelScale.foreach(buf.putDouble)
    tiepoint.foreach(buf.putDouble)
    geoKeys.foreach(k => buf.putShort(k.toShort))
    buf.put(nodataAscii)
    while (buf.position() < ifdOff) buf.put(0.toByte)
    buf.putShort(entries.length.toShort)
    entries.foreach { case (tag, tpe, count, value) =>
      buf.putShort(tag.toShort).putShort(tpe.toShort).putInt(count)
      // inline values are left-justified in the 4-byte slot
      if (tpe == FtShort && count == 1) buf.putShort(value.toShort).putShort(0)
      else buf.putInt(value.toInt)
    }
    buf.putInt(0) // no next IFD
    Files.write(Paths.get(file.getPath), buf.array())
  }

  private def deflateBytes(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    val tmp = new Array[Byte](8192)
    while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
    d.end()
    out.toByteArray
  }

  private def inflateBytes(data: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new Array[Byte](expected)
    var off = 0
    while (!inf.finished() && off < expected) off += inf.inflate(out, off, expected - off)
    inf.end()
    require(off == expected, s"short inflate: $off of $expected bytes")
    out
  }

  private final case class Entry(tag: Int, tpe: Int, count: Int, valueOrOffset: Long,
                                 inline: Array[Byte])

  /** Read a (single-band) GeoTIFF into a [[Raster]]. `item_id` defaults to
    * the file name stem, ts to 0 (the caller owns temporal metadata). */
  def read(file: File, itemId: String = null, ts: Long = 0L): Raster = {
    val id = if (itemId != null) itemId else file.getName.replaceAll("\\.tiff?$", "")
    parse(Files.readAllBytes(Paths.get(file.getPath)), id, ts)
  }

  /** Parse GeoTIFF bytes (the distributed-scan entry: pair with Spark's
    * binaryFile source — each executor decodes its own files). */
  def parse(bytes: Array[Byte], itemId: String, ts: Long = 0L): Raster = {
    require(bytes.length > 8, s"$itemId: not a TIFF")
    val le = bytes(0) == 'I'.toByte && bytes(1) == 'I'.toByte
    val be = bytes(0) == 'M'.toByte && bytes(1) == 'M'.toByte
    require(le || be, s"$itemId: bad TIFF byte-order marker")
    val order = if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    val buf = ByteBuffer.wrap(bytes).order(order)
    require(buf.getShort(2) == 42, s"$itemId: bad TIFF magic")
    val ifdOff = buf.getInt(4).toLong & 0xffffffffL

    val nEntries = buf.getShort(ifdOff.toInt) & 0xffff
    val entries = (0 until nEntries).map { i =>
      val off = ifdOff.toInt + 2 + i * 12
      val tag = buf.getShort(off) & 0xffff
      val tpe = buf.getShort(off + 2) & 0xffff
      val count = buf.getInt(off + 4)
      val inline = java.util.Arrays.copyOfRange(bytes, off + 8, off + 12)
      val v = typeSize(tpe) * count match {
        case sz if sz <= 4 => firstValue(inline, tpe, order)
        case _             => buf.getInt(off + 8).toLong & 0xffffffffL
      }
      Entry(tag, tpe, count, v, inline)
    }.map(e => e.tag -> e).toMap

    def scalar(tag: Int, default: Long = -1): Long =
      entries.get(tag).map(_.valueOrOffset).getOrElse(default)
    def longs(tag: Int): Array[Long] = entries.get(tag) match {
      case None => Array.empty
      case Some(e) =>
        if (typeSize(e.tpe) * e.count <= 4) {
          // inline payload: decode ALL count values from the 4-byte slot
          // (e.g. two SHORT strip byte-counts fit inline per the TIFF spec)
          val ib = ByteBuffer.wrap(e.inline).order(order)
          Array.tabulate(e.count) { i =>
            e.tpe match {
              case FtShort => (ib.getShort(2 * i) & 0xffff).toLong
              case FtLong  => ib.getInt(4 * i).toLong & 0xffffffffL
              case 1       => e.inline(i).toLong & 0xff
              case other   => throw new IllegalArgumentException(s"tag ${e.tag} type $other")
            }
          }
        } else {
          val base = e.valueOrOffset.toInt
          Array.tabulate(e.count) { i =>
            e.tpe match {
              case FtShort => (buf.getShort(base + 2 * i) & 0xffff).toLong
              case FtLong  => buf.getInt(base + 4 * i).toLong & 0xffffffffL
              case other   => throw new IllegalArgumentException(s"tag ${e.tag} type $other")
            }
          }
        }
    }
    def doubles(tag: Int): Array[Double] = entries.get(tag) match {
      case None    => Array.empty
      case Some(e) =>
        val base = e.valueOrOffset.toInt
        Array.tabulate(e.count)(i => buf.getDouble(base + 8 * i))
    }
    def ascii(tag: Int): Option[String] = entries.get(tag).map { e =>
      val raw = if (e.count <= 4) e.inline.take(e.count)
                else java.util.Arrays.copyOfRange(bytes, e.valueOrOffset.toInt,
                                                  e.valueOrOffset.toInt + e.count)
      new String(raw, "US-ASCII").takeWhile(_ != '\u0000').trim
    }

    val w = scalar(TImageWidth).toInt; val h = scalar(TImageLength).toInt
    require(w > 0 && h > 0, s"$itemId: missing image dimensions")
    require(scalar(TSamplesPerPixel, 1) == 1, "multi-band GeoTIFF not supported")
    val bits = scalar(TBitsPerSample, 1).toInt
    val sampleFormat = scalar(TSampleFormat, 1).toInt // 1 uint, 2 int, 3 float
    val compression = scalar(TCompression, 1).toInt
    require(compression == 1 || compression == 8,
            s"unsupported TIFF compression $compression (only none/deflate)")
    val bps = (bits + 7) / 8

    // assemble the full top-down pixel buffer from the strips
    val offsets = longs(TStripOffsets)
    val counts = longs(TStripByteCounts)
    val rowsPerStrip = scalar(TRowsPerStrip, h).toInt
    val pixels = ByteBuffer.allocate(w * h * bps).order(order)
    offsets.indices.foreach { s =>
      val expected = math.min(rowsPerStrip, h - s * rowsPerStrip) * w * bps
      val rawStrip = java.util.Arrays.copyOfRange(
        bytes, offsets(s).toInt, (offsets(s) + counts(s)).toInt)
      pixels.put(if (compression == 8) inflateBytes(rawStrip, expected) else rawStrip)
    }
    pixels.flip()

    val nodata: Option[Double] = ascii(TGdalNodata).flatMap { s =>
      val t = s.trim
      if (t.isEmpty) None
      else if (t.equalsIgnoreCase("nan")) Some(Double.NaN)
      else t.toDoubleOption
    }
    @inline def toNaN(v: Double): Double =
      if (nodata.exists(nd => !nd.isNaN && v == nd)) Double.NaN else v

    val values = new Array[Double](w * h)
    var row = 0
    while (row < h) {
      val y = h - 1 - row
      var x = 0
      while (x < w) {
        val idx = (row * w + x) * bps
        val v = (sampleFormat, bits) match {
          case (3, 32) => pixels.getFloat(idx).toDouble
          case (3, 64) => pixels.getDouble(idx)
          case (2, 16) => pixels.getShort(idx).toDouble
          case (2, 32) => pixels.getInt(idx).toDouble
          case (1, 8)  => (pixels.get(idx) & 0xff).toDouble
          case (1, 16) => (pixels.getShort(idx) & 0xffff).toDouble
          case (1, 32) => (pixels.getInt(idx).toLong & 0xffffffffL).toDouble
          case other   => throw new IllegalArgumentException(
            s"unsupported sample format/bits $other")
        }
        values(x * h + y) = toNaN(v)
        x += 1
      }
      row += 1
    }

    // georeferencing: tiepoint (i,j,k, X,Y,Z) + pixel scale
    val scale = doubles(TModelPixelScale)
    val tie = doubles(TModelTiepoint)
    require(scale.length >= 2 && tie.length >= 5,
            s"$itemId: missing GeoTIFF georeferencing tags")
    val minX = tie(3) - tie(0) * scale(0)
    val maxY = tie(4) + tie(1) * scale(1)
    val maxX = minX + w * scale(0)
    val minY = maxY - h * scale(1)

    // EPSG from the GeoKeyDirectory (2048 geographic / 3072 projected)
    // projected CRS key (3072) takes precedence: projected files carry BOTH
    // a geographic datum key (2048) and the projected code, and keys are
    // sorted ascending — matching 2048 first would misread UTM as 4326
    val keys = longs(TGeoKeyDirectory)
    val keyMap = keys.grouped(4).collect { case Array(k, _, _, v) => k -> v.toInt }.toMap
    val epsg = keyMap.get(3072L).orElse(keyMap.get(2048L)).getOrElse(4326)

    Raster(itemId, ts, w, h, minX, maxX, minY, maxY, epsg, Seq(values))
  }

  private def firstValue(inline: Array[Byte], tpe: Int, order: ByteOrder): Long = {
    val b = ByteBuffer.wrap(inline).order(order)
    tpe match {
      case FtShort     => (b.getShort(0) & 0xffff).toLong
      case FtAscii | 1 => inline(0).toLong & 0xff
      case _           => b.getInt(0).toLong & 0xffffffffL
    }
  }

  private def typeSize(tpe: Int): Int = tpe match {
    case 1 | FtAscii | 6 | 7 => 1
    case FtShort | 8         => 2
    case FtLong | 9 | 11     => 4
    case 5 | 10 | FtDouble   => 8
    case _                   => 4
  }
}
