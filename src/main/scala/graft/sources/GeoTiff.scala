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
 * Writer: IEEE-float (32 or 64 bit) GeoTIFF, little-endian, single- or
 * multi-band (chunky PlanarConfiguration=1 or planar =2), stripped or tiled
 * (TileWidth/TileLength multiples of 16 per TIFF 6.0 §15), optional DEFLATE
 * (compression 8, java.util.zip), with ModelPixelScale + ModelTiepoint
 * georeferencing, a GeoKeyDirectory carrying the EPSG code (geographic 2048 /
 * projected 3072 per CRS kind), and the GDAL_NODATA ascii tag ("nan" — the
 * engine's nodata is NaN).
 *
 * Reader: either byte order, strips or tiles, chunky or planar interleave,
 * any SamplesPerPixel (the multi-band COG shape the reference selects bands
 * from — adapters/raster/RasterEncoder.java:107-113,
 * adapters/stac/StacResource.java:433-437), uncompressed or DEFLATE, sample
 * formats IEEE-float 32/64 and signed/unsigned int 8/16/32 (ints are widened
 * to the double plane; a GDAL_NODATA value maps to NaN). Band selection
 * happens AT DECODE ([[parseBands]]): with planar interleave the unselected
 * planes' strips/tiles are never even inflated. Palette TIFFs are out of
 * scope (the reference reads continuous coverages).
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
  private val TPlanarConfig = 284
  private val TTileWidth = 322
  private val TTileLength = 323
  private val TTileOffsets = 324
  private val TTileByteCounts = 325
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

  /** Write `band` of the raster as a single-band stripped GeoTIFF. */
  def write(r: Raster, file: File, band: Int = 0, bits: Int = 64,
            deflate: Boolean = false): Unit =
    writeFull(Raster(r.item_id, r.ts, r.width, r.height,
                     r.minX, r.maxX, r.minY, r.maxY, r.epsg, Seq(r.bands(band))),
              file, bits, deflate)

  /**
   * Write ALL bands of the raster as a GeoTIFF.
   * @param bits    32 | 64 (IEEE float samples)
   * @param deflate DEFLATE-compress every strip/tile independently
   * @param tile    Some((tileW, tileH)) writes a tiled TIFF (dims must be
   *                multiples of 16, TIFF 6.0 §15); None writes one strip per
   *                plane
   * @param planar  1 = chunky (samples interleaved per pixel),
   *                2 = planar (each band its own strips/tiles)
   */
  def writeFull(r: Raster, file: File, bits: Int = 64, deflate: Boolean = false,
                tile: Option[(Int, Int)] = None, planar: Int = 1): Unit =
    Files.write(Paths.get(file.getPath), encode(r, bits, deflate, tile, planar))

  /** [[writeFull]] to a byte array (the distributed-sink unit: executors
    * encode their own tiles and hand bytes to the committing writer). */
  def encode(r: Raster, bits: Int = 64, deflate: Boolean = false,
             tile: Option[(Int, Int)] = None, planar: Int = 1): Array[Byte] = {
    require(bits == 32 || bits == 64, s"unsupported float width $bits")
    require(planar == 1 || planar == 2, s"bad PlanarConfiguration $planar")
    tile.foreach { case (tw, th) =>
      require(tw % 16 == 0 && th % 16 == 0, s"tile dims must be multiples of 16: ${tw}x$th")
    }
    val w = r.width; val h = r.height
    val spp = r.bands.length
    val bps = bits / 8

    @inline def putVal(bb: ByteBuffer, v: Double): Unit =
      if (bits == 64) bb.putDouble(v) else bb.putFloat(v.toFloat)

    // ---- image data chunks (file order) ----
    val rawChunks: Seq[Array[Byte]] = tile match {
      case None =>
        // one strip per plane; chunky = a single strip with per-pixel
        // interleave, planar = spp strips each holding one full band
        val planes = if (planar == 2) spp else 1
        (0 until planes).map { p =>
          val sppC = if (planar == 2) 1 else spp
          val bb = ByteBuffer.allocate(w * h * sppC * bps).order(ByteOrder.LITTLE_ENDIAN)
          var row = 0
          while (row < h) {
            val y = h - 1 - row // top-down rows from the south-up grid
            var x = 0
            while (x < w) {
              var b = 0
              while (b < sppC) {
                putVal(bb, r.bands(if (planar == 2) p else b)(x * h + y)); b += 1
              }
              x += 1
            }
            row += 1
          }
          bb.array()
        }
      case Some((tw, th)) =>
        // tiles left-to-right, top-to-bottom, planes consecutive (planar);
        // edge tiles are padded to the full tile size per the TIFF spec
        val ta = (w + tw - 1) / tw; val td = (h + th - 1) / th
        val planes = if (planar == 2) spp else 1
        for {
          p <- 0 until planes
          tyi <- 0 until td
          txi <- 0 until ta
        } yield {
          val sppC = if (planar == 2) 1 else spp
          val bb = ByteBuffer.allocate(tw * th * sppC * bps).order(ByteOrder.LITTLE_ENDIAN)
          var rr = 0
          while (rr < th) {
            val row = tyi * th + rr
            var xi = 0
            while (xi < tw) {
              val x = txi * tw + xi
              var b = 0
              while (b < sppC) {
                val v = if (row < h && x < w)
                  r.bands(if (planar == 2) p else b)(x * h + (h - 1 - row))
                else 0.0
                putVal(bb, v); b += 1
              }
              xi += 1
            }
            rr += 1
          }
          bb.array()
        }
    }
    val chunks = rawChunks.map(c => if (deflate) deflateBytes(c) else c)

    // ---- layout: header(8) | chunks | tag payload blocks | IFD ----
    var cursor = 8L
    val chunkOffsets = chunks.map { c =>
      if (cursor % 2 == 1) cursor += 1 // values begin on a word boundary
      val off = cursor; cursor += c.length; off
    }

    def shorts(vs: Seq[Long]): Array[Byte] = {
      val b = ByteBuffer.allocate(vs.length * 2).order(ByteOrder.LITTLE_ENDIAN)
      vs.foreach(v => b.putShort(v.toShort)); b.array()
    }
    def longsB(vs: Seq[Long]): Array[Byte] = {
      val b = ByteBuffer.allocate(vs.length * 4).order(ByteOrder.LITTLE_ENDIAN)
      vs.foreach(v => b.putInt(v.toInt)); b.array()
    }
    def doublesB(vs: Seq[Double]): Array[Byte] = {
      val b = ByteBuffer.allocate(vs.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      vs.foreach(b.putDouble); b.array()
    }

    val cw = (r.maxX - r.minX) / w; val ch = (r.maxY - r.minY) / h
    val geographic = r.epsg == 4326 || (r.epsg >= 4000 && r.epsg < 5000)
    val geoKeys: Seq[Long] = Seq[Long](
      1, 1, 0, 2, // key directory header: version 1.1, 2 keys
      1024, 0, 1, if (geographic) 2L else 1L, // GTModelType
      if (geographic) 2048L else 3072L, 0, 1, r.epsg.toLong) // CRS code key
    // "nan" NUL-terminated; padded so older readers that only handle
    // offset-stored ASCII still see it (both storages are legal TIFF)
    val nodataAscii: Array[Byte] = Array('n', 'a', 'n', ' ', 0).map(_.toByte)

    // (tag, type, count, payload) — ascending tag order per TIFF 6.0
    val tagData: Seq[(Int, Int, Int, Array[Byte])] = (Seq(
      (TImageWidth, FtLong, 1, longsB(Seq(w.toLong))),
      (TImageLength, FtLong, 1, longsB(Seq(h.toLong))),
      (TBitsPerSample, FtShort, spp, shorts(Seq.fill(spp)(bits.toLong))),
      (TCompression, FtShort, 1, shorts(Seq(if (deflate) 8L else 1L))),
      (TPhotometric, FtShort, 1, shorts(Seq(1L))),
      (TSamplesPerPixel, FtShort, 1, shorts(Seq(spp.toLong))),
      (TPlanarConfig, FtShort, 1, shorts(Seq(planar.toLong)))) ++
      (tile match {
        case None => Seq(
          (TStripOffsets, FtLong, chunks.length, longsB(chunkOffsets)),
          (TRowsPerStrip, FtLong, 1, longsB(Seq(h.toLong))),
          (TStripByteCounts, FtLong, chunks.length, longsB(chunks.map(_.length.toLong))))
        case Some((tw, th)) => Seq(
          (TTileWidth, FtLong, 1, longsB(Seq(tw.toLong))),
          (TTileLength, FtLong, 1, longsB(Seq(th.toLong))),
          (TTileOffsets, FtLong, chunks.length, longsB(chunkOffsets)),
          (TTileByteCounts, FtLong, chunks.length, longsB(chunks.map(_.length.toLong))))
      }) ++ Seq(
      (TSampleFormat, FtShort, spp, shorts(Seq.fill(spp)(3L))), // IEEE float
      (TModelPixelScale, FtDouble, 3, doublesB(Seq(cw, ch, 0.0))),
      (TModelTiepoint, FtDouble, 6, doublesB(Seq(0.0, 0.0, 0.0, r.minX, r.maxY, 0.0))),
      (TGeoKeyDirectory, FtShort, geoKeys.length, shorts(geoKeys)),
      (TGdalNodata, FtAscii, nodataAscii.length, nodataAscii)))
      .sortBy(_._1)

    // payloads longer than 4 bytes go to blocks; others inline
    val blockOffsets: Map[Int, Long] = tagData.collect {
      case (tag, _, _, payload) if payload.length > 4 =>
        if (cursor % 2 == 1) cursor += 1
        val off = cursor; cursor += payload.length
        tag -> off
    }.toMap
    if (cursor % 2 == 1) cursor += 1
    val ifdOff = cursor
    val total = ifdOff + 2 + tagData.length * 12 + 4

    val buf = ByteBuffer.allocate(total.toInt).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdOff.toInt)
    chunks.zip(chunkOffsets).foreach { case (c, off) =>
      while (buf.position() < off) buf.put(0.toByte)
      buf.put(c)
    }
    tagData.foreach { case (tag, _, _, payload) =>
      blockOffsets.get(tag).foreach { off =>
        while (buf.position() < off) buf.put(0.toByte)
        buf.put(payload)
      }
    }
    while (buf.position() < ifdOff) buf.put(0.toByte)
    buf.putShort(tagData.length.toShort)
    tagData.foreach { case (tag, tpe, count, payload) =>
      buf.putShort(tag.toShort).putShort(tpe.toShort).putInt(count)
      blockOffsets.get(tag) match {
        case Some(off) => buf.putInt(off.toInt)
        case None => // inline values are left-justified in the 4-byte slot
          val slot = java.util.Arrays.copyOf(payload, 4)
          buf.put(slot)
      }
    }
    buf.putInt(0) // no next IFD
    buf.array()
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
    while (!inf.finished() && off < expected) {
      val n = inf.inflate(out, off, expected - off)
      // a truncated/corrupt stream makes inflate() return 0 with
      // finished=false forever — fail instead of spinning (this runs on
      // untrusted binaryFile content inside executors)
      if (n == 0 && !inf.finished())
        throw new IllegalArgumentException("truncated or corrupt DEFLATE block")
      off += n
    }
    inf.end()
    require(off == expected, s"short inflate: $off of $expected bytes")
    out
  }

  private final case class Entry(tag: Int, tpe: Int, count: Int, valueOrOffset: Long,
                                 inline: Array[Byte])

  /** Read a GeoTIFF into a [[Raster]] (all bands). `item_id` defaults to
    * the file name stem, ts to 0 (the caller owns temporal metadata). */
  def read(file: File, itemId: String = null, ts: Long = 0L): Raster = {
    val id = if (itemId != null) itemId else file.getName.replaceAll("\\.tiff?$", "")
    parse(Files.readAllBytes(Paths.get(file.getPath)), id, ts)
  }

  /** Parse GeoTIFF bytes, all bands (the distributed-scan entry: pair with
    * Spark's binaryFile source — each executor decodes its own files). */
  def parse(bytes: Array[Byte], itemId: String, ts: Long = 0L): Raster =
    parseBands(bytes, itemId, ts, None)

  /**
   * Parse GeoTIFF bytes decoding only `select`ed bands (in the given order —
   * the reference's BAND_PARAM / selectSampleDimension path,
   * RasterEncoder.java:107-113, StacResource.java:433-437). None = all bands.
   * With planar interleave the unselected planes' strips/tiles are skipped
   * without decompression.
   */
  def parseBands(bytes: Array[Byte], itemId: String, ts: Long,
                 select: Option[Seq[Int]]): Raster = {
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
    val spp = math.max(1, scalar(TSamplesPerPixel, 1).toInt)
    val planarCfg = scalar(TPlanarConfig, 1).toInt
    require(planarCfg == 1 || planarCfg == 2, s"$itemId: bad PlanarConfiguration $planarCfg")
    val bitsAll = longs(TBitsPerSample)
    require(bitsAll.isEmpty || bitsAll.forall(_ == bitsAll.head),
            s"$itemId: heterogeneous BitsPerSample unsupported")
    val bits = bitsAll.headOption.getOrElse(1L).toInt
    val sfAll = longs(TSampleFormat)
    require(sfAll.isEmpty || sfAll.forall(_ == sfAll.head),
            s"$itemId: heterogeneous SampleFormat unsupported")
    val sampleFormat = sfAll.headOption.getOrElse(1L).toInt // 1 uint, 2 int, 3 float
    val compression = scalar(TCompression, 1).toInt
    require(compression == 1 || compression == 8,
            s"unsupported TIFF compression $compression (only none/deflate)")
    val bps = (bits + 7) / 8

    // band selection: plane -> output slot (-1 = skip)
    val sel = select.getOrElse(0 until spp)
    sel.foreach(b => require(b >= 0 && b < spp, s"$itemId: band $b of $spp"))
    val destOf = Array.fill(spp)(-1)
    sel.zipWithIndex.foreach { case (b, i) => destOf(b) = i }
    val bands = Array.fill(sel.length)(new Array[Double](w * h))

    val nodata: Option[Double] = ascii(TGdalNodata).flatMap { s =>
      val t = s.trim
      if (t.isEmpty) None
      else if (t.equalsIgnoreCase("nan")) Some(Double.NaN)
      else t.toDoubleOption
    }
    @inline def toNaN(v: Double): Double =
      if (nodata.exists(nd => !nd.isNaN && v == nd)) Double.NaN else v

    @inline def sampleAt(bb: ByteBuffer, idx: Int): Double = (sampleFormat, bits) match {
      case (3, 32) => bb.getFloat(idx).toDouble
      case (3, 64) => bb.getDouble(idx)
      case (2, 16) => bb.getShort(idx).toDouble
      case (2, 32) => bb.getInt(idx).toDouble
      case (1, 8)  => (bb.get(idx) & 0xff).toDouble
      case (1, 16) => (bb.getShort(idx) & 0xffff).toDouble
      case (1, 32) => (bb.getInt(idx).toLong & 0xffffffffL).toDouble
      case other   => throw new IllegalArgumentException(
        s"unsupported sample format/bits $other")
    }

    // decode one data chunk covering image rect (x0, top-down row0, cw_ x
    // ch_) with padded row width rw and sppC interleaved samples per pixel;
    // `plane` >= 0 pins the band (planar config), else samples map to bands
    // 0..sppC-1 (chunky)
    def decodeChunk(off: Long, cnt: Long, expected: Int, x0: Int, row0: Int,
                    cw_ : Int, ch_ : Int, rw: Int, sppC: Int, plane: Int): Unit = {
      val raw = java.util.Arrays.copyOfRange(bytes, off.toInt, (off + cnt).toInt)
      val data = if (compression == 8) inflateBytes(raw, expected) else raw
      val bb = ByteBuffer.wrap(data).order(order)
      var rr = 0
      while (rr < ch_) {
        val row = row0 + rr
        if (row < h) {
          val y = h - 1 - row
          var xi = 0
          while (xi < cw_) {
            val x = x0 + xi
            if (x < w) {
              val base = (rr * rw + xi) * sppC * bps
              var b = 0
              while (b < sppC) {
                val dst = destOf(if (plane >= 0) plane else b)
                if (dst >= 0)
                  bands(dst)(x * h + y) = toNaN(sampleAt(bb, base + b * bps))
                b += 1
              }
            }
            xi += 1
          }
        }
        rr += 1
      }
    }

    val planes = if (planarCfg == 2) spp else 1
    val sppC = if (planarCfg == 2) 1 else spp
    if (entries.contains(TTileOffsets)) {
      // tiled layout (tags 322-325): tiles left-to-right top-to-bottom,
      // planes consecutive; edge tiles padded to the full tile size
      val tw = scalar(TTileWidth).toInt; val tl = scalar(TTileLength).toInt
      require(tw > 0 && tl > 0, s"$itemId: bad tile dimensions ${tw}x$tl")
      val ta = (w + tw - 1) / tw; val td = (h + tl - 1) / tl
      val offsets = longs(TTileOffsets); val counts = longs(TTileByteCounts)
      require(offsets.length == ta * td * planes,
              s"$itemId: ${offsets.length} tiles, expected ${ta * td * planes}")
      val expected = tw * tl * sppC * bps
      var p = 0
      while (p < planes) {
        if (planarCfg != 2 || destOf(p) >= 0) { // skip unselected planes wholesale
          var t = 0
          while (t < ta * td) {
            val i = p * ta * td + t
            decodeChunk(offsets(i), counts(i), expected,
                        (t % ta) * tw, (t / ta) * tl, tw, tl, tw, sppC,
                        if (planarCfg == 2) p else -1)
            t += 1
          }
        }
        p += 1
      }
    } else {
      val offsets = longs(TStripOffsets)
      val counts = longs(TStripByteCounts)
      val rowsPerStrip = scalar(TRowsPerStrip, h).toInt
      val spi = (h + rowsPerStrip - 1) / rowsPerStrip // strips per plane
      require(offsets.length == spi * planes,
              s"$itemId: ${offsets.length} strips, expected ${spi * planes}")
      var p = 0
      while (p < planes) {
        if (planarCfg != 2 || destOf(p) >= 0) {
          var s = 0
          while (s < spi) {
            val i = p * spi + s
            val rows = math.min(rowsPerStrip, h - s * rowsPerStrip)
            decodeChunk(offsets(i), counts(i), rows * w * sppC * bps,
                        0, s * rowsPerStrip, w, rows, w, sppC,
                        if (planarCfg == 2) p else -1)
            s += 1
          }
        }
        p += 1
      }
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

    Raster(itemId, ts, w, h, minX, maxX, minY, maxY, epsg, bands.toSeq)
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
