package graft.sources

import java.io.{DataInputStream, DataOutputStream, File, FileInputStream, FileOutputStream}
import java.awt.image.BufferedImage
import javax.imageio.ImageIO

import graft.model.Raster
import graft.raster.DataKey

/**
 * Raster import/export (reference S1-S2, S9-S11, O3, F13:
 * library/GeodataIO.java, adapters/raster/RasterEncoder.java:392-431,
 * utils/Viewport.java). Two on-disk formats behind one entry point:
 * real single-band GeoTIFF via the pure-Scala [[GeoTiff]] codec (.tif/.tiff
 * — the reference's native format, no GeoTools needed), and "graft-raster"
 * (.graster) — a multi-band georeferenced binary container for full-fidelity
 * engine interchange (all bands + item identity + timestamp).
 */
object GeodataIO {

  val Magic = 0x47524152 // "GRAR"

  /** Accepted raster file extensions, priority order (S2,
    * RasterAdapter.java:42-47: {tif, tiff} + sidecars). */
  val FileExtensions: Seq[String] = Seq("graster", "tif", "tiff")
  val SidecarExtensions: Seq[String] =
    Seq("tfw", "prj", "tif.ovr", "tif.aux.xml", "txt", "pdf", "aux.csv")

  /** Primary-file resolution: first readable file with a known raster
    * extension wins (S2, RasterEncoder.java:392-410). */
  def resolvePrimaryFile(files: Seq[File]): Option[File] =
    files.find { f =>
      FileExtensions.exists(e => f.getName.toLowerCase.endsWith("." + e)) &&
        f.exists() && f.canRead
    }

  private def isTiff(file: File): Boolean = {
    val n = file.getName.toLowerCase
    n.endsWith(".tif") || n.endsWith(".tiff")
  }

  /** Write a raster (S9): GeoTIFF for .tif/.tiff, container otherwise. */
  def writeRaster(r: Raster, file: File): Unit =
    if (isTiff(file)) GeoTiff.write(r, file)
    else writeContainer(r, file)

  /** Read a raster back (S1 — the `readCoverage` entry point). */
  def readRaster(file: File): Raster =
    if (isTiff(file)) GeoTiff.read(file)
    else readContainer(file)

  /** Write a raster to the multi-band binary container. */
  def writeContainer(r: Raster, file: File): Unit = {
    val out = new DataOutputStream(new FileOutputStream(file))
    try {
      out.writeInt(Magic)
      out.writeUTF(r.item_id); out.writeLong(r.ts)
      out.writeInt(r.width); out.writeInt(r.height)
      out.writeDouble(r.minX); out.writeDouble(r.maxX)
      out.writeDouble(r.minY); out.writeDouble(r.maxY)
      out.writeInt(r.epsg)
      out.writeInt(r.bands.length)
      r.bands.foreach { b => b.foreach(out.writeDouble) }
    } finally out.close()
  }

  /** Read a raster from the multi-band binary container. */
  def readContainer(file: File): Raster = {
    val in = new DataInputStream(new FileInputStream(file))
    try {
      require(in.readInt() == Magic, s"${file.getName} is not a graft-raster file")
      val id = in.readUTF(); val ts = in.readLong()
      val w = in.readInt(); val h = in.readInt()
      val minX = in.readDouble(); val maxX = in.readDouble()
      val minY = in.readDouble(); val maxY = in.readDouble()
      val epsg = in.readInt()
      val nb = in.readInt()
      val bands = Seq.fill(nb)(Array.fill(w * h)(in.readDouble()))
      Raster(id, ts, w, h, minX, maxX, minY, maxY, epsg, bands)
    } finally in.close()
  }

  /** Viewport aspect-fit (O3, Viewport.java:83-111) — same integer math. */
  def viewportSize(viewportWidth: Int, viewportHeight: Int,
                   mapWidth: Int, mapHeight: Int): (Int, Int) = {
    val ar = mapWidth.toDouble / mapHeight
    if (mapWidth > mapHeight) {
      var x = viewportWidth
      var y = (x.toDouble / ar).toInt
      if (y > viewportHeight) {
        val fc = viewportHeight.toDouble / y
        x = (x * fc).toInt; y = (y * fc).toInt
      }
      (x, y)
    } else {
      var y = viewportHeight
      var x = (y.toDouble * ar).toInt
      if (x > viewportWidth) {
        val fc = viewportWidth.toDouble / x
        x = (x * fc).toInt; y = (y * fc).toInt
      }
      (x, y)
    }
  }

  /** Jet-style color ramp (F13 analog, utils/Renderer.java:614-838 —
    * recovered semantics: blue -> cyan -> yellow -> red over [0,1]). */
  def jet(t: Double): Int = {
    val x = math.max(0.0, math.min(1.0, t))
    def ch(v: Double) = (math.max(0.0, math.min(1.0, v)) * 255).toInt
    val r = ch(1.5 - math.abs(4 * x - 3))
    val g = ch(1.5 - math.abs(4 * x - 2))
    val b = ch(1.5 - math.abs(4 * x - 1))
    (0xff << 24) | (r << 16) | (g << 8) | b
  }

  /**
   * PNG render of a raster band (S10, GeodataIO.java:91-156): viewport
   * aspect-fit, nearest sampling, jet ramp over the data range, NaN ->
   * transparent. Driver-side export — not a distributed operator by design
   * (matches the reference's export path).
   */
  def exportPng(r: Raster, file: File, viewportW: Int = 800, viewportH: Int = 800,
                band: Int = 0, ramp: Option[String] = None): Unit = {
    val values = r.bands(band)
    val s = graft.raster.TileEncoder.stats(values)
    val (w, h) = viewportSize(viewportW, viewportH, r.width, r.height)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
    val range = if (s.max > s.min) s.max - s.min else 1.0
    // named ramp (ColorRamps table, the reference's Renderer palettes) or
    // the default smooth jet
    val table = ramp.flatMap(ColorRamps.byName)
    def color(t: Double): Int = table match {
      case Some(tb) => ColorRamps.argb(tb, t)
      case None     => jet(t)
    }
    var px = 0
    while (px < w) {
      val sx = (px.toDouble / w * r.width).toInt
      var py = 0
      while (py < h) {
        // image rows top-down; grid rows south-up
        val sy = r.height - 1 - (py.toDouble / h * r.height).toInt
        val v = values(sx * r.height + sy)
        img.setRGB(px, py, if (java.lang.Double.isNaN(v)) 0 else color((v - s.min) / range))
        py += 1
      }
      px += 1
    }
    ImageIO.write(img, "png", file)
  }

  /** Categorical sidecar (S11, GeodataIO.java:463-487 + RasterAuxXml): the
    * (Value, Label) attribute table next to the exported raster — CSV here
    * (the reference writes DBF + PAM aux-XML). */
  def writeAuxTable(dataKey: DataKey, file: File): Unit = {
    val w = new java.io.PrintWriter(file)
    try {
      w.println("Value,Label")
      dataKey.entries.toSeq.sortBy(_._1).foreach { case (code, label) =>
        w.println(s"$code,$label")
      }
    } finally w.close()
  }

  /**
   * Full observation export (GeodataIO.java:190-284 exportObservation): the
   * raster as GeoTIFF plus its sidecars, optionally zipped. The reference's
   * conventions are kept:
   *  - the raster is written as `<stem>.tiff`;
   *  - a categorical observation (dataKey present) adds the value/label
   *    attribute table as `<stem>.tiff.vat.csv` (the reference's
   *    `.tiff.vat.dbf`, GeodataIO.java:216-221 writeAuxDbf — CSV here);
   *  - a `.zip` target name means "bundle with style sidecars"
   *    (`addStyle = file.getName().endsWith(".zip")`, GeodataIO.java:197):
   *    everything is zipped into the target with deterministic entry order
   *    and timestamps (reproducible bytes — same raster, same zip);
   *  - any other target name writes the files next to it and returns the
   *    tiff (the reference's `doNotZip` branch).
   * Returns the file actually produced.
   */
  def exportObservation(r: Raster, file: File, dataKey: Option[DataKey] = None,
                        band: Int = 0): File = {
    val zip = file.getName.toLowerCase.endsWith(".zip")
    val stemName = file.getName.replaceAll("(?i)\\.(zip|tif|tiff)$", "")
    val dir = if (zip) {
      val d = java.nio.file.Files.createTempDirectory("graft_export").toFile
      d.deleteOnExit(); d
    } else file.getAbsoluteFile.getParentFile
    val tiff = new File(dir, s"$stemName.tiff")
    GeoTiff.write(r, tiff, band = band)
    val sidecars = dataKey.map { k =>
      val vat = new File(dir, s"$stemName.tiff.vat.csv")
      writeAuxTable(k, vat)
      vat
    }.toSeq
    if (!zip) tiff
    else {
      val out = new java.util.zip.ZipOutputStream(new FileOutputStream(file))
      try {
        (tiff +: sidecars).sortBy(_.getName).foreach { f =>
          val e = new java.util.zip.ZipEntry(f.getName)
          e.setTime(0L) // deterministic archive bytes
          out.putNextEntry(e)
          java.nio.file.Files.copy(f.toPath, out)
          out.closeEntry()
        }
      } finally out.close()
      file
    }
  }
}
