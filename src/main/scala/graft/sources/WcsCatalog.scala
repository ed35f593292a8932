package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.TileGeometry

/**
 * WCS source semantics as a catalog table (reference S3-S5, U1-U2, F1-F4,
 * F8-F9, F11: adapters/wcs/WCSServiceManager.java). The reference talks to a
 * live geoserver; this engine represents the service as DataFrames —
 * capabilities → a `layers` catalog built once and broadcast, DescribeCoverage
 * → per-layer metadata rows — and keeps the request-building logic as pure,
 * golden-testable functions (no network in this environment by contract).
 */
object WcsCatalog {

  /** Per-layer metadata (DescribeCoverage result analog,
    * WCSServiceManager.java:344-479): envelope, grid shape, per-band nodata
    * (union of band + layer + resource values — U1, :155-174). */
  final case class Layer(
      identifier: String,
      minX: Double, maxX: Double, minY: Double, maxY: Double,
      epsg: Int,
      gridW: Int, gridH: Int,
      nodata: Seq[Double],
      fetchedAtMs: Long)

  /** Layer metadata expiry: 2 h (WCSServiceManager.java:48-49). */
  val LayerExpiryMs: Long = 120L * 60 * 1000

  def isExpired(l: Layer, nowMs: Long): Boolean = nowMs - l.fetchedAtMs > LayerExpiryMs

  /** Geoserver-style `__` -> `:` namespace translation (F1,
    * WCSServiceManager.java:52-56, :231-237). */
  def requestIdentifier(id: String): String = id.replace("__", ":")

  /** Whitespace-split numeric parse (F4, WCSServiceManager.java:371-376). */
  def doubleArrayFromString(s: String): Array[Double] =
    s.trim.split("\\s+").filter(_.nonEmpty).map(_.toDouble)

  /** EPSG normalization (F9, Geotools.java:487-525, minimal form): find an
    * EPSG code among CRS identifiers like "EPSG:4326" / "urn:ogc:def:crs:EPSG::4326". */
  def epsgOf(crs: String): Option[Int] = {
    val m = "(?i)EPSG:*:?(\\d+)".r.findFirstMatchIn(crs)
    m.map(_.group(1).toInt)
  }

  /** Capabilities content hash — unchanged capabilities skip the refresh
    * (F11, WCSServiceManager.java:646-663). */
  def contentHash(capabilitiesXml: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(capabilitiesXml.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /**
   * GetCoverage URL (F8, WCSServiceManager.java:775-919), v1.0.x form:
   * bbox/crs/responseCRS/width/height/format=GeoTIFF, with the
   * degenerate-envelope jiggle (F2, :801-837): a single-point request is
   * widened by axisRange/3,900,000 so the server doesn't reject it.
   */
  def buildRetrieveUrl(serviceUrl: String, layerId: String, version: String,
                       geom: TileGeometry, interpolation: Option[String] = None,
                       axisRangeX: Double = 360.0, axisRangeY: Double = 180.0): String = {
    var west = geom.minX; var east = geom.maxX
    var south = geom.minY; var north = geom.maxY
    if (math.abs(west - east) < 1e-9) {
      val delta = axisRangeX / 3900000.0
      west -= delta; east += delta
    }
    if (math.abs(north - south) < 1e-9) {
      val delta = axisRangeY / 3900000.0
      south -= delta; north += delta
    }
    val crs = s"EPSG:${geom.epsg}"
    val base =
      if (version.startsWith("1.0"))
        s"$serviceUrl?service=WCS&version=$version&request=GetCoverage" +
          s"&coverage=${requestIdentifier(layerId)}" +
          s"&bbox=$west,$south,$east,$north&crs=$crs&responseCRS=$crs" +
          s"&width=${geom.width}&height=${geom.height}&format=GeoTIFF"
      else if (version.startsWith("1."))
        s"$serviceUrl?service=WCS&version=$version&request=GetCoverage" +
          s"&identifier=${requestIdentifier(layerId)}" +
          s"&boundingbox=$west,$south,$east,$north,$crs&responseCRS=$crs" +
          s"&width=${geom.width}&height=${geom.height}&format=GeoTIFF"
      else
        throw new UnsupportedOperationException(s"WCS version $version is not supported")
    interpolation.fold(base)(i => s"$base&interpolation=$i")
  }

  /** The capabilities catalog as a DataFrame (S4): one row per layer,
    * broadcast-sized by construction. */
  def layersTable(spark: SparkSession, layers: Seq[Layer]): DataFrame = {
    import spark.implicits._
    layers.toDF()
  }

  /** Identifier membership against the catalog (U2,
    * WCSServiceManager.java:921-923). */
  def containsIdentifier(layers: DataFrame, id: String): Boolean = {
    import layers.sparkSession.implicits._
    layers.filter($"identifier" === id).limit(1).count() > 0
  }

  /** Nodata set union across metadata levels (U1). */
  def nodataUnion(bandNodata: Seq[Double], layerDefault: Seq[Double],
                  resourceParam: Option[Double]): Set[Double] =
    bandNodata.toSet ++ layerDefault.toSet ++ resourceParam.toSet
}
