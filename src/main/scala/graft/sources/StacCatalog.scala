package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.SpatialJoin

/**
 * STAC source semantics as DataFrames (reference S6-S8, J1-J2, P7, F12, A5,
 * O1: the adapters/stac package). A collection is an items table
 * (item_id, ring, t_start, t_end, ts, epsg, assets: map<id, (href, mediaType,
 * bandName)>); search pushes bbox + time filters through the engine's own
 * spatial/temporal join operators instead of a remote search endpoint.
 */
object StacCatalog {

  /** Raster/vector media-type whitelists + extension fallback (P7,
    * StacResource.java:123-154). Types are compared space-stripped,
    * lowercase — exactly the reference's normalization. */
  val SupportedRasterMediaTypes: Set[String] = Set(
    "image/tiff;application=geotiff",
    "image/vnd.stac.geotiff",
    "image/tiff;application=geotiff;profile=cloud-optimized",
    "image/vnd.stac.geotiff;profile=cloud-optimized",
    "image/vnd.stac.geotiff;cloud-optimized=true")
  val SupportedVectorMediaTypes: Set[String] =
    Set("application/geo+json", "application/vnd.shp", "application/gml+xml")
  val SupportedMediaExtensions: Set[String] =
    Set(".tif", ".tiff", ".shp", ".shx", ".dbf", ".json", ".geojson", "gml", "xml")

  def isSupportedMediaType(mediaType: Option[String], href: String): Boolean =
    mediaType match {
      case None =>
        val h = href.toLowerCase
        SupportedMediaExtensions.exists(h.endsWith)
      case Some(t) =>
        val norm = t.replace(" ", "").toLowerCase
        SupportedRasterMediaTypes.contains(norm) || SupportedVectorMediaTypes.contains(norm)
    }

  /** Region marker -> https endpoint prefix for the cloudferro s3 rewrite
    * (F12, StacResource.java:390-411) — the ONE place the region table
    * lives; both the Scala and the Column rewrite derive from it. */
  val S3Rewrites: Seq[(String, String)] = Seq(
    "waw4-1" -> "https://s3.waw4-1.cloudferro.com/swift/v1/",
    "waw3-1" -> "https://s3.waw3-1.cloudferro.com/swift/v1/")

  /** s3:// -> https rewrite; unknown s3 regions pass through. */
  def rewriteHref(href: String): String =
    if (href.startsWith("s3://"))
      S3Rewrites.collectFirst { case (marker, prefix) if href.contains(marker) =>
        prefix + href.substring(5)
      }.getOrElse(href)
    else href

  val rewriteHrefUdf = udf(rewriteHref _)

  /**
   * Item search (S7/J1/J2): bbox filter via the cell-cover prefilter +
   * exact refine (the engine-side restatement of the server-side bbox
   * search), plus the reference's temporal predicate
   * (StacEngine.java:197-223): an item matches when its interval overlaps
   * [qStart, qEnd]; items lacking t_end match iff t_start <= qStart.
   *
   * @param items (item_id, ring: array<double>, t_start, t_end nullable, ts, epsg, href, media_type)
   */
  def searchItems(items: DataFrame, bbox: (Double, Double, Double, Double),
                  qStart: Long, qEnd: Long): DataFrame = {
    import items.sparkSession.implicits._
    val (minX, maxX, minY, maxY) = bbox
    // polygon-vs-bbox selection uses the item envelope (exact for the bbox
    // query the reference issues); the ring is traversed once — xs/ys split
    // by coordinate parity, envelope from four aggregates over those
    val env = items
      .withColumn("xs", filter(transform($"ring", (v, i) => struct(v.as("v"), i.as("i"))),
                               s => s("i") % 2 === 0))
      .withColumn("ys", filter(transform($"ring", (v, i) => struct(v.as("v"), i.as("i"))),
                               s => s("i") % 2 === 1))
      .withColumn("i_minx", aggregate($"xs", lit(Double.MaxValue), (acc, s) => least(acc, s("v"))))
      .withColumn("i_maxx", aggregate($"xs", lit(Double.MinValue), (acc, s) => greatest(acc, s("v"))))
      .withColumn("i_miny", aggregate($"ys", lit(Double.MaxValue), (acc, s) => least(acc, s("v"))))
      .withColumn("i_maxy", aggregate($"ys", lit(Double.MinValue), (acc, s) => greatest(acc, s("v"))))
      .drop("xs", "ys")
    env
      .filter($"i_minx" < maxX && $"i_maxx" > minX && $"i_miny" < maxY && $"i_maxy" > minY)
      .filter(
        (($"t_end".isNotNull) && $"t_end" >= qStart && $"t_start" <= qEnd) ||
        ($"t_end".isNull && $"t_start" <= qStart))
      .drop("i_minx", "i_maxx", "i_miny", "i_maxy")
  }

  /** Multi-EPSG distinct check (A5, StacEngine.java:265-273): returns the
    * distinct EPSG codes; callers warn when > 1. */
  def distinctEpsg(items: DataFrame): Array[Int] = {
    import items.sparkSession.implicits._
    items.select($"epsg").distinct().as[Int].collect().sorted
  }

  /** Deterministic item ordering for SUBSTITUTE merges (O1/A2,
    * StacEngine.java:283-296): by timestamp, erroring on null timestamps as
    * the reference does; item_id tiebreak added for full determinism. */
  def sortedByTimestamp(items: DataFrame): DataFrame = {
    import items.sparkSession.implicits._
    val nNull = items.filter($"ts".isNull).count()
    require(nNull == 0, s"$nNull items without timestamp cannot be sorted for SUBSTITUTE merge")
    items.orderBy($"ts", $"item_id")
  }

  /** Asset resolution (S8, StacResource.java:357-373): by asset id, falling
    * back to `eo:bands[].name` match; supported-media filter applied. */
  def resolveAsset(assets: Seq[(String, String, Option[String], Option[String])],
                   idOrBand: String): Option[(String, String)] = {
    // assets: (assetId, href, mediaType, bandName)
    val supported = assets.filter(a => isSupportedMediaType(a._3, a._2))
    supported.collectFirst { case (id, href, _, _) if id == idOrBand => (id, rewriteHref(href)) }
      .orElse(supported.collectFirst {
        case (id, href, _, Some(b)) if b == idOrBand => (id, rewriteHref(href))
      })
  }
}
