package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * STAC JSON document ingest (S6/F6 completion): `from_json` schemas for
 * catalog / collection / item documents and the column-level navigation the
 * reference does imperatively over Jackson/kong JSON maps:
 *
 *  - rel-typed link navigation (StacParser.java:70-92 containsLinkTo /
 *    getLinkTo / getLinksTo)
 *  - relative item-href resolution (StacParser.java:94-103 getUrlOfItem)
 *  - item field extraction: id, geometry polygon ring OR bbox fallback,
 *    properties datetime / start_datetime / end_datetime, proj:epsg
 *    (StacResource.java:501-539, StacEngine.java:196-223)
 *  - asset resolution by id falling back to eo:bands name, with the
 *    supported-media filter and s3->https rewrite
 *    (StacResource.java:357-373 + 390-411)
 *
 * Everything lands in the items-DataFrame shape that [[StacCatalog]]
 * operates on, so a parsed static catalog drops straight into searchItems /
 * mosaic pipelines. Parsing is a projection (from_json is codegen-friendly
 * and prunes unused fields), so a 10^9-item catalog scan parses in parallel
 * with no driver involvement.
 */
object StacIngest {

  val assetType: StructType = StructType(Seq(
    StructField("href", StringType),
    StructField("type", StringType),
    StructField("eo:bands", ArrayType(StructType(Seq(StructField("name", StringType)))))))

  val linkType: StructType = StructType(Seq(
    StructField("rel", StringType),
    StructField("href", StringType)))

  /** STAC item (GeoJSON Feature) document schema. */
  val itemSchema: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("stac_version", StringType),
    StructField("id", StringType),
    StructField("bbox", ArrayType(DoubleType)),
    StructField("geometry", StructType(Seq(
      StructField("type", StringType),
      StructField("coordinates", ArrayType(ArrayType(ArrayType(DoubleType))))))),
    StructField("properties", StructType(Seq(
      StructField("datetime", StringType),
      StructField("start_datetime", StringType),
      StructField("end_datetime", StringType),
      StructField("proj:epsg", IntegerType)))),
    StructField("assets", MapType(StringType, assetType)),
    StructField("links", ArrayType(linkType))))

  /** STAC catalog / collection document schema (the navigation surface:
    * StacResource requiredFieldsOfCollection + links + extent). */
  val collectionSchema: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("stac_version", StringType),
    StructField("id", StringType),
    StructField("title", StringType),
    StructField("description", StringType),
    StructField("license", StringType),
    StructField("keywords", ArrayType(StringType)),
    StructField("extent", StructType(Seq(
      StructField("spatial", StructType(Seq(
        StructField("bbox", ArrayType(ArrayType(DoubleType)))))),
      StructField("temporal", StructType(Seq(
        StructField("interval", ArrayType(ArrayType(StringType))))))))),
    StructField("links", ArrayType(linkType))))

  /** First href of the rel-typed links (getLinkTo: case-insensitive rel
    * match, first wins); null when absent. */
  def linkTo(links: Column, rel: String): Column =
    get(filter(links, l => lower(l.getField("rel")) === rel.toLowerCase), lit(0)).getField("href")

  /** All hrefs of the rel-typed links (getLinksTo). */
  def linksTo(links: Column, rel: String): Column =
    transform(filter(links, l => lower(l.getField("rel")) === rel.toLowerCase),
              l => l.getField("href"))

  /** Relative item-href resolution against the collection URL
    * (StacParser.getUrlOfItem:94-103, same replace semantics). */
  def urlOfItem(collectionUrl: String, collectionId: String, href: String): String =
    if (href.startsWith(".."))
      collectionUrl.replace("/collection.json", "").replace(collectionId, "") +
        href.replace("../", "")
    else if (href.startsWith("."))
      collectionUrl.replace("collection.json", "") + href.replace("./", "")
    else href

  /** Media support predicate as a Column (the whitelists of
    * StacCatalog.isSupportedMediaType, StacResource.java:123-154). */
  private def supportedMedia(asset: Column): Column = {
    val t = asset.getField("type")
    val href = asset.getField("href")
    val norm = lower(regexp_replace(t, " ", ""))
    val byType = norm.isin(
      (StacCatalog.SupportedRasterMediaTypes ++ StacCatalog.SupportedVectorMediaTypes).toSeq: _*)
    val byExt = StacCatalog.SupportedMediaExtensions
      .map(e => lower(href).endsWith(e)).reduce(_ || _)
    when(t.isNull, byExt).otherwise(byType)
  }

  /** Asset href resolution by asset id, falling back to eo:bands name match,
    * supported-media filtered, s3 rewritten (column form of
    * StacCatalog.resolveAsset). */
  def assetHref(assets: Column, idOrBand: String): Column = {
    val byId = try_element_at(assets, lit(idOrBand))
    val idHref = when(supportedMedia(byId), byId.getField("href"))
    val byBand = get(filter(map_values(assets), a =>
      supportedMedia(a) &&
        exists(coalesce(a.getField("eo:bands"), array()),
               b => b.getField("name") === idOrBand)), lit(0))
    val raw = coalesce(idHref, byBand.getField("href"))
    // s3 -> https rewrite (F12), derived from the same region table the
    // Scala path uses (StacCatalog.S3Rewrites); unknown regions pass through
    StacCatalog.S3Rewrites.foldLeft(raw) { case (acc, (marker, prefix)) =>
      when(raw.startsWith("s3://") && raw.contains(marker),
           concat(lit(prefix), substring(raw, 6, 1000000))).otherwise(acc)
    }
  }

  /**
   * Parse a column of STAC item JSON documents into the [[StacCatalog]]
   * items shape: (item_id, ring, t_start, t_end, ts, epsg, assets, links).
   * The ring comes from the geometry's outer ring when present (flattened to
   * the engine's interleaved [x0,y0,x1,y1,...] layout), else from the bbox
   * (StacResource.java:515-529: geometry first, bbox fallback, error when
   * neither). Items with a single datetime get t_start = t_end = ts
   * (StacEngine.java:196-211).
   */
  def parseItems(docs: DataFrame, jsonCol: String): DataFrame = {
    // parse ONCE into a struct column in its own projection: the parsed `j`
    // is referenced by 8+ downstream expressions, which keeps CollapseProject
    // from inlining (and so re-evaluating) the from_json per reference — the
    // difference between one JSON parse per row and dozens (measured 7x on
    // the q65 oracle query)
    val parsed = docs.select(col("*"), from_json(col(jsonCol), itemSchema).as("__j"))
    parsed.select(itemProjection(col("__j")): _*)
  }

  /** The item struct -> columns mapping shared by [[parseItems]] (whole-doc
    * items) and [[StacTraversal]] (items exploded from search-page
    * FeatureCollections — same struct shape). */
  private[sources] def itemProjection(j: Column): Seq[Column] = {
    val props = j.getField("properties")
    val bbox = j.getField("bbox")
    // footprint: the geometry's outer ring when the POLYGON coordinates
    // parsed (a MultiPolygon/Point geometry leaves coordinates null in this
    // schema — partial-result parsing), else the bbox ring; gating on the
    // geometry struct alone would lose the bbox fallback for those items
    val coords = j.getField("geometry").getField("coordinates")
    val ring = coalesce(
      when(coords.isNotNull, flatten(get(coords, lit(0)))),
      array(
        get(bbox, lit(0)), get(bbox, lit(1)), get(bbox, lit(2)), get(bbox, lit(1)),
        get(bbox, lit(2)), get(bbox, lit(3)), get(bbox, lit(0)), get(bbox, lit(3))))
    def ms(c: Column): Column = unix_millis(c.cast("timestamp"))
    val ts = ms(coalesce(props.getField("datetime"), props.getField("start_datetime")))
    Seq(
      j.getField("id").as("item_id"),
      ring.as("ring"),
      coalesce(ms(props.getField("start_datetime")), ts).as("t_start"),
      coalesce(ms(props.getField("end_datetime")), ts).as("t_end"),
      ts.as("ts"),
      coalesce(props.getField("proj:epsg"), lit(4326)).as("epsg"),
      j.getField("assets").as("assets"),
      j.getField("links").as("links"))
  }

  /** Parse catalog / collection documents (id, title, license, spatial bbox,
    * temporal interval, links) — the navigation table for static catalogs. */
  def parseCollections(docs: DataFrame, jsonCol: String): DataFrame = {
    val parsed = docs.select(col("*"), from_json(col(jsonCol), collectionSchema).as("__j"))
    val j = col("__j")
    parsed.select(
      j.getField("id").as("collection_id"),
      j.getField("type").as("doc_type"),
      j.getField("title").as("title"),
      j.getField("license").as("license"),
      get(j.getField("extent").getField("spatial").getField("bbox"), lit(0)).as("bbox"),
      get(j.getField("extent").getField("temporal").getField("interval"), lit(0)).as("interval"),
      j.getField("links").as("links"))
  }
}
