package graft.sources

import java.io.StringReader
import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.{Document, Element, Node, NodeList}
import org.xml.sax.InputSource

import scala.collection.mutable

/**
 * WCS capabilities / DescribeCoverage XML parsing (F7 — the wire-format step
 * the catalog model was missing), via the JDK DOM with namespace-wildcard
 * element matching (the reference flattens XML to maps with underscore-java
 * and walks paths; same fields, WCSServiceManager.java:622-773 capabilities,
 * :344-479 coverage descriptions):
 *
 *  - v1.x capabilities: ContentMetadata/CoverageOfferingBrief/name
 *  - v2.x capabilities: Contents/CoverageSummary/CoverageId +
 *    WGS84BoundingBox Lower/UpperCorner
 *  - v1.x DescribeCoverage: identifier, Domain BoundingBox loop (skipping
 *    the axis-swapped urn:ogc:def:crs:EPSG::4326 entry, later entries
 *    override — :365-385), range nullValue (skipping Infinity — :388-395)
 *  - v2.x DescribeCoverage: CoverageId, gml:Envelope srsName + corners,
 *    swe:field band constraints (a degenerate AllowedValues interval IS the
 *    nodata value — :149-161; nilValue adds to the set — :163-174), grid
 *    shape from GridEnvelope high-low (:456-465)
 *
 * Parsing is XXE-hardened (doctypes disallowed, no entity expansion): WCS
 * endpoints are remote, untrusted XML producers.
 */
object WcsXml {

  // one DocumentBuilder per thread: parsing runs inside distributed UDFs /
  // mapPartitions, and building a factory per document would dominate
  private val builderTL = ThreadLocal.withInitial[javax.xml.parsers.DocumentBuilder] { () =>
    val f = DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(true)
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setXIncludeAware(false)
    f.setExpandEntityReferences(false)
    f.newDocumentBuilder()
  }

  private def parseDoc(xml: String): Document = {
    val b = builderTL.get()
    b.reset()
    b.parse(new InputSource(new StringReader(xml)))
  }

  private def asSeq(nl: NodeList): Seq[Element] =
    (0 until nl.getLength).map(nl.item).collect { case e: Element => e }

  /** All descendant elements with the given local name, any namespace. */
  private def descendants(e: Element, local: String): Seq[Element] =
    asSeq(e.getElementsByTagNameNS("*", local))
  private def descendants(d: Document, local: String): Seq[Element] =
    asSeq(d.getElementsByTagNameNS("*", local))

  private def firstText(e: Element, local: String): Option[String] =
    descendants(e, local).headOption.map(_.getTextContent.trim)

  /** Layer identifiers from a GetCapabilities document (v1:
    * CoverageOfferingBrief/name; v2: CoverageSummary/CoverageId). */
  def capabilityIdentifiers(xml: String, majorVersion: Int): Seq[String] = {
    val doc = parseDoc(xml)
    if (majorVersion == 1)
      descendants(doc, "CoverageOfferingBrief").flatMap(firstText(_, "name"))
    else
      descendants(doc, "CoverageSummary").flatMap(firstText(_, "CoverageId"))
  }

  /** v2.x capability summaries with their WGS84 envelopes — the rows the
    * reference seeds WCSLayer objects from (:726-755). Corners are
    * lon lat ordered (OGC WGS84BoundingBox). */
  def capabilitySummaries(xml: String): Seq[(String, (Double, Double, Double, Double))] = {
    val doc = parseDoc(xml)
    descendants(doc, "CoverageSummary").flatMap { cs =>
      for {
        id <- firstText(cs, "CoverageId")
        bb <- descendants(cs, "WGS84BoundingBox").headOption
        lo <- firstText(bb, "LowerCorner").map(WcsCatalog.doubleArrayFromString)
        hi <- firstText(bb, "UpperCorner").map(WcsCatalog.doubleArrayFromString)
      } yield (id, (lo(0), hi(0), lo(1), hi(1)))
    }
  }

  /** Capabilities XML -> seed catalog rows (the reference's WCSLayer seeding
    * loop, :726-755): identifier + WGS84 envelope; grid shape and nodata
    * arrive later from DescribeCoverage. */
  def layersFromCapabilities(xml: String, fetchedAtMs: Long): Seq[WcsCatalog.Layer] =
    capabilitySummaries(xml).map { case (id, (minX, maxX, minY, maxY)) =>
      WcsCatalog.Layer(id, minX, maxX, minY, maxY, 4326, 0, 0, Nil, fetchedAtMs)
    }

  /** DescribeCoverage -> catalog Layer. The default frame is the WGS84 whole
    * world (the reference defaults to its wgs84envelope + lat/lon before any
    * BoundingBox overrides it — :360-362, :420-422). */
  def parseDescribeCoverage(xml: String, majorVersion: Int,
                            fetchedAtMs: Long): WcsCatalog.Layer = {
    val doc = parseDoc(xml)
    if (majorVersion == 1) parseV1(doc, fetchedAtMs) else parseV2(doc, fetchedAtMs)
  }

  private def parseV1(doc: Document, fetchedAtMs: Long): WcsCatalog.Layer = {
    val id = descendants(doc, "Identifier").headOption
      .orElse(descendants(doc, "name").headOption)
      .map(_.getTextContent.trim)
      .getOrElse(throw new IllegalArgumentException("WCS 1.x coverage without identifier"))
    // default WGS84 world envelope; later BoundingBox entries override,
    // except the axis-swapped urn EPSG::4326 form which is ignored (:365-371)
    var env = (-180.0, 180.0, -90.0, 90.0)
    var epsg = 4326
    descendants(doc, "BoundingBox").foreach { bb =>
      val crs = Option(bb.getAttribute("crs")).filter(_.nonEmpty)
        .orElse(firstText(bb, "crs"))
      if (crs.isDefined && crs.get != "urn:ogc:def:crs:EPSG::4326") {
        for {
          lo <- firstText(bb, "LowerCorner").map(WcsCatalog.doubleArrayFromString)
          hi <- firstText(bb, "UpperCorner").map(WcsCatalog.doubleArrayFromString)
        } {
          env = (lo(0), hi(0), lo(1), hi(1))
          epsg = WcsCatalog.epsgOf(crs.get).getOrElse(4326)
        }
      }
    }
    // range nullValues, skipping Infinity markers (:388-395)
    val nodata = mutable.LinkedHashSet.empty[Double]
    descendants(doc, "nullValues").foreach { nv =>
      descendants(nv, "singleValue").map(_.getTextContent.trim)
        .filterNot(_.contains("Infinity"))
        .foreach(v => nodata += v.toDouble)
    }
    WcsCatalog.Layer(id, env._1, env._2, env._3, env._4, epsg, 0, 0,
                     nodata.toSeq, fetchedAtMs)
  }

  private def parseV2(doc: Document, fetchedAtMs: Long): WcsCatalog.Layer = {
    val cov = descendants(doc, "CoverageDescription").headOption
      .getOrElse(throw new IllegalArgumentException("no CoverageDescription element"))
    val id = firstText(cov, "CoverageId")
      .getOrElse(throw new IllegalArgumentException("WCS 2.x coverage without CoverageId"))
    val envEl = descendants(cov, "boundedBy").flatMap(descendants(_, "Envelope")).headOption
    val (env, epsg) = envEl match {
      case Some(e) =>
        val lo = firstText(e, "lowerCorner").map(WcsCatalog.doubleArrayFromString)
        val hi = firstText(e, "upperCorner").map(WcsCatalog.doubleArrayFromString)
        val srs = Option(e.getAttribute("srsName")).filter(_.nonEmpty)
        val code = srs.flatMap(WcsCatalog.epsgOf).getOrElse(4326)
        // the urn EPSG::4326 form is axis-swapped (lat lon) in GML — the
        // same case the v1 parser skips outright (:365-371); here the
        // corners are un-swapped so the Layer stays lon/lat like the rest
        // of the engine
        val swap = srs.exists(_.endsWith("urn:ogc:def:crs:EPSG::4326")) ||
                   srs.contains("urn:ogc:def:crs:EPSG::4326")
        ((lo, hi) match {
          case (Some(l), Some(h)) if swap => (l(1), h(1), l(0), h(0))
          case (Some(l), Some(h))         => (l(0), h(0), l(1), h(1))
          case _                          => (-180.0, 180.0, -90.0, 90.0)
        }, code)
      case None => ((-180.0, 180.0, -90.0, 90.0), 4326)
    }
    // band nodata from swe:field constraints (:142-181): a degenerate
    // AllowedValues interval is the nodata value; nilValue always is
    val nodata = mutable.LinkedHashSet.empty[Double]
    descendants(cov, "field").foreach { f =>
      firstText(f, "interval").map(WcsCatalog.doubleArrayFromString).foreach { iv =>
        if (iv.length >= 2 && math.abs(iv(0) - iv(1)) < 1e-9) nodata += iv(0)
      }
      descendants(f, "nilValue").map(_.getTextContent.trim)
        .filter(_.nonEmpty).foreach(v => nodata += v.toDouble)
    }
    // grid shape = GridEnvelope high - low per axis (:456-465)
    val (gw, gh) = descendants(cov, "GridEnvelope").headOption.map { ge =>
      val lo = firstText(ge, "low").map(_.split("\\s+").map(_.toInt)).getOrElse(Array(0, 0))
      val hi = firstText(ge, "high").map(_.split("\\s+").map(_.toInt)).getOrElse(Array(0, 0))
      (hi(0) - lo(0), hi(1) - lo(1))
    }.getOrElse((0, 0))
    WcsCatalog.Layer(id, env._1, env._2, env._3, env._4, epsg, gw, gh,
                     nodata.toSeq, fetchedAtMs)
  }

  /**
   * EO TemporalExtension of a time-enabled coverage (the reference consumes
   * a per-layer start/end/timestamps triple when EO extensions are present
   * — WCSServiceManager.java:560-566, :577-579; GeoServer publishes these
   * only for mosaic/NetCDF layers). Parsed from the WCS-EO / GeoServer
   * TimeDomain shape inside the coverage metadata:
   *
   *  - `gml:TimeInstant/gml:timePosition` entries -> the discrete epoch list;
   *  - `gml:TimePeriod` `beginPosition`/`endPosition` -> continuous ranges.
   *
   * Returns (start, end, timestamps): start/end = min/max over every parsed
   * time (instants and period endpoints), timestamps = the sorted distinct
   * instants (epoch millis, ISO-8601 parsed). (None, None, Nil) when the
   * document carries no time domain — layers without EO extensions have no
   * temporal coverage, matching the reference's null TemporalExtension.
   */
  def parseTimeDomain(xml: String): (Option[Long], Option[Long], Seq[Long]) = {
    val doc = parseDoc(xml)
    def ms(e: Element): Option[Long] = {
      val s = e.getTextContent.trim
      if (s.isEmpty) None
      else Some(java.time.Instant.parse(s).toEpochMilli)
    }
    val instants = descendants(doc, "timePosition").flatMap(ms)
    val periods = descendants(doc, "TimePeriod").flatMap { p =>
      descendants(p, "beginPosition").flatMap(ms) ++
        descendants(p, "endPosition").flatMap(ms)
    }
    val all = instants ++ periods
    if (all.isEmpty) (None, None, Nil)
    else (Some(all.min), Some(all.max), instants.distinct.sorted)
  }
}
