package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * GeoJSON vector ingest (the `application/geo+json` media type the
 * reference whitelists for vector assets, StacResource.java:123-154; its
 * actual decode goes through GeoTools — here Feature documents parse
 * straight into the engine's flat-ring zones shape via `from_json`, so a
 * 10^9-feature collection parses in parallel with no driver involvement).
 *
 * [[parsePolygons]] covers the common outer-ring-only case;
 * [[parseFeatures]] handles the full RFC 7946 surface — MultiPolygon parts
 * and interior rings (holes) — as one row per polygon part with a
 * rings(0)=outer, rings(1..)=holes layout. Properties surface as a string
 * map — callers pull their own keys (`element_at(properties, "zone")`).
 */
object GeoJson {

  /** One GeoJSON Feature with a Polygon geometry. */
  val featureSchema: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("properties", MapType(StringType, StringType)),
    StructField("geometry", StructType(Seq(
      StructField("type", StringType),
      StructField("coordinates", ArrayType(ArrayType(ArrayType(DoubleType)))))))))

  /**
   * Parse a column of Feature JSON documents into
   * (properties: map<string,string>, ring: array<double>) rows — the ring
   * flattened to the engine's interleaved [x0,y0,x1,y1,...] layout with the
   * closing duplicate vertex dropped (the engine's rings are open; GeoJSON
   * rings repeat the first point last, RFC 7946 §3.1.6). Non-Polygon or
   * unparseable documents yield null rings (callers filter).
   */
  def parsePolygons(docs: DataFrame, jsonCol: String): DataFrame = {
    val parsed = docs.select(col("*"), from_json(col(jsonCol), featureSchema).as("__f"))
    val f = col("__f")
    val outer = get(f.getField("geometry").getField("coordinates"), lit(0))
    // drop the closing vertex, then flatten [[x,y],...] -> [x,y,...]
    val ring = flatten(slice(outer, lit(1), size(outer) - 1))
    parsed.select(
      f.getField("properties").as("properties"),
      when(f.getField("geometry").getField("type") === "Polygon", ring).as("ring"))
  }

  /** Feature whose geometry coordinates nest one level deeper
    * (MultiPolygon: polygons -> rings -> points -> xy). */
  val multiFeatureSchema: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("properties", MapType(StringType, StringType)),
    StructField("geometry", StructType(Seq(
      StructField("type", StringType),
      StructField("coordinates", ArrayType(ArrayType(ArrayType(ArrayType(DoubleType))))))))))

  /**
   * Full-surface parse: Polygon AND MultiPolygon Features, interior rings
   * included. One output row per POLYGON PART:
   * (properties, rings: array<array<double>>) with rings(0) the outer ring
   * and rings(1..) the holes, each flattened/open like [[parsePolygons]].
   * Other geometry types and unparseable documents yield no rows (explode
   * of a null array). The two `from_json` calls are schema-pruned single
   * passes; at 10^9 features this is still a driver-free parallel parse.
   */
  def parseFeatures(docs: DataFrame, jsonCol: String): DataFrame = {
    val parsed = docs.select(col("*"),
      from_json(col(jsonCol), featureSchema).as("__p"),
      from_json(col(jsonCol), multiFeatureSchema).as("__m"))
    def openFlat(ring: Column) = flatten(slice(ring, lit(1), size(ring) - 1))
    val pRings = transform(col("__p.geometry.coordinates"), r => openFlat(r))
    val mPolys = transform(col("__m.geometry.coordinates"),
      poly => transform(poly, r => openFlat(r)))
    val gtype = col("__p.geometry.type")
    val polys = when(gtype === "Polygon", array(pRings))
      .when(gtype === "MultiPolygon", mPolys)
    parsed.select(col("__p.properties").as("properties"), explode(polys).as("rings"))
  }
}
