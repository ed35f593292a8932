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
 * Scope: Polygon Feature documents (outer ring; holes out of scope like the
 * rest of the engine's ring model). Properties surface as a string map —
 * callers pull their own keys (`element_at(properties, "zone")`).
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
}
