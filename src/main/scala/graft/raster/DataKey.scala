package graft.raster

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Categorical code<->label dictionary (reference P4/S11: DataKey —
 * utils/Geotools.java:347-353 encode via reverseLookup;
 * library/GeodataIO.java:463-487 export). Dense rasters carry int codes;
 * the dictionary is a broadcast map (or a dim table joined at export).
 */
final case class DataKey(entries: Map[Int, String]) {
  lazy val reverse: Map[String, Int] = entries.map(_.swap)
  def lookup(code: Int): Option[String] = entries.get(code)
  /** `concept -> code`; unknown concepts get NaN downstream (reference
    * appends via reverseLookup which grows the key — here the dictionary is
    * fixed per run for determinism, unknowns map to None). */
  def reverseLookup(label: String): Option[Int] = reverse.get(label)
}

object DataKey {

  def fromLabels(labels: Seq[String]): DataKey =
    DataKey(labels.distinct.sorted.zipWithIndex.map { case (l, i) => i -> l }.toMap)

  /** Boolean encode: true -> 1.0, false -> 0.0 (utils/Geotools.java:341-346). */
  def encodeBoolean(c: Column): Column = when(c, 1.0).otherwise(0.0)

  /** Categorical encode through the dictionary; unknown -> NaN (the nodata
    * convention of the value plane). */
  def encodeConcept(key: DataKey)(c: Column): Column = {
    val m = typedLit(key.reverse)
    when(element_at(m, c).isNotNull, element_at(m, c).cast("double"))
      .otherwise(lit(Double.NaN))
  }

  /** The dictionary as a dim table for joins at export time. */
  def toTable(spark: SparkSession, key: DataKey): DataFrame = {
    import spark.implicits._
    key.entries.toSeq.sortBy(_._1).toDF("code", "label")
  }
}
