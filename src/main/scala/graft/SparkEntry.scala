package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.api._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are grouped by capability area (each file lists the reference
  * operators it reproduces):
  *   - [[RelationalQueries]]  aggregation/join/window/top-k/set/json
  *   - [[SpatialQueries]]     tile assign, Z-order cells, PIP join, kNN, range join
  *   - [[RasterQueries]]      band-mix, merge modes, nodata/stats, padding, resample
  *   - [[TextQueries]]        dedup, token stats, minhash/LSH, fingerprints
  *   - [[AnnQueries]]         cosine top-k, LSH buckets
  */
object SparkEntry {

  /** Flagship: the minimum end-to-end slice of SURVEY.md §7.2 — extract doc
    * points, cell-index them, spatial-join against zones, assign tiles. */
  def entry(spark: SparkSession): DataFrame =
    SpatialQueries.queries("q12_pip_join")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ SpatialQueries.queries ++ RasterQueries.queries ++
      TextQueries.queries ++ AnnQueries.queries

  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++ SpatialQueries.oracle ++ RasterQueries.oracle ++
      TextQueries.oracle ++ AnnQueries.oracle
}
