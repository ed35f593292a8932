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

  /** Flagship: the end-to-end slice of SURVEY.md §7.2 — interleaved docs ->
    * geo-span extraction -> cell-indexed PIP join -> tile assignment. */
  def entry(spark: SparkSession): DataFrame =
    DocQueries.queries("q16_docs_pip")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ SpatialQueries.queries ++ RasterQueries.queries ++
      TextQueries.queries ++ AnnQueries.queries ++ DocQueries.queries ++ MediaQueries.queries ++
      TerrainQueries.queries ++ SourceQueries.queries

  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++ SpatialQueries.oracle ++ RasterQueries.oracle ++
      TextQueries.oracle ++ AnnQueries.oracle ++ DocQueries.oracle ++ MediaQueries.oracle ++
      TerrainQueries.oracle ++ SourceQueries.oracle
}
