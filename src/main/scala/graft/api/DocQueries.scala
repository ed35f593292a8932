package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.extract.InterleavedDocs
import graft.operators.SpatialJoin

/**
 * Interleaved-document pipeline queries (BASELINE.json input_hint shape):
 * span flattening with order preservation, geometry extraction from geo
 * spans, and the flagship span->point->PIP->tile assignment pipeline
 * (SURVEY.md §7.2 end-to-end slice).
 */
object DocQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // flatten the interleaved docs table; span_idx is the order invariant
    "q15_spans_flat" -> { (s, dir) =>
      import s.implicits._
      InterleavedDocs.flatSpans(s, dir)
        .orderBy($"doc_id", $"span_idx")
    },

    // full flagship pipeline: synthesize -> extract geo spans -> PIP join
    // against zones -> (doc, span, zone) with deterministic order
    "q16_docs_pip" -> { (s, dir) =>
      import s.implicits._
      val pts = InterleavedDocs.geoPoints(s, dir)
      val zs = Geo.zones(s, dir).select($"zone_id", $"ring")
      SpatialJoin.pointsInZones(pts, zs, level = 12)
        .select($"doc_id", $"span_idx", $"zone_id")
        .orderBy($"doc_id", $"span_idx", $"zone_id")
    },

    // resumable tile materialization: geo spans written per-tile with
    // lineage commit records (the Iceberg-standin catalog); the output IS
    // the lineage log, so the oracle checks per-tile rows + the fact that a
    // second run over the same table is a pure no-op (skips everything)
    "q18_lineage_tiles" -> { (s, dir) =>
      import s.implicits._
      import graft.lineage.TileLineage
      import Geo._
      val tiled = InterleavedDocs.geoPoints(s, dir)
        .withColumn("cx", floor(($"lon" - lit(minX)) / ((lit(maxX) - lit(minX)) / 934.0)).cast("long"))
        .withColumn("cy", floor(($"lat" - lit(minY)) / ((lit(maxY) - lit(minY)) / 631.0)).cast("long"))
        .withColumn("tile_id",
          concat(lit("t"), (floor($"cx" / 64.0) * 100 + floor($"cy" / 64.0)).cast("long").cast("string")))
        .select($"doc_id", $"span_idx", $"tile_id")
        // job-scoped materialization: the span-extraction pipeline above
        // otherwise recomputes for every pass runResumable makes over the
        // input (tile census + data write) times the two runs below
        .localCheckpoint(true)
      val tableDir = java.nio.file.Files.createTempDirectory("graft_q18").toString
      TileLineage.runResumable(s, tiled, tableDir)
      val second = TileLineage.runResumable(s, tiled, tableDir, attempt = 2)
      require(second.tilesWritten == 0, s"resume was not a no-op: $second")
      TileLineage.lineage(s, tableDir)
        .select($"tile_id", $"rows")
        .orderBy($"tile_id")
    },

    // tile assignment of every geo span on the canonical grid (D2_XY index)
    "q17_span_tiles" -> { (s, dir) =>
      import s.implicits._
      import Geo._
      InterleavedDocs.geoPoints(s, dir)
        .withColumn("cx", floor(($"lon" - lit(minX)) / ((lit(maxX) - lit(minX)) / 934.0)).cast("long"))
        .withColumn("cy", floor(($"lat" - lit(minY)) / ((lit(maxY) - lit(minY)) / 631.0)).cast("long"))
        .select($"doc_id", $"span_idx", ($"cx" * 631 + $"cy").as("cell_idx"))
        .orderBy($"doc_id", $"span_idx")
    })

  private val geoPtsCte: String =
    s"""geo_pts AS (
       |  SELECT doc_id, span_idx,
       |         ${Geo.MinX} + CAST(CAST(string_split(stext, ':')[1] AS BIGINT) AS DOUBLE) / 100000.0
       |           * (${Geo.MaxX} - ${Geo.MinX}) AS lon,
       |         ${Geo.MinY} + CAST(CAST(string_split(stext, ':')[2] AS BIGINT) AS DOUBLE) / 100000.0
       |           * (${Geo.MaxY} - ${Geo.MinY}) AS lat
       |  FROM flat WHERE kind = 'geo')""".stripMargin

  val oracle: Map[String, String] = Map(
    "q15_spans_flat" ->
      s"""WITH ${InterleavedDocs.flatSpansSqlCte}
         |SELECT doc_id, span_idx, kind, stext, media_ref, soffset
         |FROM flat ORDER BY doc_id, span_idx""".stripMargin,

    "q16_docs_pip" ->
      s"""WITH ${InterleavedDocs.flatSpansSqlCte},
         |$geoPtsCte,
         |${Geo.zonesSqlCte}
         |SELECT p.doc_id, p.span_idx, z.zone_id
         |FROM geo_pts p, zones z
         |WHERE ((z.bx - z.ax) * (p.lat - z.ay) - (p.lon - z.ax) * (z.by - z.ay)) >= 0
         |  AND ((z.cx2 - z.bx) * (p.lat - z.by) - (p.lon - z.bx) * (z.cy2 - z.by)) >= 0
         |  AND ((z.ax - z.cx2) * (p.lat - z.cy2) - (p.lon - z.cx2) * (z.ay - z.cy2)) >= 0
         |ORDER BY doc_id, span_idx, zone_id""".stripMargin,

    "q18_lineage_tiles" ->
      s"""WITH ${InterleavedDocs.flatSpansSqlCte},
         |$geoPtsCte,
         |tiled AS (
         |  SELECT concat('t', CAST(CAST(
         |           FLOOR(CAST(FLOOR((lon - ${Geo.MinX}) / ((${Geo.MaxX} - ${Geo.MinX}) / 934.0)) AS BIGINT) / 64.0) * 100
         |           + FLOOR(CAST(FLOOR((lat - ${Geo.MinY}) / ((${Geo.MaxY} - ${Geo.MinY}) / 631.0)) AS BIGINT) / 64.0)
         |         AS BIGINT) AS VARCHAR)) AS tile_id
         |  FROM geo_pts)
         |SELECT tile_id, COUNT(*) AS rows FROM tiled GROUP BY 1 ORDER BY 1""".stripMargin,

    "q17_span_tiles" ->
      s"""WITH ${InterleavedDocs.flatSpansSqlCte},
         |$geoPtsCte
         |SELECT doc_id, span_idx,
         |       CAST(FLOOR((lon - ${Geo.MinX}) / ((${Geo.MaxX} - ${Geo.MinX}) / 934.0)) AS BIGINT) * 631
         |         + CAST(FLOOR((lat - ${Geo.MinY}) / ((${Geo.MaxY} - ${Geo.MinY}) / 631.0)) AS BIGINT) AS cell_idx
         |FROM geo_pts ORDER BY doc_id, span_idx""".stripMargin)
}
