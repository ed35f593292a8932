package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.MediaPipeline

/**
 * Multimodal pipeline queries: binary media columns -> batch decode stub ->
 * feature columns -> resize plan -> frame sampling. The oracle replays the
 * deterministic synthesis arithmetic; the Spark side actually materializes
 * and decodes the binary payloads (real plumbing, stubbed codec).
 */
object MediaQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_media_features" -> { (s, dir) =>
      import s.implicits._
      val media = MediaPipeline.mediaTable(s, dir)
      val feat = MediaPipeline.extractFeatures(media)
      MediaPipeline.withResizePlan(feat, maxDim = 128)
        .select(
          $"doc_id", $"span_idx", $"media_ref",
          length($"bytes").cast("bigint").as("nbytes"),
          element_at($"features", 1).as("feat_mean"),
          $"out_w".cast("bigint").as("out_w"),
          $"out_h".cast("bigint").as("out_h"))
        .orderBy($"doc_id", $"span_idx")
    },

    "q51_frame_sample" -> { (s, dir) =>
      import s.implicits._
      val media = MediaPipeline.mediaTable(s, dir).drop("bytes")
      MediaPipeline.sampleFrames(media, every = 10)
        .select($"doc_id", $"span_idx", $"frame_idx".cast("bigint").as("frame_idx"))
        .orderBy($"doc_id", $"span_idx", $"frame_idx")
    })

  private def mediaCte: String =
    s"""media AS (
       |  SELECT doc_id, span_idx, media_ref, d,
       |         100 + (d * 7 + span_idx * 3) % 400 AS nbytes,
       |         (d * 31 + span_idx) % 256 AS byteval,
       |         64 + d % 16 * 8 AS width,
       |         48 + span_idx % 12 * 8 AS height,
       |         1 + (d + span_idx) % 48 AS n_frames
       |  FROM flat WHERE kind = 'media')""".stripMargin

  val oracle: Map[String, String] = Map(
    "q50_media_features" ->
      s"""WITH ${graft.extract.InterleavedDocs.flatSpansSqlCte},
         |$mediaCte
         |SELECT doc_id, span_idx, media_ref, CAST(nbytes AS BIGINT) AS nbytes,
         |       CAST(byteval AS DOUBLE) / 255.0 AS feat_mean,
         |       CAST(CASE WHEN GREATEST(width, height) <= 128 THEN width
         |            ELSE CAST(FLOOR(CAST(width AS DOUBLE) * 128 / GREATEST(width, height)) AS INT)
         |            END AS BIGINT) AS out_w,
         |       CAST(CASE WHEN GREATEST(width, height) <= 128 THEN height
         |            ELSE CAST(FLOOR(CAST(height AS DOUBLE) * 128 / GREATEST(width, height)) AS INT)
         |            END AS BIGINT) AS out_h
         |FROM media ORDER BY doc_id, span_idx""".stripMargin,

    "q51_frame_sample" ->
      s"""WITH ${graft.extract.InterleavedDocs.flatSpansSqlCte},
         |$mediaCte
         |SELECT doc_id, span_idx,
         |       CAST(unnest(generate_series(0, CAST(n_frames - 1 AS BIGINT), 10)) AS BIGINT) AS frame_idx
         |FROM media
         |ORDER BY doc_id, span_idx, frame_idx""".stripMargin)
}
