package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.extract.InterleavedDocs

/**
 * Multimodal columns: image/audio/video as opaque `binary` columns with
 * typed metadata, plus decode / feature-extract / resize / frame-sample
 * stages. The Spark-side plumbing — schema, codegen-friendly decode UDF,
 * column pruning, deterministic synthesis — is real and tested; the actual
 * pixel/sample decode is a clearly marked deterministic fake ("STUB"),
 * because no image/audio codec library exists in this container (per the
 * builder contract). Swapping [[decodeStub]] for a real codec keeps every
 * schema and operator unchanged.
 *
 * Media synthesis (exactly replayable by the DuckDB oracle):
 *   for a media span (doc key d, span i):
 *     nbytes   = 100 + (d*7 + i*3) % 400
 *     byte[k]  = (d*31 + i) % 256           (constant fill)
 *     width    = 64 + d % 16 * 8
 *     height   = 48 + i % 12 * 8
 *     n_frames = 1 + (d + i) % 48
 */
object MediaPipeline {

  /** Binary media table from the interleaved docs' media spans:
    * (doc_id, span_idx, media_ref, bytes, width, height, n_frames). */
  def mediaTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // media spans synthesized arithmetically (payloads are (d, i) functions)
    // — skips the text-chunk concat work of the full span table, which the
    // kind filter would discard anyway; row set identical to
    // flatSpans.filter(kind = 'media')
    val spans = InterleavedDocs.mediaSpans(spark, dir)
    val gen = udf { (d: Long, i: Long) =>
      val n = (100 + (d * 7 + i * 3) % 400).toInt
      val b = ((d * 31 + i) % 256).toByte
      Array.fill(n)(b)
    }
    spans.select(
      $"doc_id", $"span_idx", $"media_ref",
      gen($"d", $"span_idx").as("bytes"),
      (lit(64) + ($"d" % 16).cast("int") * 8).as("width"),
      (lit(48) + ($"span_idx" % 12).cast("int") * 8).as("height"),
      (lit(1) + (($"d" + $"span_idx") % 48).cast("int")).as("n_frames"))
  }

  /**
   * STUB decode: a real implementation would decode the image/audio payload
   * here (e.g. via a JNI codec); this deterministic fake derives 4 features
   * from the raw bytes so the full binary path (serialization, batching,
   * feature schema) is exercised end to end.
   */
  def decodeStub(bytes: Array[Byte]): Array[Double] = {
    var sum = 0L; var min = 255; var max = 0
    var k = 0
    while (k < bytes.length) {
      val v = bytes(k) & 0xff
      sum += v; if (v < min) min = v; if (v > max) max = v
      k += 1
    }
    val mean = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length
    Array(mean / 255.0, min / 255.0, max / 255.0, bytes.length.toDouble)
  }

  private val decodeUdf = udf(decodeStub _)

  /** Feature extraction over the binary column as a typed UDF on `bytes`
    * only — the rest of the row never leaves Tungsten format, column pruning
    * and whole-stage codegen survive downstream (an earlier `df.rdd`
    * round-trip here broke both for the entire remaining plan). */
  def extractFeatures(media: DataFrame): DataFrame =
    media.withColumn("features", decodeUdf(col("bytes")))

  /** Resize plan (metadata transform, pure Column arithmetic): fit into a
    * maxDim box preserving aspect ratio, never upscaling. Integer math so
    * the oracle replays it exactly. */
  def withResizePlan(df: DataFrame, maxDim: Int): DataFrame = {
    val w = col("width"); val h = col("height")
    val big = greatest(w, h)
    df.withColumn("out_w",
        when(big <= maxDim, w).otherwise(floor(w.cast("double") * maxDim / big).cast("int")))
      .withColumn("out_h",
        when(big <= maxDim, h).otherwise(floor(h.cast("double") * maxDim / big).cast("int")))
  }

  /** Frame sampling plan: indices 0, every, 2*every, ... < n_frames
    * (generator shape: one row per sampled frame). */
  def sampleFrames(df: DataFrame, every: Int): DataFrame =
    df.withColumn("frame_idx",
      explode(sequence(lit(0), col("n_frames") - 1, lit(every))))
}
