package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Training-data pipeline text operators over the `documents` table:
 * exact dedup, token statistics / quality scoring, language profiling,
 * MinHash signatures + LSH band buckets, and document fingerprints.
 *
 * All hashing goes through md5 (identical hex output in Spark and DuckDB);
 * MinHash uses k independent "hash functions" h_i(t) = md5('s<i>|' || t)
 * with lexicographic min over the token set — deterministic, shuffle-order
 * independent, and exactly replayable by the oracle.
 */
object TextQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_dedup_exact" -> { (s, dir) =>
      import s.implicits._
      s.read.parquet(s"$dir/documents.parquet")
        .groupBy(md5($"text").as("text_hash"))
        .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_dups"))
        .orderBy($"text_hash")
    },

    "q31_token_stats" -> { (s, dir) =>
      import s.implicits._
      s.read.parquet(s"$dir/documents.parquet")
        .withColumn("toks", split($"text", " "))
        .withColumn("n_tokens", size($"toks").cast("bigint"))
        .withColumn("n_the", size(filter($"toks", t => t === "the")).cast("bigint"))
        .select(
          $"doc_id", $"n_tokens", $"n_the",
          round($"n_the".cast("double") / $"n_tokens", 6).as("the_ratio"),
          round((length($"text").cast("double") - ($"n_tokens" - 1)) / $"n_tokens", 6)
            .as("avg_tok_len"))
        .orderBy($"doc_id")
    },

    "q32_lang_profile" -> { (s, dir) =>
      import s.implicits._
      s.read.parquet(s"$dir/documents.parquet")
        .groupBy($"lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum($"n_chars").as("sum_chars"),
          round(sum($"n_chars").cast("double") / count(lit(1)), 6).as("avg_chars"),
          countDistinct($"source").as("n_sources"))
        .orderBy($"lang")
    },

    "q33_minhash_sigs" -> { (s, dir) =>
      import s.implicits._
      val sigCols = (1 to 4).map { i =>
        array_min(transform(split(col("text"), " "), t => md5(concat(lit(s"s$i|"), t))))
          .as(s"sig$i")
      }
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id") +: sigCols: _*)
        .orderBy(col("doc_id"))
    },

    "q34_lsh_buckets" -> { (s, dir) =>
      import s.implicits._
      // LSH band (sig1, sig2): docs sharing a bucket are near-dup candidates
      val sigs = queries("q33_minhash_sigs")(s, dir)
      sigs.groupBy($"sig1", $"sig2")
        .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("min_doc"), max($"doc_id").as("max_doc"))
        .filter($"n_docs" > 1)
        .orderBy($"sig1", $"sig2")
    },

    "q35_fingerprint" -> { (s, dir) =>
      import s.implicits._
      // deterministic document fingerprint: first 16 hex chars of md5 plus a
      // shingle fingerprint = min md5 over token 3-grams (rolling window)
      val toks = split($"text", " ")
      val n = size(toks)
      val shingles = transform(
        sequence(lit(0), greatest(n - 3, lit(0))),
        i => md5(concat_ws(" ", slice(toks, i + 1, lit(3)))))
      s.read.parquet(s"$dir/documents.parquet")
        .select(
          $"doc_id",
          substring(md5($"text"), 1, 16).as("fp_exact"),
          array_min(shingles).as("fp_shingle"))
        .orderBy($"doc_id")
    })

  val oracle: Map[String, String] = Map(
    "q30_dedup_exact" ->
      """SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q31_token_stats" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |         CAST(len(list_filter(string_split(text, ' '), x -> x = 'the')) AS BIGINT) AS n_the
        |  FROM documents)
        |SELECT doc_id, n_tokens, n_the,
        |       ROUND(CAST(n_the AS DOUBLE) / n_tokens, 6) AS the_ratio,
        |       ROUND((CAST(length(text) AS DOUBLE) - (n_tokens - 1)) / n_tokens, 6) AS avg_tok_len
        |FROM t ORDER BY doc_id""".stripMargin,

    "q32_lang_profile" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |       ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS avg_chars,
        |       COUNT(DISTINCT source) AS n_sources
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q33_minhash_sigs" ->
      """SELECT doc_id,
        |       list_min(list_transform(string_split(text, ' '), t -> md5('s1|' || t))) AS sig1,
        |       list_min(list_transform(string_split(text, ' '), t -> md5('s2|' || t))) AS sig2,
        |       list_min(list_transform(string_split(text, ' '), t -> md5('s3|' || t))) AS sig3,
        |       list_min(list_transform(string_split(text, ' '), t -> md5('s4|' || t))) AS sig4
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q34_lsh_buckets" ->
      """WITH sigs AS (
        |  SELECT doc_id,
        |         list_min(list_transform(string_split(text, ' '), t -> md5('s1|' || t))) AS sig1,
        |         list_min(list_transform(string_split(text, ' '), t -> md5('s2|' || t))) AS sig2
        |  FROM documents)
        |SELECT sig1, sig2, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        |FROM sigs GROUP BY 1, 2 HAVING COUNT(*) > 1 ORDER BY 1, 2""".stripMargin,

    "q35_fingerprint" ->
      """WITH t AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS toks,
        |         len(string_split(text, ' ')) AS n
        |  FROM documents)
        |SELECT doc_id,
        |       substr(md5(text), 1, 16) AS fp_exact,
        |       list_min(list_transform(
        |         generate_series(0, GREATEST(n - 3, 0)),
        |         i -> md5(array_to_string(toks[i + 1 : i + 3], ' ')))) AS fp_shingle
        |FROM t ORDER BY doc_id""".stripMargin)
}
