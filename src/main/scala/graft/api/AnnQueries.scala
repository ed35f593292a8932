package graft.api

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Similarity search over the `embeddings` table (vec_id, embedding float[64],
 * label).
 *
 *  - q40: brute-force cosine top-k — the correctness baseline. Dot products
 *    via zip_with + aggregate (codegen'd higher-order functions, left-to-right
 *    accumulation = same order DuckDB evaluates list_dot_product).
 *  - q41: LSH bucket stats for one 8-bit table (the bucketing primitive).
 *  - q42: embedding near-dup, the scale path: NumTables=3 hyperplane tables
 *    x PlanesPerTable=16 sign bits each (OR across tables), candidates only
 *    within a (table, bucket) pair, buckets above EmbBucketCap dropped with a
 *    logged count. 16-bit buckets put ~N/65536 vectors per bucket per table —
 *    the within-bucket self-join stays linear-ish at 10^12 rows, where the
 *    earlier single 8-bit table (256 buckets) was quadratic.
 *  - q43: IVF ANN with a deterministic ladder codebook. Centroid assignment
 *    is ONE projection — all 16 centroid dots per row from a literal
 *    array<array<double>>, struct-sorted argmax — zero shuffle, no crossJoin,
 *    no Window (the earlier crossJoin(16)+Window plan moved 16x the embedding
 *    volume through an exchange to compute a per-row argmax).
 *  - q44: IVF with a TRAINED codebook — one exact integer-quantized Lloyd
 *    iteration (assign to ladder init, per-cluster integer-mean update)
 *    whose arithmetic the DuckDB oracle replays bit-for-bit; then the same
 *    zero-shuffle assignment and nprobe search as q43.
 *  - q97: BROADCAST codebook at K=4096 (plan size O(1) in K; bounded
 *    top-nprobe heap in the assignment UDF).
 *  - q102: multi-assignment (top-2 homes) + exact dense-rank re-rank — the
 *    recall-recovery stage: 83% recall@3 at the same 25% probe fraction
 *    where q43 measures 47% (graft.tools.AnnRecall, sf0.01).
 *  - q103: TRAINED broadcast codebook at K=1024 — q44's exact Lloyd pass
 *    with the assignment riding the q97 broadcast UDF on both the train
 *    and serve passes.
 *  - q108: the production composition — trained K=1024 broadcast codebook
 *    + top-2 multi-assignment + dense-rank re-rank at 25% probe.
 *
 * Only ranks are emitted (not raw cosines) so last-ulp float differences
 * can't flip a hash compare; rank ties are broken by vec_id.
 */
object AnnQueries {

  // Native codegen'd dot products (expressions.scala). Bit-identical to the
  // `aggregate(zip_with(a, b, (x, y) => x * y), 0, (acc, x) => acc + x)`
  // formulation they replaced (same left-to-right IEEE fold — pinned by
  // DotProductSpec), but ONE static call per row: the HOF chain is
  // CodegenFallback and allocated a zipped array + boxed accumulator per
  // evaluation, which dominated every ANN query's task CPU (q43 measured
  // ~30 task-sec for 5 s of real work at sf0.1).
  private def dot(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.dot_d(a, b)

  /** Integer dot product (exact — no float associativity concerns). */
  private def idot(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.dot_l(a, b)

  val NumTables = 3
  val PlanesPerTable = 16
  /** Max (table, bucket) size admitted to the q42 self-join (logged drops). */
  val EmbBucketCap = 200

  /** Deterministic pseudo-hyperplanes: table t, plane p, dim d has weight
    * (((t*61 + p)*131 + d*31) % 17) - 8 (integer ladder — exactly replayable
    * in SQL, no RNG). sign bit p = (w . v) >= 0; bucket = `planes`-bit
    * signature, computed by the native codegen'd expression (one
    * allocation-free pass per row; same left-to-right accumulation as the
    * DuckDB list_dot_product replay). */
  private[graft] def bucketCol(v: Column, table: Int, planes: Int): Column =
    graft.functions.GraftFunctions.hyperplane_bucket(v, lit(table), lit(planes))

  private def bucketSql(table: Int, planes: Int): String =
    s"""CAST(${(0 until planes).map { pl =>
      val seed = table * 61 + pl
      s"""(CASE WHEN list_dot_product(v, (SELECT LIST(CAST(((($seed * 131 + d * 31) % 17) - 8) AS DOUBLE) ORDER BY d) FROM generate_series(0, 63) t(d))) >= 0.0 THEN ${1L << pl} ELSE 0 END)"""
    }.mkString(" + ")} AS BIGINT)"""

  /** q43 ladder codebook: centroid c, dim d = (((c*37 + d*11) % 13) - 6) / 6. */
  private[graft] val LadderCents: Seq[Seq[Double]] =
    (0 until 16).map(c => (0 until 64).map(d => (((c * 37 + d * 11) % 13) - 6).toDouble / 6.0))

  /** q44 integer init codebook (1e6-ish scale, pure integers — no rounding). */
  val IvfK = 8
  val IvfQuant = 1000000L
  private val IntInitCents: Seq[Seq[Long]] =
    (0 until IvfK).map(c => (0 until 64).map(d => (((c * 37 + d * 11) % 13) - 6).toLong * 166667L))

  /** q103 large-K INTEGER init codebook (K=1024): the q97 long-period hash
    * at an integer scale (~5e5) commensurate with IvfQuant-quantized
    * vectors, so one exact Lloyd iteration trains it. All dot products stay
    * below 2^53 (|q| <= ~3e6, |w| <= ~3e6, 64 dims -> < 6e14), so the
    * broadcast path's double accumulation is EXACT integer arithmetic —
    * the bit-equality the oracle compare and AnnEquivalenceSpec rely on. */
  val BigIvfK = 1024
  private[graft] val BigIntInit: Seq[Seq[Long]] =
    (0 until BigIvfK).map(c => (0 until 64).map(d =>
      ((c.toLong * 2654435761L + d * 40503L) % 8191L - 4095L) * 122L))

  /** q97 large-K codebook: 4096 centroids from a LONG-PERIOD integer hash —
    * the q43 ladder recurrence is mod-13 periodic, which would collapse
    * 4096 rows to 13 distinct centroids (every assignment tie-broken into
    * c < 13). cent(c, d) = (((c*2654435761 + d*40503) % 8191) - 4095)/4095. */
  val BigK = 4096
  private[graft] val BigCents: Seq[Seq[Double]] =
    (0 until BigK).map(c => (0 until 64).map(d =>
      (((c.toLong * 2654435761L + d * 40503L) % 8191L) - 4095L).toDouble / 4095.0))

  // typedLit, not array(array(lit...)): a K x 64 codebook as nested
  // CreateArray trees is ~1000 Literal nodes that janino compiles cold on
  // every fresh JVM (seconds of codegen for q43/q44 under the driver's
  // one-shot bench); typedLit is ONE Literal carrying the ArrayData value —
  // same semantics, constant plan size. This is also the structural story
  // for large K: the codebook enters the plan as a single broadcast value,
  // not as an expression tree that grows with K.
  private def centArrayLit(cents: Seq[Seq[Double]]): Column = typedLit(cents)

  private def centArrayLitL(cents: Seq[Seq[Long]]): Column = typedLit(cents)

  /** Zero-shuffle IVF assignment: per row, dots against every centroid in a
    * literal codebook, struct-sorted (-dot, c) -> the nprobe best centroids.
    * Output: (vec_id, v, vn, c, rk) with rk = 1..nprobe (rk 1 = home). */
  private[graft] def assignProbes(emb: DataFrame, cents: Column, nprobe: Int,
                                  dotFn: (Column, Column) => Column, vecCol: String): DataFrame = {
    val probes = slice(array_sort(transform(cents, (w, c) =>
      struct((-dotFn(col(vecCol), w)).as("negd"), c.cast("int").as("c")))), 1, nprobe)
    emb.select(col("*"), posexplode(probes))
      .withColumn("rk", col("pos") + 1)
      .withColumn("c", col("col.c"))
      .drop("pos", "col")
  }

  /**
   * Large-K twin of [[assignProbes]]: the codebook rides an executor
   * BROADCAST (SparkContext.broadcast) consumed by a codegen-called UDF,
   * not a plan literal. A typedLit codebook is right up to K in the
   * thousands; at the 100-TB design point K ~ sqrt(N) ~ 10^6 centroids
   * (hundreds of MB) must ship once per executor as a broadcast value —
   * never serialize into the plan, never crossJoin K rows per vector.
   * Same shuffle-free shape (one projection + posexplode), and the
   * arithmetic is identical to the literal path: the UDF accumulates the
   * dot left-to-right exactly like `aggregate(zip_with(...))` and sorts by
   * (-dot, c) exactly like the struct array_sort — AnnEquivalenceSpec
   * asserts bit-identical assignments.
   */
  private[graft] def assignProbesBroadcast(emb: DataFrame, cents: Seq[Seq[Double]],
                                           nprobe: Int, vecCol: String): DataFrame = {
    val bc = emb.sparkSession.sparkContext.broadcast(cents.map(_.toArray).toArray)
    val probesUdf = udf { v: Seq[Double] =>
      val cb = bc.value
      val arr = v.toArray
      // bounded top-nprobe selection on primitives: a full sort of K boxed
      // (dot, c) tuples dominated the whole query at K=4096 (measured
      // ~5 s for 5k vectors); the bounded max-heap of the WORST kept entry
      // is O(K log nprobe) with zero boxing. Order semantics are identical
      // to sorting by (-dot, c) ascending: a candidate replaces the heap
      // root iff (dot, -c) beats the root's, i.e. (-dot, c) is smaller.
      val k = math.min(nprobe, cb.length)
      val hd = new Array[Double](k) // heap of kept dots; root = WORST kept
      val hc = new Array[Int](k)
      // worse(a, b): entry a is worse than entry b under (-dot, c) order.
      // Total order via java.lang.Double.compare on the NEGATED dots so a
      // NaN dot (-NaN = NaN, which Spark's array_sort places greatest)
      // ranks WORST — primitive `<` made NaN incomparable: a NaN that
      // entered a filling heap could never be evicted and, at the root,
      // blocked all replacements, diverging from the literal sort path.
      @inline def worse(da: Double, ca: Int, db: Double, cb_ : Int): Boolean = {
        val c0 = java.lang.Double.compare(-da, -db)
        c0 > 0 || (c0 == 0 && ca > cb_)
      }
      var size = 0
      var c = 0
      while (c < cb.length) {
        val w = cb(c)
        var s = 0.0; var i = 0
        while (i < w.length) { s += arr(i) * w(i); i += 1 } // zip_with/aggregate order
        if (size < k) {
          // sift up
          hd(size) = s; hc(size) = c
          var j = size; size += 1
          while (j > 0 && worse(hd(j), hc(j), hd((j - 1) / 2), hc((j - 1) / 2))) {
            val p = (j - 1) / 2
            val td = hd(j); val tc = hc(j)
            hd(j) = hd(p); hc(j) = hc(p); hd(p) = td; hc(p) = tc
            j = p
          }
        } else if (worse(hd(0), hc(0), s, c)) {
          // replace root, sift down
          hd(0) = s; hc(0) = c
          var j = 0
          var cont = true
          while (cont) {
            val l = 2 * j + 1; val r = l + 1
            var m = j
            if (l < k && worse(hd(l), hc(l), hd(m), hc(m))) m = l
            if (r < k && worse(hd(r), hc(r), hd(m), hc(m))) m = r
            if (m == j) cont = false
            else {
              val td = hd(j); val tc = hc(j)
              hd(j) = hd(m); hc(j) = hc(m); hd(m) = td; hc(m) = tc
              j = m
            }
          }
        }
        c += 1
      }
      // k survivors: sort by (-dot, c) ascending (tiny, boxing irrelevant)
      (0 until size).map(i => (-hd(i), hc(i))).sortBy(identity)(
        Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Int)).map(_._2)
    }
    emb.select(col("*"), posexplode(probesUdf(col(vecCol))))
      .withColumn("rk", col("pos") + 1)
      .withColumn("c", col("col"))
      .drop("pos", "col")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_ann_bruteforce" -> { (s, dir) =>
      import s.implicits._
      val emb = Inputs.parquet(s, s"$dir/embeddings.parquet")
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      val qs = emb.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"v".as("qv"))
        .withColumn("qn", sqrt(dot($"qv", $"qv")))
      val cand = emb.withColumn("vn", sqrt(dot($"v", $"v")))
      // deliberate broadcast nested-loop: brute force IS the baseline here;
      // the scale path is the LSH-bucketed q41/q42 equi-join
      val scored = cand.crossJoin(broadcast(qs))
        .filter($"vec_id" =!= $"qid")
        .withColumn("cos", dot($"qv", $"v") / ($"qn" * $"vn"))
      val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"vec_id")
      scored.withColumn("rnk", row_number().over(w).cast("bigint"))
        .filter($"rnk" <= 3)
        .select($"qid", $"rnk", $"vec_id")
        .orderBy($"qid", $"rnk")
    },

    // embedding-cosine near-dup, multi-table LSH (the scale path): candidate
    // pairs only within a (table, 16-bit bucket), OR'd across 3 tables,
    // oversized buckets dropped (logged) before the self-join, exact cosine
    // refine after
    "q42_neardup_embedding" -> { (s, dir) =>
      import s.implicits._
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
        .withColumn("vn", sqrt(dot(col("v"), col("v"))))
      // checkpoint the SIGNATURE table: it feeds the bucket-count pass and
      // both sides of the self-join — without it the 48 hyperplane dots per
      // vector would be recomputed three times
      val sigs = emb.select($"vec_id",
          posexplode(array((0 until NumTables).map(t =>
            bucketCol($"v", t, PlanesPerTable)): _*)))
        .select($"vec_id", $"pos".as("t"), $"col".as("bucket"))
        .localCheckpoint(true)
      val cand = graft.operators.BucketedSelfJoin
        .pairs(sigs, Seq("t", "bucket"), "vec_id", EmbBucketCap, "q42")
        .select($"doc_a".as("a_id"), $"doc_b".as("b_id"))
      cand
        .join(emb.select($"vec_id".as("a_id"), $"v".as("va"), $"vn".as("na")), "a_id")
        .join(emb.select($"vec_id".as("b_id"), $"v".as("vb"), $"vn".as("nb")), "b_id")
        .filter(dot($"va", $"vb") / ($"na" * $"nb") >= 0.2)
        .select($"a_id", $"b_id")
        .orderBy($"a_id", $"b_id")
    },

    // IVF-style ANN scale path: 16 deterministic ladder centroids, every
    // vector assigned to its max-dot centroid in a single shuffle-free
    // projection; queries probe their top-4 clusters (nprobe=4/16), cosine
    // ranks only within probed clusters.
    "q43_ann_ivf" -> { (s, dir) =>
      import s.implicits._
      val emb = Inputs.parquet(s, s"$dir/embeddings.parquet")
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
        .withColumn("vn", sqrt(dot($"v", $"v")))
      val assigned = assignProbes(emb, centArrayLit(LadderCents), nprobe = 4, dot, "v")
      ivfSearch(assigned)
    },

    // IVF with a TRAINED codebook: one Lloyd iteration over integer-quantized
    // vectors (exact arithmetic in both engines), then nprobe search.
    "q44_ann_ivf_trained" -> { (s, dir) =>
      import s.implicits._
      val emb = Inputs.parquet(s, s"$dir/embeddings.parquet")
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
        .withColumn("vn", sqrt(dot($"v", $"v")))
        .withColumn("q", transform($"v", x => round(x * IvfQuant, 0).cast("bigint")))
      val trained = trainCodebook(emb)
      val assigned = assignProbes(emb, centArrayLitL(trained), nprobe = 2, idot, "q")
        .drop("q")
      ivfSearch(assigned)
    },

    // IVF with a BROADCAST codebook at K=4096 (the 100-TB K ~ sqrt(N)
    // shape): a typedLit codebook is right up to K in the thousands, but a
    // large codebook must ship ONCE per executor as a SparkContext
    // broadcast consumed by a codegen-called UDF — plan size O(1) in K, no
    // K-row join, assignment still one shuffle-free projection below the
    // probe join (PlanShapeSpec pins zero exchanges beneath it;
    // AnnEquivalenceSpec proves the broadcast path bit-identical to the
    // literal path). Queries probe 64 of 4096 clusters (1.6%).
    "q97_ann_ivf_broadcast" -> { (s, dir) =>
      import s.implicits._
      val emb = Inputs.parquet(s, s"$dir/embeddings.parquet")
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
        .withColumn("vn", sqrt(dot($"v", $"v")))
      val assigned = assignProbesBroadcast(emb, BigCents, nprobe = 64, "v")
      ivfSearch(assigned)
    },

    // TRAINED broadcast-codebook IVF at K=1024 (q44's training x q97's
    // distribution): the integer init codebook rides a broadcast into the
    // assignment UDF for the Lloyd pass, the TRAINED result round-trips
    // driver -> broadcast -> UDF for the search pass — the full
    // train-then-serve lifecycle of a large-K index, with plan size O(1)
    // in K on both passes. All arithmetic is exact (integer values below
    // 2^53 accumulated as doubles), so the DuckDB integer replay matches
    // bit-for-bit. Queries probe 16/1024 clusters (1.6%, the q97 fraction).
    "q103_ann_ivf_trained_broadcast" -> { (s, dir) =>
      import s.implicits._
      val emb = Inputs.parquet(s, s"$dir/embeddings.parquet")
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
        .withColumn("vn", sqrt(dot($"v", $"v")))
        .withColumn("q", transform($"v", x => round(x * IvfQuant, 0).cast("bigint")))
      val trained = trainCodebook(emb, BigIntInit, broadcastAssign = true)
      val assigned = assignProbesBroadcast(
          emb.withColumn("qd", $"q".cast("array<double>")),
          trained.map(_.map(_.toDouble)), nprobe = 16, "qd")
        .drop("q", "qd")
      ivfSearch(assigned)
    },

    // The PRODUCTION IVF configuration — everything composed: trained
    // codebook (q44's exact integer Lloyd) at K=1024, broadcast
    // distribution on both passes (q97/q103's O(1)-plan shape),
    // multi-assignment under the top-2 centroids, and the exact dense-rank
    // re-rank (q102's recall-recovery stage). One query proving the four
    // mechanisms compose without interference. Measured recall@3 at the
    // same 25% probe fraction as q102: 60% (vs q102's 83% at K=16) — the
    // honest structural trade on UNSTRUCTURED random embeddings: a finer
    // quantizer (K ~ N/5 here) scatters near-neighbors across clusters, so
    // fixed probe FRACTION recovers less as K grows; replication + re-rank
    // claws part of it back, and on real clustered corpora the fine
    // codebook is what makes large-K probing cheap (graft.tools.AnnRecall).
    "q108_ann_ivf_full" -> { (s, dir) =>
      import s.implicits._
      val emb = Inputs.parquet(s, s"$dir/embeddings.parquet")
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
        .withColumn("vn", sqrt(dot($"v", $"v")))
        .withColumn("q", transform($"v", x => round(x * IvfQuant, 0).cast("bigint")))
      val trained = trainCodebook(emb, BigIntInit, broadcastAssign = true)
      val assigned = assignProbesBroadcast(
          emb.withColumn("qd", $"q".cast("array<double>")),
          trained.map(_.map(_.toDouble)), nprobe = 256, "qd")
        .drop("q", "qd")
      ivfSearch(assigned, homeR = 2)
    },

    // IVF with MULTI-ASSIGNMENT + exact re-rank (the recall-recovery stage):
    // database vectors indexed under their top-2 centroids, queries probe
    // the same 4/16 clusters as q43 — same probe fraction, strictly larger
    // candidate union, duplicates collapsed by the dense-rank re-rank (see
    // ivfSearch homeR > 1). AnnRecall measures the recall gain over q43 at the
    // identical 25% probe fraction.
    "q102_ann_ivf_rerank" -> { (s, dir) =>
      import s.implicits._
      val emb = Inputs.parquet(s, s"$dir/embeddings.parquet")
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
        .withColumn("vn", sqrt(dot($"v", $"v")))
      val assigned = assignProbes(emb, centArrayLit(LadderCents), nprobe = 4, dot, "v")
      ivfSearch(assigned, homeR = 2)
    },

    "q41_lsh_buckets" -> { (s, dir) =>
      import s.implicits._
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      emb.withColumn("bucket", bucketCol($"v", 0, 8))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n_vecs"), min($"vec_id").as("min_vec"), max($"vec_id").as("max_vec"))
        .orderBy($"bucket")
    },

    // int8 symmetric quantization (the embedding-compression prep step of a
    // training/retrieval pipeline): per-vector absmax scale, q = round(x /
    // absmax * 127); emitted stats are integer-derived (saturation count,
    // integer component sum, integer squared norm) so the compare is exact
    "q46_embed_quantize" -> { (s, dir) =>
      import s.implicits._
      Inputs.parquet(s, s"$dir/embeddings.parquet")
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
        .withColumn("absmax", array_max(transform($"v", x => abs(x))))
        .withColumn("q", transform($"v", x => round(x / $"absmax" * 127.0, 0).cast("bigint")))
        .select(
          $"vec_id",
          size(filter($"q", x => abs(x) === 127)).cast("bigint").as("n_sat"),
          aggregate($"q", lit(0L), (acc, x) => acc + x).as("sum_q"),
          aggregate($"q", lit(0L), (acc, x) => acc + x * x).as("sq_norm"))
        .orderBy($"vec_id")
    })

  /** One exact Lloyd iteration: assign quantized vectors to the integer init
    * codebook (max integer dot, min-c tiebreak), update each centroid to the
    * exact floor-mean of its members (empty clusters keep the init row).
    * The 8x64 trained codebook is collected to the driver and re-broadcast
    * as a literal — the IVF-training analog of a kmeans fit. */
  private[graft] def trainCodebook(emb: DataFrame,
                            init: Seq[Seq[Long]] = IntInitCents,
                            broadcastAssign: Boolean = false): Seq[Seq[Long]] = {
    import emb.sparkSession.implicits._
    val k = init.length
    // assignment: literal codebook for small K, SparkContext broadcast for
    // large K (the q97 shape). The broadcast path's double accumulation is
    // exact on these integer magnitudes (< 2^53), so both paths agree
    // bit-for-bit (AnnEquivalenceSpec pins it).
    val home =
      if (broadcastAssign)
        assignProbesBroadcast(
          emb.select($"vec_id", $"q", $"q".cast("array<double>").as("qd")),
          init.map(_.map(_.toDouble)), nprobe = 1, "qd")
          .select($"q", $"c")
      else assignProbes(emb.select($"vec_id", $"q"),
        centArrayLitL(init), nprobe = 1, idot, "q")
      .select($"q", $"c")
    // centroid update by treeAggregate (round-6, VERDICT r5 #5): the
    // per-dimension sums accumulate EXECUTOR-SIDE into one K x 64 long
    // array per partition, combined pairwise — no posexplode (64x the
    // rows), no (c, d) shuffle, and the driver receives O(K) partials
    // instead of a K*64-row result set. Scale math: at the K ~ sqrt(N) ~
    // 10^6 design point a partial is K*65*8B ~ 520 MB — past ~10^5 shard
    // the codebook across several aggregates or raise depth; at the tested
    // K <= 1024 a partial is ~0.5 MB. Long sums are exact and
    // order-independent, so the result is bit-identical to the old
    // groupBy/collect path (the oracle replay and AnnEquivalenceSpec pin
    // it).
    val agg = home.select($"c", $"q").as[(Int, Array[Long])].rdd
      .treeAggregate(null: Array[Long])(
        seqOp = (acc0, row) => {
          val acc = if (acc0 == null) new Array[Long](k * 65) else acc0
          val (c, q) = row
          val base = c * 65
          var d = 0
          while (d < 64) { acc(base + d) += q(d); d += 1 }
          acc(base + 64) += 1L // member count
          acc
        },
        combOp = (a, b) => {
          if (a == null) b
          else if (b == null) a
          else {
            var i = 0
            while (i < a.length) { a(i) += b(i); i += 1 }
            a
          }
        },
        depth = 2)
    (0 until k).map { c =>
      val n = if (agg == null) 0L else agg(c * 65 + 64)
      (0 until 64).map { d =>
        if (n == 0L) init(c)(d) // empty cluster keeps the init row
        // exact floor division, same value as the SQL (s - pmod(s, n)) div n
        else Math.floorDiv(agg(c * 65 + d), n)
      }
    }
  }

  /**
   * Shared IVF probe search: homes joined to broadcast query probes on the
   * cluster id, cosine top-3 per query. `homeR` = how many centroids each
   * DATABASE vector is indexed under (the probe count is whatever
   * `assigned` carries — its rk range).
   *
   * homeR = 1 is plain IVF (row_number top-3). homeR > 1 is
   * MULTI-ASSIGNMENT with an exact re-rank (the recall-recovery stage):
   * index replication — memory, not query cost — buys recall, and the
   * candidate union's duplicates (a vector can reach one query through
   * several shared clusters) are collapsed INSIDE the same per-query
   * window pass: cosine does not depend on WHICH cluster matched, so
   * exact duplicate rows tie bitwise on the (cos DESC, vec_id) order key
   * and DENSE_RANK collapses them to one rank — rank <= k then equals the
   * row_number of the deduped candidate set, with zero additional shuffle
   * below or beside the window (the final distinct runs on <= k rows per
   * query; skipped entirely at homeR = 1 where no duplicates exist).
   */
  private def ivfSearch(assigned: DataFrame, homeR: Int = 1): DataFrame = {
    import assigned.sparkSession.implicits._
    val homes = assigned.filter($"rk" <= homeR)
      .select($"vec_id", $"v", $"vn", $"c")
    val qprobes = assigned.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"v".as("qv"), $"vn".as("qn"), $"c")
    val cand = homes.join(broadcast(qprobes), "c")
      .filter($"vec_id" =!= $"qid")
      .withColumn("cos", dot($"qv", $"v") / ($"qn" * $"vn"))
    val wTop = Window.partitionBy($"qid").orderBy($"cos".desc, $"vec_id")
    if (homeR == 1)
      cand.withColumn("rnk", row_number().over(wTop).cast("bigint"))
        .filter($"rnk" <= 3)
        .select($"qid", $"rnk", $"vec_id")
        .orderBy($"qid", $"rnk")
    else
      cand.withColumn("rnk", dense_rank().over(wTop).cast("bigint"))
        .filter($"rnk" <= 3)
        .select($"qid", $"rnk", $"vec_id")
        .distinct()
        .orderBy($"qid", $"rnk")
  }

  /** q44 oracle scaffolding: per-dim exploded quantized vectors + the
    * integer init codebook + one exact Lloyd step, all in SQL. */
  private def trainedCentsSql: String = trainedCentsSqlFor(
    IvfK, "CAST((((c.c * 37 + d.d * 11) % 13) - 6) * 166667 AS BIGINT)")

  /** Training replay parameterized by K and the init-codebook expression
    * (in terms of c.c / d.d) — shared by q44 (small K, ladder init) and
    * q103 (K=1024, long-period-hash init). */
  private def trainedCentsSqlFor(k: Int, initW: String): String =
    s"""vq AS (
       |  SELECT vec_id, v, vn,
       |         list_transform(v, x -> CAST(ROUND(x * $IvfQuant, 0) AS BIGINT)) AS q
       |  FROM e),
       |vdim AS (
       |  SELECT vec_id, unnest(q) AS qv, unnest(generate_series(0, 63)) AS d FROM vq),
       |m0 AS (
       |  SELECT c.c, d.d,
       |         $initW AS w
       |  FROM generate_series(0, ${k - 1}) c(c), generate_series(0, 63) d(d)),
       |dots0 AS (
       |  SELECT vdim.vec_id, m0.c, SUM(vdim.qv * m0.w) AS dt
       |  FROM vdim JOIN m0 ON vdim.d = m0.d GROUP BY 1, 2),
       |home0 AS (
       |  SELECT vec_id, c FROM (
       |    SELECT vec_id, c, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dt DESC, c) AS rk
       |    FROM dots0) WHERE rk = 1),
       |msum AS (
       |  SELECT h.c, vdim.d, SUM(vdim.qv) AS s, COUNT(*) AS n
       |  FROM vdim JOIN home0 h ON vdim.vec_id = h.vec_id GROUP BY 1, 2),
       |m1 AS (
       |  SELECT m0.c, m0.d,
       |         COALESCE(CAST((msum.s - ((msum.s % msum.n) + msum.n) % msum.n) // msum.n AS BIGINT), m0.w) AS w
       |  FROM m0 LEFT JOIN msum ON m0.c = msum.c AND m0.d = msum.d)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q40_ann_bruteforce" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (
        |  SELECT vec_id AS qid, v AS qv, sqrt(list_dot_product(v, v)) AS qn
        |  FROM e WHERE vec_id < 10),
        |c AS (
        |  SELECT q.qid, e.vec_id,
        |         list_dot_product(q.qv, e.v) / (q.qn * sqrt(list_dot_product(e.v, e.v))) AS cos
        |  FROM q, e WHERE e.vec_id <> q.qid),
        |r AS (
        |  SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rnk
        |  FROM c)
        |SELECT qid, rnk, vec_id FROM r WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin,

    "q41_lsh_buckets" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |b AS (
         |  SELECT vec_id, ${bucketSql(0, 8)} AS bucket
         |  FROM e)
         |SELECT bucket, COUNT(*) AS n_vecs, MIN(vec_id) AS min_vec, MAX(vec_id) AS max_vec
         |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,

    "q43_ann_ivf" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v,
         |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS vn
         |  FROM embeddings),
         |cents AS (
         |  SELECT c.c,
         |         (SELECT LIST(CAST(((c.c * 37 + d * 11) % 13) - 6 AS DOUBLE) / 6.0 ORDER BY d)
         |          FROM generate_series(0, 63) t(d)) AS w
         |  FROM generate_series(0, 15) c(c)),
         |scored AS (
         |  SELECT e.vec_id, e.v, e.vn, c.c, list_dot_product(e.v, c.w) AS cdot,
         |         ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |                            ORDER BY list_dot_product(e.v, c.w) DESC, c.c) AS rk
         |  FROM e, cents c),
         |homes AS (SELECT vec_id, v, vn, c FROM scored WHERE rk = 1),
         |qprobes AS (SELECT vec_id AS qid, v AS qv, vn AS qn, c FROM scored
         |            WHERE rk <= 4 AND vec_id < 10),
         |cand AS (
         |  SELECT q.qid, h.vec_id,
         |         list_dot_product(q.qv, h.v) / (q.qn * h.vn) AS cos
         |  FROM homes h JOIN qprobes q ON h.c = q.c
         |  WHERE h.vec_id <> q.qid),
         |r AS (SELECT qid, vec_id,
         |             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rnk
         |      FROM cand)
         |SELECT qid, rnk, vec_id FROM r WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin,

    // q102: multi-assignment homes (rk <= 2) + dense-rank re-rank. cosine
    // is independent of the matched cluster, so duplicate candidate rows
    // tie bitwise and DENSE_RANK = row_number of the deduped union.
    "q102_ann_ivf_rerank" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v,
         |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS vn
         |  FROM embeddings),
         |cents AS (
         |  SELECT c.c,
         |         (SELECT LIST(CAST(((c.c * 37 + d * 11) % 13) - 6 AS DOUBLE) / 6.0 ORDER BY d)
         |          FROM generate_series(0, 63) t(d)) AS w
         |  FROM generate_series(0, 15) c(c)),
         |scored AS (
         |  SELECT e.vec_id, e.v, e.vn, c.c,
         |         ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |                            ORDER BY list_dot_product(e.v, c.w) DESC, c.c) AS rk
         |  FROM e, cents c),
         |homes AS (SELECT vec_id, v, vn, c FROM scored WHERE rk <= 2),
         |qprobes AS (SELECT vec_id AS qid, v AS qv, vn AS qn, c FROM scored
         |            WHERE rk <= 4 AND vec_id < 10),
         |cand AS (
         |  SELECT q.qid, h.vec_id,
         |         list_dot_product(q.qv, h.v) / (q.qn * h.vn) AS cos
         |  FROM homes h JOIN qprobes q ON h.c = q.c
         |  WHERE h.vec_id <> q.qid),
         |r AS (SELECT qid, vec_id,
         |             DENSE_RANK() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rnk
         |      FROM cand)
         |SELECT DISTINCT qid, rnk, vec_id FROM r WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin,

    "q97_ann_ivf_broadcast" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v,
         |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS vn
         |  FROM embeddings),
         |cents AS (
         |  SELECT c.c,
         |         (SELECT LIST(CAST((((c.c * 2654435761 + d * 40503) % 8191) - 4095) AS DOUBLE) / 4095.0 ORDER BY d)
         |          FROM generate_series(0, 63) t(d)) AS w
         |  FROM generate_series(0, ${BigK - 1}) c(c)),
         |scored AS (
         |  SELECT e.vec_id, e.v, e.vn, c.c,
         |         ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |                            ORDER BY list_dot_product(e.v, c.w) DESC, c.c) AS rk
         |  FROM e, cents c),
         |homes AS (SELECT vec_id, v, vn, c FROM scored WHERE rk = 1),
         |qprobes AS (SELECT vec_id AS qid, v AS qv, vn AS qn, c FROM scored
         |            WHERE rk <= 64 AND vec_id < 10),
         |cand AS (
         |  SELECT q.qid, h.vec_id,
         |         list_dot_product(q.qv, h.v) / (q.qn * h.vn) AS cos
         |  FROM homes h JOIN qprobes q ON h.c = q.c
         |  WHERE h.vec_id <> q.qid),
         |r AS (SELECT qid, vec_id,
         |             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rnk
         |      FROM cand)
         |SELECT qid, rnk, vec_id FROM r WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin,

    "q44_ann_ivf_trained" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v,
         |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS vn
         |  FROM embeddings),
         |$trainedCentsSql,
         |dots1 AS (
         |  SELECT vdim.vec_id, m1.c, SUM(vdim.qv * m1.w) AS dt
         |  FROM vdim JOIN m1 ON vdim.d = m1.d GROUP BY 1, 2),
         |ranked AS (
         |  SELECT vec_id, c, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dt DESC, c) AS rk
         |  FROM dots1),
         |homes AS (
         |  SELECT e.vec_id, e.v, e.vn, r.c
         |  FROM ranked r JOIN e ON r.vec_id = e.vec_id WHERE r.rk = 1),
         |qprobes AS (
         |  SELECT e.vec_id AS qid, e.v AS qv, e.vn AS qn, r.c
         |  FROM ranked r JOIN e ON r.vec_id = e.vec_id
         |  WHERE r.rk <= 2 AND e.vec_id < 10),
         |cand AS (
         |  SELECT q.qid, h.vec_id,
         |         list_dot_product(q.qv, h.v) / (q.qn * h.vn) AS cos
         |  FROM homes h JOIN qprobes q ON h.c = q.c
         |  WHERE h.vec_id <> q.qid),
         |r AS (SELECT qid, vec_id,
         |             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rnk
         |      FROM cand)
         |SELECT qid, rnk, vec_id FROM r WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin,

    // q103: identical replay to q44's trained path at K=1024 with the
    // long-period-hash integer init and nprobe 16. The Spark side runs
    // both passes through the broadcast UDF; integer-exact arithmetic
    // makes the two engines bit-equal.
    "q103_ann_ivf_trained_broadcast" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v,
         |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS vn
         |  FROM embeddings),
         |${trainedCentsSqlFor(BigIvfK,
              "CAST(((c.c * 2654435761 + d.d * 40503) % 8191 - 4095) * 122 AS BIGINT)")},
         |dots1 AS (
         |  SELECT vdim.vec_id, m1.c, SUM(vdim.qv * m1.w) AS dt
         |  FROM vdim JOIN m1 ON vdim.d = m1.d GROUP BY 1, 2),
         |ranked AS (
         |  SELECT vec_id, c, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dt DESC, c) AS rk
         |  FROM dots1),
         |homes AS (
         |  SELECT e.vec_id, e.v, e.vn, r.c
         |  FROM ranked r JOIN e ON r.vec_id = e.vec_id WHERE r.rk = 1),
         |qprobes AS (
         |  SELECT e.vec_id AS qid, e.v AS qv, e.vn AS qn, r.c
         |  FROM ranked r JOIN e ON r.vec_id = e.vec_id
         |  WHERE r.rk <= 16 AND e.vec_id < 10),
         |cand AS (
         |  SELECT q.qid, h.vec_id,
         |         list_dot_product(q.qv, h.v) / (q.qn * h.vn) AS cos
         |  FROM homes h JOIN qprobes q ON h.c = q.c
         |  WHERE h.vec_id <> q.qid),
         |r AS (SELECT qid, vec_id,
         |             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rnk
         |      FROM cand)
         |SELECT qid, rnk, vec_id FROM r WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin,

    // q108: q103's trained replay with rk <= 2 homes and the dense-rank
    // re-rank (duplicates tie bitwise, DISTINCT collapses them)
    "q108_ann_ivf_full" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v,
         |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS vn
         |  FROM embeddings),
         |${trainedCentsSqlFor(BigIvfK,
              "CAST(((c.c * 2654435761 + d.d * 40503) % 8191 - 4095) * 122 AS BIGINT)")},
         |dots1 AS (
         |  SELECT vdim.vec_id, m1.c, SUM(vdim.qv * m1.w) AS dt
         |  FROM vdim JOIN m1 ON vdim.d = m1.d GROUP BY 1, 2),
         |ranked AS (
         |  SELECT vec_id, c, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dt DESC, c) AS rk
         |  FROM dots1),
         |homes AS (
         |  SELECT e.vec_id, e.v, e.vn, r.c
         |  FROM ranked r JOIN e ON r.vec_id = e.vec_id WHERE r.rk <= 2),
         |qprobes AS (
         |  SELECT e.vec_id AS qid, e.v AS qv, e.vn AS qn, r.c
         |  FROM ranked r JOIN e ON r.vec_id = e.vec_id
         |  WHERE r.rk <= 256 AND e.vec_id < 10),
         |cand AS (
         |  SELECT q.qid, h.vec_id,
         |         list_dot_product(q.qv, h.v) / (q.qn * h.vn) AS cos
         |  FROM homes h JOIN qprobes q ON h.c = q.c
         |  WHERE h.vec_id <> q.qid),
         |r AS (SELECT qid, vec_id,
         |             DENSE_RANK() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rnk
         |      FROM cand)
         |SELECT DISTINCT qid, rnk, vec_id FROM r WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin,

    "q46_embed_quantize" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |s AS (
        |  SELECT vec_id,
        |         list_transform(v, x -> CAST(ROUND(x / list_max(list_transform(v, y -> abs(y))) * 127.0, 0) AS BIGINT)) AS q
        |  FROM e)
        |SELECT vec_id,
        |       CAST(len(list_filter(q, x -> abs(x) = 127)) AS BIGINT) AS n_sat,
        |       CAST(list_sum(q) AS BIGINT) AS sum_q,
        |       CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS sq_norm
        |FROM s ORDER BY vec_id""".stripMargin,

    "q42_neardup_embedding" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |b0 AS (
         |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS vn FROM e),
         |sigs AS (
         |  ${(0 until NumTables).map(t =>
             s"SELECT vec_id, $t AS t, ${bucketSql(t, PlanesPerTable)} AS bucket FROM b0")
             .mkString("\n  UNION ALL\n  ")}),
         |capped AS (
         |  SELECT vec_id, t, bucket FROM (
         |    SELECT vec_id, t, bucket, COUNT(*) OVER (PARTITION BY t, bucket) AS nb
         |    FROM sigs)
         |  WHERE nb <= $EmbBucketCap),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS a_id, x.vec_id AS b_id
         |  FROM capped a JOIN capped x ON a.t = x.t AND a.bucket = x.bucket AND a.vec_id < x.vec_id)
         |SELECT c.a_id, c.b_id
         |FROM cand c JOIN b0 a ON c.a_id = a.vec_id JOIN b0 x ON c.b_id = x.vec_id
         |WHERE list_dot_product(a.v, x.v) / (a.vn * x.vn) >= 0.2
         |ORDER BY a_id, b_id""".stripMargin)
}
