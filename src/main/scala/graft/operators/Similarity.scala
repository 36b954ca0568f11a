package graft.operators

import graft.functions.VectorOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search.
  *
  * Scale notes:
  *   - dot products run through [[graft.functions.DotProduct]] — one tight
  *     primitive loop per pair, deterministic sequential double
  *     accumulation (bit-identical to the DuckDB oracle's
  *     list_dot_product), no boxed lambda per element.
  *   - squared norms are computed ONCE per side and joined into the pair
  *     stage; only the cross-pair dot is per-pair work. The similarity is
  *     still the oracle's exact expression shape
  *     dot/(sqrt(normSq_i * normSq_j)).
  *   - brute-force top-k broadcasts the (small) query side; the window
  *     top-k partitions by query id so each query ranks independently.
  *   - at real scale the sign-LSH variant bounds candidate generation:
  *     one packed-signature pass per row ([[graft.functions.LshSignBits]]),
  *     band bucket join, exact re-scoring of candidates only.
  */
object Similarity {

  /** Deterministic double-precision cosine between two array columns
    * (self-norms recomputed per call — prefer the pre-normed paths below
    * in pair loops). */
  def cosine(a: Column, b: Column): Column =
    VectorOps.dot(a, b) / sqrt(VectorOps.normSq(a) * VectorOps.normSq(b))

  private def withNormSq(df: DataFrame, idCol: String, vecCol: String,
      idAs: String, vecAs: String, nsqAs: String): DataFrame =
    df.select(col(idCol).as(idAs), col(vecCol).as(vecAs),
      VectorOps.normSq(col(vecCol)).as(nsqAs))

  /** Brute-force cosine top-k: for each vector in `queries`, the k nearest
    * rows of `corpus` (self-matches excluded). Ranking uses the rounded
    * similarity with id tie-breaks so results are reproducible across
    * engines and runs. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // the per-pair dot-product stage streams the corpus side of the
    // broadcast cross join — parallelize it when the scan is one small
    // file (Par.ensure is a no-op on already-parallel inputs)
    val q = withNormSq(queries, idCol, vecCol, "query_id", "qv", "qn")
    val c = withNormSq(Par.ensure(corpus, col(idCol)),
      idCol, vecCol, "neighbor_id", "cv", "cn")
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim",
        round(VectorOps.dot(col("qv"), col("cv")) /
          sqrt(col("qn") * col("cn")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "sim", "rnk")
  }

  /** All pairs with cosine ≥ threshold (exact O(n²) scoring — the
    * correctness baseline the LSH path is judged against). */
  def thresholdPairs(corpus: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // O(n²) pair scoring streams one side of the cross join per task —
    // a single-file corpus scan would run the whole quadratic loop on
    // one core (Par.ensure is a no-op on already-parallel inputs)
    val src = Par.ensure(corpus, col(idCol))
    val a = withNormSq(src, idCol, vecCol, "i", "va", "na")
    val b = withNormSq(src, idCol, vecCol, "j", "vb", "nb")
    a.crossJoin(b)
      .filter(col("i") < col("j"))
      .withColumn("sim",
        round(VectorOps.dot(col("va"), col("vb")) /
          sqrt(col("na") * col("nb")), 6))
      .filter(col("sim") >= threshold)
      .select("i", "j", "sim")
  }

  /** Sign-LSH bucketed near-neighbor pairs: `numBits` hash-derived
    * hyperplanes packed into one signature pass, bucket docs by band,
    * exact-verify candidates. Returns a subset of [[thresholdPairs]]
    * (recall < 1 by design); the scale path when O(n²) is unaffordable. */
  def lshBucketedPairs(corpus: DataFrame, threshold: Double, dim: Int,
      numBits: Int = 16, bands: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(numBits % bands == 0)
    val rowsPerBand = numBits / bands
    val mask = (1 << rowsPerBand) - 1
    val corpusPar = Par.ensure(corpus, col(idCol))
    val sigs = corpusPar.select(col(idCol).as("doc"),
        VectorOps.lshSignBits(col(vecCol), numBits).as("sig"))
    val banded = sigs.select(col("doc"),
        posexplode(array((0 until bands).map(bnd =>
          shiftright(col("sig"), bnd * rowsPerBand).bitwiseAND(lit(mask))): _*))
          .as(Seq("band", "bh")))
    val cand = banded.alias("x").join(banded.alias("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
        col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("i"), col("y.doc").as("j"))
      .distinct()
    val a = withNormSq(corpus, idCol, vecCol, "ia", "va", "na")
    val b = withNormSq(corpus, idCol, vecCol, "jb", "vb", "nb")
    cand.join(a, col("i") === col("ia"))
      .join(b, col("j") === col("jb"))
      .withColumn("sim",
        round(VectorOps.dot(col("va"), col("vb")) /
          sqrt(col("na") * col("nb")), 6))
      .filter(col("sim") >= threshold)
      .select("i", "j", "sim")
  }

  /** Semantic dedup (the SemDeDup shape, Abbas et al. 2023): k-means
    * cluster the embedding space, find cosine-≥-threshold pairs only
    * WITHIN each cluster, and keep one representative (min id) per
    * near-duplicate group. This is the scale path that replaces the
    * O(n²) [[thresholdPairs]] cross join: after the per-row centroid
    * assignment (broadcast centroids, no shuffle), the pair join is
    * keyed on `(list_id)` so each cluster self-joins independently —
    * O(Σ c_i²) work bounded by the largest cluster instead of n², and
    * the components run over the sparse pair graph only.
    *
    * Returns `(doc_id, component, keep)` for every corpus row (docs in
    * no pair survive as their own component). Recall is sub-unity by
    * design (near-dups sharing none of their `probes` nearest clusters
    * are unseen); every removal is
    * exact-verified (sim recomputed in full precision inside the
    * cluster), so removals are always a SUBSET of the exact
    * threshold-graph removals — precision 1 by construction. */
  def semanticDedup(corpus: DataFrame, threshold: Double, nlist: Int,
      iters: Int = 2, probes: Int = 2, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val corpusPar = Par.ensure(corpus, col(idCol))
    val model = IvfIndex.train(corpus, nlist, iters, idCol, vecCol)
    // multi-probe assignment: each vector joins its `probes` nearest
    // clusters (still per-row / shuffle-free — the standard recall lever
    // for boundary vectors whose near-dups sit across a centroid seam)
    val scored = model.centroids.map { case (lid, c) =>
      val cNorm = math.sqrt(c.map(x => x * x).sum)
      struct((VectorOps.dot(col(vecCol), lit(c)) / lit(cNorm)).as("score"),
        lit(lid).as("lid"))
    }
    val byScoreDesc = (l: Column, r: Column) =>
      when(l.getField("score") > r.getField("score"), -1)
        .when(l.getField("score") < r.getField("score"), 1)
        .otherwise(l.getField("lid") - r.getField("lid"))
    val assigned = corpusPar.withColumn("list_id",
      explode(transform(
        slice(array_sort(array(scored.toIndexedSeq: _*), byScoreDesc),
          1, math.min(probes, nlist)),
        s => s.getField("lid"))))
    val a = assigned.select(col("list_id"), col(idCol).as("i"),
      col(vecCol).as("va"), VectorOps.normSq(col(vecCol)).as("na"))
    val b = assigned.select(col("list_id"), col(idCol).as("j"),
      col(vecCol).as("vb"), VectorOps.normSq(col(vecCol)).as("nb"))
    val pairs = a.join(b, Seq("list_id"))
      .filter(col("i") < col("j"))
      .withColumn("sim",
        round(VectorOps.dot(col("va"), col("vb")) /
          sqrt(col("na") * col("nb")), 6))
      .filter(col("sim") >= threshold)
      .select("i", "j").distinct()
    val comp = Components.dedupClusters(pairs, "i", "j")
      .select(col("doc_id").as("__cid"), col("component"), col("keep"))
    corpus.select(col(idCol).as("doc_id"))
      .join(comp, col("doc_id") === col("__cid"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component"),
        coalesce(col("keep"), lit(true)).as("keep"))
  }

  // ── int8 scalar quantization ──────────────────────────────────────────
  //
  // At 100 TB of embeddings the ANN probe cost is the SCAN: float64
  // vectors are 8 bytes/dim, int8 is 1. Symmetric per-vector
  // quantization (q_i = round(x_i/scale), scale = max|x|/127) preserves
  // cosine RANKING well because the per-vector scales cancel out of
  // cos_q = dot(q_a,q_b)/sqrt(|q_a|²|q_b|²) — so the probe ranks on
  // int8 arrays only, and the full-precision vectors are fetched for a
  // short candidate list (k×probeFactor per query) via a selective join,
  // never a second scan. Rescoring restores exact scores; quantization
  // can only cost recall, never precision of the reported similarity.

  /** Per-vector symmetric int8 quantization: (id, scale, qvec). The
    * quantized column is ArrayType(ByteType) — 1 byte/dim on the wire
    * and in parquet (vs 8 for the double input). */
  def quantize(df: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val absmax = array_max(transform(col(vecCol), x => abs(x)))
    val scale = when(absmax === 0d, lit(1d)).otherwise(absmax / 127d)
    df.select(col(idCol), scale.as("scale"),
      transform(col(vecCol), x => round(x / scale).cast("tinyint"))
        .as("qvec"))
  }

  /** Quantized-probe + exact-rescore top-k: ranks all candidates on the
    * int8 cosine, keeps `k * probeFactor` per query, rescores ONLY those
    * with the full-precision vectors, and returns the exact-scored top
    * k — the same output shape (and rounding/tie conventions) as
    * [[bruteForceTopK]]. */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      probeFactor: Int = 4, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val corpusPar = Par.ensure(corpus, col(idCol))
    val qc = quantize(corpusPar, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col("qvec").as("cq"),
        VectorOps.normSq(col("qvec")).as("cqn"))
    val qq = quantize(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"), col("qvec").as("qq"),
        VectorOps.normSq(col("qvec")).as("qqn"))
    val probed = qc.crossJoin(broadcast(qq))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("qsim",
        VectorOps.dot(col("qq"), col("cq")) / sqrt(col("qqn") * col("cqn")))
    val wProbe = Window.partitionBy("query_id")
      .orderBy(col("qsim").desc, col("neighbor_id"))
    val cand = probed.withColumn("prnk", row_number().over(wProbe))
      .filter(col("prnk") <= k * probeFactor)
      .select("query_id", "neighbor_id")
    // exact rescore of the short list only
    val c = withNormSq(corpus, idCol, vecCol, "cid", "cv", "cn")
    val q = withNormSq(queries, idCol, vecCol, "qid", "qv", "qn")
    val rescored = cand
      .join(c, col("neighbor_id") === col("cid"))
      .join(broadcast(q), col("query_id") === col("qid"))
      .withColumn("sim",
        round(VectorOps.dot(col("qv"), col("cv")) /
          sqrt(col("qn") * col("cn")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    rescored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "sim", "rnk")
  }
}
