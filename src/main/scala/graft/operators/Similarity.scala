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
    val q = withNormSq(queries, idCol, vecCol, "query_id", "qv", "qn")
    val c = withNormSq(corpus, idCol, vecCol, "neighbor_id", "cv", "cn")
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
    val a = withNormSq(corpus, idCol, vecCol, "i", "va", "na")
    val b = withNormSq(corpus, idCol, vecCol, "j", "vb", "nb")
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
    val sigs = corpus.select(col(idCol).as("doc"),
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
}
