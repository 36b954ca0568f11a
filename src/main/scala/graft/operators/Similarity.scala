package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Embedding similarity search.
  *
  * Scale notes:
  *   - dot products run as `aggregate(zip_with(...))` over DOUBLE — pure
  *     codegen'd per-row math, deterministic sequential accumulation (the
  *     DuckDB oracle matches to ~1e-14, far below the rounding we emit).
  *   - brute-force top-k broadcasts the (small) query side and lets
  *     Catalyst pick broadcast-nested-loop; the window top-k is
  *     rank-partitioned by query id so each query ranks independently.
  *   - at real scale the LSH variant bounds candidate generation: sign
  *     projections on pseudo-random hyperplanes (hash-derived, so fully
  *     deterministic without driver-side randomness), bucket join, exact
  *     re-scoring of candidates only.
  */
object Similarity {

  /** Deterministic double-precision cosine between two array columns. */
  def cosine(a: Column, b: Column): Column = {
    def d(c: Column) = c.cast("array<double>")
    def dot(x: Column, y: Column) =
      aggregate(zip_with(d(x), d(y), (u, v) => u * v), lit(0d), (acc, v) => acc + v)
    dot(a, b) / sqrt(dot(a, a) * dot(b, b))
  }

  /** Brute-force cosine top-k: for each vector in `queries`, the k nearest
    * rows of `corpus` (self-matches excluded). Ranking uses the rounded
    * similarity with id tie-breaks so results are reproducible across
    * engines and runs. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("qv"), col("cv")), 6))
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
    val a = corpus.select(col(idCol).as("i"), col(vecCol).as("va"))
    val b = corpus.select(col(idCol).as("j"), col(vecCol).as("vb"))
    a.crossJoin(b)
      .filter(col("i") < col("j"))
      .withColumn("sim", round(cosine(col("va"), col("vb")), 6))
      .filter(col("sim") >= threshold)
      .select("i", "j", "sim")
  }

  /** Sign-LSH bucketed near-neighbor pairs: `numBits` pseudo-random
    * hyperplanes (components derived from xxhash64, no RNG state), bucket
    * docs by sign pattern over `bands` bands, exact-verify candidates.
    * Returns a subset of [[thresholdPairs]] (recall < 1 by design); the
    * scale path when O(n²) is unaffordable. */
  def lshBucketedPairs(corpus: DataFrame, threshold: Double, dim: Int,
      numBits: Int = 16, bands: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(numBits % bands == 0)
    val rowsPerBand = numBits / bands
    // plane p, component j: a deterministic pseudo-random value in [-1, 1]
    def planeComponent(p: Int, j: Int): Column =
      (xxhash64(lit(s"plane:$p:$j")) % 1000000L).cast(DoubleType) / 1000000d
    val v = col(vecCol).cast("array<double>")
    val bits = (0 until numBits).map { p =>
      val dot = (0 until dim).map(j =>
        element_at(v, j + 1) * planeComponent(p, j)).reduce(_ + _)
      when(dot >= 0, lit(1)).otherwise(lit(0))
    }
    val bandCols = (0 until bands).map { bnd =>
      val bs = (bnd * rowsPerBand until (bnd + 1) * rowsPerBand).map(bits)
      struct(lit(bnd).as("band"),
        bs.zipWithIndex.map { case (b, i) => b * (1 << i) }.reduce(_ + _).as("bh"))
    }
    val hashed = corpus.select(col(idCol).as("doc"), col(vecCol).as("vec"),
        explode(array(bandCols: _*)).as("b"))
      .select(col("doc"), col("vec"), col("b.band").as("band"), col("b.bh").as("bh"))
    val cand = hashed.alias("x").join(hashed.alias("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
        col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("i"), col("y.doc").as("j"),
        col("x.vec").as("va"), col("y.vec").as("vb"))
      .distinct()
    cand.withColumn("sim", round(cosine(col("va"), col("vb")), 6))
      .filter(col("sim") >= threshold)
      .select("i", "j", "sim")
  }
}
