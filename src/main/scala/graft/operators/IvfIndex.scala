package graft.operators

import graft.functions.VectorOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the clustered
  * alternative to sign-LSH as the similarity scale path.
  *
  * Train: nlist centroids via deterministic seeding (lowest ids) + a few
  * Lloyd iterations. Centroids are tiny (nlist × dim doubles) and live on
  * the driver / in broadcasts — standard IVF practice; the corpus-side
  * work (assignment, scoring) stays fully distributed and per-row.
  *
  * Query: score each query against centroids, probe the `nprobe` nearest
  * lists, exact-score only vectors in probed lists. Recall < 1 by design;
  * accuracy/cost is tuned with nlist/nprobe.
  */
object IvfIndex {

  final case class Model(centroids: Array[(Int, Array[Double])])

  private def toDouble(a: Seq[Float]): Array[Double] = a.map(_.toDouble).toArray

  /** Deterministic k-means-lite: init from the nlist lowest-id vectors,
    * `iters` Lloyd steps. */
  def train(corpus: DataFrame, nlist: Int, iters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): Model = {
    val spark = corpus.sparkSession
    var centroids: Array[(Int, Array[Double])] = corpus
      .orderBy(col(idCol)).limit(nlist)
      .select(col(vecCol)).collect()
      .zipWithIndex
      .map { case (r, i) => (i, toDouble(r.getSeq[Float](0))) }

    for (_ <- 0 until iters) {
      val assigned = assign(corpus, Model(centroids), idCol, vecCol)
      val dim = centroids.head._2.length
      val sums = assigned
        .groupBy("list_id")
        .agg(
          count(lit(1)).as("n"),
          array((0 until dim).map(j =>
            sum(element_at(col(vecCol).cast("array<double>"), j + 1))): _*)
            .as("sums"))
        .collect()
      val updated = sums.map { r =>
        val lid = r.getInt(0)
        val n = r.getLong(1).toDouble
        val s = r.getSeq[Double](2)
        (lid, s.map(_ / n).toArray)
      }.toMap
      centroids = centroids.map { case (lid, c) => (lid, updated.getOrElse(lid, c)) }
    }
    Model(centroids)
  }

  /** Nearest-centroid assignment (per-row; no shuffle). */
  def assign(corpus: DataFrame, model: Model,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val v = col(vecCol)
    // argmin over centroids of negative cosine ≈ argmax dot/|c| (corpus
    // norm constant per row); greatest-based fold keeps it expression-only
    val scores = model.centroids.map { case (lid, c) =>
      val cNorm = math.sqrt(c.map(x => x * x).sum)
      val dot = VectorOps.dot(v, lit(c))
      struct((dot / lit(cNorm)).as("score"), lit(lid).as("lid"))
    }
    corpus.withColumn("list_id",
      greatest(scores.toIndexedSeq: _*).getField("lid"))
  }

  /** Top-k per query over the `nprobe` nearest lists only. */
  def topK(corpus: DataFrame, queries: DataFrame, model: Model, k: Int,
      nprobe: Int, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val assigned = assign(corpus, model, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        VectorOps.normSq(col(vecCol)).as("cn"), col("list_id"))
    // per query: the nprobe closest centroid ids
    val qScored = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      VectorOps.normSq(col(vecCol)).as("qn"))
    val centroidRows = model.centroids.map { case (lid, c) =>
      (lid, c.toSeq)
    }.toSeq
    val spark = corpus.sparkSession
    import spark.implicits._
    val cdf = centroidRows.toDF("list_id", "centroid")
    val probes = qScored.crossJoin(broadcast(cdf))
      .withColumn("cscore",
        VectorOps.dot(col("qv"), col("centroid")) / sqrt(VectorOps.normSq(col("centroid"))))
      .withColumn("crnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cscore").desc, col("list_id"))))
      .filter(col("crnk") <= nprobe)
      .select(col("query_id"), col("qv"), col("qn"), col("list_id"))
    probes.join(assigned, Seq("list_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim",
        round(VectorOps.dot(col("qv"), col("cv")) / sqrt(col("qn") * col("cn")), 6))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "sim", "rnk")
  }
}
