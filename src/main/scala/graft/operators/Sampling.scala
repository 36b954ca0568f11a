package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Scale notes: hash-ranked stratified sampling shuffles once on the
  * stratum key and keeps k rows per stratum via a bounded window —
  * reproducible across runs/engines (rank = md5 of the id, no RNG state),
  * which is what corpus curation needs: re-running the pipeline over
  * 100 TB must pick the SAME sample. True reservoir sampling is
  * order-dependent and non-reproducible across partitionings; hash
  * ranking is the distributed-safe equivalent.
  */
object Sampling {

  /** k rows per stratum, chosen by md5(id) order (uniform w.r.t. an
    * id-independent hash, deterministic everywhere). */
  def stratifiedByHash(df: DataFrame, stratumCol: String, idCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy(stratumCol)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .drop("__rank")
  }

  /** Deterministic fraction sample: keep rows whose id-hash falls below
    * the threshold — the shuffle-free scale path (pure per-row filter). */
  def fractionByHash(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1)
    // first 4 hex digits of md5 → [0, 65536); compare against the scaled
    // threshold. Engine-agnostic (md5 is md5 everywhere).
    df.filter(
      conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
        .cast("long") < (fraction * 65536).toLong)
  }
}
