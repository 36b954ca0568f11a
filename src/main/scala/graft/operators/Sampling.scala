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

  /** Domain-balanced mixture sampling: per-domain deterministic
    * hash-sample rates chosen so the selected corpus approaches EQUAL
    * token share per domain within `budgetFraction` of the total —
    * `rate_d = min(1, total·budget / #domains / tokens_d)` — the
    * mixture-rebalancing step every pretraining pipeline runs before
    * tokenization (downweight the dominant crawl, keep all of the
    * scarce domains).
    *
    * Scale shape: one tiny aggregate (per-domain token totals,
    * O(#domains) rows), broadcast back onto the corpus, then a pure
    * per-row hash filter — the 100 TB corpus is read once and never
    * shuffled. `tokensCol` must be integral so the rate arithmetic is
    * exact-integer → double in a fixed operation order, making the
    * selection bit-reproducible across engines and reruns (the same
    * property the other samplers here guarantee). */
  def domainBalanced(df: DataFrame, domainCol: String, idCol: String,
      tokensCol: String, budgetFraction: Double): DataFrame = {
    val dom = df.groupBy(domainCol)
      .agg(sum(col(tokensCol)).cast("long").as("__dt"))
    val tot = dom.agg(sum(col("__dt")).as("__all"),
      count(lit(1)).as("__nd"))
    val rates = dom.crossJoin(broadcast(tot))
      .select(col(domainCol),
        least(lit(1.0),
          col("__all").cast("double") * lit(budgetFraction) /
            col("__nd").cast("double") / col("__dt").cast("double"))
          .as("__rate"))
    // threshold = first 8 md5 hex digits vs floor(rate · 2^32), capped
    // at ffffffff so rate = 1 keeps every row; fixed-width lowercase
    // hex compares lexicographically == numerically
    df.join(broadcast(rates), Seq(domainCol))
      .where(substring(md5(col(idCol).cast("string")), 1, 8) <=
        lpad(lower(hex(least(
          floor(col("__rate") * lit(4294967296.0)).cast("long"),
          lit(4294967295L)))), 8, "0"))
      .drop("__rate")
  }

  /** Deterministic global corpus shuffle + shard assignment — the step
    * between curation and tokenization: examples must reach training in
    * a reproducible pseudo-random order, split into `nShards` files of
    * near-equal size. Order = md5 of (seed ':' id) with id tie-break
    * (engine-agnostic, no RNG state: re-running over the same corpus
    * yields bit-identical shard contents AND order); shard = position
    * mod nShards (round-robin over the shuffled order, so shard sizes
    * differ by at most one — a hash-mod over ids would skew).
    *
    * Scale shape: ONE global range-sort on the hash (Spark samples the
    * hash space, so ranges balance regardless of id distribution) —
    * exactly the partitioned sort a 100 TB shard-writer runs, where each
    * sorted range partition becomes a shard file with no further
    * exchange. The row_number over the single global ordering is the
    * oracle-matchable small-scale rendering of that position. */
  def deterministicShuffle(df: DataFrame, idCol: String, seed: Long,
      nShards: Int): DataFrame = {
    require(nShards >= 1)
    val h = md5(concat(lit(seed.toString), lit(":"), col(idCol).cast("string")))
    val w = Window.orderBy(h, col(idCol))
    df.withColumn("shuffle_pos", row_number().over(w).cast("long") - 1)
      .withColumn("shard", (col("shuffle_pos") % nShards).cast("long"))
  }
}
