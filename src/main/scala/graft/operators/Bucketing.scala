package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins — the shuffle-elimination tool for repeated
  * large-×-large joins on a stable key (SURVEY §7 scale notes; at 100 TB a
  * fact-fact join on a hot key must not re-shuffle both sides per query).
  *
  * Writing both sides with `bucketBy(n, key)` + `sortBy(key)` pins each
  * key range to a bucket file; Spark's scan then reports the hash
  * partitioning, so the join planner skips both Exchanges (and with
  * sorted buckets, the sort). One-time write cost, amortized across every
  * subsequent join on that key.
  */
object Bucketing {

  /** Persist `df` as a bucketed+sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Join two bucketed tables on their bucket key — plans with zero
    * shuffle exchanges when both sides share the bucket count. */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
