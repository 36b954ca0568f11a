package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of (temporal) join: for every left row, attach the single right row
  * with the greatest `rightTs <= leftTs` for the same key — the
  * trades/quotes join every time-series store ships natively (DuckDB
  * `ASOF JOIN`, kdb `aj`) and Spark lacks.
  *
  * Spark-first formulation: NOT a join at all. Both sides are unioned
  * into one stream tagged by side, shuffled ONCE on the key, and the
  * right-side payload is carried forward with
  * `last(col, ignoreNulls) OVER (PARTITION BY key ORDER BY ts, side)`.
  * Left rows then read the most recent right payload at-or-before their
  * timestamp (right sorts before left on ties → inclusive match,
  * DuckDB's `l.ts >= r.ts` semantics).
  *
  * Scale notes (100 TB):
  *   - one hash shuffle on the key, zero joins — vs the naive
  *     join-then-argmax which shuffles both sides AND re-shuffles for
  *     the per-left-row max;
  *   - the window sort is per key-partition (Spark sorts each partition
  *     once for the whole frame family), cost O(n log n/p) per executor;
  *   - a pathologically hot key serializes into one task; the fix at
  *     scale is [[asOfBucketed]], which range-buckets time into the
  *     partition key so no task holds more than one key × bucket of
  *     rows. The plain variant is the default because real key spaces
  *     (user, symbol) are wide.
  */
object AsOfJoin {

  /** Left rows keep their columns; each `rightCols` c arrives as `r_c`
    * (null when no right row is at-or-before the left row —
    * at-or-AFTER with `forward = true`, which flips the carry to a
    * DESC window: the first right row ≥ the left timestamp, DuckDB's
    * `l.ts <= r.ts` orientation).
    *
    * NULL semantics match SQL joins: right rows with a NULL key or NULL
    * timestamp can never match (comparisons are never true against NULL)
    * and are excluded up front; left rows with a NULL key or timestamp
    * stay unmatched. The right payload is carried as ONE struct, so a
    * matched right row's own NULLs surface as NULLs — never a torn mix
    * of columns from different right rows. */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      rightCols: Seq[String], forward: Boolean = false): DataFrame = {
    val leftCols = left.columns.toSeq
    val rType = StructType(rightCols.map(c =>
      StructField(c, right.schema(c).dataType)))
    val taggedL = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
      .select(Seq(col(key).as("_k"), col("_ts"), col("_side")) ++
        leftCols.map(col) :+
        lit(null).cast(rType).as("_r"): _*)
    val taggedR = right
      .filter(col(key).isNotNull && col(rightTs).isNotNull)
      .withColumn("_ts", col(rightTs))
      .withColumn("_side", lit(0))
      .select(Seq(col(key).as("_k"), col("_ts"), col("_side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightCols.map(col): _*).as("_r"): _*)
    val w = Window.partitionBy("_k")
      .orderBy(
        if (forward) col("_ts").desc_nulls_first else col("_ts").asc_nulls_first,
        col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = taggedL.unionByName(taggedR)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
    carried.filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        rightCols.map(c => col("_m").getField(c).as(s"r_$c")): _*)
  }

  /** Skew-proof variant for pathologically hot keys: partitions on
    * (key, time-bucket) instead of key alone, so no single task ever
    * holds more than one key × `bucketSeconds` of rows.
    *
    * Two-level structure:
    *   1. within-bucket: the same union+window carry, partitioned by
    *      (key, bucket) — the hot key's timeline is split across buckets;
    *   2. cross-bucket: a per-(key, bucket) "latest right row" table
    *      (one row per key-bucket, tiny) gets a cumulative carry window
    *      over buckets; left rows whose bucket holds no earlier right row
    *      take the carry from the latest previous bucket.
    *
    * Same result as [[asOf]] (asserted in OperatorsSpec); use it when one
    * key dominates the stream (a bot user, a hardcoded symbol). */
  def asOfBucketed(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightCols: Seq[String],
      bucketSeconds: Long): DataFrame = {
    val leftCols = left.columns.toSeq
    val rType = StructType(rightCols.map(c =>
      StructField(c, right.schema(c).dataType)))
    // NULL-keyed / NULL-ts right rows can never match — drop them before
    // either carry (same contract as [[asOf]])
    val rightOk = right.filter(col(key).isNotNull && col(rightTs).isNotNull)
    def bucket(ts: Column): Column =
      floor(unix_micros(ts.cast("timestamp")) / lit(bucketSeconds * 1000000L))
    // 1. within-bucket carry — identical window, finer partitioning; the
    // payload travels as one struct so columns stay row-atomic
    val taggedL = left
      .withColumn("_ts", col(leftTs)).withColumn("_side", lit(1))
      .withColumn("_b", bucket(col(leftTs)))
      .select(Seq(col(key).as("_k"), col("_b"), col("_ts"), col("_side")) ++
        leftCols.map(col) :+
        lit(null).cast(rType).as("_r"): _*)
    val taggedR = rightOk
      .withColumn("_ts", col(rightTs)).withColumn("_side", lit(0))
      .withColumn("_b", bucket(col(rightTs)))
      .select(Seq(col(key).as("_k"), col("_b"), col("_ts"), col("_side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightCols.map(col): _*).as("_r"): _*)
    val wInB = Window.partitionBy("_k", "_b")
      .orderBy(col("_ts").asc_nulls_first, col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBucket = taggedL.unionByName(taggedR)
      .withColumn("_in", last(col("_r"), ignoreNulls = true).over(wInB))
      .filter(col("_side") === 1)
    // 2. cross-bucket carry: latest right row per (key, bucket) — one row
    // per key-bucket, so this side is orders of magnitude smaller
    val perBucket = rightOk
      .withColumn("_b", bucket(col(rightTs)))
      .groupBy(col(key).as("_k"), col("_b"))
      .agg(max_by(struct(rightCols.map(col): _*), col(rightTs)).as("_last"))
    val wCum = Window.partitionBy("_k").orderBy("_b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carry = perBucket
      .select(col("_k"), col("_b"), last(col("_last")).over(wCum).as("_carry"))
    // a left row in bucket b needs the carry through the end of bucket
    // b-1: shift the carry forward one bucket…
    val prevCarry = carry.withColumn("_b", col("_b") + 1)
      .withColumnRenamed("_carry", "_prev0")
    // …then close the gaps (buckets with no right rows) by carrying the
    // shifted value forward over the union of left-bucket keys
    val leftBuckets = inBucket.select(col("_k"), col("_b")).distinct()
    val wGap = Window.partitionBy("_k").orderBy("_b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapClosed = leftBuckets.unionByName(
        prevCarry.select(col("_k"), col("_b")), allowMissingColumns = false)
      .distinct()
      .join(prevCarry, Seq("_k", "_b"), "left_outer")
      .select(col("_k"), col("_b"),
        last(col("_prev0"), ignoreNulls = true).over(wGap).as("_prev"))
    val joined = inBucket.join(gapClosed, Seq("_k", "_b"), "left_outer")
    // coalesce the two STRUCTS (not per-column) — the fallback to the
    // previous bucket's carry must also be row-atomic
    joined.select(leftCols.map(col) ++
      rightCols.map(c => coalesce(col("_in"), col("_prev"))
        .getField(c).as(s"r_$c")): _*)
  }

  /** Tolerance variant: matches further back than `toleranceExpr`
    * (e.g. `expr("INTERVAL 1 HOUR")`) are nulled out — DuckDB/pandas
    * `tolerance` semantics, same single-shuffle plan. */
  def asOfWithin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightCols: Seq[String],
      tolerance: Column): DataFrame = {
    val withTs = asOf(left, right.withColumn("_rts", col(rightTs)), key,
      leftTs, rightTs, rightCols :+ "_rts")
    rightCols.foldLeft(withTs) { (df, c) =>
      df.withColumn(s"r_$c",
        when(col("r__rts") >= col(leftTs).cast("timestamp") - tolerance ||
             col("r__rts").isNull, col(s"r_$c"))
          .otherwise(lit(null).cast(right.schema(c).dataType)))
    }.drop("r__rts")
  }
}
