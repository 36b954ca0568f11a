package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  *     scale is range-bucketing time into the key (`bucketTs`), which
  *     bounds any task to one key×time-slice — carry-in rows are the
  *     per-bucket latest right row, broadcast-joined back. The plain
  *     variant is the default because real key spaces (user, symbol)
  *     are wide.
  */
object AsOfJoin {

  /** Left rows keep their columns; each `rightCols` c arrives as `r_c`
    * (null when no right row is at-or-before the left row). */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val taggedL = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
      .select(Seq(col(key).as("_k"), col("_ts"), col("_side")) ++
        leftCols.map(col) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"_r_$c")): _*)
    val taggedR = right
      .withColumn("_ts", col(rightTs))
      .withColumn("_side", lit(0))
      .select(Seq(col(key).as("_k"), col("_ts"), col("_side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.map(c => col(c).as(s"_r_$c")): _*)
    val w = Window.partitionBy("_k").orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = taggedL.unionByName(taggedR)
      .select(col("*") +:
        rightCols.map(c =>
          last(col(s"_r_$c"), ignoreNulls = true).over(w).as(s"r_$c")): _*)
    carried.filter(col("_side") === 1)
      .select(leftCols.map(col) ++ rightCols.map(c => col(s"r_$c")): _*)
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
