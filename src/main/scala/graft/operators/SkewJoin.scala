package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salting for skewed equi-joins.
  *
  * When the build/probe key is low-cardinality or heavy-hitter skewed, a
  * plain shuffle join lands whole hot keys on single tasks. Salting splits
  * each hot key into `parts` sub-keys: the skewed side gets a row-derived
  * salt in [0, parts); the other side is replicated across all salts; the
  * join key becomes (key, salt). The result set is identical to the plain
  * join — only the physical distribution changes — so the DuckDB oracle is
  * simply the unsalted join.
  *
  * AQE's skew-join handling covers sort-merge joins automatically; explicit
  * salting remains the tool when aggregation-after-join or broadcast
  * thresholds defeat AQE, and is the pattern this operator demonstrates.
  */
object SkewJoin {

  /** Inner equi-join with a salted left (skewed) side.
    *
    * The salt is hash-derived from the whole left row — deterministic
    * within a run, and irrelevant to the result (any salt assignment
    * yields the same joined rows, since the right side carries every
    * salt). */
  def saltedInnerJoin(skewed: DataFrame, other: DataFrame,
      joinKey: String, parts: Int = 8): DataFrame = {
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(struct(skewed.columns.map(col).toIndexedSeq: _*)), lit(parts))
        .cast("int"))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0), lit(parts - 1))))
    salted.join(replicated, Seq(joinKey, "__salt"), "inner")
      .drop("__salt")
  }
}
