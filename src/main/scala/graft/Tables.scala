package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

/** Loaders for the driver-generated testdata lake (TESTDATA.md).
  *
  * All tables are plain parquet, one file per table. The `events` table
  * carries an INT64 TIMESTAMP(NANOS) column Spark refuses by default;
  * sessions must set `spark.sql.legacy.parquet.nanosAsLong=true` (see
  * [[GraftSession]]), after which we rebuild a microsecond-precision
  * TIMESTAMP_NTZ column here so query code sees a proper timestamp. The
  * truncation (floor-div by 1000) matches DuckDB's TIMESTAMP_NS → TIMESTAMP
  * cast, which the oracle relies on.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts",
        timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
    else df
  }

  /** Register every testdata table as a temp view for SQL-path queries. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
