package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named query with an optional DuckDB oracle.
  *
  * Conventions that make the driver's hash-compare deterministic across
  * Spark and DuckDB:
  *   - every result is fully ordered with a unique tie-breaker;
  *   - floating aggregates are computed as exact DECIMAL sums and only then
  *     cast to DOUBLE (bit-identical on both engines, immune to
  *     summation-order divergence);
  *   - every computed column is aliased identically on both sides.
  */
final case class GQuery(
    name: String,
    oracle: Option[String])(
    val run: (SparkSession, String) => DataFrame)

trait QueryPack {
  def all: Seq[GQuery]
  final def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap
  final def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
