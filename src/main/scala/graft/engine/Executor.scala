package graft.engine

import org.apache.spark.sql.DataFrame

/** Pluggable compute seam (SURVEY A1/A17/A20/A21).
  *
  * The reference registers computes in a `COMPUTES` map (`@register`,
  * `universql/plugin.py:127-151`) with DuckDB primary, Snowflake
  * passthrough (`universql/warehouse/snowflake.py:210-270`), a BigQuery
  * alternative (`universql/warehouse/bigquery.py:17-94`) and an empty
  * Redshift stub. This engine keeps the same seam: Spark is the primary
  * executor; remote executors are stubs in this zero-egress environment
  * but hold the interface the router dispatches on.
  */
trait Executor {
  def name: String
  def execute(statement: String, session: GraftSession): DataFrame
}

object SparkExecutor extends Executor {
  val name = "spark"
  def execute(statement: String, session: GraftSession): DataFrame =
    session.runQuery(statement)
}

/** Catalog-passthrough stub: in the reference, `SHOW` and non-TABLE/VIEW
  * `CREATE` route to the cloud account (`universql/protocol/session.py:
  * 82-85`). Offline, SHOW is served from the registry; anything else
  * remote-only fails loudly here. */
final class RemoteExecutor(endpoint: String) extends Executor {
  val name = s"remote:$endpoint"
  def execute(statement: String, session: GraftSession): DataFrame =
    throw new UnsupportedOperationException(
      s"remote executor $endpoint unavailable (zero-egress environment); " +
      "seam kept for catalog write-back, SURVEY A10/A17")
}

/** Statement router (A1): pick the executor for a statement. Offline
  * engine: everything runs on Spark; the structure mirrors the
  * reference's local-vs-catalog decision. */
object Router {
  def route(statement: String): Executor = SparkExecutor
}
