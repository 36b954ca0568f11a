package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.concurrent.TrieMap

/** Table kinds, mirroring the reference's LOCAL/ICEBERG distinction
  * (`universql/warehouse/duckdb.py:81-114` `_get_table_location`). */
sealed trait TableKind
object TableKind {
  /** Session-temp table (CREATE TEMP TABLE / temp view). */
  case object Local extends TableKind
  /** Durable lake table (path-addressed parquet; Iceberg surrogate —
    * no Iceberg runtime jar ships in this environment, so the managed
    * format is parquet + this registry, per SURVEY §7.3). */
  case object Lake extends TableKind
}

final case class TableRef(
    fqn: FQN,
    kind: TableKind,
    path: Option[String],   // for Lake tables
    format: String = "parquet")

/** Name → storage resolution, replacing the reference's
  * Snowflake-metadata catalog (`universql/warehouse/snowflake.py:97-111`)
  * with a local registry over the testdata lake + session-created tables.
  * Lookup is Snowflake-case-insensitive via [[Identifiers]] normalization.
  */
final class TableRegistry(spark: SparkSession,
    viewNamer: FQN => String = _.flat,
    /** Backing name→ref state. Pass ONE map to several sessions'
      * registries to share a catalog (server-style shared metastore):
      * each session keeps its own registry object — loads bind
      * DataFrames to that session's cloned SparkSession — while
      * registrations and COW re-points are visible to all. */
    state: TrieMap[FQN, TableRef] = TrieMap.empty) {

  private val tables = state

  def register(ref: TableRef): Unit = tables.put(ref.fqn, ref)

  def drop(fqn: FQN): Boolean = {
    spark.catalog.dropTempView(viewNamer(fqn))
    tables.remove(fqn).isDefined
  }

  def resolve(fqn: FQN): Option[TableRef] = tables.get(fqn)

  def list(database: Option[String] = None, schema: Option[String] = None): Seq[TableRef] =
    tables.values.toSeq
      .filter(r => database.forall(_ == r.fqn.database))
      .filter(r => schema.forall(_ == r.fqn.schema))
      .sortBy(r => (r.fqn.database, r.fqn.schema, r.fqn.table))

  def schemas(database: String): Seq[String] =
    tables.keys.toSeq.filter(_.database == database).map(_.schema).distinct.sorted

  /** Register a whole directory of parquet tables as lake tables under
    * db.schema (the `_sync_catalog` analog,
    * `universql/warehouse/duckdb.py:196-234`). */
  def registerLakeDir(dir: String, database: String, schema: String,
      names: Seq[String]): Unit =
    names.foreach { n =>
      register(TableRef(
        FQN(database.toUpperCase, schema.toUpperCase, n.toUpperCase),
        TableKind.Lake, Some(s"$dir/$n.parquet")))
    }

  /** Load the DataFrame for a resolved table. */
  def load(ref: TableRef): DataFrame = ref.kind match {
    case TableKind.Local => spark.table(viewNamer(ref.fqn))
    case TableKind.Lake  =>
      val df =
        if (ref.format == "iceberg")
          graft.sources.IcebergLite.scan(spark, ref.path.get)
        else if (ref.format == "bucketed")
          // path = Spark catalog name; reading via the catalog keeps the
          // bucket spec, so joins on the keys plan exchange-free
          spark.table(ref.path.get)
        else spark.read.format(ref.format).load(ref.path.get)
      // events' ts has shipped as both INT64-nanos and timestamp[us]
      // across testdata rounds; normalize like Tables.load
      if (ref.fqn.table == "EVENTS") graft.Tables.normalizeEventsTs(df)
      else df
  }
}
