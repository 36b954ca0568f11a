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
        else if (ref.format == "parquet")
          TableRegistry.readParquetCachedSchema(spark, ref.path.get)
        else spark.read.format(ref.format).load(ref.path.get)
      // events' ts has shipped as both INT64-nanos and timestamp[us]
      // across testdata rounds; normalize like Tables.load
      if (ref.fqn.table == "EVENTS") graft.Tables.normalizeEventsTs(df)
      else df
  }
}

object TableRegistry {
  /** path → (content signature, inferred schema). `spark.read.parquet`
    * with no declared schema runs a footer-reading Spark JOB per call
    * (measured: 1 job each, ~60-100 ms of scheduler latency) — and the
    * engine re-loads the same managed paths on every statement that
    * references them. The schema of a path is a pure function of its
    * file set, so it is cached under a driver-side listing signature
    * (name/size/mtime of every parquet file plus partition dirs): any
    * append, overwrite or re-CREATE changes the signature and
    * re-infers, with no reliance on catching every write site. The
    * listing is work `spark.read` does anyway; at warehouse scale the
    * same memo keys off the table format's commit metadata instead. */
  private val schemaCache =
    TrieMap.empty[String, (Long, org.apache.spark.sql.types.StructType)]

  private def pathSig(root: java.io.File): Long = {
    var h = 1125899906842597L // prime
    def mix(v: Long): Unit = { h = h * 31 + v }
    def mixStr(s: String): Unit = mix(s.hashCode.toLong)
    def walk(f: java.io.File): Unit =
      if (f.isDirectory) {
        val kids = f.listFiles()
        if (kids != null) kids.sortBy(_.getName).foreach { k =>
          if (k.isDirectory) { mixStr(k.getName); walk(k) }
          else if (!k.getName.startsWith("_") && !k.getName.startsWith(".")) {
            mixStr(k.getName); mix(k.length()); mix(k.lastModified())
          }
        }
      } else { mixStr(f.getName); mix(f.length()); mix(f.lastModified()) }
    walk(root)
    h
  }

  /** Record `schema` for a path the ENGINE just wrote, so the
    * write→read-back pattern (DT state merges, COW swaps, CTAS) never
    * pays an inference job: the writer knows the schema it wrote.
    * Parquet round-trips the logical types exactly (nullability is
    * normalized by Spark's file-relation layer on both the inferred and
    * the supplied side), and the signature still guards against any
    * out-of-band change to the files. */
  private[engine] def primeSchema(path: String,
      schema: org.apache.spark.sql.types.StructType): Unit = {
    val f = new java.io.File(
      if (path.startsWith("file:")) new java.net.URI(path).getPath else path)
    // nullable-widened: declaring a column non-nullable over files that
    // hold nulls breaks codegen null checks; the widened form is always
    // safe (same types, same results — nullability only narrows
    // optimization). StructType.asNullable is private[sql]; recurse.
    if (f.exists()) schemaCache.put(path, (pathSig(f), widenNullable(schema)))
    ()
  }

  private def widenNullable(s: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    def w(dt: DataType): DataType = dt match {
      case st: StructType => widenNullable(st)
      case ArrayType(et, _) => ArrayType(w(et), containsNull = true)
      case MapType(k, v, _) => MapType(w(k), w(v), valueContainsNull = true)
      case other => other
    }
    StructType(s.fields.map(f => f.copy(dataType = w(f.dataType),
      nullable = true)))
  }

  private[engine] def readParquetCachedSchema(spark: SparkSession,
      path: String): DataFrame = {
    val f = new java.io.File(
      if (path.startsWith("file:")) new java.net.URI(path).getPath else path)
    if (!f.exists()) return spark.read.parquet(path)
    val sig = pathSig(f)
    schemaCache.get(path) match {
      case Some((s, schema)) if s == sig =>
        spark.read.schema(schema).parquet(path)
      case _ =>
        val df = spark.read.parquet(path)
        schemaCache.put(path, (sig, df.schema))
        df
    }
  }
}
