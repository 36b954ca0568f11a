package graft.engine

/** Iceberg-REST (Polaris-shape) external catalog seam — the analog of the
  * reference's `PolarisCatalog` (`universql/catalog/iceberg.py:41-52`),
  * which resolves table names through an Iceberg REST catalog and scans
  * the returned metadata location.
  *
  * Everything except the network hop is real: route construction follows
  * the Iceberg REST spec (`GET {uri}/v1/{prefix}namespaces/{ns}/tables/{t}`
  * with the 0x1F namespace separator), the `LoadTableResult` response is
  * parsed for `metadata-location`, and the resolved table scans through
  * [[graft.sources.IcebergLite]]. The transport is injected: the default
  * fails loudly (zero-egress environment, like the reference's Redshift
  * stub), tests and a future online round plug in a real HTTP GET.
  */
final class RestCatalog(
    val uri: String,
    val warehouse: String,
    fetch: String => String = RestCatalog.noEgress) {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")

  /** Iceberg REST route for a table lookup; `db.schema` maps to a 2-level
    * namespace joined with the spec's %1F unit separator. */
  def tableRoute(f: FQN): String =
    s"${uri.stripSuffix("/")}/v1/${enc(warehouse)}/namespaces/" +
      s"${enc(f.database)}%1F${enc(f.schema)}/tables/${enc(f.table)}"

  /** Resolve a table to its Iceberg metadata location via the REST
    * catalog's `LoadTableResult` payload. */
  def metadataLocation(f: FQN): Option[String] = {
    val body =
      try fetch(tableRoute(f))
      catch { case _: java.io.FileNotFoundException => return None }
    val root = mapper.readTree(body)
    val loc = root.path("metadata-location")
    if (loc.isTextual && loc.asText().nonEmpty) Some(loc.asText())
    else {
      // spec also allows metadata.location inside the metadata object
      val inner = root.path("metadata").path("location")
      if (inner.isTextual && inner.asText().nonEmpty) Some(inner.asText())
      else None
    }
  }

  /** Table reference for the session registry: an Iceberg lake table
    * addressed by its metadata file, scanned by IcebergLite. */
  def resolve(f: FQN): Option[TableRef] =
    metadataLocation(f).map(loc =>
      TableRef(f, TableKind.Lake, Some(loc), format = "iceberg"))

  /** DDL write-back, reference `register_locations`: Polaris rejects
    * direct execution (`universql/catalog/iceberg.py:20-21`); same here. */
  def registerLocations(locations: Map[FQN, String]): Unit =
    if (locations.nonEmpty)
      throw new UnsupportedOperationException(
        "REST catalog does not support direct DDL execution")
}

object RestCatalog {
  /** Default transport for the zero-egress environment: loud failure,
    * keeping the seam honest (mirrors the reference's offline stubs). */
  def noEgress(url: String): String =
    throw new UnsupportedOperationException(
      s"REST catalog fetch unavailable (zero-egress environment): $url")
}
