package graft.engine

/** Snowflake identifier semantics (SURVEY §1.2 "Schema system").
  *
  * Unquoted identifiers fold to UPPER CASE and compare
  * case-insensitively; double-quoted identifiers preserve case exactly
  * (reference: `universql/warehouse/duckdb.py:82-88`, exercised by
  * `tests/integration/object_identifiers.py:9-47`). Unqualified names are
  * completed with the session database/schema (`universql/util.py:454-460`
  * `full_qualifier`).
  */
object Identifiers {

  /** Fold one part: `"Quoted"` keeps case (quotes stripped, doubled quotes
    * unescaped), anything else upper-cases. Backtick-quoted parts (the
    * rewriter's own Spark-side rendering of quoted identifiers) fold
    * like double-quoted ones. */
  def normalizePart(part: String): String = {
    val p = part.trim
    if (p.length >= 2 && p.startsWith("\"") && p.endsWith("\""))
      p.substring(1, p.length - 1).replace("\"\"", "\"")
    else if (p.length >= 2 && p.startsWith("`") && p.endsWith("`"))
      p.substring(1, p.length - 1).replace("``", "`")
    else p.toUpperCase
  }

  /** Split a possibly-qualified name on dots that are outside quotes. */
  def splitQualified(name: String): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inQ = false
    var i = 0
    while (i < name.length) {
      val c = name.charAt(i)
      if (c == '"') { inQ = !inQ; sb.append(c) }
      else if (c == '.' && !inQ) { parts += sb.toString(); sb.clear() }
      else sb.append(c)
      i += 1
    }
    parts += sb.toString()
    parts.toSeq
  }

  /** Fully qualify with session defaults, Snowflake-style. */
  def fullQualifier(name: String, database: String, schema: String): FQN = {
    val parts = splitQualified(name).map(normalizePart)
    parts match {
      case Seq(t)       => FQN(database.toUpperCase, schema.toUpperCase, t)
      case Seq(s, t)    => FQN(database.toUpperCase, s, t)
      case Seq(d, s, t) => FQN(d, s, t)
      case other => throw new IllegalArgumentException(
        s"bad identifier: $name (${other.size} parts)")
    }
  }
}

/** A fully-qualified, case-normalized table name. */
final case class FQN(database: String, schema: String, table: String) {
  override def toString = s"$database.$schema.$table"
  /** Spark temp-view names cannot contain dots; flatten like the
    * reference's BigQuery executor (`universql/warehouse/bigquery.py:17-94`
    * `db___schema___table`). */
  def flat: String = s"${database}___${schema}___${table}".replaceAll("[^A-Za-z0-9_]", "_")
}
