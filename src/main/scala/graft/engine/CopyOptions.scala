package graft.engine

/** Snowflake COPY INTO option → Spark DataFrameReader option mapping.
  *
  * Ports the shape of the reference's ~35-entry option map
  * (`universql/plugins/snow.py:89-258`: per-option handler with per-format
  * allow lists; defaults at `:260-300`; per-format disallow lists at
  * `:304-344`). DuckDB reader params there become Spark reader options
  * here; datetime tokens run through
  * [[SnowflakeRewriter.translateDatetimeFormat]]. Options with no Spark
  * reader analog surface as structured fields on [[Mapped]] and are
  * applied by the COPY executor (skip-lines, multi-value NULL_IF,
  * BINARY_FORMAT decode, SIZE_LIMIT file budget, PURGE, FORCE).
  */
object CopyOptions {

  final case class Mapped(
      format: String,
      options: Map[String, String],
      /** SKIP_HEADER > 1: drop this many leading lines per file (the
        * reader implements it; Spark csv has no skip-n option). */
      skipLines: Int = 0,
      /** All NULL_IF values; the first is also set as Spark's nullValue,
        * the rest are applied post-read. */
      nullIf: Seq[String] = Nil,
      /** HEX | BASE64 | UTF8 — how string fields decode into BINARY
        * target columns. */
      binaryFormat: Option[String] = None,
      /** Stop loading new files once cumulative input bytes reach this. */
      sizeLimit: Option[Long] = None,
      /** Delete successfully loaded files afterwards. */
      purge: Boolean = false,
      /** Re-load files already recorded in the table's load history. */
      force: Boolean = false)

  private val supportedFormats = Set("CSV", "JSON", "PARQUET", "AVRO")

  /** `('a', 'b')` or `'a'` or bare token → list of unquoted values.
    * Each element is a Snowflake string literal, so backslash escapes
    * process here too (`NULL_IF = ('\\N')` is the 2-char marker `\N`). */
  private def parseList(v: String): Seq[String] =
    v.trim.stripPrefix("(").stripSuffix(")")
      .split(",").toSeq.map(e => GraftSession.unescapeSqlString(
        e.trim.stripPrefix("'").stripSuffix("'").replace("''", "'")))
      .filter(_.nonEmpty)

  /** @param raw upper-cased Snowflake option name → raw value text
    *            (quotes already stripped from string values). */
  def map(raw: Map[String, String]): Mapped = {
    val fmt = raw.getOrElse("TYPE", "CSV").toUpperCase
    require(supportedFormats.contains(fmt), s"unsupported file format: $fmt")
    val opts = scala.collection.mutable.Map.empty[String, String]
    var skipLines = 0
    var nullIf: Seq[String] = Nil
    var binaryFormat: Option[String] = None
    var sizeLimit: Option[Long] = None
    var purge = false
    var force = false
    raw.foreach { case (k, v) =>
      (k, fmt) match {
        case ("TYPE", _) => // handled above
        case ("SKIP_HEADER", "CSV") =>
          // Spark reads the first line as header; Snowflake's SKIP_HEADER=n
          // skips n lines — n=1 maps to header=true, larger n is a manual
          // per-file line drop in the executor.
          val n = v.trim.toInt
          if (n == 1) opts += "header" -> "true"
          else if (n > 1) skipLines = n
        case ("PARSE_HEADER", "CSV") =>
          if (v.equalsIgnoreCase("true")) opts += "header" -> "true"
        case ("FIELD_DELIMITER", "CSV")   => opts += "sep" -> v
        case ("RECORD_DELIMITER", "CSV")  => opts += "lineSep" -> v
        case ("FIELD_OPTIONALLY_ENCLOSED_BY", "CSV") =>
          opts += "quote" -> v
          // Snowflake enclosed fields may span lines; Spark's line-split
          // csv path can't represent that, so enclosure opts into the
          // whole-file parse (unsplittable — acceptable: stage files are
          // many small objects, parallelism comes from file count)
          opts += "multiLine" -> "true"
        case ("ESCAPE", "CSV")            => opts += "escape" -> v
        case ("ESCAPE_UNENCLOSED_FIELD", "CSV") => // no Spark analog; ignore
        case ("NULL_IF", _) =>
          // Snowflake takes a list; Spark csv takes one nullValue — the
          // first value maps there, the rest are post-read rewrites.
          // A parenthesized list arrives raw (elements unescape in
          // parseList); a single quoted value was already unescaped by
          // the option parser.
          nullIf =
            if (v.trim.startsWith("(")) parseList(v)
            else Seq(v).filter(_.nonEmpty)
          nullIf.headOption.foreach(h => opts += "nullValue" -> h)
        case ("COMPRESSION", _) =>
          if (!v.equalsIgnoreCase("AUTO") && !v.equalsIgnoreCase("NONE"))
            opts += "compression" -> v.toLowerCase
        case ("DATE_FORMAT", _) if !v.equalsIgnoreCase("AUTO") =>
          opts += "dateFormat" -> SnowflakeRewriter.translateDatetimeFormat(v)
        case ("TIMESTAMP_FORMAT", _) if !v.equalsIgnoreCase("AUTO") =>
          opts += "timestampFormat" -> SnowflakeRewriter.translateDatetimeFormat(v)
        case ("TIME_FORMAT", _) => // TIME unsupported with the Python client
                                   // in the reference too (utils.py:61)
        case ("TRIM_SPACE", "CSV") =>
          opts += "ignoreLeadingWhiteSpace" -> v.toLowerCase
          opts += "ignoreTrailingWhiteSpace" -> v.toLowerCase
        case ("EMPTY_FIELD_AS_NULL", "CSV") =>
          if (v.equalsIgnoreCase("true")) opts += "nullValue" -> ""
        case ("ENCODING", "CSV") => opts += "encoding" -> v
        case ("ERROR_ON_COLUMN_COUNT_MISMATCH", "CSV") =>
          opts += "mode" -> (if (v.equalsIgnoreCase("true")) "FAILFAST" else "PERMISSIVE")
        case ("ON_ERROR", _) =>
          opts += "mode" -> (if (v.equalsIgnoreCase("CONTINUE")) "PERMISSIVE" else "FAILFAST")
        case ("STRIP_OUTER_ARRAY", "JSON") => opts += "multiLine" -> v.toLowerCase
        case ("ALLOW_DUPLICATE", "JSON") => // DuckDB-side no-op in reference
        case ("BINARY_FORMAT", _) =>
          val bf = v.toUpperCase.replace("-", "")
          require(Set("HEX", "BASE64", "UTF8").contains(bf),
            s"BINARY_FORMAT=$v not one of HEX|BASE64|UTF8")
          binaryFormat = Some(bf)
        case ("SKIP_BLANK_LINES", "CSV") =>
          // Spark's csv parser (univocity) always skips blank lines —
          // TRUE is the default behavior; FALSE cannot be honored.
          require(v.equalsIgnoreCase("true"),
            "SKIP_BLANK_LINES=FALSE not supported (parser always skips)")
        case ("REPLACE_INVALID_CHARACTERS", _) =>
          // Spark's UTF-8 text decode already substitutes U+FFFD for
          // invalid byte sequences, which is exactly TRUE's behavior;
          // FALSE (error out) cannot be honored.
          require(v.equalsIgnoreCase("true"),
            "REPLACE_INVALID_CHARACTERS=FALSE not supported " +
              "(decoder always replaces)")
        case ("ENABLE_OCTAL", "CSV") =>
          require(v.equalsIgnoreCase("false"),
            "ENABLE_OCTAL=TRUE not supported")
        case ("SIZE_LIMIT", _) => sizeLimit = Some(v.trim.toLong)
        case ("PURGE", _) => purge = v.equalsIgnoreCase("true")
        case ("FORCE", _) => force = v.equalsIgnoreCase("true")
        case ("FILE_EXTENSION", _) => // unload-only option; no-op on load
        case ("MATCH_BY_COLUMN_NAME", _) => // self-describing formats
          // already align by name in the executor; CSV stays positional
        case (_, _) => // unknown/inapplicable options ignored, like the
                       // reference's DISALLOWED_PARAMS_BY_FORMAT filter
      }
    }
    if (fmt == "CSV" && !opts.contains("header")) opts += "header" -> "false"
    // Avro's FileFormat class ships inside spark-sql in this distribution
    // but is not service-registered under the "avro" short name, so the
    // data source must be addressed by class
    val fmtName =
      if (fmt == "AVRO") "org.apache.spark.sql.avro.AvroFileFormat"
      else fmt.toLowerCase
    Mapped(fmtName, opts.toMap, skipLines, nullIf, binaryFormat,
      sizeLimit, purge, force)
  }
}
