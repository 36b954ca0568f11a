package graft.engine

/** Snowflake COPY INTO option → Spark DataFrameReader option mapping.
  *
  * Ports the shape of the reference's ~35-entry option map
  * (`universql/plugins/snow.py:89-258`: per-option handler with per-format
  * allow lists; defaults at `:260-300`; per-format disallow lists at
  * `:304-344`). DuckDB reader params there become Spark reader options
  * here; datetime tokens run through
  * [[SnowflakeRewriter.translateDatetimeFormat]].
  */
object CopyOptions {

  final case class Mapped(format: String, options: Map[String, String])

  private val supportedFormats = Set("CSV", "JSON", "PARQUET", "AVRO")

  /** @param raw upper-cased Snowflake option name → raw value text
    *            (quotes already stripped from string values). */
  def map(raw: Map[String, String]): Mapped = {
    val fmt = raw.getOrElse("TYPE", "CSV").toUpperCase
    require(supportedFormats.contains(fmt), s"unsupported file format: $fmt")
    val opts = scala.collection.mutable.Map.empty[String, String]
    raw.foreach { case (k, v) =>
      (k, fmt) match {
        case ("TYPE", _) => // handled above
        case ("SKIP_HEADER", "CSV") =>
          // Spark reads the first line as header; Snowflake's SKIP_HEADER=n
          // skips n lines. n=1 maps exactly; larger n is rejected loudly
          // rather than silently mis-read.
          val n = v.trim.toInt
          require(n <= 1, s"SKIP_HEADER=$n not supported (only 0 or 1)")
          if (n == 1) opts += "header" -> "true"
        case ("PARSE_HEADER", "CSV") =>
          if (v.equalsIgnoreCase("true")) opts += "header" -> "true"
        case ("FIELD_DELIMITER", "CSV")   => opts += "sep" -> v
        case ("RECORD_DELIMITER", "CSV")  => opts += "lineSep" -> v
        case ("FIELD_OPTIONALLY_ENCLOSED_BY", "CSV") => opts += "quote" -> v
        case ("ESCAPE", "CSV")            => opts += "escape" -> v
        case ("ESCAPE_UNENCLOSED_FIELD", "CSV") => // no Spark analog; ignore
        case ("NULL_IF", _) =>
          // Snowflake takes a list; Spark csv takes one nullValue.
          opts += "nullValue" -> v.split(",").head.trim
            .stripPrefix("(").stripSuffix(")").trim.stripPrefix("'").stripSuffix("'")
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
    Mapped(fmtName, opts.toMap)
  }
}
