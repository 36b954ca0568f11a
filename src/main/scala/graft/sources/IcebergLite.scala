package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Metadata-file-addressed Iceberg table scan (SURVEY §2.A A6 / §2.B
  * scans row 1) — the reference's primary table access path
  * (`iceberg_scan('…metadata.json')`, `universql/warehouse/duckdb.py:448-451`,
  * views created at `:223-225`).
  *
  * No Iceberg runtime jar ships in this environment, so this is a
  * spec-compliant reader for the read path we need, built on the public
  * Iceberg table-spec layout (https://iceberg.apache.org/spec/):
  *
  *   metadata.json (current-snapshot-id → snapshots[].manifest-list)
  *     → manifest list            (Avro; `manifest_path` per manifest)
  *       → manifest files         (Avro; `status` + `data_file.file_path`)
  *         → parquet data files   (read by Spark's native parquet source)
  *
  * Driver-side work is metadata-only (a few KB of Avro/JSON, as in real
  * Iceberg clients); data files are read distributed by Spark's parquet
  * scan, so predicate pushdown/column pruning still apply. Row-level
  * deletes (v2 positional/equality) are rejected loudly rather than
  * silently mis-read.
  */
object IcebergLite {

  private val avroFmt = "org.apache.spark.sql.avro.AvroFileFormat"
  private val mapper = new ObjectMapper()

  /** Data-file entry status in manifests: 0=EXISTING 1=ADDED 2=DELETED. */
  private val StatusDeleted = 2

  def scan(spark: SparkSession, metadataPath: String): DataFrame = {
    val files = dataFiles(spark, metadataPath)
    require(files.nonEmpty, s"Iceberg table at $metadataPath has no data files")
    spark.read.parquet(files: _*)
  }

  /** Resolve current data file paths from a metadata.json. */
  def dataFiles(spark: SparkSession, metadataPath: String): Seq[String] = {
    val meta = mapper.readTree(
      Files.readAllBytes(Paths.get(stripScheme(metadataPath))))
    val snapId = meta.path("current-snapshot-id").asLong(-1)
    require(snapId >= 0, s"no current-snapshot-id in $metadataPath")
    val snapshot = meta.path("snapshots").elements().asScala
      .find(_.path("snapshot-id").asLong() == snapId)
      .getOrElse(throw new IllegalArgumentException(
        s"snapshot $snapId not found in $metadataPath"))
    val manifestList = stripScheme(snapshot.path("manifest-list").asText())

    // manifest list: one row per manifest; content 1 = delete manifest (v2)
    val manifests = spark.read.format(avroFmt).load(manifestList).collect()
    val deleteManifests = manifests.filter(r =>
      r.schema.fieldNames.contains("content") &&
        !r.isNullAt(r.fieldIndex("content")) &&
        r.getAs[Int]("content") == 1)
    require(deleteManifests.isEmpty,
      "Iceberg v2 delete manifests are not supported by this reader")
    val manifestPaths = manifests
      .map(r => stripScheme(r.getAs[String]("manifest_path"))).toSeq

    // manifests: one row per data-file entry
    val entries = spark.read.format(avroFmt).load(manifestPaths: _*)
      .select("status", "data_file.file_path").collect()
    entries.filter(_.getInt(0) != StatusDeleted)
      .map(r => stripScheme(r.getString(1))).toSeq.distinct
  }

  private def stripScheme(p: String): String =
    if (p.startsWith("file://")) p.stripPrefix("file://") else p

  // ── write path (A9/A12: CREATE ICEBERG TABLE AS / INSERT append) ───────

  /** Write `df` as a new Iceberg table under `tableDir`; returns the
    * metadata.json path. Layout follows the spec: parquet data files under
    * data/, Avro manifest + manifest list under metadata/, versioned
    * vN.metadata.json (the reference's pyiceberg `create_table` +
    * `overwrite` path, `universql/warehouse/duckdb.py:295-310`). */
  def write(spark: SparkSession, df: DataFrame, tableDir: String): String =
    commit(spark, df, tableDir, newVersion = 1, carryForward = Nil)

  /** Append `df` as a new snapshot on an existing table; returns the new
    * metadata.json path (pyiceberg `table.append` analog,
    * `universql/warehouse/duckdb.py:368`). */
  def append(spark: SparkSession, df: DataFrame, metadataPath: String): String = {
    val dir = Paths.get(stripScheme(metadataPath)).getParent.getParent.toString
    val version = "v(\\d+)\\.metadata\\.json$".r.findFirstMatchIn(metadataPath)
      .map(_.group(1).toInt).getOrElse(1)
    commit(spark, df, dir, version + 1,
      carryForward = dataFiles(spark, metadataPath))
  }

  private def commit(spark: SparkSession, df: DataFrame, tableDir: String,
      newVersion: Int, carryForward: Seq[String]): String = {
    import org.apache.spark.sql.functions._
    val snapId = newVersion.toLong
    val dataDir = s"$tableDir/data/s$snapId"
    df.write.mode("overwrite").parquet(dataDir)
    val newFiles = Files.list(Paths.get(dataDir)).iterator().asScala
      .map(_.toString).filter(p => p.endsWith(".parquet")).toSeq.sorted

    import spark.implicits._
    val manifestDir = s"$tableDir/metadata/manifest-s$snapId"
    (carryForward.map((0, _)) ++ newFiles.map((1, _)))  // 0=EXISTING 1=ADDED
      .toDF("status", "file_path")
      .select(col("status"),
        struct(col("file_path"), lit("PARQUET").as("file_format")).as("data_file"))
      .coalesce(1).write.mode("overwrite").format(avroFmt).save(manifestDir)

    val listDir = s"$tableDir/metadata/manifest-list-s$snapId"
    Seq(manifestDir).toDF("manifest_path")
      .coalesce(1).write.mode("overwrite").format(avroFmt).save(listDir)

    val metadataPath = s"$tableDir/metadata/v$newVersion.metadata.json"
    val snapshotsJson = (1L to snapId).map(sid =>
      s"""{"snapshot-id": $sid, "manifest-list": "$tableDir/metadata/manifest-list-s$sid"}""")
      .mkString("[", ", ", "]")
    val json =
      s"""{"format-version": 2,
         | "table-uuid": "00000000-0000-0000-0000-${"%012d".format(snapId)}",
         | "location": "$tableDir",
         | "current-snapshot-id": $snapId,
         | "snapshots": $snapshotsJson}""".stripMargin
    Files.createDirectories(Paths.get(metadataPath).getParent)
    Files.write(Paths.get(metadataPath), json.getBytes)
    metadataPath
  }
}
