package graft.sources

import graft.engine.{FQN, GraftSession, TableKind, TableRef}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Builds a minimal spec-layout Iceberg table (metadata.json → manifest
  * list → manifest → parquet data files) and reads it back through
  * [[IcebergLite]] and through the session's registry seam. */
class IcebergLiteSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val avroFmt = "org.apache.spark.sql.avro.AvroFileFormat"

  /** Write a tiny Iceberg table of the `nation` rows; returns the
    * metadata.json path. */
  private def buildTable(): String = {
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("graft_iceberg").toString
    val nation = graft.Tables.load(spark, "/root/testdata/sf0.001", "nation")

    // two data files
    val d1 = s"$root/data/f1"
    val d2 = s"$root/data/f2"
    nation.filter(col("n_nationkey") < 10).coalesce(1)
      .write.mode("overwrite").parquet(d1)
    nation.filter(col("n_nationkey") >= 10).coalesce(1)
      .write.mode("overwrite").parquet(d2)

    // one manifest with two ADDED entries (+ one DELETED that must be
    // filtered out)
    val manifestDir = s"$root/meta/manifest1"
    import spark.implicits._
    Seq((1, d1), (1, d2), (2, s"$root/data/gone"))
      .toDF("status", "file_path")
      .select(col("status"), struct(col("file_path")).as("data_file"))
      .coalesce(1).write.mode("overwrite").format(avroFmt).save(manifestDir)

    // manifest list
    val listDir = s"$root/meta/manifest-list-1"
    Seq(manifestDir).toDF("manifest_path")
      .coalesce(1).write.mode("overwrite").format(avroFmt).save(listDir)

    // metadata.json (v2-shaped, minimal)
    val metadataPath = s"$root/meta/v2.metadata.json"
    val json =
      s"""{"format-version": 2, "table-uuid": "00000000-0000-0000-0000-000000000001",
         | "location": "$root", "current-snapshot-id": 77,
         | "snapshots": [
         |   {"snapshot-id": 42, "manifest-list": "$root/meta/old-list"},
         |   {"snapshot-id": 77, "manifest-list": "$listDir"}]}""".stripMargin
    Files.write(java.nio.file.Paths.get(metadataPath), json.getBytes)
    metadataPath
  }

  test("scan by metadata path: current snapshot, deleted entries skipped") {
    val metadataPath = buildTable()
    val df = IcebergLite.scan(spark, metadataPath)
    assert(df.count() == 25)
    assert(df.columns.toSet == Set("n_nationkey", "n_name", "n_regionkey"))
  }

  test("CREATE ICEBERG TABLE AS / INSERT append / UPDATE / DROP lifecycle") {
    val s = new GraftSession(spark)
    s.attachLake("/root/testdata/sf0.001")
    s.sql("""CREATE OR REPLACE ICEBERG TABLE nat_ice AS
             SELECT n_nationkey AS k, n_name AS nm FROM nation WHERE n_nationkey < 20""")
    assert(s.sql("SELECT count(*) AS n FROM nat_ice").collect()(0).getLong(0) == 20)
    // metadata path registered, spec layout on disk
    val ref = s.registry.resolve(
      graft.engine.Identifiers.fullQualifier("nat_ice", "GRAFT", "PUBLIC")).get
    assert(ref.format == "iceberg")
    assert(ref.path.get.endsWith("v1.metadata.json"))

    // append = snapshot 2
    s.sql("INSERT INTO nat_ice SELECT n_nationkey, n_name FROM nation WHERE n_nationkey >= 20")
    assert(s.sql("SELECT count(*) AS n FROM nat_ice").collect()(0).getLong(0) == 25)
    val ref2 = s.registry.resolve(ref.fqn).get
    assert(ref2.path.get.endsWith("v2.metadata.json"))
    // snapshot 1 still readable by its own metadata file (time travel)
    assert(IcebergLite.scan(spark,
      ref2.path.get.replace("v2.metadata.json", "v1.metadata.json")).count() == 20)

    // DML copy-on-write lands on an iceberg snapshot too
    s.sql("UPDATE nat_ice SET nm = lower(nm) WHERE k < 5")
    assert(s.sql("SELECT count(*) AS n FROM nat_ice WHERE nm = lower(nm)")
      .collect()(0).getLong(0) >= 5)
    assert(s.sql("SELECT count(*) AS n FROM nat_ice").collect()(0).getLong(0) == 25)
    s.sql("DROP TABLE nat_ice")
  }

  test("registry seam: iceberg-format table queryable through the session") {
    val metadataPath = buildTable()
    val s = new GraftSession(spark)
    s.attachLake("/root/testdata/sf0.001")
    s.registry.register(TableRef(
      FQN("GRAFT", "PUBLIC", "NATION_ICE"), TableKind.Lake,
      Some(metadataPath), format = "iceberg"))
    val n = s.sql(
      """SELECT count(*) AS n FROM nation_ice n1
        | JOIN region ON n1.n_regionkey = region.r_regionkey""".stripMargin)
      .collect()(0).getLong(0)
    assert(n == 25)
  }
}
