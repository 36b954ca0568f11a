package graft.engine

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Iceberg-REST catalog seam: route construction, LoadTableResult
  * parsing, and end-to-end resolution of an externally-cataloged Iceberg
  * table through a session query — with the transport faked, since the
  * environment has no egress (the reference's PolarisCatalog shape,
  * `universql/catalog/iceberg.py:41-52`). */
class RestCatalogSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("table route follows the Iceberg REST spec") {
    val cat = new RestCatalog("https://polaris.example/api/catalog", "WH1")
    val f = FQN("DB", "SCH", "T1")
    assert(cat.tableRoute(f) ==
      "https://polaris.example/api/catalog/v1/WH1/namespaces/DB%1FSCH/tables/T1")
  }

  test("externally cataloged iceberg table resolves and queries end-to-end") {
    import spark.implicits._
    // a real spec-layout Iceberg table on disk…
    val dir = java.nio.file.Files.createTempDirectory("graft_rest_ice").toString
    val metaPath = graft.sources.IcebergLite.write(spark,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "tag"), s"$dir/sales")
    // …served by a fake REST transport as a LoadTableResult
    var hit: String = null
    val fetch: String => String = { url =>
      hit = url
      if (url.contains("/tables/SALES"))
        s"""{"metadata-location": "$metaPath", "metadata": {}}"""
      else throw new java.io.FileNotFoundException(url)
    }
    val cat = new RestCatalog("https://polaris.example/api", "GRAFT", fetch)

    val s = new GraftSession(spark)
    s.attachLake("/root/testdata/sf0.001")
    s.attachRestCatalog(cat)
    // session defaults qualify ext_ns.sales as GRAFT.EXT_NS.SALES;
    // the catalog is consulted on the registry miss during resolution
    val n = s.sql("SELECT count(*) AS n FROM ext_ns.sales")
    assert(hit != null && hit.contains("EXT_NS"))
    assert(n.collect()(0).getLong(0) == 3)
    // second reference is served from the registry cache (no re-fetch)
    hit = null
    assert(s.sql("SELECT count(*) AS n FROM ext_ns.sales")
      .collect()(0).getLong(0) == 3)
    assert(hit == null)
    // a name in neither registry nor catalog still fails as unknown table
    intercept[Exception] { s.sql("SELECT * FROM ext_ns.missing_t").collect() }
  }

  test("write-back and zero-egress default fail loudly") {
    val cat = new RestCatalog("https://x.example", "W")
    intercept[UnsupportedOperationException] {
      cat.metadataLocation(FQN("A", "B", "C"))
    }
    intercept[UnsupportedOperationException] {
      cat.registerLocations(Map(FQN("A", "B", "C") -> "CREATE ..."))
    }
  }
}
