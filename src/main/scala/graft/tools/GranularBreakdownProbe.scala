package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: stage-level breakdown of one file-granular Iceberg DELETE —
  * where does the non-rewrite time go? Prints per-stage seconds for
  * detection, subset scan, survivor write + replace commit, and the
  * session-statement wrapper, on a freshly built repl-replica table.
  *
  * Usage: runMain graft.tools.GranularBreakdownProbe [sfDir] [repl]
  */
object GranularBreakdownProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val repl = if (args.length > 1) args(1).toInt else 40
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = new graft.engine.GraftSession(spark)
    s.attachLake(sfDir)
    val offset = 100000000L
    s.sql("""CREATE OR REPLACE ICEBERG TABLE gbd AS
      SELECT l_orderkey AS k, l_partkey AS pk, l_quantity AS q,
             l_extendedprice AS p FROM lineitem""")
    for (i <- 1 until repl)
      s.sql(s"""INSERT INTO gbd SELECT l_orderkey + ${i * offset},
        l_partkey, l_quantity, l_extendedprice FROM lineitem""")
    val f = graft.engine.Identifiers.fullQualifier("gbd", "GRAFT", "PUBLIC")
    val ref = s.registry.resolve(f).get
    val mp = ref.path.get
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val pred = s"k >= ${(repl - 1) * offset} AND k % 5 = 0"
    val detSql =
      s"SELECT DISTINCT input_file_name() AS p FROM GRAFT.PUBLIC.GBD AS gbd " +
      s"WHERE ($pred)"
    println(s.runQuery(detSql).queryExecution.executedPlan.toString
      .linesIterator.filter(l => l.contains("PushedFilters") ||
        l.contains("Scan parquet")).take(4).mkString("\n"))
    val det = t("detect (direct, pushdown)") {
      s.runQuery(detSql).collect().map(_.getString(0))
        .map(p => if (p.startsWith("file:")) new java.net.URI(p).getPath else p)
        .toSet
    }
    println(s"  affected files: ${det.size}")
    t("dataFiles (cached plan)") {
      graft.sources.IcebergLite.dataFiles(spark, mp).toSet
    }
    val subset = t("scanSubset build") {
      graft.sources.IcebergLite.scanSubset(spark, mp, det)
    }
    t("subset count job") { subset.count() }
    val survivors = t("survivors via runQueryOver") {
      val df = subset.filter(s"NOT COALESCE(($pred), FALSE)")
      df.count(); df
    }
    val newMeta = t("replaceFiles commit") {
      graft.sources.IcebergLite.replaceFiles(spark, mp, det, survivors)
    }
    t("commit bookkeeping") {
      // mimic commitIcebergReplace cost shape
      s.registry.register(ref.copy(path = Some(newMeta)))
    }
    t("full s.sql DELETE (2nd delete)") {
      s.sql(s"DELETE FROM gbd WHERE k >= ${(repl - 1) * offset} AND k % 7 = 0")
    }
    spark.stop()
  }
}
