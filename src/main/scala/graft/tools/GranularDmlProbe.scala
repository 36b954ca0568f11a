package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: A/B file-granular vs whole-table Iceberg COW DML at bench
  * scale — the evidence behind probes/granular_dml.json.
  *
  * Builds an Iceberg table of `repl` lineitem replicas (one snapshot
  * each, so the file layout matches streaming/batch ingest), then times
  * the same DELETE — touching only the LAST replica's key range — under
  * both modes, interleaved (granular, full, granular, …) so a load
  * transient cannot sit on one side. The table is rebuilt before every
  * timed statement (a DELETE mutates it). Reports per-mode seconds and
  * the data-file counts each commit rewrote vs carried forward.
  *
  * Usage: runMain graft.tools.GranularDmlProbe [sfDir] [repl] [reps]
  */
object GranularDmlProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val repl = if (args.length > 1) args(1).toInt else 10
    val reps = if (args.length > 2) args(2).toInt else 3
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
    def build(): Unit = {
      s.sql("""CREATE OR REPLACE ICEBERG TABLE gprobe AS
        SELECT l_orderkey AS k, l_partkey AS pk, l_quantity AS q,
               l_extendedprice AS p
        FROM lineitem""")
      for (i <- 1 until repl)
        s.sql(s"""INSERT INTO gprobe
          SELECT l_orderkey + ${i * offset}, l_partkey, l_quantity,
                 l_extendedprice
          FROM lineitem""")
    }
    def files(): Set[String] = {
      val ref = s.registry.resolve(
        graft.engine.Identifiers.fullQualifier("gprobe", "GRAFT", "PUBLIC")).get
      graft.sources.IcebergLite.dataFiles(spark, ref.path.get).toSet
    }
    // the DELETE hits only the last replica's key range (one snapshot's
    // files out of `repl`), ~20% of its rows
    val deleteSql =
      s"DELETE FROM gprobe WHERE k >= ${(repl - 1) * offset} AND k % 5 = 0"

    val rows = scala.collection.mutable.Buffer
      .empty[(String, Double, Long, Int, Int)]
    build() // warm up write paths + JVM before the first timed statement
    s.sql(deleteSql)
    for (_ <- 1 to reps; mode <- Seq("granular", "full")) {
      build()
      val before = files()
      sys.props("graft.dml.granular") = (mode == "granular").toString
      val t0 = System.nanoTime()
      val deleted = s.sql(deleteSql).collect()(0).getLong(0)
      val secs = (System.nanoTime() - t0) / 1e9
      val after = files()
      rows += ((mode, secs, deleted,
        (before -- after).size, (before & after).size))
    }
    sys.props("graft.dml.granular") = "true"
    val liRows = s.sql("SELECT count(*) AS n FROM lineitem")
      .collect()(0).getLong(0) * repl
    def agg(mode: String) = {
      val rs = rows.filter(_._1 == mode)
      (rs.map(_._2).min, rs.map(_._2), rs.head._4, rs.head._5, rs.head._3)
    }
    val (gMin, gAll, gRepl, gKeep, gDel) = agg("granular")
    val (fMin, fAll, fRepl, fKeep, _) = agg("full")
    val out =
      s"""{"probe":"granular_dml","rows":$liRows,"repl":$repl,""" +
      s""""deleted_rows":$gDel,""" +
      s""""granular":{"min_s":${f"$gMin%.3f"},"all":[${gAll.map(t => f"$t%.3f").mkString(",")}],""" +
      s""""files_rewritten":$gRepl,"files_carried":$gKeep},""" +
      s""""full":{"min_s":${f"$fMin%.3f"},"all":[${fAll.map(t => f"$t%.3f").mkString(",")}],""" +
      s""""files_rewritten":$fRepl,"files_carried":$fKeep},""" +
      s""""speedup":${f"${fMin / gMin}%.2f"},""" +
      s""""loadavg":${java.nio.file.Files.readString(
          java.nio.file.Paths.get("/proc/loadavg")).split("\\s+")(0)}}"""
    println(out)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("probes/granular_dml.json"), out + "\n")
    catch { case _: Throwable => }
    s.sql("DROP TABLE gprobe")
    spark.stop()
  }
}
