package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: where does a GraftSession statement's fixed cost go? The
  * gate pack's multi-statement DT/stream lifecycle gates run 2-7 s each
  * at sf0.1 with tiny data — per-statement overhead, not data. Times a
  * ladder of statement shapes, repeated, on one session.
  *
  * Usage: runMain graft.tools.StmtOverheadProbe <sfDir> [reps]
  */
object StmtOverheadProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = new graft.engine.GraftSession(spark)
    s.attachLake(sfDir)
    s.sql("CREATE OR REPLACE TABLE so_t AS SELECT o_orderkey AS k, " +
      "o_custkey AS c, o_totalprice::number(12,2) AS p FROM orders " +
      "WHERE o_orderkey <= 2000")
    s.sql("CREATE OR REPLACE ICEBERG TABLE so_i AS SELECT * FROM so_t")
    s.sql("CREATE DYNAMIC TABLE so_d AS SELECT c, count(*) AS n, " +
      "sum(p) AS total FROM so_i GROUP BY c")

    // per-statement Spark job counter: names the fixed cost (how many
    // scheduler round-trips a statement shape pays, not just wall time)
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val sites = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          sites.add(js.stageInfos.lastOption.map(si =>
            si.name.takeWhile(_ != '\n')).getOrElse("?") +
            s"[${js.stageInfos.size}st]")
          ()
        }
      })
    def timed(label: String)(f: => Any): Unit = {
      f // warm
      Thread.sleep(100) // let listener drain
      val j0 = jobs.get()
      val t = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      Thread.sleep(100)
      val perRep = (jobs.get() - j0).toDouble / reps
      println(f"STMT $label%-34s min=${t.min}%8.1f ms  med=${t.sorted.apply(reps / 2)}%8.1f ms  jobs=$perRep%4.1f")
      if (sys.env.contains("STMT_PROBE_SITES")) {
        import scala.jdk.CollectionConverters._
        val lastRep = sites.asScala.toSeq.drop(
          j0 + ((reps - 1) * perRep).toInt)
        println(s"  sites: ${lastRep.mkString(" | ")}")
      }
    }
    timed("select_literal")(s.sql("SELECT 1 AS x").collect())
    timed("select_count_small")(
      s.sql("SELECT count(*) AS n FROM so_t").collect())
    timed("select_count_lineitem")(
      s.sql("SELECT count(*) AS n FROM lineitem").collect())
    timed("select_agg_group")(
      s.sql("SELECT c, count(*) AS n FROM so_t GROUP BY c").collect())
    timed("insert_100")(s.sql("INSERT INTO so_i SELECT k + 1000000, c, p " +
      "FROM so_t WHERE k <= 100"))
    timed("dt_refresh_noop")(s.sql("ALTER DYNAMIC TABLE so_d REFRESH"))
    timed("iceberg_delete_none")(s.sql("DELETE FROM so_i WHERE k < 0"))
    timed("show_tables")(s.sql("SHOW TABLES").collect())
    timed("ctas_small")(s.sql("CREATE OR REPLACE TABLE so_c AS " +
      "SELECT o_orderkey AS k, o_totalprice::number(12,2) AS p " +
      "FROM orders WHERE o_orderkey <= 2000"))
    var seq = 0
    timed("insert_plus_dt_refresh") {
      seq += 1
      s.sql(s"INSERT INTO so_i SELECT k + ${2000000 + seq * 10000}, c, p " +
        "FROM so_t WHERE k <= 100")
      s.sql("ALTER DYNAMIC TABLE so_d REFRESH")
    }
    timed("iceberg_update_granular")(
      s.sql("UPDATE so_i SET p = p + 0 WHERE k <= 50"))
    timed("truncate_reload") {
      s.sql("CREATE OR REPLACE TABLE so_tr AS SELECT * FROM so_t")
      s.sql("TRUNCATE TABLE so_tr")
    }
    // r16 additions (placed AFTER the r15 ladder so earlier shapes stay
    // comparable across probe JSONs): granular MERGE (the post-commit
    // table count now reads manifest record_count metadata instead of
    // scanning) and a DT chain refresh (the sidecar publish is one
    // sign-partitioned write instead of two)
    timed("iceberg_merge_granular") {
      seq += 1
      s.sql("MERGE INTO so_i t USING (SELECT k, c, p FROM so_t " +
        "WHERE k <= 50) src ON t.k = src.k " +
        "WHEN MATCHED THEN UPDATE SET p = src.p " +
        s"WHEN NOT MATCHED AND src.k > ${10000000 + seq} THEN " +
        "INSERT (k, c, p) VALUES (src.k, src.c, src.p)")
    }
    s.sql("CREATE DYNAMIC TABLE so_d2 AS SELECT c % 3 AS g, " +
      "sum(n) AS sn, sum(total) AS st FROM so_d GROUP BY c % 3")
    s.sql("ALTER DYNAMIC TABLE so_d2 REFRESH")
    timed("insert_refresh_chain") {
      seq += 1
      s.sql(s"INSERT INTO so_i SELECT k + ${3000000 + seq * 10000}, c, p " +
        "FROM so_t WHERE k <= 100")
      s.sql("ALTER DYNAMIC TABLE so_d REFRESH") // publishes: so_d2 consumes
      s.sql("ALTER DYNAMIC TABLE so_d2 REFRESH")
    }
    spark.stop()
  }
}
