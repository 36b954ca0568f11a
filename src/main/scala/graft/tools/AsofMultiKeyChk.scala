package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev check: does the ASOF emitter handle a multi-column ON equality?
  * (Gates cover single-key ON; the fuzz wants to widen.) */
object AsofMultiKeyChk {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = new graft.engine.GraftSession(spark)
    s.attachLake("/root/testdata/sf0.001")
    s.sql("""CREATE OR REPLACE TABLE amk_l AS SELECT o_orderkey AS uid,
      o_custkey % 20 AS k, o_custkey % 3 AS k2, o_orderkey AS ts
      FROM orders WHERE o_orderkey <= 400""")
    s.sql("""CREATE OR REPLACE TABLE amk_r AS SELECT o_orderkey AS rid,
      o_custkey % 20 AS k, o_custkey % 3 AS k2, o_orderkey AS ts
      FROM orders WHERE o_orderkey % 2 = 0 AND o_orderkey <= 800""")
    val got = s.sql("""SELECT l.uid AS uid, r.rid AS rid
      FROM amk_l l ASOF JOIN amk_r r MATCH_CONDITION(l.ts >= r.ts)
      ON l.k = r.k AND l.k2 = r.k2
      ORDER BY uid""").collect().map(_.toString)
    // independent rendering: candidate join + ROW_NUMBER pick
    val want = s.sql("""SELECT uid, rid FROM (
        SELECT l.uid AS uid, r.rid AS rid,
          ROW_NUMBER() OVER (PARTITION BY l.uid ORDER BY r.ts DESC) AS rn
        FROM amk_l l JOIN amk_r r
          ON l.k = r.k AND l.k2 = r.k2 AND r.ts <= l.ts)
      WHERE rn = 1 ORDER BY uid""").collect().map(_.toString)
    println("multi-key ASOF got=" + got.length + " want=" + want.length +
      " equal=" + got.sameElements(want))
    if (!got.sameElements(want)) {
      got.zip(want).filter(p => p._1 != p._2).take(5)
        .foreach(p => println("DIFF got=" + p._1 + " want=" + p._2))
      sys.exit(1)
    }
    s.sql("DROP TABLE amk_l"); s.sql("DROP TABLE amk_r")
    spark.stop()
  }
}
