package graft.tools
import org.apache.spark.sql.SparkSession
import graft.engine.GraftSession
object ProbeEngine {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = new GraftSession(spark)
    gs.attachLake("/root/testdata/sf0.001")
    def probe(label: String)(f: => Any): Unit =
      try println(s"PROBE $label -> OK: " + f)
      catch { case e: Throwable => println(s"PROBE $label -> ${e.getClass.getSimpleName}: ${e.getMessage.linesIterator.next().take(120)}") }
    probe("unknown table")(gs.sql("SELECT * FROM nope").collect().length)
    probe("garbage sql")(gs.sql("FLURB 123 $$").collect().length)
    probe("drop missing table")(gs.sql("DROP TABLE missing_t").collect().length)
    probe("drop if exists missing")(gs.sql("DROP TABLE IF EXISTS missing_t").collect()(0).getString(0))
    probe("insert into missing")(gs.sql("INSERT INTO missing_t SELECT 1").collect().length)
    probe("copy unknown stage")(gs.sql("COPY INTO region FROM @nostage/x").collect().length)
    probe("create existing no replace")({gs.sql("CREATE TEMP TABLE dup1 AS SELECT 1 AS a"); gs.sql("CREATE TEMP TABLE dup1 AS SELECT 2 AS a")})
    probe("empty batch")(gs.sql(";;;").collect().length)
    probe("quoted mixed-case table")({gs.sql("CREATE TEMP TABLE \"CaseSense\" AS SELECT 1 AS a"); gs.sql("SELECT * FROM \"CaseSense\"").collect().length})
    spark.stop()
  }
}
