package graft

import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths}

/** Two full gate packs interleaved on ONE SparkSession (round-14
  * directive #6): each worker runs every [[SparkEntry.queries]] gate in
  * its own seeded-shuffled order, writing results to its own outDir.
  * Every gate invocation builds its own GraftSession (own warehouse
  * temp dir), so this stresses exactly the state that IS shared — the
  * SparkSession's temp-view catalog, the lake tables, codegen caches —
  * the way a multi-tenant server shares them. Both dumps are then
  * oracle-checked by tools/check_oracle.py like any pack run.
  *
  * Usage: runMain graft.VerifyConcurrent <sfDir> <outDirA> <outDirB>
  * Exits non-zero if any gate in either worker THROWS (oracle compare
  * is the driver-side python step).
  */
object VerifyConcurrent {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outA, outB) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val gates = SparkEntry.queries.toSeq.sortBy(_._1)
    def worker(outDir: String, seed: Long): List[String] = {
      new java.io.File(outDir).mkdirs()
      val order = new scala.util.Random(seed).shuffle(gates)
      val failures = scala.collection.mutable.ListBuffer.empty[String]
      order.foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[concurrent:$seed] $name failed: " +
            e.getMessage)
          failures += name
        }
      }
      failures.toList
    }

    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fa = Future(worker(outA, 1515L))
    val fb = Future(worker(outB, 9090L))
    val (failA, failB) =
      (Await.result(fa, 90.minutes), Await.result(fb, 90.minutes))

    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outA/oracle_sql.json"), json)
    Files.writeString(Paths.get(s"$outB/oracle_sql.json"), json)
    println(s"""{"concurrent_failures_a":${failA.size},""" +
      s""""concurrent_failures_b":${failB.size}}""")
    spark.stop()
    if (failA.nonEmpty || failB.nonEmpty) sys.exit(1)
  }
}
