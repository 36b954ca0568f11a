package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Wire-encoding edge cases for [[SnowflakeTypes]] that the server specs
  * can't hit deterministically. */
class SnowflakeTypesSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("toRowsetChunked deletes already-spilled chunks when the drain fails") {
    // rows stream off executeToIterator one partition at a time, so a
    // failure in a LATE partition happens after earlier chunks already
    // spilled to disk — those files must not outlive the exception
    // (ADVICE r14 #5: they were orphaned for the process lifetime).
    val boom = udf((id: Long) =>
      if (id >= 800) throw new RuntimeException("boom at " + id) else id)
    val df = spark.range(0, 1000, 1, 10)
      .select(boom(col("id")).as("id"))
    val dir = Files.createTempDirectory("graft_chunk_spill_test")
    val e = intercept[Exception] {
      SnowflakeTypes.toRowsetChunked(df, 64, Some(dir))
    }
    assert(e.getMessage != null)
    assert(Files.list(dir).count() == 0,
      "failed drain left spilled chunk files behind")
    Files.deleteIfExists(dir)
  }

  test("toRowsetChunked spills into the given directory and reassembles exactly") {
    val df = spark.range(0, 500, 1, 5).select(col("id"))
    val dir = Files.createTempDirectory("graft_chunk_spill_ok")
    val (b64, rowtype, rest) = SnowflakeTypes.toRowsetChunked(df, 64, Some(dir))
    assert(rowtype.map(_.name) == Seq("id"))
    assert(b64.nonEmpty)
    assert(rest.nonEmpty)
    // every spilled chunk lives in the requested directory
    rest.foreach { case (_, p) => assert(p.getParent == dir, p.toString) }
    assert(Files.list(dir).count() == rest.length.toLong)
    assert(rest.map(_._1).sum + 64 == 500L)
    rest.foreach { case (_, p) => Files.deleteIfExists(p) }
    Files.deleteIfExists(dir)
  }
}
