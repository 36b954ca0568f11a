package graft.engine

import graft.sources.IcebergLite
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Cross-process writer-writer protection (round-13 directive #5):
  * TableLocks serializes writers inside one JVM; across PROCESSES the
  * version file itself is the lock — commits claim `vN.metadata.json
  * .claim` (O_EXCL) before any data lands and publish the metadata via
  * tmp + hard-link (atomic O_EXCL with content). This spec races a
  * REAL second JVM (graft.tools.CrossProcessCommit — the protocol is
  * pure NIO, so the racing process needs no Spark) against in-process
  * IcebergLite commits and asserts the loser always fails LOUDLY with
  * nothing clobbered, and that a retry against the table's current
  * state succeeds. */
class CrossProcessCommitSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def secondJvm(args: String*): Process = {
    val pb = new ProcessBuilder(
      (Seq("java", "-cp", System.getProperty("java.class.path"),
        "graft.tools.CrossProcessCommit") ++ args): _*)
    pb.redirectErrorStream(false)
    pb.start()
  }

  private def awaitLine(p: Process, want: String): Unit = {
    val r = new java.io.BufferedReader(
      new java.io.InputStreamReader(p.getInputStream))
    val deadline = System.nanoTime() + 60L * 1000000000L
    var line = r.readLine()
    while (line != null && line != want && System.nanoTime() < deadline)
      line = r.readLine()
    assert(line == want, s"second JVM never printed $want (got $line)")
  }

  test("live claim in another process fails this process's commit fast") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_xproc1").toString
    val mp1 = IcebergLite.write(spark, Seq((1L, "a")).toDF("k", "s"), dir)
    val v2 = s"$dir/metadata/v2.metadata.json"
    val holder = secondJvm("hold", v2, "30000")
    try {
      awaitLine(holder, "CLAIMED")
      val e = intercept[java.util.ConcurrentModificationException] {
        IcebergLite.append(spark, Seq((2L, "b")).toDF("k", "s"), mp1)
      }
      assert(e.getMessage.contains("claim"), e.getMessage)
      // nothing was published and no data directory was clobbered
      assert(!Files.exists(java.nio.file.Paths.get(v2)))
      assert(!Files.exists(java.nio.file.Paths.get(s"$dir/data/s2")))
      // v1 still scans clean
      assert(IcebergLite.scan(spark, mp1).count() == 1)
    } finally { holder.destroyForcibly(); holder.waitFor() }
    // the SIGKILLed holder left its claim behind with a dead pid — the
    // next commit must self-heal: loudly reclaim the stale claim and
    // succeed (round-13 directive #2; previously this blocked until a
    // human deleted the file)
    val mp2 = IcebergLite.append(spark, Seq((2L, "b")).toDF("k", "s"), mp1)
    assert(mp2.endsWith("v2.metadata.json"))
    assert(IcebergLite.scan(spark, mp2).count() == 2)
    // and the claim was released by the successful commit
    assert(!Files.exists(java.nio.file.Paths.get(v2 + ".claim")))
  }

  test("SIGKILL at the claim-create instant: claims are atomic-with-content") {
    import spark.implicits._
    // round-14 directive #2: a writer killed at ANY instant of claim
    // creation leaves either no claim or a pid-bearing claim — never an
    // empty file (the old createFile-then-writeString two-step had a
    // window that left an empty claim, which by policy blocks forever).
    // `claimloop` claims+releases via the engine's tmp+createLink
    // primitive in a tight loop; kill it at random instants and assert
    // the invariant + that the next writer ALWAYS self-heals.
    val rnd = new scala.util.Random(15L)
    val dir = Files.createTempDirectory("graft_xproc7").toString
    var mp = IcebergLite.write(spark, Seq((1L, "a")).toDF("k", "s"), dir)
    var n = 1L
    for (round <- 1 to 6) {
      val next = s"$dir/metadata/v${round + 1}.metadata.json"
      val looper = secondJvm("claimloop", next)
      awaitLine(looper, "LOOPING")
      Thread.sleep(5 + rnd.nextInt(40)) // land the kill mid-loop
      looper.destroyForcibly(); looper.waitFor()
      val claim = java.nio.file.Paths.get(next + ".claim")
      if (Files.exists(claim)) {
        val content = Files.readString(claim)
        assert(content.contains("pid="),
          s"round $round: pid-less claim observed: '$content'")
      }
      // the next writer always gets through: either the claim is gone or
      // it names the (now dead) looper pid and is loudly reclaimed
      mp = IcebergLite.append(spark, Seq((round + 1L, "x")).toDF("k", "s"), mp)
      n += 1
      assert(IcebergLite.scan(spark, mp).count() == n, s"round $round")
      assert(!Files.exists(claim), s"round $round: claim not released")
    }
  }

  test("claim without a recorded pid is never auto-reclaimed") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_xproc4").toString
    val mp1 = IcebergLite.write(spark, Seq((1L, "a")).toDF("k", "s"), dir)
    val v2 = java.nio.file.Paths.get(s"$dir/metadata/v2.metadata.json.claim")
    // a crash inside the create-then-write-pid window leaves an EMPTY
    // claim; liveness is unknowable, so it must keep blocking loudly
    Files.createFile(v2)
    val e = intercept[java.util.ConcurrentModificationException] {
      IcebergLite.append(spark, Seq((2L, "b")).toDF("k", "s"), mp1)
    }
    assert(e.getMessage.contains("claim"), e.getMessage)
    Files.deleteIfExists(v2)
  }

  test("crash mid-commit: garbage data + stale claim, readers clean, retry heals") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_xproc6").toString
    val mp1 = IcebergLite.write(spark, Seq((1L, "a")).toDF("k", "s"), dir)
    val v2 = s"$dir/metadata/v2.metadata.json"
    // simulate the full crashed-writer footprint: the claim (real, from
    // a SIGKILLed process, so it carries a dead pid) AND partial data
    // files already landed in the snapshot directory
    val holder = secondJvm("hold", v2, "30000")
    awaitLine(holder, "CLAIMED")
    holder.destroyForcibly(); holder.waitFor()
    val s2 = java.nio.file.Paths.get(s"$dir/data/s2")
    Files.createDirectories(s2)
    Files.writeString(s2.resolve("part-garbage.parquet"), "not parquet")
    Files.writeString(s2.resolve("part-000.parquet.tmp"), "partial")
    // 1) the published version is untouched by the torn commit: v1 scans
    //    clean (manifests address files explicitly; s2 is invisible)
    assert(IcebergLite.scan(spark, mp1).count() == 1)
    // 2) the next commit reclaims the dead claim, OVERWRITES the torn
    //    snapshot directory, and publishes a consistent v2
    val mp2 = IcebergLite.append(spark, Seq((2L, "b")).toDF("k", "s"), mp1)
    assert(mp2.endsWith("v2.metadata.json"))
    assert(IcebergLite.scan(spark, mp2).count() == 2)
    assert(IcebergLite.scan(spark, mp2).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
    // 3) the garbage is gone (mode=overwrite cleared the torn dir)
    assert(!Files.exists(s2.resolve("part-garbage.parquet")))
  }

  test("SIGKILL mid-hold with concurrent reclaimers: one commit per version") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_xproc5").toString
    val mp1 = IcebergLite.write(spark, Seq((1L, "a")).toDF("k", "s"), dir)
    val v2 = s"$dir/metadata/v2.metadata.json"
    val holder = secondJvm("hold", v2, "30000")
    awaitLine(holder, "CLAIMED")
    holder.destroyForcibly(); holder.waitFor()
    // several threads race to reclaim the dead holder's claim and
    // commit; exactly one may win version 2 (the losers see either the
    // new live claim or the already-published metadata, both loud)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val results = Await.result(Future.sequence((1 to 4).toList.map { i =>
      Future {
        try Right(IcebergLite.append(
          spark, Seq((10L + i, s"r$i")).toDF("k", "s"), mp1))
        catch { case e: java.util.ConcurrentModificationException => Left(e) }
      }
    }), 120.seconds)
    assert(results.count(_.isRight) == 1, results)
    assert(IcebergLite.scan(
      spark, results.collectFirst { case Right(mp) => mp }.get).count() == 2)
  }

  test("version published by another process forces loud retry, not lost update") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_xproc2").toString
    val mp1 = IcebergLite.write(spark, Seq((1L, "a")).toDF("k", "s"), dir)
    val v2 = s"$dir/metadata/v2.metadata.json"
    // the OTHER process wins version 2 (its metadata content is a copy
    // of v1 — the conflict mechanics don't depend on what it committed)
    val pub = secondJvm("publish", v2, mp1)
    assert(pub.waitFor() == 0)
    // this process still holds the stale v1 handle: its v2 commit must
    // fail loudly instead of silently clobbering the other's commit
    val e = intercept[java.util.ConcurrentModificationException] {
      IcebergLite.append(spark, Seq((2L, "b")).toDF("k", "s"), mp1)
    }
    assert(e.getMessage.contains("already exists"), e.getMessage)
    // retrying against the CURRENT state (v2) succeeds and sees one
    // consistent history
    val mp3 = IcebergLite.append(spark, Seq((2L, "b")).toDF("k", "s"), v2)
    assert(mp3.endsWith("v3.metadata.json"))
    assert(IcebergLite.scan(spark, mp3).count() == 2)
  }

  test("two concurrent publishes: exactly one wins, loser exits loudly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_xproc3").toString
    val mp1 = IcebergLite.write(spark, Seq((1L, "a")).toDF("k", "s"), dir)
    val v2 = s"$dir/metadata/v2.metadata.json"
    val ps = (1 to 4).map(_ => secondJvm("publish", v2, mp1))
    val rcs = ps.map(_.waitFor())
    assert(rcs.count(_ == 0) == 1, s"exactly one winner expected: $rcs")
    assert(rcs.count(_ == 17) == 3, s"three loud losers expected: $rcs")
    assert(Files.exists(java.nio.file.Paths.get(v2)))
  }
}
