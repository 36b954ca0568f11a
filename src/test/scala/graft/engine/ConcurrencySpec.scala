package graft.engine

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Concurrent-session hardening (round-12 directive #4): 2-4 threads of
  * GraftSessions over one SHARED registry (the single-process analog of
  * a server's shared metastore) mutating the same tables. The tested
  * locking policy lives in [[TableLocks]]:
  *
  *   - writers (INSERT / COPY / UPDATE / DELETE / MERGE / OPTIMIZE / DT
  *     REFRESH) hold a JVM-wide per-table lock for the statement, so
  *     concurrent writers serialize and the outcome equals SOME serial
  *     order;
  *   - a DT refresh locks its bases too (sorted keys — deadlock-free),
  *     so change detection + delta scan + offset advance see one
  *     consistent base snapshot;
  *   - a stream read resolves under its target's lock and the consume
  *     advances to the version THE READ SAW, so appends racing the
  *     consumer are delivered exactly once (never skipped);
  *   - readers don't lock: appends are always safe; a read racing a COW
  *     rewrite of the same files may fail loudly but never silently
  *     mixes pre- and post-state of one file.
  *
  * Every scenario here asserts the serializable-equivalent outcome, not
  * just absence of crashes.
  */
class ConcurrencySpec extends AnyFunSuite {

  // local[4] like every other suite: the FIRST suite to run pins the
  // shared session's master, and a differing core count changes split
  // packing enough to flip fp-strict compares in sibling suites. The
  // races here interleave on the executor pool regardless.
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** n sessions over ONE shared catalog + lake. */
  private def sessions(n: Int): Seq[GraftSession] = {
    val cat = scala.collection.concurrent.TrieMap.empty[FQN, TableRef]
    val ss = (0 until n).map(_ => new GraftSession(spark,
      Files.createTempDirectory("graft_conc_wh").toString, Some(cat)))
    ss.head.attachLake("/root/testdata/sf0.001")
    ss
  }

  /** Run each thunk on its own thread; rethrow the first failure. */
  private def inParallel(thunks: Seq[() => Unit]): Unit = {
    val pool = Executors.newFixedThreadPool(thunks.length)
    val start = new CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val futs = thunks.map { t =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          try t() catch { case e: Throwable => errs.add(e) }
        }
      })
    }
    start.countDown()
    futs.foreach(_.get(600, TimeUnit.SECONDS))
    pool.shutdown()
    if (!errs.isEmpty) throw errs.peek()
  }

  test("4 sessions x racing INSERTs: every row lands exactly once") {
    val ss = sessions(4)
    ss.head.sql("CREATE OR REPLACE TABLE conc1 (k BIGINT, v DOUBLE)")
    val perInsert = ss.head
      .sql("SELECT count(*) AS n FROM orders WHERE o_orderkey <= 200")
      .collect()(0).getLong(0)
    assert(perInsert > 0)
    val iters = 5
    inParallel(ss.zipWithIndex.map { case (s, i) => () =>
      for (j <- 0 until iters) {
        val off = (i * iters + j) * 10000000L
        s.sql(s"""INSERT INTO conc1
          SELECT o_orderkey + $off, o_totalprice FROM orders
          WHERE o_orderkey <= 200""")
      }
    })
    val total = ss.head.sql("SELECT count(*) AS n FROM conc1")
      .collect()(0).getLong(0)
    val distinctK = ss.head.sql("SELECT count(DISTINCT k) AS n FROM conc1")
      .collect()(0).getLong(0)
    assert(total == 4 * iters * perInsert,
      s"lost/duplicated appends: $total != ${4 * iters * perInsert}")
    assert(distinctK == total, "overlapping keys — an insert ran twice")
  }

  test("2 sessions x racing commutative MERGEs == sequential reference") {
    val ss = sessions(2)
    // identical initial state for the raced table and the reference
    for (t <- Seq("conc2", "conc2_ref"))
      ss.head.sql(s"""CREATE OR REPLACE TABLE $t AS
        SELECT o_orderkey AS k, o_totalprice::double AS v
        FROM orders WHERE o_orderkey <= 400""")
    def mergeSql(t: String, lo: Int, hi: Int, dv: Double): String =
      s"""MERGE INTO $t USING (
           SELECT o_orderkey AS k, $dv AS dv FROM orders
           WHERE o_orderkey > $lo AND o_orderkey <= $hi) src
         ON $t.k = src.k
         WHEN MATCHED THEN UPDATE SET v = $t.v + src.dv
         WHEN NOT MATCHED THEN INSERT (k, v) VALUES (src.k, src.dv)"""
    // overlapping key windows; += commutes, inserts hit disjoint keys,
    // so EVERY serial order yields the sequential reference's state
    inParallel(Seq(
      () => ss(0).sql(mergeSql("conc2", 0, 300, 10.0)),
      () => ss(1).sql(mergeSql("conc2", 200, 600, 7.0))))
    ss.head.sql(mergeSql("conc2_ref", 0, 300, 10.0))
    ss.head.sql(mergeSql("conc2_ref", 200, 600, 7.0))
    val got = ss.head.sql("SELECT k, v FROM conc2 ORDER BY k")
      .collect().map(_.toString)
    val want = ss.head.sql("SELECT k, v FROM conc2_ref ORDER BY k")
      .collect().map(_.toString)
    assert(got.length == want.length,
      s"row count ${got.length} != ${want.length}")
    got.zip(want).foreach { case (g, w) => assert(g == w, s"$g != $w") }
  }

  test("stream consume racing appends: exactly-once delivery") {
    val ss = sessions(2)
    val (writer, consumer) = (ss(0), ss(1))
    writer.sql("CREATE OR REPLACE TABLE conc3 (k BIGINT, v DOUBLE)")
    consumer.sql("CREATE OR REPLACE STREAM conc3_s ON TABLE conc3")
    consumer.sql("CREATE OR REPLACE TABLE conc3_sink (k BIGINT, v DOUBLE)")
    val batches = 8
    inParallel(Seq(
      () => for (j <- 0 until batches) {
        writer.sql(s"""INSERT INTO conc3
          SELECT o_orderkey + ${j * 10000000L}, o_totalprice FROM orders
          WHERE o_orderkey <= 150""")
      },
      () => for (_ <- 0 until 12) {
        // each consuming statement drains the delta the read SAW and
        // advances the offset to exactly that version
        consumer.sql("INSERT INTO conc3_sink SELECT k, v FROM conc3_s")
        Thread.sleep(20)
      }))
    // final drain picks up anything appended after the last mid-race read
    consumer.sql("INSERT INTO conc3_sink SELECT k, v FROM conc3_s")
    val src = writer.sql("SELECT count(*) AS n, count(DISTINCT k) AS d FROM conc3")
      .collect()(0)
    val snk = writer.sql(
      "SELECT count(*) AS n, count(DISTINCT k) AS d FROM conc3_sink")
      .collect()(0)
    assert(snk.getLong(0) == src.getLong(0),
      s"stream delivered ${snk.getLong(0)} rows of ${src.getLong(0)} — " +
        "a racing append was skipped or double-delivered")
    assert(snk.getLong(1) == src.getLong(1), "duplicate keys in sink")
  }

  test("DT refresh racing base INSERTs: final refresh == recompute") {
    val ss = sessions(2)
    val (writer, refresher) = (ss(0), ss(1))
    writer.sql("""CREATE OR REPLACE TABLE conc4 AS
      SELECT o_orderkey AS k, o_totalprice::double AS v
      FROM orders WHERE o_orderkey <= 300""")
    refresher.sql("""CREATE OR REPLACE DYNAMIC TABLE conc4_dt
      TARGET_LAG = '1 minute' AS
      SELECT k % 10 AS g, count(*) AS n, sum(v) AS sv
      FROM conc4 GROUP BY k % 10""")
    inParallel(Seq(
      () => for (j <- 1 to 6) {
        writer.sql(s"""INSERT INTO conc4
          SELECT o_orderkey + ${j * 10000000L}, o_totalprice FROM orders
          WHERE o_orderkey <= 300""")
      },
      () => for (_ <- 1 to 10) {
        refresher.sql("ALTER DYNAMIC TABLE conc4_dt REFRESH")
        Thread.sleep(15)
      }))
    refresher.sql("ALTER DYNAMIC TABLE conc4_dt REFRESH")
    val got = refresher.sql("SELECT g, n, sv FROM conc4_dt ORDER BY g")
      .collect()
    val want = refresher.sql(
      """SELECT k % 10 AS g, count(*) AS n, sum(v) AS sv
         FROM conc4 GROUP BY k % 10 ORDER BY g""")
      .collect()
    assert(got.length == want.length, "group count diverged")
    // double SUM is summation-order-sensitive: the incremental fold and
    // the fresh recompute legitimately differ in the last ulps — compare
    // keys/counts exactly, sums with a relative tolerance
    got.zip(want).foreach { case (g, w) =>
      assert(g.get(0) == w.get(0) && g.getLong(1) == w.getLong(1),
        s"DT group/count diverged after racing refreshes: $g vs $w")
      val (a, b) = (g.getDouble(2), w.getDouble(2))
      assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b)),
        s"DT sum diverged beyond fp tolerance: $g vs $w")
    }
  }

  test("2 sessions x racing Iceberg UPDATEs: commits serialize on the moving path") {
    // the FQN-keyed lock exists precisely because an Iceberg commit
    // MOVES the table's metadata path: with path-keyed locks (or none),
    // writer B resolves the pre-A snapshot and its COW swap silently
    // drops A's update. Additive updates commute, so any serial order
    // must land every increment.
    val ss = sessions(2)
    ss.head.sql("""CREATE OR REPLACE ICEBERG TABLE conc6 AS
      SELECT o_orderkey AS k, o_totalprice::number(12,2) AS v
      FROM orders WHERE o_orderkey <= 800""")
    val base = ss.head.sql("SELECT CAST(sum(v) AS DOUBLE) AS s, count(*) AS n FROM conc6")
      .collect()(0)
    val perThread = 3
    inParallel(ss.map { s => () =>
      for (_ <- 1 to perThread)
        s.sql("UPDATE conc6 SET v = v + 1 WHERE k <= 800")
    })
    val fin = ss.head.sql("SELECT CAST(sum(v) AS DOUBLE) AS s, count(*) AS n FROM conc6")
      .collect()(0)
    assert(fin.getLong(1) == base.getLong(1), "row count changed")
    val expect = base.getDouble(0) + 2.0 * perThread * base.getLong(1)
    assert(math.abs(fin.getDouble(0) - expect) < 1e-6,
      s"an Iceberg commit was lost: sum ${fin.getDouble(0)} != $expect " +
        s"(base ${base.getDouble(0)}, ${2 * perThread} increments x " +
        s"${base.getLong(1)} rows)")
  }

  test("OPTIMIZE racing additive UPDATEs: compaction never drops a commit") {
    // compaction racing COW DML is the classic corruption shape: OPTIMIZE
    // rewrites all files into one and commits a replace snapshot — if it
    // resolved a pre-UPDATE snapshot (or the UPDATE resolved pre-compact
    // files), one side's rows would be silently reverted. Under the
    // per-table writer lock both serialize; additive updates commute, so
    // every increment must survive any interleaving with compaction.
    val ss = sessions(2)
    ss.head.sql("""CREATE OR REPLACE ICEBERG TABLE conc7 AS
      SELECT o_orderkey AS k, o_totalprice::number(12,2) AS v
      FROM orders WHERE o_orderkey <= 600""")
    // several appends so OPTIMIZE has real multi-file work each pass
    ss.head.sql("""INSERT INTO conc7
      SELECT o_orderkey, o_totalprice::number(12,2)
      FROM orders WHERE o_orderkey > 600 AND o_orderkey <= 1200""")
    val base = ss.head.sql(
      "SELECT CAST(sum(v) AS DOUBLE) AS s, count(*) AS n FROM conc7")
      .collect()(0)
    val perThread = 3
    inParallel(Seq(
      () => for (_ <- 1 to perThread)
        ss(0).sql("UPDATE conc7 SET v = v + 1"),
      () => for (_ <- 1 to perThread)
        ss(1).sql("OPTIMIZE conc7")))
    val fin = ss.head.sql(
      "SELECT CAST(sum(v) AS DOUBLE) AS s, count(*) AS n FROM conc7")
      .collect()(0)
    assert(fin.getLong(1) == base.getLong(1),
      s"compaction changed the row count: ${fin.getLong(1)} vs ${base.getLong(1)}")
    val expect = base.getDouble(0) + perThread.toDouble * base.getLong(1)
    assert(math.abs(fin.getDouble(0) - expect) < 1e-6,
      s"an update or compaction commit was lost: sum ${fin.getDouble(0)} " +
        s"!= $expect (base ${base.getDouble(0)}, $perThread increments x " +
        s"${base.getLong(1)} rows)")
  }

  test("2 sessions x racing CREATE OR REPLACE TABLE AS: replace is atomic") {
    val ss = sessions(2)
    val iters = 4
    // every write stamps ALL its rows with one (session, iter) tag and a
    // known row count; an atomic replace means the final table is exactly
    // ONE write's batch — one distinct tag, that tag's full count, never
    // a mix of two writes' files
    inParallel(ss.zipWithIndex.map { case (s, i) => () =>
      for (j <- 0 until iters) {
        val n = 100 + i * 10 + j // distinct per (i, j): count pins the tag
        s.sql(s"""CREATE OR REPLACE TABLE conc8 AS
          SELECT 'w${i}_$j' AS tag, o_orderkey AS k FROM orders
          WHERE o_orderkey <= ${4 * n} AND o_orderkey % 4 = 0""")
      }
    })
    val rows = ss.head.sql(
      "SELECT count(DISTINCT tag) AS tags, min(tag) AS tag, count(*) AS n " +
        "FROM conc8").collect()(0)
    assert(rows.getLong(0) == 1, s"torn replace — mixed tags: $rows")
    val Array(_, ij) = rows.getString(1).split("w", 2)
    val Array(i, j) = ij.split("_").map(_.toInt)
    val n = 100 + i * 10 + j
    val expected = ss.head.sql(
      s"""SELECT count(*) AS n FROM orders
          WHERE o_orderkey <= ${4 * n} AND o_orderkey % 4 = 0""")
      .collect()(0).getLong(0)
    assert(rows.getLong(2) == expected,
      s"replace lost/mixed rows: $rows != $expected")
  }

  test("readers racing COW UPDATEs never observe a torn state") {
    // the stated reader policy: readers don't lock — a read racing a
    // COW rewrite may fail LOUDLY (files swapped under it) but must
    // never silently mix pre- and post-state. Every SUCCESSFUL sum
    // must therefore equal a committed state: an exact multiple of one
    // full +1 pass over the row set.
    val ss = sessions(2)
    ss.head.sql("""CREATE OR REPLACE TABLE conc10 AS
      SELECT o_orderkey AS k, 0::bigint AS v
      FROM orders WHERE o_orderkey <= 600""")
    val nRows = ss.head.sql("SELECT count(*) AS n FROM conc10")
      .collect()(0).getLong(0)
    val updates = 8
    val sums = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    var loudFailures = 0
    inParallel(Seq(
      () => for (_ <- 0 until updates)
        ss.head.sql("UPDATE conc10 SET v = v + 1"),
      () => for (_ <- 0 until 30) {
        try {
          val sv = ss(1).sql(
            "SELECT coalesce(sum(v), 0) AS sv FROM conc10")
            .collect()(0).getLong(0)
          sums.add(sv)
        } catch {
          case _: Exception => loudFailures += 1 // allowed: loud, not torn
        }
      }
    ))
    import scala.jdk.CollectionConverters._
    val seen = sums.asScala.toSeq
    assert(seen.nonEmpty, "no read ever succeeded")
    seen.foreach { sv =>
      assert(sv % nRows == 0 && sv / nRows <= updates,
        s"torn read: sum=$sv rows=$nRows (committed states only; " +
          s"loud failures seen: $loudFailures)")
    }
  }

  test("CLONE racing COW UPDATEs sees exactly one committed snapshot") {
    val ss = sessions(2)
    ss.head.sql("""CREATE OR REPLACE TABLE conc9 AS
      SELECT o_orderkey AS k, 0::bigint AS v
      FROM orders WHERE o_orderkey <= 800""")
    val nRows = ss.head.sql("SELECT count(*) AS n FROM conc9")
      .collect()(0).getLong(0)
    val updates = 6
    val clones = 5
    inParallel(Seq(
      () => for (_ <- 0 until updates)
        ss.head.sql("UPDATE conc9 SET v = v + 1"),
      () => for (j <- 0 until clones)
        ss(1).sql(s"CREATE TABLE conc9_c$j CLONE conc9")
    ))
    // each clone captured SOME committed snapshot: sum(v) == i * nRows
    // for an integer 0 <= i <= updates — never a mix of two snapshots
    val sums = (0 until clones).map { j =>
      ss.head.sql(s"SELECT coalesce(sum(v), 0) AS sv FROM conc9_c$j")
        .collect()(0).getLong(0)
    }
    sums.foreach { sv =>
      assert(sv % nRows == 0 && sv / nRows <= updates,
        s"clone caught a torn snapshot: sum=$sv rows=$nRows ($sums)")
    }
    // clones are snapshots, not links: mutating the source afterward
    // must not change any clone
    ss.head.sql("UPDATE conc9 SET v = v + 100")
    val after = (0 until clones).map { j =>
      ss.head.sql(s"SELECT coalesce(sum(v), 0) AS sv FROM conc9_c$j")
        .collect()(0).getLong(0)
    }
    assert(after == sums, s"clone drifted after source update: $sums -> $after")
  }

  test("4 sessions x racing UPDATE/DELETE on disjoint key ranges") {
    val ss = sessions(4)
    ss.head.sql("""CREATE OR REPLACE TABLE conc5 AS
      SELECT o_orderkey AS k, o_totalprice::double AS v,
        (o_orderkey % 4)::int AS slot
      FROM orders WHERE o_orderkey <= 1200""")
    // each session owns slot i: doubles its values then deletes the
    // cheap half — slots are disjoint, so the serial outcome is unique
    inParallel(ss.zipWithIndex.map { case (s, i) => () =>
      s.sql(s"UPDATE conc5 SET v = v * 2 WHERE slot = $i")
      s.sql(s"DELETE FROM conc5 WHERE slot = $i AND v < 100000")
    })
    val got = ss.head.sql(
      "SELECT count(*) AS n, round(sum(v), 2) AS sv FROM conc5").collect()(0)
    // sequential reference on a twin table
    ss.head.sql("""CREATE OR REPLACE TABLE conc5_ref AS
      SELECT o_orderkey AS k, o_totalprice::double AS v,
        (o_orderkey % 4)::int AS slot
      FROM orders WHERE o_orderkey <= 1200""")
    for (i <- 0 until 4) {
      ss.head.sql(s"UPDATE conc5_ref SET v = v * 2 WHERE slot = $i")
      ss.head.sql(s"DELETE FROM conc5_ref WHERE slot = $i AND v < 100000")
    }
    val want = ss.head.sql(
      "SELECT count(*) AS n, round(sum(v), 2) AS sv FROM conc5_ref")
      .collect()(0)
    assert(got.toString == want.toString,
      s"racing disjoint DML diverged: $got != $want")
  }
}
