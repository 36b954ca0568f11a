package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Dev tool: measure the CEILING of a columnar batch-at-a-time
  * low-cardinality aggregate — the one untried lever for the h02/h06/h07
  * residual (DuckDB's vectorized perfect-hash agg vs Spark's row-based
  * HashAggregateExec, 2-7× on quiet pairs; every conf lever is
  * probe-closed, see probes/h07_key_encoding.json + AggMapProbe).
  *
  * Variants per shape:
  *   base     — the stock DataFrame aggregate (what Bench times)
  *   global   — same aggregates with NO group key (isolates the hash
  *              lookup: base − global = what a perfect-hash map could
  *              save at most)
  *   colbatch — hand-tuned aggregation directly over the parquet scan's
  *              ColumnarBatches (FileSourceScanExec.executeColumnar),
  *              skipping ColumnarToRow + codegen row loop entirely: the
  *              ceiling for a custom columnar physical operator.
  *
  * Usage: runMain graft.tools.ColAggProbe <heavyDir> [reps]
  */
object ColAggProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$dir/lineitem")
    val ev = spark.read.parquet(s"$dir/events")

    // the batch's column order is the SCAN's output order (file-schema
    // order after pruning), not the select order — return name→index too
    def columnarRdd(df: org.apache.spark.sql.DataFrame)
        : (org.apache.spark.rdd.RDD[org.apache.spark.sql.vectorized.ColumnarBatch],
           Map[String, Int]) = {
      val plan = df.queryExecution.executedPlan
      val scan = plan.collectFirst { case s: FileSourceScanExec => s }
        .getOrElse(throw new IllegalStateException(
          s"no FileSourceScanExec in:\n$plan"))
      (scan.executeColumnar(),
        scan.output.map(_.name).zipWithIndex.toMap)
    }

    // ── h02: 2 short-string keys (~9 groups), 3 sums + count ───────────
    def h02base() = li.groupBy("l_returnflag", "l_linestatus")
      .agg(sum(col("l_quantity")), sum(col("l_extendedprice")),
        avg(col("l_discount")), count(lit(1))).count()
    def h02global() = li.agg(sum(col("l_quantity")),
      sum(col("l_extendedprice")), avg(col("l_discount")),
      count(lit(1))).count()
    lazy val (h02scan, h02ix) = columnarRdd(
      li.select("l_returnflag", "l_linestatus", "l_quantity",
        "l_extendedprice", "l_discount"))
    def h02col(): Long = {
      val (iF, iS, iQ, iP, iD) = (h02ix("l_returnflag"), h02ix("l_linestatus"),
        h02ix("l_quantity"), h02ix("l_extendedprice"), h02ix("l_discount"))
      val partials = h02scan.mapPartitions { it =>
        // flags are single chars — perfect-hash on (c1, c2): 64k slots
        val sums = new Array[Double](65536 * 4)
        val seen = new Array[Boolean](65536)
        while (it.hasNext) {
          val b = it.next()
          val n = b.numRows()
          val cF = b.column(iF); val cS = b.column(iS)
          val q = b.column(iQ); val p = b.column(iP); val d = b.column(iD)
          var i = 0
          while (i < n) {
            val slot = ((cF.getUTF8String(i).getByte(0) & 0xff) << 8) |
              (cS.getUTF8String(i).getByte(0) & 0xff)
            seen(slot) = true
            val o = slot * 4
            sums(o) += q.getDouble(i)
            sums(o + 1) += p.getDouble(i)
            sums(o + 2) += d.getDouble(i)
            sums(o + 3) += 1d
            i += 1
          }
        }
        val out = Seq.newBuilder[(Int, Double, Double, Double, Double)]
        var s = 0
        while (s < 65536) {
          if (seen(s)) out += ((s, sums(s * 4), sums(s * 4 + 1),
            sums(s * 4 + 2), sums(s * 4 + 3)))
          s += 1
        }
        out.result().iterator
      }.collect()
      partials.groupBy(_._1).size.toLong
    }

    // ── h06: long key (~1k groups), count + sum ────────────────────────
    def h06base() = li.groupBy("l_suppkey")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
      .filter(col("n") > 100).orderBy(col("q").desc).limit(10).count()
    def h06global() = li.agg(count(lit(1)), sum(col("l_quantity"))).count()
    lazy val (h06scan, h06ix) = columnarRdd(li.select("l_suppkey", "l_quantity"))
    def h06col(): Long = {
      val (iK, iQ) = (h06ix("l_suppkey"), h06ix("l_quantity"))
      val partials = h06scan.mapPartitions { it =>
        // suppkey is dense small-int: direct-address array
        val cap = 1 << 17
        val cnt = new Array[Long](cap)
        val sq = new Array[Double](cap)
        var overflow = scala.collection.mutable.Map.empty[Long, (Long, Double)]
        while (it.hasNext) {
          val b = it.next()
          val n = b.numRows()
          val k = b.column(iK); val q = b.column(iQ)
          var i = 0
          while (i < n) {
            val key = k.getLong(i)
            if (key >= 0 && key < cap) {
              cnt(key.toInt) += 1; sq(key.toInt) += q.getDouble(i)
            } else {
              val prev = overflow.getOrElse(key, (0L, 0d))
              overflow = overflow.updated(key,
                (prev._1 + 1, prev._2 + q.getDouble(i)))
            }
            i += 1
          }
        }
        val out = Seq.newBuilder[(Long, Long, Double)]
        var s = 0
        while (s < cap) {
          if (cnt(s) > 0) out += ((s.toLong, cnt(s), sq(s)))
          s += 1
        }
        overflow.foreach { case (k, (c, v)) => out += ((k, c, v)) }
        out.result().iterator
      }.collect()
      partials.groupBy(_._1).map { case (k, vs) =>
        (k, vs.map(_._2).sum, vs.map(_._3).sum)
      }.count { case (_, c, _) => c > 100 }.toLong
    }

    // ── h07: hour-truncated ts + short string (~2.6k groups) ───────────
    def h07base() = ev
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"), avg(col("value")))
      .orderBy(col("n").desc).limit(10).count()
    def h07global() = ev.agg(count(lit(1)), avg(col("value"))).count()
    lazy val (h07scan, h07ix) = columnarRdd(ev.select("ts", "event_type", "value"))
    def h07col(): Long = {
      val (iT, iE, iV) = (h07ix("ts"), h07ix("event_type"), h07ix("value"))
      val partials = h07scan.mapPartitions { it =>
        val m = new java.util.HashMap[Long, Array[Double]]()
        while (it.hasNext) {
          val b = it.next()
          val n = b.numRows()
          val ts = b.column(iT); val et = b.column(iE); val v = b.column(iV)
          var i = 0
          while (i < n) {
            val us = ts.getLong(i)
            val hour = us - java.lang.Math.floorMod(us, 3600000000L)
            // event_type is a handful of distinct short strings: fold the
            // first two bytes into the key (exact for this vocabulary)
            val s0 = et.getUTF8String(i)
            val tag = ((s0.getByte(0) & 0xffL) << 8) |
              (if (s0.numBytes() > 1) s0.getByte(1) & 0xffL else 0L)
            val key = hour | tag // hours are µs-multiples of 3.6e9 — low
                                 // 16 bits are zero, tag packs in losslessly
            var arr = m.get(key)
            if (arr == null) { arr = new Array[Double](2); m.put(key, arr) }
            arr(0) += 1; arr(1) += v.getDouble(i)
            i += 1
          }
        }
        import scala.jdk.CollectionConverters._
        m.entrySet().iterator().asScala
          .map(e => (e.getKey, e.getValue()(0), e.getValue()(1)))
      }.collect()
      partials.groupBy(_._1).size.toLong
    }

    def withForce[T](f: => T): T = {
      spark.conf.set("spark.graft.lowCardAgg", "force")
      try f finally spark.conf.set("spark.graft.lowCardAgg", "off")
    }
    def h02full() = li.groupBy("l_returnflag", "l_linestatus")
      .agg(sum(col("l_quantity")).as("a"), sum(col("l_extendedprice")).as("b"),
        avg(col("l_discount")).as("c"), count(lit(1)).as("d"))
    def h06full() = li.groupBy("l_suppkey")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
    def h07full() = ev
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"), avg(col("value")).as("v"))
    // correctness + did-it-fire check before any timing. h02's TWO
    // string keys exceed the default string-key budget (measured at
    // parity with stock — the gate keeps the proven baseline there).
    Seq(("h02", h02full _, false), ("h06", h06full _, true),
        ("h07", h07full _, true))
      .foreach { case (name, f, expectFire) =>
        val base = f().collect().map(_.toString).sorted
        val forced = withForce {
          val df = f()
          val rows = df.collect().map(_.toString).sorted
          val plan = df.queryExecution.executedPlan.toString
          require(plan.contains("LowCardAgg") == expectFire,
            s"$name: expected fire=$expectFire:\n$plan")
          rows
        }
        require(base.sameElements(forced),
          s"$name MISMATCH:\nbase=${base.take(5).mkString("; ")}\n" +
          s"forced=${forced.take(5).mkString("; ")}")
        println(s"CHECK $name: ${base.length} groups identical, fire=$expectFire")
      }

    // pass-structure decomposition for the generic operator's h06 shape:
    // extract+hash+probe+2 agg loops vs the single-pass direct loop
    def h06passes(): Long = {
      val (iK, iQ) = (h06ix("l_suppkey"), h06ix("l_quantity"))
      h06scan.mapPartitions { it =>
        var tableBits = 12
        var table = Array.fill(1 << tableBits)(-1)
        var nG = 0
        var keyArr = new Array[Long](1024)
        var hashArr = new Array[Int](1024)
        var cnt = new Array[Long](1024)
        var sq = new Array[Double](1024)
        val cap = 8192
        val tmp = new Array[Long](cap); val hs = new Array[Int](cap)
        val gid = new Array[Int](cap)
        while (it.hasNext) {
          val b = it.next()
          val n = b.numRows()
          val k = b.column(iK); val q = b.column(iQ)
          var i = 0
          while (i < n) { tmp(i) = k.getLong(i); i += 1 }
          i = 0
          while (i < n) {
            val v = tmp(i); hs(i) = (17 * 31 + (v ^ (v >>> 32)).toInt) & 0x7fffffff
            i += 1
          }
          var mask = table.length - 1
          i = 0
          while (i < n) {
            val h = hs(i)
            var s = h & mask
            var g = -1
            var probing = true
            while (probing) {
              val t = table(s)
              if (t == -1) probing = false
              else if (hashArr(t) == h && keyArr(t) == tmp(i)) {
                g = t; probing = false
              } else s = (s + 1) & mask
            }
            if (g == -1) {
              if (nG == keyArr.length) {
                keyArr = java.util.Arrays.copyOf(keyArr, nG * 2)
                hashArr = java.util.Arrays.copyOf(hashArr, nG * 2)
                cnt = java.util.Arrays.copyOf(cnt, nG * 2)
                sq = java.util.Arrays.copyOf(sq, nG * 2)
              }
              g = nG; nG += 1
              keyArr(g) = tmp(i); hashArr(g) = h
              table(s) = g
              if (nG * 3 > table.length * 2) {
                tableBits += 1
                table = Array.fill(1 << tableBits)(-1)
                mask = table.length - 1
                var g2 = 0
                while (g2 < nG) {
                  var s2 = hashArr(g2) & mask
                  while (table(s2) != -1) s2 = (s2 + 1) & mask
                  table(s2) = g2
                  g2 += 1
                }
              }
            }
            gid(i) = g
            i += 1
          }
          i = 0
          while (i < n) { cnt(gid(i)) += 1; i += 1 }
          i = 0
          while (i < n) { sq(gid(i)) += q.getDouble(i); i += 1 }
        }
        Iterator.single(nG)
      }.collect().map(_.toLong).sum
    }

    // the LowCardAggIterator run standalone over the same batches —
    // separates iterator cost from exec/exchange integration cost
    def h06iter(): Long = {
      import graft.plans.LowCardAgg._
      import org.apache.spark.sql.types._
      val (iK, iQ) = (h06ix("l_suppkey"), h06ix("l_quantity"))
      h06scan.mapPartitions { it =>
        val rows = new graft.plans.LowCardAggIterator(it,
          Array((Get(iK, 8), LongType)),
          Array[AggSpec](CountStar, SumDouble(Get(iQ, 0))),
          Array(OutCol(0, 0, 0), OutCol(1, 0, 0), OutCol(1, 1, 0)),
          Array[DataType](LongType, LongType, DoubleType), 1 << 20)
        Iterator.single(rows.size.toLong)
      }.collect().sum
    }

    val variants: Seq[(String, () => Any)] = Seq(
      "h06_iter" -> (() => h06iter()),
      "h06_passes" -> (() => h06passes()),
      "h02_base" -> (() => h02base()),
      "h02_global" -> (() => h02global()),
      "h02_colbatch" -> (() => h02col()),
      "h06_base" -> (() => h06base()),
      "h06_global" -> (() => h06global()),
      "h06_colbatch" -> (() => h06col()),
      "h07_base" -> (() => h07base()),
      "h07_global" -> (() => h07global()),
      "h07_colbatch" -> (() => h07col()),
      "h02_lowcard" -> (() => withForce(h02base())),
      "h02_lowcard2" -> (() => {
        spark.conf.set("spark.graft.lowCardAgg.maxStringKeys", "2")
        try withForce(h02base())
        finally spark.conf.unset("spark.graft.lowCardAgg.maxStringKeys")
      }),
      "h06_lowcard" -> (() => withForce(h06base())),
      "h07_lowcard" -> (() => withForce(h07base())),
      "h03_base" -> (() => li.groupBy("l_partkey")
        .agg(count(lit(1)).as("n"), sum(col("l_extendedprice")).as("rev"))
        .orderBy(col("rev").desc).limit(10).count()),
      "h03_lowcard" -> (() => withForce(li.groupBy("l_partkey")
        .agg(count(lit(1)).as("n"), sum(col("l_extendedprice")).as("rev"))
        .orderBy(col("rev").desc).limit(10).count())))

    variants.foreach { case (_, f) => f() } // warm
    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (1 to reps).foreach { _ =>
      variants.foreach { case (name, f) =>
        val t0 = System.nanoTime(); f()
        samples(name) = samples(name) :+ (System.nanoTime() - t0) / 1e9
      }
    }
    val json = variants.map { case (name, _) =>
      val s = samples(name)
      f""""$name":{"min":${s.min}%.3f,"samples":[${s.map(x => f"$x%.3f").mkString(",")}]}"""
    }.mkString("{", ",", "}")
    println(s"COLAGG $json")
    spark.stop()
  }
}
