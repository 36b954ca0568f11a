package graft.engine

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Grammar-based randomized differential fuzz of the Iceberg snapshot
  * LIFECYCLE — the ninth fuzz family. DmlFuzzSpec pins single-statement
  * DML semantics on a plain COW table; this one drives the full
  * metadata-addressed lifecycle on an ICEBERG table: random
  * interleavings of append / COW UPDATE / DELETE / OPTIMIZE
  * (compaction) / ALTER ADD|DROP COLUMN (metadata-only evolution) /
  * EXPIRE SNAPSHOTS, with THREE oracles:
  *
  *   1. current state: after EVERY step the table equals an independent
  *      in-memory model (cents-exact decimals, DmlFuzzSpec discipline);
  *   2. snapshot immutability: after mutating steps the (qid, rendered
  *      model state) pair is remembered, and at random points re-read
  *      via `AT(STATEMENT => qid)` — later DML, compaction, and column
  *      DROP/re-ADD must never change what a pinned snapshot shows
  *      (the name-based field-id semantics snow54/55 pin as gates, here
  *      under random interleaving);
  *   3. retention: after EXPIRE SNAPSHOTS every pre-expire travel point
  *      must fail LOUDLY ("time travel data is not available" — the
  *      expired dirs are reclaimed, never silently re-read), while the
  *      current state keeps reading.
  */
class IcebergFuzzSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private final class Row(var vCents: Long, val q: Int,
      var tag: Option[String])

  test("random append/DML/compact/evolve/expire lifecycle holds 3 oracles") {
    val seed = sys.env.get("GRAFT_FUZZ_SEED")
      .orElse(sys.props.get("graft.fuzz.seed")).getOrElse("20260816").toLong
    val rnd = new scala.util.Random(seed)
    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))
    val s = new GraftSession(spark)
    s.attachLake("/root/testdata/sf0.001")

    val orders: Map[Long, Double] = spark.read
      .parquet("/root/testdata/sf0.001/orders.parquet")
      .selectExpr("o_orderkey", "o_totalprice")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def cents(d: Double): Long =
      JBD.valueOf(d).setScale(2, RoundingMode.HALF_UP)
        .movePointRight(2).longValueExact()
    def money(c: Long): String =
      new JBD(c).movePointLeft(2).setScale(2).toPlainString

    var steps = 0
    for (round <- 1 to 3) {
      s.sql("""CREATE OR REPLACE ICEBERG TABLE fzi AS
        SELECT o_orderkey AS k, o_totalprice::number(12,2) AS v,
          (o_orderkey % 97)::int AS q
        FROM orders WHERE o_orderkey <= 400""")
      val model = scala.collection.mutable.Map.empty[Long, Row]
      orders.foreach { case (k, tp) =>
        if (k <= 400) model(k) = new Row(cents(tp), (k % 97).toInt, None)
      }
      var hasTag = false
      // unused key chunks for appends (orders keys are sparse: %4==0 up
      // in the generator? no — just take whatever exists in the slice)
      val pool = scala.collection.mutable.Queue(
        orders.keys.filter(k => k > 400 && k <= 2400).toSeq.sorted
          .grouped(60).toSeq: _*)

      def cols: Seq[String] =
        Seq("k", "v::string AS v", "q") ++ (if (hasTag) Seq("tag") else Nil)
      def renderModel(withTag: Boolean): Vector[String] =
        model.toVector.sortBy(_._1).map { case (k, r) =>
          s"$k|${money(r.vCents)}|${r.q}" +
            (if (withTag) "|" + r.tag.getOrElse("NULL") else "")
        }
      def renderDf(sql: String, withTag: Boolean): Vector[String] =
        s.sql(sql).collect().toVector.map { r =>
          s"${r.getLong(0)}|${r.getString(1)}|${r.getInt(2)}" +
            (if (withTag) "|" +
              (if (r.isNullAt(3)) "NULL" else r.getString(3))
             else "")
        }
      def check(step: String): Unit = {
        val got =
          renderDf(s"SELECT ${cols.mkString(", ")} FROM fzi ORDER BY k",
            hasTag)
        val want = renderModel(hasTag)
        assert(got.length == want.length,
          s"rows ${got.length} vs ${want.length} (seed=$seed round=$round " +
            s"after $step)")
        got.zip(want).foreach { case (g, w) =>
          assert(g == w,
            s"seed=$seed round=$round after $step\n got=$g\n want=$w")
        }
        steps += 1
      }

      // remembered travel points: (qid, select list, expected rendering)
      val travel =
        scala.collection.mutable.ArrayBuffer.empty[(String, String, Vector[String], Boolean)]
      def capture(): Unit = {
        val qid = s.sql("SELECT LAST_QUERY_ID()").collect()(0).getString(0)
        travel += ((qid, cols.mkString(", "), renderModel(hasTag), hasTag))
      }
      def checkTravel(): Unit = if (travel.nonEmpty) {
        val (qid, sel, want, withTag) = pick(travel.toSeq)
        val got = renderDf(
          s"SELECT $sel FROM fzi AT(STATEMENT => '$qid') ORDER BY k", withTag)
        assert(got == want,
          s"seed=$seed round=$round travel to $qid drifted:\n" +
            s" got=${got.take(4).mkString(" ; ")}\n" +
            s" want=${want.take(4).mkString(" ; ")}")
      }

      for (step <- 1 to 18) {
        // steps 5/12 force the rare ops so every seed covers evolution
        // and retention at least once per round; the rest stay random
        val op =
          if (step == 5 && !hasTag) "addtag"
          else if (step == 12 && travel.nonEmpty) "expire"
          else rnd.nextInt(12) match {
            case 0 | 1 if pool.nonEmpty => "insert"
            case 2 | 3 | 4 => "update"
            case 5 | 6 => "delete"
            case 7 => "optimize"
            case 8 => if (hasTag) "droptag" else "addtag"
            case 9 if travel.nonEmpty => "expire"
            case _ => "update"
          }
        op match {
          case "insert" =>
            val keys = pool.dequeue()
            val (lo, hi) = (keys.min, keys.max)
            val tagSel =
              if (hasTag) ", CASE WHEN o_orderkey % 3 = 0 THEN 'T' END"
              else ""
            s.sql(s"""INSERT INTO fzi
              SELECT o_orderkey, o_totalprice::number(12,2),
                (o_orderkey % 97)::int$tagSel
              FROM orders WHERE o_orderkey >= $lo AND o_orderkey <= $hi""")
            keys.foreach { k =>
              model(k) = new Row(cents(orders(k)), (k % 97).toInt,
                if (hasTag && k % 3 == 0) Some("T") else None)
            }
            check(s"insert[$lo..$hi]"); capture()
          case "update" =>
            val m = 2 + rnd.nextInt(6); val r = rnd.nextInt(m)
            if (hasTag && rnd.nextInt(3) == 0) {
              val t = s"u$r"
              s.sql(s"UPDATE fzi SET tag = '$t' WHERE k % $m = $r")
              model.foreach { case (k, row) =>
                if (k % m == r) row.tag = Some(t)
              }
              check(s"update-tag %$m=$r")
            } else {
              val deltaCents = pick(Seq(125L, -250L, 999L, -101L))
              s.sql(s"UPDATE fzi SET v = v + ${money(deltaCents)} " +
                s"WHERE k % $m = $r")
              model.foreach { case (k, row) =>
                if (k % m == r) row.vCents += deltaCents
              }
              check(s"update %$m=$r by $deltaCents")
            }
            capture()
          case "delete" =>
            val m = 3 + rnd.nextInt(5); val r = rnd.nextInt(m)
            s.sql(s"DELETE FROM fzi WHERE k % $m = $r AND k > 400")
            model.filterInPlace((k, _) => !(k % m == r && k > 400))
            check(s"delete %$m=$r"); capture()
          case "optimize" =>
            s.sql("OPTIMIZE fzi")
            check("optimize"); capture()
          case "addtag" =>
            s.sql("ALTER TABLE fzi ADD COLUMN tag VARCHAR")
            hasTag = true
            model.values.foreach(_.tag = None)
            check("add tag")
          case "droptag" =>
            s.sql("ALTER TABLE fzi DROP COLUMN tag")
            hasTag = false
            check("drop tag")
          case "expire" =>
            val stale = rnd.shuffle(travel.toSeq).take(2)
            s.sql("ALTER TABLE fzi EXPIRE SNAPSHOTS")
            stale.foreach { case (qid, sel, _, withTag) =>
              val e = intercept[Exception] {
                renderDf(s"SELECT $sel FROM fzi AT(STATEMENT => '$qid') " +
                  "ORDER BY k", withTag)
              }
              assert(e.getMessage != null &&
                e.getMessage.contains("time travel data is not available"),
                s"seed=$seed: expired travel to $qid failed with an " +
                  s"unexpected error: ${e.getMessage}")
            }
            travel.clear()
            check("expire"); capture()
        }
        if (rnd.nextInt(3) == 0) checkTravel()
      }
      checkTravel()
    }
    assert(steps >= 50, s"only $steps lifecycle checks ran")
  }
}
