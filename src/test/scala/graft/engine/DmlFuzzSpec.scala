package graft.engine

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Grammar-based randomized differential fuzz of the DML surface — the
  * sixth fuzz family: random sequences of UPDATE / DELETE / MERGE /
  * INSERT against a file-granular COW table, checked after EVERY
  * statement against an INDEPENDENT in-memory model (a Scala map with
  * hand-written SQL semantics). The DT fuzz can't catch a Dml bug that
  * corrupts the table — its recompute oracle reads the same mutated
  * table — so this one re-implements the semantics outside Spark.
  *
  * Money stays DECIMAL(12,2) modeled as exact cents (casts replicate
  * Spark's double→decimal HALF_UP via BigDecimal.valueOf); the key is
  * unique by construction so MERGE never multi-matches; MERGE clause
  * lists exercise conditional MATCHED UPDATE/DELETE ordering and
  * conditional NOT MATCHED INSERT.
  */
class DmlFuzzSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private final class Row(var vCents: Long, var q: Int, var st: String)

  test("40+ random UPDATE/DELETE/MERGE/INSERT steps match an independent model") {
    val seed = sys.env.get("GRAFT_FUZZ_SEED")
      .orElse(sys.props.get("graft.fuzz.seed")).getOrElse("20260815").toLong
    val rnd = new scala.util.Random(seed)
    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))
    val s = new GraftSession(spark)
    s.attachLake("/root/testdata/sf0.001")

    // the orders slice both sides derive rows from (k is unique)
    val orders: Map[Long, (Double, String)] = spark.read
      .parquet("/root/testdata/sf0.001/orders.parquet")
      .selectExpr("o_orderkey", "o_totalprice", "o_orderstatus")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getString(2))))
      .toMap
    def cents(d: Double): Long =
      JBD.valueOf(d).setScale(2, RoundingMode.HALF_UP)
        .movePointRight(2).longValueExact()
    def render(c: Long): String =
      new JBD(c).movePointLeft(2).setScale(2).toPlainString

    var steps = 0
    for (round <- 1 to 4) {
      val lim = 600
      s.sql(s"""CREATE OR REPLACE TABLE fzd AS
        SELECT o_orderkey AS k, o_totalprice::number(12,2) AS v,
          (o_orderkey % 97)::int AS q, o_orderstatus AS st
        FROM orders WHERE o_orderkey <= $lim""")
      val model = scala.collection.mutable.Map.empty[Long, Row]
      orders.foreach { case (k, (tp, st0)) =>
        if (k <= lim) model(k) = new Row(cents(tp), (k % 97).toInt, st0)
      }
      var usedHi = lim.toLong

      def check(step: String): Unit = {
        val got = s.sql("SELECT k, v::string AS v, q, st FROM fzd ORDER BY k")
          .collect().map(r =>
            s"${r.getLong(0)}|${r.getString(1)}|${r.getInt(2)}|${r.getString(3)}")
        val want = model.toSeq.sortBy(_._1).map { case (k, r) =>
          s"$k|${render(r.vCents)}|${r.q}|${r.st}" }
        assert(got.length == want.length,
          s"row count ${got.length} vs ${want.length} (seed=$seed " +
            s"round=$round after $step)")
        got.zip(want).foreach { case (g, w) =>
          assert(g == w, s"seed=$seed round=$round after $step\n got=$g\n want=$w")
        }
        steps += 1
      }

      // predicates rendered identically for SQL and evaluated on the model
      def predPair(): (String, (Long, Row) => Boolean) = rnd.nextInt(5) match {
        case 0 => val m = 3 + rnd.nextInt(9); val r = rnd.nextInt(m)
          (s"k % $m = $r", (k, _) => k % m == r)
        case 1 => val c = 20 + rnd.nextInt(60)
          (s"q > $c", (_, row) => row.q > c)
        case 2 => val st = pick(Seq("O", "F", "P", "u", "m"))
          (s"st = '$st'", (_, row) => row.st == st)
        case 3 => val c = 50000 + rnd.nextInt(150000)
          (s"v > $c", (_, row) => row.vCents > c * 100L)
        case _ => val a = rnd.nextInt(500); val b = a + 50 + rnd.nextInt(300)
          (s"k BETWEEN $a AND $b", (k, _) => k >= a && k <= b)
      }

      for (_ <- 1 to (8 + rnd.nextInt(4))) {
        rnd.nextInt(4) match {
          case 0 => // UPDATE
            val (ps, pf) = predPair()
            rnd.nextInt(4) match {
              case 0 =>
                val c = 1 + rnd.nextInt(20)
                s.sql(s"UPDATE fzd SET q = q + $c WHERE $ps")
                model.foreach { case (k, r) => if (pf(k, r)) r.q += c }
                check(s"update q+$c where $ps")
              case 1 =>
                s.sql(s"UPDATE fzd SET v = v + 10.50 WHERE $ps")
                model.foreach { case (k, r) => if (pf(k, r)) r.vCents += 1050 }
                check(s"update v where $ps")
              case 2 =>
                val st = pick(Seq("u", "z"))
                s.sql(s"UPDATE fzd SET st = '$st' WHERE $ps")
                model.foreach { case (k, r) => if (pf(k, r)) r.st = st }
                check(s"update st='$st' where $ps")
              case _ =>
                s.sql(s"UPDATE fzd SET q = q * 2, st = 'd' WHERE $ps")
                model.foreach { case (k, r) =>
                  if (pf(k, r)) { r.q *= 2; r.st = "d" } }
                check(s"update multi where $ps")
            }
          case 1 => // DELETE
            val (ps, pf) = predPair()
            s.sql(s"DELETE FROM fzd WHERE $ps")
            model.filterInPlace((k, r) => !pf(k, r))
            check(s"delete where $ps")
          case 2 => // INSERT a fresh key window (stays unique)
            val hi = usedHi + 100 + rnd.nextInt(300)
            s.sql(s"""INSERT INTO fzd
              SELECT o_orderkey, o_totalprice::number(12,2),
                (o_orderkey % 97)::int, o_orderstatus
              FROM orders WHERE o_orderkey > $usedHi AND o_orderkey <= $hi""")
            orders.foreach { case (k, (tp, st0)) =>
              if (k > usedHi && k <= hi)
                model(k) = new Row(cents(tp), (k % 97).toInt, st0)
            }
            usedHi = hi
            check(s"insert($hi)")
          case _ => // MERGE: overlapping window, random clause list
            val a = rnd.nextInt(usedHi.toInt)
            val b = a + 100 + rnd.nextInt(400)
            val srcSql = s"""(SELECT o_orderkey AS k,
                (o_totalprice + 5)::number(12,2) AS v,
                (o_orderkey % 89)::int AS q, 'm' AS st
              FROM orders WHERE o_orderkey > $a AND o_orderkey <= $b)"""
            // source rows in model form
            val src = orders.collect { case (k, (tp, _)) if k > a && k <= b =>
              k -> ((cents(tp + 5.0), (k % 89).toInt)) }
            val qBar = 20 + rnd.nextInt(50)
            val clause = rnd.nextInt(3)
            val (whenSql, applyMatched) = clause match {
              case 0 =>
                (s"""WHEN MATCHED AND s.q > t.q THEN UPDATE SET v = s.v, q = s.q
                    WHEN MATCHED THEN UPDATE SET q = t.q + 1""",
                  (r: Row, sv: Long, sq: Int) =>
                    if (sq > r.q) { r.vCents = sv; r.q = sq; true }
                    else { r.q += 1; true })
              case 1 =>
                (s"""WHEN MATCHED AND s.q < $qBar THEN DELETE
                    WHEN MATCHED THEN UPDATE SET v = s.v""",
                  (r: Row, sv: Long, sq: Int) =>
                    if (sq < qBar) false // delete
                    else { r.vCents = sv; true })
              case _ =>
                (s"WHEN MATCHED THEN DELETE",
                  (_: Row, _: Long, _: Int) => false)
            }
            val insCond = rnd.nextBoolean()
            val insSql =
              if (insCond) s"WHEN NOT MATCHED AND s.q < $qBar THEN " +
                "INSERT (k, v, q, st) VALUES (s.k, s.v, s.q, s.st)"
              else "WHEN NOT MATCHED THEN " +
                "INSERT (k, v, q, st) VALUES (s.k, s.v, s.q, s.st)"
            s.sql(s"MERGE INTO fzd t USING $srcSql s ON t.k = s.k\n" +
              whenSql + "\n" + insSql)
            // NOT MATCHED inserts may extend the key range past usedHi —
            // later INSERT windows must not re-add those keys (the table
            // would hold duplicates while the model map overwrites)
            usedHi = math.max(usedHi, b.toLong)
            src.foreach { case (k, (sv, sq)) =>
              model.get(k) match {
                case Some(r) => if (!applyMatched(r, sv, sq)) model.remove(k)
                case None =>
                  if (!insCond || sq < qBar)
                    model(k) = new Row(sv, sq, "m")
              }
            }
            check(s"merge($a,$b,clause=$clause,insCond=$insCond)")
        }
      }
      s.sql("DROP TABLE fzd")
    }
    assert(steps >= 32, s"only $steps DML steps exercised")
  }
}
