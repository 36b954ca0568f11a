package graft.engine

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Grammar-based randomized differential fuzz of table STREAMs (CDC) —
  * the seventh fuzz family: random DML sequences against a COW table
  * with a STREAM on it; after each batch of statements the stream's
  * contents are checked against an INDEPENDENT multiset model.
  *
  * The independently-derivable CDC contract (Snowflake's documented
  * net-change semantics, no trust in the engine's pairing internals):
  *   rows(ACTION = INSERT)  ==  multiset(table_now  −  table_at_offset)
  *   rows(ACTION = DELETE)  ==  multiset(table_at_offset  −  table_now)
  * computed over FULL ROW VALUES (k,v,q,st). A row inserted then
  * deleted since the offset nets to nothing; an update nets to one
  * DELETE of the old value + one INSERT of the new. On top of that the
  * spec asserts ISUPDATE structure: ISUPDATE rows come in balanced
  * DELETE/INSERT pairs per key.
  *
  * Offset advancement (consumption) is exercised by CTAS-from-stream —
  * after a consume the model snapshot resets to the current table.
  */
class StreamFuzzSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private final case class Row(k: Long, vCents: Long, q: Int, st: String) {
    def render: String =
      s"$k|${new JBD(vCents).movePointLeft(2).setScale(2).toPlainString}|$q|$st"
  }

  test("random DML sequences: stream contents equal the multiset table diff") {
    val seed = sys.env.get("GRAFT_FUZZ_SEED")
      .orElse(sys.props.get("graft.fuzz.seed")).getOrElse("20260815").toLong
    val rnd = new scala.util.Random(seed)
    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))
    val s = new GraftSession(spark)
    s.attachLake("/root/testdata/sf0.001")

    val orders: Map[Long, (Double, String)] = spark.read
      .parquet("/root/testdata/sf0.001/orders.parquet")
      .selectExpr("o_orderkey", "o_totalprice", "o_orderstatus")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getString(2))))
      .toMap
    def cents(d: Double): Long =
      JBD.valueOf(d).setScale(2, RoundingMode.HALF_UP)
        .movePointRight(2).longValueExact()

    var checks = 0
    for (round <- 1 to 5) {
      val lim = 500
      s.sql(s"""CREATE OR REPLACE TABLE fzs AS
        SELECT o_orderkey AS k, o_totalprice::number(12,2) AS v,
          (o_orderkey % 53)::int AS q, o_orderstatus AS st
        FROM orders WHERE o_orderkey <= $lim""")
      s.sql("CREATE OR REPLACE STREAM fzs_st ON TABLE fzs")
      val model = scala.collection.mutable.Map.empty[Long, Row]
      orders.foreach { case (k, (tp, st0)) =>
        if (k <= lim) model(k) = Row(k, cents(tp), (k % 53).toInt, st0)
      }
      var snapshot: Map[Long, Row] = model.toMap // the stream offset
      var usedHi = lim.toLong

      def checkStream(step: String): Unit = {
        val rows = s.sql("""SELECT k, v::string AS v, q, st,
            METADATA$ACTION AS act, METADATA$ISUPDATE AS isu
          FROM fzs_st""").collect()
        val gotIns = rows.filter(_.getString(4) == "INSERT").map(r =>
          s"${r.getLong(0)}|${r.getString(1)}|${r.getInt(2)}|${r.getString(3)}")
          .sorted
        val gotDel = rows.filter(_.getString(4) == "DELETE").map(r =>
          s"${r.getLong(0)}|${r.getString(1)}|${r.getInt(2)}|${r.getString(3)}")
          .sorted
        // multiset diff over full row values (keys unique here, so a
        // key-indexed diff IS the multiset diff)
        val now = model
        val wantIns = now.collect { case (k, r)
          if !snapshot.get(k).contains(r) => r.render }.toArray.sorted
        val wantDel = snapshot.collect { case (k, r)
          if !now.get(k).contains(r) => r.render }.toArray.sorted
        assert(gotIns.sameElements(wantIns),
          s"stream INSERT rows diverged (seed=$seed round=$round $step)\n" +
            s" got:  ${gotIns.take(6).mkString(" ; ")}\n" +
            s" want: ${wantIns.take(6).mkString(" ; ")}")
        assert(gotDel.sameElements(wantDel),
          s"stream DELETE rows diverged (seed=$seed round=$round $step)\n" +
            s" got:  ${gotDel.take(6).mkString(" ; ")}\n" +
            s" want: ${wantDel.take(6).mkString(" ; ")}")
        // ISUPDATE structure: balanced DELETE/INSERT pairs per key
        val upd = rows.filter(_.getBoolean(5))
        val byKey = upd.groupBy(_.getLong(0))
        byKey.foreach { case (k, g) =>
          assert(g.count(_.getString(4) == "INSERT") ==
            g.count(_.getString(4) == "DELETE"),
            s"unbalanced ISUPDATE pair for key $k (seed=$seed round=$round $step)")
        }
        checks += 1
      }

      for (_ <- 1 to (3 + rnd.nextInt(3))) {
        val step = rnd.nextInt(5) match {
          case 0 => // append
            val hi = usedHi + 80 + rnd.nextInt(200)
            s.sql(s"""INSERT INTO fzs
              SELECT o_orderkey, o_totalprice::number(12,2),
                (o_orderkey % 53)::int, o_orderstatus
              FROM orders WHERE o_orderkey > $usedHi AND o_orderkey <= $hi""")
            orders.foreach { case (k, (tp, st0)) =>
              if (k > usedHi && k <= hi)
                model(k) = Row(k, cents(tp), (k % 53).toInt, st0)
            }
            usedHi = hi
            s"insert($hi)"
          case 1 => // COW update
            val m = 3 + rnd.nextInt(9)
            s.sql(s"UPDATE fzs SET q = q + 5, st = 'u' WHERE k % $m = 1")
            model.mapValuesInPlace { (k, r) =>
              if (k % m == 1) r.copy(q = r.q + 5, st = "u") else r }
            s"update(k%$m)"
          case 2 => // COW delete
            val m = 5 + rnd.nextInt(9)
            s.sql(s"DELETE FROM fzs WHERE k % $m = 2")
            model.filterInPlace((k, _) => k % m != 2)
            s"delete(k%$m)"
          case 3 => // value update touching v (decimal)
            val c = 20 + rnd.nextInt(40)
            s.sql(s"UPDATE fzs SET v = v + 2.25 WHERE q > $c")
            model.mapValuesInPlace { (_, r) =>
              if (r.q > c) r.copy(vCents = r.vCents + 225) else r }
            s"updatev(q>$c)"
          case _ => // consume: CTAS from the stream advances the offset
            s.sql("CREATE OR REPLACE TABLE fzs_sink AS SELECT * FROM fzs_st")
            snapshot = model.toMap
            "consume"
        }
        checkStream(step)
      }
      s.sql("DROP STREAM fzs_st")
      s.sql("DROP TABLE fzs")
    }
    assert(checks >= 15, s"only $checks stream checks exercised")
    s.sql("DROP TABLE IF EXISTS fzs_sink")
  }
}
