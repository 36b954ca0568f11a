package graft.engine

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based identifier semantics, porting the shape of the
  * reference's `tests/integration/object_identifiers.py` cartesian suite:
  * every case variant of an unquoted identifier resolves to the same FQN;
  * quoting round-trips exactly. (Plain ScalaCheck Gen sampling — the
  * scalatest/scalacheck bridge artifact isn't in the offline dep set.) */
class IdentifierPropsSpec extends AnyFunSuite {

  private val identGen: Gen[String] = for {
    head <- Gen.alphaChar
    tail <- Gen.listOfN(7, Gen.frequency(
      (8, Gen.alphaNumChar), (1, Gen.const('_'))))
  } yield (head :: tail).mkString

  private def samples(n: Int): Seq[String] =
    (0 until n).flatMap(i => identGen.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("unquoted identifiers are case-insensitive") {
    samples(200).foreach { name =>
      val variants = Seq(name.toLowerCase, name.toUpperCase, name.capitalize)
      val resolved = variants.map(v => Identifiers.fullQualifier(v, "db", "sch"))
      assert(resolved.distinct.size == 1, s"variants of $name diverge")
    }
  }

  test("quoted identifiers preserve exact case and round-trip") {
    samples(200).foreach { name =>
      val mixed = name.zipWithIndex.map { case (c, i) =>
        if (i % 2 == 0) c.toUpper else c.toLower }.mkString
      val f = Identifiers.fullQualifier("\"" + mixed + "\"", "db", "sch")
      assert(f.table == mixed)
    }
  }

  test("quoted upper equals unquoted any-case") {
    samples(200).foreach { name =>
      val quoted = Identifiers.fullQualifier("\"" + name.toUpperCase + "\"", "db", "sch")
      val bare = Identifiers.fullQualifier(name.toLowerCase, "db", "sch")
      assert(quoted == bare)
    }
  }

  test("qualification levels compose with session defaults") {
    val trip = samples(300)
    trip.grouped(3).filter(_.size == 3).foreach { case Seq(d, s, t) =>
      assert(Identifiers.fullQualifier(s"$d.$s.$t", "DB0", "SCH0") ==
        FQN(d.toUpperCase, s.toUpperCase, t.toUpperCase))
      assert(Identifiers.fullQualifier(s"$s.$t", "DB0", "SCH0") ==
        FQN("DB0", s.toUpperCase, t.toUpperCase))
      assert(Identifiers.fullQualifier(t, "DB0", "SCH0") ==
        FQN("DB0", "SCH0", t.toUpperCase))
    }
  }

  test("flat view names are legal spark identifiers") {
    samples(300).grouped(3).filter(_.size == 3).foreach { case Seq(d, s, t) =>
      assert(FQN(d, s, t).flat.matches("[A-Za-z0-9_]+"))
    }
  }
}
