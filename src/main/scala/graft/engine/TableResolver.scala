package graft.engine

import SqlTokens._
import scala.collection.mutable.ArrayBuffer

/** Table-reference extraction + substitution (A3/A5).
  *
  * The reference BFS-walks the sqlglot AST collecting `exp.Table` nodes,
  * excluding CTE aliases, and fully qualifies them with session defaults
  * (`universql/protocol/session.py:139-149`, `universql/util.py:454-460`).
  * Here we scan the token stream: a table reference is an identifier chain
  * following FROM / JOIN (and not a CTE alias or a subquery). Matched
  * references resolved by the registry are substituted with their flat
  * temp-view names; unknown names pass through for Spark to resolve
  * (session temp views) or reject.
  */
object TableResolver {

  private val tableIntroducers = Set("FROM", "JOIN")
  // FROM <kw> ( … ) constructs that are not table names
  private val nonTables = Set("LATERAL", "UNNEST", "VALUES", "TABLE")

  def resolveAndSubstitute(sql: String, session: GraftSession): String = {
    val toks = lex(sql)
    val sig = significant(toks)
    val cteAliases = collectCteAliases(toks, sig)
    val out = ArrayBuffer.empty[Tok]
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      out += t
      t match {
        case Ident(kw) if tableIntroducers.contains(kw.toUpperCase) =>
          // substitute every table in the FROM list: t1 [alias], t2 …
          var expectTable = true
          var j = i + 1
          while (expectTable) {
            // copy whitespace
            while (j < toks.length && (toks(j).isInstanceOf[Ws] ||
                   toks(j).isInstanceOf[Comment])) { out += toks(j); j += 1 }
            if (j >= toks.length) expectTable = false
            else toks(j) match {
              case Ident(w) if nonTables.contains(w.toUpperCase) || w.toUpperCase == "SELECT" =>
                expectTable = false // leave as-is; subqueries handled on recursion
              case _: Ident | _: QIdent =>
                // identifier chain a.b.c
                val chainStart = j
                var k = j
                while (k + 2 < toks.length && toks(k + 1) == Op(".") &&
                       (toks(k + 2) match {
                         case _: Ident | _: QIdent => true; case _ => false }))
                  k += 2
                val chain = toks.slice(chainStart, k + 1)
                val name = render(chain)
                val isFnCall = k + 1 < toks.length && toks(k + 1) == Op("(")
                if (!isFnCall) {
                  val bare = chain.length == 1 && !cteAliases.contains(
                    Identifiers.normalizePart(name))
                  val qualified = chain.length > 1
                  // CHANGES ( INFORMATION => DEFAULT|APPEND_ONLY )
                  // directly after the table name — Snowflake's
                  // stream-semantics query over a time-travel span; the
                  // mandatory AT/BEFORE clause follows it
                  val changes: Option[(String, Int)] = {
                    var a = k + 1
                    while (a < toks.length && (toks(a).isInstanceOf[Ws] ||
                           toks(a).isInstanceOf[Comment])) a += 1
                    toks.lift(a) match {
                      case Some(Ident(w)) if w.equalsIgnoreCase("CHANGES") =>
                        var p = a + 1
                        while (p < toks.length && (toks(p).isInstanceOf[Ws] ||
                               toks(p).isInstanceOf[Comment])) p += 1
                        if (p < toks.length && toks(p) == Op("(")) {
                          var depth = 0; var q = p; var close = -1
                          while (q < toks.length && close < 0) {
                            toks(q) match {
                              case Op("(") => depth += 1
                              case Op(")") =>
                                depth -= 1; if (depth == 0) close = q
                              case _ =>
                            }
                            q += 1
                          }
                          if (close > p)
                            "(?is)INFORMATION\\s*=>\\s*(DEFAULT|APPEND_ONLY)".r
                              .findFirstMatchIn(render(toks.slice(p + 1, close)))
                              .map(m => (m.group(1).toUpperCase, close))
                          else None
                        } else None
                      case _ => None
                    }
                  }
                  // time-travel clause directly after the table name
                  // (or after its CHANGES clause):
                  // AT | BEFORE ( OFFSET|TIMESTAMP|STATEMENT => … )
                  val travel: Option[(String, String, Int)] = {
                    var a = changes.map(_._2 + 1).getOrElse(k + 1)
                    while (a < toks.length && (toks(a).isInstanceOf[Ws] ||
                           toks(a).isInstanceOf[Comment])) a += 1
                    toks.lift(a) match {
                      case Some(Ident(w))
                          if w.equalsIgnoreCase("AT") ||
                             w.equalsIgnoreCase("BEFORE") =>
                        var p = a + 1
                        while (p < toks.length && (toks(p).isInstanceOf[Ws] ||
                               toks(p).isInstanceOf[Comment])) p += 1
                        if (p < toks.length && toks(p) == Op("(")) {
                          var depth = 0; var q = p; var close = -1
                          while (q < toks.length && close < 0) {
                            toks(q) match {
                              case Op("(") => depth += 1
                              case Op(")") =>
                                depth -= 1; if (depth == 0) close = q
                              case _ =>
                            }
                            q += 1
                          }
                          if (close > p)
                            Some((w.toUpperCase,
                              render(toks.slice(p + 1, close)), close))
                          else None
                        } else None
                      case _ => None
                    }
                  }
                  // optional END ( TIMESTAMP|STATEMENT => … ) closing a
                  // CHANGES span at a historical version (Snowflake's
                  // full CHANGES grammar); only looked for right after
                  // the AT/BEFORE clause of a CHANGES query, so CASE…END
                  // never reaches here
                  val endClause: Option[(String, Int)] =
                    if (changes.isEmpty || travel.isEmpty) None
                    else {
                      var a = travel.get._3 + 1
                      while (a < toks.length && (toks(a).isInstanceOf[Ws] ||
                             toks(a).isInstanceOf[Comment])) a += 1
                      toks.lift(a) match {
                        case Some(Ident(w)) if w.equalsIgnoreCase("END") =>
                          var p = a + 1
                          while (p < toks.length && (toks(p).isInstanceOf[Ws] ||
                                 toks(p).isInstanceOf[Comment])) p += 1
                          if (p < toks.length && toks(p) == Op("(")) {
                            var depth = 0; var q = p; var close = -1
                            while (q < toks.length && close < 0) {
                              toks(q) match {
                                case Op("(") => depth += 1
                                case Op(")") =>
                                  depth -= 1; if (depth == 0) close = q
                                case _ =>
                              }
                              q += 1
                            }
                            if (close > p)
                              Some((render(toks.slice(p + 1, close)), close))
                            else None
                          } else None
                        case _ => None
                      }
                    }
                  var substituted = false
                  if (bare || qualified) {
                    val f = Identifiers.fullQualifier(name,
                      session.currentDatabase, session.currentSchema)
                    val resolved = (changes, travel) match {
                      case (Some((info, _)), Some((kind, spec, _))) =>
                        session.ensureChangesView(f, info, kind, spec,
                          endClause.map(_._1))
                      case (Some(_), None) =>
                        throw new IllegalArgumentException(
                          s"CHANGES on $name requires an AT or BEFORE clause")
                      case (None, Some((kind, spec, _))) =>
                        session.ensureAsOfView(f, kind, spec)
                      case (None, None) => session.ensureView(f)
                    }
                    resolved match {
                      case Some(flat) =>
                        out += Ident(flat); substituted = true
                      case None => out ++= chain
                    }
                  } else out ++= chain
                  j = (endClause, travel) match {
                    case (Some((_, close)), _) if substituted => close + 1
                    case (_, Some((_, _, close))) if substituted => close + 1
                    case _ => k + 1
                  }
                  // skip optional alias: [AS] ident
                  var j2 = j
                  while (j2 < toks.length && toks(j2).isInstanceOf[Ws]) j2 += 1
                  var hasAlias = false
                  if (j2 < toks.length) toks(j2) match {
                    case Ident(a) if a.equalsIgnoreCase("AS") =>
                      var j3 = j2 + 1
                      while (j3 < toks.length && toks(j3).isInstanceOf[Ws]) j3 += 1
                      if (j3 < toks.length) {
                        out ++= toks.slice(j, j3 + 1); j = j3 + 1; hasAlias = true
                      }
                    case Ident(a) if !SqlKeywords.reserved.contains(a.toUpperCase) =>
                      out ++= toks.slice(j, j2 + 1); j = j2 + 1; hasAlias = true
                    case _ =>
                  }
                  // a substituted unaliased table keeps its original name
                  // as an alias so `table.col` references still resolve
                  // (not when TABLESAMPLE follows — Spark's grammar puts
                  // the sample clause before the alias)
                  val nextIsSample = j2 < toks.length && (toks(j2) match {
                    case Ident(w) => w.equalsIgnoreCase("TABLESAMPLE")
                    case _ => false
                  })
                  if (substituted && !hasAlias && !nextIsSample) chain.last match {
                    case Ident(last) => out += Ws(" "); out += Ident(last)
                    case _ =>
                  }
                  // comma → another table in the FROM list
                  var j4 = j
                  while (j4 < toks.length && toks(j4).isInstanceOf[Ws]) j4 += 1
                  if (j4 < toks.length && toks(j4) == Op(",")) {
                    out ++= toks.slice(j, j4 + 1)
                    j = j4 + 1
                  } else expectTable = false
                } else { expectTable = false } // table function, leave alone
              case _ => expectTable = false
            }
          }
          i = math.max(j, i + 1)
        case _ => i += 1
      }
    }
    render(out.toSeq)
  }

  /** Aliases bound by WITH … AS ( … ) at any depth. */
  private def collectCteAliases(toks: Vector[Tok], sig: Vector[Int]): Set[String] = {
    val aliases = scala.collection.mutable.Set.empty[String]
    var s = 0
    while (s < sig.length) {
      toks(sig(s)) match {
        case Ident(w) if w.equalsIgnoreCase("WITH") =>
          // WITH [RECURSIVE] a AS ( … ), b AS ( … )
          var expectAlias = true
          var p = s + 1
          if (p < sig.length && (toks(sig(p)) match {
            case Ident(r) => r.equalsIgnoreCase("RECURSIVE"); case _ => false
          })) p += 1
          while (expectAlias && p + 1 < sig.length) {
            (toks(sig(p)), toks(sig(p + 1))) match {
              case (Ident(alias), Ident(as)) if as.equalsIgnoreCase("AS") =>
                aliases += Identifiers.normalizePart(alias)
                // skip to matching close paren of the CTE body
                var q = p + 2
                if (q < sig.length && toks(sig(q)) == Op("(")) {
                  var depth = 0
                  var done = false
                  while (q < sig.length && !done) {
                    toks(sig(q)) match {
                      case Op("(") => depth += 1
                      case Op(")") => depth -= 1; if (depth == 0) done = true
                      case _ =>
                    }
                    q += 1
                  }
                }
                // comma → another CTE
                if (q < sig.length && toks(sig(q)) == Op(",")) p = q + 1
                else { expectAlias = false; p = q }
              case _ => expectAlias = false
            }
          }
          s = p
        case _ => s += 1
      }
    }
    aliases.toSet
  }
}

object SqlKeywords {
  /** Keywords that cannot be a table alias (so the resolver stops). */
  val reserved: Set[String] = Set(
    "WHERE", "GROUP", "ORDER", "HAVING", "LIMIT", "OFFSET", "UNION", "ALL",
    "INTERSECT", "EXCEPT", "MINUS", "JOIN", "INNER", "LEFT", "RIGHT", "FULL",
    "CROSS", "NATURAL", "ON", "USING", "AS", "SELECT", "FROM", "WITH",
    "QUALIFY", "WINDOW", "LATERAL", "SEMI", "ANTI", "TABLESAMPLE", "SAMPLE",
    "PIVOT", "UNPIVOT", "SET", "VALUES", "RETURNING", "FETCH", "FOR", "ASOF",
    "MATCH_CONDITION")
}
