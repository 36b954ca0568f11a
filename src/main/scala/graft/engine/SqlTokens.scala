package graft.engine

import scala.collection.mutable.ArrayBuffer

/** Minimal SQL lexer for the dialect-translation layer.
  *
  * The reference parses with sqlglot's full Snowflake dialect; no Scala
  * equivalent exists, so we lex into a token stream and run targeted
  * rewrites over it (SURVEY §7.4 item 1 scopes this to the exercised
  * surface). The lexer must be exact about string/identifier quoting so
  * rewrites never corrupt literals.
  */
object SqlTokens {

  sealed trait Tok { def text: String }
  /** Unquoted identifier or keyword. */
  final case class Ident(text: String) extends Tok
  /** Double-quoted identifier, text includes the quotes. */
  final case class QIdent(text: String) extends Tok
  /** Single-quoted string literal, text includes the quotes. */
  final case class Str(text: String) extends Tok {
    def value: String = text.substring(1, text.length - 1).replace("''", "'")
  }
  final case class Num(text: String) extends Tok
  /** Operator / punctuation, e.g. `::`, `(`, `,`, `=>`. */
  final case class Op(text: String) extends Tok
  final case class Ws(text: String) extends Tok
  final case class Comment(text: String) extends Tok

  private val multiOps = Seq("::", "||", "<=", ">=", "<>", "!=", "=>", "->>", "->")

  def lex(sql: String): Vector[Tok] = {
    val out = ArrayBuffer.empty[Tok]
    var i = 0
    val n = sql.length
    while (i < n) {
      val c = sql.charAt(i)
      if (c.isWhitespace) {
        val j = consumeWhile(sql, i, _.isWhitespace)
        out += Ws(sql.substring(i, j)); i = j
      } else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
        var j = i
        while (j < n && sql.charAt(j) != '\n') j += 1
        out += Comment(sql.substring(i, j)); i = j
      } else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') {
        var j = i + 2
        while (j + 1 < n && !(sql.charAt(j) == '*' && sql.charAt(j + 1) == '/')) j += 1
        val end = math.min(j + 2, n)
        out += Comment(sql.substring(i, end)); i = end
      } else if (c == '\'') {
        var j = i + 1
        var done = false
        while (j < n && !done) {
          if (sql.charAt(j) == '\'') {
            if (j + 1 < n && sql.charAt(j + 1) == '\'') j += 2
            else { done = true; j += 1 }
          } else j += 1
        }
        out += Str(sql.substring(i, j)); i = j
      } else if (c == '"') {
        var j = i + 1
        var done = false
        while (j < n && !done) {
          if (sql.charAt(j) == '"') {
            if (j + 1 < n && sql.charAt(j + 1) == '"') j += 2
            else { done = true; j += 1 }
          } else j += 1
        }
        out += QIdent(sql.substring(i, j)); i = j
      } else if (c == '`') {
        // Spark backtick-quoted identifier (emitted by our own rewrite
        // passes for non-plain column names): one atomic token, so later
        // passes can never rewrite fragments inside it. `` escapes `.
        var j = i + 1
        var done = false
        while (j < n && !done) {
          if (sql.charAt(j) == '`') {
            if (j + 1 < n && sql.charAt(j + 1) == '`') j += 2
            else { done = true; j += 1 }
          } else j += 1
        }
        out += Ident(sql.substring(i, j)); i = j
      } else if (c.isDigit || (c == '.' && i + 1 < n && sql.charAt(i + 1).isDigit)) {
        var j = i
        while (j < n && (sql.charAt(j).isDigit || sql.charAt(j) == '.' ||
               sql.charAt(j) == 'e' || sql.charAt(j) == 'E' ||
               ((sql.charAt(j) == '+' || sql.charAt(j) == '-') && j > i &&
                (sql.charAt(j - 1) == 'e' || sql.charAt(j - 1) == 'E')))) j += 1
        out += Num(sql.substring(i, j)); i = j
      } else if (c.isLetter || c == '_' || c == '$' || c == '@') {
        // '@' starts a stage reference (@stage/path); keep path chars in it
        if (c == '@') {
          val j = consumeWhile(sql, i,
            ch => ch.isLetterOrDigit || "_$./-@".contains(ch))
          out += Ident(sql.substring(i, j)); i = j
        } else {
          val j = consumeWhile(sql, i,
            ch => ch.isLetterOrDigit || ch == '_' || ch == '$')
          out += Ident(sql.substring(i, j)); i = j
        }
      } else {
        multiOps.find(op => sql.startsWith(op, i)) match {
          case Some(op) => out += Op(op); i += op.length
          case None     => out += Op(c.toString); i += 1
        }
      }
    }
    out.toVector
  }

  private def consumeWhile(s: String, from: Int, p: Char => Boolean): Int = {
    var j = from
    while (j < s.length && p(s.charAt(j))) j += 1
    j
  }

  def render(toks: Seq[Tok]): String = toks.map(_.text).mkString

  /** Indices of non-whitespace/comment tokens. */
  def significant(toks: Vector[Tok]): Vector[Int] =
    toks.indices.toVector.filter(i => toks(i) match {
      case _: Ws | _: Comment => false
      case _ => true
    })

  /** Split a statement batch on top-level semicolons. */
  def splitStatements(sql: String): Seq[String] = {
    val toks = lex(sql)
    val stmts = ArrayBuffer.empty[String]
    val cur = ArrayBuffer.empty[Tok]
    toks.foreach {
      case Op(";") =>
        val s = render(cur.toSeq).trim
        if (s.nonEmpty) stmts += s
        cur.clear()
      case t => cur += t
    }
    val last = render(cur.toSeq).trim
    if (last.nonEmpty) stmts += last
    stmts.toSeq
  }
}
