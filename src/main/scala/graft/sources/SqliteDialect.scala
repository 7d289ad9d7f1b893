package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQLite→Spark SQL dialect translation for the reference's own query
  * scripts (reference `queries.sql`, executed verbatim via
  * `sqlite3 movies.db < queries.sql` per reference `README.md`).
  *
  * A reference user's muscle memory is the untouched script; everything
  * in it already parses as Spark SQL except SQLite's aggregate
  * `GROUP_CONCAT(expr[, sep])` (reference `queries.sql:38`). That one is
  * rewritten to `concat_ws(sep, sort_array(collect_list(expr)))`:
  * SQLite's concatenation order is unspecified (insertion-order
  * arbitrary), so the translation canonicalizes to sorted order — the
  * same deterministic choice the native operator surface makes (A6,
  * `RelationalQueries.q3GroupConcat`).
  *
  * The rewrite is a real scanner, not a regex: it tracks parenthesis
  * depth and single-quoted literals (with SQLite's `''` escaping), so a
  * separator like `', '` — a comma inside quotes inside the argument
  * list — splits correctly.
  */
object SqliteDialect {

  /** Translate one SQLite statement to Spark SQL. */
  def translate(sql: String): String = rewriteGroupConcat(sql)

  /** Run a multi-statement SQLite script (split on `;`, like the
    * reference's runner `etl.py:304`), translating each statement.
    * Statements that are only comments/whitespace are skipped.
    *
    * Supported surface: reference-shaped scripts — no `;` inside string
    * literals or comments (the split is positional, mirroring the
    * reference runner's own limitation), and no GROUP_CONCAT nested
    * inside another GROUP_CONCAT's argument list (the rewriter recurses
    * on the text after a call, not within its arguments). The
    * reference's `queries.sql` satisfies both; a general SQLite dialect
    * layer would need a full lexer here, which this deliberately is not.
    */
  def runScript(spark: SparkSession, script: String): Seq[(String, DataFrame)] =
    script.split(";").map(_.trim).filter(stmtHasSql).toSeq
      .map(stmt => stmt -> spark.sql(translate(stmt)))

  /** True if the chunk contains anything beyond `--` comments/blank lines
    * (a script's trailing comment block is not a statement).
    */
  private def stmtHasSql(chunk: String): Boolean =
    chunk.linesIterator.map(_.trim)
      .exists(l => l.nonEmpty && !l.startsWith("--"))

  private val GroupConcat = "(?i)\\bGROUP_CONCAT\\s*\\(".r

  private def rewriteGroupConcat(sql: String): String =
    GroupConcat.findFirstMatchIn(sql) match {
      case None => sql
      case Some(m) =>
        val (args, end) = parseArgs(sql, m.end)
        val expr = args.head.trim
        val sep = args.lift(1).map(_.trim).getOrElse("','")
        val replacement = s"concat_ws($sep, sort_array(collect_list($expr)))"
        // Recurse for any further occurrences after this one.
        sql.substring(0, m.start) + replacement +
          rewriteGroupConcat(sql.substring(end))
    }

  /** Parse a parenthesized argument list starting just after the opening
    * `(` at `from`; returns (top-level comma-split args, index just past
    * the closing `)`).
    */
  private def parseArgs(sql: String, from: Int): (Seq[String], Int) = {
    val args = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 1
    var i = from
    while (depth > 0) {
      if (i >= sql.length)
        throw new IllegalArgumentException(
          s"unbalanced parentheses in GROUP_CONCAT: $sql")
      sql.charAt(i) match {
        case '\'' =>
          // single-quoted literal; SQLite escapes a quote by doubling it
          cur += '\''
          i += 1
          var closed = false
          while (!closed) {
            if (i >= sql.length)
              throw new IllegalArgumentException(
                s"unterminated string literal in GROUP_CONCAT: $sql")
            cur += sql.charAt(i)
            if (sql.charAt(i) == '\'') {
              if (i + 1 < sql.length && sql.charAt(i + 1) == '\'') {
                cur += '\''; i += 1
              } else closed = true
            }
            i += 1
          }
        case '(' => depth += 1; cur += '('; i += 1
        case ')' =>
          depth -= 1
          if (depth > 0) cur += ')'
          i += 1
        case ',' if depth == 1 =>
          args += cur.result(); cur.clear(); i += 1
        case c => cur += c; i += 1
      }
    }
    args += cur.result()
    (args.result(), i)
  }
}
