package graft

/** Post-processing for the DuckDB oracle SQL the driver replays.
  *
  * DuckDB inlines a CTE at every reference site unless told otherwise, so an
  * unrolled iterative chain (PageRank/HITS/classifier epochs, where step i
  * references step i-1 two or three times) re-evaluates the whole prefix
  * exponentially, and a staged expression pipeline re-runs its heavy
  * projection once per consumer. That made a handful of oracle arms cost
  * 15-200 s each in DuckDB — far past the driver's correctness-gate budget —
  * while the Spark side of the same queries runs in seconds. Forcing
  * single-evaluation with `AS MATERIALIZED` is a pure execution hint: the
  * relational result of every arm is unchanged (verified value-identical
  * over the full oracle set), but the heavy arms drop to well under a second.
  */
object OracleSql {

  // A CTE head is `<ident> AS (`. The only other `<ident> AS (` shape in
  // this dialect is a named-window definition (`WINDOW w AS (...)`,
  // optionally `, w2 AS (...)` continuing the list), which must not be
  // patched — the keyword shields the first definition here and
  // [[windowSpans]] shields the rest of the list.
  private val CteHead =
    """(?i)\b(window\s+)?([a-z_][a-z0-9_]*\s+as)\s*\(""".r

  private val WindowKw = """(?i)\bwindow\s+""".r

  /** Character spans of every WINDOW clause's FULL definition list —
    * `WINDOW w AS (…) , w2 AS (…) , …` — so the comma-continued
    * definitions are recognized as window, not CTE, heads. A balanced-
    * paren walk that skips single-quoted literals; a malformed tail just
    * ends the span early (protection is conservative, never unsound —
    * an over-wide span only leaves a CTE unmaterialized). */
  private def windowSpans(sql: String): Seq[(Int, Int)] = {
    def skipWs(i0: Int): Int = {
      var i = i0
      while (i < sql.length && sql.charAt(i).isWhitespace) i += 1
      i
    }
    def balancedEnd(open: Int): Int = {
      var i = open
      var depth = 0
      var inStr = false
      while (i < sql.length) {
        val c = sql.charAt(i)
        if (inStr) { if (c == '\'') inStr = false }
        else c match {
          case '\'' => inStr = true
          case '(' => depth += 1
          case ')' =>
            depth -= 1
            if (depth == 0) return i + 1
          case _ => ()
        }
        i += 1
      }
      sql.length
    }
    WindowKw.findAllMatchIn(sql).map { m =>
      var i = m.end
      var more = true
      while (more) {
        more = false
        var j = skipWs(i)
        while (j < sql.length &&
          (sql.charAt(j).isLetterOrDigit || sql.charAt(j) == '_')) j += 1
        val afterIdent = skipWs(j)
        if (j > i && afterIdent + 2 <= sql.length &&
          sql.regionMatches(true, afterIdent, "as", 0, 2)) {
          val afterAs = skipWs(afterIdent + 2)
          if (afterAs < sql.length && sql.charAt(afterAs) == '(') {
            i = balancedEnd(afterAs)
            val comma = skipWs(i)
            if (comma < sql.length && sql.charAt(comma) == ',') {
              i = comma + 1
              more = true
            }
          }
        }
      }
      (m.start, i)
    }.toSeq
  }

  /** Rewrite every CTE definition to `AS MATERIALIZED (`, leaving named
    * windows (including comma-continued multi-window lists) and
    * already-materialized CTEs untouched (the pattern cannot match
    * `AS MATERIALIZED (` because `materialized` is consumed as the
    * identifier and is then followed by `(` without a second `as`).
    */
  def materializeCtes(sql: String): String = {
    val shielded = windowSpans(sql)
    CteHead.replaceAllIn(sql, m =>
      scala.util.matching.Regex.quoteReplacement(
        if (m.group(1) != null ||
          shielded.exists(s => m.start >= s._1 && m.start < s._2)) m.matched
        else s"${m.group(2)} MATERIALIZED ("))
  }
}
