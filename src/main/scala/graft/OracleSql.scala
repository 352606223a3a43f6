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
  // this dialect is a named window (`WINDOW w AS (PARTITION BY ...)`),
  // which must not be patched — hence the optional WINDOW-keyword capture.
  private val CteHead =
    """(?i)\b(window\s+)?([a-z_][a-z0-9_]*\s+as)\s*\(""".r

  /** Rewrite every CTE definition to `AS MATERIALIZED (`, leaving named
    * windows and already-materialized CTEs untouched (the pattern cannot
    * match `AS MATERIALIZED (` because `materialized` is consumed as the
    * identifier and is then followed by `(` without a second `as`).
    */
  def materializeCtes(sql: String): String =
    CteHead.replaceAllIn(sql, m =>
      scala.util.matching.Regex.quoteReplacement(
        if (m.group(1) != null) m.matched
        else s"${m.group(2)} MATERIALIZED ("))
}
