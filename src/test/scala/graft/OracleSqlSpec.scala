package graft

import org.scalatest.funsuite.AnyFunSuite

/** The CTE-materialization rewrite the oracle map passes through: every
  * CTE head gains AS MATERIALIZED; named windows — including the
  * comma-continued definitions after the first — never do. */
class OracleSqlSpec extends AnyFunSuite {

  test("CTE heads materialize; already-materialized stay; idempotent") {
    val in = "WITH a AS (SELECT 1), b AS MATERIALIZED (SELECT 2) SELECT *"
    val out = OracleSql.materializeCtes(in)
    assert(out ==
      "WITH a AS MATERIALIZED (SELECT 1), b AS MATERIALIZED (SELECT 2) SELECT *")
    assert(OracleSql.materializeCtes(out) == out, "must be idempotent")
  }

  test("a single named window is untouched") {
    val in = "SELECT sum(x) OVER w FROM t WINDOW w AS (PARTITION BY g ORDER BY x)"
    assert(OracleSql.materializeCtes(in) == in)
  }

  test("comma-continued multi-window lists are untouched end to end") {
    val in = "WITH c AS (SELECT 1) " +
      "SELECT sum(x) OVER w1, avg(y) OVER w2 FROM c " +
      "WINDOW w1 AS (PARTITION BY g), w2 AS (PARTITION BY h ORDER BY y), " +
      "w3 AS (ORDER BY z)"
    val out = OracleSql.materializeCtes(in)
    assert(out.contains("c AS MATERIALIZED (SELECT 1)"))
    assert(out.contains("w1 AS (PARTITION BY g)"), out)
    assert(out.contains("w2 AS (PARTITION BY h ORDER BY y)"), out)
    assert(out.contains("w3 AS (ORDER BY z)"), out)
    assert(!out.contains("w2 AS MATERIALIZED") &&
      !out.contains("w3 AS MATERIALIZED"), out)
  }

  test("a CTE after a window clause in a nested subquery still materializes") {
    val in = "WITH a AS (SELECT x, row_number() OVER w AS rn FROM t " +
      "WINDOW w AS (ORDER BY x)), b AS (SELECT * FROM a) SELECT * FROM b"
    val out = OracleSql.materializeCtes(in)
    assert(out.contains("a AS MATERIALIZED (SELECT"), out)
    assert(out.contains("w AS (ORDER BY x)"), out)
    assert(out.contains("b AS MATERIALIZED (SELECT * FROM a)"), out)
  }

  test("quoted literals containing parens do not derail the window walk") {
    val in = "SELECT regexp_replace(s, '(a)', ')(') OVER w FROM t " +
      "WINDOW w AS (PARTITION BY g), w2 AS (ORDER BY s)"
    val out = OracleSql.materializeCtes(in)
    assert(out == in, out)
  }
}
