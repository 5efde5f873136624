package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-17 `Queries.normalize` CTE-materialization scanner:
  * insertion sites must match the r16 regex exactly on the live oracle
  * corpus (the 279 driver-compared strings), while the failure classes
  * the r16 regex had — multi-window WINDOW clauses, any non-CTE
  * `ident AS (` outside a WITH prologue — must now be untouched.
  */
class NormalizeSpec extends AnyFunSuite {

  /** The r16 rewrite, kept verbatim as the equivalence reference. */
  private def r16Rewrite(collapsedRaw: String): String =
    collapsedRaw.replaceAll(
      "(?<!WINDOW )\\b([A-Za-z_][A-Za-z0-9_]*) AS \\(",
      "$1 AS MATERIALIZED (")

  test("scanner output is byte-identical to the r16 regex on every live oracle") {
    val normalized = Queries.oracleSql
    assert(normalized.nonEmpty)
    normalized.foreach { case (name, sql) =>
      assert(!sql.contains("MATERIALIZED MATERIALIZED"),
        s"$name double-inserted")
      // recover the collapsed raw string (no oracle uses the literal
      // keyword itself), then re-apply the r16 regex
      val raw = sql.replace(" AS MATERIALIZED (", " AS (")
      assert(r16Rewrite(raw) == sql,
        s"$name: scanner and r16 regex disagree")
    }
  }

  test("every WITH-prologue CTE is materialized in every live oracle") {
    Queries.oracleSql.foreach { case (name, sql) =>
      if (sql.contains("WITH "))
        assert(sql.contains("AS MATERIALIZED ("),
          s"$name has a WITH clause but no materialized CTE")
    }
  }

  test("multi-window WINDOW clause is NOT rewritten (r16 regex failure class)") {
    val sql = """SELECT sum(x) OVER w1, avg(x) OVER w2 FROM t
                 WINDOW w1 AS (PARTITION BY a), w2 AS (PARTITION BY b)
                 ORDER BY 1"""
    assert(!Queries.normalize(sql).contains("MATERIALIZED"))
  }

  test("WINDOW clause after a CTE: CTE rewritten, both windows untouched") {
    val sql = """WITH c AS (SELECT * FROM t)
                 SELECT sum(x) OVER w1, min(x) OVER w2 FROM c
                 WINDOW w1 AS (ORDER BY x), w2 AS (ORDER BY y) ORDER BY 1"""
    val out = Queries.normalize(sql)
    assert(out.contains("c AS MATERIALIZED (SELECT"))
    assert(!out.contains("w1 AS MATERIALIZED"))
    assert(!out.contains("w2 AS MATERIALIZED"))
  }

  test("chained CTEs all rewritten; nested WITH inside a body rewritten") {
    val sql = """WITH a AS (SELECT 1 AS x),
                      b AS (WITH inner_q AS (SELECT 2 AS y) SELECT * FROM inner_q)
                 SELECT * FROM a, b ORDER BY 1"""
    val out = Queries.normalize(sql)
    assert(out.contains("a AS MATERIALIZED ("))
    assert(out.contains("b AS MATERIALIZED ("))
    assert(out.contains("inner_q AS MATERIALIZED ("))
  }

  test("WITH RECURSIVE is rewritten (r16 behavior preserved)") {
    val sql = """WITH RECURSIVE r AS (SELECT 1 AS n UNION SELECT n+1 FROM r WHERE n < 3)
                 SELECT * FROM r ORDER BY n"""
    assert(Queries.normalize(sql).contains("r AS MATERIALIZED ("))
  }

  test("column-list CTE is skipped (byte-compat with r16)") {
    val sql = "WITH q(a, b) AS (SELECT 1, 2) SELECT * FROM q ORDER BY a"
    assert(!Queries.normalize(sql).contains("MATERIALIZED"))
  }

  test("unbalanced paren inside a string literal does not break the walk " +
    "(r17 ADVICE)") {
    val sql = """WITH a AS (SELECT regexp_extract(text, '[(]') AS p FROM t),
                      b AS (SELECT * FROM a)
                 SELECT * FROM b ORDER BY 1"""
    val out = Queries.normalize(sql)
    assert(out.contains("a AS MATERIALIZED ("))
    assert(out.contains("b AS MATERIALIZED ("), // r17 bug: b was missed
      out)
  }

  test("'WITH x AS (' inside a string literal is not a prologue (r17 ADVICE)") {
    val sql = """SELECT 'WITH x AS (' AS s FROM t ORDER BY 1"""
    assert(!Queries.normalize(sql).contains("MATERIALIZED"))
  }

  test("escaped '' quote inside a literal keeps the literal region closed") {
    val sql = """WITH a AS (SELECT 'it''s a ) paren' AS s FROM t),
                      b AS (SELECT * FROM a)
                 SELECT * FROM b ORDER BY 1"""
    val out = Queries.normalize(sql)
    assert(out.contains("a AS MATERIALIZED ("))
    assert(out.contains("b AS MATERIALIZED ("))
  }
}
