package graft

import org.scalatest.funsuite.AnyFunSuite

/** Lint over every `SparkEntry.oracleSql` entry: the CTE-materialization
  * discipline that keeps the DuckDB gate's cost linear in the chain
  * instead of exponential in its fan-out.
  *
  * Round-8/9 lesson (see Oracles8/9 scaladoc): DuckDB inlines CTEs at
  * every reference, so a CTE referenced >= 2x re-executes its whole
  * upstream chain per reference — in unrolled round chains that is
  * 3^rounds re-expansions (wordpiece_fit measured 163 s -> 0.09 s at
  * sf0.001 when marked). Round 10 applies the rule board-wide and
  * this spec keeps it applied: every CTE with >= 2 downstream
  * FROM/JOIN references must carry `AS MATERIALIZED`.
  *
  * Exemptions, each structural rather than allowlisted:
  *   - recursive CTEs (self-referencing bodies) cannot materialize;
  *   - window definitions (`WINDOW w AS (PARTITION BY ...)`) are not
  *     CTEs;
  *   - names defined MORE THAN ONCE in a statement (composed chains
  *     shadowing short names) — DuckDB's binder rejects duplicate
  *     MATERIALIZED aliases, so SparkEntry.demoteShadowedMaterialized
  *     strips the keyword from exactly those definitions, and this
  *     spec asserts both directions (no shadowed def materialized, no
  *     single-def multi-ref CTE unmaterialized).
  */
class OracleLintSpec extends AnyFunSuite {

  private val CteDef = """\b([A-Za-z_][A-Za-z0-9_$]*) AS (MATERIALIZED )?\(""".r

  private def bodyEnd(sql: String, start: Int): Int = {
    var d = 1
    var i = start
    while (i < sql.length && d > 0) {
      val c = sql.charAt(i)
      if (c == '(') d += 1 else if (c == ')') d -= 1
      i += 1
    }
    i
  }

  private def refCount(rest: String, name: String): Int = {
    val q = java.util.regex.Pattern.quote(name)
    val direct = ("""\b(?:FROM|JOIN)\s+""" + q + """(?![A-Za-z0-9_$])""").r
      .findAllMatchIn(rest)
      .size
    // comma cross join: FROM a [alias], name
    val comma =
      ("""\bFROM\s+[A-Za-z_][A-Za-z0-9_$]*(?:\s+[a-z])?\s*,\s*""" + q +
        """(?![A-Za-z0-9_$])""").r.findAllMatchIn(rest).size
    direct + comma
  }

  test("every single-definition oracle CTE referenced >= 2x is AS MATERIALIZED; " +
    "no shadowed definition is") {
    val unmarked = scala.collection.mutable.ArrayBuffer[String]()
    val shadowedMarked = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.oracleSql.toSeq.sortBy(_._1).foreach { case (query, sql) =>
      val defs = CteDef
        .findAllMatchIn(sql)
        .filterNot(m =>
          sql.substring(m.end).matches("(?is)\\s*(PARTITION BY|ORDER BY).*"))
        .toSeq
      val byName = defs.groupBy(_.group(1))
      defs.foreach { m =>
        val name = m.group(1)
        val materialized = m.group(2) != null
        val end = bodyEnd(sql, m.end)
        val body = sql.substring(m.end, math.min(end, sql.length))
        val recursive = refCount(body, name) > 0
        val shadowed = byName(name).size > 1
        if (shadowed && materialized)
          shadowedMarked += s"$query:$name"
        else if (!shadowed && !recursive && !materialized &&
          refCount(sql.substring(math.min(end, sql.length)), name) >= 2)
          unmarked += s"$query:$name"
      }
    }
    assert(shadowedMarked.isEmpty,
      s"shadowed CTE definitions carrying MATERIALIZED (binder error class — " +
        s"demoteShadowedMaterialized missed them): $shadowedMarked")
    assert(unmarked.isEmpty,
      s"multi-referenced CTEs without AS MATERIALIZED (exponential-inlining " +
        s"class — mark them): $unmarked")
  }
}
