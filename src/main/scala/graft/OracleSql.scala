package graft

/** Oracle-SQL runnability hygiene (the r13 lesson).
  *
  * DuckDB 1.0 INLINES plain CTEs: every reference re-executes the CTE's
  * subtree. A chain oracle whose CTEs are each referenced 2-3 times
  * therefore re-runs exponentially many copies of the upstream work —
  * ss16's 8-pick greedy chain compounded ~3^6 re-runs of a feature
  * self-join, wedged the driver's DuckDB compare for >20 minutes, and
  * shipped CORRECTNESS_r13.json as an empty `{}`, zeroing the official
  * correctness record for all 154 queries. The identical SQL with
  * `AS MATERIALIZED` completes in ~2 s and matches row-for-row.
  *
  * `materializeReusedCtes` makes that impossible to re-introduce by
  * construction: it rewrites every oracle at assembly time so that any
  * non-recursive CTE referenced more than once is declared
  * `AS MATERIALIZED` (semantics-preserving in DuckDB; it only pins the
  * evaluate-once strategy). Singly-referenced CTEs stay plain so DuckDB
  * can keep inlining them (filter pushdown through the CTE body).
  * `OracleDisciplineSpec` independently lints the final shipped map.
  */
object OracleSql {

  private val declRe =
    """(?i)\b(\w+)\s*(?:\([^()]*\))?\s+AS\s+(MATERIALIZED\s+)?\(""".r

  /** End index (exclusive) of the parenthesized body whose '(' is at
    * `open`, skipping single-quoted string literals.
    */
  private def bodyEnd(sql: String, open: Int): Int = {
    var depth = 0; var i = open; var inStr = false
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return i + 1
        case _ =>
      }
      i += 1
    }
    sql.length
  }

  /** Insert `MATERIALIZED ` into every CTE declaration whose name is
    * referenced more than once outside its own body (self-references mark
    * a recursive CTE, which cannot be materialized and is left alone).
    * Reference counting is word-boundary-based and may over-count a CTE
    * name that doubles as a column/alias name — over-materializing is
    * semantics-preserving and cheap, under-materializing is the r13
    * failure, so the bias is the safe one.
    */
  def materializeReusedCtes(sql: String): String = {
    val windowDecl = """(?is).*\bWINDOW\s*$""".r
    val inserts = declRe.findAllMatchIn(sql).flatMap { m =>
      val cte = m.group(1)
      // `WINDOW w AS (...)` is a named-window declaration, not a CTE.
      if (windowDecl.matches(sql.substring(0, m.start))) None
      else if (m.group(2) != null) None // already MATERIALIZED
      else {
        val bStart = m.end - 1
        val bEnd = bodyEnd(sql, bStart)
        val refs = ("(?i)\\b" + java.util.regex.Pattern.quote(cte) + "\\b").r
          .findAllMatchIn(sql).map(_.start).toList
          .filter(p => p < m.start || p >= m.end)
        val self = refs.count(p => p >= bStart && p < bEnd)
        if (self == 0 && refs.length - self > 1) Some(bStart) else None
      }
    }.toList
    inserts.sorted.reverse.foldLeft(sql) { (s, pos) =>
      s.substring(0, pos) + "MATERIALIZED " + s.substring(pos)
    }
  }
}
