package graft.tools

/** Static canonicalization lint over the DuckDB oracle SQL strings.
  *
  * The driver's correctness gate hashes the oracle result INCLUDING its
  * serialized dtypes, and DuckDB widens integer `sum(...)` to HUGEINT
  * (int128) and bare decimal literals to DECIMAL — types Spark never
  * emits, so a value-correct query hash-mismatches (the r12 q_host_rank
  * / q_media_cdc_stats / q_quality_checks class). The full-fidelity
  * probe is driver-side (`scripts/check.py` runs `DESCRIBE` on every
  * oracle and rejects HUGEINT/DECIMAL outputs); this lint is the
  * hermetic in-JVM approximation that `sbt test` can run on every
  * oracle string without a DuckDB engine.
  *
  * Rules (calibrated to zero false positives on the current corpus):
  *  - a `sum(...)` in the TOP-LEVEL select list must reach the output
  *    through a canonicalizing context: an enclosing `CAST(...)` /
  *    `round(...)` (DuckDB returns DOUBLE for `round(HUGEINT, n)`), a
  *    float division on either side (`/` in DuckDB is always float
  *    division; `//` is integer), or a `::BIGINT` / `::DOUBLE` suffix
  *    cast. Sums inside CTEs/subqueries are out of static scope — their
  *    type may be canonicalized downstream, which only the DESCRIBE
  *    probe can decide.
  *  - a bare decimal literal must not be aliased straight into the
  *    output (`100.0 AS lo` → DECIMAL(4,1); wrap in `CAST(... AS
  *    DOUBLE)`).
  * String literals are masked before scanning so quoted text never
  * trips either rule.
  */
object OracleLint {

  /** All lint findings for one oracle SQL string: offending snippet,
    * tagged by rule. Empty = canonical as far as the static rules see. */
  def findings(sql: String): Seq[String] =
    uncastSums(sql).map(s => s"uncast-sum: $s") ++
      bareDecimalAliases(sql).map(s => s"decimal-literal-alias: $s")

  /** `sum(` spans with no canonicalizing context (see class doc). */
  def uncastSums(sql: String): Seq[String] = {
    val s = mask(sql)
    val n = s.length
    val out = scala.collection.mutable.Buffer[String]()
    // stack of lower-cased caller words, one per currently-open paren
    var stack = List.empty[String]
    // sums awaiting their balanced close: (word start, depth at open,
    // already canonical via an enclosing call)
    var pend = List.empty[(Int, Int, Boolean)]
    var i = 0
    while (i < n) {
      s(i) match {
        case '(' =>
          val (w, wStart) = wordBefore(s, i)
          if (w == "sum") {
            // inside a CTE / derived table / scalar subquery? (any
            // enclosing paren that is not a plain function call)
            val inSubquery = stack.exists(c => nonCallWords(c))
            val enclosingOk = stack.exists(c => c == "cast" || c == "round")
            // float division with the sum as DENOMINATOR: x / sum(...)
            val prev = prevNonWs(s, wStart)
            val divOk = prev > 0 && s(prev) == '/' && s(prev - 1) != '/'
            pend = (wStart, stack.size, inSubquery || enclosingOk || divOk) :: pend
          }
          stack = w :: stack
        case ')' =>
          if (stack.nonEmpty) stack = stack.tail
          pend match {
            case (wStart, depth, canon) :: rest if stack.size == depth =>
              pend = rest
              if (!canon) {
                val after = s.substring(i + 1).dropWhile(_.isWhitespace)
                val ok = (after.startsWith("/") && !after.startsWith("//")) ||
                  after.toLowerCase.startsWith("::bigint") ||
                  after.toLowerCase.startsWith("::double")
                if (!ok) out += sql.substring(wStart, i + 1)
              }
            case _ =>
          }
        case _ =>
      }
      i += 1
    }
    out.toSeq
  }

  /** Paren-opener words that mark a subquery/CTE/derived-table scope
    * rather than a function call. "" covers bare parens (scalar
    * subqueries, parenthesized expressions). */
  private val nonCallWords: Set[String] = Set(
    "", "as", "from", "in", "exists", "where", "on", "then", "else",
    "select", "union", "all", "by", "and", "or", "not", "when", "values")

  /** SQL type names — `0.0 AS DOUBLE` inside a CAST is a cast target,
    * not an alias. */
  private val typeWords: Set[String] = Set(
    "double", "bigint", "int", "integer", "float", "real", "smallint",
    "tinyint", "hugeint", "decimal", "varchar", "boolean", "date",
    "timestamp")

  /** Decimal literals aliased directly into the select list. */
  def bareDecimalAliases(sql: String): Seq[String] = {
    val s = mask(sql)
    val re = """(?i)\b(\d+\.\d+)\s+AS\s+("?\w+"?)""".r
    re.findAllMatchIn(s).flatMap { m =>
      val alias = m.group(2).toLowerCase.stripPrefix("\"").stripSuffix("\"")
      val prev = prevNonWs(s, m.start)
      val startsExpr = prev < 0 || s(prev) == ',' || {
        if (s(prev) == '(') nonCallWords(wordBefore(s, prev)._1)
        else {
          val (w, _) = wordBefore(s, prev + 1)
          w == "select" || w == "all"
        }
      }
      if (startsExpr && !typeWords(alias)) Some(sql.substring(m.start, m.end))
      else None
    }.toSeq
  }

  /** Blank out '...' string literals (length-preserving). */
  private def mask(sql: String): String = {
    val b = sql.toCharArray
    var inStr = false
    var i = 0
    while (i < b.length) {
      if (inStr) { if (b(i) == '\'') inStr = false else b(i) = ' ' }
      else if (b(i) == '\'') inStr = true
      i += 1
    }
    new String(b)
  }

  /** Identifier ending just before position `j` (skipping whitespace),
    * lower-cased, with its start offset. */
  private def wordBefore(s: String, j: Int): (String, Int) = {
    var k = j
    while (k > 0 && s(k - 1).isWhitespace) k -= 1
    val e = k
    while (k > 0 && (s(k - 1).isLetterOrDigit || s(k - 1) == '_')) k -= 1
    (s.substring(k, e).toLowerCase, k)
  }

  private def prevNonWs(s: String, j: Int): Int = {
    var k = j - 1
    while (k >= 0 && s(k).isWhitespace) k -= 1
    k
  }
}
