package graft.catalog

/** Minimal legacySQL dialect shim — SURVEY §2 U3, the one view family
  * the reference still ships in the legacy dialect
  * (reference: schema/views_legacysql/ndt_plx.sql:1-20). That file's
  * only NON-standard constructs are:
  *
  *   - the `#legacySQL` marker line;
  *   - bracket table references `[${PROJECT}:dataset.table]`;
  *   - the COMMA-UNION: in legacySQL a comma between items of the
  *     outer FROM means UNION ALL. This is the load-bearing rewrite —
  *     standard SQL (and Spark) reads the same comma as an implicit
  *     CROSS JOIN, so passing the text through unrewritten would be
  *     silently, catastrophically wrong (a self-cross of two
  *     table-scale legs), not merely a syntax error.
  *
  * [[translate]] rewrites exactly that subset to Spark SQL and leaves
  * everything else untouched (`--` comments, `struct.*` expansion and
  * the partition pseudo-column are already valid Spark — P5/S3 cover
  * them). Scope is deliberately the reference's actual usage: the
  * comma-union scanner tracks parenthesis depth only (the legacy view
  * bodies contain no string literals with parens or commas in the
  * outer FROM), and splits the OUTER query's FROM list — nested
  * queries' own FROMs sit at depth ≥ 1 and are never touched.
  */
object LegacySql {

  private val Bracket = """\[([A-Za-z0-9_.:-]+)\]""".r

  /** Rewrite a legacySQL view body to Spark SQL. `vars` are the
    * deployment substitutions the reference's create_view applies
    * with envsubst BEFORE bq sees the text (make_views.sh:60 —
    * `${PROJECT}`, `${DATASET}`, `${INTERMEDIATE}`); `PROJECT`
    * defaults to the engine's catalog name. `tableRef` then maps the
    * substituted bracket reference — with any `project:` prefix
    * stripped, so callers key on `dataset.table` — to the name it
    * should resolve to in the session catalog (identity keeps it
    * as-is). */
  def translate(sql: String, tableRef: String => String = identity,
      vars: Map[String, String] = Map.empty): String = {
    val sub = (Map("PROJECT" -> ReferenceViews.Project) ++ vars)
      .foldLeft(sql) { case (acc, (k, v)) =>
        acc.replace("${" + k + "}", v) }
    val noMarker = sub.linesIterator
      .filterNot(_.trim.equalsIgnoreCase("#legacySQL"))
      .mkString("\n")
    val mapped = Bracket.replaceAllIn(noMarker, m => {
      val raw = m.group(1)
      val ref = raw.substring(raw.lastIndexOf(':') + 1)
      java.util.regex.Matcher.quoteReplacement(tableRef(ref))
    })
    rewriteCommaUnion(mapped)
  }

  private def isIdent(c: Char): Boolean =
    c.isLetterOrDigit || c == '_'

  /** Keyword match at position i, at word boundaries. */
  private def kwAt(sql: String, i: Int, kw: String): Boolean =
    sql.regionMatches(true, i, kw, 0, kw.length) &&
      (i == 0 || !isIdent(sql(i - 1))) &&
      (i + kw.length >= sql.length || !isIdent(sql(i + kw.length)))

  /** Index after a `-- comment` starting at k (to end of line), or k. */
  private def skipComment(s: String, k: Int): Int =
    if (k + 1 < s.length && s(k) == '-' && s(k + 1) == '-') {
      val nl = s.indexOf('\n', k)
      if (nl < 0) s.length else nl
    } else k

  /** Index after a string literal starting at k, or k. A literal is
    * opaque to the scanners: a comma, paren, or clause keyword inside
    * one must not split or terminate the FROM list (ADVICE r14 — the
    * old scanner silently mis-split on them). Legacy SQL quotes
    * strings with EITHER ' or " (identifiers use [brackets], so a
    * double quote is always a string); both escape with backslash and
    * with a doubled quote. */
  private def skipString(s: String, k: Int): Int = {
    val q = s(k)
    if (q != '\'' && q != '"') k
    else {
      var m = k + 1
      while (m < s.length && s(m) != q)
        m += (if (s(m) == '\\' && m + 1 < s.length) 2 else 1)
      if (m + 1 < s.length && s(m) == q && s(m + 1) == q)
        skipString(s, m + 1) // doubled quote continues the literal
      else math.min(m + 1, s.length)
    }
  }

  private def skip(s: String, k: Int): Int = {
    val c = skipComment(s, k)
    if (c != k) c else skipString(s, k)
  }

  /** Split the OUTER query's FROM list on depth-0 commas; more than
    * one item means legacySQL UNION ALL semantics. Items that are
    * parenthesized subqueries stay as-is; bare table refs become
    * `SELECT * FROM ref` legs. The clause ends at a depth-0
    * WHERE/GROUP/ORDER/HAVING/LIMIT or end of text; the tail is
    * preserved verbatim. */
  private def rewriteCommaUnion(sql: String): String = {
    // locate the outer FROM (depth 0)
    var i = 0; var depth = 0; var fromIdx = -1
    while (i < sql.length && fromIdx < 0) {
      val k = skip(sql, i)
      if (k != i) i = k
      else {
        sql(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ if depth == 0 && kwAt(sql, i, "FROM") => fromIdx = i
          case _ =>
        }
        i += 1
      }
    }
    if (fromIdx < 0) return sql
    // scan the FROM list: depth-0 commas separate items, a depth-0
    // clause keyword (or end of text) terminates it
    val terminators = Seq("WHERE", "GROUP", "ORDER", "HAVING", "LIMIT")
    val items = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = fromIdx + 4
    var j = start; depth = 0; var endIdx = sql.length
    while (j < sql.length && endIdx == sql.length) {
      val k = skip(sql, j)
      if (k != j) j = k
      else {
        sql(j) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case ',' if depth == 0 =>
            items += sql.substring(start, j); start = j + 1
          case _ if depth == 0 && terminators.exists(kwAt(sql, j, _)) =>
            endIdx = j
          case _ =>
        }
        j += 1
      }
    }
    items += sql.substring(start, endIdx)
    if (items.size <= 1) return sql
    def leg(item: String): String = {
      val t = item.trim
      if (t.startsWith("(")) {
        // fail FAST on an aliased subquery leg (`(SELECT ...) a`):
        // passing it through would emit `(...) a UNION ALL ...`,
        // which parses wrong or not at all — an honest error beats
        // silently mangled SQL. Match parens with the same comment-
        // and literal-aware scanner as the FROM split (prose and
        // 'strings' may contain parens); anything after the close is
        // the alias.
        var d = 0; var k = 0; var close = -1
        while (k < t.length && close < 0) {
          val s2 = skip(t, k)
          if (s2 != k) k = s2
          else {
            t(k) match {
              case '(' => d += 1
              case ')' => d -= 1; if (d == 0) close = k
              case _ =>
            }
            k += 1
          }
        }
        val after =
          if (close < 0) "" else t.substring(close + 1).trim
        // strip trailing -- comments from the candidate alias text
        // (a close paren followed only by a comment is not an alias)
        val afterNoComment = after.linesIterator
          .map { l =>
            val idx = l.indexOf("--")
            (if (idx < 0) l else l.substring(0, idx)).trim
          }.filter(_.nonEmpty).mkString(" ")
        require(afterNoComment.isEmpty,
          "unsupported legacySQL construct: " +
          s"aliased comma-union leg ('... $afterNoComment')")
        t
      } else s"(SELECT * FROM $t)"
    }
    // join on FRESH LINES: a leg whose text ends in a `-- comment`
    // would otherwise swallow the UNION ALL (or the preserved tail)
    // into the comment
    sql.substring(0, fromIdx) +
      "FROM (" + items.map(leg).mkString("\nUNION ALL\n") +
      "\n) legacy_union " + sql.substring(endIdx)
  }
}
