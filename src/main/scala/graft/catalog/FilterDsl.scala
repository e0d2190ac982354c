package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Boolean attribute-filter DSL of the resource catalog
  * (reference: schema rest/api.py:1381-1437, SQL compiler
  * indexer/sqlalchemy.py:1469-1618). The JSON tree
  * `{"and": [{"=": {"type": "instance"}}, {">": {"started_at": ...}}]}`
  * compiles to a Catalyst `Column` predicate, so it pushes down to the
  * parquet scan like any WHERE clause.
  */
sealed trait Filter
object Filter {
  final case class Cmp(op: String, attr: String, value: Any) extends Filter
  final case class In(attr: String, values: Seq[Any]) extends Filter
  final case class Like(attr: String, pattern: String) extends Filter
  final case class And(subs: Seq[Filter]) extends Filter
  final case class Or(subs: Seq[Filter]) extends Filter
  final case class Not(sub: Filter) extends Filter

  private def litOf(v: Any): Column = v match {
    case null => lit(null)
    case x => lit(x)
  }

  /** Computed fields (sqlalchemy.py:1541-1568): filterable attributes
    * that compile to derived expressions, not physical columns —
    * `lifespan` = ended_at − started_at (compared in seconds here; the
    * reference compares timedeltas) and `created_by_user_id` /
    * `created_by_project_id` split the `creator` column's
    * "user:project" form. Every comparison in the DSL goes through
    * this hook, so saved searches over these fields work unchanged.
    */
  def fieldCol(attr: String): Column = attr match {
    case "lifespan" =>
      unix_timestamp(col("ended_at")) - unix_timestamp(col("started_at"))
    case "created_by_user_id"    => split_part(col("creator"), lit(":"), lit(1))
    case "created_by_project_id" => split_part(col("creator"), lit(":"), lit(2))
    case a => col(a)
  }

  /** Compile to a Catalyst predicate. `!=` is null-safe per the reference
    * (`attr IS NULL OR attr != v`, sqlalchemy.py:1593-1595); empty `in`
    * is FALSE (sqlalchemy.py:1462-1466).
    */
  def compile(f: Filter): Column = f match {
    // null comparand: `= null` is IS NULL and `!= null` IS NOT NULL
    // (sqlalchemy compiles `== None` that way — the standard
    // live-resource filter `ended_at = null`); ordered comparisons
    // with null match nothing, as in SQL
    case Cmp(op, a, null) => op match {
      case "=" | "==" | "eq" => fieldCol(a).isNull
      case "!=" | "ne" | "≠" => fieldCol(a).isNotNull
      case _                 => lit(false)
    }
    case Cmp(op, a, v) => op match {
      case "=" | "==" | "eq" => fieldCol(a) === litOf(v)
      case "<" | "lt"        => fieldCol(a) < litOf(v)
      case ">" | "gt"        => fieldCol(a) > litOf(v)
      case "<=" | "le" | "≤" => fieldCol(a) <= litOf(v)
      case ">=" | "ge" | "≥" => fieldCol(a) >= litOf(v)
      case "!=" | "ne" | "≠" => fieldCol(a).isNull || fieldCol(a) =!= litOf(v)
      case other => throw new IllegalArgumentException(s"op $other")
    }
    case In(_, Nil)    => lit(false)
    case In(a, vs)     => fieldCol(a).isin(vs: _*)
    case Like(a, p)    => fieldCol(a).like(p)
    // empty conjunction/disjunction take their SQL identities (the
    // reference's sqlalchemy and_()/or_() with no clauses) instead of
    // crashing reduce on an empty list — reachable from REST JSON
    case And(Nil)      => lit(true)
    case Or(Nil)       => lit(false)
    case And(subs)     => subs.map(compile).reduce(_ && _)
    case Or(subs)      => subs.map(compile).reduce(_ || _)
    case Not(sub)      => !compile(sub)
  }
}

/** String filter grammar (reference rest/api.py:1298-1378, pyparsing
  * infixNotation): infix text like
  *   `(a=1 and not b>2) or c in [1, 2] or name like "x%"`
  * with quoted strings, numbers, null, booleans. Recursive-descent with
  * standard precedence: not > and > or.
  */
object FilterParser {
  import Filter._

  def parse(s: String): Filter = {
    val p = new P(tokenize(s))
    val f = p.orExpr()
    require(p.eof, s"trailing tokens at ${p.rest}")
    f
  }

  // the digit-leading-word alternative (before the number rules) keeps
  // unquoted UUIDs (`3fa85f64-…`) and ISO dates (`2024-01-01T…`) one
  // token — the pyparsing grammar accepts both unquoted, and the bare
  // int rule would otherwise split them at the first dash
  // ∧/∨/¬ are the reference grammar's unicode boolean alternatives
  // (like the ≠/≤/≥ comparison forms) — the parser branches accept
  // them, so the tokenizer must emit them
  private val tokenRe =
    ("""\s*("(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*'|<=|>=|!=|==|≠|≤|≥|∧|∨|¬|[()\[\],=<>]|""" +
     """[0-9][0-9A-Za-z_.:]*[A-Za-z-][0-9A-Za-z_.:-]*|""" +
     """-?[0-9]+\.[0-9]+|-?[0-9]+|[A-Za-z_][A-Za-z0-9_.:-]*)""").r

  private def tokenize(s: String): List[String] = {
    var rest = s
    val out = scala.collection.mutable.ListBuffer[String]()
    while (rest.trim.nonEmpty) {
      tokenRe.findPrefixMatchOf(rest) match {
        case Some(m) => out += m.group(1); rest = rest.substring(m.end)
        case None => throw new IllegalArgumentException(s"bad token at: $rest")
      }
    }
    out.toList
  }

  private class P(var toks: List[String]) {
    def eof: Boolean = toks.isEmpty
    def rest: String = toks.mkString(" ")
    private def peek: Option[String] = toks.headOption
    private def next(): String = {
      require(toks.nonEmpty, "unexpected end of filter expression")
      val h = toks.head; toks = toks.tail; h
    }
    private def expect(t: String): Unit = {
      val g = next(); require(g.equalsIgnoreCase(t), s"expected $t got $g")
    }

    def orExpr(): Filter = {
      var l = andExpr()
      while (peek.exists(t => t.equalsIgnoreCase("or") || t == "∨")) {
        next(); l = Or(Seq(l, andExpr()))
      }
      l
    }
    def andExpr(): Filter = {
      var l = notExpr()
      while (peek.exists(t => t.equalsIgnoreCase("and") || t == "∧")) {
        next(); l = And(Seq(l, notExpr()))
      }
      l
    }
    def notExpr(): Filter =
      if (peek.exists(t => t.equalsIgnoreCase("not") || t == "¬")) { next(); Not(notExpr()) }
      else atom()

    def atom(): Filter = peek match {
      case Some("(") => next(); val f = orExpr(); expect(")"); f
      case _ =>
        val attr = next()
        val op = next()
        op.toLowerCase match {
          case "in" =>
            expect("["); val vs = scala.collection.mutable.ListBuffer[Any]()
            while (!peek.contains("]")) {
              vs += value(next()); if (peek.contains(",")) next()
            }
            expect("]")
            // the reference's REST schema requires a non-empty value
            // list (gabbits/search.yaml "empty in_" → 400); programmatic
            // In(attr, Nil) still compiles to FALSE at the indexer
            // layer (sqlalchemy.py:1462-1466)
            if (vs.isEmpty) throw new IllegalArgumentException(
              s"'in' requires at least one value: $attr in []")
            In(attr, vs.toSeq)
          case "like" => value(next()) match {
            // a null literal after `like` must be the same clean parse
            // error every other malformed filter raises, not an NPE
            // escaping as a 500
            case null => throw new IllegalArgumentException(
              "like requires a string pattern, got null")
            case v => Like(attr, v.toString)
          }
          case o if Set("=", "==", "eq", "<", "lt", ">", "gt", "<=", "le",
              ">=", "ge", "!=", "ne", "≠", "≤", "≥").contains(o) =>
            Cmp(o, attr, value(next()))
          case o => throw new IllegalArgumentException(s"unknown operator $o")
        }
    }

    private def value(t: String): Any = t match {
      case _ if t.startsWith("\"") || t.startsWith("'") =>
        // pyparsing QuotedString(escChar='\\'): EVERY \x pair unescapes
        // to x, not just the quote characters — (?s) so a backslash-
        // newline pair unescapes too ('.' alone skips newline)
        t.substring(1, t.length - 1).replaceAll("(?s)\\\\(.)", "$1")
      case "null" | "None" => null
      case "true" | "True" => true
      case "false" | "False" => false
      case _ if t.matches("-?[0-9]+") => t.toLong
      case _ if t.matches("-?[0-9]+\\.[0-9]+") => t.toDouble
      case _ => t // bare word: uuid / enum string
    }
  }
}

/** fnmatch-style glob matching (reference uses Python fnmatch for
  * archive-policy rules, indexer/__init__.py:460-466, and metric
  * wildcards in groupby aggregates, rest/aggregates/api.py:684-710):
  * `*` any run, `?` any one char, `[seq]`/`[!seq]` char classes.
  */
object Fnmatch {
  /** Translate a glob to an anchored Java regex (fnmatch.translate). */
  def regex(glob: String): String = {
    // python fnmatch.translate compiles with re.DOTALL — '*'/'?' must
    // cross newlines here too
    val sb = new StringBuilder("(?s)^")
    var i = 0
    while (i < glob.length) {
      glob.charAt(i) match {
        case '*' => sb.append(".*")
        case '?' => sb.append(".")
        case '[' =>
          // python fnmatch close scan: a ']' directly after '[' (or
          // after '[!') is a LITERAL member, not the terminator
          val scanFrom = {
            var j = i + 1
            if (j < glob.length && glob.charAt(j) == '!') j += 1
            if (j < glob.length && glob.charAt(j) == ']') j += 1
            j
          }
          val close = glob.indexOf(']', scanFrom)
          if (close < 0) sb.append("\\[")
          else {
            // python fnmatch.translate semantics: leading '!' negates,
            // a leading '^' is LITERAL (escaped); ']' and '[' inside
            // the class are escaped so Java's stricter class parser
            // accepts the []] / [!]] literal-] forms
            val raw = glob.substring(i + 1, close)
            val (neg, stuff0) =
              if (raw.startsWith("!")) (true, raw.substring(1)) else (false, raw)
            val esc = stuff0.replace("\\", "\\\\")
              .replace("]", "\\]").replace("[", "\\[")
              // '&&' is Java's class INTERSECTION; python fnmatch has
              // no such operator — '[a&&b]' must stay three literals
              .replace("&", "\\&")
            val body = (if (neg) "^" else "") +
              (if (!neg && esc.startsWith("^")) "\\" + esc else esc)
            sb.append("[").append(body).append("]")
            i = close
          }
        case c => sb.append(java.util.regex.Pattern.quote(c.toString))
      }
      i += 1
    }
    sb.append("$").toString
  }

  def matches(glob: String, s: String): Boolean = s.matches(regex(glob))
}

/** R4 keyset pagination + multi-sort (rest/api.py:215-236,
  * sqlalchemy.py:1309-1343 / oslo_db `paginate_query`): `sort=attr:dir`
  * list with a unique-key tiebreaker, `marker` = unique key of the last
  * row of the previous page (history listings accept `id@revision`),
  * limit clamped.
  *
  * The marker row is looked up (one pruned point read — the reference
  * fetches the marker resource the same way, sqlalchemy.py:1309-1320)
  * and expanded into the full lexicographic keyset predicate over the
  * sort tuple:
  *   (s1 > m1) OR (s1 = m1 AND s2 > m2) OR … (with < for desc columns)
  * so pages are correct under any sort spec, not just unique-key-asc.
  * Null ordering matches `orderBy`: asc = nulls first, desc = nulls last.
  */
object Pagination {
  def apply(df: DataFrame, sorts: Seq[(String, Boolean)], uniqueKey: String,
            marker: Option[Any], limit: Int, maxLimit: Int = 1000): DataFrame = {
    // an unknown sort attribute must be a clean client error (the
    // reference 400s, gabbits/pagination.yaml "invalid sort key"), not
    // an AnalysisException surfacing as a 500
    sorts.collectFirst { case (k, _) if !df.columns.contains(k) => k }
      .foreach(k => throw new IllegalArgumentException(
        s"Invalid sort key: $k"))
    // a negative client limit must be a clean 400, not Spark's
    // AnalysisException surfacing as a 500
    require(limit >= 0, s"Invalid limit: $limit")
    val withTie =
      if (sorts.exists(_._1 == uniqueKey)) sorts
      else sorts :+ (uniqueKey -> true)
    val ordered = df.orderBy(withTie.map { case (c, asc) =>
      if (asc) col(c).asc else col(c).desc
    }: _*)
    val afterMarker = marker match {
      case Some(m) => ordered.filter(keysetPredicate(df, withTie, uniqueKey, m))
      case None => ordered
    }
    afterMarker.limit(math.min(limit, maxLimit))
  }

  /** `id@revision` history marker (sqlalchemy.py:1325-1343): resolves
    * against (uniqueKey, revision); plain markers resolve on uniqueKey.
    */
  private def markerLookup(df: DataFrame, uniqueKey: String, m: Any): Column =
    m match {
      case s: String if s.contains("@") && df.columns.contains("revision") =>
        // split on the LAST '@' (ids may contain '@'); a non-numeric
        // suffix means the whole marker is a plain id, not id@revision
        val at = s.lastIndexOf('@')
        val (id, rev) = (s.substring(0, at), s.substring(at + 1))
        rev.toLongOption match {
          case Some(r) =>
            col(uniqueKey) === lit(id) && col("revision") === lit(r)
          case None => col(uniqueKey) === lit(s)
        }
      case other => col(uniqueKey) === lit(other)
    }

  private def keysetPredicate(df: DataFrame, sorts: Seq[(String, Boolean)],
                              uniqueKey: String, m: Any): Column = {
    val sortCols = sorts.map(_._1)
    val markerRow = df.filter(markerLookup(df, uniqueKey, m))
      .select(sortCols.map(col): _*).limit(1).collect()
      .headOption.getOrElse(throw new IllegalArgumentException(
        s"Invalid marker: $m"))
    val strict = sorts.zipWithIndex.map { case ((c, asc), i) =>
      val mv = markerRow.get(i)
      if (mv == null) {
        // orderBy: asc = nulls FIRST (everything non-null follows),
        // desc = nulls LAST (nothing strictly follows a null marker)
        if (asc) col(c).isNotNull else lit(false)
      } else if (asc) col(c) > lit(mv) // asc nulls precede: none follow
      else col(c).isNull || col(c) < lit(mv) // desc: nulls sort last

    }
    val eq = sorts.zipWithIndex.map { case ((c, _), i) =>
      col(c) <=> lit(markerRow.get(i))
    }
    sorts.indices.map { i =>
      (eq.take(i) :+ strict(i)).reduce(_ && _)
    }.reduce(_ || _)
  }
}
