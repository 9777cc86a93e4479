package graft.dsl

/** Quote-aware statement-parsing helpers.
  *
  * The reference parses statements with ANTLR
  * (reference: streamingpro-dsl/src/main/resources/DSLSQL.g4); we keep the
  * same observable token forms but parse with a mask-based scanner: every
  * character inside a quoted region (`'...'`, `"..."`, `` `...` ``,
  * `'''...'''`) is replaced by a sentinel in the *mask*, so clause keywords
  * (`as`, `where`, `options`, `partitionBy`) are only recognized at top
  * nesting level, never inside string literals or backquoted paths.
  */
object Parsing {

  private val Sentinel = '\u0001'

  /** Same-length string with every quoted-region char (delimiters included)
    * replaced by a sentinel. Positions align 1:1 with the input.
    */
  def maskQuoted(s: String): String = {
    val out = new Array[Char](s.length)
    var i = 0
    val n = s.length
    var state: Char = 'n'
    def has(k: Int) = i + k < n
    while (i < n) {
      val ch = s.charAt(i)
      state match {
        case 'n' =>
          if (ch == '\'' && has(2) && s.charAt(i + 1) == '\'' && s.charAt(i + 2) == '\'') {
            out(i) = Sentinel; out(i + 1) = Sentinel; out(i + 2) = Sentinel
            state = 't'; i += 2
          } else if (ch == '\'') { out(i) = Sentinel; state = 's' }
          else if (ch == '"') { out(i) = Sentinel; state = 'd' }
          else if (ch == '`') { out(i) = Sentinel; state = 'b' }
          else out(i) = ch
        case 's' =>
          out(i) = Sentinel
          if (ch == '\\' && has(1)) { i += 1; out(i) = Sentinel }
          else if (ch == '\'') state = 'n'
        case 'd' =>
          out(i) = Sentinel
          if (ch == '\\' && has(1)) { i += 1; out(i) = Sentinel }
          else if (ch == '"') state = 'n'
        case 'b' =>
          out(i) = Sentinel
          if (ch == '`') state = 'n'
        case 't' =>
          out(i) = Sentinel
          if (ch == '\'' && has(2) && s.charAt(i + 1) == '\'' && s.charAt(i + 2) == '\'') {
            out(i + 1) = Sentinel; out(i + 2) = Sentinel
            state = 'n'; i += 2
          }
      }
      i += 1
    }
    new String(out)
  }

  /** `fmt.path` reference: format is the text before the FIRST dot; the
    * path is the rest with backticks stripped (may be empty, may contain
    * dots — e.g. `jdbc.`db.table``).
    */
  final case class PathRef(format: String, path: String)

  def parsePathRef(tok: String): PathRef = {
    val t = tok.trim
    val dot = t.indexOf('.')
    if (dot < 0) PathRef(t, "")
    else {
      val raw = t.substring(dot + 1).trim
      val path = if (raw.startsWith("`") && raw.endsWith("`") && raw.length >= 2)
        raw.substring(1, raw.length - 1)
      else raw
      PathRef(t.substring(0, dot).trim, path)
    }
  }

  /** First word of the statement (lowercased) and the remainder. */
  def headWord(stmt: String): (String, String) = {
    val t = stmt.trim
    val sp = t.indexWhere(Character.isWhitespace)
    if (sp < 0) (t.toLowerCase, "") else (t.substring(0, sp).toLowerCase, t.substring(sp + 1).trim)
  }

  /** Next whitespace-delimited token honoring quoting: the token ends at the
    * first top-level whitespace. Returns (token, rest).
    */
  def nextToken(s: String): (String, String) = {
    val t = s.replaceAll("^\\s+", "")
    if (t.isEmpty) return ("", "")
    val mask = maskQuoted(t)
    var i = 0
    while (i < t.length && !(Character.isWhitespace(t.charAt(i)) && mask.charAt(i) == t.charAt(i))) i += 1
    (t.substring(0, i), t.substring(math.min(i + 1, t.length)).trim)
  }

  private def topLevelRegex(s: String, re: scala.util.matching.Regex): Option[scala.util.matching.Regex.Match] =
    re.findFirstMatchIn(maskQuoted(s))

  /** Split at the first top-level `where`/`options` keyword:
    * (before, optionsClause or "").
    */
  def splitOptionsClause(s: String): (String, String) = {
    topLevelRegex(s, "(?i)(?<=^|\\s)(where|options)(?=\\s)".r) match {
      case Some(m) => (s.substring(0, m.start).trim, s.substring(m.end).trim)
      case None => (s.trim, "")
    }
  }

  /** Strip a trailing top-level `as <ident>`: (body, Some(ident)) or
    * (s, None). Matches the reference's select-statement tail handling
    * (reference: streamingpro-core/.../dsl/adaptor/SelectAdaptor.scala:53-60
    * — last `as <ident>` token sequence before `;` at top nesting level).
    */
  def stripTrailingAs(s: String): (String, Option[String]) = {
    val mask = maskQuoted(s)
    "(?i)\\s+as\\s+([A-Za-z_][\\w]*)\\s*$".r.findFirstMatchIn(mask) match {
      case Some(m) => (s.substring(0, m.start).trim, Some(s.substring(m.start(1), m.end(1))))
      case None => (s.trim, None)
    }
  }

  /** Extract a top-level `partitionBy c1[,c2...]` clause: (rest, cols). */
  def stripPartitionBy(s: String): (String, Seq[String]) = {
    topLevelRegex(s, "(?i)(?<=^|\\s)partitionBy\\s+([\\w]+(?:\\s*,\\s*[\\w]+)*)".r) match {
      case Some(m) =>
        val cols = m.group(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
        ((s.substring(0, m.start) + s.substring(m.end)).trim, cols)
      case None => (s.trim, Nil)
    }
  }
}
