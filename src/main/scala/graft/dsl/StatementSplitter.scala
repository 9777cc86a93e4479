package graft.dsl

import scala.collection.mutable.ArrayBuffer

/** Splits a Graft script into `;`-terminated statements.
  *
  * Mirrors the observable lexical behavior of the reference grammar
  * (reference: streamingpro-dsl/src/main/resources/DSLSQL.g4:160-213):
  *  - statements end with `;` at top nesting level;
  *  - `'''...'''` block strings (may span lines, may contain `;`);
  *  - `'...'` / `"..."` strings with backslash escapes;
  *  - `` `...` `` backquoted paths/identifiers;
  *  - `--` line comments (stripped).
  */
object StatementSplitter {

  def split(script: String): Seq[String] = {
    val out = ArrayBuffer[String]()
    val cur = new StringBuilder
    var i = 0
    val n = script.length
    var state: Char = 'n' // n=normal s=single d=double b=backtick t=triple c=comment
    def has(k: Int) = i + k < n
    while (i < n) {
      val ch = script.charAt(i)
      state match {
        case 'n' =>
          if (ch == '-' && has(1) && script.charAt(i + 1) == '-') { state = 'c'; i += 1 }
          else if (ch == '\'' && has(2) && script.charAt(i + 1) == '\'' && script.charAt(i + 2) == '\'') {
            state = 't'; cur.append("'''"); i += 2
          }
          else if (ch == '\'') { state = 's'; cur.append(ch) }
          else if (ch == '"') { state = 'd'; cur.append(ch) }
          else if (ch == '`') { state = 'b'; cur.append(ch) }
          else if (ch == ';') { val s = cur.toString.trim; if (s.nonEmpty) out += s; cur.clear() }
          else cur.append(ch)
        case 'c' =>
          if (ch == '\n') { state = 'n'; cur.append(ch) }
        case 's' =>
          cur.append(ch)
          if (ch == '\\' && has(1)) { i += 1; cur.append(script.charAt(i)) }
          else if (ch == '\'') state = 'n'
        case 'd' =>
          cur.append(ch)
          if (ch == '\\' && has(1)) { i += 1; cur.append(script.charAt(i)) }
          else if (ch == '"') state = 'n'
        case 'b' =>
          cur.append(ch)
          if (ch == '`') state = 'n'
        case 't' =>
          if (ch == '\'' && has(2) && script.charAt(i + 1) == '\'' && script.charAt(i + 2) == '\'') {
            state = 'n'; cur.append("'''"); i += 2
          } else cur.append(ch)
      }
      i += 1
    }
    val tail = cur.toString.trim
    if (tail.nonEmpty) out += tail
    out.toSeq
  }
}
