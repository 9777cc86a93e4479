package graft.dsl

import scala.util.matching.Regex

/** `${var}` interpolation over `set` variables (reference: TemplateMerge +
  * PreProcessListener, streamingpro-core/.../dsl/ScriptSQLExec.scala:111-115).
  * Unknown variables are left verbatim (so SQL like `${x}` inside a string
  * the user never set surfaces loudly downstream instead of vanishing).
  */
object Template {
  private val Var: Regex = """\$\{\s*([\w\.\-]+)\s*\}""".r

  /** Substitute to a (bounded) fixpoint: the reference re-merges the whole
    * env after every `set`, so a variable whose VALUE contains `${other}`
    * resolves transitively (`set b="${a}"` then `${b}` → a's value). Ten
    * passes bound pathological self-referential chains; unknown variables
    * stay verbatim, which also terminates the loop.
    */
  def merge(text: String, env: collection.Map[String, String]): String = {
    var cur = text
    var i = 0
    while (i < 10) {
      val next = mergeOnce(cur, env)
      if (next == cur) return cur
      cur = next
      i += 1
    }
    cur
  }

  private def mergeOnce(text: String, env: collection.Map[String, String]): String =
    Var.replaceAllIn(text, m => {
      val k = m.group(1)
      Regex.quoteReplacement(env.getOrElse(k, m.matched))
    })

  /** Parse an `and`-separated `key="value"` option clause (the `where`/
    * `options` part of load/save/train/connect). Values may be
    * `"..."`, `'...'`, or `'''...'''` blocks.
    */
  private val Opt: Regex =
    """(?s)([\w][\w\.\-]*)\s*=\s*('''(.*?)'''|"((?:[^"\\]|\\.)*)"|'((?:[^'\\]|\\.)*)')""".r

  def parseOptions(clause: String, env: collection.Map[String, String]): Map[String, String] = {
    Opt.findAllMatchIn(clause).map { m =>
      val raw =
        if (m.group(3) != null) m.group(3)
        else if (m.group(4) != null) unescape(m.group(4))
        else unescape(m.group(5))
      m.group(1) -> merge(raw, env)
    }.toMap
  }

  private def unescape(s: String): String =
    s.replace("\\\"", "\"").replace("\\'", "'").replace("\\\\", "\\")
}
