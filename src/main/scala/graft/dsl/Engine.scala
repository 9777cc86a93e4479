package graft.dsl

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.SparkSession

/** Multi-tenant script execution — the engine-side half of the reference's
  * per-user session manager (MLSQLSparkSession.scala:114 `cloneSession` +
  * `ScriptSQLExecListener.pathPrefix` home-dir re-rooting;
  * ScriptSQLExec.scala:271-291) without the REST server around it.
  *
  * Each owner gets ONE `SparkSession.newSession()` — isolated temp views,
  * UDF registrations and SQL conf over the shared SparkContext (shared
  * cluster resources, separate catalogs) — and a home-dir path prefix that
  * re-roots every relative path their scripts touch.
  */
final class Engine(root: SparkSession, homeBase: String) {
  private val sessions = TrieMap[String, SparkSession]()

  /** Owner strings become path segments — reject separator/traversal
    * characters so `../../x` cannot relocate a home outside [[homeBase]].
    */
  private def checkOwner(owner: String): String = {
    require(owner.nonEmpty && owner.matches("[A-Za-z0-9._@-]+") && !owner.contains(".."),
      s"invalid owner '$owner' (allowed: letters, digits, . _ @ -)")
    // "." passes the charset but normalizes homeBase/. == homeBase itself,
    // which would put this tenant's home ABOVE everyone else's
    require(owner.exists(_ != '.'),
      s"invalid owner '$owner' (must contain a non-dot character)")
    owner
  }

  def sessionFor(owner: String): SparkSession =
    sessions.getOrElseUpdate(checkOwner(owner), {
      val s = root.newSession()
      // each tenant session carries the full engine surface (the native
      // VecExpressions arrive via the builder's SparkSessionExtensions,
      // which newSession() inherits; session UDFs must re-register)
      graft.functions.UDFPack.register(s)
      s
    })

  def homeFor(owner: String): String = s"$homeBase/${checkOwner(owner)}"

  /** Run a script as `owner`: their session, their home-dir prefix. */
  def run(owner: String, script: String): ScriptContext =
    ScriptRunner.run(script, sessionFor(owner), homeFor(owner))
}
