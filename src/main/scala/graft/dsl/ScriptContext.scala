package graft.dsl

import java.util.concurrent.ConcurrentHashMap
import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-script execution state (reference: `ScriptSQLExecListener`'s `_env` /
  * `lastSelectTable`, streaming/dsl/ScriptSQLExec.scala:181,243-252).
  *
  * `env` holds `set` variables used by `${...}` templating; `lastTable` is
  * the result table of the most recent table-producing statement;
  * `connections` mirrors the reference's `ConnectMeta` (format,alias) →
  * option-map store (ScriptSQLExec.scala:420-445).
  */
final class ScriptContext(val spark: SparkSession, val pathPrefix: String = "") {
  val env: mutable.LinkedHashMap[String, String] = mutable.LinkedHashMap()
  var lastTable: Option[String] = None

  /** Keys set with `scope="un_select"` — substituted everywhere EXCEPT into
    * `select` statement bodies (credential-style variables; reference:
    * ParameterScope.UN_SELECT, SelectAdaptor.scala:46-51).
    */
  val unSelectKeys: mutable.Set[String] = mutable.Set()
  // NOTE: compile-stage set protection (a compile-sql statement neither
  // re-evaluates nor overwrites its preprocess value in the physical pass,
  // reference SetAdaptor.scala:87-104) is enforced per-statement in
  // ScriptRunner.executeSet — no context state needed

  /** Env view for templating a `select` body: un_select keys hidden. */
  def selectEnv: collection.Map[String, String] =
    if (unSelectKeys.isEmpty) env else env.filter { case (k, _) => !unSelectKeys.contains(k) }

  /** Streaming queries started by this script, keyed by streamName
    * (reference: MLSQLStreamManager.scala:68-80).
    */
  val streams: mutable.Map[String, org.apache.spark.sql.streaming.StreamingQuery] =
    mutable.LinkedHashMap()

  /** `set streamName="x"` marks the script as streaming (LoadAdaptor.scala:72-78). */
  def streamName: Option[String] = env.get("streamName").filter(_.nonEmpty)

  /** Re-root a relative path under the script's prefix (tenant home dir).
    * The joined path is normalized and must STAY under the prefix — a
    * `../other-tenant/...` escape is an error, not a silent write into
    * someone else's home. Absolute and scheme-qualified paths pass through
    * by design (shared read datasets); restricting those needs a
    * deployment-level allowlist, not path surgery.
    */
  def resolvePath(p: String): String =
    if (pathPrefix.isEmpty || p.startsWith("/") || p.contains("://")) p
    else {
      val joined = java.nio.file.Paths.get(pathPrefix, p).normalize().toString
      val root = java.nio.file.Paths.get(pathPrefix).normalize().toString
      require(joined == root || joined.startsWith(root + "/"),
        s"path '$p' escapes the script's home prefix '$pathPrefix'")
      joined
    }

  def lastDataFrame: Option[DataFrame] = lastTable.map(spark.table)

  def setLast(name: String, df: DataFrame): Unit = {
    df.createOrReplaceTempView(name)
    lastTable = Some(name)
  }
}

/** Engine-lifetime named script fragments for `include view.`name`` /
  * `include function.`name`` (offline analog of the reference's
  * analyst-console include sources, IncludeAdaptor.scala:74-82 — there the
  * store is an HTTP service, here an in-session registry fed by the
  * ScriptFragment ET). Includes are TEXTUAL and resolve at parse time, so
  * a fragment must be registered by an earlier script run (or an earlier
  * statement of a wrapping RunScript), same as the reference's
  * save-then-include flow.
  */
object ScriptFragmentStore {
  // namespaced like ConnectMeta: a tenant's fragments are code later
  // SPLICED into scripts — cross-tenant visibility would be code injection
  private val fragments = new ConcurrentHashMap[(String, String), String]()
  def put(ns: String, name: String, content: String): Unit =
    fragments.put((ns, name), content)
  def get(ns: String, name: String): Option[String] =
    Option(fragments.get((ns, name)))
      .orElse(if (ns.isEmpty) None else Option(fragments.get(("", name))))
  def names: Seq[String] = {
    import scala.jdk.CollectionConverters._
    fragments.keySet().asScala.toSeq.map(_._2).sorted
  }
}

/** Engine-lifetime `connect` alias store, namespaced by the registering
  * script's path prefix (= tenant home under [[Engine]]): an alias carries
  * CREDENTIALS, so one tenant's `connect ... as db1` must not be reachable
  * from another tenant's session. Aliases registered with no prefix (the
  * single-tenant runner / an admin bootstrap script) are visible to all.
  */
object ConnectMeta {
  private val options = new ConcurrentHashMap[(String, String, String), Map[String, String]]()
  def put(ns: String, format: String, alias: String, opts: Map[String, String]): Unit =
    options.put((ns, format, alias), opts)
  def get(ns: String, format: String, alias: String): Option[Map[String, String]] =
    Option(options.get((ns, format, alias)))
      .orElse(if (ns.isEmpty) None else Option(options.get(("", format, alias))))
}
