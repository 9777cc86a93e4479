package graft.dsl

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.SparkSession

/** Engine-lifetime registry of RUNNING batch script jobs, mapping each
  * script run to a Spark job group so it can be listed and cancelled from
  * another session thread (reference: tech.mlsql.job.JobManager +
  * SQLMLSQLJobExt's `!kill` — RestController.scala:119-131 registers, the
  * ET cancels by group). Streaming queries are managed separately
  * ([[graft.ets.StreamCommandET]] / `!killStream`): a stream outlives its
  * script run, a batch job IS its script run.
  *
  * Every [[ScriptRunner.run]] registers here: the group id is attached to
  * the running thread via `setJobGroup(interruptOnCancel = true)`, so
  * `cancelJobGroup` aborts all Spark jobs the script has in flight and the
  * script fails at its next action with a cancellation error.
  */
object JobManager {
  /** `owner` = the registering script's pathPrefix: the tenant namespace
    * for list/kill (ConnectMeta and ScriptFragmentStore scope the same
    * way). Empty = the un-prefixed engine-level context.
    */
  final case class JobInfo(groupId: String, name: String, startMs: Long,
                           owner: String = "")

  private val jobs = TrieMap[String, JobInfo]()
  // parent job-group id per registered group: a NESTED ScriptRunner.run
  // (RunScript / IteratorCommand ETs) must restore the outer script's group
  // on exit, not clear it — else the outer run becomes unkillable
  private val parents = TrieMap[String, String]()

  def register(spark: SparkSession, name: String, owner: String = ""): String = {
    val groupId = java.util.UUID.randomUUID().toString
    Option(spark.sparkContext.getLocalProperty("spark.jobGroup.id"))
      .foreach(parents.put(groupId, _))
    spark.sparkContext.setJobGroup(groupId, s"graft-script:$name", interruptOnCancel = true)
    jobs.put(groupId, JobInfo(groupId, name, System.currentTimeMillis(), owner))
    groupId
  }

  def deregister(spark: SparkSession, groupId: String): Unit = {
    jobs.remove(groupId)
    parents.remove(groupId) match {
      case Some(parent) =>
        spark.sparkContext.setLocalProperty("spark.jobGroup.id", parent)
      case None => spark.sparkContext.clearJobGroup()
    }
  }

  /** Jobs visible to `owner`: a tenant (non-empty prefix) sees ONLY its
    * own runs — another tenant's job names and group ids are kill handles
    * and must not leak. The un-prefixed engine context is the admin view
    * and sees everything.
    */
  def list(owner: String = ""): Seq[JobInfo] = {
    val all = jobs.values.toSeq.sortBy(_.startMs)
    if (owner.isEmpty) all else all.filter(_.owner == owner)
  }

  /** Rename a running job once its script-declared name is known
    * (`set jobName` evaluates in the preprocess pass, after registration).
    */
  def rename(groupId: String, name: String): Unit =
    jobs.updateWith(groupId)(_.map(_.copy(name = name)))

  /** Cancel every running script whose name OR group id matches; returns
    * the cancelled group ids. Cancels future jobs of the group too — a
    * script is a SEQUENCE of Spark jobs, and a kill between two of them
    * must stop the next statement from launching, not just abort the
    * current stage. The registry entry is removed by the owning thread's
    * deregister when the cancelled run unwinds.
    */
  def kill(spark: SparkSession, nameOrGroup: String, owner: String = ""): Seq[String] = {
    val targets = list(owner)
      .filter(j => j.name == nameOrGroup || j.groupId == nameOrGroup)
    targets.foreach(j => spark.sparkContext.cancelJobGroupAndFutureJobs(j.groupId))
    targets.map(_.groupId)
  }
}
