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
  final case class JobInfo(groupId: String, name: String, startMs: Long)

  private val jobs = TrieMap[String, JobInfo]()
  // parent job-group id per registered group: a NESTED ScriptRunner.run
  // (RunScript / IteratorCommand ETs) must restore the outer script's group
  // on exit, not clear it — else the outer run becomes unkillable
  private val parents = TrieMap[String, String]()

  def register(spark: SparkSession, name: String): String = {
    val groupId = java.util.UUID.randomUUID().toString
    Option(spark.sparkContext.getLocalProperty("spark.jobGroup.id"))
      .foreach(parents.put(groupId, _))
    spark.sparkContext.setJobGroup(groupId, s"graft-script:$name", interruptOnCancel = true)
    jobs.put(groupId, JobInfo(groupId, name, System.currentTimeMillis()))
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

  def list: Seq[JobInfo] = jobs.values.toSeq.sortBy(_.startMs)

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
  def kill(spark: SparkSession, nameOrGroup: String): Seq[String] = {
    val targets = jobs.values.filter(j => j.name == nameOrGroup || j.groupId == nameOrGroup)
    targets.foreach(j => spark.sparkContext.cancelJobGroupAndFutureJobs(j.groupId))
    targets.map(_.groupId).toSeq
  }
}
