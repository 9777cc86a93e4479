package graft.streaming

import java.util.concurrent.ConcurrentLinkedDeque
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Session-wide streaming lifecycle event log — the offline analog of the
  * reference's stream-manager HTTP callbacks (MLSQLStreamManager.scala:
  * 166-213 posts started/progress/terminated to a callback URL; with no
  * egress, the same events land in a bounded in-memory log readable as
  * `load _mlsql_.`streamEvents``).
  *
  * Scale note: the log is BOUNDED (latest [[MaxEvents]]) and lives on the
  * driver — lifecycle metadata, not data-plane rows.
  */
object StreamEventLog {
  final case class Event(name: String, id: String, runId: String,
                         event: String, batchId: Long, ts: java.sql.Timestamp)

  private val MaxEvents = 10000
  private val events = new ConcurrentLinkedDeque[Event]()
  // ConcurrentLinkedDeque.size() is O(n); track it ourselves — add() runs
  // on the shared listener-bus thread for every progress event
  private val approxSize = new java.util.concurrent.atomic.AtomicInteger(0)
  // identity-keyed weak set: no hash collisions (identityHashCode isn't
  // unique), and a GC'd session's manager doesn't pin the entry
  private val installed = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.sql.streaming.StreamingQueryManager, java.lang.Boolean]())

  private def add(e: Event): Unit = {
    events.addLast(e)
    if (approxSize.incrementAndGet() > MaxEvents) {
      events.pollFirst()
      approxSize.decrementAndGet()
    }
  }

  /** Idempotently attach the listener to this session's stream manager.
    * Called from the stream-sink start path so every graft-started query is
    * covered from its first event.
    */
  def install(spark: SparkSession): Unit = {
    if (installed.putIfAbsent(spark.streams, java.lang.Boolean.TRUE) != null) return
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(ev: StreamingQueryListener.QueryStartedEvent): Unit =
        add(Event(Option(ev.name).getOrElse(""), ev.id.toString, ev.runId.toString,
          "started", -1L, new java.sql.Timestamp(System.currentTimeMillis())))
      override def onQueryProgress(ev: StreamingQueryListener.QueryProgressEvent): Unit =
        add(Event(Option(ev.progress.name).getOrElse(""), ev.progress.id.toString,
          ev.progress.runId.toString, "progress", ev.progress.batchId,
          new java.sql.Timestamp(System.currentTimeMillis())))
      override def onQueryTerminated(ev: StreamingQueryListener.QueryTerminatedEvent): Unit =
        add(Event("", ev.id.toString, ev.runId.toString,
          ev.exception.map(x => s"terminated: $x").getOrElse("terminated"), -1L,
          new java.sql.Timestamp(System.currentTimeMillis())))
    })
  }

  def toDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    events.iterator().asScala.toSeq
      .map(e => (e.name, e.id, e.runId, e.event, e.batchId, e.ts))
      .toDF("name", "id", "run_id", "event", "batch_id", "ts")
  }

  private[graft] def clear(): Unit = { events.clear(); approxSize.set(0) }
}
