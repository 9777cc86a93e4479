package org.apache.spark.sql.graftshim

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnsafeProjection
import org.apache.spark.sql.execution.arrow.ArrowConverters
import org.apache.spark.sql.types.StructType

/** Executor-side Arrow pipe: stream a DataFrame partition through an
  * external worker process as framed Arrow IPC and read framed Arrow IPC
  * back — the offline re-expression of the reference's Python script
  * runtime (streamingpro's SQLPythonAlg / tech/mlsql/ets/PythonCommand
  * .scala:405 ship data to a python process; Ray.scala:52-300 does the
  * same over Arrow). No Py4J, no Jython: plain subprocess + Arrow IPC,
  * which is exactly what `mapInArrow` does under PySpark's hood.
  *
  * Protocol (both directions): 4-byte big-endian length prefix, then one
  * SELF-CONTAINED Arrow IPC stream (schema + record batches + EOS) per
  * frame; EOF ends the conversation. Self-contained frames keep both ends
  * trivially restartable mid-stream and let the Scala side validate the
  * worker's schema on every frame.
  *
  * Scale shape: one worker per PARTITION (spawned lazily, skipped for
  * empty partitions), rows flow batch-by-batch (`batchSize` rows per
  * frame) with a writer thread so neither pipe can deadlock on a full
  * buffer. Work is embarrassingly parallel across partitions — the
  * 100 TB posture is identical to PySpark's own mapInArrow (one python
  * worker per core), minus worker reuse across tasks (a per-task exec()
  * of the user code; acceptable for whole-table transforms, wasteful for
  * tiny partitions — repartition first).
  */
object ArrowBridge {

  /** Pipe `df` through `command` partition-wise. `outSchema` is the
    * analysis-time contract (like mapInArrow's schema argument); every
    * frame the worker sends back is validated against it (names + types,
    * nullability ignored).
    *
    * @param env extra environment variables for the worker (e.g. the
    *            user code — env survives any quoting the code needs)
    */
  def pipe(df: DataFrame, outSchema: StructType, command: Seq[String],
           env: Map[String, String], batchSize: Int = 4096,
           timeoutSec: Int = 600): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val inSchema = df.schema
    val tz = spark.sessionState.conf.sessionLocalTimeZone
    val rdd = df.queryExecution.toRdd.mapPartitions { rows =>
      pipePartition(rows, inSchema, outSchema, tz, command, env, batchSize,
        timeoutSec)
    }
    spark.internalCreateDataFrame(rdd, outSchema, isStreaming = false)
  }

  private def pipePartition(rows: Iterator[InternalRow], inSchema: StructType,
                            outSchema: StructType, timeZoneId: String,
                            command: Seq[String], env: Map[String, String],
                            batchSize: Int, timeoutSec: Int): Iterator[InternalRow] = {
    if (!rows.hasNext) return Iterator.empty // no worker for empty partitions
    val errFile = java.io.File.createTempFile("graft_arrow_worker_", ".stderr")
    val pb = new ProcessBuilder(command.asJava)
    env.foreach { case (k, v) => pb.environment().put(k, v) }
    pb.redirectError(ProcessBuilder.Redirect.to(errFile))
    val proc = pb.start()

    // input side: framed self-contained IPC payloads, written from a
    // dedicated thread — writing everything before reading would deadlock
    // once both OS pipe buffers fill (the classic bidirectional-pipe trap)
    val payloads = ArrowConverters.toBatchWithSchemaIterator(
      rows, inSchema, batchSize.toLong, 64L << 20, timeZoneId,
      true, false)
    val taskCtx = org.apache.spark.TaskContext.get()
    @volatile var writeErr: Throwable = null
    val writer = new Thread(() => {
      // the writer pulls the TASK's row iterator from its own thread:
      // upstream operators that consult TaskContext.get() mid-iteration
      // (metrics, memory accounting, sort spill readers) need the context
      // propagated here, exactly as PySpark's PythonRunner writer does
      if (taskCtx != null) org.apache.spark.TaskContext.setTaskContext(taskCtx)
      val out = new java.io.DataOutputStream(
        new java.io.BufferedOutputStream(proc.getOutputStream))
      try {
        while (payloads.hasNext) {
          val p = payloads.next()
          out.writeInt(p.length); out.write(p)
        }
        out.flush(); out.close()
      } catch { case t: Throwable =>
        writeErr = t
        try proc.getOutputStream.close() catch { case _: Throwable => () }
      }
    }, "graft-arrow-writer")
    writer.setDaemon(true)
    writer.start()

    // Lifecycle is tied to the TASK, not to full consumption of the output
    // iterator: a downstream limit/take, task kill, or exception abandons
    // the iterator mid-stream, which previously leaked the python process,
    // the writer thread, and the stderr temp file for the executor's
    // lifetime (ADVICE r19). destroyForcibly on an already-exited process
    // and a second errFile.delete() are no-ops, so the normal path is
    // unaffected.
    if (taskCtx != null) taskCtx.addTaskCompletionListener[Unit] { _ =>
      if (proc.isAlive) proc.destroyForcibly()
      writer.interrupt()
      errFile.delete()
    }

    val in = new java.io.BufferedInputStream(proc.getInputStream)
    val proj = UnsafeProjection.create(outSchema)

    def errTail(): String = try {
      val bytes = java.nio.file.Files.readAllBytes(errFile.toPath)
      val s = new String(bytes, "UTF-8")
      if (s.length > 2000) "..." + s.substring(s.length - 2000) else s
    } catch { case _: Throwable => "<stderr unavailable>" }

    // Bounded fill: a worker whose user code blocks forever must not hold
    // the Spark task until an external kill (VERDICT r19 #4). Reads poll
    // `available()` under an INACTIVITY deadline — reset on every byte, so
    // a slow-but-alive transform never trips it — and on expiry the worker
    // is destroyed and the failure carries the stderr tail. Returns false
    // on clean EOF before the first byte (only legal between frames).
    def fillBounded(buf: Array[Byte], len: Int, allowEof: Boolean): Boolean = {
      var got = 0
      var deadlineNs = System.nanoTime() + timeoutSec * 1000000000L
      var deadGrace = 0
      while (got < len) {
        val avail = in.available()
        if (avail > 0) {
          val n = in.read(buf, got, math.min(len - got, avail))
          if (n > 0) { got += n; deadlineNs = System.nanoTime() + timeoutSec * 1000000000L }
        } else if (!proc.isAlive) {
          // exited with the pipe drained — allow a couple of polls for
          // late-buffered bytes to surface, then treat as EOF
          deadGrace += 1
          if (deadGrace > 3) {
            if (got == 0 && allowEof) return false
            throw new java.io.EOFException(
              s"worker exited mid-frame after $got/$len bytes (stderr: ${errTail()})")
          }
          Thread.sleep(20)
        } else if (System.nanoTime() > deadlineNs) {
          proc.destroyForcibly()
          throw new RuntimeException(
            s"arrow worker '${command.head}' produced no output for ${timeoutSec}s — killed (stderr: ${errTail()})")
        } else Thread.sleep(5)
      }
      true
    }

    def readFrame(): Array[Byte] = {
      val hdr = new Array[Byte](4)
      if (!fillBounded(hdr, 4, allowEof = true)) return null // clean EOF
      val len = ((hdr(0) & 0xff) << 24) | ((hdr(1) & 0xff) << 16) |
        ((hdr(2) & 0xff) << 8) | (hdr(3) & 0xff)
      require(len >= 0 && len < (1 << 30), s"bad worker frame length $len")
      val buf = new Array[Byte](len)
      fillBounded(buf, len, allowEof = false)
      buf
    }

    new Iterator[InternalRow] {
      private var cur: Iterator[InternalRow] = Iterator.empty
      private var done = false

      private def finish(): Unit = {
        writer.join(30000)
        // bounded wait (ADVICE r19): the worker already closed stdout, so
        // a healthy one exits immediately; one that ignores EOF is killed
        // and reported rather than holding the task forever
        if (!proc.waitFor(timeoutSec.toLong, java.util.concurrent.TimeUnit.SECONDS)) {
          proc.destroyForcibly()
          throw new RuntimeException(
            s"arrow worker '${command.head}' did not exit within ${timeoutSec}s of end-of-stream — killed (stderr: ${errTail()})")
        }
        val rc = proc.exitValue()
        if (writeErr != null)
          throw new RuntimeException(
            s"failed streaming rows to the worker (worker stderr: ${errTail()})",
            writeErr)
        if (rc != 0)
          throw new RuntimeException(
            s"arrow worker '${command.head}' exited $rc: ${errTail()}")
        errFile.delete()
      }

      private def advance(): Unit = {
        while (!cur.hasNext && !done) {
          val frame = try readFrame() catch {
            case e: java.io.IOException =>
              throw new RuntimeException(
                s"truncated frame from arrow worker (stderr: ${errTail()})", e)
          }
          if (frame == null) { done = true; finish() }
          else {
            val (it, sch) = ArrowConverters.fromIPCStream(frame)
            if (sch.asNullable != outSchema.asNullable) {
              try it.close() catch { case _: Throwable => () }
              proc.destroyForcibly()
              throw new IllegalStateException(
                s"arrow worker returned schema ${sch.toDDL}, expected ${outSchema.toDDL}")
            }
            // copy out of the Arrow-backed columnar rows before the frame's
            // buffers are released; batches are <= batchSize rows
            val arr = try it.map(r => proj(r).copy().asInstanceOf[InternalRow]).toArray
            finally { try it.close() catch { case _: Throwable => () } }
            cur = arr.iterator
          }
        }
      }

      override def hasNext: Boolean = { advance(); cur.hasNext }
      override def next(): InternalRow = { advance(); cur.next() }
    }
  }
}
