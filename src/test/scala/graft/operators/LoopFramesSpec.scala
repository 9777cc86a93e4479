package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.LoopFrames
import org.apache.spark.sql.execution.LogicalRDD

/** Pins the ADVICE-r14 Mmr finding at its root: `Dataset.unpersist` is a
  * silent no-op on a localCheckpoint'ed frame (the blocks are RDD-level,
  * never registered with the CacheManager), while [[LoopFrames.release]]
  * actually frees them. Then proves the loop operators drop their round
  * frames: an Mmr rerank leaves at most its final selected checkpoint
  * behind, not k+1 block sets.
  */
class LoopFramesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def checkpointRddIds(df: org.apache.spark.sql.DataFrame): Seq[Int] =
    df.queryExecution.logical.collect {
      case lr: LogicalRDD => lr.rdd.id
    }

  private def persisted: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("Dataset.unpersist no-ops on a localCheckpoint; release frees it") {
    import spark.implicits._
    val ck = (1 to 100).toDF("x").localCheckpoint(true)
    val ids = checkpointRddIds(ck)
    assert(ids.size == 1, "a checkpointed frame is one LogicalRDD leaf")
    assert(persisted.contains(ids.head), "localCheckpoint persists its RDD")
    ck.unpersist(true) // blocking, and still a no-op for these blocks
    assert(persisted.contains(ids.head),
      "Dataset.unpersist must not be relied on for checkpoint blocks")
    LoopFrames.release(ck)
    assert(!persisted.contains(ids.head), "release frees the RDD blocks")
  }

  test("release on a non-checkpointed frame is a harmless no-op") {
    import spark.implicits._
    val plain = (1 to 10).toDF("x").filter($"x" > 2)
    LoopFrames.release(plain) // nothing to collect, must not throw
    assert(plain.count() == 8)
  }

  test("Mmr rerank leaves at most one checkpointed frame behind") {
    import spark.implicits._
    val before = persisted
    val cands = (for (q <- 1 to 3; d <- 1 to 8)
      yield (q, s"d$d", 1.0 - d * 0.05)).toDF("qid", "doc", "rel")
    val vecs = (1 to 8)
      .map(d => (s"d$d", Array.tabulate(4)(i => ((d + i) % 3).toDouble)))
      .toDF("id", "vec")
    val out = graft.operators.similarity.Mmr.rerank(
      cands, vecs, "qid", "doc", "rel", "id", "vec", k = 5)
    assert(out.count() == 15) // 3 queries x 5 picks
    val leaked = persisted -- before
    assert(leaked.size <= 1,
      s"k=5 rounds must not stack block sets; leaked RDD ids: $leaked")
    LoopFrames.release(out) // and the final frame itself releases cleanly
    assert((persisted -- before).isEmpty)
  }

  test("checkpoint keeps origin stats (broadcastable) while dropping constraints") {
    import spark.implicits._
    import org.apache.spark.sql.functions.broadcast
    // ADVICE r15: dropping originStats with the constraints made every
    // checkpointed frame report defaultSizeInBytes = Long.MaxValue, so
    // the STATIC planner could never broadcast a small loop frame
    val small = LoopFrames.checkpoint((1 to 50).toDF("node"))
    val stats = small.queryExecution.optimizedPlan.stats
    assert(stats.sizeInBytes < Long.MaxValue,
      s"checkpointed frame must keep a real size estimate, got ${stats.sizeInBytes}")
    // and the static planner actually broadcasts it against a big side,
    // with AQE off so only plan-time stats can make the decision
    val big = spark.range(0, 200000).toDF("node")
    withSQLConf("spark.sql.adaptive.enabled" -> "false") {
      val p = big.join(small, "node").queryExecution.executedPlan.toString
      assert(p.contains("BroadcastHashJoin"),
        s"static planner must broadcast the checkpointed small side:\n$p")
    }
    // the constraint half of the contract still holds: unions of two
    // checkpointed frames plan without Union.rewriteConstraints throwing
    val u = small.unionByName(LoopFrames.checkpoint((51 to 60).toDF("node")))
    assert(u.count() == 60)
    LoopFrames.release(small)
    LoopFrames.release(u)
  }

  private def withSQLConf(kv: (String, String))(f: => Unit): Unit = {
    val spark2 = spark
    val prev = scala.util.Try(spark2.conf.get(kv._1)).toOption
    spark2.conf.set(kv._1, kv._2)
    try f finally prev match {
      case Some(v) => spark2.conf.set(kv._1, v)
      case None => spark2.conf.unset(kv._1)
    }
  }
}
