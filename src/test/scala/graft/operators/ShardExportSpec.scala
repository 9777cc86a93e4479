package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.sampling.{CorpusShuffle, ShardExport}

/** Sharded export (p47 covers oracle parity of the rank/shard algebra;
  * these pin determinism across layouts and the one-file-per-shard write
  * contract).
  */
class ShardExportSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs(n: Int) = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, s"doc body $i")).toDF("doc_id", "text")
  }

  test("ranks are a gap-free permutation and shards are full except the last") {
    val out = ShardExport.assignShards(docs(103), "doc_id", rowsPerShard = 25, seed = 3L)
    val ranks = out.select("rank").collect().map(_.getLong(0)).sorted
    assert(ranks.sameElements(0L until 103L))
    val sizes = out.groupBy("shard").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes == Map(0L -> 25L, 1L -> 25L, 2L -> 25L, 3L -> 25L, 4L -> 3L))
  }

  test("assignment is a pure function of (id, seed): layout-independent") {
    val base = docs(200)
    def m(df: org.apache.spark.sql.DataFrame) =
      ShardExport.assignShards(df, "doc_id", 32, seed = 9L, partitions = 7)
        .select("doc_id", "rank", "shard").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m(base) == m(base.repartition(13)))
    assert(m(base) == m(base.orderBy(desc("doc_id"))))
  }

  test("rank order agrees with CorpusShuffle's order for the same seed") {
    val shuffled = CorpusShuffle.shuffle(docs(50), "doc_id", seed = 4L)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val byRank = ShardExport.assignShards(docs(50), "doc_id", 10, seed = 4L)
      .orderBy("rank").select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(byRank == shuffled)
  }

  test("write lays out ONE parquet file per shard plus a trusted manifest") {
    val dir = Files.createTempDirectory("graft_shards").toString + "/out"
    val manifest = ShardExport.write(docs(90), dir, "doc_id", rowsPerShard = 30, seed = 1L)
    val rows = manifest.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((0L, 30L), (1L, 30L), (2L, 30L)))
    for (shard <- 0 to 2) {
      val files = new java.io.File(s"$dir/shard=$shard").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"shard=$shard has ${files.length} files")
    }
    // round-trip: the data under shard dirs matches the manifest counts
    val back = spark.read.parquet(dir)
    assert(back.count() == 90L)
    assert(back.groupBy("shard").count().collect()
      .map(r => r.getLong(1)).forall(_ == 30L))
  }
}
