package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.text.ByteLevel

class ByteLevelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("byte alphabet is a 256-symbol bijection; unicode round-trips") {
    assert(ByteLevel.fullAlphabet.length == 256)
    assert(ByteLevel.fullAlphabet.distinct.length == 256)
    for (w <- Seq("hello", "héllo", "wörld", "☃snow", "日本語", "mixé☃"))
      assert(ByteLevel.decode(ByteLevel.encodeWord(w)) == w, w)
  }

  test("withByteText preserves space delimiters and round-trips per word") {
    import spark.implicits._
    val df = Seq("héllo wörld", null.asInstanceOf[String]).toDF("text")
    val out = ByteLevel.withByteText(df, "text", "bl").collect()
    val bl = out.map(_.getAs[String]("bl"))
    assert(bl(1) == null)
    assert(bl(0).split(" ").length == 2)
    assert(bl(0).split(" ").map(ByteLevel.decode).mkString(" ") == "héllo wörld")
  }

  test("byteLevel BPE model encodes UNSEEN unicode with zero -1 ids") {
    import graft.dsl.ScriptRunner
    val dir = java.nio.file.Files.createTempDirectory("bl_bpe").toString
    // train on plain ascii; encode text full of bytes never seen at train
    val out = ScriptRunner.runToDF(
      s"""set blc = '''{"doc_id":1,"text":"the cat sat on the mat"}
         |{"doc_id":2,"text":"that hat is flat"}''';
         |load jsonStr.`blc` as bl_docs;
         |train bl_docs as BpeTrain.`$dir/m` where numMerges="8"
         |  and byteLevel="true" as bl_m;
         |set ble = '''{"doc_id":9,"text":"czesc świat héllo 日本"}''';
         |load jsonStr.`ble` as bl_new;
         |predict bl_new as BpeTrain.`$dir/m` where output="ids" as bl_ids;
         |select doc_id, bpe_ids from bl_ids as out;""".stripMargin, spark)
      .collect()
    val ids = out.head.getSeq[Long](1)
    assert(ids.nonEmpty)
    assert(!ids.contains(-1L), s"byte-level must have no OOV, got $ids")
  }

  test("char-level model on the same unseen text DOES emit -1 (the gap byteLevel closes)") {
    import graft.dsl.ScriptRunner
    val dir = java.nio.file.Files.createTempDirectory("cl_bpe").toString
    val out = ScriptRunner.runToDF(
      s"""set clc = '''{"doc_id":1,"text":"the cat sat on the mat"}''';
         |load jsonStr.`clc` as cl_docs;
         |train cl_docs as BpeTrain.`$dir/m` where numMerges="4" as cl_m;
         |set cle = '''{"doc_id":9,"text":"héllo"}''';
         |load jsonStr.`cle` as cl_new;
         |predict cl_new as BpeTrain.`$dir/m` where output="ids" as cl_ids;
         |select bpe_ids from cl_ids as out;""".stripMargin, spark).collect()
    assert(out.head.getSeq[Long](0).contains(-1L))
  }
}
