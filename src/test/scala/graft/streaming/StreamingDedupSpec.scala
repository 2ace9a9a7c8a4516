package graft.streaming

import graft.format.TokenRow
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamingDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming dedup keeps only the first occurrence across micro-batches") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[TokenRow]
    val q = StreamingDedup.firstOccurrences(mem.toDS())
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      // batch 0: a duplicate pair inside one batch (min doc_id survives)
      mem.addData(
        TokenRow("3", Array(1, 2, 3), 3, "s"),
        TokenRow("1", Array(1, 2, 3), 3, "s"),
        TokenRow("2", Array(9), 1, "s"))
      q.processAllAvailable()
      // batch 1: a cross-batch duplicate (state remembers batch 0) + a new doc
      mem.addData(
        TokenRow("4", Array(1, 2, 3), 3, "s"),
        TokenRow("5", Array(7, 7), 2, "s"))
      q.processAllAvailable()
      val out = spark.table("dedup_out").as[TokenRow].collect()
      assert(out.map(_.doc_id).sorted.toSeq == Seq("1", "2", "5"),
        s"got ${out.map(_.doc_id).mkString(",")}")
      // content survives intact
      assert(out.find(_.doc_id == "1").get.tokens.toSeq == Seq(1, 2, 3))
    } finally q.stop()
  }

  test("content key is order- and length-sensitive") {
    val k1 = StreamingDedup.contentKey(Array(1, 2, 3))
    assert(k1 == StreamingDedup.contentKey(Array(1, 2, 3)))
    assert(k1 != StreamingDedup.contentKey(Array(3, 2, 1)))
    assert(k1 != StreamingDedup.contentKey(Array(1, 2, 3, 0)))
    assert(StreamingDedup.contentKey(Array(0)) != StreamingDedup.contentKey(Array(0, 0)))
    assert(StreamingDedup.contentKey(Array.emptyIntArray) !=
      StreamingDedup.contentKey(Array(0)))
  }
}
