package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  test("mediaTable: blob bytes are the UTF-8 text, metadata is derived") {
    val m = Multimodal.mediaTable(docs(0L -> "abc", 4L -> "xy"))
    val r = rowsOf(m.select(col("media_id"), col("media"),
      col("meta.mime").as("mime"), col("meta.width").as("width")))
      .sortBy(_("media_id").asInstanceOf[Long])
    assert(r(0)("media").asInstanceOf[Array[Byte]].toSeq == "abc".getBytes("UTF-8").toSeq)
    assert(r(0)("mime") == "image/png") // 0 % 3
    assert(r(1)("mime") == "audio/wav") // 4 % 3 = 1
    assert(r(1)("width") == 16 + 4)
  }

  test("decodeFeatures: n_bytes, md5, byte_sum over known bytes") {
    val f = Multimodal.mediaTable(docs(1L -> "AB"))
      .select(Multimodal.decodeFeatures(col("media")).as("f"))
      .select("f.n_bytes", "f.checksum", "f.byte_sum")
    val r = rowsOf(f).head
    assert(r("n_bytes") == 2)
    assert(r("byte_sum") == 65L + 66L)
    assert(r("checksum") == // md5("AB")
      java.security.MessageDigest.getInstance("MD5")
        .digest("AB".getBytes).map("%02x".format(_)).mkString)
  }

  test("frameSample: full strided windows only; short blobs yield none") {
    // 80 bytes, frame 32, stride 16 -> starts 1,17,33,49 -> 4 frames
    val long = "x" * 80
    val out = Multimodal.frameSample(
      Multimodal.mediaTable(docs(1L -> long, 2L -> "short")), 32, 16)
    val byDoc = rowsOf(out).groupBy(_("media_id"))
    assert(byDoc(1L).size == 4)
    assert(!byDoc.contains(2L))
    assert(byDoc(1L).forall(_("frame_len") == 32))
  }

  test("frameSample frame content: md5 matches the byte slice") {
    val text = (0 until 48).map(i => ('a' + i % 26).toChar).mkString
    val out = Multimodal.frameSample(Multimodal.mediaTable(docs(1L -> text)), 32, 16)
    val r = rowsOf(out).sortBy(_("frame_idx").asInstanceOf[Int])
    assert(r.size == 2)
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest(text.substring(16, 48).getBytes).map("%02x".format(_)).mkString
    assert(r(1)("frame_md5") == expect)
  }

  test("decodePartitions: batched stub decode preserves rows and values") {
    val m = Multimodal.mediaTable(docs(1L -> "abc", 2L -> "defg")).repartition(2)
    val out = Multimodal.decodePartitions(m).collect().sortBy(_.media_id)
    assert(out.map(_.n_bytes).toSeq == Seq(3, 4))
    assert(out(0).checksum ==
      java.security.MessageDigest.getInstance("MD5")
        .digest("abc".getBytes).map("%02x".format(_)).mkString)
  }

  test("dedupMedia: identical blobs collapse to the smallest id, digests shuffle, blobs don't") {
    import graft.multimodal.Multimodal
    val docs = Seq(
      (7L, "same bytes"), (3L, "same bytes"), (9L, "same bytes"),
      (5L, "unique bytes")).toDF("doc_id", "text")
    val out = Multimodal.dedupMedia(Multimodal.mediaTable(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(3L -> 3L, 5L -> 1L))
    // the aggregate's shuffle carries digests + ids, never the blob
    val plan = Multimodal.dedupMedia(Multimodal.mediaTable(docs))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_min") || plan.contains("HashAggregate"))
  }

  test("metadata-only query prunes the blob column from the scan") {
    val dir = java.nio.file.Files.createTempDirectory("mmode").toString
    Multimodal.mediaTable(docs(1L -> "abc")).write.mode("overwrite").parquet(dir)
    val plan = spark.read.parquet(dir).select("media_id", "meta.mime")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("media#") || !plan.split("ReadSchema")(1).contains("binary"))
  }
}
