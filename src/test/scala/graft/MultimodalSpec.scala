package graft

import java.nio.ByteBuffer

import graft.ext.{MediaHeaders, Multimodal}

class MultimodalSpec extends SparkSpecBase {

  private def png(w: Int, h: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(33)
    bb.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    bb.putInt(13).put("IHDR".getBytes)
    bb.putInt(w).putInt(h)
    bb.put(8.toByte).put(6.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    bb.array()
  }

  private def jpeg(w: Int, h: Int): Array[Byte] = {
    // SOI, APP0 (len 4, empty), SOF0 with dims, 3 channels
    val bb = ByteBuffer.allocate(2 + 4 + 2 + 10)
    bb.put(0xff.toByte).put(0xd8.toByte)
    bb.put(0xff.toByte).put(0xe0.toByte).putShort(4.toShort).putShort(0.toShort)
    bb.put(0xff.toByte).put(0xc0.toByte).putShort(8.toShort)
      .put(8.toByte).putShort(h.toShort).putShort(w.toShort).put(3.toByte)
    bb.array()
  }

  private def wav(channels: Int, rate: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16)
      .putShort(1.toShort).putShort(channels.toShort).putInt(rate)
      .putInt(rate * channels * 2).putShort((channels * 2).toShort)
      .putShort(16.toShort)
    bb.put("data".getBytes).putInt(0)
    bb.array()
  }

  test("container headers parse without codec libraries") {
    assert(MediaHeaders.parse(png(640, 480)).contains(
      MediaHeaders.Header("png", 640, 480, 0)))
    assert(MediaHeaders.parse(jpeg(320, 240)).contains(
      MediaHeaders.Header("jpeg", 320, 240, 3)))
    assert(MediaHeaders.parse(wav(2, 44100)).contains(
      MediaHeaders.Header("wav", 44100, 0, 2)))
    assert(MediaHeaders.parse("not media at all".getBytes).isEmpty)
  }

  test("malformed RIFF with negative chunk size terminates with the fallback header") {
    // chunk size 0xFFFFFFF8 = -8 would freeze a naive `i += 8 + sz` scan
    val bb = ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36).put("WAVE".getBytes)
    bb.put("junk".getBytes).putInt(0xFFFFFFF8)
    val parsed = MediaHeaders.parse(bb.array()) // must return, not hang
    assert(parsed.contains(MediaHeaders.Header("wav", 0, 0, 0)))
  }

  test("resize preserves aspect ratio and caps the long side") {
    import spark.implicits._
    val frames = Seq((1L, png(640, 480)), (2L, png(60, 30))).toDF("doc_id", "payload")
    val features = Multimodal.decodeFeaturesOf(frames)
    val resized = Multimodal.resize(features, frames, maxSide = 64)
      .collect().map(r => r.doc_id -> r).toMap
    assert(resized(1L).width == 64 && resized(1L).height == 48)
    assert(resized(2L).width == 60 && resized(2L).height == 30) // under cap: untouched
    assert(resized(1L).payload.nonEmpty)
  }

  test("frame sampling explodes every nth frame with byte offsets") {
    import spark.implicits._
    val features = Seq(
      Multimodal.MediaFeatures(1L, 1000, "video", 64, 48, 3, 10),
      Multimodal.MediaFeatures(2L, 500, "img", 64, 48, 3, 1)
    ).toDS()
    val frames = Multimodal.sampleFrames(features, everyNth = 3).collect()
    val byDoc = frames.groupBy(_.doc_id)
    assert(byDoc(1L).map(_.frame_idx).sorted.sameElements(Seq(0, 3, 6, 9)))
    assert(byDoc(1L).find(_.frame_idx == 3).get.offset_bytes == 300)
    assert(!byDoc.contains(2L)) // images emit no frames
  }

  test("decodeFeaturesOf: real headers parsed, non-media falls back to the stub") {
    import spark.implicits._
    val frames = Seq(
      (1L, png(64, 32)), (2L, jpeg(100, 50)),
      (3L, wav(1, 16000)), (4L, "plain text payload".getBytes)
    ).toDF("doc_id", "payload")
    val out = Multimodal.decodeFeaturesOf(frames).collect()
      .map(f => f.doc_id -> f).toMap
    assert(out(1L).format == "png" && out(1L).width == 64 && out(1L).height == 32)
    assert(out(2L).format == "jpeg" && out(2L).width == 100)
    assert(out(3L).format == "wav" && out(3L).width == 16000 && out(3L).channels == 1)
    assert(Set("img", "audio", "video").contains(out(4L).format)) // stub path
    // deterministic stub
    val again = Multimodal.decodeFeaturesOf(frames).collect()
      .map(f => f.doc_id -> f).toMap
    assert(out == again)
  }
}
