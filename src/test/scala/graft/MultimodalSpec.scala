package graft

import java.nio.ByteBuffer

import graft.ext.{MediaCodecs, MediaHeaders, Multimodal}

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

  test("PPM P6 decode: hand-built file yields exact known pixel statistics") {
    val px = Array[Int](10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
    val file = ("P6\n2 2\n255\n".getBytes("US-ASCII") ++
      px.map(_.toByte)).toArray
    val img = MediaCodecs.decodePnm(file).get
    assert(img.format == "ppm" && img.width == 2 && img.height == 2 &&
      img.channels == 3)
    assert(img.pixels.map(_ & 0xff).sameElements(px))
    val (mean, std) = MediaCodecs.pixelStats(img)
    assert(mean == 65.0) // sum 780 / 12
    assert(math.abs(std - 34.520526) < 1e-5) // sqrt(65000/12 - 65^2)
    // header comments and multi-whitespace are spec-legal
    val commented = ("P6 # rgb\n# full-line comment\n 2\t2 \n255\n"
      .getBytes("US-ASCII") ++ px.map(_.toByte)).toArray
    assert(MediaCodecs.decodePnm(commented).get.pixels
      .sameElements(img.pixels))
  }

  test("BMP decode: hand-built bottom-up padded BGR rows come out top-down RGB") {
    // 2x2, 24bpp: stride = 8 (2*3 rounded up to 4). Rows written bottom-up.
    val bb = ByteBuffer.allocate(54 + 16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(70).putInt(0).putInt(54)
    bb.putInt(40).putInt(2).putInt(2).putShort(1).putShort(24).putInt(0)
    bb.putInt(16).putInt(0).putInt(0).putInt(0).putInt(0)
    // bottom row first: pixels (BGR): (3,2,1) (6,5,4) + 2 pad bytes
    bb.put(Array[Byte](3, 2, 1, 6, 5, 4, 0, 0))
    // top row: (9,8,7) (12,11,10) + pad
    bb.put(Array[Byte](9, 8, 7, 12, 11, 10, 0, 0))
    val img = MediaCodecs.decodeBmp(bb.array()).get
    assert(img.width == 2 && img.height == 2 && img.channels == 3)
    // top-down RGB: top row first, BGR->RGB swapped
    assert(img.pixels.sameElements(
      Array[Byte](7, 8, 9, 10, 11, 12, 1, 2, 3, 4, 5, 6)))
  }

  test("BMP and PPM encode/decode round-trip preserves pixels exactly") {
    // width 3 exercises BMP's 4-byte row padding (stride 12, row 9)
    val px = Array.tabulate(3 * 2 * 3)(i => (i * 41 % 256).toByte)
    for (fmt <- Seq("bmp", "ppm")) {
      val img = MediaCodecs.ImagePixels(fmt, 3, 2, 3, px)
      val decoded = MediaCodecs.decodeImage(MediaCodecs.encodeImage(img)).get
      assert(decoded.format == fmt && decoded.width == 3 && decoded.height == 2)
      assert(decoded.pixels.sameElements(px), fmt)
    }
    val gray = MediaCodecs.ImagePixels("pgm", 4, 3, 1,
      Array.tabulate(12)(i => (i * 20).toByte))
    val decodedGray = MediaCodecs.decodeImage(MediaCodecs.encodePnm(gray)).get
    assert(decodedGray.channels == 1 && decodedGray.pixels.sameElements(gray.pixels))
  }

  test("box-filter resize averages each source block exactly") {
    // 4x4 gray; each 2x2 block {a, a+2, a+8, a+10} averages to a+5
    val src = MediaCodecs.ImagePixels("pgm", 4, 4, 1, Array[Byte](
      0, 2, 100, 102,
      8, 10, 108, 110,
      40, 42, (200 - 256).toByte, (202 - 256).toByte,
      48, 50, (208 - 256).toByte, (210 - 256).toByte))
    val out = MediaCodecs.resizeImage(src, 2, 2)
    assert(out.pixels.map(_ & 0xff).sameElements(Array(5, 105, 45, 205)))
    // 1:1 resize is identity
    assert(MediaCodecs.resizeImage(src, 4, 4).pixels.sameElements(src.pixels))
  }

  test("WAV PCM decode: hand-built 16-bit and 8-bit samples with known stats") {
    val samples = Array(0.0, 0.5, -0.5, 1.0)
    val a16 = MediaCodecs.decodeWav(
      MediaCodecs.encodeWav16(8000, 1, samples)).get
    assert(a16.sampleRate == 8000 && a16.channels == 1 &&
      a16.bitsPerSample == 16)
    // 16-bit quantization: round(0.5*32767)=16384, round(-16383.5)=-16383
    assert(a16.samples(0) == 0.0 && a16.samples(1) == 16384.0 / 32768 &&
      a16.samples(2) == -16383.0 / 32768)
    assert(math.abs(a16.samples(3) - 32767.0 / 32768) < 1e-12)
    assert(a16.durationSec == 4.0 / 8000)
    val (rms, peak) = MediaCodecs.pcmStats(a16)
    val expectedRms = math.sqrt(a16.samples.map(s => s * s).sum / 4)
    assert(math.abs(rms - expectedRms) < 1e-12)
    assert(peak == 32767.0 / 32768)
    // 8-bit unsigned: 128 -> 0.0, 255 -> 0.9921875, 0 -> -1.0
    val bb = ByteBuffer.allocate(47).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(39).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(16000).putInt(16000).putShort(1).putShort(8)
    bb.put("data".getBytes).putInt(3)
    bb.put(128.toByte).put(255.toByte).put(0.toByte)
    val a8 = MediaCodecs.decodeWav(bb.array()).get
    assert(a8.bitsPerSample == 8 &&
      a8.samples.sameElements(Array(0.0, 127.0 / 128, -1.0)))
  }

  test("compressed or malformed payloads refuse real decode (stub path keeps them)") {
    // header-only fixtures carry no entropy-coded data: ImageIO must
    // refuse them cleanly (None), not throw into the task
    assert(MediaCodecs.decodeImage(png(8, 8)).isEmpty)
    assert(MediaCodecs.decodeImage(jpeg(8, 8)).isEmpty)
    assert(MediaCodecs.decodeWav("RIFFxxxxWAVE".getBytes).isEmpty)
    // crafted chunk size near Int.MaxValue must not wrap the offset
    // negative (would index b() out of range) — refuse, don't throw
    val evil = ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    evil.put("RIFF".getBytes).putInt(56).put("WAVE".getBytes)
    evil.put("junk".getBytes).putInt(Int.MaxValue - 4)
    assert(MediaCodecs.decodeWav(evil.array()).isEmpty)
    // truncated PPM (header promises more pixels than present)
    assert(MediaCodecs.decodePnm("P6\n9 9\n255\nxy".getBytes).isEmpty)
    // 8-bpp BMP (palette) is not an uncompressed-24bpp decode target
    val bmp8 = MediaCodecs.encodeBmp(MediaCodecs.ImagePixels("bmp", 1, 1, 3,
      Array[Byte](1, 2, 3)))
    bmp8(28) = 8 // patch bpp
    assert(MediaCodecs.decodeBmp(bmp8).isEmpty)
  }

  test("PNG round-trips pixels exactly; JPEG preserves geometry and " +
      "approximate values (real ImageIO entropy codecs)") {
    val px = Array.tabulate(12 * 5 * 3)(i => (i * 7 % 256).toByte)
    val img = MediaCodecs.ImagePixels("png", 12, 5, 3, px)
    val bytes = MediaCodecs.encodePng(img)
    assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P') // real PNG file
    val dec = MediaCodecs.decodeImage(bytes).get
    assert(dec.format == "png" && dec.width == 12 && dec.height == 5 &&
      dec.channels == 3)
    assert(dec.pixels.sameElements(px), "PNG is lossless")
    // gray PNG stays 1-channel
    val gpx = Array.tabulate(9 * 4)(i => (i * 11 % 256).toByte)
    val gdec = MediaCodecs.decodeImage(MediaCodecs.encodePng(
      MediaCodecs.ImagePixels("png", 9, 4, 1, gpx))).get
    assert(gdec.channels == 1 && gdec.pixels.sameElements(gpx))
    // JPEG: lossy — exact geometry, close values on a near-flat image
    val flat = MediaCodecs.ImagePixels("jpeg", 16, 16, 3,
      Array.fill(16 * 16 * 3)(120.toByte))
    val jb = MediaCodecs.encodeJpeg(flat)
    assert((jb(0) & 0xff) == 0xff && (jb(1) & 0xff) == 0xd8) // real JFIF
    val jdec = MediaCodecs.decodeImage(jb).get
    assert(jdec.format == "jpeg" && jdec.width == 16 && jdec.height == 16)
    val (mean, std) = MediaCodecs.pixelStats(jdec)
    assert(math.abs(mean - 120.0) < 2.0 && std < 2.0)
    // GIF is decode-only (palette write would quantize): an ImageIO-
    // written gray ramp fits one palette, so decode must be exact
    val ramp = MediaCodecs.ImagePixels("png", 16, 16, 1,
      Array.tabulate(256)(i => i.toByte))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(
      {
        val bi = new java.awt.image.BufferedImage(16, 16,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        for (y <- 0 until 16; x <- 0 until 16)
          bi.getRaster.setSample(x, y, 0, ramp.pixels(y * 16 + x) & 0xff)
        bi
      }, "gif", baos)
    val gif = baos.toByteArray
    assert(gif(0) == 'G' && gif(1) == 'I' && gif(2) == 'F')
    val gdec2 = MediaCodecs.decodeImage(gif).get
    assert(gdec2.format == "gif" && gdec2.width == 16 && gdec2.height == 16)
    // GIF palettes are RGB: the gray ramp comes back 3-channel with
    // r=g=b equal to the source sample
    val ok = (0 until 256).forall { i =>
      val base = i * gdec2.channels
      val v = gdec2.pixels(base) & 0xff
      v == (ramp.pixels(i) & 0xff) &&
        (gdec2.channels == 1 || ((gdec2.pixels(base + 1) & 0xff) == v &&
          (gdec2.pixels(base + 2) & 0xff) == v))
    }
    assert(ok, "GIF gray-ramp decode must be lossless")
    // 16-bit gray PNG: must NOT be low-byte-truncated — it routes
    // through the bulk sRGB conversion (black stays black, white stays
    // white, midtones monotone)
    val b16 = new java.awt.image.BufferedImage(4, 1,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    val samples16 = Seq(0, 0x0100, 0x8000, 0xffff)
    samples16.zipWithIndex.foreach { case (s, x) =>
      b16.getRaster.setSample(x, 0, 0, s)
    }
    val baos16 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(b16, "png", baos16)
    val d16 = MediaCodecs.decodeImage(baos16.toByteArray).get
    val vals = (0 until 4).map(x => d16.pixels(x * d16.channels) & 0xff)
    assert(vals.head == 0 && vals.last == 255, s"got $vals")
    // naive truncation would map 0x0100 -> 0 and 0x8000 -> 0; the
    // scaled conversion keeps order and keeps 0x8000 far from black
    assert(vals == vals.sorted && vals(2) > 64, s"got $vals")
  }

  test("synthesized media corpus decodes to content-level stats (q71 path)") {
    import spark.implicits._
    val docs = Seq(
      (0L, "ab"), (1L, "hello world"), (2L, "xyz"), (3L, "ab"),
      (4L, "ab"), (5L, "ab"))
    val payloads = docs
      .map { case (id, t) => (id, Multimodal.synthesizeMedia(id, t.getBytes("UTF-8"))) }
      .toDF("doc_id", "payload")
    val out = Multimodal.contentStatsOf(payloads).collect()
      .map(s => s.doc_id -> s).toMap
    // id 0: BMP from "ab" (len 2): w=8+2%9=10, h=6+2%7=8, pixels repeat
    // [97,98] over 240 bytes -> mean 97.5 exactly, std 0.5
    assert(out(0L).format == "bmp" && out(0L).kind == "image")
    assert(out(0L).width.contains(10) && out(0L).height.contains(8))
    assert(out(0L).px_mean.contains(97.5) && out(0L).px_std.contains(0.5))
    assert(out(1L).format == "ppm" && out(1L).channels.contains(3))
    assert(out(2L).format == "pgm" && out(2L).channels.contains(1))
    // id 3: WAV from "ab": 8 samples at 8000 Hz -> 0.001 s
    assert(out(3L).format == "wav" && out(3L).kind == "audio")
    assert(out(3L).sample_rate.contains(8000))
    assert(out(3L).duration_s.contains(0.001))
    // peak = max |(97|98 - 128)/128| quantized to 16-bit
    assert(math.abs(out(3L).peak.get - 31.0 / 128) < 1e-3)
    // id 4: PNG (lossless) — identical stats to the BMP case
    assert(out(4L).format == "png" && out(4L).kind == "image")
    assert(out(4L).width.contains(10) && out(4L).height.contains(8))
    assert(out(4L).px_mean.contains(97.5) && out(4L).px_std.contains(0.5))
    // id 5: JPEG (lossy) — exact geometry, near-exact near-flat stats
    assert(out(5L).format == "jpeg" && out(5L).kind == "image")
    assert(out(5L).width.contains(10) && out(5L).height.contains(8))
    assert(math.abs(out(5L).px_mean.get - 97.5) < 2.0)
  }

  test("q72 resize path: real box-filter resample, not the byte-fold stub") {
    // 16x8 gradient PPM; maxSide 8 -> 8x4; constant rows resample exactly
    val px = Array.tabulate(16 * 8 * 3) { i => ((i / (16 * 3)) * 30).toByte }
    val img = MediaCodecs.ImagePixels("ppm", 16, 8, 3, px)
    val resized = MediaCodecs.resizeImage(img, 8, 4)
    // target row y averages source rows 2y,2y+1 -> (60y + 30y*... ) =
    // (30*(2y) + 30*(2y+1))/2 = 60y + 15
    for (y <- 0 until 4; x <- 0 until 8; c <- 0 until 3)
      assert((resized.pixels((y * 8 + x) * 3 + c) & 0xff) == 60 * y + 15)
    // and the re-encode is a valid file that decodes back
    assert(MediaCodecs.decodeImage(MediaCodecs.encodeImage(resized))
      .get.pixels.sameElements(resized.pixels))
  }

  test("q192 twin geometry: the integer floor-division target equals " +
      "q72's float scale-and-truncate on the synthesized corpus") {
    // the exact twin deliberately computes (nw, nh) with integer
    // division; this pin is the evidence the two forms agree wherever
    // both run, so q192 gates q72's kernel and not a different shape
    val q72 = graft.ext.Multimodal.resizeStats(spark, sf0001)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(4), r.getInt(5))).toMap
    val q192 = graft.ext.Multimodal.resizeStatsExact(spark, sf0001)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(4), r.getInt(5))).toMap
    assert(q192.nonEmpty)
    // q72 covers jpeg too; on the shared (lossless) ids the geometries
    // must be identical
    q192.foreach { case (id, wh) =>
      assert(q72(id) == wh, s"doc $id: q72 ${q72(id)} vs q192 $wh")
    }
  }

  test("resamplePcm: exact linear interpolation, duration preserved, identity at same rate") {
    import graft.ext.MediaCodecs
    // ramp 0, 0.2, 0.4, 0.6 at 4 Hz -> 8 Hz: midpoints interpolate,
    // tail clamps to the last frame
    val a = MediaCodecs.PcmAudio(4, 1, 16, Array(0.0, 0.2, 0.4, 0.6))
    val up = MediaCodecs.resamplePcm(a, 8)
    assert(up.sampleRate == 8 && up.nFrames == 8)
    val expect = Array(0.0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.6)
    up.samples.zip(expect).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-12, s"got ${up.samples.toList}")
    }
    assert(math.abs(up.durationSec - a.durationSec) < 1e-9)
    // downsample back: every other sample of the upsampled ramp
    val down = MediaCodecs.resamplePcm(up, 4)
    assert(down.nFrames == 4 &&
      down.samples.zip(a.samples).forall(p => math.abs(p._1 - p._2) < 1e-12))
    // identity and empty-input behavior
    assert(MediaCodecs.resamplePcm(a, 4) eq a)
    val empty = MediaCodecs.PcmAudio(8000, 1, 16, Array.emptyDoubleArray)
    assert(MediaCodecs.resamplePcm(empty, 4000).sampleRate == 4000)
    // stereo frames stay interleaved per channel
    val st = MediaCodecs.PcmAudio(4, 2, 16, Array(0.0, 1.0, 0.4, 0.6))
    val stUp = MediaCodecs.resamplePcm(st, 8)
    assert(stUp.nFrames == 4 && stUp.channels == 2)
    assert(math.abs(stUp.samples(2) - 0.2) < 1e-12 &&
      math.abs(stUp.samples(3) - 0.8) < 1e-12)
  }

  test("q101 audio-resample path halves frames at 8000->4000 on the synthesized corpus") {
    val out = Multimodal.resampleAudioStats(spark, sf0001, dstRate = 4000)
      .collect()
    assert(out.nonEmpty, "corpus must contain WAV payloads (doc_id % 6 == 3)")
    out.foreach { r =>
      val (src, dst) = (r.getAs[Int]("src_rate"), r.getAs[Int]("rate"))
      val (sf, f) = (r.getAs[Int]("src_frames"), r.getAs[Int]("frames"))
      assert(src == 8000 && dst == 4000)
      assert(math.abs(f - sf / 2.0) <= 1, s"frames $f vs src $sf")
      assert(r.getAs[Double]("peak") <= 1.0 + 1e-9)
      assert(r.getAs[Double]("duration_s") > 0)
    }
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

  test("IMA ADPCM: first sample verbatim, ramp tracked closely, " +
      "round trip deterministic, non-ADPCM refused") {
    import graft.ext.MediaCodecs
    // gentle ramp: quantizer step starts at 7, increments of 3 stay
    // inside the first table entries, so reconstruction stays within
    // one coarse step of the source everywhere
    val ramp = Array.tabulate(200)(i => -300 + i * 3)
    val enc = MediaCodecs.encodeWavAdpcm(8000, ramp)
    val Some((rate, dec)) = MediaCodecs.decodeWavAdpcm(enc)
    assert(rate == 8000 && dec.length == ramp.length)
    assert(dec(0) == ramp(0)) // block header carries sample 0 verbatim
    val maxErr = ramp.zip(dec).map { case (a, b) => math.abs(a - b) }.max
    assert(maxErr <= 16, s"ADPCM ramp error $maxErr")
    // 4:1 compression: 200 samples -> ~100 nibble bytes + fixed headers
    assert(enc.length == 64 + 200 / 2)
    // deterministic
    assert(MediaCodecs.decodeWavAdpcm(enc).get._2.sameElements(dec))
    // extremes clamp instead of wrapping
    val extremes = Array(32767, -32768, 32767, -32768, 0)
    val dec2 = MediaCodecs.decodeWavAdpcm(
      MediaCodecs.encodeWavAdpcm(8000, extremes)).get._2
    assert(dec2.forall(v => v >= -32768 && v <= 32767))
    // a PCM wav (format 1) and garbage are both refused
    val pcm = MediaCodecs.encodeWav16(8000, 1, Array(0.1, -0.2, 0.3))
    assert(MediaCodecs.decodeWavAdpcm(pcm).isEmpty)
    assert(MediaCodecs.decodeWavAdpcm("not a wav".getBytes).isEmpty)
    // and the ADPCM container is refused by the PCM decoder
    assert(MediaCodecs.decodeWav(enc).isEmpty)
  }
}
