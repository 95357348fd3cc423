package graft.ext

/** Pure-JVM pixel/sample codecs — every format whose decode needs no
  * EXTERNAL library is implemented for real (the container-header-only
  * path in [[MediaHeaders]] remains for compressed audio, whose entropy
  * decode genuinely needs a library this environment doesn't ship):
  *
  *   - BMP  (BITMAPINFOHEADER, 24-bpp BI_RGB): bottom-up padded BGR rows
  *   - PPM  (P6 binary): ASCII header + raw top-down RGB rows
  *   - PGM  (P5 binary): ASCII header + raw top-down gray rows
  *   - WAV  (RIFF PCM, 8/16-bit): fmt + data chunk sample decode
  *   - PNG / JPEG: real entropy decode/encode through the JDK's bundled
  *     `javax.imageio` plugins (public standard-library API)
  *
  * Both directions are implemented — encode synthesizes
  * standards-compliant files (used by tests and by the media-payload
  * synthesis over the text corpus), decode parses from bytes alone —
  * and the two paths share no state, so round-trip tests are meaningful.
  *
  * Everything here is per-row compute inside a mapPartitions batch: no
  * Spark dependency, no allocation beyond the output buffers, safe to
  * call from executor code at any scale.
  */
object MediaCodecs {

  /** Decoded raster: `pixels` is row-major, top-down, interleaved
    * (RGB for channels=3, gray for channels=1), values 0-255. */
  case class ImagePixels(
      format: String, width: Int, height: Int, channels: Int,
      pixels: Array[Byte]) {
    def nPixels: Int = width * height
  }

  /** Decoded PCM audio summary shape: samples normalized to [-1, 1]. */
  case class PcmAudio(
      sampleRate: Int, channels: Int, bitsPerSample: Int,
      samples: Array[Double]) {
    def nFrames: Int = if (channels == 0) 0 else samples.length / channels
    def durationSec: Double =
      if (sampleRate == 0) 0.0 else nFrames.toDouble / sampleRate
  }

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  private def wle16(o: Array[Byte], i: Int, v: Int): Unit = {
    o(i) = (v & 0xff).toByte; o(i + 1) = ((v >> 8) & 0xff).toByte
  }
  private def wle32(o: Array[Byte], i: Int, v: Int): Unit = {
    o(i) = (v & 0xff).toByte; o(i + 1) = ((v >> 8) & 0xff).toByte
    o(i + 2) = ((v >> 16) & 0xff).toByte; o(i + 3) = ((v >> 24) & 0xff).toByte
  }

  // ImageIO's default ImageInputStream over a plain InputStream is
  // FILE-cached: every single decode writes the payload to a temp file
  // on disk and reads it back (javax.imageio.ImageIO.getUseCache()
  // defaults to true). Under concurrent decode tasks that is pure
  // filesystem contention (measured here: q110's summed executor time
  // 0.5 s single-task vs ~26 s across 32 concurrent tasks, all of it
  // temp-file churn), and in a long session it ages the temp dir. All
  // payloads are already in-memory byte arrays — cache in memory.
  // JVM-global, idempotent, public API.
  javax.imageio.ImageIO.setUseCache(false)

  // ---------------------------------------------------------------- images

  /** Decode any supported raster — uncompressed (BMP/PNM, pure-JVM
    * parsers below) or compressed (PNG/JPEG via the JDK's public
    * `javax.imageio` plugins); None for other formats. */
  def decodeImage(b: Array[Byte]): Option[ImagePixels] =
    if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') decodeBmp(b)
    else if (b.length >= 2 && b(0) == 'P' && (b(1) == '5' || b(1) == '6'))
      decodePnm(b)
    else decodeImageIO(b)

  // ------------------------------- compressed rasters (JDK javax.imageio)

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && (b(0) & 0xff) == 0x89 &&
      b(1) == 'P' && b(2) == 'N' && b(3) == 'G'
  private def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
      (b(2) & 0xff) == 0xff
  private def isGif(b: Array[Byte]): Boolean =
    b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  /** REAL entropy decode for PNG, JPEG and GIF through the JDK's
    * bundled ImageIO plugins — a public standard-library API, no
    * external dependency. Magic-sniffed first so non-raster payloads
    * (WAV, text) never pay the ImageIO dispatch cost. Gray stays
    * 1-channel; palette/color models land as interleaved RGB (GIF's
    * palette is decode-only here: the 256-color write path would
    * quantize, so [[encodeImage]] has no GIF arm). Per-row compute
    * inside the mapPartitions batch, like every other codec here. */
  def decodeImageIO(b: Array[Byte]): Option[ImagePixels] = {
    if (!isPng(b) && !isJpeg(b) && !isGif(b)) return None
    val fmt = if (isPng(b)) "png" else if (isGif(b)) "gif" else "jpeg"
    // NonFatal, not just IOException: ImageIO plugins throw
    // RuntimeExceptions (IllegalArgument, ArrayIndexOutOfBounds, CMM
    // errors) on malformed-but-magic'd payloads, and this runs inside
    // executor tasks over untrusted corpus bytes — refuse, never crash
    val bi =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b)))
      catch { case scala.util.control.NonFatal(_) => None }
    bi.map { im =>
      val (w, h) = (im.getWidth, im.getHeight)
      val cm = im.getColorModel
      // 8-bit gray reads straight off the raster; ANY other depth or
      // color model (16-bit gray, palette, RGB[A]) goes through the
      // bulk getRGB conversion, which scales samples to 8-bit sRGB —
      // a 16-bit gray PNG must not be low-byte-truncated
      if (cm.getNumColorComponents == 1 && cm.getComponentSize(0) == 8) {
        val out = new Array[Byte](w * h)
        val raster = im.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            out(y * w + x) = raster.getSample(x, y, 0).toByte; x += 1
          }
          y += 1
        }
        ImagePixels(fmt, w, h, 1, out)
      } else {
        // one bulk conversion pass — per-pixel getRGB re-dispatches
        // through the color model and is ~10x slower on the corpus-wide
        // decode path
        val argb = im.getRGB(0, 0, w, h, null, 0, w)
        val out = new Array[Byte](w * h * 3)
        var i = 0
        while (i < argb.length) {
          val rgb = argb(i)
          out(i * 3) = ((rgb >> 16) & 0xff).toByte
          out(i * 3 + 1) = ((rgb >> 8) & 0xff).toByte
          out(i * 3 + 2) = (rgb & 0xff).toByte
          i += 1
        }
        ImagePixels(fmt, w, h, 3, out)
      }
    }
  }

  private def toBufferedImage(img: ImagePixels)
      : java.awt.image.BufferedImage = {
    import java.awt.image.BufferedImage
    val t = if (img.channels == 1) BufferedImage.TYPE_BYTE_GRAY
      else BufferedImage.TYPE_3BYTE_BGR
    val bi = new BufferedImage(img.width, img.height, t)
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val s = (y * img.width + x) * img.channels
        if (img.channels == 1)
          // write the gray sample straight into the raster — setRGB
          // would route through sRGB→gray color conversion (gamma) and
          // distort the stored value
          bi.getRaster.setSample(x, y, 0, img.pixels(s) & 0xff)
        else
          bi.setRGB(x, y,
            ((img.pixels(s) & 0xff) << 16) |
              ((img.pixels(s + 1) & 0xff) << 8) | (img.pixels(s + 2) & 0xff))
        x += 1
      }
      y += 1
    }
    bi
  }

  private def imageIOBytes(img: ImagePixels, ioFormat: String)
      : Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(toBufferedImage(img), ioFormat, baos)
    baos.toByteArray
  }

  /** Lossless PNG encode (JDK ImageIO). */
  def encodePng(img: ImagePixels): Array[Byte] = imageIOBytes(img, "png")

  /** JPEG encode at the plugin's default quality (JDK ImageIO); lossy —
    * round trips preserve dimensions exactly and values approximately. */
  def encodeJpeg(img: ImagePixels): Array[Byte] = imageIOBytes(img, "jpg")

  /** BMP, BITMAPINFOHEADER 24-bpp BI_RGB only (the uncompressed common
    * case); rows are bottom-up and padded to 4 bytes, samples BGR. */
  def decodeBmp(b: Array[Byte]): Option[ImagePixels] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val pixOff = le32(b, 10)
    val dibSize = le32(b, 14)
    val w = le32(b, 18)
    val h = le32(b, 22)
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    if (dibSize < 40 || bpp != 24 || compression != 0) return None
    if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20)) return None
    val stride = ((w * 3 + 3) / 4) * 4
    if (pixOff < 0 || pixOff.toLong + stride.toLong * h > b.length) return None
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val src = pixOff + (h - 1 - y) * stride // bottom-up
      var x = 0
      while (x < w) {
        val s = src + x * 3
        val d = (y * w + x) * 3
        out(d) = b(s + 2) // R <- BGR
        out(d + 1) = b(s + 1)
        out(d + 2) = b(s)
        x += 1
      }
      y += 1
    }
    Some(ImagePixels("bmp", w, h, 3, out))
  }

  /** Binary PNM: P6 (RGB) / P5 (gray), maxval <= 255. Header tokens are
    * whitespace-separated with `#` comments, per the netpbm spec. */
  def decodePnm(b: Array[Byte]): Option[ImagePixels] = {
    if (b.length < 2 || b(0) != 'P' || (b(1) != '5' && b(1) != '6')) return None
    val channels = if (b(1) == '6') 3 else 1
    var i = 2
    def nextInt(): Int = {
      // skip whitespace and comments
      var inComment = false
      while (i < b.length &&
        (inComment || b(i).toChar.isWhitespace || b(i) == '#')) {
        if (b(i) == '#') inComment = true
        else if (b(i) == '\n') inComment = false
        i += 1
      }
      var v = 0
      var any = false
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        v = v * 10 + (b(i) - '0'); i += 1; any = true
      }
      if (any) v else -1
    }
    val w = nextInt(); val h = nextInt(); val maxval = nextInt()
    if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255) return None
    i += 1 // single whitespace byte after maxval, per spec
    val n = w * h * channels
    if (i + n > b.length) return None
    val out = new Array[Byte](n)
    System.arraycopy(b, i, out, 0, n)
    Some(ImagePixels(if (channels == 3) "ppm" else "pgm", w, h, channels, out))
  }

  /** Encode to the raster's native container (bmp / ppm / pgm / png /
    * jpeg). */
  def encodeImage(img: ImagePixels): Array[Byte] = img.format match {
    case "bmp"  => encodeBmp(img)
    case "png"  => encodePng(img)
    case "jpeg" => encodeJpeg(img)
    case _      => encodePnm(img)
  }

  def encodeBmp(img: ImagePixels): Array[Byte] = {
    require(img.channels == 3, "BMP writer emits 24-bpp RGB")
    val stride = ((img.width * 3 + 3) / 4) * 4
    val size = 54 + stride * img.height
    val o = new Array[Byte](size)
    o(0) = 'B'; o(1) = 'M'
    wle32(o, 2, size); wle32(o, 10, 54)
    wle32(o, 14, 40); wle32(o, 18, img.width); wle32(o, 22, img.height)
    wle16(o, 26, 1); wle16(o, 28, 24); wle32(o, 30, 0)
    wle32(o, 34, stride * img.height)
    var y = 0
    while (y < img.height) {
      val dst = 54 + (img.height - 1 - y) * stride
      var x = 0
      while (x < img.width) {
        val s = (y * img.width + x) * 3
        val d = dst + x * 3
        o(d) = img.pixels(s + 2) // BGR <- RGB
        o(d + 1) = img.pixels(s + 1)
        o(d + 2) = img.pixels(s)
        x += 1
      }
      y += 1
    }
    o
  }

  def encodePnm(img: ImagePixels): Array[Byte] = {
    val magic = if (img.channels == 3) "P6" else "P5"
    val header = s"$magic\n${img.width} ${img.height}\n255\n"
      .getBytes("US-ASCII")
    val o = new Array[Byte](header.length + img.pixels.length)
    System.arraycopy(header, 0, o, 0, header.length)
    System.arraycopy(img.pixels, 0, o, header.length, img.pixels.length)
    o
  }

  /** Real resample: box-filter average over the source region each target
    * pixel covers (correct for downscale; degrades to nearest-neighbor at
    * 1:1 or upscale). Integer output via round-half-up. */
  def resizeImage(img: ImagePixels, nw: Int, nh: Int): ImagePixels = {
    require(nw > 0 && nh > 0)
    val out = new Array[Byte](nw * nh * img.channels)
    var y = 0
    while (y < nh) {
      // source row span [y0, y1) covered by target row y
      val y0 = y.toLong * img.height / nh
      val y1 = math.max(y0 + 1, (y + 1).toLong * img.height / nh)
      var x = 0
      while (x < nw) {
        val x0 = x.toLong * img.width / nw
        val x1 = math.max(x0 + 1, (x + 1).toLong * img.width / nw)
        var c = 0
        while (c < img.channels) {
          var sum = 0L
          var sy = y0
          while (sy < y1) {
            var sx = x0
            while (sx < x1) {
              sum += img.pixels(((sy * img.width + sx) * img.channels
                + c).toInt) & 0xff
              sx += 1
            }
            sy += 1
          }
          val n = (y1 - y0) * (x1 - x0)
          out((y * nw + x) * img.channels + c) = ((sum + n / 2) / n).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    ImagePixels(img.format, nw, nh, img.channels, out)
  }

  /** Per-channel-agnostic pixel stats: (mean, population std) over all
    * samples, values in 0-255. */
  def pixelStats(img: ImagePixels): (Double, Double) = {
    val n = img.pixels.length
    if (n == 0) return (0.0, 0.0)
    var sum = 0L; var sumSq = 0L
    var i = 0
    while (i < n) {
      val v = img.pixels(i) & 0xff
      sum += v; sumSq += v.toLong * v
      i += 1
    }
    val mean = sum.toDouble / n
    val variance = sumSq.toDouble / n - mean * mean
    (mean, math.sqrt(math.max(0.0, variance)))
  }

  // ---------------------------------------------------------------- audio

  /** Decode RIFF/WAVE PCM (format tag 1, 8-bit unsigned or 16-bit
    * signed). Returns None for compressed or exotic WAVs. */
  def decodeWav(b: Array[Byte]): Option[PcmAudio] = {
    if (b.length < 44 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' ||
      b(3) != 'F' || b(8) != 'W' || b(9) != 'A' || b(10) != 'V' ||
      b(11) != 'E') return None
    var i = 12
    var fmtTag = -1; var channels = 0; var rate = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    while (i + 8 <= b.length && (fmtTag < 0 || dataOff < 0)) {
      val sz = le32(b, i + 4)
      if (sz < 0) return None // untrusted size: refuse rather than loop
      val isFmt = b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't'
      val isData = b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' &&
        b(i + 3) == 'a'
      if (isFmt && i + 8 + 16 <= b.length) {
        fmtTag = le16(b, i + 8)
        channels = le16(b, i + 10)
        rate = le32(b, i + 12)
        bits = le16(b, i + 22)
      } else if (isData) {
        dataOff = i + 8
        dataLen = math.min(sz.toLong, (b.length - dataOff).toLong).toInt
      }
      // advance in Long space: a crafted sz near Int.MaxValue would wrap
      // `i + 8 + sz` negative and index b() with a negative offset
      val next = i.toLong + 8L + sz.toLong + (sz & 1)
      if (next > b.length.toLong) {
        // chunk claims to extend past the buffer — a trailing clamped
        // data chunk is already handled above; nothing else to parse
        i = b.length
      } else i = next.toInt
    }
    if (fmtTag != 1 || channels <= 0 || rate <= 0 ||
      (bits != 8 && bits != 16) || dataOff < 0) return None
    val bytesPerSample = bits / 8
    val n = dataLen / bytesPerSample
    val samples = new Array[Double](n)
    var s = 0
    while (s < n) {
      samples(s) =
        if (bits == 8) ((b(dataOff + s) & 0xff) - 128) / 128.0
        else le16(b, dataOff + s * 2).toShort / 32768.0
      s += 1
    }
    Some(PcmAudio(rate, channels, bits, samples))
  }

  /** Encode 16-bit PCM WAV from normalized [-1, 1] samples. */
  def encodeWav16(rate: Int, channels: Int,
      samples: Array[Double]): Array[Byte] = {
    val dataLen = samples.length * 2
    val o = new Array[Byte](44 + dataLen)
    o(0) = 'R'; o(1) = 'I'; o(2) = 'F'; o(3) = 'F'
    wle32(o, 4, 36 + dataLen)
    o(8) = 'W'; o(9) = 'A'; o(10) = 'V'; o(11) = 'E'
    o(12) = 'f'; o(13) = 'm'; o(14) = 't'; o(15) = ' '
    wle32(o, 16, 16); wle16(o, 20, 1); wle16(o, 22, channels)
    wle32(o, 24, rate); wle32(o, 28, rate * channels * 2)
    wle16(o, 32, channels * 2); wle16(o, 34, 16)
    o(36) = 'd'; o(37) = 'a'; o(38) = 't'; o(39) = 'a'
    wle32(o, 40, dataLen)
    var i = 0
    while (i < samples.length) {
      val clamped = math.max(-1.0, math.min(1.0, samples(i)))
      wle16(o, 44 + i * 2, math.round(clamped * 32767).toInt & 0xffff)
      i += 1
    }
    o
  }

  /** Sample-rate conversion by per-channel linear interpolation — the
    * audio analogue of [[resizeImage]] (a training pipeline normalizes
    * every clip to one rate before featurization). Output frame j reads
    * source position j·srcRate/dstRate and lerps its two neighbors;
    * the last source frame clamps. Pure integer-in/short-out and free
    * of platform math, so results are bit-deterministic. Upsampling a
    * band-limited signal properly wants a windowed-sinc filter; linear
    * interpolation is the standard cheap path for feature extraction
    * (MFCC-class features are insensitive to its rolloff). */
  def resamplePcm(a: PcmAudio, dstRate: Int): PcmAudio = {
    require(dstRate > 0, "target rate must be positive")
    if (a.channels == 0 || a.nFrames == 0) return a.copy(sampleRate = dstRate)
    if (a.sampleRate == dstRate) return a
    val srcFrames = a.nFrames
    val outFrames = math.max(1,
      math.round(srcFrames.toLong * dstRate / a.sampleRate.toDouble).toInt)
    val out = new Array[Double](outFrames * a.channels)
    val step = a.sampleRate.toDouble / dstRate
    var j = 0
    while (j < outFrames) {
      val pos = j * step
      val i0 = math.min(srcFrames - 1, pos.toInt)
      val i1 = math.min(srcFrames - 1, i0 + 1)
      val frac = pos - i0
      var c = 0
      while (c < a.channels) {
        val s0 = a.samples(i0 * a.channels + c)
        val s1 = a.samples(i1 * a.channels + c)
        out(j * a.channels + c) = s0 + (s1 - s0) * frac
        c += 1
      }
      j += 1
    }
    a.copy(sampleRate = dstRate, samples = out)
  }

  /** PCM stats: (rms, peak) over normalized samples. */
  def pcmStats(a: PcmAudio): (Double, Double) = {
    if (a.samples.isEmpty) return (0.0, 0.0)
    var sumSq = 0.0; var peak = 0.0
    var i = 0
    while (i < a.samples.length) {
      val v = a.samples(i)
      sumSq += v * v
      if (math.abs(v) > peak) peak = math.abs(v)
      i += 1
    }
    (math.sqrt(sumSq / a.samples.length), peak)
  }

  // -------------------------------------------- IMA ADPCM (format 0x11)
  // A genuinely COMPRESSED audio codec in pure integer table arithmetic
  // (IMA "DVI4" ADPCM: 4 bits/sample 4:1 compression; step/index tables
  // and the bit-serial quantizer are the published IMA algorithm, same
  // tables as RFC 3551 §4.5.1 / the multimedia literature). Replaces
  // the last remaining "compressed audio" stub: encode and decode are
  // separate real paths, and because every operation is 32-bit integer
  // compare/add/shift, a SQL oracle replays the identical state machine
  // (recursive CTE over the sample index).

  /** IMA ADPCM step-size table (89 entries). */
  val AdpcmStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
    19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
    130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
    337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
    876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
    5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** Index adjustment per 3-bit nibble magnitude. */
  val AdpcmIndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** One quantize+reconstruct step shared verbatim by encoder and
    * decoder paths: given (predictor, stepIndex) and the 4-bit nibble,
    * return the updated (predictor, stepIndex). Encoder-side callers
    * first derive the nibble from the input sample with
    * [[adpcmQuantize]]. */
  private def adpcmReconstruct(pred: Int, sidx: Int, nibble: Int): (Int, Int) = {
    val step = AdpcmStepTable(sidx)
    val delta = nibble & 7
    var diffq = step >> 3
    if ((delta & 4) != 0) diffq += step
    if ((delta & 2) != 0) diffq += step >> 1
    if ((delta & 1) != 0) diffq += step >> 2
    val p0 = if ((nibble & 8) != 0) pred - diffq else pred + diffq
    val p = math.max(-32768, math.min(32767, p0))
    val i = math.max(0, math.min(88, sidx + AdpcmIndexTable(delta)))
    (p, i)
  }

  /** Bit-serial IMA quantizer: nibble for sample `s` given state. */
  private def adpcmQuantize(pred: Int, sidx: Int, s: Int): Int = {
    val step = AdpcmStepTable(sidx)
    val diff = s - pred
    val sign = if (diff < 0) 8 else 0
    var ad = if (diff < 0) -diff else diff
    var delta = 0
    if (ad >= step) { delta = 4; ad -= step }
    if (ad >= (step >> 1)) { delta |= 2; ad -= step >> 1 }
    if (ad >= (step >> 2)) delta |= 1
    sign | delta
  }

  /** Encode mono 16-bit samples as a single-block IMA-ADPCM WAV
    * (format tag 0x11): fmt chunk with cbSize+samplesPerBlock, a fact
    * chunk carrying the true sample count, and a data chunk whose
    * 4-byte block header stores (predictor₀ = s16(0), stepIndex₀ = 0);
    * the remaining samples are low-nibble-first packed 4-bit codes. */
  def encodeWavAdpcm(rate: Int, s16: Array[Int]): Array[Byte] = {
    require(s16.nonEmpty, "ADPCM block needs at least one sample")
    val n = s16.length
    val nNib = n - 1
    val dataLen = 4 + (nNib + 1) / 2
    val o = new Array[Byte](12 + 28 + 12 + 8 + dataLen)
    o(0) = 'R'; o(1) = 'I'; o(2) = 'F'; o(3) = 'F'
    wle32(o, 4, o.length - 8)
    o(8) = 'W'; o(9) = 'A'; o(10) = 'V'; o(11) = 'E'
    o(12) = 'f'; o(13) = 'm'; o(14) = 't'; o(15) = ' '
    wle32(o, 16, 20); wle16(o, 20, 0x11); wle16(o, 22, 1)
    wle32(o, 24, rate); wle32(o, 28, rate * dataLen / math.max(n, 1))
    wle16(o, 32, dataLen); wle16(o, 34, 4)
    wle16(o, 36, 2) // cbSize
    wle16(o, 38, n) // samplesPerBlock
    o(40) = 'f'; o(41) = 'a'; o(42) = 'c'; o(43) = 't'
    wle32(o, 44, 4); wle32(o, 48, n)
    o(52) = 'd'; o(53) = 'a'; o(54) = 't'; o(55) = 'a'
    wle32(o, 56, dataLen)
    val base = 60
    var pred = s16(0)
    var sidx = 0
    wle16(o, base, pred & 0xffff)
    o(base + 2) = 0 // initial step index
    o(base + 3) = 0 // reserved
    var k = 0
    while (k < nNib) {
      val nib = adpcmQuantize(pred, sidx, s16(k + 1))
      val st = adpcmReconstruct(pred, sidx, nib)
      pred = st._1; sidx = st._2
      val pos = base + 4 + k / 2
      if (k % 2 == 0) o(pos) = (nib & 0xf).toByte
      else o(pos) = (o(pos) | ((nib & 0xf) << 4)).toByte
      k += 1
    }
    o
  }

  /** Decode a [[encodeWavAdpcm]]-shaped IMA-ADPCM WAV back to mono
    * 16-bit samples (sample rate, reconstructed s16 array). Returns
    * None for anything that is not a well-formed single-block mono
    * format-0x11 WAV with a fact chunk. */
  def decodeWavAdpcm(b: Array[Byte]): Option[(Int, Array[Int])] = {
    if (b.length < 12 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' ||
      b(3) != 'F' || b(8) != 'W' || b(9) != 'A' || b(10) != 'V' ||
      b(11) != 'E') return None
    var i = 12
    var fmtTag = -1; var channels = 0; var rate = 0; var bits = 0
    var nSamples = -1; var dataOff = -1; var dataLen = 0
    while (i + 8 <= b.length) {
      val sz = le32(b, i + 4)
      if (sz < 0) return None
      if (b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' &&
        i + 8 + 16 <= b.length) {
        fmtTag = le16(b, i + 8)
        channels = le16(b, i + 10)
        rate = le32(b, i + 12)
        bits = le16(b, i + 22)
      } else if (b(i) == 'f' && b(i + 1) == 'a' && b(i + 2) == 'c' &&
        b(i + 3) == 't' && i + 12 <= b.length) {
        nSamples = le32(b, i + 8)
      } else if (b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' &&
        b(i + 3) == 'a') {
        dataOff = i + 8
        dataLen = math.min(sz.toLong, (b.length - dataOff).toLong).toInt
      }
      val next = i.toLong + 8L + sz.toLong + (sz & 1)
      if (next > b.length.toLong) i = b.length else i = next.toInt
    }
    if (fmtTag != 0x11 || channels != 1 || rate <= 0 || bits != 4 ||
      nSamples < 1 || dataOff < 0 || dataLen < 4) return None
    val nNib = math.min(nSamples - 1, (dataLen - 4) * 2)
    val out = new Array[Int](1 + nNib)
    var pred = le16(b, dataOff).toShort.toInt
    var sidx = math.min(88, math.max(0, b(dataOff + 2) & 0xff))
    out(0) = pred
    var k = 0
    while (k < nNib) {
      val byte = b(dataOff + 4 + k / 2) & 0xff
      val nib = if (k % 2 == 0) byte & 0xf else (byte >> 4) & 0xf
      val st = adpcmReconstruct(pred, sidx, nib)
      pred = st._1; sidx = st._2
      out(k + 1) = pred
      k += 1
    }
    Some((rate, out))
  }

  // ------------------------------------------- animated GIF89a (video)
  // The VIDEO container of the corpus: a multi-frame GIF is the one
  // universally-published video format expressible in pure integer
  // arithmetic (lossless palette raster + LZW entropy coding), so the
  // frame pixels survive the round trip bit-exactly and a SQL oracle
  // can replay them the q110 way. The WRITE path below is our own LZW
  // implementation (variable-width codes, width growth at each
  // power-of-two table fill, clear-code reset at slot 4095 — the
  // GIF89a specification appendix algorithm, giflib-compatible width
  // timing); the READ path is the JDK ImageIO GIF plugin's independent
  // LZW decoder, so encode and decode never share a line of code.

  /** GIF LZW with an 8-bit minimum code size: variable-width codes
    * starting at 9 bits, LSB-first bit packing, dictionary reset via
    * the clear code when slot 4095 is reached. Prefix state is a dense
    * (prefixCode, nextByte) hash — prefix < 4096 and byte < 256 pack
    * into one positive Int key. */
  private[graft] def gifLzwEncode(pixels: Array[Byte]): Array[Byte] = {
    val minCode = 8
    val clear = 1 << minCode // 256
    val eoi = clear + 1 // 257
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var nbits = 0
    var width = minCode + 1
    var maxCode1 = 1 << width
    var next = eoi + 1
    // width grows AFTER emitting the code that crossed the boundary —
    // the decoder mirrors this because its own table reaches the same
    // size one step later (it lags the encoder by exactly one entry)
    def write(code: Int): Unit = {
      acc |= code.toLong << nbits
      nbits += width
      while (nbits >= 8) {
        out.write((acc & 0xff).toInt); acc >>= 8; nbits -= 8
      }
      if (next >= maxCode1 && width < 12) { width += 1; maxCode1 = 1 << width }
    }
    val dict = new java.util.HashMap[Integer, Integer]()
    write(clear)
    var prefix = pixels(0) & 0xff
    var i = 1
    while (i < pixels.length) {
      val c = pixels(i) & 0xff
      val key = Integer.valueOf((prefix << 8) | c)
      val hit = dict.get(key)
      if (hit != null) prefix = hit.intValue()
      else {
        write(prefix)
        if (next >= 4095) {
          write(clear)
          dict.clear()
          next = eoi + 1
          width = minCode + 1
          maxCode1 = 1 << width
        } else {
          dict.put(key, Integer.valueOf(next))
          next += 1
        }
        prefix = c
      }
      i += 1
    }
    write(prefix)
    write(eoi)
    if (nbits > 0) out.write((acc & 0xff).toInt)
    out.toByteArray
  }

  /** Encode 1-channel frames as an animated GIF89a: identity grayscale
    * global palette (entry i = (i,i,i), so every palette index IS its
    * intensity and the raster is lossless), full-size frames at origin
    * with disposal "none", a NETSCAPE loop block, and our own
    * [[gifLzwEncode]] entropy coder per frame. Every frame must be
    * exactly width*height bytes. */
  def encodeGif(width: Int, height: Int, frames: Seq[Array[Byte]],
      delayCs: Int = 10): Array[Byte] = {
    require(frames.nonEmpty && width > 0 && height > 0)
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(width); u16(height)
    out.write(0xF7) // global color table, 8-bit resolution, 256 entries
    out.write(0) // background index
    out.write(0) // aspect ratio
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    out.write(0x21); out.write(0xFF); out.write(11) // application ext
    out.write("NETSCAPE2.0".getBytes("US-ASCII"))
    out.write(3); out.write(1); u16(0); out.write(0) // loop forever
    frames.foreach { px =>
      require(px.length == width * height, "frame size mismatch")
      out.write(0x21); out.write(0xF9); out.write(4) // graphic control
      out.write(0) // disposal none, no transparency
      u16(delayCs)
      out.write(0); out.write(0)
      out.write(0x2C); u16(0); u16(0); u16(width); u16(height); out.write(0)
      out.write(8) // LZW minimum code size
      val z = gifLzwEncode(px)
      var o = 0
      while (o < z.length) {
        val n = math.min(255, z.length - o)
        out.write(n)
        out.write(z, o, n)
        o += n
      }
      out.write(0) // block terminator
    }
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** One decoded GIF frame: 1-channel palette-index pixels. For
    * [[encodeGif]]'s identity-gray palette the index IS the intensity;
    * for foreign GIFs it is the palette index of each pixel. */
  case class GifFrames(width: Int, height: Int, frames: Array[Array[Byte]])

  /** Decode EVERY frame of a GIF through the JDK ImageIO GIF reader
    * (its own LZW implementation — fully independent of the encoder
    * above). Frames are returned as palette indices read straight off
    * the indexed raster; frames whose descriptor is not full-size at
    * the origin (foreign optimized GIFs) are refused rather than
    * composited. None for non-GIF or malformed payloads. */
  def decodeGifFrames(b: Array[Byte]): Option[GifFrames] = {
    if (!isGif(b)) return None
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(b))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val r = readers.next()
        try {
          r.setInput(iis)
          val n = r.getNumImages(true)
          if (n <= 0) return None
          val first = r.read(0)
          val w = first.getWidth
          val h = first.getHeight
          val frames = new Array[Array[Byte]](n)
          var f = 0
          while (f < n) {
            val im = if (f == 0) first else r.read(f)
            if (im.getWidth != w || im.getHeight != h) return None
            val out = new Array[Byte](w * h)
            val raster = im.getRaster
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                out(y * w + x) = raster.getSample(x, y, 0).toByte
                x += 1
              }
              y += 1
            }
            frames(f) = out
            f += 1
          }
          Some(GifFrames(w, h, frames))
        } finally r.dispose()
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }
}
