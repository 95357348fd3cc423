package graft.ext

/** Pure-JVM container-header parsing for common media formats — the part
  * of "decode" that needs no codec library. Pixel/sample decoding remains
  * stubbed (no image/audio libs in this environment), but format
  * detection and dimension extraction are real:
  *
  *   - PNG:  8-byte signature, IHDR width/height (big-endian) at 16/20
  *   - JPEG: FFD8 + marker scan to any SOFn frame header
  *   - GIF:  "GIF8", logical screen width/height (little-endian) at 6/8
  *   - WAV:  RIFF/WAVE, fmt chunk channels + sample rate
  */
object MediaHeaders {

  case class Header(format: String, width: Int, height: Int, channels: Int)

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  def parse(b: Array[Byte]): Option[Header] = {
    if (b.length >= 24 &&
      (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') {
      Some(Header("png", be32(b, 16), be32(b, 20), 0))
    } else if (b.length >= 4 &&
      (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      parseJpeg(b)
    } else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8') {
      Some(Header("gif", le16(b, 6), le16(b, 8), 0))
    } else if (b.length >= 28 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') {
      // fmt chunk normally starts at 12; scan chunks to be safe
      var i = 12
      var malformed = false
      while (!malformed && i + 8 <= b.length) {
        val isFmt = b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't'
        val sz = le32(b, i + 4)
        if (isFmt && i + 16 <= b.length)
          return Some(Header("wav", le32(b, i + 12), 0, le16(b, i + 10)))
        // untrusted chunk size: a negative le32 would stall or reverse
        // the scan — treat as malformed and fall through to the fallback
        if (sz < 0) malformed = true
        else i += 8 + sz + (sz & 1)
      }
      Some(Header("wav", 0, 0, 0))
    } else None
  }

  private def parseJpeg(b: Array[Byte]): Option[Header] = {
    var i = 2
    while (i + 9 < b.length && (b(i) & 0xff) == 0xff) {
      val marker = b(i + 1) & 0xff
      if (marker >= 0xc0 && marker <= 0xcf &&
        marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
        return Some(Header("jpeg", be16(b, i + 7), be16(b, i + 5),
          b(i + 9) & 0xff))
      }
      val len = be16(b, i + 2)
      i += 2 + len
    }
    Some(Header("jpeg", 0, 0, 0))
  }
}
