package graft.multimodal

/** Real-format video decode: uncompressed RIFF/AVI with DIB ('00db')
  * frames — the video member of the real-byte-layout triple ([[Wav]]
  * audio, [[Bmp]] image). AVI is the RIFF container ('RIFF' size
  * 'AVI ') holding nested LIST chunks: LIST('hdrl') with the `avih`
  * main header and a LIST('strl') stream header pair, then
  * LIST('movi') whose '00db' chunks each carry one uncompressed
  * bottom-up DIB frame — the same pixel-row layout [[Bmp]] parses
  * (BGR triples, rows padded to 4 bytes). All field widths and
  * offsets below are the published layout; the parser is a recursive
  * chunk walk, not fixed offsets, so extra chunks ('JUNK', 'idx1',
  * vendor LISTs) in any position are skipped like [[Wav]]'s walk
  * skips them.
  *
  * No AVI writer ships in this sandbox's toolchain (unlike m04's
  * stdlib-`wave` fixtures), so MultimodalSpec pins the ENCODED bytes
  * against the published structure directly — fourCC magics and
  * header fields at their documented offsets — plus decode/encode
  * round-trips; the chunk-walk logic itself is the same shape the
  * tool-validated WAV walk uses.
  *
  * Scale shape: encode/decode are pure byte kernels invoked map-side
  * from the m06 plan — no shuffle, no driver involvement, blobs never
  * outlive their row.
  */
object Avi {

  /** Main-header facts: frame geometry and count, plus the frame
    * period carried in `avih` (microseconds per frame).
    */
  case class AviMeta(width: Int, height: Int, nFrames: Int,
      usPerFrame: Int)

  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def fourCC(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  /** Encode row-major top-down 0xRRGGBB frames as an uncompressed
    * AVI: RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf))
    * LIST('movi' '00db'×n)).
    */
  def encode(width: Int, height: Int, frames: Array[Array[Int]],
      usPerFrame: Int = 40000): Array[Byte] = {
    require(width > 0 && height > 0 && frames.nonEmpty &&
      frames.forall(_.length == width * height),
      s"${frames.length} frames for ${width}x$height")
    val st = Bmp.stride(width)
    val frameBytes = st * height
    val buf = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { buf.write(v & 0xff); buf.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
    def wcc(s: String): Unit = buf.write(s.getBytes("US-ASCII"))
    // sizes, innermost out: strh 56, strf 40 (BITMAPINFOHEADER)
    val strlSize = 4 + (8 + 56) + (8 + 40)
    val avihSize = 56
    val hdrlSize = 4 + (8 + avihSize) + (8 + strlSize)
    val moviSize = 4 + frames.length * (8 + frameBytes)
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    wcc("RIFF"); w32(riffSize); wcc("AVI ")
    wcc("LIST"); w32(hdrlSize); wcc("hdrl")
    wcc("avih"); w32(avihSize)
    w32(usPerFrame)                    // dwMicroSecPerFrame
    w32(frameBytes * 1000000 / math.max(usPerFrame, 1)) // dwMaxBytesPerSec
    w32(0)                             // dwPaddingGranularity
    w32(0)                             // dwFlags (no index chunk)
    w32(frames.length)                 // dwTotalFrames
    w32(0)                             // dwInitialFrames
    w32(1)                             // dwStreams
    w32(frameBytes)                    // dwSuggestedBufferSize
    w32(width); w32(height)
    w32(0); w32(0); w32(0); w32(0)     // dwReserved[4]
    wcc("LIST"); w32(strlSize); wcc("strl")
    wcc("strh"); w32(56)
    wcc("vids"); wcc("DIB ")           // fccType, fccHandler
    w32(0); w16(0); w16(0)             // flags, priority, language
    w32(0)                             // dwInitialFrames
    w32(usPerFrame); w32(1000000)      // dwScale/dwRate → fps
    w32(0)                             // dwStart
    w32(frames.length)                 // dwLength
    w32(frameBytes)                    // dwSuggestedBufferSize
    w32(-1)                            // dwQuality (default)
    w32(frameBytes)                    // dwSampleSize
    w16(0); w16(0); w16(width); w16(height) // rcFrame
    wcc("strf"); w32(40)               // BITMAPINFOHEADER, as in BMP
    w32(40); w32(width); w32(height)
    w16(1); w16(24); w32(0)            // planes, bpp, BI_RGB
    w32(frameBytes); w32(2835); w32(2835); w32(0); w32(0)
    wcc("LIST"); w32(moviSize); wcc("movi")
    frames.foreach { px =>
      wcc("00db"); w32(frameBytes)
      // bottom-up padded DIB rows, BGR — Bmp's pixel-array layout
      val arr = new Array[Byte](frameBytes)
      var y = 0
      while (y < height) {
        val rowBase = (height - 1 - y) * st
        var x = 0
        while (x < width) {
          val p = px(y * width + x)
          arr(rowBase + 3 * x) = (p & 0xff).toByte
          arr(rowBase + 3 * x + 1) = ((p >> 8) & 0xff).toByte
          arr(rowBase + 3 * x + 2) = ((p >> 16) & 0xff).toByte
          x += 1
        }
        y += 1
      }
      buf.write(arr)
    }
    buf.toByteArray
  }

  /** Walk chunks in [from, to) at one nesting level, descending into
    * LIST chunks; invokes `f(fourCC, payloadFrom, payloadLen)` for
    * every non-LIST chunk (LIST payloads contribute their own type as
    * a chunk named by the list type, then their children).
    */
  private def walk(b: Array[Byte], from: Int, to: Int)
      (f: (String, Int, Int) => Unit): Unit = {
    var o = from
    while (o + 8 <= to) {
      val cc = fourCC(b, o)
      val len = i32(b, o + 4)
      // compare in Long: a hostile len near Int.MaxValue wraps the Int
      // sum negative and would slip past the guard (ADVICE r6)
      require(len >= 0 && o + 8L + len <= to,
        s"chunk $cc at $o overruns: len $len, limit $to")
      if (cc == "LIST") {
        require(len >= 4, s"LIST at $o too short")
        f(fourCC(b, o + 8), o + 12, len - 4)
        walk(b, o + 12, o + 8 + len)(f)
      } else f(cc, o + 8, len)
      o += 8 + len + (len & 1) // odd sizes take a pad byte, as in WAV
    }
  }

  /** Header walk + validation: finds `avih` wherever it sits. */
  def decodeMeta(blob: Array[Byte]): AviMeta = {
    require(blob.length >= 12 && fourCC(blob, 0) == "RIFF" &&
      fourCC(blob, 8) == "AVI ", "not a RIFF/AVI container")
    var meta: Option[AviMeta] = None
    walk(blob, 12, math.min(blob.length.toLong, 8L + i32(blob, 4)).toInt) {
      (cc, from, len) =>
        if (cc == "avih" && meta.isEmpty) {
          require(len >= 56, s"avih too short: $len")
          val w = i32(blob, from + 32)
          val h = i32(blob, from + 36)
          require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
          meta = Some(AviMeta(w, h, i32(blob, from + 16),
            i32(blob, from)))
        }
    }
    meta.getOrElse(throw new IllegalArgumentException("no avih header"))
  }

  /** All '00db' frames as row-major TOP-DOWN 0xRRGGBB arrays. */
  def frames(blob: Array[Byte]): Array[Array[Int]] = {
    val m = decodeMeta(blob)
    val st = Bmp.stride(m.width)
    val expect = st * m.height
    val out = Array.newBuilder[Array[Int]]
    walk(blob, 12, math.min(blob.length.toLong, 8L + i32(blob, 4)).toInt) {
      (cc, from, len) =>
        if (cc == "00db") {
          require(len == expect,
            s"frame chunk $len bytes, expected $expect")
          val px = new Array[Int](m.width * m.height)
          var y = 0
          while (y < m.height) {
            val rowBase = from + (m.height - 1 - y) * st
            var x = 0
            while (x < m.width) {
              val o = rowBase + 3 * x
              px(y * m.width + x) =
                ((blob(o + 2) & 0xff) << 16) |
                  ((blob(o + 1) & 0xff) << 8) | (blob(o) & 0xff)
              x += 1
            }
            y += 1
          }
          out += px
        }
    }
    val fs = out.result()
    require(fs.length == m.nFrames,
      s"${fs.length} frame chunks but avih declares ${m.nFrames}")
    fs
  }

  /** REAL temporal downsample over the real format (the video member
    * of the transform set next to [[Bmp.resizeNearest]]/
    * [[Bmp.cropCenter]]/[[Wav.resampleNearest]]/[[Wav.mixdownMono]]):
    * keep every `step`-th frame (f mod step = 0 — the same selection
    * rule the m03/m06 read-only sampling uses) and re-encode a fully
    * valid AVI. Kept frames keep their exact pixel bytes; usPerFrame
    * scales by `step` so the clip's wall-clock duration survives the
    * frame drop. Pure byte kernel, map-side like decode.
    */
  def temporalSample(blob: Array[Byte], step: Int): Array[Byte] = {
    require(step >= 1, s"bad step $step")
    val m = decodeMeta(blob)
    // the scaled frame duration must stay representable in the avih
    // field — a silent clamp would re-encode with a WRONG duration,
    // breaking the duration-preservation contract this kernel declares
    require(m.usPerFrame.toLong * step <= Int.MaxValue,
      s"usPerFrame ${m.usPerFrame} * step $step exceeds the 32-bit avih" +
        " frame-duration field; the downsampled clip's duration would" +
        " not be representable")
    val kept = frames(blob).zipWithIndex
      .collect { case (px, f) if f % step == 0 => px }
    encode(m.width, m.height, kept, (m.usPerFrame.toLong * step).toInt)
  }
}
