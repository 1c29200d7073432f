package graft.multimodal

/** Real-format image decode: uncompressed 24-bit Windows BMP
  * (BITMAPFILEHEADER + BITMAPINFOHEADER — a published byte layout
  * parseable with zero codec libraries, like [[Wav]] for audio). This
  * makes the IMAGE half of the multimodal mandate concrete: m01–m03
  * exercise the plan shapes over a synthetic container, m05 decodes a
  * format any image tool can open. The reference's analogue is its
  * binary-download surface (`R/functions.R:84-140`), which treats
  * PDF/KML payloads as real bytes.
  *
  * Layout facts the parser honors (and MultimodalSpec pins against the
  * documented public 2×2 example, byte for byte):
  *   - little-endian u16/u32 header fields; pixel-data offset read
  *     from the file header (offset 10), never assumed to be 54;
  *   - 24 bpp pixels stored B,G,R;
  *   - each pixel ROW is padded to a 4-byte boundary
  *     (stride = ceil(3·width / 4) · 4);
  *   - positive biHeight = rows stored BOTTOM-UP, negative = top-down
  *     — [[pixels]] returns row-major top-down either way.
  *
  * Scale shape: encode and decode are pure byte-array kernels invoked
  * map-side from the m05 plan — no shuffle, no driver involvement, and
  * the blob never outlives its row.
  */
object Bmp {

  /** Parsed container metadata. `height` is the POSITIVE row count;
    * `topDown` records the stored orientation. `imageBytes` is the
    * padded pixel-array size (stride × height).
    */
  case class BmpMeta(width: Int, height: Int, bitsPerPixel: Int,
      dataOffset: Int, imageBytes: Int, topDown: Boolean)

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** Bytes per stored pixel row: 3·width rounded up to 4. */
  def stride(width: Int): Int = ((3 * width + 3) / 4) * 4

  /** Encode a row-major top-down 0xRRGGBB array as a bottom-up 24-bit
    * BMP (the layout every common writer emits).
    */
  def encode24(width: Int, height: Int, rgb: Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0 && rgb.length == width * height,
      s"${rgb.length} pixels for ${width}x$height")
    val st = stride(width)
    val imageBytes = st * height
    val out = new Array[Byte](54 + imageBytes)
    def put16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def put32(o: Int, v: Int): Unit = {
      put16(o, v & 0xffff); put16(o + 2, (v >>> 16) & 0xffff)
    }
    out(0) = 'B'.toByte; out(1) = 'M'.toByte
    put32(2, 54 + imageBytes) // file size
    put32(10, 54)             // pixel-array offset
    put32(14, 40)             // BITMAPINFOHEADER size
    put32(18, width)
    put32(22, height)         // positive: bottom-up
    put16(26, 1)              // planes
    put16(28, 24)             // bpp
    put32(30, 0)              // BI_RGB (uncompressed)
    put32(34, imageBytes)
    put32(38, 2835); put32(42, 2835) // 72 DPI in px/metre
    var y = 0
    while (y < height) {
      val rowBase = 54 + (height - 1 - y) * st // bottom-up
      var x = 0
      while (x < width) {
        val p = rgb(y * width + x)
        val o = rowBase + 3 * x
        out(o) = (p & 0xff).toByte            // B
        out(o + 1) = ((p >> 8) & 0xff).toByte // G
        out(o + 2) = ((p >> 16) & 0xff).toByte // R
        x += 1
      }
      y += 1
    }
    out
  }

  /** Header walk + validation. Throws on non-BMP magic, non-24bpp, or
    * compressed payloads — malformed blobs must fail loudly, not read
    * garbage.
    */
  def decodeMeta(blob: Array[Byte]): BmpMeta = {
    require(blob.length >= 54, s"BMP too short: ${blob.length} bytes")
    require(blob(0) == 'B'.toByte && blob(1) == 'M'.toByte,
      "not a BMP: bad magic")
    val offset = i32(blob, 10)
    val w = i32(blob, 18)
    val hRaw = i32(blob, 22)
    val bpp = u16(blob, 28)
    val compression = i32(blob, 30)
    require(bpp == 24, s"unsupported bpp $bpp (24-bit only)")
    require(compression == 0, s"unsupported compression $compression")
    val h = math.abs(hRaw)
    require(w > 0 && h > 0, s"bad dimensions ${w}x$hRaw")
    // size the pixel array in Long: hostile width/height wrap the Int
    // products and would slip past the bounds guard (ADVICE r6)
    val bytes = ((3L * w + 3) / 4) * 4 * h
    require(offset >= 54 && offset + bytes <= blob.length,
      s"pixel array [$offset, ${offset + bytes}) outside " +
        s"${blob.length}-byte blob")
    BmpMeta(w, h, bpp, offset, bytes.toInt, topDown = hRaw < 0)
  }

  /** Row-major TOP-DOWN 0xRRGGBB pixels, whatever the stored
    * orientation.
    */
  def pixels(blob: Array[Byte]): Array[Int] = {
    val m = decodeMeta(blob)
    val st = stride(m.width)
    val out = new Array[Int](m.width * m.height)
    var y = 0
    while (y < m.height) {
      val storedRow = if (m.topDown) y else m.height - 1 - y
      val rowBase = m.dataOffset + storedRow * st
      var x = 0
      while (x < m.width) {
        val o = rowBase + 3 * x
        out(y * m.width + x) =
          ((blob(o + 2) & 0xff) << 16) | ((blob(o + 1) & 0xff) << 8) |
            (blob(o) & 0xff)
        x += 1
      }
      y += 1
    }
    out
  }

  /** REAL resize over the real format (the synthetic container's
    * header-rewrite [[Multimodal.resize]] stub made concrete):
    * nearest-neighbor resample to `ow`×`oh` — source pixel of output
    * (x, y) is (⌊x·w/ow⌋, ⌊y·h/oh⌋), the standard integer-exact
    * mapping, so a spec (or an oracle) can recompute any output pixel
    * from the input without float tolerance. Returns a fully valid
    * re-encoded BMP; pure byte kernel, map-side like decode.
    */
  def resizeNearest(blob: Array[Byte], ow: Int, oh: Int): Array[Byte] = {
    require(ow > 0 && oh > 0, s"bad target ${ow}x$oh")
    val m = decodeMeta(blob)
    val in = pixels(blob)
    val out = new Array[Int](ow * oh)
    var y = 0
    while (y < oh) {
      val sy = y * m.height / oh
      var x = 0
      while (x < ow) {
        out(y * ow + x) = in(sy * m.width + x * m.width / ow)
        x += 1
      }
      y += 1
    }
    encode24(ow, oh, out)
  }

  /** REAL center crop over the real format: the `cw`×`ch` window
    * anchored at (⌊(w−cw)/2⌋, ⌊(h−ch)/2⌋) — integer-exact, so an
    * oracle can recompute any output pixel's source index without
    * float tolerance. Returns a fully valid re-encoded BMP; pure byte
    * kernel, map-side like decode.
    */
  def cropCenter(blob: Array[Byte], cw: Int, ch: Int): Array[Byte] = {
    val m = decodeMeta(blob)
    require(cw > 0 && ch > 0 && cw <= m.width && ch <= m.height,
      s"bad crop ${cw}x$ch of ${m.width}x${m.height}")
    val in = pixels(blob)
    val x0 = (m.width - cw) / 2
    val y0 = (m.height - ch) / 2
    val out = new Array[Int](cw * ch)
    var y = 0
    while (y < ch) {
      var x = 0
      while (x < cw) {
        out(y * cw + x) = in((y0 + y) * m.width + (x0 + x))
        x += 1
      }
      y += 1
    }
    encode24(cw, ch, out)
  }

  /** REAL grayscale conversion over the real format: every pixel
    * replaced by its BT.601 luminance on all three channels —
    * ⌊(299·R + 587·G + 114·B) / 1000⌋, integer truncating division
    * (the rule DuckDB's `//` shares), so an oracle can recompute any
    * output pixel without float tolerance. Returns a fully valid
    * re-encoded 24-bit BMP; pure byte kernel, map-side like decode.
    */
  def grayscale(blob: Array[Byte]): Array[Byte] = {
    val m = decodeMeta(blob)
    val in = pixels(blob)
    val out = new Array[Int](in.length)
    var i = 0
    while (i < in.length) {
      val r = (in(i) >> 16) & 0xff
      val g = (in(i) >> 8) & 0xff
      val b = in(i) & 0xff
      val l = (299 * r + 587 * g + 114 * b) / 1000
      out(i) = (l << 16) | (l << 8) | l
      i += 1
    }
    encode24(m.width, m.height, out)
  }

  /** Exact integer channel statistics (like [[Wav]]'s sample stats:
    * integer sums cannot drift with summation order, so the oracle
    * hash is stable). `peakLum` is the integer BT.601 luminance
    * numerator 299·R + 587·G + 114·B (the /1000 divisor dropped to
    * stay in ℤ).
    */
  case class PixelStats(sumR: Long, sumG: Long, sumB: Long, peakLum: Int)

  def stats(px: Array[Int]): PixelStats = {
    var sr = 0L; var sg = 0L; var sb = 0L; var peak = 0
    var i = 0
    while (i < px.length) {
      val r = (px(i) >> 16) & 0xff
      val g = (px(i) >> 8) & 0xff
      val b = px(i) & 0xff
      sr += r; sg += g; sb += b
      val lum = 299 * r + 587 * g + 114 * b
      if (lum > peak) peak = lum
      i += 1
    }
    PixelStats(sr, sg, sb, peak)
  }
}
