package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.multimodal.{Avi, Bmp, Multimodal, Wav}

/** Multimodal binary-column plumbing: container round trip, metadata
  * decode, mapPartitions feature batch shape, frame explode/reassembly.
  */
class MultimodalSpec extends SparkSpec {

  test("m01 metadata read back out of all three containers matches " +
      "the synthesis parameters") {
    val rows = Multimodal.m01MediaMeta(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length === docs.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val n = docs(id)
      val w = (4 + n % 29).toInt; val h = (3 + id % 13).toInt
      assert(r.getAs[Int]("img_width") === w)
      assert(r.getAs[Int]("img_height") === h)
      assert(r.getAs[Int]("img_bytes") === Bmp.stride(w) * h)
      assert(r.getAs[Int]("sample_rate") === (8000 + (id % 3) * 8000).toInt)
      assert(r.getAs[Int]("channels") === (1 + id % 2).toInt)
      assert(r.getAs[Int]("n_samples") ===
        ((n % 96 + 32) * (1 + id % 2)).toInt)
      assert(r.getAs[Int]("vid_width") === (3 + n % 13).toInt)
      assert(r.getAs[Int]("vid_height") === (2 + id % 5).toInt)
      assert(r.getAs[Int]("n_frames") === (2 + n % 7).toInt)
    }
  }

  test("extractFeatures emits a dense 16-bin count histogram summing " +
      "to the pixel count") {
    val feats = Multimodal.extractFeatures(
      Multimodal.imageTable(spark, sf).limit(20)).collect()
    assert(feats.nonEmpty)
    feats.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val v = r.getSeq[Long](r.fieldIndex("bin_counts"))
      val n = r.getAs[Long]("n_pixels")
      assert(v.length === 16)
      assert(v.sum === n)
      // direct recompute from the synthesis formula
      val expect = new Array[Long](16)
      Multimodal.synthPixels(id, n.toInt)
        .foreach(p => expect(((p >> 16) & 0xff) >> 4) += 1)
      assert(v === expect.toSeq)
    }
  }

  test("m03 frame explode emits one row per frame with that frame's " +
      "exact stats") {
    val rows = Multimodal.m03FrameSample(spark, sf).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.size === docs.size)
    rows.take(30).foreach { case (id, fs) =>
      val n = docs(id)
      val w = (3 + n % 13).toInt; val h = (2 + id % 5).toInt
      assert(fs.length === (2 + n % 7).toInt)
      fs.foreach { r =>
        val f = r.getAs[Int]("frame_idx")
        val st = Bmp.stats(Multimodal.synthFrame(id, f, w * h))
        assert(r.getAs[Long]("sum_r") === st.sumR)
        assert(r.getAs[Long]("sum_g") === st.sumG)
        assert(r.getAs[Long]("sum_b") === st.sumB)
        assert(r.getAs[Int]("peak_lum") === st.peakLum)
      }
    }
  }

  // --- RIFF/WAVE (m04): fixtures produced by Python's stdlib `wave`
  // writer, a known external tool — pinned values were measured with
  // that same module (`wave.open` + struct unpack).

  private def fixture(name: String): Array[Byte] =
    Files.readAllBytes(Paths.get(s"src/test/resources/fixtures/$name"))

  test("wav decode pins the mono sine fixture") {
    val blob = fixture("sine_mono_8k.wav")
    val m = Wav.decodeMeta(blob)
    assert(m === Wav.WavMeta(8000, 1, 16, 400, 44, 800))
    val s = Wav.samples(blob)
    assert(s.take(4).toSeq === Seq[Short](0, 4065, 7649, 10329))
    assert(Wav.stats(s) === Wav.SampleStats(12000, 3055512L, 28799906040L))
  }

  test("wav decode pins the stereo ramp fixture") {
    val blob = fixture("ramp_stereo_44k.wav")
    val m = Wav.decodeMeta(blob)
    assert(m === Wav.WavMeta(44100, 2, 16, 400, 44, 800))
    val s = Wav.samples(blob)
    assert(s.take(4).toSeq === Seq[Short](-10000, -3000, -9900, -3000))
    assert(Wav.stats(s) === Wav.SampleStats(10000, 1600000L, 8467000000L))
  }

  test("encodePcm16 is byte-identical to the known tool's output") {
    Seq("sine_mono_8k.wav" -> 8000, "ramp_stereo_44k.wav" -> 44100)
      .foreach { case (name, rate) =>
        val blob = fixture(name)
        val channels = Wav.decodeMeta(blob).channels
        val reenc = Wav.encodePcm16(Wav.samples(blob), rate, channels)
        assert(reenc.sameElements(blob), s"$name re-encode differs")
      }
  }

  test("chunk walk tolerates extra chunks in any position") {
    val blob = fixture("sine_mono_8k.wav")
    // Splice an odd-sized LIST chunk between `fmt ` and `data` (offset
    // 36 in the canonical layout) — real writers do this, and the odd
    // size exercises the word-alignment pad byte.
    val info = "INFOISFT".getBytes("US-ASCII") :+ 'x'.toByte
    val chunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte]((info.length & 0xff).toByte, 0, 0, 0) ++ info :+ 0.toByte
    val spliced = blob.take(36) ++ chunk ++ blob.drop(36)
    assert(Wav.decodeMeta(spliced).copy(dataOffset = 44) ===
      Wav.decodeMeta(blob))
    assert(Wav.samples(spliced).sameElements(Wav.samples(blob)))
  }

  test("wav decode rejects malformed containers") {
    val blob = fixture("sine_mono_8k.wav")
    intercept[IllegalArgumentException] { // not RIFF
      Wav.decodeMeta("JUNKJUNKJUNKJUNK".getBytes)
    }
    intercept[IllegalArgumentException] { // float PCM format tag
      val bad = blob.clone(); bad(20) = 3; Wav.decodeMeta(bad)
    }
    intercept[IllegalArgumentException] { // data chunk overruns buffer
      Wav.decodeMeta(blob.take(100))
    }
  }

  // --- BMP (m05): the 2x2 24-bit example documented publicly with
  // every byte enumerated — an external fixture independent of our
  // encoder. Stored bottom-up: file row 0 = image BOTTOM row
  // (red, white), file row 1 = TOP row (blue, green), each padded
  // 6 -> 8 bytes.

  private val bmp2x2: Array[Byte] = Array(
    0x42, 0x4d,             // "BM"
    0x46, 0, 0, 0,          // file size 70
    0, 0, 0, 0,             // reserved
    0x36, 0, 0, 0,          // pixel-array offset 54
    0x28, 0, 0, 0,          // BITMAPINFOHEADER size 40
    0x02, 0, 0, 0,          // width 2
    0x02, 0, 0, 0,          // height 2 (positive: bottom-up)
    0x01, 0,                // planes
    0x18, 0,                // 24 bpp
    0, 0, 0, 0,             // BI_RGB
    0x10, 0, 0, 0,          // image size 16
    0x13, 0x0b, 0, 0,       // 2835 px/m horizontal (72 DPI)
    0x13, 0x0b, 0, 0,       // 2835 px/m vertical
    0, 0, 0, 0,             // palette colors
    0, 0, 0, 0,             // important colors
    0, 0, 0xff.toByte,      // (0,1) red   (B,G,R)
    0xff.toByte, 0xff.toByte, 0xff.toByte, // (1,1) white
    0, 0,                   // row padding
    0xff.toByte, 0, 0,      // (0,0) blue
    0, 0xff.toByte, 0,      // (1,0) green
    0, 0).map(_.toByte)

  test("bmp decode pins the documented 2x2 example byte-for-byte") {
    val m = Bmp.decodeMeta(bmp2x2)
    assert(m === Bmp.BmpMeta(2, 2, 24, 54, 16, topDown = false))
    // top-down row-major: blue, green / red, white
    assert(Bmp.pixels(bmp2x2).toSeq ===
      Seq(0x0000ff, 0x00ff00, 0xff0000, 0xffffff))
    assert(Bmp.stats(Bmp.pixels(bmp2x2)) ===
      Bmp.PixelStats(510L, 510L, 510L, 299 * 255 + 587 * 255 + 114 * 255))
  }

  test("grayscale converts the documented 2x2 example pixel-exactly " +
      "and re-encodes a valid BMP") {
    val g = Bmp.grayscale(bmp2x2)
    val m = Bmp.decodeMeta(g)
    assert(m.width === 2 && m.height === 2 && m.bitsPerPixel === 24)
    // truncated BT.601: blue ⌊114·255/1000⌋=29, green ⌊587·255/1000⌋
    // =149, red ⌊299·255/1000⌋=76, white exactly 255
    assert(Bmp.pixels(g).toSeq ===
      Seq(0x1d1d1d, 0x959595, 0x4c4c4c, 0xffffff))
    // idempotent: luma of an R=G=B pixel is the pixel
    assert(Bmp.pixels(Bmp.grayscale(g)).toSeq === Bmp.pixels(g).toSeq)
  }

  test("encode24 is byte-identical to the documented example") {
    val enc = Bmp.encode24(2, 2,
      Array(0x0000ff, 0x00ff00, 0xff0000, 0xffffff))
    assert(enc.sameElements(bmp2x2), "encoder must reproduce the " +
      "documented layout byte-for-byte")
  }

  test("bmp round-trips off-grid widths (padding) and top-down rows") {
    // width 3: rowBytes 9, stride 12 — the padding path
    val px = Multimodal.synthPixels(7L, 3 * 5)
    val enc = Bmp.encode24(3, 5, px)
    assert(Bmp.decodeMeta(enc).imageBytes === 12 * 5)
    assert(Bmp.pixels(enc).toSeq === px.toSeq)
    // flip to top-down (negative height): same decoded pixels only if
    // the stored rows are reversed too
    val st = Bmp.stride(3)
    val flipped = enc.clone()
    flipped(22) = (-5 & 0xff).toByte; flipped(23) = 0xff.toByte
    flipped(24) = 0xff.toByte; flipped(25) = 0xff.toByte
    for (y <- 0 until 5; i <- 0 until st)
      flipped(54 + y * st + i) = enc(54 + (4 - y) * st + i)
    assert(Bmp.decodeMeta(flipped).topDown)
    assert(Bmp.pixels(flipped).toSeq === px.toSeq)
  }

  test("bmp decode rejects malformed containers") {
    intercept[IllegalArgumentException] { // bad magic
      Bmp.decodeMeta("JUNK".getBytes ++ new Array[Byte](60))
    }
    intercept[IllegalArgumentException] { // 8-bpp
      val bad = bmp2x2.clone(); bad(28) = 8; Bmp.decodeMeta(bad)
    }
    intercept[IllegalArgumentException] { // truncated pixel array
      Bmp.decodeMeta(bmp2x2.take(60))
    }
  }

  // --- AVI (m06): no AVI writer ships in this sandbox's toolchain, so
  // the encoded bytes are pinned against the PUBLISHED structure
  // directly — fourCC magics and header fields at documented offsets —
  // plus full decode/encode round-trips.

  test("avi layout: documented magics and header fields at their " +
      "published offsets") {
    val frames = Array.tabulate(3)(f => Multimodal.synthFrame(5L, f, 4 * 2))
    val blob = Avi.encode(4, 2, frames, usPerFrame = 40000)
    def cc(o: Int) = new String(blob.slice(o, o + 4), "US-ASCII")
    def le32(o: Int) = (blob(o) & 0xff) | ((blob(o + 1) & 0xff) << 8) |
      ((blob(o + 2) & 0xff) << 16) | ((blob(o + 3) & 0xff) << 24)
    assert(cc(0) === "RIFF" && cc(8) === "AVI ")
    assert(le32(4) === blob.length - 8, "RIFF size covers the file")
    assert(cc(12) === "LIST" && cc(20) === "hdrl")
    assert(cc(24) === "avih")
    val avih = 32 // avih payload start
    assert(le32(avih) === 40000)       // dwMicroSecPerFrame
    assert(le32(avih + 16) === 3)      // dwTotalFrames
    assert(le32(avih + 24) === 1)      // dwStreams
    assert(le32(avih + 32) === 4)      // dwWidth
    assert(le32(avih + 36) === 2)      // dwHeight
    // stream pair: strh declares a DIB video stream, strf is the same
    // BITMAPINFOHEADER layout BMP carries
    val strh = avih + 56 + 12 + 8 // skip LIST('strl') header + 'strh'+size
    assert(cc(strh - 8) === "strh")
    assert(cc(strh) === "vids" && cc(strh + 4) === "DIB ")
    val strf = strh + 56 + 8
    assert(cc(strf - 8) === "strf")
    assert(le32(strf) === 40 && le32(strf + 4) === 4)
    // movi list with one 00db chunk per frame, stride-padded
    val movi = strf + 40
    assert(cc(movi) === "LIST" && cc(movi + 8) === "movi")
    assert(cc(movi + 12) === "00db")
    assert(le32(movi + 16) === Bmp.stride(4) * 2)
  }

  test("avi round-trips frames and tolerates extra chunks") {
    val frames = Array.tabulate(5)(f => Multimodal.synthFrame(9L, f, 5 * 3))
    val blob = Avi.encode(5, 3, frames)
    assert(Avi.decodeMeta(blob) === Avi.AviMeta(5, 3, 5, 40000))
    assert(Avi.frames(blob).map(_.toSeq).toSeq === frames.map(_.toSeq).toSeq)
    // splice a JUNK chunk (odd size → pad byte) before the movi LIST;
    // the walk must skip it and the RIFF size must still cover it
    val junk = "JUNK".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ "abcde".getBytes ++ Array[Byte](0)
    val moviOff = blob.indexOfSlice("movi".getBytes("US-ASCII")) - 8
    val spliced = blob.take(moviOff) ++ junk ++ blob.drop(moviOff)
    def le32(b: Array[Byte], o: Int) = (b(o) & 0xff) |
      ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) |
      ((b(o + 3) & 0xff) << 24)
    val fixed = spliced.clone()
    val ns = le32(spliced, 4) + junk.length
    fixed(4) = (ns & 0xff).toByte; fixed(5) = ((ns >> 8) & 0xff).toByte
    fixed(6) = ((ns >> 16) & 0xff).toByte
    fixed(7) = ((ns >> 24) & 0xff).toByte
    assert(Avi.decodeMeta(fixed) === Avi.decodeMeta(blob))
    assert(Avi.frames(fixed).map(_.toSeq).toSeq ===
      frames.map(_.toSeq).toSeq)
  }

  test("avi decode rejects malformed containers") {
    val ok = Avi.encode(3, 2, Array(Multimodal.synthFrame(1L, 0, 6)))
    intercept[IllegalArgumentException] { // not RIFF/AVI
      Avi.decodeMeta("RIFFxxxxWAVE".getBytes ++ new Array[Byte](60))
    }
    intercept[IllegalArgumentException] { // truncated mid-frame
      Avi.frames(ok.take(ok.length - 3))
    }
    intercept[IllegalArgumentException] { // frame count lies
      val bad = ok.clone(); bad(32 + 16) = 9; Avi.frames(bad)
    }
  }

  test("hostile header fields cannot wrap the bounds guards " +
      "(Int-overflow hardening)") {
    // chunk len near Int.MaxValue: o + 8 + len wraps negative as Int
    // and would pass a 32-bit guard — must still fail CLEANLY
    val ok = Avi.encode(3, 2, Array(Multimodal.synthFrame(1L, 0, 6)))
    val hugeLen = ok.clone()
    hugeLen(16) = 0xff.toByte; hugeLen(17) = 0xff.toByte // avih size →
    hugeLen(18) = 0xff.toByte; hugeLen(19) = 0x7f.toByte // 0x7fffffff
    intercept[IllegalArgumentException] { Avi.decodeMeta(hugeLen) }
    // BMP with width × height whose pixel-array size wraps: stride(w)*h
    // overflows Int positive-ish and a 32-bit compare could admit it
    val bmp = Bmp.encode24(2, 2, Array(0, 0, 0, 0))
    val hugeDims = bmp.clone()
    hugeDims(18) = 0xff.toByte; hugeDims(19) = 0xff.toByte // width →
    hugeDims(20) = 0xff.toByte; hugeDims(21) = 0x3f.toByte // 0x3fffffff
    val e = intercept[IllegalArgumentException] { Bmp.decodeMeta(hugeDims) }
    assert(e.getMessage.contains("pixel array"),
      s"expected the bounds guard, got: ${e.getMessage}")
  }

  test("m06 stats match a direct recompute of the synthesis formula") {
    val rows = Multimodal.m06VideoFrameStats(spark, sf).collect()
    assert(rows.length > 0)
    rows.take(50).foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val w = r.getAs[Int]("width")
      val h = r.getAs[Int]("height")
      val nf = r.getAs[Int]("n_frames")
      assert(h === 2 + (id % 5).toInt)
      assert(r.getAs[Int]("n_sampled") === (nf + 1) / 2)
      val sampled = (0 until nf by 2)
        .map(f => Bmp.stats(Multimodal.synthFrame(id, f, w * h)))
      assert(r.getAs[Long]("sum_r") === sampled.map(_.sumR).sum)
      assert(r.getAs[Long]("sum_g") === sampled.map(_.sumG).sum)
      assert(r.getAs[Long]("sum_b") === sampled.map(_.sumB).sum)
      assert(r.getAs[Int]("peak_lum") === sampled.map(_.peakLum).max)
    }
  }

  test("wav resampleNearest: identity at same rate, exact every-2nd-" +
      "frame at 2:1, channel interleave preserved") {
    // identity: same-rate resample reproduces the fixture byte-for-byte
    val mono = fixture("sine_mono_8k.wav")
    assert(Wav.resampleNearest(mono, 8000).sameElements(mono))
    // 2:1 on the stereo fixture: output frame f = input frame 2f, both
    // channels of the frame kept together
    val stereo = fixture("ramp_stereo_44k.wav") // 44100 Hz, 2ch
    val out = Wav.resampleNearest(stereo, 22050)
    val m = Wav.decodeMeta(out)
    assert(m.sampleRate === 22050 && m.channels === 2)
    val in = Wav.samples(stereo)
    val os = Wav.samples(out)
    assert(os.length === (in.length / 2 / 2) * 2)
    for (f <- 0 until os.length / 2; c <- 0 until 2)
      assert(os(f * 2 + c) === in(2 * f * 2 + c),
        s"output frame $f ch $c must be input frame ${2 * f}")
  }

  test("wav mixdownMono: mono passes through sample-exact, stereo " +
      "frames average with truncation toward zero") {
    // mono: the kernel is the identity on samples (header re-encoded)
    val mono = fixture("sine_mono_8k.wav")
    val monoOut = Wav.mixdownMono(mono)
    assert(Wav.decodeMeta(monoOut).channels === 1)
    assert(Wav.samples(monoOut).sameElements(Wav.samples(mono)))
    // stereo: frame f becomes (L + R) / 2, Scala Int division —
    // truncation toward zero, the rule the DuckDB oracle mirrors
    val stereo = fixture("ramp_stereo_44k.wav")
    val out = Wav.mixdownMono(stereo)
    val m = Wav.decodeMeta(out)
    assert(m.channels === 1 &&
      m.sampleRate === Wav.decodeMeta(stereo).sampleRate)
    val in = Wav.samples(stereo)
    val os = Wav.samples(out)
    assert(os.length === in.length / 2)
    for (f <- os.indices)
      assert(os(f) === ((in(2 * f) + in(2 * f + 1)) / 2).toShort,
        s"frame $f must be the truncated channel average")
    // the truncation rule on a negative odd sum: (-3 + 0) / 2 = -1
    val neg = Wav.encodePcm16(Array[Short](-3, 0), 8000, 2)
    assert(Wav.samples(Wav.mixdownMono(neg)).sameElements(
      Array[Short](-1)))
  }

  test("wav normalizePeak: loudest sample lands exactly on the " +
      "target, scaling truncates toward zero, silence passes through") {
    // peak 4 → gain 30000/4: every sample is s * 30000 / 4 exactly
    val quiet = Wav.encodePcm16(Array[Short](1, -2, 4, 0), 8000, 1)
    val out = Wav.samples(Wav.normalizePeak(quiet, 30000))
    assert(out.sameElements(Array[Short](7500, -15000, 30000, 0)))
    // truncation toward zero on both signs: 3*10/7 = 4, -3*10/7 = -4
    val odd = Wav.encodePcm16(Array[Short](3, -3, 7), 8000, 1)
    assert(Wav.samples(Wav.normalizePeak(odd, 10))
      .sameElements(Array[Short](4, -4, 10)))
    // layout survives; peak reads back exactly the target
    val stereo = fixture("ramp_stereo_44k.wav")
    val n = Wav.normalizePeak(stereo, 30000)
    val m = Wav.decodeMeta(n)
    assert(m.channels === Wav.decodeMeta(stereo).channels &&
      m.sampleRate === Wav.decodeMeta(stereo).sampleRate &&
      m.nSamples === Wav.decodeMeta(stereo).nSamples)
    assert(Wav.stats(Wav.samples(n)).peakAbs === 30000)
    // silence: no gain normalizes it — bytes must survive unchanged
    val silent = Wav.encodePcm16(Array[Short](0, 0, 0), 8000, 1)
    assert(Wav.normalizePeak(silent, 30000).sameElements(silent))
    // the full-scale negative edge: -32768 at peak 32768 → exactly
    // -30000, no overflow in the Long product
    val full = Wav.encodePcm16(Array[Short](-32768, 16384), 8000, 1)
    assert(Wav.samples(Wav.normalizePeak(full, 30000))
      .sameElements(Array[Short](-30000, 15000)))
  }

  test("avi temporalSample keeps exactly the even frames byte-exact " +
      "and doubles usPerFrame") {
    val w = 5; val h = 4
    val fs = Array.tabulate(5)(f =>
      Array.tabulate(w * h)(i => (f * 1000 + i) & 0xffffff))
    val blob = Avi.encode(w, h, fs, usPerFrame = 40000)
    val out = Avi.temporalSample(blob, 2)
    val m = Avi.decodeMeta(out)
    assert(m.width === w && m.height === h)
    assert(m.nFrames === 3) // frames 0, 2, 4
    assert(m.usPerFrame === 80000,
      "duration preservation: usPerFrame must scale by the step")
    val kept = Avi.frames(out)
    assert(kept(0).sameElements(fs(0)))
    assert(kept(1).sameElements(fs(2)))
    assert(kept(2).sameElements(fs(4)))
    // step 1 is the identity on frames
    assert(Avi.frames(Avi.temporalSample(blob, 1)).zip(fs)
      .forall { case (a, b) => a.sameElements(b) })
  }

  test("m08 resample stats match a direct recompute through " +
      "resampleNearest") {
    val rows = Multimodal.m08Resample(spark, sf).collect()
    assert(rows.length > 0)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.take(50).foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val ch = 1 + (id % 2).toInt
      val rate = 8000 + (id % 3).toInt * 8000
      val n = ((docs(id) % 96).toInt + 32) * ch
      val src = Wav.encodePcm16(Multimodal.synthSamples(id, n), rate, ch)
      val st = Wav.stats(Wav.samples(
        Wav.resampleNearest(src, Multimodal.ResampleRate)))
      assert(r.getAs[Int]("sample_rate") === Multimodal.ResampleRate)
      assert(r.getAs[Int]("channels") === ch)
      assert(r.getAs[Int]("peak_abs") === st.peakAbs)
      assert(r.getAs[Long]("sum_abs") === st.sumAbs)
      assert(r.getAs[Long]("sum_sq") === st.sumSq)
    }
  }

  test("bmp resizeNearest maps every output pixel by the exact " +
      "integer rule and yields a valid BMP") {
    val w = 7; val h = 5 // off-grid both ways
    val src = Bmp.encode24(w, h, Multimodal.synthPixels(3L, w * h))
    val dst = Bmp.resizeNearest(src, 3, 2)
    val m = Bmp.decodeMeta(dst)
    assert(m.width === 3 && m.height === 2)
    val in = Bmp.pixels(src)
    val out = Bmp.pixels(dst)
    for (y <- 0 until 2; x <- 0 until 3)
      assert(out(y * 3 + x) === in((y * h / 2) * w + x * w / 3),
        s"output ($x,$y) not the nearest-neighbor source pixel")
    // upscale round-trip: 1x1 source → every output pixel is the one
    // source pixel
    val one = Bmp.encode24(1, 1, Array(0x123456))
    assert(Bmp.pixels(Bmp.resizeNearest(one, 4, 3)).forall(_ == 0x123456))
  }

  test("bmp cropCenter maps every output pixel by the exact " +
      "center-anchor rule, yields a valid BMP, and rejects " +
      "out-of-bounds windows") {
    val w = 7; val h = 5
    val src = Bmp.encode24(w, h, Multimodal.synthPixels(3L, w * h))
    val dst = Bmp.cropCenter(src, 4, 3)
    val m = Bmp.decodeMeta(dst)
    assert(m.width === 4 && m.height === 3)
    val in = Bmp.pixels(src)
    val out = Bmp.pixels(dst)
    val x0 = (w - 4) / 2; val y0 = (h - 3) / 2
    for (y <- 0 until 3; x <- 0 until 4)
      assert(out(y * 4 + x) === in((y0 + y) * w + (x0 + x)),
        s"output ($x,$y) not the center-anchored source pixel")
    // full-frame crop is the identity on pixels
    assert(Bmp.pixels(Bmp.cropCenter(src, w, h)).toSeq === in.toSeq)
    intercept[IllegalArgumentException] { Bmp.cropCenter(src, w + 1, h) }
  }

  test("m05 stats match a direct recompute of the synthesis formula") {
    val rows = Multimodal.m05ImageStats(spark, sf).collect()
    assert(rows.length > 0)
    rows.take(50).foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val w = r.getAs[Int]("width")
      val h = r.getAs[Int]("height")
      assert(h === 3 + (id % 13).toInt)
      val st = Bmp.stats(Multimodal.synthPixels(id, w * h))
      assert(r.getAs[Long]("sum_r") === st.sumR)
      assert(r.getAs[Long]("sum_g") === st.sumG)
      assert(r.getAs[Long]("sum_b") === st.sumB)
      assert(r.getAs[Int]("peak_lum") === st.peakLum)
    }
  }

  test("m15 scene cuts: bounded by transitions, non-degenerate " +
      "threshold, exact diff accounting") {
    val rows = Multimodal.m15SceneCuts(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nf = r.getAs[Int]("n_frames")
      val cuts = r.getAs[Int]("n_cuts")
      assert(nf >= 2, "every synthetic video has >= 2 frames")
      assert(cuts >= 0 && cuts <= nf - 1,
        s"doc ${r.getLong(0)}: $cuts cuts for $nf frames")
      assert(r.getAs[Long]("max_diff") <= r.getAs[Long]("sum_diff"))
      assert(r.getAs[Long]("max_diff") > 0L,
        "consecutive synthetic frames always differ")
    }
    // the threshold must actually discriminate: both outcomes occur
    val cutCounts = rows.map(_.getAs[Int]("n_cuts")).toSet
    assert(cutCounts.size > 1,
      s"degenerate cut threshold — every video got $cutCounts")
  }

  test("m16 low-energy segments: consistent run accounting and a " +
      "non-degenerate threshold") {
    val rows = Multimodal.m16AudioSegments(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nf = r.getAs[Int]("n_frames")
      val low = r.getAs[Int]("n_low")
      val segs = r.getAs[Int]("n_segments")
      val longest = r.getAs[Int]("longest_run")
      assert(nf >= 1)
      assert(low >= 0 && low <= nf)
      // runs partition the low frames: each segment has >= 1 frame,
      // the longest is one of them, and segments can't outnumber lows
      assert(segs >= 0 && segs <= low)
      assert(longest <= low && (low == 0 || longest >= 1))
      assert(segs == 0 || longest >= (low + segs - 1) / segs,
        s"doc ${r.getLong(0)}: longest run $longest can't cover " +
          s"$low lows in $segs segments")
    }
    // the energy threshold must discriminate: both outcomes occur
    val lows = rows.map(_.getAs[Int]("n_low"))
    assert(lows.exists(_ > 0) && rows.exists(r =>
      r.getAs[Int]("n_low") < r.getAs[Int]("n_frames")),
      "degenerate VAD threshold — all-low or all-high everywhere")
  }

  test("m17 keyframes: frame 0 opens shot 1, one keyframe per m15 " +
      "cut, shot ids contiguous") {
    val kf = Multimodal.m17Keyframes(spark, sf).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    val cuts = Multimodal.m15SceneCuts(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n_cuts")).toMap
    assert(kf.nonEmpty && kf.keySet === cuts.keySet)
    kf.foreach { case (doc, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("frame_idx"))
      assert(sorted.head.getAs[Int]("frame_idx") === 0)
      assert(sorted.head.getAs[Int]("shot_id") === 1)
      // exactly one keyframe per shot: n_cuts transitions open
      // n_cuts new shots after the opener
      assert(sorted.length === cuts(doc) + 1,
        s"doc $doc: ${sorted.length} keyframes for ${cuts(doc)} cuts")
      assert(sorted.map(_.getAs[Int]("shot_id")).toSeq ===
        (1 to sorted.length))
    }
  }

  test("m04 stats match a direct recompute of the synthesis formula") {
    val rows = Multimodal.m04AudioStats(spark, sf).collect()
    assert(rows.length > 0)
    rows.take(50).foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val n = r.getAs[Int]("n_samples")
      assert(r.getAs[Int]("channels") === 1 + (id % 2).toInt)
      assert(r.getAs[Int]("sample_rate") === 8000 + (id % 3).toInt * 8000)
      val st = Wav.stats(Multimodal.synthSamples(id, n))
      assert(r.getAs[Int]("peak_abs") === st.peakAbs)
      assert(r.getAs[Long]("sum_abs") === st.sumAbs)
      assert(r.getAs[Long]("sum_sq") === st.sumSq)
    }
  }

  test("resize operator re-encodes every blob as a valid BMP at the " +
      "target dimensions with nearest-neighbor pixels") {
    val images = Multimodal.imageTable(spark, sf).limit(5)
    val original = images.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("blob"))
      .toMap
    Multimodal.resize(images, 5, 4).collect().foreach { r =>
      val blob = r.getAs[Array[Byte]]("blob")
      val m = Bmp.decodeMeta(blob) // throws unless a valid BMP
      assert(m.width === 5 && m.height === 4)
      assert(Bmp.pixels(blob).toSeq === Bmp.pixels(
        Bmp.resizeNearest(original(r.getAs[Long]("doc_id")), 5, 4)).toSeq)
    }
  }

  test("m07 resize stats match a direct recompute through " +
      "resizeNearest") {
    val rows = Multimodal.m07Resize(spark, sf).collect()
    assert(rows.length > 0)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.take(50).foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val n = docs(id)
      val w = (4 + n % 29).toInt; val h = (3 + id % 13).toInt
      val src = Bmp.encode24(w, h, Multimodal.synthPixels(id, w * h))
      val st = Bmp.stats(Bmp.pixels(
        Bmp.resizeNearest(src, Multimodal.ResizeW, Multimodal.ResizeH)))
      assert(r.getAs[Int]("width") === Multimodal.ResizeW)
      assert(r.getAs[Int]("height") === Multimodal.ResizeH)
      assert(r.getAs[Long]("sum_r") === st.sumR)
      assert(r.getAs[Long]("sum_g") === st.sumG)
      assert(r.getAs[Long]("sum_b") === st.sumB)
      assert(r.getAs[Int]("peak_lum") === st.peakLum)
    }
  }

  test("m13 perceptual near-dup equals brute-force all-pairs hamming " +
      "(the banded candidate join is lossless under tau < bands)") {
    val got = Multimodal.m13ImageNeardup(spark, sf).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"),
        r.getAs[Int]("hamming")))
    // independent path: synthesize → encode → averageHash per doc,
    // then BRUTE-FORCE every pair (no bands) — if banding dropped any
    // qualifying pair, the sets would differ
    val hashes = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars")).collect().map { r =>
        val id = r.getLong(0); val n = r.getLong(1)
        val w = (4 + n % 29).toInt; val h = (3 + id % 13).toInt
        id -> Multimodal.averageHash(
          Bmp.encode24(w, h, Multimodal.synthPixels(id, w * h)))
      }.sortBy(_._1)
    val want = for {
      Array((a, (hiA, loA)), (b, (hiB, loB))) <- hashes.combinations(2)
      hd = java.lang.Long.bitCount(hiA ^ hiB) +
        java.lang.Long.bitCount(loA ^ loB)
      if hd <= Multimodal.PhashMaxHamming
    } yield (a, b, hd)
    assert(got.toSeq === want.toSeq)
    assert(got.nonEmpty, "corpus must exercise the near-dup path")
    // halves really are 32-bit non-negative (the no-2^63 contract the
    // oracle's BIGINT shifts rely on)
    hashes.foreach { case (_, (hi, lo)) =>
      assert(hi >= 0 && hi < (1L << 32) && lo >= 0 && lo < (1L << 32))
    }
  }

  test("m18 pair curation: every rule in the cascade fires on the " +
      "corpus and keep mirrors the reason") {
    val rows = Multimodal.m18PairCuration(spark, sf).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      assert((r.getAs[Int]("keep") == 1) ===
        (r.getAs[String]("reason") == "kept"))
    }
    val reasons = rows.map(_.getAs[String]("reason")).toSet
    Seq("image_too_small", "caption_too_short",
        "low_caption_diversity", "pair_mismatch", "kept")
      .foreach { want =>
        assert(reasons.contains(want),
          s"rule '$want' never fires — the cascade is not exercised")
      }
    // first-fail ordering: a doc failing the pixel floor reports
    // image_too_small even if its caption is also thin
    rows.filter(r => r.getAs[Int]("width") *
        r.getAs[Int]("height") < 64)
      .foreach(r =>
        assert(r.getAs[String]("reason") === "image_too_small"))
  }
}
