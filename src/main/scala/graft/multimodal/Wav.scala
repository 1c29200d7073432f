package graft.multimodal

/** Real-format audio decode: RIFF/WAVE PCM (the multimodal mandate's
  * "decode" made concrete — the container is a published byte layout
  * parseable with zero codec libraries, unlike compressed image/video
  * codecs this sandbox can't ship). The reference treats its binary
  * downloads (PDF/KML, `R/functions.R:84-140`) as real bytes on disk;
  * this is the engine-side analogue for an audio column.
  *
  * The parser is a generic RIFF chunk walk, NOT a fixed-offset-44 read:
  * chunk id (4 ASCII bytes) + little-endian u32 size + payload + one
  * pad byte when the size is odd, repeated until the buffer ends, with
  * `fmt ` and `data` captured wherever they appear. Real writers emit
  * extra chunks (`LIST`/`INFO`, `fact`, cue points) in varying order, so
  * a fixed-offset read is wrong on real files; MultimodalSpec pins the
  * walk against committed fixtures produced by a known tool (Python's
  * stdlib `wave` writer).
  *
  * Scale shape: encode and decode are pure byte-array kernels invoked
  * map-side from the m04 plan — no shuffle, no driver involvement, and
  * the blob never outlives its row.
  */
object Wav {

  /** Parsed container metadata. `nSamples` counts individual PCM values
    * across ALL channels (frames × channels) — the unit sample-level
    * stats aggregate over.
    */
  case class WavMeta(sampleRate: Int, channels: Int, bitsPerSample: Int,
      nSamples: Int, dataOffset: Int, dataBytes: Int)

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def fourCC(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  /** PCM 16-bit little-endian WAV bytes: standard RIFF header + `fmt `
    * + `data`. `samples` is channel-interleaved when `channels` > 1.
    */
  def encodePcm16(samples: Array[Short], sampleRate: Int,
      channels: Int = 1): Array[Byte] = {
    require(channels >= 1 && samples.length % channels == 0,
      s"${samples.length} samples not divisible by $channels channels")
    val dataBytes = samples.length * 2
    val out = new Array[Byte](44 + dataBytes)
    def putAscii(o: Int, s: String): Unit = {
      var i = 0; while (i < s.length) { out(o + i) = s.charAt(i).toByte; i += 1 }
    }
    def put16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def put32(o: Int, v: Long): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
      out(o + 2) = ((v >> 16) & 0xff).toByte
      out(o + 3) = ((v >> 24) & 0xff).toByte
    }
    putAscii(0, "RIFF"); put32(4, 36L + dataBytes); putAscii(8, "WAVE")
    putAscii(12, "fmt "); put32(16, 16L)
    put16(20, 1) // PCM
    put16(22, channels)
    put32(24, sampleRate.toLong)
    put32(28, sampleRate.toLong * channels * 2) // byte rate
    put16(32, channels * 2) // block align
    put16(34, 16) // bits per sample
    putAscii(36, "data"); put32(40, dataBytes.toLong)
    var i = 0
    while (i < samples.length) {
      val v = samples(i).toInt
      out(44 + 2 * i) = (v & 0xff).toByte
      out(45 + 2 * i) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Generic RIFF chunk walk; throws on anything that is not a PCM
    * WAVE container. Tolerates unknown chunks in any order and a stated
    * RIFF size smaller than the buffer (some writers pad), but never
    * reads past the buffer.
    */
  def decodeMeta(blob: Array[Byte]): WavMeta = {
    require(blob.length >= 12 && fourCC(blob, 0) == "RIFF" &&
      fourCC(blob, 8) == "WAVE", "not a RIFF/WAVE container")
    var fmtRate = -1; var fmtChannels = -1; var fmtBits = -1
    var dataOffset = -1; var dataBytes = -1
    var o = 12
    while (o + 8 <= blob.length) {
      val id = fourCC(blob, o)
      val size = u32(blob, o + 4)
      val body = o + 8
      require(body + size <= blob.length,
        s"chunk '$id' overruns the buffer (size $size at offset $o)")
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too short ($size bytes)")
          val audioFormat = u16(blob, body)
          require(audioFormat == 1, s"not PCM (format tag $audioFormat)")
          fmtChannels = u16(blob, body + 2)
          fmtRate = u32(blob, body + 4).toInt
          fmtBits = u16(blob, body + 14)
        case "data" =>
          dataOffset = body; dataBytes = size.toInt
        case _ => // LIST/fact/cue/...: skip
      }
      o = body + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    require(fmtRate > 0, "missing fmt chunk")
    require(dataOffset >= 0, "missing data chunk")
    require(fmtBits == 16, s"only PCM16 supported, got $fmtBits-bit")
    WavMeta(fmtRate, fmtChannels, fmtBits, dataBytes / 2, dataOffset,
      dataBytes)
  }

  /** All PCM16 values (channel-interleaved), little-endian decode. */
  def samples(blob: Array[Byte]): Array[Short] = {
    val m = decodeMeta(blob)
    val out = new Array[Short](m.nSamples)
    var i = 0
    while (i < m.nSamples) {
      out(i) = ((blob(m.dataOffset + 2 * i) & 0xff) |
        (blob(m.dataOffset + 2 * i + 1) << 8)).toShort
      i += 1
    }
    out
  }

  /** REAL resample over the real format (the audio twin of
    * [[Bmp.resizeNearest]]): nearest-neighbor sample-rate conversion
    * to `outRate` — output frame f reads input frame ⌊f·inRate/outRate⌋
    * (integer division, channel-preserving), the exact integer mapping
    * an oracle can recompute without float tolerance. Output frame
    * count is ⌊frames·outRate/inRate⌋. Returns a fully valid PCM16 WAV
    * at the new rate; pure byte kernel, map-side like decode.
    */
  def resampleNearest(blob: Array[Byte], outRate: Int): Array[Byte] = {
    require(outRate > 0, s"bad target rate $outRate")
    val m = decodeMeta(blob)
    val in = samples(blob)
    val ch = m.channels
    val inFrames = m.nSamples / ch
    val outFrames = (inFrames.toLong * outRate / m.sampleRate).toInt
    val out = new Array[Short](outFrames * ch)
    var f = 0
    while (f < outFrames) {
      val sf = (f.toLong * m.sampleRate / outRate).toInt
      var c = 0
      while (c < ch) { out(f * ch + c) = in(sf * ch + c); c += 1 }
      f += 1
    }
    encodePcm16(out, outRate, ch)
  }

  /** REAL channel mixdown over the real format: every frame's channels
    * average into one mono sample by integer division (sum / channels,
    * truncating toward zero — the same rule DuckDB's `//` applies, so
    * an oracle recomputes every output sample exactly; a float average
    * would need a rounding convention). Mono input passes through the
    * same kernel unchanged (sum of one / one). Returns a fully valid
    * mono PCM16 WAV at the original rate; pure byte kernel, map-side
    * like decode.
    */
  def mixdownMono(blob: Array[Byte]): Array[Byte] = {
    val m = decodeMeta(blob)
    val in = samples(blob)
    val ch = m.channels
    val frames = m.nSamples / ch
    val out = new Array[Short](frames)
    var f = 0
    while (f < frames) {
      var sum = 0
      var c = 0
      while (c < ch) { sum += in(f * ch + c); c += 1 }
      out(f) = (sum / ch).toShort
      f += 1
    }
    encodePcm16(out, m.sampleRate, 1)
  }

  /** REAL peak (gain) normalization over the real format: every sample
    * scales by targetPeak/peak in exact integer arithmetic —
    * s' = s * targetPeak / peak, truncating toward zero (the same rule
    * DuckDB's `//` applies, so an oracle recomputes every output
    * sample; a float gain would need a rounding convention). After
    * normalization the loudest sample sits at exactly ±targetPeak
    * (peak * targetPeak / peak is exact), which is the property the
    * spec pins. All-silent audio passes through unchanged — there is
    * no gain that normalizes silence, and 0/0 must not be invented.
    * Rate/channel layout survive; pure byte kernel, map-side.
    */
  def normalizePeak(blob: Array[Byte], targetPeak: Int): Array[Byte] = {
    require(targetPeak > 0 && targetPeak <= 32767,
      s"target peak $targetPeak outside PCM16 range (1..32767)")
    val m = decodeMeta(blob)
    val in = samples(blob)
    var peak = 0
    var i = 0
    while (i < in.length) {
      val a = math.abs(in(i).toInt)
      if (a > peak) peak = a
      i += 1
    }
    if (peak == 0) encodePcm16(in, m.sampleRate, m.channels)
    else {
      val out = new Array[Short](in.length)
      i = 0
      while (i < in.length) {
        out(i) = (in(i).toLong * targetPeak / peak).toShort
        i += 1
      }
      encodePcm16(out, m.sampleRate, m.channels)
    }
  }

  /** Exact integer sample statistics — peak |s|, Σ|s|, Σs² — chosen so
    * the DuckDB oracle reproduces them with exact BIGINT arithmetic
    * (float RMS would hash-mismatch on summation order).
    */
  case class SampleStats(peakAbs: Int, sumAbs: Long, sumSq: Long)

  def stats(samples: Array[Short]): SampleStats = {
    var peak = 0; var sabs = 0L; var ssq = 0L
    var i = 0
    while (i < samples.length) {
      val v = samples(i).toInt
      val a = if (v < 0) -v else v
      if (a > peak) peak = a
      sabs += a; ssq += v.toLong * v
      i += 1
    }
    SampleStats(peak, sabs, ssq)
  }
}
