package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Multimodal (image/audio/video) column handling (builder-prompt
  * mandate): media as opaque `binary` columns + typed metadata, with
  * decode / feature-extract / resize / frame-sample operators.
  *
  * Every declared operator runs over a REAL published container format
  * decoded with zero codec libraries — RIFF/WAVE PCM16 audio ([[Wav]]),
  * 24-bit Windows BMP images ([[Bmp]]), RIFF/AVI DIB video ([[Avi]]).
  * The query side reads dimensions, rates, and frame counts back OUT of
  * the container bytes; the deterministic synthesis formulas below
  * exist only so the DuckDB oracle can recompute every sample/pixel
  * with exact integer arithmetic. (Rounds 1–5 used a synthetic "GR"
  * container to pin the plan shapes first; it retired in round 7 once
  * all three real decoders landed — `git log` has the history.)
  *
  * Scale design: encode and decode are pure byte kernels invoked
  * map-side over the binary column — no shuffle, no driver involvement,
  * blobs never outlive their row. Frame explode multiplies rows before
  * any shuffle (partial agg applies); feature extraction is
  * mapPartitions with per-partition buffer reuse — the Scala analogue
  * of Python's mapInPandas batch UDF.
  */
object Multimodal {

  private type Q = (SparkSession, String) => DataFrame

  // --- real-format audio column (RIFF/WAVE PCM16, see Wav.scala) ---

  /** Deterministic PCM16 synthesis so the DuckDB oracle can recompute
    * every sample with exact integer arithmetic: sample i of doc d is
    * `(d*31 + i*7919) mod 65536 - 32768`. Rate/channels/frame-count
    * derive from doc_id / n_chars.
    */
  def synthSamples(docId: Long, nSamples: Int): Array[Short] = {
    val out = new Array[Short](nSamples)
    var i = 0
    while (i < nSamples) {
      out(i) = ((docId * 31L + i.toLong * 7919L) % 65536L - 32768L).toShort
      i += 1
    }
    out
  }

  /** Audio table derived from `documents`: a real RIFF/WAVE binary
    * column (any audio tool can read these blobs). Encode is map-side.
    */
  def audioTable(spark: SparkSession, dir: String): DataFrame = {
    val mk = udf { (docId: Long, nChars: Long) =>
      val channels = 1 + (docId % 2).toInt
      val rate = 8000 + (docId % 3).toInt * 8000
      val nSamples = ((nChars % 96).toInt + 32) * channels
      Wav.encodePcm16(synthSamples(docId, nSamples), rate, channels)
    }
    Tables.documents(spark, dir)
      .select(col("doc_id"), mk(col("doc_id"), col("n_chars")).as("blob"))
  }

  /** Decoded per-blob audio facts: container metadata from the RIFF
    * chunk walk + exact integer sample statistics (peak |s|, Σ|s|, Σs²
    * — chosen over float RMS so the oracle hash cannot drift on
    * summation order).
    */
  case class AudioStats(sample_rate: Int, channels: Int, n_samples: Int,
      peak_abs: Int, sum_abs: Long, sum_sq: Long)

  /** m04 — WAV decode + sample stats. The plan round-trips REAL bytes:
    * synth → encodePcm16 → binary column → generic RIFF walk → PCM16
    * decode → stats, all map-side (no shuffle until the final sort).
    */
  val m04AudioStats: Q = (s, d) => {
    val dec = udf { (blob: Array[Byte]) =>
      val m = Wav.decodeMeta(blob)
      val st = Wav.stats(Wav.samples(blob))
      AudioStats(m.sampleRate, m.channels, m.nSamples,
        st.peakAbs, st.sumAbs, st.sumSq)
    }
    audioTable(s, d).withColumn("a", dec(col("blob")))
      .select(col("doc_id"), col("a.*")).orderBy("doc_id")
  }

  // --- real-format image column (24-bit BMP, see Bmp.scala) ---

  /** Deterministic RGB synthesis so the DuckDB oracle can recompute
    * every channel with exact integer arithmetic: pixel p (row-major
    * top-down) of doc d has R = (d·13 + p·19) mod 256,
    * G = (d·11 + p·17) mod 256, B = (d·7 + p·13) mod 256.
    */
  def synthPixels(docId: Long, nPixels: Int): Array[Int] = {
    val out = new Array[Int](nPixels)
    var p = 0
    while (p < nPixels) {
      val r = ((docId * 13L + p.toLong * 19L) % 256L).toInt
      val g = ((docId * 11L + p.toLong * 17L) % 256L).toInt
      val b = ((docId * 7L + p.toLong * 13L) % 256L).toInt
      out(p) = (r << 16) | (g << 8) | b
      p += 1
    }
    out
  }

  /** Image table derived from `documents`: a real 24-bit BMP binary
    * column (any image tool opens these blobs). Widths off the 4-byte
    * grid are the common case here, so the row-padding path is always
    * exercised. Encode is map-side; `lang` rides along for the m02
    * per-language feature rollup.
    */
  def imageTable(spark: SparkSession, dir: String): DataFrame = {
    val mk = udf { (docId: Long, nChars: Long) =>
      val w = 4 + (nChars % 29).toInt
      val h = 3 + (docId % 13).toInt
      Bmp.encode24(w, h, synthPixels(docId, w * h))
    }
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        mk(col("doc_id"), col("n_chars")).as("blob"))
  }

  /** Decoded per-blob image facts: header metadata + exact integer
    * channel statistics (same no-float-drift rationale as
    * [[AudioStats]]).
    */
  case class ImageStats(width: Int, height: Int, sum_r: Long,
      sum_g: Long, sum_b: Long, peak_lum: Int)

  /** m05 — BMP decode + pixel stats, the image twin of m04: synth →
    * encode24 → binary column → header walk (offset/orientation/
    * padding honored) → pixel decode → stats, all map-side. The query
    * side reads width/height back OUT of the BMP bytes — the synthesis
    * formula only reappears in the oracle.
    */
  val m05ImageStats: Q = (s, d) => {
    val dec = udf { (blob: Array[Byte]) =>
      val m = Bmp.decodeMeta(blob)
      val st = Bmp.stats(Bmp.pixels(blob))
      ImageStats(m.width, m.height, st.sumR, st.sumG, st.sumB,
        st.peakLum)
    }
    imageTable(s, d).withColumn("a", dec(col("blob")))
      .select(col("doc_id"), col("a.*")).orderBy("doc_id")
  }

  // --- real-format video column (RIFF/AVI + DIB frames, Avi.scala) ---

  /** Deterministic per-frame RGB synthesis (oracle-recomputable):
    * pixel p of frame f of doc d has R = (d·13 + f·23 + p·19) mod 256,
    * G = (d·11 + f·29 + p·17) mod 256, B = (d·7 + f·31 + p·13) mod 256.
    */
  def synthFrame(docId: Long, f: Int, nPixels: Int): Array[Int] = {
    val out = new Array[Int](nPixels)
    var p = 0
    while (p < nPixels) {
      val r = ((docId * 13L + f * 23L + p.toLong * 19L) % 256L).toInt
      val g = ((docId * 11L + f * 29L + p.toLong * 17L) % 256L).toInt
      val b = ((docId * 7L + f * 31L + p.toLong * 13L) % 256L).toInt
      out(p) = (r << 16) | (g << 8) | b
      p += 1
    }
    out
  }

  /** Video table derived from `documents`: a real RIFF/AVI binary
    * column of uncompressed DIB frames. Encode is map-side.
    */
  def videoTable(spark: SparkSession, dir: String): DataFrame = {
    val mk = udf { (docId: Long, nChars: Long) =>
      val w = 3 + (nChars % 13).toInt
      val h = 2 + (docId % 5).toInt
      val nf = 2 + (nChars % 7).toInt
      Avi.encode(w, h,
        Array.tabulate(nf)(f => synthFrame(docId, f, w * h)))
    }
    Tables.documents(spark, dir)
      .select(col("doc_id"), mk(col("doc_id"), col("n_chars")).as("blob"))
  }

  /** Decoded per-blob video facts over EVERY SECOND frame (the
    * frame-sampling mandate over a real container): header metadata +
    * exact integer channel sums and peak BT.601 luminance of the
    * sampled frames.
    */
  case class VideoStats(width: Int, height: Int, n_frames: Int,
      n_sampled: Int, sum_r: Long, sum_g: Long, sum_b: Long,
      peak_lum: Int)

  /** m06 — AVI decode + every-2nd-frame sample stats: synth →
    * Avi.encode → binary column → recursive RIFF LIST walk → DIB frame
    * decode → stride-2 sample → stats, all map-side. The query side
    * reads geometry and frame count back OUT of the container bytes;
    * the synthesis formula reappears only in the oracle.
    */
  val m06VideoFrameStats: Q = (s, d) => {
    val dec = udf { (blob: Array[Byte]) =>
      val m = Avi.decodeMeta(blob)
      val fs = Avi.frames(blob)
      var sr = 0L; var sg = 0L; var sb = 0L; var peak = 0; var ns = 0
      var f = 0
      while (f < fs.length) {
        if (f % 2 == 0) { // frame-sample: every second frame
          val st = Bmp.stats(fs(f))
          sr += st.sumR; sg += st.sumG; sb += st.sumB
          if (st.peakLum > peak) peak = st.peakLum
          ns += 1
        }
        f += 1
      }
      VideoStats(m.width, m.height, m.nFrames, ns, sr, sg, sb, peak)
    }
    videoTable(s, d).withColumn("a", dec(col("blob")))
      .select(col("doc_id"), col("a.*")).orderBy("doc_id")
  }

  /** m15's cut threshold: a transition is a CUT when its total
    * absolute RGB difference exceeds `thresh × 3 × n_pixels` (i.e. the
    * per-channel mean |Δ| exceeds `thresh`). 49 sits at the corpus's
    * mean inter-frame difference, so both outcomes occur and the
    * decision is a pure integer comparison in both engines.
    */
  val SceneCutThresh = 49L

  /** Per-video shot-boundary facts: exact integer frame-difference
    * accounting (no float similarity — the oracle recomputes every
    * per-pixel |Δ| from the synthesis formula).
    */
  case class SceneStats(n_frames: Int, n_cuts: Int, max_diff: Long,
      sum_diff: Long)

  /** m15 — SCENE-CHANGE (shot-boundary) detection over the real AVI
    * container: decode consecutive frame pairs, total absolute RGB
    * difference per transition, a cut wherever the per-channel mean
    * difference clears [[SceneCutThresh]]. The training-data use is
    * frame-sampling budget allocation — sample densely around cuts,
    * sparsely inside static shots. All map-side over the binary
    * column (the m06 contract): blobs never outlive their row, the
    * only exchange is the presentation sort.
    */
  val m15SceneCuts: Q = (s, d) => {
    val dec = udf { (blob: Array[Byte]) =>
      val fs = Avi.frames(blob)
      val npx = if (fs.nonEmpty) fs(0).length else 0
      var cuts = 0; var maxD = 0L; var sumD = 0L
      var f = 1
      while (f < fs.length) {
        var i = 0; var dsum = 0L
        while (i < npx) {
          val a = fs(f - 1)(i); val b = fs(f)(i)
          dsum += math.abs(((a >> 16) & 0xff) - ((b >> 16) & 0xff)) +
            math.abs(((a >> 8) & 0xff) - ((b >> 8) & 0xff)) +
            math.abs((a & 0xff) - (b & 0xff))
          i += 1
        }
        sumD += dsum
        if (dsum > maxD) maxD = dsum
        if (dsum > SceneCutThresh * 3L * npx) cuts += 1
        f += 1
      }
      SceneStats(fs.length, cuts, maxD, sumD)
    }
    videoTable(s, d).withColumn("a", dec(col("blob")))
      .select(col("doc_id"), col("a.*")).orderBy("doc_id")
  }

  /** m17 — KEYFRAME SELECTION (scene-cut-anchored frame sampling, the
    * consumer of m15's shot boundaries): emit frame 0 plus the first
    * frame of every new shot (each transition clearing
    * [[SceneCutThresh]]), tagged with its running shot number — the
    * content-aware sampling manifest a video training pipeline feeds
    * to the frame extractor (dense at cuts, sparse inside static
    * shots), next to m03's uniform every-Nth sampling. One row per
    * selected keyframe via an in-row generator over the decoded AVI;
    * all map-side, exact integer cut decisions, fully oracled.
    */
  val m17Keyframes: Q = (s, d) => {
    val dec = udf { (blob: Array[Byte]) =>
      val fs = Avi.frames(blob)
      val npx = if (fs.nonEmpty) fs(0).length else 0
      val out = scala.collection.mutable.ArrayBuffer[(Int, Int)]((0, 1))
      var shot = 1
      var f = 1
      while (f < fs.length) {
        var i = 0; var dsum = 0L
        while (i < npx) {
          val a = fs(f - 1)(i); val b = fs(f)(i)
          dsum += math.abs(((a >> 16) & 0xff) - ((b >> 16) & 0xff)) +
            math.abs(((a >> 8) & 0xff) - ((b >> 8) & 0xff)) +
            math.abs((a & 0xff) - (b & 0xff))
          i += 1
        }
        if (dsum > SceneCutThresh * 3L * npx) {
          shot += 1; out += ((f, shot))
        }
        f += 1
      }
      out.toSeq
    }
    videoTable(s, d)
      .select(col("doc_id"), explode(dec(col("blob"))).as("k"))
      .select(col("doc_id"), col("k._1").as("frame_idx"),
        col("k._2").as("shot_id"))
      .orderBy("doc_id", "frame_idx")
  }

  /** m16's analysis frame: 64 interleaved samples per energy frame
    * (the 8 ms VAD frame at 8 kHz), and the low-energy decision
    * compares the frame's Σ|s| against frameLen × [[VadMeanAbs]] —
    * the corpus-wide expected |sample| under the synthesis formula,
    * so both outcomes occur and the cut is exact integer arithmetic
    * in both engines (the last partial frame scales its threshold by
    * its true length).
    */
  val VadFrameLen = 64
  val VadMeanAbs = 16384L

  /** Per-clip silence/low-energy segmentation facts: frame counts,
    * low-frame count, the number of contiguous low RUNS (segments),
    * and the longest run — all exact integers.
    */
  case class VadStats(n_frames: Int, n_low: Int, n_segments: Int,
      longest_run: Int)

  /** m16 — LOW-ENERGY SEGMENTATION (voice-activity-detection shape)
    * over the real WAV container: decode PCM16, frame the sample
    * stream, flag low-energy frames by exact integer Σ|s| threshold,
    * then run-length the flags into contiguous segments — the
    * gaps-and-islands statistic an audio curation pipeline uses to
    * drop silence-dominated clips and to cut long recordings at
    * pauses. All map-side over the binary column (the m04 contract);
    * the oracle recomputes every frame energy from the synthesis
    * formula and rebuilds the same islands with window functions.
    */
  val m16AudioSegments: Q = (s, d) => {
    val dec = udf { (blob: Array[Byte]) =>
      val samples = Wav.samples(blob)
      val n = samples.length
      val nFrames = (n + VadFrameLen - 1) / VadFrameLen
      var nLow = 0; var nSeg = 0; var longest = 0; var run = 0
      var f = 0
      while (f < nFrames) {
        val lo = f * VadFrameLen
        val hi = math.min(lo + VadFrameLen, n)
        var sumAbs = 0L
        var i = lo
        while (i < hi) { sumAbs += math.abs(samples(i).toLong); i += 1 }
        if (sumAbs < (hi - lo) * VadMeanAbs) {
          nLow += 1; run += 1
          if (run == 1) nSeg += 1
          if (run > longest) longest = run
        } else run = 0
        f += 1
      }
      VadStats(nFrames, nLow, nSeg, longest)
    }
    audioTable(s, d).withColumn("a", dec(col("blob")))
      .select(col("doc_id"), col("a.*")).orderBy("doc_id")
  }

  // --- cross-modal metadata decode (m01) ---

  /** One row per doc with all three real-format binary columns, built
    * in a single `documents` scan (one projection, three encoders —
    * no self-join to assemble the modalities).
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame = {
    val mkImg = udf { (docId: Long, nChars: Long) =>
      val w = 4 + (nChars % 29).toInt
      val h = 3 + (docId % 13).toInt
      Bmp.encode24(w, h, synthPixels(docId, w * h))
    }
    val mkWav = udf { (docId: Long, nChars: Long) =>
      val channels = 1 + (docId % 2).toInt
      val rate = 8000 + (docId % 3).toInt * 8000
      val nSamples = ((nChars % 96).toInt + 32) * channels
      Wav.encodePcm16(synthSamples(docId, nSamples), rate, channels)
    }
    val mkAvi = udf { (docId: Long, nChars: Long) =>
      val w = 3 + (nChars % 13).toInt
      val h = 2 + (docId % 5).toInt
      val nf = 2 + (nChars % 7).toInt
      Avi.encode(w, h,
        Array.tabulate(nf)(f => synthFrame(docId, f, w * h)))
    }
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        mkImg(col("doc_id"), col("n_chars")).as("img_blob"),
        mkWav(col("doc_id"), col("n_chars")).as("audio_blob"),
        mkAvi(col("doc_id"), col("n_chars")).as("video_blob"))
  }

  /** Cross-modal metadata record: every field read back OUT of its
    * container's header bytes (BMP file+info header, WAV fmt chunk,
    * AVI avih), never from the synthesis parameters.
    */
  case class MediaMeta(img_width: Int, img_height: Int, img_bytes: Int,
      sample_rate: Int, channels: Int, n_samples: Int,
      vid_width: Int, vid_height: Int, n_frames: Int)

  /** m01 — metadata decode across all three modalities in one map-side
    * projection: one `documents` scan, three header walks per row, a
    * single presentation-sort exchange.
    */
  val m01MediaMeta: Q = (s, d) => {
    val dec = udf {
      (img: Array[Byte], wav: Array[Byte], avi: Array[Byte]) =>
        val im = Bmp.decodeMeta(img)
        val wm = Wav.decodeMeta(wav)
        val am = Avi.decodeMeta(avi)
        MediaMeta(im.width, im.height, im.imageBytes,
          wm.sampleRate, wm.channels, wm.nSamples,
          am.width, am.height, am.nFrames)
    }
    mediaTable(s, d)
      .withColumn("m",
        dec(col("img_blob"), col("audio_blob"), col("video_blob")))
      .select(col("doc_id"), col("m.*")).orderBy("doc_id")
  }

  // --- feature extraction (m02) ---

  /** Feature extraction via mapPartitions (the mapInPandas analogue):
    * 16-bin histogram of the decoded red channel's high nibble per
    * image, plus the pixel count — integer counts, not normalized
    * floats, so downstream aggregation stays exact. The histogram
    * buffer is reused across the partition; output schema fixed.
    */
  def extractFeatures(images: DataFrame): DataFrame = {
    val outSchema = StructType(
      images.schema.fields.filterNot(_.name == "blob") ++ Seq(
        StructField("bin_counts", ArrayType(LongType), nullable = false),
        StructField("n_pixels", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    val blobIdx = images.schema.fieldIndex("blob")
    images.mapPartitions { rows =>
      val hist = new Array[Long](16) // reused per partition
      rows.map { r =>
        java.util.Arrays.fill(hist, 0L)
        val px = Bmp.pixels(r.getAs[Array[Byte]](blobIdx))
        var i = 0
        while (i < px.length) { hist(((px(i) >> 16) & 0xff) >> 4) += 1; i += 1 }
        val keep = r.toSeq.patch(blobIdx, Nil, 1)
        Row.fromSeq(keep ++ Seq(hist.toSeq, px.length.toLong))
      }
    }(enc)
  }

  /** m02 — per-language red-channel histogram mass: mapPartitions
    * decode+histogram → posexplode of the dense 16-bin vector →
    * partial-aggregated groupBy. The fraction is ONE double division
    * of two exact integer sums (Σ count / Σ pixels per language), so
    * the oracle hash cannot drift on summation order; zero-count bins
    * still emit rows because the exploded vector is dense.
    */
  val m02MediaFeatures: Q = (s, d) =>
    extractFeatures(imageTable(s, d))
      .select(col("lang"), col("n_pixels"),
        posexplode(col("bin_counts")).as(Seq("bin", "c")))
      .groupBy("lang", "bin")
      .agg(sum("c").as("sum_c"), sum("n_pixels").as("sum_px"))
      .select(col("lang"), col("bin"),
        round(col("sum_c").cast("double") / col("sum_px"), 5)
          .as("r_bin_frac"))
      .orderBy("lang", "bin")

  // --- frame sampling (m03) ---

  /** Per-frame integer stats record for the m03 explode. */
  case class FrameStats(sum_r: Long, sum_g: Long, sum_b: Long,
      peak_lum: Int)

  /** m03 — frame sampling as a GENERATOR: decode the AVI, emit one row
    * per frame via posexplode (stats computed inside the row so pixel
    * arrays never cross the generator), no shuffle until the
    * presentation sort. This is the row-multiplying half of the
    * frame-sample mandate; m06 is the aggregating half.
    */
  val m03FrameSample: Q = (s, d) => {
    val dec = udf { (blob: Array[Byte]) =>
      Avi.frames(blob).toSeq.map { px =>
        val st = Bmp.stats(px)
        FrameStats(st.sumR, st.sumG, st.sumB, st.peakLum)
      }
    }
    videoTable(s, d)
      .select(col("doc_id"),
        posexplode(dec(col("blob"))).as(Seq("frame_idx", "fs")))
      .select(col("doc_id"), col("frame_idx"), col("fs.*"))
      .orderBy("doc_id", "frame_idx")
  }

  // --- resize (m07) ---

  /** REAL resize operator over the image column: nearest-neighbor
    * resample of every BMP blob to `w`×`h` via [[Bmp.resizeNearest]] —
    * binary→binary, pure map-side, output blobs are fully valid BMPs.
    */
  def resize(images: DataFrame, w: Int, h: Int): DataFrame = {
    val rs = udf { (blob: Array[Byte]) => Bmp.resizeNearest(blob, w, h) }
    images.withColumn("blob", rs(col("blob")))
  }

  /** m07 — resize + decode stats of the RESIZED bytes: the query reads
    * width/height back out of the re-encoded BMP header and aggregates
    * the resampled pixels, so the oracle (which recomputes the
    * nearest-neighbor index map ⌊x·w/ow⌋, ⌊y·h/oh⌋ from the synthesis
    * formula) verifies every output pixel end-to-end.
    */
  val ResizeW = 8
  val ResizeH = 6

  val m07Resize: Q = (s, d) => {
    val dec = udf { (blob: Array[Byte]) =>
      val m = Bmp.decodeMeta(blob)
      val st = Bmp.stats(Bmp.pixels(blob))
      ImageStats(m.width, m.height, st.sumR, st.sumG, st.sumB,
        st.peakLum)
    }
    resize(imageTable(s, d), ResizeW, ResizeH)
      .withColumn("a", dec(col("blob")))
      .select(col("doc_id"), col("a.*")).orderBy("doc_id")
  }

  // --- crop (m09) ---

  /** REAL crop operator over the image column: center crop of every
    * BMP blob to `w`×`h` via [[Bmp.cropCenter]] — binary→binary, pure
    * map-side, output blobs are fully valid BMPs.
    */
  def crop(images: DataFrame, w: Int, h: Int): DataFrame = {
    val cr = udf { (blob: Array[Byte]) => Bmp.cropCenter(blob, w, h) }
    images.withColumn("blob", cr(col("blob")))
  }

  /** m09 crop window: 4×3 is the corpus-wide minimum image size
    * (width = 4 + n_chars%29, height = 3 + doc_id%13), so the center
    * crop is in-bounds for every blob with no clamping special case.
    */
  val CropW = 4
  val CropH = 3

  /** m09 — crop + decode stats of the CROPPED bytes (the third member
    * of the transform set: m07 resize, m08 resample, m09 crop): the
    * query reads width/height back out of the re-encoded BMP and
    * aggregates the cropped pixels, so the oracle (which recomputes
    * the center-anchor source index (⌊(h−ch)/2⌋+y)·w + ⌊(w−cw)/2⌋+x
    * from the synthesis formula) verifies every output pixel
    * end-to-end.
    */
  val m09Crop: Q = (s, d) => {
    val dec = udf { (blob: Array[Byte]) =>
      val m = Bmp.decodeMeta(blob)
      val st = Bmp.stats(Bmp.pixels(blob))
      ImageStats(m.width, m.height, st.sumR, st.sumG, st.sumB,
        st.peakLum)
    }
    crop(imageTable(s, d), CropW, CropH)
      .withColumn("a", dec(col("blob")))
      .select(col("doc_id"), col("a.*")).orderBy("doc_id")
  }

  // --- grayscale (m14) ---

  /** REAL grayscale operator over the image column: BT.601 luminance
    * conversion of every BMP blob via [[Bmp.grayscale]] —
    * binary→binary, pure map-side, output blobs are fully valid
    * 24-bit BMPs with R=G=B.
    */
  def toGrayscale(images: DataFrame): DataFrame = {
    val gs = udf { (blob: Array[Byte]) => Bmp.grayscale(blob) }
    images.withColumn("blob", gs(col("blob")))
  }

  /** m14 — grayscale + decode stats of the CONVERTED bytes (the
    * channel-space member of the image transform set: m07 geometry,
    * m09 window, m14 color space — the normalization every vision
    * pipeline runs before single-channel models). The query reads the
    * stats back OUT of the re-encoded BMP: equal channel sums and
    * peak_lum = 1000·max(luma) hold only if every pixel was actually
    * rewritten, and the oracle recomputes ⌊(299R+587G+114B)/1000⌋
    * per pixel from the synthesis formula — so the conversion is
    * verified end-to-end, not just the geometry.
    */
  val m14Grayscale: Q = (s, d) => {
    val dec = udf { (blob: Array[Byte]) =>
      val m = Bmp.decodeMeta(blob)
      val st = Bmp.stats(Bmp.pixels(blob))
      ImageStats(m.width, m.height, st.sumR, st.sumG, st.sumB,
        st.peakLum)
    }
    toGrayscale(imageTable(s, d))
      .withColumn("a", dec(col("blob")))
      .select(col("doc_id"), col("a.*")).orderBy("doc_id")
  }

  // --- resample (m08) ---

  /** REAL resample operator over the audio column: nearest-neighbor
    * sample-rate conversion of every WAV blob to `rate` Hz via
    * [[Wav.resampleNearest]] — binary→binary, pure map-side, output
    * blobs are fully valid PCM16 WAVs at the new rate.
    */
  def resample(audio: DataFrame, rate: Int): DataFrame = {
    val rs = udf { (blob: Array[Byte]) => Wav.resampleNearest(blob, rate) }
    audio.withColumn("blob", rs(col("blob")))
  }

  /** m08 target rate: the corpus carries 8/16/24 kHz blobs, so the
    * 8 kHz downsample exercises 1:1, 2:1, and 3:1 integer ratios.
    */
  val ResampleRate = 8000

  /** m08 — resample + decode stats of the RESAMPLED bytes (the audio
    * twin of m07): the query reads rate/channels/counts back out of
    * the re-encoded WAV and aggregates the resampled samples, so the
    * oracle (which recomputes the nearest-neighbor frame map
    * ⌊f·inRate/outRate⌋ from the synthesis formula) verifies every
    * output sample end-to-end.
    */
  val m08Resample: Q = (s, d) => {
    val dec = udf { (blob: Array[Byte]) =>
      val m = Wav.decodeMeta(blob)
      val st = Wav.stats(Wav.samples(blob))
      AudioStats(m.sampleRate, m.channels, m.nSamples,
        st.peakAbs, st.sumAbs, st.sumSq)
    }
    resample(audioTable(s, d), ResampleRate)
      .withColumn("a", dec(col("blob")))
      .select(col("doc_id"), col("a.*")).orderBy("doc_id")
  }

  // --- mixdown (m10) ---

  /** REAL channel-mixdown operator over the audio column: every WAV
    * blob collapses to mono via [[Wav.mixdownMono]] (per-frame integer
    * average across channels) — binary→binary, pure map-side, output
    * blobs are fully valid mono PCM16 WAVs at the original rate.
    */
  def mixdown(audio: DataFrame): DataFrame = {
    val mx = udf { (blob: Array[Byte]) => Wav.mixdownMono(blob) }
    audio.withColumn("blob", mx(col("blob")))
  }

  /** m10 — mixdown + decode stats of the MIXED bytes (the channel
    * counterpart of m08's rate conversion; together they are the two
    * normalizations an audio training pipeline applies before feature
    * extraction): the query reads rate/channels/counts back out of the
    * re-encoded WAV — channels must read 1, frame count must survive —
    * and aggregates the mixed samples, so the oracle (which recomputes
    * every mono sample as sum-over-channels // channels from the
    * synthesis formula, both engines truncating toward zero) verifies
    * every output sample end-to-end. Half the corpus is stereo
    * (channels = 1 + doc_id % 2), so the kernel's identity and
    * averaging paths both execute.
    */
  val m10MixdownMono: Q = (s, d) => {
    val dec = udf { (blob: Array[Byte]) =>
      val m = Wav.decodeMeta(blob)
      val st = Wav.stats(Wav.samples(blob))
      AudioStats(m.sampleRate, m.channels, m.nSamples,
        st.peakAbs, st.sumAbs, st.sumSq)
    }
    mixdown(audioTable(s, d))
      .withColumn("a", dec(col("blob")))
      .select(col("doc_id"), col("a.*")).orderBy("doc_id")
  }

  // --- peak normalization (m12) ---

  /** Target peak for m12 — just under full scale, the standard
    * headroom convention. Oracle SQL interpolates this constant.
    */
  val NormTargetPeak = 30000

  /** REAL gain-normalization operator over the audio column: every WAV
    * blob rescales to a common peak via [[Wav.normalizePeak]] (exact
    * integer s·target/peak, truncating toward zero) — binary→binary,
    * pure map-side, output blobs are fully valid PCM16 WAVs at the
    * original rate/channel layout.
    */
  def normalize(audio: DataFrame): DataFrame = {
    val nm = udf { (blob: Array[Byte]) =>
      Wav.normalizePeak(blob, NormTargetPeak)
    }
    audio.withColumn("blob", nm(col("blob")))
  }

  /** m12 — peak normalization + decode stats of the NORMALIZED bytes
    * (the loudness counterpart of m08's rate and m10's channel
    * normalization — the third audio normalization a training
    * pipeline applies before feature extraction): the query reads
    * rate/channels/counts back out of the re-encoded WAV — layout
    * must survive, peak_abs must read exactly the target for any
    * non-silent blob — and aggregates the rescaled samples, so the
    * oracle (which recomputes every output sample as
    * (v · target) // peak from the synthesis formula, both engines
    * truncating toward zero) verifies every output sample end-to-end.
    */
  val m12NormalizePeak: Q = (s, d) => {
    val dec = udf { (blob: Array[Byte]) =>
      val m = Wav.decodeMeta(blob)
      val st = Wav.stats(Wav.samples(blob))
      AudioStats(m.sampleRate, m.channels, m.nSamples,
        st.peakAbs, st.sumAbs, st.sumSq)
    }
    normalize(audioTable(s, d))
      .withColumn("a", dec(col("blob")))
      .select(col("doc_id"), col("a.*")).orderBy("doc_id")
  }

  // --- temporal downsample (m11) ---

  /** m11's output-frame stats record: every field read back out of the
    * RE-ENCODED container (n_frames from the new avih header must be
    * ⌈nf/2⌉; stats over all surviving frames' pixels).
    */
  case class TrimStats(width: Int, height: Int, n_frames: Int,
      sum_r: Long, sum_g: Long, sum_b: Long, peak_lum: Int)

  /** m11 — REAL temporal downsample + decode stats of the re-encoded
    * bytes (the video member of the transform set, completing all
    * three modalities: image resize/crop, audio resample/mixdown,
    * video frame-drop): every AVI halves its frame rate via
    * [[Avi.temporalSample]] (keep f % 2 = 0, duration-preserving
    * usPerFrame), binary→binary, and the query reads frame count and
    * pixel stats back out of the NEW container, so the oracle (which
    * recomputes the kept frames from the synthesis formula) verifies
    * every surviving pixel end-to-end.
    */
  val m11VideoTrim: Q = (s, d) => {
    val ts = udf { (blob: Array[Byte]) => Avi.temporalSample(blob, 2) }
    val dec = udf { (blob: Array[Byte]) =>
      val m = Avi.decodeMeta(blob)
      val fs = Avi.frames(blob)
      var sr = 0L; var sg = 0L; var sb = 0L; var peak = 0
      fs.foreach { px =>
        val st = Bmp.stats(px)
        sr += st.sumR; sg += st.sumG; sb += st.sumB
        if (st.peakLum > peak) peak = st.peakLum
      }
      TrimStats(m.width, m.height, m.nFrames, sr, sg, sb, peak)
    }
    videoTable(s, d)
      .withColumn("blob", ts(col("blob")))
      .withColumn("a", dec(col("blob")))
      .select(col("doc_id"), col("a.*")).orderBy("doc_id")
  }

  // --- perceptual-hash near-dup (m13) ---

  /** m13 hamming bar: with the 64-bit hash cut into [[PhashBands]]
    * 8-bit bands, pigeonhole guarantees any pair within
    * [[PhashMaxHamming]] = 7 < 8 bits shares at least one band
    * UNCHANGED — so band-keyed candidate generation is LOSSLESS, not
    * approximate, and the banded plan's output equals brute-force
    * all-pairs by construction (PhashSpec proves it per run).
    */
  val PhashMaxHamming = 7
  val PhashBands      = 8

  /** 64-bit average-hash of a BMP blob, returned as two non-negative
    * 32-bit halves (hi = bits 32–63, lo = bits 0–31) so every engine
    * computes band bytes and XORs in plain BIGINT range — no signed
    * 2⁶³ corner. Pipeline: nearest-resize to 8×8 ([[Bmp.resizeNearest]]
    * — REAL re-encoded bytes, same kernel as m07), integer luminance
    * 299r+587g+114b per cell, mean by truncating division (all values
    * ≥ 0, so trunc ≡ floor ≡ DuckDB `//`), bit i set iff lum_i ≥ mean.
    */
  def averageHash(blob: Array[Byte]): (Long, Long) = {
    val px = Bmp.pixels(Bmp.resizeNearest(blob, 8, 8))
    val lum = new Array[Long](64)
    var i = 0; var sum = 0L
    while (i < 64) {
      val p = px(i)
      lum(i) = 299L * ((p >> 16) & 255) + 587L * ((p >> 8) & 255) +
        114L * (p & 255)
      sum += lum(i); i += 1
    }
    val mean = sum / 64
    var hi = 0L; var lo = 0L
    i = 0
    while (i < 64) {
      if (lum(i) >= mean) {
        if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
      }
      i += 1
    }
    (hi, lo)
  }

  /** m13 — image NEAR-dup by perceptual hash: the image-column twin of
    * the t07 SimHash text pipeline (Abbas-style image dedup runs this
    * shape over CLIP embeddings; aHash is its classic byte-exact
    * ancestor). Decode+hash is map-side over the binary column;
    * candidates come from a (band, byte)-keyed self-join — at 100 TB
    * the shuffle is keyed on 8·N short rows, never an N×N product —
    * and the hamming verify runs on the joined row. Because
    * [[PhashMaxHamming]] < [[PhashBands]], the banded candidate set
    * provably contains every qualifying pair (see above), so the
    * DuckDB oracle (same bands, same verify) hash-matches exactly.
    */
  val m13ImageNeardup: Q = (s, d) => {
    val ah = udf { (blob: Array[Byte]) =>
      val (hi, lo) = averageHash(blob); Array(hi, lo)
    }
    val hashes = imageTable(s, d)
      .select(col("doc_id"), ah(col("blob")).as("h"))
      .select(col("doc_id"), col("h")(0).as("hi"), col("h")(1).as("lo"))
    val bands = hashes
      .select(col("doc_id"), col("hi"), col("lo"),
        explode(sequence(lit(0), lit(PhashBands - 1))).as("band"))
      .select(col("doc_id"), col("band"),
        // SQL shiftright takes a column bits operand (the Scala
        // functions API wants a literal); halves are < 2³², so & 255
        // on the shifted value is the band byte in both engines
        expr("""CASE WHEN band < 4 THEN shiftright(lo, band * 8) % 256
                ELSE shiftright(hi, (band - 4) * 8) % 256 END""")
          .as("byte"))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.byte") === col("b.byte") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    val h1 = hashes.select(col("doc_id").as("d1"), col("hi").as("hi1"),
      col("lo").as("lo1"))
    val h2 = hashes.select(col("doc_id").as("d2"), col("hi").as("hi2"),
      col("lo").as("lo2"))
    cand.join(h1, "d1").join(h2, "d2")
      .withColumn("hamming",
        (bit_count(expr("hi1 ^ hi2")) + bit_count(expr("lo1 ^ lo2")))
          .cast("int"))
      .filter(col("hamming") <= PhashMaxHamming)
      .select(col("d1"), col("d2"), col("hamming"))
      .orderBy("d1", "d2")
  }

  /** m18's per-blob image facts (decoded from the container bytes —
    * the caption side never touches the blob).
    */
  case class PairImage(width: Int, height: Int, sum_rgb: Long)

  /** m18 — CROSS-MODAL PAIR CURATION (r11 VERDICT gap #2: the
    * CLIP-filter shape at integer-proxy fidelity): the MEDIA TABLE's
    * per-blob features joined with the caption side's text-quality
    * metrics on the pairing key, then an ordered keep/drop rule chain
    * with FIRST-FAIL reason codes (t39's audit-trail shape applied
    * across modalities) —
    * image_too_small (pixel floor) → caption_too_short (word floor) →
    * low_caption_diversity (t02's lexical-diversity bar) →
    * pair_mismatch (the genuinely cross-modal rule: underexposed
    * image — mean channel below the corpus-typical 127 — paired with
    * a thin caption; both factors integer-exact:
    * sum_rgb < 381·npx ∧ n_words < 32).
    *
    * TWO-SCAN SHAPE (review r17 item 2): the media side is a staged
    * parquet artifact of its own ([[ensurePairMedia]] — built once,
    * StageCache-memoized like the band index), so this is a genuine
    * asymmetric join of two DISTINCT tables: the blob table (wide
    * binary rows) decodes map-side to a few integer columns inside
    * its own scan, the caption table reduces map-side to its own
    * narrow metrics, and ONLY those narrow frames meet in a
    * doc_id-keyed equi-join — no broadcast hint (both sides are
    * corpus-sized at 100 TB; q03's hint rule), no blob ever crosses
    * the exchange. PlanSpec proves both properties on the plan: two
    * parquet scans, and the blob column dead before every Exchange.
    */
  val m18PairCuration: Q = (s, d) => {
    val dec = udf { (blob: Array[Byte]) =>
      val m = Bmp.decodeMeta(blob)
      val st = Bmp.stats(Bmp.pixels(blob))
      PairImage(m.width, m.height, st.sumR + st.sumG + st.sumB)
    }
    val img = ensurePairMedia(s, d)
      .withColumn("i", dec(col("blob")))
      .select(col("doc_id"), col("i.width"), col("i.height"),
        col("i.sum_rgb"))
    pairGateOf(img, captionMetricsOf(Tables.documents(s, d)))
      .orderBy("doc_id")
  }

  /** The staged media-side table for m18: the synthesized image blobs
    * materialized ONCE to their own parquet artifact, memoized on the
    * documents input fingerprint (the band-index pattern — built
    * outside Bench's timed loop via SparkEntry.warmIndexes). This is
    * what makes m18's join genuinely two-scan and asymmetric: the
    * media scan reads real on-disk binary rows the caption plan never
    * re-derives. At 100 TB the blob table is the pipeline's large
    * side; everything downstream of its scan is a few integers per
    * row.
    */
  /** Bump when the blob SYNTHESIS changes (imageTable's w/h formula,
    * [[synthPixels]], or the BMP encoder): the staged artifact's key
    * must carry the formula version, or a formula edit would
    * silently serve stale blobs against an oracle and an s20 twin
    * that re-derive from the new formula (review r18 — the band
    * index's version-seed rule applied here).
    */
  private val MediaSynthVersion = 1

  private[graft] def ensurePairMedia(s: SparkSession, d: String)
      : DataFrame = {
    val cache = new graft.pipeline.StageCache(s,
      graft.pipeline.StageCache.indexRoot)
    cache.stage("m18-media", s"v1-synth$MediaSynthVersion",
      Seq(s"$d/documents.parquet")) {
      imageTable(s, d).select(col("doc_id"), col("blob"))
    }
  }

  /** The caption side's map-side metric reduction (shared by m18 and
    * s20's per-batch gate).
    */
  private def captionMetricsOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).as("n_words"),
      size(array_distinct(split(trim(col("text")), "\\s+")))
        .as("n_distinct"))

  /** The pair rule chain over already-reduced narrow frames — the
    * logic both m18 (two-scan batch) and s20 (paired-arrival
    * streaming) run, so the streaming union stays provably equal to
    * the batch result.
    */
  private def pairGateOf(img: DataFrame, cap: DataFrame): DataFrame =
    img.join(cap, "doc_id")
      .withColumn("npx", col("width").cast("long") * col("height"))
      .withColumn("reason",
        when(col("npx") < 64, "image_too_small")
          .when(col("n_words") < 16, "caption_too_short")
          .when(col("n_distinct") * 2 < col("n_words"),
            "low_caption_diversity")
          .when(col("sum_rgb") < lit(381L) * col("npx") &&
            col("n_words") < 32, "pair_mismatch")
          .otherwise("kept"))
      .select(col("doc_id"), col("width"), col("height"),
        col("n_words"),
        (col("reason") === "kept").cast("int").as("keep"),
        col("reason"))

  /** m18's pair gate over an arbitrary (doc_id, text, n_chars, ...)
    * frame — the media blob is re-derived per row (paired ingest:
    * media and caption arrive together, the s20 arrival shape),
    * every rule is per-pair, so the per-batch union equals the batch
    * run. Unsorted; callers order.
    */
  private[graft] def pairCurationOf(docs: DataFrame): DataFrame = {
    val mk = udf { (docId: Long, nChars: Long) =>
      val w = 4 + (nChars % 29).toInt
      val h = 3 + (docId % 13).toInt
      Bmp.encode24(w, h, synthPixels(docId, w * h))
    }
    val dec = udf { (blob: Array[Byte]) =>
      val m = Bmp.decodeMeta(blob)
      val st = Bmp.stats(Bmp.pixels(blob))
      PairImage(m.width, m.height, st.sumR + st.sumG + st.sumB)
    }
    val img = docs
      .select(col("doc_id"), mk(col("doc_id"), col("n_chars")).as("blob"))
      .withColumn("i", dec(col("blob")))
      .select(col("doc_id"), col("i.width"), col("i.height"),
        col("i.sum_rgb"))
    pairGateOf(img, captionMetricsOf(docs))
  }

  // --- driver-contract queries ---

  val queries: Map[String, Q] = Map(
    "m18_pair_curation" -> m18PairCuration,
    "m13_image_neardup" -> m13ImageNeardup,
    "m12_normalize_peak" -> m12NormalizePeak,
    "m11_video_trim" -> m11VideoTrim,
    "m10_mixdown_mono" -> m10MixdownMono,
    "m01_media_meta" -> m01MediaMeta,
    "m02_media_features" -> m02MediaFeatures,
    "m03_frame_sample" -> m03FrameSample,
    "m04_audio_stats" -> m04AudioStats,
    "m05_image_stats" -> m05ImageStats,
    "m06_video_frame_stats" -> m06VideoFrameStats,
    "m07_resize" -> m07Resize,
    "m08_audio_resample" -> m08Resample,
    "m09_crop" -> m09Crop,
    "m14_grayscale" -> m14Grayscale,
    "m15_scene_cuts" -> m15SceneCuts,
    "m16_audio_segments" -> m16AudioSegments,
    "m17_keyframes" -> m17Keyframes,
  )

  // Every oracle recomputes container contents from the synthesis
  // formulas with exact integer arithmetic (DuckDB sums widen to
  // HUGEINT, hence the BIGINT casts); the Spark side reads the same
  // facts back out of the container bytes instead.
  val oracles: Map[String, String] = Map(
    // m18: image facts from the synthesis formulas, caption metrics
    // from the text, the same ordered CASE chain (all comparisons
    // integer-exact)
    "m18_pair_curation" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CAST(4 + n_chars % 29 AS INT) AS width,
        |    CAST(3 + doc_id % 13 AS INT) AS height,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS INT)
        |      AS n_words,
        |    CAST(len(list_distinct(
        |      string_split_regex(trim(text), '\s+'))) AS INT)
        |      AS n_distinct
        |  FROM documents),
        |px AS (
        |  SELECT doc_id,
        |    CAST(sum((doc_id * 13 + i * 19) % 256
        |      + (doc_id * 11 + i * 17) % 256
        |      + (doc_id * 7 + i * 13) % 256) AS BIGINT) AS sum_rgb
        |  FROM (SELECT doc_id, unnest(range(0, width * height)) AS i
        |        FROM p)
        |  GROUP BY doc_id),
        |dec AS (
        |  SELECT p.doc_id, width, height, n_words,
        |    CASE
        |      WHEN width * height < 64 THEN 'image_too_small'
        |      WHEN n_words < 16 THEN 'caption_too_short'
        |      WHEN n_distinct * 2 < n_words THEN 'low_caption_diversity'
        |      WHEN sum_rgb < 381 * width * height AND n_words < 32
        |        THEN 'pair_mismatch'
        |      ELSE 'kept' END AS reason
        |  FROM p JOIN px ON p.doc_id = px.doc_id)
        |SELECT doc_id, width, height, n_words,
        |  CAST(reason = 'kept' AS INT) AS keep, reason
        |FROM dec ORDER BY doc_id""".stripMargin,
    // m17: m15's transition deltas recomputed, then frame 0 plus one
    // row per cut transition, shot id = 1 + cuts through that frame
    "m17_keyframes" ->
      s"""WITH p AS (
        |  SELECT doc_id,
        |    CAST(3 + n_chars % 13 AS INT) AS w,
        |    CAST(2 + doc_id % 5 AS INT) AS h,
        |    CAST(2 + n_chars % 7 AS INT) AS nf
        |  FROM documents),
        |tr AS (SELECT doc_id, w, h, unnest(range(1, nf)) AS f FROM p),
        |px AS (
        |  SELECT doc_id, f, w * h AS npx,
        |    abs((doc_id * 13 + f * 23 + i * 19) % 256
        |      - (doc_id * 13 + (f - 1) * 23 + i * 19) % 256)
        |    + abs((doc_id * 11 + f * 29 + i * 17) % 256
        |      - (doc_id * 11 + (f - 1) * 29 + i * 17) % 256)
        |    + abs((doc_id * 7 + f * 31 + i * 13) % 256
        |      - (doc_id * 7 + (f - 1) * 31 + i * 13) % 256) AS ad
        |  FROM (SELECT doc_id, f, w, h, unnest(range(0, w * h)) AS i
        |        FROM tr)),
        |fd AS (
        |  SELECT doc_id, f, max(npx) AS npx, sum(ad) AS diff
        |  FROM px GROUP BY 1, 2),
        |cuts AS (
        |  SELECT doc_id, f,
        |    CASE WHEN diff > $SceneCutThresh * 3 * npx THEN 1 ELSE 0
        |      END AS cut
        |  FROM fd),
        |kf AS (
        |  SELECT doc_id, 0 AS frame_idx, 1 AS shot_id FROM p
        |  UNION ALL
        |  SELECT doc_id, f AS frame_idx,
        |    1 + sum(cut) OVER (PARTITION BY doc_id ORDER BY f)
        |      AS shot_id
        |  FROM cuts WHERE cut = 1)
        |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
        |  CAST(shot_id AS INT) AS shot_id
        |FROM kf ORDER BY doc_id, frame_idx""".stripMargin,
    // m16: frame energies recomputed from the synthesis formula; the
    // islands rebuild as the classic fi − row_number() grouping; docs
    // with zero low frames keep 0/0 via the left join
    "m16_audio_segments" ->
      s"""WITH p AS (
        |  SELECT doc_id,
        |    CAST((n_chars % 96 + 32) * (1 + doc_id % 2) AS INT)
        |      AS n_samples
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, i,
        |    abs((doc_id * 31 + i * 7919) % 65536 - 32768) AS av
        |  FROM (SELECT doc_id, unnest(range(0, n_samples)) AS i
        |        FROM p)),
        |f AS (
        |  SELECT doc_id, i // $VadFrameLen AS fi,
        |    CAST(sum(av) AS BIGINT) AS e, count(*) AS flen
        |  FROM s GROUP BY 1, 2),
        |fl AS (
        |  SELECT doc_id, fi,
        |    CASE WHEN e < flen * $VadMeanAbs THEN 1 ELSE 0 END AS low
        |  FROM f),
        |stats AS (
        |  SELECT doc_id, CAST(count(*) AS INT) AS n_frames,
        |    CAST(sum(low) AS INT) AS n_low
        |  FROM fl GROUP BY 1),
        |runs AS (
        |  SELECT doc_id,
        |    fi - row_number() OVER (PARTITION BY doc_id ORDER BY fi)
        |      AS grp
        |  FROM fl WHERE low = 1),
        |seg AS (
        |  SELECT doc_id, CAST(count(*) AS INT) AS run_len
        |  FROM runs GROUP BY doc_id, grp),
        |segstats AS (
        |  SELECT doc_id, CAST(count(*) AS INT) AS n_segments,
        |    CAST(max(run_len) AS INT) AS longest_run
        |  FROM seg GROUP BY 1)
        |SELECT st.doc_id, st.n_frames, st.n_low,
        |  COALESCE(sg.n_segments, 0) AS n_segments,
        |  COALESCE(sg.longest_run, 0) AS longest_run
        |FROM stats st LEFT JOIN segstats sg ON sg.doc_id = st.doc_id
        |ORDER BY st.doc_id""".stripMargin,
    // m15: the oracle recomputes every transition's per-pixel |Δ| from
    // the frame synthesis formula and applies the same integer cut
    // comparison; nf ≥ 2 for every doc, so each has ≥ 1 transition
    "m15_scene_cuts" ->
      s"""WITH p AS (
        |  SELECT doc_id,
        |    CAST(3 + n_chars % 13 AS INT) AS w,
        |    CAST(2 + doc_id % 5 AS INT) AS h,
        |    CAST(2 + n_chars % 7 AS INT) AS nf
        |  FROM documents),
        |tr AS (SELECT doc_id, w, h, unnest(range(1, nf)) AS f FROM p),
        |px AS (
        |  SELECT doc_id, f, w * h AS npx,
        |    abs((doc_id * 13 + f * 23 + i * 19) % 256
        |      - (doc_id * 13 + (f - 1) * 23 + i * 19) % 256)
        |    + abs((doc_id * 11 + f * 29 + i * 17) % 256
        |      - (doc_id * 11 + (f - 1) * 29 + i * 17) % 256)
        |    + abs((doc_id * 7 + f * 31 + i * 13) % 256
        |      - (doc_id * 7 + (f - 1) * 31 + i * 13) % 256) AS ad
        |  FROM (SELECT doc_id, f, w, h, unnest(range(0, w * h)) AS i
        |        FROM tr)),
        |fd AS (
        |  SELECT doc_id, f, max(npx) AS npx, sum(ad) AS diff
        |  FROM px GROUP BY 1, 2),
        |agg AS (
        |  SELECT doc_id,
        |    CAST(count(CASE WHEN diff > $SceneCutThresh * 3 * npx
        |      THEN 1 END) AS INT) AS n_cuts,
        |    CAST(max(diff) AS BIGINT) AS max_diff,
        |    CAST(sum(diff) AS BIGINT) AS sum_diff
        |  FROM fd GROUP BY 1)
        |SELECT p.doc_id, nf AS n_frames, a.n_cuts, a.max_diff,
        |  a.sum_diff
        |FROM p JOIN agg a ON a.doc_id = p.doc_id
        |ORDER BY p.doc_id""".stripMargin,
    // m13: the oracle recomputes the whole perceptual pipeline from
    // the synthesis formula — nearest-resize source index sp =
    // (⌊oy·h/8⌋)·w + ⌊ox·w/8⌋ per 8×8 cell, integer luminance,
    // truncating mean, bit per cell, 32-bit halves, the same 8-bit
    // bands, the same band-keyed candidate join, the same hamming
    // verify. Banding is lossless under the τ=7<8 pigeonhole bound,
    // so both engines' outputs are the exact qualifying pair set.
    "m13_image_neardup" ->
      s"""WITH p AS (
        |  SELECT doc_id,
        |    CAST(4 + n_chars % 29 AS INT) AS w,
        |    CAST(3 + doc_id % 13 AS INT) AS h
        |  FROM documents),
        |lm AS (
        |  SELECT doc_id, i,
        |    299 * ((doc_id * 13 + sp * 19) % 256)
        |    + 587 * ((doc_id * 11 + sp * 17) % 256)
        |    + 114 * ((doc_id * 7 + sp * 13) % 256) AS lum
        |  FROM (
        |    SELECT doc_id, i,
        |      ((i // 8) * h // 8) * w + ((i % 8) * w // 8) AS sp
        |    FROM (SELECT doc_id, w, h, unnest(range(0, 64)) AS i
        |          FROM p))),
        |mn AS (SELECT doc_id, sum(lum) // 64 AS mean FROM lm GROUP BY 1),
        |bt AS (
        |  SELECT l.doc_id, l.i,
        |    CASE WHEN l.lum >= m.mean THEN 1 ELSE 0 END AS b
        |  FROM lm l JOIN mn m ON l.doc_id = m.doc_id),
        |hs AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN i >= 32
        |      THEN b * (CAST(1 AS BIGINT) << (i - 32)) ELSE 0 END)
        |      AS BIGINT) AS hi,
        |    CAST(sum(CASE WHEN i < 32
        |      THEN b * (CAST(1 AS BIGINT) << i) ELSE 0 END)
        |      AS BIGINT) AS lo
        |  FROM bt GROUP BY 1),
        |bd AS (
        |  SELECT doc_id, band,
        |    CASE WHEN band < 4 THEN (lo >> (band * 8)) % 256
        |         ELSE (hi >> ((band - 4) * 8)) % 256 END AS byte
        |  FROM (SELECT doc_id, hi, lo, unnest(range(0, $PhashBands))
        |          AS band FROM hs)),
        |cnd AS (
        |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
        |  FROM bd a JOIN bd b ON a.band = b.band AND a.byte = b.byte
        |    AND a.doc_id < b.doc_id)
        |SELECT c.d1, c.d2,
        |  CAST(bit_count(xor(h1.hi, h2.hi))
        |    + bit_count(xor(h1.lo, h2.lo)) AS INT) AS hamming
        |FROM cnd c
        |JOIN hs h1 ON h1.doc_id = c.d1
        |JOIN hs h2 ON h2.doc_id = c.d2
        |WHERE bit_count(xor(h1.hi, h2.hi))
        |  + bit_count(xor(h1.lo, h2.lo)) <= $PhashMaxHamming
        |ORDER BY d1, d2""".stripMargin,
    // m01: header facts per modality. img_bytes is the padded pixel
    // array (stride = ceil(3w/4)·4 bytes per row).
    "m01_media_meta" ->
      """SELECT doc_id,
        |  CAST(4 + n_chars % 29 AS INT) AS img_width,
        |  CAST(3 + doc_id % 13 AS INT) AS img_height,
        |  CAST(((3 * (4 + n_chars % 29) + 3) // 4) * 4
        |    * (3 + doc_id % 13) AS INT) AS img_bytes,
        |  CAST(8000 + (doc_id % 3) * 8000 AS INT) AS sample_rate,
        |  CAST(1 + doc_id % 2 AS INT) AS channels,
        |  CAST((n_chars % 96 + 32) * (1 + doc_id % 2) AS INT)
        |    AS n_samples,
        |  CAST(3 + n_chars % 13 AS INT) AS vid_width,
        |  CAST(2 + doc_id % 5 AS INT) AS vid_height,
        |  CAST(2 + n_chars % 7 AS INT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    // m02: the red channel of pixel i is (d·13 + i·19) mod 256; its
    // high nibble is the bin. The lang × 16-bin grid keeps zero-count
    // bins present (the Spark side explodes a dense vector).
    "m02_media_features" ->
      """WITH p AS (
        |  SELECT doc_id, lang,
        |    CAST(4 + n_chars % 29 AS INT) AS w,
        |    CAST(3 + doc_id % 13 AS INT) AS h
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, lang,
        |    ((doc_id * 13 + i * 19) % 256) // 16 AS bin
        |  FROM (SELECT doc_id, lang, unnest(range(0, w * h)) AS i
        |        FROM p)),
        |tot AS (SELECT lang, count(*) AS n_px FROM px GROUP BY 1),
        |cnt AS (SELECT lang, bin, count(*) AS c FROM px GROUP BY 1, 2),
        |grid AS (
        |  SELECT lang, unnest(range(0, 16)) AS bin
        |  FROM (SELECT DISTINCT lang FROM documents))
        |SELECT g.lang, CAST(g.bin AS INT) AS bin,
        |  round(CAST(coalesce(c.c, 0) AS DOUBLE) / t.n_px, 5)
        |    AS r_bin_frac
        |FROM grid g
        |JOIN tot t ON g.lang = t.lang
        |LEFT JOIN cnt c ON g.lang = c.lang AND g.bin = c.bin
        |ORDER BY g.lang, g.bin""".stripMargin,
    // m03: doc × frame × pixel grid from the per-frame synthesis
    // formula; one output row per (doc, frame).
    "m03_frame_sample" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CAST(3 + n_chars % 13 AS INT) AS w,
        |    CAST(2 + doc_id % 5 AS INT) AS h,
        |    CAST(2 + n_chars % 7 AS INT) AS nf
        |  FROM documents),
        |fr AS (SELECT doc_id, w, h, unnest(range(0, nf)) AS f FROM p),
        |px AS (
        |  SELECT doc_id, f,
        |    (doc_id * 13 + f * 23 + i * 19) % 256 AS r,
        |    (doc_id * 11 + f * 29 + i * 17) % 256 AS g,
        |    (doc_id * 7 + f * 31 + i * 13) % 256 AS b
        |  FROM (SELECT doc_id, f, unnest(range(0, w * h)) AS i
        |        FROM fr))
        |SELECT doc_id, CAST(f AS INT) AS frame_idx,
        |  CAST(sum(r) AS BIGINT) AS sum_r,
        |  CAST(sum(g) AS BIGINT) AS sum_g,
        |  CAST(sum(b) AS BIGINT) AS sum_b,
        |  CAST(max(299 * r + 587 * g + 114 * b) AS INT) AS peak_lum
        |FROM px GROUP BY 1, 2 ORDER BY doc_id, frame_idx""".stripMargin,
    "m04_audio_stats" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CAST(8000 + (doc_id % 3) * 8000 AS INT) AS sample_rate,
        |    CAST(1 + doc_id % 2 AS INT) AS channels,
        |    CAST((n_chars % 96 + 32) * (1 + doc_id % 2) AS INT)
        |      AS n_samples
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, (doc_id * 31 + i * 7919) % 65536 - 32768 AS v
        |  FROM (SELECT doc_id, unnest(range(0, n_samples)) AS i FROM p)),
        |a AS (
        |  SELECT doc_id, CAST(max(abs(v)) AS INT) AS peak_abs,
        |    CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
        |    CAST(sum(v * v) AS BIGINT) AS sum_sq
        |  FROM s GROUP BY doc_id)
        |SELECT p.doc_id, sample_rate, channels, n_samples,
        |  peak_abs, sum_abs, sum_sq
        |FROM p JOIN a ON p.doc_id = a.doc_id ORDER BY p.doc_id""".stripMargin,
    // m12: every output sample is (v · target) // peak — both engines
    // truncate toward zero — and silence (peak = 0) passes through
    "m12_normalize_peak" ->
      s"""WITH p AS (
        |  SELECT doc_id,
        |    CAST(8000 + (doc_id % 3) * 8000 AS INT) AS sample_rate,
        |    CAST(1 + doc_id % 2 AS INT) AS channels,
        |    CAST((n_chars % 96 + 32) * (1 + doc_id % 2) AS INT)
        |      AS n_samples
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, (doc_id * 31 + i * 7919) % 65536 - 32768 AS v
        |  FROM (SELECT doc_id, unnest(range(0, n_samples)) AS i FROM p)),
        |pk AS (SELECT doc_id, max(abs(v)) AS peak FROM s GROUP BY doc_id),
        |n AS (
        |  SELECT s.doc_id,
        |    CASE WHEN peak = 0 THEN v
        |         ELSE (v * $NormTargetPeak) // peak END AS v
        |  FROM s JOIN pk ON s.doc_id = pk.doc_id),
        |a AS (
        |  SELECT doc_id, CAST(max(abs(v)) AS INT) AS peak_abs,
        |    CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
        |    CAST(sum(v * v) AS BIGINT) AS sum_sq
        |  FROM n GROUP BY doc_id)
        |SELECT p.doc_id, sample_rate, channels, n_samples,
        |  peak_abs, sum_abs, sum_sq
        |FROM p JOIN a ON p.doc_id = a.doc_id ORDER BY p.doc_id""".stripMargin,
    // m09: center-crop source index from the synthesis formula —
    // sp = (⌊(h−ch)/2⌋ + y)·w + ⌊(w−cw)/2⌋ + x for output pixel i,
    // with y = i // cw, x = i % cw
    "m09_crop" ->
      s"""WITH p AS (
        |  SELECT doc_id,
        |    CAST(4 + n_chars % 29 AS INT) AS w,
        |    CAST(3 + doc_id % 13 AS INT) AS h
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    ((h - $CropH) // 2 + i // $CropW) * w
        |      + ((w - $CropW) // 2 + i % $CropW) AS sp
        |  FROM (SELECT doc_id, w, h,
        |          unnest(range(0, ${CropW * CropH})) AS i FROM p)),
        |px AS (
        |  SELECT doc_id,
        |    (doc_id * 13 + sp * 19) % 256 AS r,
        |    (doc_id * 11 + sp * 17) % 256 AS g,
        |    (doc_id * 7 + sp * 13) % 256 AS b
        |  FROM m)
        |SELECT doc_id, CAST($CropW AS INT) AS width,
        |  CAST($CropH AS INT) AS height,
        |  CAST(sum(r) AS BIGINT) AS sum_r,
        |  CAST(sum(g) AS BIGINT) AS sum_g,
        |  CAST(sum(b) AS BIGINT) AS sum_b,
        |  CAST(max(299 * r + 587 * g + 114 * b) AS INT) AS peak_lum
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // m14: the oracle recomputes every pixel's truncated BT.601 luma
    // from the synthesis formula; equal channel sums and the exact
    // 1000·luma peak pin the re-encoded grayscale bytes
    "m14_grayscale" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CAST(4 + n_chars % 29 AS INT) AS width,
        |    CAST(3 + doc_id % 13 AS INT) AS height
        |  FROM documents),
        |gl AS (
        |  SELECT doc_id,
        |    (299 * ((doc_id * 13 + i * 19) % 256)
        |     + 587 * ((doc_id * 11 + i * 17) % 256)
        |     + 114 * ((doc_id * 7 + i * 13) % 256)) // 1000 AS l
        |  FROM (SELECT doc_id, unnest(range(0, width * height)) AS i
        |        FROM p)),
        |a AS (
        |  SELECT doc_id, CAST(sum(l) AS BIGINT) AS sum_r,
        |    CAST(sum(l) AS BIGINT) AS sum_g,
        |    CAST(sum(l) AS BIGINT) AS sum_b,
        |    CAST(max(1000 * l) AS INT) AS peak_lum
        |  FROM gl GROUP BY doc_id)
        |SELECT p.doc_id, width, height, sum_r, sum_g, sum_b, peak_lum
        |FROM p JOIN a ON p.doc_id = a.doc_id ORDER BY p.doc_id""".stripMargin,
    "m05_image_stats" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CAST(4 + n_chars % 29 AS INT) AS width,
        |    CAST(3 + doc_id % 13 AS INT) AS height
        |  FROM documents),
        |px AS (
        |  SELECT doc_id,
        |    (doc_id * 13 + i * 19) % 256 AS r,
        |    (doc_id * 11 + i * 17) % 256 AS g,
        |    (doc_id * 7 + i * 13) % 256 AS b
        |  FROM (SELECT doc_id, unnest(range(0, width * height)) AS i
        |        FROM p)),
        |a AS (
        |  SELECT doc_id, CAST(sum(r) AS BIGINT) AS sum_r,
        |    CAST(sum(g) AS BIGINT) AS sum_g,
        |    CAST(sum(b) AS BIGINT) AS sum_b,
        |    CAST(max(299 * r + 587 * g + 114 * b) AS INT) AS peak_lum
        |  FROM px GROUP BY doc_id)
        |SELECT p.doc_id, width, height, sum_r, sum_g, sum_b, peak_lum
        |FROM p JOIN a ON p.doc_id = a.doc_id ORDER BY p.doc_id""".stripMargin,
    "m06_video_frame_stats" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CAST(3 + n_chars % 13 AS INT) AS width,
        |    CAST(2 + doc_id % 5 AS INT) AS height,
        |    CAST(2 + n_chars % 7 AS INT) AS n_frames
        |  FROM documents),
        |fr AS (
        |  SELECT doc_id, width, height,
        |    unnest(range(0, n_frames)) AS f
        |  FROM p),
        |px AS (
        |  SELECT doc_id,
        |    (doc_id * 13 + f * 23 + i * 19) % 256 AS r,
        |    (doc_id * 11 + f * 29 + i * 17) % 256 AS g,
        |    (doc_id * 7 + f * 31 + i * 13) % 256 AS b
        |  FROM (SELECT doc_id, f,
        |          unnest(range(0, width * height)) AS i
        |        FROM fr WHERE f % 2 = 0)),
        |a AS (
        |  SELECT doc_id, CAST(sum(r) AS BIGINT) AS sum_r,
        |    CAST(sum(g) AS BIGINT) AS sum_g,
        |    CAST(sum(b) AS BIGINT) AS sum_b,
        |    CAST(max(299 * r + 587 * g + 114 * b) AS INT) AS peak_lum
        |  FROM px GROUP BY doc_id)
        |SELECT p.doc_id, width, height, n_frames,
        |  CAST((n_frames + 1) // 2 AS INT) AS n_sampled,
        |  sum_r, sum_g, sum_b, peak_lum
        |FROM p JOIN a ON p.doc_id = a.doc_id ORDER BY p.doc_id""".stripMargin,
    // m08: output frame f of the `ResampleRate` downsample reads input
    // frame (f·inRate)//outRate; interleaved sample index = frame·ch+c,
    // whose value comes from the m04 synthesis formula. The corpus'
    // 8/16/24 kHz rates exercise 1:1, 2:1, 3:1 integer ratios.
    "m08_audio_resample" -> {
      val or = ResampleRate
      s"""WITH p AS (
        |  SELECT doc_id,
        |    CAST(8000 + (doc_id % 3) * 8000 AS INT) AS r,
        |    CAST(1 + doc_id % 2 AS INT) AS ch,
        |    CAST(n_chars % 96 + 32 AS INT) AS in_frames
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, r, ch,
        |    CAST(in_frames * $or // r AS INT) AS out_frames
        |  FROM p),
        |fr AS (
        |  SELECT doc_id, r, ch, unnest(range(0, out_frames)) AS f
        |  FROM g),
        |sm AS (
        |  SELECT doc_id, r, ch, f, unnest(range(0, ch)) AS c FROM fr),
        |s AS (
        |  SELECT doc_id,
        |    (doc_id * 31 + ((f * r // $or) * ch + c) * 7919) % 65536
        |      - 32768 AS v
        |  FROM sm),
        |a AS (
        |  SELECT doc_id, CAST(count(*) AS INT) AS n_samples,
        |    CAST(max(abs(v)) AS INT) AS peak_abs,
        |    CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
        |    CAST(sum(v * v) AS BIGINT) AS sum_sq
        |  FROM s GROUP BY doc_id)
        |SELECT g.doc_id, CAST($or AS INT) AS sample_rate,
        |  g.ch AS channels, a.n_samples, peak_abs, sum_abs, sum_sq
        |FROM g JOIN a ON g.doc_id = a.doc_id
        |ORDER BY g.doc_id""".stripMargin
    },
    // m11: the kept frames are the original even-f frames with their
    // original pixels (the m06 synthesis formula); n_frames reads
    // ⌈nf/2⌉ back out of the re-encoded avih header
    "m11_video_trim" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CAST(3 + n_chars % 13 AS INT) AS width,
        |    CAST(2 + doc_id % 5 AS INT) AS height,
        |    CAST(2 + n_chars % 7 AS INT) AS nf
        |  FROM documents),
        |fr AS (
        |  SELECT doc_id, width, height,
        |    unnest(range(0, nf)) AS f
        |  FROM p),
        |px AS (
        |  SELECT doc_id,
        |    (doc_id * 13 + f * 23 + i * 19) % 256 AS r,
        |    (doc_id * 11 + f * 29 + i * 17) % 256 AS g,
        |    (doc_id * 7 + f * 31 + i * 13) % 256 AS b
        |  FROM (SELECT doc_id, f,
        |          unnest(range(0, width * height)) AS i
        |        FROM fr WHERE f % 2 = 0)),
        |a AS (
        |  SELECT doc_id, CAST(sum(r) AS BIGINT) AS sum_r,
        |    CAST(sum(g) AS BIGINT) AS sum_g,
        |    CAST(sum(b) AS BIGINT) AS sum_b,
        |    CAST(max(299 * r + 587 * g + 114 * b) AS INT) AS peak_lum
        |  FROM px GROUP BY doc_id)
        |SELECT p.doc_id, width, height,
        |  CAST((nf + 1) // 2 AS INT) AS n_frames,
        |  sum_r, sum_g, sum_b, peak_lum
        |FROM p JOIN a ON p.doc_id = a.doc_id
        |ORDER BY p.doc_id""".stripMargin,
    // m10: mono sample f = (Σ_c v[f·ch+c]) // ch — integer average
    // across channels, both engines truncating toward zero; v comes
    // from the m04 synthesis formula. Rate and frame count survive the
    // mixdown; channels reads back 1 from the re-encoded header.
    "m10_mixdown_mono" ->
      s"""WITH p AS (
        |  SELECT doc_id,
        |    CAST(8000 + (doc_id % 3) * 8000 AS INT) AS r,
        |    CAST(1 + doc_id % 2 AS INT) AS ch,
        |    CAST(n_chars % 96 + 32 AS INT) AS frames
        |  FROM documents),
        |fr AS (
        |  SELECT doc_id, r, ch, unnest(range(0, frames)) AS f FROM p),
        |sm AS (
        |  SELECT doc_id, r, ch, f, unnest(range(0, ch)) AS c FROM fr),
        |v AS (
        |  SELECT doc_id, r, ch, f,
        |    (doc_id * 31 + (f * ch + c) * 7919) % 65536 - 32768 AS v
        |  FROM sm),
        |mono AS (
        |  SELECT doc_id, r, f,
        |    CAST(CAST(sum(v) AS BIGINT) // ch AS BIGINT) AS v
        |  FROM v GROUP BY doc_id, r, ch, f),
        |a AS (
        |  SELECT doc_id, CAST(count(*) AS INT) AS n_samples,
        |    CAST(max(abs(v)) AS INT) AS peak_abs,
        |    CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
        |    CAST(sum(v * v) AS BIGINT) AS sum_sq
        |  FROM mono GROUP BY doc_id)
        |SELECT p.doc_id, p.r AS sample_rate, CAST(1 AS INT) AS channels,
        |  a.n_samples, peak_abs, sum_abs, sum_sq
        |FROM p JOIN a ON p.doc_id = a.doc_id ORDER BY p.doc_id""".stripMargin,
    // m07: output pixel i of the 8×6 resample maps to source pixel
    // sp = (⌊i/8⌋·h ÷ 6)·w + (i mod 8)·w ÷ 8 (integer division — the
    // exact nearest-neighbor rule resizeNearest implements), whose
    // channels come from the m05 synthesis formula.
    "m07_resize" ->
      s"""WITH p AS (
        |  SELECT doc_id,
        |    CAST(4 + n_chars % 29 AS INT) AS w,
        |    CAST(3 + doc_id % 13 AS INT) AS h
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    ((i // $ResizeW) * h // $ResizeH) * w
        |      + ((i % $ResizeW) * w // $ResizeW) AS sp
        |  FROM (SELECT doc_id, w, h,
        |          unnest(range(0, ${ResizeW * ResizeH})) AS i FROM p)),
        |px AS (
        |  SELECT doc_id,
        |    (doc_id * 13 + sp * 19) % 256 AS r,
        |    (doc_id * 11 + sp * 17) % 256 AS g,
        |    (doc_id * 7 + sp * 13) % 256 AS b
        |  FROM m)
        |SELECT doc_id, CAST($ResizeW AS INT) AS width,
        |  CAST($ResizeH AS INT) AS height,
        |  CAST(sum(r) AS BIGINT) AS sum_r,
        |  CAST(sum(g) AS BIGINT) AS sum_g,
        |  CAST(sum(b) AS BIGINT) AS sum_b,
        |  CAST(max(299 * r + 587 * g + 114 * b) AS INT) AS peak_lum
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,
  )
}
