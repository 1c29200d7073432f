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
  * No codec libraries ship in this environment, so the PIXEL work is
  * STUBBED with a deterministic fake format ("GR" container: 8-byte
  * header + payload); the AUDIO path (m04, [[Wav]]) is a real published
  * container format — RIFF/WAVE PCM16 — decoded with a generic chunk
  * walk and no libraries. Everything Spark-side is real and tested —
  * schema, binary columns, header parsing, mapPartitions batch shape,
  * generator explode for frames — and swapping `decodePayload` /
  * `FeatureExtractor.features` for a real codec (JavaCV, TwelveMonkeys,
  * pdfbox...) changes no plan shape.
  *
  * Scale design: every operator is map-side over the binary column;
  * frame explode multiplies rows before the shuffle (partial agg
  * applies); feature extraction is mapPartitions with per-partition
  * buffer reuse — the Scala analogue of Python's mapInPandas batch UDF.
  */
object Multimodal {

  // --- fake "GR" media container ---
  // header: magic 'G','R' | width:2 LE | height:2 LE | channels:1 | codec:1

  val HeaderLen = 8

  def encodeBlob(payload: Array[Byte], width: Int, height: Int,
      channels: Int, codec: Int): Array[Byte] = {
    val out = new Array[Byte](HeaderLen + payload.length)
    out(0) = 'G'; out(1) = 'R'
    out(2) = (width & 0xff).toByte; out(3) = ((width >> 8) & 0xff).toByte
    out(4) = (height & 0xff).toByte; out(5) = ((height >> 8) & 0xff).toByte
    out(6) = (channels & 0xff).toByte
    out(7) = (codec & 0xff).toByte
    System.arraycopy(payload, 0, out, HeaderLen, payload.length)
    out
  }

  case class Meta(width: Int, height: Int, channels: Int, codec: Int,
      payload_bytes: Int)

  /** STUB decode: parses the fake header. A real implementation would
    * hand `blob` to an image codec here; the schema contract is what
    * downstream operators program against.
    */
  def decodeMeta(blob: Array[Byte]): Meta = {
    require(blob.length >= HeaderLen && blob(0) == 'G' && blob(1) == 'R',
      "not a GR container")
    Meta(
      (blob(2) & 0xff) | ((blob(3) & 0xff) << 8),
      (blob(4) & 0xff) | ((blob(5) & 0xff) << 8),
      blob(6) & 0xff, blob(7) & 0xff,
      blob.length - HeaderLen)
  }

  /** Deterministic media table derived from `documents`: the text bytes
    * play the role of pixel data. Dimensions derive from n_chars so the
    * DuckDB oracle can recompute them from the source table.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame = {
    val mk = udf { (text: String, nChars: Int) =>
      encodeBlob(text.getBytes("UTF-8"),
        (nChars % 64) + 1, (nChars % 48) + 1, 3, 1)
    }
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        mk(col("text"), col("n_chars").cast("int")).as("blob"))
  }

  /** Decode operator: blob → typed metadata struct columns. */
  def withMeta(media: DataFrame): DataFrame = {
    val dec = udf { (blob: Array[Byte]) => decodeMeta(blob) }
    media.withColumn("meta", dec(col("blob")))
      .select(col("*"), col("meta.*")).drop("meta")
  }

  /** STUB resize: rewrites header dimensions (where a real scaler would
    * transform pixels). Plan shape: pure map-side binary→binary.
    */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    val rs = udf { (blob: Array[Byte]) =>
      val m = decodeMeta(blob)
      encodeBlob(blob.drop(HeaderLen), w, h, m.channels, m.codec)
    }
    media.withColumn("blob", rs(col("blob")))
  }

  /** Feature extraction via mapPartitions (the mapInPandas analogue):
    * 16-bin byte histogram per blob, L1-normalized — buffer reused
    * across the partition, output schema fixed.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(media.schema.fields :+
      StructField("features", ArrayType(FloatType), nullable = false))
    val enc = RowEncoder.encoderFor(outSchema)
    media.mapPartitions { rows =>
      val hist = new Array[Long](16) // reused per partition
      rows.map { r =>
        java.util.Arrays.fill(hist, 0L)
        val blob = r.getAs[Array[Byte]]("blob")
        var i = HeaderLen
        while (i < blob.length) { hist((blob(i) & 0xff) >> 4) += 1; i += 1 }
        val n = math.max(1L, blob.length - HeaderLen).toDouble
        val feats = hist.map(c => (c / n).toFloat)
        Row.fromSeq(r.toSeq :+ feats.toSeq)
      }
    }(enc)
  }

  /** Frame sampling: treat the payload as fixed-size frames (video
    * analogue) and explode one row per frame — generator before shuffle.
    */
  def frameSample(media: DataFrame, frameBytes: Int): DataFrame = {
    val frames = udf { (blob: Array[Byte]) =>
      blob.drop(HeaderLen).grouped(frameBytes).toSeq
    }
    media
      .select(col("doc_id"),
        posexplode(frames(col("blob"))).as(Seq("frame_idx", "frame")))
  }

  // --- real-format audio column (RIFF/WAVE PCM16, see Wav.scala) ---

  /** Deterministic PCM16 synthesis so the DuckDB oracle can recompute
    * every sample with exact integer arithmetic: sample i of doc d is
    * `(d*31 + i*7919) mod 65536 - 32768`. Rate/channels/frame-count
    * derive from doc_id / n_chars the same way the GR dims do.
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
    * column (unlike the GR stub, this is a published container format —
    * any audio tool can read these blobs). Encode is map-side.
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
    * exercised. Encode is map-side.
    */
  def imageTable(spark: SparkSession, dir: String): DataFrame = {
    val mk = udf { (docId: Long, nChars: Long) =>
      val w = 4 + (nChars % 29).toInt
      val h = 3 + (docId % 13).toInt
      Bmp.encode24(w, h, synthPixels(docId, w * h))
    }
    Tables.documents(spark, dir)
      .select(col("doc_id"), mk(col("doc_id"), col("n_chars")).as("blob"))
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

  /** m06 — AVI decode + every-2nd-frame sample stats, the video member
    * of the real-format triple (m04 audio, m05 image): synth →
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

  // --- driver-contract queries ---

  private type Q = (SparkSession, String) => DataFrame

  /** m01 — decode metadata (oracle recomputes dims from n_chars). */
  val m01MediaMeta: Q = (s, d) =>
    withMeta(mediaTable(s, d))
      .select("doc_id", "width", "height", "channels", "payload_bytes")
      .orderBy("doc_id")

  /** m02 — per-language mean feature vector (first 4 histogram bins):
    * mapPartitions features → posexplode → agg, all distributed.
    */
  val m02MediaFeatures: Q = (s, d) =>
    extractFeatures(mediaTable(s, d))
      .select(col("lang"), posexplode(col("features"))
        .as(Seq("bin", "weight")))
      .filter(col("bin") < 4)
      .groupBy("lang", "bin")
      .agg(round(avg("weight"), 5).as("mean_weight"))
      .orderBy("lang", "bin")

  /** Per-doc frame cardinality rollup. Frame counts are LEFT-joined
    * back onto the media doc set: a zero-payload blob explodes to no
    * frame rows and would otherwise vanish from the groupBy, while
    * ceil-division semantics (and the m03 oracle) give it n_frames=0
    * (ADVICE r02 — latent until the corpus has an empty text).
    */
  def frameCounts(media: DataFrame, frameBytes: Int): DataFrame =
    media.select("doc_id")
      .join(
        frameSample(media, frameBytes)
          .groupBy("doc_id")
          .agg(count(lit(1)).as("nf"),
            sum(length(col("frame"))).as("pb")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("nf"), lit(0L)).as("n_frames"),
        coalesce(col("pb"), lit(0L)).as("payload_bytes"))

  /** m03 — frame sampling cardinality (oracle: ceil division on
    * n_chars). Explode + reaggregate proves the generator path.
    */
  val m03FrameSample: Q = (s, d) =>
    frameCounts(mediaTable(s, d), 256).orderBy("doc_id")

  val queries: Map[String, Q] = Map(
    "m01_media_meta" -> m01MediaMeta,
    "m02_media_features" -> m02MediaFeatures,
    "m03_frame_sample" -> m03FrameSample,
    "m04_audio_stats" -> m04AudioStats,
    "m05_image_stats" -> m05ImageStats,
    "m06_video_frame_stats" -> m06VideoFrameStats,
  )

  // Oracle payload sizes count BYTES via octet_length(encode(text)) —
  // the Spark side measures the UTF-8 payload, and length(text) counts
  // CHARACTERS, which only agrees on all-ASCII corpora (ADVICE r01).
  val oracles: Map[String, String] = Map(
    "m01_media_meta" ->
      """SELECT doc_id,
        |  CAST(n_chars % 64 + 1 AS INT) AS width,
        |  CAST(n_chars % 48 + 1 AS INT) AS height,
        |  3 AS channels,
        |  CAST(octet_length(encode(text)) AS INT) AS payload_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,
    // m02 twin recomputes the byte histogram from the hex encoding of
    // the UTF-8 payload: byte i's HIGH NIBBLE is hex char 2i-1, so the
    // 16-bin histogram is a frequency count over odd hex positions —
    // exact at byte level, non-ASCII safe. Zero-count bins must still
    // contribute weight 0 to the mean (the Spark side explodes a dense
    // 16-bin vector), hence the doc × bin grid + left join.
    "m02_media_features" ->
      """WITH hx AS (
        |  SELECT doc_id, lang, lower(hex(encode(text))) AS hs,
        |    octet_length(encode(text)) AS n
        |  FROM documents),
        |cnt AS (
        |  SELECT doc_id,
        |    strpos('0123456789abcdef',
        |      substr(hs, 2 * CAST(i AS INT) - 1, 1)) - 1 AS bin,
        |    count(*) AS c
        |  FROM (SELECT doc_id, hs, unnest(range(1, n + 1)) AS i FROM hx)
        |  GROUP BY 1, 2),
        |grid AS (
        |  SELECT doc_id, lang, n, unnest(range(0, 4)) AS bin FROM hx),
        |feat AS (
        |  SELECT g.lang, CAST(g.bin AS INT) AS bin,
        |    CAST(coalesce(c.c, 0) / CAST(greatest(g.n, 1) AS DOUBLE)
        |      AS FLOAT) AS w
        |  FROM grid g
        |  LEFT JOIN cnt c ON g.doc_id = c.doc_id AND g.bin = c.bin)
        |SELECT lang, bin, round(avg(w), 5) AS mean_weight
        |FROM feat GROUP BY 1, 2 ORDER BY lang, bin""".stripMargin,
    "m03_frame_sample" ->
      """SELECT doc_id,
        |  CAST((octet_length(encode(text)) + 255) // 256 AS BIGINT)
        |    AS n_frames,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,
    // m04 twin regenerates every PCM16 sample from the synthesis formula
    // (all-integer, so sum(v*v) is exact; DuckDB sums to HUGEINT, hence
    // the BIGINT casts). The Spark side never sees this formula at query
    // time — it reads rate/channels/counts back out of the WAV bytes.
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
    // m05 twin regenerates every RGB channel from the synthesis formula
    // (all-integer; DuckDB sums widen to HUGEINT, hence the casts). The
    // Spark side reads width/height back out of the BMP header instead.
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
    // m06 twin regenerates every sampled frame's channels from the
    // synthesis formula (doc × even-frame × pixel grid, all-integer).
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
  )
}
