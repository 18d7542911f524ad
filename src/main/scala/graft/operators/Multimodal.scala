package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Image-decode result of [[Multimodal.decodeImage]]: dimensions, band
  * count, and exact integer-micro channel means (`sum*1e6 / (w*h)` on
  * non-negative integers — deterministic on every JVM, no float
  * accumulation).
  */
final case class DecodedImage(
    width: Long,
    height: Long,
    channels: Long,
    meanRMicro: Long,
    meanGMicro: Long,
    meanBMicro: Long)

/** Audio-decode result of [[Multimodal.decodeWav]]: container format plus
  * exact integer sample statistics (mean |sample| and peak in milli-units —
  * integer math only, deterministic on every JVM).
  */
final case class DecodedAudio(
    sampleRate: Long,
    channels: Long,
    bitsPerSample: Long,
    nSamples: Long,
    peak: Long,
    meanAbsMilli: Long)

/** Multimodal-column plumbing for the LLM-data pipeline (north-star
  * extension): media as opaque `binary` columns with typed metadata, REAL
  * image and audio decode (JDK `javax.imageio` + `javax.sound.sampled` —
  * no external codec libs), plus deterministic feature-extraction /
  * frame-sampling over them.
  *
  * The decode slots are per-row JVM codec UDFs — the one place the
  * escalation ladder ends at a UDF by design: codecs are opaque
  * byte→raster/sample library calls with nothing for Catalyst to codegen,
  * and the row is already the right batch shape (at 100 TB each blob
  * decodes where it lives, map-only; only fixed-width features cross a
  * shuffle). Video codecs aren't in the JDK; those rows flow through the
  * same binary plumbing with the image/audio paths showing where a codec
  * slots in ([[decodeImage]], [[decodeWav]]).
  */
object Multimodal {

  /** Bytes per "frame" in the chunked sampling below. */
  val FrameBytes = 256

  /** Derive a deterministic media table from `documents`: the text bytes
    * stand in for an encoded payload (binary), `kind` fans the rows across
    * the three modalities, and `meta` carries provenance as a typed struct.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      expr("CASE pmod(doc_id, 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END")
        .as("kind"),
      col("text").cast("binary").as("content"),
      struct(
        col("lang").as("orig_lang"),
        col("source").as("orig_source"),
        length(col("text")).cast("long").as("n_bytes")).as("meta"))

  /** Deterministic PNG fixture bytes per media id: a `(4 + id%29) ×
    * (4 + 7id%23)` truecolor image whose channel values are exact affine
    * functions of (id, x, y) — `r = id%200 + x`, `g = 3id%200 + y`,
    * `b = 5id%256` (all < 256 by construction, no wraparound) — encoded
    * through the real JDK PNG writer. Gives every row a genuine compressed
    * image payload whose DECODED properties are closed-form in the id, so
    * the decode stage is value-oracle-gated without the oracle engine
    * needing a codec.
    */
  val encodePngFixture: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (id: Long) =>
      javax.imageio.ImageIO.setUseCache(false)
      val w = (4 + (id % 29)).toInt
      val h = (4 + ((id * 7) % 23)).toInt
      val baseR = (id % 200).toInt
      val baseG = ((id * 3) % 200).toInt
      val baseB = ((id * 5) % 256).toInt
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y, ((baseR + x) << 16) | ((baseG + y) << 8) | baseB)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

  /** Deterministic JPEG fixture bytes per media id (round 18 — real
    * crawl corpora are overwhelmingly JPEG, and the PNG-only fixtures
    * never exercised ImageIO's JPEG road): a `(8 + id%17) × (8 + 5id%13)`
    * gradient image through the real JDK JPEG writer. JPEG is LOSSY, so
    * only decode PROPERTIES (dimensions, band count, decodability) are
    * closed-form gateable — channel means stay a PNG-only gate.
    */
  val encodeJpegFixture: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (id: Long) =>
      javax.imageio.ImageIO.setUseCache(false)
      val w = (8 + (id % 17)).toInt
      val h = (8 + ((id * 5) % 13)).toInt
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y,
            (((id + x) % 256).toInt << 16) |
              (((id * 3 + y) % 256).toInt << 8) | ((id * 5) % 256).toInt)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }

  /** Mixed-container decode (round 18, the m7 key): a corpus whose blobs
    * are PNG (id%3=0), JPEG (id%3=1) or undecodable raw bytes (id%3=2),
    * pushed through ONE [[decodeImage]] road — exactly what a crawl
    * pipeline sees. Per row: the container tag, decoded dimensions/bands
    * (closed-form for both codecs), and the null-quarantine verdict;
    * lossy JPEG rows gate dimensions and band count only.
    */
  def mixedDecode(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"),
      expr("CASE pmod(doc_id, 3) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' " +
        "ELSE 'raw' END").as("container"),
      col("doc_id"), col("text"))
      .withColumn("blob",
        when(col("container") === "png", encodePngFixture(col("doc_id")))
          .when(col("container") === "jpeg", encodeJpegFixture(col("doc_id")))
          .otherwise(col("text").cast("binary")))
      .withColumn("decoded", decodeImage(col("blob")))
      .select(
        col("media_id"),
        col("container"),
        col("decoded.width").as("width"),
        col("decoded.height").as("height"),
        col("decoded.channels").as("channels"),
        when(col("decoded").isNotNull, 1L).otherwise(0L).as("decode_ok"))

  /** REAL image decode over a binary PNG/JPEG/BMP column (JDK ImageIO):
    * dimensions, band count, and exact integer channel means. Returns null
    * for bytes no installed reader accepts (corrupt/unknown container) —
    * the pipeline-friendly contract; a quarantine filter on
    * `decoded IS NULL` separates undecodable rows.
    */
  val decodeImage: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (bytes: Array[Byte]) =>
      javax.imageio.ImageIO.setUseCache(false)
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: java.io.IOException => null }
      if (img == null) null
      else {
        val w = img.getWidth
        val h = img.getHeight
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xff
            sg += (rgb >> 8) & 0xff
            sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        DecodedImage(w.toLong, h.toLong, img.getRaster.getNumBands.toLong,
          sr * 1000000L / n, sg * 1000000L / n, sb * 1000000L / n)
      }
    }

  /** Deterministic WAV fixture bytes per media id, through the real JDK
    * WAVE writer: PCM signed 16-bit little-endian mono, sample rate
    * `8000 + (id%8)·1000`, `64 + id%192` samples of a ±A square wave with
    * amplitude `A = 1000 + id%9000` and half-period `16 + id%16` samples.
    * Every sample is ±A, so mean |sample| = peak = A exactly — the decoded
    * statistics are closed-form in the id, value-oracle-gateable like the
    * PNG fixture's.
    */
  val encodeWavFixture: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (id: Long) =>
      val sampleRate = (8000 + (id % 8) * 1000).toInt
      val n = (64 + (id % 192)).toInt
      val amp = (1000 + (id % 9000)).toInt
      val halfPeriod = (16 + (id % 16)).toInt
      val pcm = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        val s = if ((i / halfPeriod) % 2 == 0) amp else -amp
        pcm(i * 2) = (s & 0xff).toByte
        pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        sampleRate.toFloat, 16, 1, 2, sampleRate.toFloat, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

  /** Deterministic AUDIO fixture bytes per audio id for d15, through the
    * real JDK WAVE writer: 6 frames × 64 windows × 4 samples of PCM16 mono
    * at 8 kHz; every 4-sample window holds the constant amplitude
    * `a(base, fb, w) = 200 + H % 7000` where `H` is the first-8-hex-chars
    * md5 integer of `"base_fb_w"` (the x17 split convention — replayable
    * in any engine, no RNG). Ids with `id % 10 == 3` are a one-frame-
    * trimmed PERTURBED repost of id−2: frames shift by one (`fb = f + 1`)
    * and windows with `(w + fb·64) % 37 == 0` (≤2 per frame) take the
    * shifted amplitude `200 + (H + 1500) % 7000` — at most 4 flipped bits
    * per frame hash, inside the banding gate, exactly the d14 plant
    * geometry on the audio axis.
    */
  val encodeAudioFixture: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (id: Long) =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      val perturbed = id % 10 == 3
      val base = if (perturbed) id - 2 else id
      val frames = 6
      val windows = 64
      val wsamples = 4
      val pcm = new Array[Byte](frames * windows * wsamples * 2)
      var f = 0
      while (f < frames) {
        val fb = f + (if (perturbed) 1 else 0)
        var w = 0
        while (w < windows) {
          val hex = digest.digest(s"${base}_${fb}_$w".getBytes("UTF-8"))
          val h = java.lang.Integer.toUnsignedLong(
            java.nio.ByteBuffer.wrap(hex).getInt)
          val a =
            if (perturbed && (w + fb * windows) % 37 == 0)
              (200L + (h + 1500L) % 7000L).toInt
            else (200L + h % 7000L).toInt
          var s = 0
          while (s < wsamples) {
            val i = (f * windows + w) * wsamples + s
            pcm(i * 2) = (a & 0xff).toByte
            pcm(i * 2 + 1) = ((a >> 8) & 0xff).toByte
            s += 1
          }
          w += 1
        }
        f += 1
      }
      val n = frames * windows * wsamples
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        8000f, 16, 1, 2, 8000f, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

  /** Per-frame perceptual hashes of one WAV blob (d15's fingerprint, the
    * audio analog of [[dHash]]): REAL JDK decode to PCM16, the sample
    * stream split into frames of `windows`×`wsamples` samples, each
    * frame's 64 window SUMS compared circularly — bit w = 1 iff the next
    * window's sum is strictly greater. Emits one 64-char bitstring per
    * complete frame (trailing partial frames dropped); null for bytes the
    * reader rejects or non-PCM16-mono payloads — the [[decodeWav]]
    * quarantine contract.
    */
  val audioFrameHashes: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (bytes: Array[Byte], windows: Int, wsamples: Int) =>
      val ais =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => null
          case _: java.io.IOException => null
        }
      if (ais == null) null
      else {
        val fmt = ais.getFormat
        if (fmt.getChannels != 1 || fmt.getSampleSizeInBits != 16 ||
          fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          fmt.isBigEndian) null
        else {
          val raw = ais.readAllBytes()
          val n = raw.length / 2
          val fsamples = windows * wsamples
          val frames = n / fsamples
          (0 until frames).map { f =>
            val sums = new Array[Long](windows)
            var w = 0
            while (w < windows) {
              var s = 0L
              var i = 0
              while (i < wsamples) {
                val p = (f * fsamples + w * wsamples + i) * 2
                s += ((raw(p) & 0xff) | (raw(p + 1).toInt << 8))
                i += 1
              }
              sums(w) = s
              w += 1
            }
            val sb = new java.lang.StringBuilder(windows)
            var b = 0
            while (b < windows) {
              sb.append(if (sums((b + 1) % windows) > sums(b)) '1' else '0')
              b += 1
            }
            sb.toString
          }
        }
      }
    }

  /** REAL audio decode over a binary WAV column (JDK AudioSystem): container
    * format (rate/channels/bits/frames) plus exact integer sample stats.
    * Returns null for bytes no installed reader accepts — the same
    * quarantine contract as [[decodeImage]]. PCM 16-bit little-endian
    * payloads only (the JDK WAVE reader's bread and butter); anything else
    * the reader accepts but we can't do integer-exact stats on also
    * quarantines as null rather than returning approximate numbers.
    */
  val decodeWav: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (bytes: Array[Byte]) =>
      val ais =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => null
          case _: java.io.IOException => null
        }
      if (ais == null) null
      else {
        val fmt = ais.getFormat
        val ok = fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian &&
          fmt.getChannels == 1
        if (!ok) null
        else {
          val pcm = ais.readAllBytes()
          val n = pcm.length / 2
          var sumAbs = 0L
          var peak = 0L
          var i = 0
          while (i < n) {
            val s = ((pcm(i * 2) & 0xff) | (pcm(i * 2 + 1) << 8)).toShort.toLong
            val a = math.abs(s)
            sumAbs += a
            if (a > peak) peak = a
            i += 1
          }
          DecodedAudio(
            fmt.getSampleRate.toLong, fmt.getChannels.toLong, 16L, n.toLong,
            peak, if (n == 0) 0L else sumAbs * 1000L / n)
        }
      }
    }

  /** Per-media WAV features: the real JDK audio codec round-trip, gated on
    * the closed-form fixture statistics ([[encodeWavFixture]]).
    */
  def wavFeatures(media: DataFrame): DataFrame =
    media
      .withColumn("decoded", decodeWav(encodeWavFixture(col("media_id"))))
      .select(
        col("media_id"),
        col("decoded.sampleRate").as("sample_rate"),
        col("decoded.channels").as("channels"),
        col("decoded.bitsPerSample").as("bits_per_sample"),
        col("decoded.nSamples").as("n_samples"),
        col("decoded.peak").as("peak"),
        col("decoded.meanAbsMilli").as("mean_abs_milli"))

  /** Factor-2 audio decimation THROUGH the real JDK codec (M5 — the audio
    * analog of [[resizeHalf]]'s image chain): decode the WAV container,
    * keep every 2nd PCM sample, re-encode at half the sample rate, return
    * the new WAV bytes. Same quarantine contract as [[decodeWav]]
    * (non-PCM-16LE-mono → null). On the ±A square-wave fixtures every
    * surviving sample is still ±A, so peak and mean |sample| are UNCHANGED
    * while frames halve (ceil) and the rate halves exactly — closed-form
    * in the id, so the whole decode→decimate→encode→decode chain is
    * value-oracle-gateable with no codec in the oracle engine.
    */
  val decimateWav: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (bytes: Array[Byte]) =>
      val ais =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => null
          case _: java.io.IOException => null
        }
      if (ais == null) null
      else {
        val fmt = ais.getFormat
        val ok = fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian &&
          fmt.getChannels == 1
        if (!ok) null
        else {
          val pcm = ais.readAllBytes()
          val n = pcm.length / 2
          val n2 = (n + 1) / 2
          val out = new Array[Byte](n2 * 2)
          var i = 0
          while (i < n2) {
            out(i * 2) = pcm(i * 4)
            out(i * 2 + 1) = pcm(i * 4 + 1)
            i += 1
          }
          val rate2 = fmt.getSampleRate / 2f
          val fmt2 = new javax.sound.sampled.AudioFormat(
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            rate2, 16, 1, 2, rate2, false)
          val ais2 = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(out), fmt2, n2.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(
            ais2, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          bos.toByteArray
        }
      }
    }

  /** The m5 chain: fixture → decimate through the codec → re-decode →
    * container + exact integer stats of the HALF-RATE artifact.
    */
  def audioResample(media: DataFrame): DataFrame =
    media
      .withColumn("decoded",
        decodeWav(decimateWav(encodeWavFixture(col("media_id")))))
      .select(
        col("media_id"),
        col("decoded.sampleRate").as("sample_rate"),
        col("decoded.nSamples").as("n_samples"),
        col("decoded.peak").as("peak"),
        col("decoded.meanAbsMilli").as("mean_abs_milli"))

  /** Per-media features: size, content hash, sniffed header bytes, chunk
    * count, a sampled mid-"frame" hash, and REAL decoded image properties
    * (dimensions + exact channel means from the PNG fixture payload via
    * [[decodeImage]]). One map-only pass over the binary columns.
    */
  def mediaFeatures(media: DataFrame): DataFrame =
    media
      .withColumn("decoded", decodeImage(encodePngFixture(col("media_id"))))
      .select(
      col("media_id"),
      col("kind"),
      expr("CAST(octet_length(content) AS BIGINT)").as("n_bytes"),
      expr("md5(content)").as("content_md5"),
      expr(s"hex(substring(content, 1, 8))").as("header_hex"),
      expr(s"CAST(ceil(octet_length(content) / ${FrameBytes}.0) AS BIGINT)").as("n_frames"),
      expr(s"md5(substring(content, CAST(ceil(octet_length(content) / ${FrameBytes}.0) AS INT) div 2 * $FrameBytes + 1, $FrameBytes))")
        .as("mid_frame_md5"),
      col("decoded.width").as("width"),
      col("decoded.height").as("height"),
      col("decoded.channels").as("channels"),
      col("decoded.meanRMicro").as("mean_r_micro"),
      col("decoded.meanGMicro").as("mean_g_micro"),
      col("decoded.meanBMicro").as("mean_b_micro"))

  /** Factor-2 nearest-neighbor downsample through the real JDK codec:
    * decode, sample every other pixel (ceil semantics — odd edges keep
    * their last row/column), re-encode as PNG. Null for undecodable bytes,
    * like [[decodeImage]]. PNG is lossless, so the thumb's DECODED
    * properties are exact functions of the source pixels — which for the
    * affine fixture payloads are closed-form in the id (sampled xs are
    * {0,2,…,2(w₂−1)}, so the r-mean shifts by exactly w₂−1): the whole
    * decode → resample → re-encode → re-decode chain is value-oracle-gated
    * without the oracle engine touching a codec.
    */
  val resizeHalf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (bytes: Array[Byte]) =>
      javax.imageio.ImageIO.setUseCache(false)
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: java.io.IOException => null }
      if (img == null) null
      else {
        val w2 = (img.getWidth + 1) / 2
        val h2 = (img.getHeight + 1) / 2
        val out = new java.awt.image.BufferedImage(
          w2, h2, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        var y = 0
        while (y < h2) {
          var x = 0
          while (x < w2) {
            out.setRGB(x, y, img.getRGB(2 * x, 2 * y))
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        bos.toByteArray
      }
    }

  /** Thumbnail features: the resample chain run end-to-end per media row
    * (map-only — the 100 TB shape for any per-asset media transform), with
    * the thumb's decoded dimensions and exact channel means emitted for the
    * value gate. The thumb BYTES are also produced (a real pipeline would
    * sink them); byte-level output is deflate-version-dependent, so only
    * decoded properties are gated.
    */
  def thumbnails(media: DataFrame): DataFrame =
    media
      .withColumn("thumb", resizeHalf(encodePngFixture(col("media_id"))))
      .withColumn("decoded", decodeImage(col("thumb")))
      .select(
        col("media_id"),
        col("decoded.width").as("thumb_w"),
        col("decoded.height").as("thumb_h"),
        col("decoded.channels").as("channels"),
        col("decoded.meanRMicro").as("mean_r_micro"),
        col("decoded.meanGMicro").as("mean_g_micro"),
        col("decoded.meanBMicro").as("mean_b_micro"))

  /** Deterministic TEXTURE PNG fixture per media id, with PLANTED near-dup
    * copies — d12's input. Unlike [[encodePngFixture]]'s affine gradients
    * (whose difference hash would collapse to a function of width alone),
    * the grayscale here wraps mod 256 — `g(x,y) = (7·base + 17·x + 29·y)
    * mod 256` — so adjacent-pixel comparisons vary pseudo-randomly per
    * image while staying closed-form for the oracle. Ids with `id % 5 == 4`
    * encode a PERTURBED COPY of id−1's texture (`base = id−1`): pixels at
    * `(x + y·w) % 37 == 0` shift by +64 mod 256 — a ~3% pixel defect, the
    * re-encoded-with-small-edits duplicate every image-dedup pipeline
    * hunts. All through the real JDK PNG writer.
    */
  val encodeTexturePngFixture: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (id: Long) =>
      javax.imageio.ImageIO.setUseCache(false)
      val perturbed = id % 5 == 4
      val base = if (perturbed) id - 1 else id
      val w = (8 + base % 13).toInt
      val h = (8 + (base * 3) % 11).toInt
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var g = ((base * 7 + x * 17 + y * 29) % 256).toInt
          if (perturbed && (x + y * w) % 37 == 0) g = (g + 64) % 256
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

  /** Deterministic VIDEO fixture: frame `f` of video `id` is a texture PNG
    * in the [[encodeTexturePngFixture]] family, the frame index advancing
    * the texture phase by 11 gray levels — consecutive frames of one video
    * are distinct but related, like consecutive stills of a slow pan. Ids
    * with `id % 10 == 8` encode a RE-CUT PERTURBED COPY of video id−2: a
    * temporal shift of one frame (frame f carries source frame f+1's
    * texture) plus the d12 pixel defect (+64 mod 256 at `(x + y·w) % 37 ==
    * 0`) — the re-encoded, trimmed-and-edited repost every video-dedup
    * pipeline hunts. Frame dimensions are constant within a video (they
    * follow `base`), as real video frames are. All through the real JDK PNG
    * writer; the decoded grays are closed-form in (id, f), so the whole
    * decode→hash→alignment chain is value-oracle-gateable with no codec in
    * the oracle engine.
    */
  val encodeVideoFrameFixture: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (id: Long, f: Int) =>
      javax.imageio.ImageIO.setUseCache(false)
      val perturbed = id % 10 == 8
      val base = if (perturbed) id - 2 else id
      val fb = f + (if (perturbed) 1 else 0)
      val w = (8 + base % 13).toInt
      val h = (8 + (base * 3) % 11).toInt
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var g = ((base * 7 + fb * 11 + x * 17 + y * 29) % 256).toInt
          if (perturbed && (x + y * w) % 37 == 0) g = (g + 64) % 256
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

  /** Difference hash (dHash) over a REAL decoded image: nearest-neighbor
    * sample a 9×8 grayscale grid (`xs_i = ⌊i·w/9⌋`, `ys_j = ⌊j·h/8⌋` — the
    * [[resizeHalf]] sampling rule generalized), bit `j·8+i` = 1 iff the
    * right neighbor is strictly brighter. Size-invariant (any image lands
    * on the same 64-bit grid), integer-exact (gray = (r+g+b) div 3), and
    * returned as the 64-char bitstring the D6 pigeonhole machinery banding
    * consumes. Null for undecodable bytes — [[decodeImage]]'s quarantine
    * contract.
    */
  val dHash: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (bytes: Array[Byte]) =>
      javax.imageio.ImageIO.setUseCache(false)
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: java.io.IOException => null }
      if (img == null) null
      else {
        val w = img.getWidth
        val h = img.getHeight
        def gray(x: Int, y: Int): Int = {
          val rgb = img.getRGB(x, y)
          (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
        }
        val sb = new java.lang.StringBuilder(64)
        var j = 0
        while (j < 8) {
          val yj = j * h / 8
          var i = 0
          while (i < 8) {
            val a = gray(i * w / 9, yj)
            val b = gray((i + 1) * w / 9, yj)
            sb.append(if (b > a) '1' else '0')
            i += 1
          }
          j += 1
        }
        sb.toString
      }
    }

  /** Frame sampling: explode each media blob into fixed-size chunks with
    * per-frame offsets and hashes — the distributed shape for per-frame
    * model inference (each frame row is independently schedulable).
    */
  def frameSample(media: DataFrame, frameBytes: Int = FrameBytes): DataFrame =
    media
      .select(
        col("media_id"),
        col("content"),
        expr(s"CAST(ceil(octet_length(content) / ${frameBytes}.0) AS INT)").as("nf"))
      // nf >= 1 guard: Spark's sequence(0, -1) is the DESCENDING [0, -1],
      // not empty — zero-byte media must yield zero frames
      .filter(col("nf") > 0)
      .select(
        col("media_id"),
        explode(expr("sequence(0, nf - 1)")).as("frame_idx"),
        col("content"))
      .select(
        col("media_id"),
        col("frame_idx").cast("long").as("frame_idx"),
        expr(s"CAST(frame_idx * $frameBytes + 1 AS BIGINT)").as("frame_offset"),
        expr(s"md5(substring(content, frame_idx * $frameBytes + 1, $frameBytes))").as("frame_md5"))

  /** M6: scene-change keyframe detection — the shot-boundary pass a video
    * curation pipeline runs before sampling frames for captioning/training:
    * every frame decodes through the REAL JDK codec to its 64-bit dHash
    * ([[dHash]]), and a frame is a keyframe iff it opens its video or its
    * perceptual distance to the PREVIOUS frame exceeds `threshold` bits (a
    * hard cut moves most of the 64 luminance-gradient bits; codec noise and
    * slow pans move few). Output is per-frame: (video_id, frame_idx,
    * hamming_prev — null on the opening frame, is_keyframe 0/1), so the
    * same pass also yields the transition-score series segmentation or
    * shot-length stats would consume.
    *
    * Quarantine is whole-video on ANY undecodable frame — a decode hole
    * would make `hamming_prev` compare ACROSS the hole and fabricate a cut
    * at the splice (the d14 alignment-compaction argument, applied to
    * transitions); fail loud-by-omission rather than silently wrong.
    *
    * Scale shape at 100 TB: decode + hash is map-only and stays with the
    * blobs; only (vid, f, 4×16-bit words) shuffles ONCE, partitioned by
    * video for the lag window — each window partition is one video's frame
    * count (bounded by construction), never the corpus, so state is flat
    * and the plan has no global sort.
    */
  def sceneKeyframes(
      frames: DataFrame,
      contentCol: String = "content",
      videoCol: String = "video_id",
      frameCol: String = "frame_idx",
      threshold: Int = 4): DataFrame =
    sceneKeyframesHashed(frames, contentCol, videoCol, frameCol, threshold)
      .select("video_id", "frame_idx", "hamming_prev", "is_keyframe")

  /** [[sceneKeyframes]] with the per-frame fingerprint still attached
    * (simhash bitstring) — the internal shape downstream media operators
    * compose on (P7 dedupes the surviving keyframes across videos through
    * the D6/D12 pigeonhole core without re-decoding a single blob).
    */
  private[operators] def sceneKeyframesHashed(
      frames: DataFrame,
      contentCol: String = "content",
      videoCol: String = "video_id",
      frameCol: String = "frame_idx",
      threshold: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // one decode+hash pass, materialized once (the frameSeqNearDup
    // convention): the quarantine probe and the lag leg both read it
    val marked = frames
      .select(col(videoCol).as("video_id"), col(frameCol).as("frame_idx"),
        dHash(col(contentCol)).as("simhash"))
      .localCheckpoint(true)
    val bad = marked.filter(col("simhash").isNull).select("video_id").distinct()
    val fp = marked
      .join(bad, Seq("video_id"), "left_anti")
      .select(
        col("video_id") +: col("frame_idx") +: col("simhash") +:
          (0 until 4).map(j =>
            expr(s"CAST(conv(substring(simhash, ${j * 16 + 1}, 16), 2, 10) AS BIGINT)")
              .as(s"w$j")): _*)
    val w = Window.partitionBy("video_id").orderBy("frame_idx")
    val withPrev = (0 until 4).foldLeft(fp) { (df, j) =>
      df.withColumn(s"p$j", lag(col(s"w$j"), 1).over(w))
    }
    val hammingExpr = (0 until 4).map(j => s"bit_count(w$j ^ p$j)").mkString(" + ")
    withPrev
      .withColumn("hamming_prev",
        when(col("p0").isNull, lit(null).cast("long"))
          .otherwise(expr(s"CAST($hammingExpr AS BIGINT)")))
      .select(col("video_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("simhash"), col("hamming_prev"),
        when(col("hamming_prev").isNull || col("hamming_prev") > threshold, 1)
          .otherwise(0).as("is_keyframe"))
  }

  /** P7 building block: curate the keyframe set — scene-change keyframes
    * ([[sceneKeyframesHashed]]) deduplicated ACROSS videos through the
    * D6/D12 pigeonhole Hamming core (a syndicated intro, a repost's shots,
    * a shared stock clip all collapse to one kept copy). Per surviving
    * keyframe: n_dups = cross-keyframe partners within `maxHamming` bits,
    * is_kept = no partner precedes it in (video_id, frame_idx) order — the
    * deterministic min-ordinal keep rule.
    *
    * Scale shape: decode+hash once (shared with the keyframe pass), then
    * the pair generation is the banded [[Dedup.hammingNearDup]] over the
    * KEYFRAMES ONLY — typically a small fraction of frames — never an
    * all-frames join; the keep rule is one groupBy over the pair list.
    */
  def curateKeyframes(
      frames: DataFrame,
      contentCol: String = "content",
      videoCol: String = "video_id",
      frameCol: String = "frame_idx",
      threshold: Int = 4,
      maxHamming: Int = 4,
      bands: Int = 5): DataFrame = {
    val kf = sceneKeyframesHashed(frames, contentCol, videoCol, frameCol, threshold)
      .filter(col("is_keyframe") === 1)
      // composite ordinal: frame_idx is bounded far below 1<<20 in any
      // real container (validated loudly — a silent wrap would corrupt
      // the keep order), so (vid << 20 | f) is (vid, f)-lexicographic
      // widen to long BEFORE multiplying — an IntegerType video_id would
      // wrap at vid >= 2048 in its native type, silently corrupting the
      // keep order before the domain require below could catch it
      .select(col("video_id"), col("frame_idx"), col("simhash"),
        (col("video_id").cast("long") * 1048576L + col("frame_idx"))
          .as("ord"))
      .localCheckpoint(true)
    // the encoding is (vid, frame)-lexicographic ONLY on the validated
    // domain: negative ids/frames (or a vid large enough to overflow the
    // Long product) would silently reorder the keep rule
    require(kf.filter(
      col("frame_idx") < 0 || col("frame_idx") >= 1048576 ||
        col("video_id") < 0 ||
        col("video_id") > (Long.MaxValue / 1048576) - 1).isEmpty,
      "composite keep-order encoding needs 0 <= frame_idx < 2^20 and " +
        "0 <= video_id < Long.MaxValue/2^20")
    val pairs = Dedup.hammingNearDup(
      kf.select(col("ord").as("doc_id"), col("simhash")),
      maxHamming, bands, Dedup.DefaultBucketCap)
    val partners = pairs.select(col("a_id").as("ord"), col("b_id").as("p"))
      .unionByName(pairs.select(col("b_id").as("ord"), col("a_id").as("p")))
    val agg = partners.groupBy("ord")
      .agg(count(lit(1)).as("n_dups"), min("p").as("min_partner"))
    kf.join(agg, Seq("ord"), "left")
      .select(col("video_id"), col("frame_idx"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        when(col("min_partner").isNotNull && col("min_partner") < col("ord"), 0)
          .otherwise(1).as("is_kept"))
  }
}
