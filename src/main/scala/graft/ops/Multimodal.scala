package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video travel as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * Three real byte-level kernels — [[sniffMime]] (magic-byte container
  * detection), [[decodeWav]] (PCM WAV: RIFF chunk walk + sample scan) and
  * [[decodeBmp]] (uncompressed bitmaps: header walk + padded BGR row
  * scan) — cover the formats that need no codec library. For compressed
  * formats (JPEG/MP4/...) the codecs are NOT available in this
  * environment, so that decode kernel is a clearly-marked deterministic
  * fake ([[stubDecode]]); everything around it — the schema contract, the
  * per-partition batch iteration (the Scala analogue of `mapInPandas`:
  * one buffer of rows per partition, amortized setup), partition sizing,
  * and the downstream typed-feature operators — is real and tested, so
  * swapping a real codec in is a one-function change with [[decodeWav]]
  * as the template.
  *
  * Scale notes: media bytes never pass through a shuffle here (decode is a
  * narrow mapPartitions); only the small typed features continue into
  * joins/aggregations. For very large blobs, pair with
  * `spark.sql.files.maxPartitionBytes` tuning so a partition's batch fits
  * executor memory.
  */
object Multimodal {

  /** Typed metadata carried alongside the opaque payload. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true)))

  /** Decoded-feature schema appended by [[stubDecode]]. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("sample_rate", IntegerType)))

  /** Magic-byte MIME sniffing — REAL byte inspection, not a stub: the
    * container type reads off the payload's leading bytes (PNG/JPEG/GIF
    * signatures, RIFF+WAVE, the MP4 `ftyp` box at offset 4, PDF), the
    * standard first step of a media-ingest pipeline — never trust the
    * upstream-declared mime. A codegen'd hex/when chain over the first
    * 16 bytes: scan speed, no UDF, no shuffle; unknown signatures fall
    * back to application/octet-stream.
    */
  def sniffMime(payload: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val hx = hex(substring(payload, 1, 16)) // uppercase hex, 32 chars
    when(hx.startsWith("89504E470D0A1A0A"), "image/png")
      .when(hx.startsWith("FFD8FF"), "image/jpeg")
      .when(hx.startsWith("47494638"), "image/gif")
      .when(hx.startsWith("52494646") &&
        substring(hx, 17, 8) === "57415645", "audio/wav")
      // `ftyp` at offset 4 is anchored behind a plausible leading box
      // length (bytes 0-3 = big-endian size of the ftyp box; real ones
      // are tens of bytes, so the top two bytes are always 00 — while a
      // TEXT payload containing "ftyp" at chars 4-7 has no NULs at all
      // and can no longer sniff as video)
      .when(hx.startsWith("0000") && substring(hx, 9, 8) === "66747970",
        "video/mp4")
      .when(hx.startsWith("25504446"), "application/pdf")
      .otherwise("application/octet-stream")
  }

  /** Deterministic fake "decode": derives plausible media dimensions from a
    * stable 64-bit mix of the payload bytes. STUB — replace `fakeProbe`
    * with a real codec probe (e.g. javacv / soundlibs) when available.
    */
  private def fakeProbe(bytes: Array[Byte], mime: String): (Int, Int, Int, Int) = {
    var h = 0xCBF29CE484222325L // FNV offset basis; deterministic, no RNG
    var i = 0
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xFFL)) * 0x100000001B3L; i += 1 }
    def pick(shift: Int, mod: Int, base: Int) =
      base + (((h >>> shift) % mod).toInt + mod) % mod
    mime.takeWhile(_ != '/') match {
      case "image" => (pick(0, 3840, 16), pick(12, 2160, 16), 1, 0)
      case "video" => (pick(0, 1920, 16), pick(12, 1080, 16), pick(24, 14400, 1), 0)
      case "audio" => (0, 0, 0, Seq(8000, 16000, 22050, 44100, 48000)(pick(8, 5, 0)))
      case _       => (0, 0, 0, 0)
    }
  }

  /** Decode/probe each payload, per-partition in one pass (batch shape:
    * the iterator is consumed lazily row-by-row but setup — codec init in
    * the real version — happens once per partition).
    */
  def stubDecode(df: DataFrame, idCol: String = "media_id",
      mimeCol: String = "mime", payloadCol: String = "payload"): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ decodedSchema.fields)
    val (idIdx, mimeIdx, payIdx) =
      (df.schema.fieldIndex(idCol), df.schema.fieldIndex(mimeCol),
        df.schema.fieldIndex(payloadCol))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { it =>
      // real impl: initialize the codec ONCE here, then stream the batch
      it.map { row =>
        val bytes = if (row.isNullAt(payIdx)) Array.empty[Byte]
          else row.getAs[Array[Byte]](payIdx)
        val mime = row.getString(mimeIdx)
        val (w, hgt, frames, rate) = fakeProbe(bytes, mime)
        Row.fromSeq(row.toSeq ++ Seq[Any](bytes.length.toLong, w, hgt, frames, rate))
      }
    }(enc)
  }

  /** Resize plan for decoded images: target box preserving aspect ratio —
    * pure column math over the typed features (no payload touch).
    */
  def resizePlan(df: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(lit(maxW) / col("width"), lit(maxH) / col("height"), lit(1.0))
    df.withColumn("out_width", (col("width") * scale).cast("int"))
      .withColumn("out_height", (col("height") * scale).cast("int"))
  }

  /** Frame-sampling plan for decoded video: every `stride`-th frame index. */
  def frameSamplePlan(df: DataFrame, stride: Int): DataFrame =
    df.withColumn("sampled_frames",
      when(col("n_frames") > 0,
        sequence(lit(0), col("n_frames") - 1, lit(stride)))
        .otherwise(array().cast("array<int>")))

  /** Features produced by [[decodeWav]]; all null for unparseable
    * payloads (the quarantine contract — bad media never kills a batch).
    */
  val wavSchema: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType),
    StructField("n_channels", IntegerType),
    StructField("bits_per_sample", IntegerType),
    StructField("n_samples", LongType),
    StructField("duration_ms", LongType),
    StructField("peak_abs", IntegerType),
    StructField("sum_abs", LongType)))

  /** REAL PCM WAV decode — not a stub: RIFF/WAVE container walk + PCM16
    * sample scan, pure JVM byte arithmetic (PCM needs no codec library,
    * which makes it the one media format this sandbox can decode for
    * real, end to end). Parses the fmt chunk (rate/channels/bits),
    * walks chunks by declared size (word-aligned per RIFF), and scans
    * the 16-bit little-endian samples once for peak and sum of absolute
    * amplitude — the integer features a loudness/silence gate consumes.
    * Same mapPartitions batch shape as [[stubDecode]] (bytes never
    * shuffle; only the small typed features continue). Malformed
    * payloads (bad magic, truncated chunks, non-PCM16) yield all-null
    * features instead of throwing.
    */
  def decodeWav(df: DataFrame, idCol: String = "media_id",
      payloadCol: String = "payload"): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ wavSchema.fields)
    val payIdx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { it =>
      it.map { row =>
        val b = if (row.isNullAt(payIdx)) null
          else row.getAs[Array[Byte]](payIdx)
        Row.fromSeq(row.toSeq ++ parseWav(b))
      }
    }(enc)
  }

  private val NullWav: Seq[Any] = Seq(null, null, null, null, null, null, null)

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
      ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  /** Shared RIFF/WAVE container walk: (rate, channels, dataOff,
    * dataLen) for a well-formed PCM16 payload, None for anything the
    * quarantine contract null-fills (bad magic, truncated chunk,
    * non-PCM16). The single source of container truth for [[decodeWav]]
    * and [[wavActivity]].
    */
  private def wavPcm16(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (b == null || b.length < 12 || tag(b, 0) != "RIFF" ||
      tag(b, 8) != "WAVE") return None
    var off = 12
    var rate, channels, bits = -1
    var fmtPcm = false
    var dataOff, dataLen = -1
    while (off + 8 <= b.length) {
      val id = tag(b, off)
      val size = le32(b, off + 4)
      // LONG arithmetic: a lying declared size near Int.MaxValue makes
      // `off + 8 + size` wrap negative in 32 bits, the bounds check
      // pass, and the next tag read throw out of the quarantine —
      // found by the adversarial-media band (giant declared size)
      if (size < 0 || off + 8L + size > b.length) return None
      if (id == "fmt " && size >= 16) {
        fmtPcm = le16(b, off + 8) == 1 // PCM
        channels = le16(b, off + 10)
        rate = le32(b, off + 12)
        bits = le16(b, off + 22)
      } else if (id == "data") { dataOff = off + 8; dataLen = size }
      off += 8 + size + (size & 1) // RIFF chunks are word-aligned
    }
    if (!fmtPcm || bits != 16 || rate <= 0 || channels <= 0 ||
      dataOff < 0) None
    else Some((rate, channels, dataOff, dataLen))
  }

  private def parseWav(b: Array[Byte]): Seq[Any] = wavPcm16(b) match {
    case None => NullWav
    case Some((rate, channels, dataOff, dataLen)) =>
      var i = dataOff
      var peak = 0
      var sum = 0L
      while (i + 1 < dataOff + dataLen) {
        val s = le16(b, i).toShort.toInt
        val a = math.abs(s)
        if (a > peak) peak = a
        sum += a
        i += 2
      }
      val nSamples = dataLen.toLong / 2 / channels
      Seq[Any](rate, channels, 16, nSamples,
        nSamples * 1000L / rate, peak, sum)
  }

  /** Features produced by [[wavActivity]]; all null for unparseable
    * payloads, as [[decodeWav]].
    */
  val wavActivitySchema: StructType = StructType(Seq(
    StructField("n_samples", LongType),
    StructField("n_silent", LongType),
    StructField("n_clipped", LongType),
    StructField("max_silence_run", LongType),
    StructField("lead_silence", LongType)))

  /** Silence/clipping screen over decoded PCM16 — the VAD-style audio
    * quality gate a speech pipeline runs before transcription: count
    * samples under the silence threshold and at/over the clipping
    * threshold, the longest contiguous silent run, and the leading
    * silent run (interleaved sample granularity). Mostly-silent clips
    * waste transcription compute; clipped recordings poison acoustic
    * training. One pass over the bytes in the same mapPartitions batch
    * shape as [[decodeWav]] — payloads never shuffle, only the five
    * integer features continue. Malformed payloads null-fill.
    */
  def wavActivity(df: DataFrame, idCol: String = "media_id",
      payloadCol: String = "payload", silenceBelow: Int = 128,
      clipAtOrAbove: Int = 1000): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ wavActivitySchema.fields)
    val payIdx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { it =>
      it.map { row =>
        val b = if (row.isNullAt(payIdx)) null
          else row.getAs[Array[Byte]](payIdx)
        val feats: Seq[Any] = wavPcm16(b) match {
          case None => Seq(null, null, null, null, null)
          case Some((_, _, dataOff, dataLen)) =>
            var i = dataOff
            var n, silent, clipped, run, maxRun, lead = 0L
            var leading = true
            while (i + 1 < dataOff + dataLen) {
              val a = math.abs(le16(b, i).toShort.toInt)
              if (a < silenceBelow) {
                silent += 1; run += 1
                if (run > maxRun) maxRun = run
                if (leading) lead += 1
              } else {
                run = 0; leading = false
                if (a >= clipAtOrAbove) clipped += 1
              }
              n += 1
              i += 2
            }
            Seq(n, silent, clipped, maxRun, lead)
        }
        Row.fromSeq(row.toSeq ++ feats)
      }
    }(enc)
  }

  /** Features produced by [[decodeBmp]]; all null for unparseable
    * payloads, as [[decodeWav]].
    */
  val bmpSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("bits_per_pixel", IntegerType),
    StructField("n_pixels", LongType),
    StructField("sum_r", LongType),
    StructField("sum_g", LongType),
    StructField("sum_b", LongType)))

  /** REAL uncompressed-BMP decode — the image sibling of [[decodeWav]]
    * (uncompressed bitmaps are the one image container that needs no
    * codec): BITMAPFILEHEADER magic + declared pixel-array offset,
    * BITMAPINFOHEADER width/height/bpp, then one scan over the 24-bit
    * BGR rows (4-byte-aligned, bottom-up as positive-height BMPs are)
    * summing each channel — the stats an image-quality/black-frame gate
    * consumes. Negative-height (top-down) images scan identically since
    * channel sums are row-order-independent. Malformed or non-24bpp
    * payloads yield all-null features.
    */
  def decodeBmp(df: DataFrame, idCol: String = "media_id",
      payloadCol: String = "payload"): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ bmpSchema.fields)
    val payIdx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { it =>
      it.map { row =>
        val b = if (row.isNullAt(payIdx)) null
          else row.getAs[Array[Byte]](payIdx)
        Row.fromSeq(row.toSeq ++ parseBmp(b))
      }
    }(enc)
  }

  private def parseBmp(b: Array[Byte]): Seq[Any] = {
    if (b == null || b.length < 54 || b(0) != 'B' || b(1) != 'M')
      return NullWav
    val dataOff = le32(b, 10)
    val hdrSize = le32(b, 14)
    if (hdrSize < 40) return NullWav
    val w = le32(b, 18)
    val hRaw = le32(b, 22)
    val h = math.abs(hRaw)
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    if (w <= 0 || h == 0 || bpp != 24 || compression != 0) return NullWav
    // LONG row stride: a giant declared width makes `w * 3` wrap
    // negative in 32 bits, the bounds check pass, and the pixel scan
    // read out of the array — the quarantine contract must absorb
    // lying dimensions (adversarial-media band, giant-dims variant).
    // rowBytes/h each ≤ length after these checks, so the product and
    // the per-row offsets below fit comfortably in a long.
    val rowBytes = (w.toLong * 3 + 3) & ~3L // rows pad to 4-byte boundaries
    if (dataOff < 0 || rowBytes > b.length || h.toLong > b.length ||
      dataOff.toLong + rowBytes * h > b.length)
      return NullWav
    var sr, sg, sb = 0L
    var y = 0
    while (y < h) {
      var x = 0
      val ro = (dataOff + y * rowBytes).toInt
      while (x < w) {
        val po = ro + x * 3 // stored B, G, R
        sb += b(po) & 0xFF
        sg += b(po + 1) & 0xFF
        sr += b(po + 2) & 0xFF
        x += 1
      }
      y += 1
    }
    Seq[Any](w, h, bpp, w.toLong * h, sr, sg, sb)
  }

  /** Features produced by [[aHashBmp]]: the 64-bit perceptual average
    * hash split into two unsigned 32-bit halves (an engine-portable
    * spelling — building bit 63 of a signed 64-bit value overflows in
    * SQL replays), all null for unparseable payloads.
    */
  val aHashSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("hash_hi", LongType),
    StructField("hash_lo", LongType)))

  /** Perceptual average-hash (aHash) over REAL decoded BMP pixels — the
    * image near-duplicate key (the classic pHash-family baseline): the
    * image is nearest-neighbor sampled to an 8×8 grid in image
    * coordinates (sx = i·w div 8, sy = j·h div 8), each sample reduced
    * to integer luma (299·R + 587·G + 114·B) div 1000, and bit j·8+i
    * set when the sample's luma exceeds the 64-sample integer mean.
    * Re-encodes, resizes, and global brightness shifts leave the hash
    * (nearly) unchanged, so identical hashes group perceptual
    * duplicates — the image twin of exact text dedup, with hamming
    * distance as the near-dup relaxation. Integer arithmetic end to
    * end: a SQL oracle predicts every bit from the synthetic pixel
    * formula while this kernel recovers it from raw bytes. Same
    * mapPartitions shape as [[decodeBmp]]: bytes never shuffle, only
    * the 2×8-byte hash continues into the dedup join.
    */
  def aHashBmp(df: DataFrame, idCol: String = "media_id",
      payloadCol: String = "payload"): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ aHashSchema.fields)
    val payIdx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { it =>
      it.map { row =>
        val b = if (row.isNullAt(payIdx)) null
          else row.getAs[Array[Byte]](payIdx)
        Row.fromSeq(row.toSeq ++ aHashPixels(b))
      }
    }(enc)
  }

  private val NullAHash: Seq[Any] = Seq(null, null, null, null)

  private def aHashPixels(b: Array[Byte]): Seq[Any] = {
    if (b == null || b.length < 54 || b(0) != 'B' || b(1) != 'M')
      return NullAHash
    val dataOff = le32(b, 10)
    if (le32(b, 14) < 40) return NullAHash
    val w = le32(b, 18)
    val hRaw = le32(b, 22)
    val h = math.abs(hRaw)
    if (w <= 0 || h == 0 || le16(b, 28) != 24 || le32(b, 30) != 0)
      return NullAHash
    // long stride — the parseBmp giant-width overflow lesson
    val rowBytes = (w.toLong * 3 + 3) & ~3L
    if (dataOff < 0 || rowBytes > b.length || h.toLong > b.length ||
      dataOff.toLong + rowBytes * h > b.length)
      return NullAHash
    // 8x8 nearest-neighbor luma grid in IMAGE coordinates (y = 0 at the
    // top); bottom-up files store image row y at file row h-1-y
    val gray = new Array[Int](64)
    var sum = 0
    var j = 0
    while (j < 8) {
      val sy = (j.toLong * h / 8).toInt // long: 7·h overflows int at huge h
      val fileRow = if (hRaw > 0) h - 1 - sy else sy
      val ro = (dataOff + fileRow * rowBytes).toInt
      var i = 0
      while (i < 8) {
        val sx = (i.toLong * w / 8).toInt // long: 7·w overflows int
        val po = ro + sx * 3 // stored B, G, R
        val g = (299 * (b(po + 2) & 0xFF) + 587 * (b(po + 1) & 0xFF) +
          114 * (b(po) & 0xFF)) / 1000
        gray(j * 8 + i) = g
        sum += g
        i += 1
      }
      j += 1
    }
    val mean = sum / 64
    var hi = 0L
    var lo = 0L
    var k = 0
    while (k < 64) {
      if (gray(k) > mean) {
        if (k >= 32) hi |= 1L << (k - 32) else lo |= 1L << k
      }
      k += 1
    }
    Seq[Any](w, h, hi, lo)
  }

  /** Doc-id band reserved for the committed adversarial-media fixture
    * (`tools/gen_adversarial_media.py`): for ids at/above this base
    * every synth emits a deterministic ADVERSARIAL payload keyed by
    * `(id − base) mod 5` — truncated header, giant lying chunk
    * size/dims, zero-sample clip, unsupported format, and a
    * structurally-adversarial-but-VALID edge (odd-sized unknown RIFF
    * chunk; top-down negative-height BMP) that must decode
    * feature-identically to the normal synth. This turns the decoders'
    * quarantine contract from a unit-spec promise into a full-suite
    * driver-checked behavior: the fixture's oracles predict null (or
    * edge) features per variant. Normal fixtures' doc_ids stay far
    * below (≤ 500k at the 100× fixture; the adversarial-Unicode docs
    * use the 10k band).
    */
  val AdvMediaBase: Long = 9000000L

  private def advVariant(id: Long): Int = ((id - AdvMediaBase) % 5).toInt

  /** Adversarial WAV payloads (see [[AdvMediaBase]]); `num/den` is the
    * gain of the valid-edge variant so the q120 gain-triple semantics
    * survive into the band.
    */
  private def advWavBytes(id: Long, num: Int, den: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(256)
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Int): Unit = { w16(v & 0xFFFF); w16((v >>> 16) & 0xFFFF) }
    def ascii(s: String): Unit =
      out.write(s.getBytes("US-ASCII"), 0, s.length)
    advVariant(id) match {
      case 0 => // truncated header: 2 bytes
        ascii("RI")
      case 1 => // giant lying chunk size: 32-bit overflow crash driver
        ascii("RIFF"); w32(36); ascii("WAVE")
        ascii("fmt "); w32(0x7FFFFFF0)
        w16(1); w16(1); w32(8000); w32(16000); w16(2); w16(16)
      case 2 => // zero-sample but VALID PCM16 mono 8 kHz
        ascii("RIFF"); w32(36); ascii("WAVE")
        ascii("fmt "); w32(16)
        w16(1); w16(1); w32(8000); w32(16000); w16(2); w16(16)
        ascii("data"); w32(0)
      case 3 => // non-PCM format code (IEEE float)
        ascii("RIFF"); w32(36); ascii("WAVE")
        ascii("fmt "); w32(16)
        w16(3); w16(1); w32(8000); w32(32000); w16(4); w16(32)
        ascii("data"); w32(0)
      case _ => // valid edge: ODD-sized unknown chunk (word-alignment
        // pad), then the standard clip — feature-identical to the
        // normal synth at this id
        val n = (64 + id % 32).toInt
        val rate = (8000 * (1 + id % 3)).toInt
        val dataLen = n * 2
        ascii("RIFF"); w32(48 + dataLen); ascii("WAVE")
        ascii("junk"); w32(3)
        ascii("xyz"); out.write(0) // 3 payload bytes + align pad
        ascii("fmt "); w32(16)
        w16(1); w16(1); w32(rate); w32(rate * 2); w16(2); w16(16)
        ascii("data"); w32(dataLen)
        var i = 0
        while (i < n) {
          val base = ((id * 31 + i * 7) % 2048) - 1024
          val v = math.max(-32768L, math.min(32767L, base * num / den))
          w16(v.toInt)
          i += 1
        }
    }
    out.toByteArray
  }

  /** Adversarial BMP payloads (see [[AdvMediaBase]]); `delta` is the
    * brightness shift of the valid-edge variant so the q117/q148
    * shift-triple semantics survive into the band.
    */
  private def advBmpBytes(id: Long, delta: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(256)
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Int): Unit = { w16(v & 0xFFFF); w16((v >>> 16) & 0xFFFF) }
    advVariant(id) match {
      case 0 => // truncated: 10 bytes starting BM
        out.write('B'); out.write('M'); w32(54); w32(0)
      case 1 => // bad magic, otherwise-plausible 54-byte header
        out.write('X'); out.write('X'); w32(54); w32(0); w32(54)
        w32(40); w32(4); w32(3); w16(1); w16(24); w32(0); w32(0)
        w32(2835); w32(2835); w32(0); w32(0)
      case 2 => // giant declared dims over a 12-byte pixel array:
        // w·3 wraps negative in 32 bits — the overflow crash driver
        out.write('B'); out.write('M'); w32(66); w32(0); w32(54)
        w32(40); w32(0x40000000); w32(3); w16(1); w16(24); w32(0); w32(12)
        w32(2835); w32(2835); w32(0); w32(0)
        (0 until 12).foreach(_ => out.write(7))
      case 3 => // unsupported 32bpp depth on a valid 4×3 geometry
        out.write('B'); out.write('M'); w32(54 + 48); w32(0); w32(54)
        w32(40); w32(4); w32(3); w16(1); w16(32); w32(0); w32(48)
        w32(2835); w32(2835); w32(0); w32(0)
        (0 until 48).foreach(_ => out.write(1))
      case _ => // valid edge: TOP-DOWN (negative height), standard
        // geometry and pixel formula — feature-identical to the
        // bottom-up synth at this id (sums and aHash are row-order
        // independent by construction)
        val w = (4 + id % 8).toInt
        val h = (3 + id % 5).toInt
        val rowBytes = (w * 3 + 3) & ~3
        val dataLen = rowBytes * h
        out.write('B'); out.write('M'); w32(54 + dataLen); w32(0); w32(54)
        w32(40); w32(w); w32(-h); w16(1); w16(24); w32(0); w32(dataLen)
        w32(2835); w32(2835); w32(0); w32(0)
        def clamp(v: Long): Int = math.min(v + delta, 255L).toInt
        var fy = 0
        while (fy < h) {
          val y = fy // top-down: file row fy IS image row fy
          var x = 0
          while (x < w) {
            out.write(clamp((id * 7 + x * 4 + y * 2) % 256)) // B
            out.write(clamp((id * 3 + x + y) % 256))         // G
            out.write(clamp((id + 2 * x + 5 * y) % 256))     // R
            x += 1
          }
          var p = w * 3
          while (p < rowBytes) { out.write(0); p += 1 }
          fy += 1
        }
    }
    out.toByteArray
  }

  /** [[synthBmpBytes]] with a clamped brightness shift — the near-dup
    * test vector: `delta = 0` reproduces [[synthBmpBytes]] exactly.
    */
  def synthBmpBytesShifted(id: Long, delta: Int): Array[Byte] = {
    if (id >= AdvMediaBase) return advBmpBytes(id, delta)
    val w = (4 + id % 8).toInt
    val h = (3 + id % 5).toInt
    val rowBytes = (w * 3 + 3) & ~3
    val dataLen = rowBytes * h
    val out = new java.io.ByteArrayOutputStream(54 + dataLen)
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Int): Unit = { w16(v & 0xFFFF); w16((v >>> 16) & 0xFFFF) }
    out.write('B'); out.write('M'); w32(54 + dataLen); w32(0); w32(54)
    w32(40); w32(w); w32(h); w16(1); w16(24); w32(0); w32(dataLen)
    w32(2835); w32(2835); w32(0); w32(0)
    def clamp(v: Long): Int = math.min(v + delta, 255L).toInt
    var fy = 0
    while (fy < h) {
      val y = h - 1 - fy
      var x = 0
      while (x < w) {
        out.write(clamp((id * 7 + x * 4 + y * 2) % 256)) // B
        out.write(clamp((id * 3 + x + y) % 256))         // G
        out.write(clamp((id + 2 * x + 5 * y) % 256))     // R
        x += 1
      }
      var p = w * 3
      while (p < rowBytes) { out.write(0); p += 1 }
      fy += 1
    }
    out.toByteArray
  }

  /** Deterministic 24bpp BMP bytes for end-to-end decode tests:
    * `(4 + id%8) × (3 + id%5)` pixels with channel values
    * R = `(id + 2x + 5y) mod 256`, G = `(id·3 + x + y) mod 256`,
    * B = `(id·7 + x·4 + y·2) mod 256` — closed-form per id, so the q98
    * oracle predicts every channel sum the byte-level parse must
    * recover. Bottom-up row order as standard positive-height BMPs.
    */
  def synthBmpBytes(id: Long): Array[Byte] = {
    if (id >= AdvMediaBase) return advBmpBytes(id, 0)
    val w = (4 + id % 8).toInt
    val h = (3 + id % 5).toInt
    val rowBytes = (w * 3 + 3) & ~3
    val dataLen = rowBytes * h
    val out = new java.io.ByteArrayOutputStream(54 + dataLen)
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Int): Unit = { w16(v & 0xFFFF); w16((v >>> 16) & 0xFFFF) }
    out.write('B'); out.write('M'); w32(54 + dataLen); w32(0); w32(54)
    w32(40); w32(w); w32(h); w16(1); w16(24); w32(0); w32(dataLen)
    w32(2835); w32(2835); w32(0); w32(0)
    // bottom-up: file row 0 is image row y = h-1
    var fy = 0
    while (fy < h) {
      val y = h - 1 - fy
      var x = 0
      while (x < w) {
        out.write((((id * 7 + x * 4 + y * 2) % 256) & 0xFF).toInt) // B
        out.write((((id * 3 + x + y) % 256) & 0xFF).toInt)         // G
        out.write((((id + 2 * x + 5 * y) % 256) & 0xFF).toInt)     // R
        x += 1
      }
      var p = w * 3
      while (p < rowBytes) { out.write(0); p += 1 }
      fy += 1
    }
    out.toByteArray
  }

  /** Features produced by [[envelopeHashWav]]; null for unparseable
    * payloads.
    */
  val envHashSchema: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType),
    StructField("n_samples", LongType),
    StructField("env_hash", LongType)))

  /** 32-bit loudness-envelope fingerprint over REAL decoded PCM16
    * samples — the audio near-duplicate key (the aHash idea on the time
    * axis, the first stage of an echoprint/chromaprint-style dedup):
    * the sample stream splits into 32 balanced segments (sample i →
    * segment i·32 div n), each segment reduces to its integer mean
    * absolute amplitude, and bit k is set when segment k's mean exceeds
    * the integer mean of the 32 segment means. Re-encodes and moderate
    * gain changes preserve the hash (a positive gain scales every
    * segment mean together, clipping aside), so identical hashes group
    * perceptual duplicates. Integer arithmetic end to end — a SQL
    * oracle predicts every bit from the synthetic sample formula while
    * this kernel recovers it from raw RIFF bytes. Narrow mapPartitions;
    * only the 8-byte hash continues.
    */
  def envelopeHashWav(df: DataFrame, idCol: String = "media_id",
      payloadCol: String = "payload"): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ envHashSchema.fields)
    val payIdx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { it =>
      it.map { row =>
        val b = if (row.isNullAt(payIdx)) null
          else row.getAs[Array[Byte]](payIdx)
        Row.fromSeq(row.toSeq ++ envHashSamples(b))
      }
    }(enc)
  }

  private val NullEnvHash: Seq[Any] = Seq(null, null, null)

  private def envHashSamples(b: Array[Byte]): Seq[Any] = {
    // container walk identical to parseWav's contract
    if (b == null || b.length < 12 || tag(b, 0) != "RIFF" ||
      tag(b, 8) != "WAVE") return NullEnvHash
    var off = 12
    var rate, channels, bits = -1
    var fmtPcm = false
    var dataOff, dataLen = -1
    while (off + 8 <= b.length) {
      val id = tag(b, off)
      val size = le32(b, off + 4)
      // long arithmetic — the wavPcm16 overflow lesson applies here too
      if (size < 0 || off + 8L + size > b.length) return NullEnvHash
      if (id == "fmt " && size >= 16) {
        fmtPcm = le16(b, off + 8) == 1
        channels = le16(b, off + 10)
        rate = le32(b, off + 12)
        bits = le16(b, off + 22)
      } else if (id == "data") { dataOff = off + 8; dataLen = size }
      off += 8 + size + (size & 1)
    }
    if (!fmtPcm || bits != 16 || rate <= 0 || channels <= 0 ||
      dataOff < 0) return NullEnvHash
    val n = dataLen / 2
    if (n <= 0) return NullEnvHash
    val segSum = new Array[Long](32)
    val segCnt = new Array[Long](32)
    var i = 0
    while (i < n) {
      val s = le16(b, dataOff + i * 2).toShort.toInt
      val k = (i.toLong * 32 / n).toInt
      segSum(k) += math.abs(s)
      segCnt(k) += 1
      i += 1
    }
    var meanSum = 0L
    val segMean = new Array[Long](32)
    var k = 0
    while (k < 32) {
      segMean(k) = if (segCnt(k) > 0) segSum(k) / segCnt(k) else 0L
      meanSum += segMean(k)
      k += 1
    }
    val mean = meanSum / 32
    var hash = 0L
    k = 0
    while (k < 32) {
      if (segMean(k) > mean) hash |= 1L << k
      k += 1
    }
    Seq[Any](rate, n.toLong / channels, hash)
  }

  /** [[synthWavBytes]] with a clamped rational gain — the audio near-dup
    * test vector: `num = den` reproduces [[synthWavBytes]] exactly.
    */
  def synthWavBytesScaled(id: Long, num: Int, den: Int): Array[Byte] = {
    if (id >= AdvMediaBase) return advWavBytes(id, num, den)
    val n = (64 + id % 32).toInt
    val rate = (8000 * (1 + id % 3)).toInt
    val dataLen = n * 2
    val out = new java.io.ByteArrayOutputStream(44 + dataLen)
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Int): Unit = { w16(v & 0xFFFF); w16((v >>> 16) & 0xFFFF) }
    out.write("RIFF".getBytes("US-ASCII")); w32(36 + dataLen)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); w32(16)
    w16(1); w16(1); w32(rate); w32(rate * 2); w16(2); w16(16)
    out.write("data".getBytes("US-ASCII")); w32(dataLen)
    var i = 0
    while (i < n) {
      val base = ((id * 31 + i * 7) % 2048) - 1024
      // TRUNCATING division toward zero — negative samples exist, and
      // DuckDB's // truncates on negatives exactly like Scala's / and
      // Spark's DIV (measured: (-346*9)//8 = -389, not floor's -390),
      // so plain / keeps the two replays identical
      val v = math.max(-32768L, math.min(32767L, base * num / den))
      w16(v.toInt)
      i += 1
    }
    out.toByteArray
  }

  /** Deterministic PCM16 mono WAV bytes for end-to-end decode tests:
    * `64 + id%32` samples at `8000·(1 + id%3)` Hz with sample i =
    * `(id·31 + i·7) mod 2048 − 1024` — every decoded feature is a
    * closed-form function of `id`, so a SQL oracle can predict what the
    * BYTE-LEVEL parse must recover (the q97 contract).
    */
  def synthWavBytes(id: Long): Array[Byte] = {
    if (id >= AdvMediaBase) return advWavBytes(id, 1, 1)
    val n = (64 + id % 32).toInt
    val rate = (8000 * (1 + id % 3)).toInt
    val dataLen = n * 2
    val out = new java.io.ByteArrayOutputStream(44 + dataLen)
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Int): Unit = { w16(v & 0xFFFF); w16((v >>> 16) & 0xFFFF) }
    out.write("RIFF".getBytes("US-ASCII")); w32(36 + dataLen)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); w32(16)
    w16(1); w16(1); w32(rate); w32(rate * 2); w16(2); w16(16)
    out.write("data".getBytes("US-ASCII")); w32(dataLen)
    var i = 0
    while (i < n) { w16((((id * 31 + i * 7) % 2048) - 1024).toInt); i += 1 }
    out.toByteArray
  }
}
