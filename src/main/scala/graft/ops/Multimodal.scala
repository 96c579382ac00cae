package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video travel as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode kernel is a clearly-marked deterministic fake ([[stubDecode]]);
  * everything around it — the schema contract, the per-partition batch
  * iteration (the Scala analogue of `mapInPandas`: one buffer of rows per
  * partition, amortized setup), partition sizing, and the downstream
  * typed-feature operators — is real and tested, so swapping a real codec
  * in is a one-function change.
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
}
