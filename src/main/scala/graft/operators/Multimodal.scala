package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video ride as opaque `binary`
  * columns with typed metadata. The Spark-side machinery — schema, typed
  * Datasets, per-partition batch decode, partitioning — is real. IMAGE decode
  * is real too (`javax.imageio` ships with the JDK: PNG/JPEG/GIF/BMP);
  * audio/video fall back to a clearly-marked deterministic STUB (no such
  * codecs on a bare JVM).
  *
  * Scale design: decode runs in `mapPartitions` so any native/batched decoder
  * amortizes per-partition setup; assets keep their partition key so feature
  * extraction never reshuffles raw bytes; image dimensions come from a
  * header-only `ImageReader` probe, never a full pixel decode.
  */
object Multimodal {

  /** An opaque media asset: raw bytes + typed metadata. */
  case class Asset(asset_id: Long, kind: String, media: Array[Byte],
                   meta: Map[String, String])

  /** Extracted features for one asset. */
  case class AssetFeatures(asset_id: Long, kind: String, byte_len: Long,
                           header_hex: String, width: Int, height: Int,
                           duration_ms: Long)

  /** STUB decoder: deterministic pseudo-decode from the byte content.
    * A real deployment swaps this for an actual codec (e.g. JNI/FFI) — the
    * signature, batching and schema stay identical. */
  def stubDecode(a: Asset): AssetFeatures = {
    val len = a.media.length.toLong
    val header = a.media.take(8).map(b => f"${b & 0xff}%02x").mkString
    // Deterministic fake dimensions derived from content — NOT a real decode.
    val h = a.media.foldLeft(17L)((acc, b) => acc * 31 + (b & 0xff))
    AssetFeatures(a.asset_id, a.kind, len, header,
      width = (math.abs(h) % 1920).toInt + 1,
      height = (math.abs(h / 7) % 1080).toInt + 1,
      duration_ms = if (a.kind == "image") 0L else math.abs(h) % 600000L)
  }

  /** Real image decode: header-only dimension probe via `javax.imageio` —
    * the reader parses just the metadata (IHDR / SOF marker), not the pixel
    * data, so this is cheap even for large assets. Returns None when no JDK
    * reader recognises the bytes (corrupt file, or a format like WebP). */
  def decodeImage(a: Asset): Option[AssetFeatures] =
    try {
      // MemoryCacheImageInputStream, NOT ImageIO.createImageInputStream: the
      // latter defaults to a disk-backed cache that would copy every asset's
      // bytes to an executor temp file before the ~8-byte header read.
      val in = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(a.media))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(in)
            val header = a.media.take(8).map(b => f"${b & 0xff}%02x").mkString
            Some(AssetFeatures(a.asset_id, a.kind, a.media.length.toLong, header,
              width = r.getWidth(0), height = r.getHeight(0), duration_ms = 0L))
          } finally r.dispose()
        }
      } finally in.close()
    } catch {
      // ImageIO plugins throw RuntimeExceptions (not just IOException) on
      // malformed-but-recognized headers; any failure means "not decodable
      // here" and must fall back to the stub, never kill the task.
      case scala.util.control.NonFatal(_) => None
    }

  /** Full decode: real for images (falling back to the stub on unreadable
    * bytes), stubbed for audio/video. */
  def decode(a: Asset): AssetFeatures =
    if (a.kind == "image") decodeImage(a).getOrElse(stubDecode(a))
    else stubDecode(a)

  /** Batch feature extraction: per-partition iteration (decoder setup happens
    * once per partition, mirroring a `mapInPandas` batch UDF). */
  def extractFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition decoder init would go here
      it.map(decode)
    }
  }

  /** Build an asset table from the documents fixture (text bytes standing in
    * for media payloads) — exercises the binary-column path end to end. */
  def assetsFromDocuments(spark: SparkSession, sfDir: String): Dataset[Asset] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("asset_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
        col("text").cast("binary").as("media"),
        map(lit("source"), col("source"), lit("lang"), col("lang")).as("meta"))
      .as[Asset]
  }

  /** Frame sampling plan for video assets: every `stepMs` up to duration —
    * the exploded (asset_id, frame_ts) plan a real pipeline would feed to a
    * frame decoder. Pure relational (sequence + explode). */
  def frameSamplePlan(features: DataFrame, stepMs: Long = 1000L): DataFrame =
    features.where(col("kind") === "video")
      .select(col("asset_id"),
        explode(sequence(lit(0L), col("duration_ms"), lit(stepMs))).as("frame_ts"))

  /** Resize plan: target dimensions fitting (width, height) inside a
    * `maxDim` box preserving aspect ratio — the relational half of a resize
    * (the pixel op itself belongs in the stubbed per-partition decode).
    * Assets already inside the box keep their dimensions. */
  def resizePlan(features: DataFrame, maxDim: Int = 512): DataFrame = {
    val longest = greatest(col("width"), col("height")).cast("double")
    val scale = when(longest <= maxDim, lit(1d)).otherwise(lit(maxDim) / longest)
    features.withColumn("target_width",
        greatest(round(col("width") * scale).cast("int"), lit(1)))
      .withColumn("target_height",
        greatest(round(col("height") * scale).cast("int"), lit(1)))
  }
}
