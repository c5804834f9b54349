package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video ride as opaque `binary`
  * columns with typed metadata. The Spark-side machinery — schema, typed
  * Datasets, per-partition batch decode, partitioning — is real, and so are
  * all three decoders: images via `javax.imageio` (PNG/JPEG/GIF/BMP header
  * probe), audio via a RIFF/WAVE chunk walk (fmt byte rate + data size →
  * duration), video via an ISO BMFF box walk (mvhd timescale/duration, tkhd
  * 16.16 fixed-point dimensions). The deterministic stub remains only as the
  * documented fallback for bytes no parser recognises.
  *
  * Scale design: decode runs in `mapPartitions` so any native/batched decoder
  * amortizes per-partition setup; assets keep their partition key so feature
  * extraction never reshuffles raw bytes; every probe reads headers only,
  * never payload (pixels / samples / frames).
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
    val header = headerHex(a.media)
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
            val header = headerHex(a.media)
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

  private def headerHex(b: Array[Byte]): String =
    b.take(8).map(x => f"${x & 0xff}%02x").mkString

  /** Real audio probe: header-only RIFF/WAVE chunk walk. Reads the `fmt `
    * chunk's byte rate and the `data` chunk's declared size — never the
    * samples — and reports duration_ms = dataBytes * 1000 / byteRate.
    * Returns None for anything that isn't a well-formed WAV. */
  def decodeWav(a: Asset): Option[AssetFeatures] = {
    val b = a.media
    def u32le(off: Int): Long =
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
    def tag(off: Int): String = new String(b.slice(off, off + 4), "US-ASCII")
    try {
      if (b.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
      var off = 12
      var byteRate = 0L
      var dataLen = -1L
      var ok = true
      while (ok && off + 8 <= b.length && (byteRate == 0L || dataLen < 0L)) {
        val sz = u32le(off + 4)
        tag(off) match {
          // byte rate sits at offset 8 of the fmt payload; the chunk itself
          // must declare the full 16-byte PCM header or the read would land
          // in the NEXT chunk's bytes
          case "fmt " if sz >= 16 && off + 20 <= b.length =>
            byteRate = u32le(off + 16)
          case "data" => dataLen = sz
          case _      => ()
        }
        // a corrupt size whose advance is <= 0 would loop forever
        val advance = 8 + sz.toInt + (sz.toInt & 1) // RIFF chunks word-aligned
        if (advance <= 0) ok = false else off += advance
      }
      if (byteRate <= 0 || dataLen < 0) None
      else Some(AssetFeatures(a.asset_id, a.kind, b.length.toLong, headerHex(b),
        width = 0, height = 0, duration_ms = dataLen * 1000L / byteRate))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Real video probe: header-only ISO BMFF (MP4) box walk. Duration comes
    * from `moov/mvhd` (duration / timescale, version 0 and 1 layouts);
    * display dimensions from the first track's `tkhd` 16.16 fixed-point
    * width/height. `mdat` payload is never touched. */
  def decodeMp4(a: Asset): Option[AssetFeatures] = {
    val b = a.media
    def u32(off: Int): Long =
      ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
        ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
    def boxType(off: Int): String = new String(b.slice(off + 4, off + 8), "US-ASCII")
    // first child box of `typ` within [start, end): returns (boxStart, boxEnd)
    def findBox(start: Int, end: Int, typ: String): Option[(Int, Int)] = {
      var off = start
      while (off + 8 <= end) {
        val sz = u32(off).toInt
        if (sz < 8) return None // 64-bit/zero sizes unsupported in the probe
        if (boxType(off) == typ) return Some((off, math.min(off + sz, end)))
        off += sz
      }
      None
    }
    try {
      if (b.length < 16) return None
      findBox(0, b.length, "moov").flatMap { case (ms, me) =>
        val duration = findBox(ms + 8, me, "mvhd").flatMap { case (vs, ve) =>
          (b(vs + 8) & 0xff) match {
            case 0 if vs + 28 <= ve =>
              val timescale = u32(vs + 20)
              if (timescale > 0) Some(u32(vs + 24) * 1000L / timescale) else None
            case 1 if vs + 40 <= ve =>
              val timescale = u32(vs + 28)
              val d = (u32(vs + 32) << 32) | u32(vs + 36)
              if (timescale > 0) Some(d * 1000L / timescale) else None
            case _ => None
          }
        }
        val dims = for {
          (ts, te) <- findBox(ms + 8, me, "trak")
          (ks, ke) <- findBox(ts + 8, te, "tkhd")
          wOff = ks + (if ((b(ks + 8) & 0xff) == 1) 96 else 84)
          if wOff + 8 <= ke
        } yield ((u32(wOff) >> 16).toInt, (u32(wOff + 4) >> 16).toInt)
        duration.map { d =>
          val (w, h) = dims.getOrElse((0, 0))
          AssetFeatures(a.asset_id, a.kind, b.length.toLong, headerHex(b), w, h, d)
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Full decode: every kind routes through its real header probe first; the
    * deterministic stub is only the fallback for unparseable bytes. */
  def decode(a: Asset): AssetFeatures = (a.kind match {
    case "image" => decodeImage(a)
    case "audio" => decodeWav(a)
    case "video" => decodeMp4(a)
    case _       => None
  }).getOrElse(stubDecode(a))

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

  /** Minimal valid WAV container around `payload` as 8-bit mono PCM at
    * `sampleRate` Hz (byte rate == sample rate), for specs and the q101
    * end-to-end probe: duration_ms = payload.length * 1000 / sampleRate. */
  def wavBytes(payload: Array[Byte], sampleRate: Int = 8000): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + payload.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + payload.length)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)          // PCM, mono
      .putInt(sampleRate).putInt(sampleRate) // sample rate, byte rate
      .putShort(1).putShort(8)          // block align, bits/sample
    bb.put("data".getBytes("US-ASCII")).putInt(payload.length).put(payload)
    bb.array()
  }

  /** Minimal valid MP4 (ISO BMFF) header: ftyp + moov{mvhd, trak{tkhd}} with
    * timescale 1000 (so mvhd duration == durationMs) and 16.16 fixed-point
    * tkhd dimensions. No mdat — the probe never reads payload anyway. */
  def mp4Bytes(durationMs: Long, width: Int, height: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16 + 8 + 108 + 8 + 92)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.putInt(16).put("ftyp".getBytes("US-ASCII"))
      .put("isom".getBytes("US-ASCII")).putInt(0)
    bb.putInt(8 + 108 + 8 + 92).put("moov".getBytes("US-ASCII"))
    bb.putInt(108).put("mvhd".getBytes("US-ASCII"))
      .putInt(0)                        // version 0 + flags
      .putInt(0).putInt(0)              // creation, modification
      .putInt(1000)                     // timescale: 1 unit = 1 ms
      .putInt(durationMs.toInt)
      .position(bb.position() + 80)     // rate/volume/matrix/next-track: zeros
    bb.putInt(8 + 92).put("trak".getBytes("US-ASCII"))
    bb.putInt(92).put("tkhd".getBytes("US-ASCII"))
      .putInt(0)                        // version 0 + flags
      .position(bb.position() + 72)     // creation..matrix: zeros
    bb.putInt(width << 16).putInt(height << 16)
    bb.array()
  }

  /** Minimal BMP header (BITMAPFILEHEADER + BITMAPINFOHEADER) declaring a
    * `width`×`height` 24-bit image. Pixel data is omitted — the imageio
    * probe reads only the header, which is the point being exercised. */
  def bmpBytes(width: Int, height: Int): Array[Byte] = {
    val rowBytes = (width * 3 + 3) / 4 * 4
    val bb = java.nio.ByteBuffer.allocate(54)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
      .putInt(54 + rowBytes * height).putInt(0).putInt(54)
    bb.putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(24)         // planes, bpp
      .putInt(0).putInt(rowBytes * height) // BI_RGB, image size
      .putInt(0).putInt(0).putInt(0).putInt(0)
    bb.array()
  }

  /** Synthetic but REAL media corpus derived from the documents fixture:
    * each doc becomes a genuine WAV / MP4 / BMP whose header encodes sizes
    * derived from the text's byte length, so a SQL oracle can recompute the
    * decoded features from `strlen(text)` alone (q101). The bytes flow
    * through the same binary-column + mapPartitions path as real media. */
  def syntheticAssets(spark: SparkSession, sfDir: String): Dataset[Asset] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"), col("lang"))
      .as[(Long, String, String, String)]
      .mapPartitions(_.map { case (id, text, source, lang) =>
        val payload = text.getBytes("UTF-8")
        val l = payload.length
        val media = (id % 3) match {
          case 0 => bmpBytes(l % 100 + 1, l % 50 + 1)
          case 1 => wavBytes(payload) // duration_ms = l * 1000 / 8000
          case _ => mp4Bytes(l.toLong, l % 320 + 1, l % 240 + 1)
        }
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        Asset(id, kind, media, Map("source" -> source, "lang" -> lang))
      })
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
