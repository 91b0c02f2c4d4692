package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One multimodal record: an opaque binary payload plus typed metadata —
  * the storage shape for image/audio/video columns at corpus scale
  * (payloads stay binary; all planning happens on metadata columns so
  * scans prune payload bytes unless a stage actually decodes).
  */
final case class MediaRecord(
    media_id: Long,
    media_type: String, // image | audio | video
    width: Int,
    height: Int,
    duration_ms: Int,
    payload: Array[Byte]
)

final case class MediaFeatures(
    media_id: Long,
    media_type: String,
    n_bytes: Int,
    byte_mean: Double,
    n_frames: Int,
    feature: Array[Float]
)

/** Multimodal-column plumbing: schema, partition-friendly batch decode,
  * frame sampling. The Spark side — binary columns, typed Datasets,
  * mapPartitions batch shape (the JVM analog of a vectorized pandas UDF)
  * — is real and tested. Image payloads get a REAL decode via the JDK's
  * [[ImageCodec]] (PNG/BMP/GIF/JPEG) and audio payloads via the JDK's
  * [[AudioCodec]] (16-bit PCM WAV) — both value-level-tested in
  * MultimodalSpec and oracle-checked; video codecs (and compressed audio)
  * are not available in this environment, so those payloads take
  * [[decodeStub]], which derives deterministic features from the raw
  * bytes and marks where a JNI/FFI decoder would slot in.
  */
object Multimodal {

  /** Derive a deterministic media table from the documents table: the
    * UTF-8 text bytes stand in for an encoded payload; metadata comes
    * from the id. Mirrors the PipelineQueries oracle.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("media_type"),
      (lit(64) + (col("doc_id") % 16) * 16).cast("int").as("width"),
      (lit(64) + (col("doc_id") % 9) * 16).cast("int").as("height"),
      ((col("doc_id") % 120) * 250).cast("int").as("duration_ms"),
      col("text").cast("binary").as("payload"))

  /** STUB decode: a real implementation would invoke an image/audio
    * decoder here, per partition, reusing one codec instance across the
    * batch (that is the entire point of the mapPartitions shape). The
    * deterministic stand-in summarizes raw bytes so tests exercise the
    * full plumbing: payload bytes -> per-record feature vector.
    */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val bytes = r.payload
    val n = bytes.length
    val mean = if (n == 0) 0.0 else bytes.map(b => (b & 0xff).toDouble).sum / n
    // fake 8-dim "embedding": byte histogram over 8 buckets, normalized
    val hist = new Array[Float](8)
    bytes.foreach(b => hist((b & 0xff) / 32) += 1f)
    val total = math.max(1f, hist.sum)
    MediaFeatures(r.media_id, r.media_type, n, mean,
      nFrames(r), hist.map(_ / total))
  }

  /** Real decode for image and audio records: image payloads that parse
    * as PNG/BMP/GIF/JPEG (JDK [[ImageCodec]]) yield pixel-derived
    * features — mean luma + luma histogram; audio payloads that parse as
    * 16-bit PCM WAV (JDK [[AudioCodec]]) yield sample-derived features —
    * mean absolute amplitude + amplitude histogram. Everything else
    * (video, compressed audio, corrupt bytes, and the synthetic text-byte
    * fixtures) falls back to [[decodeStub]].
    */
  def decodeRecord(r: MediaRecord): MediaFeatures = r.media_type match {
    case "image" =>
      ImageCodec.decode(r.payload)
        .map(d => MediaFeatures(r.media_id, r.media_type, r.payload.length,
          d.lumaMean, nFrames(r), d.lumaHist))
        .getOrElse(decodeStub(r))
    case "audio" =>
      // WAV decodes at SAMPLE level (JDK parser). Compressed audio has no
      // JVM codec, but MP3 parses at CONTAINER level ([[AudioCodec
      // .probeMp3]]'s frame walk): n_frames comes from the REAL header
      // count while sample features stay byte-derived (the documented
      // stub) — mirroring the video MP4 route below.
      AudioCodec.decode(r.payload)
        .map(d => MediaFeatures(r.media_id, r.media_type, r.payload.length,
          d.ampMean, nFrames(r), d.ampHist))
        .orElse(AudioCodec.probeMp3(r.payload)
          .map(m => decodeStub(r).copy(n_frames = m.nFrames)))
        .getOrElse(decodeStub(r))
    case "video" =>
      // AVI with uncompressed DIB frames decodes at PIXEL level (RIFF
      // walk + the JDK's BMP reader): mean luma + luma histogram over
      // every frame, frame count from the movi list. MP4 payloads parse
      // at container level ([[VideoCodec.probe]]): the frame count comes
      // from the REAL mvhd duration but pixel features stay byte-derived
      // (no JVM codec for compressed video — the documented stub).
      VideoCodec.decodeAvi(r.payload)
        .map { d =>
          val px = math.max(1L, d.nFrames.toLong * d.width * d.height)
          MediaFeatures(r.media_id, r.media_type, r.payload.length,
            d.lumaSum1000.toDouble / (1000.0 * px), d.nFrames,
            d.lumaHist.map(c => (c.toDouble / px).toFloat))
        }
        .orElse(VideoCodec.probe(r.payload)
          .map(m => decodeStub(r)
            .copy(n_frames = math.max(1L, m.durationMs / 1000L).toInt)))
        .getOrElse(decodeStub(r))
    case _ => decodeStub(r)
  }

  /** Frame count a sampler would extract: one frame per second of video,
    * 1 for stills.
    */
  def nFrames(r: MediaRecord): Int =
    if (r.media_type == "video") math.max(1, r.duration_ms / 1000) else 1

  /** Sample up to `n` evenly-spaced "frames" (payload slices stand in for
    * decoded frames). Real codecs plug into the slice step.
    */
  def sampleFrames(payload: Array[Byte], n: Int): Seq[Array[Byte]] = {
    if (payload.isEmpty || n <= 0) Seq.empty
    else {
      val frame = math.max(1, payload.length / n)
      (0 until math.min(n, payload.length / frame)).map { i =>
        payload.slice(i * frame, math.min((i + 1) * frame, payload.length))
      }
    }
  }

  /** Batch nearest-neighbor resize over an image table — the
    * thumbnail/normalization stage of a multimodal ingest, on the same
    * mapPartitions boundary as [[extractFeatures]]. Output:
    * (media_id, src_w, src_h, pixels) with `pixels` the packed-RGB
    * row-major [[ImageCodec.resizeNearest]] result; undecodable
    * payloads yield a null pixel array (and −1 dims) rather than
    * failing the batch.
    */
  def resizeImages(spark: SparkSession, media: DataFrame,
      idCol: String, payloadCol: String, w: Int, h: Int): DataFrame = {
    import spark.implicits._
    media
      .select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          ImageCodec.readImage(payload) match {
            case Some(bi) =>
              (id, bi.getWidth, bi.getHeight,
                ImageCodec.resizeNearest(bi, w, h))
            case None => (id, -1, -1, null: Array[Int])
          }
        }
      }
      .toDF("media_id", "src_w", "src_h", "pixels")
  }

  /** Frame-windowed audio energy (the VAD / energy-gate feature stage):
    * decode 16-bit PCM ([[AudioCodec.decodeSamples]]), split into
    * non-overlapping `frameSamples` windows, and emit per frame the
    * exact-integer |sample| sum and peak — integer algebra end to end so
    * the stage is value-replayable (the q71 lesson: float RMS would
    * drift across engines; Σ|s| and max|s| cannot). Row-local fan-out on
    * the mapPartitions boundary, zero shuffle; undecodable payloads
    * contribute no frames.
    */
  def audioFrameEnergies(spark: SparkSession, media: DataFrame,
      idCol: String, payloadCol: String, frameSamples: Int): DataFrame = {
    import spark.implicits._
    require(frameSamples > 0, "frameSamples must be positive")
    media
      .select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        AudioCodec.decodeSamples(payload) match {
          case Some(s) =>
            s.grouped(frameSamples).zipWithIndex.map { case (fr, i) =>
              var sum = 0L
              var peak = 0
              fr.foreach { v =>
                val a = math.abs(v.toInt)
                sum += a
                if (a > peak) peak = a
              }
              (id, i, fr.length, sum, peak)
            }
          case None => Iterator.empty
        }
      }
      .toDF("media_id", "frame_idx", "n_in_frame", "abs_sum", "peak")
  }

  /** Batch feature extraction over the media table — the mapPartitions
    * boundary keeps (hypothetical) codec initialization per-partition,
    * not per-row, and the batch shape matches a vectorized UDF's.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // per-partition codec init would go here (ImageIO is stateless;
      // a JNI decoder would allocate its native context at this point)
      it.map(decodeRecord)
    }
  }
}
