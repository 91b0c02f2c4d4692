package graft.pipeline

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** Pure-JVM ISO-BMFF (MP4) container metadata parser — the video analog
  * of [[AudioCodec]]/[[ImageCodec]] at the only level this environment
  * can reach honestly: no JVM ships a video *codec*, but the MP4
  * container is plain big-endian byte structure, so duration, timescale,
  * track layout and codec fourccs are all decodable at value level
  * without any native library. Frame pixel decode stays behind the
  * documented stub ([[Multimodal.decodeStub]]).
  *
  * [[probe]] is a generic box walker: it consumes `[size:u32][type:4cc]`
  * headers (with the 64-bit `size==1` largesize and `size==0`
  * to-end-of-enclosure forms), skips unknown boxes, and descends only
  * the standard container chain `moov → trak → mdia → minf → stbl`. It
  * shares NO layout constants with [[encodeMp4]] — the encoder writes
  * fixed spec-shaped buffers, the decoder walks structure — so an
  * encode-side bug cannot silently cancel a decode-side one
  * (MultimodalSpec additionally pins the decoder against hand-planted
  * raw byte sequences).
  */
object VideoCodec {

  /** Container-level metadata of one MP4 payload. All integers exact:
    * `durationMs = durationUnits * 1000 / timescale` (floor).
    */
  final case class VideoMeta(
      majorBrand: String,
      timescale: Long,
      durationUnits: Long,
      durationMs: Long,
      trackCount: Int,
      videoCodec: String, // first 'vide' track's sample-entry fourcc, "" if none
      audioTracks: Int)

  // ---- encode: the fixture side ------------------------------------------

  private def fourcc(s: String): Array[Byte] = {
    require(s.length == 4, s"fourcc must be 4 chars: '$s'")
    s.getBytes(StandardCharsets.US_ASCII)
  }

  private def box(typ: String, payload: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(8 + payload.length)
    b.putInt(8 + payload.length)
    b.put(fourcc(typ))
    b.put(payload)
    b.array()
  }

  private def concat(parts: Array[Byte]*): Array[Byte] = {
    val out = ByteBuffer.allocate(parts.map(_.length).sum)
    parts.foreach(out.put)
    out.array()
  }

  /** Spec-shaped `mvhd`: version 0 (32-bit duration) or 1 (64-bit),
    * full reserved/matrix tail so the box has its real size.
    */
  private def mvhd(version: Int, timescale: Long, duration: Long): Array[Byte] = {
    val payload =
      if (version == 0) {
        val b = ByteBuffer.allocate(100)
        b.putInt(0) // version 0 + flags
        b.putInt(0).putInt(0) // creation, modification
        b.putInt(timescale.toInt)
        b.putInt(duration.toInt)
        b.putInt(0x00010000) // rate 1.0
        // volume + reserved + matrix + pre_defined + next_track_ID
        b.position(b.position() + 72)
        b.putInt(0xFFFFFFFF)
        b.array()
      } else {
        val b = ByteBuffer.allocate(112)
        b.putInt(0x01000000) // version 1 + flags
        b.putLong(0L).putLong(0L) // creation, modification (64-bit)
        b.putInt(timescale.toInt)
        b.putLong(duration)
        b.putInt(0x00010000)
        b.position(b.position() + 72)
        b.putInt(0xFFFFFFFF)
        b.array()
      }
    box("mvhd", payload)
  }

  private def hdlr(handler: String): Array[Byte] = {
    val b = ByteBuffer.allocate(25)
    b.putInt(0) // version + flags
    b.putInt(0) // pre_defined
    b.put(fourcc(handler))
    b.putInt(0).putInt(0).putInt(0) // reserved
    b.put(0.toByte) // empty NUL name
    box("hdlr", b.array())
  }

  private def stsd(format: String): Array[Byte] = {
    // one minimal sample entry: size + format + 6 reserved + data_ref_index
    val entry = ByteBuffer.allocate(16)
    entry.putInt(16)
    entry.put(fourcc(format))
    entry.putInt(0).putShort(0.toShort) // reserved(6)
    entry.putShort(1.toShort) // data_reference_index
    val b = ByteBuffer.allocate(8 + 16)
    b.putInt(0) // version + flags
    b.putInt(1) // entry_count
    b.put(entry.array())
    box("stsd", b.array())
  }

  private def trak(handler: String, format: String): Array[Byte] =
    box("trak",
      box("mdia", concat(
        hdlr(handler),
        box("minf", box("stbl", stsd(format))))))

  /** Minimal-but-honest MP4: `ftyp`, a `free` box (walkers must skip
    * unknowns), and `moov{ mvhd, trak* }`. Tracks are (handler, codec
    * fourcc) pairs in order.
    */
  def encodeMp4(
      majorBrand: String, mvhdVersion: Int,
      timescale: Long, duration: Long,
      tracks: Seq[(String, String)]): Array[Byte] = {
    val ftyp = box("ftyp", concat(
      fourcc(majorBrand), Array[Byte](0, 0, 2, 0), fourcc("isom"), fourcc("mp41")))
    val free = box("free", Array.fill[Byte](12)(0))
    val moov = box("moov", concat(
      (mvhd(mvhdVersion, timescale, duration) +:
        tracks.map { case (h, f) => trak(h, f) }): _*))
    concat(ftyp, free, moov)
  }

  // ---- decode: the generic box walker --------------------------------------

  private def u32(bytes: Array[Byte], off: Int): Long =
    ((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
      ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)

  private def u64(bytes: Array[Byte], off: Int): Long =
    (u32(bytes, off) << 32) | u32(bytes, off + 4)

  private def typ4(bytes: Array[Byte], off: Int): String =
    new String(bytes, off, 4, StandardCharsets.US_ASCII)

  /** Visit each box in `[start, end)`: (type, payloadStart, payloadEnd). */
  private def walk(bytes: Array[Byte], start: Int, end: Int)(
      visit: (String, Int, Int) => Unit): Unit = {
    var off = start
    while (off + 8 <= end) {
      val size32 = u32(bytes, off)
      val typ = typ4(bytes, off + 4)
      val (payloadStart, boxEnd) =
        if (size32 == 1L) {
          if (off + 16 > end) return
          val sz = u64(bytes, off + 8)
          if (sz < 16 || off + sz > end) return
          (off + 16, off + sz.toInt)
        } else if (size32 == 0L) (off + 8, end) // extends to enclosure end
        else {
          if (size32 < 8 || off + size32 > end) return
          (off + 8, off + size32.toInt)
        }
      visit(typ, payloadStart, boxEnd)
      if (size32 == 0L) return // last box in this enclosure
      off = boxEnd
    }
  }

  private final class TrackInfo {
    var handler: String = ""
    var format: String = ""
  }

  /** Descend `trak → mdia → {hdlr, minf → stbl → stsd}`. */
  private def parseTrack(bytes: Array[Byte], start: Int, end: Int): TrackInfo = {
    val t = new TrackInfo
    walk(bytes, start, end) { (typ, ms, me) =>
      if (typ == "mdia") walk(bytes, ms, me) { (mt, hs, he) =>
        if (mt == "hdlr") {
          // version/flags(4) pre_defined(4) handler_type(4)
          if (hs + 12 <= he) t.handler = typ4(bytes, hs + 8)
        } else if (mt == "minf") walk(bytes, hs, he) { (ft, ss, se) =>
          if (ft == "stbl") walk(bytes, ss, se) { (st, ds, de) =>
            // version/flags(4) entry_count(4) entry{size(4) format(4cc)}
            if (st == "stsd" && ds + 16 <= de && u32(bytes, ds + 4) >= 1L)
              t.format = typ4(bytes, ds + 12)
          }
        }
      }
    }
    t
  }

  /** Parse container metadata, or None when the bytes are not ISO-BMFF
    * (no leading well-formed `ftyp`, or no `moov`/`mvhd`).
    */
  def probe(bytes: Array[Byte]): Option[VideoMeta] = {
    if (bytes == null || bytes.length < 16) return None
    var brand: String = null
    var timescale = 0L
    var duration = -1L
    val tracks = scala.collection.mutable.ArrayBuffer.empty[TrackInfo]
    // ftyp must be the first box (ISO 14496-12 §4.3: placed as early as
    // possible; in practice first) — this is also what keeps arbitrary
    // text payloads from "parsing"
    if (u32(bytes, 0) < 16 || typ4(bytes, 4) != "ftyp") return None
    walk(bytes, 0, bytes.length) { (typ, s, e) =>
      if (typ == "ftyp") {
        if (brand == null && s + 4 <= e) brand = typ4(bytes, s)
      } else if (typ == "moov") walk(bytes, s, e) { (mt, ms, me) =>
        if (mt == "mvhd") {
          if (ms + 4 <= me) {
            val version = bytes(ms) & 0xff
            if (version == 0 && ms + 20 <= me) {
              timescale = u32(bytes, ms + 12)
              duration = u32(bytes, ms + 16)
            } else if (version == 1 && ms + 32 <= me) {
              timescale = u32(bytes, ms + 20)
              duration = u64(bytes, ms + 24)
            }
          }
        } else if (mt == "trak") tracks += parseTrack(bytes, ms, me)
      }
    }
    if (brand == null || timescale <= 0L || duration < 0L) None
    else Some(VideoMeta(
      majorBrand = brand,
      timescale = timescale,
      durationUnits = duration,
      durationMs = duration * 1000L / timescale,
      trackCount = tracks.size,
      videoCodec = tracks.find(_.handler == "vide").map(_.format).getOrElse(""),
      audioTracks = tracks.count(_.handler == "soun")))
  }

  // ---- AVI / uncompressed-DIB frames: real pixel-level video decode ------
  //
  // The one video format a bare JVM CAN decode at pixel level: AVI is a
  // RIFF container (same family as WAV) and uncompressed 24-bpp DIB
  // frames are BMP pixel arrays, which `javax.imageio` reads. Like the
  // WAV path, the encoder below is a hand-rolled fixture writer while the
  // decoder goes through a generic RIFF walker + the JDK's BMP reader, so
  // an encode-side bug cannot cancel a decode-side one.

  /** Pixel-exact summary of a decoded AVI: header fields from `avih`/
    * `strh`, frames counted from the `movi` list, and integer luma stats
    * (luma1000 = 299r + 587g + 114b per pixel — exact integers, no float
    * rounding) over every decoded frame.
    */
  final case class DecodedAvi(
      width: Int,
      height: Int,
      usPerFrame: Int,
      handler: String,
      nFrames: Int,
      lumaSum1000: Long,
      lumaHist: Array[Long]) // 8 buckets of min(7, luma1000 / 32000)

  private def leFourcc(b: ByteBuffer, s: String): Unit =
    b.put(s.getBytes(StandardCharsets.US_ASCII))

  private def writeAvi(
      frames: Seq[Array[Byte]], chunkId: String, handler: String,
      biCompression: Int, w: Int, h: Int, usPerFrame: Int,
      bufSize: Int): Array[Byte] = {
    val n = frames.length
    val moviSize = 4 + frames.map(f => 8 + f.length + (f.length & 1)).sum
    val hdrlSize = 4 + 64 + 12 + 64 + 48 // 'hdrl' + avih + LIST strl hdr + strh + strf
    val total = 12 + (8 + hdrlSize) + (8 + moviSize)
    val b = ByteBuffer.allocate(total).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    leFourcc(b, "RIFF"); b.putInt(total - 8); leFourcc(b, "AVI ")
    leFourcc(b, "LIST"); b.putInt(hdrlSize); leFourcc(b, "hdrl")
    leFourcc(b, "avih"); b.putInt(56)
    b.putInt(usPerFrame); b.putInt(0); b.putInt(0); b.putInt(0)
    b.putInt(n); b.putInt(0); b.putInt(1); b.putInt(bufSize)
    b.putInt(w); b.putInt(h)
    (0 until 4).foreach(_ => b.putInt(0))
    leFourcc(b, "LIST"); b.putInt(4 + 64 + 48); leFourcc(b, "strl")
    leFourcc(b, "strh"); b.putInt(56)
    leFourcc(b, "vids"); leFourcc(b, handler)
    b.putInt(0); b.putShort(0); b.putShort(0); b.putInt(0)
    b.putInt(usPerFrame); b.putInt(1000000) // scale, rate (rate/scale fps-ish)
    b.putInt(0); b.putInt(n); b.putInt(bufSize); b.putInt(-1)
    b.putInt(0)
    b.putShort(0); b.putShort(0); b.putShort(w.toShort); b.putShort(h.toShort)
    leFourcc(b, "strf"); b.putInt(40)
    b.putInt(40); b.putInt(w); b.putInt(h); b.putShort(1); b.putShort(24)
    b.putInt(biCompression); b.putInt(bufSize); b.putInt(0); b.putInt(0)
    b.putInt(0); b.putInt(0)
    leFourcc(b, "LIST"); b.putInt(moviSize); leFourcc(b, "movi")
    frames.foreach { f =>
      leFourcc(b, chunkId); b.putInt(f.length); b.put(f)
      if ((f.length & 1) == 1) b.put(0.toByte) // RIFF word alignment
    }
    b.array()
  }

  /** Minimal canonical AVI around uncompressed 24-bpp bottom-up BGR DIB
    * frames ('00db' chunks). Requires `w % 4 == 0` so rows need no pad
    * bytes. Layout is fixed: 224 + n*(8 + 3*w*h) bytes total.
    */
  def encodeAviDib(
      frames: Seq[Array[Byte]], w: Int, h: Int, usPerFrame: Int): Array[Byte] = {
    require(w % 4 == 0, s"width must be a multiple of 4, got $w")
    require(frames.forall(_.length == 3 * w * h), "frame size mismatch")
    writeAvi(frames, "00db", "DIB ", 0, w, h, usPerFrame, 3 * w * h)
  }

  /** Motion-JPEG AVI: each '00dc' chunk is a self-contained JPEG (the
    * real-world camera/webcam format). Lossy in general (spec-tested
    * with tolerance for color frames), but grayscale frames whose 8×8
    * blocks are uniform round-trip EXACTLY at quality 1.0 (all-ones
    * quant table, DC-only blocks, no color transform) — the
    * exact-integer oracle path for compressed video (q140), alongside
    * the uncompressed DIB form (q78).
    */
  def encodeAviMjpeg(
      jpegFrames: Seq[Array[Byte]], w: Int, h: Int,
      usPerFrame: Int): Array[Byte] = {
    val mjpg = 'M'.toInt | ('J'.toInt << 8) | ('P'.toInt << 16) | ('G'.toInt << 24)
    writeAvi(jpegFrames, "00dc", "MJPG", mjpg, w, h, usPerFrame,
      jpegFrames.foldLeft(0)((a, f) => math.max(a, f.length)))
  }

  private def leU32(bytes: Array[Byte], off: Int): Long =
    (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
      ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)

  /** Wrap a raw DIB (40-byte BITMAPINFOHEADER + pixel rows) as a .bmp
    * file so the JDK's ImageIO BMP reader does the pixel decode.
    */
  private def dibToBmp(info: Array[Byte], pixels: Array[Byte]): Array[Byte] = {
    val total = 14 + info.length + pixels.length
    val b = ByteBuffer.allocate(total).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte); b.put('M'.toByte)
    b.putInt(total); b.putShort(0); b.putShort(0)
    b.putInt(14 + info.length)
    b.put(info); b.put(pixels)
    b.array()
  }

  /** Decode an AVI payload with uncompressed DIB frames, or None when the
    * bytes are not RIFF/AVI or no frame decodes. Generic RIFF chunk walk
    * (shares no offsets with the encoder); pixels via ImageIO.
    */
  def decodeAvi(bytes: Array[Byte]): Option[DecodedAvi] = {
    if (bytes == null || bytes.length < 12) return None
    if (typ4(bytes, 0) != "RIFF" || typ4(bytes, 8) != "AVI ") return None
    var width = 0; var height = 0; var usPerFrame = 0
    var handler = ""
    var strf: Array[Byte] = null
    // (bytes, compressed): 'xxdb' chunks are raw DIB pixel arrays needing
    // the strf header; 'xxdc' chunks are self-contained encoded frames
    // (MJPEG = one JPEG per chunk), which ImageIO reads directly
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Array[Byte], Boolean)]

    def walkRiff(start: Int, end: Int): Unit = {
      var off = start
      while (off + 8 <= end) {
        val id = typ4(bytes, off)
        val size = leU32(bytes, off + 4).toInt
        val body = off + 8
        if (size < 0 || body + size > end) return
        if (id == "LIST" && size >= 4) {
          walkRiff(body + 4, body + size) // skip the list subtype fourcc
        } else if (id == "avih" && size >= 40) {
          usPerFrame = leU32(bytes, body).toInt
          width = leU32(bytes, body + 32).toInt
          height = leU32(bytes, body + 36).toInt
        } else if (id == "strh" && size >= 8 &&
          typ4(bytes, body) == "vids") {
          handler = typ4(bytes, body + 4)
        } else if (id == "strf" && strf == null) {
          strf = java.util.Arrays.copyOfRange(bytes, body, body + size)
        } else if (id.endsWith("db") || id.endsWith("dc")) {
          frames += ((java.util.Arrays.copyOfRange(bytes, body, body + size),
            id.endsWith("dc")))
        }
        off = body + size + (size & 1) // RIFF chunks are word-aligned
      }
    }
    walkRiff(12, bytes.length)
    if (width <= 0 || height <= 0 || strf == null || frames.isEmpty) return None

    val hist = new Array[Long](8)
    var sum = 0L
    var decoded = 0
    frames.foreach { case (f, compressed) =>
      val img =
        if (compressed) ImageCodec.readImage(f)
        else ImageCodec.readImage(dibToBmp(strf, f))
      img.foreach { bi =>
        decoded += 1
        // single-channel (grayscale JPEG) frames read raw raster samples
        // (r=g=b=sample, luma1000 = 1000*sample): getRGB would route the
        // gray value through a color-profile conversion, destroying the
        // exact integer round-trip the gray JPEG path guarantees
        val gray = bi.getColorModel.getNumComponents == 1
        val raster = bi.getRaster
        var y = 0
        while (y < bi.getHeight) {
          var x = 0
          while (x < bi.getWidth) {
            val luma1000 =
              if (gray) 1000 * raster.getSample(x, y, 0)
              else {
                val rgb = bi.getRGB(x, y)
                299 * ((rgb >> 16) & 0xff) +
                  587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)
              }
            sum += luma1000
            hist(math.min(7, luma1000 / 32000)) += 1L
            x += 1
          }
          y += 1
        }
      }
    }
    if (decoded == 0) None
    else Some(DecodedAvi(width, height, usPerFrame, handler, decoded, sum, hist))
  }
}
