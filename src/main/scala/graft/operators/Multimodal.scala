package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Multimodal (binary) column handling: opaque `binary` payloads with
  * typed metadata flow through a `mapPartitions` batch stage (the Scala
  * analog of a `mapInPandas` batch UDF: one iterator per partition,
  * amortized per-partition setup, output schema declared up front).
  * Partitioning stays whatever the upstream scan chose; nothing here
  * shuffles.
  *
  * The decode step is REAL: container sniffing by magic bytes
  * (png/jpeg/gif/bmp) and a javax.imageio decode for width / height /
  * channel count — the JDK's own codecs, present on any executor.
  * Payloads that are not images (or fail to decode) keep their byte
  * length + digest with NULL image fields, the soft-failure contract a
  * 100 TB media crawl needs (a corrupt file must not kill the stage).
  * Audio and video containers ride the same sniff→decode seam with
  * dependency-free header parses: RIFF/WAVE chunk walks (channels /
  * sample rate / frame count) and ISO-BMFF box walks (movie duration /
  * track count). Sample-level audio decode and video frame extraction
  * would need external codec libraries; the container metadata layer —
  * what a 100 TB crawl filter actually groups and prunes on — is real.
  */
object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("content_digest", StringType, nullable = false),
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("n_frames", LongType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("n_tracks", IntegerType, nullable = true)))

  /** Magic-byte container sniff — cheap rejection before any decode. */
  private def sniff(b: Array[Byte]): Option[String] =
    if (b.length >= 8 && b(0) == 0x89.toByte && b(1) == 'P' &&
        b(2) == 'N' && b(3) == 'G') Some("png")
    else if (b.length >= 2 && b(0) == 0xFF.toByte && b(1) == 0xD8.toByte)
      Some("jpeg")
    else if (b.length >= 4 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8') Some("gif")
    else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') Some("bmp")
    else if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' &&
        b(11) == 'E') Some("wav")
    else if (b.length >= 12 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' &&
        b(7) == 'p') Some("mp4")
    else None

  /** (channels, sampleRate, nFrames) from a RIFF/WAVE payload, walking
    * the chunk list (fmt may not precede data, unknown chunks skip).
    * Truncated or malformed containers yield None — the same soft-fail
    * contract as a corrupt image. */
  private def parseWav(b: Array[Byte]): Option[(Int, Int, Long)] = {
    val buf = java.nio.ByteBuffer.wrap(b).order(
      java.nio.ByteOrder.LITTLE_ENDIAN)
    var pos = 12 // past RIFF<size>WAVE
    var chans = -1; var rate = -1; var blockAlign = -1; var dataLen = -1L
    while (pos + 8 <= b.length && (chans < 0 || dataLen < 0)) {
      val cid = new String(b, pos, 4, "US-ASCII")
      val clen = buf.getInt(pos + 4).toLong & 0xFFFFFFFFL
      if (cid == "fmt " && pos + 24 <= b.length) {
        chans = buf.getShort(pos + 10) & 0xFFFF
        rate = buf.getInt(pos + 12)
        blockAlign = buf.getShort(pos + 20) & 0xFFFF
      } else if (cid == "data") dataLen = clen
      // word-aligned advance; a corrupt length past the buffer ends the walk
      if (clen > b.length.toLong) pos = b.length
      else pos += 8 + clen.toInt + (clen.toInt & 1)
    }
    if (chans > 0 && rate > 0 && blockAlign > 0 && dataLen >= 0)
      Some((chans, rate, dataLen / blockAlign))
    else None
  }

  /** (durationMs, nTracks) from an ISO-BMFF (MP4/MOV) payload: walk the
    * top-level box list to `moov`, then its children — `mvhd` (version 0
    * and 1 layouts) for timescale + duration, counting `trak` boxes.
    * Handles 64-bit largesize (size==1) and to-end boxes (size==0);
    * malformed sizes or truncation yield None — the same soft-fail
    * contract as the other containers. */
  private def parseMp4(b: Array[Byte]): Option[(Long, Int)] = {
    val buf = java.nio.ByteBuffer.wrap(b) // ISO-BMFF is big-endian
    def u32(p: Int): Long = buf.getInt(p).toLong & 0xFFFFFFFFL
    // (type, payloadStart, boxEnd); boxEnd is also the next sibling
    def box(pos: Int, limit: Int): Option[(String, Int, Int)] = {
      if (pos + 8 > limit) return None
      val sz = u32(pos)
      val typ = new String(b, pos + 4, 4, "US-ASCII")
      val (hdr, size) =
        if (sz == 1L) {
          if (pos + 16 > limit) return None
          (16L, buf.getLong(pos + 8))
        } else if (sz == 0L) (8L, (limit - pos).toLong)
        else (8L, sz)
      if (size < hdr || pos + size > limit) None
      else Some((typ, pos + hdr.toInt, pos + size.toInt))
    }
    var pos = 0
    val limit = b.length
    var moov: Option[(Int, Int)] = None
    while (pos < limit && moov.isEmpty) box(pos, limit) match {
      case Some(("moov", ps, pe)) => moov = Some((ps, pe))
      case Some((_, _, nx)) => pos = nx
      case None => pos = limit
    }
    moov.flatMap { case (ms, me) =>
      var p = ms
      var tracks = 0
      var durMs = -1L
      while (p < me) box(p, me) match {
        case Some(("trak", _, nx)) => tracks += 1; p = nx
        case Some(("mvhd", ps, pe)) =>
          val ver = if (pe > ps) b(ps) & 0xFF else -1
          if (ver == 1 && pe - ps >= 32) {
            // v1: ver/flags(4) creation(8) modification(8) ts(4) dur(8)
            val ts = u32(ps + 20); val dur = buf.getLong(ps + 24)
            if (ts > 0 && dur >= 0) durMs = dur * 1000L / ts
          } else if (ver == 0 && pe - ps >= 20) {
            // v0: ver/flags(4) creation(4) modification(4) ts(4) dur(4)
            val ts = u32(ps + 12); val dur = u32(ps + 16)
            if (ts > 0) durMs = dur * 1000L / ts
          }
          p = pe
        case Some((_, _, nx)) => p = nx
        case None => p = me
      }
      if (durMs >= 0) Some((durMs, tracks)) else None
    }
  }

  private def decode(id: Long, payload: Array[Byte],
      md: java.security.MessageDigest): Row = {
    md.reset()
    val digest = md.digest(payload).map("%02x".format(_)).mkString
    val n = payload.length.toLong
    sniff(payload) match {
      case Some("wav") =>
        (try parseWav(payload)
         catch { case scala.util.control.NonFatal(_) => None }) match {
          case Some((ch, rate, frames)) =>
            Row(id, n, digest, "wav", null, null, ch, rate, frames, null, null)
          case None =>
            Row(id, n, digest, "wav", null, null, null, null, null, null, null)
        }
      case Some("mp4") =>
        (try parseMp4(payload)
         catch { case scala.util.control.NonFatal(_) => None }) match {
          case Some((durMs, tracks)) =>
            Row(id, n, digest, "mp4", null, null, null, null, null, durMs,
              tracks)
          case None =>
            Row(id, n, digest, "mp4", null, null, null, null, null, null, null)
        }
      case Some(fmt) =>
        val img =
          try ImageIO.read(new ByteArrayInputStream(payload))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null)
          Row(id, n, digest, fmt, null, null, null, null, null, null, null)
        else Row(id, n, digest, fmt, img.getWidth, img.getHeight,
          img.getColorModel.getNumComponents, null, null, null, null)
      case None =>
        Row(id, n, digest, null, null, null, null, null, null, null, null)
    }
  }

  /** Batch feature extraction over a binary column: mapPartitions with
    * per-partition codec setup (digest instance, ImageIO memory-cache
    * mode) — the shape any real media decode stage takes. */
  def extractFeatures(binDf: DataFrame, idCol: String = "doc_id",
      binCol: String = "payload"): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(featureSchema))
    binDf.select(col(idCol).cast(LongType), col(binCol))
      .mapPartitions { rows =>
        // per-partition setup happens once (real codecs are expensive)
        ImageIO.setUseCache(false) // no temp-file spooling on executors
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map(r => decode(r.getLong(0), r.getAs[Array[Byte]](1), md))
      }(enc)
  }

  private val resizedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  /** Integer-exact resize dimensions: downscale so max(w,h) == maxDim,
    * aspect preserved with floor division, never below 1px, never
    * upscale. Pure integer math so an external oracle can reproduce the
    * expected dimensions without an image library. */
  def resizedDims(w: Int, h: Int, maxDim: Int): (Int, Int) = {
    val maxSide = math.max(w, h)
    if (maxSide <= maxDim) (w, h)
    else (math.max(1, w * maxDim / maxSide),
          math.max(1, h * maxDim / maxSide))
  }

  /** REAL image resize in the same mapPartitions batch stage: decode
    * (JDK codecs), Java2D scale to [[resizedDims]], re-encode PNG.
    * Non-image or corrupt payloads soft-fail to NULL payload/dims — a
    * 100 TB crawl's resize stage must never die on one bad file. The
    * stage is shuffle-free; partitioning stays whatever the scan chose. */
  def resizeImages(binDf: DataFrame, maxDim: Int,
      idCol: String = "doc_id", binCol: String = "payload"): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(resizedSchema))
    binDf.select(col(idCol).cast(LongType), col(binCol))
      .mapPartitions { rows =>
        ImageIO.setUseCache(false)
        rows.map { r =>
          val id = r.getLong(0)
          val img =
            try ImageIO.read(new ByteArrayInputStream(r.getAs[Array[Byte]](1)))
            catch { case scala.util.control.NonFatal(_) => null }
          if (img == null) Row(id, null, null, null)
          else {
            val (nw, nh) = resizedDims(img.getWidth, img.getHeight, maxDim)
            val scaled =
              new BufferedImage(nw, nh, BufferedImage.TYPE_3BYTE_BGR)
            val g = scaled.createGraphics()
            g.drawImage(img, 0, 0, nw, nh, null)
            g.dispose()
            val out = new ByteArrayOutputStream()
            ImageIO.write(scaled, "png", out)
            Row(id, out.toByteArray, nw, nh)
          }
        }
      }(enc)
  }

  /** Build a binary-payload table from text (an opaque-binary column for
    * the non-image path: sniff misses, byte metadata still flows). */
  def binaryFromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"))

  private val payloadSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** Deterministic real-PNG fixture: for each id, renders a
    * `(8 + id % 32) × (8 + id*7 % 32)` RGB image with id-derived pixels
    * and encodes it through the JDK PNG codec. The decode oracle is then
    * pure arithmetic on the id — DuckDB can check the stored dimensions
    * without any image library. */
  def syntheticImages(df: DataFrame, idCol: String): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(payloadSchema))
    // pixel fill + PNG encode is per-row CPU work: a single-file scan
    // would serialize it on one core (Par.ensure no-ops when parallel)
    Par.ensure(df, col(idCol)).select(col(idCol).cast(LongType).as("doc_id"))
      .mapPartitions { rows =>
        ImageIO.setUseCache(false)
        rows.map { r =>
          val id = r.getLong(0)
          val w = (8 + Math.floorMod(id, 32L)).toInt
          val h = (8 + Math.floorMod(id * 7, 32L)).toInt
          val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              img.setRGB(x, y, ((id + x * 31 + y * 17) & 0xFFFFFF).toInt)
              x += 1
            }
            y += 1
          }
          val out = new ByteArrayOutputStream()
          ImageIO.write(img, "png", out)
          Row(id, out.toByteArray)
        }
      }(enc)
  }

  /** Deterministic real-WAV fixture: for each id, a PCM RIFF/WAVE
    * container with `1 + id % 2` channels, `8000 + (id % 5) * 4000` Hz,
    * 16-bit samples, `50 + (id * 11) % 200` frames, assembled per the
    * public RIFF layout (fmt + data chunks). The decode oracle is pure
    * arithmetic on the id — DuckDB checks channels/rate/frames without
    * any audio library. */
  def syntheticWavs(df: DataFrame, idCol: String): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(payloadSchema))
    // container assembly is per-row CPU work (see syntheticImages)
    Par.ensure(df, col(idCol)).select(col(idCol).cast(LongType).as("doc_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val chans = (1 + Math.floorMod(id, 2L)).toInt
          val rate = (8000 + Math.floorMod(id, 5L) * 4000).toInt
          val frames = (50 + Math.floorMod(id * 11, 200L)).toInt
          val blockAlign = chans * 2 // 16-bit PCM
          val dataLen = frames * blockAlign
          val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
            .put("WAVE".getBytes("US-ASCII"))
          buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
            .putShort(1).putShort(chans.toShort).putInt(rate)
            .putInt(rate * blockAlign).putShort(blockAlign.toShort)
            .putShort(16)
          buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
          var i = 0
          while (i < frames * chans) { // id-derived PCM samples
            buf.putShort(((id * 131 + i * 7) & 0x7FFF).toShort)
            i += 1
          }
          Row(id, buf.array())
        }
      }(enc)
  }

  /** Deterministic real-MP4 fixture: for each id, an ISO-BMFF container
    * (ftyp + free + moov[mvhd + traks] + mdat) with `1 + id % 3` tracks,
    * timescale `250 << (id % 3)`, movie duration chosen so
    * duration_ms = 4 * (20 + (id*13) % 480) exactly, and the mvhd
    * version alternating 0/1 by id parity so both public layouts are
    * exercised. The decode oracle is pure arithmetic on the id — DuckDB
    * checks duration/tracks/bytes with no video library. */
  def syntheticMp4s(df: DataFrame, idCol: String): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(payloadSchema))
    // container assembly is per-row CPU work (see syntheticImages)
    Par.ensure(df, col(idCol)).select(col(idCol).cast(LongType).as("doc_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val nTracks = (1 + Math.floorMod(id, 3L)).toInt
          val v1 = Math.floorMod(id, 2L) == 1L
          val timescale = 250 << Math.floorMod(id, 3L).toInt // 250/500/1000
          val m = 20 + Math.floorMod(id * 13, 480L)
          val durUnits = m * (timescale / 250) // durMs = m*1000/250 = 4m
          val mdatLen = (32 + Math.floorMod(id, 64L)).toInt
          val mvhdSize = if (v1) 120 else 108
          val moovSize = 8 + mvhdSize + nTracks * 8
          val buf = java.nio.ByteBuffer.allocate(20 + 12 + moovSize +
            8 + mdatLen) // big-endian per spec
          def fourcc(s: String): Unit = { buf.put(s.getBytes("US-ASCII")); () }
          buf.putInt(20); fourcc("ftyp"); fourcc("isom")
          buf.putInt(0); fourcc("iso2")
          buf.putInt(12); fourcc("free"); buf.putInt(0)
          buf.putInt(moovSize); fourcc("moov")
          buf.putInt(mvhdSize); fourcc("mvhd")
          if (v1) {
            buf.putInt(0x01000000) // version 1, flags 0
            buf.putLong(0L).putLong(0L) // creation, modification
            buf.putInt(timescale).putLong(durUnits)
          } else {
            buf.putInt(0)
            buf.putInt(0).putInt(0)
            buf.putInt(timescale).putInt(durUnits.toInt)
          }
          buf.putInt(0x00010000).putShort(0x0100.toShort).putShort(0)
          buf.putLong(0L) // rate, volume, reserved
          // identity matrix (9 × u32) + 6 pre_defined zeros
          Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
            .foreach(buf.putInt)
          (1 to 6).foreach(_ => buf.putInt(0))
          buf.putInt(nTracks + 1) // next_track_ID
          (1 to nTracks).foreach { _ => buf.putInt(8); fourcc("trak") }
          buf.putInt(8 + mdatLen); fourcc("mdat")
          var i = 0
          while (i < mdatLen) { // id-derived media bytes
            buf.put(((id * 37 + i * 11) & 0xFF).toByte)
            i += 1
          }
          Row(id, buf.array())
        }
      }(enc)
  }
}
