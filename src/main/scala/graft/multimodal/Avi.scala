package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM AVI (RIFF) demuxer/muxer for Motion-JPEG video — the real
  * codec behind [[Multimodal.decodeVideo]], replacing the video stub the
  * same way WAV/PCM replaced the audio stub: REAL for one genuine,
  * spec-public format (MJPEG-in-AVI, where every frame payload is a
  * standalone JPEG the JDK's ImageIO decodes), loud failure for
  * everything else (H.264/VP9/… have no JVM codec — external-transcode
  * posture, like compressed DICOM syntaxes beyond our codecs).
  *
  * The AVI RIFF layout is public (Microsoft "AVI RIFF File Reference"):
  * `RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf …)) LIST('movi'
  * 00dc…) [idx1])`, all fields little-endian, chunks padded to even
  * sizes. We read the first 'vids' stream, require an MJPG/JPEG handler,
  * and collect its '00dc'/'00db' chunks (also inside 'rec ' LISTs).
  *
  * Reference scope note: the reference pipeline has no video source at
  * all (SURVEY §2.9 — cine "time" arrives as NIfTI frames); this source
  * belongs to the LLM-training-data brief's multimodal surface.
  */
object Avi {

  /** One demuxed MJPEG video: per-frame JPEG codestreams plus geometry
    * and the header frame rate (rate/scale from 'strh'). */
  final case class Video(width: Int, height: Int, fps: Double,
                         frames: IndexedSeq[Array[Byte]])

  private def fourcc(s: String): Int = {
    val b = s.getBytes("US-ASCII")
    (b(0) & 0xff) | ((b(1) & 0xff) << 8) | ((b(2) & 0xff) << 16) | ((b(3) & 0xff) << 24)
  }
  private val RIFF = fourcc("RIFF"); private val AVI = fourcc("AVI ")
  private val LIST = fourcc("LIST"); private val HDRL = fourcc("hdrl")
  private val STRL = fourcc("strl"); private val MOVI = fourcc("movi")
  private val REC = fourcc("rec ")
  private val STRH = fourcc("strh"); private val STRF = fourcc("strf")
  private val VIDS = fourcc("vids")
  private val MJPG = fourcc("MJPG"); private val Mjpg = fourcc("mjpg")
  private val DMB1 = fourcc("dmb1") // Matrox MJPEG alias

  private def isMjpeg(cc: Int): Boolean = cc == MJPG || cc == Mjpg || cc == DMB1

  /** Demux an MJPEG AVI into its per-frame JPEG payloads. Fails loudly on
    * non-AVI bytes, non-video first stream, or a non-MJPEG codec. */
  def demux(bytes: Array[Byte]): Video = {
    require(bytes.length >= 12, s"AVI stream too short: ${bytes.length}")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bb.getInt(0) == RIFF && bb.getInt(8) == AVI,
      "not a RIFF/AVI container — only MJPEG-in-AVI video decodes in the " +
        "pure JVM; transcode other containers/codecs (ffmpeg) first")
    val end = math.min(bytes.length.toLong, 8L + (bb.getInt(4) & 0xffffffffL)).toInt

    var width = -1; var height = -1
    var rate = 0; var scale = 1
    var videoStream = -1 // index of the first 'vids' stream
    var streamIdx = 0
    var handlerOk = false
    val frames = IndexedSeq.newBuilder[Array[Byte]]

    // returns the id of a '##dc'/'##db' data chunk, or -1
    def dataChunkStream(cc: Int): Int = {
      val d1 = cc & 0xff; val d0 = (cc >> 8) & 0xff
      val suf = ((cc >> 16) & 0xff).toChar.toString + ((cc >> 24) & 0xff).toChar
      if (d1 >= '0' && d1 <= '9' && d0 >= '0' && d0 <= '9' && (suf == "dc" || suf == "db"))
        (d1 - '0') * 10 + (d0 - '0')
      else -1
    }

    def walk(from: Int, to: Int, inStrl: Boolean): Unit = {
      var p = from
      while (p + 8 <= to) {
        val cc = bb.getInt(p)
        val len = bb.getInt(p + 4)
        // Long arithmetic: a hostile len near Int.MaxValue wraps p+8+len
        // negative, sails past an Int bound, and copyOfRange would
        // zero-pad-allocate 2 GB (same class as the DICOM fragment guard)
        require(len >= 0 && p + 8L + len <= bytes.length, s"AVI chunk overruns file at offset $p")
        if (cc == LIST) {
          val kind = bb.getInt(p + 8)
          if (kind == HDRL || kind == MOVI || kind == REC) walk(p + 12, p + 8 + len, inStrl = false)
          else if (kind == STRL) { walk(p + 12, p + 8 + len, inStrl = true); streamIdx += 1 }
        } else if (cc == STRH && inStrl) {
          val fccType = bb.getInt(p + 8)
          if (fccType == VIDS && videoStream < 0) {
            videoStream = streamIdx
            val handler = bb.getInt(p + 12)
            // some muxers leave strh handler 0 and set it only in strf
            handlerOk = handlerOk || isMjpeg(handler)
            scale = math.max(1, bb.getInt(p + 28))
            rate = bb.getInt(p + 32)
          }
        } else if (cc == STRF && inStrl && streamIdx == videoStream) {
          // BITMAPINFOHEADER: biWidth @+4, biHeight @+8, biCompression @+16
          width = bb.getInt(p + 12)
          height = math.abs(bb.getInt(p + 16)) // negative = top-down
          handlerOk = handlerOk || isMjpeg(bb.getInt(p + 24))
        } else {
          val sid = dataChunkStream(cc)
          if (sid >= 0 && sid == videoStream && len > 0)
            frames += java.util.Arrays.copyOfRange(bytes, p + 8, p + 8 + len)
        }
        p += 8 + len + (len & 1) // chunks are even-padded
      }
    }
    walk(12, end, inStrl = false)

    require(videoStream >= 0, "AVI has no video ('vids') stream")
    require(handlerOk,
      "AVI video stream is not MJPEG (MJPG/mjpg/dmb1) — no JVM codec for " +
        "other fourccs; transcode externally (ffmpeg) first")
    require(width > 0 && height > 0, "AVI video stream lacks BITMAPINFOHEADER geometry")
    val fs = frames.result()
    require(fs.nonEmpty, "AVI movi list contains no video frames")
    Video(width, height, if (rate > 0) rate.toDouble / scale else 0.0, fs)
  }

  /** Mux JPEG frames into a minimal MJPEG AVI (encoder twin of [[demux]],
    * for tests and the sink side): one video stream, rate/scale = fps/1,
    * an idx1 index for player compatibility. */
  def mux(width: Int, height: Int, fps: Int, jpegFrames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && fps > 0 && jpegFrames.nonEmpty, "bad mux arguments")
    val out = new java.io.ByteArrayOutputStream()
    def le4(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    def cc(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    val maxFrame = jpegFrames.map(_.length).max

    // strh (56 bytes)
    val strh = new java.io.ByteArrayOutputStream()
    locally {
      val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(VIDS); b.putInt(MJPG); b.putInt(0); b.putInt(0) // flags, prio+lang
      b.putInt(0) // initial frames
      b.putInt(1) // scale
      b.putInt(fps) // rate
      b.putInt(0) // start
      b.putInt(jpegFrames.length) // length
      b.putInt(maxFrame) // suggested buffer
      b.putInt(-1) // quality
      b.putInt(0) // sample size
      b.putShort(0); b.putShort(0)
      b.putShort(width.toShort); b.putShort(height.toShort) // rcFrame
      strh.write(b.array())
    }
    // strf = BITMAPINFOHEADER (40 bytes)
    val strf = new java.io.ByteArrayOutputStream()
    locally {
      val b = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(40); b.putInt(width); b.putInt(height)
      b.putShort(1); b.putShort(24)
      b.putInt(MJPG); b.putInt(width * height * 3)
      b.putInt(0); b.putInt(0); b.putInt(0); b.putInt(0)
      strf.write(b.array())
    }
    // avih (56 bytes)
    val avih = new java.io.ByteArrayOutputStream()
    locally {
      val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(1000000 / fps) // µs per frame
      b.putInt(maxFrame * fps) // max bytes/sec
      b.putInt(0) // padding granularity
      b.putInt(0x10) // AVIF_HASINDEX
      b.putInt(jpegFrames.length)
      b.putInt(0) // initial frames
      b.putInt(1) // streams
      b.putInt(maxFrame)
      b.putInt(width); b.putInt(height)
      b.putInt(0); b.putInt(0); b.putInt(0); b.putInt(0)
      avih.write(b.array())
    }
    def padded(n: Int): Int = n + (n & 1)
    val strlLen = 4 + 8 + strh.size() + 8 + strf.size()
    val hdrlLen = 4 + 8 + avih.size() + 8 + strlLen
    val moviLen = 4 + jpegFrames.map(f => 8 + padded(f.length)).sum
    val idx1Len = 16 * jpegFrames.length
    val riffLen = 4 + 8 + hdrlLen + 8 + moviLen + 8 + idx1Len

    cc("RIFF"); le4(riffLen); cc("AVI ")
    cc("LIST"); le4(hdrlLen); cc("hdrl")
    cc("avih"); le4(avih.size()); out.write(avih.toByteArray)
    cc("LIST"); le4(strlLen); cc("strl")
    cc("strh"); le4(strh.size()); out.write(strh.toByteArray)
    cc("strf"); le4(strf.size()); out.write(strf.toByteArray)
    cc("LIST"); le4(moviLen); cc("movi")
    val offsets = IndexedSeq.newBuilder[(Int, Int)] // (offset from 'movi' fourcc, length)
    var rel = 4
    jpegFrames.foreach { f =>
      offsets += ((rel, f.length))
      cc("00dc"); le4(f.length); out.write(f, 0, f.length)
      if ((f.length & 1) == 1) out.write(0)
      rel += 8 + padded(f.length)
    }
    cc("idx1"); le4(idx1Len)
    offsets.result().foreach { case (off, len) =>
      cc("00dc"); le4(0x10) // AVIIF_KEYFRAME
      le4(off); le4(len)
    }
    out.toByteArray
  }
}
