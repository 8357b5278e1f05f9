package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM minimal DICOM decoder (S2) — no external dependency.
  *
  * DICOM PS3.10 file layout is public: 128-byte preamble + "DICM", then
  * data elements (group, element, VR, length, value). This parser handles
  * the UNCOMPRESSED transfer syntaxes — Implicit VR Little Endian
  * (1.2.840.10008.1.2) and Explicit VR Little Endian (1.2.840.10008.1.2.1)
  * — plus JPEG Baseline Process 1 (1.2.840.10008.1.2.4.50), the most
  * common compressed syntax, whose encapsulated fragments route through
  * the JDK's own ImageIO JPEG reader, RLE Lossless
  * (1.2.840.10008.1.2.5), decoded by a pure-JVM PS3.5 Annex G codec
  * below, JPEG-LS Lossless (1.2.840.10008.1.2.4.80) via the T.87 codec
  * in [[JpegLs]], and JPEG 2000 — both Lossless (1.2.840.10008.1.2.4.90,
  * reversible 5/3) and lossy (.4.91, irreversible 9/7 + quantization) —
  * via the T.800 codec in [[Jpeg2000]]. Only the retired/rare syntaxes
  * (and codestreams outside the codec's single-tile/component profile)
  * remain external-transcode, which is what the reference's
  * pydicom+gdcm stack does for them too.
  *
  * Extracted surface mirrors what the reference reads for slice ordering
  * and stacking (`setup/reformat/utils.py:132-215`): Rows/Columns, pixel
  * geometry (ImagePositionPatient, ImageOrientationPatient, PixelSpacing),
  * Modality rescale (slope/intercept), and the pixel buffer as floats.
  */
object Dicom {

  final case class Slice(
      rows: Int, cols: Int,
      data: Array[Float], // rescaled: raw * slope + intercept
      position: Seq[Float], // (0020,0032) ImagePositionPatient, len 3 (or empty)
      orientation: Seq[Float], // (0020,0037) ImageOrientationPatient, len 6 (or empty)
      pixelSpacing: Seq[Float], // (0028,0030), len 2 (or empty)
      seriesUid: String, instanceNumber: Int,
      frameIndex: Int = 0) // 0-based frame within a multi-frame file

  private val ImplicitLE = "1.2.840.10008.1.2"
  private val ExplicitLE = "1.2.840.10008.1.2.1"
  private val JpegBaseline = "1.2.840.10008.1.2.4.50"
  private val JpegLsLossless = "1.2.840.10008.1.2.4.80"
  private val Jpeg2000Lossless = "1.2.840.10008.1.2.4.90"
  private val Jpeg2000Lossy = "1.2.840.10008.1.2.4.91"
  private val RleLossless = "1.2.840.10008.1.2.5"

  private def tag(group: Int, elem: Int): Long = (group.toLong << 16) | elem

  /** Decode a single-frame DICOM file; multi-frame files fail loudly —
    * use [[decodeFrames]] for those. */
  def decode(bytes: Array[Byte]): Slice = {
    val frames = decodeFrames(bytes)
    require(frames.length == 1,
      s"${frames.length}-frame DICOM file: use decodeFrames for multi-frame cine")
    frames.head
  }

  /** Decode every frame of a DICOM file (single- or multi-frame cine,
    * (0028,0008) NumberOfFrames). Uncompressed frames are strided out of
    * one PixelData value; encapsulated (compressed) multi-frame requires
    * the standard one-fragment-per-frame layout (mandatory for RLE,
    * PS3.5 A.4.2, and universal encoder practice for the JPEG family). */
  def decodeFrames(bytes: Array[Byte]): IndexedSeq[Slice] = {
    require(bytes.length > 132 + 8, s"DICOM stream too short: ${bytes.length}")
    require(new String(bytes, 128, 4, "US-ASCII") == "DICM",
      "not a DICOM part-10 file (missing DICM magic)")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var pos = 132

    // collected attributes
    var rows = -1; var cols = -1
    var bitsAllocated = 16; var pixelRepresentation = 0
    var bitsStored = -1 // (0028,0101); defaults to bitsAllocated when absent
    var photometric = "" // (0028,0004) PhotometricInterpretation
    var slope = 1f; var intercept = 0f
    var position: Seq[Float] = Nil; var orientation: Seq[Float] = Nil
    var spacing: Seq[Float] = Nil
    var seriesUid = ""; var instanceNumber = 0
    var transferSyntax = ExplicitLE // file meta group is always explicit LE
    var pixelOff = -1; var pixelLen = -1
    var nFrames = 1 // (0028,0008) NumberOfFrames
    var encapFrags: IndexedSeq[Array[Byte]] = null // compressed fragments
    // PALETTE COLOR lookup tables (PS3.3 C.7.6.3.1.5/.6): per-channel
    // descriptor (0028,1101-1103; 3×US: entries [0 ⇒ 65536], firstMapped,
    // bitsPerEntry) and data (0028,1201-1203), parsed after the scan once
    // bits-per-entry is known
    var palDescR: Seq[Int] = Nil; var palDescG: Seq[Int] = Nil; var palDescB: Seq[Int] = Nil
    var palDataR: (Int, Int) = null; var palDataG: (Int, Int) = null; var palDataB: (Int, Int) = null

    def str(off: Int, len: Int): String =
      new String(bytes, off, len, "US-ASCII").trim
    def floats(off: Int, len: Int): Seq[Float] =
      str(off, len).split("\\\\").filter(_.nonEmpty).map(_.toFloat).toSeq
    def shorts(off: Int, len: Int): Seq[Int] =
      (0 until len / 2).map(i => bb.getShort(off + 2 * i) & 0xffff)

    val explicitLongVRs = Set("OB", "OW", "OF", "SQ", "UT", "UN")
    while (pos + 8 <= bytes.length && pixelOff < 0) {
      val group = bb.getShort(pos) & 0xffff
      val elem = bb.getShort(pos + 2) & 0xffff
      val inMeta = group == 0x0002
      // every supported syntax except Implicit VR LE (incl. JPEG baseline,
      // whose dataset is Explicit VR LE per PS3.5 A.4) parses explicit
      val isExplicit = inMeta || transferSyntax != ImplicitLE
      var vr = ""
      var valueLen = 0
      var valueOff = 0
      if (isExplicit) {
        vr = new String(bytes, pos + 4, 2, "US-ASCII")
        if (explicitLongVRs.contains(vr)) {
          valueLen = bb.getInt(pos + 8)
          valueOff = pos + 12
        } else {
          valueLen = bb.getShort(pos + 6) & 0xffff
          valueOff = pos + 8
        }
      } else {
        valueLen = bb.getInt(pos + 4)
        valueOff = pos + 8
      }
      // -1 is the defined "undefined length" sentinel (encapsulated
      // PixelData / SQ); any other negative length is a corrupt tag and,
      // unchecked, stalls the scan (pos stops advancing) — fail loudly
      require(valueLen == -1 || (valueLen >= 0 && valueOff + valueLen.toLong <= bytes.length),
        s"tag (${group.toHexString},${elem.toHexString}) length $valueLen " +
          "overruns the file — corrupt or truncated DICOM")
      val t = tag(group, elem)
      if (t == tag(0x7fe0, 0x0010)) {
        if (valueLen == -1) {
          // encapsulated PixelData: BOT item + fragment items + delimiter
          require(transferSyntax == JpegBaseline || transferSyntax == RleLossless ||
            transferSyntax == JpegLsLossless || transferSyntax == Jpeg2000Lossless ||
            transferSyntax == Jpeg2000Lossy,
            s"encapsulated PixelData with transfer syntax $transferSyntax — " +
              "only JPEG Baseline (1.2.840.10008.1.2.4.50, via ImageIO), " +
              "JPEG-LS Lossless (1.2.840.10008.1.2.4.80, T.87 codec), " +
              "JPEG 2000 (1.2.840.10008.1.2.4.90/.91, T.800 codec) and " +
              "RLE Lossless (1.2.840.10008.1.2.5, PS3.5 annex G codec) " +
              "decode in the pure JVM; transcode other syntaxes first")
          encapFrags = encapsulatedFragments(bb, bytes, valueOff)
          pixelOff = valueOff; pixelLen = 0
        } else { pixelOff = valueOff; pixelLen = valueLen }
      } else {
        if (valueLen == -1) { // undefined-length SQ: skip via delimiter scan
          var p = valueOff
          while (p + 8 <= bytes.length &&
            !(bb.getShort(p) == 0xfffe.toShort && (bb.getShort(p + 2) & 0xffff) == 0xe0dd)) p += 2
          valueLen = p + 8 - valueOff
        } else {
          t match {
            case x if x == tag(0x0002, 0x0010) => transferSyntax = str(valueOff, valueLen)
            case x if x == tag(0x0028, 0x0010) => rows = bb.getShort(valueOff) & 0xffff
            case x if x == tag(0x0028, 0x0011) => cols = bb.getShort(valueOff) & 0xffff
            case x if x == tag(0x0028, 0x0008) => nFrames = str(valueOff, valueLen).toInt
            case x if x == tag(0x0028, 0x0100) => bitsAllocated = bb.getShort(valueOff) & 0xffff
            case x if x == tag(0x0028, 0x0101) => bitsStored = bb.getShort(valueOff) & 0xffff
            case x if x == tag(0x0028, 0x0004) => photometric = str(valueOff, valueLen)
            case x if x == tag(0x0028, 0x0103) => pixelRepresentation = bb.getShort(valueOff) & 0xffff
            case x if x == tag(0x0028, 0x1053) => slope = str(valueOff, valueLen).toFloat
            case x if x == tag(0x0028, 0x1052) => intercept = str(valueOff, valueLen).toFloat
            case x if x == tag(0x0020, 0x0032) => position = floats(valueOff, valueLen)
            case x if x == tag(0x0020, 0x0037) => orientation = floats(valueOff, valueLen)
            case x if x == tag(0x0028, 0x0030) => spacing = floats(valueOff, valueLen)
            case x if x == tag(0x0020, 0x000e) => seriesUid = str(valueOff, valueLen)
            case x if x == tag(0x0020, 0x0013) => instanceNumber = str(valueOff, valueLen).toInt
            case x if x == tag(0x0028, 0x1101) => palDescR = shorts(valueOff, valueLen)
            case x if x == tag(0x0028, 0x1102) => palDescG = shorts(valueOff, valueLen)
            case x if x == tag(0x0028, 0x1103) => palDescB = shorts(valueOff, valueLen)
            case x if x == tag(0x0028, 0x1201) => palDataR = (valueOff, valueLen)
            case x if x == tag(0x0028, 0x1202) => palDataG = (valueOff, valueLen)
            case x if x == tag(0x0028, 0x1203) => palDataB = (valueOff, valueLen)
            case _ => ()
          }
        }
        pos = valueOff + valueLen
      }
    }
    require(transferSyntax == ImplicitLE || transferSyntax == ExplicitLE ||
      encapFrags != null,
      s"unsupported transfer syntax $transferSyntax — transcode to little-endian first")
    require(rows > 0 && cols > 0, "missing Rows/Columns")
    // allocation guard ahead of the per-frame Float arrays: corrupt
    // Rows/Columns (each a 16-bit US, so the product reaches 4.3e9 and
    // overflows Int) must throw, not OOM — 64M samples/frame is far past
    // any real modality
    require(rows.toLong * cols <= (1L << 26),
      s"implausible frame ${rows}x$cols — corrupt Rows/Columns")
    require(pixelOff >= 0, "missing PixelData")
    require(nFrames >= 1, s"bad NumberOfFrames $nFrames")
    val n = rows * cols

    // PhotometricInterpretation (0028,0004), PS3.3 C.7.6.3.1.2. MONOCHROME1
    // (min value displays white) is inverted below so downstream always sees
    // MONOCHROME2 polarity — the last silent real-archive wrongness in this
    // path (the reference reads it via pydicom, setup/reformat/utils.py).
    // Color photometrics only carry meaning on the JPEG-baseline route,
    // where ImageIO converts and the BT.601 luma collapse below applies;
    // PALETTE COLOR needs its lookup-table tags — fail all of those by name.
    val monochrome1 = photometric == "MONOCHROME1"
    val paletted = photometric == "PALETTE COLOR"
    photometric match {
      case "" | "MONOCHROME1" | "MONOCHROME2" => ()
      case c @ ("RGB" | "YBR_FULL" | "YBR_FULL_422") =>
        require(transferSyntax == JpegBaseline,
          s"PhotometricInterpretation $c only decodes on the JPEG-baseline " +
            "path (ImageIO color conversion) — transcode first")
      case "PALETTE COLOR" =>
        // r8: expand the (0028,1101-1203) LUTs to BT.601 grayscale — the
        // same luma collapse every other color path takes, applied to the
        // palette's RGB entries (kept at their stored bit depth). Index
        // samples come off the raw-LE and RLE routes; the JPEG family
        // never carries PALETTE COLOR in practice and stays unsupported.
        require(transferSyntax == ImplicitLE || transferSyntax == ExplicitLE ||
          transferSyntax == RleLossless,
          s"PALETTE COLOR with transfer syntax $transferSyntax — palette " +
            "indices decode on the raw little-endian and RLE routes only")
        require(pixelRepresentation == 0,
          "PALETTE COLOR with signed PixelRepresentation is nonstandard " +
            "(indices are unsigned, PS3.3 C.7.6.3.1.5) — transcode first")
        require(slope == 1f && intercept == 0f,
          "PALETTE COLOR with a modality rescale is nonstandard — indices " +
            "are display values, not modality values")
        require(palDescR.nonEmpty && palDescG.nonEmpty && palDescB.nonEmpty &&
          palDataR != null && palDataG != null && palDataB != null,
          "PALETTE COLOR without its three LUT descriptor+data tags " +
            "(0028,1101-1103 / 1201-1203)")
      case other => throw new IllegalArgumentException(
        s"PhotometricInterpretation $other unsupported — transcode first")
    }
    require(!(monochrome1 && pixelRepresentation == 1),
      "MONOCHROME1 with signed PixelRepresentation has no standard raw-range " +
        "inversion — transcode first")
    // invert on the RAW scale within the stored-bit range — deterministic
    // and identical for every frame of a cine (a per-frame observed-max
    // inversion would remap intensities inconsistently across frames):
    //   raw' = (2^BitsStored - 1) - raw
    // applied post-rescale as data' = maxStored*slope + 2*intercept - data
    def applyPhotometric(data: Array[Float]): Array[Float] = {
      if (monochrome1) {
        val maxStored = (1 << (if (bitsStored > 0) bitsStored else bitsAllocated)) - 1
        val c = maxStored * slope + 2 * intercept
        var i = 0
        while (i < data.length) { data(i) = c - data(i); i += 1 }
      }
      if (paletted) {
        // one LUT per channel: (entries, firstMapped, lut values). Hostile
        // descriptor/data mismatches fail loudly, never read out of range.
        def lut(desc: Seq[Int], dat: (Int, Int), ch: String): (Int, Int, Array[Int]) = {
          require(desc.length == 3, s"palette $ch descriptor has ${desc.length} values, need 3")
          val entries = if (desc.head == 0) 65536 else desc.head
          val firstMapped = desc(1)
          val bitsPer = desc(2)
          require(bitsPer == 8 || bitsPer == 16,
            s"palette $ch bits-per-entry $bitsPer unsupported (8 or 16)")
          val (off, len) = dat
          val avail = if (bitsPer == 16) len / 2 else len
          require(avail >= entries,
            s"palette $ch LUT data holds $avail entries, descriptor claims $entries")
          val vs = new Array[Int](entries)
          var i = 0
          while (i < entries) {
            vs(i) = if (bitsPer == 16) bb.getShort(off + 2 * i) & 0xffff
            else bytes(off + i) & 0xff
            i += 1
          }
          (entries, firstMapped, vs)
        }
        val (re, rf, rv) = lut(palDescR, palDataR, "red")
        val (ge, gf, gv) = lut(palDescG, palDataG, "green")
        val (be, bf, bv) = lut(palDescB, palDataB, "blue")
        // indices below firstMapped clamp to the first entry, above the
        // last to the last (PS3.3 C.7.6.3.1.5)
        def at(entries: Int, first: Int, vs: Array[Int], raw: Int): Int =
          vs(math.min(math.max(raw - first, 0), entries - 1))
        var i = 0
        while (i < data.length) {
          val raw = data(i).toInt // slope/intercept pinned 1/0 above
          data(i) = 0.299f * at(re, rf, rv, raw) +
            0.587f * at(ge, gf, gv, raw) + 0.114f * at(be, bf, bv, raw)
          i += 1
        }
      }
      data
    }

    /** One compressed frame's codestream → rescaled floats. */
    def decodeEncapFrame(stream: Array[Byte]): Array[Float] = {
      val data = new Array[Float](n)
      if (transferSyntax == JpegLsLossless) {
        val img = JpegLs.decode(stream)
        require(img.width == cols && img.height == rows,
          s"JPEG-LS frame ${img.width}x${img.height} does not match header ${cols}x$rows")
        var i = 0
        while (i < n) {
          // signed data: JPEG-LS codes the raw bit pattern; reinterpret per
          // PixelRepresentation by sign-extending from the coded precision
          val u = img.samples(i)
          val raw = if (pixelRepresentation == 1)
            (u << (32 - img.precision)) >> (32 - img.precision) else u
          data(i) = raw * slope + intercept; i += 1
        }
      } else if (transferSyntax == Jpeg2000Lossless || transferSyntax == Jpeg2000Lossy) {
        val img = Jpeg2000.decode(stream)
        require(img.width == cols && img.height == rows,
          s"JPEG 2000 frame ${img.width}x${img.height} does not match header ${cols}x$rows")
        // the codestream's Ssiz sign bit is authoritative: samples arrive
        // already sign-extended when signed, raw otherwise
        var i = 0
        while (i < n) { data(i) = img.samples(i) * slope + intercept; i += 1 }
      } else if (transferSyntax == RleLossless) {
        val planes = rleDecodeFrame(stream, n, bitsAllocated / 8)
        var i = 0
        if (bitsAllocated == 8) {
          while (i < n) {
            val raw = if (pixelRepresentation == 1) planes(0)(i).toInt
            else planes(0)(i) & 0xff
            data(i) = raw * slope + intercept; i += 1
          }
        } else { // 16-bit: plane 0 = MSBs, plane 1 = LSBs (PS3.5 G.2)
          while (i < n) {
            val u = ((planes(0)(i) & 0xff) << 8) | (planes(1)(i) & 0xff)
            val raw = if (pixelRepresentation == 1) u.toShort.toInt else u
            data(i) = raw * slope + intercept; i += 1
          }
        }
      } else { // JPEG baseline via ImageIO
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(stream))
        require(img != null, "ImageIO failed to decode JPEG-baseline PixelData")
        require(img.getWidth == cols && img.getHeight == rows,
          s"JPEG frame ${img.getWidth}x${img.getHeight} does not match header ${cols}x$rows")
        val raster = img.getRaster
        val gray = raster.getNumBands == 1
        var y = 0
        while (y < rows) {
          var x = 0
          while (x < cols) {
            val raw =
              if (gray) raster.getSample(x, y, 0).toFloat
              else { // color JPEG (YBR→RGB by ImageIO): BT.601 luma
                val rgb = img.getRGB(x, y)
                0.299f * ((rgb >> 16) & 0xff) + 0.587f * ((rgb >> 8) & 0xff) + 0.114f * (rgb & 0xff)
              }
            data(y * cols + x) = raw * slope + intercept
            x += 1
          }
          y += 1
        }
      }
      data
    }

    /** One uncompressed frame at byte offset `off` → rescaled floats. */
    def decodeRawFrame(off: Int): Array[Float] = {
      val data = new Array[Float](n)
      bitsAllocated match {
        case 8 =>
          var i = 0
          while (i < n) {
            val raw = if (pixelRepresentation == 1) bytes(off + i).toInt
            else bytes(off + i) & 0xff
            data(i) = raw * slope + intercept; i += 1
          }
        case 16 =>
          var i = 0
          while (i < n) {
            val s = bb.getShort(off + 2 * i)
            val raw = if (pixelRepresentation == 1) s.toInt else s & 0xffff
            data(i) = raw * slope + intercept; i += 1
          }
        case other => throw new IllegalArgumentException(s"unsupported BitsAllocated $other")
      }
      data
    }

    def slice(data: Array[Float], fi: Int): Slice =
      Slice(rows, cols, applyPhotometric(data), position, orientation, spacing,
        seriesUid, instanceNumber, fi)

    if (encapFrags != null) {
      val streams: IndexedSeq[Array[Byte]] =
        if (nFrames == 1) {
          // a single frame may be split across fragments — concatenate
          val out = new java.io.ByteArrayOutputStream()
          encapFrags.foreach(f => out.write(f, 0, f.length))
          IndexedSeq(out.toByteArray)
        } else {
          require(encapFrags.length == nFrames,
            s"multi-frame encapsulated PixelData with ${encapFrags.length} " +
              s"fragments for $nFrames frames — only the one-fragment-per-frame " +
              "layout decodes (mandatory for RLE, universal for JPEG); transcode first")
          encapFrags
        }
      streams.zipWithIndex.map { case (s, fi) => slice(decodeEncapFrame(s), fi) }
    } else {
      val frameBytes = n * (bitsAllocated / 8)
      // Long arithmetic: nFrames * frameBytes overflows Int for large cines
      // (512x512x16-bit past ~4095 frames) and would silently pass this check
      require(pixelLen >= nFrames.toLong * frameBytes,
        s"PixelData too short: $pixelLen < ${nFrames.toLong * frameBytes}")
      (0 until nFrames).map(fi => slice(decodeRawFrame(pixelOff + fi * frameBytes), fi))
    }
  }

  /** Collect the fragment items of an encapsulated PixelData value
    * (PS3.5 A.4): first item is the Basic Offset Table (skipped), the rest
    * are codestream fragments, terminated by the (FFFE,E0DD) delimiter.
    * Single-frame files may split one codestream across fragments (caller
    * concatenates); multi-frame files carry one fragment per frame. */
  private def encapsulatedFragments(bb: ByteBuffer, bytes: Array[Byte],
                                    start: Int): IndexedSeq[Array[Byte]] = {
    val out = IndexedSeq.newBuilder[Array[Byte]]
    var p = start
    var first = true
    var done = false
    while (!done) {
      require(p + 8 <= bytes.length, "truncated encapsulated PixelData")
      val g = bb.getShort(p) & 0xffff; val e = bb.getShort(p + 2) & 0xffff
      val len = bb.getInt(p + 4)
      if (g == 0xfffe && e == 0xe0dd) done = true
      else {
        require(g == 0xfffe && e == 0xe000,
          f"bad encapsulated item tag ($g%04x,$e%04x)")
        // bound BEFORE copyOfRange: a corrupt item length would otherwise
        // zero-pad-allocate up to 2 GB (copyOfRange allows to > length),
        // and a negative one stalls the scan
        require(len >= 0 && p + 8L + len <= bytes.length,
          s"encapsulated fragment length $len overruns PixelData — corrupt or truncated")
        if (!first) out += java.util.Arrays.copyOfRange(bytes, p + 8, p + 8 + len)
        first = false
        p += 8 + len
      }
    }
    out.result()
  }

  /** PS3.5 Annex G RLE Lossless frame decode: a 64-byte header of 16
    * little-endian uint32s — {number of segments, 15 segment offsets
    * counted from the first byte of the header} — followed by the
    * PackBits-encoded segments. Segments are the big-endian byte planes of
    * the composite pixel code (MSB plane first, G.2), independent of the
    * dataset's endianness.
    * @return one decoded byte plane per segment, each `nPixels` long */
  private[sources] def rleDecodeFrame(frame: Array[Byte], nPixels: Int,
                                      bytesPerSample: Int): Array[Array[Byte]] = {
    require(frame.length >= 64, s"RLE frame shorter than its 64-byte header: ${frame.length}")
    val bb = ByteBuffer.wrap(frame).order(ByteOrder.LITTLE_ENDIAN)
    val nSeg = bb.getInt(0)
    require(nSeg == bytesPerSample,
      s"RLE header has $nSeg segments, expected $bytesPerSample for " +
        s"${8 * bytesPerSample}-bit single-sample pixels")
    val offsets = (0 until nSeg).map(i => bb.getInt(4 * (i + 1)))
    Array.tabulate(nSeg) { i =>
      val end = if (i + 1 < nSeg) offsets(i + 1) else frame.length
      unpackBits(frame, offsets(i), end, nPixels)
    }
  }

  /** PackBits (PS3.5 G.3.1): control byte n signed — 0..127 ⇒ copy the next
    * n+1 bytes literally; -1..-127 ⇒ repeat the next byte 1-n times; -128 ⇒
    * no-op. Stops once `expect` bytes are produced (trailing even-length
    * padding is never read as a control byte). */
  private def unpackBits(src: Array[Byte], start: Int, end: Int, expect: Int): Array[Byte] = {
    val out = new Array[Byte](expect)
    var p = start; var o = 0
    while (o < expect) {
      require(p < end, s"truncated RLE segment: $o of $expect bytes decoded")
      val n = src(p); p += 1
      if (n >= 0) {
        val len = n + 1
        require(p + len <= end && o + len <= expect,
          s"RLE literal run overruns segment/plane at output offset $o")
        System.arraycopy(src, p, out, o, len)
        p += len; o += len
      } else if (n != -128) {
        val len = 1 - n
        require(p < end && o + len <= expect,
          s"RLE replicate run overruns segment/plane at output offset $o")
        java.util.Arrays.fill(out, o, o + len, src(p))
        p += 1; o += len
      }
    }
    out
  }

  /** PackBits encode of one byte plane (decoder twin): runs of ≥2 identical
    * bytes become replicate packets (≤128), everything else literal packets
    * (≤128 bytes). */
  private def packBits(plane: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < plane.length) {
      var run = 1
      while (i + run < plane.length && run < 128 && plane(i + run) == plane(i)) run += 1
      if (run >= 2) {
        out.write(1 - run) // -(run-1) as signed byte
        out.write(plane(i))
        i += run
      } else {
        var lit = 1
        while (i + lit < plane.length && lit < 128 &&
          !(i + lit + 1 < plane.length && plane(i + lit) == plane(i + lit + 1))) lit += 1
        out.write(lit - 1)
        out.write(plane, i, lit)
        i += lit
      }
    }
    out.toByteArray
  }

  /** q16's projection key for real headers: dot(position, cross(o1, o2)) —
    * the reference's slice-ordering scalar (`utils.py:218-241`). */
  def sliceProjection(s: Slice): Double = {
    require(s.position.length == 3 && s.orientation.length == 6,
      "slice lacks position/orientation for projection ordering")
    val o = s.orientation.map(_.toDouble)
    val n = Seq(o(1) * o(5) - o(2) * o(4), o(2) * o(3) - o(0) * o(5), o(0) * o(4) - o(1) * o(3))
    s.position.zip(n).map { case (p, ni) => p * ni }.sum
  }

  /** Minimal Explicit-VR-LE encoder (single-frame 16-bit) — the test/sink
    * twin of [[decode]], mirroring what `Nifti.encode` is for S1/S7. */
  def encode(rows: Int, cols: Int, data: Array[Float],
             position: Seq[Float] = Seq(0f, 0f, 0f),
             orientation: Seq[Float] = Seq(1f, 0f, 0f, 0f, 1f, 0f),
             pixelSpacing: Seq[Float] = Seq(1f, 1f),
             seriesUid: String = "1.2.3.4", instanceNumber: Int = 1,
             photometric: String = "MONOCHROME2"): Array[Byte] =
    encodeFrames(rows, cols, Seq(data), position, orientation, pixelSpacing,
      seriesUid, instanceNumber, photometric)

  /** Multi-frame (cine) Explicit-VR-LE encoder twin of [[decodeFrames]]:
    * 16-bit unsigned frames concatenated in one PixelData value with
    * (0028,0008) NumberOfFrames. */
  def encodeFrames(rows: Int, cols: Int, frames: Seq[Array[Float]],
                   position: Seq[Float] = Seq(0f, 0f, 0f),
                   orientation: Seq[Float] = Seq(1f, 0f, 0f, 0f, 1f, 0f),
                   pixelSpacing: Seq[Float] = Seq(1f, 1f),
                   seriesUid: String = "1.2.3.4", instanceNumber: Int = 1,
                   photometric: String = "MONOCHROME2"): Array[Byte] = {
    require(frames.nonEmpty && frames.forall(_.length == rows * cols),
      "shape/data mismatch")
    val data = frames.reduce(_ ++ _)
    val out = new java.io.ByteArrayOutputStream()
    def le2(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def even(s: String): Array[Byte] = {
      val b = s.getBytes("US-ASCII")
      if (b.length % 2 == 0) b else b :+ ' '.toByte
    }
    def el(group: Int, elem: Int, vr: String, value: Array[Byte]): Unit = {
      out.write(le2(group)); out.write(le2(elem))
      out.write(vr.getBytes("US-ASCII"))
      if (Set("OB", "OW", "OF", "SQ", "UT", "UN").contains(vr)) {
        out.write(Array[Byte](0, 0))
        val l = value.length
        out.write(Array((l & 0xff).toByte, ((l >> 8) & 0xff).toByte,
          ((l >> 16) & 0xff).toByte, ((l >> 24) & 0xff).toByte))
      } else out.write(le2(value.length))
      out.write(value)
    }
    out.write(new Array[Byte](128)); out.write("DICM".getBytes("US-ASCII"))
    el(0x0002, 0x0010, "UI", even(ExplicitLE)) // transfer syntax
    el(0x0020, 0x000e, "UI", even(seriesUid))
    el(0x0020, 0x0013, "IS", even(instanceNumber.toString))
    el(0x0020, 0x0032, "DS", even(position.mkString("\\")))
    el(0x0020, 0x0037, "DS", even(orientation.mkString("\\")))
    el(0x0028, 0x0004, "CS", even(photometric))
    if (frames.length > 1) // ascending tag order: (0028,0008) before Rows
      el(0x0028, 0x0008, "IS", even(frames.length.toString))
    el(0x0028, 0x0010, "US", le2(rows))
    el(0x0028, 0x0011, "US", le2(cols))
    el(0x0028, 0x0030, "DS", even(pixelSpacing.mkString("\\")))
    el(0x0028, 0x0100, "US", le2(16))
    el(0x0028, 0x0101, "US", le2(16)) // BitsStored
    el(0x0028, 0x0103, "US", le2(0)) // unsigned
    el(0x0028, 0x1052, "DS", even("0"))
    el(0x0028, 0x1053, "DS", even("1"))
    val px = new Array[Byte](2 * data.length)
    var i = 0
    while (i < data.length) {
      val v = math.round(data(i)).max(0).min(0xffff)
      px(2 * i) = (v & 0xff).toByte; px(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    el(0x7fe0, 0x0010, "OW", px)
    out.toByteArray
  }

  /** PALETTE COLOR encoder twin (single-frame, 8-bit indices, 16-bit LUT
    * entries): writes the three (0028,1101-1103) descriptors and
    * (0028,1201-1203) OW LUTs. `lutLenOverride` lets fuzz specs emit a
    * descriptor that claims more entries than the data holds. */
  def encodePalette(rows: Int, cols: Int, indices: Array[Int],
                    red: Array[Int], green: Array[Int], blue: Array[Int],
                    firstMapped: Int = 0,
                    seriesUid: String = "1.2.3.4", instanceNumber: Int = 1,
                    lutLenOverride: Int = -1, lutBits: Int = 16): Array[Byte] = {
    require(lutBits == 8 || lutBits == 16, s"lutBits $lutBits")
    require(indices.length == rows * cols, "shape/data mismatch")
    require(red.length == green.length && green.length == blue.length)
    val out = new java.io.ByteArrayOutputStream()
    def le2(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def even(s: String): Array[Byte] = {
      val b = s.getBytes("US-ASCII")
      if (b.length % 2 == 0) b else b :+ ' '.toByte
    }
    def el(group: Int, elem: Int, vr: String, value: Array[Byte]): Unit = {
      out.write(le2(group)); out.write(le2(elem))
      out.write(vr.getBytes("US-ASCII"))
      if (Set("OB", "OW", "OF", "SQ", "UT", "UN").contains(vr)) {
        out.write(Array[Byte](0, 0))
        val l = value.length
        out.write(Array((l & 0xff).toByte, ((l >> 8) & 0xff).toByte,
          ((l >> 16) & 0xff).toByte, ((l >> 24) & 0xff).toByte))
      } else out.write(le2(value.length))
      out.write(value)
    }
    out.write(new Array[Byte](128)); out.write("DICM".getBytes("US-ASCII"))
    el(0x0002, 0x0010, "UI", even(ExplicitLE))
    el(0x0020, 0x000e, "UI", even(seriesUid))
    el(0x0020, 0x0013, "IS", even(instanceNumber.toString))
    el(0x0020, 0x0032, "DS", even("0\\0\\0"))
    el(0x0020, 0x0037, "DS", even("1\\0\\0\\0\\1\\0"))
    el(0x0028, 0x0004, "CS", even("PALETTE COLOR"))
    el(0x0028, 0x0010, "US", le2(rows))
    el(0x0028, 0x0011, "US", le2(cols))
    el(0x0028, 0x0100, "US", le2(8))
    el(0x0028, 0x0101, "US", le2(8))
    el(0x0028, 0x0103, "US", le2(0))
    val claimed = if (lutLenOverride >= 0) lutLenOverride else red.length
    val desc = le2(if (claimed == 65536) 0 else claimed) ++ le2(firstMapped) ++ le2(lutBits)
    def lutBytes(vs: Array[Int]): Array[Byte] =
      if (lutBits == 16) vs.flatMap(v => le2(v & 0xffff))
      else {
        // 8-bit entries pack two per OW word; odd counts pad the last word
        val raw = vs.map(v => (v & 0xff).toByte)
        if (raw.length % 2 == 0) raw else raw :+ 0.toByte
      }
    el(0x0028, 0x1101, "US", desc)
    el(0x0028, 0x1102, "US", desc)
    el(0x0028, 0x1103, "US", desc)
    el(0x0028, 0x1201, "OW", lutBytes(red))
    el(0x0028, 0x1202, "OW", lutBytes(green))
    el(0x0028, 0x1203, "OW", lutBytes(blue))
    // OW PixelData needs an even value length (PS3.5 §7.1): odd rows·cols
    // of 8-bit indices pads the last word, like lutBytes does
    val idxBytes = indices.map(i => (i & 0xff).toByte)
    el(0x7fe0, 0x0010, "OW",
      if (idxBytes.length % 2 == 0) idxBytes else idxBytes :+ 0.toByte)
    out.toByteArray
  }

  /** RLE Lossless encoder twin (single-frame 16-bit unsigned): pixel values
    * split into MSB/LSB byte planes (PS3.5 G.2), each PackBits-encoded and
    * even-padded, prefixed with the 64-byte segment-offset header, wrapped
    * in encapsulated PixelData (empty BOT + one frame fragment + sequence
    * delimiter). Lossless — [[decode]] round-trips it bit-exactly. */
  def encodeRle(rows: Int, cols: Int, data: Array[Float],
                position: Seq[Float] = Seq(0f, 0f, 0f),
                orientation: Seq[Float] = Seq(1f, 0f, 0f, 0f, 1f, 0f),
                pixelSpacing: Seq[Float] = Seq(1f, 1f),
                seriesUid: String = "1.2.3.4", instanceNumber: Int = 1): Array[Byte] = {
    require(data.length == rows * cols, "shape/data mismatch")
    val n = data.length
    val msb = new Array[Byte](n); val lsb = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val v = math.round(data(i)).max(0).min(0xffff)
      msb(i) = ((v >> 8) & 0xff).toByte; lsb(i) = (v & 0xff).toByte
      i += 1
    }
    def evenPad(b: Array[Byte]): Array[Byte] =
      if (b.length % 2 == 0) b else b :+ 0.toByte
    val segs = Seq(evenPad(packBits(msb)), evenPad(packBits(lsb)))
    val frame = new java.io.ByteArrayOutputStream()
    def le4(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    le4(frame, segs.length)
    var off = 64
    segs.foreach { s => le4(frame, off); off += s.length }
    (segs.length until 15).foreach(_ => le4(frame, 0))
    segs.foreach(s => frame.write(s, 0, s.length))
    encodeEncapsulated(RleLossless, rows, cols, bitsAllocated = 16, Seq(frame.toByteArray),
      position, orientation, pixelSpacing, seriesUid, instanceNumber)
  }

  /** JPEG-LS Lossless encoder twin (single-frame 16-bit unsigned): samples
    * compressed by the pure-JVM T.87 codec ([[JpegLs.encode]]), wrapped in
    * the encapsulated PixelData structure. Lossless — [[decode]]
    * round-trips it bit-exactly. */
  def encodeJpegLs(rows: Int, cols: Int, data: Array[Float],
                   position: Seq[Float] = Seq(0f, 0f, 0f),
                   orientation: Seq[Float] = Seq(1f, 0f, 0f, 0f, 1f, 0f),
                   pixelSpacing: Seq[Float] = Seq(1f, 1f),
                   seriesUid: String = "1.2.3.4", instanceNumber: Int = 1): Array[Byte] = {
    require(data.length == rows * cols, "shape/data mismatch")
    val samples = data.map(v => math.round(v).max(0).min(0xffff))
    val payload0 = JpegLs.encode(JpegLs.Image(cols, rows, 16, samples))
    val payload = if (payload0.length % 2 == 0) payload0 else payload0 :+ 0.toByte
    encodeEncapsulated(JpegLsLossless, rows, cols, bitsAllocated = 16, Seq(payload),
      position, orientation, pixelSpacing, seriesUid, instanceNumber)
  }

  /** JPEG 2000 Lossless encoder twin (single-frame 16-bit unsigned):
    * samples compressed by the pure-JVM T.800 codec ([[Jpeg2000.encode]],
    * 5/3 reversible), wrapped in the encapsulated PixelData structure.
    * Lossless — [[decode]] round-trips it bit-exactly. */
  def encodeJpeg2000(rows: Int, cols: Int, data: Array[Float],
                     position: Seq[Float] = Seq(0f, 0f, 0f),
                     orientation: Seq[Float] = Seq(1f, 0f, 0f, 0f, 1f, 0f),
                     pixelSpacing: Seq[Float] = Seq(1f, 1f),
                     seriesUid: String = "1.2.3.4", instanceNumber: Int = 1): Array[Byte] = {
    require(data.length == rows * cols, "shape/data mismatch")
    val samples = data.map(v => math.round(v).max(0).min(0xffff))
    val payload0 = Jpeg2000.encode(Jpeg2000.Image(cols, rows, 16, signed = false, samples))
    val payload = if (payload0.length % 2 == 0) payload0 else payload0 :+ 0.toByte
    encodeEncapsulated(Jpeg2000Lossless, rows, cols, bitsAllocated = 16, Seq(payload),
      position, orientation, pixelSpacing, seriesUid, instanceNumber)
  }

  /** Lossy JPEG 2000 (.4.91) encoder twin (single-frame 16-bit
    * unsigned): 9/7 irreversible + scalar-expounded quantization at step
    * Δ = 2^deltaShift·(1+mu/2048) ([[Jpeg2000.encode97]]). [[decode]]
    * reconstructs within the step-size error bound, not bit-exactly. */
  def encodeJpeg2000Lossy(rows: Int, cols: Int, data: Array[Float],
                          deltaShift: Int = 0, mu: Int = 0,
                          position: Seq[Float] = Seq(0f, 0f, 0f),
                          orientation: Seq[Float] = Seq(1f, 0f, 0f, 0f, 1f, 0f),
                          pixelSpacing: Seq[Float] = Seq(1f, 1f),
                          seriesUid: String = "1.2.3.4", instanceNumber: Int = 1): Array[Byte] = {
    require(data.length == rows * cols, "shape/data mismatch")
    val samples = data.map(v => math.round(v).max(0).min(0xffff))
    val payload0 = Jpeg2000.encode97(
      Jpeg2000.Image(cols, rows, 16, signed = false, samples), deltaShift, mu)
    val payload = if (payload0.length % 2 == 0) payload0 else payload0 :+ 0.toByte
    encodeEncapsulated(Jpeg2000Lossy, rows, cols, bitsAllocated = 16, Seq(payload),
      position, orientation, pixelSpacing, seriesUid, instanceNumber)
  }

  /** Multi-frame JPEG 2000 Lossless encoder twin: one T.800 codestream
    * per frame, one encapsulated fragment per frame (the layout
    * [[decodeFrames]] requires), (0028,0008) NumberOfFrames written. */
  def encodeJpeg2000Frames(rows: Int, cols: Int, frames: Seq[Array[Float]],
                           position: Seq[Float] = Seq(0f, 0f, 0f),
                           orientation: Seq[Float] = Seq(1f, 0f, 0f, 0f, 1f, 0f),
                           pixelSpacing: Seq[Float] = Seq(1f, 1f),
                           seriesUid: String = "1.2.3.4", instanceNumber: Int = 1): Array[Byte] = {
    require(frames.nonEmpty && frames.forall(_.length == rows * cols),
      "shape/data mismatch")
    val payloads = frames.map { data =>
      val samples = data.map(v => math.round(v).max(0).min(0xffff))
      val p = Jpeg2000.encode(Jpeg2000.Image(cols, rows, 16, signed = false, samples))
      if (p.length % 2 == 0) p else p :+ 0.toByte
    }
    encodeEncapsulated(Jpeg2000Lossless, rows, cols, bitsAllocated = 16, payloads,
      position, orientation, pixelSpacing, seriesUid, instanceNumber)
  }

  /** Shared part-10 wrapper for encapsulated (compressed) PixelData: file
    * meta + geometry/rescale attributes + OB undefined-length PixelData
    * with an empty BOT item, one fragment per frame (NumberOfFrames
    * written when multi-frame), and the sequence delimiter (PS3.5 A.4). */
  private def encodeEncapsulated(syntax: String, rows: Int, cols: Int,
                                 bitsAllocated: Int, frames: Seq[Array[Byte]],
                                 position: Seq[Float], orientation: Seq[Float],
                                 pixelSpacing: Seq[Float], seriesUid: String,
                                 instanceNumber: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le2(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le4(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    def even(s: String): Array[Byte] = {
      val b = s.getBytes("US-ASCII")
      if (b.length % 2 == 0) b else b :+ ' '.toByte
    }
    def el(group: Int, elem: Int, vr: String, value: Array[Byte]): Unit = {
      out.write(le2(group)); out.write(le2(elem))
      out.write(vr.getBytes("US-ASCII"))
      out.write(le2(value.length))
      out.write(value)
    }
    out.write(new Array[Byte](128)); out.write("DICM".getBytes("US-ASCII"))
    el(0x0002, 0x0010, "UI", even(syntax))
    el(0x0020, 0x000e, "UI", even(seriesUid))
    el(0x0020, 0x0013, "IS", even(instanceNumber.toString))
    el(0x0020, 0x0032, "DS", even(position.mkString("\\")))
    el(0x0020, 0x0037, "DS", even(orientation.mkString("\\")))
    if (frames.length > 1) // ascending tag order: (0028,0008) before Rows
      el(0x0028, 0x0008, "IS", even(frames.length.toString))
    el(0x0028, 0x0010, "US", le2(rows))
    el(0x0028, 0x0011, "US", le2(cols))
    el(0x0028, 0x0030, "DS", even(pixelSpacing.mkString("\\")))
    el(0x0028, 0x0100, "US", le2(bitsAllocated))
    el(0x0028, 0x0103, "US", le2(0)) // unsigned
    el(0x0028, 0x1052, "DS", even("0"))
    el(0x0028, 0x1053, "DS", even("1"))
    // encapsulated PixelData: OB, undefined length
    out.write(le2(0x7fe0)); out.write(le2(0x0010))
    out.write("OB".getBytes("US-ASCII")); out.write(Array[Byte](0, 0))
    le4(-1)
    out.write(le2(0xfffe)); out.write(le2(0xe000)); le4(0) // empty BOT
    frames.foreach { fb =>
      out.write(le2(0xfffe)); out.write(le2(0xe000)); le4(fb.length)
      out.write(fb, 0, fb.length)
    }
    out.write(le2(0xfffe)); out.write(le2(0xe0dd)); le4(0)
    out.toByteArray
  }

  /** JPEG-baseline encoder twin (8-bit grayscale, lossy): data clamped to
    * [0,255], compressed with ImageIO's JPEG writer, wrapped in the
    * encapsulated PixelData structure (empty BOT item + one fragment +
    * sequence delimiter). Test/sink twin of the `.4.50` decode path. */
  def encodeJpegBaseline(rows: Int, cols: Int, data: Array[Float],
                         position: Seq[Float] = Seq(0f, 0f, 0f),
                         orientation: Seq[Float] = Seq(1f, 0f, 0f, 0f, 1f, 0f),
                         pixelSpacing: Seq[Float] = Seq(1f, 1f),
                         seriesUid: String = "1.2.3.4", instanceNumber: Int = 1): Array[Byte] = {
    require(data.length == rows * cols, "shape/data mismatch")
    val img = new java.awt.image.BufferedImage(cols, rows,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < data.length) {
      raster.setSample(i % cols, i / cols, 0, math.round(data(i)).max(0).min(255))
      i += 1
    }
    val jpegOut = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", jpegOut)
    val jpegRaw = jpegOut.toByteArray
    val jpeg = if (jpegRaw.length % 2 == 0) jpegRaw else jpegRaw :+ 0.toByte

    val out = new java.io.ByteArrayOutputStream()
    def le2(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le4(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def even(s: String): Array[Byte] = {
      val b = s.getBytes("US-ASCII")
      if (b.length % 2 == 0) b else b :+ ' '.toByte
    }
    def el(group: Int, elem: Int, vr: String, value: Array[Byte]): Unit = {
      out.write(le2(group)); out.write(le2(elem))
      out.write(vr.getBytes("US-ASCII"))
      out.write(le2(value.length))
      out.write(value)
    }
    out.write(new Array[Byte](128)); out.write("DICM".getBytes("US-ASCII"))
    el(0x0002, 0x0010, "UI", even(JpegBaseline))
    el(0x0020, 0x000e, "UI", even(seriesUid))
    el(0x0020, 0x0013, "IS", even(instanceNumber.toString))
    el(0x0020, 0x0032, "DS", even(position.mkString("\\")))
    el(0x0020, 0x0037, "DS", even(orientation.mkString("\\")))
    el(0x0028, 0x0010, "US", le2(rows))
    el(0x0028, 0x0011, "US", le2(cols))
    el(0x0028, 0x0030, "DS", even(pixelSpacing.mkString("\\")))
    el(0x0028, 0x0100, "US", le2(8))
    el(0x0028, 0x0103, "US", le2(0))
    el(0x0028, 0x1052, "DS", even("0"))
    el(0x0028, 0x1053, "DS", even("1"))
    // encapsulated PixelData: OB, undefined length
    out.write(le2(0x7fe0)); out.write(le2(0x0010))
    out.write("OB".getBytes("US-ASCII")); out.write(Array[Byte](0, 0))
    out.write(le4(-1))
    out.write(le2(0xfffe)); out.write(le2(0xe000)); out.write(le4(0)) // empty BOT
    out.write(le2(0xfffe)); out.write(le2(0xe000)); out.write(le4(jpeg.length))
    out.write(jpeg)
    out.write(le2(0xfffe)); out.write(le2(0xe0dd)); out.write(le4(0))
    out.toByteArray
  }
}
