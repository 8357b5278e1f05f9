package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** Pure-JVM NIfTI-1 codec (S1 scan / S7 sink) — no external dependency.
  *
  * NIfTI-1 is a public fixed layout: a 348-byte header (+4 extension
  * bytes), then voxels at `vox_offset`, x-fastest order, optionally the
  * whole file gzipped (`.nii.gz`). Field offsets follow the official
  * `nifti1.h` spec. The reference reads these via nibabel
  * (`setup/reformat/mm1.py:47-48`, `pipeline/dataset_cacher.py:236`) and
  * writes them via `nib.save` (`setup/reformat/mm1.py:69-70`).
  *
  * Decoded layout maps 1:1 onto the engine's (T,D,C,H,W) flat tensor:
  * NIfTI stores x fastest, then y, z, t — index x + X·(y + Y·(z + Z·t)) —
  * which is exactly w + W·(h + H·(d + D·t)) with C=1, so the buffer copies
  * through without permutation.
  *
  * Scale note: decode runs inside a UDF over `binaryFile` rows — one task
  * per file, embarrassingly parallel, no driver involvement.
  */
object Nifti {

  /** shape is the engine's 5-axis (T,D,C,H,W); affine = srow_{x,y,z}
    * (12 floats, row-major 3×4); pixdim = voxel spacing (dx,dy,dz). */
  final case class Volume(shape: Seq[Int], data: Array[Float],
                          pixdim: Seq[Float], affine: Seq[Float])

  private def isGzip(b: Array[Byte]): Boolean =
    b.length > 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  private def gunzip(b: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(b))
    try {
      val out = new ByteArrayOutputStream(math.max(1024, b.length * 4))
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n > 0) {
        out.write(buf, 0, n)
        // decompression bomb guard: gzip compresses ~1000:1 at best on
        // real data; a tiny stream expanding past 1 GB is hostile, not a
        // volume — fail loudly instead of buffering toward OOM
        require(out.size() <= (1 << 30),
          s"gzip payload expanded past 1 GiB from ${b.length} input bytes — decompression bomb")
        n = in.read(buf)
      }
      out.toByteArray
    } finally in.close()
  }

  /** Decode a `.nii` / `.nii.gz` byte stream. Handles either endianness
    * (sniffed from sizeof_hdr), datatypes uint8/int16/int32/float32/
    * float64/uint16, and nibabel-style scl_slope/scl_inter scaling. */
  def decode(raw: Array[Byte]): Volume = {
    val bytes = if (isGzip(raw)) gunzip(raw) else raw
    require(bytes.length >= 352, s"NIfTI-1 stream too short: ${bytes.length} bytes")
    var bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (bb.getInt(0) != 348) {
      bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
      require(bb.getInt(0) == 348,
        "not NIfTI-1: sizeof_hdr != 348 in either byte order")
    }
    val magic = new String(bytes, 344, 3, "US-ASCII")
    require(magic == "n+1" || magic == "ni1", s"bad NIfTI magic '$magic'")
    val dims = (1 to 7).map(i => math.max(1, bb.getShort(40 + 2 * i).toInt))
    val datatype = bb.getShort(70).toInt
    val pixdim = (1 to 3).map(i => bb.getFloat(76 + 4 * i))
    val voxOffset = bb.getFloat(108)
    val sclSlope = bb.getFloat(112)
    val sclInter = bb.getFloat(116)
    val affine = (0 until 12).map(i => bb.getFloat(280 + 4 * i))
    val nx = dims(0); val ny = dims(1); val nz = dims(2); val nt = dims(3)
    val n = nx.toLong * ny * nz * nt
    // allocation guard: four 16-bit dims multiply to 2^60 — a corrupt
    // header must throw, not allocate toward Int.MaxValue floats (8 GiB);
    // 2^28 voxels (1 GiB as float) is far past any real cine volume
    require(n > 0 && n <= (1L << 28), s"implausible voxel count $n — corrupt dim[]")
    val off = if (voxOffset >= 348f) voxOffset.toInt else 352
    require(bytes.length >= off, s"vox_offset $off beyond stream")
    val bytesPerVoxel = datatype match {
      case 2 => 1; case 4 | 512 => 2; case 8 | 16 => 4; case 64 => 8
      case other => throw new IllegalArgumentException(s"unsupported NIfTI datatype $other")
    }
    require(bytes.length - off >= n * bytesPerVoxel,
      s"data section holds ${bytes.length - off} bytes, header claims ${n * bytesPerVoxel} — truncated/corrupt")
    val data = new Array[Float](n.toInt)
    val len = data.length
    datatype match {
      case 2 => // uint8
        var i = 0; while (i < len) { data(i) = (bytes(off + i) & 0xff).toFloat; i += 1 }
      case 4 => // int16
        var i = 0; while (i < len) { data(i) = bb.getShort(off + 2 * i).toFloat; i += 1 }
      case 512 => // uint16
        var i = 0; while (i < len) { data(i) = (bb.getShort(off + 2 * i) & 0xffff).toFloat; i += 1 }
      case 8 => // int32
        var i = 0; while (i < len) { data(i) = bb.getInt(off + 4 * i).toFloat; i += 1 }
      case 16 => // float32
        var i = 0; while (i < len) { data(i) = bb.getFloat(off + 4 * i); i += 1 }
      case 64 => // float64
        var i = 0; while (i < len) { data(i) = bb.getDouble(off + 8 * i).toFloat; i += 1 }
      case other => throw new IllegalArgumentException(s"unsupported NIfTI datatype $other")
    }
    // nibabel get_fdata semantics: apply scl iff slope is finite and nonzero
    if (!sclSlope.isNaN && sclSlope != 0f && !(sclSlope == 1f && sclInter == 0f)) {
      var i = 0; while (i < len) { data(i) = data(i) * sclSlope + sclInter; i += 1 }
    }
    Volume(Seq(nt, nz, 1, ny, nx), data, pixdim, affine)
  }

  /** Encode a (T,D,C=1,H,W) float tensor as a little-endian float32
    * `.nii` stream (gzip = `.nii.gz`), vox_offset 352, magic "n+1",
    * sform affine written to srow_*. Inverse of [[decode]]. */
  def encode(shape: Seq[Int], data: Array[Float], pixdim: Seq[Float],
             affine: Seq[Float] = Seq(1f, 0f, 0f, 0f, 0f, 1f, 0f, 0f, 0f, 0f, 1f, 0f),
             gzip: Boolean = true): Array[Byte] = {
    require(shape.length == 5, s"expected 5-axis (T,D,C,H,W) shape, got $shape")
    val (t, d, c, h, w) = (shape(0), shape(1), shape(2), shape(3), shape(4))
    require(c == 1, s"NIfTI sink writes single-channel volumes, got C=$c")
    require(data.length == t * d * h * w, "shape/data length mismatch")
    val out = ByteBuffer.allocate(352 + 4 * data.length).order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(0, 348) // sizeof_hdr
    out.putShort(40, (if (t > 1) 4 else 3).toShort)
    out.putShort(42, w.toShort); out.putShort(44, h.toShort)
    out.putShort(46, d.toShort); out.putShort(48, t.toShort)
    out.putShort(50, 1.toShort); out.putShort(52, 1.toShort); out.putShort(54, 1.toShort)
    out.putShort(70, 16.toShort) // datatype float32
    out.putShort(72, 32.toShort) // bitpix
    out.putFloat(76, 1f) // pixdim[0] qfac
    pixdim.take(3).zipWithIndex.foreach { case (p, i) => out.putFloat(80 + 4 * i, p) }
    out.putFloat(108, 352f) // vox_offset
    out.putFloat(112, 1f) // scl_slope
    out.putFloat(116, 0f) // scl_inter
    out.putShort(254, 1.toShort) // sform_code = NIFTI_XFORM_SCANNER_ANAT
    affine.take(12).zipWithIndex.foreach { case (a, i) => out.putFloat(280 + 4 * i, a) }
    out.put(344, 'n'.toByte); out.put(345, '+'.toByte)
    out.put(346, '1'.toByte); out.put(347, 0.toByte)
    var i = 0
    while (i < data.length) { out.putFloat(352 + 4 * i, data(i)); i += 1 }
    val plain = out.array()
    if (!gzip) plain
    else {
      val bos = new ByteArrayOutputStream(plain.length / 2 + 64)
      val gz = new GZIPOutputStream(bos)
      gz.write(plain); gz.close()
      bos.toByteArray
    }
  }
}
