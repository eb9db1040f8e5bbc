package graft.operators

/** Pure-JVM media codecs for the multimodal pipeline (SURVEY §2.4 X5).
  * This container ships no image/audio libraries, so the formats here are
  * chosen to be REALLY decodable with zero external codecs:
  *
  *   - PPM (P6) — the standard binary Portable Pixmap: ASCII header
  *     `P6 <w> <h> <maxval>` + raw RGB bytes. A real image format (netpbm).
  *   - WAV — RIFF/WAVE with PCM16 mono: real RIFF chunk walking (fmt/data
  *     may appear in any order, other chunks are skipped).
  *   - GFV0 — a deliberately tiny SYNTHETIC video container (magic +
  *     frame-count + one embedded PPM keyframe), standing in for MP4 atom
  *     parsing; the parsing is real, the format is ours.
  *
  * A JPEG/MP4 decoder would slot into the same dispatch seam; the decode
  * WORK here (header parsing, pixel/sample statistics) is genuine, which
  * is what the partition-batched pipeline shape is for.
  */
object MediaCodecs {

  // ------------------------------------------------------------------ PPM
  final case class ImageInfo(width: Int, height: Int, meanLuma: Double)

  def encodePpm(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"need ${w * h * 3} RGB bytes, got ${rgb.length}")
    s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ rgb
  }

  /** P6 header parse shared by decode and resize: (width, height,
    * raster offset). Handles comments/whitespace per the netpbm spec. */
  private def parsePpmHeader(b: Array[Byte]): (Int, Int, Int) = {
    require(b.length >= 2 && b(0) == 'P' && b(1) == '6', "not a P6 ppm")
    var i = 2
    def nextInt(): Int = {
      // skip whitespace and '#' comments
      while (i < b.length && (b(i).toChar.isWhitespace || b(i) == '#'))
        if (b(i) == '#') { while (i < b.length && b(i) != '\n') i += 1 }
        else i += 1
      var v = 0
      require(i < b.length && b(i) >= '0' && b(i) <= '9', s"bad ppm header at byte $i")
      while (i < b.length && b(i) >= '0' && b(i) <= '9') { v = v * 10 + (b(i) - '0'); i += 1 }
      v
    }
    val w = nextInt()
    val h = nextInt()
    val maxval = nextInt()
    require(maxval == 255, s"only 8-bit ppm supported, maxval=$maxval")
    i += 1 // single whitespace after maxval
    require(b.length - i >= w * h * 3, s"truncated raster: ${b.length - i} < ${w * h * 3}")
    (w, h, i)
  }

  /** Nearest-neighbor downsample by an integer factor: out(x, y) =
    * src(x·f, y·f), out dims = ⌈w/f⌉ × ⌈h/f⌉ — a REAL resize over real
    * raster bytes, emitting a well-formed P6 (round-trips decodePpm). */
  def resizePpm(b: Array[Byte], factor: Int): Array[Byte] = {
    require(factor >= 1, s"bad resize factor $factor")
    val (w, h, off) = parsePpmHeader(b)
    val wr = (w + factor - 1) / factor
    val hr = (h + factor - 1) / factor
    val out = new Array[Byte](wr * hr * 3)
    var p = 0
    while (p < wr * hr) {
      val src = off + 3 * (((p / wr) * factor) * w + (p % wr) * factor)
      out(3 * p) = b(src); out(3 * p + 1) = b(src + 1); out(3 * p + 2) = b(src + 2)
      p += 1
    }
    encodePpm(wr, hr, out)
  }

  /** Real P6 parse: header tokens (with comment/whitespace handling), then
    * per-pixel BT.601 luma over the raster. */
  def decodePpm(b: Array[Byte]): ImageInfo = {
    val (w, h, i) = parsePpmHeader(b)
    // BT.601 luma in INTEGER millis (299r + 587g + 114b): integer sums are
    // exact and order-independent, so any engine computing the same bytes
    // lands on the same double after the single final division
    var lumaMillis = 0L
    var p = i
    val end = i + w * h * 3
    while (p < end) {
      lumaMillis += 299L * (b(p) & 0xff) + 587L * (b(p + 1) & 0xff) + 114L * (b(p + 2) & 0xff)
      p += 3
    }
    ImageInfo(w, h, lumaMillis / (1000.0 * w * h))
  }

  /** 64-bit perceptual AVERAGE-HASH (aHash) of a P6 raster: BT.601 integer
    * luma per pixel, pixels mapped onto the 8×8 grid (cell row = y·8/h,
    * col = x·8/w), bit(cell) = 1 iff the cell's mean luma exceeds the
    * image mean. The comparison is CROSS-MULTIPLIED in integers
    * (cellSum·totalCnt > totalSum·cellCnt) — no division anywhere, so the
    * hash is bit-exact on any engine computing the same bytes. Cells no
    * pixel maps to (w < 8 or h < 8) keep bit 0. Magnitude: totalSum ≤
    * 255000·px, ×totalCnt stays inside int64 through ~megapixel rasters. */
  def ahashPpm(b: Array[Byte]): Long = {
    val (w, h, off) = parsePpmHeader(b)
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var totS = 0L
    var totC = 0L
    var p = 0
    val n = w * h
    while (p < n) {
      val i = off + 3 * p
      val lum = 299L * (b(i) & 0xff) + 587L * (b(i + 1) & 0xff) + 114L * (b(i + 2) & 0xff)
      val cell = ((p / w) * 8 / h) * 8 + ((p % w) * 8 / w)
      sums(cell) += lum; cnts(cell) += 1
      totS += lum; totC += 1
      p += 1
    }
    var hash = 0L
    var c = 0
    while (c < 64) {
      if (sums(c) * totC > totS * cnts(c)) hash |= 1L << c
      c += 1
    }
    hash
  }

  // ------------------------------------------------------------------ WAV
  final case class AudioInfo(sampleRate: Int, nSamples: Int, durationMs: Long, rms: Double)

  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen).put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)             // PCM
      .putShort(1)             // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)  // byte rate
      .putShort(2)             // block align
      .putShort(16)            // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Real RIFF chunk walk: find fmt + data wherever they sit, skip the
    * rest (odd-sized chunks pad to even per the spec). */
  /** RIFF chunk walk shared by decode and fingerprint: returns
    * (littleEndianBuffer, sampleRate, dataOffset, nSamples) for a
    * PCM16-mono payload; rejects anything else. */
  private def pcm16Data(b: Array[Byte]): (java.nio.ByteBuffer, Int, Int, Int) = {
    val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(at: Int): String = new String(b, at, 4, "US-ASCII")
    require(b.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE", "not a RIFF/WAVE file")
    var pos = 12
    var rate = -1
    var bits = -1
    var channels = -1
    var dataOff = -1
    var dataLen = -1
    while (pos + 8 <= b.length) {
      val id = tag(pos)
      val size = bb.getInt(pos + 4)
      // a hostile/corrupt size (negative, or -8 making the advance 0) must
      // not stall the walk: chunk sizes are unsigned in RIFF, so any
      // negative i32 read is malformed — reject rather than spin forever
      require(size >= 0, s"malformed RIFF chunk size $size at byte $pos")
      id match {
        case "fmt " =>
          require(bb.getShort(pos + 8) == 1, "only PCM wav supported")
          channels = bb.getShort(pos + 10)
          rate = bb.getInt(pos + 12)
          bits = bb.getShort(pos + 22)
        case "data" =>
          dataOff = pos + 8
          dataLen = math.min(size, b.length - dataOff)
        case _ => () // skip unknown chunks (LIST, fact, ...)
      }
      pos += 8 + size + (size & 1)
    }
    require(rate > 0 && dataOff >= 0, "missing fmt or data chunk")
    require(bits == 16 && channels == 1, s"only PCM16 mono supported (bits=$bits ch=$channels)")
    (bb, rate, dataOff, dataLen / 2)
  }

  def decodeWav(b: Array[Byte]): AudioInfo = {
    val (bb, rate, dataOff, n) = pcm16Data(b)
    // exact integer sum of squares (order-independent), one float division
    var sumSq = 0L
    var i = 0
    while (i < n) {
      val s = bb.getShort(dataOff + i * 2).toLong
      sumSq += s * s
      i += 1
    }
    AudioInfo(rate, n, n * 1000L / rate, if (n == 0) 0.0 else math.sqrt(sumSq.toDouble / n))
  }

  /** 64-bit perceptual fingerprint of a PCM16-mono clip — the audio analog
    * of [[ahashPpm]]: samples map onto 64 time frames (frame = i·64/n),
    * bit(frame) = 1 iff the frame's mean ENERGY (integer sum of squares)
    * exceeds the whole clip's — cross-multiplied in integers, so the
    * fingerprint is bit-exact on any engine computing the same samples.
    * Magnitude: e ≤ 2³⁰ per sample, so Σe·n stays inside int64 through
    * ~65 k-sample clips; longer clips would pre-scale energies (one shift,
    * same recipe as x73's scale knob). Empty frames (n < 64) keep bit 0. */
  def ahashWav(b: Array[Byte]): Long = {
    val (bb, _, off, n) = pcm16Data(b)
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var totS = 0L
    var totC = 0L
    var i = 0
    while (i < n) {
      val s = bb.getShort(off + i * 2).toLong
      val f = (i.toLong * 64 / n).toInt
      sums(f) += s * s; cnts(f) += 1
      totS += s * s; totC += 1
      i += 1
    }
    var hash = 0L
    var c = 0
    while (c < 64) {
      if (sums(c) * totC > totS * cnts(c)) hash |= 1L << c
      c += 1
    }
    hash
  }

  // ----------------------------------------------------------------- GFV0
  final case class VideoInfo(nFrames: Int, keyframe: ImageInfo, durationMs: Long)

  def encodeGfv(nFrames: Int, keyframePpm: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + keyframePpm.length).order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.put("GFV0".getBytes("US-ASCII")).putInt(nFrames).put(keyframePpm)
    bb.array()
  }

  /** 25 fps assumed for duration — the container stores only frame count. */
  def decodeGfv(b: Array[Byte]): VideoInfo = {
    require(b.length >= 8 && new String(b, 0, 4, "US-ASCII") == "GFV0", "not a GFV0 container")
    val n = java.nio.ByteBuffer.wrap(b, 4, 4).order(java.nio.ByteOrder.BIG_ENDIAN).getInt
    VideoInfo(n, decodePpm(java.util.Arrays.copyOfRange(b, 8, b.length)), n * 40L)
  }
  /** Per-frame integer WEIGHTED luma sums for a GFV0 video — the
    * deterministic stand-in for "decode frame f": frame f is the
    * keyframe ROTATED by 7 pixels per frame, measured under a FIXED
    * spatial weight mask w_p = 1 + (p mod 3) —
    *   luma(f) = Σ_p (1 + p mod 3) · lum((p + 7f) mod px)
    * with lum(q) the pixel's integer BT.601 sum (299r+587g+114b). The
    * mask is load-bearing: a plain rotated SUM permutes the same byte
    * multiset and every frame measures identical (scene cuts would be
    * structurally impossible); weighting by position makes consecutive
    * frames differ by a content-derived amount, emulating motion under
    * a fixed attention mask. A real MP4 codec would decode the actual
    * frame bytes through this same seam. */
  def frameLumaSums(b: Array[Byte]): Array[Long] = {
    require(b.length >= 8 && new String(b, 0, 4, "US-ASCII") == "GFV0", "not a GFV0 container")
    val nFrames = java.nio.ByteBuffer.wrap(b, 4, 4).order(java.nio.ByteOrder.BIG_ENDIAN).getInt
    val ppm = java.util.Arrays.copyOfRange(b, 8, b.length)
    val (w, h, off) = parsePpmHeader(ppm)
    val px = w * h
    val lum = Array.tabulate(px) { q =>
      299L * (ppm(off + 3 * q) & 0xff) +
        587L * (ppm(off + 3 * q + 1) & 0xff) +
        114L * (ppm(off + 3 * q + 2) & 0xff)
    }
    Array.tabulate(nFrames) { f =>
      var s = 0L
      var p = 0
      while (p < px) {
        s += (1L + p % 3) * lum((p + 7 * f) % px)
        p += 1
      }
      s
    }
  }

}
