package graft.media

/** Binary PPM (P6) encode/decode in pure JVM byte arithmetic — a REAL
  * format parser (handles the spec's whitespace and `#` comment rules),
  * not a stub: any standard 8-bit P6 file from outside parses with it.
  * Compressed images (JPEG/PNG/...) stay out of scope — no codec
  * libraries ship in this environment (the documented seam in
  * MultimodalOps). */
object Ppm {
  final case class Image(width: Int, height: Int, rgb: Array[Byte]) {
    /** Pixel channel c (0=r,1=g,2=b) at (x, y) as unsigned int. */
    def at(x: Int, y: Int, c: Int): Int = rgb((y * width + x) * 3 + c) & 0xff
  }

  def encode(img: Image): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + img.rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.rgb, 0, out, header.length, img.rgb.length)
    out
  }

  /** P6 header grammar: magic, then 3 decimal fields (width, height,
    * maxval) separated by arbitrary whitespace where `#` starts a
    * comment running to end-of-line, then EXACTLY ONE whitespace byte
    * before the binary pixel data. */
  def decode(bytes: Array[Byte]): Image = {
    var pos = 0
    def peek: Int = if (pos < bytes.length) bytes(pos) & 0xff else -1
    def isWs(c: Int) = c == ' ' || c == '\n' || c == '\r' || c == '\t'
    def skipWsAndComments(): Unit = {
      var go = true
      while (go) {
        if (isWs(peek)) pos += 1
        else if (peek == '#') { while (peek != '\n' && peek != -1) pos += 1 }
        else go = false
      }
    }
    def int(): Int = {
      skipWsAndComments()
      require(peek >= '0' && peek <= '9', s"expected digit at byte $pos")
      var v = 0
      while (peek >= '0' && peek <= '9') {
        v = v * 10 + (peek - '0')
        require(v <= 1000000000, "header field overflows")
        pos += 1
      }
      v
    }
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
      "not a P6 PPM")
    pos = 2
    val w = int()
    val h = int()
    val maxval = int()
    require(maxval == 255, s"only 8-bit PPM supported, got maxval $maxval")
    require(isWs(peek), "expected single whitespace before pixel data")
    pos += 1 // exactly one whitespace byte, then raster
    require(w > 0 && h > 0, s"invalid dimensions ${w}x$h")
    // overflow-safe: 65536x65536 would wrap an Int to need=0 and
    // "successfully" decode an impossible image
    val need = w.toLong * h * 3L
    require(need <= Int.MaxValue - 16,
      s"image too large: ${w}x$h needs $need raster bytes")
    require(bytes.length - pos >= need,
      s"truncated raster: need $need bytes, have ${bytes.length - pos}")
    val rgb = java.util.Arrays.copyOfRange(bytes, pos, pos + need.toInt)
    Image(w, h, rgb)
  }

  /** Integer-exact ITU-R 601 luminance (x1000, integer division) —
    * SQL-reproducible bit-for-bit. */
  def luminance(img: Image, x: Int, y: Int): Int =
    (299 * img.at(x, y, 0) + 587 * img.at(x, y, 1) + 114 * img.at(x, y, 2)) / 1000

  /** Mean luminance over all pixels (integer division by the pixel
    * count) — the per-frame scalar the video frame-sampler extracts. */
  def meanLuminance(img: Image): Int = {
    var sum = 0L
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) { sum += luminance(img, x, y); x += 1 }
      y += 1
    }
    (sum / (img.width.toLong * img.height)).toInt
  }

  /** Nearest-neighbor resize of the luminance plane to grid x grid —
    * the standard integer mapping src = (dst * srcDim) / dstDim. The
    * real thumbnail/feature-extraction shape, all integer math. */
  def resizeLuminance(img: Image, grid: Int): Array[Int] = {
    val out = new Array[Int](grid * grid)
    var gy = 0
    while (gy < grid) {
      var gx = 0
      while (gx < grid) {
        val sx = gx * img.width / grid
        val sy = gy * img.height / grid
        out(gy * grid + gx) = luminance(img, sx, sy)
        gx += 1
      }
      gy += 1
    }
    out
  }
}
