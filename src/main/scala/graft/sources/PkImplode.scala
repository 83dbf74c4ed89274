package graft.sources

import java.io.ByteArrayOutputStream

/** PKWARE Data Compression Library "implode" codec, pure Scala/JVM.
  *
  * DATASUS distributes `.dbc` files whose DBF record block is compressed
  * with this 1990 PKWARE format (the reference decompresses it upstream of
  * `extrair_dbc_lotes`, utilitarios/datasus_ftp.py:142). The format is
  * public — specified by PKWARE's appnote and re-documented by zlib's
  * contrib `blast` — and small: an LZ77 window of 1/2/4 KiB with three
  * fixed, format-defined canonical Huffman codes (length: 16 symbols,
  * distance high-bits: 64, coded literals: 256).
  *
  * Stream layout (all raw bit fields little-endian, LSB first):
  *   byte 0: literal mode — 0 = raw 8-bit literals, 1 = Huffman-coded
  *   byte 1: dictBits ∈ {4,5,6} — log2(window) − 6
  *   then items, each preceded by 1 flag bit:
  *     0 → one literal
  *     1 → length/distance pair: length = huffman symbol → base + extra
  *         raw bits; length 519 terminates the stream; distance − 1 =
  *         (huffman high bits << k) | k raw low bits, where k = 2 when
  *         length == 2, else dictBits
  * Huffman codes are read one bit at a time, INVERTED, first-read bit
  * most significant; symbols are canonical by (code length, symbol).
  *
  * The fixed code tables are stored run-length packed exactly as the
  * format defines them (low nibble = code length, high nibble = run − 1);
  * all three expand to complete codes (Kraft sum exactly 1) and the
  * decoder reproduces the published conformance vector
  * `00 04 82 24 25 8f 80 7f` → "AIAIAIAIAIAIA" (see PkImplodeSpec).
  *
  * [[implode]] emits raw-literal mode with the full 4 KiB window and a
  * greedy hash-chain matcher — any spec-conformant stream is valid; match
  * quality only affects size. [[explode]] accepts both literal modes and
  * all three window sizes. Per-file codec: `.dbc` files are many and
  * modest, so parallelism comes from the file axis (binaryFile source),
  * matching the DBF record layer's scale shape.
  */
object PkImplode {

  /** length-symbol base values and extra-bit counts (format constants) */
  private val LenBase = Array(3, 2, 4, 5, 6, 7, 8, 9, 10, 12, 16, 24, 40, 72, 136, 264)
  private val LenExtra = Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8)
  private val EndLen = 519 // length value that terminates the stream

  /** run-length packed code lengths (format constants) */
  private val LenCodeLens = expand(Array(2, 35, 36, 53, 38, 23), 16)
  private val DistCodeLens = expand(Array(2, 20, 53, 230, 247, 151, 248), 64)
  private val LitCodeLens = expand(Array(
    11, 124, 8, 7, 28, 7, 188, 13, 76, 4, 10, 8, 12, 10, 12, 10, 8, 23, 8,
    9, 7, 6, 7, 8, 7, 6, 55, 8, 23, 24, 12, 11, 7, 9, 11, 12, 6, 7, 22, 5,
    7, 24, 6, 11, 9, 6, 7, 22, 7, 11, 38, 7, 9, 8, 25, 11, 8, 11, 9, 12,
    8, 12, 5, 38, 5, 38, 5, 11, 7, 5, 6, 21, 6, 10, 53, 8, 7, 24, 10, 27,
    44, 253, 253, 253, 252, 252, 252, 13, 12, 45, 12, 45, 12, 61, 12, 45,
    44, 173), 256)

  private def expand(packed: Array[Int], n: Int): Array[Int] = {
    val out = new Array[Int](n)
    var i = 0
    packed.foreach { b =>
      val len = b & 15
      var rep = (b >> 4) + 1
      while (rep > 0) { out(i) = len; i += 1; rep -= 1 }
    }
    require(i == n, s"packed code table expanded to $i symbols, expected $n")
    out
  }

  /** canonical decode tables: symbol count per code length + symbols
    * ordered by (length, symbol)
    */
  private final class Huffman(lengths: Array[Int]) {
    val maxLen: Int = lengths.max
    val count: Array[Int] = {
      val c = new Array[Int](maxLen + 1)
      lengths.foreach(l => c(l) += 1)
      c
    }
    val symbol: Array[Int] = {
      val offs = new Array[Int](maxLen + 2)
      for (l <- 1 to maxLen) offs(l + 1) = offs(l) + count(l)
      val sym = new Array[Int](lengths.length)
      val o = offs.clone()
      lengths.zipWithIndex.foreach { case (l, s) =>
        if (l > 0) { sym(o(l)) = s; o(l) += 1 }
      }
      sym
    }
    /** (code, length) per symbol, for the encoder */
    def encodeTable: Array[(Int, Int)] = {
      val enc = new Array[(Int, Int)](symbol.length)
      var first = 0
      var index = 0
      for (l <- 1 to maxLen) {
        for (k <- 0 until count(l)) enc(symbol(index + k)) = (first + k, l)
        index += count(l)
        first = (first + count(l)) << 1
      }
      enc
    }
  }

  private val LenCode = new Huffman(LenCodeLens)
  private val DistCode = new Huffman(DistCodeLens)
  private val LitCode = new Huffman(LitCodeLens)

  private final class BitReader(data: Array[Byte]) {
    private var pos = 0
    private var buf = 0L
    private var n = 0
    def bits(k: Int): Int = {
      while (n < k) {
        require(pos < data.length, "truncated implode stream")
        buf |= (data(pos) & 0xFFL) << n
        pos += 1
        n += 8
      }
      val v = (buf & ((1L << k) - 1)).toInt
      buf >>>= k
      n -= k
      v
    }
    def decode(h: Huffman): Int = {
      var code = 0
      var first = 0
      var index = 0
      var len = 1
      while (true) {
        code |= bits(1) ^ 1 // codes are stored inverted
        val c = if (len <= h.maxLen) h.count(len) else 0
        if (code - first < c) return h.symbol(index + (code - first))
        require(len < h.maxLen, "invalid huffman code in implode stream")
        index += c
        first = (first + c) << 1
        code <<= 1
        len += 1
      }
      -1 // unreachable
    }
  }

  /** Decompress a complete imploded stream. */
  def explode(data: Array[Byte]): Array[Byte] = {
    val s = new BitReader(data)
    val litMode = s.bits(8)
    val dictBits = s.bits(8)
    require(litMode == 0 || litMode == 1, s"bad literal mode $litMode")
    require(dictBits >= 4 && dictBits <= 6, s"bad dictionary size $dictBits")
    var outArr = new Array[Byte](math.max(64, data.length * 4))
    var outLen = 0
    def append(b: Byte): Unit = {
      if (outLen == outArr.length) outArr = java.util.Arrays.copyOf(outArr, outArr.length * 2)
      outArr(outLen) = b
      outLen += 1
    }
    var done = false
    while (!done) {
      if (s.bits(1) == 1) {
        val sym = s.decode(LenCode)
        val len = LenBase(sym) + s.bits(LenExtra(sym))
        if (len == EndLen) done = true
        else {
          val k = if (len == 2) 2 else dictBits
          val dist = (s.decode(DistCode) << k) + s.bits(k) + 1
          require(dist <= outLen, s"implode distance $dist beyond output $outLen")
          var i = 0
          while (i < len) { append(outArr(outLen - dist)); i += 1 }
        }
      } else {
        append((if (litMode == 1) s.decode(LitCode) else s.bits(8)).toByte)
      }
    }
    java.util.Arrays.copyOf(outArr, outLen)
  }

  private final class BitWriter {
    private val out = new ByteArrayOutputStream()
    private var buf = 0
    private var n = 0
    def bits(v: Int, k: Int): Unit = { // k raw bits, LSB first
      buf |= (v & ((1 << k) - 1)) << n
      n += k
      while (n >= 8) { out.write(buf & 0xFF); buf >>>= 8; n -= 8 }
    }
    def code(c: Int, len: Int): Unit = { // huffman: MSB first, inverted
      var i = len - 1
      while (i >= 0) { bits(((c >> i) & 1) ^ 1, 1); i -= 1 }
    }
    def result(): Array[Byte] = {
      if (n > 0) { out.write(buf & 0xFF); buf = 0; n = 0 }
      out.toByteArray
    }
  }

  private val MaxDist = 4096 // dictBits = 6
  private val MaxLen = 518 // 519 is the end marker
  private val MinLen = 3 // length-2 pairs narrow the window; literals are fine

  /** Compress with raw literals, 4 KiB window, greedy hash-chain matching. */
  def implode(data: Array[Byte]): Array[Byte] = {
    val w = new BitWriter
    w.bits(0, 8) // raw literal mode
    w.bits(6, 8) // dictBits
    val lenEnc = LenCode.encodeTable
    val distEnc = DistCode.encodeTable
    val head = new Array[Int](1 << 15)
    val prev = new Array[Int](MaxDist)
    java.util.Arrays.fill(head, -1)
    def hash(i: Int): Int =
      ((data(i) & 0xFF) * 506832829 + (data(i + 1) & 0xFF) * 2654435761L.toInt +
        (data(i + 2) & 0xFF)) >>> 17
    def emitLen(len: Int): Unit = {
      var sym = 15
      var found = false
      var j = 0
      while (!found && j < 16) {
        val hi = LenBase(j) + (1 << LenExtra(j)) - 1
        if (len >= LenBase(j) && len <= hi && !(j == 15 && len == EndLen)) {
          sym = j; found = true
        }
        j += 1
      }
      require(found, s"unencodable length $len")
      val (c, l) = lenEnc(sym)
      w.code(c, l)
      w.bits(len - LenBase(sym), LenExtra(sym))
    }
    var i = 0
    while (i < data.length) {
      var bestLen = 0
      var bestDist = 0
      if (i + MinLen <= data.length) {
        var cand = head(hash(i))
        var chain = 32
        while (cand >= 0 && chain > 0 && i - cand <= MaxDist) {
          var l = 0
          val cap = math.min(MaxLen, data.length - i)
          while (l < cap && data(cand + l) == data(i + l)) l += 1
          if (l > bestLen) { bestLen = l; bestDist = i - cand }
          cand = prev(cand & (MaxDist - 1))
          if (cand >= 0 && i - cand > MaxDist) cand = -1
          chain -= 1
        }
      }
      if (bestLen >= MinLen) {
        w.bits(1, 1)
        emitLen(bestLen)
        val (dc, dl) = distEnc((bestDist - 1) >> 6)
        w.code(dc, dl)
        w.bits((bestDist - 1) & 63, 6)
        var j = 0
        while (j < bestLen && i + j + MinLen <= data.length) {
          val h = hash(i + j)
          prev((i + j) & (MaxDist - 1)) = head(h)
          head(h) = i + j
          j += 1
        }
        i += bestLen
      } else {
        w.bits(0, 1)
        w.bits(data(i) & 0xFF, 8)
        if (i + MinLen <= data.length) {
          val h = hash(i)
          prev(i & (MaxDist - 1)) = head(h)
          head(h) = i
        }
        i += 1
      }
    }
    w.bits(1, 1) // end marker: length 519
    val (c, l) = lenEnc(15)
    w.code(c, l)
    w.bits(EndLen - LenBase(15), LenExtra(15))
    w.result()
  }
}
