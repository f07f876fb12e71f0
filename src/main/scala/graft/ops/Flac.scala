package graft.ops

/** Pure-JVM FLAC codec — the compressed twin of [[Multimodal]]'s
  * WAV/PCM path, built the native-GIF way: a spec walk, no codec
  * dependency. A real audio corpus is mostly compressed; metadata +
  * PCM prove the Spark-side plumbing, this proves the decode.
  *
  * DECODER (the deliverable): parses the `fLaC` stream — STREAMINFO +
  * skipped metadata blocks, then every frame: header (sync, blocking
  * strategy, block-size/sample-rate/sample-size codes, channel
  * assignment, UTF-8-coded frame number, CRC-8 verified), subframes
  * of all four spec types (CONSTANT, VERBATIM, FIXED orders 0-4, LPC
  * orders 1-32) with wasted-bits, Rice residual partitions (4-bit and
  * 5-bit parameter variants, escape partitions), the three stereo
  * decorrelation modes (left/side, right/side, mid/side — side
  * channels carry sample-size+1 bits), byte alignment, CRC-16
  * verified. Fails LOUDLY on any mismatch (sync, CRC, reserved bits)
  * — the repo's codec convention.
  *
  * ENCODER (the fixture side, the [[Multimodal.packWav]] twin):
  * fixed-blocksize frames, per-channel subframes — CONSTANT when a
  * block is flat, VERBATIM for single-sample blocks, else FIXED
  * order 1 with one order-0 Rice partition (parameter fit to the
  * mean residual magnitude). Deterministic bytes for deterministic
  * input, so graded fixtures are stable.
  *
  * Format notes follow the public FLAC format spec (RFC 9639 /
  * xiph.org/flac/format.html).
  */
object Flac {

  /** Decoded stream: `samples` is channel-interleaved, one Int per
    * value (sign-extended to 32 bits whatever the stream's width). */
  final case class FlacAudio(sampleRate: Int, channels: Int, bits: Int,
                             nSamplesPerCh: Long, nFrames: Int,
                             samples: Array[Int]) {
    def durationMs: Double = nSamplesPerCh * 1000.0 / sampleRate
  }

  // ---- bit IO ----------------------------------------------------

  private final class BitWriter {
    private val buf = new scala.collection.mutable.ArrayBuffer[Byte]()
    private var cur = 0
    private var nb = 0
    def writeBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1L).toInt
        nb += 1
        if (nb == 8) { buf += cur.toByte; cur = 0; nb = 0 }
        i -= 1
      }
    }
    def writeUnary(q: Int): Unit = { writeBits(0L, q); writeBits(1L, 1) }
    def align(): Unit = if (nb > 0) writeBits(0L, 8 - nb)
    def bytes: Array[Byte] = { require(nb == 0, "unaligned"); buf.toArray }
  }

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var bit = 0
    def atByteBoundary: Boolean = bit == 0
    def readBit(): Int = {
      require(pos < b.length, s"FLAC: bitstream truncated at byte $pos")
      val v = (b(pos) >> (7 - bit)) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      v
    }
    def readBits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def readSigned(n: Int): Int = {
      val v = readBits(n)
      ((v << (64 - n)).toLong >> (64 - n)).toInt
    }
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) q += 1
      q
    }
    def align(): Unit = if (bit != 0) { bit = 0; pos += 1 }
  }

  // ---- CRCs (frame header CRC-8 poly 0x07; frame CRC-16 poly 0x8005) --

  private[graft] def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xff
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  private[graft] def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
              else (crc << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    crc
  }

  // ---- UTF-8-style coded number (frame/sample number) -------------

  private def writeUtf8Num(w: BitWriter, v: Long): Unit = {
    if (v < 0x80) w.writeBits(v, 8)
    else if (v < 0x800) {
      w.writeBits(0xC0L | (v >> 6), 8); w.writeBits(0x80L | (v & 0x3F), 8)
    } else if (v < 0x10000) {
      w.writeBits(0xE0L | (v >> 12), 8)
      w.writeBits(0x80L | ((v >> 6) & 0x3F), 8)
      w.writeBits(0x80L | (v & 0x3F), 8)
    } else {
      require(v < 0x200000, s"frame number $v out of fixture range")
      w.writeBits(0xF0L | (v >> 18), 8)
      w.writeBits(0x80L | ((v >> 12) & 0x3F), 8)
      w.writeBits(0x80L | ((v >> 6) & 0x3F), 8)
      w.writeBits(0x80L | (v & 0x3F), 8)
    }
  }

  private def readUtf8Num(r: BitReader): Long = {
    val b0 = r.readBits(8).toInt
    val extra =
      if ((b0 & 0x80) == 0) return b0.toLong
      else if ((b0 & 0xE0) == 0xC0) 1
      else if ((b0 & 0xF0) == 0xE0) 2
      else if ((b0 & 0xF8) == 0xF0) 3
      else if ((b0 & 0xFC) == 0xF8) 4
      else if ((b0 & 0xFE) == 0xFC) 5
      else if (b0 == 0xFE) 6
      else throw new IllegalArgumentException(s"FLAC: bad coded-number lead byte $b0")
    var v = (b0 & (0x7F >> extra)).toLong
    var i = 0
    while (i < extra) {
      val bn = r.readBits(8).toInt
      require((bn & 0xC0) == 0x80, s"FLAC: bad coded-number continuation $bn")
      v = (v << 6) | (bn & 0x3F)
      i += 1
    }
    v
  }

  // ---- encoder -----------------------------------------------------

  /** Encode channel-interleaved `samples` (each within `bits`-bit
    * signed range) as a spec-conformant FLAC stream. Frames hold up
    * to `blockSize` samples per channel; the last frame is shorter.
    * Subframes: CONSTANT / VERBATIM / FIXED order 1 + one Rice
    * partition — enough to exercise the decoder's prediction and
    * Rice paths on every multi-sample fixture. */
  def pack(rate: Int, channels: Int, bits: Int, samples: Array[Int],
           blockSize: Int = 4096): Array[Byte] = {
    require(rate > 0 && rate < (1 << 20), s"bad rate $rate")
    require(channels >= 1 && channels <= 8, s"bad channels $channels")
    require(bits >= 8 && bits <= 24, s"bad bits $bits")
    require(blockSize >= 1 && blockSize <= 65536, s"bad blockSize $blockSize")
    require(samples.length % channels == 0,
      s"${samples.length} samples not divisible by $channels channels")
    val lim = 1 << (bits - 1)
    require(samples.forall(s => s >= -lim && s < lim),
      s"sample out of $bits-bit range")
    val nPerCh = samples.length / channels
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    // STREAMINFO: last-metadata flag + type 0, length 34
    val si = new BitWriter
    si.writeBits(1L, 1); si.writeBits(0L, 7); si.writeBits(34L, 24)
    val bsField = math.max(blockSize, 16) // spec floor; informational here
    si.writeBits(bsField.toLong, 16); si.writeBits(bsField.toLong, 16)
    si.writeBits(0L, 24); si.writeBits(0L, 24) // frame sizes unknown
    si.writeBits(rate.toLong, 20)
    si.writeBits((channels - 1).toLong, 3)
    si.writeBits((bits - 1).toLong, 5)
    si.writeBits(nPerCh.toLong, 36)
    si.writeBits(0L, 64); si.writeBits(0L, 64) // MD5 unset
    out.write(si.bytes)
    var off = 0
    var frameIdx = 0L
    while (off < nPerCh) { // zero-sample stream: no frames at all
      val bs = math.min(blockSize, nPerCh - off)
      val w = new BitWriter
      w.writeBits(0x3FFEL, 14) // sync
      w.writeBits(0L, 1) // reserved
      w.writeBits(0L, 1) // fixed-blocksize strategy: frame number coded
      val bsCode = if (bs <= 256) 6 else 7
      w.writeBits(bsCode.toLong, 4)
      w.writeBits(0L, 4) // sample rate: from STREAMINFO
      w.writeBits((channels - 1).toLong, 4) // independent channels
      val ssCode = bits match {
        case 8 => 1; case 16 => 4; case 24 => 6
        case _ => 0 // from STREAMINFO
      }
      w.writeBits(ssCode.toLong, 3)
      w.writeBits(0L, 1) // reserved
      writeUtf8Num(w, frameIdx)
      if (bsCode == 6) w.writeBits((bs - 1).toLong, 8)
      else w.writeBits((bs - 1).toLong, 16)
      val headerBytes = { w.align(); w.bytes } // header is byte-aligned here
      val wf = new BitWriter
      headerBytes.foreach(b => wf.writeBits(b & 0xffL, 8))
      wf.writeBits(crc8(headerBytes, 0, headerBytes.length).toLong, 8)
      for (c <- 0 until channels) {
        val ch = Array.tabulate(bs)(i => samples((off + i) * channels + c))
        writeSubframe(wf, ch, bits)
      }
      wf.align()
      val body = wf.bytes
      out.write(body)
      val crc = crc16(body, 0, body.length)
      out.write((crc >> 8) & 0xff); out.write(crc & 0xff)
      off += bs
      frameIdx += 1
    }
    out.toByteArray
  }

  private def writeSubframe(w: BitWriter, ch: Array[Int], bits: Int): Unit = {
    val allEq = ch.forall(_ == ch(0))
    w.writeBits(0L, 1) // zero pad
    if (allEq) {
      w.writeBits(0L, 6) // CONSTANT
      w.writeBits(0L, 1) // no wasted bits
      w.writeBits((ch(0).toLong << (64 - bits)) >>> (64 - bits), bits)
    } else if (ch.length == 1) {
      w.writeBits(1L, 6) // VERBATIM
      w.writeBits(0L, 1)
      w.writeBits((ch(0).toLong << (64 - bits)) >>> (64 - bits), bits)
    } else {
      w.writeBits(0x08L | 1L, 6) // FIXED, order 1 (001001)
      w.writeBits(0L, 1) // no wasted bits
      w.writeBits((ch(0).toLong << (64 - bits)) >>> (64 - bits), bits) // warmup
      val res = Array.tabulate(ch.length - 1)(i => ch(i + 1) - ch(i))
      // rice parameter ~ log2(mean |residual|) (Robinson's estimate)
      val mean = if (res.isEmpty) 0L else res.map(r => math.abs(r.toLong)).sum / res.length
      var k = 0
      while ((1L << k) < mean + 1 && k < 14) k += 1
      w.writeBits(0L, 2) // residual method: 4-bit Rice
      w.writeBits(0L, 4) // partition order 0
      w.writeBits(k.toLong, 4)
      res.foreach { r =>
        val u = (r.toLong << 1) ^ (r.toLong >> 63) // zigzag
        w.writeUnary((u >>> k).toInt)
        if (k > 0) w.writeBits(u & ((1L << k) - 1), k)
      }
    }
  }

  // ---- decoder -----------------------------------------------------

  def decode(bytes: Array[Byte]): FlacAudio = {
    require(bytes.length >= 42 &&
      new String(bytes, 0, 4, "US-ASCII") == "fLaC", "not a FLAC stream")
    var pos = 4
    // metadata blocks; first MUST be STREAMINFO
    var last = false
    var first = true
    var rate = 0; var channels = 0; var bits = 0; var total = 0L
    while (!last) {
      require(pos + 4 <= bytes.length,
        s"FLAC: truncated metadata block header at byte $pos")
      val h = bytes(pos) & 0xff
      last = (h & 0x80) != 0
      val typ = h & 0x7f
      val len = ((bytes(pos + 1) & 0xff) << 16) | ((bytes(pos + 2) & 0xff) << 8) |
        (bytes(pos + 3) & 0xff)
      require(pos + 4 + len <= bytes.length,
        s"FLAC: metadata block (type $typ, length $len) at byte $pos overruns the stream")
      if (first) {
        require(typ == 0, s"FLAC: first metadata block is type $typ, not STREAMINFO")
        require(len == 34, s"FLAC: STREAMINFO length $len != 34")
        val r = new BitReader(bytes, pos + 4)
        r.readBits(16); r.readBits(16); r.readBits(24); r.readBits(24)
        rate = r.readBits(20).toInt
        channels = r.readBits(3).toInt + 1
        bits = r.readBits(5).toInt + 1
        total = r.readBits(36)
        first = false
      } else require(typ != 0, "FLAC: duplicate STREAMINFO")
      pos += 4 + len
    }
    require(rate > 0, s"FLAC: STREAMINFO sample rate 0")
    val outBuf = new scala.collection.mutable.ArrayBuffer[Int](
      math.min(total * channels, 1 << 22).toInt.max(16))
    var decoded = 0L
    var nFrames = 0
    while (decoded < total || (total == 0 && pos < bytes.length)) {
      val frameStart = pos
      val r = new BitReader(bytes, pos)
      require(r.readBits(14) == 0x3FFE, s"FLAC: lost frame sync at byte $frameStart")
      require(r.readBits(1) == 0, "FLAC: reserved bit set in frame header")
      val variable = r.readBits(1) == 1
      val bsCode = r.readBits(4).toInt
      val srCode = r.readBits(4).toInt
      val chAsgn = r.readBits(4).toInt
      val ssCode = r.readBits(3).toInt
      require(r.readBits(1) == 0, "FLAC: reserved bit set in frame header")
      readUtf8Num(r) // frame (or first-sample) number; sequencing not enforced
      val bs = bsCode match {
        case 0 => throw new IllegalArgumentException("FLAC: reserved blocksize code 0")
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => r.readBits(8).toInt + 1
        case 7 => r.readBits(16).toInt + 1
        case c => 256 << (c - 8)
      }
      srCode match { // value only needed when it overrides STREAMINFO
        case 12 => r.readBits(8)
        case 13 | 14 => r.readBits(16)
        case 15 => throw new IllegalArgumentException("FLAC: invalid sample-rate code 15")
        case _ => ()
      }
      val frameBits = ssCode match {
        case 0 => bits
        case 1 => 8
        case 2 => 12
        case 4 => 16
        case 5 => 20
        case 6 => 24
        case 7 => 32
        case _ => throw new IllegalArgumentException(s"FLAC: reserved sample-size code $ssCode")
      }
      val _ = variable
      // CRC-8 covers the header bytes read so far
      require(r.atByteBoundary, "FLAC: frame header not byte-aligned before CRC-8")
      val want8 = crc8(bytes, frameStart, r.pos)
      require(r.readBits(8).toInt == want8, "FLAC: frame header CRC-8 mismatch")
      require(chAsgn <= 10,
        s"FLAC: reserved channel-assignment code $chAsgn (RFC 9639 allows 0-10)")
      val nCh = if (chAsgn < 8) chAsgn + 1 else 2
      require(nCh == channels,
        s"FLAC: frame channel count $nCh != STREAMINFO $channels")
      val chans = Array.ofDim[Array[Int]](nCh)
      for (c <- 0 until nCh) {
        // side channels carry one extra bit
        val sb = chAsgn match {
          case 8 => if (c == 1) frameBits + 1 else frameBits // left/side
          case 9 => if (c == 0) frameBits + 1 else frameBits // side/right
          case 10 => if (c == 1) frameBits + 1 else frameBits // mid/side
          case _ => frameBits
        }
        chans(c) = readSubframe(r, bs, sb)
      }
      // stereo decorrelation
      chAsgn match {
        case 8 => // left/side: right = left - side
          var i = 0
          while (i < bs) { chans(1)(i) = chans(0)(i) - chans(1)(i); i += 1 }
        case 9 => // side/right: left = side + right
          val side = chans(0)
          var i = 0
          while (i < bs) { side(i) = side(i) + chans(1)(i); i += 1 }
        case 10 => // mid/side
          var i = 0
          while (i < bs) {
            val side = chans(1)(i)
            var mid = chans(0)(i) << 1
            mid |= (side & 1) // lost LSB of mid rides the side parity
            chans(0)(i) = (mid + side) >> 1
            chans(1)(i) = (mid - side) >> 1
            i += 1
          }
        case _ => ()
      }
      r.align()
      val want16 = crc16(bytes, frameStart, r.pos)
      val got16 = r.readBits(16).toInt
      require(got16 == want16,
        s"FLAC: frame CRC-16 mismatch (got $got16, want $want16)")
      var i = 0
      while (i < bs) {
        var c = 0
        while (c < nCh) { outBuf += chans(c)(i); c += 1 }
        i += 1
      }
      decoded += bs
      nFrames += 1
      pos = r.pos
    }
    require(total == 0 || decoded == total,
      s"FLAC: decoded $decoded samples, STREAMINFO promised $total")
    FlacAudio(rate, channels, bits, decoded, nFrames, outBuf.toArray)
  }

  private def readSubframe(r: BitReader, bs: Int, bits: Int): Array[Int] = {
    require(r.readBits(1) == 0, "FLAC: subframe pad bit set")
    val typ = r.readBits(6).toInt
    val wasted =
      if (r.readBits(1) == 1) r.readUnary() + 1
      else 0
    val eb = bits - wasted
    val out =
      if (typ == 0) { // CONSTANT
        val v = r.readSigned(eb)
        Array.fill(bs)(v)
      } else if (typ == 1) { // VERBATIM
        Array.fill(bs)(r.readSigned(eb))
      } else if ((typ & 0x38) == 0x08 && (typ & 0x07) <= 4) { // FIXED
        val order = typ & 0x07
        val out = new Array[Int](bs)
        var i = 0
        while (i < order) { out(i) = r.readSigned(eb); i += 1 }
        val res = readResiduals(r, bs, order)
        while (i < bs) {
          val e = res(i - order).toLong
          out(i) = (order match {
            case 0 => e
            case 1 => e + out(i - 1)
            case 2 => e + 2L * out(i - 1) - out(i - 2)
            case 3 => e + 3L * out(i - 1) - 3L * out(i - 2) + out(i - 3)
            case 4 => e + 4L * out(i - 1) - 6L * out(i - 2) + 4L * out(i - 3) - out(i - 4)
          }).toInt
          i += 1
        }
        out
      } else if ((typ & 0x20) != 0) { // LPC
        val order = (typ & 0x1f) + 1
        val out = new Array[Int](bs)
        var i = 0
        while (i < order) { out(i) = r.readSigned(eb); i += 1 }
        val prec = r.readBits(4).toInt + 1
        require(prec <= 15, "FLAC: invalid QLP precision 16")
        val shift = r.readSigned(5)
        require(shift >= 0, s"FLAC: negative QLP shift $shift")
        val coefs = Array.fill(order)(r.readSigned(prec))
        val res = readResiduals(r, bs, order)
        while (i < bs) {
          var pred = 0L
          var j = 0
          while (j < order) { pred += coefs(j).toLong * out(i - 1 - j); j += 1 }
          out(i) = ((pred >> shift) + res(i - order)).toInt
          i += 1
        }
        out
      } else throw new IllegalArgumentException(s"FLAC: reserved subframe type $typ")
    if (wasted > 0) {
      var i = 0
      while (i < bs) { out(i) = out(i) << wasted; i += 1 }
    }
    out
  }

  private def readResiduals(r: BitReader, bs: Int, order: Int): Array[Int] = {
    val method = r.readBits(2).toInt
    require(method <= 1, s"FLAC: reserved residual method $method")
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    val po = r.readBits(4).toInt
    val nPart = 1 << po
    require(bs % nPart == 0,
      s"FLAC: blocksize $bs not divisible into 2^$po partitions")
    val out = new Array[Int](bs - order)
    var idx = 0
    var p = 0
    while (p < nPart) {
      val cnt = (if (p == 0) bs / nPart - order else bs / nPart)
      require(cnt >= 0, s"FLAC: negative partition count (order $order, bs $bs, po $po)")
      val param = r.readBits(pBits).toInt
      if (param == escape) {
        val raw = r.readBits(5).toInt
        var i = 0
        while (i < cnt) {
          out(idx) = if (raw == 0) 0 else r.readSigned(raw)
          idx += 1; i += 1
        }
      } else {
        var i = 0
        while (i < cnt) {
          val q = r.readUnary().toLong
          val u = (q << param) | (if (param > 0) r.readBits(param) else 0L)
          out(idx) = ((u >>> 1) ^ -(u & 1L)).toInt // un-zigzag
          idx += 1; i += 1
        }
      }
      p += 1
    }
    out
  }
}
