package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Flac

/** FLAC codec spec: encoder→decoder round-trips across the shapes the
  * graded query draws, plus hand-built bitstreams for the decoder
  * paths the fixture encoder never emits (LPC, escape partitions,
  * higher fixed orders, stereo decorrelation, wasted bits) and loud
  * failures on corrupt streams. */
class FlacSpec extends AnyFunSuite {

  private def rt(rate: Int, ch: Int, bits: Int, samples: Array[Int],
                 blockSize: Int = 4096): Flac.FlacAudio = {
    val a = Flac.decode(Flac.pack(rate, ch, bits, samples, blockSize))
    assert(a.sampleRate == rate && a.channels == ch && a.bits == bits)
    assert(a.samples.toSeq == samples.toSeq,
      s"round-trip drift: ${a.samples.toSeq.take(8)} vs ${samples.toSeq.take(8)}")
    a
  }

  test("round-trip: mono 16-bit, multi-frame, mixed subframe types") {
    val s = Array.tabulate(97)(i => ((i * 761 + 13) % 4001) - 2000)
    val a = rt(8000, 1, 16, s, blockSize = 32)
    assert(a.nFrames == 4 && a.nSamplesPerCh == 97) // 32+32+32+1 (verbatim tail)
    assert(a.durationMs == 97 * 1000.0 / 8000)
  }

  test("round-trip: stereo interleaved, 16-bit") {
    val s = Array.tabulate(120)(i => ((i * 397 + 5) % 3001) - 1500)
    val a = rt(16000, 2, 16, s, blockSize = 16)
    assert(a.nSamplesPerCh == 60 && a.nFrames == 4)
  }

  test("round-trip: 8-bit and 24-bit widths; constant and single-sample blocks") {
    rt(44100, 1, 8, Array.tabulate(50)(i => (i % 17) - 8), blockSize = 10)
    rt(48000, 1, 24, Array.tabulate(33)(i => i * 100000 - 1600000), blockSize = 32)
    rt(8000, 1, 16, Array.fill(40)(1234), blockSize = 8) // all-constant frames
    rt(8000, 1, 16, Array(-7), blockSize = 4096) // one verbatim sample
    rt(8000, 1, 16, Array.empty[Int]) // zero-sample stream, no frames
  }

  test("extreme residuals: full-range 16-bit sawtooth survives Rice coding") {
    val s = Array.tabulate(64)(i => if (i % 2 == 0) -32768 else 32767)
    rt(8000, 1, 16, s, blockSize = 64)
  }

  /** Hand-built frame bytes for decoder paths the encoder never
    * emits: a builder mirroring the spec, independent of pack(). */
  private def handFrame(build: HandWriter => Unit): Array[Byte] = {
    val w = new HandWriter
    build(w)
    w.finish()
  }

  private final class HandWriter {
    val bw = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nb = 0
    def bits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1L).toInt; nb += 1
        if (nb == 8) { bw.write(cur); cur = 0; nb = 0 }
        i -= 1
      }
    }
    def unary(q: Int): Unit = { bits(0, q); bits(1, 1) }
    def rice(v: Int, k: Int): Unit = {
      val u = (v.toLong << 1) ^ (v.toLong >> 63)
      unary((u >>> k).toInt); if (k > 0) bits(u & ((1L << k) - 1), k)
    }
    def align(): Unit = if (nb > 0) bits(0, 8 - nb)
    def finish(): Array[Byte] = { align(); bw.toByteArray }
  }

  /** Wrap hand-built frame content (after the CRC-8 position) in a
    * valid stream: fLaC + STREAMINFO + header(+crc8) + body(+crc16). */
  private def wrapStream(rate: Int, ch: Int, bits: Int, total: Long,
                         chAsgn: Int, bs: Int)(body: HandWriter => Unit): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    val si = new HandWriter
    si.bits(1, 1); si.bits(0, 7); si.bits(34, 24)
    si.bits(16, 16); si.bits(16, 16); si.bits(0, 24); si.bits(0, 24)
    si.bits(rate.toLong, 20); si.bits((ch - 1).toLong, 3)
    si.bits((bits - 1).toLong, 5); si.bits(total, 36)
    si.bits(0, 64); si.bits(0, 64)
    out.write(si.finish())
    val hdr = new HandWriter
    hdr.bits(0x3FFE, 14); hdr.bits(0, 1); hdr.bits(0, 1)
    hdr.bits(6, 4) // 8-bit blocksize-1 follows
    hdr.bits(0, 4) // rate from STREAMINFO
    hdr.bits(chAsgn.toLong, 4)
    hdr.bits(bits match { case 8 => 1; case 16 => 4; case 24 => 6; case _ => 0 }, 3)
    hdr.bits(0, 1)
    hdr.bits(0, 8) // frame number 0 (utf8, 1 byte)
    hdr.bits((bs - 1).toLong, 8)
    val hb = hdr.finish()
    val frame = new HandWriter
    hb.foreach(b => frame.bits(b & 0xffL, 8))
    frame.bits(Flac.crc8(hb, 0, hb.length).toLong, 8)
    body(frame)
    frame.align()
    val fb = frame.finish()
    out.write(fb)
    val c16 = Flac.crc16(fb, 0, fb.length)
    out.write((c16 >> 8) & 0xff); out.write(c16 & 0xff)
    out.toByteArray
  }

  test("hand-built: LPC subframe (order 2, shifted coefficients)") {
    // x0=100, x1=110 warmup; coefs (2, -1) shift 0 -> pure order-2
    // fixed equivalent; residuals +1 each step: x2=121, x3=133
    val b = wrapStream(8000, 1, 16, 4, chAsgn = 0, bs = 4) { f =>
      f.bits(0, 1); f.bits(0x20L | 1L, 6); f.bits(0, 1) // LPC order 2
      f.bits(100, 16); f.bits(110, 16) // warmup
      f.bits(4 - 1, 4) // precision-1 = 3 -> 4-bit coefs
      f.bits(0, 5) // shift 0
      f.bits(2, 4); f.bits((-1 & 0xf).toLong, 4) // coefs 2, -1
      f.bits(0, 2); f.bits(0, 4) // rice, partition order 0
      f.bits(0, 4) // param 0
      f.rice(1, 0); f.rice(1, 0) // residuals
    }
    val a = Flac.decode(b)
    assert(a.samples.toSeq == Seq(100, 110, 121, 133), a.samples.toSeq.toString)
  }

  test("hand-built: fixed order 2 + TWO rice partitions + escape partition") {
    // bs=8, order 2: partitions of (8/2 - 2)=2 and 4 residuals
    val b = wrapStream(8000, 1, 16, 8, chAsgn = 0, bs = 8) { f =>
      f.bits(0, 1); f.bits(0x08L | 2L, 6); f.bits(0, 1) // FIXED order 2
      f.bits(10, 16); f.bits(20, 16) // warmup
      f.bits(0, 2); f.bits(1, 4) // rice 4-bit, partition order 1
      f.bits(2, 4) // partition 0: param 2
      f.rice(3, 2); f.rice(-4, 2)
      f.bits(15, 4) // partition 1: ESCAPE
      f.bits(6, 5) // 6-bit raw residuals
      Seq(5, -9, 0, 31).foreach(v => f.bits((v.toLong << 58) >>> 58, 6))
    }
    val a = Flac.decode(b)
    // x_i = e + 2x_{i-1} - x_{i-2}, warmup (10, 20)
    val full = Seq(3, -4, 5, -9, 0, 31).foldLeft(List(20, 10)) { (acc, e) =>
      (e + 2 * acc.head - acc(1)) :: acc
    }.reverse
    assert(a.samples.toSeq == full, s"${a.samples.toSeq} vs $full")
  }

  test("hand-built: mid/side stereo reconstruction (odd sum exercises the lost LSB)") {
    // L=101, R=50 -> mid=(101+50)>>1=75, side=51 (odd: LSB rides side parity)
    val b = wrapStream(8000, 2, 16, 1, chAsgn = 10, bs = 1) { f =>
      f.bits(0, 1); f.bits(1, 6); f.bits(0, 1); f.bits(75, 16) // mid (verbatim)
      f.bits(0, 1); f.bits(1, 6); f.bits(0, 1); f.bits(51, 17) // side: bits+1
    }
    val a = Flac.decode(b)
    assert(a.samples.toSeq == Seq(101, 50), a.samples.toSeq.toString)
  }

  test("hand-built: left/side and right/side decorrelation") {
    val ls = Flac.decode(wrapStream(8000, 2, 16, 1, chAsgn = 8, bs = 1) { f =>
      f.bits(0, 1); f.bits(1, 6); f.bits(0, 1); f.bits(70, 16) // left
      f.bits(0, 1); f.bits(1, 6); f.bits(0, 1); f.bits(30, 17) // side = L-R
    })
    assert(ls.samples.toSeq == Seq(70, 40), ls.samples.toSeq.toString)
    val rs = Flac.decode(wrapStream(8000, 2, 16, 1, chAsgn = 9, bs = 1) { f =>
      f.bits(0, 1); f.bits(1, 6); f.bits(0, 1); f.bits(30, 17) // side = L-R
      f.bits(0, 1); f.bits(1, 6); f.bits(0, 1); f.bits(40, 16) // right
    })
    assert(rs.samples.toSeq == Seq(70, 40), rs.samples.toSeq.toString)
  }

  test("hand-built: wasted bits shift decoded values back up") {
    // constant subframe, 1 wasted bit: stored value 21 -> emitted 42
    val b = wrapStream(8000, 1, 16, 3, chAsgn = 0, bs = 3) { f =>
      f.bits(0, 1); f.bits(0, 6) // CONSTANT
      f.bits(1, 1); f.unary(0) // wasted-bits flag, unary 0 -> 1 wasted bit
      f.bits(21, 15) // bits - wasted = 15
    }
    assert(Flac.decode(b).samples.toSeq == Seq(42, 42, 42))
  }

  test("corrupt streams fail LOUDLY: bad magic, bad sync, bad CRCs, truncation") {
    val good = Flac.pack(8000, 1, 16, Array.tabulate(40)(i => i * 3 - 60), 16)
    intercept[IllegalArgumentException](Flac.decode("fLaX".getBytes ++ good.drop(4)))
    // flip a bit inside the first frame body -> CRC-16 mismatch
    val frameStart = 4 + 4 + 34
    val broken = good.clone(); broken(frameStart + 8) = (broken(frameStart + 8) ^ 0x10).toByte
    val e = intercept[IllegalArgumentException](Flac.decode(broken))
    assert(e.getMessage.contains("CRC"), e.getMessage)
    // truncate mid-frame
    intercept[IllegalArgumentException](Flac.decode(good.dropRight(3)))
    // break the sync code
    val nosync = good.clone(); nosync(frameStart) = 0
    val e2 = intercept[IllegalArgumentException](Flac.decode(nosync))
    assert(e2.getMessage.contains("sync"), e2.getMessage)
  }

  test("reserved channel-assignment codes 11-15 fail loudly (RFC 9639)") {
    // valid header + CRC-8 with chAsgn=11: the reserved-code check is
    // what fires, not a CRC or subframe error
    val b = wrapStream(8000, 2, 16, 4, chAsgn = 11, bs = 4) { f =>
      f.bits(0, 32) // never reached
    }
    val e = intercept[IllegalArgumentException](Flac.decode(b))
    assert(e.getMessage.contains("channel-assignment"), e.getMessage)
  }

  test("truncated/overrunning metadata blocks fail with a FLAC-context message") {
    val good = Flac.pack(8000, 1, 16, Array.tabulate(20)(i => i - 10), 16)
    // keep fLaC + STREAMINFO but clear its last-block flag, then
    // append a bogus block header claiming 1000 bytes that aren't there
    val si = good.take(4 + 4 + 34)
    si(4) = (si(4) & 0x7f).toByte
    val overrun = si ++ Array[Byte]((0x80 | 4).toByte, 0x00, 0x03, 0xE8.toByte)
    val e = intercept[IllegalArgumentException](Flac.decode(overrun))
    assert(e.getMessage.contains("overruns"), e.getMessage)
    // cut inside the 4-byte metadata block header itself
    val shortHdr = si ++ Array[Byte]((0x80 | 4).toByte, 0x00)
    val e2 = intercept[IllegalArgumentException](Flac.decode(shortHdr))
    assert(e2.getMessage.contains("truncated metadata"), e2.getMessage)
  }
}
