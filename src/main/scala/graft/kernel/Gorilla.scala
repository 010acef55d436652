package graft.kernel

/** Gorilla time-series block codec — delta-of-delta timestamps + XOR-encoded
  * float64 values, per the public VLDB'15 paper (Pelkonen et al., "Gorilla: A
  * Fast, Scalable, In-Memory Time Series Database", §4.1). No counterpart in
  * the reference (engine-side requirement from BASELINE.json north rule:
  * "Gorilla delta-of-delta timestamps + XOR-encoded values").
  *
  * Layout: [int32 count][int64 ts0][raw float64 v0][per-point: dod bits +
  * xor bits]. Delta-of-delta classes follow the paper with a 64-bit escape so
  * arbitrary epoch-milli series encode losslessly:
  *   '0'                  dod == 0
  *   '10'   +  7 bits     dod in [-63, 64]
  *   '110'  +  9 bits     dod in [-255, 256]
  *   '1110' + 12 bits     dod in [-2047, 2048]
  *   '11110'+ 32 bits     dod fits a signed int32
  *   '11111'+ 64 bits     anything else
  * Value XOR: '0' if identical; '10' + bits inside previous leading/trailing
  * window; '11' + 6-bit leading-zero count + 6-bit (significant-bits - 1) +
  * bits otherwise.
  */
object Gorilla {

  private final class BitWriter(initial: Int) {
    private var buf = new Array[Byte](math.max(initial, 16))
    private var bitPos = 0
    private def ensure(bits: Int): Unit = {
      val needBytes = (bitPos + bits + 7) >>> 3
      if (needBytes > buf.length) {
        val n = new Array[Byte](math.max(buf.length * 2, needBytes))
        System.arraycopy(buf, 0, n, 0, buf.length)
        buf = n
      }
    }
    def writeBit(b: Int): Unit = {
      ensure(1)
      if (b != 0) buf(bitPos >>> 3) = (buf(bitPos >>> 3) | (0x80 >>> (bitPos & 7))).toByte
      bitPos += 1
    }
    /** Write the low `n` bits of v, most-significant first. */
    def writeBits(v: Long, n: Int): Unit = {
      ensure(n)
      var i = n - 1
      while (i >= 0) {
        writeBitFast(((v >>> i) & 1L).toInt)
        i -= 1
      }
    }
    private def writeBitFast(b: Int): Unit = {
      if (b != 0) buf(bitPos >>> 3) = (buf(bitPos >>> 3) | (0x80 >>> (bitPos & 7))).toByte
      bitPos += 1
    }
    def toBytes: Array[Byte] = java.util.Arrays.copyOf(buf, (bitPos + 7) >>> 3)
  }

  private final class BitReader(buf: Array[Byte]) {
    private var bitPos = 0
    def readBit(): Int = {
      val b = (buf(bitPos >>> 3) >>> (7 - (bitPos & 7))) & 1
      bitPos += 1
      b
    }
    def readBits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
  }

  /** Sign-extend the low `n` bits of v. */
  @inline private def signExtend(v: Long, n: Int): Long = (v << (64 - n)) >> (64 - n)

  def encode(timestamps: Array[Long], values: Array[Double]): Array[Byte] = {
    require(timestamps.length == values.length, "ts/value length mismatch")
    val n = timestamps.length
    val w = new BitWriter(32 + n * 2)
    w.writeBits(n.toLong, 32)
    if (n == 0) return w.toBytes
    w.writeBits(timestamps(0), 64)
    w.writeBits(java.lang.Double.doubleToRawLongBits(values(0)), 64)
    var prevTs = timestamps(0)
    var prevDelta = 0L
    var prevBits = java.lang.Double.doubleToRawLongBits(values(0))
    var prevLead = -1
    var prevSig = -1
    var i = 1
    while (i < n) {
      // --- timestamp: delta-of-delta
      val delta = timestamps(i) - prevTs
      val dod = delta - prevDelta
      if (dod == 0L) w.writeBit(0)
      else if (dod >= -63 && dod <= 64) { w.writeBits(0x2L, 2); w.writeBits(dod & 0x7fL, 7) }
      else if (dod >= -255 && dod <= 256) { w.writeBits(0x6L, 3); w.writeBits(dod & 0x1ffL, 9) }
      else if (dod >= -2047 && dod <= 2048) { w.writeBits(0xeL, 4); w.writeBits(dod & 0xfffL, 12) }
      else if (dod >= Int.MinValue && dod <= Int.MaxValue) { w.writeBits(0x1eL, 5); w.writeBits(dod & 0xffffffffL, 32) }
      else { w.writeBits(0x1fL, 5); w.writeBits(dod, 64) }
      prevDelta = delta
      prevTs = timestamps(i)
      // --- value: XOR
      val bits = java.lang.Double.doubleToRawLongBits(values(i))
      val xor = bits ^ prevBits
      if (xor == 0L) w.writeBit(0)
      else {
        w.writeBit(1)
        val lead = java.lang.Long.numberOfLeadingZeros(xor)
        val trail = java.lang.Long.numberOfTrailingZeros(xor)
        val sig = 64 - lead - trail
        if (prevLead >= 0 && lead >= prevLead && trail >= (64 - prevLead - prevSig)) {
          w.writeBit(0)
          w.writeBits(xor >>> (64 - prevLead - prevSig), prevSig)
        } else {
          w.writeBit(1)
          val l = math.min(lead, 63)
          w.writeBits(l.toLong, 6)
          w.writeBits((sig - 1).toLong, 6)
          w.writeBits(xor >>> trail, sig)
          prevLead = l
          prevSig = sig
        }
      }
      prevBits = bits
      i += 1
    }
    w.toBytes
  }

  def decode(bytes: Array[Byte]): (Array[Long], Array[Double]) = {
    val r = new BitReader(bytes)
    val n = r.readBits(32).toInt
    val ts = new Array[Long](n)
    val vs = new Array[Double](n)
    if (n == 0) return (ts, vs)
    ts(0) = r.readBits(64)
    var prevBits = r.readBits(64)
    vs(0) = java.lang.Double.longBitsToDouble(prevBits)
    var prevTs = ts(0)
    var prevDelta = 0L
    var prevLead = -1
    var prevSig = -1
    var i = 1
    while (i < n) {
      // the 7/9/12-bit classes store asymmetric [-(2^b-1), 2^b] ranges; the
      // one positive overflow value sign-extends to -(2^b) and is mapped back
      @inline def asym(v: Long, max: Long): Long = if (v == -max) max else v
      val dod =
        if (r.readBit() == 0) 0L
        else if (r.readBit() == 0) asym(signExtend(r.readBits(7), 7), 64L)
        else if (r.readBit() == 0) asym(signExtend(r.readBits(9), 9), 256L)
        else if (r.readBit() == 0) asym(signExtend(r.readBits(12), 12), 2048L)
        else if (r.readBit() == 0) signExtend(r.readBits(32), 32)
        else r.readBits(64)
      prevDelta += dod
      prevTs += prevDelta
      ts(i) = prevTs
      if (r.readBit() == 1) {
        if (r.readBit() == 0) {
          val xor = r.readBits(prevSig) << (64 - prevLead - prevSig)
          prevBits ^= xor
        } else {
          prevLead = r.readBits(6).toInt
          prevSig = r.readBits(6).toInt + 1
          val trail = 64 - prevLead - prevSig
          prevBits ^= r.readBits(prevSig) << trail
        }
      }
      vs(i) = java.lang.Double.longBitsToDouble(prevBits)
      i += 1
    }
    (ts, vs)
  }
}
