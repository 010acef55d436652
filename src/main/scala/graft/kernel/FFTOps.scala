package graft.kernel

/** Complex FFT for arbitrary lengths: iterative radix-2 plus Bluestein's
  * chirp-z algorithm for non-power-of-two sizes. From-scratch implementation
  * of the textbook algorithms (Cooley–Tukey 1965; Bluestein 1970) — used only
  * for `dominant_fourier_frequency` parity
  * (`/root/reference/claspy/window_size.py:131-175` uses np.fft.fft).
  */
object FFTOps {

  /** In-place radix-2 FFT; n must be a power of two. sign=-1 forward. */
  private def fftRadix2(re: Array[Double], im: Array[Double], sign: Int): Unit = {
    val n = re.length
    // bit reversal
    var j = 0
    var i = 1
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        var t = re(i); re(i) = re(j); re(j) = t
        t = im(i); im(i) = im(j); im(j) = t
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = sign * 2.0 * math.Pi / len
      val wRe = math.cos(ang); val wIm = math.sin(ang)
      var base = 0
      while (base < n) {
        var curRe = 1.0; var curIm = 0.0
        var k = 0
        while (k < len / 2) {
          val uRe = re(base + k); val uIm = im(base + k)
          val vRe = re(base + k + len / 2) * curRe - im(base + k + len / 2) * curIm
          val vIm = re(base + k + len / 2) * curIm + im(base + k + len / 2) * curRe
          re(base + k) = uRe + vRe; im(base + k) = uIm + vIm
          re(base + k + len / 2) = uRe - vRe; im(base + k + len / 2) = uIm - vIm
          val nRe = curRe * wRe - curIm * wIm
          curIm = curRe * wIm + curIm * wRe
          curRe = nRe
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** Forward DFT of a complex signal of arbitrary length (sign=-1 convention,
    * matching np.fft.fft). Returns (re, im). */
  def fft(reIn: Array[Double], imIn: Array[Double]): (Array[Double], Array[Double]) = {
    val n = reIn.length
    if (n == 0) return (new Array[Double](0), new Array[Double](0))
    if ((n & (n - 1)) == 0) {
      val re = reIn.clone(); val im = imIn.clone()
      fftRadix2(re, im, -1)
      (re, im)
    } else bluestein(reIn, imIn)
  }

  /** Bluestein chirp-z: DFT of arbitrary n via a 2^k-sized convolution. */
  private def bluestein(reIn: Array[Double], imIn: Array[Double]): (Array[Double], Array[Double]) = {
    val n = reIn.length
    var m = 1
    while (m < 2 * n + 1) m <<= 1
    // chirp: w_k = exp(-i*pi*k^2/n); use k^2 mod 2n to avoid overflow/precision loss
    val cosT = new Array[Double](n)
    val sinT = new Array[Double](n)
    var k = 0
    while (k < n) {
      val kk = (k.toLong * k) % (2L * n)
      val ang = math.Pi * kk / n
      cosT(k) = math.cos(ang); sinT(k) = math.sin(ang)
      k += 1
    }
    val aRe = new Array[Double](m); val aIm = new Array[Double](m)
    val bRe = new Array[Double](m); val bIm = new Array[Double](m)
    k = 0
    while (k < n) {
      // a_k = x_k * exp(-i*ang)
      aRe(k) = reIn(k) * cosT(k) + imIn(k) * sinT(k)
      aIm(k) = -reIn(k) * sinT(k) + imIn(k) * cosT(k)
      // b_k = exp(+i*ang), mirrored
      bRe(k) = cosT(k); bIm(k) = sinT(k)
      if (k > 0) { bRe(m - k) = cosT(k); bIm(m - k) = sinT(k) }
      k += 1
    }
    fftRadix2(aRe, aIm, -1)
    fftRadix2(bRe, bIm, -1)
    var i = 0
    while (i < m) {
      val r = aRe(i) * bRe(i) - aIm(i) * bIm(i)
      val i2 = aRe(i) * bIm(i) + aIm(i) * bRe(i)
      aRe(i) = r; aIm(i) = i2
      i += 1
    }
    fftRadix2(aRe, aIm, 1)
    val outRe = new Array[Double](n); val outIm = new Array[Double](n)
    k = 0
    while (k < n) {
      val cr = aRe(k) / m; val ci = aIm(k) / m
      outRe(k) = cr * cosT(k) + ci * sinT(k)
      outIm(k) = -cr * sinT(k) + ci * cosT(k)
      k += 1
    }
    (outRe, outIm)
  }
}
