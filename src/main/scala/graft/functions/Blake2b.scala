package graft.functions

/** Pure-Scala BLAKE2b (RFC 7693) — the reference uses a BLAKE2b slug for
  * private-report identifiers (`main_etl_postprocessors/private_report/
  * process.py:124-127`). 64-bit sibling of [[Blake2s]]: 128-byte blocks,
  * 12 rounds, rotations 32/24/16/63.
  */
object Blake2b {

  private val IV: Array[Long] = Array(
    0x6A09E667F3BCC908L, 0xBB67AE8584CAA73BL, 0x3C6EF372FE94F82BL,
    0xA54FF53A5F1D36F1L, 0x510E527FADE682D1L, 0x9B05688C2B3E6C1FL,
    0x1F83D9ABFB41BD6BL, 0x5BE0CD19137E2179L)

  private val SIGMA: Array[Array[Int]] = Array(
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15),
    Array(14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3),
    Array(11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4),
    Array(7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8),
    Array(9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13),
    Array(2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9),
    Array(12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11),
    Array(13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10),
    Array(6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5),
    Array(10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0),
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15),
    Array(14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3))

  @inline private def rotr(x: Long, n: Int): Long = java.lang.Long.rotateRight(x, n)

  private def g(v: Array[Long], a: Int, b: Int, c: Int, d: Int, x: Long, y: Long): Unit = {
    v(a) = v(a) + v(b) + x
    v(d) = rotr(v(d) ^ v(a), 32)
    v(c) = v(c) + v(d)
    v(b) = rotr(v(b) ^ v(c), 24)
    v(a) = v(a) + v(b) + y
    v(d) = rotr(v(d) ^ v(a), 16)
    v(c) = v(c) + v(d)
    v(b) = rotr(v(b) ^ v(c), 63)
  }

  private def compress(h: Array[Long], block: Array[Byte], off: Int,
                       t: Long, last: Boolean): Unit = {
    val m = new Array[Long](16)
    var i = 0
    while (i < 16) {
      val o = off + i * 8
      var w = 0L
      var j = 7
      while (j >= 0) { w = (w << 8) | (block(o + j) & 0xffL); j -= 1 }
      m(i) = w
      i += 1
    }
    val v = new Array[Long](16)
    System.arraycopy(h, 0, v, 0, 8)
    System.arraycopy(IV, 0, v, 8, 8)
    v(12) ^= t // t_hi is 0 for any realistic JVM byte array
    if (last) v(14) = ~v(14)
    var r = 0
    while (r < 12) {
      val s = SIGMA(r)
      g(v, 0, 4, 8, 12, m(s(0)), m(s(1)))
      g(v, 1, 5, 9, 13, m(s(2)), m(s(3)))
      g(v, 2, 6, 10, 14, m(s(4)), m(s(5)))
      g(v, 3, 7, 11, 15, m(s(6)), m(s(7)))
      g(v, 0, 5, 10, 15, m(s(8)), m(s(9)))
      g(v, 1, 6, 11, 12, m(s(10)), m(s(11)))
      g(v, 2, 7, 8, 13, m(s(12)), m(s(13)))
      g(v, 3, 4, 9, 14, m(s(14)), m(s(15)))
      r += 1
    }
    i = 0
    while (i < 8) { h(i) ^= v(i) ^ v(i + 8); i += 1 }
  }

  /** Keyed BLAKE2b digest. `digestSize` in 1..64, `key` length 0..64. */
  def digest(data: Array[Byte], key: Array[Byte], digestSize: Int): Array[Byte] = {
    require(digestSize >= 1 && digestSize <= 64, "digestSize must be in 1..64")
    require(key.length <= 64, "key must be at most 64 bytes")
    val h = IV.clone()
    h(0) ^= 0x01010000L ^ (key.length.toLong << 8) ^ digestSize.toLong
    var t = 0L
    val keyed = key.nonEmpty
    val hasData = data.nonEmpty
    if (keyed) {
      val kb = new Array[Byte](128)
      System.arraycopy(key, 0, kb, 0, key.length)
      t += 128
      compress(h, kb, 0, t, last = !hasData)
    }
    if (hasData || !keyed) {
      val nFull = (data.length - 1) / 128
      var i = 0
      while (i < nFull) {
        t += 128
        compress(h, data, i * 128, t, last = false)
        i += 1
      }
      val rem = data.length - nFull * 128
      val lastBlock = new Array[Byte](128)
      if (rem > 0) System.arraycopy(data, nFull * 128, lastBlock, 0, rem)
      t += rem
      compress(h, lastBlock, 0, t, last = true)
    }
    val out = new Array[Byte](digestSize)
    var i = 0
    while (i < digestSize) { out(i) = (h(i / 8) >>> (8 * (i % 8))).toByte; i += 1 }
    out
  }

  private val HEX = "0123456789abcdef".toCharArray

  def hexDigest(data: Array[Byte], key: Array[Byte], digestSize: Int): String = {
    val d = digest(data, key, digestSize)
    val sb = new java.lang.StringBuilder(d.length * 2)
    d.foreach { b => sb.append(HEX((b >> 4) & 0xf)); sb.append(HEX(b & 0xf)) }
    sb.toString
  }
}
