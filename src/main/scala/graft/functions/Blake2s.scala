package graft.functions

/** Pure-Scala BLAKE2s (RFC 7693), keyed variant with variable digest size —
  * the row-identity hash of the reference pipeline
  * (`db_etl/processors/hash.py:24-69` 32-byte, `db_etl_upload/uploader.py:143-192`
  * 12-byte keyed digests). Implemented from the public RFC; no external deps.
  */
object Blake2s {

  private val IV: Array[Int] = Array(
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19)

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
    Array(10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0))

  @inline private def rotr(x: Int, n: Int): Int = Integer.rotateRight(x, n)

  private def g(v: Array[Int], a: Int, b: Int, c: Int, d: Int, x: Int, y: Int): Unit = {
    v(a) = v(a) + v(b) + x
    v(d) = rotr(v(d) ^ v(a), 16)
    v(c) = v(c) + v(d)
    v(b) = rotr(v(b) ^ v(c), 12)
    v(a) = v(a) + v(b) + y
    v(d) = rotr(v(d) ^ v(a), 8)
    v(c) = v(c) + v(d)
    v(b) = rotr(v(b) ^ v(c), 7)
  }

  private def compress(h: Array[Int], block: Array[Byte], off: Int,
                       t: Long, last: Boolean): Unit = {
    val m = new Array[Int](16)
    var i = 0
    while (i < 16) {
      val o = off + i * 4
      m(i) = (block(o) & 0xff) | ((block(o + 1) & 0xff) << 8) |
        ((block(o + 2) & 0xff) << 16) | ((block(o + 3) & 0xff) << 24)
      i += 1
    }
    val v = new Array[Int](16)
    System.arraycopy(h, 0, v, 0, 8)
    System.arraycopy(IV, 0, v, 8, 8)
    v(12) ^= t.toInt
    v(13) ^= (t >>> 32).toInt
    if (last) v(14) = ~v(14)
    var r = 0
    while (r < 10) {
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

  /** Keyed BLAKE2s digest. `digestSize` in 1..32, `key` length 0..32. */
  def digest(data: Array[Byte], key: Array[Byte], digestSize: Int): Array[Byte] = {
    require(digestSize >= 1 && digestSize <= 32, "digestSize must be in 1..32")
    require(key.length <= 32, "key must be at most 32 bytes")
    val h = IV.clone()
    h(0) ^= 0x01010000 ^ (key.length << 8) ^ digestSize
    var t = 0L
    val keyed = key.nonEmpty
    val hasData = data.nonEmpty
    if (keyed) {
      val kb = new Array[Byte](64)
      System.arraycopy(key, 0, kb, 0, key.length)
      t += 64
      compress(h, kb, 0, t, last = !hasData)
    }
    if (hasData || !keyed) {
      val nFull = (data.length - 1) / 64 // full (non-final) blocks
      var i = 0
      while (i < nFull) {
        t += 64
        compress(h, data, i * 64, t, last = false)
        i += 1
      }
      val rem = data.length - nFull * 64
      val lastBlock = new Array[Byte](64)
      if (rem > 0) System.arraycopy(data, nFull * 64, lastBlock, 0, rem)
      t += rem
      compress(h, lastBlock, 0, t, last = true)
    }
    val out = new Array[Byte](digestSize)
    var i = 0
    while (i < digestSize) { out(i) = (h(i / 4) >>> (8 * (i % 4))).toByte; i += 1 }
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
