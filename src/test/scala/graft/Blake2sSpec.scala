package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Blake2s

/** RFC 7693 / python-hashlib parity vectors (generated with
  * `hashlib.blake2s(data, key=key, digest_size=n).hexdigest()`). */
class Blake2sSpec extends AnyFunSuite {

  private def hex(data: String, key: String, size: Int): String =
    Blake2s.hexDigest(data.getBytes("UTF-8"), key.getBytes("UTF-8"), size)

  test("empty input, no key, 32 bytes (RFC 7693 self-test shape)") {
    assert(hex("", "", 32) ===
      "69217a3079908094e11121d042354a7c1f55b6482ca1a51e1b250dfd1ed0eef9")
  }

  test("'abc', no key, 32 bytes") {
    assert(hex("abc", "", 32) ===
      "508c5e8c327c14e2e1a72ba34eeb452f37458b209ed63a294d999b4c86675982")
  }

  test("keyed 12-byte digest (reference uploader.py:143-192 shape)") {
    assert(hex("abc", "graft-record-key", 12) === "27729599b715440e4b0fa947")
  }

  test("multi-block input with 32-byte key") {
    assert(Blake2s.hexDigest(Array.fill[Byte](200)('x'), Array.fill[Byte](32)('k'), 16)
      === "552466adcaa950fdc9cf2e2ce23db3c6")
  }

  test("reference-style row id") {
    assert(hex("2021-01-01supplier5qty1", "graft-record-key", 12)
      === "32306e1f6ab02de98526530d")
  }

  test("block-boundary lengths agree in structure") {
    // 63/64/65-byte inputs exercise the final-block padding paths
    for (n <- Seq(63, 64, 65, 127, 128, 129)) {
      val d = Blake2s.hexDigest(Array.fill[Byte](n)('a'), Array.empty, 32)
      assert(d.length === 64)
      assert(d !== Blake2s.hexDigest(Array.fill[Byte](n + 1)('a'), Array.empty, 32))
    }
  }
}

/** BLAKE2b vectors from python hashlib (RFC 7693 64-bit variant). */
class Blake2bSpec extends AnyFunSuite {
  import graft.functions.Blake2b

  test("empty, 64-byte digest (RFC 7693 appendix shape)") {
    assert(Blake2b.hexDigest(Array.empty, Array.empty, 64) ===
      "786a02f742015903c6c6fd852552d272912f4740e15847618a86e217f71f5419" +
      "d25e1031afee585313896444934eb04b903a685b1448b755d56f701afe9be2ce")
  }

  test("'abc', 64 bytes") {
    assert(Blake2b.hexDigest("abc".getBytes, Array.empty, 64) ===
      "ba80a53f981c4d0d6a2797b69f12f6e94c212f14685ac4b74b12bb6fdbffa2d1" +
      "7d87c5392aab792dc252d5de4533cc9518d38aa8dbf1925ab92386edd4009923")
  }

  test("keyed 32-byte digest") {
    assert(Blake2b.hexDigest("abc".getBytes, "key".getBytes, 32) ===
      "0330531d097355a3f72e80d55c1245ccf79f1704431c6e3887938320442c23c0")
  }

  test("multi-block input") {
    assert(Blake2b.hexDigest(Array.fill[Byte](300)('y'), Array.empty, 16) ===
      "d7929194e53f7b2e7b8b3142eb4a53f5")
  }
}
