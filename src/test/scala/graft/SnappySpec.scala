package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.plans.GraftHashOps

/** Snappy framing + raw-block decoder: clean-room CRC-32C against
  * the published vector AND the JDK's independent implementation,
  * hand-assembled raw-block vectors for every tag shape (the
  * corpus writer never emits copy-4, so the vector is the only
  * coverage), the framing walk against the in-repo writer (whose
  * CRCs come from java.util.zip.CRC32C — the decoder's Castagnoli
  * table is cross-checked on every row), and a malformed suite
  * where each mutation trips its own validation.
  */
class SnappySpec extends AnyFunSuite {
  import TestSession._

  private def crcJdk(b: Array[Byte]): Int = {
    val c = new java.util.zip.CRC32C(); c.update(b, 0, b.length); c.getValue.toInt
  }

  test("clean-room CRC-32C matches the published vector and the JDK on varied inputs") {
    assert(GraftHashOps.crc32c(Array.empty[Byte], 0, 0) === 0)
    val check = "123456789".getBytes("US-ASCII")
    assert(GraftHashOps.crc32c(check, 0, check.length) === 0xE3069283)
    // deterministic pseudo-random buffers vs the independent JDK CRC32C
    var seed = 0x12345678L
    (1 to 16).foreach { n =>
      val b = new Array[Byte](n * 37)
      b.indices.foreach { i =>
        seed = seed * 6364136223846793005L + 1442695040888963407L
        b(i) = (seed >>> 33).toByte
      }
      assert(GraftHashOps.crc32c(b, 0, b.length) === crcJdk(b), s"len ${b.length}")
    }
  }

  test("CRC mask matches the framing spec formula") {
    val crc = 0xE3069283
    assert(GraftHashOps.crc32cMask(crc) === ((crc >>> 15) | (crc << 17)) + 0xa282ead8)
  }

  // decode one hand-assembled raw block; returns None on reject
  private def raw(bytes: Int*): Option[String] = {
    val src = bytes.map(_.toByte).toArray
    val out = new graft.plans.GraftHashOps.Lz4Out(64, 1 << 22)
    if (GraftHashOps.snappyDecodeRaw(src, 0, src.length, out))
      Some(new String(out.buf, 0, out.len, "US-ASCII"))
    else None
  }
  private def lit(s: String): Seq[Int] = ((s.length - 1) << 2) +: s.getBytes("US-ASCII").map(_.toInt & 0xff).toSeq

  test("hand vectors: literal, copy-1, copy-2, copy-4, overlap RLE, extended literal") {
    assert(raw(Seq(5) ++ lit("hello"): _*) === Some("hello"))
    // copy-1: len 4, offset 4 -> tag 0x01, offset byte 0x04
    assert(raw(Seq(8) ++ lit("abcd") ++ Seq(0x01, 0x04): _*) === Some("abcdabcd"))
    // copy-2: len 4 -> (4-1)<<2 | 2 = 0x0E, offset 0x0004 LE
    assert(raw(Seq(8) ++ lit("abcd") ++ Seq(0x0E, 0x04, 0x00): _*) === Some("abcdabcd"))
    // copy-4: len 4 -> (4-1)<<2 | 3 = 0x0F, offset 4-byte LE
    assert(raw(Seq(8) ++ lit("abcd") ++ Seq(0x0F, 0x04, 0x00, 0x00, 0x00): _*) === Some("abcdabcd"))
    // overlap RLE: 'a' then copy len 9 offset 1
    assert(raw(Seq(10) ++ lit("a") ++ Seq((9 - 1) << 2 | 2, 0x01, 0x00): _*) === Some("a" * 10))
    // 100-byte literal needs the 1-extra-byte tag (60 -> 0xF0, len-1)
    assert(raw(Seq(100, 60 << 2, 99) ++ Seq.fill(100)('x'.toInt): _*) === Some("x" * 100))
  }

  test("raw-block rejections: each malformation trips its own check") {
    // preamble mismatch: declares 6, decodes 5
    assert(raw(Seq(6) ++ lit("hello"): _*) === None)
    // offset 0
    assert(raw(Seq(8) ++ lit("abcd") ++ Seq(0x0E, 0x00, 0x00): _*) === None)
    // offset reaching before the block start
    assert(raw(Seq(8) ++ lit("abcd") ++ Seq(0x0E, 0x05, 0x00): _*) === None)
    // literal overrunning the input
    assert(raw(Seq(9) ++ Seq((8 - 1) << 2) ++ "abc".getBytes("US-ASCII").map(_.toInt & 0xff).toSeq: _*) === None)
    // input ending mid-copy (tag present, offset bytes missing)
    assert(raw(Seq(8) ++ lit("abcd") ++ Seq(0x0E): _*) === None)
    // uvarint past 32 bits
    assert(raw(0xFF, 0xFF, 0xFF, 0xFF, 0x7F, 0x00) === None)
  }

  private def stats(payload: Array[Byte]): (Boolean, Int, Long, Long, Int) = {
    val r = GraftHashOps.snappyStats(payload)
    (r.getBoolean(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getInt(4))
  }

  test("framing round-trip agrees with text-derived stats across the coverage ids") {
    // ids cover: padding chunk (0,5), forced-uncompressed (0,7,35),
    // repeated stream id (0,11), plain greedy (1,3)
    val text = ("the quick brown fox jumps over the lazy dog " * 20).trim
    Seq(0L, 1L, 3L, 5L, 7L, 11L, 35L).foreach { id =>
      val frame = Multimodal.snappyFrameBytes(text, 512, id)
      val data  = text.substring(0, math.min(512, text.length)).getBytes("US-ASCII")
      val (v, nc, nb, sb, mb) = stats(frame)
      assert(v, s"id $id")
      assert(nc === (data.length + 255) / 256, s"id $id")
      assert(nb === data.length.toLong, s"id $id")
      assert(sb === data.map(_ & 0xff).map(_.toLong).sum, s"id $id")
      assert(mb === data.map(_ & 0xff).max, s"id $id")
    }
    // empty text: a bare stream identifier is a valid empty stream
    val (v0, nc0, nb0, _, _) = stats(Multimodal.snappyFrameBytes("", 512, 1L))
    assert(v0 && nc0 === 0 && nb0 === 0L)
  }

  test("the greedy encoder exercises compressed AND stored chunks, and both short-copy tags") {
    val rep   = "abcdabcdabcdabcdabcd" * 10 // compresses
    val blockC = Multimodal.snappyCompressRaw(rep.getBytes("US-ASCII"), 0, rep.length)
    assert(blockC.length < rep.length)
    // tag census of the compressed block (skip the uvarint preamble)
    var pos = 0
    while ((blockC(pos) & 0x80) != 0) pos += 1
    pos += 1
    var saw1, saw2 = false
    val out = new graft.plans.GraftHashOps.Lz4Out(64, 1 << 22)
    // walk tags structurally (re-using the decoder's acceptance as the bound)
    assert(GraftHashOps.snappyDecodeRaw(blockC, 0, blockC.length, out))
    while (pos < blockC.length) {
      val tag = blockC(pos) & 0xff
      (tag & 3) match {
        case 0 =>
          var l = (tag >>> 2) + 1
          var extra = 0
          if (l >= 61) { extra = l - 60; l = 0
            (0 until extra).foreach(i => l |= (blockC(pos + 1 + i) & 0xff) << (8 * i)); l += 1 }
          pos += 1 + extra + l
        case 1 => saw1 = true; pos += 2
        case 2 => saw2 = true; pos += 3
        case _ => pos += 5
      }
    }
    assert(saw1 && saw2, "corpus writer must emit both 1-byte and 2-byte offset copies")
    // a high-entropy segment must take the stored path in the frame
    val rnd = (0 until 256).map(i => (((i * 131) ^ (i >>> 3)) % 26 + 'a').toChar).mkString
    val frame = Multimodal.snappyFrameBytes(rnd + rep, 512, 1L)
    val types = scala.collection.mutable.Set.empty[Int]
    var p = 10
    while (p < frame.length) {
      types += (frame(p) & 0xff)
      p += 4 + ((frame(p + 1) & 0xff) | ((frame(p + 2) & 0xff) << 8) | ((frame(p + 3) & 0xff) << 16))
    }
    assert(types.contains(0x00) && types.contains(0x01),
      s"expected compressed and stored chunks, saw $types")
  }

  test("framing malformed suite: every mutation trips its own validation") {
    val text  = "snappy framing strictness " * 8
    val frame = Multimodal.snappyFrameBytes(text, 512, 1L)
    assert(stats(frame)._1)
    def mut(f: Array[Byte] => Unit): Array[Byte] = { val c = frame.clone(); f(c); c }
    // magic byte flipped
    assert(!stats(mut(c => c(4) = 'x'.toByte))._1)
    // truncated mid-chunk
    assert(!stats(java.util.Arrays.copyOf(frame, frame.length - 3))._1)
    // trailing garbage (a 4-byte header would be needed; 2 bytes is a framing error)
    assert(!stats(frame ++ Array[Byte](1, 2))._1)
    // data byte corrupted -> the clean-room CRC fires
    assert(!stats(mut(c => c(frame.length - 1) = (c(frame.length - 1) ^ 1).toByte))._1)
    // corruption RE-SIGNED -> valid again with a different sum
    // (proves the CRC check was what fired, the re-sign pattern).
    // Snappy's per-chunk CRC covers the UNCOMPRESSED data, so the
    // re-sign target is a stored (0x01) chunk we append ourselves.
    def storedChunk(body: Array[Byte]): Array[Byte] = {
      val crc = { val c = new java.util.zip.CRC32C(); c.update(body, 0, body.length)
        GraftHashOps.crc32cMask(c.getValue.toInt) }
      val len = body.length + 4
      Array[Byte](0x01, (len & 0xff).toByte, ((len >>> 8) & 0xff).toByte, ((len >>> 16) & 0xff).toByte,
        (crc & 0xff).toByte, ((crc >>> 8) & 0xff).toByte,
        ((crc >>> 16) & 0xff).toByte, ((crc >>> 24) & 0xff).toByte) ++ body
    }
    val tail0 = "resign-me".getBytes("US-ASCII")
    val tail1 = tail0.clone(); tail1(0) = (tail1(0) ^ 1).toByte
    val ok0 = frame ++ storedChunk(tail0)
    assert(stats(ok0)._1)
    // same appended chunk, one body byte flipped WITHOUT re-signing -> CRC fires
    val bad = ok0.clone(); bad(frame.length + 8) = (bad(frame.length + 8) ^ 1).toByte
    assert(!stats(bad)._1)
    // the flipped body freshly signed -> valid, same byte count, different sum
    val (vr, _, nbr, sbr, _) = stats(frame ++ storedChunk(tail1))
    val (_, _, nb0, sb0, _)  = stats(ok0)
    assert(vr && (nbr === nb0) && (sbr !== sb0))
    // reserved unskippable chunk type
    val resv = frame ++ Array[Byte](0x02, 1, 0, 0, 0)
    assert(!stats(resv)._1)
    // padding chunk appended -> still valid, chunk count unchanged
    val pad = frame ++ Array[Byte](0xfe.toByte, 2, 0, 0, 9, 9)
    assert(stats(pad)._1 && stats(pad)._2 === stats(frame)._2)
    // repeated stream identifier, corrupted -> reject
    val sid = frame ++ Array[Byte](0xff.toByte, 6, 0, 0) ++ "sNaPpX".getBytes("US-ASCII")
    assert(!stats(sid)._1)
  }

  test("q_snappy_stats pipeline agrees with text-derived stats on the fixture") {
    val docs = Tables.documents(spark, sf)
    val out = Multimodal.snappyStats(
      Multimodal.snappyFromDocuments(docs).toDF()).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getInt(5)))).toMap
    val want = docs.select("doc_id", "text").collect().map { r =>
      val d = r.getString(1).substring(0, math.min(512, r.getString(1).length)).getBytes("US-ASCII")
      r.getLong(0) -> ((true, (d.length + 255) / 256,
        d.length.toLong, d.map(_ & 0xff).map(_.toLong).sum,
        if (d.isEmpty) 0 else d.map(_ & 0xff).max))
    }.toMap
    assert(out === want)
  }
}
