package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.plans.GraftHashOps

/** Protobuf wire-format walker: hand-assembled wire vectors for
  * every wire type and skip path (there is no protobuf library in
  * this container, so hand vectors built from the published
  * encoding ARE the independent cross-check — the LZ4 pattern), the
  * walk against the in-repo corpus writer, strict-uvarint edges
  * (10-byte boundary, 64-bit overflow), and a malformed suite where
  * each mutation trips its own validation, with the internal-sum
  * check proven by the re-sign pattern.
  */
class ProtoSpec extends AnyFunSuite {
  import TestSession._

  private def stats(payload: Array[Byte]): (Boolean, Int, Long, Long, Int) = {
    val r = GraftHashOps.protoStats(payload)
    (r.getBoolean(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getInt(4))
  }

  // --- a tiny independent wire writer (hand-rolled in the spec,
  // not shared with the Multimodal encoder) ---
  private def uv(v: Long): Seq[Int] = {
    var x = v
    val b = scala.collection.mutable.ArrayBuffer.empty[Int]
    var more = true
    while (more) {
      val lo = (x & 0x7f).toInt
      x = x >>> 7
      more = x != 0
      b += (if (more) lo | 0x80 else lo)
    }
    b.toSeq
  }
  private def tag(f: Int, w: Int): Seq[Int] = uv((f.toLong << 3) | w)
  private def f32(v: Long): Seq[Int] = (0 until 4).map(i => ((v >>> (8 * i)) & 0xff).toInt)
  private def f64(v: Long): Seq[Int] = (0 until 8).map(i => ((v >>> (8 * i)) & 0xff).toInt)
  private def bytes(xs: Seq[Int]): Array[Byte] = xs.map(_.toByte).toArray

  /** A minimal well-formed message for `text` with doc id `id`,
    * built entirely by this spec's own writer.
    */
  private def handMessage(text: String, id: Long): Array[Byte] = {
    val data = text.getBytes("US-ASCII")
    val sum  = data.map(_ & 0xff).map(_.toLong).sum
    var msg: Seq[Int] =
      tag(1, 0) ++ uv(id) ++
        tag(2, 2) ++ uv(data.length.toLong) ++ data.map(_.toInt & 0xff).toSeq ++
        tag(3, 5) ++ f32(sum & 0xffffffffL) ++
        tag(4, 1) ++ f64(data.length.toLong)
    data.grouped(64).foreach { seg =>
      msg = msg ++ tag(5, 0) ++ uv(seg.map(_ & 0xff).map(_.toLong).sum)
    }
    bytes(msg)
  }

  test("hand vector: the minimal message decodes with text-derived stats") {
    val m = handMessage("hello proto", 42L)
    val (v, nf, nb, sb, mb) = stats(m)
    assert(v)
    assert(nf === 5) // fields 1,2,3,4 + one segment sum
    assert(nb === 11L)
    assert(sb === "hello proto".getBytes("US-ASCII").map(_ & 0xff).map(_.toLong).sum)
    assert(mb === 't'.toInt)
    // empty text: zero segments, still 4 required fields
    val (v0, nf0, nb0, sb0, mb0) = stats(handMessage("", 7L))
    assert(v0 && nf0 === 4 && nb0 === 0L && sb0 === 0L && mb0 === 0)
  }

  test("unknown fields are skipped by wire type and counted") {
    val base = handMessage("skip me", 3L)
    // unknown varint, fixed64, length-delimited, fixed32 — all after the known fields
    val extra = tag(99, 0) ++ uv(123456789L) ++
      tag(100, 1) ++ f64(-1L) ++
      tag(101, 2) ++ uv(3L) ++ Seq(1, 2, 3) ++
      tag(102, 5) ++ f32(0xffffffffL)
    val (v, nf, nb, _, _) = stats(bytes(base.map(_.toInt & 0xff).toSeq ++ extra))
    val (_, nf0, _, _, _) = stats(base)
    assert(v && nf === nf0 + 4 && nb === 7L)
    // a known field number under an UNEXPECTED wire type is just an
    // unknown field (proto semantics): field 3 as varint is skipped,
    // and the real fixed32 field 3 still verifies
    val odd = bytes(base.map(_.toInt & 0xff).toSeq ++ tag(3, 0) ++ uv(9L))
    assert(stats(odd)._1)
  }

  test("strict uvarint edges: 10-byte max value accepted, overflow and truncation rejected") {
    // field 7 varint = 2^64-1: nine 0xff continuation bytes + final 0x01
    val maxed = handMessage("x", 1L).map(_.toInt & 0xff).toSeq ++
      tag(7, 0) ++ Seq(0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0x01)
    assert(stats(bytes(maxed))._1)
    // 10th byte carrying more than the final bit -> 65-bit value
    val over = handMessage("x", 1L).map(_.toInt & 0xff).toSeq ++
      tag(7, 0) ++ Seq(0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0x02)
    assert(!stats(bytes(over))._1)
    // continuation bit on the 10th byte -> an 11th byte would be needed
    val eleven = handMessage("x", 1L).map(_.toInt & 0xff).toSeq ++
      tag(7, 0) ++ Seq(0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0x81, 0x00)
    assert(!stats(bytes(eleven))._1)
    // truncated mid-varint at end of payload
    val trunc = handMessage("x", 1L).map(_.toInt & 0xff).toSeq ++ tag(7, 0) ++ Seq(0x80)
    assert(!stats(bytes(trunc))._1)
  }

  test("malformed suite: every mutation trips its own validation") {
    val text = "wire format strictness " * 6
    val m    = handMessage(text, 11L)
    assert(stats(m)._1)
    val ints = m.map(_.toInt & 0xff).toSeq
    // group wire types (3 and 4, deprecated) rejected
    assert(!stats(bytes(ints ++ tag(20, 3)))._1)
    assert(!stats(bytes(ints ++ tag(20, 4)))._1)
    // reserved wire types 6 and 7 rejected
    assert(!stats(bytes(ints ++ tag(20, 6) ++ Seq(0)))._1)
    assert(!stats(bytes(ints ++ tag(20, 7) ++ Seq(0)))._1)
    // field number 0 rejected (tag byte 0x00 = field 0, varint)
    assert(!stats(bytes(ints ++ Seq(0x00, 0x00)))._1)
    // field number past 2^29-1 rejected
    assert(!stats(bytes(ints ++ uv((536870912L << 3) | 0L) ++ Seq(0x01)))._1)
    // length-delimited length overrunning the payload
    assert(!stats(bytes(ints ++ tag(30, 2) ++ uv(1000L)))._1)
    // fixed64 / fixed32 truncated at end of payload
    assert(!stats(bytes(ints ++ tag(31, 1) ++ Seq(1, 2, 3)))._1)
    assert(!stats(bytes(ints ++ tag(32, 5) ++ Seq(1)))._1)
    // duplicate known fields rejected
    assert(!stats(bytes(ints ++ tag(1, 0) ++ uv(11L)))._1)
    assert(!stats(bytes(ints ++ tag(2, 2) ++ uv(0L)))._1)
    assert(!stats(bytes(ints ++ tag(3, 5) ++ f32(0L)))._1)
    assert(!stats(bytes(ints ++ tag(4, 1) ++ f64(0L)))._1)
    // an extra repeated segment sum breaks the segment-count check
    assert(!stats(bytes(ints ++ tag(5, 0) ++ uv(0L)))._1)
    // marker field 6 present with the wrong value
    assert(!stats(bytes(ints ++ tag(6, 5) ++ f32(0x12345678L)))._1)
    // ...and with the right value accepted
    assert(stats(bytes(ints ++ tag(6, 5) ++ f32(GraftHashOps.ProtoMarker)))._1)
    // each required field missing -> reject (rebuild without it)
    val data = text.getBytes("US-ASCII")
    val sum  = data.map(_ & 0xff).map(_.toLong).sum
    val segs = data.grouped(64).toSeq
      .flatMap(seg => tag(5, 0) ++ uv(seg.map(_ & 0xff).map(_.toLong).sum))
    val p2 = tag(2, 2) ++ uv(data.length.toLong) ++ data.map(_.toInt & 0xff).toSeq
    val p3 = tag(3, 5) ++ f32(sum & 0xffffffffL)
    val p4 = tag(4, 1) ++ f64(data.length.toLong)
    assert(!stats(bytes(p2 ++ p3 ++ p4 ++ segs))._1)                      // no field 1
    assert(!stats(bytes(tag(1, 0) ++ uv(11L) ++ p3 ++ p4))._1)            // no field 2
    assert(!stats(bytes(tag(1, 0) ++ uv(11L) ++ p2 ++ p4 ++ segs))._1)    // no field 3
    assert(!stats(bytes(tag(1, 0) ++ uv(11L) ++ p2 ++ p3 ++ segs))._1)    // no field 4
  }

  test("internal sum check fires on corruption and passes re-signed (the re-sign pattern)") {
    val text = "abcdefgh" * 20 // 160 bytes -> 3 segments
    val m    = handMessage(text, 5L)
    assert(stats(m)._1)
    // locate the field-2 data: tag(1,0)+uv(5)=2 bytes, tag(2,2)=1, uv(160)=2
    val dataOff = 2 + 1 + uv(text.length.toLong).size
    assert((m(dataOff) & 0xff) === 'a'.toInt)
    // flip one data byte WITHOUT re-signing -> the fixed32 sum check fires
    val badM = m.clone(); badM(dataOff) = 'b'.toByte
    assert(!stats(badM)._1)
    // the same text mutation freshly signed -> valid, same length, different sum
    val resigned = handMessage("b" + text.substring(1), 5L)
    val (vr, nfr, nbr, sbr, _) = stats(resigned)
    val (_, nf0, nb0, sb0, _)  = stats(m)
    assert(vr && (nfr === nf0) && (nbr === nb0) && (sbr === sb0 + 1L))
    // a wrong SEGMENT sum: rebuild with segment 1's varint off by
    // one (the total field-3 sum stays right) -> the per-segment
    // check is what fires
    val data = text.getBytes("US-ASCII")
    val sum  = data.map(_ & 0xff).map(_.toLong).sum
    var msg: Seq[Int] =
      tag(1, 0) ++ uv(5L) ++
        tag(2, 2) ++ uv(data.length.toLong) ++ data.map(_.toInt & 0xff).toSeq ++
        tag(3, 5) ++ f32(sum & 0xffffffffL) ++
        tag(4, 1) ++ f64(data.length.toLong)
    val segSums = data.grouped(64).map(_.map(_ & 0xff).map(_.toLong).sum).toSeq
    segSums.zipWithIndex.foreach { case (s, i) =>
      msg = msg ++ tag(5, 0) ++ uv(if (i == 1) s + 1 else s)
    }
    assert(!stats(bytes(msg))._1)
    // field-4 length mismatch fires on its own (sum stays right)
    var msg4: Seq[Int] =
      tag(1, 0) ++ uv(5L) ++
        tag(2, 2) ++ uv(data.length.toLong) ++ data.map(_.toInt & 0xff).toSeq ++
        tag(3, 5) ++ f32(sum & 0xffffffffL) ++
        tag(4, 1) ++ f64(data.length.toLong + 1)
    segSums.foreach(s => msg4 = msg4 ++ tag(5, 0) ++ uv(s))
    assert(!stats(bytes(msg4))._1)
  }

  test("corpus writer round-trip across the coverage ids (marker + all three unknown-field skips)") {
    val text = ("binary telemetry walks the wire format " * 16).trim
    // ids cover: 0 (all four extras), 5 (marker), 7 (unknown varint),
    // 11 (unknown len-delim), 13 (unknown fixed64), 1 (none)
    for (id <- Seq(0L, 1L, 5L, 7L, 11L, 13L, 35L, 65L, 91L)) {
      val m    = Multimodal.protoMessageBytes(text, 512, id)
      val data = text.substring(0, math.min(512, text.length)).getBytes("US-ASCII")
      val (v, nf, nb, sb, mb) = stats(m)
      assert(v, s"id $id")
      val extras = Seq(5L, 7L, 11L, 13L).count(k => id % k == 0)
      assert(nf === 4 + (data.length + 63) / 64 + extras, s"id $id")
      assert(nb === data.length.toLong, s"id $id")
      assert(sb === data.map(_ & 0xff).map(_.toLong).sum, s"id $id")
      assert(mb === data.map(_ & 0xff).max, s"id $id")
    }
    // empty text, id 1: just the 4 required fields
    val (ve, nfe, nbe, _, _) = stats(Multimodal.protoMessageBytes("", 512, 1L))
    assert(ve && nfe === 4 && nbe === 0L)
  }

  test("q_proto_stats pipeline agrees with text-derived stats on the fixture") {
    val docs = Tables.documents(spark, sf)
    val out = Multimodal.protoStats(
      Multimodal.protoFromDocuments(docs).toDF()).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getInt(5)))).toMap
    val want = docs.select("doc_id", "text").collect().map { r =>
      val id = r.getLong(0)
      val d  = r.getString(1).substring(0, math.min(512, r.getString(1).length)).getBytes("US-ASCII")
      val extras = Seq(5L, 7L, 11L, 13L).count(k => id % k == 0)
      id -> ((true, 4 + (d.length + 63) / 64 + extras,
        d.length.toLong, d.map(_ & 0xff).map(_.toLong).sum,
        if (d.isEmpty) 0 else d.map(_ & 0xff).max))
    }.toMap
    assert(out === want)
  }
}
