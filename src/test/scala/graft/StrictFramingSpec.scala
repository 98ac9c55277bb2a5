package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Round-14 strictness closures: each test pins one framing rule the
  * decoders now enforce beyond "the happy path round-trips" —
  * unterminated deflate streams (zip + png), gzip FHCRC
  * verification, G.711 end-of-payload framing, and raw-character
  * classification in the UTF-8 wrapper.
  */
class StrictFramingSpec extends AnyFunSuite {

  /** Minimal single-entry ZIP (method 8) around a caller-supplied
    * raw-deflate body, with central-directory sizes/CRC the caller
    * controls — lets the tests feed the decoder streams the JDK's
    * ZipOutputStream would never produce.
    */
  private def singleEntryZip(comp: Array[Byte], usize: Int, crc: Long): Array[Byte] = {
    val name = "a.txt".getBytes("US-ASCII")
    val bb = java.nio.ByteBuffer
      .allocate(30 + name.length + comp.length + 46 + name.length + 22)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(0x04034b50).putShort(20).putShort(0).putShort(8)
      .putShort(0).putShort(0)
      .putInt(crc.toInt).putInt(comp.length).putInt(usize)
      .putShort(name.length.toShort).putShort(0)
    bb.put(name).put(comp)
    val cdOff = bb.position()
    bb.putInt(0x02014b50).putShort(20).putShort(20).putShort(0).putShort(8)
      .putShort(0).putShort(0)
      .putInt(crc.toInt).putInt(comp.length).putInt(usize)
      .putShort(name.length.toShort).putShort(0).putShort(0)
      .putShort(0).putShort(0).putInt(0)
      .putInt(0)
    bb.put(name)
    val cdSize = bb.position() - cdOff
    bb.putInt(0x06054b50).putShort(0).putShort(0).putShort(1).putShort(1)
      .putInt(cdSize).putInt(cdOff).putShort(0)
    bb.array()
  }

  test("zip decode: an UNTERMINATED deflate stream is rejected even when sizes and CRC agree") {
    val content = "hello".getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32(); crc.update(content)
    // one NON-final stored block: yields exactly usize bytes from
    // exactly csize consumed bytes, CRC matches — but the final-block
    // end-of-stream state is never reached
    val unterminated = Array[Byte](0x00, 0x05, 0x00, 0xfa.toByte, 0xff.toByte) ++ content
    val row = graft.plans.GraftHashOps.zipStats(
      singleEntryZip(unterminated, content.length, crc.getValue))
    assert(!row.getBoolean(0), "accepted a deflate stream with no end-of-stream marker")
    // the SAME data with a final empty stored block appended IS a
    // complete stream and must pass — the strictness is calibrated
    val terminated = unterminated ++ Array[Byte](0x01, 0x00, 0x00, 0xff.toByte, 0xff.toByte)
    val ok = graft.plans.GraftHashOps.zipStats(
      singleEntryZip(terminated, content.length, crc.getValue))
    assert(ok.getBoolean(0), "rejected a properly terminated hand-built stream")
    assert(ok.getInt(1) === 1 && ok.getLong(2) === 5L)
    assert(ok.getLong(3) === content.map(b => (b & 0xff).toLong).sum)
  }

  /** PNG chunk: length BE32 + type + data + CRC-32(type || data). */
  private def pngChunk(ctype: String, data: Array[Byte]): Array[Byte] = {
    val t = ctype.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32(); crc.update(t); crc.update(data)
    java.nio.ByteBuffer.allocate(12 + data.length)
      .putInt(data.length).put(t).put(data).putInt(crc.getValue.toInt).array()
  }

  test("png decode: an UNTERMINATED zlib stream that yields the full pixel count is rejected") {
    val sig  = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(1).putInt(1).put(8.toByte).put(2.toByte) // 1x1 RGB8
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val raw = Array[Byte](0, 10, 20, 30) // filter 0 + one RGB pixel = rawLen 4
    // zlib header then one NON-final stored block carrying all 4
    // bytes: the inflater produces rawLen output and then starves —
    // the stream never terminates and the adler32 is never checked
    val unterminated =
      Array[Byte](0x78, 0x01, 0x00, 0x04, 0x00, 0xfb.toByte, 0xff.toByte) ++ raw
    val badPng = sig ++ pngChunk("IHDR", ihdr) ++
      pngChunk("IDAT", unterminated) ++ pngChunk("IEND", Array.empty)
    assert(!graft.plans.GraftHashOps.pngPixelStats(badPng).getBoolean(0),
      "accepted a zlib stream with no end-of-stream marker")
    // terminated twin: final empty stored block + adler32 trailer
    val adler = { val a = new java.util.zip.Adler32(); a.update(raw); a.getValue }
    val terminated = Array[Byte](0x78, 0x01, 0x00, 0x04, 0x00, 0xfb.toByte, 0xff.toByte) ++ raw ++
      Array[Byte](0x01, 0x00, 0x00, 0xff.toByte, 0xff.toByte) ++
      java.nio.ByteBuffer.allocate(4).putInt(adler.toInt).array()
    val okPng = sig ++ pngChunk("IHDR", ihdr) ++
      pngChunk("IDAT", terminated) ++ pngChunk("IEND", Array.empty)
    val row = graft.plans.GraftHashOps.pngPixelStats(okPng)
    assert(row.getBoolean(0), "rejected a properly terminated hand-built PNG")
    assert(row.getInt(1) === 1 && row.getInt(2) === 1)
    assert(row.getLong(4) === 10L && row.getLong(5) === 20L && row.getLong(6) === 30L)
  }

  test("targz decode: the gzip FHCRC field is VERIFIED, not just skipped") {
    val ok = Multimodal.targzBytes("hello world targz fhcrc fixture text", 256)
    assert((ok(3) & 2) === 0, "JDK gzip unexpectedly set FHCRC — fixture assumption broken")
    // splice an FHCRC field into the JDK-written member: set FLG.FHCRC
    // and insert the CRC-16 (low 16 bits of the CRC-32 of the header
    // bytes INCLUDING the patched FLG) between header and body
    def withFhcrc(corrupt: Boolean): Array[Byte] = {
      val b = new Array[Byte](ok.length + 2)
      System.arraycopy(ok, 0, b, 0, 10)
      b(3) = (b(3) | 2).toByte
      val hcrc = new java.util.zip.CRC32(); hcrc.update(b, 0, 10)
      val v = (hcrc.getValue & 0xffffL).toInt ^ (if (corrupt) 0x0101 else 0)
      b(10) = (v & 0xff).toByte
      b(11) = ((v >> 8) & 0xff).toByte
      System.arraycopy(ok, 10, b, 12, ok.length - 10)
      b
    }
    assert(graft.plans.GraftHashOps.targzStats(withFhcrc(corrupt = false)).getBoolean(0),
      "rejected a member with a CORRECT FHCRC")
    assert(!graft.plans.GraftHashOps.targzStats(withFhcrc(corrupt = true)).getBoolean(0),
      "accepted a member with a corrupted FHCRC")
  }

  test("g711 decode: trailing garbage and a lying RIFF size are both rejected") {
    val ok = Multimodal.g711Bytes("hello world", 96, 7)
    assert(graft.plans.GraftHashOps.g711Stats(ok).getBoolean(0))
    // one byte past the data chunk: the file no longer ENDS at the
    // data chunk, matching the strict framing of the other decoders
    assert(!graft.plans.GraftHashOps.g711Stats(ok :+ 0.toByte).getBoolean(0),
      "accepted trailing garbage after the data chunk")
    // RIFF chunk size at offset 4 must equal payload.length - 8
    val lie = ok.clone(); lie(4) = (lie(4) + 1).toByte
    assert(!graft.plans.GraftHashOps.g711Stats(lie).getBoolean(0),
      "accepted a lying RIFF chunk size")
  }

  test("utf16 decode: the JDK's BOM-aware strict decoder agrees on generated payloads, both endiannesses") {
    import java.nio.charset.CodingErrorAction
    for (le <- Seq(false, true)) {
      val payload = Multimodal.utf16Bytes("Hello 42 utf16!", 200, le)
      val dec = java.nio.charset.Charset.forName("UTF-16").newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      val s = dec.decode(java.nio.ByteBuffer.wrap(payload)).toString
      val cps = s.codePoints().toArray
      val row = graft.plans.GraftHashOps.utf16Stats(payload)
      assert(row.getBoolean(0), s"rejected a JDK-valid payload (le=$le)")
      assert(row.getLong(1) === payload.length.toLong)
      assert(row.getLong(2) === cps.length.toLong, "codepoint count disagrees with the JDK")
      assert(row.getLong(4) === cps.count(_ >= 0x10000).toLong, "supplementary count")
      assert(row.getInt(5) === cps.max, "max codepoint")
      assert(row.getLong(6) === cps.map(_.toLong).sum, "sum of codepoints")
      // 'H' is uppercase -> astral -> a surrogate pair must be on the wire
      assert(row.getLong(4) > 0, "fixture must exercise surrogate pairs")
    }
  }

  test("utf16 decode: malformed payloads report valid=false, never throw or lie") {
    val ok = Multimodal.utf16Bytes("Hi 7", 200, le = false)
    assert(graft.plans.GraftHashOps.utf16Stats(ok).getBoolean(0))
    val highOnly = Array[Byte](0xfe.toByte, 0xff.toByte, 0xd8.toByte, 0x01) // unpaired high at end
    val strayLow = Array[Byte](0xfe.toByte, 0xff.toByte, 0xdc.toByte, 0x01) // stray low
    val highThenBmp = Array[Byte](0xfe.toByte, 0xff.toByte, 0xd8.toByte, 0x01, 0x00, 0x41) // high + non-low
    val cases = Seq[Array[Byte]](
      Array.empty,
      ok.drop(2),             // BOM missing
      ok.take(ok.length - 1), // odd byte count
      highOnly, strayLow, highThenBmp)
    cases.foreach { p =>
      assert(!graft.plans.GraftHashOps.utf16Stats(p).getBoolean(0), s"accepted ${p.length} bytes")
    }
  }

  test("punycode: the in-repo RFC 3492 encoder matches the JDK's IDN encoder on classic IDN labels") {
    // java.net.IDN wraps an INDEPENDENT punycode implementation; on
    // plain lowercase IDNA-safe labels its ToASCII output is exactly
    // xn-- + RFC 3492 encode
    for (label <- Seq("bücher", "mañana", "münchen", "καλημερα")) {
      val ours = "xn--" + graft.plans.GraftHashOps.punycodeEncode(label.codePoints().toArray)
      assert(ours === java.net.IDN.toASCII(label),
        s"encoder disagrees with the JDK on '$label'")
      // and the strict decoder round-trips it
      val row = graft.plans.GraftHashOps.punycodeStats(ours.getBytes("US-ASCII"))
      assert(row.getBoolean(0), s"decoder rejected its own canonical encoding of '$label'")
      val cps = label.codePoints().toArray
      assert(row.getLong(1) === cps.length.toLong)
      assert(row.getLong(5) === cps.map(_.toLong).sum)
    }
  }

  test("punycode decode: strict canonical form — malformed and non-canonical payloads report valid=false") {
    val ok = Multimodal.punycodeBytes("Hello world 42", 128)
    assert(graft.plans.GraftHashOps.punycodeStats(ok).getBoolean(0))
    // the RFC 3492 §7.1 Russian sample carries a mixed-case
    // annotation ("...baDot..."): case is presentation metadata, not
    // content — the CANONICAL lowercase form decodes, the mixed-case
    // spelling is rejected rather than silently aliased
    val russianMixed = "xn--b1abfaaepdrnnbgefbaDotcwatmq2g4l".getBytes("US-ASCII")
    assert(!graft.plans.GraftHashOps.punycodeStats(russianMixed).getBoolean(0),
      "accepted a mixed-case spelling")
    val russianLower = "xn--b1abfaaepdrnnbgefbadotcwatmq2g4l".getBytes("US-ASCII")
    assert(graft.plans.GraftHashOps.punycodeStats(russianLower).getBoolean(0),
      "rejected the canonical lowercase form of the RFC sample")
    val cases = Seq[Array[Byte]](
      Array.empty,
      "bcher-kva".getBytes("US-ASCII"),      // missing xn-- prefix
      "xn--bcher-kv!".getBytes("US-ASCII"),  // invalid digit
      "xn--bcher-kv".getBytes("US-ASCII"),   // truncated mid-integer
      "xn--99999999999999".getBytes("US-ASCII"), // overflow
      ("xn--" + "z" * 40).getBytes("US-ASCII"))  // runaway continuation digits
    cases.foreach { p =>
      assert(!graft.plans.GraftHashOps.punycodeStats(p).getBoolean(0),
        s"accepted '${new String(p, "US-ASCII")}'")
    }
  }

  test("utf8 wrapper: classification is on the RAW char — no low-7-bit aliasing into vowel buckets") {
    // U+00E1 has low 7 bits == 'a'; the wrapper must NOT map it to
    // the vowel codepoint 0x161 but pass it through as itself
    val bytes = Multimodal.utf8Bytes("áa", 10)
    assert(bytes.toSeq === "áš".getBytes("UTF-8").toSeq,
      "masked-char classification is back: U+00E1 aliased into the vowel bucket")
    val row = graft.plans.GraftHashOps.utf8Stats(bytes)
    assert(row.getBoolean(0))
    assert(row.getLong(2) === 2L, "codepoint count")
    assert(row.getLong(4) === 2L, "both should be 2-byte codepoints")
    assert(row.getInt(7) === 0x161, "max codepoint should be the mapped vowel")
  }
}
