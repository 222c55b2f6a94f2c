package graft.ops

import java.nio.charset.{CharacterCodingException, CodingErrorAction, StandardCharsets}

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property locks for the percent-encoded-host guard
  * ([[Corpus.ValidPctUtf8Re]]) and decoder
  * ([[graft.functions.PctDecodeUtf8]]): the canonicalizer's
  * cross-engine agreement argument is "the regex admits exactly the
  * escape sequences whose bytes are strict RFC 3629 UTF-8, so both
  * engines' decoders only ever run on inputs they agree on" — these
  * properties check that equivalence against the JVM's strict decoder
  * on arbitrary byte strings, not just the handful of fixture edges
  * in CorpusSpec. */
object CorpusProps extends Properties("corpus-pct-utf8") {

  private val re = Corpus.ValidPctUtf8Re.r

  /** Strict RFC 3629 validity via the JVM decoder (REPORT on both
    * malformed input and unmappable characters — rejects overlongs,
    * surrogates, truncated tails, > U+10FFFF). */
  private def strictUtf8(bytes: Array[Byte]): Boolean =
    try {
      StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
        .decode(java.nio.ByteBuffer.wrap(bytes))
      true
    } catch { case _: CharacterCodingException => false }

  private def esc(bytes: Seq[Byte]): String =
    bytes.map(b => f"%%${b & 0xff}%02X").mkString

  private val byteGen: Gen[Byte] = Gen.choose(-128, 127).map(_.toByte)

  property("fully-escaped bytes: regex accepts iff strict UTF-8") =
    forAll(Gen.listOf(byteGen)) { bs =>
      re.matches(esc(bs)) == strictUtf8(bs.toArray)
    }

  // Bias toward continuation-shaped and lead-shaped bytes so the
  // interesting boundary rows (E0 A0, ED 9F vs ED A0, F4 8F vs F4 90,
  // overlong C0/C1) actually get sampled instead of drowning in
  // uniform noise.
  private val utf8ishByte: Gen[Byte] = Gen.frequency(
    3 -> Gen.choose(0x80, 0xbf), 2 -> Gen.choose(0xc0, 0xf5),
    2 -> Gen.choose(0x00, 0x7f), 1 -> Gen.choose(0x00, 0xff)
  ).map(_.toByte)

  property("fully-escaped utf8ish bytes: regex accepts iff strict UTF-8") =
    forAll(Gen.listOfN(6, utf8ishByte)) { bs =>
      re.matches(esc(bs)) == strictUtf8(bs.toArray)
    }

  // Mixed plain/escaped segments, the shape real hosts take: plain
  // chars are ASCII (never '%'), escapes carry arbitrary bytes. The
  // regex must accept iff the ASSEMBLED byte string is strict UTF-8 —
  // plain ASCII can never continue a multi-byte sequence, which is
  // what makes the per-segment tokenization sound.
  private val segGen: Gen[(String, Byte)] = Gen.oneOf(
    Gen.alphaNumChar.map(c => (c.toString, c.toByte)),
    byteGen.map(b => (f"%%${b & 0xff}%02X", b)))

  property("mixed plain+escaped: regex accepts iff assembled bytes are UTF-8") =
    forAll(Gen.listOf(segGen)) { segs =>
      val s = segs.map(_._1).mkString
      val bytes = segs.map(_._2).toArray
      re.matches(s) == strictUtf8(bytes)
    }

  // Lowercase hex digits must be accepted identically (the derivation
  // uppercases, but real crawl URLs carry either case).
  property("hex case-insensitive") =
    forAll(Gen.listOfN(4, utf8ishByte)) { bs =>
      re.matches(esc(bs)) == re.matches(esc(bs).toLowerCase)
    }

  private val validStringGen: Gen[String] =
    Gen.listOf(Gen.frequency(
      6 -> Gen.alphaNumChar.map(_.toInt),
      2 -> Gen.choose(0x80, 0x7ff),
      2 -> Gen.choose(0x800, 0xd7ff),
      1 -> Gen.choose(0x10000, 0x10ffff)
    )).map(cps => new String(cps.toArray, 0, cps.length))

  property("escape of any valid string is accepted and round-trips") =
    forAll(validStringGen) { s =>
      val escaped = esc(s.getBytes(StandardCharsets.UTF_8).toSeq)
      re.matches(escaped) &&
        graft.functions.PctDecodeUtf8
          .decode(UTF8String.fromString(escaped)).toString == s
    }

  property("decode is identity on %-free strings") =
    forAll(validStringGen.suchThat(!_.contains('%'))) { s =>
      graft.functions.PctDecodeUtf8
        .decode(UTF8String.fromString(s)).toString == s
    }
}
