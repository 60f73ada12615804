package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** NFC normalization expression — canonical equivalence, null
  * passthrough, idempotence, and the already-normalized fast path. */
class UnicodeSpec extends SparkSpec {
  import spark.implicits._

  private val composed = "caf\u00e9"       // e-acute as one code point
  private val decomposed = "cafe\u0301"    // e + COMBINING ACUTE ACCENT

  test("nfcNormalize: decomposed and composed become byte-equal") {
    val df = Seq((1L, composed), (2L, decomposed), (3L, "ascii only"))
      .toDF("id", "t")
      .select($"id", UnicodeExpressions.nfcNormalize($"t").as("n"))
    val got = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == composed)
    assert(got(2L) == composed) // normalized INTO the composed form
    assert(got(3L) == "ascii only") // fast path: returned unchanged
    // idempotent: normalizing the normalized output is the identity
    val twice = df.select($"id",
      UnicodeExpressions.nfcNormalize($"n").as("n2"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(twice == got)
  }

  test("nfcNormalize: null in, null out; fuses into a codegen'd filter") {
    val df = Seq((1L, Some(decomposed)), (2L, None)).toDF("id", "t")
    val n = df.select($"id", UnicodeExpressions.nfcNormalize($"t").as("n"))
    assert(n.filter($"n".isNull).select("id").as[Long].collect().toSeq
      == Seq(2L))
    // the expression drives a filter (codegen path) with the same result
    // the interpreted eval gives
    val hits = df.filter(UnicodeExpressions.nfcNormalize($"t") ===
      lit(composed)).select("id").as[Long].collect().toSeq
    assert(hits == Seq(1L))
  }

  test("stripControl: controls and zero-widths go, tab/LF/CR and text stay") {
    val dirty = "a\u0000b\u0007c\u000bd\u007fe\u200bf\u200cg\u200dh\ufeffi"
    val kept = "x\ty\nz\rw"
    val multi = "café 世界 😀" // 2/3/4-byte chars survive
    val df = Seq((1L, dirty), (2L, kept), (3L, multi), (4L, ""))
      .toDF("id", "t")
      .select($"id", UnicodeExpressions.stripControl($"t").as("s"))
    val got = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "abcdefghi")
    assert(got(2L) == kept)   // fast path: kept verbatim
    assert(got(3L) == multi)  // multibyte text untouched
    assert(got(4L) == "")
  }

  test("stripControl: null passthrough; boundary-truncated lead bytes survive") {
    val df = Seq((1L, Option("ok")), (2L, None)).toDF("id", "t")
    val got = df.select($"id", UnicodeExpressions.stripControl($"t").as("s"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(got(1L) == "ok" && got(2L) == null)
    // a string ENDING in the zero-width prefix bytes (invalid UTF-8
    // tail) must not read past the buffer — exercised via the 2-byte
    // truncation of U+200B's encoding
    val tail = org.apache.spark.unsafe.types.UTF8String
      .fromBytes(Array[Byte](0x61, 0xE2.toByte, 0x80.toByte))
    assert(graft.functions.StripKernels.strip(tail).toString
      == tail.toString)
  }
}
