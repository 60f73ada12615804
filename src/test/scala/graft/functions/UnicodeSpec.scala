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
}
