package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.repair.Repairer
import graft.schemaevo.SchemaCompat

/** Property tests (SURVEY §5 engine test plan): injection-safety and
  * round-trip invariants over generated inputs, raw ScalaCheck. */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  private val nastyString: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('\'', '"', ';', '-', '\\',
      '\n', '\t', ' ', ',', '(', ')'))).map(_.mkString)

  // ---- native text-hash kernels vs reference formulations -------------

  private val tokenGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString).map(_.take(12))
  private val tokensGen: Gen[List[String]] = Gen.listOf(tokenGen)

  test("poly/combined62: deterministic, 62-bit range, concat-sensitive") {
    import graft.functions.TextHashes
    import org.apache.spark.unsafe.types.UTF8String
    check(Prop.forAll(tokenGen, tokenGen) { (a, b) =>
      val ua = UTF8String.fromString(a)
      val h = TextHashes.combined62(ua)
      h >= 0L && h < (1L << 62) &&
        h == TextHashes.combined62(UTF8String.fromString(a)) &&
        h == TextHashes.poly(ua, TextHashes.BaseA) +
          (TextHashes.poly(ua, TextHashes.BaseB) << 31) &&
        // order sensitivity: ab vs ba differ unless strings make them equal
        (a + b == b + a ||
          TextHashes.combined62(UTF8String.fromString(a + b)) !=
            TextHashes.combined62(UTF8String.fromString(b + a)))
    })
  }

  test("shingle kernel: window count, distinct subset, minhash length/order") {
    import graft.functions.{MinHashSig, ShingleHashes}
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def arr(tokens: List[String]): ArrayData =
      ArrayData.toArrayData(tokens.map(UTF8String.fromString).toArray)
    check(Prop.forAll(tokensGen, Gen.choose(1, 5)) { (tokens, k) =>
      val all = ShingleHashes.compute(arr(tokens), k, distinct = false)
      val dd = ShingleHashes.compute(arr(tokens), k, distinct = true)
      val windows = if (tokens.size >= k) tokens.size - k + 1 else 1
      all.length == windows &&
        dd.toSet == all.toSet && dd.length == all.toSet.size &&
        // minhash: fixed width, elementwise ≤ identity under superset
        {
          val sig = MinHashSig.compute(ArrayData.toArrayData(all), 8)
          val sigMore = MinHashSig.compute(
            ArrayData.toArrayData(all ++ Array(12345L)), 8)
          sig.length == 8 &&
            sig.zip(sigMore).forall { case (s, m) => m <= s } // min can only drop
        }
    })
  }

  test("simhash: identical token multisets agree; hamming symmetric and bounded") {
    import graft.functions.TextHashes
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def sh(tokens: List[String]): Long =
      TextHashes.simhash(ArrayData.toArrayData(
        tokens.map(UTF8String.fromString).toArray))
    check(Prop.forAll(tokensGen, tokensGen) { (a, b) =>
      val ha = sh(a); val hb = sh(b)
      val d = java.lang.Long.bitCount(ha ^ hb)
      ha >= 0L && ha < (1L << 62) &&
        sh(scala.util.Random.shuffle(a)) == ha && // order-insensitive (votes)
        d == java.lang.Long.bitCount(hb ^ ha) && d <= 62
    })
  }

  test("string literals: quotes always doubled, statement never breaks out") {
    check(Prop.forAll(nastyString) { s =>
      val lit = Repairer.formatValue(s)
      // every single-quote inside the payload appears doubled: stripping
      // the outer quotes and collapsing '' leaves no bare quote
      val inner = lit.substring(1, lit.length - 1)
      !inner.replace("''", "").contains("'")
    })
  }

  test("identifiers: always wrapped, embedded double-quotes doubled") {
    check(Prop.forAll(nastyString) { s =>
      val q = Repairer.quoteIdentifier(s)
      q.head == '"' && q.last == '"' &&
        !q.substring(1, q.length - 1).replace("\"\"", "").contains("\"")
    })
  }

  test("INSERT column/value arity always consistent") {
    val cols = Gen.nonEmptyListOf(Gen.identifier).map(_.distinct)
    check(Prop.forAll(cols) { cs =>
      cs.isEmpty || {
        val sql = Repairer.generateInsertSql("s", "t", cs, cs.map(_.length))
        sql.count(_ == ',') == 2 * (cs.length - 1)
      }
    })
  }

  test("numeric literals round-trip through formatValue") {
    check(Prop.forAll(Gen.choose(Long.MinValue, Long.MaxValue)) { n =>
      Repairer.formatValue(n) == n.toString
    })
    check(Prop.forAll(Gen.choose(-1e12, 1e12)) { d: Double =>
      Repairer.formatValue(d).toDouble == d
    })
  }

  test("schema fingerprint is whitespace/key-order invariant, content sensitive") {
    val fieldName = Gen.identifier.suchThat(_.nonEmpty)
    check(Prop.forAll(fieldName, fieldName) { (a, b) =>
      val s1 = s"""{"type":"record","name":"R","namespace":"n","fields":[{"name":"$a","type":"string"}]}"""
      val s2 = s"""{  "fields":[{"type":"string","name":"$a"}], "namespace":"n", "name":"R", "type":"record"}"""
      val s3 = s"""{"type":"record","name":"R","namespace":"n","fields":[{"name":"$b","type":"string"}]}"""
      SchemaCompat.fingerprint(s1) == SchemaCompat.fingerprint(s2) &&
        ((a == b) == (SchemaCompat.fingerprint(s1) == SchemaCompat.fingerprint(s3)))
    })
  }

  test("backward compat: widening any single int field to long stays compatible") {
    val names = Gen.nonEmptyListOf(Gen.identifier.suchThat(_.nonEmpty)).map(_.distinct)
    check(Prop.forAll(names) { ns =>
      ns.isEmpty || {
        def schema(widen: String) = {
          val fs = ns.map(n => s"""{"name":"$n","type":"${if (n == widen) "long" else "int"}"}""")
          s"""{"type":"record","name":"R","namespace":"n","fields":[${fs.mkString(",")}]}"""
        }
        val base = {
          val fs = ns.map(n => s"""{"name":"$n","type":"int"}""")
          s"""{"type":"record","name":"R","namespace":"n","fields":[${fs.mkString(",")}]}"""
        }
        ns.forall(n => SchemaCompat.checkBackward(schema(n), base).compatible)
      }
    })
  }
}
