package graft.schemaevo

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors tests/unit/test_schema_validator.py: structural validation,
  * backward/forward/full compat, type promotions, fingerprints, registry. */
class SchemaCompatSpec extends AnyFunSuite {

  private def rec(fields: String): String =
    s"""{"type":"record","name":"User","namespace":"app","fields":[$fields]}"""

  private val v1 = rec("""{"name":"id","type":"string"},{"name":"age","type":"int"}""")

  test("structural validation: valid record passes") {
    val r = SchemaCompat.validate(v1)
    assert(r.valid && r.errors.isEmpty)
  }

  test("structural validation: missing type / bad type / missing fields") {
    assert(!SchemaCompat.validate("""{"name":"X"}""").valid)
    assert(!SchemaCompat.validate("""{"type":"recordz","name":"X"}""").valid)
    assert(!SchemaCompat.validate("""{"type":"record","name":"X"}""").valid)
    assert(!SchemaCompat.validate("""{"type":"record","name":"X","fields":[{"type":"int"}]}""").valid)
    assert(!SchemaCompat.validate("not json at all {{{").valid)
  }

  test("structural validation: named-type references are legal Avro") {
    // a field may reference a previously declared record/enum/fixed by
    // name (definition-before-use, per the Avro spec)
    val withRef = rec(
      """{"name":"meta","type":{"type":"record","name":"Meta","namespace":"app","fields":[{"name":"k","type":"string"}]}},
        |{"name":"meta2","type":"Meta"},
        |{"name":"meta3","type":"app.Meta"},
        |{"name":"maybe","type":["null","Meta"]}""".stripMargin)
    val r = SchemaCompat.validate(withRef)
    assert(r.valid, r.errors.mkString("; "))
    // an UNDECLARED name is still an error
    assert(!SchemaCompat.validate(rec("""{"name":"x","type":"NotDeclared"}""")).valid)
    // object-form reference (named ref with attributes) is legal too
    val objRef = rec(
      """{"name":"meta","type":{"type":"record","name":"Meta","namespace":"app","fields":[]}},
        |{"name":"meta2","type":{"type":"Meta","doc":"annotated ref"}}""".stripMargin)
    assert(SchemaCompat.validate(objRef).valid,
      SchemaCompat.validate(objRef).errors.mkString("; "))
    // a nested type with no namespace inherits the enclosing one —
    // its fullname must be referenceable
    val inherited =
      """{"type":"record","name":"Outer","namespace":"app","fields":[
        |{"name":"inner","type":{"type":"record","name":"Inner","fields":[{"name":"k","type":"int"}]}},
        |{"name":"ref","type":"app.Inner"}]}""".stripMargin
    assert(SchemaCompat.validate(inherited).valid,
      SchemaCompat.validate(inherited).errors.mkString("; "))
  }

  test("structural validation: typo'd primitive and bad union at field position") {
    // textual field types must be walked too — "strin" used to pass
    assert(!SchemaCompat.validate(rec("""{"name":"id","type":"strin"}""")).valid)
    assert(!SchemaCompat.validate(rec("""{"name":"id","type":["null","strin"]}""")).valid)
    assert(SchemaCompat.validate(rec("""{"name":"id","type":["null","string"]}""")).valid)
    assert(SchemaCompat.validate(rec(
      """{"name":"tags","type":{"type":"array","items":"string"}}""")).valid)
  }

  test("namespace: warning normally, error in strict mode") {
    val noNs = """{"type":"record","name":"X","fields":[]}"""
    val lax = SchemaCompat.validate(noNs)
    assert(lax.valid && lax.warnings.exists(_.contains("namespace")))
    assert(!SchemaCompat.validate(noNs, strict = true).valid)
  }

  test("backward: removing a field is incompatible; adding needs default") {
    val removed = rec("""{"name":"id","type":"string"}""")
    assert(!SchemaCompat.checkBackward(removed, v1).compatible)
    val addedNoDefault = rec(
      """{"name":"id","type":"string"},{"name":"age","type":"int"},{"name":"x","type":"int"}""")
    assert(!SchemaCompat.checkBackward(addedNoDefault, v1).compatible)
    val addedWithDefault = rec(
      """{"name":"id","type":"string"},{"name":"age","type":"int"},{"name":"x","type":"int","default":0}""")
    assert(SchemaCompat.checkBackward(addedWithDefault, v1).compatible)
    val addedNullable = rec(
      """{"name":"id","type":"string"},{"name":"age","type":"int"},{"name":"x","type":["null","int"]}""")
    assert(SchemaCompat.checkBackward(addedNullable, v1).compatible)
  }

  test("type promotions: int→long ok backward, not reverse") {
    val widened = rec("""{"name":"id","type":"string"},{"name":"age","type":"long"}""")
    assert(SchemaCompat.checkBackward(widened, v1).compatible)
    assert(!SchemaCompat.checkBackward(v1, widened).compatible)
    val toBytes = rec("""{"name":"id","type":"bytes"},{"name":"age","type":"int"}""")
    assert(SchemaCompat.checkBackward(toBytes, v1).compatible) // string→bytes
  }

  test("union superset and nullable unwrap are compatible") {
    val nullable = rec("""{"name":"id","type":["null","string"]},{"name":"age","type":"int"}""")
    assert(SchemaCompat.checkBackward(nullable, v1).compatible)
  }

  test("full = backward && forward") {
    val widened = rec("""{"name":"id","type":"string"},{"name":"age","type":"long"}""")
    val full = SchemaCompat.checkFull(widened, v1)
    assert(!full.compatible) // backward ok, forward fails (long unreadable as int)
    assert(full.issues.exists(_.startsWith("forward:")))
  }

  test("fingerprint: canonical — key order and whitespace insensitive") {
    val a = """{"type":"record","name":"X","namespace":"n","fields":[]}"""
    val b = """{ "namespace":"n", "fields":[], "name":"X", "type":"record" }"""
    assert(SchemaCompat.fingerprint(a) == SchemaCompat.fingerprint(b))
    assert(SchemaCompat.fingerprint(a) != SchemaCompat.fingerprint(v1))
    assert(SchemaCompat.fingerprint(a).matches("[0-9a-f]{64}"))
  }

  test("diff reports added/removed/type-changed fields") {
    val v2 = rec("""{"name":"id","type":"bytes"},{"name":"nick","type":"string"}""")
    val d = SchemaCompat.diff(v2, v1)
    assert(d.added == Seq("nick") && d.removed == Seq("age") && d.typeChanged == Seq("id"))
  }

  test("SchemaStore: versioning, compat gate, idempotent re-register") {
    val store = new SchemaStore(SchemaCompat.Backward)
    val r1 = store.register("users-value", v1)
    assert(r1.toOption.get.version == 1)
    // identical schema → same version back
    assert(store.register("users-value", v1).toOption.get.version == 1)
    // incompatible (field removed) → rejected
    val removed = rec("""{"name":"id","type":"string"}""")
    assert(store.register("users-value", removed).isLeft)
    // compatible widening → version 2
    val widened = rec("""{"name":"id","type":"string"},{"name":"age","type":"long"}""")
    assert(store.register("users-value", widened).toOption.get.version == 2)
    assert(store.versions("users-value") == Seq(1, 2))
    val d = store.schemaDiff("users-value", 1, 2).get
    assert(d.typeChanged == Seq("age"))
    // invalid schema rejected with errors
    assert(store.register("users-value", "{}").isLeft)
  }
}
