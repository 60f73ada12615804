package graft.schemaevo

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import java.security.MessageDigest
import scala.jdk.CollectionConverters._

/** Avro-schema validation + compatibility checking (reference:
  * `src/utils/schema_validator.py:168-471`). Pure JVM-side logic — runs on
  * the driver as a pre-merge gate for the CDC stream (SURVEY §7.4.4: Spark
  * streams fix their schema at start; an incompatible change must block
  * and alert rather than corrupt the sink).
  *
  * Jackson (shipped with Spark) parses the Avro JSON; no Avro runtime
  * dependency needed for structural/compat checks.
  */
object SchemaCompat {

  sealed trait Mode
  case object Backward extends Mode
  case object Forward  extends Mode
  case object Full     extends Mode
  case object NoCheck  extends Mode

  final case class ValidationResult(valid: Boolean, errors: Seq[String],
      warnings: Seq[String])
  final case class CompatResult(compatible: Boolean, issues: Seq[String])

  private val mapper = new ObjectMapper()
  private val ComplexTypes = Set("record", "enum", "array", "map", "fixed")
  private val PrimitiveTypes =
    Set("null", "boolean", "int", "long", "float", "double", "bytes", "string")

  /** Widening promotions (schema_validator.py:461-469):
    * int→long/float/double, long→float/double, float→double, string→bytes. */
  private val Promotions: Map[String, Set[String]] = Map(
    "int"    -> Set("long", "float", "double"),
    "long"   -> Set("float", "double"),
    "float"  -> Set("double"),
    "string" -> Set("bytes"))

  def parse(json: String): JsonNode = mapper.readTree(json)

  // ---- V1 structural validation (schema_validator.py:168-243) ----------

  def validate(schemaJson: String, strict: Boolean = false): ValidationResult = {
    val errors = scala.collection.mutable.ArrayBuffer[String]()
    val warnings = scala.collection.mutable.ArrayBuffer[String]()
    val node =
      try parse(schemaJson)
      catch { case e: Exception =>
        return ValidationResult(valid = false, Seq(s"invalid JSON: ${e.getMessage}"), Nil)
      }
    def typeName(n: JsonNode): String =
      if (n.isTextual) n.asText()
      else if (n.isObject && n.has("type")) n.get("type").asText()
      else ""
    // named types (record/enum/fixed) already declared — Avro allows a
    // later field to reference them by name (textual OR object form),
    // and requires definition before use, so single-pass accumulation
    // matches the spec. Registration covers the bare name, the explicit
    // fullname, and the INHERITED fullname (a nested type without its
    // own `namespace` lives in the enclosing one). Reference RESOLUTION
    // here is deliberately lenient — any registered spelling matches;
    // this is the structural gate, not a full Avro name resolver.
    val declaredNames = scala.collection.mutable.Set.empty[String]
    def declareName(o: ObjectNode, inheritedNs: String): Unit =
      if (o.has("name")) {
        val n = o.get("name").asText()
        declaredNames += n
        val ns = if (o.has("namespace")) o.get("namespace").asText() else inheritedNs
        if (ns.nonEmpty) declaredNames += s"$ns.$n"
      }
    def nsOf(o: ObjectNode, inheritedNs: String): String =
      if (o.has("namespace")) o.get("namespace").asText() else inheritedNs
    def walk(n: JsonNode, path: String, ns: String): Unit = n match {
      case o: ObjectNode =>
        if (!o.has("type")) { errors += s"$path: missing required 'type'"; return }
        val t = o.get("type").asText()
        if (!ComplexTypes.contains(t) && !PrimitiveTypes.contains(t)
            && !declaredNames.contains(t))
          errors += s"$path: invalid type '$t'"
        t match {
          case "record" =>
            declareName(o, ns)
            if (!o.has("name")) errors += s"$path: record missing 'name'"
            if (!o.has("namespace")) {
              if (strict) errors += s"$path: record missing 'namespace' (strict)"
              else warnings += s"$path: record missing 'namespace'"
            }
            if (!o.has("fields") || !o.get("fields").isArray)
              errors += s"$path: record needs a 'fields' list"
            else o.get("fields").elements().asScala.zipWithIndex.foreach {
              case (f, i) =>
                if (!f.has("name")) errors += s"$path.fields[$i]: field missing 'name'"
                if (!f.has("type")) errors += s"$path.fields[$i]: field missing 'type'"
                else {
                  // walk EVERY field-type node — textual (catches typo'd
                  // primitives like "strin"), union arrays, and objects
                  val fname = if (f.has("name")) f.get("name").asText() else s"fields[$i]"
                  walk(f.get("type"), s"$path.$fname", nsOf(o, ns))
                }
            }
          case "enum" =>
            declareName(o, ns)
            if (!o.has("symbols")) errors += s"$path: enum missing 'symbols'"
          case "fixed" =>
            declareName(o, ns)
            if (!o.has("size")) errors += s"$path: fixed missing 'size'"
          case "array" if !o.has("items") => errors += s"$path: array missing 'items'"
          case "map" if !o.has("values") => errors += s"$path: map missing 'values'"
          case _ =>
        }
      case t if t.isTextual =>
        if (!PrimitiveTypes.contains(t.asText()) && !ComplexTypes.contains(t.asText())
            && !declaredNames.contains(t.asText()))
          errors += s"$path: invalid type '${t.asText()}'"
      case a: ArrayNode => // union
        a.elements().asScala.foreach(walk(_, s"$path|union", ns))
      case _ => errors += s"$path: unrecognized schema node"
    }
    walk(node, "$", "")
    ValidationResult(errors.isEmpty, errors.toSeq, warnings.toSeq)
  }

  // ---- field extraction -------------------------------------------------

  private final case class AField(name: String, tpe: JsonNode, hasDefault: Boolean)

  private def fieldsOf(schema: JsonNode): Seq[AField] =
    if (schema.isObject && schema.path("type").asText() == "record" &&
        schema.has("fields"))
      schema.get("fields").elements().asScala.map { f =>
        AField(f.get("name").asText(), f.get("type"), f.has("default"))
      }.toSeq
    else Seq.empty

  // ---- V5 type compatibility (schema_validator.py:429-471) --------------

  /** Can data written with `writer` be read as `reader`? exact match,
    * union-superset, nullable unwrap, widening promotions. */
  def isTypeCompatible(writer: JsonNode, reader: JsonNode): Boolean = {
    def names(n: JsonNode): Set[String] =
      if (n.isArray) n.elements().asScala.map(x =>
        if (x.isTextual) x.asText() else x.path("type").asText()).toSet
      else if (n.isTextual) Set(n.asText())
      else Set(n.path("type").asText())
    val w = names(writer)
    val r = names(reader)
    if (w.subsetOf(r)) true // exact or union superset (incl. nullable unwrap)
    else w.forall(wt => r.contains(wt) || wt == "null" ||
      Promotions.getOrElse(wt, Set.empty).exists(r.contains))
  }

  // ---- V2/V3/V4 compatibility modes (schema_validator.py:245-427) -------

  /** BACKWARD: a reader with `newSchema` can read data written with
    * `oldSchema` — no field removed; added fields need defaults; types
    * must promote old→new.
    *
    * NOTE this is deliberately the REFERENCE's rule set
    * (schema_validator.py:245-308, SURVEY §2.10 V2), which is stricter
    * than Avro/Confluent BACKWARD: standard Avro treats field removal as
    * backward-compatible (the new reader just ignores the old bytes),
    * while the reference flags every removal. Parity wins here — a CDC
    * sink that silently drops a column on "compatible" evolution is the
    * failure the reference is guarding against. */
  def checkBackward(newSchema: String, oldSchema: String): CompatResult = {
    val issues = scala.collection.mutable.ArrayBuffer[String]()
    val newF = fieldsOf(parse(newSchema)).map(f => f.name -> f).toMap
    val oldF = fieldsOf(parse(oldSchema)).map(f => f.name -> f).toMap
    oldF.keySet.diff(newF.keySet).toSeq.sorted.foreach(n =>
      issues += s"field '$n' removed (old data still carries it)")
    newF.values.toSeq.sortBy(_.name).foreach { f =>
      oldF.get(f.name) match {
        case None =>
          if (!f.hasDefault && !isNullable(f.tpe))
            issues += s"added field '${f.name}' has no default"
        case Some(old) =>
          if (!isTypeCompatible(old.tpe, f.tpe))
            issues += s"field '${f.name}': type ${old.tpe} not readable as ${f.tpe}"
      }
    }
    CompatResult(issues.isEmpty, issues.toSeq)
  }

  /** FORWARD: an old reader can read data written with `newSchema`. */
  def checkForward(newSchema: String, oldSchema: String): CompatResult = {
    val issues = scala.collection.mutable.ArrayBuffer[String]()
    val newF = fieldsOf(parse(newSchema)).map(f => f.name -> f).toMap
    val oldF = fieldsOf(parse(oldSchema)).map(f => f.name -> f).toMap
    // fields added in newSchema are simply skipped by old readers — no check
    oldF.values.toSeq.sortBy(_.name).foreach { f =>
      newF.get(f.name) match {
        case None =>
          if (!f.hasDefault && !isNullable(f.tpe))
            issues += s"field '${f.name}' removed without default (old reader breaks)"
        case Some(nf) =>
          if (!isTypeCompatible(nf.tpe, f.tpe))
            issues += s"field '${f.name}': type ${nf.tpe} not readable as ${f.tpe}"
      }
    }
    CompatResult(issues.isEmpty, issues.toSeq)
  }


  def checkFull(newSchema: String, oldSchema: String): CompatResult = {
    val b = checkBackward(newSchema, oldSchema)
    val f = checkForward(newSchema, oldSchema)
    CompatResult(b.compatible && f.compatible,
      b.issues.map("backward: " + _) ++ f.issues.map("forward: " + _))
  }

  def check(mode: Mode, newSchema: String, oldSchema: String): CompatResult =
    mode match {
      case Backward => checkBackward(newSchema, oldSchema)
      case Forward  => checkForward(newSchema, oldSchema)
      case Full     => checkFull(newSchema, oldSchema)
      case NoCheck  => CompatResult(compatible = true, Nil)
    }

  private def isNullable(t: JsonNode): Boolean =
    (t.isTextual && t.asText() == "null") ||
      (t.isArray && t.elements().asScala.exists(n => n.isTextual && n.asText() == "null"))

  // ---- V7 fingerprint (schema_validator.py:492-508) ---------------------

  /** SHA-256 of the canonical (sorted-key, compact) JSON. */
  def fingerprint(schemaJson: String): String = {
    val canonical = canonicalize(parse(schemaJson))
    MessageDigest.getInstance("SHA-256")
      .digest(canonical.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  private def canonicalize(n: JsonNode): String = n match {
    case o: ObjectNode =>
      o.fieldNames().asScala.toSeq.sorted
        .map(k => s""""$k":${canonicalize(o.get(k))}""")
        .mkString("{", ",", "}")
    case a: ArrayNode =>
      a.elements().asScala.map(canonicalize).mkString("[", ",", "]")
    case other => other.toString
  }

  // ---- V8-adjacent: field-level schema diff (schema_validator.py:631-680)

  final case class SchemaDiff(added: Seq[String], removed: Seq[String],
      typeChanged: Seq[String])

  def diff(newSchema: String, oldSchema: String): SchemaDiff = {
    val newF = fieldsOf(parse(newSchema)).map(f => f.name -> f).toMap
    val oldF = fieldsOf(parse(oldSchema)).map(f => f.name -> f).toMap
    SchemaDiff(
      added = newF.keySet.diff(oldF.keySet).toSeq.sorted,
      removed = oldF.keySet.diff(newF.keySet).toSeq.sorted,
      typeChanged = newF.keySet.intersect(oldF.keySet).toSeq.sorted
        .filter(n => newF(n).tpe != oldF(n).tpe))
  }
}
