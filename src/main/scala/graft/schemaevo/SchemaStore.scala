package graft.schemaevo

import scala.collection.concurrent.TrieMap

/** In-house schema registry (reference: registry REST client,
  * `src/utils/schema_validator.py:82-165,519-768` — here a versioned
  * store of (subject, version, schema, fingerprint) with a compat gate
  * on registration, mirroring subject naming `<topic>-value`
  * (data-model.md:136-166)).
  *
  * Backing is an in-memory map; at deployment scale the same interface
  * persists to a small warehouse table — the store is tiny (one row per
  * schema version), never a distributed-data concern.
  */
final class SchemaStore(defaultMode: SchemaCompat.Mode = SchemaCompat.Backward,
    /** M4 schema metrics (metrics.py:308-384): change / compat-failure
      * counters and current-version gauges flow here when provided. */
    metrics: Option[graft.observe.MetricsRegistry] = None) {

  final case class Registered(subject: String, version: Int, schemaJson: String,
      fingerprint: String)

  private val store = TrieMap[String, Vector[Registered]]()
  private val modes = TrieMap[String, SchemaCompat.Mode]()

  def setCompatibility(subject: String, mode: SchemaCompat.Mode): Unit =
    modes.put(subject, mode)

  def compatibilityOf(subject: String): SchemaCompat.Mode =
    modes.getOrElse(subject, defaultMode)

  /** Validate + compat-check against the latest version, then register.
    * Registering a fingerprint-identical schema is a no-op returning the
    * existing version (idempotent, like the reference registry). */
  def register(subject: String, schemaJson: String,
      strict: Boolean = false): Either[Seq[String], Registered] = {
    val v = SchemaCompat.validate(schemaJson, strict)
    if (!v.valid) {
      metrics.foreach(_.inc("schema_validation_failures_total", 1.0,
        Map("subject" -> subject)))
      return Left(v.errors)
    }
    val fp = SchemaCompat.fingerprint(schemaJson)
    val versions = store.getOrElse(subject, Vector.empty)
    versions.find(_.fingerprint == fp) match {
      case Some(existing) => Right(existing)
      case None =>
        versions.lastOption match {
          case Some(latest) =>
            val c = SchemaCompat.check(compatibilityOf(subject), schemaJson, latest.schemaJson)
            if (!c.compatible) {
              metrics.foreach(_.inc("schema_compat_failures_total", 1.0,
                Map("subject" -> subject,
                  "mode" -> compatibilityOf(subject).toString)))
              return Left(c.issues)
            }
          case None =>
        }
        val reg = Registered(subject, versions.length + 1, schemaJson, fp)
        store.put(subject, versions :+ reg)
        metrics.foreach { m =>
          m.inc("schema_changes_total", 1.0, Map("subject" -> subject))
          m.setGauge("schema_current_version", reg.version.toDouble,
            Map("subject" -> subject))
        }
        Right(reg)
    }
  }

  def testCompatibility(subject: String, schemaJson: String): SchemaCompat.CompatResult =
    latest(subject) match {
      case Some(l) => SchemaCompat.check(compatibilityOf(subject), schemaJson, l.schemaJson)
      case None => SchemaCompat.CompatResult(compatible = true, Nil)
    }

  def latest(subject: String): Option[Registered] =
    store.get(subject).flatMap(_.lastOption)

  def get(subject: String, version: Int): Option[Registered] =
    store.get(subject).flatMap(_.find(_.version == version))

  def versions(subject: String): Seq[Int] =
    store.getOrElse(subject, Vector.empty).map(_.version)

  def subjects: Seq[String] = store.keys.toSeq.sorted

  def delete(subject: String): Unit = { store.remove(subject); modes.remove(subject) }

  def schemaDiff(subject: String, v1: Int, v2: Int): Option[SchemaCompat.SchemaDiff] =
    for (a <- get(subject, v1); b <- get(subject, v2))
      yield SchemaCompat.diff(b.schemaJson, a.schemaJson)
}
