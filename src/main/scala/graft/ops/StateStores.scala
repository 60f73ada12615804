package graft.ops

/** The ONE `--state-store` name mapping every streaming CLI shares
  * ([[CurateStreamCli]], [[SessionCensusCli]] — a forked copy shipped
  * a shared latent bug: the old per-CLI version lowercased the name
  * BEFORE matching and returned the lowercased binding in the default
  * case, corrupting any fully-qualified custom provider class into an
  * unloadable all-lowercase name).
  *
  * `rocksdb` → the off-heap RocksDB provider (the recommended choice
  * for large state, with changelog checkpointing); `hdfs` → Spark's
  * heap-backed default; anything else is taken VERBATIM as a
  * fully-qualified provider class. NOTE: a checkpoint is bound to the
  * provider that created it — restart an existing checkpoint with the
  * SAME setting. */
private[graft] object StateStores {
  def providerClass(name: String): String = name.toLowerCase match {
    case "rocksdb" =>
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    case "hdfs" =>
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
    case _ => name // the ORIGINAL casing — a class name is case-sensitive
  }
}
