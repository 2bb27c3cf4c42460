package graft.sources

/** Shared metadata-commit helpers for the engine's persisted index stores
  * (the BM25 posting index and the ANN vector index — the kerchunk
  * parquet-ref writer inlines the same rename convention around its own
  * record-padding logic). One copy of the crash-safety-critical sequence:
  * bytes stage in a HIDDEN sibling (invisible to Spark file indexes and to
  * readers listing the store) and a `FileContext` rename with OVERWRITE
  * swaps them in — atomic on POSIX and HDFS — so a crash mid-write leaves
  * the OLD file readable. A truncate-in-place create would brick a store:
  * an empty meta.json is unparseable forever AND reads as 'already holds
  * an index' on rebuild. */
private[graft] object StoreMeta {

  /** Atomically replace `path` with `json` (staged sibling + rename). */
  def atomicWriteJson(fs: org.apache.hadoop.fs.FileSystem,
                      path: org.apache.hadoop.fs.Path, json: String): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(
      path.getParent, s".${path.getName}.inprogress")
    val out = fs.create(tmp, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(fs.getUri, fs.getConf)
    fc.rename(fc.makeQualified(tmp), fc.makeQualified(path),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** The LIVE view of a store plane: drop rows whose key appears in the
    * tombstone plane (r15) — ONE copy of the join convention both index
    * stores compose (each keeps only its own plane reader). The
    * tombstone side is BROADCAST by design: deletes are deltas
    * (takedowns, dedup prunes), bounded in practice by compaction, which
    * physically drops them and resets the plane — a store whose
    * tombstones rival the corpus needs a compact, not a bigger join.
    * Sits ABOVE the scan, so partition filters and column pruning push
    * through untouched. */
  def dropTombstoned(df: org.apache.spark.sql.DataFrame, key: String,
                     tombstones: Option[org.apache.spark.sql.DataFrame])
      : org.apache.spark.sql.DataFrame =
    tombstones match {
      case None => df
      case Some(t) => df.join(
        org.apache.spark.sql.functions.broadcast(t.select(key)),
        Seq(key), "left_anti")
    }

  /** Hidden staging sibling for a WHOLE-STORE rebuild (r15): a rebuild
    * writes its complete store — batches, model, its own meta LAST —
    * under this path, then [[swapInto]] replaces the live root. Hidden
    * (dot-prefixed) so Spark file listings and store readers never see
    * it; a sibling (same parent) so the final rename never crosses a
    * filesystem. A stale dir here is a crashed rebuild — callers delete
    * it before staging anew. */
  def stagedSibling(root: org.apache.hadoop.fs.Path): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(root.getParent, s".${root.getName}.rebuild")

  /** Swap a fully-built staged store into place: delete the old root (if
    * any), rename staged → root. The ONLY destructive step of a rebuild,
    * and it runs after the staged store is complete and self-described —
    * a failure anywhere earlier leaves the old store byte-intact. A crash
    * BETWEEN the delete and the rename leaves no live root but a
    * complete staged sibling next to it (recoverable by renaming it into
    * place by hand); that is the narrow residual window directory
    * renames cannot close without a filesystem-level transaction.
    * Rebuilds are single-writer, like appends: two concurrent rebuilds
    * would race one staged path. */
  def swapInto(fs: org.apache.hadoop.fs.FileSystem,
               staged: org.apache.hadoop.fs.Path,
               root: org.apache.hadoop.fs.Path): Unit = {
    if (fs.exists(root)) fs.delete(root, true)
    require(fs.rename(staged, root),
      s"store rebuild: rename '$staged' -> '$root' failed — the old store is " +
        "deleted but the complete rebuilt store is at the staged path; " +
        "rename it into place manually")
  }

  /** Parse a JSON file and refuse loudly unless its `format` field equals
    * `format` and its `version` field equals `version` — an unknown layout
    * must never be misread (its fields could mean something else). */
  def parseChecked(fs: org.apache.hadoop.fs.FileSystem,
                   path: org.apache.hadoop.fs.Path, dir: String,
                   format: String, version: Long): org.json4s.JValue = {
    val in = fs.open(path)
    val text = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    val j = org.json4s.jackson.JsonMethods.parse(text)
    import org.json4s._
    (j \ "format") match {
      case JString(`format`) => ()
      case other => throw new IllegalArgumentException(
        s"'$dir' ${path.getName} format is $other, not $format")
    }
    (j \ "version") match {
      case JInt(v) if v.longValue == version => ()
      case JInt(v) => throw new IllegalArgumentException(
        s"'$dir' is a $format layout version $v — this engine reads version $version")
      case other => throw new IllegalArgumentException(
        s"'$dir' ${path.getName} 'version' is ${other.getClass.getSimpleName}")
    }
    j
  }

  /** Read a required integral field from a parsed meta document. */
  def longField(j: org.json4s.JValue, field: String, dir: String): Long = {
    import org.json4s._
    (j \ field) match {
      case JInt(v) => v.longValue
      case other => throw new IllegalArgumentException(
        s"'$dir' meta.json '$field' is ${other.getClass.getSimpleName}")
    }
  }

  /** Read an OPTIONAL boolean field: absent → `default` (the
    * [[longFieldOr]] rule for booleans — e.g. the bm25 store's
    * `positions` flag, absent in every pre-r15 store). */
  def boolFieldOr(j: org.json4s.JValue, field: String, dir: String,
                  default: Boolean): Boolean = {
    import org.json4s._
    (j \ field) match {
      case JBool(v) => v
      case JNothing => default
      case other => throw new IllegalArgumentException(
        s"'$dir' meta.json '$field' is ${other.getClass.getSimpleName}")
    }
  }

  /** Read an OPTIONAL integral field: absent → `default` (how a layout
    * gains a backward-compatible field — e.g. `tombBatches`, absent in
    * every pre-r15 store, semantically 0 there); present-but-non-integral
    * still refuses loudly. */
  def longFieldOr(j: org.json4s.JValue, field: String, dir: String,
                  default: Long): Long = {
    import org.json4s._
    (j \ field) match {
      case JInt(v) => v.longValue
      case JNothing => default
      case other => throw new IllegalArgumentException(
        s"'$dir' meta.json '$field' is ${other.getClass.getSimpleName}")
    }
  }
}
