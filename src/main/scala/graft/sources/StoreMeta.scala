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
}
