package graft.harness

import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream, FileStatus, FileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.util.Progressable

/** Read-only Hadoop FileSystem for the object-store smoke test: serves
  * `mocks3://bucket/key` from a local directory configured by
  * `fs.mocks3.localdir`. Registered EXACTLY the way a real deployment
  * registers s3a — per-call `storageOptions` carrying `fs.<scheme>.impl`
  * (+ endpoint/credential keys) overlaid on the Hadoop conf by
  * [[graft.sources.FsPaths.confWith]] — so the spec exercises the same
  * connector path end-to-end, positioned reads included, without a
  * hadoop-aws jar (absent from this container). Test scope only. */
class MockObjectStoreFs extends FileSystem {
  private var uri: URI = _
  private var rootDir: String = _
  private val local = new RawLocalFileSystem()

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    uri = URI.create(s"${name.getScheme}://${Option(name.getAuthority).getOrElse("")}")
    rootDir = conf.get("fs.mocks3.localdir")
    require(rootDir != null, "fs.mocks3.localdir not configured")
    local.initialize(URI.create("file:///"), conf)
  }

  override def getScheme: String = "mocks3"
  override def getUri: URI = uri

  /** mocks3://bucket/key → <localdir>/bucket/key */
  private def localPath(p: Path): Path = {
    val u = p.toUri
    val bucket = Option(u.getAuthority).getOrElse("")
    new Path(s"file://$rootDir/$bucket${u.getPath}")
  }
  private def publicPath(lp: Path): Path = {
    val rel = lp.toUri.getPath.stripPrefix(rootDir).stripPrefix("/")
    val (bucket, key) = rel.span(_ != '/')
    new Path(s"mocks3://$bucket$key")
  }

  override def open(p: Path, bufferSize: Int): FSDataInputStream =
    local.open(localPath(p), bufferSize)

  override def getFileStatus(p: Path): FileStatus = {
    val st = local.getFileStatus(localPath(p))
    new FileStatus(st.getLen, st.isDirectory, 1, st.getBlockSize,
      st.getModificationTime, publicPath(st.getPath))
  }

  override def listStatus(p: Path): Array[FileStatus] =
    local.listStatus(localPath(p)).map { st =>
      new FileStatus(st.getLen, st.isDirectory, 1, st.getBlockSize,
        st.getModificationTime, publicPath(st.getPath))
    }

  override def setWorkingDirectory(p: Path): Unit = ()
  override def getWorkingDirectory: Path = new Path(uri.toString + "/")
  override def mkdirs(p: Path, perm: org.apache.hadoop.fs.permission.FsPermission): Boolean =
    throw new UnsupportedOperationException("mocks3 is read-only")
  override def create(p: Path, perm: org.apache.hadoop.fs.permission.FsPermission,
                      overwrite: Boolean, bufferSize: Int, replication: Short,
                      blockSize: Long, progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("mocks3 is read-only")
  override def append(p: Path, bufferSize: Int, progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("mocks3 is read-only")
  override def rename(src: Path, dst: Path): Boolean =
    throw new UnsupportedOperationException("mocks3 is read-only")
  override def delete(p: Path, recursive: Boolean): Boolean =
    throw new UnsupportedOperationException("mocks3 is read-only")
}
