package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.security.MessageDigest
import java.time.Duration

/** Whole-file http(s) fetch with a deterministic local cache — the engine's
  * analog of the reference's fsspec `simplecache::https://` pattern for the
  * *catalog plane* (JSON descriptors + small CSV/parquet asset tables;
  * `cat.py:238-280` opens both through fsspec, and the tutorial catalogs
  * `tutorial.py:9-56` are plain https URLs).
  *
  * Scope is deliberately narrow: a catalog descriptor and its asset table
  * are kilobytes-to-megabytes, so a driver-side whole-file download is the
  * right shape, exactly like fsspec's simplecache. The *data* plane
  * (netCDF/zarr chunk byte-ranges) stays behind the connector boundary —
  * http has no seekable Hadoop FileSystem, and range-request chunk I/O
  * belongs in a connector, not here (see FsPaths.connectorRefusal).
  *
  * Cache layout: /tmp/graft_http_cache/<sha256(url) first 16 hex>/<basename>,
  * written atomically (tmp file + ATOMIC_MOVE) so concurrent fetches of the
  * same URL race benignly. The basename is preserved because downstream
  * readers dispatch on the file extension (.json/.csv/.csv.gz/.parquet).
  */
object HttpFetch {

  private val httpScheme = "(?i)^https?://.*".r

  def isHttp(url: String): Boolean = httpScheme.matches(url)

  /** Default whole-file size cap. A catalog table is small by construction;
    * anything larger over http is a misdirected data read and should go
    * through a real connector. Overridable per call via the
    * `graft.http.maxBytes` storage option. */
  val DefaultMaxBytes: Long = 256L << 20

  val MaxBytesOption = "graft.http.maxBytes"

  def maxBytesFrom(storageOptions: Map[String, String]): Long =
    storageOptions.get(MaxBytesOption).map(_.toLong).getOrElse(DefaultMaxBytes)

  private lazy val client: HttpClient = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL)
    .connectTimeout(Duration.ofSeconds(30))
    .build()

  private def cachePathFor(url: String): Path = {
    val digest = MessageDigest.getInstance("SHA-256")
      .digest(url.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    val base = {
      val p = new URI(url).getPath
      val name = Option(p).map(_.stripSuffix("/")).map(s => s.substring(s.lastIndexOf('/') + 1))
        .filter(_.nonEmpty).getOrElse("index")
      // keep it a safe single path segment
      name.replaceAll("[^A-Za-z0-9._-]", "_")
    }
    Paths.get("/tmp/graft_http_cache", digest, base)
  }

  /** Fetch `url` to the local cache (reusing a previous download of the
    * same URL) and return the local path. Refuses non-2xx responses and
    * bodies over `maxBytes` with a clear error. */
  def fetchCached(url: String, maxBytes: Long = DefaultMaxBytes): String = {
    require(isHttp(url), s"not an http(s) url: $url")
    val dest = cachePathFor(url)
    if (Files.exists(dest)) return dest.toString
    Files.createDirectories(dest.getParent)

    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofMinutes(5)).GET().build()
    val resp =
      try client.send(req, HttpResponse.BodyHandlers.ofInputStream())
      catch {
        case e: java.io.IOException => throw new java.io.IOException(
          s"http fetch failed for catalog url '$url' (no egress, DNS, or refused " +
            "connection?): " + e.getMessage, e)
      }
    if (resp.statusCode() / 100 != 2) {
      resp.body().close()
      throw new java.io.IOException(
        s"http fetch for catalog url '$url' returned status ${resp.statusCode()}")
    }

    val tmp = Files.createTempFile(dest.getParent, dest.getFileName.toString, ".part")
    try {
      val in = resp.body()
      val out = Files.newOutputStream(tmp)
      try {
        val buf = new Array[Byte](1 << 16)
        var total = 0L
        var n = in.read(buf)
        while (n >= 0) {
          total += n
          if (total > maxBytes)
            throw new java.io.IOException(
              s"http object '$url' exceeds the catalog-plane size cap ($maxBytes bytes; " +
                s"override with storage option $MaxBytesOption). Large objects over http " +
                "are a data read and belong behind a filesystem connector.")
          out.write(buf, 0, n)
          n = in.read(buf)
        }
      } finally { out.close(); in.close() }
      try Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE)
      catch {
        // another fetch of the same URL won the race — its bytes are ours
        case _: java.nio.file.FileAlreadyExistsException => ()
      }
      dest.toString
    } finally Files.deleteIfExists(tmp)
  }
}
