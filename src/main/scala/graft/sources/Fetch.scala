package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, FileOutputStream,
  InputStream}
import java.net.URI
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.zip.ZipInputStream

/** Dataset fetch — the reference's download step
  * (`src/benchmark/dataset.py:99-217`: sift1m pulls three TEXMEX files
  * over FTP, glove50 pulls one HTTP zip and extracts it) as scheme-generic
  * JVM streaming. `java.net.URL` resolves `http(s)://`, `ftp://` (anonymous
  * login, like the reference's `ftp.login()`), and `file://` with one code
  * path, so the per-protocol branches in the reference collapse.
  *
  * Reliability discipline kept from the reference, hardened:
  *  - existing destination files are skipped (dataset.py:134-136, 186-190)
  *  - a failed transfer never leaves a partial file behind
  *    (dataset.py:166-169) — here downloads write to a `.part` sibling and
  *    atomically rename on success, so even a kill -9 can't produce a
  *    truncated file that a later run would mistake for complete
  *  - zip extraction rejects entries escaping the target dir (zip-slip),
  *    which `zipfile.extractall` in the reference does not.
  *
  * Driver-side by design: dataset acquisition is a one-time, one-machine
  * step (the files then land on shared/distributed storage for executors);
  * there is nothing to parallelize until the bytes exist.
  */
object Fetch {

  /** copy a stream to a file through a `.part` staging sibling + atomic
    * rename; returns bytes written. The staging file is deleted on any
    * failure. */
  private def streamTo(in: InputStream, dest: Path): Long = {
    val part = dest.resolveSibling(dest.getFileName.toString + ".part")
    Option(dest.getParent).foreach(Files.createDirectories(_))
    val out = new BufferedOutputStream(new FileOutputStream(part.toFile))
    var written = 0L
    try {
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) {
        out.write(buf, 0, n); written += n; n = in.read(buf)
      }
      out.close()
      // ATOMIC_MOVE within one directory: complete file or no file
      Files.move(part, dest, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      written
    } catch {
      case e: Throwable =>
        try out.close() catch { case _: Throwable => () }
        Files.deleteIfExists(part)
        throw e
    } finally in.close()
  }

  /** fetch `url` to `dest` unless it already exists (skip-existing is the
    * reference's resume story); returns true if a transfer happened */
  def fetchFile(url: String, dest: Path): Boolean = {
    if (Files.exists(dest)) false
    else {
      val conn = new URI(url).toURL.openConnection()
      conn.setConnectTimeout(30000)
      conn.setReadTimeout(120000)
      streamTo(new BufferedInputStream(conn.getInputStream), dest)
      true
    }
  }

  /** hex sha256 of a file (integrity pinning for fetched artifacts) */
  def sha256(path: Path): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val in = Files.newInputStream(path)
    try {
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) { md.update(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    md.digest().map("%02x".format(_)).mkString
  }

  /** fetch + verify: an existing-but-corrupt file is re-fetched once, a
    * corrupt transfer is deleted and an error raised (never left on disk) */
  def fetchVerified(url: String, dest: Path, expectedSha256: String): Unit = {
    if (Files.exists(dest) && sha256(dest) == expectedSha256) return
    Files.deleteIfExists(dest)
    fetchFile(url, dest)
    val got = sha256(dest)
    if (got != expectedSha256) {
      Files.deleteIfExists(dest)
      throw new java.io.IOException(
        s"checksum mismatch for $url: expected $expectedSha256, got $got")
    }
  }

  /** extract a zip into `destDir` (zip-slip-guarded), returning the
    * extracted paths; existing files are overwritten like
    * `zipfile.extractall` */
  def extractZip(zip: Path, destDir: Path): Seq[Path] = {
    val root = destDir.toAbsolutePath.normalize
    Files.createDirectories(root)
    val zin = new ZipInputStream(
      new BufferedInputStream(Files.newInputStream(zip)))
    val out = Seq.newBuilder[Path]
    try {
      var e = zin.getNextEntry
      while (e != null) {
        val target = root.resolve(e.getName).normalize
        if (!target.startsWith(root))
          throw new java.io.IOException(
            s"zip entry escapes extraction dir: ${e.getName}")
        if (e.isDirectory) Files.createDirectories(target)
        else {
          // stream the entry through the same staged-rename path
          Option(target.getParent).foreach(Files.createDirectories(_))
          val noClose = new java.io.FilterInputStream(zin) {
            override def close(): Unit = () // keep the zip stream open
          }
          streamTo(noClose, target)
          out += target
        }
        zin.closeEntry()
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.result()
  }

  /** the reference's `_download_sift1m` (dataset.py:112-170): three TEXMEX
    * files from one base URL, each skip-if-present */
  def fetchSift1m(baseUrl: String, dataDir: Path): Seq[Path] = {
    val files = Seq("sift_base.fvecs", "sift_query.fvecs",
      "sift_groundtruth.ivecs")
    files.map { f =>
      val dest = dataDir.resolve(f)
      fetchFile(if (baseUrl.endsWith("/")) baseUrl + f else s"$baseUrl/$f",
        dest)
      dest
    }
  }

  /** the reference's `_download_glove` (dataset.py:176-217): skip
    * everything if the target txt exists; else fetch the zip (skip if
    * present) and extract */
  def fetchGlove(url: String, dataDir: Path,
      targetTxt: String = "glove.6B.50d.txt"): Path = {
    val txt = dataDir.resolve(targetTxt)
    if (!Files.exists(txt)) {
      val zip = dataDir.resolve(url.split('/').last)
      fetchFile(url, zip)
      extractZip(zip, dataDir)
      if (!Files.exists(txt))
        throw new java.io.IOException(
          s"archive $zip did not contain $targetTxt")
    }
    txt
  }

  /** reference AVAILABLE_DATASETS urls (dataset.py:31-56) */
  val defaultUrls: Map[String, String] = Map(
    "sift1m" -> "ftp://ftp.irisa.fr/local/texmex/corpus/",
    "glove50" -> "http://nlp.stanford.edu/data/glove.6B.zip")

  /** catalog hook: ensure `name`'s raw files exist under `dataDir`,
    * fetching from `url` (or the published default) when absent. Datasets
    * that are generated (`random`) or explicitly local
    * (`msmarco-preembedded`) are no-ops, mirroring `Dataset.download`. */
  def ensure(name: String, dataDir: String, url: Option[String]): Unit =
    name match {
      case "sift1m" =>
        fetchSift1m(url.orElse(defaultUrls.get(name)).get, Paths.get(dataDir))
      case "glove50" =>
        fetchGlove(url.orElse(defaultUrls.get(name)).get, Paths.get(dataDir))
      case _ => ()
    }
}
