package graft

import java.io.ByteArrayOutputStream
import java.net.InetSocketAddress
import java.nio.file.{Files, Path}
import java.util.zip.{ZipEntry, ZipOutputStream}

import com.sun.net.httpserver.HttpServer
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Fetch

/** Fetch semantics against a loopback HTTP server — the reference's
  * download step (dataset.py:112-217) without egress: skip-existing,
  * no-partial-file-on-failure, zip extraction (incl. slip guard), and the
  * glove/sift orchestration shapes. */
class FetchSpec extends AnyFunSuite {

  private def withServer(routes: Map[String, Array[Byte]])(
      body: String => Unit): Unit = {
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, bytes) =>
      srv.createContext(path, ex => {
        ex.sendResponseHeaders(200, bytes.length.toLong)
        ex.getResponseBody.write(bytes)
        ex.close()
      })
    }
    // any unrouted path → 404
    srv.start()
    try body(s"http://127.0.0.1:${srv.getAddress.getPort}")
    finally srv.stop(0)
  }

  private def tmpDir(): Path = Files.createTempDirectory("fetch-spec")

  private def zipBytes(entries: (String, String)*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    entries.foreach { case (name, content) =>
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  test("fetchFile downloads, skips existing, leaves no partial on failure") {
    val dir = tmpDir()
    withServer(Map("/a.bin" -> Array.fill[Byte](100000)(7))) { base =>
      val dest = dir.resolve("a.bin")
      assert(Fetch.fetchFile(s"$base/a.bin", dest))
      assert(Files.size(dest) == 100000)
      // second call: skip (reference dataset.py:134-136)
      assert(!Fetch.fetchFile(s"$base/a.bin", dest))
      // failing URL: no partial artifacts appear
      val bad = dir.resolve("missing.bin")
      intercept[java.io.IOException] {
        Fetch.fetchFile(s"$base/nope.bin", bad)
      }
      assert(!Files.exists(bad))
      assert(!Files.exists(dir.resolve("missing.bin.part")))
    }
  }

  test("fetchVerified re-fetches corrupt files and rejects bad checksums") {
    val dir = tmpDir()
    val payload = "canonical bytes".getBytes("UTF-8")
    withServer(Map("/d.bin" -> payload)) { base =>
      val dest = dir.resolve("d.bin")
      Files.write(dest, "corrupted".getBytes("UTF-8"))
      val good = {
        val md = java.security.MessageDigest.getInstance("SHA-256")
        md.digest(payload).map("%02x".format(_)).mkString
      }
      Fetch.fetchVerified(s"$base/d.bin", dest, good)
      assert(Files.readAllBytes(dest).sameElements(payload))
      // wrong pin: file must not survive
      intercept[java.io.IOException] {
        Fetch.fetchVerified(s"$base/d.bin", dir.resolve("e.bin"), "00" * 32)
      }
      assert(!Files.exists(dir.resolve("e.bin")))
    }
  }

  test("extractZip restores entries and blocks zip-slip") {
    val dir = tmpDir()
    val zip = dir.resolve("ok.zip")
    Files.write(zip, zipBytes("inner/x.txt" -> "alpha", "y.txt" -> "beta"))
    val out = Fetch.extractZip(zip, dir.resolve("out"))
    assert(out.map(_.getFileName.toString).toSet == Set("x.txt", "y.txt"))
    assert(new String(Files.readAllBytes(
      dir.resolve("out/inner/x.txt")), "UTF-8") == "alpha")
    val evil = dir.resolve("evil.zip")
    Files.write(evil, zipBytes("../escape.txt" -> "nope"))
    intercept[java.io.IOException] {
      Fetch.extractZip(evil, dir.resolve("jail"))
    }
    assert(!Files.exists(dir.resolve("escape.txt")))
  }

  test("fetchGlove: zip fetch + extract, then target-txt short-circuit") {
    val dir = tmpDir()
    val zbytes = zipBytes(
      "glove.6B.50d.txt" -> "the 0.1 0.2\nof 0.3 0.4\n",
      "glove.6B.100d.txt" -> "ignored")
    withServer(Map("/glove.6B.zip" -> zbytes)) { base =>
      val txt = Fetch.fetchGlove(s"$base/glove.6B.zip", dir)
      assert(Files.exists(txt) && Files.exists(dir.resolve("glove.6B.zip")))
      // target exists → nothing fetched even from a dead URL
      // (dataset.py:184-186)
      val again = Fetch.fetchGlove("http://127.0.0.1:1/unreachable.zip", dir)
      assert(again == txt)
    }
  }

  test("fetchSift1m pulls the three TEXMEX files, skipping present ones") {
    val dir = tmpDir()
    val names = Seq("sift_base.fvecs", "sift_query.fvecs",
      "sift_groundtruth.ivecs")
    Files.write(dir.resolve(names.head), Array[Byte](1, 2, 3)) // pre-seeded
    withServer(names.drop(1).map(n => s"/$n" -> n.getBytes("UTF-8")).toMap) {
      base =>
        val got = Fetch.fetchSift1m(s"$base/", dir)
        assert(got.forall(Files.exists(_)))
        // the pre-existing file was not re-fetched/overwritten
        assert(Files.readAllBytes(dir.resolve(names.head))
          .sameElements(Array[Byte](1, 2, 3)))
    }
  }
}
