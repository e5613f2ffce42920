package graft.ops

import java.net.InetSocketAddress
import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** The loopback stand-in for the reference's four WAN endpoints: a real
  * HTTP server (JDK built-in) serving the SAME staged fixture files the
  * file-based sources read, so [[graft.sources.RestSource]] is exercised
  * over genuine sockets + HTTP semantics while staying deterministic and
  * offline. At production scale the base URL is the real LANDFIRE/ORNL/
  * OWM/USGS host; nothing else changes.
  *
  * Endpoints:
  *   - `/files/<relpath>`  — bytes of `Fixtures.Root/<relpath>` (200),
  *     404 when absent; path traversal rejected.
  *   - `/flaky/<key>`      — per-key cycle of three: 503, 503, then 200
  *     `ok:<key>`. Every fetch-with-2+-retries consumes exactly one full
  *     cycle, so attempts=3 is deterministic across repeated runs.
  *   - anything else       — 404.
  *
  * Started lazily once per JVM on an ephemeral port; daemon threads, so
  * JVM exit is never held up.
  */
object StagedRestEndpoint {

  private val flakyCounters = new ConcurrentHashMap[String, AtomicInteger]()

  lazy val baseUrl: String = {
    Fixtures.stage()
    val root = Paths.get(Fixtures.Root).toAbsolutePath.normalize
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)

    def respond(ex: HttpExchange, status: Int, body: Array[Byte], ctype: String): Unit = {
      ex.getResponseHeaders.set("Content-Type", ctype)
      ex.sendResponseHeaders(status, if (body.isEmpty) -1 else body.length)
      if (body.nonEmpty) ex.getResponseBody.write(body)
      ex.close()
    }

    server.createContext("/files/", { ex =>
      val rel = ex.getRequestURI.getPath.stripPrefix("/files/")
      val target: Path = root.resolve(rel).normalize
      if (!target.startsWith(root) || !Files.isRegularFile(target))
        respond(ex, 404, Array.emptyByteArray, "text/plain")
      else {
        val ctype =
          if (rel.endsWith(".jsonl") || rel.endsWith(".json")) "application/json"
          else if (rel.endsWith(".csv")) "text/csv"
          else if (rel.endsWith(".tif")) "image/tiff"
          else "application/octet-stream"
        respond(ex, 200, Files.readAllBytes(target), ctype)
      }
    })
    server.createContext("/flaky/", { ex =>
      val key = ex.getRequestURI.getPath.stripPrefix("/flaky/")
      val n = flakyCounters.computeIfAbsent(key, _ => new AtomicInteger(0)).getAndIncrement()
      if (n % 3 < 2) respond(ex, 503, "upstream busy".getBytes, "text/plain")
      else respond(ex, 200, s"ok:$key".getBytes, "text/plain")
    })
    server.createContext("/", { ex =>
      respond(ex, 404, Array.emptyByteArray, "text/plain")
    })

    val pool = java.util.concurrent.Executors.newFixedThreadPool(4, r => {
      val t = new Thread(r, "graft-staged-rest")
      t.setDaemon(true)
      t
    })
    server.setExecutor(pool)
    // start() spawns the HTTP-Dispatcher thread, which is NON-daemon and
    // would pin the JVM open after main returns (a Verify/Bench run would
    // never exit). Daemon status is inherited from the spawning thread,
    // so start from a short-lived daemon thread.
    val starter = new Thread(() => server.start(), "graft-staged-rest-starter")
    starter.setDaemon(true)
    starter.start()
    starter.join()
    sys.addShutdownHook { server.stop(0); pool.shutdownNow() }
    s"http://127.0.0.1:${server.getAddress.getPort}"
  }
}
