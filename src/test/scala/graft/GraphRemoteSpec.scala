package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.api.DuckLakeXLSpark
import graft.xlsx.{DeviceCodeTokenProvider, GraphRemote, GraphTokenProvider, StaticTokenProvider}

/** A3-A9 over a local mock of the Microsoft Graph workbook API: item
  * resolution, workbook upload/create, sessions, sheet add/clear/write,
  * usedRange reads, 429 Retry-After + 401-refresh retries, and the OAuth
  * device-code flow — the full protocol the reference's onedrive client
  * speaks (ducklakexl.py:100-354), testable offline because GraphRemote
  * takes an injectable base URL.
  */
class GraphRemoteSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  /** in-memory "OneDrive": one workbook of named sheets of string cells */
  private final class MockGraph {
    var workbookExists = false
    val sheets = mutable.LinkedHashMap[String, Seq[Seq[String]]]()
    var rate429sRemaining = 0   // next N workbook calls answer 429
    var reject401Once = false   // next call answers 401 (token expiry)
    var usedRangeDelayMs = 0L   // slow reads, to observe read concurrency
    val inFlightReads = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxInFlightReads = new java.util.concurrent.atomic.AtomicInteger(0)
    var sessionsOpened = 0
    var sessionsClosed = 0
    var sawSessionHeader = 0

    private def respond(ex: HttpExchange, code: Int, body: String = ""): Unit = {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
      if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
      ex.close()
    }

    private def readBody(ex: HttpExchange): String =
      new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)

    def handle(ex: HttpExchange): Unit = {
      val path = java.net.URLDecoder.decode(ex.getRequestURI.getPath, StandardCharsets.UTF_8)
      val method = ex.getRequestMethod
      if (Option(ex.getRequestHeaders.getFirst("workbook-session-id")).isDefined)
        sawSessionHeader += 1
      if (reject401Once) { reject401Once = false; respond(ex, 401, """{"error":"token expired"}"""); return }
      if (path.contains("/workbook/") && rate429sRemaining > 0) {
        rate429sRemaining -= 1
        ex.getResponseHeaders.set("Retry-After", "0")
        respond(ex, 429, """{"error":"throttled"}"""); return
      }
      (method, path) match {
        case ("GET", p) if p.endsWith("/root:/lake.xlsx") =>
          if (workbookExists) respond(ex, 200, """{"id":"item1"}""")
          else respond(ex, 404, """{"error":"itemNotFound"}""")
        case ("PUT", p) if p.endsWith("/root:/lake.xlsx:/content") =>
          workbookExists = true
          if (sheets.isEmpty) sheets("Sheet1") = Seq.empty
          respond(ex, 201, """{"id":"item1"}""")
        case ("POST", p) if p.endsWith("/workbook/createSession") =>
          sessionsOpened += 1
          respond(ex, 201, s"""{"id":"sess$sessionsOpened"}""")
        case ("POST", p) if p.endsWith("/workbook/closeSession") =>
          sessionsClosed += 1
          respond(ex, 204)
        case ("GET", p) if p.endsWith("/workbook/worksheets") =>
          val names = sheets.keys.map(n =>
            s"""{"name":${mapper.writeValueAsString(n)}}""").mkString(",")
          respond(ex, 200, s"""{"value":[$names]}""")
        case ("POST", p) if p.endsWith("/workbook/worksheets/add") =>
          val n = mapper.readTree(readBody(ex)).get("name").asText()
          sheets.getOrElseUpdate(n, Seq.empty)
          respond(ex, 201, s"""{"name":${mapper.writeValueAsString(n)}}""")
        case ("POST", p) if p.contains("/worksheets('") && p.endsWith("/usedRange/clear") =>
          val n = p.substring(p.indexOf("worksheets('") + 12, p.indexOf("')"))
          sheets(n) = Seq.empty
          respond(ex, 204)
        case ("GET", p) if p.contains("/worksheets('") && p.endsWith("/usedRange") =>
          val cur = inFlightReads.incrementAndGet()
          maxInFlightReads.getAndUpdate(m => math.max(m, cur))
          if (usedRangeDelayMs > 0) Thread.sleep(usedRangeDelayMs)
          try {
            val n = p.substring(p.indexOf("worksheets('") + 12, p.indexOf("')"))
            val rows = sheets.getOrElse(n, Seq.empty)
            val text = mapper.writeValueAsString(rows.map(_.asJava).asJava)
            respond(ex, 200, s"""{"address":"A1","text":$text}""")
          } finally inFlightReads.decrementAndGet()
        case ("DELETE", p) if p.contains("/worksheets('") =>
          val n = p.substring(p.indexOf("worksheets('") + 12, p.indexOf("')"))
          sheets.remove(n)
          respond(ex, 204)
        case ("PATCH", p) if p.contains("/range(address=") =>
          val n = p.substring(p.indexOf("worksheets('") + 12, p.indexOf("')"))
          val vals = mapper.readTree(readBody(ex)).get("values")
          sheets(n) = vals.elements().asScala.map(r =>
            r.elements().asScala.map(_.asText()).toSeq).toSeq
          respond(ex, 200, "{}")
        case _ =>
          respond(ex, 500, s"""{"error":"unhandled $method $path"}""")
      }
    }
  }

  private def withServer[A](mock: MockGraph)(body: String => A): A = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => mock.handle(ex))
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/v1.0")
    finally server.stop(0)
  }

  test("writeAll creates the workbook, sheets, and values; readAll round-trips (A10-A17)") {
    val mock = new MockGraph
    withServer(mock) { base =>
      val remote = new GraphRemote("d1", "lake.xlsx",
        new StaticTokenProvider("tok"), base, backoffMillis = 1L)
      assert(!remote.exists)
      val sheets = Seq(
        ("metadata", Seq(Seq("key", "value"), Seq("version", "0.1"))),
        ("data file", Seq(Seq("id", "path"), Seq("1", "/d/p.parquet"), Seq("2", ""))))
      remote.writeAll(sheets)
      assert(remote.exists)
      // the bootstrap 'Sheet1' is DELETED by the overwrite contract —
      // Graph and LocalXlsxRemote must expose the same sheet set (r8)
      assert(!remote.sheetNames.contains("Sheet1"))
      assert(remote.readAll() == sheets)
      assert(remote.sheetNames.contains("data file"))
      // sessions were opened, used on the workbook calls, and closed
      assert(mock.sessionsOpened >= 1 && mock.sessionsClosed == mock.sessionsOpened)
      assert(mock.sawSessionHeader > 0)
    }
  }

  test("writeChanged issues clear+patch only for dirty sheets (push skip)") {
    val mock = new MockGraph
    withServer(mock) { base =>
      val remote = new GraphRemote("d1", "lake.xlsx",
        new StaticTokenProvider("tok"), base, backoffMillis = 1L)
      val v1 = Seq(
        ("alpha", Seq(Seq("k", "v"), Seq("1", "a"))),
        ("beta", Seq(Seq("k", "v"), Seq("2", "b"))))
      remote.writeAll(v1)
      // change only alpha; beta must see NO clear (the mock clears on the
      // REST call, so an untouched beta proves the call never happened)
      val v2 = Seq(
        ("alpha", Seq(Seq("k", "v"), Seq("1", "A2"))),
        ("beta", Seq(Seq("k", "v"), Seq("999", "SHOULD NOT BE WRITTEN"))))
      remote.writeChanged(v2, dirty = Set("alpha"))
      assert(mock.sheets("alpha") == v2.head._2, "dirty sheet not rewritten")
      assert(mock.sheets("beta") == v1(1)._2,
        "clean sheet was cleared/patched despite not being dirty")
    }
  }

  test("429 with Retry-After and 401 token-expiry both retry (A6/A9)") {
    val mock = new MockGraph
    mock.workbookExists = true
    mock.sheets("s") = Seq(Seq("a", "b"))
    withServer(mock) { base =>
      var refreshes = 0
      val tokens = new GraphTokenProvider {
        def token(): String = "tok"
        override def refresh(): Unit = refreshes += 1
      }
      val remote = new GraphRemote("d1", "lake.xlsx", tokens, base, backoffMillis = 1L)
      mock.rate429sRemaining = 2
      assert(remote.readAll().exists(_._1 == "s")) // survives 2 throttles
      mock.reject401Once = true
      assert(remote.sheetNames.contains("s"))      // survives token expiry
      assert(refreshes == 1)
    }
  }

  test("readAll fans per-sheet reads out concurrently in one session") {
    val mock = new MockGraph
    mock.workbookExists = true
    (1 to 6).foreach(i => mock.sheets(s"s$i") = Seq(Seq("a"), Seq(i.toString)))
    mock.usedRangeDelayMs = 120L
    withServer(mock) { base =>
      val remote = new GraphRemote("d1", "lake.xlsx",
        new StaticTokenProvider("tok"), base, backoffMillis = 1L)
      val t0 = System.nanoTime()
      val back = remote.readAll()
      val elapsedMs = (System.nanoTime() - t0) / 1e6
      // ordering preserved, values intact
      assert(back.map(_._1) == (1 to 6).map(i => s"s$i"))
      assert(back.map(_._2.last.head) == (1 to 6).map(_.toString))
      // genuinely concurrent: several reads in flight at once, and total
      // wall time well under the 6 * 120ms sequential floor
      assert(mock.maxInFlightReads.get() >= 2,
        s"max in-flight reads was ${mock.maxInFlightReads.get()}")
      assert(elapsedMs < 6 * 120.0, f"readAll took $elapsedMs%.0f ms — sequential?")
      // still one session, opened and closed
      assert(mock.sessionsOpened == 1 && mock.sessionsClosed == 1)
    }
  }

  test("OAuth device-code flow: prompt, pending poll, token (A3)") {
    val dc = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    var polls = 0
    var scopeSeen = ""
    def json(ex: HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(code, b.length); ex.getResponseBody.write(b); ex.close()
    }
    def formParams(ex: HttpExchange): Map[String, String] =
      new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        .split("&").filter(_.contains("=")).map { kv =>
          val Array(k, v) = kv.split("=", 2)
          k -> java.net.URLDecoder.decode(v, StandardCharsets.UTF_8)
        }.toMap
    dc.createContext("/", (ex: HttpExchange) => ex.getRequestURI.getPath match {
      case p if p.endsWith("/devicecode") =>
        scopeSeen = formParams(ex).getOrElse("scope", "")
        json(ex, 200, """{"device_code":"dev1","user_code":"ABC123",""" +
          """"verification_uri":"https://example/verify","message":"go verify"}""")
      case p if p.endsWith("/token") =>
        polls += 1
        if (polls < 3) json(ex, 400, """{"error":"authorization_pending"}""")
        else json(ex, 200, """{"access_token":"devtok"}""")
      case _ => json(ex, 500, "{}")
    })
    dc.start()
    try {
      var prompted = ""
      val p = new DeviceCodeTokenProvider("tenant1", "client1",
        authBase = s"http://127.0.0.1:${dc.getAddress.getPort}",
        onPrompt = prompted = _, pollMillis = 5L)
      assert(p.token() == "devtok")
      assert(prompted == "go verify")
      assert(polls == 3)
      assert(p.token() == "devtok") // cached, no extra polls
      assert(polls == 3)
    } finally dc.stop(0)
  }

  test("read_shared_files widens the device-code scopes (ducklakexl.py:153-154)") {
    val dc = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val scopes = scala.collection.mutable.ArrayBuffer[String]()
    def json(ex: HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(code, b.length); ex.getResponseBody.write(b); ex.close()
    }
    dc.createContext("/", (ex: HttpExchange) => ex.getRequestURI.getPath match {
      case p if p.endsWith("/devicecode") =>
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        scopes += body.split("&").collectFirst {
          case kv if kv.startsWith("scope=") =>
            java.net.URLDecoder.decode(kv.drop(6), StandardCharsets.UTF_8)
        }.getOrElse("")
        json(ex, 200, """{"device_code":"dev1","user_code":"A","""
          + """"verification_uri":"https://example/verify","message":"m"}""")
      case p if p.endsWith("/token") =>
        json(ex, 200, """{"access_token":"tok"}""")
      case _ => json(ex, 500, "{}")
    })
    dc.start()
    try {
      val env = Map("GRAPH_CLIENT_ID" -> "client1", "GRAPH_TENANT" -> "t1",
        "GRAPH_AUTH_BASE" -> s"http://127.0.0.1:${dc.getAddress.getPort}")
      // default: own files only — the reference's base delegated scopes
      assert(GraphTokenProvider.fromEnv(env).token() == "tok")
      assert(scopes.last == "Files.ReadWrite User.Read offline_access")
      // ctor flag: Files.ReadWrite.All appended, base scopes kept
      assert(GraphTokenProvider.fromEnv(env, readSharedFiles = true)
        .token() == "tok")
      assert(scopes.last ==
        "Files.ReadWrite User.Read offline_access Files.ReadWrite.All")
      // env spelling reaches the same knob
      assert(GraphTokenProvider.fromEnv(env + ("GRAPH_READ_SHARED" -> "true"))
        .token() == "tok")
      assert(scopes.last.endsWith("Files.ReadWrite.All"))
    } finally dc.stop(0)
  }

  test("E2E: the whole lake runs over the Graph transport (A12 remote)") {
    val spark = SparkTestSession.spark
    val mock = new MockGraph
    withServer(mock) { base =>
      val dir = java.nio.file.Files.createTempDirectory("graph_lake").toString
      def lake() = new DuckLakeXLSpark(spark, "lake.xlsx", s"$dir/data",
        remoteOverride = Some(new GraphRemote("d1", "lake.xlsx",
          new StaticTokenProvider("tok"), base, backoffMillis = 1L)))
      val l = lake()
      l.sql("CREATE TABLE my_table(id INTEGER, val VARCHAR)")
      l.sql("INSERT INTO my_table VALUES (1,'alpha'),(2,'beta'),(3,'gamma'),(4,'delta')")
      l.sql("DELETE FROM my_table WHERE id = 3")
      // a SECOND instance bootstraps from the remote workbook alone (A7 pull)
      val rows = lake().sql("SELECT * FROM my_table ORDER BY id").collect()
        .map(r => (r.getInt(0), r.getString(1))).toSeq
      assert(rows == Seq((1, "alpha"), (2, "beta"), (4, "delta")))
      // the catalog sheets really live in the mock drive
      assert(mock.sheets.keySet.contains("metadata"))
      assert(mock.sheets.keySet.contains("data_file"))
    }
  }
}
