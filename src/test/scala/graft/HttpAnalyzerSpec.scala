package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analyze, HttpAnalyzer}

/** Drives [[HttpAnalyzer]] against a local OpenAI-shaped fake server:
  * asserts the wire contract (auth header, tool_choice), the Analysis
  * parse, the None-on-failure row-skip, enum constraint, and that the
  * mapPartitions path works end-to-end through Analyze.withAnalysis. */
class HttpAnalyzerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Fake chat-completions endpoint: deterministic extraction — the
    * first capitalized word of the title becomes the main actor; a title
    * containing "FAIL500" returns HTTP 500; "BADJSON" returns garbage. */
  private def withFakeServer(f: (String, AtomicInteger, AtomicInteger) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val calls = new AtomicInteger(0)
    val badAuth = new AtomicInteger(0)
    server.createContext("/v1/chat/completions", (x: HttpExchange) => {
      calls.incrementAndGet()
      val body = new String(x.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      if (x.getRequestHeaders.getFirst("Authorization") != "Bearer test-key")
        badAuth.incrementAndGet()
      if (body.contains("FAIL500")) respond(x, 500, "{}")
      else if (body.contains("BADJSON")) respond(x, 200, "not json at all {{{")
      else if (body.contains("record_analyses")) {
        // multi-article mode: one indexed result per "Article i:" block
        val results = """Article (\d+):\\nTitle: ([^\\"]*)""".r
          .findAllMatchIn(body).map { m =>
            val idx = m.group(1)
            val actor = m.group(2).split(" ")
              .find(_.headOption.exists(_.isUpper)).getOrElse("Nobody")
            s"""{\\"index\\":$idx,\\"main_actors\\":[{\\"name\\":\\"$actor\\",\\"role\\":\\"politician\\"}],\\"other_actors\\":[],\\"category\\":\\"Others\\"}"""
          }.mkString(",")
        respond(x, 200,
          s"""{"choices":[{"message":{"tool_calls":[{"function":{"name":"record_analyses","arguments":"{\\"results\\":[$results]}"}}]}}]}""")
      }
      else {
        // pull the title back out of the prompt text
        val title = """Title: ([^\\\n"]*)""".r.findFirstMatchIn(body)
          .map(_.group(1)).getOrElse("")
        val actor = title.split(" ").find(_.headOption.exists(_.isUpper))
          .getOrElse("Nobody")
        val cat =
          if (title.toLowerCase.contains("resign")) "Leadership Change"
          else if (title.contains("WEIRDCAT")) "Not An Allowed Category"
          else "Others"
        val args =
          s"""{\\"main_actors\\":[{\\"name\\":\\"$actor\\",\\"role\\":\\"politician\\"}],\\"other_actors\\":[],\\"category\\":\\"$cat\\"}"""
        respond(x, 200,
          s"""{"choices":[{"message":{"tool_calls":[{"function":{"name":"record_analysis","arguments":"$args"}}]}}]}""")
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/v1/chat/completions",
      calls, badAuth)
    finally server.stop(0)
  }

  private def respond(x: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    x.sendResponseHeaders(code, bytes.length)
    x.getResponseBody.write(bytes)
    x.close()
  }

  test("extracts analysis over HTTP; auth header sent; enum constrained") {
    withFakeServer { (url, calls, badAuth) =>
      val a = new HttpAnalyzer(url, "test-key")
      val ok = a.analyze("Mayor Quimby resigns", "d")
      assert(ok.exists(_.main_actors.map(_.name) == Seq("Mayor")))
      assert(ok.exists(_.category == "Leadership Change"))
      // category outside the 5-value enum normalizes to Others (U4)
      assert(a.analyze("WEIRDCAT Event", "d").exists(_.category == "Others"))
      assert(calls.get() >= 2)
      assert(badAuth.get() == 0)
    }
  }

  test("failures become None (row skip), never exceptions") {
    withFakeServer { (url, _, _) =>
      val a = new HttpAnalyzer(url, "test-key")
      assert(a.analyze("FAIL500 story", "d").isEmpty)     // HTTP 500
      assert(a.analyze("BADJSON story", "d").isEmpty)     // unparseable
      assert(a.analyze("", "d").isEmpty)                  // empty title
      assert(a.analyze(null, "d").isEmpty)                // null title
      // unreachable endpoint: connection refused -> None, not a throw
      val dead = new HttpAnalyzer("http://127.0.0.1:1/x", "k", timeoutMs = 1500)
      assert(dead.analyze("Some Title", "d").isEmpty)
    }
  }

  test("multi-article mode: one request carries several articles, indexed back") {
    withFakeServer { (url, calls, _) =>
      val a = new HttpAnalyzer(url, "test-key", articlesPerRequest = 3)
      val before = calls.get()
      val got = a.analyzeBatch(Iterator(
        ("r1", "Mayor Quimby speaks", "d"),
        ("r2", "", "d"),                      // skipped client-side
        ("r3", "President Alice votes", "d"))).toSeq
      assert(calls.get() - before == 1, "3 articles must travel in ONE request")
      val byId = got.toMap
      assert(byId("r1").exists(_.main_actors.head.name == "Mayor"))
      assert(byId("r2").isEmpty) // empty title never sent, still answered
      assert(byId("r3").exists(_.main_actors.head.name == "President"))
    }
  }

  test("batched concurrent requests through the Spark mapPartitions path") {
    withFakeServer { (url, calls, _) =>
      import spark.implicits._
      val news = Seq(
        ("n1", "Mayor Quimby resigns", "d1"),
        ("n2", "FAIL500 here", "d2"),
        ("n3", "President Alice unveils product", "d3"))
        .toDF("id", "title", "description")
      val out = Analyze.withAnalysis(spark, news,
        new HttpAnalyzer(url, "test-key", maxConcurrent = 4))
      val rows = out.select("id", "analysis.category").collect()
        .map(r => r.getString(0) -> Option(r.getString(1))).toMap
      assert(rows("n1").contains("Leadership Change"))
      assert(rows("n2").isEmpty) // failed row -> null analysis
      assert(rows("n3").contains("Others"))
      // downstream flatten skips the failed row (U2)
      val actors = Analyze.explodeActors(out)
      assert(actors.select("news_id").as[String].collect().toSet == Set("n1", "n3"))
      // each Spark action re-evaluates the uncached plan: calls arrive in
      // whole-partition batches, a multiple of the 3 input rows
      assert(calls.get() >= 3 && calls.get() % 3 == 0)
    }
  }
}
