package graft.engine

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration
import java.util.concurrent.{CompletableFuture, TimeUnit}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.engine.Analyze.{Actor, Analysis, TextAnalyzer}

/** LLM-backed [[Analyze.TextAnalyzer]]: the network implementation of the
  * reference's per-article extraction call (processor.py:63-121 builds an
  * OpenAI chat-completion with a forced function call and parses the
  * returned JSON arguments).
  *
  * Wire shape is OpenAI-compatible chat completions with one tool,
  * `record_analysis`, whose arguments are the [[Analysis]] schema; the
  * endpoint and key are injected (nothing is read from the global
  * environment on executors), so tests point it at a local fake and a
  * production deployment points it at a real gateway.
  *
  * Concurrency: the reference loops sequentially over rows — its
  * acknowledged bottleneck (README.md:112). Here [[analyzeBatch]] fires up
  * to `maxConcurrent` async requests per partition via
  * `HttpClient.sendAsync` and collects them in input order, so a
  * 1000-partition cluster run gets partitions x maxConcurrent requests in
  * flight. Failures (HTTP != 200, timeout, malformed body, empty title)
  * become None — the row-skip contract (U2) — never exceptions: one bad
  * article must not kill a 100 TB stage.
  *
  * The category enum is constrained to the reference's 5 values
  * (processor.py:31-35); anything else maps to "Others" (U4).
  */
final class HttpAnalyzer(
    endpoint: String,
    apiKey: String,
    model: String = "extraction-model",
    maxConcurrent: Int = 8,
    timeoutMs: Long = 30000) extends TextAnalyzer {
  require(maxConcurrent >= 1, "maxConcurrent must be >= 1")

  // per-executor lazies: HttpClient/ObjectMapper are not serializable
  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(timeoutMs))
      .build()
  @transient private lazy val mapper = new ObjectMapper()

  private val allowedCategories = Set(
    "Political Turmoil", "New Product Announced", "Leadership Change",
    "Housing Issues", "Others")

  override def analyze(title: String, description: String): Option[Analysis] =
    analyzeBatch(Iterator(("", title, description))).next()._2

  override def analyzeBatch(rows: Iterator[(String, String, String)])
      : Iterator[(String, Option[Analysis])] =
    rows.grouped(maxConcurrent).flatMap { group =>
      val inFlight = group.map { case (id, title, desc) =>
        if (title == null || title.isEmpty)
          (id, CompletableFuture.completedFuture(
            Option.empty[Analysis])) // processor.py:110-111 row skip
        else
          (id, client.sendAsync(request(title, desc),
              HttpResponse.BodyHandlers.ofString())
            .thenApply[Option[Analysis]](r =>
              if (r.statusCode() == 200) parseResponse(r.body()) else None))
      }
      inFlight.map { case (id, fut) =>
        (id, try fut.get(timeoutMs, TimeUnit.MILLISECONDS)
        catch { case _: Exception => None })
      }
    }

  private def request(title: String, desc: String): HttpRequest = {
    val root = mapper.createObjectNode()
    root.put("model", model)
    val messages = root.putArray("messages")
    val user = messages.addObject()
    user.put("role", "user")
    user.put("content",
      s"Extract actors and category.\nTitle: $title\nDescription: $desc")
    val tool = root.putArray("tools").addObject()
    tool.put("type", "function")
    val fn = tool.putObject("function")
    fn.put("name", "record_analysis")
    fn.set[JsonNode]("parameters", analysisSchema)
    val choice = root.putObject("tool_choice")
    choice.put("type", "function")
    choice.putObject("function").put("name", "record_analysis")
    HttpRequest.newBuilder(URI.create(endpoint))
      .timeout(Duration.ofMillis(timeoutMs))
      .header("Content-Type", "application/json")
      .header("Authorization", s"Bearer $apiKey")
      .POST(HttpRequest.BodyPublishers.ofString(
        mapper.writeValueAsString(root), StandardCharsets.UTF_8))
      .build()
  }

  /** JSON Schema for the tool arguments — the Pydantic model's shape
    * (processor.py:38-55). */
  private def analysisSchema: JsonNode = {
    val schema = mapper.createObjectNode()
    schema.put("type", "object")
    val props = schema.putObject("properties")
    Seq("main_actors", "other_actors").foreach { f =>
      val arr = props.putObject(f)
      arr.put("type", "array")
      val item = arr.putObject("items")
      item.put("type", "object")
      val ip = item.putObject("properties")
      ip.putObject("name").put("type", "string")
      ip.putObject("role").put("type", "string")
    }
    props.putObject("category").put("type", "string")
    schema
  }

  /** choices[0].message.tool_calls[0].function.arguments -> Analysis;
    * any structural surprise -> None. */
  private def parseResponse(body: String): Option[Analysis] =
    try {
      val args = mapper.readTree(body)
        .path("choices").path(0).path("message")
        .path("tool_calls").path(0).path("function").path("arguments")
      if (args.isMissingNode) return None
      // arguments arrive as a JSON-encoded string (OpenAI convention) or
      // as an inline object — accept both
      val node = if (args.isTextual) mapper.readTree(args.asText()) else args
      def actors(field: String): Seq[Actor] =
        node.path(field).elements().asScala.map(a =>
          Actor(a.path("name").asText(""), a.path("role").asText("unknown")))
          .filter(_.name.nonEmpty).toSeq
      val main = actors("main_actors")
      if (main.isEmpty) return None // schema contract: >=1 main actor
      val cat = node.path("category").asText("Others")
      Some(Analysis(main, actors("other_actors"),
        if (allowedCategories(cat)) cat else "Others"))
    } catch { case _: Exception => None }
}
