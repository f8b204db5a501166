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
    timeoutMs: Long = 30000,
    articlesPerRequest: Int = 1) extends TextAnalyzer {
  require(maxConcurrent >= 1, "maxConcurrent must be >= 1")
  require(articlesPerRequest >= 1, "articlesPerRequest must be >= 1")

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

  /** Up to `maxConcurrent` requests in flight, each carrying
    * `articlesPerRequest` articles (multi-article mode amortizes the
    * request/prompt overhead 10-50x in real gateways). A failed request
    * turns ONLY its own articles into None. */
  override def analyzeBatch(rows: Iterator[(String, String, String)])
      : Iterator[(String, Option[Analysis])] =
    rows.grouped(articlesPerRequest * maxConcurrent).flatMap { wave =>
      val inFlight = wave.grouped(articlesPerRequest).toSeq.map { chunk =>
        // empty-title rows are skipped client-side (processor.py:110-111);
        // response indexes refer to positions in the SENT subset
        val sendable = chunk.zipWithIndex.filter { case ((_, t, _), _) =>
          t != null && t.nonEmpty }
        val fut: CompletableFuture[Map[Int, Analysis]] =
          if (sendable.isEmpty)
            CompletableFuture.completedFuture(Map.empty[Int, Analysis])
          else client.sendAsync(
              request(sendable.map { case ((_, t, dd), _) => (t, dd) }),
              HttpResponse.BodyHandlers.ofString())
            .thenApply[Map[Int, Analysis]](r =>
              if (r.statusCode() != 200) Map.empty
              else parseResponse(r.body(), sendable.size))
        (chunk, sendable.map(_._2), fut)
      }
      inFlight.iterator.flatMap { case (chunk, sentPos, fut) =>
        val byPos: Map[Int, Analysis] =
          try fut.get(timeoutMs, TimeUnit.MILLISECONDS)
          catch {
            case _: InterruptedException =>
              // Spark kills tasks by interrupt; restore the flag so the
              // task actually dies instead of grinding through the
              // remaining waves (subsequent get()s fail fast)
              Thread.currentThread().interrupt()
              Map.empty
            case _: Exception => Map.empty
          }
        val posToSendIdx = sentPos.zipWithIndex.toMap // chunk pos -> wire idx
        chunk.zipWithIndex.map { case ((id, _, _), pos) =>
          (id, posToSendIdx.get(pos).flatMap(byPos.get))
        }
      }
    }

  /** One article -> the reference's `record_analysis` single-tool call;
    * several -> `record_analyses` with an indexed results array. */
  private def request(articles: Seq[(String, String)]): HttpRequest = {
    val multi = articles.size > 1
    val toolName = if (multi) "record_analyses" else "record_analysis"
    val root = mapper.createObjectNode()
    root.put("model", model)
    val messages = root.putArray("messages")
    val user = messages.addObject()
    user.put("role", "user")
    user.put("content",
      if (!multi) {
        val (t, dd) = articles.head
        s"Extract actors and category.\nTitle: $t\nDescription: $dd"
      } else articles.zipWithIndex.map { case ((t, dd), i) =>
        s"Article $i:\nTitle: $t\nDescription: $dd"
      }.mkString("Extract actors and category for each article.\n\n", "\n\n", ""))
    val tool = root.putArray("tools").addObject()
    tool.put("type", "function")
    val fn = tool.putObject("function")
    fn.put("name", toolName)
    fn.set[JsonNode]("parameters",
      if (multi) {
        val s = mapper.createObjectNode()
        s.put("type", "object")
        val arr = s.putObject("properties").putObject("results")
        arr.put("type", "array")
        val item = arr.putObject("items")
        item.setAll[com.fasterxml.jackson.databind.node.ObjectNode](
          analysisSchema.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode])
        item.path("properties").asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          .putObject("index").put("type", "integer")
        s
      } else analysisSchema)
    val choice = root.putObject("tool_choice")
    choice.put("type", "function")
    choice.putObject("function").put("name", toolName)
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

  /** choices[0].message.tool_calls[0].function.arguments -> indexed
    * analyses; any structural surprise -> missing entries. Accepts the
    * flat single-article shape (mapped to index 0) and the
    * `{"results":[{index, ...}]}` multi shape. */
  private def parseResponse(body: String, nSent: Int): Map[Int, Analysis] =
    try {
      val args = mapper.readTree(body)
        .path("choices").path(0).path("message")
        .path("tool_calls").path(0).path("function").path("arguments")
      if (args.isMissingNode) return Map.empty
      // arguments arrive as a JSON-encoded string (OpenAI convention) or
      // as an inline object — accept both
      val node = if (args.isTextual) mapper.readTree(args.asText()) else args
      def one(n: JsonNode): Option[Analysis] = {
        def actors(field: String): Seq[Actor] =
          n.path(field).elements().asScala.map(a =>
            Actor(a.path("name").asText(""), a.path("role").asText("unknown")))
            .filter(_.name.nonEmpty).toSeq
        val main = actors("main_actors")
        if (main.isEmpty) None // schema contract: >=1 main actor
        else {
          val cat = n.path("category").asText("Others")
          Some(Analysis(main, actors("other_actors"),
            if (allowedCategories(cat)) cat else "Others"))
        }
      }
      if (node.has("results"))
        node.path("results").elements().asScala.flatMap { r =>
          val idx = r.path("index").asInt(-1)
          if (idx < 0 || idx >= nSent) None else one(r).map(idx -> _)
        }.toMap
      else one(node).map(0 -> _).toMap
    } catch { case _: Exception => Map.empty }
}
