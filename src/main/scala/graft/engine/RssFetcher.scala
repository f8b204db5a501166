package graft.engine

import java.io.InputStream
import java.net.URI
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.UUID

import javax.xml.XMLConstants
import javax.xml.parsers.DocumentBuilderFactory

import com.fasterxml.jackson.databind.ObjectMapper
import org.w3c.dom.Element

/** RSS fetch utility — the network edge of the ingest story
  * (collector.py:86's feedparser.parse(url)). Fetches each feed URL,
  * parses the RSS items, and drops ONE atomic JSON-lines snapshot file
  * into the ingest directory, where [[Ingest.readFeedSnapshots]] (batch)
  * and the streaming file source pick it up with the declared schema.
  *
  * Deliberately driver-side and tiny: feed lists are a handful of URLs —
  * the cluster-scale work starts AFTER the snapshot lands. Supports
  * http(s):// and file:// URLs (the latter makes the unit test hermetic;
  * zero-egress environments exercise the full path minus the socket).
  *
  * Failure isolation: one dead feed must not lose the others' entries —
  * per-feed failures are collected, not thrown, and the snapshot is
  * written with whatever succeeded (feedparser's bozo-tolerant behavior).
  */
object RssFetcher {

  /** One feed to pull: its URL plus the category name ingest attaches
    * (collector.py:110's per-feed literal). */
  final case class FeedSpec(url: String, name: String)

  final case class FetchResult(entriesWritten: Int, snapshotPath: Option[String],
      failures: Map[String, String])

  /** Fetch all feeds and write one snapshot file (JSON lines matching
    * [[Schemas.feedEntry]]) into `ingestDir`. The file appears atomically
    * (tmp + rename) so a concurrently running streaming query never reads
    * a half-written snapshot. */
  def fetchOnce(feeds: Seq[FeedSpec], ingestDir: String): FetchResult = {
    val mapper = new ObjectMapper()
    val failures = Map.newBuilder[String, String]
    val lines = feeds.flatMap { feed =>
      try {
        val in = openStream(feed.url)
        try parseFeed(in, feed.name).map { e =>
          val o = mapper.createObjectNode()
          o.put("title", e.title)
          o.put("published", e.published)
          o.put("description", e.description)
          o.put("link", e.link)
          o.put("guid", e.guid)
          e.thumbnail match {
            case Some(t) => o.put("media_thumbnail", t)
            case None => o.putNull("media_thumbnail")
          }
          o.put("feed", feed.name)
          mapper.writeValueAsString(o)
        }
        finally in.close()
      } catch {
        case e: Exception =>
          failures += feed.url -> s"${e.getClass.getSimpleName}: ${e.getMessage}"
          Seq.empty
      }
    }
    if (lines.isEmpty) return FetchResult(0, None, failures.result())
    Files.createDirectories(Paths.get(ingestDir))
    val tmp = Paths.get(ingestDir, s".fetch-${UUID.randomUUID()}.tmp")
    Files.write(tmp, lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    val dest = Paths.get(ingestDir, s"snapshot-${UUID.randomUUID()}.json")
    Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE)
    FetchResult(lines.size, Some(dest.toString), failures.result())
  }

  /** Bounded connect/read timeouts: JDK default is INFINITE, and a feed
    * that accepts the socket but never responds would otherwise hang the
    * whole fetch loop — breaking the per-feed isolation contract. */
  private def openStream(url: String, timeoutMs: Int = 15000): InputStream = {
    val conn = URI.create(url).toURL.openConnection()
    conn.setConnectTimeout(timeoutMs)
    conn.setReadTimeout(timeoutMs)
    conn.getInputStream
  }

  private[engine] final case class Entry(title: String, published: String,
      description: String, link: String, guid: String, thumbnail: Option[String])

  /** Parse RSS 2.0 items from a stream. Namespace-aware so
    * media:thumbnail/@url resolves; external entities disabled (XXE). */
  private[engine] def parseFeed(in: InputStream, feedName: String): Seq[Entry] = {
    val dbf = DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(true)
    dbf.setFeature(XMLConstants.FEATURE_SECURE_PROCESSING, true)
    dbf.setFeature("http://xml.org/sax/features/external-general-entities", false)
    dbf.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
    val doc = dbf.newDocumentBuilder().parse(in)
    val items = doc.getElementsByTagName("item")
    (0 until items.getLength).flatMap { i =>
      val item = items.item(i).asInstanceOf[Element]
      def text(tag: String): Option[String] = {
        val ns = item.getElementsByTagName(tag)
        if (ns.getLength == 0) None
        else Option(ns.item(0).getTextContent).map(_.trim).filter(_.nonEmpty)
      }
      val thumb = {
        val ns = item.getElementsByTagNameNS("*", "thumbnail")
        if (ns.getLength == 0) None
        else Option(ns.item(0).asInstanceOf[Element].getAttribute("url"))
          .filter(_.nonEmpty)
      }
      // guid falls back to link (common in real feeds); entries with no
      // usable id or title are skipped — they could never dedup anyway
      for {
        title <- text("title")
        guid <- text("guid").orElse(text("link"))
        published <- text("pubDate")
      } yield Entry(title, published,
        text("description").getOrElse(""), text("link").getOrElse(""),
        guid, thumb)
    }
  }
}
