package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text-pipeline expressions (tokenization, shingling,
  * fingerprinting) used by the north-star dedup / text-analysis queries.
  * All pure Catalyst built-ins — codegen'd, no UDFs — so they stay inside
  * whole-stage codegen and scale linearly with input at 100 TB.
  *
  * Mirrors the row-wise text-analysis stage of the reference
  * (processor.py:63-121) re-expressed as columnar expressions.
  */
object Text {

  /** Documents.text is space-separated lowercase tokens; a general corpus
    * would lower+strip punctuation first (see `normalize`). */
  def tokens(c: Column): Column = split(c, " ")

  /** Distinct token set (order-insensitive dedup unit). */
  def tokenSet(c: Column): Column = array_distinct(tokens(c))

  /** Distinct word n-gram shingles of one document, as a plain-Scala
    * iterator for typed `flatMap` shingling. Spark's higher-order
    * `transform`/`sequence` route evaluates interpreted (no codegen) at
    * ~1.5 ms/doc; a JVM sliding loop is ~20x faster and is the one place
    * the per-partition-imperative escape hatch is warranted.
    *
    * split limit -1 keeps trailing empty tokens — Java's default split
    * DROPS them while Spark's split() and DuckDB's string_split KEEP
    * them, and the oracle CTEs shingle over the kept form; text with
    * trailing whitespace would otherwise diverge. */
  def shingleSet(text: String, n: Int): Iterator[String] = {
    val toks = text.split(" ", -1)
    if (toks.length < n) Iterator.empty
    else {
      val seen = new scala.collection.mutable.LinkedHashSet[String]
      toks.sliding(n).foreach(w => seen.add(w.mkString(" ")))
      seen.iterator
    }
  }

  /** Exact n-gram Jaccard between two documents (plain Scala, for the
    * pair-verification stages that run AFTER candidate generation —
    * row-local on already-bucketed pairs, never all-pairs). Two
    * shingle-less documents count as identical. */
  def jaccard(a: String, b: String, n: Int): Double = {
    val sa = shingleSet(a, n).toSet
    val sb = shingleSet(b, n).toSet
    if (sa.isEmpty && sb.isEmpty) 1.0
    else {
      val inter = (sa & sb).size
      inter.toDouble / (sa.size + sb.size - inter)
    }
  }

  /** Normalized text: lowercase, punctuation -> space, collapsed
    * whitespace. Identical in DuckDB:
    * trim(regexp_replace(lower(x), '[^a-z0-9]+', ' ', 'g')). */
  def normalize(c: Column): Column =
    trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))

  /** Deterministic cross-engine document fingerprint (md5 of normalized
    * text): md5 hex is identical in Spark and DuckDB, unlike xxhash64 /
    * murmur which are engine-specific. */
  def fingerprint(c: Column): Column = md5(normalize(c).cast("binary"))
}
