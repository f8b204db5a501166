package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Content-defined chunking (the rsync / LBFS / dedup-store boundary
  * rule): a chunk boundary falls AFTER token t whenever the rolling
  * hash of the k-gram ENDING at t satisfies `h % modulus == 0`.
  * Boundaries depend only on a k-token neighborhood of content — NOT
  * on absolute offsets — so an insertion or deletion re-chunks only
  * its own neighborhood while every chunk before and after keeps its
  * identity (the property fixed-width chunking lacks, and the reason
  * dedup stores and delta-sync protocols chunk this way). Expected
  * chunk length ≈ modulus tokens.
  *
  * Execution shape: the k-gram build and the boundary flags are
  * row-local (chained zip_with + an md5 inside a transform lambda —
  * constant work per row); chunk ids are ONE per-document window
  * cumsum over token positions; chunk reassembly is one (doc, chunk)
  * aggregate whose group size is bounded by the chunk length. Linear
  * in corpus tokens at any scale, no joins. The 16-bit split hash
  * ([[graft.queries.Helpers.hash16]] shape, inlined as portable SQL so
  * it also runs inside the higher-order lambda) is cross-engine
  * reproducible — q_cdc_chunk's DuckDB oracle draws the identical
  * boundaries.
  */
object Chunker {

  /** Tokens annotated with chunk ids: (idCol, pos, tok, chunk) — pos
    * 1-based, chunk 0-based per document. */
  def cdcTokens(df: DataFrame, idCol: String, textCol: String,
      k: Int, modulus: Int): DataFrame = {
    require(k >= 2 && k <= 8, s"kgram width $k out of range")
    require(modulus >= 2, s"modulus $modulus out of range")
    val zips = (2 to k).map { i =>
      s"slice(ws, $i, size(ws)), (x, y) -> concat(x, ' ', y)"
    }
    val gramExpr = zips.foldLeft("ws") { (acc, z) => s"zip_with($acc, $z)" }
    // flag[i] = boundary after token i+k-1 (gram STARTING at i ends
    // there); hash16 = first 4 hex chars of md5, spelled inline so it
    // runs inside the lambda
    val flagExpr =
      s"transform(filter($gramExpr, e -> e IS NOT NULL), " +
        s"g -> CAST(conv(substring(md5(CAST(g AS BINARY)), 1, 4), 16, 10) " +
        s"AS INT) % $modulus = 0)"
    val w = Window.partitionBy(idCol).orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("ws", split(col(textCol), " "))
      .withColumn("fl", expr(flagExpr))
      .select(col(idCol), posexplode(col("ws")), col("fl"))
      .toDF(idCol, "p0", "tok", "fl")
      .withColumn("pos", (col("p0") + 1).cast("long"))
      // token t is a boundary iff the gram ENDING at t flags: fl is
      // indexed by gram START (1-based) = t - k + 1. The index is
      // clamped to 1 BEFORE element_at (ANSI element_at(_, 0) throws
      // even under a false conjunct); the pos >= k guard discards the
      // clamped lookups.
      .withColumn("b",
        when(col("pos") >= k &&
          element_at(col("fl"),
            greatest(col("pos") - (k - 1), lit(1L)).cast("int")), 1L)
          .otherwise(0L))
      .withColumn("chunk", coalesce(sum("b").over(w), lit(0L)))
      .select(col(idCol), col("pos"), col("tok"), col("chunk"))
  }

  /** Reassembled chunks: (idCol, chunk, start_pos, n_tokens, text,
    * hash) — `hash` is md5 of the chunk text, the dedup-store content
    * address.
    *
    * Entirely ROW-LOCAL (r13, the q_cdc_chunk 2 s head): boundary
    * positions, chunk spans, and chunk texts are all computed inside
    * array lambdas over the one tokenized row — no per-token explode,
    * no per-doc window shuffle, no collect_list reassembly. The only
    * explode is per CHUNK (≈ tokens/modulus rows), and each chunk row
    * carries only its own text slice, so data volume stays linear in
    * corpus tokens. Boundaries are bit-identical to [[cdcTokens]] (the
    * same gram build and md5 rule), so the DuckDB oracle and the
    * ChunkerSpec locality contracts are unchanged. */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
      k: Int, modulus: Int): DataFrame = {
    require(k >= 2 && k <= 8, s"kgram width $k out of range")
    require(modulus >= 2, s"modulus $modulus out of range")
    val zips = (2 to k).map { i =>
      s"slice(ws, $i, size(ws)), (x, y) -> concat(x, ' ', y)"
    }
    val gramExpr = zips.foldLeft("ws") { (acc, z) => s"zip_with($acc, $z)" }
    val flagExpr =
      s"transform(filter($gramExpr, e -> e IS NOT NULL), " +
        s"g -> CAST(conv(substring(md5(CAST(g AS BINARY)), 1, 4), 16, 10) " +
        s"AS INT) % $modulus = 0)"
    // boundary AFTER token t (1-based) iff the gram ENDING at t flags:
    // fl is indexed by gram start = t-k+1; only defined for t >= k
    // (sequence(a, b) with a > b counts DOWN, hence the size guard)
    val boundaryPos =
      s"IF(size(ws) >= $k, " +
        s"filter(sequence($k, size(ws)), t -> " +
        s"element_at(fl, CAST(t - ${k - 1} AS INT))), " +
        "CAST(array() AS ARRAY<INT>))"
    // chunk starts: 1 plus each boundary+1; a boundary at the last
    // token must not open an empty chunk
    val startsExpr =
      s"filter(concat(array(1), transform($boundaryPos, p -> p + 1)), " +
        "s -> s <= size(ws))"
    // spans: chunk j runs from starts[j] to starts[j+1]-1 (or doc end);
    // try_element_at returns null past the end (ANSI element_at throws)
    val chunksExpr =
      "transform(sequence(1, size(st)), j -> named_struct(" +
        "'start', element_at(st, j), " +
        "'n', coalesce(try_element_at(st, CAST(j + 1 AS INT)), " +
        "size(ws) + 1) - element_at(st, j), " +
        "'txt', concat_ws(' ', slice(ws, element_at(st, j), " +
        "coalesce(try_element_at(st, CAST(j + 1 AS INT)), size(ws) + 1) " +
        "- element_at(st, j)))))"
    // ws/fl/st are LET-BOUND via single-element-array lambdas: chained
    // withColumn projections would collapse and re-inline the md5 flag
    // build into every downstream reference — interpreted higher-order
    // lambdas get no common-subexpression elimination, and the first
    // cut of this rewrite re-hashed the whole gram stream once per
    // chunk-span lookup (24 s instead of 0.5 at sf0.1). Each binding
    // evaluates its expression exactly once per row; the triple
    // flatten unwraps the three singleton-array nests.
    val boundExpr =
      s"flatten(flatten(flatten(transform(array(split(`$textCol`, ' ')), ws -> " +
        s"transform(array($flagExpr), fl -> " +
        s"transform(array($startsExpr), st -> $chunksExpr))))))"
    df.select(col(idCol), posexplode(expr(boundExpr)))
      .toDF(idCol, "chunk0", "ck")
      .select(col(idCol), col("chunk0").cast("long").as("chunk"),
        col("ck.start").cast("long").as("start_pos"),
        col("ck.n").cast("long").as("n_tokens"),
        col("ck.txt").as("text"))
      .withColumn("hash", md5(col("text").cast("binary")))
  }
}
