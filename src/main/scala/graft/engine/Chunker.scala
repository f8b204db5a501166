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
    * address. */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
      k: Int, modulus: Int): DataFrame =
    cdcTokens(df, idCol, textCol, k, modulus)
      .groupBy(col(idCol), col("chunk"))
      .agg(min("pos").as("start_pos"), count(lit(1)).as("n_tokens"),
        concat_ws(" ", transform(array_sort(
          collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok"))).as("text"))
      .withColumn("hash", md5(col("text").cast("binary")))
}
