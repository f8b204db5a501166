package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Helpers

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
  * 2003 — the MOSS algorithm): hash every k-word kgram, slide a
  * w-kgram window, and select each window's MINIMUM hash breaking ties
  * RIGHTMOST. The selection is LOCAL — whether a position is chosen
  * depends only on its w-neighborhood — which yields the guarantee
  * plain document-minhash cannot give: any substring match of at least
  * w + k − 1 words between two documents produces at least one SHARED
  * selected fingerprint.
  *
  * Execution shape: kgram construction is row-local (chained zip_with,
  * the q_bigram idiom — constant references to the word array per row,
  * never per element); selection is ONE window pass partitioned by
  * document and ordered by position. The min-then-rightmost rule runs
  * as a single BIGINT `min` over the encoding
  * `h·2^32 + (2^31 − pos)`: smaller hash wins, and among equal hashes
  * the larger position gives the smaller encoded key. No shuffle
  * beyond the per-document window; cost is linear in corpus tokens at
  * any scale. The 16-bit split hash ([[Helpers.hash16]], an md5
  * prefix) is cross-engine reproducible so q_winnow's DuckDB oracle
  * runs the literally identical selection.
  */
object Winnow {

  private val Enc = 4294967296L // 2^32
  private val PosBase = 2147483648L // 2^31

  /** Positions are 1-based kgram starts; `m` = the doc's kgram count. */
  def kgrams(df: DataFrame, idCol: String, textCol: String,
             k: Int): DataFrame = {
    require(k >= 2 && k <= 8, s"kgram width $k out of range")
    val zips = (2 to k).map { i =>
      s"slice(ws, $i, size(ws)), (x, y) -> concat(x, ' ', y)"
    }
    val gramExpr = zips.foldLeft("ws") { (acc, z) => s"zip_with($acc, $z)" }
    df.withColumn("ws", split(col(textCol), " "))
      .withColumn("g", expr(s"filter($gramExpr, e -> e IS NOT NULL)"))
      .select(col(idCol), posexplode(col("g")))
      .toDF(idCol, "p0", "gram")
      .withColumn("pos", (col("p0") + 1).cast("long"))
      .drop("p0")
  }

  /** Selected fingerprints: one row per DISTINCT selected position —
    * (idCol, pos, h, m) where `h` is the selected kgram's 16-bit hash
    * and `m` the doc's total kgram count. Documents shorter than k
    * words yield no rows; documents with fewer than w kgrams form a
    * single (short) window and still contribute one fingerprint. */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
                   k: Int, w: Int): DataFrame = {
    require(w >= 2, s"window width $w out of range")
    val g = kgrams(df, idCol, textCol, k)
      .withColumn("h", Helpers.hash16(col("gram")).cast("long"))
      .withColumn("key", col("h") * Enc + (lit(PosBase) - col("pos")))
    val win = Window.partitionBy(idCol).orderBy("pos")
      .rowsBetween(Window.currentRow, w - 1)
    g.withColumn("mk", min("key").over(win))
      .withColumn("m", count(lit(1)).over(Window.partitionBy(idCol)))
      .filter(col("pos") <= greatest(col("m") - (w - 1), lit(1L)))
      .select(col(idCol), (lit(PosBase) - pmod(col("mk"), lit(Enc))).as("pos"),
        shiftright(col("mk"), 32).as("h"), col("m"))
      .distinct()
  }

  /** [[fingerprints]] joined back to their kgram CONTENT: (idCol, pos,
    * g, m) where `g` is md5 of the selected kgram — the full-width
    * identity MOSS matches on (the 16-bit `h` only drives selection;
    * matching on it would collide constantly at corpus scale). One
    * (id, pos)-keyed join against the same kgram stream. */
  def fingerprintGrams(df: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int): DataFrame =
    attachGrams(fingerprints(df, idCol, textCol, k, w), df, idCol,
      textCol, k)

  /** [[fingerprintGrams]] over a PRECOMPUTED (possibly cached)
    * [[fingerprints]] table — lets callers share one selection pass
    * across several consumers. */
  def attachGrams(fp: DataFrame, df: DataFrame, idCol: String,
      textCol: String, k: Int): DataFrame = {
    val g = kgrams(df, idCol, textCol, k)
      .select(col(idCol), col("pos"),
        md5(col("gram").cast("binary")).as("g"))
    fp.drop("h").join(g, Seq(idCol, "pos"))
  }
}
