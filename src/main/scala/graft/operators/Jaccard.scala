package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Det.r4d

/** Shared exact pairwise-Jaccard machinery over an inverted index.
  *
  * Input: (doc_id, tok) with distinct tokens per doc. Self-join on token
  * yields per-pair intersection counts; |A∪B| = |A|+|B|−|A∩B|. Cost is
  * O(pairs-sharing-a-token) — right for selective token domains (shingles)
  * or bounded inputs. The unbounded-corpus path is `dedup_minhash_lsh`,
  * which restricts exact verification to its LSH candidate pairs (own
  * `array_intersect`-based implementation over broadcast token arrays).
  */
object Jaccard {

  /** (doc_i, doc_j, jac) for all pairs with Jaccard ≥ `th`, doc_i < doc_j. */
  def pairs(toks: DataFrame, th: Double): DataFrame = {
    val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = toks.select(col("doc_id").as("i"), col("tok"))
      .join(toks.select(col("doc_id").as("j"), col("tok")), Seq("tok"))
      .filter(col("i") < col("j"))
      .groupBy("i", "j").agg(count(lit(1)).as("c"))
    inter
      .join(sizes.select(col("doc_id").as("i"), col("sz").as("sa")), Seq("i"))
      .join(sizes.select(col("doc_id").as("j"), col("sz").as("sb")), Seq("j"))
      .withColumn("jac", col("c").cast("double") / (col("sa") + col("sb") - col("c")))
      .filter(col("jac") >= th)
      .select(col("i").as("doc_i"), col("j").as("doc_j"), r4d(col("jac")).as("jac"))
  }
}
