package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared EXACT pairwise-Jaccard machinery via prefix filtering
  * (AllPairs / PPJoin family, Bayardo et al. WWW'07; Xiao et al.
  * ICDE'08 — public literature).
  *
  * Input: (doc_id, tok) with distinct tokens per doc. Tokens get a
  * canonical global order (corpus frequency asc, then token — rarest
  * first maximizes pruning); each doc indexes only its first
  * p = |x| − ⌈t·|x|⌉ + 1 tokens. Theorem: J(a,b) ≥ t implies the two
  * prefixes share a token, so the prefix-token equi-join generates a
  * candidate superset — EXACTNESS is preserved while the inverted index
  * shrinks from every token to ~(1−t)·|x| per doc (5× at t = 0.8).
  * Candidates are verified with the two-pointer SortedIntersectCount
  * over sorted token arrays attached by key only to candidate pairs.
  *
  * The ⌈⌉ uses `ceil(x − 1e-9)`: double rounding can push t·|x| a ulp
  * ABOVE an exact integer product (0.8·5 → 4.0000000000000004), which
  * would shorten the prefix and silently drop boundary pairs; the
  * epsilon errs toward a LONGER prefix (more candidates, never fewer).
  *
  * Cost is O(pairs-sharing-a-PREFIX-token); on corpora where even
  * prefixes collide massively (this fixture's 31-word vocab), the
  * probabilistic scale path is `dedup_minhash_lsh`.
  */
object Jaccard {

  /** (doc_i, doc_j, jac) for all pairs with Jaccard ≥ `th`, doc_i < doc_j. */
  def pairs(toks: DataFrame, th: Double): DataFrame = {
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("ft"))
    val wDoc = Window.partitionBy("doc_id")
    val ranked = toks.join(freq, Seq("tok"))
      .withColumn("sz", count(lit(1)).over(wDoc))
      .withColumn("rk", row_number().over(
        wDoc.orderBy(col("ft"), col("tok"))))
    val pref = ranked
      .filter(col("rk") <=
        col("sz") - ceil(lit(th) * col("sz") - lit(1e-9)) + 1)
      .select(col("tok"), col("doc_id"))
    val cand = pref.select(col("tok"), col("doc_id").as("i"))
      .join(pref.select(col("tok"), col("doc_id").as("j")), Seq("tok"))
      .filter(col("i") < col("j"))
      .select("i", "j").distinct()
    // array_sort (nulls LAST), not sort_array (nulls FIRST): the
    // two-pointer SortedIntersectCount contract assumes array_sort
    // ordering and stops at the first null — a leading null would
    // silently truncate the intersection count to 0. Verification
    // itself is the shared SimilarityJoin.verify tail (one
    // implementation for the exact and LSH surfaces).
    val arrs = toks.groupBy("doc_id")
      .agg(array_sort(collect_list(col("tok"))).as("toks"))
    SimilarityJoin.verify(cand, arrs, th)
  }
}
