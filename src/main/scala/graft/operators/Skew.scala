package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation for the cases AQE doesn't cover.
  *
  * AQE's runtime skew-join splitting handles sort-merge joins; it does
  * NOT help when a single hot key floods one reducer of a shuffled
  * hash join or a stateful aggregation buffer. Salting fixes that by
  * widening the hot key into `buckets` sub-keys: the fact side gets a
  * DETERMINISTIC salt (hash of a caller-chosen per-row column — never a
  * random number, which would break retry/replay determinism), the
  * other side is replicated once per salt value, and the join key
  * becomes (key, salt). Shuffle parallelism for the hot key rises from
  * 1 task to `buckets` tasks at the cost of replicating the (smaller)
  * right side `buckets`×.
  */
object Skew {

  /** Inner equi-join on `key` with the left (large, possibly skewed)
    * side salted by `hash(saltBy) % buckets` and the right side
    * replicated per salt. Result is row-identical to
    * `left.join(right, key)` (proven in SkewSpec); `saltBy` should be a
    * high-cardinality column (a row id) so salts spread evenly.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltBy: Column, buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    // withColumn REPLACES an existing column of the same name — that
    // would silently clobber caller data, so refuse loudly instead.
    require(!left.columns.contains("__graft_salt")
      && !right.columns.contains("__graft_salt"),
      "saltedJoin: inputs must not already contain a __graft_salt column")
    val l = left.withColumn("__graft_salt", pmod(hash(saltBy), lit(buckets)))
    val r = right.withColumn("__graft_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    l.join(r, Seq(key, "__graft_salt")).drop("__graft_salt")
  }
}
