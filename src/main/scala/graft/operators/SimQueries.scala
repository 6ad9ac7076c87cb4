package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.Det.r4d
import graft.functions.ArrayDot

/** §2.9 Similarity search over `embeddings` (SURVEY.md).
  *
  * Brute-force cosine against a bounded probe set: probes are broadcast
  * (tiny), so the scan over the full vector table stays shuffle-free and
  * embarrassingly parallel — at 100 TB this is one pass over the
  * embedding column per probe batch. The computation is `zip_with` +
  * `aggregate` higher-order functions in double; an IVF-bucketed variant
  * (`sim_ann_ivf`, §extras) is the at-scale ANN path that prunes the
  * scanned fraction.
  */
object SimQueries {
  type Q = (SparkSession, String) => DataFrame

  /** (probe_id, vec_id, cos) for probes vec_id < 10 against all vectors. */
  private def cosinePairs(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val probes = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("v").as("p"))
    emb.crossJoin(broadcast(probes))
      .select(col("probe_id"), col("vec_id"),
        (ArrayDot(col("p"), col("v"))
          / (sqrt(ArrayDot(col("p"), col("p"))) * sqrt(ArrayDot(col("v"), col("v")))))
          .as("cos"))
  }

  val queries: Map[String, Q] = Map(
    "sim_cosine_pairs" -> ((s, dir) => {
      cosinePairs(s, dir)
        .select(col("probe_id"), col("vec_id"), r4d(col("cos")).as("cos"))
        .orderBy("probe_id", "vec_id")
    }),

    // Top-5 neighbors per probe by cosine (excluding self), ties → vec_id.
    // Runs through the custom TopKPerGroup operator: the bounded-heap
    // partial pass ships ≤ 5 rows per (probe × scan partition) into the
    // exchange instead of window-sorting every scored pair — the shape
    // that holds when the probe set is large. The trailing row_number
    // only ranks the ≤ 5 survivors per probe.
    "sim_knn_topk" -> ((s, dir) => {
      val scored = cosinePairs(s, dir)
        .filter(col("vec_id") =!= col("probe_id"))
      val top = graft.plans.TopKPerGroup(scored, k = 5,
        partNames = Seq("probe_id"),
        orderSpec = Seq(("cos", false), ("vec_id", true)))
      val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("vec_id"))
      top.withColumn("rk", row_number().over(w))
        .select(col("probe_id"), col("vec_id"), r4d(col("cos")).as("cos"),
          col("rk").cast("long").as("rk"))
        .orderBy("probe_id", "rk")
    }),

    // Per-label elementwise mean of the first 8 dims (exact decimal sums
    // at scale 12 — lossless for float inputs, order-independent).
    "sim_centroid_per_label" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .select(col("label"), posexplode(slice(col("embedding"), 1, 8)))
        .groupBy(col("label"), col("pos"))
        .agg(r4d(sum(col("col").cast("double").cast("decimal(38,12)"))
          .cast("double") / count(lit(1))).as("mean"))
        .select(col("label"), col("pos").cast("long").as("pos"), col("mean"))
        .orderBy("label", "pos")
    }),

    // The "multimodal columns" surface: text metadata + vector in one row.
    "multimodal_join" -> ((s, dir) => {
      t(s, dir, "documents")
        .join(t(s, dir, "embeddings"), col("doc_id") === col("vec_id"))
        .groupBy(col("lang"), col("label")).agg(count(lit(1)).as("n"))
        .orderBy("lang", "label")
    }),

    // INT8 SCALAR QUANTIZATION reconstruction error — the storage-cost
    // lever of every vector index (a 64-dim float corpus drops 4× when
    // codes go int8; whether recall survives is exactly this key's
    // per-vector MSE). Min-max affine quantization: q = round((x −
    // lo)/scale) ∈ [0, 255], reconstruction lo + q·scale, error summed
    // per vector — entirely map-side scan-stage HOFs, no UDF, no
    // shuffle before the presentation sort, so at 100 TB it costs one
    // linear pass like the fingerprint keys.
    //
    // Determinism: float→double casts are exact, the fold runs in
    // ARRAY order on both engines (in-index aggregate() here, in-order
    // list sum in DuckDB — the entropy convention), and every IEEE op
    // is spelled identically. MSE surfaces ×10⁶ so r4d keeps signal at
    // this embedding magnitude; constant vectors (scale 0) emit 0
    // error via an explicit guard instead of a NaN.
    "sim_vector_quantize_error" -> ((s, dir) => {
      val v = t(s, dir, "embeddings").select(col("vec_id"),
        col("embedding"),
        array_min(col("embedding")).cast("double").as("lo"),
        array_max(col("embedding")).cast("double").as("hi"))
      v.withColumn("scale", (col("hi") - col("lo")) / lit(255.0))
        .withColumn("sse", when(col("scale") === 0.0, lit(0.0))
          .otherwise(aggregate(col("embedding"), lit(0.0), (acc, x) => {
            val xd = x.cast("double")
            val dq = col("lo") +
              round((xd - col("lo")) / col("scale")) * col("scale")
            acc + (xd - dq) * (xd - dq)
          })))
        .select(col("vec_id"), col("lo"), col("hi"),
          r4d(col("sse") / size(col("embedding")).cast("double")
            * lit(1000000.0)).as("mse_x1e6"))
        .orderBy("vec_id")
    })
  )

  private val cosSql =
    """pairs AS (
      |  SELECT p.vec_id AS probe_id, e.vec_id AS vec_id,
      |    list_dot_product(CAST(p.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
      |      / (sqrt(list_dot_product(CAST(p.embedding AS DOUBLE[]), CAST(p.embedding AS DOUBLE[])))
      |       * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))) AS cos
      |  FROM embeddings e CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 10) p)""".stripMargin

  val oracle: Map[String, String] = Map(
    // `ROUND(x,4) + 0.0` normalizes IEEE -0.0 (DuckDB's multiply-form ROUND
    // preserves the sign bit of a tiny negative cosine; Spark's BigDecimal
    // path cannot produce -0.0, and the driver's hash is bit-sensitive).
    "sim_cosine_pairs" ->
      s"""WITH $cosSql
         |SELECT probe_id, vec_id, ROUND(cos, 4) + 0.0 AS cos FROM pairs
         |ORDER BY probe_id, vec_id""".stripMargin,
    "sim_knn_topk" ->
      s"""WITH $cosSql
         |SELECT probe_id, vec_id, ROUND(cos, 4) + 0.0 AS cos, rk FROM (
         |  SELECT probe_id, vec_id, cos,
         |    row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, vec_id) AS rk
         |  FROM pairs WHERE vec_id <> probe_id)
         |WHERE rk <= 5 ORDER BY probe_id, rk""".stripMargin,
    "sim_centroid_per_label" ->
      """SELECT label, pos,
        |  ROUND(CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE)
        |    / COUNT(*), 4) AS mean
        |FROM (SELECT label, unnest(range(8)) AS pos, unnest(embedding[1:8]) AS x
        |      FROM embeddings)
        |GROUP BY label, pos ORDER BY label, pos""".stripMargin,
    "multimodal_join" ->
      """SELECT lang, label, count(*) AS n
        |FROM documents JOIN embeddings ON doc_id = vec_id
        |GROUP BY lang, label ORDER BY lang, label""".stripMargin,
    // Identical IEEE op order; list sums run in list order (the
    // entropy convention), float→double casts exact.
    "sim_vector_quantize_error" ->
      """WITH v AS (SELECT vec_id, embedding,
        |    CAST(list_min(embedding) AS DOUBLE) AS lo,
        |    CAST(list_max(embedding) AS DOUBLE) AS hi
        |  FROM embeddings),
        |s AS (SELECT vec_id, embedding, lo, hi,
        |    (hi - lo) / 255.0 AS scale FROM v),
        |e AS (SELECT vec_id, lo, hi,
        |    CASE WHEN scale = 0.0 THEN 0.0 ELSE
        |      list_aggregate(list_transform(embedding, x ->
        |        (CAST(x AS DOUBLE)
        |          - (lo + round((CAST(x AS DOUBLE) - lo) / scale) * scale))
        |        * (CAST(x AS DOUBLE)
        |          - (lo + round((CAST(x AS DOUBLE) - lo) / scale) * scale))),
        |        'sum') END AS sse,
        |    len(embedding) AS dim
        |  FROM s)
        |SELECT vec_id, lo, hi,
        |  ROUND(sse / CAST(dim AS DOUBLE) * 1000000.0 * 10000.0)
        |    / 10000.0 AS mse_x1e6
        |FROM e ORDER BY vec_id""".stripMargin
  )
}
