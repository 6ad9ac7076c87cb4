package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{t, events}
import graft.Det._

/** §2.8 Semi-structured (JSON) / array / map / explode (SURVEY.md).
  * JSON extraction uses `get_json_object` (codegen'd path evaluation);
  * array ops are higher-order functions evaluated per-row — no shuffle,
  * embarrassingly parallel at any scale. Explodes multiply rows inside a
  * single stage (Generate), never through the driver.
  */
object SemiStructuredQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "json_get_path" -> ((s, dir) => {
      events(s, dir)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .filter(col("k") > 50)
        .orderBy(col("event_id"))
    }),

    // JSON_TUPLE / LATERAL VIEW (§2.70) — the multi-field JSON
    // extractor as a GENERATOR: one json_tuple call parses the string
    // ONCE and emits all requested fields as columns (a
    // get_json_object chain re-parses per field — json_tuple is the
    // row-wise batch read, LATERAL VIEW its parser surface). The JSON
    // is built in-engine from fixture fields (each engine round-trips
    // its OWN construction, so only the extracted VALUES are
    // compared — construction formatting is engine-local). Numbers
    // come back as strings by json_tuple's contract, cast at the
    // edge.
    "fn_json_tuple" -> ((s, dir) => {
      s.sql(s"""WITH j AS (SELECT o_orderkey,
        |  to_json(named_struct('status', o_orderstatus,
        |    'cents', CAST(round(o_totalprice * 100) AS BIGINT),
        |    'prio', o_orderpriority)) AS js
        |  FROM parquet.`$dir/orders.parquet`)
        |SELECT o_orderkey, s AS status, CAST(c AS BIGINT) AS cents,
        |  p AS prio
        |FROM j LATERAL VIEW json_tuple(js, 'status', 'cents', 'prio') jt
        |  AS s, c, p
        |ORDER BY o_orderkey""".stripMargin)
    }),

    // VARIANT — Spark 4's open-schema semi-structured type:
    // parse_json materializes a binary-encoded variant ONCE and typed
    // variant_get probes navigate it without re-parsing the string per
    // field (the reason VARIANT replaces get_json_object chains at
    // scale — one parse, many reads, with shredding-friendly storage).
    // The variant itself never reaches the output (its binary encoding
    // is engine-internal); the oracle compares the EXTRACTED values,
    // which DuckDB reaches through its own json_extract.
    "json_variant_extract" -> ((s, dir) => {
      events(s, dir)
        .select(col("event_id"), parse_json(col("props")).as("v"))
        .select(col("event_id"),
          expr("variant_get(v, '$.k', 'bigint')").as("k"))
        .filter(col("k").isNotNull)
        .groupBy(pmod(col("k"), lit(10)).as("k_mod"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
        .orderBy("k_mod")
    }),

    "json_construct" -> ((s, dir) => {
      events(s, dir)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          to_json(struct(col("user_id"), col("n_events"))).as("j"))
        .orderBy(col("user_id"))
    }),

    "array_basics" -> ((s, dir) => {
      t(s, dir, "embeddings").select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("n"),
        round(element_at(col("embedding"), 1).cast("double"), 4).as("e1"),
        round(element_at(col("embedding"), 2).cast("double"), 4).as("e2"),
        round(element_at(col("embedding"), 3).cast("double"), 4).as("e3"),
        round(element_at(col("embedding"), 4).cast("double"), 4).as("e4"))
        .orderBy(col("vec_id"))
    }),

    // posexplode = the built-in Generator/UDTF path (0-based pos).
    "array_explode" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .select(col("vec_id"), posexplode(slice(col("embedding"), 1, 8)))
        .select(col("vec_id"), col("pos").cast("long").as("pos"),
          round(col("col").cast("double"), 4).as("val"))
        .orderBy(col("vec_id"), col("pos"))
    }),

    "array_higher_order" -> ((s, dir) => {
      t(s, dir, "embeddings").select(
        col("vec_id"),
        round(aggregate(
          transform(col("embedding"), x => x.cast("double") * 2),
          lit(0.0), (acc, x) => acc + x), 4).as("doubled_sum"),
        size(filter(col("embedding"), x => x > 0)).cast("long").as("n_pos"))
        .orderBy(col("vec_id"))
    }),

    // Map built per user from (event_type → count), exploded back to rows.
    "map_ops" -> ((s, dir) => {
      val perType = events(s, dir)
        .groupBy(col("user_id"), col("event_type")).agg(count(lit(1)).as("cnt"))
      perType.groupBy(col("user_id"))
        .agg(map_from_entries(collect_list(struct(col("event_type"), col("cnt"))))
          .as("m"))
        .select(col("user_id"), explode(col("m")).as(Seq("event_type", "cnt")))
        .orderBy(col("user_id"), col("event_type"))
    }),

    // Custom Generator UDTF (see Tokenize) through the SQL LATERAL VIEW path.
    "custom_udtf_generator" -> ((s, dir) => {
      Tokenize.register(s)
      s.sql(
        s"""SELECT doc_id, pos, token
           |FROM parquet.`$dir/documents.parquet`
           |LATERAL VIEW tokenize(text) t AS pos, token
           |ORDER BY doc_id, pos""".stripMargin)
    })
  )

  val oracle: Map[String, String] = Map(
    // DuckDB builds its own JSON (struct → to_json) and probes with
    // json_extract_string — each engine round-trips its own bytes.
    "fn_json_tuple" ->
      """WITH j AS (SELECT o_orderkey,
        |  to_json({'status': o_orderstatus,
        |    'cents': CAST(round(o_totalprice * 100, 0) AS BIGINT),
        |    'prio': o_orderpriority}) AS js
        |  FROM orders)
        |SELECT o_orderkey,
        |  json_extract_string(js, '$.status') AS status,
        |  CAST(json_extract_string(js, '$.cents') AS BIGINT) AS cents,
        |  json_extract_string(js, '$.prio') AS prio
        |FROM j ORDER BY o_orderkey""".stripMargin,
    "json_get_path" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
        |ORDER BY event_id""".stripMargin,
    "json_variant_extract" ->
      """WITH x AS (SELECT CAST(json_extract_string(props, '$.k') AS BIGINT)
        |    AS k FROM events)
        |SELECT k % 10 AS k_mod, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k
        |FROM x WHERE k IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "json_construct" ->
      """SELECT user_id,
        |  CAST(to_json(struct_pack(user_id := user_id, n_events := n_events)) AS VARCHAR) AS j
        |FROM (SELECT user_id, count(*) AS n_events FROM events GROUP BY 1)
        |ORDER BY user_id""".stripMargin,
    "array_basics" ->
      """SELECT vec_id, len(embedding) AS n,
        |  round(CAST(embedding[1] AS DOUBLE), 4) AS e1,
        |  round(CAST(embedding[2] AS DOUBLE), 4) AS e2,
        |  round(CAST(embedding[3] AS DOUBLE), 4) AS e3,
        |  round(CAST(embedding[4] AS DOUBLE), 4) AS e4
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "array_explode" ->
      """SELECT vec_id, unnest(range(8)) AS pos,
        |  unnest(list_transform(embedding[1:8], x -> round(CAST(x AS DOUBLE), 4))) AS val
        |FROM embeddings ORDER BY vec_id, pos""".stripMargin,
    "array_higher_order" ->
      """SELECT vec_id,
        |  round(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * 2)), 4) AS doubled_sum,
        |  len(list_filter(embedding, x -> x > 0)) AS n_pos
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "map_ops" ->
      """SELECT user_id, event_type, count(*) AS cnt FROM events
        |GROUP BY user_id, event_type ORDER BY user_id, event_type""".stripMargin,
    "custom_udtf_generator" ->
      """SELECT doc_id, unnest(range(len(toks))) AS pos, unnest(toks) AS token
        |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |ORDER BY doc_id, pos""".stripMargin
  )
}
