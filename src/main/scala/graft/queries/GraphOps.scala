package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.io.Tables

/** Graph analytics over relational edge tables — the iterative-join family
  * the reference's K-Means driver loop belongs to (SURVEY §3.3), applied to
  * the link-analysis shape a web-scale training-data pipeline needs
  * (PageRank-weighted source selection, as in Common-Crawl-derived corpora).
  *
  * Scale design: the transition table (|E| rows) is built ONCE, pre-divided
  * by out-weight, hash-partitioned by `src`, and locally checkpointed —
  * `Dataset.localCheckpoint` preserves the plan's output partitioning, so
  * every iteration's rank⋈edges join reshuffles only the |V|-sized rank
  * table while the edge layout is reused. Per iteration the moving state is
  * exactly: one |V| shuffle into the join, one |V| partial-agg shuffle of
  * contributions, and two 1-row broadcast scalars (node count, dangling
  * mass) — the 100 TB edge set never re-exchanges after the build. The
  * driver holds no per-node state (contrast GraphX's Pregel, which would
  * also work but pins both vertex and edge RDDs; the DataFrame form rides
  * AQE + Tungsten aggregation and keeps the engine's one-API surface).
  */
object GraphOps {

  type Q = (SparkSession, String) => DataFrame

  /** Weighted PageRank with teleport + uniform dangling-mass redistribution,
    * a fixed number of synchronous iterations (the textbook power-iteration
    * semantics — Page et al. 1999; fixed iters keeps it oracle-expressible
    * as chained SQL CTEs).
    *
    * Invariant: Σ ranks == 1 after every iteration (teleport (1−d)/N plus
    * d·(in-flow + dangling/N) redistributes all mass).
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               wCol: String, iters: Int, damping: Double): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(wCol).cast("double").as("w"))

    // |V|-sized node table; checkpoint once (reused every iteration and in
    // the final left join that keeps zero-inflow nodes in the result).
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    val nDf = nodes.agg(count(lit(1)).cast("double").as("n_nodes"))

    // Loop-invariant edge state: P(src→dst) = w / Σw(src), partitioned by
    // src so the per-iteration join reuses this layout.
    val outW = e.groupBy("src").agg(sum("w").as("w_out"))
    val trans = e.join(outW, "src")
      .select(col("src"), col("dst"), (col("w") / col("w_out")).as("p"))
      .repartition(col("src"))
      .localCheckpoint(true)
    // Nodes with no outgoing edges: their rank mass is redistributed
    // uniformly each iteration (computed once; per-iteration cost is a
    // broadcast-sized semi join + 1-row agg).
    val dangling = nodes.join(trans.select(col("src").as("node")).distinct(),
        Seq("node"), "left_anti")
      .localCheckpoint(true)

    var ranks = nodes.crossJoin(broadcast(nDf))
      .select(col("node"), (lit(1.0) / col("n_nodes")).as("pr"))
      .localCheckpoint(true)
    for (i <- 1 to iters) {
      val contrib = ranks.join(trans, ranks("node") === trans("src"))
        .groupBy(trans("dst"))
        .agg(sum(ranks("pr") * trans("p")).as("contrib"))
      val dangMass = ranks.join(dangling, Seq("node"), "left_semi")
        .agg(coalesce(sum("pr"), lit(0.0)).as("dang"))
      ranks = nodes.join(contrib, nodes("node") === contrib("dst"), "left")
        .crossJoin(broadcast(nDf))
        .crossJoin(broadcast(dangMass))
        .select(nodes("node"),
          (lit(1.0 - damping) / col("n_nodes") +
            lit(damping) * (coalesce(col("contrib"), lit(0.0)) +
              col("dang") / col("n_nodes"))).as("pr"))
      // truncate lineage between iterations; the LAST iteration stays a
      // live plan so callers (and the PLANS.md audit) see the real
      // per-iteration shape instead of a checkpoint scan
      if (i < iters) ranks = ranks.localCheckpoint(true)
    }
    ranks
  }

  /** Page-transition edge table from the events stream: consecutive
    * `props.k` page visits per user (same (user_id, ts, event_id) ordering
    * as ev_transitions), weighted by transition count. One window shuffle
    * on user_id + one |pages|²-bounded aggregation.
    */
  def pageEdges(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("page"))
      .withColumn("prev_page", lag("page", 1).over(w))
      .filter(col("prev_page").isNotNull)
      .groupBy(col("prev_page").as("src"), col("page").as("dst"))
      .agg(count(lit(1)).as("w"))
  }

  private val Damping = 0.85
  private val Iters = 5

  val queries: Map[String, Q] = Map(
    // Link analysis over the page-transition graph: 5 power iterations,
    // d = 0.85, dangling mass redistributed uniformly. Ranks sum to 1.
    "g_pagerank" -> ((s, d) =>
      pageRank(pageEdges(s, d), "src", "dst", "w", Iters, Damping)
        .select(col("node").as("page"), round(col("pr"), 6).as("pr")))
  )

  /** The same 5 iterations as chained CTEs (fixed iteration count makes
    * power iteration ANSI-SQL-expressible without recursion).
    */
  private def pagerankSql: String = {
    val base =
      """WITH ev AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) AS page
        |  FROM events),
        |lagged AS (
        |  SELECT page AS dst,
        |    lag(page) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src
        |  FROM ev),
        |edges AS (
        |  SELECT src, dst, CAST(count(*) AS DOUBLE) AS w
        |  FROM lagged WHERE src IS NOT NULL GROUP BY 1, 2),
        |nodes AS (
        |  SELECT DISTINCT node FROM
        |    (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges) u),
        |outw AS (SELECT src, sum(w) AS w_out FROM edges GROUP BY 1),
        |trans AS (
        |  SELECT e.src, e.dst, e.w / o.w_out AS p
        |  FROM edges e JOIN outw o ON e.src = o.src),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n_nodes FROM nodes),
        |dang AS (
        |  SELECT n.node FROM nodes n LEFT JOIN outw o ON n.node = o.src
        |  WHERE o.src IS NULL),
        |r0 AS (SELECT node, 1.0 / (SELECT n_nodes FROM nn) AS pr FROM nodes)""".stripMargin
    val steps = (1 to Iters).map { k =>
      s"""r$k AS (
         |  SELECT n.node,
         |    (1 - $Damping) / (SELECT n_nodes FROM nn)
         |    + $Damping * (coalesce(c.contrib, 0)
         |      + (SELECT coalesce(sum(r.pr), 0) FROM r${k - 1} r
         |         JOIN dang dg ON r.node = dg.node) / (SELECT n_nodes FROM nn))
         |      AS pr
         |  FROM nodes n LEFT JOIN (
         |    SELECT t.dst, sum(r.pr * t.p) AS contrib
         |    FROM r${k - 1} r JOIN trans t ON r.node = t.src GROUP BY 1) c
         |  ON n.node = c.dst)""".stripMargin
    }
    (base +: steps).mkString(",\n") +
      s"\nSELECT node AS page, round(pr, 6) AS pr FROM r$Iters"
  }

  val oracle: Map[String, String] = Map(
    "g_pagerank" -> pagerankSql
  )
}
