package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.io.Tables

/** Second declared-query batch: the SQL surface beyond the reference's
  * operator set that any engine replacing it must still serve — outer
  * joins, scalar subqueries, EXCEPT, grouping sets, pivot, analytic
  * windows (lead / ntile / first_value), date-time and string scalar
  * functions, null handling, explode/unnest — plus two training-data
  * pipeline ops (deterministic hash-based train/test split, keep-best
  * doc per duplicate group).
  *
  * Scale posture notes per query are inline; every LIMIT-free query is
  * a single scan + at most one shuffle, and all dimension joins
  * broadcast.
  */
object SqlSurface {

  type Q = (SparkSession, String) => DataFrame

  /** Seeded deterministic shuffle key: engine-portable rolling hash of
    * `"<id>:<seed>"`, then a multiplicative scramble mod the same prime.
    * The scramble matters: the raw polynomial hash of SHORT strings
    * never wraps the modulus, so it orders compact numeric ids
    * monotonically — "shuffling" into the identity order. Multiplying
    * by a large odd constant mod p disperses it; the product stays
    * under 2^63 (h < 2^30, c < 2^32), so the arithmetic is exact 64-bit
    * in any engine. A pure function of the id: an append never changes
    * an existing row's key (append-stable order), and no RNG or
    * platform hash is involved.
    */
  def shuffleKey(id: org.apache.spark.sql.Column, seed: Long): org.apache.spark.sql.Column =
    pmod(graft.functions.TextExprs.rollingHash(
      concat(id.cast("string"), lit(s":$seed"))) * lit(2654435761L),
      lit(1000000007L))

  /** Deterministic global shuffle — the WRITE path of training-order
    * randomization: key every row by [[shuffleKey]], range-partition on
    * (key, id) and sort within partitions, so the written files read
    * back in shuffled order end-to-end (partition p's every row sorts
    * before partition p+1's). One range exchange + local sorts; no
    * global single-partition stage anywhere. The declared
    * `tp_global_shuffle` encodes the same total order verifiably as
    * (bucket, pos) for the oracle.
    */
  def deterministicShuffle(docs: DataFrame, idCol: String, seed: Long): DataFrame =
    docs.withColumn("shuffle_key", shuffleKey(col(idCol), seed))
      .repartitionByRange(col("shuffle_key"), col(idCol))
      .sortWithinPartitions("shuffle_key", idCol)

  val queries: Map[String, Q] = Map(
    // Left outer join preserving unmatched left rows (TPC-H Q13 shape):
    // orders-per-customer distribution including zero-order customers.
    // Fact-fact outer join -> shuffle on the key; the second agg is tiny.
    "j_outer_left" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .groupBy("n_orders")
        .agg(count(lit(1)).as("n_customers"))
    }),

    // Full outer join: per-nation rich-customer counts vs supplier counts;
    // either side may be missing a nation. Seq-key join coalesces the key.
    "j_outer_full" -> ((s, d) => {
      val cn = Tables.customer(s, d).filter(col("c_acctbal") > 7000.0)
        .groupBy(col("c_nationkey").cast("long").as("nationkey"))
        .agg(count(lit(1)).as("n_rich_customers"))
      val sn = Tables.supplier(s, d)
        .groupBy(col("s_nationkey").cast("long").as("nationkey"))
        .agg(count(lit(1)).as("n_suppliers"))
      cn.join(sn, Seq("nationkey"), "full_outer")
    }),

    // Relational division: customers who have ordered in EVERY priority
    // class — the classic "for all" operator, realized as distinct-count
    // equality against a 1-row broadcast universe count.
    "q_division" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val universe = o.agg(countDistinct("o_orderpriority").as("n_prios"))
      o.groupBy("o_custkey")
        .agg(countDistinct("o_orderpriority").as("n_cust_prios"))
        .crossJoin(broadcast(universe))
        .filter(col("n_cust_prios") === col("n_prios"))
        .select("o_custkey")
    }),

    // Scalar subquery: orders above 1.5x the global average price. The
    // scalar aggregate is a 1-row broadcast cross join — no per-row
    // recomputation, one pass over the fact.
    "q_scalar_subquery" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val avgPrice = o.agg(avg("o_totalprice").as("global_avg"))
      o.crossJoin(broadcast(avgPrice))
        .filter(col("o_totalprice") > col("global_avg") * 1.5)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    }),

    // Set op: EXCEPT (distinct) — customers who placed an urgent order but
    // never a low-priority one. Both branches scan the same fact once each;
    // EXCEPT is one hash shuffle on the key.
    "setop_except" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val urgent = o.filter(col("o_orderpriority").startsWith("1"))
        .select(col("o_custkey").as("custkey"))
      val low = o.filter(col("o_orderpriority").startsWith("5"))
        .select(col("o_custkey").as("custkey"))
      urgent.except(low)
    }),

    // Bag-semantics set ops (ALL variants): multiplicity is data — an
    // order count per customer difference, not a membership test. Same
    // one-shuffle shape; Spark plans them as count-annotated joins.
    "setop_except_all" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val urgent = o.filter(col("o_orderpriority").startsWith("1"))
        .select(col("o_custkey").as("custkey"))
      val low = o.filter(col("o_orderpriority").startsWith("5"))
        .select(col("o_custkey").as("custkey"))
      urgent.exceptAll(low)
    }),

    "setop_intersect_all" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val urgent = o.filter(col("o_orderpriority").startsWith("1"))
        .select(col("o_custkey").as("custkey"))
      val low = o.filter(col("o_orderpriority").startsWith("5"))
        .select(col("o_custkey").as("custkey"))
      urgent.intersectAll(low)
    }),

    // Grouping sets: two independent one-dimension rollups in one pass
    // (one shuffle, expand + partial agg — not a union of re-scans).
    // grouping() flags disambiguate real NULLs from subtotal rows.
    "a_grouping_sets" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"), sum("l_quantity").as("sum_qty"),
          grouping("l_returnflag").cast("int").as("g_rf"),
          grouping("l_linestatus").cast("int").as("g_ls"))),

    // Pivot: order counts per priority x status as a cross-tab. The
    // status domain is declared (no extra distinct pass); nulls -> 0 so
    // the result is dense.
    "a_pivot" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("F"),
          coalesce(col("O"), lit(0L)).as("O"),
          coalesce(col("P"), lit(0L)).as("P"))),

    // Analytic windows: lead / ntile / first_value over each customer's
    // order history (single shuffle on the partition key).
    "w_lead_ntile" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      Tables.orders(s, d)
        .withColumn("next_price", lead("o_totalprice", 1).over(w))
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("first_price", first("o_totalprice").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("o_custkey", "o_orderkey", "o_totalprice",
          "next_price", "quartile", "first_price")
    }),

    // Date-time scalar functions: extraction, truncation, date diff,
    // end-of-month — all codegen built-ins, no UDFs.
    "f_datetime" -> ((s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"),
        quarter(col("o_orderdate")).as("o_quarter"),
        month(col("o_orderdate")).as("o_month"),
        dayofmonth(col("o_orderdate")).as("o_day"),
        datediff(to_date(col("o_orderdate")), to_date(lit("1995-01-01")))
          .as("days_since_epoch95"),
        last_day(to_date(col("o_orderdate"))).as("month_end"))),

    // String scalar functions: length / case / substring / replace /
    // position / padding / LIKE / concat — all codegen built-ins.
    "f_strings" -> ((s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        length(col("p_name")).as("n_chars"),
        upper(col("p_name")).as("name_upper"),
        substring(col("p_name"), 1, 4).as("prefix4"),
        regexp_replace(col("p_name"), " ", "_").as("name_snake"),
        instr(col("p_name"), "e").as("pos_e"),
        lpad(col("p_brand"), 10, "*").as("brand_pad"),
        col("p_name").like("%widget%").as("is_widget"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))),

    // Null handling: NULLIF / COALESCE / CASE tiers / LEAST / GREATEST.
    "f_null_case" -> ((s, d) =>
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        nullif(col("l_discount"), lit(0.0)).as("disc_nn"),
        coalesce(nullif(col("l_discount"), lit(0.0)), lit(-1.0)).as("disc_or_flag"),
        when(col("l_quantity") >= 30, "bulk")
          .when(col("l_quantity") >= 10, "mid")
          .otherwise("small").as("qty_tier"),
        least(col("l_quantity"), lit(25.0)).as("qty_capped"),
        greatest(col("l_extendedprice"), lit(1000.0)).as("price_floor"))),

    // Explode / unnest with position: order priority split into tokens.
    "f_explode" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          posexplode(split(col("o_orderpriority"), "-")).as(Seq("pos", "tok")))),

    // Statistical aggregate family: spread, correlation, covariance —
    // all one-pass partial-aggregable built-ins. Outputs are cast to
    // float32: the double results differ from other engines in final ulps
    // (different partial-sum orders), and the float cast absorbs that
    // while keeping ~7 significant digits.
    "a_stats" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          stddev_samp(col("l_quantity")).cast("float").as("sd_qty"),
          var_samp(col("l_extendedprice")).cast("float").as("var_price"),
          corr(col("l_quantity"), col("l_extendedprice")).cast("float").as("corr_qty_price"),
          covar_samp(col("l_quantity"), col("l_extendedprice")).cast("float").as("covar_qty_price"),
          count(lit(1)).as("n"))),

    // Equi-width histogram: value -> bucket is a pure map (width_bucket
    // over fixed bounds), counts one partial-aggregated shuffle keyed by
    // (group, bucket) — the one-pass distribution profile; bucket count
    // is bounded, so the result stays tiny at any scale.
    "a_histogram" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      li.groupBy(col("l_returnflag"),
          width_bucket(col("l_extendedprice"), lit(0.0), lit(120000.0), lit(12))
            .as("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          round(avg(col("l_extendedprice")), 2).as("avg_in_bucket"))
    }),

    // Array aggregation: per-order sorted line numbers (collect_list is
    // unordered across partitions — array_sort canonicalizes), plus
    // element membership and cardinality. The array is emitted as a
    // comma-joined string: engine-portable, and array-typed output
    // columns are unhashable in common verification harnesses.
    "f_array_agg" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(array_sort(collect_list(col("l_linenumber"))).as("__nums"))
        .select(col("l_orderkey"),
          // array-level cast (codegen), not transform(_.cast) (interpreted)
          concat_ws(",", col("__nums").cast("array<string>")).as("line_nums"),
          size(col("__nums")).as("n_lines"),
          array_contains(col("__nums"), 1).as("has_first"))),

    // Unpivot / melt: wide metrics to long (id, metric, val) — the
    // inverse of pivot, a pure map (no shuffle at any scale).
    "a_unpivot" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice")),
          "metric", "val")),

    // The rank-function family beyond row_number: gap ranking, dense
    // ranking, and the two normalized positions.
    "w_rank_family" -> ((s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .withColumn("prnk", percent_rank().over(w))
        .withColumn("cdist", cume_dist().over(w))
        .select("o_orderpriority", "o_orderkey", "rnk", "drnk", "prnk", "cdist")
    }),

    // Correlated lateral subquery through the SQL front door: per
    // customer, the max order price (null when orderless). Catalyst
    // decorrelates this into an aggregate + join — no per-row re-scan.
    "q_lateral" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer_v")
      Tables.orders(s, d).createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT c.c_custkey, t.max_price
          |FROM customer_v c,
          |  LATERAL (SELECT max(o_totalprice) AS max_price
          |           FROM orders_v WHERE o_custkey = c.c_custkey) t""".stripMargin)
    }),

    // JSON extraction: schema-on-read over a string column with
    // from_json (typed struct out, codegen'd Jackson parse — the shape
    // for semi-structured sidecar metadata at scale).
    "f_json" -> ((s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        from_json(col("props"), lit("k INT")).getField("k").as("k"),
        get_json_object(col("props"), "$.k").cast("int").as("k_path"))),

    // Time-range window frame: per-user 15-minute trailing sum — RANGE
    // frames bound by the ORDER BY value, not row counts (the rolling
    // telemetry shape; one shuffle on the partition key).
    "w_range_frame" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("epoch_s", unix_timestamp(col("ts")))
        .withColumn("trailing_15m_value", sum("value").over(
          Window.partitionBy("user_id").orderBy("epoch_s")
            .rangeBetween(-900, Window.currentRow)))
        .select("user_id", "event_id", "epoch_s", "trailing_15m_value")),

    // Training-pipeline: deterministic hash-based train/test split. The
    // engine-portable rolling hash (native codegen expression) makes the
    // split reproducible across engines and runs — no RNG, no seed drift;
    // at 100 TB this is a pure map (no shuffle at all).
    "tp_hash_split" -> ((s, d) => {
      val h = graft.functions.TextExprs.rollingHash(col("text"))
      OracleFold.augmentDocs(Tables.documents(s, d)).select(
        col("doc_id"),
        pmod(h, lit(10L)).as("bucket"),
        when(pmod(h, lit(10L)) < 8, "train").otherwise("test").as("split"))
    }),

    // Cross-split leakage audit: after the deterministic hash split, does
    // any NORMALIZED document text appear in both train and test? The
    // eval-integrity check a training run gates on (a raw-text split
    // leaks every near-identical re-crawl). One shuffle on the content
    // key — a window over the hash group, never a self-join — so the
    // audit scales like exact dedup, not like a pair enumeration.
    "tp_split_leakage" -> ((s, d) => {
      val h = graft.functions.TextExprs.rollingHash(col("text"))
      val norm = concat_ws(" ", graft.text.TextOps.cleanTokens(col("text")))
      val docs = OracleFold.augmentDocs(Tables.documents(s, d)).select(
        col("doc_id"),
        when(pmod(h, lit(10L)) < 8, "train").otherwise("test").as("split"),
        md5(norm).as("content_hash"))
      val w = Window.partitionBy("content_hash")
      docs.select(col("doc_id"), col("split"),
        (min("split").over(w) =!= max("split").over(w)).cast("int").as("leaked"))
    }),

    // Training-pipeline: deterministic global shuffle (training-order
    // randomization). Every doc's sort key is a pure function of
    // (id, seed) via the engine-portable rolling hash — no RNG, so the
    // order is reproducible across runs/engines, and APPEND-STABLE:
    // new docs interleave without reordering existing ones (their keys
    // never change). The declared output encodes the total order
    // scalably as (bucket = key >> 16, pos within bucket): buckets are
    // contiguous key ranges, so (bucket, pos) IS the global order, and
    // the rank window partitions BY BUCKET — distributed, never a
    // single-partition global window. Keys live in [0, 1e9+7), so >> 16
    // yields ~15k buckets — the window's parallelism ceiling stays far
    // above any executor count (>> 24 would cap it at ~60 tasks). The
    // write path is [[deterministicShuffle]] (range partition +
    // in-partition sort).
    "tp_global_shuffle" -> ((s, d) => {
      val keyed = OracleFold.augmentDocs(Tables.documents(s, d)).select(col("doc_id"),
        shuffleKey(col("doc_id"), 42L).as("shuffle_key"))
      val w = Window.partitionBy("bucket").orderBy("shuffle_key", "doc_id")
      keyed.withColumn("bucket", shiftright(col("shuffle_key"), 16))
        .withColumn("pos", row_number().over(w).cast("int"))
        .select("doc_id", "shuffle_key", "bucket", "pos")
    }),

    // Training-data domain mixing: deterministic proportional
    // downsampling to a target language mixture (downweight the
    // over-represented crawl language, keep the rest) — keep-rates in
    // basis points applied via a content-hash threshold. No RNG: the
    // same corpus always yields the same mixture, across runs AND
    // engines, and rerunning after an append only adds rows (existing
    // keep/drop decisions never flip). Pure map, no shuffle.
    "tp_domain_mix" -> ((s, d) => {
      val rates = Seq("en" -> 5000L, "zh" -> 8000L, "fr" -> 7500L)
      val h = pmod(graft.functions.TextExprs.rollingHash(col("text")), lit(10000L))
      val rate = rates.foldLeft(lit(10000L): org.apache.spark.sql.Column) {
        case (acc, (l, r)) => when(col("lang") === l, lit(r)).otherwise(acc)
      }
      OracleFold.augmentDocs(Tables.documents(s, d))
        .filter(h < rate)
        .select(col("doc_id"), col("lang"))
    }),

    // Dataset manifest fingerprint (graft.io.Manifest's arithmetic,
    // declared over documents' (doc_id, lang, text) projection): the
    // ORDER-INSENSITIVE content hash — Σ rolling_hash(row repr) mod
    // 2³¹−1, accumulated in decimal(38,0) so a 100 TB row count can't
    // wrap the sum — that a pipeline records beside every frozen input
    // and re-verifies before training. One partial-aggregated pass, a
    // single long of state per partition.
    "io_manifest" -> ((s, d) => {
      val proj = OracleFold.augmentDocs(Tables.documents(s, d))
        .select("doc_id", "lang", "text")
      proj.select(graft.io.Manifest.reprCol(proj).as("__r"))
        .agg(count(lit(1)).as("n_rows"),
          graft.io.Manifest.fingerprintCol(col("__r")).as("fingerprint"))
    }),

    // Release-audit diff between two dataset versions ([[graft.io
    // .Manifest.diffSummary]]): the one-number fingerprint says THAT two
    // releases differ, the diff says BY HOW MUCH — rows only in A /
    // only in B / common, multiset semantics over the content-hash.
    // The "next release" is derived deterministically (doc_id % 101
    // rows dropped, doc_id % 103 texts edited), so the oracle knows the
    // truth. Per side one partial-aggregated hash contraction; the
    // full-outer join moves distinct-row-sized count tables, never the
    // rows.
    "io_manifest_diff" -> ((s, d) => {
      val proj = OracleFold.augmentDocs(Tables.documents(s, d))
        .select("doc_id", "lang", "text")
      val next = proj.filter(pmod(col("doc_id"), lit(101)) =!= 0)
        .withColumn("text", when(pmod(col("doc_id"), lit(103)) === 0,
          concat(col("text"), lit(" v2"))).otherwise(col("text")))
      graft.io.Manifest.diffSummary(proj, next)
    }),

    // Temperature-scaled mixture (the XLM-R/mT5 multinomial-α sampler):
    // per-domain sampling weight p_d ∝ n_d^α with α = 0.5, so tail
    // domains are UPWEIGHTED relative to their corpus share — the rates
    // are DERIVED from the corpus (one tiny groupBy + 1-row total,
    // broadcast back), unlike tp_domain_mix's operator-supplied table.
    // The fixed-point √n (s_d = floor(sqrt(n_d·10⁶)), BIGINT — exact in
    // any engine) feeds a DOUBLE rate combine with a final floor: a
    // pure-integer product 10⁴·(n_tot/2)·s_d overflows int64 past
    // ~1.4e8 docs (numerator ~5e6·N^1.5), silently flipping rates
    // negative, so the combine runs in IEEE doubles — the identical
    // expression tree of correctly-rounded ops on both engines, the
    // same determinism contract tp_weighted_sample's ln(u)/w keys
    // already rely on. Budget = half the corpus. Keep decisions
    // ride the same content-hash threshold as tp_domain_mix: no RNG,
    // same corpus → same mixture across runs and engines. NOTE the
    // rates REFIT on append (they are corpus statistics) — the
    // append-stability contract belongs to the static-rate operator.
    "tp_temperature_mix" -> ((s, d) => {
      val docs = OracleFold.augmentDocs(Tables.documents(s, d))
      val stats = docs.groupBy("lang").agg(count(lit(1)).as("n_dom"))
        .withColumn("s_dom",
          floor(sqrt(col("n_dom") * lit(1000000L))).cast("long"))
      val tot = stats.agg(sum("n_dom").as("n_tot"), sum("s_dom").as("s_tot"))
      val rates = stats.crossJoin(broadcast(tot))
        .select(col("lang"),
          least(lit(10000L),
            floor(lit(10000.0) * expr("n_tot DIV 2").cast("double") *
              col("s_dom").cast("double") /
              (col("s_tot").cast("double") * col("n_dom").cast("double")))
              .cast("long"))
            .as("rate_bp"))
      val h = pmod(graft.functions.TextExprs.rollingHash(col("text")), lit(10000L))
      docs.join(broadcast(rates), "lang")
        .filter(h < col("rate_bp"))
        .select(col("doc_id"), col("lang"), col("rate_bp"))
    }),

    // Training-pipeline: overlapping token chunking (50-token windows,
    // stride 40) — the context-window prep step. Token array materialized
    // once, chunk starts generated per doc, slice per chunk; a flat map,
    // no shuffle.
    "tp_chunk" -> ((s, d) => {
      val stride = 40
      Tables.documents(s, d)
        .select(col("doc_id"), graft.text.TextOps.tokens(col("text")).as("__toks"))
        .select(col("doc_id"), col("__toks"), size(col("__toks")).as("n"))
        .select(col("doc_id"), col("__toks"),
          explode(when(col("n") > 0,
            sequence(lit(0), ceil(col("n") / lit(stride.toDouble)).cast("int") - 1))
            .otherwise(array().cast("array<int>"))).as("chunk_idx"))
        .select(col("doc_id"), col("chunk_idx"),
          concat_ws(" ", slice(col("__toks"), col("chunk_idx") * stride + 1, lit(50)))
            .as("chunk_text"),
          size(slice(col("__toks"), col("chunk_idx") * stride + 1, lit(50)))
            .as("n_chunk_tokens"))
    }),

    // Training-pipeline: PII scrubbing — emails, phone numbers, and IPv4
    // literals replaced by typed tags via chained codegen regexp_replace
    // (one narrow pass, no UDF, no shuffle; map-side next to the scan at
    // any scale). Deterministic PII is synthesized into every document
    // so the check is non-vacuous, and the oracle replays the identical
    // regex chain (dialect-portable patterns: no \b, no lookaround).
    // The redacted text rides as an md5 so the compare stays compact.
    "tp_redact_pii" -> ((s, d) => {
      val pii = concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail"), pmod(col("doc_id"), lit(7)).cast("string"), lit(".org"),
        lit(" call +1 555-"),
        lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
        lit(" from 10."), pmod(col("doc_id"), lit(256)).cast("string"),
        lit(".0.7"))
      val emailPat = graft.text.TextAnalysis.piiPatterns.head._1
      graft.text.TextAnalysis
        .redactPii(Tables.documents(s, d).withColumn("text", pii), "doc_id", "text")
        .select(col("doc_id"),
          md5(col("redacted")).as("redacted_md5"),
          regexp_count(col("text"), lit(emailPat)).cast("int").as("n_emails"))
    }),

    // Training-pipeline: HTML/markup boilerplate stripping — stage 0 of
    // every web-corpus pipeline (without it, the quality/dedup family
    // scores markup noise). Script/style/comment blocks drop with their
    // contents, CDATA unwraps, tags strip, entities decode, whitespace
    // collapses — chained codegen regexp_replace like tp_redact_pii
    // (map-side next to the scan at any scale). A deterministic markup
    // template wraps every document so the check is non-vacuous; the
    // oracle's regex chain is BUILT from the same markupPatterns
    // sequence, not hand-copied. md5 keeps the compare compact.
    "tp_html_clean" -> ((s, d) => {
      val did = col("doc_id").cast("string")
      val wrapped = concat(
        lit("<html><!-- doc "), did,
        lit(" --><head><style type=\"text/css\">body { color: #fff; }</style>"),
        lit("<script src=\"a.js\">var i = "), did,
        lit("; if (i < 2 && i > 0) { alert(\"x\"); }</script></head><body>"),
        lit("<h1>Doc &amp; Title &#169;</h1><p class=\"b\">"), col("text"),
        lit("</p><![CDATA[raw "), pmod(col("doc_id"), lit(9)).cast("string"),
        lit(" data]]>&nbsp;<br/>Tom &amp;amp; Jerry &lt;3</body></html>"))
      graft.text.TextAnalysis.stripMarkup(
        Tables.documents(s, d).withColumn("text", wrapped), "doc_id", "text")
        .select(col("doc_id"), md5(col("clean_text")).as("clean_md5"),
          (length(col("text")) - length(col("clean_text"))).as("n_stripped_chars"))
    }),

    // Training-pipeline: winsorization — clamp outliers to per-group
    // exact [p05, p95]. The tiny per-group bounds table broadcasts back
    // onto the fact; one aggregation + one map, no window over the fact.
    "tp_winsorize" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val bounds = ev.groupBy("event_type")
        .agg(percentile(col("value"), lit(0.05)).as("p05"),
          percentile(col("value"), lit(0.95)).as("p95"))
      ev.join(broadcast(bounds), "event_type")
        .select(col("event_id"), col("event_type"), col("value"),
          least(greatest(col("value"), col("p05")), col("p95")).as("value_w"))
    }),

    // Null-safe arithmetic: try_divide / try_* return null instead of
    // raising under ANSI mode — the ingest posture for dirty data.
    "f_try_arith" -> ((s, d) =>
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        try_divide(col("l_extendedprice"), col("l_discount")).as("price_per_disc"),
        try_divide(lit(1.0), col("l_quantity") - col("l_quantity")).as("div_zero"),
        try_add(col("l_quantity"), col("l_extendedprice")).as("sum_ok"))),

    // Training-pipeline: stratified sampling with per-language rates,
    // deterministic via hash thresholds (not RNG — reproducible across
    // runs, engines, and repartitioning, unlike sampleBy). Pure map +
    // one broadcast join.
    "tp_stratified_sample" -> ((s, d) => {
      import s.implicits._
      val rates = Seq(("en", 0.5), ("es", 0.2), ("fr", 0.2), ("de", 0.2), ("zh", 0.1))
        .toDF("lang", "rate")
      val h = pmod(graft.functions.TextExprs.rollingHash(col("text")), lit(1000L))
      OracleFold.augmentDocs(Tables.documents(s, d))
        .join(broadcast(rates), Seq("lang"), "inner")
        .filter(h < col("rate") * 1000)
        .select("doc_id", "lang")
    }),

    // Training-pipeline: deterministic weighted sampling WITHOUT
    // replacement (Efraimidis–Spirakis A-Res): inclusion probability
    // proportional to weight (doc length here — any quality score
    // works), via per-doc key ln(u)/w with u a deterministic uniform
    // from the engine-portable rolling hash — no RNG, reproducible
    // across engines, runs, and repartitioning. The top-n by key is a
    // k-bounded TakeOrdered (partial top-n per partition), never a
    // global sort materialization — the corpus-subsampling shape that
    // holds at 100 TB.
    "tp_weighted_sample" -> ((s, d) => {
      val m = 1000000007L
      val u = (graft.functions.TextExprs.rollingHash(col("text")).cast("double")
        + 0.5) / m.toDouble
      val w = greatest(col("n_chars"), lit(1L)).cast("double")
      OracleFold.augmentDocs(Tables.documents(s, d))
        .select(col("doc_id"), col("n_chars"), (log(u) / w).as("es_key"))
        .orderBy(desc("es_key"), asc("doc_id"))
        .limit(200)
    }),

    // Training-pipeline: next-fit sequence packing — documents assigned
    // to fixed-token-budget bins by a running token count, packed per
    // shard (window partitions by shard, never a global OVER (): packing
    // is per-worker at scale, and this keeps every window bounded).
    "tp_pack_nextfit" -> ((s, d) => {
      val w = Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, d)
        .select(col("doc_id"),
          pmod(col("doc_id"), lit(8L)).as("shard"),
          graft.text.TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
        .withColumn("cum_tokens", sum("n_tokens").over(w))
        .withColumn("bin", floor((col("cum_tokens") - col("n_tokens")) / 1024).cast("long"))
        .select("doc_id", "shard", "n_tokens", "bin")
    }),

    // Training-pipeline: exact-dup groups keep the best document
    // (longest token count, doc_id as tiebreak) — one hash shuffle on
    // the content hash, max_by partial-aggregates map-side.
    "tp_keep_best" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("n_tokens", graft.text.TextAnalysis.tokenCount(col("text")))
      docs.groupBy(md5(col("text")).as("content_hash"))
        .agg(
          max_by(col("doc_id"),
            col("n_tokens") * 1000000L + col("doc_id")).as("keeper_id"),
          count(lit(1)).as("dup_count"))
    }),

    // Curriculum ordering: bucket the corpus by difficulty (token count
    // — the classic short-to-long schedule) into B quantile bins, each
    // internally shuffled by the deterministic key. NO global ntile
    // window (that single-partitions the corpus): the bin comes from
    // the cumulative distribution over the BOUNDED score domain — a
    // token-count histogram (≤ max-doc-tokens rows), a cumulative
    // window over that tiny table, and a broadcast join back, so
    // bucketing is one partial-aggregated rollup + a map. Ties (equal
    // scores) share a bin by construction (bin = floor(B·cum_before/N))
    // — deterministic, append-shiftable like any corpus statistic, and
    // engine-exact (pure integer arithmetic).
    "tp_curriculum" -> ((s, d) => {
      val B = 4
      val scored = OracleFold.augmentDocs(Tables.documents(s, d))
        .select(col("doc_id"),
          graft.text.TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      val hist = scored.groupBy("n_tokens").agg(count(lit(1)).as("__c"))
      val w = Window.orderBy("n_tokens")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // N comes from the histogram itself (sum of bucket counts) — an
      // extra scored.count() would re-scan the corpus a third time
      val cum = hist
        .withColumn("__cum_before", sum("__c").over(w) - col("__c"))
        .crossJoin(broadcast(hist.agg(sum("__c").as("__n"))))
        .select(col("n_tokens"),
          expr(s"($B * __cum_before) DIV __n").cast("int").as("bucket"))
      scored.join(broadcast(cum), "n_tokens")
        .select(col("doc_id"), col("n_tokens"), col("bucket"),
          shuffleKey(col("doc_id"), seed = 7L).as("order_key"))
    }),

    // Layout: Z-order (Morton) code over (l_partkey, l_suppkey) — the
    // multi-dimensional data-skipping layout key ([[graft.layout.ZOrder]]).
    // The declared query hash-checks the quantize + bit-interleave
    // row-for-row against the oracle's identical expression chain;
    // ZOrderSpec measures the actual per-file bounding-box shrink after
    // `zorderBy`'s repartitionByRange write. Pure codegen'd bit ops, the
    // min/max ride in as a broadcast 1-row cross join.
    "tp_zorder" -> ((s, d) =>
      graft.layout.ZOrder.withZCode(
          Tables.lineitem(s, d)
            .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
          "l_partkey", "l_suppkey", zCol = "zcode")
        .select("l_orderkey", "l_linenumber", "zcode")),

    // The N-dimensional generalization ([[graft.layout.ZOrder.mortonN]]):
    // three quantized dims interleaved at stride 3 (48-bit key) — the
    // layout key for a table queried on any of THREE columns. The ENGINE
    // ships the generalized 4-stage mask-shift ladder (the naive 16-term
    // spread broke codegen — BASELINE.md); the ORACLE replays the
    // semantically-equal per-bit spread, so engine/oracle equivalence is
    // carried by ZOrderSpec's ladder-vs-reference bit goldens plus this
    // 60k-row hash check, not by sharing one generated term list.
    "tp_zorder3" -> ((s, d) =>
      graft.layout.ZOrder.withZCodeN(
          Tables.lineitem(s, d)
            .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
              "l_quantity"),
          Seq("l_partkey", "l_suppkey", "l_quantity"), zCol = "zcode")
        .select("l_orderkey", "l_linenumber", "zcode"))
  )

  /** Stride-3 bit spread as generated SQL (bit b of `v` → position 3b) —
    * the same 16 terms [[graft.layout.ZOrder.spreadBitsStride]] folds.
    */
  private def spread3Sql(v: String): String =
    (0 until 16).map(b => s"(($v & ${1L << b}) << ${2 * b})")
      .mkString("(", " | ", ")")

  /** The DuckDB form of [[graft.text.TextAnalysis.markupPatterns]]'s
    * regexp_replace chain, BUILT from the same sequence the Spark
    * operator folds over — the two engines cannot drift apart. All
    * patterns are the RE2-compatible subset; 'g' replays Spark's
    * replace-all semantics.
    */
  private def markupChainSql(input: String): String =
    graft.text.TextAnalysis.markupPatterns.foldLeft(input) {
      case (acc, (pat, repl)) =>
        s"regexp_replace($acc, '${pat.replace("'", "''")}', " +
          s"'${repl.replace("'", "''")}', 'g')"
    }

  /** DuckDB replay of [[graft.io.Manifest.escCell]] + `reprCol` over
    * named column exprs: escape chr(3) first, then the separator and
    * NULL sentinels, join with chr(1), NULL cells -> bare chr(2) — the
    * byte-for-byte repr the engine hashes.
    */
  private def manifestReprSql(cols: Seq[String]): String = {
    def esc(x: String) =
      s"replace(replace(replace($x, chr(3), chr(3)||chr(3)), " +
        s"chr(1), chr(3)||chr(1)), chr(2), chr(3)||chr(2))"
    cols.map(c => s"coalesce(${esc(c)}, chr(2))").mkString(" || chr(1) || ")
  }

  val oracle: Map[String, String] = Map(
    "tp_html_clean" -> {
      val chain = markupChainSql("t")
      s"""WITH h AS (
           SELECT doc_id,
             '<html><!-- doc ' || CAST(doc_id AS VARCHAR)
             || ' --><head><style type="text/css">body { color: #fff; }</style>'
             || '<script src="a.js">var i = ' || CAST(doc_id AS VARCHAR)
             || '; if (i < 2 && i > 0) { alert("x"); }</script></head><body>'
             || '<h1>Doc &amp; Title &#169;</h1><p class="b">' || text
             || '</p><![CDATA[raw ' || CAST(doc_id % 9 AS VARCHAR)
             || ' data]]>&nbsp;<br/>Tom &amp;amp; Jerry &lt;3</body></html>' AS t
           FROM documents)
         SELECT doc_id, md5(trim($chain)) AS clean_md5,
           CAST(length(t) - length(trim($chain)) AS INT) AS n_stripped_chars
         FROM h"""
    },

    "j_outer_left" ->
      """SELECT n_orders, count(*) AS n_customers FROM (
           SELECT c_custkey, count(o_orderkey) AS n_orders
           FROM customer LEFT JOIN orders ON c_custkey = o_custkey
           GROUP BY 1) t
         GROUP BY 1""",

    "j_outer_full" ->
      """SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
           n_rich_customers, n_suppliers
         FROM
           (SELECT CAST(c_nationkey AS BIGINT) AS nationkey, count(*) AS n_rich_customers
            FROM customer WHERE c_acctbal > 7000.0 GROUP BY 1) c
         FULL JOIN
           (SELECT CAST(s_nationkey AS BIGINT) AS nationkey, count(*) AS n_suppliers
            FROM supplier GROUP BY 1) s
         ON c.nationkey = s.nationkey""",

    "q_division" ->
      """SELECT o_custkey FROM orders
         GROUP BY o_custkey
         HAVING count(DISTINCT o_orderpriority) =
           (SELECT count(DISTINCT o_orderpriority) FROM orders)""",

    "q_scalar_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)""",

    "setop_except" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority LIKE '1%'
         EXCEPT
         SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority LIKE '5%'""",

    "setop_except_all" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority LIKE '1%'
         EXCEPT ALL
         SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority LIKE '5%'""",

    "setop_intersect_all" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority LIKE '1%'
         INTERSECT ALL
         SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority LIKE '5%'""",

    "a_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
           sum(l_quantity) AS sum_qty,
           CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
           CAST(GROUPING(l_linestatus) AS INT) AS g_ls
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""",

    "a_pivot" ->
      """SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
           count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
           count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
         FROM orders GROUP BY 1""",

    "w_lead_ntile" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
           lead(o_totalprice, 1) OVER w AS next_price,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           first_value(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_price
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""",

    "f_datetime" ->
      """SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(quarter(o_orderdate) AS INT) AS o_quarter,
           CAST(month(o_orderdate) AS INT) AS o_month,
           CAST(day(o_orderdate) AS INT) AS o_day,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT)
             AS days_since_epoch95,
           last_day(CAST(o_orderdate AS DATE)) AS month_end
         FROM orders""",

    "f_strings" ->
      """SELECT p_partkey,
           length(p_name) AS n_chars,
           upper(p_name) AS name_upper,
           substr(p_name, 1, 4) AS prefix4,
           replace(p_name, ' ', '_') AS name_snake,
           strpos(p_name, 'e') AS pos_e,
           lpad(p_brand, 10, '*') AS brand_pad,
           p_name LIKE '%widget%' AS is_widget,
           concat_ws('|', p_brand, p_type) AS brand_type
         FROM part""",

    "f_null_case" ->
      """SELECT l_orderkey, l_linenumber,
           nullif(l_discount, 0.0) AS disc_nn,
           coalesce(nullif(l_discount, 0.0), -1.0) AS disc_or_flag,
           CASE WHEN l_quantity >= 30 THEN 'bulk'
                WHEN l_quantity >= 10 THEN 'mid'
                ELSE 'small' END AS qty_tier,
           least(l_quantity, 25.0) AS qty_capped,
           greatest(l_extendedprice, 1000.0) AS price_floor
         FROM lineitem""",

    "f_explode" ->
      """SELECT o_orderkey,
           CAST(generate_subscripts(l, 1) - 1 AS INT) AS pos,
           unnest(l) AS tok
         FROM (SELECT o_orderkey, string_split(o_orderpriority, '-') AS l
               FROM orders) t""",

    "a_stats" ->
      """SELECT l_returnflag,
           CAST(stddev_samp(l_quantity) AS FLOAT) AS sd_qty,
           CAST(var_samp(l_extendedprice) AS FLOAT) AS var_price,
           CAST(corr(l_quantity, l_extendedprice) AS FLOAT) AS corr_qty_price,
           CAST(covar_samp(l_quantity, l_extendedprice) AS FLOAT) AS covar_qty_price,
           count(*) AS n
         FROM lineitem GROUP BY 1""",

    // width_bucket spelled arithmetically (same fixed bounds: 12 buckets
    // of width 10000 over [0, 120000), overflow bucket 13)
    "a_histogram" ->
      """SELECT l_returnflag,
           CAST(CASE WHEN l_extendedprice < 0 THEN 0
                     WHEN l_extendedprice >= 120000 THEN 13
                     ELSE floor(l_extendedprice / 10000) + 1 END AS BIGINT)
             AS bucket,
           count(*) AS n_rows,
           round(avg(l_extendedprice), 2) AS avg_in_bucket
         FROM lineitem GROUP BY 1, 2""",

    "f_array_agg" ->
      """SELECT l_orderkey,
           array_to_string(line_nums, ',') AS line_nums,
           CAST(len(line_nums) AS INT) AS n_lines,
           list_contains(line_nums, 1) AS has_first
         FROM (
           SELECT l_orderkey, list_sort(list(l_linenumber)) AS line_nums
           FROM lineitem GROUP BY 1) t""",

    "a_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS val
         FROM lineitem
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'l_extendedprice' AS metric, l_extendedprice AS val
         FROM lineitem""",

    "w_rank_family" ->
      """SELECT o_orderpriority, o_orderkey,
           CAST(rank() OVER w AS INT) AS rnk,
           CAST(dense_rank() OVER w AS INT) AS drnk,
           percent_rank() OVER w AS prnk,
           cume_dist() OVER w AS cdist
         FROM orders
         WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC)""",

    // LEFT JOIN LATERAL: Spark decorrelates the scalar-aggregate lateral
    // into a left outer join (Postgres semantics — orderless customers
    // keep a NULL aggregate); DuckDB's comma-lateral drops them, so the
    // oracle spells the outer join explicitly.
    "q_lateral" ->
      """SELECT c.c_custkey, t.max_price
         FROM customer c LEFT JOIN LATERAL (
           SELECT max(o_totalprice) AS max_price
           FROM orders WHERE o_custkey = c.c_custkey) t ON true""",

    "f_json" ->
      """SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_path
         FROM events""",

    "w_range_frame" ->
      """SELECT user_id, event_id, epoch_s,
           sum(value) OVER (PARTITION BY user_id ORDER BY epoch_s
             RANGE BETWEEN 900 PRECEDING AND CURRENT ROW) AS trailing_15m_value
         FROM (SELECT user_id, event_id, value,
                 CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s
               FROM events) t""",

    // UTF-8 byte fold (OracleFold) over the multilingual fixture —
    // hash-exact vs the engine on any string, not just ASCII
    "tp_hash_split" ->
      s"""SELECT doc_id, rhash % 10 AS bucket,
           CASE WHEN rhash % 10 < 8 THEN 'train' ELSE 'test' END AS split
         FROM (SELECT doc_id, ${OracleFold.rollingHashSql("text")} AS rhash
           FROM (${OracleFold.mlDocsSql}) documents) t""",

    // same rolling hash for the split + the dd_exact_normalized
    // normalization for the content key; leaked = the key's split set
    // spans both sides
    "tp_split_leakage" ->
      s"""WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN ${OracleFold.rollingHashSql("text")} % 10 < 8
        |      THEN 'train' ELSE 'test' END AS split,
        |    md5(array_to_string(list_filter(string_split_regex(
        |      lower(regexp_replace(text,
        |        '[~!@#$$%^&*()\\-+\\[\\]"'':.,<>]', '', 'g')), '\\s+'),
        |      t -> t != ''), ' ')) AS content_hash
        |  FROM (${OracleFold.mlDocsSql}) documents)
        |SELECT doc_id, split,
        |  CASE WHEN min(split) OVER (PARTITION BY content_hash)
        |         <> max(split) OVER (PARTITION BY content_hash)
        |       THEN 1 ELSE 0 END AS leaked
        |FROM t""".stripMargin,

    // same rolling hash, thresholded per language at the declared
    // basis-point keep-rates
    "tp_domain_mix" ->
      s"""SELECT doc_id, lang FROM (
           SELECT doc_id, lang, ${OracleFold.rollingHashSql("text")} % 10000 AS h
           FROM (${OracleFold.mlDocsSql}) documents) t
         WHERE h < CASE lang WHEN 'en' THEN 5000 WHEN 'zh' THEN 8000
                             WHEN 'fr' THEN 7500 ELSE 10000 END""",

    // the manifest fingerprint replayed value-for-value: the same
    // rolling hash over the same injectively-escaped chr(1)-joined row
    // repr (manifestReprSql), HUGEINT sum (DuckDB's native sum(BIGINT)
    // widening — the decimal(38,0) counterpart), mod 2^31-1. The fold
    // is OracleFold's UTF-8 byte expansion — hash-exact vs the engine
    // on any corpus — and the declared input is the multilingual
    // fixture, so the fingerprint contract is certified off-ASCII.
    "io_manifest" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(h) % 2147483647 AS BIGINT) AS fingerprint
        |FROM (SELECT ${OracleFold.rollingHashSql(
               manifestReprSql(Seq("CAST(doc_id AS VARCHAR)", "lang", "text")))} AS h
        |      FROM (${OracleFold.mlDocsSql}) documents) t""".stripMargin,

    // the same escaped-repr rolling-hash replay per side (byte fold,
    // multilingual fixture), multiset compare over the hash counts
    "io_manifest_diff" -> {
      def hashOf(textExpr: String) =
        OracleFold.rollingHashSql(
          manifestReprSql(Seq("CAST(doc_id AS VARCHAR)", "lang", textExpr)))
      s"""WITH ha AS (
         |  SELECT h, count(*) AS cnt_a FROM (
         |    SELECT ${hashOf("text")} AS h
         |    FROM (${OracleFold.mlDocsSql}) documents) t GROUP BY 1),
         |hb AS (
         |  SELECT h, count(*) AS cnt_b FROM (
         |    SELECT ${hashOf(
               "CASE WHEN doc_id % 103 = 0 THEN text || ' v2' ELSE text END")} AS h
         |    FROM (${OracleFold.mlDocsSql}) documents
         |    WHERE doc_id % 101 <> 0) t GROUP BY 1),
         |j AS (
         |  SELECT coalesce(cnt_a, 0) AS cnt_a, coalesce(cnt_b, 0) AS cnt_b
         |  FROM ha FULL OUTER JOIN hb USING (h))
         |SELECT CAST(sum(cnt_a) AS BIGINT) AS rows_a,
         |  CAST(sum(cnt_b) AS BIGINT) AS rows_b,
         |  CAST(sum(greatest(cnt_a - cnt_b, 0)) AS BIGINT) AS rows_only_a,
         |  CAST(sum(greatest(cnt_b - cnt_a, 0)) AS BIGINT) AS rows_only_b,
         |  CAST(sum(least(cnt_a, cnt_b)) AS BIGINT) AS rows_common
         |FROM j""".stripMargin
    },

    // the corpus-derived α=0.5 rates replayed with the identical
    // arithmetic: exact fixed-point sqrt (BIGINT), then the same IEEE
    // double combine + floor (an all-integer product overflows int64 at
    // scale — see the engine-side comment), then the same rolling-hash
    // threshold
    "tp_temperature_mix" ->
      s"""WITH stats AS (
           SELECT lang, count(*) AS n_dom,
             CAST(floor(sqrt(count(*) * 1000000)) AS BIGINT) AS s_dom
           FROM (${OracleFold.mlDocsSql}) documents GROUP BY 1),
         tot AS (SELECT CAST(sum(n_dom) AS BIGINT) AS n_tot,
                        CAST(sum(s_dom) AS BIGINT) AS s_tot FROM stats),
         rates AS (
           SELECT lang,
             least(10000, CAST(floor(
               10000.0 * CAST(n_tot // 2 AS DOUBLE) * CAST(s_dom AS DOUBLE)
                 / (CAST(s_tot AS DOUBLE) * CAST(n_dom AS DOUBLE))) AS BIGINT))
               AS rate_bp
           FROM stats CROSS JOIN tot)
         SELECT doc_id, t.lang, rate_bp FROM (
           SELECT doc_id, lang, ${OracleFold.rollingHashSql("text")} % 10000 AS h
           FROM (${OracleFold.mlDocsSql}) documents) t
           JOIN rates r ON r.lang = t.lang
         WHERE h < rate_bp""",

    // same rolling hash -> uniform in (0,1) -> ln(u)/w A-Res key; the
    // top-200 set is deterministic so the oracle replays it exactly
    "tp_weighted_sample" ->
      s"""SELECT doc_id, n_chars,
           ln((rhash + 0.5) / 1000000007.0) / greatest(n_chars, 1) AS es_key
         FROM (SELECT doc_id, n_chars, ${OracleFold.rollingHashSql("text")} AS rhash
           FROM (${OracleFold.mlDocsSql}) documents) t
         ORDER BY es_key DESC, doc_id LIMIT 200""",

    "tp_chunk" ->
      """WITH t AS (
           SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x != '') AS toks
           FROM documents),
         c AS (
           SELECT doc_id, toks,
             unnest(range(0, CAST(ceil(len(toks) / 40.0) AS INT))) AS chunk_idx
           FROM t)
         SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           array_to_string(list_slice(toks, chunk_idx * 40 + 1, chunk_idx * 40 + 50), ' ')
             AS chunk_text,
           CAST(len(list_slice(toks, chunk_idx * 40 + 1, chunk_idx * 40 + 50)) AS INT)
             AS n_chunk_tokens
         FROM c""",

    "tp_redact_pii" ->
      """WITH pii AS (
           SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@mail' || CAST(doc_id % 7 AS VARCHAR) || '.org'
                  || ' call +1 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  || ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.7' AS t
           FROM documents)
         SELECT doc_id,
           md5(regexp_replace(regexp_replace(regexp_replace(t,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\+[0-9]{1,3}[ -][0-9]{3}[ -]?[0-9]{4}', '<PHONE>', 'g'),
             '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g'))
             AS redacted_md5,
           CAST(len(regexp_extract_all(t,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails
         FROM pii""",

    "tp_winsorize" ->
      """WITH b AS (
           SELECT event_type, quantile_cont(value, 0.05) AS p05,
                  quantile_cont(value, 0.95) AS p95
           FROM events GROUP BY 1)
         SELECT event_id, e.event_type, value,
           least(greatest(value, p05), p95) AS value_w
         FROM events e JOIN b ON e.event_type = b.event_type""",

    "f_try_arith" ->
      """SELECT l_orderkey, l_linenumber,
           CASE WHEN l_discount = 0 THEN NULL
                ELSE l_extendedprice / l_discount END AS price_per_disc,
           CAST(NULL AS DOUBLE) AS div_zero,
           l_quantity + l_extendedprice AS sum_ok
         FROM lineitem""",

    // curriculum bins replayed from the same token-count histogram
    // cumulative (integer DIV), the same seed-7 shuffle key
    "tp_curriculum" ->
      s"""WITH scored AS (
           SELECT doc_id,
             len(list_filter(string_split_regex(text, '\\s+'), t -> t != ''))
               AS n_tokens
           FROM (${OracleFold.mlDocsSql}) documents),
         hist AS (
           SELECT n_tokens, count(*) AS c FROM scored GROUP BY 1),
         cum AS (
           SELECT n_tokens,
             CAST((4 * (sum(c) OVER (ORDER BY n_tokens
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c))
               // (SELECT count(*) FROM scored) AS INT) AS bucket
           FROM hist)
         SELECT s.doc_id, s.n_tokens, c.bucket,
           (${OracleFold.rollingHashSql("CAST(s.doc_id AS VARCHAR) || ':7'")}
            * 2654435761) % 1000000007 AS order_key
         FROM scored s JOIN cum c ON c.n_tokens = s.n_tokens""",

    // byte fold over the multilingual fixture (the key hashes the ASCII
    // doc_id repr, so the fixture swap is result-identical — declared on
    // it anyway so the whole family shares one input)
    "tp_global_shuffle" ->
      s"""WITH keyed AS (
           SELECT doc_id,
             (${OracleFold.rollingHashSql("CAST(doc_id AS VARCHAR) || ':42'")}
              * 2654435761) % 1000000007 AS shuffle_key
           FROM (${OracleFold.mlDocsSql}) documents)
         SELECT doc_id, shuffle_key, shuffle_key // 65536 AS bucket,
           CAST(row_number() OVER (PARTITION BY shuffle_key // 65536
             ORDER BY shuffle_key, doc_id) AS INT) AS pos
         FROM keyed""",

    "tp_stratified_sample" ->
      s"""WITH rates(lang, rate) AS (VALUES
           ('en', 0.5), ('es', 0.2), ('fr', 0.2), ('de', 0.2), ('zh', 0.1))
         SELECT doc_id, d.lang
         FROM (${OracleFold.mlDocsSql}) d JOIN rates r ON d.lang = r.lang
         WHERE ${OracleFold.rollingHashSql("text")} % 1000 < rate * 1000""",

    "tp_pack_nextfit" ->
      """SELECT doc_id, shard, n_tokens,
           CAST(floor((cum_tokens - n_tokens) / 1024) AS BIGINT) AS bin
         FROM (
           SELECT doc_id, shard, n_tokens,
             sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
           FROM (
             SELECT doc_id, doc_id % 8 AS shard,
               len(list_filter(string_split_regex(text, '\s+'), t -> t != '')) AS n_tokens
             FROM documents) a) b""",

    "tp_keep_best" ->
      """SELECT md5(text) AS content_hash,
           max_by(doc_id,
             len(list_filter(string_split_regex(text, '\s+'), t -> t != '')) * 1000000 + doc_id)
             AS keeper_id,
           count(*) AS dup_count
         FROM documents GROUP BY 1""",

    // identical quantize + mask-shift ladder as graft.layout.ZOrder:
    // the double multiply/divide and the integer bit ops are IEEE/2's-
    // complement-exact in both engines, so the codes hash-match.
    "tp_zorder" ->
      """WITH mm AS (
           SELECT min(l_partkey) AS minp, max(l_partkey) AS maxp,
                  min(l_suppkey) AS mins, max(l_suppkey) AS maxs
           FROM lineitem),
         q AS (
           SELECT l_orderkey, l_linenumber,
             CASE WHEN maxp = minp THEN 0 ELSE
               CAST(floor((CAST(l_partkey AS DOUBLE) - CAST(minp AS DOUBLE)) * 65535.0
                 / (CAST(maxp AS DOUBLE) - CAST(minp AS DOUBLE))) AS BIGINT)
             END AS qx,
             CASE WHEN maxs = mins THEN 0 ELSE
               CAST(floor((CAST(l_suppkey AS DOUBLE) - CAST(mins AS DOUBLE)) * 65535.0
                 / (CAST(maxs AS DOUBLE) - CAST(mins AS DOUBLE))) AS BIGINT)
             END AS qy
           FROM lineitem, mm),
         s1 AS (SELECT l_orderkey, l_linenumber,
                  ((qx | (qx << 8)) & 16711935) AS qx,
                  ((qy | (qy << 8)) & 16711935) AS qy FROM q),
         s2 AS (SELECT l_orderkey, l_linenumber,
                  ((qx | (qx << 4)) & 252645135) AS qx,
                  ((qy | (qy << 4)) & 252645135) AS qy FROM s1),
         s3 AS (SELECT l_orderkey, l_linenumber,
                  ((qx | (qx << 2)) & 858993459) AS qx,
                  ((qy | (qy << 2)) & 858993459) AS qy FROM s2),
         s4 AS (SELECT l_orderkey, l_linenumber,
                  ((qx | (qx << 1)) & 1431655765) AS qx,
                  ((qy | (qy << 1)) & 1431655765) AS qy FROM s3)
         SELECT l_orderkey, l_linenumber, (qx | (qy << 1)) AS zcode FROM s4""",

    // identical quantize + the GENERATED stride-3 spread terms
    "tp_zorder3" ->
      s"""WITH mm AS (
         |  SELECT min(l_partkey) AS min0, max(l_partkey) AS max0,
         |         min(l_suppkey) AS min1, max(l_suppkey) AS max1,
         |         min(l_quantity) AS min2, max(l_quantity) AS max2
         |  FROM lineitem),
         |q AS (
         |  SELECT l_orderkey, l_linenumber,
         |    CASE WHEN max0 = min0 THEN 0 ELSE
         |      CAST(floor((CAST(l_partkey AS DOUBLE) - CAST(min0 AS DOUBLE)) * 65535.0
         |        / (CAST(max0 AS DOUBLE) - CAST(min0 AS DOUBLE))) AS BIGINT)
         |    END AS q0,
         |    CASE WHEN max1 = min1 THEN 0 ELSE
         |      CAST(floor((CAST(l_suppkey AS DOUBLE) - CAST(min1 AS DOUBLE)) * 65535.0
         |        / (CAST(max1 AS DOUBLE) - CAST(min1 AS DOUBLE))) AS BIGINT)
         |    END AS q1,
         |    CASE WHEN max2 = min2 THEN 0 ELSE
         |      CAST(floor((CAST(l_quantity AS DOUBLE) - CAST(min2 AS DOUBLE)) * 65535.0
         |        / (CAST(max2 AS DOUBLE) - CAST(min2 AS DOUBLE))) AS BIGINT)
         |    END AS q2
         |  FROM lineitem, mm)
         |SELECT l_orderkey, l_linenumber,
         |  (${spread3Sql("q0")} | (${spread3Sql("q1")} << 1)
         |    | (${spread3Sql("q2")} << 2)) AS zcode
         |FROM q""".stripMargin
  )
}
