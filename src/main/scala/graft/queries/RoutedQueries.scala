package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.CorpusOps
import graft.pipeline.ChunkRouter
import graft.sources.Tables

/** Round-3 additions: the `run_direct` routed entry (chunk category
  * dispatch), the homepage uptake/waffle composite, the daily-report
  * announcements window, and the corpus-assembly operators (sequence
  * packing, stratified sampling, per-source token caps).
  */
object RoutedQueries {

  /** q162's target mixture weights (policy config): src0..src19 →
    * 10 + (i·37) mod 90, spread over [10, 99] so proportional shares vary
    * ~10× and some sources hit the epoch cap. One formula feeds both the
    * Spark map and the oracle's VALUES list. */
  private val mixtureWeights: Map[String, Long] =
    (0 until 20).map(i => s"src$i" -> (10L + (i * 37) % 90)).toMap

  private val mixtureWeightValues: String =
    (0 until 20).map(i => s"('src$i', ${10 + (i * 37) % 90})").mkString(", ")

  /** Shared oracle CTE chain for q162/q167: per-source supply, weights,
    * caps, budget, and the window-based water-filling solve ending in the
    * `alloc` CTE (source, a, w, cap, capped, alloc). */
  private def mixtureAllocCtes: String =
    s"""WITH counts AS (
       |  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS a
       |  FROM documents GROUP BY 1
       |),
       |wts(source, w) AS (VALUES $mixtureWeightValues),
       |base AS (
       |  SELECT c.source, c.a, CAST(COALESCE(wts.w, 0) AS BIGINT) AS w,
       |         (c.a * 1000) // 1000 AS cap
       |  FROM counts c LEFT JOIN wts USING (source)
       |),
       |tot AS (SELECT (CAST(SUM(a) AS BIGINT) * 600) // 1000 AS b FROM base),
       |pos AS (
       |  SELECT source, a, w, cap,
       |         row_number() OVER (
       |           ORDER BY (CAST(cap AS HUGEINT) * 1000000) // w, source) AS rn
       |  FROM base WHERE w > 0
       |),
       |pre AS (
       |  SELECT pos.*, tot.b,
       |         COALESCE(SUM(cap) OVER (ORDER BY rn
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c_pre,
       |         COALESCE(SUM(w) OVER (ORDER BY rn
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS w_pre,
       |         SUM(w) OVER () AS w_tot
       |  FROM pos CROSS JOIN tot
       |),
       |pfx AS (
       |  SELECT *, bool_and(CAST(cap AS HUGEINT) * (w_tot - w_pre)
       |                     <= CAST(w AS HUGEINT) * (b - c_pre))
       |              OVER (ORDER BY rn) AS capped
       |  FROM pre
       |),
       |fin AS (
       |  SELECT COALESCE(SUM(CASE WHEN capped THEN cap END), 0) AS c_k,
       |         COALESCE(SUM(CASE WHEN NOT capped THEN w END), 0) AS w_k
       |  FROM pfx
       |),
       |alloc AS (
       |  SELECT b2.source, b2.a, b2.w, b2.cap,
       |         COALESCE(p.capped, FALSE) AS capped,
       |         CAST(CASE WHEN b2.w = 0 THEN 0
       |              WHEN COALESCE(p.capped, FALSE) THEN b2.cap
       |              WHEN f.w_k = 0 THEN 0
       |              ELSE (CAST(b2.w AS HUGEINT) * (t.b - f.c_k)) // f.w_k
       |              END AS BIGINT) AS alloc
       |  FROM base b2
       |  LEFT JOIN pfx p USING (source)
       |  CROSS JOIN fin f CROSS JOIN tot t
       |)""".stripMargin

  /** Chunk fixture for q88: lineitem days pivoted into per-category wide
    * chunks. `l_returnflag` picks the route — 'A' → "cases" (direct
    * pipeline), 'N' → vaccinations-by-vaccination-date @ MSOA (msoa-lite
    * path), 'R' → "variants" with no subcategory (unrouted → dropped, the
    * reference's "no process handler defined"). */
  private def chunkFixture(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .groupBy(
        when(col("l_returnflag") === "A", "cases")
          .when(col("l_returnflag") === "N", "vaccinations-by-vaccination-date")
          .otherwise("variants").as("category"),
        when(col("l_returnflag") === "N", "msoa").otherwise("ltla").as("areaType"),
        col("l_suppkey").cast("string").as("areaCode"),
        to_date(col("l_shipdate")).as("date"))
      .agg(sum("l_quantity").cast("double").as("newCases"))
      .withColumn("subcategory", lit(null).cast("string"))
      .withColumn("cumVax",
        when(dayofmonth(col("date")) % 5 === 0, col("newCases")))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // run_direct routed entry (chunk_etl_processor/processor.py:25-85 +
    // db_etl/etl.py:1027-1143): static handler table as a column expression,
    // each route processed as one set-oriented pipeline, unrouted dropped.
    "q88_run_direct" -> ((s, dir) =>
      ChunkRouter.runRouted(chunkFixture(s, dir), Map(
        ChunkRouter.Direct -> ChunkRouter.directHandler("newCases") _,
        ChunkRouter.DirectMsoa -> ChunkRouter.msoaHandler("newCases", "cumVax") _))),

    // Homepage latest-uptake triple (db_etl_homepage_graphs/queries.py:14-128
    // VACCINATIONS_QUERY): three per-metric latest aggregates over a 20-day
    // window, FULL-joined on (date, area_code), with the reference's
    // ISNULL→0::INT / FLOOR cast quirks preserved exactly.
    "q89_uptake_triple" -> ((s, dir) => {
      val long = uptakeFixture(s, dir)
      // anchor from the raw scan: the fixture's groupBy preserves the max
      // ship date, and aggregating the fixture itself would re-run its
      // shuffle just for this scalar (the q51 lesson)
      val anch = Tables.load(s, dir, "lineitem")
        .agg(date_sub(max(to_date(col("l_shipdate"))), 20).as("__anchor"))
      val windowed = long.crossJoin(broadcast(anch))
        .where(col("date") > col("__anchor") && col("value").isNotNull)
      def dose(metric: String, p: String) = windowed
        .where(col("metric") === metric)
        .groupBy(col("area_type").as(p + "_area_type"),
          col("area_code").as(p + "_area_code"))
        .agg(max("date").as(p + "_date"), max("value").as(p + "_dose"))
      val f = dose("firstDose", "f")
      val sec = dose("secondDose", "s")
      val t = dose("thirdDose", "t")
      f.join(sec, col("f_date") === col("s_date") &&
          col("f_area_code") === col("s_area_code"), "full")
        .join(t, col("f_date") === col("t_date") &&
          col("f_area_code") === col("t_area_code"), "full")
        .groupBy(col("f_area_type").as("area_type"),
          col("f_area_code").as("area_code"))
        .agg(date_format(max("f_date"), "yyyy-MM-dd").as("date"),
          when(max("f_dose").isNull, 0)
            .otherwise(max(floor(col("f_dose"))).cast("int")).as("first_dose"),
          when(max("s_dose").isNull, 0)
            .otherwise(max(floor(col("s_dose"))).cast("int")).as("second_dose"),
          when(max("t_dose").isNull, 0)
            .otherwise(max(floor(col("t_dose"))).cast("int")).as("third_dose"))
    }),

    // Waffle-chart payload extraction (db_etl_homepage_graphs/grapher.py:133-170
    // get_value_65_plus, tests/test_waffle_chart.py): pick the '65+' element
    // of the nested demographics payload, default 0, int(round(x, 1))
    // truncation semantics.
    "q90_waffle_65plus" -> ((s, dir) => {
      val nested = waffleFixture(s, dir)
      val el = element_at(filter(col("payload"), x => x.getField("age") === "65+"), 1)
      def pick(field: String) =
        coalesce(round(el.getField(field), 1), lit(0d)).cast("int")
      nested.select(col("area_type"), col("area_code"),
        date_format(col("date"), "yyyy-MM-dd").as("date"),
        pick("cumPeopleVaccinated").as("vaccination_date"),
        pick("cumUptakePercentage").as("vaccination_date_percentage_dose"))
    }),

    // Daily-report announcements window (main_etl_daily_report/report.py:152-186):
    // boolean-selected bounds — release-tied rows measured against the latest
    // release date, others against "now" — launch inclusive, expire exclusive.
    "q91_announcements" -> ((s, dir) => {
      val ann = announcementsFixture(s, dir)
      val rel = ann.agg(date_sub(max("launch"), 30).as("__release"))
      val a = ann.crossJoin(broadcast(rel))
        .withColumn("__now", date_add(col("__release"), 2))
      a.where(
          ((col("deploy_with_release") && col("launch") <= col("__release")) ||
            (!col("deploy_with_release") && col("launch") <= col("__now"))) &&
          ((col("remove_with_release") && col("expire") > col("__release")) ||
            (!col("remove_with_release") && col("expire") > col("__now"))))
        .select(col("id").cast("string").as("id"),
          date_format(col("launch"), "yyyy-MM-dd").as("launch"),
          date_format(col("expire"), "yyyy-MM-dd").as("expire"),
          date_format(coalesce(col("date"), col("launch")), "yyyy-MM-dd").as("date"),
          col("body"))
        .orderBy(col("launch").desc, col("expire").desc)
    }),

    // Token-budget sequence packing: greedy concatenate-then-cut plan per
    // shard — every doc labeled with its training bin and offset.
    "q92_pack_sequences" -> ((s, dir) =>
      CorpusOps.packSequences(Tables.load(s, dir, "documents"), "doc_id", "text",
        budgetTokens = 512, nShards = 4)),

    // Stratified sampling: per-language keep rates from a hash-uniform —
    // growth-stable, shuffle-free.
    "q93_stratified_sample" -> ((s, dir) =>
      CorpusOps.stratifiedSample(Tables.load(s, dir, "documents"), "doc_id",
          "lang", Map("en" -> 0.5, "fr" -> 1.0, "de" -> 0.25), defaultRate = 0.1)
        .select("doc_id", "lang", "source")),

    // Per-source token cap: stable hash-ordered greedy keep within each
    // source until the cap is reached.
    "q94_source_cap" -> ((s, dir) =>
      CorpusOps.capSourceTokens(Tables.load(s, dir, "documents"), "doc_id",
          "source", "text", capTokens = 2000)
        .select("doc_id", "source", "n_tokens", "cum_tokens")),

    // Temperature-based source mixing: each source's share of the token
    // budget ∝ tokens^alpha; docs survive a hash-uniform draw under their
    // source's keep rate. Integer-quantized weights keep the normalizer (and
    // every keep decision) identical under any partition order.
    "q110_temperature_mix" -> ((s, dir) =>
      CorpusOps.temperatureMix(Tables.load(s, dir, "documents"), "doc_id",
        "source", "text", alpha = 0.5, budgetTokens = 6000)),

    // Deterministic global corpus shuffle: md5-derived shard + in-shard
    // position — reproducible training order with no global sort.
    "q111_corpus_shuffle" -> ((s, dir) =>
      CorpusOps.deterministicShuffle(Tables.load(s, dir, "documents"),
        "doc_id", nShards = 8)),

    // Multi-epoch training order: q111's deterministic shuffle re-keyed per
    // epoch (the dataloader's "reshuffle between epochs"), 3 epochs x 8
    // shards — every epoch an independent reproducible permutation.
    "q159_epoch_orders" -> ((s, dir) =>
      CorpusOps.epochOrders(Tables.load(s, dir, "documents"),
        "doc_id", nShards = 8, epochs = 3)),

    // Token-budget mixture plan: water-fill 60% of the corpus's token
    // supply across sources proportionally to target weights, with a
    // 1.0-epoch per-source cap; capped sources' surplus re-flows. The
    // |sources|-row solve is driver trainer-state; the corpus collapses in
    // one source-keyed aggregation.
    "q162_mixture_plan" -> ((s, dir) =>
      CorpusOps.mixturePlan(
        Tables.load(s, dir, "documents").select(col("source"),
          graft.operators.TextAnalysis.tokenCount(col("text")).as("n")),
        "source", "n", weights = mixtureWeights,
        budgetPermille = 600, maxEpochsMilli = 1000)),

    // Epoch-quota materialization: q162's allocations as per-doc copy
    // counts — full passes plus a hash-ordered partial-pass prefix (the
    // exact "source consumed 2.3x over" an epoch-building job executes).
    "q167_epoch_quotas" -> ((s, dir) =>
      CorpusOps.epochQuotas(
        Tables.load(s, dir, "documents").select(col("doc_id"), col("source"),
          graft.operators.TextAnalysis.tokenCount(col("text")).as("n")),
        "doc_id", "source", "n", weights = mixtureWeights,
        budgetPermille = 600, maxEpochsMilli = 1000)),

    // Packing-efficiency sweep: for candidate context lengths 128/256/512,
    // the bin count, padding slack, fill rate and mid-document cut count of
    // q92's concatenate-then-cut layout — one shared offset window, per-
    // budget arithmetic only.
    "q164_pack_efficiency" -> ((s, dir) =>
      CorpusOps.packEfficiencySweep(
        Tables.load(s, dir, "documents").select(col("doc_id"),
          graft.operators.TextAnalysis.tokenCount(col("text")).as("n")),
        "doc_id", "n", budgets = Seq(128, 256, 512), nShards = 4)),

    // Shard export manifest: per q111-shard doc count, token volume, and an
    // order-independent XOR membership checksum — the integrity artifact a
    // release ships so any re-materialized shard verifies by folding the
    // same per-id hashes. XOR commutes, so no ordering or buffering exists
    // anywhere in the plan.
    "q139_shard_manifest" -> ((s, dir) =>
      CorpusOps.shardManifest(Tables.load(s, dir, "documents"),
        "doc_id", "text", nShards = 16)),

    // Length-bucketed batch packing: docs routed to the smallest fitting
    // length bucket, hash-ordered, grouped into fixed-size batches; emits
    // the per-batch padding fraction the bucketing exists to minimize.
    "q115_length_batches" -> ((s, dir) =>
      CorpusOps.lengthBucketBatches(Tables.load(s, dir, "documents"),
        "doc_id", "text", batchSize = 8, bounds = Seq(16, 32, 64, 128))),

    // Per-source release manifest via the salted two-level combine — the
    // declared-query home of Skew.saltedCollect: every source key is hot by
    // construction, so partial id-lists build on (source, salt) across 16
    // tasks per source before the final per-source flatten (PlanSpec pins
    // the salted plan shape).
    "q122_source_manifest" -> ((s, dir) =>
      CorpusOps.sourceManifest(Tables.load(s, dir, "documents"),
        "doc_id", "source")),

    // Linear-counting distinct estimate — the oracle-checkable sketch
    // (md5 buckets reproduce in DuckDB), q71's verifiable sibling.
    "q95_linear_count" -> ((s, dir) =>
      graft.operators.Cardinality.linearCount(
        Tables.load(s, dir, "lineitem"), Seq("l_returnflag"), "l_partkey",
        m = 4096, out = "approx_parts")),

    // Publish-date delta postprocessor (chunk_etl_postprocessing/vaccinations
    // /queries.py PUBLISH_DATE_CALCULATION): today's per-(area, metric)
    // release sum minus yesterday's, clamped at 0, metric renamed
    // *ByVaccinationDate -> *ByPublishDate, rewrapped as {"value": n}.
    "q98_publish_delta" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      def release(filter: Column) = li.where(filter)
        .groupBy(col("l_suppkey").cast("string").as("area_code"),
          when(col("l_returnflag") === "A", "first")
            .when(col("l_returnflag") === "N", "second")
            .otherwise("third").as("dose"))
        .agg(max(to_date(col("l_shipdate"))).as("date"),
          sum("l_quantity").cast("double").as("value"))
      val today = release(lit(true))
      val yesterday = release(year(col("l_shipdate")) <= 1992)
        .select(col("area_code"), col("dose"), col("value").as("y_value"))
      val delta = (col("value") - col("y_value")).cast("long")
      today.join(yesterday, Seq("area_code", "dose"), "left")
        .select(col("area_code"),
          when(col("dose") === "first", "newPeopleVaccinatedFirstDoseByPublishDate")
            .when(col("dose") === "second", "newPeopleVaccinatedSecondDoseByPublishDate")
            .otherwise("newPeopleVaccinatedThirdInjectionByPublishDate").as("metric"),
          date_format(col("date"), "yyyy-MM-dd").as("date"),
          to_json(struct(when(delta < 0, 0L).otherwise(delta).as("value")),
            Map("ignoreNullFields" -> "false")).as("payload"))
    }),

    // Corpus-unigram log-prob quality score — the LM-based quality filter
    // over the documents table; avg of ln(token frequency / corpus total).
    "q97_unigram_logprob" -> ((s, dir) =>
      graft.operators.TextAnalysis.unigramLogProb(
        Tables.load(s, dir, "documents"), "doc_id", "text")),

    // CCNet-style perplexity-bucketed sampling: documents bucket into LM
    // log-prob quartiles (exact interpolated percentiles over the score
    // HISTOGRAM — bounded by distinct rounded scores, never raw rows), the
    // middle buckets keep everything, the templated head and garbled tail
    // are hash-downsampled. Composes three verified operators (q97 score,
    // q52 percentile arithmetic, q93 hash sampling) into the actual
    // pretraining cleaning stage; all decisions deterministic.
    "q117_perplexity_sample" -> ((s, dir) => {
      val lp = graft.operators.TextAnalysis.unigramLogProb(
        Tables.load(s, dir, "documents"), "doc_id", "text")
      // the corpus-wide group key is derived from an attribute (constant
      // but non-foldable), so the histogram window keeps a real partition
      // key — its input is the distinct-score histogram, never raw rows
      val allKey = concat(lit("all"),
        substring(col("doc_id").cast("string"), 1, 0))
      val qs = graft.operators.Serving.percentileCont(
        lp.withColumn("__g", allKey), Seq("__g"), "mean_logprob",
        Seq("q1" -> 0.25, "q2" -> 0.5, "q3" -> 0.75)).drop("__g")
      val rate = Map(0 -> 0.2, 1 -> 1.0, 2 -> 1.0, 3 -> 0.1)
      lp.crossJoin(broadcast(qs))
        .withColumn("bucket",
          when(col("mean_logprob") <= col("q1"), 0L)
            .when(col("mean_logprob") <= col("q2"), 1L)
            .when(col("mean_logprob") <= col("q3"), 2L)
            .otherwise(3L))
        .where(CorpusOps.hashUniform(col("doc_id")) <
          rate.foldLeft(lit(0d): Column) { case (acc, (b, r)) =>
            when(col("bucket") === b.toLong, lit(r)).otherwise(acc)
          })
        .select(col("doc_id"), col("bucket"), col("mean_logprob"))
    }),

    // The demographics route end to end THROUGH the router: an
    // age-demographics chunk feed dispatched by (category, subcategory) into
    // the full demographics pipeline — closes the third run_direct route
    // with the same oracle rigor as q68 (identical math, routed entry).
    "q96_routed_demographics" -> ((s, dir) => {
      val chunks = Tables.load(s, dir, "lineitem")
        .where(year(col("l_shipdate")) === 1995)
        .select(lit("cases-by-specimen-date").as("category"),
          lit("age-demographics").as("subcategory"),
          lit("supplier").as("areaType"),
          col("l_suppkey").cast("string").as("areaCode"),
          to_date(col("l_shipdate")).as("date"),
          col("l_returnflag").as("age"), col("l_quantity"))
        .groupBy("category", "subcategory", "areaType", "areaCode", "date", "age")
        .agg(sum("l_quantity").cast("double").as("newCases"))
      val pop = Tables.load(s, dir, "supplier")
        .select(col("s_suppkey").cast("string").as("areaCode"),
          abs(col("s_acctbal")).as("population"))
        .crossJoin(s.createDataFrame(Seq(Tuple1("A"), Tuple1("N"), Tuple1("R")))
          .toDF("age"))
      ChunkRouter.runRouted(chunks, Map(
        ChunkRouter.Demographics -> ChunkRouter.demographicsHandler(
          graft.pipeline.DemographicsPipeline.Spec("age", 1, "newCases", "cases",
            "newCasesAgeDemographics"), pop) _))
        .select(col("areaType"), col("areaCode"),
          date_format(col("date"), "yyyy-MM-dd").as("date"),
          to_json(transform(col("newCasesAgeDemographics"), x => struct(
            x.getField("age").as("age"),
            x.getField("cases").cast("long").as("cases"),
            x.getField("rollingSum").cast("long").as("rollingSum"),
            x.getField("rollingRate").cast("decimal(20,1)").as("rollingRate"))),
            Map("ignoreNullFields" -> "false")).as("newCasesAgeDemographics"))
    })
  )

  /** EAV-ish uptake fixture: lineitem daily sums as three dose metrics keyed
    * by return flag, with nulls every 7th day to exercise the NOTNULL filter. */
  private def uptakeFixture(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .groupBy(
        when(col("l_returnflag") === "A", "firstDose")
          .when(col("l_returnflag") === "N", "secondDose")
          .otherwise("thirdDose").as("metric"),
        col("l_suppkey").cast("string").as("area_code"),
        to_date(col("l_shipdate")).as("date"))
      .agg(sum("l_quantity").cast("double").as("value"))
      .withColumn("area_type", lit("supplier"))
      .withColumn("value",
        when(dayofmonth(col("date")) % 7 === 0, lit(null)).otherwise(col("value")))

  /** Nested demographics payload fixture: per supplier, an array of
    * age-keyed structs ('65+' from 'A' rows, others from 'N'/'R'). */
  private def waffleFixture(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .groupBy(col("l_suppkey"),
        when(col("l_returnflag") === "A", "65+")
          .when(col("l_returnflag") === "N", "50-64")
          .otherwise("under50").as("age"))
      .agg(sum("l_quantity").cast("double").as("cumPeopleVaccinated"),
        (sum("l_quantity") / 1000d).as("cumUptakePercentage"),
        max(to_date(col("l_shipdate"))).as("maxd"))
      .groupBy(col("l_suppkey"))
      .agg(sort_array(collect_list(struct(col("age"),
          col("cumPeopleVaccinated"), col("cumUptakePercentage")))).as("payload"),
        max("maxd").as("date"))
      .select(lit("supplier").as("area_type"),
        col("l_suppkey").cast("string").as("area_code"), col("date"), col("payload"))

  /** Announcements fixture from orders: launch/expire windows and the two
    * release-tie booleans derived deterministically from the order key. */
  private def announcementsFixture(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .select(col("o_orderkey").as("id"),
        to_date(col("o_orderdate")).as("launch"),
        date_add(to_date(col("o_orderdate")),
          (col("o_orderkey") % 90 + 1).cast("int")).as("expire"),
        (col("o_orderkey") % 2 === 0).as("deploy_with_release"),
        (col("o_orderkey") % 3 === 0).as("remove_with_release"),
        when(col("o_orderkey") % 5 === 0, lit(null).cast("date"))
          .otherwise(date_add(to_date(col("o_orderdate")), 1)).as("date"),
        col("o_orderstatus").as("body"))

  def oracles: Map[String, String] = Map(

    // identical math to q68 (the router adds dispatch, not arithmetic) —
    // share its oracle text rather than fork a 40-line CTE chain
    "q96_routed_demographics" -> MiscQueries.oracles("q68_demographics"),

    "q98_publish_delta" ->
      """WITH today AS (
        |  SELECT CAST(l_suppkey AS VARCHAR) AS area_code,
        |         CASE WHEN l_returnflag = 'A' THEN 'first'
        |              WHEN l_returnflag = 'N' THEN 'second'
        |              ELSE 'third' END AS dose,
        |         max(CAST(l_shipdate AS DATE)) AS date,
        |         CAST(SUM(l_quantity) AS DOUBLE) AS value
        |  FROM lineitem GROUP BY 1, 2
        |),
        |yesterday AS (
        |  SELECT CAST(l_suppkey AS VARCHAR) AS area_code,
        |         CASE WHEN l_returnflag = 'A' THEN 'first'
        |              WHEN l_returnflag = 'N' THEN 'second'
        |              ELSE 'third' END AS dose,
        |         CAST(SUM(l_quantity) AS DOUBLE) AS y_value
        |  FROM lineitem WHERE year(l_shipdate) <= 1992 GROUP BY 1, 2
        |)
        |SELECT t.area_code,
        |       CASE t.dose WHEN 'first' THEN 'newPeopleVaccinatedFirstDoseByPublishDate'
        |                   WHEN 'second' THEN 'newPeopleVaccinatedSecondDoseByPublishDate'
        |                   ELSE 'newPeopleVaccinatedThirdInjectionByPublishDate' END AS metric,
        |       strftime(t.date, '%Y-%m-%d') AS date,
        |       '{"value":' || COALESCE(CAST(
        |          CASE WHEN CAST(t.value - y.y_value AS BIGINT) < 0 THEN 0
        |               ELSE CAST(t.value - y.y_value AS BIGINT) END AS VARCHAR), 'null')
        |       || '}' AS payload
        |FROM today t LEFT JOIN yesterday y USING (area_code, dose)""".stripMargin,

    "q97_unigram_logprob" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
        |),
        |freqs AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY 1),
        |total AS (SELECT SUM(cnt) AS t FROM freqs)
        |SELECT doc_id,
        |       round(AVG(ln(CAST(cnt AS DOUBLE) / t)), 4) AS mean_logprob
        |FROM toks JOIN freqs USING (tok), total
        |GROUP BY doc_id""".stripMargin,

    // Quartile thresholds use the explicit rank-interpolation spelling (the
    // q52 idiom) so the arithmetic is bit-identical to the Spark side.
    "q117_perplexity_sample" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
        |),
        |freqs AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY 1),
        |total AS (SELECT SUM(cnt) AS t FROM freqs),
        |lp AS (
        |  SELECT doc_id,
        |         round(AVG(ln(CAST(cnt AS DOUBLE) / t)), 4) AS mean_logprob
        |  FROM toks JOIN freqs USING (tok), total
        |  GROUP BY doc_id
        |),
        |ranked AS (
        |  SELECT mean_logprob,
        |         row_number() OVER (ORDER BY mean_logprob) AS rn,
        |         COUNT(*) OVER () AS n
        |  FROM lp
        |),
        |q AS (
        |  SELECT
        |    max(CASE WHEN rn = floor(0.25*(n-1)+1) THEN mean_logprob END)
        |      + (max(CASE WHEN rn = ceil(0.25*(n-1)+1) THEN mean_logprob END)
        |         - max(CASE WHEN rn = floor(0.25*(n-1)+1) THEN mean_logprob END))
        |        * max(0.25*(n-1)+1 - floor(0.25*(n-1)+1)) AS q1,
        |    max(CASE WHEN rn = floor(0.5*(n-1)+1) THEN mean_logprob END)
        |      + (max(CASE WHEN rn = ceil(0.5*(n-1)+1) THEN mean_logprob END)
        |         - max(CASE WHEN rn = floor(0.5*(n-1)+1) THEN mean_logprob END))
        |        * max(0.5*(n-1)+1 - floor(0.5*(n-1)+1)) AS q2,
        |    max(CASE WHEN rn = floor(0.75*(n-1)+1) THEN mean_logprob END)
        |      + (max(CASE WHEN rn = ceil(0.75*(n-1)+1) THEN mean_logprob END)
        |         - max(CASE WHEN rn = floor(0.75*(n-1)+1) THEN mean_logprob END))
        |        * max(0.75*(n-1)+1 - floor(0.75*(n-1)+1)) AS q3
        |  FROM ranked
        |),
        |b AS (
        |  SELECT doc_id, mean_logprob,
        |         CAST(CASE WHEN mean_logprob <= q1 THEN 0
        |                   WHEN mean_logprob <= q2 THEN 1
        |                   WHEN mean_logprob <= q3 THEN 2
        |                   ELSE 3 END AS BIGINT) AS bucket
        |  FROM lp, q
        |)
        |SELECT doc_id, bucket, mean_logprob FROM b
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |        / 4294967296.0
        |      < CASE bucket WHEN 0 THEN 0.2 WHEN 1 THEN 1.0
        |                    WHEN 2 THEN 1.0 ELSE 0.1 END""".stripMargin,

    "q95_linear_count" ->
      """WITH b AS (
        |  SELECT l_returnflag,
        |         ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8))::BIGINT % 4096 AS bucket
        |  FROM lineitem
        |),
        |f AS (
        |  SELECT l_returnflag, COUNT(DISTINCT bucket) AS filled FROM b GROUP BY 1
        |)
        |SELECT l_returnflag,
        |       CASE WHEN filled < 4096 THEN
        |         CAST(round(-4096.0 * ln((4096.0 - filled) / 4096)) AS BIGINT)
        |       END AS approx_parts
        |FROM f""".stripMargin,

    "q110_temperature_mix" ->
      """WITH t AS (
        |  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
        |  FROM documents
        |),
        |tot AS (
        |  SELECT source, SUM(n_tokens) AS src_tokens,
        |         CAST(round(pow(CAST(SUM(n_tokens) AS DOUBLE), 0.5) * 1e6)
        |              AS HUGEINT) AS wq
        |  FROM t GROUP BY source
        |),
        |r AS (
        |  SELECT source,
        |         least(1.0, 6000.0 * CAST(wq AS DOUBLE)
        |           / CAST((SELECT SUM(wq) FROM tot) AS DOUBLE)
        |           / CAST(src_tokens AS DOUBLE)) AS keep_rate
        |  FROM tot
        |)
        |SELECT t.doc_id, t.source, CAST(t.n_tokens AS BIGINT) AS n_tokens
        |FROM t JOIN r USING (source)
        |WHERE ('0x' || substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 8))::BIGINT
        |        / 4294967296.0
        |      < keep_rate""".stripMargin,

    "q111_corpus_shuffle" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         md5('shuffle|' || CAST(doc_id AS VARCHAR)) AS k,
        |         ('0x' || substr(md5('shuffle|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8 AS shard
        |  FROM documents
        |)
        |SELECT doc_id, shard,
        |       CAST(row_number() OVER (PARTITION BY shard ORDER BY k, doc_id)
        |            AS INT) AS pos
        |FROM t""".stripMargin,

    "q159_epoch_orders" ->
      """WITH e AS (
        |  SELECT doc_id, unnest(generate_series(0, 2)) AS epoch FROM documents
        |),
        |t AS (
        |  SELECT doc_id, CAST(epoch AS BIGINT) AS epoch,
        |         md5('epoch|' || CAST(epoch AS VARCHAR) || '|' || CAST(doc_id AS VARCHAR)) AS k,
        |         ('0x' || substr(md5('epoch|' || CAST(epoch AS VARCHAR) || '|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8 AS shard
        |  FROM e
        |)
        |SELECT doc_id, epoch, shard,
        |       CAST(row_number() OVER (PARTITION BY epoch, shard ORDER BY k, doc_id)
        |            AS INT) AS pos
        |FROM t""".stripMargin,

    // q92's running-offset spine (budget-independent), then per-budget
    // integer arithmetic: cuts per doc, ceil-bins per shard.
    "q164_pack_efficiency" ->
      """WITH d AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
        |         doc_id % 4 AS shard
        |  FROM documents
        |),
        |o AS (
        |  SELECT *, COALESCE(SUM(n) OVER (PARTITION BY shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
        |  FROM d
        |),
        |b AS (SELECT CAST(unnest([128, 256, 512]) AS BIGINT) AS budget),
        |pd AS (
        |  SELECT budget, n,
        |         ((o + n - 1) // budget) - (o // budget) AS cuts
        |  FROM o CROSS JOIN b WHERE n > 0
        |),
        |agg AS (
        |  SELECT budget, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |         CAST(SUM(n) AS BIGINT) AS total_tokens,
        |         CAST(SUM(CASE WHEN cuts > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_cut_docs,
        |         CAST(SUM(cuts) AS BIGINT) AS n_cuts
        |  FROM pd GROUP BY 1
        |),
        |st AS (SELECT shard, SUM(n) AS st FROM o WHERE n > 0 GROUP BY 1),
        |bins AS (
        |  SELECT budget, CAST(SUM((st + budget - 1) // budget) AS BIGINT) AS n_bins
        |  FROM st CROSS JOIN b GROUP BY 1
        |)
        |SELECT a.budget, a.n_docs, a.total_tokens, bins.n_bins,
        |       bins.n_bins * a.budget - a.total_tokens AS padded_tokens,
        |       (a.total_tokens * 1000) // (bins.n_bins * a.budget) AS fill_milli,
        |       a.n_cut_docs, a.n_cuts
        |FROM agg a JOIN bins USING (budget)""".stripMargin,

    "q162_mixture_plan" -> (mixtureAllocCtes +
      """
        |SELECT source, a AS available_tokens, w AS weight, cap AS cap_tokens,
        |       capped, alloc AS allocated_tokens,
        |       CASE WHEN a > 0 THEN (alloc * 1000) // a END AS epochs_milli
        |FROM alloc""".stripMargin),

    // the q162 alloc chain + full/partial split: full passes = alloc // a,
    // the remainder filled by the q94 hash-ordered greedy prefix
    "q167_epoch_quotas" -> (mixtureAllocCtes +
      """,
        |q AS (
        |  SELECT source, a AS avail, alloc,
        |         alloc // a AS n_full_copies,
        |         alloc - (alloc // a) * a AS rem
        |  FROM alloc WHERE a > 0
        |),
        |d2 AS (
        |  SELECT doc_id, source,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |         SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) OVER (
        |           PARTITION BY source
        |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM documents
        |)
        |SELECT d2.doc_id, d2.source, d2.n_tokens, q.n_full_copies,
        |       d2.cum <= q.rem AS in_partial,
        |       q.n_full_copies + CASE WHEN d2.cum <= q.rem THEN 1 ELSE 0 END AS n_copies
        |FROM d2 JOIN q USING (source)""".stripMargin),

    "q122_source_manifest" ->
      """SELECT source,
        |       CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS manifest
        |FROM documents GROUP BY source""".stripMargin,

    "q139_shard_manifest" ->
      """WITH d AS (
        |  SELECT ('0x' || substr(md5('shuffle|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 16 AS shard,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |         ('0x' || substr(md5('id:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM documents
        |)
        |SELECT shard,
        |       CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
        |       CAST(bit_xor(h) AS BIGINT) AS ids_xor
        |FROM d GROUP BY shard""".stripMargin,

    "q115_length_batches" ->
      """WITH d AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
        |         md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents
        |),
        |b AS (
        |  SELECT doc_id, n, h,
        |         CASE WHEN n <= 16 THEN 16 WHEN n <= 32 THEN 32
        |              WHEN n <= 64 THEN 64 WHEN n <= 128 THEN 128
        |              ELSE 1073741824 END AS bucket
        |  FROM d
        |),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY bucket ORDER BY h, doc_id) AS rn
        |  FROM b
        |)
        |SELECT CAST(bucket AS BIGINT) AS bucket,
        |       CAST(floor((rn - 1) / 8.0) AS BIGINT) AS batch,
        |       COUNT(*) AS n_docs,
        |       MAX(n) AS max_tokens,
        |       CAST(SUM(n) AS BIGINT) AS sum_tokens,
        |       round(1 - CAST(SUM(n) AS DOUBLE) / CAST(MAX(n) * COUNT(*) AS DOUBLE), 4)
        |         AS padding_frac
        |FROM r GROUP BY 1, 2""".stripMargin,

    "q92_pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
        |         doc_id % 4 AS shard
        |  FROM documents
        |),
        |c AS (
        |  SELECT *, COALESCE(SUM(n_tokens) OVER (
        |    PARTITION BY shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |  FROM t
        |)
        |SELECT doc_id, shard, CAST(n_tokens AS BIGINT) AS n_tokens,
        |       CAST(floor(cum_before / 512) AS BIGINT) AS bin,
        |       CAST(cum_before % 512 AS BIGINT) AS "offset"
        |FROM c""".stripMargin,

    "q93_stratified_sample" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |        / 4294967296.0
        |      < CASE lang WHEN 'en' THEN 0.5 WHEN 'fr' THEN 1.0
        |                  WHEN 'de' THEN 0.25 ELSE 0.1 END""".stripMargin,

    "q94_source_cap" ->
      """WITH t AS (
        |  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens,
        |         md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents
        |),
        |c AS (
        |  SELECT doc_id, source, n_tokens,
        |         SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
        |  FROM t
        |)
        |SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
        |       CAST(cum_tokens AS BIGINT) AS cum_tokens
        |FROM c WHERE cum_tokens <= 2000""".stripMargin,

    "q89_uptake_triple" ->
      """WITH long AS (
        |  SELECT CASE WHEN l_returnflag = 'A' THEN 'firstDose'
        |              WHEN l_returnflag = 'N' THEN 'secondDose'
        |              ELSE 'thirdDose' END AS metric,
        |         CAST(l_suppkey AS VARCHAR) AS area_code,
        |         CAST(l_shipdate AS DATE) AS date,
        |         CAST(SUM(l_quantity) AS DOUBLE) AS value0
        |  FROM lineitem GROUP BY 1, 2, 3
        |),
        |lv AS (
        |  SELECT metric, 'supplier' AS area_type, area_code, date,
        |         CASE WHEN day(date) % 7 = 0 THEN NULL ELSE value0 END AS value
        |  FROM long
        |),
        |anch AS (SELECT CAST(max(date) - INTERVAL 20 DAY AS DATE) AS a FROM lv),
        |w AS (
        |  SELECT lv.* FROM lv, anch WHERE lv.date > anch.a AND lv.value IS NOT NULL
        |),
        |f AS (
        |  SELECT area_type AS f_area_type, area_code AS f_area_code,
        |         max(date) AS f_date, max(value) AS f_dose
        |  FROM w WHERE metric = 'firstDose' GROUP BY 1, 2
        |),
        |s AS (
        |  SELECT area_code AS s_area_code, max(date) AS s_date, max(value) AS s_dose
        |  FROM w WHERE metric = 'secondDose' GROUP BY 1
        |),
        |t AS (
        |  SELECT area_code AS t_area_code, max(date) AS t_date, max(value) AS t_dose
        |  FROM w WHERE metric = 'thirdDose' GROUP BY 1
        |)
        |SELECT f_area_type AS area_type, f_area_code AS area_code,
        |       strftime(MAX(f_date), '%Y-%m-%d') AS date,
        |       CASE WHEN MAX(f_dose) IS NULL THEN 0
        |            ELSE CAST(MAX(FLOOR(f_dose)) AS INT) END AS first_dose,
        |       CASE WHEN MAX(s_dose) IS NULL THEN 0
        |            ELSE CAST(MAX(FLOOR(s_dose)) AS INT) END AS second_dose,
        |       CASE WHEN MAX(t_dose) IS NULL THEN 0
        |            ELSE CAST(MAX(FLOOR(t_dose)) AS INT) END AS third_dose
        |FROM f
        |FULL JOIN s ON f_date = s_date AND f_area_code = s_area_code
        |FULL JOIN t ON f_date = t_date AND f_area_code = t_area_code
        |GROUP BY f_area_type, f_area_code""".stripMargin,

    "q90_waffle_65plus" ->
      """WITH ages AS (
        |  SELECT l_suppkey,
        |         CASE WHEN l_returnflag = 'A' THEN '65+'
        |              WHEN l_returnflag = 'N' THEN '50-64'
        |              ELSE 'under50' END AS age,
        |         CAST(SUM(l_quantity) AS DOUBLE) AS people,
        |         CAST(SUM(l_quantity) AS DOUBLE) / 1000 AS pct,
        |         max(CAST(l_shipdate AS DATE)) AS maxd
        |  FROM lineitem GROUP BY 1, 2
        |),
        |agg AS (
        |  SELECT l_suppkey, max(maxd) AS date,
        |         max(CASE WHEN age = '65+' THEN people END) AS p65,
        |         max(CASE WHEN age = '65+' THEN pct END) AS u65
        |  FROM ages GROUP BY 1
        |)
        |SELECT 'supplier' AS area_type, CAST(l_suppkey AS VARCHAR) AS area_code,
        |       strftime(date, '%Y-%m-%d') AS date,
        |       CAST(trunc(COALESCE(round(p65, 1), 0)) AS INT) AS vaccination_date,
        |       CAST(trunc(COALESCE(round(u65, 1), 0)) AS INT) AS vaccination_date_percentage_dose
        |FROM agg""".stripMargin,

    "q91_announcements" ->
      """WITH ann AS (
        |  SELECT o_orderkey AS id,
        |         CAST(o_orderdate AS DATE) AS launch,
        |         CAST(o_orderdate AS DATE) + CAST(o_orderkey % 90 + 1 AS INT) AS expire,
        |         (o_orderkey % 2 = 0) AS deploy_with_release,
        |         (o_orderkey % 3 = 0) AS remove_with_release,
        |         CASE WHEN o_orderkey % 5 = 0 THEN NULL
        |              ELSE CAST(o_orderdate AS DATE) + 1 END AS date,
        |         o_orderstatus AS body
        |  FROM orders
        |),
        |rel AS (SELECT CAST(max(launch) - INTERVAL 30 DAY AS DATE) AS r FROM ann)
        |SELECT CAST(id AS VARCHAR) AS id,
        |       strftime(launch, '%Y-%m-%d') AS launch,
        |       strftime(expire, '%Y-%m-%d') AS expire,
        |       strftime(COALESCE(date, launch), '%Y-%m-%d') AS date,
        |       body
        |FROM ann, rel
        |WHERE ((deploy_with_release AND launch <= r)
        |       OR (NOT deploy_with_release AND launch <= r + 2))
        |  AND ((remove_with_release AND expire > r)
        |       OR (NOT remove_with_release AND expire > r + 2))
        |ORDER BY launch DESC, expire DESC""".stripMargin,

    "q88_run_direct" ->
      """WITH chunks AS (
        |  SELECT CASE WHEN l_returnflag = 'A' THEN 'cases'
        |              WHEN l_returnflag = 'N' THEN 'vaccinations-by-vaccination-date'
        |              ELSE 'variants' END AS category,
        |         CAST(l_suppkey AS VARCHAR) AS areaCode,
        |         CAST(l_shipdate AS DATE) AS date,
        |         CAST(SUM(l_quantity) AS DOUBLE) AS newCases
        |  FROM lineitem GROUP BY 1, 2, 3
        |),
        |c2 AS (
        |  SELECT *, CASE WHEN day(date) % 5 = 0 THEN newCases END AS cumVax
        |  FROM chunks
        |),
        |-- 'variants' has no handler (subcategory is null) -> dropped
        |direct AS (SELECT * FROM c2 WHERE category = 'cases'),
        |msoa AS (SELECT * FROM c2 WHERE category = 'vaccinations-by-vaccination-date'),
        |db AS (SELECT category, min(date) AS lo, max(date) AS hi FROM direct GROUP BY 1),
        |ddates AS (
        |  SELECT category, CAST(unnest(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS date
        |  FROM db
        |),
        |ddense AS (
        |  SELECT k.category, k.areaCode, d.date, dir.newCases
        |  FROM (SELECT DISTINCT category, areaCode FROM direct) k
        |  JOIN ddates d USING (category)
        |  LEFT JOIN direct dir ON dir.category = k.category
        |   AND dir.areaCode = k.areaCode AND dir.date = d.date
        |),
        |dzf AS (
        |  SELECT category, areaCode, date,
        |         CASE WHEN date >= min(CASE WHEN newCases IS NOT NULL THEN date END) OVER g
        |               AND date <  max(CASE WHEN newCases IS NOT NULL THEN date END) OVER g
        |              THEN COALESCE(newCases, 0) ELSE newCases END AS newCases
        |  FROM ddense WINDOW g AS (PARTITION BY category, areaCode)
        |),
        |droll AS (
        |  SELECT *, CASE WHEN COUNT(newCases) OVER w7 = 7 THEN SUM(newCases) OVER w7 END AS rollingSum
        |  FROM dzf
        |  WINDOW w7 AS (PARTITION BY category, areaCode ORDER BY date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |),
        |mb AS (SELECT category, min(date) AS lo, max(date) AS hi FROM msoa GROUP BY 1),
        |mdates AS (
        |  SELECT category, CAST(unnest(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS date
        |  FROM mb
        |),
        |mdense AS (
        |  SELECT k.category, k.areaCode, d.date, m.newCases, m.cumVax
        |  FROM (SELECT DISTINCT category, areaCode FROM msoa) k
        |  JOIN mdates d USING (category)
        |  LEFT JOIN msoa m ON m.category = k.category
        |   AND m.areaCode = k.areaCode AND m.date = d.date
        |),
        |mfill AS (
        |  SELECT category, areaCode, date,
        |         CASE WHEN date >= min(CASE WHEN newCases IS NOT NULL THEN date END) OVER g
        |               AND date <  max(CASE WHEN newCases IS NOT NULL THEN date END) OVER g
        |              THEN COALESCE(newCases, 0) ELSE newCases END AS newCases,
        |         CASE WHEN date >= min(CASE WHEN cumVax IS NOT NULL THEN date END) OVER g
        |               AND date <  max(CASE WHEN cumVax IS NOT NULL THEN date END) OVER g
        |              THEN COALESCE(cumVax,
        |                last_value(cumVax IGNORE NULLS) OVER (g ORDER BY date ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |              ELSE cumVax END AS cumVax
        |  FROM mdense WINDOW g AS (PARTITION BY category, areaCode)
        |)
        |SELECT category, areaCode, strftime(date, '%Y-%m-%d') AS date,
        |       'newCases' AS metric, newCases AS value FROM droll
        |UNION ALL
        |SELECT category, areaCode, strftime(date, '%Y-%m-%d'),
        |       'newCasesRollingSum', rollingSum FROM droll
        |UNION ALL
        |SELECT category, areaCode, strftime(date, '%Y-%m-%d'),
        |       'newCases', newCases FROM mfill
        |UNION ALL
        |SELECT category, areaCode, strftime(date, '%Y-%m-%d'),
        |       'cumVax', cumVax FROM mfill""".stripMargin
  )
}
