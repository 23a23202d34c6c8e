package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Core, RefFunctions => F}
import graft.sources.Tables

import Shared._

/** SQL/function surface: HOFs, rank family, string/datetime/null/bitwise, IR metrics. Split from the single-file catalog in round 8;
  * query text unchanged. Registration stays in [[QueryCatalog.all]]. */
private[queries] object CatalogSqlSurface {


  /** Positional explode — `posexplode` keeps each token's 0-based offset,
    * the primitive under positional n-grams and span math (q55/q78 recompute
    * positions with a window; this is the direct form). DuckDB twin: two
    * `unnest`s in one SELECT zip positionally, `range(len(...))` supplying
    * the offsets. Empty tokens are filtered AFTER position assignment on
    * both sides, so offsets stay original. Spark's pos is INT, DuckDB's
    * range is BIGINT — cast to long. Map-side only, zero shuffles. */
  private val q100 = Q(
    "q100_posexplode",
    (s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .withColumnRenamed("col", "tok")
        .filter(col("tok") =!= "")
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("tok"))
    },
    Some("""
      SELECT doc_id, pos, tok FROM (
        SELECT doc_id,
          unnest(range(len(string_split(text, ' ')))) AS pos,
          unnest(string_split(text, ' ')) AS tok
        FROM documents)
      WHERE tok <> ''"""))

  /** The ranking-function family over a key WITH ties (rank ≠ dense_rank):
    * rank, dense_rank, percent_rank, cume_dist per market segment over a
    * coarsened balance bucket. All four are pure functions of the key
    * VALUES, so ties don't make them nondeterministic — no tiebreak column
    * needed (q08/q09's rule applies to row_number, which isn't). The
    * bucket is floor(cents/1e5) via explicit DOUBLE division — Spark's `/`
    * on longs is already double division, DuckDB's `/` must be fed a
    * double to match. percent_rank/cume_dist are exact-int ratios, same
    * single division both engines, rounded r6 as belt-and-braces. */
  private val q101 = Q(
    "q101_rank_family",
    (s, d) => {
      val cents = floor(col("c_acctbal") * 100 + 0.5).cast("long")
      val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("bal_k"))
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"),
          floor(cents.cast("double") / 100000.0).cast("long").as("bal_k"))
        .select(col("c_custkey"), col("c_mktsegment"), col("bal_k"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          r(percent_rank().over(w), 6).as("prnk"),
          r(cume_dist().over(w), 6).as("cdist"))
    },
    Some("""
      WITH c AS (
        SELECT c_custkey, c_mktsegment,
          CAST(floor(CAST(floor(c_acctbal*100 + 0.5) AS BIGINT)::DOUBLE / 100000.0) AS BIGINT) AS bal_k
        FROM customer)
      SELECT c_custkey, c_mktsegment, bal_k,
        CAST(rank() OVER w AS BIGINT) AS rnk,
        CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        floor(percent_rank() OVER w * 1000000 + 0.5)/1000000 AS prnk,
        floor(cume_dist() OVER w * 1000000 + 0.5)/1000000 AS cdist
      FROM c
      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY bal_k)"""))

  /** String-function surface: upper/reverse/lpad/translate/repeat/instr/
    * substring_index/concat_ws/length on ASCII keys — every pair verified
    * to share semantics (1-based instr/strpos; substring_index(-1) ==
    * split_part(..., 2) when the separator occurs once; no locale
    * dependence on ASCII). Int-returning functions cast to long both
    * sides. Pure projection — predicate-free narrow scan, no shuffle. */
  private val q102 = Q(
    "q102_string_surface",
    (s, d) => {
      Tables.customer(s, d).select(
        col("c_custkey"),
        upper(col("c_name")).as("uname"),
        reverse(col("c_name")).as("rname"),
        lpad(col("c_name"), 22, "*").as("padded"),
        translate(col("c_name"), "Cr#", "Kx_").as("translated"),
        repeat(substring(col("c_name"), 1, 3), 2).as("rep"),
        instr(col("c_name"), "#").cast("long").as("hash_pos"),
        substring_index(col("c_name"), "#", -1).as("cust_num"),
        concat_ws("-", col("c_name"), col("c_mktsegment")).as("tagged"),
        length(col("c_name")).cast("long").as("name_len"))
    },
    Some("""
      SELECT c_custkey,
        upper(c_name) AS uname,
        reverse(c_name) AS rname,
        lpad(c_name, 22, '*') AS padded,
        translate(c_name, 'Cr#', 'Kx_') AS translated,
        repeat(substring(c_name, 1, 3), 2) AS rep,
        CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos,
        split_part(c_name, '#', 2) AS cust_num,
        concat_ws('-', c_name, c_mktsegment) AS tagged,
        CAST(length(c_name) AS BIGINT) AS name_len
      FROM customer"""))

  /** Date/time-function surface over midnight-aligned order timestamps:
    * year/quarter/month/day extraction, ISO week, day-of-week, month
    * truncation, last_day, day difference from an epoch. The two numbering
    * traps are compensated IN THE TWIN and documented here: Spark's
    * dayofweek is 1=Sunday vs DuckDB's 0=Sunday (+1 in the twin), and both
    * weekofyear are ISO-8601 (Jan 1 1995 → week 52). Spark's `trunc`
    * returns DATE like DuckDB's date_trunc-on-timestamp does — using
    * Spark's date_trunc (TIMESTAMP return) would schema-mismatch. */
  private val q103 = Q(
    "q103_datetime_surface",
    (s, d) => {
      val od = col("o_orderdate")
      Tables.orders(s, d).select(
        col("o_orderkey"),
        year(od).cast("long").as("yr"),
        quarter(od).cast("long").as("qtr"),
        month(od).cast("long").as("mon"),
        dayofmonth(od).cast("long").as("dom"),
        weekofyear(od).cast("long").as("iso_week"),
        dayofweek(od).cast("long").as("dow1"),
        trunc(od, "month").as("month_start"),
        last_day(od).as("month_end"),
        datediff(od, lit("1992-01-01")).cast("long").as("days_since"))
    },
    Some("""
      SELECT o_orderkey,
        CAST(year(o_orderdate) AS BIGINT) AS yr,
        CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        CAST(month(o_orderdate) AS BIGINT) AS mon,
        CAST(dayofmonth(o_orderdate) AS BIGINT) AS dom,
        CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
        CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow1,
        date_trunc('month', o_orderdate) AS month_start,
        last_day(o_orderdate) AS month_end,
        CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS days_since
      FROM orders"""))

  /** Conditional/boolean aggregate surface: count_if, bool_or, bool_and,
    * and exact interpolated median — one hash aggregate, map-side partials
    * for all four. The threshold tests run on exact BIGINT cents (a DOUBLE
    * threshold compare would be the same IEEE op anyway, but cents keep it
    * trivially exact); median of BIGINTs interpolates two exact ints with
    * one division — identical both engines at this magnitude (< 2^52). */
  private val q104 = Q(
    "q104_conditional_agg",
    (s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderpriority"), col("o_orderstatus"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n"),
          count_if(col("cents") > lit(20000000L)).as("n_big"),
          bool_or(col("o_orderstatus") === "F").as("any_f"),
          bool_and(col("cents") > lit(0L)).as("all_pos"),
          median(col("cents")).as("med_cents"))
    },
    Some("""
      SELECT o_orderpriority,
        count(*) AS n,
        count(*) FILTER (WHERE cents > 20000000) AS n_big,
        bool_or(o_orderstatus = 'F') AS any_f,
        bool_and(cents > 0) AS all_pos,
        CAST(median(cents) AS DOUBLE) AS med_cents
      FROM (
        SELECT o_orderpriority, o_orderstatus,
          CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents
        FROM orders)
      GROUP BY 1"""))

  /** Lexical diversity — type-token ratio and hapax-legomenon count per
    * document, the vocabulary-richness quality signal q25's score doesn't
    * carry (its stopword/length ratios can't see a doc that repeats a
    * rich-looking 10-word loop). Two hash aggregates, (doc,tok) then doc;
    * the first's map-side combine collapses token repeats before the
    * shuffle, so bytes moved are per-doc VOCAB, not token count. */
  private val q105 = Q(
    "q105_lexical_diversity",
    (s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("doc_id"))
        .agg(
          sum(col("cnt")).as("n_tok"),
          count(lit(1)).as("n_uniq"),
          count_if(col("cnt") === 1).as("hapax"))
        .select(col("doc_id"), col("n_tok"), col("n_uniq"), col("hapax"),
          r(col("n_uniq").cast("double") / col("n_tok").cast("double"), 6).as("ttr"))
    },
    Some("""
      WITH tc AS (
        SELECT doc_id, tok, count(*) AS cnt FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        WHERE tok <> '' GROUP BY 1, 2)
      SELECT doc_id,
        CAST(sum(cnt) AS BIGINT) AS n_tok,
        count(*) AS n_uniq,
        count(*) FILTER (WHERE cnt = 1) AS hapax,
        floor(count(*)::DOUBLE / CAST(sum(cnt) AS BIGINT)::DOUBLE * 1000000 + 0.5)/1000000 AS ttr
      FROM tc GROUP BY 1"""))

  /** Per-group feature normalization (z-score) — the q99 exact-sufficient-
    * statistics discipline applied to the join-back shape: per-language
    * (n, Σx, Σx²) as exact BIGINTs, broadcast back (languages are a
    * bounded dim), sample variance and z computed in the same double ops
    * both engines. This is the feature-scaling pass a training pipeline
    * runs before thresholding per-language length outliers; built-in
    * stddev_samp is the Welford trap q86 documents. */
  private val q106 = Q(
    "q106_zscore_normalize",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("x"))
      val stats = docs.groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("x") * col("x")).as("sxx"))
      val n = col("n").cast("double")
      val sx = col("sx").cast("double"); val sxx = col("sxx").cast("double")
      val mean = sx / n
      val variance = (n * sxx - sx * sx) / (n * (n - lit(1.0)))
      docs.join(broadcast(stats), "lang")
        .select(col("doc_id"), col("lang"), col("x").as("n_tok"),
          r((col("x").cast("double") - mean) / sqrt(variance), 6).as("z"))
    },
    Some("""
      WITH docs AS (
        SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS x
        FROM documents),
      stats AS (
        SELECT lang, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
          CAST(sum(x*x) AS BIGINT) AS sxx
        FROM docs GROUP BY 1)
      SELECT doc_id, lang, x AS n_tok,
        floor((x::DOUBLE - sx::DOUBLE / n::DOUBLE)
          / sqrt((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                 / (n::DOUBLE * (n::DOUBLE - 1.0)))
          * 1000000 + 0.5)/1000000 AS z
      FROM docs JOIN stats USING (lang)"""))

  /** Per-dimension min-max scaling of embeddings, array rebuilt in place —
    * the column-wise feature scaling that has to TRANSPOSE: posexplode to
    * (vec, dim, v), 64-row dim stats, broadcast back, regroup with a
    * sorted-struct collect so element order is rebuilt deterministically
    * (collect_list alone is arrival-ordered — the q34 canonicalization
    * rule). Scaled values become integer MICRO-UNITS (floor(x*1e6+0.5) as
    * BIGINT) and the rebuilt array is array_join'd to one '|' string: the
    * driver's pandas comparator cannot sort/hash top-level ndarray cells
    * (r5 oracle err), and long→string formatting is byte-identical across
    * engines where double→string is not. At 100 TB the stats pass is a
    * 64-row aggregate and the rebuild one shuffle on vec_id. */
  private val q107 = Q(
    "q107_minmax_scale",
    (s, d) => {
      val ex = Tables.embeddings(s, d)
        .select(col("vec_id"), posexplode(col("embedding")))
        .select(col("vec_id"), col("pos").as("dim"), col("col").cast("double").as("v"))
      val stats = ex.groupBy(col("dim"))
        .agg(min(col("v")).as("dmin"), max(col("v")).as("dmax"))
      ex.join(broadcast(stats), "dim")
        .withColumn("scaled_u",
          floor((col("v") - col("dmin")) / (col("dmax") - col("dmin")) * 1000000 + 0.5)
            .cast("long"))
        .groupBy(col("vec_id"))
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("dim"), col("scaled_u")))),
          x => x.getField("scaled_u").cast("string")), "|").as("scaled_vec"))
    },
    Some("""
      WITH ex AS (
        SELECT vec_id,
          unnest(range(len(embedding))) AS dim,
          CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings),
      stats AS (SELECT dim, min(v) AS dmin, max(v) AS dmax FROM ex GROUP BY 1)
      SELECT vec_id,
        array_to_string(
          array_agg(CAST(floor((v - dmin)/(dmax - dmin) * 1000000 + 0.5) AS BIGINT)
                    ORDER BY dim), '|') AS scaled_vec
      FROM ex JOIN stats USING (dim)
      GROUP BY 1"""))

  /** PMI token co-occurrence over a bounded vocabulary — the collocation
    * signal ("New York" vs chance) that feeds phrase mining. Shape is the
    * scale story: distinct (doc, tok) first (map-side combine), semi-join
    * against a top-50-df vocab (broadcast, deterministic df/tok tiebreak)
    * BEFORE the doc-keyed self-join, so pair fan-out is bounded by
    * vocab-tokens-per-doc², never raw doc length². The doc count enters
    * as a 1-row cross join (a literal at execution), ln() on an exact
    * integer ratio is the same IEEE op both sides. */
  private val q108 = Q(
    "q108_pmi_cooccur",
    (s, d) => {
      // Round-13: doctok fans out to the df aggregate (→vocab) and both
      // sides of the co-occurrence self-join — pruned to different
      // column sets, each was a fresh explode+distinct corpus pass.
      // One localCheckpoint of the distinct (doc, token) set feeds all
      // consumers; recomputed per invocation.
      val doctok = spreadSingleFileFixture(s, Tables.documents(s, d), "doc_id")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .distinct()
        .localCheckpoint(true)
      val df = doctok.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val vocab = df.orderBy(col("df").desc, col("tok").asc).limit(50)
      val nd = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
      val vt = doctok.join(broadcast(vocab), "tok")
      val a = vt.select(col("doc_id"), col("tok").as("tok_a"), col("df").as("df_a"))
      val b = vt.select(col("doc_id"), col("tok").as("tok_b"), col("df").as("df_b"))
      a.join(b, Seq("doc_id")).filter(col("tok_a") < col("tok_b"))
        .groupBy(col("tok_a"), col("tok_b"), col("df_a"), col("df_b"))
        .agg(count(lit(1)).as("c_ab"))
        .filter(col("c_ab") >= 5)
        .crossJoin(broadcast(nd))
        .select(col("tok_a"), col("tok_b"), col("c_ab"), col("df_a"), col("df_b"),
          r(log(col("c_ab").cast("double") * col("n_docs").cast("double") /
            (col("df_a").cast("double") * col("df_b").cast("double"))), 6).as("pmi"))
    },
    Some("""
      WITH doctok AS (
        SELECT DISTINCT doc_id, tok FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        WHERE tok <> ''),
      df AS (SELECT tok, count(*) AS df FROM doctok GROUP BY 1),
      vocab AS (SELECT tok, df FROM df ORDER BY df DESC, tok ASC LIMIT 50),
      nd AS (SELECT count(*) AS n_docs FROM documents),
      vt AS (SELECT doc_id, doctok.tok, df FROM doctok JOIN vocab USING (tok)),
      pairs AS (
        SELECT a.tok AS tok_a, b.tok AS tok_b, a.df AS df_a, b.df AS df_b,
          count(*) AS c_ab
        FROM vt a JOIN vt b ON a.doc_id = b.doc_id AND a.tok < b.tok
        GROUP BY 1, 2, 3, 4)
      SELECT tok_a, tok_b, c_ab, df_a, df_b,
        floor(ln(c_ab::DOUBLE * n_docs::DOUBLE / (df_a::DOUBLE * df_b::DOUBLE))
          * 1000000 + 0.5)/1000000 AS pmi
      FROM pairs, nd
      WHERE c_ab >= 5"""))

  /** Regexp-function surface over the ASCII name key: extract (group),
    * replace-all, count, boolean match, extract-all. Pattern dialect is the
    * Java∩RE2 subset (no backrefs, no lookaround) so Spark (java.util.regex)
    * and DuckDB (RE2) agree; the one semantic trap is replace: Spark's
    * regexp_replace is replace-ALL, DuckDB's is first-match unless the 'g'
    * flag is passed — compensated in the twin. Pure projection, no shuffle. */
  private val q109 = Q(
    "q109_regexp_surface",
    (s, d) => {
      Tables.customer(s, d).select(
        col("c_custkey"),
        regexp_extract(col("c_name"), "#([0-9]+)$", 1).as("num_part"),
        regexp_replace(col("c_name"), "[0-9]", "*").as("masked"),
        regexp_count(col("c_name"), lit("0")).cast("long").as("zeros"),
        col("c_name").rlike("[13579]$").as("odd_tail"),
        // '|'-joined, not a raw array: the driver's comparator can't hash
        // ndarray cells (r5 oracle err). DuckDB's array_to_string yields
        // NULL on an empty list where array_join yields '' → coalesce twin.
        array_join(
          regexp_extract_all(col("c_name"), lit("([0-9]{2})"), lit(1)),
          "|").as("digit_pairs"))
    },
    Some("""
      SELECT c_custkey,
        regexp_extract(c_name, '#([0-9]+)$', 1) AS num_part,
        regexp_replace(c_name, '[0-9]', '*', 'g') AS masked,
        CAST(len(regexp_extract_all(c_name, '0')) AS BIGINT) AS zeros,
        regexp_matches(c_name, '[13579]$') AS odd_tail,
        coalesce(array_to_string(
          regexp_extract_all(c_name, '([0-9]{2})', 1), '|'), '') AS digit_pairs
      FROM customer"""))

  /** Array set-algebra surface: distinct/sort/intersect/except/overlap/
    * contains against a literal stopword set. Both engines leave set-op
    * result ORDER unspecified, so every array is array_sort-ed before
    * emission — the same canonicalization rule as q34's maps. The distinct
    * token array is produced once in its own projection; CollapseProject
    * won't inline a non-cheap expression consumed four times, so the
    * split+filter+dedup runs once per row, not per use. Map-side only. */
  private val q110 = Q(
    "q110_array_setops",
    (s, d) => {
      val stop = array(Seq("the", "a", "of", "and", "to").map(lit): _*)
      Tables.documents(s, d)
        .select(col("doc_id"),
          array_sort(array_distinct(
            filter(split(col("text"), " "), x => x =!= ""))).as("toks"))
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_uniq"),
          // '|'-joined strings, not raw arrays: the driver's comparator
          // can't hash ndarray cells (r5 oracle err on this query).
          array_join(array_sort(array_intersect(col("toks"), stop)), "|")
            .as("stops_present"),
          array_join(slice(array_sort(array_except(col("toks"), stop)), 1, 5), "|")
            .as("content_head"),
          arrays_overlap(col("toks"), stop).as("has_stop"),
          array_contains(col("toks"), "the").as("has_the"))
    },
    Some("""
      WITH t AS (
        SELECT doc_id,
          list_sort(list_distinct(list_filter(string_split(text, ' '),
            x -> x <> ''))) AS toks
        FROM documents)
      SELECT doc_id,
        CAST(len(toks) AS BIGINT) AS n_uniq,
        coalesce(array_to_string(
          list_sort(list_intersect(toks, ['the','a','of','and','to'])), '|'),
          '') AS stops_present,
        coalesce(array_to_string(
          list_sort(list_filter(toks,
            x -> NOT list_contains(['the','a','of','and','to'], x)))[1:5], '|'),
          '') AS content_head,
        list_has_any(toks, ['the','a','of','and','to']) AS has_stop,
        list_contains(toks, 'the') AS has_the
      FROM t"""))

  /** str_to_map + map explode — the key:value config-string decode (the
    * lightweight cousin of q42's dynamic-key JSON). The map is built from
    * row columns, exploded back to (key, value) rows; the twin derives the
    * same rows relationally (UNION ALL), proving the map round-trip against
    * an implementation that never builds a map. Map-side only. */
  private val q111 = Q(
    "q111_strtomap_explode",
    (s, d) => {
      Tables.customer(s, d)
        .select(col("c_custkey"),
          str_to_map(
            concat_ws(",",
              concat(lit("seg:"), col("c_mktsegment")),
              concat(lit("nat:"), col("c_nationkey"))),
            lit(","), lit(":")).as("m"))
        .select(col("c_custkey"), explode(col("m")))
        .select(col("c_custkey"), col("key"), col("value"))
    },
    Some("""
      SELECT c_custkey, 'seg' AS key, c_mktsegment AS value FROM customer
      UNION ALL
      SELECT c_custkey, 'nat' AS key, CAST(c_nationkey AS VARCHAR) AS value
      FROM customer"""))

  /** Null-handling surface: nullif/nvl2/ifnull/greatest/least — the
    * null-algebra every ETL layer leans on. nullif plants real NULLs from
    * data ('O' status), nvl2 branches on them, greatest/least clamp exact
    * cents. DuckDB lacks nvl2 → CASE in the twin (same three-valued
    * semantics). Pure projection. */
  private val q112 = Q(
    "q112_null_surface",
    (s, d) => {
      val cents = floor(col("o_totalprice") * 100 + 0.5).cast("long")
      Tables.orders(s, d).select(
        col("o_orderkey"),
        nullif(col("o_orderstatus"), lit("O")).as("settled_status"),
        nvl2(nullif(col("o_orderstatus"), lit("O")), lit("settled"), lit("open")).as("state"),
        ifnull(nullif(col("o_orderstatus"), lit("O")), lit("-")).as("status_or_dash"),
        greatest(cents, lit(10000000L)).as("floor_cents"),
        least(cents, lit(30000000L)).as("cap_cents"))
    },
    Some("""
      SELECT o_orderkey,
        nullif(o_orderstatus, 'O') AS settled_status,
        CASE WHEN nullif(o_orderstatus, 'O') IS NOT NULL
             THEN 'settled' ELSE 'open' END AS state,
        ifnull(nullif(o_orderstatus, 'O'), '-') AS status_or_dash,
        greatest(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT), 10000000) AS floor_cents,
        least(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT), 30000000) AS cap_cents
      FROM orders"""))

  /** Window-frame surface: running sum (ROWS unbounded→current), moving
    * average (ROWS 2-preceding), whole-partition first/last/nth_value
    * (ROWS unbounded→unbounded — last_value under the DEFAULT frame is the
    * classic current-row trap), and a value-based RANGE frame over exact
    * cents. Row frames order by the unique o_orderkey (the q08 tiebreak
    * rule); the RANGE frame is tie-inclusive BY VALUE, so it is
    * deterministic without one. One shuffle on o_custkey; both window
    * sorts share it. */
  private val q113 = Q(
    "q113_window_frames",
    (s, d) => {
      val byKey = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      val full = byKey.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val byVal = Window.partitionBy(col("o_custkey")).orderBy(col("cents"))
        .rangeBetween(-10000000L, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
        .select(col("o_custkey"), col("o_orderkey"), col("cents"),
          sum(col("cents")).over(byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("running"),
          r(avg(col("cents")).over(byKey.rowsBetween(-2, Window.currentRow)), 6).as("ma3"),
          first_value(col("cents")).over(full).as("first_cents"),
          last_value(col("cents")).over(full).as("last_cents"),
          nth_value(col("cents"), 2).over(full).as("second_cents"),
          sum(col("cents")).over(byVal).as("near_sum"))
    },
    Some("""
      WITH o AS (
        SELECT o_custkey, o_orderkey,
          CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents
        FROM orders)
      SELECT o_custkey, o_orderkey, cents,
        CAST(sum(cents) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running,
        floor(avg(cents) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) * 1000000 + 0.5)/1000000 AS ma3,
        first_value(cents) OVER w AS first_cents,
        last_value(cents) OVER w AS last_cents,
        nth_value(cents, 2) OVER w AS second_cents,
        CAST(sum(cents) OVER (PARTITION BY o_custkey ORDER BY cents
          RANGE BETWEEN 10000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS near_sum
      FROM o
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"""))

  /** Exact interpolated percentiles (quartiles) per group — the oracle is
    * DuckDB's `quantile_cont`, lower+(higher-lower)×f over the sorted
    * group. BIT-exact by construction at p∈{.25,.5,.75}: the fraction is
    * a dyadic rational, (higher-lower)×f and the final add are exact IEEE
    * ops on integer cents ≪ 2^50, so op-order cannot matter — the one
    * percentile family that needs NO rounding belt.
    *
    * Round 10 replaced Spark's exact `percentile` aggregate: it buffers a
    * value→count map PER GROUP PER PARTITION (ObjectHashAggregate, no
    * codegen) and merges those maps into 5 single-task reducers — over
    * the near-unique cents domain the sf10 decade probe measured it at
    * 27× (74 s). A quartile is just an order statistic, so the plan now
    * asks [[Shared.valueAtRanks]] (q89's counting-sort machinery) for the
    * floor/ceil ranks of (n−1)·p per group and interpolates — identical
    * lower+(higher−lower)×frac arithmetic, corpus never shuffled. frac=0
    * keeps vlo exactly (x + (y−x)·0 ≡ x in IEEE), so the pos_hi =
    * min(pos_lo+1, n−1) form needs no tie-casing. The KLL sketch (q65)
    * remains the approximate swap when even three scans are too many. */
  private val q114 = Q(
    "q114_percentile_exact",
    (s, d) => {
      val base = Tables.orders(s, d)
        .select(col("o_orderpriority"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      exactPercentiles(base, "o_orderpriority", "cents", Seq(0.25, 0.5, 0.75))
        .groupBy(col("o_orderpriority"))
        .agg(max(col("n")).as("n"),
          max(when(col("p") === 0.25, col("val"))).as("p25"),
          max(when(col("p") === 0.5, col("val"))).as("p50"),
          max(when(col("p") === 0.75, col("val"))).as("p75"))
    },
    Some("""
      SELECT o_orderpriority, count(*) AS n,
        quantile_cont(cents, 0.25) AS p25,
        quantile_cont(cents, 0.5) AS p50,
        quantile_cont(cents, 0.75) AS p75
      FROM (
        SELECT o_orderpriority,
          CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents
        FROM orders)
      GROUP BY 1"""))

  /** Bitwise surface: bit_and/bit_or/bit_xor AGGREGATES (the flag-mask
    * rollups behind feature-bitmap columns) plus scalar shift/and/xor.
    * DuckDB's `^` is exponentiation — its xor is the two-arg `xor()`
    * function, compensated in the twin. One hash aggregate with map-side
    * partials (all three are commutative+associative). */
  private val q115 = Q(
    "q115_bitwise_surface",
    (s, d) => {
      Tables.customer(s, d)
        .select(col("c_mktsegment"),
          col("c_nationkey"),
          shiftleft(col("c_nationkey"), 2).cast("long").as("shifted"),
          col("c_nationkey").bitwiseAND(lit(7L)).as("low3"),
          col("c_nationkey").bitwiseXOR(lit(5L)).as("xored"))
        .groupBy(col("c_mktsegment"))
        .agg(
          bit_and(col("c_nationkey")).as("and_nat"),
          bit_or(col("c_nationkey")).as("or_nat"),
          bit_xor(col("c_nationkey")).as("xor_nat"),
          sum(col("shifted")).as("sum_shifted"),
          sum(col("low3")).as("sum_low3"),
          sum(col("xored")).as("sum_xored"))
    },
    Some("""
      SELECT c_mktsegment,
        bit_and(c_nationkey) AS and_nat,
        bit_or(c_nationkey) AS or_nat,
        bit_xor(c_nationkey) AS xor_nat,
        CAST(sum(c_nationkey << 2) AS BIGINT) AS sum_shifted,
        CAST(sum(c_nationkey & 7) AS BIGINT) AS sum_low3,
        CAST(sum(xor(c_nationkey, 5)) AS BIGINT) AS sum_xored
      FROM customer
      GROUP BY 1"""))

  /** Inverted-index construction — token → document frequency + the head
    * of the sorted posting list, the retrieval-side structure a corpus
    * search layer builds once per snapshot. collect_list is
    * arrival-ordered, so postings are array_sort-ed before the slice (the
    * q34/q107 canonicalization rule); df ≥ 5 bounds output to real vocab.
    * At 100 TB the posting-list head stays bounded per token; the full
    * list would shard by (tok, doc_id range). One shuffle on tok. */
  private val q116 = Q(
    "q116_inverted_index",
    (s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .distinct()
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("df"),
          // '|'-joined posting head, not a raw array: the driver's
          // comparator can't hash ndarray cells (r5 oracle err). df>=5
          // guarantees non-empty, so no empty-list NULL quirk here.
          array_join(transform(
            slice(array_sort(collect_list(col("doc_id"))), 1, 10),
            x => x.cast("string")), "|").as("postings"))
        .filter(col("df") >= 5)
    },
    Some("""
      SELECT tok, count(*) AS df,
        array_to_string((list_sort(list(doc_id)))[1:10], '|') AS postings
      FROM (
        SELECT DISTINCT doc_id, tok FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        WHERE tok <> '')
      GROUP BY tok
      HAVING count(*) >= 5"""))

  /** BM25 relevance scoring (k1=1.2, b=0.75) for a deterministic query —
    * the top-3-df tokens — over the corpus: the retrieval primitive under
    * contamination checks and RAG curation. Exact integer sufficient
    * statistics (tf, df, dl, N, Σdl) flow to ONE double expression written
    * in identical textual order in both engines; each per-term score is
    * rounded to integer micro-units BEFORE the per-doc sum (the q69 rule:
    * float summation order can never perturb a sum of BIGINTs). k1+1 is
    * written as the literal 2.2 on both sides — computing 1.2+1.0 in
    * doubles yields 2.2000000000000002 ≠ the literal. Vocab and the 1-row
    * corpus stats broadcast; the only real shuffles are the (doc,tok)
    * count and the per-doc sum. */
  private val q117 = Q(
    "q117_bm25",
    (s, d) => {
      // Round-13: same fan-out as q125's leg A — tc feeds dl, df/vocab
      // and the scoring join; cut it once per invocation.
      val tc = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
        .localCheckpoint(true)
      val dl = tc.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      val dfT = tc.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val vocab = dfT.orderBy(col("df").desc, col("tok").asc).limit(3)
      val stats = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
        .crossJoin(broadcast(dl.agg(sum(col("dl")).as("sum_dl"))))
      val nD = col("n_docs").cast("double"); val dfD = col("df").cast("double")
      val tfD = col("tf").cast("double"); val dlD = col("dl").cast("double")
      val avgdl = col("sum_dl").cast("double") / nD
      val idf = log((nD - dfD + lit(0.5)) / (dfD + lit(0.5)) + lit(1.0))
      val denom = tfD + lit(1.2) * (lit(1.0) - lit(0.75) + lit(0.75) * dlD / avgdl)
      val termMicro = floor(idf * (tfD * lit(2.2)) / denom * 1e6 + 0.5).cast("long")
      tc.join(broadcast(vocab.select(col("tok"), col("df"))), "tok")
        .join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .select(col("doc_id"), termMicro.as("term_micro"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_terms"), sum(col("term_micro")).as("bm25_micro"))
    },
    Some("""
      WITH tc AS (
        SELECT doc_id, tok, count(*) AS tf FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        WHERE tok <> '' GROUP BY 1, 2),
      dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tc GROUP BY 1),
      dft AS (SELECT tok, count(*) AS df FROM tc GROUP BY 1),
      vocab AS (SELECT tok, df FROM dft ORDER BY df DESC, tok ASC LIMIT 3),
      stats AS (
        SELECT (SELECT count(*) FROM documents) AS n_docs,
               (SELECT CAST(sum(dl) AS BIGINT) FROM dl) AS sum_dl),
      scored AS (
        SELECT tc.doc_id,
          CAST(floor(
            ln((n_docs::DOUBLE - df::DOUBLE + 0.5) / (df::DOUBLE + 0.5) + 1.0)
            * (tf::DOUBLE * 2.2)
            / (tf::DOUBLE + 1.2 * (1.0 - 0.75 + 0.75 * dl::DOUBLE
                 / (sum_dl::DOUBLE / n_docs::DOUBLE)))
            * 1000000 + 0.5) AS BIGINT) AS term_micro
        FROM tc JOIN vocab USING (tok) JOIN dl ON tc.doc_id = dl.doc_id, stats)
      SELECT doc_id, count(*) AS n_terms,
        CAST(sum(term_micro) AS BIGINT) AS bm25_micro
      FROM scored GROUP BY 1"""))

  /** DISTINCT-aggregate family beyond count: sum(DISTINCT) and
    * avg(DISTINCT) over a coarsened bucket (collisions guaranteed), beside
    * the plain forms — the dedup-before-aggregate semantics some revenue
    * metrics require. Spark plans ONE Expand feeding both distinct
    * aggregates (same key set), like q31's shape. avg(DISTINCT) is an
    * exact-int sum over distinct values and one division — identical IEEE
    * both engines, r6 as belt. */
  private val q118 = Q(
    "q118_distinct_sum_avg",
    (s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderpriority"),
          (floor(col("o_totalprice") * 100 + 0.5).cast("long") / lit(1000000L)).cast("long").as("bucket"))
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("bucket")).as("sum_all"),
          sum_distinct(col("bucket")).as("sum_uniq"),
          r(expr("avg(DISTINCT bucket)"), 6).as("avg_uniq"))
    },
    Some("""
      SELECT o_orderpriority, count(*) AS n,
        CAST(sum(bucket) AS BIGINT) AS sum_all,
        CAST(sum(DISTINCT bucket) AS BIGINT) AS sum_uniq,
        floor(avg(DISTINCT bucket) * 1000000 + 0.5)/1000000 AS avg_uniq
      FROM (
        SELECT o_orderpriority,
          CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) // 1000000 AS bucket
        FROM orders)
      GROUP BY 1"""))

  /** Length-bucket batching audit — group documents into 64-token padding
    * buckets and measure the padding efficiency a bucketed batcher would
    * achieve (sum of real tokens ÷ bucket-max × count): the pre-training
    * packing diagnostic beside q48's first-fit packing. Integer ceil via
    * (n+63)/64 on exact longs both engines; one small hash aggregate. */
  private val q119 = Q(
    "q119_length_buckets",
    (s, d) => {
      val nTok = size(filter(split(col("text"), " "), x => x =!= "")).cast("long")
      Tables.documents(s, d)
        .select(col("doc_id"), nTok.as("n_tok"))
        .filter(col("n_tok") > 0)
        .withColumn("bucket", ((col("n_tok") + lit(63L)) / lit(64L)).cast("long"))
        .groupBy(col("bucket"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("sum_tok"),
          max(col("n_tok")).as("max_tok"),
          (max(col("n_tok")) * count(lit(1))).as("padded_tok"))
        .withColumn("efficiency",
          r(col("sum_tok").cast("double") / col("padded_tok").cast("double"), 6))
    },
    Some("""
      SELECT bucket, count(*) AS n_docs,
        CAST(sum(n_tok) AS BIGINT) AS sum_tok,
        max(n_tok) AS max_tok,
        max(n_tok) * count(*) AS padded_tok,
        floor(CAST(sum(n_tok) AS BIGINT)::DOUBLE / (max(n_tok) * count(*))::DOUBLE
          * 1000000 + 0.5)/1000000 AS efficiency
      FROM (
        SELECT doc_id, n_tok, (n_tok + 63) // 64 AS bucket FROM (
          SELECT doc_id,
            CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tok
          FROM documents)
        WHERE n_tok > 0)
      GROUP BY 1"""))

  /** SQL front door, GROUPING SETS — the explicit-set form between q30's
    * ROLLUP and q97's CUBE: per-priority, per-status, and grand-total rows
    * from ONE Expand (×3) into one hash aggregate, never three scans.
    * grouping() flags cast to INT on both sides (Spark emits TINYINT). */
  private val q120 = Q(
    "q120_grouping_sets",
    (s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_v")
      s.sql("""
        SELECT o_orderpriority, o_orderstatus,
          CAST(grouping(o_orderpriority) AS INT) AS g_pri,
          CAST(grouping(o_orderstatus) AS INT) AS g_st,
          count(*) AS n,
          sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS sum_cents
        FROM orders_v
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())""")
    },
    Some("""
      SELECT o_orderpriority, o_orderstatus,
        CAST(grouping(o_orderpriority) AS INT) AS g_pri,
        CAST(grouping(o_orderstatus) AS INT) AS g_st,
        count(*) AS n,
        CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
      FROM orders
      GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())"""))

  /** Canonical-document selection — the KEEP side of dedup: within each
    * exact-duplicate cluster (q72's normalized fingerprint), keep the
    * best document by (n_chars DESC, doc_id ASC) — a deterministic total
    * order, the q08 tiebreak rule — and report the cluster size. One
    * shuffle on the fingerprint; both window functions share it. The
    * near-dup analogue swaps the fingerprint for q46's cluster id. */
  private val q121 = Q(
    "q121_dedup_keep_best",
    (s, d) => {
      val w = Window.partitionBy(col("fingerprint"))
        .orderBy(col("n_chars").desc, col("doc_id").asc)
      val wAll = Window.partitionBy(col("fingerprint"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"),
          md5(graft.ops.Text.canonicalText(col("text"))).as("fingerprint"))
        .select(col("*"),
          row_number().over(w).as("rn"),
          count(lit(1)).over(wAll).as("cluster_size"))
        .filter(col("rn") === 1)
        .select(col("fingerprint"), col("doc_id").as("kept_id"),
          col("n_chars").as("kept_chars"), col("cluster_size"))
    },
    Some("""
      SELECT fingerprint, doc_id AS kept_id, n_chars AS kept_chars, cluster_size
      FROM (
        SELECT doc_id, n_chars, fingerprint,
          row_number() OVER (PARTITION BY fingerprint
            ORDER BY n_chars DESC, doc_id ASC) AS rn,
          count(*) OVER (PARTITION BY fingerprint) AS cluster_size
        FROM (
          SELECT doc_id, n_chars,
            md5(trim(regexp_replace(
              regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
              '\s+', ' ', 'g'))) AS fingerprint
          FROM documents))
      WHERE rn = 1"""))

  /** parse_url surface over a synthesized URL — host/path/query and a
    * single query parameter. The twin never parses: it rebuilds each part
    * from the same source columns, so Spark's parser is checked against
    * ground truth rather than another parser's quirks. Pure projection. */
  private val q122 = Q(
    "q122_url_parse",
    (s, d) => {
      val url = concat(lit("https://travel.example.com/pages/"), col("event_type"),
        lit("?uid="), col("user_id"))
      Tables.events(s, d)
        .select(col("event_id"), url.as("url"))
        .select(col("event_id"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY")).as("query"),
          parse_url(col("url"), lit("QUERY"), lit("uid")).as("uid"))
    },
    Some("""
      SELECT event_id,
        'travel.example.com' AS host,
        '/pages/' || event_type AS path,
        'uid=' || CAST(user_id AS VARCHAR) AS query,
        CAST(user_id AS VARCHAR) AS uid
      FROM events"""))

  /** Unigram (token-distribution) entropy per document — the repetition/
    * diversity quality signal orthogonal to q105's TTR (entropy sees a doc
    * that repeats ONE token 90% of the time even when its vocab is large).
    * Each token-type's -p·ln(p) term is rounded to integer micro-units
    * BEFORE the per-doc sum (the q69/q117 rule), so IEEE summation order
    * cannot perturb the result. Shuffles: (doc,tok) count, then the
    * window+final agg share the doc_id exchange. */
  private val q123 = Q(
    "q123_token_entropy",
    (s, d) => {
      val tc = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("cnt"))
      val n = sum(col("cnt")).over(Window.partitionBy(col("doc_id")))
      val p = col("cnt").cast("double") / col("n").cast("double")
      tc.withColumn("n", n)
        .withColumn("term_micro", floor(-(p * log(p)) * 1e6 + 0.5).cast("long"))
        .groupBy(col("doc_id"))
        .agg(max(col("n")).as("n_tok"), count(lit(1)).as("n_uniq"),
          sum(col("term_micro")).as("entropy_micro"))
    },
    Some("""
      WITH tc AS (
        SELECT doc_id, tok, count(*) AS cnt FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        WHERE tok <> '' GROUP BY 1, 2),
      withn AS (
        SELECT doc_id, cnt,
          CAST(sum(cnt) OVER (PARTITION BY doc_id) AS BIGINT) AS n
        FROM tc)
      SELECT doc_id, max(n) AS n_tok, count(*) AS n_uniq,
        CAST(sum(CAST(floor(-(cnt::DOUBLE / n::DOUBLE * ln(cnt::DOUBLE / n::DOUBLE))
          * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS entropy_micro
      FROM withn GROUP BY 1"""))

  /** arrays_zip + inline — the struct-array explode that pairs parallel
    * arrays columnwise (tokens with their lengths here) and flattens the
    * struct to top-level columns in one step; the twin zips two unnests
    * positionally. Map-side only. */
  private val q124 = Q(
    "q124_zip_inline",
    (s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          filter(split(col("text"), " "), x => x =!= "").as("toks"))
        .select(col("doc_id"),
          inline(arrays_zip(col("toks"),
            transform(col("toks"), t => length(t).cast("long")).as("tok_len"))))
        .withColumnRenamed("toks", "tok")
    },
    Some("""
      SELECT doc_id, tok, CAST(length(tok) AS BIGINT) AS tok_len FROM (
        SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
        FROM documents)"""))

  /** Reciprocal-rank fusion of a lexical and a semantic ranking — the
    * hybrid-retrieval merge (RRF, k=60) a RAG curation pipeline runs over
    * BM25 and embedding-cosine lists. Each leg is cut to top-100 with
    * TakeOrderedAndProject FIRST (scalable at any corpus size); the
    * single-partition row_number windows only ever see those ≤100 rows.
    * Per-leg RRF contributions are micro-unit longs, so the fused sum is
    * exact; vec 0 is the query vector, its doc excluded from leg B. */
  private val q125 = Q(
    "q125_rrf_fusion",
    (s, d) => {
      graft.plans.GraftExtensions.install(s)
      // leg A: BM25 for the top-3-df query (q117's scoring, unchanged)
      // Round-13: tc fans out to dl, the df/vocab aggregate, and the
      // BM25 scoring join (and dl itself to two consumers) — each was a
      // pruned fresh explode+aggregate corpus pass. Cut tc once per
      // invocation; everything downstream reads the materialized counts.
      val tc = spreadSingleFileFixture(s, Tables.documents(s, d), "doc_id")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
        .localCheckpoint(true)
      val dl = tc.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      val dfT = tc.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val vocab = dfT.orderBy(col("df").desc, col("tok").asc).limit(3)
      val stats = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
        .crossJoin(broadcast(dl.agg(sum(col("dl")).as("sum_dl"))))
      val nD = col("n_docs").cast("double"); val dfD = col("df").cast("double")
      val tfD = col("tf").cast("double"); val dlD = col("dl").cast("double")
      val avgdl = col("sum_dl").cast("double") / nD
      val idf = log((nD - dfD + lit(0.5)) / (dfD + lit(0.5)) + lit(1.0))
      val denom = tfD + lit(1.2) * (lit(1.0) - lit(0.75) + lit(0.75) * dlD / avgdl)
      val bm25 = tc.join(broadcast(vocab.select(col("tok"), col("df"))), "tok")
        .join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .select(col("doc_id"),
          floor(idf * (tfD * lit(2.2)) / denom * 1e6 + 0.5).cast("long").as("term_micro"))
        .groupBy(col("doc_id")).agg(sum(col("term_micro")).as("bm25_micro"))
      val topA = bm25.orderBy(col("bm25_micro").desc, col("doc_id").asc).limit(100)
        .withColumn("rank_a", row_number().over(
          Window.orderBy(col("bm25_micro").desc, col("doc_id").asc)))
      // leg B: cosine vs the query vector (vec 0), q23's vec_dot scoring
      val e = Tables.embeddings(s, d).select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      val n = e.withColumn("nrm",
        sqrt(graft.functions.VectorDot.vec_dot(col("v"), col("v"))))
      val qv = n.filter(col("vec_id") === 0)
        .select(col("v").as("qv"), col("nrm").as("qn"))
      val cos = n.filter(col("vec_id") =!= 0).crossJoin(broadcast(qv))
        .select(col("vec_id"),
          (graft.functions.VectorDot.vec_dot(col("qv"), col("v")) /
            (col("qn") * col("nrm"))).as("sim"))
      val topB = cos.orderBy(col("sim").desc, col("vec_id").asc).limit(100)
        .withColumn("rank_b", row_number().over(
          Window.orderBy(col("sim").desc, col("vec_id").asc)))
        .select(col("vec_id").as("doc_id"), col("rank_b"))
      topA.select(col("doc_id"), col("rank_a"))
        .join(topB, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          col("rank_a").cast("long").as("rank_a"),
          col("rank_b").cast("long").as("rank_b"),
          (coalesce(floor(lit(1e6) / (lit(60.0) + col("rank_a").cast("double")) + 0.5).cast("long"), lit(0L)) +
           coalesce(floor(lit(1e6) / (lit(60.0) + col("rank_b").cast("double")) + 0.5).cast("long"), lit(0L))).as("rrf_micro"))
    },
    Some("""
      WITH tc AS (
        SELECT doc_id, tok, count(*) AS tf FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        WHERE tok <> '' GROUP BY 1, 2),
      dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tc GROUP BY 1),
      dft AS (SELECT tok, count(*) AS df FROM tc GROUP BY 1),
      vocab AS (SELECT tok, df FROM dft ORDER BY df DESC, tok ASC LIMIT 3),
      stats AS (
        SELECT (SELECT count(*) FROM documents) AS n_docs,
               (SELECT CAST(sum(dl) AS BIGINT) FROM dl) AS sum_dl),
      bm25 AS (
        SELECT tc.doc_id, CAST(sum(CAST(floor(
            ln((n_docs::DOUBLE - df::DOUBLE + 0.5) / (df::DOUBLE + 0.5) + 1.0)
            * (tf::DOUBLE * 2.2)
            / (tf::DOUBLE + 1.2 * (1.0 - 0.75 + 0.75 * dl::DOUBLE
                 / (sum_dl::DOUBLE / n_docs::DOUBLE)))
            * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS bm25_micro
        FROM tc JOIN vocab USING (tok) JOIN dl ON tc.doc_id = dl.doc_id, stats
        GROUP BY 1),
      ta AS (
        SELECT doc_id, rn AS rank_a FROM (
          SELECT doc_id, row_number() OVER (ORDER BY bm25_micro DESC, doc_id ASC) AS rn
          FROM bm25) WHERE rn <= 100),
      e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
      qv AS (SELECT v AS qv, nrm AS qn FROM n WHERE vec_id = 0),
      cos AS (
        SELECT vec_id, list_dot_product(qv, v)/(qn * nrm) AS sim
        FROM n, qv WHERE vec_id <> 0),
      tb AS (
        SELECT vec_id AS doc_id, rn AS rank_b FROM (
          SELECT vec_id, row_number() OVER (ORDER BY sim DESC, vec_id ASC) AS rn
          FROM cos) WHERE rn <= 100)
      SELECT COALESCE(ta.doc_id, tb.doc_id) AS doc_id,
        CAST(rank_a AS BIGINT) AS rank_a,
        CAST(rank_b AS BIGINT) AS rank_b,
        COALESCE(CAST(floor(1000000.0 / (60.0 + rank_a::DOUBLE) + 0.5) AS BIGINT), 0) +
        COALESCE(CAST(floor(1000000.0 / (60.0 + rank_b::DOUBLE) + 0.5) AS BIGINT), 0) AS rrf_micro
      FROM ta FULL OUTER JOIN tb ON ta.doc_id = tb.doc_id"""))

  /** Gap-fill + last-observation-carried-forward — densify each user's
    * daily value series over their own date range and fill gaps with the
    * IGNORE NULLS window form (the time-series repair every metrics store
    * runs). No arithmetic touches the carried values, so no rounding belt
    * is needed; the spine starts at each user's first observed day, so
    * the carry is never null. Shuffles: daily agg, per-user bounds, and
    * one window — all on user_id, so AQE coalesces them onto one layout. */
  private val q126 = Q(
    "q126_locf_gapfill",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(max(col("value")).as("v"))
      val spine = daily.groupBy(col("user_id"))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("v").isNotNull.as("observed"),
          last(col("v"), ignoreNulls = true).over(w).as("v_filled"))
    },
    Some("""
      WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day, max(value) AS v
        FROM events GROUP BY 1, 2),
      bounds AS (
        SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
      spine AS (
        SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
        FROM bounds)
      SELECT s.user_id, strftime(s.day, '%Y-%m-%d') AS day,
        v IS NOT NULL AS observed,
        last_value(v IGNORE NULLS) OVER (PARTITION BY s.user_id ORDER BY s.day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
      FROM spine s LEFT JOIN daily USING (user_id, day)"""))

  /** Sentence segmentation + per-document sentence statistics — the doc-
    * structure quality signal (mean sentence length, longest run) beside
    * q25's flat ratios. Regexp sentence split in the Java∩RE2 subset,
    * trim+drop empties BEFORE the explode on both sides; exact-int ratio
    * rounded r6. One shuffle (doc_id re-agg). */
  private val q127 = Q(
    "q127_sentence_stats",
    (s, d) => {
      val sents = filter(
        transform(split(col("text"), "[.!?]+"), x => trim(x)), x => x =!= "")
      Tables.documents(s, d)
        .select(col("doc_id"), explode(sents).as("sent"))
        .select(col("doc_id"),
          size(filter(split(col("sent"), " "), x => x =!= "")).cast("long").as("n_tok"),
          length(col("sent")).cast("long").as("n_chars"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_sent"),
          sum(col("n_tok")).as("sum_tok"),
          max(col("n_chars")).as("max_sent_chars"))
        .withColumn("avg_sent_tok",
          r(col("sum_tok").cast("double") / col("n_sent").cast("double"), 6))
    },
    Some("""
      SELECT doc_id, count(*) AS n_sent,
        CAST(sum(n_tok) AS BIGINT) AS sum_tok,
        max(n_chars) AS max_sent_chars,
        floor(CAST(sum(n_tok) AS BIGINT)::DOUBLE / count(*)::DOUBLE
          * 1000000 + 0.5)/1000000 AS avg_sent_tok
      FROM (
        SELECT doc_id,
          CAST(len(list_filter(string_split(sent, ' '), x -> x <> '')) AS BIGINT) AS n_tok,
          CAST(length(sent) AS BIGINT) AS n_chars
        FROM (
          SELECT doc_id,
            unnest(list_filter(list_transform(string_split_regex(text, '[.!?]+'),
              x -> trim(x)), x -> x <> '')) AS sent
          FROM documents))
      GROUP BY 1"""))

  /** PageRank (3 iterations, d=0.85) over the event-type transition graph
    * — the iterative-dataflow pattern (label propagation, HITS, embedding
    * propagation) expressed as a deterministic DataFrame loop: rank mass
    * lives in integer micro-units, each edge contribution is floored to a
    * long BEFORE the in-neighbor sum, so three rounds of float math stay
    * bit-identical to the twin's three unrolled CTEs. The per-iteration
    * shape — edges⋈ranks, groupBy(to), spine left-join — is the 100 TB
    * Pregel step; nodes/nN broadcast, edges shuffle once per round.
    * Dangling-node mass is dropped (simplified PR) on both sides. */
  private val q128 = Q(
    "q128_pagerank",
    (s, d) => {
      val ev = Tables.events(s, d)
      val pairs = ev
        .select(col("user_id"), col("event_id"), col("event_type").as("from_t"))
        .withColumn("to_t", lead(col("from_t"), 1).over(
          Window.partitionBy(col("user_id")).orderBy(col("event_id"))))
        .filter(col("to_t").isNotNull)
      val edges = pairs.groupBy(col("from_t"), col("to_t")).agg(count(lit(1)).as("w"))
      val nodes = ev.select(col("event_type")).distinct()
      val nCnt = nodes.agg(count(lit(1)).as("n"))
      // Round-13: the unrolled 3-iteration lineage evaluated the events
      // window + edge aggregate once per iteration AND once more inside
      // outw (28 parquet scans, zero reused exchanges in the static
      // plan). Two changes, per guide §2.4/§3.3: outw becomes a window
      // over the edge aggregate (same partial sums, no second corpus
      // pass), and the two BOUNDED model tables — ew (≤|types|² rows)
      // and the node spine (≤|types| rows) — are localCheckpoint'ed so
      // the iteration loop is arithmetic over materialized tiny tables
      // instead of a lineage that re-derives the corpus per round. Both
      // checkpoints recompute from parquet on every invocation (nothing
      // persists across runs); the visible plan drops to 2 corpus
      // passes at any iteration count.
      val ew = edges
        .withColumn("outw",
          sum(col("w")).over(Window.partitionBy(col("from_t"))))
        .localCheckpoint()
      val spine = nodes.crossJoin(broadcast(nCnt)).localCheckpoint()
      var pr = spine
        .select(col("event_type"),
          floor(lit(1000000.0) / col("n").cast("double") + 0.5).cast("long").as("pr_micro"))
      for (_ <- 1 to 3) {
        val contribs = ew
          .join(broadcast(pr.select(col("event_type").as("from_t"), col("pr_micro"))), "from_t")
          .select(col("to_t").as("event_type"),
            floor(lit(0.85) * col("pr_micro").cast("double") * col("w").cast("double")
              / col("outw").cast("double") + 0.5).cast("long").as("c"))
          .groupBy(col("event_type")).agg(sum(col("c")).as("csum"))
        pr = spine
          .join(contribs, Seq("event_type"), "left")
          .select(col("event_type"),
            (floor(lit(0.15) * lit(1000000.0) / col("n").cast("double") + 0.5).cast("long")
              + coalesce(col("csum"), lit(0L))).as("pr_micro"))
      }
      pr
    },
    Some("""
      WITH pairs AS (
        SELECT event_type AS from_t,
          lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS to_t
        FROM events),
      edges AS (
        SELECT from_t, to_t, count(*) AS w FROM pairs
        WHERE to_t IS NOT NULL GROUP BY 1, 2),
      nodes AS (SELECT DISTINCT event_type FROM events),
      nn AS (SELECT count(*) AS n FROM nodes),
      outw AS (SELECT from_t, CAST(sum(w) AS BIGINT) AS outw FROM edges GROUP BY 1),
      ew AS (SELECT e.from_t, e.to_t, e.w, o.outw FROM edges e JOIN outw o USING (from_t)),
      pr0 AS (
        SELECT event_type,
          CAST(floor(1000000.0 / n::DOUBLE + 0.5) AS BIGINT) AS pr_micro
        FROM nodes, nn),
      c1 AS (
        SELECT to_t AS event_type, CAST(sum(CAST(floor(
            0.85 * pr_micro::DOUBLE * w::DOUBLE / outw::DOUBLE + 0.5) AS BIGINT)) AS BIGINT) AS csum
        FROM ew JOIN pr0 ON ew.from_t = pr0.event_type GROUP BY 1),
      pr1 AS (
        SELECT b.event_type,
          CAST(floor(0.15 * 1000000.0 / b.n::DOUBLE + 0.5) AS BIGINT) + COALESCE(csum, 0) AS pr_micro
        FROM (SELECT event_type, n FROM nodes, nn) b LEFT JOIN c1 USING (event_type)),
      c2 AS (
        SELECT to_t AS event_type, CAST(sum(CAST(floor(
            0.85 * pr_micro::DOUBLE * w::DOUBLE / outw::DOUBLE + 0.5) AS BIGINT)) AS BIGINT) AS csum
        FROM ew JOIN pr1 ON ew.from_t = pr1.event_type GROUP BY 1),
      pr2 AS (
        SELECT b.event_type,
          CAST(floor(0.15 * 1000000.0 / b.n::DOUBLE + 0.5) AS BIGINT) + COALESCE(csum, 0) AS pr_micro
        FROM (SELECT event_type, n FROM nodes, nn) b LEFT JOIN c2 USING (event_type)),
      c3 AS (
        SELECT to_t AS event_type, CAST(sum(CAST(floor(
            0.85 * pr_micro::DOUBLE * w::DOUBLE / outw::DOUBLE + 0.5) AS BIGINT)) AS BIGINT) AS csum
        FROM ew JOIN pr2 ON ew.from_t = pr2.event_type GROUP BY 1)
      SELECT b.event_type,
        CAST(floor(0.15 * 1000000.0 / b.n::DOUBLE + 0.5) AS BIGINT) + COALESCE(csum, 0) AS pr_micro
      FROM (SELECT event_type, n FROM nodes, nn) b LEFT JOIN c3 USING (event_type)"""))

  /** SQL front door, WITH RECURSIVE (new in Spark 4.x): depth-bounded BFS
    * from a deterministic seed set through the near-dup edge graph — the
    * "contamination blast radius" question (if these docs are benchmark-
    * contaminated, what else is within 3 near-dup hops?) asked in pure
    * declarative SQL, the SAME recursive text both engines execute.
    * Spark restricts recursion to UNION ALL (no dedup across iterations,
    * [UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE]), so the recursion must be
    * finite by construction: the dist < 3 guard bounds depth, and min()
    * over the path multiset recovers the true hop distance afterwards.
    * Scale note: UNION ALL recursion materializes one row per PATH, not
    * per node — fine at radius 3 on near-dup graphs (tiny components),
    * but unbounded-radius closure belongs to the iterative pointer-
    * jumping operator (q46, O(log d) rounds with dedup per round); this
    * is the SQL-surface form, not a replacement. Seeds are doc_id ≡ 0
    * (mod 97) — deterministic, corpus-spread, engine-exact. */
  private val q202 = Q(
    "q202_recursive_radius",
    (s, d) => {
      // Round-13: Spark's UnionLoopExec re-executes the recursive step's
      // whole subtree each iteration, and CTE inlining put the prefix-
      // blocked Jaccard self-join INSIDE that step — the edge list was
      // rebuilt from parquet on every BFS round. The edges are the same
      // bounded near-dup graph q20/q46 use (Shared.prefixJaccardPairs),
      // so materialize them once per invocation (localCheckpoint — guide
      // §3.3's plan-truncation move) and recurse over the tiny view; the
      // recursive SQL surface itself is unchanged, as is every emitted
      // row. The DuckDB twin still runs the full single-text form.
      Tables.documents(s, d).createOrReplaceTempView("documents_v")
      val e = Shared.prefixJaccardPairs(s, d)
        .select(col("doc_a").as("a"), col("doc_b").as("b"))
      e.unionAll(e.select(col("b").as("a"), col("a").as("b")))
        .localCheckpoint()
        .createOrReplaceTempView("sym_v")
      s.sql("""
        WITH RECURSIVE bfs(node, dist) AS (
          SELECT doc_id, 0 FROM documents_v WHERE doc_id % 97 = 0
          UNION ALL
          SELECT sym_v.b, dist + 1
          FROM bfs JOIN sym_v ON sym_v.a = bfs.node WHERE dist < 3),
        md AS (
          SELECT node, CAST(min(dist) AS INT) AS dist FROM bfs GROUP BY node)
        SELECT dist, CAST(count(*) AS BIGINT) AS n_docs,
          min(node) AS min_doc, max(node) AS max_doc
        FROM md GROUP BY dist""")
    },
    Some("""
      WITH RECURSIVE d AS (
        SELECT doc_id, substr(text, 1, 30) AS pfx,
          list_distinct(string_split(text, ' ')) AS toks
        FROM documents),
      e AS (
        SELECT a.doc_id AS a, b.doc_id AS b
        FROM d a JOIN d b ON a.pfx = b.pfx AND a.doc_id < b.doc_id
        WHERE len(list_intersect(a.toks, b.toks))::DOUBLE
              / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.5),
      sym AS (SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
      bfs(node, dist) AS (
        SELECT doc_id, 0 FROM documents WHERE doc_id % 97 = 0
        UNION ALL
        SELECT sym.b, dist + 1
        FROM bfs JOIN sym ON sym.a = bfs.node WHERE dist < 3),
      md AS (
        SELECT node, CAST(min(dist) AS INT) AS dist FROM bfs GROUP BY node)
      SELECT dist, CAST(count(*) AS BIGINT) AS n_docs,
        min(node) AS min_doc, max(node) AS max_doc
      FROM md GROUP BY dist"""))

  private[queries] val all: Seq[Q] = Seq(
    q100, q101, q102, q103, q104, q105, q106, q107,
    q108, q109, q110, q111, q112, q113, q114, q115,
    q116, q117, q118, q119, q120, q121, q122, q123,
    q124, q125, q126, q127, q128, q202)
}
