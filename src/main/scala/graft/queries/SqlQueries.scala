package graft.queries

import graft.Tables
import graft.sql.SqlEngine

/** Driver-checkable queries written in the HStream SQL *dialect* and run
  * through our parser → planner → Catalyst pipeline (graft.sql), batch mode
  * over the parquet tables. This puts the whole frontend inside the DuckDB
  * correctness gate: every construct here is dialect text, not DataFrame
  * calls. (The driver sorts rows before hashing, so row order never affects
  * a gate; ORDER BY + LIMIT queries still gate exactly because a total
  * order — unique tiebreaker — makes the limited SET deterministic.)
  */
object SqlQueries extends QueryPack {

  private def run(s: org.apache.spark.sql.SparkSession, dir: String, text: String) = {
    Tables.registerAll(s, dir)
    new SqlEngine(s).batch(text)
  }

  override def queries: Map[String, Q] = Map(
    // Filter + Project + computed column (Affiliate) in dialect text.
    "q_sql_filter_project" -> ((s, dir) => run(s, dir,
      """SELECT event_id, user_id, value * 2 - 1 AS v2 FROM events
         WHERE event_type = 'purchase' AND value > 100.0;""")),

    // Reduce with the dialect aggregate set + HAVING; AVG works here
    // (unsupported at runtime in the reference — AggOp.hs:66).
    "q_sql_agg_having" -> ((s, dir) => run(s, dir,
      """SELECT l_returnflag, COUNT(*) AS cnt, SUM(l_quantity) AS sq,
                MIN(l_quantity) AS mn, MAX(l_quantity) AS mx,
                AVG(l_quantity) AS av
         FROM lineitem GROUP BY l_returnflag HAVING COUNT(*) > 10;""")),

    // Unary math/trig through dialect text (UnaryOp.hs:34-358): 6-decimal
    // pinning spelled ROUND(f(x) * 1000000) — same rounded-integer compare
    // as the Column API trig gate, robust to last-ulp libm differences
    // (predates the 2-arg ROUND extension; the integer form stays).
    "q_sql_math" -> ((s, dir) => run(s, dir,
      """SELECT event_id,
                ROUND(SIN(value) * 1000000) AS sin6,
                ROUND(COS(value) * 1000000) AS cos6,
                ROUND(SQRT(ABS(value)) * 1000000) AS sqrt6,
                ROUND(LOG(ABS(value) + 1) * 1000000) AS log6,
                ROUND(EXP(0 - ABS(value)) * 1000000) AS exp6,
                SIGN(value) AS sg, CEIL(value) AS ce, FLOOR(value) AS fl
         FROM events;""")),

    // String layer through dialect text: REVERSE, CHUNKSOF, SPLIT — the
    // §2.3 string ops q_sql_scalar doesn't reach. Array results stringify
    // via ARRAY_JOIN (cross-engine array compare is avoided by all gates).
    "q_sql_string" -> ((s, dir) => run(s, dir,
      """SELECT doc_id,
                REVERSE(TAKE(6, text)) AS rev6,
                TO_LOWER(TO_UPPER(TAKE(8, text))) AS roundtrip,
                ARRAY_JOIN(CHUNKSOF(4, TAKE(12, text)), '|') AS chunks,
                ARRAY_JOIN(SPLIT(TAKE(20, text), ' '), '+') AS words
         FROM documents;""")),

    // Scalar layer through the dialect: math, string ops, BETWEEN, IFNULL /
    // NULLIF, CAST, TAKE/DROP.
    "q_sql_scalar" -> ((s, dir) => run(s, dir,
      """SELECT doc_id, TO_UPPER(lang) AS u, STRLEN(text) AS n,
                TAKE(8, text) AS t8, DROPEND(200, text) AS d200,
                IFNULL(NULLIF(source, 'src0'), 'zero') AS nn,
                CAST(n_chars AS FLOAT) AS nc,
                n_chars BETWEEN 100 AND 2000 AS inrange
         FROM documents;""")),

    // JSON access ops on the props JSON column (JsonOp.hs:33-84): `->`/`#>`
    // return the TYPED value (JOpArrow, JsonOp.hs:40-44) — here compared as
    // a NUMBER against the oracle — while `->>`/`#>>` return text.
    "q_sql_json" -> ((s, dir) => run(s, dir,
      """SELECT event_id,
                CAST(props -> 'k' AS INTEGER) AS v_num,
                CAST(props #> {'k'} AS INTEGER) AS vp_num,
                props ->> 'k' AS v_text,
                props #>> {'k'} AS vp_text FROM events;""")),

    // MinHash signature stage of the LSH dedup pipeline through the DIALECT
    // frontend (4th frontend over the shared md5 formulas — Column API,
    // spark.sql UDFs, and the DuckDB oracle are the others). Nested
    // subqueries materialize wh/hs: CollapseProject keeps a projection
    // boundary when inlining would duplicate a non-cheap expression, so
    // word hashing runs once per row, not once per MINHASH reference.
    "q_sql_minhash" -> ((s, dir) => run(s, dir,
      s"""SELECT doc_id,
            ${graft.functions.PipelineFunctions.MinhashPerms.indices
              .map(i => s"MINHASH(hs, $i) AS m$i").mkString(", ")}
          FROM (SELECT doc_id, SHINGLES3(wh) AS hs
                FROM (SELECT doc_id, WORD_HASHES(TOKENS(text)) AS wh
                      FROM documents) AS w) AS sig;""")),

    // SimHash signatures through the dialect (native codegen'd expression
    // under SIMHASH16 when GraftExtensions is registered).
    "q_sql_simhash" -> ((s, dir) => run(s, dir,
      "SELECT doc_id, SIMHASH16(TOKENS(text)) AS sh16 FROM documents;")),

    // Duplicated-substring detection in pure dialect text: FLATTEN explodes
    // the per-doc distinct shingle array, GROUP BY + HAVING cuts on doc
    // frequency — the same one-shuffle word-count plan as
    // q_dedup_hot_ngrams, whose oracle applies verbatim.
    "q_sql_hot_ngrams" -> ((s, dir) => run(s, dir,
      """SELECT h, COUNT(*) AS ndocs
         FROM FLATTEN((SELECT doc_id, SHINGLES3(WORD_HASHES(TOKENS(text))) AS hs
                       FROM documents) AS t, hs AS h)
         GROUP BY h HAVING COUNT(*) >= 3
         ORDER BY ndocs DESC, h;""")),

    // Interval join in dialect text: WITHIN becomes the ±2min range
    // predicate; equi-key on user_id hash-partitions at scale.
    "q_sql_interval_join" -> ((s, dir) => run(s, dir,
      """SELECT a.user_id AS user_id, COUNT(*) AS pairs
         FROM events AS a JOIN events AS b
           ON a.user_id = b.user_id AND a.event_id <> b.event_id
           WITHIN (INTERVAL 2 MINUTE)
         GROUP BY a.user_id;""")),

    // FROM TUMBLE(...) windowed aggregation; window bounds are appended to
    // the output row (Codegen/V1.hs:422-425).
    "q_sql_window_tumble" -> ((s, dir) => run(s, dir,
      """SELECT COUNT(*) AS cnt, SUM(value) AS sv
         FROM TUMBLE(events, INTERVAL 1 DAY);""")),

    // Date/time functions: DATETOSTRING/STRINGTODATE (BinOp.hs op_dateToString
    // /op_stringToDate), :: casts, date literals and comparison.
    "q_sql_datetime" -> ((s, dir) => run(s, dir,
      """SELECT event_id,
                DATETOSTRING(ts :: DATE, 'yyyy-MM-dd') AS d,
                STRINGTODATE(DATETOSTRING(ts :: DATE, 'yyyy-MM-dd'), 'yyyy-MM-dd') AS rt,
                ts :: DATE >= DATE '2024-01-05' AS after5,
                ts :: TIME AS tod,
                ts :: TIME > TIME '12:00:00' AS pm
         FROM events;""")),

    // USING-join with WITHIN through the dialect + FROM subqueries; one
    // surviving key column, range predicate from the interval.
    "q_sql_join_using" -> ((s, dir) => run(s, dir,
      """SELECT user_id, COUNT(*) AS pairs
         FROM (SELECT user_id, ts, event_id FROM events) AS a
         JOIN (SELECT user_id, ts, event_id FROM events) AS b
           USING (user_id) WITHIN (INTERVAL 2 MINUTE)
         WHERE a.event_id <> b.event_id
         GROUP BY user_id;""")),

    // CHAINED (3-way) interval join — dialect EXTENSION (the reference's
    // V1 grammar takes one join per SELECT): left-anchored WITHIN
    // chaining, so b and c are each matched against a's timestamps. Equi-
    // conjuncts on user_id keep both joins hash-partitionable at scale.
    "q_sql_join_threeway" -> ((s, dir) => run(s, dir,
      """SELECT a.user_id AS user_id, COUNT(*) AS triples
         FROM (SELECT user_id, ts, event_id FROM events) AS a
         JOIN (SELECT user_id, ts, event_id FROM events) AS b
           ON a.user_id = b.user_id WITHIN (INTERVAL 30 MINUTE)
         JOIN (SELECT user_id, ts, event_id FROM events) AS c
           ON a.user_id = c.user_id WITHIN (INTERVAL 30 MINUTE)
         WHERE a.event_id <> b.event_id AND b.event_id <> c.event_id
           AND a.event_id <> c.event_id
         GROUP BY user_id;""")),

    // CROSS JOIN WITHIN: pure time-window pairing, no key (the reference's
    // V1 join is secretly always this — empty join key, Codegen/V1.hs:286).
    "q_sql_join_cross" -> ((s, dir) => run(s, dir,
      """SELECT COUNT(*) AS pairs
         FROM (SELECT ts, event_id FROM events) AS a
         CROSS JOIN (SELECT ts, event_id FROM events) AS b
           WITHIN (INTERVAL 1 SECOND)
         WHERE a.event_id <> b.event_id;""")),

    // FULL OUTER interval join through the dialect — join-type fidelity the
    // reference V1 silently drops (Codegen/V1.hs:301). Clicks and errors
    // within 5 minutes per user, unmatched sides preserved as nulls.
    "q_sql_join_full" -> ((s, dir) => run(s, dir,
      """SELECT a.event_id AS click_id, b.event_id AS error_id
         FROM (SELECT user_id, ts, event_id FROM events
               WHERE event_type = 'click') AS a
         FULL JOIN (SELECT user_id, ts, event_id FROM events
                    WHERE event_type = 'error') AS b
           ON a.user_id = b.user_id WITHIN (INTERVAL 5 MINUTE);""")),

    // RIGHT OUTER interval join through the dialect (mirror of
    // q_sql_join_full): every error row preserved, clicks matched within
    // ±5 minutes per user or null. Semantics per the reference V2 engine
    // (DiffFlow/Types.hs:323-328); V1 silently runs INNER.
    "q_sql_join_right" -> ((s, dir) => run(s, dir,
      """SELECT a.event_id AS click_id, b.event_id AS error_id
         FROM (SELECT user_id, ts, event_id FROM events
               WHERE event_type = 'click') AS a
         RIGHT JOIN (SELECT user_id, ts, event_id FROM events
                     WHERE event_type = 'error') AS b
           ON a.user_id = b.user_id WITHIN (INTERVAL 5 MINUTE);""")),

    // RIGHT JOIN ... USING: exercises the surviving-key coalesce (unmatched
    // right rows take the right side's key — Translate.usingJoin).
    "q_sql_join_right_using" -> ((s, dir) => run(s, dir,
      """SELECT user_id, COUNT(*) AS n
         FROM (SELECT user_id, ts, event_id FROM events
               WHERE event_type = 'click') AS a
         RIGHT JOIN (SELECT user_id, ts, event_id FROM events
                     WHERE event_type = 'error') AS b
           USING (user_id) WITHIN (INTERVAL 5 MINUTE)
         GROUP BY user_id;""")),

    // TIME ± INTERVAL arithmetic with midnight wraparound (the reference's
    // TimeOfDay interval model, AST.hs:155-173).
    "q_sql_time_arith" -> ((s, dir) => run(s, dir,
      """SELECT event_id, ts :: TIME AS tod,
                (ts :: TIME) + INTERVAL 90 MINUTE AS plus90,
                (ts :: TIME) - INTERVAL 2 HOUR AS minus2h,
                TIME '23:30:00' + INTERVAL 45 MINUTE AS wrap
         FROM events;""")),

    // HOP window through the dialect (size 1h, advance 30m).
    "q_sql_window_hop" -> ((s, dir) => run(s, dir,
      """SELECT COUNT(*) AS cnt
         FROM HOP(events, INTERVAL 1 HOUR, INTERVAL 30 MINUTE);""")),

    // SESSION window through the dialect (30-min gap, keyed) — completes
    // the FROM-clause window trio in dialect text; bounds are appended
    // (window_start = min ts, window_end = max ts + gap). MAX not SUM for
    // the value: session groups are order-free under max, so the oracle
    // compares exactly without float-summation concerns.
    "q_sql_window_session" -> ((s, dir) => run(s, dir,
      """SELECT user_id, COUNT(*) AS cnt, MAX(value) AS mx
         FROM SESSION(events, INTERVAL 30 MINUTE) GROUP BY user_id;""")),

    // NATURAL join: all shared non-time columns (user_id, value) equal.
    "q_sql_join_natural" -> ((s, dir) => run(s, dir,
      """SELECT user_id, COUNT(*) AS n
         FROM (SELECT user_id, ts, value FROM events) AS a
         NATURAL JOIN (SELECT user_id, ts, value FROM events) AS b
           WITHIN (INTERVAL 2 MINUTE)
         GROUP BY user_id;""")),

    // Dynamic type predicates (UnaryOp.hs IS_INT/IS_NUM/...) over JSON text
    // values — the variant-column form of the reference's per-row checks.
    "q_sql_type_predicates" -> ((s, dir) => run(s, dir,
      """SELECT event_id,
                IS_NUM(props ->> 'k') AS isnum,
                IS_INT(props ->> 'k') AS isint,
                IS_STR(event_type) AS isstr,
                TO_STR(user_id) AS us
         FROM events;""")),

    // ORDER BY + LIMIT (dialect EXTENSION — no production in SQL-v1.cf,
    // SURVEY §2.7; batch/pull only). Unique doc_id tiebreaker makes the
    // top-20 SET deterministic; plans as TakeOrderedAndProject (per-
    // partition top-n + driver merge), never a full sort.
    "q_sql_orderby_limit" -> ((s, dir) => run(s, dir,
      """SELECT doc_id, n_chars FROM documents
         WHERE lang = 'en' ORDER BY n_chars DESC, doc_id LIMIT 20;""")),

    // ORDER BY an aggregate alias with LIMIT: top-3 (flag, status) groups
    // by count. The alias binds to the projected aggregate (standard SQL
    // scope); group keys break ties deterministically.
    "q_sql_topn_groups" -> ((s, dir) => run(s, dir,
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY cnt DESC, l_returnflag, l_linestatus LIMIT 3;""")),

    // CASE (dialect EXTENSION — no CASE production anywhere in SQL-v1/v2
    // .cf). Searched form with priority-ordered branches + simple form
    // with no ELSE (NULL fall-through).
    "q_sql_case" -> ((s, dir) => run(s, dir,
      """SELECT o_orderkey,
                CASE WHEN o_totalprice > 200000.0 THEN 'high'
                     WHEN o_totalprice > 100000.0 THEN 'mid'
                     ELSE 'low' END AS band,
                CASE o_orderstatus WHEN 'F' THEN 'final'
                                   WHEN 'O' THEN 'open' END AS st
         FROM orders ORDER BY o_orderkey;""")),

    // Conditional aggregation (the pivot idiom): CASE under SUM, both
    // forms, mixed with plain aggregates in one Reduce.
    "q_sql_case_agg" -> ((s, dir) => run(s, dir,
      """SELECT l_returnflag,
                SUM(CASE WHEN l_quantity > 25.0 THEN 1 ELSE 0 END) AS big,
                SUM(CASE WHEN l_quantity > 25.0 THEN 0 ELSE 1 END) AS small,
                ROUND(SUM(CASE l_linestatus WHEN 'O' THEN l_quantity
                          ELSE 0.0 END), 2) AS open_qty,
                COUNT(*) AS cnt
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag;""")),

    // Window functions (dialect EXTENSION — SURVEY §2.8: the reference
    // grammar has no OVER clause). Rank-then-filter through a FROM-
    // subquery: top-3 customers by balance per nation. ROW_NUMBER's full
    // ORDER BY (DESC balance, key tiebreak) makes the row set exact.
    "q_sql_row_number" -> ((s, dir) => run(s, dir,
      """SELECT c_nationkey, c_custkey, rn FROM
           (SELECT c_nationkey, c_custkey,
                   ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                      ORDER BY c_acctbal DESC, c_custkey) AS rn
            FROM customer)
         WHERE rn <= 3 ORDER BY c_nationkey, rn;""")),

    // LAG with an explicit default + LEAD with the 1-row default offset,
    // per-customer order sequence. o_orderkey is unique within a
    // partition, so both engines see the identical neighbor rows.
    "q_sql_lag_lead" -> ((s, dir) => run(s, dir,
      """SELECT o_orderkey,
                ROUND(o_totalprice - LAG(o_totalprice, 1, 0.0)
                  OVER (PARTITION BY o_custkey ORDER BY o_orderkey), 2) AS delta,
                LEAD(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS nxt
         FROM orders ORDER BY o_orderkey;""")),

    // Running aggregates + RANK over the default frame (RANGE UNBOUNDED
    // PRECEDING..CURRENT ROW on both engines; the unique ORDER BY key
    // makes RANGE = ROWS, and the per-partition accumulation order —
    // hence the FP sum — identical).
    "q_sql_running_sum" -> ((s, dir) => run(s, dir,
      """SELECT o_orderkey,
                ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                              ORDER BY o_orderkey), 2) AS run_sum,
                COUNT(o_orderkey) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderkey) AS run_cnt,
                RANK() OVER (PARTITION BY o_custkey
                             ORDER BY o_orderpriority, o_orderkey) AS prio_rank
         FROM orders ORDER BY o_orderkey;""")),

    // Set operations (dialect EXTENSION — SURVEY §2.7: no UNION/INTERSECT/
    // EXCEPT production exists in SQL-v1.cf; the reference's V1 codegen
    // throws on its internal Union node, Codegen/V1.hs:457-460). Distinct
    // UNION: nation keys present in either table, deduplicated.
    "q_sql_union" -> ((s, dir) => run(s, dir,
      """SELECT c_nationkey AS k FROM customer
         UNION SELECT s_nationkey AS k FROM supplier;""")),

    // INTERSECT + EXCEPT (parenthesized — identical grouping on both
    // engines): keys in both tables, minus low-numbered nations.
    "q_sql_setops" -> ((s, dir) => run(s, dir,
      """(SELECT c_nationkey AS k FROM customer
         INTERSECT SELECT s_nationkey AS k FROM supplier)
         EXCEPT SELECT n_nationkey AS k FROM nation WHERE n_nationkey < 10;""")),

    // UNION ALL as a FROM-subquery feeding an aggregate: per-nation row
    // counts across both relations in one Catalyst plan (positional
    // matching, one shuffle for the groupBy).
    "q_sql_union_all_agg" -> ((s, dir) => run(s, dir,
      """SELECT k, COUNT(*) AS c
         FROM (SELECT c_nationkey AS k FROM customer
               UNION ALL SELECT s_nationkey AS k FROM supplier) AS u
         GROUP BY k;""")),

    // COUNT/SUM(DISTINCT …) — dialect EXTENSION (the reference has no
    // DISTINCT inside aggregates besides TOPKDISTINCT, SURVEY §2.5).
    // Batch-only; continuous queries are pointed at APPROX_COUNT_DISTINCT
    // (mergeable HyperLogLog state — the 100 TB/streaming form).
    "q_sql_count_distinct" -> ((s, dir) => run(s, dir,
      """SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS cd,
                SUM(DISTINCT l_linenumber) AS sd, COUNT(*) AS cnt
         FROM lineitem GROUP BY l_returnflag;""")),

    // Exact PERCENTILE/MEDIAN (extension): linear interpolation — the same
    // definition as DuckDB quantile_cont, so doubles hash-match. Per-lang
    // doc-length distribution, a standard corpus-stats shape.
    "q_sql_percentile" -> ((s, dir) => run(s, dir,
      """SELECT lang, PERCENTILE(n_chars, 0.5) AS p50,
                PERCENTILE(n_chars, 0.9) AS p90, MEDIAN(n_chars) AS med
         FROM documents GROUP BY lang;""")),

    // LEVENSHTEIN (extension): edit distance of each doc's 32-char prefix
    // to its lowercased form = count of uppercase letters in the prefix —
    // a deterministic per-row probe of the distance kernel.
    "q_sql_levenshtein" -> ((s, dir) => run(s, dir,
      """SELECT doc_id,
                LEVENSHTEIN(TAKE(32, text), TO_LOWER(TAKE(32, text))) AS ucase
         FROM documents;""")),

    // FLATTEN + COUNT(DISTINCT): the vocabulary build through the dialect —
    // FROM FLATTEN(rel, expr AS col) is the dialect's explode/UNNEST
    // (extension), composing with TOKENS and DISTINCT aggregation. Same
    // formula as q_text_vocab, so its oracle applies verbatim.
    "q_sql_vocab" -> ((s, dir) => run(s, dir,
      """SELECT tok, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
         FROM FLATTEN(documents, TOKENS(text) AS tok)
         GROUP BY tok HAVING COUNT(*) >= 10;""")),

    // TOPK — the reference's flagship aggregate (AST.hs:297-301; per-row
    // step undefined in its shipped V1 engine) — through the dialect,
    // composed with FLATTEN over an aggregating subquery to emit the
    // top-value multiset as rows. Values gate bit-exactly without
    // rounding BECAUSE these columns are already float64 in parquet
    // (TOPK casts its input to double — a no-op here; a DECIMAL-typed
    // column would need explicit rounding on both sides).
    "q_sql_topk" -> ((s, dir) => run(s, dir,
      """SELECT l_returnflag, v
         FROM FLATTEN((SELECT l_returnflag, TOPK(l_extendedprice, 5) AS vals
                       FROM lineitem GROUP BY l_returnflag) AS t,
                      vals AS v);""")),

    "q_sql_topk_distinct" -> ((s, dir) => run(s, dir,
      """SELECT l_linestatus, v
         FROM FLATTEN((SELECT l_linestatus, TOPKDISTINCT(l_quantity, 10) AS vals
                       FROM lineitem GROUP BY l_linestatus) AS t,
                      vals AS v);""")),

    // Deterministic stratified sampling through the dialect: BUCKET is the
    // reproducible hash-bucket primitive (the grammar has no % operator);
    // the per-language rate is expressed as a boolean (no CASE in the
    // grammar either). Same draws as q_curation_sample — oracle verbatim.
    "q_sql_sample" -> ((s, dir) => run(s, dir,
      """SELECT doc_id, lang, ARRAY_LENGTH(TOKENS(text)) AS n_tokens
         FROM documents
         WHERE BUCKET(TO_STR(doc_id), 100) < 10
            OR (lang = 'en' AND BUCKET(TO_STR(doc_id), 100) < 30);""")),

    // GROUP BY ROLLUP through the dialect (extension; q_corpus_rollup's
    // plan and oracle): every grouping level in one shuffle, GROUPING_ID()
    // disambiguating levels with the same LSB convention as DuckDB's
    // grouping(). Base lang/source are never null, so IFNULL('<ALL>') is
    // unambiguous and keeps ORDER BY engine-agnostic. AVG spells the
    // oracle's sum::DOUBLE/count — the dialect has no division operator
    // (SQL-v1.cf:201-203), and Spark's Average over longs is the same
    // long-sum-then-double-divide.
    "q_sql_rollup" -> ((s, dir) => run(s, dir,
      """SELECT GROUPING_ID() AS gid,
                IFNULL(lang, '<ALL>') AS lang2,
                IFNULL(source, '<ALL>') AS source2,
                COUNT(*) AS n_docs,
                SUM(n_chars) AS total_chars,
                ROUND(AVG(n_chars), 2) AS avg_chars
         FROM documents GROUP BY ROLLUP (lang, source)
         ORDER BY gid, lang2, source2;""")),

    // ---- expression subqueries (extension — the reference grammar parses
    // subqueries but rejects them, AST.hs:593). The SQL below is standard,
    // so the oracle text is IDENTICAL: DuckDB plans the same semantics its
    // own way, making these true cross-engine checks of the semi/anti/
    // broadcast-join rewrites.

    // IN (SELECT …) → left-semi join; IN value list → null-unsafe isin.
    "q_sql_in_subquery" -> ((s, dir) => run(s, dir,
      """SELECT c_custkey, c_acctbal FROM customer
         WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 1)
           AND c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
           AND c_acctbal > 5000.0
         ORDER BY c_custkey;""")),

    // NOT IN → the null-aware anti join ((l = r) OR isnull(l = r) — the
    // exact shape Spark's ExtractSingleColumnNullAwareAntiJoin broadcasts).
    "q_sql_not_in" -> ((s, dir) => run(s, dir,
      """SELECT n_nationkey, n_name FROM nation
         WHERE n_nationkey NOT IN
           (SELECT c_nationkey FROM customer WHERE c_acctbal > 9900.0)
         ORDER BY n_nationkey;""")),

    // correlated EXISTS → left-semi join on the correlation; the local
    // conjunct (s_acctbal) filters the subquery side below the join.
    "q_sql_exists" -> ((s, dir) => run(s, dir,
      """SELECT n_nationkey, n_name FROM nation AS n
         WHERE EXISTS (SELECT 1 FROM supplier AS s
                       WHERE s.s_nationkey = n.n_nationkey
                         AND s.s_acctbal > 8000.0)
         ORDER BY n_nationkey;""")),

    // correlated NOT EXISTS → left-anti join, mixed with a plain pushdown
    // conjunct that filters BEFORE the join.
    "q_sql_not_exists" -> ((s, dir) => run(s, dir,
      """SELECT c_custkey, c_name FROM customer AS c
         WHERE c_acctbal > 9500.0 AND NOT EXISTS
           (SELECT 1 FROM orders AS o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)
         ORDER BY c_custkey;""")),

    // scalar subqueries in both positions (WHERE + SELECT list), planned
    // as broadcast 1-row cross-joins — the value never leaves the plan.
    // MIN/MAX are exact (no float-sum ordering), so the cut and the
    // subtraction are bit-deterministic across engines.
    "q_sql_scalar_sub" -> ((s, dir) => run(s, dir,
      """SELECT o_orderkey,
                o_totalprice - (SELECT MIN(o_totalprice) FROM orders) AS over_min
         FROM orders
         WHERE o_totalprice * 2.0 > (SELECT MAX(o_totalprice) FROM orders)
         ORDER BY o_orderkey;""")),

    // star modifiers (r8 extension; DuckDB-style): * EXCLUDE drops
    // columns, * REPLACE substitutes a value in place (name/position
    // preserved) — identical text both engines.
    "q_sql_star_modifiers" -> ((s, dir) => run(s, dir,
      """SELECT * EXCLUDE (text) REPLACE (n_chars * 2 AS n_chars)
         FROM documents ORDER BY doc_id;""")),

    // GROUP BY ALL + ORDER BY ALL (r8 extensions; DuckDB-isms): keys
    // inferred from the non-aggregate select items, ordering over every
    // output column left-to-right — both desugared at parse time.
    "q_sql_group_by_all" -> ((s, dir) => run(s, dir,
      """SELECT lang, source, COUNT(*) AS n, MAX(n_chars) AS mx
         FROM documents GROUP BY ALL ORDER BY ALL;""")),

    // aggregate FILTER clauses (r8 extension; DuckDB-compatible):
    // `agg(...) FILTER (WHERE cond)` desugars at parse time to a CASE
    // wrap (exact for null-skipping aggregates); DuckDB plans its native
    // FILTER independently — identical text both engines.
    "q_sql_filter_agg" -> ((s, dir) => run(s, dir,
      """SELECT lang,
                COUNT(*) AS n,
                COUNT(*) FILTER (WHERE n_chars > 500) AS n_big,
                MAX(n_chars) FILTER (WHERE source = 'web') AS max_web,
                MIN(n_chars) FILTER (WHERE source = 'web') AS min_web
         FROM documents GROUP BY lang ORDER BY lang;""")),

    // CORRELATED scalar subqueries (r8 extension): decorrelated into ONE
    // per-key aggregation + a left join — never per-row re-execution.
    // COUNT over an empty group is 0 (the naive-decorrelation bug, fixed
    // by coalesce); MAX keeps NULL for unmatched keys. Identical text.
    "q_sql_corr_scalar" -> ((s, dir) => run(s, dir,
      """SELECT c_custkey,
                (SELECT COUNT(*) FROM orders AS o
                 WHERE o.o_custkey = c_custkey) AS n_orders
         FROM customer ORDER BY c_custkey;""")),

    "q_sql_corr_scalar_max" -> ((s, dir) => run(s, dir,
      """SELECT c_custkey,
                (SELECT MAX(o_totalprice) FROM orders AS o
                 WHERE o.o_custkey = c_custkey
                   AND o.o_totalprice > 100000.0) AS max_big
         FROM customer ORDER BY c_custkey;""")),

    // GROUP BY CUBE: every subset of the grouping columns in ONE shuffle
    // (4 levels here). Same GROUPING_ID()/coalesce conventions as the
    // ROLLUP gate; the CUBE-only level (source alone) is the new coverage.
    "q_sql_cube" -> ((s, dir) => run(s, dir,
      """SELECT GROUPING_ID() AS gid,
                IFNULL(lang, '<ALL>') AS lang2,
                IFNULL(source, '<ALL>') AS source2,
                COUNT(*) AS n_docs, SUM(n_chars) AS total_chars
         FROM documents GROUP BY CUBE (lang, source)
         ORDER BY gid, lang2, source2;""")),

    // GROUP BY GROUPING SETS: explicit level list — (lang, source) detail,
    // lang subtotals, source subtotals (skipping the grand total, which a
    // ROLLUP/CUBE could not express without also emitting other levels).
    "q_sql_grouping_sets" -> ((s, dir) => run(s, dir,
      """SELECT GROUPING_ID() AS gid,
                IFNULL(lang, '<ALL>') AS lang2,
                IFNULL(source, '<ALL>') AS source2,
                COUNT(*) AS n_docs, SUM(n_chars) AS total_chars
         FROM documents
         GROUP BY GROUPING SETS ((lang, source), (lang), (source))
         ORDER BY gid, lang2, source2;""")),

    // ROWS window frames (extension): moving-window aggregates. Every
    // aggregate here is EXACT under reassociation (integral-double sum,
    // min/max/count/first), and the ORDER BY is total (ts, event_id) — so
    // DuckDB's segment-tree windowing and Spark's running evaluation must
    // agree bitwise.
    "q_sql_moving" -> ((s, dir) => run(s, dir,
      """SELECT event_id, user_id,
                SUM(ROUND(value * 100.0)) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id
                    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mv_cents,
                MIN(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS mn5,
                MAX(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mx_run,
                FIRST_VALUE(value) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS fv3,
                COUNT(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS c2
         FROM events ORDER BY event_id;""")),

    // LIMIT + OFFSET pagination (extension): deterministic because the
    // ORDER BY's unique tiebreaker totally orders the relation — the page
    // boundary can't wobble between engines.
    "q_sql_offset" -> ((s, dir) => run(s, dir,
      """SELECT doc_id, lang, n_chars FROM documents
         ORDER BY n_chars DESC, doc_id LIMIT 10 OFFSET 20;""")),

    // RETENTION through the dialect: DISTINCT projection + MIN-date cohort
    // + DATEDIFF (extension) composed in a FROM-subquery so the computed
    // cohort/offset become groupable columns. COUNT(*) equals the
    // DataFrame form's count_distinct because the inner relation is
    // already distinct per (user, day).
    "q_sql_retention" -> ((s, dir) => run(s, dir,
      """SELECT cohort_day, day_offset, COUNT(*) AS n_users
         FROM (SELECT user_id, c0 AS cohort_day,
                      DATEDIFF(d, c0) AS day_offset
               FROM (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
                     FROM events) AS a
               JOIN (SELECT user_id, MIN(CAST(ts AS DATE)) AS c0
                     FROM events GROUP BY user_id) AS cd
                 USING (user_id)) AS x
         GROUP BY cohort_day, day_offset
         ORDER BY cohort_day, day_offset;""")),

    // FUNNEL through the dialect — q_events_funnel's chained per-step min
    // aggregations composed from FROM-subqueries, JOIN USING, timestamp
    // MIN, ts + INTERVAL arithmetic, LEFT JOIN, CASE, and the new
    // IS [NOT] NULL — one query exercising most of the relational
    // frontend at once. Same plan family as the DataFrame form: partial-
    // agg shuffles on user_id, no per-user sort.
    "q_sql_funnel" -> ((s, dir) => run(s, dir,
      """SELECT user_id, t1, t2, t3,
                CASE WHEN t3 IS NOT NULL THEN 3
                     WHEN t2 IS NOT NULL THEN 2 ELSE 1 END AS reached
         FROM (SELECT user_id, MIN(ts) AS t1 FROM events
               WHERE event_type = 'view' GROUP BY user_id) AS s1
         LEFT JOIN (SELECT user_id, MIN(e.ts) AS t2
                    FROM events AS e
                    JOIN (SELECT user_id, MIN(ts) AS t1 FROM events
                          WHERE event_type = 'view' GROUP BY user_id) AS v
                      USING (user_id)
                    WHERE e.event_type = 'click' AND e.ts > v.t1
                      AND e.ts <= v.t1 + INTERVAL 24 HOUR
                    GROUP BY user_id) AS s2 USING (user_id)
         LEFT JOIN (SELECT user_id, MIN(e2.ts) AS t3
                    FROM events AS e2
                    JOIN (SELECT user_id, MIN(e.ts) AS t2
                          FROM events AS e
                          JOIN (SELECT user_id, MIN(ts) AS t1 FROM events
                                WHERE event_type = 'view'
                                GROUP BY user_id) AS v
                            USING (user_id)
                          WHERE e.event_type = 'click' AND e.ts > v.t1
                            AND e.ts <= v.t1 + INTERVAL 24 HOUR
                          GROUP BY user_id) AS c USING (user_id)
                    WHERE e2.event_type = 'purchase' AND e2.ts > c.t2
                      AND e2.ts <= c.t2 + INTERVAL 24 HOUR
                    GROUP BY user_id) AS s3 USING (user_id)
         ORDER BY user_id;""")),

    // QUALIFY (DuckDB-compatible extension): rank-then-filter WITHOUT a
    // FROM-subquery — the predicate references the window by its select
    // alias; the window computes as a hidden column below the filter
    // (window fns are illegal in a bare WHERE), and rank<=k is the shape
    // Spark's InferWindowGroupLimit turns into a partial+final per-group
    // top-k, so no per-language total sort survives in the plan.
    "q_sql_qualify" -> ((s, dir) => run(s, dir,
      """SELECT doc_id, lang, n_chars,
                ROW_NUMBER() OVER (PARTITION BY lang
                    ORDER BY n_chars DESC, doc_id) AS rk
         FROM documents QUALIFY rk <= 2 ORDER BY lang, rk;""")),

    // WITH / common table expressions (r8 extension; DuckDB-compatible):
    // desugared at parse time into aliased FROM-subqueries — chained CTEs
    // (later referencing earlier) and the full Catalyst pipeline below
    // them. Identical text on both engines.
    "q_sql_cte" -> ((s, dir) => run(s, dir,
      """WITH big AS (SELECT l_orderkey, l_quantity, l_extendedprice
                      FROM lineitem WHERE l_quantity >= 30),
              agg AS (SELECT l_orderkey, COUNT(*) AS n,
                             ROUND(SUM(l_extendedprice), 2) AS rev
                      FROM big GROUP BY l_orderkey)
         SELECT l_orderkey, n, rev FROM agg WHERE n >= 3
         ORDER BY l_orderkey;""")),

    // WITH RECURSIVE (r8 extension): iterative fixpoint tables, planned
    // as a driver-orchestrated loop of distributed steps with semi-naive
    // evaluation (the recursive reference is the previous round's DELTA
    // under UNION) and per-round lineage truncation — the same shape as
    // Graph.connectedComponents. Identical text on both engines.
    "q_sql_recursive_series" -> ((s, dir) => run(s, dir,
      """WITH RECURSIVE t AS (
           SELECT 0 AS i FROM region WHERE r_regionkey = 0
           UNION ALL
           SELECT i + 1 AS i FROM t WHERE i < 10)
         SELECT i FROM t ORDER BY i;""")),

    // transitive closure over a derived 13-node chain, UNION (set)
    // semantics: the seen-set dedup is what guarantees termination
    "q_sql_recursive_paths" -> ((s, dir) => run(s, dir,
      """WITH RECURSIVE e AS (
           SELECT n_nationkey AS src, n_nationkey + 1 AS dst
           FROM nation WHERE n_nationkey < 12),
         reach AS (
           SELECT src, dst FROM e
           UNION
           SELECT r.src AS src, e2.dst AS dst
           FROM reach AS r JOIN e AS e2 ON r.dst = e2.src)
         SELECT src, dst FROM reach ORDER BY src, dst;""")),

    // one CTE referenced TWICE — in the FROM clause and inside a scalar
    // subquery (each reference expands to its own subtree; Catalyst's
    // subquery/exchange reuse dedups the work where profitable)
    "q_sql_cte_twice" -> ((s, dir) => run(s, dir,
      """WITH s AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang)
         SELECT lang, n FROM s WHERE n < (SELECT MAX(n) FROM s)
         ORDER BY lang;""")),

    // QUALIFY evaluation ORDER (ADVICE r7): windows compute FIRST over the
    // whole post-WHERE relation, THEN the filter — so the select-list SUM
    // aggregates the full language partition (not the survivors) and
    // rk = 2 keeps the true second-ranked doc (a filter-first evaluation
    // would re-rank survivors to rk=1 and return nothing). Identical text
    // on both engines.
    "q_sql_qualify_order" -> ((s, dir) => run(s, dir,
      """SELECT doc_id, lang, n_chars,
                SUM(n_chars * 1.0) OVER (PARTITION BY lang) AS lang_chars,
                ROW_NUMBER() OVER (PARTITION BY lang
                    ORDER BY n_chars DESC, doc_id) AS rk
         FROM documents QUALIFY rk = 2 ORDER BY lang;""")),

    // RANGE frames (value-typed offsets on the single numeric ORDER BY
    // key): Spark's rangeBetween and DuckDB agree on offset arithmetic
    // and peer (tie) inclusion, so identical text gates both engines.
    "q_sql_range_frame" -> ((s, dir) => run(s, dir,
      """SELECT event_id, user_id,
                SUM(ROUND(value * 100.0)) OVER (PARTITION BY user_id
                    ORDER BY event_id
                    RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS rsum,
                COUNT(value) OVER (PARTITION BY user_id ORDER BY event_id
                    RANGE BETWEEN 500 PRECEDING AND 500 FOLLOWING) AS rcnt
         FROM events ORDER BY event_id;""")),

    // STRING_AGG (ordered aggregate; extension, r9): ORDER BY inside the
    // call is MANDATORY (unordered concatenation is nondeterministic —
    // the same reproducibility rule as DISTINCT ON). Multi-key + DESC
    // exercised; non-string values cast to string. DuckDB's native
    // string_agg(... ORDER BY ...) is the oracle.
    "q_sql_string_agg" -> ((s, dir) => run(s, dir,
      """SELECT lang,
                STRING_AGG(doc_id, ',' ORDER BY doc_id) AS ids,
                STRING_AGG(source, '|' ORDER BY n_chars DESC, doc_id) AS srcs
         FROM documents WHERE doc_id % 7 = 0
         GROUP BY lang ORDER BY lang;""")),

    // GROUPING(col) — per-column rollup indicator (standard SQL;
    // extension, r9): 1 on output rows that aggregate the column away.
    // CUBE exercises every indicator combination.
    "q_sql_grouping" -> ((s, dir) => run(s, dir,
      """SELECT IFNULL(lang, '<ALL>') AS lang2,
                IFNULL(source, '<ALL>') AS source2,
                GROUPING(lang) AS g_lang,
                GROUPING(source) AS g_source,
                COUNT(*) AS n_docs
         FROM documents GROUP BY CUBE (lang, source)
         ORDER BY g_lang, g_source, lang2, source2;""")),

    // ARRAY_AGG (ordered aggregate; extension, r9): same mandatory
    // in-call ORDER BY as STRING_AGG, values keep their type. DuckDB's
    // native array_agg(... ORDER BY ...) is the oracle. Cells are
    // serialized via ARRAY_JOIN so the compare harness sorts scalars
    // (raw array cells are unsortable there; same convention as
    // q_array_funcs) — the ordered ARRAY_AGG plan still runs end-to-end,
    // and the typed-array semantics stay pinned in StringAggSpec.
    // n_elems: ARRAY_JOIN drops NULL elements, so the serialized cells
    // alone can't witness the keeps-NULLs contract — the length of an
    // array with synthesized NULL elements pins retention at the gate
    // (r10 ADVICE).
    "q_sql_array_agg" -> ((s, dir) => run(s, dir,
      """SELECT lang,
                ARRAY_JOIN(ARRAY_AGG(source ORDER BY n_chars DESC, doc_id), '|') AS srcs,
                ARRAY_JOIN(ARRAY_AGG(doc_id::STRING ORDER BY doc_id), ',') AS ids,
                ARRAY_LENGTH(ARRAY_AGG(
                  CASE WHEN doc_id % 3 = 0 THEN NULL ELSE source END
                  ORDER BY doc_id)) AS n_elems
         FROM documents WHERE doc_id % 13 = 0
         GROUP BY lang ORDER BY lang;""")),

    // ARRAY_AGG + FILTER (r11; DuckDB-native semantics): filtered-out
    // rows VANISH while genuine NULL values stay as NULL elements — the
    // CASE desugar every other aggregate uses can't express this, so the
    // translator collects when(cond, struct(…)) and collect_list drops
    // the NULL inputs pre-shuffle (Ast.Kept). A group where no row
    // passes is NULL, not []. n_kept counts kept rows INCLUDING NULL
    // elements; the joined cells witness order + values.
    "q_sql_array_agg_filter" -> ((s, dir) => run(s, dir,
      """SELECT lang,
                ARRAY_JOIN(ARRAY_AGG(source ORDER BY n_chars DESC, doc_id)
                           FILTER (WHERE n_chars > 1200), '|') AS srcs_big,
                ARRAY_LENGTH(ARRAY_AGG(
                    CASE WHEN doc_id % 3 = 0 THEN NULL ELSE source END
                    ORDER BY doc_id)
                  FILTER (WHERE n_chars > 1200)) AS n_kept,
                COUNT(*) AS n_docs
         FROM documents WHERE doc_id % 11 = 0
         GROUP BY lang ORDER BY lang;""")),

    // PERCENT_RANK / CUME_DIST / NTH_VALUE (extensions, r9; all native in
    // Spark AND DuckDB, so the oracle re-plans them independently). The
    // rank pair runs over a TIED order key (ROUND(value * 0.01)) to pin
    // tie semantics; NTH_VALUE orders on the unique event_id (a tied
    // ORDER BY would make its frame nondeterministic).
    "q_sql_window_rank_dist" -> ((s, dir) => run(s, dir,
      """SELECT event_id,
                ROUND(PERCENT_RANK() OVER (PARTITION BY user_id
                    ORDER BY ROUND(value * 0.01)), 6) AS pr,
                ROUND(CUME_DIST() OVER (PARTITION BY user_id
                    ORDER BY ROUND(value * 0.01)), 6) AS cd,
                NTH_VALUE(ROUND(value * 100.0), 2) OVER (PARTITION BY user_id
                    ORDER BY event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nv2
         FROM events ORDER BY event_id;""")),

    // IGNORE NULLS on the offset/value window functions (standard SQL;
    // extension, r10; native in BOTH Spark and DuckDB, so the oracle
    // re-plans it independently). The CTE nulls every 7th value;
    // LAST_VALUE IGNORE NULLS over a running frame is the classic
    // fill-forward.
    "q_sql_ignore_nulls" -> ((s, dir) => run(s, dir,
      """WITH e AS (SELECT event_id, user_id,
                           CASE WHEN event_id % 7 = 0 THEN NULL
                                ELSE ROUND(value * 100.0) END AS v
                    FROM events)
         SELECT event_id, user_id,
                LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id
                    ORDER BY event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fill_fwd,
                FIRST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id
                    ORDER BY event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_nn,
                LAG(v, 1 IGNORE NULLS) OVER (PARTITION BY user_id
                    ORDER BY event_id) AS prev_nn,
                NTH_VALUE(v, 2 IGNORE NULLS) OVER (PARTITION BY user_id
                    ORDER BY event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nv2
         FROM e ORDER BY event_id;""")),

    // NULL ordering (r10): the dialect defaults to NULLS LAST in BOTH
    // directions — DuckDB's default, NOT Spark's (asc = nulls first) —
    // and accepts explicit NULLS FIRST/LAST. Row order alone is
    // invisible to the hash compare (it re-sorts), so each variant is
    // pinned through a LIMIT cut whose SET depends on null placement
    // (unique event_id tiebreak keeps every cut deterministic).
    "q_sql_null_order" -> ((s, dir) => run(s, dir,
      """WITH e AS (SELECT event_id,
                           CASE WHEN event_id % 5 = 0 THEN NULL
                                ELSE ROUND(value * 100.0) END AS v
                    FROM events)
         SELECT 'asc_default' AS tag, event_id, v
         FROM (SELECT event_id, v FROM e ORDER BY v, event_id LIMIT 40) AS a
         UNION ALL
         SELECT 'asc_nulls_first' AS tag, event_id, v
         FROM (SELECT event_id, v FROM e
               ORDER BY v NULLS FIRST, event_id LIMIT 40) AS b
         UNION ALL
         SELECT 'desc_default' AS tag, event_id, v
         FROM (SELECT event_id, v FROM e
               ORDER BY v DESC, event_id LIMIT 40) AS c
         ORDER BY tag, event_id;""")),

    // `/` and `%` arithmetic (extensions, r9 — the reference grammar has
    // only + - *; division there exists solely inside builtins): `/` is
    // real division (integer ÷ integer = FLOAT, DuckDB's rule), `%` keeps
    // the dividend's sign. The negative-operand row pins the sign rule.
    "q_sql_div_mod" -> ((s, dir) => run(s, dir,
      """SELECT event_id,
                ROUND(value / 7.0, 6) AS dv,
                event_id % 7 AS m_int,
                ROUND(value % 3.5, 6) AS m_f,
                event_id / 4 AS int_div,
                (0 - event_id) % 7 AS m_neg,
                event_id / (event_id % 2) AS div_zero,
                event_id % (event_id % 2) AS mod_zero
         FROM events ORDER BY event_id;""")),

    // Named WINDOW clause (standard SQL; extension, r9; DuckDB supports
    // it natively): one spec, referenced by several window functions —
    // resolution is parse-time and per-SELECT (subqueries own their
    // clause). The shared spec also means Spark plans ONE window
    // partition/sort for all three functions.
    "q_sql_window_clause" -> ((s, dir) => run(s, dir,
      """SELECT event_id, user_id,
                SUM(ROUND(value * 100.0)) OVER w AS ws,
                COUNT(value) OVER w AS wc,
                ROW_NUMBER() OVER w2 AS rn
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
                w2 AS (PARTITION BY user_id ORDER BY event_id)
         ORDER BY event_id;""")),

    // STRING_AGG / ARRAY_AGG as WINDOW functions (extension, r10;
    // batch/pull only): the OVER clause frames rows, the mandatory
    // in-call ORDER BY sorts the collected elements — independent axes
    // (types_by_val frames by event_id but sorts elements by value).
    // DuckDB 1.0 can't parse in-call ORDER BY on a window fn, so the
    // oracle is the DEFINITIONAL form: row_number the partition, then a
    // correlated ordered-aggregate subquery over the frame's row range.
    "q_sql_string_agg_window" -> ((s, dir) => run(s, dir,
      """SELECT event_id, user_id,
                STRING_AGG(event_type, ',' ORDER BY ROUND(value * 100.0) DESC,
                           event_id) OVER (PARTITION BY user_id
                    ORDER BY event_id
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS types_by_val,
                ARRAY_JOIN(ARRAY_AGG(event_id::STRING ORDER BY event_id)
                    OVER (PARTITION BY user_id ORDER BY event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                    '|') AS ids_run
         FROM events ORDER BY event_id;""")),

    // Window refinement + chaining (standard SQL; extension, r10; DuckDB
    // native): `OVER (w …)` extends a named base (inherits PARTITION BY,
    // and ORDER BY unless the base lacks one; base must be frameless),
    // and a WINDOW definition may itself refine an earlier one
    // (wo = wp + ORDER BY). Three use sites: frame added at the use
    // site over the chained window, ORDER BY added at the use site over
    // the partition-only base, and a bare reference to the chained
    // window (default frame).
    "q_sql_window_refine" -> ((s, dir) => run(s, dir,
      """SELECT event_id, user_id,
                SUM(ROUND(value * 100.0)) OVER (wo ROWS BETWEEN 2 PRECEDING
                    AND CURRENT ROW) AS s_frame,
                COUNT(value) OVER (wp ORDER BY event_id
                    ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS c_ord,
                ROW_NUMBER() OVER wo AS rn
         FROM events
         WINDOW wp AS (PARTITION BY user_id),
                wo AS (wp ORDER BY event_id)
         ORDER BY event_id;""")),

    // Frame EXCLUDE (extension, r9; DuckDB supports it natively so the
    // oracle is fully independent): the excluded set sits at order
    // distance 0, so whether it intersects the frame is statically
    // decidable; the planner subtracts the excluded set's aggregate from
    // the frame aggregate (one extra peers window for GROUP/TIES), with
    // empty-after-exclusion mapped to SQL's empty-set values. ORDER BY
    // event_id % 7 manufactures heavy ties so GROUP/TIES visibly differ
    // from CURRENT ROW. FrameOracleSpec pins the same semantics against
    // a brute-force row-at-a-time evaluator on randomized tables.
    "q_sql_frame_exclude" -> ((s, dir) => run(s, dir,
      """SELECT event_id, user_id,
                SUM(ROUND(value * 100.0)) OVER (PARTITION BY user_id
                    ORDER BY event_id
                    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
                    EXCLUDE CURRENT ROW) AS s_excur,
                COUNT(value) OVER (PARTITION BY user_id
                    ORDER BY ROUND(value * 0.01)
                    RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING
                    EXCLUDE GROUP) AS c_exgrp,
                ROUND(AVG(ROUND(value * 100.0)) OVER (PARTITION BY user_id
                    ORDER BY ROUND(value * 0.01)
                    RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING
                    EXCLUDE TIES), 6) AS a_exties
         FROM events ORDER BY event_id;""")),

    // MIN/MAX with frame EXCLUDE (extension, r10): not subtractable, so
    // the planner decomposes EXCLUDE CURRENT ROW on a ROWS frame into the
    // aggregate over the prefix [lo,-1] combined with the suffix [+1,hi]
    // (exact; DuckDB plans its native EXCLUDE independently). The three
    // frames exercise both-sided, prefix-only (empty at partition start)
    // and suffix-only (empty at partition end) shapes.
    "q_sql_frame_exclude_minmax" -> ((s, dir) => run(s, dir,
      """SELECT event_id, user_id,
                MIN(ROUND(value * 100.0)) OVER (PARTITION BY user_id
                    ORDER BY event_id
                    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
                    EXCLUDE CURRENT ROW) AS mn_both,
                MAX(ROUND(value * 100.0)) OVER (PARTITION BY user_id
                    ORDER BY event_id
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
                    EXCLUDE CURRENT ROW) AS mx_pre,
                MIN(ROUND(value * 100.0)) OVER (PARTITION BY user_id
                    ORDER BY event_id
                    ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING
                    EXCLUDE CURRENT ROW) AS mn_suf
         FROM events ORDER BY event_id;""")),

    // MIN/MAX with EXCLUDE GROUP/TIES on GROUPS frames (extension, r10):
    // in peer-group-ordinal space the peer set is exactly ordinal
    // distance 0, so the prefix/suffix decomposition stays exact (TIES
    // adds the current row's own value back). ORDER BY event_type makes
    // peer groups big; the oracle is the same definitional dense_rank
    // expansion q_sql_groups_frame uses, with DuckDB's NATIVE EXCLUDE on
    // the RANGE-over-ordinal frame.
    "q_sql_groups_exclude_minmax" -> ((s, dir) => run(s, dir,
      """SELECT event_id, user_id, event_type,
                MIN(ROUND(value * 100.0)) OVER (PARTITION BY user_id
                    ORDER BY event_type
                    GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING
                    EXCLUDE GROUP) AS mn_exgrp,
                MAX(ROUND(value * 100.0)) OVER (PARTITION BY user_id
                    ORDER BY event_type
                    GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING
                    EXCLUDE TIES) AS mx_exties
         FROM events ORDER BY event_id;""")),

    // MIN/MAX with EXCLUDE on value-typed RANGE frames + EXCLUDE CURRENT
    // ROW on GROUPS frames (extension, r11): no prefix/suffix
    // decomposition exists there (value offsets can't isolate the peer
    // set), so the planner collects the frame's values and evaluates the
    // exclusion literally — exact, O(frame) per row. ORDER BY the coarse
    // value bucket makes peer groups big; DuckDB plans its native RANGE
    // EXCLUDE for the first three columns, and the dense_rank expansion
    // carries EXCLUDE CURRENT ROW for the GROUPS column.
    "q_sql_range_exclude_minmax" -> ((s, dir) => run(s, dir,
      """SELECT event_id, user_id,
                MIN(ROUND(value * 100.0)) OVER (PARTITION BY user_id
                    ORDER BY ROUND(value * 0.01)
                    RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING
                    EXCLUDE CURRENT ROW) AS mn_excur,
                MAX(ROUND(value * 100.0)) OVER (PARTITION BY user_id
                    ORDER BY ROUND(value * 0.01)
                    RANGE BETWEEN 1 PRECEDING AND 3 FOLLOWING
                    EXCLUDE GROUP) AS mx_exgrp,
                MIN(ROUND(value * 100.0)) OVER (PARTITION BY user_id
                    ORDER BY ROUND(value * 0.01)
                    RANGE BETWEEN 2 PRECEDING AND CURRENT ROW
                    EXCLUDE TIES) AS mn_exties,
                MAX(ROUND(value * 100.0)) OVER (PARTITION BY user_id
                    ORDER BY event_type
                    GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING
                    EXCLUDE CURRENT ROW) AS mx_gcur
         FROM events ORDER BY event_id;""")),

    // ROWS + EXCLUDE GROUP/TIES (extension, r12): the positional frame
    // boundary can cut through the value-based peer group, so the planner
    // evaluates the exclusion literally over the collected frame (order
    // keys + value structs, null-safe peer filter). A ROWS frame over
    // TIED keys is positional — which peer occupies which offset is
    // engine-chosen — so every column here is permutation-INVARIANT: the
    // aggregated values are functions of the order key (the value
    // sequence in sort order is then engine-independent), the UNBOUNDED
    // column is value-set-based, and the output carries no per-row id, so
    // the sorted-rows compare sees the same multiset from any engine.
    // DuckDB plans its native ROWS EXCLUDE independently.
    "q_sql_rows_exclude_group" -> ((s, dir) => run(s, dir,
      """SELECT user_id, ROUND(value * 0.01) AS bkt,
                SUM(ROUND(value * 0.01) * 3 + 1) OVER (PARTITION BY user_id
                    ORDER BY ROUND(value * 0.01)
                    ROWS BETWEEN 3 PRECEDING AND 1 FOLLOWING
                    EXCLUDE GROUP) AS sg,
                COUNT(value) OVER (PARTITION BY user_id
                    ORDER BY ROUND(value * 0.01)
                    ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING
                    EXCLUDE TIES) AS ct,
                MIN(ROUND(value * 100.0)) OVER (PARTITION BY user_id
                    ORDER BY ROUND(value * 0.01)
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
                    EXCLUDE GROUP) AS mng,
                SUM(ROUND(value * 0.01) * 2) OVER (PARTITION BY user_id
                    ORDER BY ROUND(value * 0.01)
                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
                    EXCLUDE TIES) AS sp
         FROM events ORDER BY user_id, bkt;""")),

    // frame EXCLUDE on the FRAME-VALUED functions (extension, r13):
    // FIRST/LAST/NTH_VALUE are a value AT a frame position, not a
    // subtractable aggregate, so the planner collects (identity, value)
    // structs over the frame and deletes the excluded rows literally
    // (identity = row_number in the same window sort pass). Every
    // aggregated value is a function of the order key, so the positional
    // tie ambiguity of ROWS frames is invisible (the
    // q_sql_rows_exclude_group protocol); all frames REACH the current
    // row (duckdb_pins.py #6). DuckDB plans its native EXCLUDE on these
    // functions independently — identical text. The IGNORE NULLS column
    // pins the exclusion-then-null-skip evaluation order on a RANGE
    // frame.
    "q_sql_frame_exclude_firstlast" -> ((s, dir) => run(s, dir,
      """SELECT user_id, ROUND(value * 0.01) AS bkt,
                FIRST_VALUE(ROUND(value * 0.01) * 3 + 1) OVER (
                    PARTITION BY user_id ORDER BY ROUND(value * 0.01)
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
                    EXCLUDE GROUP) AS fg,
                LAST_VALUE(ROUND(value * 0.01) * 2) OVER (
                    PARTITION BY user_id ORDER BY ROUND(value * 0.01)
                    ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING
                    EXCLUDE TIES) AS lt,
                NTH_VALUE(ROUND(value * 0.01) * 5 - 2, 2) OVER (
                    PARTITION BY user_id ORDER BY ROUND(value * 0.01)
                    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING
                    EXCLUDE CURRENT ROW) AS n2,
                FIRST_VALUE(CASE WHEN CAST(ROUND(value * 0.01) AS INTEGER)
                                      % 3 = 0 THEN NULL
                                 ELSE ROUND(value * 0.01) * 7 END
                    IGNORE NULLS) OVER (
                    PARTITION BY user_id ORDER BY ROUND(value * 0.01)
                    RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING
                    EXCLUDE GROUP) AS fig
         FROM events ORDER BY user_id, bkt;""")),

    // GROUPS frames (extension; DuckDB supports them natively): bounds
    // count peer groups — tie classes of the ORDER BY keys. ORDER BY
    // event_type makes each user's peer groups big (ties everywhere), so
    // GROUPS visibly diverges from ROWS/RANGE; Spark has no GROUPS mode,
    // so the planner rewrites to RANGE over a hidden dense_rank ordinal
    // (the literal definition of a peer-group frame).
    "q_sql_groups_frame" -> ((s, dir) => run(s, dir,
      """SELECT event_id, user_id, event_type,
                SUM(ROUND(value * 100.0)) OVER (PARTITION BY user_id
                    ORDER BY event_type
                    GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS gsum,
                COUNT(value) OVER (PARTITION BY user_id ORDER BY event_type
                    GROUPS BETWEEN CURRENT ROW AND 1 FOLLOWING) AS gcnt
         FROM events ORDER BY event_id;""")),

    // DISTINCT ON (DuckDB-compatible): latest/best-per-key in one clause —
    // first row per lang in ORDER BY order (ORDER BY is required: the
    // deterministic pick is the engine's reproducibility contract). Plans
    // as rank=1 → InferWindowGroupLimit's map-side per-group top-1.
    "q_sql_distinct_on" -> ((s, dir) => run(s, dir,
      """SELECT DISTINCT ON (lang) doc_id, lang, n_chars
         FROM documents ORDER BY lang, n_chars DESC, doc_id;""")),

    // SELECT DISTINCT (extension): projection-then-dedup, one shuffle on
    // the output columns.
    "q_sql_distinct" -> ((s, dir) => run(s, dir,
      """SELECT DISTINCT lang, source FROM documents
         ORDER BY lang, source;""")),

    // ASOF LEFT JOIN through the dialect (DuckDB-compatible syntax —
    // q_join_asof's plan and oracle verbatim): each click picks the user's
    // single latest purchase at-or-before its ts; union-trick single
    // shuffle, no range self-join. Payload columns renamed disjoint in the
    // FROM-subquery, as the operator's contract asks.
    "q_sql_asof" -> ((s, dir) => run(s, dir,
      """SELECT c.event_id AS event_id, c.user_id AS user_id, c.ts AS ts,
                c.click_value AS click_value, purchase_value, purchase_ts
         FROM (SELECT event_id, user_id, ts, ROUND(value, 4) AS click_value
               FROM events WHERE event_type = 'click') AS c
         ASOF LEFT JOIN
              (SELECT user_id AS p_user, ts AS pts,
                      ROUND(value, 4) AS purchase_value, ts AS purchase_ts
               FROM events WHERE event_type = 'purchase') AS p
         ON c.user_id = p.p_user AND c.ts >= p.pts
         ORDER BY event_id;""")),

    // FORWARD ASOF through the dialect: the `<=` inequality flips the
    // pick to earliest-at-or-after (DuckDB's other ASOF form) — same
    // union-trick plan, FOLLOWING frame.
    "q_sql_asof_fwd" -> ((s, dir) => run(s, dir,
      """SELECT c.event_id AS event_id, c.user_id AS user_id, c.ts AS ts,
                c.click_value AS click_value, purchase_value, purchase_ts
         FROM (SELECT event_id, user_id, ts, ROUND(value, 4) AS click_value
               FROM events WHERE event_type = 'click') AS c
         ASOF LEFT JOIN
              (SELECT user_id AS p_user, ts AS pts,
                      ROUND(value, 4) AS purchase_value, ts AS purchase_ts
               FROM events WHERE event_type = 'purchase') AS p
         ON c.user_id = p.p_user AND c.ts <= p.pts
         ORDER BY event_id;""")),

    // inner ASOF: unmatched clicks drop (the marker-payload path).
    "q_sql_asof_inner" -> ((s, dir) => run(s, dir,
      """SELECT c.event_id AS event_id, c.user_id AS user_id,
                c.click_value AS click_value, purchase_value
         FROM (SELECT event_id, user_id, ts, ROUND(value, 4) AS click_value
               FROM events WHERE event_type = 'click') AS c
         ASOF JOIN
              (SELECT user_id AS p_user, ts AS pts,
                      ROUND(value, 4) AS purchase_value
               FROM events WHERE event_type = 'purchase') AS p
         ON c.user_id = p.p_user AND c.ts >= p.pts
         ORDER BY event_id;"""))
  )

  override def oracleSql: Map[String, String] = Map(
    "q_sql_filter_project" ->
      """SELECT event_id, user_id, value*2-1 AS v2 FROM events
         WHERE event_type = 'purchase' AND value > 100.0""",
    "q_sql_math" ->
      """SELECT event_id,
         round(sin(value) * 1000000) AS sin6,
         round(cos(value) * 1000000) AS cos6,
         round(sqrt(abs(value)) * 1000000) AS sqrt6,
         round(ln(abs(value) + 1) * 1000000) AS log6,
         round(exp(0 - abs(value)) * 1000000) AS exp6,
         sign(value)::DOUBLE AS sg,
         ceil(value)::BIGINT AS ce, floor(value)::BIGINT AS fl
         FROM events""",
    "q_sql_string" ->
      """SELECT doc_id,
         reverse(left(text, 6)) AS rev6,
         lower(upper(left(text, 8))) AS roundtrip,
         array_to_string(list_transform(
           range(0, CAST(ceil(length(left(text, 12)) / 4.0) AS BIGINT)),
           i -> substr(left(text, 12), i * 4 + 1, 4)), '|') AS chunks,
         array_to_string(string_split(left(text, 20), ' '), '+') AS words
         FROM documents""",
    "q_sql_agg_having" ->
      """SELECT l_returnflag, count(*) AS cnt, sum(l_quantity) AS sq,
         min(l_quantity) AS mn, max(l_quantity) AS mx, avg(l_quantity) AS av
         FROM lineitem GROUP BY 1 HAVING count(*) > 10""",
    "q_sql_scalar" ->
      """SELECT doc_id, upper(lang) AS u, length(text) AS n,
         left(text, 8) AS t8,
         left(text, greatest(length(text) - 200, 0)) AS d200,
         coalesce(nullif(source, 'src0'), 'zero') AS nn,
         CAST(n_chars AS DOUBLE) AS nc,
         n_chars BETWEEN 100 AND 2000 AS inrange
         FROM documents""",
    "q_sql_json" ->
      """SELECT event_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS v_num,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS vp_num,
         json_extract_string(props, '$.k') AS v_text,
         json_extract_string(props, '$.k') AS vp_text FROM events""",
    // same md5 formulas ⇒ the dedup oracles apply verbatim
    "q_sql_minhash" -> DedupQueries.oracleSql("q_minhash_signatures"),
    "q_sql_simhash" -> DedupQueries.oracleSql("q_dedup_simhash"),
    "q_sql_hot_ngrams" -> DedupQueries.oracleSql("q_dedup_hot_ngrams"),
    "q_sql_interval_join" ->
      """WITH ev AS (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events)
         SELECT a.user_id AS user_id, count(*) AS pairs
         FROM ev a JOIN ev b ON a.user_id = b.user_id
           AND a.event_id <> b.event_id
           AND b.ts >= a.ts - INTERVAL '2 minutes'
           AND b.ts <= a.ts + INTERVAL '2 minutes'
         GROUP BY 1""",
    "q_sql_window_tumble" ->
      """WITH ev AS (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events)
         SELECT count(*) AS cnt, sum(value) AS sv,
           date_trunc('day', ts) AS window_start,
           date_trunc('day', ts) + INTERVAL '1 day' AS window_end
         FROM ev GROUP BY date_trunc('day', ts)""",
    "q_sql_datetime" ->
      """WITH ev AS (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events)
         SELECT event_id,
           strftime(ts::DATE, '%Y-%m-%d') AS d,
           strptime(strftime(ts::DATE, '%Y-%m-%d'), '%Y-%m-%d')::DATE AS rt,
           ts::DATE >= DATE '2024-01-05' AS after5,
           strftime(ts, '%H:%M:%S') AS tod,
           strftime(ts, '%H:%M:%S') > '12:00:00' AS pm
         FROM ev""",
    "q_sql_join_using" ->
      """WITH ev AS (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events)
         SELECT a.user_id AS user_id, count(*) AS pairs
         FROM ev a JOIN ev b ON a.user_id = b.user_id
           AND a.event_id <> b.event_id
           AND b.ts >= a.ts - INTERVAL '2 minutes'
           AND b.ts <= a.ts + INTERVAL '2 minutes'
         GROUP BY 1""",
    // Oracle uses the closed form instead of the literal 3-way join: b and
    // c range over the SAME band around anchor a (independent given a), so
    // triples(a) = n·(n−1) with n = |band(a) \ {a}| — exactly the original
    // count with the b≠c / a≠b / a≠c exclusions. The literal triple join
    // took DuckDB 1.0's IEJoin 80+ minutes at sf1 (the ENGINE's chained
    // interval join: 24 s); the pair-count form is algebra, not a plan
    // shared with the engine, so the differential stands (r14).
    "q_sql_join_threeway" ->
      """WITH ev AS (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events),
         p AS (SELECT a.user_id, a.event_id, count(*) AS n
               FROM ev a JOIN ev b ON a.user_id = b.user_id
                 AND b.ts >= a.ts - INTERVAL '30 minutes'
                 AND b.ts <= a.ts + INTERVAL '30 minutes'
                 AND a.event_id <> b.event_id
               GROUP BY 1, 2)
         SELECT user_id, sum(n * (n - 1))::BIGINT AS triples
         FROM p GROUP BY user_id
         HAVING sum(n * (n - 1)) > 0""",
    "q_sql_join_cross" ->
      """WITH ev AS (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events)
         SELECT count(*) AS pairs
         FROM ev a JOIN ev b ON a.event_id <> b.event_id
           AND b.ts >= a.ts - INTERVAL '1 second'
           AND b.ts <= a.ts + INTERVAL '1 second'""",
    "q_sql_join_full" ->
      """WITH ev AS (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events)
         SELECT a.event_id AS click_id, b.event_id AS error_id
         FROM (SELECT * FROM ev WHERE event_type = 'click') a
         FULL JOIN (SELECT * FROM ev WHERE event_type = 'error') b
           ON a.user_id = b.user_id
           AND b.ts >= a.ts - INTERVAL '5 minutes'
           AND b.ts <= a.ts + INTERVAL '5 minutes'""",
    "q_sql_join_right" ->
      """WITH ev AS (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events)
         SELECT a.event_id AS click_id, b.event_id AS error_id
         FROM (SELECT * FROM ev WHERE event_type = 'click') a
         RIGHT JOIN (SELECT * FROM ev WHERE event_type = 'error') b
           ON a.user_id = b.user_id
           AND b.ts >= a.ts - INTERVAL '5 minutes'
           AND b.ts <= a.ts + INTERVAL '5 minutes'""",
    "q_sql_join_right_using" ->
      """WITH ev AS (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events)
         SELECT coalesce(a.user_id, b.user_id) AS user_id, count(*) AS n
         FROM (SELECT * FROM ev WHERE event_type = 'click') a
         RIGHT JOIN (SELECT * FROM ev WHERE event_type = 'error') b
           ON a.user_id = b.user_id
           AND b.ts >= a.ts - INTERVAL '5 minutes'
           AND b.ts <= a.ts + INTERVAL '5 minutes'
         GROUP BY 1""",
    "q_sql_time_arith" ->
      """WITH ev AS (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events)
         SELECT event_id,
           strftime(ts, '%H:%M:%S') AS tod,
           strftime(ts + INTERVAL '90 minutes', '%H:%M:%S') AS plus90,
           strftime(ts - INTERVAL '2 hours', '%H:%M:%S') AS minus2h,
           strftime(TIMESTAMP '1970-01-02 23:30:00' + INTERVAL '45 minutes',
                    '%H:%M:%S') AS wrap
         FROM ev""",
    "q_sql_window_hop" ->
      """WITH ev AS (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events)
         SELECT ws AS window_start, ws + INTERVAL '1 hour' AS window_end,
           count(*) AS cnt
         FROM (
           SELECT time_bucket(INTERVAL '30 minutes', ts)
                  - k * (INTERVAL '30 minutes') AS ws
           FROM ev CROSS JOIN (VALUES (0),(1)) t(k))
         GROUP BY 1""",
    "q_sql_window_session" ->
      """WITH ev AS (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events),
         marked AS (
           SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_session
           FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         numbered AS (
           SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts) AS sid
           FROM marked)
         SELECT user_id, count(*) AS cnt, max(value) AS mx,
           min(ts) AS window_start, max(ts) + INTERVAL '30 minutes' AS window_end
         FROM numbered GROUP BY user_id, sid""",
    "q_sql_join_natural" ->
      """WITH ev AS (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events)
         SELECT a.user_id AS user_id, count(*) AS n
         FROM ev a JOIN ev b ON a.user_id = b.user_id AND a.value = b.value
           AND b.ts >= a.ts - INTERVAL '2 minutes'
           AND b.ts <= a.ts + INTERVAL '2 minutes'
         GROUP BY 1""",
    "q_sql_type_predicates" ->
      """SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) IS NOT NULL AS isnum,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL AS isint,
           event_type IS NOT NULL AS isstr,
           user_id::VARCHAR AS us
         FROM events""",
    "q_sql_orderby_limit" ->
      """SELECT doc_id, n_chars FROM documents WHERE lang = 'en'
         ORDER BY n_chars DESC, doc_id LIMIT 20""",
    "q_sql_topn_groups" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt
         FROM lineitem GROUP BY 1, 2
         ORDER BY cnt DESC, l_returnflag, l_linestatus LIMIT 3""",
    "q_sql_case" ->
      """SELECT o_orderkey,
                CASE WHEN o_totalprice > 200000.0 THEN 'high'
                     WHEN o_totalprice > 100000.0 THEN 'mid'
                     ELSE 'low' END AS band,
                CASE o_orderstatus WHEN 'F' THEN 'final'
                                   WHEN 'O' THEN 'open' END AS st
         FROM orders ORDER BY o_orderkey""",
    "q_sql_case_agg" ->
      // ::BIGINT — DuckDB's sum over int CASE arms is HUGEINT (float in
      // pandas); Spark's is LongType. Same dtype fix as q_sql_count_distinct.
      """SELECT l_returnflag,
                SUM(CASE WHEN l_quantity > 25.0 THEN 1 ELSE 0 END)::BIGINT AS big,
                SUM(CASE WHEN l_quantity > 25.0 THEN 0 ELSE 1 END)::BIGINT AS small,
                ROUND(SUM(CASE l_linestatus WHEN 'O' THEN l_quantity
                          ELSE 0.0 END), 2) AS open_qty,
                COUNT(*) AS cnt
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_sql_row_number" ->
      """SELECT c_nationkey, c_custkey, rn FROM
           (SELECT c_nationkey, c_custkey,
                   ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                      ORDER BY c_acctbal DESC, c_custkey) AS rn
            FROM customer)
         WHERE rn <= 3 ORDER BY c_nationkey, rn""",
    "q_sql_lag_lead" ->
      """SELECT o_orderkey,
                ROUND(o_totalprice - LAG(o_totalprice, 1, 0.0)
                  OVER (PARTITION BY o_custkey ORDER BY o_orderkey), 2) AS delta,
                LEAD(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS nxt
         FROM orders ORDER BY o_orderkey""",
    "q_sql_running_sum" ->
      """SELECT o_orderkey,
                ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                              ORDER BY o_orderkey), 2) AS run_sum,
                COUNT(o_orderkey) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderkey) AS run_cnt,
                RANK() OVER (PARTITION BY o_custkey
                             ORDER BY o_orderpriority, o_orderkey) AS prio_rank
         FROM orders ORDER BY o_orderkey""",
    "q_sql_union" ->
      """SELECT c_nationkey AS k FROM customer
         UNION SELECT s_nationkey AS k FROM supplier""",
    "q_sql_setops" ->
      """(SELECT c_nationkey AS k FROM customer
         INTERSECT SELECT s_nationkey AS k FROM supplier)
         EXCEPT SELECT n_nationkey AS k FROM nation WHERE n_nationkey < 10""",
    "q_sql_union_all_agg" ->
      """SELECT k, count(*) AS c
         FROM (SELECT c_nationkey AS k FROM customer
               UNION ALL SELECT s_nationkey AS k FROM supplier) u
         GROUP BY k""",
    "q_sql_count_distinct" ->
      // ::BIGINT — DuckDB's sum(DISTINCT int) is HUGEINT (float in pandas);
      // Spark's sum_distinct(int) is LongType. Same dtype fix as
      // q_corpus_stats (r3).
      """SELECT l_returnflag, count(DISTINCT l_suppkey) AS cd,
         sum(DISTINCT l_linenumber)::BIGINT AS sd, count(*) AS cnt
         FROM lineitem GROUP BY 1""",
    "q_sql_percentile" ->
      """SELECT lang, quantile_cont(n_chars, 0.5) AS p50,
         quantile_cont(n_chars, 0.9) AS p90, median(n_chars::DOUBLE) AS med
         FROM documents GROUP BY 1""",
    "q_sql_levenshtein" ->
      """SELECT doc_id,
         levenshtein(left(text, 32), lower(left(text, 32))) AS ucase
         FROM documents""",
    "q_sql_vocab" -> TextQueries.oracleSql("q_text_vocab"),
    "q_sql_sample" -> CurationQueries.oracleSql("q_curation_sample"),
    "q_sql_rollup" -> TextQueries.oracleSql("q_corpus_rollup"),
    "q_sql_topk" ->
      """SELECT l_returnflag, price AS v FROM (
           SELECT l_returnflag, l_extendedprice AS price,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice DESC) AS rnk
           FROM lineitem)
         WHERE rnk <= 5 ORDER BY l_returnflag, v""",
    "q_sql_topk_distinct" ->
      """SELECT l_linestatus, q AS v FROM (
           SELECT l_linestatus, q,
             row_number() OVER (PARTITION BY l_linestatus
                                ORDER BY q DESC) AS rnk
           FROM (SELECT DISTINCT l_linestatus, l_quantity AS q FROM lineitem))
         WHERE rnk <= 10 ORDER BY l_linestatus, v""",
    // expression subqueries: standard SQL — oracle text identical to the
    // dialect text, so DuckDB independently re-plans the same semantics
    "q_sql_in_subquery" ->
      """SELECT c_custkey, c_acctbal FROM customer
         WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 1)
           AND c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
           AND c_acctbal > 5000.0""",
    "q_sql_not_in" ->
      """SELECT n_nationkey, n_name FROM nation
         WHERE n_nationkey NOT IN
           (SELECT c_nationkey FROM customer WHERE c_acctbal > 9900.0)""",
    "q_sql_exists" ->
      """SELECT n_nationkey, n_name FROM nation AS n
         WHERE EXISTS (SELECT 1 FROM supplier AS s
                       WHERE s.s_nationkey = n.n_nationkey
                         AND s.s_acctbal > 8000.0)""",
    "q_sql_not_exists" ->
      """SELECT c_custkey, c_name FROM customer AS c
         WHERE c_acctbal > 9500.0 AND NOT EXISTS
           (SELECT 1 FROM orders AS o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)""",
    "q_sql_scalar_sub" ->
      """SELECT o_orderkey,
                o_totalprice - (SELECT MIN(o_totalprice) FROM orders) AS over_min
         FROM orders
         WHERE o_totalprice * 2.0 > (SELECT MAX(o_totalprice) FROM orders)""",
    "q_sql_star_modifiers" ->
      """SELECT * EXCLUDE (text) REPLACE (n_chars * 2 AS n_chars)
         FROM documents ORDER BY doc_id""",
    "q_sql_group_by_all" ->
      """SELECT lang, source, COUNT(*) AS n, MAX(n_chars) AS mx
         FROM documents GROUP BY ALL ORDER BY ALL""",
    "q_sql_filter_agg" ->
      """SELECT lang,
                COUNT(*) AS n,
                COUNT(*) FILTER (WHERE n_chars > 500) AS n_big,
                MAX(n_chars) FILTER (WHERE source = 'web') AS max_web,
                MIN(n_chars) FILTER (WHERE source = 'web') AS min_web
         FROM documents GROUP BY lang ORDER BY lang""",
    "q_sql_corr_scalar" ->
      """SELECT c_custkey,
                (SELECT COUNT(*) FROM orders AS o
                 WHERE o.o_custkey = c_custkey) AS n_orders
         FROM customer ORDER BY c_custkey""",
    "q_sql_corr_scalar_max" ->
      """SELECT c_custkey,
                (SELECT MAX(o_totalprice) FROM orders AS o
                 WHERE o.o_custkey = c_custkey
                   AND o.o_totalprice > 100000.0) AS max_big
         FROM customer ORDER BY c_custkey""",
    "q_sql_cube" ->
      """SELECT grouping(lang, source)::BIGINT AS gid,
         coalesce(lang, '<ALL>') AS lang2,
         coalesce(source, '<ALL>') AS source2,
         count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars
         FROM documents GROUP BY CUBE (lang, source)
         ORDER BY gid, lang2, source2""",
    "q_sql_grouping_sets" ->
      """SELECT grouping(lang, source)::BIGINT AS gid,
         coalesce(lang, '<ALL>') AS lang2,
         coalesce(source, '<ALL>') AS source2,
         count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars
         FROM documents
         GROUP BY GROUPING SETS ((lang, source), (lang), (source))
         ORDER BY gid, lang2, source2""",
    "q_sql_moving" ->
      """SELECT event_id, user_id,
                SUM(ROUND(value * 100.0)) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id
                    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mv_cents,
                MIN(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS mn5,
                MAX(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mx_run,
                FIRST_VALUE(value) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS fv3,
                COUNT(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS c2
         FROM events""",
    "q_sql_offset" ->
      """SELECT doc_id, lang, n_chars FROM documents
         ORDER BY n_chars DESC, doc_id LIMIT 10 OFFSET 20""",
    "q_sql_retention" -> CoreQueries.oracleSql("q_events_retention"),
    "q_sql_funnel" ->
      """WITH ev AS (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events)
         SELECT user_id, t1, t2, t3,
                CASE WHEN t3 IS NOT NULL THEN 3
                     WHEN t2 IS NOT NULL THEN 2 ELSE 1 END AS reached
         FROM (SELECT user_id, MIN(ts) AS t1 FROM ev
               WHERE event_type = 'view' GROUP BY user_id) AS s1
         LEFT JOIN (SELECT user_id, MIN(e.ts) AS t2
                    FROM ev AS e
                    JOIN (SELECT user_id, MIN(ts) AS t1 FROM ev
                          WHERE event_type = 'view' GROUP BY user_id) AS v
                      USING (user_id)
                    WHERE e.event_type = 'click' AND e.ts > v.t1
                      AND e.ts <= v.t1 + INTERVAL 24 HOUR
                    GROUP BY user_id) AS s2 USING (user_id)
         LEFT JOIN (SELECT user_id, MIN(e2.ts) AS t3
                    FROM ev AS e2
                    JOIN (SELECT user_id, MIN(e.ts) AS t2
                          FROM ev AS e
                          JOIN (SELECT user_id, MIN(ts) AS t1 FROM ev
                                WHERE event_type = 'view'
                                GROUP BY user_id) AS v
                            USING (user_id)
                          WHERE e.event_type = 'click' AND e.ts > v.t1
                            AND e.ts <= v.t1 + INTERVAL 24 HOUR
                          GROUP BY user_id) AS c USING (user_id)
                    WHERE e2.event_type = 'purchase' AND e2.ts > c.t2
                      AND e2.ts <= c.t2 + INTERVAL 24 HOUR
                    GROUP BY user_id) AS s3 USING (user_id)
         ORDER BY user_id""",
    // oracle text identical to the dialect text — DuckDB re-plans the
    // same QUALIFY / RANGE / DISTINCT ON semantics independently
    "q_sql_qualify" ->
      """SELECT doc_id, lang, n_chars,
                ROW_NUMBER() OVER (PARTITION BY lang
                    ORDER BY n_chars DESC, doc_id) AS rk
         FROM documents QUALIFY rk <= 2 ORDER BY lang, rk""",
    "q_sql_cte" ->
      """WITH big AS (SELECT l_orderkey, l_quantity, l_extendedprice
                      FROM lineitem WHERE l_quantity >= 30),
              agg AS (SELECT l_orderkey, COUNT(*) AS n,
                             ROUND(SUM(l_extendedprice), 2) AS rev
                      FROM big GROUP BY l_orderkey)
         SELECT l_orderkey, n, rev FROM agg WHERE n >= 3
         ORDER BY l_orderkey""",
    "q_sql_cte_twice" ->
      """WITH s AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang)
         SELECT lang, n FROM s WHERE n < (SELECT MAX(n) FROM s)
         ORDER BY lang""",
    "q_sql_recursive_series" ->
      """WITH RECURSIVE t AS (
           SELECT 0 AS i FROM region WHERE r_regionkey = 0
           UNION ALL
           SELECT i + 1 AS i FROM t WHERE i < 10)
         SELECT i FROM t ORDER BY i""",
    "q_sql_recursive_paths" ->
      """WITH RECURSIVE e AS (
           SELECT n_nationkey AS src, n_nationkey + 1 AS dst
           FROM nation WHERE n_nationkey < 12),
         reach AS (
           SELECT src, dst FROM e
           UNION
           SELECT r.src AS src, e2.dst AS dst
           FROM reach AS r JOIN e AS e2 ON r.dst = e2.src)
         SELECT src, dst FROM reach ORDER BY src, dst""",
    "q_sql_qualify_order" ->
      """SELECT doc_id, lang, n_chars,
                SUM(n_chars * 1.0) OVER (PARTITION BY lang) AS lang_chars,
                ROW_NUMBER() OVER (PARTITION BY lang
                    ORDER BY n_chars DESC, doc_id) AS rk
         FROM documents QUALIFY rk = 2 ORDER BY lang""",
    "q_sql_range_frame" ->
      """SELECT event_id, user_id,
                SUM(ROUND(value * 100.0)) OVER (PARTITION BY user_id
                    ORDER BY event_id
                    RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS rsum,
                COUNT(value) OVER (PARTITION BY user_id ORDER BY event_id
                    RANGE BETWEEN 500 PRECEDING AND 500 FOLLOWING) AS rcnt
         FROM events ORDER BY event_id""",
    "q_sql_grouping" ->
      """SELECT IFNULL(lang, '<ALL>') AS lang2,
                IFNULL(source, '<ALL>') AS source2,
                GROUPING(lang)::BIGINT AS g_lang,
                GROUPING(source)::BIGINT AS g_source,
                COUNT(*) AS n_docs
         FROM documents GROUP BY CUBE (lang, source)
         ORDER BY g_lang, g_source, lang2, source2""",
    "q_sql_array_agg" ->
      // array_to_string serializes the cells (the harness can't sort raw
      // arrays); DuckDB still plans its native ordered array_agg inside.
      // len() counts kept NULL elements — retention stays oracle-checked.
      """SELECT lang,
                array_to_string(array_agg(source ORDER BY n_chars DESC, doc_id), '|') AS srcs,
                array_to_string(array_agg(doc_id::VARCHAR ORDER BY doc_id), ',') AS ids,
                len(array_agg(CASE WHEN doc_id % 3 = 0 THEN NULL ELSE source END
                              ORDER BY doc_id))::BIGINT AS n_elems
         FROM documents WHERE doc_id % 13 = 0
         GROUP BY lang ORDER BY lang""",
    "q_sql_array_agg_filter" ->
      // DuckDB's NATIVE ordered array_agg + FILTER is the oracle
      """SELECT lang,
                array_to_string(array_agg(source ORDER BY n_chars DESC, doc_id)
                                FILTER (WHERE n_chars > 1200), '|') AS srcs_big,
                len(array_agg(CASE WHEN doc_id % 3 = 0 THEN NULL ELSE source END
                              ORDER BY doc_id)
                    FILTER (WHERE n_chars > 1200))::BIGINT AS n_kept,
                COUNT(*) AS n_docs
         FROM documents WHERE doc_id % 11 = 0
         GROUP BY lang ORDER BY lang""",
    "q_sql_string_agg" ->
      """SELECT lang,
                string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS ids,
                string_agg(source, '|' ORDER BY n_chars DESC, doc_id) AS srcs
         FROM documents WHERE doc_id % 7 = 0
         GROUP BY lang ORDER BY lang""",
    // DuckDB's own default null order IS the dialect's — identical text
    "q_sql_null_order" ->
      """WITH e AS (SELECT event_id,
                           CASE WHEN event_id % 5 = 0 THEN NULL
                                ELSE ROUND(value * 100.0) END AS v
                    FROM events)
         SELECT 'asc_default' AS tag, event_id, v
         FROM (SELECT event_id, v FROM e ORDER BY v, event_id LIMIT 40) AS a
         UNION ALL
         SELECT 'asc_nulls_first' AS tag, event_id, v
         FROM (SELECT event_id, v FROM e
               ORDER BY v NULLS FIRST, event_id LIMIT 40) AS b
         UNION ALL
         SELECT 'desc_default' AS tag, event_id, v
         FROM (SELECT event_id, v FROM e
               ORDER BY v DESC, event_id LIMIT 40) AS c
         ORDER BY tag, event_id""",
    // IGNORE NULLS is native in DuckDB — identical text
    "q_sql_ignore_nulls" ->
      """WITH e AS (SELECT event_id, user_id,
                           CASE WHEN event_id % 7 = 0 THEN NULL
                                ELSE ROUND(value * 100.0) END AS v
                    FROM events)
         SELECT event_id, user_id,
                LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id
                    ORDER BY event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fill_fwd,
                FIRST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id
                    ORDER BY event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_nn,
                LAG(v, 1 IGNORE NULLS) OVER (PARTITION BY user_id
                    ORDER BY event_id) AS prev_nn,
                NTH_VALUE(v, 2 IGNORE NULLS) OVER (PARTITION BY user_id
                    ORDER BY event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nv2
         FROM e ORDER BY event_id""",
    "q_sql_window_rank_dist" ->
      """SELECT event_id,
                ROUND(PERCENT_RANK() OVER (PARTITION BY user_id
                    ORDER BY ROUND(value * 0.01)), 6) AS pr,
                ROUND(CUME_DIST() OVER (PARTITION BY user_id
                    ORDER BY ROUND(value * 0.01)), 6) AS cd,
                NTH_VALUE(ROUND(value * 100.0), 2) OVER (PARTITION BY user_id
                    ORDER BY event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nv2
         FROM events ORDER BY event_id""",
    "q_sql_div_mod" ->
      """SELECT event_id,
                ROUND(value / 7.0, 6) AS dv,
                event_id % 7 AS m_int,
                ROUND(value % 3.5, 6) AS m_f,
                event_id / 4 AS int_div,
                (0 - event_id) % 7 AS m_neg,
                event_id / (event_id % 2) AS div_zero,
                event_id % (event_id % 2) AS mod_zero
         FROM events ORDER BY event_id""",
    "q_sql_window_clause" ->
      """SELECT event_id, user_id,
                SUM(ROUND(value * 100.0)) OVER w AS ws,
                COUNT(value) OVER w AS wc,
                ROW_NUMBER() OVER w2 AS rn
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
                w2 AS (PARTITION BY user_id ORDER BY event_id)
         ORDER BY event_id""",
    // DuckDB 1.0 has no in-call ORDER BY on window fns, so the oracle is
    // the definition itself: row_number the partition, then correlated
    // ordered-aggregate subqueries over each frame's row range — nothing
    // of the engine's collect+sort window plan is shared.
    "q_sql_string_agg_window" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
                           ROUND(value * 100.0) AS v100,
                           ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY event_id) AS rn
                    FROM events)
         SELECT event_id, user_id,
                (SELECT string_agg(e2.event_type, ','
                                   ORDER BY e2.v100 DESC, e2.event_id)
                   FROM e e2 WHERE e2.user_id = e.user_id
                    AND e2.rn BETWEEN e.rn - 2 AND e.rn) AS types_by_val,
                (SELECT string_agg(e2.event_id::VARCHAR, '|'
                                   ORDER BY e2.event_id)
                   FROM e e2 WHERE e2.user_id = e.user_id
                    AND e2.rn <= e.rn) AS ids_run
         FROM e ORDER BY event_id""",
    // DuckDB plans use-site refinement `OVER (w …)` natively, but its
    // 1.0.0 resolver DROPS the base's PARTITION BY in a CHAINED
    // definition (`wo AS (wp ORDER BY …)` ≡ no partition — verified:
    // chained == partition-less on this data), diverging from the
    // standard. So only the chain is hand-resolved here (wo written in
    // full); the refinement surface stays independently planned.
    "q_sql_window_refine" ->
      """SELECT event_id, user_id,
                SUM(ROUND(value * 100.0)) OVER (wo ROWS BETWEEN 2 PRECEDING
                    AND CURRENT ROW) AS s_frame,
                COUNT(value) OVER (wp ORDER BY event_id
                    ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS c_ord,
                ROW_NUMBER() OVER wo AS rn
         FROM events
         WINDOW wp AS (PARTITION BY user_id),
                wo AS (PARTITION BY user_id ORDER BY event_id)
         ORDER BY event_id""",
    // DuckDB plans EXCLUDE natively — nothing of the engine's subtraction
    // rewrite is shared with the oracle
    "q_sql_frame_exclude" ->
      """SELECT event_id, user_id,
                SUM(ROUND(value * 100.0)) OVER (PARTITION BY user_id
                    ORDER BY event_id
                    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
                    EXCLUDE CURRENT ROW) AS s_excur,
                COUNT(value) OVER (PARTITION BY user_id
                    ORDER BY ROUND(value * 0.01)
                    RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING
                    EXCLUDE GROUP) AS c_exgrp,
                ROUND(AVG(ROUND(value * 100.0)) OVER (PARTITION BY user_id
                    ORDER BY ROUND(value * 0.01)
                    RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING
                    EXCLUDE TIES), 6) AS a_exties
         FROM events ORDER BY event_id""",
    "q_sql_frame_exclude_minmax" ->
      """SELECT event_id, user_id,
                MIN(ROUND(value * 100.0)) OVER (PARTITION BY user_id
                    ORDER BY event_id
                    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
                    EXCLUDE CURRENT ROW) AS mn_both,
                MAX(ROUND(value * 100.0)) OVER (PARTITION BY user_id
                    ORDER BY event_id
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
                    EXCLUDE CURRENT ROW) AS mx_pre,
                MIN(ROUND(value * 100.0)) OVER (PARTITION BY user_id
                    ORDER BY event_id
                    ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING
                    EXCLUDE CURRENT ROW) AS mn_suf
         FROM events ORDER BY event_id""",
    // definitional GROUPS expansion (dense_rank ordinal) + DuckDB's
    // native EXCLUDE on the RANGE frame — same pattern as
    // q_sql_groups_frame's oracle
    "q_sql_groups_exclude_minmax" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
                           ROUND(value * 100.0) AS v100,
                           DENSE_RANK() OVER (PARTITION BY user_id
                               ORDER BY event_type) AS dr
                    FROM events)
         SELECT event_id, user_id, event_type,
                MIN(v100) OVER (PARTITION BY user_id ORDER BY dr
                    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING
                    EXCLUDE GROUP) AS mn_exgrp,
                MAX(v100) OVER (PARTITION BY user_id ORDER BY dr
                    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING
                    EXCLUDE TIES) AS mx_exties
         FROM e ORDER BY event_id""",
    // RANGE EXCLUDE is native DuckDB; the GROUPS + EXCLUDE CURRENT ROW
    // column takes the dense_rank expansion (EXCLUDE CURRENT ROW is
    // frame-type-agnostic, so it carries over the rewrite unchanged).
    "q_sql_range_exclude_minmax" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
                           ROUND(value * 100.0) AS v100,
                           ROUND(value * 0.01) AS bkt,
                           DENSE_RANK() OVER (PARTITION BY user_id
                               ORDER BY event_type) AS dr
                    FROM events)
         SELECT event_id, user_id,
                MIN(v100) OVER (PARTITION BY user_id ORDER BY bkt
                    RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING
                    EXCLUDE CURRENT ROW) AS mn_excur,
                MAX(v100) OVER (PARTITION BY user_id ORDER BY bkt
                    RANGE BETWEEN 1 PRECEDING AND 3 FOLLOWING
                    EXCLUDE GROUP) AS mx_exgrp,
                MIN(v100) OVER (PARTITION BY user_id ORDER BY bkt
                    RANGE BETWEEN 2 PRECEDING AND CURRENT ROW
                    EXCLUDE TIES) AS mn_exties,
                MAX(v100) OVER (PARTITION BY user_id ORDER BY dr
                    RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING
                    EXCLUDE CURRENT ROW) AS mx_gcur
         FROM e ORDER BY event_id""",
    // identical text: DuckDB's ROWS EXCLUDE is native, and every column
    // is chosen permutation-invariant (see the queries-side comment)
    "q_sql_rows_exclude_group" ->
      """SELECT user_id, ROUND(value * 0.01) AS bkt,
                SUM(ROUND(value * 0.01) * 3 + 1) OVER (PARTITION BY user_id
                    ORDER BY ROUND(value * 0.01)
                    ROWS BETWEEN 3 PRECEDING AND 1 FOLLOWING
                    EXCLUDE GROUP) AS sg,
                COUNT(value) OVER (PARTITION BY user_id
                    ORDER BY ROUND(value * 0.01)
                    ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING
                    EXCLUDE TIES) AS ct,
                MIN(ROUND(value * 100.0)) OVER (PARTITION BY user_id
                    ORDER BY ROUND(value * 0.01)
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
                    EXCLUDE GROUP) AS mng,
                SUM(ROUND(value * 0.01) * 2) OVER (PARTITION BY user_id
                    ORDER BY ROUND(value * 0.01)
                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
                    EXCLUDE TIES) AS sp
         FROM events ORDER BY user_id, bkt""",
    // identical text: DuckDB's EXCLUDE on FIRST/LAST/NTH_VALUE is native,
    // and every column is a function of the order key (see queries-side)
    "q_sql_frame_exclude_firstlast" ->
      """SELECT user_id, ROUND(value * 0.01) AS bkt,
                FIRST_VALUE(ROUND(value * 0.01) * 3 + 1) OVER (
                    PARTITION BY user_id ORDER BY ROUND(value * 0.01)
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
                    EXCLUDE GROUP) AS fg,
                LAST_VALUE(ROUND(value * 0.01) * 2) OVER (
                    PARTITION BY user_id ORDER BY ROUND(value * 0.01)
                    ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING
                    EXCLUDE TIES) AS lt,
                NTH_VALUE(ROUND(value * 0.01) * 5 - 2, 2) OVER (
                    PARTITION BY user_id ORDER BY ROUND(value * 0.01)
                    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING
                    EXCLUDE CURRENT ROW) AS n2,
                FIRST_VALUE(CASE WHEN CAST(ROUND(value * 0.01) AS INTEGER)
                                      % 3 = 0 THEN NULL
                                 ELSE ROUND(value * 0.01) * 7 END
                    IGNORE NULLS) OVER (
                    PARTITION BY user_id ORDER BY ROUND(value * 0.01)
                    RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING
                    EXCLUDE GROUP) AS fig
         FROM events ORDER BY user_id, bkt""",
    // DuckDB's parser has no GROUPS mode yet ("not implemented"), so the
    // oracle is the DEFINITIONAL expansion — a RANGE frame over the
    // dense_rank peer-group ordinal — which DuckDB plans independently;
    // matching it pins exactly the rewrite's claimed semantics.
    "q_sql_groups_frame" ->
      """SELECT event_id, user_id, event_type,
                SUM(ROUND(value * 100.0)) OVER (PARTITION BY user_id
                    ORDER BY dr
                    RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS gsum,
                COUNT(value) OVER (PARTITION BY user_id ORDER BY dr
                    RANGE BETWEEN CURRENT ROW AND 1 FOLLOWING) AS gcnt
         FROM (SELECT *, DENSE_RANK() OVER (PARTITION BY user_id
                   ORDER BY event_type) AS dr
               FROM events) t
         ORDER BY event_id""",
    "q_sql_distinct_on" ->
      """SELECT DISTINCT ON (lang) doc_id, lang, n_chars
         FROM documents ORDER BY lang, n_chars DESC, doc_id""",
    "q_sql_distinct" ->
      """SELECT DISTINCT lang, source FROM documents
         ORDER BY lang, source""",
    "q_sql_asof" -> CoreQueries.oracleSql("q_join_asof"),
    "q_sql_asof_fwd" -> CoreQueries.oracleSql("q_join_asof_forward"),
    "q_sql_asof_inner" ->
      """WITH ev AS (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events),
         c AS (SELECT event_id, user_id, ts, round(value,4) AS click_value
               FROM ev WHERE event_type='click'),
         p AS (SELECT user_id, ts AS pts, round(value,4) AS purchase_value
               FROM ev WHERE event_type='purchase')
         SELECT c.event_id, c.user_id, c.click_value, p.purchase_value
         FROM c ASOF JOIN p
           ON c.user_id = p.user_id AND c.ts >= p.pts
         ORDER BY c.event_id"""
  )
}
