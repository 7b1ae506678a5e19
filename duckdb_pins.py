#!/usr/bin/env python3
"""Pins of the ORACLE's (DuckDB's) own quirks that gate/fuzz oracle texts
work around. If an assertion here starts failing, DuckDB was upgraded past
the quirk — restore the corresponding oracle text to its native form:

1. Chained WINDOW definitions drop the base's PARTITION BY (DuckDB 1.0.0
   resolver bug) -> q_sql_window_refine's oracle hand-resolves the chain
   (SqlQueries.scala, "window_refine"). When fixed: use `WINDOW wo AS
   (wp ORDER BY ...)` natively and delete the hand-resolution.
2. GROUPS frame mode unimplemented -> q_sql_groups_* oracles and
   FuzzGen's GROUPS fragments use the definitional dense_rank RANGE
   expansion. When implemented: emit GROUPS natively in oracle texts.
3. array_to_string over an array with NO non-null element returns NULL
   (reference/Spark: '') -> FuzzGen.joinOracle normalizes. This is
   long-standing DuckDB behavior, pinned so the normalization's reason
   stays checkable.
4. No in-call ORDER BY on window functions -> q_sql_string_agg_window's
   oracle is a definitional correlated-subquery expansion.
5. ASOF JOIN evaluates its inequality in SORT order, not SQL comparison
   semantics: a NULL left ts matches the key's GREATEST right ts instead
   of nothing -> FuzzGen's tAsof filters NULL ts on both sides (the
   engine keeps SQL semantics: NULL compares UNKNOWN, matches nothing).
   When fixed: drop the WHERE ts IS NOT NULL filters from the template.
6. ANY frame EXCLUDE over a frame that does not reach the current row
   extends the frame toward it: SUM(...) OVER (ORDER BY o RANGE BETWEEN
   3 PRECEDING AND 2 PRECEDING EXCLUDE CURRENT ROW) at o=2 over
   o=1..5 returns the o=1 row's value where the standard (exclusion only
   ever REMOVES rows; PostgreSQL agrees) says the untouched empty frame,
   NULL -> q_sql_rows_exclude_group keeps every EXCLUDE frame reaching
   the current row; WindowFrameSpec pins the engine's standard behavior
   on the out-of-frame shapes. When fixed: add out-of-frame EXCLUDE
   columns to the gate row and a FuzzGen fragment drawing (P,P) bounds
   with EXCLUDE.

Run: python3 duckdb_pins.py   (exit 0 = quirks still present, oracle
workarounds still required)."""
import duckdb, sys

con = duckdb.connect()
fails = []

# 1. chained WINDOW drops base PARTITION BY — but ONLY when the use site
# REFINES the chained window with a frame (`OVER (wo ROWS …)`); a bare
# `OVER wo` resolves correctly (verified while writing this pin). The
# gate's s_frame column is exactly the buggy shape.
con.execute("CREATE TABLE t AS SELECT i % 3 AS g, i FROM range(9) r(i)")
mx = con.sql(
    "SELECT max(s) FROM (SELECT sum(i) OVER (wo ROWS BETWEEN 2 PRECEDING "
    "AND CURRENT ROW) AS s FROM t WINDOW w1 AS (PARTITION BY g), "
    "wo AS (w1 ORDER BY i)) q").fetchone()[0]
# partition kept -> max partition sum 2+5+8 = 15; dropped -> 6+7+8 = 21
if mx != 21:
    fails.append("1: use-site frame refinement of a chained WINDOW now "
                 "keeps the base PARTITION BY — restore "
                 "q_sql_window_refine's native chained oracle")

# 2. GROUPS frames
try:
    con.sql("SELECT sum(i) OVER (ORDER BY g GROUPS BETWEEN 1 PRECEDING "
            "AND CURRENT ROW) FROM t").fetchall()
    fails.append("2: GROUPS frames now work — oracle texts can emit "
                 "GROUPS natively instead of the dense_rank expansion")
except Exception:
    pass

# 3. array_to_string NULL-on-empty
if con.sql("SELECT array_to_string([NULL]::INT[], '|') IS NULL").fetchone()[0] is not True:
    fails.append("3: array_to_string no longer NULLs an all-NULL array — "
                 "drop FuzzGen.joinOracle's normalization")

# 5. ASOF JOIN's inequality follows sort order for NULLs: a NULL left
# ts matches the key's greatest right ts (SQL comparison semantics would
# match nothing)
con.execute("CREATE TABLE al AS SELECT 1 AS k, NULL::TIMESTAMP AS ts")
con.execute("CREATE TABLE ar AS SELECT 1 AS k, TIMESTAMP '2024-01-01' AS ts")
m = con.sql("SELECT count(*) FROM al ASOF JOIN ar "
            "ON al.k = ar.k AND al.ts >= ar.ts").fetchone()[0]
if m != 1:
    fails.append("5: ASOF JOIN no longer matches a NULL left ts — restore "
                 "NULL-ts rows to FuzzGen.tAsof (drop its WHERE filters)")

# 6. frame EXCLUDE on a frame not reaching the current row extends the
# frame toward it (standard: exclusion only removes rows -> empty frame
# stays empty -> NULL)
con.execute("CREATE TABLE fx AS SELECT i AS o, i * 10 AS x FROM range(1, 6) r(i)")
# NOTE: filtered via a subquery — a QUALIFY filter on this shape changes
# the result (the quirk vanishes under it), so the pin uses the same
# whole-relation evaluation the gate/fuzz harnesses see
v = con.sql("SELECT s FROM (SELECT o, sum(x) OVER (ORDER BY o RANGE "
            "BETWEEN 3 PRECEDING AND 2 PRECEDING EXCLUDE CURRENT ROW) AS s "
            "FROM fx) q WHERE o = 2").fetchone()[0]
if v is None:
    fails.append("6: out-of-frame EXCLUDE no longer extends the frame — "
                 "add out-of-frame EXCLUDE gate columns + a (P,P)-bounds "
                 "EXCLUDE fuzz fragment")

# 4. in-call ORDER BY on window functions
try:
    con.sql("SELECT string_agg(i::VARCHAR, ',' ORDER BY i) OVER "
            "(PARTITION BY g) FROM t").fetchall()
    fails.append("4: window string_agg now takes in-call ORDER BY — "
                 "q_sql_string_agg_window's oracle can go native")
except Exception:
    pass

if fails:
    print(f"DuckDB {duckdb.__version__}: {len(fails)} quirk(s) GONE — "
          "update the linked oracle texts:")
    for f in fails:
        print("  " + f)
    sys.exit(1)
print(f"DuckDB {duckdb.__version__}: all 6 oracle quirks still present; "
      "workarounds remain required")
