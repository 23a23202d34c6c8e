#!/usr/bin/env python3
"""Generate a LARGER scale factor of the driver's synthetic star schema for
local scale-probing (BENCH_sf1.json). The driver owns /root/testdata and
caps at sf0.1; this tool produces a distribution-matched sf1 (10x sf0.1)
under tools/sf1/ (gitignored) so per-query scaling ratios can be MEASURED
instead of argued from plan shape.

Distribution-matched, not byte-matched: schemas, value ranges, category
sets, key cardinality ratios, skew shape, and the documents vocabulary all
mirror the profiled /root/testdata/sf0.1 fixtures (profile: see
BASELINE.md "sf1 scale probe"); the RNG is a deterministic splitmix-style
hash over row ids, so re-running reproduces identical files.

Row-group size is set explicitly: the driver's single-row-group sf0.1
files force the bench's `graft.bench.singleFileFixture` spread; sf1 files
carry many row groups so Spark's scan parallelism is the production one.

Usage: python3 tools/make_sf.py [sf] [outdir]   (defaults: 1 tools/sf1)
"""
import os
import sys

import duckdb

SF = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
OUT = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
    os.path.dirname(__file__), "sf1")
SRC = "/root/testdata/sf0.1"  # static dims copied verbatim

N_CUST = int(150_000 * SF)
N_SUPP = int(10_000 * SF)
N_PART = int(200_000 * SF)
N_ORD = int(1_500_000 * SF)
N_EVT = int(1_000_000 * SF)
N_DOC = int(50_000 * SF)
N_EMB = int(20_000 * SF)

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()

# Deterministic uniform in [0, 1) from (row id, salt) — avalanche via two
# rounds of splitmix64-style mixing so low bits are usable.
con.execute("""
CREATE MACRO mix(i, salt) AS (
  CAST(hash(CAST(i AS BIGINT) * 2654435761 + salt * 40503) AS UBIGINT)
);
CREATE MACRO u01(i, salt) AS (
  (mix(i, salt) % 1000000007) / 1000000007.0
);
CREATE MACRO pick(i, salt, n) AS (
  CAST(mix(i, salt) % n AS INTEGER)
);
""")


def copy(sql, name, rows_per_group=122_880):
    con.execute(
        f"COPY ({sql}) TO '{OUT}/{name}.parquet' "
        f"(FORMAT PARQUET, ROW_GROUP_SIZE {rows_per_group})")
    n = con.execute(
        f"SELECT count(*) FROM '{OUT}/{name}.parquet'").fetchone()[0]
    print(f"{name}: {n} rows")


# Static dims: identical at every sf (TPC-H rule).
copy(f"SELECT * FROM '{SRC}/region.parquet'", "region")
copy(f"SELECT * FROM '{SRC}/nation.parquet'", "nation")

copy(f"""
SELECT i AS c_custkey,
  printf('Customer#%09d', i) AS c_name,
  pick(i, 1, 25) AS c_nationkey,
  floor((-1000 + 11000 * u01(i, 2)) * 100 + 0.5) / 100 AS c_acctbal,
  ['AUTOMOBILE','MACHINERY','BUILDING','HOUSEHOLD','FURNITURE']
    [1 + pick(i, 3, 5)] AS c_mktsegment
FROM range({N_CUST}) t(i)""", "customer")

copy(f"""
SELECT i AS s_suppkey,
  printf('Supplier#%09d', i) AS s_name,
  pick(i, 4, 25) AS s_nationkey,
  floor((-1000 + 11000 * u01(i, 5)) * 100 + 0.5) / 100 AS s_acctbal
FROM range({N_SUPP}) t(i)""", "supplier")

copy(f"""
SELECT i AS p_partkey,
  ['large','hot','blue','dark','small','shiny','plain','round']
    [1 + pick(i, 6, 8)] || ' ' ||
  ['ring','bolt','screw','washer','plate','gear','rod','cap']
    [1 + pick(i, 7, 8)] AS p_name,
  'Brand#' || CAST(1 + pick(i, 8, 25) AS VARCHAR) AS p_brand,
  ['LARGE','STANDARD','PROMO','MEDIUM','SMALL','ECONOMY']
    [1 + pick(i, 9, 6)] AS p_type,
  1 + pick(i, 10, 50) AS p_size,
  900.0 + (i % 1000) / 10.0 AS p_retailprice
FROM range({N_PART}) t(i)""", "part")

# Orders span 1995-01-01 .. 2001-08-01 (2404 days), statuses uniform.
copy(f"""
SELECT i AS o_orderkey,
  CAST(mix(i, 11) % {N_CUST} AS BIGINT) AS o_custkey,
  ['F','O','P'][1 + pick(i, 12, 3)] AS o_orderstatus,
  floor((1000 + 499000 * u01(i, 13)) * 100 + 0.5) / 100 AS o_totalprice,
  TIMESTAMP '1995-01-01' + INTERVAL (pick(i, 14, 2404)) DAY AS o_orderdate,
  ['1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW']
    [1 + pick(i, 15, 5)] AS o_orderpriority
FROM range({N_ORD}) t(i)""", "orders")

# Lineitem: 1..7 lines per order (avg 4 -> ~4x orders rows); ship date
# trails the order date by up to ~95 days.
copy(f"""
WITH o AS (
  SELECT i AS okey,
    TIMESTAMP '1995-01-01' + INTERVAL (pick(i, 14, 2404)) DAY AS odate,
    1 + pick(i, 16, 7) AS nlines
  FROM range({N_ORD}) t(i))
SELECT o.okey AS l_orderkey,
  CAST(mix(o.okey * 7 + ln, 17) % {N_PART} AS BIGINT) AS l_partkey,
  CAST(mix(o.okey * 7 + ln, 18) % {N_SUPP} AS BIGINT) AS l_suppkey,
  CAST(ln AS INTEGER) AS l_linenumber,
  CAST(1 + pick(o.okey * 7 + ln, 19, 50) AS DOUBLE) AS l_quantity,
  floor((900 + 104100 * u01(o.okey * 7 + ln, 20)) * 100 + 0.5) / 100
    AS l_extendedprice,
  pick(o.okey * 7 + ln, 21, 11) / 100.0 AS l_discount,
  pick(o.okey * 7 + ln, 22, 9) / 100.0 AS l_tax,
  ['A','N','R'][1 + pick(o.okey * 7 + ln, 23, 3)] AS l_returnflag,
  ['O','F'][1 + pick(o.okey * 7 + ln, 24, 2)] AS l_linestatus,
  o.odate + INTERVAL (pick(o.okey * 7 + ln, 25, 95)) DAY AS l_shipdate
FROM o, LATERAL unnest(range(1, o.nlines + 1)) u(ln)""", "lineitem")

# Events: 30 days of 2024-01 at microsecond timestamps; users scale with
# volume (sf0.1: 100k events / 1.5k users).
N_USR = max(1, int(15_000 * SF))
copy(f"""
SELECT i AS event_id,
  TIMESTAMP '2024-01-01' +
    INTERVAL (CAST(mix(i, 26) % (30::BIGINT * 86400 * 1000000) AS BIGINT))
    MICROSECOND AS ts,
  CAST(mix(i, 27) % {N_USR} AS BIGINT) AS user_id,
  ['view','click','signup','purchase','error'][1 + pick(i, 28, 5)]
    AS event_type,
  floor(600 * u01(i, 29) * 100 + 0.5) / 100 AS value,
  '{{"k": ' || CAST(pick(i, 30, 100) AS VARCHAR) || '}}' AS props
FROM range({N_EVT}) t(i)
ORDER BY ts""", "events")

# Documents: the profiled 30-token vocab + rare 'dup' token, 8..96 tokens
# per doc, ~0.17% exact duplicates (text seeded from the PREVIOUS doc id),
# langs 40/15/15/15/15, sources round-robin over 20.
copy(f"""
WITH v AS (
  SELECT ['spark','window','merge','table','column','vector','stream',
          'value','data','small','join','filter','big','group','hash',
          'customer','sort','order','slow','line','part','fast','the',
          'row','agg','key','query','a','scan','batch'] AS vocab)
SELECT i AS doc_id,
  array_to_string(
    list_transform(range(8 + pick(seed, 31, 89)), j ->
      CASE WHEN mix(seed * 131 + j, 32) % 1000 = 0 THEN 'dup'
           ELSE v.vocab[1 + CAST(mix(seed * 131 + j, 33) % 30 AS INTEGER)]
      END),
    ' ') AS text,
  ['en','en','en','en','fr','es','zh','de','en','fr']
    [1 + pick(i, 34, 10)] AS lang,
  'src' || CAST(i % 20 AS VARCHAR) AS source,
  CAST(length(array_to_string(
    list_transform(range(8 + pick(seed, 31, 89)), j ->
      CASE WHEN mix(seed * 131 + j, 32) % 1000 = 0 THEN 'dup'
           ELSE v.vocab[1 + CAST(mix(seed * 131 + j, 33) % 30 AS INTEGER)]
      END),
    ' ')) AS BIGINT) AS n_chars
FROM (SELECT i, CASE WHEN mix(i, 35) % 600 = 0 AND i > 0 THEN i - 1
                     ELSE i END AS seed
      FROM range({N_DOC}) t(i)), v""", "documents")

# Embeddings: unit-normalized 64-dim float vectors, labels 0..9.
copy(f"""
WITH raw AS (
  SELECT i,
    list_transform(range(64), j ->
      u01(i * 64 + j, 36) - 0.5) AS x
  FROM range({N_EMB}) t(i))
SELECT i AS vec_id,
  CAST(list_transform(x, v -> v / sqrt(list_dot_product(x, x)))
    AS FLOAT[]) AS embedding,
  pick(i, 37, 10) AS label
FROM raw""", "embeddings")

print(f"done -> {OUT}")
