#!/usr/bin/env python3
# q_pagerank convergence probe (r11 VERDICT #5): does the integer
# fixed-point rank converge before round 3? If pr2 != pr3 anywhere, a
# convergence-gated early exit can never fire on this data and would be
# pure overhead (an extra comparison action per round).
import sys, duckdb

d = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
con = duckdb.connect()
con.execute(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{d}/lineitem.parquet')")

def rnd(i):
    return f"""c{i} AS (
  SELECT und.dst, pr_e9 // pr{i-1}.deg AS c
  FROM und JOIN pr{i-1} ON und.src = pr{i-1}.node),
s{i} AS (SELECT dst, CAST(SUM(c) AS BIGINT) AS s FROM c{i} GROUP BY dst),
pr{i} AS (
  SELECT node, deg,
    150000000 // nn + (85 * COALESCE(s, 0)) // 100 AS pr_e9
  FROM pr{i-1} LEFT JOIN s{i} ON node = dst CROSS JOIN n)"""

base = """WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
e0 AS (
  SELECT DISTINCT a.pk AS p1, b.pk AS p2
  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
und AS (
  SELECT p1 AS src, p2 AS dst FROM e0
  UNION ALL
  SELECT p2 AS src, p1 AS dst FROM e0),
deg AS (SELECT src, COUNT(*) AS deg FROM und GROUP BY src),
n AS (SELECT COUNT(*) AS nn FROM deg),
pr0 AS (
  SELECT src AS node, deg, 1000000000 // nn AS pr_e9
  FROM deg CROSS JOIN n),
""" + ",\n".join(rnd(i) for i in (1, 2, 3))

q = base + """
SELECT
  (SELECT COUNT(*) FROM pr0) AS n_nodes,
  (SELECT COUNT(*) FROM pr1 a JOIN pr2 b ON a.node = b.node
    WHERE a.pr_e9 <> b.pr_e9) AS diff_1_2,
  (SELECT COUNT(*) FROM pr2 a JOIN pr3 b ON a.node = b.node
    WHERE a.pr_e9 <> b.pr_e9) AS diff_2_3,
  (SELECT MAX(ABS(a.pr_e9 - b.pr_e9)) FROM pr2 a JOIN pr3 b ON a.node = b.node)
    AS max_abs_delta_2_3
"""
print(dict(zip(("n_nodes", "diff_1_2", "diff_2_3", "max_abs_delta_2_3"),
               con.execute(q).fetchone())))
