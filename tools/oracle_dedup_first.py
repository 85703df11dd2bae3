#!/usr/bin/env python3
"""Dedup-first reformulations of the two pairwise dedup oracles, for
scale sweeps on high-duplication dirs (tools/scalegen.py replicates
documents verbatim, so the naive pairwise-shingle self-join oracle is
quadratic in duplicate multiplicity: at the 100x dir it needs ~1e11
join rows and cannot complete, while the ENGINE's dedup-first algebra
is exactly what makes the same computation feasible).

Equivalence to the shipped naive oracles (SparkEntry.oracleSql) is
algebraic -- identical texts have jaccard 1 >= any threshold, so the
doc-level similarity graph is the expansion of the distinct-text-level
graph -- and verified empirically by this script: run
`python3 tools/oracle_dedup_first.py <sfDir>` and both formulations
must return EXACTLY equal frames. Verified EQUAL at sf0.01, sf0.1 and
the 10x dir before the 100x sweep (ROADMAP round 6).

For q_ngram_jaccard's top-100, per-group member lists truncate at 101:
any pair with a member index > 101 is lexicographically dominated by
>= 100 same-jaccard pairs inside its own group/group-pair, so the
global top-100 is unaffected; the group-pair cutoff keeps every tie of
the 200th-highest jaccard, and >= 200 surviving group pairs each
contribute >= 1 doc pair, so no sub-cutoff pair can reach rank 100.
"""
import duckdb, json, sys
import pandas as pd

DEDUP_GROUPS = """WITH grp AS (
  SELECT text, min(doc_id) AS gid FROM documents GROUP BY text),
t AS (
  SELECT gid, list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk
  FROM grp),
sh AS (
  SELECT gid,
    CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
         ELSE list_distinct(
           [tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] for i in range(1, len(tk)-1)])
    END AS shl
  FROM t),
flat AS (SELECT gid, len(shl) AS n_sh, unnest(shl) AS s FROM sh),
common AS (
  SELECT a.gid AS ga, b.gid AS gb, COUNT(*) AS n_common,
         any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
  FROM flat a JOIN flat b ON a.s = b.s AND a.gid < b.gid
  GROUP BY 1, 2),
pairs AS (
  SELECT ga, gb FROM common
  WHERE CAST(n_common AS DOUBLE) / CAST(n_a + n_b - n_common AS DOUBLE) >= 0.7),
edges AS (SELECT ga AS src, gb AS dst FROM pairs UNION ALL SELECT gb, ga FROM pairs),
reach AS (
  WITH RECURSIVE r(src, dst) AS (
    SELECT gid, gid FROM grp
    UNION
    SELECT r.src, e.dst FROM r JOIN edges e ON r.dst = e.src)
  SELECT * FROM r),
comp AS (SELECT src AS gid, MIN(dst) AS component FROM reach GROUP BY src)
SELECT d.doc_id, c.component, (d.doc_id = c.component) AS keep
FROM documents d JOIN grp g ON d.text = g.text JOIN comp c ON g.gid = c.gid
ORDER BY d.doc_id"""

NGRAM = """WITH grp AS (
  SELECT source, text, min(doc_id) AS gid, count(*) AS n,
         list_sort(list(doc_id))[1:101] AS members
  FROM documents GROUP BY source, text),
t AS (SELECT gid, source,
    list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk FROM grp),
sh AS (
  SELECT gid, source,
    CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
         ELSE list_distinct(
           [tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] for i in range(1, len(tk)-1)])
    END AS shl
  FROM t),
flat AS (SELECT gid, source, len(shl) AS n_sh, unnest(shl) AS s FROM sh),
common AS (
  SELECT a.gid AS ga, b.gid AS gb, COUNT(*) AS n_common,
         any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
  FROM flat a JOIN flat b
    ON a.source = b.source AND a.s = b.s AND a.gid < b.gid
  GROUP BY 1, 2),
gpairs AS (
  SELECT ga, gb,
    CAST(n_common AS DOUBLE) / CAST(n_a + n_b - n_common AS DOUBLE) AS jaccard
  FROM common),
cutoff AS (SELECT jaccard AS cj FROM gpairs ORDER BY jaccard DESC LIMIT 1 OFFSET 199),
topg AS (SELECT * FROM gpairs
         WHERE jaccard >= coalesce((SELECT cj FROM cutoff), 0.0)),
same_pairs AS (
  SELECT m1.m AS doc_a, m2.m AS doc_b, 1.0 AS jaccard
  FROM grp
  CROSS JOIN unnest(members) AS m1(m)
  CROSS JOIN unnest(members) AS m2(m)
  WHERE n >= 2 AND m1.m < m2.m),
cross_pairs AS (
  SELECT least(ma.m, mb.m) AS doc_a, greatest(ma.m, mb.m) AS doc_b, tg.jaccard
  FROM topg tg
  JOIN grp a ON a.gid = tg.ga
  JOIN grp b ON b.gid = tg.gb
  CROSS JOIN unnest(a.members) AS ma(m)
  CROSS JOIN unnest(b.members) AS mb(m))
SELECT doc_a, doc_b, jaccard FROM (
  SELECT * FROM same_pairs UNION ALL SELECT * FROM cross_pairs)
ORDER BY jaccard DESC, doc_a, doc_b LIMIT 100"""

def lsh_recall_rewrite(orig_sql):
    """q_lsh_recall embeds qNgramJaccardSql as its `top` CTE; splice the
    dedup-first NGRAM in its place, keeping the bands/hit/recall tail."""
    head, tail = orig_sql.split("),\nbands AS (", 1)
    return "WITH top AS (\n" + NGRAM + "\n),\nbands AS (" + tail


def lsh_curve_rewrite(orig_sql):
    """q_lsh_curve embeds the same ground-truth CTE; same splice, keeping
    the band-sweep/hit/candidate tail."""
    head, tail = orig_sql.split("),\nbk AS (", 1)
    return "WITH top AS (\n" + NGRAM + "\n),\nbk AS (" + tail


def keep_best_rewrite(orig_sql):
    """q_dedup_keep_best wraps qDedupGroupsSql in a `comp` CTE; splice the
    dedup-first closure in its place, keeping the quality/selection tail."""
    head, tail = orig_sql.split("),\nqual AS (", 1)
    return "WITH comp AS (\n" + DEDUP_GROUPS + "\n),\nqual AS (" + tail


def lsh_tune_rewrite(orig_sql):
    """q_lsh_tune wraps qLshCurveSql in a `curve` CTE; splice the
    dedup-first ground truth into the embedded curve, keeping the outer
    argmin selection untouched."""
    head, tail = orig_sql.split("),\nbk AS (", 1)
    return ("WITH curve AS (\nWITH top AS (\n" + NGRAM +
            "\n),\nbk AS (" + tail)


if __name__ == "__main__":
    # usage: oracle_dedup_first.py <sfDir> [<verifyOutDir>/oracle_sql.json]
    # compares the shipped naive oracle vs the dedup-first rewrite on the
    # same dir; both frames must be EXACTLY equal
    sf = sys.argv[1]
    con = duckdb.connect()
    con.sql("SET memory_limit='64GB'")
    con.sql("SET temp_directory='/tmp/duckdb_spill'")
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    default_json = '/tmp/verify_out/oracle_sql.json'
    orig = json.load(open(sys.argv[2] if len(sys.argv) > 2 else default_json))
    subs = [('q_dedup_groups', DEDUP_GROUPS), ('q_ngram_jaccard', NGRAM),
            ('q_lsh_recall', lsh_recall_rewrite(orig['q_lsh_recall'])),
            ('q_lsh_curve', lsh_curve_rewrite(orig['q_lsh_curve']))]
    if 'q_lsh_tune' in orig:  # added round 11
        subs.append(('q_lsh_tune', lsh_tune_rewrite(orig['q_lsh_tune'])))
    if 'q_dedup_keep_best' in orig:  # added round 11
        subs.append(('q_dedup_keep_best', keep_best_rewrite(orig['q_dedup_keep_best'])))
    for name, new_sql in subs:
        a = con.sql(orig[name]).df()
        b = con.sql(new_sql).df()
        same = a.equals(b)
        print(name, 'rows', len(a), len(b), 'EQUAL' if same else 'DIFF')
        if not same:
            cols = list(a.columns)
            merged = a.compare(b) if len(a)==len(b) else None
            print(merged.head(10) if merged is not None else 'rowcount mismatch')
