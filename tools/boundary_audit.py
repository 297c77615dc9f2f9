#!/usr/bin/env python3
"""Oracle-divergence risk audit (DESIGN.md §7): measures how close the data
sits to every decision boundary in the oracle-compared queries — top-k
membership gaps, ordering gaps, similarity thresholds, and rounding ties.
Run whenever queries or testdata change; small distances flag comparisons
that could flip between engines."""
import sys
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
con = duckdb.connect()
for t in ["orders", "lineitem", "events", "embeddings", "documents",
          "customer", "supplier", "part"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")


def quant_tie_distance():
    # emb_quant_error rounds x/scale to int; a value exactly at .5 could in
    # principle flip between engines with different tie rules (both Spark
    # and DuckDB round half away from zero, but measure the margin anyway)
    t = con.sql("""WITH e AS (SELECT CAST(embedding AS DOUBLE[]) v FROM embeddings),
      s AS (SELECT v, list_max(list_transform(v, x -> abs(x)))/127.0 AS scale FROM e),
      u AS (SELECT abs(unnest(v)/scale) AS q FROM s)
      SELECT min(abs(q - floor(q) - 0.5)) FROM u""").fetchone()
    return t[0]


def dist_to_round_boundary(vals, dp):
    out = []
    for (v,) in vals:
        if v is None:
            continue
        x = abs(v) * (10 ** dp)
        out.append(abs((x - int(x)) - 0.5))
    return min(out) if out else None


r = con.sql("""SELECT sum(l_extendedprice*(1-l_discount)) AS rev FROM lineitem
  JOIN orders ON l_orderkey=o_orderkey JOIN customer ON o_custkey=c_custkey
  WHERE c_mktsegment='BUILDING' GROUP BY l_orderkey ORDER BY rev DESC LIMIT 12""").fetchall()
print("q03 10th-11th revenue gap:", r[9][0] - r[10][0])

g = con.sql("""WITH q AS (SELECT vec_id qid, CAST(embedding AS DOUBLE[]) qv FROM embeddings WHERE vec_id<20),
c AS (SELECT vec_id nid, CAST(embedding AS DOUBLE[]) cv FROM embeddings),
s AS (SELECT qid, nid, list_cosine_similarity(qv,cv) cos FROM q JOIN c ON nid<>qid),
r AS (SELECT qid, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC) rk FROM s)
SELECT min(gap) FROM (SELECT qid, cos - lead(cos) OVER (PARTITION BY qid ORDER BY rk) AS gap FROM r WHERE rk<=11)""").fetchone()
print("sim_topk min adjacent cosine gap (ranks 1-11):", g[0])

d = con.sql("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
p AS (SELECT list_cosine_similarity(a.v,b.v) cs FROM e a JOIN e b ON a.vec_id<b.vec_id)
SELECT min(abs(cs-0.45)) FROM p""").fetchone()
print("dedup_embedding_cosine min |cos-0.45|:", d[0])

j = con.sql(r"""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
grams AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS g FROM toks, unnest(generate_series(1, greatest(len(w)-2,1))) AS t(i)),
sizes AS (SELECT doc_id, count(*) n FROM grams GROUP BY 1),
inter AS (SELECT a.doc_id ia, b.doc_id ib, count(*) c FROM grams a JOIN grams b ON a.g=b.g AND a.doc_id<b.doc_id GROUP BY 1,2)
SELECT min(abs(c*1.0/(sa.n+sb.n-c) - 0.5)) FROM inter JOIN sizes sa ON sa.doc_id=ia JOIN sizes sb ON sb.doc_id=ib""").fetchone()
print("ngram_jaccard min |j-0.5|:", j[0])

print("q01 sums dp2 boundary dist:", dist_to_round_boundary(con.sql(
    "SELECT sum(l_quantity) FROM lineitem WHERE l_shipdate <= TIMESTAMP '2024-09-02' GROUP BY l_returnflag,l_linestatus"
    " UNION ALL SELECT sum(l_extendedprice) FROM lineitem WHERE l_shipdate <= TIMESTAMP '2024-09-02' GROUP BY l_returnflag,l_linestatus"
    " UNION ALL SELECT sum(l_extendedprice*(1-l_discount)) FROM lineitem WHERE l_shipdate <= TIMESTAMP '2024-09-02' GROUP BY l_returnflag,l_linestatus").fetchall(), 2))
print("events_tumbling sum_value dp2 boundary dist:", dist_to_round_boundary(con.sql(
    "SELECT sum(value) FROM events GROUP BY date_trunc('hour', ts), event_type").fetchall(), 2))
print("quality avg_token_len dp4 boundary dist:", dist_to_round_boundary(con.sql(
    r"SELECT list_sum(list_transform(string_split_regex(trim(text),'\s+'), x->length(x)))*1.0/greatest(len(string_split_regex(trim(text),'\s+')),1) FROM documents").fetchall(), 4))
print("percentiles dp2 boundary dist:", dist_to_round_boundary(con.sql(
    "SELECT quantile_cont(o_totalprice, 0.5) FROM orders GROUP BY o_orderpriority"
    " UNION ALL SELECT quantile_cont(o_totalprice, 0.9) FROM orders GROUP BY o_orderpriority").fetchall(), 2))
print("emb_quant round-tie distance:", quant_tie_distance())
print("decontaminate containment dp4 boundary dist:", dist_to_round_boundary(con.sql(r"""
  WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
  grams AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS g
            FROM t, unnest(generate_series(1, greatest(len(w)-2, 1))) AS u(i)),
  bench AS (SELECT DISTINCT g FROM grams WHERE doc_id < 10),
  c AS (SELECT doc_id, count(*) n, count(*) FILTER (g IN (SELECT g FROM bench)) h
        FROM grams GROUP BY doc_id)
  SELECT h*1.0/greatest(n,1) FROM c""").fetchall(), 4))
print("repetition rep_ratio dp4 boundary dist:", dist_to_round_boundary(con.sql(r"""
  WITH t AS (SELECT string_split_regex(trim(text), '\s+') AS w FROM documents)
  SELECT 1.0 - len(list_distinct(list_transform(generate_series(1, greatest(len(w)-1,1)),
    i -> array_to_string(w[i:i+1], ' '))))*1.0/greatest(len(w)-1,1) FROM t""").fetchall(), 4))
print("emb_quant scale_r dp6 boundary dist:", dist_to_round_boundary(con.sql("""
  SELECT greatest(list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x)))/127.0,
    2.2250738585072014e-308) FROM embeddings""").fetchall(), 6))
print("emb_quant cos_r dp4 boundary dist:", dist_to_round_boundary(con.sql("""
  WITH e AS (SELECT CAST(embedding AS DOUBLE[]) v FROM embeddings),
  s AS (SELECT v, greatest(list_max(list_transform(v, x -> abs(x)))/127.0,
    2.2250738585072014e-308) scale FROM e),
  q AS (SELECT v, list_transform(v, x -> round(x/scale)*scale) deq FROM s)
  SELECT list_cosine_similarity(deq, v) FROM q""").fetchall(), 4))

# ---- round-4 queries ----
# tfidf: rank-3 boundary gap per doc — adjacent (score, term) pairs at the
# top-k cut. Exact rational ties are SAFE (identical int/int division in
# both engines + term tie-break); this measures how often they occur.
rows = con.sql(r"""
  WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term FROM documents),
  tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
  dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
  s AS (SELECT doc_id, tf*1.0/df AS score,
        row_number() OVER (PARTITION BY doc_id ORDER BY tf*1.0/df DESC, term) AS rnk
        FROM tf JOIN dfreq USING (term))
  SELECT a.doc_id, a.score - b.score FROM s a JOIN s b
  ON a.doc_id = b.doc_id AND a.rnk = 3 AND b.rnk = 4""").fetchall()
gaps = [g for (_, g) in rows]
exact_ties = sum(1 for g in gaps if g == 0.0)
print(f"tfidf rank-3/4 boundary: {exact_ties}/{len(gaps)} exact rational ties"
      f" (term-tiebroken, engine-safe); min nonzero gap:"
      f" {min((g for g in gaps if g > 0), default=None)}")
# q17: distance of each qualifying-side l_quantity from its part's 0.2*avg
# cap. Both engines compute the cap from integer-exact avgs, so the
# comparison is identical regardless of distance; recorded for the audit.
print("q17 min |l_quantity - 0.2*avg| (Brand#2/4):", con.sql("""
  WITH caps AS (SELECT l_partkey AS pk, 0.2*avg(l_quantity) AS cap FROM lineitem GROUP BY 1)
  SELECT min(abs(l_quantity - cap)) FROM lineitem JOIN part ON p_partkey = l_partkey
  JOIN caps ON pk = l_partkey WHERE p_brand IN ('Brand#2','Brand#4')""").fetchone()[0])
# top_ngrams: doc_freq tie at the k=20 cut (gram tie-break makes it safe)
print("top_ngrams rank-20/21 doc_freq tie:", con.sql(r"""
  WITH t AS (SELECT doc_id, string_split_regex(trim(text),'\s+') AS w FROM documents),
  grams AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+1], ' ') AS g
            FROM t, unnest(generate_series(1, greatest(len(w)-1, 1))) AS u(i)),
  c AS (SELECT g, count(*) AS f, row_number() OVER (ORDER BY count(*) DESC, g) AS rnk
        FROM grams GROUP BY g)
  SELECT (SELECT f FROM c WHERE rnk=20) = (SELECT f FROM c WHERE rnk=21)""").fetchone()[0],
  "(gram-tiebroken, engine-safe)")

# ---- round-6-final queries ----
# split_leakage: containment dp4 rounding boundary over the held-out docs
print("split_leakage containment dp4 boundary dist:", dist_to_round_boundary(con.sql(r"""
  WITH f AS (SELECT doc_id, text, list_reduce(
    list_prepend(CAST(0 AS BIGINT),
      list_transform(range(1, length(text) + 1), i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
    (h, c) -> (h * 31 + c) % 1000000007) % 100 AS bucket FROM documents),
  t AS (SELECT doc_id, bucket, string_split_regex(trim(text), '\s+') AS w FROM f),
  grams AS (SELECT DISTINCT doc_id, bucket, array_to_string(w[i:i+2], ' ') AS g
            FROM t, unnest(generate_series(1, greatest(len(w)-2, 1))) AS u(i)),
  train AS (SELECT DISTINCT g FROM grams WHERE bucket < 90),
  c AS (SELECT doc_id, count(*) n, count(*) FILTER (g IN (SELECT g FROM train)) h
        FROM grams WHERE bucket >= 90 GROUP BY doc_id)
  SELECT h*1.0/greatest(n,1) FROM c""").fetchall(), 4))
# keep_best: quality-score ties inside a cluster are SAFE by design (both
# engines break on min id); measure how far scores sit from the discrete
# {0, .3, .4, .6, .7, 1.0} lattice — any value OFF the lattice would mean
# the score arithmetic itself diverged
q6 = con.sql(r"""
  WITH t AS (SELECT string_split_regex(trim(text), '\s+') AS w FROM documents),
  q AS (SELECT len(w) AS n,
    round(list_sum(list_transform(w, x -> length(x)))*1.0/greatest(len(w),1), 4) AS atl,
    round(len(list_filter(w, x -> list_contains(['the','and','of','to','in','is','it','that','for','on'], lower(x))))*1.0/greatest(len(w),1), 4) AS sw
    FROM t)
  SELECT DISTINCT round((CASE WHEN n BETWEEN 10 AND 200 THEN 0.4 ELSE 0.0 END)
    + (CASE WHEN atl BETWEEN 2.0 AND 10.0 THEN 0.3 ELSE 0.0 END)
    + (CASE WHEN sw > 0.0 THEN 0.3 ELSE 0.0 END), 2) FROM q""").fetchall()
lattice = {0.0, 0.3, 0.4, 0.6, 0.7, 1.0}
scores = sorted(float(v) for (v,) in q6)  # DuckDB round() yields Decimal
print("keep_best quality scores on the discrete lattice:",
      set(scores) <= lattice, scores)
# incremental curation: min |quality - 0.5| over the keep cut — the lattice
# has no 0.5 member, so this must be >= 0.1
print("incremental_curation min |quality-0.5|:",
      min(abs(v - 0.5) for v in scores))

# ---- round-7 queries ----
# docs_source_cap: the cap selects top-10 per source by (score desc, id asc).
# Scores live on the discrete lattice, so rank-10/11 ties are COMMON and the
# id tie-break must resolve them in both engines (it does: row_number vs the
# boundary-bucket rank use the same (score, id) order). Count how many
# sources actually exercise the tie path — if 0, the boundary logic is
# untested by this data; if >0, the green hash proves the tie-break.
r7 = con.sql(r"""
  WITH t AS (SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS w FROM documents),
  q AS (SELECT doc_id, source,
    round((CASE WHEN len(w) BETWEEN 10 AND 200 THEN 0.4 ELSE 0.0 END)
      + (CASE WHEN round(list_sum(list_transform(w, x -> length(x)))*1.0/greatest(len(w),1),4) BETWEEN 2.0 AND 10.0 THEN 0.3 ELSE 0.0 END)
      + (CASE WHEN round(len(list_filter(w, x -> list_contains(['the','a','and','of','fast','slow'], lower(x))))*1.0/greatest(len(w),1),4) > 0.0 THEN 0.3 ELSE 0.0 END), 2) AS s
    FROM t),
  r AS (SELECT source, s, row_number() OVER (PARTITION BY source ORDER BY s DESC, doc_id) rn FROM q)
  SELECT count(*) FROM (
    SELECT source FROM r WHERE rn IN (10, 11) GROUP BY source
    HAVING count(DISTINCT s) = 1 AND count(*) = 2)""").fetchone()
print("source_cap sources with a score tie ACROSS the rank-10/11 cut "
      "(id tie-break exercised):", r7[0])
# dedup_cross_corpus: margin of every cross-parity jaccard from the 0.5
# threshold, and best-match ties per new doc (two refs at the same jaccard
# — resolved by min ref id in both engines)
jac = con.sql(r"""
  WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
  grams AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS g
            FROM t, unnest(generate_series(1, greatest(len(w)-2, 1))) AS u(i)),
  sizes AS (SELECT doc_id, count(*) n FROM grams GROUP BY doc_id),
  inter AS (SELECT b.doc_id id_new, a.doc_id id_ref, count(*) c FROM grams a
            JOIN grams b ON a.g = b.g WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1 GROUP BY 1,2),
  jac AS (SELECT id_new, id_ref, c*1.0/(sa.n+sb.n-c) j FROM inter
          JOIN sizes sa ON sa.doc_id=id_ref JOIN sizes sb ON sb.doc_id=id_new)
  SELECT min(abs(j - 0.5)),
         (SELECT count(*) FROM (SELECT id_new FROM jac WHERE j >= 0.5
            GROUP BY id_new, j HAVING count(*) > 1))
  FROM jac""").fetchone()
print("cross_corpus min |jaccard-0.5| margin:", jac[0],
      "| best-match jaccard ties (id-resolved):", jac[1])
