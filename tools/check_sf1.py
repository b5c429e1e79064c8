#!/usr/bin/env python3
"""sf1-scale oracle compare: tools/check.py semantics plus survival gear.

Differences from check.py (which stays the faithful driver mirror):
  * cheap-first ordering (previous-run timings), so slow oracles can't starve
    the cheap ones of a verdict;
  * every top-level CTE gets DuckDB's `AS MATERIALIZED` hint — a pure
    evaluation hint (each CTE computed once instead of re-inlined per
    consumer); at sf1 DuckDB re-inlines the Lloyd/LSH CTEs multiplicatively
    and a linear oracle turns into CPU-hours. Falls back to the unhinted SQL
    if the hinted parse fails;
  * per-oracle wall timeout (default 900 s) via duckdb.interrupt from a
    watchdog thread → recorded as `oracle_timeout`, loop continues;
  * the dedup-family oracles (STAGED set) execute each top-level CTE as a
    TEMP TABLE in sequence before the final SELECT — even `AS MATERIALIZED`
    leaves DuckDB re-deriving the big minhash/pair CTE chains inside one
    plan at sf1 (r12: 783 s for dedup_groups against a 900 s watchdog);
    staging pins every intermediate exactly once. Results are identical —
    it's the same SQL, evaluated stepwise. Falls back to the single-plan
    path if the WITH-chain parse fails.

Usage: python3 tools/check_sf1.py <sfDir> <verifyOutDir> <resultJson> [timeoutS]
"""
import sys, os, re, json, glob, time, threading
import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(__file__))
from check import canon, TABLES

CHEAP_FIRST = [
    "bellman_ford", "pagerank", "louvain", "louvain_multilevel", "iterate_cc",
    "text_c4", "text_gopher", "dedup_exact", "dedup_spans", "decontaminate",
    "dedup_ngram_jaccard", "embedding_cosine_pairs", "dedup_simhash",
    "knn_brute_force", "knn_hnsw", "knn_ivf", "knn_lsh", "knn_classify",
    "classifier_accuracy", "clustering_lsh", "dedup_minhash_lsh",
]

def materialize_ctes(sql: str) -> str:
    # `name AS (` after WITH or `,` is a CTE head in the generated oracles;
    # leave any already-hinted CTE alone.
    return re.sub(r"((?:WITH|,)\s*[A-Za-z_][A-Za-z0-9_]*\s+AS)\s*\(",
                  r"\1 MATERIALIZED (", sql)

# oracles whose CTE chains DuckDB re-derives multiplicatively at sf1 even
# under MATERIALIZED — stage their CTEs as temp tables instead
STAGED = {
    "dedup_pipeline",
    "dedup_minhash_lsh", "dedup_groups", "dedup_keep_best", "dedup_simhash",
    "dedup_ngram_jaccard", "dedup_spans", "decontaminate",
    "decontaminate_fuzzy", "embedding_cosine_pairs",
    # NOT clustering_lsh: its single plan streams the Lloyd chain fine and
    # staging materializes it (4× slower measured at sf0.01)
}

def split_ctes(sql: str):
    """Parse a flat top-level `WITH a AS (...), b AS (...) SELECT ...` into
    ([(name, body)...], final_select). None if the shape doesn't match
    (recursive CTEs, no WITH). Paren scan skips single-quoted strings."""
    s = sql.strip()
    if not re.match(r"WITH\b", s, re.I) or re.match(r"WITH\s+RECURSIVE\b", s, re.I):
        return None
    i, ctes = 4, []
    while True:
        m = re.match(r"\s*([A-Za-z_][A-Za-z0-9_]*)\s+AS\s*(?:MATERIALIZED\s+)?\(",
                     s[i:], re.I)
        if not m:
            return None
        j = i + m.end()          # just past the opening paren
        depth, k, in_str = 1, j, False
        while k < len(s) and depth:
            c = s[k]
            if in_str:
                if c == "'":
                    if k + 1 < len(s) and s[k + 1] == "'":
                        k += 1   # escaped '' stays inside the string
                    else:
                        in_str = False
            elif c == "'":
                in_str = True
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            k += 1
        if depth:
            return None
        ctes.append((m.group(1), s[j:k - 1]))
        m2 = re.match(r"\s*,", s[k:])
        if not m2:
            return ctes, s[k:]
        i = k + m2.end()

def run_staged(con, sql):
    """Execute each CTE as CREATE TEMP TABLE, then the final SELECT.
    Returns the DataFrame, or None when the SQL shape doesn't stage."""
    parsed = split_ctes(sql)
    if not parsed:
        return None
    ctes, final = parsed
    created = []
    try:
        for name, body in ctes:
            con.execute(f'CREATE TEMP TABLE "{name}" AS {body}')
            created.append(name)
        return con.sql(final).df()
    finally:
        # temp tables shadow the base views by name; drop via the temp
        # catalog so the views are untouched
        for name in reversed(created):
            try:
                con.execute(f'DROP TABLE IF EXISTS temp.main."{name}"')
            except Exception:
                pass

def main(sf_dir, out_dir, result_path, timeout_s=900):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = [n for n in CHEAP_FIRST if n in oracle] + sorted(set(oracle) - set(CHEAP_FIRST))
    results = {}
    for name in names:
        t0 = time.time()
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = {"ok": False, "err": "no spark output"}; continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        timer = threading.Timer(timeout_s, con.interrupt)
        timer.start()
        staged = False
        try:
            exp = None
            if name in STAGED:
                try:
                    exp = run_staged(con, oracle[name])
                    staged = exp is not None
                except duckdb.InterruptException:
                    raise
                except Exception as se:
                    print(f"STAGE-FALLBACK {name}: {se}", flush=True)
                    exp = None
            if exp is None:
                try:
                    exp = con.sql(materialize_ctes(oracle[name])).df()
                except duckdb.ParserException:
                    exp = con.sql(oracle[name]).df()
        except duckdb.InterruptException:
            results[name] = {"ok": False, "err": "oracle_timeout", "oracle_s": round(time.time() - t0, 1)}
            print(f"TIMEOUT {name} after {timeout_s}s", flush=True)
            continue
        except Exception as e:
            results[name] = {"ok": False, "err": f"oracle error: {e}"}
            print(f"FAIL {name}: oracle error {e}", flush=True)
            continue
        finally:
            timer.cancel()
        g, e = canon(got), canon(exp)
        ok = list(g.columns) == list(e.columns) and len(g) == len(e)
        detail = "" if ok else f"cols/rows {list(g.columns)}×{len(g)} vs {list(e.columns)}×{len(e)}"
        if ok and not g.equals(e):
            try:
                pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
            except AssertionError as ae:
                ok, detail = False, str(ae).splitlines()[0]
        dt = round(time.time() - t0, 1)
        results[name] = {"ok": ok, "rows": len(g), "oracle_s": dt,
                         **({"staged": True} if staged else {}),
                         **({"err": detail} if detail else {})}
        print(f"{'PASS' if ok else 'FAIL'} {name} rows={len(g)} oracle_s={dt} {detail}", flush=True)
        json.dump(results, open(result_path, "w"), indent=1)
    json.dump(results, open(result_path, "w"), indent=1)
    n_ok = sum(1 for r in results.values() if r.get("ok"))
    print(f"{n_ok}/{len(results)} pass", flush=True)

if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0], a[1], a[2], int(a[3]) if len(a) > 3 else 900)
