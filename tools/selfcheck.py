#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's correctness gate.

Runs graft.Verify output (parquet per query + oracle_sql.json) against
DuckDB over the same testdata parquet, compares sorted rows/columns.
Uses driver-side-only python deps (duckdb/pyarrow) — this script is NOT
part of the library; it exists so verify failures are caught before the
driver runs.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # bit-exact: the driver's compare hashes full-precision values,
        # so a last-ulp divergence is a FAIL. repr() is shortest round-trip.
        return repr(v)
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return f"{v}"
    except Exception:
        pass
    return repr(v)


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        pq_dir = os.path.join(out_dir, name)
        if not os.path.isdir(pq_dir):
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        try:
            g_rel = con.sql(
                f"SELECT * FROM read_parquet('{pq_dir}/*.parquet')")
            g_cols = list(g_rel.columns)
            g_dtypes = {c: str(t) for c, t in
                        zip(g_rel.columns, g_rel.df().dtypes)}
            g_rows = con.sql(
                f"SELECT * FROM read_parquet('{pq_dir}/*.parquet')").fetchall()
        except Exception as e:
            # empty result → spark writes no part files with rows; treat as empty
            g_cols, g_rows, g_dtypes = [], [], {}
        try:
            e_rel = con.sql(sql)
            e_cols = list(e_rel.columns)
            e_types = {c: str(t).upper() for c, t in
                       zip(e_rel.columns, e_rel.types)}
            e_dtypes = {c: str(t) for c, t in
                        zip(e_rel.columns, e_rel.df().dtypes)}
            e_rows = con.sql(sql).fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        # dtype guards — the round-3 lesson: fetchall() hides the int128
        # class of driver divergence (DuckDB returns HUGEINT for SUM(BIGINT)
        # and `//` over it; the driver's pandas compare converts HUGEINT to
        # float64 while Spark's parquet stays int64 → silent driver-only
        # hash fail). (1) no oracle column may be HUGEINT; (2) the pandas
        # dtype of every oracle column must equal the Spark side's.
        huge = sorted(c for c, t in e_types.items() if "HUGEINT" in t)
        if huge:
            print(f"FAIL {name}: oracle HUGEINT column(s) {huge} — "
                  f"CAST the SUM/`//` to BIGINT")
            n_fail += 1
            continue
        if g_dtypes:
            mism = sorted((c, g_dtypes[c], e_dtypes[c]) for c in e_dtypes
                          if c in g_dtypes and g_dtypes[c] != e_dtypes[c])
            if mism:
                print(f"FAIL {name}: pandas dtype mismatch spark vs oracle: "
                      f"{mism}")
                n_fail += 1
                continue
        # the driver's pandas-based compare handles Decimal scale and
        # array cells differently than duckdb's fetchall — forbid both
        # in result sets (final-cast decimals to DOUBLE; reduce arrays).
        import decimal
        bad = [v for r in (g_rows[:5] + e_rows[:5]) for v in r
               if isinstance(v, (decimal.Decimal, list, tuple))
               or type(v).__name__ == 'ndarray']
        if bad:
            print(f"FAIL {name}: decimal/array-typed output cell {bad[:1]}")
            n_fail += 1
            continue
        if not e_rows and not g_rows:
            print(f"pass {name} (both empty)")
            n_pass += 1
            continue
        gc, gr = rowset(g_cols, g_rows)
        ec, er = rowset(e_cols, e_rows)
        if gc != ec:
            print(f"FAIL {name}: cols spark={gc} oracle={ec}")
            n_fail += 1
        elif gr != er:
            n_fail += 1
            diff = [(a, b) for a, b in zip(gr, er) if a != b][:3]
            print(f"FAIL {name}: {len(gr)} vs {len(er)} rows; first diffs: {diff}")
        else:
            print(f"pass {name} ({len(gr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
