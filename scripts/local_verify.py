#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare (harness contract,
SURVEY §5.1): run each oracle_sql.json entry in DuckDB over the same
parquet tables, load the Spark result parquet, sort columns by name,
compare row count, schema (column names), and values row-by-row.

Usage: python3 scripts/local_verify.py <sfDir> <outDir>
(after: sbt "runMain graft.Verify <sfDir> <outDir>")
"""
import sys, json, glob, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    """Canonicalize a cell for comparison (Decimal->float mismatch and
    NaN==NaN are surfaced as-is; driver compare is assumed exact)."""
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    results = {}
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            exp = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            results[name] = f"ORACLE_ERROR {e}"
            continue
        files = sorted(glob.glob(f"{out_dir}/{name}/part-*.parquet"))
        if not files:
            results[name] = "MISSING_RESULT"
            continue
        got = pq.read_table(files)
        exp = exp.select(sorted(exp.column_names))
        got = got.select(sorted(got.column_names))
        if exp.column_names != got.column_names:
            results[name] = f"COLS exp={exp.column_names} got={got.column_names}"
            continue
        if exp.num_rows != got.num_rows:
            results[name] = f"ROWS exp={exp.num_rows} got={got.num_rows}"
            continue
        # The driver's compare hashes TYPED values (a DECIMAL oracle column
        # vs a BIGINT Spark column fails even when values are equal — the
        # r2 a17 failure mode), so mismatched arrow types are a FAIL here
        # too, modulo representation-only differences.
        def norm_type(t):
            s = str(t)
            return {"large_string": "string", "timestamp[ns]": "timestamp[us]"}.get(s, s)
        badtypes = [
            (c, str(exp.schema.field(c).type), str(got.schema.field(c).type))
            for c in exp.column_names
            if norm_type(exp.schema.field(c).type) != norm_type(got.schema.field(c).type)]
        if badtypes:
            results[name] = f"TYPES (driver hash would fail) {badtypes}"
            continue
        ge, gg = exp.to_pylist(), got.to_pylist()
        bad = [(i, e, g) for i, (e, g) in enumerate(zip(ge, gg))
               if {k: canon(v) for k, v in e.items()} != {k: canon(v) for k, v in g.items()}]
        results[name] = "OK" if not bad else \
            f"VALUES {len(bad)}/{exp.num_rows} rows differ; first: {bad[0]}"

    ok = sum(1 for v in results.values() if v == "OK")
    for k, v in sorted(results.items()):
        print(("PASS " if v == "OK" else "FAIL ") + k +
              ("" if v == "OK" else "  " + str(v)[:400]))
    # queries declared without oracle get only the driver's rows-only check
    print(f"{ok}/{len(results)} PASS (oracle-checked)")
    sys.exit(0 if ok == len(results) else 1)


if __name__ == "__main__":
    main()
