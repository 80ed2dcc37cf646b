#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify
output against the DuckDB oracle SQL it dumped, compare per query
(sorted columns by name, sorted rows, exact values).

Usage: check_oracle.py <sf_dir> <out_dir> [--json ARTIFACT] [--indb] [name ...]

Trailing names restrict the compare to that subset (matching
graft.Verify's own trailing-args contract); --json additionally dumps
the per-query result map in the CORRECTNESS artifact shape
({name: {err, hash_match, rows, rows_match, schema_match}}).

--indb keeps the row compare INSIDE DuckDB (counts + symmetric
EXCEPT ALL over name-ordered columns, memory-limited and
disk-spilling) instead of materializing both result sets as Python
tuples — the default path sorts every row in the interpreter, which
at sf100 (a 150M-row pipeline_e2e result) exceeds physical RAM. Both
sides of the in-DB compare are evaluated by DuckDB (it reads the
Spark parquet AND runs the oracle), so value normalization is
engine-uniform; NaNs compare equal under DuckDB's hash semantics,
matching the default path's repr() equality.

--slice col:K (with --indb) replays each compare in K disjoint
congruence slices of the named non-negative integer result column
(skipped per query when the column is absent, and the row's recorded
mode says which happened). For oracles whose windows and joins
partition on that column — the SemDeDup assignment's row_number over
vec_id is the motivating case — DuckDB pushes the slice filter below
them, bounding the replay's working set and spill to ~1/K of the
one-shot evaluation, which at sf100 otherwise outgrows the host's
free disk. Summed counts + summed EXCEPT ALL diffs across slices
prove the same multiset equality (the filter partitions both sides
identically).
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return repr(v)


def frame(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


def main(sf_dir, out_dir, json_out=None, only=(), indb=False,
         slice_spec=None):
    con = duckdb.connect()
    if indb:
        # bounded + spillable: the sf100 compares join/hash hundreds of
        # millions of rows — cap the engine well under physical RAM and
        # let it spill instead of getting OOM-killed. Overridable so
        # several replay workers can share the box without overcommit.
        import os
        mem = os.environ.get("CHECK_ORACLE_MEM", "48GB")
        spill = os.environ.get("CHECK_ORACLE_SPILL", "/tmp/duckdb_spill")
        con.execute(f"SET memory_limit='{mem}'")
        con.execute(f"SET temp_directory='{spill}'")
        thr = os.environ.get("CHECK_ORACLE_THREADS")
        if thr:
            con.execute(f"SET threads={int(thr)}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        missing = sorted(set(only) - set(oracle))
        if missing:
            print(f"FAIL unknown query names: {missing}")
            return 1
        oracle = {k: v for k, v in oracle.items() if k in set(only)}
    n_pass = n_fail = 0
    results = {}
    # per-query honest mode label: "indb-sliced(col:K)" ONLY when the
    # slice column actually cut this query's compare (set per query
    # below); everything else records plain "indb"
    mode_holder = {"m": None}

    def record(name, err=None, rows=None, rows_match=False,
               schema_match=False, hash_match=False):
        results[name] = {"err": err, "hash_match": hash_match,
                         "rows": rows, "rows_match": rows_match,
                         "schema_match": schema_match}
        if indb:
            # the in-DB path proves multiset equality (counts +
            # symmetric EXCEPT ALL), not the driver's full-precision
            # repr() hash — record that honestly so artifact consumers
            # can tell the two certifications apart
            results[name]["hash_match"] = None
            results[name]["mode"] = mode_holder["m"] or "indb"

    for name, sql in sorted(oracle.items()):
        mode_holder["m"] = None
        if indb:
            spark_rel = f"SELECT * FROM '{out_dir}/{name}/*.parquet'"
            try:
                gt = con.execute(f"DESCRIBE {spark_rel}").fetchall()
            except Exception as e:
                print(f"FAIL {name}: spark output unreadable: {e}")
                record(name, err=f"spark output unreadable: {e}")
                n_fail += 1
                continue
            try:
                et = con.execute(f"DESCRIBE {sql}").fetchall()
            except Exception as e:
                msg = str(e).splitlines()[0]
                print(f"FAIL {name}: oracle SQL error: {msg}")
                record(name, err=f"oracle SQL error: {msg}")
                n_fail += 1
                continue
            gtypes = {r[0]: r[1] for r in gt}
            etypes = {r[0]: r[1] for r in et}
            if gtypes != etypes:
                tdiff = {k: (gtypes.get(k), etypes.get(k))
                         for k in set(gtypes) | set(etypes)
                         if gtypes.get(k) != etypes.get(k)}
                print(f"FAIL {name}: schema differs {tdiff}")
                record(name, err=f"schema differs {tdiff}")
                n_fail += 1
                continue
            cols = ", ".join(f'"{c}"' for c in sorted(gtypes))
            # --slice col:K replays the oracle in K disjoint congruence
            # slices of a non-negative integer result column instead of
            # one evaluation — bounding the engine's working set (and
            # its disk spill) to ~1/K when the oracle's own windows /
            # joins partition on that column (DuckDB pushes the slice
            # filter below them). The union of slices IS the relation:
            # the filter partitions BOTH compare sides identically, so
            # summed counts + summed symmetric EXCEPT ALL diffs prove
            # the same multiset equality the one-shot compare does.
            if slice_spec and slice_spec[0] in gtypes:
                scol, k = slice_spec
                cuts = [f" WHERE (\"{scol}\") % {k} = {i}" for i in range(k)]
                mode_holder["m"] = f"indb-sliced({scol}:{k})"
            else:
                cuts = [""]
            n_spark = n_diff = 0
            err = None
            for cut in cuts:
                try:
                    # materialize each side ONCE per slice (heavy
                    # oracles replay the full minhash/simhash machinery
                    # — evaluating them per EXCEPT side would double
                    # that cost); temp tables obey memory_limit and
                    # spill to temp_directory, and are dropped before
                    # the next slice so slice spills never stack
                    con.execute(f"CREATE OR REPLACE TEMP TABLE __g AS "
                                f"SELECT {cols} FROM ({spark_rel}) __s{cut}")
                    con.execute(f"CREATE OR REPLACE TEMP TABLE __e AS "
                                f"SELECT {cols} FROM ({sql}) __t{cut}")
                    n_spark += con.execute(
                        "SELECT count(*) FROM __g").fetchone()[0]
                    n_diff += con.execute(
                        "SELECT count(*) FROM ("
                        "(SELECT * FROM __g EXCEPT ALL SELECT * FROM __e)"
                        " UNION ALL "
                        "(SELECT * FROM __e EXCEPT ALL SELECT * FROM __g))"
                    ).fetchone()[0]
                    con.execute("DROP TABLE IF EXISTS __g")
                    con.execute("DROP TABLE IF EXISTS __e")
                except Exception as e:
                    err = e
                    break
            if err is not None:
                e = err
                msg = str(e).splitlines()[0]
                print(f"FAIL {name}: in-db compare error: {msg}")
                record(name, err=f"in-db compare error: {msg}")
                n_fail += 1
                continue
            if n_diff:
                print(f"FAIL {name}: {n_diff} asymmetric rows "
                      f"(spark rows: {n_spark})")
                record(name, rows=n_spark, schema_match=True)
                n_fail += 1
                continue
            print(f"PASS {name} ({n_spark} rows)")
            record(name, rows=n_spark, rows_match=True, schema_match=True,
                   hash_match=True)
            n_pass += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_rows, got_cols = got.fetchall(), [d[0] for d in got.description]
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            record(name, err=f"spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            exp = con.execute(sql)
            exp_rows, exp_cols = exp.fetchall(), [d[0] for d in exp.description]
        except Exception as e:
            msg = str(e).splitlines()[0]
            print(f"FAIL {name}: oracle SQL error: {msg}")
            record(name, err=f"oracle SQL error: {msg}")
            n_fail += 1
            continue
        # dtype drift (e.g. DuckDB window-sum HUGEINT) breaks the
        # driver's pandas-based hash even when fetchall() values match:
        # pandas renders int128 as float64. Compare declared types too.
        try:
            gt = con.execute(
                f"DESCRIBE SELECT * FROM '{out_dir}/{name}/*.parquet'"
            ).fetchall()
            et = con.execute(f"DESCRIBE {sql}").fetchall()
            gtypes = {r[0]: r[1] for r in gt}
            etypes = {r[0]: r[1] for r in et}
            tdiff = {k: (gtypes.get(k), etypes.get(k))
                     for k in set(gtypes) | set(etypes)
                     if gtypes.get(k) != etypes.get(k)}
            if tdiff:
                print(f"FAIL {name}: dtypes differ {tdiff}")
                record(name, err=f"dtypes differ {tdiff}",
                       rows=len(got_rows))
                n_fail += 1
                continue
        except Exception:
            pass
        gc, gr = frame(got_rows, got_cols)
        ec, er = frame(exp_rows, exp_cols)
        if gc != ec:
            print(f"FAIL {name}: columns differ spark={gc} oracle={ec}")
            record(name, err=f"columns differ spark={gc} oracle={ec}",
                   rows=len(gr))
            n_fail += 1
            continue
        if len(gr) != len(er):
            print(f"FAIL {name}: rowcount spark={len(gr)} oracle={len(er)}")
            record(name, rows=len(gr), schema_match=True)
            n_fail += 1
            continue
        bad = [i for i, (a, b) in enumerate(zip(gr, er)) if a != b]
        if bad:
            i = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(gr)} rows differ; first @{i}:")
            print(f"   cols : {gc}")
            print(f"   spark: {gr[i]}")
            print(f"   duck : {er[i]}")
            record(name, rows=len(gr), rows_match=True, schema_match=True)
            n_fail += 1
            continue
        print(f"PASS {name} ({len(gr)} rows)")
        record(name, rows=len(gr), rows_match=True, schema_match=True,
               hash_match=True)
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
    return 1 if n_fail else 0


def usage():
    print("usage: check_oracle.py <sf_dir> <out_dir> [--json ARTIFACT] "
          "[--indb] [--slice col:K] [name ...]", file=sys.stderr)
    sys.exit(2)


if __name__ == "__main__":
    argv = sys.argv[1:]
    json_out = None
    indb = False
    slice_spec = None
    if "--indb" in argv:
        indb = True
        argv.remove("--indb")
    if "--slice" in argv:
        i = argv.index("--slice")
        if i + 1 >= len(argv) or ":" not in argv[i + 1]:
            print("error: --slice requires col:K", file=sys.stderr)
            usage()
        scol, k = argv[i + 1].rsplit(":", 1)
        slice_spec = (scol, int(k))
        argv = argv[:i] + argv[i + 2:]
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            print("error: --json requires an output path", file=sys.stderr)
            usage()
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    if len(argv) < 2:
        usage()
    sys.exit(main(argv[0], argv[1], json_out, tuple(argv[2:]), indb=indb,
                  slice_spec=slice_spec))
