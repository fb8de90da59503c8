#!/usr/bin/env python3
"""Dev-only local correctness harness, mimicking the driver's DuckDB-oracle
compare (NOT part of the engine; the engine is pure Scala/Spark).

Usage:
  python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out [query ...]

Reads each <out>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <out>/oracle_sql.json in DuckDB against views over
the sfDir parquet tables, sorts columns by name + rows by all columns, and
diffs values exactly.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    # --json <path>: also emit a CORRECTNESS_r*-style artifact (one
    # object per query: rows/schema/values match + row counts + err),
    # e.g. for the committed sf0.1 promotion artifact (round 19).
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            sys.exit("check.py: --json needs a path argument")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    sfdir, outdir = argv[0], argv[1]
    only = set(argv[2:])
    con = duckdb.connect()
    # Insertion order is irrelevant (both sides are canon-sorted below)
    # and preserving it roughly doubles DuckDB's memory/temp footprint
    # on the big re-derivation oracles — pl_corpus_build_e2e at sf0.1
    # ENOSPC'd a 70 GB disk with it on.
    con.execute("SET preserve_insertion_order=false")
    # High thread counts multiply out-of-core temp (each thread keeps
    # its own partitioned spill runs); 8 is plenty for the compare and
    # keeps the worst re-derivation oracle inside this box's disk.
    # GRAFT_CHECK_THREADS overrides for experiments.
    con.execute(f"SET threads={os.environ.get('GRAFT_CHECK_THREADS', '8')}")
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)))
    npass = nfail = nskip = 0
    art = {}
    def record(name, rows=None, schema=None, values=None,
               spark_rows=None, oracle_rows=None, err=None):
        art[name] = {"rows_match": rows, "schema_match": schema,
                     "hash_match": values, "spark_rows": spark_rows,
                     "oracle_rows": oracle_rows, "err": err}
    for name in names:
        if only and name not in only:
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"MISS  {name}: no parquet output")
            record(name, err="no parquet output")
            nfail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
        if name not in oracle:
            print(f"SKIP  {name}: rows-only ({len(got)} rows)")
            record(name, spark_rows=len(got), err="rows-only")
            nskip += 1
            continue
        try:
            want = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            record(name, spark_rows=len(got), err=f"oracle SQL error: {e}")
            nfail += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL  {name}: columns {list(g.columns)} != {list(w.columns)}")
            record(name, schema=False, spark_rows=len(g), oracle_rows=len(w))
            nfail += 1
            continue
        # dtype KIND mismatches (e.g. DuckDB HUGEINT -> pandas float64/
        # object vs Spark int64) fail the driver's hash compare even when
        # values are equal — catch them here too. Width-only differences
        # (int32 vs int64) are fine: the driver canonicalizes those.
        dt = [f"{c}: spark={g[c].dtype} oracle={w[c].dtype}"
              for c in g.columns if g[c].dtype.kind != w[c].dtype.kind]
        if dt:
            print(f"FAIL  {name}: dtype mismatch " + "; ".join(dt[:4]))
            record(name, rows=len(g) == len(w), schema=False,
                   spark_rows=len(g), oracle_rows=len(w),
                   err="dtype: " + "; ".join(dt[:2]))
            nfail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL  {name}: rows {len(g)} != {len(w)}")
            record(name, rows=False, schema=True, spark_rows=len(g),
                   oracle_rows=len(w))
            nfail += 1
            continue
        # exact compare; report first few diffs
        diffs = []
        for c in g.columns:
            a, b = g[c], w[c]
            neq = ~((a == b) | (a.isna() & b.isna()))
            if neq.any():
                i = neq.idxmax()
                diffs.append(f"{c}[{i}]: spark={a[i]!r} oracle={b[i]!r} "
                             f"({int(neq.sum())} diffs)")
        if diffs:
            print(f"FAIL  {name}: " + "; ".join(diffs[:3]))
            record(name, rows=True, schema=True, values=False,
                   spark_rows=len(g), oracle_rows=len(w),
                   err="; ".join(diffs[:2]))
            nfail += 1
        else:
            print(f"PASS  {name} ({len(g)} rows)")
            record(name, rows=True, schema=True, values=True,
                   spark_rows=len(g), oracle_rows=len(w))
            npass += 1
    print(f"== {npass} pass, {nfail} fail, {nskip} rows-only")
    if json_out:
        json.dump(art, open(json_out, "w"), indent=1, sort_keys=True)
        print("wrote", json_out)
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main()
