#!/usr/bin/env python3
"""Self-check mirroring the driver's correctness gate: run each oracle SQL in DuckDB over the
testdata parquet tables and compare (rows, columns-sorted-by-name, value hash) against the
engine's parquet dump from graft.Verify."""
import sys, json, glob, hashlib
import duckdb
import numpy as np

def canon(df):
    """Canonicalize THROUGH PANDAS (like the driver), not Python str():
    duckdb .df() maps HUGEINT -> float64, so an uncast sum(int) oracle renders '123.0'
    while the engine's int64 renders '123' — a mismatch the old str() path silently hid."""
    cols = sorted(df.columns, key=lambda c: c.lower())
    out = []
    for r in df[cols].itertuples(index=False):
        vals = []
        for v in r:
            if isinstance(v, (float, np.floating)):
                v = repr(round(float(v), 9))
            elif isinstance(v, np.ndarray):
                v = json.dumps(v.tolist())
            elif isinstance(v, (list, tuple)):
                v = json.dumps(list(v))
            else:
                v = str(v)
            vals.append(v)
        out.append("|".join(vals))
    out.sort()
    return hashlib.md5("\n".join(out).encode()).hexdigest(), len(out)

def main(outdir, sfdir):
    con = duckdb.connect()
    for p in glob.glob(f"{sfdir}/*.parquet"):
        name = p.split("/")[-1].replace(".parquet", "")
        con.sql(f"create view {name} as select * from '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    ok = fail = 0
    for name in sorted(oracle):
        try:
            wdf = con.sql(oracle[name]).df()
            wdf.columns = [c.lower() for c in wdf.columns]
            wcols = list(wdf.columns)
            whash, wn = canon(wdf)
            gdf = con.sql(f"select * from '{outdir}/{name}/*.parquet'").df()
            gdf.columns = [c.lower() for c in gdf.columns]
            gcols = list(gdf.columns)
            ghash, gn = canon(gdf)
            if sorted(wcols) != sorted(gcols):
                print(f"FAIL {name}: columns {sorted(gcols)} vs oracle {sorted(wcols)}"); fail += 1
            elif wn != gn:
                print(f"FAIL {name}: rows {gn} vs oracle {wn}"); fail += 1
            elif whash != ghash:
                print(f"FAIL {name}: value hash mismatch ({gn} rows)"); fail += 1
            else:
                print(f"MATCH {name} ({gn} rows)"); ok += 1
        except Exception as e:
            print(f"ERROR {name}: {e}"); fail += 1
    # rows-only queries (no oracle)
    for d in sorted(glob.glob(f"{outdir}/q*")):
        name = d.split("/")[-1]
        if name not in oracle:
            try:
                n = con.sql(f"select count(*) from '{d}/*.parquet'").fetchone()[0]
                print(f"ROWS-ONLY {name}: {n} rows" + (" (EMPTY!)" if n == 0 else ""))
            except Exception as e:
                print(f"ERROR {name}: {e}")
    print(f"== {ok} match, {fail} fail")
    return 1 if fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
