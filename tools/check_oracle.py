#!/usr/bin/env python3
"""Dev harness mimicking the driver's correctness gate: run each oracle
SQL in DuckDB over the same parquet tables and compare with the Verify
output parquet (column-name-sorted, row-sorted, exact values)."""
import json
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _compatible(a, b):
    """Arrow-type pairs that hash identically on the driver: ignore
    timezone annotation and string width; everything else must match."""
    strip = lambda t: t.replace(", tz=UTC", "").replace("large_string", "string")
    return strip(a) == strip(b)


def normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        res_dir = Path(out_dir, name)
        if not res_dir.exists():
            print(f"[MISS] {name}: no spark output")
            n_bad += 1
            continue
        try:
            got_tbl = pq.read_table(str(res_dir))
            want_tbl = con.execute(sql).arrow()
            got = got_tbl.to_pandas()
            want = want_tbl.to_pandas()
        except Exception as e:
            print(f"[ERR ] {name}: {e}")
            n_bad += 1
            continue
        # Arrow-schema sweep: the driver hash is TYPE-AWARE, so a DuckDB
        # HUGEINT (decimal128) vs Spark int64 mismatch fails it even when
        # every value is equal — and the pandas compare below would never
        # notice. Flag any physical-type divergence (timestamp unit and
        # int width included) per column.
        gs = {f.name: str(got_tbl.schema.field(f.name).type) for f in got_tbl.schema}
        ws = {f.name: str(want_tbl.schema.field(f.name).type) for f in want_tbl.schema}
        type_bad = [
            f"{c}: spark={gs[c]} oracle={ws[c]}"
            for c in sorted(set(gs) & set(ws))
            if gs[c] != ws[c] and not _compatible(gs[c], ws[c])
        ]
        if type_bad:
            print(f"[TYPE] {name}: {'; '.join(type_bad)}")
            n_bad += 1
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            print(f"[BAD ] {name}: columns {list(g.columns)} vs {list(w.columns)}")
            n_bad += 1
            continue
        if len(g) != len(w):
            print(f"[BAD ] {name}: rows {len(g)} vs {len(w)}")
            n_bad += 1
            continue
        try:
            import pandas.testing as pdt
            pdt.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
            print(f"[ OK ] {name}: {len(g)} rows")
            n_ok += 1
        except AssertionError as e:
            print(f"[BAD ] {name}: {str(e).splitlines()[-1] if str(e) else 'value mismatch'}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
