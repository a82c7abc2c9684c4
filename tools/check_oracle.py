#!/usr/bin/env python3
"""Dev harness mimicking the driver's correctness gate: run each oracle
SQL in DuckDB over the same parquet tables and compare with the Verify
output parquet (column-name-sorted, row-sorted, exact values).

Optional third argument: a path to write the results in the DRIVER'S
per-query CORRECTNESS format —
  {"<query>": {"rows_match": bool, "schema_match": bool,
               "hash_match": bool, "spark_rows": int,
               "oracle_rows": int, "err": str|null}, ...}
— so a round can commit its own CORRECTNESS_LOCAL.json and never close
evidence-free even if the driver-side artifact channel drops the round
(CORRECTNESS_r11 and _r12 both came back `{}` despite a green in-repo
chain). Queries listed in Verify's failed_queries.json are reported as
red rows with the captured error, not silently absent from the
denominator.
"""
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


def main(sf_dir, out_dir, json_out=None, exclusions_path=None):
    con = duckdb.connect()
    # Bounded-resource SWEEP mode, active only when an exclusions file is
    # passed (the sf0.1 sweep, r14 verdict #4): a handful of
    # iterative-CTE oracles have corpus-quadratic DuckDB join state (the
    # dense contact graph) and, unbounded, grind 30+ minutes toward a
    # 100 GiB OOM each. Cap memory and disable temp spill there so an
    # oversized oracle fails in minutes with the OOM recorded. The
    # DEFAULT (driver-mimicking sf0.01 gate) stays unbounded — the
    # Louvain L2 oracle legitimately spills past 60 GB even at sf0.01
    # and must keep passing.
    if exclusions_path:
        con.execute("SET memory_limit='60GB'")
        con.execute("SET temp_directory=''")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    try:
        verify_failed = json.loads(Path(out_dir, "failed_queries.json").read_text())
    except Exception:
        verify_failed = {}
    # Optional 4th arg: {query_name: reason} — known oracle-side scale
    # exclusions, recorded (never silently absent) and counted apart
    # from real failures.
    exclusions = json.loads(Path(exclusions_path).read_text()) if exclusions_path else {}
    n_ok = n_bad = n_excl = 0
    report = {}

    def record(name, rows_match, schema_match, hash_match, spark_rows, oracle_rows, err):
        report[name] = {
            "rows_match": rows_match,
            "schema_match": schema_match,
            "hash_match": hash_match,
            "spark_rows": spark_rows,
            "oracle_rows": oracle_rows,
            "err": err,
        }

    for name, sql in sorted(oracle.items()):
        res_dir = Path(out_dir, name)
        if name in exclusions:
            n_rows = pq.read_table(str(res_dir)).num_rows if res_dir.exists() else 0
            print(f"[EXCL] {name}: {exclusions[name]}")
            record(name, None, None, None, n_rows, None,
                   f"excluded: {exclusions[name]}")
            n_excl += 1
            continue
        if not res_dir.exists():
            err = verify_failed.get(name, "no spark output")
            print(f"[MISS] {name}: {err}")
            record(name, False, False, False, 0, 0, err)
            n_bad += 1
            continue
        try:
            got_tbl = pq.read_table(str(res_dir))
            want_tbl = con.execute(sql).arrow()
            got = got_tbl.to_pandas()
            want = want_tbl.to_pandas()
        except Exception as e:
            print(f"[ERR ] {name}: {e}")
            record(name, False, False, False, 0, 0, str(e)[:500])
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
            msg = "; ".join(type_bad)
            print(f"[TYPE] {name}: {msg}")
            record(name, len(got) == len(want), False, False, len(got), len(want), msg[:500])
            n_bad += 1
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            msg = f"columns {list(g.columns)} vs {list(w.columns)}"
            print(f"[BAD ] {name}: {msg}")
            record(name, len(g) == len(w), False, False, len(g), len(w), msg[:500])
            n_bad += 1
            continue
        if len(g) != len(w):
            print(f"[BAD ] {name}: rows {len(g)} vs {len(w)}")
            record(name, False, True, False, len(g), len(w), None)
            n_bad += 1
            continue
        try:
            import pandas.testing as pdt
            pdt.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
            print(f"[ OK ] {name}: {len(g)} rows")
            record(name, True, True, True, len(g), len(w), None)
            n_ok += 1
        except AssertionError as e:
            msg = str(e).splitlines()[-1] if str(e) else "value mismatch"
            print(f"[BAD ] {name}: {msg}")
            record(name, True, True, False, len(g), len(w), msg[:500])
            n_bad += 1
    # Verify-side failures whose names have no oracle entry (rare: a gate
    # that is spec-gated only) still deserve a red row in the report.
    for name, err in sorted(verify_failed.items()):
        if name not in report:
            print(f"[FAIL] {name}: {err}")
            record(name, False, False, False, 0, 0, err)
            n_bad += 1
    if json_out:
        Path(json_out).write_text(json.dumps(report, indent=1, sort_keys=True))
        print(f"wrote {json_out}: {len(report)} queries")
    print(f"\n{n_ok} ok, {n_bad} bad" + (f", {n_excl} excluded" if n_excl else ""))
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None,
                  sys.argv[4] if len(sys.argv) > 4 else None))
