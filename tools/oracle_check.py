#!/usr/bin/env python3
"""Dev-side replica of the driver's DuckDB-oracle correctness gate.

NOT part of the shipped Scala library — a local harness so oracle parity
is validated before the driver runs. Usage:

    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/verify_out

An optional third argument restricts to queries whose name falls in a
[lo, hi) prefix range, e.g. `a:g` — lets the full 300-query compare be
chunked under a per-command wall-clock cap.

An optional fourth argument is a JSON summary output path (per-query
OK/FAIL/rows-only + totals) — closeout commits it as ORACLE_r{N}.json so
every sealed round carries builder-side gate evidence even if the
driver's own CORRECTNESS artifact arrives empty (r11: official file was
`{}` and only a judge-side full re-run proved the round green).
"""
import json
import os
import sys

import duckdb


def main(sf_dir: str, out_dir: str, name_range: str = "",
         json_out: str = "") -> int:
    results = {}
    con = duckdb.connect()
    for name in ("region nation customer supplier part orders lineitem "
                 "events documents embeddings").split():
        p = f"{sf_dir}/{name}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    lo, hi = (name_range.split(":") + [""])[:2] if name_range else ("", "")
    failures = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        if name_range and not ((not lo or name >= lo) and (not hi or name < hi)):
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet('{d}/*.parquet')").fetchdf()
        if name not in oracle:
            print(f"[rows-only] {name}: {len(got)} rows")
            results[name] = {"status": "rows-only", "rows": len(got)}
            continue
        # Declared-type lint BEFORE the value compare: DuckDB promotes
        # sum(BIGINT) to HUGEINT, which fetchdf() renders as float64.
        # pandas `==` says 52.0 == 52, so values still "match" here —
        # but the driver's gate HASHES values, and hash("52.0") !=
        # hash("52"). This exact asymmetry was the whole 8-query red
        # class of rounds 5-6. Fail loudly on any final-select type
        # pandas maps differently than the Spark parquet side would.
        desc = con.execute(f"DESCRIBE ({oracle[name]})").fetchall()
        bad_types = [(c, t) for c, t, *_ in desc
                     if t.upper() in ("HUGEINT", "UHUGEINT")
                     or t.upper().startswith("DECIMAL")]
        want = con.execute(oracle[name]).fetchdf()
        ok, msg = compare(got, want)
        if ok and bad_types:
            ok, msg = False, (f"oracle emits driver-hash-unsafe types "
                              f"{bad_types}: CAST to BIGINT/DOUBLE in "
                              f"the final SELECT")
        status = "OK " if ok else "FAIL"
        print(f"[{status}] {name}: {msg}")
        results[name] = {"status": status.strip(), "detail": msg}
        if not ok:
            failures += 1
    if json_out:
        counts = {"OK": 0, "FAIL": 0, "rows-only": 0}
        for r in results.values():
            counts[r["status"]] += 1
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "total": len(results),
                       "ok": counts["OK"], "fail": counts["FAIL"],
                       "rows_only": counts["rows-only"],
                       "queries": results}, f, indent=1, sort_keys=True)
        print(f"[summary] {counts['OK']} OK / {counts['FAIL']} FAIL / "
              f"{counts['rows-only']} rows-only -> {json_out}")
    return failures


def compare(got, want):
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        return False, f"schema mismatch: spark={gc} oracle={wc}"
    # dtype-kind check: int-vs-float divergence hashes differently at
    # the driver even when pandas `==` passes (5 vs 5.0). Width-only
    # differences (int32 vs int64) hash identically — allow those.
    for c in gc:
        gk, wk = got[c].dtype.kind, want[c].dtype.kind
        if gk != wk and not ({gk, wk} <= {"i", "u"}):
            return False, (f"col {c} dtype kind differs: "
                           f"spark={got[c].dtype} oracle={want[c].dtype} "
                           f"(driver hash would mismatch)")
    got = got[gc].sort_values(by=gc, ignore_index=True)
    want = want[wc].sort_values(by=wc, ignore_index=True)
    if len(got) != len(want):
        return False, f"row count: spark={len(got)} oracle={len(want)}"
    # exact, value-by-value (mirrors the driver's hash-match)
    for c in gc:
        a, b = got[c], want[c]
        neq = ~((a == b) | (a.isna() & b.isna()))
        # pandas `==` says -0.0 == 0.0, but the driver hashes the
        # rendered strings and "-0.0" != "0.0" — the exact class that
        # shipped r14's two driver-red queries past this local gate
        # (q_fact_corr_dist / q_fact_regr_dist: every bad cell was a
        # sign-of-zero mismatch). Compare zero signs explicitly.
        if a.dtype.kind == "f" and b.dtype.kind == "f":
            import numpy as np
            sign_a = np.signbit(a.to_numpy())
            sign_b = np.signbit(b.to_numpy())
            zero = (a == 0) & (b == 0)
            neq = neq | (zero & (sign_a != sign_b))
        if neq.any():
            i = int(neq.idxmax())
            return False, (f"col {c} differs at row {i}: "
                           f"spark={a[i]!r} oracle={b[i]!r} "
                           f"({int(neq.sum())} rows differ)")
    return True, f"{len(got)} rows, {len(gc)} cols match"


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else "",
                  sys.argv[4] if len(sys.argv) > 4 else ""))
