"""Local mirror of the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB
over the same parquet dir, then compares: row count, column names,
and order-insensitive values (sorted rows, tolerant float compare to
surface near-misses before they become hash mismatches).

Driver-faithful dtype audit (added r05, after the r04 gate caught 4
queries this mirror had passed): the driver canonicalizes BOTH sides
through pandas and hashes the frame, so a DuckDB HUGEINT/DECIMAL
aggregate that `.df()` converts to float64 hashes as `123.0` against
Spark's `123` even though Python-level values compare equal, and any
array/map/struct output column makes pandas `sort_values` throw.
For every oracle-paired query we therefore also:
  * fetch the DuckDB result AS A PANDAS FRAME (`.df()`) and compare
    its dtypes against the Spark schema — duck float dtype vs Spark
    integral type, duck object dtype holding non-string payloads
    (Decimal, list, ndarray) vs Spark scalar type, and any nested
    Spark output type are all hard FAILs;
  * replay the driver's canonicalization (sort_values over all
    columns) on the duck frame so unhashable cells fail HERE first.

Usage:
    python tools/check_oracle.py [--sf-dir /root/testdata/sf0.01] [query ...]
"""

from __future__ import annotations

import argparse
import math
import sys
import time

sys.path.insert(0, "/root/repo")


def normalize_cell(v):
    import datetime

    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def sortable(row):
    return tuple((x is None, str(x)) for x in row)


def compare(name, spark_rows, spark_cols, duck_rows, duck_cols):
    problems = []
    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems
    order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    dorder = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    s = sorted((tuple(normalize_cell(r[i]) for i in order) for r in spark_rows), key=sortable)
    d = sorted((tuple(normalize_cell(r[i]) for i in dorder) for r in duck_rows), key=sortable)
    if len(s) != len(d):
        problems.append(f"row count: spark={len(s)} duck={len(d)}")
        return problems
    # informational: python-type mismatches per column (a strict
    # schema comparison in the driver could flag these)
    if s and d:
        for ci in range(len(s[0])):
            sv = next((row[ci] for row in s if row[ci] is not None), None)
            dv = next((row[ci] for row in d if row[ci] is not None), None)
            if sv is not None and dv is not None and type(sv) is not type(dv):
                problems.append(
                    f"type note col {sorted(spark_cols)[ci]}: spark {type(sv).__name__} vs duck {type(dv).__name__} (near-miss)"
                )
    n_bad = 0
    for i, (sr, dr) in enumerate(zip(s, d)):
        for a, b in zip(sr, dr):
            ok = a == b
            if not ok and isinstance(a, float) and isinstance(b, float):
                ok = abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
                if ok:
                    problems.append(f"row {i}: float near-miss {a!r} vs {b!r} (would hash-mismatch!)")
            if not ok:
                n_bad += 1
                if n_bad <= 3:
                    problems.append(f"row {i}: {sr} != {dr}")
                break
    if n_bad > 3:
        problems.append(f"... {n_bad} mismatched rows total")
    return problems


_SPARK_INTEGRAL = {"tinyint", "smallint", "int", "bigint"}
_SPARK_STRINGY = {"string", "binary"}


def dtype_audit(spark_schema, duck_pdf):
    """Flag cross-engine dtype divergences the driver's pandas
    canonicalization would hash differently (or crash on) even when
    Python-level values compare equal. `spark_schema` is the Spark
    DataFrame schema; `duck_pdf` is the DuckDB result via `.df()`.
    Returns a list of hard problems (no 'near-miss' softener — these
    ARE driver failures)."""
    problems = []
    duck_dtypes = {c: duck_pdf[c].dtype for c in duck_pdf.columns}
    for field in spark_schema.fields:
        st = field.dataType.simpleString()
        if st.startswith(("array<", "map<", "struct<")):
            problems.append(
                f"dtype col {field.name}: Spark output type {st} is nested "
                "(catalog rule: registered outputs must be scalar — the "
                "driver's pandas sort_values throws on list cells)"
            )
            continue
        if field.name not in duck_dtypes:
            continue  # column-name divergence is reported elsewhere
        dk = duck_dtypes[field.name].kind
        base = st.split("(")[0]
        if base in _SPARK_INTEGRAL and dk == "f":
            # A float dtype for a Spark-integral column is only a
            # divergence when the column is NULL-free: pandas converts
            # ANY nullable int with actual NULLs to float64 on BOTH
            # engines (Spark's side too), so those hash identically in
            # the driver. No NaNs → the float dtype can only be a
            # DuckDB HUGEINT/DECIMAL leak → genuine hash mismatch.
            if not duck_pdf[field.name].isna().any():
                problems.append(
                    f"dtype col {field.name}: duck pandas dtype "
                    f"{duck_dtypes[field.name]} (no NULLs) vs Spark {st} "
                    "— the driver hashes 123.0 vs 123 (HUGEINT/DECIMAL "
                    "leak: CAST the oracle expression AS BIGINT)"
                )
        elif dk == "O" and base not in _SPARK_STRINGY and base != "date":
            col = duck_pdf[field.name]
            sample = next((v for v in col if v is not None), None)
            if sample is not None and not isinstance(sample, str):
                problems.append(
                    f"dtype col {field.name}: duck object dtype holding "
                    f"{type(sample).__name__} vs Spark {st} — hashes "
                    "differently through pandas (CAST the oracle side)"
                )
    # Replay the driver's canonicalization on the duck frame: an
    # unhashable cell (list/ndarray) dies here exactly as in-gate.
    try:
        if len(duck_pdf):
            duck_pdf.sort_values(by=list(duck_pdf.columns))
    except Exception as e:
        problems.append(f"driver canonicalization would hard-error: {e!r}")
    return problems


def check_tolerance(name, spark_rows, spark_cols, con, spec):
    """Bounded-error comparison for sketch queries: join on key
    columns, then assert each approximate value is within the spec's
    tolerance of the exact answer ('rel') or between the exact
    <col>_lo / <col>_hi bounds ('bounds'); for approximate top-k
    ('recall'), assert |approx ids ∩ exact ids| / k >= the measured
    floor. Returns a problem list."""
    if spec["kind"] == "recall":
        exact_ids = {
            normalize_cell(r[0]) for r in con.execute(spec["sql"]).fetchall()
        }
        idx = spark_cols.index(spec["id_col"])
        got_ids = {normalize_cell(r[idx]) for r in spark_rows}
        problems = []
        if len(spark_rows) != spec["k"]:
            problems.append(
                f"row count: spark={len(spark_rows)} expected k={spec['k']}"
            )
        recall = len(got_ids & exact_ids) / spec["k"]
        if recall < spec["floor"]:
            problems.append(
                f"recall@{spec['k']} = {recall:.2f} < floor {spec['floor']} "
                f"(approx ids {sorted(got_ids)} vs exact {sorted(exact_ids)})"
            )
        return problems
    res = con.execute(spec["sql"])
    duck_cols = [d[0] for d in res.description]
    duck = {}
    for row in res.fetchall():
        d = dict(zip(duck_cols, row))
        duck[tuple(normalize_cell(d[k]) for k in spec["keys"])] = d
    problems = []
    if len(spark_rows) != len(duck):
        problems.append(f"row count: spark={len(spark_rows)} duck={len(duck)}")
        return problems
    val_cols = [c for c in spark_cols if c not in spec["keys"]]
    for r in spark_rows:
        s = dict(zip(spark_cols, r))
        key = tuple(normalize_cell(s[k]) for k in spec["keys"])
        if key not in duck:
            problems.append(f"key {key} missing from oracle")
            continue
        d = duck[key]
        for c in val_cols:
            v = s[c]
            if spec["kind"] == "rel":
                exact = d[c]
                if abs(v - exact) > spec["tol"] * max(1.0, abs(exact)):
                    problems.append(
                        f"key {key} col {c}: {v} vs exact {exact} "
                        f"(rel err {abs(v - exact) / max(1.0, abs(exact)):.4f} "
                        f"> {spec['tol']})"
                    )
            else:
                lo, hi = d[f"{c}_lo"], d[f"{c}_hi"]
                if not (lo - 1e-9 <= v <= hi + 1e-9):
                    problems.append(
                        f"key {key} col {c}: {v} outside exact bounds "
                        f"[{lo}, {hi}]"
                    )
    return problems


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--window",
        action="store_true",
        help="check exactly the driver's 50-slot correctness window "
        "(the first 50 registry entries) instead of the full catalog",
    )
    ap.add_argument(
        "--scaled",
        action="store_true",
        help="use the O(n log n) scaled-oracle forms (SCALED_ORACLES) "
        "for queries whose default witness is deliberately brute "
        "force; auto-enabled only for the known large-sf basenames "
        "sf0.1/sf1/sf10",
    )
    args = ap.parse_args()

    import duckdb

    from __spark_entry__ import oracle_sql, queries
    from ngafid_cpat_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    # cap DuckDB below the box's RAM so a runaway (quadratic) oracle
    # raises OutOfMemoryException for ITS query instead of the OS
    # OOM-killing the whole sweep (the r14 sf1 nn_join lesson; Spark
    # holds a large heap in the same process tree)
    con.execute("SET memory_limit = '48GB'")
    from ngafid_cpat_spark.sources import TABLES

    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    qs = queries()
    oracles = oracle_sql()
    # sf > 0.01: swap in the identical-result O(n log n) oracle forms
    # for queries whose driver-facing witness is deliberately brute
    # force (skyline's quadratic NOT-EXISTS cost 510 s of the sf0.1
    # sweep alone). pytest pins each pair equal at sf0.001.
    import os as _os

    # Explicit opt-in (--scaled) or a known large-sf basename
    # ALLOWLIST — never inferred from "not small" (r13 ADVICE: a
    # renamed small-sf directory must not silently lose the
    # brute-force witness the strictness argument relies on).
    if args.scaled or _os.path.basename(args.sf_dir.rstrip("/")) in (
        "sf0.1",
        "sf1",
        "sf10",
        "testdata_sf1",
    ):
        from ngafid_cpat_spark.plans.queries import SCALED_ORACLES

        swapped = {k: v for k, v in SCALED_ORACLES.items() if k in oracles}
        if swapped:
            print(f"using scaled oracle forms for: {sorted(swapped)}")
            oracles = {**oracles, **swapped}
    names = args.names or (list(qs)[:50] if args.window else list(qs))
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf_dir)
            spark_cols = sdf.columns
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            from ngafid_cpat_spark.plans.queries import TOLERANCE_ORACLES

            if name in TOLERANCE_ORACLES:
                try:
                    problems = check_tolerance(
                        name, spark_rows, spark_cols, con,
                        TOLERANCE_ORACLES[name],
                    )
                except Exception as e:
                    problems = [f"tolerance oracle error: {e}"]
                if problems:
                    print(f"FAIL  {name}: (bounded-error) [{time.time()-t0:.1f}s]")
                    for p in problems[:8]:
                        print(f"      {p}")
                    n_fail += 1
                else:
                    print(
                        f"ok~   {name}: {len(spark_rows)} rows within "
                        f"documented error bound [{time.time()-t0:.1f}s]"
                    )
                    n_pass += 1
                continue
            print(f"rows  {name}: {len(spark_rows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            # run the (possibly expensive) oracle ONCE into a temp
            # table; both the value fetch and the dtype-audit frame
            # then read the materialized result (types preserved) —
            # re-executing the SQL for .df() doubled oracle runtime
            # across the catalog sweep
            osql = oracles[name]
            # staged oracles (the r14 trained-quantizer scaled forms)
            # are multi-statement scripts "CREATE ...; ...; SELECT":
            # run the stage statements first, materialize the final
            # SELECT like any other oracle
            if "CREATE OR REPLACE TEMP TABLE" in osql and ";" in osql:
                prelude, final_sel = osql.rsplit(";", 1)
                con.execute(prelude)
                osql = final_sel
            con.execute(
                "CREATE OR REPLACE TEMP TABLE __oracle_result AS "
                + osql
            )
            res = con.execute("SELECT * FROM __oracle_result")
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
            duck_pdf = con.execute("SELECT * FROM __oracle_result").df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = compare(name, spark_rows, spark_cols, duck_rows, duck_cols)
        problems += dtype_audit(sdf.schema, duck_pdf)
        real = [p for p in problems if "near-miss" not in p]
        if real:
            print(f"FAIL  {name}: [{time.time()-t0:.1f}s]")
            for p in problems[:8]:
                print(f"      {p}")
            n_fail += 1
        else:
            note = f" ({len(problems)} float near-misses)" if problems else ""
            print(f"ok    {name}: {len(spark_rows)} rows{note} [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
