"""Local mirror of the driver's correctness gate.

Runs every registered query through Spark AND its DuckDB oracle at the given
scale factor, then compares row count, sorted column names, and an
order-insensitive value hash. Use while iterating:

    python tools/check_correctness.py [--ansi=on|off] [sf_dir] [query ...]

Session-robustness contract (VERDICT r6): the driver — and any embedding
application — supplies its OWN SparkSession, which under PySpark 4.x
defaults ``spark.sql.ansi.enabled=true``, while the engine session pins it
false. Every query must be correct under BOTH, so this gate runs ANSI **on**
by default (driver parity; the strict mode that surfaces wrapping-arithmetic
and silent-cast bugs); ``--ansi=off`` re-checks the engine-default session.
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def canon(value: object) -> str:
    """Canonical string for one cell, tolerant of engine type differences."""
    import datetime
    from decimal import Decimal

    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return str(int(value))
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        # Absolute 9-decimal tolerance; +0.0 forces -0.0 → 0.0 (Spark's
        # round normalizes the sign of zero, DuckDB's preserves it).
        return repr(round(value, 9) + 0.0)
    if isinstance(value, Decimal):
        # Deliberately NOT collapsed into the float form: the driver's hash is
        # type-strict, so a DuckDB DECIMAL/HUGEINT (e.g. untyped SUM(CASE…))
        # vs a Spark BIGINT/DOUBLE must FAIL here too, not be masked.
        return "dec:" + repr(round(float(value), 9) + 0.0)
    if isinstance(value, datetime.datetime):
        return value.isoformat(sep=" ")
    if isinstance(value, datetime.date):
        return value.isoformat()
    if isinstance(value, (list, tuple)):
        return "[" + ",".join(canon(v) for v in value) + "]"
    return str(value)


def _bucket(type_name: str) -> str:
    """Coarse type bucket for strict-ish cross-engine type comparison.

    The driver's hash is computed over pandas-converted values, so a DuckDB
    HUGEINT/DECIMAL column (from an untyped ``SUM(CASE…)``) hashes differently
    from a Spark BIGINT even when every value is equal. fetchall() converts
    HUGEINT to plain ``int`` and hides that, so we compare declared types too:
    DuckDB via the arrow schema, Spark via ``df.schema``.
    """
    t = type_name.lower()
    if "decimal" in t or "hugeint" in t:
        return "decimal"
    # Integer/float widths are deliberately collapsed per KIND: r1 driver
    # evidence shows int32-vs-BIGINT hashing equal (window_rownum_global
    # passed with Spark IntegerType vs DuckDB row_number BIGINT) — the
    # driver is kind-strict (int vs float vs Decimal/object), not
    # width-strict. Width-strict buckets here would fail queries the driver
    # passes.
    if t.startswith(("int", "uint", "tinyint", "smallint", "bigint", "long", "short", "byte")):
        return "int"
    if t.startswith(("float", "double", "halffloat")):
        return "float"
    if t.startswith("bool"):
        return "bool"
    if "timestamp" in t:
        return "timestamp"
    if t.startswith("date"):
        return "date"
    if "string" in t or "varchar" in t or "utf8" in t:
        return "string"
    return t


def table_digest(rows: list[tuple], columns: list[str]) -> str:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted("|".join(canon(row[i]) for i in order) for row in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    argv = list(sys.argv[1:])
    ansi = "on"
    for flag in [a for a in argv if a.startswith("--ansi")]:
        argv.remove(flag)
        ansi = flag.split("=", 1)[1] if "=" in flag else "on"
    if ansi not in ("on", "off"):
        print("ERROR: --ansi takes on|off")
        return 2
    sf_dir = argv[0] if argv else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    only = set(argv[1:])

    import duckdb

    from ssg_etl_spark.plans.registry import load_all
    from ssg_etl_spark.session import get_spark

    specs = load_all(include_extra=True)
    if only:
        unknown = only - set(specs)
        if unknown:
            print(f"ERROR: unknown query name(s): {sorted(unknown)}")
            return 2
        specs = {k: v for k, v in specs.items() if k in only}
    if not specs:
        print("ERROR: no queries selected")
        return 2

    spark = get_spark("check_correctness", master="local[8]", shuffle_partitions=8)
    # ANSI is a runtime SQL conf: toggling it on the built session exactly
    # reproduces a driver-default (ANSI-on) session for every query plan.
    spark.conf.set("spark.sql.ansi.enabled", "true" if ansi == "on" else "false")
    print(f"session: spark.sql.ansi.enabled={ansi}")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_fail = n_rowsonly = 0
    for name, spec in sorted(specs.items()):
        t0 = time.time()
        try:
            sdf = spec.builder(spark, sf_dir)
            scols = list(sdf.columns)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        finally:
            # Deterministic cache lifecycle across the 79-query sweep.
            from ssg_etl_spark.cache import release_tracked

            release_tracked()
        if spec.oracle is None:
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            res = con.execute(spec.oracle)
            ocols = [d[0] for d in res.description]
            otable = res.arrow()
            orows = [tuple(r.values()) for r in otable.to_pylist()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            n_fail += 1
            continue

        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema: spark={sorted(scols)} oracle={sorted(ocols)}")
        else:
            stypes = {f.name: _bucket(f.dataType.simpleString()) for f in sdf.schema.fields}
            otypes = {
                fld.name: _bucket(str(otable.schema.field(fld.name).type))
                for fld in otable.schema
            }
            drift = {
                c: (stypes[c], otypes[c]) for c in stypes if stypes[c] != otypes.get(c)
            }
            if drift:
                problems.append(f"type drift (spark vs oracle): {drift}")
        if len(srows) != len(orows):
            problems.append(f"rowcount: spark={len(srows)} oracle={len(orows)}")
        if not problems:
            sh = table_digest(srows, scols)
            oh = table_digest(orows, ocols)
            if sh != oh:
                problems.append("value-hash mismatch")
                # print a few differing lines to debug
                so = sorted(range(len(scols)), key=lambda i: scols[i])
                oo = sorted(range(len(ocols)), key=lambda i: ocols[i])
                sset = sorted("|".join(canon(r[i]) for i in so) for r in srows)
                oset = sorted("|".join(canon(r[i]) for i in oo) for r in orows)
                diff_s = [x for x in sset if x not in set(oset)][:3]
                diff_o = [x for x in oset if x not in set(sset)][:3]
                for d in diff_s:
                    problems.append(f"  spark-only: {d[:200]}")
                for d in diff_o:
                    problems.append(f"  oracle-only: {d[:200]}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(f"      {p}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
