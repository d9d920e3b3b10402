"""Timezone-robustness sweep: every registry query's VALUES must be
identical under any ``spark.sql.session.timeZone``.

Round 6 proved that "works under session.py's conf" is not "works in the
driver's session" (the ANSI-on minwise crash). The session timezone is the
same class of trap: ``session.py`` pins UTC, but the driver — and any
application embedding this engine — supplies its own session whose tz
defaults to the JVM/host zone. Every timestamp-derived expression
(``hour(ts)``, ``CAST(ts AS DATE)``, ``date_format(ts, ...)``) silently
re-renders under the ambient zone, so a query that passes the DuckDB oracle
under UTC can return shifted values in an embedder's session with nobody
noticing. The engine contract: business-time semantics are defined in UTC
and implemented tz-independently (epoch arithmetic / DATE-typed columns),
so results do not depend on the ambient session zone.

This sweep executes the full registry once per zone and compares canonical
value hashes against the UTC run. Zones exercise whole-hour (-5), and
45-minute (+5:45) offsets — the latter catches alignment assumptions that
whole-hour zones mask.

Usage: python tools/tz_sweep.py [sf_dir] [query ...]
Exit code 1 if any query errors or hash-mismatches under a non-UTC zone.
"""

from __future__ import annotations

import hashlib
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ZONES = ["UTC", "America/New_York", "Asia/Kathmandu"]


def canon_hash(df, zone: str) -> tuple[int, str]:
    """Order-insensitive INSTANT-level value hash. collect() renders
    TIMESTAMP via datetime.fromtimestamp — the HOST zone, independent of
    the session zone this sweep varies — so naive datetimes are host-local
    wall time; .astimezone(utc) on a naive datetime interprets it as
    host-local, recovering the instant. DATE cells (and date-derived
    strings/ints) hash as-is — a ts→date or hour(ts) that shifts with the
    session zone is exactly the semantic drift this sweep exists to
    catch."""
    import datetime as dt

    del zone

    def cell(v):
        if isinstance(v, dt.datetime) and v.tzinfo is None:
            return v.astimezone(dt.timezone.utc).isoformat()
        return repr(v)

    cols = sorted(df.columns)
    rows = df.select(*cols).collect()
    lines = sorted("|".join(cell(r[c]) for c in cols) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(rows), h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from ssg_etl_spark.cache import release_tracked
    from ssg_etl_spark.plans.registry import load_all
    from ssg_etl_spark.session import get_spark
    from ssg_etl_spark.sources.tables import tz_pin_suppressed

    specs = load_all(include_extra=True)
    if only:
        specs = {k: v for k, v in specs.items() if k in only}

    spark = get_spark("tz_sweep", shuffle_partitions=8)
    base: dict[str, tuple[int, str]] = {}
    bad: list[str] = []
    # Suppress load_table's UTC session pin for the whole sweep: with the
    # pin active both "zones" execute under UTC and the comparison is
    # vacuous (r7 advisor finding) — the sweep verifies the utc_wall
    # discipline itself, not the pin.
    with tz_pin_suppressed():
        for zone in ZONES:
            spark.conf.set("spark.sql.session.timeZone", zone)
            for name in sorted(specs):
                try:
                    got = canon_hash(specs[name].builder(spark, sf_dir), zone)
                except Exception as exc:  # noqa: BLE001
                    got = (-1, f"ERROR {type(exc).__name__}: {exc}")
                finally:
                    release_tracked()
                if zone == "UTC":
                    base[name] = got
                    if got[0] < 0:
                        bad.append(f"{name}: errors even under UTC: {got[1]}")
                        print(f"FAIL {name} [{zone}]: {got[1]}", flush=True)
                elif got != base[name]:
                    bad.append(f"{name} [{zone}]: {base[name]} -> {got}")
                    print(f"FAIL {name} [{zone}]: UTC={base[name]} got={got}", flush=True)
            print(f"== zone {zone}: done ({len(bad)} failures so far)", flush=True)
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    print(f"\n{len(specs)} queries x {len(ZONES)} zones, {len(bad)} failures")
    for b in bad:
        print("  " + b)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
