#!/usr/bin/env python3
"""Rounded-readout audit (r5 judge directive #7): close the two latent
cross-engine rounding classes over EVERY gated query, not just the ones
that have already misfired.

Class 1 — IEEE negative zero (the q162 r5 red row): DuckDB's round()
keeps the sign bit of a tiny negative, Spark's BigDecimal round emits
+0.0. Closed by the Readout.rdz sweep (round + 0.0 on both sides). This
audit PROVES closure: every double output column that shows any negative
value (so a tiny-negative could round to zero) must be '+ 0.0'-normalized
in its oracle SQL, and the engine parquet must contain no -0.0 bits in
any column.

Class 2 — rounding-semantics splits: Spark's native round() feeds
BigDecimal.valueOf(double) — it rounds the SHORTEST decimal repr
(Double.toString) HALF_UP — while DuckDB scales by 10^k in IEEE
arithmetic and rounds the scaled double half-away by its exact
fraction. Measured divergence (this script's probe): ~0.1-3% of random
doubles at k=9/12, a positive-measure hash-gate risk. Closed in round 6
by graft.Readout.rd, which replicates DuckDB's algorithm exactly and
shadows every engine round() call site via `import graft.Readout.round`.
This audit re-fits the rd model against DuckDB on every run (a DuckDB
upgrade that changes rounding must fail here, not in the gate) and
reports how big the class the shadow closes remains for native Spark.

Usage: python3 tools/audit_rounding.py <sf_dir> <verify_out_dir>
Exit 1 on any finding. Results recorded in ARCHITECTURE.md (round-6).
"""
import glob
import json
import math
import os
import random
import struct
import sys
from decimal import Decimal, ROUND_HALF_UP

import duckdb
import numpy as np
import pandas as pd

NEG_ZERO = struct.pack("<d", -0.0)


def engine_round(x: float, k: int) -> float:
    """The ENGINE's rounding since round 6: graft.Readout.rd — DuckDB's
    own algorithm (scale-multiply, half-away by exact fraction, divide
    back, sign carried through ±0). Fit to 0/360,000 probe mismatches
    against DuckDB; RoundReadoutSpec pins the Scala twin."""
    if math.isnan(x) or math.isinf(x):
        return x
    p = float(10.0 ** k)
    t = abs(x) * p
    f = math.floor(t)
    frac = t - f
    r = f + (1.0 if frac >= 0.5 else 0.0)
    return math.copysign(r / p, x)


def spark_native_round(x: float, k: int) -> float:
    """Spark's functions.round: BigDecimal.valueOf(double) rounds the
    SHORTEST decimal representation (Double.toString), HALF_UP — kept
    here only to MEASURE how far the native semantics sit from DuckDB's
    (the reason the engine shadows round with Readout.rd)."""
    if math.isnan(x) or math.isinf(x):
        return x
    q = Decimal(repr(x)).quantize(Decimal(1).scaleb(-k),
                                  rounding=ROUND_HALF_UP)
    return float(q)


def audit_half_ties(con):
    """Returns (engine_findings, native_stats). engine_findings: values
    where graft.Readout.rd (the engine's round since round 6) disagrees
    with DuckDB — MUST be empty; a non-empty result means a DuckDB
    upgrade changed its rounding and the rd expression must be re-fit.
    native_stats: how often Spark's native functions.round would have
    diverged at each scale — the measured size of the class rd closes,
    reported for the record."""
    rng = random.Random(20260814)
    values = [rng.uniform(-1, 1) * 10 ** rng.randint(-9, 7)
              for _ in range(200_000)]
    # exact representable ties n / 2^m plus decimal-half inputs and their
    # neighboring doubles — the adversarial families where rounding paths
    # genuinely split
    for m in range(1, 20):
        for n in range(-40, 41):
            values.append(n / (1 << m))
    for k in (0, 1, 2, 4, 6, 9, 12):
        step = 10.0 ** (-k)
        for i in range(1, 400):
            h = (i + 0.5) * step
            values += [math.nextafter(h, 0.0), h, math.nextafter(h, math.inf),
                       -h, math.nextafter(-h, 0.0)]
    engine_findings, native_stats = [], {}
    for k in (0, 1, 2, 4, 6, 9, 12):
        df = pd.DataFrame({"v": values})
        con.register("probe", df)
        duck = con.execute(f"SELECT round(v, {k}) FROM probe").fetchnumpy()
        con.unregister("probe")
        native = 0
        for v, d in zip(values, list(duck[list(duck.keys())[0]])):
            e = engine_round(v, k)
            if struct.pack("<d", e) != struct.pack("<d", float(d)):
                engine_findings.append((k, v, float(d), e))
            s = spark_native_round(v, k)
            if struct.pack("<d", s) != struct.pack("<d", float(d)):
                native += 1
        native_stats[k] = native
    return engine_findings, native_stats


def audit_neg_zero(sf_dir: str, out_dir: str) -> list:
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    findings = []
    for name, sql in sorted(oracles.items()):
        try:
            duck = con.execute(sql).fetchdf()
        except Exception:
            continue  # file-landing oracles (q94) need the engine run first
        for c in duck.columns:
            if duck[c].dtype != np.float64:
                continue
            s = duck[c].dropna()
            if not len(s):
                continue
            if any(struct.pack("<d", float(v)) == NEG_ZERO for v in s):
                findings.append((name, c, "oracle emits -0.0"))
            # only ROUNDED readouts can split on -0.0: an unrounded column
            # is the identical IEEE tree on both engines (bit-equal even at
            # -0.0); a BigDecimal-rounded one drops the sign Spark-side
            if s.min() < 0 and _rounded(sql, c) and not _normalized(sql, c):
                findings.append(
                    (name, c, f"negative-capable (min {s.min():.3g}), "
                     "rounded, but oracle not '+ 0.0'-normalized"))
        # engine side: no -0.0 may survive in the landed parquet
        qdir = os.path.join(out_dir, name)
        for p in sorted(glob.glob(os.path.join(qdir, "*.parquet"))):
            eng = pd.read_parquet(p)
            for c in eng.columns:
                if eng[c].dtype != np.float64:
                    continue
                vals = eng[c].dropna()
                if any(struct.pack("<d", float(v)) == NEG_ZERO for v in vals):
                    findings.append((name, c, "engine emits -0.0"))
    return findings


def _defn(sql: str, col: str) -> str:
    """The ~200 chars preceding the LAST `AS col` — the column's defining
    expression tail (heuristic, good enough for an audit grep)."""
    flat = " ".join(sql.split())
    idx = flat.rfind(f" AS {col}")
    return flat[max(0, idx - 200):idx] if idx >= 0 else ""


def _rounded(sql: str, col: str) -> bool:
    return "round(" in _defn(sql, col)


def _normalized(sql: str, col: str) -> bool:
    d = _defn(sql, col)
    return d.endswith("+ 0.0") or d.endswith("+ 0.0 END")


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    bad = 0
    print("== Class 2: rounding-semantics probe ==")
    engine_ties, native = audit_half_ties(duckdb.connect())
    print("  Spark-NATIVE functions.round would diverge from DuckDB at "
          f"(by scale): {native} — the class Readout.rd closes")
    if engine_ties:
        bad += len(engine_ties)
        for k, v, d, e in engine_ties[:20]:
            print(f"  RD-SPLIT k={k} x={v!r}: duck={d!r} rd={e!r}")
        print(f"  {len(engine_ties)} Readout.rd-vs-DuckDB divergences — "
              "DuckDB changed its rounding; re-fit Readout.rd")
    else:
        print("  clean: Readout.rd == DuckDB round bit-for-bit on "
              "~215k probe values x 7 scales")
    print("== Class 1: negative-zero closure over the gated suite ==")
    negs = audit_neg_zero(sf_dir, out_dir)
    if negs:
        bad += len(negs)
        for n in negs:
            print(f"  FINDING {n[0]}.{n[1]}: {n[2]}")
    else:
        print("  clean: every negative-capable rounded readout is "
              "normalized; no -0.0 bits on either side")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
