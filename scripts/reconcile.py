#!/usr/bin/env python3
"""End-of-round reconcile gate (VERDICT r12 #6): parse the LATEST driver
artifacts (CORRECTNESS_r*.json, BENCH_r*.json) and fail unless every red
row is explicitly reconciled in COVERAGE.md.

A red CORRECTNESS row (err, or rows/schema/hash mismatch) or a BENCH
error must appear in COVERAGE.md on a line carrying one of the markers:

  ADJUDICATED: <query> — value-correct, harness-level cause, kept as-is
  FIXED: <query>       — repaired in-code this round, re-verified locally

so a round can never ship a claim ("oracle-checked", "exact by
construction") that contradicts the driver's record — the r12
q_host_rank case. `no_oracle` rows are the sketch-binary tier and pass
by design (their exactness is spec-checked in-JVM).

Exit 0 = reconciled; exit 1 lists the unreconciled rows.
"""
import glob
import json
import os
import re
import sys


def round_num(path):
    # basename only (a directory named *_r2 must not shadow the file's
    # round), and None for non-conforming names instead of a crash
    m = re.search(r"_r(\d+)\.json$", os.path.basename(path))
    return int(m.group(1)) if m else None


def latest(root, pat):
    fs = [f for f in glob.glob(os.path.join(root, pat))
          if round_num(f) is not None]
    if not fs:
        return None
    return max(fs, key=round_num)


def reconciled(cov, q):
    # \b on BOTH sides of the marker: "UNFIXED: q_x" must not satisfy
    # the gate via the FIXED suffix
    pat = rf"\b(ADJUDICATED|FIXED)\b[^\n]*\b{re.escape(q)}\b"
    rev = rf"\b{re.escape(q)}\b[^\n]*\b(ADJUDICATED|FIXED)\b"
    return re.search(pat, cov) or re.search(rev, cov)


def main(root):
    cov_path = os.path.join(root, "COVERAGE.md")
    cov = open(cov_path).read() if os.path.exists(cov_path) else ""
    bad = []

    cf = latest(root, "CORRECTNESS_r*.json")
    if cf:
        rows = json.load(open(cf))
        for q, v in sorted(rows.items()):
            if not isinstance(v, dict):
                continue
            err = v.get("err")
            if err == "no_oracle":
                continue
            red = bool(err) or any(
                v.get(k) is False
                for k in ("rows_match", "schema_match", "hash_match"))
            if red and not reconciled(cov, q):
                bad.append(f"{os.path.basename(cf)}: {q} is red "
                           f"({ {k: v.get(k) for k in ('rows_match', 'schema_match', 'hash_match', 'err')} }) "
                           f"and COVERAGE.md carries no ADJUDICATED:/FIXED: line for it")

    bf = latest(root, "BENCH_r*.json")
    if bf:
        bench = json.load(open(bf))
        for q in bench.get("errors") or []:
            name = q if isinstance(q, str) else str(q)
            if not reconciled(cov, name):
                bad.append(f"{os.path.basename(bf)}: bench error on {name} "
                           f"with no ADJUDICATED:/FIXED: line in COVERAGE.md")

    if bad:
        print("\n".join(bad))
        print(f"\n{len(bad)} unreconciled driver-artifact rows")
        return 1
    print(f"reconciled: {os.path.basename(cf) if cf else '-'} / "
          f"{os.path.basename(bf) if bf else '-'} vs COVERAGE.md")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1
                  else os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
