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

    # Manifest freshness gate (VERDICT r18 #2): the committed
    # COVERAGE_OPERATORS.md names the artifact it was generated against
    # in its table header; it shipped one round stale at r14 and two
    # artifacts stale at r18, so staleness is now a FAILURE, not a
    # protocol memory. Regenerate with `scripts/reconcile.py --coverage`
    # and re-commit whenever a newer CORRECTNESS_r*.json lands.
    man_path = os.path.join(root, "COVERAGE_OPERATORS.md")
    if cf and os.path.exists(man_path):
        man = open(man_path).read()
        m = re.search(r"CORRECTNESS_r(\d+)", man)
        if not m:
            bad.append("COVERAGE_OPERATORS.md: no CORRECTNESS_r<N> table "
                       "header found — regenerate with scripts/reconcile.py "
                       "--coverage")
        elif int(m.group(1)) != round_num(cf):
            bad.append(
                f"COVERAGE_OPERATORS.md is stale: headed "
                f"CORRECTNESS_r{m.group(1)} but the newest artifact is "
                f"{os.path.basename(cf)}; regenerate with "
                f"scripts/reconcile.py --coverage and re-commit")

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


def coverage(root):
    """Emit the operator -> designated query -> latest-CORRECTNESS-row
    manifest as machine output (VERDICT r13 #7): the judge's operator
    table is GENERATED from COVERAGE.md's ID column plus the driver
    artifact, not hand-kept. A row is `green` only if the artifact says
    rows+schema+hash all matched; `spec` marks operators whose
    verification is ScalaTest-only (streaming/Kafka boundary). Exits 1
    if any designated query is red or missing from the artifact."""
    cov_path = os.path.join(root, "COVERAGE.md")
    cf = latest(root, "CORRECTNESS_r*.json")
    rows = json.load(open(cf)) if cf else {}
    rnd = round_num(cf) if cf else "-"

    def status(q):
        v = rows.get(q)
        if v is None:
            return "MISSING"
        if not isinstance(v, dict):
            return str(v)
        if v.get("err") == "no_oracle":
            return "no_oracle"
        if v.get("err"):
            return f"ERR:{v['err']}"
        if all(v.get(k) for k in ("rows_match", "schema_match", "hash_match")):
            return "green"
        return "RED:" + ",".join(
            k for k in ("rows_match", "schema_match", "hash_match")
            if not v.get(k))

    bad = 0
    print(f"| ID | designated queries | CORRECTNESS_r{rnd} |")
    print("|---|---|---|")
    section_ok = False
    for line in open(cov_path):
        if line.startswith("## "):
            # only the SURVEY §2 operator tables; later sections (LLM
            # tier, negative results, ledgers) have their own formats
            section_ok = line.startswith("## §2")
            continue
        if not (section_ok and line.startswith("| ") and
                not line.startswith("| ID") and not line.startswith("|--")):
            continue
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        if len(cells) < 2:
            continue
        op = cells[0]
        # queries can sit in the "Verified by" cell (3-col tables) or
        # the "Query" cell (§2.9's 2-col table) — scan every non-ID cell
        qs = sorted(set(re.findall(r"\bq_[a-z0-9_]+\b",
                                   " ".join(cells[1:]))))
        if not qs:
            print(f"| {op} | — | spec |")
            continue
        sts = {q: status(q) for q in qs}
        bad += sum(1 for s in sts.values() if s.startswith(("RED", "ERR", "MISSING")))
        print(f"| {op} | {', '.join(qs)} | "
              f"{'; '.join(f'{q}={s}' for q, s in sts.items())} |")
    print(f"\n{'FAIL: ' + str(bad) + ' red/missing designated rows' if bad else 'all designated queries green or no_oracle'}")
    return 1 if bad else 0


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--coverage"]
    root = args[0] if args else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))
    if "--coverage" in sys.argv[1:]:
        sys.exit(coverage(root))
    sys.exit(main(root))
