#!/usr/bin/env python3
"""Scripted sf1 full-oracle sweep (r17 verdict #3 — the manual step,
committed): ONE command that (1) runs graft.Verify against the
GenScale-staged sf1 dir, (2) runs the selfcheck DuckDB oracle compare
over every gate in the two tiers the big-SF protocol uses (everything
with the fast render guard first, then the dedup pair family — its
inverted-index oracles are the slow DuckDB work and deserve their own
pass so a killed run still banks the cheap 220), and (3) writes
SF1_SWEEP_r{round}.json in the committed artifact shape, so sf1
correctness can no longer silently rot between hand-run sweeps.

usage: python3 tools/sf1_sweep.py <round> [sf1_dir] [out_dir] [--no-verify]

--no-verify reuses an existing Verify output dir (re-running only the
DuckDB side after an oracle-SQL-only change).
"""
import json
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
LINE = re.compile(r"^(PASS|FAIL)\s+(\S+):\s+(.*)$")


def run_selfcheck(sf_dir, out_dir, env_extra):
    import os
    env = dict(os.environ)
    env.update(env_extra)
    p = subprocess.run(
        [sys.executable, str(REPO / "tools" / "selfcheck.py"), sf_dir, out_dir],
        cwd=str(REPO), env=env, capture_output=True, text=True)
    gates = {}
    for ln in p.stdout.splitlines():
        m = LINE.match(ln)
        if m:
            gates[m.group(2)] = (m.group(1), m.group(3))
    # CRASH vs CLEAN-WITH-FAILS (ADVICE r18 #2): selfcheck exits 1 on gate
    # FAILs too, so the return code alone can't gate — but a run that
    # completed always prints the "== N/N pass" summary. A missing summary
    # (DuckDB dying mid-tier, a traceback) must ABORT the sweep, or a
    # partial gate dict merges silently and the artifact reads green while
    # the tier it exists to protect never ran.
    completed = any(ln.startswith("== ") and ln.endswith(" pass")
                    for ln in p.stdout.splitlines())
    if not completed:
        sys.stderr.write(p.stdout[-2000:] + "\n" + p.stderr[-2000:] + "\n")
        sys.exit(f"selfcheck tier {env_extra} CRASHED (no summary line, "
                 f"rc={p.returncode}) — aborting, no artifact written")
    return gates


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    rnd = int(sys.argv[1])
    pos = [a for a in sys.argv[2:] if not a.startswith("--")]
    sf_dir = pos[0] if len(pos) > 0 else "/tmp/graft_sf1"
    out_dir = pos[1] if len(pos) > 1 else "/tmp/verify_sf1"
    # SELF-STAGING (r18 verdict #6): the GenScale corpora live in tmpfs —
    # one reboot from gone. A cold start re-stages instead of failing;
    # factor inferred from the dir name (graft_sfN = N*10 x sf0.1).
    if not Path(sf_dir, "documents.parquet").exists():
        m = re.search(r"graft_sf(\d+)$", sf_dir)
        if not m:
            sys.exit(f"{sf_dir} is missing and not a graft_sfN dir — "
                     "cannot infer the GenScale staging factor")
        factor = int(m.group(1)) * 10
        print(f"[sweep] {sf_dir} missing — staging via GenScale at "
              f"factor {factor}", flush=True)
        subprocess.run(
            ["sbt", "-batch",
             f"runMain graft.tools.GenScale /root/testdata/sf0.1 {sf_dir} {factor}"],
            cwd=str(REPO), check=True)
    if "--no-verify" not in sys.argv:
        subprocess.run(
            ["sbt", "-batch", f"runMain graft.Verify {sf_dir} {out_dir}"],
            cwd=str(REPO), check=True)

    # tier 1: everything but the dedup pair family, fast render guard
    # (the dtype-class guard is SF-independent and stays gated at sf0.01)
    gates = run_selfcheck(sf_dir, out_dir,
                          {"GRAFT_SELFCHECK_FAST": "1",
                           "GRAFT_SELFCHECK_SKIP": "dedup"})
    # tier 2: the dedup family on its own (slow DuckDB pair oracles)
    dedup_gates = run_selfcheck(sf_dir, out_dir,
                                {"GRAFT_SELFCHECK_FAST": "1",
                                 "GRAFT_SELFCHECK_ONLY": "dedup"})
    # the dedup tier is the sweep's raison d'etre — an empty tier-2 result
    # (filter typo, selfcheck env drift) must not merge into a green total
    if not dedup_gates:
        sys.exit("tier 2 returned ZERO dedup gates — aborting, no artifact")
    gates.update(dedup_gates)
    # guard against a silently-shrunken suite: r18's full suite was 241
    # gates; allow growth, flag a >10% shrink loudly
    if len(gates) < 220:
        sys.exit(f"suite shrank to {len(gates)} gates (expected >= 220) — "
                 "aborting, no artifact")

    n_pass = sum(1 for tag, _ in gates.values() if tag == "PASS")
    fails = sorted(n for n, (tag, _) in gates.items() if tag == "FAIL")
    rows = {}
    for name, (_, detail) in gates.items():
        m = re.search(r"rows=(\d+)", detail)
        if m:
            rows[name] = int(m.group(1))
    artifact = {
        "metric": "sf1_full_oracle_sweep",
        "round": rnd,
        "sf_dir": sf_dir,
        "result": f"{n_pass}/{len(gates)} pass",
        "n_gates": len(gates),
        "dedup_gates_green": sorted(
            n for n, (tag, _) in gates.items()
            if n.startswith("dedup") and tag == "PASS"),
        "failures": {n: gates[n][1][:200] for n in fails},
        "note": ("produced by tools/sf1_sweep.py (r17 verdict #3 — the "
                 "sweep is a committed script, not a manual recipe); "
                 "two-tier selfcheck with the fast render guard, dtype "
                 "guard stays gated at sf0.01"),
        "rows": dict(sorted(rows.items())),
    }
    out = REPO / f"SF1_SWEEP_r{rnd:02d}.json"
    out.write_text(json.dumps(artifact, indent=1))
    print(f"{artifact['result']} -> {out}")
    if fails:
        for n in fails:
            print(f"FAIL {n}: {gates[n][1][:200]}")
    return 0 if not fails else 1


if __name__ == "__main__":
    sys.exit(main())
