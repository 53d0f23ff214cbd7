#!/usr/bin/env python3
"""Rows-only determinism rerun, as a round artifact (r16 verdict #4).

The ~22 declared queries without DuckDB oracles ("rows-only by design":
xxhash64 sketches, seeded sampling, LM scores) carry a bit-determinism
contract that judge hand-runs re-proved each round. This tool makes that
an artifact: Verify twice into two dirs, compare every no-oracle query's
output as sorted row multisets (check.py --rerun's logic), write a JSON
summary.

Usage:
  python3 tools/rerun.py <sfDir> <outJson> [--reuse <existingFullDump>]

With --reuse, an existing full Verify dump (e.g. the round's correctness
dump) serves as run 1 and only the no-oracle set is re-dumped for run 2 —
halving the wall. Without it, both runs are fresh full dumps.

Runs graft.Verify standalone (compiled classes + /opt/spark/jars), no sbt.
"""
import json, os, subprocess, sys, tempfile, time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ADDOPENS = []
for p in ["java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
          "java.net", "java.nio", "java.util", "java.util.concurrent",
          "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
          "sun.security.action", "sun.util.calendar"]:
    ADDOPENS += ["--add-opens", f"java.base/{p}=ALL-UNNAMED"]


def run_verify(sf_dir, out_dir, names=()):
    cmd = (["java"] + ADDOPENS +
           ["-Xmx8g", "-Dspark.ui.enabled=false",
            "-Dspark.sql.session.timeZone=UTC",
            "-cp", f"{REPO}/target/scala-2.13/classes:/opt/spark/jars/*",
            "graft.Verify", sf_dir, out_dir] + list(names))
    r = subprocess.run(cmd, cwd=REPO, stdout=subprocess.DEVNULL,
                       stderr=subprocess.DEVNULL)
    if r.returncode != 0:
        sys.exit(f"Verify rc={r.returncode} for {out_dir}")


def main():
    args = sys.argv[1:]
    reuse = None
    if "--reuse" in args:
        i = args.index("--reuse")
        reuse = args[i + 1]
        args = args[:i] + args[i + 2:]
    if len(args) != 2:
        sys.exit(__doc__)
    sf_dir, out_json = args
    t0 = time.time()

    if reuse:
        dump1 = reuse
        if not os.path.isfile(f"{dump1}/oracle_sql.json"):
            sys.exit(f"--reuse dir {dump1} has no oracle_sql.json")
    else:
        dump1 = tempfile.mkdtemp(prefix="graft_rerun1_")
        run_verify(sf_dir, dump1)
    oracle = json.load(open(f"{dump1}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(dump1)
                   if os.path.isdir(f"{dump1}/{d}") and d not in oracle)
    if not names:
        sys.exit(f"no rows-only queries found in {dump1}")

    dump2 = tempfile.mkdtemp(prefix="graft_rerun2_")
    run_verify(sf_dir, dump2, names)

    chk = subprocess.run(
        [sys.executable, f"{REPO}/tools/check.py", sf_dir, dump1,
         "--rerun", dump2] + names,
        capture_output=True, text=True)
    det, bad = [], []
    for line in chk.stdout.splitlines():
        if "[rows-only]" not in line:
            continue
        name = line.split()[1]
        (det if line.startswith("OK") else bad).append(name)
    unchecked = sorted(set(names) - set(det) - set(bad))
    result = {
        "sf": sf_dir,
        "wall_sec": round(time.time() - t0, 1),
        "reused_run1": bool(reuse),
        "n_rows_only": len(names),
        "deterministic": det,
        "mismatched": bad,
        "unchecked": unchecked,
        "all_deterministic": not bad and not unchecked and len(det) == len(names),
    }
    with open(out_json, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"{out_json}: {len(det)}/{len(names)} deterministic, "
          f"{len(bad)} mismatched, {len(unchecked)} unchecked")
    sys.exit(0 if result["all_deterministic"] else 1)


if __name__ == "__main__":
    main()
