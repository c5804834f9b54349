#!/usr/bin/env python3
"""Isolation re-run helper for benchguard's 2-10x mover rule.

Usage:
    python3 tools/isolate.py out.json q185_unified_release [q20_... ...]

Runs `sbt "runMain graft.BenchSome <queries>"` (two passes, the BenchSome
contract), parses the pass-2 (steady) seconds per query, and writes them as
the {"<query>": seconds} JSON that `benchguard.py --isolated` consumes.
Pass-1 (cold) seconds are printed for the record but not written: the
bench artifacts under guard are steady-pass numbers.
"""
import json
import re
import subprocess
import sys


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    out_path, names = sys.argv[1], sys.argv[2:]
    cmd = ["sbt", "-batch", f"runMain graft.BenchSome {' '.join(names)}"]
    res = subprocess.run(cmd, capture_output=True, text=True)
    if res.returncode != 0:
        sys.stderr.write(res.stdout[-2000:] + res.stderr[-2000:])
        sys.exit(f"isolate: BenchSome failed rc={res.returncode}")
    iso = {}
    for line in res.stdout.splitlines():
        m = re.match(r"\[bench(\d)\] (\S+)\s+([0-9.]+) s", line.strip())
        if m:
            print(line.strip())
            if m.group(1) == "2":
                iso[m.group(2)] = float(m.group(3))
    missing = [n for n in names if n not in iso]
    if missing:
        sys.exit(f"isolate: no pass-2 reading for {', '.join(missing)}")
    with open(out_path, "w") as f:
        json.dump(iso, f, indent=1, sort_keys=True)
    print(f"isolate: wrote {out_path} ({len(iso)} queries)")


if __name__ == "__main__":
    main()
