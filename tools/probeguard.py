#!/usr/bin/env python3
"""Noise guard for the SCALE_PROBE / SCALE_PROBE_64X artifacts — the probe
sibling of benchguard.py.

The whole-VM drift episodes that contaminate bench runs hit probe refreshes
too: round 13's text_repair 64x point needed a manual four-repeat
adjudication before it could be trusted. This tool mechanizes that
adjudication: a candidate probe row that swings >MAX_RATIO in either
direction against the committed artifact is accepted ONLY when a second,
independent run agrees with the candidate (two runs landing together is a
real change; a lone outlier is the drift signature — rerun, don't commit).

Usage:
    python3 tools/probeguard.py <candidate.json> [--repeat <second.json>] [reference.json]

The reference defaults to the committed artifact at the candidate's own
repo-relative path (`git show HEAD:<relpath>`). Exit 0 = clean; exit 1 = at
least one >MAX_RATIO swing with no agreeing repeat.

A swing is EXCUSED when the op's output count moved by >OUT_RATIO on the
same side — the workload itself changed (a fixture or operator change), so
the time was expected to move. Ops present on only one side are reported
informationally. Sub-MIN_SEC rows are never judged (noise floor).
"""
import json
import sys

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.abspath(__file__)))
from benchguard import git_relpath, load  # noqa: E402  (shared helpers)
import subprocess  # noqa: E402

MAX_RATIO = 3.0    # probe rows move more than bench queries; 3x is a swing
AGREE_RATIO = 1.5  # two runs within 1.5x of each other = agreement
OUT_RATIO = 1.5    # output-count move that excuses a time move
MIN_SEC = 0.5


def load_ref(candidate_path, ref_arg):
    if ref_arg is not None:
        return load(ref_arg), ref_arg
    spec = f"HEAD:{git_relpath(candidate_path)}"
    out = subprocess.run(["git", "show", spec],
                         capture_output=True, text=True)
    if out.returncode != 0:
        sys.exit(f"probeguard: no committed {spec} to compare against "
                 f"(pass a reference explicitly): {out.stderr.strip()}")
    return json.loads(out.stdout), spec


def time_fields(ops):
    # t1 always; the scaled field is t8 or t64 depending on the artifact
    fields = set()
    for row in ops.values():
        fields.update(k for k in row if k.startswith("t"))
    return sorted(fields)


def main():
    args = [a for a in sys.argv[1:]]
    repeat = None
    if "--repeat" in args:
        i = args.index("--repeat")
        repeat = load(args[i + 1])
        del args[i:i + 2]
    if len(args) not in (1, 2):
        sys.exit(__doc__)
    cand = load(args[0])
    ref, ref_name = load_ref(args[0], args[1] if len(args) == 2 else None)
    cops, rops = cand.get("ops", {}), ref.get("ops", {})
    pops = (repeat or {}).get("ops", {})
    common = sorted(set(cops) & set(rops))
    if not common:
        sys.exit("probeguard: no common ops between candidate and reference")

    fails, confirmed, excused = [], [], []
    for op in common:
        for f in time_fields({op: cops[op]}):
            cv, rv = cops[op].get(f), rops[op].get(f)
            if cv is None or rv is None or rv <= 0 or max(cv, rv) < MIN_SEC:
                continue
            ratio = cv / rv
            if 1 / MAX_RATIO <= ratio <= MAX_RATIO:
                continue
            out_f = "out" + f[1:]
            co, ro = cops[op].get(out_f), rops[op].get(out_f)
            if co and ro and not (1 / OUT_RATIO <= co / ro <= OUT_RATIO):
                excused.append((op, f, ratio, f"{out_f} {ro}->{co}"))
                continue
            pv = pops.get(op, {}).get(f)
            if pv and pv > 0 and 1 / AGREE_RATIO <= cv / pv <= AGREE_RATIO:
                confirmed.append((op, f, ratio, pv))
            else:
                fails.append((op, f, rv, cv, ratio,
                              None if pv is None else pv))

    only_c = sorted(set(cops) - set(rops))
    only_r = sorted(set(rops) - set(cops))
    print(f"probeguard: {len(common)} common ops vs {ref_name}")
    if only_c:
        print(f"  new ops (not judged): {', '.join(only_c)}")
    if only_r:
        print(f"  removed ops (not judged): {', '.join(only_r)}")
    for op, f, ratio, why in excused:
        print(f"  excused {op}.{f}: {ratio:.2f}x — workload moved ({why})")
    for op, f, ratio, pv in confirmed:
        print(f"  confirmed {op}.{f}: {ratio:.2f}x — repeat agrees ({pv}s)")
    if fails:
        print(f"FAIL: {len(fails)} >{MAX_RATIO:.0f}x swings without an "
              "agreeing repeat (the drift signature — rerun the probe; pass "
              "the second run via --repeat):")
        for op, f, rv, cv, ratio, pv in fails:
            extra = "" if pv is None else f" (repeat disagrees: {pv}s)"
            print(f"  {op}.{f}: {rv}s -> {cv}s ({ratio:.2f}x){extra}")
        sys.exit(1)
    print("clean: no unconfirmed swings")


if __name__ == "__main__":
    main()
