#!/usr/bin/env python3
"""Round-end correctness-artifact guard (VERDICT r14 #2).

CORRECTNESS_r14.json shipped as a literal `{}` — a harness failure
that silently read as "no data" for the whole round. This refuses to
let a round end with an empty or shrunken artifact: the named file
must parse, be non-empty, and carry at least as many query rows as
the largest prior round (coverage only ever grows).

Usage: tools/roundguard.py CORRECTNESS_rN.json
Exit 0 = sane; exit 1 = empty/shrunken/unreadable (treat the round's
correctness as NOT RUN and re-run the sweep, e.g.
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify" &&
  tools/check.py /tmp/verify /root/testdata/sf0.01).

Driver-side tooling only — NOT part of the engine.
"""
import glob
import json
import os
import re
import sys


def main():
    target = sys.argv[1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        cur = json.load(open(target))
    except Exception as e:
        print(f"GUARD-FAIL {target}: unreadable ({e})")
        sys.exit(1)
    if not isinstance(cur, dict) or not cur:
        print(f"GUARD-FAIL {target}: empty artifact — harness failure, "
              "not a pass; re-run the sweep")
        sys.exit(1)
    this_round = re.search(r"CORRECTNESS_r(\d+)\.json", target)
    prev_max = 0
    prev_name = None
    for f in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json", f)
        if this_round and m and int(m.group(1)) >= int(this_round.group(1)):
            continue
        try:
            d = json.load(open(f))
        except Exception:
            continue
        if isinstance(d, dict) and len(d) > prev_max:
            prev_max, prev_name = len(d), os.path.basename(f)
    if len(cur) < prev_max:
        print(f"GUARD-FAIL {target}: {len(cur)} rows < {prev_max} "
              f"({prev_name}) — coverage only grows; sweep incomplete")
        sys.exit(1)
    n_bad = sum(
        1 for v in cur.values()
        if isinstance(v, dict) and v.get("hash_match") is False)
    print(f"GUARD-OK {target}: {len(cur)} rows "
          f"(prior max {prev_max}), {n_bad} red")
    sys.exit(0)


if __name__ == "__main__":
    main()
