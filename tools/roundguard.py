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

Second duty (VERDICT r15 #4): the sweep's green is sf0.01-specific by
construction (several oracles pin constants captured at that sf), so
an sf-dependent bug — a fixture-size assumption, a hidden constant —
could hide behind it. The guard therefore ALSO demands a green sf0.1
smoke artifact for the same round: SF01_SMOKE_rN.json, produced by

  sbt "runMain graft.Verify /root/testdata/sf0.1 /tmp/verify_sf01 \
      <SF01_SMOKE queries>" &&
  python3 tools/check.py --json SF01_SMOKE_rN.json \
      /tmp/verify_sf01 /root/testdata/sf0.1 <SF01_SMOKE queries>

with every subset query "OK". The subset (SF01_SMOKE below — the
list is the source of truth, currently 17) is non-pinned and
shape-diverse: dedup LSH + its 8x scale witness, retrieval, TPC-H
decorrelation (Q17/Q13/Q21), streaming SCD2/ADF, ANN, Mann-Kendall,
window/sessionization, URL canonicalization, language-id, bigram
LM, packing, and the CC diameter witness.

Driver-side tooling only — NOT part of the engine.
"""
import glob
import json
import os
import re
import sys

SF01_SMOKE = [
    "q_dedup_minhash", "q_dedup_minhash_scale", "q_bm25", "q_tpch_q17",
    "q_stream_scd2", "q_adf", "q_ann_topk", "q_mann_kendall",
    "q_window_funcs", "q_sessions", "q_url_canonical", "q_lang_id",
    "q_kneser_ney", "q_pack_sequences", "q_tpch_q13", "q_tpch_q21",
    "q_cc_diameter_scale", "q_bpe_train", "q_leakage_safe_split"]


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
    # sf0.1 smoke gate (VERDICT r15 #4)
    smoke_target = re.sub(r"CORRECTNESS_r(\d+)\.json$",
                          r"SF01_SMOKE_r\1.json", target)
    if smoke_target == target:
        smoke_target = os.path.join(os.path.dirname(target) or ".",
                                    "SF01_SMOKE.json")
    try:
        smoke = json.load(open(smoke_target))
    except Exception as e:
        print(f"GUARD-FAIL {smoke_target}: unreadable ({e}) — run the "
              "sf0.1 smoke subset (see module docstring)")
        sys.exit(1)
    missing = [q for q in SF01_SMOKE if q not in smoke]
    red = [q for q in SF01_SMOKE if smoke.get(q) not in (None, "OK")]
    if missing or red:
        print(f"GUARD-FAIL {smoke_target}: missing={missing} red="
              f"{[(q, smoke[q][:60]) for q in red]}")
        sys.exit(1)
    print(f"GUARD-OK {target}: {len(cur)} rows "
          f"(prior max {prev_max}), {n_bad} red; "
          f"sf0.1 smoke {len(SF01_SMOKE)}/{len(SF01_SMOKE)} green")
    sys.exit(0)


if __name__ == "__main__":
    main()
