#!/usr/bin/env python3
"""Round-end correctness-artifact guard (VERDICT r14 #2).

CORRECTNESS_r14.json shipped as a literal `{}` — a harness failure
that silently read as "no data" for the whole round. This refuses to
let a round end with an empty or shrunken artifact: the named file
must parse, be non-empty, and carry at least as many query rows as
the largest prior round (coverage only ever grows).

Usage: tools/roundguard.py CORRECTNESS_rN.json
       tools/roundguard.py --smoke-list CORRECTNESS_rN.json
Exit 0 = sane; exit 1 = empty/shrunken/unreadable (treat the round's
correctness as NOT RUN and re-run the sweep, e.g.
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify" &&
  tools/check.py /tmp/verify /root/testdata/sf0.01).

Second duty (VERDICT r15 #4): the sweep's green is sf0.01-specific by
construction (several oracles pin constants captured at that sf), so
an sf-dependent bug — a fixture-size assumption, a hidden constant —
could hide behind it. The guard therefore ALSO demands a green sf0.1
smoke artifact for the same round: SF01_SMOKE_rN.json, produced by

  tools/roundguard.py --smoke-list CORRECTNESS_rN.json  # the subset
  sbt "runMain graft.Verify /root/testdata/sf0.1 /tmp/verify_sf01 \
      <subset>" &&
  python3 tools/check.py --json SF01_SMOKE_rN.json \
      /tmp/verify_sf01 /root/testdata/sf0.1 <subset>

with every subset query "OK". The subset (VERDICT r17 #3) is the
union of three deterministic pieces, so the gate and the generator
cannot disagree:

  1. PINNED — 19 fixed shape-diverse rows (dedup LSH + its 8x scale
     witness, retrieval, TPC-H decorrelation, streaming SCD2/ADF,
     ANN, Mann-Kendall, window/sessionization, URL canonicalization,
     language-id, bigram LM, packing, the CC diameter witness, BPE
     training, the leakage-safe split);
  2. ROTATION — the round-N slice keyed on a STABLE per-query hash
     (md5(name) % ROTATION_PERIOD == N % ROTATION_PERIOD — ADVICE
     r18: the old sorted-index key shifted whenever the query set
     grew, so a query could evade its slice indefinitely), ~30 rows
     per round, so EVERY row gets sf0.1 coverage once per
     ROTATION_PERIOD rounds;
  3. NEW-IN-ROUND — every query present in CORRECTNESS_rN but absent
     from the largest prior round's artifact (new surface is the
     likeliest to hide an sf-dependent constant).

Driver-side tooling only — NOT part of the engine.
"""
import glob
import json
import os
import re
import sys

PINNED = [
    "q_dedup_minhash", "q_dedup_minhash_scale", "q_bm25", "q_tpch_q17",
    "q_stream_scd2", "q_adf", "q_ann_topk", "q_mann_kendall",
    "q_window_funcs", "q_sessions", "q_url_canonical", "q_lang_id",
    "q_kneser_ney", "q_pack_sequences", "q_tpch_q13", "q_tpch_q21",
    "q_cc_diameter_scale", "q_bpe_train", "q_leakage_safe_split"]

# Queries whose oracle is a VALUES table of constants CAPTURED FROM
# THE QUERY'S OWN sf0.01 OUTPUT (the PinnedOracleInvarianceSpec
# class): they are correct-by-construction only at sf0.01 and CANNOT
# be replayed at another scale factor — running them at sf0.1
# compares sf0.1 output against sf0.01 constants and goes red with no
# bug present (the r18 rotation caught q_pca_variance exactly this
# way). Excluded from the rotation; their cross-config invariance is
# spec-gated instead (PinnedOracleInvarianceSpec runs them under two
# shuffle-partition settings). NOT excluded: q_pipeline_tokens — its
# pin is a word→stem MAP (sf-agnostic; the synthetic vocabulary is
# fixed across scale factors) and it verifies green at sf0.1
# (checked empirically in r18); q_dedup_minhash_scale — its pin is
# the cand_linear_ok verdict column, recomputed from the data.
SF_PINNED = ["q_confusion", "q_pca_variance", "q_tsne", "q_stem_terms"]

ROTATION_PERIOD = 12


def load_round(target):
    m = re.search(r"CORRECTNESS_r(\d+)\.json", target)
    return int(m.group(1)) if m else 0


def prev_artifact(repo, this_round):
    """(name, dict) of the largest prior round's artifact, or
    (None, {})."""
    best, best_name = {}, None
    for f in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json", f)
        if this_round and m and int(m.group(1)) >= this_round:
            continue
        try:
            d = json.load(open(f))
        except Exception:
            continue
        if isinstance(d, dict) and len(d) > len(best):
            best, best_name = d, os.path.basename(f)
    return best_name, best


def rotation_slot(name):
    """Stable per-query rotation slot (ADVICE r18: keying on the
    index in sorted(cur) shifts whenever the query set grows, so a
    query could evade its slice indefinitely; a content hash of the
    NAME is permanent). md5, not hash() — the latter is salted per
    process since py3.3."""
    import hashlib
    return int(hashlib.md5(name.encode()).hexdigest(), 16) \
        % ROTATION_PERIOD


def bench_contended(bench):
    """True when a BENCH artifact dict stamps itself contended
    (VERDICT r18 #2: Bench computes the median common-set ratio
    against the last committed round and flags runs past the band —
    the r18 +5.6% fleet drift that quiet_ms missed)."""
    return bool(bench.get("contended")) is True


def flagship_note(repo, this_round):
    """The flagship-headline verdict for this round's bench artifact:
    a contended run's wall-clock numbers are REFUSED — SURVEY and the
    round summary must quote the last calm artifact instead.
    Correctness rows and the oracle-checked witnesses stand
    regardless (a stolen box cannot change them)."""
    path = os.path.join(repo, f"BENCH_r{this_round}.json")
    try:
        bench = json.load(open(path))
    except Exception:
        return ""
    if bench_contended(bench):
        idx = bench.get("contention_index", "?")
        return (f"; BENCH_r{this_round} CONTENDED "
                f"(contention_index={idx}) — flagship headline "
                "REFUSED, quote the last calm artifact")
    return f"; BENCH_r{this_round} calm — flagship headline accepted"


def smoke_subset(cur, prev, this_round):
    """The required sf0.1 subset for this round (VERDICT r17 #3)."""
    rotating = [q for q in sorted(cur)
                if rotation_slot(q) == this_round % ROTATION_PERIOD]
    new_in_round = [q for q in cur if q not in prev] if prev else []
    return sorted((set(PINNED) | set(rotating) | set(new_in_round))
                  - set(SF_PINNED))


def main():
    args = [a for a in sys.argv[1:]]
    list_only = "--smoke-list" in args
    if list_only:
        args.remove("--smoke-list")
    target = args[0]
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
    this_round = load_round(target)
    prev_name, prev = prev_artifact(repo, this_round)
    subset = smoke_subset(cur, prev, this_round)
    if list_only:
        print(" ".join(subset))
        sys.exit(0)
    if len(cur) < len(prev):
        print(f"GUARD-FAIL {target}: {len(cur)} rows < {len(prev)} "
              f"({prev_name}) — coverage only grows; sweep incomplete")
        sys.exit(1)
    n_bad = sum(
        1 for v in cur.values()
        if isinstance(v, dict) and v.get("hash_match") is False)
    # sf0.1 smoke gate (VERDICT r15 #4 + the r17 #3 rotation)
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
    missing = [q for q in subset if q not in smoke]
    red = [q for q in subset if smoke.get(q) not in (None, "OK")]
    if missing or red:
        print(f"GUARD-FAIL {smoke_target}: missing={missing} red="
              f"{[(q, smoke[q][:60]) for q in red]}")
        sys.exit(1)
    bench_note = flagship_note(os.path.dirname(target) or ".",
                               this_round)
    print(f"GUARD-OK {target}: {len(cur)} rows "
          f"(prior max {len(prev)}), {n_bad} red; "
          f"sf0.1 smoke {len(subset)}/{len(subset)} green "
          f"(rotation slice {this_round % ROTATION_PERIOD}/"
          f"{ROTATION_PERIOD}){bench_note}")
    sys.exit(0)


if __name__ == "__main__":
    main()
