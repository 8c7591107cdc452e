"""Interleaved A/B of learn_bpe_merges' checkpoint cadence
(checkpoint_every=1, the pre-r13 behavior, vs the new default 4 — the
cadence bpe_encode has always used).

The learner's 12–16 merge rounds are inherently sequential (each
argmax depends on the previous merge), so round LATENCY is the whole
cost at bench scale; an eager localCheckpoint job per round buys
nothing the next round's aggregate can't replay as <= 3 map-side
native fold layers over the vocabulary-sized table. The merges are
exact integer argmaxes with a total deterministic order, so the
cadence cannot change results — asserted here anyway, along with the
final vocab contents.

Usage: python tools/ab_bpe_cadence.py [rounds] [sf_dir]
Run on an idle host.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    from ecmm428_pycart_spark.datapipe.text import learn_bpe_merges
    from ecmm428_pycart_spark.session import get_spark, load_table
    spark = get_spark("ab-bpe-cadence")
    docs = load_table(spark, sf_dir, "documents")

    def run(every):
        t0 = time.time()
        merges, vocab = learn_bpe_merges(docs, n_merges=12,
                                         checkpoint_every=every)
        rows = sorted(tuple(r) for r in
                      vocab.select("word", "freq", "syms").collect())
        return round(time.time() - t0, 2), merges, rows

    for every in (1, 4):                      # warmup both arms
        run(every)
    runs = {1: [], 4: []}
    outs = {}
    for _ in range(rounds):
        for every in (1, 4):
            sec, merges, rows = run(every)
            runs[every].append(sec)
            outs[every] = (merges, rows)
    assert outs[1][0] == outs[4][0], "merge lists differ across cadence!"
    assert outs[1][1] == outs[4][1], "final vocab differs across cadence!"
    med = lambda v: sorted(v)[len(v) // 2]
    print(json.dumps({
        "every1_runs": runs[1], "every4_runs": runs[4],
        "every1_median": med(runs[1]), "every4_median": med(runs[4]),
        "speedup": round(med(runs[1]) / max(med(runs[4]), 1e-9), 2),
        "merges_identical": True, "vocab_identical": True,
        "n_merges": len(outs[1][0]),
    }, indent=1))


if __name__ == "__main__":
    main()
