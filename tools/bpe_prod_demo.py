"""Production-vocabulary BPE demonstration (r12 verdict item 3).

The r12 round certified the BPE scale path (driver trainer over the
vocab-bound word-freq state + ONE broadcast-dict mapInPandas encoder)
at oracle sizes — n_merges ≤ 8k for the trainer, 256 for certified
encode. This script runs the SAME code at the size the r11 verdict
actually worried about:

  * trainer: n_merges = 32 768 over a ≥1M-distinct-word synthetic Zipf
    vocabulary (deterministic syllable morphology so merges learn real
    structure, freq ∝ 1/rank);
  * encoder: the resulting 32k merge ranks broadcast through
    ops.text.bpe_encode over the sf0.1 documents corpus AND the 10×
    replicated stress corpus (tools/scale_stress.py layout), recording
    wall time, the 10× runtime ratio, and the PHYSICAL PLAN LINE COUNT
    (must be flat — independent of n_merges).

Prints one JSON line for SCALING.md. Run on an idle host (bench
contention discipline).

Usage: python tools/bpe_prod_demo.py [--n-merges 32768] [--n-words 1000000]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pipetree_spark.ops import text as TX  # noqa: E402
from pipetree_spark.session import get_spark  # noqa: E402

#: 64 deterministic syllables — CV(C) shapes so concatenations share
#: subword structure for the merges to discover (a letter-soup vocab
#: would exercise only the heap, not the morphology).
_SYL = [
    c + v + ("nrs"[(ord(c) + ord(v)) % 3] if (ord(c) + ord(v)) % 2 else "")
    for c in "bdfgklmnprstvz"
    for v in "aeiou"
][:64]
assert len(_SYL) == 64 and len(set(_SYL)) == 64


def zipf_vocab(n_words: int) -> dict[str, int]:
    """Deterministic ≥n_words-distinct-word Zipf vocabulary: word i is
    2-4 syllables chosen by a mixed-radix walk over the inventory (all
    distinct by construction), freq = max(1, n_words // rank)."""
    words: dict[str, int] = {}
    i = 0
    rank = 1
    while len(words) < n_words:
        n_syl = 2 + (i % 3)
        k, parts = i, []
        for _ in range(n_syl):
            parts.append(_SYL[k % 64])
            k //= 64
        w = "".join(parts)
        if w not in words:
            words[w] = max(1, n_words // rank)
            rank += 1
        i += 1
    return words


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-merges", type=int, default=32768)
    ap.add_argument("--n-words", type=int, default=1_000_000)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--sf10-dir", default="/tmp/pipetree_spark_sfstress")
    args = ap.parse_args()

    t0 = time.perf_counter()
    wf = zipf_vocab(args.n_words)
    gen_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    merges = TX.bpe_train_merges(wf, args.n_merges)
    train_sec = time.perf_counter() - t0
    merge_list = [(lhs, rhs) for (_r, lhs, rhs, _c) in merges]

    spark = get_spark("bpe-prod-demo")
    out: dict[str, object] = {
        "n_words": len(wf),
        "n_merges_requested": args.n_merges,
        "n_merges_learned": len(merge_list),
        "vocab_gen_sec": round(gen_sec, 2),
        "train_sec": round(train_sec, 2),
    }
    encode_secs: dict[str, float] = {}
    for tag, sf_dir in (("sf0.1", args.sf_dir), ("sf0.1x10", args.sf10_dir)):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        enc = TX.bpe_encode(docs, merge_list)
        if tag == "sf0.1":
            plan = enc._jdf.queryExecution().executedPlan().toString()
            out["encode_plan_lines"] = len(
                [ln for ln in plan.splitlines() if ln.strip()]
            )
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            enc = TX.bpe_encode(docs, merge_list)
            n = enc.count()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        encode_secs[tag] = round(best, 2)
        out[f"encode_rows_{tag}"] = n
    out["encode_secs"] = encode_secs
    out["encode_10x_ratio"] = round(
        encode_secs["sf0.1x10"] / encode_secs["sf0.1"], 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
