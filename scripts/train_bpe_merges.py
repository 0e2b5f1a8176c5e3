#!/usr/bin/env python
"""Train the corpus byte-level BPE merge table shipped at
data_etl_pipeline_spark/operators/bpe_merges.txt.

The reference counts tokens with tiktoken's full GPT-2-descendant merge
table (open_ai_key_app/src/open_ai_key_app/utils/token_util.py:6-8). That
file is not available offline, so the engine's vocabulary is built the way
the public GPT-2 vocabulary itself was built — BPE TRAINING (Sennrich et
al. 2016 / GPT-2 paper): start from single symbols, repeatedly merge the
most frequent adjacent pair, emit merges in frequency order. Run here over
the engine's own document corpus until saturation, the result is a merge
table whose token counts track the real subword statistics of the data the
engine processes; swapping in the true 50k GPT-2 file remains a pure data
change through bpe.load_merges() (the seam contract).

Deterministic: pair ties break lexicographically, the corpus is read in
doc_id order, and the output is committed — re-running reproduces the file
byte-for-byte.

Usage: python scripts/train_bpe_merges.py [corpus.parquet] [max_merges]
"""

from __future__ import annotations

import os
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_etl_pipeline_spark.operators.bpe import _MERGES_TXT, _PRETOKEN

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data_etl_pipeline_spark", "operators", "bpe_merges.txt",
)


def pretoken_freqs(texts) -> Counter:
    freqs: Counter = Counter()
    for text in texts:
        for m in _PRETOKEN.finditer(text or ""):
            freqs[m.group(0)] += 1
    return freqs


def symbols_of(pretoken: str) -> tuple[str, ...]:
    # same leading-space -> 'Ġ' spelling as bpe._count_pretoken
    return ("Ġ", *pretoken[1:]) if pretoken.startswith(" ") else tuple(pretoken)


def train(freqs: Counter, max_merges: int, min_count: int = 2) -> list[tuple[str, str]]:
    """Classic BPE training with incremental pair-count maintenance."""
    words: list[list[str]] = []
    counts: list[int] = []
    for tok, c in sorted(freqs.items()):
        words.append(list(symbols_of(tok)))
        counts.append(c)

    pair_counts: Counter = Counter()
    pair_words: defaultdict[tuple[str, str], set[int]] = defaultdict(set)
    for wi, w in enumerate(words):
        for a, b in zip(w, w[1:]):
            pair_counts[(a, b)] += counts[wi]
            pair_words[(a, b)].add(wi)

    merges: list[tuple[str, str]] = []
    while len(merges) < max_merges and pair_counts:
        # max count, ties broken by lexicographically smallest pair
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < min_count:
            break
        merges.append(best)
        new_sym = best[0] + best[1]
        for wi in list(pair_words[best]):
            w, c = words[wi], counts[wi]
            # remove this word's contribution, apply the merge, re-add
            for a, b in zip(w, w[1:]):
                pair_counts[(a, b)] -= c
                if pair_counts[(a, b)] <= 0:
                    del pair_counts[(a, b)]
                pair_words[(a, b)].discard(wi)
            j, merged = 0, []
            while j < len(w):
                if j + 1 < len(w) and (w[j], w[j + 1]) == best:
                    merged.append(new_sym)
                    j += 2
                else:
                    merged.append(w[j])
                    j += 1
            words[wi] = merged
            for a, b in zip(merged, merged[1:]):
                pair_counts[(a, b)] += c
                pair_words[(a, b)].add(wi)
    return merges


def main() -> None:
    import duckdb

    corpus = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1/documents.parquet"
    max_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    texts = [r[0] for r in duckdb.sql(
        f"SELECT text FROM '{corpus}' ORDER BY doc_id").fetchall()]
    head = {tuple(line.split(" ")) for line in _MERGES_TXT.splitlines() if line.strip()}
    trained = train(pretoken_freqs(texts), max_merges)
    fresh = [p for p in trained if p not in head]
    with open(OUT, "w") as fh:
        fh.write(
            "# Corpus-trained byte-level BPE merges (see scripts/train_bpe_merges.py).\n"
            f"# Trained to saturation on {os.path.basename(os.path.dirname(corpus))}"
            f"/documents.parquet: {len(trained)} merges, {len(fresh)} beyond the\n"
            "# embedded GPT-2-format head (which keeps public-rank precedence and is\n"
            "# prepended at load). Appended in trained frequency order.\n"
        )
        for a, b in fresh:
            fh.write(f"{a} {b}\n")
    print(f"wrote {OUT}: {len(fresh)} trained merges ({len(trained)} incl. head overlap)")


if __name__ == "__main__":
    main()
