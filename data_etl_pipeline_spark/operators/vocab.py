"""Multi-pattern vocabulary search (SURVEY J7/F1, the scale path).

The reference brute-searches every chunk against every concept label with
one word-boundary regex per label (brute_search_service.py:9-29). The
crossJoin+rlike translation is correct but does |vocab| regex passes per
document. This operator compiles the whole vocabulary into ONE
alternation executed in a single pass per document inside an Arrow-batched
mapInPandas — |vocab| no longer multiplies the scan cost, which is what
makes a 10^5-label ontology affordable over 100 TB of text. (The same
seam is where an Aho-Corasick automaton would slot in for vocabularies too
large for one regex alternation.)

Emits (doc_id, concept) distinct pairs — identical results to the
crossJoin+rlike form, which stays as the oracle-checked baseline.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

MATCH_SCHEMA = "doc_id bigint, concept string"


class AhoCorasick:
    """Classic multi-pattern automaton: one pass over the text finds every
    occurrence of every pattern regardless of vocabulary size — the
    structure that replaces the regex alternation when the vocabulary is
    too large to compile (10^5+ labels). Pure Python on purpose: it is
    broadcast-friendly (built once per task from the vocab list) and has
    no dependencies."""

    def __init__(self, patterns: list[str]) -> None:
        # trie as list of dicts; fail links via BFS
        self.goto: list[dict[str, int]] = [{}]
        self.out: list[list[int]] = [[]]
        self.fail: list[int] = [0]
        for idx, pat in enumerate(patterns):
            node = 0
            for ch in pat:
                if ch not in self.goto[node]:
                    self.goto.append({})
                    self.out.append([])
                    self.fail.append(0)
                    self.goto[node][ch] = len(self.goto) - 1
                node = self.goto[node][ch]
            self.out[node].append(idx)
        from collections import deque

        q = deque()
        for child in self.goto[0].values():
            q.append(child)
        while q:
            node = q.popleft()
            for ch, child in self.goto[node].items():
                q.append(child)
                f = self.fail[node]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[child] = self.goto[f].get(ch, 0) if self.goto[f].get(ch, 0) != child else 0
                self.out[child].extend(self.out[self.fail[child]])

    def find(self, text: str):
        """Yield (start, end, pattern_index) for every occurrence."""
        node = 0
        for i, ch in enumerate(text):
            while node and ch not in self.goto[node]:
                node = self.fail[node]
            node = self.goto[node].get(ch, 0)
            for idx in self.out[node]:
                yield i + 1 - len(self._patterns[idx]), i + 1, idx

    def attach_patterns(self, patterns: list[str]) -> "AhoCorasick":
        self._patterns = patterns
        return self


def _is_word_char(c: str) -> bool:
    return c.isalnum() or c == "_"


def ac_multi_match(
    df: DataFrame,
    vocab: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Aho-Corasick variant of vocab_multi_match: identical output
    (distinct (doc_id, concept) with word-boundary semantics), but the
    scan cost is independent of vocabulary size."""
    labels = [label for _, label in vocab]
    concepts = [c for c, _ in vocab]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ac = AhoCorasick(labels).attach_patterns(labels)  # once per task
        for pdf in batches:
            out_ids: list[int] = []
            out_concepts: list[str] = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                t = text or ""
                seen: set[str] = set()
                for s, e, idx in ac.find(t):
                    if s > 0 and _is_word_char(t[s - 1]):
                        continue  # no word boundary on the left
                    if e < len(t) and _is_word_char(t[e]):
                        continue  # no word boundary on the right
                    seen.add(concepts[idx])
                out_ids.extend([doc_id] * len(seen))
                out_concepts.extend(sorted(seen))
            yield pd.DataFrame({"doc_id": out_ids, "concept": out_concepts})

    return df.select(id_col, text_col).mapInPandas(run, MATCH_SCHEMA)


def vocab_multi_match(
    df: DataFrame,
    vocab: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, concept) for every document whose text contains any of the
    concept's labels on word boundaries — one compiled scan per document."""
    groups = [f"(?P<g{i}>\\b{re.escape(label)}\\b)" for i, (_, label) in enumerate(vocab)]
    concepts = [c for c, _ in vocab]
    pattern_src = "|".join(groups)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pat = re.compile(pattern_src)  # compiled once per task, not per row
        for pdf in batches:
            out_ids: list[int] = []
            out_concepts: list[str] = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                seen: set[str] = set()
                for m in pat.finditer(text or ""):
                    seen.add(concepts[int(m.lastgroup[1:])])
                    if len(seen) == len(set(concepts)):
                        break  # all concepts found; stop scanning this doc
                out_ids.extend([doc_id] * len(seen))
                out_concepts.extend(sorted(seen))
            yield pd.DataFrame({"doc_id": out_ids, "concept": out_concepts})

    return df.select(id_col, text_col).mapInPandas(run, MATCH_SCHEMA)
