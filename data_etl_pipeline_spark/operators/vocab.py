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
