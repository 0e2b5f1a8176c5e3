"""Corpus-wide BPE ENCODE — the last step every training-data pipeline
runs: apply a trained merge table to turn the document corpus into token
ids (the reference rides tiktoken's encode for this;
open_ai_key_app/src/open_ai_key_app/utils/token_util.py:6-8).

Round 12 closes the loop the earlier BPE rows opened: E151 TRAINS merges
(operators/bpe_train.py), ``doc_chunks_bpe`` COUNTS with them
(operators/bpe.py); this module APPLIES them corpus-wide.

Shape: one Arrow-batched ``mapInPandas`` pass — encoding is inherently
per-document sequential symbol merging, exactly the "built-in operators
genuinely can't express the semantics" case the UDF ladder reserves for
Python. No shuffle: the encode is a map-side projection; the per-pretoken
``lru_cache`` in operators/bpe.py gives high hit rates under the corpus's
Zipf distribution (the same memoization the counting path relies on).

Losslessness contract: ``bpe_decode(bpe_encode(text)) == text``
byte-exactly (every input character survives in exactly one token), which
is what makes the operator oracle-checkable end-to-end: the declared
query reassembles the decoded tokens and the DuckDB oracle compares
against the raw ``text`` column verbatim.

Ids are deterministic and data-independent (operators/bpe.py::token_id):
single-char tokens take their Unicode codepoint, merged tokens take
0x110000 + merge rank — so re-encoding the same corpus under the same
merge table yields bit-identical id streams on any cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from data_etl_pipeline_spark.operators import bpe


def encode_documents(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id_col, ids array<long>, n_tokens, reassembled) per document.

    ``reassembled`` is the decode of the emitted tokens — returned so
    callers (and the oracle) can assert byte-exact losslessness without
    re-implementing BPE; ``ids`` is the training-ready id stream.
    """
    out_schema = T.StructType(
        [
            docs.schema[id_col],
            T.StructField("ids", T.ArrayType(T.LongType()), False),
            T.StructField("n_tokens", T.LongType(), False),
            T.StructField("reassembled", T.StringType(), False),
        ]
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            toks = [bpe.bpe_encode(t if t is not None else "") for t in pdf[text_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "ids": [[bpe.token_id(t) for t in ts] for ts in toks],
                    "n_tokens": [len(ts) for ts in toks],
                    "reassembled": [bpe.bpe_decode(ts) for ts in toks],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(run, out_schema)
