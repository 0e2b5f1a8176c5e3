"""Byte-pair-encoding token counter — the third tokenizer through the
pluggable chunker seam (operators/chunker.py ``token_counter``).

The reference counts tokens with tiktoken (a full GPT-2-descendant BPE;
open_ai_key_app/src/open_ai_key_app/utils/token_util.py:6-8). tiktoken is
not available in this environment, so this module implements the SAME
public algorithm — byte-level BPE exactly as described in the GPT-2 paper
and the public ``encoder.py``/``merges.txt`` format:

  1. pre-tokenize with the GPT-2 pattern (contractions, letter runs,
     digit runs, symbol runs, trailing whitespace) — ASCII classes here
     since stdlib ``re`` lacks ``\\p{L}``, documented divergence;
  2. map each pre-token to its symbol sequence, spelling a leading space
     as the 'Ġ' marker the way the GPT-2 byte-encoder does;
  3. repeatedly merge the adjacent symbol pair with the LOWEST rank in
     the merge table until no ranked pair remains;
  4. the token count is the number of surviving symbols.

The merge table is two composed data sources, in merges.txt format (rank =
list position):

  1. an embedded subset seeded from the well-known head of the public
     GPT-2 merge list (public-rank precedence for the most common English
     pairs), then
  2. ``bpe_merges.txt`` — a table TRAINED on the engine's own document
     corpus by scripts/train_bpe_merges.py, the same frequency-ordered
     pair-merging procedure that built the public GPT-2 vocabulary,
     run to saturation (every frequent corpus word ends as one token).

So token counts track the real subword statistics of the data the engine
processes. Swapping in the full 50k-entry public GPT-2 table (when
tiktoken's data is available) is a DATA change only — load_merges()
accepts any iterable of pairs — which is precisely the seam contract:
chunk decisions respond to a real subword vocabulary, not whitespace.
The genuine artifact cannot be vendored from this build environment (no
network; verified), and the synthetic corpus saturates BPE training at
~100 merges, so tests/test_bpe_scale.py instead proves the seam at the
real table's SCALE: a deterministic 50,000-merge cascade table installs
via set_merges()/load_merges() and counts at interactive speed.

Pure Python on purpose: it runs inside the chunker's Arrow-batched
mapInPandas, never as a row-at-a-time Spark UDF, and ``functools.lru_cache``
memoizes per-pre-token work (Zipf distribution makes the hit rate high).
"""

from __future__ import annotations

import os
import re
from functools import lru_cache

# GPT-2 pre-tokenizer, ASCII approximation of the \p{L}/\p{N} classes.
_PRETOKEN = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"
)

# Compact merge list in GPT-2 merges.txt format ("left right" per line,
# rank = position). Head entries follow the public GPT-2 ordering; the
# tail extends with frequent English pairs so multi-merge cascades
# (e.g. Ġ+t, Ġt+he -> Ġthe) actually exercise rank precedence.
_MERGES_TXT = """\
Ġ t
Ġ a
h e
i n
r e
o n
Ġt he
e r
Ġ s
a t
Ġ w
Ġ o
e n
Ġ c
i t
i s
a n
o r
e s
Ġ b
e d
Ġ f
in g
Ġ p
o u
Ġa n
a l
a r
Ġt o
Ġ m
Ġo f
Ġ in
Ġ d
Ġ h
Ġan d
i c
a s
l e
Ġt h
i on
o m
l l
en t
Ġ n
Ġ l
s t
Ġ re
v e
Ġ e
r o
l y
Ġb e
Ġ g
Ġ T
c t
Ġ S
i d
o t
Ġ I
u t
e t
Ġ A
Ġ is
Ġ on
i m
a m
o w
a y
a d
s e
Ġth at
Ġ st
i g
a c
Ġ it
e e
a g
Ġ for
u r
Ġy ou
a b
u l
o o
c h
Ġw as
q u
Ġw ith
u s
k e
Ġc on
u n
t er
es t
Ġw h
Ġa re
o s
r i
ou ld
t h
Ġc om
at ion
p e
an d
er s
in e
m ent
Ġa s
Ġn ot
iv e
v er
al l
t he
ou s
Ġd e
it y
at e
Ġt r
Ġs e
Ġs u
Ġn e
el l
Ġh a
p p
Ġp ro
igh t
f f
is t
o l
Ġa t
o c
Ġb y
Ġe x
a k
Ġs o
Ġw e
g e
Ġa l
re s
Ġc an
Ġ or
Ġ en
Ġ v
en d
e a
i r
Ġp l
h er
ou n
Ġu n
Ġ do
ar t
em p
a p
Ġu s
i l
or t
Ġa b
an t
u d
Ġc h
Ġl i
or d
an s
el y
m ost
er t
r a
Ġ qu
as s
ar d
c e
ic k
il l
u res
a u
i v
Ġs h
o p
u g
er v
id e
Ġt e
Ġ k
p l
os s
b er
Ġ 1
i z
Ġf r
Ġi m
Ġ 2
am e
e ar
u m
o g
Ġh as
ac t
re e
f t
ac e
Ġth is
k s
y s
es s
er e
Ġg o
on e
or m
av e
Ġh is
i f
t her
om e
w n
Ġm an
p er
Ġint o
em ent
u st
Ġcom p
a in
ur e
or y
i e
is h
Ġy ear
"""


def load_merges(lines=None) -> dict[tuple[str, str], int]:
    """Parse merges.txt-format lines into a pair -> rank table.

    Without arguments, loads the composed default table: the embedded
    GPT-2-head subset first (keeping public rank precedence), then the
    corpus-trained ``bpe_merges.txt`` (pairs already ranked are skipped)."""
    if lines is None:
        lines = _MERGES_TXT.splitlines()
        trained = os.path.join(os.path.dirname(__file__), "bpe_merges.txt")
        if os.path.exists(trained):
            with open(trained) as fh:
                lines = lines + fh.read().splitlines()
    ranks: dict[tuple[str, str], int] = {}
    for line in lines:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        left, right = line.split(" ")
        if (left, right) not in ranks:
            ranks[(left, right)] = len(ranks)
    return ranks


_RANKS = load_merges()


def set_merges(ranks: dict) -> None:
    """Install a different merge table (e.g. the full 50k GPT-2 table via
    ``load_merges`` over its file) — the data-only swap the module
    contract advertises.  Clears the memoized pretoken counts, which were
    computed under the previous table and would otherwise be served
    stale."""
    global _RANKS, _TOKEN_IDS
    _RANKS = dict(ranks)
    _TOKEN_IDS = _token_ids(_RANKS)
    _encode_pretoken.cache_clear()


@lru_cache(maxsize=65536)
def _encode_pretoken(pretoken: str) -> tuple[str, ...]:
    """Surviving symbol sequence of one pre-token after all ranked merges
    — the ENCODE step (round 12); counting is its length."""
    # GPT-2 byte-encoder spells a leading space as 'Ġ' glued to nothing —
    # it is its own initial symbol and merges like any other.
    if pretoken.startswith(" "):
        symbols = ["Ġ", *pretoken[1:]]
    else:
        symbols = list(pretoken)
    while len(symbols) >= 2:
        best_rank = None
        best_i = -1
        for i in range(len(symbols) - 1):
            r = _RANKS.get((symbols[i], symbols[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
    return tuple(symbols)


def _count_pretoken(pretoken: str) -> int:
    return len(_encode_pretoken(pretoken))


def bpe_tokens(s: str) -> int:
    """Token count of ``s`` under the embedded byte-level BPE vocabulary."""
    return sum(_count_pretoken(m.group(0)) for m in _PRETOKEN.finditer(s))


def bpe_encode(s: str) -> list[str]:
    """Token STRINGS of ``s`` — every character of the input survives in
    exactly one token (leading pre-token spaces spelled 'Ġ'), so
    ``bpe_decode(bpe_encode(s)) == s`` for any text without a literal
    'Ġ' (byte-exact losslessness, the property every training-data
    tokenizer must keep)."""
    out: list[str] = []
    for m in _PRETOKEN.finditer(s):
        out.extend(_encode_pretoken(m.group(0)))
    return out


def bpe_decode(tokens) -> str:
    """Inverse of ``bpe_encode``: concatenate and un-spell the space
    marker (the GPT-2 decode rule)."""
    return "".join(tokens).replace("Ġ", " ")


def _token_ids(ranks: dict) -> dict[str, int]:
    """token string -> id. Deterministic and data-independent: a merged
    token's id is 0x110000 + its FIRST merge rank producing that string
    (merge order is the vocabulary order, exactly how GPT-2's vocab was
    built); a single-character token's id is its Unicode codepoint
    (codepoints < 0x110000 by definition, so the ranges never collide)."""
    ids: dict[str, int] = {}
    for (a, b), rank in ranks.items():
        ids.setdefault(a + b, 0x110000 + rank)
    return ids


_TOKEN_IDS = _token_ids(_RANKS)


def token_id(tok: str) -> int:
    tid = _TOKEN_IDS.get(tok)
    if tid is not None:
        return tid
    if len(tok) == 1:
        return ord(tok)
    return _fallback_id(tok)


def _fallback_id(tok: str) -> int:
    """Stable id for a multi-char token absent from the merge vocab
    (possible only for foreign tables; never under the module's own
    encode, which only builds strings via ranked merges). Derived from
    codepoints, not hash(), so it is stable across interpreter runs."""
    acc = 0
    for ch in tok:
        acc = (acc * 0x110001 + ord(ch)) % 0x7FFFFFFF
    return 0x220000_0000 + acc
