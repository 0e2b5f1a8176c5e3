"""Public-suffix-list eTLD+1 (SURVEY F3; reference core/src/core/utils/
url_util.py:9-14, which uses the `publicsuffix2` package).

The reference resolves registrable domains through the real Mozilla Public
Suffix List. This module embeds a TRIMMED SNAPSHOT of that list (the PSL is
public data, publicsuffix.org) — the common ccTLD second-level registries,
the wildcard/exception rules that exercise every branch of the algorithm,
and the high-traffic private-section suffixes (github.io, blogspot.com, …).
Swapping in the full list is a data change, not a code change: extend
PSL_RULES (same one-rule-per-entry format as the upstream file).

Matching algorithm (the published PSL spec):
  * a rule matches when it is a label-suffix of the host;
  * wildcard rules `*.foo` match any single label plus `foo`;
  * exception rules `!bar.foo` override a wildcard — the public suffix is
    `foo` and `bar.foo` itself is registrable;
  * the prevailing rule is the exception if any, else the match with the
    most labels, else the default rule `*` (the bare TLD);
  * registrable domain (eTLD+1) = public suffix + one more label.

Three implementations share PSL_RULES:
  * `public_suffix_len` / `etld1` — pure Python, unit-testable;
  * `with_etld1` — Spark DataFrame transform built from zero-shuffle SQL
    expressions (literal rule arrays inside a single fold, whole-stage
    codegen, no UDF, no join — at 100 TB the rule set is a compile-time
    constant, not a dimension table to broadcast);
  * `duckdb_ps_expr` / `duckdb_etld1_select` — the DuckDB mirror used by
    oracle queries.
"""

from __future__ import annotations

from urllib.parse import urlsplit

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# --- trimmed PSL snapshot (upstream format: one rule per entry) -----------

PSL_RULES: tuple[str, ...] = (
    # ICANN section — United Kingdom
    "co.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk", "net.uk", "sch.uk",
    "ac.uk", "gov.uk", "nhs.uk", "police.uk",
    # Australia
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    # New Zealand
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "geek.nz", "gen.nz", "kiwi.nz", "maori.nz",
    # Singapore
    "com.sg", "net.sg", "org.sg", "gov.sg", "edu.sg", "per.sg",
    # Japan
    "co.jp", "ne.jp", "or.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp",
    "gr.jp", "lg.jp",
    # Brazil
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "nom.br", "art.br",
    "blog.br", "eco.br",
    # China
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    # Mexico
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    # India
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in", "gov.in",
    "ac.in", "edu.in", "res.in",
    # South Africa
    "co.za", "net.za", "org.za", "gov.za", "edu.za", "ac.za", "web.za",
    # South Korea
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr", "pe.kr",
    # Taiwan / Hong Kong
    "com.tw", "net.tw", "org.tw", "gov.tw", "edu.tw", "idv.tw",
    "com.hk", "net.hk", "org.hk", "gov.hk", "edu.hk", "idv.hk",
    # Turkey / Argentina / Poland
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "web.tr", "gen.tr",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar", "int.ar",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "waw.pl",
    # United States locality / k12
    "ca.us", "ny.us", "tx.us", "va.us", "fl.us", "wa.us",
    "k12.va.us", "k12.ca.us", "k12.ny.us", "cc.va.us", "lib.va.us",
    # wildcard rules (any single label below these is a public suffix)
    "*.ck", "*.bd", "*.np", "*.pg", "*.mm", "*.kh", "*.fk",
    # exception rules (registrable despite the wildcard above)
    "!www.ck", "!city.fk",
    # private section — platform suffixes
    "github.io", "githubusercontent.com", "gitlab.io", "blogspot.com",
    "appspot.com", "herokuapp.com", "netlify.app", "vercel.app",
    "web.app", "firebaseapp.com", "pages.dev", "workers.dev",
    "wordpress.com", "cloudfront.net", "s3.amazonaws.com",
    "elb.amazonaws.com", "azurewebsites.net", "readthedocs.io",
    "surge.sh", "fly.dev", "onrender.com", "repl.co",
)

EXACT_RULES: tuple[str, ...] = tuple(
    r for r in PSL_RULES if not r.startswith(("*.", "!"))
)
# wildcard parents: '*.ck' stored as 'ck'
WILD_PARENTS: tuple[str, ...] = tuple(
    r[2:] for r in PSL_RULES if r.startswith("*.")
)
# exception rules stored without '!'
EXC_RULES: tuple[str, ...] = tuple(r[1:] for r in PSL_RULES if r.startswith("!"))


# --- pure Python ----------------------------------------------------------

def _host_of(host_or_url: str) -> str:
    """Hostname of a URL or bare host.  Scheme-less forms still need the
    path/query/fragment stripped (``bbc.co.uk/news`` is NOT a host), and
    ``http:host`` (colon, no slashes) means scheme-then-host, not
    host-then-port — both previously leaked garbage into the eTLD+1."""
    import re as _re

    h = host_or_url.strip().lower()
    if "//" in h:
        return (urlsplit(h).hostname or "").strip(".")
    if h.startswith(("http:", "https:")):
        h = h.split(":", 1)[1]
    h = _re.split(r"[/?#]", h, 1)[0]
    return h.split("@")[-1].split(":")[0].strip(".")


def public_suffix_len(host: str) -> int:
    """Number of labels in the host's public suffix (>= 1)."""
    labels = host.split(".")
    n = len(labels)
    for i in range(n):  # exceptions prevail; first (longest) match wins
        if ".".join(labels[i:]) in EXC_RULES:
            return n - i - 1
    best = 1
    for i in range(n):
        if ".".join(labels[i:]) in EXACT_RULES:
            best = max(best, n - i)
        if i + 1 < n and ".".join(labels[i + 1 :]) in WILD_PARENTS:
            best = max(best, n - i)
    return best


def etld1(host_or_url: str) -> str | None:
    """Registrable domain (eTLD+1) of a host or URL; None if unparseable
    or the host is itself a public suffix."""
    if not host_or_url:
        return None
    h = _host_of(host_or_url)
    if not h or "." not in h:
        return None
    labels = h.split(".")
    ps = public_suffix_len(h)
    if len(labels) <= ps:
        return None
    return ".".join(labels[-(ps + 1) :])


# --- Spark: zero-shuffle expression over (ls, n) columns ------------------

def _spark_array(items: tuple[str, ...]) -> str:
    return "array(" + ",".join(f"'{x}'" for x in items) + ")"


def spark_ps_expr(ls: str = "ls", n: str = "n") -> str:
    """Spark SQL expression: public-suffix label count given a label-array
    column `ls` and its size `n`. One fold over suffix positions carrying
    (exception ps, best normal ps); exceptions prevail."""
    exact = _spark_array(EXACT_RULES)
    wild = _spark_array(WILD_PARENTS)
    exc = _spark_array(EXC_RULES)
    return f"""
    aggregate(
      sequence(1, {n}),
      named_struct('exc', cast(-1 as int), 'best', cast(1 as int)),
      (a, i) -> named_struct(
        'exc', CASE WHEN a.exc >= 0 THEN a.exc
                    WHEN array_contains({exc}, concat_ws('.', slice({ls}, i, {n} - i + 1)))
                    THEN cast({n} - i as int) ELSE cast(-1 as int) END,
        'best', greatest(a.best,
          CASE WHEN array_contains({exact}, concat_ws('.', slice({ls}, i, {n} - i + 1)))
               THEN cast({n} - i + 1 as int) ELSE cast(1 as int) END,
          CASE WHEN i < {n} AND array_contains({wild}, concat_ws('.', slice({ls}, i + 1, {n} - i)))
               THEN cast({n} - i + 1 as int) ELSE cast(1 as int) END)),
      a -> CASE WHEN a.exc >= 0 THEN a.exc ELSE a.best END)
    """


def with_etld1(df: DataFrame, host_col: str, out_col: str = "etld1") -> DataFrame:
    """Add the registrable-domain column for a lowercase-host column.

    Pure codegen expressions (split -> fold over literal rule arrays ->
    slice); no UDF, no join, no shuffle — the operator's cost at 100 TB is
    a map-side scan.
    """
    return (
        df.withColumn("_ls", F.split(F.col(host_col), r"\."))
        .withColumn("_n", F.size("_ls"))
        .withColumn("_ps", F.expr(spark_ps_expr("_ls", "_n")))
        .withColumn(
            out_col,
            F.when(
                F.col(host_col).contains(".") & (F.col("_n") > F.col("_ps")),
                F.expr("concat_ws('.', slice(_ls, _n - _ps, _ps + 1))"),
            ),
        )
        .drop("_ls", "_n", "_ps")
    )


# --- DuckDB mirror --------------------------------------------------------

def _duck_list(items: tuple[str, ...]) -> str:
    return "[" + ",".join(f"'{x}'" for x in items) + "]"


def duckdb_ps_expr(ls: str = "l", n: str = "n") -> str:
    """DuckDB expression: public-suffix label count given a label-list
    column `l` and its length `n` (list comprehensions over range())."""
    exact = _duck_list(EXACT_RULES)
    wild = _duck_list(WILD_PARENTS)
    exc = _duck_list(EXC_RULES)
    return f"""
    COALESCE(
      list_max([{n} - i FOR i IN range(1, {n} + 1)
                IF list_contains({exc}, array_to_string({ls}[i : {n}], '.'))]),
      GREATEST(
        COALESCE(list_max([{n} - i + 1 FOR i IN range(1, {n} + 1)
                           IF list_contains({exact}, array_to_string({ls}[i : {n}], '.'))]), 1),
        COALESCE(list_max([{n} - i + 1 FOR i IN range(1, {n} + 1)
                           IF i < {n} AND list_contains({wild}, array_to_string({ls}[i + 1 : {n}], '.'))]), 1))
    )
    """


def duckdb_etld1_select(host_source_sql: str, host_col: str = "host") -> str:
    """Full DuckDB SELECT producing (host, etld1) from a host-producing
    subquery, mirroring `with_etld1` exactly."""
    return f"""
    SELECT {host_col} AS host,
           CASE WHEN contains({host_col}, '.') AND n > ps
                THEN array_to_string(l[n - ps : n], '.') END AS etld1
    FROM (
      SELECT {host_col}, l, n, {duckdb_ps_expr("l", "n")} AS ps
      FROM (
        SELECT {host_col}, string_split({host_col}, '.') AS l,
               len(string_split({host_col}, '.')) AS n
        FROM ({host_source_sql})
      )
    )
    """
