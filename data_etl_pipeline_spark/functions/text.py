"""Scalar text/URL/email helpers (SURVEY F3, F4, F6, F9).

Pure-Python cores (unit-testable) plus Spark column expressions. Network
probes (DNS validation, redirect resolution, geocoding) are out of engine
scope per SURVEY — the deterministic syntactic parts are implemented; the
external calls are pluggable seams.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# --- email extraction (find_email_addresses.py:10-80 semantics) -----------

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# Spark SQL string literals consume one level of backslash escaping
_EMAIL_RE_SQL = EMAIL_RE.replace("\\", "\\\\")
# common non-mail TLD-ish suffixes the reference's validator rejects without DNS
_BAD_TLDS = ("png", "jpg", "jpeg", "gif", "svg", "webp", "css", "js")


def default_tld_validator(email: str) -> bool:
    """Deny-list stand-in for the reference's DNS deliverability check
    (find_email_addresses.py:45-80 uses email_validator, which resolves
    the domain); rejects asset-extension pseudo-TLDs without network."""
    return email.rsplit(".", 1)[-1] not in _BAD_TLDS


def extract_emails(text: str, validator=default_tld_validator) -> list[str]:
    """Pure-Python core: sorted distinct syntactic candidates filtered by
    the INJECTABLE validator — the same pluggable-seam pattern as the
    chunker's token counter, so a real DNS resolver (or a cached
    deliverability table) drops in without touching extraction."""
    # lowercase BEFORE matching, exactly like the column expression —
    # matching first would diverge on characters whose lower() maps into
    # the ASCII email class (e.g. the Kelvin sign U+212A -> 'k')
    cands = sorted({m.group(0) for m in re.finditer(EMAIL_RE, (text or "").lower())})
    return [e for e in cands if validator(e)]


def extract_emails_col(text_col: str) -> Column:
    """Sorted distinct syntactically-valid emails from a text column.

    regexp_extract_all (JVM regex) + array ops — no UDF; the default
    TLD-deny-list validator is compiled straight into the expression, so
    the common path stays in codegen. For a custom validator (e.g. DNS),
    use extract_emails_validated_col, which pays the Arrow boundary only
    when the seam is actually exercised.
    """
    bad = ",".join(f"'{t}'" for t in _BAD_TLDS)
    valid = F.expr(
        f"filter(regexp_extract_all(lower({text_col}), '{_EMAIL_RE_SQL}', 0), "
        f"x -> NOT element_at(split(x, '\\\\.'), -1) IN ({bad}))"
    )
    return F.array_sort(F.array_distinct(valid))


def make_dns_validator(resolve_mx, cache: dict | None = None):
    """Build a DNS-deliverability validator for the injectable seam —
    the shape of the reference's email_validator flow
    (find_email_addresses.py:45-80: syntactic parse, then resolve the
    domain; undeliverable -> drop), with a per-domain cache so a corpus
    with few distinct domains pays one lookup per domain, not per row.

    ``resolve_mx`` is any ``domain -> bool`` (true iff the domain has a
    mail exchanger). Network calls are out of engine scope per SURVEY, so
    production wires a real resolver here; tests inject a deterministic
    fake. The TLD deny-list still short-circuits first — no resolver is
    consulted for asset-extension pseudo-domains.

    The returned validator is a plain picklable-by-closure ``str -> bool``
    usable with extract_emails / extract_emails_validated_col; the cache
    is PER-EXECUTOR after pickling (each worker warms its own), which is
    the right scale behavior — a shared driver-side cache would serialize
    every lookup through one node.
    """
    cache = {} if cache is None else cache

    def validator(email: str) -> bool:
        if not default_tld_validator(email):
            return False
        domain = email.rsplit("@", 1)[-1]
        if domain not in cache:
            cache[domain] = bool(resolve_mx(domain))
        return cache[domain]

    return validator


def extract_emails_validated_col(text_col: str, validator=default_tld_validator) -> Column:
    """Email extraction with an injected validator, as a vectorized pandas
    UDF (Arrow-batched, never row-at-a-time in the JVM). The validator is
    any picklable ``str -> bool``; results must match extract_emails_col
    when given default_tld_validator (asserted in tests)."""

    @F.pandas_udf("array<string>")
    def _extract(s: pd.Series) -> pd.Series:
        return s.map(lambda t: extract_emails(t, validator))

    return _extract(F.col(text_col))


# --- URL normalization / eTLD+1 (url_util.py:9-95 semantics) --------------

# Registrable-domain resolution goes through the embedded public-suffix-list
# snapshot (functions/psl.py) — wildcard and exception rules included, like
# the reference's publicsuffix2 dependency.
from data_etl_pipeline_spark.functions.psl import etld1  # noqa: F401  (re-export)


def normalize_url(url: str) -> str | None:
    """Scheme/host normalization: lowercase host, strip default ports,
    drop fragments, ensure scheme (http default like the reference's
    fallback probe order)."""
    if not url or not url.strip():
        return None
    u = url.strip()
    if "://" not in u:
        u = "http://" + u
    parts = urlsplit(u)
    host = (parts.hostname or "").lower()
    if not host:
        return None
    port = f":{parts.port}" if parts.port and parts.port not in (80, 443) else ""
    path = parts.path or "/"
    query = f"?{parts.query}" if parts.query else ""
    return f"{parts.scheme.lower()}://{host}{port}{path}{query}"


# --- URI percent-encoding for RDF instance URIs (F6) ----------------------

_SAFE = re.compile(r"[^A-Za-z0-9_.~-]")


def uri_safe(s: str) -> str:
    """Percent-encode everything outside the RDF-safe character set."""
    return _SAFE.sub(lambda m: "%{:02X}".format(ord(m.group(0))), s)


# --- lat/lng bounds + WKT (F9) ---------------------------------------------

def wkt_point_col(lng_col: str, lat_col: str) -> Column:
    """POINT(lng lat) when coordinates are in bounds, else NULL."""
    in_bounds = (
        (F.col(lat_col) >= -90.0) & (F.col(lat_col) <= 90.0)
        & (F.col(lng_col) >= -180.0) & (F.col(lng_col) <= 180.0)
    )
    return F.when(in_bounds, F.concat(F.lit("POINT("), F.col(lng_col), F.lit(" "), F.col(lat_col), F.lit(")")))
