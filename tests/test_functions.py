"""Unit tests for scalar function layer (JSON repair F2, emails F4,
URLs F3, URI encoding F6) — mirrors the reference's test suites
(core/tests/test_str_util.py, test_url_util.py)."""

from __future__ import annotations

from data_etl_pipeline_spark.functions.json_repair import (
    parse_json_array,
    repair_json,
    strip_markdown_fences,
)
from data_etl_pipeline_spark.functions.text import etld1, normalize_url, uri_safe


class TestJsonRepair:
    def test_clean_passthrough(self):
        assert parse_json_array('["a", "b"]') == ["a", "b"]

    def test_markdown_fences(self):
        assert parse_json_array('```json\n["a", "b"]\n```') == ["a", "b"]
        assert parse_json_array('```\n["a"]\n```') == ["a"]

    def test_unescaped_inner_quotes(self):
        assert parse_json_array('["a "quoted" phrase", "b"]') == ['a "quoted" phrase', "b"]

    def test_already_escaped_quotes_untouched(self):
        assert parse_json_array('["a \\"ok\\" phrase"]') == ['a "ok" phrase']

    def test_garbage_returns_none(self):
        assert parse_json_array("not json at all") is None
        assert parse_json_array('{"k": 1}') is None  # object, not array

    def test_fences_idempotent(self):
        s = '["x"]'
        assert strip_markdown_fences(strip_markdown_fences(s)) == s
        assert repair_json(repair_json(s)) == s


class TestUrls:
    def test_etld1_basic(self):
        assert etld1("https://www.acme-mfg.com/about") == "acme-mfg.com"
        assert etld1("sub.deep.example.org") == "example.org"

    def test_etld1_two_level_suffix(self):
        assert etld1("shop.widgets.co.uk") == "widgets.co.uk"
        assert etld1("a.b.example.co.nz") == "example.co.nz"
        assert etld1("x.example.com.sg") == "example.com.sg"
        assert etld1("x.school.k12.va.us") == "school.k12.va.us"

    def test_etld1_private_suffixes(self):
        assert etld1("proj.user.github.io") == "user.github.io"
        assert etld1("blog.blogspot.com") == "blog.blogspot.com"
        assert etld1("b.s3.amazonaws.com") == "b.s3.amazonaws.com"

    def test_etld1_wildcard_and_exception(self):
        # *.ck: any single label under ck is itself a public suffix
        assert etld1("foo.ck") is None
        assert etld1("bar.foo.ck") == "bar.foo.ck"
        # !www.ck overrides the wildcard
        assert etld1("www.ck") == "www.ck"
        assert etld1("x.www.ck") == "www.ck"

    def test_etld1_invalid(self):
        assert etld1("") is None
        assert etld1("localhost") is None
        assert etld1("com") is None

    def test_normalize(self):
        assert normalize_url("ACME-mfg.com") == "http://acme-mfg.com/"
        assert normalize_url("https://X.com:443/a?b=1#frag") == "https://x.com/a?b=1"
        assert normalize_url("http://x.com:8080/p") == "http://x.com:8080/p"
        assert normalize_url("   ") is None


def test_uri_safe():
    assert uri_safe("Acme Mfg, Inc.") == "Acme%20Mfg%2C%20Inc."
    assert uri_safe("safe_name-1.0~x") == "safe_name-1.0~x"


def test_email_extraction_spark(spark):
    from data_etl_pipeline_spark.functions.text import extract_emails_col

    df = spark.createDataFrame(
        [
            (1, "contact sales@acme-mfg.com or SALES@acme-mfg.com today"),
            (2, "broken image logo@2x.png and real info@example.org"),
            (3, "no emails here"),
        ],
        "id long, text string",
    )
    out = {r["id"]: r["emails"] for r in df.select("id", extract_emails_col("text").alias("emails")).collect()}
    assert out[1] == ["sales@acme-mfg.com"]
    assert out[2] == ["info@example.org"]
    assert out[3] == []


def test_email_validator_seam_is_injectable(spark):
    """The DNS-deliverability step is a pluggable validator (same seam
    pattern as the chunker token counter): a fake resolver that only
    accepts example.org must filter accordingly, and the default
    validator through the pandas-UDF path must agree with the codegen
    column expression."""
    from data_etl_pipeline_spark.functions.text import (
        extract_emails,
        extract_emails_col,
        extract_emails_validated_col,
    )

    def fake_dns_resolver(email: str) -> bool:
        return email.endswith("@example.org")  # only this domain "resolves"

    assert extract_emails(
        "a@example.org b@nxdomain.test c@example.org", validator=fake_dns_resolver
    ) == ["a@example.org", "c@example.org"]

    df = spark.createDataFrame(
        [
            (1, "contact sales@acme-mfg.com or SALES@acme-mfg.com today"),
            (2, "broken image logo@2x.png and real info@example.org"),
            (3, "no emails here"),
            (4, None),
        ],
        "id long, text string",
    )
    both = df.select(
        "id",
        extract_emails_col("text").alias("codegen"),
        extract_emails_validated_col("text").alias("seam_default"),
        extract_emails_validated_col("text", fake_dns_resolver).alias("seam_dns"),
    ).collect()
    for r in both:
        assert list(r["seam_default"]) == list(r["codegen"] or [])
    dns = {r["id"]: list(r["seam_dns"]) for r in both}
    assert dns == {1: [], 2: ["info@example.org"], 3: [], 4: []}


def test_make_dns_validator_caches_and_short_circuits(spark):
    """The DNS-shaped validator factory completes the injection contract
    (reference find_email_addresses.py:45-80: parse, then resolve the
    domain, undeliverable -> drop): one resolver call per DISTINCT domain
    (cached), deny-listed pseudo-TLDs never reach the resolver, and the
    validator drops straight into the Arrow-batched extraction column."""
    from data_etl_pipeline_spark.functions.text import (
        extract_emails,
        extract_emails_validated_col,
        make_dns_validator,
    )

    calls: list[str] = []

    def fake_resolve_mx(domain: str) -> bool:
        calls.append(domain)  # deterministic fake: .org domains have MX
        return domain.endswith(".org")

    v = make_dns_validator(fake_resolve_mx)
    text = "a@good.org b@dead.com c@good.org d@logo.png e@also.org"
    assert extract_emails(text, validator=v) == ["a@good.org", "c@good.org", "e@also.org"]
    # one lookup per distinct domain; the deny-listed .png never resolved
    assert sorted(calls) == ["also.org", "dead.com", "good.org"]
    # cache hit: re-validating adds no calls
    assert v("x@good.org") and len(calls) == 3

    # end-to-end through the vectorized seam (fresh validator: the closure
    # pickles into executors, each warming its own per-executor cache)
    df = spark.createDataFrame([(1, text)], "id long, text string")
    out = df.select(
        extract_emails_validated_col("text", make_dns_validator(fake_resolve_mx)).alias("emails")
    ).collect()
    assert list(out[0]["emails"]) == ["a@good.org", "c@good.org", "e@also.org"]


class TestPiiAndRepetition:
    def test_redact_pii_pins_behavior(self, spark):
        from data_etl_pipeline_spark.operators.textstats import redact_pii

        df = spark.createDataFrame(
            [(1, "mail a.b+c@ex.co.uk and x@y.io, call 555-123-4567 or 555-1234-1234 end")],
            "doc_id long, text string",
        )
        r = redact_pii(df).collect()[0]
        assert r["n_emails"] == 2 and r["n_phones"] == 2
        assert "<EMAIL>" in r["redacted_text"] and "<PHONE>" in r["redacted_text"]
        assert "@" not in r["redacted_text"]

    def test_repetition_stats_flags_boilerplate(self, spark):
        from data_etl_pipeline_spark.operators.textstats import repetition_stats

        df = spark.createDataFrame(
            [(1, "spam spam spam spam spam"), (2, "one two three four five six")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
        assert out[1]["top_word_ratio"] == 1.0 and out[1]["top_trigram_ratio"] == 1.0
        assert out[2]["top_word_ratio"] < 0.2
