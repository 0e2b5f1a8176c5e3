"""Property tests for the round-5 codecs and operators (Hypothesis)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from data_etl_pipeline_spark.operators.qsketch import _BUCKET_EXPR  # noqa: F401 (import check)
from data_etl_pipeline_spark.sources.delta_reader import (
    decode_inline_dv,
    decode_rba,
    encode_inline_dv,
    encode_rba,
    z85_decode,
    z85_encode,
)


class TestZ85Properties:
    @given(st.binary(min_size=0, max_size=256).filter(lambda b: len(b) % 4 == 0))
    @settings(max_examples=200, deadline=None)
    def test_roundtrip(self, data):
        assert z85_decode(z85_encode(data)) == data

    @given(st.binary(min_size=1, max_size=64).filter(lambda b: len(b) % 4 != 0))
    @settings(max_examples=50, deadline=None)
    def test_misaligned_input_refused(self, data):
        import pytest

        with pytest.raises(ValueError, match="multiple of 4"):
            z85_encode(data)


# index sets bounded so no 16-bit container exceeds the encoder's 4096
# array-container limit: draw few values over a wide domain
_idx_sets = st.lists(
    st.one_of(
        st.integers(min_value=0, max_value=2**16),          # around container 0
        st.integers(min_value=2**16 - 2, max_value=2**17),  # container boundary
        st.integers(min_value=2**32 - 3, max_value=2**32 + 3),  # hi-bits boundary
        st.integers(min_value=0, max_value=2**40),          # sparse wide
    ),
    min_size=0,
    max_size=500,
)


class TestRoaringProperties:
    @given(_idx_sets)
    @settings(max_examples=150, deadline=None)
    def test_rba_roundtrip_sorted_unique(self, idxs):
        data = encode_rba(idxs)
        assert decode_rba(data) == sorted(set(idxs))

    @given(_idx_sets)
    @settings(max_examples=100, deadline=None)
    def test_inline_dv_contract(self, idxs):
        dv = encode_inline_dv(idxs)
        assert dv["cardinality"] == len(set(idxs))
        assert dv["storageType"] == "i"
        assert len(dv["pathOrInlineDv"]) % 5 == 0  # Z85-aligned
        assert decode_inline_dv(dv["pathOrInlineDv"]) == sorted(set(idxs))


def _bucket_of(cents: int) -> tuple[int, int]:
    """Pure-python mirror of _BUCKET_EXPR for property checking."""
    if cents <= 0:
        return (0, 1)
    if cents < 10:
        return (cents, 1)
    s = str(cents)
    return (int(s[:2] + "0" * (len(s) - 2)), int("1" + "0" * (len(s) - 2)))


class TestQSketchBinning:
    @given(st.integers(min_value=-10**6, max_value=10**15))
    @settings(max_examples=300, deadline=None)
    def test_bucket_contains_value_and_bounds_error(self, cents):
        lo, width = _bucket_of(cents)
        if cents <= 0:
            assert (lo, width) == (0, 1)
        else:
            assert lo <= cents < lo + width
            # relative error of the midpoint representative <= width/lo <= 1/10
            if cents >= 10:
                assert width * 10 <= lo + width  # width <= ~lo/10 + rounding
    @given(st.lists(st.integers(min_value=1, max_value=10**9), min_size=1, max_size=200))
    @settings(max_examples=100, deadline=None)
    def test_bucket_count_bounded(self, vals):
        buckets = {_bucket_of(v) for v in vals}
        assert len(buckets) <= 90 * 10  # 90/decade, <= 10 decades here
