"""Property-based tests (hypothesis) for the pure-Python kernel.

These pin down the invariants the distributed pipeline leans on: the
normalizer is idempotent and its Arrow twin is element-wise identical, the
extraction kernel is deterministic and schema-stable on arbitrary input,
the similarity ensemble is symmetric and bounded, and the codecs roundtrip.
No Ray — everything here runs in-process.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ai_bangladesh_address_parser_ray import COMPONENT_FIELDS
from ai_bangladesh_address_parser_ray.kernel.compare import (
    jaro_winkler, levenshtein, score_pair, token_jaccard,
)
from ai_bangladesh_address_parser_ray.kernel.extract import extract
from ai_bangladesh_address_parser_ray.kernel.normalizer import (
    normalize, normalize_array,
)
from ai_bangladesh_address_parser_ray.kernel.phonetic import (
    minhash_band_keys, soundex,
)

# address-ish alphabet: Latin, digits, Bangla letters + numerals, and the
# punctuation the normalizer rewrites
_TEXT = st.text(
    alphabet=st.sampled_from(
        list("abcdefghijklmnopqrstuvwxyz"
             "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 ,-/#:.'\"()+&")
        + list("০১২৩৪৫৬৭৮৯")
        + list("বাড়িরোডগুলশানঢাকামিরপুর")),
    max_size=120)


class TestNormalizerProperties:
    @given(_TEXT)
    @settings(max_examples=200, deadline=None)
    def test_idempotent(self, t):
        once = normalize(t)
        assert normalize(once) == once

    @given(st.lists(_TEXT, max_size=20))
    @settings(max_examples=50, deadline=None)
    def test_vectorized_twin_elementwise(self, ts):
        import pyarrow as pa
        got = normalize_array(pa.array(ts, pa.string())).to_pylist()
        assert got == [normalize(t) for t in ts]

    @given(_TEXT)
    @settings(max_examples=200, deadline=None)
    def test_no_bangla_digits_survive(self, t):
        assert not set(normalize(t)) & set("০১২৩৪৫৬৭৮৯")


class TestExtractProperties:
    @given(_TEXT)
    @settings(max_examples=150, deadline=None)
    def test_deterministic_and_schema_stable(self, t):
        a = extract(t)
        b = extract(t)
        assert a == b
        assert set(a["components"]) == set(COMPONENT_FIELDS)
        assert all(isinstance(v, str) for v in a["components"].values())
        assert 0.0 <= a["overall_confidence"] <= 1.0

    @given(_TEXT)
    @settings(max_examples=150, deadline=None)
    def test_postal_always_4_digit_or_empty(self, t):
        p = extract(t)["components"]["postal_code"]
        assert p == "" or (len(p) == 4 and p.isdigit())


class TestCompareProperties:
    @given(_TEXT, _TEXT)
    @settings(max_examples=200, deadline=None)
    def test_similarity_symmetric_bounded(self, a, b):
        for fn in (jaro_winkler, token_jaccard):
            s_ab, s_ba = fn(a, b), fn(b, a)
            assert abs(s_ab - s_ba) < 1e-12
            assert 0.0 <= s_ab <= 1.0
        assert levenshtein(a, b) == levenshtein(b, a)

    @given(_TEXT)
    @settings(max_examples=100, deadline=None)
    def test_self_similarity_is_one(self, a):
        if a:
            assert jaro_winkler(a, a) == 1.0
            assert levenshtein(a, a) == 0

    @given(_TEXT, _TEXT)
    @settings(max_examples=100, deadline=None)
    def test_score_pair_symmetric(self, a, b):
        ca = extract(normalize(a))["components"]
        cb = extract(normalize(b))["components"]
        ab, ba = score_pair(ca, cb), score_pair(cb, ca)
        assert abs(ab["score"] - ba["score"]) < 1e-12
        assert ab["match"] == ba["match"]


class TestPhoneticProperties:
    @given(st.text(alphabet=st.characters(codec="ascii"), max_size=40))
    @settings(max_examples=200, deadline=None)
    def test_soundex_shape(self, t):
        s = soundex(t)
        assert len(s) == 4
        assert s == "0000" or (s[0].isalpha() and s[1:].isdigit())

    @given(_TEXT)
    @settings(max_examples=100, deadline=None)
    def test_minhash_bands_deterministic(self, t):
        assert minhash_band_keys(t) == minhash_band_keys(t)


class TestCodecProperties:
    @given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**32 - 1))
    @settings(max_examples=100, deadline=None)
    def test_netpbm_roundtrip(self, w, h, seed):
        from ai_bangladesh_address_parser_ray.functions.multimodal import (
            decode_netpbm, encode_netpbm, nn_resize,
        )
        rng = np.random.RandomState(seed)
        img = rng.randint(0, 256, (h, w), dtype=np.uint8)
        np.testing.assert_array_equal(decode_netpbm(encode_netpbm(img)), img)
        out = nn_resize(img, 7, 5)
        assert out.shape == (5, 7)
        # resize output only contains source pixels
        assert set(np.unique(out)) <= set(np.unique(img))
