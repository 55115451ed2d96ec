"""Entropy-coder tests: native/python parity, round-trips, artifact streams."""

import numpy as np
import pytest

from neuroquant_tpu.coding import (
    compress_artifact, decode_symbols, decompress_artifact, encode_symbols,
    native_available,
)
from neuroquant_tpu.coding.codec import _py_decode, _py_encode, build_freqs


def _random_codes(rng, n, n_sym, skew=2.0):
    p = rng.rand(n_sym) ** skew
    p /= p.sum()
    return rng.choice(n_sym, size=n, p=p).astype(np.int32)


class TestRangeCoder:
    def test_native_builds(self):
        assert native_available(), "g++ build of range_coder.cpp failed"

    def test_roundtrip_native(self):
        rng = np.random.RandomState(0)
        for n_sym in (4, 16, 64, 256):
            sym = _random_codes(rng, 5000, n_sym)
            freqs = build_freqs(sym, n_sym)
            blob = encode_symbols(sym, freqs)
            back = decode_symbols(blob, freqs, len(sym))
            np.testing.assert_array_equal(back, sym)

    def test_python_fallback_matches_native(self):
        rng = np.random.RandomState(1)
        sym = _random_codes(rng, 800, 16)
        freqs = build_freqs(sym, 16)
        native_blob = encode_symbols(sym, freqs)
        py_blob = _py_encode(sym, freqs)
        assert native_blob == py_blob, "bitstream formats diverged"
        np.testing.assert_array_equal(_py_decode(native_blob, freqs, len(sym)), sym)

    def test_compression_beats_raw_on_skewed_data(self):
        rng = np.random.RandomState(2)
        sym = _random_codes(rng, 20000, 64, skew=8.0)   # heavily skewed
        freqs = build_freqs(sym, 64)
        blob = encode_symbols(sym, freqs)
        raw_bits = 6 * len(sym)
        assert len(blob) * 8 < 0.8 * raw_bits

    def test_near_entropy(self):
        rng = np.random.RandomState(3)
        sym = _random_codes(rng, 50000, 16, skew=4.0)
        freqs = build_freqs(sym, 16)
        p = np.bincount(sym, minlength=16) / len(sym)
        h = -(p[p > 0] * np.log2(p[p > 0])).sum()
        blob = encode_symbols(sym, freqs)
        actual_bits = len(blob) * 8 / len(sym)
        assert actual_bits < h * 1.02 + 0.01, (actual_bits, h)

    def test_single_symbol_degenerate(self):
        sym = np.zeros(100, np.int32)
        freqs = build_freqs(sym, 4)
        blob = encode_symbols(sym, freqs)
        np.testing.assert_array_equal(decode_symbols(blob, freqs, 100), sym)


class TestArtifact:
    def test_artifact_roundtrip(self):
        rng = np.random.RandomState(0)
        codes = {}
        for i, bits in enumerate((2, 4, 6, 8)):
            cout = 8 + i
            codes[f"layer_{i}"] = {
                "w": _random_codes(rng, 3 * 3 * 4 * cout, 1 << bits).reshape(3, 3, 4, cout),
                "b": _random_codes(rng, cout, 1 << bits),
                "bits": bits,
                "w_delta": rng.rand(1, 1, 1, cout).astype(np.float32),
                "w_zp": rng.randint(0, 1 << bits, (1, 1, 1, cout)).astype(np.float32),
                "b_delta": np.float32(0.01),
                "b_zp": np.float32(3.0),
            }
        stream = compress_artifact(codes)
        back = decompress_artifact(stream)
        assert set(back) == set(codes)
        for name in codes:
            np.testing.assert_array_equal(back[name]["w"], codes[name]["w"])
            np.testing.assert_array_equal(back[name]["b"], codes[name]["b"])
            assert back[name]["bits"] == codes[name]["bits"]
