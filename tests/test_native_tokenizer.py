"""Native C++ tokenizer: fuzz parity against the canonical regex spec."""

import numpy as np
import pytest

from fvta_memexqa_tpu.data.tokenize import tokenize, tokenize_many, try_load_native

native = try_load_native()
needs_native = pytest.mark.skipif(native is None, reason="native tokenizer not built")


@needs_native
class TestNativeParity:
    CASES = [
        "",
        "   ",
        "Hello, World!",
        "don't stop believin'",
        "July 4, 2007 (10:30) -- a.m.!!",
        "a'b'c'd",
        "'leading and trailing'",
        "x" * 500,
        "a  b\t\nc\r d",
        "rock&roll 100% [fun]",
        "it's-a-me",
        "o'' ''o",
    ]

    @pytest.mark.parametrize("text", CASES)
    def test_cases_match_regex(self, text):
        assert native.tokenize(text) == tokenize(text)

    def test_fuzz_ascii(self):
        rng = np.random.default_rng(0)
        # includes control chars: \x1c-\x1f are \s to Python's re, \x00-\x02 are not
        alphabet = list("abcXYZ019 \t'.,!?-_()&/\\\"\x1c\x1d\x1e\x1f\x00\x01\x02")
        for _ in range(300):
            n = int(rng.integers(0, 60))
            s = "".join(rng.choice(alphabet) for _ in range(n))
            assert native.tokenize(s) == tokenize(s), repr(s)

    def test_batch_matches_singles(self):
        texts = self.CASES * 3
        assert native.tokenize_batch(texts) == [tokenize(t) for t in texts]

    def test_tokenize_many_mixed_unicode(self):
        texts = ["ascii only here", "café naïve", "日本語 text", "plain 2007!"]
        assert tokenize_many(texts) == [tokenize(t) for t in texts]

    def test_encoder_matches_python_encode(self):
        """BatchEncoder's native path (tokenize+vocab+char lookup in C++) vs the
        Python path, through the canonical boundary (UNK tokens get PAD chars)."""
        from fvta_memexqa_tpu.data.pack import BatchEncoder, _encode_text
        from fvta_memexqa_tpu.data.vocab import Vocab

        words = ["zebra", "photo", "july", "2007", "don't", "a", "of", ",", "!"]
        vocab = Vocab.build(words * 2, None, dim=4, seed=0)
        enc = BatchEncoder(vocab)
        assert enc._enc is not None, "native encoder should load in this env"
        texts = self.CASES + ["A photo of a ZEBRA, July 2007! Don't miss it."]
        w_n, c_n, m_n = enc.encode(texts, max_len=12, max_word_len=6)
        for i, t in enumerate(texts):
            w_p, c_p, m_p = _encode_text(tokenize(t), vocab, 12, 6)
            np.testing.assert_array_equal(w_n[i], w_p, err_msg=repr(t))
            np.testing.assert_array_equal(c_n[i], c_p, err_msg=repr(t))
            np.testing.assert_array_equal(m_n[i], m_p, err_msg=repr(t))
        # UNK tokens ("miss", "it" are OOV to this vocab) must carry PAD chars
        unk_pos = np.asarray(w_n[-1]) == 1
        assert unk_pos.any()
        assert (np.asarray(c_n[-1])[unk_pos] == 0).all()

    def test_encoder_mixed_unicode_batch(self):
        """A batch with SOME non-ASCII texts must still route the ASCII subset
        through the native encoder (one stray emoji must not demote the whole
        corpus — real Flickr text reliably has some), with output identical to
        the all-Python path."""
        from fvta_memexqa_tpu.data.pack import BatchEncoder, _encode_text
        from fvta_memexqa_tpu.data.vocab import Vocab

        words = ["photo", "of", "zebra", "café", "über"]
        vocab = Vocab.build(words * 2, None, dim=4, seed=0)
        enc = BatchEncoder(vocab)
        assert enc._enc is not None
        texts = ["a photo of zebra", "café über alles ☃", "photo photo",
                 "", "zébra photo"]
        w_n, c_n, m_n = enc.encode(texts, max_len=8, max_word_len=6)
        for i, t in enumerate(texts):
            w_p, c_p, m_p = _encode_text(tokenize(t), vocab, 8, 6)
            c_p = np.asarray(c_p).copy()
            c_p[np.asarray(w_p) == 1] = 0  # canonical UNK-chars boundary
            np.testing.assert_array_equal(w_n[i], w_p, err_msg=repr(t))
            np.testing.assert_array_equal(c_n[i], c_p, err_msg=repr(t))
            np.testing.assert_array_equal(m_n[i], m_p, err_msg=repr(t))

    def test_pack_native_vs_python_identical(self, tmp_path, monkeypatch):
        """Whole-pack parity: FVTA_NO_NATIVE pack must equal native pack bit-wise."""
        from fvta_memexqa_tpu.data import load_pack, make_synthetic, pack
        from fvta_memexqa_tpu.data import tokenize as tok_mod
        from tests.conftest import small_data_config

        args = make_synthetic(seed=0)
        d_native, d_python = str(tmp_path / "n"), str(tmp_path / "p")
        pack(*args, d_native, small_data_config(), seed=0)
        monkeypatch.setenv("FVTA_NO_NATIVE", "1")
        pack(*args, d_python, small_data_config(), seed=0)
        monkeypatch.delenv("FVTA_NO_NATIVE")
        p_n, p_p = load_pack(d_native), load_pack(d_python)
        for k in vars(p_n.shared):
            np.testing.assert_array_equal(
                getattr(p_n.shared, k), getattr(p_p.shared, k), err_msg=k)
        for split in p_n.splits:
            for k in p_n.splits[split]:
                np.testing.assert_array_equal(
                    p_n.splits[split][k], p_p.splits[split][k], err_msg=f"{split}/{k}")

    def test_encode_throughput(self):
        """The id-producing native path must beat the Python packer path
        (this, not string tokenization, is the packer hot loop)."""
        import time

        from fvta_memexqa_tpu.data.pack import _encode_text
        from fvta_memexqa_tpu.data.vocab import Vocab

        corpus = ["a photo of a zebra at the zoo, July 4 2007!"] * 5000
        vocab = Vocab.build(tokenize(corpus[0]) * 3, None, dim=4, seed=0)
        enc = native.NativeEncoder(vocab.word2idx, vocab.char2idx)
        t0 = time.perf_counter()
        for t in corpus:
            _encode_text(tokenize(t), vocab, 12, 8)
        t_py = time.perf_counter() - t0
        t0 = time.perf_counter()
        enc.encode_batch(corpus, 12, 8)
        t_na = time.perf_counter() - t0
        assert t_na < t_py, f"native {t_na:.3f}s vs python {t_py:.3f}s"
