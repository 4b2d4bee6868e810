"""Native C++ byte-level BPE tokenizer vs the HF `tokenizers` oracle.

The serving path tokenizes in native code (native/bpe_tokenizer.cpp); this
pins byte-for-byte parity with a trained `tokenizers` ByteLevel BPE on
ASCII input — the documented exactness domain (`encodes_exactly`)."""

import json

import pytest

from intel_extension_for_transformers_tpu.native import (
    BPETokenizerNative,
    bpe_available,
)

tokenizers = pytest.importorskip("tokenizers")

CORPUS = [
    "The quick brown fox jumps over the lazy dog.",
    "I don't think it'll rain today, but we've packed umbrellas.",
    "In 2024, TPU v5e chips shipped with 16 GB of HBM each!",
    "def tokenize(text):\n    return text.split()  # naive",
    "Prices: $12.50, $3.99 and $1,024.00 -- what a deal?!",
    "she said 'hello' and then... nothing happened",
    "multiple   spaces    and\ttabs\nnewlines everywhere",
] * 20


@pytest.fixture(scope="module")
def trained():
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers

    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(
        add_prefix_space=False, use_regex=True
    )
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=400,
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        special_tokens=[],
        show_progress=False,
    )
    tok.train_from_iterator(CORPUS, trainer)
    assert bpe_available(), "native BPE failed to build"
    native = BPETokenizerNative.from_tokenizer_json(json.loads(tok.to_str()))
    return tok, native


CASES = [
    "The quick brown fox jumps over the lazy dog.",
    "I don't think it'll rain, we've been told it's fine.",
    "numbers 123 and 4567, price $9.99!",
    "trailing spaces   ",
    "   leading spaces",
    "a  b   c    d",
    "line\nbreaks\n\nand\ttabs",
    "punctuation?! (lots) [of] {it} -- yes...",
    "x",
    "",
    " ",
    "don't you'd we're they've she'll I'm",
    "UPPER lower MiXeD case WORDS",
]


def test_native_bpe_matches_tokenizers_on_ascii(trained):
    tok, native = trained
    for text in CASES:
        assert BPETokenizerNative.encodes_exactly(text)
        ref = tok.encode(text).ids
        got = native.encode(text)
        assert got == ref, (text, got, ref)


def test_native_bpe_decode_round_trip(trained):
    tok, native = trained
    for text in CASES:
        ids = native.encode(text)
        assert native.decode(ids) == text
        # and decodes the oracle's ids identically
        assert native.decode(tok.encode(text).ids) == text


def test_native_bpe_exactness_gate():
    assert BPETokenizerNative.encodes_exactly("plain ascii 123")
    assert not BPETokenizerNative.encodes_exactly("café")


def test_hybrid_tokenizer_fast_path(trained):
    """HybridBPETokenizer: native activates for ByteLevel BPE, encodes
    ASCII identically to the HF path, skips specials on decode, and falls
    back on non-ASCII."""
    transformers = pytest.importorskip("transformers")
    tok, _ = trained

    from intel_extension_for_transformers_tpu.models.tokenization import (
        HybridBPETokenizer,
    )

    fast = transformers.PreTrainedTokenizerFast(tokenizer_object=tok)
    hy = HybridBPETokenizer(fast)
    assert hy.native_active
    for text in CASES:
        assert hy.encode(text) == fast.encode(text), text
        assert hy.decode(hy.encode(text)) == text
    # non-ASCII routes to HF (identical result, no crash)
    s = "café costs €5"
    assert hy.encode(s) == fast.encode(s)


def test_hybrid_tokenizer_falls_back_for_non_bpe():
    from intel_extension_for_transformers_tpu.models.tokenization import (
        ByteTokenizer,
        HybridBPETokenizer,
    )

    hy = HybridBPETokenizer(ByteTokenizer())  # no tokenizer.json surface
    assert not hy.native_active
    assert hy.encode("abc") == ByteTokenizer().encode("abc")
