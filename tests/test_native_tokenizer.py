"""Native C++ tokenizer tests: parity with the Python implementation
(reference: src/core/tokenizer tests were never compiled — SURVEY.md §4)."""

import pytest

from deeppowers_tpu.serving.native_tokenizer import (
    CppBPETokenizer,
    CppWordPieceTokenizer,
    native_available,
)
from deeppowers_tpu.serving.tokenizer import BPETokenizer

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="no C++ toolchain")


@pytest.fixture(scope="module")
def trained():
    corpus = ["the cat sat on the mat"] * 20 + ["the dog ran away"] * 10
    return BPETokenizer.train(corpus, vocab_size=300)


def test_bpe_parity_with_python(trained, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("tok") / "bpe.json")
    trained.save(p)
    cpp = CppBPETokenizer(path=p)
    assert cpp.vocab_size == trained.vocab_size
    for text in ["the cat ran", "dogs and cats", "héllo wörld", ""]:
        assert cpp.encode(text) == trained.encode(text), text
        assert cpp.decode(trained.encode(text)) == text


def test_bpe_from_merges(trained):
    cpp = CppBPETokenizer(merges=trained.merges)
    s = "the mat"
    assert cpp.encode(s) == trained.encode(s)


def test_bpe_batch_encode_threaded(trained):
    cpp = CppBPETokenizer(merges=trained.merges)
    texts = [f"the cat number {i}" for i in range(32)]
    batch = cpp.encode_batch(texts, num_threads=4)
    assert batch == [cpp.encode(t) for t in texts]


def test_wordpiece(tmp_path):
    vocab = ["[PAD]", "[EOS]", "[BOS]", "[UNK]", "the", "cat", "##s",
             "run", "##ning"]
    p = str(tmp_path / "vocab.txt")
    with open(p, "w") as f:
        f.write("\n".join(vocab))
    wp = CppWordPieceTokenizer(p, unk_id=3)
    assert wp.vocab_size == len(vocab)
    assert wp.encode("the cats") == [4, 5, 6]
    assert wp.encode("running") == [7, 8]
    assert wp.encode("zzz") == [3]  # UNK
    assert wp.decode([4, 5, 6]) == "the cats"
    assert wp.decode([7, 8]) == "running"
