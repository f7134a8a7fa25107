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


class TestNativeTraining:
    """C++ tokenizer training (VERDICT round 1 missing #8; reference:
    tokenizer.hpp:41-47 train/save/load)."""

    CORPUS = ["the cat sat on the mat", "the dog sat on the log",
              "the cat and the dog", "a cat a dog a log a mat"] * 4

    def test_bpe_train_matches_python(self, tmp_path):
        pytest.importorskip("ctypes")
        from deeppowers_tpu.serving.native_tokenizer import (
            CppBPETokenizer, native_available)
        from deeppowers_tpu.serving.tokenizer import BPETokenizer
        if not native_available():
            pytest.skip("no native toolchain")
        cpp = CppBPETokenizer.train(self.CORPUS, vocab_size=300)
        py = BPETokenizer.train(self.CORPUS, vocab_size=300)
        assert cpp.vocab_size == py.vocab_size
        # same most-frequent-pair objective; tie-breaking differs (Python
        # Counter keeps insertion order), so assert equivalent COMPRESSION
        # and exact round-trips rather than identical ids
        for text in ("the cat sat", "a dog on a log", "unseen words here"):
            assert abs(len(cpp.encode(text)) - len(py.encode(text))) <= 2
            assert len(cpp.encode(text)) <= len(text.encode())
            assert cpp.decode(cpp.encode(text)) == text

    def test_bpe_save_interop(self, tmp_path):
        from deeppowers_tpu.serving.native_tokenizer import (
            CppBPETokenizer, native_available)
        from deeppowers_tpu.serving.tokenizer import BPETokenizer
        if not native_available():
            pytest.skip("no native toolchain")
        cpp = CppBPETokenizer.train(self.CORPUS, vocab_size=280)
        p = str(tmp_path / "bpe.json")
        cpp.save(p)
        # the saved JSON loads in BOTH implementations
        py = BPETokenizer.load(p)
        cpp2 = CppBPETokenizer(path=p)
        for text in ("the cat", "dog log"):
            assert py.encode(text) == cpp.encode(text)
            assert cpp2.encode(text) == cpp.encode(text)

    def test_wordpiece_train_save_load(self, tmp_path):
        from deeppowers_tpu.serving.native_tokenizer import (
            CppWordPieceTokenizer, native_available)
        if not native_available():
            pytest.skip("no native toolchain")
        wp = CppWordPieceTokenizer.train(self.CORPUS, vocab_size=80)
        assert wp.vocab_size <= 81
        ids = wp.encode("the cat sat")
        assert ids and wp.unk_token_id not in ids
        assert wp.decode(ids) == "the cat sat"
        # unknown word -> UNK
        ids2 = wp.encode("zzzqqq")
        assert ids2 == [wp.unk_token_id]
        p = str(tmp_path / "vocab.txt")
        wp.save(p)
        wp2 = CppWordPieceTokenizer(p, unk_id=1)
        assert wp2.encode("the cat sat") == ids
