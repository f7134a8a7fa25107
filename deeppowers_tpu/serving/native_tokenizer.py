"""ctypes binding for the native C++ tokenizer library (native/tokenizer.cpp).

Provides CppBPETokenizer / CppWordPieceTokenizer with the TokenizerBase API.
The library is built on demand with g++ (cached in native/build/); when no
compiler is available the pure-Python implementations in tokenizer.py remain
the fallback. The saved-merges JSON format is shared with BPETokenizer, so a
tokenizer trained in Python serves from C++.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

from .tokenizer import TokenizerBase

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libdptok.so")
_build_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


class NativeUnavailable(RuntimeError):
    pass


def _build_native() -> None:
    """Run make under a cross-process file lock.

    threading.Lock only serializes within one interpreter; pytest-xdist
    workers are separate OS processes and raced make on a cold tree
    (one dlopen'd a half-written .so: "file too short"). The Makefile
    also renames outputs into place atomically, so even an unlocked
    concurrent builder can no longer expose a partial library.
    """
    src = os.path.join(_NATIVE_DIR, "tokenizer.cpp")
    if not os.path.exists(src):
        raise NativeUnavailable(f"source missing: {src}")
    os.makedirs(os.path.join(_NATIVE_DIR, "build"), exist_ok=True)
    lockfile = os.path.join(_NATIVE_DIR, "build", ".build.lock")
    try:
        import fcntl
        fd = os.open(lockfile, os.O_CREAT | os.O_RDWR)
    except (OSError, ImportError):   # no flock / no fcntl (non-POSIX):
        fcntl = None                 # proceed unlocked — the Makefile's
        fd = None                    # atomic rename still prevents torn .so
    try:
        if fd is not None:
            fcntl.flock(fd, fcntl.LOCK_EX)
        if os.path.exists(_LIB_PATH):     # another process built it
            return
        subprocess.run(["make", "-C", _NATIVE_DIR],
                       check=True, capture_output=True, timeout=120)
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired) as e:
        detail = getattr(e, "stderr", b"") or b""
        raise NativeUnavailable(
            f"native build failed: {detail.decode()[:500]}") from e
    finally:
        if fd is not None:
            os.close(fd)


def _load_library() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    with _build_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH):
            _build_native()
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            # stale/corrupt artifact (e.g. a killed build from an older,
            # non-atomic Makefile): rebuild once, then give up gracefully
            try:
                os.remove(_LIB_PATH)
            except OSError:
                pass
            _build_native()
            try:
                lib = ctypes.CDLL(_LIB_PATH)
            except OSError as e:
                raise NativeUnavailable(f"dlopen failed: {e}") from e
        lib.dptok_create_bpe_from_file.restype = ctypes.c_void_p
        lib.dptok_create_bpe_from_file.argtypes = [ctypes.c_char_p]
        lib.dptok_create_bpe.restype = ctypes.c_void_p
        lib.dptok_create_bpe.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
        lib.dptok_create_wordpiece_from_file.restype = ctypes.c_void_p
        lib.dptok_create_wordpiece_from_file.argtypes = [
            ctypes.c_char_p, ctypes.c_int]
        lib.dptok_destroy.argtypes = [ctypes.c_void_p]
        lib.dptok_vocab_size.restype = ctypes.c_int
        lib.dptok_vocab_size.argtypes = [ctypes.c_void_p]
        lib.dptok_encode.restype = ctypes.c_int
        lib.dptok_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
        lib.dptok_decode.restype = ctypes.c_int
        lib.dptok_decode.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int]
        lib.dptok_encode_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
        lib.dptok_train_bpe.restype = ctypes.c_void_p
        lib.dptok_train_bpe.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        lib.dptok_train_wordpiece.restype = ctypes.c_void_p
        lib.dptok_train_wordpiece.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        lib.dptok_save.restype = ctypes.c_int
        lib.dptok_save.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        _lib = lib
        return lib


class _NativeTokenizer(TokenizerBase):
    """Shared encode/decode plumbing over a dptok handle."""

    def __init__(self, handle: int):
        if not handle:
            raise NativeUnavailable("failed to construct native tokenizer")
        self._h = ctypes.c_void_p(handle)
        self._lib = _load_library()

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.dptok_destroy(self._h)
        except Exception:
            pass

    @property
    def vocab_size(self) -> int:
        return self._lib.dptok_vocab_size(self._h)

    def encode(self, text: str) -> List[int]:
        data = text.encode("utf-8")
        cap = max(16, len(data) * 2)
        while True:
            buf = (ctypes.c_int32 * cap)()
            n = self._lib.dptok_encode(self._h, data, buf, cap)
            if n <= cap:
                return list(buf[:n])
            cap = n

    def decode(self, ids: Sequence[int]) -> str:
        arr = (ctypes.c_int32 * len(ids))(*ids)
        cap = max(16, len(ids) * 8)
        while True:
            buf = ctypes.create_string_buffer(cap)
            n = self._lib.dptok_decode(self._h, arr, len(ids), buf, cap)
            if n <= cap:
                return buf.raw[:n].decode("utf-8", errors="replace")
            cap = n

    def encode_batch(self, texts: Sequence[str],
                     num_threads: int = 4) -> List[List[int]]:
        """Threaded batch encode in C++ (reference: encode_batch_parallel,
        tokenizer.hpp:63-71)."""
        if not texts:
            return []
        datas = [t.encode("utf-8") for t in texts]
        cap = max(16, max(len(d) for d in datas) * 2)
        n = len(texts)
        c_texts = (ctypes.c_char_p * n)(*datas)
        out = np.zeros((n, cap), dtype=np.int32)
        counts = np.zeros((n,), dtype=np.int32)
        self._lib.dptok_encode_batch(
            self._h, c_texts, n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap,
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            num_threads)
        if (counts > cap).any():       # rare overflow: redo serially
            return [self.encode(t) for t in texts]
        return [out[i, :counts[i]].tolist() for i in range(n)]


def _c_corpus(texts: Sequence[str]):
    datas = [t.encode("utf-8") for t in texts]
    return (ctypes.c_char_p * len(datas))(*datas), len(datas)


class CppBPETokenizer(_NativeTokenizer):
    """Native byte-level BPE (reference: bpe.cpp)."""

    def __init__(self, path: Optional[str] = None,
                 merges: Optional[Sequence] = None,
                 _handle: Optional[int] = None):
        lib = _load_library()
        if _handle is not None:
            handle = _handle
        elif path is not None:
            handle = lib.dptok_create_bpe_from_file(path.encode())
        else:
            merges = merges or []
            flat = (ctypes.c_int32 * (2 * len(merges)))(
                *[x for pair in merges for x in pair])
            handle = lib.dptok_create_bpe(flat, len(merges))
        super().__init__(handle)

    @classmethod
    def train(cls, corpus: Sequence[str], vocab_size: int = 1000,
              min_freq: int = 2) -> "CppBPETokenizer":
        """Train in C++ (reference: tokenizer.hpp:41-47 train; same merge
        semantics as the Python BPETokenizer.train — interchangeable saved
        formats)."""
        lib = _load_library()
        arr, n = _c_corpus(corpus)
        return cls(_handle=lib.dptok_train_bpe(arr, n, vocab_size, min_freq))

    def save(self, path: str) -> None:
        """Write the shared merges JSON (loadable by Python BPETokenizer
        and dptok_create_bpe_from_file)."""
        if self._lib.dptok_save(self._h, path.encode()):
            raise IOError(f"native save failed: {path}")


class CppWordPieceTokenizer(_NativeTokenizer):
    """Native WordPiece (reference: wordpiece.cpp — ## continuation,
    longest-match)."""

    def __init__(self, vocab_path: Optional[str] = None, unk_id: int = 3,
                 _handle: Optional[int] = None):
        lib = _load_library()
        if _handle is not None:
            handle = _handle
        else:
            handle = lib.dptok_create_wordpiece_from_file(
                vocab_path.encode(), unk_id)
        super().__init__(handle)
        self.unk_token_id = unk_id

    @classmethod
    def train(cls, corpus: Sequence[str], vocab_size: int = 1000,
              unk_id: int = 1) -> "CppWordPieceTokenizer":
        """WordPiece likelihood training in C++ (merge maximizing
        freq(ab)/(freq(a)*freq(b)); [PAD]/[UNK]/[CLS]/[SEP]/[MASK] head the
        vocab, BERT convention)."""
        lib = _load_library()
        arr, n = _c_corpus(corpus)
        return cls(_handle=lib.dptok_train_wordpiece(arr, n, vocab_size,
                                                     unk_id), unk_id=unk_id)

    def save(self, path: str) -> None:
        """Write vocab.txt, one token per line (BERT convention)."""
        if self._lib.dptok_save(self._h, path.encode()):
            raise IOError(f"native save failed: {path}")


def native_available() -> bool:
    try:
        _load_library()
        return True
    except NativeUnavailable:
        return False
