"""ctypes bindings for the native host tokenizer (libtdrtok.so).

Builds lazily with ``make`` on first use; callers should catch
``NativeUnavailable`` and fall back to the pure-Python pipeline.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libtdrtok.so")


class NativeUnavailable(RuntimeError):
    pass


class _TdrResult(ctypes.Structure):
    _fields_ = [
        ("token_ids", ctypes.POINTER(ctypes.c_int32)),
        ("doc_offsets", ctypes.POINTER(ctypes.c_int64)),
        ("vocab_blob", ctypes.POINTER(ctypes.c_char)),
        ("n_tokens", ctypes.c_int64),
        ("n_docs", ctypes.c_int64),
        ("vocab_blob_len", ctypes.c_int64),
        ("vocab_size", ctypes.c_int32),
    ]


_lib: Optional[ctypes.CDLL] = None


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_DIR, "tokenizer.cc")
    stale = (not os.path.exists(_SO)
             or (os.path.exists(src)
                 and os.path.getmtime(src) > os.path.getmtime(_SO)))
    if stale:
        try:
            subprocess.run(["make", "-B", "-C", _DIR], check=True,
                           capture_output=True, timeout=120)
        except (subprocess.SubprocessError, OSError) as e:
            raise NativeUnavailable(f"native tokenizer build failed: {e}")
    try:
        lib = ctypes.CDLL(_SO)
    except OSError as e:
        raise NativeUnavailable(f"cannot load {_SO}: {e}")
    lib.tdr_tokenize_batch.restype = ctypes.POINTER(_TdrResult)
    lib.tdr_tokenize_batch.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_char_p,
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32,
    ]
    lib.tdr_free_result.argtypes = [ctypes.POINTER(_TdrResult)]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except NativeUnavailable:
        return False


def tokenize_batch(
    texts: Sequence[str],
    lang_modes: Sequence[str],       # per doc: "l" latin, "a" arabic, "k" korean
    stopwords: Sequence[str],
    ko_suffixes: Sequence[str],
    emit_particles: bool = True,
    min_len_latin: int = 2,
) -> Tuple[np.ndarray, np.ndarray, List[str]]:
    """→ (raw token ids (n_tokens,), doc_offsets (n_docs+1,), raw vocab).

    Raw vocab terms are pre-normalization (no stem/lemma); the caller maps
    unique raw terms through the normalizer and re-ids.
    """
    lib = _load()
    blob = "\x00".join([]).encode()  # placeholder
    encoded = [t.encode("utf-8") for t in texts]
    offsets = np.zeros(len(texts) + 1, np.int64)
    for i, e in enumerate(encoded):
        offsets[i + 1] = offsets[i] + len(e)
    text_blob = b"".join(encoded)
    lang_blob = "".join(lang_modes).encode("ascii")
    sw_blob = "\n".join(stopwords).encode("utf-8")
    suf_blob = "\n".join(ko_suffixes).encode("utf-8")

    res = lib.tdr_tokenize_batch(
        text_blob, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(texts), lang_blob, sw_blob, len(sw_blob), suf_blob, len(suf_blob),
        1 if emit_particles else 0, min_len_latin,
    )
    try:
        r = res.contents
        n_tok = int(r.n_tokens)
        token_ids = np.ctypeslib.as_array(r.token_ids, shape=(max(n_tok, 1),))[:n_tok].copy()
        doc_offsets = np.ctypeslib.as_array(r.doc_offsets, shape=(len(texts) + 1,)).copy()
        vocab_bytes = ctypes.string_at(r.vocab_blob, r.vocab_blob_len)
        vocab = vocab_bytes.decode("utf-8").split("\n")[: r.vocab_size]
        return token_ids, doc_offsets, vocab
    finally:
        lib.tdr_free_result(res)
