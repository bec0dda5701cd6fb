"""ctypes bindings to the native data runtime (libreftr_data.so).

Builds the shared library lazily via the csrc Makefile the first time it is
needed (g++ is part of the toolchain; no pip deps). All functions have pure
numpy signatures.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libreftr_data.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    subprocess.run(["make", "-C", _CSRC, "-s"], check=True)


def get_lib() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        srcs = [os.path.join(_CSRC, f) for f in os.listdir(_CSRC)
                if f.endswith(".cpp")]
        if not os.path.exists(_LIB_PATH) or any(
            os.path.getmtime(s) > os.path.getmtime(_LIB_PATH) for s in srcs
        ):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
        # --- tokenizer ---
        lib.rtok_create.restype = ctypes.c_void_p
        lib.rtok_create.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.rtok_free.argtypes = [ctypes.c_void_p]
        lib.rtok_vocab_size.restype = ctypes.c_int
        lib.rtok_vocab_size.argtypes = [ctypes.c_void_p]
        lib.rtok_token_id.restype = ctypes.c_int
        lib.rtok_token_id.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.rtok_encode.restype = ctypes.c_int
        lib.rtok_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32)]
        # --- image ops ---
        lib.rimg_resize_bilinear.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.c_int]
        lib.rimg_hsv_jitter.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float]
        lib.rimg_pack_canvas.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int]
        # --- lsap ---
        lib.lsap_solve.restype = ctypes.c_int
        lib.lsap_solve.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
        return lib


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def resize_bilinear(img: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    """Antialiased bilinear resize (Pillow-equivalent). img: [H,W,C] uint8."""
    lib = get_lib()
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    oh, ow = out_hw
    out = np.empty((oh, ow, c), np.uint8)
    lib.rimg_resize_bilinear(_u8ptr(img), h, w, c, _u8ptr(out), oh, ow)
    return out


def hsv_jitter(img: np.ndarray, s_factor: float, v_factor: float) -> np.ndarray:
    """In-place-free S/V jitter; img: [H,W,3] uint8 RGB."""
    lib = get_lib()
    out = np.ascontiguousarray(img, dtype=np.uint8).copy()
    h, w, _ = out.shape
    lib.rimg_hsv_jitter(_u8ptr(out), h, w, float(s_factor), float(v_factor))
    return out


def pack_canvas(img: np.ndarray, canvas_hw: Tuple[int, int]) -> np.ndarray:
    """Paste [h,w,3] uint8 at the canvas top-left, zero-fill the rest."""
    lib = get_lib()
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    ch, cw = canvas_hw
    assert h <= ch and w <= cw, (img.shape, canvas_hw)
    out = np.empty((ch, cw, 3), np.uint8)
    lib.rimg_pack_canvas(_u8ptr(img), h, w, _u8ptr(out), ch, cw)
    return out


def lsap(cost: np.ndarray) -> np.ndarray:
    """Min-cost assignment; cost [n, m] with n <= m. Returns col index per
    row (like scipy.optimize.linear_sum_assignment's col_ind for sorted
    rows)."""
    lib = get_lib()
    cost = np.ascontiguousarray(cost, dtype=np.float64)
    n, m = cost.shape
    out = np.empty(n, np.int32)
    rc = lib.lsap_solve(
        cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n, m,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if rc != 0:
        raise ValueError(f"lsap_solve failed (n={n}, m={m}; need n <= m)")
    return out


class WordPieceTokenizer:
    """BERT WordPiece tokenizer with char->token offset mapping.

    Drop-in for the parts of HF fast tokenizers the reference consumes:
    encode with [CLS]/[SEP], pad/truncate to max_length, and
    char_to_token (refer_dataset.py:160-171).
    """

    def __init__(self, vocab_path: str, do_lower_case: bool = True):
        lib = get_lib()
        self._lib = lib
        self._h = lib.rtok_create(vocab_path.encode(), int(do_lower_case))
        if not self._h:
            raise FileNotFoundError(vocab_path)
        self.pad_id = lib.rtok_token_id(self._h, b"[PAD]")
        self.cls_id = lib.rtok_token_id(self._h, b"[CLS]")
        self.sep_id = lib.rtok_token_id(self._h, b"[SEP]")
        self.unk_id = lib.rtok_token_id(self._h, b"[UNK]")

    def __del__(self):
        if getattr(self, "_h", None) and self._lib is not None:
            self._lib.rtok_free(self._h)
            self._h = None

    @property
    def vocab_size(self) -> int:
        return self._lib.rtok_vocab_size(self._h)

    def token_id(self, token: str) -> int:
        return self._lib.rtok_token_id(self._h, token.encode())

    def encode(self, text: str, max_length: int, pad: bool = True):
        """Returns (ids [max_length] i32, attention_mask [max_length] i32,
        offsets [max_length, 2] i32)."""
        cap = max(max_length, 4)
        ids = np.zeros(cap, np.int32)
        st = np.zeros(cap, np.int32)
        en = np.zeros(cap, np.int32)
        n = self._lib.rtok_encode(
            self._h, text.encode(), 1, max_length,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            st.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            en.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        mask = np.zeros(max_length, np.int32)
        mask[:n] = 1
        out_ids = np.full(max_length, self.pad_id, np.int32)
        out_ids[:n] = ids[:n]
        offsets = np.zeros((max_length, 2), np.int32)
        offsets[:n, 0] = st[:n]
        offsets[:n, 1] = en[:n]
        if not pad:
            return out_ids[:n], mask[:n], offsets[:n]
        return out_ids, mask, offsets

    @staticmethod
    def char_to_token(offsets: np.ndarray, mask: np.ndarray,
                      char_pos: int) -> Optional[int]:
        """Token index whose original-char span contains char_pos (special
        tokens have (0,0) spans and never match), or None — the HF fast
        tokenizer behavior the reference relies on."""
        for i in range(len(offsets)):
            if not mask[i]:
                break
            s, e = int(offsets[i, 0]), int(offsets[i, 1])
            if s == e:
                continue  # special token
            if s <= char_pos < e:
                return i
        return None


class ByteLevelBPETokenizer:
    """RoBERTa-style byte-level BPE with char->token offsets.

    Loads standard vocab.json + merges.txt. Same surface as
    WordPieceTokenizer (encode with specials, pad/truncate, char_to_token).
    """

    def __init__(self, vocab_json: str, merges_txt: str):
        lib = get_lib()
        self._lib = lib
        lib.rbpe_create.restype = ctypes.c_void_p
        lib.rbpe_create.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.rbpe_free.argtypes = [ctypes.c_void_p]
        lib.rbpe_vocab_size.restype = ctypes.c_int
        lib.rbpe_vocab_size.argtypes = [ctypes.c_void_p]
        for f in ("rbpe_pad_id", "rbpe_bos_id", "rbpe_eos_id"):
            getattr(lib, f).restype = ctypes.c_int
            getattr(lib, f).argtypes = [ctypes.c_void_p]
        lib.rbpe_encode.restype = ctypes.c_int
        lib.rbpe_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32)]
        self._h = lib.rbpe_create(vocab_json.encode(), merges_txt.encode())
        if not self._h:
            raise FileNotFoundError((vocab_json, merges_txt))
        self.pad_id = lib.rbpe_pad_id(self._h)
        self.cls_id = lib.rbpe_bos_id(self._h)  # <s>
        self.sep_id = lib.rbpe_eos_id(self._h)  # </s>

    def __del__(self):
        if getattr(self, "_h", None) and self._lib is not None:
            self._lib.rbpe_free(self._h)
            self._h = None

    @property
    def vocab_size(self) -> int:
        return self._lib.rbpe_vocab_size(self._h)

    def encode(self, text: str, max_length: int, pad: bool = True):
        cap = max(max_length, 4)
        ids = np.zeros(cap, np.int32)
        st = np.zeros(cap, np.int32)
        en = np.zeros(cap, np.int32)
        n = self._lib.rbpe_encode(
            self._h, text.encode(), 1, max_length,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            st.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            en.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        mask = np.zeros(max_length, np.int32)
        mask[:n] = 1
        out_ids = np.full(max_length, self.pad_id, np.int32)
        out_ids[:n] = ids[:n]
        offsets = np.zeros((max_length, 2), np.int32)
        offsets[:n, 0] = st[:n]
        offsets[:n, 1] = en[:n]
        if not pad:
            return out_ids[:n], mask[:n], offsets[:n]
        return out_ids, mask, offsets

    char_to_token = staticmethod(WordPieceTokenizer.char_to_token)
