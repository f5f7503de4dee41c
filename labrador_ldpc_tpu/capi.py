"""ctypes bindings for the native scalar codec (native/liblabrador_ldpc.so).

The framework's counterpart of the reference crate's C FFI consumer path
(reference: capi/src/lib.rs, capi/include/labrador_ldpc.h): a C-callable
host codec for single-codeword use and differential testing against the
TPU batch engines. The library is built on demand with g++ if missing
(`make -C native` for manual builds).

Usage:
    from labrador_ldpc_tpu import capi
    cw = capi.copy_encode("TC128", data_bytes)         # np.uint8 (n/8,)
    ok, iters, out = capi.decode_ms("TC128", llrs_f32) # np.float32 (n,)
"""

from __future__ import annotations

import ctypes
import subprocess
from functools import lru_cache
from pathlib import Path

import numpy as np

from .codes.params import LDPCCode, get_code

__all__ = [
    "lib",
    "encode",
    "copy_encode",
    "decode_bf",
    "decode_ms",
    "hard_to_llrs",
    "llrs_to_hard",
]

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "liblabrador_ldpc.so"

_CODE_INDEX = {c: i for i, c in enumerate(LDPCCode)}

_MS_TYPES = {
    np.dtype(np.int8): ("i8", ctypes.c_int8),
    np.dtype(np.int16): ("i16", ctypes.c_int16),
    np.dtype(np.float32): ("f32", ctypes.c_float),
    np.dtype(np.float64): ("f64", ctypes.c_double),
}


def _build() -> None:
    inc = _NATIVE_DIR / "constants_data.inc"
    if not inc.exists():
        subprocess.run(
            ["python", str(_NATIVE_DIR / "gen_constants.py")],
            check=True,
            cwd=_NATIVE_DIR.parent,
        )
    subprocess.run(
        [
            "g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-fno-exceptions",
            "-o", str(_LIB_PATH), str(_NATIVE_DIR / "labrador_ldpc.cpp"),
        ],
        check=True,
        cwd=_NATIVE_DIR,
    )


@lru_cache(maxsize=1)
def _load() -> ctypes.CDLL:
    if not _LIB_PATH.exists():
        _build()
    l = ctypes.CDLL(str(_LIB_PATH))
    for name in (
        "code_n", "code_k", "punctured_bits", "paritycheck_sum",
        "bf_working_len", "ms_working_len", "ms_working_u8_len", "output_len",
    ):
        fn = getattr(l, f"labrador_ldpc_{name}")
        fn.restype = ctypes.c_size_t
        fn.argtypes = [ctypes.c_int]

    # Full restype/argtypes for every entry point: the decoders return C++
    # bool and take size_t/pointer args, so relying on ctypes' c_int
    # defaults is ABI-fragile (and loses type checking) off x86-64 g++.
    u8p = ctypes.POINTER(ctypes.c_uint8)
    szp = ctypes.POINTER(ctypes.c_size_t)
    l.labrador_ldpc_encode.restype = None
    l.labrador_ldpc_encode.argtypes = [ctypes.c_int, u8p]
    l.labrador_ldpc_copy_encode.restype = None
    l.labrador_ldpc_copy_encode.argtypes = [ctypes.c_int, u8p, u8p]
    l.labrador_ldpc_decode_bf.restype = ctypes.c_bool
    l.labrador_ldpc_decode_bf.argtypes = [
        ctypes.c_int, u8p, u8p, u8p, ctypes.c_size_t, szp,
    ]
    for suffix, ctype in (
        ("i8", ctypes.c_int8), ("i16", ctypes.c_int16),
        ("f32", ctypes.c_float), ("f64", ctypes.c_double),
    ):
        tp = ctypes.POINTER(ctype)
        ms = getattr(l, f"labrador_ldpc_decode_ms_{suffix}")
        ms.restype = ctypes.c_bool
        ms.argtypes = [ctypes.c_int, tp, u8p, tp, u8p, ctypes.c_size_t, szp]
        h2l = getattr(l, f"labrador_ldpc_hard_to_llrs_{suffix}")
        h2l.restype = None
        h2l.argtypes = [ctypes.c_int, u8p, tp]
        l2h = getattr(l, f"labrador_ldpc_llrs_to_hard_{suffix}")
        l2h.restype = None
        l2h.argtypes = [ctypes.c_int, tp, u8p]
    return l


def lib() -> ctypes.CDLL:
    """The loaded native library (building it first if necessary)."""
    return _load()


def _u8(a) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.uint8)


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def encode(code: LDPCCode | str, codeword: np.ndarray) -> np.ndarray:
    """In-place systematic encode: codeword (n/8,) with data in first k/8."""
    code = get_code(code)
    l = _load()
    cw = _u8(codeword).copy()
    assert cw.size == code.n // 8
    l.labrador_ldpc_encode(_CODE_INDEX[code], _ptr(cw, ctypes.c_uint8))
    return cw


def copy_encode(code: LDPCCode | str, data: np.ndarray) -> np.ndarray:
    """data (k/8,) bytes -> codeword (n/8,) bytes."""
    code = get_code(code)
    l = _load()
    data = _u8(data)
    assert data.size == code.k // 8
    cw = np.zeros(code.n // 8, dtype=np.uint8)
    l.labrador_ldpc_copy_encode(
        _CODE_INDEX[code], _ptr(data, ctypes.c_uint8), _ptr(cw, ctypes.c_uint8)
    )
    return cw


def decode_bf(code: LDPCCode | str, input_bytes: np.ndarray, maxiters: int = 20):
    """Hard bit-flip decode. Returns (success, iters, output_bytes)."""
    code = get_code(code)
    l = _load()
    inp = _u8(input_bytes)
    assert inp.size == code.n // 8
    out = np.zeros(int(l.labrador_ldpc_output_len(_CODE_INDEX[code])), dtype=np.uint8)
    work = np.zeros(int(l.labrador_ldpc_bf_working_len(_CODE_INDEX[code])), dtype=np.uint8)
    iters = ctypes.c_size_t(0)
    ok = l.labrador_ldpc_decode_bf(
        _CODE_INDEX[code], _ptr(inp, ctypes.c_uint8), _ptr(out, ctypes.c_uint8),
        _ptr(work, ctypes.c_uint8), ctypes.c_size_t(maxiters), ctypes.byref(iters),
    )
    return bool(ok), int(iters.value), out


def decode_ms(code: LDPCCode | str, llrs: np.ndarray, maxiters: int = 20):
    """Soft min-sum decode (i8/i16/f32/f64 LLRs).

    Returns (success, iters, output_bytes)."""
    code = get_code(code)
    l = _load()
    llrs = np.ascontiguousarray(llrs)
    suffix, ctype = _MS_TYPES[llrs.dtype]
    assert llrs.size == code.n
    idx = _CODE_INDEX[code]
    out = np.zeros(int(l.labrador_ldpc_output_len(idx)), dtype=np.uint8)
    work = np.zeros(int(l.labrador_ldpc_ms_working_len(idx)), dtype=llrs.dtype)
    work_u8 = np.zeros(int(l.labrador_ldpc_ms_working_u8_len(idx)), dtype=np.uint8)
    iters = ctypes.c_size_t(0)
    fn = getattr(l, f"labrador_ldpc_decode_ms_{suffix}")
    ok = fn(
        idx, _ptr(llrs, ctype), _ptr(out, ctypes.c_uint8), _ptr(work, ctype),
        _ptr(work_u8, ctypes.c_uint8), ctypes.c_size_t(maxiters), ctypes.byref(iters),
    )
    return bool(ok), int(iters.value), out


def hard_to_llrs(code: LDPCCode | str, input_bytes: np.ndarray, dtype=np.float32) -> np.ndarray:
    code = get_code(code)
    l = _load()
    suffix, ctype = _MS_TYPES[np.dtype(dtype)]
    inp = _u8(input_bytes)
    llrs = np.zeros(code.n, dtype=dtype)
    getattr(l, f"labrador_ldpc_hard_to_llrs_{suffix}")(
        _CODE_INDEX[code], _ptr(inp, ctypes.c_uint8), _ptr(llrs, ctype)
    )
    return llrs


def llrs_to_hard(code: LDPCCode | str, llrs: np.ndarray) -> np.ndarray:
    code = get_code(code)
    l = _load()
    llrs = np.ascontiguousarray(llrs)
    suffix, ctype = _MS_TYPES[llrs.dtype]
    out = np.zeros(code.n // 8, dtype=np.uint8)
    getattr(l, f"labrador_ldpc_llrs_to_hard_{suffix}")(
        _CODE_INDEX[code], _ptr(llrs, ctype), _ptr(out, ctypes.c_uint8)
    )
    return out
