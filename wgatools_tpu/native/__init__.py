"""ctypes loader for the native host kernels.

Compiles wganative.cpp with g++ on first use (cached as libwganative.so
next to the source); every entry point has a numpy fallback in
wgatools_tpu.core.cigar, so a missing toolchain only costs speed.
"""

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

log = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "wganative.cpp")
_LIB = os.path.join(_HERE, "libwganative.so")

_lock = threading.Lock()
_lib = None
_tried = False

_i64 = ctypes.c_int64
_u8p = np.ctypeslib.ndpointer(dtype=np.uint8, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS")
_charp = ctypes.c_char_p


def _build():
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        _SRC,
        "-o",
        _LIB,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def load():
    """Return the loaded library or None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_LIB) or os.path.getmtime(
                _LIB
            ) < os.path.getmtime(_SRC):
                _build()
            lib = ctypes.CDLL(_LIB)
        except Exception as e:  # missing toolchain, sandboxed fs, ...
            log.debug("native library unavailable: %s", e)
            return None
        lib.classify_ext.argtypes = [_u8p, _u8p, _i64, _u8p]
        lib.classify_caller.argtypes = [_u8p, _u8p, _i64, _u8p]
        lib.rle_encode.argtypes = [_u8p, _i64, _u8p, _i64p]
        lib.rle_encode.restype = _i64
        lib.classify_rle.argtypes = [_u8p, _u8p, _i64, ctypes.c_int, _u8p, _i64p]
        lib.classify_rle.restype = _i64
        lib.tokenize_cigar.argtypes = [_charp, _i64, _u8p, _i64p]
        lib.tokenize_cigar.restype = _i64
        lib.format_runs.argtypes = [_u8p, _i64p, _i64, _charp, _u8p, _i64]
        lib.format_runs.restype = _i64
        lib.reverse_complement.argtypes = [_u8p, _i64, _u8p]
        lib.reverse_complement.restype = _i64
        lib.count_non_gap.argtypes = [_u8p, _i64]
        lib.count_non_gap.restype = _i64
        lib.coverage_diff.argtypes = [_i64p, _i64p, _i64, _i64p, _i64]
        lib.format_bed_lines.argtypes = [
            ctypes.c_char_p,
            _i64,
            _i64,
            _i64p,
            _i64,
            _u8p,
            _i64,
        ]
        lib.format_bed_lines.restype = _i64
        lib.format_snp_rows.argtypes = [
            ctypes.c_char_p,
            _i64,
            ctypes.c_char_p,
            _i64,
            ctypes.c_char,
            _i64p,
            _i64p,
            _u8p,
            _u8p,
            _i64,
            _u8p,
            _i64,
        ]
        lib.format_snp_rows.restype = _i64
        lib.format_chain_lines.argtypes = [_i64p, _i64p, _i64p, _i64, _u8p, _i64]
        lib.format_chain_lines.restype = _i64
        lib.parse_chain_lines.argtypes = [
            ctypes.c_char_p, _i64, _i64p, _i64p, _i64p,
        ]
        lib.parse_chain_lines.restype = _i64
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


# ---------------------------------------------------------------------------
# wrappers
# ---------------------------------------------------------------------------

# grow-only scratch buffers: repeated multi-MB np.empty allocations mmap
# and fault fresh pages on every call, dominating the per-chunk cost
_SCRATCH = {}


def _scratch(name, n, dtype):
    buf = _SCRATCH.get(name)
    if buf is None or buf.shape[0] < n:
        buf = np.empty(max(n, 1 << 16), dtype=dtype)
        _SCRATCH[name] = buf
    return buf


def classify_and_rle(t: np.ndarray, q: np.ndarray, caller: bool = False):
    """Fused classify + RLE; returns (vals uint8, lens int64) or None when
    the native library is unavailable.  The returned arrays are copies (the
    scratch buffers are reused across calls)."""
    lib = load()
    if lib is None:
        return None
    n = t.shape[0]
    t = np.ascontiguousarray(t)
    q = np.ascontiguousarray(q)
    vals = _scratch("vals", n, np.uint8)
    lens = _scratch("lens", n, np.int64)
    # fused single pass (no intermediate cat array)
    n_runs = lib.classify_rle(t, q, n, 1 if caller else 0, vals, lens)
    return vals[:n_runs].copy(), lens[:n_runs].copy()


def tokenize_cigar(cigar: bytes):
    """Returns (ops uint8, lens int64) or None; raises ValueError with the
    error byte offset for malformed strings."""
    lib = load()
    if lib is None:
        return None
    n = len(cigar)
    cap = max(n // 2 + 1, 1)
    ops = np.empty(cap, dtype=np.uint8)
    lens = np.empty(cap, dtype=np.int64)
    res = lib.tokenize_cigar(cigar, n, ops, lens)
    if res < 0:
        raise ValueError(-res - 1)
    return ops[: int(res)], lens[: int(res)]


def format_runs(vals: np.ndarray, lens: np.ndarray, chars: bytes):
    lib = load()
    if lib is None:
        return None
    n_runs = len(vals)
    cap = 24 * max(n_runs, 1)
    # scratch avoids ctypes' zero-fill of the whole capacity per call
    out = _scratch("fmtbuf", cap, np.uint8)
    w = lib.format_runs(
        np.ascontiguousarray(vals, dtype=np.uint8),
        np.ascontiguousarray(lens, dtype=np.int64),
        n_runs,
        chars,
        out,
        cap,
    )
    if w < 0:
        return None
    return out[: int(w)].tobytes().decode("ascii")


def format_bed_lines(prefix: bytes, start: int, counts: np.ndarray):
    """Bulk per-base BED formatting; returns bytes or None."""
    lib = load()
    if lib is None:
        return None
    counts = np.ascontiguousarray(counts, dtype=np.int64)
    n = counts.shape[0]
    # worst case per line: prefix + 3 tabs + newline + 3x 20-digit ints
    cap = (len(prefix) + 84) * max(n, 1)
    out = np.empty(cap, dtype=np.uint8)
    w = lib.format_bed_lines(prefix, len(prefix), start, counts, n, out, cap)
    if w < 0:
        return None
    return out[: int(w)].tobytes()


def parse_chain_lines(text: bytes):
    """Parse chain data lines into (sizes, dqs, dts) int64 arrays.
    Returns None if the native library is unavailable; raises
    ValueError(byte_pos) on malformed input."""
    lib = load()
    if lib is None:
        return None
    n = len(text)
    max_lines = text.count(b"\n") + 1
    sizes = np.empty(max_lines, dtype=np.int64)
    dqs = np.empty(max_lines, dtype=np.int64)
    dts = np.empty(max_lines, dtype=np.int64)
    res = lib.parse_chain_lines(text, n, sizes, dqs, dts)
    if res < 0:
        raise ValueError(-res - 1)
    k = int(res)
    return sizes[:k].copy(), dqs[:k].copy(), dts[:k].copy()


def format_chain_lines(sizes, dqs, dts):
    """Bulk chain data-line formatting; returns bytes or None."""
    lib = load()
    if lib is None:
        return None
    sizes = np.ascontiguousarray(sizes, dtype=np.int64)
    dqs = np.ascontiguousarray(dqs, dtype=np.int64)
    dts = np.ascontiguousarray(dts, dtype=np.int64)
    n = sizes.shape[0]
    cap = 66 * max(n, 1)
    out = np.empty(cap, dtype=np.uint8)
    w = lib.format_chain_lines(sizes, dqs, dts, n, out, cap)
    if w < 0:
        return None
    return out[: int(w)].tobytes()


def format_snp_rows(chrom: bytes, qchro: bytes, suffix: bytes, pos, qpos,
                    ref, alt):
    """Bulk VCF SNP row formatting; returns bytes or None."""
    lib = load()
    if lib is None:
        return None
    pos = np.ascontiguousarray(pos, dtype=np.int64)
    qpos = np.ascontiguousarray(qpos, dtype=np.int64)
    ref = np.ascontiguousarray(ref, dtype=np.uint8)
    alt = np.ascontiguousarray(alt, dtype=np.uint8)
    n = pos.shape[0]
    cap = (len(chrom) + len(qchro) + 100) * max(n, 1)
    out = np.empty(cap, dtype=np.uint8)
    w = lib.format_snp_rows(
        chrom, len(chrom), qchro, len(qchro), suffix, pos, qpos, ref, alt,
        n, out, cap,
    )
    if w < 0:
        return None
    return out[: int(w)].tobytes()


def reverse_complement(seq: np.ndarray):
    """Returns revcomp bytes or raises ValueError(bad_index)."""
    lib = load()
    if lib is None:
        return None
    seq = np.ascontiguousarray(seq, dtype=np.uint8)
    out = np.empty_like(seq)
    res = lib.reverse_complement(seq, seq.shape[0], out)
    if res != 0:
        raise ValueError(int(res) - 1)
    return out.tobytes()
