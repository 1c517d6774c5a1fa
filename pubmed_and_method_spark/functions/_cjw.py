"""Runtime-compiled C Jaro-Winkler batch kernel (ctypes).

The pair feature stage's only remaining Python-speed inner loop is
Jaro-Winkler (Spark has no builtin; the reference computes it row-at-
a-time in pandas, src/eutilities/string_utils.py:79-86).  When a
parity-verified C library (rapidfuzz/jellyfish) is absent — as in this
container — `functions.strings` previously fell back to a pure-Python
O(|s1|*|s2|) loop per distinct pair: the r03 verdict's #1 scale wall.

This module removes the wall without a new dependency: if a C
compiler is present, compile a ~60-line JW kernel once per host
(hash-keyed artifact, atomic rename, any failure -> None and the
caller falls back), and score a whole Arrow batch of string pairs in
ONE ctypes call.  Strings cross the boundary as UTF-32 codepoint
buffers + offset arrays, so the kernel's semantics are exactly the
codepoint semantics of ``strings.jaro_winkler`` (p=0.1, prefix<=4,
boost threshold 0.7) — and the caller gates it behind the same
bit-for-bit probe set as any external C library.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import shutil
import subprocess
import tempfile

import numpy as np

_C_SRC = r"""
#include <stdint.h>
#include <string.h>
#include <stdlib.h>

static double jaro(const uint32_t* s1, int64_t l1,
                   const uint32_t* s2, int64_t l2, uint8_t* work) {
    if (l1 == 0 || l2 == 0) return 0.0;
    int64_t window = (l1 > l2 ? l1 : l2) / 2 - 1;
    if (window < 0) window = 0;
    uint8_t* m1 = work;
    uint8_t* m2 = work + l1;
    memset(work, 0, (size_t)(l1 + l2));
    int64_t matches = 0;
    for (int64_t i = 0; i < l1; i++) {
        int64_t lo = i > window ? i - window : 0;
        int64_t hi = i + window + 1;
        if (hi > l2) hi = l2;
        uint32_t c = s1[i];
        for (int64_t j = lo; j < hi; j++) {
            if (!m2[j] && s2[j] == c) {
                m1[i] = 1; m2[j] = 1; matches++;
                break;
            }
        }
    }
    if (matches == 0) return 0.0;
    int64_t t = 0, k = 0;
    for (int64_t i = 0; i < l1; i++) {
        if (m1[i]) {
            while (!m2[k]) k++;
            if (s1[i] != s2[k]) t++;
            k++;
        }
    }
    t /= 2;
    return ((double)matches / (double)l1 + (double)matches / (double)l2
            + (double)(matches - t) / (double)matches) / 3.0;
}

/* Pairs are (buf1[off1[p]:off1[p+1]], buf2[off2[p]:off2[p+1]]). */
int jw_batch(const uint32_t* buf1, const int64_t* off1,
             const uint32_t* buf2, const int64_t* off2,
             int64_t n, double* out) {
    int64_t maxw = 16;
    for (int64_t p = 0; p < n; p++) {
        int64_t w = (off1[p + 1] - off1[p]) + (off2[p + 1] - off2[p]);
        if (w > maxw) maxw = w;
    }
    uint8_t* work = (uint8_t*)malloc((size_t)maxw);
    if (!work) return -1;
    for (int64_t p = 0; p < n; p++) {
        const uint32_t* s1 = buf1 + off1[p];
        int64_t l1 = off1[p + 1] - off1[p];
        const uint32_t* s2 = buf2 + off2[p];
        int64_t l2 = off2[p + 1] - off2[p];
        if (l1 > 0 && l1 == l2 && memcmp(s1, s2, (size_t)(l1 * 4)) == 0) {
            out[p] = 1.0;
            continue;
        }
        double j = jaro(s1, l1, s2, l2, work);
        if (j > 0.7) {
            int64_t maxp = l1 < l2 ? l1 : l2;
            if (maxp > 4) maxp = 4;
            int64_t prefix = 0;
            for (int64_t i = 0; i < maxp; i++) {
                if (s1[i] != s2[i]) break;
                prefix++;
            }
            j += (double)prefix * 0.1 * (1.0 - j);
        }
        out[p] = j;
    }
    free(work);
    return 0;
}
"""


def _build_library() -> str | None:
    """Compile the kernel to a host-shared .so; return its path.

    Hash-keyed by source so every process (driver, executor python
    workers) reuses one artifact; concurrent builders compile to a
    unique temp file and atomically rename, so races are benign.
    """
    cc = shutil.which("cc") or shutil.which("gcc") or shutil.which("clang")
    if cc is None:
        return None
    key = hashlib.md5(_C_SRC.encode()).hexdigest()[:16]
    so_path = os.path.join(tempfile.gettempdir(), f"pmas_cjw_{key}.so")
    if os.path.exists(so_path):
        return so_path
    fd, src_path = tempfile.mkstemp(suffix=".c")
    tmp_so = src_path[:-2] + ".so"
    try:
        with os.fdopen(fd, "w") as f:
            f.write(_C_SRC)
        r = subprocess.run(
            [cc, "-O2", "-shared", "-fPIC", "-o", tmp_so, src_path],
            capture_output=True, timeout=60,
        )
        if r.returncode != 0 or not os.path.exists(tmp_so):
            return None
        os.replace(tmp_so, so_path)  # atomic on same fs
        return so_path
    except (OSError, subprocess.SubprocessError):
        return None
    finally:
        for p in (src_path, tmp_so):
            try:
                os.unlink(p)
            except OSError:
                pass


def _encode_utf32(strs: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Concatenated little-endian UTF-32 codepoint buffer + offsets."""
    bufs = [s.encode("utf-32-le") for s in strs]
    offs = np.zeros(len(bufs) + 1, dtype=np.int64)
    np.cumsum([len(b) >> 2 for b in bufs], out=offs[1:])
    joined = b"".join(bufs)
    buf = (np.frombuffer(joined, dtype="<u4") if joined
           else np.empty(0, dtype="<u4"))
    return buf, offs


def load_batch_kernel():
    """Return ``f(list[str], list[str]) -> np.ndarray[float64]`` backed
    by the compiled kernel, or None if no compiler / build failure.
    Callers must parity-probe the returned function before trusting it
    (functions.strings does, against the same probe set that gates
    rapidfuzz/jellyfish)."""
    try:
        so_path = _build_library()
        if so_path is None:
            return None
        lib = ctypes.CDLL(so_path)
        fn = lib.jw_batch
        fn.restype = ctypes.c_int
        fn.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_void_p,
        ]
    except (OSError, AttributeError):
        return None

    def jw_batch(s1: list[str], s2: list[str]) -> np.ndarray:
        n = len(s1)
        out = np.empty(n, dtype=np.float64)
        if n == 0:
            return out
        buf1, off1 = _encode_utf32(s1)
        buf2, off2 = _encode_utf32(s2)
        rc = fn(
            buf1.ctypes.data, off1.ctypes.data,
            buf2.ctypes.data, off2.ctypes.data,
            ctypes.c_int64(n), out.ctypes.data,
        )
        if rc != 0:  # malloc failure — caller falls back
            raise MemoryError("jw_batch kernel allocation failed")
        return out

    return jw_batch
