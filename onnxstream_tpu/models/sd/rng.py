"""Bit-exact reimplementations of the C++ RNGs the reference samplers use.

Latents equality with the reference (its golden-latents cross-machine check,
reference src/sd.cpp:2325-2328 / SURVEY.md section 4) requires reproducing:

  * glibc ``rand()`` after ``srand(seed)`` — the additive-feedback TYPE_3
    generator (used as ``std::srand(seed++); rand() % 1000`` to pick noise
    seeds, reference src/samplers.h ancestral samplers);
  * ``std::mt19937`` — standardized, straightforward;
  * libstdc++ ``std::normal_distribution<float>`` — Marsaglia polar method
    with a one-value cache, canonicals from one 32-bit draw each
    (reference src/sd.cpp:1366-1385 ``randn_4_w_h``).

All three are verified against a g++-compiled oracle in
tests/test_sd_rng.py.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import math
from typing import List

import numpy as np

_U32 = 0xFFFFFFFF

# glibc logf — numpy's float32 log differs from libm's by 1 ulp on some inputs,
# which is enough to break bit-exact parity with the C++ reference samplers.
try:
    _libm = ctypes.CDLL(ctypes.util.find_library("m") or "libm.so.6")
    _libm.logf.restype = ctypes.c_float
    _libm.logf.argtypes = [ctypes.c_float]

    def _logf(x: np.float32) -> np.float32:
        return np.float32(_libm.logf(ctypes.c_float(float(x))))

except Exception:  # pragma: no cover - fall back to numpy (1-ulp tolerance)

    def _logf(x: np.float32) -> np.float32:
        return np.float32(np.log(np.float32(x)))


class GlibcRand:
    """glibc rand(): TYPE_3 additive feedback (r_new = r[-31] + r[-3] >> 1)."""

    def __init__(self, seed: int):
        seed = seed & _U32
        if seed == 0:
            seed = 1
        r = [0] * 344
        r[0] = seed
        for i in range(1, 31):
            # r[i] = (16807 * r[i-1]) % 2147483647, via the Schrage trick signs
            hi, lo = divmod(r[i - 1], 127773)
            word = 16807 * lo - 2836 * hi
            if word < 0:
                word += 2147483647
            r[i] = word
        for i in range(31, 34):
            r[i] = r[i - 31]
        for i in range(34, 344):
            r[i] = (r[i - 31] + r[i - 3]) & _U32
        self._r = r
        self._idx = 344

    def rand(self) -> int:
        r = self._r
        r.append((r[-31] + r[-3]) & _U32)
        return r[-1] >> 1


class MT19937:
    """std::mt19937 (32-bit Mersenne Twister, standard parameters)."""

    def __init__(self, seed: int):
        mt = np.empty(624, dtype=np.uint64)
        mt[0] = seed & _U32
        for i in range(1, 624):
            mt[i] = (1812433253 * (mt[i - 1] ^ (mt[i - 1] >> 30)) + i) & _U32
        self.mt = mt
        self.idx = 624

    def _generate(self) -> None:
        mt = self.mt
        upper = np.uint64(0x80000000)
        lower = np.uint64(0x7FFFFFFF)
        for i in range(624):
            y = (mt[i] & upper) | (mt[(i + 1) % 624] & lower)
            nxt = mt[(i + 397) % 624] ^ (y >> np.uint64(1))
            if y & np.uint64(1):
                nxt ^= np.uint64(0x9908B0DF)
            mt[i] = nxt
        self.idx = 0

    def next_block(self, n: int) -> np.ndarray:
        out = np.empty(n, dtype=np.uint32)
        got = 0
        while got < n:
            if self.idx >= 624:
                self._generate()
            take = min(624 - self.idx, n - got)
            y = self.mt[self.idx : self.idx + take].copy()
            y ^= y >> np.uint64(11)
            y ^= (y << np.uint64(7)) & np.uint64(0x9D2C5680)
            y ^= (y << np.uint64(15)) & np.uint64(0xEFC60000)
            y ^= y >> np.uint64(18)
            out[got : got + take] = y.astype(np.uint32)
            self.idx += take
            got += take
        return out

    def __call__(self) -> int:
        return int(self.next_block(1)[0])


class NormalDistributionFloat:
    """libstdc++ std::normal_distribution<float> over an mt19937.

    Marsaglia polar method; each canonical uses ONE 32-bit draw:
    u = float(long double(x) / 2^32) (generate_canonical<float,24,mt19937>).
    Saves x*mult, returns y*mult first.
    """

    def __init__(self, gen: MT19937):
        self.gen = gen
        self._saved: float | None = None

    _ONE = np.float32(1.0)
    _TWO = np.float32(2.0)
    _NEG2 = np.float32(-2.0)
    _R = np.float32(4294967296.0)

    def _canonical(self) -> np.float32:
        # generate_canonical<float,24,mt19937>: float(x) / float(2^32)
        return np.float32(np.float32(self.gen()) / self._R)

    def __call__(self) -> np.float32:
        if self._saved is not None:
            v, self._saved = self._saved, None
            return v
        while True:
            x = np.float32(self._TWO * self._canonical() - self._ONE)
            y = np.float32(self._TWO * self._canonical() - self._ONE)
            r2 = np.float32(x * x + y * y)
            if not (r2 > self._ONE or r2 == np.float32(0.0)):
                break
        mult = np.float32(np.sqrt(np.float32(self._NEG2 * _logf(r2) / r2)))
        self._saved = np.float32(x * mult)
        return np.float32(y * mult)

    def fill(self, n: int) -> np.ndarray:
        return np.fromiter((self() for _ in range(n)), dtype=np.float32, count=n)


def randn_4_w_h(seed: int, w: int, h: int) -> np.ndarray:
    """Reference randn_4_w_h (src/sd.cpp:1366-1385): mt19937(seed) filling a
    (4, h, w) float32 normal tensor in channel-major order."""
    gen = MT19937(seed)
    dist = NormalDistributionFloat(gen)
    return dist.fill(4 * w * h).reshape(4, h, w)
