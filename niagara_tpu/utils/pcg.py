"""Vectorized PCG32 (XSH-RR) — bit-exact against the reference's host RNG.

The reference synthesizes its 1M-draw benchmark scene with pcg32_random_r
(niagara.cpp:449-481) seeded with state=0x42 and the default stream.  To get
bit-identical scenes without a 9M-step Python loop, we exploit that the LCG
state recurrence is affine:  state_i = a^i * s0 + c * (a^(i-1) + ... + 1),
which vectorizes as a cumulative product/sum in wrapping uint64 arithmetic.
"""

from __future__ import annotations

import numpy as np

PCG_MULT = np.uint64(6364136223846793005)
PCG_DEFAULT_INC = np.uint64(0xDA3E39CB94B95BDB)
PCG_DEFAULT_STATE = np.uint64(0x853C49E6748FEA9B)


def pcg32_sequence(n: int, state: int = int(PCG_DEFAULT_STATE), inc: int = int(PCG_DEFAULT_INC)) -> np.ndarray:
    """First n outputs of pcg32_random_r as uint32, starting from `state`."""
    a = PCG_MULT
    c = np.uint64(inc) | np.uint64(1)
    s0 = np.uint64(state)

    with np.errstate(over="ignore"):
        # A[i] = a^i  (A[0] = 1)
        A = np.ones(n, dtype=np.uint64)
        if n > 1:
            A[1:] = a
            A = np.cumprod(A)
        # C[i] = c * (A[0] + ... + A[i-1]); C[0] = 0.  Multiplying the wrapped
        # sum by c afterwards is valid in mod-2^64 arithmetic.
        C = np.zeros(n, dtype=np.uint64)
        if n > 1:
            C[1:] = np.cumsum(A[:-1]) * c
        old = A * s0 + C

        xorshifted = (((old >> np.uint64(18)) ^ old) >> np.uint64(27)).astype(np.uint32)
        rot = (old >> np.uint64(59)).astype(np.uint32)
        return (xorshifted >> rot) | (xorshifted << ((np.uint32(32) - rot) & np.uint32(31)))


class Pcg32:
    """Stateful scalar PCG32 matching the reference exactly (for tests)."""

    def __init__(self, state: int = int(PCG_DEFAULT_STATE), inc: int = int(PCG_DEFAULT_INC)):
        self.state = np.uint64(state)
        self.inc = np.uint64(inc)

    def next32(self) -> int:
        with np.errstate(over="ignore"):
            old = self.state
            self.state = old * PCG_MULT + (self.inc | np.uint64(1))
            xorshifted = np.uint32((np.uint64((old >> np.uint64(18)) ^ old)) >> np.uint64(27))
            rot = np.uint32(old >> np.uint64(59))
            return int((xorshifted >> rot) | (xorshifted << ((np.uint32(32) - rot) & np.uint32(31))))

    def rand01(self) -> float:
        return self.next32() / float(1 << 32)


def rand01_from_bits(bits: np.ndarray) -> np.ndarray:
    """uint32 -> double in [0,1) the way the reference's rand01 does
    (niagara.cpp:471-474: division by 2^32 in double)."""
    return bits.astype(np.float64) / float(1 << 32)
