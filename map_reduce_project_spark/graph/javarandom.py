"""Bit-exact pure-Python ``java.util.Random`` (the 48-bit LCG specified
in the Java SE docs) plus Scala's Fisher-Yates ``Random.shuffle``.

Why: the reference publishes TWO experiment result sets — one from its
Python generators (random.sample/randint) and one from its Scala
generators (``ccf_experiments_scala.scala:21-55``, results in
``experiment_results_scala.csv``), whose edge sets diverge because the
RNGs differ (divergence documented in the reference's report). Round 1
reproduced the Python set bit-for-bit; this module closes the Scala
side: JavaRandom reproduces ``new scala.util.Random(seed)`` draw
sequences exactly (scala.util.Random delegates to java.util.Random),
so the Scala-mode generators in ``generators.py`` rebuild the exact
published edge sets.

The LCG parameters and nextInt rejection loop are from the public Java
SE specification (java.util.Random javadoc defines the algorithm
normatively); the shuffle is Scala stdlib's documented tail-swap
Fisher-Yates.
"""

from __future__ import annotations

_MULTIPLIER = 0x5DEECE66D
_ADDEND = 0xB
_MASK = (1 << 48) - 1


class JavaRandom:
    """java.util.Random: seed scramble, 48-bit LCG, nextInt(bound)."""

    def __init__(self, seed: int) -> None:
        self.seed = (seed ^ _MULTIPLIER) & _MASK

    def _next(self, bits: int) -> int:
        self.seed = (self.seed * _MULTIPLIER + _ADDEND) & _MASK
        return self.seed >> (48 - bits)

    def next_int(self, bound: int) -> int:
        if bound <= 0:
            raise ValueError("bound must be positive")
        if bound & -bound == bound:  # power of two: single draw
            return (bound * self._next(31)) >> 31
        while True:
            bits = self._next(31)
            val = bits % bound
            # Java rejects when bits - val + (bound-1) overflows int32
            if bits - val + (bound - 1) <= 0x7FFFFFFF:
                return val

    def shuffle(self, xs: list) -> list:
        """scala.util.Random.shuffle: swap positions n-1..1 downward,
        each with a nextInt(n) partner."""
        buf = list(xs)
        for n in range(len(buf), 1, -1):
            k = self.next_int(n)
            buf[n - 1], buf[k] = buf[k], buf[n - 1]
        return buf
