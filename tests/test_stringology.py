"""Stringology kernels: smallest period / border (KMP) and LZ78
complexity — textstats.smallest_period / textstats.lz78_phrases."""

import math
import random

from documentai_ray.stages.textstats import lz78_phrases, smallest_period


def _naive_period(s: str) -> int:
    n = len(s)
    if n == 0:
        return 0
    return min(p for p in range(1, n + 1) if s[: n - p] == s[p:])


def _lz78_reference(s: str) -> int:
    """Independent dict-scan implementation (the mirror's shape)."""
    d = {""}
    c, pos, n = 0, 0, len(s)
    while pos < n:
        m = max(len(w) for w in d if s[pos: pos + len(w)] == w)
        d.add(s[pos: pos + m + 1])
        c += 1
        pos += m + 1
    return c


class TestSmallestPeriod:
    def test_hand_cases(self):
        assert smallest_period("abcabcab") == 3
        assert smallest_period("aaaa") == 1
        assert smallest_period("abcd") == 4  # aperiodic -> p = n
        assert smallest_period("") == 0

    def test_matches_naive_definition(self):
        # KMP border route == the mirror's shifted-prefix definition
        rng = random.Random(5)
        for _ in range(300):
            s = "".join(rng.choice("ab")
                        for _ in range(rng.randrange(0, 50)))
            assert smallest_period(s) == _naive_period(s)

    def test_fine_wilf(self):
        # Fine & Wilf: if s has periods p and q with
        # p + q - gcd(p,q) <= n, then gcd(p,q) is a period.
        # Build strings with two planted periods and check.
        rng = random.Random(9)
        for _ in range(50):
            p, q = rng.randrange(2, 7), rng.randrange(2, 7)
            g = math.gcd(p, q)
            n = p + q - g + rng.randrange(0, 5)
            # a string with period gcd(p,q) has periods p and q on
            # any window; its smallest period must divide g
            base = "".join(rng.choice("xy") for _ in range(g))
            s = (base * (n // g + 1))[:n]
            sp = smallest_period(s)
            assert g % sp == 0

    def test_fibonacci_word_border(self):
        # Fibonacci word f_k has smallest period F(k-1) (length F(k));
        # check at F(7) = 13: f = abaababaabaab
        a, b = "a", "ab"
        while len(b) < 13:
            a, b = b, b + a
        f = b[:13]
        assert smallest_period(f) == 8  # F(6) = 8

    def test_exactness_flag_semantics(self):
        # abcabc: period 3 divides 6 (exact); abcabca: period 3, n=7
        assert smallest_period("abcabc") == 3
        assert smallest_period("abcabca") == 3


class TestLZ78:
    def test_hand_traces(self):
        # ababab -> a | b | ab | ab(incomplete) = 4
        assert lz78_phrases("ababab") == 4
        assert lz78_phrases("") == 0
        assert lz78_phrases("a") == 1
        # a^6 -> a | aa | aaa ; a^7 adds the incomplete 'a'
        assert lz78_phrases("a" * 6) == 3
        assert lz78_phrases("a" * 7) == 4

    def test_unary_closed_form(self):
        # a^n parses into k complete phrases a, aa, ..., a^k with
        # k(k+1)/2 <= n, plus one incomplete if remainder > 0
        for n in range(1, 120):
            k = int((math.isqrt(8 * n + 1) - 1) // 2)
            expect = k + (1 if n - k * (k + 1) // 2 > 0 else 0)
            assert lz78_phrases("a" * n) == expect

    def test_matches_reference_scan(self):
        rng = random.Random(2)
        for _ in range(200):
            s = "".join(rng.choice("abc")
                        for _ in range(rng.randrange(0, 80)))
            assert lz78_phrases(s) == _lz78_reference(s)

    def test_random_beats_periodic(self):
        # a random string is less compressible than a unary one of
        # the same length — seeded, deterministic
        rng = random.Random(4)
        s = "".join(rng.choice("abcdefgh") for _ in range(100))
        assert lz78_phrases(s) > lz78_phrases("a" * 100)
