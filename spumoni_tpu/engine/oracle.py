"""Brute-force oracles for testing the index builder and query engines.

These are deliberately slow, independent implementations used only in tests:
  * naive suffix array / BWT / LCP
  * brute-force matching statistics (the mathematical definition)
  * a direct transliteration of the PML/MS recurrence over an explicit BWT
    string with naive rank/select (independent of the dense run tables).

Reference semantics: /root/reference/src/compute_ms_pml.cpp:237-286 (PML),
:570-623 (MS pointers), :802-810 (MS extension).
"""

from __future__ import annotations

import numpy as np

TERMINATOR = 1


def naive_suffix_array(text: bytes) -> list[int]:
    s = bytes(text) + b"\x00"
    return sorted(range(len(s)), key=lambda i: s[i:])


def naive_bwt(text: bytes) -> bytes:
    s = bytes(text) + b"\x00"
    sa = naive_suffix_array(text)
    out = bytearray()
    for i in sa:
        c = s[i - 1] if i > 0 else s[-1]
        out.append(TERMINATOR if c <= 1 else c)
    return bytes(out)


def brute_force_ms(text: bytes, pattern: bytes) -> np.ndarray:
    """MS[i] = length of the longest prefix of pattern[i:] occurring in text."""
    n, m = len(text), len(pattern)
    out = np.zeros(m, dtype=np.int64)
    for i in range(m):
        best = 0
        for j in range(n):
            l = 0
            while i + l < m and j + l < n and pattern[i + l] == text[j + l]:
                l += 1
            best = max(best, l)
            if best == m - i:
                break
        out[i] = best
    return out


class NaiveRLBWT:
    """Explicit-BWT rank/select/thresholds, built only from text via the naive SA."""

    def __init__(self, text: bytes):
        self.text = bytes(text)
        s = self.text + b"\x00"
        self.sa = naive_suffix_array(text)
        self.n = len(s)
        self.bwt = naive_bwt(text)
        # runs
        self.run_starts = [0]
        for i in range(1, self.n):
            if self.bwt[i] != self.bwt[i - 1]:
                self.run_starts.append(i)
        self.r = len(self.run_starts)
        self.run_of = np.zeros(self.n, dtype=np.int64)
        for k in range(self.r):
            end = self.run_starts[k + 1] if k + 1 < self.r else self.n
            self.run_of[self.run_starts[k]:end] = k
        # F
        self.F = np.zeros(256, dtype=np.int64)
        for c in self.bwt:
            self.F[c] += 1
        self.F = np.concatenate([[0], np.cumsum(self.F)[:-1]])
        self.cnt = np.zeros(256, dtype=np.int64)
        for c in self.bwt:
            self.cnt[c] += 1
        # LCP (naive)
        self.lcp = np.zeros(self.n, dtype=np.int64)
        for i in range(1, self.n):
            a, b = self.sa[i - 1], self.sa[i]
            l = 0
            while a + l < self.n and b + l < self.n and s[a + l] == s[b + l]:
                l += 1
            self.lcp[i] = l
        # thresholds per run: leftmost LCP argmin in (prev_end_of_char, run_start]
        self.thresholds = np.zeros(self.r, dtype=np.int64)
        prev_end = {}
        for k in range(self.r):
            c = self.bwt[self.run_starts[k]]
            start = self.run_starts[k]
            end = (self.run_starts[k + 1] if k + 1 < self.r else self.n) - 1
            if c in prev_end:
                lo = prev_end[c] + 1
                seg = self.lcp[lo:start + 1]
                self.thresholds[k] = lo + int(np.argmin(seg))
            prev_end[c] = end
        # SA samples at run boundaries, stored with the (sa-1) mod n convention
        self.samples_start = np.zeros(self.r, dtype=np.int64)
        self.samples_last = np.zeros(self.r, dtype=np.int64)
        for k in range(self.r):
            start = self.run_starts[k]
            end = (self.run_starts[k + 1] if k + 1 < self.r else self.n) - 1
            conv = lambda v: v - 1 if v > 0 else self.n - 1
            self.samples_start[k] = conv(self.sa[start])
            self.samples_last[k] = conv(self.sa[end])
        self.last_run_sample = self.sa[self.n - 1]  # raw SA[n-1]

    def rank(self, pos: int, c: int) -> int:
        return sum(1 for x in self.bwt[:pos] if x == c)

    def select(self, k: int, c: int) -> int:
        seen = -1
        for i, x in enumerate(self.bwt):
            if x == c:
                seen += 1
                if seen == k:
                    return i
        raise ValueError("select out of range")

    def query_pml(self, pattern: bytes) -> np.ndarray:
        m = len(pattern)
        out = np.zeros(m, dtype=np.int64)
        pos = self.n - 1
        length = 0
        for i in range(m):
            c = pattern[m - i - 1]
            if self.cnt[c] == 0:
                length = 0
            elif self.bwt[pos] == c:
                length += 1
            else:
                rnk = self.rank(pos, c)
                thr = self.n + 1
                next_pos = pos
                if rnk < self.cnt[c]:
                    j = self.select(rnk, c)
                    thr = self.thresholds[self.run_of[j]]
                    length = 0
                    next_pos = j
                if pos < thr:
                    j = self.select(rnk - 1, c)
                    length = 0
                    next_pos = j
                pos = next_pos
            out[m - i - 1] = length
            pos = self.F[c] + self.rank(pos, c)
        return out

    def query_ms_pointers(self, pattern: bytes) -> np.ndarray:
        m = len(pattern)
        out = np.zeros(m, dtype=np.int64)
        pos = self.n - 1
        sample = self.last_run_sample
        for i in range(m):
            c = pattern[m - i - 1]
            if self.cnt[c] == 0:
                sample = 0
            elif self.bwt[pos] == c:
                sample -= 1
            else:
                rnk = self.rank(pos, c)
                thr = self.n + 1
                next_pos = pos
                if rnk < self.cnt[c]:
                    j = self.select(rnk, c)
                    thr = self.thresholds[self.run_of[j]]
                    sample = self.samples_start[self.run_of[j]]
                    next_pos = j
                if pos < thr:
                    j = self.select(rnk - 1, c)
                    sample = self.samples_last[self.run_of[j]]
                    next_pos = j
                pos = next_pos
            out[m - i - 1] = sample
            pos = self.F[c] + self.rank(pos, c)
        return out

    def extend_pointers(self, pattern: bytes, pointers: np.ndarray) -> np.ndarray:
        """compute_ms_pml.cpp:802-810 — pointers -> MS lengths via text access."""
        m = len(pattern)
        n = len(self.text)
        lengths = np.zeros(m, dtype=np.int64)
        l = 0
        for i in range(m):
            pos = int(pointers[i])
            while (i + l < m and pos >= 0 and pos + l < n
                   and (i < 1 or pos != int(pointers[i - 1]) + 1)
                   and pattern[i + l] == self.text[pos + l]):
                l += 1
            lengths[i] = l
            l = 0 if l == 0 else l - 1
        return lengths
