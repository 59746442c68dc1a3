"""GlibcRand must reproduce the actual C library's rand() stream (the
reference's srand(0) determinism depends on it)."""

import subprocess
import tempfile
import os

from spumoni_tpu.glibc_rand import GlibcRand


def _c_rand_stream(seed, count):
    src = f"""
#include <stdio.h>
#include <stdlib.h>
int main() {{
    srand({seed});
    for (int i = 0; i < {count}; i++) printf("%d\\n", rand());
    return 0;
}}
"""
    with tempfile.TemporaryDirectory() as d:
        cpath = os.path.join(d, "r.c")
        with open(cpath, "w") as f:
            f.write(src)
        exe = os.path.join(d, "r")
        subprocess.run(["gcc", "-O0", cpath, "-o", exe], check=True)
        out = subprocess.run([exe], capture_output=True, text=True, check=True)
    return [int(x) for x in out.stdout.split()]


def test_matches_glibc_seed0():
    expect = _c_rand_stream(0, 200)
    g = GlibcRand(0)
    got = [g.rand() for _ in range(200)]
    assert got == expect


def test_matches_glibc_other_seeds():
    for seed in (1, 42, 123456789):
        expect = _c_rand_stream(seed, 50)
        g = GlibcRand(seed)
        got = [g.rand() for _ in range(50)]
        assert got == expect


def test_reseed():
    g = GlibcRand(0)
    a = [g.rand() for _ in range(10)]
    g.srand(0)
    b = [g.rand() for _ in range(10)]
    assert a == b


def test_long_stream_ring_buffer():
    expect = _c_rand_stream(7, 10000)
    g = GlibcRand(7)
    got = [g.rand() for _ in range(10000)]
    assert got == expect
