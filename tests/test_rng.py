"""RanMars (random_mars.cpp parity — SURVEY §2.1 L1): the vectorized
lagged-Fibonacci stream must equal a direct scalar transcription of the
published Marsaglia–Zaman–Tsang algorithm, and `velocity create` must
walk it in tag order."""

import numpy as np

from tpusph.rng import RanMars


def _scalar_ranmars(seed, n):
    """Independent straight-line transcription of the published recipe
    (no blocking, no FIFO) — the oracle for the vectorized generator."""
    u = np.zeros(98)
    ij = (seed - 1) // 30082
    kl = (seed - 1) - 30082 * ij
    i = (ij // 177) % 177 + 2
    j = ij % 177 + 2
    k = (kl // 169) % 178 + 1
    m = kl % 169
    for ii in range(1, 98):
        s, t = 0.0, 0.5
        for _ in range(24):
            m1 = ((i * j) % 179) * k % 179
            i, j, k = j, k, m1
            m = (53 * m + 1) % 169
            if (m * m1) % 64 >= 32:
                s += t
            t *= 0.5
        u[ii] = s
    c, cd, cm = 362436.0 / 16777216.0, 7654321.0 / 16777216.0, \
        16777213.0 / 16777216.0
    i97, j97 = 97, 33
    out = []
    for _ in range(n):
        uni = u[i97] - u[j97]
        if uni < 0.0:
            uni += 1.0
        u[i97] = uni
        i97 = i97 - 1 or 97
        j97 = j97 - 1 or 97
        c -= cd
        if c < 0.0:
            c += cm
        uni -= c
        if uni < 0.0:
            uni += 1.0
        out.append(uni)
    return np.asarray(out)


def test_vectorized_stream_matches_scalar_oracle():
    for seed in (12345, 1, 899_999_999, 482_759_102):
        oracle = _scalar_ranmars(seed, 500)
        rng = RanMars(seed)
        got = rng.uniform_batch(500)
        np.testing.assert_array_equal(got, oracle)


def test_interleaved_calls_preserve_stream():
    oracle = _scalar_ranmars(777, 300)
    rng = RanMars(777)
    got = [rng.uniform() for _ in range(7)]
    got += list(rng.uniform_batch(100))
    got += [rng.uniform() for _ in range(3)]
    got += list(rng.uniform_batch(190))
    np.testing.assert_array_equal(np.asarray(got), oracle)


def test_gaussian_batch_matches_scalar_gaussian():
    a = RanMars(5551)
    b = RanMars(5551)
    batch = a.gaussian_batch(257)
    scalar = np.asarray([b.gaussian() for _ in range(257)])
    np.testing.assert_array_equal(batch, scalar)
    # and the stream positions agree afterwards
    assert a.uniform() == b.uniform()


def test_gaussian_statistics():
    g = RanMars(90210).gaussian_batch(20000)
    assert abs(g.mean()) < 0.03
    assert abs(g.std() - 1.0) < 0.03
    u = RanMars(90210).uniform_batch(20000)
    assert 0.49 < u.mean() < 0.51
    assert (u >= 0).all() and (u < 1).all()


def test_seed_validation():
    import pytest
    with pytest.raises(ValueError):
        RanMars(0)
    with pytest.raises(ValueError):
        RanMars(900_000_000)


def test_velocity_create_deterministic_and_exact_T():
    from tpusph.script import Interpreter

    script = """
dimension      2
units          si
atom_style     meso
boundary       p p p
region         box block 0 1.6 0 1.6 -0.05 0.05 units box
create_box     1 box
lattice        sq 0.1
region         fill block 0 1.55 0 1.55 -1 1 units box
create_atoms   1 region fill
mass           1 0.01
set            group all meso/rho 1.0 meso/cv 1.0
velocity       all create 2.5 482759 dist gaussian
"""
    def build():
        it = Interpreter()
        it.sim.screen = False
        it.run_string(script)
        return it.sim

    s1, s2 = build(), build()
    v1 = s1._staged["v"]
    v2 = s2._staged["v"]
    np.testing.assert_array_equal(v1, v2)  # seed-deterministic
    m = s1._staged["rmass"]
    n = len(m)
    # momentum zeroed
    np.testing.assert_allclose((v1 * m[:, None]).sum(0), 0.0, atol=1e-4)
    # realized temperature exactly the request (dof = dim*(N-1))
    ke2 = float((m[:, None] * v1 * v1).sum())
    t = ke2 / (2 * (n - 1))
    np.testing.assert_allclose(t, 2.5, rtol=1e-5)
    assert (v1[:, 2] == 0).all()
