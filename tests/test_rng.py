"""Bitwise PCG parity tests (SURVEY.md §4 item 2)."""

import numpy as np
import jax.numpy as jnp

from tpt import rng


def glsl_pcg_reference(seed):
    """Straight transcription of compute.glsl:334-344 for one step."""
    with np.errstate(over="ignore"):
        s = np.uint32(seed) * np.uint32(747796405) + np.uint32(2891336453)
        word = ((s >> ((s >> np.uint32(28)) + np.uint32(4))) ^ s) * np.uint32(277803737)
        return int((word >> np.uint32(22)) ^ word), int(s)


def test_pcg_bitwise_chain():
    seed = 12345
    jseed = jnp.uint32(seed)
    for _ in range(100):
        expected_word, expected_state = glsl_pcg_reference(seed)
        word, jseed = rng.pcg_hash(jseed)
        assert int(word) == expected_word
        assert int(jseed) == expected_state
        seed = expected_state


def test_pcg_vectorized_matches_scalar():
    seeds = np.arange(1, 257, dtype=np.uint32) * np.uint32(2654435761)
    jwords, jstates = rng.pcg_hash(jnp.asarray(seeds))
    for i, s in enumerate(seeds):
        w, st = glsl_pcg_reference(s)
        assert int(jwords[i]) == w
        assert int(jstates[i]) == st


def test_float01_range_and_value():
    val, _ = rng.random_float01(jnp.uint32(42))
    w, _ = glsl_pcg_reference(42)
    assert float(val) == np.float32(np.float32(w) / np.float32(4294967296.0))
    seeds = jnp.arange(1, 10001, dtype=jnp.uint32)
    vals, _ = rng.random_float01(seeds)
    assert float(vals.min()) >= 0.0
    assert float(vals.max()) < 1.0


def test_pixel_seed_formula():
    # (x*1973 + y*9277 + frame*2699) | 1  — `|1` applies to the whole sum
    with np.errstate(over="ignore"):
        expected = (np.uint32(7) * np.uint32(1973)
                    + np.uint32(11) * np.uint32(9277)
                    + np.uint32(3) * np.uint32(2699)) | np.uint32(1)
    got = rng.pixel_seed(jnp.uint32(7), jnp.uint32(11), jnp.uint32(3))
    assert int(got) == int(expected)
    assert int(got) % 2 == 1


def test_uniformity_chi_squared():
    """Coarse chi^2 test over 16 bins (SURVEY.md §4 item 3)."""
    seeds = rng.pixel_seed(jnp.arange(4096, dtype=jnp.uint32),
                           jnp.zeros(4096, jnp.uint32), jnp.uint32(0))
    draws = []
    s = seeds
    for _ in range(16):
        v, s = rng.random_float01(s)
        draws.append(np.asarray(v))
    x = np.concatenate(draws)
    counts, _ = np.histogram(x, bins=16, range=(0, 1))
    expected = x.size / 16
    chi2 = float(((counts - expected) ** 2 / expected).sum())
    # 15 dof: p=0.001 critical value ~ 37.7
    assert chi2 < 37.7, f"chi2={chi2}, counts={counts}"
