"""Map combinator: vmapped plates of sub-generative-functions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modppl_tpu import ArgDiff, Trie, gen, normal, select
from modppl_tpu.modeling.map_combinator import Map


@gen
def point(h, mu, x):
    return h.sample(normal, (mu * x, 0.1), "y")


plate = Map(point)


@gen
def regression(h, xs):
    slope = h.sample(normal, (0.0, 1.0), "slope")
    n = xs.shape[0]
    return h.trace(plate, (jnp.full((n,), slope), xs), "ys")


def test_map_simulate_generate():
    xs = jnp.array([1.0, 2.0, 3.0])
    tr = regression.simulate(jax.random.PRNGKey(0), (xs,))
    ys = tr.data.read("ys/y")
    assert ys.shape == (3,)
    slope = float(tr.data.read("slope"))
    expected_logjp = float(normal.logpdf(slope, (0.0, 1.0))) + sum(
        float(normal.logpdf(ys[i], (slope * xs[i], 0.1))) for i in range(3))
    assert float(tr.logjp) == pytest.approx(expected_logjp)

    obs = Trie.from_dict({"ys": {"y": jnp.array([0.5, 1.0, 1.5])}})
    tr2, w = regression.generate(jax.random.PRNGKey(1), (xs,), obs)
    s2 = float(tr2.data.read("slope"))
    expected_w = sum(
        float(normal.logpdf(0.5 * (i + 1), (s2 * xs[i], 0.1)))
        for i in range(3))
    assert float(w) == pytest.approx(expected_w)


def test_map_update_regenerate():
    xs = jnp.array([1.0, 2.0, 3.0])
    obs = Trie.from_dict({"slope": 0.5,
                          "ys": {"y": jnp.array([0.5, 1.0, 1.5])}})
    tr, _ = regression.generate(jax.random.PRNGKey(2), (xs,), obs)

    new_obs = Trie.from_dict({"ys": {"y": jnp.array([0.6, 1.0, 1.5])}})
    tr2, discard, w = regression.update(
        jax.random.PRNGKey(3), tr, (xs,), ArgDiff.NO_CHANGE, new_obs)
    assert np.allclose(np.asarray(tr2.data.read("ys/y")), [0.6, 1.0, 1.5])
    expected_w = float(normal.logpdf(0.6, (0.5, 0.1))) - \
        float(normal.logpdf(0.5, (0.5, 0.1)))
    assert float(w) == pytest.approx(expected_w)
    assert np.allclose(np.asarray(discard.read("ys/y")), [0.5, 1.0, 1.5])

    # regenerate all plate points under the mask
    tr3, w3 = regression.regenerate(
        jax.random.PRNGKey(4), tr2, (xs,), ArgDiff.NO_CHANGE, select("ys/y"))
    assert tr3.data.read("ys/y").shape == (3,)
    assert float(w3) == pytest.approx(0.0)  # resampled from prior

    # jit + vmap over a batch of runs
    batched = jax.vmap(lambda k: regression.simulate(k, (xs,)).retv)(
        jax.random.split(jax.random.PRNGKey(5), 7))
    assert batched.shape == (7, 3)
